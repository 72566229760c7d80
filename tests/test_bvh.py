"""BVH build + traversal vs brute force (bvh.rs test_tri_bvh analogue,
but with exact closest-hit assertions instead of a smoke count)."""

import numpy as np
import jax.numpy as jnp

from rs_ray_toy_tpu.accel import geometry as geom
from rs_ray_toy_tpu.accel.bvh import build_bvh, build_bvh_py, _native_lib
from rs_ray_toy_tpu.accel.traverse import intersect_bvh, occluded_bvh
from rs_ray_toy_tpu.scene.types import TriangleSoA, empty_spheres


def _random_tris(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, size=(n, 1, 3))
    verts = base + rng.uniform(-0.7, 0.7, size=(n, 3, 3))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    z3 = jnp.zeros((n, 3), jnp.float32)
    uv = jnp.zeros((n, 2), jnp.float32)
    return TriangleSoA(
        p0=f32(verts[:, 0]), p1=f32(verts[:, 1]), p2=f32(verts[:, 2]),
        n0=z3, n1=z3, n2=z3, uv0=uv, uv1=uv, uv2=uv,
        has_n=jnp.zeros(n, bool),
        mat=jnp.zeros(n, jnp.int32),
        area_light=jnp.full(n, -1, jnp.int32),
        med_in=jnp.full(n, -1, jnp.int32),
        med_out=jnp.full(n, -1, jnp.int32),
        ng=f32(np.cross(verts[:, 2] - verts[:, 0], verts[:, 1] - verts[:, 0])),
        dpdu=f32(verts[:, 1] - verts[:, 0]),
        dpdv=f32(verts[:, 2] - verts[:, 0]),
    )


def _random_rays(n, seed=1, spread=10.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2 * spread, 2 * spread, size=(n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_native_builder_available():
    assert _native_lib() is not None, "csrc/libbvh.so missing — run make -C csrc"


def test_bvh_layout_invariants():
    tri = _random_tris(200)
    bvh = build_bvh(tri, empty_spheres(), 4)
    offs = np.asarray(bvh.offset)
    npr = np.asarray(bvh.n_prims)
    m = bvh.n_nodes
    # leaves cover all prims exactly once
    covered = []
    for i in range(m):
        if npr[i] > 0:
            covered.extend(range(offs[i], offs[i] + npr[i]))
    assert sorted(covered) == list(range(200))
    # interior right children are valid node ids greater than the node
    for i in range(m):
        if npr[i] == 0:
            assert i < offs[i] < m


def test_bvh_matches_brute_force():
    tri = _random_tris(300)
    sph = empty_spheres()
    o, d = _random_rays(500)
    t_max = jnp.full((500,), jnp.inf, jnp.float32)
    bvh = build_bvh(tri, sph, 4)
    h_bvh = intersect_bvh(bvh, tri, sph, o, d, t_max)
    h_bru = geom.intersect_brute(tri, sph, o, d, t_max)
    assert np.array_equal(np.asarray(h_bvh.valid), np.asarray(h_bru.valid))
    hits = np.asarray(h_bru.valid)
    assert np.allclose(
        np.asarray(h_bvh.t)[hits], np.asarray(h_bru.t)[hits], rtol=1e-4
    )
    assert np.array_equal(
        np.asarray(h_bvh.index)[hits], np.asarray(h_bru.index)[hits]
    )


def test_bvh_python_builder_matches_too():
    tri = _random_tris(120, seed=7)
    sph = empty_spheres()
    o, d = _random_rays(200, seed=8)
    t_max = jnp.full((200,), jnp.inf, jnp.float32)
    bvh = build_bvh_py(tri, sph, 4)
    h_bvh = intersect_bvh(bvh, tri, sph, o, d, t_max)
    h_bru = geom.intersect_brute(tri, sph, o, d, t_max)
    assert np.array_equal(np.asarray(h_bvh.valid), np.asarray(h_bru.valid))


def test_bvh_any_hit():
    tri = _random_tris(300)
    sph = empty_spheres()
    o, d = _random_rays(400, seed=3)
    t_max = jnp.full((400,), jnp.inf, jnp.float32)
    bvh = build_bvh(tri, sph, 4)
    occ = occluded_bvh(bvh, tri, sph, o, d, t_max)
    brute = geom.occluded_brute(tri, sph, o, d, t_max)
    assert np.array_equal(np.asarray(occ), np.asarray(brute))


def _coincident_tris(n):
    """n copies of one triangle: all AABB centroids coincide (the
    degenerate branch both builders must median-split, not leaf-dump)."""
    verts = np.tile(
        np.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]), (n, 1, 1)
    )
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    z3 = jnp.zeros((n, 3), jnp.float32)
    uv = jnp.zeros((n, 2), jnp.float32)
    return TriangleSoA(
        p0=f32(verts[:, 0]), p1=f32(verts[:, 1]), p2=f32(verts[:, 2]),
        n0=z3, n1=z3, n2=z3, uv0=uv, uv1=uv, uv2=uv,
        has_n=jnp.zeros(n, bool),
        mat=jnp.zeros(n, jnp.int32),
        area_light=jnp.full(n, -1, jnp.int32),
        med_in=jnp.full(n, -1, jnp.int32),
        med_out=jnp.full(n, -1, jnp.int32),
        ng=f32(np.tile([[0.0, 0.0, 1.0]], (n, 1))),
        dpdu=f32(verts[:, 1] - verts[:, 0]),
        dpdv=f32(verts[:, 2] - verts[:, 0]),
    )


def test_bvh_degenerate_centroids_no_dropped_prims():
    """300 coincident triangles -> every leaf must still fit max_leaf and a
    guaranteed hit must be found (round-1 advisor finding: oversized
    degenerate leaves silently dropped intersections)."""
    tri = _coincident_tris(300)
    sph = empty_spheres()
    o = jnp.asarray([[0.25, 0.25, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    t_max = jnp.full((1,), jnp.inf, jnp.float32)
    for builder in (build_bvh, build_bvh_py):
        bvh = builder(tri, sph, 4)
        assert int(np.asarray(bvh.n_prims).max()) <= bvh.max_leaf
        assert int(np.asarray(bvh.n_prims).max()) <= 4
        h = intersect_bvh(bvh, tri, sph, o, d, t_max)
        assert bool(h.valid[0]), f"{builder.__name__} missed a guaranteed hit"
        assert np.allclose(float(h.t[0]), 1.0, rtol=1e-5)
