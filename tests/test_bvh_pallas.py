"""Packet BVH traversal kernel vs brute force (ops/bvh_pallas.py).

The kernel runs in interpret mode on CPU; the same program compiles via
Mosaic on TPU (exercised by bench runs and a TPU smoke check)."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from tests.test_bvh import _random_rays, _random_tris
from rs_ray_toy_tpu.accel import geometry as geom
from rs_ray_toy_tpu.accel.bvh import build_bvh
from rs_ray_toy_tpu.ops.bvh_pallas import (
    intersect_bvh_pallas,
    occluded_bvh_pallas,
    pack_bvh_tables,
)
from rs_ray_toy_tpu.scene.types import empty_spheres


def _setup(n_tris=300, n_rays=1500, seed=0):
    tri = _random_tris(n_tris, seed=seed)
    sph = empty_spheres()
    o, d = _random_rays(n_rays, seed=seed + 1)
    t_max = jnp.full((n_rays,), jnp.inf, jnp.float32)
    bvh = build_bvh(tri, sph, 4)
    return tri, sph, o, d, t_max, pack_bvh_tables(bvh, tri)


def test_packet_traversal_matches_brute_force():
    tri, sph, o, d, t_max, tables = _setup()
    t, idx, valid = intersect_bvh_pallas(tables, o, d, t_max, interpret=True)
    h = geom.intersect_brute(tri, sph, o, d, t_max)
    hv = np.asarray(h.valid)
    assert np.array_equal(hv, np.asarray(valid))
    assert np.allclose(np.asarray(t)[hv], np.asarray(h.t)[hv], rtol=1e-4)
    assert np.array_equal(np.asarray(idx)[hv], np.asarray(h.index)[hv])


def test_packet_any_hit_matches_brute_force():
    tri, sph, o, d, t_max, tables = _setup(seed=3)
    occ = occluded_bvh_pallas(tables, o, d, t_max, interpret=True)
    brute = geom.occluded_brute(tri, sph, o, d, t_max)
    assert np.array_equal(np.asarray(occ), np.asarray(brute))


def test_packet_traversal_finite_t_max():
    """Shadow-ray style bounded queries must respect t_max."""
    tri, sph, o, d, _, tables = _setup(seed=5)
    t_max = jnp.full((o.shape[0],), 12.0, jnp.float32)
    occ = occluded_bvh_pallas(tables, o, d, t_max, interpret=True)
    brute = geom.occluded_brute(tri, sph, o, d, t_max)
    assert np.array_equal(np.asarray(occ), np.asarray(brute))


def test_grid_scene_renders_through_bvh_kernel(monkeypatch):
    """End-to-end: a 1200-triangle grid scene (above BRUTE_FORCE_CUTOFF)
    renders through the packet kernel and lights actual pixels."""
    from rs_ray_toy_tpu.scene.gen import write_grid_scene
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.render import render_job

    monkeypatch.setenv("RS_BVH_PALLAS", "interp")
    td = tempfile.mkdtemp()
    path = write_grid_scene(td, ny=10, nz=10, xres=40, yres=24, max_depth=3)
    job = load_scene(path)
    assert int(job.scene.triangles.count) == 1200
    ctx = SceneCtx(job.scene)
    assert ctx.bvh is not None and ctx.bvh_tables is not None
    res = render_job(job, spp_override=1, pupil_samples=1 << 10)
    rgb = np.asarray(res["rgb_srgb_input"])
    assert np.isfinite(rgb).all()
    # small cubes at 40x24/1spp light only a handful of pixels; geometric
    # agreement with the jnp traversal is asserted by the test below
    assert (rgb.max(axis=-1) > 0.01).sum() >= 10


def test_grid_scene_kernel_matches_jnp_traversal(monkeypatch):
    """The packet kernel and the jnp while-loop traversal must agree on
    the same BVH for real camera rays."""
    import jax
    from rs_ray_toy_tpu.scene.gen import write_grid_scene
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler
    from rs_ray_toy_tpu.accel.traverse import intersect_bvh

    monkeypatch.setenv("RS_BVH_PALLAS", "interp")
    td = tempfile.mkdtemp()
    path = write_grid_scene(td, ny=8, nz=8, xres=64, yres=32, max_depth=2)
    job = load_scene(path)
    ctx = SceneCtx(job.scene)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler)
    n = 64 * 32
    pid = jnp.arange(n, dtype=jnp.uint32)
    sid = jnp.zeros((n,), jnp.uint32)
    pxy = jnp.stack([(pid % 64), (pid // 64)], -1).astype(jnp.float32)
    p_film = pxy + sampler.get_2d(pid, sid, 0)
    o, d, w = cam.generate_rays(p_film, sampler.get_2d(pid, sid, 1))
    t_max = jnp.full((n,), jnp.inf, jnp.float32)

    hit_k = ctx.intersect(o, d, t_max)
    hit_j = intersect_bvh(ctx.bvh, ctx.tri, ctx.sph, o, d, t_max)
    live = np.asarray(w) > 0
    hv = np.asarray(hit_j.valid) & live
    assert np.array_equal(hv, np.asarray(hit_k.valid) & live)
    assert hv.sum() > 30  # enough real hits for the t-comparison to mean something
    np.testing.assert_allclose(
        np.asarray(hit_k.t)[hv], np.asarray(hit_j.t)[hv], rtol=1e-4
    )


def test_blocked_order_film_equivalence(monkeypatch):
    """Blocked camera-ray order (render.py packet-coherence layout) must
    produce the identical film after host un-permutation — the sampler is
    counter-based on raster pixel ids, so per-pixel radiance is
    order-invariant."""
    import json, shutil, tempfile

    from rs_ray_toy_tpu.scene.gen import write_grid_scene
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    monkeypatch.setenv("RS_BVH_PALLAS", "interp")
    path = write_grid_scene(
        tempfile.mkdtemp(), ny=6, nz=6, xres=48, yres=32, max_depth=2
    )

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("RS_BLOCK_ORDER", flag)
        job = load_scene(path)
        outs[flag] = np.asarray(
            render_job(job, spp_override=1, pupil_samples=1 << 10, seed=0)[
                "rgb_srgb_input"
            ]
        )
    assert np.isfinite(outs["1"]).all()
    assert outs["1"].max() > 0
    np.testing.assert_array_equal(outs["1"], outs["0"])


def test_sample_major_layout_film_equivalence(monkeypatch):
    """The sample-major packet layout (k_spp samples of one 16x8 pixel
    sub-block per Pallas packet; render.py SUB interleave) must produce
    the identical film: per-sample radiance is layout-invariant and the
    interleaved aligned reshape-add sums the same k values per pixel."""
    import tempfile

    from rs_ray_toy_tpu.scene.gen import write_grid_scene
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    monkeypatch.setenv("RS_BVH_PALLAS", "interp")
    # 48x32 film: h*w = 1536 = 12 sub-blocks of 128 pixels
    path = write_grid_scene(
        tempfile.mkdtemp(), ny=6, nz=6, xres=48, yres=32, max_depth=2
    )

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("RS_SAMPLE_MAJOR", flag)
        job = load_scene(path)
        outs[flag] = np.asarray(
            render_job(job, spp_override=4, pupil_samples=1 << 10, seed=0)[
                "rgb_srgb_input"
            ]
        )
    assert np.isfinite(outs["1"]).all()
    assert outs["1"].max() > 0
    np.testing.assert_allclose(outs["1"], outs["0"], atol=1e-6)


def _with_shading(tri, seed=0):
    """Give the random mesh vertex normals + UVs (smooth shading path)."""
    rng = np.random.default_rng(seed)
    n = int(tri.count)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    nrm = rng.normal(size=(3, n, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    # keep vertex normals in the geometric normal's hemisphere
    ngn = np.asarray(tri.ng)
    ngn = ngn / np.maximum(np.linalg.norm(ngn, axis=-1, keepdims=True), 1e-20)
    for k in range(3):
        flip = (nrm[k] * ngn).sum(-1) < 0
        nrm[k][flip] *= -1
    uvs = rng.random((3, n, 2))
    return tri.replace(
        n0=f32(nrm[0]), n1=f32(nrm[1]), n2=f32(nrm[2]),
        uv0=f32(uvs[0]), uv1=f32(uvs[1]), uv2=f32(uvs[2]),
        has_n=jnp.ones(n, bool),
        mat=jnp.asarray(rng.integers(0, 5, n), jnp.int32),
    )


def test_shaded_traversal_matches_surface_interaction():
    """The fused shaded kernel must reproduce intersect + a full
    surface_interaction on the triangle branch — flat and smooth."""
    from rs_ray_toy_tpu.ops.bvh_pallas import intersect_bvh_pallas_shaded

    for smooth in (False, True):
        tri = _random_tris(300, seed=11)
        if smooth:
            tri = _with_shading(tri, seed=12)
        sph = empty_spheres()
        o, d = _random_rays(1500, seed=13)
        t_max = jnp.full((1500,), jnp.inf, jnp.float32)
        bvh = build_bvh(tri, sph, 4)
        tables = pack_bvh_tables(bvh, tri)
        assert tables["smooth"] == smooth

        t, idx, valid, at = intersect_bvh_pallas_shaded(
            tables, o, d, t_max, interpret=True
        )
        hit = geom.Hit(
            t=t,
            kind=jnp.where(valid, geom.PRIM_TRI, geom.PRIM_NONE),
            index=idx,
            valid=valid,
        )
        si = geom.surface_interaction(tri, sph, hit, o, d)
        hv = np.asarray(valid)
        assert hv.any()
        for name, got, want, tol in [
            ("uv", at["uv"], si.uv, 1e-5),
            ("ns", at["ns"], si.ns, 1e-5),
            ("ng", at["ng"], si.ng, 1e-5),
            ("dpdu", at["dpdu"], si.dpdu, 1e-5),
            ("dpdv", at["dpdv"], si.dpdv, 1e-5),
            ("dndu", at["dndu"], si.dndu, 1e-4),
            ("dndv", at["dndv"], si.dndv, 1e-4),
        ]:
            g = np.asarray(got)[hv]
            w = np.asarray(want)[hv]
            assert np.allclose(g, w, atol=tol), (
                smooth, name, np.abs(g - w).max(),
            )
        assert np.array_equal(np.asarray(at["mat"])[hv], np.asarray(si.mat)[hv])
        assert np.array_equal(
            np.asarray(at["area_light"])[hv], np.asarray(si.area_light)[hv]
        )


def test_mesh_scene_with_sphere_keeps_packet_kernel(monkeypatch):
    """VERDICT r2 #8: a mesh scene plus a sphere must still use the
    packet BVH (triangle-only kernel tables + brute-force sphere
    min-combine), and agree with the pure-jnp mixed traversal."""
    import json
    from rs_ray_toy_tpu.scene.gen import write_grid_scene
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    monkeypatch.setenv("RS_BVH_PALLAS", "interp")
    td = tempfile.mkdtemp()
    path = write_grid_scene(td, ny=8, nz=8)
    cfg = json.load(open(path))
    cfg["Aggregate"]["primitives"].append(
        {
            "primitive_type": "sphere",
            "material_name": "mat_matte",
            "radius": 1.2,
            "world_pos": [33.0, 0.0, 0.0],
        }
    )
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    ctx = SceneCtx(job.scene)
    assert int(ctx.sph.count) == 1
    assert ctx.bvh_tables is not None, "sphere must not disable the kernel"

    rng = np.random.default_rng(5)
    n = 2048
    o = jnp.asarray(
        np.array([0.0, 15.0, -25.0]) + rng.normal(0, 0.5, (n, 3)), jnp.float32
    )
    tgt = np.array([35.0, 0.0, 0.0]) + rng.normal(0, 2.5, (n, 3))
    d = tgt - np.asarray(o)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    t_max = jnp.full((n,), jnp.inf, jnp.float32)

    hit_k, si_k = ctx.intersect_shaded(o, d, t_max)
    hit_b = geom.intersect_brute(ctx.tri, ctx.sph, o, d, t_max)
    si_b = ctx.surface(hit_b, o, d)

    hv = np.asarray(hit_b.valid)
    assert hv.any()
    # some rays must hit the sphere for this test to mean anything
    assert (np.asarray(hit_b.kind)[hv] == geom.PRIM_SPHERE).any()
    assert np.array_equal(hv, np.asarray(hit_k.valid))
    assert np.array_equal(np.asarray(hit_k.kind)[hv], np.asarray(hit_b.kind)[hv])
    assert np.allclose(np.asarray(hit_k.t)[hv], np.asarray(hit_b.t)[hv], rtol=1e-4)
    for name in ("uv", "ns", "ng", "dpdu", "dpdv"):
        g = np.asarray(getattr(si_k, name))[hv]
        w = np.asarray(getattr(si_b, name))[hv]
        assert np.allclose(g, w, atol=2e-4), (name, np.abs(g - w).max())
    assert np.array_equal(np.asarray(si_k.mat)[hv], np.asarray(si_b.mat)[hv])
    # occlusion agrees too
    occ_k = ctx.occluded(o, d, jnp.full((n,), 100.0, jnp.float32))
    occ_b = geom.occluded_brute(ctx.tri, ctx.sph, o, d, jnp.full((n,), 100.0, jnp.float32))
    assert np.array_equal(np.asarray(occ_k), np.asarray(occ_b))
