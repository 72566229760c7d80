"""Pallas intersection kernel vs jnp brute force (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from rs_ray_toy_tpu.accel import geometry as geom
from rs_ray_toy_tpu.ops.intersect_pallas import (
    intersect_triangles_pallas,
    pack_triangles,
)
from tests.test_bvh import _random_rays, _random_tris


def test_pallas_matches_brute():
    tri = _random_tris(36, seed=5)
    o, d = _random_rays(1000, seed=6)
    t_max = jnp.full((1000,), jnp.inf, jnp.float32)
    packed = pack_triangles(np.asarray(tri.p0), np.asarray(tri.p1), np.asarray(tri.p2))
    t_p, idx_p, hit_p = intersect_triangles_pallas(packed, o, d, t_max, interpret=True)
    t_b, idx_b, hit_b = geom.intersect_triangles(tri, o, d, t_max)
    assert np.array_equal(np.asarray(hit_p), np.asarray(hit_b))
    hits = np.asarray(hit_b)
    assert np.allclose(np.asarray(t_p)[hits], np.asarray(t_b)[hits], rtol=1e-5)
    assert np.array_equal(np.asarray(idx_p)[hits], np.asarray(idx_b)[hits])


def test_pallas_respects_tmax():
    tri = _random_tris(36, seed=5)
    o, d = _random_rays(500, seed=7)
    packed = pack_triangles(np.asarray(tri.p0), np.asarray(tri.p1), np.asarray(tri.p2))
    inf = jnp.full((500,), jnp.inf, jnp.float32)
    t_full, _, hit_full = intersect_triangles_pallas(packed, o, d, inf, interpret=True)
    # cap t_max below each hit: those hits must vanish
    capped = jnp.where(hit_full, t_full * 0.5, inf)
    _, _, hit_capped = intersect_triangles_pallas(packed, o, d, capped, interpret=True)
    assert not np.any(np.asarray(hit_capped) & np.asarray(hit_full))
