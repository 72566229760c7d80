"""Packed-pyramid (gather-free MXU) mipmap lookups vs the exact path.

The packed table clamps lookups to levels >= lod_min (MIPMap.as_packed);
these tests pin the packed lookups to scene/mipmap.py's exact window path
wherever both are defined to agree:
 - trilinear at any width whose level range lands >= lod_min (all wraps);
 - EVERY lookup on images small enough that lod_min == 0;
 - black-wrap zeroing outside the image.
Reference semantics: mipmap.rs:132-149 (trilinear), 150-189 (EWA level
selection).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rs_ray_toy_tpu.scene.mipmap import (
    WRAP_BLACK,
    WRAP_CLAMP,
    WRAP_REPEAT,
    build_mipmap,
    ewa_lookup,
    packed_ewa_lookup,
    packed_trilinear_lookup,
    trilinear_lookup,
)

rng = np.random.default_rng(7)


def _mip(h, w, wrap):
    img = rng.random((h, w, 3))
    return build_mipmap(img, wrap=wrap)


@pytest.mark.parametrize("wrap", [WRAP_REPEAT, WRAP_CLAMP, WRAP_BLACK])
def test_packed_trilinear_matches_exact_at_coarse_lods(wrap):
    mip = _mip(300, 718, wrap)  # pads to 512x1024 like s_01.png
    dev = mip.as_device()
    pk = mip.as_packed()
    assert pk["lod_min"] > 0  # coarse-only table for a big image
    n_levels = pk["n_levels"]
    n = 257
    lo = -0.5 if wrap != WRAP_CLAMP else 0.0
    st = jnp.asarray(rng.uniform(lo, 1.5, (n, 2)), jnp.float32)
    # widths whose BOTH lerp levels land in the packed range:
    # level_f = n_levels-1 + log2(width) >= lod_min
    lvl = rng.uniform(pk["lod_min"], n_levels - 1, (n,))
    width = jnp.asarray(2.0 ** (lvl - (n_levels - 1)), jnp.float32)
    got = packed_trilinear_lookup(pk, st, width)
    want = trilinear_lookup(dev, st, width)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("wrap", [WRAP_REPEAT, WRAP_CLAMP, WRAP_BLACK])
def test_packed_is_exact_everywhere_for_small_images(wrap):
    # <= 64 rows: the WHOLE pyramid packs; lod_min == 0 and the packed
    # path must equal the exact path at every width including None
    mip = _mip(48, 64, wrap)
    dev = mip.as_device()
    pk = mip.as_packed()
    assert pk["lod_min"] == 0
    n = 193
    lo = -0.5 if wrap != WRAP_CLAMP else 0.0
    st = jnp.asarray(rng.uniform(lo, 1.5, (n, 2)), jnp.float32)
    got0 = packed_trilinear_lookup(pk, st, None)
    want0 = trilinear_lookup(dev, st, None)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0), atol=2e-5)
    width = jnp.asarray(2.0 ** rng.uniform(-8, 0, (n,)), jnp.float32)
    got = packed_trilinear_lookup(pk, st, width)
    want = trilinear_lookup(dev, st, width)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_black_wrap_zero_outside():
    mip = _mip(32, 32, WRAP_BLACK)
    pk = mip.as_packed()
    st = jnp.asarray([[1.7, 0.5], [0.5, -0.9], [2.2, 2.2]], jnp.float32)
    out = packed_trilinear_lookup(pk, st, None)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_packed_ewa_level_selection_matches_exact_ewa():
    """packed EWA uses ewa_lookup's exact level choice (minor radius after
    the aniso clamp); with a degenerate minor axis both paths fall back to
    a finest-level bilerp, where small images make them exactly equal."""
    mip = _mip(64, 64, WRAP_REPEAT)
    dev = mip.as_device()
    pk = mip.as_packed()
    n = 65
    st = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    zero = jnp.zeros((n, 2), jnp.float32)
    got = packed_ewa_lookup(pk, st, zero, zero)
    want = ewa_lookup(dev, st, zero, zero)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_ewa_coarse_isotropic_tracks_exact_level():
    """Isotropic differentials at a coarse lod: the packed EWA's bilerp tap
    must land within the exact EWA's one-level blur bound (the Gaussian
    window and the bilerp tap agree on a bilinear-interpolated pyramid to
    within the filter-shape difference)."""
    mip = _mip(300, 718, WRAP_REPEAT)
    dev = mip.as_device()
    pk = mip.as_packed()
    n = 65
    st = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    # minor radius ~ level lod_min+2 in uv units
    r = 2.0 ** (float(pk["lod_min"]) + 2 - (pk["n_levels"] - 1))
    dst0 = jnp.stack([jnp.full((n,), r), jnp.zeros((n,))], -1).astype(jnp.float32)
    dst1 = jnp.stack([jnp.zeros((n,)), jnp.full((n,), r)], -1).astype(jnp.float32)
    got = np.asarray(packed_ewa_lookup(pk, st, dst0, dst1))
    want = np.asarray(ewa_lookup(dev, st, dst0, dst1))
    # filter-shape (Gaussian vs triangle) difference only: loose bound
    assert np.abs(got - want).max() < 0.2
    assert np.abs(got - want).mean() < 0.05
