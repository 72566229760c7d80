"""In-kernel packed texture taps (ops/tex_tile.py) vs the jnp packed path.

A minimal pallas_call wraps tile_lookup so the MXU one-hot formulation is
pinned against scene/mipmap.py's packed lookups (which tests/
test_packed_mipmap.py in turn pins against the exact window path).
Interpret mode on CPU runs the same program the TPU compiles.
Tolerance: the kernel taps run bf16 (one-hot entries exact; weights and
texels round <= 2^-9 relative — below the 8-bit PNG source quantization).
"""

import functools
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rs_ray_toy_tpu.scene.mipmap import (
    WRAP_BLACK,
    WRAP_CLAMP,
    WRAP_REPEAT,
    build_mipmap,
    packed_ewa_lookup,
    packed_trilinear_lookup,
)
from rs_ray_toy_tpu.ops import tex_tile as tt

rng = np.random.default_rng(11)
ROWS, LANES = 8, 128


def _rec(su=1.0, sv=1.0, du=0.0, dv=0.0, scale=1.0):
    return types.SimpleNamespace(su=su, sv=sv, du=du, dv=dv, scale=scale)


def _run_tile(tex, pk, ss, tt_, lod=None, active=None):
    """pallas_call wrapper: one (ROWS, LANES) tile through tile_lookup."""
    two = lod is not None
    n_planes = tt.n_scratch_planes(two)

    def kernel(tbl_ref, ss_r, tt_r, lod_r, r_o, g_o, b_o, scr_in, scr_out):
        lodv = lod_r[:, :] if two else None
        act = None if active is None else (ss_r[:, :] == ss_r[:, :])
        planes = tt.lookup_planes(tex, ss_r[:, :], tt_r[:, :], lodv, act)
        r, g, b = tt.tile_lookup(tex, tbl_ref, scr_in, scr_out, planes)
        r_o[:, :] = r
        g_o[:, :] = g
        b_o[:, :] = b

    lod_in = lod if two else jnp.zeros((ROWS, LANES), jnp.float32)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        in_specs=[vmem] * 4,
        out_specs=[vmem] * 3,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((ROWS, n_planes, LANES), jnp.float32),
            pltpu.VMEM((ROWS, tex.channels, LANES), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(tt.table_bf16(pk), ss, tt_, lod_in)
    return jnp.stack([o.ravel() for o in outs], axis=-1)


@pytest.mark.parametrize("wrap", [WRAP_REPEAT, WRAP_CLAMP, WRAP_BLACK])
def test_tile_static_level_matches_packed_bilerp(wrap):
    mip = build_mipmap(rng.random((300, 718, 3)), wrap=wrap)
    pk = mip.as_packed()
    img = types.SimpleNamespace(max_aniso=8.0, do_trilinear=False)
    tex = tt.pack_texture_static(_rec(), img, pk)
    lo = -0.5 if wrap != WRAP_CLAMP else 0.0
    ss = jnp.asarray(rng.uniform(lo, 1.5, (ROWS, LANES)), jnp.float32)
    tt_ = jnp.asarray(rng.uniform(lo, 1.5, (ROWS, LANES)), jnp.float32)
    got = _run_tile(tex, pk, ss, tt_)
    st = jnp.stack([ss.ravel(), tt_.ravel()], axis=-1)
    want = packed_trilinear_lookup(pk, st, None)  # width None -> lod_min
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1.5e-2)


def test_tile_two_level_matches_packed_ewa():
    mip = build_mipmap(rng.random((300, 718, 3)), wrap=WRAP_REPEAT)
    pk = mip.as_packed()
    img = types.SimpleNamespace(max_aniso=8.0, do_trilinear=False)
    tex = tt.pack_texture_static(_rec(), img, pk)
    ss = jnp.asarray(rng.uniform(0, 1, (ROWS, LANES)), jnp.float32)
    tt_ = jnp.asarray(rng.uniform(0, 1, (ROWS, LANES)), jnp.float32)
    # footprints spanning the packed level range incl. the clamp region
    r = jnp.asarray(
        2.0 ** rng.uniform(-12, 0, (ROWS, LANES)), jnp.float32
    )
    d0u, d0v = r, jnp.zeros_like(r)
    d1u, d1v = jnp.zeros_like(r), 0.5 * r
    lod = tt.ewa_lod(tex, d0u, d0v, d1u, d1v)
    got = _run_tile(tex, pk, ss, tt_, lod=lod)
    st = jnp.stack([ss.ravel(), tt_.ravel()], axis=-1)
    dst0 = jnp.stack([d0u.ravel(), d0v.ravel()], axis=-1)
    dst1 = jnp.stack([d1u.ravel(), d1v.ravel()], axis=-1)
    want = packed_ewa_lookup(pk, st, dst0, dst1, 8.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1.5e-2)


def test_tile_scale_and_zero_lod_consistency():
    """Zero footprints through the EWA path == the static lod_min tap,
    and rec.scale multiplies through."""
    mip = build_mipmap(rng.random((64, 64, 3)), wrap=WRAP_REPEAT)
    pk = mip.as_packed()
    img = types.SimpleNamespace(max_aniso=8.0, do_trilinear=False)
    tex2 = tt.pack_texture_static(_rec(scale=2.5), img, pk)
    ss = jnp.asarray(rng.uniform(0, 1, (ROWS, LANES)), jnp.float32)
    tt_ = jnp.asarray(rng.uniform(0, 1, (ROWS, LANES)), jnp.float32)
    z = jnp.zeros((ROWS, LANES), jnp.float32)
    lod = tt.ewa_lod(tex2, z, z, z, z)
    got = _run_tile(tex2, pk, ss, tt_, lod=lod)
    want = _run_tile(tex2, pk, ss, tt_)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    tex1 = tt.pack_texture_static(_rec(scale=1.0), img, pk)
    base = _run_tile(tex1, pk, ss, tt_)
    np.testing.assert_allclose(
        np.asarray(want), 2.5 * np.asarray(base), rtol=1e-6
    )
