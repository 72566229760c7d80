"""Pallas TPU kernels for ray-triangle intersection.

The jnp brute-force path (accel/geometry.py) materializes O(N*T) f32
intermediates in HBM — measured ~80 GB/s effective on this chip, it is
memory-bound.  This kernel keeps a ray tile resident in VMEM and loops the
triangle list per tile, so HBM traffic is one read of the rays + one write
of the hit records (~40 B/ray instead of ~2 KB/ray): the speed-of-light
shape for the VPU.

Layout: rays are packed component-wise into (M, LANES) 2-D blocks (8
sublanes x 128 lanes per VPU tile); triangle data is a precomputed
(T, 12) table [p0, e1, e2, pad] read as scalars inside a fori_loop.

Möller-Trumbore epsilons match accel/geometry.py (triangle.rs:167-180
parity; t_max honoured).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRI_EPS = 1e-7
LANES = 128
SUBLANES = 8
TILE_ROWS = 32  # rows of 128 lanes per program: 4096 rays/tile


def pack_triangles(p0, p1, p2):
    """(T,3)x3 -> (T,12) [p0, e1=p1-p0, e2=p2-p0, pad]."""
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(p1, np.float32) - p0
    e2 = np.asarray(p2, np.float32) - p0
    t = p0.shape[0]
    out = np.zeros((t, 12), np.float32)
    out[:, 0:3] = p0
    out[:, 3:6] = e1
    out[:, 6:9] = e2
    return jnp.asarray(out)


def _kernel(tri_ref, ox, oy, oz, dx, dy, dz, tmax_ref, t_out, idx_out, *, n_tris):
    shape = ox.shape
    t_best = tmax_ref[:]
    best = jnp.full(shape, -1, jnp.int32)

    def body(j, carry):
        t_best, best = carry
        p0x = tri_ref[j, 0]
        p0y = tri_ref[j, 1]
        p0z = tri_ref[j, 2]
        e1x = tri_ref[j, 3]
        e1y = tri_ref[j, 4]
        e1z = tri_ref[j, 5]
        e2x = tri_ref[j, 6]
        e2y = tri_ref[j, 7]
        e2z = tri_ref[j, 8]
        # pv = cross(d, e2)
        pvx = dy[:] * e2z - dz[:] * e2y
        pvy = dz[:] * e2x - dx[:] * e2z
        pvz = dx[:] * e2y - dy[:] * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) >= TRI_EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tvx = ox[:] - p0x
        tvy = oy[:] - p0y
        tvz = oz[:] - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        # qv = cross(tv, e1)
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx[:] * qvx + dy[:] * qvy + dz[:] * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        upd = (
            ok
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= TRI_EPS)
            & (t < t_best)
        )
        t_best = jnp.where(upd, t, t_best)
        best = jnp.where(upd, j, best)
        return t_best, best

    t_best, best = lax.fori_loop(0, n_tris, body, (t_best, best))
    t_out[:] = t_best
    idx_out[:] = best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(tri_packed, ox, oy, oz, dx, dy, dz, tmax, interpret=False):
    m = ox.shape[0]
    n_tris = tri_packed.shape[0]
    grid = (m // TILE_ROWS,)
    ray_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_kernel, n_tris=n_tris)
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(tri_packed, ox, oy, oz, dx, dy, dz, tmax)
    return t, idx


def intersect_triangles_pallas(tri_packed, o, d, t_max, interpret=False):
    """Closest-hit against the packed triangle table.

    o, d: (N,3); t_max: (N,).  Returns (t (N,), idx (N,), hit (N,)) with
    t = +inf where no hit (matching accel/geometry.intersect_triangles).
    """
    n = o.shape[0]
    tile = TILE_ROWS * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    big = jnp.asarray(3.0e38, jnp.float32)
    tmax_p = prep(jnp.minimum(t_max, big).astype(jnp.float32))
    args = [prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
            prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]), tmax_p]
    t, idx = _run(tri_packed, *args, interpret=interpret)
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    hit = idx >= 0
    return jnp.where(hit, t, jnp.inf), idx, hit
