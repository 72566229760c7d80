"""In-kernel packed-pyramid texture lookups for the Pallas megakernels.

The megakernels keep all per-ray state in (rows, 128-lane) vregs; a
per-lane texel fetch has no Mosaic lowering (TPU has no per-lane
gather), so texture taps become MXU one-hot row selections against the
channel-planar packed coarse pyramid (scene/mipmap.py MIPMap.as_packed):

  for each sublane row j of the tile (fori_loop):
      vals  = scratch_in[:, j, :]               # (1, 128) per plane
      oh    = eq(iota_k, r0)*wt0 + eq(iota_k, r1)*wt1   # (128, 128)
      m     = dot_general(T, oh, contract k x k)        # (Wc, 128)
      cs    = eq(iota_s, s0)*ws0 + eq(iota_s, s1)*ws1   # (Wc, 128)
      out_c = sum_sublanes((m * cs)[c*wmax:(c+1)*wmax]) # (1, 128)

Rays ride the LANE axis throughout; the only cross-lane motion is the
dynamic sublane load/store on the VMEM scratch, which Mosaic supports
natively.  Lerp weights fold into the one-hot entries, and per-level
validity (BLACK wrap) folds into the weights, so one matmul evaluates a
whole weighted bilerp tap.

Precision: the matmuls run in bf16 (f32 accumulate).  One-hot 0/1
entries are bf16-exact; lerp weights and texels round at <= 2^-9
relative — below the 8-bit quantization of the PNG sources the
reference's imagemaps load (mipmap.rs:31-72), so the kernel taps are no
lossier than the asset.  Estimator tests compare against the f32 jnp
packed path with a matching tolerance.

Semantics match scene/mipmap.py packed_ewa_lookup /
packed_trilinear_lookup exactly (same level selection, same lod_min
clamp; mipmap.rs:132-189 modulo the documented packed divergences).
"""

import collections
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ..scene.mipmap import WRAP_BLACK, WRAP_CLAMP, WRAP_REPEAT

# static texture payload: everything but the packed table rides the
# kernel closure as compile-time constants
TexC = collections.namedtuple(
    "TexC",
    "meta lod_min n_levels wmax channels wrap su sv du dv scale max_aniso "
    "do_trilinear width_static",
)

# scratch planes per level tap: r0, r1, wt0, wt1, s0, s1, ws0, ws1
PLANES_PER_LEVEL = 8


def pack_texture_static(rec, image, pk):
    """TexC for registry record `rec` over MIPMap `image` whose packed
    dict is `pk` (MAP_UV records only; gates in path_megakernel)."""
    # trilinear records use a CONSTANT footprint width (textures.eval_all
    # footprint() is duv-independent only when duv is None; with duv the
    # width varies -> handled by the EWA branch instead).  The imagemap
    # default is EWA (do_trilinear=False, renderprocess.rs:522).
    return TexC(
        meta=tuple(tuple(int(v) for v in m) for m in pk["meta"]),
        lod_min=int(pk["lod_min"]),
        n_levels=int(pk["n_levels"]),
        wmax=int(pk["wmax"]),
        channels=int(pk["channels"]),
        wrap=int(pk["wrap"]),
        su=float(rec.su),
        sv=float(rec.sv),
        du=float(rec.du),
        dv=float(rec.dv),
        scale=float(rec.scale),
        max_aniso=float(image.max_aniso),
        do_trilinear=bool(image.do_trilinear),
        width_static=None,
    )


def table_bf16(pk):
    """The packed planar table as the kernel's bf16 input array,
    PRE-TRANSPOSED to (Wc, 128): the per-row tap is then a plain NN
    matmul dot(T_t, oh) — a TN dot_general would re-materialize the
    transpose inside the row loop."""
    return pk["table"].T.astype(jnp.bfloat16)


def _sel_meta(tex, level):
    """(h, w, off) per-lane via static select chains (mipmap._sel_meta)."""
    metas = tex.meta
    h = jnp.full(level.shape, metas[-1][0], jnp.int32)
    w = jnp.full(level.shape, metas[-1][1], jnp.int32)
    off = jnp.full(level.shape, metas[-1][2], jnp.int32)
    for l in range(len(metas) - 2, -1, -1):
        sel = level <= l
        h = jnp.where(sel, metas[l][0], h)
        w = jnp.where(sel, metas[l][1], w)
        off = jnp.where(sel, metas[l][2], off)
    return h, w, off


def ewa_lod(tex, d0u, d0v, d1u, d1v):
    """Continuous EWA level (packed_ewa_lookup's exact selection):
    minor-axis radius after the max_aniso eccentricity clamp, clamped to
    [lod_min, n_levels-1].  Componentwise on (rows, lanes) arrays."""
    l0_sq = d0u * d0u + d0v * d0v
    l1_sq = d1u * d1u + d1v * d1v
    major = jnp.maximum(l0_sq, l1_sq)
    minor = jnp.minimum(l0_sq, l1_sq)
    major_len = jnp.sqrt(jnp.maximum(major, 1e-20))
    minor_len = jnp.sqrt(jnp.maximum(minor, 0.0))
    ma = tex.max_aniso
    scale = jnp.where(
        (minor_len * ma < major_len) & (minor_len > 0.0),
        major_len / jnp.maximum(minor_len * ma, 1e-20),
        1.0,
    )
    minor_len = minor_len * scale
    return jnp.clip(
        tex.n_levels - 1 + jnp.log2(jnp.maximum(minor_len, 1e-9)),
        float(tex.lod_min),
        tex.n_levels - 1.0,
    )


def _level_planes(tex, ss, tt, level, lw):
    """The 8 scratch planes of one bilerp tap at per-lane integer
    `level`, level weight `lw` (the trilinear/EWA lerp factor, with any
    dead-lane mask folded in by the caller).  Mirrors
    scene/mipmap._packed_bilerp exactly."""
    h, w, off = _sel_meta(tex, level)
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    wrap = tex.wrap
    if wrap == WRAP_REPEAT:
        sn = ss - jnp.floor(ss)
        tn = tt - jnp.floor(tt)
    elif wrap == WRAP_CLAMP:
        sn = jnp.clip(ss, 0.0, 1.0 - 1e-7)
        tn = jnp.clip(tt, 0.0, 1.0 - 1e-7)
    else:
        sn = jnp.clip(ss, -1.5, 2.5)
        tn = jnp.clip(tt, -1.5, 2.5)
    s = sn * wf - 0.5
    t = tn * hf - 0.5
    s0 = jnp.floor(s).astype(jnp.int32)
    t0 = jnp.floor(t).astype(jnp.int32)
    ds = s - s0.astype(jnp.float32)
    ft = t - t0.astype(jnp.float32)
    s1 = s0 + 1
    t1 = t0 + 1
    one = jnp.ones(ss.shape, jnp.float32)
    if wrap == WRAP_REPEAT:
        # level dims are powers of two: mod == mask (negatives included)
        s0i, s1i = s0 & (w - 1), s1 & (w - 1)
        t0i, t1i = t0 & (h - 1), t1 & (h - 1)
        s0v = s1v = t0v = t1v = one
    elif wrap == WRAP_CLAMP:
        s0i = jnp.clip(s0, 0, w - 1)
        s1i = jnp.clip(s1, 0, w - 1)
        t0i = jnp.clip(t0, 0, h - 1)
        t1i = jnp.clip(t1, 0, h - 1)
        s0v = s1v = t0v = t1v = one
    else:
        s0v = ((s0 >= 0) & (s0 < w)).astype(jnp.float32)
        s1v = ((s1 >= 0) & (s1 < w)).astype(jnp.float32)
        t0v = ((t0 >= 0) & (t0 < h)).astype(jnp.float32)
        t1v = ((t1 >= 0) & (t1 < h)).astype(jnp.float32)
        s0i = jnp.clip(s0, 0, w - 1)
        s1i = jnp.clip(s1, 0, w - 1)
        t0i = jnp.clip(t0, 0, h - 1)
        t1i = jnp.clip(t1, 0, h - 1)
    f32 = lambda x: x.astype(jnp.float32)
    return (
        f32(off + t0i), f32(off + t1i),
        (1.0 - ft) * t0v * lw, ft * t1v * lw,
        f32(s0i), f32(s1i),
        (1.0 - ds) * s0v, ds * s1v,
    )


def lookup_planes(tex, ss, tt, lod_f=None, active=None):
    """All scratch planes for one texture tap on the tile.

    lod_f None => static lod_min bilerp (the dead-differentials case:
    zero footprints select lod_min exactly, so bounce>0 lookups compile
    to ONE tap).  Otherwise the EWA/trilinear two-level lerp: 16 planes.
    `active` masks dead lanes out of the row weights entirely (their
    one-hot rows become zero -> they cost nothing extra and read as 0).
    """
    amask = 1.0 if active is None else active.astype(jnp.float32)
    if lod_f is None:
        # static lod_min tap: rows are RELATIVE to the level's block so
        # tile_lookup can statically slice the table to h rows (half the
        # matmul for every bounce>0 tap)
        level = jnp.full(ss.shape, tex.lod_min, jnp.int32)
        p = _level_planes(
            tex, ss, tt, level, amask * jnp.ones(ss.shape, jnp.float32)
        )
        off = float(tex.meta[tex.lod_min][2])
        return (p[0] - off, p[1] - off) + p[2:]
    l0 = jnp.floor(lod_f).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, tex.n_levels - 1)
    dt = lod_f - l0.astype(jnp.float32)
    pa = _level_planes(tex, ss, tt, l0, (1.0 - dt) * amask)
    pb = _level_planes(tex, ss, tt, l1, dt * amask)
    return pa + pb


def tile_lookup(tex, tbl_ref, scr_in, scr_out, planes):
    """Run the per-sublane-row matmul loop; returns (r, g, b) tiles.

    tbl_ref: (channels*wmax, 128) bf16 VMEM ref (packed table,
             pre-transposed by table_bf16).
    scr_in:  (rows, n_planes, LANES) f32 VMEM scratch.
    scr_out: (rows, channels, LANES) f32 VMEM scratch.
    planes:  tuple of (rows, LANES) f32 arrays from lookup_planes.

    Each fori iteration handles one sublane row (128 rays on lanes):
    ONE dynamic load fetches every plane of the row, one NN matmul
    dot(T_t (Wc,128), oh (128,128)) evaluates the weighted bilerp rows,
    the planar s-extraction reduces channel blocks, and ONE dynamic
    store writes all channels.
    """
    rows, lanes = planes[0].shape
    n_planes = len(planes)
    two_level = n_planes == 2 * PLANES_PER_LEVEL
    wmax = tex.wmax
    c = tex.channels
    wc = c * wmax
    for p, arr in enumerate(planes):
        scr_in[:, p, :] = arr
    if two_level:
        # dynamic per-ray levels: the one-hot spans the whole 128-row table
        k_rows = 128
        tbl = tbl_ref[:, :]  # (wc, 128) bf16, loop-invariant
    else:
        # static lod_min tap (relative rows): slice the level's block
        off = tex.meta[tex.lod_min][2]
        k_rows = max(tex.meta[tex.lod_min][0], 8)
        tbl = tbl_ref[:, off : off + k_rows]
    # Mosaic iota must be integer; plane values are small non-negative
    # ints stored as f32 (exact below 2^24) — cast back for the compare
    iota_k = lax.broadcasted_iota(jnp.int32, (k_rows, lanes), 0)
    # planar column s-index: col = ch*wmax + s, wmax a power of two
    iota_s = lax.broadcasted_iota(jnp.int32, (wc, lanes), 0) & (wmax - 1)

    def tap(row, base):
        ld = lambda p: row[base + p : base + p + 1, :]
        r0, r1 = ld(0).astype(jnp.int32), ld(1).astype(jnp.int32)
        wt0, wt1 = ld(2), ld(3)
        s0, s1 = ld(4).astype(jnp.int32), ld(5).astype(jnp.int32)
        ws0, ws1 = ld(6), ld(7)
        oh = (
            jnp.where(iota_k == r0, wt0, 0.0)
            + jnp.where(iota_k == r1, wt1, 0.0)
        ).astype(jnp.bfloat16)
        m = jnp.dot(tbl, oh, preferred_element_type=jnp.float32)
        cs = jnp.where(iota_s == s0, ws0, 0.0) + jnp.where(
            iota_s == s1, ws1, 0.0
        )
        prod = m * cs
        return [
            jnp.sum(prod[ch * wmax : (ch + 1) * wmax, :], axis=0,
                    keepdims=True)
            for ch in range(c)
        ]

    def body(j, carry):
        # scratch may be allocated for the two-level case (16 planes)
        # while a static-lod tap only fills 8 — slice what this tap uses
        row = scr_in[pl.dslice(j, 1), pl.dslice(0, n_planes), :].reshape(
            n_planes, lanes
        )
        outs = tap(row, 0)
        if two_level:
            outs_b = tap(row, PLANES_PER_LEVEL)
            outs = [a + b for a, b in zip(outs, outs_b)]
        scr_out[pl.dslice(j, 1), :, :] = jnp.concatenate(
            outs, axis=0
        ).reshape(1, c, lanes)
        return carry

    lax.fori_loop(0, rows, body, 0)
    out = [scr_out[:, ch, :] * tex.scale for ch in range(c)]
    if c == 1:
        return out[0], out[0], out[0]
    return out[0], out[1], out[2]


def n_scratch_planes(two_level):
    return PLANES_PER_LEVEL * (2 if two_level else 1)
