"""MIPMap: host pyramid build + device trilinear / EWA lookups.

The reference stores each level in a cache-blocked BlockedArray
(memory.rs:24-98, mipmap.rs:73-131); on TPU plain dense levels are right —
XLA picks layouts — so the pyramid is a list of (H,W,3) arrays, padded to
power-of-two via Lanczos-equivalent resampling (mipmap.rs:270+ uses Lanczos;
we use separable box/linear resampling on host, noted divergence: affects
only non-pow2 source images' minification tail).

Device lookup gathers 8 texels for trilinear (mipmap.rs:132-149); EWA
(mipmap.rs:150-189) comes with the ray-differential phase.
"""

from dataclasses import dataclass
from typing import List

import numpy as np
import jax.numpy as jnp

from ..config import DTYPE

WRAP_REPEAT = 0
WRAP_BLACK = 1
WRAP_CLAMP = 2


@dataclass
class MIPMap:
    levels: List[np.ndarray]  # finest first, each (H,W,3) float32
    wrap: int
    do_trilinear: bool
    max_aniso: float

    @property
    def width(self):
        return self.levels[0].shape[1]

    @property
    def height(self):
        return self.levels[0].shape[0]

    def as_device(self):
        """Pack pyramid into one padded (L, Hmax, Wmax, C) array + dims."""
        hmax = self.levels[0].shape[0]
        wmax = self.levels[0].shape[1]
        n = len(self.levels)
        c = self.levels[0].shape[2]
        packed = np.zeros((n, hmax, wmax, c), np.float32)
        dims = np.zeros((n, 2), np.int32)
        for i, lv in enumerate(self.levels):
            h, w = lv.shape[:2]
            packed[i, :h, :w] = lv
            dims[i] = (h, w)
        return {
            "data": jnp.asarray(packed),
            "dims": jnp.asarray(dims),
            "wrap": self.wrap,
            "n_levels": n,
        }


def _next_pow2(x):
    return 1 << (int(x) - 1).bit_length()


def _resample_axis(img, new_n, axis):
    """Separable linear resample to new_n along axis (host)."""
    old_n = img.shape[axis]
    if old_n == new_n:
        return img
    pos = (np.arange(new_n) + 0.5) * old_n / new_n - 0.5
    lo = np.clip(np.floor(pos).astype(int), 0, old_n - 1)
    hi = np.clip(lo + 1, 0, old_n - 1)
    t = (pos - lo).reshape([-1 if i == axis else 1 for i in range(img.ndim)])
    a = np.take(img, lo, axis=axis)
    b = np.take(img, hi, axis=axis)
    return a * (1 - t) + b * t


def build_mipmap(image, wrap=WRAP_REPEAT, do_trilinear=False, max_aniso=8.0):
    """image: (H,W,3) float in linear space, bottom row = v=0 (the loader
    flips PNG rows like renderprocess.rs:555-561)."""
    img = np.asarray(image, np.float64)
    h, w = img.shape[:2]
    ph, pw = _next_pow2(h), _next_pow2(w)
    if (ph, pw) != (h, w):
        img = _resample_axis(_resample_axis(img, pw, 1), ph, 0)
    levels = [img.astype(np.float32)]
    while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
        prev = levels[-1].astype(np.float64)
        nh = max(1, prev.shape[0] // 2)
        nw = max(1, prev.shape[1] // 2)
        if prev.shape[0] > 1 and prev.shape[1] > 1:
            down = 0.25 * (
                prev[0::2, 0::2] + prev[1::2, 0::2] + prev[0::2, 1::2] + prev[1::2, 1::2]
            )
        elif prev.shape[0] > 1:
            down = 0.5 * (prev[0::2] + prev[1::2])
        else:
            down = 0.5 * (prev[:, 0::2] + prev[:, 1::2])
        levels.append(down.astype(np.float32))
    return MIPMap(levels, wrap, do_trilinear, max_aniso)


def _wrap_index(i, n, wrap):
    if wrap == WRAP_REPEAT:
        return jnp.mod(i, n)
    return jnp.clip(i, 0, n - 1)


def _texel(dev, level, s, t):
    """Gather texel (s,t) integer coords at `level` with wrapping."""
    dims = dev["dims"][level]
    h, w = dims[..., 0], dims[..., 1]
    wrap = dev["wrap"]
    si = _wrap_index(s, w, wrap)
    ti = _wrap_index(t, h, wrap)
    val = dev["data"][level, ti, si]
    if wrap == WRAP_BLACK:
        inside = (s >= 0) & (s < w) & (t >= 0) & (t < h)
        val = jnp.where(inside[..., None], val, 0.0)
    return val


def _bilerp_level(dev, level, st):
    """Bilinear at continuous st in [0,1)^2 on a given (per-ray) level."""
    dims = dev["dims"][level]
    h = dims[..., 0].astype(DTYPE)
    w = dims[..., 1].astype(DTYPE)
    s = st[..., 0] * w - 0.5
    t = st[..., 1] * h - 0.5
    s0 = jnp.floor(s).astype(jnp.int32)
    t0 = jnp.floor(t).astype(jnp.int32)
    ds = (s - s0)[..., None]
    dt = (t - t0)[..., None]
    v00 = _texel(dev, level, s0, t0)
    v10 = _texel(dev, level, s0 + 1, t0)
    v01 = _texel(dev, level, s0, t0 + 1)
    v11 = _texel(dev, level, s0 + 1, t0 + 1)
    return (
        (1 - ds) * (1 - dt) * v00
        + ds * (1 - dt) * v10
        + (1 - ds) * dt * v01
        + ds * dt * v11
    )


def trilinear_lookup(dev, st, width=None):
    """Triangle-filtered lookup (mipmap.rs:132-149).

    width: (N,) filter width (max differential extent); None = finest level.
    """
    n_levels = dev["n_levels"]
    if width is None:
        level = jnp.zeros(st.shape[:-1], jnp.int32)
        return _bilerp_level(dev, level, st)
    level_f = n_levels - 1 + jnp.log2(jnp.maximum(width, 1e-8))
    level_f = jnp.clip(level_f, 0.0, n_levels - 1)
    l0 = jnp.floor(level_f).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_levels - 1)
    dt = (level_f - l0)[..., None]
    return (1 - dt) * _bilerp_level(dev, l0, st) + dt * _bilerp_level(dev, l1, st)


# ---- EWA anisotropic filtering (mipmap.rs:150-189) ----

_EWA_WINDOW = 16  # bounded ellipse scan per level (radii clamped to fit)
_EWA_LUT_SIZE = 128


def _ewa_weight(r2):
    """Gaussian falloff exp(-2 r^2) - exp(-2), matching the reference's
    weight LUT construction."""
    return jnp.maximum(jnp.exp(-2.0 * r2) - jnp.exp(-2.0), 0.0)


def _ewa_level(dev, level, st, dst0, dst1):
    """EWA at one (per-ray) level; st in [0,1)^2, dst* in uv units."""
    dims = dev["dims"][level]
    h = dims[..., 0].astype(DTYPE)
    w = dims[..., 1].astype(DTYPE)
    # convert to texel coordinates
    s = st[..., 0] * w - 0.5
    t = st[..., 1] * h - 0.5
    d0s = dst0[..., 0] * w
    d0t = dst0[..., 1] * h
    d1s = dst1[..., 0] * w
    d1t = dst1[..., 1] * h
    # ellipse coefficients (+1 blur like the reference)
    A = d0t * d0t + d1t * d1t + 1.0
    B = -2.0 * (d0s * d0t + d1s * d1t)
    C = d0s * d0s + d1s * d1s + 1.0
    inv_f = 1.0 / jnp.maximum(A * C - B * B * 0.25, 1e-12)
    A = A * inv_f
    B = B * inv_f
    C = C * inv_f
    det = jnp.maximum(-B * B + 4.0 * A * C, 1e-12)
    inv_det = 1.0 / det
    u_rad = jnp.sqrt(jnp.maximum(C * inv_det * 4.0, 0.0))
    v_rad = jnp.sqrt(jnp.maximum(A * inv_det * 4.0, 0.0))
    half = _EWA_WINDOW // 2
    u_rad = jnp.minimum(u_rad, half - 1.0)
    v_rad = jnp.minimum(v_rad, half - 1.0)
    s0 = jnp.ceil(s - u_rad).astype(jnp.int32)
    t0 = jnp.ceil(t - v_rad).astype(jnp.int32)

    acc = jnp.zeros(st.shape[:-1] + (3,), DTYPE)
    wsum = jnp.zeros(st.shape[:-1], DTYPE)
    for dt_i in range(_EWA_WINDOW):
        for ds_i in range(_EWA_WINDOW):
            ss = (s0 + ds_i).astype(DTYPE) - s
            tt = (t0 + dt_i).astype(DTYPE) - t
            r2 = A * ss * ss + B * ss * tt + C * tt * tt
            inside = r2 < 1.0
            wgt = jnp.where(inside, _ewa_weight(r2), 0.0)
            texv = _texel(dev, level, s0 + ds_i, t0 + dt_i)
            acc = acc + texv * wgt[..., None]
            wsum = wsum + wgt
    return acc / jnp.maximum(wsum, 1e-9)[..., None]


def ewa_lookup(dev, st, dst0, dst1, max_aniso=8.0):
    """Anisotropic lookup (mipmap.rs lookup_d): clamp eccentricity to
    max_aniso, choose the level from the minor radius, lerp two levels."""
    n_levels = dev["n_levels"]
    l0_sq = jnp.sum(dst0 * dst0, axis=-1)
    l1_sq = jnp.sum(dst1 * dst1, axis=-1)
    swap = l0_sq < l1_sq
    major = jnp.where(swap[..., None], dst1, dst0)
    minor_v = jnp.where(swap[..., None], dst0, dst1)
    major_len = jnp.sqrt(jnp.maximum(jnp.sum(major * major, -1), 1e-20))
    minor_len = jnp.sqrt(jnp.maximum(jnp.sum(minor_v * minor_v, -1), 0.0))
    scale = jnp.where(
        (minor_len * max_aniso < major_len) & (minor_len > 0.0),
        major_len / jnp.maximum(minor_len * max_aniso, 1e-20),
        1.0,
    )
    minor_v = minor_v * scale[..., None]
    minor_len = minor_len * scale
    degenerate = minor_len <= 1e-9

    lod = jnp.clip(
        n_levels - 1 + jnp.log2(jnp.maximum(minor_len, 1e-9)), 0.0, n_levels - 1.0
    )
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_levels - 1)
    dt = (lod - l0)[..., None]
    out = (1 - dt) * _ewa_level(dev, l0, st, major, minor_v) + dt * _ewa_level(
        dev, l1, st, major, minor_v
    )
    fallback = _bilerp_level(dev, jnp.zeros_like(l0), st)
    return jnp.where(degenerate[..., None], fallback, out)
