"""Separable BSSRDF with the Burley diffusion profile (bssrdf.rs,
material/disney.rs DisneyBSSRDF).

Wavefront form: rays that specular-transmit into a BSSRDF material
importance-sample an exit point via the projection-axis / channel / radius
scheme (bssrdf.rs:107-193) — the probe-ray "intersection chain" becomes a
bounded loop of PROBE_SEGMENTS shadowed re-casts collecting same-material
hits; one is picked uniformly and weighted by pdf_sp (bssrdf.rs:195-232,
the 3-axis x 3-channel MIS) / n_found.

Profile (Burley 2015 eq 5, disney.rs sr/sample_sr):
  Sr(r) = R (e^{-r/d} + e^{-r/(3d)}) / (8 pi d r)
sampled by picking the d or 3d exponential (1:3 split).  The reference's
pdf_sr misparenthesizes the second exponential (disney.rs pdf_sr:
exp(3d) in the denominator); we use the PBRT-intended pdf, which is the
correct MIS density for its own sampler (docs/PARITY.md).

The exit ("Sw") adapter BSDF (bssrdf.rs:250-279): f = (1-Fr(cos w))/(c pi)
scaled by eta^2 in radiance mode, cosine-sampled.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..config import DTYPE, PI, ONE_MINUS_EPSILON
from ..core import vec
from ..accel import geometry as geom
from .eval import fr_dielectric

PROBE_SEGMENTS = 4  # bounded intersection-chain length


def fresnel_moment1(eta):
    """(bssrdf.rs:443-457) polynomial fit."""
    eta2 = eta * eta
    eta3 = eta2 * eta
    eta4 = eta3 * eta
    eta5 = eta4 * eta
    lo = (
        0.45966 - 1.73965 * eta + 3.37668 * eta2 - 3.904945 * eta3
        + 2.49277 * eta4 - 0.68441 * eta5
    )
    hi = (
        -4.61686 + 11.1136 * eta - 10.4646 * eta2 + 5.11455 * eta3
        - 1.27198 * eta4 + 0.12746 * eta5
    )
    return jnp.where(eta < 1.0, lo, hi)


def sr_profile(R, d, r):
    """Sr(r): (N,3)."""
    rr = jnp.maximum(r, 1e-6)[..., None]
    return (
        R
        * (jnp.exp(-rr / d) + jnp.exp(-rr / (3.0 * d)))
        / (8.0 * PI * d * rr)
    )


def sample_sr(d_ch, u):
    """Radius sample from the channel's profile (disney.rs sample_sr)."""
    first = u < 0.25
    u1 = jnp.minimum(u * 4.0, ONE_MINUS_EPSILON)
    u2 = jnp.minimum((u - 0.25) / 0.75, ONE_MINUS_EPSILON)
    r1 = d_ch * jnp.log(1.0 / (1.0 - u1))
    r2 = 3.0 * d_ch * jnp.log(1.0 / (1.0 - u2))
    return jnp.where(first, r1, r2)


def pdf_sr(d_ch, r):
    """MIS pdf of sample_sr (PBRT-intended form)."""
    rr = jnp.maximum(r, 1e-6)
    return 0.25 * jnp.exp(-rr / d_ch) / (2.0 * PI * d_ch * rr) + 0.75 * jnp.exp(
        -rr / (3.0 * d_ch)
    ) / (6.0 * PI * d_ch * rr)


class BssrdfSample(NamedTuple):
    pi: geom.SurfaceHit  # exit interaction
    sp: jnp.ndarray  # (N,3) spatial term
    pdf: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,)


def sample_bssrdf(ctx, si: geom.SurfaceHit, frame, u1, u2):
    """SeparableBSSRDF::sample_sp batched (bssrdf.rs:107-193).

    si: the entry interactions (valid where the material has a BSSRDF).
    Returns exit interactions + Sp + pdf.
    """
    mats = ctx.mats
    mat_id = jnp.maximum(si.mat, 0)
    has = mats["has_bssrdf"][mat_id] & si.valid
    R = mats["bssrdf_R"][mat_id]
    d_prof = mats["bssrdf_d"][mat_id]

    # projection axis (bssrdf.rs:118-141): 1/2 ns-frame, 1/4 each tangent
    ss, ts, ns = frame.ss, frame.ts, frame.ns
    u = u1
    sel0 = u < 0.5
    sel1 = (u >= 0.5) & (u < 0.75)
    u = jnp.where(sel0, u * 2.0, jnp.where(sel1, (u - 0.5) * 4.0, (u - 0.75) * 4.0))
    vx = jnp.where(sel0[:, None], ss, jnp.where(sel1[:, None], ts, ns))
    vy = jnp.where(sel0[:, None], ts, jnp.where(sel1[:, None], ns, ss))
    vz = jnp.where(sel0[:, None], ns, jnp.where(sel1[:, None], ss, ts))

    # channel (bssrdf.rs:143-145); C = 3 (RGB) or 60 (sampled-spectral)
    C = R.shape[-1]
    ch = jnp.clip((u * C).astype(jnp.int32), 0, C - 1)
    # NOTE bssrdf.rs:145 remaps u1 = u1*u1*N - ch (squaring u — quirk);
    # PBRT uses u1*N - ch.  Replicate the reference for estimator parity.
    u = u * u * float(C) - ch.astype(DTYPE)
    d_ch = jnp.take_along_axis(d_prof, ch[:, None], axis=-1)[:, 0]

    r = sample_sr(d_ch, u2[..., 0])
    r_max = sample_sr(d_ch, jnp.full_like(u2[..., 0], 0.999))
    ok = has & (r >= 0.0) & (r < r_max)
    l_chord = 2.0 * jnp.sqrt(jnp.maximum(r_max * r_max - r * r, 0.0))
    phi = 2.0 * PI * u2[..., 1]

    base = (
        si.p
        + (vx * jnp.cos(phi)[:, None] + vy * jnp.sin(phi)[:, None]) * r[:, None]
        - vz * (l_chord * 0.5)[:, None]
    )
    target = base + vz * l_chord[:, None]

    # probe chain: bounded re-casts, keep same-material hits
    n = si.p.shape[0]
    found_p = jnp.zeros((PROBE_SEGMENTS, n, 3), DTYPE)
    found_valid = jnp.zeros((PROBE_SEGMENTS, n), bool)
    found_hit_kind = jnp.zeros((PROBE_SEGMENTS, n), jnp.int32)
    found_hit_idx = jnp.zeros((PROBE_SEGMENTS, n), jnp.int32)
    cur = base
    alive = ok
    for k in range(PROBE_SEGMENTS):
        seg = target - cur
        seg_len = vec.length(seg)
        d_unit = seg / jnp.maximum(seg_len, 1e-20)[:, None]
        hit = ctx.intersect(cur, d_unit, seg_len * (1.0 - 1e-4))
        got = alive & hit.valid & (seg_len > 1e-9)
        hsi = ctx.surface(hit, cur, d_unit)
        same_mat = got & (hsi.mat == si.mat)
        found_p = found_p.at[k].set(jnp.where(same_mat[:, None], hsi.p, 0.0))
        found_valid = found_valid.at[k].set(same_mat)
        found_hit_kind = found_hit_kind.at[k].set(hit.kind)
        found_hit_idx = found_hit_idx.at[k].set(hit.index)
        cur = jnp.where(
            got[:, None], geom.offset_ray_origin(hsi.p, hsi.ng, d_unit), cur
        )
        alive = got

    n_found = jnp.sum(found_valid, axis=0).astype(jnp.int32)
    ok = ok & (n_found > 0)
    # pick one uniformly (bssrdf.rs:177-180) with the remapped u
    pick = jnp.clip((u * n_found.astype(DTYPE)).astype(jnp.int32), 0, jnp.maximum(n_found - 1, 0))
    # index of the pick-th valid entry
    cum = jnp.cumsum(found_valid.astype(jnp.int32), axis=0)
    slot = jnp.argmax((cum == (pick + 1)[None, :]) & found_valid, axis=0)
    rows = jnp.arange(n)
    sel_kind = found_hit_kind[slot, rows]
    sel_idx = found_hit_idx[slot, rows]
    sel_t = jnp.zeros((n,), DTYPE)
    hit_sel = geom.Hit(t=sel_t, kind=sel_kind, index=sel_idx, valid=ok)
    # rebuild the exit interaction from the recorded position: gather full
    # geometry via surface_interaction against a zero-length ray at found_p
    p_exit = found_p[slot, rows]
    # synthesize: o = p_exit, d = -ns (direction only seeds wo).  The
    # gathered geometric normal / dpdu are ray-independent; barycentric-
    # dependent shading normals are replaced by the face normal for the
    # exit point (probe hits carry no reliable barycentrics here).
    pi = ctx.surface(hit_sel, p_exit, -frame.ns)
    pi = pi._replace(p=p_exit, ns=pi.ng, wo=pi.ng, valid=ok)

    # pdf_sp (bssrdf.rs:195-232) / n_found
    d_vec = si.p - pi.p
    d_local = jnp.stack(
        [vec.dot(ss, d_vec), vec.dot(ts, d_vec), vec.dot(ns, d_vec)], axis=-1
    )
    n_local = jnp.stack(
        [vec.dot(ss, pi.ng), vec.dot(ts, pi.ng), vec.dot(ns, pi.ng)], axis=-1
    )
    r_proj = jnp.stack(
        [
            jnp.sqrt(d_local[:, 1] ** 2 + d_local[:, 2] ** 2),
            jnp.sqrt(d_local[:, 2] ** 2 + d_local[:, 0] ** 2),
            jnp.sqrt(d_local[:, 0] ** 2 + d_local[:, 1] ** 2),
        ],
        axis=-1,
    )
    axis_prob = jnp.asarray([0.25, 0.25, 0.5], DTYPE)
    # sum over the 3 projection axes x all C channels (vectorized; the
    # reference's double loop at bssrdf.rs:214-226)
    pdf_ac = pdf_sr(d_prof[:, None, :], r_proj[:, :, None])  # (N, 3, C)
    pdf = jnp.sum(
        pdf_ac * jnp.abs(n_local)[:, :, None] * axis_prob[None, :, None],
        axis=(1, 2),
    ) * (1.0 / float(C))
    pdf = pdf / jnp.maximum(n_found.astype(DTYPE), 1.0)

    dist = vec.length(si.p - pi.p)
    sp = sr_profile(R, d_prof, dist)
    return BssrdfSample(
        pi=pi,
        sp=jnp.where(ok[:, None], sp, 0.0),
        pdf=jnp.where(ok, pdf, 0.0),
        valid=ok & (pdf > 0.0),
    )


def sw_f(eta, cos_w):
    """Sw adapter f (bssrdf.rs:103-106, 250-279): radiance-mode eta^2
    included (BxDF::f impl)."""
    c = 1.0 - 2.0 * fresnel_moment1(1.0 / eta)
    f = (1.0 - fr_dielectric(cos_w, 1.0, eta)) / jnp.maximum(c * PI, 1e-9)
    return f * eta * eta
