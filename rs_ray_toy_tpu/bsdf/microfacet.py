"""Microfacet distributions, batched (microfacet.rs).

Trowbridge-Reitz (GGX) and Beckmann D/Lambda, with TR visible-area slope
sampling (microfacet.rs trowbridge_reitz_sample) — the only sampler the
reference's material recipes actually instantiate (all use
TrowbridgeReitzDistribution::new(..., true)).  Beckmann full-distribution
sampling is provided for completeness.

All functions take local-frame unit vectors with z = shading normal.
"""

import jax.numpy as jnp

from ..config import PI
from ..core import vec


def roughness_to_alpha(rough):
    """(microfacet.rs:12-20)"""
    r = jnp.maximum(rough, 1e-3)
    x = jnp.log(r)
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x * x
        + 0.0171201 * x**3
        + 0.000640711 * x**4
    )


def _cos2_theta(w):
    return w[..., 2] * w[..., 2]


def _sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - _cos2_theta(w))


def _tan2_theta(w):
    c2 = _cos2_theta(w)
    return _sin2_theta(w) / jnp.where(c2 == 0.0, 1e-30, c2)


def _cos2_sin2_phi(w):
    s2 = _sin2_theta(w)
    sin_t = jnp.sqrt(s2)
    safe = jnp.where(sin_t == 0.0, 1.0, sin_t)
    cos_p = jnp.where(sin_t == 0.0, 1.0, jnp.clip(w[..., 0] / safe, -1.0, 1.0))
    sin_p = jnp.where(sin_t == 0.0, 0.0, jnp.clip(w[..., 1] / safe, -1.0, 1.0))
    return cos_p * cos_p, sin_p * sin_p


def tr_d(wh, ax, ay):
    """GGX normal distribution (microfacet.rs TrowbridgeReitz d)."""
    t2 = _tan2_theta(wh)
    c4 = _cos2_theta(wh) ** 2
    c2p, s2p = _cos2_sin2_phi(wh)
    e = (c2p / (ax * ax) + s2p / (ay * ay)) * t2
    d = 1.0 / (PI * ax * ay * c4 * (1.0 + e) ** 2)
    return jnp.where(jnp.isfinite(t2) & (c4 > 0.0), d, 0.0)


def tr_lambda(w, ax, ay):
    t2 = _tan2_theta(w)
    c2p, s2p = _cos2_sin2_phi(w)
    alpha2 = c2p * ax * ax + s2p * ay * ay
    a2t2 = alpha2 * t2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(jnp.isfinite(t2), lam, 0.0)


def beckmann_d(wh, ax, ay):
    t2 = _tan2_theta(wh)
    c4 = _cos2_theta(wh) ** 2
    c2p, s2p = _cos2_sin2_phi(wh)
    d = jnp.exp(-t2 * (c2p / (ax * ax) + s2p / (ay * ay))) / (
        PI * ax * ay * jnp.maximum(c4, 1e-20)
    )
    return jnp.where(jnp.isfinite(t2) & (c4 > 0.0), d, 0.0)


def beckmann_lambda(w, ax, ay):
    abs_tan = jnp.sqrt(_tan2_theta(w))
    c2p, s2p = _cos2_sin2_phi(w)
    alpha = jnp.sqrt(c2p * ax * ax + s2p * ay * ay)
    a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-20)
    lam = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    lam = jnp.where(a >= 1.6, 0.0, lam)
    return jnp.where(jnp.isfinite(abs_tan), lam, 0.0)


def g1(lam):
    return 1.0 / (1.0 + lam)


def g2(lam_o, lam_i):
    return 1.0 / (1.0 + lam_o + lam_i)


def mf_pdf(d_val, lam_o, wo, wh, sample_visible):
    """distribution pdf of wh given wo (microfacet.rs pdf)."""
    abs_cos_o = jnp.abs(wo[..., 2])
    vis = d_val * g1(lam_o) * vec.absdot(wo, wh) / jnp.maximum(abs_cos_o, 1e-20)
    full = d_val * jnp.abs(wh[..., 2])
    return jnp.where(sample_visible, vis, full)


def _tr_sample_11(cos_theta, u1, u2):
    """Visible-slope sampling in the stretched frame
    (microfacet.rs trowbridge_reitz_sample_11), fully branchless."""
    # normal-incidence special case
    r_spec = jnp.sqrt(u1 / jnp.maximum(1.0 - u1, 1e-9))
    phi_spec = 2.0 * PI * u2
    sx_spec = r_spec * jnp.cos(phi_spec)
    sy_spec = r_spec * jnp.sin(phi_spec)

    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    tan_theta = sin_theta / jnp.maximum(cos_theta, 1e-9)
    a_inv = 1.0 / jnp.maximum(tan_theta, 1e-9)
    g1v = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / (a_inv * a_inv)))

    a = 2.0 * u1 / g1v - 1.0
    tmp = jnp.minimum(1.0 / jnp.maximum(a * a - 1.0, 1e-12), 1e10)
    # sign-safe: a*a-1 can be negative; PBRT relies on tmp clamp; emulate
    tmp = jnp.where(a * a - 1.0 <= 0.0, 1e10, tmp)
    b = tan_theta
    dsc = jnp.maximum(b * b * tmp * tmp - (a * a - b * b) * tmp, 0.0)
    d = jnp.sqrt(dsc)
    sx1 = b * tmp - d
    sx2 = b * tmp + d
    sx = jnp.where((a < 0.0) | (sx2 > 1.0 / jnp.maximum(tan_theta, 1e-9)), sx1, sx2)

    s = jnp.where(u2 > 0.5, 1.0, -1.0)
    nu2 = jnp.where(u2 > 0.5, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
    z = (nu2 * (nu2 * (nu2 * 0.27385 - 0.73369) + 0.46341)) / (
        nu2 * (nu2 * (nu2 * 0.093073 + 0.309420) - 1.0) + 0.597999
    )
    sy = s * z * jnp.sqrt(1.0 + sx * sx)

    near_normal = cos_theta > 0.9999
    return (
        jnp.where(near_normal, sx_spec, sx),
        jnp.where(near_normal, sy_spec, sy),
    )


def tr_sample_wh_visible(wo, ax, ay, u):
    """(microfacet.rs trowbridge_reitz_sample + sample_wh visible branch)"""
    flip = wo[..., 2] < 0.0
    w = jnp.where(flip[..., None], -wo, wo)
    # stretch
    ws = vec.normalize(
        jnp.stack([ax * w[..., 0], ay * w[..., 1], w[..., 2]], axis=-1)
    )
    sx, sy = _tr_sample_11(ws[..., 2], u[..., 0], u[..., 1])
    # rotate
    s2 = _sin2_theta(ws)
    sin_t = jnp.sqrt(s2)
    safe = jnp.where(sin_t == 0.0, 1.0, sin_t)
    cos_p = jnp.where(sin_t == 0.0, 1.0, ws[..., 0] / safe)
    sin_p = jnp.where(sin_t == 0.0, 0.0, ws[..., 1] / safe)
    rx = cos_p * sx - sin_p * sy
    ry = sin_p * sx + cos_p * sy
    # unstretch + normal
    wh = vec.normalize(jnp.stack([-ax * rx, -ay * ry, jnp.ones_like(rx)], axis=-1))
    return jnp.where(flip[..., None], -wh, wh)


def tr_sample_wh_full(wo, ax, ay, u):
    """Full-distribution sampling (isotropic fast path; microfacet.rs
    sample_wh non-visible branch)."""
    tan2 = ax * ax * u[..., 0] / jnp.maximum(1.0 - u[..., 0], 1e-9)
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * PI * u[..., 1]
    wh = vec.spherical_direction(sin_t, cos_t, phi)
    flip = wo[..., 2] * wh[..., 2] <= 0.0
    return jnp.where(flip[..., None], -wh, wh)


def _beckmann_sample_11(cos_theta_i, u1, u2):
    """Visible-area slope sampling for Beckmann, vectorized
    (microfacet.rs:60-133): Newton-bisection inversion in the erf
    domain, 10 fixed trips with converged lanes frozen."""
    from ..core.math import erf, erf_inv

    sqrt_pi_inv = 1.0 / jnp.sqrt(jnp.pi)
    u1s = jnp.maximum(u1, 1e-6)
    u2s = jnp.maximum(u2, 1e-6)

    # general incidence
    cos_i = jnp.clip(cos_theta_i, -0.99999, 0.99999)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    tan_i = sin_i / cos_i
    cot_i = 1.0 / jnp.where(tan_i == 0.0, 1e-9, tan_i)
    a = jnp.full_like(u1, -1.0)
    c_hi = erf(cot_i)
    theta_i = jnp.arccos(cos_i)
    fit = 1.0 + theta_i * (-0.876 + theta_i * (0.4265 - 0.0594 * theta_i))
    b = c_hi - (1.0 + c_hi) * jnp.power(1.0 - u1s, fit)
    norm = 1.0 / (
        1.0 + c_hi + sqrt_pi_inv * tan_i * jnp.exp(-cot_i * cot_i)
    )
    done = jnp.zeros_like(u1, bool)
    for _ in range(10):
        b = jnp.where(~((b >= a) & (b <= c_hi)), 0.5 * (a + c_hi), b)
        inv_erf = erf_inv(b)
        value = (
            norm * (1.0 + b + sqrt_pi_inv * tan_i * jnp.exp(-inv_erf * inv_erf))
            - u1s
        )
        deriv = norm * (1.0 - inv_erf * tan_i)
        conv = jnp.abs(value) < 1e-5
        step = value / jnp.where(jnp.abs(deriv) < 1e-12, 1e-12, deriv)
        c_hi = jnp.where(~done & ~conv & (value > 0.0), b, c_hi)
        a = jnp.where(~done & ~conv & (value <= 0.0), b, a)
        b = jnp.where(done | conv, b, b - step)
        done = done | conv
    slope_x = erf_inv(jnp.clip(b, -0.99999, 0.99999))
    slope_y = erf_inv(jnp.clip(2.0 * u2s - 1.0, -0.99999, 0.99999))

    # normal-incidence special case (microfacet.rs:62-68)
    r = jnp.sqrt(-jnp.log(jnp.maximum(1.0 - u1, 1e-12)))
    phi = 2.0 * PI * u2
    near_n = cos_theta_i > 0.9999
    slope_x = jnp.where(near_n, r * jnp.cos(phi), slope_x)
    slope_y = jnp.where(near_n, r * jnp.sin(phi), slope_y)
    return slope_x, slope_y


def beckmann_sample_wh_visible(wo, ax, ay, u):
    """(microfacet.rs beckmann_sample + sample_wh visible branch):
    stretch, sample P22, rotate, unstretch — same scaffold as TR."""
    flip = wo[..., 2] < 0.0
    w = jnp.where(flip[..., None], -wo, wo)
    ws = vec.normalize(
        jnp.stack([ax * w[..., 0], ay * w[..., 1], w[..., 2]], axis=-1)
    )
    sx, sy = _beckmann_sample_11(ws[..., 2], u[..., 0], u[..., 1])
    s2 = _sin2_theta(ws)
    sin_t = jnp.sqrt(s2)
    safe = jnp.where(sin_t == 0.0, 1.0, sin_t)
    cos_p = jnp.where(sin_t == 0.0, 1.0, ws[..., 0] / safe)
    sin_p = jnp.where(sin_t == 0.0, 0.0, ws[..., 1] / safe)
    rx = cos_p * sx - sin_p * sy
    ry = sin_p * sx + cos_p * sy
    wh = vec.normalize(jnp.stack([-ax * rx, -ay * ry, jnp.ones_like(rx)], axis=-1))
    return jnp.where(flip[..., None], -wh, wh)


def beckmann_sample_wh_full(wo, ax, ay, u):
    """Full-distribution Beckmann sampling (microfacet.rs:196-231), the
    anisotropic log-sample form; reduces to the isotropic branch when
    ax == ay."""
    log_sample = jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-12))
    # anisotropic phi (atan tan quadrant-corrected)
    phi_a = jnp.arctan(ay / ax * jnp.tan(2.0 * PI * u[..., 1] + 0.5 * PI))
    phi_a = jnp.where(u[..., 1] > 0.5, phi_a + PI, phi_a)
    phi_i = 2.0 * PI * u[..., 1]
    iso = ax == ay
    phi = jnp.where(iso, phi_i, phi_a)
    sin_p = jnp.sin(phi)
    cos_p = jnp.cos(phi)
    tan2_a = -log_sample / (
        cos_p * cos_p / jnp.maximum(ax * ax, 1e-12)
        + sin_p * sin_p / jnp.maximum(ay * ay, 1e-12)
    )
    tan2_i = -ax * ax * log_sample
    tan2 = jnp.where(iso, tan2_i, tan2_a)
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    wh = vec.spherical_direction(sin_t, cos_t, phi)
    flip = wo[..., 2] * wh[..., 2] <= 0.0
    return jnp.where(flip[..., None], -wh, wh)
