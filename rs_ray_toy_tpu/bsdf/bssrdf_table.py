"""Photon-beam-diffusion BSSRDF table (bssrdf.rs:281-553).

Host-built (numpy f64) tabulation of the classical dipole + single-
scattering profile over (albedo rho, unitless optical radius) — the
TabulatedBSSRDF machinery.  The reference defines but never *constructs*
TabulatedBSSRDF (its loader wires only DisneyBSSRDF, disney.rs:374), so
this module exists for component parity and as the ground-truth profile
the Burley approximation (bsdf/bssrdf.py) stands in for.

All math mirrors bssrdf.rs:443-594; integration over the beam uses the
same 100-point exponential-stratified rule.
"""

from dataclasses import dataclass, field

import numpy as np

from ..core.interpolation import (
    catmull_rom_weights,
    integrate_catmull_rom,
    sample_catmull_rom_2d,
)

INV_4_PI = 1.0 / (4.0 * np.pi)


def fresnel_moment1(eta):
    """(bssrdf.rs:443-457)"""
    eta2, eta3 = eta * eta, eta**3
    eta4, eta5 = eta**4, eta**5
    if eta < 1.0:
        return (
            0.45966 - 1.73965 * eta + 3.37668 * eta2 - 3.904945 * eta3
            + 2.49277 * eta4 - 0.68441 * eta5
        )
    return (
        -4.61686 + 11.1136 * eta - 10.4646 * eta2 + 5.11455 * eta3
        - 1.27198 * eta4 + 0.12746 * eta5
    )


def fresnel_moment2(eta):
    """(bssrdf.rs:459-481)"""
    eta2, eta3 = eta * eta, eta**3
    eta4, eta5 = eta**4, eta**5
    if eta < 1.0:
        return (
            0.27614 - 0.87350 * eta + 1.12077 * eta2 - 0.65095 * eta3
            + 0.07883 * eta4 + 0.04860 * eta5
        )
    r_eta = 1.0 / eta
    r_eta2, r_eta3 = r_eta * r_eta, r_eta**3
    return (
        -547.033 + 45.3087 * r_eta3 - 218.725 * r_eta2 + 458.843 * r_eta
        + 404.557 * eta - 189.519 * eta2 + 54.9327 * eta3
        - 9.00603 * eta4 + 0.63942 * eta5
    )


def _fr_dielectric(cos_i, eta_i, eta_t):
    """reflection.rs fr_dielectric, scalar/array host form."""
    cos_i = np.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = np.where(entering, eta_i, eta_t)
    et = np.where(entering, eta_t, eta_i)
    cos_i = np.abs(cos_i)
    sin_t = ei / et * np.sqrt(np.maximum(0.0, 1.0 - cos_i * cos_i))
    cos_t = np.sqrt(np.maximum(0.0, 1.0 - sin_t * sin_t))
    r_par = (et * cos_i - ei * cos_t) / (et * cos_i + ei * cos_t)
    r_perp = (ei * cos_i - et * cos_t) / (ei * cos_i + et * cos_t)
    fr = 0.5 * (r_par * r_par + r_perp * r_perp)
    return np.where(sin_t >= 1.0, 1.0, fr)


def _phase_hg(cos_theta, g):
    """(medium/mod.rs:12-21)"""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4_PI * (1.0 - g * g) / (denom * np.sqrt(np.maximum(denom, 1e-30)))


def beam_diffusion_ms(sigma_s, sigma_a, g, eta, r, n_samples=100):
    """Multiple-scattering dipole term (bssrdf.rs:483-530), vectorized
    over the 100 exponentially-stratified source depths."""
    sigmap_s = sigma_s * (1.0 - g)
    sigmap_t = sigma_a + sigmap_s
    if sigmap_t <= 0.0:
        return 0.0
    rhop = sigmap_s / sigmap_t
    d_g = (2.0 * sigma_a + sigmap_s) / (3.0 * sigmap_t * sigmap_t)
    sigma_tr = np.sqrt(sigma_a / d_g)
    fm1, fm2 = fresnel_moment1(eta), fresnel_moment2(eta)
    ze = -2.0 * d_g * (1.0 + 3.0 * fm2) / (1.0 - 2.0 * fm1)
    c_phi = 0.25 * (1.0 - 2.0 * fm1)
    c_e = 0.5 * (1.0 - 3.0 * fm2)

    i = np.arange(n_samples, dtype=np.float64)
    zr = -np.log(1.0 - (i + 0.5) / n_samples) / sigmap_t
    zv = -zr + 2.0 * ze
    dr = np.sqrt(r * r + zr * zr)
    dv = np.sqrt(r * r + zv * zv)
    phi_d = INV_4_PI / d_g * (np.exp(-sigma_tr * dr) / dr - np.exp(-sigma_tr * dv) / dv)
    ed_n = INV_4_PI * (
        zr * (1.0 + sigma_tr * dr) * np.exp(-sigma_tr * dr) / dr**3
        - zv * (1.0 + sigma_tr * dv) * np.exp(-sigma_tr * dv) / dv**3
    )
    kappa = 1.0 - np.exp(-2.0 * sigmap_t * (dr + zr))
    return float(np.mean(kappa * rhop * rhop * (phi_d * c_phi + ed_n * c_e)))


def beam_diffusion_ss(sigma_s, sigma_a, g, eta, r, n_samples=100):
    """Single-scattering term (bssrdf.rs:532-553)."""
    sigma_t = sigma_a + sigma_s
    if sigma_t <= 0.0:
        return 0.0
    rho = sigma_s / sigma_t
    t_crit = r * np.sqrt(max(eta * eta - 1.0, 0.0))
    i = np.arange(n_samples, dtype=np.float64)
    ti = t_crit - np.log(1.0 - (i + 0.5) / n_samples) / sigma_t
    d = np.sqrt(r * r + ti * ti)
    cos_theta_o = ti / d
    ess = (
        rho
        * np.exp(-sigma_t * (d + t_crit))
        / (d * d)
        * _phase_hg(cos_theta_o, g)
        * (1.0 - _fr_dielectric(-cos_theta_o, 1.0, eta))
        * np.abs(cos_theta_o)
    )
    return float(np.mean(ess))


@dataclass
class BSSRDFTable:
    """(bssrdf.rs:281-317)"""

    n_rho_samples: int = 100
    n_radius_samples: int = 64
    rho_samples: np.ndarray = field(default=None)
    radius_samples: np.ndarray = field(default=None)
    profile: np.ndarray = field(default=None)
    rho_eff: np.ndarray = field(default=None)
    profile_cdf: np.ndarray = field(default=None)

    def eval_profile(self, rho_index, radius_index):
        return self.profile[rho_index * self.n_radius_samples + radius_index]


def compute_beam_diffusion_bssrdf(g, eta, n_rho=100, n_radius=64):
    """(bssrdf.rs:554-594): build the full (rho, r_optical) profile table,
    its per-row CDFs, and the effective albedo map."""
    t = BSSRDFTable(n_rho, n_radius)
    rs = np.zeros(n_radius)
    rs[1] = 2.5e-3
    for i in range(2, n_radius):
        rs[i] = rs[i - 1] * 1.2
    t.radius_samples = rs
    i = np.arange(n_rho, dtype=np.float64)
    t.rho_samples = (1.0 - np.exp(-8.0 * i / (n_rho - 1.0))) / (1.0 - np.exp(-8.0))
    t.profile = np.zeros(n_rho * n_radius)
    t.profile_cdf = np.zeros(n_rho * n_radius)
    t.rho_eff = np.zeros(n_rho)
    for ri in range(n_rho):
        rho = t.rho_samples[ri]
        for j in range(n_radius):
            r = rs[j]
            t.profile[ri * n_radius + j] = (
                2.0
                * np.pi
                * r
                * (
                    beam_diffusion_ss(rho, 1.0 - rho, g, eta, r)
                    + beam_diffusion_ms(rho, 1.0 - rho, g, eta, r)
                )
            )
        t.rho_eff[ri] = integrate_catmull_rom(
            rs, t.profile, ri * n_radius, t.profile_cdf
        )
    return t


def sr_tabulated(table: BSSRDFTable, rho, sigma_t, r):
    """TabulatedBSSRDF::sr for one channel (bssrdf.rs:318-360): profile
    lookup at (rho, r * sigma_t), scaled back to per-area units and
    cancelled by the r_optical/r substitution exactly as the reference."""
    r_optical = r * sigma_t
    ok1, o1, w1 = catmull_rom_weights(table.rho_samples, rho)
    ok2, o2, w2 = catmull_rom_weights(table.radius_samples, r_optical)
    if not (ok1 and ok2):
        return 0.0
    sr = 0.0
    for i in range(4):
        if w1[i] == 0.0:
            continue
        for j in range(4):
            if w2[j] == 0.0:
                continue
            sr += table.eval_profile(o1 + i, o2 + j) * w1[i] * w2[j]
    if r_optical != 0.0:
        sr /= 2.0 * np.pi * r_optical
    return max(0.0, sr * sigma_t * sigma_t)


def sample_sr_tabulated(table: BSSRDFTable, rho, sigma_t, u):
    """TabulatedBSSRDF::sample_sr (bssrdf.rs:362-378): invert the
    alpha-interpolated radius CDF; returns radius in world units (-1 on
    zero extinction like the reference)."""
    if sigma_t == 0.0:
        return -1.0
    r_opt, _, _ = sample_catmull_rom_2d(
        table.rho_samples, table.radius_samples, table.profile, table.profile_cdf,
        rho, u,
    )
    return r_opt / sigma_t
