"""Catmull-Rom + beam-diffusion table tests (interpolation.rs,
bssrdf.rs:281-594).  Pure host numpy — no device code."""

import numpy as np

from rs_ray_toy_tpu.core.interpolation import (
    catmull_rom_weights,
    find_interval,
    integrate_catmull_rom,
    sample_catmull_rom_2d,
)
from rs_ray_toy_tpu.bsdf.bssrdf_table import (
    BSSRDFTable,
    beam_diffusion_ms,
    beam_diffusion_ss,
    compute_beam_diffusion_bssrdf,
    fresnel_moment1,
    fresnel_moment2,
    sample_sr_tabulated,
    sr_tabulated,
)


def test_find_interval():
    nodes = [0.0, 1.0, 2.0, 5.0]
    assert find_interval(4, lambda i: nodes[i] <= 0.5) == 0
    assert find_interval(4, lambda i: nodes[i] <= 1.0) == 1
    assert find_interval(4, lambda i: nodes[i] <= 4.9) == 2
    # clamped at both ends
    assert find_interval(4, lambda i: nodes[i] <= -1.0) == 0
    assert find_interval(4, lambda i: nodes[i] <= 99.0) == 2


def test_catmull_rom_weights_partition_of_unity():
    nodes = np.array([0.0, 0.7, 1.3, 2.0, 3.5])
    for x in (0.0, 0.35, 0.7, 1.0, 1.9, 3.5):
        ok, off, w = catmull_rom_weights(nodes, x)
        assert ok
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
    ok, _, _ = catmull_rom_weights(nodes, -0.1)
    assert not ok


def test_catmull_rom_interpolates_nodes():
    nodes = np.array([0.0, 1.0, 2.0, 3.0])
    values = np.array([5.0, -2.0, 7.0, 0.5])
    for i, x in enumerate(nodes):
        ok, off, w = catmull_rom_weights(nodes, float(x))
        assert ok
        got = sum(
            values[off + j] * w[j]
            for j in range(4)
            if w[j] != 0.0 and 0 <= off + j < 4
        )
        np.testing.assert_allclose(got, values[i], atol=1e-12)


def test_integrate_catmull_rom_linear_exact():
    # spline through a linear function IS that function -> exact integral
    x = np.array([0.0, 0.5, 1.25, 2.0, 4.0])
    vals = 3.0 * x + 1.0
    cdf = np.zeros(len(x))
    total = integrate_catmull_rom(x, vals, 0, cdf)
    want = 1.5 * 16.0 + 4.0  # int_0^4 3x+1
    np.testing.assert_allclose(total, want, rtol=1e-12)
    assert np.all(np.diff(cdf) > 0)


def test_sample_catmull_rom_2d_uniform_rows():
    # two identical rows of a linear density f(r)=r on [0, 2]
    nodes1 = np.array([0.0, 1.0])
    nodes2 = np.linspace(0.0, 2.0, 33)
    prof = np.tile(nodes2, 2)
    cdf = np.zeros_like(prof)
    for i in range(2):
        integrate_catmull_rom(nodes2, prof, i * 33, cdf)
    # f(r)=r on [0,2]: CDF r^2/4 -> sampling u gives 2*sqrt(u)
    for u in (0.04, 0.25, 0.64, 0.9):
        r, fval, pdf = sample_catmull_rom_2d(nodes1, nodes2, prof, cdf, 0.5, u)
        np.testing.assert_allclose(r, 2.0 * np.sqrt(u), atol=2e-3)
        np.testing.assert_allclose(fval, r, atol=2e-3)
        np.testing.assert_allclose(pdf, r / 2.0, atol=2e-3)


def test_fresnel_moments_continuity_and_sign():
    # the two polynomial fits meet near eta=1 and stay in [0, 1)
    for fm in (fresnel_moment1, fresnel_moment2):
        lo, hi = fm(0.999), fm(1.001)
        assert abs(lo - hi) < 2e-2
    for eta in (1.1, 1.33, 1.5, 2.0):
        assert 0.0 < fresnel_moment1(eta) < 1.0
        assert 0.0 < fresnel_moment2(eta) < 1.0


def test_beam_diffusion_positive_and_decaying():
    for fn in (beam_diffusion_ms, beam_diffusion_ss):
        vals = [fn(0.8, 0.2, 0.0, 1.33, r) for r in (0.05, 0.3, 1.0, 3.0)]
        assert all(v >= 0.0 for v in vals)
        # monotone decay in radius at moderate albedo
        assert vals[0] > vals[-1]


def test_beam_diffusion_table():
    t = compute_beam_diffusion_bssrdf(g=0.0, eta=1.33, n_rho=20, n_radius=24)
    assert np.all(t.profile >= 0.0)
    # rho_eff: effective albedo grows monotonically with single-scatter
    # albedo and stays in [0, 1)
    assert np.all(np.diff(t.rho_eff) >= -1e-12)
    assert t.rho_eff[0] == 0.0
    assert t.rho_eff[-1] < 1.0
    # per-row CDFs are monotone
    for i in range(20):
        row = t.profile_cdf[i * 24 : (i + 1) * 24]
        assert np.all(np.diff(row) >= -1e-15)


def test_tabulated_sr_and_sample_consistency():
    """sr integrates (over area) to ~rho_eff, and sample_sr follows the
    tabulated CDF (bssrdf.rs:318-378)."""
    t = compute_beam_diffusion_bssrdf(g=0.0, eta=1.33, n_rho=32, n_radius=48)
    rho, sigma_t = 0.7, 2.0
    # integral of sr(r) 2 pi r dr over world radius == rho_eff(rho)
    rs = np.linspace(1e-5, t.radius_samples[-1] / sigma_t, 20001)
    sr = np.array([sr_tabulated(t, rho, sigma_t, r) for r in rs])
    integ = np.trapezoid(sr * 2 * np.pi * rs, rs)
    ok, off, w = catmull_rom_weights(t.rho_samples, rho)
    want = sum(t.rho_eff[off + i] * w[i] for i in range(4) if w[i] != 0.0)
    np.testing.assert_allclose(integ, want, rtol=2e-2)
    # sampled radii follow the profile CDF (median check)
    us = np.linspace(0.01, 0.99, 99)
    radii = np.array([sample_sr_tabulated(t, rho, sigma_t, u) for u in us])
    assert np.all(np.diff(radii) > 0)  # monotone in u
    # CDF(sample(u)) == u: evaluate empirically via the sr integral
    cdf_at = np.array(
        [np.trapezoid(sr[rs <= rv] * 2 * np.pi * rs[rs <= rv], rs[rs <= rv]) for rv in radii[::20]]
    ) / want
    np.testing.assert_allclose(cdf_at, us[::20], atol=0.02)
