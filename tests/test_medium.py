"""Media unit tests (medium/homogeneous.rs, medium/grid.rs)."""

import numpy as np
import jax.numpy as jnp

from rs_ray_toy_tpu.scene.loader import MediumSpec
from rs_ray_toy_tpu.scene import medium as med


def _homog(sigma_a, sigma_s, g=0.0):
    return med.pack_mediums(
        [MediumSpec("homogeneous", np.asarray(sigma_a), np.asarray(sigma_s), g)]
    )


def test_homogeneous_tr_beer_lambert():
    m = _homog([0.5, 1.0, 2.0], [0.0, 0.0, 0.0])
    n = 4
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    seg = jnp.array([0.5, 1.0, 2.0, 4.0])
    state = jnp.arange(n, dtype=jnp.uint32)
    tr, _ = med.medium_tr(m, jnp.zeros(n, jnp.int32), o, d, seg, state)
    want = np.exp(-np.outer(np.asarray(seg), [0.5, 1.0, 2.0]))
    assert np.allclose(tr, want, rtol=1e-5)
    # vacuum rays unaffected
    tr2, _ = med.medium_tr(m, jnp.full(n, -1, jnp.int32), o, d, seg, state)
    assert np.allclose(tr2, 1.0)


def test_homogeneous_sample_unbiased_transmittance():
    """E[beta * indicator(passed)] should equal Tr for pure absorption...
    with scattering, E[beta | continue] integrates source terms; here we
    check the standard identity: mean weight of pass-through samples
    approximates exp(-sigma_t L) when sigma_s = sigma_t (albedo 1)."""
    sigma = [1.0, 1.0, 1.0]
    m = _homog([0.0, 0.0, 0.0], sigma)
    n = 50000
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    L = 1.3
    seg = jnp.full((n,), L)
    state = jnp.arange(n, dtype=jnp.uint32)
    beta, sampled, t, _ = med.medium_sample(m, jnp.zeros(n, jnp.int32), o, d, seg, state)
    beta = np.asarray(beta)[:, 0]
    sampled = np.asarray(sampled)
    # pass-through estimator: E[beta * !sampled] = Tr(L)
    est_pass = np.mean(beta * (~sampled))
    assert abs(est_pass - np.exp(-1.0 * L)) < 0.02
    # scatter probability = 1 - Tr
    assert abs(sampled.mean() - (1 - np.exp(-L))) < 0.02
    # sampled distances lie inside the segment
    assert float(jnp.max(jnp.where(sampled, t, 0.0))) <= L + 1e-5


def test_grid_medium_tracking():
    """Uniform density-1 grid behaves like a homogeneous medium inside the
    unit box."""
    spec = MediumSpec(
        "grid",
        np.zeros(3),
        np.array([2.0, 2.0, 2.0]),
        0.0,
        nx=4, ny=4, nz=4,
        density=np.ones((4, 4, 4)),
        world_to_medium=np.eye(4),
    )
    m = med.pack_mediums([spec])
    n = 30000
    o = jnp.tile(jnp.array([[0.5, 0.5, -1.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    seg = jnp.full((n,), 10.0)
    state = jnp.arange(n, dtype=jnp.uint32)
    tr, _ = med.medium_tr(m, jnp.zeros(n, jnp.int32), o, d, seg, state)
    # expected transmittance through 1 unit of sigma_t=2: e^-2
    est = float(jnp.mean(tr[:, 0]))
    assert abs(est - np.exp(-2.0)) < 0.02
    beta, sampled, t, _ = med.medium_sample(
        m, jnp.zeros(n, jnp.int32), o, d, seg, state + 7
    )
    # scatter probability 1 - e^-2 inside the box
    assert abs(float(jnp.mean(sampled)) - (1 - np.exp(-2.0))) < 0.02
    ts = np.asarray(t)[np.asarray(sampled)]
    assert ts.min() >= 1.0 - 1e-4 and ts.max() <= 2.0 + 1e-4


def test_hg_phase_normalization():
    """Integral of phase over the sphere = 1."""
    rng = np.random.default_rng(0)
    n = 100000
    u = rng.uniform(size=(n, 2))
    z = 1 - 2 * u[:, 0]
    for g in (0.0, 0.4, -0.7):
        p = np.asarray(med.phase_hg(jnp.asarray(z), g))
        est = 4 * np.pi * p.mean()  # uniform sphere MC
        assert abs(est - 1.0) < 0.02


def test_hg_sample_mean_cosine():
    """E[cos(wo, wi)] of HG samples = -g: both wo and wi point away from
    the collision (phase_hg peaks at cos = -1 for g>0, i.e. wi ~ -wo is
    forward scattering), matching the reference's p(wo,wi) convention."""
    n = 60000
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    wo = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    for g in (0.0, 0.5, -0.3):
        wi, p = med.hg_sample(wo, jnp.full((n,), g), u)
        cos = np.asarray(jnp.sum(wi * wo, axis=-1))
        assert abs(cos.mean() + g) < 0.02
        # returned p equals the phase function at the sampled angle
        assert np.allclose(
            np.asarray(p), np.asarray(med.phase_hg(jnp.asarray(cos), g)), rtol=1e-3
        )
