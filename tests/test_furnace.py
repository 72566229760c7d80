"""Absolute (closed-form) end-to-end oracles.

The goldens in test_golden.py lock our own estimator; these gates need no
reference binary and would catch a global estimator scale error:

1. White furnace: a convex Lambertian sphere (albedo rho) under a constant
   environment L sees L from every direction, so its outgoing radiance is
   exactly rho*L (no self-interreflection on a convex body).  Escaped
   camera rays read L.  Holds for Path (integrator/path.rs estimator) and
   DirectLighting.
2. Film filter normalization: pixel value = sum(w_i * L) / sum(w_i) = L for
   constant input radiance, for every filter type (film.rs:323-366).
"""

import json
import os
import shutil
import tempfile

import numpy as np
import jax.numpy as jnp

from tests.test_golden import SAMPLES


RHO = 0.5  # MatteMaterial default kd (renderprocess.rs:670; loader R("kd",0.5))


def _furnace_job(integrator):
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 40, 24
    cfg["float_texture"], cfg["rgb_texture"] = [], []
    cfg["materials"] = [
        {"material_type": "MatteMaterial", "material_name": "mat_m"}
    ]
    cfg["objs"] = []
    # constant unit environment: sampleable ("lights") + escape-le
    # ("infinite_lights") — scene.rs keeps the two lists separately
    cfg["lights"] = [{"light_type": "infinite", "l": {"values": [1.0, 1.0, 1.0]}}]
    cfg["infinite_lights"] = [
        {"light_type": "infinite", "l": {"values": [1.0, 1.0, 1.0]}}
    ]
    cfg["Aggregate"] = {
        "primitives": [
            {
                "primitive_type": "sphere",
                "material_name": "mat_m",
                "radius": 1.0,
            }
        ]
    }
    cfg["Integrator"] = integrator
    td = tempfile.mkdtemp()
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    from rs_ray_toy_tpu.scene.loader import load_scene

    return load_scene(path)


def _furnace_radiance(job, li_fn, n=40000, seed=3):
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    ctx = SceneCtx(job.scene)
    sampler = StratifiedSampler(job.sampler, seed=seed)
    rng = np.random.default_rng(seed)
    # parallel rays down +x through a disk well inside the silhouette
    yz = rng.random((n, 2)) * 1.2 - 0.6
    r = np.hypot(yz[:, 0], yz[:, 1])
    yz = yz[r < 0.6][: n // 2]
    n_hit = yz.shape[0]
    o = jnp.asarray(
        np.concatenate(
            [np.full((n_hit, 1), -5.0), yz], axis=1
        ),
        jnp.float32,
    )
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n_hit, 1))
    w = jnp.ones((n_hit,), jnp.float32)
    pid = jnp.arange(n_hit, dtype=jnp.uint32)
    s_idx = jnp.zeros((n_hit,), jnp.uint32)
    L = np.asarray(li_fn(ctx, o, d, w, sampler, pid, s_idx, job.integrator))
    # escaped rays: aimed away from the sphere
    o2 = o
    d2 = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32), (n_hit, 1))
    L_esc = np.asarray(li_fn(ctx, o2, d2, w, sampler, pid, s_idx, job.integrator))
    return L, L_esc


def test_white_furnace_path():
    from rs_ray_toy_tpu.integrators.path import li_path

    job = _furnace_job({"integrator_type": "Path", "max_depth": 5})
    L, L_esc = _furnace_radiance(job, li_path)
    assert np.isfinite(L).all()
    # escaped rays read the environment exactly
    assert np.allclose(L_esc, 1.0, atol=1e-3), L_esc.mean(0)
    # convex Lambertian furnace: outgoing = rho * L exactly in the mean
    mean = L.mean(axis=0)
    assert np.all(np.abs(mean - RHO) < 0.015 * RHO + 0.004), mean


def test_white_furnace_direct():
    from rs_ray_toy_tpu.integrators.direct import li_levels

    job = _furnace_job(
        {"integrator_type": "DirectLighting", "light_strategy": "one", "max_depth": 2}
    )
    L, L_esc = _furnace_radiance(job, li_levels)
    assert np.isfinite(L).all()
    mean = L.mean(axis=0)
    assert np.all(np.abs(mean - RHO) < 0.015 * RHO + 0.004), mean


def _fog_job(sigma_a, sigma_s, g, max_depth):
    """Point light + homogeneous camera fog; the only prim is a far-away
    sphere the fog extinguishes long before (exp(-sigma_t*999) = 0)."""
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 40, 24
    cfg["float_texture"], cfg["rgb_texture"] = [], []
    cfg["materials"] = [
        {"material_type": "MatteMaterial", "material_name": "mat_m"}
    ]
    cfg["objs"] = []
    cfg["lights"] = [
        {
            "light_type": "point",
            "spectrum": {"values": [10.0, 10.0, 10.0]},
            "world_pos": [5.0, 3.0, 0.0],
        }
    ]
    cfg["infinite_lights"] = []
    cfg["Aggregate"] = {
        "primitives": [
            {
                "primitive_type": "sphere",
                "material_name": "mat_m",
                "radius": 1.0,
                "world_pos": [1000.0, 0.0, 0.0],
            }
        ]
    }
    cfg["Integrator"] = {"integrator_type": "Volpath", "max_depth": max_depth}
    cfg["Camera"]["medium"] = {"medium_type": "Homogeneous", "g": g}
    td = tempfile.mkdtemp()
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    from rs_ray_toy_tpu.scene.loader import MediumSpec, load_scene

    job = load_scene(path)
    # controlled equal-channel coefficients (the JSON schema only exposes
    # presets / the smoke defaults, renderprocess.rs:1108-1133)
    mi = job.scene.camera_medium
    old = job.scene.mediums[mi]
    job.scene.mediums[mi] = MediumSpec(
        "homogeneous",
        np.full(3, sigma_a),
        np.full(3, sigma_s),
        old.g,
    )
    return job


def _single_scatter_quadrature(o, d, light_p, intensity, sigma_a, sigma_s, g):
    """Host reference for single-scattered radiance along a ray through a
    homogeneous medium from a point light (the volpath.rs max_depth=1
    estimator's exact expectation):
        L = sigma_s * I * int_0^inf e^{-st*t} p_hg(dot(-d, wi)) e^{-st*r} / r^2 dt
    evaluated with dense trapezoid quadrature (independent of device code;
    HG written out locally)."""
    st = sigma_a + sigma_s
    t = np.linspace(0.0, 40.0 / st, 200001)
    x = o[None, :] + d[None, :] * t[:, None]
    delta = light_p[None, :] - x
    r = np.linalg.norm(delta, axis=-1)
    wi = delta / r[:, None]
    cos_theta = -(wi @ d)  # dot(wo, wi), wo = -d
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    p_hg = (1.0 - g * g) / (4.0 * np.pi * denom * np.sqrt(denom))
    integrand = np.exp(-st * t) * p_hg * np.exp(-st * r) / (r * r)
    return sigma_s * intensity * np.trapezoid(integrand, t)


def _fog_radiance(job, n=60000, seed=11):
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.integrators.volpath import li_volpath
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    ctx = SceneCtx(job.scene)
    sampler = StratifiedSampler(job.sampler, seed=seed)
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    w = jnp.ones((n,), jnp.float32)
    pid = jnp.arange(n, dtype=jnp.uint32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    L = np.asarray(
        li_volpath(
            ctx, o, d, w, sampler, pid, s_idx, job.integrator,
            camera_medium=ctx.camera_medium,
        )
    )
    return L


def test_volpath_single_scatter_isotropic():
    """Absolute volpath oracle (VERDICT r3 #7): single-scattered radiance
    from a point light through isotropic homogeneous fog matches the
    closed-form 1D integral.  Exercises channel-stratified distance
    sampling, the medium-vertex NEE branch, and medium_tr over the shadow
    segment (volpath.rs:70-127)."""
    sigma_a, sigma_s, g = 0.1, 0.4, 0.0
    job = _fog_job(sigma_a, sigma_s, g, max_depth=1)
    L = _fog_radiance(job)
    assert np.isfinite(L).all()
    expect = _single_scatter_quadrature(
        np.zeros(3), np.array([1.0, 0.0, 0.0]), np.array([5.0, 3.0, 0.0]),
        10.0, sigma_a, sigma_s, g,
    )
    mean = L.mean(axis=0)
    assert np.all(np.abs(mean - expect) < 0.04 * expect), (mean, expect)


def test_volpath_single_scatter_hg():
    """Same oracle with a forward-peaked Henyey-Greenstein phase (g=0.5):
    anchors the HG evaluation inside the NEE branch absolutely."""
    sigma_a, sigma_s, g = 0.05, 0.45, 0.5
    job = _fog_job(sigma_a, sigma_s, g, max_depth=1)
    L = _fog_radiance(job)
    assert np.isfinite(L).all()
    expect = _single_scatter_quadrature(
        np.zeros(3), np.array([1.0, 0.0, 0.0]), np.array([5.0, 3.0, 0.0]),
        10.0, sigma_a, sigma_s, g,
    )
    mean = L.mean(axis=0)
    assert np.all(np.abs(mean - expect) < 0.05 * expect), (mean, expect)


class _CenterCamera:
    """Weight-1 stub camera: rays from the sphere center in lat-long
    directions (bypasses the RealisticCamera's cos^4 lens weight so the
    SPPM oracle has a closed form)."""

    def __init__(self, xres, yres):
        self.xres, self.yres = xres, yres

    def generate_rays(self, p_film, u_lens):
        u = p_film[:, 0] / self.xres
        v = jnp.clip(p_film[:, 1] / self.yres, 1e-3, 1.0 - 1e-3)
        phi = 2.0 * np.pi * u
        z = 1.0 - 2.0 * v
        s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        d = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
        o = jnp.zeros_like(d)
        return o, d, jnp.ones(d.shape[:1], jnp.float32)


def test_sppm_sphere_interior_oracle():
    """Absolute SPPM oracle (VERDICT r3 #7): point light at the center of
    a Lambertian sphere interior.  Direct irradiance is exactly I/R^2 and
    each photon bounce multiplies the (uniform) arriving irradiance by
    rho, so the pixel value is closed-form:

        L = (rho/pi) * (I/R^2) * (1 + q * sum_{k=1}^{D-1} rho^k)

    where q is the POINT_LE_PDF_QUIRK factor (sample_le pdf_dir = 1/(2pi)
    instead of 1/(4pi), lights/point.rs — photons carry half the physical
    power) and D = max_depth.  A uniform deposit field also makes the
    kernel density estimate bias-free, so this anchors the camera pass,
    the photon walk, the grid deposit, and the tau/radius normalization
    (sppm.rs:105-532) absolutely."""
    from rs_ray_toy_tpu.integrators import sppm as sppm_mod
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.sampler.halton import HaltonSampler
    from rs_ray_toy_tpu.scene.loader import SamplerSpec, load_scene

    R, I, rho, D = 6.0, 10.0, RHO, 5
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 32, 16
    cfg["float_texture"], cfg["rgb_texture"] = [], []
    cfg["materials"] = [
        {"material_type": "MatteMaterial", "material_name": "mat_m"}
    ]
    cfg["objs"] = []
    cfg["lights"] = [
        {
            "light_type": "point",
            "spectrum": {"values": [I, I, I]},
            "world_pos": [0.0, 0.0, 0.0],
        }
    ]
    cfg["infinite_lights"] = []
    cfg["Aggregate"] = {
        "primitives": [
            {
                "primitive_type": "sphere",
                "material_name": "mat_m",
                "radius": R,
                "world_pos": [0.0, 0.0, 0.0],
            }
        ]
    }
    cfg["Integrator"] = {
        "integrator_type": "SPPM",
        "radius": 0.3,
        "n_iters": 3,
        "max_depth": D,
        "photons_per_iter": 1 << 14,
    }
    td = tempfile.mkdtemp()
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    ctx = SceneCtx(job.scene)
    spec = job.integrator
    sampler = HaltonSampler(
        SamplerSpec(kind="halton", nsamp=spec.n_iters, sample_at_center=True),
        job.film.xres, job.film.yres, seed=0,
    )
    cam = _CenterCamera(job.film.xres, job.film.yres)
    img = np.asarray(
        sppm_mod.render_sppm(ctx, cam, sampler, job.film, spec)
    )
    assert np.isfinite(img).all()
    E = I / (R * R)
    quirk = 0.5 if sppm_mod.POINT_LE_PDF_QUIRK else 1.0
    indirect = quirk * sum(rho ** k for k in range(1, D))
    expect = (rho / np.pi) * E * (1.0 + indirect)
    mean = img.reshape(-1, 3).mean(axis=0)
    assert np.all(np.abs(mean - expect) < 0.05 * expect), (mean, expect)
    # the field is uniform: per-pixel spread should be small too
    p95 = np.percentile(np.abs(img.reshape(-1, 3) - expect), 95)
    assert p95 < 0.30 * expect, p95


def test_film_filter_normalization():
    """Constant-radiance samples must reconstruct to exactly L for every
    filter (weight-sum normalization, film.rs:323-366)."""
    from rs_ray_toy_tpu.scene.loader import FilmSpec
    from rs_ray_toy_tpu.film import film as fmod

    rng = np.random.default_rng(0)
    Lval = np.array([0.7, 0.3, 0.9], np.float32)
    for ftype, radius in [("box", 0.5), ("triangle", 2.0), ("gaussian", 1.5)]:
        spec = FilmSpec(
            xres=16,
            yres=12,
            diagonal_mm=20.0,
            scale=1.0,
            max_sample_luminance=np.inf,
            filter_type=ftype,
            filter_radius=np.array([radius, radius]),
        )
        film = fmod.make_film(spec)
        n = 8000
        p = jnp.asarray(rng.random((n, 2)) * np.array([16, 12]), jnp.float32)
        rad = jnp.tile(jnp.asarray(Lval)[None], (n, 1))
        film = fmod.add_samples(film, spec, p, rad, jnp.ones((n,), jnp.float32))
        rgb = np.asarray(fmod.to_rgb(film, spec))
        # interior pixels (full filter support inside the film)
        m = int(np.ceil(radius)) + 1
        inner = rgb[m:-m, m:-m]
        assert np.allclose(inner, Lval, atol=2e-3), (
            ftype,
            np.abs(inner - Lval).max(),
        )
