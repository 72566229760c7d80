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
