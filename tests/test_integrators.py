"""Integrator smoke + golden tests for volpath / sppm / ao."""

import json
import os
import shutil
import tempfile

import numpy as np
import jax.numpy as jnp

from tests.test_golden import GOLDEN_DIR, SAMPLES, _check, _render


def _job(mutate):
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 40, 24
    mutate(cfg)
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    from rs_ray_toy_tpu.scene.loader import load_scene

    return load_scene(path)


def test_ao_renders():
    def mut(cfg):
        cfg["Integrator"] = {"integrator_type": "AO", "n_samples": 4}

    rgb = _render(_job(mut), 2)
    assert np.isfinite(rgb).all()
    # AO of isolated convex cubes is ~unoccluded: bright where hit
    assert rgb.max() > 0.3


def test_volpath_fog_golden():
    def mut(cfg):
        cfg["Integrator"] = {"integrator_type": "Volpath", "max_depth": 3}
        cfg["Camera"]["medium"] = {"medium_type": "Homogeneous", "g": 0.0}

    rgb = _render(_job(mut), 2)
    assert np.isfinite(rgb).all()
    _check("volpath_fog_40x24_2spp", rgb)


def test_sppm_runs():
    def mut(cfg):
        cfg["Integrator"] = {
            "integrator_type": "SPPM",
            "radius": 1.0,
            "n_iters": 2,
            "max_depth": 3,
            "photons_per_iter": 2048,
        }

    from rs_ray_toy_tpu.render import render_job

    res = render_job(_job(mut), pupil_samples=1 << 10, seed=0)
    rgb = np.asarray(res["rgb_srgb_input"])
    assert np.isfinite(rgb).all()
    assert (rgb.sum(-1) > 1e-4).mean() > 0.01  # cubes lit by ld/photons
