"""Per-kernel engagement observability (VERDICT r4 weak #7).

Every fused kernel must (a) name itself in the result dict
(`fused_kernel`) so bench rows carry per-kernel flags, and (b) fall back
LOUDLY when its gate rejects a scene — a silent jnp fallback is the
failure class that cost round 3 (the SPPM Halton gate).  These tests
force a gate rejection per integrator and assert the flag flips and the
stderr line prints.
"""

import json
import os
import shutil
import tempfile

import numpy as np
import pytest


SAMPLES = "/root/reference/samples"


def _write_scene(mutate):
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 32, 16
    mutate(cfg)
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    return path


def _render(path, monkeypatch, reject=None):
    """Render 1spp; reject = (module, attr) of a supports() gate to force
    to False (simulating a scene outside the kernel subset)."""
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    if reject is not None:
        mod, attr = reject
        monkeypatch.setattr(mod, attr, lambda *a, **k: False)
    job = load_scene(path)
    return render_job(job, spp_override=1, pupil_samples=1 << 10, seed=0)


def test_path_engagement_flags(monkeypatch, capsys):
    from rs_ray_toy_tpu.ops import path_megakernel as pmk

    path = _write_scene(
        lambda c: c.update(
            Integrator={"integrator_type": "Path", "max_depth": 1}
        )
    )
    res = _render(path, monkeypatch)
    assert res["render_path"] == "megakernel"
    assert res["fused_kernel"] == "path"

    res = _render(path, monkeypatch, reject=(pmk, "supports"))
    assert res["render_path"] == "jnp"
    assert res["fused_kernel"] is None
    assert "path-megakernel subset" in capsys.readouterr().err


def test_direct_engagement_flags(monkeypatch, capsys):
    from rs_ray_toy_tpu.ops import direct_megakernel as dmk

    path = _write_scene(
        lambda c: c.update(
            Integrator={"integrator_type": "Debug", "max_depth": 1}
        )
    )
    res = _render(path, monkeypatch)
    assert res["render_path"] == "megakernel"
    assert res["fused_kernel"] == "direct"

    res = _render(path, monkeypatch, reject=(dmk, "supports_direct"))
    assert res["render_path"] == "jnp"
    assert res["fused_kernel"] is None
    assert "direct-megakernel subset" in capsys.readouterr().err


def test_volpath_engagement_flags(monkeypatch, capsys):
    from rs_ray_toy_tpu.ops import volpath_megakernel as vmk

    def fog(c):
        c["Integrator"] = {"integrator_type": "Volpath", "max_depth": 1}
        c["Camera"]["medium"] = {"medium_type": "Homogeneous", "g": 0.0}

    path = _write_scene(fog)
    res = _render(path, monkeypatch)
    assert res["render_path"] == "megakernel"
    assert res["fused_kernel"] == "volpath"

    res = _render(path, monkeypatch, reject=(vmk, "supports_volpath"))
    assert res["render_path"] == "jnp"
    assert res["fused_kernel"] is None
    assert "volpath-megakernel subset" in capsys.readouterr().err
