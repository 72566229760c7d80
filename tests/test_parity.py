"""Parity-claim pins (docs/PARITY.md "Documented simplifications")."""

import json
import os
import shutil
import tempfile

import numpy as np

from tests.test_golden import SAMPLES


def test_all_aggregate_prims_carry_materials():
    """The single-segment `tr` simplification (scene.rs:36-61) rests on
    every aggregate primitive carrying a material: the reference's
    make_aggregate only pushes prims whose material lookup succeeds
    (renderprocess.rs:1191-1214), and our loader mirrors that.  If a
    loader path ever produced a material-less prim, transmittance would
    need the reference's re-loop."""
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.scene.gen import write_grid_scene

    jobs = []
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    shutil.copy(os.path.join(SAMPLES, "s_01.png"), td)
    p = os.path.join(td, "s.json")
    json.dump(cfg, open(p, "w"))
    jobs.append(load_scene(p))
    jobs.append(load_scene(write_grid_scene(tempfile.mkdtemp(), ny=4, nz=4)))

    for job in jobs:
        tri = job.scene.triangles
        sph = job.scene.spheres
        if int(tri.count):
            assert (np.asarray(tri.mat) >= 0).all()
        if int(sph.count):
            assert (np.asarray(sph.mat) >= 0).all()


def test_unknown_material_prim_dropped():
    """A prim naming a missing material is dropped (renderprocess.rs:1191
    `if let Some(material)` silently skips), never loaded material-less."""
    from rs_ray_toy_tpu.scene.loader import load_scene

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    n_prims = len(cfg["Aggregate"]["primitives"])
    cfg["Aggregate"]["primitives"][0]["material_name"] = "no_such_material"
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    shutil.copy(os.path.join(SAMPLES, "s_01.png"), td)
    p = os.path.join(td, "s.json")
    json.dump(cfg, open(p, "w"))
    job = load_scene(p)
    tri = job.scene.triangles
    assert (np.asarray(tri.mat) >= 0).all()
