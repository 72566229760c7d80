"""Procedural benchmark scenes (BASELINE config 3: BVH-scale geometry).

The reference ships one 36-triangle sample scene; its BVH only matters on
real meshes.  This generator tiles the sample cube mesh into an n x n
instance grid in front of the camera (samples/scene.json's lens looks
down +x at ~35 units), producing scenes of 10^4..10^5 triangles through
the same byte-compatible `instances` config path the reference parses
(renderprocess.rs:1214-1282)."""

import json
import os
import shutil

import numpy as np


REF_SCENE = "/root/reference/samples/scene.json"


def write_grid_scene(
    out_dir,
    ny=40,
    nz=40,
    base=REF_SCENE,
    integrator="Path",
    max_depth=5,
    span_y=6.0,
    span_z=4.0,
    xres=None,
    yres=None,
    material=None,
):
    """Write grid.json (+ cube.obj) under out_dir; returns the json path.

    ny*nz cube instances -> 12*ny*nz triangles.
    """
    cfg = json.load(open(base))
    if xres:
        cfg["Film"]["xres"] = xres
    if yres:
        cfg["Film"]["yres"] = yres
    cfg["Integrator"] = {"integrator_type": integrator, "max_depth": max_depth}
    prim = cfg["Aggregate"]["primitives"][0]
    if material:
        prim["material_name"] = material
    # cube.obj spans +-1: scale so neighbours don't touch
    sy = span_y / ny
    sz = span_z / nz
    s = 0.4 * min(sy, sz)
    insts = []
    for j in range(ny):
        for k in range(nz):
            insts.append(
                {
                    "world_pos": [
                        35.2,
                        -span_y / 2 + (j + 0.5) * sy,
                        -span_z / 2 + (k + 0.5) * sz,
                    ],
                    "scale": [s, s, s],
                    "rotation_axis": [0.0, 0.0, 1.0],
                    "rotation_angle": (7 * j + 13 * k) % 90,
                }
            )
    prim["instances"] = insts
    os.makedirs(out_dir, exist_ok=True)
    src_dir = os.path.dirname(base)
    for aux in ("cube.obj", "s_01.png"):
        p = os.path.join(src_dir, aux)
        if os.path.exists(p):
            shutil.copy(p, out_dir)
    path = os.path.join(out_dir, "grid.json")
    json.dump(cfg, open(path, "w"))
    return path


def write_grid_fog_scene(
    out_dir,
    n=16,
    base=REF_SCENE,
    max_depth=5,
    xres=None,
    yres=None,
    sigma_scale=1.0,
):
    """scene.json + an n^3 GridDensity camera medium (a smooth gaussian
    plume over the view volume x in [25,45]): BASELINE config 4's hard
    half (grid.rs delta/ratio tracking), exercised end-to-end.  Returns
    the json path.  The unit density box is placed with to_world alone
    (world_pos/scale) — the p0/p1 data2medium composition is broken in
    the reference (renderprocess.rs:1152-1156 reads key "p0" for both
    and composes it un-inverted), so portable scenes omit p0/p1."""
    cfg = json.load(open(base))
    if xres:
        cfg["Film"]["xres"] = xres
    if yres:
        cfg["Film"]["yres"] = yres
    cfg["Integrator"] = {
        "integrator_type": "Volpath", "max_depth": max_depth,
    }
    # smooth gaussian blob, peak 1.0 at the box center (few delta-
    # tracking steps near the edges, dense core around the cubes)
    zi, yi, xi = [
        (np.arange(n) + 0.5) / n - 0.5 for _ in range(3)
    ]
    r2 = (
        xi[None, None, :] ** 2 + yi[None, :, None] ** 2 + zi[:, None, None] ** 2
    )
    d = sigma_scale * np.exp(-r2 / 0.09)
    cfg.setdefault("Camera", {})["medium"] = {
        "medium_type": "GridDensity",
        "g": 0.0,
        "nx": n, "ny": n, "nz": n,
        "d": [round(float(v), 5) for v in d.ravel()],
        "world_pos": [25.0, -8.0, -6.0],
        "scale": [20.0, 16.0, 12.0],
    }
    os.makedirs(out_dir, exist_ok=True)
    src_dir = os.path.dirname(base)
    for aux in ("cube.obj",):
        p = os.path.join(src_dir, aux)
        if os.path.exists(p):
            shutil.copy(p, out_dir)
    path = os.path.join(out_dir, "grid_fog.json")
    json.dump(cfg, open(path, "w"))
    return path
