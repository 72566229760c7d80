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
