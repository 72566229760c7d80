"""Smooth (interpolated vertex-normal) shading in the path megakernel.

The kernel must reproduce integrators/path.li_path exactly on meshes whose
vertex normals differ from the face normal (triangle.rs:301+ shading
normals): the winner's barycentrics are rebuilt in-kernel from its
intersect row and ns is interpolated + renormalized, ng faceforwarded,
with the estimator's ns/ng split (frame + cosines on ns; reflect checks,
ray offsets and the etaScale entering test on ng — reflection.rs:216-227,
integrator/mod.rs:403-558, path.rs:150-163).
"""

import json
import os
import shutil
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

SAMPLES = "/root/reference/samples"

# octahedron with smooth vertex normals (vn = vertex direction): every
# face normal differs from all three vertex normals -> smooth shading
OCTA_OBJ = """
v 1 0 0
v -1 0 0
v 0 1 0
v 0 -1 0
v 0 0 1
v 0 0 -1
vn 1 0 0
vn -1 0 0
vn 0 1 0
vn 0 -1 0
vn 0 0 1
vn 0 0 -1
f 1//1 3//3 5//5
f 3//3 2//2 5//5
f 2//2 4//4 5//5
f 4//4 1//1 5//5
f 3//3 1//1 6//6
f 2//2 3//3 6//6
f 4//4 2//2 6//6
f 1//1 4//4 6//6
"""


def _load(cfg):
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    with open(os.path.join(td, "octa.obj"), "w") as f:
        f.write(OCTA_OBJ)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    return job, SceneCtx(job.scene)


def _smooth_cfg(mat="mat_matte", max_depth=5):
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {"integrator_type": "Path", "max_depth": max_depth}
    for prim in cfg["Aggregate"]["primitives"]:
        prim["material_name"] = "mat_matte"
    cfg["objs"].append({"filename": "octa.obj", "obj_name": "octa_01"})
    cfg["Aggregate"]["primitives"].append(
        {
            "primitive_type": "triangle",
            "material_name": mat,
            "obj_name": "octa_01",
            "instances": [
                {
                    "world_pos": [34.0, 0.8, 0.5],
                    "scale": [1.3, 1.3, 1.3],
                    "rotation_axis": [0.0, 1.0, 0.0],
                    "rotation_angle": 20,
                }
            ],
        }
    )
    return cfg


def _compare(job, ctx, atol_frac=5e-3):
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene,
        li_path_mega,
        supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    assert supports(ctx, job.integrator, None, None)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)
    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(
        jnp.float32
    )
    s_idx = jnp.zeros((n,), jnp.uint32)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(
        li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator)
    )
    packed = pack_scene(ctx)
    assert packed[5].smooth, "scene must exercise the smooth subset"
    l_mega = np.asarray(
        li_path_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    assert np.isfinite(l_mega).all()
    assert l_ref.max() > 0, "scene renders black — test is vacuous"
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    frac_diverged = float((rel.max(-1) > 1e-3).mean())
    assert frac_diverged < atol_frac, f"{frac_diverged:.2%} of rays diverged"
    assert float(np.quantile(rel, 0.99)) < 1e-4, "bulk not bit-level"
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-6 + 3e-3 * abs(l_ref.mean())
    return l_ref, l_mega


def test_smooth_normals_shade_differently():
    """Sanity: the smooth octahedron's jnp render differs from the same
    geometry shaded flat — otherwise the equivalence tests are vacuous."""
    from rs_ray_toy_tpu.ops.path_megakernel import _mesh_smooth

    job, ctx = _load(_smooth_cfg())
    assert _mesh_smooth(ctx.tri)


def test_smooth_matte_matches_jnp():
    """Flat cubes + a smooth matte octahedron under the scene's point
    lights: ns interpolation, ng faceforward, delta-NEE cosines."""
    job, ctx = _load(_smooth_cfg())
    _compare(job, ctx)


def test_smooth_glass_matches_jnp():
    """Smooth glass octahedron: FRESNEL_SPEC sampling in the ns frame with
    the etaScale entering test on geometric ng (path.rs:150-163)."""
    cfg = _smooth_cfg(mat="mat_glass", max_depth=4)
    cfg["materials"].append(
        {"material_type": "GlassMaterial", "material_name": "mat_glass"}
    )
    job, ctx = _load(cfg)
    _compare(job, ctx)


def test_smooth_area_light_matches_jnp():
    """Smooth mesh + sphere-area light: the MIS NEE branch's reflect gate
    runs on ng while f/pdf/cos run in the ns frame."""
    cfg = _smooth_cfg()
    cfg["lights"] = [
        {
            "light_type": "diffuse",
            "spectrum": {"values": [40.0, 30.0, 20.0]},
            "light_shape": {
                "shape_type": "sphere",
                "radius": 0.6,
                "world_pos": [30.0, 2.5, 2.0],
            },
        }
    ]
    job, ctx = _load(cfg)
    _compare(job, ctx)


def test_smooth_matches_jnp_bvh(monkeypatch):
    """The smooth attrs ride the in-kernel packet BVH's leaf accumulation
    (winner row p0/e1/e2 + n0/n1/n2 as trailing attr columns)."""
    monkeypatch.setenv("RS_MEGA_BVH", "force")
    from rs_ray_toy_tpu.ops.path_megakernel import pack_scene

    job, ctx = _load(_smooth_cfg())
    assert pack_scene(ctx)[6] is not None
    _compare(job, ctx)


def test_flat_kernels_still_reject_smooth():
    """The direct/volpath/SPPM kernels shade ns == ng and must keep
    falling back on smooth meshes."""
    from rs_ray_toy_tpu.ops.path_megakernel import common_scene_checks
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job, ctx = _load(_smooth_cfg())
    sampler = StratifiedSampler(job.sampler, seed=0)
    assert common_scene_checks(ctx, sampler) is None
    assert common_scene_checks(ctx, sampler, allow_smooth=True) is not None
