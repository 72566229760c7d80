"""Round-3 megakernel widening: spheres, area lights, constant envs.

The widened path kernel (ops/path_megakernel.py) must reproduce
integrators/path.li_path exactly on the new subset rows:
  - full-sphere primitives min-combined with the triangle table
    (sphere.rs:50-108, SceneCtx._combine_spheres)
  - sphere-area lights with MIS NEE (lights/diffuse.rs + the
    AREA_PDF_QUIRK of shape/mod.rs:33-47)
  - one constant-radiance env light: CDF sample_li, the BSDF-sampling
    counter branch of estimate_direct (integrator/mod.rs:483-558), and
    escape-le collection (path.rs:84-87)
plus the absolute furnace closure (rho*L on a convex Lambertian body).
"""

import json
import os
import shutil
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

SAMPLES = "/root/reference/samples"

MIRROR_MAT = {"material_type": "MirrorMaterial", "material_name": "mat_mirror"}


def _load(cfg):
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    td = tempfile.mkdtemp()
    if os.path.exists(os.path.join(SAMPLES, "cube.obj")):
        shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    return job, SceneCtx(job.scene)


def _base_cfg(max_depth=5):
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {"integrator_type": "Path", "max_depth": max_depth}
    for prim in cfg["Aggregate"]["primitives"]:
        prim["material_name"] = "mat_matte"
    return cfg


def _add_spheres(cfg, mat="mat_matte"):
    cfg["Aggregate"]["primitives"].append(
        {
            "primitive_type": "sphere",
            "material_name": mat,
            "radius": 1.3,
            "world_pos": [34.0, 0.8, 0.5],
        }
    )
    cfg["Aggregate"]["primitives"].append(
        {
            "primitive_type": "sphere",
            "material_name": mat,
            "radius": 0.8,
            "world_pos": [36.0, -1.2, -1.5],
            "rotation_axis": [0.0, 1.0, 0.0],
            "rotation_angle": 30,
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
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator))
    packed = pack_scene(ctx)
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


def test_sphere_prims_match_jnp():
    """Cubes + two transformed full spheres under point lights."""
    job, ctx = _load(_add_spheres(_base_cfg()))
    assert int(ctx.sph.count) == 2
    _compare(job, ctx)


def test_sphere_prims_match_jnp_bvh(monkeypatch):
    """The widened subset composes with the in-kernel BVH: triangles go
    through the packet traversal while spheres stay static-unrolled and
    min-combined (mesh + sphere-light scenes are the production shape
    for BASELINE config 3 variants)."""
    from rs_ray_toy_tpu.ops.path_megakernel import pack_scene

    monkeypatch.setenv("RS_MEGA_BVH", "force")
    job, ctx = _load(_add_spheres(_base_cfg()))
    assert int(ctx.sph.count) == 2
    assert pack_scene(ctx)[6] is not None
    _compare(job, ctx)


def test_partial_sphere_rejected():
    cfg = _add_spheres(_base_cfg())
    cfg["Aggregate"]["primitives"][-1]["z_max"] = 0.2  # clipped sphere
    job, ctx = _load(cfg)
    from rs_ray_toy_tpu.ops.path_megakernel import supports

    assert not supports(ctx, job.integrator, None, None)


def test_area_light_matches_jnp():
    """Sphere-area light: MIS-weighted light-sampling NEE in kernel
    (power heuristic vs the non-specular scattering pdf)."""
    cfg = _add_spheres(_base_cfg())
    cfg["lights"] = [
        {
            "light_type": "diffuse",
            "spectrum": {"values": [40.0, 30.0, 20.0]},
            "light_shape": {
                "shape_type": "sphere",
                "radius": 0.5,
                "world_pos": [33.0, 3.0, 1.0],
            },
        },
        # keep one point light so the uniform pick mixes kinds
        {"light_type": "point", "world_pos": [30.0, -2.0, 0.0],
         "spectrum": {"values": [10.0, 10.0, 10.0]}},
    ]
    job, ctx = _load(cfg)
    _compare(job, ctx)


def _furnace_cfg(mat_type="MatteMaterial", emit=1.0, max_depth=5):
    cfg = _base_cfg(max_depth)
    cfg["float_texture"], cfg["rgb_texture"] = [], []
    cfg["materials"] = [
        {"material_type": mat_type, "material_name": "mat_m"}
    ]
    cfg["objs"] = []
    cfg["lights"] = [
        {"light_type": "infinite", "l": {"values": [emit] * 3}}
    ]
    cfg["infinite_lights"] = [
        {"light_type": "infinite", "l": {"values": [emit] * 3}}
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
    return cfg


def test_env_furnace_matches_jnp_and_closure():
    """Constant env (NEE + escape): kernel == jnp loop, and both satisfy
    the white-furnace closure: a convex Lambertian sphere (albedo rho)
    under unit constant illumination reflects exactly rho."""
    job, ctx = _load(_furnace_cfg())
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene, li_path_mega, supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    assert supports(ctx, job.integrator, None, None)
    sampler = StratifiedSampler(job.sampler, seed=3)
    rng = np.random.default_rng(3)
    yz = rng.random((4000, 2)) * 1.2 - 0.6
    yz = yz[np.hypot(yz[:, 0], yz[:, 1]) < 0.6][:1536]
    n = yz.shape[0]
    o = jnp.asarray(
        np.concatenate([np.full((n, 1), -5.0), yz], axis=1), jnp.float32
    )
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    w = jnp.ones((n,), jnp.float32)
    pid = jnp.arange(n, dtype=jnp.uint32)
    s_idx = jnp.zeros((n,), jnp.uint32)

    l_ref = np.asarray(li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator))
    packed = pack_scene(ctx)
    l_mega = np.asarray(
        li_path_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    assert float((rel.max(-1) > 1e-3).mean()) < 5e-3
    assert float(np.quantile(rel, 0.99)) < 1e-4
    # closure: every hit ray integrates to rho = 0.5 (matte default kd)
    assert abs(float(l_mega.mean()) - 0.5) < 0.02, l_mega.mean()

    # escaped rays read the escape-le env exactly
    d2 = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    l_esc = np.asarray(
        li_path_mega(
            ctx, packed, o, d2, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    assert np.allclose(l_esc, 1.0, atol=1e-6)


def test_escape_env_with_mirror_matches_jnp():
    """Mirror sphere under an escape-le-only env: the specular_bounce
    gate for escape collection (path.rs:84-87) must match the jnp loop."""
    cfg = _furnace_cfg()
    cfg["materials"] = [dict(MIRROR_MAT, material_name="mat_m")]
    cfg["lights"] = []  # escape-le only
    job, ctx = _load(cfg)
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene, li_path_mega, supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    assert supports(ctx, job.integrator, None, None)
    sampler = StratifiedSampler(job.sampler, seed=5)
    rng = np.random.default_rng(5)
    yz = rng.random((2000, 2)) * 1.2 - 0.6
    yz = yz[np.hypot(yz[:, 0], yz[:, 1]) < 0.6][:1024]
    n = yz.shape[0]
    o = jnp.asarray(
        np.concatenate([np.full((n, 1), -5.0), yz], axis=1), jnp.float32
    )
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    w = jnp.ones((n,), jnp.float32)
    pid = jnp.arange(n, dtype=jnp.uint32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    l_ref = np.asarray(li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator))
    l_mega = np.asarray(
        li_path_mega(
            ctx, pack_scene(ctx), o, d, w, sampler, pid, s_idx,
            job.integrator, interpret=True,
        )
    )
    assert l_ref.max() > 0.5  # mirror reflects the env
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    assert float((rel.max(-1) > 1e-3).mean()) < 5e-3
    assert float(np.quantile(rel, 0.99)) < 1e-4


def test_env_nee_with_specular_rejected():
    """Env in the NEE lights list + a live specular lobe: the kernel's
    counter-branch machinery would diverge -> must fall back to jnp."""
    cfg = _furnace_cfg()
    cfg["materials"] = [dict(MIRROR_MAT, material_name="mat_m")]
    job, ctx = _load(cfg)
    from rs_ray_toy_tpu.ops.path_megakernel import supports

    assert not supports(ctx, job.integrator, None, None)


def test_direct_kernel_still_rejects_spheres():
    """The widened gates are path-kernel-only: the Debug/DirectLighting
    chain kernel keeps the round-2 subset."""
    cfg = _add_spheres(_base_cfg())
    cfg["Integrator"] = {"integrator_type": "DirectLighting", "max_depth": 5}
    job, ctx = _load(cfg)
    from rs_ray_toy_tpu.ops.direct_megakernel import supports_direct

    assert not supports_direct(ctx, job.integrator, None, None)
