"""Volpath megakernel vs the jnp wavefront loop (integrators/volpath.py).

The fused kernel (ops/volpath_megakernel.py) covers the homogeneous-fog
subset: one homogeneous camera medium, no per-prim interfaces, point
lights.  Estimator must be identical — same sampler dim blocks, same
hashed RNG chain for the medium channel/distance draws, same power-
weighted light pick and HG quirks.
"""

import json
import os
import shutil
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

SAMPLES = "/root/reference/samples"

# thin fog with a real scattering albedo: sigma_t ~0.006-0.03/unit over
# the ~35-unit scene depth attenuates without killing every path, and
# sigma_s/sigma_t ~0.1-0.4 gives actual medium-scattering vertices
FOG = {"medium_type": "Homogeneous", "g": 0.0, "preset": "Clorox"}


def _fog_job(medium=FOG, max_depth=5):
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {"integrator_type": "Volpath", "max_depth": max_depth}
    cfg.setdefault("Camera", {})["medium"] = medium
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    return job, SceneCtx(job.scene), path


def test_supports_fog_scene():
    from rs_ray_toy_tpu.ops.volpath_megakernel import supports_volpath
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job, ctx, _ = _fog_job()
    sampler = StratifiedSampler(job.sampler, seed=0)
    assert supports_volpath(ctx, job.integrator, sampler, None)


def test_supports_rejects_non_volpath():
    from rs_ray_toy_tpu.ops.volpath_megakernel import supports_volpath

    job, ctx, _ = _fog_job()

    class FakeSpec:
        kind = "path"
        max_depth = 5

    assert not supports_volpath(ctx, FakeSpec(), None, None)
    assert not supports_volpath(ctx, job.integrator, None, object())


@pytest.mark.parametrize("force_bvh", [False, True])
def test_volpath_radiance_matches_jnp_loop(force_bvh, monkeypatch):
    """Per-ray radiance equality on the fog scene, through both the
    brute-force triangle loop and the in-kernel packet BVH."""
    from rs_ray_toy_tpu.ops.volpath_megakernel import (
        pack_volpath,
        li_volpath_mega,
        supports_volpath,
    )
    from rs_ray_toy_tpu.integrators.volpath import li_volpath
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    if force_bvh:
        monkeypatch.setenv("RS_MEGA_BVH", "force")
    job, ctx, _ = _fog_job()
    sampler = StratifiedSampler(job.sampler, seed=0)
    assert supports_volpath(ctx, job.integrator, sampler, None)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(
        li_volpath(
            ctx, o, d, w, sampler, pid, s_idx, job.integrator,
            camera_medium=ctx.camera_medium,
        )
    )
    packed = pack_volpath(ctx)
    if force_bvh:
        assert packed[6] is not None
    l_mega = np.asarray(
        li_volpath_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    assert np.isfinite(l_mega).all()
    assert l_ref.sum() > 10  # the thin fog scene is actually lit
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    frac_diverged = float((rel.max(-1) > 1e-3).mean())
    assert frac_diverged < 5e-3, f"{frac_diverged:.2%} of rays diverged"
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-6 + 3e-3 * abs(l_ref.mean())


AREA_LIGHT = {
    "light_type": "diffuse",
    "spectrum": {"values": [60.0, 50.0, 40.0]},
    "light_shape": {"shape_type": "sphere", "radius": 0.6,
                    "world_pos": [33.0, 3.0, 1.0]},
}


def _area_fog_job(max_depth=5):
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {"integrator_type": "Volpath", "max_depth": max_depth}
    cfg.setdefault("Camera", {})["medium"] = FOG
    cfg["lights"].append(AREA_LIGHT)
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    return job, SceneCtx(job.scene), path


def test_volpath_area_light_matches_jnp_loop():
    """Sphere-area light in fog: the kernel's generic MIS NEE branch
    (power pick + sample_li + PH weight vs phase/BSDF pdf + fog tr) must
    match _estimate_direct_volumetric per ray.  The counter branch is
    statically zero for this subset (no emissive prims, no envs) so the
    two estimators are identical, not just equal in mean."""
    from rs_ray_toy_tpu.ops.volpath_megakernel import (
        pack_volpath,
        li_volpath_mega,
        supports_volpath,
    )
    from rs_ray_toy_tpu.integrators.volpath import li_volpath
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler
    from rs_ray_toy_tpu.scene.types import LIGHT_DIFFUSE_AREA

    job, ctx, _ = _area_fog_job()
    assert np.any(np.asarray(ctx.lights.kind) == LIGHT_DIFFUSE_AREA)
    sampler = StratifiedSampler(job.sampler, seed=0)
    assert supports_volpath(ctx, job.integrator, sampler, None)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(
        li_volpath(
            ctx, o, d, w, sampler, pid, s_idx, job.integrator,
            camera_medium=ctx.camera_medium,
        )
    )
    packed = pack_volpath(ctx)
    l_mega = np.asarray(
        li_volpath_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    assert np.isfinite(l_mega).all()
    assert l_ref.sum() > 10
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    frac_diverged = float((rel.max(-1) > 1e-3).mean())
    assert frac_diverged < 5e-3, f"{frac_diverged:.2%} of rays diverged"
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-6 + 3e-3 * abs(l_ref.mean())


def test_render_job_uses_volpath_megakernel(monkeypatch):
    """End-to-end fog render: megakernel on vs off must agree, and the
    render metadata must show the fused path engaged."""
    from rs_ray_toy_tpu.render import render_job
    from rs_ray_toy_tpu.scene.loader import load_scene

    _, _, path = _fog_job(max_depth=3)
    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("RS_MEGAKERNEL", flag)
        job = load_scene(path)
        res = render_job(job, spp_override=2, pupil_samples=1 << 10, seed=0)
        if flag == "1":
            assert res["render_path"] == "megakernel"
        outs[flag] = np.asarray(res["rgb_srgb_input"])
    rmse = float(np.sqrt(np.mean((outs["1"] - outs["0"]) ** 2)))
    assert rmse < 1e-4, f"volpath megakernel render deviates: rmse {rmse}"


@pytest.mark.kernel
def test_grid_fog_kernel_matches_jnp(monkeypatch):
    """Grid camera medium (delta/ratio tracking in-kernel) vs the jnp
    wavefront path.  The kernel's density taps fold trilinear weights in
    bf16 (ops/volpath_megakernel._grid_density_tap), so epsilon-close
    tracking decisions can flip on isolated lanes — the comparison is
    image-level RMSE plus a bit-close lane fraction, not per-ray
    equality (module docstring documents the divergence)."""
    import tempfile
    import numpy as np
    from rs_ray_toy_tpu.scene.gen import write_grid_fog_scene
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    p = write_grid_fog_scene(
        tempfile.mkdtemp(), n=8, xres=64, yres=32, max_depth=3,
        sigma_scale=0.6,
    )
    monkeypatch.setenv("RS_MEGAKERNEL", "1")
    job = load_scene(p)
    res = render_job(job, spp_override=2, pupil_samples=1 << 10, seed=0)
    assert res["render_path"] == "megakernel"
    assert res["fused_kernel"] == "volpath"
    a = np.asarray(res["rgb_srgb_input"])
    assert np.isfinite(a).all()

    monkeypatch.setenv("RS_MEGAKERNEL", "0")
    job = load_scene(p)
    b = np.asarray(
        render_job(job, spp_override=2, pupil_samples=1 << 10, seed=0)[
            "rgb_srgb_input"
        ]
    )
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    match = float(np.mean(np.all(np.abs(a - b) < 1e-5, axis=-1)))
    assert rmse < 2e-3, f"grid kernel image deviates: rmse {rmse}"
    assert match > 0.85, f"too many decision-flip lanes: {match}"
    # the image actually shows fog-lit content
    assert (a.sum(-1) > 0).mean() > 0.05
