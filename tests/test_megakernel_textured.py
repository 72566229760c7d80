"""Textured-kd path megakernel vs the jnp wavefront loop.

The kernel evaluates imagemap kd in-kernel (packed-pyramid MXU taps,
ops/tex_tile.py) with camera-FD duv at the primary hit and dead
differentials after — exactly the jnp packed path's behavior for
lambert-only scenes (matte.rs:35-61, mipmap.rs:132-189, RS_TEX_PACKED=1).
Tolerance: the kernel taps run bf16 (<= 2^-9 relative — below the 8-bit
PNG source quantization); everything else is float-association exact.
"""

import json
import os
import shutil
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

SAMPLES = "/root/reference/samples"

TEXTURED_MAT = {
    "material_type": "MatteMaterial",
    "material_name": "mat_textured",
    "kd": "s_01",
}


def _make_job(spp=4):
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 5}
    cfg["Sampler"] = {
        "sampler_type": "StratifiedSampler", "xsamp": 2, "ysamp": 2,
    }
    cfg["materials"].append(TEXTURED_MAT)
    for prim in cfg["Aggregate"]["primitives"]:
        prim["material_name"] = "mat_textured"
    td = tempfile.mkdtemp()
    for aux in ("cube.obj", "s_01.png"):
        shutil.copy(os.path.join(SAMPLES, aux), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    return job, SceneCtx(job.scene)


@pytest.fixture(scope="module")
def tex_job():
    return _make_job()


def test_supports_textured_scene(tex_job):
    from rs_ray_toy_tpu.ops.path_megakernel import supports

    job, ctx = tex_job
    assert supports(ctx, job.integrator, None, None)


def test_pack_scene_carries_texture(tex_job):
    from rs_ray_toy_tpu.ops.path_megakernel import pack_scene, TEX0

    job, ctx = tex_job
    packed = pack_scene(ctx)
    wide, tex_table = packed[5], packed[7]
    assert wide.tex is not None
    assert tex_table is not None and tex_table.dtype == jnp.bfloat16
    table = np.asarray(packed[0])
    assert np.all(table[:36, TEX0 + 9] == 1.0)  # every cube tri textured


@pytest.mark.kernel
def test_textured_radiance_matches_jnp_no_diff(tex_job):
    """Rays-in entry (diff None): every lookup is the static lod_min tap,
    equal to the jnp packed path with duv=None."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene, li_path_mega, supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job, ctx = tex_job
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
    l_mega = np.asarray(
        li_path_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    assert np.isfinite(l_mega).all()
    # bf16 texture taps: per-bounce kd error <= ~0.4% relative
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    assert float(np.quantile(rel, 0.95)) < 2e-2
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-5 + 2e-2 * abs(
        l_ref.mean()
    )


@pytest.mark.kernel
def test_textured_cam_kernel_matches_jnp_with_diffs(tex_job):
    """Camera entry: in-kernel FD duv + EWA taps at the primary hit must
    match the jnp wavefront loop with generate_ray_differentials."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene, pack_camera, li_path_mega_cam,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job, ctx = tex_job
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    pxy = jnp.stack(
        [(pid % 64).astype(jnp.float32), (pid // 64).astype(jnp.float32)],
        -1,
    )
    s_idx = jnp.zeros((n,), jnp.uint32)
    # the jnp reference regenerates the kernel's film jitter (dim 0)
    u_film = sampler.get_2d(pid, s_idx, 0)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w, diff = cam.generate_ray_differentials(
        pxy + u_film, u_lens, spp=int(sampler.spp)
    )
    l_ref = np.asarray(
        li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator,
                diff=diff)
    )
    packed = pack_scene(ctx)
    l_mega, w_mega = li_path_mega_cam(
        ctx, packed, pack_camera(cam), pxy, pid, s_idx, sampler,
        job.integrator, interpret=True,
    )
    l_mega = np.asarray(l_mega)
    assert np.isfinite(l_mega).all()
    np.testing.assert_allclose(np.asarray(w_mega), np.asarray(w), rtol=2e-6)
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    assert float(np.quantile(rel, 0.95)) < 2e-2
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-5 + 2e-2 * abs(
        l_ref.mean()
    )
