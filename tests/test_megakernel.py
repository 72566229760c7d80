"""Megakernel vs jnp wavefront loop: same estimator, same samples.

The fused Pallas path kernel (ops/path_megakernel.py) must produce the
same per-ray radiance as integrators/path.li_path on its supported subset
(triangles + lambert + point lights) — identical sample dims, frame
construction, NEE, RR.  Differences are float-association only.
"""

import json
import os
import shutil
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

SAMPLES = "/root/reference/samples"


def _make_job(material="mat_matte", extra_materials=(), split_first=None):
    """split_first: material name for the FIRST cube instance (the other
    two keep `material`) — lets specular cubes see diffuse neighbors."""
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 5}
    cfg["materials"].extend(extra_materials)
    for prim in cfg["Aggregate"]["primitives"]:
        prim["material_name"] = material
    if split_first is not None:
        prim = cfg["Aggregate"]["primitives"][0]
        inst = prim["instances"]
        first = dict(prim, material_name=split_first, instances=[inst[0]])
        prim["instances"] = inst[1:]
        cfg["Aggregate"]["primitives"].insert(0, first)
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    return job, SceneCtx(job.scene)


@pytest.fixture(scope="module")
def bench_ctx():
    return _make_job("mat_matte")


def test_supports_bench_scene(bench_ctx):
    from rs_ray_toy_tpu.ops.path_megakernel import supports

    job, ctx = bench_ctx
    assert supports(ctx, job.integrator, None, None)


def test_supports_rejects_unsupported(bench_ctx):
    from rs_ray_toy_tpu.ops.path_megakernel import supports

    job, ctx = bench_ctx

    class FakeSpec:
        kind = "volpath"
        max_depth = 5

    assert not supports(ctx, FakeSpec(), None, None)
    assert not supports(ctx, job.integrator, None, object())  # diff present


MIRROR_MAT = {"material_type": "MirrorMaterial", "material_name": "mat_mirror"}
GLASS_MAT = {
    "material_type": "GlassMaterial",
    "material_name": "mat_glass",
    "eta": 1.5,
}


def _spec_job(spec_mat):
    """One specular cube in front of two matte ones + 3 point lights."""
    return _make_job(
        "mat_matte",
        extra_materials=[MIRROR_MAT, GLASS_MAT],
        split_first=spec_mat,
    )


@pytest.mark.parametrize("material", ["mat_matte", "mat_plastic", "mat_metal"])
def test_radiance_matches_jnp_loop(material):
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene,
        li_path_mega,
        supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job, ctx = _make_job(material)
    assert supports(ctx, job.integrator, None, None), material
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
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
    # identical estimator: differences are float association only.  Glossy
    # chains are chaotic — an ulp-level direction difference can flip a
    # branch and diverge one path entirely — so allow isolated flips while
    # requiring bit-level agreement for the bulk and aggregate equality.
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    frac_diverged = float((rel.max(-1) > 1e-3).mean())
    assert frac_diverged < 5e-3, f"{frac_diverged:.2%} of rays diverged"
    assert float(np.quantile(rel, 0.99)) < 1e-5, "bulk not bit-level"
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-6 + 3e-3 * abs(l_ref.mean())


@pytest.mark.parametrize("spec_mat", ["mat_mirror", "mat_glass"])
def test_specular_radiance_matches_jnp_loop(spec_mat):
    """Mirror/glass cubes: the specular lobes (SPEC_REFL / FRESNEL_SPEC)
    + etaScale RR must reproduce the jnp estimator exactly."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene,
        li_path_mega,
        supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job, ctx = _spec_job(spec_mat)
    assert supports(ctx, job.integrator, None, None), spec_mat
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
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
    assert l_ref.max() > 0  # the specular scene is actually lit
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    frac_diverged = float((rel.max(-1) > 1e-3).mean())
    assert frac_diverged < 5e-3, f"{frac_diverged:.2%} of rays diverged"
    assert float(np.quantile(rel, 0.99)) < 1e-4, "bulk not bit-level"
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-6 + 3e-3 * abs(l_ref.mean())


@pytest.mark.parametrize("material", ["mat_matte", "mat_metal"])
def test_bvh_mode_matches_jnp_loop(material, monkeypatch):
    """RS_MEGA_BVH=force routes the SAME scene through the in-kernel
    packet-BVH traversal (leaf-ordered narrow table, fused-children
    nodes, SMEM stack) — the estimator must be unchanged relative to the
    jnp wavefront loop, just like the brute-force kernel."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene,
        li_path_mega,
        supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    monkeypatch.setenv("RS_MEGA_BVH", "force")
    job, ctx = _make_job(material)
    assert supports(ctx, job.integrator, None, None), material
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(
        li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator)
    )
    packed = pack_scene(ctx)
    assert packed[6] is not None, "force mode must produce a BVH payload"
    l_mega = np.asarray(
        li_path_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    assert np.isfinite(l_mega).all()
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    frac_diverged = float((rel.max(-1) > 1e-3).mean())
    assert frac_diverged < 5e-3, f"{frac_diverged:.2%} of rays diverged"
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-6 + 3e-3 * abs(l_ref.mean())


def test_bvh_mode_mesh_scene_render(monkeypatch):
    """A real mesh scene (2700 tris > TRI_MAX) auto-selects the BVH
    megakernel; the end-to-end render must match the jnp+packet-BVH
    fallback film."""
    import tempfile
    from rs_ray_toy_tpu.scene.gen import write_grid_scene
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job
    from rs_ray_toy_tpu.ops import path_megakernel as pmk
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    path = write_grid_scene(
        tempfile.mkdtemp(), ny=15, nz=15, xres=48, yres=32, max_depth=3
    )
    monkeypatch.setenv("RS_BVH_PALLAS", "interp")
    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("RS_MEGAKERNEL", flag)
        job = load_scene(path)
        if flag == "1":
            ctx = SceneCtx(job.scene)
            assert pmk.supports(ctx, job.integrator, None, None)
            assert pmk.pack_scene(ctx)[6] is not None
        outs[flag] = np.asarray(
            render_job(job, spp_override=2, pupil_samples=1 << 10, seed=0)[
                "rgb_srgb_input"
            ]
        )
    on, off = outs["1"], outs["0"]
    assert np.isfinite(on).all()
    assert (on.sum(-1) > 0).sum() > 20
    rmse = float(np.sqrt(np.mean((on - off) ** 2)))
    assert rmse < 1e-4, f"BVH megakernel render deviates: rmse {rmse}"


def test_render_job_uses_megakernel(bench_ctx, monkeypatch):
    """End-to-end render with the megakernel enabled vs disabled."""
    from rs_ray_toy_tpu.render import render_job

    job, _ = bench_ctx
    monkeypatch.setenv("RS_MEGAKERNEL", "1")
    on = np.asarray(
        render_job(job, spp_override=1, pupil_samples=1 << 10, seed=0)[
            "rgb_srgb_input"
        ]
    )
    monkeypatch.setenv("RS_MEGAKERNEL", "0")
    off = np.asarray(
        render_job(job, spp_override=1, pupil_samples=1 << 10, seed=0)[
            "rgb_srgb_input"
        ]
    )
    rmse = float(np.sqrt(np.mean((on - off) ** 2)))
    assert rmse < 1e-4, f"megakernel render deviates: rmse {rmse}"


def test_raygen_matches_camera(bench_ctx):
    """_raygen (the in-kernel camera) is pure jnp — run it eagerly and
    compare against RealisticCamera.generate_rays on the same samples."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_camera,
        _raygen,
        _mk_sdim,
    )
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job, ctx = bench_ctx
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)
    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    sid = jnp.zeros((n,), jnp.uint32)
    px = (pid % 64).astype(jnp.float32)
    py = (pid // 64).astype(jnp.float32)

    u_film = sampler.get_2d(pid, sid, 0)
    u_lens = sampler.get_2d(pid, sid, 1)
    o_ref, d_ref, w_ref = cam.generate_rays(
        jnp.stack([px, py], -1) + u_film, u_lens
    )

    camp = pack_camera(cam)
    sdim = _mk_sdim(
        pid, sid, sampler.spp, sampler.xs, sampler.ys, sampler.jitter,
        sampler.seed, None, None,
    )
    ox, oy, oz, dx, dy, dz, w = _raygen(px, py, sdim, camp)
    o = np.stack([np.asarray(ox), np.asarray(oy), np.asarray(oz)], -1)
    d = np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)], -1)
    w = np.asarray(w)
    live = np.asarray(w_ref) > 0
    assert live.sum() > 100
    np.testing.assert_allclose(w, np.asarray(w_ref), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(o[live], np.asarray(o_ref)[live], rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(d[live], np.asarray(d_ref)[live], rtol=1e-4, atol=2e-5)


def test_supports_smooth_shading_gates(bench_ctx):
    """Smooth shading (vertex normals differing from ng): the PATH
    kernel interpolates ns in-kernel since round 3 (allow_smooth=True;
    parity pinned by test_megakernel_smooth.py), while the direct-chain
    kernel still shades ns == ng and must fall back to the jnp path.
    (Round-1 advisor finding: cube.obj's vn happen to equal ng, so
    parity passed while smooth meshes silently rendered flat — the gate
    direction per kernel is what this pins.)"""
    from rs_ray_toy_tpu.ops.direct_megakernel import supports_direct
    from rs_ray_toy_tpu.ops.path_megakernel import supports

    job, ctx = bench_ctx
    tri = ctx.tri
    # perturb + renormalize vertex normals: still unit, no longer == ng
    perturbed = tri.n0 + 0.3 * tri.dpdu / jnp.linalg.norm(
        tri.dpdu, axis=-1, keepdims=True
    )
    perturbed = perturbed / jnp.linalg.norm(perturbed, axis=-1, keepdims=True)
    smooth_tri = tri.replace(
        n0=perturbed, has_n=jnp.ones_like(tri.has_n)
    )
    ctx_smooth = type(ctx).__new__(type(ctx))
    ctx_smooth.__dict__.update(ctx.__dict__)
    ctx_smooth.tri = smooth_tri
    assert supports(ctx_smooth, job.integrator, None, None)
    from dataclasses import replace as _dc_replace

    dbg_spec = _dc_replace(job.integrator, kind="debug")
    assert not supports_direct(ctx_smooth, dbg_spec, None, None)
    # the flat-mesh baseline stays in the direct kernel's subset
    assert supports_direct(ctx, dbg_spec, None, None)


@pytest.mark.parametrize(
    "integ,material,force_bvh",
    [
        ("Debug", "mat_matte", False),
        ("Debug", "mat_debug", False),
        ("DirectLighting", "mat_matte", False),
        ("DirectLighting", "mat_plastic", False),
        # the chain kernel's in-kernel packet BVH (mesh Debug scenes)
        ("Debug", "mat_matte", True),
        ("DirectLighting", "mat_matte", True),
        # glass: SPEC_REFL + SPEC_TRANS two-lobe form — the full
        # reflect+transmit tree via trace-time recursion (no level
        # doubling).  "mixed" puts glass on one cube only (dead subtrees
        # + mixed lobe tables per lane); the all-glass Debug case makes
        # the transmit chains CONTRIBUTE through the flat 0.1 base at
        # interior hits (scene.json's layout gives the mixed scene's
        # specular children nothing lit to hit)
        ("DirectLighting", "mat_glass_mixed", False),
        ("Debug", "mat_glass", False),
        ("Debug", "mat_glass", True),
    ],
)
def test_direct_radiance_matches_jnp_levels(integ, material, force_bvh,
                                            monkeypatch):
    """The Debug/DirectLighting tree kernel must reproduce li_levels
    exactly (reflect chains, and reflect+transmit trees for glass)."""
    import dataclasses

    if force_bvh:
        monkeypatch.setenv("RS_MEGA_BVH", "force")

    from rs_ray_toy_tpu.ops.direct_megakernel import (
        pack_direct,
        li_levels_mega,
        supports_direct,
    )
    from rs_ray_toy_tpu.integrators.direct import li_levels
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {"integrator_type": integ, "max_depth": 4}
    if material.startswith("mat_glass"):
        cfg.setdefault("materials", []).append({
            "material_type": "GlassMaterial",
            "material_name": "mat_glass",
            "eta": 1.5,
        })
    if material == "mat_glass_mixed":
        # first cube instance glass, the other two stay matte
        prim = cfg["Aggregate"]["primitives"][0]
        inst = prim["instances"]
        first = dict(prim, material_name="mat_glass", instances=[inst[0]])
        prim["instances"] = inst[1:]
        cfg["Aggregate"]["primitives"].insert(0, first)
    else:
        for prim in cfg["Aggregate"]["primitives"]:
            prim["material_name"] = material
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    ctx = SceneCtx(job.scene)

    assert supports_direct(ctx, job.integrator, None, None)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(
        li_levels(ctx, o, d, w, sampler, pid, s_idx, job.integrator)
    )
    packed = pack_direct(ctx, job.integrator)
    l_mega = np.asarray(
        li_levels_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    assert np.isfinite(l_mega).all()
    assert l_ref.max() > 0
    if material == "mat_glass" and integ == "Debug":
        # the transmit chains must actually CONTRIBUTE (interior-hit 0.1
        # bases push the depth-2 sum of ~20.4 past 30) — guards the tree
        # walk against regressing to the reflect-only chain
        assert l_ref.sum() > 30
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    frac_diverged = float((rel.max(-1) > 1e-3).mean())
    assert frac_diverged < 5e-3, f"{frac_diverged:.2%} of rays diverged"
    assert float(np.quantile(rel, 0.99)) < 1e-4, "bulk not bit-level"
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-6 + 3e-3 * abs(l_ref.mean())


DISNEY_SSS_MAT = {
    "material_type": "DisneyMaterial",
    "material_name": "mat_sss",
    "color": {"values": [0.8, 0.6, 0.4]},
    "scatter_distance": {"values": [1.0, 0.8, 0.6]},
    "roughness": 0.3,
}


@pytest.mark.parametrize("force_bvh", [False, True])
def test_disney_bssrdf_matches_jnp_loop(force_bvh, monkeypatch):
    """BASELINE config 5 in-kernel: the 3-lobe Disney scatter_distance
    stack (SPEC_TRANS + DISNEY_RETRO + DISNEY_MICROFACET_REFL with the
    reference's non-reflective-chosen pdf accumulation) plus the Burley
    BSSRDF probe chain and Sw adapter must reproduce li_path per ray."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene,
        li_path_mega,
        supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    if force_bvh:
        monkeypatch.setenv("RS_MEGA_BVH", "force")
    job, ctx = _make_job("mat_sss", extra_materials=[DISNEY_SSS_MAT])
    sampler = StratifiedSampler(job.sampler, seed=0)
    assert supports(ctx, job.integrator, sampler, None)
    packed = pack_scene(ctx)
    assert packed[5].bssrdf is not None
    if force_bvh:
        assert packed[6] is not None
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(
        li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator)
    )
    l_mega = np.asarray(
        li_path_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    assert np.isfinite(l_mega).all()
    assert l_ref.sum() > 10  # the sss scene is actually lit
    denom = np.maximum(np.abs(l_ref), 1e-3)
    rel = np.abs(l_mega - l_ref) / denom
    frac_diverged = float((rel.max(-1) > 1e-3).mean())
    assert frac_diverged < 5e-3, f"{frac_diverged:.2%} of rays diverged"
    assert abs(l_mega.mean() - l_ref.mean()) < 1e-6 + 3e-3 * abs(l_ref.mean())


def test_disney_bssrdf_render_job(monkeypatch):
    """End-to-end sss render through render_job: the fused path must
    engage and match the jnp render."""
    import dataclasses

    from rs_ray_toy_tpu.render import render_job

    job, _ = _make_job("mat_sss", extra_materials=[DISNEY_SSS_MAT])
    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("RS_MEGAKERNEL", flag)
        res = render_job(job, spp_override=2, pupil_samples=1 << 10, seed=0)
        if flag == "1":
            assert res["render_path"] == "megakernel"
        outs[flag] = np.asarray(res["rgb_srgb_input"])
    rmse = float(np.sqrt(np.mean((outs["1"] - outs["0"]) ** 2)))
    assert rmse < 1e-4, f"sss megakernel render deviates: rmse {rmse}"


DISNEY_PLAIN_MAT = {
    "material_type": "DisneyMaterial",
    "material_name": "mat_dis",
    "color": {"values": [0.8, 0.5, 0.3]},
    "roughness": 0.4,
    "metallic": 0.3,
    "sheen": 0.5,
    "clearcoat": 0.6,
}


def test_disney_full_stack_matches_jnp_loop():
    """Plain Disney (no scatter_distance): the 5-lobe stack — diffuse,
    retro, sheen, Disney microfacet (separable G + Disney fresnel), and
    clearcoat (GTR1 with the reference's log10 + missing-sqrt sampling
    quirks) — must reproduce li_path per ray."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene,
        li_path_mega,
        supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    job, ctx = _make_job("mat_dis", extra_materials=[DISNEY_PLAIN_MAT])
    sampler = StratifiedSampler(job.sampler, seed=0)
    assert supports(ctx, job.integrator, sampler, None)
    packed = pack_scene(ctx)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
    s_idx = jnp.zeros((n,), jnp.uint32)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(
        li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator)
    )
    l_mega = np.asarray(
        li_path_mega(
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


def test_halton_sampler_matches_jnp_loop():
    """Halton (BASELINE config-2's low-discrepancy sampler): the kernel
    consumes slot values computed by the production HaltonSampler and
    shipped in as an input matrix (_sampler_payload), so per-ray radiance
    must equal li_path with the same sampler — including non-pow2 spp."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene,
        li_path_mega,
        supports,
    )
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.halton import HaltonSampler
    from rs_ray_toy_tpu.scene.loader import SamplerSpec

    job, ctx = _make_job("mat_plastic")
    sampler = HaltonSampler(
        SamplerSpec(kind="halton", nsamp=6), 64, 36, seed=0
    )
    assert supports(ctx, job.integrator, sampler, None)
    packed = pack_scene(ctx)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.stack([(pid % 64) + 0.5, (pid // 64) + 0.5], -1).astype(jnp.float32)
    s_idx = jnp.full((n,), 3, jnp.uint32)  # mid-sequence sample index
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(px, u_lens)

    l_ref = np.asarray(
        li_path(ctx, o, d, w, sampler, pid, s_idx, job.integrator)
    )
    l_mega = np.asarray(
        li_path_mega(
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


def test_halton_cam_fused_matches_unfused():
    """The cam-fused kernel entry under Halton: li_path_mega_cam must
    match generate_rays + li_path_mega (slots 0/1 read from the same
    input matrix the bounce loop uses)."""
    from rs_ray_toy_tpu.ops.path_megakernel import (
        pack_scene,
        pack_camera,
        li_path_mega,
        li_path_mega_cam,
    )
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.halton import HaltonSampler
    from rs_ray_toy_tpu.scene.loader import SamplerSpec

    job, ctx = _make_job("mat_matte")
    sampler = HaltonSampler(
        SamplerSpec(kind="halton", nsamp=4), 64, 36, seed=0
    )
    packed = pack_scene(ctx)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)

    n = 64 * 36
    pid = jnp.arange(n, dtype=jnp.uint32)
    pxy = jnp.stack([pid % 64, pid // 64], -1).astype(jnp.float32)
    s_idx = jnp.ones((n,), jnp.uint32)

    u_film = sampler.get_2d(pid, s_idx, 0)
    u_lens = sampler.get_2d(pid, s_idx, 1)
    o, d, w = cam.generate_rays(pxy + u_film, u_lens)
    l_ref = np.asarray(
        li_path_mega(
            ctx, packed, o, d, w, sampler, pid, s_idx, job.integrator,
            interpret=True,
        )
    )
    l_fused, w_fused = li_path_mega_cam(
        ctx, packed, pack_camera(cam), pxy, pid, s_idx, sampler,
        job.integrator, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(w_fused), np.asarray(w), rtol=2e-5)
    live = np.asarray(w) > 0
    np.testing.assert_allclose(
        np.asarray(l_fused)[live], l_ref[live], rtol=2e-4, atol=1e-5
    )


def test_sppm_camera_mega_matches_jnp():
    """The fused SPPM camera pass (ops/sppm_megakernel.py) must
    reproduce integrators.sppm._camera_pass per ray: ld delta and the
    full VisiblePoints record (p/wo/beta/mat/valid), including the
    luminance-threshold camera RR and glossy-at-last-depth VPs."""
    from rs_ray_toy_tpu.ops.sppm_megakernel import (
        pack_sppm,
        sppm_camera_mega,
        supports_sppm_camera,
    )
    from rs_ray_toy_tpu.integrators.sppm import _camera_pass
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {
        "integrator_type": "SPPM", "max_depth": 3, "radius": 1.0,
        "n_iters": 2, "photons_per_iter": 1 << 10,
    }
    # one plastic cube: glossy lobes exercise the last-depth VP rule
    prim = cfg["Aggregate"]["primitives"][0]
    inst = prim["instances"]
    first = dict(prim, material_name="mat_plastic", instances=[inst[0]])
    prim["instances"] = inst[1:]
    cfg["Aggregate"]["primitives"].insert(0, first)
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    ctx = SceneCtx(job.scene)
    sampler = StratifiedSampler(job.sampler, seed=0)
    assert supports_sppm_camera(ctx, job.integrator, sampler)
    packed = pack_sppm(ctx)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)

    h, w = 36, 64
    ys, xs = np.mgrid[0:h, 0:w]
    pixel_xy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1),
                           jnp.float32)
    pixel_id = jnp.asarray((ys * w + xs).ravel(), jnp.uint32)
    it = jnp.uint32(1)

    ld_ref, vp_ref = _camera_pass(
        ctx, cam, sampler, pixel_xy, pixel_id, it,
        job.integrator.max_depth, None,
    )

    n = h * w
    s_i = jnp.full((n,), it, jnp.uint32)
    u_film = sampler.get_2d(pixel_id, s_i, 0)
    u_lens = sampler.get_2d(pixel_id, s_i, 1)
    ro, rd, wgt = cam.generate_rays(pixel_xy + u_film, u_lens)
    ld_m, vp_m = sppm_camera_mega(
        ctx, packed, ro, rd, wgt, sampler, pixel_id, it,
        job.integrator.max_depth, interpret=True,
    )

    ld_ref = np.asarray(ld_ref)
    ld_m = np.asarray(ld_m)
    assert np.isfinite(ld_m).all()
    assert ld_ref.sum() > 1
    denom = np.maximum(np.abs(ld_ref), 1e-3)
    rel = np.abs(ld_m - ld_ref) / denom
    assert float((rel.max(-1) > 1e-3).mean()) < 5e-3

    assert (np.asarray(vp_m.valid) == np.asarray(vp_ref.valid)).all()
    live = np.asarray(vp_ref.valid)
    assert live.sum() > 30  # the small film sees ~50 cube hits
    for fld in ("p", "wo", "beta", "dpdu", "ng"):
        a = np.asarray(getattr(vp_m, fld))[live]
        b = np.asarray(getattr(vp_ref, fld))[live]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5, err_msg=fld)
    assert (np.asarray(vp_m.mat)[live] == np.asarray(vp_ref.mat)[live]).all()


@pytest.mark.parametrize("force_bvh", [False, True])
def test_sppm_render_equal_with_and_without_megakernel(monkeypatch,
                                                       force_bvh):
    """render_sppm through the fused passes must produce the same image
    as the jnp wavefront paths (same RNG chain end-to-end).  force_bvh
    routes the camera/photon kernels through the in-kernel packet BVH
    (mesh-scene mode) on the same scene."""
    if force_bvh:
        monkeypatch.setenv("RS_MEGA_BVH", "force")
    from rs_ray_toy_tpu.integrators.sppm import render_sppm
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {
        "integrator_type": "SPPM", "max_depth": 3, "radius": 1.0,
        "n_iters": 2, "photons_per_iter": 1 << 10,
    }
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    ctx = SceneCtx(job.scene)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 10)
    sampler = StratifiedSampler(job.sampler, seed=0)

    # three-way: fully fused (camera kernel + Morton deposit kernel),
    # fused camera + jnp scan deposit, and fully jnp — all must agree
    imgs = {}
    monkeypatch.setenv("RS_SPPM_MEGA_CPU", "1")  # force fused on CPU
    for tag, (mega, dep) in {
        "fused": ("1", "1"), "scan": ("1", "0"), "jnp": ("0", "0"),
    }.items():
        monkeypatch.setenv("RS_MEGAKERNEL", mega)
        monkeypatch.setenv("RS_SPPM_DEPOSIT", dep)
        imgs[tag] = np.asarray(
            render_sppm(ctx, cam, sampler, job.film, job.integrator)
        )
    assert np.isfinite(imgs["fused"]).all()
    assert imgs["jnp"].max() > 0
    for tag in ("fused", "scan"):
        rmse = float(np.sqrt(np.mean((imgs[tag] - imgs["jnp"]) ** 2)))
        assert rmse < 1e-5, f"sppm {tag} path deviates: rmse {rmse}"
    # the deposit actually fires in this scene (photons land on VPs)
    assert float(np.abs(imgs["fused"]).sum()) > 0


def test_halton_render_job_equal_with_and_without_megakernel(monkeypatch):
    """BASELINE config 2 at the render_job level: a Halton scene must
    produce the same image on the megakernel (slot values via the input
    matrix, s_idx traced through the pass fori-loop) as on the jnp
    wavefront path."""
    from rs_ray_toy_tpu.render import render_job
    from rs_ray_toy_tpu.scene.loader import load_scene

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 4}
    cfg["Sampler"] = {"sampler_type": "HaltonSampler", "nsamp": 4}
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("RS_MEGAKERNEL", flag)
        job = load_scene(path)
        res = render_job(job, pupil_samples=1 << 10, seed=0)
        outs[flag] = np.asarray(res["rgb_srgb_input"])
    assert outs["0"].max() > 0
    rmse = float(np.sqrt(np.mean((outs["1"] - outs["0"]) ** 2)))
    assert rmse < 1e-4, f"halton megakernel render deviates: rmse {rmse}"


def test_sppm_halton_render_job_fused_matches_jnp(monkeypatch):
    """The PRODUCTION SPPM sampler is Halton (sppm.rs:130, built by
    render._render_sppm_job) — the fused camera pass must engage with it
    (slot values ride in as an input matrix, _sppm_slots) and the fully
    fused pipeline (camera kernel + Morton-blocked deposit, incl. the
    blocked pixel order) must match the jnp wavefront path through the
    whole render_job surface.  Round-3 regression: the Halton gate
    previously rejected the production sampler, so deploy_render always
    fell back to the serialized jnp deposit."""
    from rs_ray_toy_tpu.render import render_job
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.ops.sppm_megakernel import supports_sppm_camera
    from rs_ray_toy_tpu.sampler.halton import HaltonSampler
    from rs_ray_toy_tpu.scene.loader import SamplerSpec
    from rs_ray_toy_tpu.integrators.common import SceneCtx

    cfg = json.load(open(os.path.join(SAMPLES, "scene.json")))
    cfg["Film"]["xres"], cfg["Film"]["yres"] = 64, 36
    cfg["Integrator"] = {
        "integrator_type": "SPPM", "max_depth": 3, "radius": 1.0,
        "n_iters": 2, "photons_per_iter": 1 << 10,
    }
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(SAMPLES, "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))

    # the production sampler passes the fused gate
    job = load_scene(path)
    ctx = SceneCtx(job.scene)
    sampler = HaltonSampler(
        SamplerSpec(kind="halton", nsamp=2, sample_at_center=True),
        64, 36, seed=0,
    )
    assert supports_sppm_camera(ctx, job.integrator, sampler)

    outs = {}
    monkeypatch.setenv("RS_SPPM_MEGA_CPU", "1")
    for tag, flag in {"fused": "1", "jnp": "0"}.items():
        monkeypatch.setenv("RS_MEGAKERNEL", flag)
        job = load_scene(path)
        res = render_job(job, spp_override=0, pupil_samples=1 << 10, seed=0)
        outs[tag] = np.asarray(res["rgb_srgb_input"])
    assert outs["jnp"].max() > 0
    rmse = float(np.sqrt(np.mean((outs["fused"] - outs["jnp"]) ** 2)))
    assert rmse < 1e-5, f"sppm halton fused path deviates: rmse {rmse}"
