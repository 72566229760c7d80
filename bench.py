"""Benchmark: render the BASELINE configs and report Mrays/s on this chip.

Default (BENCH_MATRIX=1): runs every BASELINE config (1-5 + SPPM) in one
process.  The flagship Path config runs FIRST, and after every completed
row the flagship HEADLINE line is re-printed (with a cumulative `rows`
dict) so a last-line parser always records the headline — even if the
run is killed mid-matrix (round 3 lost 5 rows and its headline to a
driver timeout, rc 124).  A wall-clock deadline (BENCH_DEADLINE_S,
default 3000s) skips remaining rows rather than timing out.
BENCH_MATRIX=0 restores the single-config env-driven mode
(BENCH_SCENE/BENCH_MATERIAL/BENCH_INTEGRATOR/BENCH_FOG/BENCH_SPP).

Baseline (BASELINE.json north star): 50 Mrays/s on one v5e chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compile cache: repeat benchmark runs skip the multi-minute
# remote compile (harmless when cold or unsupported)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import numpy as np

BASELINE_MRAYS = 50.0
# sanity ceiling: a v5e chip cannot exceed a few hundred Mrays/s on these
# scenes — any larger number means the timing harness returned garbage
# (BENCH_r04 shipped 9451 Mrays/s when block_until_ready returned early).
# Rows above the ceiling are REFUSED, loudly, rather than recorded.
CEILING_MRAYS = float(os.environ.get("BENCH_CEILING_MRAYS", "500"))
SCENE = "/root/reference/samples/scene.json"

EXTRA_MATERIALS = {
    "mat_mirror": {
        "material_type": "MirrorMaterial", "material_name": "mat_mirror",
    },
    "mat_glass": {
        "material_type": "GlassMaterial",
        "material_name": "mat_glass",
        "eta": 1.5,
    },
    # BASELINE config 5: Disney subsurface (probe-chain BSSRDF)
    "mat_sss": {
        "material_type": "DisneyMaterial",
        "material_name": "mat_sss",
        "color": {"values": [0.8, 0.6, 0.4]},
        "scatter_distance": {"values": [1.0, 0.8, 0.6]},
        "roughness": 0.3,
    },
    # textured matte: kd from the reference scene's s_01.png imagemap —
    # measures the textured-scene path (VERDICT r3 missing #3: textured
    # materials ride the jnp wavefront loop with ray differentials)
    "mat_textured": {
        "material_type": "MatteMaterial",
        "material_name": "mat_textured",
        "kd": "s_01",
    },
}


def _build_scene(scene_kind, material, integrator_kind, fog, spp,
                 sppm_cfg=None):
    """Materialize one benchmark scene; returns (path, tag)."""
    import tempfile
    import shutil as _sh

    scene_path = SCENE
    tag = "scene_json"
    if scene_kind == "grid":
        from rs_ray_toy_tpu.scene.gen import write_grid_scene

        n = int(os.environ.get("BENCH_GRID_N", "40"))
        scene_path = write_grid_scene(tempfile.mkdtemp(), ny=n, nz=n)
        tag = f"grid{12 * n * n}tri"
    elif scene_kind == "grid_fog":
        from rs_ray_toy_tpu.scene.gen import write_grid_fog_scene

        scene_path = write_grid_fog_scene(
            tempfile.mkdtemp(), n=16, sigma_scale=0.5
        )
        tag = "grid_fog16"

    cfg = json.load(open(scene_path))
    if scene_kind == "sphere_area":
        # round-3 widened-kernel row: sphere primitives + a sphere-area
        # light (MIS NEE) on top of the reference scene
        cfg["Aggregate"]["primitives"].append({
            "primitive_type": "sphere", "material_name": "mat_matte",
            "radius": 1.2, "world_pos": [34.0, 0.8, 0.5]})
        cfg["Aggregate"]["primitives"].append({
            "primitive_type": "sphere", "material_name": "mat_matte",
            "radius": 0.8, "world_pos": [36.0, -1.2, -1.5]})
        cfg["lights"].append({
            "light_type": "diffuse",
            "spectrum": {"values": [30.0, 25.0, 20.0]},
            "light_shape": {"shape_type": "sphere", "radius": 0.5,
                            "world_pos": [33.0, 3.0, 1.0]}})
        tag += "_spharea"
    elif scene_kind == "fog_area":
        # round-3 widened volpath kernel: sphere-area light MIS NEE in fog
        # (no sphere prims: the volpath kernel subset is triangles-only)
        cfg["lights"].append({
            "light_type": "diffuse",
            "spectrum": {"values": [60.0, 50.0, 40.0]},
            "light_shape": {"shape_type": "sphere", "radius": 0.6,
                            "world_pos": [33.0, 3.0, 1.0]}})
        tag += "_spharea"
    elif scene_kind == "env":
        # constant environment light: CDF NEE + BSDF counter branch +
        # escape-le, all in-kernel
        cfg["lights"] = [
            {"light_type": "infinite", "l": {"values": [1.0, 1.0, 1.0]}}
        ]
        cfg["infinite_lights"] = [
            {"light_type": "infinite", "l": {"values": [1.0, 1.0, 1.0]}}
        ]
        tag += "_env"
    if material:
        cfg.setdefault("materials", [])
        names = {m.get("material_name") for m in cfg["materials"]}
        if material in EXTRA_MATERIALS and material not in names:
            cfg["materials"].append(EXTRA_MATERIALS[material])
        for prim in cfg["Aggregate"]["primitives"]:
            prim["material_name"] = material
        tag += "_" + material.removeprefix("mat_")
    cfg_kind = {
        "path": "Path", "debug": "Debug", "direct": "DirectLighting",
        "volpath": "Volpath", "sppm": "SPPM",
    }.get(integrator_kind, "Path")
    old = cfg.get("Integrator", {}) or {}
    cfg["Integrator"] = {**old, "integrator_type": cfg_kind}
    if cfg_kind == "SPPM":
        cfg["Integrator"].update(sppm_cfg or {})
    if fog:
        # BASELINE config 4: homogeneous camera medium (VolPath)
        cfg.setdefault("Camera", {})["medium"] = {
            "medium_type": "Homogeneous", "g": 0.0,
        }
        tag += "_fog"
    if scene_kind == "halton":
        # BASELINE config 2 proper: low-discrepancy sampler (the kernel
        # consumes HaltonSampler slot values via the input-matrix path)
        cfg["Sampler"] = {"sampler_type": "HaltonSampler", "nsamp": spp}
        tag += "_halton"
    td = tempfile.mkdtemp()
    for aux in ("cube.obj", "s_01.png"):
        src = os.path.join(os.path.dirname(scene_path), aux)
        if os.path.exists(src):
            _sh.copy(src, td)
    out = os.path.join(td, "bench.json")
    json.dump(cfg, open(out, "w"))
    return out, tag


def _run_one(scene_kind, material, integrator_kind, fog, spp, sppm_cfg=None):
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    scene_path, tag = _build_scene(
        scene_kind, material, integrator_kind, fog, spp, sppm_cfg
    )
    pupil = 1 << int(os.environ.get("BENCH_PUPIL_LOG2", "18"))
    job = load_scene(scene_path)
    # film override for quick local smoke runs (driver uses the defaults)
    if os.environ.get("BENCH_XRES"):
        job.film.xres = int(os.environ["BENCH_XRES"])
        job.film.yres = int(os.environ.get("BENCH_YRES", job.film.xres * 9 // 16))
    try:
        res = render_job(job, spp_override=spp, pupil_samples=pupil)
    except Exception as e:  # pragma: no cover - environment insurance
        # a Pallas/Mosaic failure on an unfamiliar toolchain must not leave
        # the benchmark without a number: retry on the jnp wavefront path
        if os.environ.get("RS_MEGAKERNEL", "1") == "0":
            raise
        print(f"megakernel path failed ({type(e).__name__}): {e}",
              file=sys.stderr)
        print("retrying on the jnp fallback path", file=sys.stderr)
        prev = os.environ.get("RS_MEGAKERNEL")
        os.environ["RS_MEGAKERNEL"] = "0"
        try:
            job = load_scene(scene_path)
            res = render_job(job, spp_override=spp, pupil_samples=pupil)
        finally:
            # scope the fallback to THIS config: a leaked =0 would silently
            # benchmark every later matrix row on the jnp path
            if prev is None:
                del os.environ["RS_MEGAKERNEL"]
            else:
                os.environ["RS_MEGAKERNEL"] = prev
    value = (
        res["camera_mrays_per_s"]
        if integrator_kind == "sppm"
        else res["mrays_per_s"]
    )
    line = {
        "metric": f"camera_mrays_per_s_{tag}_{integrator_kind}",
        "value": round(float(value), 3),
        "unit": "Mrays/s",
        "vs_baseline": round(float(value) / BASELINE_MRAYS, 4),
        "spp": spp,
        "path": res.get("render_path", "jnp"),
        # which fused kernel engaged (None = jnp wavefront) — a silent
        # gate regression flips this field in the bench artifact
        "kernel": res.get("fused_kernel"),
    }
    if integrator_kind == "sppm":
        line["photon_mrays_per_s"] = round(float(res["photon_mrays_per_s"]), 3)
        line["spp"] = res.get("camera_rays", 0) // (job.film.xres * job.film.yres)
        for k in ("sppm_fused_camera", "sppm_fused_photon",
                  "sppm_fused_deposit"):
            line[k] = bool(res.get(k, False))
    out_png = os.environ.get("BENCH_OUT", "")
    if out_png:
        from rs_ray_toy_tpu.film.film import write_png

        write_png(res["rgb_srgb_input"], out_png)
    return line


# BASELINE config matrix (configs 1-5 + SPPM).  The flagship Path row runs
# FIRST (it is the headline; round 3 ran it last and a driver timeout ate
# it), followed by rows in descending evidence value.
MATRIX = [
    # (key, scene_kind, material, integrator, fog, spp, sppm_cfg)
    ("path", "ref", "", "path", False, 64, None),
    # BASELINE config 2 proper: low-discrepancy (Halton) sampler, 256 spp
    ("halton", "halton", "", "path", False, 256, None),
    ("debug", "ref", "", "debug", False, 16, None),
    ("sppm", "ref", "", "sppm", False, 0,
     {"radius": 1.0, "n_iters": 4, "max_depth": 3,
      "photons_per_iter": 1 << 17}),
    ("grid", "grid", "", "path", False, 8, None),
    ("fog", "ref", "", "volpath", True, 16, None),
    # BASELINE config 4's hard half: GridDensity camera medium (delta/
    # ratio tracking in-kernel, round 5 — was jnp-only)
    ("grid_fog", "grid_fog", "", "volpath", False, 16, None),
    ("glass", "ref", "mat_glass", "path", False, 64, None),
    ("sss", "ref", "mat_sss", "path", False, 16, None),
    ("sphere_area", "sphere_area", "", "path", False, 64, None),
    ("fog_area", "fog_area", "", "volpath", True, 16, None),
    ("env", "env", "", "path", False, 64, None),
    # textured-matte: imagemap kd tapped in-kernel on the packed coarse
    # pyramid (ops/tex_tile.py; round 5 — was 0.026 Mrays/s on the jnp
    # wavefront + serialized-gather path, now ~7.8 in the megakernel)
    ("textured", "ref", "mat_textured", "path", False, 16, None),
]


# Configs whose kernels have ever faulted the TPU at RUNTIME run in a child
# process: a device fault wedges the whole process's TPU client, so isolation
# keeps the rest of the matrix alive (the fault itself is a bug to fix, but
# the bench artifact must not lose every later row to it).
ISOLATE = {"sppm"}


def _run_isolated(key, timeout_s=3300):
    """Run one config in a child process; returns its JSON line (or None).

    Device faults wedge the whole process's TPU client, so faulting
    configs are isolated to keep the rest of the matrix alive."""
    import subprocess

    env = dict(os.environ, BENCH_CONFIGS=key, BENCH_CHILD="1")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
            timeout=max(60, timeout_s),
        )
    except subprocess.TimeoutExpired:
        print(f"config {key} child timed out", file=sys.stderr)
        return None
    sys.stderr.write(proc.stderr)
    line = None
    for raw in proc.stdout.splitlines():
        raw = raw.strip()
        if raw.startswith("{"):
            try:
                cand = json.loads(raw)
            except json.JSONDecodeError:
                continue
            if "rows" not in cand:  # skip the child's own headline lines
                line = cand
    if proc.returncode != 0:
        print(f"config {key} child exited {proc.returncode}", file=sys.stderr)
    return line


def main():
    if os.environ.get("BENCH_MATRIX", "1") != "0":
        only = [
            s for s in os.environ.get("BENCH_CONFIGS", "").split(",") if s
        ]
        in_child = os.environ.get("BENCH_CHILD") == "1"
        deadline = time.time() + float(
            os.environ.get("BENCH_DEADLINE_S", "3000")
        )
        rows = {}  # key -> Mrays/s of every completed row
        headline = None  # the flagship (or best) row line

        def print_headline():
            """Re-emit the headline with the cumulative rows dict LAST, so
            a last-line parser records the flagship no matter where a
            timeout lands."""
            if headline is None:
                return
            out = dict(headline)
            out["rows"] = {k: v for k, v in rows.items()}
            print(json.dumps(out), flush=True)

        for key, sk, mat, integ, fog, spp, scfg in MATRIX:
            if only and key not in only:
                continue
            remaining = deadline - time.time()
            if not in_child and remaining < 60 and rows:
                print(f"deadline: skipping configs from {key} on",
                      file=sys.stderr)
                break
            if key in ISOLATE and not in_child:
                line = _run_isolated(key, timeout_s=remaining)
                if line is None:
                    continue
                if line["value"] > CEILING_MRAYS:
                    print(
                        f"BENCH SANITY FAILURE: config {key} reported "
                        f"{line['value']} Mrays/s > ceiling {CEILING_MRAYS} "
                        "— timing harness returned garbage; row REFUSED",
                        file=sys.stderr,
                    )
                    continue
                print(json.dumps(line), flush=True)
            else:
                try:
                    line = _run_one(sk, mat, integ, fog, spp, scfg)
                except Exception as e:  # keep the matrix alive per-config
                    print(f"config {key} failed: {type(e).__name__}: {e}",
                          file=sys.stderr)
                    continue
                if line["value"] > CEILING_MRAYS:
                    print(
                        f"BENCH SANITY FAILURE: config {key} reported "
                        f"{line['value']} Mrays/s > ceiling {CEILING_MRAYS} "
                        "— timing harness returned garbage; row REFUSED",
                        file=sys.stderr,
                    )
                    continue
                line["config"] = key
                print(json.dumps(line), flush=True)
            rows[key] = line["value"]
            if key == "path" or headline is None:
                headline = line
            if not in_child:
                print_headline()
        return
    # single-config env-driven mode
    spp = int(os.environ.get("BENCH_SPP", "64"))
    scene_kind = os.environ.get("BENCH_SCENE", "ref")
    material = os.environ.get("BENCH_MATERIAL", "")
    kind = os.environ.get("BENCH_INTEGRATOR", "path")
    fog = bool(os.environ.get("BENCH_FOG"))
    line = _run_one(scene_kind, material, kind, fog, spp)
    if line["value"] > CEILING_MRAYS:
        print(
            f"BENCH SANITY FAILURE: {line['value']} Mrays/s > ceiling "
            f"{CEILING_MRAYS} — timing harness returned garbage; row REFUSED",
            file=sys.stderr,
        )
        sys.exit(1)
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
