"""Benchmark: render samples/scene.json and report Mrays/s on this chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
SCENE = "/root/reference/samples/scene.json"


def _apply_material(scene_path, material, scene_tag):
    """Rewrite the scene with every prim bound to `material` (mirror /
    glass definitions appended when missing); returns (path, tag)."""
    import tempfile
    import shutil as _sh

    cfg = json.load(open(scene_path))
    cfg.setdefault("materials", [])
    names = {m.get("material_name") for m in cfg["materials"]}
    extra = {
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
    }
    if material in extra and material not in names:
        cfg["materials"].append(extra[material])
    for prim in cfg["Aggregate"]["primitives"]:
        prim["material_name"] = material
    td = tempfile.mkdtemp()
    for aux in ("cube.obj", "s_01.png"):
        src = os.path.join(os.path.dirname(scene_path), aux)
        if os.path.exists(src):
            _sh.copy(src, td)
    out = os.path.join(td, "bench.json")
    json.dump(cfg, open(out, "w"))
    return out, scene_tag + "_" + material.removeprefix("mat_")



def main():
    import jax
    import jax.numpy as jnp
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    spp = int(os.environ.get("BENCH_SPP", "64"))
    # BENCH_SCENE=grid builds the BASELINE config-3 scene: an NxN cube-
    # instance grid (12*N*N triangles) exercising the BVH packet kernel
    scene_kind = os.environ.get("BENCH_SCENE", "ref")
    scene_path = SCENE
    scene_tag = "scene_json"
    if scene_kind == "grid":
        import tempfile

        from rs_ray_toy_tpu.scene.gen import write_grid_scene

        n = int(os.environ.get("BENCH_GRID_N", "40"))
        scene_path = write_grid_scene(tempfile.mkdtemp(), ny=n, nz=n)
        scene_tag = f"grid{12 * n * n}tri"
    material = os.environ.get("BENCH_MATERIAL", "")
    if material:
        scene_path, scene_tag = _apply_material(scene_path, material, scene_tag)
    # benchmark the full 640x360 frame at the configured spp with the Path
    # integrator (BASELINE config 2; scene.json itself configures Debug —
    # override via BENCH_INTEGRATOR=debug to bench that instead).  The
    # integrator is written into the scene BEFORE load: material lobe
    # assembly depends on it (allow_multiple_lobes, renderprocess.rs
    # passes it into compute_scattering_functions contexts)
    kind = os.environ.get("BENCH_INTEGRATOR", "path")
    cfg_kind = {"path": "Path", "debug": "Debug", "direct": "DirectLighting",
                "volpath": "Volpath"}.get(kind, "Path")
    import tempfile as _tf
    import shutil as _sh2

    cfg = json.load(open(scene_path))
    old = cfg.get("Integrator", {}) or {}
    cfg["Integrator"] = {**old, "integrator_type": cfg_kind}
    if os.environ.get("BENCH_FOG"):
        # BASELINE config 4: homogeneous camera medium (VolPath)
        cfg.setdefault("Camera", {})["medium"] = {
            "medium_type": "Homogeneous", "g": 0.0,
        }
        scene_tag += "_fog"
    td2 = _tf.mkdtemp()
    for aux in ("cube.obj", "s_01.png"):
        src = os.path.join(os.path.dirname(scene_path), aux)
        if os.path.exists(src):
            _sh2.copy(src, td2)
    scene_path = os.path.join(td2, "bench.json")
    json.dump(cfg, open(scene_path, "w"))
    job = load_scene(scene_path)
    pupil = 1 << int(os.environ.get("BENCH_PUPIL_LOG2", "18"))
    try:
        res = render_job(job, spp_override=spp, pupil_samples=pupil)
    except Exception as e:  # pragma: no cover - environment insurance
        # a Pallas/Mosaic failure on an unfamiliar toolchain must not leave
        # the benchmark without a number: retry on the jnp wavefront path
        if os.environ.get("RS_MEGAKERNEL", "1") == "0":
            raise
        print(f"megakernel path failed ({type(e).__name__}); jnp fallback",
              file=sys.stderr)
        os.environ["RS_MEGAKERNEL"] = "0"
        job = load_scene(scene_path)
        res = render_job(job, spp_override=spp, pupil_samples=pupil)
    value = res["mrays_per_s"]
    out_png = os.environ.get("BENCH_OUT", "")
    if out_png:
        from rs_ray_toy_tpu.film.film import write_png

        write_png(res["rgb_srgb_input"], out_png)
    print(
        json.dumps(
            {
                "metric": f"camera_mrays_per_s_{scene_tag}_{kind}",
                "value": round(float(value), 3),
                "unit": "Mrays/s",
                "vs_baseline": round(float(value) / BASELINE_MRAYS, 4),
                "spp": spp,
                "path": res.get("render_path", "jnp"),
            }
        )
    )


if __name__ == "__main__":
    main()
