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
    job = load_scene(scene_path)
    # benchmark the full 640x360 frame at the configured spp with the Path
    # integrator (BASELINE config 2; scene.json itself configures Debug —
    # override via BENCH_INTEGRATOR=debug to bench that instead)
    kind = os.environ.get("BENCH_INTEGRATOR", "path")
    job.integrator.kind = kind
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
        job.integrator.kind = kind
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
                "path": res.get("render_path", "jnp"),
            }
        )
    )


if __name__ == "__main__":
    main()
