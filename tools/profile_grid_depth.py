"""Grid-scene (19200 tris, in-megakernel BVH) cost vs max_depth: how
much of the 8.2 Mrays/s row is the coherent camera generation vs the
incoherent bounce/shadow traversals (VERDICT r3 next #3)."""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax


def main():
    from rs_ray_toy_tpu.scene.gen import write_grid_scene
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    for depth in (1, 2, 3, 5):
        scene_path = write_grid_scene(tempfile.mkdtemp(), ny=40, nz=40)
        cfg = json.load(open(scene_path))
        cfg["Integrator"] = {"integrator_type": "Path", "max_depth": depth}
        # keep the scene dir (cube.obj resolves relative to the JSON)
        p2 = os.path.join(os.path.dirname(scene_path), "s.json")
        json.dump(cfg, open(p2, "w"))
        job = load_scene(p2)
        res = render_job(job, spp_override=8, pupil_samples=1 << 18)
        print(
            f"depth={depth}: {res['mrays_per_s']:8.2f} Mrays/s "
            f"({res['elapsed_s']*1e3:7.1f} ms, path={res['render_path']})",
            flush=True,
        )


if __name__ == "__main__":
    main()
