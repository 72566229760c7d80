"""TPU timing for the fused volpath (fog) kernel vs max_depth.

BASELINE config 4 sits at 33.5 Mrays/s (67% of the 50 north star);
this tool separates the per-bounce kernel cost (slope vs depth) from
fixed per-pass overhead so the optimization target is measured, not
guessed (VERDICT r3 next #6)."""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import numpy as np
import jax
import jax.numpy as jnp

SCENE = "/root/reference/samples/scene.json"


def main():
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    for depth in (1, 2, 3, 5, 8):
        cfg = json.load(open(SCENE))
        cfg["Integrator"] = {
            "integrator_type": "Volpath", "max_depth": depth,
        }
        cfg["Camera"]["medium"] = {"medium_type": "Homogeneous", "g": 0.0}
        td = tempfile.mkdtemp()
        for aux in ("cube.obj", "s_01.png"):
            shutil.copy(os.path.join(os.path.dirname(SCENE), aux), td)
        path = os.path.join(td, "s.json")
        json.dump(cfg, open(path, "w"))
        job = load_scene(path)
        res = render_job(job, spp_override=16, pupil_samples=1 << 18)
        print(
            f"depth={depth}: {res['mrays_per_s']:8.2f} Mrays/s "
            f"({res['elapsed_s']*1e3:7.1f} ms, path={res['render_path']})",
            flush=True,
        )


if __name__ == "__main__":
    main()
