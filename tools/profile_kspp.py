"""Samples-per-pass sweep for the fused-kernel bench rows that sit just
below the 50 Mrays/s bar (fog / fog_area / env at ~93%): how much of the
gap is per-pass fixed cost that a bigger megabatch amortizes?

Timing rides render_job's own timed region (force_ready host readback).
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

SCENE = "/root/reference/samples/scene.json"


def build(kind):
    cfg = json.load(open(SCENE))
    if kind == "env":
        cfg["lights"] = [
            {"light_type": "infinite", "l": {"values": [1.0, 1.0, 1.0]}}
        ]
        cfg["infinite_lights"] = [
            {"light_type": "infinite", "l": {"values": [1.0, 1.0, 1.0]}}
        ]
        cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 5}
        spp = 64
    else:  # fog
        cfg["Integrator"] = {"integrator_type": "Volpath", "max_depth": 5}
        cfg["Camera"]["medium"] = {"medium_type": "Homogeneous", "g": 0.0}
        spp = 16
    td = tempfile.mkdtemp()
    for aux in ("cube.obj", "s_01.png"):
        shutil.copy(os.path.join(os.path.dirname(SCENE), aux), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    return path, spp


def main():
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    for kind in ("env", "fog"):
        path, spp = build(kind)
        for k in (16, 32, 64):
            if k > spp:
                continue
            os.environ["RS_SAMPLES_PER_PASS"] = str(k)
            job = load_scene(path)
            res = render_job(job, spp_override=spp, pupil_samples=1 << 18)
            print(
                f"{kind} spp={spp} k={k}: {res['mrays_per_s']:8.2f} Mrays/s "
                f"({res['elapsed_s']*1e3:7.1f} ms, {res['render_path']})",
                flush=True,
            )
        del os.environ["RS_SAMPLES_PER_PASS"]


if __name__ == "__main__":
    main()
