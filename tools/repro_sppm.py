"""Minimal TPU repro driver for the fused SPPM kernels.

Renders the bench SPPM config at a configurable film size with the
fused stages toggled by env (RS_SPPM_DEPOSIT), printing one line per
stage so a device fault can be attributed.  Usage:

    REPRO_XRES=160 REPRO_DEPOSIT=0 python tools/repro_sppm.py
"""

import json
import os
import sys
import tempfile
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

SCENE = "/root/reference/samples/scene.json"


def main():
    if os.environ.get("REPRO_DEPOSIT", "1") == "0":
        os.environ["RS_SPPM_DEPOSIT"] = "0"
    cfg = json.load(open(SCENE))
    cfg["Integrator"] = {
        "integrator_type": "SPPM",
        "radius": 1.0,
        "n_iters": int(os.environ.get("REPRO_ITERS", "2")),
        "max_depth": int(os.environ.get("REPRO_DEPTH", "3")),
        "photons_per_iter": 1 << int(os.environ.get("REPRO_PHOTONS_LOG2", "14")),
    }
    td = tempfile.mkdtemp()
    for aux in ("cube.obj", "s_01.png"):
        src = os.path.join(os.path.dirname(SCENE), aux)
        if os.path.exists(src):
            shutil.copy(src, td)
    path = os.path.join(td, "repro.json")
    json.dump(cfg, open(path, "w"))

    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.render import render_job

    job = load_scene(path)
    if os.environ.get("REPRO_XRES"):
        job.film.xres = int(os.environ["REPRO_XRES"])
        job.film.yres = int(os.environ.get("REPRO_YRES", job.film.xres * 9 // 16))
    print(f"film {job.film.xres}x{job.film.yres} "
          f"deposit={os.environ.get('RS_SPPM_DEPOSIT', '1')}", flush=True)
    res = render_job(job, spp_override=0, pupil_samples=1 << 14)
    print("OK", res.get("render_path"), float(res["rgb_srgb_input"].sum()),
          flush=True)


if __name__ == "__main__":
    main()
