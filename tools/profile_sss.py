"""Stage-level TPU timing for BASELINE config 5 (Disney BSSRDF).

Times one full li_path pass on the sss scene against the same scene
with a matte material (the jnp-loop baseline), plus the BSSRDF probe
machinery in isolation, so the round-4 fusion target is chosen from
measured numbers.
"""

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
SSS_MAT = {
    "material_type": "DisneyMaterial",
    "material_name": "mat_sss",
    "color": {"values": [0.8, 0.6, 0.4]},
    "scatter_distance": {"values": [1.0, 0.8, 0.6]},
    "roughness": 0.3,
}


def _job(material):
    from rs_ray_toy_tpu.scene.loader import load_scene

    cfg = json.load(open(SCENE))
    cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 5}
    if material:
        cfg.setdefault("materials", []).append(SSS_MAT)
        for p in cfg["Aggregate"]["primitives"]:
            p["material_name"] = material
    td = tempfile.mkdtemp()
    shutil.copy(os.path.join(os.path.dirname(SCENE), "cube.obj"), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    return load_scene(path)


def timeit(name, fn, *args, reps=3):
    r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt * 1000:.1f} ms", flush=True)
    return r, dt


def main():
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.integrators.path import li_path
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler

    os.environ["RS_MEGAKERNEL"] = "0"  # jnp loop for both (A/B fair)
    for mat in ("mat_sss", ""):
        job = _job(mat)
        ctx = SceneCtx(job.scene)
        cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 18)
        sampler = StratifiedSampler(job.sampler)
        h, w = job.film.yres, job.film.xres
        n = h * w
        ys, xs = np.mgrid[0:h, 0:w]
        pid = jnp.asarray((ys * w + xs).ravel(), jnp.uint32)
        pxy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
        sid = jnp.zeros((n,), jnp.uint32)
        u_film = sampler.get_2d(pid, sid, 0)
        u_lens = sampler.get_2d(pid, sid, 1)
        o, d, wgt = jax.jit(
            lambda uf, ul: cam.generate_rays(pxy + uf, ul)
        )(u_film, u_lens)
        label = mat or "matte"
        f_pass = jax.jit(
            lambda o, d, wgt: li_path(
                ctx, o, d, wgt, sampler, pid, sid, job.integrator
            )
        )
        _, dt = timeit(f"li_path full pass [{label}]", f_pass, o, d, wgt)
        print(f"  -> e2e {1e-6 * n / dt:.2f} Mrays/s (camera rays)", flush=True)

        if mat:
            # BSSRDF probe machinery in isolation on the primary hits
            from rs_ray_toy_tpu.bsdf import bssrdf as bmod
            from rs_ray_toy_tpu.bsdf import eval as beval

            t_max = jnp.full((n,), jnp.inf, jnp.float32)
            hit, si = jax.jit(
                lambda o, d: ctx.intersect_shaded(o, d, t_max)
            )(o, d)
            si = si._replace(valid=si.valid & hit.valid)
            frame = ctx.frame(si)
            u1 = sampler.get_1d(pid, sid, 7)
            u2 = sampler.get_2d(pid, sid, 8)
            f_probe = jax.jit(
                lambda si, u1, u2: bmod.sample_bssrdf(ctx, si, frame, u1, u2)
            )
            _, dtp = timeit("sample_bssrdf (probe chain)", f_probe, si, u1, u2)
            print(f"  -> probe cost/pass ~= {dtp * 1000:.1f} ms of "
                  f"{dt * 1000:.1f}", flush=True)


if __name__ == "__main__":
    main()
