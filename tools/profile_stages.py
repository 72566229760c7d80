"""Stage-level TPU timing for the render pipeline."""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rs_ray_toy_tpu.scene.loader import load_scene
from rs_ray_toy_tpu.camera.realistic import RealisticCamera
from rs_ray_toy_tpu.integrators.common import SceneCtx
from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler
from rs_ray_toy_tpu.bsdf import eval as beval
from rs_ray_toy_tpu.bsdf.lobes import BXDF_ALL


def timeit(name, fn, *args, reps=8):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return r


def main():
    job = load_scene("/root/reference/samples/scene.json")
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 14)
    ctx = SceneCtx(job.scene)
    sampler = StratifiedSampler(job.sampler)
    h, w = 360, 640
    n = h * w
    ys, xs = np.mgrid[0:h, 0:w]
    pixel_xy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    pixel_id = jnp.asarray((ys * w + xs).ravel(), jnp.uint32)
    s_idx = jnp.zeros((n,), jnp.uint32)

    f_sample = jax.jit(lambda: (
        sampler.get_2d(pixel_id, s_idx, 0), sampler.get_2d(pixel_id, s_idx, 1)))
    u_film, u_lens = timeit("sampler 2x get_2d", f_sample)

    f_raygen = jax.jit(lambda uf, ul: cam.generate_rays(pixel_xy + uf, ul))
    o, d, wgt = timeit("camera raygen", f_raygen, u_film, u_lens)

    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    f_isect = jax.jit(lambda o, d: ctx.intersect(o, d, t_max))
    hit = timeit("intersect (pallas)" if ctx.use_pallas else "intersect", f_isect, o, d)

    f_surf = jax.jit(lambda hit, o, d: ctx.surface(hit, o, d))
    si = timeit("surface_interaction", f_surf, hit, o, d)

    def _shade(si):
        prm = dict(ctx.shade_params(si))
        prm.pop("_kinds", None)
        return prm
    f_shade = jax.jit(_shade)
    params = timeit("shade_params", f_shade, si)
    params["_kinds"] = ctx.static_kinds

    frame = ctx.frame(si)
    u = sampler.get_2d(pixel_id, s_idx, 5)

    f_bf = jax.jit(lambda: beval.bsdf_f(params, frame, si.wo, d, BXDF_ALL))
    timeit("bsdf_f", f_bf)
    f_bp = jax.jit(lambda: beval.bsdf_pdf(params, frame, si.wo, d, BXDF_ALL))
    timeit("bsdf_pdf", f_bp)
    f_bs = jax.jit(lambda: beval.bsdf_sample(params, frame, si.wo, u, BXDF_ALL))
    timeit("bsdf_sample", f_bs)

    from rs_ray_toy_tpu.film import film as fmod
    film = fmod.make_film(job.film)
    l = jnp.ones((n, 3), jnp.float32)
    f_film = jax.jit(lambda film: fmod.add_samples(film, job.film, pixel_xy + u_film, l, wgt))
    timeit("film add_samples", f_film, film)


if __name__ == "__main__":
    main()
