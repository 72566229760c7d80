"""Stage-level TPU timing for the BVH grid scene (BASELINE config 3).

Times the post-fusion traversal stages separately:
  - intersect_shaded on blocked camera rays (coherent packets)
  - occluded on NEE shadow rays (point light: semi-coherent)
  - intersect_shaded on cosine-sampled bounce rays (incoherent)
  - one full li_path pass e2e

so the next perf lever (secondary-ray reordering vs in-megakernel BVH)
is chosen from measured numbers, not estimates.
"""

import sys, os, time, tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rs_ray_toy_tpu.scene.loader import load_scene
from rs_ray_toy_tpu.scene.gen import write_grid_scene
from rs_ray_toy_tpu.camera.realistic import RealisticCamera
from rs_ray_toy_tpu.integrators.common import SceneCtx
from rs_ray_toy_tpu.integrators.path import li_path
from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler


def timeit(name, fn, *args, reps=4):
    r = fn(*args)
    jax.block_until_ready(r)
    # force a host readback (tunnel block_until_ready can return early)
    np.asarray(jax.tree_util.tree_leaves(r)[0][:1])
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0][:1])
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return r, dt


def main():
    n_grid = int(os.environ.get("BENCH_GRID_N", "40"))
    scene_path = write_grid_scene(tempfile.mkdtemp(), ny=n_grid, nz=n_grid)
    job = load_scene(scene_path)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 18)
    ctx = SceneCtx(job.scene)
    sampler = StratifiedSampler(job.sampler)
    h, w = job.film.yres, job.film.xres
    n = h * w
    print(f"tris={int(ctx.tri.count)} film={w}x{h} n={n}", flush=True)

    ys, xs = np.mgrid[0:h, 0:w]
    k = int(os.environ.get("PROFILE_K", "8"))
    if k > 1:
        # sample-major interleaved layout (render.py): 16x8 pixel
        # sub-blocks x k samples per 1024-ray packet
        SUB = 128
        key = (
            ((ys // 8) * ((w + 15) // 16) + (xs // 16)) * SUB
            + (ys % 8) * 16 + (xs % 16)
        ).ravel()
        perm = np.argsort(key, kind="stable")
        xs1 = xs.ravel()[perm]
        ys1 = ys.ravel()[perm]
        n_sub = n // SUB

        def order(t):
            t2 = t.reshape(k, n_sub, SUB, *t.shape[1:])
            return np.swapaxes(t2, 0, 1).reshape(t.shape)

        xs = order(np.tile(xs1, k))
        ys = order(np.tile(ys1, k))
        s_np = order(np.repeat(np.arange(k), n))
        n = n * k
        s_idx = jnp.asarray(s_np, jnp.uint32)
    else:
        BS = 32
        key = (
            ((ys // BS) * ((w + BS - 1) // BS) + (xs // BS)) * (BS * BS)
            + (ys % BS) * BS + (xs % BS)
        ).ravel()
        perm = np.argsort(key, kind="stable")
        xs = xs.ravel()[perm]
        ys = ys.ravel()[perm]
        s_idx = jnp.zeros((n,), jnp.uint32)
    pixel_xy = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)
    pixel_id = jnp.asarray((ys * w + xs), jnp.uint32)

    u_film = sampler.get_2d(pixel_id, s_idx, 0)
    u_lens = sampler.get_2d(pixel_id, s_idx, 1)
    f_raygen = jax.jit(lambda uf, ul: cam.generate_rays(pixel_xy + uf, ul))
    (o, d, wgt), _ = timeit("camera raygen", f_raygen, u_film, u_lens)

    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    f_isect = jax.jit(lambda o, d: ctx.intersect_shaded(o, d, t_max))
    (hs, _dt) = timeit("intersect_shaded camera (blocked)", f_isect, o, d)
    hit, si = hs
    print(f"  -> {1e-6 * n / _dt:.2f} Mrays/s; hits={int(hit.valid.sum())}",
          flush=True)

    # NEE shadow rays toward the first light's position
    lp = np.asarray(ctx.lights.p)[0] if ctx.n_lights else np.array([0.0, 0, 0])
    p_light = jnp.broadcast_to(jnp.asarray(lp, jnp.float32), (n, 3))
    from rs_ray_toy_tpu.integrators.common import shadow_unoccluded
    si_live = si._replace(valid=si.valid & hit.valid)
    f_occ = jax.jit(lambda si: shadow_unoccluded(ctx, si, p_light))
    (_unocc, _dt) = timeit("occluded shadow (toward light)", f_occ, si_live)
    print(f"  -> {1e-6 * n / _dt:.2f} Mrays/s", flush=True)

    # incoherent bounce rays: cosine-sample around the hit normal
    from rs_ray_toy_tpu.core.sampling import cosine_sample_hemisphere
    from rs_ray_toy_tpu.core import vec
    from rs_ray_toy_tpu.accel import geometry as geom

    u_b = sampler.get_2d(pixel_id, s_idx, 5)
    w_loc = cosine_sample_hemisphere(u_b)
    a1, a2 = vec.coordinate_system(si.ns)
    wd = a1 * w_loc[:, 0:1] + a2 * w_loc[:, 1:2] + si.ns * w_loc[:, 2:3]
    bo = geom.offset_ray_origin(si.p, si.ng, wd)
    live = hit.valid
    t2 = jnp.where(live, jnp.inf, 0.0)
    f_b = jax.jit(lambda bo, wd, t2: ctx.intersect_shaded(bo, wd, t2))
    ((h2, _si2), _dt) = timeit("intersect_shaded bounce (incoherent)", f_b, bo, wd, t2)
    print(f"  -> {1e-6 * n / _dt:.2f} Mrays/s over full batch "
          f"({int(live.sum())} live)", flush=True)

    # one full li_path pass
    spec = job.integrator
    f_pass = jax.jit(
        lambda o, d, wgt: li_path(ctx, o, d, wgt, sampler, pixel_id, s_idx, spec)
    )
    (_L, _dt) = timeit("li_path full pass", f_pass, o, d, wgt, reps=2)
    print(f"  -> e2e {1e-6 * n / _dt:.2f} Mrays/s (camera rays)", flush=True)


if __name__ == "__main__":
    main()
