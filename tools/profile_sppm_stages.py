"""Stage-level TPU timing for the fused SPPM pipeline at bench scale.

Times each stage of integrators/sppm.render_sppm's one_iteration
separately (fused camera walk, host sample_le, fused photon walk, the
event sort, the deposit kernel, radius/tau update) so the round-4
optimization target is chosen from measured numbers, not guesses
(VERDICT r3 next #1: SPPM is 2.06 Mrays/s camera — the worst row).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import numpy as np
import jax
import jax.numpy as jnp

SCENE = "/root/reference/samples/scene.json"


def _force(out):
    # scalar host readback: block_until_ready can return early through
    # the tunnel (BENCH_r04's 9451 row) and full-buffer readbacks pay
    # tunnel bandwidth — sync on one element instead
    jax.block_until_ready(out)
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if isinstance(l, jax.Array)]
    if leaves:
        np.asarray(leaves[0].reshape((-1,))[:1])


def timed(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    _force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        _force(out)
    return (time.time() - t0) / n, out


def main():
    from rs_ray_toy_tpu.scene.loader import load_scene, SamplerSpec
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.integrators import sppm as sp
    from rs_ray_toy_tpu.ops import sppm_megakernel as smk
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.halton import HaltonSampler
    from rs_ray_toy_tpu.core import lowdiscrepancy as ld
    from rs_ray_toy_tpu.core.sampling import sample_discrete_1d
    from rs_ray_toy_tpu.config import DTYPE

    n_iters = 4
    max_depth = 3
    n_photons = 1 << 17

    cfg = json.load(open(SCENE))
    cfg["Integrator"] = {
        "integrator_type": "SPPM", "radius": 1.0, "n_iters": n_iters,
        "max_depth": max_depth, "photons_per_iter": n_photons,
    }
    td = tempfile.mkdtemp()
    import shutil
    for aux in ("cube.obj", "s_01.png"):
        shutil.copy(os.path.join(os.path.dirname(SCENE), aux), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    spec = job.integrator
    ctx = SceneCtx(job.scene)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 18)
    sampler = HaltonSampler(
        SamplerSpec(kind="halton", nsamp=spec.n_iters, sample_at_center=True),
        job.film.xres, job.film.yres, seed=0,
    )
    h, w = job.film.yres, job.film.xres
    n_pixels = h * w
    interpret = jax.default_backend() == "cpu"
    print(f"backend={jax.default_backend()} film={w}x{h} "
          f"photons={n_photons} depth={max_depth}", flush=True)

    packed = smk.pack_sppm(ctx)
    resolved = smk.resolve_mat_tables(ctx)

    # blocked pixel order (as render_sppm)
    ys, xs = np.mgrid[0:h, 0:w]
    xs, ys = xs.ravel(), ys.ravel()
    BS = 32
    key = (((ys // BS) * ((w + BS - 1) // BS) + (xs // BS)) * (BS * BS)
           + (ys % BS) * BS + (xs % BS))
    perm = np.argsort(key, kind="stable")
    xs, ys = xs[perm], ys[perm]
    pixel_xy = jnp.asarray(np.stack([xs, ys], -1), DTYPE)
    pixel_id = jnp.asarray(ys * w + xs, jnp.uint32)

    it = jnp.uint32(0)
    radius = jnp.full((n_pixels,), spec.radius, DTYPE)

    # ---- stage 1: camera raygen (host lens trace on device) ----
    @jax.jit
    def raygen(it):
        n = pixel_id.shape[0]
        s_i = jnp.full((n,), it, jnp.uint32)
        u_film = sampler.get_2d(pixel_id, s_i, 0)
        u_lens = sampler.get_2d(pixel_id, s_i, 1)
        return cam.generate_rays(pixel_xy + u_film, u_lens)

    t_raygen, (ro, rd, wgt) = timed(raygen, it)

    # ---- stage 2: fused camera walk ----
    @jax.jit
    def camera(ro, rd, wgt, it):
        return smk.sppm_camera_mega(
            ctx, packed, ro, rd, wgt, sampler, pixel_id, it, max_depth,
            interpret=interpret,
        )

    t_cam, (ld_delta, vp) = timed(camera, ro, rd, wgt, it)

    # ---- stage 3: host sample_le + bounce uniforms ----
    light_distr = ctx._power_distribution

    @jax.jit
    def emit(it):
        pidx = jnp.arange(n_photons)
        halton_index = (it * n_photons + pidx).astype(jnp.int32)

        def ri(dim):
            return ld.radical_inverse(dim, halton_index)

        u_light_sample = ri(0)
        light_idx, light_pdf = sample_discrete_1d(light_distr, u_light_sample)
        u0 = jnp.stack([ri(1), ri(2)], axis=-1)
        u1 = jnp.stack([ri(3), ri(4)], axis=-1)
        ro, rd, n_l, le, pdf_pos, pdf_dir = sp._sample_le(ctx, light_idx, u0, u1)
        from rs_ray_toy_tpu.core import vec
        beta = (le * vec.absdot(n_l, rd)[:, None]
                / jnp.maximum(light_pdf * pdf_pos * pdf_dir, 1e-20)[:, None])
        ph_active = ((pdf_pos > 0.0) & (pdf_dir > 0.0)
                     & jnp.any(le > 0.0, axis=-1) & jnp.any(beta > 0.0, axis=-1))
        u_rows = []
        for depth in range(max_depth - 1):
            d_b = 5 + 2 * depth
            u_rows.append(ri(d_b))
            u_rows.append(ri(d_b + 1))
            u_rows.append(ri(d_b + 2 + max_depth * 2))
        return ro, rd, beta, ph_active, jnp.stack(u_rows, 0)

    t_emit, (pro, prd, pbeta, pact, u_rows) = timed(emit, it)

    # ---- stage 4: fused photon walk ----
    @jax.jit
    def photon(pro, prd, pbeta, pact, u_rows):
        return smk.sppm_photon_mega(
            packed, pro, prd, pbeta, pact, u_rows, max_depth,
            interpret=interpret,
        )

    t_ph, evs = timed(photon, pro, prd, pbeta, pact, u_rows)

    # ---- stage 5: grid bounds (jnp) ----
    @jax.jit
    def bounds(vp, radius):
        valid = vp.valid & jnp.any(vp.beta > 0.0, axis=-1)
        big = jnp.float32(3e38)
        lo = jnp.min(jnp.where(valid[:, None], vp.p - radius[:, None], big), 0)
        hi = jnp.max(jnp.where(valid[:, None], vp.p + radius[:, None], -big), 0)
        any_vp = jnp.any(valid)
        lo = jnp.where(any_vp, lo, 0.0)
        hi = jnp.where(any_vp, hi, 1.0)
        return lo, hi - lo

    t_bounds, (lo, diag) = timed(bounds, vp, radius)

    # ---- stage 6: deposit (sort + ranges + kernel, as deposit_mega) ----
    @jax.jit
    def deposit(vp, radius, evs, lo, diag):
        return smk.deposit_mega(
            vp, radius, resolved, *evs, lo, diag, packed[3], packed[4],
            interpret=interpret,
        )

    t_dep, (phi, m_acc) = timed(deposit, vp, radius, evs, lo, diag)

    # ---- stage 6b: the event sort alone ----
    ev_p, ev_wi, ev_beta, ev_live = evs

    @jax.jit
    def sort_only(ev_p, ev_wi, ev_beta, ev_live):
        from jax import lax
        ekey = jnp.where(ev_live, jnp.uint32(1), jnp.uint32(9))
        return lax.sort(
            (ekey, ev_p[:, 0], ev_p[:, 1], ev_p[:, 2],
             ev_wi[:, 0], ev_wi[:, 1], ev_wi[:, 2],
             ev_beta[:, 0], ev_beta[:, 1], ev_beta[:, 2]),
            num_keys=1,
        )[0]

    t_sort, _ = timed(sort_only, ev_p, ev_wi, ev_beta, ev_live)

    # ---- stage 7: radius/tau update ----
    @jax.jit
    def update(vp, radius, phi, m_acc):
        state_n = jnp.zeros((n_pixels,), DTYPE)
        tau = jnp.zeros((n_pixels, 3), DTYPE)
        m = m_acc.astype(DTYPE)
        has_m = m_acc > 0
        gamma = 2.0 / 3.0
        n_new = state_n + gamma * m
        r_new = radius * jnp.sqrt(n_new / jnp.maximum(state_n + m, 1e-20))
        tau_new = ((tau + vp.beta * phi) * (r_new * r_new)[:, None]
                   / jnp.maximum(radius * radius, 1e-20)[:, None])
        return (jnp.where(has_m, r_new, radius),
                jnp.where(has_m, n_new, state_n),
                jnp.where(has_m[:, None], tau_new, tau))

    t_upd, _ = timed(update, vp, radius, phi, m_acc)

    # ---- whole fused iteration (render_sppm's one_iteration analog) ----
    total = t_raygen + t_cam + t_emit + t_ph + t_bounds + t_dep + t_upd
    n_vp = int(np.asarray(jnp.sum(vp.valid)))
    n_live_ev = int(np.asarray(jnp.sum(evs[3])))
    print(f"VPs valid: {n_vp}/{n_pixels}  live events: {n_live_ev}/{evs[3].shape[0]}")
    for name, t in [
        ("raygen", t_raygen), ("camera_walk", t_cam), ("sample_le", t_emit),
        ("photon_walk", t_ph), ("grid_bounds", t_bounds),
        ("deposit(sort+ranges+kernel)", t_dep), ("  sort_only(approx)", t_sort),
        ("radius_tau_update", t_upd),
    ]:
        print(f"{name:30s} {t*1e3:9.1f} ms  ({100*t/total:5.1f}%)")
    print(f"{'TOTAL (sum of stages)':30s} {total*1e3:9.1f} ms")
    cam_mrays = n_pixels / total / 1e6
    ph_mrays = n_photons / total / 1e6
    print(f"per-iteration camera Mrays/s (stage-sum bound): {cam_mrays:.2f}")
    print(f"per-iteration photon Mrays/s (stage-sum bound): {ph_mrays:.2f}")


if __name__ == "__main__":
    main()
