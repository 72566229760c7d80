"""Decompose deposit_mega's cost at bench scale on the TPU: sort,
event-table build, VP attribute build, ranges, kernel launch."""

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


def timed(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def main():
    from rs_ray_toy_tpu.scene.loader import load_scene, SamplerSpec
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.integrators import sppm as sp
    from rs_ray_toy_tpu.ops import sppm_megakernel as smk
    from rs_ray_toy_tpu.config import DTYPE

    max_depth = 3
    n_photons = 1 << 17
    cfg = json.load(open(SCENE))
    cfg["Integrator"] = {
        "integrator_type": "SPPM", "radius": 1.0, "n_iters": 4,
        "max_depth": max_depth, "photons_per_iter": n_photons,
    }
    td = tempfile.mkdtemp()
    for aux in ("cube.obj", "s_01.png"):
        shutil.copy(os.path.join(os.path.dirname(SCENE), aux), td)
    path = os.path.join(td, "s.json")
    json.dump(cfg, open(path, "w"))
    job = load_scene(path)
    ctx = SceneCtx(job.scene)
    h, w = job.film.yres, job.film.xres
    n_pixels = h * w
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    # synthetic but realistic inputs: VPs on the cube surfaces, sparse
    # live events (bench shape: 90/262144 live)
    n_vp = n_pixels
    vp_p = jnp.asarray(rng.normal([33, 0, 0], 2.0, (n_vp, 3)), DTYPE)
    vp = sp.VisiblePoints(
        p=vp_p,
        wo=jnp.asarray(rng.normal(0, 1, (n_vp, 3)), DTYPE),
        beta=jnp.ones((n_vp, 3), DTYPE),
        mat=jnp.zeros((n_vp,), jnp.int32),
        uv=jnp.zeros((n_vp, 2), DTYPE),
        ns=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], DTYPE), (n_vp, 1)),
        ng=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], DTYPE), (n_vp, 1)),
        dpdu=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], DTYPE), (n_vp, 1)),
        valid=jnp.asarray(rng.random(n_vp) < 0.07),
    )
    radius = jnp.full((n_vp,), 1.0, DTYPE)
    E = (max_depth - 1) * n_photons
    live = jnp.asarray(rng.random(E) < (90 / 262144))
    ev_p = jnp.asarray(rng.normal([33, 0, 0], 2.0, (E, 3)), DTYPE)
    ev_wi = jnp.asarray(rng.normal(0, 1, (E, 3)), DTYPE)
    ev_beta = jnp.ones((E, 3), DTYPE)
    lo = jnp.asarray([25.0, -8.0, -8.0], DTYPE)
    diag = jnp.asarray([16.0, 16.0, 16.0], DTYPE)
    resolved = smk.resolve_mat_tables(ctx)
    packed = smk.pack_sppm(ctx)
    kinds_present, max_lobes = packed[3], packed[4]

    t_all, (phi, m) = timed(
        jax.jit(lambda *a: smk.deposit_mega(
            vp, radius, resolved, *a, lo, diag, kinds_present, max_lobes,
            interpret=interpret)),
        ev_p, ev_wi, ev_beta, live,
    )
    print(f"deposit_mega total:      {t_all*1e3:7.2f} ms")

    # dense-live variant (every event live — sphere-furnace shape)
    t_dense, _ = timed(
        jax.jit(lambda *a: smk.deposit_mega(
            vp, radius, resolved, *a, lo, diag, kinds_present, max_lobes,
            interpret=interpret)),
        ev_p, ev_wi, ev_beta, jnp.ones((E,), bool),
    )
    print(f"deposit_mega dense-live: {t_dense*1e3:7.2f} ms")

    # sort alone
    from jax import lax

    def sort_only(ev_p, ev_wi, ev_beta, live):
        ekey = jnp.where(live, jnp.uint32(3), jnp.uint32(9))
        return lax.sort(
            (ekey, ev_p[:, 0], ev_p[:, 1], ev_p[:, 2],
             ev_wi[:, 0], ev_wi[:, 1], ev_wi[:, 2],
             ev_beta[:, 0], ev_beta[:, 1], ev_beta[:, 2]),
            num_keys=1)[0]

    t_sort, _ = timed(jax.jit(sort_only), ev_p, ev_wi, ev_beta, live)
    print(f"  10-operand sort alone: {t_sort*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
