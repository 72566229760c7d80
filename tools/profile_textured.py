"""Isolate the textured-path cost: raygen differentials vs shade_params
texture eval vs the rest of li_path (textured row is 350x the matte jnp
loop; the window-fetch rewrite of mipmap lookups did not move it)."""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
import numpy as np, jax, jax.numpy as jnp

SCENE = "/root/reference/samples/scene.json"

def timed(fn, *a, n=3):
    import numpy as _np
    def _force(x):
        import jax as _jax
        x = _jax.block_until_ready(x)
        leaves = [l for l in _jax.tree_util.tree_leaves(x)
                  if isinstance(l, _jax.Array)]
        if leaves:
            _np.asarray(min(leaves, key=lambda v: v.size).addressable_data(0))
        return x
    out = fn(*a); _force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a); _force(out)
    return (time.time() - t0) / n, out

def main():
    from rs_ray_toy_tpu.scene.loader import load_scene
    from rs_ray_toy_tpu.integrators.common import SceneCtx
    from rs_ray_toy_tpu.camera.realistic import RealisticCamera
    from rs_ray_toy_tpu.sampler.stratified import StratifiedSampler
    from rs_ray_toy_tpu.config import DTYPE

    cfg = json.load(open(SCENE))
    cfg["materials"].append({"material_type": "MatteMaterial",
                             "material_name": "mat_textured", "kd": "s_01"})
    for p in cfg["Aggregate"]["primitives"]:
        p["material_name"] = "mat_textured"
    cfg["Integrator"] = {"integrator_type": "Path", "max_depth": 5}
    td = tempfile.mkdtemp()
    for aux in ("cube.obj", "s_01.png"):
        shutil.copy(os.path.join(os.path.dirname(SCENE), aux), td)
    pth = os.path.join(td, "s.json")
    json.dump(cfg, open(pth, "w"))
    job = load_scene(pth)
    ctx = SceneCtx(job.scene)
    cam = RealisticCamera(job.camera, job.film, pupil_samples=1 << 18)
    sampler = StratifiedSampler(job.sampler, seed=0)
    h, w = job.film.yres, job.film.xres
    ys, xs = np.mgrid[0:h, 0:w]
    pxy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), DTYPE)
    pid = jnp.asarray((ys * w + xs).ravel(), jnp.uint32)
    sid = jnp.zeros((h * w,), jnp.uint32)
    u_f = sampler.get_2d(pid, sid, 0)
    u_l = sampler.get_2d(pid, sid, 1)

    t_rg, (o, d, wt) = timed(jax.jit(lambda: cam.generate_rays(pxy + u_f, u_l)))
    print(f"generate_rays:               {t_rg*1e3:9.1f} ms")
    t_rgd, (o2, d2, wt2, diff) = timed(
        jax.jit(lambda: cam.generate_ray_differentials(pxy + u_f, u_l, spp=4)))
    print(f"generate_ray_differentials:  {t_rgd*1e3:9.1f} ms")

    @jax.jit
    def hit_only(o, d):
        t_max = jnp.full(o.shape[:1], jnp.inf, DTYPE)
        hit, si = ctx.intersect_shaded(o, d, t_max)
        return si.uv, si.p, si.mat

    t_hit, (uv, pw, mat) = timed(hit_only, o, d)
    print(f"intersect_shaded alone:      {t_hit*1e3:9.1f} ms")

    from rs_ray_toy_tpu.scene import textures as texm

    @jax.jit
    def tex_only(uv, pw):
        return texm.eval_all(ctx.registry, ctx.dev_images, uv, pw, None)

    t_tex, _ = timed(tex_only, uv, pw)
    print(f"eval_all (no duv):           {t_tex*1e3:9.1f} ms")

    @jax.jit
    def tex_duv(uv, pw):
        duv = jnp.zeros((uv.shape[0], 4), DTYPE)
        return texm.eval_all(ctx.registry, ctx.dev_images, uv, pw, duv)

    t_txd, _ = timed(tex_duv, uv, pw)
    print(f"eval_all (zero duv, EWA):    {t_txd*1e3:9.1f} ms")

    from rs_ray_toy_tpu.bsdf import eval as beval

    @jax.jit
    def lobes_only(uv, pw, mat):
        tv = texm.eval_all(ctx.registry, ctx.dev_images, uv, pw, None)
        return beval.gather_lobes(
            ctx.mats, tv, jnp.maximum(mat, 0), static_kinds=ctx.static_kinds
        )["s0"]

    t_gl, _ = timed(lobes_only, uv, pw, mat)
    print(f"eval_all + gather_lobes:     {t_gl*1e3:9.1f} ms")

    @jax.jit
    def hit_and_shade(o, d):
        t_max = jnp.full(o.shape[:1], jnp.inf, DTYPE)
        hit, si = ctx.intersect_shaded(o, d, t_max)
        params = ctx.shade_params(si)
        return params["s0"]

    t_sh, _ = timed(hit_and_shade, o, d)
    print(f"intersect + shade (no duv):  {t_sh*1e3:9.1f} ms")

    from rs_ray_toy_tpu.integrators.path import li_path
    @jax.jit
    def full(o, d, wt):
        return li_path(ctx, o, d, wt, sampler, pid, sid, job.integrator,
                       diff=diff)
    t_full, _ = timed(full, o2, d2, wt2)
    print(f"li_path (textured + diff):   {t_full*1e3:9.1f} ms")

    @jax.jit
    def full_nodiff(o, d, wt):
        return li_path(ctx, o, d, wt, sampler, pid, sid, job.integrator,
                       diff=None)
    t_fn, _ = timed(full_nodiff, o, d, wt)
    print(f"li_path (textured, no diff): {t_fn*1e3:9.1f} ms")

if __name__ == "__main__":
    main()


def isolate_lookup():
    import numpy as np, jax, jax.numpy as jnp
    from rs_ray_toy_tpu.scene.mipmap import build_mipmap, trilinear_lookup, _window
    rng = np.random.default_rng(0)
    img = rng.random((300, 718, 3)).astype(np.float32)
    dev = build_mipmap(img).as_device()
    n = 640 * 360
    st = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lvl = jnp.zeros((n,), jnp.int32)
    t0 = jnp.asarray(rng.integers(0, 256, n), jnp.int32)
    s0 = jnp.asarray(rng.integers(0, 900, n), jnp.int32)

    t_w2, _ = timed(jax.jit(lambda l, t, s: _window(dev, l, t, s, 2, 2)), lvl, t0, s0)
    print(f"window 2x2 fetch alone:      {t_w2*1e3:9.1f} ms")
    t_w16, _ = timed(jax.jit(lambda l, t, s: _window(dev, l, t, s, 16, 16)), lvl, t0, s0)
    print(f"window 16x16 fetch alone:    {t_w16*1e3:9.1f} ms")
    t_tri, _ = timed(jax.jit(lambda st_: trilinear_lookup(dev, st_, jnp.full((n,), 0.01))), st)
    print(f"trilinear_lookup (2 levels): {t_tri*1e3:9.1f} ms")


if __name__ == "__main__":
    pass
