"""Fused path-tracer megakernel (Pallas TPU).

The masked jnp bounce loop (integrators/path.py) runs each stage as its own
XLA fusion: per bounce the full SoA ray state round-trips HBM ~10 times
(intersect, surface, shade, NEE, occlusion, sample, RR).  After the gather
elimination (core/tableops.py) the path integrator measures ~14.7 ms per
230K-ray pass — almost entirely that inter-fusion traffic.

This kernel runs the whole bounce loop for a ray tile in VMEM: rays, sample
uniforms in; radiance out; scene tables resident in VMEM.  HBM traffic per
ray drops from ~10 round trips/bounce to one read + one write total.

Scope (checked statically by `supports`): the scene subset the bench
headline uses, which is also the most common interior-scene configuration —
  - triangle geometry only (<= TRI_MAX, table fits VMEM),
  - every material a single untextured Lambertian lobe
    (matte with sigma=0, material/matte.rs:35-47),
  - point lights only (<= LIGHT_MAX; delta => NEE needs no MIS),
  - no participating media, no BSSRDF, no infinite lights,
  - path integrator without ray differentials.
Everything else falls back to the general jnp wavefront loop.  The
estimator is IDENTICAL to integrators/path.py (same sample dims, same
frame construction from baked dpdu, same RR; path.rs:51-226 semantics) —
tests compare the two per-ray radiance outputs directly.

Scene tables are baked per *triangle* (the material table collapses:
kd = packed_f[tri.mat, 0, 0:3]), so shading needs no indirection at all.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DTYPE, PI, ONE_MINUS_EPSILON, SHADOW_EPSILON
from ..scene.types import LIGHT_POINT
from ..bsdf.lobes import LOBE_LAMBERT_REFL, BXDF_SPECULAR

TRI_EPS = 1e-7
LANES = 128
TILE_ROWS = 128
TRI_MAX = 2048
LIGHT_MAX = 8
DEPTH_MAX = 15

PI_OVER_2 = PI / 2.0
PI_OVER_4 = PI / 4.0


def _pow2(n):
    return n > 0 and (n & (n - 1)) == 0


def supports(ctx, spec, sampler, diff) -> bool:
    """Static host check: can the megakernel render this job exactly?"""
    if spec.kind != "path" or diff is not None:
        return False
    # the kernel evaluates the stratified sampler in-VMEM; its permutation
    # needs power-of-two strata (integer div/mod by non-constants does not
    # lower to Mosaic)
    from ..sampler.stratified import StratifiedSampler

    if sampler is not None:
        if not isinstance(sampler, StratifiedSampler):
            return False
        if not (_pow2(sampler.spp) and _pow2(sampler.xs) and _pow2(sampler.ys)):
            return False
    if spec.max_depth > DEPTH_MAX:
        return False
    if int(ctx.sph.count) != 0 or not (0 < int(ctx.tri.count) <= TRI_MAX):
        return False
    if ctx.infinite_envs or ctx.mediums is not None:
        return False
    mats = ctx.mats
    kinds = np.asarray(mats["kind"])
    n_lobes = np.asarray(mats["n_lobes"])
    # only materials actually referenced by a triangle constrain the kernel
    tri_mat = np.asarray(ctx.tri.mat)
    used = np.unique(tri_mat[tri_mat >= 0])
    if used.size == 0:
        return False
    live = np.zeros_like(kinds, bool)
    for i in used:
        live[i, : int(n_lobes[i])] = True
    if np.any(n_lobes[used] > 1):
        return False
    if np.any(kinds[live] != LOBE_LAMBERT_REFL):
        return False
    if np.any(np.asarray(mats["has_bssrdf"])[used]):
        return False
    if np.any(np.asarray(mats["bump_tex"])[used] >= 0):
        return False
    pi_ = np.asarray(mats["packed_i"])  # tex ids live in cols 6..10
    if np.any(pi_[..., 6:11][live] >= 0):
        return False
    # scale must be the identity (no ScaleTexture wrapping)
    if np.any(np.abs(np.asarray(mats["scale"])[live] - 1.0) > 0):
        return False
    lk = np.asarray(ctx.lights.kind)
    if lk.size == 0 or lk.size > LIGHT_MAX or np.any(lk != LIGHT_POINT):
        return False
    return True


def pack_scene(ctx):
    """Per-triangle (T, 18) table: p0, e1, e2, ng, dpdu, kd — everything a
    Lambertian bounce needs, material indirection pre-collapsed."""
    tri = ctx.tri
    p0 = np.asarray(tri.p0, np.float32)
    e1 = np.asarray(tri.p1, np.float32) - p0
    e2 = np.asarray(tri.p2, np.float32) - p0
    ng = np.asarray(tri.ng, np.float32)
    dpdu = np.asarray(tri.dpdu, np.float32)
    mat = np.asarray(tri.mat)
    pf = np.asarray(ctx.mats["packed_f"])
    nl = np.asarray(ctx.mats["n_lobes"])
    kd = np.where(
        (nl[np.maximum(mat, 0)] > 0)[:, None] & (mat >= 0)[:, None],
        pf[np.maximum(mat, 0), 0, 0:3],
        0.0,
    ).astype(np.float32)
    table = np.concatenate([p0, e1, e2, ng, dpdu, kd], axis=1)  # (T, 18)
    lights_p = tuple(
        tuple(float(v) for v in row) for row in np.asarray(ctx.lights.p)
    )
    lights_emit = tuple(
        tuple(float(v) for v in row) for row in np.asarray(ctx.lights.emit)
    )
    return jnp.asarray(table), lights_p, lights_emit


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z):
    inv = lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _closest_hit(tri_ref, n_tris, ox, oy, oz, dx, dy, dz):
    """Möller-Trumbore fori over the VMEM table; returns hit t and the
    gathered per-triangle attributes (ng, dpdu, kd)."""
    big = jnp.full(ox.shape, 3.0e38, jnp.float32)
    zeros = jnp.zeros_like(ox)
    carry0 = (big,) + (zeros,) * 9

    def body(j, c):
        t_best = c[0]
        p0x, p0y, p0z = tri_ref[j, 0], tri_ref[j, 1], tri_ref[j, 2]
        e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
        e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) >= TRI_EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        upd = (
            ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= TRI_EPS) & (t < t_best)
        )
        attrs = tuple(
            jnp.where(upd, tri_ref[j, 9 + k], c[1 + k]) for k in range(9)
        )
        return (jnp.where(upd, t, t_best),) + attrs

    out = lax.fori_loop(0, n_tris, body, carry0)
    return out  # (t, ngx..ngz, dux..duz, kr, kg, kb)


def _occluded(tri_ref, n_tris, ox, oy, oz, dx, dy, dz, t_max):
    """Any-hit over the table with unnormalized direction, t in
    [TRI_EPS, t_max) — shadow_unoccluded semantics."""

    def body(j, occ):
        p0x, p0y, p0z = tri_ref[j, 0], tri_ref[j, 1], tri_ref[j, 2]
        e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
        e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) >= TRI_EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        hit = (
            ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= TRI_EPS) & (t < t_max)
        )
        # int32 carry: Mosaic miscompiles i1 vectors carried through scf
        return jnp.where(hit, jnp.int32(1), occ)

    occ = lax.fori_loop(0, n_tris, body, jnp.zeros(ox.shape, jnp.int32))
    return occ > 0


def _concentric_disk(u0, u1):
    """sampling.rs:286-311, componentwise."""
    x = 2.0 * u0 - 1.0
    y = 2.0 * u1 - 1.0
    zero = (x == 0.0) & (y == 0.0)
    use_x = jnp.abs(x) > jnp.abs(y)
    safe_x = jnp.where(x == 0.0, 1.0, x)
    safe_y = jnp.where(y == 0.0, 1.0, y)
    r = jnp.where(use_x, x, y)
    theta = jnp.where(
        use_x, PI_OVER_4 * (y / safe_x), PI_OVER_2 - PI_OVER_4 * (x / safe_y)
    )
    dxo = jnp.cos(theta) * r
    dyo = jnp.sin(theta) * r
    return jnp.where(zero, 0.0, dxo), jnp.where(zero, 0.0, dyo)


def _sampler_dims(pid, sid, dim, spp, xs, ys, jitter, seed, want_2d):
    """In-kernel StratifiedSampler.get_1d/get_2d (sampler/stratified.py):
    identical hash/permutation math on the tile arrays.  dim is static."""
    from ..core import rng as _rng

    dk = jnp.uint32((dim * 2654435761 + 0) & 0xFFFFFFFF) + jnp.uint32(seed)
    key = _rng.hash_combine(pid, dk)
    # _permute, power-of-two branch (xor / odd-multiply / xorshift rounds)
    x = sid
    mask = jnp.uint32(spp - 1)
    for salt in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35):
        x = (x ^ key ^ jnp.uint32(salt)) & mask
        x = (x * jnp.uint32(0xED5AD4BB)) & mask
        x = (x ^ (x >> 3)) & mask
    strat = x
    if not want_2d:
        if jitter:
            j = _rng.uniform_float(pid, sid, jnp.uint32(dim * 64), seed)
        else:
            j = 0.5
        return jnp.minimum(
            (strat.astype(jnp.int32).astype(jnp.float32) + j) / spp,
            jnp.float32(1.0 - 1e-7),
        )
    sx = (strat & jnp.uint32(xs - 1)).astype(jnp.int32).astype(jnp.float32)
    sy = (strat >> int(xs).bit_length() - 1).astype(jnp.int32).astype(jnp.float32)
    if jitter:
        jx = _rng.uniform_float(pid, sid, jnp.uint32(dim * 64 + 1), seed)
        jy = _rng.uniform_float(pid, sid, jnp.uint32(dim * 64 + 2), seed)
    else:
        jx = jy = 0.5
    u0 = jnp.minimum((sx + jx) / xs, jnp.float32(1.0 - 1e-7))
    u1 = jnp.minimum((sy + jy) / ys, jnp.float32(1.0 - 1e-7))
    return u0, u1


def _bounce_loop(
    tri_ref, ox, oy, oz, dx, dy, dz, active, pid, sid,
    n_tris, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed,
):
    n_lights = len(lights_p)
    one = jnp.ones(ox.shape, jnp.float32)
    zero = jnp.zeros(ox.shape, jnp.float32)
    br, bg, bb = one, one, one
    Lr, Lg, Lb = zero, zero, zero

    # range(max_depth), not max_depth+1: the subset has no infinite lights,
    # so the loop's final intersect (escape-le collection in li_path) would
    # contribute nothing — skip the dead work.  Estimator unchanged.
    for bounce in range(max_depth):
        t, ngx, ngy, ngz, dux, duy, duz, kr, kg, kb = _closest_hit(
            tri_ref, n_tris, ox, oy, oz, dx, dy, dz
        )
        found = t < 3.0e38
        active = active & found

        # hit position
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t

        # shading frame (bsdf/eval.make_frame): ss = normalize(dpdu),
        # degenerate -> coordinate_system(ns); ts = cross(ns, ss); ns = ng
        # (no vertex normals in this subset).
        du2 = dux * dux + duy * duy + duz * duz
        ssx, ssy, ssz = _normalize3(dux, duy, duz)
        # coordinate_system(ns) first axis (core/vec.py convention)
        big_x = jnp.abs(ngx) > jnp.abs(ngy)
        inv_a = lax.rsqrt(
            jnp.maximum(jnp.where(big_x, ngx * ngx + ngz * ngz, ngy * ngy + ngz * ngz), 1e-30)
        )
        fbx = jnp.where(big_x, -ngz, 0.0) * inv_a
        fby = jnp.where(big_x, 0.0, ngz) * inv_a
        fbz = jnp.where(big_x, ngx, -ngy) * inv_a
        bad = du2 < 1e-20
        ssx = jnp.where(bad, fbx, ssx)
        ssy = jnp.where(bad, fby, ssy)
        ssz = jnp.where(bad, fbz, ssz)
        tsx = ngy * ssz - ngz * ssy
        tsy = ngz * ssx - ngx * ssz
        tsz = ngx * ssy - ngy * ssx

        # wo = -d (world), local z component wrt ns
        wox, woy, woz = -dx, -dy, -dz
        wo_z = _dot3(wox, woy, woz, ngx, ngy, ngz)

        # ---- NEE: one point light, uniform pick (common.py:336-356) ----
        dim0 = 8 + bounce * 8
        u_pick = _sampler_dims(pid, sid, dim0, spp, xs, ys, jitter, seed, False)
        li_idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32), n_lights - 1)
        lpx = jnp.zeros_like(px)
        lpy = jnp.zeros_like(px)
        lpz = jnp.zeros_like(px)
        ler = jnp.zeros_like(px)
        leg = jnp.zeros_like(px)
        leb = jnp.zeros_like(px)
        for k in range(n_lights):
            sel = li_idx == k
            lpx = jnp.where(sel, lights_p[k][0], lpx)
            lpy = jnp.where(sel, lights_p[k][1], lpy)
            lpz = jnp.where(sel, lights_p[k][2], lpz)
            ler = jnp.where(sel, lights_emit[k][0], ler)
            leg = jnp.where(sel, lights_emit[k][1], leg)
            leb = jnp.where(sel, lights_emit[k][2], leb)
        tlx, tly, tlz = lpx - px, lpy - py, lpz - pz
        dist2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
        inv_d = lax.rsqrt(dist2)
        wix, wiy, wiz = tlx * inv_d, tly * inv_d, tlz * inv_d
        # f = kd/pi iff wi is on wo's side of ng (bsdf_f_pdf reflect gate)
        wi_ng = _dot3(wix, wiy, wiz, ngx, ngy, ngz)
        reflect_side = (wi_ng * wo_z) > 0.0
        cos_ns = jnp.abs(wi_ng)  # ns == ng here
        f_fac = jnp.where(reflect_side & (wo_z != 0.0), cos_ns / PI, 0.0)
        # shadow ray: offset origin toward light, t_max = 1 - eps
        mag = jnp.abs(px) + jnp.abs(py) + jnp.abs(pz)
        eps = 1e-4 + 1e-5 * mag
        off = jnp.where(wi_ng < 0.0, -eps, eps)
        sox = px + ngx * off
        soy = py + ngy * off
        soz = pz + ngz * off
        sdx, sdy, sdz = lpx - sox, lpy - soy, lpz - soz
        occ = _occluded(
            tri_ref, n_tris, sox, soy, soz, sdx, sdy, sdz,
            jnp.full(px.shape, 1.0 - SHADOW_EPSILON, jnp.float32),
        )
        li_scale = jnp.where(active & ~occ, f_fac * n_lights / dist2, 0.0)
        Lr = Lr + br * kr * ler * li_scale
        Lg = Lg + bg * kg * leg * li_scale
        Lb = Lb + bb * kb * leb * li_scale

        # ---- sample the Lambertian lobe (bsdf_sample, single lobe) ----
        ub0, ub1 = _sampler_dims(
            pid, sid, dim0 + 3, spp, xs, ys, jitter, seed, True
        )
        u0 = jnp.minimum(ub0, ONE_MINUS_EPSILON)
        u1 = ub1
        dxo, dyo = _concentric_disk(u0, u1)
        z_loc = jnp.sqrt(jnp.maximum(0.0, 1.0 - dxo * dxo - dyo * dyo))
        # flip into wo's hemisphere (reflection.rs:428-443); wo_local.z = wo_z
        z_loc = jnp.where(wo_z < 0.0, -z_loc, z_loc)
        # wi world = ss*x + ts*y + ns*z
        nwx = ssx * dxo + tsx * dyo + ngx * z_loc
        nwy = ssy * dxo + tsy * dyo + ngy * z_loc
        nwz = ssz * dxo + tsz * dyo + ngz * z_loc
        abs_z = jnp.abs(z_loc)
        pdf = abs_z / PI
        ok = active & (wo_z != 0.0) & (pdf > 0.0) & ((kr > 0) | (kg > 0) | (kb > 0))
        # beta *= f * |cos(wi, ns)| / pdf = kd (cos = |z_loc| since ns==ng)
        br = jnp.where(ok, br * kr, br)
        bg = jnp.where(ok, bg * kg, bg)
        bb = jnp.where(ok, bb * kb, bb)
        active = active & ok

        # next ray: offset along ng by sampled direction side
        wi_ng2 = _dot3(nwx, nwy, nwz, ngx, ngy, ngz)
        off2 = jnp.where(wi_ng2 < 0.0, -eps, eps)
        ox = jnp.where(active, px + ngx * off2, ox)
        oy = jnp.where(active, py + ngy * off2, oy)
        oz = jnp.where(active, pz + ngz * off2, oz)
        dx = jnp.where(active, nwx, dx)
        dy = jnp.where(active, nwy, dy)
        dz = jnp.where(active, nwz, dz)

        # ---- Russian roulette (path.rs:212-222); eta_scale == 1 here ----
        if bounce > 3:
            beta_max = jnp.maximum(br, jnp.maximum(bg, bb))
            do_rr = active & (beta_max < rr_threshold)
            q = jnp.maximum(0.05, 1.0 - beta_max)
            u_rr = _sampler_dims(
                pid, sid, dim0 + 4, spp, xs, ys, jitter, seed, False
            )
            killed = do_rr & (u_rr < q)
            active = active & ~killed
            surv = do_rr & ~killed
            inv_q = 1.0 / jnp.maximum(1.0 - q, 1e-9)
            br = jnp.where(surv, br * inv_q, br)
            bg = jnp.where(surv, bg * inv_q, bg)
            bb = jnp.where(surv, bb * inv_q, bb)

    return Lr, Lg, Lb


def _kernel(
    tri_ref,
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r,
    lr_o, lg_o, lb_o,
    *, n_tris, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed,
):
    Lr, Lg, Lb = _bounce_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:] > 0.0, pid_r[:], sid_r[:],
        n_tris, lights_p, lights_emit, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "lights_p", "lights_emit", "max_depth", "rr_threshold",
        "spp", "xs", "ys", "jitter", "seed", "interpret",
    ),
)
def _run(
    table, ox, oy, oz, dx, dy, dz, w, pid, sid,
    n_tris, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, interpret=False,
):
    m = ox.shape[0]
    grid = (m // TILE_ROWS,)
    ray_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel,
        n_tris=n_tris,
        lights_p=lights_p,
        lights_emit=lights_emit,
        max_depth=max_depth,
        rr_threshold=rr_threshold,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 9,
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 3,
        interpret=interpret,
    )(table, ox, oy, oz, dx, dy, dz, w, pid, sid)
    return outs


def li_path_mega(
    ctx, packed, o, d, cam_weight, sampler, pixel_id, s_idx, spec, interpret=False
):
    """Drop-in replacement for integrators.path.li_path on the supported
    subset.  packed = pack_scene(ctx) built once per scene.  The sampler's
    bounce dimensions are evaluated inside the kernel (same hash math)."""
    table, lights_p, lights_emit = packed
    n = o.shape[0]

    tile = TILE_ROWS * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    s_arr = jnp.broadcast_to(jnp.asarray(s_idx, jnp.uint32), (n,))
    lr, lg, lb = _run(
        table,
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(cam_weight.astype(jnp.float32)),
        prep(jnp.asarray(pixel_id, jnp.uint32)), prep(s_arr),
        n_tris=int(table.shape[0]), lights_p=lights_p,
        lights_emit=lights_emit,
        max_depth=int(spec.max_depth), rr_threshold=float(spec.rr_threshold),
        spp=int(sampler.spp), xs=int(sampler.xs), ys=int(sampler.ys),
        jitter=bool(sampler.jitter), seed=int(sampler.seed),
        interpret=interpret,
    )
    return jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    ).astype(DTYPE)


# ---- in-kernel camera ray generation (camera.rs:534-580) ----
#
# The RealisticCamera trace is a static loop over ~13 lens elements of
# componentwise quadratic + refract math — VPU-perfect, and the lens tables
# / exit-pupil bounds / cam_to_world are scene constants baked into the
# kernel.  Replicates camera/realistic.py generate_rays exactly (same
# sampler dims 0/1, same pupil-bin rotation, same weight formula).


def pack_camera(cam):
    """RealisticCamera -> hashable constant bundle for the kernel."""
    lens = cam.lens
    bounds = np.asarray(cam.exit_pupil_bounds, np.float32)
    m = np.asarray(cam.cam_to_world, np.float64)
    return dict(
        curvature=tuple(float(c) for c in lens.curvature),
        thickness=tuple(float(t) for t in lens.thickness),
        eta=tuple(float(e) for e in lens.eta),
        aperture=tuple(float(a) for a in lens.aperture_radius),
        rear_z=float(lens.rear_z),
        bounds=tuple(tuple(float(v) for v in row) for row in bounds),
        cam_to_world=tuple(float(v) for v in m[:3, :4].ravel()),
        extent=(float(cam.extent[0]), float(cam.extent[1])),
        xres=float(cam.film.xres),
        yres=float(cam.film.yres),
        diagonal=float(cam.diagonal_m),
        area0=float(cam._bin_area(0)),
        simple_weighting=bool(cam.spec.simple_weighting),
        shutter=float(cam.spec.shutter_close - cam.spec.shutter_open),
    )


def _raygen(px, py, pid, sid, cam, spp, xs, ys, jitter, seed):
    """Componentwise generate_rays on the tile.  Returns
    (ox, oy, oz, dx, dy, dz, weight) in world space."""
    uf0, uf1 = _sampler_dims(pid, sid, 0, spp, xs, ys, jitter, seed, True)
    ul0, ul1 = _sampler_dims(pid, sid, 1, spp, xs, ys, jitter, seed, True)
    sx = (px + uf0) / cam["xres"]
    sy = (py + uf1) / cam["yres"]
    # film.rs:200-208 physical extent; camera.rs:542 pFilm = (-x, y, 0)
    pfx = -((sx - 0.5) * cam["extent"][0])
    pfy = (sy - 0.5) * cam["extent"][1]

    # exit pupil sample (camera.rs:492-521)
    r_film = jnp.sqrt(pfx * pfx + pfy * pfy)
    n_bins = len(cam["bounds"])
    r_idx = jnp.clip(
        (r_film / (cam["diagonal"] / 2.0) * n_bins).astype(jnp.int32),
        0,
        n_bins - 1,
    )
    b0 = jnp.zeros_like(r_film)
    b1 = jnp.zeros_like(r_film)
    b2 = jnp.zeros_like(r_film)
    b3 = jnp.zeros_like(r_film)
    for k in range(n_bins):
        sel = r_idx == k
        row = cam["bounds"][k]
        b0 = jnp.where(sel, row[0], b0)
        b1 = jnp.where(sel, row[1], b1)
        b2 = jnp.where(sel, row[2], b2)
        b3 = jnp.where(sel, row[3], b3)
    prx = b0 + ul0 * (b2 - b0)
    pry = b1 + ul1 * (b3 - b1)
    area = (b2 - b0) * (b3 - b1)
    safe_r = jnp.where(r_film == 0.0, 1.0, r_film)
    sin_t = jnp.where(r_film != 0.0, pfy / safe_r, 0.0)
    cos_t = jnp.where(r_film != 0.0, pfx / safe_r, 1.0)
    rearx = cos_t * prx - sin_t * pry
    reary = sin_t * prx + cos_t * pry
    rearz = cam["rear_z"]

    # ray from film point to pupil point (camera space)
    dx0 = rearx - pfx
    dy0 = reary - pfy
    dz0 = rearz - 0.0
    # weight cos^4 uses the pre-trace direction (camera.rs:569-571)
    dlen = jnp.sqrt(jnp.maximum(dx0 * dx0 + dy0 * dy0 + dz0 * dz0, 1e-30))
    cos_theta = dz0 / dlen
    cos4 = (cos_theta * cos_theta) ** 2

    # trace through elements, film side (camera.rs:156-219); lens space
    # flips z
    ox, oy, oz = pfx, pfy, jnp.zeros_like(pfx)
    dx, dy, dz = dx0, dy0, -dz0
    alive = jnp.ones(px.shape, bool)
    element_z = 0.0
    E = len(cam["curvature"])
    for i in reversed(range(E)):
        element_z -= cam["thickness"][i]
        radius = cam["curvature"][i]
        is_stop = radius == 0.0
        if is_stop:
            okd = dz < 0.0
            t = (element_z - oz) / jnp.where(okd, dz, -1.0)
            ok = okd
        else:
            zc = element_z + radius
            ocx, ocy, ocz = ox, oy, oz - zc
            a = dx * dx + dy * dy + dz * dz
            bq = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
            cq = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
            disc = bq * bq - 4.0 * a * cq
            ok = disc >= 0.0
            root = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = jnp.where(bq < 0.0, -0.5 * (bq - root), -0.5 * (bq + root))
            t0 = q / a
            t1 = cq / jnp.where(q == 0.0, 1.0, q)
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            use_closer = (dz > 0.0) != (radius < 0.0)
            t = jnp.where(use_closer, lo, hi)
            ok = ok & (t >= 0.0)
        hx = ox + dx * t
        hy = oy + dy * t
        hz = oz + dz * t
        r2 = hx * hx + hy * hy
        ok = ok & (r2 < cam["aperture"][i] ** 2)
        alive = alive & ok
        ox = jnp.where(alive, hx, ox)
        oy = jnp.where(alive, hy, oy)
        oz = jnp.where(alive, hz, oz)
        if not is_stop:
            # element normal at hit, faceforwarded against d
            pcx, pcy, pcz = ox, oy, oz - zc
            ninv = lax.rsqrt(jnp.maximum(pcx * pcx + pcy * pcy + pcz * pcz, 1e-30))
            nx, ny, nz = pcx * ninv, pcy * ninv, pcz * ninv
            flip_n = (nx * dx + ny * dy + nz * dz) > 0.0
            nx = jnp.where(flip_n, -nx, nx)
            ny = jnp.where(flip_n, -ny, ny)
            nz = jnp.where(flip_n, -nz, nz)
            eta_i = cam["eta"][i]
            eta_t = (
                cam["eta"][i - 1]
                if (i > 0 and cam["eta"][i - 1] != 0.0)
                else 1.0
            )
            eta = eta_i / eta_t
            dinv = lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
            wix, wiy, wiz = -dx * dinv, -dy * dinv, -dz * dinv
            cos_i = nx * wix + ny * wiy + nz * wiz
            sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
            sin2_t = eta * eta * sin2_i
            rok = sin2_t < 1.0
            cos_tr = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
            fac = eta * cos_i - cos_tr
            wtx = -wix * eta + nx * fac
            wty = -wiy * eta + ny * fac
            wtz = -wiz * eta + nz * fac
            alive = alive & rok
            dx = jnp.where(alive, wtx, dx)
            dy = jnp.where(alive, wty, dy)
            dz = jnp.where(alive, wtz, dz)
    oz = -oz  # unflip lens -> camera space
    dz = -dz

    # camera -> world (rotation rows baked) + normalize direction
    m = cam["cam_to_world"]
    wx = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
    wy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
    wz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
    vx = m[0] * dx + m[1] * dy + m[2] * dz
    vy = m[4] * dx + m[5] * dy + m[6] * dz
    vz = m[8] * dx + m[9] * dy + m[10] * dz
    vinv = 1.0 / jnp.maximum(jnp.sqrt(vx * vx + vy * vy + vz * vz), 1e-30)
    vx, vy, vz = vx * vinv, vy * vinv, vz * vinv

    if cam["simple_weighting"]:
        weight = cos4 * area / cam["area0"]
    else:
        weight = cam["shutter"] * (cos4 * area)
    weight = jnp.where(alive, weight, 0.0)
    return wx, wy, wz, vx, vy, vz, weight


def _kernel_cam(
    tri_ref,
    px_r, py_r, pid_r, sid_r,
    lr_o, lg_o, lb_o, w_o,
    *, n_tris, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, cam,
):
    pid = pid_r[:]
    sid = sid_r[:]
    ox, oy, oz, dx, dy, dz, weight = _raygen(
        px_r[:], py_r[:], pid, sid, cam, spp, xs, ys, jitter, seed
    )
    Lr, Lg, Lb = _bounce_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight > 0.0, pid, sid,
        n_tris, lights_p, lights_emit, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb
    w_o[:] = weight


class _Hashable(dict):
    """Frozen dict usable as a jit static argument."""

    def __hash__(self):
        return hash(tuple(sorted(self.items())))

    def __eq__(self, other):
        return dict.__eq__(self, other)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "lights_p", "lights_emit", "max_depth", "rr_threshold",
        "spp", "xs", "ys", "jitter", "seed", "cam", "interpret",
    ),
)
def _run_cam(
    table, px, py, pid, sid,
    n_tris, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, cam, interpret=False,
):
    m = px.shape[0]
    grid = (m // TILE_ROWS,)
    ray_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel_cam,
        n_tris=n_tris, lights_p=lights_p, lights_emit=lights_emit,
        max_depth=max_depth, rr_threshold=rr_threshold,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed, cam=cam,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 4,
        out_specs=[ray_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 4,
        interpret=interpret,
    )(table, px, py, pid, sid)
    return outs


def li_path_mega_cam(
    ctx, packed, cam_packed, pixel_xy, pixel_id, s_idx, sampler, spec,
    interpret=False,
):
    """Full fused pass: camera ray generation + bounce loop in one kernel.

    Returns (L (N,3), weight (N,)) — the film add happens outside.
    pixel_xy: (N,2) integer raster coords as floats; the film jitter
    (sampler dim 0) is applied in-kernel, identically to the p_film the
    caller computes for filtering."""
    table, lights_p, lights_emit = packed
    n = pixel_xy.shape[0]

    tile = TILE_ROWS * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    s_arr = jnp.broadcast_to(jnp.asarray(s_idx, jnp.uint32), (n,))
    lr, lg, lb, w = _run_cam(
        table,
        prep(pixel_xy[:, 0].astype(jnp.float32)),
        prep(pixel_xy[:, 1].astype(jnp.float32)),
        prep(jnp.asarray(pixel_id, jnp.uint32)), prep(s_arr),
        n_tris=int(table.shape[0]), lights_p=lights_p,
        lights_emit=lights_emit,
        max_depth=int(spec.max_depth), rr_threshold=float(spec.rr_threshold),
        spp=int(sampler.spp), xs=int(sampler.xs), ys=int(sampler.ys),
        jitter=bool(sampler.jitter), seed=int(sampler.seed),
        cam=_Hashable(cam_packed), interpret=interpret,
    )
    l = jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    ).astype(DTYPE)
    return l, w.reshape(-1)[:n].astype(DTYPE)
