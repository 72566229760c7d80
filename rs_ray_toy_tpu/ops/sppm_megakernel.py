"""Fused SPPM camera pass (Pallas TPU).

sppm.rs:140-260 walks each camera path, accumulating direct lighting at
every vertex and stopping at the first diffuse (or last-depth glossy)
vertex, which becomes the iteration's visible point (VP).  The jnp
wavefront version (integrators/sppm.py _camera_pass) round-trips the
full SoA state through HBM at every depth; this kernel runs the whole
walk for a ray tile in VMEM — the same fusion the path megakernel
applies to path.rs — and returns the VP record plus the ld delta.

Scope (supports_sppm_camera): the brute-force small-scene subset of the
path megakernel (VMEM-resident triangle table, flat shading normals,
RGB, stratified pow2 sampler) with DELTA lights only (scene.json's
three point lights; sppm.rs's uniform_sample_one_light over delta
lights has no MIS counter branch) and no media/env/spheres/BSSRDF.
Anything else falls back to the jnp wavefront pass.

Estimator-identical to _camera_pass: same sampler slots
(sampler/dims.py SPPM block: +0..+2 NEE, +5 BSDF, +6 RR), same
REFERENCE_QUIRKS bsdf_sample, same luminance-threshold camera RR
(sppm.rs:247-253).

The photon pass and grid deposit stay outside (integrators/sppm.py);
the kernel additionally emits the winning hit's material id (table pad
col 47, written by pack_sppm) so the deposit's f evaluation keeps using
the production gather_lobes path.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DTYPE, SHADOW_EPSILON
from ..scene.types import LIGHT_POINT
from ..bsdf.lobes import (
    LOBE_LAMBERT_REFL,
    LOBE_OREN_NAYAR,
    LOBE_LAMBERT_TRANS,
    LOBE_MF_REFL,
    LOBE_FRESNEL_BLEND,
    LOBE_DEBUG_DIFFUSE,
    LOBE_DISNEY_DIFFUSE,
    LOBE_DISNEY_FAKE_SS,
    LOBE_DISNEY_RETRO,
    LOBE_DISNEY_SHEEN,
    LOBE_DISNEY_CLEARCOAT,
    LOBE_DISNEY_MICROFACET_REFL,
)
from .path_megakernel import (
    LANES,
    TILE_ROWS,
    TRI_MAX,
    _attr_cols,
    _bsdf_sample_k,
    _closest_hit,
    _dot3,
    _has_full,
    _has_spec,
    _has_spec_trans,
    _lobe_f_k,
    _normalize3,
    _occluded_all,
    _sampler_dims,
    common_scene_checks,
    pack_scene,
)
from ..sampler.dims import sppm_dim0, SPPM_BSDF, SPPM_RR

# VP-classification kind sets (LOBE_FLAGS subset matching in
# bsdf/eval.num_components: flags(lobe) ⊆ DIFFUSE|R|T resp. GLOSSY|R|T)
DIFFUSE_KINDS = (
    LOBE_LAMBERT_REFL,
    LOBE_OREN_NAYAR,
    LOBE_LAMBERT_TRANS,
    LOBE_DEBUG_DIFFUSE,
    LOBE_DISNEY_DIFFUSE,
    LOBE_DISNEY_FAKE_SS,
    LOBE_DISNEY_RETRO,
    LOBE_DISNEY_SHEEN,
)
GLOSSY_KINDS = (
    LOBE_MF_REFL,
    LOBE_FRESNEL_BLEND,
    LOBE_DISNEY_CLEARCOAT,
    LOBE_DISNEY_MICROFACET_REFL,
)

MAT_COL = 47  # lobe-1 pad column carries the material id (pack_sppm)

# luminance weights (core/spectrum.luminance, spectrum.rs:2602-2609)
LUM_R, LUM_G, LUM_B = 0.212671, 0.715160, 0.072169


def supports_sppm_camera(ctx, spec, sampler) -> bool:
    """Static host gate for the fused SPPM camera pass."""
    import os

    if os.environ.get("RS_MEGAKERNEL", "1") == "0":
        return False
    common = common_scene_checks(ctx, sampler, tri_max=TRI_MAX)
    if common is None:
        return False
    kinds, n_lobes, live, used = common
    ok_kinds = np.zeros_like(kinds, bool)
    for k in DIFFUSE_KINDS + GLOSSY_KINDS:
        ok_kinds |= kinds == k
    # specular kinds bounce without making VPs — the path kernel's
    # sample machinery covers them, but keep the v1 subset to the bench
    # materials (no spec-trans etaScale / BSSRDF interplay here)
    from .path_megakernel import SPEC_KINDS

    for k in SPEC_KINDS:
        ok_kinds |= kinds == k
    if np.any(~ok_kinds[live]):
        return False
    # delta lights only (no MIS counter branch in estimate_direct)
    lk = np.asarray(ctx.lights.kind)
    if lk.size == 0 or np.any(lk != LIGHT_POINT):
        return False
    if ctx.infinite_envs:
        return False
    if getattr(ctx, "sph", None) is not None and int(ctx.sph.count) != 0:
        return False
    return True


def pack_sppm(ctx):
    """pack_scene + the per-triangle material id in pad col 47 (the
    deposit evaluates VP BSDFs through gather_lobes and needs the id)."""
    packed = pack_scene(ctx)
    table = np.array(packed[0])
    t_count = int(np.asarray(ctx.tri.mat).shape[0])
    table[:t_count, MAT_COL] = np.asarray(ctx.tri.mat).astype(np.float32)
    return (jnp.asarray(table),) + packed[1:]


def _camera_loop(
    tri_ref, ox, oy, oz, dx, dy, dz, weight, pid, sid,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
):
    """The sppm.rs:140-260 walk on a ray tile.  Returns (ld (3), vp_*)."""
    n_lights = len(lights_p)
    has_full = _has_full(kinds_present)
    mixed = len(kinds_present) > 1
    attr_cols = _attr_cols(kinds_present, max_lobes) + (MAT_COL,)
    zero = jnp.zeros(ox.shape, jnp.float32)
    active = weight > 0.0
    # beta seeds with the camera weight (sppm.py:84) — the luminance RR
    # threshold below depends on beta's absolute scale
    b0 = jnp.where(active, weight, 0.0)
    br, bg, bb = b0, b0, b0
    ldr, ldg, ldb = zero, zero, zero
    vp_px = vp_py = vp_pz = zero
    vp_wx = vp_wy = vp_wz = zero
    vp_br = vp_bg = vp_bb = zero
    vp_nx = vp_ny = vp_nz = zero
    vp_dx = vp_dy = vp_dz = zero
    vp_mat = zero
    vp_valid = jnp.zeros(ox.shape, bool)

    for depth in range(max_depth):
        dim0 = sppm_dim0(depth)
        out = _closest_hit(tri_ref, n_tris, ox, oy, oz, dx, dy, dz, attr_cols)
        t = out[0]
        ngx, ngy, ngz = out[1], out[2], out[3]
        dux, duy, duz = out[4], out[5], out[6]
        n_lob = out[7].astype(jnp.int32)
        cur = 8
        if _has_spec_trans(kinds_present):
            cur += 1  # mat_eta (unused: no etaScale in the camera pass)
        lobs = []
        for l in range(max_lobes):
            lob = {}
            if mixed:
                lob["kind"] = out[cur].astype(jnp.int32)
                cur += 1
            else:
                lob["kind"] = kinds_present[0]
            lob["s0"] = (out[cur], out[cur + 1], out[cur + 2])
            cur += 3
            if has_full:
                lob["s1"] = (out[cur], out[cur + 1], out[cur + 2])
                lob["s2"] = (out[cur + 3], out[cur + 4], out[cur + 5])
                lob["au"] = out[cur + 6]
                lob["av"] = out[cur + 7]
                lob["fres"] = out[cur + 8].astype(jnp.int32)
                lob["eta_a"] = out[cur + 9]
                lob["eta_b"] = out[cur + 10]
                cur += 11
            else:
                lob["s1"] = lob["s2"] = (zero,) * 3
                lob["au"] = lob["av"] = zero
                lob["fres"] = 0
                lob["eta_a"] = lob["eta_b"] = zero
            lobs.append(lob)
        mat_id = out[cur]  # MAT_COL, always the last attr

        found = t < 3.0e38
        active = active & found

        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t

        # shading frame (flat subset: ns == ng)
        du2 = dux * dux + duy * duy + duz * duz
        ssx, ssy, ssz = _normalize3(dux, duy, duz)
        big_x = jnp.abs(ngx) > jnp.abs(ngy)
        inv_a = lax.rsqrt(
            jnp.maximum(
                jnp.where(big_x, ngx * ngx + ngz * ngz, ngy * ngy + ngz * ngz),
                1e-30,
            )
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

        wox, woy, woz = -dx, -dy, -dz
        wol_x = _dot3(wox, woy, woz, ssx, ssy, ssz)
        wol_y = _dot3(wox, woy, woz, tsx, tsy, tsz)
        wo_z = _dot3(wox, woy, woz, ngx, ngy, ngz)

        mag = jnp.abs(px) + jnp.abs(py) + jnp.abs(pz)
        eps = 1e-4 + 1e-5 * mag

        # ---- NEE: uniform one light, delta fast path (sppm.rs:205 via
        # uniform_sample_one_light; common.py:336-356 semantics) ----
        u_pick = _sampler_dims(
            pid, sid, dim0, spp, xs, ys, jitter, seed, False
        )
        li_idx = jnp.minimum(
            (u_pick * n_lights).astype(jnp.int32), n_lights - 1
        )
        lpx, lpy, lpz = zero, zero, zero
        ler, leg, leb = zero, zero, zero
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
        wil_x = _dot3(wix, wiy, wiz, ssx, ssy, ssz)
        wil_y = _dot3(wix, wiy, wiz, tsx, tsy, tsz)
        wi_ng = _dot3(wix, wiy, wiz, ngx, ngy, ngz)
        reflect_side = (wi_ng * wo_z) > 0.0
        f_gate = reflect_side & (wo_z != 0.0)
        fnr, fng, fnb = zero, zero, zero
        for l in range(max_lobes):
            lf = _lobe_f_k(
                lobs[l], wol_x, wol_y, wo_z, wil_x, wil_y, wi_ng,
                kinds_present,
            )
            use = f_gate & (l < n_lob)
            fnr = fnr + jnp.where(use, lf[0], 0.0)
            fng = fng + jnp.where(use, lf[1], 0.0)
            fnb = fnb + jnp.where(use, lf[2], 0.0)
        cos_ns = jnp.abs(wi_ng)
        off = jnp.where(wi_ng < 0.0, -eps, eps)
        sox = px + ngx * off
        soy = py + ngy * off
        soz = pz + ngz * off
        occ = _occluded_all(
            tri_ref, n_tris, (), sox, soy, soz,
            lpx - sox, lpy - soy, lpz - soz,
            jnp.full(px.shape, 1.0 - SHADOW_EPSILON, jnp.float32),
        )
        li_scale = jnp.where(active & ~occ, cos_ns * n_lights / dist2, 0.0)
        ldr = ldr + br * fnr * ler * li_scale
        ldg = ldg + bg * fng * leg * li_scale
        ldb = ldb + bb * fnb * leb * li_scale

        # ---- VP creation (sppm.rs:211-232): first diffuse vertex, or a
        # glossy vertex at the last depth ----
        is_diffuse = jnp.zeros(ox.shape, bool)
        is_glossy = jnp.zeros(ox.shape, bool)
        for l in range(max_lobes):
            k = lobs[l]["kind"]
            if isinstance(k, int):
                d_l = jnp.full(ox.shape, k in DIFFUSE_KINDS)
                g_l = jnp.full(ox.shape, k in GLOSSY_KINDS)
            else:
                d_l = jnp.zeros(ox.shape, bool)
                g_l = jnp.zeros(ox.shape, bool)
                for dk in DIFFUSE_KINDS:
                    d_l = d_l | (k == dk)
                for gk in GLOSSY_KINDS:
                    g_l = g_l | (k == gk)
            lv = l < n_lob
            is_diffuse = is_diffuse | (d_l & lv)
            is_glossy = is_glossy | (g_l & lv)
        make_vp = active & (
            is_diffuse | (is_glossy if depth == max_depth - 1 else
                          jnp.zeros_like(is_glossy))
        )
        vp_px = jnp.where(make_vp, px, vp_px)
        vp_py = jnp.where(make_vp, py, vp_py)
        vp_pz = jnp.where(make_vp, pz, vp_pz)
        vp_wx = jnp.where(make_vp, wox, vp_wx)
        vp_wy = jnp.where(make_vp, woy, vp_wy)
        vp_wz = jnp.where(make_vp, woz, vp_wz)
        vp_br = jnp.where(make_vp, br, vp_br)
        vp_bg = jnp.where(make_vp, bg, vp_bg)
        vp_bb = jnp.where(make_vp, bb, vp_bb)
        vp_nx = jnp.where(make_vp, ngx, vp_nx)
        vp_ny = jnp.where(make_vp, ngy, vp_ny)
        vp_nz = jnp.where(make_vp, ngz, vp_nz)
        vp_dx = jnp.where(make_vp, dux, vp_dx)
        vp_dy = jnp.where(make_vp, duy, vp_dy)
        vp_dz = jnp.where(make_vp, duz, vp_dz)
        vp_mat = jnp.where(make_vp, mat_id, vp_mat)
        vp_valid = vp_valid | make_vp
        active = active & ~make_vp
        if depth >= max_depth - 1:
            break

        # ---- bounce: sample_f over ALL (sppm.rs:236-245) ----
        ub0, ub1 = _sampler_dims(
            pid, sid, dim0 + SPPM_BSDF, spp, xs, ys, jitter, seed, True
        )
        smp = _bsdf_sample_k(
            lobs, n_lob, wol_x, wol_y, wo_z, ub0, ub1,
            kinds_present, max_lobes,
        )
        wsx, wsy, wsz = smp["wsx"], smp["wsy"], smp["wsz"]
        fs, pdf = smp["f"], smp["pdf"]
        nwx = ssx * wsx + tsx * wsy + ngx * wsz
        nwy = ssy * wsx + tsy * wsy + ngy * wsz
        nwz = ssz * wsx + tsz * wsy + ngz * wsz
        cosw = jnp.abs(_dot3(nwx, nwy, nwz, ngx, ngy, ngz))
        any_f = (fs[0] != 0.0) | (fs[1] != 0.0) | (fs[2] != 0.0)
        ok = active & (n_lob > 0) & (wo_z != 0.0) & (pdf > 0.0) & any_f
        inv_pdf = cosw / jnp.maximum(pdf, 1e-20)
        bnr = br * fs[0] * inv_pdf
        bng = bg * fs[1] * inv_pdf
        bnb = bb * fs[2] * inv_pdf
        # camera-path RR on the NEW beta's luminance (sppm.rs:247-253)
        y = LUM_R * bnr + LUM_G * bng + LUM_B * bnb
        u_rr = _sampler_dims(
            pid, sid, dim0 + SPPM_RR, spp, xs, ys, jitter, seed, False
        )
        rr = ok & (y < 0.25)
        cont_p = jnp.minimum(y, 1.0)
        killed = rr & (u_rr > cont_p)
        inv_cont = 1.0 / jnp.maximum(cont_p, 1e-9)
        bnr = jnp.where(rr, bnr * inv_cont, bnr)
        bng = jnp.where(rr, bng * inv_cont, bng)
        bnb = jnp.where(rr, bnb * inv_cont, bnb)
        active = active & ok & ~killed
        br = jnp.where(active, bnr, br)
        bg = jnp.where(active, bng, bg)
        bb = jnp.where(active, bnb, bb)
        wi_ng2 = _dot3(nwx, nwy, nwz, ngx, ngy, ngz)
        off2 = jnp.where(wi_ng2 < 0.0, -eps, eps)
        ox = jnp.where(active, px + ngx * off2, ox)
        oy = jnp.where(active, py + ngy * off2, oy)
        oz = jnp.where(active, pz + ngz * off2, oz)
        dx = jnp.where(active, nwx, dx)
        dy = jnp.where(active, nwy, dy)
        dz = jnp.where(active, nwz, dz)

    return (
        ldr, ldg, ldb,
        vp_px, vp_py, vp_pz, vp_wx, vp_wy, vp_wz,
        vp_br, vp_bg, vp_bb, vp_nx, vp_ny, vp_nz,
        vp_dx, vp_dy, vp_dz, vp_mat,
        jnp.where(vp_valid, 1.0, 0.0),
    )


N_OUT = 20


def _kernel(
    tri_ref,
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r,
    *outs,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
):
    vals = _camera_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:], pid_r[:], sid_r[:],
        n_tris, lights_p, lights_emit, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
    )
    for o_ref, v in zip(outs, vals):
        o_ref[:] = v


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "lights_p", "lights_emit", "max_depth",
        "spp", "xs", "ys", "jitter", "seed", "kinds_present", "max_lobes",
        "interpret",
    ),
)
def _run(
    table, ox, oy, oz, dx, dy, dz, w, pid, sid,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
    interpret=False,
):
    m = ox.shape[0]
    rows = TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel,
        n_tris=n_tris, lights_p=lights_p, lights_emit=lights_emit,
        max_depth=max_depth,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed,
        kinds_present=kinds_present, max_lobes=max_lobes,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 9,
        out_specs=[ray_spec] * N_OUT,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * N_OUT,
        interpret=interpret,
    )(table, ox, oy, oz, dx, dy, dz, w, pid, sid)


def sppm_camera_mega(
    ctx, packed, o, d, cam_weight, sampler, pixel_id, s_idx, max_depth,
    interpret=False,
):
    """Drop-in replacement for integrators.sppm._camera_pass's walk on
    the supported subset.  packed = pack_sppm(ctx).  Returns
    (ld (N,3), VisiblePoints)."""
    from ..integrators.sppm import VisiblePoints

    table = packed[0]
    lights_p, lights_emit, kinds_present, max_lobes = packed[1:5]
    n = o.shape[0]
    tile = TILE_ROWS * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    s_arr = jnp.broadcast_to(jnp.asarray(s_idx, jnp.uint32), (n,))
    outs = _run(
        table,
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(cam_weight.astype(jnp.float32)),
        prep(jnp.asarray(pixel_id, jnp.uint32)), prep(s_arr),
        n_tris=int(table.shape[0]),
        lights_p=lights_p, lights_emit=lights_emit,
        max_depth=int(max_depth),
        spp=int(sampler.spp), xs=int(sampler.xs), ys=int(sampler.ys),
        jitter=bool(sampler.jitter), seed=int(sampler.seed),
        kinds_present=kinds_present, max_lobes=max_lobes,
        interpret=interpret,
    )
    flat = [x.reshape(-1)[:n] for x in outs]
    ld = jnp.stack(flat[0:3], -1).astype(DTYPE)
    v3 = lambda i: jnp.stack(flat[i:i + 3], -1).astype(DTYPE)
    ng = v3(12)
    vp = VisiblePoints(
        p=v3(3),
        wo=v3(6),
        beta=jnp.stack(flat[9:12], -1).astype(DTYPE),
        mat=flat[18].astype(jnp.int32),
        uv=jnp.zeros((n, 2), DTYPE),
        ns=ng,
        ng=ng,
        dpdu=v3(15),
        valid=flat[19] > 0.0,
    )
    return ld, vp
