"""Fused SPPM camera pass (Pallas TPU).

sppm.rs:140-260 walks each camera path, accumulating direct lighting at
every vertex and stopping at the first diffuse (or last-depth glossy)
vertex, which becomes the iteration's visible point (VP).  The jnp
wavefront version (integrators/sppm.py _camera_pass) round-trips the
full SoA state through HBM at every depth; this kernel runs the whole
walk for a ray tile in VMEM — the same fusion the path megakernel
applies to path.rs — and returns the VP record plus the ld delta.

Scope (supports_sppm_camera): the path megakernel's scene subset (flat
shading normals, RGB, stratified pow2 sampler in-kernel OR the
production Halton sampler with its slot values shipped in as an input
matrix — exact parity, sppm.rs:130; brute-force VMEM table
below TRI_MAX, the in-kernel packet BVH above it up to
MEGA_BVH_TRI_MAX) with DELTA lights only (scene.json's three point
lights; sppm.rs's uniform_sample_one_light over delta lights has no
MIS counter branch) and no media/env/spheres/BSSRDF.  Anything else
falls back to the jnp wavefront pass.

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
    MEGA_BVH_TRI_MAX,
    TILE_ROWS,
    TRI_MAX,
    _attr_cols,
    _bsdf_sample_k,
    _bvh_closest_hit,
    _bvh_occluded,
    _closest_hit,
    _dot3,
    _halton_u,
    _has_full,
    _has_spec,
    _has_spec_trans,
    _lobe_f_k,
    _mk_sdim,
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
    tri_max = (
        TRI_MAX
        if os.environ.get("RS_MEGA_BVH", "1") == "0"
        else MEGA_BVH_TRI_MAX
    )
    common = common_scene_checks(
        ctx, sampler, tri_max=tri_max, allow_halton=True
    )
    if common is None:
        return False
    kinds, n_lobes, live, used = common
    # exactly the kinds _lobe_f_k / _bsdf_sample_k implement (the path
    # kernel's material subset minus the BSSRDF stack); specular kinds
    # bounce without making VPs.  Oren-Nayar / translucent / debug /
    # fake-ss materials fall back to the jnp wavefront pass.
    from .path_megakernel import COS_KINDS, MF_KINDS, SPEC_KINDS

    ok_kinds = np.zeros_like(kinds, bool)
    for k in (
        COS_KINDS + MF_KINDS + (LOBE_DISNEY_CLEARCOAT,) + SPEC_KINDS
    ):
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
    """pack_scene with the per-triangle material id carried in pad col
    47 (through any BVH leaf reorder) — the deposit evaluates VP BSDFs
    through the resolved per-material tables and needs the id."""
    return pack_scene(ctx, with_mat_col=True)


def _sppm_slots(max_depth, with_cam=False):
    """Static (slot, n) enumeration of the sampler dims the camera walk
    consumes, mirroring _camera_loop's sdim call sites (the Halton mode
    ships these values in as an input matrix, _used_slots-style).
    with_cam prepends the film-jitter and lens slots consumed by the
    in-kernel _raygen."""
    slots = []
    if with_cam:
        slots += [(0, 2), (1, 2)]
    for depth in range(max_depth):
        d0 = sppm_dim0(depth)
        slots.append((d0, 1))  # NEE light pick
        if depth < max_depth - 1:
            slots.append((d0 + SPPM_BSDF, 2))
            slots.append((d0 + SPPM_RR, 1))
    return tuple(slots)


def _camera_loop(
    tri_ref, ox, oy, oz, dx, dy, dz, weight, pid, sid,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
    bvh_refs=None, max_leaf=None, u_ref=None, hal_slots=None, chunks=None,
):
    """The sppm.rs:140-260 walk on a ray tile.  Returns (ld (3), vp_*)."""
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, u_ref, hal_slots)
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
        if bvh_refs is None:
            out = _closest_hit(
                tri_ref, n_tris, ox, oy, oz, dx, dy, dz, attr_cols,
                chunks=chunks, live=active,
            )
        else:
            out = _bvh_closest_hit(
                bvh_refs, tri_ref, ox, oy, oz, dx, dy, dz, active,
                max_leaf, len(attr_cols),
            )
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
        u_pick = sdim(dim0, False)
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
        t_sh = jnp.full(px.shape, 1.0 - SHADOW_EPSILON, jnp.float32)
        if bvh_refs is None:
            occ = _occluded_all(
                tri_ref, n_tris, (), sox, soy, soz,
                lpx - sox, lpy - soy, lpz - soz, t_sh,
                chunks=chunks,
            )
        else:
            occ = _bvh_occluded(
                bvh_refs, tri_ref, sox, soy, soz,
                lpx - sox, lpy - soy, lpz - soz,
                jnp.where(active, t_sh, 0.0), max_leaf,
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
        ub0, ub1 = sdim(dim0 + SPPM_BSDF, True)
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
        u_rr = sdim(dim0 + SPPM_RR, False)
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
    *rest,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, hal_slots=None,
    chunks=None,
):
    if hal_slots is not None:
        u_ref, outs = rest[0], rest[1:]
    else:
        u_ref, outs = None, rest
    vals = _camera_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:], pid_r[:], sid_r[:],
        n_tris, lights_p, lights_emit, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        u_ref=u_ref, hal_slots=hal_slots, chunks=chunks,
    )
    for o_ref, v in zip(outs, vals):
        o_ref[:] = v


def _kernel_bvh(
    nodes_f_ref, nodes_i_ref, tri_ref,
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r,
    *rest,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, max_leaf,
    hal_slots=None,
):
    if hal_slots is not None:
        u_ref, rest = rest[0], rest[1:]
    else:
        u_ref = None
    outs = rest[:N_OUT]
    bvh_refs = (nodes_f_ref, nodes_i_ref) + tuple(rest[N_OUT:])
    vals = _camera_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:], pid_r[:], sid_r[:],
        n_tris, lights_p, lights_emit, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        bvh_refs=bvh_refs, max_leaf=max_leaf,
        u_ref=u_ref, hal_slots=hal_slots,
    )
    for o_ref, v in zip(outs, vals):
        o_ref[:] = v


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "lights_p", "lights_emit", "max_depth",
        "spp", "xs", "ys", "jitter", "seed", "kinds_present", "max_lobes",
        "max_leaf", "hal_slots", "chunks", "interpret",
    ),
)
def _run(
    table, nodes_f, nodes_i, ox, oy, oz, dx, dy, dz, w, pid, sid,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
    max_leaf=None, u=None, hal_slots=None, chunks=None, interpret=False,
):
    from .path_megakernel import BVH_TILE_ROWS, _bvh_call_extras

    m = ox.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    u_in, u_specs = (), ()
    if hal_slots is not None:
        nu = u.shape[0]
        u_specs = (pl.BlockSpec(
            (nu, rows, LANES), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),)
        u_in = (u,)
    if use_bvh:
        kernel = functools.partial(
            _kernel_bvh,
            n_tris=n_tris, lights_p=lights_p, lights_emit=lights_emit,
            max_depth=max_depth,
            spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed,
            kinds_present=kinds_present, max_lobes=max_lobes,
            max_leaf=max_leaf, hal_slots=hal_slots,
        )
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret, extra_attrs=1
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 9 + list(u_specs),
            out_specs=[ray_spec] * N_OUT,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)]
            * N_OUT,
            scratch_shapes=scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, ox, oy, oz, dx, dy, dz, w, pid, sid,
          *u_in)
    kernel = functools.partial(
        _kernel,
        n_tris=n_tris, lights_p=lights_p, lights_emit=lights_emit,
        max_depth=max_depth,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed,
        kinds_present=kinds_present, max_lobes=max_lobes,
        hal_slots=hal_slots, chunks=chunks,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 9 + list(u_specs),
        out_specs=[ray_spec] * N_OUT,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * N_OUT,
        interpret=interpret,
    )(table, ox, oy, oz, dx, dy, dz, w, pid, sid, *u_in)


def sppm_camera_mega(
    ctx, packed, o, d, cam_weight, sampler, pixel_id, s_idx, max_depth,
    interpret=False,
):
    """Drop-in replacement for integrators.sppm._camera_pass's walk on
    the supported subset.  packed = pack_sppm(ctx).  Returns
    (ld (N,3), VisiblePoints)."""
    from ..integrators.sppm import VisiblePoints
    from .path_megakernel import BVH_TILE_ROWS

    table = packed[0]
    lights_p, lights_emit, kinds_present, max_lobes = packed[1:5]
    bvh = packed[6]
    nodes_f, nodes_i, max_leaf = bvh if bvh is not None else (None,) * 3
    n = o.shape[0]
    tile = (BVH_TILE_ROWS if bvh is not None else TILE_ROWS) * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    s_arr = jnp.broadcast_to(jnp.asarray(s_idx, jnp.uint32), (n,))
    pid_arr = jnp.asarray(pixel_id, jnp.uint32)
    # Halton (the production SPPM sampler, sppm.rs:130): slot values
    # computed by the host sampler ride in as an input matrix — exact
    # parity with _camera_pass's get_1d/get_2d calls by construction
    from ..sampler.halton import HaltonSampler

    hal_slots, u = None, None
    if isinstance(sampler, HaltonSampler):
        hal_slots = _sppm_slots(int(max_depth))
        umat = _halton_u(sampler, pid_arr, s_arr, hal_slots)
        u = jnp.stack([prep(umat[c]) for c in range(umat.shape[0])], 0)
    outs = _run(
        table, nodes_f, nodes_i,
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(cam_weight.astype(jnp.float32)),
        prep(pid_arr), prep(s_arr),
        n_tris=int(table.shape[0]),
        lights_p=lights_p, lights_emit=lights_emit,
        max_depth=int(max_depth),
        spp=int(sampler.spp),
        xs=int(getattr(sampler, "xs", 1)),
        ys=int(getattr(sampler, "ys", 1)),
        jitter=bool(getattr(sampler, "jitter", False)),
        seed=int(sampler.seed),
        kinds_present=kinds_present, max_lobes=max_lobes,
        max_leaf=max_leaf,
        u=u, hal_slots=hal_slots,
        chunks=getattr(packed[5], "chunks", None),
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


def _kernel_cam(
    tri_ref,
    px_r, py_r, pv_r, pid_r, sid_r,
    *rest,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes,
    hal_slots=None, chunks=None,
):
    """Camera-fused variant: in-kernel lens raygen (_raygen) feeds the
    walk — the host raygen + its HBM ray round trip cost ~5 ms per
    230K-ray iteration (tools/profile_sppm_stages.py)."""
    from .path_megakernel import _raygen

    if hal_slots is not None:
        u_ref, outs = rest[0], rest[1:]
    else:
        u_ref, outs = None, rest
    pid, sid = pid_r[:], sid_r[:]
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, u_ref, hal_slots)
    ox, oy, oz, dx, dy, dz, weight = _raygen(px_r[:], py_r[:], sdim, cam)
    weight = weight * pv_r[:]  # multi-device tile-padding mask
    vals = _camera_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight, pid, sid,
        n_tris, lights_p, lights_emit, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        u_ref=u_ref, hal_slots=hal_slots, chunks=chunks,
    )
    for o_ref, v in zip(outs, vals):
        o_ref[:] = v


def _kernel_bvh_cam(
    nodes_f_ref, nodes_i_ref, tri_ref,
    px_r, py_r, pv_r, pid_r, sid_r,
    *rest,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes, max_leaf,
    hal_slots=None,
):
    from .path_megakernel import _raygen

    if hal_slots is not None:
        u_ref, rest = rest[0], rest[1:]
    else:
        u_ref = None
    outs = rest[:N_OUT]
    bvh_refs = (nodes_f_ref, nodes_i_ref) + tuple(rest[N_OUT:])
    pid, sid = pid_r[:], sid_r[:]
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, u_ref, hal_slots)
    ox, oy, oz, dx, dy, dz, weight = _raygen(px_r[:], py_r[:], sdim, cam)
    weight = weight * pv_r[:]
    vals = _camera_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight, pid, sid,
        n_tris, lights_p, lights_emit, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        bvh_refs=bvh_refs, max_leaf=max_leaf,
        u_ref=u_ref, hal_slots=hal_slots,
    )
    for o_ref, v in zip(outs, vals):
        o_ref[:] = v


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "lights_p", "lights_emit", "max_depth",
        "spp", "xs", "ys", "jitter", "seed", "cam", "kinds_present",
        "max_lobes", "max_leaf", "hal_slots", "chunks", "interpret",
    ),
)
def _run_cam(
    table, nodes_f, nodes_i, px, py, pv, pid, sid,
    n_tris, lights_p, lights_emit, max_depth,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes,
    max_leaf=None, u=None, hal_slots=None, chunks=None, interpret=False,
):
    from .path_megakernel import BVH_TILE_ROWS, _bvh_call_extras

    m = px.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    u_in, u_specs = (), ()
    if hal_slots is not None:
        nu = u.shape[0]
        u_specs = (pl.BlockSpec(
            (nu, rows, LANES), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),)
        u_in = (u,)
    if use_bvh:
        kernel = functools.partial(
            _kernel_bvh_cam,
            n_tris=n_tris, lights_p=lights_p, lights_emit=lights_emit,
            max_depth=max_depth,
            spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed, cam=cam,
            kinds_present=kinds_present, max_lobes=max_lobes,
            max_leaf=max_leaf, hal_slots=hal_slots,
        )
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret, extra_attrs=1
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 5 + list(u_specs),
            out_specs=[ray_spec] * N_OUT,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)]
            * N_OUT,
            scratch_shapes=scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, px, py, pv, pid, sid, *u_in)
    kernel = functools.partial(
        _kernel_cam,
        n_tris=n_tris, lights_p=lights_p, lights_emit=lights_emit,
        max_depth=max_depth,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed, cam=cam,
        kinds_present=kinds_present, max_lobes=max_lobes,
        hal_slots=hal_slots, chunks=chunks,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 5 + list(u_specs),
        out_specs=[ray_spec] * N_OUT,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * N_OUT,
        interpret=interpret,
    )(table, px, py, pv, pid, sid, *u_in)


def sppm_camera_mega_cam(
    ctx, packed, cam_packed, pixel_xy, pixel_id, pvalid, s_idx, sampler,
    max_depth, interpret=False, grid=None,
):
    """Fully fused SPPM camera pass: in-kernel lens raygen + walk.
    pvalid: per-slot bool mask (multi-device tile padding carries
    weight 0 through it).  Returns (ld (N,3), VisiblePoints)."""
    from ..integrators.sppm import VisiblePoints
    from .path_megakernel import BVH_TILE_ROWS, _Hashable

    table = packed[0]
    lights_p, lights_emit, kinds_present, max_lobes = packed[1:5]
    bvh = packed[6]
    nodes_f, nodes_i, max_leaf = bvh if bvh is not None else (None,) * 3
    n = pixel_xy.shape[0]
    tile = (BVH_TILE_ROWS if bvh is not None else TILE_ROWS) * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    s_arr = jnp.broadcast_to(jnp.asarray(s_idx, jnp.uint32), (n,))
    pid_arr = jnp.asarray(pixel_id, jnp.uint32)
    from ..sampler.halton import HaltonSampler

    hal_slots, u = None, None
    if isinstance(sampler, HaltonSampler):
        hal_slots = _sppm_slots(int(max_depth), with_cam=True)
        umat = None
        if grid is not None:
            # single-device full-film batch: slot values from the 128x128
            # CRT-offset grid, broadcast by layout (bit-equal, ~14x less
            # radical-inverse compute — see HaltonSampler.payload_grid)
            h_, w_, layout = grid
            if n == h_ * w_:
                umat = sampler.payload_grid(
                    hal_slots, jnp.asarray(s_idx, jnp.uint32), 1, w_, h_,
                    layout=layout,
                )
        if umat is None:
            umat = _halton_u(sampler, pid_arr, s_arr, hal_slots)
        u = jnp.stack([prep(umat[c]) for c in range(umat.shape[0])], 0)
    outs = _run_cam(
        table, nodes_f, nodes_i,
        prep(pixel_xy[:, 0].astype(jnp.float32)),
        prep(pixel_xy[:, 1].astype(jnp.float32)),
        prep(pvalid.astype(jnp.float32)),
        prep(pid_arr), prep(s_arr),
        n_tris=int(table.shape[0]),
        lights_p=lights_p, lights_emit=lights_emit,
        max_depth=int(max_depth),
        spp=int(sampler.spp),
        xs=int(getattr(sampler, "xs", 1)),
        ys=int(getattr(sampler, "ys", 1)),
        jitter=bool(getattr(sampler, "jitter", False)),
        seed=int(sampler.seed),
        cam=_Hashable(cam_packed),
        kinds_present=kinds_present, max_lobes=max_lobes,
        max_leaf=max_leaf,
        u=u, hal_slots=hal_slots,
        chunks=getattr(packed[5], "chunks", None),
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


# ---------------------------------------------------------------------------
# Fused grid deposit (sppm.rs:346-506 photon->VP splat, TPU-native form)
#
# The reference's hash grid is pure acceleration: a photon deposits on a
# VP iff |photon.p - vp.p|^2 <= vp.radius^2 (the cell walk only
# enumerates candidates; hash collisions only ADD candidates that the
# distance test rejects).  The jnp scan path (integrators/sppm.py)
# replicates the cell walk with a serialized `.at[].add` scatter per
# scan step — the one shape this codebase avoids everywhere else.
#
# TPU-native reformulation (zero scatters, zero per-lane gathers):
#   1. photon deposit events are keyed by the 30-bit Morton code of
#      their (<=1024^3, clamped) grid cell and sorted with a
#      multi-operand lax.sort (bitonic — no gather traffic);
#   2. each PIXEL TILE (rows x 128 lanes, raster order) computes the
#      Morton range [morton(min cmin), morton(max cmax)] of its lanes'
#      p +- r cell boxes.  Morton codes are monotone under componentwise
#      <=, so the sorted-event range [searchsorted(lo), searchsorted(hi)]
#      covers every event any lane can accept; the distance test inside
#      the kernel keeps exactness (any extra enumerated event fails it);
#   3. the kernel walks the tile's event range with a scalar while loop
#      (the packet-BVH row-fetch idiom), broadcasting each event row to
#      all lanes: distance + reflect-side gates, _lobe_f_k with the VP's
#      resolved lobe stack, phi/m accumulate in VMEM registers — the
#      outputs are plain per-pixel arrays.
#
# Exactness note (docs/PARITY.md): phi/m differ from the reference only
# for a photon lying EXACTLY on the grid bbox face at distance EXACTLY
# r from a VP (the reference's `inb` excludes it, the distance test
# keeps it) — a measure-zero float-boundary case.
# ---------------------------------------------------------------------------

DEP_ROWS = 8  # pixel-tile rows: 8x128 lanes keeps tile world-boxes tight
# events per kernel launch: a (E,16) f32 VMEM array is physically padded
# to 128 lanes per row, so 8192 rows = 4 MB — safely inside VMEM next to
# the streamed attribute block
DEP_EV_CHUNK = 1 << 13
_MORTON_SENTINEL = jnp.uint32(0x7FFFFFFF)


def _morton_spread10(v):
    """Spread the low 10 bits of uint32 v to every 3rd bit."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton3(cx, cy, cz):
    """30-bit Morton code; monotone under componentwise <=."""
    return (
        _morton_spread10(cx.astype(jnp.uint32))
        | (_morton_spread10(cy.astype(jnp.uint32)) << 1)
        | (_morton_spread10(cz.astype(jnp.uint32)) << 2)
    )


def _dep_att_layout(kinds_present, max_lobes):
    """(names, per-lobe spec) for the VP attribute matrix rows."""
    has_full = _has_full(kinds_present)
    mixed = len(kinds_present) > 1
    base = 18  # px py pz r2 ss(3) ts(3) ng(3) wol(3) n_lob valid
    per_lobe = (1 if mixed else 0) + 3 + (11 if has_full else 0)
    return base, per_lobe, mixed, has_full


def _deposit_kernel(
    rng_ref, att_ref, events_ref, pr_o, pg_o, pb_o, m_o,
    *, kinds_present, max_lobes,
):
    base, per_lobe, mixed, has_full = _dep_att_layout(
        kinds_present, max_lobes
    )
    # ranges ride whole-array in SMEM (a (T,2) i32 block spec violates
    # Mosaic's (8,128) tiling rule); each instance reads its own row
    i = pl.program_id(0)
    s = rng_ref[i, 0]
    e = rng_ref[i, 1]
    a = att_ref
    px, py, pz, r2 = a[0], a[1], a[2], a[3]
    ssx, ssy, ssz = a[4], a[5], a[6]
    tsx, tsy, tsz = a[7], a[8], a[9]
    ngx, ngy, ngz = a[10], a[11], a[12]
    wol_x, wol_y, wo_z = a[13], a[14], a[15]
    n_lob = a[16].astype(jnp.int32)
    valid = a[17] > 0.0
    zero = jnp.zeros_like(px)
    lobs = []
    for l in range(max_lobes):
        c = base + l * per_lobe
        lob = {}
        if mixed:
            lob["kind"] = a[c].astype(jnp.int32)
            c += 1
        else:
            lob["kind"] = kinds_present[0]
        lob["s0"] = (a[c], a[c + 1], a[c + 2])
        c += 3
        if has_full:
            lob["s1"] = (a[c], a[c + 1], a[c + 2])
            lob["s2"] = (a[c + 3], a[c + 4], a[c + 5])
            lob["au"] = a[c + 6]
            lob["av"] = a[c + 7]
            lob["fres"] = a[c + 8].astype(jnp.int32)
            lob["eta_a"] = a[c + 9]
            lob["eta_b"] = a[c + 10]
        else:
            lob["s1"] = lob["s2"] = (zero,) * 3
            lob["au"] = lob["av"] = zero
            lob["fres"] = 0
            lob["eta_a"] = lob["eta_b"] = zero
        lobs.append(lob)

    def cond(c):
        return c[0] < e

    def body(c):
        k, pr, pg, pb, mc = c
        row = events_ref[pl.ds(k, 1), :]  # (1, 16) scalar row fetch
        ex, ey, ez = row[0, 0], row[0, 1], row[0, 2]
        wix, wiy, wiz = row[0, 3], row[0, 4], row[0, 5]
        ebr, ebg, ebb = row[0, 6], row[0, 7], row[0, 8]
        elive = row[0, 9] > 0.0
        ddx = px - ex
        ddy = py - ey
        ddz = pz - ez
        d2 = ddx * ddx + ddy * ddy + ddz * ddz
        near = valid & (d2 <= r2) & elive
        # bsdf_f(vp.wo, wi, ALL): reflect-side gate on ng (= ns here);
        # the supported lobe set is reflection-only
        wi_ng = wix * ngx + wiy * ngy + wiz * ngz
        gate = near & ((wi_ng * wo_z) > 0.0) & (wo_z != 0.0)
        wil_x = wix * ssx + wiy * ssy + wiz * ssz
        wil_y = wix * tsx + wiy * tsy + wiz * tsz
        fr_, fg_, fb_ = zero, zero, zero
        for l in range(max_lobes):
            lf = _lobe_f_k(
                lobs[l], wol_x, wol_y, wo_z, wil_x, wil_y, wi_ng,
                kinds_present,
            )
            use = gate & (l < n_lob)
            fr_ = fr_ + jnp.where(use, lf[0], 0.0)
            fg_ = fg_ + jnp.where(use, lf[1], 0.0)
            fb_ = fb_ + jnp.where(use, lf[2], 0.0)
        pr = pr + fr_ * ebr
        pg = pg + fg_ * ebg
        pb = pb + fb_ * ebb
        mc = mc + jnp.where(near, 1.0, 0.0)
        return k + 1, pr, pg, pb, mc

    _, pr, pg, pb, mc = lax.while_loop(
        cond, body, (s, zero, zero, zero, zero)
    )
    pr_o[:] = pr
    pg_o[:] = pg
    pb_o[:] = pb
    m_o[:] = mc


@functools.partial(
    jax.jit,
    static_argnames=("kinds_present", "max_lobes", "interpret"),
)
def _deposit_run(att, events, ranges, kinds_present, max_lobes,
                 interpret=False):
    c_att, m, _ = att.shape
    grid = (m // DEP_ROWS,)
    att_spec = pl.BlockSpec(
        (c_att, DEP_ROWS, LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (DEP_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rng_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _deposit_kernel, kinds_present=kinds_present, max_lobes=max_lobes
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            rng_spec,
            att_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 4,
        interpret=interpret,
    )(ranges, att, events)


def resolve_mat_tables(ctx):
    """Per-MATERIAL resolved lobe columns (alpha remap etc. applied),
    host-side once per scene — the deposit gathers rows by vp.mat."""
    from .path_megakernel import _resolve_mat_arrays

    n_mats = int(np.asarray(ctx.mats["kind"]).shape[0])
    r = _resolve_mat_arrays(ctx.mats, np.arange(n_mats))
    return {k: jnp.asarray(v) for k, v in r.items()}


def deposit_mega(
    vp, radius, resolved, ev_p, ev_wi, ev_beta, ev_live,
    lo, diag, kinds_present, max_lobes, interpret=False, max_radius=None,
):
    """phi (N,3), m (N,) for one SPPM iteration.  vp: VisiblePoints;
    ev_*: (E,·) photon deposit events (all depths stacked); lo/diag:
    grid bbox (the kernel derives its own clamped <=1024^3 resolution —
    pure acceleration, the distance test keeps reference semantics).

    max_radius: the max VP radius used for the grid resolution.  The
    multi-device path passes the GLOBAL pmax (this shard's vp set is
    only a pixel slice); None derives it from this call's vp/radius."""
    n = vp.p.shape[0]
    valid = vp.valid & jnp.any(vp.beta > 0.0, axis=-1)

    # clamped grid for Morton keys (shared by events and VP boxes)
    safe_diag = jnp.where(diag == 0.0, 1.0, diag)
    max_diag = jnp.maximum(jnp.max(diag), 1e-20)
    if max_radius is None:
        max_radius = jnp.max(jnp.where(valid, radius, 0.0))
    max_radius = jnp.maximum(max_radius, 1e-20)
    base_res = max_diag / max_radius
    res = jnp.clip(
        (base_res * diag / max_diag).astype(jnp.int32), 1, 1024
    )

    def cell_of(p):
        rel = (p - lo) / safe_diag
        c = (rel * res.astype(jnp.float32)).astype(jnp.int32)
        inb = jnp.all((c >= 0) & (c < res), axis=-1)
        return jnp.clip(c, 0, res - 1), inb

    # ---- event side: Morton key + multi-operand bitonic sort ----
    ecell, einb = cell_of(ev_p)
    ekey = jnp.where(
        ev_live & einb,
        morton3(ecell[:, 0], ecell[:, 1], ecell[:, 2]),
        _MORTON_SENTINEL,
    )
    ops = lax.sort(
        (ekey,
         ev_p[:, 0], ev_p[:, 1], ev_p[:, 2],
         ev_wi[:, 0], ev_wi[:, 1], ev_wi[:, 2],
         ev_beta[:, 0], ev_beta[:, 1], ev_beta[:, 2]),
        num_keys=1,
    )
    skey = ops[0]
    e_total = ekey.shape[0]
    live_col = jnp.where(skey != _MORTON_SENTINEL, 1.0, 0.0)
    # pad rows to a multiple of 8 (f32 VMEM sublane tile); pad rows are
    # dead (live col 0) and past every clipped range anyway.  One stack
    # + one pad — the former per-column .at[].set chain copied the whole
    # table 10 times (~2 ms per bench iteration)
    e_pad_to = -(-e_total // 8) * 8
    ev_core = jnp.stack(
        [ops[1 + j].astype(jnp.float32) for j in range(9)] + [live_col],
        axis=-1,
    )  # (E, 10)
    ev_tab = jnp.pad(ev_core, ((0, e_pad_to - e_total), (0, 6)))

    # ---- VP side: per-tile Morton ranges over the p +- r cell boxes ----
    tile = DEP_ROWS * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    cmin, _ = cell_of(vp.p - radius[:, None])
    cmax, _ = cell_of(vp.p + radius[:, None])
    big = jnp.int32(1 << 20)
    cmin_m = jnp.where(valid[:, None], cmin, big)
    cmax_m = jnp.where(valid[:, None], cmax, -1)
    if pad:
        cmin_m = jnp.concatenate(
            [cmin_m, jnp.full((pad, 3), big, jnp.int32)]
        )
        cmax_m = jnp.concatenate(
            [cmax_m, jnp.full((pad, 3), -1, jnp.int32)]
        )
    t_count = n_pad // tile
    tmin = jnp.min(cmin_m.reshape(t_count, tile, 3), axis=1)
    tmax = jnp.max(cmax_m.reshape(t_count, tile, 3), axis=1)
    empty = jnp.any(tmax < tmin, axis=-1)
    klo = morton3(
        jnp.maximum(tmin[:, 0], 0), jnp.maximum(tmin[:, 1], 0),
        jnp.maximum(tmin[:, 2], 0),
    )
    khi = morton3(
        jnp.maximum(tmax[:, 0], 0), jnp.maximum(tmax[:, 1], 0),
        jnp.maximum(tmax[:, 2], 0),
    )
    s_t = jnp.searchsorted(skey, klo)
    e_t = jnp.searchsorted(skey, khi, side="right")
    s_t = jnp.where(empty, 0, s_t).astype(jnp.int32)
    e_t = jnp.where(empty, 0, e_t).astype(jnp.int32)

    # ---- VP attribute matrix (C, M, LANES) ----
    from ..bsdf import eval as beval

    frame = beval.make_frame(vp.ns, vp.ng, vp.dpdu)
    wol = jnp.stack(
        [jnp.sum(vp.wo * frame.ss, -1), jnp.sum(vp.wo * frame.ts, -1),
         jnp.sum(vp.wo * frame.ns, -1)], -1,
    )
    safe_mat = jnp.clip(vp.mat, 0, resolved["kinds"].shape[0] - 1)
    base, per_lobe, mixed, has_full = _dep_att_layout(
        kinds_present, max_lobes
    )
    rows = [
        vp.p[:, 0], vp.p[:, 1], vp.p[:, 2],
        jnp.where(valid, radius * radius, -1.0),
        frame.ss[:, 0], frame.ss[:, 1], frame.ss[:, 2],
        frame.ts[:, 0], frame.ts[:, 1], frame.ts[:, 2],
        frame.ns[:, 0], frame.ns[:, 1], frame.ns[:, 2],
        wol[:, 0], wol[:, 1], wol[:, 2],
        resolved["n_lobes"][safe_mat].astype(jnp.float32),
        jnp.where(valid, 1.0, 0.0),
    ]
    l_avail = resolved["kinds"].shape[1]
    for l in range(max_lobes):
        la = min(l, l_avail - 1)
        if mixed:
            rows.append(resolved["kinds"][safe_mat, la].astype(jnp.float32))
        rows.append(resolved["s0"][safe_mat, la, 0])
        rows.append(resolved["s0"][safe_mat, la, 1])
        rows.append(resolved["s0"][safe_mat, la, 2])
        if has_full:
            for c in range(3):
                rows.append(resolved["s1"][safe_mat, la, c])
            for c in range(3):
                rows.append(resolved["s2"][safe_mat, la, c])
            rows.append(resolved["au"][safe_mat, la])
            rows.append(resolved["av"][safe_mat, la])
            rows.append(resolved["fres"][safe_mat, la].astype(jnp.float32))
            rows.append(resolved["ea"][safe_mat, la])
            rows.append(resolved["eb"][safe_mat, la])
    att = jnp.stack([prep(r.astype(jnp.float32)) for r in rows], 0)

    # ---- chunked launches (event table must fit VMEM).  The sort puts
    # every live event in a PREFIX (dead rows carry the Morton sentinel),
    # so chunks past the live count skip their launch entirely — each
    # skipped launch saves a full re-stream of the VP attribute matrix
    # (the dominant deposit cost when photon survival is sparse) ----
    phi_r = jnp.zeros((n_pad // LANES, LANES), jnp.float32)
    phi_g = jnp.zeros_like(phi_r)
    phi_b = jnp.zeros_like(phi_r)
    m_cnt = jnp.zeros_like(phi_r)
    n_live = jnp.sum((skey != _MORTON_SENTINEL).astype(jnp.int32))
    for c0 in range(0, int(ev_tab.shape[0]), DEP_EV_CHUNK):
        c1 = min(c0 + DEP_EV_CHUNK, int(ev_tab.shape[0]))
        sc = jnp.clip(s_t, c0, c1) - c0
        ec = jnp.clip(e_t, c0, c1) - c0
        ranges = jnp.stack([sc, ec], -1).astype(jnp.int32)

        def run_chunk(att=att, ev=ev_tab[c0:c1], ranges=ranges):
            return _deposit_run(
                att, ev, ranges, kinds_present, max_lobes,
                interpret=interpret,
            )

        def skip_chunk():
            z = jnp.zeros_like(phi_r)
            return z, z, z, z

        pr, pg, pb, mc = lax.cond(c0 < n_live, run_chunk, skip_chunk)
        phi_r = phi_r + pr
        phi_g = phi_g + pg
        phi_b = phi_b + pb
        m_cnt = m_cnt + mc
    phi = jnp.stack(
        [phi_r.reshape(-1)[:n], phi_g.reshape(-1)[:n],
         phi_b.reshape(-1)[:n]], -1,
    ).astype(DTYPE)
    m = m_cnt.reshape(-1)[:n].astype(jnp.int32)
    return phi, m


# ---------------------------------------------------------------------------
# Fused photon walk (sppm.rs:346-506 minus emission): the per-depth
# intersect / frame / bsdf_sample / RR chain runs in one Pallas kernel.
# Light sampling (sample_le, power pick) and the Halton radical-inverse
# values stay on the host — closed-form jnp over n_photons rows — and
# the bounce/RR uniforms ride in as an input matrix, so photon paths are
# bit-identical to the jnp loop by construction.  The kernel emits the
# deposit events (p, wi, beta, live per depth >= 1) that deposit_mega
# consumes.
# ---------------------------------------------------------------------------


def _photon_loop(
    tri_ref, ox, oy, oz, dx, dy, dz, br, bg, bb, act, u_ref,
    n_tris, max_depth, kinds_present, max_lobes,
    bvh_refs=None, max_leaf=None, chunks=None,
):
    has_full = _has_full(kinds_present)
    mixed = len(kinds_present) > 1
    attr_cols = _attr_cols(kinds_present, max_lobes)
    if bvh_refs is not None:
        # the BVH narrow table carries the mat id as its LAST attr
        # (pack_scene with_mat_col) — fetched positionally, unused here
        attr_cols = attr_cols + (MAT_COL,)
    zero = jnp.zeros(ox.shape, jnp.float32)
    active = act > 0.0
    outs = []
    for depth in range(max_depth):
        if bvh_refs is None:
            out = _closest_hit(
                tri_ref, n_tris, ox, oy, oz, dx, dy, dz, attr_cols,
                chunks=chunks, live=active,
            )
        else:
            out = _bvh_closest_hit(
                bvh_refs, tri_ref, ox, oy, oz, dx, dy, dz, active,
                max_leaf, len(attr_cols),
            )
        t = out[0]
        ngx, ngy, ngz = out[1], out[2], out[3]
        dux, duy, duz = out[4], out[5], out[6]
        n_lob = out[7].astype(jnp.int32)
        cur = 8
        if _has_spec_trans(kinds_present):
            cur += 1
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
        found = t < 3.0e38
        active = active & found
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t

        if depth > 0:
            # deposit event: position, wi = -d, CURRENT beta, liveness
            outs.extend([
                px, py, pz, -dx, -dy, -dz, br, bg, bb,
                jnp.where(active, 1.0, 0.0),
            ])
        if depth >= max_depth - 1:
            break

        # shading frame (flat subset)
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

        ub0 = u_ref[3 * depth]
        ub1 = u_ref[3 * depth + 1]
        u_rr = u_ref[3 * depth + 2]
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
        # photon RR (sppm.rs:497-505): q = max(0, 1 - lum(new)/lum(old))
        lum_new = LUM_R * bnr + LUM_G * bng + LUM_B * bnb
        lum_old = LUM_R * br + LUM_G * bg + LUM_B * bb
        q = jnp.maximum(0.0, 1.0 - lum_new / jnp.maximum(lum_old, 1e-20))
        killed = u_rr < q
        active = ok & ~killed
        inv_cont = 1.0 / jnp.maximum(1.0 - q, 1e-9)
        br = jnp.where(active, bnr * inv_cont, br)
        bg = jnp.where(active, bng * inv_cont, bg)
        bb = jnp.where(active, bnb * inv_cont, bb)
        mag = jnp.abs(px) + jnp.abs(py) + jnp.abs(pz)
        eps = 1e-4 + 1e-5 * mag
        wi_ng2 = _dot3(nwx, nwy, nwz, ngx, ngy, ngz)
        off2 = jnp.where(wi_ng2 < 0.0, -eps, eps)
        ox = jnp.where(active, px + ngx * off2, ox)
        oy = jnp.where(active, py + ngy * off2, oy)
        oz = jnp.where(active, pz + ngz * off2, oz)
        dx = jnp.where(active, nwx, dx)
        dy = jnp.where(active, nwy, dy)
        dz = jnp.where(active, nwz, dz)
    return outs


def _photon_kernel(
    tri_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, br_r, bg_r, bb_r, a_r,
    u_r, *outs,
    n_tris, max_depth, kinds_present, max_lobes, chunks=None,
):
    vals = _photon_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        br_r[:], bg_r[:], bb_r[:], a_r[:], u_r,
        n_tris, max_depth, kinds_present, max_lobes,
        chunks=chunks,
    )
    for o_ref, v in zip(outs, vals):
        o_ref[:] = v


def _photon_kernel_bvh(
    nodes_f_ref, nodes_i_ref, tri_ref,
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, br_r, bg_r, bb_r, a_r,
    u_r, *rest,
    n_tris, max_depth, kinds_present, max_lobes, max_leaf,
):
    n_out = 10 * (max_depth - 1)
    outs = rest[:n_out]
    bvh_refs = (nodes_f_ref, nodes_i_ref) + tuple(rest[n_out:])
    vals = _photon_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        br_r[:], bg_r[:], bb_r[:], a_r[:], u_r,
        n_tris, max_depth, kinds_present, max_lobes,
        bvh_refs=bvh_refs, max_leaf=max_leaf,
    )
    for o_ref, v in zip(outs, vals):
        o_ref[:] = v


@functools.partial(
    jax.jit,
    static_argnames=("n_tris", "max_depth", "kinds_present", "max_lobes",
                     "max_leaf", "chunks", "interpret"),
)
def _photon_run(
    table, nodes_f, nodes_i, ox, oy, oz, dx, dy, dz, br, bg, bb, act, u,
    n_tris, max_depth, kinds_present, max_lobes, max_leaf=None,
    chunks=None, interpret=False,
):
    from .path_megakernel import BVH_TILE_ROWS, _bvh_call_extras

    m = ox.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    nu = u.shape[0]
    u_spec = pl.BlockSpec(
        (nu, rows, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    n_out = 10 * (max_depth - 1)
    if use_bvh:
        kernel = functools.partial(
            _photon_kernel_bvh,
            n_tris=n_tris, max_depth=max_depth,
            kinds_present=kinds_present, max_lobes=max_lobes,
            max_leaf=max_leaf,
        )
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret, extra_attrs=1
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 10 + [u_spec],
            out_specs=[ray_spec] * n_out,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)]
            * n_out,
            scratch_shapes=scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, ox, oy, oz, dx, dy, dz, br, bg, bb,
          act, u)
    kernel = functools.partial(
        _photon_kernel,
        n_tris=n_tris, max_depth=max_depth,
        kinds_present=kinds_present, max_lobes=max_lobes,
        chunks=chunks,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 10 + [u_spec],
        out_specs=[ray_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * n_out,
        interpret=interpret,
    )(table, ox, oy, oz, dx, dy, dz, br, bg, bb, act, u)


def sppm_photon_mega(
    packed, ro, rd, beta, ph_active, u_bounce, max_depth, interpret=False,
):
    """Photon walk for one SPPM iteration.  ro/rd/beta/ph_active from
    the host's sample_le; u_bounce: (3*(max_depth-1), n_photons) bounce
    + RR uniforms (host radical-inverse — exact Halton parity).  Returns
    (ev_p (E,3), ev_wi (E,3), ev_beta (E,3), ev_live (E,)) with
    E = (max_depth-1) * n_photons."""
    from .path_megakernel import BVH_TILE_ROWS

    table = packed[0]
    kinds_present, max_lobes = packed[3], packed[4]
    bvh = packed[6]
    nodes_f, nodes_i, max_leaf = bvh if bvh is not None else (None,) * 3
    n = ro.shape[0]
    tile = (BVH_TILE_ROWS if bvh is not None else TILE_ROWS) * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    u = jnp.stack([prep(u_bounce[c]) for c in range(u_bounce.shape[0])], 0)
    outs = _photon_run(
        table, nodes_f, nodes_i,
        prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
        prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
        prep(beta[:, 0]), prep(beta[:, 1]), prep(beta[:, 2]),
        prep(jnp.where(ph_active, 1.0, 0.0)),
        u,
        n_tris=int(table.shape[0]), max_depth=int(max_depth),
        kinds_present=kinds_present, max_lobes=max_lobes,
        max_leaf=max_leaf,
        chunks=getattr(packed[5], "chunks", None),
        interpret=interpret,
    )
    flat = [x.reshape(-1)[:n] for x in outs]
    evs = []
    for d in range(max_depth - 1):
        b = 10 * d
        evs.append((
            jnp.stack(flat[b:b + 3], -1),
            jnp.stack(flat[b + 3:b + 6], -1),
            jnp.stack(flat[b + 6:b + 9], -1),
            flat[b + 9] > 0.0,
        ))
    ev_p = jnp.concatenate([e[0] for e in evs])
    ev_wi = jnp.concatenate([e[1] for e in evs])
    ev_beta = jnp.concatenate([e[2] for e in evs])
    ev_live = jnp.concatenate([e[3] for e in evs])
    return ev_p, ev_wi, ev_beta, ev_live
