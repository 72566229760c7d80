"""Fused Debug / DirectLighting megakernel (Pallas TPU).

The level-tree integrator (integrators/direct.py, mirroring
intersect_debug.rs:56-89 + directlighting.rs:17-133 + the specular
recursion of integrator/mod.rs:150-301) is the reference scene's default
configuration (samples/scene.json Integrator=Debug) and round-1's worst
benchmark: every tree level round-trips the full SoA state through HBM,
and levels *double* (reflect+transmit children).  This kernel runs the
whole tree for a ray tile in VMEM.

Scope (supports_direct): the reference's recursive specular tree is
walked by TRACE-TIME recursion — every tree node unrolls into the
kernel with a static branch id.  Scenes without transmission lobes
recurse linearly (the reflect chain: scene.json matte/plastic/metal/
debug materials, mirrors); glass scenes (SPEC_REFL + SPEC_TRANS
two-lobe form — the loader's allow_multiple_lobes is false for direct
integrators so FRESNEL_SPEC never occurs) expand the full
reflect+transmit binary tree up to TREE_DEPTH_MAX, replacing the jnp
level loop's 2^depth megabatch doubling.  Everything else falls back
to the jnp level loop.

Estimator-identical to li_levels: same sampler dims (dim_base =
8 + branch*257 with tree-node ids reflect=2b+1 / transmit=2b+2), same
NEE (all-lights per estimate_direct or one-light), same child betas.
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
from ..bsdf.lobes import (
    LOBE_LAMBERT_REFL,
    LOBE_MF_REFL,
    LOBE_SPEC_REFL,
    LOBE_SPEC_TRANS,
    LOBE_FRESNEL_SPEC,
    LOBE_DEBUG_DIFFUSE,
    LOBE_DEBUG_SPECULAR,
    LOBE_OREN_NAYAR,
    DIST_TROWBRIDGE_REITZ,
)
from .path_megakernel import (
    BVH_TILE_ROWS,
    LANES,
    MEGA_BVH_TRI_MAX,
    TILE_ROWS,
    TRI_MAX,
    LOBES_MAX,
    LIGHT_MAX,
    SPEC_KINDS,
    _bvh_call_extras,
    _bvh_closest_hit,
    _bvh_occluded,
    _closest_hit,
    _occluded,
    _attr_cols,
    _has_full,
    _sampler_dims,
    _fresnel_k,
    _fr_dielectric_k,
    _lobe_f_k,
    _concentric_disk,
    _dot3,
    _normalize3,
    _has_spec,
    _has_spec_trans,
    pack_scene,
)

DEPTH_MAX = 8  # chain levels; 2^8 branch ids stay in int32 dim range
TREE_DEPTH_MAX = 6  # full reflect+transmit trees: 2^5-1 = 31 node bodies

# kinds the NEE/f machinery of this kernel understands
_NEE_KINDS = (
    LOBE_LAMBERT_REFL,
    LOBE_MF_REFL,
    LOBE_DEBUG_DIFFUSE,
    LOBE_DEBUG_SPECULAR,
    LOBE_SPEC_REFL,
)


def supports_direct(ctx, spec, sampler, diff) -> bool:
    """Static host check for the Debug/DirectLighting chain kernel."""
    from .path_megakernel import common_scene_checks

    if spec.kind not in ("debug", "direct") or diff is not None:
        return False
    if spec.max_depth > DEPTH_MAX:
        return False
    import os

    tri_max = (
        TRI_MAX
        if os.environ.get("RS_MEGA_BVH", "1") == "0"
        else MEGA_BVH_TRI_MAX
    )
    common = common_scene_checks(ctx, sampler, tri_max=tri_max)
    if common is None:
        return False
    kinds, n_lobes, live, used = common
    ok_kinds = np.zeros_like(kinds, bool)
    for k in _NEE_KINDS + (LOBE_SPEC_TRANS,):
        ok_kinds |= kinds == k
    if np.any(~ok_kinds[live]):
        return False
    # FRESNEL_SPEC can't occur here (the loader builds it only for
    # path/volpath integrators, scene/loader.py allow_multiple_lobes) —
    # reject defensively anyway
    if np.any(live & (kinds == LOBE_FRESNEL_SPEC)):
        return False
    # transmission makes the specular recursion a full binary tree; the
    # trace-time unroll emits 2^(max_depth-1)-1 node bodies, so cap the
    # depth (glass DirectLighting; TREE_DEPTH_MAX=6 -> <=31 nodes)
    if np.any(live & (kinds == LOBE_SPEC_TRANS)):
        if spec.max_depth > TREE_DEPTH_MAX:
            return False
    return True


def pack_direct(ctx, spec):
    """pack_scene + the per-light NEE sample counts (all-lights mode).
    The SceneStatic is dropped (this kernel's subset has no spheres /
    area lights / envs); the BVH payload rides along for mesh scenes."""
    p7 = pack_scene(ctx)
    packed = p7[:5] + (p7[6],)
    ns = []
    for v in np.asarray(ctx.lights.n_samples):
        p = 1
        while p < max(int(v), 1):
            p <<= 1
        ns.append(p)
    # (..., bvh, lights_ns, chunks): the brute tri loops' static AABB
    # cull (path_megakernel._build_tri_chunks; None when the BVH engages)
    return packed + (tuple(ns), getattr(p7[5], "chunks", None))


def _lobe_f_dbg(lob, wix, wiy, wiz, kinds_present, wol=None):
    """NEE lobe f: lambert / TR-microfacet / debug-diffuse const; zero
    for specular kinds (estimate_direct queries ALL & ~SPECULAR,
    integrator/mod.rs:413-416, and DebugSpecular/SpecularReflection do
    not match)."""
    wox, woy, woz = wol
    base = _lobe_f_k(lob, wox, woy, woz, wix, wiy, wiz, kinds_present)
    if LOBE_DEBUG_DIFFUSE not in kinds_present and (
        LOBE_DEBUG_SPECULAR not in kinds_present
    ):
        return base
    k = lob["kind"]
    mixed = not isinstance(k, int)
    one = jnp.ones_like(wix)
    zero = jnp.zeros_like(wix)
    if LOBE_DEBUG_DIFFUSE in kinds_present:
        is_dd = (k == LOBE_DEBUG_DIFFUSE) if mixed else True
        if is_dd is True:
            base = (zero, one, zero)
        else:
            base = (
                jnp.where(is_dd, 0.0, base[0]),
                jnp.where(is_dd, 1.0, base[1]),
                jnp.where(is_dd, 0.0, base[2]),
            )
    if LOBE_DEBUG_SPECULAR in kinds_present:
        is_ds = (k == LOBE_DEBUG_SPECULAR) if mixed else True
        if is_ds is True:
            base = (zero, zero, zero)
        else:
            base = tuple(jnp.where(is_ds, 0.0, b) for b in base)
    return base


def _chain_loop(
    tri_ref, ox, oy, oz, dx, dy, dz, active0, pid, sid,
    n_tris, lights_p, lights_emit, lights_ns, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
    debug, strategy_all, bvh_refs=None, max_leaf=None, chunks=None,
):
    n_lights = len(lights_p)
    has_mf = LOBE_MF_REFL in kinds_present
    # must mirror _attr_cols' block condition exactly (debug lobes carry
    # constant f and need none of the s1/s2/alpha/fresnel attributes)
    has_full = _has_full(kinds_present)
    mixed = len(kinds_present) > 1
    attr_cols = _attr_cols(kinds_present, max_lobes)
    one = jnp.ones(ox.shape, jnp.float32)
    zero = jnp.zeros(ox.shape, jnp.float32)
    b0 = jnp.where(active0, one, 0.0)

    # static subtree liveness (direct.py branch_live): a reflect child
    # exists iff some lobe matches SPECULAR|REFLECTION, a transmit child
    # iff some lobe matches SPECULAR|TRANSMISSION.  FRESNEL_SPEC never
    # appears here (the loader only builds it for path/volpath —
    # scene/loader.py allow_multiple_lobes — and supports_direct rejects
    # it), so glass under DirectLighting is the SPEC_REFL + SPEC_TRANS
    # two-lobe form whose children split the tree.
    can_chain = (LOBE_DEBUG_SPECULAR in kinds_present) or (
        LOBE_SPEC_REFL in kinds_present
    )
    has_st = LOBE_SPEC_TRANS in kinds_present

    # The reference's recursive li + specular_reflect/specular_transmit
    # tree (integrator/mod.rs:150-301) is walked by TRACE-TIME recursion:
    # each tree node is unrolled into the kernel with its own STATIC
    # branch id (so sampler dims stay compile-time constants, matching
    # direct.py's dim_base = 8 + branch*257 exactly) and per-lane dead
    # subtrees simply carry beta = 0.  Chain-only scenes (no transmission)
    # recurse linearly — the same program as the old iterative loop —
    # while glass scenes expand the full 2^depth tree without the jnp
    # path's level-doubling megabatches (integrators/direct.py:152-176).
    def _visit(ox, oy, oz, dx, dy, dz, br, bg, bb, branch, depth):
        dim_base = 8 + branch * 257
        # chain liveness == nonzero beta (level 0: active0 seeds beta)
        alive = (br != 0.0) | (bg != 0.0) | (bb != 0.0)
        if bvh_refs is None:
            out = _closest_hit(
                tri_ref, n_tris, ox, oy, oz, dx, dy, dz, attr_cols,
                chunks=chunks, live=alive,
            )
        else:
            out = _bvh_closest_hit(
                bvh_refs, tri_ref, ox, oy, oz, dx, dy, dz, alive,
                max_leaf, len(attr_cols),
            )
        t = out[0]
        ngx, ngy, ngz = out[1], out[2], out[3]
        dux, duy, duz = out[4], out[5], out[6]
        n_lob = out[7].astype(jnp.int32)
        cur = 8
        if _has_spec_trans(kinds_present):
            cur += 1  # _attr_cols col 31 (Bsdf eta) — etaScale is a
            # path-integrator concern; the direct tree never reads it
        lobs = []
        zero_k = zero
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
                lob["s1"] = lob["s2"] = (zero_k,) * 3
                lob["au"] = lob["av"] = zero_k
                lob["fres"] = 0
                lob["eta_a"] = lob["eta_b"] = zero_k
            lobs.append(lob)
        found = t < 3.0e38
        live = found & ((br != 0.0) | (bg != 0.0) | (bb != 0.0))

        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t

        # shading frame (ns == ng: flat subset)
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

        lvl_r, lvl_g, lvl_b = zero, zero, zero
        if debug:
            # flat 0.1 base on any hit (intersect_debug.rs:69-72)
            lvl_r = lvl_r + jnp.where(live, 0.1, 0.0)
            lvl_g = lvl_g + jnp.where(live, 0.1, 0.0)
            lvl_b = lvl_b + jnp.where(live, 0.1, 0.0)

        # shadow-ray origin offset (shared by every NEE sample)
        mag = jnp.abs(px) + jnp.abs(py) + jnp.abs(pz)
        eps = 1e-4 + 1e-5 * mag

        def _estimate_point(lpx, lpy, lpz, ler, leg, leb):
            """estimate_direct for one delta light (mod.rs:403-470):
            light branch only, f over non-specular lobes."""
            tlx, tly, tlz = lpx - px, lpy - py, lpz - pz
            dist2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
            inv_d = lax.rsqrt(dist2)
            wix, wiy, wiz = tlx * inv_d, tly * inv_d, tlz * inv_d
            wil_x = _dot3(wix, wiy, wiz, ssx, ssy, ssz)
            wil_y = _dot3(wix, wiy, wiz, tsx, tsy, tsz)
            wi_ng = _dot3(wix, wiy, wiz, ngx, ngy, ngz)
            reflect_side = (wi_ng * wo_z) > 0.0
            f_gate = reflect_side & (wo_z != 0.0)
            fr_ = zero
            fg_ = zero
            fb_ = zero
            for l in range(max_lobes):
                lf = _lobe_f_dbg(
                    lobs[l], wil_x, wil_y, wi_ng, kinds_present,
                    wol=(wol_x, wol_y, wo_z),
                )
                use = f_gate & (l < n_lob)
                fr_ = fr_ + jnp.where(use, lf[0], 0.0)
                fg_ = fg_ + jnp.where(use, lf[1], 0.0)
                fb_ = fb_ + jnp.where(use, lf[2], 0.0)
            cos_ns = jnp.abs(wi_ng)
            off = jnp.where(wi_ng < 0.0, -eps, eps)
            sox = px + ngx * off
            soy = py + ngy * off
            soz = pz + ngz * off
            t_sh = jnp.full(px.shape, 1.0 - SHADOW_EPSILON, jnp.float32)
            if bvh_refs is None:
                occ = _occluded(
                    tri_ref, n_tris, sox, soy, soz,
                    lpx - sox, lpy - soy, lpz - soz, t_sh,
                    chunks=chunks,
                )
            else:
                occ = _bvh_occluded(
                    bvh_refs, tri_ref, sox, soy, soz,
                    lpx - sox, lpy - soy, lpz - soz,
                    jnp.where(live, t_sh, 0.0), max_leaf,
                )
            s = jnp.where(live & ~occ, cos_ns / dist2, 0.0)
            return fr_ * ler * s, fg_ * leg * s, fb_ * leb * s

        if strategy_all:
            # uniform_sample_all_lights (mod.rs:304-355)
            dim = dim_base
            for j in range(n_lights):
                ns = lights_ns[j]
                ar, ag, ab = zero, zero, zero
                for _k in range(ns):
                    # dims consumed per sample (u_light, u_scatter) —
                    # values unused for delta lights but the slots advance
                    dim += 2
                    er, eg, eb = _estimate_point(
                        jnp.full_like(px, lights_p[j][0]),
                        jnp.full_like(px, lights_p[j][1]),
                        jnp.full_like(px, lights_p[j][2]),
                        jnp.full_like(px, lights_emit[j][0]),
                        jnp.full_like(px, lights_emit[j][1]),
                        jnp.full_like(px, lights_emit[j][2]),
                    )
                    ar, ag, ab = ar + er, ag + eg, ab + eb
                lvl_r = lvl_r + ar / ns
                lvl_g = lvl_g + ag / ns
                lvl_b = lvl_b + ab / ns
            dim_child = dim
        else:
            # uniform_sample_one_light (mod.rs:359-401)
            u_pick = _sampler_dims(
                pid, sid, dim_base, spp, xs, ys, jitter, seed, False
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
            er, eg, eb = _estimate_point(lpx, lpy, lpz, ler, leg, leb)
            lvl_r = lvl_r + er * n_lights
            lvl_g = lvl_g + eg * n_lights
            lvl_b = lvl_b + eb * n_lights
            dim_child = dim_base + 3

        Lr = br * lvl_r
        Lg = bg * lvl_g
        Lb = bb * lvl_b

        if depth + 1 >= max_depth or not (can_chain or has_st):
            return Lr, Lg, Lb

        def _select_matching(match_kinds):
            """Merge the (at most one per lane) lobe matching
            `match_kinds` into a single lobe dict + liveness mask."""
            m_kind = None
            m_lob = None
            has_m = None
            for l in range(max_lobes):
                k = lobs[l]["kind"]
                if isinstance(k, int):
                    is_m = k in match_kinds
                    sel = jnp.full(px.shape, is_m) & (l < n_lob)
                else:
                    sel = jnp.zeros(px.shape, bool)
                    for mk in match_kinds:
                        sel = sel | (k == mk)
                    sel = sel & (l < n_lob)
                if m_lob is None:
                    m_lob = {
                        kk: (
                            tuple(
                                jnp.where(sel, vv[c], 0.0) for c in range(3)
                            )
                            if isinstance(vv, tuple)
                            else jnp.where(sel, vv, 0)
                        )
                        for kk, vv in lobs[l].items()
                    }
                    m_kind = jnp.where(sel, k, 0)
                    has_m = sel
                else:
                    for kk, vv in lobs[l].items():
                        if isinstance(vv, tuple):
                            m_lob[kk] = tuple(
                                jnp.where(sel, vv[c], m_lob[kk][c])
                                for c in range(3)
                            )
                        else:
                            m_lob[kk] = jnp.where(sel, vv, m_lob[kk])
                    m_kind = jnp.where(sel, lobs[l]["kind"], m_kind)
                    has_m = has_m | sel
            return m_lob, m_kind, has_m

        def _recurse_child(wsx, wsy, wsz, fs_r, fs_g, fs_b, pdf, has_m, ci):
            """Shared child tail (integrator/mod.rs:162-176): world dir,
            beta = f |wi.ns| / pdf, offset origin, recurse with the
            child's tree-node id."""
            nwx = ssx * wsx + tsx * wsy + ngx * wsz
            nwy = ssy * wsx + tsy * wsy + ngy * wsz
            nwz = ssz * wsx + tsz * wsy + ngz * wsz
            cosw = jnp.abs(_dot3(nwx, nwy, nwz, ngx, ngy, ngz))
            ok = (
                live
                & has_m
                & (wo_z != 0.0)
                & (pdf > 0.0)
                & (cosw != 0.0)
                & ((fs_r != 0.0) | (fs_g != 0.0) | (fs_b != 0.0))
            )
            scale = cosw / jnp.maximum(pdf, 1e-20)
            cbr = jnp.where(ok, br * fs_r * scale, 0.0)
            cbg = jnp.where(ok, bg * fs_g * scale, 0.0)
            cbb = jnp.where(ok, bb * fs_b * scale, 0.0)
            off2 = jnp.where(
                _dot3(nwx, nwy, nwz, ngx, ngy, ngz) < 0.0, -eps, eps
            )
            return _visit(
                px + ngx * off2, py + ngy * off2, pz + ngz * off2,
                nwx, nwy, nwz, cbr, cbg, cbb,
                branch * 2 + 1 + ci, depth + 1,
            )

        if can_chain:
            # reflect child (integrator/mod.rs:150-213): sample_f over
            # SPECULAR|REFLECTION — matches DEBUG_SPECULAR (cosine sample,
            # constant blue f) or SPEC_REFL (mirror)
            ub0, ub1 = _sampler_dims(
                pid, sid, dim_child, spp, xs, ys, jitter, seed, True
            )
            m_lob, m_kind, has_m = _select_matching(
                (LOBE_DEBUG_SPECULAR, LOBE_SPEC_REFL)
            )
            u0 = jnp.minimum(ub0, ONE_MINUS_EPSILON)
            is_ds = m_kind == LOBE_DEBUG_SPECULAR
            is_sr = m_kind == LOBE_SPEC_REFL
            # cosine candidate (DEBUG_SPECULAR's default BxDF::sample_f)
            if LOBE_DEBUG_SPECULAR in kinds_present:
                dxo, dyo = _concentric_disk(u0, ub1)
                z_cos = jnp.sqrt(
                    jnp.maximum(0.0, 1.0 - dxo * dxo - dyo * dyo)
                )
                z_cos = jnp.where(wo_z < 0.0, -z_cos, z_cos)
            else:
                dxo = dyo = z_cos = zero
            # mirror candidate
            srx, sry, srz = -wol_x, -wol_y, wo_z
            wsx = jnp.where(is_sr, srx, dxo)
            wsy = jnp.where(is_sr, sry, dyo)
            wsz = jnp.where(is_sr, srz, z_cos)
            # f and pdf of the chosen lobe
            fs_r = fs_g = fs_b = zero
            pdf = zero
            if LOBE_DEBUG_SPECULAR in kinds_present:
                same = (wo_z * wsz) > 0.0
                cos_pdf = jnp.where(same, jnp.abs(wsz) / PI, 0.0)
                fs_b = jnp.where(is_ds, 1.0, fs_b)  # f = (0,0,1)
                pdf = jnp.where(is_ds, cos_pdf, pdf)
            if LOBE_SPEC_REFL in kinds_present:
                aci = jnp.maximum(jnp.abs(wsz), 1e-20)
                fr3 = _fresnel_k(m_lob, wsz)
                fs_r = jnp.where(is_sr, m_lob["s0"][0] * fr3[0] / aci, fs_r)
                fs_g = jnp.where(is_sr, m_lob["s0"][1] * fr3[1] / aci, fs_g)
                fs_b = jnp.where(is_sr, m_lob["s0"][2] * fr3[2] / aci, fs_b)
                pdf = jnp.where(is_sr, 1.0, pdf)
            cLr, cLg, cLb = _recurse_child(
                wsx, wsy, wsz, fs_r, fs_g, fs_b, pdf, has_m, 0
            )
            Lr = Lr + cLr
            Lg = Lg + cLg
            Lb = Lb + cLb

        if has_st:
            # transmit child (integrator/mod.rs:216-301): sample_f over
            # SPECULAR|TRANSMISSION — matches SPEC_TRANS only.  The u
            # slot (dim_child+1) advances in direct.py but a specular
            # lobe never reads it, so the kernel skips computing it.
            # Refraction + f per SpecularTransmission::sample_f
            # (reflection.rs:686-715; the same math as the path
            # megakernel's ST candidate in _bsdf_sample_k).
            m_lob, m_kind, has_m = _select_matching((LOBE_SPEC_TRANS,))
            ea, eb = m_lob["eta_a"], m_lob["eta_b"]
            entering = wo_z > 0.0
            ei = jnp.where(entering, ea, eb)
            et = jnp.where(entering, eb, ea)
            eta_rel = ei / jnp.maximum(et, 1e-9)
            abs_cz = jnp.abs(wo_z)
            sin2_t = eta_rel * eta_rel * jnp.maximum(
                0.0, 1.0 - abs_cz * abs_cz
            )
            st_ok = sin2_t < 1.0  # total internal reflection gate
            cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
            nz_sign = jnp.where(entering, 1.0, -1.0)
            wsx = -eta_rel * wol_x
            wsy = -eta_rel * wol_y
            wsz = -eta_rel * wo_z + (eta_rel * abs_cz - cos_t) * nz_sign
            # f = T (1-Fr(wi_z)) (eta_i^2/eta_t^2) / |cos| (radiance mode)
            scale_t = (ei * ei) / jnp.maximum(et * et, 1e-20)
            fr_t = _fr_dielectric_k(wsz, ea, eb)
            aci = jnp.maximum(jnp.abs(wsz), 1e-20)
            fac = jnp.where(st_ok, (1.0 - fr_t) * scale_t / aci, 0.0)
            fs_r = m_lob["s0"][0] * fac
            fs_g = m_lob["s0"][1] * fac
            fs_b = m_lob["s0"][2] * fac
            pdf = jnp.where(st_ok, 1.0, 0.0)
            cLr, cLg, cLb = _recurse_child(
                wsx, wsy, wsz, fs_r, fs_g, fs_b, pdf, has_m, 1
            )
            Lr = Lr + cLr
            Lg = Lg + cLg
            Lb = Lb + cLb

        return Lr, Lg, Lb

    return _visit(ox, oy, oz, dx, dy, dz, b0, b0, b0, 0, 1)


def _kernel(
    tri_ref,
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r,
    lr_o, lg_o, lb_o,
    *, n_tris, lights_p, lights_emit, lights_ns, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, debug, strategy_all,
    chunks=None,
):
    Lr, Lg, Lb = _chain_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:] > 0.0, pid_r[:], sid_r[:],
        n_tris, lights_p, lights_emit, lights_ns, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        debug, strategy_all, chunks=chunks,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb


def _kernel_bvh(
    nodes_f_ref, nodes_i_ref, tri_ref,
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r,
    lr_o, lg_o, lb_o,
    stack_ref, t_ref, best_ref, attr_ref,
    *, n_tris, lights_p, lights_emit, lights_ns, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, debug,
    strategy_all, max_leaf,
):
    Lr, Lg, Lb = _chain_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:] > 0.0, pid_r[:], sid_r[:],
        n_tris, lights_p, lights_emit, lights_ns, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        debug, strategy_all,
        bvh_refs=(nodes_f_ref, nodes_i_ref, stack_ref, t_ref, best_ref,
                  attr_ref),
        max_leaf=max_leaf,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "lights_p", "lights_emit", "lights_ns", "max_depth",
        "spp", "xs", "ys", "jitter", "seed", "kinds_present", "max_lobes",
        "debug", "strategy_all", "max_leaf", "chunks", "interpret",
    ),
)
def _run(
    table, nodes_f, nodes_i, ox, oy, oz, dx, dy, dz, w, pid, sid,
    n_tris, lights_p, lights_emit, lights_ns, max_depth,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
    debug, strategy_all, max_leaf=None, chunks=None, interpret=False,
):
    m = ox.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kw = dict(
        n_tris=n_tris,
        lights_p=lights_p,
        lights_emit=lights_emit,
        lights_ns=lights_ns,
        max_depth=max_depth,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed,
        kinds_present=kinds_present, max_lobes=max_lobes,
        debug=debug, strategy_all=strategy_all,
    )
    if use_bvh:
        kernel = functools.partial(_kernel_bvh, max_leaf=max_leaf, **kw)
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 9,
            out_specs=[ray_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 3,
            scratch_shapes=scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, ox, oy, oz, dx, dy, dz, w, pid, sid)
    kernel = functools.partial(_kernel, chunks=chunks, **kw)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 9,
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 3,
        interpret=interpret,
    )(table, ox, oy, oz, dx, dy, dz, w, pid, sid)
    return outs


def _kernel_cam(
    tri_ref,
    px_r, py_r, pid_r, sid_r,
    lr_o, lg_o, lb_o, w_o,
    *, n_tris, lights_p, lights_emit, lights_ns, max_depth,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes, debug,
    strategy_all, chunks=None,
):
    """Camera-fused variant: in-kernel lens raygen feeds the chain walk
    (the host raygen + HBM ray round trip dominate short chains —
    tools/profile_fog.py measured the same split for volpath)."""
    from .path_megakernel import _mk_sdim, _raygen

    pid, sid = pid_r[:], sid_r[:]
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, None, None)
    ox, oy, oz, dx, dy, dz, weight = _raygen(px_r[:], py_r[:], sdim, cam)
    Lr, Lg, Lb = _chain_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight > 0.0, pid, sid,
        n_tris, lights_p, lights_emit, lights_ns, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        debug, strategy_all, chunks=chunks,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb
    w_o[:] = weight


def _kernel_bvh_cam(
    nodes_f_ref, nodes_i_ref, tri_ref,
    px_r, py_r, pid_r, sid_r,
    lr_o, lg_o, lb_o, w_o,
    stack_ref, t_ref, best_ref, attr_ref,
    *, n_tris, lights_p, lights_emit, lights_ns, max_depth,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes, debug,
    strategy_all, max_leaf,
):
    from .path_megakernel import _mk_sdim, _raygen

    pid, sid = pid_r[:], sid_r[:]
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, None, None)
    ox, oy, oz, dx, dy, dz, weight = _raygen(px_r[:], py_r[:], sdim, cam)
    Lr, Lg, Lb = _chain_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight > 0.0, pid, sid,
        n_tris, lights_p, lights_emit, lights_ns, max_depth,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        debug, strategy_all,
        bvh_refs=(nodes_f_ref, nodes_i_ref, stack_ref, t_ref, best_ref,
                  attr_ref),
        max_leaf=max_leaf,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb
    w_o[:] = weight


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "lights_p", "lights_emit", "lights_ns", "max_depth",
        "spp", "xs", "ys", "jitter", "seed", "cam", "kinds_present",
        "max_lobes", "debug", "strategy_all", "max_leaf", "chunks",
        "interpret",
    ),
)
def _run_cam(
    table, nodes_f, nodes_i, px, py, pid, sid,
    n_tris, lights_p, lights_emit, lights_ns, max_depth,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes,
    debug, strategy_all, max_leaf=None, chunks=None, interpret=False,
):
    m = px.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kw = dict(
        n_tris=n_tris,
        lights_p=lights_p,
        lights_emit=lights_emit,
        lights_ns=lights_ns,
        max_depth=max_depth,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed, cam=cam,
        kinds_present=kinds_present, max_lobes=max_lobes,
        debug=debug, strategy_all=strategy_all,
    )
    if use_bvh:
        kernel = functools.partial(_kernel_bvh_cam, max_leaf=max_leaf, **kw)
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 4,
            out_specs=[ray_spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 4,
            scratch_shapes=scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, px, py, pid, sid)
    kernel = functools.partial(_kernel_cam, chunks=chunks, **kw)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 4,
        out_specs=[ray_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 4,
        interpret=interpret,
    )(table, px, py, pid, sid)


def li_levels_mega_cam(
    ctx, packed, cam_packed, pixel_xy, pixel_id, s_idx, sampler, spec,
    interpret=False,
):
    """Fully fused Debug/DirectLighting pass: in-kernel lens raygen +
    chain walk.  Returns (L (N,3), weight (N,))."""
    from .path_megakernel import _Hashable

    (table, lights_p, lights_emit, kinds_present, max_lobes, bvh,
     lights_ns, chunks) = packed
    nodes_f, nodes_i, max_leaf = bvh if bvh is not None else (None,) * 3
    n = pixel_xy.shape[0]
    rows = BVH_TILE_ROWS if bvh is not None else TILE_ROWS
    tile = rows * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    s_arr = jnp.broadcast_to(jnp.asarray(s_idx, jnp.uint32), (n,))
    debug = spec.kind == "debug"
    strategy_all = debug or spec.light_strategy == "all"
    max_depth = int(spec.max_depth)
    from ..bsdf.lobes import (
        LOBE_DEBUG_SPECULAR as _DS,
        LOBE_SPEC_REFL as _SRK,
    )

    if not (set(kinds_present) & {_DS, _SRK}):
        max_depth = min(max_depth, 2)
    lr, lg, lb, w = _run_cam(
        table, nodes_f, nodes_i,
        prep(pixel_xy[:, 0].astype(jnp.float32)),
        prep(pixel_xy[:, 1].astype(jnp.float32)),
        prep(jnp.asarray(pixel_id, jnp.uint32)), prep(s_arr),
        n_tris=int(table.shape[0]), lights_p=lights_p,
        lights_emit=lights_emit, lights_ns=lights_ns,
        max_depth=max_depth,
        spp=int(sampler.spp), xs=int(sampler.xs), ys=int(sampler.ys),
        jitter=bool(sampler.jitter), seed=int(sampler.seed),
        cam=_Hashable(cam_packed),
        kinds_present=kinds_present, max_lobes=max_lobes,
        debug=debug, strategy_all=strategy_all,
        max_leaf=max_leaf, chunks=chunks,
        interpret=interpret,
    )
    l = jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    ).astype(DTYPE)
    return l, w.reshape(-1)[:n].astype(DTYPE)


def li_levels_mega(
    ctx, packed, o, d, cam_weight, sampler, pixel_id, s_idx, spec,
    interpret=False,
):
    """Drop-in replacement for integrators.direct.li_levels on the
    supported subset.  packed = pack_direct(ctx, spec)."""
    (table, lights_p, lights_emit, kinds_present, max_lobes, bvh,
     lights_ns, chunks) = packed
    nodes_f, nodes_i, max_leaf = bvh if bvh is not None else (None,) * 3
    n = o.shape[0]
    rows = BVH_TILE_ROWS if bvh is not None else TILE_ROWS
    tile = rows * LANES
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    s_arr = jnp.broadcast_to(jnp.asarray(s_idx, jnp.uint32), (n,))
    debug = spec.kind == "debug"
    strategy_all = debug or spec.light_strategy == "all"
    max_depth = int(spec.max_depth)
    # mirror li_levels' no-specular early bound
    from ..bsdf.lobes import (
        LOBE_DEBUG_SPECULAR as _DS,
        LOBE_SPEC_REFL as _SRK,
    )

    if not (set(kinds_present) & {_DS, _SRK}):
        max_depth = min(max_depth, 2)
    lr, lg, lb = _run(
        table, nodes_f, nodes_i,
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(cam_weight.astype(jnp.float32)),
        prep(jnp.asarray(pixel_id, jnp.uint32)), prep(s_arr),
        n_tris=int(table.shape[0]), lights_p=lights_p,
        lights_emit=lights_emit, lights_ns=lights_ns,
        max_depth=max_depth,
        spp=int(sampler.spp), xs=int(sampler.xs), ys=int(sampler.ys),
        jitter=bool(sampler.jitter), seed=int(sampler.seed),
        kinds_present=kinds_present, max_lobes=max_lobes,
        debug=debug, strategy_all=strategy_all,
        max_leaf=max_leaf, chunks=chunks,
        interpret=interpret,
    )
    return jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    ).astype(DTYPE)
