"""Material recipes: JSON material configs -> lobe rows.

Mirrors the lobe assembly of each reference material
(matte.rs:35-61, plastic.rs:46-77, metal.rs:47-95, mirror.rs:29-49,
glass.rs:52-113, translucent.rs:52-108, mixmat.rs:33-61,
debug_material.rs:36-49) as *static* recipes.  Where the reference gates a
lobe on a texture value evaluated at the hit (`!r.is_black()`), a constant
texture lets us resolve the gate at build time; textured params keep the lobe
and rely on f==0 at eval, which produces the same estimator (a black lobe
contributes 0 and its sampling probability matches the reference's, which
also keeps the lobe when the texture is non-constant somewhere).

Known reference bugs handled per SURVEY §2.7 (fixed here, documented):
- plastic.rs gates the specular lobe on `kd` instead of `ks`: we gate on ks.
- mixmat build passes mat1 twice (renderprocess.rs:688-690): we mix m1,m2.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .lobes import (
    DIST_DISNEY_SEPARABLE_G,
    DIST_TROWBRIDGE_REITZ,
    FRESNEL_CONDUCTOR,
    FRESNEL_DIELECTRIC,
    FRESNEL_NOOP,
    HostMaterial,
    Lobe,
    LOBE_DEBUG_DIFFUSE,
    LOBE_DEBUG_SPECULAR,
    LOBE_FRESNEL_SPEC,
    LOBE_LAMBERT_REFL,
    LOBE_LAMBERT_TRANS,
    LOBE_MF_REFL,
    LOBE_MF_TRANS,
    LOBE_OREN_NAYAR,
    LOBE_SPEC_REFL,
    LOBE_SPEC_TRANS,
    LOBE_DISNEY_DIFFUSE,
    LOBE_DISNEY_FAKE_SS,
    LOBE_DISNEY_RETRO,
    LOBE_DISNEY_SHEEN,
    LOBE_DISNEY_CLEARCOAT,
    LOBE_DISNEY_MICROFACET_REFL,
    FRESNEL_DISNEY,
    DR_DIFFUSE,
    DR_DIFFUSE_THIN,
    DR_FAKE_SS,
    DR_RETRO,
    DR_SHEEN,
    DR_MF_REFL,
    DR_CLEARCOAT,
    DR_MF_TRANS,
    DR_MF_TRANS_THIN,
    DR_LAMBERT_TRANS,
)


@dataclass
class RGBParam:
    value: np.ndarray  # (3,)
    tex: int = -1  # texture id or -1

    @property
    def is_black(self):
        return self.tex < 0 and np.all(self.value == 0.0)


@dataclass
class FloatParam:
    value: float
    tex: int = -1

    @property
    def is_const(self):
        return self.tex < 0


def matte(name, kd: RGBParam, sigma: FloatParam, bump_tex=-1) -> HostMaterial:
    """matte.rs:35-61: Lambert for sigma==0 else Oren-Nayar."""
    lobes = []
    if not kd.is_black:
        if sigma.is_const and sigma.value == 0.0:
            lobes.append(Lobe(LOBE_LAMBERT_REFL, s0=kd.value, s0_tex=kd.tex))
        else:
            lobes.append(
                Lobe(
                    LOBE_OREN_NAYAR,
                    s0=kd.value,
                    s0_tex=kd.tex,
                    f0=np.clip(sigma.value, 0.0, 90.0),
                    sigma_tex=sigma.tex,
                )
            )
    return HostMaterial(name, 1.0, lobes, bump_tex)


def plastic(
    name, kd: RGBParam, ks: RGBParam, roughness: FloatParam, remap: bool, bump_tex=-1
) -> HostMaterial:
    """plastic.rs:46-77: Lambert(kd) + TR microfacet(ks, Fresnel 1.5/1.0)."""
    lobes = []
    if not kd.is_black:
        lobes.append(Lobe(LOBE_LAMBERT_REFL, s0=kd.value, s0_tex=kd.tex))
    if not ks.is_black:
        lobes.append(
            Lobe(
                LOBE_MF_REFL,
                s0=ks.value,
                s0_tex=ks.tex,
                f0=roughness.value,
                f1=roughness.value,
                f2=1.5,  # eta_i (plastic.rs:69 FresnelDielectric::new(1.5, 1.0))
                f3=1.0,  # eta_t
                rough_u_tex=roughness.tex,
                rough_v_tex=roughness.tex,
                fresnel=FRESNEL_DIELECTRIC,
                dist=DIST_TROWBRIDGE_REITZ,
                remap_roughness=remap,
                sample_visible=True,
            )
        )
    return HostMaterial(name, 1.0, lobes, bump_tex)


def metal(
    name,
    eta: RGBParam,
    k: RGBParam,
    roughness: FloatParam,
    u_roughness: Optional[FloatParam],
    v_roughness: Optional[FloatParam],
    remap: bool,
    bump_tex=-1,
) -> HostMaterial:
    """metal.rs:47-95: single TR microfacet conductor lobe, R=1."""
    ur = u_roughness if u_roughness is not None else roughness
    vr = v_roughness if v_roughness is not None else roughness
    lobe = Lobe(
        LOBE_MF_REFL,
        s0=np.ones(3),  # R = Spectrum::one()
        s1=k.value,  # conductor k
        s2=eta.value,  # conductor eta_t (eta_i = 1)
        f0=ur.value,
        f1=vr.value,
        rough_u_tex=ur.tex,
        rough_v_tex=vr.tex,
        fresnel=FRESNEL_CONDUCTOR,
        dist=DIST_TROWBRIDGE_REITZ,
        remap_roughness=remap,
        sample_visible=True,
    )
    return HostMaterial(name, 1.0, [lobe], bump_tex)


def mirror(name, kr: RGBParam, bump_tex=-1) -> HostMaterial:
    """mirror.rs:29-49: specular reflection with FresnelNoOp."""
    lobes = []
    if not kr.is_black:
        lobes.append(
            Lobe(LOBE_SPEC_REFL, s0=kr.value, s0_tex=kr.tex, fresnel=FRESNEL_NOOP)
        )
    return HostMaterial(name, 1.0, lobes, bump_tex)


def glass(
    name,
    kr: RGBParam,
    kt: RGBParam,
    u_roughness: FloatParam,
    v_roughness: FloatParam,
    eta: FloatParam,
    remap: bool,
    allow_multiple_lobes: bool,
    bump_tex=-1,
) -> HostMaterial:
    """glass.rs:52-113."""
    lobes = []
    e = eta.value
    is_specular = (
        u_roughness.is_const
        and v_roughness.is_const
        and u_roughness.value == 0.0
        and v_roughness.value == 0.0
    )
    if kr.is_black and kt.is_black:
        return HostMaterial(name, e, [], bump_tex)
    if is_specular and allow_multiple_lobes:
        lobes.append(
            Lobe(
                LOBE_FRESNEL_SPEC,
                s0=kr.value,
                s1=kt.value,
                s0_tex=kr.tex,
                f0=1.0,
                f1=e,
            )
        )
    else:
        if not kr.is_black:
            if is_specular:
                lobes.append(
                    Lobe(
                        LOBE_SPEC_REFL,
                        s0=kr.value,
                        s0_tex=kr.tex,
                        fresnel=FRESNEL_DIELECTRIC,
                        f0=1.0,
                        f1=e,
                    )
                )
            else:
                lobes.append(
                    Lobe(
                        LOBE_MF_REFL,
                        s0=kr.value,
                        s0_tex=kr.tex,
                        f0=u_roughness.value,
                        f1=v_roughness.value,
                        f2=1.0,
                        f3=e,
                        rough_u_tex=u_roughness.tex,
                        rough_v_tex=v_roughness.tex,
                        fresnel=FRESNEL_DIELECTRIC,
                        remap_roughness=remap,
                        sample_visible=True,
                    )
                )
        if not kt.is_black:
            if is_specular:
                lobes.append(
                    Lobe(LOBE_SPEC_TRANS, s0=kt.value, s0_tex=kt.tex, f0=1.0, f1=e)
                )
            else:
                lobes.append(
                    Lobe(
                        LOBE_MF_TRANS,
                        s0=kt.value,
                        s0_tex=kt.tex,
                        f0=u_roughness.value,
                        f1=v_roughness.value,
                        f2=1.0,
                        f3=e,
                        rough_u_tex=u_roughness.tex,
                        rough_v_tex=v_roughness.tex,
                        remap_roughness=remap,
                        sample_visible=True,
                    )
                )
    return HostMaterial(name, e, lobes, bump_tex)


def translucent(
    name,
    kd: RGBParam,
    ks: RGBParam,
    roughness: FloatParam,
    reflect: RGBParam,
    transmit: RGBParam,
    remap: bool,
    bump_tex=-1,
) -> HostMaterial:
    """translucent.rs:52-108; eta fixed at 1.5; products r*kd etc. are folded
    into the lobe scale (exact for constant textures; textured products
    multiply at eval)."""
    lobes = []
    e = 1.5
    if reflect.is_black and transmit.is_black:
        return HostMaterial(name, e, [], bump_tex)
    if not kd.is_black:
        if not reflect.is_black:
            lobes.append(
                Lobe(
                    LOBE_LAMBERT_REFL,
                    s0=kd.value,
                    s0_tex=kd.tex,
                    scale=reflect.value,
                    scale_tex=reflect.tex,
                )
            )
        if not transmit.is_black:
            lobes.append(
                Lobe(
                    LOBE_LAMBERT_TRANS,
                    s0=kd.value,
                    s0_tex=kd.tex,
                    scale=transmit.value,
                    scale_tex=transmit.tex,
                )
            )
    if not ks.is_black:
        if not reflect.is_black:
            lobes.append(
                Lobe(
                    LOBE_MF_REFL,
                    s0=ks.value,
                    s0_tex=ks.tex,
                    f0=roughness.value,
                    f1=roughness.value,
                    f2=1.0,
                    f3=e,
                    rough_u_tex=roughness.tex,
                    rough_v_tex=roughness.tex,
                    fresnel=FRESNEL_DIELECTRIC,
                    remap_roughness=remap,
                    sample_visible=True,
                    scale=reflect.value,
                    scale_tex=reflect.tex,
                )
            )
        if not transmit.is_black:
            lobes.append(
                Lobe(
                    LOBE_MF_TRANS,
                    s0=ks.value,
                    s0_tex=ks.tex,
                    f0=roughness.value,
                    f1=roughness.value,
                    f2=1.0,
                    f3=e,
                    rough_u_tex=roughness.tex,
                    rough_v_tex=roughness.tex,
                    remap_roughness=remap,
                    sample_visible=True,
                    scale=transmit.value,
                    scale_tex=transmit.tex,
                )
            )
    return HostMaterial(name, e, lobes, bump_tex)


def mix(name, m1: HostMaterial, m2: HostMaterial, scale: RGBParam) -> HostMaterial:
    """mixmat.rs:33-61: m1 lobes scaled by s, m2 lobes scaled by 1-s."""
    import copy

    lobes = []
    for lb in m1.lobes:
        lb = copy.deepcopy(lb)
        if scale.tex < 0:
            lb.scale = lb.scale * np.clip(scale.value, 0.0, np.inf)
        lb.scale_tex = scale.tex
        lb.scale_one_minus = False
        lobes.append(lb)
    for lb in m2.lobes:
        lb = copy.deepcopy(lb)
        if scale.tex < 0:
            lb.scale = lb.scale * np.clip(1.0 - scale.value, 0.0, np.inf)
        lb.scale_tex = scale.tex
        lb.scale_one_minus = True
        lobes.append(lb)
    return HostMaterial(name, 1.0, lobes[:8])


def debug(name) -> HostMaterial:
    """debug_material.rs:36-49: fixed green-diffuse + blue-specular lobes."""
    return HostMaterial(
        name,
        1.0,
        [
            Lobe(LOBE_DEBUG_DIFFUSE, s0=np.array([0.0, 1.0, 0.0])),
            Lobe(LOBE_DEBUG_SPECULAR, s0=np.array([0.0, 0.0, 1.0])),
        ],
    )


def disney(
    name,
    color: RGBParam,
    metallic: FloatParam,
    eta: FloatParam,
    roughness: FloatParam,
    specular_tint: FloatParam,
    anisotropic: FloatParam,
    sheen: FloatParam,
    sheen_tint: FloatParam,
    clearcoat: FloatParam,
    clearcoat_gloss: FloatParam,
    spec_trans: FloatParam,
    scatter_distance: RGBParam,
    thin: bool,
    flatness: FloatParam,
    diff_trans: FloatParam,
    bump_tex=-1,
) -> HostMaterial:
    """Disney BSDF lobe assembly (disney.rs:530-676).

    Constant params bake the lobe weights at load; any *textured* param
    switches the material to the per-hit assembly path (a canonical slot
    layout whose weights and gates eval._assemble_disney_textured
    recomputes on device from the textured base params, matching the
    reference's per-hit texture evaluation).  scatter_distance > 0
    (non-thin, constant — a textured scatter_distance is treated as its
    zero fallback) marks the material for BSSRDF handling
    (disney.rs:585-601): the diffuse lobe is replaced by a specular
    transmission lobe and the material carries the BSSRDF profile params.
    """
    base_params = (
        color, metallic, eta, roughness, specular_tint, anisotropic,
        sheen, sheen_tint, clearcoat, clearcoat_gloss, spec_trans,
        flatness, diff_trans,
    )
    sd_const = np.clip(scatter_distance.value, 0.0, np.inf)
    bssrdf_marked = (not thin) and scatter_distance.tex < 0 and np.any(sd_const > 0.0)
    if any(p is not None and p.tex >= 0 for p in base_params) and not bssrdf_marked:
        return _disney_textured(name, base_params, thin, bump_tex)
    lobes = []
    c = np.clip(color.value, 0.0, np.inf)
    mw = metallic.value
    e = eta.value
    strans = spec_trans.value
    dt = diff_trans.value
    # NOTE: diff_trans defaults to 1.0 in the loader (renderprocess.rs:836);
    # the Burley convention divides usage by 2 only for thin surfaces.
    diffuse_weight = (1.0 - mw) * (1.0 - strans)
    rough = roughness.value
    lum = float(0.212671 * c[0] + 0.715160 * c[1] + 0.072169 * c[2])
    c_tint = c / lum if lum > 0 else np.ones(3)
    sheen_w = sheen.value
    c_sheen = (
        (1.0 - sheen_tint.value) * np.ones(3) + sheen_tint.value * c_tint
        if sheen_w > 0
        else np.zeros(3)
    )
    sd = np.clip(scatter_distance.value, 0.0, np.inf)
    has_bssrdf = (not thin) and np.any(sd > 0.0)

    if diffuse_weight > 0:
        if thin:
            flat = flatness.value
            lobes.append(
                Lobe(LOBE_DISNEY_DIFFUSE, s0=c * diffuse_weight * (1 - flat) * (1 - dt))
            )
            lobes.append(
                Lobe(
                    LOBE_DISNEY_FAKE_SS,
                    s0=c * diffuse_weight * flat * (1 - dt),
                    f0=rough,
                )
            )
        elif has_bssrdf:
            lobes.append(Lobe(LOBE_SPEC_TRANS, s0=np.ones(3), f0=1.0, f1=e))
        else:
            lobes.append(Lobe(LOBE_DISNEY_DIFFUSE, s0=c * diffuse_weight))
        lobes.append(Lobe(LOBE_DISNEY_RETRO, s0=c * diffuse_weight, f0=rough))
        if sheen_w > 0:
            lobes.append(
                Lobe(LOBE_DISNEY_SHEEN, s0=c_sheen * sheen_w * diffuse_weight)
            )

    aspect = np.sqrt(1.0 - anisotropic.value * 0.9)
    ax = max(rough**2 / aspect, 0.001)
    ay = max(rough**2 * aspect, 0.001)
    st = specular_tint.value
    r0_eta = ((e - 1.0) / (e + 1.0)) ** 2
    c_spec0 = (1.0 - mw) * (
        ((1.0 - st) * np.ones(3) + st * c_tint) * r0_eta
    ) + mw * c
    lobes.append(
        Lobe(
            LOBE_DISNEY_MICROFACET_REFL,
            s0=np.ones(3),
            s1=c_spec0,
            f0=ax,
            f1=ay,
            f2=mw,  # metallic for DisneyFresnel
            f3=e,
            fresnel=FRESNEL_DISNEY,
            dist=DIST_DISNEY_SEPARABLE_G,
            sample_visible=True,
        )
    )
    cc = clearcoat.value
    if cc > 0:
        gloss = (1.0 - clearcoat_gloss.value) * 0.1 + clearcoat_gloss.value * 0.001
        lobes.append(Lobe(LOBE_DISNEY_CLEARCOAT, f0=cc, f1=gloss))
    if strans > 0:
        t = np.sqrt(np.maximum(c, 0.0)) * strans
        if thin:
            rs = (0.65 * e - 0.35) * rough
            axs = max(rs**2 / aspect, 0.001)
            ays = max(rs**2 * aspect, 0.001)
            lobes.append(
                Lobe(
                    LOBE_MF_TRANS,
                    s0=t,
                    f0=axs,
                    f1=ays,
                    f2=1.0,
                    f3=e,
                    dist=DIST_TROWBRIDGE_REITZ,
                    sample_visible=True,
                )
            )
        else:
            lobes.append(
                Lobe(
                    LOBE_MF_TRANS,
                    s0=t,
                    f0=ax,
                    f1=ay,
                    f2=1.0,
                    f3=e,
                    dist=DIST_DISNEY_SEPARABLE_G,
                    sample_visible=True,
                )
            )
    if thin:
        lobes.append(Lobe(LOBE_LAMBERT_TRANS, s0=c * dt))
    mat = HostMaterial(name, 1.0, lobes, bump_tex)
    mat.bssrdf_R = c * diffuse_weight if has_bssrdf else None
    mat.bssrdf_d = sd * 0.2 if has_bssrdf else None
    mat.bssrdf_eta = e
    return mat


def _disney_textured(name, base_params, thin, bump_tex) -> HostMaterial:
    """Textured-parameter Disney: a canonical lobe slot layout whose
    numeric params are recomputed per hit by eval._assemble_disney_textured
    from the textured base values (disney.rs:530-676 per-hit assembly).

    Slot order matches the reference's bsdf.add order exactly — lobe
    selection in sample_f walks matching lobes in slot order, so the
    canonical layout preserves the estimator when per-hit gates disable
    slots (equivalent to the reference simply not adding them)."""
    if thin:
        lobes = [
            Lobe(LOBE_DISNEY_DIFFUSE),
            Lobe(LOBE_DISNEY_FAKE_SS),
            Lobe(LOBE_DISNEY_RETRO),
            Lobe(LOBE_DISNEY_SHEEN),
            Lobe(
                LOBE_DISNEY_MICROFACET_REFL,
                s0=np.ones(3),
                fresnel=FRESNEL_DISNEY,
                dist=DIST_DISNEY_SEPARABLE_G,
                sample_visible=True,
            ),
            Lobe(LOBE_DISNEY_CLEARCOAT),
            Lobe(
                LOBE_MF_TRANS,
                f2=1.0,
                dist=DIST_TROWBRIDGE_REITZ,
                sample_visible=True,
            ),
            Lobe(LOBE_LAMBERT_TRANS),
        ]
        roles = [
            DR_DIFFUSE_THIN, DR_FAKE_SS, DR_RETRO, DR_SHEEN,
            DR_MF_REFL, DR_CLEARCOAT, DR_MF_TRANS_THIN, DR_LAMBERT_TRANS,
        ]
    else:
        lobes = [
            Lobe(LOBE_DISNEY_DIFFUSE),
            Lobe(LOBE_DISNEY_RETRO),
            Lobe(LOBE_DISNEY_SHEEN),
            Lobe(
                LOBE_DISNEY_MICROFACET_REFL,
                s0=np.ones(3),
                fresnel=FRESNEL_DISNEY,
                dist=DIST_DISNEY_SEPARABLE_G,
                sample_visible=True,
            ),
            Lobe(LOBE_DISNEY_CLEARCOAT),
            Lobe(
                LOBE_MF_TRANS,
                f2=1.0,
                dist=DIST_DISNEY_SEPARABLE_G,
                sample_visible=True,
            ),
        ]
        roles = [
            DR_DIFFUSE, DR_RETRO, DR_SHEEN,
            DR_MF_REFL, DR_CLEARCOAT, DR_MF_TRANS,
        ]
    base_const = np.zeros((13, 3), np.float32)
    base_tex = np.full((13,), -1, np.int32)
    for i, p in enumerate(base_params):
        v = np.asarray(p.value, np.float64) * np.ones(3)
        base_const[i] = v
        base_tex[i] = p.tex
    mat = HostMaterial(name, 1.0, lobes, bump_tex)
    mat.disney_roles = roles
    mat.disney_base_const = base_const
    mat.disney_base_tex = base_tex
    return mat
