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
