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
  - triangle geometry only (<= MEGA_BVH_TRI_MAX; brute-force fori up to
    TRI_MAX, in-kernel packet BVH traversal above — leaf-ordered narrow
    table + fused-children nodes + SMEM stack, ops/bvh_pallas semantics),
  - flat OR smooth (interpolated vertex-normal) shading: smooth meshes
    carry n0/n1/n2 in the triangle table and the kernel rebuilds the
    winner's barycentrics to interpolate ns exactly as
    accel/geometry.surface_interaction (triangle.rs:301+),
  - untextured materials over the supported lobe set: lambert, TR
    microfacet, specular reflection/transmission/fresnel, and the
    Disney scatter_distance stack (SPEC_TRANS + DISNEY_RETRO +
    DISNEY_MICROFACET_REFL with the reference's non-reflective-chosen
    pdf accumulation, reflection.rs:358-364),
  - point lights (delta NEE), sphere-area lights (MIS NEE), or one
    constant-environment light,
  - the Burley BSSRDF for single-material scenes (probe chain + Sw
    adapter fused, path.rs:166-210 / bssrdf.rs:107-232),
  - no participating media (the volpath kernel covers homogeneous fog),
  - path integrator without ray differentials.
Everything else falls back to the general jnp wavefront loop.  The
estimator is IDENTICAL to integrators/path.py (same sample dims, same
frame construction from baked dpdu, same RR; path.rs:51-226 semantics) —
tests compare the two per-ray radiance outputs directly.

Scene tables are baked per *triangle* (the material table collapses:
kd = packed_f[tri.mat, 0, 0:3]), so shading needs no indirection at all.
"""

import collections
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh_pallas import STACK_DEPTH, _inv_dir, _slab6

from ..config import DTYPE, PI, ONE_MINUS_EPSILON, SHADOW_EPSILON
from ..scene.types import (
    AREA_SHAPE_SPHERE,
    LIGHT_DIFFUSE_AREA,
    LIGHT_INFINITE,
    LIGHT_POINT,
)
from ..bsdf.lobes import (
    LOBE_LAMBERT_REFL,
    LOBE_MF_REFL,
    LOBE_SPEC_REFL,
    LOBE_SPEC_TRANS,
    LOBE_FRESNEL_SPEC,
    LOBE_DISNEY_DIFFUSE,
    LOBE_DISNEY_RETRO,
    LOBE_DISNEY_SHEEN,
    LOBE_DISNEY_CLEARCOAT,
    LOBE_DISNEY_MICROFACET_REFL,
    DIST_TROWBRIDGE_REITZ,
    DIST_DISNEY_SEPARABLE_G,
    FRESNEL_DIELECTRIC,
    FRESNEL_CONDUCTOR,
    FRESNEL_DISNEY,
)

# microfacet-shaped lobe kinds: DISNEY_MICROFACET_REFL shares the TR
# visible-normal machinery with MF_REFL (separable Smith G + Disney
# fresnel, disney.rs); cosine-shaped diffuse kinds share lambert's
MF_KINDS = (LOBE_MF_REFL, LOBE_DISNEY_MICROFACET_REFL)
COS_KINDS = (
    LOBE_LAMBERT_REFL,
    LOBE_DISNEY_DIFFUSE,
    LOBE_DISNEY_RETRO,
    LOBE_DISNEY_SHEEN,
)

SPEC_KINDS = (LOBE_SPEC_REFL, LOBE_SPEC_TRANS, LOBE_FRESNEL_SPEC)

TRI_EPS = 1e-7
LANES = 128
TILE_ROWS = 128
TRI_MAX = 2048
# scenes above TRI_MAX up to this bound run the SAME fused bounce loop
# with packet BVH traversal replacing the brute-force triangle fori: a
# leaf-ordered narrow table (9 intersect cols + the statically-needed
# attr cols) plus the fused-children node rows fit VMEM well past 10^4
# tris (~19 cols * 4 B/tri for lambert scenes)
MEGA_BVH_TRI_MAX = 65536
# BVH-mode ray tile: smaller packets keep the per-packet node union
# tight (same tradeoff as ops/bvh_pallas.TILE_ROWS); 128-row tiles would
# make every bounce traverse the union of 16K rays' node sets
BVH_TILE_ROWS = int(os.environ.get("RS_MEGA_TILE_ROWS", "32"))
SPH_MAX = 8
LOBES_MAX = 5
NRM_COL = 16 + 16 * LOBES_MAX  # vertex-normal block (smooth shading)
TEX0 = NRM_COL + 9  # textured block: dpdv(3), uv0/uv1/uv2(6), tex id(1)
LIGHT_MAX = 8
DEPTH_MAX = 15

PI_OVER_2 = PI / 2.0
PI_OVER_4 = PI / 4.0

# static (hashable) scene payloads for the widened subset: spheres, area/
# env lights, and escape radiance ride into the kernel as jit-static
# nested tuples — everything is a compile-time constant, so Mosaic sees
# plain float immediates and the point-light/triangle-only specialization
# compiles to exactly the round-2 program.
LobeC = collections.namedtuple(
    "LobeC", "kind s0 s1 s2 au av fres eta_a eta_b"
)
SphereC = collections.namedtuple(
    "SphereC", "w2o o2w radius n_lobes mat_eta lobes"
)  # w2o: 12 floats (3x4 rows), o2w: 12 floats
EnvC = collections.namedtuple(
    "EnvC",
    # constant-radiance environment light (lights/infinite.rs with a
    # spatially uniform map): rgb texel; the Distribution2D collapses to
    # its sin-weighted marginal (conditional rows are uniform)
    "rgb marg_cdf marg_pdf cond_cdf pdf2d_bins cos_bins nu nv "
    "to_world to_local",
)
LightC = collections.namedtuple("LightC", "kind p emit o2w w2o radius env")
# tex: TexC static payload (ops/tex_tile.py) when a lambert kd rides an
# imagemap — the packed pyramid TABLE is a kernel input, not static
SceneStatic = collections.namedtuple(
    "SceneStatic",
    "spheres lights esc_rgb world_radius bssrdf smooth tex chunks",
    defaults=(None, False, None, None),
)
# single-material Burley BSSRDF constants (bssrdf.rs / disney.rs):
# R/d 3-tuples, eta, and the host-precomputed Sw normalization
# c = 1 - 2*fresnel_moment1(1/eta)
BssrdfC = collections.namedtuple("BssrdfC", "R d eta c_sw")
PROBE_SEGMENTS = 4  # bsdf/bssrdf.py bounded probe chain


def _pow2(n):
    return n > 0 and (n & (n - 1)) == 0


def _full_spheres(sph):
    """True when every sphere is unclipped (no z/phi partial clips —
    sphere.rs:50-108's clip tests are vacuous)."""
    if int(sph.count) == 0:
        return True
    r = np.asarray(sph.radius)
    return bool(
        np.all(np.asarray(sph.z_min) <= -r + 1e-6 * r)
        and np.all(np.asarray(sph.z_max) >= r - 1e-6 * r)
        and np.all(np.asarray(sph.phi_max) >= 2.0 * np.pi - 1e-6)
    )


def _mesh_smooth(tri):
    """Host predicate: does any triangle carry vertex normals that differ
    in DIRECTION from its face normal (smooth shading)?  The jnp path
    interpolates ns per hit and renormalizes (accel/geometry.py:255-262);
    parallel-but-unnormalized or antiparallel vn count as smooth too —
    interpolation reproduces them exactly either way."""
    if int(tri.count) == 0:
        return False
    has_n = np.asarray(tri.has_n).astype(bool)
    if not has_n.any():
        return False
    ng = np.asarray(tri.ng)[has_n]
    for vn in (tri.n0, tri.n1, tri.n2):
        v = np.asarray(vn)[has_n]
        nrm = np.linalg.norm(v, axis=-1, keepdims=True)
        unit = v / np.maximum(nrm, 1e-20)
        if np.any((nrm[..., 0] > 0) & (np.abs(unit - ng).max(-1) > 1e-5)):
            return True
    return False


def _env_constant_rgb(env):
    """The env map's constant texel, or None if it varies spatially."""
    from ..scene.mipmap import _BORDER as _B

    data = np.asarray(env["mipmap"]["data"])  # (L, Hp, Wp*C) bordered
    c = int(env["mipmap"]["channels"])
    h, w = (int(v) for v in np.asarray(env["mipmap"]["dims"])[0])
    base = data[0, _B : _B + h, _B * c : (_B + w) * c].reshape(h, w, c)
    if not np.all(base == base[:1, :1]):
        return None
    return tuple(float(v) for v in base[0, 0])


def common_scene_checks(
    ctx,
    sampler,
    allow_spheres=False,
    light_kinds=(LIGHT_POINT,),
    allow_env=False,
    tri_max=TRI_MAX,
    allow_media=False,
    allow_bssrdf=False,
    allow_halton=False,
    allow_smooth=False,
    allow_textured=False,
):
    """Host gates shared by BOTH megakernels (path + direct): RGB only,
    in-VMEM stratified sampler, VMEM-resident scene with flat (or, for
    opted-in kernels, smooth interpolated) shading normals, no media,
    untextured/unbumped/unscaled materials on the quirk-exact estimator.
    The path kernel opts into full spheres, sphere-area lights,
    constant-environment lights, and smooth vertex normals; the direct
    kernel keeps the round-2 point-lit triangle subset.

    Returns (kinds, n_lobes, live, used) or None when unsupported."""
    if getattr(ctx, "n_channels", 3) != 3:
        return None  # spectral scenes use the jnp path
    # the kernels evaluate the stratified sampler in-VMEM; its permutation
    # needs power-of-two strata (integer div/mod by non-constants does not
    # lower to Mosaic)
    from ..sampler.stratified import StratifiedSampler
    from ..sampler.halton import HaltonSampler

    if sampler is not None:
        if isinstance(sampler, StratifiedSampler):
            if not (
                _pow2(sampler.spp) and _pow2(sampler.xs) and _pow2(sampler.ys)
            ):
                return None
        elif allow_halton and isinstance(sampler, HaltonSampler):
            # Halton slot values ride into the kernel as an input matrix
            # (_sampler_payload) — no in-kernel constraint at all
            pass
        else:
            return None
    n_sph = int(ctx.sph.count)
    if allow_spheres:
        if n_sph > SPH_MAX or not _full_spheres(ctx.sph):
            return None
    elif n_sph != 0:
        return None
    n_tri = int(ctx.tri.count)
    if n_tri > tri_max or n_tri + n_sph == 0:
        return None
    # smooth shading (vertex normals differing in DIRECTION from the face
    # normal) is an opt-in: the path kernel interpolates ns in-kernel;
    # the direct/volpath/SPPM kernels still shade ns == ng and reject.
    # Flat-but-unnormalized or zero-length vn shade flat in the jnp path
    # (accel/geometry.py:255-262) and stay in the flat subset here.
    if n_tri > 0 and not allow_smooth and _mesh_smooth(ctx.tri):
        return None
    if ctx.mediums is not None and not allow_media:
        # media handled only by the volpath kernel (its supports gate
        # pins the single-homogeneous-camera-medium subset)
        return None
    if ctx.infinite_envs:
        if not allow_env:
            return None
        # the kernel embeds env radiance / CDFs as static constants:
        # spatially constant maps only (the furnace / uniform-sky family)
        if any(_env_constant_rgb(env) is None for env in ctx.infinite_envs):
            return None
    mats = ctx.mats
    kinds = np.asarray(mats["kind"])
    n_lobes = np.asarray(mats["n_lobes"])
    # only materials actually referenced by a primitive constrain the kernel
    prim_mats = [np.asarray(ctx.tri.mat), np.asarray(ctx.sph.mat)]
    prim_mat = np.concatenate([m for m in prim_mats if m.size]) if any(
        m.size for m in prim_mats
    ) else np.zeros(0, np.int64)
    used = np.unique(prim_mat[prim_mat >= 0])
    if used.size == 0:
        return None
    live = np.zeros_like(kinds, bool)
    for i in used:
        live[i, : int(n_lobes[i])] = True
    # microfacet lobes: TR distribution with visible-normal sampling and
    # dielectric/conductor/noop fresnel only (plastic.rs / metal.rs)
    is_mf = live & (kinds == LOBE_MF_REFL)
    if np.any(np.asarray(mats["dist"])[is_mf] != DIST_TROWBRIDGE_REITZ):
        return None
    if np.any(~np.asarray(mats["sample_visible"])[is_mf]):
        return None
    fres = np.asarray(mats["fresnel"])
    if np.any((fres[is_mf] < 0) | (fres[is_mf] > 2)):
        return None
    is_sr = live & (kinds == LOBE_SPEC_REFL)
    if np.any((fres[is_sr] < 0) | (fres[is_sr] > 2)):
        return None
    from ..bsdf.eval import REFERENCE_QUIRKS

    if not REFERENCE_QUIRKS:
        return None  # kernels implement the quirk-exact estimator only
    if not allow_bssrdf and np.any(np.asarray(mats["has_bssrdf"])[used]):
        return None
    if np.any(np.asarray(mats["bump_tex"])[used] >= 0):
        return None
    pi_ = np.asarray(mats["packed_i"])  # tex ids live in cols 6..10
    if np.any(pi_[..., 7:11][live] >= 0):
        return None  # rough/sigma/scale textures: jnp path only
    if np.any(np.asarray(mats["is_disney_tex"])[used]):
        return None  # per-hit Disney texture assembly: jnp path only
    s0t = pi_[..., 6]
    if np.any((s0t >= 0) & live):
        if not allow_textured:
            return None
        # textured kd: single-lobe lambert matte whose s0 rides an
        # imagemap (matte.rs:35-61); the record/image subset is
        # validated by _textured_static
        tex_lobes = (s0t >= 0) & live
        if np.any(tex_lobes & (kinds != LOBE_LAMBERT_REFL)):
            return None
        if np.any(tex_lobes[:, 1:]):
            return None  # textured lobe must be the only lobe
        if np.any(tex_lobes[:, 0] & (n_lobes != 1)):
            return None
        if np.asarray(ctx.sph.mat).size and np.any(
            tex_lobes[np.maximum(np.asarray(ctx.sph.mat), 0), 0]
            & (np.asarray(ctx.sph.mat) >= 0)
        ):
            return None  # textured sphere materials: no uv in-kernel
    # scale must be the identity (no ScaleTexture wrapping)
    if np.any(np.abs(np.asarray(mats["scale"])[live] - 1.0) > 0):
        return None
    lk = np.asarray(ctx.lights.kind)
    if lk.size > LIGHT_MAX or np.any(~np.isin(lk, light_kinds)):
        return None
    if lk.size == 0 and not (allow_env and ctx.infinite_envs):
        return None  # unlit scenes render black either way; keep jnp
    if np.any(lk == LIGHT_DIFFUSE_AREA):
        # area lights: sphere shapes only (the sample_li warp embedded in
        # the kernel is uniform_sample_sphere; triangle area lights fall
        # back to the jnp loop)
        sk = np.asarray(ctx.lights.shape_kind)
        if np.any((lk == LIGHT_DIFFUSE_AREA) & (sk != AREA_SHAPE_SPHERE)):
            return None
    n_env_lights = int(np.sum(lk == LIGHT_INFINITE))
    if n_env_lights > 1:
        return None  # one sampleable env light (merging >1 static CDF
        # payload per lane is not worth the compile-time)
    if n_env_lights:
        # estimate_direct's BSDF-counter branch samples with
        # ALL & ~SPECULAR flags; the kernel reuses its ALL-flags sample
        # machinery, exact only when no specular lobe is live
        is_spec = np.zeros_like(kinds, bool)
        for sk_ in SPEC_KINDS:
            is_spec |= kinds == sk_
        if np.any(is_spec & live):
            return None
    return kinds, n_lobes, live, used


def _textured_static(ctx):
    """The one textured-kd record/image this kernel can evaluate, or None.

    Subset (beyond common_scene_checks' lobe gates): exactly ONE distinct
    imagemap, TEX_IMAGE kind with MAP_UV mapping, RGB texels, EWA
    filtering (do_trilinear False — the imagemap default,
    renderprocess.rs:522), and a packed coarse pyramid <= 256 texels wide
    (the planar one-hot table; scene/mipmap.py MIPMap.as_packed).
    Returns (record, image, packed, record_id)."""
    from ..scene.textures import MAP_UV, TEX_IMAGE

    mats = ctx.mats
    s0t = np.asarray(mats["packed_i"])[..., 6]
    n_lobes = np.asarray(mats["n_lobes"])
    prim_mats = [np.asarray(ctx.tri.mat), np.asarray(ctx.sph.mat)]
    prim_mat = np.concatenate([m for m in prim_mats if m.size]) if any(
        m.size for m in prim_mats
    ) else np.zeros(0, np.int64)
    used = np.unique(prim_mat[prim_mat >= 0])
    live = np.zeros_like(s0t, bool)
    for i in used:
        live[i, : int(n_lobes[i])] = True
    ids = np.unique(s0t[live & (s0t >= 0)])
    if ids.size != 1:
        return None
    tid = int(ids[0])
    rec = ctx.registry.records[tid]
    if rec.kind != TEX_IMAGE or rec.mapping != MAP_UV:
        return None
    image = ctx.registry.images[rec.image_id]
    if image.do_trilinear:
        return None
    dev = ctx.dev_images[rec.image_id]
    pk = dev.get("packed")
    if pk is None or int(pk["channels"]) != 3 or int(pk["wmax"]) > 256:
        return None
    return rec, image, pk, tid


def supports(ctx, spec, sampler, diff) -> bool:
    """Static host check: can the path megakernel render this job exactly?"""
    if spec.kind != "path" or diff is not None:
        return False
    if spec.max_depth > DEPTH_MAX:
        return False
    # scenes past the brute-force bound run the in-kernel packet BVH
    # (RS_MEGA_BVH=0 disables, restoring the round-2 jnp fallback)
    tri_max = (
        TRI_MAX
        if os.environ.get("RS_MEGA_BVH", "1") == "0"
        else MEGA_BVH_TRI_MAX
    )
    common = common_scene_checks(
        ctx,
        sampler,
        allow_spheres=True,
        light_kinds=(LIGHT_POINT, LIGHT_DIFFUSE_AREA, LIGHT_INFINITE),
        allow_env=True,
        tri_max=tri_max,
        allow_bssrdf=True,
        allow_halton=True,
        allow_smooth=True,
        allow_textured=True,
    )
    if common is None:
        return False
    kinds, n_lobes, live, used = common
    if np.any((np.asarray(ctx.mats["packed_i"])[..., 6] >= 0) & live):
        # textured kd: the kernel computes camera-FD duv at the primary
        # hit and dead differentials after (the jnp packed path's exact
        # behavior only when no specular chain propagates footprints) —
        # lambert-only scenes, and the record subset must validate
        if any(k != LOBE_LAMBERT_REFL for k in np.unique(kinds[live])):
            return False
        if _textured_static(ctx) is None:
            return False
    if np.any(n_lobes[used] > LOBES_MAX):
        return False
    if np.any(np.asarray(ctx.mats["has_bssrdf"])[used]):
        # BSSRDF flow (path.rs:166-210 in-kernel): one used material
        # (probe same-material test collapses to hit-found), point
        # lights only (delta exit NEE), triangles only, no envs
        if used.size != 1:
            return False
        lk = np.asarray(ctx.lights.kind)
        if lk.size == 0 or np.any(lk != LIGHT_POINT):
            return False
        if ctx.infinite_envs or int(ctx.sph.count) != 0:
            return False
        if _mesh_smooth(ctx.tri):
            # the in-kernel probe chain builds its projection frame from
            # the flat geometric normal; keep the jnp path for smooth
            # subsurface meshes
            return False
    ok_kinds = (kinds == LOBE_LAMBERT_REFL) | (kinds == LOBE_MF_REFL)
    for dk in (
        LOBE_DISNEY_DIFFUSE,
        LOBE_DISNEY_RETRO,
        LOBE_DISNEY_SHEEN,
        LOBE_DISNEY_CLEARCOAT,
        LOBE_DISNEY_MICROFACET_REFL,
    ):
        ok_kinds |= kinds == dk
    for sk in SPEC_KINDS:
        ok_kinds |= kinds == sk
    if np.any(~ok_kinds[live]):
        return False
    # Disney microfacet: separable-Smith-G TR with the Disney fresnel and
    # visible-normal sampling (disney.rs) — anything else falls back
    is_dmf = live & (kinds == LOBE_DISNEY_MICROFACET_REFL)
    if np.any(np.asarray(ctx.mats["dist"])[is_dmf] != DIST_DISNEY_SEPARABLE_G):
        return False
    if np.any(np.asarray(ctx.mats["fresnel"])[is_dmf] != FRESNEL_DISNEY):
        return False
    if np.any(~np.asarray(ctx.mats["sample_visible"])[is_dmf]):
        return False
    # SPEC_TRANS may now share a stack: _bsdf_sample_k implements the
    # reference's non-reflective-chosen pdf accumulation
    # (reflection.rs:358-364).  FRESNEL_SPEC stacks stay single-lobe
    # (untested composition).
    is_fs_lobe = kinds == LOBE_FRESNEL_SPEC
    if np.any(is_fs_lobe & live & (n_lobes[:, None] > 1)):
        return False
    return True


def _np_rough_to_alpha(r):
    r = np.maximum(r, 1e-3)
    x = np.log(r)
    return (
        1.62142 + 0.819955 * x + 0.1734 * x * x
        + 0.0171201 * x**3 + 0.000640711 * x**4
    )


def _resolve_mat_arrays(m, mat):
    """Per-primitive material constants (mat: (P,) loader ids, -1 = none).
    Collapses the material indirection: kind/s0/s1/s2/alpha(post-remap)/
    fresnel/eta columns per lobe, n_lobes, Bsdf eta."""
    safe_mat = np.maximum(mat, 0)
    kinds = np.asarray(m["kind"])[safe_mat]          # (P, L)
    s0 = np.asarray(m["s0"])[safe_mat]               # (P, L, 3)
    s1 = np.asarray(m["s1"])[safe_mat]
    s2 = np.asarray(m["s2"])[safe_mat]
    fp = np.asarray(m["fparams"])[safe_mat]          # (P, L, 4)
    fres = np.asarray(m["fresnel"])[safe_mat]
    remap = np.asarray(m["remap"])[safe_mat]
    n_lobes = np.asarray(m["n_lobes"])[safe_mat] * (mat >= 0)
    au = np.where(remap, _np_rough_to_alpha(fp[..., 0]), fp[..., 0])
    av = np.where(remap, _np_rough_to_alpha(fp[..., 1]), fp[..., 1])
    # specular lobes store their eta pair in f0/f1 (bsdf_sample's
    # spec_eta_a/b); normalize to the kernel's eta_a/eta_b columns
    is_spec = np.zeros(kinds.shape, bool)
    for sk in SPEC_KINDS:
        is_spec |= kinds == sk
    ea = np.where(is_spec, fp[..., 0], fp[..., 2])
    eb = np.where(is_spec, fp[..., 1], fp[..., 3])
    mat_eta = np.asarray(m["eta"])[safe_mat]  # Bsdf eta for etaScale RR
    return dict(
        kinds=kinds, s0=s0, s1=s1, s2=s2, au=au, av=av, fres=fres,
        ea=ea, eb=eb, n_lobes=n_lobes, mat_eta=mat_eta,
    )


def _t3(row):
    return tuple(float(v) for v in np.asarray(row, np.float32))


def _rows12(m4):
    """4x4 host matrix -> 12-float (3x4 row-major) tuple."""
    return tuple(float(v) for v in np.asarray(m4, np.float32)[:3, :4].ravel())


def _pack_spheres_static(ctx):
    """SphereC tuple: full spheres as compile-time constants (transform
    rows + the resolved lobe stack; sphere.rs:50-108 geometry)."""
    sph = ctx.sph
    if int(sph.count) == 0:
        return ()
    r = _resolve_mat_arrays(ctx.mats, np.asarray(sph.mat))
    out = []
    for s in range(int(sph.count)):
        lobes = []
        for l in range(min(LOBES_MAX, r["kinds"].shape[1])):
            lobes.append(
                LobeC(
                    kind=int(r["kinds"][s, l]),
                    s0=_t3(r["s0"][s, l]),
                    s1=_t3(r["s1"][s, l]),
                    s2=_t3(r["s2"][s, l]),
                    au=float(np.float32(r["au"][s, l])),
                    av=float(np.float32(r["av"][s, l])),
                    fres=int(r["fres"][s, l]),
                    eta_a=float(np.float32(r["ea"][s, l])),
                    eta_b=float(np.float32(r["eb"][s, l])),
                )
            )
        out.append(
            SphereC(
                w2o=_rows12(np.asarray(sph.w2o)[s]),
                o2w=_rows12(np.asarray(sph.o2w)[s]),
                radius=float(np.float32(np.asarray(sph.radius)[s])),
                n_lobes=int(r["n_lobes"][s]),
                mat_eta=float(np.float32(r["mat_eta"][s])),
                lobes=tuple(lobes),
            )
        )
    return tuple(out)


def _pack_env_static(env):
    """EnvC for a constant-radiance environment: the radiance texel plus
    the Distribution2D collapsed to static f32 constants.  All values are
    read from the same device arrays the jnp path samples, so the kernel's
    unrolled CDF scan reproduces sample_continuous_2d / pdf_2d bit-for-bit
    (lights/infinite.rs:140-186, sampling.rs:157-177)."""
    rgb = _env_constant_rgb(env)
    dist = env["dist"]
    marg = dist["marginal"]
    marg_cdf = np.asarray(marg["cdf"], np.float32)
    marg_func = np.asarray(marg["func"], np.float32)
    marg_int = np.float32(np.asarray(marg["func_int"]))
    nv = marg_func.shape[0]
    nu = np.asarray(dist["cond_func"]).shape[1]
    cond_cdf = np.asarray(dist["cond_cdf"], np.float32)
    cond_func = np.asarray(dist["cond_func"], np.float32)
    cond_int = np.asarray(dist["cond_int"], np.float32)
    # constant map => all conditional rows identical (checked, not assumed)
    assert np.all(cond_cdf == cond_cdf[0]) and np.all(
        cond_func == cond_func[:, :1]
    ), "constant env with varying conditional rows"
    # per-v-row pdfs, divided in f32 exactly as the jnp lookups do
    marg_pdf = tuple(
        float(v) for v in np.where(marg_int > 0, marg_func / marg_int, 0.0)
    )
    pdf2d = tuple(
        float(v)
        for v in np.where(marg_int > 0, cond_func[:, 0] / marg_int, 0.0)
    )
    # theta-bin thresholds for pdf_li's iv = floor(theta/pi * nv) without
    # an in-kernel arccos: iv = #{k in 1..nv-1 : w_z <= cos(k*pi/nv)}
    cos_bins = tuple(
        float(np.cos(np.pi * k / nv)) for k in range(1, nv)
    )
    return EnvC(
        rgb=rgb,
        marg_cdf=tuple(float(v) for v in marg_cdf),
        marg_pdf=marg_pdf,
        cond_cdf=tuple(float(v) for v in cond_cdf[0]),
        pdf2d_bins=pdf2d,
        cos_bins=cos_bins,
        nu=int(nu),
        nv=int(nv),
        to_world=tuple(
            float(v) for v in np.asarray(env["to_world"], np.float32)[:3, :3].ravel()
        ),
        to_local=tuple(
            float(v) for v in np.asarray(env["to_local"], np.float32)[:3, :3].ravel()
        ),
    )


def _pack_lights_static(ctx):
    """LightC tuple + summed escape radiance (path.rs:84-87 reads
    scene.infinite_lights; NEE reads scene.lights — two separate lists)."""
    lt = ctx.lights
    lights = []
    for i in range(int(lt.count)):
        kind = int(np.asarray(lt.kind)[i])
        env = None
        o2w = w2o = None
        radius = 1.0
        if kind == LIGHT_DIFFUSE_AREA:
            o2w = _rows12(np.asarray(lt.sph_o2w)[i])
            w2o = _rows12(np.asarray(lt.sph_w2o)[i])
            radius = float(np.float32(np.asarray(lt.sph_radius)[i]))
        elif kind == LIGHT_INFINITE:
            env_id = int(np.asarray(lt.shape_index)[i])
            env = _pack_env_static(ctx.infinite_envs[env_id])
        lights.append(
            LightC(
                kind=kind,
                p=_t3(np.asarray(lt.p)[i]),
                emit=_t3(np.asarray(lt.emit)[i]),
                o2w=o2w,
                w2o=w2o,
                radius=radius,
                env=env,
            )
        )
    esc = None
    esc_envs = [e for e in ctx.infinite_envs if e.get("escape_le", False)]
    if esc_envs:
        total = np.zeros(3, np.float32)
        for e in esc_envs:
            total = total + np.asarray(_env_constant_rgb(e), np.float32)
        esc = tuple(float(v) for v in total)
    return tuple(lights), esc


def pack_scene(ctx, allow_bvh=True, with_mat_col=False):
    """Per-triangle (T, 48) table: geometry + the material's lobe stack
    pre-resolved (material indirection collapsed at pack time).
    with_mat_col: carry the material id in lobe-1's pad column (col 47,
    sppm_megakernel.MAT_COL) through any BVH leaf reorder — the SPPM
    kernels emit it so the deposit can resolve VP BSDFs.

    cols 0:15  p0, e1, e2, ng, dpdu
    col  15    n_lobes
    cols 16+16*l  per lobe l: kind, s0(3), s1(3), s2(3), alpha_u, alpha_v,
                  fresnel, eta_a, eta_b, pad
    cols NRM_COL:NRM_COL+9  raw (unnormalized, baked) vertex normals
                  n0, n1, n2 — read only by smooth-shading kernels
    alpha is post-remap (roughness_to_alpha applied host-side when the
    lobe's remap flag is set — exact for untextured roughness).

    Returns (table, lights_p, lights_emit, kinds_present, max_lobes, wide)
    where `wide` is the SceneStatic payload for the round-3 widened subset
    (spheres / area lights / constant envs); the direct kernel uses [:5]."""
    tri = ctx.tri
    p0 = np.asarray(tri.p0, np.float32)
    e1 = np.asarray(tri.p1, np.float32) - p0
    e2 = np.asarray(tri.p2, np.float32) - p0
    ng = np.asarray(tri.ng, np.float32)
    dpdu = np.asarray(tri.dpdu, np.float32)
    mat = np.asarray(tri.mat)
    r = _resolve_mat_arrays(ctx.mats, mat)
    kinds, n_lobes = r["kinds"], r["n_lobes"]

    t_count = p0.shape[0]
    # pad to >=8 rows so sphere-only scenes still feed Pallas a real VMEM
    # block; zero rows have det == 0 and never intersect
    t_rows = max(t_count, 8)
    table = np.zeros((t_rows, TEX0 + 10), np.float32)
    table[:t_count, 0:3] = p0
    table[:t_count, 3:6] = e1
    table[:t_count, 6:9] = e2
    table[:t_count, 9:12] = ng
    table[:t_count, 12:15] = dpdu
    table[:t_count, 15] = n_lobes.astype(np.float32)
    l_avail = kinds.shape[1]
    for l in range(min(LOBES_MAX, l_avail)):
        base = 16 + 16 * l
        table[:t_count, base + 0] = kinds[:, l].astype(np.float32)
        table[:t_count, base + 1 : base + 4] = r["s0"][:, l]
        table[:t_count, base + 4 : base + 7] = r["s1"][:, l]
        table[:t_count, base + 7 : base + 10] = r["s2"][:, l]
        table[:t_count, base + 10] = r["au"][:, l]
        table[:t_count, base + 11] = r["av"][:, l]
        table[:t_count, base + 12] = r["fres"][:, l].astype(np.float32)
        table[:t_count, base + 13] = r["ea"][:, l]
        table[:t_count, base + 14] = r["eb"][:, l]
    table[:t_count, 31] = r["mat_eta"]  # lobe-0 pad col carries the Bsdf eta
    table[:t_count, 47] = mat.astype(np.float32)  # lobe-1 pad: material id
    table[:t_count, NRM_COL + 0 : NRM_COL + 3] = np.asarray(tri.n0, np.float32)
    table[:t_count, NRM_COL + 3 : NRM_COL + 6] = np.asarray(tri.n1, np.float32)
    table[:t_count, NRM_COL + 6 : NRM_COL + 9] = np.asarray(tri.n2, np.float32)
    smooth = _mesh_smooth(tri)

    # textured-kd block (read only when a textured material is live):
    # dpdv for the duv 2x2 solve, per-vertex uv for barycentric interp,
    # and the per-triangle texture engagement flag (-1 = constant s0)
    tex_info = _textured_static(ctx)
    tex_static = None
    tex_table = None
    if tex_info is not None:
        rec, image, pk, tid = tex_info
        from . import tex_tile

        tex_static = tex_tile.pack_texture_static(rec, image, pk)
        tex_table = tex_tile.table_bf16(pk)
        table[:t_count, TEX0 + 0 : TEX0 + 3] = np.asarray(tri.dpdv, np.float32)
        table[:t_count, TEX0 + 3 : TEX0 + 5] = np.asarray(tri.uv0, np.float32)
        table[:t_count, TEX0 + 5 : TEX0 + 7] = np.asarray(tri.uv1, np.float32)
        table[:t_count, TEX0 + 7 : TEX0 + 9] = np.asarray(tri.uv2, np.float32)
        s0t_tri = np.asarray(ctx.mats["packed_i"])[..., 6][
            np.maximum(mat, 0), 0
        ]
        table[:t_count, TEX0 + 9] = np.where(
            (mat >= 0) & (s0t_tri >= 0), 1.0, -1.0
        )

    lights_p = tuple(
        tuple(float(v) for v in row) for row in np.asarray(ctx.lights.p)
    )
    lights_emit = tuple(
        tuple(float(v) for v in row) for row in np.asarray(ctx.lights.emit)
    )
    spheres = _pack_spheres_static(ctx)
    lights_c, esc_rgb = _pack_lights_static(ctx)
    bss = None
    has_b = np.asarray(ctx.mats["has_bssrdf"])
    used_m = np.unique(mat[mat >= 0]) if mat.size else np.zeros(0, np.int64)
    if used_m.size == 1 and bool(has_b[used_m[0]]):
        mi = int(used_m[0])
        eta_b = float(np.asarray(ctx.mats["bssrdf_eta"])[mi])
        # fresnel_moment1 polynomial (bssrdf.rs:443-457) on 1/eta
        e = 1.0 / eta_b
        e2, e3 = e * e, e * e * e
        e4, e5 = e3 * e, e3 * e * e
        if e < 1.0:
            fm1 = (0.45966 - 1.73965 * e + 3.37668 * e2 - 3.904945 * e3
                   + 2.49277 * e4 - 0.68441 * e5)
        else:
            fm1 = (-4.61686 + 11.1136 * e - 10.4646 * e2 + 5.11455 * e3
                   - 1.27198 * e4 + 0.12746 * e5)
        bss = BssrdfC(
            R=_t3(np.asarray(ctx.mats["bssrdf_R"])[mi]),
            d=_t3(np.maximum(np.asarray(ctx.mats["bssrdf_d"])[mi], 1e-6)),
            eta=eta_b,
            c_sw=float(1.0 - 2.0 * fm1),
        )
    # brute-force tri-loop AABB cull chunks (None when the BVH engages —
    # the leaf reorder below invalidates row ranges, and the packet
    # traversal already culls hierarchically)
    will_bvh = allow_bvh and t_count > 0 and (
        t_count > TRI_MAX or os.environ.get("RS_MEGA_BVH", "") == "force"
    )
    chunks = None
    if not will_bvh and os.environ.get("RS_MEGA_CULL", "1") != "0":
        chunks = _build_tri_chunks(p0, e1, e2, t_count)
    wide = SceneStatic(
        spheres=spheres,
        lights=lights_c,
        esc_rgb=esc_rgb,
        world_radius=float(np.asarray(ctx.lights.world_radius)),
        bssrdf=bss,
        smooth=smooth,
        tex=tex_static,
        chunks=chunks,
    )
    # static specialization facts: which lobe kinds exist on used materials
    # (triangles AND spheres) and the deepest live lobe stack — the kernel
    # prunes all dead branches at trace time (the pallas analogue of
    # SceneCtx.static_kinds)
    live = np.zeros(kinds.shape, bool)
    for ti in range(kinds.shape[0]):
        live[ti, : int(n_lobes[ti])] = True
    present = set(int(k) for k in np.unique(kinds[live])) if live.any() else set()
    max_lobes = int(n_lobes.max()) if n_lobes.size else 0
    for s in spheres:
        for l in range(s.n_lobes):
            present.add(s.lobes[l].kind)
        max_lobes = max(max_lobes, s.n_lobes)
    kinds_present = tuple(sorted(present)) or (int(LOBE_LAMBERT_REFL),)
    max_lobes = max(1, min(max_lobes, LOBES_MAX))

    # BVH mode (T > TRI_MAX, or RS_MEGA_BVH=force for tests): reorder the
    # table into BVH leaf order and keep only the columns the kernel
    # reads (9 intersect + the statically-needed attrs) so the packet
    # traversal replaces the brute-force fori without a second geometry
    # table.  bvh = (nodes2_f, nodes_i, max_leaf) or None.
    bvh = None
    if allow_bvh and t_count > 0 and (
        t_count > TRI_MAX or os.environ.get("RS_MEGA_BVH", "") == "force"
    ):
        from ..accel.bvh import build_bvh
        from ..scene.types import empty_spheres
        from .bvh_pallas import pack_bvh_tables

        leaf = int(os.environ.get("RS_BVH_LEAF", "0")) or 16
        bvh_t = build_bvh(ctx.tri, empty_spheres(), leaf)
        tbl = pack_bvh_tables(bvh_t, ctx.tri)
        order = np.asarray(bvh_t.prim_index, np.int64)
        cols = list(range(9)) + list(
            _attr_cols(kinds_present, max_lobes, smooth,
                       textured=tex_static is not None)
        )
        if with_mat_col:
            cols.append(47)  # material id rides as the LAST attr
        table = table[order][:, cols]
        if table.shape[0] < 8:  # Mosaic wants a real (>=8-row) VMEM block
            table = np.concatenate(
                [table, np.zeros((8 - table.shape[0], table.shape[1]),
                                 np.float32)]
            )
        bvh = (tbl["nodes2_f"], tbl["nodes_i"], int(tbl["max_leaf"]))
    return (
        jnp.asarray(table), lights_p, lights_emit, kinds_present, max_lobes,
        wide, bvh, tex_table,
    )


def _has_spec(kinds_present):
    return any(k in kinds_present for k in SPEC_KINDS)


def _has_spec_trans(kinds_present):
    return (LOBE_SPEC_TRANS in kinds_present) or (
        LOBE_FRESNEL_SPEC in kinds_present
    )


def _has_full(kinds_present):
    """Does the kernel need the s1/s2/alpha/fresnel/eta attribute block?
    (Must be used identically by _attr_cols and every lobe unpack.)"""
    return (
        any(k in kinds_present for k in MF_KINDS)
        or LOBE_DISNEY_RETRO in kinds_present  # roughness rides in au
        or LOBE_DISNEY_CLEARCOAT in kinds_present  # weight/gloss in au/av
        or _has_spec(kinds_present)
    )


def _attr_cols(kinds_present, max_lobes, smooth=False, textured=False):
    """Table columns the specialized kernel actually needs.  smooth /
    textured append the winner's intersect row (p0,e1,e2 — barycentric
    recompute), then the raw vertex normals (smooth), then the textured
    block (dpdv, uv0..uv2, tex id), always as the LAST attrs in that
    order (the bounce loop unpacks them from the tail; with_mat_col
    rides after, but the SPPM kernels are flat-only so the orders never
    mix)."""
    has_full = _has_full(kinds_present)
    mixed = len(kinds_present) > 1
    cols = [9, 10, 11, 12, 13, 14, 15]  # ng, dpdu, n_lobes
    if _has_spec_trans(kinds_present):
        cols.append(31)  # Bsdf eta (etaScale RR)
    for l in range(max_lobes):
        base = 16 + 16 * l
        if mixed:
            cols.append(base + 0)  # kind
        cols.extend([base + 1, base + 2, base + 3])  # s0
        if has_full:
            cols.extend(range(base + 4, base + 15))  # s1,s2,au,av,fres,etas
    if smooth or textured:
        cols.extend(range(0, 9))  # p0, e1, e2 (barycentric recompute)
    if smooth:
        cols.extend(range(NRM_COL, NRM_COL + 9))  # n0, n1, n2
    if textured:
        cols.extend(range(TEX0, TEX0 + 10))  # dpdv, uv0..uv2, tex id
    return tuple(cols)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z):
    inv = lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


# ---- static chunk culling for the brute-force tri loops ----
#
# The fog/env family is VPU-bound on the Möller-Trumbore fori over the
# whole tri table: every bounce pays n_tris * ~58 ops per lane for the
# closest hit AND the NEE shadow test, even when the tile's rays can
# only see one of the scene's objects.  pack_scene splits consecutive
# table rows into spatially coherent chunks (instances load contiguous,
# so the greedy area-break lands on object boundaries); the loops then
# slab-test each chunk's padded AABB against the tile and wrap the
# chunk's MT fori in a lax.cond — a tile whose rays all miss the box
# skips its triangles entirely (the same whole-tile cond-skip mechanism
# as the SPPM deposit's sorted-prefix chunk skip).  False positives are
# harmless (the MT tests still decide); boxes are padded so the f32
# slab test can never reject a triangle MT would hit.


def _build_tri_chunks(p0, e1, e2, t_count, max_tris=256, max_chunks=24):
    """Greedy spatial chunking of consecutive tri rows (host, numpy).

    Returns a hashable tuple of (lo, hi, bmin3, bmax3) covering
    [0, t_count), or None when chunking is off (BVH scenes, huge or
    pathologically scattered tables)."""
    if t_count <= 0 or t_count > max_tris:
        return None
    p0 = np.asarray(p0[:t_count], np.float64)
    v = np.stack([p0, p0 + np.asarray(e1[:t_count], np.float64),
                  p0 + np.asarray(e2[:t_count], np.float64)], 1)
    tlo, thi = v.min(1), v.max(1)

    def area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    raw = []
    lo_i, cur_lo, cur_hi = 0, tlo[0].copy(), thi[0].copy()
    for i in range(1, t_count):
        nlo = np.minimum(cur_lo, tlo[i])
        nhi = np.maximum(cur_hi, thi[i])
        cnt = i - lo_i
        if cnt >= 16 or (
            cnt >= 4 and area(nlo, nhi) > 2.0 * area(cur_lo, cur_hi) + 1e-12
        ):
            raw.append((lo_i, i, cur_lo, cur_hi))
            lo_i, cur_lo, cur_hi = i, tlo[i].copy(), thi[i].copy()
        else:
            cur_lo, cur_hi = nlo, nhi
    raw.append((lo_i, t_count, cur_lo, cur_hi))
    if len(raw) > max_chunks:
        return None
    out = []
    for lo_i, hi_i, blo, bhi in raw:
        pad = 1e-3 + 1e-4 * np.maximum(np.abs(blo), np.abs(bhi))
        out.append((
            int(lo_i), int(hi_i),
            tuple(float(x) for x in blo - pad),
            tuple(float(x) for x in bhi + pad),
        ))
    return tuple(out)


def _cull_inv(dx, dy, dz):
    """Finite-clamped per-lane 1/d for the slab test (no 0*inf NaNs;
    the clamp only ever widens the hit interval — conservative)."""

    def inv(d):
        eps = jnp.float32(1e-30)
        safe = jnp.where(jnp.abs(d) < eps,
                         jnp.where(d < 0.0, -eps, eps), d)
        return 1.0 / safe

    return inv(dx), inv(dy), inv(dz)


def _chunk_box_hit(bmin, bmax, ox, oy, oz, ivx, ivy, ivz, t_bound):
    """Per-lane slab test of a static padded AABB vs segment [0, t_bound]."""
    t0 = (jnp.float32(bmin[0]) - ox) * ivx
    t1 = (jnp.float32(bmax[0]) - ox) * ivx
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    t0 = (jnp.float32(bmin[1]) - oy) * ivy
    t1 = (jnp.float32(bmax[1]) - oy) * ivy
    tlo = jnp.maximum(tlo, jnp.minimum(t0, t1))
    thi = jnp.minimum(thi, jnp.maximum(t0, t1))
    t0 = (jnp.float32(bmin[2]) - oz) * ivz
    t1 = (jnp.float32(bmax[2]) - oz) * ivz
    tlo = jnp.maximum(tlo, jnp.minimum(t0, t1))
    thi = jnp.minimum(thi, jnp.maximum(t0, t1))
    return (tlo <= jnp.minimum(thi, t_bound)) & (thi >= 0.0)


def _closest_hit(tri_ref, n_tris, ox, oy, oz, dx, dy, dz, attr_cols,
                 chunks=None, live=None):
    """Möller-Trumbore fori over the VMEM table carrying (t, best_j); a
    second fori fetches the winner's attributes (only the statically
    needed columns) by j-compare — O(T * |attr_cols|) selects, fine for
    VMEM-resident scenes (round-2: two-phase fetch for large T)."""
    big = jnp.full(ox.shape, 3.0e38, jnp.float32)
    best0 = jnp.full(ox.shape, -1, jnp.int32)

    def body(j, c):
        t_best, best = c
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
        return jnp.where(upd, t, t_best), jnp.where(upd, j, best)

    zeros = jnp.zeros_like(ox)
    if chunks is not None:
        ivx, ivy, ivz = _cull_inv(dx, dy, dz)

    def _chunked(carry, step):
        """Run `step`'s fori over each chunk behind its AABB cond; the
        slab bound is the carry's current t_best (skips tighten as the
        closest hit shrinks)."""
        for lo_i, hi_i, bmin, bmax in chunks:
            ch = _chunk_box_hit(
                bmin, bmax, ox, oy, oz, ivx, ivy, ivz, carry[0]
            )
            if live is not None:
                ch = ch & live
            carry = lax.cond(
                jnp.any(ch),
                lambda c, lo=lo_i, hi=hi_i: lax.fori_loop(lo, hi, step, c),
                lambda c: c,
                carry,
            )
        return carry

    if len(attr_cols) <= 12:
        # small attribute set (e.g. pure-lambert scenes): accumulate the
        # winner's attributes inside the intersect loop itself — one pass
        carry0 = (big, best0) + (zeros,) * len(attr_cols)

        def body_fused(j, c):
            t_best, best = c[0], c[1]
            t_new, best_new = body(j, (t_best, best))[:2]
            upd = best_new != best
            attrs = tuple(
                jnp.where(upd, tri_ref[j, col], c[2 + k])
                for k, col in enumerate(attr_cols)
            )
            return (t_new, best_new) + attrs

        if chunks is not None:
            out = _chunked(carry0, body_fused)
        else:
            out = lax.fori_loop(0, n_tris, body_fused, carry0)
        return (out[0],) + out[2:]

    if chunks is not None:
        t_best, best = _chunked((big, best0), body)
    else:
        t_best, best = lax.fori_loop(0, n_tris, body, (big, best0))
    attrs0 = (zeros,) * len(attr_cols)

    def fetch(j, attrs):
        sel = best == j
        return tuple(
            jnp.where(sel, tri_ref[j, c], attrs[k])
            for k, c in enumerate(attr_cols)
        )

    if chunks is not None:
        attrs = attrs0
        for lo_i, hi_i, _bmin, _bmax in chunks:
            attrs = lax.cond(
                jnp.any((best >= lo_i) & (best < hi_i)),
                lambda a, lo=lo_i, hi=hi_i: lax.fori_loop(lo, hi, fetch, a),
                lambda a: a,
                attrs,
            )
    else:
        attrs = lax.fori_loop(0, n_tris, fetch, attrs0)
    return (t_best,) + attrs


def _occluded(tri_ref, n_tris, ox, oy, oz, dx, dy, dz, t_max, chunks=None):
    """Any-hit over the table with unnormalized direction, t in
    [TRI_EPS, t_max) — shadow_unoccluded semantics.  chunks: static
    AABB cull (see _build_tri_chunks); dead lanes carry t_max = 0 so
    the slab test excludes them automatically."""

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

    occ0 = jnp.zeros(ox.shape, jnp.int32)
    if chunks is not None:
        ivx, ivy, ivz = _cull_inv(dx, dy, dz)
        occ = occ0
        for lo_i, hi_i, bmin, bmax in chunks:
            ch = _chunk_box_hit(
                bmin, bmax, ox, oy, oz, ivx, ivy, ivz, t_max
            ) & (occ == 0)
            occ = lax.cond(
                jnp.any(ch),
                lambda o, lo=lo_i, hi=hi_i: lax.fori_loop(lo, hi, body, o),
                lambda o: o,
                occ,
            )
        return occ > 0
    occ = lax.fori_loop(0, n_tris, body, occ0)
    return occ > 0


def _mt_leaf(trow, ox, oy, oz, dx, dy, dz, t_bound):
    """Möller-Trumbore of one scalar-broadcast triangle row (cols 0:9 =
    p0, e1, e2) against the ray tile; returns (t, hit-with-t<t_bound)."""
    p0x, p0y, p0z = trow[0, 0], trow[0, 1], trow[0, 2]
    e1x, e1y, e1z = trow[0, 3], trow[0, 4], trow[0, 5]
    e2x, e2y, e2z = trow[0, 6], trow[0, 7], trow[0, 8]
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
        & (t >= TRI_EPS) & (t < t_bound)
    )
    return t, hit


def _bvh_closest_hit(
    bvh_refs, tri_ref, ox, oy, oz, dx, dy, dz, active, max_leaf, n_attr
):
    """Packet closest-hit inside the megakernel: fused-children traversal
    (ops/bvh_pallas semantics — child AABBs tested at the parent pop, only
    hit children pushed) over the leaf-ordered narrow table, with the
    winning row's attribute columns (9..9+n_attr) accumulated in the leaf
    test.  Same return contract as _closest_hit: (t,) + attrs with
    t = 3e38 on miss.  Dead lanes (active=False) start at t=0 so the
    t_cur > 0 slab-test term culls them from packet descent."""
    nodes_f_ref, nodes_i_ref, stack_ref, t_ref, best_ref, attr_ref = bvh_refs
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_ref[:] = jnp.where(active, 3.0e38, 0.0)
    for a in range(n_attr):
        attr_ref[a, :, :] = jnp.zeros_like(ox)
    # packet-majority direction signs pick the near child
    sx = jnp.sum(dx)
    sy = jnp.sum(dy)
    sz = jnp.sum(dz)
    stack_ref[0] = jnp.int32(0)

    def body(sp):
        node = stack_ref[sp - 1]
        sp = sp - 1
        row_f = nodes_f_ref[pl.ds(node, 1), :]  # (1, 16) child boxes
        row_i = nodes_i_ref[pl.ds(node, 1), :]
        off = row_i[0, 0]
        npr = row_i[0, 1]
        ax = row_i[0, 2]
        is_leaf = npr > 0
        t_cur = t_ref[:]

        @pl.when(is_leaf)
        def _leaf():
            for k in range(max_leaf):
                @pl.when(k < npr)
                def _prim():
                    trow = tri_ref[pl.ds(off + k, 1), :]
                    tb = t_ref[:]
                    t, upd = _mt_leaf(trow, ox, oy, oz, dx, dy, dz, tb)
                    t_ref[:] = jnp.where(upd, t, tb)
                    for a in range(n_attr):
                        attr_ref[a, :, :] = jnp.where(
                            upd, trow[0, 9 + a], attr_ref[a, :, :]
                        )

        d_ax = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
        left = node + 1
        near = jnp.where(d_ax >= 0.0, left, off)
        far = left + off - near
        hit_l = _slab6(row_f, 0, ox, oy, oz, ix, iy, iz, t_cur)
        hit_r = _slab6(row_f, 6, ox, oy, oz, ix, iy, iz, t_cur)
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        near_is_left = d_ax >= 0.0
        interior = ~is_leaf
        do_far = interior & jnp.where(near_is_left, any_r, any_l)
        do_near = interior & jnp.where(near_is_left, any_l, any_r)
        inc_f = jnp.where(do_far, jnp.int32(1), jnp.int32(0))
        inc_n = jnp.where(do_near, jnp.int32(1), jnp.int32(0))
        sp_c = jnp.minimum(sp, STACK_DEPTH - 1)
        stack_ref[sp_c] = jnp.where(do_far, far, stack_ref[sp_c])
        sp1 = jnp.minimum(sp + inc_f, STACK_DEPTH - 1)
        stack_ref[sp1] = jnp.where(do_near, near, stack_ref[sp1])
        return jnp.minimum(sp + inc_f + inc_n, STACK_DEPTH)

    lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))
    return (t_ref[:],) + tuple(attr_ref[a, :, :] for a in range(n_attr))


def _bvh_occluded(
    bvh_refs, tri_ref, ox, oy, oz, dx, dy, dz, t_max, max_leaf
):
    """Packet any-hit (shadow) traversal: t in [TRI_EPS, t_max) with the
    caller's unnormalized direction (_occluded semantics).  Occluded and
    dead lanes carry t=0, so they drop out of the slab tests; the loop
    exits early once every lane is resolved."""
    nodes_f_ref, nodes_i_ref, stack_ref, t_ref, best_ref, attr_ref = bvh_refs
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t_ref[:] = jnp.maximum(t_max, 0.0)
    best_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
    sx = jnp.sum(dx)
    sy = jnp.sum(dy)
    sz = jnp.sum(dz)
    stack_ref[0] = jnp.int32(0)

    def body(carry):
        sp, done = carry
        node = stack_ref[sp - 1]
        sp = sp - 1
        row_f = nodes_f_ref[pl.ds(node, 1), :]
        row_i = nodes_i_ref[pl.ds(node, 1), :]
        off = row_i[0, 0]
        npr = row_i[0, 1]
        ax = row_i[0, 2]
        is_leaf = npr > 0
        t_cur = t_ref[:]

        @pl.when(is_leaf)
        def _leaf():
            for k in range(max_leaf):
                @pl.when(k < npr)
                def _prim():
                    trow = tri_ref[pl.ds(off + k, 1), :]
                    tb = t_ref[:]
                    _t, upd = _mt_leaf(trow, ox, oy, oz, dx, dy, dz, tb)
                    best_ref[:] = jnp.where(upd, jnp.int32(1), best_ref[:])
                    t_ref[:] = jnp.where(upd, 0.0, tb)

        d_ax = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
        left = node + 1
        near = jnp.where(d_ax >= 0.0, left, off)
        far = left + off - near
        hit_l = _slab6(row_f, 0, ox, oy, oz, ix, iy, iz, t_cur)
        hit_r = _slab6(row_f, 6, ox, oy, oz, ix, iy, iz, t_cur)
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        near_is_left = d_ax >= 0.0
        interior = ~is_leaf
        do_far = interior & jnp.where(near_is_left, any_r, any_l)
        do_near = interior & jnp.where(near_is_left, any_l, any_r)
        inc_f = jnp.where(do_far, jnp.int32(1), jnp.int32(0))
        inc_n = jnp.where(do_near, jnp.int32(1), jnp.int32(0))
        sp_c = jnp.minimum(sp, STACK_DEPTH - 1)
        stack_ref[sp_c] = jnp.where(do_far, far, stack_ref[sp_c])
        sp1 = jnp.minimum(sp + inc_f, STACK_DEPTH - 1)
        stack_ref[sp1] = jnp.where(do_near, near, stack_ref[sp1])
        sp = jnp.minimum(sp + inc_f + inc_n, STACK_DEPTH)
        # int32 done carry (Mosaic i1 loop-carry pitfall): all lanes
        # resolved (occluded or dead) -> nothing left to test
        done = jnp.where(jnp.any(t_ref[:] > 0.0), jnp.int32(0), jnp.int32(1))
        return sp, done

    def cond(carry):
        sp, done = carry
        return (sp > 0) & (done == 0)

    lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))
    return best_ref[:] >= 0


# ---- static-transform helpers (rows are compile-time float tuples) ----


def _affine12(rows, x, y, z):
    """Apply a 3x4 row-major transform to a point."""
    return (
        rows[0] * x + rows[1] * y + rows[2] * z + rows[3],
        rows[4] * x + rows[5] * y + rows[6] * z + rows[7],
        rows[8] * x + rows[9] * y + rows[10] * z + rows[11],
    )


def _rot12(rows, x, y, z):
    """Rotation part of a 3x4 transform applied to a vector."""
    return (
        rows[0] * x + rows[1] * y + rows[2] * z,
        rows[4] * x + rows[5] * y + rows[6] * z,
        rows[8] * x + rows[9] * y + rows[10] * z,
    )


def _rot12_t(rows, x, y, z):
    """Transposed rotation (normal transform by the inverse's rows)."""
    return (
        rows[0] * x + rows[4] * y + rows[8] * z,
        rows[1] * x + rows[5] * y + rows[9] * z,
        rows[2] * x + rows[6] * y + rows[10] * z,
    )


def _rot9(rows, x, y, z):
    return (
        rows[0] * x + rows[1] * y + rows[2] * z,
        rows[3] * x + rows[4] * y + rows[5] * z,
        rows[6] * x + rows[7] * y + rows[8] * z,
    )


def _rot9_t(rows, x, y, z):
    return (
        rows[0] * x + rows[3] * y + rows[6] * z,
        rows[1] * x + rows[4] * y + rows[7] * z,
        rows[2] * x + rows[5] * y + rows[8] * z,
    )


# ---- sphere primitives (sphere.rs:50-108; accel/geometry.py parity) ----

SPH_EPS = 1e-4


def _sphere_candidate_t(s, ox, oy, oz, dx, dy, dz, t_lim):
    """Closest valid quadratic root along the ray (full spheres: the z/phi
    clip tests are vacuous).  Returns (t_cand (3e38 = miss), oo, od)."""
    oox, ooy, ooz = _affine12(s.w2o, ox, oy, oz)
    odx, ody, odz = _rot12(s.w2o, dx, dy, dz)
    a = odx * odx + ody * ody + odz * odz
    b = 2.0 * (odx * oox + ody * ooy + odz * ooz)
    c = oox * oox + ooy * ooy + ooz * ooz - s.radius * s.radius
    # core/math.quadratic, componentwise
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    t0 = q / jnp.where(a == 0.0, 1.0, a)
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    lo = jnp.where(ok, jnp.minimum(t0, t1), 0.0)
    hi = jnp.where(ok, jnp.maximum(t0, t1), 0.0)
    lo_ok = ok & (lo > SPH_EPS) & (lo < t_lim)
    hi_ok = ok & (hi > SPH_EPS) & (hi < t_lim)
    t_cand = jnp.where(lo_ok, lo, jnp.where(hi_ok, hi, 3.0e38))
    return t_cand, (oox, ooy, ooz), (odx, ody, odz)


def _occluded_spheres(spheres, ox, oy, oz, dx, dy, dz, t_max):
    occ = jnp.zeros(ox.shape, bool)
    for s in spheres:
        t_cand, _, _ = _sphere_candidate_t(s, ox, oy, oz, dx, dy, dz, t_max)
        occ = occ | (t_cand < 3.0e38)
    return occ


def _occluded_all(tri_ref, n_tris, spheres, ox, oy, oz, dx, dy, dz, t_max,
                  chunks=None):
    occ = _occluded(tri_ref, n_tris, ox, oy, oz, dx, dy, dz, t_max,
                    chunks=chunks)
    if spheres:
        occ = occ | _occluded_spheres(spheres, ox, oy, oz, dx, dy, dz, t_max)
    return occ


def _spheres_closest(spheres, ox, oy, oz, dx, dy, dz, has_full, mixed, max_lobes):
    """Static-unrolled closest hit over the sphere constants.  Returns
    (t (3e38 = miss), merged dict): object hit p_obj, winning transform
    rows (lane arrays), radius, and the winner's lobe stack in the same
    layout as the triangle table extraction."""
    shape = ox.shape
    zero = jnp.zeros(shape, jnp.float32)
    big = jnp.full(shape, 3.0e38, jnp.float32)
    t_best = big
    m = {
        "po": [zero] * 3,
        "w2o": [zero] * 9,
        "o2w": [zero] * 9,
        "radius": zero,
        "n_lob": jnp.zeros(shape, jnp.int32),
        "mat_eta": zero,
    }
    lob0 = {
        "kind": jnp.zeros(shape, jnp.int32) if mixed else None,
        "s0": [zero] * 3,
        "s1": [zero] * 3,
        "s2": [zero] * 3,
        "au": zero, "av": zero,
        "fres": jnp.zeros(shape, jnp.int32),
        "eta_a": zero, "eta_b": zero,
    }
    m["lobes"] = [
        {k: (list(v) if isinstance(v, list) else v) for k, v in lob0.items()}
        for _ in range(max_lobes)
    ]
    rot_idx = (0, 1, 2, 4, 5, 6, 8, 9, 10)
    for s in spheres:
        t_cand, oo, od = _sphere_candidate_t(
            s, ox, oy, oz, dx, dy, dz, jnp.float32(3.0e38)
        )
        upd = t_cand < t_best
        t_best = jnp.where(upd, t_cand, t_best)
        for c in range(3):
            m["po"][c] = jnp.where(upd, oo[c] + od[c] * t_cand, m["po"][c])
        for i, ri in enumerate(rot_idx):
            m["w2o"][i] = jnp.where(upd, s.w2o[ri], m["w2o"][i])
            m["o2w"][i] = jnp.where(upd, s.o2w[ri], m["o2w"][i])
        m["radius"] = jnp.where(upd, s.radius, m["radius"])
        m["n_lob"] = jnp.where(upd, s.n_lobes, m["n_lob"])
        m["mat_eta"] = jnp.where(upd, s.mat_eta, m["mat_eta"])
        for l in range(max_lobes):
            src = s.lobes[l] if l < len(s.lobes) else s.lobes[0]
            dst = m["lobes"][l]
            if mixed:
                dst["kind"] = jnp.where(upd, src.kind, dst["kind"])
            for c in range(3):
                dst["s0"][c] = jnp.where(upd, src.s0[c], dst["s0"][c])
                if has_full:
                    dst["s1"][c] = jnp.where(upd, src.s1[c], dst["s1"][c])
                    dst["s2"][c] = jnp.where(upd, src.s2[c], dst["s2"][c])
            if has_full:
                dst["au"] = jnp.where(upd, src.au, dst["au"])
                dst["av"] = jnp.where(upd, src.av, dst["av"])
                dst["fres"] = jnp.where(upd, src.fres, dst["fres"])
                dst["eta_a"] = jnp.where(upd, src.eta_a, dst["eta_a"])
                dst["eta_b"] = jnp.where(upd, src.eta_b, dst["eta_b"])
    return t_best, m


def _sphere_shading(m):
    """Shading attributes for merged sphere hits (surface_interaction's
    sphere branch, accel/geometry.py:271-330): reprojected object point,
    world normal (w2o^T), dpdu = o2w . (-phi_max*y, phi_max*x, 0)."""
    pox, poy, poz = m["po"]
    plen = jnp.sqrt(pox * pox + poy * poy + poz * poz)
    scale = m["radius"] / jnp.maximum(plen, 1e-30)
    pox, poy, poz = pox * scale, poy * scale, poz * scale
    ngx, ngy, ngz = _rot9_t(m["w2o"], pox, poy, poz)
    ng_len = jnp.maximum(
        jnp.sqrt(ngx * ngx + ngy * ngy + ngz * ngz), 1e-30
    )
    ngx, ngy, ngz = ngx / ng_len, ngy / ng_len, ngz / ng_len
    two_pi = 2.0 * PI
    dux, duy, duz = _rot9(m["o2w"], -two_pi * poy, two_pi * pox, jnp.zeros_like(pox))
    return (ngx, ngy, ngz), (dux, duy, duz)


# ---- NEE light sampling for the widened subset ----
# (lights/lights.py sample_li: point / sphere-area / constant-infinite)


def _cdf_scan(cdf, u):
    """Unrolled sample_continuous_1d over a static f32 CDF tuple: returns
    (idx int lanes, idx_f, du) with searchsorted(right)-1 semantics."""
    n = len(cdf) - 1
    cnt = jnp.zeros(u.shape, jnp.int32)
    for v in cdf:
        cnt = cnt + (jnp.float32(v) <= u).astype(jnp.int32)
    idx = jnp.clip(cnt - 1, 0, n - 1)
    c0 = jnp.zeros_like(u)
    dc = jnp.zeros_like(u)
    for k in range(n):
        selk = idx == k
        c0 = jnp.where(selk, cdf[k], c0)
        dc = jnp.where(selk, cdf[k + 1] - cdf[k], dc)
    du = jnp.where(dc > 0.0, (u - c0) / jnp.maximum(dc, 1e-30), u - c0)
    return idx, idx.astype(jnp.float32), du


def _select_bins(bins, idx):
    out = jnp.zeros(idx.shape, jnp.float32)
    for k, v in enumerate(bins):
        out = jnp.where(idx == k, v, out)
    return out


def _env_sample_k(env, px, py, pz, u0, u1, world_radius):
    """InfiniteAreaLight::sample_li for a constant map: Distribution2D
    sample (marginal sin-weighted rows; uniform conditional), direction
    from (phi, theta), pdf in solid angle (lights/infinite.rs:140-186)."""
    idx1, idx1f, du1 = _cdf_scan(env.marg_cdf, u1)
    d1 = (idx1f + du1) / env.nv
    pdf1 = _select_bins(env.marg_pdf, idx1)
    idx0, idx0f, du0 = _cdf_scan(env.cond_cdf, u0)
    d0 = (idx0f + du0) / env.nu
    # constant rows: conditional pdf == 1 exactly (asserted at pack time)
    theta = d1 * PI
    phi = d0 * 2.0 * PI
    sin_t = jnp.sin(theta)
    wlx = sin_t * jnp.cos(phi)
    wly = sin_t * jnp.sin(phi)
    wlz = jnp.cos(theta)
    wx, wy, wz = _rot9(env.to_world, wlx, wly, wlz)
    pdf = jnp.where(
        sin_t > 0.0, pdf1 / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-9)), 0.0
    )
    plx = px + wx * (2.0 * world_radius)
    ply = py + wy * (2.0 * world_radius)
    plz = pz + wz * (2.0 * world_radius)
    return (wx, wy, wz), pdf, (plx, ply, plz)


def _env_pdf_dir_k(env, wx, wy, wz):
    """InfiniteAreaLight::pdf_li along a world direction, without an
    in-kernel arccos: the theta bin comes from cos-threshold compares
    (iv = floor(theta/pi*nv) <=> count of z <= cos(k*pi/nv))."""
    lx, ly, lz = _rot9(env.to_local, wx, wy, wz)
    inv = lax.rsqrt(jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-30))
    lz = lz * inv
    iv = jnp.zeros(wx.shape, jnp.int32)
    for v in env.cos_bins:
        iv = iv + (lz <= jnp.float32(v)).astype(jnp.int32)
    pdf_row = _select_bins(env.pdf2d_bins, iv)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - lz * lz, 0.0))
    return jnp.where(
        sin_t > 0.0, pdf_row / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-9)), 0.0
    )


def _nee_light_k(wide, li_idx, px, py, pz, u0, u1):
    """sample_li for the per-lane selected light (generic branch: any mix
    of point / sphere-area / one constant-env light).  Returns a dict:
    wi(3), li(3), pdf, p_light(3), delta mask, sel_env mask, env."""
    lights = wide.lights
    shape = px.shape
    zero = jnp.zeros(shape, jnp.float32)
    false = jnp.zeros(shape, bool)
    kinds = set(l.kind for l in lights)
    emr, emg, emb = zero, zero, zero
    is_point = false
    is_area = false
    sel_env = false
    lpx = lpy = lpz = zero
    ao2w = [zero] * 12
    aw2o = [zero] * 9
    arad = zero
    env = None
    rot_idx = (0, 1, 2, 4, 5, 6, 8, 9, 10)
    for k, l in enumerate(lights):
        sel = li_idx == k
        emr = jnp.where(sel, l.emit[0], emr)
        emg = jnp.where(sel, l.emit[1], emg)
        emb = jnp.where(sel, l.emit[2], emb)
        if l.kind == LIGHT_POINT:
            is_point = is_point | sel
            lpx = jnp.where(sel, l.p[0], lpx)
            lpy = jnp.where(sel, l.p[1], lpy)
            lpz = jnp.where(sel, l.p[2], lpz)
        elif l.kind == LIGHT_DIFFUSE_AREA:
            is_area = is_area | sel
            for i in range(12):
                ao2w[i] = jnp.where(sel, l.o2w[i], ao2w[i])
            for i, ri in enumerate(rot_idx):
                aw2o[i] = jnp.where(sel, l.w2o[ri], aw2o[i])
            arad = jnp.where(sel, l.radius, arad)
        else:  # LIGHT_INFINITE (at most one; supports() enforces)
            sel_env = sel_env | sel
            env = l.env

    # point candidate (lights/point.rs:55-79)
    wix = wiy = wiz = zero
    lir = lig = lib = zero
    pdf = zero
    plx, ply, plz = lpx, lpy, lpz
    if LIGHT_POINT in kinds:
        tlx, tly, tlz = lpx - px, lpy - py, lpz - pz
        dist2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
        sq = jnp.sqrt(dist2)
        wix, wiy, wiz = tlx / sq, tly / sq, tlz / sq
        lir, lig, lib = emr / dist2, emg / dist2, emb / dist2
        pdf = jnp.where(is_point, 1.0, 0.0)

    # sphere-area candidate (lights/diffuse.rs sample_li + sphere sample;
    # AREA_PDF_QUIRK: pdf = dist^2/|cos| with no 1/area, shape/mod.rs:33-47)
    if LIGHT_DIFFUSE_AREA in kinds:
        z = 1.0 - 2.0 * u0
        r_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = 2.0 * PI * u1
        pox = r_ * jnp.cos(phi) * arad
        poy = r_ * jnp.sin(phi) * arad
        poz = z * arad
        psx, psy, psz = _affine12(ao2w, pox, poy, poz)
        nsx, nsy, nsz = _rot9_t(aw2o, pox, poy, poz)
        ninv = lax.rsqrt(jnp.maximum(nsx * nsx + nsy * nsy + nsz * nsz, 1e-30))
        nsx, nsy, nsz = nsx * ninv, nsy * ninv, nsz * ninv
        tsx_, tsy_, tsz_ = psx - px, psy - py, psz - pz
        d2 = tsx_ * tsx_ + tsy_ * tsy_ + tsz_ * tsz_
        dinv = jnp.sqrt(jnp.maximum(d2, 1e-20))
        wax, way, waz = tsx_ / dinv, tsy_ / dinv, tsz_ / dinv
        cos_l = jnp.abs(-(wax * nsx + way * nsy + waz * nsz))
        pdf_a = d2 / jnp.maximum(cos_l, 1e-20)
        pdf_a = jnp.where((d2 > 0.0) & jnp.isfinite(pdf_a), pdf_a, 0.0)
        front = (nsx * -wax + nsy * -way + nsz * -waz) > 0.0
        wix = jnp.where(is_area, wax, wix)
        wiy = jnp.where(is_area, way, wiy)
        wiz = jnp.where(is_area, waz, wiz)
        lir = jnp.where(is_area, jnp.where(front, emr, 0.0), lir)
        lig = jnp.where(is_area, jnp.where(front, emg, 0.0), lig)
        lib = jnp.where(is_area, jnp.where(front, emb, 0.0), lib)
        pdf = jnp.where(is_area, pdf_a, pdf)
        plx = jnp.where(is_area, psx, plx)
        ply = jnp.where(is_area, psy, ply)
        plz = jnp.where(is_area, psz, plz)

    if env is not None:
        (wex, wey, wez), pdf_e, (pex, pey, pez) = _env_sample_k(
            env, px, py, pz, u0, u1, wide.world_radius
        )
        wix = jnp.where(sel_env, wex, wix)
        wiy = jnp.where(sel_env, wey, wiy)
        wiz = jnp.where(sel_env, wez, wiz)
        lir = jnp.where(sel_env, env.rgb[0], lir)
        lig = jnp.where(sel_env, env.rgb[1], lig)
        lib = jnp.where(sel_env, env.rgb[2], lib)
        pdf = jnp.where(sel_env, pdf_e, pdf)
        plx = jnp.where(sel_env, pex, plx)
        ply = jnp.where(sel_env, pey, ply)
        plz = jnp.where(sel_env, pez, plz)

    return dict(
        wi=(wix, wiy, wiz),
        li=(lir, lig, lib),
        pdf=pdf,
        p_light=(plx, ply, plz),
        delta=is_point,
        sel_env=sel_env,
        env=env,
    )


def _power_heuristic_k(f_pdf, g_pdf):
    """(sampling.rs:324-328), nf = ng = 1."""
    f2 = f_pdf * f_pdf
    denom = f2 + g_pdf * g_pdf
    return jnp.where(denom > 0.0, f2 / jnp.maximum(denom, 1e-30), 0.0)


# ---- componentwise microfacet math (bsdf/microfacet.py ports) ----


def _trig_theta_phi(x, y, z):
    cos2 = z * z
    sin2 = jnp.maximum(0.0, 1.0 - cos2)
    tan2 = sin2 / jnp.where(cos2 == 0.0, 1e-30, cos2)
    sin_t = jnp.sqrt(sin2)
    safe = jnp.where(sin_t == 0.0, 1.0, sin_t)
    cos_p = jnp.where(sin_t == 0.0, 1.0, jnp.clip(x / safe, -1.0, 1.0))
    sin_p = jnp.where(sin_t == 0.0, 0.0, jnp.clip(y / safe, -1.0, 1.0))
    return cos2, tan2, cos_p * cos_p, sin_p * sin_p


def _tr_d_k(x, y, z, au, av):
    cos2, tan2, c2p, s2p = _trig_theta_phi(x, y, z)
    c4 = cos2 * cos2
    e = (c2p / (au * au) + s2p / (av * av)) * tan2
    d = 1.0 / (PI * au * av * c4 * (1.0 + e) ** 2)
    return jnp.where(jnp.isfinite(tan2) & (c4 > 0.0), d, 0.0)


def _tr_lambda_k(x, y, z, au, av):
    _, tan2, c2p, s2p = _trig_theta_phi(x, y, z)
    alpha2 = c2p * au * au + s2p * av * av
    lam = (-1.0 + jnp.sqrt(1.0 + alpha2 * tan2)) / 2.0
    return jnp.where(jnp.isfinite(tan2), lam, 0.0)


def _fr_dielectric_k(cos_i, eta_i, eta_t):
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_par = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-20)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-20)
    return jnp.where(tir, 1.0, 0.5 * (r_par * r_par + r_perp * r_perp))


def _fr_conductor_ch(ci2, si2, eta, k):
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - si2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + ci2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * jnp.sqrt(ci2)
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = a2b2 * ci2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def _schlick_weight_k(cos_t):
    m = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    return (m * m) * (m * m) * m


def _fresnel_k(lob, cos_i, kinds_present=()):
    """Fresnel dispatch on the lobe's code; returns (fr, fg, fb).
    FRESNEL_DISNEY (disney.rs:310-333) is compiled in only when a
    Disney-microfacet lobe can appear: lerp(metallic in eta_a,
    dielectric(1, eta in eta_b), schlick(c_spec0 in s1))."""
    fr_d = _fr_dielectric_k(cos_i, lob["eta_a"], lob["eta_b"])
    ci = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    ci2 = ci * ci
    si2 = 1.0 - ci2
    # conductor: eta in s2, k in s1 (recipes.metal / _fresnel_eval)
    fc = tuple(
        _fr_conductor_ch(ci2, si2, lob["s2"][c], lob["s1"][c]) for c in range(3)
    )
    has_disney = LOBE_DISNEY_MICROFACET_REFL in kinds_present
    if has_disney:
        metallic = lob["eta_a"]
        fr_diel1 = _fr_dielectric_k(cos_i, 1.0, lob["eta_b"])
        sw = _schlick_weight_k(cos_i)
        fdis = tuple(
            (1.0 - metallic) * fr_diel1
            + metallic * (lob["s1"][c] + (1.0 - lob["s1"][c]) * sw)
            for c in range(3)
        )
    code = lob["fres"]
    out = []
    for c in range(3):
        v = jnp.where(
            code == FRESNEL_DIELECTRIC,
            fr_d,
            jnp.where(code == FRESNEL_CONDUCTOR, fc[c], 1.0),
        )
        if has_disney:
            v = jnp.where(code == FRESNEL_DISNEY, fdis[c], v)
        out.append(v)
    return out


def _spec_mask(lob, kinds_present):
    """Per-lane mask: is this lobe a specular kind (f/pdf contribute 0 to
    NEE evaluation, lobe_f semantics)?"""
    present = [k for k in SPEC_KINDS if k in kinds_present]
    if not present:
        return None
    if not isinstance(lob["kind"], int):
        m = jnp.zeros_like(lob["kind"], bool)
        for k in present:
            m = m | (lob["kind"] == k)
        return m
    return True if lob["kind"] in SPEC_KINDS else None


def _gtr1_k(cos_theta, alpha):
    """disney.rs GTR1 incl. the reference's log10 (eval._gtr1)."""
    a2 = alpha * alpha
    return (a2 - 1.0) / (
        PI
        * jnp.log10(jnp.maximum(a2, 1e-9))
        * (1.0 + (a2 - 1.0) * cos_theta * cos_theta)
    )


def _cc_g_k(cos_theta, alpha=0.25):
    """Smith G_GGX at fixed clearcoat alpha (eval._smith_g_ggx)."""
    a2 = alpha * alpha
    c2 = cos_theta * cos_theta
    return 1.0 / jnp.maximum(
        cos_theta + jnp.sqrt(jnp.maximum(a2 + c2 - a2 * c2, 0.0)), 1e-9
    )


def _kind_mask(lob, kinds, kinds_present):
    """Lane mask (or python bool) for `lob.kind in kinds`, respecting the
    static single-kind case."""
    k = lob["kind"]
    if isinstance(k, int):
        return k in kinds
    m = None
    for kk in kinds:
        if kk not in kinds_present:
            continue
        mm = k == kk
        m = mm if m is None else (m | mm)
    return m if m is not None else False


def _lobe_f_k(lob, wox, woy, woz, wix, wiy, wiz, kinds_present):
    """lobe_f for LAMBERT_REFL / DISNEY_RETRO / MF_REFL /
    DISNEY_MICROFACET_REFL on local-frame components; returns
    (fr, fg, fb).  Specular kinds evaluate to 0 (lobe_f semantics).
    (bsdf/eval.py lobe_f subset.)  Branches for kinds absent from the
    scene are pruned at trace time."""
    sm = _spec_mask(lob, kinds_present)
    if sm is True:
        return (jnp.zeros_like(wox),) * 3
    has_lam = LOBE_LAMBERT_REFL in kinds_present
    has_dd = LOBE_DISNEY_DIFFUSE in kinds_present
    has_retro = LOBE_DISNEY_RETRO in kinds_present
    has_sheen = LOBE_DISNEY_SHEEN in kinds_present
    has_cc = LOBE_DISNEY_CLEARCOAT in kinds_present
    has_mfk = any(k in kinds_present for k in MF_KINDS)

    # shared half-vector for retro/sheen/clearcoat + microfacet families
    if has_retro or has_sheen or has_cc or has_mfk:
        whx, why, whz = wox + wix, woy + wiy, woz + wiz
        wh2 = whx * whx + why * why + whz * whz
        wh_len = jnp.sqrt(jnp.maximum(wh2, 0.0))
        wh_zero = wh2 == 0.0
        inv_l = 1.0 / jnp.maximum(wh_len, 1e-20)
        nhx, nhy, nhz = whx * inv_l, why * inv_l, whz * inv_l

    if has_dd or has_retro or has_sheen:
        fo_d = _schlick_weight_k(jnp.abs(woz))
        fi_d = _schlick_weight_k(jnp.abs(wiz))
    vals = []  # (mask, (r,g,b)) in kind order; later entries win
    if has_lam:
        lam = tuple(lob["s0"][c] / PI for c in range(3))
        vals.append((_kind_mask(lob, (LOBE_LAMBERT_REFL,), kinds_present), lam))
    if has_dd:
        # disney.rs DisneyDiffuse::f (eval.py lobe_f)
        dfac = (1.0 - fo_d / 2.0) * (1.0 - fi_d / 2.0) / PI
        dd = tuple(lob["s0"][c] * dfac for c in range(3))
        vals.append((_kind_mask(lob, (LOBE_DISNEY_DIFFUSE,), kinds_present),
                     dd))
    if has_retro or has_sheen:
        cos_d = wix * nhx + wiy * nhy + wiz * nhz
    if has_retro:
        # disney.rs retro-reflection (eval.py lobe_f): rough rides in au
        rr = 2.0 * lob["au"] * cos_d * cos_d
        fac = rr * (fo_d + fi_d + fo_d * fi_d * (rr - 1.0)) / PI
        retro = tuple(
            jnp.where(wh_zero, 0.0, lob["s0"][c] * fac) for c in range(3)
        )
        vals.append((_kind_mask(lob, (LOBE_DISNEY_RETRO,), kinds_present),
                     retro))
    if has_sheen:
        # disney.rs DisneySheen::f = s0 * schlick_weight(cos_d)
        swd = _schlick_weight_k(cos_d)
        sh = tuple(
            jnp.where(wh_zero, 0.0, lob["s0"][c] * swd) for c in range(3)
        )
        vals.append((_kind_mask(lob, (LOBE_DISNEY_SHEEN,), kinds_present),
                     sh))
    if has_cc:
        # disney.rs DisneyClearcoat::f: weight in au, gloss in av; GTR1 D
        # with the reference's log10 quirk, fixed-alpha (0.25) Smith G,
        # schlick 0.04 fresnel
        v_cc = jnp.where(
            wh_zero,
            0.0,
            lob["au"]
            * _cc_g_k(jnp.abs(woz)) * _cc_g_k(jnp.abs(wiz))
            * (0.04 + 0.96 * _schlick_weight_k(
                wox * nhx + woy * nhy + woz * nhz))
            * _gtr1_k(jnp.abs(nhz), lob["av"])
            / 4.0,
        )
        cc3 = (v_cc, v_cc, v_cc)
        vals.append((_kind_mask(lob, (LOBE_DISNEY_CLEARCOAT,), kinds_present),
                     cc3))
    if has_mfk:
        co = jnp.abs(woz)
        ci = jnp.abs(wiz)
        ok = (co > 0.0) & (ci > 0.0) & (wh_len > 0.0)
        flip = nhz < 0.0
        fx = jnp.where(flip, -nhx, nhx)
        fy = jnp.where(flip, -nhy, nhy)
        fz = jnp.where(flip, -nhz, nhz)
        fr3 = _fresnel_k(lob, wix * fx + wiy * fy + wiz * fz, kinds_present)
        d_val = _tr_d_k(nhx, nhy, nhz, lob["au"], lob["av"])
        lam_o = _tr_lambda_k(wox, woy, woz, lob["au"], lob["av"])
        lam_i = _tr_lambda_k(wix, wiy, wiz, lob["au"], lob["av"])
        g_joint = 1.0 / (1.0 + lam_o + lam_i)
        if LOBE_DISNEY_MICROFACET_REFL in kinds_present:
            # separable Smith G (disney.rs; eval._mf_g dist==SEPARABLE_G)
            g_sep = (1.0 / (1.0 + lam_o)) * (1.0 / (1.0 + lam_i))
            dm = _kind_mask(
                lob, (LOBE_DISNEY_MICROFACET_REFL,), kinds_present
            )
            if dm is True:
                g_val = g_sep
            else:
                g_val = jnp.where(dm, g_sep, g_joint)
        else:
            g_val = g_joint
        scale = d_val * g_val / jnp.maximum(4.0 * ci * co, 1e-20)
        mf = tuple(
            jnp.where(ok, lob["s0"][c] * fr3[c] * scale, 0.0)
            for c in range(3)
        )
        vals.append((_kind_mask(lob, MF_KINDS, kinds_present), mf))

    out = None
    for mask, v in vals:
        if mask is False:
            continue
        if out is None or mask is True:
            out = v
        else:
            out = tuple(jnp.where(mask, v[c], out[c]) for c in range(3))
    if out is None:
        out = (jnp.zeros_like(wox),) * 3
    if sm is not None:
        out = tuple(jnp.where(sm, 0.0, v) for v in out)
    return out


def _lobe_pdf_k(lob, wox, woy, woz, wix, wiy, wiz, kinds_present):
    """lobe_pdf: cosine for the diffuse family (lambert / retro),
    visible-normal TR for the microfacet family, statically pruned like
    _lobe_f_k.  Specular kinds -> 0."""
    sm = _spec_mask(lob, kinds_present)
    if sm is True:
        return jnp.zeros_like(wox)
    same = (woz * wiz) > 0.0
    cos_pdf = jnp.where(same, jnp.abs(wiz) / PI, 0.0)
    if sm is not None:
        cos_pdf = jnp.where(sm, 0.0, cos_pdf)
    has_mfk = any(k in kinds_present for k in MF_KINDS)
    has_cc = LOBE_DISNEY_CLEARCOAT in kinds_present
    if not (has_mfk or has_cc):
        return cos_pdf
    whx, why, whz = wox + wix, woy + wiy, woz + wiz
    wh2 = whx * whx + why * why + whz * whz
    inv_l = lax.rsqrt(jnp.maximum(wh2, 1e-30))
    whx, why, whz = whx * inv_l, why * inv_l, whz * inv_l
    out = cos_pdf
    if has_mfk:
        d_val = _tr_d_k(whx, why, whz, lob["au"], lob["av"])
        lam_o = _tr_lambda_k(wox, woy, woz, lob["au"], lob["av"])
        dot_owh = wox * whx + woy * why + woz * whz
        pdf_wh = (
            d_val / (1.0 + lam_o) * jnp.abs(dot_owh)
            / jnp.maximum(jnp.abs(woz), 1e-20)
        )
        mf_pdf = jnp.where(
            same, pdf_wh / jnp.maximum(4.0 * dot_owh, 1e-20), 0.0
        )
        dm = _kind_mask(lob, MF_KINDS, kinds_present)
        if dm is True:
            out = mf_pdf
        elif dm is not False:
            out = jnp.where(dm, mf_pdf, out)
    if has_cc:
        # eval._clearcoat_pdf: GTR1 D * |cos wh| / (4 wo.wh)
        dr = _gtr1_k(jnp.abs(whz), lob["av"])
        dot_owh2 = wox * whx + woy * why + woz * whz
        cc_pdf = jnp.where(
            same & (wh2 > 0.0),
            dr * jnp.abs(whz) / jnp.maximum(4.0 * dot_owh2, 1e-9),
            0.0,
        )
        cm = _kind_mask(lob, (LOBE_DISNEY_CLEARCOAT,), kinds_present)
        if cm is True:
            out = cc_pdf
        elif cm is not False:
            out = jnp.where(cm, cc_pdf, out)
    if sm is not None:
        out = jnp.where(sm, 0.0, out)
    return out


def _tr_sample_wh_k(wox, woy, woz, au, av, u0, u1):
    """tr_sample_wh_visible componentwise (microfacet.py:108-166)."""
    flip = woz < 0.0
    wx = jnp.where(flip, -wox, wox)
    wy = jnp.where(flip, -woy, woy)
    wz = jnp.where(flip, -woz, woz)
    sx_, sy_, sz_ = wx * au, wy * av, wz
    inv = lax.rsqrt(jnp.maximum(sx_ * sx_ + sy_ * sy_ + sz_ * sz_, 1e-30))
    wsx, wsy, wsz = sx_ * inv, sy_ * inv, sz_ * inv

    # _tr_sample_11
    cos_theta = wsz
    r_spec = jnp.sqrt(u0 / jnp.maximum(1.0 - u0, 1e-9))
    phi_spec = 2.0 * PI * u1
    sx_spec = r_spec * jnp.cos(phi_spec)
    sy_spec = r_spec * jnp.sin(phi_spec)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    tan_theta = sin_theta / jnp.maximum(cos_theta, 1e-9)
    a_inv = 1.0 / jnp.maximum(tan_theta, 1e-9)
    g1v = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / (a_inv * a_inv)))
    a = 2.0 * u0 / g1v - 1.0
    tmp = jnp.minimum(1.0 / jnp.maximum(a * a - 1.0, 1e-12), 1e10)
    tmp = jnp.where(a * a - 1.0 <= 0.0, 1e10, tmp)
    b = tan_theta
    dsc = jnp.maximum(b * b * tmp * tmp - (a * a - b * b) * tmp, 0.0)
    dq = jnp.sqrt(dsc)
    sx1 = b * tmp - dq
    sx2 = b * tmp + dq
    slope_x = jnp.where(
        (a < 0.0) | (sx2 > 1.0 / jnp.maximum(tan_theta, 1e-9)), sx1, sx2
    )
    sgn = jnp.where(u1 > 0.5, 1.0, -1.0)
    nu2 = jnp.where(u1 > 0.5, 2.0 * (u1 - 0.5), 2.0 * (0.5 - u1))
    z = (nu2 * (nu2 * (nu2 * 0.27385 - 0.73369) + 0.46341)) / (
        nu2 * (nu2 * (nu2 * 0.093073 + 0.309420) - 1.0) + 0.597999
    )
    slope_y = sgn * z * jnp.sqrt(1.0 + slope_x * slope_x)
    near_n = cos_theta > 0.9999
    slope_x = jnp.where(near_n, sx_spec, slope_x)
    slope_y = jnp.where(near_n, sy_spec, slope_y)

    # rotate
    s2 = jnp.maximum(0.0, 1.0 - wsz * wsz)
    sin_t = jnp.sqrt(s2)
    safe = jnp.where(sin_t == 0.0, 1.0, sin_t)
    cos_p = jnp.where(sin_t == 0.0, 1.0, wsx / safe)
    sin_p = jnp.where(sin_t == 0.0, 0.0, wsy / safe)
    rx = cos_p * slope_x - sin_p * slope_y
    ry = sin_p * slope_x + cos_p * slope_y
    # unstretch + normalize
    hx, hy, hz = -au * rx, -av * ry, jnp.ones_like(rx)
    inv_h = lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-30))
    hx, hy, hz = hx * inv_h, hy * inv_h, hz * inv_h
    hx = jnp.where(flip, -hx, hx)
    hy = jnp.where(flip, -hy, hy)
    hz = jnp.where(flip, -hz, hz)
    return hx, hy, hz


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


def _used_slots(
    max_depth, n_lights, all_point, has_env_nee, has_bssrdf, with_cam
):
    """Static enumeration of the sampler slots the bounce loop consumes,
    in consumption order — (slot, n_components) pairs.  Must mirror the
    `sdim` call sites in `_bounce_loop`/`_raygen` exactly: the Halton
    mode ships these slots' values into the kernel as an input matrix
    (one row per component), and `_slot_cols` maps slot -> row on both
    the host and kernel side.  Estimator-equivalence tests pin the
    pairing (a drifted enumeration shows up as per-ray divergence)."""
    slots = []
    if with_cam:
        slots += [(0, 2), (1, 2)]  # film jitter, lens uv
    from ..sampler.dims import path_dim0

    for bounce in range(max_depth):
        d0 = path_dim0(bounce)
        if all_point:
            slots.append((d0, 1))
        elif n_lights > 0:
            slots.append((d0, 1))
            slots.append((d0 + 1, 2))
            if has_env_nee:
                slots.append((d0 + 2, 2))
        slots.append((d0 + 3, 2))  # BSDF sample
        if has_bssrdf:
            slots.append((d0 + 5, 1))
            slots.append((d0 + 6, 2))
            if n_lights > 0:
                slots.append((d0 + 7, 1))
            slots.append((d0 + 9, 2))
        if bounce > 3:
            slots.append((d0 + 4, 1))  # RR
    return tuple(slots)


def _slot_cols(hal_slots):
    """slot -> first row index in the Halton u-matrix."""
    cols, c = {}, 0
    for slot, n in hal_slots:
        cols[slot] = c
        c += n
    return cols, c


def _halton_u(sampler, pid, s_idx, hal_slots):
    """(NC, N) matrix of the sampler values for `hal_slots`, computed
    with the production HaltonSampler (sampler/halton.py) — the kernel
    consumes them verbatim, so Halton parity is exact by construction
    (radical-inverse digit math never has to lower to Mosaic)."""
    parts = []
    for slot, n in hal_slots:
        if n == 1:
            parts.append(sampler.get_1d(pid, s_idx, slot))
        else:
            u = sampler.get_2d(pid, s_idx, slot)
            parts.append(u[..., 0])
            parts.append(u[..., 1])
    return jnp.stack(parts, 0).astype(jnp.float32)


def _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, u_ref, hal_slots):
    """Closure giving the bounce loop its per-slot uniforms: stratified
    math in-kernel (u_ref None), or static rows of the Halton input."""
    if u_ref is None:
        def sdim(dim, want_2d):
            return _sampler_dims(
                pid, sid, dim, spp, xs, ys, jitter, seed, want_2d
            )
        return sdim
    cols, _ = _slot_cols(hal_slots)

    def sdim(dim, want_2d):
        c = cols[dim]
        if want_2d:
            return u_ref[c], u_ref[c + 1]
        return u_ref[c]
    return sdim


def _sampler_dims(pid, sid, dim, spp, xs, ys, jitter, seed, want_2d):
    """In-kernel StratifiedSampler.get_1d/get_2d (sampler/stratified.py):
    identical hash/permutation math on the tile arrays.  dim is static."""
    from ..core import rng as _rng

    dk = jnp.uint32((dim * 2654435761 + 0) & 0xFFFFFFFF) + jnp.uint32(seed)
    key = _rng.hash_combine(pid, dk)
    # _permute, power-of-two branch (Kensler CMJ, rng.permute_pow2)
    strat = _rng.permute_pow2(sid, spp, key).astype(jnp.uint32)
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


def _bsdf_sample_k(
    lobs, n_lob, wol_x, wol_y, wo_z, ub0, ub1, kinds_present, max_lobes
):
    """Bsdf::sample_f machinery (reflection.rs:302-381, REFERENCE_QUIRKS-
    exact) on local-frame components: uniform lobe choice, per-kind
    candidate directions, f/pdf with the 1/matching average.  Shared by
    the bounce sample (flags = ALL) and estimate_direct's counter branch
    (flags = ALL & ~SPECULAR — identical machinery because env-NEE scenes
    are gated to have no live specular lobes, supports()).

    Returns a dict: ws* (local dir), f (3-tuple), pdf, chosen-kind masks
    (for etaScale / specular-bounce tracking), fs_reflect or None."""
    has_mf = any(k in kinds_present for k in MF_KINDS)
    has_spec = _has_spec(kinds_present)
    has_st = _has_spec_trans(kinds_present)
    mixed = len(kinds_present) > 1

    if max_lobes > 1:
        matching = jnp.maximum(n_lob, 1)
        comp = jnp.minimum((ub0 * matching).astype(jnp.int32), matching - 1)
        u0 = jnp.minimum(
            ub0 * matching - comp.astype(jnp.float32), ONE_MINUS_EPSILON
        )
        lob_c = {}
        for k in lobs[0]:
            if isinstance(lobs[0][k], tuple):
                acc = lobs[0][k]
                for j in range(1, max_lobes):
                    sj = comp == j
                    acc = tuple(
                        jnp.where(sj, lobs[j][k][c], acc[c]) for c in range(3)
                    )
                lob_c[k] = acc
            elif isinstance(lobs[0][k], int):
                lob_c[k] = lobs[0][k]
            else:
                acc = lobs[0][k]
                for j in range(1, max_lobes):
                    acc = jnp.where(comp == j, lobs[j][k], acc)
                lob_c[k] = acc
    else:
        matching = jnp.minimum(n_lob, 1)
        u0 = jnp.minimum(ub0, ONE_MINUS_EPSILON)
        lob_c = lobs[0]
    u1 = ub1
    kind_c = lob_c["kind"]

    def k_is(k):
        # python bool when kind_c is a static int (single lobe kind),
        # a lane mask otherwise — same expression either way
        return kind_c == k

    is_mf_c = _kind_mask(lob_c, MF_KINDS, kinds_present)
    is_cos_c = _kind_mask(lob_c, COS_KINDS, kinds_present)
    is_cc_c = _kind_mask(lob_c, (LOBE_DISNEY_CLEARCOAT,), kinds_present)
    is_sr_c = k_is(LOBE_SPEC_REFL)
    is_st_c = k_is(LOBE_SPEC_TRANS)
    is_fs_c = k_is(LOBE_FRESNEL_SPEC)
    fs_reflect = None

    # cosine candidate (lambert / disney-retro): hemisphere in wo's
    # half-space
    if any(k in kinds_present for k in COS_KINDS):
        dxo, dyo = _concentric_disk(u0, u1)
        z_cos = jnp.sqrt(jnp.maximum(0.0, 1.0 - dxo * dxo - dyo * dyo))
        z_cos = jnp.where(wo_z < 0.0, -z_cos, z_cos)
    # microfacet candidate: visible-normal TR sample + reflect
    if has_mf:
        hx, hy, hz = _tr_sample_wh_k(
            wol_x, wol_y, wo_z, lob_c["au"], lob_c["av"], u0, u1
        )
        dot_owh = wol_x * hx + wol_y * hy + wo_z * hz
        mrx = 2.0 * dot_owh * hx - wol_x
        mry = 2.0 * dot_owh * hy - wol_y
        mrz = 2.0 * dot_owh * hz - wo_z
        mr_ok = (dot_owh >= 0.0) & ((wo_z * mrz) > 0.0) & (wo_z != 0.0)
    # clearcoat candidate: GTR1 wh sample + reflect (disney.rs
    # DisneyClearcoat::sample_f incl. the reference's missing-sqrt
    # literal form, eval.py:938-953)
    if LOBE_DISNEY_CLEARCOAT in kinds_present:
        gl = lob_c["av"]
        a2c = gl * gl
        cc_cos = (
            1.0 - jnp.power(jnp.maximum(a2c, 1e-9), 1.0 - u0)
        ) / jnp.sqrt(jnp.maximum(1.0 - a2c, 1e-9))
        cc_cos = jnp.clip(cc_cos, -1.0, 1.0)
        cc_sin = jnp.sqrt(jnp.maximum(0.0, 1.0 - cc_cos * cc_cos))
        cc_phi = 2.0 * PI * u1
        whcx = cc_sin * jnp.cos(cc_phi)
        whcy = cc_sin * jnp.sin(cc_phi)
        whcz = cc_cos
        flip_cc = (wo_z * whcz) <= 0.0
        whcx = jnp.where(flip_cc, -whcx, whcx)
        whcy = jnp.where(flip_cc, -whcy, whcy)
        whcz = jnp.where(flip_cc, -whcz, whcz)
        dot_ow = wol_x * whcx + wol_y * whcy + wo_z * whcz
        ccx = 2.0 * dot_ow * whcx - wol_x
        ccy = 2.0 * dot_ow * whcy - wol_y
        ccz = 2.0 * dot_ow * whcz - wo_z

    # specular candidates (reflection.rs:638-649, 686-715, 755-797)
    if has_spec:
        ea_c, eb_c = lob_c["eta_a"], lob_c["eta_b"]
        srx, sry, srz = -wol_x, -wol_y, wo_z
    if has_st:
        entering = wo_z > 0.0
        ei = jnp.where(entering, ea_c, eb_c)
        et = jnp.where(entering, eb_c, ea_c)
        eta_rel = ei / jnp.maximum(et, 1e-9)
        abs_cz = jnp.abs(wo_z)
        sin2_t = eta_rel * eta_rel * jnp.maximum(0.0, 1.0 - abs_cz * abs_cz)
        st_ok = sin2_t < 1.0
        cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
        nz_sign = jnp.where(entering, 1.0, -1.0)
        stx = -eta_rel * wol_x
        sty = -eta_rel * wol_y
        stz = -eta_rel * wo_z + (eta_rel * abs_cz - cos_t) * nz_sign
        scale_t = (ei * ei) / jnp.maximum(et * et, 1e-20)
    if LOBE_FRESNEL_SPEC in kinds_present:
        fr_fs = _fr_dielectric_k(wo_z, ea_c, eb_c)
        fs_reflect = u0 < fr_fs

    # select the sampled direction by the chosen lobe's kind
    wsx = wsy = wsz = None

    def _put(mask, vx, vy, vz):
        nonlocal wsx, wsy, wsz
        if mask is False:
            return
        if wsx is None or mask is True:
            wsx, wsy, wsz = vx, vy, vz
            return
        wsx = jnp.where(mask, vx, wsx)
        wsy = jnp.where(mask, vy, wsy)
        wsz = jnp.where(mask, vz, wsz)

    if any(k in kinds_present for k in COS_KINDS):
        _put(
            is_cos_c if (mixed or has_spec) else True,
            dxo, dyo, z_cos,
        )
    if has_mf:
        _put(is_mf_c if mixed else True, mrx, mry, mrz)
    if LOBE_DISNEY_CLEARCOAT in kinds_present:
        _put(is_cc_c if mixed else True, ccx, ccy, ccz)
    if LOBE_SPEC_REFL in kinds_present:
        _put(is_sr_c if mixed else True, srx, sry, srz)
    if LOBE_SPEC_TRANS in kinds_present:
        _put(is_st_c if mixed else True, stx, sty, stz)
    if LOBE_FRESNEL_SPEC in kinds_present:
        fsx = jnp.where(fs_reflect, srx, stx)
        fsy = jnp.where(fs_reflect, sry, sty)
        fsz = jnp.where(fs_reflect, srz, stz)
        _put(is_fs_c if mixed else True, fsx, fsy, fsz)

    fs = _lobe_f_k(lob_c, wol_x, wol_y, wo_z, wsx, wsy, wsz, kinds_present)
    pdf = _lobe_pdf_k(lob_c, wol_x, wol_y, wo_z, wsx, wsy, wsz, kinds_present)
    if has_mf:
        # invalid microfacet sample -> f = 0 (eval.py bsdf_sample gate)
        dead_mf = is_mf_c & ~mr_ok
        fs = tuple(jnp.where(dead_mf, 0.0, fc) for fc in fs)

    def _ovr_f(mask, new_f):
        return tuple(
            new_f[c] if mask is True else jnp.where(mask, new_f[c], fs[c])
            for c in range(3)
        )

    def _ovr_p(mask, new_p):
        return new_p if mask is True else jnp.where(mask, new_p, pdf)

    if has_spec:
        aci = jnp.maximum(jnp.abs(wsz), 1e-20)
    if LOBE_SPEC_REFL in kinds_present:
        # f = Fr(wi_z) * R / |cos| (reflection.rs:646-648), pdf = 1
        fr3 = _fresnel_k(lob_c, wsz)
        f_sr = tuple(lob_c["s0"][c] * fr3[c] / aci for c in range(3))
        fs = _ovr_f(is_sr_c, f_sr)
        pdf = _ovr_p(is_sr_c, jnp.ones_like(pdf))
    if LOBE_SPEC_TRANS in kinds_present:
        # f = T (1-Fr(wi_z)) (eta_i^2/eta_t^2) / |cos| (radiance mode)
        fr_t = _fr_dielectric_k(wsz, ea_c, eb_c)
        f_st3 = tuple(
            jnp.where(st_ok, lob_c["s0"][c] * (1.0 - fr_t) * scale_t / aci, 0.0)
            for c in range(3)
        )
        fs = _ovr_f(is_st_c, f_st3)
        pdf = _ovr_p(is_st_c, jnp.where(st_ok, 1.0, 0.0))
    if LOBE_FRESNEL_SPEC in kinds_present:
        # reflect branch: R Fr / |cos| with pdf Fr; transmit branch:
        # T (1-Fr)(eta_i^2/eta_t^2)/|cos| with pdf 1-Fr
        f_fs3 = tuple(
            jnp.where(
                fs_reflect,
                lob_c["s0"][c] * fr_fs / aci,
                jnp.where(
                    st_ok,
                    lob_c["s1"][c] * (1.0 - fr_fs) * scale_t / aci,
                    0.0,
                ),
            )
            for c in range(3)
        )
        fs = _ovr_f(is_fs_c, f_fs3)
        pdf = _ovr_p(
            is_fs_c, jnp.where(fs_reflect, fr_fs, 1.0 - fr_fs)
        )
    # REFERENCE_QUIRKS: pdf accumulation gate is !is_reflection
    # (reflection.rs:358-364) — in this subset only a chosen SPEC_TRANS
    # lobe is non-reflective, so its pdf accumulates the OTHER matching
    # lobes' pdfs at the sampled direction before the 1/matching average
    if max_lobes > 1:
        if LOBE_SPEC_TRANS in kinds_present and is_st_c is not False:
            extra = jnp.zeros_like(pdf)
            for j in range(max_lobes):
                pj = _lobe_pdf_k(
                    lobs[j], wol_x, wol_y, wo_z, wsx, wsy, wsz,
                    kinds_present,
                )
                use = (j < n_lob) & (comp != j)
                extra = extra + jnp.where(use, pj, 0.0)
            acc = (
                extra
                if is_st_c is True
                else jnp.where(is_st_c, extra, 0.0)
            )
            pdf = pdf + acc
        pdf = jnp.where(
            matching > 1, pdf / matching.astype(jnp.float32), pdf
        )
    return dict(
        wsx=wsx, wsy=wsy, wsz=wsz, f=fs, pdf=pdf,
        is_sr_c=is_sr_c, is_st_c=is_st_c, is_fs_c=is_fs_c,
        fs_reflect=fs_reflect,
    )


def _sample_sr_k(d_ch, u):
    """Burley radius sample (bsdf/bssrdf.py sample_sr), componentwise."""
    first = u < 0.25
    u1 = jnp.minimum(u * 4.0, ONE_MINUS_EPSILON)
    u2 = jnp.minimum((u - 0.25) / 0.75, ONE_MINUS_EPSILON)
    r1 = d_ch * jnp.log(1.0 / (1.0 - u1))
    r2 = 3.0 * d_ch * jnp.log(1.0 / (1.0 - u2))
    return jnp.where(first, r1, r2)


def _pdf_sr_k(d_c, r):
    """PBRT-intended pdf of _sample_sr_k (d_c static float)."""
    rr = jnp.maximum(r, 1e-6)
    return 0.25 * jnp.exp(-rr / d_c) / (2.0 * PI * d_c * rr) + 0.75 * jnp.exp(
        -rr / (3.0 * d_c)
    ) / (6.0 * PI * d_c * rr)


def _sw_f_k(bss, cos_w):
    """Sw adapter f (bssrdf.sw_f): (1-Fr(cos))/(c pi) * eta^2, with the
    normalization c precomputed on host (BssrdfC.c_sw)."""
    fr = _fr_dielectric_k(cos_w, 1.0, bss.eta)
    return (1.0 - fr) / max(bss.c_sw * PI, 1e-9) * (bss.eta * bss.eta)


def _bounce_loop(
    tri_ref, ox, oy, oz, dx, dy, dz, active, pid, sid,
    n_tris, wide, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
    bvh_refs=None, max_leaf=None, u_ref=None, hal_slots=None,
    tex_refs=None, diff=None,
):
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, u_ref, hal_slots)
    lights = wide.lights
    spheres = wide.spheres
    n_lights = len(lights)
    lights_p = tuple(l.p for l in lights)
    lights_emit = tuple(l.emit for l in lights)
    all_point = n_lights > 0 and all(l.kind == LIGHT_POINT for l in lights)
    has_env_nee = any(l.kind == LIGHT_INFINITE for l in lights)
    esc_rgb = wide.esc_rgb
    has_mf = any(k in kinds_present for k in MF_KINDS)
    has_spec = _has_spec(kinds_present)
    has_st = _has_spec_trans(kinds_present)
    has_full = _has_full(kinds_present)
    mixed = len(kinds_present) > 1
    smooth = bool(getattr(wide, "smooth", False))
    tex = getattr(wide, "tex", None)
    textured = tex is not None and tex_refs is not None
    attr_cols = _attr_cols(kinds_present, max_lobes, smooth, textured)
    one = jnp.ones(ox.shape, jnp.float32)
    zero = jnp.zeros(ox.shape, jnp.float32)
    br, bg, bb = one, one, one
    Lr, Lg, Lb = zero, zero, zero
    es = one  # etaScale (path.rs:150-163); stays 1 without spec-trans
    spec_prev = None  # specular_bounce lane mask (escape-le gating)

    def occluded_all(sox, soy, soz, sdx, sdy, sdz, tmax_arr):
        """Shadow any-hit: brute fori below TRI_MAX, packet BVH above.
        BVH lanes that are inactive traverse nothing (t_max = 0)."""
        if bvh_refs is None:
            return _occluded_all(
                tri_ref, n_tris, spheres, sox, soy, soz, sdx, sdy, sdz,
                tmax_arr, chunks=wide.chunks,
            )
        occ = _bvh_occluded(
            bvh_refs, tri_ref, sox, soy, soz, sdx, sdy, sdz,
            jnp.where(active, tmax_arr, 0.0), max_leaf,
        )
        if spheres:
            occ = occ | _occluded_spheres(
                spheres, sox, soy, soz, sdx, sdy, sdz, tmax_arr
            )
        return occ

    # without escape-le envs the loop's final intersect (escape collection
    # in li_path, path.rs:84-87) would contribute nothing — skip the dead
    # iteration.  Estimator unchanged.
    n_iters = max_depth + (1 if esc_rgb is not None else 0)
    for bounce in range(n_iters):
        if bvh_refs is None:
            out = _closest_hit(
                tri_ref, n_tris, ox, oy, oz, dx, dy, dz, attr_cols,
                chunks=wide.chunks, live=active,
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
        if has_st:
            mat_eta = out[cur]  # Bsdf eta (table col 31)
            cur += 1
        lobs = []
        zero_k = jnp.zeros(ox.shape, jnp.float32)
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

        # tail attr blocks (see _attr_cols): [p0,e1,e2] [n0,n1,n2] [tex]
        tex_attrs = out[-10:] if textured else None
        n_tail_tex = 10 if textured else 0
        if smooth or textured:
            # rebuild the winner's barycentrics from its intersect row
            # with surface_interaction's exact guards
            # (accel/geometry.py:239-262, triangle.rs:301+)
            g0 = -(9 + (9 if smooth else 0) + n_tail_tex)
            (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z) = out[g0 : g0 + 9]
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det_b = e1x * pvx + e1y * pvy + e1z * pvz
            inv_b = 1.0 / jnp.where(jnp.abs(det_b) < TRI_EPS, 1.0, det_b)
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_b
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            b2 = (dx * qvx + dy * qvy + dz * qvz) * inv_b
            b0 = 1.0 - b1 - b2
        if smooth:
            # smooth shading normal: interpolate the raw vertex normals
            (n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z) = out[
                -(9 + n_tail_tex) : -n_tail_tex or None
            ]
            nsxr = b0 * n0x + b1 * n1x + b2 * n2x
            nsyr = b0 * n0y + b1 * n1y + b2 * n2y
            nszr = b0 * n0z + b1 * n1z + b2 * n2z
            nlen2 = nsxr * nsxr + nsyr * nsyr + nszr * nszr
            has_vn = nlen2 > 0.0
            invl = lax.rsqrt(jnp.maximum(nlen2, 1e-30))
            nsx = jnp.where(has_vn, nsxr * invl, ngx)
            nsy = jnp.where(has_vn, nsyr * invl, ngy)
            nsz = jnp.where(has_vn, nszr * invl, ngz)

        # sphere primitives: static-unrolled candidates min-combined with
        # the triangle winner (SceneCtx._combine_spheres semantics)
        if spheres:
            t_sph, sm = _spheres_closest(
                spheres, ox, oy, oz, dx, dy, dz, has_full, mixed, max_lobes
            )
            (sngx, sngy, sngz), (sdux, sduy, sduz) = _sphere_shading(sm)
            use_s = t_sph < t
            t = jnp.where(use_s, t_sph, t)
            ngx = jnp.where(use_s, sngx, ngx)
            ngy = jnp.where(use_s, sngy, ngy)
            ngz = jnp.where(use_s, sngz, ngz)
            if smooth:
                # spheres shade ns == ng (accel/geometry.py:336)
                nsx = jnp.where(use_s, sngx, nsx)
                nsy = jnp.where(use_s, sngy, nsy)
                nsz = jnp.where(use_s, sngz, nsz)
            dux = jnp.where(use_s, sdux, dux)
            duy = jnp.where(use_s, sduy, duy)
            duz = jnp.where(use_s, sduz, duz)
            n_lob = jnp.where(use_s, sm["n_lob"], n_lob)
            if textured:
                # sphere materials are untextured (supports gate): mask
                # the triangle tex flag off sphere-winning lanes
                tex_attrs = tex_attrs[:-1] + (
                    jnp.where(use_s, -1.0, tex_attrs[-1]),
                )
            if has_st:
                mat_eta = jnp.where(use_s, sm["mat_eta"], mat_eta)
            for l in range(max_lobes):
                sl = sm["lobes"][l] if l < len(sm["lobes"]) else sm["lobes"][0]
                lob = lobs[l]
                if mixed:
                    lob["kind"] = jnp.where(use_s, sl["kind"], lob["kind"])
                lob["s0"] = tuple(
                    jnp.where(use_s, sl["s0"][c], lob["s0"][c]) for c in range(3)
                )
                if has_full:
                    lob["s1"] = tuple(
                        jnp.where(use_s, sl["s1"][c], lob["s1"][c])
                        for c in range(3)
                    )
                    lob["s2"] = tuple(
                        jnp.where(use_s, sl["s2"][c], lob["s2"][c])
                        for c in range(3)
                    )
                    lob["au"] = jnp.where(use_s, sl["au"], lob["au"])
                    lob["av"] = jnp.where(use_s, sl["av"], lob["av"])
                    lob["fres"] = jnp.where(use_s, sl["fres"], lob["fres"])
                    lob["eta_a"] = jnp.where(use_s, sl["eta_a"], lob["eta_a"])
                    lob["eta_b"] = jnp.where(use_s, sl["eta_b"], lob["eta_b"])

        if smooth:
            # align ng with ns (surface_interaction's
            # vec.faceforward(ng, ns), accel/geometry.py:263-265)
            sgn_ff = jnp.where(
                (ngx * nsx + ngy * nsy + ngz * nsz) < 0.0, -1.0, 1.0
            )
            ngx, ngy, ngz = ngx * sgn_ff, ngy * sgn_ff, ngz * sgn_ff
        else:
            # flat subset: shading normal IS the geometric normal (same
            # arrays — the emitted program is unchanged)
            nsx, nsy, nsz = ngx, ngy, ngz

        found = t < 3.0e38

        # escaped rays collect infinite-light le (path.rs:84-87): bounce 0
        # unconditionally, later bounces only after a specular bounce
        if esc_rgb is not None:
            collect = active & ~found
            if bounce > 0:
                collect = (
                    collect & spec_prev if spec_prev is not None
                    else jnp.zeros_like(collect)
                )
            Lr = Lr + jnp.where(collect, br * esc_rgb[0], 0.0)
            Lg = Lg + jnp.where(collect, bg * esc_rgb[1], 0.0)
            Lb = Lb + jnp.where(collect, bb * esc_rgb[2], 0.0)
        if bounce == max_depth:
            break  # final iteration exists only for escape collection
        active = active & found

        # hit position
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t

        if textured:
            # textured-kd tap (matte.rs:35-61): interpolate uv, map to st
            # (MAP_UV), pick the EWA level from camera-FD duv at the
            # primary hit (dead differentials after — the jnp packed
            # path's exact behavior for lambert-only scenes), evaluate on
            # the packed pyramid via the MXU one-hot tap (ops/tex_tile)
            from . import tex_tile as _tt

            (dvux, dvuy, dvuz,
             uv0u, uv0v, uv1u, uv1v, uv2u, uv2v, texid) = tex_attrs
            texed = active & (texid > 0.0)
            uvu = b0 * uv0u + b1 * uv1u + b2 * uv2u
            uvv = b0 * uv0v + b1 * uv1v + b2 * uv2v
            ss_t = tex.su * uvu + tex.du
            tt_t = tex.sv * uvv + tex.dv
            lodf = None
            if bounce == 0 and diff is not None:
                # compute_uv_differentials (accel/geometry.py:369-432):
                # plane-project the FD rays, solve the 2x2 against
                # dpdu/dpdv on the two dominant axes of ng
                (rxox, rxoy, rxoz, rxdx, rxdy, rxdz,
                 ryox, ryoy, ryoz, rydx, rydy, rydz) = diff
                d_plane = ngx * px + ngy * py + ngz * pz

                def _plane_dp(aox, aoy, aoz, adx, ady, adz):
                    den = ngx * adx + ngy * ady + ngz * adz
                    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
                    th = (
                        d_plane - (ngx * aox + ngy * aoy + ngz * aoz)
                    ) / den
                    return (
                        aox + adx * th - px,
                        aoy + ady * th - py,
                        aoz + adz * th - pz,
                    )

                dpxx, dpxy, dpxz = _plane_dp(rxox, rxoy, rxoz,
                                             rxdx, rxdy, rxdz)
                dpyx, dpyy, dpyz = _plane_dp(ryox, ryoy, ryoz,
                                             rydx, rydy, rydz)
                ax0, ax1, ax2 = jnp.abs(ngx), jnp.abs(ngy), jnp.abs(ngz)
                k0 = (ax0 >= ax1) & (ax0 >= ax2)  # argmax, first-max ties
                kmax2 = ~k0 & (ax2 > ax1)
                # dim0 = 1 if kmax==0 else 0; dim1 = 1 if kmax==2 else 2
                c0 = lambda vx, vy, vz: jnp.where(k0, vy, vx)
                c1 = lambda vx, vy, vz: jnp.where(kmax2, vy, vz)
                a00 = c0(dux, duy, duz)
                a01 = c0(dvux, dvuy, dvuz)
                a10 = c1(dux, duy, duz)
                a11 = c1(dvux, dvuy, dvuz)
                det_s = a00 * a11 - a01 * a10
                okd = jnp.abs(det_s) >= 1e-10
                invd = 1.0 / jnp.where(okd, det_s, 1.0)
                fin = lambda x: jnp.where(
                    jnp.isfinite(x) & active, x, 0.0
                )

                def _solve(bx, by, bz):
                    b0_ = c0(bx, by, bz)
                    b1_ = c1(bx, by, bz)
                    du_ = (a11 * b0_ - a01 * b1_) * invd
                    dv_ = (a00 * b1_ - a10 * b0_) * invd
                    du_ = fin(jnp.where(okd, du_, 0.0))
                    dv_ = fin(jnp.where(okd, dv_, 0.0))
                    return du_, dv_

                dudx, dvdx = _solve(dpxx, dpxy, dpxz)
                dudy, dvdy = _solve(dpyx, dpyy, dpyz)
                lodf = _tt.ewa_lod(
                    tex,
                    dudx * tex.su, dvdx * tex.sv,
                    dudy * tex.su, dvdy * tex.sv,
                )
            planes = _tt.lookup_planes(tex, ss_t, tt_t, lodf, active=texed)
            tbl_ref, scr_in, scr_out = tex_refs
            tr_, tg_, tb_ = _tt.tile_lookup(
                tex, tbl_ref, scr_in, scr_out, planes
            )
            l0s = lobs[0]["s0"]
            lobs[0]["s0"] = (
                jnp.where(texed, tr_, l0s[0]),
                jnp.where(texed, tg_, l0s[1]),
                jnp.where(texed, tb_, l0s[2]),
            )

        # shading frame (bsdf/eval.make_frame): ss = normalize(dpdu),
        # degenerate -> coordinate_system(ns); ts = cross(ns, ss).  The
        # frame's z axis is the SHADING normal ns (== ng on flat meshes).
        du2 = dux * dux + duy * duy + duz * duz
        ssx, ssy, ssz = _normalize3(dux, duy, duz)
        # coordinate_system(ns) first axis (core/vec.py convention)
        big_x = jnp.abs(nsx) > jnp.abs(nsy)
        inv_a = lax.rsqrt(
            jnp.maximum(jnp.where(big_x, nsx * nsx + nsz * nsz, nsy * nsy + nsz * nsz), 1e-30)
        )
        fbx = jnp.where(big_x, -nsz, 0.0) * inv_a
        fby = jnp.where(big_x, 0.0, nsz) * inv_a
        fbz = jnp.where(big_x, nsx, -nsy) * inv_a
        bad = du2 < 1e-20
        ssx = jnp.where(bad, fbx, ssx)
        ssy = jnp.where(bad, fby, ssy)
        ssz = jnp.where(bad, fbz, ssz)
        tsx = nsy * ssz - nsz * ssy
        tsy = nsz * ssx - nsx * ssz
        tsz = nsx * ssy - nsy * ssx

        # wo = -d (world) in the local frame; wo_z is LOCAL (ns), wo_ng
        # is the geometric-side projection (reflect checks + etaScale
        # entering test use ng: eval.py:779, path.py:100)
        wox, woy, woz = -dx, -dy, -dz
        wol_x = _dot3(wox, woy, woz, ssx, ssy, ssz)
        wol_y = _dot3(wox, woy, woz, tsx, tsy, tsz)
        wo_z = _dot3(wox, woy, woz, nsx, nsy, nsz)
        wo_ng = wo_z if not smooth else _dot3(wox, woy, woz, ngx, ngy, ngz)

        # ---- NEE (uniform_sample_one_light, integrator/mod.rs:359-401) --
        # slot layout must match integrators/path.py (sampler/dims.py)
        from ..sampler.dims import path_dim0

        dim0 = path_dim0(bounce)
        # shadow-origin offset scale, shared with the bounce-ray spawn
        mag = jnp.abs(px) + jnp.abs(py) + jnp.abs(pz)
        eps = 1e-4 + 1e-5 * mag
        if all_point:
            # fast path: delta lights only — no u_light, no MIS
            # (common.py:336-356 semantics; round-2 code kept verbatim)
            u_pick = sdim(dim0, False)
            li_idx = jnp.minimum(
                (u_pick * n_lights).astype(jnp.int32), n_lights - 1
            )
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
            wil_x = _dot3(wix, wiy, wiz, ssx, ssy, ssz)
            wil_y = _dot3(wix, wiy, wiz, tsx, tsy, tsz)
            wil_z = _dot3(wix, wiy, wiz, nsx, nsy, nsz)
            wi_ng = wil_z if not smooth else _dot3(wix, wiy, wiz, ngx, ngy, ngz)
            # f = sum of lobe_f over live lobes, reflection-side gated
            # (bsdf_f_pdf: use_f = reflect & is_refl on GEOMETRIC ng,
            # eval.py:779; subset lobes reflect)
            reflect_side = (wi_ng * wo_ng) > 0.0
            f_gate = reflect_side & (wo_z != 0.0)
            fnr = jnp.zeros_like(px)
            fng = jnp.zeros_like(px)
            fnb = jnp.zeros_like(px)
            for l in range(max_lobes):
                lf = _lobe_f_k(
                    lobs[l], wol_x, wol_y, wo_z, wil_x, wil_y, wil_z,
                    kinds_present,
                )
                use = f_gate & (l < n_lob)
                fnr = fnr + jnp.where(use, lf[0], 0.0)
                fng = fng + jnp.where(use, lf[1], 0.0)
                fnb = fnb + jnp.where(use, lf[2], 0.0)
            cos_ns = jnp.abs(wil_z)  # absdot(wi, ns)
            # shadow ray: offset origin toward light, t_max = 1 - eps
            off = jnp.where(wi_ng < 0.0, -eps, eps)
            sox = px + ngx * off
            soy = py + ngy * off
            soz = pz + ngz * off
            sdx, sdy, sdz = lpx - sox, lpy - soy, lpz - soz
            occ = occluded_all(
                sox, soy, soz, sdx, sdy, sdz,
                jnp.full(px.shape, 1.0 - SHADOW_EPSILON, jnp.float32),
            )
            li_scale = jnp.where(active & ~occ, cos_ns * n_lights / dist2, 0.0)
            Lr = Lr + br * fnr * ler * li_scale
            Lg = Lg + bg * fng * leg * li_scale
            Lb = Lb + bb * fnb * leb * li_scale
        elif n_lights > 0:
            # generic branch: area / env lights with the MIS power
            # heuristic (estimate_direct, integrator/mod.rs:403-558)
            u_pick = sdim(dim0, False)
            li_idx = jnp.minimum(
                (u_pick * n_lights).astype(jnp.int32), n_lights - 1
            )
            u_l0, u_l1 = sdim(dim0 + 1, True)
            ls = _nee_light_k(wide, li_idx, px, py, pz, u_l0, u_l1)
            wix, wiy, wiz = ls["wi"]
            lir, lig, lib = ls["li"]
            plx, ply, plz = ls["p_light"]
            wil_x = _dot3(wix, wiy, wiz, ssx, ssy, ssz)
            wil_y = _dot3(wix, wiy, wiz, tsx, tsy, tsz)
            wil_z = _dot3(wix, wiy, wiz, nsx, nsy, nsz)
            wi_ng = wil_z if not smooth else _dot3(wix, wiy, wiz, ngx, ngy, ngz)
            reflect_side = (wi_ng * wo_ng) > 0.0
            f_gate = reflect_side & (wo_z != 0.0)
            fnr = jnp.zeros_like(px)
            fng = jnp.zeros_like(px)
            fnb = jnp.zeros_like(px)
            # scattering pdf for MIS: mean of matching (non-specular) lobe
            # pdfs (bsdf_f_pdf with ALL & ~SPECULAR flags)
            pdf_scat = jnp.zeros_like(px)
            cnt = jnp.zeros(px.shape, jnp.int32)
            for l in range(max_lobes):
                lob = lobs[l]
                sm_l = _spec_mask(lob, kinds_present)
                m_l = l < n_lob
                if sm_l is True:
                    m_l = jnp.zeros(px.shape, bool)
                elif sm_l is not None:
                    m_l = m_l & ~sm_l
                lf = _lobe_f_k(
                    lobs[l], wol_x, wol_y, wo_z, wil_x, wil_y, wil_z,
                    kinds_present,
                )
                use = f_gate & m_l
                fnr = fnr + jnp.where(use, lf[0], 0.0)
                fng = fng + jnp.where(use, lf[1], 0.0)
                fnb = fnb + jnp.where(use, lf[2], 0.0)
                lp = _lobe_pdf_k(
                    lobs[l], wol_x, wol_y, wo_z, wil_x, wil_y, wil_z,
                    kinds_present,
                )
                pdf_scat = pdf_scat + jnp.where(m_l, lp, 0.0)
                cnt = cnt + m_l.astype(jnp.int32)
            pdf_scat = jnp.where(
                (wo_z != 0.0) & (cnt > 0),
                pdf_scat / jnp.maximum(cnt, 1).astype(jnp.float32),
                0.0,
            )
            cos_ns = jnp.abs(wil_z)
            fnr_c = fnr * cos_ns
            fng_c = fng * cos_ns
            fnb_c = fnb * cos_ns
            weight = jnp.where(
                ls["delta"], 1.0, _power_heuristic_k(ls["pdf"], pdf_scat)
            )
            off = jnp.where(wi_ng < 0.0, -eps, eps)
            sox = px + ngx * off
            soy = py + ngy * off
            soz = pz + ngz * off
            sdx, sdy, sdz = plx - sox, ply - soy, plz - soz
            occ = occluded_all(
                sox, soy, soz, sdx, sdy, sdz,
                jnp.full(px.shape, 1.0 - SHADOW_EPSILON, jnp.float32),
            )
            any_li = (lir > 0.0) | (lig > 0.0) | (lib > 0.0)
            any_f = (fnr_c > 0.0) | (fng_c > 0.0) | (fnb_c > 0.0)
            live = active & (ls["pdf"] > 0.0) & any_li & any_f & ~occ
            scale = jnp.where(
                live, weight * n_lights / jnp.maximum(ls["pdf"], 1e-20), 0.0
            )
            Lr = Lr + br * fnr_c * lir * scale
            Lg = Lg + bg * fng_c * lig * scale
            Lb = Lb + bb * fnb_c * lib * scale

            # BSDF-sampling counter branch (integrator/mod.rs:483-558):
            # surface hits never identify the sampled light (the aggregate
            # carries no emissive prims), so only escaped rays toward the
            # sampled INFINITE light contribute — statically skipped for
            # area-only scenes
            if has_env_nee:
                us0, us1 = sdim(dim0 + 2, True)
                smp2 = _bsdf_sample_k(
                    lobs, n_lob, wol_x, wol_y, wo_z, us0, us1,
                    kinds_present, max_lobes,
                )
                w2x = ssx * smp2["wsx"] + tsx * smp2["wsy"] + nsx * smp2["wsz"]
                w2y = ssy * smp2["wsx"] + tsy * smp2["wsy"] + nsy * smp2["wsz"]
                w2z = ssz * smp2["wsx"] + tsz * smp2["wsy"] + nsz * smp2["wsz"]
                cos2 = jnp.abs(_dot3(w2x, w2y, w2z, nsx, nsy, nsz))
                f2 = tuple(fc * cos2 for fc in smp2["f"])
                env = ls["env"]
                lpdf2 = _env_pdf_dir_k(env, w2x, w2y, w2z)
                w2mis = _power_heuristic_k(smp2["pdf"], lpdf2)
                w2_ng = _dot3(w2x, w2y, w2z, ngx, ngy, ngz)
                off2n = jnp.where(w2_ng < 0.0, -eps, eps)
                escaped = ~occluded_all(
                    px + ngx * off2n, py + ngy * off2n, pz + ngz * off2n,
                    w2x, w2y, w2z,
                    jnp.full(px.shape, jnp.inf, jnp.float32),
                )
                any_f2 = (f2[0] > 0.0) | (f2[1] > 0.0) | (f2[2] > 0.0)
                live2 = (
                    active & ls["sel_env"] & (n_lob > 0) & (wo_z != 0.0)
                    & any_f2 & (smp2["pdf"] > 0.0) & (lpdf2 > 0.0) & escaped
                )
                scale2 = jnp.where(
                    live2,
                    w2mis * n_lights / jnp.maximum(smp2["pdf"], 1e-20),
                    0.0,
                )
                Lr = Lr + br * f2[0] * env.rgb[0] * scale2
                Lg = Lg + bg * f2[1] * env.rgb[1] * scale2
                Lb = Lb + bb * f2[2] * env.rgb[2] * scale2

        # ---- sample the BSDF (bsdf_sample, REFERENCE_QUIRKS-exact) ----
        ub0, ub1 = sdim(dim0 + 3, True)
        smp = _bsdf_sample_k(
            lobs, n_lob, wol_x, wol_y, wo_z, ub0, ub1,
            kinds_present, max_lobes,
        )
        wsx, wsy, wsz = smp["wsx"], smp["wsy"], smp["wsz"]
        fs, pdf = smp["f"], smp["pdf"]
        is_st_c, is_fs_c = smp["is_st_c"], smp["is_fs_c"]
        fs_reflect = smp["fs_reflect"]

        # wi world = ss*x + ts*y + ns*z
        nwx = ssx * wsx + tsx * wsy + nsx * wsz
        nwy = ssy * wsx + tsy * wsy + nsy * wsz
        nwz = ssz * wsx + tsz * wsy + nsz * wsz
        cosw = jnp.abs(_dot3(nwx, nwy, nwz, nsx, nsy, nsz))
        any_f = (fs[0] != 0.0) | (fs[1] != 0.0) | (fs[2] != 0.0)
        ok = (
            active & (n_lob > 0) & (wo_z != 0.0) & (pdf > 0.0) & any_f
        )
        inv_pdf = cosw / jnp.maximum(pdf, 1e-20)
        br = jnp.where(ok, br * fs[0] * inv_pdf, br)
        bg = jnp.where(ok, bg * fs[1] * inv_pdf, bg)
        bb = jnp.where(ok, bb * fs[2] * inv_pdf, bb)
        active = active & ok

        # specular_bounce tracking (path.rs:145-148) for escape-le gating
        if esc_rgb is not None and has_spec:
            sp = None
            for mk in (smp["is_sr_c"], is_st_c, is_fs_c):
                if mk is False:
                    continue
                arr = jnp.ones_like(active) if mk is True else mk
                sp = arr if sp is None else (sp | arr)
            spec_prev = sp

        # etaScale tracking (path.rs:150-163)
        if has_st:
            spec_trans_sampled = is_st_c
            if LOBE_FRESNEL_SPEC in kinds_present:
                fs_trans = (
                    ~fs_reflect if is_fs_c is True else (is_fs_c & ~fs_reflect)
                )
                spec_trans_sampled = (
                    fs_trans
                    if spec_trans_sampled is False
                    else spec_trans_sampled | fs_trans
                )
            e2 = mat_eta * mat_eta
            # entering test on the GEOMETRIC normal (path.py:100)
            eta_fac = jnp.where(wo_ng > 0.0, e2, 1.0 / jnp.maximum(e2, 1e-20))
            if spec_trans_sampled is not False:
                upd = active & (
                    spec_trans_sampled
                    if spec_trans_sampled is not True
                    else jnp.ones_like(active)
                )
                es = jnp.where(upd, es * eta_fac, es)

        # next ray: offset along ng by sampled direction side
        wi_ng2 = _dot3(nwx, nwy, nwz, ngx, ngy, ngz)
        off2 = jnp.where(wi_ng2 < 0.0, -eps, eps)
        ox = jnp.where(active, px + ngx * off2, ox)
        oy = jnp.where(active, py + ngy * off2, oy)
        oz = jnp.where(active, pz + ngz * off2, oz)
        dx = jnp.where(active, nwx, dx)
        dy = jnp.where(active, nwy, dy)
        dz = jnp.where(active, nwz, dz)

        # ---- BSSRDF branch (path.rs:166-210; bsdf/bssrdf.py in-kernel).
        # Statically enabled when the scene's single material carries the
        # Burley BSSRDF: spec-trans bounces re-emerge at a profile-sampled
        # exit point with the Sw adapter.  Probe chain = PROBE_SEGMENTS
        # bounded re-casts; same-material test collapses to hit-found
        # (supports() pins one used material, triangles only). ----
        bssc = wide.bssrdf
        if bssc is not None and has_st:
            st_smp = smp["is_st_c"]
            if st_smp is True:
                st_smp = jnp.ones_like(active)
            elif st_smp is False:
                st_smp = jnp.zeros_like(active)
            is_trans = active & st_smp
            u1b = sdim(dim0 + 5, False)
            u2b0, u2b1 = sdim(dim0 + 6, True)

            def probe_hit(cx, cy, cz, pdx, pdy, pdz, alive_m):
                if bvh_refs is None:
                    o2 = _closest_hit(
                        tri_ref, n_tris, cx, cy, cz, pdx, pdy, pdz, attr_cols,
                        chunks=wide.chunks, live=alive_m,
                    )
                else:
                    o2 = _bvh_closest_hit(
                        bvh_refs, tri_ref, cx, cy, cz, pdx, pdy, pdz,
                        alive_m, max_leaf, len(attr_cols),
                    )
                return o2[0], o2[1], o2[2], o2[3]

            # projection axis (bssrdf.rs:118-141): 1/2 ns, 1/4 each tangent
            ub = u1b
            sel0 = ub < 0.5
            sel1 = (ub >= 0.5) & (ub < 0.75)
            ub = jnp.where(
                sel0, ub * 2.0,
                jnp.where(sel1, (ub - 0.5) * 4.0, (ub - 0.75) * 4.0),
            )

            def _axsel(a, b, c):
                return jnp.where(sel0, a, jnp.where(sel1, b, c))

            vxx = _axsel(ssx, tsx, ngx)
            vxy = _axsel(ssy, tsy, ngy)
            vxz = _axsel(ssz, tsz, ngz)
            vyx = _axsel(tsx, ngx, ssx)
            vyy = _axsel(tsy, ngy, ssy)
            vyz = _axsel(tsz, ngz, ssz)
            vzx = _axsel(ngx, ssx, tsx)
            vzy = _axsel(ngy, ssy, tsy)
            vzz = _axsel(ngz, ssz, tsz)

            # channel + the reference's u*u*N remap quirk (bssrdf.rs:143-145)
            chb = jnp.clip((ub * 3.0).astype(jnp.int32), 0, 2)
            ub = ub * ub * 3.0 - chb.astype(jnp.float32)
            d_ch = jnp.where(
                chb == 0, bssc.d[0], jnp.where(chb == 1, bssc.d[1], bssc.d[2])
            )
            r_b = _sample_sr_k(d_ch, u2b0)
            u999 = jnp.minimum(
                (jnp.float32(0.999) - 0.25) / 0.75, ONE_MINUS_EPSILON
            )
            r_mx = 3.0 * d_ch * jnp.log(1.0 / (1.0 - u999))
            ok_b = is_trans & (r_b >= 0.0) & (r_b < r_mx)
            l_ch = 2.0 * jnp.sqrt(jnp.maximum(r_mx * r_mx - r_b * r_b, 0.0))
            phi_b = 2.0 * PI * u2b1
            cphi = jnp.cos(phi_b)
            sphi = jnp.sin(phi_b)
            bx = px + (vxx * cphi + vyx * sphi) * r_b - vzx * (l_ch * 0.5)
            by = py + (vxy * cphi + vyy * sphi) * r_b - vzy * (l_ch * 0.5)
            bz = pz + (vxz * cphi + vyz * sphi) * r_b - vzz * (l_ch * 0.5)
            tgx = bx + vzx * l_ch
            tgy = by + vzy * l_ch
            tgz = bz + vzz * l_ch

            cxp, cyp, czp = bx, by, bz
            alive_b = ok_b
            fpx = []
            fpy = []
            fpz = []
            fnx = []
            fny = []
            fnz = []
            fvs = []
            for _k in range(PROBE_SEGMENTS):
                sgx, sgy, sgz = tgx - cxp, tgy - cyp, tgz - czp
                sl = jnp.sqrt(
                    jnp.maximum(sgx * sgx + sgy * sgy + sgz * sgz, 0.0)
                )
                inv_sl = 1.0 / jnp.maximum(sl, 1e-20)
                pdx, pdy, pdz = sgx * inv_sl, sgy * inv_sl, sgz * inv_sl
                tpb, pnx, pny, pnz = probe_hit(
                    cxp, cyp, czp, pdx, pdy, pdz, alive_b
                )
                gk = alive_b & (tpb < sl * (1.0 - 1e-4)) & (sl > 1e-9)
                hxp = cxp + pdx * tpb
                hyp = cyp + pdy * tpb
                hzp = czp + pdz * tpb
                fpx.append(jnp.where(gk, hxp, 0.0))
                fpy.append(jnp.where(gk, hyp, 0.0))
                fpz.append(jnp.where(gk, hzp, 0.0))
                fnx.append(pnx)
                fny.append(pny)
                fnz.append(pnz)
                fvs.append(gk)
                magb = jnp.abs(hxp) + jnp.abs(hyp) + jnp.abs(hzp)
                epsb = 1e-4 + 1e-5 * magb
                offb = jnp.where(
                    pdx * pnx + pdy * pny + pdz * pnz < 0.0, -epsb, epsb
                )
                cxp = jnp.where(gk, hxp + pnx * offb, cxp)
                cyp = jnp.where(gk, hyp + pny * offb, cyp)
                czp = jnp.where(gk, hzp + pnz * offb, czp)
                alive_b = gk

            nf = fvs[0].astype(jnp.int32)
            for _k in range(1, PROBE_SEGMENTS):
                nf = nf + fvs[_k].astype(jnp.int32)
            ok_b = ok_b & (nf > 0)
            pick = jnp.clip(
                (ub * nf.astype(jnp.float32)).astype(jnp.int32),
                0,
                jnp.maximum(nf - 1, 0),
            )
            cumv = jnp.zeros_like(nf)
            ex = jnp.zeros_like(px)
            ey = jnp.zeros_like(px)
            ez = jnp.zeros_like(px)
            enx = jnp.zeros_like(px)
            eny = jnp.zeros_like(px)
            enz = jnp.zeros_like(px)
            for _k in range(PROBE_SEGMENTS):
                cumv = cumv + fvs[_k].astype(jnp.int32)
                selk = fvs[_k] & (cumv == pick + 1)
                ex = jnp.where(selk, fpx[_k], ex)
                ey = jnp.where(selk, fpy[_k], ey)
                ez = jnp.where(selk, fpz[_k], ez)
                enx = jnp.where(selk, fnx[_k], enx)
                eny = jnp.where(selk, fny[_k], eny)
                enz = jnp.where(selk, fnz[_k], enz)

            # pdf_sp (bssrdf.rs:195-232): 3 axes x 3 channels / nf
            dvx, dvy, dvz = px - ex, py - ey, pz - ez
            dl0 = _dot3(ssx, ssy, ssz, dvx, dvy, dvz)
            dl1 = _dot3(tsx, tsy, tsz, dvx, dvy, dvz)
            dl2 = _dot3(ngx, ngy, ngz, dvx, dvy, dvz)
            nl0 = _dot3(ssx, ssy, ssz, enx, eny, enz)
            nl1 = _dot3(tsx, tsy, tsz, enx, eny, enz)
            nl2 = _dot3(ngx, ngy, ngz, enx, eny, enz)
            rp0 = jnp.sqrt(jnp.maximum(dl1 * dl1 + dl2 * dl2, 0.0))
            rp1 = jnp.sqrt(jnp.maximum(dl2 * dl2 + dl0 * dl0, 0.0))
            rp2 = jnp.sqrt(jnp.maximum(dl0 * dl0 + dl1 * dl1, 0.0))
            pdf_b = jnp.zeros_like(px)
            for rp, nl, aprob in (
                (rp0, nl0, 0.25), (rp1, nl1, 0.25), (rp2, nl2, 0.5)
            ):
                anl = jnp.abs(nl)
                for c in range(3):
                    pdf_b = pdf_b + _pdf_sr_k(bssc.d[c], rp) * anl * aprob
            pdf_b = pdf_b * (1.0 / 3.0)
            pdf_b = pdf_b / jnp.maximum(nf.astype(jnp.float32), 1.0)
            dist_b = jnp.sqrt(
                jnp.maximum(dvx * dvx + dvy * dvy + dvz * dvz, 0.0)
            )
            rr_b = jnp.maximum(dist_b, 1e-6)
            sp3 = tuple(
                bssc.R[c]
                * (jnp.exp(-rr_b / bssc.d[c]) + jnp.exp(-rr_b / (3.0 * bssc.d[c])))
                / (8.0 * PI * bssc.d[c] * rr_b)
                for c in range(3)
            )
            valid_b = ok_b & (pdf_b > 0.0)
            got = is_trans & valid_b
            inv_pb = 1.0 / jnp.maximum(pdf_b, 1e-20)
            br = jnp.where(got, br * sp3[0] * inv_pb, br)
            bg = jnp.where(got, bg * sp3[1] * inv_pb, bg)
            bb = jnp.where(got, bb * sp3[2] * inv_pb, bb)
            # boolean algebra, not jnp.where: Mosaic lowers an i1-vector
            # select through an unsupported i8->i1 trunci (got already
            # includes is_trans, so the select collapses to this form)
            active = (active & ~is_trans) | got

            # exit NEE: uniform one-light pick, Sw adapter (path.py:160-176)
            if n_lights > 0:
                u_pk = sdim(dim0 + 7, False)
                li2 = jnp.minimum(
                    (u_pk * n_lights).astype(jnp.int32), n_lights - 1
                )
                l2x = jnp.zeros_like(px)
                l2y = jnp.zeros_like(px)
                l2z = jnp.zeros_like(px)
                e2r = jnp.zeros_like(px)
                e2g = jnp.zeros_like(px)
                e2b = jnp.zeros_like(px)
                for k in range(n_lights):
                    sel = li2 == k
                    l2x = jnp.where(sel, lights_p[k][0], l2x)
                    l2y = jnp.where(sel, lights_p[k][1], l2y)
                    l2z = jnp.where(sel, lights_p[k][2], l2z)
                    e2r = jnp.where(sel, lights_emit[k][0], e2r)
                    e2g = jnp.where(sel, lights_emit[k][1], e2g)
                    e2b = jnp.where(sel, lights_emit[k][2], e2b)
                t2x, t2y, t2z = l2x - ex, l2y - ey, l2z - ez
                d2b = jnp.maximum(t2x * t2x + t2y * t2y + t2z * t2z, 1e-20)
                inv_db = lax.rsqrt(d2b)
                w2x_ = t2x * inv_db
                w2y_ = t2y * inv_db
                w2z_ = t2z * inv_db
                cwi = _dot3(w2x_, w2y_, w2z_, enx, eny, enz)
                fsw = _sw_f_k(bssc, cwi) * jnp.abs(cwi)
                magE = jnp.abs(ex) + jnp.abs(ey) + jnp.abs(ez)
                epsE = 1e-4 + 1e-5 * magE
                offE = jnp.where(
                    _dot3(t2x, t2y, t2z, enx, eny, enz) < 0.0, -epsE, epsE
                )
                sxo = ex + enx * offE
                syo = ey + eny * offE
                szo = ez + enz * offE
                occ2 = occluded_all(
                    sxo, syo, szo, l2x - sxo, l2y - syo, l2z - szo,
                    jnp.where(got, 1.0 - SHADOW_EPSILON, 0.0),
                )
                nee2 = got & ~occ2
                sc2 = jnp.where(nee2, fsw * float(n_lights) / d2b, 0.0)
                Lr = Lr + br * e2r * sc2
                Lg = Lg + bg * e2g * sc2
                Lb = Lb + bb * e2b * sc2

            # indirect: cosine-sample the Sw adapter at the exit point
            uo0, uo1 = sdim(dim0 + 9, True)
            dxo2, dyo2 = _concentric_disk(uo0, uo1)
            zo = jnp.sqrt(
                jnp.maximum(0.0, 1.0 - dxo2 * dxo2 - dyo2 * dyo2)
            )
            # vec.coordinate_system(ns) componentwise (a1, a2 = cross)
            use_x2 = jnp.abs(enx) > jnp.abs(eny)
            inv_a2 = 1.0 / jnp.sqrt(
                jnp.where(use_x2, enx * enx + enz * enz, eny * eny + enz * enz)
            )
            a1x = jnp.where(use_x2, -enz, 0.0) * inv_a2
            a1y = jnp.where(use_x2, 0.0, enz) * inv_a2
            a1z = jnp.where(use_x2, enx, -eny) * inv_a2
            a2x = eny * a1z - enz * a1y
            a2y = enz * a1x - enx * a1z
            a2z = enx * a1y - eny * a1x
            wox2 = a1x * dxo2 + a2x * dyo2 + enx * zo
            woy2 = a1y * dxo2 + a2y * dyo2 + eny * zo
            woz2 = a1z * dxo2 + a2z * dyo2 + enz * zo
            cos_o2 = jnp.maximum(zo, 1e-9)
            swo = _sw_f_k(bssc, cos_o2) * PI
            br = jnp.where(got, br * swo, br)
            bg = jnp.where(got, bg * swo, bg)
            bb = jnp.where(got, bb * swo, bb)
            magO = jnp.abs(ex) + jnp.abs(ey) + jnp.abs(ez)
            epsO = 1e-4 + 1e-5 * magO
            offO = jnp.where(
                _dot3(wox2, woy2, woz2, enx, eny, enz) < 0.0, -epsO, epsO
            )
            ox = jnp.where(got, ex + enx * offO, ox)
            oy = jnp.where(got, ey + eny * offO, oy)
            oz = jnp.where(got, ez + enz * offO, oz)
            dx = jnp.where(got, wox2, dx)
            dy = jnp.where(got, woy2, dy)
            dz = jnp.where(got, woz2, dz)
            if spec_prev is not None:
                spec_prev = spec_prev & ~got

        # ---- Russian roulette (path.rs:212-222) on beta * etaScale ----
        if bounce > 3:
            beta_max = jnp.maximum(br, jnp.maximum(bg, bb)) * es
            do_rr = active & (beta_max < rr_threshold)
            q = jnp.maximum(0.05, 1.0 - beta_max)
            u_rr = sdim(dim0 + 4, False)
            killed = do_rr & (u_rr < q)
            active = active & ~killed
            surv = do_rr & ~killed
            inv_q = 1.0 / jnp.maximum(1.0 - q, 1e-9)
            br = jnp.where(surv, br * inv_q, br)
            bg = jnp.where(surv, bg * inv_q, bg)
            bb = jnp.where(surv, bb * inv_q, bb)

    return Lr, Lg, Lb


def _parse_rest(rest, wide, hal_slots, n_outs, n_bvh_scr):
    """(u_r, tex_refs, outs, bvh_scratch) from a kernel's *rest.

    Positional layout (pallas_call order: inputs, outputs, scratch):
      [u_r when halton] [tex_table when textured]
      <n_outs output refs>
      <n_bvh_scr BVH scratch refs> [scr_in, scr_out when textured]
    """
    textured = getattr(wide, "tex", None) is not None
    i = 0
    u_r = None
    if hal_slots is not None:
        u_r = rest[i]
        i += 1
    tex_tbl = None
    if textured:
        tex_tbl = rest[i]
        i += 1
    outs = rest[i : i + n_outs]
    scr = rest[i + n_outs :]
    bvh_scr = scr[:n_bvh_scr]
    tex_refs = (tex_tbl, scr[n_bvh_scr], scr[n_bvh_scr + 1]) if textured \
        else None
    return u_r, tex_refs, outs, bvh_scr


def _kernel(
    tri_ref,
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r,
    *rest,
    n_tris, wide, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, hal_slots=None,
):
    u_r, tex_refs, (lr_o, lg_o, lb_o), _ = _parse_rest(
        rest, wide, hal_slots, 3, 0
    )
    Lr, Lg, Lb = _bounce_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:] > 0.0, pid_r[:], sid_r[:],
        n_tris, wide, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        u_ref=u_r, hal_slots=hal_slots, tex_refs=tex_refs,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb


def _kernel_bvh(
    nodes_f_ref, nodes_i_ref, tri_ref,
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r,
    *rest,
    n_tris, wide, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, max_leaf,
    hal_slots=None,
):
    u_r, tex_refs, (lr_o, lg_o, lb_o), bvh_scr = _parse_rest(
        rest, wide, hal_slots, 3, 4
    )
    stack_ref, t_ref, best_ref, attr_ref = bvh_scr
    Lr, Lg, Lb = _bounce_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:] > 0.0, pid_r[:], sid_r[:],
        n_tris, wide, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        bvh_refs=(nodes_f_ref, nodes_i_ref, stack_ref, t_ref, best_ref,
                  attr_ref),
        max_leaf=max_leaf,
        u_ref=u_r, hal_slots=hal_slots, tex_refs=tex_refs,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb


def _bvh_call_extras(rows, kinds_present, max_lobes, interpret,
                     extra_attrs=0, smooth=False, textured=False):
    """(scratch_shapes, compiler kwargs) shared by both BVH-mode runs.
    extra_attrs: additional trailing attr columns (the SPPM kernels add
    the material id)."""
    n_attr = len(
        _attr_cols(kinds_present, max_lobes, smooth, textured)
    ) + extra_attrs
    scratch = [
        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        pltpu.VMEM((rows, LANES), jnp.float32),
        pltpu.VMEM((rows, LANES), jnp.int32),
        pltpu.VMEM((n_attr, rows, LANES), jnp.float32),
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return scratch, kwargs


def _tex_call_extras(wide, tex_table, rows, two_level):
    """(extra inputs, extra in_specs, extra scratch) for textured runs:
    the packed bf16 table rides whole-array VMEM; the tile lookup needs
    its plane and output scratch (ops/tex_tile.py)."""
    from . import tex_tile

    tex = getattr(wide, "tex", None)
    if tex is None:
        return (), [], []
    scratch = [
        pltpu.VMEM(
            (rows, tex_tile.n_scratch_planes(two_level), LANES),
            jnp.float32,
        ),
        pltpu.VMEM((rows, tex.channels, LANES), jnp.float32),
    ]
    return (tex_table,), [pl.BlockSpec(memory_space=pltpu.VMEM)], scratch


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "wide", "max_depth", "rr_threshold",
        "spp", "xs", "ys", "jitter", "seed", "kinds_present", "max_lobes",
        "max_leaf", "hal_slots", "interpret",
    ),
)
def _run(
    table, nodes_f, nodes_i, ox, oy, oz, dx, dy, dz, w, pid, sid,
    n_tris, wide, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, max_leaf=None,
    u=None, hal_slots=None, tex_table=None,
    interpret=False,
):
    m = ox.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    u_in, u_specs = (), []
    if hal_slots is not None:
        nc = u.shape[0]
        u_in = (u,)
        u_specs = [pl.BlockSpec(
            (nc, rows, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )]
    tex_in, tex_specs, tex_scratch = _tex_call_extras(
        wide, tex_table, rows, two_level=False
    )
    u_in = u_in + tex_in
    u_specs = u_specs + tex_specs
    if use_bvh:
        kernel = functools.partial(
            _kernel_bvh,
            n_tris=n_tris, wide=wide,
            max_depth=max_depth, rr_threshold=rr_threshold,
            spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed,
            kinds_present=kinds_present, max_lobes=max_lobes,
            max_leaf=max_leaf, hal_slots=hal_slots,
        )
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret,
            smooth=bool(getattr(wide, "smooth", False)),
            textured=getattr(wide, "tex", None) is not None,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 9 + u_specs,
            out_specs=[ray_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 3,
            scratch_shapes=scratch + tex_scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, ox, oy, oz, dx, dy, dz, w, pid, sid,
          *u_in)
    kernel = functools.partial(
        _kernel,
        n_tris=n_tris,
        wide=wide,
        max_depth=max_depth,
        rr_threshold=rr_threshold,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed,
        kinds_present=kinds_present, max_lobes=max_lobes,
        hal_slots=hal_slots,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 9 + u_specs,
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 3,
        scratch_shapes=tex_scratch,
        interpret=interpret,
    )(table, ox, oy, oz, dx, dy, dz, w, pid, sid, *u_in)
    return outs


def _sampler_payload(
    sampler, wide, kinds_present, spec, pid, s_arr, prep, with_cam,
    grid=None,
):
    """(hal_slots, u, samp_static) for a megakernel launch: stratified
    samplers keep the in-kernel hash math (u None); Halton samplers ship
    their slot values as a (NC, n_blocks, LANES) input computed by the
    production HaltonSampler — exact parity, any spp.

    grid=(s_base, k, w, h): the batch is render.py's raster-tiled
    sample-outer full-film layout — slot values then come from
    HaltonSampler.payload_grid (the 128x128 CRT-offset grid tiled to the
    film: ~14x less radical-inverse compute, bit-identical values)."""
    from ..sampler.halton import HaltonSampler

    samp_static = dict(
        spp=int(sampler.spp),
        xs=int(getattr(sampler, "xs", 1)),
        ys=int(getattr(sampler, "ys", 1)),
        jitter=bool(getattr(sampler, "jitter", False)),
        seed=int(sampler.seed),
    )
    if not isinstance(sampler, HaltonSampler):
        return None, None, samp_static
    lights = wide.lights
    n_lights = len(lights)
    all_point = n_lights > 0 and all(l.kind == LIGHT_POINT for l in lights)
    has_env_nee = any(l.kind == LIGHT_INFINITE for l in lights)
    has_bssrdf = wide.bssrdf is not None and _has_spec_trans(kinds_present)
    hal_slots = _used_slots(
        int(spec.max_depth), n_lights, all_point, has_env_nee, has_bssrdf,
        with_cam,
    )
    umat = None
    if grid is not None:
        s_base, k, w, h = grid
        umat = sampler.payload_grid(hal_slots, s_base, k, w, h)
    if umat is None:
        umat = _halton_u(sampler, pid, s_arr, hal_slots)  # (NC, N)
    u = jnp.stack([prep(umat[c]) for c in range(umat.shape[0])], 0)
    return hal_slots, u, samp_static


def li_path_mega(
    ctx, packed, o, d, cam_weight, sampler, pixel_id, s_idx, spec, interpret=False
):
    """Drop-in replacement for integrators.path.li_path on the supported
    subset.  packed = pack_scene(ctx) built once per scene.  The sampler's
    bounce dimensions are evaluated inside the kernel (same hash math)."""
    (table, lights_p, lights_emit, kinds_present, max_lobes, wide,
     bvh, tex_table) = packed
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
    pid_arr = jnp.asarray(pixel_id, jnp.uint32)
    hal_slots, u, samp_static = _sampler_payload(
        sampler, wide, kinds_present, spec, pid_arr, s_arr, prep,
        with_cam=False,
    )
    lr, lg, lb = _run(
        table, nodes_f, nodes_i,
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(cam_weight.astype(jnp.float32)),
        prep(pid_arr), prep(s_arr),
        n_tris=int(table.shape[0]), wide=wide,
        max_depth=int(spec.max_depth), rr_threshold=float(spec.rr_threshold),
        **samp_static,
        kinds_present=kinds_present, max_lobes=max_lobes,
        max_leaf=max_leaf,
        u=u, hal_slots=hal_slots, tex_table=tex_table,
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


def _raygen(px, py, sdim, cam):
    """Componentwise generate_rays on the tile.  Returns
    (ox, oy, oz, dx, dy, dz, weight) in world space."""
    uf0, uf1 = sdim(0, True)
    ul0, ul1 = sdim(1, True)
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


def _raygen_with_diff(px, py, sdim, cam, wide, spp):
    """Primary rays + (for textured scenes) camera-FD ray differentials
    (camera/realistic.py generate_ray_differentials: +0.05px shifted film
    points through the SAME lens sample, offsets scaled by 1/sqrt(spp),
    dead where the shifted trace dies)."""
    ox, oy, oz, dx, dy, dz, weight = _raygen(px, py, sdim, cam)
    if getattr(wide, "tex", None) is None:
        return ox, oy, oz, dx, dy, dz, weight, None
    eps = 0.05
    s_ = 1.0 / float(np.sqrt(max(spp, 1)))
    xo0, xo1, xo2, xd0, xd1, xd2, wx = _raygen(px + eps, py, sdim, cam)
    yo0, yo1, yo2, yd0, yd1, yd2, wy = _raygen(px, py + eps, sdim, cam)
    okx = wx > 0.0
    oky = wy > 0.0
    fd = lambda b, s, ok: jnp.where(ok, b + (s - b) / eps * s_, b)
    diff = (
        fd(ox, xo0, okx), fd(oy, xo1, okx), fd(oz, xo2, okx),
        fd(dx, xd0, okx), fd(dy, xd1, okx), fd(dz, xd2, okx),
        fd(ox, yo0, oky), fd(oy, yo1, oky), fd(oz, yo2, oky),
        fd(dx, yd0, oky), fd(dy, yd1, oky), fd(dz, yd2, oky),
    )
    return ox, oy, oz, dx, dy, dz, weight, diff


def _kernel_cam(
    tri_ref,
    px_r, py_r, pid_r, sid_r,
    *rest,
    n_tris, wide, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes,
    hal_slots=None,
):
    u_r, tex_refs, (lr_o, lg_o, lb_o, w_o), _ = _parse_rest(
        rest, wide, hal_slots, 4, 0
    )
    pid = pid_r[:]
    sid = sid_r[:]
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, u_r, hal_slots)
    ox, oy, oz, dx, dy, dz, weight, diff = _raygen_with_diff(
        px_r[:], py_r[:], sdim, cam, wide, spp
    )
    Lr, Lg, Lb = _bounce_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight > 0.0, pid, sid,
        n_tris, wide, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        u_ref=u_r, hal_slots=hal_slots, tex_refs=tex_refs, diff=diff,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb
    w_o[:] = weight


def _kernel_cam_bvh(
    nodes_f_ref, nodes_i_ref, tri_ref,
    px_r, py_r, pid_r, sid_r,
    *rest,
    n_tris, wide, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes, max_leaf,
    hal_slots=None,
):
    u_r, tex_refs, (lr_o, lg_o, lb_o, w_o), bvh_scr = _parse_rest(
        rest, wide, hal_slots, 4, 4
    )
    stack_ref, t_ref, best_ref, attr_ref = bvh_scr
    pid = pid_r[:]
    sid = sid_r[:]
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, u_r, hal_slots)
    ox, oy, oz, dx, dy, dz, weight, diff = _raygen_with_diff(
        px_r[:], py_r[:], sdim, cam, wide, spp
    )
    Lr, Lg, Lb = _bounce_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight > 0.0, pid, sid,
        n_tris, wide, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        bvh_refs=(nodes_f_ref, nodes_i_ref, stack_ref, t_ref, best_ref,
                  attr_ref),
        max_leaf=max_leaf,
        u_ref=u_r, hal_slots=hal_slots, tex_refs=tex_refs, diff=diff,
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
        "n_tris", "wide", "max_depth", "rr_threshold",
        "spp", "xs", "ys", "jitter", "seed", "cam", "kinds_present",
        "max_lobes", "max_leaf", "hal_slots", "interpret",
    ),
)
def _run_cam(
    table, nodes_f, nodes_i, px, py, pid, sid,
    n_tris, wide, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes,
    max_leaf=None, u=None, hal_slots=None, tex_table=None, interpret=False,
):
    m = px.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    u_in, u_specs = (), []
    if hal_slots is not None:
        nc = u.shape[0]
        u_in = (u,)
        u_specs = [pl.BlockSpec(
            (nc, rows, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )]
    tex_in, tex_specs, tex_scratch = _tex_call_extras(
        wide, tex_table, rows, two_level=True
    )
    u_in = u_in + tex_in
    u_specs = u_specs + tex_specs
    if use_bvh:
        kernel = functools.partial(
            _kernel_cam_bvh,
            n_tris=n_tris, wide=wide,
            max_depth=max_depth, rr_threshold=rr_threshold,
            spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed, cam=cam,
            kinds_present=kinds_present, max_lobes=max_lobes,
            max_leaf=max_leaf, hal_slots=hal_slots,
        )
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret,
            smooth=bool(getattr(wide, "smooth", False)),
            textured=getattr(wide, "tex", None) is not None,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 4 + u_specs,
            out_specs=[ray_spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 4,
            scratch_shapes=scratch + tex_scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, px, py, pid, sid, *u_in)
    kernel = functools.partial(
        _kernel_cam,
        n_tris=n_tris, wide=wide,
        max_depth=max_depth, rr_threshold=rr_threshold,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed, cam=cam,
        kinds_present=kinds_present, max_lobes=max_lobes,
        hal_slots=hal_slots,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 4 + u_specs,
        out_specs=[ray_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 4,
        scratch_shapes=tex_scratch,
        interpret=interpret,
    )(table, px, py, pid, sid, *u_in)
    return outs


def li_path_mega_cam(
    ctx, packed, cam_packed, pixel_xy, pixel_id, s_idx, sampler, spec,
    interpret=False, grid=None,
):
    """Full fused pass: camera ray generation + bounce loop in one kernel.

    Returns (L (N,3), weight (N,)) — the film add happens outside.
    pixel_xy: (N,2) integer raster coords as floats; the film jitter
    (sampler dim 0) is applied in-kernel, identically to the p_film the
    caller computes for filtering."""
    (table, lights_p, lights_emit, kinds_present, max_lobes, wide,
     bvh, tex_table) = packed
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
    pid_arr = jnp.asarray(pixel_id, jnp.uint32)
    hal_slots, u, samp_static = _sampler_payload(
        sampler, wide, kinds_present, spec, pid_arr, s_arr, prep,
        with_cam=True, grid=grid,
    )
    lr, lg, lb, w = _run_cam(
        table, nodes_f, nodes_i,
        prep(pixel_xy[:, 0].astype(jnp.float32)),
        prep(pixel_xy[:, 1].astype(jnp.float32)),
        prep(pid_arr), prep(s_arr),
        n_tris=int(table.shape[0]), wide=wide,
        max_depth=int(spec.max_depth), rr_threshold=float(spec.rr_threshold),
        **samp_static,
        cam=_Hashable(cam_packed),
        kinds_present=kinds_present, max_lobes=max_lobes,
        max_leaf=max_leaf,
        u=u, hal_slots=hal_slots, tex_table=tex_table,
        interpret=interpret,
    )
    l = jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    ).astype(DTYPE)
    return l, w.reshape(-1)[:n].astype(DTYPE)
