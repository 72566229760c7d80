"""Fused volumetric path-tracer megakernel (Pallas TPU).

BASELINE config 4 (homogeneous camera fog) ran the jnp wavefront
`integrators/volpath.li_volpath` at 7.4 Mrays/s — per bounce the SoA ray
state round-trips HBM ~12 times.  This kernel runs the whole volpath
bounce loop for a ray tile in VMEM, exactly like ops/path_megakernel
does for the surface-only path.

Scope (checked statically by `supports_volpath`), on top of the path
megakernel's material/geometry subset (common_scene_checks):
  - ONE camera medium, with NO per-prim medium interfaces: every ray
    stays in the fog forever, so the medium constants are compile-time
    and the medium-transition machinery (volpath.rs:198-236) is
    statically dead.  Homogeneous media use the closed forms
    (homogeneous.rs:34-85); GRID media (grid.rs:119-207) run delta
    tracking (sample) and ratio tracking (NEE tr) as in-kernel
    lax.while_loops whose density taps are gather-free one-hot MXU
    matmuls against the hi/lo-bf16-split planar density table
    (_grid_density_tap).  Grid scenes are gated to point lights (the
    area-light counter branch would draw medium_tr rng not replicated
    here) and rgb mode.  Tap lerp weights round to bf16, so isolated
    tracking decisions can flip vs the jnp path: grid estimator tests
    compare images (rmse + bit-close lane fraction), not lanes;
  - point and sphere-area lights: NEE is estimate_direct
    (handle_media=true) (integrator/mod.rs:403-558) with the MIS power
    heuristic for area lights (phase pdf at medium vertices, mean
    non-specular BSDF pdf at surfaces).  The scattering-sampling
    counter-branch is statically ZERO for this subset — the aggregate
    carries no emissive prims and env lights are excluded — and
    homogeneous medium_tr draws no RNG, so skipping it is chain-exact
    (mirrors integrators/volpath.py:_estimate_direct_volumetric).

The estimator is IDENTICAL to li_volpath: same sampler dim blocks
(sampler/dims.volpath_dim0), same hashed RNG chain for the medium's
channel/distance draws (scene/medium._next_u), same power-weighted
light pick (compute_light_power_distribution, integrator/mod.rs:560-571
— baked as a static CDF), same HG sampling quirks (phi = 2*pi*u[0]).
Tests compare per-ray radiance directly (test_volpath_megakernel.py).
"""

import collections
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DTYPE, PI
from ..core import rng as rngmod
from ..scene.types import LIGHT_DIFFUSE_AREA, LIGHT_POINT
from ..scene.medium import MEDIUM_GRID, MEDIUM_HOMOGENEOUS
from .bvh_pallas import STACK_DEPTH
from .path_megakernel import (
    BVH_TILE_ROWS,
    DEPTH_MAX,
    LANES,
    MEGA_BVH_TRI_MAX,
    TILE_ROWS,
    TRI_MAX,
    _attr_cols,
    _has_full,
    _bsdf_sample_k,
    _bvh_call_extras,
    _bvh_closest_hit,
    _bvh_occluded,
    _closest_hit,
    _dot3,
    _has_spec_trans,
    _lobe_f_k,
    _lobe_pdf_k,
    _nee_light_k,
    _normalize3,
    _occluded,
    _power_heuristic_k,
    _sampler_dims,
    _spec_mask,
    common_scene_checks,
    pack_scene,
    supports as _path_supports_kinds,  # noqa: F401 (parity reference)
)
from ..bsdf.lobes import (
    LOBE_LAMBERT_REFL,
    LOBE_MF_REFL,
    LOBE_SPEC_REFL,
    LOBE_SPEC_TRANS,
    LOBE_FRESNEL_SPEC,
)

SPEC_KINDS = (LOBE_SPEC_REFL, LOBE_SPEC_TRANS, LOBE_FRESNEL_SPEC)
INV_4_PI = 1.0 / (4.0 * PI)

MediumC = collections.namedtuple(
    "MediumC", "sigma_a sigma_s sigma_t g grid", defaults=(None,)
)
# grid camera medium statics (grid.rs:119-207): dims, the 3x4 rows of the
# world->medium transform, the majorant inverse, and the padded planar
# density-table shape (the table itself rides as a kernel input)
GridC = collections.namedtuple(
    "GridC", "nz ny nx w2m inv_max r_pad nx_pad"
)
VolStatic = collections.namedtuple(
    "VolStatic", "medium cdf pick_pdf world_radius"
)


def supports_volpath(ctx, spec, sampler, diff) -> bool:
    """Static host check: can the volpath megakernel render this job?"""
    if spec.kind != "volpath" or diff is not None:
        return False
    if spec.max_depth > DEPTH_MAX or spec.max_depth < 1:
        return False
    m = ctx.mediums
    if m is None or int(m["n"]) != 1:
        return False
    kind0 = int(np.asarray(m["kind"])[0])
    if kind0 not in (MEDIUM_HOMOGENEOUS, MEDIUM_GRID):
        return False
    if kind0 == MEDIUM_GRID:
        # grid tracking subset (grid.rs:119-207 in-kernel): density table
        # must fit the VMEM one-hot tap shapes, and lights must all be
        # delta points — area lights engage the scattering-sampling
        # counter branch whose medium_tr draws are not replicated here
        nz, ny, nx = (int(v) for v in np.asarray(m["dims"])[0])
        if nz * ny > 1024 or nx > 256:
            return False
        lk = np.asarray(ctx.lights.kind)
        if lk.size == 0 or np.any(lk != LIGHT_POINT):
            return False
        if ctx.n_channels != 3:
            return False
    if int(getattr(ctx, "camera_medium", -1)) != 0:
        return False
    # no per-prim medium interfaces: rays keep the camera medium forever
    for soa in (ctx.tri, ctx.sph):
        if int(soa.count) and (
            np.any(np.asarray(soa.med_in) >= 0)
            or np.any(np.asarray(soa.med_out) >= 0)
        ):
            return False
    import os

    tri_max = (
        TRI_MAX
        if os.environ.get("RS_MEGA_BVH", "1") == "0"
        else MEGA_BVH_TRI_MAX
    )
    common = common_scene_checks(
        ctx,
        sampler,
        allow_spheres=False,
        light_kinds=(LIGHT_POINT, LIGHT_DIFFUSE_AREA),
        allow_env=False,
        tri_max=tri_max,
        allow_media=True,
    )
    if common is None:
        return False
    kinds, n_lobes, live, used = common
    from .path_megakernel import LOBES_MAX

    if np.any(n_lobes[used] > LOBES_MAX):
        return False
    ok_kinds = (kinds == LOBE_LAMBERT_REFL) | (kinds == LOBE_MF_REFL)
    for sk in SPEC_KINDS:
        ok_kinds |= kinds == sk
    if np.any(~ok_kinds[live]):
        return False
    is_trans_lobe = (kinds == LOBE_SPEC_TRANS) | (kinds == LOBE_FRESNEL_SPEC)
    if np.any(is_trans_lobe & live & (n_lobes[:, None] > 1)):
        return False
    return True


def pack_volpath(ctx):
    """pack_scene + the static medium constants and light power CDF.

    Grid media additionally pack the density volume as a planar
    (row = z*ny + y, col = x) table, pre-transposed to (nx_pad, r_pad)
    and hi/lo-split into two bf16 arrays (hi = bf16(T), lo = bf16(T-hi):
    their f32 sum recovers every f32 density bit) for the in-kernel
    one-hot MXU taps (_grid_density_tap)."""
    packed = pack_scene(ctx)
    m = ctx.mediums
    grid = None
    gtab = None
    if int(np.asarray(m["kind"])[0]) == MEDIUM_GRID:
        nz, ny, nx = (int(v) for v in np.asarray(m["dims"])[0])
        dens = np.asarray(m["density"])[0, :nz, :ny, :nx].astype(np.float32)
        r_pad = max(128, -(-(nz * ny) // 128) * 128)
        nx_pad = max(8, -(-nx // 8) * 8)
        tbl = np.zeros((r_pad, nx_pad), np.float32)
        tbl[: nz * ny, :nx] = dens.reshape(nz * ny, nx)
        t_t = tbl.T  # (nx_pad, r_pad)
        hi = t_t.astype(jnp.bfloat16)
        lo = (t_t - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        w2m_m = np.asarray(m["w2m"])[0]
        grid = GridC(
            nz=nz, ny=ny, nx=nx,
            w2m=tuple(float(v) for v in w2m_m[:3, :4].ravel()),
            inv_max=float(np.asarray(m["inv_max_density"])[0]),
            r_pad=r_pad, nx_pad=nx_pad,
        )
        gtab = (jnp.asarray(hi), jnp.asarray(lo))
    medium = MediumC(
        sigma_a=tuple(float(v) for v in np.asarray(m["sigma_a"])[0]),
        sigma_s=tuple(float(v) for v in np.asarray(m["sigma_s"])[0]),
        sigma_t=tuple(float(v) for v in np.asarray(m["sigma_t"])[0]),
        g=float(np.asarray(m["g"])[0]),
        grid=grid,
    )
    # power-weighted light distribution, baked static (the CDF/pdf values
    # match core.sampling.Distribution1D.as_device()'s f32 arrays exactly)
    from ..core.sampling import Distribution1D
    from ..lights import lights as lmod

    dist = Distribution1D(np.asarray(lmod.power(ctx.lights)))
    cdf = tuple(float(np.float32(v)) for v in dist.cdf)
    n = dist.n
    if dist.func_int > 0.0:
        pick_pdf = tuple(
            float(np.float32(dist.func[i] / (dist.func_int * n)))
            for i in range(n)
        )
    else:
        pick_pdf = (0.0,) * n
    vol = VolStatic(
        medium=medium,
        cdf=cdf,
        pick_pdf=pick_pdf,
        world_radius=float(np.asarray(ctx.lights.world_radius)),
    )
    return packed + (vol, gtab)


def _rng_next(state):
    """scene/medium._next_u on the tile: advance the per-lane hash chain
    and produce a [0,1) float (rng.uniform_float_from_u32 semantics)."""
    state = rngmod.hash_u32(state ^ jnp.uint32(0x9E3779B9))
    u = (state >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        2.0 ** -24
    )
    return state, u


def _rng_next_masked(state, mask):
    """scene/medium._next_u_masked on the tile: only `mask` lanes consume
    the draw (grid.rs tracking rng is per-ray sequential)."""
    ns = rngmod.hash_u32(state ^ jnp.uint32(0x9E3779B9))
    u = (ns >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        2.0 ** -24
    )
    return jnp.where(mask, ns, state), u


def _g_affine(w2m, x, y, z):
    """Apply the static 3x4 world->medium rows to a point."""
    return (
        w2m[0] * x + w2m[1] * y + w2m[2] * z + w2m[3],
        w2m[4] * x + w2m[5] * y + w2m[6] * z + w2m[7],
        w2m[8] * x + w2m[9] * y + w2m[10] * z + w2m[11],
    )


def _g_rot3(w2m, x, y, z):
    """3x3 part only (directions)."""
    return (
        w2m[0] * x + w2m[1] * y + w2m[2] * z,
        w2m[4] * x + w2m[5] * y + w2m[6] * z,
        w2m[8] * x + w2m[9] * y + w2m[10] * z,
    )


def _box_interval_k(ox, oy, oz, dx, dy, dz, seg_len):
    """scene/medium._unit_box_interval componentwise (same float ops)."""

    def inv1(d):
        return 1.0 / jnp.where(
            jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d
        )

    ix, iy, iz = inv1(dx), inv1(dy), inv1(dz)
    t0x, t1x = (0.0 - ox) * ix, (1.0 - ox) * ix
    t0y, t1y = (0.0 - oy) * iy, (1.0 - oy) * iy
    t0z, t1z = (0.0 - oz) * iz, (1.0 - oz) * iz
    tn = jnp.maximum(
        jnp.minimum(t0x, t1x),
        jnp.maximum(jnp.minimum(t0y, t1y), jnp.minimum(t0z, t1z)),
    )
    tf = jnp.minimum(
        jnp.maximum(t0x, t1x),
        jnp.minimum(jnp.maximum(t0y, t1y), jnp.maximum(t0z, t1z)),
    )
    tmin = jnp.maximum(tn, 0.0)
    tmax = jnp.minimum(tf, seg_len)
    return tmin <= tmax, tmin, tmax


# scratch planes for one grid tap: 4 row ids + 4 row weights + col base
# + 2 col weights in; 1 value plane out
GRID_TAP_PLANES = 12


def _grid_density_tap(gr, ghi_ref, glo_ref, gscr, px, py, pz):
    """Trilinear density at medium-space positions (rows, LANES vregs) —
    scene/medium._grid_density via gather-free MXU one-hots.

    Per sublane row: ONE weighted 4-hot over the (z*ny+y) planar rows
    (the z/y lerp weights and the outside-zero masks fold into the
    one-hot entries; out-of-range rows encode as -1 and match nothing)
    feeds two bf16 matmuls against the hi/lo table split, then a
    weighted 2-hot column reduce applies the x lerp.  Weights round to
    bf16 (<= 2^-9 relative): tracking decisions can flip vs the jnp
    path on epsilon-close draws, so estimator tests compare images, not
    lanes (module docstring)."""
    rows = px.shape[0]
    nx, ny, nz = gr.nx, gr.ny, gr.nz
    psx = px * nx - 0.5
    psy = py * ny - 0.5
    psz = pz * nz - 0.5
    fx, fy, fz = jnp.floor(psx), jnp.floor(psy), jnp.floor(psz)
    ddx, ddy, ddz = psx - fx, psy - fy, psz - fz
    x0, y0, z0 = fx, fy, fz  # f32 integers (exact below 2^24)

    # factored build: r = z*ny + y means the weighted 4-hot is the outer
    # product of a weighted z 2-hot and a weighted y 2-hot — two tiny
    # compares + one multiply instead of four (r_pad, LANES)-size
    # compares (the build was the dominant VPU cost of the first
    # version: 2.8 Mrays/s on the 16^3 bench row).  Boundary texels
    # self-mask: z0*ny for z0=-1 is -ny (no iota match) while z0*ny+ny
    # = 0 still matches the valid upper slab; the high edge matches only
    # zero-padded table rows.  Requires ny | r_pad.
    factored = gr.r_pad % ny == 0
    if factored:
        gscr[:, 0, :] = z0 * ny
        gscr[:, 1, :] = y0
        gscr[:, 4, :] = 1.0 - ddz
        gscr[:, 5, :] = ddz
        gscr[:, 6, :] = 1.0 - ddy
        gscr[:, 7, :] = ddy
    else:
        wy0, wy1 = 1.0 - ddy, ddy
        wz0, wz1 = 1.0 - ddz, ddz
        p = 0
        for oz, wz in ((0.0, wz0), (1.0, wz1)):
            for oy, wy in ((0.0, wy0), (1.0, wy1)):
                zi = z0 + oz
                yi = y0 + oy
                ok = (zi >= 0.0) & (zi < nz) & (yi >= 0.0) & (yi < ny)
                r = jnp.where(ok, zi * ny + yi, -1.0)
                gscr[:, p, :] = r
                gscr[:, p + 4, :] = jnp.where(ok, wz * wy, 0.0)
                p += 1
    # x taps: cols x0, x0+1; out-of-range naturally miss (iota >= 0) or
    # land in the zero-padded table columns
    gscr[:, 8, :] = x0
    gscr[:, 9, :] = jnp.where(x0 >= 0.0, 1.0 - ddx, 0.0)
    gscr[:, 10, :] = jnp.where(x0 + 1.0 < nx, ddx, 0.0)

    iota_r = lax.broadcasted_iota(jnp.int32, (gr.r_pad, LANES), 0)
    iota_x = lax.broadcasted_iota(jnp.int32, (gr.nx_pad, LANES), 0)
    hi = ghi_ref[:, :]
    lo = glo_ref[:, :]
    nzp = gr.r_pad // ny if factored else 0

    def body(j, carry):
        row = gscr[pl.dslice(j, 1), pl.dslice(0, 11), :].reshape(11, LANES)
        if factored:
            z_row = row[0:1, :].astype(jnp.int32)   # z0*ny (may be -ny)
            y_row = row[1:2, :].astype(jnp.int32)   # y0 (may be -1)
            wz0, wz1 = row[4:5, :], row[5:6, :]
            wy0, wy1 = row[6:7, :], row[7:8, :]
            iota_z = lax.broadcasted_iota(
                jnp.int32, (nzp, LANES), 0
            ) * ny
            iota_y = lax.broadcasted_iota(jnp.int32, (ny, LANES), 0)
            oh_z = jnp.where(iota_z == z_row, wz0, 0.0) + jnp.where(
                iota_z == z_row + ny, wz1, 0.0
            )
            # y 2-hot: y0 and y0+1 wrap across rows only through the
            # z-block product, so the y0+1 == ny case must NOT match
            # row 0 of the next block — iota_y < ny keeps it out
            oh_y = jnp.where(iota_y == y_row, wy0, 0.0) + jnp.where(
                (iota_y == y_row + 1) & (y_row + 1 < ny), wy1, 0.0
            )
            ohb = (
                jnp.repeat(oh_z, ny, axis=0) * jnp.tile(oh_y, (nzp, 1))
            ).astype(jnp.bfloat16)
        else:
            oh = jnp.zeros((gr.r_pad, LANES), jnp.float32)
            for c in range(4):
                rc = row[c : c + 1, :].astype(jnp.int32)
                wc = row[c + 4 : c + 5, :]
                oh = oh + jnp.where(iota_r == rc, wc, 0.0)
            ohb = oh.astype(jnp.bfloat16)
        m = jnp.dot(hi, ohb, preferred_element_type=jnp.float32) + jnp.dot(
            lo, ohb, preferred_element_type=jnp.float32
        )  # (nx_pad, LANES)
        xc = row[8:9, :].astype(jnp.int32)
        cs = jnp.where(iota_x == xc, row[9:10, :], 0.0) + jnp.where(
            iota_x == xc + 1, row[10:11, :], 0.0
        )
        val = jnp.sum(m * cs, axis=0, keepdims=True)
        gscr[pl.dslice(j, 1), pl.dslice(11, 1), :] = val.reshape(1, 1, LANES)
        return carry

    lax.fori_loop(0, rows, body, 0)
    return gscr[:, 11, :]


def _coord_system(wx, wy, wz):
    """core/vec.coordinate_system componentwise (first + second axis)."""
    big_x = jnp.abs(wx) > jnp.abs(wy)
    inv = lax.rsqrt(
        jnp.maximum(
            jnp.where(big_x, wx * wx + wz * wz, wy * wy + wz * wz), 1e-30
        )
    )
    v1x = jnp.where(big_x, -wz, 0.0) * inv
    v1y = jnp.where(big_x, 0.0, wz) * inv
    v1z = jnp.where(big_x, wx, -wy) * inv
    v2x = wy * v1z - wz * v1y
    v2y = wz * v1x - wx * v1z
    v2z = wx * v1y - wy * v1x
    return (v1x, v1y, v1z), (v2x, v2y, v2z)


def _phase_hg_k(cos_theta, g):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (
        INV_4_PI
        * (1.0 - g * g)
        / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)
    )


def _hg_sample_k(wox, woy, woz, g, u0):
    """medium.hg_sample componentwise, incl. the reference's phi = 2*pi*
    u[0] quirk (u[1] unused).  Returns (wi, p)."""
    if abs(g) < 1e-3:
        cos_theta = 1.0 - 2.0 * u0
    else:
        sq_den = 1.0 + g - 2.0 * g * u0
        sq = (1.0 - g * g) / jnp.where(
            jnp.abs(sq_den) < 1e-9, 1e-9, sq_den
        )
        cos_theta = -(1.0 + g * g - sq * sq) / (2.0 * g)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * u0
    (v1x, v1y, v1z), (v2x, v2y, v2z) = _coord_system(wox, woy, woz)
    cp = sin_theta * jnp.cos(phi)
    sp = sin_theta * jnp.sin(phi)
    wix = v1x * cp + v2x * sp + wox * cos_theta
    wiy = v1y * cp + v2y * sp + woy * cos_theta
    wiz = v1z * cp + v2z * sp + woz * cos_theta
    return (wix, wiy, wiz), _phase_hg_k(cos_theta, g)


def _vol_bounce_loop(
    tri_ref, ox, oy, oz, dx, dy, dz, active, pid, sid,
    n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
    bvh_refs=None, max_leaf=None, grid_refs=None,
):
    """li_volpath's bounce loop on one VMEM ray tile (volpath.rs:48-258
    under the static homogeneous-fog subset)."""
    from ..sampler.dims import volpath_dim0

    med = vol.medium
    g = med.g
    n_lights = len(lights_p)
    has_st = _has_spec_trans(kinds_present)
    has_spec = any(k in kinds_present for k in SPEC_KINDS)
    has_full = _has_full(kinds_present)
    mixed = len(kinds_present) > 1
    attr_cols = _attr_cols(kinds_present, max_lobes)
    one = jnp.ones(ox.shape, jnp.float32)
    zero = jnp.zeros(ox.shape, jnp.float32)
    br, bg, bb = one, one, one
    Lr, Lg, Lb = zero, zero, zero
    es = one
    # per-lane RNG chain for the medium draws (li_volpath:158)
    state = rngmod.hash_combine(pid, sid)

    # chunk culling is a measured LOSS in this kernel (fog 34.2 -> 31.1
    # Mrays/s): medium-scattering lanes never die and scatter
    # isotropically, so a 16K-lane tile virtually never skips a chunk
    # and the per-cond carry traffic is pure overhead.  The path/direct/
    # SPPM kernels keep it (env 43.2 -> 56.9 — escaped/dead lanes and
    # coherent shadow targets make tiles actually skip).
    chunks = None

    def occluded_all(sox, soy, soz, sdx, sdy, sdz, tmax_arr):
        if bvh_refs is None:
            return _occluded(
                tri_ref, n_tris, sox, soy, soz, sdx, sdy, sdz, tmax_arr,
                chunks=chunks,
            )
        return _bvh_occluded(
            bvh_refs, tri_ref, sox, soy, soz, sdx, sdy, sdz,
            jnp.where(active, tmax_arr, 0.0), max_leaf,
        )

    for bounce in range(max_depth):
        dim0 = volpath_dim0(bounce)
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
        if has_st:
            mat_eta = out[cur]
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

        found = active & (t < 3.0e38)
        seg_len = jnp.where(found, t, 2.0 * vol.world_radius + 1000.0)

        if med.grid is None:
            # ---- homogeneous medium sample (homogeneous.rs:38-85; two
            # chain draws exactly like scene/medium.medium_sample) ----
            state, u_ch = _rng_next(state)
            state, u_d = _rng_next(state)
            channel = jnp.minimum((u_ch * 3.0).astype(jnp.int32), 2)
            st_ch = jnp.where(
                channel == 0,
                med.sigma_t[0],
                jnp.where(channel == 1, med.sigma_t[1], med.sigma_t[2]),
            )
            dist = -jnp.log(jnp.maximum(1.0 - u_d, 1e-12)) / jnp.maximum(
                st_ch, 1e-20
            )
            t_med = jnp.minimum(dist, seg_len)
            smp_med = dist < seg_len
            tr_c = tuple(jnp.exp(-med.sigma_t[c] * t_med) for c in range(3))
            dens = tuple(
                jnp.where(smp_med, med.sigma_t[c] * tr_c[c], tr_c[c])
                for c in range(3)
            )
            pdf_m = (dens[0] + dens[1] + dens[2]) * (1.0 / 3.0)
            pdf_m = jnp.where(pdf_m == 0.0, 1.0, pdf_m)
            bm = tuple(
                jnp.where(smp_med, tr_c[c] * med.sigma_s[c], tr_c[c]) / pdf_m
                for c in range(3)
            )
            br = jnp.where(active, br * bm[0], br)
            bg = jnp.where(active, bg * bm[1], bg)
            bb = jnp.where(active, bb * bm[2], bb)
            in_medium = smp_med & active
        else:
            # ---- grid delta tracking (grid.rs:162-207; chain-exact to
            # scene/medium.medium_sample's grid branch: the homogeneous
            # channel/distance draws are skipped for grid lanes and the
            # tracking draws advance only live walkers) ----
            gr = med.grid
            ghi_ref, glo_ref, gscr = grid_refs
            omx, omy, omz = _g_affine(gr.w2m, ox, oy, oz)
            dmx_r, dmy_r, dmz_r = _g_rot3(gr.w2m, dx, dy, dz)
            g_scale = jnp.sqrt(
                dmx_r * dmx_r + dmy_r * dmy_r + dmz_r * dmz_r
            )
            g_inv_scale = 1.0 / jnp.maximum(g_scale, 1e-20)
            dmx, dmy, dmz = (
                dmx_r * g_inv_scale, dmy_r * g_inv_scale, dmz_r * g_inv_scale
            )
            len_m = seg_len * g_scale
            okb, g_tmin, g_tmax = _box_interval_k(
                omx, omy, omz, dmx, dmy, dmz, len_m
            )
            st0 = max(med.sigma_t[0], 1e-20)
            step_k = jnp.float32(gr.inv_max / st0)
            walk0 = active & okb
            tw0 = jnp.where(walk0, g_tmin, jnp.inf)

            def dt_body(c):
                tw, hit_f, st_c, alive_i, _any = c
                alive = alive_i > 0
                st_c, u1 = _rng_next_masked(st_c, alive)
                t_new = tw - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) * step_k
                past = t_new >= g_tmax
                pmx = omx + dmx * t_new
                pmy = omy + dmy * t_new
                pmz = omz + dmz * t_new
                dens_g = _grid_density_tap(
                    gr, ghi_ref, glo_ref, gscr, pmx, pmy, pmz
                )
                draw2 = alive & ~past
                st_c, u2 = _rng_next_masked(st_c, draw2)
                interact = draw2 & (dens_g * gr.inv_max > u2)
                hit_f = jnp.where(interact, 1.0, hit_f)
                tw = jnp.where(alive, t_new, tw)
                alive2 = draw2 & ~interact
                return (
                    tw, hit_f, st_c, alive2.astype(jnp.int32),
                    jnp.any(alive2).astype(jnp.int32),
                )

            tw, hit_f, state, _, _ = lax.while_loop(
                lambda c: c[4] > 0,
                dt_body,
                (
                    tw0, jnp.zeros_like(tw0), state,
                    walk0.astype(jnp.int32),
                    jnp.any(walk0).astype(jnp.int32),
                ),
            )
            smp_med = hit_f > 0.0
            t_med = jnp.where(smp_med, tw * g_inv_scale, seg_len)
            ratio = tuple(
                med.sigma_s[c] / max(med.sigma_t[c], 1e-20) for c in range(3)
            )
            br = jnp.where(active & smp_med, br * ratio[0], br)
            bg = jnp.where(active & smp_med, bg * ratio[1], bg)
            bb = jnp.where(active & smp_med, bb * ratio[2], bb)
            in_medium = smp_med & active
        active = active & ((br > 0.0) | (bg > 0.0) | (bb > 0.0))
        active = active & (found | in_medium)

        # vertex position: medium point or surface hit
        psx = ox + dx * t
        psy = oy + dy * t
        psz = oz + dz * t
        px = jnp.where(in_medium, ox + dx * t_med, psx)
        py = jnp.where(in_medium, oy + dy * t_med, psy)
        pz = jnp.where(in_medium, oz + dz * t_med, psz)
        surf_valid = active & ~in_medium & found

        # shading frame (flat normals subset: ns == ng), as in the path
        # kernel (bsdf/eval.make_frame)
        du2 = dux * dux + duy * duy + duz * duz
        ssx, ssy, ssz = _normalize3(dux, duy, duz)
        (fbx, fby, fbz), _ = _coord_system(ngx, ngy, ngz)
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

        # ---- NEE: power-weighted pick + estimate_direct(handle_media)
        # (volpath.rs:101-127; integrator/mod.rs:403-558) ----
        u_pick = _sampler_dims(
            pid, sid, dim0, spp, xs, ys, jitter, seed, False
        )
        li_idx = jnp.zeros(ox.shape, jnp.int32)
        for i in range(1, n_lights):
            # searchsorted(cdf, u, 'right') - 1 on the static CDF
            li_idx = jnp.where(u_pick >= vol.cdf[i], i, li_idx)
        ppdf = jnp.zeros_like(px)
        for k in range(n_lights):
            ppdf = jnp.where(li_idx == k, vol.pick_pdf[k], ppdf)

        all_point = all(l.kind == LIGHT_POINT for l in wide.lights)
        if all_point:
            # delta-light fast path (round-3 code kept verbatim): no
            # u_light draw, weight == 1, pdf_li == 1
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
            lir = ler / dist2
            lig = leg / dist2
            lib = leb / dist2
            ls_pdf = jnp.ones_like(px)
            delta_m = True
        else:
            # generic branch: point / sphere-area mix via the path
            # kernel's sample_li (lights/diffuse.rs sample_li incl. the
            # AREA_PDF_QUIRK; u draws = li_volpath's get_2d(dim0 + 1))
            u_l0, u_l1 = _sampler_dims(
                pid, sid, dim0 + 1, spp, xs, ys, jitter, seed, True
            )
            ls = _nee_light_k(wide, li_idx, px, py, pz, u_l0, u_l1)
            wix, wiy, wiz = ls["wi"]
            lir, lig, lib = ls["li"]
            lpx, lpy, lpz = ls["p_light"]
            ls_pdf = ls["pdf"]
            delta_m = ls["delta"]

        # scattering value toward the light: phase at medium vertices,
        # bsdf_f * |cos| at surfaces; MIS pdf = phase value (HG pdf ==
        # phase) at medium vertices, mean non-specular lobe pdf at
        # surfaces (bsdf_pdf with ALL & ~SPECULAR flags)
        wil_x = _dot3(wix, wiy, wiz, ssx, ssy, ssz)
        wil_y = _dot3(wix, wiy, wiz, tsx, tsy, tsz)
        wi_ng = _dot3(wix, wiy, wiz, ngx, ngy, ngz)
        reflect_side = (wi_ng * wo_z) > 0.0
        f_gate = reflect_side & (wo_z != 0.0)
        fnr = jnp.zeros_like(px)
        fng = jnp.zeros_like(px)
        fnb = jnp.zeros_like(px)
        pdf_scat_s = jnp.zeros_like(px)
        n_nonspec = jnp.zeros(px.shape, jnp.int32)
        for l in range(max_lobes):
            lob = lobs[l]
            sm_l = _spec_mask(lob, kinds_present)
            m_l = l < n_lob
            if sm_l is True:
                m_l = jnp.zeros(px.shape, bool)
            elif sm_l is not None:
                m_l = m_l & ~sm_l
            lf = _lobe_f_k(
                lob, wol_x, wol_y, wo_z, wil_x, wil_y, wi_ng, kinds_present
            )
            use = f_gate & m_l
            fnr = fnr + jnp.where(use, lf[0], 0.0)
            fng = fng + jnp.where(use, lf[1], 0.0)
            fnb = fnb + jnp.where(use, lf[2], 0.0)
            if delta_m is not True:
                lp = _lobe_pdf_k(
                    lob, wol_x, wol_y, wo_z, wil_x, wil_y, wi_ng,
                    kinds_present,
                )
                pdf_scat_s = pdf_scat_s + jnp.where(m_l, lp, 0.0)
            n_nonspec = n_nonspec + m_l.astype(jnp.int32)
        cos_ns = jnp.abs(wi_ng)
        p_phase = _phase_hg_k(
            _dot3(wox, woy, woz, wix, wiy, wiz), g
        )
        fr = jnp.where(in_medium, p_phase, fnr * cos_ns)
        fg = jnp.where(in_medium, p_phase, fng * cos_ns)
        fb = jnp.where(in_medium, p_phase, fnb * cos_ns)
        if delta_m is True:
            weight = 1.0
        else:
            pdf_scat_s = jnp.where(
                (wo_z != 0.0) & (n_nonspec > 0),
                pdf_scat_s / jnp.maximum(n_nonspec, 1).astype(jnp.float32),
                0.0,
            )
            scattering_pdf = jnp.where(in_medium, p_phase, pdf_scat_s)
            weight = jnp.where(
                delta_m, 1.0, _power_heuristic_k(ls_pdf, scattering_pdf)
            )

        nee_valid = active & (in_medium | (surf_valid & (n_nonspec > 0)))
        any_li = (lir > 0.0) | (lig > 0.0) | (lib > 0.0)
        any_f = (fr > 0.0) | (fg > 0.0) | (fb > 0.0)
        live = nee_valid & (ls_pdf > 0.0) & any_li & any_f

        # visibility origin: surfaces offset along ng toward the light
        # (geom.offset_ray_origin), medium vertices spawn in place
        mag = jnp.abs(px) + jnp.abs(py) + jnp.abs(pz)
        eps = 1e-4 + 1e-5 * mag
        off = jnp.where(wi_ng < 0.0, -eps, eps)
        sox = jnp.where(in_medium, px, px + ngx * off)
        soy = jnp.where(in_medium, py, py + ngy * off)
        soz = jnp.where(in_medium, pz, pz + ngz * off)
        svx, svy, svz = lpx - sox, lpy - soy, lpz - soz
        seg2 = svx * svx + svy * svy + svz * svz
        seg = jnp.sqrt(seg2)
        inv_seg = 1.0 / jnp.maximum(seg, 1e-20)
        sdx, sdy, sdz = svx * inv_seg, svy * inv_seg, svz * inv_seg
        t_sh = jnp.where(live, 1.0 - 1e-4, 0.0) * seg
        occ = occluded_all(sox, soy, soz, sdx, sdy, sdz, t_sh)
        # transmittance through the fog along the full segment
        # (VisibilityTester::tr)
        if med.grid is None:
            tr_l = tuple(jnp.exp(-med.sigma_t[c] * seg) for c in range(3))
        else:
            # grid ratio tracking (grid.rs:119-160) along the shadow
            # segment; runs for every active lane crossing the box —
            # NOT just live ones — because the jnp path's medium_tr
            # draws unconditionally and later bounces consume the same
            # per-lane chain (chain parity)
            gr = med.grid
            ghi_ref, glo_ref, gscr = grid_refs
            smx, smy, smz = _g_affine(gr.w2m, sox, soy, soz)
            sdmx_r, sdmy_r, sdmz_r = _g_rot3(gr.w2m, sdx, sdy, sdz)
            s_scale = jnp.sqrt(
                sdmx_r * sdmx_r + sdmy_r * sdmy_r + sdmz_r * sdmz_r
            )
            s_inv = 1.0 / jnp.maximum(s_scale, 1e-20)
            sdmx, sdmy, sdmz = sdmx_r * s_inv, sdmy_r * s_inv, sdmz_r * s_inv
            s_len_m = seg * s_scale
            s_okb, s_tmin, s_tmax = _box_interval_k(
                smx, smy, smz, sdmx, sdmy, sdmz, s_len_m
            )
            st0 = max(med.sigma_t[0], 1e-20)
            step_k = jnp.float32(gr.inv_max / st0)
            twalk0 = active & s_okb
            ts0 = jnp.where(twalk0, s_tmin, jnp.inf)

            def tr_body(c):
                ts, trv, st_c, alive_i, _any = c
                alive = alive_i > 0
                st_c, u1 = _rng_next_masked(st_c, alive)
                ts = jnp.where(
                    alive,
                    ts - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) * step_k,
                    ts,
                )
                past = ts >= s_tmax
                pmx = smx + sdmx * ts
                pmy = smy + sdmy * ts
                pmz = smz + sdmz * ts
                dens_g = _grid_density_tap(
                    gr, ghi_ref, glo_ref, gscr, pmx, pmy, pmz
                )
                upd = alive & ~past
                trv = jnp.where(
                    upd,
                    trv * (1.0 - jnp.maximum(dens_g * gr.inv_max, 0.0)),
                    trv,
                )
                low = trv < 0.1
                rr = upd & low
                st_c, u2 = _rng_next_masked(st_c, rr)
                q = jnp.maximum(1.0 - trv, 0.05)
                killed = rr & (u2 < q)
                trv = jnp.where(
                    killed, 0.0, jnp.where(rr, trv / (1.0 - q), trv)
                )
                alive2 = upd & ~killed
                return (
                    ts, trv, st_c, alive2.astype(jnp.int32),
                    jnp.any(alive2).astype(jnp.int32),
                )

            _, tr_g, state, _, _ = lax.while_loop(
                lambda c: c[4] > 0,
                tr_body,
                (
                    ts0, jnp.ones_like(ts0), state,
                    twalk0.astype(jnp.int32),
                    jnp.any(twalk0).astype(jnp.int32),
                ),
            )
            tr_l = (tr_g, tr_g, tr_g)
        vis = live & ~occ
        inv_pp = 1.0 / jnp.maximum(ppdf, 1e-20)  # li_volpath:222 floor
        scale = weight * inv_pp / jnp.maximum(ls_pdf, 1e-20)
        Lr = Lr + jnp.where(vis, br * fr * lir * tr_l[0] * scale, 0.0)
        Lg = Lg + jnp.where(vis, bg * fg * lig * tr_l[1] * scale, 0.0)
        Lb = Lb + jnp.where(vis, bb * fb * lib * tr_l[2] * scale, 0.0)
        # scattering-sampling counter branch (integrator/mod.rs:483-558):
        # statically zero here — the aggregate carries no emissive prims
        # and env lights are outside the volpath-kernel subset, so the
        # sampled ray can never see the chosen light (li2 == 0 in
        # _estimate_direct_volumetric); homogeneous medium_tr draws no
        # RNG, so skipping it keeps the hash chain identical.

        # ---- next direction (volpath.rs:137-196) ----
        ub0, ub1 = _sampler_dims(
            pid, sid, dim0 + 3, spp, xs, ys, jitter, seed, True
        )
        (hgx, hgy, hgz), _p_hg = _hg_sample_k(wox, woy, woz, g, ub0)
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
        any_fs = (fs[0] != 0.0) | (fs[1] != 0.0) | (fs[2] != 0.0)
        ok_surf = surf_valid & (n_lob > 0) & (wo_z != 0.0) & (pdf > 0.0) & any_fs
        inv_pdf = cosw / jnp.maximum(pdf, 1e-20)
        br = jnp.where(ok_surf, br * fs[0] * inv_pdf, br)
        bg = jnp.where(ok_surf, bg * fs[1] * inv_pdf, bg)
        bb = jnp.where(ok_surf, bb * fs[2] * inv_pdf, bb)
        ndx = jnp.where(in_medium, hgx, nwx)
        ndy = jnp.where(in_medium, hgy, nwy)
        ndz = jnp.where(in_medium, hgz, nwz)
        active = active & (in_medium | ok_surf)

        # etaScale (volpath.rs:180-194)
        if has_st:
            is_st_c, is_fs_c = smp["is_st_c"], smp["is_fs_c"]
            fs_reflect = smp["fs_reflect"]
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
            eta_fac = jnp.where(wo_z > 0.0, e2, 1.0 / jnp.maximum(e2, 1e-20))
            if spec_trans_sampled is not False:
                upd = active & ~in_medium & (
                    spec_trans_sampled
                    if spec_trans_sampled is not True
                    else jnp.ones_like(active)
                )
                es = jnp.where(upd, es * eta_fac, es)

        # next origin: medium vertex in place, surface offset along ng
        wi_ng2 = _dot3(ndx, ndy, ndz, ngx, ngy, ngz)
        off2 = jnp.where(wi_ng2 < 0.0, -eps, eps)
        ox = jnp.where(
            active, jnp.where(in_medium, px, psx + ngx * off2), ox
        )
        oy = jnp.where(
            active, jnp.where(in_medium, py, psy + ngy * off2), oy
        )
        oz = jnp.where(
            active, jnp.where(in_medium, pz, psz + ngz * off2), oz
        )
        dx = jnp.where(active, ndx, dx)
        dy = jnp.where(active, ndy, dy)
        dz = jnp.where(active, ndz, dz)

        # ---- Russian roulette (volpath.rs:238-250) ----
        if bounce > 3:
            beta_max = jnp.maximum(br, jnp.maximum(bg, bb)) * es
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


def _kernel_vol(
    tri_ref, *refs,
    n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes,
):
    has_grid = vol.medium.grid is not None
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r) = refs[:9]
    i = 9
    grid_refs = None
    if has_grid:
        ghi_ref, glo_ref = refs[i : i + 2]
        i += 2
    lr_o, lg_o, lb_o = refs[i : i + 3]
    i += 3
    if has_grid:
        grid_refs = (ghi_ref, glo_ref, refs[i])
    Lr, Lg, Lb = _vol_bounce_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:] > 0.0, pid_r[:], sid_r[:],
        n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        grid_refs=grid_refs,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb


def _kernel_vol_bvh(
    nodes_f_ref, nodes_i_ref, tri_ref, *refs,
    n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, max_leaf,
):
    has_grid = vol.medium.grid is not None
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, pid_r, sid_r) = refs[:9]
    i = 9
    if has_grid:
        ghi_ref, glo_ref = refs[i : i + 2]
        i += 2
    lr_o, lg_o, lb_o = refs[i : i + 3]
    i += 3
    stack_ref, t_ref, best_ref, attr_ref = refs[i : i + 4]
    grid_refs = (ghi_ref, glo_ref, refs[i + 4]) if has_grid else None
    Lr, Lg, Lb = _vol_bounce_loop(
        tri_ref,
        ox_r[:], oy_r[:], oz_r[:], dx_r[:], dy_r[:], dz_r[:],
        w_r[:] > 0.0, pid_r[:], sid_r[:],
        n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        bvh_refs=(nodes_f_ref, nodes_i_ref, stack_ref, t_ref, best_ref,
                  attr_ref),
        max_leaf=max_leaf,
        grid_refs=grid_refs,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "vol", "wide", "lights_p", "lights_emit", "max_depth",
        "rr_threshold", "spp", "xs", "ys", "jitter", "seed",
        "kinds_present", "max_lobes", "max_leaf", "interpret",
    ),
)
def _run_vol(
    table, nodes_f, nodes_i, ox, oy, oz, dx, dy, dz, w, pid, sid,
    n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, kinds_present, max_lobes, max_leaf=None,
    interpret=False, ghi=None, glo=None,
):
    m = ox.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    has_grid = vol.medium.grid is not None
    g_in = [ghi, glo] if has_grid else []
    g_specs = [vmem, vmem] if has_grid else []
    g_scratch = (
        [pltpu.VMEM((rows, GRID_TAP_PLANES, LANES), jnp.float32)]
        if has_grid
        else []
    )
    kw = dict(
        n_tris=n_tris, vol=vol, wide=wide,
        lights_p=lights_p, lights_emit=lights_emit,
        max_depth=max_depth, rr_threshold=rr_threshold,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed,
        kinds_present=kinds_present, max_lobes=max_lobes,
    )
    if use_bvh:
        kernel = functools.partial(_kernel_vol_bvh, max_leaf=max_leaf, **kw)
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 9 + g_specs,
            out_specs=[ray_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 3,
            scratch_shapes=list(scratch) + g_scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, ox, oy, oz, dx, dy, dz, w, pid, sid,
          *g_in)
    kernel = functools.partial(_kernel_vol, **kw)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 9 + g_specs,
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 3,
        scratch_shapes=g_scratch,
        interpret=interpret,
    )(table, ox, oy, oz, dx, dy, dz, w, pid, sid, *g_in)


def _kernel_vol_cam(
    tri_ref, *refs,
    n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes,
):
    """Camera-fused variant: in-kernel lens raygen feeds the volumetric
    walk — the host raygen + HBM ray round trip were ~60% of a depth-5
    fog pass (tools/profile_fog.py: 4 ms fixed vs 0.64 ms/bounce)."""
    from .path_megakernel import _mk_sdim, _raygen

    has_grid = vol.medium.grid is not None
    px_r, py_r, pid_r, sid_r = refs[:4]
    i = 4
    if has_grid:
        ghi_ref, glo_ref = refs[i : i + 2]
        i += 2
    lr_o, lg_o, lb_o, w_o = refs[i : i + 4]
    i += 4
    grid_refs = (ghi_ref, glo_ref, refs[i]) if has_grid else None
    pid, sid = pid_r[:], sid_r[:]
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, None, None)
    ox, oy, oz, dx, dy, dz, weight = _raygen(px_r[:], py_r[:], sdim, cam)
    Lr, Lg, Lb = _vol_bounce_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight > 0.0, pid, sid,
        n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        grid_refs=grid_refs,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb
    w_o[:] = weight


def _kernel_vol_bvh_cam(
    nodes_f_ref, nodes_i_ref, tri_ref, *refs,
    n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes, max_leaf,
):
    from .path_megakernel import _mk_sdim, _raygen

    has_grid = vol.medium.grid is not None
    px_r, py_r, pid_r, sid_r = refs[:4]
    i = 4
    if has_grid:
        ghi_ref, glo_ref = refs[i : i + 2]
        i += 2
    lr_o, lg_o, lb_o, w_o = refs[i : i + 4]
    i += 4
    stack_ref, t_ref, best_ref, attr_ref = refs[i : i + 4]
    grid_refs = (ghi_ref, glo_ref, refs[i + 4]) if has_grid else None
    pid, sid = pid_r[:], sid_r[:]
    sdim = _mk_sdim(pid, sid, spp, xs, ys, jitter, seed, None, None)
    ox, oy, oz, dx, dy, dz, weight = _raygen(px_r[:], py_r[:], sdim, cam)
    Lr, Lg, Lb = _vol_bounce_loop(
        tri_ref, ox, oy, oz, dx, dy, dz, weight > 0.0, pid, sid,
        n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
        spp, xs, ys, jitter, seed, kinds_present, max_lobes,
        bvh_refs=(nodes_f_ref, nodes_i_ref, stack_ref, t_ref, best_ref,
                  attr_ref),
        max_leaf=max_leaf,
        grid_refs=grid_refs,
    )
    lr_o[:] = Lr
    lg_o[:] = Lg
    lb_o[:] = Lb
    w_o[:] = weight


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tris", "vol", "wide", "lights_p", "lights_emit", "max_depth",
        "rr_threshold", "spp", "xs", "ys", "jitter", "seed", "cam",
        "kinds_present", "max_lobes", "max_leaf", "interpret",
    ),
)
def _run_vol_cam(
    table, nodes_f, nodes_i, px, py, pid, sid,
    n_tris, vol, wide, lights_p, lights_emit, max_depth, rr_threshold,
    spp, xs, ys, jitter, seed, cam, kinds_present, max_lobes,
    max_leaf=None, interpret=False, ghi=None, glo=None,
):
    m = px.shape[0]
    use_bvh = nodes_f is not None
    rows = BVH_TILE_ROWS if use_bvh else TILE_ROWS
    grid = (m // rows,)
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    has_grid = vol.medium.grid is not None
    g_in = [ghi, glo] if has_grid else []
    g_specs = [vmem, vmem] if has_grid else []
    g_scratch = (
        [pltpu.VMEM((rows, GRID_TAP_PLANES, LANES), jnp.float32)]
        if has_grid
        else []
    )
    kw = dict(
        n_tris=n_tris, vol=vol, wide=wide,
        lights_p=lights_p, lights_emit=lights_emit,
        max_depth=max_depth, rr_threshold=rr_threshold,
        spp=spp, xs=xs, ys=ys, jitter=jitter, seed=seed, cam=cam,
        kinds_present=kinds_present, max_lobes=max_lobes,
    )
    if use_bvh:
        kernel = functools.partial(
            _kernel_vol_bvh_cam, max_leaf=max_leaf, **kw
        )
        scratch, kwargs = _bvh_call_extras(
            rows, kinds_present, max_lobes, interpret
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vmem, vmem, vmem] + [ray_spec] * 4 + g_specs,
            out_specs=[ray_spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 4,
            scratch_shapes=list(scratch) + g_scratch,
            interpret=interpret,
            **kwargs,
        )(nodes_f, nodes_i, table, px, py, pid, sid, *g_in)
    kernel = functools.partial(_kernel_vol_cam, **kw)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem] + [ray_spec] * 4 + g_specs,
        out_specs=[ray_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, LANES), jnp.float32)] * 4,
        scratch_shapes=g_scratch,
        interpret=interpret,
    )(table, px, py, pid, sid, *g_in)


def li_volpath_mega_cam(
    ctx, packed, cam_packed, pixel_xy, pixel_id, s_idx, sampler, spec,
    interpret=False,
):
    """Fully fused volpath pass: in-kernel lens raygen + bounce loop.
    Returns (L (N,3), weight (N,)) — the film add happens outside."""
    from .path_megakernel import _Hashable

    (table, lights_p, lights_emit, kinds_present, max_lobes, wide, bvh,
     _tex, vol, gtab) = packed
    ghi, glo = gtab if gtab is not None else (None, None)
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
    lr, lg, lb, w = _run_vol_cam(
        table, nodes_f, nodes_i,
        prep(pixel_xy[:, 0].astype(jnp.float32)),
        prep(pixel_xy[:, 1].astype(jnp.float32)),
        prep(jnp.asarray(pixel_id, jnp.uint32)), prep(s_arr),
        n_tris=int(table.shape[0]), vol=vol, wide=wide,
        lights_p=lights_p, lights_emit=lights_emit,
        max_depth=int(spec.max_depth), rr_threshold=float(spec.rr_threshold),
        spp=int(sampler.spp), xs=int(sampler.xs), ys=int(sampler.ys),
        jitter=bool(sampler.jitter), seed=int(sampler.seed),
        cam=_Hashable(cam_packed),
        kinds_present=kinds_present, max_lobes=max_lobes,
        max_leaf=max_leaf,
        interpret=interpret, ghi=ghi, glo=glo,
    )
    l = jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    ).astype(DTYPE)
    return l, w.reshape(-1)[:n].astype(DTYPE)


def li_volpath_mega(
    ctx, packed, o, d, cam_weight, sampler, pixel_id, s_idx, spec,
    interpret=False,
):
    """Drop-in replacement for integrators.volpath.li_volpath on the
    homogeneous-fog subset.  packed = pack_volpath(ctx)."""
    (table, lights_p, lights_emit, kinds_present, max_lobes, wide, bvh,
     _tex, vol, gtab) = packed
    ghi, glo = gtab if gtab is not None else (None, None)
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
    lr, lg, lb = _run_vol(
        table, nodes_f, nodes_i,
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(cam_weight.astype(jnp.float32)),
        prep(jnp.asarray(pixel_id, jnp.uint32)), prep(s_arr),
        n_tris=int(table.shape[0]), vol=vol, wide=wide,
        lights_p=lights_p, lights_emit=lights_emit,
        max_depth=int(spec.max_depth), rr_threshold=float(spec.rr_threshold),
        spp=int(sampler.spp), xs=int(sampler.xs), ys=int(sampler.ys),
        jitter=bool(sampler.jitter), seed=int(sampler.seed),
        kinds_present=kinds_present, max_lobes=max_lobes,
        max_leaf=max_leaf,
        interpret=interpret,
    )
    return jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    ).astype(DTYPE)
