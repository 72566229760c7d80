"""Packet BVH traversal kernels (Pallas TPU).

Per-lane BVH pointer chasing needs a gather per step, and TPU gathers
serialize (~20ns/row) — the round-1 jnp traversal (accel/traverse.py)
collapses on real meshes for exactly that reason.  The TPU-native shape
is *packet* traversal: each ray tile walks the flat BVH (bvh.rs:183-236
layout) together with

  - ONE scalar stack per tile (SMEM),
  - scalar node fetches (a (1,8) row slice, broadcast into vector ops),
  - vector slab tests against every ray in the tile,
  - vector Möller-Trumbore at leaves (static max_leaf unroll).

A node is descended if ANY ray in the packet intersects its AABB closer
than its current best hit.  Coherent packets (camera rays in raster
order) visit ~log(T) nodes; fully incoherent packets degrade toward the
union of per-ray node sets — still bounded by the node count, and each
node costs ~20 VPU ops against the ~40/triangle of brute force.

Tables live VMEM-resident: nodes (M,8)f32 + (M,4)i32, prims (P,12)f32 +
(P,1)i32 = ~100 B/prim, so scenes to ~10^5 prims fit the ~16 MB VMEM
alongside the ray tiles.  Larger scenes fall back to the jnp traversal
(SceneCtx gates on PALLAS_BVH_PRIM_MAX).

Triangles only: spheres above the brute-force cutoff are not a scene
shape the reference produces (spheres are hand-placed lights/subjects).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

TRI_EPS = 1e-7
LANES = 128
# packet shape: smaller packets are more coherent (smaller per-packet node
# unions) but pay the scalar while-loop overhead more often per ray.
# 32 rows measured best on the 19200-tri grid under the sample-major
# layout (4.83 vs 4.40 Mrays/s at 8 rows): with 8-sample interleave the
# coherence loss of a 4-sub-block packet is small and the while-loop
# fixed cost quarters.  Mosaic requires multiples of 8.
TILE_ROWS = int(os.environ.get("RS_BVH_TILE_ROWS", "32"))
STACK_DEPTH = 64
PALLAS_BVH_PRIM_MAX = 120_000
# shaded-traversal attribute row widths (see pack_bvh_tables):
# flat:   uv0 uv1 uv2 | dpdu dpdv ng                      (15 cols)
# smooth: ... | n0 n1 n2 | dndu dndv | has_n              (31 cols)
SHADE_COLS_FLAT = 15
SHADE_COLS_SMOOTH = 31


def pack_bvh_tables(bvh, tri):
    """Flatten FlatBVH + triangle SoA into kernel-ready device tables.

    nodes_f: (M,8)  bmin.xyz, bmax.xyz, 0, 0
    nodes_i: (M,4)  offset, n_prims, axis, 0
    prims_f: (P,12) p0.xyz, e1.xyz, e2.xyz, 0,0,0   (leaf order)
    prims_i: (P,1)  original triangle row (Hit.index)
    """
    nmin = np.asarray(bvh.bounds_min, np.float32)
    nmax = np.asarray(bvh.bounds_max, np.float32)
    m = nmin.shape[0]
    nodes_f = np.zeros((m, 8), np.float32)
    nodes_f[:, 0:3] = nmin
    nodes_f[:, 3:6] = nmax
    nodes_i = np.zeros((m, 4), np.int32)
    nodes_i[:, 0] = np.asarray(bvh.offset, np.int32)
    nodes_i[:, 1] = np.asarray(bvh.n_prims, np.int32)
    nodes_i[:, 2] = np.asarray(bvh.axis, np.int32)

    # fused-children rows (RS_BVH_FUSED traversal): each INTERIOR node
    # carries both children's boxes, so the kernel tests boxes at the
    # parent and pushes only hit children — pops drop ~2x versus the
    # pop-test-discard scheme, which matters because the while-loop's
    # per-iteration scalar overhead dominates on this chip.  Leaf rows
    # stay zero (their pushes are gated off the interior flag).
    nodes2_f = np.zeros((m, 16), np.float32)
    interior = nodes_i[:, 1] == 0
    if interior.any():
        c0 = np.arange(m)[interior] + 1
        c1 = nodes_i[interior, 0]
        nodes2_f[interior, 0:3] = nmin[c0]
        nodes2_f[interior, 3:6] = nmax[c0]
        nodes2_f[interior, 6:9] = nmin[c1]
        nodes2_f[interior, 9:12] = nmax[c1]

    order = np.asarray(bvh.prim_index, np.int32)
    p0 = np.asarray(tri.p0, np.float32)[order]
    p1 = np.asarray(tri.p1, np.float32)[order]
    p2 = np.asarray(tri.p2, np.float32)[order]
    p = order.shape[0]
    prims_f = np.zeros((p, 12), np.float32)
    prims_f[:, 0:3] = p0
    prims_f[:, 3:6] = p1 - p0
    prims_f[:, 6:9] = p2 - p0
    prims_i = np.zeros((p, 4), np.int32)
    prims_i[:, 0] = order
    prims_i[:, 1] = np.asarray(tri.mat, np.int32)[order]
    prims_i[:, 2] = np.asarray(tri.area_light, np.int32)[order]

    # shading-attribute rows in leaf order for the fused shaded traversal
    # (interaction.rs:95-113 fields; same bakes as geom.pack_shade_tables):
    # the winning prim's attributes are accumulated INSIDE the leaf test,
    # killing the post-intersect take_rows gathers (~650ns/row serialized
    # HBM access on this chip — the round-2 config-3 bottleneck)
    from ..accel import geometry as _geom

    tri_tabs = _geom.pack_shade_tables(tri, type("E", (), {"count": 0})())
    tf = np.asarray(tri_tabs["tri_f"], np.float32)[order]
    ti = np.asarray(tri_tabs["tri_i"], np.int32)[order]
    smooth = bool((ti[:, 0] != 0).any())
    ncol = SHADE_COLS_SMOOTH if smooth else SHADE_COLS_FLAT
    shade_f = np.zeros((p, ncol), np.float32)
    shade_f[:, 0:6] = tf[:, 9:15]     # uv0, uv1, uv2
    shade_f[:, 6:15] = tf[:, 24:33]   # dpdu, dpdv, ng
    if smooth:
        shade_f[:, 15:24] = tf[:, 15:24]   # n0, n1, n2
        shade_f[:, 24:30] = tf[:, 33:39]   # dndu, dndv
        shade_f[:, 30] = (ti[:, 0] != 0).astype(np.float32)
    nodes4_f, nodes4_i = pack_bvh4_tables(bvh)
    # host-side tree depth: the kernels clamp stack pushes at STACK_DEPTH,
    # silently dropping subtrees on deeper trees — callers must fall back
    # to the jnp traversal instead (SceneCtx gates on this)
    depth = np.zeros(m, np.int32)
    for i in range(m - 1, -1, -1):
        if nodes_i[i, 1] > 0:
            depth[i] = 1
        else:
            depth[i] = 1 + max(depth[i + 1], depth[nodes_i[i, 0]])
    return {
        "nodes_f": jnp.asarray(nodes_f),
        "nodes2_f": jnp.asarray(nodes2_f),
        "nodes_i": jnp.asarray(nodes_i),
        "nodes4_f": nodes4_f,
        "nodes4_i": nodes4_i,
        "prims_f": jnp.asarray(prims_f),
        "prims_i": jnp.asarray(prims_i),
        "shade_f": jnp.asarray(shade_f),
        "smooth": smooth,
        "max_leaf": int(bvh.max_leaf),
        "depth": int(depth[0]),
    }


def pack_bvh4_tables(bvh):
    """Collapse the binary flat BVH into 4-wide nodes (BVH4).

    The scalar while-loop iteration is the packet kernel's dominant cost
    on this hardware (each pop has a sequential SMEM/stack dependency);
    a 4-ary tree tests four sibling AABBs per pop and handles leaf
    children inline, cutting pops ~6x for ~2.5x per-pop vector work.

    nodes4_f: (W, 24)  per child c: bmin.xyz, bmax.xyz  (cols 6c..6c+6)
    nodes4_i: (W, 12)  per child c: kind (0 none / 1 interior / 2 leaf),
                       a (wide-node id | prim offset), b (0 | n_prims)
    Empty child slots carry an inverted AABB that never hits.
    """
    from collections import deque

    bmin = np.asarray(bvh.bounds_min, np.float32)
    bmax = np.asarray(bvh.bounds_max, np.float32)
    off = np.asarray(bvh.offset, np.int64)
    npr = np.asarray(bvh.n_prims, np.int64)

    def collect(i):
        """Up to 4 binary-node ids: the grandchildren where possible."""
        if npr[i] > 0:
            return [i]
        out = []
        for c in (i + 1, off[i]):
            if npr[c] > 0:
                out.append(c)
            else:
                out.extend([c + 1, off[c]])
        return out

    order = []
    q = deque()

    def alloc(bin_id):
        order.append(bin_id)
        q.append(bin_id)
        return len(order) - 1

    alloc(0)
    rows_f, rows_i = [], []
    while q:
        b = q.popleft()
        if npr[b] > 0:
            kids = [b]  # degenerate: a leaf root becomes its own child
        else:
            kids = collect(b)
        bf = np.zeros((4, 6), np.float32)
        bi = np.zeros((4, 3), np.int32)
        bf[:, 0:3] = 1e30
        bf[:, 3:6] = -1e30
        for c_ix, k in enumerate(kids):
            bf[c_ix, 0:3] = bmin[k]
            bf[c_ix, 3:6] = bmax[k]
            if npr[k] > 0:
                bi[c_ix] = (2, off[k], npr[k])
            else:
                bi[c_ix] = (1, alloc(k), 0)
        rows_f.append(bf.reshape(-1))
        rows_i.append(bi.reshape(-1))
    return (
        jnp.asarray(np.stack(rows_f)),
        jnp.asarray(np.stack(rows_i)),
    )


def _inv_dir(d):
    tiny = jnp.where(d < 0.0, -1e-20, 1e-20)
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20, tiny, d)


def _slab6(row, base, ox, oy, oz, ix, iy, iz, t_cur):
    """Vector slab test of one AABB read from a scalar row at column
    `base` (traverse.py node_hit semantics incl. the tf slop).  t_cur > 0
    culls dead lanes (callers pass t_max = 0 for inactive rays)."""
    bminx, bminy, bminz = row[0, base + 0], row[0, base + 1], row[0, base + 2]
    bmaxx, bmaxy, bmaxz = row[0, base + 3], row[0, base + 4], row[0, base + 5]
    t0x = (bminx - ox) * ix
    t1x = (bmaxx - ox) * ix
    t0y = (bminy - oy) * iy
    t1y = (bmaxy - oy) * iy
    t0z = (bminz - oz) * iz
    t1z = (bmaxz - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = (
        jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        * 1.0000004
    )
    return (tn <= tf) & (tf > 0.0) & (tn < t_cur) & (t_cur > 0.0)


def _traverse_kernel(
    nodes_f_ref,
    nodes_i_ref,
    prims_f_ref,
    prims_i_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    tout_ref,
    iout_ref,
    stack_ref,
    *,
    max_leaf,
    any_hit,
    fused=False,
):
    """fused=False: pop-test-discard — every pushed node's box is tested
    when popped (nodes_f_ref holds each node's OWN box).

    fused=True: nodes_f_ref is the nodes2_f child-box table — an interior
    pop tests BOTH children's boxes and pushes only the hit ones, so a
    popped node is already known hit and pops drop ~2x.  Leaf prim tests
    drop the per-lane box gate: a triangle lies inside its leaf box, so
    the barycentric/t bounds subsume it (dead lanes are excluded by
    t < t_cur with t_cur = 0)."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    if any_hit and fused:
        # occluded lanes zero their tout so the child box tests cull them
        # (t_cur > 0), replacing the per-lane (iout < 0) descent damper
        tout_ref[:] = jnp.maximum(tmax_ref[:], 0.0)
    else:
        tout_ref[:] = tmax_ref[:]
    iout_ref[:] = jnp.full(tout_ref.shape, -1, jnp.int32)

    # packet-majority direction signs pick the near child (scalar per tile)
    sx = jnp.sum(dx)
    sy = jnp.sum(dy)
    sz = jnp.sum(dz)

    stack_ref[0] = jnp.int32(0)

    def body(carry):
        sp, done = carry
        node = stack_ref[sp - 1]
        sp = sp - 1
        row_f = nodes_f_ref[pl.ds(node, 1), :]  # (1, 8|16) scalar fetch
        row_i = nodes_i_ref[pl.ds(node, 1), :]
        off = row_i[0, 0]
        npr = row_i[0, 1]
        ax = row_i[0, 2]
        is_leaf = npr > 0
        t_cur = tout_ref[:]

        if fused:
            # a popped node is known hit; test the CHILDREN here
            hit_leaf = None
            leaf_gate = is_leaf
        else:
            hit_node = _slab6(row_f, 0, ox, oy, oz, ix, iy, iz, t_cur)
            if any_hit:
                hit_node = hit_node & (iout_ref[:] < 0)
            node_any = jnp.any(hit_node)
            hit_leaf = hit_node
            leaf_gate = node_any & is_leaf

        @pl.when(leaf_gate)
        def _leaf():
            for k in range(max_leaf):
                @pl.when(k < npr)
                def _prim():
                    prow = prims_f_ref[pl.ds(off + k, 1), :]  # (1, 12)
                    p0x, p0y, p0z = prow[0, 0], prow[0, 1], prow[0, 2]
                    e1x, e1y, e1z = prow[0, 3], prow[0, 4], prow[0, 5]
                    e2x, e2y, e2z = prow[0, 6], prow[0, 7], prow[0, 8]
                    orig = prims_i_ref[off + k, 0]
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
                    tb = tout_ref[:]
                    upd = (
                        ok
                        & (u >= 0.0) & (u <= 1.0)
                        & (v >= 0.0) & (u + v <= 1.0)
                        & (t >= TRI_EPS) & (t < tb)
                    )
                    if hit_leaf is not None:
                        upd = upd & hit_leaf
                    if any_hit:
                        # occlusion: mark (no closest ordering); fused
                        # also zeroes tout to stop descending for the lane
                        iout_ref[:] = jnp.where(upd, orig, iout_ref[:])
                        if fused:
                            tout_ref[:] = jnp.where(upd, 0.0, tb)
                    else:
                        tout_ref[:] = jnp.where(upd, t, tb)
                        iout_ref[:] = jnp.where(upd, orig, iout_ref[:])

        d_ax = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
        left = node + 1
        near = jnp.where(d_ax >= 0.0, left, off)
        far = left + off - near
        if fused:
            # push only HIT children, far below near (near pops first)
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
        else:
            do_push = node_any & (~is_leaf)
            inc = jnp.where(do_push, jnp.int32(1), jnp.int32(0))
            sp_c = jnp.minimum(sp, STACK_DEPTH - 1)
            stack_ref[sp_c] = jnp.where(do_push, far, stack_ref[sp_c])
            sp1 = jnp.minimum(sp + inc, STACK_DEPTH - 1)
            stack_ref[sp1] = jnp.where(do_push, near, stack_ref[sp1])
            sp = jnp.minimum(sp + 2 * inc, STACK_DEPTH)

        if any_hit:
            # int32 carry: Mosaic miscompiles i1 carried through scf loops
            done = jnp.where(jnp.all(iout_ref[:] >= 0), jnp.int32(1), done)
        return sp, done

    def cond(carry):
        sp, done = carry
        return (sp > 0) & (done == 0)

    lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))


def _traverse_shaded_kernel(
    nodes_f_ref,
    nodes_i_ref,
    prims_f_ref,
    prims_i_ref,
    shade_f_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    tout_ref,
    iout_ref,
    mat_ref,
    al_ref,
    u_ref,
    v_ref,
    acc_ref,
    stack_ref,
    *,
    max_leaf,
    smooth,
    fused=False,
):
    """Closest-hit packet traversal that also EMITS the winning prim's
    shading attributes (VERDICT r2 #1): the leaf test already holds the
    prim's VMEM row, so its per-prim constants are accumulated with
    per-lane selects and interpolated once at the end — replacing the
    take_rows(tri_f) gather after intersect (~650ns/row serialized HBM on
    this chip; interaction.rs:95-113 / triangle.rs:220-320 semantics).

    fused=True: nodes_f_ref is the nodes2_f child-box table; box tests
    move to the parent pop and only hit children are pushed (see
    _traverse_kernel).

    acc_ref: (K, R, L) attribute accumulator in shade_f column layout;
    finalized in place: [0:2]=uv_hit, [2:5]=ns, [6:9]=dpdu, [9:12]=dpdv,
    [12:15]=ng(faceforwarded), smooth also [24:27]=dndu, [27:30]=dndv.
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    tout_ref[:] = tmax_ref[:]
    iout_ref[:] = jnp.full(tout_ref.shape, -1, jnp.int32)
    mat_ref[:] = jnp.full(tout_ref.shape, -1, jnp.int32)
    al_ref[:] = jnp.full(tout_ref.shape, -1, jnp.int32)
    u_ref[:] = jnp.zeros_like(tout_ref[:])
    v_ref[:] = jnp.zeros_like(tout_ref[:])
    n_cols = SHADE_COLS_SMOOTH if smooth else SHADE_COLS_FLAT
    for j in range(n_cols):
        acc_ref[j, :, :] = jnp.zeros_like(tout_ref[:])

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
        t_cur = tout_ref[:]

        if fused:
            hit_leaf = None
            leaf_gate = is_leaf
        else:
            hit_node = _slab6(row_f, 0, ox, oy, oz, ix, iy, iz, t_cur)
            node_any = jnp.any(hit_node)
            hit_leaf = hit_node
            leaf_gate = node_any & is_leaf

        @pl.when(leaf_gate)
        def _leaf():
            for k in range(max_leaf):
                @pl.when(k < npr)
                def _prim():
                    prow = prims_f_ref[pl.ds(off + k, 1), :]
                    p0x, p0y, p0z = prow[0, 0], prow[0, 1], prow[0, 2]
                    e1x, e1y, e1z = prow[0, 3], prow[0, 4], prow[0, 5]
                    e2x, e2y, e2z = prow[0, 6], prow[0, 7], prow[0, 8]
                    irow = prims_i_ref[pl.ds(off + k, 1), :]
                    orig = irow[0, 0]
                    mat_s = irow[0, 1]
                    al_s = irow[0, 2]
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
                    tb = tout_ref[:]
                    upd = (
                        ok
                        & (u >= 0.0) & (u <= 1.0)
                        & (v >= 0.0) & (u + v <= 1.0)
                        & (t >= TRI_EPS) & (t < tb)
                    )
                    if hit_leaf is not None:
                        upd = upd & hit_leaf
                    tout_ref[:] = jnp.where(upd, t, tb)
                    iout_ref[:] = jnp.where(upd, orig, iout_ref[:])
                    mat_ref[:] = jnp.where(upd, mat_s, mat_ref[:])
                    al_ref[:] = jnp.where(upd, al_s, al_ref[:])
                    u_ref[:] = jnp.where(upd, u, u_ref[:])
                    v_ref[:] = jnp.where(upd, v, v_ref[:])
                    srow = shade_f_ref[pl.ds(off + k, 1), :]
                    for j in range(n_cols):
                        acc_ref[j, :, :] = jnp.where(upd, srow[0, j], acc_ref[j, :, :])

        d_ax = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
        left = node + 1
        near = jnp.where(d_ax >= 0.0, left, off)
        far = left + off - near
        if fused:
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
        else:
            do_push = node_any & (~is_leaf)
            inc = jnp.where(do_push, jnp.int32(1), jnp.int32(0))
            sp_c = jnp.minimum(sp, STACK_DEPTH - 1)
            stack_ref[sp_c] = jnp.where(do_push, far, stack_ref[sp_c])
            sp1 = jnp.minimum(sp + inc, STACK_DEPTH - 1)
            stack_ref[sp1] = jnp.where(do_push, near, stack_ref[sp1])
            sp = jnp.minimum(sp + 2 * inc, STACK_DEPTH)
        return sp, done

    def cond(carry):
        sp, done = carry
        return (sp > 0) & (done == 0)

    lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))

    # ---- finalize (triangle.rs:220-320 interpolation, vectorized once) ----
    u = u_ref[:]
    v = v_ref[:]
    w = 1.0 - u - v
    uv_x = acc_ref[0, :, :] * w + acc_ref[2, :, :] * u + acc_ref[4, :, :] * v
    uv_y = acc_ref[1, :, :] * w + acc_ref[3, :, :] * u + acc_ref[5, :, :] * v
    ngx, ngy, ngz = acc_ref[12, :, :], acc_ref[13, :, :], acc_ref[14, :, :]
    if smooth:
        nsx = acc_ref[15, :, :] * w + acc_ref[18, :, :] * u + acc_ref[21, :, :] * v
        nsy = acc_ref[16, :, :] * w + acc_ref[19, :, :] * u + acc_ref[22, :, :] * v
        nsz = acc_ref[17, :, :] * w + acc_ref[20, :, :] * u + acc_ref[23, :, :] * v
        len2 = nsx * nsx + nsy * nsy + nsz * nsz
        has_n = (acc_ref[30, :, :] != 0.0) & (len2 > 0.0)
        rinv = 1.0 / jnp.sqrt(jnp.maximum(len2, 1e-30))
        nsx = jnp.where(has_n, nsx * rinv, ngx)
        nsy = jnp.where(has_n, nsy * rinv, ngy)
        nsz = jnp.where(has_n, nsz * rinv, ngz)
        # faceforward ng onto ns (surface_interaction convention)
        flip = ngx * nsx + ngy * nsy + ngz * nsz < 0.0
        ngx = jnp.where(flip, -ngx, ngx)
        ngy = jnp.where(flip, -ngy, ngy)
        ngz = jnp.where(flip, -ngz, ngz)
    else:
        nsx, nsy, nsz = ngx, ngy, ngz
    acc_ref[0, :, :] = uv_x
    acc_ref[1, :, :] = uv_y
    acc_ref[2, :, :] = nsx
    acc_ref[3, :, :] = nsy
    acc_ref[4, :, :] = nsz
    acc_ref[12, :, :] = ngx
    acc_ref[13, :, :] = ngy
    acc_ref[14, :, :] = ngz


def _traverse4_kernel(
    nodes4_f_ref,
    nodes4_i_ref,
    prims_f_ref,
    prims_i_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    tout_ref,
    iout_ref,
    stack_ref,
    *,
    max_leaf,
    any_hit,
):
    """BVH4 packet traversal: per pop, test the 4 child AABBs, run leaf
    children inline, and push hit interior children far-to-near (ordered
    by the packet-minimum slab entry distance via a 4-element
    compare-swap network)."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    tout_ref[:] = tmax_ref[:]
    iout_ref[:] = jnp.full(tout_ref.shape, -1, jnp.int32)

    stack_ref[0] = jnp.int32(0)
    BIG = jnp.float32(3.0e38)

    def body(carry):
        sp, done = carry
        node = stack_ref[sp - 1]
        sp = sp - 1
        row_f = nodes4_f_ref[pl.ds(node, 1), :]  # (1, 24)
        row_i = nodes4_i_ref[pl.ds(node, 1), :]  # (1, 12)

        push_ids = []
        push_flags = []
        push_keys = []
        for c in range(4):
            kind = row_i[0, 3 * c]
            a = row_i[0, 3 * c + 1]
            b = row_i[0, 3 * c + 2]
            bminx, bminy, bminz = (
                row_f[0, 6 * c], row_f[0, 6 * c + 1], row_f[0, 6 * c + 2]
            )
            bmaxx, bmaxy, bmaxz = (
                row_f[0, 6 * c + 3], row_f[0, 6 * c + 4], row_f[0, 6 * c + 5]
            )
            t_cur = tout_ref[:]
            t0x = (bminx - ox) * ix
            t1x = (bmaxx - ox) * ix
            t0y = (bminy - oy) * iy
            t1y = (bmaxy - oy) * iy
            t0z = (bminz - oz) * iz
            t1z = (bmaxz - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tf = (
                jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z),
                )
                * 1.0000004
            )
            hit_c = (tn <= tf) & (tf > 0.0) & (tn < t_cur) & (t_cur > 0.0)
            if any_hit:
                hit_c = hit_c & (iout_ref[:] < 0)
            any_c = jnp.any(hit_c)

            @pl.when(any_c & (kind == 2))
            def _leaf(hit_c=hit_c, off=a, npr=b):
                for k in range(max_leaf):
                    @pl.when(k < npr)
                    def _prim(off=off, k=k, hit_c=hit_c):
                        prow = prims_f_ref[pl.ds(off + k, 1), :]
                        p0x, p0y, p0z = prow[0, 0], prow[0, 1], prow[0, 2]
                        e1x, e1y, e1z = prow[0, 3], prow[0, 4], prow[0, 5]
                        e2x, e2y, e2z = prow[0, 6], prow[0, 7], prow[0, 8]
                        orig = prims_i_ref[off + k, 0]
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
                        tb = tout_ref[:]
                        upd = (
                            hit_c
                            & ok
                            & (u >= 0.0) & (u <= 1.0)
                            & (v >= 0.0) & (u + v <= 1.0)
                            & (t >= TRI_EPS) & (t < tb)
                        )
                        if any_hit:
                            iout_ref[:] = jnp.where(upd, orig, iout_ref[:])
                        else:
                            tout_ref[:] = jnp.where(upd, t, tb)
                            iout_ref[:] = jnp.where(upd, orig, iout_ref[:])

            is_int = any_c & (kind == 1)
            push_ids.append(a)
            push_flags.append(is_int)
            push_keys.append(
                jnp.min(jnp.where(hit_c & (kind == 1), tn, BIG))
            )

        # order interior pushes far-to-near (near pops first): 4-element
        # compare-swap network on the packet-min entry distances
        ids = list(push_ids)
        fl = list(push_flags)
        ky = list(push_keys)

        def swap(i, j):
            # after: slot i holds the FARTHER key (descending order)
            lt = ky[i] < ky[j]
            ky[i], ky[j] = (
                jnp.where(lt, ky[j], ky[i]), jnp.where(lt, ky[i], ky[j])
            )
            ids[i], ids[j] = (
                jnp.where(lt, ids[j], ids[i]), jnp.where(lt, ids[i], ids[j])
            )
            fl[i], fl[j] = (
                jnp.where(lt, fl[j], fl[i]), jnp.where(lt, fl[i], fl[j])
            )

        swap(0, 1); swap(2, 3); swap(0, 2); swap(1, 3); swap(1, 2)
        for s in range(4):
            inc = jnp.where(fl[s], jnp.int32(1), jnp.int32(0))
            sp_c = jnp.minimum(sp, STACK_DEPTH - 1)
            stack_ref[sp_c] = jnp.where(fl[s], ids[s], stack_ref[sp_c])
            sp = jnp.minimum(sp + inc, STACK_DEPTH)

        if any_hit:
            done = jnp.where(jnp.all(iout_ref[:] >= 0), jnp.int32(1), done)
        return sp, done

    def cond(carry):
        sp, done = carry
        return (sp > 0) & (done == 0)

    lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))


def _call(tables, o, d, t_max, any_hit, interpret):
    n = o.shape[0]
    pad = (-n) % (TILE_ROWS * LANES)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    m = (n + pad) // LANES
    comp = lambda a, c: a[:, c].reshape(m, LANES).astype(jnp.float32)
    ox, oy, oz = comp(o, 0), comp(o, 1), comp(o, 2)
    dx, dy, dz = comp(d, 0), comp(d, 1), comp(d, 2)
    tm = t_max.reshape(m, LANES).astype(jnp.float32)

    grid = (m // TILE_ROWS,)
    tile = lambda: pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    # BVH4 measured slower than binary on the bench chip (302 vs 254 ms on
    # the 19200-tri grid): the kernel is VPU-bound, so 4 slab tests per pop
    # do not pay for the fewer pops.  Kept as an option for healthier
    # hardware where scalar-loop overhead dominates.
    wide = os.environ.get("RS_BVH_WIDE", "0") == "1" and "nodes4_f" in tables
    fused = os.environ.get("RS_BVH_FUSED", "1") == "1" and "nodes2_f" in tables
    if wide:
        kernel = functools.partial(
            _traverse4_kernel, max_leaf=tables["max_leaf"], any_hit=any_hit
        )
        node_args = (tables["nodes4_f"], tables["nodes4_i"])
    elif fused:
        # child boxes tested at the parent: ~2x fewer while-loop pops
        kernel = functools.partial(
            _traverse_kernel, max_leaf=tables["max_leaf"], any_hit=any_hit,
            fused=True,
        )
        node_args = (tables["nodes2_f"], tables["nodes_i"])
    else:
        kernel = functools.partial(
            _traverse_kernel, max_leaf=tables["max_leaf"], any_hit=any_hit
        )
        node_args = (tables["nodes_f"], tables["nodes_i"])
    kwargs = {}
    if not interpret:
        # the XLA-side scoped-vmem default (16 MB) undercounts what a
        # custom call inside a fori_loop may pin; v5e VMEM is 128 MiB
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    t_out, i_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[whole(), whole(), whole(), whole()]
        + [tile() for _ in range(7)],
        out_specs=(tile(), tile()),
        out_shape=(
            jax.ShapeDtypeStruct((m, LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )(
        *node_args, tables["prims_f"], tables["prims_i"],
        ox, oy, oz, dx, dy, dz, tm,
    )
    t_flat = t_out.reshape(-1)[:n]
    i_flat = i_out.reshape(-1)[:n]
    return t_flat, i_flat


def intersect_bvh_pallas(tables, o, d, t_max, interpret=False):
    """Closest hit.  Returns (t, tri_index, valid) over original rows."""
    t, idx = _call(tables, o, d, t_max, any_hit=False, interpret=interpret)
    valid = idx >= 0
    return jnp.where(valid, t, t_max.astype(t.dtype)), idx, valid


def occluded_bvh_pallas(tables, o, d, t_max, interpret=False):
    _, idx = _call(tables, o, d, t_max, any_hit=True, interpret=interpret)
    return idx >= 0


def intersect_bvh_pallas_shaded(tables, o, d, t_max, interpret=False):
    """Closest hit + shading attributes in one kernel.

    Returns (t, idx, valid, attrs) where attrs carries uv (N,2), ns, ng,
    dpdu, dpdv, dndu, dndv (N,3) and mat, area_light (N,) — everything
    surface_interaction's triangle branch would otherwise gather
    per ray (interaction.rs:95-113)."""
    n = o.shape[0]
    pad = (-n) % (TILE_ROWS * LANES)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    m = (n + pad) // LANES
    comp = lambda a, c: a[:, c].reshape(m, LANES).astype(jnp.float32)
    ox, oy, oz = comp(o, 0), comp(o, 1), comp(o, 2)
    dx, dy, dz = comp(d, 0), comp(d, 1), comp(d, 2)
    tm = t_max.reshape(m, LANES).astype(jnp.float32)

    smooth = tables["smooth"]
    n_cols = SHADE_COLS_SMOOTH if smooth else SHADE_COLS_FLAT
    grid = (m // TILE_ROWS,)
    tile = lambda: pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tile3 = lambda: pl.BlockSpec(
        (n_cols, TILE_ROWS, LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    fused = os.environ.get("RS_BVH_FUSED", "1") == "1" and "nodes2_f" in tables
    kernel = functools.partial(
        _traverse_shaded_kernel, max_leaf=tables["max_leaf"], smooth=smooth,
        fused=fused,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    f32 = jnp.float32
    t_out, i_out, mat_o, al_o, u_o, v_o, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[whole() for _ in range(5)] + [tile() for _ in range(7)],
        out_specs=(
            tile(), tile(), tile(), tile(), tile(), tile(), tile3(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, LANES), f32),
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
            jax.ShapeDtypeStruct((m, LANES), jnp.int32),
            jax.ShapeDtypeStruct((m, LANES), f32),
            jax.ShapeDtypeStruct((m, LANES), f32),
            jax.ShapeDtypeStruct((n_cols, m, LANES), f32),
        ),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )(
        tables["nodes2_f"] if fused else tables["nodes_f"],
        tables["nodes_i"], tables["prims_f"],
        tables["prims_i"], tables["shade_f"],
        ox, oy, oz, dx, dy, dz, tm,
    )
    flat = lambda a: a.reshape(-1)[:n]
    ch = lambda j: acc[j].reshape(-1)[:n]
    v3 = lambda j: jnp.stack([ch(j), ch(j + 1), ch(j + 2)], axis=-1)
    idx = flat(i_out)
    valid = idx >= 0
    t = jnp.where(valid, flat(t_out), t_max.reshape(-1)[:n].astype(f32))
    zeros3 = None
    if smooth:
        dndu, dndv = v3(24), v3(27)
    else:
        dndu = dndv = jnp.zeros((n, 3), f32)
    attrs = {
        "uv": jnp.stack([ch(0), ch(1)], axis=-1),
        "ns": v3(2),
        "ng": v3(12),
        "dpdu": v3(6),
        "dpdv": v3(9),
        "dndu": dndu,
        "dndv": dndv,
        "mat": flat(mat_o),
        "area_light": flat(al_o),
    }
    return t, idx, valid, attrs
