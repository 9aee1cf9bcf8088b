"""8-wide BVH traversal with per-packet SMEM stacks — mesh endgame kernel.

WHY (the design named as "front #3" in ops/binned.py and built here): every
previous TPU formulation of mesh intersection paid one of two taxes on
incoherent secondary rays —
  * packet walks charge a block the UNION of its rays' binary-tree
    traversals (ops/bvh_pallas.py): 1024-8192-ray blocks union to ~1/4 of
    the tree while the mean ray wants 2-4 leaves;
  * the binned pipeline (ops/binned.py) replaces the walk with
    cull-sweeps + per-pass segmented sorts + a stream kernel, whose
    per-distinct-treelet visits and exact fallback still cost ~10-17x the
    reference on big meshes.
This kernel attacks the union tax directly, three ways at once:

  1. SMALL packets: 128 rays (one lane row), so the union is taken over a
     coherence-sorted 128-ray set, not 1024+. Per-packet scalar overhead is
     what previously forbade small blocks; the next two points buy it back.
  2. 8-WIDE nodes (scene/bvh8.py): one stack pop tests ONE node's 8
     children against all 128 rays as a single (8 children, 128 rays) slab
     tile — children ride sublanes via (8,1)x(1,128) broadcasts, so the
     whole VPU tile does useful work and tree depth drops ~3x vs binary.
     A pop does the work of ~8 binary-node visits of the old walk.
  3. TRUE front-to-back order with pop-time culling: children are pushed
     far-to-near along the node's split axis (majority direction sign of
     the packet), and every stack entry carries its min entry-t; a pop
     whose entry-t >= max over lanes of t_min is discarded unvisited.
     The ENTER/ADVANCE walk could never do this — DFS order tightens
     t_min too late to prune siblings already committed to.

Exactness: push-time wants are a superset of pop-time wants (t_min only
decreases), the pop cull discards a subtree only when NO lane can find a
closer hit inside it (entry-t >= every lane's current closest), and leaf
8-triangle groups are tested with per-lane strict t < t_min — so each lane
reports its true closest hit closer than its bound. Results match the
packet walk exactly up to exact-t ties between DIFFERENT triangles (the
wide tree orders triangles differently; align-padding duplicates are
identical triangles and therefore harmless), which do not occur in
non-degenerate meshes (tests/test_wide.py asserts bit-equality).

Stack discipline (all proven-on-Mosaic patterns only — no ref WRITES inside
lax.cond branches): the two SMEM stacks are written UNCONDITIONALLY every
pop with computed indices (unwanted children write to a dummy slot), and
the node/leaf computations are pure lax.conds that only READ the tables.

Reference parity: replaces meshIntersectionTest's per-thread stack walk
(reference src/intersections.cu:167-213) — the reference keeps a 64-entry
stack per CUDA thread; the TPU equivalent is one 148-entry SMEM stack per
128-ray packet with vectorized child tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh8 import MAX_DEPTH, MAX_WIDE_GROUPS
from ..scene.types import TRI_STRIDE, WIDE_NODES_PER_BLOCK
from ..utils.vec import Vec3

FLT_MAX = 3.402823466e38
NEG_MAX = -3.402823466e38
EPS = 1e-6
PACKET_ROWS = 8            # packets per grid block (each packet = 128 rays)
STACK = 7 * MAX_DEPTH + 8  # per-packet stack bound (see scene/bvh8.py)
LEAF_TAG = 1 << 30         # stack entries >= LEAF_TAG encode (group, count)
SORT_CHUNK = 8192          # rays per segmented coherence-sort chunk
GROUPS_PER_TBLOCK = 6      # 8-tri groups per (8,128) tris8 block
VARIANT = "push"           # production traversal variant ("push" | "mask");
#                            flip here once the TPU sweep arbitrates


def _slab8(nodesf_ref, nodesi_ref, entry, ray, t_min, sdir, cull: bool):
    """Slab-test wide node `entry`'s 8 children against the packet.

    ray = (ox, oy, oz, inv_x, inv_y, inv_z) of (1,128); sdir = per-axis
    direction sums. Returns per-child ((8,1)): want count, min entry-t over
    wanting lanes (zeros when not cull), encoded child entry; plus the
    near-child direction bit (True = ascending slots are near-to-far)."""
    ox, oy, oz, inv_x, inv_y, inv_z = ray
    sdx, sdy, sdz = sdir
    base = (entry // WIDE_NODES_PER_BLOCK) * 8
    sh = (entry % WIDE_NODES_PER_BLOCK) * 8
    bf = pltpu.roll(nodesf_ref[pl.ds(base, 8), :], -sh, 1)
    bi = pltpu.roll(nodesi_ref[pl.ds(base, 8), :], -sh, 1)
    tnx = (bf[:, 0:1] - ox) * inv_x          # (8,1)x(1,128) -> (8,128)
    tfx = (bf[:, 3:4] - ox) * inv_x
    tny = (bf[:, 1:2] - oy) * inv_y
    tfy = (bf[:, 4:5] - oy) * inv_y
    tnz = (bf[:, 2:3] - oz) * inv_z
    tfz = (bf[:, 5:6] - oz) * inv_z
    t0 = jnp.maximum(jnp.maximum(jnp.minimum(tnx, tfx),
                                 jnp.minimum(tny, tfy)),
                     jnp.minimum(tnz, tfz))
    t1 = jnp.minimum(jnp.minimum(jnp.maximum(tnx, tfx),
                                 jnp.maximum(tny, tfy)),
                     jnp.maximum(tnz, tfz))
    # empty child slots hold NaN boxes: every comparison is False
    want = jnp.logical_and(t0 <= t1,
                           jnp.logical_and(t1 > 0.0, t0 < t_min))
    wcnt = jnp.sum(want.astype(jnp.int32), axis=1, keepdims=True)
    if cull:
        t0c = jnp.min(jnp.where(want, t0, FLT_MAX), axis=1, keepdims=True)
    else:
        t0c = jnp.zeros((8, 1), jnp.float32)      # unused without cull
    kind = bi[:, 0:1]
    a = bi[:, 1:2]
    b = bi[:, 2:3]
    centry = jnp.where(kind == 2, LEAF_TAG + a * 4 + b, a)
    axis = bi[0, 3]
    dsum = jnp.where(axis == 0, sdx, jnp.where(axis == 1, sdy, sdz))
    # int32, not bool: Mosaic lowers a Python False in the sibling
    # lax.cond branch as i32, so a scalar-bool return trips MLIR
    # verification ('i32 should match i1') on real TPU
    return wcnt, t0c, centry, (dsum >= 0.0).astype(jnp.int32)


def _mt_group8(trisf_ref, gi, gate, ray_od, carry, last_tri_row):
    """Möller-Trumbore ONE 8-triangle group against the packet. `gate`
    (scalar bool) masks the whole group (tail groups past a short leaf's
    count). ray_od = (ox, oy, oz, dx, dy, dz) of (1,128)."""
    ox, oy, oz, dx, dy, dz = ray_od
    t_min, nx, ny, nz, mat = carry
    row = jnp.minimum((gi // GROUPS_PER_TBLOCK) * 8, last_tri_row)
    bt = pltpu.roll(trisf_ref[pl.ds(row, 8), :],
                    -(gi % GROUPS_PER_TBLOCK) * TRI_STRIDE, 1)
    v0x, v0y, v0z = bt[:, 0:1], bt[:, 1:2], bt[:, 2:3]
    e1x, e1y, e1z = bt[:, 3:4], bt[:, 4:5], bt[:, 5:6]
    e2x, e2y, e2z = bt[:, 6:7], bt[:, 7:8], bt[:, 8:9]
    hx = dy * e2z - dz * e2y                  # (8,128)
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    parallel = jnp.abs(a) < EPS
    f = 1.0 / jnp.where(parallel, 1.0, a)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    valid = jnp.logical_and(
        jnp.logical_and(gate, jnp.logical_not(parallel)),
        jnp.logical_and(
            jnp.logical_and(u >= 0.0, u <= 1.0),
            jnp.logical_and(
                jnp.logical_and(v >= 0.0, (u + v) <= 1.0),
                t >= EPS)))
    upd = jnp.logical_and(valid, t < t_min)   # strict: ties keep the first
    t_new = jnp.min(jnp.where(upd, t, FLT_MAX), axis=0,
                    keepdims=True)            # (1,128)
    improved = t_new < t_min
    rowi = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    is_min = jnp.logical_and(upd, t <= t_new)
    idx_min = jnp.min(jnp.where(is_min, rowi, 8), axis=0, keepdims=True)
    onehot = jnp.where(jnp.logical_and(is_min, rowi == idx_min), 1.0, 0.0)
    w = 1.0 - u - v
    nnx = w * bt[:, 9:10] + u * bt[:, 12:13] + v * bt[:, 15:16]
    nny = w * bt[:, 10:11] + u * bt[:, 13:14] + v * bt[:, 16:17]
    nnz = w * bt[:, 11:12] + u * bt[:, 14:15] + v * bt[:, 17:18]
    inv_len = jax.lax.rsqrt(
        jnp.maximum(nnx * nnx + nny * nny + nnz * nnz, 1e-30))
    flip = jnp.where(dx * nnx + dy * nny + dz * nnz > 0.0,
                     -inv_len, inv_len)
    sel = lambda q: jnp.sum(onehot * q, axis=0, keepdims=True)
    t_min = jnp.where(improved, t_new, t_min)
    nx = jnp.where(improved, sel(nnx * flip), nx)
    ny = jnp.where(improved, sel(nny * flip), ny)
    nz = jnp.where(improved, sel(nnz * flip), nz)
    mat = jnp.where(improved, sel(bt[:, 18:19]).astype(jnp.int32), mat)
    return t_min, nx, ny, nz, mat


def _wide_kernel(nodesf_ref, nodesi_ref, trisf_ref, root_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 tb_ref, act_ref,
                 t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
                 stack_n, stack_t, cull: bool = True):
    last_tri_row = trisf_ref.shape[0] - 8
    packet_rows = ox_ref.shape[0]
    root = root_ref[0, 0]

    def packet_body(p, _):
        ox = ox_ref[pl.ds(p, 1), :]          # (1, 128)
        oy = oy_ref[pl.ds(p, 1), :]
        oz = oz_ref[pl.ds(p, 1), :]
        dx = dx_ref[pl.ds(p, 1), :]
        dy = dy_ref[pl.ds(p, 1), :]
        dz = dz_ref[pl.ds(p, 1), :]
        act = act_ref[pl.ds(p, 1), :] > 0
        tb = tb_ref[pl.ds(p, 1), :]
        inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz

        # inactive lanes carry t_min = -inf: they can never want a node and
        # never register a hit, and an all-inactive packet's max_t kills the
        # root pop immediately (dead packets cost ~1 iteration).
        t_min = jnp.where(act, tb, NEG_MAX)
        zero = jnp.zeros_like(t_min)
        nx, ny, nz = zero, zero, zero
        mat = jnp.full(t_min.shape, -1, jnp.int32)

        # majority direction sign per axis: picks near-to-far child order
        sdx = jnp.sum(dx)
        sdy = jnp.sum(dy)
        sdz = jnp.sum(dz)

        stack_n[0] = root
        if cull:
            stack_t[0] = NEG_MAX

        def node_compute(entry):
            return _slab8(nodesf_ref, nodesi_ref, entry,
                          (ox, oy, oz, inv_x, inv_y, inv_z), t_min,
                          (sdx, sdy, sdz), cull)

        def node_dead(entry):
            z = jnp.zeros((8, 1), jnp.int32)
            return z, jnp.zeros((8, 1), jnp.float32), z, jnp.int32(0)

        def leaf_compute(entry, carry):
            """Möller-Trumbore the leaf's 8-triangle groups: triangles ride
            sublanes ((8,1) fields), rays ride lanes."""
            g0 = (entry - LEAF_TAG) // 4
            ng = (entry - LEAF_TAG) % 4
            ray_od = (ox, oy, oz, dx, dy, dz)

            carry = _mt_group8(trisf_ref, g0, True, ray_od, carry,
                               last_tri_row)   # a leaf always has >= 1 group
            for g in range(1, MAX_WIDE_GROUPS):
                # ~30% of leaves are single-group (groups/leaf histograms in
                # the sim): skip the statically-unrolled tail groups at
                # runtime instead of masking their full MT cost
                carry = jax.lax.cond(
                    g < ng,
                    lambda cc, g=g: _mt_group8(trisf_ref, g0 + g, True,
                                               ray_od, cc, last_tri_row),
                    lambda cc: cc, carry)
            return carry

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, t_min, nx, ny, nz, mat = c
            sp = sp - 1
            entry = stack_n[sp]
            if cull:
                te = stack_t[sp]
                max_t = jnp.max(t_min)
                live = te < max_t       # pop-time cull against tightened t
            else:
                # correctness-neutral skip: the cull only discards work that
                # cannot change any lane's closest hit, and the pop-count
                # simulator (tools/sim_wide.py) measured ZERO culled pops on
                # every scene's bounce-ray mix — the packet max(t_min) stays
                # loose while any lane is far. Dropping it removes 8 t0c
                # vector->scalar transfers + 8 SMEM writes + a compare/pop.
                live = True
            is_node = entry < LEAF_TAG

            wcnt, t0c, centry, dpos = jax.lax.cond(
                jnp.logical_and(live, is_node) if cull else is_node,
                node_compute, node_dead, entry)

            # far-to-near pushes via computed slots; unwanted children (and
            # every child of a dead/leaf pop: wcnt all-zero) write slot
            # STACK, a dummy that sp never reaches.
            if cull:
                w = [(wcnt[cix, 0] > 0).astype(jnp.int32)
                     for cix in range(8)]
            else:
                # ONE vector->scalar transfer for all 8 want flags: pack
                # them as bits of a single int (child cix -> bit cix)
                bitsv = jnp.where(
                    wcnt > 0,
                    jnp.int32(1) << jax.lax.broadcasted_iota(
                        jnp.int32, wcnt.shape, 0),
                    0)
                bits = jnp.sum(bitsv)
                w = [(bits >> cix) & 1 for cix in range(8)]
            fwd = []
            total = jnp.int32(0)
            for cix in range(8):
                fwd.append(total)
                total = total + w[cix]
            for cix in range(8):
                bwd = total - fwd[cix] - w[cix]
                pos = sp + jnp.where(dpos == 1, bwd, fwd[cix])
                idx = jnp.where(w[cix] > 0, pos, STACK)
                stack_n[idx] = centry[cix, 0]
                if cull:
                    stack_t[idx] = t0c[cix, 0]
            sp = sp + total

            t_min, nx, ny, nz, mat = jax.lax.cond(
                jnp.logical_and(live, jnp.logical_not(is_node)) if cull
                else jnp.logical_not(is_node),
                lambda cc: leaf_compute(entry, cc), lambda cc: cc,
                (t_min, nx, ny, nz, mat))
            return sp, t_min, nx, ny, nz, mat

        _, t_min, nx, ny, nz, mat = jax.lax.while_loop(
            cond, body, (jnp.int32(1), t_min, nx, ny, nz, mat))

        missed = mat < 0
        t_ref[pl.ds(p, 1), :] = jnp.where(missed, -1.0, t_min)
        nx_ref[pl.ds(p, 1), :] = nx
        ny_ref[pl.ds(p, 1), :] = ny
        nz_ref[pl.ds(p, 1), :] = nz
        mat_ref[pl.ds(p, 1), :] = mat
        return 0

    jax.lax.fori_loop(0, packet_rows, packet_body, 0)


def _wide_kernel_mask(nodesf_ref, nodesi_ref, trisf_ref, root_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tb_ref, act_ref,
                      t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
                      stack_n):
    """MASK-STACK traversal variant: one packed int32 stack entry PER NODE
    instead of one entry per wanted child.

    Entry layout: bits 0..7 = remaining wanted-children mask (bit = child
    slot), bits 8..29 = wide-node id, bit 30 = dpos (1 = ascending child
    slots are near-to-far). Each loop iteration takes the top entry's
    nearest remaining child: internal children are slab-tested and pushed
    as a fresh (node, mask) entry; leaf children run Möller-Trumbore
    inline. The top entry's mask is cleared bit-by-bit in place and the
    entry retires when drained — exactly the push-stack kernel's DFS
    near-to-far order, so results are bit-identical (tests/test_wide.py).

    WHY: the push-stack kernel pays ~9 vector->scalar transfers + 8
    computed SMEM writes per pop (8 child entries + want bits); this
    variant pays ~2 transfers + 2 SMEM writes per iteration for the same
    iteration count and identical vector work — a pure scalar-overhead
    ablation for the TPU sweep.
    """
    last_tri_row = trisf_ref.shape[0] - 8
    packet_rows = ox_ref.shape[0]
    root = root_ref[0, 0]

    def packet_body(p, _):
        ox = ox_ref[pl.ds(p, 1), :]          # (1, 128)
        oy = oy_ref[pl.ds(p, 1), :]
        oz = oz_ref[pl.ds(p, 1), :]
        dx = dx_ref[pl.ds(p, 1), :]
        dy = dy_ref[pl.ds(p, 1), :]
        dz = dz_ref[pl.ds(p, 1), :]
        act = act_ref[pl.ds(p, 1), :] > 0
        tb = tb_ref[pl.ds(p, 1), :]
        inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
        ray = (ox, oy, oz, inv_x, inv_y, inv_z)
        ray_od = (ox, oy, oz, dx, dy, dz)

        t_min0 = jnp.where(act, tb, NEG_MAX)
        zero = jnp.zeros_like(t_min0)
        sdir = (jnp.sum(dx), jnp.sum(dy), jnp.sum(dz))

        def slab_bits(node, t_min):
            """Packed wanted-children bits + dpos for wide node `node`."""
            wcnt, _, _, dpos = _slab8(nodesf_ref, nodesi_ref, node, ray,
                                      t_min, sdir, cull=False)
            bitsv = jnp.where(
                wcnt > 0,
                jnp.int32(1) << jax.lax.broadcasted_iota(
                    jnp.int32, wcnt.shape, 0),
                0)
            return jnp.sum(bitsv), dpos

        def leaf_compute(entry, carry):
            g0 = (entry - LEAF_TAG) // 4
            ng = (entry - LEAF_TAG) % 4
            carry = _mt_group8(trisf_ref, g0, True, ray_od, carry,
                               last_tri_row)
            for g in range(1, MAX_WIDE_GROUPS):
                carry = jax.lax.cond(
                    g < ng,
                    lambda cc, g=g: _mt_group8(trisf_ref, g0 + g, True,
                                               ray_od, cc, last_tri_row),
                    lambda cc: cc, carry)
            return carry

        bits0, dpos0 = slab_bits(root, t_min0)
        stack_n[0] = ((root << 8) | bits0
                      | (dpos0.astype(jnp.int32) << 30))
        sp0 = (bits0 != 0).astype(jnp.int32)

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, t_min, nx, ny, nz, mat = c
            e = stack_n[sp - 1]
            mask = e & 0xFF
            parent = (e >> 8) & 0x3FFFFF
            dpos_b = (e >> 30) & 1
            # nearest remaining child: lowest set bit when ascending slots
            # are near-to-far, else highest
            iso_lo = mask & -mask
            h = mask | (mask >> 1)
            h = h | (h >> 2)
            h = h | (h >> 4)
            iso_hi = h - (h >> 1)
            iso = jnp.where(dpos_b == 1, iso_lo, iso_hi)
            cix = (((iso & 0xAA) != 0).astype(jnp.int32)
                   + ((iso & 0xCC) != 0).astype(jnp.int32) * 2
                   + ((iso & 0xF0) != 0).astype(jnp.int32) * 4)
            mask2 = mask & jnp.bitwise_not(iso)
            stack_n[sp - 1] = (e & jnp.int32(~0xFF)) | mask2
            sp = sp - (mask2 == 0).astype(jnp.int32)   # retire when drained

            # child record: (kind, a, b) of slot cix — one sublane roll +
            # static extracts (the only vector->scalar transfers this
            # iteration besides the slab bits)
            base = (parent // WIDE_NODES_PER_BLOCK) * 8
            sh = (parent % WIDE_NODES_PER_BLOCK) * 8
            bi = pltpu.roll(nodesi_ref[pl.ds(base, 8), :], -sh, 1)
            bi_r = pltpu.roll(bi, -cix, 0)
            kind = bi_r[0, 0]
            a = bi_r[0, 1]
            b = bi_r[0, 2]
            is_leaf = kind == 2

            bits, dpos2 = jax.lax.cond(
                is_leaf, lambda _t: (jnp.int32(0), jnp.int32(0)),
                lambda t_m: slab_bits(a, t_m), t_min)
            entry2 = (a << 8) | bits | (dpos2.astype(jnp.int32) << 30)
            idx = jnp.where(bits != 0, sp, STACK)
            stack_n[idx] = entry2
            sp = sp + (bits != 0).astype(jnp.int32)

            t_min, nx, ny, nz, mat = jax.lax.cond(
                is_leaf,
                lambda cc: leaf_compute(LEAF_TAG + a * 4 + b, cc),
                lambda cc: cc,
                (t_min, nx, ny, nz, mat))
            return sp, t_min, nx, ny, nz, mat

        _, t_min, nx, ny, nz, mat = jax.lax.while_loop(
            cond, body, (sp0, t_min0, zero, zero, zero,
                         jnp.full(t_min0.shape, -1, jnp.int32)))

        missed = mat < 0
        t_ref[pl.ds(p, 1), :] = jnp.where(missed, -1.0, t_min)
        nx_ref[pl.ds(p, 1), :] = nx
        ny_ref[pl.ds(p, 1), :] = ny
        nz_ref[pl.ds(p, 1), :] = nz
        mat_ref[pl.ds(p, 1), :] = mat
        return 0

    jax.lax.fori_loop(0, packet_rows, packet_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "packet_rows", "cull",
                                    "variant"))
def mesh_intersect_wide(scene, origin: Vec3, direction: Vec3,
                        active=None, t_bound=None, interpret: bool = False,
                        packet_rows: int = PACKET_ROWS, cull: bool = False,
                        variant: str = VARIANT):
    """8-wide per-packet-stack mesh intersection over the whole ray pool.

    One call covers every mesh (the wide forest concatenates them under a
    super-root, scene/bvh8.py concat_wide). Same contract as
    mesh_intersect_packet: (t [N], normal Vec3, mat [N]), t = -1 where no
    hit strictly closer than `t_bound`; true closest hit on active lanes.

    Perf knobs only — results identical across all of them:
    `packet_rows` = packets (grid-block rows) per kernel invocation;
    `cull` = keep the pop-time entry-t cull (push variant only; discards
    only provably-useless pops, and tools/sim_wide.py measured it firing
    ZERO times on every scene's bounce-ray mix, hence the False default);
    `variant` = "push" (one stack entry per wanted child) or "mask" (one
    packed (node, wantmask) entry per node — ~2 vector->scalar transfers
    per iteration instead of ~9, see _wide_kernel_mask).
    """
    n = origin.x.shape[0]
    block = packet_rows * 128
    n_pad = ((n + block - 1) // block) * block

    def prep(a, fill):
        return jnp.pad(a, (0, n_pad - n),
                       constant_values=fill).reshape(-1, 128)

    ox, oy, oz = (prep(c, 0.0) for c in origin)
    dx, dy, dz = (prep(c, 1.0) for c in direction)
    if active is None:
        act = jnp.ones((n,), jnp.int32)
    else:
        act = active.astype(jnp.int32)
    act = prep(act, 0)
    if t_bound is None:
        t_bound = jnp.full((n,), FLT_MAX)
    tb = prep(t_bound, 0.0)
    root = scene.wide_root.reshape(1, 1)

    rows = n_pad // 128
    grid = rows // packet_rows
    ray_spec = pl.BlockSpec((packet_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 4 + [
        jax.ShapeDtypeStruct((rows, 128), jnp.int32)]
    if variant == "mask":
        # packed entries hold the wide-node id in bits 8..29
        n_wide = scene.nodes8_f.shape[0] // 8 * WIDE_NODES_PER_BLOCK
        assert n_wide < (1 << 22), "wide forest too large for packed entries"
        kernel = _wide_kernel_mask
        # one entry per node on the DFS path (not per child): depth bound
        scratch = [pltpu.SMEM((STACK + 1,), jnp.int32)]
    else:
        kernel = functools.partial(_wide_kernel, cull=cull)
        scratch = [pltpu.SMEM((STACK + 1,), jnp.int32),
                   pltpu.SMEM((STACK + 1,), jnp.float32)]
    t, nx, ny, nz, mat = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[table_spec, table_spec, table_spec,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                  ray_spec, ray_spec],
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(scene.nodes8_f, scene.nodes8_i, scene.tris8, root,
      ox, oy, oz, dx, dy, dz, tb, act)

    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), Vec3(flat(nx), flat(ny), flat(nz)), flat(mat)


def mesh_intersect_wide_sorted(scene, mesh_roots, origin: Vec3,
                               direction: Vec3, active=None, t_bound=None,
                               interpret: bool = False,
                               sort_chunk: int = SORT_CHUNK,
                               variant: str = VARIANT):
    """Wide-kernel traversal over COHERENCE-SORTED 128-ray packets.

    Same wrapper scheme as mesh_intersect_packet_sorted (bvh_pallas.py):
    key = direction octant for mesh candidates (any binary mesh-root AABB
    hit closer than the lane's bound), 8 for everyone else; one segmented
    multi-operand sort clusters packets, a second keyed by ride-along lane
    index restores order. Packet membership only gates work — per-lane
    results are exact either way.
    """
    n = origin.x.shape[0]
    chunk = min(sort_chunk, _ceil_to(n, 128))
    n_pad = _ceil_to(n, chunk)

    def prep(a, fill):
        return jnp.pad(a, (0, n_pad - n), constant_values=fill)

    act = jnp.ones((n,), jnp.bool_) if active is None else active
    if t_bound is None:
        t_bound = jnp.full((n,), FLT_MAX)

    candidate = jnp.zeros((n,), bool)
    inv_dir = 1.0 / direction
    for root in mesh_roots:
        bmin = Vec3(scene.bvh.min_x[root], scene.bvh.min_y[root],
                    scene.bvh.min_z[root])
        bmax = Vec3(scene.bvh.max_x[root], scene.bvh.max_y[root],
                    scene.bvh.max_z[root])
        t_near = (bmin - origin) * inv_dir
        t_far = (bmax - origin) * inv_dir
        t0 = Vec3.minimum(t_near, t_far).max_component()
        t1 = Vec3.maximum(t_near, t_far).min_component()
        candidate = jnp.logical_or(candidate, jnp.logical_and(
            act, jnp.logical_and(
                t0 <= t1, jnp.logical_and(t1 > 0.0, t0 < t_bound))))

    octant = ((direction.x < 0) * 4 + (direction.y < 0) * 2
              + (direction.z < 0) * 1).astype(jnp.int32)
    key = jnp.where(candidate, octant, 8)

    lane = jnp.arange(n_pad, dtype=jnp.int32) % chunk
    ops_in = [prep(key, 9), lane,
              prep(origin.x, 0.0), prep(origin.y, 0.0), prep(origin.z, 0.0),
              prep(direction.x, 1.0), prep(direction.y, 1.0),
              prep(direction.z, 1.0),
              prep(t_bound, 0.0), prep(candidate, False)]
    seg = [a.reshape(-1, chunk) for a in ops_in]
    s = jax.lax.sort(seg, num_keys=1)
    _, lane_s, ox, oy, oz, dx, dy, dz, tb, cand = [
        a.reshape(-1) for a in s]

    t, nrm, mat = mesh_intersect_wide(
        scene, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
        active=cand, t_bound=tb, interpret=interpret, variant=variant)

    back = jax.lax.sort(
        [lane_s.reshape(-1, chunk)] + [
            a.reshape(-1, chunk) for a in (t, nrm.x, nrm.y, nrm.z, mat)],
        num_keys=1)
    t, nx, ny, nz, mat = [a.reshape(-1)[:n] for a in back[1:]]
    return t, Vec3(nx, ny, nz), mat


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
