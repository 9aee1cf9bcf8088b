"""Pallas packet BVH traversal — the hot kernel of mesh intersection.

Why this shape (all alternatives below were BUILT and MEASURED on TPU v5e):

  * Per-lane pointer chasing is off the table. XLA lowers dynamic gathers
    element-serially on this hardware: ~7.4 ns/element, i.e. a single
    [640k] gather costs ~4.7 ms and one stackless-traversal step with 18
    gathers costs 85 ms (measured; a d4 teapot frame would take minutes).
    Mosaic refuses >2-D gathers, lane-dim dynamic slices crash the compiler,
    and `take_along_axis(axis=1)` only gathers within a 128-lane row.

  * What IS fast: scalar-indexed ROW loads from VMEM (`ref[pl.ds(i,1), :]`),
    dynamic `pltpu.roll`, scalar while_loops, and (8,128) vector ALU.

So the kernel traverses the BVH as a PACKET: each grid block owns a tile of
rays (lane-parallel) and ONE scalar traversal state machine (the stackless
ENTER/ADVANCE walk over parent/sibling links, same as ops/intersect.py). Per
step it loads one node record with a scalar row load + roll-extract, tests
the AABB against every ray in the block on the VPU, and descends if ANY ray
wants the subtree. Leaf triangles are stored contiguously (scene/bvh.py
max_leaf) and streamed the same way. Divergence costs the block the UNION of
its rays' traversals, so callers should keep blocks spatially coherent
(camera rays in pixel order already are). This mirrors classic CPU-SIMD
packet tracing (Wald et al.) rather than the reference's per-thread stack
walk (intersections.cu:167-213) — one scalar brain, 4096 SIMD bodies.

Measured on the teapot scene (6320 tris, 800x800): primary rays (pixel-
coherent blocks) intersect at reference-class speed (~17.7 ms/frame at d1);
each DIFFUSE bounce adds ~280 ms because incoherent blocks' traversal unions
saturate at the whole tree — the architectural price of a vector machine
with no per-lane gather. Secondary-ray coherence scheduling (octant
masking / bounce-local sorting) is the open optimization front.

The kernel returns the TRUE closest hit (no reference pruning quirk: AABB
masks here only gate work, never hit registration).

Table layouts are produced by scene/types.py pack_bvh_tables: multiple
records per 128-lane row because VMEM tiles are (8,128) and narrow tables
would waste 16x the capacity (the alien mesh must fit: ~23k nodes + 46.6k
triangles ≈ 5 MB packed).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import NODES_PER_FROW, NODES_PER_IROW, TRI_STRIDE, TRIS_PER_ROW
from ..utils.vec import Vec3

FLT_MAX = 3.402823466e38  # python float: jnp scalars would be captured consts in the kernel
OCTANT_PASSES = False     # 8 direction-masked walks/pass (measured: loses)
BLOCK_ROWS = 64           # rays per block = BLOCK_ROWS * 128. Swept on TPU
#                           (teapot ms/frame): 8->1111, 16->1112, 32->635,
#                           64->579, 128->579. Incoherent-bounce unions
#                           saturate regardless, so bigger blocks amortize
#                           the per-block walk; 64 rows = 8192 rays.
EPS = 1e-6


def _extract(row, group: jnp.ndarray, stride: int):
    """Pull record `group` (stride fields) out of a (1,128) row via dynamic
    roll; returns a (1,128) vector whose lanes 0..stride-1 are the record."""
    return pltpu.roll(row, -stride * group, 1)


def _packet_kernel(nodesf_ref, nodesi_ref, trisf_ref, root_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
                   tb_ref,
                   t_ref, nx_ref, ny_ref, nz_ref, mat_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    lane_active = act_ref[:] > 0
    inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
    shape = ox.shape

    # Closest-hit bound from already-intersected geometry (analytic geoms run
    # FIRST in intersect_scene): traversal starts with t_min = bound, so any
    # subtree entirely behind a closer wall/sphere hit is pruned and lanes
    # whose bound blocks the mesh entirely never pull their block into the
    # tree. A mesh hit only registers if strictly closer than the bound.
    t_bound = tb_ref[:]
    t_min0 = t_bound
    zero = jnp.zeros(shape, jnp.float32)
    mat0 = jnp.full(shape, -1, jnp.int32)

    def leaf_test(tri_first, tri_count, carry):
        """Test one row-aligned leaf: per 128-lane row, ONE dynamic row load
        + static-lane extracts per triangle — no dynamic roll in the hot leaf
        path (scene/bvh.py align_leaves). Leaves wider than one row (max_leaf
        > TRIS_PER_ROW) walk consecutive rows with a scalar fori."""
        row0 = tri_first // TRIS_PER_ROW
        n_rows = (tri_count + TRIS_PER_ROW - 1) // TRIS_PER_ROW

        def row_body(r, cc):
            trow = trisf_ref[pl.ds(row0 + r, 1), :]
            base = r * TRIS_PER_ROW
            for j in range(TRIS_PER_ROW):
                cc = tri_test(trow, j, base + j < tri_count, cc)
            return cc

        return jax.lax.fori_loop(0, n_rows, row_body, carry)

    def tri_test(trow, j, in_leaf, carry):
        """Test triangle slot j of a loaded row against all lanes."""
        t_min, nx, ny, nz, mat = carry
        b = TRI_STRIDE * j
        tv = trow
        v0x, v0y, v0z = tv[0, b + 0], tv[0, b + 1], tv[0, b + 2]
        e1x, e1y, e1z = tv[0, b + 3], tv[0, b + 4], tv[0, b + 5]
        e2x, e2y, e2z = tv[0, b + 6], tv[0, b + 7], tv[0, b + 8]

        # Moller-Trumbore, scalar triangle vs vector rays
        hx = dy * e2z - dz * e2y
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
            jnp.logical_not(parallel),
            jnp.logical_and(
                jnp.logical_and(u >= 0.0, u <= 1.0),
                jnp.logical_and(jnp.logical_and(v >= 0.0, (u + v) <= 1.0),
                                t >= EPS)))
        upd = jnp.logical_and(
            in_leaf, jnp.logical_and(valid,
                                     jnp.logical_and(t > 0.0, t < t_min)))

        # smooth normal of THIS triangle (scalar corners, vector u/v weights;
        # triangleIntersect, intersections.cu:155-160). Normalization and
        # the toward-ray flip are DEFERRED to the kernel epilogue — only the
        # winning tri's normal survives, so rsqrt+flip once per lane beats
        # once per tri test (bit-exact: same final ops on the same values).
        w = 1.0 - u - v
        nnx = w * tv[0, b + 9] + u * tv[0, b + 12] + v * tv[0, b + 15]
        nny = w * tv[0, b + 10] + u * tv[0, b + 13] + v * tv[0, b + 16]
        nnz = w * tv[0, b + 11] + u * tv[0, b + 14] + v * tv[0, b + 17]

        t_min = jnp.where(upd, t, t_min)
        nx = jnp.where(upd, nnx, nx)
        ny = jnp.where(upd, nny, ny)
        nz = jnp.where(upd, nnz, nz)
        mat = jnp.where(upd, tv[0, b + 18].astype(jnp.int32), mat)
        return t_min, nx, ny, nz, mat

    ENTER, ADVANCE = jnp.int32(0), jnp.int32(1)

    # Direction octant per lane: secondary bounce rays are directionally
    # incoherent, and a single walk's union then saturates at the whole tree.
    # Walking the tree once PER OCTANT with `want` masked to that octant's
    # lanes keeps each pass's union small (same-octant rays from a compact
    # pixel tile are coherent), and t_min carries across passes so later
    # octants prune against earlier hits. Zero data movement.
    octant = (jnp.where(dx < 0, 4, 0) + jnp.where(dy < 0, 2, 0)
              + jnp.where(dz < 0, 1, 0))

    def cond(c):
        return c[0] >= 0

    def make_body(active):
        def body(c):
            node, mode, t_min, nx, ny, nz, mat = c
            frow = nodesf_ref[pl.ds(node // NODES_PER_FROW, 1), :]
            fv = _extract(frow, node % NODES_PER_FROW, 8)
            irow = nodesi_ref[pl.ds(node // NODES_PER_IROW, 1), :]
            iv = _extract(irow, node % NODES_PER_IROW, 4)
            tri_first, tri_count = iv[0, 0], iv[0, 1]
            sib, par = iv[0, 2], iv[0, 3]

            entering = mode == ENTER

            # slab test: scalar box vs vector rays (aabbIntersect semantics).
            # (Splitting ENTER/ADVANCE into lax.cond branches to skip this on
            # ADVANCE steps was measured SLOWER — 726 vs 635 ms teapot frame —
            # Mosaic cond overhead exceeds the redundant box test.)
            tnx = (fv[0, 0] - ox) * inv_x
            tfx = (fv[0, 3] - ox) * inv_x
            tny = (fv[0, 1] - oy) * inv_y
            tfy = (fv[0, 4] - oy) * inv_y
            tnz = (fv[0, 2] - oz) * inv_z
            tfz = (fv[0, 5] - oz) * inv_z
            t0 = jnp.maximum(jnp.maximum(jnp.minimum(tnx, tfx),
                                         jnp.minimum(tny, tfy)),
                             jnp.minimum(tnz, tfz))
            t1 = jnp.minimum(jnp.minimum(jnp.maximum(tnx, tfx),
                                         jnp.maximum(tny, tfy)),
                             jnp.maximum(tnz, tfz))
            want = jnp.logical_and(
                jnp.logical_and(active, lane_active),
                jnp.logical_and(t0 <= t1,
                                jnp.logical_and(t1 > 0.0, t0 < t_min)))
            any_want = jnp.logical_and(
                entering, jnp.sum(want.astype(jnp.int32)) > 0)

            is_leaf = tri_count > 0

            t_min, nx, ny, nz, mat = jax.lax.cond(
                jnp.logical_and(any_want, is_leaf),
                lambda cc: leaf_test(tri_first, tri_count, cc),
                lambda cc: cc, (t_min, nx, ny, nz, mat))

            descend = jnp.logical_and(any_want, jnp.logical_not(is_leaf))
            node_next = jnp.where(descend, node + 1,
                                  jnp.where(sib >= 0, sib, par))
            mode_next = jnp.where(jnp.logical_or(descend, sib >= 0),
                                  ENTER, ADVANCE)
            return node_next, mode_next, t_min, nx, ny, nz, mat
        return body

    root = root_ref[0, 0]

    if OCTANT_PASSES:
        def oct_pass(o, carry):
            t_min, nx, ny, nz, mat = carry
            _, _, t_min, nx, ny, nz, mat = jax.lax.while_loop(
                cond, make_body(octant == o),
                (root, ENTER, t_min, nx, ny, nz, mat))
            return t_min, nx, ny, nz, mat

        t_min, nx, ny, nz, mat = jax.lax.fori_loop(
            0, 8, oct_pass, (t_min0, zero, zero, zero, mat0))
    else:
        always = octant >= 0
        _, _, t_min, nx, ny, nz, mat = jax.lax.while_loop(
            cond, make_body(always),
            (root, ENTER, t_min0, zero, zero, zero, mat0))

    # deferred per-lane normalization + facing flip of the winning normal
    inv_len = jax.lax.rsqrt(
        jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    flip = jnp.where(dx * nx + dy * ny + dz * nz > 0.0, -inv_len, inv_len)
    missed = t_min >= t_bound     # nothing closer than the incoming bound
    t_ref[:] = jnp.where(missed, -1.0, t_min)
    nx_ref[:] = nx * flip
    ny_ref[:] = ny * flip
    nz_ref[:] = nz * flip
    mat_ref[:] = jnp.where(missed, -1, mat)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def mesh_intersect_packet(scene, root_node, origin: Vec3, direction: Vec3,
                          active=None, t_bound=None,
                          interpret: bool = False,
                          block_rows: int = BLOCK_ROWS):
    """Packet-traversal mesh intersection over the whole ray pool.

    Same contract as ops.intersect.mesh_intersect (t [N] / normal / mat, -1 on
    miss) but TRUE closest-hit (no pruning quirk). Pads the pool to a multiple
    of the block size. `t_bound` ([N] f32, optional) is the closest hit found
    by earlier geometry: only strictly closer mesh hits are reported, and the
    bound prunes traversal (see _packet_kernel).
    """
    n = origin.x.shape[0]
    block = block_rows * 128
    n_pad = ((n + block - 1) // block) * block

    def prep(a, fill):
        return jnp.pad(a, (0, n_pad - n),
                       constant_values=fill).reshape(-1, 128)

    ox, oy, oz = (prep(c, 0.0) for c in origin)
    # pad directions with 1s: degenerate rays still traverse but harmlessly
    dx, dy, dz = (prep(c, 1.0) for c in direction)
    if active is None:
        act = jnp.ones((n,), jnp.int32)
    else:
        act = active.astype(jnp.int32)
    act = prep(act, 0)
    if t_bound is None:
        t_bound = jnp.full((n,), FLT_MAX)
    tb = prep(t_bound, 0.0)   # pad lanes are inactive anyway
    root = jnp.asarray(root_node, jnp.int32).reshape(1, 1)

    rows = n_pad // 128
    grid = rows // block_rows
    ray_spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 4 + [
        jax.ShapeDtypeStruct((rows, 128), jnp.int32)]
    t, nx, ny, nz, mat = pl.pallas_call(
        _packet_kernel,
        grid=(grid,),
        in_specs=[table_spec, table_spec, table_spec,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                  ray_spec, ray_spec],
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(scene.bvh_packed_f, scene.bvh_packed_i, scene.tris_packed, root,
      ox, oy, oz, dx, dy, dz, act, tb)

    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), Vec3(flat(nx), flat(ny), flat(nz)), flat(mat)


# ---------------------------------------------------------------------------
# Coherence-sorted packet traversal — the secondary-bounce fast path
# ---------------------------------------------------------------------------

SORT_BLOCK_ROWS = 8   # rays per packet block in sorted mode (swept below)
SORT_CHUNK = 8192   # rays per segmented-sort chunk (= 64 rows; a multiple of
#                     every BLOCK_ROWS choice). Chunks are contiguous lane
#                     runs, so origins within a chunk are already coherent
#                     (neighboring pixels' bounce origins cluster); the sort
#                     adds direction coherence WITHIN the chunk only — far
#                     cheaper than a full-pool sort and just as effective,
#                     since blocks are carved out of chunks.


def _dir_octant(direction: Vec3) -> jnp.ndarray:
    return ((direction.x < 0) * 4 + (direction.y < 0) * 2
            + (direction.z < 0) * 1).astype(jnp.int32)


def mesh_intersect_packet_sorted(scene, root_node, origin: Vec3,
                                 direction: Vec3, active=None, t_bound=None,
                                 interpret: bool = False,
                                 block_rows: int = SORT_BLOCK_ROWS,
                                 sort_chunk: int = SORT_CHUNK):
    """Packet traversal over COHERENCE-SORTED blocks.

    The packet kernel's cost is the union of its block's traversals
    (module docstring): incoherent diffuse-bounce rays saturate the union at
    the whole tree, which is why the unsorted walk is ~reference-class on
    primary rays but was 21-55x slower on bounces. This wrapper restores
    block coherence per bounce with pure data movement that XLA lowers well:

      1. key each ray: mesh-candidates (active, and the root AABB is hit
         CLOSER than the ray's current analytic bound) get their direction
         octant 0..7; everything else gets 8, so dead/blocked rays cluster
         into blocks that terminate at the root test instantly.
      2. segmented multi-operand lax.sort within contiguous SORT_CHUNK runs
         (origins are already pixel-coherent within a run; the batched
         segment sort is much cheaper than one full-pool sort).
      3. run the packet kernel on the sorted pool: blocks are now
         (origin-cluster x octant)-coherent, so traversal unions stay near a
         single ray's working set.
      4. invert the permutation with a second segmented sort keyed by the
         ride-along lane index (random gathers are element-serial on TPU;
         a sort network is the fast way to move data — ops/scan.py).

    Results are BIT-IDENTICAL to mesh_intersect_packet: block membership only
    affects which nodes get visited, never a lane's own closest hit.
    """
    n = origin.x.shape[0]
    chunk = min(sort_chunk, _ceil_to(n, 128))
    n_pad = _ceil_to(n, chunk)

    def prep(a, fill):
        return jnp.pad(a, (0, n_pad - n), constant_values=fill)

    if active is None:
        act = jnp.ones((n,), jnp.bool_)
    else:
        act = active
    if t_bound is None:
        t_bound = jnp.full((n,), FLT_MAX)

    root = jnp.asarray(root_node, jnp.int32)
    bmin = Vec3(scene.bvh.min_x[root], scene.bvh.min_y[root],
                scene.bvh.min_z[root])
    bmax = Vec3(scene.bvh.max_x[root], scene.bvh.max_y[root],
                scene.bvh.max_z[root])
    # EXACTLY the kernel's root want-test (entry t0, not aabb_intersect's
    # inside-origin exit t): excluding any lane the kernel would traverse
    # would silently drop its hits.
    inv_dir = 1.0 / direction
    t_near = (bmin - origin) * inv_dir
    t_far = (bmax - origin) * inv_dir
    t0 = Vec3.minimum(t_near, t_far).max_component()
    t1 = Vec3.maximum(t_near, t_far).min_component()
    candidate = jnp.logical_and(
        act, jnp.logical_and(t0 <= t1,
                             jnp.logical_and(t1 > 0.0, t0 < t_bound)))
    key = jnp.where(candidate, _dir_octant(direction), 8)

    lane = (jnp.arange(n_pad, dtype=jnp.int32) % chunk)
    ops_in = [prep(key, 9), lane,
              prep(origin.x, 0.0), prep(origin.y, 0.0), prep(origin.z, 0.0),
              prep(direction.x, 1.0), prep(direction.y, 1.0),
              prep(direction.z, 1.0),
              prep(t_bound, 0.0), prep(candidate, False)]
    seg = [a.reshape(-1, chunk) for a in ops_in]
    s = jax.lax.sort(seg, num_keys=1)
    _, lane_s, ox, oy, oz, dx, dy, dz, tb, cand = [
        a.reshape(-1) for a in s]

    t, nrm, mat = mesh_intersect_packet(
        scene, root_node, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
        active=cand, t_bound=tb, interpret=interpret,
        block_rows=min(block_rows, chunk // 128))

    back = jax.lax.sort(
        [lane_s.reshape(-1, chunk)] + [
            a.reshape(-1, chunk) for a in (t, nrm.x, nrm.y, nrm.z, mat)],
        num_keys=1)
    t, nx, ny, nz, mat = [a.reshape(-1)[:n] for a in back[1:]]
    return t, Vec3(nx, ny, nz), mat


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# MXU brute-force intersector — the incoherent-bounce fast path
# ---------------------------------------------------------------------------

BRUTE_RAY_ROWS = 8    # rays per grid block = BRUTE_RAY_ROWS * 128


def _brute_kernel(coeffs_ref, attrs_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  t_ref, nx_ref, ny_ref, nz_ref, mat_ref, best_s):
    """One (ray-block, tri-tile) grid step of the matmul intersector.

    Möller–Trumbore for 512 triangles x 128 rays is ONE [2048,16]@[16,128]
    matmul (scene/types.py pack_tris_mxu): row blocks give the determinant a,
    u*a, v*a and t*a. Validity (u,v in the unit triangle, t >= eps) is tested
    a-sign-free by comparing a-weighted numerators against a^2 on the VPU,
    and the per-tile winner's attributes (corner normals + material) come
    back through a one-hot matmul — no per-lane gathers anywhere. Grid dim 1
    sweeps triangle tiles with a running best-hit scratch (16 planes:
    t, u, v, n0..n2, mat); dim 0 sweeps ray blocks. Saturated diffuse
    bounces become pure MXU + VPU streaming with zero serial pointer chases.
    """
    from ..scene.types import MXU_NFEAT, MXU_TRI_TILE

    k = pl.program_id(1)
    n_tri_tiles = pl.num_programs(1)
    T_, U_, V_, N0_, MAT_ = 0, 1, 2, 3, 12   # scratch plane indices

    @pl.when(k == 0)
    def _():
        best_s[:] = jnp.zeros_like(best_s[:])
        best_s[T_] = jnp.full_like(best_s[T_], FLT_MAX)
        best_s[MAT_] = jnp.full_like(best_s[MAT_], -1.0)

    coeffs = coeffs_ref[:]           # [4*TILE, 16]
    attrs_t = attrs_ref[:].T         # [16, TILE]

    for r in range(BRUTE_RAY_ROWS):
        dx = dx_ref[r:r + 1, :]      # (1, 128)
        dy = dy_ref[r:r + 1, :]
        dz = dz_ref[r:r + 1, :]
        ox = ox_ref[r:r + 1, :]
        oy = oy_ref[r:r + 1, :]
        oz = oz_ref[r:r + 1, :]
        cx = oy * dz - oz * dy       # o x d
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        one = jnp.ones_like(dx)
        zero = jnp.zeros_like(dx)
        feats = jnp.concatenate(
            [dx, dy, dz, ox, oy, oz, cx, cy, cz, one]
            + [zero] * (MXU_NFEAT - 10), axis=0)          # [16, 128]

        quad = jnp.dot(coeffs, feats,
                       preferred_element_type=jnp.float32)  # [4*TILE, 128]
        a = quad[0 * MXU_TRI_TILE:1 * MXU_TRI_TILE]
        un = quad[1 * MXU_TRI_TILE:2 * MXU_TRI_TILE]
        vn = quad[2 * MXU_TRI_TILE:3 * MXU_TRI_TILE]
        tn = quad[3 * MXU_TRI_TILE:4 * MXU_TRI_TILE]

        a2 = a * a
        ua = un * a
        va = vn * a
        valid = jnp.logical_and(
            a2 > EPS * EPS,
            jnp.logical_and(
                jnp.logical_and(ua >= 0.0, va >= 0.0),
                jnp.logical_and(ua + va <= a2, tn * a >= EPS * a2)))
        inv_a = pl.reciprocal(jnp.where(valid, a, 1.0), approx=False)
        t = jnp.where(valid, tn * inv_a, FLT_MAX)         # [TILE, 128]

        t_best = jnp.min(t, axis=0, keepdims=True)        # [1, 128]
        improved = t_best[0] < best_s[T_, r, :]
        # first-minimum one-hot (ties arise only from duplicated geometry);
        # Mosaic has no cumsum: pick the smallest ROW INDEX among the minima
        is_min = jnp.logical_and(t <= t_best, t < FLT_MAX)
        row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        idx_min = jnp.min(jnp.where(is_min, row, MXU_TRI_TILE),
                          axis=0, keepdims=True)
        onehot = jnp.where(jnp.logical_and(is_min, row == idx_min), 1.0, 0.0)

        attr = jnp.dot(attrs_t, onehot,
                       preferred_element_type=jnp.float32)  # [16, 128]
        inv_w = jnp.sum(onehot * inv_a, axis=0)
        u_w = jnp.sum(onehot * un, axis=0) * inv_w
        v_w = jnp.sum(onehot * vn, axis=0) * inv_w

        best_s[T_, r, :] = jnp.where(improved, t_best[0], best_s[T_, r, :])
        best_s[U_, r, :] = jnp.where(improved, u_w, best_s[U_, r, :])
        best_s[V_, r, :] = jnp.where(improved, v_w, best_s[V_, r, :])
        for c in range(9):          # n0..n2 corner components
            best_s[N0_ + c, r, :] = jnp.where(
                improved, attr[c], best_s[N0_ + c, r, :])
        best_s[MAT_, r, :] = jnp.where(improved, attr[9],
                                       best_s[MAT_, r, :])

    @pl.when(k == n_tri_tiles - 1)
    def _():
        t = best_s[T_]
        u = best_s[U_]
        v = best_s[V_]
        w = 1.0 - u - v
        nnx = w * best_s[3] + u * best_s[6] + v * best_s[9]
        nny = w * best_s[4] + u * best_s[7] + v * best_s[10]
        nnz = w * best_s[5] + u * best_s[8] + v * best_s[11]
        inv_len = jax.lax.rsqrt(
            jnp.maximum(nnx * nnx + nny * nny + nnz * nnz, 1e-30))
        dxa, dya, dza = dx_ref[:], dy_ref[:], dz_ref[:]
        flip = jnp.where(dxa * nnx + dya * nny + dza * nnz > 0.0,
                         -inv_len, inv_len)
        missed = t >= FLT_MAX
        t_ref[:] = jnp.where(missed, -1.0, t)
        nx_ref[:] = nnx * flip
        ny_ref[:] = nny * flip
        nz_ref[:] = nnz * flip
        mat_ref[:] = jnp.where(missed, -1,
                               best_s[MAT_].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def mesh_intersect_brute(scene, origin: Vec3, direction: Vec3,
                         interpret: bool = False):
    """MXU brute-force mesh intersection over the whole ray pool.

    Tests EVERY triangle of EVERY mesh (the tables concatenate all meshes)
    against every ray via tiled matmuls — no traversal, no serial pointer
    chases. MEASURED (teapot 6656 padded tris, 640k incoherent rays, TPU
    v5e): 126 ms vs the packet walk's 141 ms — only ~1.1x, because the
    contraction depth is the 16-dim feature axis, capping the MXU at ~12.5%
    utilization; the pass runs within ~2x of the brute-force FLOP floor and
    scales linearly with triangle count (loses to the packet walk on the 46k
    alien). Kept as an optional intersector and as the measured endpoint of
    the brute-force design axis. Same contract as mesh_intersect_packet;
    true closest hit.
    """
    from ..scene.types import MXU_NFEAT, MXU_TRI_TILE

    n = origin.x.shape[0]
    block = BRUTE_RAY_ROWS * 128
    n_pad = ((n + block - 1) // block) * block

    def prep(a, fill):
        return jnp.pad(a, (0, n_pad - n),
                       constant_values=fill).reshape(-1, 128)

    ox, oy, oz = (prep(c, 0.0) for c in origin)
    dx, dy, dz = (prep(c, 1.0) for c in direction)

    rows = n_pad // 128
    grid_rays = rows // BRUTE_RAY_ROWS
    n_tri_tiles = scene.tris_mxu_n.shape[0] // MXU_TRI_TILE

    ray_spec = pl.BlockSpec((BRUTE_RAY_ROWS, 128), lambda i, k: (i, 0),
                            memory_space=pltpu.VMEM)
    coeff_spec = pl.BlockSpec((4 * MXU_TRI_TILE, MXU_NFEAT),
                              lambda i, k: (k, 0), memory_space=pltpu.VMEM)
    attr_spec = pl.BlockSpec((MXU_TRI_TILE, MXU_NFEAT),
                             lambda i, k: (k, 0), memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 4 + [
        jax.ShapeDtypeStruct((rows, 128), jnp.int32)]
    t, nx, ny, nz, mat = pl.pallas_call(
        _brute_kernel,
        grid=(grid_rays, n_tri_tiles),
        in_specs=[coeff_spec, attr_spec,
                  ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec],
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((16, BRUTE_RAY_ROWS, 128), jnp.float32)],
        interpret=interpret,
    )(scene.tris_mxu_c, scene.tris_mxu_n, ox, oy, oz, dx, dy, dz)

    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), Vec3(flat(nx), flat(ny), flat(nz)), flat(mat)
