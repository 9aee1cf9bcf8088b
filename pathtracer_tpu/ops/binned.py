"""Binned-treelet mesh intersection — the production mesh intersector.

WHY: the packet walk (ops/bvh_pallas.py) charges every block the UNION of
its rays' traversals. Diffuse-bounce rays fan out over hemispheres, so even
coherence-sorted 1024-ray blocks union to ~1/4 of the tree while the MEAN
ray wants only 2-4 treelets — a ~50-100x work blowup no sort key fixes
(tools/union_model.py). Multi-operand `lax.sort` data movement is far
cheaper than that waste, so this module moves RAYS to their triangles:

  1. CULL kernel: per ray, the nearest not-yet-enumerated wanted treelet
     (leaf AABB hit closer than the ray's bound), in (entry-t, id) order — a
     flat super-gated sweep on the VPU (one slab test per 16-treelet group
     decides whether the group's statically-unrolled tests run at all). No
     tree walk, no per-lane stacks, no scalar state machine.
  2. BIN: one segmented lax.sort groups rays by wanted id. Segments are the
     COLUMNS of the native (rows, 128) layout — sorting along dimension 0
     keeps the TPU tiling untouched (contiguous-chunk segments forced a
     relayout of every operand that dominated the pass cost, measured
     in-engine). Lanes stripe over columns, so every column sees the same id
     distribution and rank-aligned rows (= what an (8,128) kernel block
     reads) still share ids.
  3. STREAM kernel: each block iterates the DISTINCT ids present in it (one
     masked min-reduction per step, possible because lanes arrive sorted)
     and tests each treelet's triangle rows against every lane's own ray —
     extra rows only ADD correct candidate hits, so per-lane results are
     exact regardless of block composition.
  4. Iterate cull->bin->stream PASSES times with the tightening bound (a hit
     in the nearest treelet culls everything behind it); lanes that still
     have unenumerated wants after a final cull finish in the exact packet
     walk (rare, and pre-clustered by the last bin).

All passes run in permuted space; ONE final segmented sort restores ray
order. Results are bit-exact equal to mesh_intersect_packet on active lanes
(tests/test_binned.py), and full engine renders are bit-identical.

Engine-measured (TPU v5e, ms/frame at the scenes' checked-in 800x800 d4):
  teapot  packet 358 | sorted-packet 189 | binned 86   (round 2: 103)
  alien   packet 1213 | sorted-packet 735 | binned 247 (round 2: 378;
          persistent engine 222 — respawned lanes keep pools dense)
Round-3 deltas, each TPU-measured within-run: STREAM_ROWS 8->16 (alien
sr8 183 -> sr16 117), scene-adaptive passes (4 big / 2 small), deferred
normal epilogue (100.0 vs 104.3), fat 288-tri treelets on big meshes
(89.0 vs 98.1), liveness folded into pid (one fewer sort operand).
Remaining-cost breakdown and the optimization fronts for the next round are
at the bottom of this docstring.
(The only trustworthy timing is engine-level frame time: the remote-TPU
transport result-caches identical dispatches AND resolves block_until_ready
before compute finishes, so single-call microbenchmarks lie in both
directions; bench harnesses chain calls through a data dependency.)

Reference parity: this replaces meshIntersectionTest's per-thread BVH stack
walk (reference src/intersections.cu:167-213) as the production mesh
intersector; the reference's per-thread MIMD walk has no union waste to
avoid, ours buys the same property with sorts the GPU would spend on
COALESCED material sorting (pathtrace.cu:825-841).

ROUND-4 ADDITIONS (each exact vs the packet walk, tests/test_binned.py):
  - SLOT pipeline (`slots=K` / SLOTS): ONE K-want cull sweep, then K
    sequential bound-tightened bin+stream rounds — the expansion
    pipeline's amortized cull without its no-tightening flaw (wants behind
    the tightened bound drop to NONE without streaming; future slots ride
    the bin sorts; the slot-(K-1) anchor resumes the residual enumeration).
  - MINORITY-WANT DEFERRAL (MIN_SUPPORT): stream visits wanted by < K
    lanes of the block are skipped; their supporters carry an
    `incomplete` flag through the sorts and the exact fallback recomputes
    them from scratch under the tightened bound. Attacks the distinct-id
    tail, where a visit costs the treelet's full row count against 2048
    lanes to serve a handful.
  - CHUNK GATE (CHUNK_GATE + scene.treelet_chunk): per-4-row union-AABB
    slab gates inside the visit loop. MEASURED OFF both ungated variants
    (see flag note) — kept as the recorded dead end.

ROUND-4 WARMED SPLIT (alien 640k bounce rays, production p4 config,
within-run, first-call inflation consumed by a warmup): sorts 11.1 |
+cull 26.1 | +stream 70.3 | +fallback 87.9 ms — i.e. sorts 11, cull 15,
stream 44, fallback 18. The slot pipeline (cull amortization) measured a
wash and minority-want deferral measured off monotonically (flag notes),
so the stream's distinct-id service and the packet-walk residual are the
two standing costs; tools/diag_bins.py measures the id/support structure
behind them.

OPEN FRONTS (alien d4 = 247 ms masked / 222 persistent vs the reference's
22; round-4 bounce-pool state: ~82 ms = sorts 11 + cull 15 + stream ~38 +
fallback ~18 at p3+compaction):
  1. Stream visits remain the cost center, and round 4 PROVED the
     structure (tools/diag_bins.py): 4607 visits vs ~350 contiguous-ideal;
     distinct ids/block grow 15 -> 68 across passes; 47-70% of visits
     serve <=16 lanes. This is genuine dispersion — cold treelets with a
     handful of wanting lanes each — NOT sort-alignment noise, so rank
     alignment cannot fix it (and per-column placement noise is inherent
     to column sorts: any key scheme has ±sqrt-rank cross-column drift).
     Serving cold wants cheaper than a full-treelet visit needs a
     fundamentally different service: per-lane gathers (measured ~16 ms /
     640k array), the packet walk (deferral measured off), chunk gates
     (measured off — DFS chunk boxes overlap too much). The un-built idea
     that survives: treelets SUBDIVIDED for cold service only (e.g. a
     16-row mini-treelet table addressed by the same ids) so a cold visit
     streams 1/3 the rows — unproven, and bounded by the support CDF to
     at most ~2x on the stream share.
  2. Fallback absorption: ~18 ms/bounce-pool; FB_COMPACT (round 4) made
     the walk touch only the residual prefix (-3 ms); FB_ROWS re-swept,
     32 stands. BUILT AND MEASURED dead-ends: 2-slot want capture,
     wide-kernel residual finish (123.2 vs 107.5), STREAM_UV gather
     contract, minority-want deferral, slot pipeline (flag notes).
  3. The 8-wide BVH with per-packet SMEM stacks (ops/wide.py: 128-ray
     packets, children on sublanes via (8,1)x(1,128) broadcasts) was BUILT
     AND MEASURED in round 3 and LOST DECISIVELY on alien bounce rays
     (within-run, 640k rays): wide sorted 516, unsorted 684-685 (any
     packet_rows), +pop-cull 888, mask-stack variant 556, max_leaf=8 tree
     639 ms — vs binned 107.5. The per-pop scalar overhead (SMEM stack ops,
     dynamic node extracts, Mosaic branch latency) dwarfs the union waste
     it saves: a 128-ray packet still unions to enough of the tree that
     pops are plentiful, and every pop is serial scalar work the VPU idles
     through. It also lost as the residual fallback (binned fb=wide 123.2
     vs fb=packet 107.5). The kernel and its tests stay as the measured
     dead-end record; the endgame remains stream-visit reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import (CHUNK_GATE_ROWS, MAX_TRE_ROWS, TREELET_NONE,
                           TREELETS_PER_FROW, TREELETS_PER_IROW, TRI_STRIDE,
                           TRIS_PER_ROW)
from ..utils.vec import Vec3

FLT_MAX = 3.402823466e38
NEG_MAX = -3.402823466e38
CULL_ROWS = 8      # rays per cull block = ROWS * 128 (16 hard-faults: keep 8)
STREAM_ROWS = 16   # rays per stream block: taller blocks amortize the
#                    distinct-id union (alien within-run: sr8 183 -> sr16
#                    117 -> sr32 124 ms at p=4), ids/block grow sublinearly
SORT_CHUNK = 65536  # segmented-sort chunk (bins cluster within a chunk)
PASSES = None       # cull->bin->stream rounds before the packet fallback.
#                     None = scene-adaptive at trace time (tri count is a
#                     static shape): 3 on big meshes, 2 on small ones.
#                     Round-3 TPU sweep on alien bounce rays (within-run):
#                     p2=199, p3=139, p4=136, p6=144, p8=151 — p4 won when
#                     the smeared fallback was expensive. With the round-4
#                     pre-fallback compaction (FB_COMPACT) the optimum
#                     moved: p3 82.0/82.7 vs p4 86.2/85.8 within-run —
#                     pass 3's dispersed stream visits (748 visits for
#                     17k live wants, tools/diag_bins.py) cost more than
#                     the compacted residual they save. Teapot's engine
#                     optimum was p2 (109.7 ms engine; p4+sr16 measured
#                     114.9), so small meshes keep 2.
PASSES_BIG_TRIS = 24000  # tri count above which the adaptive default is 3
EXPAND = None       # int K = multi-want expansion pipeline (one K-want cull
#                     sweep + one K-fold expanded bin/stream round) instead
#                     of `PASSES` sequential cull->bin->stream rounds.
#                     None = off (pass-sequential production path).
SLOTS = None        # int K = slot pipeline: ONE K-want cull sweep, then K
#                     SEQUENTIAL bin+stream rounds over the slots with full
#                     bound tightening between rounds (a want behind the
#                     tightened bound is dropped to NONE without streaming).
#                     Fixes the expansion pipeline's measured flaw — no
#                     tightening between the K wants — while still
#                     amortizing K cull sweeps into one (the slab tests
#                     dominate the sweep; the per-slot insertion is ~7 ops).
#                     vs passes=K: same streams minus the drops, 1 cull
#                     instead of K, +2*(K-1-s) sort operands at round s
#                     (future slots ride the permutation). None = off.
#                     TPU-MEASURED A WASH (alien bounce rays, within-run):
#                     prod p4 88.6, slots K=3 92.5, K=4 88.2 — later cull
#                     passes are already cheap (live-gated blocks; many
#                     lanes exhaust their wants by pass 3), so amortizing
#                     them saves less than the K-sweep + extra sort
#                     operands cost. Kept as an exact, tested option.
FB_COMPACT = None   # compact the fallback set: ONE more segmented sort
#                     keyed (remaining ? 0 : 1) clusters the residual lanes
#                     into a block-aligned prefix of every column before the
#                     packet walk. Without it the residual is SMEARED over
#                     nearly every packet block (the last bin sort ordered
#                     lanes by want id, not by remaining-ness), so each
#                     4096-lane fallback block pays a tree walk to serve a
#                     handful of lanes — the measured reason minority-want
#                     deferral lost (tools/diag_bins.py). Cost: one
#                     13-operand sort (~1.8 ms); the walk then touches only
#                     ceil(remaining / block) live blocks. None = adaptive:
#                     ON for big meshes (alien within-run 86.2/85.8 vs
#                     88.8/88.7 ms), OFF for small ones (teapot residual is
#                     tiny; pool A/B neutral 23.2 vs 23.1 — skip the sort).
FALLBACK = True     # diagnostic ablation flags (trace-time)
FALLBACK_IMPL = "packet"  # "wide" = 8-wide per-packet-stack kernel
#                         (ops/wide.py) — the residual lanes are already
#                         CLUSTERED by the last bin sort, which is exactly
#                         the coherence per-packet stacks exploit, and its
#                         128-ray packets avoid the 4096-ray block unions
#                         that made the packet walk cost ~59 ms/bounce on
#                         alien. Trade-off: the wide kernel's broadcast-MT
#                         t differs by ~1 ulp from the packet walk's, so
#                         "wide" gives up bit-exactness vs bvh_impl="pallas"
#                         on fallback lanes (still the true closest hit —
#                         tests/test_binned.py covers both contracts).
#                         "packet" = the bit-exact round-2 packet-walk
#                         finish. Default pending the TPU bench verdict.
CAND_SORT = True
CAND_KEY = "pid"    # initial-bin sort key. "pid" = liveness partition only
#                     (candidates keep engine lane order). "octcell" =
#                     direction octant (3 bits) + 12-bit origin morton cell:
#                     spatially-coherent candidates cluster, so pass-1 blocks
#                     agree on wants AND (lax.sort being stable) same-id
#                     lanes stay coherence-ordered through every later bin.
STREAM_OFF = False  # diagnostic: skip the stream kernel (WRONG results)
CULL_CHEAP = False  # diagnostic: cull returns constant ids (WRONG results)
FB_ROWS = 32        # packet-fallback block rows (teapot d4: 8->121.9,
#                     32->104.3 ms round-2; re-swept under the round-4
#                     compacted residual: alien within-run 32->81.9/82.5,
#                     16->86.0, 8->99.1 — 32 stands)
DEFER_NORMAL = True  # normalize+flip the winning normal once per lane in
#                      the kernel epilogue instead of per tri test
#                      (bit-exact: same final ops on the same raw values)
STREAM_UV = False    # stream kernel stores (u, v, tri index) instead of
#                      the interpolated normal: the 15-op normal interp
#                      leaves the per-tri hot loop entirely, every bin sort
#                      carries one fewer operand, and ONE XLA row-gather of
#                      scene.tri_attrs + an interp epilogue reconstructs
#                      the winning normal after the passes (same formula,
#                      same f32 inputs, ~1-ulp FMA-contraction envelope on
#                      normals). MEASURED OFF: the row-gather runs ~100x
#                      off the HBM floor on TPU (~5 ms per 640k-lane call),
#                      which erases the kernel win — teapot engine 85.3 ->
#                      107.2 ms/frame, alien 265.5 -> 259.1 (within-run
#                      intersect A/B: uv 84.8 vs inline 89.0). Net loss;
#                      kept as a measured ablation + the tri_attrs table
#                      for any future in-kernel gather formulation.
MIN_SUPPORT = 1     # minority-want deferral: a stream visit whose treelet
#                     is wanted by fewer than MIN_SUPPORT lanes of the
#                     block is SKIPPED and its supporters are marked
#                     `incomplete`; incomplete lanes go to the exact
#                     packet-walk fallback at the end REGARDLESS of their
#                     enumeration state (the walk recomputes the true
#                     closest hit under the tightened bound from scratch,
#                     so skipped wants cannot be lost). Rationale: a visit
#                     costs the treelet's FULL row count against all 2048
#                     lanes whether 3 lanes want it or 1500 do — the
#                     distinct-id tail of a block is almost all cost and
#                     almost no service. 1 = off (every want served).
#                     TPU-MEASURED OFF, monotonically (alien bounce rays,
#                     within-run, production p4 config): ms=1 88.7,
#                     ms=16 104.8, ms=64 120.4, ms=256 157.9 — the packet
#                     walk on the deferred lanes (scattered cold wants ->
#                     big block unions, even bound-tightened) costs far
#                     more than the visits it skips. Kept as the recorded
#                     dead end; the stream tail is cheap SERVICE relative
#                     to any per-lane recompute we have.
STREAM_ROW_CHUNK = 4  # gate stream-visit rows in chunks of this many rows
#                       (0 = ungated static unroll); mean treelet occupancy
#                       is ~10.6/16 rows, so tail gating saves ~24% of the
#                       visit MT work for ~3 scalar branches
CHUNK_GATE = False  # vector chunk gate: slab-test each 4-row chunk's union
#                     AABB (scene.treelet_chunk) against the SUPPORTING
#                     lanes' rays (tid == g) with their CURRENT best as the
#                     bound, and skip the chunk's 24 MT tests when no
#                     supporting lane can update (a hit inside the box has
#                     ray-t inside the slab interval, so t0 >= t_min for
#                     all wanters proves the chunk holds no closer hit for
#                     them). MEASURED OFF both ways (alien bounce rays,
#                     within-run): all-lanes gate 101.1 vs ungated 88.4 ms
#                     (one stray ray in 2048 forced nearly every chunk);
#                     support-masked gate 96.0 vs 89.2 (a treelet's DFS
#                     row-range chunk boxes overlap spatially, so even a
#                     handful of wanting rays hits most of its 12 chunks —
#                     skip rate too low for the ~40-op gate + scalar
#                     branch). Support-masking changes the candidate set
#                     (non-wanters lose BONUS candidates from other lanes'
#                     visits) but not results: a lane's true closest hit
#                     lies in a treelet it WANTS (leaf AABB entered closer
#                     than its bound), and wanted treelets are always fully
#                     streamed when enumerated — bonus hits only
#                     pre-tightened the bound (exactness vs the packet walk
#                     verified both gated and ungated, tests/test_binned).
#                     Kept as the measured dead-end record; active only
#                     when STREAM_ROW_CHUNK == CHUNK_GATE_ROWS.


def _extract(row, group, stride: int):
    return pltpu.roll(row, -stride * group, 1)


# ---------------------------------------------------------------------------
# Cull kernel: nearest-remaining wanted treelet per ray
# ---------------------------------------------------------------------------

def _cull_kernel(tre_f_ref, sup_f_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 bound_ref, pt0_ref, pid_ref, live_ref,
                 *out_refs, k_wants: int = 1):
    """Per lane: the `k_wants` minimum (entry_t, id) wanted treelets STRICTLY
    after (prev_t0, prev_id) in lexicographic order, among treelets whose
    AABB is hit closer than the lane's bound. Outputs are k_wants (id, t0)
    ref pairs, slot 0 = nearest; id = TREELET_NONE where fewer wants remain
    (slots fill front-to-back, so slot j NONE implies all later slots NONE).

    Pure vector sweep over all treelets — no per-treelet branching, so cost
    is exactly T x ~(50 + 7*k) VPU ops per block; blocks with no live lane
    skip the sweep entirely (live lanes are sorted together by the caller).
    ONE k-want sweep replaces k single-want sweeps (the slab tests — the
    bulk of the cost — are shared; only the ~7-op sorted-slot insertion
    repeats per slot), which is what makes the expansion pipeline's
    enumeration ~k times cheaper than the pass-sequential pipeline's.
    """
    n_rows = tre_f_ref.shape[0]
    id_refs = out_refs[0::2]
    t0_refs = out_refs[1::2]

    live_any = jnp.sum(live_ref[:]) > 0

    @pl.when(live_any)
    def _():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        inv_x = 1.0 / dx_ref[:]
        inv_y = 1.0 / dy_ref[:]
        inv_z = 1.0 / dz_ref[:]
        bound = bound_ref[:]
        prev_t0 = pt0_ref[:]
        prev_id = pid_ref[:]
        live = live_ref[:] > 0

        best_t0 = jnp.full(ox.shape, FLT_MAX)
        best_id = jnp.full(ox.shape, TREELET_NONE, jnp.int32)

        def slab(bxn, byn, bzn, bxf, byf, bzf):
            tnx = (bxn - ox) * inv_x
            tfx = (bxf - ox) * inv_x
            tny = (byn - oy) * inv_y
            tfy = (byf - oy) * inv_y
            tnz = (bzn - oz) * inv_z
            tfz = (bzf - oz) * inv_z
            t0 = jnp.maximum(jnp.maximum(jnp.minimum(tnx, tfx),
                                         jnp.minimum(tny, tfy)),
                             jnp.minimum(tnz, tfz))
            t1 = jnp.minimum(jnp.minimum(jnp.maximum(tnx, tfx),
                                         jnp.maximum(tny, tfy)),
                             jnp.maximum(tnz, tfz))
            return t0, t1

        def row_body(r, carry):
            # SUPER gate: one slab test against the row's union box decides
            # whether any of its 16 treelets can matter to this block —
            # O(T/16) for blocks away from the mesh, the difference between
            # O(cand x T) and O(cand x T/16 + wanted) on big meshes.
            srow = sup_f_ref[pl.ds(r, 1), :]
            s0, s1 = slab(srow[0, 0], srow[0, 1], srow[0, 2],
                          srow[0, 3], srow[0, 4], srow[0, 5])
            want_s = jnp.logical_and(
                live, jnp.logical_and(s0 <= s1,
                                      jnp.logical_and(s1 > 0.0, s0 < bound)))
            return jax.lax.cond(
                jnp.sum(want_s.astype(jnp.int32)) > 0,
                lambda c: row_inner(r, c), lambda c: c, carry)

        def row_inner(r, carry):
            frow = tre_f_ref[pl.ds(r, 1), :]
            # STATIC unroll over the row's 16 treelets: field reads become
            # static lane extracts (frow[0, k*8+f]) instead of a dynamic
            # pltpu.roll per treelet — the roll was pure overhead.
            for k in range(TREELETS_PER_FROW):
                b = 8 * k
                tid = r * TREELETS_PER_FROW + k
                tnx = (frow[0, b + 0] - ox) * inv_x
                tfx = (frow[0, b + 3] - ox) * inv_x
                tny = (frow[0, b + 1] - oy) * inv_y
                tfy = (frow[0, b + 4] - oy) * inv_y
                tnz = (frow[0, b + 2] - oz) * inv_z
                tfz = (frow[0, b + 5] - oz) * inv_z
                t0 = jnp.maximum(jnp.maximum(jnp.minimum(tnx, tfx),
                                             jnp.minimum(tny, tfy)),
                                 jnp.minimum(tnz, tfz))
                t1 = jnp.minimum(jnp.minimum(jnp.maximum(tnx, tfx),
                                             jnp.maximum(tny, tfy)),
                                 jnp.maximum(tnz, tfz))
                want = jnp.logical_and(
                    live,
                    jnp.logical_and(t0 <= t1,
                                    jnp.logical_and(t1 > 0.0, t0 < bound)))
                # strictly after the already-enumerated (prev_t0, prev_id)
                after = jnp.logical_or(
                    t0 > prev_t0,
                    jnp.logical_and(t0 == prev_t0, tid > prev_id))
                cand_ok = jnp.logical_and(want, after)
                if k_wants == 1:
                    best_t0, best_id = carry
                    # lexicographic min among remaining wants
                    closer = jnp.logical_or(
                        t0 < best_t0,
                        jnp.logical_and(t0 == best_t0, tid < best_id))
                    upd = jnp.logical_and(cand_ok, closer)
                    best_t0 = jnp.where(upd, t0, best_t0)
                    best_id = jnp.where(upd, tid, best_id)
                    carry = (best_t0, best_id)
                else:
                    # bubble-insert into the K sorted (t0, id) slots: the
                    # candidate sinks until it displaces a farther entry;
                    # the displaced entry continues sinking. Non-candidates
                    # become (FLT_MAX, NONE), which never win the lex test.
                    t0s = list(carry[:k_wants])
                    ids = list(carry[k_wants:])
                    c_t0 = jnp.where(cand_ok, t0, FLT_MAX)
                    c_id = jnp.where(cand_ok, tid, TREELET_NONE)
                    for s in range(k_wants):
                        closer = jnp.logical_or(
                            c_t0 < t0s[s],
                            jnp.logical_and(c_t0 == t0s[s], c_id < ids[s]))
                        n_t0 = jnp.where(closer, c_t0, t0s[s])
                        n_id = jnp.where(closer, c_id, ids[s])
                        c_t0 = jnp.where(closer, t0s[s], c_t0)
                        c_id = jnp.where(closer, ids[s], c_id)
                        t0s[s], ids[s] = n_t0, n_id
                    carry = tuple(t0s) + tuple(ids)
            return carry

        if k_wants == 1:
            init = (best_t0, best_id)
        else:
            init = tuple(jnp.full(ox.shape, FLT_MAX)
                         for _ in range(k_wants)) + tuple(
                jnp.full(ox.shape, TREELET_NONE, jnp.int32)
                for _ in range(k_wants))
        out = jax.lax.fori_loop(0, n_rows, row_body, init)
        if k_wants == 1:
            id_refs[0][:] = out[1]
            t0_refs[0][:] = out[0]
        else:
            for s in range(k_wants):
                id_refs[s][:] = out[k_wants + s]
                t0_refs[s][:] = out[s]

    @pl.when(jnp.logical_not(live_any))
    def _():
        for s in range(len(id_refs)):
            id_refs[s][:] = jnp.full(id_refs[s].shape, TREELET_NONE,
                                     jnp.int32)
            t0_refs[s][:] = jnp.full(t0_refs[s].shape, FLT_MAX)


# ---------------------------------------------------------------------------
# Stream kernel: triangle rows of each block's binned treelets
# ---------------------------------------------------------------------------

def _stream_kernel(tre_i_ref, chunk_f_ref, trisf_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   bound_ref, id_ref,
                   t_ref, nx_ref, ny_ref, nz_ref, mat_ref, *out_extra,
                   max_rows: int = None, uv_out: bool = False):
    """Stream tri rows of every DISTINCT treelet id present in the block;
    each lane keeps its own closest hit (initialized at its bound).

    `max_rows` is the scene's rows-per-treelet bound (static unroll length;
    SceneArrays.treelet_rows.shape[0] — big meshes use fat 48-row treelets,
    small ones 16)."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tid = id_ref[:]
    bound = bound_ref[:]
    shape = ox.shape
    inv_x = 1.0 / dx       # chunk-gate slab reciprocals (loop-invariant)
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    t_min0 = bound
    zero = jnp.zeros(shape, jnp.float32)
    mat0 = jnp.full(shape, -1, jnp.int32)

    def tri_test(trow, j, in_row, row_idx, carry):
        t_min, nx, ny, nz, mat = carry
        b = TRI_STRIDE * j
        tv = trow
        v0x, v0y, v0z = tv[0, b + 0], tv[0, b + 1], tv[0, b + 2]
        e1x, e1y, e1z = tv[0, b + 3], tv[0, b + 4], tv[0, b + 5]
        e2x, e2y, e2z = tv[0, b + 6], tv[0, b + 7], tv[0, b + 8]
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        parallel = jnp.abs(a) < 1e-6
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
                                t >= 1e-6)))
        upd = jnp.logical_and(
            in_row, jnp.logical_and(valid,
                                    jnp.logical_and(t > 0.0, t < t_min)))
        t_min = jnp.where(upd, t, t_min)
        if uv_out:
            # store (u, v, tri index): the normal interp leaves the hot
            # loop entirely; the host gathers tri_attrs by index once
            # after the passes (the winning u/v/attrs are the same f32
            # values the in-loop interp consumed)
            tri = row_idx * TRIS_PER_ROW + j
            nx = jnp.where(upd, u, nx)
            ny = jnp.where(upd, v, ny)
            mat = jnp.where(upd, tri, mat)
            return t_min, nx, ny, nz, mat
        # Normalization and the facing flip are DEFERRED to after the visit
        # loop: only the winning triangle's normal survives, so the raw
        # interpolated normal is stored here and rsqrt+flip run once per
        # lane instead of once per tri test (bit-exact: the final ops are
        # the same expressions on the same raw values).
        w = 1.0 - u - v
        nnx = w * tv[0, b + 9] + u * tv[0, b + 12] + v * tv[0, b + 15]
        nny = w * tv[0, b + 10] + u * tv[0, b + 13] + v * tv[0, b + 16]
        nnz = w * tv[0, b + 11] + u * tv[0, b + 14] + v * tv[0, b + 17]
        if not DEFER_NORMAL:
            inv_len = jax.lax.rsqrt(
                jnp.maximum(nnx * nnx + nny * nny + nnz * nnz, 1e-30))
            fl = jnp.where(dx * nnx + dy * nny + dz * nnz > 0.0,
                           -inv_len, inv_len)
            nnx, nny, nnz = nnx * fl, nny * fl, nnz * fl
        nx = jnp.where(upd, nnx, nx)
        ny = jnp.where(upd, nny, ny)
        nz = jnp.where(upd, nnz, nz)
        mat = jnp.where(upd, tv[0, b + 18].astype(jnp.int32), mat)
        return t_min, nx, ny, nz, mat

    # Iterate the DISTINCT treelet ids present in the block (lanes arrive
    # sorted by id, so "next distinct id" is one masked min-reduction). A
    # range scan [lo..hi] was measured to blow up on later passes: sparse
    # live lanes span wide id ranges and every gap treelet cost a conditional
    # — per-pass marginal cost grew from 2.5 to 20+ ms. This loop's trip
    # count is exactly the number of distinct ids binned into the block.
    valid_id = tid < TREELET_NONE
    first_id = jnp.min(jnp.where(valid_id, tid, TREELET_NONE))

    def cond(carry):
        g = carry[0]
        return g < TREELET_NONE

    if max_rows is None:
        max_rows = MAX_TRE_ROWS
    last_row = trisf_ref.shape[0] - 1

    def body(carry):
        if MIN_SUPPORT > 1:
            g, cc, inc = carry
        else:
            g, cc = carry
            inc = None
        irow = tre_i_ref[pl.ds(g // TREELETS_PER_IROW, 1), :]
        iv = _extract(irow, g % TREELETS_PER_IROW, 4)
        row0, n_rows = iv[0, 0], iv[0, 1]
        # STATIC row unroll (rows-per-treelet is bounded at pack time):
        # a traced fori here cost more than the row tests it wrapped.
        # Short treelets mask their tail rows; the clamped load keeps the
        # index in-table (junk content is masked out by in_row).
        # STREAM_ROW_CHUNK > 0 adds scf.if gates every CHUNK rows: the mean
        # treelet occupies ~10.6 of the 16 unrolled rows (alien), so
        # skipping whole masked tail chunks trades a scalar branch for up
        # to CHUNK*TRIS_PER_ROW saved MT tests.
        chunkn = STREAM_ROW_CHUNK
        gate = CHUNK_GATE and chunkn == CHUNK_GATE_ROWS
        if gate:
            # one 128-lane row holds ALL of treelet g's chunk boxes at
            # static lane offsets (scene/types.py pack layout)
            crow = chunk_f_ref[pl.ds(g, 1), :]

        def row_range(r0, r1, cc):
            for r in range(r0, r1):
                trow = trisf_ref[pl.ds(jnp.minimum(row0 + r, last_row),
                                       1), :]
                in_row = r < n_rows
                for j in range(TRIS_PER_ROW):
                    cc = tri_test(trow, j, in_row, row0 + r, cc)
            return cc

        sup = tid == g           # supporting lanes (want this treelet)

        def chunk_possible(c0, cc):
            """True iff some SUPPORTING lane's ray enters chunk c0's union
            box closer than its CURRENT best (cc[0]) — a miss proves the
            chunk holds no closer hit for any lane that wants g (see
            CHUNK_GATE flag note for why non-wanters may be skipped)."""
            b = (c0 // CHUNK_GATE_ROWS) * 8
            tnx = (crow[0, b + 0] - ox) * inv_x
            tfx = (crow[0, b + 3] - ox) * inv_x
            tny = (crow[0, b + 1] - oy) * inv_y
            tfy = (crow[0, b + 4] - oy) * inv_y
            tnz = (crow[0, b + 2] - oz) * inv_z
            tfz = (crow[0, b + 5] - oz) * inv_z
            t0 = jnp.maximum(jnp.maximum(jnp.minimum(tnx, tfx),
                                         jnp.minimum(tny, tfy)),
                             jnp.minimum(tnz, tfz))
            t1 = jnp.minimum(jnp.minimum(jnp.maximum(tnx, tfx),
                                         jnp.maximum(tny, tfy)),
                             jnp.maximum(tnz, tfz))
            can = jnp.logical_and(
                sup, jnp.logical_and(
                    t0 <= t1, jnp.logical_and(t1 > 0.0, t0 < cc[0])))
            return jnp.sum(can.astype(jnp.int32)) > 0

        def run_visit(cc):
            if not chunkn:
                cc = row_range(0, max_rows, cc)
            elif gate:
                for c0 in range(0, max_rows, chunkn):
                    live_c = chunk_possible(c0, cc)
                    if c0:
                        live_c = jnp.logical_and(c0 < n_rows, live_c)
                    cc = jax.lax.cond(
                        live_c,
                        lambda cc, c0=c0: row_range(
                            c0, min(c0 + chunkn, max_rows), cc),
                        lambda cc: cc, cc)
            else:
                cc = row_range(0, chunkn, cc)  # every treelet has >= 1 row
                for c0 in range(chunkn, max_rows, chunkn):
                    cc = jax.lax.cond(
                        c0 < n_rows,
                        lambda cc, c0=c0: row_range(
                            c0, min(c0 + chunkn, max_rows), cc),
                        lambda cc: cc, cc)
            return cc

        if MIN_SUPPORT > 1:
            # minority-want deferral: a visit with too few wanting lanes
            # is all cost and no service — skip it and mark the wanters
            # incomplete (the exact fallback recomputes them from scratch,
            # so no hit can be lost; see MIN_SUPPORT flag note)
            cnt = jnp.sum(sup.astype(jnp.int32))
            cc, inc = jax.lax.cond(
                cnt >= MIN_SUPPORT,
                lambda cc, inc: (run_visit(cc), inc),
                lambda cc, inc: (cc, jnp.where(sup, 1, inc)),
                cc, inc)
        else:
            cc = run_visit(cc)
        g_next = jnp.min(jnp.where(tid > g, tid, TREELET_NONE))
        if MIN_SUPPORT > 1:
            return g_next, cc, inc
        return g_next, cc

    init = (t_min0, zero, zero, zero, mat0)
    if MIN_SUPPORT > 1:
        inc0 = jnp.zeros(shape, jnp.int32)
        _, (t_min, nx, ny, nz, mat), inc_out = jax.lax.while_loop(
            cond, body, (first_id, init, inc0))
        out_extra[0][:] = inc_out    # 6th output exists iff deferring
    else:
        _, (t_min, nx, ny, nz, mat) = jax.lax.while_loop(
            cond, body, (first_id, init))

    missed = t_min >= bound
    if uv_out:
        t_ref[:] = jnp.where(missed, -1.0, t_min)
        nx_ref[:] = nx                       # u
        ny_ref[:] = ny                       # v
        nz_ref[:] = nz                       # unused
        mat_ref[:] = jnp.where(missed, -1, mat)   # tri index
        return
    if DEFER_NORMAL:
        # deferred per-lane normalization + flip of the winning normal
        inv_len = jax.lax.rsqrt(
            jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
        fl = jnp.where(dx * nx + dy * ny + dz * nz > 0.0,
                       -inv_len, inv_len)
        nx, ny, nz = nx * fl, ny * fl, nz * fl
    t_ref[:] = jnp.where(missed, -1.0, t_min)
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    mat_ref[:] = jnp.where(missed, -1, mat)


# ---------------------------------------------------------------------------
# Host-side pipeline
# ---------------------------------------------------------------------------

BIN_CONTIGUOUS = False  # bin sorts over contiguous 65536-chunks instead of
#                         columns: tighter id runs per block (helps scenes
#                         with many treelets) at the price of a relayout of
#                         every operand per sort. Trace-time; sweepable.


def _seg_sort(chunk: int, key, *arrays):
    """Segmented multi-operand sort ALONG COLUMNS of the native (rows, 128)
    layout: segment = one of 128 columns (every-128th lane).

    Why columns, not contiguous runs: a contiguous-chunk sort needs the
    arrays reshaped to (n/chunk, chunk) — a real TPU relayout of every
    operand in and out, which dominated the pipeline (measured in-engine:
    ~6 ms per pass at 16 operands; the sort network itself is cheap).
    Sorting along dimension 0 of the (rows, 128) view keeps the native
    tiling untouched. Lanes are striped over columns (pixel % 128), so every
    column sees the same id distribution, and rank-aligned rows — which is
    what an (8,128) kernel block reads — hold nearly the same ids: block
    coherence survives without any contiguity.
    """
    with jax.named_scope("pt_mi_sort"):
        if BIN_CONTIGUOUS:
            c = min(65536, key.shape[0])
            out = jax.lax.sort([key.reshape(-1, c)]
                               + [a.reshape(-1, c) for a in arrays],
                               num_keys=1)
            return tuple(a.reshape(-1) for a in out)
        out = jax.lax.sort([key.reshape(-1, 128)]
                           + [a.reshape(-1, 128) for a in arrays],
                           dimension=0, num_keys=1)
        return tuple(a.reshape(-1) for a in out)


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=("interpret", "passes", "fallback_impl",
                                    "expand", "slots", "debug_tids"))
def mesh_intersect_binned(scene, mesh_roots, origin: Vec3, direction: Vec3,
                          active=None, t_bound=None,
                          interpret: bool = False, passes: int | None = None,
                          fallback_impl: str | None = None,
                          expand: int | None = None,
                          slots: int | None = None,
                          debug_tids: bool = False):
    """Binned-treelet mesh intersection over the whole ray pool.

    Covers ALL meshes in one pass (treelets span every mesh's leaves);
    `mesh_roots` (tuple of scalar node indices) is only used by the exact
    packet-walk fallback for the rare lanes whose want enumeration exceeds
    `passes`. Same contract as mesh_intersect_packet: (t [N], normal Vec3,
    mat [N]), t = -1 where nothing is closer than `t_bound`; true closest
    hit.

    `expand` = K > 0 runs the MULTI-WANT EXPANSION pipeline instead of the
    pass-sequential loop: ONE K-want cull sweep enumerates each lane's K
    nearest treelets, the pool is expanded K-fold into (ray, want) pairs,
    ONE bin sort clusters the pairs by treelet id (id runs are ~K times
    longer, so stream blocks see far fewer distinct ids), one stream pass
    tests them, and the K slots merge per ray in enumeration order (strict
    <, so ties resolve exactly as the sequential passes did). Lanes whose
    enumeration exceeds K finish in the exact fallback, same as `passes`.

    `slots` = K > 0 runs the SLOT pipeline (see SLOTS flag): one K-want
    cull sweep, then K sequential bound-tightened bin+stream rounds —
    the expansion pipeline's amortized cull without its tightening flaw.

    `debug_tids=True` (pass-sequential path only) additionally returns the
    post-bin-sort want-id array of every pass — the diagnostic feed for
    tools/diag_bins.py (distinct-ids-per-stream-block / support stats).
    """
    if expand is None:
        expand = EXPAND      # module flag, read at trace time for sweeps
    if expand is not None and expand < 1:
        expand = None
    if slots is None:
        slots = SLOTS
    if slots is not None and slots < 1:
        slots = None
    if expand is not None:
        slots = None         # mutually exclusive; expand wins if both set
    if passes is None:
        passes = PASSES      # read at trace time so sweeps can retune
    if passes is None:       # scene-adaptive: extra live-shrinking passes
        # only pay for themselves when the fallback residual is expensive
        # (big meshes); tri count is a static shape, so this is trace-time
        n_tris = scene.tris_packed.shape[0] * TRIS_PER_ROW
        passes = 3 if n_tris > PASSES_BIG_TRIS else 2
    if fallback_impl is None:
        fallback_impl = FALLBACK_IMPL
    n = origin.x.shape[0]
    chunk = 128              # _seg_sort segments = columns of (rows, 128)
    # pad so the row count divides BOTH block heights — a grid of
    # rows // BLOCK_ROWS would otherwise silently skip the tail rows
    block_rows = max(STREAM_ROWS, CULL_ROWS)
    n_pad = _pad_to(n, 65536 if BIN_CONTIGUOUS else 128 * block_rows)

    def prep(a, fill):
        return jnp.pad(a, (0, n_pad - n), constant_values=fill)

    act = (jnp.ones((n,), jnp.bool_) if active is None else active)
    tb = (jnp.full((n,), FLT_MAX) if t_bound is None else t_bound)

    # root candidacy (union over meshes): non-candidates can have no wants
    # (every treelet box is inside its mesh root box), so they are dead to
    # the whole pipeline; the initial bin clusters them and their blocks
    # skip the cull sweep entirely.
    cand = jnp.zeros((n,), bool)
    for root in mesh_roots:
        bmin = Vec3(scene.bvh.min_x[root], scene.bvh.min_y[root],
                    scene.bvh.min_z[root])
        bmax = Vec3(scene.bvh.max_x[root], scene.bvh.max_y[root],
                    scene.bvh.max_z[root])
        inv_dir = 1.0 / direction
        t_near = (bmin - origin) * inv_dir
        t_far = (bmax - origin) * inv_dir
        t0 = Vec3.minimum(t_near, t_far).max_component()
        t1 = Vec3.maximum(t_near, t_far).min_component()
        cand = jnp.logical_or(cand, jnp.logical_and(
            t0 <= t1, jnp.logical_and(t1 > 0.0, t0 < tb)))
    act = jnp.logical_and(act, cand)

    ox, oy, oz = (prep(c, 0.0) for c in origin)
    dx, dy, dz = (prep(c, 1.0) for c in direction)
    bound = prep(tb, 0.0)
    # unsort key = position within a _seg_sort segment (column row index,
    # or offset within the contiguous chunk when BIN_CONTIGUOUS)
    if BIN_CONTIGUOUS:
        lane = jnp.arange(n_pad, dtype=jnp.int32) % min(65536, n_pad)
    else:
        lane = jnp.arange(n_pad, dtype=jnp.int32) // 128

    # enumeration state. pid doubles as the liveness carrier (one fewer
    # sort operand): TREELET_NONE marks a lane dead — initially for
    # non-candidates, later for lanes whose cull found no further want
    # (sticky: the cull kernel keeps dead lanes at NONE).
    pt0 = jnp.full((n_pad,), NEG_MAX)
    pid = jnp.where(prep(act, False), jnp.int32(-1), TREELET_NONE)

    rows = n_pad // 128
    grid_c = rows // CULL_ROWS
    ray_spec_c = pl.BlockSpec((CULL_ROWS, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    ray_spec_s = pl.BlockSpec((STREAM_ROWS, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def cull_k(k, ox, oy, oz, dx, dy, dz, bound, pt0, pid, live):
        with jax.named_scope("pt_mi_cull"):
            return _cull_k_impl(k, ox, oy, oz, dx, dy, dz, bound, pt0, pid,
                                live)

    def _cull_k_impl(k, ox, oy, oz, dx, dy, dz, bound, pt0, pid, live):
        r2 = lambda a: a.reshape(-1, 128)
        out = pl.pallas_call(
            functools.partial(_cull_kernel, k_wants=k),
            grid=(grid_c,),
            in_specs=[table_spec, table_spec] + [ray_spec_c] * 10,
            out_specs=[ray_spec_c] * (2 * k),
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                       jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * k,
            interpret=interpret,
        )(scene.treelet_f, scene.treelet_super,
          r2(ox), r2(oy), r2(oz), r2(dx), r2(dy), r2(dz),
          r2(bound), r2(pt0), r2(pid), r2(live))
        ids = [out[2 * s].reshape(-1) for s in range(k)]
        t0s = [out[2 * s + 1].reshape(-1) for s in range(k)]
        return ids, t0s

    def cull(ox, oy, oz, dx, dy, dz, bound, pt0, pid, live):
        ids, t0s = cull_k(1, ox, oy, oz, dx, dy, dz, bound, pt0, pid, live)
        return ids[0], t0s[0]

    tre_rows = scene.treelet_rows.shape[0]   # static unroll bound

    def stream(ox, oy, oz, dx, dy, dz, bound, tid):
        with jax.named_scope("pt_mi_stream"):
            return _stream_impl(ox, oy, oz, dx, dy, dz, bound, tid)

    def _stream_impl(ox, oy, oz, dx, dy, dz, bound, tid):
        s_rows = ox.shape[0] // 128          # pool may be K-fold expanded
        r2 = lambda a: a.reshape(-1, 128)
        n_out = 6 if MIN_SUPPORT > 1 else 5   # inc plane only when deferring
        out = pl.pallas_call(
            functools.partial(_stream_kernel, max_rows=tre_rows,
                              uv_out=STREAM_UV),
            grid=(s_rows // STREAM_ROWS,),
            in_specs=[table_spec, table_spec, table_spec] + [ray_spec_s] * 8,
            out_specs=[ray_spec_s] * n_out,
            out_shape=[jax.ShapeDtypeStruct((s_rows, 128), jnp.float32)] * 4
            + [jax.ShapeDtypeStruct((s_rows, 128), jnp.int32)]
            * (n_out - 4),
            interpret=interpret,
        )(scene.treelet_i, scene.treelet_chunk, scene.tris_packed,
          r2(ox), r2(oy), r2(oz),
          r2(dx), r2(dy), r2(dz), r2(bound), r2(tid))
        out = tuple(a.reshape(-1) for a in out)
        if n_out == 5:
            out = out + (jnp.zeros_like(out[4]),)
        return out

    # initial bin: cluster candidates so the first cull skips dead blocks
    # (key = pid: candidates carry -1, dead lanes TREELET_NONE). best-so-far
    # is initialized AFTER this sort — it is all-constant here, so it does
    # not need to ride the permutation.
    if CAND_SORT:
        if CAND_KEY == "octcell":
            # spatial-coherence key: direction octant (3 bits) over a
            # 12-bit origin morton cell in the mesh-roots union box.
            # Stability of lax.sort keeps same-id lanes coherence-ordered
            # through every later bin sort, so rank-aligned stream rows
            # keep agreeing on wants beyond pass 1. Per-lane results are
            # order-independent (stream only ADDs exact candidate hits),
            # so this is a pure locality knob — bit-exact either way.
            mnx = mny = mnz = jnp.float32(jnp.inf)
            mxx = mxy = mxz = jnp.float32(-jnp.inf)
            for root in mesh_roots:
                mnx = jnp.minimum(mnx, scene.bvh.min_x[root])
                mny = jnp.minimum(mny, scene.bvh.min_y[root])
                mnz = jnp.minimum(mnz, scene.bvh.min_z[root])
                mxx = jnp.maximum(mxx, scene.bvh.max_x[root])
                mxy = jnp.maximum(mxy, scene.bvh.max_y[root])
                mxz = jnp.maximum(mxz, scene.bvh.max_z[root])

            def q4(c, lo, hi):
                u = jnp.clip((c - lo) / jnp.maximum(hi - lo, 1e-20),
                             0.0, 0.999)
                return (u * 16.0).astype(jnp.int32)

            def spread3(v):          # bit i of a 4-bit value -> bit 3i
                out = jnp.zeros_like(v)
                for i in range(4):
                    out = out | (((v >> i) & 1) << (3 * i))
                return out

            morton = (spread3(q4(ox, mnx, mxx))
                      | (spread3(q4(oy, mny, mxy)) << 1)
                      | (spread3(q4(oz, mnz, mxz)) << 2))
            octant = ((dx > 0.0).astype(jnp.int32) * 4
                      + (dy > 0.0).astype(jnp.int32) * 2
                      + (dz > 0.0).astype(jnp.int32))
            key = jnp.where(pid < TREELET_NONE,
                            (octant << 12) | morton, TREELET_NONE)
            (key, pid, ox, oy, oz, dx, dy, dz, bound, pt0,
             lane) = _seg_sort(chunk, key, pid, ox, oy, oz, dx, dy, dz,
                               bound, pt0, lane)
        else:
            (pid, ox, oy, oz, dx, dy, dz, bound, pt0, lane) = _seg_sort(
                chunk, pid, ox, oy, oz, dx, dy, dz, bound, pt0, lane)

    # best-so-far (follows the rays through every later permutation). With
    # STREAM_UV it is (t, u, v, tri) — one fewer sort operand than the
    # inline (t, nx, ny, nz, mat) contract; the winning normal + material
    # are rebuilt once by the gather epilogue after the passes.
    zero_f = jnp.zeros((n_pad,))
    none_i = jnp.full((n_pad,), -1, jnp.int32)
    if STREAM_UV:
        best = [jnp.full((n_pad,), -1.0), zero_f, zero_f, none_i]
    else:
        best = [jnp.full((n_pad,), -1.0), zero_f, zero_f, zero_f, none_i]

    # minority-want deferral (MIN_SUPPORT flag): lanes whose visit was
    # skipped carry incomplete=1 and are recomputed from scratch by the
    # exact fallback; rides every bin sort. Only meaningful with the
    # fallback on (without it, skipped wants would simply be lost).
    defer = MIN_SUPPORT > 1 and FALLBACK
    inc = jnp.zeros((n_pad,), jnp.int32)

    state = (ox, oy, oz, dx, dy, dz, bound, pt0, pid, lane, best, inc)

    if expand:
        # ---- multi-want expansion: one K-want cull, one K-fold round ----
        assert not STREAM_UV, "expansion uses the inline stream contract"
        assert not BIN_CONTIGUOUS, "expansion pos key assumes column segs"
        K = expand
        live = (pid < TREELET_NONE).astype(jnp.int32)
        ids, t0s = cull_k(K, ox, oy, oz, dx, dy, dz, bound, pt0, pid, live)
        # expand to (ray, want) pairs, slot-major; pos restores this layout
        rep = lambda a: jnp.concatenate([a] * K, 0)
        e_tid = jnp.concatenate(ids, 0)
        pos = jnp.arange(K * n_pad, dtype=jnp.int32) // 128
        # bin: ONE sort clusters all pairs by wanted id (NONE pairs — dead
        # lanes and sub-K want lists — cluster at segment ends; their
        # blocks exit the stream loop at the first min-reduction)
        (e_tid, e_ox, e_oy, e_oz, e_dx, e_dy, e_dz, e_bound,
         pos) = _seg_sort(
            chunk, e_tid, rep(ox), rep(oy), rep(oz),
            rep(dx), rep(dy), rep(dz), rep(bound), pos)
        t, o1, o2, o3, o4, o5 = stream(e_ox, e_oy, e_oz, e_dx, e_dy, e_dz,
                                       e_bound, e_tid)
        # unsort pairs back to slot-major layout
        pos, t, o1, o2, o3, o4, o5 = _seg_sort(chunk, pos, t, o1, o2, o3,
                                               o4, o5)
        # merge the K slots in enumeration order: strict < keeps the
        # earlier slot on exact ties — the same winner the sequential
        # passes produce (pass k streams want k with the tightened bound)
        for s in range(K):
            sl_s = slice(s * n_pad, (s + 1) * n_pad)
            t_s = t[sl_s]
            better = jnp.logical_and(
                t_s > 0.0,
                jnp.logical_or(best[0] <= 0.0, t_s < best[0]))
            new_s = [t_s, o1[sl_s], o2[sl_s], o3[sl_s], o4[sl_s]]
            best = [jnp.where(better, n_, b_)
                    for n_, b_ in zip(new_s, best)]
        bound = jnp.where(best[0] > 0.0, best[0], bound)
        if defer:
            for s_ in range(K):
                inc = jnp.maximum(inc, o5[s_ * n_pad:(s_ + 1) * n_pad])
        # residual enumeration state: lanes with fewer than K wants are
        # exhausted (slot K-1 is NONE, the sticky-dead marker); the rest
        # resume strictly after slot K-1 under the tightened bound
        pt0, pid = t0s[K - 1], ids[K - 1]
        state = (ox, oy, oz, dx, dy, dz, bound, pt0, pid, lane, best, inc)
        passes = 0           # skip the sequential loop below

    if slots:
        # ---- slot pipeline: one K-want cull, K tightened rounds ----
        assert not STREAM_UV, "slots uses the inline stream contract"
        K = slots
        live = (pid < TREELET_NONE).astype(jnp.int32)
        ids, t0s = cull_k(K, ox, oy, oz, dx, dy, dz, bound, pt0, pid, live)
        ids, t0s = list(ids), list(t0s)
        for s in range(K):
            # drop wants already behind the tightened bound: their treelet
            # cannot hold a closer hit (entry t >= bound), so skip the
            # stream visit entirely — this is exactly the work the
            # expansion pipeline wasted (NONE never wins the key sort and
            # clusters with dead lanes at segment ends)
            tid = jnp.where(t0s[s] < bound, ids[s], TREELET_NONE)
            # future slots (incl. the slot-(K-1) residual anchor) must ride
            # the permutation; at the last round only the anchor rides
            rem_i = ids[s + 1:] if s < K - 1 else [ids[K - 1]]
            rem_t = t0s[s + 1:] if s < K - 1 else [t0s[K - 1]]
            extra = [inc] if defer else []
            (tid, ox, oy, oz, dx, dy, dz, bound, lane,
             *rest) = _seg_sort(
                chunk, tid, ox, oy, oz, dx, dy, dz, bound, lane,
                *best, *extra, *rem_i, *rem_t)
            best = list(rest[:len(best)])
            if defer:
                inc = rest[len(best)]
                rem = rest[len(best) + 1:]
            else:
                rem = rest[len(best):]
            if s < K - 1:
                nrem = K - 1 - s
                ids[s + 1:] = rem[:nrem]
                t0s[s + 1:] = rem[nrem:]
            else:
                ids[K - 1], t0s[K - 1] = rem[0], rem[1]
            t, o1, o2, o3, o4, o5 = stream(ox, oy, oz, dx, dy, dz, bound,
                                           tid)
            hit = t > 0.0
            new = [t, o1, o2, o3, o4]
            best = [jnp.where(hit, n_, b_) for n_, b_ in zip(new, best)]
            bound = jnp.where(hit, t, bound)
            if defer:
                inc = jnp.maximum(inc, o5)
        # residual enumeration state: resume strictly after slot K-1 under
        # the tightened bound; slot K-1 NONE = exhausted (sticky-dead)
        pt0, pid = t0s[K - 1], ids[K - 1]
        state = (ox, oy, oz, dx, dy, dz, bound, pt0, pid, lane, best, inc)
        passes = 0           # skip the sequential loop below

    dbg_tids = []
    for _ in range(passes):
        (ox, oy, oz, dx, dy, dz, bound, pt0, pid, lane, best, inc) = state
        # finished lanes (no want at the previous cull) are dead from here on
        live = (pid < TREELET_NONE).astype(jnp.int32)
        if CULL_CHEAP:
            tid = jnp.where(live > 0, jnp.zeros_like(pid), TREELET_NONE)
            tt0 = jnp.zeros_like(pt0)
        else:
            tid, tt0 = cull(ox, oy, oz, dx, dy, dz, bound, pt0, pid, live)
        # bin: sort by wanted id (NONE lanes cluster at segment ends)
        extra = [inc] if defer else []
        (tid, ox, oy, oz, dx, dy, dz, bound, tt0, lane,
         *rest) = _seg_sort(
            chunk, tid, ox, oy, oz, dx, dy, dz, bound, tt0, lane,
            *best, *extra)
        if defer:
            best, inc = list(rest[:-1]), rest[-1]
        else:
            best = list(rest)
        if debug_tids:
            dbg_tids.append(tid)
        if STREAM_OFF:
            t = jnp.full_like(bound, -1.0)
            o1 = o2 = o3 = jnp.zeros_like(bound)
            o4 = jnp.full_like(tid, -1)
        else:
            t, o1, o2, o3, o4, o5 = stream(ox, oy, oz, dx, dy, dz, bound,
                                           tid)
            if defer:
                inc = jnp.maximum(inc, o5)
        hit = t > 0.0
        # stream outputs: inline (t, nx, ny, nz, mat); uv (t, u, v, -, tri)
        new = ([t, o1, o2, o4] if STREAM_UV else [t, o1, o2, o3, o4])
        best = [jnp.where(hit, n, b) for n, b in zip(new, best)]
        bound = jnp.where(hit, t, bound)
        pt0, pid = tt0, tid
        state = (ox, oy, oz, dx, dy, dz, bound, pt0, pid, lane, best, inc)

    # one more cull AFTER the last stream: lanes whose next want vanished
    # under the tightened bound are done, so the exact-remaining set is far
    # smaller than "had a want at the last cull" (measured: the conservative
    # set sent ~half the candidates to the fallback). The rare survivors are
    # finished exactly by the packet walk; they are clustered by the last bin
    # sort, so small blocks stay coherent and dead blocks exit at the root.
    (ox, oy, oz, dx, dy, dz, bound, pt0, pid, lane, best, inc) = state
    if STREAM_UV:
        # gather epilogue: ONE row-gather of tri_attrs by the winning tri
        # index rebuilds the normal (same interp formula on the same f32
        # corner values the in-kernel path used) + material id. Runs in
        # permuted space, before the fallback merge and final unsort.
        bt, bu, bv, btri = best
        at = jnp.take(scene.tri_attrs, jnp.maximum(btri, 0), axis=0)
        w = 1.0 - bu - bv
        bnx = w * at[:, 0] + bu * at[:, 3] + bv * at[:, 6]
        bny = w * at[:, 1] + bu * at[:, 4] + bv * at[:, 7]
        bnz = w * at[:, 2] + bu * at[:, 5] + bv * at[:, 8]
        inv_len = jax.lax.rsqrt(
            jnp.maximum(bnx * bnx + bny * bny + bnz * bnz, 1e-30))
        fl = jnp.where(dx * bnx + dy * bny + dz * bnz > 0.0,
                       -inv_len, inv_len)
        hit_uv = btri >= 0
        bnx = jnp.where(hit_uv, bnx * fl, 0.0)
        bny = jnp.where(hit_uv, bny * fl, 0.0)
        bnz = jnp.where(hit_uv, bnz * fl, 0.0)
        bmat = jnp.where(hit_uv, at[:, 9].astype(jnp.int32), -1)
    else:
        bt, bnx, bny, bnz, bmat = best
    if FALLBACK:
        live = (pid < TREELET_NONE).astype(jnp.int32)
        tid_f, _ = cull(ox, oy, oz, dx, dy, dz, bound, pt0, pid, live)
        remaining = jnp.logical_and(live > 0, tid_f < TREELET_NONE)
        if defer:
            # deferred lanes are recomputed from scratch under the
            # tightened bound — their skipped wants cannot be lost
            remaining = jnp.logical_or(remaining, inc > 0)
        fb_compact = FB_COMPACT
        if fb_compact is None:   # adaptive, like the pass count
            n_tris = scene.tris_packed.shape[0] * TRIS_PER_ROW
            fb_compact = n_tris > PASSES_BIG_TRIS
        if fb_compact:
            key = jnp.where(remaining, 0, 1).astype(jnp.int32)
            (key, ox, oy, oz, dx, dy, dz, bound, lane,
             bt, bnx, bny, bnz, bmat) = _seg_sort(
                chunk, key, ox, oy, oz, dx, dy, dz, bound, lane,
                bt, bnx, bny, bnz, bmat)
            remaining = key == 0
        t, nrm, mat = _packet_fallback(scene, mesh_roots,
                                       Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                                       remaining, bound, interpret,
                                       fallback_impl)
        hit = t > 0.0
        bt = jnp.where(hit, t, bt)
        bnx = jnp.where(hit, nrm.x, bnx)
        bny = jnp.where(hit, nrm.y, bny)
        bnz = jnp.where(hit, nrm.z, bnz)
        bmat = jnp.where(hit, mat, bmat)

    # restore original order
    lane, bt, bnx, bny, bnz, bmat = _seg_sort(
        chunk, lane, bt, bnx, bny, bnz, bmat)
    sl = lambda a: a[:n]
    out = sl(bt), Vec3(sl(bnx), sl(bny), sl(bnz)), sl(bmat)
    if debug_tids:
        return out + (dbg_tids,)
    return out


def _packet_fallback(scene, mesh_roots, origin, direction, active, bound,
                     interpret, fallback_impl=None):
    """Exact finish for lanes with unenumerated wants, with the tightened
    bound. `active` lanes are already clustered by the last bin sort, so
    inactive packets/blocks exit at the root instantly.

    FALLBACK_IMPL="wide": one 8-wide per-packet-stack pass over all meshes
    (ops/wide.py) — per-128-ray unions on the clustered residual are far
    smaller than the packet walk's 4096-ray block unions.
    """
    with jax.named_scope("pt_mi_fb"):
        if (fallback_impl or FALLBACK_IMPL) == "wide":
            from .wide import mesh_intersect_wide
            return mesh_intersect_wide(scene, origin, direction,
                                       active=active, t_bound=bound,
                                       interpret=interpret)

        from .bvh_pallas import mesh_intersect_packet

        n = origin.x.shape[0]
        t_best = jnp.full((n,), FLT_MAX)
        n_best = Vec3.zeros((n,))
        m_best = jnp.full((n,), -1, jnp.int32)
        any_hit = jnp.zeros((n,), bool)
        for root in mesh_roots:
            t, nrm, mat = mesh_intersect_packet(
                scene, root, origin, direction, active=active,
                t_bound=jnp.minimum(bound, t_best), interpret=interpret,
                block_rows=FB_ROWS)
            upd = jnp.logical_and(t > 0.0, t < t_best)
            t_best = jnp.where(upd, t, t_best)
            n_best = Vec3.where(upd, nrm, n_best)
            m_best = jnp.where(upd, mat, m_best)
            any_hit = jnp.logical_or(any_hit, upd)
        return (jnp.where(any_hit, t_best, -1.0), n_best, m_best)
