#!/usr/bin/env python
"""Mesh-traversal sweep harness: times ONE mesh intersect pass over realistic
bounce rays (primary hit points + cosine-hemisphere directions) per config.

Much cheaper to compile than a full engine frame, and the ray distribution is
what actually stresses the packet kernel: coherent origins, incoherent
directions, with the analytic-geoms closest-hit bound available.

Usage: python tools/sweep_mesh.py [scene.json] [depth-tag]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_bounce_rays(scene, settings, seed=0):
    """Primary rays -> first-hit -> cosine bounce rays + analytic re-bound."""
    from pathtracer_tpu.engine.wavefront import generate_paths
    from pathtracer_tpu.ops import rng
    from pathtracer_tpu.ops.bsdf import cosine_hemisphere
    from pathtracer_tpu.ops.intersect import intersect_scene
    from pathtracer_tpu.utils.vec import Vec3

    irng = rng.IterationRng(True, seed, jnp.int32(1),
                            pixel_map=settings.pixel_map())
    state = generate_paths(scene, settings, irng)
    t, normal, mat = intersect_scene(scene, settings.geom_types,
                                     state.origin, state.direction,
                                     bvh_impl="jnp" if False else "pallas")
    hit = t > 0.0
    p = state.origin + state.direction * t
    o = p + normal * 1e-3
    u1, u2 = irng.uniforms(jnp.int32(0), state.pixel, 2)
    d = cosine_hemisphere(normal, u1, u2)
    # dead lanes (miss) get parked rays pointing away
    o = Vec3.where(hit, o, state.origin)
    d = Vec3.where(hit, d, state.direction)
    return o, d, hit


def analytic_bound(scene, settings, o, d):
    from pathtracer_tpu.ops.intersect import (FLT_MAX, box_intersect,
                                              sphere_intersect)
    from pathtracer_tpu.scene.types import MESH, SPHERE

    n = o.x.shape[0]
    tb = jnp.full((n,), FLT_MAX)
    for i, gt in enumerate(settings.geom_types):
        if gt == MESH:
            continue
        fn = sphere_intersect if gt == SPHERE else box_intersect
        t, _ = fn(scene.geoms.transform[i], scene.geoms.inverse_transform[i],
                  scene.geoms.inv_transpose[i], o, d)
        tb = jnp.where(jnp.logical_and(t > 0.0, t < tb), t, tb)
    return tb


def time_fn(f, o, *args, m=8):
    """Average ms over m calls CHAINED by a data dependency (each call's
    input is perturbed by a scalar read from the previous call's output).

    Two remote-transport traps make anything weaker lie (measured):
    identical-input dispatches are result-cached, and block_until_ready on a
    remote result does NOT wait for compute — unchained "timed" calls
    measured 0.2 ms for work whose HBM traffic alone needs ~0.5 ms. The
    dependency chain forces real sequential execution; bench.py is naturally
    chained through its accumulator and was never affected."""
    import numpy as np

    from pathtracer_tpu.utils.vec import Vec3

    out = f(o, *args)
    jax.block_until_ready(out)
    float(jnp.max(out[0]))      # scalar readback: block_until_ready alone
    #                             has been observed to NOT wait once the
    #                             transport enters its instant-resolve state;
    #                             a host readback cannot lie
    dep = jnp.max(out[0]) * 0.0
    t0 = time.perf_counter()
    for k in range(m):
        ox = o.x + (dep + np.float32(k)) * 1e-6
        out = f(Vec3(ox, o.y, o.z), *args)
        dep = jnp.max(out[0]) * 0.0
    jax.block_until_ready(out)
    float(dep)                  # readback closes the timing window for real
    ms = (time.perf_counter() - t0) / m * 1e3
    if ms < 1.0:
        # the remote transport occasionally enters an instant-resolve state
        # mid-process (observed: every subsequent dispatch "completes" in
        # ~0.3 ms without computing). Nothing measured after onset can be
        # trusted — flag loudly instead of printing garbage.
        print(f"!! transport collapse suspected ({ms:.2f} ms for a 640k-ray "
              f"intersect) — RESTART the sweep; later rows are invalid",
              flush=True)
    return ms


def main():
    import pathtracer_tpu.ops.bvh_pallas as bp
    from pathtracer_tpu import load_scene

    from pathtracer_tpu.scene.fixtures import scene_path
    path = sys.argv[1] if len(sys.argv) > 1 else scene_path("teapot")
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    # bvh8 tables are opt-in now (scene/loader.py wide_tables); only the
    # wide-kernel sweep rows need them
    scene, settings = load_scene(path, wide_tables=(mode == "all"))
    o, d, hit = make_bounce_rays(scene, settings)
    tb = analytic_bound(scene, settings, o, d)
    jax.block_until_ready((o, d, tb))
    mesh_i = [i for i, g in enumerate(settings.geom_types) if g == 2][0]
    root = scene.geoms.root_node[mesh_i]
    print(f"{path}: {o.x.shape[0]} bounce rays, "
          f"{float(jnp.mean(hit.astype(jnp.float32))):.2f} live frac",
          flush=True)

    # NOTE: scene/root MUST be passed as jit ARGUMENTS: closure-captured
    # device arrays become embedded constants, which the remote transport
    # re-materializes per call (~11 ms per 40 MB — measured), poisoning
    # microbenchmarks. The engine always passes scene as an argument.
    def run_plain(block_rows):
        f = jax.jit(lambda sc, rt, o, d, a, tb: bp.mesh_intersect_packet(
            sc, rt, o, d, active=a, t_bound=tb,
            block_rows=block_rows))
        return time_fn(lambda o, *a: f(scene, root, o, *a), o, d, hit, tb)

    def run_sorted(block_rows, chunk):
        f = jax.jit(lambda sc, rt, o, d, a, tb:
                    bp.mesh_intersect_packet_sorted(
                        sc, rt, o, d, active=a, t_bound=tb,
                        block_rows=block_rows, sort_chunk=chunk))
        return time_fn(lambda o, *a: f(scene, root, o, *a), o, d, hit, tb)

    mesh_roots = tuple(scene.geoms.root_node[i]
                       for i, g in enumerate(settings.geom_types) if g == 2)

    def run_binned(passes):
        from pathtracer_tpu.ops.binned import mesh_intersect_binned
        f = jax.jit(lambda sc, rts, o, d, a, tb: mesh_intersect_binned(
            sc, rts, o, d, active=a, t_bound=tb, passes=passes))
        return time_fn(lambda o, *a: f(scene, mesh_roots, o, *a),
                       o, d, hit, tb)

    def run_wide(sort, packet_rows=8, cull=False, variant="push"):
        from pathtracer_tpu.ops.wide import (mesh_intersect_wide,
                                             mesh_intersect_wide_sorted)
        if sort:
            f = jax.jit(lambda sc, rts, o, d, a, tb:
                        mesh_intersect_wide_sorted(
                            sc, rts, o, d, active=a, t_bound=tb))
            return time_fn(lambda o, *a: f(scene, mesh_roots, o, *a),
                           o, d, hit, tb)
        f = jax.jit(lambda sc, o, d, a, tb: mesh_intersect_wide(
            sc, o, d, active=a, t_bound=tb, packet_rows=packet_rows,
            cull=cull, variant=variant))
        return time_fn(lambda o, *a: f(scene, o, *a), o, d, hit, tb)

    def run_binned_fb(fb):
        from pathtracer_tpu.ops.binned import mesh_intersect_binned
        f = jax.jit(lambda sc, rts, o, d, a, tb: mesh_intersect_binned(
            sc, rts, o, d, active=a, t_bound=tb, fallback_impl=fb))
        return time_fn(lambda o, *a: f(scene, mesh_roots, o, *a),
                       o, d, hit, tb)

    if mode == "passes":
        # passes sweep: extra cull->bin->stream rounds shrink the exact
        # fallback's residual set; live-gated blocks make marginal passes
        # cheap (teapot p2->p3 engine delta was +0.4 ms). Also measures the
        # no-fallback ablation per passes count (WRONG results — cost split
        # only, shows what the fallback itself costs at that residual size).
        import pathtracer_tpu.ops.binned as B
        for p in (2, 3, 4, 6, 8):
            print(f"binned passes={p}:      {run_binned(p):8.1f} ms",
                  flush=True)
        B.FALLBACK = False
        # the module flag is read at trace time: drop cached traces so the
        # flag flip actually retraces
        B.mesh_intersect_binned.clear_cache()
        for p in (2, 4, 8):
            print(f"binned p={p} NOfb:      {run_binned(p):8.1f} ms",
                  flush=True)
        B.FALLBACK = True
        return

    if mode == "rows":
        # block-shape + row-chunk-gate sweep at the passes sweet spot:
        # taller stream blocks amortize the distinct-id union (ids per
        # block grow sublinearly with rows); chunk gates skip masked tail
        # rows of short treelets. CULL_ROWS=16 hard-faults the TPU (device
        # error) — cull stays at 8. Within ONE run so the remote device's
        # run-to-run variance (measured 136 vs 182 ms for an identical
        # config across runs) cannot fake a verdict.
        import pathtracer_tpu.ops.binned as B
        for sr in (8, 16, 32):
            for chunk in (0, 4):
                B.STREAM_ROWS, B.STREAM_ROW_CHUNK = sr, chunk
                B.mesh_intersect_binned.clear_cache()
                print(f"binned p=4 sr={sr:2d} chunk={chunk}: "
                      f"{run_binned(4):8.1f} ms", flush=True)
        B.STREAM_ROWS, B.STREAM_ROW_CHUNK = 8, 4
        return

    if mode == "prod":
        # one number: the production binned config (adaptive passes)
        print(f"binned production:      {run_binned(None):8.1f} ms",
              flush=True)
        return

    if mode == "expand":
        # within-run A/B of the multi-want expansion pipeline vs the
        # pass-sequential production config, sweeping the want count K
        from pathtracer_tpu.ops.binned import mesh_intersect_binned

        def run_expand(k):
            f = jax.jit(lambda sc, rts, o, d, a, tb: mesh_intersect_binned(
                sc, rts, o, d, active=a, t_bound=tb, expand=k))
            return time_fn(lambda o, *a: f(scene, mesh_roots, o, *a),
                           o, d, hit, tb)

        for rep in range(2):
            print(f"sequential prod rep{rep}: {run_binned(None):8.1f} ms",
                  flush=True)
            for k in (2, 3, 4, 6):
                print(f"expand K={k} rep{rep}:     {run_expand(k):8.1f} ms",
                      flush=True)
        return

    if mode == "expand_nofb":
        # cost split: pipeline-only (WRONG results — no fallback) for the
        # sequential vs expansion formulations, interleaved within-run
        import pathtracer_tpu.ops.binned as B
        from pathtracer_tpu.ops.binned import mesh_intersect_binned

        def run_expand(k):
            f = jax.jit(lambda sc, rts, o, d, a, tb: mesh_intersect_binned(
                sc, rts, o, d, active=a, t_bound=tb, expand=k))
            return time_fn(lambda o, *a: f(scene, mesh_roots, o, *a),
                           o, d, hit, tb)

        B.FALLBACK = False
        B.mesh_intersect_binned.clear_cache()
        try:
            for rep in range(2):
                print(f"seq NOfb rep{rep}:        {run_binned(None):8.1f} ms",
                      flush=True)
                for k in (2, 4, 6):
                    print(f"expand K={k} NOfb rep{rep}:{run_expand(k):8.1f}"
                          " ms", flush=True)
        finally:
            B.FALLBACK = True
            B.mesh_intersect_binned.clear_cache()
        return

    if mode == "slots":
        # within-run A/B of the slot pipeline (one K-want cull + K
        # tightened rounds) vs the pass-sequential production config
        from pathtracer_tpu.ops.binned import mesh_intersect_binned

        def run_slots(k):
            f = jax.jit(lambda sc, rts, o, d, a, tb: mesh_intersect_binned(
                sc, rts, o, d, active=a, t_bound=tb, slots=k))
            return time_fn(lambda o, *a: f(scene, mesh_roots, o, *a),
                           o, d, hit, tb)

        run_binned(None)     # warmup (first-in-process rows are inflated)
        for rep in range(2):
            print(f"sequential prod rep{rep}: {run_binned(None):8.1f} ms",
                  flush=True)
            for k in (3, 4, 6):
                print(f"slots K={k} rep{rep}:      {run_slots(k):8.1f} ms",
                      flush=True)
        return

    if mode == "tune":
        # round-4 retune at the current code state: stream block height,
        # pass count, cand-sort — each within-run vs the production config
        import pathtracer_tpu.ops.binned as B

        def reset():
            B.mesh_intersect_binned.clear_cache()
        run_binned(None)     # warmup
        for rep in range(2):
            print(f"prod p4 sr16 rep{rep}:    {run_binned(None):8.1f} ms",
                  flush=True)
            B.FB_COMPACT = False
            reset()
            print(f"no fb-compact rep{rep}:   {run_binned(None):8.1f} ms",
                  flush=True)
            B.FB_COMPACT = None
            B.STREAM_ROWS = 32
            reset()
            print(f"sr32 rep{rep}:            {run_binned(None):8.1f} ms",
                  flush=True)
            B.STREAM_ROWS = 16
            reset()
            print(f"p3 rep{rep}:              {run_binned(3):8.1f} ms",
                  flush=True)
            B.CAND_SORT = False
            reset()
            print(f"no cand-sort rep{rep}:    {run_binned(None):8.1f} ms",
                  flush=True)
            B.CAND_SORT = True
            reset()
        return

    if mode == "fbrows":
        # packet-fallback block height under the compacted residual: the
        # live prefix is now a few dense blocks, so smaller blocks (less
        # union per walk) may beat the round-3 FB_ROWS=32 verdict
        import pathtracer_tpu.ops.binned as B

        run_binned(None)     # warmup
        for rep in range(2):
            for fr in (32, 16, 8):
                B.FB_ROWS = fr
                B.mesh_intersect_binned.clear_cache()
                print(f"fb_rows={fr:2d} rep{rep}:      "
                      f"{run_binned(None):8.1f} ms", flush=True)
        B.FB_ROWS = 32
        return

    if mode == "support":
        # within-run sweep of minority-want deferral (MIN_SUPPORT): skip
        # stream visits few lanes want; deferred lanes go to the exact
        # fallback. 1 = off (production baseline).
        import pathtracer_tpu.ops.binned as B

        run_binned(None)     # warmup
        for rep in range(2):
            for ms in (1, 16, 64, 256):
                B.MIN_SUPPORT = ms
                B.mesh_intersect_binned.clear_cache()
                print(f"min_support={ms:3d} rep{rep}:  "
                      f"{run_binned(None):8.1f} ms", flush=True)
        B.MIN_SUPPORT = 1
        return

    if mode == "gate":
        # within-run interleaved A/B of the vector chunk gate (treelet_chunk
        # AABB slab test per 4-row chunk vs the scalar n_rows-only gate)
        import pathtracer_tpu.ops.binned as B

        for rep in range(2):
            for flag in (True, False):
                B.CHUNK_GATE = flag
                B.mesh_intersect_binned.clear_cache()
                print(f"gate={flag!s:5s} rep{rep}:      "
                      f"{run_binned(None):8.1f} ms", flush=True)
        B.CHUNK_GATE = True
        return

    if mode == "defer":
        # within-run interleaved A/B of the deferred-normalization epilogue
        # (cross-run variance on the remote device swamps a 10-20% effect)
        import pathtracer_tpu.ops.binned as B

        for rep in range(2):
            for flag in (True, False):
                B.DEFER_NORMAL = flag
                B.mesh_intersect_binned.clear_cache()
                print(f"defer={flag!s:5s} rep{rep}:     "
                      f"{run_binned(None):8.1f} ms", flush=True)
        B.DEFER_NORMAL = True
        return

    if mode == "uv":
        # within-run interleaved A/B of the (u,v,tri)+gather stream contract
        import pathtracer_tpu.ops.binned as B

        for rep in range(2):
            for flag in (True, False):
                B.STREAM_UV = flag
                B.mesh_intersect_binned.clear_cache()
                print(f"uv={flag!s:5s} rep{rep}:        "
                      f"{run_binned(None):8.1f} ms", flush=True)
        B.STREAM_UV = True
        return

    if mode == "layout":
        # re-arbitrate the bin-sort layout + row gate at the CURRENT
        # defaults (the round-2 contiguous verdict was taken at p2/sr8)
        import pathtracer_tpu.ops.binned as B

        def reset():
            B.mesh_intersect_binned.clear_cache()
        print(f"column sorts (prod):    {run_binned(None):8.1f} ms",
              flush=True)
        B.BIN_CONTIGUOUS = True
        reset()
        print(f"contiguous bins:        {run_binned(None):8.1f} ms",
              flush=True)
        B.BIN_CONTIGUOUS = False
        B.STREAM_ROW_CHUNK = 2
        reset()
        print(f"column, row chunk=2:    {run_binned(None):8.1f} ms",
              flush=True)
        B.STREAM_ROW_CHUNK = 4
        reset()
        return

    if mode == "leaf":
        # treelet-size sweep UPWARD (max_leaf=48 measured worse; bigger
        # treelets cut both the cull's per-treelet slabs and the bin
        # misalignment that inflates distinct ids per stream block, at the
        # price of more tail rows per visit — chunk gating absorbs those)
        import pathtracer_tpu.ops.binned as B
        import pathtracer_tpu.scene.loader as L

        def run_leaf(ml, rows):
            sc2, st2 = L.load_scene(path, max_leaf=ml, tre_rows=rows)
            roots2 = tuple(sc2.geoms.root_node[i]
                           for i, g in enumerate(st2.geom_types)
                           if g == 2)
            B.mesh_intersect_binned.clear_cache()
            f = jax.jit(lambda sc, rts, o, d, a, tb:
                        B.mesh_intersect_binned(
                            sc, rts, o, d, active=a, t_bound=tb))
            return time_fn(lambda o, *a: f(sc2, roots2, o, *a),
                           o, d, hit, tb)

        print(f"leaf96 rows16 (prod):   {run_leaf(96, 16):8.1f} ms",
              flush=True)
        for ml, rows in ((132, 22), (192, 32), (288, 48)):
            print(f"leaf{ml} rows{rows}:        {run_leaf(ml, rows):8.1f} ms",
                  flush=True)
        # prod again: first-in-process timings are inflated on the remote
        # device, so the honest baseline is the LAST prod row
        print(f"leaf96 rows16 (prod):   {run_leaf(96, 16):8.1f} ms",
              flush=True)
        return

    if mode == "csplit":
        # cost split of the CONTIGUOUS-bin layout: if its stream collapses
        # (runs ~2000 lanes/id -> ~2 ids per 2048-lane block) the sort
        # relayout is the whole price and a slim-payload sort could win
        import pathtracer_tpu.ops.binned as B

        def reset():
            B.mesh_intersect_binned.clear_cache()
        B.BIN_CONTIGUOUS = True
        B.FALLBACK, B.STREAM_OFF = False, True
        reset()
        print(f"contig sorts+cull:  {run_binned(None):8.1f} ms", flush=True)
        B.STREAM_OFF = False
        reset()
        print(f"contig + stream:    {run_binned(None):8.1f} ms", flush=True)
        B.FALLBACK = True
        reset()
        print(f"contig full:        {run_binned(None):8.1f} ms", flush=True)
        B.BIN_CONTIGUOUS = False
        reset()
        print(f"columns full (ref): {run_binned(None):8.1f} ms", flush=True)
        return

    if mode == "split":
        # per-stage cost split at the production config via the diagnostic
        # flags (WRONG results; cost attribution only): sorts-only, +cull,
        # +stream, +fallback — same ablation recipe as BENCH.md round 2.
        import pathtracer_tpu.ops.binned as B

        def reset():
            B.mesh_intersect_binned.clear_cache()
        # warmup: first-in-process timings are inflated on the remote device
        run_binned(None)
        print(f"full (warmup ref): {run_binned(None):8.1f} ms", flush=True)
        B.FALLBACK, B.CULL_CHEAP, B.STREAM_OFF = False, True, True
        reset()
        print(f"sorts only:        {run_binned(None):8.1f} ms", flush=True)
        B.CULL_CHEAP = False
        reset()
        print(f"+ cull:            {run_binned(None):8.1f} ms", flush=True)
        B.STREAM_OFF = False
        reset()
        print(f"+ stream:          {run_binned(None):8.1f} ms", flush=True)
        B.FALLBACK = True
        reset()
        print(f"+ fallback (full): {run_binned(None):8.1f} ms", flush=True)
        return

    print(f"wide sorted:            {run_wide(True):8.1f} ms", flush=True)
    for pr in (8, 16, 32):
        print(f"wide unsorted pr={pr:3d}:   {run_wide(False, pr):8.1f} ms",
              flush=True)
    print(f"wide unsorted +cull:    {run_wide(False, 8, True):8.1f} ms",
          flush=True)
    print(f"wide mask-stack:        "
          f"{run_wide(False, variant='mask'):8.1f} ms", flush=True)

    def run_wide_leaf8():
        """Rebuild the scene's wide tree with max_leaf=8 (1-group leaves:
        sim predicts ~15% fewer cycles with tail-group gating) and bench
        the unsorted kernel on it."""
        import pathtracer_tpu.scene.loader as L
        from pathtracer_tpu.ops.wide import mesh_intersect_wide
        orig = L.build_wide_bvh
        L.build_wide_bvh = lambda tris: orig(tris, max_leaf=8)
        try:
            scene8, _ = L.load_scene(path, wide_tables=True)
        finally:
            L.build_wide_bvh = orig
        f = jax.jit(lambda sc, o, d, a, tb: mesh_intersect_wide(
            sc, o, d, active=a, t_bound=tb))
        return time_fn(lambda o, *a: f(scene8, o, *a), o, d, hit, tb)

    print(f"wide leaf8:             {run_wide_leaf8():8.1f} ms", flush=True)
    for fb in ("packet", "wide"):
        print(f"binned fb={fb:7s}:     {run_binned_fb(fb):8.1f} ms",
              flush=True)
    print(f"sorted br= 32 ch=65536: {run_sorted(32, 65536):8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
