#!/usr/bin/env python
"""Round-5 experiment harness: within-run A/Bs for the mesh-throughput levers.

Modes:
  contig  — production column-binned p3 vs BIN_CONTIGUOUS (global 65536-chunk
            binning). Contiguity collapses the distinct-id-per-stream-block
            dispersion (tools/diag_bins.py: cold treelets smear over blocks
            under column sorts); the price is the contiguous sort relayout.
  sorts   — isolated 15-operand segmented sort: column vs contiguous chunk.
  diag    — distinct-ids-per-block stats under both binnings (CPU ok).

Usage: python tools/exp_r5.py <mode> [scene.json]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.sweep_mesh import analytic_bound, make_bounce_rays, time_fn


def setup(path):
    from pathtracer_tpu import load_scene
    scene, settings = load_scene(path)
    o, d, hit = make_bounce_rays(scene, settings)
    tb = analytic_bound(scene, settings, o, d)
    jax.block_until_ready((o, d, tb))
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    print(f"{path}: {o.x.shape[0]} rays", flush=True)
    return scene, settings, roots, o, d, hit, tb


def run_binned(scene, roots, o, d, hit, tb, **kw):
    from pathtracer_tpu.ops.binned import mesh_intersect_binned
    f = jax.jit(lambda sc, rts, o, d, a, tb: mesh_intersect_binned(
        sc, rts, o, d, active=a, t_bound=tb, **kw))
    return time_fn(lambda o, *a: f(scene, roots, o, *a), o, d, hit, tb)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "contig"
    from pathtracer_tpu.scene.fixtures import scene_path
    path = sys.argv[2] if len(sys.argv) > 2 else scene_path("animal")

    import pathtracer_tpu.ops.binned as B

    if mode == "contig":
        scene, settings, roots, o, d, hit, tb = setup(path)
        print(f"column p3 (prod):    "
              f"{run_binned(scene, roots, o, d, hit, tb, passes=3):8.1f} ms",
              flush=True)
        B.BIN_CONTIGUOUS = True
        B.mesh_intersect_binned.clear_cache()
        for p in (2, 3):
            print(f"contiguous p{p}:       "
                  f"{run_binned(scene, roots, o, d, hit, tb, passes=p):8.1f}"
                  f" ms", flush=True)
        B.BIN_CONTIGUOUS = False
        B.mesh_intersect_binned.clear_cache()
        # re-run baseline last to bound run drift within this process
        print(f"column p3 (again):   "
              f"{run_binned(scene, roots, o, d, hit, tb, passes=3):8.1f} ms",
              flush=True)
        return

    if mode == "sorts":
        scene, settings, roots, o, d, hit, tb = setup(path)
        n = o.x.shape[0]
        n_pad = B._pad_to(n, 65536)
        pad = lambda a, f: jnp.pad(a, (0, n_pad - n), constant_values=f)
        lane = jnp.arange(n_pad, dtype=jnp.int32)
        payload = [pad(a, 0.0) for a in (o.y, o.z, d.x, d.y, d.z, tb)] + \
            [lane.astype(jnp.float32)] * 7
        key = pad((hit.astype(jnp.int32) * 77 + lane % 163) % 163, 0)
        from pathtracer_tpu.utils.vec import Vec3

        def j_sort_factory():
            @jax.jit
            def f(o, key):
                out = B._seg_sort(128, key, pad(o.x, 0.0), *payload)
                return out
            return f

        for contig, tag in ((False, "column    "), (True, "contiguous")):
            B.BIN_CONTIGUOUS = contig
            f = j_sort_factory()
            ms = time_fn(lambda o, *a: f(o, *a), Vec3(o.x, o.y, o.z), key)
            print(f"seg sort 14-op {tag}: {ms:8.2f} ms", flush=True)
        B.BIN_CONTIGUOUS = False
        return

    if mode == "diag":
        # distinct ids per (STREAM_ROWS,128) block under both binnings —
        # pure numpy on the debug_tids feed
        scene, settings, roots, o, d, hit, tb = setup(path)
        for contig in (False, True):
            B.BIN_CONTIGUOUS = contig
            B.mesh_intersect_binned.clear_cache()
            f = jax.jit(lambda sc, rts, o, d, a, tb: B.mesh_intersect_binned(
                sc, rts, o, d, active=a, t_bound=tb, passes=3,
                debug_tids=True))
            *_, tids = f(scene, roots, o, d, hit, tb)
            tot = 0
            for p, tid in enumerate(tids):
                t = np.asarray(tid).reshape(-1, 128)
                nb = t.shape[0] // B.STREAM_ROWS
                blocks = t.reshape(nb, B.STREAM_ROWS, 128)
                dist = [len(np.unique(
                    b[b < B.TREELET_NONE])) for b in blocks]
                live = sum(1 for x in dist if x)
                print(f"contig={contig} pass{p}: visits={sum(dist)} "
                      f"live_blocks={live}/{nb} "
                      f"max_ids={max(dist)}", flush=True)
                tot += sum(dist)
            print(f"contig={contig} TOTAL visits={tot}", flush=True)
        B.BIN_CONTIGUOUS = False
        return

    if mode == "repart":
        # within-run A/B: DP-repartitioned treelet tables vs the historical
        # leaf-per-treelet tables, same rays. One scene load per variant
        # (the REPARTITION module flag steers pack_treelet_tables).
        import pathtracer_tpu.scene.types as T
        from pathtracer_tpu import load_scene

        scene, settings, roots, o, d, hit, tb = setup(path)
        max_rows = scene.treelet_rows.shape[0]

        def variant(repartition, rows):
            T.REPARTITION = repartition
            sc, _ = load_scene(path, tre_rows=rows)
            T.REPARTITION = True
            return sc

        # pre-load EVERY variant before any timing: mid-run host->device
        # table uploads have been observed to flip the remote transport into
        # its instant-resolve state, invalidating later rows
        cfgs = [(False, max_rows, f"leaf {max_rows}r"),
                (True, max_rows, f"DP   {max_rows}r")] + (
            [(True, 64, "DP   64r")] if max_rows >= 48 else
            [(True, 32, "DP   32r")])
        scs = [(tag, variant(rep, rows)) for rep, rows, tag in cfgs]
        jax.block_until_ready([s.treelet_f for _, s in scs])
        for tag, sc in scs:
            print(f"{tag}: "
                  f"{run_binned(sc, roots, o, d, hit, tb, passes=None):8.1f}"
                  f" ms", flush=True)
        return

    if mode == "repart_engine":
        # engine-level within-run A/B of the treelet partitions: times
        # render_chunk frames for both table sets, interleaved A B A B to
        # expose any order/transport drift
        import time as _time

        import pathtracer_tpu.scene.types as T
        from pathtracer_tpu import load_scene
        from pathtracer_tpu.engine.wavefront import render_chunk, zero_accum

        def load(rep):
            T.REPARTITION = rep
            sc, st = load_scene(path)
            T.REPARTITION = True
            return sc, st

        arms = {"leaf": load(False), "DP  ": load(True)}
        chunk = 4

        def frame_ms(sc, st, accum, it):
            t0 = _time.perf_counter()
            accum = render_chunk(sc, st, accum, jnp.int32(it), chunk,
                                 0, True)
            float(jnp.max(jax.tree.leaves(accum)[0]))   # honest readback
            return (_time.perf_counter() - t0) / chunk * 1e3, accum

        state = {k: (zero_accum(v[1]), 1) for k, v in arms.items()}
        for rep in range(3):
            for k, (sc, st) in arms.items():
                acc, it = state[k]
                ms, acc = frame_ms(sc, st, acc, it)
                state[k] = (acc, it + chunk)
                tag = "warm" if rep == 0 else "meas"
                print(f"{k} engine ms/frame [{tag}]: {ms:8.1f}", flush=True)
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
