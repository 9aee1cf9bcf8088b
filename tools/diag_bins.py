#!/usr/bin/env python
"""Distinct-id / support diagnostics for the binned intersector's stream.

Feeds real bounce rays through the production pipeline with the
`debug_tids` tap (post-bin-sort want ids per pass) and reports, per pass:
  - live want count (lanes with a want this pass)
  - distinct ids per (STREAM_ROWS, 128) stream block: mean / p50 / p90 / max
  - support histogram: how many lanes of the block want each visited id
  - visit cost model: sum over blocks of distinct ids (the stream loop's
    total trip count) vs the contiguous-runs ideal (live/2048 + 1 per block)

This is the measurement behind the stream-cost verdicts: whether the
distinct-id tail is boundary-straddle noise (fixable by alignment) or
genuine dispersion (few lanes per id — not fixable by any binning).

Usage: python tools/diag_bins.py [scene.json]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.ops.binned import STREAM_ROWS, TREELET_NONE, \
        mesh_intersect_binned
    from pathtracer_tpu.scene.fixtures import scene_path
    from tools.sweep_mesh import analytic_bound, make_bounce_rays

    path = sys.argv[1] if len(sys.argv) > 1 else scene_path("animal")
    scene, settings = load_scene(path)
    o, d, hit = make_bounce_rays(scene, settings)
    tb = analytic_bound(scene, settings, o, d)
    jax.block_until_ready((o, d, tb))
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    out = mesh_intersect_binned(scene, roots, o, d, active=hit, t_bound=tb,
                                debug_tids=True)
    tids = [np.asarray(t) for t in out[3]]
    print(f"{path}: {o.x.shape[0]} bounce rays, {len(tids)} passes, "
          f"stream block = ({STREAM_ROWS},128)", flush=True)

    block = STREAM_ROWS * 128
    for p, tid in enumerate(tids):
        # the pool is (rows,128) column-sorted; a stream block reads
        # STREAM_ROWS consecutive rows across all 128 columns
        rows = tid.shape[0] // 128
        m = tid.reshape(rows, 128)
        live = int((tid < TREELET_NONE).sum())
        n_blocks = rows // STREAM_ROWS
        distinct, supports = [], []
        for b in range(n_blocks):
            blk = m[b * STREAM_ROWS:(b + 1) * STREAM_ROWS]
            ids, counts = np.unique(blk[blk < TREELET_NONE],
                                    return_counts=True)
            if len(ids) == 0:
                continue
            distinct.append(len(ids))
            supports.extend(counts.tolist())
        if not distinct:
            print(f"pass {p}: no live wants")
            continue
        distinct = np.asarray(distinct)
        supports = np.asarray(supports)
        ideal = live / block + len(distinct)   # runs + 1 straddle per block
        print(f"pass {p}: live {live:7d}  blocks {len(distinct):3d}  "
              f"distinct/blk mean {distinct.mean():5.1f} "
              f"p50 {np.percentile(distinct, 50):4.0f} "
              f"p90 {np.percentile(distinct, 90):4.0f} "
              f"max {distinct.max():4d}  total visits {distinct.sum():6d} "
              f"(contig ideal ~{ideal:6.0f})")
        qs = [1, 2, 4, 8, 16, 64, 256, 2048]
        hist = [(supports <= q).mean() for q in qs]
        print("        support CDF " + "  ".join(
            f"<={q}:{f * 100:3.0f}%" for q, f in zip(qs, hist)))


if __name__ == "__main__":
    main()
