#!/usr/bin/env python
"""Pop-count simulator for the 8-wide traversal kernel (ops/wide.py).

Replays the kernel's EXACT control flow (per-packet stack, far-to-near
pushes, pop-time culling, leaf 8-tri groups) in NumPy on the host and counts
the work units the TPU kernel would execute:
  * node pops   — one (8 children x 128 rays) slab tile each
  * leaf pops   — MAX_WIDE_GROUPS Möller-Trumbore group evaluations each
  * dead pops   — culled at pop time (cheap scalar-only iterations)

WHY: the kernel's wall-clock is ~linear in these counts, so the simulator
ranks BUILD/TRAVERSAL variants (collapse policy, leaf size, packet
coherence) without TPU access, on the same realistic ray mix the sweep
harness uses (primary hits + cosine bounce directions, analytic t-bounds).
It does not replace measurement — it predicts which variants are WORTH
measuring.

Usage: python tools/sim_wide.py [scene.json] [--res 256] [--rays 65536]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FLT_MAX = 3.402823466e38
EPS = 1e-6


def pack_host_tables(wide_nodes, tris8):
    """Host-side mirror of the kernel's tables: per-node child boxes
    (8,6), child records (8,3), axis; per-group triangle SoA."""
    n = len(wide_nodes)
    boxes = np.full((n, 8, 6), np.nan, np.float32)
    recs = np.zeros((n, 8, 3), np.int64)
    axes = np.zeros((n,), np.int64)
    for i, nd in enumerate(wide_nodes):
        axes[i] = nd["axis"]
        for c, ((mn, mx), (k, a, b)) in enumerate(
                zip(nd["boxes"], nd["children"])):
            boxes[i, c, 0:3] = mn
            boxes[i, c, 3:6] = mx
            recs[i, c] = (k, a, b)
    tri = {k: np.asarray(v, np.float64) for k, v in tris8.items()}
    return boxes.astype(np.float64), recs, axes, tri


def simulate_packet(boxes, recs, axes, tri, root,
                    o, d, act, tb):
    """One 128-ray packet through the kernel's traversal. Returns
    (node_pops, leaf_pops, dead_pops, t_min) — t_min for cross-checking."""
    inv = np.where(d != 0.0, 1.0 / d, np.copysign(np.inf, 1.0))
    t_min = np.where(act, tb, -FLT_MAX)
    sdir = d.sum(axis=1)  # (3,) majority direction per axis

    stack = [(root, -FLT_MAX, False)]  # (entry, entry_t, is_leaf_rec)
    # leaf entries stored as (g0, ng) tuples
    node_pops = leaf_pops = dead_pops = 0
    while stack:
        entry, te, is_leaf = stack.pop()
        if te >= t_min.max():
            dead_pops += 1
            continue
        if is_leaf:
            leaf_pops += 1
            g0, ng = entry
            for g in range(ng):
                t_min = mt_group(tri, g0 + g, o, d, t_min)
            continue
        node_pops += 1
        b = boxes[entry]                      # (8,6)
        tn = (b[:, None, 0:3] - o[None]) * inv[None]   # (8,128,3)
        tf = (b[:, None, 3:6] - o[None]) * inv[None]
        t0 = np.minimum(tn, tf).max(axis=2)
        t1 = np.maximum(tn, tf).min(axis=2)
        want = (t0 <= t1) & (t1 > 0.0) & (t0 < t_min[None])
        wcnt = want.sum(axis=1)
        t0c = np.where(want, t0, FLT_MAX).min(axis=1)
        dsum = sdir[axes[entry]]
        order = range(8) if dsum >= 0 else range(7, -1, -1)
        # push far-to-near: iterate near-to-far, push reversed
        pushes = []
        for c in order:
            if wcnt[c] == 0:
                continue
            k, a, bb = recs[entry, c]
            if k == 2:
                pushes.append(((a, bb), t0c[c], True))
            elif k == 1:
                pushes.append((a, t0c[c], False))
        stack.extend(reversed(pushes))
    return node_pops, leaf_pops, dead_pops, t_min


def mt_group(tri, g, o, d, t_min):
    """Möller-Trumbore one 8-tri group against the packet (hit t only)."""
    s = slice(g * 8, g * 8 + 8)
    v0, v1, v2 = tri["v0"][s], tri["v1"][s], tri["v2"][s]   # (8,3) each
    e1 = v1 - v0
    e2 = v2 - v0
    h = np.cross(d[None, :, :], e2[:, None, :])             # (8,128,3)
    a = (e1[:, None, :] * h).sum(2)
    par = np.abs(a) < EPS
    f = 1.0 / np.where(par, 1.0, a)
    sv = o[None, :, :] - v0[:, None, :]
    u = f * (sv * h).sum(2)
    q = np.cross(sv, e1[:, None, :])
    v = f * (d[None, :, :] * q).sum(2)
    t = f * (e2[:, None, :] * q).sum(2)
    valid = (~par) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= EPS)
    t = np.where(valid, t, FLT_MAX).min(axis=0)             # (128,)
    return np.where(t < t_min, t, t_min)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default=None)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--packets", type=int, default=0,
                    help="cap simulated packets (0 = all)")
    ap.add_argument("--no-sort", action="store_true",
                    help="skip the octant coherence sort")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.scene.fixtures import scene_path
    from tools.sweep_mesh import analytic_bound, make_bounce_rays

    path = args.scene or scene_path("teapot")
    scene, settings = load_scene(
        path, overrides={"RES": [args.res, args.res]}, wide_tables=True)
    o, d, hit = make_bounce_rays(scene, settings)
    tb = analytic_bound(scene, settings, o, d)

    o = np.stack([np.asarray(c) for c in o], 1).astype(np.float64)
    d = np.stack([np.asarray(c) for c in d], 1).astype(np.float64)
    act = np.asarray(hit)
    tb = np.asarray(tb, np.float64)

    # the kernel wrapper's coherence sort: candidates keyed by octant
    if not args.no_sort:
        octant = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2
                  + (d[:, 2] < 0)).astype(np.int64)
        key = np.where(act, octant, 8)
        order = np.argsort(key, kind="stable")
        o, d, act, tb = o[order], d[order], act[order], tb[order]

    tris8, wide_nodes, root = host_wide_tree(path)
    boxes, recs, axes, tri = pack_host_tables(wide_nodes, tris8)

    n = o.shape[0]
    npk = n // 128
    if args.packets:
        npk = min(npk, args.packets)
    tot = np.zeros(3, np.int64)
    skipped = 0
    for p in range(npk):
        s = slice(p * 128, p * 128 + 128)
        if not act[s].any():
            skipped += 1
            continue
        r = simulate_packet(boxes, recs, axes, tri, root,
                            o[s], d[s], act[s], tb[s])
        tot += np.array(r[:3])
    print(f"{path}: {npk} packets ({skipped} all-dead skipped), "
          f"{act[:npk * 128].mean():.2f} live frac")
    print(f"node pops {tot[0]}  leaf pops {tot[1]}  dead pops {tot[2]}")
    print(f"per live packet: node {tot[0] / max(npk - skipped, 1):.1f}  "
          f"leaf {tot[1] / max(npk - skipped, 1):.1f}  "
          f"dead {tot[2] / max(npk - skipped, 1):.1f}")


def host_wide_tree(path, build=None):
    """Rebuild the wide forest host-side exactly as the loader does,
    returning (tris8 dict with (T,3) v0/v1/v2, wide_nodes, root).
    `build` overrides the per-mesh wide build (variant experiments)."""
    import pathtracer_tpu.scene.loader as L
    from pathtracer_tpu.scene.bvh8 import build_wide_bvh, concat_wide

    captured = []
    orig = L.build_wide_bvh
    L.build_wide_bvh = lambda tris, *a, **k: (
        captured.append(tris) or orig(tris, *a, **k))
    try:
        L.load_scene(path)
    finally:
        L.build_wide_bvh = orig
    meshes = [(build or build_wide_bvh)(t) for t in captured]
    wide_nodes, tris8, root = concat_wide(meshes)
    return tris8, wide_nodes, root


if __name__ == "__main__":
    main()
