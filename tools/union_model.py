#!/usr/bin/env python
"""NumPy cost model for packet-BVH block unions under different sort keys.

Simulates the packet kernel's work (node steps + leaf-row tests, union over
each block) for bounce rays, WITHOUT compiling anything on TPU. The model
ignores dynamic t_min tightening inside the mesh (uses only the static
analytic bound), so absolute numbers are pessimistic, but relative
comparisons between sort keys / block sizes are what we need.

Usage: python tools/union_model.py [scene.json]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.scene.fixtures import scene_path
    from tools.sweep_mesh import analytic_bound, make_bounce_rays

    path = sys.argv[1] if len(sys.argv) > 1 else scene_path("teapot")
    max_leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    scene, settings = load_scene(path, max_leaf=max_leaf)
    o, d, hit = make_bounce_rays(scene, settings)
    tb = np.asarray(analytic_bound(scene, settings, o, d))
    SAMPLE = 65536   # one chunk is statistically enough; scale results
    scale = o.x.shape[0] / SAMPLE
    step = o.x.shape[0] // SAMPLE
    sl = slice(None, SAMPLE * step, step)   # strided: spatially representative
    ox, oy, oz = (np.asarray(c)[sl] for c in o)
    dx, dy, dz = (np.asarray(c)[sl] for c in d)
    act = np.asarray(hit)[sl]
    tb = tb[sl]
    n = ox.shape[0]

    bvh = scene.bvh
    bmin = np.stack([np.asarray(bvh.min_x), np.asarray(bvh.min_y),
                     np.asarray(bvh.min_z)], 1)
    bmax = np.stack([np.asarray(bvh.max_x), np.asarray(bvh.max_y),
                     np.asarray(bvh.max_z)], 1)
    tri_count = np.asarray(bvh.tri_count)
    nn = bmin.shape[0]
    print(f"{path}: {nn} nodes, {int(tri_count.sum())} tris, "
          f"{n} rays ({act.mean():.2f} active)")

    # per-(ray, node) want: slab test with static bound  [n, nn] bitmask
    O = np.stack([ox, oy, oz], 1)[:, None, :]       # [n,1,3]
    D = np.stack([dx, dy, dz], 1)[:, None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / D
        tn = (bmin[None] - O) * inv
        tf = (bmax[None] - O) * inv
    t0 = np.minimum(tn, tf).max(axis=2)
    t1 = np.maximum(tn, tf).min(axis=2)
    want = act[:, None] & (t0 <= t1) & (t1 > 0) & (t0 < tb[:, None])  # [n,nn]
    print(f"mean wanted nodes/ray (active): "
          f"{want.sum(1)[act].mean():.1f} of {nn}")

    leaf_rows = np.where(tri_count > 0, -(-tri_count // 6), 0)  # rows per node

    octant = (dx < 0) * 4 + (dy < 0) * 2 + (dz < 0) * 1
    fine = ((dx < 0) * 4 + (dy < 0) * 2 + (dz < 0)) * 8 + \
        (np.abs(dx) > np.abs(dy)) * 4 + (np.abs(dy) > np.abs(dz)) * 2 + \
        (np.abs(dx) > np.abs(dz))

    # origin cell: Morton-interleaved quantization over the ray-origin bbox,
    # 4 bits/axis; composite keys put direction bits above the cell so a
    # block is (same octant) x (compact spatial cell run)
    lo = np.stack([ox, oy, oz], 1).min(0)
    hi = np.stack([ox, oy, oz], 1).max(0)
    q = np.clip(((np.stack([ox, oy, oz], 1) - lo) / np.maximum(hi - lo, 1e-9)
                 * 16).astype(np.int64), 0, 15)

    def spread2(v):
        v = (v | (v << 8)) & 0x00F00F
        v = (v | (v << 4)) & 0x0C30C3
        v = (v | (v << 2)) & 0x249249
        return v

    morton = spread2(q[:, 0]) | (spread2(q[:, 1]) << 1) | \
        (spread2(q[:, 2]) << 2)
    oct_morton = octant.astype(np.int64) << 12 | morton
    morton_oct = morton << 3 | octant.astype(np.int64)

    def cost(key, chunk, block):
        """Sort within chunks by (dead?, key); per-block union work."""
        tot_nodes = tot_rows = 0
        order = np.arange(n)
        k = np.where(act, key, key.max() + 1)
        for c0 in range(0, n, chunk):
            seg = order[c0:c0 + chunk]
            seg = seg[np.argsort(k[seg], kind="stable")]
            w = want[seg]                            # [chunk, nn]
            nb = len(seg) // block
            u = w[:nb * block].reshape(nb, block, -1).any(axis=1)  # [nb, nn]
            u = u[u[:, 0]]                           # root-skipped blocks
            tot_nodes += int(u.sum()) * 2            # ENTER + ADVANCE-ish
            tot_rows += int((u @ leaf_rows).sum())
            # cost model: node step ~ (50 + 25*block/1024/4) ns;
            # leaf row ~ 6 tris * 70 instr * block/128 vregs / 4 ALUs ns
        step_ns = 50 + 6.25 * block / 1024
        row_ns = 6 * 70 * (block / 128) / 4
        ms = (tot_nodes * step_ns + tot_rows * row_ns) * 1e-6 * scale
        print(f"  key={key_name:12s} chunk={chunk:6d} block={block:5d}: "
              f"nodes={tot_nodes:9d} leaf_rows={tot_rows:9d} "
              f"model={ms:7.1f} ms")
        return ms

    for key_name, key in (("fine6", fine.astype(np.int64)),
                          ("oct_morton", oct_morton)):
        for chunk, block in ((65536, 1024), (65536, 256), (65536, 128)):
            cost(key, chunk, block)


if __name__ == "__main__":
    main()
