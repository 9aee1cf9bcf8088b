"""Host-side SAH BVH build, emitted directly in flattened DFS-preorder layout.

Algorithm replicates reference src/bvhnode.cpp:
  - leaf = exactly one triangle (bvhnode.cpp:165-169)
  - split axis = maximum extent of the NODE bounds (not centroid bounds)
    (bvhnode.cpp:172 via BVHBounds::maximumExtent, :38-50)
  - 12-bucket SAH over centroid offsets with cost
    0.125 + (N_l*SA_l + N_r*SA_r) / SA_parent (bvhnode.cpp:93-146)
  - degenerate splits fall back to the median (bvhnode.cpp:141-144,178-180)
  - flattened layout: DFS preorder; left child at i+1; right child offset
    stored; leaf stores index into DFS-ordered triangle array
    (bvhnode.cpp:243-268)

The builder is vectorized NumPy over per-triangle precomputed bounds/centroids;
a native C++ builder (same layout) can be swapped in for very large meshes.
"""
from __future__ import annotations

import sys
from typing import Dict, Tuple

import numpy as np

N_BUCKETS = 12


def build_bvh(tris: Dict[str, np.ndarray], use_sah: bool = True
              ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Build a flattened BVH for one mesh.

    Args:
      tris: triangle SoA dict with v0,v1,v2,n0,n1,n2 [T,3] and material_id [T].
      use_sah: SAH bucket split (reference USE_SAH 1); else median split.

    Returns:
      (nodes, reordered_tris): nodes dict with bounds_min/bounds_max [N,3],
      tri_idx [N], second_child [N]; triangles reordered to DFS leaf order.
      N == 2*T - 1.
    """
    T = tris["v0"].shape[0]
    assert T > 0, "empty mesh"
    v0, v1, v2 = tris["v0"].astype(np.float64), tris["v1"].astype(np.float64), tris["v2"].astype(np.float64)
    tri_min = np.minimum(np.minimum(v0, v1), v2)          # [T,3]
    tri_max = np.maximum(np.maximum(v0, v1), v2)          # [T,3]
    centroid = (v0 + v1 + v2) / 3.0                        # [T,3]

    n_nodes = 2 * T - 1
    bounds_min = np.zeros((n_nodes, 3), dtype=np.float32)
    bounds_max = np.zeros((n_nodes, 3), dtype=np.float32)
    tri_idx = np.full((n_nodes,), -1, dtype=np.int32)
    second_child = np.zeros((n_nodes,), dtype=np.int32)
    leaf_order = np.zeros((T,), dtype=np.int64)

    state = {"node": 0, "leaf": 0}

    def surface_area(mn, mx):
        d = mx - mn
        return 2.0 * (d[0] * d[1] + d[0] * d[2] + d[1] * d[2])

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))

    def build(idx: np.ndarray) -> int:
        """Emit node for triangle subset `idx`; return its node index."""
        my = state["node"]
        state["node"] += 1
        mn = tri_min[idx].min(axis=0)
        mx = tri_max[idx].max(axis=0)
        bounds_min[my] = mn
        bounds_max[my] = mx

        if idx.shape[0] == 1:
            slot = state["leaf"]
            state["leaf"] += 1
            leaf_order[slot] = idx[0]
            tri_idx[my] = slot
            return my

        axis = int(np.argmax(np.abs(mx - mn)))
        c = centroid[idx][:, axis]
        cmin, cmax = c.min(), c.max()

        left_sel = None
        if use_sah and cmax > cmin and idx.shape[0] > 2:
            # Bucket assignment (bvhnode.cpp:102-107)
            b = (N_BUCKETS * (c - cmin) / (cmax - cmin)).astype(np.int64)
            b = np.minimum(b, N_BUCKETS - 1)
            # Per-bucket counts and bounds
            costs = np.empty(N_BUCKETS - 1)
            sa_parent = surface_area(mn, mx)
            bmins = np.full((N_BUCKETS, 3), np.inf)
            bmaxs = np.full((N_BUCKETS, 3), -np.inf)
            counts = np.zeros(N_BUCKETS, dtype=np.int64)
            for k in range(N_BUCKETS):
                sel = b == k
                counts[k] = sel.sum()
                if counts[k]:
                    bmins[k] = tri_min[idx[sel]].min(axis=0)
                    bmaxs[k] = tri_max[idx[sel]].max(axis=0)
            # Prefix/suffix sweep (bvhnode.cpp:109-122)
            pre_min = np.minimum.accumulate(bmins, axis=0)
            pre_max = np.maximum.accumulate(bmaxs, axis=0)
            suf_min = np.minimum.accumulate(bmins[::-1], axis=0)[::-1]
            suf_max = np.maximum.accumulate(bmaxs[::-1], axis=0)[::-1]
            pre_cnt = np.cumsum(counts)
            suf_cnt = np.cumsum(counts[::-1])[::-1]
            for i in range(N_BUCKETS - 1):
                sa0 = surface_area(pre_min[i], pre_max[i]) if pre_cnt[i] else 0.0
                sa1 = surface_area(suf_min[i + 1], suf_max[i + 1]) if suf_cnt[i + 1] else 0.0
                costs[i] = 0.125 + (pre_cnt[i] * sa0 + suf_cnt[i + 1] * sa1) / sa_parent
            split_bucket = int(np.argmin(costs))
            left_sel = b <= split_bucket
            nl = int(left_sel.sum())
            if nl == 0 or nl == idx.shape[0]:
                left_sel = None  # degenerate -> median fallback

        if left_sel is not None:
            left_idx = idx[left_sel]
            right_idx = idx[~left_sel]
        else:
            # Median split after centroid sort (bvhnode.cpp:141-144,184-188)
            order = np.argsort(c, kind="stable")
            midn = idx.shape[0] // 2
            left_idx = idx[order[:midn]]
            right_idx = idx[order[midn:]]

        build(left_idx)                      # left child lands at my+1
        second_child[my] = build(right_idx)  # right child offset
        return my

    build(np.arange(T, dtype=np.int64))
    sys.setrecursionlimit(old_limit)
    assert state["node"] == n_nodes and state["leaf"] == T

    nodes = {
        "bounds_min": bounds_min,
        "bounds_max": bounds_max,
        "tri_idx": tri_idx,
        "second_child": second_child,
    }
    reordered = {k: tris[k][leaf_order] for k in
                 ("v0", "v1", "v2", "n0", "n1", "n2", "material_id")}
    return nodes, reordered
