"""BVH build invariants (reference bvhnode.cpp semantics)."""
import numpy as np

from pathtracer_tpu.scene.bvh import build_bvh

RNG = np.random.default_rng(3)


def random_tris(n):
    v = RNG.normal(0, 2.0, (n, 3, 3)).astype(np.float32)
    return {
        "v0": v[:, 0], "v1": v[:, 1], "v2": v[:, 2],
        "n0": v[:, 0] * 0 + np.float32([0, 0, 1]),
        "n1": v[:, 1] * 0 + np.float32([0, 0, 1]),
        "n2": v[:, 2] * 0 + np.float32([0, 0, 1]),
        "material_id": np.arange(n, dtype=np.int32),
    }


def test_node_and_leaf_counts():
    for n in (1, 2, 3, 17, 100):
        nodes, tris = build_bvh(random_tris(n), max_leaf=1)
        assert nodes["tri_first"].shape[0] == 2 * n - 1  # scene.cpp:173
        assert (nodes["tri_count"] == 1).sum() == n      # one triangle per leaf
        assert tris["v0"].shape[0] == n


def test_multi_leaf_counts():
    """max_leaf > 1: leaves hold contiguous ranges covering all triangles."""
    for n in (1, 5, 17, 100):
        nodes, tris = build_bvh(random_tris(n), max_leaf=4)
        leaf = nodes["tri_count"] > 0
        assert nodes["tri_count"][leaf].sum() == n
        assert (nodes["tri_count"] <= 4).all()
        # contiguous, disjoint, DFS-ordered ranges
        firsts = nodes["tri_first"][leaf]
        counts = nodes["tri_count"][leaf]
        order = np.argsort(firsts)
        ends = firsts[order] + counts[order]
        assert firsts[order][0] == 0 and ends[-1] == n
        assert (firsts[order][1:] == ends[:-1]).all()


def test_dfs_layout_and_reachability():
    """Left child at i+1; every node reachable exactly once; leaves cover all
    triangles (flattenBVHTree semantics, bvhnode.cpp:243-268)."""
    n = 64
    nodes, tris = build_bvh(random_tris(n), max_leaf=1)
    total = 2 * n - 1
    visited = np.zeros(total, dtype=bool)
    leaves = []
    stack = [0]
    while stack:
        i = stack.pop()
        assert 0 <= i < total and not visited[i]
        visited[i] = True
        if nodes["tri_count"][i] > 0:
            leaves.append(nodes["tri_first"][i])
        else:
            stack.append(i + 1)
            stack.append(nodes["second_child"][i])
    assert visited.all()
    assert sorted(leaves) == list(range(n))

    # parent/sibling links (stackless walk) are consistent with the layout
    for i in range(total):
        if nodes["tri_count"][i] == 0:
            assert nodes["parent"][i + 1] == i
            assert nodes["parent"][nodes["second_child"][i]] == i
            assert nodes["sibling"][i + 1] == nodes["second_child"][i]
            assert nodes["sibling"][nodes["second_child"][i]] == -1
    assert nodes["parent"][0] == -1


def test_bounds_contain_children_and_triangles():
    n = 50
    tris_in = random_tris(n)
    nodes, tris = build_bvh(tris_in, max_leaf=1)
    total = 2 * n - 1
    eps = 1e-4

    tri_min = np.minimum(np.minimum(tris["v0"], tris["v1"]), tris["v2"])
    tri_max = np.maximum(np.maximum(tris["v0"], tris["v1"]), tris["v2"])

    def check(i):
        bmin, bmax = nodes["bounds_min"][i], nodes["bounds_max"][i]
        ti = nodes["tri_first"][i]
        if nodes["tri_count"][i] > 0:
            assert (bmin <= tri_min[ti] + eps).all()
            assert (bmax >= tri_max[ti] - eps).all()
        else:
            for c in (i + 1, nodes["second_child"][i]):
                assert (bmin <= nodes["bounds_min"][c] + eps).all()
                assert (bmax >= nodes["bounds_max"][c] - eps).all()
                check(c)

    check(0)


def test_median_fallback_degenerate_centroids():
    """All triangles identical -> centroid extent 0 -> median split path
    (bvhnode.cpp:178-180)."""
    n = 9
    t = random_tris(1)
    tris_in = {k: np.repeat(v, n, axis=0) for k, v in t.items()}
    tris_in["material_id"] = np.arange(n, dtype=np.int32)
    nodes, tris = build_bvh(tris_in, max_leaf=1)
    assert nodes["tri_first"].shape[0] == 2 * n - 1
    assert sorted(tris["material_id"].tolist()) == list(range(n))
