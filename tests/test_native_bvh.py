"""Native (C++) vs NumPy BVH builder equivalence.

The C++ builder (native/bvh_builder.cpp) uses double-precision math in the
same operation order as the NumPy builder, so the trees must be IDENTICAL —
this is what lets the native build be a drop-in load-time speedup.
"""
import numpy as np
import pytest

from pathtracer_tpu.scene.bvh import _load_native, build_bvh

RNG = np.random.default_rng(9)

needs_native = pytest.mark.skipif(_load_native() is None,
                                  reason="native builder not built")


def random_tris(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(0, 2.0, (n, 3, 3)).astype(np.float32)
    return {
        "v0": v[:, 0], "v1": v[:, 1], "v2": v[:, 2],
        "n0": np.tile([0, 0, 1], (n, 1)).astype(np.float32),
        "n1": np.tile([0, 0, 1], (n, 1)).astype(np.float32),
        "n2": np.tile([0, 0, 1], (n, 1)).astype(np.float32),
        "material_id": np.arange(n, dtype=np.int32),
    }


@needs_native
@pytest.mark.parametrize("n,max_leaf", [(1, 1), (7, 1), (64, 4), (311, 8),
                                        (1000, 4)])
def test_native_matches_numpy(n, max_leaf):
    tris = random_tris(n, seed=n)
    nodes_py, re_py = build_bvh(tris, max_leaf=max_leaf, backend="numpy")
    nodes_cc, re_cc = build_bvh(tris, max_leaf=max_leaf, backend="native")
    for k in nodes_py:
        np.testing.assert_array_equal(nodes_py[k], nodes_cc[k], err_msg=k)
    for k in re_py:
        np.testing.assert_array_equal(re_py[k], re_cc[k], err_msg=k)


@needs_native
def test_native_degenerate_centroids():
    """Identical triangles exercise the median-fallback path."""
    t = random_tris(1, seed=1)
    n = 9
    tris = {k: np.repeat(v, n, axis=0) for k, v in t.items()}
    tris["material_id"] = np.arange(n, dtype=np.int32)
    nodes_py, re_py = build_bvh(tris, max_leaf=1, backend="numpy")
    nodes_cc, re_cc = build_bvh(tris, max_leaf=1, backend="native")
    for k in nodes_py:
        np.testing.assert_array_equal(nodes_py[k], nodes_cc[k], err_msg=k)
    np.testing.assert_array_equal(re_py["material_id"], re_cc["material_id"])
