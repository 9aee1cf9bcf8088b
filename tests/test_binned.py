"""Binned-treelet intersector (ops/binned.py): exactness vs the packet walk.

The binned pipeline permutes rays through several segmented sorts, streams
treelet rows over blocks, and finishes stragglers in the packet kernel — a
lot of moving parts whose ONLY acceptable observable effect is speed. These
tests pin the contract: active lanes' (t, normal, material) match
mesh_intersect_packet exactly, and full engine renders are bit-identical.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu import load_scene, render
from pathtracer_tpu.ops.intersect import intersect_scene
from pathtracer_tpu.scene.fixtures import scene_path
from pathtracer_tpu.utils.vec import Vec3


@pytest.fixture(scope="module")
def teapot():
    return load_scene(scene_path("teapot"))


def _random_rays(n, seed):
    rng = np.random.default_rng(seed)
    o = Vec3(*(jnp.asarray(rng.uniform(-5, 5, n), jnp.float32)
               for _ in range(3)))
    d = Vec3(*(jnp.asarray(rng.normal(size=n), jnp.float32)
               for _ in range(3)))
    act = jnp.asarray(rng.uniform(size=n) < 0.6)
    return o, d, act


@pytest.mark.parametrize("stream_uv", [False, True])
def test_binned_matches_packet_active_lanes(teapot, stream_uv):
    """STREAM_UV=False: full bit-exactness incl. normals. STREAM_UV=True
    (production): t/material stay bit-exact; the gather-epilogue normal is
    the same interp formula on the same f32 inputs, but XLA's FMA
    contraction choices differ between the fused epilogue and the in-kernel
    path — a ~1-ulp envelope on a few % of lanes (measured max 6e-8)."""
    import pathtracer_tpu.ops.binned as B

    scene, settings = teapot
    o, d, act = _random_rays(2048, 0)
    r_p = intersect_scene(scene, settings.geom_types, o, d,
                          bvh_impl="pallas", active=act)
    old = B.STREAM_UV
    try:
        B.STREAM_UV = stream_uv
        B.mesh_intersect_binned.clear_cache()
        r_b = intersect_scene(scene, settings.geom_types, o, d,
                              bvh_impl="binned", active=act)
    finally:
        B.STREAM_UV = old
        B.mesh_intersect_binned.clear_cache()
    a = np.asarray(act)
    # inactive lanes are don't-cares: the packet kernel incidentally records
    # hits for dead rays riding in live blocks, binned does not; the engine
    # masks dead lanes in shade() either way
    np.testing.assert_array_equal(np.asarray(r_p[0])[a],
                                  np.asarray(r_b[0])[a])
    np.testing.assert_array_equal(np.asarray(r_p[2])[a],
                                  np.asarray(r_b[2])[a])
    for c_p, c_b in zip(r_p[1], r_b[1]):
        if stream_uv:
            np.testing.assert_allclose(np.asarray(c_p)[a],
                                       np.asarray(c_b)[a], atol=1e-7)
        else:
            np.testing.assert_array_equal(np.asarray(c_p)[a],
                                          np.asarray(c_b)[a])


@pytest.mark.parametrize("k", [1, 2, 4])
def test_binned_expand_bitexact(teapot, k):
    """The multi-want expansion pipeline (expand=K: one K-want cull sweep,
    K-fold expanded bin/stream, slot-order merge) is bit-exact vs the
    pass-sequential pipeline on active lanes — same t, normal, material."""
    from pathtracer_tpu.ops.binned import mesh_intersect_binned

    scene, settings = teapot
    o, d, act = _random_rays(1024, 3)
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    t_s, n_s, m_s = mesh_intersect_binned(
        scene, roots, o, d, active=act, interpret=True)
    t_e, n_e, m_e = mesh_intersect_binned(
        scene, roots, o, d, active=act, interpret=True, expand=k)
    a = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(t_s)[a], np.asarray(t_e)[a])
    np.testing.assert_array_equal(np.asarray(m_s)[a], np.asarray(m_e)[a])
    for c_s, c_e in zip(n_s, n_e):
        np.testing.assert_array_equal(np.asarray(c_s)[a],
                                      np.asarray(c_e)[a])


def test_binned_pass_count_invariant(teapot):
    """Results must not depend on how many cull->bin->stream passes run
    before the exact fallback (the fallback guarantees completeness)."""
    from pathtracer_tpu.ops.binned import mesh_intersect_binned

    scene, settings = teapot
    o, d, act = _random_rays(1024, 1)
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    ref = None
    for p in (0, 1, 3):
        t, nrm, mat = mesh_intersect_binned(
            scene, roots, o, d, active=act, interpret=True, passes=p)
        cur = (np.asarray(t), np.asarray(mat))
        if ref is None:
            ref = cur
        else:
            a = np.asarray(act)
            np.testing.assert_array_equal(ref[0][a], cur[0][a])
            np.testing.assert_array_equal(ref[1][a], cur[1][a])


@pytest.mark.slow
def test_binned_engine_render_bitexact_vs_packet():
    """Full progressive renders are bit-identical between intersectors
    (STREAM_UV off: the gather epilogue's FMA contraction is the one
    ulp-level deviation of the production default, pinned separately)."""
    import pathtracer_tpu.ops.binned as B

    scene, settings = load_scene(scene_path("teapot"), overrides={
        "RES": [48, 48], "DEPTH": 4, "ITERATIONS": 4})
    old = B.STREAM_UV
    try:
        B.STREAM_UV = False
        B.mesh_intersect_binned.clear_cache()
        img_b = render(scene,
                       dataclasses.replace(settings, bvh_impl="binned"),
                       chunk=4)
    finally:
        B.STREAM_UV = old
        B.mesh_intersect_binned.clear_cache()
    img_p = render(scene, dataclasses.replace(settings, bvh_impl="pallas"),
                   chunk=4)
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_p))


@pytest.mark.slow
def test_binned_engine_render_uv_mode_statistics():
    """The STREAM_UV ablation mode (measured off by default — the XLA
    row-gather costs more than the interp it saves): a 1-ulp normal can
    flip a sampled path, so bit-identity is not its contract — image
    statistics are."""
    import pathtracer_tpu.ops.binned as B

    scene, settings = load_scene(scene_path("teapot"), overrides={
        "RES": [48, 48], "DEPTH": 4, "ITERATIONS": 4})
    old = B.STREAM_UV
    try:
        B.STREAM_UV = True
        B.mesh_intersect_binned.clear_cache()
        img_b = render(scene,
                       dataclasses.replace(settings, bvh_impl="binned"),
                       chunk=4)
    finally:
        B.STREAM_UV = old
        B.mesh_intersect_binned.clear_cache()
    img_p = render(scene, dataclasses.replace(settings, bvh_impl="pallas"),
                   chunk=4)
    b, p = np.asarray(img_b), np.asarray(img_p)
    assert abs(b.mean() - p.mean()) < 5e-3
    # the overwhelming majority of pixels are untouched by path flips
    assert (np.abs(b - p).max(axis=-1) < 1e-6).mean() > 0.98


def test_binned_wide_fallback_contract():
    """fallback_impl="wide" (the 8-wide per-packet-stack finish) keeps the
    true-closest-hit contract: identical hit set / material / normal vs the
    packet-fallback pipeline; t within the wide kernel's ~1-ulp broadcast-MT
    envelope (tests/test_wide.py module docstring) on fallback lanes."""
    from pathtracer_tpu.ops.binned import mesh_intersect_binned

    # the wide fallback needs the opt-in bvh8 tables (scene/loader.py)
    scene, settings = load_scene(scene_path("teapot"), wide_tables=True)
    o, d, act = _random_rays(1024, 2)
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    t_p, n_p, m_p = mesh_intersect_binned(
        scene, roots, o, d, active=act, interpret=True,
        fallback_impl="packet")
    t_w, n_w, m_w = mesh_intersect_binned(
        scene, roots, o, d, active=act, interpret=True,
        fallback_impl="wide")
    a = np.asarray(act)
    np.testing.assert_allclose(np.asarray(t_p)[a], np.asarray(t_w)[a],
                               rtol=1e-6, atol=0.0)
    np.testing.assert_array_equal(np.asarray(m_p)[a], np.asarray(m_w)[a])
    for c_p, c_w in zip(n_p, n_w):
        np.testing.assert_allclose(np.asarray(c_p)[a], np.asarray(c_w)[a],
                                   rtol=1e-5, atol=1e-6)


def test_binned_chunk_gate_exact_vs_packet(teapot):
    """CHUNK_GATE=True (support-masked per-chunk AABB gating, a measured-
    off perf ablation) must keep the true-closest-hit contract: skipping
    chunks no WANTING lane can hit closer than its current best never
    changes any lane's winning (t, normal, material) — a lane's true
    closest hit lies in a treelet it wants, and wanted treelets are fully
    streamed when enumerated (bonus candidates only pre-tighten bounds)."""
    import pathtracer_tpu.ops.binned as B
    from pathtracer_tpu.ops.binned import mesh_intersect_binned
    from pathtracer_tpu.ops.bvh_pallas import mesh_intersect_packet

    scene, settings = teapot
    o, d, act = _random_rays(2048, 7)
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    old = B.CHUNK_GATE
    try:
        B.CHUNK_GATE = True
        B.mesh_intersect_binned.clear_cache()
        t_g, n_g, m_g = mesh_intersect_binned(scene, roots, o, d,
                                              active=act, interpret=True)
    finally:
        B.CHUNK_GATE = old
        B.mesh_intersect_binned.clear_cache()
    t_p, n_p, m_p = mesh_intersect_packet(scene, roots[0], o, d,
                                          active=act, interpret=True)
    a = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(t_g)[a], np.asarray(t_p)[a])
    np.testing.assert_array_equal(np.asarray(m_g)[a], np.asarray(m_p)[a])
    for c_g, c_p in zip(n_g, n_p):
        np.testing.assert_array_equal(np.asarray(c_g)[a],
                                      np.asarray(c_p)[a])


@pytest.mark.parametrize("k", [1, 3])
def test_binned_slots_exact_vs_packet(teapot, k):
    """The slot pipeline (one K-want cull + K bound-tightened rounds) is
    bit-exact vs the packet walk — same contract as the pass-sequential
    production pipeline, for K below and above typical want counts."""
    from pathtracer_tpu.ops.binned import mesh_intersect_binned
    from pathtracer_tpu.ops.bvh_pallas import mesh_intersect_packet

    scene, settings = teapot
    o, d, act = _random_rays(2048, 11)
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    t_s, n_s, m_s = mesh_intersect_binned(scene, roots, o, d, active=act,
                                          interpret=True, slots=k)
    t_p, n_p, m_p = mesh_intersect_packet(scene, roots[0], o, d,
                                          active=act, interpret=True)
    a = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(t_s)[a], np.asarray(t_p)[a])
    np.testing.assert_array_equal(np.asarray(m_s)[a], np.asarray(m_p)[a])
    for c_s, c_p in zip(n_s, n_p):
        np.testing.assert_array_equal(np.asarray(c_s)[a],
                                      np.asarray(c_p)[a])


def test_binned_min_support_deferral_exact(teapot):
    """Minority-want deferral (MIN_SUPPORT > 1): skipped visits mark their
    supporters incomplete and the exact fallback recomputes them from
    scratch, so results stay exactly the packet walk's true closest hit —
    for the pass-sequential AND the slot pipeline."""
    import pathtracer_tpu.ops.binned as B
    from pathtracer_tpu.ops.binned import mesh_intersect_binned
    from pathtracer_tpu.ops.bvh_pallas import mesh_intersect_packet

    scene, settings = teapot
    o, d, act = _random_rays(2048, 13)
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    t_p, n_p, m_p = mesh_intersect_packet(scene, roots[0], o, d,
                                          active=act, interpret=True)
    a = np.asarray(act)
    old = B.MIN_SUPPORT
    try:
        B.MIN_SUPPORT = 64
        B.mesh_intersect_binned.clear_cache()
        for kw in ({}, {"slots": 2}):
            t_b, n_b, m_b = mesh_intersect_binned(
                scene, roots, o, d, active=act, interpret=True, **kw)
            np.testing.assert_array_equal(np.asarray(t_b)[a],
                                          np.asarray(t_p)[a])
            np.testing.assert_array_equal(np.asarray(m_b)[a],
                                          np.asarray(m_p)[a])
            for c_b, c_p in zip(n_b, n_p):
                np.testing.assert_array_equal(np.asarray(c_b)[a],
                                              np.asarray(c_p)[a])
    finally:
        B.MIN_SUPPORT = old
        B.mesh_intersect_binned.clear_cache()


def test_binned_fb_compact_off_exact(teapot):
    """FB_COMPACT=False (no pre-fallback compaction sort) must give the
    same results: the compaction is a pure locality optimization — the
    packet walk serves the same remaining set either way."""
    import pathtracer_tpu.ops.binned as B
    from pathtracer_tpu.ops.binned import mesh_intersect_binned

    scene, settings = teapot
    o, d, act = _random_rays(1024, 19)
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    old = B.FB_COMPACT
    try:
        B.FB_COMPACT = True       # teapot's adaptive default is OFF
        B.mesh_intersect_binned.clear_cache()
        r_on = mesh_intersect_binned(scene, roots, o, d, active=act,
                                     interpret=True)
        B.FB_COMPACT = False
        B.mesh_intersect_binned.clear_cache()
        r_off = mesh_intersect_binned(scene, roots, o, d, active=act,
                                      interpret=True)
    finally:
        B.FB_COMPACT = old
        B.mesh_intersect_binned.clear_cache()
    a = np.asarray(act)
    np.testing.assert_array_equal(np.asarray(r_on[0])[a],
                                  np.asarray(r_off[0])[a])
    np.testing.assert_array_equal(np.asarray(r_on[2])[a],
                                  np.asarray(r_off[2])[a])
    for c_1, c_2 in zip(r_on[1], r_off[1]):
        np.testing.assert_array_equal(np.asarray(c_1)[a],
                                      np.asarray(c_2)[a])
