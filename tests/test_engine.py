"""Engine tests: end-to-end render invariants on the small Cornell config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.engine.wavefront import (render, render_chunk,
                                             render_iteration, zero_accum)


def test_scan_and_while_agree(cornell_small):
    """The early-exit while_loop and the differentiable scan must produce the
    SAME image for the same RNG stream."""
    scene, settings = cornell_small
    a1 = render_iteration(scene, settings, zero_accum(settings), jnp.int32(1),
                          seed=0, early_exit=False)
    a2 = render_iteration(scene, settings, zero_accum(settings), jnp.int32(1),
                          seed=0, early_exit=True)
    np.testing.assert_allclose(np.asarray(a1.to_array()),
                               np.asarray(a2.to_array()), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_accumulation_is_additive(cornell_small):
    """2 iterations chunked == 2 iterations run separately (running sum)."""
    scene, settings = cornell_small
    chunked = render_chunk(scene, settings, zero_accum(settings), jnp.int32(1),
                           2, 0, False)
    stepped = zero_accum(settings)
    for it in (1, 2):
        stepped = render_iteration(scene, settings, stepped, jnp.int32(it),
                                   seed=0)
    np.testing.assert_allclose(np.asarray(chunked.to_array()),
                               np.asarray(stepped.to_array()),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_iterations_decorrelated(cornell_small):
    """Different iterations draw different randoms (progressive refinement)."""
    scene, settings = cornell_small
    a1 = render_iteration(scene, settings, zero_accum(settings), jnp.int32(1))
    a2 = render_iteration(scene, settings, zero_accum(settings), jnp.int32(2))
    diff = np.abs(np.asarray(a1.to_array()) - np.asarray(a2.to_array()))
    assert diff.max() > 1e-3


def test_render_output_sane(cornell_small):
    scene, settings = cornell_small
    img = render(scene, settings, iterations=8, chunk=4)
    img = np.asarray(img)
    assert img.shape == (settings.height, settings.width, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    # Cornell at 64x64: lit interior; mean brightness in a broad sane envelope
    assert 0.02 < img.mean() < 1.0
    # the light itself should be bright (emittance 5): some pixels > 1
    assert img.max() > 1.0


def test_seed_determinism(cornell_small):
    scene, settings = cornell_small
    i1 = render(scene, settings, iterations=2, chunk=2, seed=3)
    i2 = render(scene, settings, iterations=2, chunk=2, seed=3)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    i3 = render(scene, settings, iterations=2, chunk=2, seed=4)
    assert np.abs(np.asarray(i1) - np.asarray(i3)).max() > 1e-4


def test_depth_exhaustion_quirk(cornell_small):
    """Reference quirk (c): with depth_quirk=True, depth-truncated paths
    contribute raw throughput (SURVEY.md §3.2) — so a depth-1 quirk render of
    the Cornell interior is NOT black even though almost no 1-bounce path
    reaches the light. Default (textbook) termination IS nearly black."""
    import dataclasses
    scene, settings = cornell_small
    s_quirk = dataclasses.replace(settings, trace_depth=1, depth_quirk=True)
    img_q = np.asarray(render(scene, s_quirk, iterations=4, chunk=4))
    # walls contribute their albedo directly -> image clearly non-black
    assert img_q.mean() > 0.1
    s_clean = dataclasses.replace(settings, trace_depth=1)
    img_c = np.asarray(render(scene, s_clean, iterations=4, chunk=4))
    # textbook: only direct light-hits contribute -> much darker
    assert img_c.mean() < img_q.mean() * 0.5


def _mode_settings(settings, **kw):
    import dataclasses
    return dataclasses.replace(settings, **kw)


@pytest.mark.slow
def test_tiled_mode_matches_masked_statistically(cornell_small):
    """Tile-skip compaction (STREAM_COMPACT equivalent) draws a different RNG
    stream per tile, so images agree in DISTRIBUTION: the averaged images must
    converge to the same render (SURVEY.md §7c distributional parity)."""
    scene, settings = cornell_small
    spp = 48
    s_masked = _mode_settings(settings, compact=False)
    s_tiled = _mode_settings(settings, compact=True, compact_tile=1024)
    img_m = np.asarray(render(scene, s_masked, iterations=spp, chunk=16))
    img_t = np.asarray(render(scene, s_tiled, iterations=spp, chunk=16))
    assert np.isfinite(img_t).all()
    # global mean converges fast (4096 px * 48 spp samples)
    assert abs(img_m.mean() - img_t.mean()) < 0.02
    # 8x8-block downsampled images agree within MC tolerance
    bm = img_m.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
    bt = img_t.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
    assert np.abs(bm - bt).mean() < 0.05


@pytest.mark.slow
def test_sorted_mode_matches_masked_statistically(cornell_small):
    """COALESCED material sort permutes lanes (pixel ride-along + scatter-add
    gather); must converge to the same image as masked mode."""
    scene, settings = cornell_small
    spp = 48
    s_masked = _mode_settings(settings, compact=False)
    s_sorted = _mode_settings(settings, compact=False, sort_materials=True)
    img_m = np.asarray(render(scene, s_masked, iterations=spp, chunk=16))
    img_s = np.asarray(render(scene, s_sorted, iterations=spp, chunk=16))
    assert np.isfinite(img_s).all()
    assert abs(img_m.mean() - img_s.mean()) < 0.02
    bm = img_m.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
    bs = img_s.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
    assert np.abs(bm - bs).mean() < 0.05


def test_sorted_mode_deterministic(cornell_small):
    scene, settings = cornell_small
    s_sorted = _mode_settings(settings, sort_materials=True)
    i1 = render(scene, s_sorted, iterations=2, chunk=2, seed=5)
    i2 = render(scene, s_sorted, iterations=2, chunk=2, seed=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ray_survival_counts(cornell_small):
    """PRINT_RAY_COUNT equivalent: counts start at the full pool and are
    non-increasing (paths only die: emitter hit / miss / depth exhaustion)."""
    from pathtracer_tpu.engine.wavefront import ray_survival

    scene, settings = cornell_small
    counts = np.asarray(ray_survival(scene, settings, jnp.int32(1)))
    assert counts.shape == (settings.trace_depth + 1,)
    assert counts[0] == settings.pixel_count
    assert (np.diff(counts) <= 0).all()
    # closed box: some rays survive to the depth limit, then all are done
    assert counts[-1] == 0 or settings.trace_depth > 4


def test_persistent_engine_bitexact_vs_masked(cornell_small):
    """The persistent engine's pixel-keyed RNG (decision_state) makes it draw
    the SAME randoms per logical sample as the masked engine: images must
    match exactly up to float accumulation order."""
    from pathtracer_tpu.engine.persistent import render_persistent

    scene, settings = cornell_small
    img_p = np.asarray(render_persistent(scene, settings, iterations=12,
                                         chunk=6))
    img_m = np.asarray(render(scene, settings, iterations=12, chunk=6))
    np.testing.assert_allclose(img_p, img_m, rtol=1e-5, atol=1e-5)


def test_sorted_mode_bitexact_vs_masked(cornell_small):
    """With pixel-keyed fast RNG, the material-sorted mode draws identical
    numbers for each path regardless of lane permutation: exact image match."""
    scene, settings = cornell_small
    s_sorted = _mode_settings(settings, sort_materials=True)
    img_s = np.asarray(render(scene, s_sorted, iterations=6, chunk=3))
    img_m = np.asarray(render(scene, settings, iterations=6, chunk=3))
    np.testing.assert_allclose(img_s, img_m, rtol=1e-5, atol=1e-5)


def test_sorted_mode_bitexact_nondivisible_pool(cornell_path):
    """Sorted mode at a pool NOT divisible by 128 (50x50 = 2500 lanes):
    exercises the full-pool multisort fallback and the deferred unsort on
    that path (wavefront.py bounce_step_sorted seg_ok=False +
    render_iteration's unsorter pick), which the divisible-pool tests never
    touch. Bit-equality vs masked mode pins both the sort and the unsort."""
    from pathtracer_tpu import load_scene

    scene, settings = load_scene(cornell_path, overrides={
        "RES": [50, 50], "DEPTH": 4, "ITERATIONS": 4})
    assert settings.pixel_count % 128 != 0
    s_sorted = _mode_settings(settings, sort_materials=True)
    img_s = np.asarray(render(scene, s_sorted, iterations=4, chunk=2))
    img_m = np.asarray(render(scene, settings, iterations=4, chunk=2))
    np.testing.assert_allclose(img_s, img_m, rtol=1e-5, atol=1e-5)


def test_persistent_resume_matches_oneshot(cornell_small):
    """Chunked persistent rendering (state carried across chunks) must equal
    a single chunk to the same spp."""
    from pathtracer_tpu.engine.persistent import (fresh_lanes, pixel_stride,
                                                  render_persistent_chunk)

    scene, settings = cornell_small
    stride = pixel_stride(settings.pixel_count)
    s1 = fresh_lanes(settings)
    s1 = render_persistent_chunk(scene, settings, s1, jnp.int32(8), 0, stride)
    s2 = fresh_lanes(settings)
    s2 = render_persistent_chunk(scene, settings, s2, jnp.int32(3), 0, stride)
    s2 = render_persistent_chunk(scene, settings, s2, jnp.int32(8), 0, stride)
    np.testing.assert_allclose(np.asarray(s1.accum.to_array()),
                               np.asarray(s2.accum.to_array()),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_threefry_rng_mode(cornell_small):
    """The jax.random (threefry) stream path must render end to end and
    converge to the same image as the fast hash path."""
    scene, settings = cornell_small
    s_tf = _mode_settings(settings, fast_rng=False)
    img_t = np.asarray(render(scene, s_tf, iterations=32, chunk=16))
    img_f = np.asarray(render(scene, settings, iterations=32, chunk=16))
    assert np.isfinite(img_t).all()
    assert abs(img_t.mean() - img_f.mean()) < 0.03


@pytest.mark.slow
def test_checkified_iteration_no_nans(cornell_small):
    """ERRORCHECK equivalent: one full iteration checkified for NaN/Inf in
    every intermediate (utils/debug.py)."""
    from pathtracer_tpu.utils.debug import validate_iteration

    scene, settings = cornell_small
    validate_iteration(scene, settings)  # raises on any non-finite value


@pytest.mark.slow
def test_russian_roulette_unbiased(cornell_small):
    """RR termination (north-star requirement; the reference lists it as
    future work) must be UNBIASED: the RR render converges to the same image,
    just with more variance."""
    scene, settings = cornell_small
    s_rr = _mode_settings(settings, rr_start=2, trace_depth=8)
    s_no = _mode_settings(settings, trace_depth=8)
    spp = 64
    img_rr = np.asarray(render(scene, s_rr, iterations=spp, chunk=16))
    img_no = np.asarray(render(scene, s_no, iterations=spp, chunk=16))
    assert np.isfinite(img_rr).all()
    assert abs(img_rr.mean() - img_no.mean()) < 0.02
    brr = img_rr.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
    bno = img_no.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
    assert np.abs(brr - bno).mean() < 0.05


@pytest.mark.slow
def test_persistent_rr_bitexact_vs_masked(cornell_small):
    """Russian roulette decisions are pixel-keyed (uniforms[:,4]), so the
    persistent engine with RR must still match the masked engine exactly."""
    from pathtracer_tpu.engine.persistent import render_persistent

    scene, settings = cornell_small
    s_rr = _mode_settings(settings, rr_start=2, trace_depth=6)
    img_p = np.asarray(render_persistent(scene, s_rr, iterations=8, chunk=4))
    img_m = np.asarray(render(scene, s_rr, iterations=8, chunk=4))
    np.testing.assert_allclose(img_p, img_m, rtol=1e-5, atol=1e-5)
