"""Engine tests: end-to-end render invariants on the small Cornell config."""
import jax
import jax.numpy as jnp
import numpy as np

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
    """Reference quirk (c): depth-truncated paths contribute raw throughput
    (SURVEY.md §3.2) — so a depth-1 render of the Cornell interior is NOT
    black even though almost no 1-bounce path reaches the light."""
    import dataclasses
    scene, settings = cornell_small
    s1 = dataclasses.replace(settings, trace_depth=1)
    img = np.asarray(render(scene, s1, iterations=4, chunk=4))
    # walls contribute their albedo directly -> image clearly non-black
    assert img.mean() > 0.1
