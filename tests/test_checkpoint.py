"""Checkpoint/resume determinism (SURVEY.md §5: deterministic restartability)."""
import os

import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.engine.wavefront import render_chunk, zero_accum
from pathtracer_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_resume_bitexact(cornell_small, tmp_path):
    """render(8 spp) == render(4) -> checkpoint -> load -> render(+4): the RNG
    is a pure function of (seed, iteration, pixel), so a resumed render is
    identical to an uninterrupted one."""
    scene, settings = cornell_small
    path = str(tmp_path / "ck.npz")

    full = render_chunk(scene, settings, zero_accum(settings), jnp.int32(1),
                        8, 0, True)

    half = render_chunk(scene, settings, zero_accum(settings), jnp.int32(1),
                        4, 0, True)
    save_checkpoint(path, half, 4, settings, seed=0)
    assert os.path.exists(path)

    accum, done, seed = load_checkpoint(path, settings)
    assert done == 4 and seed == 0
    resumed = render_chunk(scene, settings, accum, jnp.int32(done + 1),
                           4, seed, True)

    np.testing.assert_allclose(np.asarray(full.to_array()),
                               np.asarray(resumed.to_array()),
                               rtol=1e-6, atol=1e-6)


def test_persistent_resume_bitexact(cornell_small, tmp_path):
    """Persistent engine: a drained chunk boundary is a checkpoint; resuming
    from (accum, spp_done) reproduces the uninterrupted render EXACTLY (the
    lane->pixel schedule and RNG are pure functions of the assignment index,
    and round flushes happen in the same order either way)."""
    from pathtracer_tpu.engine.persistent import (fresh_lanes, pixel_stride,
                                                  render_persistent_chunk)

    scene, settings = cornell_small
    stride = pixel_stride(settings.pixel_count)

    full = render_persistent_chunk(scene, settings, fresh_lanes(settings),
                                   jnp.int32(8), 0, stride)

    half = render_persistent_chunk(scene, settings, fresh_lanes(settings),
                                   jnp.int32(4), 0, stride)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, half.accum, 4, settings, seed=0)
    accum, done, seed = load_checkpoint(path, settings)
    resumed = render_persistent_chunk(
        scene, settings, fresh_lanes(settings, accum=accum, start_spp=done),
        jnp.int32(8), seed, stride)

    np.testing.assert_array_equal(np.asarray(full.accum.to_array()),
                                  np.asarray(resumed.accum.to_array()))


def test_fingerprint_mismatch_rejected(cornell_small, tmp_path):
    import dataclasses

    import pytest

    scene, settings = cornell_small
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, zero_accum(settings), 1, settings)
    other = dataclasses.replace(settings, trace_depth=settings.trace_depth + 1)
    with pytest.raises(ValueError, match="mismatch"):
        load_checkpoint(path, other)
