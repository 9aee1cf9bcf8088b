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


def test_fingerprint_mismatch_rejected(cornell_small, tmp_path):
    import dataclasses

    import pytest

    scene, settings = cornell_small
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, zero_accum(settings), 1, settings)
    other = dataclasses.replace(settings, trace_depth=settings.trace_depth + 1)
    with pytest.raises(ValueError, match="mismatch"):
        load_checkpoint(path, other)
