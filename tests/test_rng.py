"""RNG stream tests: distribution quality of the fast PCG hash vs threefry.

The engine's Monte Carlo estimates only need distributional correctness
(SURVEY.md §7c); these tests check uniformity, independence across the axes
the renderer actually varies (lane, draw, bounce, iteration), and determinism.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.ops.rng import Stream, fast_state, fast_uniforms


@pytest.mark.parametrize("fast", [True, False])
def test_uniforms_moments(fast):
    s = Stream.for_iteration(fast, 0, jnp.int32(7))
    u = np.asarray(s.uniforms(100_000, 4))
    assert u.shape == (100_000, 4)
    assert (u >= 0).all() and (u < 1).all()
    np.testing.assert_allclose(u.mean(axis=0), 0.5, atol=0.01)
    np.testing.assert_allclose(u.var(axis=0), 1.0 / 12.0, atol=0.005)
    # histogram uniformity: 16 bins, chi2 well under catastrophic
    h, _ = np.histogram(u[:, 0], bins=16, range=(0, 1))
    chi2 = ((h - h.mean()) ** 2 / h.mean()).sum()
    assert chi2 < 60  # 15 dof; ~25 at p=0.05, 60 = far tail


@pytest.mark.parametrize("fast", [True, False])
def test_normals_moments(fast):
    s = Stream.for_iteration(fast, 0, jnp.int32(3))
    z = np.asarray(s.normals(100_000, 2))
    np.testing.assert_allclose(z.mean(axis=0), 0.0, atol=0.02)
    np.testing.assert_allclose(z.var(axis=0), 1.0, atol=0.03)


def test_fast_streams_decorrelated():
    """Adjacent lanes / draws / bounces / iterations must not correlate."""
    s1 = Stream.for_iteration(True, 0, jnp.int32(1))
    s2 = Stream.for_iteration(True, 0, jnp.int32(2))
    u1 = np.asarray(s1.uniforms(50_000, 2))
    u2 = np.asarray(s2.uniforms(50_000, 2))
    # across iterations
    assert abs(np.corrcoef(u1[:, 0], u2[:, 0])[0, 1]) < 0.02
    # across draws within a stream
    assert abs(np.corrcoef(u1[:, 0], u1[:, 1])[0, 1]) < 0.02
    # across adjacent lanes
    assert abs(np.corrcoef(u1[:-1, 0], u1[1:, 0])[0, 1]) < 0.02
    # across bounce sub-streams
    b0 = np.asarray(s1.fold(0).uniforms(50_000, 1))[:, 0]
    b1 = np.asarray(s1.fold(1).uniforms(50_000, 1))[:, 0]
    assert abs(np.corrcoef(b0, b1)[0, 1]) < 0.02


def test_fast_deterministic():
    a = fast_uniforms(fast_state(5, jnp.int32(9)), 1000, 3)
    b = fast_uniforms(fast_state(5, jnp.int32(9)), 1000, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fast_uniforms(fast_state(6, jnp.int32(9)), 1000, 3)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_fast_seed_zero_lane_zero_not_degenerate():
    """Guard the classic hash-RNG bug: all-zero inputs must still mix."""
    u = np.asarray(fast_uniforms(fast_state(0, jnp.int32(0)), 4, 4))
    assert len(np.unique(u)) > 10
