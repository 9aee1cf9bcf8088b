"""Stateless counter-based RNG for the wavefront loop.

The reference seeds a thrust engine per (iter, thread index, depth) via a hash
(reference src/pathtrace.cu:69-74, src/intersections.h:12-21) and consumes it
sequentially. TPU-native equivalent: one JAX PRNG key per (iteration, bounce),
with per-ray streams coming from the vectorized draw shape — distribution-
equivalent, not bit-equivalent (parity is distributional; see SURVEY.md §7c).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def iteration_key(seed: jnp.ndarray | int, iteration: jnp.ndarray) -> jax.Array:
    """Key for one progressive-render iteration."""
    base = jax.random.key(seed) if isinstance(seed, int) else seed
    return jax.random.fold_in(base, iteration)


def bounce_key(iter_key: jax.Array, depth: jnp.ndarray) -> jax.Array:
    """Key for one bounce within an iteration."""
    return jax.random.fold_in(iter_key, depth)


def uniforms(key: jax.Array, n: int, m: int) -> jnp.ndarray:
    """[n, m] uniforms in [0, 1)."""
    return jax.random.uniform(key, (n, m), dtype=jnp.float32)


def normals(key: jax.Array, n: int, m: int) -> jnp.ndarray:
    """[n, m] standard normals."""
    return jax.random.normal(key, (n, m), dtype=jnp.float32)
