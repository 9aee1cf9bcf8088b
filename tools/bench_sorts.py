#!/usr/bin/env python
"""Material-key sort shootout on TPU: Pallas-scan LSD radix vs lax.sort.

Timing is an in-graph lax.scan of M dependent iterations (each iteration's
keys derive from the previous output), so the remote transport's async
result handles and dispatch cache cannot fake it — wall time / M is the
true per-sort cost. Writes the measured justification the north star asks
for: is the radix sort worth making a full Pallas kernel, or is the XLA
multisort the TPU-optimal endpoint?
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained(sort_fn, keys, payload, m=8):
    """lax.scan of m dependent sorts; returns ms per sort."""

    @jax.jit
    def run(keys, payload):
        def body(carry, _):
            k, p = carry
            ks, ps = sort_fn(k, p)
            # derive the next iteration's keys from this one's output
            k2 = (ks + p[0].astype(jnp.int32)[0] * 0 + ps[0][:1].astype(
                jnp.int32) * 0 + jnp.int32(1)) % 64
            return (k2, ps), None

        (k, p), _ = jax.lax.scan(body, (keys, payload),
                                 None, length=m)
        return k, p

    out = run(keys, payload)
    jax.block_until_ready(out)
    # fresh values for the timed call: the remote transport result-caches
    # identical-input dispatches
    keys2 = (keys + 3) % 64
    payload2 = tuple(p + 1.0 for p in payload)
    jax.block_until_ready((keys2, payload2))
    t0 = time.perf_counter()
    out = run(keys2, payload2)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / m * 1e3


def main():
    from pathtracer_tpu.ops.scan import sort_by_key, sort_by_key_multisort

    n = 640_000
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 8, n), jnp.int32)  # material ids
    payload = tuple(jnp.asarray(rng.normal(size=n), jnp.float32)
                    for _ in range(13))   # the COALESCED ride-along set

    ms_multi = chained(
        lambda k, p: sort_by_key_multisort(k, p), keys, payload)
    print(f"lax.sort multisort (13 operands, 640k): {ms_multi:7.2f} ms/sort",
          flush=True)

    ms_radix = chained(
        lambda k, p: sort_by_key(k, p, n_bits=3, use_pallas=True),
        keys, payload, m=2)
    print(f"Pallas-scan LSD radix (3 bits, 640k):   {ms_radix:7.2f} ms/sort",
          flush=True)


if __name__ == "__main__":
    main()
