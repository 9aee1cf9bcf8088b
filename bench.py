#!/usr/bin/env python
"""Headline benchmark: Cornell 800x800 depth-8 ms/frame on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Baseline: the reference CUDA tracer's published 35.18 ms/frame at identical
config (RTX 3060 Laptop, BASELINE.md "Frame time, defaults"). vs_baseline is
our_value / baseline (< 1.0 means faster than the reference).
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_MS = 35.18  # BASELINE.md: Cornell 800x800 d8, compaction on, AA off

SCENE_CANDIDATES = (
    "/root/reference/scenes/cornell.json",
    os.path.join(os.path.dirname(__file__), "scenes", "cornell.json"),
)


def main():
    import jax
    import jax.numpy as jnp

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.engine.wavefront import render_chunk, zero_accum

    path = next(p for p in SCENE_CANDIDATES if os.path.exists(p))
    scene, settings = load_scene(path)
    assert settings.width == 800 and settings.trace_depth == 8

    accum = zero_accum(settings)
    chunk = 50
    # compile + warmup (2 executions: first post-compile run can still be slow)
    accum = render_chunk(scene, settings, accum, jnp.int32(1), chunk, 0, True)
    jax.block_until_ready(accum)
    accum = render_chunk(scene, settings, accum, jnp.int32(1 + chunk), chunk,
                         0, True)
    jax.block_until_ready(accum)

    # timed: best of 3 chunks of 50 iterations
    best = float("inf")
    it = 1 + 2 * chunk
    for _ in range(3):
        t0 = time.perf_counter()
        accum = render_chunk(scene, settings, accum, jnp.int32(it), chunk,
                             0, True)
        jax.block_until_ready(accum)
        dt = (time.perf_counter() - t0) / chunk
        best = min(best, dt)
        it += chunk

    ms = best * 1e3
    print(json.dumps({
        "metric": "cornell_800x800_d8_ms_per_frame",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(ms / BASELINE_MS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
