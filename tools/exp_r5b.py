#!/usr/bin/env python
"""Round-5 ENGINE-level flag A/B: AOT-compile one render_chunk executable
per flag configuration (flags are read at trace time), then time all arms
interleaved A B C A B C ... so transport drift hits every arm equally.

The in-engine xplane split (tools/xplane_stats.py, alien d4, round 5):
sorts 65.0 | cull 12.2 | stream 108.6 | fallback 50.6 ms/frame — measured
IN the real fused frame, not the synthetic bounce pool (which mis-ranked
sorts 3x low and on which the DP repartition looked -36% while the engine
said wash). Every lever below targets that real split.

Usage: python tools/exp_r5b.py [scene.json] [arm ...]
  arms: base sr32 p2 p4 gate sr32p2 ... (default: base sr32 p2 p4 gate)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ARMS = {
    # STREAM_ROWS: taller stream blocks amortize a visit over more lanes
    # (but collect more distinct ids per block)
    "base":  {},
    "sr32":  {"STREAM_ROWS": 32},
    "sr8":   {"STREAM_ROWS": 8},
    # passes: fewer passes = fewer bin sorts + stream rounds, bigger
    # fallback; more passes = the reverse
    "p2":    {"PASSES": 2},
    "p4":    {"PASSES": 4},
    # chunk gate retry under the DP-repartitioned chunk unions
    "gate":  {"CHUNK_GATE": True},
    "sr32p2": {"STREAM_ROWS": 32, "PASSES": 2},
    "fbrows64": {"FB_ROWS": 64},
    "fbrows16": {"FB_ROWS": 16},
    # spatial-coherence cand key (see binned.CAND_KEY)
    "oct":    {"CAND_KEY": "octcell"},
    "p2oct":  {"PASSES": 2, "CAND_KEY": "octcell"},
    # scene-level: rows-per-treelet bound (table shapes change, so these
    # arms carry their own scene instance)
    "tre24":  {"tre_rows": 24},
    "tre32":  {"tre_rows": 32},
    "tre96":  {"tre_rows": 96},
    "p2tre24": {"PASSES": 2, "tre_rows": 24},
}


def main():
    from pathtracer_tpu import load_scene
    from pathtracer_tpu.engine.wavefront import render_chunk, zero_accum
    from pathtracer_tpu.scene.fixtures import scene_path
    import pathtracer_tpu.ops.binned as B

    args = [a for a in sys.argv[1:]]
    path = args.pop(0) if args and args[0].endswith(".json") else \
        scene_path("animal")
    arm_names = args or ["base", "sr32", "p2", "p4", "gate"]

    scene, settings = load_scene(path)
    chunk = 4
    print(f"{path} {settings.width}x{settings.height} d{settings.trace_depth}"
          f" arms={arm_names}", flush=True)

    exes = {}
    scenes = {}
    for name in arm_names:
        flags = dict(ARMS[name])
        tre = flags.pop("tre_rows", None)
        scenes[name] = scene if tre is None else \
            load_scene(path, tre_rows=tre)[0]
        saved = {k: getattr(B, k) for k in flags}
        for k, v in flags.items():
            setattr(B, k, v)
        # module flags are read at TRACE time inside inner-jitted functions
        # whose trace cache would otherwise serve the previous arm's jaxpr
        B.mesh_intersect_binned.clear_cache()
        render_chunk.clear_cache()
        try:
            t0 = time.perf_counter()
            exes[name] = render_chunk.lower(
                scenes[name], settings, zero_accum(settings),
                jnp.int32(1), chunk, 0, True).compile()
            print(f"{name}: compiled in {time.perf_counter() - t0:.0f}s",
                  flush=True)
        finally:
            for k, v in saved.items():
                setattr(B, k, v)

    state = {n: (zero_accum(settings), 1) for n in arm_names}

    def frame_ms(name):
        acc, it = state[name]
        t0 = time.perf_counter()
        acc = exes[name](scenes[name], acc, jnp.int32(it))  # statics at AOT
        float(jnp.max(jax.tree.leaves(acc)[0]))      # honest readback
        state[name] = (acc, it + chunk)
        return (time.perf_counter() - t0) / chunk * 1e3

    for rep in range(4):
        tag = "warm" if rep == 0 else "meas"
        for n in arm_names:
            print(f"{n:>9} ms/frame [{tag}]: {frame_ms(n):8.1f}", flush=True)


if __name__ == "__main__":
    main()
