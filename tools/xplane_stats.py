#!/usr/bin/env python
"""In-situ per-stage timing of the FUSED frame via an xplane device trace.

The reference's EVALUATION path wraps each CUDA kernel in cudaEvent timers
inside the real frame (reference src/pathtrace.cu:629-673). Under XLA the
frame is ONE fused program, so utils/profiling.py can only time stages as
isolated jits — an estimate that ignores how fusion reshuffles cost. This
tool measures the real thing:

  1. the engine's stages are wrapped in jax.named_scope markers
     (pt_raygen / pt_intersect / pt_shade / pt_gather, engine/wavefront.py),
     which XLA records per instruction as metadata op_name;
  2. a fused render_chunk runs under jax.profiler.trace -> one .xplane.pb
     whose device events carry HLO instruction names ONLY (the axon
     transport's trace has no tf_op/op_name stats — verified by dump);
  3. the compiled module's HLO text supplies the instruction -> scope map
     (hlo_scope_map; a fusion carries its root op's scope, which is what
     XLA names the fusion after), control-flow CONTAINER events
     (while/cond/call wrap the leaf ops and would triple-charge the body)
     are excluded, and leaf device-op durations are attributed to their
     pt_* marker. The in-fused-frame stage table prints next to the
     isolated-jit estimate for reconciliation — on Cornell 400x400 d8 the
     fused frame is 66% intersection, while the isolated table misguesses
     gather at 33% (fusion folds it into neighbors).

Usage: python tools/xplane_stats.py [scene.json] [--res N] [--depth N]
       (run on TPU; on CPU backends the device plane is the host)
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Sub-stages of the binned mesh intersector (ops/binned.py named scopes)
# come FIRST: attribution charges an event to the first marker found, and
# their op_name paths also contain the enclosing pt_intersect.
STAGES = ("pt_mi_sort", "pt_mi_cull", "pt_mi_stream", "pt_mi_fb",
          "pt_raygen", "pt_intersect", "pt_shade", "pt_gather")


def _load_xplane(pb_path: str):
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "xprof.protobuf.xplane_pb2",
                "tensorboard_plugin_profile.protobuf.xplane_pb2"):
        try:
            import importlib
            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        raise ImportError("no xplane protobuf schema available")
    xspace = xplane_pb2.XSpace()
    with open(pb_path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def hlo_scope_map(hlo_text: str) -> dict:
    """instruction name -> jax named_scope path, from compiled HLO text.

    The axon transport's xplane carries only HLO names on device events (no
    tf_op/op_name stats — verified by dumping a trace), but the compiled
    module's text records each instruction's metadata={op_name="jit(...)
    /pt_intersect/..."}; joining the two recovers in-situ attribution.
    Fusion instructions carry their ROOT op's metadata, which is exactly
    the scope XLA names the fusion after.
    """
    import re
    out = {}
    pat = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=.*?"
                     r"op_name=\"([^\"]*)\"")
    for line in hlo_text.splitlines():
        m = pat.match(line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def stage_attribution(xspace, scope_map: dict = None):
    """Sum device-op durations per pt_* marker across TPU planes.

    Returns (per_stage_ms: dict, other_ms, total_ms, n_events). Events whose
    name/metadata carry several markers (fully fused across stages) are
    charged to the FIRST marker that appears, which matches how XLA names
    fusions after their root op's scope. `scope_map` (from hlo_scope_map)
    supplies the scope when the trace's own metadata lacks it.
    """
    per = {s: 0.0 for s in STAGES}
    other = 0.0
    n_events = 0
    scope_map = scope_map or {}

    for plane in xspace.planes:
        name = plane.name
        if "TPU" not in name and "/device:" not in name:
            continue
        if "host" in name.lower() or "Host" in name:
            continue
        ev_meta = plane.event_metadata
        st_meta = plane.stat_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # op-level lines only; steps/queues/etc. would double-count
            if "xla op" not in lname and "ops" != lname \
                    and "xla_op" not in lname and "tensorflow op" not in lname:
                continue
            # the "Async XLA Ops" line carries DMA events that OVERLAP the
            # compute ops (16% phantom time on alien) — skip it
            if "async" in lname:
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                blob = (md.name + " " + md.display_name) if md else ""
                if md and md.display_name:
                    # control-flow CONTAINER events (while/cond/call) nest
                    # the leaf ops — counting them would triple-charge the
                    # loop body (verified: while.47 spans the whole frame)
                    head = md.display_name.split(".")[0]
                    if head in ("while", "conditional", "call",
                                "closed_call"):
                        continue
                    blob += " " + scope_map.get(md.display_name, "")
                for stat in ev.stats:
                    sm = st_meta.get(stat.metadata_id)
                    if sm and sm.name in ("tf_op", "hlo_op", "name",
                                          "hlo_category", "long_name"):
                        blob += " " + (stat.str_value or "")
                        if stat.ref_value:
                            rm = st_meta.get(stat.ref_value)
                            if rm:
                                blob += " " + rm.name
                dur_ms = ev.duration_ps / 1e9
                n_events += 1
                for s in STAGES:
                    if s in blob:
                        per[s] += dur_ms
                        break
                else:
                    other += dur_ms
    total = sum(per.values()) + other
    return per, other, total, n_events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default=None)
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir (prints its path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.engine.wavefront import render_chunk, zero_accum
    from pathtracer_tpu.utils.profiling import measure_stages

    overrides = {}
    if args.res:
        overrides["RES"] = [args.res, args.res]
    if args.depth:
        overrides["DEPTH"] = args.depth
    if args.scene is None:
        from pathtracer_tpu.scene.fixtures import scene_path
        args.scene = scene_path("cornell")
    scene, settings = load_scene(args.scene, overrides=overrides or None)
    print(f"scene: {args.scene} {settings.width}x{settings.height} "
          f"d{settings.trace_depth} bvh={settings.bvh_impl}", flush=True)

    # warm up (compile) outside the trace
    accum = render_chunk(scene, settings, zero_accum(settings), jnp.int32(1),
                         args.frames, 0, True)
    jax.block_until_ready(accum)

    tmpdir = tempfile.mkdtemp(prefix="ptrace_") if args.keep else None
    ctx_dir = tmpdir or tempfile.mkdtemp(prefix="ptrace_")
    with jax.profiler.trace(ctx_dir):
        accum = render_chunk(scene, settings, accum,
                             jnp.int32(1 + args.frames), args.frames, 0, True)
        jax.block_until_ready(accum)

    pbs = glob.glob(os.path.join(ctx_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        print("no .xplane.pb captured — device profiling unavailable on "
              "this backend/transport; isolated-jit table follows.")
        print(measure_stages(scene, settings).table())
        return
    # instruction -> named_scope map from the compiled module (cache hit:
    # the same shapes just ran); the axon trace events carry HLO names only
    try:
        hlo = render_chunk.lower(
            scene, settings, zero_accum(settings), jnp.int32(1),
            args.frames, 0, True).compile().as_text()
        scope_map = hlo_scope_map(hlo)
    except Exception as e:   # keep the tool usable if lowering API shifts
        print(f"(no HLO scope map: {e})")
        scope_map = {}
    per, other, total, n_events = stage_attribution(
        _load_xplane(pbs[-1]), scope_map)
    if args.keep:
        print(f"trace dir: {ctx_dir}")
    if n_events == 0:
        # CPU/host traces expose HLO names without scope metadata — no
        # device plane to attribute (verified: /host:CPU tf_XLAEigen lines
        # carry hlo_op only). Honest fallback, same as a missing trace.
        print("no attributable device ops in the trace (CPU/host backend?) "
              "— isolated-jit table follows.")
        print(measure_stages(scene, settings).table())
        return

    print(f"\n=== In-situ stage attribution (fused frame x{args.frames}, "
          f"{n_events} device ops) ===")
    print(f"{'Stage':<16}{'ms/frame':>12}{'%':>8}")
    for s in STAGES:
        ms = per[s] / args.frames
        pct = 100.0 * per[s] / max(total, 1e-12)
        print(f"{s:<16}{ms:>12.3f}{pct:>7.1f}%")
    print(f"{'(unattributed)':<16}{other / args.frames:>12.3f}"
          f"{100.0 * other / max(total, 1e-12):>7.1f}%")
    print(f"{'TOTAL device':<16}{total / args.frames:>12.3f}")

    print()
    print(measure_stages(scene, settings).table())


if __name__ == "__main__":
    main()
