#!/usr/bin/env python
"""Per-stage performance stats + ray-survival counters for a scene.

The EVALUATION + PRINT_RAY_COUNT instrumentation of the reference
(pathtrace.cu:629-673,746-750) as a standalone tool.

Usage: python tools/perfstats.py [scene.json] [--res N] [--depth N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?",
                    default=None)
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    args = ap.parse_args()

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.utils.profiling import (measure_stages,
                                                ray_survival_report)

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
          f"d{settings.trace_depth}")
    print(ray_survival_report(scene, settings))
    print()
    print(measure_stages(scene, settings).table())


if __name__ == "__main__":
    main()
