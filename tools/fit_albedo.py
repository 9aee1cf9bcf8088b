#!/usr/bin/env python
"""Differentiable-rendering demo: recover material albedos from a target
render by gradient descent THROUGH the path tracer (north-star configs 3/5:
"differentiable albedo recovery converging").

Renders a target image with the true albedos, perturbs them, then runs SGD
steps where each gradient backpropagates through the full bounce loop
(reparameterized sampling) and is psum-reduced across the device mesh.

Usage: python tools/fit_albedo.py [scene.json] [--steps 40] [--res 64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?",
                    default=None)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1.0)
    ap.add_argument("--perturb", type=float, default=0.25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.engine.wavefront import zero_accum
    from pathtracer_tpu.parallel.sharding import (albedo_fit_step,
                                                  make_ray_mesh,
                                                  render_chunk_sharded,
                                                  replicate, shard_accum)

    if args.scene is None:
        from pathtracer_tpu.scene.fixtures import scene_path
        args.scene = scene_path("cornell")
    scene, settings = load_scene(args.scene, overrides={
        "RES": [args.res, args.res], "DEPTH": args.depth})
    mesh = make_ray_mesh()
    print(f"devices: {mesh.size}  scene: {args.scene} "
          f"{args.res}x{args.res} d{args.depth}")

    scene_r = replicate(scene, mesh)
    accum = shard_accum(zero_accum(settings), mesh)
    target = render_chunk_sharded(scene_r, settings, mesh, accum,
                                  jnp.int32(1), 1, 0, False)
    true_albedo = np.asarray(scene.materials.color)

    rng = np.random.default_rng(0)
    wrong = np.clip(true_albedo + rng.uniform(-args.perturb, args.perturb,
                                              true_albedo.shape), 0.02, 0.98)
    s = scene_r._replace(materials=scene_r.materials._replace(
        color=jnp.asarray(wrong, jnp.float32)))

    err0 = float(np.abs(wrong - true_albedo).mean())
    print(f"initial albedo MAE: {err0:.4f}")
    for k in range(args.steps):
        # shared randomness with the target (iteration 1): noise-free
        # self-calibration loss
        s, loss = albedo_fit_step(s, settings, mesh, target,
                                  jnp.int32(1), lr=args.lr, seed=0)
        if (k + 1) % 5 == 0 or k == 0:
            err = float(np.abs(np.asarray(s.materials.color)
                               - true_albedo).mean())
            print(f"step {k + 1:3d}: loss {float(loss):.6f}  "
                  f"albedo MAE {err:.4f}")
    err = float(np.abs(np.asarray(s.materials.color) - true_albedo).mean())
    print(f"final albedo MAE: {err:.4f} ({err0:.4f} -> {err:.4f}, "
          f"{100 * (1 - err / err0):.0f}% recovered)")


if __name__ == "__main__":
    main()
