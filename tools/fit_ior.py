#!/usr/bin/env python
"""Differentiable-rendering demo: recover the IOR from a target
render by gradient descent THROUGH the path tracer (north-star config 5:
"differentiable albedo/IOR fit" on the refractive test scene).

What is and is not identifiable: the renderer's IOR gradient carries the
Fresnel reflect/transmit probability channel (the likelihood-ratio
surrogate in ops/bsdf.py, FD-verified at expectation level in
tests/test_grad.py) and the continuous refract-direction dependence. It
does NOT carry visibility discontinuities (a refracted ray jumping to a
different object) — that requires boundary/edge sampling, beyond the
reference's scope. The default demo scene (scenes/glass_slab.json: glass
slab in front of an emitting wall) is built so the identifiable
transmission channel dominates the loss, and plain gradient descent
recovers the IOR; on caustic-dominated scenes (e.g. test_scene.json) the
loss landscape is flat-with-jumps and GD cannot follow it (measured —
documented here rather than hidden).

Usage: python tools/fit_ior.py [scene.json] [--steps 60] [--res 32]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--spp", type=int, default=4, help="spp per SGD step")
    ap.add_argument("--lr-ior", type=float, default=0.08)
    ap.add_argument("--perturb-ior", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.engine.wavefront import render_iteration, zero_accum

    if args.scene is None:
        from pathtracer_tpu.scene.fixtures import scene_path
        args.scene = scene_path("glass_slab")
    scene, settings = load_scene(args.scene, overrides={
        "RES": [args.res, args.res], "DEPTH": args.depth})
    refr = np.asarray(scene.materials.has_refractive) > 0
    assert refr.any(), "scene has no refractive material to fit"
    print(f"scene: {args.scene} {args.res}x{args.res} d{args.depth} "
          f"refractive materials: {np.nonzero(refr)[0].tolist()}")

    spp = args.spp

    def render_avg(ior, albedo, seed):
        s = scene._replace(materials=scene.materials._replace(
            ior=ior, color=albedo))

        def body(a, k):
            return render_iteration(s, settings, a, k + 1, seed=seed,
                                    early_exit=False), None

        accum, _ = jax.lax.scan(body, zero_accum(settings),
                                jnp.arange(spp, dtype=jnp.int32))
        return accum * (1.0 / spp)

    @jax.jit
    def target_render(seed):
        return render_avg(scene.materials.ior, scene.materials.color, seed)

    @jax.jit
    def step(ior, vel, target, seed):
        def loss_fn(ior):
            img = render_avg(ior, scene.materials.color, seed)
            d = img - target
            return jnp.mean(d.x * d.x + d.y * d.y + d.z * d.z)

        loss, g_ior = jax.value_and_grad(loss_fn)(ior)
        g_ior = jnp.clip(g_ior, -2.0, 2.0)        # LR-surrogate spikes
        vel = 0.6 * vel + g_ior * jnp.asarray(refr, jnp.float32)
        ior = jnp.clip(ior - args.lr_ior * vel, 1.05, 3.0)
        ior = jnp.where(jnp.asarray(refr), ior, scene.materials.ior)
        return ior, vel, loss

    true_ior = np.asarray(scene.materials.ior)
    rng = np.random.default_rng(0)
    ior = jnp.asarray(np.where(refr, true_ior + args.perturb_ior, true_ior),
                      jnp.float32)

    # Common random numbers: each step renders with the SAME seed as the
    # target, so the loss is exactly zero at the true parameters and the
    # optimization is (nearly) deterministic; cycling a small seed pool
    # trades a little noise for robustness against overfitting one stream.
    n_seeds = 4
    targets = [target_render(s) for s in range(n_seeds)]
    err0_i = float(np.abs(np.asarray(ior) - true_ior)[refr].mean())
    vel = jnp.zeros_like(ior)
    for k in range(args.steps):
        s = k % n_seeds
        ior, vel, loss = step(ior, vel, targets[s], s)
        if k % 10 == 0 or k == args.steps - 1:
            ei = float(np.abs(np.asarray(ior) - true_ior)[refr].mean())
            print(f"step {k:3d}: loss={float(loss):.6f} ior_err={ei:.4f}")

    ei = float(np.abs(np.asarray(ior) - true_ior)[refr].mean())
    print(f"ior error: {err0_i:.4f} -> {ei:.4f} "
          f"({'RECOVERED' if ei < 0.4 * err0_i else 'partial'})")
    return 0 if ei < 0.5 * err0_i else 1


if __name__ == "__main__":
    sys.exit(main())
