#!/usr/bin/env python
"""Interactive progressive viewer — the reference app's interactivity
(main.cpp:488-562) without a GL window: orbit/zoom/pan camera commands drive
a progressive render whose accumulation restarts on camera change (the
camchanged semantics, main.cpp:423-452), with the image continuously written
to a PNG you can watch in any auto-reloading image viewer.

Commands (reference keybindings, typed + enter):
  a/d     orbit left/right   (left-drag theta)
  w/x     orbit up/down      (left-drag phi)
  q/e     zoom in/out        (right-drag)
  i/j/k/l pan lookAt         (middle-drag)
  r       re-center lookAt   (SPACE)
  s       save a timestamped PNG (S key)
  <enter> keep refining (more samples)
  quit    save + exit (ESC)

Usage: python viewer.py scenes/cornell.json [--res 256] [--out live.png]
"""
from __future__ import annotations

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--out", type=str, default="live.png",
                    help="continuously-updated preview PNG")
    ap.add_argument("--spp-per-step", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.engine.wavefront import (lanes_to_image, render_chunk,
                                                 zero_accum)
    from pathtracer_tpu.io.image import reference_style_name, save_png
    from pathtracer_tpu.scene.loader import derive_camera, orbit_camera
    from pathtracer_tpu.scene.types import make_scene_arrays
    import jax
    import jax.numpy as jnp

    overrides = {"RES": [args.res, args.res]}
    if args.depth:
        overrides["DEPTH"] = args.depth
    scene, settings = load_scene(args.scene, overrides=overrides)

    # Orbit state from the loaded camera (main.cpp:359-381)
    cam = scene.camera
    pos = np.asarray(cam.position)
    look_at = np.asarray(settings.look_at, dtype=np.float64)
    offset = pos - look_at
    zoom = float(np.linalg.norm(offset))
    theta = float(np.arccos(np.clip(offset[1] / max(zoom, 1e-9), -1, 1)))
    phi = float(np.arctan2(offset[0], offset[2]))

    cam_dict = derive_camera(pos, look_at, np.asarray(cam.up),
                             settings.fovy_deg, settings.width,
                             settings.height,
                             float(cam.focal_distance), float(cam.lens_radius))
    home_look_at = look_at.copy()

    def rebuild_camera():
        """Recompute camera arrays from (zoom, theta, phi, look_at)."""
        nonlocal scene
        new_cam = orbit_camera(cam_dict, zoom, theta, phi, look_at)
        cam_arrays = scene.camera._replace(
            position=jnp.asarray(new_cam["position"], jnp.float32),
            view=jnp.asarray(new_cam["view"], jnp.float32),
            up=jnp.asarray(new_cam["up"], jnp.float32),
            right=jnp.asarray(new_cam["right"], jnp.float32),
        )
        scene = scene._replace(camera=cam_arrays)

    accum = zero_accum(settings)
    iteration = 0
    step_orbit = 0.15
    step_pan = 0.5

    def refine():
        nonlocal accum, iteration
        t0 = time.perf_counter()
        accum = render_chunk(scene, settings, accum, jnp.int32(iteration + 1),
                             args.spp_per_step, args.seed, True)
        jax.block_until_ready(accum)
        iteration += args.spp_per_step
        # lanes_to_image undoes the tile-major lane order of mesh scenes
        img = lanes_to_image(accum * (1.0 / iteration), settings)
        save_png(np.asarray(img), args.out)
        dt = (time.perf_counter() - t0) * 1e3 / args.spp_per_step
        print(f"  {iteration} spp  ({dt:.1f} ms/frame)  -> {args.out}")
        return img

    def restart():
        nonlocal accum, iteration
        accum = zero_accum(settings)
        iteration = 0

    print(__doc__.split("Usage:")[0])
    rebuild_camera()
    img = refine()

    while True:
        try:
            cmd = input("viewer> ").strip()
        except EOFError:
            cmd = "quit"
        changed = True
        if cmd == "a":
            phi += step_orbit
        elif cmd == "d":
            phi -= step_orbit
        elif cmd == "w":
            theta = max(1e-3, theta - step_orbit)
        elif cmd == "x":
            theta = min(3.14, theta + step_orbit)
        elif cmd == "q":
            zoom = max(0.1, zoom - step_pan)
        elif cmd == "e":
            zoom += step_pan
        elif cmd == "i":
            look_at[1] += step_pan
        elif cmd == "k":
            look_at[1] -= step_pan
        elif cmd == "j":
            look_at[0] -= step_pan
        elif cmd == "l":
            look_at[0] += step_pan
        elif cmd == "r":
            look_at = home_look_at.copy()
        elif cmd == "s":
            out = reference_style_name(settings.image_name, iteration)
            save_png(np.asarray(img), out)
            print(f"  saved {out}")
            changed = False
        elif cmd in ("quit", "exit"):
            out = reference_style_name(settings.image_name, iteration)
            save_png(np.asarray(img), out)
            print(f"  saved {out}")
            return
        else:
            changed = False  # plain enter: refine without moving
        if changed:
            rebuild_camera()
            restart()       # camchanged -> restart accumulation
        img = refine()


if __name__ == "__main__":
    main()
