#!/usr/bin/env python
"""Per-stage timing of the binned intersector pipeline on real bounce rays."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=4):
    """Perturb args[0].x per rep (remote transport result-caches identical
    dispatches)."""
    from pathtracer_tpu.utils.vec import Vec3
    o = args[0]

    def call(k):
        return f(Vec3(o.x + np.float32(k) * 1e-6, o.y, o.z), *args[1:])

    out = call(0)
    jax.block_until_ready(out)
    best = 1e18
    for k in range(1, reps + 1):
        t0 = time.perf_counter()
        out = call(k)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    import pathtracer_tpu.ops.binned as B
    from pathtracer_tpu import load_scene
    from pathtracer_tpu.ops.bvh_pallas import mesh_intersect_packet
    from pathtracer_tpu.scene.fixtures import scene_path
    from pathtracer_tpu.utils.vec import Vec3
    from tools.sweep_mesh import analytic_bound, make_bounce_rays

    path = sys.argv[1] if len(sys.argv) > 1 else scene_path("teapot")
    scene, settings = load_scene(path)
    o, d, hit = make_bounce_rays(scene, settings)
    tb = analytic_bound(scene, settings, o, d)
    jax.block_until_ready((o, d, tb))
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)
    n = o.x.shape[0]
    print(f"{path}: {n} rays", flush=True)

    # stage jits -------------------------------------------------------------
    @jax.jit
    def j_pass0(o, d, act, tb):
        """candidacy + initial sort only"""
        return B.mesh_intersect_binned(scene, roots, o, d, active=act,
                                       t_bound=tb, passes=0)

    @jax.jit
    def j_p1(o, d, act, tb):
        return B.mesh_intersect_binned(scene, roots, o, d, active=act,
                                       t_bound=tb, passes=1)

    @jax.jit
    def j_p2(o, d, act, tb):
        return B.mesh_intersect_binned(scene, roots, o, d, active=act,
                                       t_bound=tb, passes=2)

    @jax.jit
    def j_packet(o, d, act, tb):
        return mesh_intersect_packet(scene, roots[0], o, d, active=act,
                                     t_bound=tb)

    print(f"passes=0 (cand sort + FULL fallback): "
          f"{timeit(j_pass0, o, d, hit, tb):8.1f} ms", flush=True)
    print(f"passes=1:                             "
          f"{timeit(j_p1, o, d, hit, tb):8.1f} ms", flush=True)
    print(f"passes=2:                             "
          f"{timeit(j_p2, o, d, hit, tb):8.1f} ms", flush=True)
    print(f"packet alone (br=64):                 "
          f"{timeit(j_packet, o, d, hit, tb):8.1f} ms", flush=True)

    # isolated kernels -------------------------------------------------------
    n_pad = B._pad_to(n, min(B.SORT_CHUNK, B._pad_to(n, 1024)))
    rows = n_pad // 128
    pad = lambda a, f: jnp.pad(a, (0, n_pad - n), constant_values=f)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ray_spec = pl.BlockSpec((B.CULL_ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def j_cull(o, d, tb, live):
        r2 = lambda a: pad(a, 0.0).reshape(-1, 128)
        out = pl.pallas_call(
            B._cull_kernel, grid=(rows // B.CULL_ROWS,),
            in_specs=[table_spec] + [ray_spec] * 10,
            out_specs=[ray_spec] * 2,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                       jax.ShapeDtypeStruct((rows, 128), jnp.float32)],
        )(scene.treelet_f, r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y),
          r2(d.z), r2(tb),
          jnp.full((rows, 128), B.NEG_MAX),
          jnp.full((rows, 128), -1, jnp.int32),
          pad(live, 0).astype(jnp.int32).reshape(-1, 128))
        return out[0]

    live = hit.astype(jnp.int32)
    print(f"cull alone (unsorted pool, live=hit): "
          f"{timeit(j_cull, o, d, tb, live):8.1f} ms", flush=True)

    lane = jnp.arange(n_pad, dtype=jnp.int32) % min(B.SORT_CHUNK, n_pad)
    payload = [pad(a, 0.0) for a in (o.x, o.y, o.z, d.x, d.y, d.z, tb)] + \
        [lane] * 8

    @jax.jit
    def j_sort(o, key16):
        return B._seg_sort(min(B.SORT_CHUNK, n_pad), key16,
                           pad(o.x, 0.0), *payload)

    key16 = pad(hit.astype(jnp.int32), 0)
    print(f"seg sort 16 operands:                 "
          f"{timeit(j_sort, o, key16):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
