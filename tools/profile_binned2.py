#!/usr/bin/env python
"""Stage-prefix timing of the binned pipeline: time jits that run the
pipeline up to successive cut points; differences attribute cost per stage."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def pipeline(scene, mesh_roots, origin, direction, active, t_bound,
             passes, stop):
    """Replica of mesh_intersect_binned with a static `stop` cut point:
    stop=0 cand+sort only; 1,2,..=after pass k's stream; 100=+final cull;
    200=+fallback; 300=full (unsort)."""
    import pathtracer_tpu.ops.binned as B
    from pathtracer_tpu.utils.vec import Vec3

    n = origin.x.shape[0]
    chunk = min(B.SORT_CHUNK, B._pad_to(n, 1024))
    n_pad = B._pad_to(n, chunk)
    prep = lambda a, f: jnp.pad(a, (0, n_pad - n), constant_values=f)

    act, tb = active, t_bound
    cand = jnp.zeros((n,), bool)
    for root in mesh_roots:
        bmin = Vec3(scene.bvh.min_x[root], scene.bvh.min_y[root],
                    scene.bvh.min_z[root])
        bmax = Vec3(scene.bvh.max_x[root], scene.bvh.max_y[root],
                    scene.bvh.max_z[root])
        inv_dir = 1.0 / direction
        t_near = (bmin - origin) * inv_dir
        t_far = (bmax - origin) * inv_dir
        t0 = Vec3.minimum(t_near, t_far).max_component()
        t1 = Vec3.maximum(t_near, t_far).min_component()
        cand = jnp.logical_or(cand, jnp.logical_and(
            t0 <= t1, jnp.logical_and(t1 > 0.0, t0 < tb)))
    act = jnp.logical_and(act, cand)

    ox, oy, oz = (prep(c, 0.0) for c in origin)
    dx, dy, dz = (prep(c, 1.0) for c in direction)
    bound = prep(tb, 0.0)
    live = prep(act, False).astype(jnp.int32)
    lane = jnp.arange(n_pad, dtype=jnp.int32) % chunk
    bt = jnp.full((n_pad,), -1.0)
    bnx = jnp.zeros((n_pad,)); bny = jnp.zeros((n_pad,))
    bnz = jnp.zeros((n_pad,))
    bmat = jnp.full((n_pad,), -1, jnp.int32)
    pt0 = jnp.full((n_pad,), B.NEG_MAX)
    pid = jnp.full((n_pad,), -1, jnp.int32)

    rows = n_pad // 128
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ray_spec_c = pl.BlockSpec((B.CULL_ROWS, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def cull(ox, oy, oz, dx, dy, dz, bound, pt0, pid, live):
        r2 = lambda a: a.reshape(-1, 128)
        out = pl.pallas_call(
            B._cull_kernel, grid=(rows // B.CULL_ROWS,),
            in_specs=[table_spec] + [ray_spec_c] * 10,
            out_specs=[ray_spec_c] * 2,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                       jax.ShapeDtypeStruct((rows, 128), jnp.float32)],
        )(scene.treelet_f, r2(ox), r2(oy), r2(oz), r2(dx), r2(dy), r2(dz),
          r2(bound), r2(pt0), r2(pid), r2(live))
        return out[0].reshape(-1), out[1].reshape(-1)

    def stream(ox, oy, oz, dx, dy, dz, bound, tid):
        r2 = lambda a: a.reshape(-1, 128)
        out = pl.pallas_call(
            B._stream_kernel, grid=(rows // B.STREAM_ROWS,),
            in_specs=[table_spec, table_spec] + [ray_spec_c] * 8,
            out_specs=[ray_spec_c] * 5,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 4
            + [jax.ShapeDtypeStruct((rows, 128), jnp.int32)],
        )(scene.treelet_i, scene.tris_packed, r2(ox), r2(oy), r2(oz),
          r2(dx), r2(dy), r2(dz), r2(bound), r2(tid))
        return tuple(a.reshape(-1) for a in out)

    def force(*arrays):
        # scalar sums of EVERY live array: without this XLA dead-code
        # eliminates unused sort operands/kernel outputs and the prefix
        # cut measures nothing (observed: every stage "0.1 ms")
        return [jnp.sum(a.astype(jnp.float32)) for a in arrays]

    (_, ox, oy, oz, dx, dy, dz, bound, pt0, pid, live, lane,
     bt, bnx, bny, bnz, bmat) = B._seg_sort(
        chunk, 1 - live, ox, oy, oz, dx, dy, dz, bound, pt0, pid, live,
        lane, bt, bnx, bny, bnz, bmat)
    if stop == 0:
        return force(ox, oy, oz, dx, dy, dz, bound, pt0, pid, live, lane,
                     bt, bnx, bny, bnz, bmat)

    for p in range(passes):
        live = jnp.logical_and(live > 0, pid < B.TREELET_NONE
                               ).astype(jnp.int32)
        tid, tt0 = cull(ox, oy, oz, dx, dy, dz, bound, pt0, pid, live)
        if stop == p + 1000:     # after cull p only
            return force(tid, tt0, ox, oy, oz, dx, dy, dz, bound, live,
                         lane, bt, bnx, bny, bnz, bmat)
        (tid, ox, oy, oz, dx, dy, dz, bound, tt0, live, lane,
         bt, bnx, bny, bnz, bmat) = B._seg_sort(
            chunk, tid, ox, oy, oz, dx, dy, dz, bound, tt0, live, lane,
            bt, bnx, bny, bnz, bmat)
        t, nx, ny, nz, mat = stream(ox, oy, oz, dx, dy, dz, bound, tid)
        hit = t > 0.0
        bt = jnp.where(hit, t, bt)
        bnx = jnp.where(hit, nx, bnx); bny = jnp.where(hit, ny, bny)
        bnz = jnp.where(hit, nz, bnz)
        bmat = jnp.where(hit, mat, bmat)
        bound = jnp.where(hit, t, bound)
        pt0, pid = tt0, tid
        if stop == p + 1:
            return force(ox, oy, oz, dx, dy, dz, bound, pt0, pid, live,
                         lane, bt, bnx, bny, bnz, bmat)

    live = jnp.logical_and(live > 0, pid < B.TREELET_NONE).astype(jnp.int32)
    tid_f, _ = cull(ox, oy, oz, dx, dy, dz, bound, pt0, pid, live)
    remaining = jnp.logical_and(live > 0, tid_f < B.TREELET_NONE)
    if stop == 100:
        return force(remaining, ox, oy, oz, dx, dy, dz, bound, lane,
                     bt, bnx, bny, bnz, bmat)
    t, nrm, mat = B._packet_fallback(scene, mesh_roots,
                                     Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                                     remaining, bound, False)
    hit = t > 0.0
    bt = jnp.where(hit, t, bt)
    if stop == 200:
        return force(bt, nrm.x, nrm.y, nrm.z, mat, lane, bnx, bny, bnz,
                     bmat)
    bt2 = jnp.where(hit, t, bt)
    bnx = jnp.where(hit, nrm.x, bnx); bny = jnp.where(hit, nrm.y, bny)
    bnz = jnp.where(hit, nrm.z, bnz)
    bmat = jnp.where(hit, mat, bmat)
    lane2, bt2, bnx, bny, bnz, bmat = B._seg_sort(
        chunk, lane, bt2, bnx, bny, bnz, bmat)
    return force(lane2, bt2, bnx, bny, bnz, bmat)


def main():
    from pathtracer_tpu import load_scene
    from pathtracer_tpu.scene.fixtures import scene_path
    from pathtracer_tpu.utils.vec import Vec3
    from tools.sweep_mesh import analytic_bound, make_bounce_rays

    path = sys.argv[1] if len(sys.argv) > 1 else scene_path("teapot")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    scene, settings = load_scene(path)
    o, d, hit = make_bounce_rays(scene, settings)
    tb = analytic_bound(scene, settings, o, d)
    jax.block_until_ready((o, d, tb))
    roots = tuple(scene.geoms.root_node[i]
                  for i, g in enumerate(settings.geom_types) if g == 2)

    def timeit(f, m=8):
        # chained timing: see tools/sweep_mesh.time_fn for why anything
        # weaker lies on the remote transport
        from pathtracer_tpu.utils.vec import Vec3 as V

        def call(k, dep):
            ox = o.x + (dep + np.float32(k)) * 1e-6
            return f(scene, roots, V(ox, o.y, o.z), d, hit, tb)
        out = call(0, jnp.float32(0))
        jax.block_until_ready(out)
        dep = out[0] * 0.0
        t0 = time.perf_counter()
        for k in range(m):
            out = call(k, dep)
            dep = out[0] * 0.0
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / m * 1e3

    cuts = [0, 1000, 1] + ([1001, 2] if passes >= 2 else []) + [100, 200, 300]
    names = {0: "cand+sort0", 1000: "  +cull1", 1: "  +bin1+stream1",
             1001: "  +cull2", 2: "  +bin2+stream2", 100: "  +final cull",
             200: "  +fallback", 300: "  +unsort (full)"}
    for c in cuts:
        f = jax.jit(lambda sc, rts, oo, dd, hh, bb, c=c: pipeline(
            sc, rts, oo, dd, hh, bb, passes, c))
        print(f"{names[c]:20s}: {timeit(f):8.1f} ms", flush=True)
    f100 = jax.jit(lambda sc, rts, oo, dd, hh, bb: pipeline(
        sc, rts, oo, dd, hh, bb, passes, 100)[0])
    print("remaining lanes at fallback:",
          int(f100(scene, roots, o, d, hit, tb)), flush=True)


if __name__ == "__main__":
    main()
