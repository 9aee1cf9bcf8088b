"""Wavefront render engine: the TPU-native bounce loop.

The reference streams a shrinking ray pool through per-stage kernel launches
with host-side loop control (pathtrace, src/pathtrace.cu:679-914). The
TPU-idiomatic shape used here is a FIXED-SIZE, mask-carrying wavefront inside a
single jit-compiled program: one lane per pixel, `remaining_bounces` encodes
liveness exactly as the reference does (>0 live, ==0 done-not-gathered,
-1 gathered), and the bounce loop is a lax.scan (differentiable) or
lax.while_loop (forward-only, early-exits when every path has terminated —
the analogue of the reference's `num_paths == 0` exit at pathtrace.cu:882-889).

In masked mode lane index == pixel index, so the per-bounce image gather
(gatherImage, pathtrace.cu:574-589) is a pure elementwise select-add — no
scatter at all. Accumulation contract matches the reference: the image is a
running SUM over iterations; display/save divides by the iteration count
(pathtrace.cu:88-90, main.cpp:395-417).

All per-ray state is component-SoA (Vec3 of [N]) — see utils/vec.py for why.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import rng
from ..ops.bsdf import shade
from ..ops.camera import generate_camera_rays
from ..ops.intersect import intersect_scene
from ..scene.types import RenderSettings, SceneArrays
from ..utils.vec import Vec3


class PathState(NamedTuple):
    origin: Vec3                    # [N] x3
    direction: Vec3                 # [N] x3
    color: Vec3                     # [N] x3 running throughput
    remaining_bounces: jnp.ndarray  # [N] i32


def generate_paths(scene: SceneArrays, settings: RenderSettings,
                   iter_key: jax.Array, n: int | None = None,
                   pixel_offset=0) -> PathState:
    """Camera raygen -> fresh path pool (generateRayFromCamera,
    pathtrace.cu:260-322). `n`/`pixel_offset` support sharded local blocks."""
    if n is None:
        n = settings.pixel_count
    k_jit, k_dof = jax.random.split(jax.random.fold_in(iter_key, 0x5EED))
    jitter = rng.normals(k_jit, n, 2) if settings.jitter else None
    dof_u = rng.uniforms(k_dof, n, 2) if settings.dof else None
    origin, direction = generate_camera_rays(
        scene.camera, settings.width, settings.height, jitter, dof_u,
        n=n, pixel_offset=pixel_offset)
    one = jnp.ones((n,), dtype=jnp.float32)
    return PathState(
        origin=origin,
        direction=direction,
        color=Vec3(one, one, one),
        remaining_bounces=jnp.full((n,), settings.trace_depth, dtype=jnp.int32),
    )


def bounce_step(scene: SceneArrays, settings: RenderSettings,
                iter_key: jax.Array, depth: jnp.ndarray,
                state: PathState, image: Vec3) -> Tuple[PathState, Vec3]:
    """One bounce: intersect -> shade -> gather (pathtrace.cu:752-894 body)."""
    n = state.origin.x.shape[0]
    t, normal, mat_id = intersect_scene(
        scene, settings.geom_types, state.origin, state.direction)

    u = rng.uniforms(rng.bounce_key(iter_key, depth), n, 4)
    origin, direction, color, rb = shade(
        state.origin, state.direction, state.color, state.remaining_bounces,
        t, normal, mat_id, scene.materials, u)

    # gatherImage: add lanes whose remaining_bounces just reached 0, then mark
    # them gathered (-1) so they are skipped and never double-added
    # (pathtrace.cu:574-589 with the !STREAM_COMPACT marker semantics).
    newly_done = rb == 0
    zero = Vec3.zeros((n,))
    image = image + Vec3.where(newly_done, color, zero)
    rb = jnp.where(newly_done, -1, rb)

    return PathState(origin, direction, color, rb), image


def render_iteration(scene: SceneArrays, settings: RenderSettings,
                     accum: Vec3, iteration: jnp.ndarray,
                     seed: int = 0, early_exit: bool = False,
                     pixel_offset=0, key_salt=None) -> Vec3:
    """One progressive-render iteration: raygen + full bounce loop.

    Args:
      accum: Vec3 of [N] running sum image (donated by callers). N may be a
        local shard of the pixel pool (then pass pixel_offset).
      iteration: scalar int iteration counter (seeds the RNG stream).
      early_exit: use a while_loop that stops when all paths are terminated
        (forward-only; not reverse-differentiable). When False, a lax.scan over
        trace_depth bounces is used, which jax.grad can differentiate.
      pixel_offset: global pixel index of accum's first lane (sharded callers).
      key_salt: extra value folded into the RNG key (e.g. shard index, so each
        shard draws an independent stream).

    Returns the updated accumulation image.
    """
    iter_key = rng.iteration_key(seed, iteration)
    if key_salt is not None:
        iter_key = jax.random.fold_in(iter_key, key_salt)
    n = accum.x.shape[0]
    state = generate_paths(scene, settings, iter_key, n=n,
                           pixel_offset=pixel_offset)

    if early_exit:
        def cond(carry):
            depth, state, _ = carry
            return jnp.logical_and(depth < settings.trace_depth,
                                   jnp.any(state.remaining_bounces > 0))

        def body(carry):
            depth, state, image = carry
            state, image = bounce_step(scene, settings, iter_key, depth,
                                       state, image)
            return depth + 1, state, image

        _, _, accum = jax.lax.while_loop(
            cond, body, (jnp.int32(0), state, accum))
        return accum

    def scan_body(carry, depth):
        state, image = carry
        state, image = bounce_step(scene, settings, iter_key, depth,
                                   state, image)
        return (state, image), None

    (_, accum), _ = jax.lax.scan(
        scan_body, (state, accum),
        jnp.arange(settings.trace_depth, dtype=jnp.int32))
    return accum


@partial(jax.jit, static_argnames=("settings", "n_iters", "seed", "early_exit"),
         donate_argnames=("accum",))
def render_chunk(scene: SceneArrays, settings: RenderSettings,
                 accum: Vec3, start_iteration: jnp.ndarray,
                 n_iters: int, seed: int = 0,
                 early_exit: bool = True) -> Vec3:
    """Run `n_iters` progressive iterations inside one compiled program.

    Batching iterations into one jit amortizes dispatch overhead — the
    TPU analogue of the reference's per-frame pathtrace() calls from runCuda
    (main.cpp:454-472) without a host round-trip per frame.
    """
    def body(accum, k):
        it = start_iteration + k
        accum = render_iteration(scene, settings, accum, it, seed=seed,
                                 early_exit=early_exit)
        return accum, None

    accum, _ = jax.lax.scan(body, accum, jnp.arange(n_iters, dtype=jnp.int32))
    return accum


def zero_accum(settings: RenderSettings) -> Vec3:
    return Vec3.zeros((settings.pixel_count,))


def render(scene: SceneArrays, settings: RenderSettings,
           iterations: int | None = None, seed: int = 0,
           chunk: int = 16, early_exit: bool = True,
           accum: Vec3 | None = None,
           start_iteration: int = 0,
           progress=None) -> jnp.ndarray:
    """Full progressive render; returns the AVERAGED image [H,W,3].

    The running-sum accumulation restarts/resumes exactly like the reference's
    dev_image (progressive accumulation; restartable from a checkpoint of
    (accum, iteration) — SURVEY.md §5 checkpoint/resume).
    """
    n_total = settings.iterations if iterations is None else iterations
    if accum is None:
        accum = zero_accum(settings)
    done = start_iteration
    while done < start_iteration + n_total:
        this = min(chunk, start_iteration + n_total - done)
        accum = render_chunk(scene, settings, accum,
                             jnp.int32(done + 1),  # runCuda uses ++iteration
                             this, seed, early_exit)
        done += this
        if progress is not None:
            progress(done, accum)
    avg = accum * (1.0 / jnp.float32(start_iteration + n_total))
    return avg.to_array().reshape(settings.height, settings.width, 3)
