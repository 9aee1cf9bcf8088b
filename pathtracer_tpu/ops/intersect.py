"""Ray-primitive intersection ops, vectorized over the ray pool (Vec3 SoA).

Replicates the device library in reference src/intersections.cu:
  - box_intersect:      boxIntersectionTest    (:3-57)   unit cube, object space
  - sphere_intersect:   sphereIntersectionTest (:59-113) r=0.5, object space
  - aabb_intersect:     aabbIntersect          (:116-129) slab test
  - triangle_intersect: triangleIntersect      (:132-163) Moller-Trumbore
  - mesh_intersect:     meshIntersectionTest   (:167-213) iterative BVH walk

All functions take Vec3-of-[N] ray SoA and return world-space hit distance t
(t <= 0 encodes a miss, matching the reference's -1 convention) plus normals.
The world-distance return convention is preserved, but computed directly as
the world-ray parameter (unnormalized object-space directions) instead of the
reference's normalize -> hit-point transform -> length() chain, and without
the 1e-4 getPointOnRay backoff (intersections.h:28-30) — see the per-function
docstrings for the algebra and why the difference is below image tolerance.

The scene-level dispatch (reference computeIntersectionsNaive,
src/pathtrace.cu:441-522) lives in `intersect_scene`: the geom loop unrolls
statically per geom type so XLA fuses every analytic test into one elementwise
pass over the pool; each mesh adds one batched BVH traversal.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..scene.types import CUBE, MESH, SPHERE, SceneArrays
from ..utils.vec import Vec3, mat4_apply

FLT_MAX = jnp.float32(3.402823466e38)
BVH_STACK_SIZE = 64  # intersections.cu:165


def box_intersect(transform, inverse_transform, inv_transpose,
                  origin: Vec3, direction: Vec3
                  ) -> Tuple[jnp.ndarray, Vec3]:
    """Unit-cube intersection for one geom against [N] rays.

    Returns (t [N] world distance, normal Vec3); t<=0 on miss.
    Mirrors boxIntersectionTest (intersections.cu:3-57) including raw division
    (inf on axis-parallel rays) and the inside-hit tmax fallback, with one
    TPU-minded algebraic change: the object-space direction is NOT normalized,
    so the slab parameter t is directly the world-ray parameter
    (M(qo + qd·t) = o + d·t) and the reference's normalize + hit-point
    transform + length() world-distance recompute (intersections.cu:8,49-52)
    — an rsqrt, a mat4 apply, and a sqrt per geom per ray — all drop out. The
    reference's 1e-4 object-space hit backoff (getPointOnRay,
    intersections.h:28-30) is also dropped: t is exact; self-intersection is
    prevented by SCATTER_EPS in the shader, and the difference (~1e-4·scale)
    is far below Monte Carlo image tolerance.
    """
    qo = mat4_apply(inverse_transform, origin, 1.0)
    qd = mat4_apply(inverse_transform, direction, 0.0)

    neg = FLT_MAX
    tmin = jnp.full_like(qo.x, -neg)
    tmax = jnp.full_like(qo.x, neg)
    # Normal = +-axis one-hot, tracked componentwise (reference loop :18-40)
    nmin = Vec3.zeros(qo.x.shape, qo.x.dtype)
    nmax = Vec3.zeros(qo.x.shape, qo.x.dtype)
    axes = [Vec3(jnp.float32(1), jnp.float32(0), jnp.float32(0)),
            Vec3(jnp.float32(0), jnp.float32(1), jnp.float32(0)),
            Vec3(jnp.float32(0), jnp.float32(0), jnp.float32(1))]
    for oc, dc, axis in ((qo.x, qd.x, 0), (qo.y, qd.y, 1), (qo.z, qd.z, 2)):
        t1 = (-0.5 - oc) / dc
        t2 = (0.5 - oc) / dc
        ta = jnp.minimum(t1, t2)
        tb = jnp.maximum(t1, t2)
        sgn = jnp.where(t2 < t1, 1.0, -1.0)
        upd_min = jnp.logical_and(ta > 0.0, ta > tmin)
        tmin = jnp.where(upd_min, ta, tmin)
        e = axes[axis]
        n_ax = Vec3(e.x * sgn, e.y * sgn, e.z * sgn)
        nmin = Vec3.where(upd_min, n_ax, nmin)
        upd_max = tb < tmax
        tmax = jnp.where(upd_max, tb, tmax)
        nmax = Vec3.where(upd_max, n_ax, nmax)

    hit = jnp.logical_and(tmax >= tmin, tmax > 0.0)
    inside = tmin <= 0.0
    t_world = jnp.where(inside, tmax, tmin)  # world parameter directly
    n_obj = Vec3.where(inside, nmax, nmin)

    normal = mat4_apply(inv_transpose, n_obj, 0.0).normalize()
    return jnp.where(hit, t_world, -1.0), normal


def sphere_intersect(transform, inverse_transform, inv_transpose,
                     origin: Vec3, direction: Vec3
                     ) -> Tuple[jnp.ndarray, Vec3]:
    """r=0.5 sphere for one geom against [N] rays (intersections.cu:59-113).

    Like box_intersect, the object-space direction is left unnormalized
    (full quadratic a·t² + 2b·t + c = 0 instead of the reference's monic
    form) so t is the world-ray parameter directly — no normalize, no
    hit-point transform, no world-distance length() (intersections.cu:64,
    104-108), no 1e-4 backoff.
    """
    radius = 0.5
    ro = mat4_apply(inverse_transform, origin, 1.0)
    rd = mat4_apply(inverse_transform, direction, 0.0)

    a = rd.dot(rd)
    b = ro.dot(rd)
    c = ro.dot(ro) - radius * radius
    radicand = b * b - a * c
    has_root = radicand >= 0.0
    sq = jnp.sqrt(jnp.maximum(radicand, 0.0))
    inv_a = 1.0 / a
    t1 = (-b + sq) * inv_a
    t2 = (-b - sq) * inv_a

    both_neg = jnp.logical_and(t1 < 0.0, t2 < 0.0)
    both_pos = jnp.logical_and(t1 > 0.0, t2 > 0.0)
    t_world = jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2))
    outside = both_pos
    hit = jnp.logical_and(has_root, jnp.logical_not(both_neg))

    p_obj = ro + rd * t_world
    normal = mat4_apply(inv_transpose, p_obj, 0.0).normalize()
    flip = jnp.where(outside, 1.0, -1.0)
    normal = normal * flip
    return jnp.where(hit, t_world, -1.0), normal


def aabb_intersect(bmin: Vec3, bmax: Vec3, origin: Vec3, inv_dir: Vec3
                   ) -> jnp.ndarray:
    """Branchless slab test (intersections.cu:116-129).

    Takes precomputed 1/direction. Returns entry t (exit t if origin inside),
    -1 on miss.
    """
    t_near = (bmin - origin) * inv_dir
    t_far = (bmax - origin) * inv_dir
    t0 = Vec3.minimum(t_near, t_far).max_component()
    t1 = Vec3.maximum(t_near, t_far).min_component()
    return jnp.where(t0 > t1, -1.0,
                     jnp.where(t0 > 0.0, t0,
                               jnp.where(t1 > 0.0, t1, -1.0)))


def triangle_intersect(v0: Vec3, v1: Vec3, v2: Vec3,
                       n0: Vec3, n1: Vec3, n2: Vec3,
                       origin: Vec3, direction: Vec3
                       ) -> Tuple[jnp.ndarray, Vec3]:
    """Moller-Trumbore with smooth normals (intersections.cu:132-163).

    Returns (t, normal) with t = -1 on miss; normal flipped toward the ray.
    """
    eps = 1e-6
    e1 = v1 - v0
    e2 = v2 - v0
    h = direction.cross(e2)
    a = e1.dot(h)
    parallel = jnp.abs(a) < eps
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = origin - v0
    u = f * s.dot(h)
    q = s.cross(e1)
    v = f * direction.dot(q)
    t = f * e2.dot(q)

    valid = jnp.logical_not(parallel)
    valid = jnp.logical_and(valid, jnp.logical_and(u >= 0.0, u <= 1.0))
    valid = jnp.logical_and(valid, jnp.logical_and(v >= 0.0, (u + v) <= 1.0))
    valid = jnp.logical_and(valid, t >= eps)

    w = 1.0 - u - v
    n = (n0 * w + n1 * u + n2 * v).normalize()
    flip = jnp.where(direction.dot(n) > 0.0, -1.0, 1.0)
    n = n * flip
    return jnp.where(valid, t, -1.0), n


def mesh_intersect(scene: SceneArrays, root_node: jnp.ndarray,
                   origin: Vec3, direction: Vec3
                   ) -> Tuple[jnp.ndarray, Vec3, jnp.ndarray]:
    """Batched iterative BVH traversal (meshIntersectionTest,
    intersections.cu:167-213).

    Stack-based DFS with a fixed 64-deep per-ray stack, run as one batched
    while_loop: every live lane pops/pushes its own stack each step; the loop
    exits when all lanes are done. This is the correctness-reference (jnp)
    traversal; the Pallas kernel in ops/bvh_pallas.py supersedes it for perf.

    Replicated reference quirk: the `boxT >= tMin` prune (intersections.cu:188)
    uses aabbIntersect's EXIT t when the ray origin is inside the node's box,
    so a subtree containing a closer hit can occasionally be pruned once some
    farther hit has set tMin. Kept bit-faithful for image parity (affects a
    sub-percent fraction of inside-origin rays; see tests/test_intersect.py).

    Returns (t [N], normal Vec3, material_id [N]); t = -1 on miss.
    """
    n = origin.x.shape[0]
    bvh = scene.bvh
    tris = scene.triangles
    inv_dir = 1.0 / direction

    stack0 = jnp.zeros((n, BVH_STACK_SIZE), dtype=jnp.int32)
    stack0 = stack0.at[:, 0].set(jnp.broadcast_to(root_node, (n,)))
    sp0 = jnp.ones((n,), dtype=jnp.int32)
    t_min0 = jnp.full((n,), FLT_MAX)
    normal0 = Vec3.zeros((n,))
    mat0 = jnp.full((n,), -1, dtype=jnp.int32)

    def cond(state):
        _, sp, _, _, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, t_min, normal, mat = state
        live = sp > 0
        top = jnp.maximum(sp - 1, 0)
        idx = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
        sp_new = jnp.where(live, sp - 1, sp)

        bmin = Vec3(bvh.min_x[idx], bvh.min_y[idx], bvh.min_z[idx])
        bmax = Vec3(bvh.max_x[idx], bvh.max_y[idx], bvh.max_z[idx])
        tri_idx = bvh.tri_idx[idx]
        second = bvh.second_child[idx]

        box_t = aabb_intersect(bmin, bmax, origin, inv_dir)
        visit = jnp.logical_and(live,
                                jnp.logical_and(box_t >= 0.0, box_t < t_min))

        is_leaf = tri_idx >= 0
        ti = jnp.maximum(tri_idx, 0)
        t_tri, n_tri = triangle_intersect(
            tris.vertex("v0", ti), tris.vertex("v1", ti), tris.vertex("v2", ti),
            tris.vertex("n0", ti), tris.vertex("n1", ti), tris.vertex("n2", ti),
            origin, direction)
        closer = jnp.logical_and(t_tri > 0.0, t_tri < t_min)
        upd = jnp.logical_and(visit, jnp.logical_and(is_leaf, closer))
        t_min = jnp.where(upd, t_tri, t_min)
        normal = Vec3.where(upd, n_tri, normal)
        mat = jnp.where(upd, tris.material_id[ti], mat)

        # Interior: push idx+1 and second_child (silently dropped when the
        # stack is full, matching intersections.cu:201-204)
        push = jnp.logical_and(
            visit,
            jnp.logical_and(jnp.logical_not(is_leaf),
                            sp_new + 1 < BVH_STACK_SIZE))
        slot0 = jnp.minimum(sp_new, BVH_STACK_SIZE - 1)
        slot1 = jnp.minimum(sp_new + 1, BVH_STACK_SIZE - 1)
        lane = jnp.arange(n, dtype=jnp.int32)
        cur0 = stack[lane, slot0]
        cur1 = stack[lane, slot1]
        stack = stack.at[lane, slot0].set(jnp.where(push, idx + 1, cur0))
        stack = stack.at[lane, slot1].set(jnp.where(push, second, cur1))
        sp_new = jnp.where(push, sp_new + 2, sp_new)

        return stack, sp_new, t_min, normal, mat

    _, _, t_min, normal, mat = jax.lax.while_loop(
        cond, body, (stack0, sp0, t_min0, normal0, mat0))
    missed = t_min >= FLT_MAX
    return jnp.where(missed, -1.0, t_min), normal, mat


def intersect_scene(scene: SceneArrays, geom_types: Tuple[int, ...],
                    origin: Vec3, direction: Vec3
                    ) -> Tuple[jnp.ndarray, Vec3, jnp.ndarray]:
    """Closest-hit over all geoms (computeIntersectionsNaive,
    pathtrace.cu:441-522).

    `geom_types` is the static per-geom type tuple (from RenderSettings), so
    the geom loop unrolls at trace time.

    Returns (t [N] > 0 on hit else -1, normal Vec3, material_id [N]).
    """
    n = origin.x.shape[0]
    t_best = jnp.full((n,), FLT_MAX)
    n_best = Vec3.zeros((n,))
    m_best = jnp.zeros((n,), dtype=jnp.int32)
    any_hit = jnp.zeros((n,), dtype=bool)

    for i, gt in enumerate(geom_types):
        if gt == MESH:
            t, nrm, mat = mesh_intersect(
                scene, scene.geoms.root_node[i], origin, direction)
        else:
            fn = sphere_intersect if gt == SPHERE else box_intersect
            t, nrm = fn(scene.geoms.transform[i],
                        scene.geoms.inverse_transform[i],
                        scene.geoms.inv_transpose[i],
                        origin, direction)
            mat = jnp.broadcast_to(scene.geoms.material_id[i], (n,))
        upd = jnp.logical_and(t > 0.0, t < t_best)
        t_best = jnp.where(upd, t, t_best)
        n_best = Vec3.where(upd, nrm, n_best)
        m_best = jnp.where(upd, mat, m_best)
        any_hit = jnp.logical_or(any_hit, upd)

    t_out = jnp.where(any_hit, t_best, -1.0)
    return t_out, n_best, m_best
