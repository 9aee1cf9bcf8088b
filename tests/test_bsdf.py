"""Unit tests: BSDF sampling distributions and scatter branch semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.ops.bsdf import (LaneMaterials, cosine_hemisphere,
                                     fresnel_schlick, gather_material, reflect,
                                     refract, scatter_ray, shade)
from pathtracer_tpu.scene.types import MaterialArrays
from pathtracer_tpu.utils.vec import Vec3


def vec_const(n, v):
    return Vec3(jnp.full((n,), v[0], jnp.float32),
                jnp.full((n,), v[1], jnp.float32),
                jnp.full((n,), v[2], jnp.float32))


def to_np(v: Vec3):
    return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], -1)


def test_cosine_hemisphere_distribution():
    n = 200_000
    key = jax.random.key(0)
    u = jax.random.uniform(key, (n, 2))
    normal = vec_const(n, (0.0, 0.0, 1.0))
    d = cosine_hemisphere(normal, u[:, 0], u[:, 1])
    dn = to_np(d)
    # unit length
    np.testing.assert_allclose(np.linalg.norm(dn, axis=1), 1.0, atol=1e-4)
    # all in upper hemisphere
    assert (dn[:, 2] >= 0).all()
    # cosine-weighted: E[cos theta] = 2/3, E[cos^2] = 1/2
    assert abs(dn[:, 2].mean() - 2.0 / 3.0) < 5e-3
    assert abs((dn[:, 2] ** 2).mean() - 0.5) < 5e-3
    # azimuthal symmetry
    assert abs(dn[:, 0].mean()) < 5e-3 and abs(dn[:, 1].mean()) < 5e-3


def test_cosine_hemisphere_arbitrary_normal():
    n = 50_000
    u = jax.random.uniform(jax.random.key(1), (n, 2))
    nrm = np.array([1.0, 2.0, -0.5])
    nrm /= np.linalg.norm(nrm)
    d = cosine_hemisphere(vec_const(n, nrm), u[:, 0], u[:, 1])
    dn = to_np(d)
    cos = dn @ nrm
    assert (cos >= -1e-6).all()
    assert abs(cos.mean() - 2.0 / 3.0) < 6e-3


def test_fresnel_schlick_limits():
    # normal incidence: r0 = ((1-1.5)/(2.5))^2 = 0.04
    assert float(fresnel_schlick(jnp.float32(1.0), 1.0, 1.5)) == pytest.approx(
        0.04, abs=1e-6)
    # grazing: -> 1
    assert float(fresnel_schlick(jnp.float32(0.0), 1.0, 1.5)) == pytest.approx(
        1.0, abs=1e-6)


def test_reflect_refract_glm_semantics():
    n = 1
    i = vec_const(n, np.array([1.0, -1.0, 0.0]) / np.sqrt(2))
    nrm = vec_const(n, (0.0, 1.0, 0.0))
    r = to_np(reflect(i, nrm))[0]
    np.testing.assert_allclose(r, np.array([1.0, 1.0, 0.0]) / np.sqrt(2),
                               atol=1e-6)
    # refraction into denser medium bends toward normal
    t = to_np(refract(i, nrm, jnp.full((n,), 1.0 / 1.5, jnp.float32)))[0]
    sin_in = 1.0 / np.sqrt(2)
    sin_out = abs(t[0]) / np.linalg.norm(t)
    assert sin_out == pytest.approx(sin_in / 1.5, abs=1e-5)
    # TIR: from dense to sparse at grazing angle -> zero vector
    i2 = vec_const(n, np.array([0.9, -np.sqrt(1 - 0.81), 0.0]))
    t2 = to_np(refract(i2, nrm, jnp.full((n,), 1.5, jnp.float32)))[0]
    np.testing.assert_allclose(t2, 0.0, atol=1e-7)


def _materials():
    """diffuse red / mirror / glass / light."""
    return MaterialArrays(
        color=jnp.array([[0.8, 0.2, 0.2], [0.98, 0.98, 0.98],
                         [1.0, 1.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32),
        specular_color=jnp.array([[0, 0, 0], [1.0, 1.0, 1.0],
                                  [1.0, 1.0, 1.0], [0, 0, 0]], jnp.float32),
        specular_exponent=jnp.zeros((4,), jnp.float32),
        has_reflective=jnp.array([0.0, 1.0, 1.0, 0.0], jnp.float32),
        has_refractive=jnp.array([0.0, 0.0, 1.0, 0.0], jnp.float32),
        ior=jnp.array([0.0, 0.0, 1.5, 0.0], jnp.float32),
        emittance=jnp.array([0.0, 0.0, 0.0, 5.0], jnp.float32),
    )


def test_gather_material_select_chain():
    mats = _materials()
    mid = jnp.array([0, 1, 2, 3, 2, 0], jnp.int32)
    m = gather_material(mats, mid)
    np.testing.assert_allclose(np.asarray(m.emittance),
                               [0, 0, 0, 5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.color.x),
                               [0.8, 0.98, 1, 1, 1, 0.8], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.ior), [0, 0, 1.5, 0, 1.5, 0],
                               atol=1e-6)


def test_scatter_diffuse_multiplies_albedo():
    n = 8
    mats = _materials()
    m = gather_material(mats, jnp.zeros((n,), jnp.int32))
    d = vec_const(n, (0.0, 0.0, -1.0))
    hit = vec_const(n, (0.0, 0.0, 0.0))
    nrm = vec_const(n, (0.0, 0.0, 1.0))
    u = jnp.full((n,), 0.5, jnp.float32)
    res = scatter_ray(d, hit, nrm, m, u, u, u, u)
    thr = to_np(res.throughput)
    np.testing.assert_allclose(thr, np.tile([0.8, 0.2, 0.2], (n, 1)), atol=1e-6)
    # origin offset along the normal
    np.testing.assert_allclose(np.asarray(res.origin.z), 1e-3, atol=1e-9)
    # scattered directions in the upper hemisphere
    assert (np.asarray(res.direction.z) >= 0).all()


def test_scatter_mirror_reflects():
    n = 4
    mats = _materials()
    m = gather_material(mats, jnp.ones((n,), jnp.int32))
    d = vec_const(n, np.array([1.0, 0.0, -1.0]) / np.sqrt(2))
    hit = vec_const(n, (0.0, 0.0, 0.0))
    nrm = vec_const(n, (0.0, 0.0, 1.0))
    # u_pick = 0.99 -> specular branch (p_diffuse ~ 1/6 for white+roughness 0)
    res = scatter_ray(d, hit, nrm, m,
                      jnp.full((n,), 0.99, jnp.float32),
                      jnp.full((n,), 0.5, jnp.float32),
                      jnp.full((n,), 0.5, jnp.float32),
                      jnp.full((n,), 0.5, jnp.float32))
    dirs = to_np(res.direction)
    np.testing.assert_allclose(dirs, np.tile([1 / np.sqrt(2), 0, 1 / np.sqrt(2)],
                                             (n, 1)), atol=1e-5)
    # u_pick = 0.01 -> diffuse branch
    res2 = scatter_ray(d, hit, nrm, m,
                       jnp.full((n,), 0.01, jnp.float32),
                       jnp.full((n,), 0.5, jnp.float32),
                       jnp.full((n,), 0.5, jnp.float32),
                       jnp.full((n,), 0.5, jnp.float32))
    np.testing.assert_allclose(to_np(res2.throughput),
                               np.tile([0.98, 0.98, 0.98], (n, 1)), atol=1e-6)


def test_scatter_refractive_entering():
    n = 2
    mats = _materials()
    m = gather_material(mats, jnp.full((n,), 2, jnp.int32))
    d = vec_const(n, np.array([0.5, 0.0, -np.sqrt(0.75)]))
    hit = vec_const(n, (0.0, 0.0, 0.0))
    nrm = vec_const(n, (0.0, 0.0, 1.0))
    # u_fresnel = 0.99 -> transmit (reflectProb at ~30deg, n=1.5 is ~0.04-0.06)
    res = scatter_ray(d, hit, nrm, m,
                      jnp.full((n,), 0.5, jnp.float32),
                      jnp.full((n,), 0.5, jnp.float32),
                      jnp.full((n,), 0.5, jnp.float32),
                      jnp.full((n,), 0.99, jnp.float32))
    dirs = to_np(res.direction)
    # Snell: sin_out = sin_in / 1.5
    assert abs(dirs[0, 0]) == pytest.approx(0.5 / 1.5, abs=1e-4)
    assert dirs[0, 2] < 0  # continues downward
    # transmit exits BELOW surface (origin = hit - n*eps)
    assert float(res.origin.z[0]) == pytest.approx(-1e-3, abs=1e-8)
    # u_fresnel = 0.0 -> reflect
    res2 = scatter_ray(d, hit, nrm, m,
                       jnp.full((n,), 0.5, jnp.float32),
                       jnp.full((n,), 0.5, jnp.float32),
                       jnp.full((n,), 0.5, jnp.float32),
                       jnp.full((n,), 0.0, jnp.float32))
    assert float(res2.direction.z[0]) > 0
    assert float(res2.origin.z[0]) == pytest.approx(1e-3, abs=1e-8)


def test_shade_termination_semantics():
    """Reference termination: emissive -> *=albedo*emittance & stop; miss ->
    black & stop; scatter decrements remaining_bounces (pathtrace.cu:524-571)."""
    n = 4
    mats = _materials()
    origin = vec_const(n, (0, 0, 5))
    direction = vec_const(n, (0, 0, -1))
    color = vec_const(n, (0.5, 0.5, 0.5))
    rb = jnp.array([3, 3, 3, 0], jnp.int32)
    t = jnp.array([1.0, 1.0, -1.0, 1.0], jnp.float32)
    normal = vec_const(n, (0, 0, 1))
    mat_id = jnp.array([3, 0, 0, 3], jnp.int32)  # light, diffuse, n/a, light
    u = tuple(jnp.full((n,), 0.5, jnp.float32) for _ in range(4))
    o2, d2, c2, rb2 = shade(origin, direction, color, rb, t, normal, mat_id,
                            mats, u)
    c = to_np(c2)
    np.testing.assert_allclose(c[0], [2.5, 2.5, 2.5], atol=1e-6)  # 0.5*1*5
    np.testing.assert_allclose(c[1], [0.4, 0.1, 0.1], atol=1e-6)  # *albedo
    np.testing.assert_allclose(c[2], [0.0, 0.0, 0.0], atol=1e-6)  # miss
    np.testing.assert_allclose(c[3], [0.5, 0.5, 0.5], atol=1e-6)  # inactive
    assert np.asarray(rb2).tolist() == [0, 2, 0, 0]
