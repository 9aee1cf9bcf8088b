"""OBJ/MTL loader tests (reference loadFromOBJ semantics, scene.cpp:261-431)."""
import numpy as np

from pathtracer_tpu.scene.obj import load_obj

CUBE_OBJ = """
# two triangles of a quad, with normals
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
f 1//1 3//1 4//1
"""

QUAD_OBJ = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
"""

MTL_OBJ = """
mtllib mat.mtl
v 0 0 0
v 1 0 0
v 0 1 0
usemtl red
f 1 2 3
usemtl glow
f 3 2 1
"""

MTL_FILE = """
newmtl red
Kd 0.8 0.1 0.1
newmtl glow
Kd 1 1 1
Ke 2 2 1
newmtl glassy
Kd 1 1 1
Ks 0.5 0.5 0.5
Ni 1.5
Ns 96
"""


def test_triangles_with_normals(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(CUBE_OBJ)
    mats = []
    t = load_obj(str(p), -1, (0, 0, 0), (0, 0, 0), (1, 1, 1), mats)
    assert t["v0"].shape == (2, 3)
    np.testing.assert_allclose(t["n0"], [[0, 0, 1]] * 2)
    # no MTL + no override -> one shared grey default material appended
    assert len(mats) == 1
    np.testing.assert_allclose(mats[0]["color"], (0.5, 0.5, 0.5))


def test_fan_triangulation(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text(QUAD_OBJ)
    mats = []
    t = load_obj(str(p), 7, (0, 0, 0), (0, 0, 0), (1, 1, 1), mats)
    assert t["v0"].shape == (2, 3)          # quad -> 2 triangles
    assert (t["material_id"] == 7).all()    # JSON override wins
    assert mats == []                        # override -> no default appended
    # face-normal fallback: +z for CCW quad in z=0 plane
    np.testing.assert_allclose(t["n1"], [[0, 0, 1]] * 2, atol=1e-6)


def test_world_space_bake(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(CUBE_OBJ)
    t = load_obj(str(p), 0, (10, 0, 0), (0, 0, 0), (2, 2, 2), [])
    # vertex (1,0,0) -> scaled (2,0,0) -> translated (12,0,0)
    np.testing.assert_allclose(t["v1"][0], [12, 0, 0], atol=1e-6)


def test_negative_scale_inverts_winding(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(CUBE_OBJ)
    t = load_obj(str(p), 0, (0, 0, 0), (0, 0, 0), (-1, 1, 1), [])
    # winding flip swaps v1/v2: face normal of baked tri still consistent
    a = t["v0"][0]
    e1 = t["v1"][0] - a
    e2 = t["v2"][0] - a
    n = np.cross(e1, e2)
    # normals transformed by inverse-transpose: x flips -> still +z after
    # winding swap keeps geometric normal aligned with shading normal
    assert np.dot(n, t["n0"][0]) > 0


def test_mtl_materials(tmp_path):
    (tmp_path / "mat.mtl").write_text(MTL_FILE)
    p = tmp_path / "m.obj"
    p.write_text(MTL_OBJ)
    mats = []
    t = load_obj(str(p), -1, (0, 0, 0), (0, 0, 0), (1, 1, 1), mats)
    assert len(mats) == 3
    red = next(m for m in mats if m["color"] == (0.8, 0.1, 0.1))
    assert red["emittance"] == 0.0
    glow = next(m for m in mats if m["emittance"] > 0)
    assert glow["emittance"] == np.linalg.norm([2, 2, 1])
    glassy = [m for m in mats if m["has_refractive"] > 0]
    assert len(glassy) == 1 and glassy[0]["ior"] == 1.5
    assert glassy[0]["has_reflective"] == 1.0
    assert glassy[0]["specular_exponent"] == 96
    # per-face assignment: faces got the two different usemtl ids
    assert t["material_id"][0] != t["material_id"][1]


def test_missing_normals_face_fallback(tmp_path):
    """OBJ without vn entries: per-face geometric normals (scene.cpp:382-385).
    All three corner normals equal the face normal."""
    p = tmp_path / "nonorm.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    tris = load_obj(str(p), -1, (0, 0, 0), (0, 0, 0), (1, 1, 1), [])
    assert tris["v0"].shape[0] == 1
    for k in ("n0", "n1", "n2"):
        np.testing.assert_allclose(tris[k][0], [0, 0, 1], atol=1e-6)


def test_cow_nonormals_loads():
    """The reference's cow-nonormals.obj (5804 tris, no vn): exercises the
    face-normal fallback at scale (BASELINE.md mesh table)."""
    import os

    from pathtracer_tpu.scene.fixtures import model_path
    path = model_path("cow-nonormals.obj")
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference models unavailable")
    tris = load_obj(path, 0, (0, 0, 0), (0, 0, 0), (1, 1, 1), [])
    assert tris["v0"].shape[0] == 5804
    # every normal is unit-length (face normals)
    for k in ("n0", "n1", "n2"):
        lens = np.linalg.norm(tris[k], axis=1)
        np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    # corners of each face share the same (face) normal
    np.testing.assert_allclose(tris["n0"], tris["n1"], atol=1e-6)
