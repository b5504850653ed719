"""Mesh IO: PLY (ascii + binary), OBJ, and bare-mesh scene loading.

Reference behavior: R3Scene::ReadFile dispatches on extension
(R3Scene.cpp:515-560); meshes are fan-triangulated into R3TriangleArray
(ReadMesh R3Scene.cpp:1360-1395)."""

import numpy as np
import pytest

from gi_tpu.scene.mesh_io import read_mesh, read_obj, read_ply, write_ply
from gi_tpu.scene.off import read_off
from gi_tpu.scene.scn import load_scene

CUBE_OFF = "/root/reference/input/cube.off"


@pytest.fixture
def cube():
    return read_off(CUBE_OFF)


def test_ply_binary_roundtrip(tmp_path, cube):
    v, f = cube
    p = str(tmp_path / "cube.ply")
    write_ply(p, v, f)
    v2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_ply_ascii(tmp_path, cube):
    v, f = cube
    lines = ["ply", "format ascii 1.0",
             f"element vertex {len(v)}",
             "property float x", "property float y", "property float z",
             f"element face {len(f)}",
             "property list uchar int vertex_indices", "end_header"]
    for p3 in v:
        lines.append(" ".join(f"{x:.9g}" for x in p3))
    for tri in f:
        lines.append("3 " + " ".join(str(i) for i in tri))
    p = str(tmp_path / "cube_ascii.ply")
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    v2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_ply_quad_triangulation(tmp_path):
    """Quads fan-triangulate exactly as the .off path does."""
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    p = str(tmp_path / "quad.ply")
    with open(p, "w") as fh:
        fh.write("ply\nformat ascii 1.0\nelement vertex 4\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "element face 1\n"
                 "property list uchar int vertex_indices\nend_header\n")
        for p3 in v:
            fh.write(" ".join(str(x) for x in p3) + "\n")
        fh.write("4 0 1 2 3\n")
    v2, f2 = read_ply(p)
    np.testing.assert_array_equal(f2, [[0, 1, 2], [0, 2, 3]])


def test_obj(tmp_path):
    p = str(tmp_path / "t.obj")
    with open(p, "w") as fh:
        fh.write("""
# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
usemtl red
f 1 2 3
f 1/2/3 3//1 4/5
usemtl blue
f -4 -3 -2
""")
    v, f, g = read_obj(p)
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3], [0, 1, 2]])
    np.testing.assert_array_equal(g, [0, 0, 1])


def test_read_mesh_dispatch(tmp_path, cube):
    v, f = cube
    p = str(tmp_path / "cube.ply")
    write_ply(p, v, f)
    v2, f2 = read_mesh(p)
    assert f2.shape == f.shape
    v3, f3 = read_mesh(CUBE_OFF)
    assert f3.shape == f.shape


def test_load_bare_mesh_scene(tmp_path, cube):
    """A bare mesh loads as a default-lit renderable scene."""
    v, f = cube
    p = str(tmp_path / "cube.ply")
    write_ply(p, v, f)
    scene = load_scene(p)
    assert scene.tris.v0.shape[0] == f.shape[0]
    assert scene.n_lights == 1

    # it actually renders: center pixels hit the cube
    from gi_tpu.models.render import render_image
    from gi_tpu.utils.config import RenderConfig
    cfg = RenderConfig(width=16, height=16, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       soft_shadows=False, ray_tile=256)
    img = render_image(scene, cfg)
    assert img.shape == (16, 16, 3)
    assert img[8, 8].sum() > 0.05


def test_obj_with_mtl_materials(tmp_path):
    """OBJ + MTL scenes load with per-face materials (reference
    ReadObjFile + ReadObjMtlFile, R3Scene.cpp:699-1130)."""
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKa 0.1 0 0\nKd 0.9 0.1 0.1\nNs 25\n"
        "newmtl glass\nKd 0 0 0\nKs 0.1 0.1 0.1\nTr 0.95\nNi 1.5\n")
    (tmp_path / "two.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "usemtl red\nf 1 2 3\n"
        "usemtl glass\nf 2 4 3\n"
        "usemtl unknown\nf 1 3 4\n")
    from gi_tpu.scene.scn import load_scene
    scene = load_scene(str(tmp_path / "two.obj"))
    assert scene.tris.v0.shape[0] == 3
    mats = scene.materials
    kd = np.asarray(mats.kd)
    kt = np.asarray(mats.kt)
    ir = np.asarray(mats.ir)
    tri_mats = np.asarray(scene.tris.mat)
    # one face red-diffuse, one transparent glass (Tr + Ni), one default
    assert any(np.allclose(kd[m], [0.9, 0.1, 0.1]) for m in tri_mats)
    glass = [m for m in tri_mats if np.allclose(kt[m], [0.95] * 3)]
    assert len(glass) == 1 and np.isclose(ir[glass[0]], 1.5)
    default = [m for m in tri_mats if np.allclose(kd[m], [0.7] * 3)]
    assert len(default) == 1
