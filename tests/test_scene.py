"""Scene compiler tests: parse every bundled reference scene."""

import glob
import os

import numpy as np
import pytest

from gi_tpu.scene.scn import load_scene
from gi_tpu.scene.types import LIGHT_POINT

SCN_DIR = "/root/reference/input"
ALL_SCENES = sorted(os.path.basename(p) for p in glob.glob(f"{SCN_DIR}/*.scn"))


def test_cornell_contents(cornell_scene):
    s = cornell_scene
    n = s.n_prims
    assert n["tris"] == 10
    assert n["spheres"] == 1
    # 4 materials + default slot
    assert s.materials.kd.shape[0] == 5
    assert s.n_lights == 1
    assert int(s.lights.kind[0]) == LIGHT_POINT
    np.testing.assert_allclose(
        np.asarray(s.lights.position[0]), [0.556, 0.9, 0.559], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.camera.eye),
                               [0.556, 0.546, -1.6], atol=1e-6)
    assert abs(float(s.camera.xfov) - 0.329) < 1e-6
    # glass sphere material: kt=1, ir=1.372, shininess=5000
    sm = int(s.spheres.mat[0])
    np.testing.assert_allclose(np.asarray(s.materials.kt[sm]), [1, 1, 1])
    assert abs(float(s.materials.ir[sm]) - 1.372) < 1e-6
    # scene bbox radius ~ half diagonal of the box ~0.94..2
    assert 0.5 < float(s.radius) < 2.5


@pytest.mark.parametrize("name", ALL_SCENES)
def test_parse_all_bundled_scenes(name):
    s = load_scene(os.path.join(SCN_DIR, name))
    total = sum(s.n_prims.values())
    assert total > 0, f"{name}: no primitives"
    assert np.isfinite(np.asarray(s.tris.v0)).all()
    assert float(s.radius) > 0


def test_camera_frame_orthonormal(cornell_scene):
    c = cornell_scene.camera
    t, u, r = (np.asarray(c.towards), np.asarray(c.up), np.asarray(c.right))
    for v in (t, u, r):
        assert abs(np.linalg.norm(v) - 1) < 1e-6
    assert abs(t @ u) < 1e-6
    assert abs(t @ r) < 1e-6
    np.testing.assert_allclose(np.cross(t, u), r, atol=1e-6)


def test_transform_scene_spheres():
    # transform.scn: 7 spheres under translation groups (similarity transforms
    # keep spheres analytic)
    s = load_scene(os.path.join(SCN_DIR, "transform.scn"))
    assert s.n_prims["spheres"] >= 7


def test_real_material_normalization():
    s = load_scene(os.path.join(SCN_DIR, "cornell.scn"), real_material=True)
    total = (np.asarray(s.materials.kd) + np.asarray(s.materials.ks)
             + np.asarray(s.materials.kt))
    assert total.max() <= 1.0 + 1e-6
