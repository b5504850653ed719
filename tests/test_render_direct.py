"""End-to-end direct-illumination slice: cornell.scn matches reference
structure (BASELINE.json config #1: direct only, no indirect/caustic, aa=0).
"""

import numpy as np
import pytest

from gi_tpu.models.render import render_image
from gi_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def cornell_direct(cornell_scene):
    cfg = RenderConfig(width=64, height=64, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       ray_tile=4096)
    return render_image(cornell_scene, cfg)


def test_wall_colors(cornell_direct):
    img = cornell_direct  # [H,W,3], row 0 bottom
    left = img[20:44, 1:4].mean(axis=(0, 1))
    right = img[20:44, 60:63].mean(axis=(0, 1))
    # left wall material kd=(0,0.5,0.8) (blue-cyan), right kd=(0.8,0,0)
    assert left[2] > left[0] + 0.1, f"left wall should be blue: {left}"
    assert right[0] > right[2] + 0.1, f"right wall should be red: {right}"


def test_shadow_under_sphere(cornell_direct):
    img = cornell_direct
    # sphere at (0.2, 0.151, 0.55) -> right half of image, lower area.
    # floor left of center should be brighter than the sphere shadow zone
    open_floor = img[8:12, 24:30].mean()
    # the sphere occludes light around x~0.2 => columns ~ 40-52
    shadow = img[4:7, 44:52].mean()
    assert open_floor > shadow + 0.05


def test_background_miss():
    # empty-ish scene: rays that miss return background color
    from gi_tpu.scene.scn import load_scene
    s = load_scene("/root/reference/input/dirlight1.scn")
    cfg = RenderConfig(width=32, height=32, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False, ray_tile=1024)
    img = render_image(s, cfg)
    assert np.isfinite(img).all()


def test_deterministic(cornell_scene):
    cfg = RenderConfig(width=16, height=16, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False, ray_tile=256)
    a = render_image(cornell_scene, cfg)
    b = render_image(cornell_scene, cfg)
    np.testing.assert_array_equal(a, b)
