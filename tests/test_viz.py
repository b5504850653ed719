"""Headless visualizer (gi_tpu.viz / gi_tpu.visualize — the reference's GLUT
viewer visualize.cpp re-expressed as matplotlib PNG overlays)."""

import os

import numpy as np

from gi_tpu.scene.scn import load_scene
from gi_tpu.utils.config import RenderConfig
from gi_tpu.viz import record_paths, visualize


def test_visualize_writes_views(tmp_path):
    scene = load_scene("/root/reference/input/cornell.scn")
    cfg = RenderConfig(width=32, height=32, aa=0)
    prefix = str(tmp_path / "viz")
    written = visualize(scene, cfg, prefix, show_paths=4, show_emitted=8,
                        show_fan=True, views=((30, -60),))
    assert written == [f"{prefix}_e30_a-60.png"]
    assert os.path.getsize(written[0]) > 10000


def test_record_paths_shapes():
    scene = load_scene("/root/reference/input/cornell.scn")
    cfg = RenderConfig(width=32, height=32, aa=0)
    paths = record_paths(scene, cfg, n_pixels=8, depth=4)
    assert len(paths) == 8
    for p in paths:
        assert p.ndim == 2 and p.shape[1] == 3
        assert p.shape[0] >= 2            # eye + at least one vertex
        # first vertex is the camera eye
        np.testing.assert_allclose(p[0], np.asarray(scene.camera.eye),
                                   atol=1e-5)


def test_visualize_cli(tmp_path):
    from gi_tpu.visualize import main
    prefix = str(tmp_path / "v")
    rc = main(["/root/reference/input/cornell.scn", prefix,
               "-paths", "2", "-views", "30,-60"])
    assert rc == 0
    assert os.path.exists(f"{prefix}_e30_a-60.png")
