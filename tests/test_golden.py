"""Golden-image tests: render the same scene+flags with the reference C++
binary (built from /root/reference via tools/build_reference.sh) and with the
TPU framework, and compare.

Deterministic configs (no Monte Carlo, point/dir/spot lights with hard
shadows) must match to PNG quantization; stochastic configs are compared as
converged means with loose tolerances elsewhere.
"""

import os
import subprocess

import numpy as np
import pytest

from gi_tpu.models.render import render_image
from gi_tpu.scene.scn import load_scene
from gi_tpu.utils.config import RenderConfig
from gi_tpu.utils.image import read_image, write_image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = "/tmp/refbuild/src/photonmap"
SCN = "/root/reference/input"

DETERMINISTIC_FLAGS = ["-no_transmissive", "-no_specular", "-no_indirect",
                       "-no_caustic", "-no_monte"]


def _ensure_reference_binary():
    if not os.path.exists(REF_BIN):
        r = subprocess.run(
            ["bash", os.path.join(REPO, "tools", "build_reference.sh")],
            capture_output=True, text=True, timeout=900)
        if r.returncode != 0 or not os.path.exists(REF_BIN):
            pytest.skip(f"cannot build reference binary: {r.stderr[-400:]}")


def _reference_render(scene_name, out, res, extra_flags):
    cmd = [REF_BIN, os.path.join(SCN, scene_name), out,
           "-resolution", str(res), str(res), "-aa", "0",
           "-threads", "4"] + extra_flags
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    return read_image(out)


@pytest.mark.parametrize("scene_name", [
    "cornell.scn",       # point light, box interior
    "pointlight1.scn",
    "dirlight1.scn",
    "spotlight1.scn",
    "transform.scn",     # transform groups + dir lights
])
def test_direct_deterministic_allclose(scene_name, tmp_path):
    _ensure_reference_binary()
    res = 64
    ref = _reference_render(scene_name, str(tmp_path / "ref.png"), res,
                            DETERMINISTIC_FLAGS)

    scene = load_scene(os.path.join(SCN, scene_name))
    cfg = RenderConfig(width=res, height=res, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       ray_tile=4096)
    img = render_image(scene, cfg)
    write_image(img, str(tmp_path / "ours.png"))
    ours = read_image(str(tmp_path / "ours.png"))

    diff = np.abs(ref - ours)
    # allow PNG quantization + f32-vs-f64 rounding on a few boundary pixels
    assert diff.mean() < 5e-3, f"mean diff {diff.mean()}"
    assert (diff > 0.05).mean() < 0.01, \
        f"{(diff > 0.05).mean():.4%} pixels off by >0.05"
