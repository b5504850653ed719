"""Stochastic-path golden tests: converged means vs the reference binary.

These layers are Monte Carlo estimators — images match in expectation, not
bitwise.  We render small frames with matched sample budgets and compare
means with tolerances scaled to the residual MC noise.
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


def _ref(scene, out, res, flags):
    if not os.path.exists(REF_BIN):
        r = subprocess.run(
            ["bash", os.path.join(REPO, "tools", "build_reference.sh")],
            capture_output=True, text=True, timeout=900)
        if not os.path.exists(REF_BIN):
            pytest.skip("no reference binary")
    subprocess.run([REF_BIN, os.path.join(SCN, scene), out, "-resolution",
                    str(res), str(res), "-aa", "0", "-threads", "4"] + flags,
                   check=True, capture_output=True, timeout=600)
    return read_image(out)


def test_cornell_glass_monte_carlo(tmp_path, cornell_scene):
    """Fresnel transmission + specular through the glass sphere."""
    res = 32
    ref = _ref("cornell.scn", str(tmp_path / "ref.png"), res,
               ["-no_indirect", "-no_caustic", "-tt", "16", "-st", "16",
                "-md", "8"])
    cfg = RenderConfig(width=res, height=res, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_test=16,
                       specular_test=16, max_monte_depth=8, ray_tile=1024)
    img = render_image(cornell_scene, cfg)
    write_image(img, str(tmp_path / "ours.png"))
    ours = read_image(str(tmp_path / "ours.png"))
    d = np.abs(ref - ours)
    assert d.mean() < 0.015, f"mean diff {d.mean():.4f}"
    assert np.abs(ref.mean() - ours.mean()) < 0.01


def test_softshadow_scene(tmp_path):
    """Area light soft shadows (stochastic light-surface sampling)."""
    res = 32
    ref = _ref("softshadow.scn", str(tmp_path / "ref.png"), res,
               ["-no_indirect", "-no_caustic", "-no_monte",
                "-lt", "64", "-ss", "64"])
    scene = load_scene(os.path.join(SCN, "softshadow.scn"))
    cfg = RenderConfig(width=res, height=res, aa=0, indirect_illum=False,
                       caustic_illum=False, monte_carlo=False,
                       light_test=64, shadow_test=64, ray_tile=1024)
    img = render_image(scene, cfg)
    write_image(img, str(tmp_path / "ours.png"))
    ours = read_image(str(tmp_path / "ours.png"))
    d = np.abs(ref - ours)
    assert d.mean() < 0.02, f"mean diff {d.mean():.4f}"


def test_indirect_illumination_cornell(tmp_path, cornell_scene):
    """Indirect final gather against a small global photon map."""
    import jax
    from gi_tpu.photon.trace import build_photon_maps

    res = 32
    ref = _ref("cornell.scn", str(tmp_path / "ref.png"), res,
               ["-no_caustic", "-no_transmissive", "-no_specular",
                "-global", "10000", "-it", "48", "-md", "6", "-gs", "30",
                "-gd", "0.5"])
    cfg = RenderConfig(width=res, height=res, aa=0, caustic_illum=False,
                       transmissive_illum=False, specular_illum=False,
                       global_photon_count=10000, indirect_test=48,
                       max_monte_depth=6, global_estimate_size=30,
                       global_estimate_dist=0.5, ray_tile=1024,
                       max_photon_depth=6)
    maps, cfg = build_photon_maps(cornell_scene, cfg, jax.random.PRNGKey(7))
    img = render_image(cornell_scene, cfg, photon_maps=maps)
    write_image(img, str(tmp_path / "ours.png"))
    ours = read_image(str(tmp_path / "ours.png"))
    d = np.abs(ref - ours)
    # at this sample budget both estimators converge: observed deltas are
    # ~0.004 per quadrant / 0.010 per pixel; gates are ~3-4x that margin
    assert np.abs(ref.mean() - ours.mean()) < 0.02, \
        f"ref {ref.mean():.4f} ours {ours.mean():.4f}"
    assert d.mean() < 0.03, f"mean diff {d.mean():.4f}"
    # localized gate: no quadrant-sized energy error can hide in the mean
    H = res // 2
    for ys in (slice(0, H), slice(H, None)):
        for xs in (slice(0, H), slice(H, None)):
            rq, oq = ref[ys, xs].mean(), ours[ys, xs].mean()
            assert abs(rq - oq) < 0.02, f"quadrant {ys},{xs}: {rq} vs {oq}"
