"""Golden coverage for BASELINE configs #3-#5 (VERDICT r1 item 7):
caustics vs the reference binary, irradiance-cache consistency, DOF, and
supersampled AA.

Caustic/DOF layers are stochastic (photon sampling / aperture jitter):
compare converged means.  AA with a deterministic direct config is exact
up to PNG quantization.  The irradiance cache is an approximation of the
non-cached estimate by construction (README.md:464) and is compared
internally with matching tolerance.
"""

import os
import subprocess

import numpy as np
import pytest

from gi_tpu.models.render import render_image
from gi_tpu.photon.trace import build_photon_maps
from gi_tpu.scene.scn import load_scene
from gi_tpu.utils.config import RenderConfig
from gi_tpu.utils.image import read_image, write_image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = "/tmp/refbuild/src/photonmap"
SCN = "/root/reference/input"


def _ref(scene, out, res, flags, aa=0):
    if not os.path.exists(REF_BIN):
        subprocess.run(
            ["bash", os.path.join(REPO, "tools", "build_reference.sh")],
            capture_output=True, text=True, timeout=900)
        if not os.path.exists(REF_BIN):
            pytest.skip("no reference binary")
    subprocess.run([REF_BIN, os.path.join(SCN, scene), out, "-resolution",
                    str(res), str(res), "-aa", str(aa), "-threads", "4"]
                   + flags, check=True, capture_output=True, timeout=600)
    return read_image(out)


def _ours(scene_name, cfg, tmp_path, name="ours.png"):
    scene = load_scene(os.path.join(SCN, scene_name))
    maps = None
    if cfg.caustic_illum or cfg.indirect_illum or cfg.direct_photon_illum:
        maps, cfg = build_photon_maps(scene, cfg,
                                      __import__("jax").random.PRNGKey(7))
    img = render_image(scene, cfg, photon_maps=maps)
    out = str(tmp_path / name)
    write_image(img, out)
    return read_image(out)


def test_caustic_golden(tmp_path):
    """caustic.scn: the LS+D caustic layer under the glass sphere vs the
    reference binary (converged means; both sides trace 200k photons)."""
    res = 64
    ref = _ref("caustic.scn", str(tmp_path / "ref.png"), res,
               ["-no_indirect", "-no_transmissive", "-no_specular",
                "-no_monte", "-caustic", "200000", "-cs", "100",
                "-cd", "0.3"])
    cfg = RenderConfig(width=res, height=res, aa=0, indirect_illum=False,
                       transmissive_illum=False, specular_illum=False,
                       monte_carlo=False, caustic_photon_count=200_000,
                       caustic_estimate_size=100, caustic_estimate_dist=0.3,
                       ray_tile=4096)
    ours = _ours("caustic.scn", cfg, tmp_path)
    d = np.abs(ref - ours)
    # caustic brightness is concentrated: compare global mean + hot-region
    assert abs(ref.mean() - ours.mean()) < 0.01, \
        f"means {ref.mean():.4f} vs {ours.mean():.4f}"
    assert d.mean() < 0.02, f"mean diff {d.mean():.4f}"
    # the caustic focus exists on both sides (bright ring under the sphere)
    assert ours.max() > 0.5 and ref.max() > 0.5


def test_irradiance_cache_consistency(tmp_path):
    """-cache (nearest-irradiance-sample lookup) must approximate the
    non-cached fast-global render (README.md:464 uses it as a drop-in
    speedup for the indirect layer)."""
    import jax
    res = 48
    scene = load_scene(os.path.join(SCN, "cornell.scn"))
    base = RenderConfig(width=res, height=res, aa=0, fast_global=True,
                        direct_photon_illum=True, indirect_illum=False,
                        caustic_illum=False, transmissive_illum=False,
                        specular_illum=False, monte_carlo=False,
                        direct_illum=False, ambient=False,
                        global_photon_count=30_000,
                        global_estimate_size=50, global_estimate_dist=0.5,
                        ray_tile=2304)
    maps, cfg0 = build_photon_maps(scene, base, jax.random.PRNGKey(5))
    plain = render_image(scene, cfg0, photon_maps=maps)

    cached_cfg = base.replace(irradiance_cache=True)
    maps_c, cfg1 = build_photon_maps(scene, cached_cfg,
                                     jax.random.PRNGKey(5))
    cached = render_image(scene, cfg1, photon_maps=maps_c)

    assert plain.mean() > 0.01  # layer actually renders something
    rel = abs(plain.mean() - cached.mean()) / plain.mean()
    assert rel < 0.25, f"cache layer mean off by {rel:.2%}"
    # nearest-sample caching is piecewise-constant: per-pixel deviation is
    # expected (reference Fig 34 shows visible quality loss); gate the
    # relative deviation and the structural correlation instead.
    rel_px = np.abs(plain - cached).mean() / plain.mean()
    assert rel_px < 0.5, f"per-pixel relative deviation {rel_px:.2f}"
    corr = np.corrcoef(plain.ravel(), cached.ravel())[0, 1]
    assert corr > 0.7, f"cache layer decorrelated: r={corr:.3f}"


def test_dof_golden_means(tmp_path):
    """Depth of field: aperture-jittered eye rays vs the reference -dof
    (stochastic; compare means and blur structure)."""
    res = 32
    ref = _ref("cornell.scn", str(tmp_path / "ref.png"), res,
               ["-no_indirect", "-no_caustic", "-no_transmissive",
                "-no_specular", "-no_monte", "-dof", "32", "1.6", "0.05"])
    cfg = RenderConfig(width=res, height=res, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       depth_of_field=True, dof_test=32, focus_depth=1.6,
                       aperture_radius=0.05, ray_tile=1024)
    ours = _ours("cornell.scn", cfg, tmp_path)
    d = np.abs(ref - ours)
    assert d.mean() < 0.02, f"mean diff {d.mean():.4f}"
    # sanity: DOF must actually blur vs the pinhole render
    pin = _ref("cornell.scn", str(tmp_path / "pin.png"), res,
               ["-no_indirect", "-no_caustic", "-no_transmissive",
                "-no_specular", "-no_monte"])
    assert np.abs(pin - ours).mean() > d.mean()


def test_aa_supersample_golden(tmp_path):
    """-aa 1 (2x2 supersample + box filter) on the deterministic direct
    config matches the reference to PNG quantization."""
    res = 64
    ref = _ref("cornell.scn", str(tmp_path / "ref.png"), res,
               ["-no_indirect", "-no_caustic", "-no_transmissive",
                "-no_specular", "-no_monte"], aa=1)
    cfg = RenderConfig(width=res, height=res, aa=1, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       ray_tile=4096)
    ours = _ours("cornell.scn", cfg, tmp_path)
    d = np.abs(ref - ours)
    assert d.mean() < 5e-3, f"mean diff {d.mean():.4f}"
    assert (d > 0.05).mean() < 0.01
