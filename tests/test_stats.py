"""Ray-counter observability (reference render.cpp:26-41,224-254): per-tile
counter vectors from jitted renders, accumulated into RenderStats."""

import numpy as np
import jax
import jax.numpy as jnp

from gi_tpu.models.render import render_tile
from gi_tpu.scene.scn import load_scene
from gi_tpu.utils.config import RenderConfig
from gi_tpu.utils import stats as ST

CORNELL = "/root/reference/input/cornell.scn"


def _render_counters(cfg, B=256):
    scene = load_scene(CORNELL)
    idx = jnp.arange(B, dtype=jnp.int32)
    color, counters = render_tile(scene, cfg, jax.random.PRNGKey(0), idx,
                                  16, 16, None, with_stats=True)
    return scene, np.asarray(counters)


def _n_shaded(scene, B=256):
    """Pixels whose primary hit has a diffuse or specular BRDF (the ones
    the reference fires shadow rays for)."""
    from gi_tpu.models.camera import eye_rays
    from gi_tpu.ops.intersect import intersect_scene
    cfg = RenderConfig(width=16, height=16, aa=0)
    idx = jnp.arange(B, dtype=jnp.int32)
    o, d = eye_rays(scene, cfg, jax.random.PRNGKey(0), idx, 16, 16, 1)
    h = intersect_scene(scene, o.reshape(-1, 3), d.reshape(-1, 3))
    kd = scene.materials.kd[h.mat]
    ks = scene.materials.ks[h.mat]
    shaded = h.valid & (jnp.any(kd > 0, -1) | jnp.any(ks > 0, -1))
    return int(jnp.sum(shaded))


def test_screen_and_shadow_counts_direct_only():
    cfg = RenderConfig(width=16, height=16, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       soft_shadows=False, ray_tile=256)
    scene, c = _render_counters(cfg)
    assert c[ST.SCREEN] == 256
    # 1 hard shadow ray per light per shaded pixel
    n = _n_shaded(scene)
    assert n > 0
    assert c[ST.SHADOW] == n * scene.n_lights
    assert c[ST.MONTE] == 0
    assert c[ST.TRANSMISSIVE] == 0 and c[ST.SPECULAR] == 0
    assert c[ST.INDIRECT] == 0 and c[ST.CAUSTIC] == 0


def test_soft_shadow_counts_scale_with_light_test():
    cfg = RenderConfig(width=16, height=16, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       soft_shadows=True, light_test=4, shadow_test=3,
                       ray_tile=256)
    scene, c = _render_counters(cfg)
    kinds = scene.lights.kind
    from gi_tpu.scene.types import LIGHT_AREA, LIGHT_RECT
    expect = sum((4 + 3) if k in (LIGHT_AREA, LIGHT_RECT) else 1
                 for k in kinds) * _n_shaded(scene)
    assert c[ST.SHADOW] == expect


def test_monte_carlo_counts_positive_and_bounded():
    cfg = RenderConfig(width=16, height=16, aa=0, indirect_illum=True,
                       caustic_illum=False, transmissive_illum=True,
                       specular_illum=True, monte_carlo=True,
                       soft_shadows=False, indirect_test=2,
                       transmissive_test=2, specular_test=2,
                       max_monte_depth=4, ray_tile=256,
                       global_photon_count=0)
    _, c = _render_counters(cfg)
    # cornell has diffuse walls -> indirect spawns 2 per hit pixel
    assert c[ST.INDIRECT] > 0
    assert c[ST.INDIRECT] <= 2 * 256
    # every spawned sample walks >= 1 step
    assert c[ST.MONTE] >= c[ST.INDIRECT]
    spawned = c[ST.INDIRECT] + c[ST.TRANSMISSIVE] + c[ST.SPECULAR]
    assert c[ST.MONTE] <= spawned * cfg.max_monte_depth


def test_render_stats_report_accumulates():
    stats = ST.RenderStats()
    stats.add(np.array([100, 200, 0, 0, 0, 0, 0, 0], np.int32))
    stats.add(np.array([50, 25, 0, 0, 0, 0, 0, 0], np.int32))
    stats.seconds = 2.0
    cfg = RenderConfig(monte_carlo=False, transmissive_illum=False,
                       specular_illum=False, indirect_illum=False,
                       caustic_illum=False)
    rep = stats.report(cfg)
    assert "# Screen Rays = 150" in rep
    assert "# Shadow Rays = 225" in rep
    assert "Total Rays: 375" in rep
    assert "# Monte Carlo Rays" not in rep
