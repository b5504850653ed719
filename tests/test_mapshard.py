"""P8 sharded-map render: photon maps stay device-sharded through the
render (deferred-gather queues + ring-exchange kNN) and must produce the
REPLICATED render's image exactly (up to K-th-neighbor ties and f32
summation order) — the deferral is algebraic (additive leaf contributions),
not an approximation."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gi_tpu.models.render import render_image
from gi_tpu.parallel.mesh import device_mesh
from gi_tpu.photon.trace import build_photon_maps
from gi_tpu.scene.scn import load_scene
from gi_tpu.utils.config import RenderConfig

SCN = "/root/reference/input"


@pytest.fixture(scope="module")
def mesh8():
    return device_mesh(8, platform="cpu")


def _render_both(scene, cfg, maps, mesh):
    rep = render_image(scene, cfg, photon_maps=maps, mesh=mesh)
    shard = render_image(scene, cfg.replace(shard_maps=True),
                         photon_maps=maps, mesh=mesh)
    return rep, shard


def test_caustic_mapshard_matches_replicated(mesh8):
    """Direct + caustic on caustic.scn: primary-hit caustic requests AND
    in-walk caustic requests (transmissive/specular lanes) defer to the
    ring gather; result must match the replicated render."""
    scene = load_scene(os.path.join(SCN, "caustic.scn"))
    cfg = RenderConfig(width=24, height=24, aa=0, indirect_illum=False,
                       caustic_photon_count=20000,
                       caustic_estimate_size=50, caustic_estimate_dist=0.3,
                       transmissive_test=4, specular_test=4,
                       max_monte_depth=4, max_photon_depth=16,
                       ray_tile=576)
    maps, cfg = build_photon_maps(scene, cfg, jax.random.PRNGKey(3))
    assert maps is not None and maps.caustic is not None
    rep, shard = _render_both(scene, cfg, maps, mesh8)
    assert rep.mean() > 0.01
    np.testing.assert_allclose(shard, rep, rtol=1e-4, atol=1e-5)


def test_indirect_mapshard_matches_replicated(mesh8, cornell_scene):
    """Indirect final gather with a sharded GLOBAL map: requests arise at
    data-dependent walk terminations and defer per lane."""
    cfg = RenderConfig(width=24, height=24, aa=0, caustic_illum=False,
                       transmissive_illum=False, specular_illum=False,
                       indirect_test=8, max_monte_depth=4,
                       global_photon_count=4000, global_estimate_size=30,
                       global_estimate_dist=0.8, max_photon_depth=8,
                       ray_tile=576)
    maps, cfg = build_photon_maps(cornell_scene, cfg, jax.random.PRNGKey(5))
    assert maps is not None and maps.global_ is not None
    rep, shard = _render_both(cornell_scene, cfg, maps, mesh8)
    assert rep.mean() > 0.01
    np.testing.assert_allclose(shard, rep, rtol=1e-4, atol=1e-5)


def test_photon_viz_mapshard_matches_replicated(mesh8, cornell_scene):
    """-photon_viz (direct global-map visualization) with a sharded map:
    dense primary-row requests."""
    cfg = RenderConfig(width=24, height=24, aa=0, fast_global=True,
                       direct_photon_illum=True, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       direct_illum=False, ambient=False,
                       global_photon_count=6000, global_estimate_size=30,
                       global_estimate_dist=0.5, max_photon_depth=8,
                       ray_tile=576)
    maps, cfg = build_photon_maps(cornell_scene, cfg, jax.random.PRNGKey(6))
    rep, shard = _render_both(cornell_scene, cfg, maps, mesh8)
    assert rep.mean() > 0.001
    np.testing.assert_allclose(shard, rep, rtol=1e-4, atol=1e-5)


def test_irradiance_cache_keeps_global_replicated(mesh8, cornell_scene):
    """-cache + shard_maps: the nearest-sample cache lookup has no
    deferred form, so build_sharded_maps keeps the global map replicated
    and the render still matches."""
    cfg = RenderConfig(width=16, height=16, aa=0, fast_global=True,
                       direct_photon_illum=True, irradiance_cache=True,
                       indirect_illum=False, caustic_illum=False,
                       transmissive_illum=False, specular_illum=False,
                       monte_carlo=False, direct_illum=False, ambient=False,
                       global_photon_count=4000, global_estimate_size=20,
                       global_estimate_dist=0.5, max_photon_depth=8,
                       ray_tile=256)
    maps, cfg = build_photon_maps(cornell_scene, cfg, jax.random.PRNGKey(8))
    from gi_tpu.parallel.gather import build_sharded_maps
    smaps = build_sharded_maps(maps, cfg, mesh8)
    assert smaps.global_ is None and smaps.global_rep is not None
    rep, shard = _render_both(cornell_scene, cfg, maps, mesh8)
    np.testing.assert_allclose(shard, rep, rtol=1e-4, atol=1e-5)
