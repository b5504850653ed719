"""Checkpoint/resume: photon-map GIPM checkpoints restore bit-identical
radiance estimates; the training loop resumes from orbax checkpoints.
(The reference has neither — photon maps are freed after the render,
photonmap.cpp:474-485, and there is no training.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gi_tpu.photon.checkpoint import load_maps, save_maps
from gi_tpu.photon.gather import PhotonMaps, estimate_radiance
from gi_tpu.photon.trace import MAP_CAUSTIC, trace_photon_map
from gi_tpu.scene.scn import load_scene
from gi_tpu.utils.config import RenderConfig

CAUSTIC = "/root/reference/input/caustic.scn"


@pytest.fixture(scope="module")
def caustic_maps():
    scene = load_scene(CAUSTIC)
    cfg = RenderConfig(caustic_photon_count=3000, width=64, height=64)
    grid, _ = trace_photon_map(scene, cfg, jax.random.PRNGKey(1), MAP_CAUSTIC)
    assert grid is not None
    return scene, cfg, PhotonMaps(global_=None, caustic=grid)


def _estimate_at(scene, cfg, grid, n=64):
    rng = np.random.default_rng(0)
    pos = np.asarray(grid.pos)[np.asarray(grid.valid)]
    pts = jnp.asarray(pos[rng.integers(0, len(pos), n)])
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    kd = jnp.ones((n, 3)) * 0.5
    ks = jnp.zeros((n, 3))
    return estimate_radiance(
        grid, pts, normal, jnp.zeros((n, 3)), jnp.ones(n), kd, ks,
        jnp.ones(n), cfg.caustic_estimate_size,
        cfg.caustic_estimate_dist, cfg.caustic_filter, cfg)


def test_photon_map_checkpoint_roundtrip(tmp_path, caustic_maps):
    scene, cfg, maps = caustic_maps
    path = str(tmp_path / "maps")
    save_maps(path, maps)
    maps2 = load_maps(path)
    assert maps2.global_ is None
    g1, g2 = maps.caustic, maps2.caustic

    assert g2.dims == g1.dims
    assert g2.cell_cap == g1.cell_cap
    np.testing.assert_array_equal(np.asarray(g2.origin), np.asarray(g1.origin))
    np.testing.assert_array_equal(np.asarray(g2.cell_start),
                                  np.asarray(g1.cell_start))

    # radiance estimates agree exactly at photon positions
    r1 = np.asarray(_estimate_at(scene, cfg, g1))
    r2 = np.asarray(_estimate_at(scene, cfg, g2))
    np.testing.assert_array_equal(r1, r2)
    assert np.any(r1 > 0)


def test_photon_map_checkpoint_errors(tmp_path):
    with pytest.raises(IOError):
        load_maps(str(tmp_path / "nonexistent"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "meta.json").write_text('{"format": "other"}')
    with pytest.raises(IOError):
        load_maps(str(bad))


def test_fit_checkpoints_and_resumes(tmp_path):
    """Short inverse-rendering run on the CPU mesh: loss decreases, and a
    second fit() call resumes from the saved step instead of restarting."""
    from gi_tpu.parallel.mesh import device_mesh, diff_params
    from gi_tpu.parallel.train import fit, latest_step

    scene = load_scene("/root/reference/input/cornell.scn")
    cfg = RenderConfig(
        width=8, height=8, aa=0, light_test=1, shadow_test=1,
        soft_shadows=False, indirect_illum=False, caustic_illum=False,
        transmissive_illum=False, specular_illum=False, monte_carlo=False,
        ray_tile=64, differentiable=True)
    mesh = device_mesh(4, platform="cpu")

    # target: the scene itself with dimmed lights -> recoverable parameters
    from gi_tpu.models.render import render_tile
    dim = scene.replace(lights=scene.lights.replace(
        color=scene.lights.color * 0.5))
    idx = jnp.arange(64, dtype=jnp.int32)
    target = render_tile(dim, cfg, jax.random.PRNGKey(9), idx, 8, 8, None)

    ck = str(tmp_path / "ck")
    r1 = fit(scene, target, cfg, mesh, 8, 8, steps=3, lr=5e-2,
             ckpt_dir=ck, ckpt_every=10, seed=3)
    assert r1.start_step == 0
    assert latest_step(ck) == 3
    assert r1.losses[-1] <= r1.losses[0]

    r2 = fit(scene, target, cfg, mesh, 8, 8, steps=2, lr=5e-2,
             ckpt_dir=ck, ckpt_every=10, seed=3)
    assert r2.start_step == 3
    assert latest_step(ck) == 5
    # resumed run continues improving from the checkpointed params
    assert r2.losses[0] <= r1.losses[0]
