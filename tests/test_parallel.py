"""Multi-device sharding on the virtual 8-CPU mesh (SURVEY.md §2.3).

The reference's parallelism is k std::threads over shared memory; its only
"tests" were visual.  Here the TPU-native equivalents are checked for
correctness directly: sharded ray batches (P1), sharded photon rounds with
per-device buffers + summed counts (P2/P3), and the deterministic per-device
RNG split (P5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gi_tpu.parallel.mesh import device_mesh, render_tile_sharded
from gi_tpu.parallel.photon import emit_round_sharded
from gi_tpu.photon.trace import (MAP_CAUSTIC, MAP_GLOBAL, build_photon_maps,
                                 emit_round, trace_photon_map)
from gi_tpu.utils.config import RenderConfig


def _cfg(**kw):
    base = dict(width=16, height=16, aa=0, light_test=2, shadow_test=2,
                transmissive_test=2, specular_test=2, indirect_test=2,
                max_monte_depth=6, max_photon_depth=12,
                global_photon_count=512, caustic_photon_count=512,
                ray_tile=256)
    base.update(kw)
    return RenderConfig(**base)


def test_render_tile_sharded_finite(cornell_scene):
    """P1: pixel batch sharded over 8 devices renders finite colors of the
    right shape."""
    mesh = device_mesh(8, platform="cpu")
    cfg = _cfg(indirect_illum=False, caustic_illum=False, monte_carlo=False)
    idx = jnp.arange(256, dtype=jnp.int32)
    out = render_tile_sharded(cornell_scene, cfg, jax.random.PRNGKey(0),
                              idx, 16, 16, mesh)
    assert out.shape == (256, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_emit_round_sharded_buffers(cornell_scene):
    """P2/P3: each device's stored photons occupy its buffer prefix; streams
    are independent (fold_in(axis_index)) so devices store different photons."""
    mesh = device_mesh(4, platform="cpu")
    cfg = _cfg()
    counts = (64,) * cornell_scene.n_lights
    cap = 8 * sum(counts)
    bp, bw, bd, cnts, _ = emit_round_sharded(
        cornell_scene, cfg, jax.random.PRNGKey(3), counts, MAP_GLOBAL, cap,
        mesh)
    cnts = np.asarray(cnts)
    assert bp.shape == (4 * cap, 3)
    assert cnts.shape == (4,)
    assert np.all(cnts > 0)

    bp = np.asarray(bp)
    # per-device prefixes hold stored photons (nonzero positions), the rest
    # of each buffer is untouched zeros
    segs = []
    for i, n in enumerate(cnts):
        seg = bp[i * cap:i * cap + n]
        assert np.any(seg != 0.0, axis=1).all()
        tail = bp[i * cap + n:(i + 1) * cap]
        assert np.all(tail == 0.0)
        segs.append(seg)
    # independent streams: device 0 and 1 stored different positions
    m = min(len(segs[0]), len(segs[1]))
    assert not np.allclose(segs[0][:m], segs[1][:m])


def test_emit_round_sharded_matches_single_device_stats(cornell_scene):
    """The sharded round is the same estimator as n independent single-device
    rounds: store *rates* agree statistically."""
    cfg = _cfg()
    counts = (128,) * cornell_scene.n_lights
    cap = 8 * sum(counts)
    mesh = device_mesh(8, platform="cpu")
    _, _, _, cnts, _ = emit_round_sharded(
        cornell_scene, cfg, jax.random.PRNGKey(5), counts, MAP_GLOBAL, cap,
        mesh)
    rate_sharded = float(np.sum(np.asarray(cnts))) / (8 * sum(counts))

    single = 0
    for s in range(4):
        _, _, _, cnt, _ = emit_round(cornell_scene, cfg, jax.random.PRNGKey(s),
                                  counts, MAP_GLOBAL, cap)
        single += int(cnt)
    rate_single = single / (4 * sum(counts))
    assert rate_sharded == pytest.approx(rate_single, rel=0.25)


def test_trace_photon_map_sharded_end_to_end(cornell_scene):
    """Quota loop over the mesh: grid builds, photon powers are normalized by
    the total emitted count, and positions lie inside the scene bbox."""
    mesh = device_mesh(4, platform="cpu")
    cfg = _cfg(global_photon_count=2000)
    grid, stats = trace_photon_map(cornell_scene, cfg,
                                   jax.random.PRNGKey(7), MAP_GLOBAL,
                                   mesh=mesh)
    assert grid is not None
    assert stats["stored"] >= 2000
    assert stats["emitted"] % 4 == 0  # n_dev rounds counted
    pos = np.asarray(grid.pos)[np.asarray(grid.valid)]
    from gi_tpu.photon.trace import _scene_bbox
    lo, hi = _scene_bbox(cornell_scene)
    assert np.all(pos >= lo - 1e-3) and np.all(pos <= hi + 1e-3)


def test_render_tile_sharded_stats_psum(cornell_scene):
    """P4: sharded render returns psum'd counters equal to the single-device
    counters for the same pixel batch (deterministic categories)."""
    from gi_tpu.models.render import render_tile
    from gi_tpu.utils import stats as ST
    mesh = device_mesh(8, platform="cpu")
    cfg = _cfg(indirect_illum=False, caustic_illum=False, monte_carlo=False)
    idx = jnp.arange(256, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    _, counters = render_tile_sharded(cornell_scene, cfg, key, idx, 16, 16,
                                      mesh, with_stats=True)
    counters = np.asarray(counters)
    _, single = render_tile(cornell_scene, cfg, key, idx, 16, 16, None,
                            with_stats=True)
    single = np.asarray(single)
    # screen/shadow counts are deterministic functions of the hit geometry
    assert counters[ST.SCREEN] == single[ST.SCREEN] == 256
    assert counters[ST.SHADOW] == single[ST.SHADOW] > 0


def test_render_image_sharded_matches_single(cornell_scene):
    """The product path: render_image(mesh=...) equals the single-device
    render on a deterministic (hard-shadow, no-MC) config, and stats work."""
    from gi_tpu.models.render import render_image
    from gi_tpu.utils.stats import RenderStats
    cfg = _cfg(indirect_illum=False, caustic_illum=False, monte_carlo=False,
               soft_shadows=False, width=8, height=8, ray_tile=256)
    img1 = render_image(cornell_scene, cfg)
    mesh = device_mesh(8, platform="cpu")
    stats = RenderStats()
    img8 = render_image(cornell_scene, cfg, stats=stats, mesh=mesh)
    np.testing.assert_allclose(img8, img1, atol=1e-5)
    assert stats.counts[0] == 8 * 8  # screen rays
    assert stats.total > 64


def test_cli_renders_on_mesh(cornell_scene, tmp_path):
    """End-to-end CLI over the 8-device CPU mesh: `-threads` caps the mesh,
    `-v` stats work sharded (VERDICT item 1 done-condition)."""
    from gi_tpu.cli import main
    out = tmp_path / "cornell_mesh.png"
    rc = main(["/root/reference/input/cornell.scn", str(out), "-v",
               "-resolution", "16", "16", "-aa", "0", "-no_indirect",
               "-no_caustic", "-no_monte", "-lt", "2", "-ss", "2",
               "-threads", "8", "-tile", "256"])
    assert rc == 0 and out.exists()


def test_build_photon_maps_sharded_render(cornell_scene):
    """Full pipeline with a sharded map build: the rendered caustic/indirect
    layers consume the merged grid without shape errors."""
    mesh = device_mesh(2, platform="cpu")
    cfg = _cfg(global_photon_count=1000, caustic_photon_count=500,
               monte_carlo=False, transmissive_illum=False,
               specular_illum=False)
    maps, cfg2 = build_photon_maps(cornell_scene, cfg, jax.random.PRNGKey(9),
                                   mesh=mesh)
    assert maps is not None and maps.global_ is not None

    from gi_tpu.models.render import render_tile
    idx = jnp.arange(64, dtype=jnp.int32)
    out = render_tile(cornell_scene, cfg2, jax.random.PRNGKey(1), idx,
                      8, 8, maps)
    assert np.all(np.isfinite(np.asarray(out)))
