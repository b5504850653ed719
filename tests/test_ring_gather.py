"""Ring-exchange sharded photon gather (P8) vs the brute-force kNN oracle.

The sharded map must produce EXACTLY the replicated estimator's answer:
the ring carries every photon past every query once, so there is no
decimation and no approximation — only the merge order differs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gi_tpu.parallel.mesh import device_mesh
from gi_tpu.parallel.gather import (estimate_irradiance_ring,
                                    estimate_radiance_ring, shard_photons)
from gi_tpu.photon.gather import (build_grid, estimate_irradiance,
                                  estimate_radiance)
from gi_tpu.ops import sampling as S
from gi_tpu.utils.config import RenderConfig


def _random_map(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    power = rng.uniform(0.0, 2.0, (n, 3)).astype(np.float32)
    # bf16-round the flux up front: the replicated grid stores power as
    # bf16, and the comparison should isolate the ring merge, not dtypes
    power = np.asarray(
        jnp.asarray(power).astype(jnp.bfloat16).astype(jnp.float32))
    # direction codes covering the 16-bit sphere codec
    code = rng.integers(0, 255 * 256, n).astype(np.int32)
    valid = np.ones(n, bool)
    # a few invalid tail entries to exercise masking
    valid[-max(1, n // 50):] = False
    return pos, power, code, valid


def _queries(b, seed=1):
    rng = np.random.default_rng(seed)
    pt = rng.uniform(-0.9, 0.9, (b, 3)).astype(np.float32)
    n = rng.normal(size=(b, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    eb = rng.normal(size=(b, 3)).astype(np.float32)
    eb /= np.linalg.norm(eb, axis=1, keepdims=True)
    ct = rng.uniform(-1, 1, b).astype(np.float32)
    kd = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    ks = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    sh = rng.uniform(1, 50, b).astype(np.float32)
    return pt, n, eb, ct, kd, ks, sh


def _oracle_irradiance(pos, power, valid, pt, K, dist):
    """NumPy brute-force EstimateIrradiance (photon_utils.cpp:209-246)."""
    out = np.zeros((pt.shape[0], 3), np.float32)
    for i, p in enumerate(pt):
        d2 = np.sum((pos - p) ** 2, axis=1)
        d2[~valid] = np.inf
        d2[d2 > dist * dist] = np.inf
        order = np.argsort(d2)[:K]
        sel = order[np.isfinite(d2[order])]
        if len(sel) == 0:
            continue
        max_d2 = dist * dist if len(sel) < K else max(d2[sel].max(), 1e-6)
        out[i] = power[sel].sum(axis=0) / (np.pi * max_d2)
    return out


@pytest.mark.parametrize("n_photons", [4000, 999])
def test_ring_irradiance_matches_oracle(n_photons):
    mesh = device_mesh(8, platform="cpu")
    pos, power, code, valid = _random_map(n_photons)
    pt = _queries(64)[0]
    K, dist = 12, 0.35

    sharded = shard_photons(pos, power, code, valid, mesh)
    got = np.asarray(estimate_irradiance_ring(
        sharded, jnp.asarray(pt), K, dist, mesh, query_chunk=16))
    want = _oracle_irradiance(pos, power, valid, pt, K, dist)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ring_radiance_matches_replicated():
    """Full radiance estimate: ring-sharded == replicated exact path, for
    all three filters (disk/cone/gauss)."""
    mesh = device_mesh(8, platform="cpu")
    pos, power, code, valid = _random_map(3000, seed=3)
    pt, n, eb, ct, kd, ks, sh = _queries(32, seed=4)
    K, dist = 10, 0.4
    cfg = RenderConfig()

    grid = build_grid(jnp.asarray(pos), jnp.asarray(power),
                      jnp.asarray(code), jnp.asarray(valid),
                      pos.min(0), pos.max(0), dist, cell_cap=4096)
    sharded = shard_photons(pos, power, code, valid, mesh)
    args = tuple(jnp.asarray(a) for a in (pt, n, eb, ct, kd, ks, sh))
    for filt in (0, 1, 2):
        want = np.asarray(estimate_radiance(
            grid, *args, K, dist, filt, cfg))
        got = np.asarray(estimate_radiance_ring(
            sharded, *args, K, dist, filt, cfg, mesh, query_chunk=8))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5,
                                   err_msg=f"filter={filt}")


def test_cache_precompute_sharded_matches_local(cornell_scene):
    """The ring-exchange irradiance-cache precompute must match the local
    precompute run on the SAME traced photon set — exact equality (up to
    f32 merge-order rounding), not a statistical gate."""
    from gi_tpu.photon.trace import MAP_GLOBAL, trace_photon_map

    cfg = RenderConfig(global_photon_count=2000, global_estimate_size=16,
                       global_estimate_dist=0.8, max_photon_depth=16)
    grid, _ = trace_photon_map(cornell_scene, cfg, jax.random.PRNGKey(7),
                               MAP_GLOBAL)
    K, dist = cfg.global_estimate_size, cfg.global_estimate_dist
    n = grid.pos.shape[0]

    # exact local oracle: rebuild the grid with a cell cap big enough that
    # no cell decimates, so the 27-cell window is exact kNN
    lo = np.asarray(grid.pos).min(0)
    hi = np.asarray(grid.pos).max(0)
    exact = build_grid(grid.pos, grid.power.astype(jnp.float32),
                       grid.dir_code, grid.valid, lo, hi, dist,
                       cell_cap=n)
    want = np.asarray(estimate_irradiance(exact, grid.pos, K, dist))

    mesh = device_mesh(8, platform="cpu")
    sharded = shard_photons(grid.pos, grid.power.astype(jnp.float32),
                            grid.dir_code, grid.valid, mesh)
    qpad = -(-n // 8) * 8
    q = jnp.pad(grid.pos, ((0, qpad - n), (0, 0)))
    got = np.asarray(estimate_irradiance_ring(sharded, q, K, dist, mesh))[:n]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_build_photon_maps_ring_cache_wiring(cornell_scene, monkeypatch):
    """cfg.shard_maps forces build_photon_maps(mesh=...) through the
    ring-exchange precompute; without it a small map stays on the cheaper
    local path (the ring merge is all-pairs O(N^2/D))."""
    from gi_tpu.parallel import gather as PG
    from gi_tpu.photon.trace import build_photon_maps

    calls = []
    real = PG.estimate_irradiance_ring

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(PG, "estimate_irradiance_ring", spy)
    mesh = device_mesh(8, platform="cpu")
    cfg = RenderConfig(indirect_illum=True, caustic_illum=False,
                       irradiance_cache=True, global_photon_count=1000,
                       global_estimate_size=16, global_estimate_dist=0.8,
                       max_photon_depth=16)
    maps, _ = build_photon_maps(cornell_scene, cfg, jax.random.PRNGKey(3),
                                mesh=mesh)
    assert maps.global_ is not None and not calls  # small map: local path

    maps2, _ = build_photon_maps(cornell_scene,
                                 cfg.replace(shard_maps=True),
                                 jax.random.PRNGKey(3), mesh=mesh)
    assert maps2.global_ is not None and calls  # forced: ring path
