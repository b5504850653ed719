"""Benchmark ladder: the BASELINE.md configs, measured on real TPU.

Prints ONE JSON line.  Primary metric (backward-compatible with round 1):
rays/s on cornell.scn 1024x1024 direct illumination (aa=0), vs the
reference's ~7.16e5 rays/s aggregate on 8 CPU threads (README.md:403).

`extras` holds the matched-config ladder from BASELINE.md:
  - photons/s: caustic.scn caustic-map tracing (stored photons per second;
    reference: 100M stored in 300 s = 3.33e5/s, README.md:357).
  - direct+caustic 512^2, 4 samples/px, 10M-photon caustic map, cs=225,
    cd=0.225 (reference: 1564.3 s, README.md:362).
  - indirect importance-sampled 512^2, 1 spp, 64 indirect samples,
    ~2k-photon global map gs=50 gd=2.5 (reference: 51.8 s, README.md:393).

Render-time metrics time a uniformly random subset of the supersample
batch and scale to the full frame (unbiased: every pixel batch costs the
same program; noted via `sampled_fraction`).  Compile time is excluded
(reported separately) — the reference numbers are steady-state render
loops, and a production renderer amortizes one compile over many frames.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

INPUT = "/root/reference/input"


def _bench_direct_rays():
    from gi_tpu.models.render import render_tile
    from gi_tpu.ops.intersect import intersect_scene
    from gi_tpu.models.camera import eye_rays
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene(f"{INPUT}/cornell.scn")
    res = 1024
    tile = 1048576
    cfg = RenderConfig(width=res, height=res, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       ray_tile=tile)
    total = res * res
    n_tiles = total // tile
    key = jax.random.PRNGKey(0)

    # Count rays the way the reference does (render.cpp:224-254):
    # 1 screen ray per pixel + 1 shadow ray per shaded hit.
    def count_tile(scene_, idx):
        o, d = eye_rays(scene_, cfg, jax.random.PRNGKey(0), idx, res, res, 1)
        h = intersect_scene(scene_, o.reshape(-1, 3), d.reshape(-1, 3))
        kd = scene_.materials.kd[h.mat]
        ks = scene_.materials.ks[h.mat]
        ds = jnp.any(kd > 0, axis=-1) | jnp.any(ks > 0, axis=-1)
        return jnp.sum(h.valid & ds)

    count_jit = jax.jit(count_tile)
    shadow_rays = 0
    for t in range(n_tiles):
        idx = t * tile + jnp.arange(tile, dtype=jnp.int32)
        shadow_rays += int(count_jit(scene, idx))
    total_rays = total + shadow_rays

    t0 = time.time()
    idx0 = jnp.arange(tile, dtype=jnp.int32)
    render_tile(scene, cfg, key, idx0, res, res, None).block_until_ready()
    compile_s = time.time() - t0

    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        outs = []
        for t in range(n_tiles):
            idx = t * tile + jnp.arange(tile, dtype=jnp.int32)
            key, sub = jax.random.split(key)
            outs.append(render_tile(scene, cfg, sub, idx, res, res, None))
        jax.block_until_ready(outs)
        elapsed = min(elapsed, time.perf_counter() - start)

    rays_per_s = total_rays / elapsed
    return {
        "metric": "rays_per_s_cornell1024_direct",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / 7.16e5, 3),
        "elapsed_s": round(elapsed, 3),
        "compile_s": round(compile_s, 1),
        "total_rays": total_rays,
    }


def _bench_photon_trace():
    from gi_tpu.photon.trace import MAP_CAUSTIC, trace_photon_map
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene(f"{INPUT}/caustic.scn")
    # warm-compile the emission-round program on a small goal
    warm = RenderConfig(caustic_photon_count=50_000, max_photon_depth=128)
    t0 = time.time()
    trace_photon_map(scene, warm, jax.random.PRNGKey(1), MAP_CAUSTIC)
    compile_s = time.time() - t0

    cfg = RenderConfig(caustic_photon_count=2_000_000, max_photon_depth=128)
    t0 = time.time()
    grid, stats = trace_photon_map(scene, cfg, jax.random.PRNGKey(2),
                                   MAP_CAUSTIC)
    elapsed = time.time() - t0
    stored = int(stats["stored"])
    pps = stored / elapsed
    return {
        "metric": "caustic_photons_stored_per_s",
        "value": round(pps, 1),
        "unit": "photons/s",
        "vs_baseline": round(pps / 3.33e5, 3),
        "elapsed_s": round(elapsed, 2),
        "compile_s": round(compile_s, 1),
        "stored": stored,
    }, grid


def _timed_subset_render(scene, cfg, maps, fraction, seed=0):
    """Time a random `fraction` of the supersample batch; return
    (estimated full-frame seconds, compile seconds, fraction)."""
    from gi_tpu.models.render import render_tile

    aa_factor = 2 ** cfg.aa
    sw, sh = cfg.width * aa_factor, cfg.height * aa_factor
    total = sw * sh
    tile = min(cfg.ray_tile, total)
    n_tiles = total // tile
    n_sample = max(1, int(n_tiles * fraction))
    rng = np.random.default_rng(seed)
    chosen = rng.choice(n_tiles, size=n_sample, replace=False)

    key = jax.random.PRNGKey(cfg.seed)
    idx0 = jnp.arange(tile, dtype=jnp.int32)
    t0 = time.time()
    render_tile(scene, cfg, key, idx0, sw, sh, maps).block_until_ready()
    compile_s = time.time() - t0

    t0 = time.perf_counter()
    outs = []
    for t in chosen:
        key, sub = jax.random.split(key)
        idx = int(t) * tile + jnp.arange(tile, dtype=jnp.int32)
        outs.append(render_tile(scene, cfg, sub, idx, sw, sh, maps))
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - t0
    return elapsed * (n_tiles / n_sample), compile_s, n_sample / n_tiles


def _bench_caustic_combined(grid, map_photons):
    """Direct + caustic 512^2, 4 samples/px, 10M-photon caustic map,
    cs=225 cd=0.225 (README.md:362: 1564.3 s)."""
    from gi_tpu.photon.gather import PhotonMaps
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene(f"{INPUT}/caustic.scn")
    cfg = RenderConfig(width=512, height=512, aa=1, indirect_illum=False,
                       caustic_estimate_size=225,
                       caustic_estimate_dist=0.225, ray_tile=8192)
    maps = PhotonMaps(global_=None, caustic=grid)
    est_s, compile_s, frac = _timed_subset_render(scene, cfg, maps, 1 / 8)
    return {
        "metric": "direct_plus_caustic_512_seconds",
        "value": round(est_s, 2),
        "unit": "s/frame",
        "vs_baseline": round(1564.3 / est_s, 2),
        "compile_s": round(compile_s, 1),
        "sampled_fraction": round(frac, 4),
        "map_photons": int(map_photons),
    }


def _bench_indirect():
    """Indirect importance-sampled layer, 512^2, 1 spp, 64 samples
    (README.md:393: 51.8 s at 64 samples)."""
    from gi_tpu.photon.trace import build_photon_maps
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene(f"{INPUT}/cornell.scn")
    cfg = RenderConfig(width=512, height=512, aa=0, direct_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, indirect_illum=True,
                       indirect_test=64, global_photon_count=2176,
                       global_estimate_size=50, global_estimate_dist=2.5,
                       ray_tile=4096)
    maps, cfg = build_photon_maps(scene, cfg, jax.random.PRNGKey(3))
    est_s, compile_s, frac = _timed_subset_render(scene, cfg, maps, 1 / 4)
    return {
        "metric": "indirect64_512_seconds",
        "value": round(est_s, 2),
        "unit": "s/frame",
        "vs_baseline": round(51.8 / est_s, 2),
        "compile_s": round(compile_s, 1),
        "sampled_fraction": round(frac, 4),
    }


_T_START = time.time()
# Wall-clock budget for the extras ladder: past it, remaining rungs are
# skipped so the primary metric always reaches stdout before any outer
# driver timeout.
_BUDGET_S = float(os.environ.get("GI_BENCH_BUDGET_S", "900"))


def _note(msg):
    print(f"[bench +{time.time() - _T_START:.0f}s] {msg}", file=sys.stderr,
          flush=True)


def _over_budget():
    return time.time() - _T_START > _BUDGET_S


def main():
    _note("primary: cornell 1024^2 direct rays/s")
    primary = _bench_direct_rays()
    _note(f"primary done: {primary['value']:.3g} rays/s")
    extras = []
    try:
        _note("extras: caustic photon trace (2M)")
        photon_metric, grid = _bench_photon_trace()
        extras.append(photon_metric)
        _note(f"photons/s done: {photon_metric['value']:.3g}")
        stored = photon_metric["stored"]
        if photon_metric["value"] > 50_000 and not _over_budget():
            # fast enough to trace the full matched-config 10M map
            from gi_tpu.photon.trace import MAP_CAUSTIC, trace_photon_map
            from gi_tpu.scene.scn import load_scene
            from gi_tpu.utils.config import RenderConfig
            scene = load_scene(f"{INPUT}/caustic.scn")
            cfg = RenderConfig(caustic_photon_count=10_000_000,
                               max_photon_depth=128)
            _note("extras: tracing full 10M caustic map")
            grid, st = trace_photon_map(scene, cfg, jax.random.PRNGKey(4),
                                        MAP_CAUSTIC)
            stored = int(st["stored"])
        if _over_budget():
            extras.append({"metric": "direct_plus_caustic_512_seconds",
                           "skipped": "bench budget exhausted"})
        else:
            _note("extras: direct+caustic 512^2 render")
            extras.append(_bench_caustic_combined(grid, stored))
    except Exception as e:  # keep the primary metric alive
        extras.append({"metric": "caustic_bench_error", "error": repr(e)})
    try:
        if _over_budget():
            extras.append({"metric": "indirect64_512_seconds",
                           "skipped": "bench budget exhausted"})
        else:
            _note("extras: indirect 64-sample 512^2 render")
            extras.append(_bench_indirect())
    except Exception as e:
        extras.append({"metric": "indirect_bench_error", "error": repr(e)})
    out = dict(primary)
    out["device"] = str(jax.devices()[0])
    out["extras"] = extras
    print(json.dumps(out))


if __name__ == "__main__":
    main()
