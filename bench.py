"""Benchmark ladder: the BASELINE.md configs, measured on real TPU.

Structured so the driver can never lose the record:

  1. a persistent compilation cache (.jax_cache, committed with the repo)
     is enabled before anything compiles — the build rounds warm it, so
     driver runs deserialize executables in ~1 s instead of recompiling
     for minutes through the TPU tunnel;
  2. the PRIMARY metric line is printed (flushed) the moment it is
     measured; the extended object with the extras ladder is re-printed
     as the final line — whichever line a parser takes, it parses;
  3. every extras rung runs in its OWN SUBPROCESS (round-3 lesson: a TPU
     device fault in the caustic-render rung wedged the chip for the
     whole process and erased every later rung's number).  A rung that
     faults records its error; the next rung gets a fresh process and a
     fresh device handle.  Rungs hand the traced 10M caustic map across
     process boundaries via a GIPM checkpoint (photon/checkpoint.py);
  4. every extras rung checks a wall-clock budget (GI_BENCH_BUDGET_S,
     default 360 s) and is skipped, not killed, when it would not fit.

Primary metric (backward-compatible with rounds 1-3): rays/s on
cornell.scn 1024x1024 direct illumination (aa=0), vs the reference's
~7.16e5 rays/s aggregate on 8 CPU threads (README.md:403).  Ray counting
matches the reference (render.cpp:224-254): screen rays + shadow rays,
taken from the renderer's own per-category counters.

`extras` is the matched-config ladder from BASELINE.md:
  - caustic_photons_stored_per_s: caustic.scn map tracing (reference:
    100M stored in 300 s = 3.33e5/s, README.md:357).  This rung also
    traces the full 10M matched-config map and checkpoints it for the
    render rung.
  - direct_plus_caustic_512_seconds: 512^2, 4 samples/px, 10M-photon
    caustic map, cs=225 cd=0.225 (reference: 1564.3 s, README.md:362).
  - indirect64_512_seconds: importance-sampled indirect, 512^2, 1 spp,
    64 samples, ~2k-photon global map (reference: 51.8 s, README.md:393).
  - mesh_closest_hit_rays_per_s: 1M eye rays x 172,792 tris (2x
    violinBody.off), Pallas block-culled kernel vs the plain jnp scan —
    the driver-recorded form of the triangle-path numbers
    (R3Isect.cpp:800-833 is a linear scan; the reference has no BVH).
  - caustic_photons_50M: the same tracer at the reference's headline
    scale (>=50M stored, zero overflow drops) + grid build time.

Render-time metrics time a uniformly random subset of the supersample
batch and scale to the full frame (unbiased: every pixel batch costs the
same program; noted via `sampled_fraction`).  Compile time is excluded
(reported separately) — the reference numbers are steady-state render
loops, and a production renderer amortizes one compile over many frames.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

INPUT = "/root/reference/input"
MAP10M_DIR = "/tmp/gi_bench_caustic10m"

_T_START = time.time()
# Wall-clock budget for the extras ladder: a rung only starts if the
# elapsed time is under this, so the final JSON always reaches stdout
# before any outer driver timeout (the round-2 driver killed bench at
# +533 s — 440 leaves the final print comfortably inside that window).
_BUDGET_S = float(os.environ.get("GI_BENCH_BUDGET_S", "440"))


def _note(msg):
    print(f"[bench +{time.time() - _T_START:.0f}s] {msg}", file=sys.stderr,
          flush=True)


def _remaining():
    return _BUDGET_S - (time.time() - _T_START)


def _init_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return jax


# --------------------------------------------------------------------------
# rung bodies (each runs inside its own subprocess via `bench.py --rung X`)
# --------------------------------------------------------------------------

def _bench_direct_rays():
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np
    from gi_tpu.models.render import render_tile
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils import stats as ST
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene(f"{INPUT}/cornell.scn")
    res = 1024
    tile = res * res
    cfg = RenderConfig(width=res, height=res, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       ray_tile=tile)
    key = jax.random.PRNGKey(0)
    idx0 = jnp.arange(tile, dtype=jnp.int32)

    t0 = time.time()
    color, counters = render_tile(scene, cfg, key, idx0, res, res, None,
                                  with_stats=True)
    jax.block_until_ready(color)
    compile_s = time.time() - t0
    c = np.asarray(counters)
    # reference-style ray count: screen + shadow (render.cpp:224-254);
    # deterministic per frame (hard shadow rays depend only on hits)
    total_rays = int(c[ST.SCREEN] + c[ST.SHADOW])

    elapsed = float("inf")
    for _ in range(3):
        key, sub = jax.random.split(key)
        start = time.perf_counter()
        out = render_tile(scene, cfg, sub, idx0, res, res, None,
                          with_stats=True)
        jax.block_until_ready(out)
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


def _bench_photon_trace(goal, metric, baseline_pps, depth=128,
                        double_run=True, save_10m=False, do_50m=False):
    jax = _init_jax()
    from gi_tpu.photon.checkpoint import save_maps
    from gi_tpu.photon.gather import PhotonMaps
    from gi_tpu.photon.trace import MAP_CAUSTIC, trace_photon_map
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene(f"{INPUT}/caustic.scn")
    cfg = RenderConfig(caustic_photon_count=goal, max_photon_depth=depth)
    # First run pays the per-process program loads for every emission rung
    # the quota loop reaches (tracing + lowering + compile-cache
    # deserialization — quantized round sizes escalate with the goal, so a
    # small-goal warm-up would NOT cover the big rungs); the second run is
    # the steady-state measurement.
    compile_s = 0.0
    if double_run:
        t0 = time.time()
        trace_photon_map(scene, cfg, jax.random.PRNGKey(1), MAP_CAUSTIC)
        compile_s = time.time() - t0

    t0 = time.time()
    grid, stats = trace_photon_map(scene, cfg, jax.random.PRNGKey(2),
                                   MAP_CAUSTIC)
    elapsed = time.time() - t0
    stored = int(stats["stored"])
    pps = stored / max(stats["seconds"], 1e-9)
    out = {
        "metric": metric,
        "value": round(pps, 1),
        "unit": "photons/s",
        "vs_baseline": round(pps / baseline_pps, 3),
        "elapsed_s": round(elapsed, 2),
        "trace_s": round(stats["seconds"], 2),
        "grid_build_s": round(stats.get("build_s", 0.0), 2),
        "warm_run_s": round(compile_s, 1),
        "stored": stored,
        "emitted": int(stats["emitted"]),
        "overflow_rounds": int(stats["overflow_rounds"]),
    }
    if save_10m:
        _note("tracing full 10M caustic map for the render rung")
        cfg10 = RenderConfig(caustic_photon_count=10_000_000,
                             max_photon_depth=depth)
        t0 = time.time()
        grid10, st10 = trace_photon_map(scene, cfg10, jax.random.PRNGKey(4),
                                        MAP_CAUSTIC)
        out["trace_10m_s"] = round(time.time() - t0, 1)
        out["stored_10m"] = int(st10["stored"])
        save_maps(MAP10M_DIR, PhotonMaps(global_=None, caustic=grid10))
    if do_50m and _remaining() > 90:
        # headline-scale trace in the SAME subprocess: it reuses the
        # emission/grid programs this process already loaded (a separate
        # rung paid the ~70 s per-process program-load tax again just to
        # run ~30 s of tracing).  Guarded so a fault here can never erase
        # the 2M/10M records above; the smaller maps are dropped first —
        # a 50M build needs every byte of HBM.
        _note("tracing 50M-stored map (reference headline scale)")
        del grid
        grid10 = None  # noqa: F841 — the 10M grid is checkpointed on disk
        try:
            cfg50 = RenderConfig(caustic_photon_count=50_000_000,
                                 max_photon_depth=depth)
            t0 = time.time()
            grid50, st50 = trace_photon_map(scene, cfg50,
                                            jax.random.PRNGKey(6),
                                            MAP_CAUSTIC)
            el50 = time.time() - t0
            st_50 = int(st50["stored"])
            out["extra_50m"] = {
                "metric": "caustic_photons_50M",
                "value": round(st_50 / max(st50["seconds"], 1e-9), 1),
                "unit": "photons/s",
                "vs_baseline": round(
                    st_50 / max(st50["seconds"], 1e-9) / baseline_pps, 3),
                "elapsed_s": round(el50, 2),
                "trace_s": round(st50["seconds"], 2),
                "grid_build_s": round(st50.get("build_s", 0.0), 2),
                "stored": st_50,
                "kept": int(st50.get("kept", st_50)),
                "emitted": int(st50["emitted"]),
                "overflow_rounds": int(st50["overflow_rounds"]),
            }
        except Exception as e:  # noqa: BLE001 — record, keep main result
            out["extra_50m"] = {"metric": "caustic_photons_50M",
                                "error": repr(e)}
    return out


def _timed_subset_render(scene, cfg, maps, fraction, seed=0,
                         counters_out=None):
    """Time a random `fraction` of the supersample batch; return
    (estimated full-frame seconds, compile seconds, fraction).  Big
    replicated maps defer their photon-map requests out of the tile
    program; answering them (the production path, models/render.py) is
    part of the timed work.  Pass `counters_out` (int64 array >= 8 wide)
    to accumulate the sampled tiles' per-category ray counters."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gi_tpu.models.render import _answer_queue_host, render_tile

    aa_factor = 2 ** cfg.aa
    sw, sh = cfg.width * aa_factor, cfg.height * aa_factor
    total = sw * sh
    tile = min(cfg.ray_tile, total)
    n_tiles = total // tile
    n_sample = max(1, int(n_tiles * fraction))
    rng = np.random.default_rng(seed)
    chosen = rng.choice(n_tiles, size=n_sample, replace=False)

    def run_one(sub, idx):
        out = render_tile(scene, cfg, sub, idx, sw, sh, maps,
                          with_stats=counters_out is not None)
        if isinstance(out, tuple) and len(out) == 4:
            color, counters, cq, gq = out
            if counters_out is not None:
                c = np.asarray(counters)
                counters_out[:c.shape[0]] += c
            if cq is not None:
                color, _ = _answer_queue_host(
                    maps.caustic, cq, color, cfg.caustic_estimate_size,
                    cfg.caustic_estimate_dist, cfg.caustic_filter, cfg)
            if gq is not None:
                color, _ = _answer_queue_host(
                    maps.global_, gq, color, cfg.global_estimate_size,
                    cfg.global_estimate_dist, cfg.global_filter, cfg,
                    cached=cfg.irradiance_cache)
            n_dof = cfg.dof_test if cfg.depth_of_field else 1
            return color.reshape(-1, n_dof, 3).mean(axis=1)
        if isinstance(out, tuple) and len(out) == 2:
            color, counters = out
            if counters_out is not None:
                c = np.asarray(counters)
                counters_out[:c.shape[0]] += c
            return color
        return out

    key = jax.random.PRNGKey(cfg.seed)
    idx0 = jnp.arange(tile, dtype=jnp.int32)
    t0 = time.time()
    jax.block_until_ready(run_one(key, idx0))
    compile_s = time.time() - t0
    if counters_out is not None:
        counters_out[:] = 0  # don't count the warm-up tile

    t0 = time.perf_counter()
    for t in chosen:
        key, sub = jax.random.split(key)
        idx = int(t) * tile + jnp.arange(tile, dtype=jnp.int32)
        jax.block_until_ready(run_one(sub, idx))
    elapsed = time.perf_counter() - t0
    return elapsed * (n_tiles / n_sample), compile_s, n_sample / n_tiles


def _bench_caustic_combined():
    """Direct + caustic 512^2, 4 samples/px, 10M-photon caustic map,
    cs=225 cd=0.225 (README.md:362: 1564.3 s).  Loads the 10M map the
    trace rung checkpointed; traces it fresh if the checkpoint is
    missing (e.g. the trace rung faulted)."""
    jax = _init_jax()
    from gi_tpu.photon.checkpoint import load_maps
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene(f"{INPUT}/caustic.scn")
    if os.path.isdir(MAP10M_DIR):
        maps = load_maps(MAP10M_DIR)
    else:
        from gi_tpu.photon.trace import MAP_CAUSTIC, trace_photon_map
        from gi_tpu.photon.gather import PhotonMaps
        cfg10 = RenderConfig(caustic_photon_count=10_000_000,
                             max_photon_depth=128)
        grid10, _ = trace_photon_map(scene, cfg10, jax.random.PRNGKey(4),
                                     MAP_CAUSTIC)
        maps = PhotonMaps(global_=None, caustic=grid10)
    map_photons = int(jax.numpy.sum(maps.caustic.valid))
    cfg = RenderConfig(width=512, height=512, aa=1, indirect_illum=False,
                       caustic_estimate_size=225,
                       caustic_estimate_dist=0.225, ray_tile=8192)
    est_s, compile_s, frac = _timed_subset_render(scene, cfg, maps, 1 / 16)
    return {
        "metric": "direct_plus_caustic_512_seconds",
        "value": round(est_s, 2),
        "unit": "s/frame",
        "vs_baseline": round(1564.3 / est_s, 2),
        "compile_s": round(compile_s, 1),
        "sampled_fraction": round(frac, 4),
        "map_photons": map_photons,
    }


def _bench_indirect():
    """Indirect importance-sampled layer, 512^2, 1 spp, 64 samples
    (README.md:393: 51.8 s at 64 samples)."""
    jax = _init_jax()
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
    est_s, compile_s, frac = _timed_subset_render(scene, cfg, maps, 1 / 8)
    return {
        "metric": "indirect64_512_seconds",
        "value": round(est_s, 2),
        "unit": "s/frame",
        "vs_baseline": round(51.8 / est_s, 2),
        "compile_s": round(compile_s, 1),
        "sampled_fraction": round(frac, 4),
    }


_BIGMESH_SCN = """\
# bench scene: two violinBody meshes (2 x 86,396 = 172,792 triangles)
camera  0 0.15 1.2   0 0 -1   0 1 0   0.35   0.01 100
point_light  10 10 10   1 2 2   0 0 1
material  0 0 0  0.7 0.7 0.7  0.2 0.2 0.2  0 0 0  0 0 0  10 1 0
mesh 0 {input}/violinBody.off
begin -1
  1 0 0 0.25
  0 1 0 0
  0 0 1 -0.1
  0 0 0 1
  mesh 0 {input}/violinBody.off
end
"""


def _bench_mesh_closest_hit():
    """1M primary rays against a 172,792-triangle scene: the Pallas
    block-culled closest-hit kernel vs the plain jnp triangle scan — the
    triangle path the reference does with a per-array linear scan
    (R3Isect.cpp:800-833, no BVH)."""
    jax = _init_jax()
    import jax.numpy as jnp
    from gi_tpu.models.camera import eye_rays
    from gi_tpu.ops import intersect as I
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scn_path = "/tmp/gi_bench_bigmesh.scn"
    with open(scn_path, "w") as f:
        f.write(_BIGMESH_SCN.format(input=INPUT))
    scene = load_scene(scn_path)
    n_tris = int(scene.tris.v0.shape[0])
    res = 1024
    cfg = RenderConfig(width=res, height=res, aa=0)
    o, d = eye_rays(scene, cfg, jax.random.PRNGKey(0),
                    jnp.arange(res * res, dtype=jnp.int32), res, res, 1)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    def timed(mode, o_, d_):
        # a FRESH jit closure per mode: the pallas-mode flag is read at
        # trace time, so reusing one jitted function across modes would
        # silently reuse the first mode's executable (round-3 warm run
        # measured identical pallas/plain times for exactly this reason)
        hit_fn = jax.jit(lambda s, oo, dd: I.intersect_scene(s, oo, dd).t)
        I.set_pallas_mode(mode)
        try:
            t0 = time.time()
            hit_fn(scene, o_, d_).block_until_ready()
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                hit_fn(scene, o_, d_).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best, compile_s
        finally:
            I.set_pallas_mode("auto")

    pallas_s, pallas_compile = timed("always", o, d)
    # roofline anchor (VERDICT r3 #9): the Pallas kernel's own FLOP count
    # per ray-triangle test, vs v5e peak (197 TFLOP/s bf16 ~ 98e12 f32
    # MACs; the intersect kernel is f32 VPU work, peak ~= 0.9e12 f32
    # FLOP/s/core x ... report achieved FLOP/s and leave peak to the
    # reader via `flops_per_raytri`).
    FLOPS_PER_RAYTRI = 44.0  # ops/pallas_intersect.py cost_estimate
    achieved = o.shape[0] * n_tris * FLOPS_PER_RAYTRI / pallas_s
    out = {
        "metric": "mesh_closest_hit_rays_per_s",
        "value": round(o.shape[0] / pallas_s, 1),
        "unit": "rays/s",
        "n_tris": n_tris,
        "pallas_ms": round(pallas_s * 1e3, 1),
        "compile_s": round(pallas_compile, 1),
        "achieved_tflops": round(achieved / 1e12, 2),
    }
    if _remaining() > 60:
        # the plain scan materializes [rays, tri_chunk, 3] temporaries —
        # 1M rays x 172k tris OOMs 16 GB HBM — so time it on a 128k-ray
        # subset (rays/s is scale-invariant here) and compare rates
        nsub = 131072
        plain_s, _ = timed("never", o[:nsub], d[:nsub])
        out["plain_rays_per_s"] = round(nsub / plain_s, 1)
        out["pallas_speedup"] = round(
            (o.shape[0] / pallas_s) / (nsub / plain_s), 2)
    # NOTE: no like-for-like published baseline exists for an isolated
    # mesh-intersection rate; vs_pipeline_anchor compares against the
    # reference's full-pipeline aggregate (7.16e5 rays/s) for scale only
    # (ADVICE r3: renamed from vs_baseline to avoid implying parity).
    out["vs_pipeline_anchor"] = round(o.shape[0] / pallas_s / 7.16e5, 3)
    return out


def _bench_full_gi():
    """The headline every-layer frame: jensen.scn at 512^2 aa=1 with the
    reference Makefile's active flag profile (Makefile:12: lt 128 ss 96
    tt/st 512 md 128 it 960 -cf cone 1.0 -global 1M -gs 200 -gd .75) —
    the 512^2 form of the published 4096^2 full-GI render (README.md:403:
    169,452.5 s, 1.21e11 rays; 1/64 the pixels -> ~2,648 s pro-rated).
    Reports estimated full-frame seconds + measured rays/s."""
    jax = _init_jax()
    import numpy as np
    from gi_tpu.photon.trace import build_photon_maps
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene(f"{INPUT}/jensen.scn")
    cfg = RenderConfig(width=512, height=512, aa=1,
                       light_test=128, shadow_test=96,
                       transmissive_test=512, specular_test=512,
                       max_monte_depth=128, indirect_test=960,
                       caustic_filter=1, filter_const_k=1.0,
                       global_photon_count=1_000_000,
                       global_estimate_size=200, global_estimate_dist=0.75,
                       caustic_photon_count=2_000_000,
                       ray_tile=4096)
    t0 = time.time()
    maps, cfg = build_photon_maps(scene, cfg, jax.random.PRNGKey(5))
    maps_s = time.time() - t0
    stats = np.zeros(16, np.int64)

    est_s, compile_s, frac = _timed_subset_render(scene, cfg, maps, 1 / 64,
                                                  counters_out=stats)
    total_rays_est = int(stats[:7].sum() / frac)
    return {
        "metric": "full_gi_jensen_512_seconds",
        "value": round(est_s, 2),
        "unit": "s/frame",
        # pro-rated from the published 4096^2/2-day render (README.md:403)
        "vs_baseline": round(169452.5 / 64.0 / est_s, 2),
        "compile_s": round(compile_s, 1),
        "photon_maps_s": round(maps_s, 1),
        "sampled_fraction": round(frac, 4),
        "est_total_rays": total_rays_est,
        "rays_per_s": round(total_rays_est / max(est_s, 1e-9), 1),
    }


# caustic_photons_50M piggybacks on the trace rung's subprocess (shared
# program loads); _run_rung_subprocess lifts its `extra_50m` record into a
# top-level extras entry.
_RUNGS = {
    "caustic_photons_stored_per_s": lambda: _bench_photon_trace(
        2_000_000, "caustic_photons_stored_per_s", 3.33e5, save_10m=True,
        do_50m=True),
    "direct_plus_caustic_512_seconds": _bench_caustic_combined,
    "indirect64_512_seconds": _bench_indirect,
    "mesh_closest_hit_rays_per_s": _bench_mesh_closest_hit,
    "full_gi_jensen_512_seconds": _bench_full_gi,
}


def _run_rung_subprocess(name):
    """Run one extras rung in a fresh subprocess; parse its last stdout
    line as the metric JSON.  A faulted/killed rung yields an error record
    instead of poisoning the remaining ladder."""
    budget = _remaining()
    if budget < 30:
        return {"metric": name, "skipped": "bench budget"}
    _note(f"extras: {name} (subprocess, {budget:.0f}s left)")
    env = dict(os.environ)
    env["GI_BENCH_BUDGET_S"] = str(max(30.0, budget - 15.0))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--rung", name],
            capture_output=True, text=True, timeout=budget + 30, env=env,
            cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"metric": name, "error": f"rung timed out after "
                                         f"{budget + 30:.0f}s"}
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    tail = (proc.stderr or "").strip().splitlines()[-8:]
    return {"metric": name, "error": f"rung exited rc={proc.returncode} "
                                     f"with no JSON", "stderr_tail": tail}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--rung":
        name = sys.argv[2]
        try:
            out = _RUNGS[name]()
        except Exception as e:  # noqa: BLE001 — record, don't crash silent
            out = {"metric": name, "error": repr(e)}
        print(json.dumps(out), flush=True)
        return

    _note("primary: cornell 1024^2 direct rays/s")
    jax = _init_jax()
    primary = _bench_direct_rays()
    primary["device"] = str(jax.devices()[0])
    # flush the primary record immediately: the driver's parse can never
    # come up empty again, whatever happens to the extras below
    print(json.dumps(primary), flush=True)
    _note(f"primary done: {primary['value']:.3g} rays/s")

    extras = []
    for name in _RUNGS:
        rec = _run_rung_subprocess(name)
        fifty = rec.pop("extra_50m", None) if isinstance(rec, dict) else None
        extras.append(rec)
        if fifty:
            extras.append(fifty)
        for done in ([rec, fifty] if fifty else [rec]):
            if "value" in done:
                _note(f"  {done.get('metric', name)}: {done['value']} "
                      f"{done.get('unit', '')}")
            else:
                _note(f"  {done.get('metric', name)}: "
                      f"{done.get('error') or done.get('skipped')}")

    out = dict(primary)
    out["extras"] = extras
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
