"""Frame renderer: the reference's threaded pixel loop (render.cpp:48-221)
re-expressed as jitted wavefront tiles.

The reference gives thread k the pixel columns i % THREADS == k and loops
pixels serially; here a tile of pixel indices becomes one batched program:
eye-ray generation (incl. DOF sample dim) -> closest hit -> shading -> DOF
mean, jitted once and swept over the framebuffer by a host loop.  Supersampled
anti-aliasing (2^aa per axis + clamp + box filter, render.cpp:173-221) is done
on the full supersampled buffer at the end.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling as S
from ..ops.intersect import intersect_scene
from ..scene.types import Scene
from ..utils import stats as ST
from ..utils.config import RenderConfig
from . import montecarlo
from .camera import eye_rays
from .direct import shade_direct


def shade_hits(scene: Scene, cfg: RenderConfig, key, hit, ray_o, ray_d,
               photon_maps=None):
    """Per-hit shading decomposition — reference RayTrace
    (raytracer.cpp:174-233): ambient + direct + transmissive + specular +
    indirect + caustic (+ photon visualization), each gated by config.

    Returns (color [B,3], counters [stats.N_COUNTERS] int32)."""
    mats = scene.materials
    B = hit.t.shape[0]
    color = jnp.zeros((B, 3))

    ka = S.take_rows(mats.ka, hit.mat)
    kd = S.take_rows(mats.kd, hit.mat)
    ks = S.take_rows(mats.ks, hit.mat)
    kt = S.take_rows(mats.kt, hit.mat)

    if cfg.ambient:
        # global ambient + material ambient (raytracer.cpp:181-199)
        is_amb = jnp.any(ka > 0, axis=-1)
        color = color + scene.ambient + jnp.where(is_amb[:, None], ka, 0.0)

    counters = jnp.zeros((ST.N_COUNTERS,), jnp.int32)
    if cfg.direct_illum:
        key, sub = jax.random.split(key)
        color = shade_direct(scene, cfg, sub, hit, ray_o, color,
                             in_monte_carlo=False)
        # primary shadow-ray accounting: rays fired per shaded hit
        # (illumination_utils.cpp:149-261)
        shaded = hit.valid & (jnp.any(kd > 0, -1) | jnp.any(ks > 0, -1))
        factor = montecarlo._shadow_rays_per_light(scene, cfg,
                                                   in_monte_carlo=False)
        counters = counters.at[ST.SHADOW].add(
            jnp.sum(shaded, dtype=jnp.int32) * factor)

    # Secondary terms (Monte Carlo / photon map layers)
    out = montecarlo.shade_secondary(
        scene, cfg, key, hit, ray_o, ray_d, color, photon_maps)
    color, sec_counters = out[0], out[1]
    counters = counters + sec_counters

    color = jnp.where(hit.valid[:, None], color, scene.background)
    if len(out) == 4:  # deferred-gather queues (ShardedMaps, P8)
        return color, counters, out[2], out[3]
    return color, counters


@partial(jax.jit, static_argnames=("cfg", "width", "height", "with_stats"))
def render_tile(scene: Scene, cfg: RenderConfig, key, pixel_idx: jnp.ndarray,
                width: int, height: int, photon_maps=None,
                with_stats: bool = False):
    """Render a tile of supersampled pixels -> [B,3] colors (DOF-averaged),
    plus a per-category dispatched-ray counter vector when with_stats.

    With a ShardedMaps (P8 deferred-gather render) the return is instead
    (color_lanes [B*n_dof,3], counters, caustic_queue, global_queue): the
    photon-map terms are NOT in the colors yet — the caller must answer
    the queues with the ring gather, scatter-add est*weight at queue rows,
    and only then average the DOF dim (parallel/mesh.py)."""
    n_dof = cfg.dof_test if cfg.depth_of_field else 1
    key_dof, key_shade = jax.random.split(key)
    o, d = eye_rays(scene, cfg, key_dof, pixel_idx, width, height, n_dof)
    B = pixel_idx.shape[0]
    o = o.reshape(B * n_dof, 3)
    d = d.reshape(B * n_dof, 3)
    hit = intersect_scene(scene, o, d, t_min=0.0)
    out = shade_hits(scene, cfg, key_shade, hit, o, d, photon_maps)
    color, counters = out[0], out[1]
    counters = counters.at[ST.SCREEN].add(B * n_dof)
    if len(out) == 4:
        return color, counters, out[2], out[3]
    color = color.reshape(B, n_dof, 3).mean(axis=1)
    if not with_stats:
        return color
    return color, counters


@partial(jax.jit, static_argnames=())
def _dedupe_queue(d, rows):
    """EXACT dedupe of a queue slice: non-distributed transmissive/specular
    spawns trace -tt/-st identical rays (the reference averages up to 128
    identical samples, raytracer.cpp:57-110), so most requests are copies
    of the same (row, point) with the same estimate — sort, segment, and
    merge their weights so each distinct query is answered once (central
    caustic tiles: ~500k requests -> a few thousand distinct).

    key = (row, point xyz, bounce-x, cos_theta): the bounce/ct fields
    discriminate coincident points reached by DIFFERENT walk bounces
    (e.g. a specular loop re-hitting a point at a later depth), whose
    estimates differ even though the position matches (ADVICE r4).

    Jitted: this ran as ~25 eager ops over up-to-524288-row arrays and
    dominated the caustic-rung tile time (~12 s/tile warm on a remote
    device; fused it is milliseconds)."""
    key_sorted = jnp.lexsort((d[9][:], d[6][:], d[2][:], d[1][:], d[0][:],
                              rows))
    ds = tuple(c[key_sorted] for c in d)
    rs = rows[key_sorted]
    neq = ((rs[1:] != rs[:-1]) | (ds[0][1:] != ds[0][:-1])
           | (ds[1][1:] != ds[1][:-1]) | (ds[2][1:] != ds[2][:-1])
           | (ds[6][1:] != ds[6][:-1]) | (ds[9][1:] != ds[9][:-1]))
    uniq = jnp.concatenate([jnp.ones((1,), bool), neq])
    seg = jnp.cumsum(uniq.astype(jnp.int32)) - 1
    return ds, rs, seg, seg[-1] + 1


@partial(jax.jit, static_argnames=("bucket_u", "est_size", "est_dist",
                                   "filt", "cfg", "cached", "cap"))
def _answer_dedup(grid, ds, rs, seg, n_u, color, *, bucket_u, est_size,
                  est_dist, filt, cfg, cached, cap):
    """Scatter the deduped queries into a bucket_u-row batch, run ONE
    batched radiance estimate, scatter-add est*weight at the queue rows.
    Dead rows (>= n_u) get points far OUTSIDE the grid: a zero-filled dead
    row sits at the origin, and on caustic maps the origin is the focus
    hotspot — thousands of padded rows each streaming the densest cell
    measured as tens of seconds per tile."""
    from ..photon import gather as G

    bucket = rs.shape[0]
    # duplicates have IDENTICAL fields, so scatter-set per segment is
    # order-independent; weights scatter-ADD (the merge)
    rep = [jnp.zeros((bucket,), c.dtype).at[seg].set(c)[:bucket_u]
           for c in ds[:17]]
    w_sum = [jnp.zeros((bucket,)).at[seg].add(c)[:bucket_u]
             for c in ds[17:20]]
    rep_rows = jnp.full((bucket,), cap, jnp.int32).at[seg].set(
        rs)[:bucket_u]

    live = jnp.arange(bucket_u) < n_u
    pt = jnp.where(live[:, None], jnp.stack(rep[0:3], 1), 1e9)
    nm = jnp.stack(rep[3:6], 1)
    bo = jnp.stack(rep[6:9], 1)
    ct = rep[9]
    kd = jnp.stack(rep[10:13], 1)
    ks = jnp.stack(rep[13:16], 1)
    sh_ = rep[16]
    w = jnp.stack(w_sum, 1)
    if cached:
        est = G.estimate_cached_radiance(grid, pt, nm, bo, ct, kd, ks, sh_,
                                         est_dist)
    else:
        est = G.estimate_radiance(grid, pt, nm, bo, ct, kd, ks, sh_,
                                  est_size, est_dist, filt, cfg)
    return color.at[rep_rows].add(est * w, mode="drop")


def _answer_queue_host(grid, q, color, est_size, est_dist, filt, cfg,
                       cached: bool = False):
    """Answer a deferred GatherQueue outside the tile program: slice the
    filled prefix (bucketed to 8192 rows for compile-cache stability),
    dedupe, run ONE right-sized batched gather, scatter-add est*weight at
    the queue rows.  Returns (color, n_dropped).  The host slice is what
    makes big maps affordable: queue capacity is one request per walk lane
    (~2.1M at the reference's -tt/-st 128 expansion) but the filled prefix
    is typically a few thousand.  Exactly two host syncs: the filled count
    and the distinct count (each picks a static bucket shape)."""
    cap = q.row.shape[0]
    count = int(q.count)
    n = min(count, cap)
    if n == 0:
        return color, max(count - cap, 0)

    def _bucket(m):
        # 1x / 1.5x power-of-two steps: few distinct compile shapes
        # (every distinct slice size compiles its own gather executable,
        # ~minutes through the remote-compile tunnel), <= 33% overshoot
        p2 = 1 << max(13, (m - 1).bit_length())
        return p2 if m > 3 * p2 // 4 else 3 * p2 // 4

    bucket = min(cap, _bucket(n))
    d = tuple(c[:bucket] for c in q.data)
    rows = q.row[:bucket]
    ds, rs, seg, n_u_dev = _dedupe_queue(d, rows)
    n_u = int(n_u_dev)
    bucket_u = min(bucket, _bucket(n_u))
    color = _answer_dedup(grid, ds, rs, seg, n_u_dev, color,
                          bucket_u=bucket_u, est_size=est_size,
                          est_dist=est_dist, filt=filt, cfg=cfg,
                          cached=cached, cap=cap)
    return color, max(count - cap, 0)


def render_image(scene: Scene, cfg: RenderConfig, photon_maps=None,
                 progress=None, stats=None, mesh=None) -> np.ndarray:
    """Render the full image; returns [H,W,3] float (row 0 = bottom).
    Pass a utils.stats.RenderStats as `stats` to collect ray counters.

    With `mesh` (a jax.sharding.Mesh) each tile's pixel batch is sharded
    over the mesh 'rays' axis (P1, SURVEY §2.3 — the TPU-native form of the
    reference's threaded pixel loop, render.cpp:188-199) and the per-device
    ray counters come back psum'd (P4)."""
    aa_factor = 2 ** cfg.aa
    sw, sh = cfg.width * aa_factor, cfg.height * aa_factor
    total = sw * sh
    tile = min(cfg.ray_tile, total)
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(mesh.devices.shape))
        if n_dev <= 1:
            mesh = None
        else:
            tile += (-tile) % n_dev  # sharded batch must divide evenly
    map_sharded = False
    if mesh is not None:
        from ..parallel.mesh import render_tile_mapsharded, render_tile_sharded
        from ..photon.gather import ShardedMaps
        map_sharded = isinstance(photon_maps, ShardedMaps)
        if photon_maps is not None and not map_sharded:
            # P8 policy: keep big maps device-sharded through the render
            # (ring-exchange deferred gather) instead of replicating them
            sizes = [g.pos.shape[0] for g in (photon_maps.global_,
                                              photon_maps.caustic)
                     if g is not None]
            if cfg.shard_maps or (sizes
                                  and max(sizes) > cfg.shard_maps_threshold):
                from ..parallel.gather import build_sharded_maps
                photon_maps = build_sharded_maps(photon_maps, cfg, mesh)
                map_sharded = True
    dropped_gathers = 0

    key = jax.random.PRNGKey(cfg.seed)
    fb = np.zeros((total, 3), np.float32)
    n_tiles = (total + tile - 1) // tile
    t0 = time.time()
    for t in range(n_tiles):
        start = t * tile
        idx = (start + jnp.arange(tile, dtype=jnp.int32)) % total
        key, sub = jax.random.split(key)
        if map_sharded:
            out = render_tile_mapsharded(scene, cfg, sub, idx, sw, sh, mesh,
                                         photon_maps,
                                         with_stats=stats is not None)
            dropped_gathers += int(out[-1])
            out = out[:-1]
            out = out[0] if len(out) == 1 else out
        elif mesh is not None:
            out = render_tile_sharded(scene, cfg, sub, idx, sw, sh, mesh,
                                      photon_maps,
                                      with_stats=stats is not None)
        else:
            out = render_tile(scene, cfg, sub, idx, sw, sh, photon_maps,
                              with_stats=stats is not None)
            if isinstance(out, tuple) and len(out) == 4:
                # big replicated maps: the tile deferred its photon-map
                # requests — answer the queues' REAL prefix here (the
                # capacity covers one request per walk lane; answering
                # in-program paid full-capacity kNN per tile)
                color, counters, cq, gq = out
                if cq is not None:
                    color, d = _answer_queue_host(
                        photon_maps.caustic, cq, color,
                        cfg.caustic_estimate_size, cfg.caustic_estimate_dist,
                        cfg.caustic_filter, cfg)
                    dropped_gathers += d
                if gq is not None:
                    color, d = _answer_queue_host(
                        photon_maps.global_, gq, color,
                        cfg.global_estimate_size, cfg.global_estimate_dist,
                        cfg.global_filter, cfg,
                        cached=cfg.irradiance_cache)
                    dropped_gathers += d
                n_dof = cfg.dof_test if cfg.depth_of_field else 1
                color = color.reshape(tile, n_dof, 3).mean(axis=1)
                out = (color, counters) if stats is not None else color
        if stats is not None:
            out, counters = out
            stats.add(np.asarray(counters))
        out = np.asarray(out)
        end = min(start + tile, total)
        fb[start:end] = out[: end - start]
        if progress is not None:
            progress((t + 1) / n_tiles)
    if stats is not None:
        stats.seconds += time.time() - t0
    if dropped_gathers:
        import sys
        print(f"gi_tpu: warning: {dropped_gathers} deferred gather "
              f"requests overflowed their queues (sharded-map render); "
              f"the image is missing that photon-map energy — raise the "
              f"queue capacity or render smaller tiles", file=sys.stderr)

    # Clamp each supersample, then box-filter down (render.cpp:204-221)
    img = np.clip(fb.reshape(sh, sw, 3), 0.0, 1.0)
    img = img.reshape(cfg.height, aa_factor, cfg.width, aa_factor, 3)
    return img.mean(axis=(1, 3))
