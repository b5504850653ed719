"""Photon storage + radiance estimation on a sorted spatial-hash grid.

TPU-native replacement for the reference's pointer-chasing kd-tree kNN
(R3Kdtree::FindClosestQuick, R3Kdtree.cpp:690-788) and the radiance
estimators in photon_utils.cpp:72-246.  Photons are bucketed into a uniform
grid with cell size = the query radius cap (estimate_dist), sorted by cell
id (one argsort), and queried by gathering a *fixed-capacity* window from
each of the 27 neighboring cells — a dense, static-shape top-K that XLA maps
onto the VPU, instead of a per-ray recursive tree descent.

Over-full cells are handled by *stochastic decimation*: only the first
`cell_cap` photons of a cell are visible, and their flux is scaled by
count/cell_cap.  Both the K-th-NN radius and the flux sum scale by the same
factor, so the density estimate stays consistent (see discussion in
docs/DESIGN.md).

Per-photon memory: 12 B position + 6 B bf16 power + 2 B direction code =
20 B/photon (the reference packs 30 B/photon with RGBE color, README.md:309).
bf16 shares RGBE's 8-bit-exponent wide-range character but needs no
pack/unpack ALU on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import sampling as S


# Chunk width of the Pallas gather kernel's photon-window DMAs.  `packed`
# is padded in both dims for Mosaic's HBM tiling: 16 rows (sublane multiple
# of 8) x columns rounded up to a 2048 boundary plus one spare chunk, so a
# WCH- (v1, 512) or WCH2- (v2, 2048) aligned window start can never slice
# out of bounds.
_PACK_CHUNK = 2048


@struct.dataclass
class PhotonGrid:
    # static metadata
    dims: tuple = struct.field(pytree_node=False)      # (nx, ny, nz)
    cell_cap: int = struct.field(pytree_node=False)    # max photons read/cell
    sub_div: int = struct.field(pytree_node=False)     # subcell subdivision
                             # per axis (1 = no subcell table).  When > 1,
                             # photons are sorted by (cell, linear subcell)
                             # and `sub_start` indexes subcell runs — the
                             # table the v2 gather derives per-query search
                             # radii from WITHOUT streaming photons.
    # traced
    origin: jnp.ndarray      # [3]
    inv_h: jnp.ndarray       # [] 1 / cell size
    pos: jnp.ndarray         # [N,3] f32, sorted by cell id
    power: jnp.ndarray       # [N,3] bf16 flux (already power-normalized)
    dir_code: jnp.ndarray    # [N] int32 (uint16 range), incident direction
    valid: jnp.ndarray       # [N] bool
    cell_start: jnp.ndarray  # [ncells+1] int32
    packed: jnp.ndarray      # [16, Npad] f32 rows 0-8 = pos xyz, flux rgb,
                             # decoded incident xyz (rest zero padding) —
                             # the Pallas gather kernel's DMA-friendly,
                             # Mosaic-tiling-aligned SoA layout
    sub_start: jnp.ndarray | None = None  # [ncells*sub_div^3+1] int32

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz


@struct.dataclass
class PhotonMaps:
    global_: PhotonGrid | None
    caustic: PhotonGrid | None


@struct.dataclass
class ShardedMaps:
    """Photon maps for the P8 sharded-map render: `caustic`/`global_` are
    device-sharded (pos, flux, incident, valid) tuples laid out P('rays')
    by `parallel.gather.shard_photons`; the renderer defers their radiance
    estimates into fixed-capacity request queues and answers them with the
    ring-exchange gather after the walk (models/montecarlo.py,
    parallel/mesh.py::render_tile_mapsharded).

    `caustic_rep`/`global_rep` hold replicated PhotonGrids for layers that
    cannot defer (the irradiance-cache nearest-sample lookup); a map is in
    exactly one of the two slots."""
    caustic: tuple | None
    global_: tuple | None
    caustic_rep: PhotonGrid | None = None
    global_rep: PhotonGrid | None = None


# v2-gather subcell table policy: maps at/above this photon count get a
# per-cell subcell index (the τ-derivation table); below it, the v1
# 27-window streaming path is cheap anyway.  (Round 5: lowered 2^20 ->
# 2^17 — the v2 kernel's double-buffered accumulator stream is now
# strictly faster than v1's per-chunk histogram reductions for any map
# wide enough to have multi-chunk windows, e.g. the full-GI profile's
# 1M-photon global map.)
_SUBDIV_MIN_PHOTONS = 1 << 17
_SUBDIV_MAX_ENTRIES = 1 << 24


def _pick_sub_div(n_photons: int, n_cells: int) -> int:
    if n_photons < _SUBDIV_MIN_PHOTONS:
        return 1
    for s in (8, 4, 2):
        if n_cells * s ** 3 <= _SUBDIV_MAX_ENTRIES:
            return s
    return 1


def build_grid(pos: jnp.ndarray, power: jnp.ndarray, dir_code: jnp.ndarray,
               valid: jnp.ndarray, bbox_lo: np.ndarray, bbox_hi: np.ndarray,
               cell_size: float, cell_cap: int,
               max_dim: int = 256, dims: tuple | None = None,
               decorrelate: bool = True,
               sub_div: int | None = None) -> PhotonGrid:
    """Sort photons into a uniform grid.  bbox/cell_size are host values
    (static grid dims); photon arrays are device tensors.  `dims` overrides
    the derived grid dimensions (checkpoint restore passes the saved ones so
    the rebuilt grid is bit-identical).  `decorrelate=False` skips the
    within-cell permutation — checkpoint restore passes it because saved
    photons are already in a (decorrelated) cell-sorted order, and skipping
    it makes the rebuilt grid's photon ORDER bit-identical too.  `sub_div`
    overrides the subcell-table policy (tests force it on small maps)."""
    span = np.maximum(np.asarray(bbox_hi) - np.asarray(bbox_lo), 1e-6)
    cell = float(max(cell_size, span.max() / max_dim))
    if dims is None:
        dims = tuple(int(min(max_dim, max(1, np.ceil(s / cell))))
                     for s in span)
    else:
        dims = tuple(int(x) for x in dims)
    nx, ny, nz = dims
    n_cells = nx * ny * nz

    # Pad the photon count to the next power of two (invalid rows sort
    # last, outside every cell): render programs specialize on the map
    # size, so without bucketing every distinct stored count would trigger
    # a full recompile of each gather-bearing render program.
    n_in = pos.shape[0]
    n_bucket = max(1024, 1 << int(np.ceil(np.log2(max(n_in, 1)))))
    if n_bucket != n_in:
        pad = n_bucket - n_in
        pos = jnp.pad(pos, ((0, pad), (0, 0)))
        power = jnp.pad(power, ((0, pad), (0, 0)))
        dir_code = jnp.pad(dir_code, (0, pad))
        valid = jnp.pad(valid, (0, pad))

    if sub_div is None:
        sub_div = _pick_sub_div(n_in, n_cells)
    origin = jnp.asarray(np.asarray(bbox_lo, np.float32))
    inv_h = jnp.asarray(np.float32(1.0 / cell))
    outs = _build_grid_device(pos, power, dir_code, valid, origin, inv_h,
                              dims=dims, decorrelate=decorrelate,
                              sub_div=int(sub_div))
    pos_s, power_s, code_s, valid_s, cell_start, packed, sub_start = outs
    return PhotonGrid(
        dims=dims, cell_cap=int(cell_cap), sub_div=int(sub_div),
        origin=origin, inv_h=inv_h,
        pos=pos_s, power=power_s,
        dir_code=code_s, valid=valid_s,
        cell_start=cell_start, packed=packed, sub_start=sub_start)


@partial(jax.jit, static_argnames=("dims", "decorrelate", "sub_div"))
def _build_grid_device(pos, power, dir_code, valid, origin, inv_h, *,
                       dims, decorrelate, sub_div=1):
    """Device portion of build_grid under ONE jit: XLA plans buffer reuse
    across the permutation/sort/gather/pack chain instead of materializing
    every eager intermediate — at 67M padded rows the eager version held
    ~4 transient copies of the [16, N] pack and OOM'd 16 GB HBM during
    the 50M-photon build (round-4).  Inputs are NOT donated: callers
    rebuild grids from live grid fields (e.g. ring-gather tests).

    With sub_div > 1, photons sort by (cell, linear x-major subcell id)
    and `sub_start` indexes every subcell run: the v2 gather derives each
    query's search radius from the subcell COUNTS (no photon streaming)
    and streams only the subcell ranges its radius touches."""
    nx, ny, nz = dims
    n_cells = nx * ny * nz
    S3 = sub_div ** 3

    # Decorrelate within-(sub)cell order with a fixed odd-stride
    # permutation (bijective — the padded count is a power of two): the
    # stable sort below then leaves each bucket's photons in pseudo-random
    # order, so the Pallas gather's dense-cell truncation
    # (`gather_cell_max`) sees an unbiased sample instead of correlated
    # early-round arrivals.
    if decorrelate:
        n_pad = pos.shape[0]
        assert n_pad & (n_pad - 1) == 0, \
            "bucketing must pad to a power of two"
        perm = (jnp.arange(n_pad, dtype=jnp.uint32) * jnp.uint32(2654435761)
                & jnp.uint32(n_pad - 1)).astype(jnp.int32)
        pos, power = S.take_rows(pos, perm), S.take_rows(power, perm)
        dir_code, valid = dir_code[perm], valid[perm]

    # fine (subcell) coords first; coarse cell = fine // sub_div, so photon
    # binning and the v2 wrapper's query-side floor() agree exactly
    fine_dims = jnp.asarray([nx * sub_div - 1, ny * sub_div - 1,
                             nz * sub_div - 1])
    fine = jnp.clip(
        jnp.floor((pos - origin) * (inv_h * sub_div)).astype(jnp.int32),
        0, fine_dims)
    ijk = fine // sub_div
    sub = fine - ijk * sub_div
    cid = (ijk[:, 0] * ny + ijk[:, 1]) * nz + ijk[:, 2]
    subid = (sub[:, 0] * sub_div + sub[:, 1]) * sub_div + sub[:, 2]
    key = cid * S3 + subid
    key = jnp.where(valid, key, n_cells * S3)  # invalid photons sort last

    order = jnp.argsort(key)
    key_sorted = key[order]
    sub_start = jnp.searchsorted(
        key_sorted, jnp.arange(n_cells * S3 + 1, dtype=key_sorted.dtype)
    ).astype(jnp.int32)
    cell_start = sub_start[::S3]

    pos_s = S.take_rows(pos, order)
    power_s = S.take_rows(power, order).astype(jnp.bfloat16)
    code_s = dir_code[order].astype(jnp.int32)
    n = pos_s.shape[0]
    pad_cols = (-n) % _PACK_CHUNK + _PACK_CHUNK
    packed = jnp.zeros((16, n + pad_cols), jnp.float32)
    packed = jax.lax.dynamic_update_slice(
        packed,
        jnp.concatenate([pos_s.T, power_s.astype(jnp.float32).T,
                         S.decode_direction(code_s).T], axis=0),
        (0, 0))
    return (pos_s, power_s, code_s, valid[order], cell_start, packed,
            sub_start if sub_div > 1 else None)


def _candidates(grid: PhotonGrid, point: jnp.ndarray):
    """Gather candidate photon indices from the 27-cell neighborhood.

    Returns (idx [B,27*C], ok [B,27*C], scale [B,27*C]) where `scale` is the
    decimation flux multiplier count/C for over-full cells.
    """
    nx, ny, nz = grid.dims
    C = grid.cell_cap
    B = point.shape[0]
    ijk = jnp.floor((point - grid.origin) * grid.inv_h).astype(jnp.int32)

    idx_list, ok_list, scale_list = [], [], []
    lane = jnp.arange(C, dtype=jnp.int32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                c = ijk + jnp.asarray([dx, dy, dz])
                in_b = jnp.all(
                    (c >= 0) & (c < jnp.asarray([nx, ny, nz])), axis=-1)
                cc = jnp.clip(c, 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
                cid = (cc[:, 0] * ny + cc[:, 1]) * nz + cc[:, 2]
                s = grid.cell_start[cid]
                e = grid.cell_start[cid + 1]
                cnt = e - s
                idx = s[:, None] + lane[None, :]
                ok = in_b[:, None] & (lane[None, :] < cnt[:, None])
                scale = jnp.maximum(cnt.astype(jnp.float32) / C, 1.0)
                idx_list.append(idx)
                ok_list.append(ok)
                scale_list.append(jnp.broadcast_to(scale[:, None], (B, C)))
    return (jnp.concatenate(idx_list, axis=1),
            jnp.concatenate(ok_list, axis=1),
            jnp.concatenate(scale_list, axis=1))


# Filter ids (utils/config.py): DISK=0, CONE=1, GAUSS=2


def _auto_chunk(grid: PhotonGrid, chunk: int) -> int:
    """Bound the candidate matrix [chunk, 27*cell_cap] to ~4M entries so the
    gather temporaries stay well under HBM even at the reference's largest
    estimate sizes (-cs 500 -> cell_cap 1000 -> 27k candidates/query)."""
    per_query = 27 * grid.cell_cap
    cap = max(128, (1 << 22) // per_query)
    return int(min(chunk, cap))


def _estimate_chunk(grid, point, normal, exact_bounce, cos_theta, kd, ks,
                    shin, estimate_size, estimate_dist, filter_type, cfg):
    """EstimateRadiance (photon_utils.cpp:72-162) for one query chunk via
    the 27-cell grid window (fixed-capacity cell reads with decimation)."""
    K = int(estimate_size)
    idx, ok, scale = _candidates(grid, point)
    idx = jnp.clip(idx, 0, grid.pos.shape[0] - 1)

    p = S.take_rows(grid.pos, idx)             # [B,M,3]
    d2 = jnp.sum((p - point[:, None]) ** 2, axis=-1)
    in_r = ok & (d2 <= estimate_dist * estimate_dist)
    d2m = jnp.where(in_r, d2, jnp.inf)

    M = d2m.shape[1]
    k_eff = min(K, M)
    neg_top, top_i = jax.lax.top_k(-d2m, k_eff)  # [B,K]
    top_d2 = -neg_top
    gidx = jnp.take_along_axis(idx, top_i, axis=1)
    flux_scale = jnp.take_along_axis(scale, top_i, axis=1)
    return _finish_estimate(grid, point, normal, exact_bounce, cos_theta,
                            kd, ks, shin, K, estimate_dist, filter_type,
                            cfg, top_d2, gidx, flux_scale)


def _estimate_chunk_brute(grid, point, normal, exact_bounce, cos_theta, kd,
                          ks, shin, estimate_size, estimate_dist,
                          filter_type, cfg, photon_chunk: int = 8192):
    """Exact EstimateRadiance for one query chunk: running top-K merge over
    the FULL photon array (no cell cap, no decimation).  Used for maps small
    enough to stream (the dense caustic-focus case where the grid path's
    fixed-capacity cell reads would blur the K-th-neighbor radius)."""
    K = int(estimate_size)
    N = grid.pos.shape[0]
    B = point.shape[0]
    PC = photon_chunk if N > photon_chunk else max(
        128, -(-N // 128) * 128)
    pad = (-N) % PC
    pos = jnp.pad(grid.pos, ((0, pad), (0, 0)), constant_values=jnp.inf)
    valid = jnp.pad(grid.valid, (0, pad))
    n_blk = (N + pad) // PC
    k_eff = min(K, N)

    def body(carry, blk):
        top_d2, gidx = carry
        pos_b, valid_b, base = blk
        d2 = jnp.sum((pos_b[None] - point[:, None]) ** 2, axis=-1)
        in_r = valid_b[None] & (d2 <= estimate_dist * estimate_dist)
        d2m = jnp.where(in_r, d2, jnp.inf)
        idx_b = base + jax.lax.broadcasted_iota(jnp.int32, (B, PC), 1)
        cat_d2 = jnp.concatenate([top_d2, d2m], axis=1)
        cat_ix = jnp.concatenate([gidx, idx_b], axis=1)
        neg_top, sel = jax.lax.top_k(-cat_d2, k_eff)
        return (-neg_top, jnp.take_along_axis(cat_ix, sel, axis=1)), None

    init = (jnp.full((B, k_eff), jnp.inf),
            jnp.zeros((B, k_eff), jnp.int32))
    blocks = (pos.reshape(n_blk, PC, 3),
              valid.reshape(n_blk, PC),
              jnp.arange(n_blk, dtype=jnp.int32) * PC)
    (top_d2, gidx), _ = jax.lax.scan(body, init, blocks)
    gidx = jnp.clip(gidx, 0, N - 1)
    return _finish_estimate(grid, point, normal, exact_bounce, cos_theta,
                            kd, ks, shin, K, estimate_dist, filter_type,
                            cfg, top_d2, gidx,
                            jnp.ones_like(top_d2, jnp.float32))


def _estimate_chunk_hist(grid, point, normal, exact_bounce, cos_theta, kd,
                         ks, shin, estimate_size, estimate_dist,
                         filter_type, cfg):
    """EstimateRadiance for one query chunk over a SMALL map, selection-free:
    the K-th-neighbor radius comes from count-below-edge refinement (3
    levels x 32 edges -> cap^2/32768 resolution, the same tie-shell
    semantics as the Pallas kernels) and the filtered flux sum is a masked
    reduction over the full photon axis — no top_k.

    Why: the exact brute path's lax.top_k over [B, N] dominated the
    indirect rung (measured 447 ms vs 66 ms for the distance pass alone at
    B=262k, N=2304); this path computes the same estimate to kernel-grade
    accuracy in ~2 masked passes.  Selected on TPU for big query batches
    against sub-Pallas-size maps (see estimate_radiance)."""
    K = int(estimate_size)
    B = point.shape[0]
    cap2 = jnp.float32(float(estimate_dist) ** 2)
    NB = 32

    d2 = jnp.sum((grid.pos[None] - point[:, None]) ** 2, axis=-1)  # [B,N]
    d2 = jnp.where(grid.valid[None], d2, jnp.inf)

    lo = jnp.zeros((B, 1), jnp.float32)
    w = jnp.full((B, 1), cap2 / NB)
    edges_u = jnp.arange(1, NB + 1, dtype=jnp.float32)[None]
    total = jnp.sum(d2 <= cap2, axis=1, keepdims=True).astype(jnp.float32)
    for _ in range(3):
        edges = lo + w * edges_u                             # [B,NB]
        cnt = jnp.sum((d2[:, :, None] <= edges[:, None, :]).astype(
            jnp.float32), axis=1)                            # [B,NB]
        kb = jnp.sum((cnt < K).astype(jnp.float32), axis=1,
                     keepdims=True)
        lo = lo + jnp.minimum(kb, jnp.float32(NB - 1)) * w
        w = w / NB
    tau = jnp.where(total < K, cap2, lo + w * NB)            # [B,1]

    include = d2 <= tau
    flux = grid.power.astype(jnp.float32)                    # [N,3]
    incident = S.decode_direction(grid.dir_code)             # [N,3]
    perp = jnp.einsum("bj,nj->bn", normal, incident)
    sgn = jnp.sign(cos_theta)[:, None]
    use = include & ~(perp * sgn > 0)
    cos_a = jnp.maximum(-jnp.einsum("bj,nj->bn", exact_bounce, incident),
                        0.0)
    pow_a = jnp.exp(shin[:, None] * jnp.log(jnp.maximum(cos_a, 1e-30)))
    base = jnp.abs(perp)
    usf = use.astype(jnp.float32)
    cnt_in = jnp.sum(include.astype(jnp.float32), axis=1, keepdims=True)
    maxd2 = jnp.where(total < K, cap2,
                      jnp.maximum(jnp.max(jnp.where(include, d2, 0.0),
                                          axis=1, keepdims=True), 1e-6))

    def contrib(extra=None):
        out = []
        for ch in range(3):
            c = flux[None, :, ch] * (base * kd[:, ch:ch + 1]
                                     + pow_a * ks[:, ch:ch + 1]) * usf
            if extra is not None:
                c = c * extra
            out.append(jnp.sum(c, axis=1))
        return jnp.stack(out, axis=1)                        # [B,3]

    DISK, CONE, GAUSS = 0, 1, 2
    if filter_type == CONE:
        f_k = jnp.float32(cfg.filter_const_k)
        # clamp to cap2 so invalid photons' inf d2 can't make 0*inf = NaN
        # through the masked contribution product
        d = jnp.sqrt(jnp.clip(d2, 1e-12, cap2))
        acc = contrib()
        accd = contrib(d)
        r = jnp.sqrt(maxd2)
        est = (acc - accd / (f_k * r)) / (
            (1.0 - 2.0 / (3.0 * f_k)) * jnp.pi * maxd2)
    elif filter_type == GAUSS:
        f_a = jnp.float32(cfg.filter_const_a)
        f_b = jnp.float32(cfg.filter_const_b)
        c1 = jnp.exp(-f_b)
        wgt = 1.0 - (1.0 - jnp.exp(-f_b * d2 / (2.0 * maxd2))) / (1.0 - c1)
        accw = contrib(wgt)
        total_w = jnp.sum(wgt * usf, axis=1, keepdims=True)
        norm = jnp.where(total_w > 0, f_a * cnt_in /
                         jnp.maximum(total_w, 1e-30), 0.0)
        est = accw * (norm / (jnp.pi * maxd2))
    else:
        est = contrib() / (jnp.pi * maxd2)
    return jnp.where(cnt_in > 0, est, 0.0)


def _finish_estimate(grid, point, normal, exact_bounce, cos_theta, kd, ks,
                     shin, K, estimate_dist, filter_type, cfg,
                     top_d2, gidx, flux_scale):
    """Shared tail of EstimateRadiance: normal-side cull, Phong weighting,
    disk/cone/gauss filter normalization (photon_utils.cpp:109-161)."""
    flux = S.take_rows(grid.power, gidx).astype(jnp.float32)  # [B,K,3]
    flux = flux * flux_scale[..., None]
    incident = S.decode_direction(grid.dir_code[gidx])  # [B,K,3]
    return finish_estimate_payload(normal, exact_bounce, cos_theta, kd, ks,
                                   shin, K, estimate_dist, filter_type, cfg,
                                   top_d2, flux, incident)


def finish_estimate_payload(normal, exact_bounce, cos_theta, kd, ks,
                            shin, K, estimate_dist, filter_type, cfg,
                            top_d2, flux, incident):
    """EstimateRadiance tail over an explicit neighbor payload
    (top_d2 [B,K], flux [B,K,3], incident [B,K,3]) — shared by the local
    index-based paths above and the ring-exchange sharded gather
    (parallel/gather.py), which carries flux/direction with each candidate
    instead of a global photon index."""
    found = jnp.isfinite(top_d2)
    num_nearby = jnp.sum(found, axis=1)

    # max_dist^2: K-th neighbor if full, else the cap (photon_utils.cpp:85-96)
    max_d2_found = jnp.max(jnp.where(found, top_d2, 0.0), axis=1)
    max_d2 = jnp.where(num_nearby < K,
                       jnp.asarray(estimate_dist * estimate_dist),
                       jnp.maximum(max_d2_found, 1e-6))

    # normal-side cull (photon_utils.cpp:119-123)
    perp = S.dot(normal[:, None], incident)
    ct = cos_theta[:, None]
    cull = ((ct < 0) & (perp < 0)) | ((ct > 0) & (perp > 0))
    use = found & ~cull

    cos_alpha = jnp.maximum(S.dot(exact_bounce[:, None], -incident), 0.0)
    brdf_w = (jnp.abs(perp)[..., None] * kd[:, None]
              + jnp.power(jnp.maximum(cos_alpha, 1e-30),
                          shin[:, None])[..., None] * ks[:, None])
    contrib = flux * brdf_w                            # [B,K,3]

    dist = jnp.sqrt(jnp.maximum(top_d2, 1e-12))
    r = jnp.sqrt(max_d2)
    if filter_type == 1:      # CONE
        k_c = cfg.filter_const_k
        w = 1.0 - dist / (k_c * r[:, None])
        contrib = contrib * w[..., None]
        est = jnp.sum(jnp.where(use[..., None], contrib, 0.0), axis=1)
        est = est / ((1.0 - 2.0 / (3.0 * k_c)) * jnp.pi * max_d2)[:, None]
    elif filter_type == 2:    # GAUSS (photon_utils.cpp:106-155)
        c1 = jnp.exp(-cfg.filter_const_b)
        c2 = 1.0 / (2.0 * max_d2)
        w = 1.0 - (1.0 - jnp.power(c1, c2[:, None] * top_d2)) / (1.0 - c1)
        contrib = contrib * w[..., None]
        total_w = jnp.sum(jnp.where(use, w, 0.0), axis=1)
        est = jnp.sum(jnp.where(use[..., None], contrib, 0.0), axis=1)
        norm = jnp.where(
            total_w > 0,
            cfg.filter_const_a * num_nearby / jnp.maximum(total_w, 1e-30),
            0.0)
        est = est * (norm / (jnp.pi * max_d2))[:, None]
    else:                     # DISK
        est = jnp.sum(jnp.where(use[..., None], contrib, 0.0), axis=1)
        est = est / (jnp.pi * max_d2)[:, None]

    return jnp.where((num_nearby > 0)[:, None], est, 0.0)


def _use_pallas_gather(grid: PhotonGrid) -> bool:
    """Pallas gather-kernel policy: same mode switch as the intersection
    fast path (ops.intersect.set_pallas_mode / GI_TPU_PALLAS)."""
    from ..ops import intersect as I
    if I._PALLAS_MODE == "never":
        return False
    if I._PALLAS_MODE in ("always", "interpret"):
        return True
    return I._default_platform() == "tpu" and grid.pos.shape[0] >= 4096


def estimate_radiance(grid: PhotonGrid, point, normal, exact_bounce,
                      cos_theta, kd, ks, shin, estimate_size, estimate_dist,
                      filter_type, cfg, chunk: int = 2048):
    """Chunked EstimateRadiance over a query batch (bounded gather memory).

    Dispatch: the streamed Pallas kernel on TPU; otherwise the exact
    brute-force streaming top-K.  BOTH are exact kNN — the decimated
    27-cell grid path (_estimate_chunk) is deliberately NOT used for
    radiance estimates: its fixed-capacity cell reads overestimate sharply
    non-uniform densities (measured ~1.6x at a 300k-photon caustic focus),
    so the CPU fallback is slow-but-exact rather than fast-but-biased and
    always agrees with the TPU render (docs/DESIGN.md)."""
    if _use_pallas_gather(grid) and not cfg.differentiable:
        # The streamed Pallas kernel has no autodiff rule (it never
        # materializes its neighbor set, so there is nothing to
        # select-then-recompute from); differentiable renders take the
        # exact jnp path, whose top_k/scan ops carry gradients
        # (tests/test_grad.py photon-layer gradchecks).
        from ..ops import intersect as I
        from .pallas_gather import estimate_radiance_pallas
        return estimate_radiance_pallas(
            grid, point, normal, exact_bounce, cos_theta, kd, ks, shin,
            estimate_size, estimate_dist, filter_type, cfg,
            interpret=(I._PALLAS_MODE == "interpret"))
    chunk_fn = _estimate_chunk_brute
    B = point.shape[0]
    from ..ops import intersect as I
    if (not cfg.differentiable and B >= 8192
            and grid.pos.shape[0] <= 16384
            and I._default_platform() == "tpu"):
        # big query batch vs small map (the indirect rung's shape): the
        # selection-free histogram estimator; chunk sized to keep the
        # [chunk, N] distance plane ~256 MB
        chunk_fn = _estimate_chunk_hist
        chunk = max(2048, min(32768, (1 << 26) // grid.pos.shape[0]))
    else:
        chunk = min(chunk, 512)
    if B <= chunk:
        return chunk_fn(grid, point, normal, exact_bounce, cos_theta,
                        kd, ks, shin, estimate_size, estimate_dist,
                        filter_type, cfg)
    pad = (-B) % chunk
    def padz(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    args = [padz(a).reshape((B + pad) // chunk, chunk, *a.shape[1:])
            for a in (point, normal, exact_bounce, cos_theta, kd, ks, shin)]

    def f(xs):
        pt, n, eb, ct, kd_, ks_, sh_ = xs
        return chunk_fn(grid, pt, n, eb, ct, kd_, ks_, sh_,
                        estimate_size, estimate_dist, filter_type, cfg)

    out = jax.lax.map(f, tuple(args))
    return out.reshape(-1, 3)[:B]


def estimate_cached_radiance(grid: PhotonGrid, point, normal, exact_bounce,
                             cos_theta, kd, ks, shin, estimate_dist,
                             chunk: int = 4096):
    """EstimateCachedRadiance (photon_utils.cpp:165-205): nearest photon on
    the correct normal side within the cap; its (irradiance) value weighted
    by the Phong BRDF."""
    chunk = _auto_chunk(grid, chunk)
    B = point.shape[0]
    if B > chunk:
        pad = (-B) % chunk
        def padz(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        args = [padz(a).reshape((B + pad) // chunk, chunk, *a.shape[1:])
                for a in (point, normal, exact_bounce, cos_theta, kd, ks,
                          shin)]

        def f(xs):
            pt, n, eb, ct, kd_, ks_, sh_ = xs
            return estimate_cached_radiance(grid, pt, n, eb, ct, kd_, ks_,
                                            sh_, estimate_dist, chunk)
        return jax.lax.map(f, tuple(args)).reshape(-1, 3)[:B]

    idx, ok, _ = _candidates(grid, point)
    idx = jnp.clip(idx, 0, grid.pos.shape[0] - 1)
    p = S.take_rows(grid.pos, idx)
    d2 = jnp.sum((p - point[:, None]) ** 2, axis=-1)
    code = grid.dir_code[idx]
    incident = S.decode_direction(code)
    perp = S.dot(normal[:, None], incident)
    ct = cos_theta[:, None]
    side_ok = ~(((ct < 0) & (perp < 0)) | ((ct > 0) & (perp > 0)))
    usable = ok & side_ok & (d2 <= estimate_dist * estimate_dist)
    d2m = jnp.where(usable, d2, jnp.inf)
    best = jnp.argmin(d2m, axis=1)
    has = jnp.isfinite(jnp.min(d2m, axis=1))

    bidx = jnp.take_along_axis(idx, best[:, None], axis=1)[:, 0]
    flux = S.take_rows(grid.power, bidx).astype(jnp.float32)
    inc = S.decode_direction(grid.dir_code[bidx])
    perp_b = S.dot(normal, inc)
    cos_alpha = jnp.maximum(S.dot(exact_bounce, -inc), 0.0)
    out = flux * (jnp.abs(perp_b)[:, None] * kd
                  + jnp.power(jnp.maximum(cos_alpha, 1e-30), shin)[:, None]
                  * ks)
    return jnp.where(has[:, None], out, 0.0)


def estimate_irradiance(grid: PhotonGrid, point, estimate_size,
                        estimate_dist, chunk: int = 2048):
    """EstimateIrradiance (photon_utils.cpp:209-246): plain flux/area disk
    estimate (no BRDF, no normal cull) — used to precompute the cache."""
    chunk = _auto_chunk(grid, chunk)
    B = point.shape[0]
    if B > chunk:
        pad = (-B) % chunk
        pts = jnp.pad(point, ((0, pad), (0, 0)))
        pts = pts.reshape((B + pad) // chunk, chunk, 3)
        out = jax.lax.map(
            lambda p: estimate_irradiance(grid, p, estimate_size,
                                          estimate_dist, chunk), pts)
        return out.reshape(-1, 3)[:B]

    K = int(estimate_size)
    idx, ok, scale = _candidates(grid, point)
    idx = jnp.clip(idx, 0, grid.pos.shape[0] - 1)
    p = S.take_rows(grid.pos, idx)
    d2 = jnp.sum((p - point[:, None]) ** 2, axis=-1)
    in_r = ok & (d2 <= estimate_dist * estimate_dist)
    d2m = jnp.where(in_r, d2, jnp.inf)
    k_eff = min(K, d2m.shape[1])
    neg_top, top_i = jax.lax.top_k(-d2m, k_eff)
    top_d2 = -neg_top
    found = jnp.isfinite(top_d2)
    num = jnp.sum(found, axis=1)
    max_d2 = jnp.where(num < K, jnp.asarray(estimate_dist * estimate_dist),
                       jnp.maximum(jnp.max(jnp.where(found, top_d2, 0.0),
                                           axis=1), 1e-6))
    gidx = jnp.take_along_axis(idx, top_i, axis=1)
    flux = S.take_rows(grid.power, gidx).astype(jnp.float32)
    flux = flux * jnp.take_along_axis(scale, top_i, axis=1)[..., None]
    est = jnp.sum(jnp.where(found[..., None], flux, 0.0), axis=1)
    est = est / (jnp.pi * max_d2)[:, None]
    return jnp.where((num > 0)[:, None], est, 0.0)
