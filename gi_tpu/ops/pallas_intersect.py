"""Pallas TPU kernel: ray-triangle closest hit over a triangle soup.

The reference scans triangles linearly per TriangleArray on one CPU core
(R3Isect.cpp:800-833).  Here the [rays x tris] Moller-Trumbore test is a
Pallas kernel: the grid tiles (ray blocks x triangle chunks); each program
computes a (TB, TC) block of hit distances entirely in VMEM with
per-component broadcasts on the VPU, and folds a running (min t, argmin)
into an output block that is revisited across the triangle-chunk grid
dimension.  This avoids materializing the [B, N] intermediates the jnp
path streams through HBM, so the op becomes compute-bound.

Differentiability: the kernel returns (t, idx) with integer idx; gradients
flow by *recomputing* t for the winning triangle with plain jnp ops
(`tri_t_one`) — no custom VJP needed, and the recompute is O(B) not O(B*N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DET_EPS = 1e-12
_BIG = 3.4e38   # stand-in for +inf inside the kernel (python float: not traced)

TB = 256   # rays per block (sublane dim)
TC = 512   # triangles per chunk (lane dim)


def _tri_block_kernel(o_ref, d_ref, tri_ref, tmin_ref, clo_ref, chi_ref,
                      t_out, i_out):
    """One (ray block, tri chunk) tile.

    o_ref/d_ref: (TB, 3) f32; tri_ref: (9, TC) f32 rows = v0/e1/e2 xyz;
    tmin_ref: (TB, 1) f32 per-ray; clo_ref/chi_ref: (1, 3) f32 chunk bbox
    (triangles are Morton-ordered at scene compile, scene/types.py, so
    chunk bboxes are tight); outputs: (TB, 1) f32 / int32, revisited over j.

    The whole Moller-Trumbore body is predicated on a ray-block x chunk-bbox
    slab test: if no live ray in the block can enter this chunk's bbox
    closer than its current best hit, the chunk is skipped. This is the
    TPU-shaped replacement for the reference's per-node bbox early-out
    (R3SceneNode.cpp:421-504) — branch granularity is the (256-ray x
    512-tri) block, not the single ray.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_out[:] = jnp.full_like(t_out, _BIG)
        i_out[:] = jnp.zeros_like(i_out)

    t_min = tmin_ref[:]          # (TB, 1), broadcasts against (TB, TC)

    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]

    # ---- block cull: rays vs chunk bbox slab test -------------------------
    def axis_slab(o_c, d_c, lo_c, hi_c):
        safe = jnp.where(jnp.abs(d_c) > 1e-30, d_c,
                         jnp.where(d_c >= 0.0, 1e-30, -1e-30))
        inv = 1.0 / safe
        t0 = (lo_c - o_c) * inv
        t1 = (hi_c - o_c) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    ex, xx = axis_slab(ox, dx, clo_ref[0, 0, 0], chi_ref[0, 0, 0])
    ey, xy = axis_slab(oy, dy, clo_ref[0, 0, 1], chi_ref[0, 0, 1])
    ez, xz = axis_slab(oz, dz, clo_ref[0, 0, 2], chi_ref[0, 0, 2])
    t_enter = jnp.maximum(jnp.maximum(ex, ey), ez)            # (TB, 1)
    t_exit = jnp.minimum(jnp.minimum(xx, xy), xz)
    reachable = ((t_exit >= jnp.maximum(t_enter, t_min))
                 & (t_enter <= t_out[:]))
    any_reachable = jnp.any(reachable)

    @pl.when(any_reachable)
    def _body():
        _tri_block_body(o_ref, d_ref, tri_ref, t_min, t_out, i_out, j)


def _tri_block_body(o_ref, d_ref, tri_ref, t_min, t_out, i_out, j):
    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]

    v0x = tri_ref[0:1, :]
    v0y = tri_ref[1:2, :]
    v0z = tri_ref[2:3, :]
    e1x = tri_ref[3:4, :]
    e1y = tri_ref[4:5, :]
    e1z = tri_ref[5:6, :]
    e2x = tri_ref[6:7, :]
    e2y = tri_ref[7:8, :]
    e2z = tri_ref[8:9, :]

    # pvec = d x e2  -> (TB, TC) per component
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz

    inv_det = jnp.where(jnp.abs(det) > _DET_EPS,
                        1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)

    # tvec = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det

    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    ok = ((jnp.abs(det) > _DET_EPS) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > t_min))
    t = jnp.where(ok, t, _BIG)

    blk_t = jnp.min(t, axis=1, keepdims=True)                  # (TB, 1)
    blk_i = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None] + j * TC

    better = blk_t < t_out[:]
    t_out[:] = jnp.where(better, blk_t, t_out[:])
    i_out[:] = jnp.where(better, blk_i, i_out[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tri_closest_pallas_raw(o, d, tri9, t_min, chunk_lo, chunk_hi,
                            interpret=False):
    """o,d: [B,3] f32 (B % TB == 0); tri9: [9,N] f32 (N % TC == 0, padded
    triangles have e1=e2=0); t_min: [B,1] f32 per-ray; chunk_lo/hi:
    [N//TC, 3] f32 per-chunk bboxes.  Returns (t [B], idx [B]) with
    t==_BIG on miss."""
    B = o.shape[0]
    N = tri9.shape[1]
    grid = (B // TB, N // TC)

    t, idx = pl.pallas_call(
        _tri_block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=54 * B * N, bytes_accessed=(B * 24 + N * 36 + B * 8),
            transcendentals=0),
        interpret=interpret,
    )(o.astype(jnp.float32), d.astype(jnp.float32), tri9,
      t_min.astype(jnp.float32), chunk_lo, chunk_hi)
    return t[:, 0], idx[:, 0]


def _tri_anyhit_kernel(o_ref, d_ref, tri_ref, tlo_ref, thi_ref, clo_ref,
                       chi_ref, occ_out):
    """Any-hit (occlusion) tile: like _tri_block_kernel but without the
    argmin bookkeeping, and with an extra early-out — once every ray in the
    block is occluded, remaining triangle chunks are skipped entirely.
    Shadow rays are the dominant category (21.5B of the reference's 121B
    rays, README.md:403); the reference pays a full closest-hit scan per
    shadow ray (RayIlluminationTest -> R3Scene::Intersects,
    illumination_utils.cpp:16-31), this kernel pays only until the first
    blocker chunk."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        occ_out[:] = jnp.zeros_like(occ_out)

    t_lo = tlo_ref[:]            # (TB, 1)
    t_hi = thi_ref[:]

    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]

    def axis_slab(o_c, d_c, lo_c, hi_c):
        safe = jnp.where(jnp.abs(d_c) > 1e-30, d_c,
                         jnp.where(d_c >= 0.0, 1e-30, -1e-30))
        inv = 1.0 / safe
        t0 = (lo_c - o_c) * inv
        t1 = (hi_c - o_c) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    ex, xx = axis_slab(ox, dx, clo_ref[0, 0, 0], chi_ref[0, 0, 0])
    ey, xy = axis_slab(oy, dy, clo_ref[0, 0, 1], chi_ref[0, 0, 1])
    ez, xz = axis_slab(oz, dz, clo_ref[0, 0, 2], chi_ref[0, 0, 2])
    t_enter = jnp.maximum(jnp.maximum(ex, ey), ez)
    t_exit = jnp.minimum(jnp.minimum(xx, xy), xz)
    live = occ_out[:] == 0
    reachable = ((t_exit >= jnp.maximum(t_enter, t_lo))
                 & (t_enter < t_hi) & live)

    @pl.when(jnp.any(reachable))
    def _body():
        v0x = tri_ref[0:1, :]
        v0y = tri_ref[1:2, :]
        v0z = tri_ref[2:3, :]
        e1x = tri_ref[3:4, :]
        e1y = tri_ref[4:5, :]
        e1z = tri_ref[5:6, :]
        e2x = tri_ref[6:7, :]
        e2y = tri_ref[7:8, :]
        e2z = tri_ref[8:9, :]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > _DET_EPS,
                            1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ((jnp.abs(det) > _DET_EPS) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > t_lo) & (t < t_hi))
        blocked = jnp.any(ok, axis=1, keepdims=True)
        occ_out[:] = jnp.where(blocked, 1, occ_out[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tri_anyhit_pallas_raw(o, d, tri9, t_lo, t_hi, chunk_lo, chunk_hi,
                           interpret=False):
    B = o.shape[0]
    N = tri9.shape[1]
    grid = (B // TB, N // TC)
    occ = pl.pallas_call(
        _tri_anyhit_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=54 * B * N, bytes_accessed=(B * 32 + N * 36 + B * 4),
            transcendentals=0),
        interpret=interpret,
    )(o.astype(jnp.float32), d.astype(jnp.float32), tri9,
      t_lo.astype(jnp.float32), t_hi.astype(jnp.float32),
      chunk_lo, chunk_hi)
    return occ[:, 0]


def _chunk_bboxes(v0_p, e1_p, e2_p, n_chunks):
    """Per-chunk triangle bboxes, slightly inflated against f32 rounding."""
    p0 = v0_p.reshape(n_chunks, TC, 3)
    p1 = (v0_p + e1_p).reshape(n_chunks, TC, 3)
    p2 = (v0_p + e2_p).reshape(n_chunks, TC, 3)
    c_lo = jnp.minimum(jnp.minimum(p0.min(1), p1.min(1)), p2.min(1))
    c_hi = jnp.maximum(jnp.maximum(p0.max(1), p1.max(1)), p2.max(1))
    margin = 1e-4 * (c_hi - c_lo) + 1e-5
    c_lo = (c_lo - margin).astype(jnp.float32)[:, None, :]
    c_hi = (c_hi + margin).astype(jnp.float32)[:, None, :]
    return c_lo, c_hi


def tri_occluded_pallas(o, d, v0, e1, e2, t_lo, t_hi,
                        interpret: bool = False):
    """Any-hit over the triangle soup: occluded[i] = exists triangle with
    t_lo[i] < t < t_hi[i] along ray i.  Non-differentiable (a set-membership
    bit); soft-visibility mode has its own smooth path
    (ops.intersect.soft_visibility)."""
    B = o.shape[0]
    N = v0.shape[0]
    pad_b = (-B) % TB
    pad_n = (-N) % TC

    def col(x):
        x = jnp.asarray(x, jnp.float32)
        x = x.reshape(-1, 1) if x.ndim > 0 else jnp.full((B, 1), x,
                                                         jnp.float32)
        return jnp.pad(jnp.broadcast_to(x, (B, 1)), ((0, pad_b), (0, 0)))

    o_p = jnp.pad(o, ((0, pad_b), (0, 0)))
    d_p = jnp.pad(d, ((0, pad_b), (0, 0)))
    v0_p = jnp.concatenate([v0, jnp.broadcast_to(v0[-1:], (pad_n, 3))],
                           axis=0) if pad_n else v0
    e1_p = jnp.pad(e1, ((0, pad_n), (0, 0)))
    e2_p = jnp.pad(e2, ((0, pad_n), (0, 0)))
    c_lo, c_hi = _chunk_bboxes(v0_p, e1_p, e2_p, (N + pad_n) // TC)
    tri9 = jnp.concatenate(
        [v0_p.T, e1_p.T, e2_p.T], axis=0).astype(jnp.float32)
    occ = _tri_anyhit_pallas_raw(
        jax.lax.stop_gradient(o_p), jax.lax.stop_gradient(d_p), tri9,
        jax.lax.stop_gradient(col(t_lo)), jax.lax.stop_gradient(col(t_hi)),
        c_lo, c_hi, interpret=interpret)
    return occ[:B] > 0


def tri_t_one(o, d, v0, e1, e2, t_min):
    """Differentiable Moller-Trumbore t for ray i vs its OWN triangle i:
    o,d,v0,e1,e2 all [B,3].  Used to re-derive gradients for the winning
    triangle chosen by the (non-differentiable) Pallas kernel."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    safe = jnp.where(jnp.abs(det) > _DET_EPS, det, 1.0)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / safe, 0.0)
    tvec = o - v0
    qvec = jnp.cross(tvec, e1)
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    return t


def tri_closest_pallas(o, d, v0, e1, e2, t_min,
                       interpret: bool = False):
    """Closest-hit over triangle soup via the Pallas kernel.

    o,d: [B,3]; v0/e1/e2: [N,3]; t_min: scalar or per-ray [B] / [B,1]
    (shadow rays use per-ray epsilons, models/direct.py).  Returns
    (t [B] f32 with inf on miss, idx [B] int32).  Differentiable in o and d
    (via select-then-recompute); triangle gradients also flow through the
    recompute.
    """
    B = o.shape[0]
    N = v0.shape[0]
    pad_b = (-B) % TB
    pad_n = (-N) % TC

    tmin_col = jnp.broadcast_to(
        jnp.asarray(t_min, jnp.float32).reshape(-1, 1)
        if jnp.ndim(t_min) > 0 else jnp.full((B, 1), t_min, jnp.float32),
        (B, 1))
    tmin_p = jnp.pad(tmin_col, ((0, pad_b), (0, 0)))
    o_p = jnp.pad(o, ((0, pad_b), (0, 0)))
    d_p = jnp.pad(d, ((0, pad_b), (0, 0)))
    # Pad v0 by edge-replication (padded tris stay point-sized inside the
    # last chunk's bbox, never hit since e1=e2=0); e1/e2 pad with zeros.
    v0_p = jnp.concatenate([v0, jnp.broadcast_to(v0[-1:], (pad_n, 3))],
                           axis=0) if pad_n else v0
    e1_p = jnp.pad(e1, ((0, pad_n), (0, 0)))
    e2_p = jnp.pad(e2, ((0, pad_n), (0, 0)))

    # Per-chunk bboxes for the kernel's block cull (slightly inflated so
    # f32 slab rounding can never cull a chunk containing a true hit).
    c_lo, c_hi = _chunk_bboxes(v0_p, e1_p, e2_p, (N + pad_n) // TC)

    # transpose to [9, N]: component rows so the kernel reads lane vectors
    tri9 = jnp.concatenate(
        [v0_p.T, e1_p.T, e2_p.T], axis=0).astype(jnp.float32)

    t_raw, idx = _tri_closest_pallas_raw(
        jax.lax.stop_gradient(o_p), jax.lax.stop_gradient(d_p), tri9,
        jax.lax.stop_gradient(tmin_p),
        jax.lax.stop_gradient(c_lo), jax.lax.stop_gradient(c_hi),
        interpret=interpret)
    t_raw = t_raw[:B]
    idx = jnp.minimum(idx[:B], N - 1)

    hit = t_raw < _BIG * 0.5
    # recompute t differentiably for the winning triangle only
    t_diff = tri_t_one(o, d, v0[idx], e1[idx], e2[idx], t_min)
    t = jnp.where(hit, t_diff, jnp.inf)
    return t, idx
