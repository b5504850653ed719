"""Batched ray-primitive intersection (pure jnp; Pallas fast path elsewhere).

TPU-first replacement for the reference's recursive scene-graph traversal
(R3SceneNode.cpp:421-504) and pairwise `R3Intersects` dispatch
(R3Shapes/R3Isect.cpp): every primitive type is a flat world-space array and
intersection is a dense [rays x prims] test reduced with a running min.  The
reference itself linearly scans triangles per TriangleArray
(R3Isect.cpp:800-833); here that scan is a vectorized streaming reduction
that XLA tiles onto the VPU, chunked so memory stays bounded for large
meshes.

All functions are shape-polymorphic in the ray batch B and differentiable in
ray origins/directions (used for camera gradients).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..scene.types import Scene
from .sampling import take_rows, take_scalar

# Host scalar, NOT jnp.float32(inf): a module-level jnp scalar is a
# committed device buffer, and any jitted program that closure-captures a
# device array flips the axon runtime into a synchronous dispatch mode
# (~25 ms/launch, measured r4) for the REST OF THE PROCESS — this one
# constant was degrading every render/walk program in the framework.
INF = np.float32(np.inf)
_DET_EPS = 1e-12

# Pallas fast-path policy for the triangle scan: "auto" uses the kernel on
# TPU backends for meshes big enough to pay off; "always"/"interpret" force
# it (interpret = Pallas interpreter, for CPU tests); "never" disables.
_PALLAS_MODE = os.environ.get("GI_TPU_PALLAS", "auto")
_PALLAS_MIN_TRIS = 1024


def set_pallas_mode(mode: str) -> None:
    global _PALLAS_MODE
    assert mode in ("auto", "always", "never", "interpret")
    _PALLAS_MODE = mode


def _default_platform() -> str:
    # jax_default_device (set by tests to pin CPU) wins over backend priority:
    # the tunneled TPU plugin registers even under JAX_PLATFORMS=cpu.
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def _use_pallas(n_tris: int) -> bool:
    if _PALLAS_MODE == "never":
        return False
    if _PALLAS_MODE in ("always", "interpret"):
        return True
    return _default_platform() == "tpu" and n_tris >= _PALLAS_MIN_TRIS


@struct.dataclass
class Hit:
    """Closest-hit record for a ray batch."""
    t: jnp.ndarray        # [B] hit distance (inf on miss)
    point: jnp.ndarray    # [B,3]
    normal: jnp.ndarray   # [B,3] geometric normal (outward / right-handed)
    mat: jnp.ndarray      # [B] int32 material id (0 on miss; check .valid)
    valid: jnp.ndarray    # [B] bool


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


# --------------------------------------------------------------------------
# Per-type [B, N] intersection kernels.  Each returns (t[B,N], ...) with
# t = inf where there is no hit beyond t_min.
# --------------------------------------------------------------------------

def _tri_t(o, d, v0, e1, e2, t_min):
    """Moller-Trumbore, two-sided (reference ray-triangle is two-sided,
    R3Isect.cpp:761-796).  o,d: [B,3]; v0/e1/e2: [N,3] -> t: [B,N]."""
    # [B,1,3] x [1,N,3]
    o = o[:, None, :]
    d = d[:, None, :]
    v0, e1, e2 = v0[None], e1[None], e2[None]
    pvec = jnp.cross(d, e2)
    det = _dot(e1, pvec)
    # divide by a safe det (the raw 1/det produces inf on parallel tris,
    # which poisons reverse-mode AD even though `ok` masks it)
    safe_det = jnp.where(jnp.abs(det) > _DET_EPS, det, 1.0)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / safe_det, 0.0)
    tvec = o - v0
    u = _dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = _dot(d, qvec) * inv_det
    t = _dot(e2, qvec) * inv_det
    ok = ((jnp.abs(det) > _DET_EPS) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > t_min))
    return jnp.where(ok, t, INF)


def _sphere_t(o, d, center, radius, t_min):
    """Nearest positive root; returns exit hit when origin is inside
    (matches reference Graphics-Gems behavior needed for refraction exits)."""
    oc = o[:, None, :] - center[None]            # [B,N,3]
    b = _dot(oc, d[:, None, :])
    c = _dot(oc, oc) - (radius**2)[None]
    disc = b * b - c
    # sqrt evaluated only where disc > 0 (grad-safe at the tangent boundary)
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    t1 = -b - sq
    t2 = -b + sq
    t = jnp.where(t1 > t_min, t1, t2)
    ok = (disc > 0.0) & (t > t_min)
    return jnp.where(ok, t, INF)


def _box_t(o, d, lo, hi, t_min):
    """Axis-aligned slab test; entry hit, or exit hit when inside."""
    o_ = o[:, None, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)[:, None, :]
    t0 = (lo[None] - o_) * inv
    t1 = (hi[None] - o_) * inv
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    tnear = jnp.max(tsm, axis=-1)
    tfar = jnp.min(tbg, axis=-1)
    t = jnp.where(tnear > t_min, tnear, tfar)
    ok = (tnear <= tfar) & (t > t_min)
    return jnp.where(ok, t, INF)


def _box_normal(p, lo, hi):
    """Outward normal of the face nearest to point p on box (lo,hi): [B,3].

    One-hot select instead of take_along_axis: each take_along_axis on a
    [B,3] array lowers to a per-element gather with index/result relayouts
    (~1.6 ms each at 4M lanes on v5e), and fusion duplication multiplied
    them across the photon-walk body (r4 HLO dump: 94 gather instances
    per bounce)."""
    dl = jnp.abs(p - lo)
    dh = jnp.abs(p - hi)
    dmin = jnp.minimum(dl, dh)
    axis = jnp.argmin(dmin, axis=-1)
    oh = jax.nn.one_hot(axis, 3, dtype=p.dtype)
    dh_sel = jnp.sum(dh * oh, axis=-1)
    dl_sel = jnp.sum(dl * oh, axis=-1)
    sign = jnp.where(dh_sel < dl_sel, 1.0, -1.0)
    return oh * sign[:, None]


def _cylinder_t(o, d, p0, p1, radius, t_min):
    """Capped cylinder; returns (t, normal) with t [B,N], normal [B,N,3]."""
    axis = p1 - p0                               # [N,3]
    h = jnp.linalg.norm(axis, axis=-1)
    a = axis / jnp.maximum(h, 1e-30)[:, None]
    oc = o[:, None, :] - p0[None]                # [B,N,3]
    sd = _dot(d[:, None, :], a[None])            # [B,N]
    sw = _dot(oc, a[None])
    d_p = d[:, None, :] - sd[..., None] * a[None]
    w_p = oc - sw[..., None] * a[None]
    A = _dot(d_p, d_p)
    B = 2.0 * _dot(w_p, d_p)
    C = _dot(w_p, w_p) - (radius**2)[None]
    disc = B * B - 4.0 * A * C
    # sqrt evaluated only where disc > 0 (grad-safe: sqrt(0) has an
    # infinite VJP that would NaN masked miss lanes under AD)
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    safeA = jnp.where(jnp.abs(A) < 1e-30, 1e-30, A)
    ts1 = (-B - sq) / (2.0 * safeA)
    ts2 = (-B + sq) / (2.0 * safeA)

    def side_ok(ts):
        s = sw + ts * sd
        return (disc > 0.0) & (ts > t_min) & (s >= 0.0) & (s <= h[None])
    ts1 = jnp.where(side_ok(ts1), ts1, INF)
    ts2 = jnp.where(side_ok(ts2), ts2, INF)
    t_side = jnp.minimum(ts1, ts2)

    # caps at s=0 (normal -a) and s=h (normal +a)
    safe_sd = jnp.where(jnp.abs(sd) < 1e-30, 1e-30, sd)
    tc0 = -sw / safe_sd
    tc1 = (h[None] - sw) / safe_sd

    def cap_ok(tc):
        q = oc + tc[..., None] * d[:, None, :]
        s = _dot(q, a[None])
        rad2 = _dot(q, q) - s * s
        return (jnp.abs(sd) > 1e-30) & (tc > t_min) & (rad2 <= (radius**2)[None])
    tc0 = jnp.where(cap_ok(tc0), tc0, INF)
    tc1 = jnp.where(cap_ok(tc1), tc1, INF)

    t = jnp.minimum(t_side, jnp.minimum(tc0, tc1))
    # normal selection (inf t zeroed before attribute math for AD safety)
    tz = jnp.where(jnp.isfinite(t), t, 0.0)
    s_hit = sw + tz * sd
    q = oc + tz[..., None] * d[:, None, :]
    n_side = q - s_hit[..., None] * a[None]
    n_side = n_side * jax.lax.rsqrt(
        jnp.sum(n_side * n_side, axis=-1, keepdims=True) + 1e-12)
    n = jnp.where((t == tc0)[..., None], -a[None],
                  jnp.where((t == tc1)[..., None], a[None], n_side))
    return t, n


def _cone_t(o, d, p0, p1, radius, t_min):
    """Cone: base disk at p0 (radius r), apex p1. Returns (t, normal)."""
    axis = p1 - p0
    h = jnp.linalg.norm(axis, axis=-1)
    a = axis / jnp.maximum(h, 1e-30)[:, None]
    k = radius / jnp.maximum(h, 1e-30)           # [N]
    oc = o[:, None, :] - p0[None]
    sd = _dot(d[:, None, :], a[None])
    sw = _dot(oc, a[None])
    d_p = d[:, None, :] - sd[..., None] * a[None]
    w_p = oc - sw[..., None] * a[None]
    r = radius[None]
    kk = k[None]
    A = _dot(d_p, d_p) - kk * kk * sd * sd
    B = 2.0 * _dot(w_p, d_p) + 2.0 * r * kk * sd - 2.0 * kk * kk * sw * sd
    C = _dot(w_p, w_p) - r * r + 2.0 * r * kk * sw - kk * kk * sw * sw
    disc = B * B - 4.0 * A * C
    # sqrt evaluated only where disc > 0 (grad-safe: sqrt(0) has an
    # infinite VJP that would NaN masked miss lanes under AD)
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    safeA = jnp.where(jnp.abs(A) < 1e-30, 1e-30, A)
    ts1 = (-B - sq) / (2.0 * safeA)
    ts2 = (-B + sq) / (2.0 * safeA)

    def side_ok(ts):
        s = sw + ts * sd
        return (disc > 0.0) & (ts > t_min) & (s >= 0.0) & (s <= h[None])
    ts1 = jnp.where(side_ok(ts1), ts1, INF)
    ts2 = jnp.where(side_ok(ts2), ts2, INF)
    t_side = jnp.minimum(ts1, ts2)

    # base cap at s=0, normal -a
    safe_sd = jnp.where(jnp.abs(sd) < 1e-30, 1e-30, sd)
    tc = -sw / safe_sd

    def cap_ok(tcv):
        q = oc + tcv[..., None] * d[:, None, :]
        s = _dot(q, a[None])
        rad2 = _dot(q, q) - s * s
        return (jnp.abs(sd) > 1e-30) & (tcv > t_min) & (rad2 <= r * r)
    tc = jnp.where(cap_ok(tc), tc, INF)

    t = jnp.minimum(t_side, tc)
    tz = jnp.where(jnp.isfinite(t), t, 0.0)
    s_hit = sw + tz * sd
    q = oc + tz[..., None] * d[:, None, :]
    e = q - s_hit[..., None] * a[None]
    e = e * jax.lax.rsqrt(jnp.sum(e * e, axis=-1, keepdims=True) + 1e-12)
    denom = jnp.sqrt(h * h + radius * radius)[None, :, None]
    n_side = (e * h[None, :, None] + a[None] * radius[None, :, None]) / denom
    n = jnp.where((t == tc)[..., None], -a[None] * jnp.ones_like(q), n_side)
    return t, n


def _circle_t(o, d, center, normal, radius, t_min):
    nd = _dot(d[:, None, :], normal[None])       # [B,N]
    safe = jnp.where(jnp.abs(nd) < 1e-30, 1e-30, nd)
    t = _dot(center[None] - o[:, None, :], normal[None]) / safe
    q = o[:, None, :] + t[..., None] * d[:, None, :] - center[None]
    ok = (jnp.abs(nd) > 1e-30) & (t > t_min) & (_dot(q, q) <= (radius**2)[None])
    return jnp.where(ok, t, INF)


# --------------------------------------------------------------------------
# Chunked closest-hit over triangle soup (bounded memory for big meshes)
# --------------------------------------------------------------------------

def _tri_closest(o, d, tris, t_min, chunk=2048):
    """Returns (t[B], idx[B]) of nearest triangle (idx valid only if t<inf)."""
    N = tris.v0.shape[0]
    B = o.shape[0]
    if N == 0:
        return jnp.full((B,), INF), jnp.zeros((B,), jnp.int32)
    if _use_pallas(N):
        from .pallas_intersect import tri_closest_pallas
        return tri_closest_pallas(o, d, tris.v0, tris.e1, tris.e2, t_min,
                                  interpret=(_PALLAS_MODE == "interpret"))
    if N <= chunk:
        t_all = _tri_t(o, d, tris.v0, tris.e1, tris.e2, t_min)
        idx = jnp.argmin(t_all, axis=1).astype(jnp.int32)
        return jnp.min(t_all, axis=1), idx
    # pad to multiple of chunk and scan
    pad = (-N) % chunk
    v0 = jnp.pad(tris.v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(tris.e1, ((0, pad), (0, 0)), constant_values=0.0)
    e2 = jnp.pad(tris.e2, ((0, pad), (0, 0)), constant_values=0.0)
    n_chunks = (N + pad) // chunk
    v0 = v0.reshape(n_chunks, chunk, 3)
    e1 = e1.reshape(n_chunks, chunk, 3)
    e2 = e2.reshape(n_chunks, chunk, 3)

    def body(carry, blk):
        best_t, best_i = carry
        bv0, be1, be2, base = blk
        t_all = _tri_t(o, d, bv0, be1, be2, t_min)
        ti = jnp.min(t_all, axis=1)
        ii = jnp.argmin(t_all, axis=1).astype(jnp.int32) + base
        closer = ti < best_t
        return (jnp.where(closer, ti, best_t),
                jnp.where(closer, ii, best_i)), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    init = (jnp.full((B,), INF), jnp.zeros((B,), jnp.int32))
    (t, i), _ = jax.lax.scan(body, init, (v0, e1, e2, bases))
    return t, i


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------

def intersect_scene(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                    t_min: float = 0.0) -> Hit:
    """Closest hit of rays (o, d) against every primitive in the scene.

    Equivalent of `R3Scene::Intersects` (R3Scene ray query) but batched:
    o, d are [B,3] (d unit).  Static Python branches skip empty primitive
    arrays, so each scene compiles to exactly the kernels it needs.
    """
    B = o.shape[0]
    best_t = jnp.full((B,), INF)
    best_n = jnp.zeros((B, 3))
    best_m = jnp.zeros((B,), jnp.int32)

    def merge(best, t, n, m):
        bt, bn, bm = best
        closer = t < bt
        return (jnp.where(closer, t, bt),
                jnp.where(closer[:, None], n, bn),
                jnp.where(closer, m, bm))

    best = (best_t, best_n, best_m)

    if scene.tris.v0.shape[0] > 0:
        t, idx = _tri_closest(o, d, scene.tris, t_min)
        n = take_rows(scene.tris.normal, idx)
        m = scene.tris.mat[idx]
        best = merge(best, t, n, m)

    if scene.spheres.center.shape[0] > 0:
        t_all = _sphere_t(o, d, scene.spheres.center, scene.spheres.radius,
                          t_min)
        idx = jnp.argmin(t_all, axis=1)
        t = jnp.min(t_all, axis=1)
        # zero-out inf before attribute math: inf*0 poisons reverse-mode AD
        ts = jnp.where(jnp.isfinite(t), t, 0.0)
        p = o + ts[:, None] * d
        c = take_rows(scene.spheres.center, idx)
        r = take_scalar(scene.spheres.radius, idx)
        n = (p - c) / jnp.maximum(r, 1e-30)[:, None]
        best = merge(best, t, n, take_scalar(scene.spheres.mat, idx))

    if scene.boxes.lo.shape[0] > 0:
        t_all = _box_t(o, d, scene.boxes.lo, scene.boxes.hi, t_min)
        idx = jnp.argmin(t_all, axis=1)
        t = jnp.min(t_all, axis=1)
        ts = jnp.where(jnp.isfinite(t), t, 0.0)
        p = o + ts[:, None] * d
        n = _box_normal(p, take_rows(scene.boxes.lo, idx),
                        take_rows(scene.boxes.hi, idx))
        best = merge(best, t, n, take_scalar(scene.boxes.mat, idx))

    if scene.cylinders.p0.shape[0] > 0:
        t_all, n_all = _cylinder_t(o, d, scene.cylinders.p0,
                                   scene.cylinders.p1,
                                   scene.cylinders.radius, t_min)
        idx = jnp.argmin(t_all, axis=1)
        t = jnp.min(t_all, axis=1)
        oh_n = jax.nn.one_hot(idx, t_all.shape[1],
                              dtype=n_all.dtype)   # [B,N] select
        n = jnp.sum(n_all * oh_n[..., None], axis=1)
        best = merge(best, t, n, take_scalar(scene.cylinders.mat, idx))

    if scene.cones.p0.shape[0] > 0:
        t_all, n_all = _cone_t(o, d, scene.cones.p0, scene.cones.p1,
                               scene.cones.radius, t_min)
        idx = jnp.argmin(t_all, axis=1)
        t = jnp.min(t_all, axis=1)
        oh_n = jax.nn.one_hot(idx, t_all.shape[1],
                              dtype=n_all.dtype)   # [B,N] select
        n = jnp.sum(n_all * oh_n[..., None], axis=1)
        best = merge(best, t, n, take_scalar(scene.cones.mat, idx))

    if scene.circles.center.shape[0] > 0:
        t_all = _circle_t(o, d, scene.circles.center, scene.circles.normal,
                          scene.circles.radius, t_min)
        idx = jnp.argmin(t_all, axis=1)
        t = jnp.min(t_all, axis=1)
        n = take_rows(scene.circles.normal, idx)
        best = merge(best, t, n, take_scalar(scene.circles.mat, idx))

    t, n, m = best
    valid = jnp.isfinite(t)
    t_safe = jnp.where(valid, t, 0.0)
    point = o + t_safe[:, None] * d
    return Hit(t=t, point=point, normal=n, mat=m, valid=valid)


def intersection_dist(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                      t_min: float = 0.0) -> jnp.ndarray:
    """Distance to nearest hit (inf on miss) — reference `IntersectionDist`
    (graphics_utils.cpp:84-92), used by shadow-ray occlusion tests."""
    return intersect_scene(scene, o, d, t_min=t_min).t


def _tri_occluded(o, d, tris, t_min, t_max, chunk=2048):
    """Any-hit over the triangle soup (jnp path): early-exit lax.while_loop
    over Morton-ordered chunks — stops at the first chunk that occludes
    every still-open ray, the SIMD analogue of the reference's per-ray
    early-out the linear scan lacks (R3Isect.cpp:800-833)."""
    N = tris.v0.shape[0]
    B = o.shape[0]
    if N == 0:
        return jnp.zeros((B,), bool)
    if _use_pallas(N):
        from .pallas_intersect import tri_occluded_pallas
        return tri_occluded_pallas(o, d, tris.v0, tris.e1, tris.e2, t_min,
                                   t_max,
                                   interpret=(_PALLAS_MODE == "interpret"))
    if N <= chunk:
        t_all = _tri_t(o, d, tris.v0, tris.e1, tris.e2, t_min)
        return jnp.any(t_all < t_max[:, None], axis=1)
    pad = (-N) % chunk
    v0 = jnp.pad(tris.v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(tris.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(tris.e2, ((0, pad), (0, 0)))
    n_chunks = (N + pad) // chunk
    v0 = v0.reshape(n_chunks, chunk, 3)
    e1 = e1.reshape(n_chunks, chunk, 3)
    e2 = e2.reshape(n_chunks, chunk, 3)

    def cond(carry):
        i, occ = carry
        return (i < n_chunks) & ~jnp.all(occ)

    def body(carry):
        i, occ = carry
        t_all = _tri_t(o, d, v0[i], e1[i], e2[i], t_min)
        return i + 1, occ | jnp.any(t_all < t_max[:, None], axis=1)

    _, occ = jax.lax.while_loop(cond, body, (jnp.asarray(0),
                                             jnp.zeros((B,), bool)))
    return occ


def occluded(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
             t_max: jnp.ndarray, t_min=0.0) -> jnp.ndarray:
    """Any-hit query: does any primitive intersect ray (o, d) strictly
    inside (t_min, t_max)?  The shadow-ray fast path (SURVEY §7.2 `any_hit`):
    no argmin, no normals, early chunk exit — unlike the reference, whose
    shadow rays pay the full closest-hit traversal
    (RayIlluminationTest, illumination_utils.cpp:16-31).

    Non-differentiable by construction (a set-membership bit; the jnp path
    is a lax.while_loop): inputs are detached.  Smooth shadow gradients
    come from soft_visibility instead."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    t_max = jax.lax.stop_gradient(t_max)
    t_min = jax.lax.stop_gradient(t_min)
    B = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max), (B,))
    occ = jnp.zeros((B,), bool)
    if scene.tris.v0.shape[0] > 0:
        occ = occ | _tri_occluded(o, d, scene.tris, t_min, t_max)
    if scene.spheres.center.shape[0] > 0:
        t = _sphere_t(o, d, scene.spheres.center, scene.spheres.radius,
                      t_min)
        occ = occ | jnp.any(t < t_max[:, None], axis=1)
    if scene.boxes.lo.shape[0] > 0:
        t = _box_t(o, d, scene.boxes.lo, scene.boxes.hi, t_min)
        occ = occ | jnp.any(t < t_max[:, None], axis=1)
    if scene.cylinders.p0.shape[0] > 0:
        t, _ = _cylinder_t(o, d, scene.cylinders.p0, scene.cylinders.p1,
                           scene.cylinders.radius, t_min)
        occ = occ | jnp.any(t < t_max[:, None], axis=1)
    if scene.cones.p0.shape[0] > 0:
        t, _ = _cone_t(o, d, scene.cones.p0, scene.cones.p1,
                       scene.cones.radius, t_min)
        occ = occ | jnp.any(t < t_max[:, None], axis=1)
    if scene.circles.center.shape[0] > 0:
        t = _circle_t(o, d, scene.circles.center, scene.circles.normal,
                      scene.circles.radius, t_min)
        occ = occ | jnp.any(t < t_max[:, None], axis=1)
    return occ


# --------------------------------------------------------------------------
# Soft (differentiable) visibility
# --------------------------------------------------------------------------

def soft_visibility(scene: Scene, p_light: jnp.ndarray, p_surf: jnp.ndarray,
                    beta: float) -> jnp.ndarray:
    """Differentiable shadow-ray visibility in [0, 1].

    The reference's occlusion test (RayIlluminationTest,
    illumination_utils.cpp:16-31) is a step function of scene/light
    parameters, so shadow-dependent gradients are identically zero under AD
    (SURVEY §7 hard parts: "visibility gradients").  Here each potential
    occluder contributes a *smooth* blocking factor: a sigmoid of its lateral
    margin — how far, transversally, the shadow ray passes from the occluder
    boundary — with softness `beta` (relative units).  visibility is the
    product of the per-primitive clear factors; as beta -> 0 it converges to
    the hard test.  Gradients flow to anything that moves the ray (light
    sample position, surface point) or the occluder boundary.

    Smooth occluders: triangles (barycentric margin), spheres (signed
    distance of closest approach), boxes (slab chord length), cylinders and
    cones (radial margin of the ray to the clamped axis station vs the
    local radius — for cones the radius tapers linearly to the apex),
    circles/disks (radial margin of the plane hit).  The t-window test
    (occluder strictly between light and surface) is kept hard so the
    receiving surface itself never "self-shadows" softly.
    """
    delta = p_surf - p_light
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-30)
    d = delta / dist[..., None]
    o = p_light
    t_lo = 1e-3 * dist
    t_hi = dist * (1.0 - 1e-3)
    B = o.shape[0]
    vis = jnp.ones((B,))
    inv_beta = 1.0 / beta

    def in_window(t):
        return (t > t_lo[:, None]) & (t < t_hi[:, None])

    if scene.tris.v0.shape[0] > 0:
        tr = scene.tris
        o_ = o[:, None, :]
        d_ = d[:, None, :]
        v0, e1, e2 = tr.v0[None], tr.e1[None], tr.e2[None]
        pvec = jnp.cross(d_, e2)
        det = _dot(e1, pvec)
        live = jnp.abs(det) > _DET_EPS
        inv_det = jnp.where(live, 1.0 / jnp.where(live, det, 1.0), 0.0)
        tvec = o_ - v0
        u = _dot(tvec, pvec) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = _dot(d_, qvec) * inv_det
        t = _dot(e2, qvec) * inv_det
        margin = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)  # >0 inside
        occ = jax.nn.sigmoid(margin * inv_beta)
        occ = jnp.where(live & in_window(t), occ, 0.0)
        vis = vis * jnp.prod(1.0 - occ, axis=1)

    if scene.spheres.center.shape[0] > 0:
        sp = scene.spheres
        oc = sp.center[None] - o[:, None, :]          # [B,N,3]
        tc = _dot(oc, d[:, None, :])                  # closest-approach param
        q = o[:, None, :] + tc[..., None] * d[:, None, :] - sp.center[None]
        s = (jnp.sqrt(_dot(q, q) + 1e-30)
             - sp.radius[None]) / jnp.maximum(sp.radius[None], 1e-30)
        occ = jax.nn.sigmoid(-s * inv_beta)
        occ = jnp.where(in_window(tc), occ, 0.0)
        vis = vis * jnp.prod(1.0 - occ, axis=1)

    if scene.boxes.lo.shape[0] > 0:
        bx = scene.boxes
        o_ = o[:, None, :]
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)[:, None, :]
        t0 = (bx.lo[None] - o_) * inv
        t1 = (bx.hi[None] - o_) * inv
        tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
        margin = (tfar - tnear) / dist[:, None]       # >0 on hit (chord len)
        occ = jax.nn.sigmoid(margin * inv_beta)
        occ = jnp.where(in_window(tnear), occ, 0.0)
        vis = vis * jnp.prod(1.0 - occ, axis=1)

    # Cylinders / cones: smooth radial margin at the clamped closest axial
    # station — the silhouette boundary (distance from the ray to the axis
    # vs the local radius) carries the gradient; the axial t-window stays
    # hard, like the sphere/box treatment above.
    for prim, is_cone in ((scene.cylinders, False), (scene.cones, True)):
        if prim.p0.shape[0] == 0:
            continue
        p0 = prim.p0[None]                         # [1,N,3]
        u_ax = prim.p1[None] - p0
        ulen2 = jnp.maximum(_dot(u_ax, u_ax), 1e-30)
        o_ = o[:, None, :]
        d_ = d[:, None, :]
        # closest axial parameter between the ray line and the axis line:
        # minimize |(o + t d) - (p0 + s u)|^2 -> s = (f - e b)/(c - b^2)
        # with w0 = o - p0, b = d.u, c = u.u, e = d.w0, f = u.w0
        w0 = o_ - p0
        b_du = _dot(d_, u_ax)
        e_dw = _dot(d_, w0)
        f_uw = _dot(u_ax, w0)
        denom = jnp.maximum(ulen2 - b_du * b_du, 1e-12)
        s_ax = jnp.clip((f_uw - e_dw * b_du) / denom, 0.0, 1.0)
        axis_pt = p0 + s_ax[..., None] * u_ax
        tc = _dot(axis_pt - o_, d_)
        perp = axis_pt - o_ - tc[..., None] * d_
        dist_ax = jnp.sqrt(_dot(perp, perp) + 1e-30)
        r_ref = jnp.maximum(prim.radius[None], 1e-30)
        r_local = r_ref * (1.0 - s_ax) if is_cone else r_ref
        sm = (dist_ax - r_local) / r_ref
        occ = jax.nn.sigmoid(-sm * inv_beta)
        occ = jnp.where(in_window(tc), occ, 0.0)
        vis = vis * jnp.prod(1.0 - occ, axis=1)

    # Circles (disks): smooth radial margin of the plane hit point.
    if scene.circles.center.shape[0] > 0:
        cc = scene.circles
        o_ = o[:, None, :]
        d_ = d[:, None, :]
        dn = _dot(d_, cc.normal[None])
        safe_dn = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
        t = _dot(cc.center[None] - o_, cc.normal[None]) / safe_dn
        q = o_ + t[..., None] * d_ - cc.center[None]
        r_ref = jnp.maximum(cc.radius[None], 1e-30)
        margin = (r_ref - jnp.sqrt(_dot(q, q) + 1e-30)) / r_ref
        occ = jax.nn.sigmoid(margin * inv_beta)
        occ = jnp.where(in_window(t) & (jnp.abs(dn) > 1e-9), occ, 0.0)
        vis = vis * jnp.prod(1.0 - occ, axis=1)

    return vis
