"""Sampling & physics math: pure-function mirrors of reference
utils/graphics_utils.cpp, driven by explicit uniform variates.

Every sampler takes uniforms in [0,1) (produced by `jax.random` threefry
keys split per ray — the deterministic TPU replacement for the reference's
per-thread mt19937, RNScalar.cpp:99-131).  Distributions match the reference
exactly; rejection loops (disk/ball picking) are replaced by closed-form
equal-distribution transforms so shapes stay static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


# Tables at or under this many rows are "looked up" with a select chain
# instead of a gather: on v5e EVERY gather at walk width pays an
# index+result relayout (~1.6 ms per gather at 4M lanes — the r4 HLO dump
# showed 94 of them per bounce after fusion duplication), while select
# chains measure ~0.15 ms and fuse cleanly.  A one-hot matmul is NOT a
# safe alternative: XLA's simplifier pattern-matches it straight back
# into the 2-D gather (seen in the r4 render-tile HLO as
# `gather(..., slice_sizes={1,3})`).  Materials and non-mesh primitive
# arrays are tiny; only triangle soups exceed this.
_SELECT_MAX = 32


def take_rows(table, idx):
    """Row lookup `table[idx]` tuned for TPU.

    A plain gather from a [N, C] table (C small, e.g. material kd /
    triangle normals) hits XLA's transposed-tiled 2-D gather path and
    runs ~250x slower than the alternatives (measured on v5e, round-4:
    17.4 ms vs ~0.15 ms for 4M indices into a [3, 3] table — the photon
    walk spent ~200 of its 256 ms/bounce in five such lookups).

    Policy: single-row tables broadcast; small tables use per-row select
    chains (no gather op at all, comparisons shared across columns);
    everything else gathers each column from its 1-D slice
    (loop-invariant, hoisted).  `idx` may have any shape; returns shape
    idx.shape + [C].
    """
    if table.ndim == 1:
        return take_scalar(table, idx)
    assert table.ndim == 2
    n, c = table.shape
    if n == 1:
        return jnp.broadcast_to(table[0], idx.shape + (c,))
    if n <= _SELECT_MAX:
        eq = [idx == m for m in range(1, n)]
        cols = []
        for col in range(c):
            acc = jnp.broadcast_to(table[0, col], idx.shape)
            for m in range(1, n):
                acc = jnp.where(eq[m - 1], table[m, col], acc)
            cols.append(acc)
        return jnp.stack(cols, axis=-1)
    return jnp.stack([table[:, col][idx] for col in range(c)], axis=-1)


def take_scalar(col, idx):
    """1-D lookup `col[idx]` with the same small-table policy as
    take_rows (select chain for small tables, plain gather otherwise)."""
    n = col.shape[0]
    if n == 1:
        return jnp.broadcast_to(col[0], idx.shape)
    if n <= _SELECT_MAX:
        acc = jnp.broadcast_to(col[0], idx.shape)
        for m in range(1, n):
            acc = jnp.where(idx == m, col[m], acc)
        return acc
    return col[idx]


def normalize(v, eps=1e-12):
    # sum-of-squares + eps form: finite reverse-mode gradients at v == 0.
    # eps must be >= 1e-12: rsqrt's backward is -x^(-3/2)/2, which overflows
    # f32 (-> inf -> 0*inf NaN) for smaller floors.
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def safe_arccos(x, eps=1e-6):
    """arccos with finite gradients at |x| = 1 (clip inside the domain)."""
    return jnp.arccos(jnp.clip(x, -1.0 + eps, 1.0 - eps))


def max_channel(rgb):
    """MaxChannelVal (graphics_utils.cpp:38-46): max over RGB, floored at 0."""
    return jnp.maximum(jnp.max(rgb, axis=-1), 0.0)


def normalize_color(rgb):
    """NormalizeColor (graphics_utils.cpp:25-35): scale to unit L1 sum."""
    total = jnp.sum(rgb, axis=-1, keepdims=True)
    return jnp.where(total > 0, rgb / jnp.where(total > 0, total, 1.0), rgb)


def clamp_color(rgb):
    return jnp.clip(rgb, 0.0, 1.0)


def perp_vector(n):
    """The reference's perpendicular-vector convention
    (graphics_utils.cpp:174-178): u=(n1,-n0,0), or (n2,0,-n0) when |n2|~1."""
    u_a = jnp.stack([n[..., 1], -n[..., 0], jnp.zeros_like(n[..., 0])], -1)
    u_b = jnp.stack([n[..., 2], jnp.zeros_like(n[..., 0]), -n[..., 0]], -1)
    use_b = (1.0 - jnp.abs(n[..., 2]) < 0.1)[..., None]
    return normalize(jnp.where(use_b, u_b, u_a))


def onb(n):
    """Orthonormal basis (u, v) with v = n x u (rotation frame around n)."""
    u = perp_vector(n)
    v = normalize(jnp.cross(n, u))
    return u, v


def uniform_disk(u1, u2):
    """(r1, r2) uniform in the unit disk — closed form for the reference's
    rejection sampling (e.g. illumination_utils.cpp:150-154)."""
    r = jnp.sqrt(u1)
    th = TWO_PI * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def uniform_sphere_dir(u1, u2):
    """Unit vector uniform on the sphere — closed form for the reference's
    ball-rejection + normalize (photontracer.cpp:245-253)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    th = TWO_PI * u2
    return jnp.stack([r * jnp.cos(th), r * jnp.sin(th), z], -1)


def uniform_cone_dir(axis, cos_max, u1, u2):
    """Unit vector uniform over the solid-angle cone of half-angle
    acos(cos_max) around `axis` ([...,3] broadcastable).  cos_max = -1
    degenerates to the uniform sphere (same marginal as
    `uniform_sphere_dir`), which is how callers opt out of the cone.

    Used by the caustic projection-map emission sampler
    (photon/trace.py): Jensen's photon emission importance sampling, the
    optimization the reference names but does not implement
    (README.md:352)."""
    z = 1.0 - u1 * (1.0 - cos_max)          # cos(theta) uniform in [cos_max,1]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    th = TWO_PI * u2
    u, v = onb(axis)
    local = (r * jnp.cos(th))[..., None] * u + (r * jnp.sin(th))[..., None] * v
    return local + z[..., None] * axis


def _around_axis(axis, theta, phi):
    """Direction at polar angle theta from `axis`, azimuth phi, using the
    reference's perpendicular + rotate construction
    (graphics_utils.cpp:173-183)."""
    u = perp_vector(axis)
    w = normalize(jnp.cross(axis, u))
    sin_t = jnp.sin(theta)[..., None]
    cos_t = jnp.cos(theta)[..., None]
    cos_p = jnp.cos(phi)[..., None]
    sin_p = jnp.sin(phi)[..., None]
    return normalize(axis * cos_t + sin_t * (u * cos_p + w * sin_p))


def diffuse_importance_sample(normal, cos_theta, u1, u2):
    """Cosine-weighted hemisphere around the (flipped-to-incident) normal:
    theta = acos(sqrt(u)), phi = 2 pi v (graphics_utils.cpp:162-185)."""
    n = jnp.where((cos_theta < 0)[..., None], -normal, normal)
    theta = jnp.arccos(jnp.sqrt(jnp.clip(u1, 0.0, 1.0)))
    phi = TWO_PI * u2
    return _around_axis(n, theta, phi)


def specular_importance_sample(exact, shininess, cos_theta, u1, u2):
    """Phong-lobe sample around `exact` with the grazing-angle rescale:
    alpha = acos(u^(1/(n+1))) * (1 - acos(|cos_theta|) 2/pi)
    (graphics_utils.cpp:189-216, after Lafortune & Willems 1994)."""
    angle_limit = 1.0 - safe_arccos(jnp.abs(cos_theta)) * 2.0 / jnp.pi
    # clamp u away from 0: u^(1/(n+1)) has a 0*log(0) NaN in d/dn at u=0
    u1c = jnp.clip(u1, 1e-7, 1.0)
    alpha = safe_arccos(u1c ** (1.0 / (shininess + 1.0))) * angle_limit
    phi = TWO_PI * u2
    return _around_axis(exact, alpha, phi)


def compute_reflection_coeff(cos_theta, ir_mat, ir_air=1.0):
    """Schlick's approximation (graphics_utils.cpp:95-101)."""
    r0 = ((ir_air - ir_mat) / (ir_air + ir_mat)) ** 2
    return r0 + (1.0 - r0) * (1.0 - jnp.abs(cos_theta)) ** 5


def reflective_bounce(normal, view, cos_theta):
    """Mirror reflection of `view` (unit, pointing surface-ward) about the
    incident-side normal (graphics_utils.cpp:104-117)."""
    n = jnp.where((cos_theta < 0)[..., None], -normal, normal)
    ct = jnp.abs(cos_theta)
    return normalize(view + 2.0 * ct[..., None] * n)


def transmissive_bounce(normal, view, cos_theta, ir_mat, ir_air=1.0):
    """Snell refraction with total-internal-reflection fallback, mirroring
    the reference's tan-phi construction (graphics_utils.cpp:121-154).

    cos_theta = normal . (-view); negative means the ray exits the medium.
    """
    entering = cos_theta >= 0
    eta = jnp.where(entering, ir_air / ir_mat, ir_mat / ir_air)
    n = jnp.where(entering[..., None], normal, -normal)
    ct = jnp.abs(cos_theta)
    sin_t = jnp.sqrt(jnp.clip(1.0 - ct * ct, 1e-12, 1.0))
    sin_phi = eta * sin_t
    tir = jnp.abs(sin_phi) > 1.0

    reflect = reflective_bounce(n, view, ct)

    # refraction: view_parallel = normalize(view + n ct); dir = normalize(
    #   view_parallel tan(phi) - n)
    cos_phi = jnp.sqrt(jnp.maximum(1e-12, 1.0 - jnp.minimum(sin_phi, 1.0) ** 2))
    tan_phi = jnp.minimum(sin_phi, 1.0) / cos_phi
    vpar = view + n * ct[..., None]
    # guard: at normal incidence vpar ~ 0; refraction is straight through (-n
    # direction == view)
    vpar_len = jnp.sqrt(jnp.sum(vpar * vpar, axis=-1, keepdims=True) + 1e-30)
    vpar_unit = vpar / vpar_len
    refral = normalize(vpar_unit * tan_phi[..., None] - n)
    straight = normalize(-n)
    refr = jnp.where(vpar_len > 1e-8, refral, straight)

    return jnp.where(tir[..., None], reflect, refr)


# --------------------------------------------------------------------------
# RGBE color compression (Ward packed format), reference
# graphics_utils.cpp:50-77 — kept for photon-storage parity tests; the TPU
# photon store uses bf16 power which has the same 8-bit-exponent character.
# --------------------------------------------------------------------------

def rgb_to_rgbe(rgb):
    """Pack [..,3] float rgb into [..,4] uint8 RGBE."""
    maxc = jnp.max(rgb, axis=-1)
    # frexp: max = mantissa * 2^exp with mantissa in [0.5, 1)
    mantissa, exponent = jnp.frexp(jnp.maximum(maxc, 1e-38))
    scale = 256.0 * mantissa / jnp.maximum(maxc, 1e-38)
    rgbe = jnp.concatenate([
        (rgb * scale[..., None]).astype(jnp.uint8),
        (exponent + 128)[..., None].astype(jnp.uint8),
    ], axis=-1)
    zero = (maxc <= 0)[..., None]
    return jnp.where(zero, jnp.zeros_like(rgbe), rgbe)


def rgbe_to_rgb(rgbe):
    """Unpack [..,4] uint8 RGBE to [..,3] float rgb."""
    e = rgbe[..., 3].astype(jnp.int32)
    inv = jnp.exp2((e - 128 - 8).astype(jnp.float32))
    rgb = rgbe[..., :3].astype(jnp.float32) * inv[..., None]
    return jnp.where((e == 0)[..., None], jnp.zeros_like(rgb), rgb)


# --------------------------------------------------------------------------
# Photon incident-direction compression (photon_utils.cpp:56-65, 253-272):
# 16-bit (phi, theta) spherical index
# --------------------------------------------------------------------------

def encode_direction(v):
    """Pack unit vectors [..,3] to uint16 phi*256+theta."""
    phi = ((jnp.arctan2(v[..., 1], v[..., 0]) + jnp.pi)
           * (255.0 / TWO_PI)).astype(jnp.uint16)
    theta = (jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))
             * (255.0 / jnp.pi)).astype(jnp.uint16)
    return phi * 256 + theta


def decode_direction(code):
    """Unpack uint16 direction codes to unit vectors (the reference builds a
    65536-entry LUT; on TPU the trig is cheaper than a gather)."""
    phi = (code // 256).astype(jnp.float32) * (TWO_PI / 255.0) - jnp.pi
    theta = (code % 256).astype(jnp.float32) * (jnp.pi / 255.0)
    st = jnp.sin(theta)
    return normalize(jnp.stack(
        [st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], -1))
