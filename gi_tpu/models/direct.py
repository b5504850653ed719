"""Direct illumination: batched mirror of reference DirectIllumination
(raytracer.cpp:18-44), ComputeIllumination (illumination_utils.cpp:425-494),
the per-class R3Light Reflection functions, and the soft-shadow samplers
ComputeArea/RectLightReflection (illumination_utils.cpp:91-417).

Lights are processed in a static Python loop (kinds are compile-time
metadata), each fully batched over the ray batch.  Soft-shadow sampling uses
static sample-count dims (cfg.light_test / cfg.shadow_test), so the whole
thing stays one jittable program.

Reference quirk preserved: ComputeAreaLightReflection rescales the *entire
accumulated color* (including ambient and earlier lights) by the shadow hit
ratio (illumination_utils.cpp:259-261) because the C++ passes the accumulator
by reference.  We replicate that for image parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import sampling as S
from ..ops.intersect import Hit, intersect_scene, occluded
from ..scene.types import (LIGHT_AREA, LIGHT_DIR, LIGHT_POINT, LIGHT_RECT,
                           LIGHT_SPOT, Scene)
from ..utils.config import RenderConfig

RN_EPS = 1e-4  # world-space offset scale (reference uses RN_EPSILON=1e-6 in f64)


def shadow_visible(scene: Scene, p_light: jnp.ndarray, p_surf: jnp.ndarray,
                   ray_count=None) -> jnp.ndarray:
    """RayIlluminationTest (illumination_utils.cpp:16-31): trace from the
    light sample to the surface point; visible iff nothing closer.  Uses the
    any-hit fast path (ops.intersect.occluded) instead of the reference's
    full closest-hit traversal — same predicate, no argmin/normal work."""
    delta = p_surf - p_light
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-30)
    d = delta / dist[..., None]
    return ~occluded(scene, p_light, d, t_max=dist * (1.0 - 1e-3),
                     t_min=(1e-3 * dist)[:, None])


def shadow_visibility(scene: Scene, cfg: RenderConfig, p_light, p_surf
                      ) -> jnp.ndarray:
    """Visibility as float [0,1]: the hard reference test, or — in
    differentiable mode with cfg.vis_softness > 0 — the smooth relaxation
    (ops.intersect.soft_visibility) so shadow-dependent losses have nonzero,
    FD-matching gradients w.r.t. light/scene parameters."""
    if cfg.differentiable and cfg.vis_softness > 0:
        from ..ops.intersect import soft_visibility
        return soft_visibility(scene, p_light, p_surf, cfg.vis_softness)
    return shadow_visible(scene, p_light, p_surf).astype(jnp.float32)


def _attenuated_intensity(lt, i, point):
    """IntensityAtPoint for point-ish lights: I/(ca + la d + qa d^2)."""
    delta = lt.position[i] - point
    d = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-30)
    denom = lt.ca[i] + d * lt.la[i] + d * d * lt.qa[i]
    safe = jnp.where(denom > 1e-12, denom, 1.0)
    return jnp.where(denom > 1e-12, lt.intensity[i] / safe, lt.intensity[i])


def _phong(kd, ks, shin, is_d, is_s, Ic, I, L, N, V):
    """Per-sample Phong reflection: I |N.L| kd Ic + I (V.R)^n ks Ic."""
    NL = S.dot(N, L)
    diff = (I * jnp.abs(NL))[..., None] * kd * Ic
    R = 2.0 * NL[..., None] * N - L
    VR = S.dot(V, R)
    spec_f = jnp.where(VR > 0, jnp.power(jnp.maximum(VR, 1e-30), shin), 0.0)
    spec = (I * spec_f)[..., None] * ks * Ic
    return jnp.where(is_d[..., None], diff, 0.0) + jnp.where(
        is_s[..., None], spec, 0.0)


def _light_plane_test(scene, i, kind, point, eye):
    """TestLightIntersection (illumination_utils.cpp:35-84): does `point` lie
    on this 2D light?  Returns (on_light [B], wrong_side [B])."""
    lt = scene.lights
    v = point - lt.position[i]
    vlen = jnp.linalg.norm(v, axis=-1)
    vu = v / jnp.maximum(vlen, 1e-30)[..., None]
    norm = lt.direction[i]
    coplanar = jnp.abs(S.dot(vu, norm)) < 1e-3
    if kind == LIGHT_AREA:
        inside = vlen <= lt.radius[i]
    else:  # LIGHT_RECT
        a1c = S.dot(v, lt.axis1[i])
        a2c = S.dot(v, lt.axis2[i])
        inside = ((jnp.abs(a1c * 2.0) <= lt.len1[i])
                  & (jnp.abs(a2c * 2.0) <= lt.len2[i]))
    on_light = coplanar & inside & (vlen > 1e-12)
    wrong_side = on_light & (S.dot(norm, eye - point) <= 0)
    return on_light, wrong_side


def _sample_on_light(scene, i, kind, u1, u2):
    """Random point on a 2D light, offset by eps along its normal."""
    lt = scene.lights
    norm = lt.direction[i]
    if kind == LIGHT_AREA:
        r1, r2 = S.uniform_disk(u1, u2)
        u, v = S.onb(norm)
        p = (lt.position[i] + (r1[..., None] * u + r2[..., None] * v)
             * lt.radius[i] + norm * RN_EPS)
    else:  # LIGHT_RECT (illumination_utils.cpp:315-319)
        a1 = lt.axis1[i] * lt.len1[i]
        a2 = lt.axis2[i] * lt.len2[i]
        p = (lt.position[i] + (u1 - 0.5)[..., None] * a1
             + (u2 - 0.5)[..., None] * a2 + norm * RN_EPS)
    return p


def _area_kind_area(scene, i, kind):
    lt = scene.lights
    if kind == LIGHT_AREA:
        return jnp.pi * lt.radius[i] ** 2
    a1 = lt.axis1[i] * lt.len1[i]
    a2 = lt.axis2[i] * lt.len2[i]
    return jnp.linalg.norm(jnp.cross(a1, a2))


def _reflection_2d_nosadow(scene, i, kind, key, kd, ks, shin, is_d, is_s,
                           eye, point, normal, ns):
    """R3AreaLight/R3RectLight::Reflection — stochastic disk/parallelogram
    Phong integration *without* occlusion (R3AreaLight.cpp:121-330)."""
    lt = scene.lights
    B = point.shape[0]
    norm = lt.direction[i]
    facing = S.dot(norm, point - lt.position[i]) >= 0
    area = _area_kind_area(scene, i, kind)
    Ic = lt.color[i]
    V = S.normalize(eye - point)

    def sample_term(k, nsamp, want_spec):
        u = jax.random.uniform(k, (B, nsamp, 2))
        sp = _sample_on_light(scene, i, kind, u[..., 0], u[..., 1])  # [B,ns,3]
        dv = sp - point[:, None]
        d = jnp.sqrt(jnp.sum(dv * dv, axis=-1) + 1e-30)
        denom = lt.ca[i] + d * lt.la[i] + d * d * lt.qa[i]
        safe = jnp.where(denom > 1e-12, denom, 1.0)
        I = jnp.where(denom > 1e-12, lt.intensity[i] / safe, lt.intensity[i])
        L = S.normalize(sp - point[:, None])
        # emission-direction weighting (R3AreaLight.cpp:188: I *= n.(-L) * 2)
        I = I * S.dot(jnp.broadcast_to(norm, L.shape), -L) * 2.0
        NL = S.dot(normal[:, None], L)
        if not want_spec:
            w = I * jnp.abs(NL)                       # [B,ns]
            return jnp.mean(w, axis=1)[..., None] * kd * Ic * area
        R = 2.0 * NL[..., None] * normal[:, None] - L
        VR = S.dot(V[:, None], R)
        w = jnp.where(VR > 0, I * jnp.power(jnp.maximum(VR, 1e-30), shin[:, None]), 0.0)
        return jnp.mean(w, axis=1)[..., None] * ks * Ic * area

    kd_key, ks_key = jax.random.split(key)
    out = jnp.where(is_d[:, None], sample_term(kd_key, ns, False), 0.0)
    out = out + jnp.where(is_s[:, None], sample_term(ks_key, 2 * ns, True), 0.0)
    return jnp.where(facing[:, None], out, 0.0)


def _soft_2d_light(scene, cfg, i, kind, key, kd, ks, shin, is_d, is_s, eye,
                   point, normal, ns, n_extra):
    """ComputeArea/RectLightReflection (illumination_utils.cpp:91-417):
    occlusion-tested Phong sampling + extra shadow-only samples.

    Returns (contribution [B,3], ratio [B]) where ratio = hits/samples is the
    reference's trailing accumulator rescale.  Visibility is a float in
    [0,1]: exactly 0/1 in the hard (reference) mode, smooth in
    differentiable soft-visibility mode."""
    lt = scene.lights
    B = point.shape[0]
    norm = lt.direction[i]
    facing = S.dot(norm, point - lt.position[i]) >= 0
    area = _area_kind_area(scene, i, kind)
    Ic = lt.color[i]
    V = S.normalize(eye - point)

    def draw_samples(k, nsamp):
        u = jax.random.uniform(k, (B, nsamp, 2))
        sp = _sample_on_light(scene, i, kind, u[..., 0], u[..., 1])
        vis = shadow_visibility(scene, cfg, sp.reshape(-1, 3),
                                jnp.broadcast_to(point[:, None], sp.shape)
                                .reshape(-1, 3)).reshape(B, nsamp)
        return sp, vis

    def intensity(sp):
        dv = sp - point[:, None]
        d = jnp.sqrt(jnp.sum(dv * dv, axis=-1) + 1e-30)
        denom = lt.ca[i] + d * lt.la[i] + d * d * lt.qa[i]
        safe = jnp.where(denom > 1e-12, denom, 1.0)
        I = jnp.where(denom > 1e-12, lt.intensity[i] / safe, lt.intensity[i])
        L = S.normalize(sp - point[:, None])
        I = I * S.dot(jnp.broadcast_to(norm, L.shape), -L) * 2.0
        return I, L

    k1, k2, k3 = jax.random.split(key, 3)

    # Diffuse loop (ns samples, counted only for diffuse materials)
    sp, vis_d = draw_samples(k1, ns)
    I, L = intensity(sp)
    NL = S.dot(normal[:, None], L)
    w_d = jnp.sum(vis_d * I * jnp.abs(NL), axis=1)
    hits_d = jnp.sum(vis_d, axis=1)
    diff = jnp.where(hits_d > 0, w_d / jnp.maximum(hits_d, 1e-12), 0.0)[
        :, None] * kd * Ic * area

    # Specular loop (2*ns samples)
    sp, vis_s = draw_samples(k2, 2 * ns)
    I, L = intensity(sp)
    NL = S.dot(normal[:, None], L)
    R = 2.0 * NL[..., None] * normal[:, None] - L
    VR = S.dot(V[:, None], R)
    w = jnp.where(VR > 0, I * jnp.power(jnp.maximum(VR, 1e-30), shin[:, None]), 0.0)
    w_s = jnp.sum(vis_s * w, axis=1)
    hits_s = jnp.sum(vis_s, axis=1)
    spec = jnp.where(hits_s > 0, w_s / jnp.maximum(hits_s, 1e-12), 0.0)[
        :, None] * ks * Ic * area

    # Extra shadow-only samples
    if n_extra > 0:
        _, vis_e = draw_samples(k3, n_extra)
        hits_e = jnp.sum(vis_e, axis=1)
    else:
        hits_e = jnp.zeros((B,))

    contrib = (jnp.where(is_d[:, None], diff, 0.0)
               + jnp.where(is_s[:, None], spec, 0.0))
    contrib = jnp.where(facing[:, None], contrib, 0.0)

    total_hits = (jnp.where(is_d, hits_d, 0.0) + jnp.where(is_s, hits_s, 0.0)
                  + hits_e)
    total_samples = (jnp.where(is_d, float(ns), 0.0)
                     + jnp.where(is_s, float(2 * ns), 0.0) + float(n_extra))
    ratio = jnp.where(total_samples > 0, total_hits / jnp.maximum(
        total_samples, 1.0), 1.0)
    # The reference computes the ratio (and samples shadows) regardless of
    # the facing check — only the reflection contribution is gated.
    return contrib, ratio


def shade_direct(scene: Scene, cfg: RenderConfig, key, hit: Hit,
                 eye: jnp.ndarray, acc: jnp.ndarray,
                 in_monte_carlo: bool) -> jnp.ndarray:
    """Add direct lighting + emission for a hit batch to accumulator `acc`.

    `eye` is the per-ray origin ([B,3] or [3]) — the reference passes the
    camera origin for primary rays and the bounce origin inside Monte Carlo.
    """
    mats = scene.materials
    point, normal = hit.point, hit.normal
    B = point.shape[0]
    if eye.ndim == 1:
        eye = jnp.broadcast_to(eye, point.shape)

    kd = S.take_rows(mats.kd, hit.mat)
    ks = S.take_rows(mats.ks, hit.mat)
    emission = S.take_rows(mats.emission, hit.mat)
    shin = S.take_scalar(mats.shininess, hit.mat)
    is_d = jnp.any(kd > 0, axis=-1)
    is_s = jnp.any(ks > 0, axis=-1)
    active = hit.valid & (is_d | is_s)

    view = S.normalize(point - eye)
    cos_theta = S.dot(normal, -view)

    compute_shadows = cfg.shadows and (not in_monte_carlo
                                       or cfg.recursive_shadows)
    ns = 2 if in_monte_carlo else cfg.light_test
    n_extra = 0 if in_monte_carlo else cfg.shadow_test

    should_emit = jnp.ones((B,), bool)
    lt = scene.lights

    for i, kind in enumerate(scene.lights.kind):
        key, sub = jax.random.split(key)
        # on-light test for 2D lights (skip contribution; kill emission if
        # on the dark side)
        if kind in (LIGHT_AREA, LIGHT_RECT):
            on_light, wrong_side = _light_plane_test(scene, i, kind, point, eye)
            should_emit = should_emit & ~(wrong_side & active)
            light_active = active & ~on_light
        else:
            light_active = active

        # ---------------- no-shadow path -------------------------------
        if not compute_shadows:
            if kind in (LIGHT_AREA, LIGHT_RECT):
                contrib = _reflection_2d_nosadow(
                    scene, i, kind, sub, kd, ks, shin, is_d, is_s, eye,
                    point, normal, ns)
            else:
                contrib = _simple_reflection(scene, i, kind, kd, ks, shin,
                                             is_d, is_s, eye, point, normal)
            acc = acc + jnp.where(light_active[:, None], contrib, 0.0)
            continue

        # ---------------- soft-shadow 2D lights ------------------------
        if kind in (LIGHT_AREA, LIGHT_RECT) and cfg.soft_shadows:
            contrib, ratio = _soft_2d_light(
                scene, cfg, i, kind, sub, kd, ks, shin, is_d, is_s, eye,
                point, normal, ns, n_extra)
            new_acc = (acc + contrib) * ratio[:, None]
            acc = jnp.where(light_active[:, None], new_acc, acc)
            continue

        # ---------------- hard-shadow path ------------------------------
        if kind == LIGHT_DIR:
            pl = point - lt.direction[i] * scene.radius * 3.0
        elif kind in (LIGHT_POINT, LIGHT_SPOT):
            pl = jnp.broadcast_to(lt.position[i], point.shape)
        else:  # 2D light, hard shadows: position + eps * normal
            pl = jnp.broadcast_to(lt.position[i] + RN_EPS * lt.direction[i],
                                  point.shape)

        nd = S.dot(normal, pl - point)
        side_ok = ~(((nd > 0) & (cos_theta < 0)) | ((nd < 0) & (cos_theta > 0)))
        vis = shadow_visibility(scene, cfg, pl, point)
        if kind in (LIGHT_AREA, LIGHT_RECT):
            contrib = _reflection_2d_nosadow(
                scene, i, kind, sub, kd, ks, shin, is_d, is_s, eye, point,
                normal, ns)
        else:
            contrib = _simple_reflection(scene, i, kind, kd, ks, shin, is_d,
                                         is_s, eye, point, normal)
        acc = acc + jnp.where((light_active & side_ok)[:, None],
                              contrib * vis[:, None], 0.0)

    # Emission (raytracer.cpp:41-43) — only when shading ran at all
    acc = acc + jnp.where((active & should_emit)[:, None], emission, 0.0)
    return acc


def _simple_reflection(scene, i, kind, kd, ks, shin, is_d, is_s, eye, point,
                       normal):
    """Deterministic Phong reflection for dir/point/spot lights
    (R3DirectionalLight/R3PointLight/R3SpotLight::Reflection)."""
    lt = scene.lights
    Ic = lt.color[i]
    V = S.normalize(eye - point)
    if kind == LIGHT_DIR:
        I = jnp.broadcast_to(lt.intensity[i], point.shape[:1])
        L = jnp.broadcast_to(-lt.direction[i], point.shape)
    else:
        I = _attenuated_intensity(lt, i, point)
        L = S.normalize(lt.position[i] - point)
        if kind == LIGHT_SPOT:
            # R3SpotLight::IntensityAtPoint (R3SpotLight.cpp:106-115)
            ML = S.normalize(point - lt.position[i])
            cos_a = S.dot(ML, lt.direction[i])
            inside = cos_a >= jnp.cos(lt.cutoff[i])
            I = jnp.where(
                inside,
                I * jnp.power(jnp.maximum(cos_a, 1e-30), lt.dropoff[i]), 0.0)
    return _phong(kd, ks, shin, is_d, is_s, Ic, I, L, normal, V)
