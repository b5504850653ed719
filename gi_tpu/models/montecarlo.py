"""Wavefront Monte Carlo path tracing.

The reference nests whole recursive path traces inside per-hit sample loops
(raytracer.cpp:47-135 spawning montecarlo.cpp:16-305, which recurses back
into DirectIllumination/CausticIllumination).  That megakernel recursion is
flattened here into ONE batched walk: every secondary sample (transmissive /
specular / indirect) becomes a lane in a ray stream; a per-lane `phase` bit
distinguishes `MonteCarlo_PathTrace` lanes (shade direct+caustic each bounce)
from `MonteCarlo_IndirectSample` lanes (walk silently to the first diffuse
hit, then estimate the global photon map); Russian-roulette branching is a
masked select; the walk runs under `lax.while_loop` until every lane dies or
the static depth cap (cfg.max_monte_depth) is reached.

Estimator notes (bug-for-bug parity with the reference):
  * sample counts are static (cfg.*_test) instead of the reference's
    per-material ceil((TEST*w + TEST)/2) in [TEST/2, TEST] — same estimator
    mean, marginally lower variance per sample count.
  * the diffuse->indirect transition multiplies kd TWICE (raytracer.cpp:134
    then montecarlo.cpp:115), which we replicate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import sampling as S
from ..ops.intersect import intersect_scene
from ..photon import gather
from ..scene.types import LIGHT_AREA, LIGHT_RECT, Scene
from ..utils import stats as ST
from ..utils.config import RenderConfig
from .direct import shade_direct

PHASE_PATH = 0      # MonteCarlo_PathTrace semantics
PHASE_INDIRECT = 1  # MonteCarlo_IndirectSample semantics


def _shadow_rays_per_light(scene: Scene, cfg: RenderConfig,
                           in_monte_carlo: bool) -> int:
    """Static shadow-ray count per shaded hit, summed over lights
    (ComputeIllumination dispatch, illumination_utils.cpp:425-494; inside
    Monte Carlo 2D-light sampling is capped at 2, :435-438)."""
    if not (cfg.shadows and cfg.direct_illum):
        return 0
    n = 0
    for kind in scene.lights.kind:
        if kind in (LIGHT_AREA, LIGHT_RECT) and cfg.soft_shadows:
            n += 2 if in_monte_carlo else (cfg.light_test + cfg.shadow_test)
        else:
            n += 1
    return n


@struct.dataclass
class GatherQueue:
    """Deferred photon-map radiance requests (P8 sharded-map render).

    When photon maps are device-sharded, estimates inside the walk cannot
    run where they arise: the ring-exchange gather is a collective, and
    the walk's `while_loop` trip count is data-dependent per device.  The
    estimates are additive leaf contributions (caustic per bounce, global
    at walk termination), so they defer exactly: the walk scatters each
    request (query geometry + BRDF + the color weight and output row of
    its contribution) into this fixed-capacity queue by prefix-sum slot —
    the same lock-free scheme as the photon store buffers — and ONE
    batched ring gather per map answers them after the walk
    (parallel/mesh.py::render_tile_mapsharded)."""
    point: jnp.ndarray    # [C,3] query position
    normal: jnp.ndarray   # [C,3]
    bounce: jnp.ndarray   # [C,3] exact reflective bounce (Phong lobe axis)
    ct: jnp.ndarray       # [C] cos_theta
    kd: jnp.ndarray       # [C,3]
    ks: jnp.ndarray       # [C,3]
    shin: jnp.ndarray     # [C]
    weight: jnp.ndarray   # [C,3] color += weight * estimate
    row: jnp.ndarray      # [C] int32 output color row
    count: jnp.ndarray    # [] int32 wanted requests (can exceed C)

    @property
    def cap(self) -> int:
        return self.point.shape[0]


def _empty_queue(cap: int) -> GatherQueue:
    z3 = jnp.zeros((cap, 3))
    z1 = jnp.zeros((cap,))
    return GatherQueue(point=z3, normal=z3, bounce=z3, ct=z1, kd=z3, ks=z3,
                       shin=z1, weight=z3,
                       row=jnp.full((cap,), cap, jnp.int32),
                       count=jnp.asarray(0, jnp.int32))


def _enqueue(q: GatherQueue, want, point, normal, bounce, ct, kd, ks, shin,
             weight, row) -> GatherQueue:
    """Masked prefix-sum scatter of requests; slots past the cap drop (the
    count keeps counting so overflow is detectable, like emit_round)."""
    cap = q.cap
    off = jnp.cumsum(want.astype(jnp.int32)) - 1
    slot = jnp.where(want, q.count + off, cap)
    wz = jnp.where(want[:, None], weight, 0.0)
    return GatherQueue(
        point=q.point.at[slot].set(point, mode="drop"),
        normal=q.normal.at[slot].set(normal, mode="drop"),
        bounce=q.bounce.at[slot].set(bounce, mode="drop"),
        ct=q.ct.at[slot].set(ct, mode="drop"),
        kd=q.kd.at[slot].set(kd, mode="drop"),
        ks=q.ks.at[slot].set(ks, mode="drop"),
        shin=q.shin.at[slot].set(shin, mode="drop"),
        weight=q.weight.at[slot].set(wz, mode="drop"),
        row=q.row.at[slot].set(row, mode="drop"),
        count=q.count + jnp.sum(want, dtype=jnp.int32))


@struct.dataclass
class WalkState:
    key: jnp.ndarray
    o: jnp.ndarray        # [B,3] ray origin
    d: jnp.ndarray        # [B,3] ray direction
    weight: jnp.ndarray   # [B,3] path throughput
    phase: jnp.ndarray    # [B] int32
    alive: jnp.ndarray    # [B] bool
    color: jnp.ndarray    # [B,3] accumulated radiance
    depth: jnp.ndarray    # [] int32
    counters: jnp.ndarray  # [ST.N_COUNTERS] int32 dispatched-ray counters
    cq: GatherQueue | None = None  # deferred caustic requests (sharded maps)
    gq: GatherQueue | None = None  # deferred global-map requests


def _bounce_eps(scene):
    return 1e-4 * scene.radius


def mc_walk(scene: Scene, cfg: RenderConfig, key, o, d, weight, phase, alive,
            photon_maps, out_row=None, out_scale=None,
            queue_caps: tuple | None = None):
    """Run the wavefront walk; returns (color [B,3], counters) — plus the
    deferred-gather queues when `photon_maps` is a ShardedMaps.

    In deferred mode a lane's photon-map contributions land at color row
    `out_row[lane]` scaled by `out_scale[lane]` (shade_secondary folds its
    per-group total_w/ns averaging in here so requests scatter straight to
    primary-ray rows); both default to identity."""
    from ..photon.gather import ShardedMaps

    B = o.shape[0]
    # Photon-map estimates are ALWAYS deferred into request queues and
    # answered after the walk with one batched gather per map — running
    # the gather inside the loop would pay a full-batch kNN every
    # iteration for the handful of lanes that want one (and for sharded
    # maps a collective cannot sit inside the data-dependent while_loop
    # at all).
    sharded = isinstance(photon_maps, ShardedMaps)
    if sharded:
        defer_caustic = (photon_maps.caustic is not None
                         or photon_maps.caustic_rep is not None)
        defer_global = (photon_maps.global_ is not None
                        or photon_maps.global_rep is not None)
    else:
        defer_caustic = (photon_maps is not None
                         and photon_maps.caustic is not None)
        defer_global = (photon_maps is not None
                        and photon_maps.global_ is not None)
    defer = defer_caustic or defer_global
    if defer:
        if out_row is None:
            out_row = jnp.arange(B, dtype=jnp.int32)
        if out_scale is None:
            out_scale = jnp.ones((B, 3))
        cap_c, cap_g = queue_caps if queue_caps is not None else (2 * B, B)

    state = WalkState(
        key=key, o=o, d=d, weight=weight,
        phase=phase.astype(jnp.int32), alive=alive,
        color=jnp.zeros((B, 3)), depth=jnp.asarray(0, jnp.int32),
        counters=jnp.zeros((ST.N_COUNTERS,), jnp.int32),
        cq=_empty_queue(cap_c) if defer_caustic else None,
        gq=_empty_queue(cap_g) if defer_global else None)

    mc_shadow_factor = _shadow_rays_per_light(scene, cfg, in_monte_carlo=True)

    def cond(s: WalkState):
        return (s.depth < cfg.max_monte_depth) & jnp.any(s.alive)

    def body(s: WalkState):
        key, k_dir, k_rr, k_spec = jax.random.split(s.key, 4)
        hit = intersect_scene(scene, s.o, s.d, t_min=0.0)
        mats = scene.materials

        # per-hop ray accounting (reference monte_ray_count++ per walk step)
        n_alive = jnp.sum(s.alive, dtype=jnp.int32)
        counters = s.counters.at[ST.MONTE].add(n_alive)
        if cfg.monte_carlo:
            counters = counters.at[ST.SHADOW].add(
                jnp.sum(s.alive & hit.valid, dtype=jnp.int32)
                * mc_shadow_factor)

        # ---- miss: background, die (montecarlo.cpp:165-169,299-303) ----
        miss = s.alive & ~hit.valid
        color = s.color + jnp.where(miss[:, None],
                                    s.weight * scene.background, 0.0)
        live = s.alive & hit.valid

        kd = mats.kd[hit.mat]
        ks = mats.ks[hit.mat]
        kt = mats.kt[hit.mat]
        emis = mats.emission[hit.mat]
        shin = mats.shininess[hit.mat]
        ir = mats.ir[hit.mat]
        is_transp = jnp.any(kt > 0, axis=-1)

        view = S.normalize(hit.point - s.o)
        cos_theta = S.dot(hit.normal, -view)
        in_path = live & (s.phase == PHASE_PATH)

        # ---- per-bounce shading for PathTrace lanes --------------------
        cq = s.cq
        gq = s.gq
        if cfg.monte_carlo:
            buffer = jnp.zeros((B, 3))
            if cfg.ambient:
                buffer = buffer + scene.ambient
            key, k_direct = jax.random.split(key)
            buffer = shade_direct(scene, cfg, k_direct, hit, s.o, buffer,
                                  in_monte_carlo=True)
            if cfg.caustic_illum and defer_caustic:
                # deferred: contribution is buffer-term * s.weight, so the
                # queued weight folds throughput and the caller's per-group
                # scale; answered by one batched gather after the walk
                exact = S.reflective_bounce(hit.normal, view, cos_theta)
                is_d_ = jnp.any(kd > 0, axis=-1)
                want = in_path & is_d_
                cq = _enqueue(cq, want, hit.point, hit.normal, exact,
                              cos_theta, kd, ks, shin,
                              s.weight * out_scale, out_row)
                counters = counters.at[ST.CAUSTIC].add(
                    jnp.sum(want, dtype=jnp.int32))
            color = color + jnp.where(in_path[:, None], buffer * s.weight, 0.0)

        # ---- Russian roulette branch selection -------------------------
        r_coeff = jnp.zeros((B,))
        if cfg.fresnel:
            # phase0 gating: SPECULAR && TRANSMISSIVE (montecarlo.cpp:89);
            # phase1 gating: FRESNEL only (montecarlo.cpp:226)
            rc = S.compute_reflection_coeff(cos_theta, ir, cfg.ir_air)
            use0 = (cfg.specular_illum and cfg.transmissive_illum)
            gate = jnp.where(s.phase == PHASE_PATH,
                             jnp.asarray(use0), jnp.asarray(True))
            r_coeff = jnp.where(gate & is_transp, rc, 0.0)

        prob_d = S.max_channel(kd)
        prob_t0 = S.max_channel(kt)
        prob_s = S.max_channel(ks) + r_coeff * prob_t0
        prob_t = prob_t0 * (1.0 - r_coeff)
        prob_term = S.max_channel(emis) + cfg.prob_absorb
        prob_total = prob_d + prob_t + prob_s + prob_term

        u = jax.random.uniform(k_rr, (B,))
        rand = jnp.where(prob_total > 1.0, u * prob_total, u)

        take_d = rand < prob_d
        take_t = (~take_d) & (rand < prob_d + prob_t)
        take_s = (~take_d) & (~take_t) & (rand < prob_d + prob_t + prob_s)

        # ---- diffuse branch --------------------------------------------
        # PathTrace lanes: transition to the indirect walk (if INDIRECT) or
        # gather the global map (FAST_GLOBAL), else die.
        # IndirectSample lanes: gather the global map and die.
        u_dir = jax.random.uniform(k_dir, (B, 2))
        cosine_dir = S.diffuse_importance_sample(hit.normal, cos_theta,
                                                 u_dir[:, 0], u_dir[:, 1])
        safe_pd = jnp.maximum(prob_d, 1e-12)

        have_global = defer_global

        new_phase = s.phase
        new_weight = s.weight
        new_d = s.d
        die = jnp.zeros((B,), bool)

        d_path = take_d & in_path
        d_ind = take_d & live & (s.phase == PHASE_INDIRECT)

        if cfg.indirect_illum and cfg.monte_carlo:
            # IndirectIllumination inside MC: weight *= kd^2 / prob_d
            # (raytracer.cpp:134 + montecarlo.cpp:115), new cosine direction,
            # lane becomes an IndirectSample walk.
            trans = d_path
            new_phase = jnp.where(trans, PHASE_INDIRECT, new_phase)
            new_weight = jnp.where(trans[:, None],
                                   s.weight * kd * kd / safe_pd[:, None],
                                   new_weight)
            new_d = jnp.where(trans[:, None], cosine_dir, new_d)
            glob_want = d_ind
        elif cfg.fast_global and have_global:
            die = die | d_path
            glob_want = d_ind | d_path
        else:
            die = die | d_path
            glob_want = d_ind

        if defer_global:
            exact = S.reflective_bounce(hit.normal, view, cos_theta)
            gq = _enqueue(gq, glob_want, hit.point, hit.normal, exact,
                          cos_theta, kd, ks, shin,
                          kd * s.weight / safe_pd[:, None] * out_scale,
                          out_row)
        die = die | d_ind

        # ---- transmissive branch ---------------------------------------
        # Runs even with transmissive_illum off: phase0 requires
        # TRANSMISSIVE_ILLUM (montecarlo.cpp:123) but phase1 (IndirectSample)
        # has no such check (montecarlo.cpp:261).
        t_act = take_t & live
        allowed = (jnp.asarray(cfg.transmissive_illum)
                   | (s.phase == PHASE_INDIRECT))
        t_go = t_act & allowed
        exact_t = S.transmissive_bounce(hit.normal, view, cos_theta, ir,
                                        cfg.ir_air)
        if cfg.distrib_transmissive:
            u_s = jax.random.uniform(k_spec, (B, 2))
            sampled_t = S.specular_importance_sample(
                exact_t, shin, cos_theta, u_s[:, 0], u_s[:, 1])
        else:
            sampled_t = exact_t
        safe_pt = jnp.maximum(prob_t, 1e-12)
        new_d = jnp.where(t_go[:, None], sampled_t, new_d)
        new_weight = jnp.where(
            t_go[:, None],
            new_weight * (1.0 - r_coeff[:, None]) * kt / safe_pt[:, None],
            new_weight)
        die = die | (t_act & ~allowed)

        # ---- specular branch -------------------------------------------
        s_act = take_s & live
        allowed = (jnp.asarray(cfg.specular_illum)
                   | (s.phase == PHASE_INDIRECT))
        s_go = s_act & allowed
        exact_s = S.reflective_bounce(hit.normal, view, cos_theta)
        if cfg.distrib_specular:
            key, k_spec2 = jax.random.split(key)
            u_s = jax.random.uniform(k_spec2, (B, 2))
            sampled_s = S.specular_importance_sample(
                exact_s, shin, cos_theta, u_s[:, 0], u_s[:, 1])
        else:
            sampled_s = exact_s
        safe_ps = jnp.maximum(prob_s, 1e-12)
        new_d = jnp.where(s_go[:, None], sampled_s, new_d)
        new_weight = jnp.where(
            s_go[:, None],
            new_weight * (ks + r_coeff[:, None] * kt) / safe_ps[:, None],
            new_weight)
        die = die | (s_act & ~allowed)

        # ---- absorb / terminate ----------------------------------------
        absorbed = live & ~take_d & ~take_t & ~take_s
        die = die | absorbed

        alive = live & ~die
        new_o = jnp.where(alive[:, None],
                          hit.point + new_d * _bounce_eps(scene), s.o)
        return WalkState(key=key, o=new_o, d=new_d, weight=new_weight,
                         phase=new_phase, alive=alive, color=color,
                         depth=s.depth + 1, counters=counters,
                         cq=cq, gq=gq)

    if cfg.differentiable:
        # reverse-mode AD can't differentiate while_loop; unroll to a
        # fixed-trip scan (all-dead iterations are masked no-ops).  The
        # trip count is capped by diff_monte_depth: at the reference
        # default max_monte_depth=128 nearly every lane is dead by depth
        # ~10 (Russian roulette), so running all 128 masked iterations
        # costs ~4-20x for nothing.  Truncation bias at the default cap
        # of 32 is P(alive at 32) ~ albedo^32 < 0.1% of walk energy.
        depth = min(cfg.max_monte_depth, cfg.diff_monte_depth)

        def scan_body(s, _):
            return body(s), None
        final, _ = jax.lax.scan(scan_body, state, None, length=depth)
    else:
        final = jax.lax.while_loop(cond, body, state)
    if defer:
        return final.color, final.counters, final.cq, final.gq
    return final.color, final.counters


def shade_secondary(scene: Scene, cfg: RenderConfig, key, hit, ray_o, ray_d,
                    color, photon_maps):
    """Secondary layers of RayTrace (raytracer.cpp:204-231): transmissive +
    specular + indirect sample batches (one fused walk) and the direct
    caustic / global-map estimates at the primary hit.

    Returns (color, counters[ST.N_COUNTERS] int32); with a ShardedMaps,
    (color, counters, caustic_queue, global_queue) — the caller runs the
    ring gathers and scatter-adds `est * weight` at queue rows.

    Photon-map estimates (walk-internal AND primary-hit) are deferred
    into GatherQueues; with replicated maps they are answered right here
    with one batched local gather per map, so the expensive kNN runs once
    per tile on exactly the requests that exist instead of once per walk
    bounce over every lane."""
    from ..photon.gather import ShardedMaps
    sharded = isinstance(photon_maps, ShardedMaps)
    if sharded:
        caustic_grid = photon_maps.caustic_rep
        global_grid = photon_maps.global_rep
        has_caustic = photon_maps.caustic is not None or caustic_grid is not None
        has_global = photon_maps.global_ is not None or global_grid is not None
    else:
        caustic_grid = photon_maps.caustic if photon_maps is not None else None
        global_grid = photon_maps.global_ if photon_maps is not None else None
        has_caustic = caustic_grid is not None
        has_global = global_grid is not None
    defer = has_caustic or has_global
    cq = gq = None

    counters = jnp.zeros((ST.N_COUNTERS,), jnp.int32)
    mats = scene.materials
    B = hit.t.shape[0]
    kd = mats.kd[hit.mat]
    ks = mats.ks[hit.mat]
    kt = mats.kt[hit.mat]
    shin = mats.shininess[hit.mat]
    ir = mats.ir[hit.mat]
    is_d = jnp.any(kd > 0, axis=-1)
    is_s = jnp.any(ks > 0, axis=-1)
    is_t = jnp.any(kt > 0, axis=-1)

    view = S.normalize(hit.point - ray_o)
    cos_theta = S.dot(hit.normal, -view)
    eps = _bounce_eps(scene)

    # Fresnel split at the primary hit (raytracer.cpp:204-214)
    r_coeff = jnp.zeros((B,))
    if (cfg.transmissive_illum and cfg.specular_illum and cfg.fresnel):
        r_coeff = jnp.where(
            is_t, S.compute_reflection_coeff(cos_theta, ir, cfg.ir_air), 0.0)

    groups = []  # (o, d, weight_per_sample, phase, alive, ns, total_weight)

    def spawn(k, ns, exact_or_none, phase, active, total_w, distrib):
        """Build ns samples per ray for one secondary group."""
        u = jax.random.uniform(k, (B, ns, 2))
        if exact_or_none is None:
            dirs = S.diffuse_importance_sample(
                hit.normal[:, None], cos_theta[:, None],
                u[..., 0], u[..., 1])
        elif distrib:
            dirs = S.specular_importance_sample(
                exact_or_none[:, None], shin[:, None], cos_theta[:, None],
                u[..., 0], u[..., 1])
        else:
            dirs = jnp.broadcast_to(exact_or_none[:, None], (B, ns, 3))
        o2 = hit.point[:, None] + dirs * eps
        w = jnp.ones((B, ns, 3))
        ph = jnp.full((B, ns), phase, jnp.int32)
        al = jnp.broadcast_to(active[:, None], (B, ns))
        groups.append((o2.reshape(-1, 3), dirs.reshape(-1, 3),
                       w.reshape(-1, 3), ph.reshape(-1), al.reshape(-1),
                       ns, total_w, active))

    if cfg.transmissive_illum and cfg.monte_carlo:
        key, k = jax.random.split(key)
        exact_t = S.transmissive_bounce(hit.normal, view, cos_theta, ir,
                                        cfg.ir_air)
        active = hit.valid & is_t & (r_coeff < 1.0)
        total_w = (1.0 - r_coeff)[:, None] * kt
        spawn(k, cfg.transmissive_test, exact_t, PHASE_PATH, active, total_w,
              cfg.distrib_transmissive)

    if cfg.specular_illum and cfg.monte_carlo:
        key, k = jax.random.split(key)
        exact_s = S.reflective_bounce(hit.normal, view, cos_theta)
        active = hit.valid & (is_s | (r_coeff > 0))
        total_w = kt * r_coeff[:, None] + ks
        spawn(k, cfg.specular_test, exact_s, PHASE_PATH, active, total_w,
              cfg.distrib_specular)

    if cfg.indirect_illum:
        key, k = jax.random.split(key)
        active = hit.valid & is_d
        spawn(k, cfg.indirect_test, None, PHASE_INDIRECT, active, kd, False)

    if groups:
        # sample-spawn accounting (raytracer.cpp:57,89,119 sample loops);
        # group order matches the spawn calls above
        cat = iter([ST.TRANSMISSIVE] * (1 if cfg.transmissive_illum
                                        and cfg.monte_carlo else 0)
                   + [ST.SPECULAR] * (1 if cfg.specular_illum
                                      and cfg.monte_carlo else 0)
                   + [ST.INDIRECT] * (1 if cfg.indirect_illum else 0))
        for (_, _, _, _, _, ns, _, active) in groups:
            counters = counters.at[next(cat)].add(
                jnp.sum(active, dtype=jnp.int32) * ns)

        o2 = jnp.concatenate([g[0] for g in groups])
        d2 = jnp.concatenate([g[1] for g in groups])
        w2 = jnp.concatenate([g[2] for g in groups])
        ph2 = jnp.concatenate([g[3] for g in groups])
        al2 = jnp.concatenate([g[4] for g in groups])
        key, k_walk = jax.random.split(key)
        if defer:
            # fold each group's mean(axis=1) * total_w averaging into the
            # per-lane deferred-request scale, so queued contributions
            # scatter straight to primary-ray rows
            rows = jnp.concatenate([
                jnp.repeat(jnp.arange(B, dtype=jnp.int32), g[5])
                for g in groups])
            scales = jnp.concatenate([
                jnp.repeat(g[6] / g[5], g[5], axis=0) for g in groups])
            n_lanes = o2.shape[0]
            walked, walk_counters, cq, gq = mc_walk(
                scene, cfg, k_walk, o2, d2, w2, ph2, al2, photon_maps,
                out_row=rows, out_scale=scales,
                queue_caps=(2 * n_lanes + B, n_lanes + B))
        else:
            walked, walk_counters = mc_walk(scene, cfg, k_walk, o2, d2, w2,
                                            ph2, al2, photon_maps)
        counters = counters + walk_counters
        ofs = 0
        for (_, _, _, _, _, ns, total_w, active) in groups:
            part = walked[ofs:ofs + B * ns].reshape(B, ns, 3).mean(axis=1)
            color = color + jnp.where(active[:, None], part * total_w, 0.0)
            ofs += B * ns

    # Caustic estimate at the primary hit (raytracer.cpp:138-149)
    prim_row = jnp.arange(B, dtype=jnp.int32)
    if cfg.caustic_illum and has_caustic:
        if cq is None:
            cq = _empty_queue(B)
        exact = S.reflective_bounce(hit.normal, view, cos_theta)
        want = hit.valid & is_d
        cq = _enqueue(cq, want, hit.point, hit.normal, exact, cos_theta,
                      kd, ks, shin, jnp.ones((B, 3)), prim_row)
        counters = counters.at[ST.CAUSTIC].add(
            jnp.sum(want, dtype=jnp.int32))

    # Direct photon-map visualization / fast-global layer
    # (raytracer.cpp:151-167, gated by -photon_viz/-fast_global)
    if cfg.direct_photon_illum and has_global:
        if gq is None:
            gq = _empty_queue(B)
        exact = S.reflective_bounce(hit.normal, view, cos_theta)
        gq = _enqueue(gq, hit.valid & is_d, hit.point, hit.normal, exact,
                      cos_theta, kd, ks, shin, jnp.ones((B, 3)), prim_row)

    if sharded:
        return color, counters, cq, gq

    # Replicated maps: answer the queues locally, one batched gather per
    # map; scatter-add est*weight at the recorded rows.
    if cq is not None:
        est = gather.estimate_radiance(
            caustic_grid, cq.point, cq.normal, cq.bounce, cq.ct,
            cq.kd, cq.ks, cq.shin, cfg.caustic_estimate_size,
            cfg.caustic_estimate_dist, cfg.caustic_filter, cfg)
        color = color.at[cq.row].add(est * cq.weight, mode="drop")
        counters = counters.at[ST.DROPPED_GATHER].add(
            jnp.maximum(cq.count - cq.cap, 0))
    if gq is not None:
        if cfg.irradiance_cache:
            est = gather.estimate_cached_radiance(
                global_grid, gq.point, gq.normal, gq.bounce, gq.ct,
                gq.kd, gq.ks, gq.shin, cfg.global_estimate_dist)
        else:
            est = gather.estimate_radiance(
                global_grid, gq.point, gq.normal, gq.bounce, gq.ct,
                gq.kd, gq.ks, gq.shin, cfg.global_estimate_size,
                cfg.global_estimate_dist, cfg.global_filter, cfg)
        color = color.at[gq.row].add(est * gq.weight, mode="drop")
        counters = counters.at[ST.DROPPED_GATHER].add(
            jnp.maximum(gq.count - gq.cap, 0))
    return color, counters
