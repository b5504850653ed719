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
    """Deferred photon-map radiance requests.

    Estimates inside the walk cannot (sharded maps: collectives in a
    data-dependent while_loop) or should not (one batched kNN per tile
    beats one per bounce) run where they arise.  They are additive leaf
    contributions (caustic per bounce, global at walk termination), so
    they defer exactly: the walk scatters each request (query geometry +
    BRDF + the color weight and output row of its contribution) into this
    fixed-capacity queue by prefix-sum slot — the same lock-free scheme
    as the photon store buffers — and ONE batched gather per map answers
    them after the walk (shade_secondary locally, or
    parallel/mesh.py::render_tile_mapsharded by ring exchange).

    Storage is COLUMN-major: a tuple of 1-D arrays.  Scatters into [C,3]
    arrays get a transposed tiled layout from XLA (~15x slower per the
    v5e profile of the photon store buffers) and padding multi-million x3
    temporaries to (8,128) tiles cost 42x memory; 1-D T(1024) columns
    have neither problem.  The [C,3] views are stacked once at answer
    time via the properties below."""
    data: tuple           # 20 1-D f32 columns (layout below)
    row: jnp.ndarray      # [C] int32 output color row
    count: jnp.ndarray    # [] int32 wanted requests (can exceed C)

    # column index layout: point 0-2, normal 3-5, bounce 6-8, ct 9,
    # kd 10-12, ks 13-15, shin 16, weight 17-19
    @property
    def cap(self) -> int:
        return self.data[0].shape[0]

    def _vec3(self, i):
        return jnp.stack(self.data[i:i + 3], axis=-1)

    @property
    def point(self):
        return self._vec3(0)

    @property
    def normal(self):
        return self._vec3(3)

    @property
    def bounce(self):
        return self._vec3(6)

    @property
    def ct(self):
        return self.data[9]

    @property
    def kd(self):
        return self._vec3(10)

    @property
    def ks(self):
        return self._vec3(13)

    @property
    def shin(self):
        return self.data[16]

    @property
    def weight(self):
        return self._vec3(17)


def _empty_queue(cap: int) -> GatherQueue:
    # unfilled slots sit at a FAR point (outside every grid): the Pallas
    # gather wrapper gives out-of-bbox queries empty photon windows, so
    # unfilled capacity is free — zeros would put them at the scene
    # center, the densest cell of a caustic map (r4: the empty tail of a
    # 139k-cap queue cost more kNN time than the real requests)
    far = jnp.full((cap,), 1e9)
    return GatherQueue(data=(far, far, far)
                       + tuple(jnp.zeros((cap,)) for _ in range(17)),
                       row=jnp.full((cap,), cap, jnp.int32),
                       count=jnp.asarray(0, jnp.int32))


def _lane_queue_init(width: int, n_rows: int) -> tuple:
    """Per-lane request slots (data 20-tuple, valid, rows) — lane i owns
    slot i, writes are vectorized selects (full-width stages) or small
    orig-indexed scatters (compacted stages)."""
    far = jnp.full((width,), 1e9)
    data = (far, far, far) + tuple(jnp.zeros((width,)) for _ in range(17))
    return (data, jnp.zeros((width,), bool),
            jnp.full((width,), n_rows, jnp.int32))


def _lane_queue_write(lq: tuple, fresh, orig, cols: tuple, row,
                      full_width: bool) -> tuple:
    data, valid, rows = lq
    if full_width:
        data = tuple(jnp.where(fresh, c, a) for a, c in zip(data, cols))
        valid = valid | fresh
        rows = jnp.where(fresh, row, rows)
    else:
        w0 = valid.shape[0]
        oidx = jnp.where(fresh, orig, w0)
        data = tuple(a.at[oidx].set(c, mode="drop")
                     for a, c in zip(data, cols))
        valid = valid.at[oidx].set(True, mode="drop")
        rows = rows.at[oidx].set(row, mode="drop")
    return (data, valid, rows)


def _lane_queue_pack(lq: tuple, cap: int,
                     extra: GatherQueue | None = None) -> GatherQueue:
    """Prefix-compact a per-lane queue into a GatherQueue (one scatter per
    column, once per walk), appending `extra` (the overflow queue)."""
    data, valid, rows = lq
    off = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slot = jnp.where(valid, off, cap)
    base = _empty_queue(cap)
    out = tuple(b.at[slot].set(c, mode="drop")
                for b, c in zip(base.data, data))
    row = base.row.at[slot].set(rows, mode="drop")
    n1 = jnp.sum(valid, dtype=jnp.int32)
    count = n1
    if extra is not None:
        ecap = extra.row.shape[0]
        lane = jnp.arange(ecap, dtype=jnp.int32)
        idx2 = jnp.where(lane < extra.count, n1 + lane, cap)
        out = tuple(b.at[idx2].set(c, mode="drop")
                    for b, c in zip(out, extra.data))
        row = row.at[idx2].set(extra.row, mode="drop")
        count = count + extra.count
    return GatherQueue(data=out, row=row, count=count)


def _enqueue(q: GatherQueue, want, point, normal, bounce, ct, kd, ks, shin,
             weight, row) -> GatherQueue:
    """Masked prefix-sum scatter of requests; slots past the cap drop (the
    count keeps counting so overflow is detectable, like emit_round)."""
    cap = q.cap
    off = jnp.cumsum(want.astype(jnp.int32)) - 1
    slot = jnp.where(want, q.count + off, cap)
    wz = jnp.where(want[:, None], weight, 0.0)
    cols = (point[:, 0], point[:, 1], point[:, 2],
            normal[:, 0], normal[:, 1], normal[:, 2],
            bounce[:, 0], bounce[:, 1], bounce[:, 2], ct,
            kd[:, 0], kd[:, 1], kd[:, 2],
            ks[:, 0], ks[:, 1], ks[:, 2], shin,
            wz[:, 0], wz[:, 1], wz[:, 2])
    return GatherQueue(
        data=tuple(b.at[slot].set(c, mode="drop")
                   for b, c in zip(q.data, cols)),
        row=q.row.at[slot].set(row, mode="drop"),
        count=q.count + jnp.sum(want, dtype=jnp.int32))


@struct.dataclass
class WalkState:
    key: jnp.ndarray
    o: jnp.ndarray        # [W,3] ray origin (W = current stage width)
    d: jnp.ndarray        # [W,3] ray direction
    weight: jnp.ndarray   # [W,3] path throughput
    phase: jnp.ndarray    # [W] int32
    alive: jnp.ndarray    # [W] bool
    row: jnp.ndarray      # [W] int32 output color row of this lane
    scale: jnp.ndarray    # [W,3] caller-folded contribution scale
    color: tuple          # 3 x [n_rows] accumulated radiance columns
                          # (1-D: scatter-adds into [n,3] lay out
                          # transposed-tiled and run ~15x slower)
    depth: jnp.ndarray    # [] int32
    counters: jnp.ndarray  # [ST.N_COUNTERS] int32 dispatched-ray counters
    cq: GatherQueue | None = None   # caustic OVERFLOW requests (a lane's
                                    # second+ request — mixed kd+kt/ks
                                    # materials only; cond-gated scatter)
    gq: GatherQueue | None = None   # deferred global-map requests
                                    # (scatter mode — used when per-lane
                                    # mode is off)
    orig: jnp.ndarray | None = None  # [W] original lane id (per-lane
                                    # queue slot through compaction)
    cql: tuple | None = None  # per-lane caustic queue (data20, valid,
                              # rows) — full-width, one slot per lane:
                              # per-bounce enqueues are vectorized selects
                              # instead of 21 full-width scatters (~30 ms
                              # EACH at 2.1M lanes, r4 profile: the walk
                              # spent 7.3 of its 7.5 s in them)
    gql: tuple | None = None  # per-lane global-map queue (same layout;
                              # a lane's global request coincides with
                              # its death, so one slot always suffices)


def _bounce_eps(scene):
    return 1e-4 * scene.radius


def mc_walk(scene: Scene, cfg: RenderConfig, key, o, d, weight, phase, alive,
            photon_maps, out_row=None, out_scale=None,
            queue_caps: tuple | None = None, n_rows: int | None = None):
    """Run the wavefront walk; returns (color [n_rows,3], counters) — plus
    the deferred-gather queues when any photon map is present.

    Every lane's contributions (radiance AND photon-map requests) land at
    color row `out_row[lane]` scaled by `out_scale[lane]`: shade_secondary
    folds its per-group total_w/ns averaging in here, so the walk writes
    straight to primary-ray rows and the carry never holds a per-lane
    color.  Defaults are identity (row i of the output = lane i).

    Lanes die fast (Russian roulette) but a while_loop pays full width
    while ANY lane lives, so the non-differentiable walk compacts
    survivors to B/4 after 12 bounces and to B/16 after 36 (masked prefix
    gather — same scheme as photon/trace.emit_round).  Lanes beyond a
    compaction width are dropped and counted in ST.DROPPED_LANES (never
    silent; vanishingly rare at these margins — distinct from
    ST.DROPPED_GATHER, which counts request-queue overflow)."""
    from ..photon.gather import ShardedMaps

    B = o.shape[0]
    if out_row is None:
        out_row = jnp.arange(B, dtype=jnp.int32)
    if out_scale is None:
        out_scale = jnp.ones((B, 3))
    if n_rows is None:
        n_rows = B
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
    # A queue only exists when a LAYER actually enqueues into it: a map
    # being merely present must not cost anything (r4 bug: with
    # caustic_illum off but a 10M caustic map loaded, the walk still
    # answered an all-empty full-capacity queue against the map — tens of
    # seconds of kNN for zero requests, enough to trip the 60 s device
    # watchdog once any real layer was added).
    defer_caustic = defer_caustic and cfg.caustic_illum
    defer_global = defer_global and (cfg.indirect_illum or cfg.fast_global
                                     or cfg.direct_photon_illum)
    defer = defer_caustic or defer_global
    cap_c, cap_g = queue_caps if queue_caps is not None else (B, B)

    state = WalkState(
        key=key, o=o, d=d, weight=weight,
        phase=phase.astype(jnp.int32), alive=alive,
        row=out_row, scale=out_scale,
        color=tuple(jnp.zeros((n_rows,)) for _ in range(3)),
        depth=jnp.asarray(0, jnp.int32),
        counters=jnp.zeros((ST.N_COUNTERS,), jnp.int32),
        # per-lane request slots; cq holds only OVERFLOW (a lane's 2nd+
        # caustic request — possible only at mixed diffuse+spec/transmissive
        # materials; a global request coincides with lane death, so gql
        # never overflows)
        cq=_empty_queue(min(cap_c, 4 * n_rows)) if defer_caustic else None,
        gq=None,
        orig=jnp.arange(B, dtype=jnp.int32) if defer else None,
        cql=_lane_queue_init(B, n_rows) if defer_caustic else None,
        gql=_lane_queue_init(B, n_rows) if defer_global else None)

    mc_shadow_factor = _shadow_rays_per_light(scene, cfg, in_monte_carlo=True)

    def cond(s: WalkState):
        return (s.depth < cfg.max_monte_depth) & jnp.any(s.alive)

    def add_color(color, mask, contrib, s):
        """color[row] += where(mask, contrib * scale) per 1-D column."""
        c = jnp.where(mask[:, None], contrib * s.scale, 0.0)
        r = jnp.where(mask, s.row, n_rows)  # drop masked rows outright
        return tuple(col.at[r].add(c[:, i], mode="drop")
                     for i, col in enumerate(color))

    def body(s: WalkState):
        Bw = s.o.shape[0]
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
        color = add_color(s.color, miss, s.weight * scene.background, s)
        live = s.alive & hit.valid

        kd = S.take_rows(mats.kd, hit.mat)
        ks = S.take_rows(mats.ks, hit.mat)
        kt = S.take_rows(mats.kt, hit.mat)
        emis = S.take_rows(mats.emission, hit.mat)
        shin = S.take_scalar(mats.shininess, hit.mat)
        ir = S.take_scalar(mats.ir, hit.mat)
        is_transp = jnp.any(kt > 0, axis=-1)

        view = S.normalize(hit.point - s.o)
        cos_theta = S.dot(hit.normal, -view)
        in_path = live & (s.phase == PHASE_PATH)

        # ---- per-bounce shading for PathTrace lanes --------------------
        cq = s.cq
        gq = s.gq
        cql = s.cql
        gql = s.gql
        full_w = Bw == B   # stage-1: per-lane writes are pure selects
        if cfg.monte_carlo:
            buffer = jnp.zeros((Bw, 3))
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
                wz = jnp.where(want[:, None], s.weight * s.scale, 0.0)
                cols = (hit.point[:, 0], hit.point[:, 1], hit.point[:, 2],
                        hit.normal[:, 0], hit.normal[:, 1], hit.normal[:, 2],
                        exact[:, 0], exact[:, 1], exact[:, 2], cos_theta,
                        kd[:, 0], kd[:, 1], kd[:, 2],
                        ks[:, 0], ks[:, 1], ks[:, 2], shin,
                        wz[:, 0], wz[:, 1], wz[:, 2])
                had = cql[1] if full_w else cql[1][s.orig]
                fresh = want & ~had
                # cond-gate the 20-column queue write: it rewrites the
                # full-width arrays (~170 MB at the reference's -tt/-st
                # expansion) and most bounces of a walk enqueue nothing
                cql = jax.lax.cond(
                    jnp.any(fresh),
                    lambda q: _lane_queue_write(q, fresh, s.orig, cols,
                                                s.row, full_w),
                    lambda q: q, cql)
                # 2nd+ request of a lane (mixed kd+kt/ks material):
                # cond-gated scatter into the small overflow queue —
                # scenes without such materials never pay the scatters
                over = want & had
                cq = jax.lax.cond(
                    jnp.any(over),
                    lambda q: _enqueue(q, over, hit.point, hit.normal,
                                       exact, cos_theta, kd, ks, shin,
                                       s.weight * s.scale, s.row),
                    lambda q: q, cq)
                counters = counters.at[ST.CAUSTIC].add(
                    jnp.sum(want, dtype=jnp.int32))
            color = add_color(color, in_path, buffer * s.weight, s)

        # ---- Russian roulette branch selection -------------------------
        r_coeff = jnp.zeros((Bw,))
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

        u = jax.random.uniform(k_rr, (Bw,))
        rand = jnp.where(prob_total > 1.0, u * prob_total, u)

        take_d = rand < prob_d
        take_t = (~take_d) & (rand < prob_d + prob_t)
        take_s = (~take_d) & (~take_t) & (rand < prob_d + prob_t + prob_s)

        # ---- diffuse branch --------------------------------------------
        # PathTrace lanes: transition to the indirect walk (if INDIRECT) or
        # gather the global map (FAST_GLOBAL), else die.
        # IndirectSample lanes: gather the global map and die.
        u_dir = jax.random.uniform(k_dir, (Bw, 2))
        cosine_dir = S.diffuse_importance_sample(hit.normal, cos_theta,
                                                 u_dir[:, 0], u_dir[:, 1])
        safe_pd = jnp.maximum(prob_d, 1e-12)

        have_global = defer_global

        new_phase = s.phase
        new_weight = s.weight
        new_d = s.d
        die = jnp.zeros((Bw,), bool)

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
            gw = kd * s.weight / safe_pd[:, None] * s.scale
            gwz = jnp.where(glob_want[:, None], gw, 0.0)
            gcols = (hit.point[:, 0], hit.point[:, 1], hit.point[:, 2],
                     hit.normal[:, 0], hit.normal[:, 1], hit.normal[:, 2],
                     exact[:, 0], exact[:, 1], exact[:, 2], cos_theta,
                     kd[:, 0], kd[:, 1], kd[:, 2],
                     ks[:, 0], ks[:, 1], ks[:, 2], shin,
                     gwz[:, 0], gwz[:, 1], gwz[:, 2])
            # a lane's global request coincides with its death -> the
            # per-lane slot can never be taken twice
            gql = jax.lax.cond(
                jnp.any(glob_want),
                lambda q: _lane_queue_write(q, glob_want, s.orig, gcols,
                                            s.row, full_w),
                lambda q: q, gql)
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
            u_s = jax.random.uniform(k_spec, (Bw, 2))
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
            u_s = jax.random.uniform(k_spec2, (Bw, 2))
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
                         phase=new_phase, alive=alive, row=s.row,
                         scale=s.scale, color=color,
                         depth=s.depth + 1, counters=counters,
                         cq=cq, gq=gq, orig=s.orig, cql=cql, gql=gql)

    def walk_compact(st, NW):
        """Gather surviving lanes into an NW-wide stage (color/counters/
        queues stay full-size; dropped survivors are counted)."""
        alive = st.alive
        w = alive.shape[0]
        n_alive = jnp.sum(alive, dtype=jnp.int32)
        dropped = jnp.maximum(n_alive - NW, 0)
        idx = jnp.nonzero(alive, size=NW, fill_value=w)[0]
        lane_ok = idx < w
        cidx = jnp.clip(idx, 0, w - 1)
        return WalkState(
            key=st.key, o=S.take_rows(st.o, cidx), d=S.take_rows(st.d, cidx),
            weight=S.take_rows(st.weight, cidx), phase=st.phase[cidx],
            alive=st.alive[cidx] & lane_ok,
            row=jnp.where(lane_ok, st.row[cidx], n_rows),
            scale=st.scale[cidx], color=st.color, depth=st.depth,
            counters=st.counters.at[ST.DROPPED_LANES].add(dropped),
            cq=st.cq, gq=st.gq,
            orig=(jnp.where(lane_ok, st.orig[cidx], B)
                  if st.orig is not None else None),
            cql=st.cql, gql=st.gql)

    def cond_upto(limit):
        def c(s):
            return (s.depth < limit) & jnp.any(s.alive)
        return c

    if cfg.differentiable:
        # reverse-mode AD can't differentiate while_loop; unroll to a
        # fixed-trip scan (all-dead iterations are masked no-ops).  The
        # trip count is capped by diff_monte_depth: at the reference
        # default max_monte_depth=128 nearly every lane is dead by depth
        # ~10 (Russian roulette), so running all 128 masked iterations
        # costs ~4-20x for nothing.  Truncation bias at the default cap
        # of 32 is P(alive at 32) ~ albedo^32 < 0.1% of walk energy.
        # (No compaction here: nonzero/gather under AD is not worth it.)
        depth = min(cfg.max_monte_depth, cfg.diff_monte_depth)

        def scan_body(s, _):
            return body(s), None
        final, _ = jax.lax.scan(scan_body, state, None, length=depth)
    else:
        d1 = min(cfg.max_monte_depth, 12)
        final = jax.lax.while_loop(cond_upto(d1), body, state)
        if cfg.max_monte_depth > d1:
            d2 = min(cfg.max_monte_depth, 36)
            final = walk_compact(final, max(512, B // 4))
            final = jax.lax.while_loop(cond_upto(d2), body, final)
            if cfg.max_monte_depth > d2:
                final = walk_compact(final, max(512, B // 16))
                final = jax.lax.while_loop(cond, body, final)
    color_out = jnp.stack(final.color, axis=-1)
    if defer:
        # prefix-compact the per-lane slots once (21 scatters per queue
        # per WALK instead of per bounce)
        cq_out = (_lane_queue_pack(final.cql, cap_c, extra=final.cq)
                  if defer_caustic else None)
        gq_out = (_lane_queue_pack(final.gql, cap_g)
                  if defer_global else None)
        return color_out, final.counters, cq_out, gq_out
    return color_out, final.counters


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
    # mirror mc_walk's gating: a map only defers when its layer is on
    has_caustic = has_caustic and cfg.caustic_illum
    has_global = has_global and (cfg.indirect_illum or cfg.fast_global
                                 or cfg.direct_photon_illum)
    defer = has_caustic or has_global
    # Big (subcell-table) replicated maps: return the queues to the HOST
    # instead of answering in-program.  The queue capacity covers the
    # worst case (one request per walk lane — 2.1M at the reference's
    # -tt/-st 128 expansion), but the filled prefix is usually a few
    # thousand: answering inside the tile program paid the full-capacity
    # kNN every tile (47 s — past the 60 s device watchdog), while the
    # host slices the REAL count and answers right-sized (render_image).
    defer_out = (not sharded) and (
        (has_caustic and caustic_grid is not None
         and caustic_grid.sub_div > 1)
        or (has_global and global_grid is not None
            and global_grid.sub_div > 1))
    cq = gq = None

    counters = jnp.zeros((ST.N_COUNTERS,), jnp.int32)
    mats = scene.materials
    B = hit.t.shape[0]
    kd = S.take_rows(mats.kd, hit.mat)
    ks = S.take_rows(mats.ks, hit.mat)
    kt = S.take_rows(mats.kt, hit.mat)
    shin = S.take_scalar(mats.shininess, hit.mat)
    ir = S.take_scalar(mats.ir, hit.mat)
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
        # fold each group's mean(axis=1) * total_w averaging into the
        # per-lane scale, so both radiance and deferred requests scatter
        # straight to primary-ray rows inside the walk (inactive lanes are
        # dead from spawn and contribute nothing)
        rows = jnp.concatenate([
            jnp.repeat(jnp.arange(B, dtype=jnp.int32), g[5])
            for g in groups])
        scales = jnp.concatenate([
            jnp.repeat(g[6] / g[5], g[5], axis=0) for g in groups])
        n_lanes = o2.shape[0]
        out = mc_walk(
            scene, cfg, k_walk, o2, d2, w2, ph2, al2, photon_maps,
            out_row=rows, out_scale=scales,
            queue_caps=(n_lanes + B, n_lanes + B), n_rows=B)
        if defer:
            walked, walk_counters, cq, gq = out
        else:
            walked, walk_counters = out
        counters = counters + walk_counters
        color = color + walked

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

    if sharded or defer_out:
        return color, counters, cq, gq

    # Small replicated maps: answer the queues locally, one batched gather
    # per map; scatter-add est*weight at the recorded rows.
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
