"""Photon emission + tracing + map building.

The reference traces photons on k threads, each with a thread-local 100k
buffer flushed under a global mutex (photonmap.cpp:145-257,
photon_utils.cpp:19-36), then builds a kd-tree.  TPU-native: a fixed-size
*emission round* is one jitted program — per-light emission samplers feed a
masked `while_loop` bounce walk that scatters store-records into a
fixed-capacity buffer by prefix-sum index (the lock-free equivalent of the
thread-local buffer, SURVEY.md §2.3 P3) — and the host runs the reference's
adaptive emission-cycle quota loop (photonmap.cpp:163-198) around it,
accumulating rounds until the storage goal is met.

Store-predicate grammar per map (photontracer.cpp:56-139):
  GLOBAL       store at every diffuse hit            (L{S|D}*D)
  FAST_GLOBAL  store only after >=1 diffuse bounce
  CAUSTIC      store only after >=1 specular/transmissive bounce,
               terminate at the first diffuse bounce (LS+D)

Powers are normalized after tracing: photon_power = total_power / emitted
(photonmap.cpp:339-361).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling as S
from ..ops.intersect import intersect_scene
from ..scene.types import (LIGHT_AREA, LIGHT_DIR, LIGHT_POINT, LIGHT_RECT,
                           LIGHT_SPOT, Scene)
from ..utils.config import RenderConfig
from .gather import PhotonGrid, PhotonMaps, build_grid, estimate_irradiance

MAP_GLOBAL, MAP_CAUSTIC = 0, 1


def light_power(scene: Scene, i: int) -> float:
    """LightPower (graphics_utils.cpp:223-258): sum(rgb) * area * flux."""
    lt = scene.lights
    kind = lt.kind[i]
    color_sum = float(np.sum(np.asarray(lt.color[i])))
    area = 1.0
    flux = 4.0 * np.pi
    if kind == LIGHT_DIR:
        area = np.pi * float(scene.radius) ** 2
        flux = 1.0
    elif kind == LIGHT_AREA:
        area = np.pi * float(lt.radius[i]) ** 2
        flux /= 2.0
    elif kind == LIGHT_RECT:
        a1 = np.asarray(lt.axis1[i]) * float(lt.len1[i])
        a2 = np.asarray(lt.axis2[i]) * float(lt.len2[i])
        area = float(np.linalg.norm(np.cross(a1, a2)))
        flux /= 2.0
    elif kind == LIGHT_SPOT:
        s = float(lt.dropoff[i])
        c = float(lt.cutoff[i])
        flux = 2.0 * np.pi / (s + 1.0) * (1.0 - np.cos(c) ** (s + 1.0))
    return color_sum * area * flux


def _specular_bounding_sphere(scene: Scene):
    """Bounding sphere (center [3], radius) of every specular/transmissive
    primitive, or None when the scene has no such geometry.  Host-side,
    conservative (bbox corners + primitive radii)."""
    mats = scene.materials
    spec = (np.asarray(mats.ks).sum(-1) + np.asarray(mats.kt).sum(-1)) > 0

    pts = []

    def take(mat_idx, *point_sets):
        m = spec[np.asarray(mat_idx)]
        if m.any():
            for p in point_sets:
                pts.append(np.asarray(p)[m])

    t = scene.tris
    if t.v0.shape[0]:
        v0 = np.asarray(t.v0)
        take(t.mat, v0, v0 + np.asarray(t.e1), v0 + np.asarray(t.e2))
    s = scene.spheres
    if s.center.shape[0]:
        c = np.asarray(s.center)
        r = np.asarray(s.radius)[:, None]
        for d in np.concatenate([np.eye(3), -np.eye(3)]):
            take(s.mat, c + r * d)
    b = scene.boxes
    if b.lo.shape[0]:
        lo, hi = np.asarray(b.lo), np.asarray(b.hi)
        both = np.stack([lo, hi])                     # [2,N,3]
        corners = [np.stack([both[i, :, 0], both[j, :, 1], both[k, :, 2]], 1)
                   for i in range(2) for j in range(2) for k in range(2)]
        take(b.mat, *corners)
    for prim in (scene.cylinders, scene.cones):
        if prim.p0.shape[0]:
            r = np.asarray(prim.radius)[:, None]
            take(prim.mat,
                 np.asarray(prim.p0) - r, np.asarray(prim.p0) + r,
                 np.asarray(prim.p1) - r, np.asarray(prim.p1) + r)
    cc = scene.circles
    if cc.center.shape[0]:
        r = np.asarray(cc.radius)[:, None]
        take(cc.mat, np.asarray(cc.center) - r, np.asarray(cc.center) + r)

    if not pts:
        return None
    allp = np.concatenate(pts)
    center = (allp.min(axis=0) + allp.max(axis=0)) / 2.0
    radius = float(np.sqrt(((allp - center) ** 2).sum(-1).max()))
    return center, radius


def _emission_cones(scene: Scene, map_type: int):
    """Caustic projection map (Jensen's photon emission importance
    sampling — the optimization the reference names but leaves on the
    table, README.md:352): a caustic photon's FIRST hit must be
    specular/transmissive (the walk dies unstored at a first diffuse
    hit, photontracer.cpp:116-139), so point-light emission directions
    outside the bounding cone of all specular geometry contribute
    exactly zero stores.  Restricting emission to that cone and counting
    each real photon as 1/coverage virtual emissions is therefore EXACT,
    and turns the dominant cost of dense caustic maps (rejected
    emissions) into useful work.

    Returns (axis [L,3] f32, cos_max [L] f32, coverage [L] float64):
    cos_max = -1 / coverage = 1 means full-sphere (non-point lights,
    global maps, light inside the bound)."""
    L = scene.n_lights
    axes = np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (L, 1))
    cosm = np.full((L,), -1.0, np.float32)
    cover = np.ones((L,), np.float64)
    if map_type != MAP_CAUSTIC:
        return axes, cosm, cover
    bound = _specular_bounding_sphere(scene)
    if bound is None:
        return axes, cosm, cover
    c, r = bound
    r += 1e-3 * float(scene.radius)
    for i, kind in enumerate(scene.lights.kind):
        if kind != LIGHT_POINT:
            continue
        p = np.asarray(scene.lights.position[i], np.float64)
        d = float(np.linalg.norm(c - p))
        if d <= r:
            continue  # light inside the bound: full sphere
        axes[i] = ((c - p) / d).astype(np.float32)
        cos_max = float(np.sqrt(max(0.0, 1.0 - (r / d) ** 2)))
        cosm[i] = np.float32(cos_max)
        cover[i] = (1.0 - cos_max) / 2.0
    return axes, cosm, cover


def _emit_from_light(scene: Scene, i: int, kind: int, key, n: int,
                     cone_axis=None, cone_cos=None):
    """Emission sampler for light i -> (origins [n,3], dirs [n,3]).
    Mirrors EmitPhotons per light class (photontracer.cpp:182-363).

    `cone_axis[i]`/`cone_cos[i]` restrict point-light emission to a
    bounding cone of the scene's specular geometry (caustic projection
    map — see _emission_cones); cone_cos = -1 is the full sphere."""
    lt = scene.lights
    u = jax.random.uniform(key, (n, 6))
    eps = 1e-4 * scene.radius
    if kind == LIGHT_DIR:
        # disk of SCENE_RADIUS outside the scene (photontracer.cpp:198-233)
        norm = lt.direction[i]
        center = scene.centroid - norm * scene.radius * 3.0
        uu, vv = S.onb(norm)
        r1, r2 = S.uniform_disk(u[:, 0], u[:, 1])
        o = (center + (r1[:, None] * uu + r2[:, None] * vv) * scene.radius
             + norm * eps)
        d = jnp.broadcast_to(norm, o.shape)
    elif kind == LIGHT_POINT:
        o = jnp.broadcast_to(lt.position[i], (n, 3))
        if cone_axis is None:
            d = S.uniform_sphere_dir(u[:, 0], u[:, 1])
        else:
            d = S.uniform_cone_dir(cone_axis[i], cone_cos[i],
                                   u[:, 0], u[:, 1])
    elif kind == LIGHT_SPOT:
        # Phong-lobe around the axis, rejection against the cutoff with a
        # "cheat" fallback (photontracer.cpp:258-286): the reference draws
        # up to 21 times (attempts_left = 20 in a do-while), then falls back
        # to ONE narrowed-lobe draw (cos_theta = cutoff shrinks angle_limit)
        # that is NOT re-checked against the cutoff.  Unrolled as 21 masked
        # draws + the unchecked cheat so the emitted distribution matches
        # (tests/test_photon.py KS test at 10-degree cutoffs).
        norm = jnp.broadcast_to(lt.direction[i], (n, 3))
        cutoff = jnp.cos(lt.cutoff[i])
        ones = jnp.ones((n,))
        d = S.specular_importance_sample(norm, lt.dropoff[i], ones,
                                         u[:, 0], u[:, 1])
        for attempt in range(20):
            ua = jax.random.uniform(jax.random.fold_in(key, attempt + 100),
                                    (n, 2))
            cand = S.specular_importance_sample(norm, lt.dropoff[i], ones,
                                                ua[:, 0], ua[:, 1])
            d = jnp.where((S.dot(d, norm) < cutoff)[:, None], cand, d)
        cheat = S.specular_importance_sample(norm, lt.dropoff[i],
                                             cutoff * ones, u[:, 2], u[:, 3])
        d = jnp.where((S.dot(d, norm) < cutoff)[:, None], cheat, d)
        o = jnp.broadcast_to(lt.position[i], (n, 3))
    elif kind == LIGHT_AREA:
        norm = lt.direction[i]
        uu, vv = S.onb(norm)
        r1, r2 = S.uniform_disk(u[:, 0], u[:, 1])
        o = (lt.position[i] + (r1[:, None] * uu + r2[:, None] * vv)
             * lt.radius[i] + norm * 1e-4 * scene.radius)
        nb = jnp.broadcast_to(norm, o.shape)
        d = S.diffuse_importance_sample(nb, jnp.ones((n,)), u[:, 2], u[:, 3])
    else:  # LIGHT_RECT
        norm = lt.direction[i]
        a1 = lt.axis1[i] * lt.len1[i]
        a2 = lt.axis2[i] * lt.len2[i]
        o = (lt.position[i] + (u[:, 0] - 0.5)[:, None] * a1
             + (u[:, 1] - 0.5)[:, None] * a2 + norm * 1e-4 * scene.radius)
        nb = jnp.broadcast_to(norm, o.shape)
        d = S.diffuse_importance_sample(nb, jnp.ones((n,)), u[:, 2], u[:, 3])
    return o, d


_STAGE1_DEPTH = 6    # wide-walk bounces before survivor compaction
                     # (r4: caustic stores complete by depth ~4 in every
                     # bundled scene; survivors that outlive the stage keep
                     # storing from the narrow buffers, and overflow past a
                     # narrow width triggers the exact discard-retry)


@partial(jax.jit, static_argnames=("cfg", "counts", "map_type", "cap",
                                   "narrow_div", "per_lane", "ocap_div"))
def emit_round(scene: Scene, cfg: RenderConfig, key, counts: tuple,
               map_type: int, cap: int, cone_axis=None, cone_cos=None,
               weight=None, narrow_div: int = 8, per_lane: bool = False,
               ocap_div: int = 16):
    """Trace one emission round.

    counts[i] photons from light i (static).  `cone_axis [L,3]`,
    `cone_cos [L]`, `weight [L]` come from _emission_cones: point-light
    caustic emission restricted to the specular bounding cone, with
    `weight` folding the per-light virtual-emission share into the
    initial photon power so the host's single global power normalization
    stays exact.  Returns (pos [cap,3], power [cap,3], dir_code [cap],
    n_wanted_stores, n_lost_lanes): n_wanted_stores can exceed cap and
    n_lost_lanes counts survivors dropped at the stage-2 compaction — the
    host discards the round and retries on either (exactness protocol).

    `per_lane=True` (MAP_CAUSTIC only) switches the store mechanism from
    per-bounce prefix-sum scatters to per-lane masked writes: each lane
    owns slot `orig` (its emission index) in full-width store arrays, so
    the full-width stage-1 bounces store with vectorized selects instead
    of 4M-lane scatters (profiled r4: the scatters dominated the walk at
    ~6.5 s/4M-round).  A caustic walk USUALLY stores once (it dies at its
    first diffuse store, photontracer.cpp:116-139) — but the reference
    re-arms after a spec/transmissive bounce off a MIXED kd+ks/kt
    material (photontracer.cpp:77-80), so a lane may store again; 2nd+
    stores go to a small prefix-sum overflow buffer of width
    max(1024, R // ocap_div) instead of overwriting the lane slot.
    Returns (components 7-tuple of [R] arrays (pos xyz, power rgb, dir
    code), flag [R] bool, count, overflow 7-tuple of [OCAP] arrays,
    ocount, lost): count = total physical stores = sum(flag) + ocount;
    ocount can exceed the overflow width — the caller discards and
    retries with a smaller ocap_div (exactness protocol).
    """
    if per_lane:
        assert map_type == MAP_CAUSTIC, \
            "per_lane store path requires single-store walks (caustic)"
    os_, ds_, ps_ = [], [], []
    for i, kind in enumerate(scene.lights.kind):
        n = counts[i]
        if n == 0:
            continue
        key, sub = jax.random.split(key)
        o, d = _emit_from_light(scene, i, kind, sub, n, cone_axis, cone_cos)
        # photon power = L1-normalized light color (photontracer.cpp:188-189)
        # scaled by the projection-map emission weight
        p0 = S.normalize_color(scene.lights.color[i])
        if weight is not None:
            p0 = p0 * weight[i]
        p = jnp.broadcast_to(p0, (n, 3))
        os_.append(o)
        ds_.append(d)
        ps_.append(p)
    o = jnp.concatenate(os_)
    d = jnp.concatenate(ds_)
    power = jnp.concatenate(ps_)
    R = o.shape[0]

    store0 = (map_type == MAP_GLOBAL) and not cfg.fast_global
    eps = 1e-4 * scene.radius

    # Store buffers are SEPARATE 1-D arrays per component: XLA lays a
    # [cap,3] scatter target out transposed-tiled ({0,1:T(4,128)}) and the
    # per-iteration scatter into it runs ~15x slower than the natural 1-D
    # T(1024) layout (profiled on v5e: 9.7 s vs 0.65 s over a 128-deep
    # 1M-lane walk).
    buf_w = R if per_lane else cap
    bufs = tuple(jnp.zeros((buf_w,)) for _ in range(6)) + (
        jnp.zeros((buf_w,), jnp.int32),)
    OCAP = max(1024, R // ocap_div)

    state = dict(
        key=key, o=o, d=d, power=power,
        alive=jnp.ones((R,), bool),
        store=jnp.full((R,), store0),
        bufs=bufs,
        count=jnp.asarray(0, jnp.int32),
        depth=jnp.asarray(0, jnp.int32),
    )
    if per_lane:
        state["flag"] = jnp.zeros((R,), bool)
        state["orig"] = jnp.arange(R, dtype=jnp.int32)
        state["has"] = jnp.zeros((R,), bool)
        state["obufs"] = tuple(jnp.zeros((OCAP,)) for _ in range(6)) + (
            jnp.zeros((OCAP,), jnp.int32),)
        state["ocount"] = jnp.asarray(0, jnp.int32)

    def cond(s):
        return (s["depth"] < cfg.max_photon_depth) & jnp.any(s["alive"])

    def body(s):
        B = s["o"].shape[0]
        key, k_rr, k_dir, k_spec = jax.random.split(s["key"], 4)
        hit = intersect_scene(scene, s["o"], s["d"], t_min=0.0)
        live = s["alive"] & hit.valid
        mats = scene.materials
        # column-wise 1-D gathers (S.take_rows): a [M,3] row gather at 4M
        # lanes costs 17 ms on v5e vs 0.11 ms column-wise — these five
        # lookups were ~80% of the walk's per-bounce cost (r4 profile)
        kd = S.take_rows(mats.kd, hit.mat)
        ks = S.take_rows(mats.ks, hit.mat)
        kt = S.take_rows(mats.kt, hit.mat)
        ir = S.take_scalar(mats.ir, hit.mat)
        shin = S.take_scalar(mats.shininess, hit.mat)
        is_d = jnp.any(kd > 0, axis=-1)
        is_transp = jnp.any(kt > 0, axis=-1)

        view = S.normalize(hit.point - s["o"])
        cos_theta = S.dot(hit.normal, -view)

        # ---- store at diffuse hits (StorePhoton, photon_utils.cpp:40-65):
        # incident direction = direction of travel (`view`)
        want = live & is_d & s["store"]
        cols = (hit.point[:, 0], hit.point[:, 1], hit.point[:, 2],
                s["power"][:, 0], s["power"][:, 1], s["power"][:, 2],
                S.encode_direction(view).astype(jnp.int32))
        extra = {}
        if per_lane:
            # A lane's FIRST store lives at its own emission slot.  Full-
            # width stages write with vectorized selects (no scatter);
            # compacted stages scatter by the (unique) original lane index
            # — at 1/8th width or less, that scatter is cheap.  2nd+
            # stores (mixed kd+ks/kt materials re-arm after a spec/trans
            # bounce) go to the prefix-sum overflow buffer so the earlier
            # photon is never overwritten.
            want_first = want & ~s["has"]
            want_over = want & s["has"]
            if B == R:
                bufs = tuple(jnp.where(want_first, c, b)
                             for b, c in zip(s["bufs"], cols))
                flag = s["flag"] | want_first
            else:
                oidx = jnp.where(want_first, s["orig"], R)  # R -> dropped
                bufs = tuple(b.at[oidx].set(c, mode="drop")
                             for b, c in zip(s["bufs"], cols))
                flag = s["flag"].at[oidx].set(True, mode="drop")
            # The overflow scatter is full-width (R index rows into OCAP)
            # — ~7 R-sized scatters per bounce if run unconditionally,
            # which measured 2.3x on the whole trace.  Almost every bounce
            # has ZERO overflow stores (a re-armed lane needs a mixed
            # kd+ks/kt material), so gate the scatter behind a cond.
            def do_overflow(args):
                obufs_, ocount_ = args
                ooff = jnp.cumsum(want_over.astype(jnp.int32)) - 1
                oslot = jnp.where(want_over, ocount_ + ooff, OCAP)
                return (tuple(b.at[oslot].set(c, mode="drop")
                              for b, c in zip(obufs_, cols)),
                        ocount_ + jnp.sum(want_over, dtype=jnp.int32))

            obufs, ocount = jax.lax.cond(
                jnp.any(want_over), do_overflow, lambda a: a,
                (s["obufs"], s["ocount"]))
            extra = dict(
                flag=flag, orig=s["orig"], has=s["has"] | want,
                obufs=obufs, ocount=ocount)
        else:
            offset = jnp.cumsum(want.astype(jnp.int32)) - 1
            slot = jnp.where(want, s["count"] + offset, cap)  # cap: dropped
            bufs = tuple(b.at[slot].set(c, mode="drop")
                         for b, c in zip(s["bufs"], cols))
        count = s["count"] + jnp.sum(want, dtype=jnp.int32)

        # ---- Russian roulette with photon-colored probabilities
        # (photontracer.cpp:87-95: prob ~ max(brdf*photon)/max(photon))
        r_coeff = jnp.zeros((B,))
        if cfg.fresnel:
            r_coeff = jnp.where(
                is_transp,
                S.compute_reflection_coeff(cos_theta, ir, cfg.ir_air), 0.0)
        maxch = jnp.maximum(S.max_channel(s["power"]), 1e-12)
        prob_d = S.max_channel(kd * s["power"]) / maxch
        prob_t0 = S.max_channel(kt * s["power"]) / maxch
        prob_s = S.max_channel(ks * s["power"]) / maxch + r_coeff * prob_t0
        prob_t = prob_t0 * (1.0 - r_coeff)
        prob_total = prob_d + prob_t + prob_s + cfg.prob_absorb

        u_rr = jax.random.uniform(k_rr, (B,))
        rand = jnp.where(prob_total > 1.0, u_rr * prob_total, u_rr)
        take_d = rand < prob_d
        take_t = (~take_d) & (rand < prob_d + prob_t)
        take_s = (~take_d) & (~take_t) & (rand < prob_d + prob_t + prob_s)

        # diffuse bounce (terminates caustic traces)
        u_dir = jax.random.uniform(k_dir, (B, 2))
        cosine_dir = S.diffuse_importance_sample(hit.normal, cos_theta,
                                                 u_dir[:, 0], u_dir[:, 1])
        die = jnp.zeros((B,), bool)
        new_d = s["d"]
        new_pow = s["power"]
        new_store = s["store"]
        safe_pd = jnp.maximum(prob_d, 1e-12)
        safe_pt = jnp.maximum(prob_t, 1e-12)
        safe_ps = jnp.maximum(prob_s, 1e-12)

        d_act = take_d & live
        if map_type == MAP_CAUSTIC:
            die = die | d_act
        else:
            new_store = new_store | d_act  # FAST_GLOBAL arms after diffuse
            new_d = jnp.where(d_act[:, None], cosine_dir, new_d)
            new_pow = jnp.where(d_act[:, None],
                                new_pow * kd / safe_pd[:, None], new_pow)

        # transmissive bounce
        t_act = take_t & live
        exact_t = S.transmissive_bounce(hit.normal, view, cos_theta, ir,
                                        cfg.ir_air)
        if cfg.distrib_transmissive:
            u_s = jax.random.uniform(k_spec, (B, 2))
            smp_t = S.specular_importance_sample(exact_t, shin, cos_theta,
                                                 u_s[:, 0], u_s[:, 1])
        else:
            smp_t = exact_t
        new_d = jnp.where(t_act[:, None], smp_t, new_d)
        new_pow = jnp.where(
            t_act[:, None],
            new_pow * (1.0 - r_coeff[:, None]) * kt / safe_pt[:, None],
            new_pow)

        # specular bounce
        s_act = take_s & live
        exact_s = S.reflective_bounce(hit.normal, view, cos_theta)
        if cfg.distrib_specular:
            key, k2 = jax.random.split(key)
            u_s2 = jax.random.uniform(k2, (B, 2))
            smp_s = S.specular_importance_sample(exact_s, shin, cos_theta,
                                                 u_s2[:, 0], u_s2[:, 1])
        else:
            smp_s = exact_s
        new_d = jnp.where(s_act[:, None], smp_s, new_d)
        new_pow = jnp.where(
            s_act[:, None],
            new_pow * (ks + r_coeff[:, None] * kt) / safe_ps[:, None],
            new_pow)

        if map_type == MAP_CAUSTIC:
            new_store = new_store | t_act | s_act

        absorbed = live & ~take_d & ~take_t & ~take_s
        alive = live & ~die & ~absorbed
        new_o = jnp.where(alive[:, None], hit.point + new_d * eps, s["o"])
        return dict(key=key, o=new_o, d=new_d, power=new_pow, alive=alive,
                    store=new_store, bufs=bufs, count=count,
                    depth=s["depth"] + 1, **extra)

    # Staged walk with survivor compaction: nearly every walk ends within
    # a few bounces (a caustic photon stores at its first diffuse hit),
    # but a handful of lanes — total-internal-reflection loops in glass —
    # survive toward max_photon_depth, and a while_loop pays FULL width
    # for every iteration any lane is alive (measured on v5e: stores
    # converge by depth ~16, yet depth 128 cost 8x depth 16).  So the walk
    # runs in stages: _STAGE1_DEPTH bounces at full width, then the
    # survivors are compacted (masked prefix gather — the same trick as
    # the store buffers) into an R/narrow_div buffer for the next
    # _STAGE1_DEPTH bounces, then compacted again into R/(8*narrow_div)
    # for the rest.  Exact: survivors that overflow a narrow buffer are
    # counted in `lost` and the host discards + retries the round with a
    # wider tail (same protocol as the store-cap overflow).
    def compact(st, NW):
        alive = st["alive"]
        n_alive = jnp.sum(alive, dtype=jnp.int32)
        lost = jnp.maximum(n_alive - NW, 0)
        w = alive.shape[0]
        idx = jnp.nonzero(alive, size=NW, fill_value=w)[0]
        lane_ok = idx < w
        cidx = jnp.clip(idx, 0, w - 1)
        st2 = dict(key=st["key"], o=S.take_rows(st["o"], cidx),
                   d=S.take_rows(st["d"], cidx),
                   power=S.take_rows(st["power"], cidx),
                   alive=st["alive"][cidx] & lane_ok,
                   store=st["store"][cidx], bufs=st["bufs"],
                   count=st["count"], depth=st["depth"])
        if per_lane:
            st2["flag"] = st["flag"]          # full-width, NOT compacted
            st2["orig"] = st["orig"][cidx]
            st2["has"] = st["has"][cidx]
            st2["obufs"] = st["obufs"]        # global, NOT compacted
            st2["ocount"] = st["ocount"]
        return st2, lost

    def staged_cond(limit):
        def c(s):
            return (s["depth"] < limit) & jnp.any(s["alive"])
        return c

    d1 = min(cfg.max_photon_depth, _STAGE1_DEPTH)
    st = jax.lax.while_loop(staged_cond(d1), body, state)
    lost = jnp.asarray(0, jnp.int32)

    if cfg.max_photon_depth > d1:
        d2 = min(cfg.max_photon_depth, 2 * _STAGE1_DEPTH)
        st, l1 = compact(st, max(1024, R // narrow_div))
        st = jax.lax.while_loop(staged_cond(d2), body, st)
        lost = lost + l1
        if cfg.max_photon_depth > d2:
            st, l2 = compact(st, max(1024, R // (8 * narrow_div)))
            st = jax.lax.while_loop(cond, body, st)
            lost = lost + l2

    fb = st["bufs"]
    if per_lane:
        # keep the 1-D component arrays: the caller's on-device append
        # scatters them straight into 1-D accumulators (same layout lesson
        # as the store buffers above)
        return (fb, st["flag"], st["count"], st["obufs"], st["ocount"],
                lost)
    return (jnp.stack(fb[0:3], axis=-1), jnp.stack(fb[3:6], axis=-1),
            fb[6], st["count"], lost)


def _scene_bbox(scene: Scene):
    pts = []
    if scene.tris.v0.shape[0]:
        v0 = np.asarray(scene.tris.v0)
        pts += [v0, v0 + np.asarray(scene.tris.e1), v0 + np.asarray(scene.tris.e2)]
    if scene.spheres.center.shape[0]:
        c = np.asarray(scene.spheres.center)
        r = np.asarray(scene.spheres.radius)[:, None]
        pts += [c - r, c + r]
    if scene.boxes.lo.shape[0]:
        pts += [np.asarray(scene.boxes.lo), np.asarray(scene.boxes.hi)]
    for prim in (scene.cylinders, scene.cones):
        if prim.p0.shape[0]:
            r = np.asarray(prim.radius)[:, None]
            pts += [np.asarray(prim.p0) - r, np.asarray(prim.p0) + r,
                    np.asarray(prim.p1) - r, np.asarray(prim.p1) + r]
    if scene.circles.center.shape[0]:
        c = np.asarray(scene.circles.center)
        r = np.asarray(scene.circles.radius)[:, None]
        pts += [c - r, c + r]
    if not pts:
        return np.zeros(3), np.ones(3)
    allp = np.concatenate(pts)
    return allp.min(axis=0), allp.max(axis=0)


# Initial round-buffer capacity as a multiple of the emitted count per
# round; module-level so tests can shrink it to exercise the overflow-retry.
_CAP_FACTOR = {MAP_GLOBAL: 4, MAP_CAUSTIC: 2}

# Device->host prefix fetches are quantized to this many rows so the number
# of distinct dynamic_slice programs stays bounded (compile-cache friendly).
_FETCH_CHUNK = 65536


def _grow(buf, keep, shape, dtype):
    """(Re)allocate a host accumulation buffer, preserving the first `keep`
    rows of the old one."""
    new = np.empty(shape, dtype)
    if buf is not None and keep:
        new[:keep] = buf[:keep]
    return new


@partial(jax.jit, donate_argnums=(0,))
def _append_round(acc: tuple, stores: tuple, flag, stored):
    """Scatter one per-lane round's flagged stores into the on-device
    accumulator arrays at offset `stored` (donated in place).  One R-wide
    scatter per component per ROUND — vs. one per component per BOUNCE in
    the host-buffer path — and no device->host payload copy at all (the
    axon tunnel moves ~19 MB/s; a 4M-store round is ~86 MB)."""
    offset = jnp.cumsum(flag.astype(jnp.int32)) - 1
    oob = acc[0].shape[0]
    idx = jnp.where(flag, stored + offset, oob)
    return tuple(a.at[idx].set(v, mode="drop")
                 for a, v in zip(acc, stores))


@partial(jax.jit, donate_argnums=(0,))
def _append_overflow(acc: tuple, obufs: tuple, ocount, stored):
    """Append the first `ocount` (already-contiguous) rows of the per-round
    overflow buffers into the accumulators at offset `stored`."""
    flag = jnp.arange(obufs[0].shape[0], dtype=jnp.int32) < ocount
    return _append_round(acc, obufs, flag, stored)


def _fetch_prefix(arrays, lo, n, cap):
    """Copy rows [lo, lo+n) of each device array to host, transferring only
    a chunk-rounded prefix instead of the full `cap` buffer."""
    n_pad = min(cap, -(-n // _FETCH_CHUNK) * _FETCH_CHUNK)
    out = []
    for a in arrays:
        sl = jax.lax.dynamic_slice_in_dim(a, lo, n_pad, axis=0)
        out.append(np.asarray(sl)[:n])
    return out


def trace_photon_map(scene: Scene, cfg: RenderConfig, key, map_type: int,
                     verbose: bool = False, mesh=None):
    """Host-side emission-cycle loop (photonmap.cpp:163-198): emit rounds
    until the storage goal is met, then normalize powers and build the grid.

    With `mesh`, every round is traced on all mesh devices at once
    (parallel/photon.py, SURVEY.md §2.3 P2/P3): per-device buffers are
    compacted on host and the summed counts drive the quota loop.

    Returns (PhotonGrid | None, stats dict).
    """
    goal = (cfg.global_photon_count if map_type == MAP_GLOBAL
            else cfg.caustic_photon_count)

    # light power distribution
    powers = [light_power(scene, i) for i in range(scene.n_lights)]
    total_power = sum(powers)
    if total_power <= 0 or scene.n_lights == 0:
        return None, {}

    # Round sizes come from a small discrete ladder (static shapes -> one
    # compile per size).  The reference's feedback loop adapts its emit goal
    # by the measured store rate (photonmap.cpp:163-198); we do the same but
    # quantized: low-efficiency maps (caustics reject most paths) escalate
    # to bigger rounds instead of paying thousands of tiny host launches.
    # The 1M/4M rungs carry the reference's 10M-100M-photon headline scale
    # (README.md:357) in tens of host launches — TPU only: a 4M-lane walk
    # is a non-starter on the CPU fallback (and in CPU-mesh tests).
    from ..ops.intersect import _default_platform
    if mesh is not None:
        plat = mesh.devices.flat[0].platform
    else:
        plat = _default_platform()
    _SIZES = (4096, 16384, 65536, 262144, 1048576, 4194304)
    if plat != "tpu":
        _SIZES = _SIZES[:4]

    # Caustic projection-map emission: per-light bounding cone of the
    # specular geometry + coverage fraction (exact — see _emission_cones).
    cone_axis_np, cone_cos_np, cover = _emission_cones(scene, map_type)
    cone_axis = jnp.asarray(cone_axis_np)
    cone_cos = jnp.asarray(cone_cos_np)

    def _setup(round_size, cap_factor):
        counts = [int(round(round_size * p / total_power)) for p in powers]
        counts = [max(1, c) if p > 0 else 0
                  for c, p in zip(counts, powers)]
        counts = tuple(counts)
        # virtual (full-sphere-equivalent) emissions per round, per light:
        # each cone-restricted photon stands for 1/coverage emissions
        e_l = [n / f for n, f in zip(counts, cover)]
        e_tot = float(sum(e_l))
        # fold each light's virtual-emission share into its photons'
        # initial power so one global photon_power = total/emitted works:
        # final per-photon power must be power_l * coverage_l / counts_l
        w = [(p / total_power) * (e_tot / e) if n > 0 else 0.0
             for p, n, e in zip(powers, counts, e_l)]
        return (counts, sum(counts), max(1, int(cap_factor * sum(counts))),
                e_tot, jnp.asarray(w, jnp.float32))

    # A caustic walk dies at its first diffuse store (photontracer.cpp:116-
    # 139) so stores/emitted rarely exceeds 1; global walks store at every
    # diffuse bounce.  Undersized caps are corrected by the overflow-retry
    # below, so these start tight to keep the round buffers small.
    cap_factor = _CAP_FACTOR[map_type]
    size_i = 0
    want = max(4096, goal // 4)
    while size_i < len(_SIZES) - 1 and _SIZES[size_i] < want:
        size_i += 1
    counts, R, cap, e_round, weight = _setup(_SIZES[size_i], cap_factor)

    n_dev = int(mesh.devices.size) if mesh is not None else 1

    # Streamed host accumulation: one preallocated buffer sized for the goal
    # plus one round of overshoot — no per-round list growth, so a 50M+ map
    # costs goal*22 B of host RAM and one device->host copy of exactly the
    # stored prefix per round (chunk-quantized, see _fetch_prefix).
    buf_cap = 0
    h_pos = h_pow = h_dir = None
    stored = 0
    emitted = 0.0       # virtual (full-sphere-equivalent) emissions
    emitted_real = 0    # photons actually traced (drives rung escalation)
    attempts = 40
    overflow_rounds = 0
    narrow_div = 8
    ocap_div = 16
    # Single-device caustic maps stay entirely ON DEVICE: per-lane store
    # arrays are scattered once per round into preallocated accumulators
    # (donated in place) and only the scalar counts cross to the host.
    # This removes both per-bounce store scatters (emit_round per_lane)
    # and the per-round device->host payload fetch (~19 MB/s through the
    # axon tunnel — 4.5 s for one 4M-store round, profiled r4).
    use_dev_acc = (mesh is None and map_type == MAP_CAUSTIC)
    acc = None

    t0 = time.time()
    while stored < goal and attempts > 0:
        if use_dev_acc:
            key, sub = jax.random.split(key)
            stores, flag, cnt, obufs, ocnt, lost = emit_round(
                scene, cfg, sub, counts, map_type, R, cone_axis, cone_cos,
                weight, narrow_div=narrow_div, per_lane=True,
                ocap_div=ocap_div)
            n_lost = int(lost)
            n_over = int(ocnt)
            ocap = max(1024, R // ocap_div)
            if n_lost > 0 or n_over > ocap:
                # walk survivors past the stage-2 compaction width, or 2nd+
                # stores past the overflow width, would silently lose flux:
                # discard the round, widen the losing buffer
                overflow_rounds += 1
                if overflow_rounds > 6:
                    raise RuntimeError(
                        f"photon walk loses lanes (lost {n_lost}, "
                        f"overflow {n_over}/{ocap}) even after "
                        f"{overflow_rounds - 1} retries")
                if n_lost > 0:
                    narrow_div = max(1, narrow_div // 2)
                if n_over > ocap:
                    ocap_div = max(1, ocap_div // 4)
                continue
            emitted += e_round
            emitted_real += R
            n_round = int(cnt)          # total stores = sum(flag) + n_over
            if n_round > 0:
                if acc is None:
                    acc_cap = goal + _SIZES[-1] + 8 * max(1, len(powers))
                    acc = tuple(jnp.zeros((acc_cap,)) for _ in range(6)) + (
                        jnp.zeros((acc_cap,), jnp.int32),)
                acc = _append_round(acc, stores, flag,
                                    jnp.asarray(stored, jnp.int32))
                stored += n_round - n_over
                if n_over > 0:
                    acc = _append_overflow(acc, obufs, ocnt,
                                           jnp.asarray(stored, jnp.int32))
                    stored += n_over
            else:
                attempts -= 1
            if 0 < n_round and stored < goal and size_i < len(_SIZES) - 1:
                eff = stored / max(emitted_real, 1)
                need_emit = (goal - stored) / max(eff, 1e-9)
                while (size_i < len(_SIZES) - 1
                       and _SIZES[size_i] < need_emit / 2):
                    size_i += 1
                counts, R, cap, e_round, weight = _setup(_SIZES[size_i],
                                                         cap_factor)
            continue
        if h_pos is None or buf_cap < goal + cap * n_dev:
            buf_cap = goal + cap * n_dev
            h_pos = _grow(h_pos, stored, (buf_cap, 3), np.float32)
            h_pow = _grow(h_pow, stored, (buf_cap, 3), np.float32)
            h_dir = _grow(h_dir, stored, (buf_cap,), np.int32)
        key, sub = jax.random.split(key)
        if mesh is None:
            bp, bw, bd, cnt, lost = emit_round(scene, cfg, sub, counts,
                                               map_type, cap, cone_axis,
                                               cone_cos, weight,
                                               narrow_div=narrow_div)
            per_dev = [int(cnt)]
            n_lost = int(lost)
        else:
            from ..parallel.photon import emit_round_sharded
            bp, bw, bd, cnts, losts = emit_round_sharded(
                scene, cfg, sub, counts, map_type, cap, mesh,
                cone_axis, cone_cos, weight, narrow_div=narrow_div)
            per_dev = [int(c) for c in np.asarray(cnts)]
            n_lost = int(np.sum(np.asarray(losts)))
        if any(n > cap for n in per_dev) or n_lost > 0:
            # Buffer overflow (stores past `cap`, or walk survivors past
            # the stage-2 compaction width): either would silently lose
            # flux and dim-bias photon_power = total_power/emitted.
            # Discard the WHOLE round (its emissions count for nothing)
            # and retry with a doubled cap / widened tail — exact, and
            # rare enough that the extra compile does not matter.
            overflow_rounds += 1
            if overflow_rounds > 6:
                raise RuntimeError(
                    f"photon round overflows (cap {cap}, lost {n_lost}) "
                    f"even after {overflow_rounds - 1} retries")
            if n_lost > 0:
                narrow_div = max(1, narrow_div // 2)
            else:
                cap_factor *= 2
            counts, R, cap, e_round, weight = _setup(_SIZES[size_i],
                                                     cap_factor)
            continue
        emitted += e_round * n_dev
        emitted_real += R * n_dev
        round_stored = 0
        if mesh is None:
            n = per_dev[0]
            if n > 0:
                p_, w_, d_ = _fetch_prefix((bp, bw, bd), 0, n, cap)
                h_pos[stored:stored + n] = p_
                h_pow[stored:stored + n] = w_
                h_dir[stored:stored + n] = d_
                round_stored = n
        else:
            bp_h, bw_h, bd_h = np.asarray(bp), np.asarray(bw), np.asarray(bd)
            for i, n in enumerate(per_dev):
                if n > 0:
                    lo_i = i * cap
                    dst = stored + round_stored
                    h_pos[dst:dst + n] = bp_h[lo_i:lo_i + n]
                    h_pow[dst:dst + n] = bw_h[lo_i:lo_i + n]
                    h_dir[dst:dst + n] = bd_h[lo_i:lo_i + n]
                    round_stored += n
        stored += round_stored
        if round_stored == 0:
            attempts -= 1
        elif stored < goal and size_i < len(_SIZES) - 1:
            # escalate the round size to what the measured efficiency says
            # the remaining quota needs (in one or a few rounds)
            eff = stored / max(emitted_real, 1)
            need_emit = (goal - stored) / max(eff, 1e-9) / n_dev
            while (size_i < len(_SIZES) - 1
                   and _SIZES[size_i] < need_emit / 2):
                size_i += 1
            counts, R, cap, e_round, weight = _setup(_SIZES[size_i],
                                                     cap_factor)
    elapsed = time.time() - t0

    stats = dict(stored=stored, emitted=emitted,
                 emitted_real=emitted_real, seconds=elapsed,
                 photons_per_s=stored / max(elapsed, 1e-9),
                 overflow_rounds=overflow_rounds)
    if stored < goal:
        stats["warning"] = (f"photon map {map_type}: stored {stored} < goal "
                            f"{goal} after exhausting emission attempts")
        import sys
        print(f"gi_tpu: warning: {stats['warning']}", file=sys.stderr)
    if stored == 0:
        return None, stats

    # Quantized round sizes overshoot small goals by up to a whole round
    # (a 2176-photon global map came out 16384 photons — 7.5x the
    # configured width, and every radiance estimate streamed the excess).
    # Keep exactly `goal` photons — the reference's per-thread quota stop
    # (photonmap.cpp:163-198) — chosen by a SYSTEMATIC STRIDE over the
    # store order (a plain prefix over-samples the first light/cone:
    # lane order is structured by emission target) and renormalized
    # per-channel so total stored flux is preserved EXACTLY.  The kept
    # width is deterministic, so grid/gather executables cache across
    # runs.
    keep = min(stored, goal)
    stats["kept"] = keep

    # power normalization (photonmap.cpp:341-357)
    photon_power = total_power / emitted
    if use_dev_acc:
        # gather the systematic sample at the 1x/1.5x power-of-two bucket
        # of the kept count (build_grid's compile-cache bucketing; the
        # pure power-of-two bucket padded a 50M map to 67M rows — a third
        # more HBM through the grid build for nothing), tail invalid —
        # no host round-trip of the photon payload at all
        p2 = 1 << int(np.ceil(np.log2(max(keep, 1))))
        n_bucket = max(1024, 3 * p2 // 4 if keep <= 3 * p2 // 4 else p2)
        n_bucket = min(n_bucket, acc[0].shape[0])
        if keep < stored:
            sel = jnp.minimum(
                (jnp.arange(n_bucket, dtype=jnp.int64) * stored) // keep,
                stored - 1).astype(jnp.int32)
            # rows past `stored` were never written (zeros), so the
            # full-buffer sum IS the population flux — shape-stable
            w_all = jnp.stack([jnp.sum(a) for a in acc[3:6]])
            kept_w = [a[sel] for a in acc[3:6]]
            vmask = jnp.arange(n_bucket) < keep
            w_keep = jnp.stack(
                [jnp.sum(jnp.where(vmask, w, 0.0)) for w in kept_w])
            scale = jnp.where(w_keep > 0, w_all / w_keep, 1.0)
            pos = jnp.stack([a[sel] for a in acc[0:3]], axis=-1)
            power = jnp.stack(kept_w, axis=-1) * (photon_power * scale)
            dircode = acc[6][sel]
        else:
            pos = jnp.stack([a[:n_bucket] for a in acc[0:3]], axis=-1)
            power = jnp.stack([a[:n_bucket] for a in acc[3:6]],
                              axis=-1) * photon_power
            dircode = acc[6][:n_bucket]
        valid = jnp.arange(n_bucket) < keep
        jax.block_until_ready(pos)
        acc = None  # free the accumulators before the grid build peak
    else:
        if keep < stored:
            sel = (np.arange(keep, dtype=np.int64) * stored) // keep
            pos_h, pow_h, dir_h = h_pos[sel], h_pow[sel], h_dir[sel]
            w_all = h_pow[:stored].sum(axis=0)
            w_keep = pow_h.sum(axis=0)
            scale = np.where(w_keep > 0, w_all / w_keep, 1.0)
        else:
            pos_h, pow_h, dir_h = (h_pos[:keep], h_pow[:keep],
                                   h_dir[:keep])
            scale = np.ones(3, np.float32)
        pos = jnp.asarray(pos_h)
        dircode = jnp.asarray(dir_h)
        power = jnp.asarray(pow_h * (np.float32(photon_power)
                                     * scale.astype(np.float32)))
        valid = jnp.ones((pos.shape[0],), bool)

    est_dist = (cfg.global_estimate_dist if map_type == MAP_GLOBAL
                else cfg.caustic_estimate_dist)
    est_size = (cfg.global_estimate_size if map_type == MAP_GLOBAL
                else cfg.caustic_estimate_size)
    lo, hi = _scene_bbox(scene)
    cell_cap = max(64, 2 * est_size)
    t0 = time.time()
    grid = build_grid(pos, power, dircode, valid,
                      lo, hi, est_dist, cell_cap)
    jax.block_until_ready(grid.cell_start)
    stats["build_s"] = time.time() - t0

    if verbose:
        print(f"  map {map_type}: stored={stored} emitted={emitted} "
              f"({stats['photons_per_s']:.0f} photons/s)")
    return grid, stats


def build_photon_maps(scene: Scene, cfg: RenderConfig, key,
                      verbose: bool = False, mesh=None):
    """MapPhotons equivalent (photonmap.cpp:260-436).

    Returns (PhotonMaps | None, adjusted_cfg): layers whose maps came out
    empty are disabled in the returned config, mirroring the reference's
    fallbacks (photonmap.cpp:347-361).  Pass a `jax.sharding.Mesh` to trace
    each emission round on every device at once (SURVEY.md §2.3 P2/P3).
    """
    need_global = cfg.indirect_illum or cfg.direct_photon_illum
    need_caustic = cfg.caustic_illum
    if not (need_global or need_caustic):
        return None, cfg

    k1, k2 = jax.random.split(key)
    global_grid = None
    caustic_grid = None
    stats = {}
    if need_global:
        global_grid, s = trace_photon_map(scene, cfg, k1, MAP_GLOBAL, verbose,
                                          mesh=mesh)
        stats["global"] = s
        if global_grid is None:
            cfg = cfg.replace(indirect_illum=False,
                              direct_photon_illum=False)
    if need_caustic:
        caustic_grid, s = trace_photon_map(scene, cfg, k2, MAP_CAUSTIC,
                                           verbose, mesh=mesh)
        stats["caustic"] = s
        if caustic_grid is None:
            cfg = cfg.replace(caustic_illum=False)

    # Irradiance cache: replace each global photon's power with
    # flux + disk irradiance estimate at its position (photonmap.cpp:381-413)
    if cfg.irradiance_cache and global_grid is not None:
        own = global_grid.power.astype(jnp.float32)
        n_stored = int(global_grid.pos.shape[0])
        use_ring = (mesh is not None and int(mesh.devices.size) > 1
                    and (cfg.shard_maps
                         or n_stored > cfg.shard_maps_threshold))
        if use_ring:
            # One query per stored photon — the heaviest flat gather batch
            # in the pipeline.  Keep the photon set sharded and answer the
            # queries by ring-exchanging the shards (SURVEY §2.3 P8).  The
            # ring merge is all-pairs O(N^2/D), so it only wins over the
            # local grid path once the map outgrows per-device replication
            # (cfg.shard_maps_threshold) or sharding is forced.
            from ..parallel.gather import (estimate_irradiance_ring,
                                           shard_photons)
            d = int(mesh.devices.size)
            n = global_grid.pos.shape[0]
            sharded = shard_photons(global_grid.pos, own,
                                    global_grid.dir_code,
                                    global_grid.valid, mesh)
            qpad = -(-n // d) * d
            q = jnp.pad(global_grid.pos, ((0, qpad - n), (0, 0)))
            est = estimate_irradiance_ring(
                sharded, q, cfg.global_estimate_size,
                cfg.global_estimate_dist, mesh)[:n]
        else:
            est = estimate_irradiance(global_grid, global_grid.pos,
                                      cfg.global_estimate_size,
                                      cfg.global_estimate_dist)
        global_grid = global_grid.replace(
            power=(own + est).astype(jnp.bfloat16))

    maps = PhotonMaps(global_=global_grid, caustic=caustic_grid)
    return maps, cfg
