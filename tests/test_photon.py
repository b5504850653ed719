"""Photon map tests: grid gather vs brute-force kNN oracle, direction/RGBE
codecs, sampler distributions, and emission round sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gi_tpu.ops import sampling as S
from gi_tpu.photon import gather
from gi_tpu.utils.config import RenderConfig


def _random_photons(n, rng, lo=-1.0, hi=1.0):
    pos = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    power = rng.uniform(0.0, 2.0, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    code = np.asarray(S.encode_direction(jnp.asarray(dirs))).astype(np.int32)
    return pos, power, code


def _oracle_estimate(pos, power, code, query, normal, exact, ct, kd, ks,
                     shin, K, dist, filt, cfg):
    """Brute-force EstimateRadiance (photon_utils.cpp:72-162) in numpy."""
    d2 = np.sum((pos - query) ** 2, axis=1)
    order = np.argsort(d2)
    sel = [i for i in order if d2[i] <= dist * dist][:K]
    if not sel:
        return np.zeros(3)
    if len(sel) < K:
        maxd2 = dist * dist
    else:
        maxd2 = max(max(d2[i] for i in sel), 1e-6)
    est = np.zeros(3)
    total_w = 0.0
    c1 = np.exp(-cfg.filter_const_b)
    c2 = 1.0 / (2.0 * maxd2)
    for i in sel:
        inc = np.asarray(S.decode_direction(jnp.asarray([code[i]])))[0]
        perp = float(np.dot(normal, inc))
        if (ct < 0 and perp < 0) or (ct > 0 and perp > 0):
            continue
        cos_a = max(0.0, float(np.dot(exact, -inc)))
        f = power[i] * (abs(perp) * kd + cos_a ** shin * ks)
        if filt == 1:
            f = f * (1.0 - np.sqrt(d2[i]) / (cfg.filter_const_k
                                             * np.sqrt(maxd2)))
        elif filt == 2:
            w = 1.0 - (1.0 - c1 ** (c2 * d2[i])) / (1.0 - c1)
            f = f * w
            total_w += w
        est = est + f
    if filt == 0:
        est = est / (np.pi * maxd2)
    elif filt == 1:
        est = est / ((1.0 - 2.0 / (3.0 * cfg.filter_const_k))
                     * np.pi * maxd2)
    elif filt == 2:
        if total_w > 0:
            est = est * (cfg.filter_const_a * len(sel) / total_w
                         / (np.pi * maxd2))
        else:
            est = np.zeros(3)
    return est


@pytest.mark.parametrize("filt", [0, 1, 2])
def test_estimate_radiance_vs_oracle(filt):
    rng = np.random.default_rng(42)
    n = 500
    pos, power, code = _random_photons(n, rng)
    cfg = RenderConfig(filter_const_k=1.1)
    K, dist = 24, 0.4
    grid = gather.build_grid(
        jnp.asarray(pos), jnp.asarray(power), jnp.asarray(code),
        jnp.ones((n,), bool), np.array([-1.0] * 3), np.array([1.0] * 3),
        dist, cell_cap=n)  # cap >= n: no decimation in this test

    B = 16
    q = rng.uniform(-0.8, 0.8, (B, 3)).astype(np.float32)
    normal = np.tile(np.array([0, 0, 1.0], np.float32), (B, 1))
    exact = np.tile(np.array([0, 0, 1.0], np.float32), (B, 1))
    ct = np.ones(B, np.float32)
    kd = np.full((B, 3), 0.6, np.float32)
    ks = np.full((B, 3), 0.3, np.float32)
    shin = np.full(B, 8.0, np.float32)

    got = np.asarray(gather.estimate_radiance(
        grid, jnp.asarray(q), jnp.asarray(normal), jnp.asarray(exact),
        jnp.asarray(ct), jnp.asarray(kd), jnp.asarray(ks), jnp.asarray(shin),
        K, dist, filt, cfg))

    for b in range(B):
        want = _oracle_estimate(pos, power, code, q[b], normal[b], exact[b],
                                ct[b], kd[b], ks[b], shin[b], K, dist, filt,
                                cfg)
        np.testing.assert_allclose(got[b], want, rtol=0.03, atol=5e-3)


def test_direction_codec_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(1000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    code = S.encode_direction(jnp.asarray(v))
    back = np.asarray(S.decode_direction(code))
    dots = np.sum(v * back, axis=1)
    # 8-bit phi/theta quantization: worst-case ~1.4 degrees
    assert np.arccos(np.clip(dots, -1, 1)).max() < np.deg2rad(2.0)


def test_rgbe_roundtrip():
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 10, (500, 3)).astype(np.float32)
    back = np.asarray(S.rgbe_to_rgb(S.rgb_to_rgbe(jnp.asarray(rgb))))
    # RGBE quantizes at ~1/256 of the max channel (same as the reference's
    # unsigned-char truncation, graphics_utils.cpp:56-59)
    atol = rgb.max(axis=1, keepdims=True) / 128.0
    assert (np.abs(back - rgb) <= atol).all()
    # black maps to exact zero
    z = np.asarray(S.rgbe_to_rgb(S.rgb_to_rgbe(jnp.zeros((1, 3)))))
    assert (z == 0).all()


def test_cosine_sampler_distribution():
    key = jax.random.PRNGKey(0)
    n = 20000
    u = jax.random.uniform(key, (n, 2))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    d = np.asarray(S.diffuse_importance_sample(nrm, jnp.ones((n,)),
                                               u[:, 0], u[:, 1]))
    # all in upper hemisphere; E[cos theta] = 2/3 for cosine-weighted
    assert (d[:, 2] > -1e-6).all()
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_uniform_sphere_distribution():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (20000, 2))
    d = np.asarray(S.uniform_sphere_dir(u[:, 0], u[:, 1]))
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.02


def test_caustic_emission_round(cornell_scene):
    """Cornell: caustic photons (LS+D paths through the glass sphere) land
    mostly on the floor under/near the sphere."""
    from gi_tpu.photon.trace import MAP_CAUSTIC, emit_round
    cfg = RenderConfig(max_photon_depth=24)
    key = jax.random.PRNGKey(0)
    counts = (8192,)
    pos, power, code, cnt, _ = emit_round(cornell_scene, cfg, key, counts,
                                       MAP_CAUSTIC, 4 * 8192)
    n = int(cnt)
    assert n > 50, "caustic paths through the glass sphere must store"
    p = np.asarray(pos[:n])
    assert np.isfinite(p).all()
    # photons stored on scene surfaces (inside the box bounds)
    assert p[:, 1].min() > -1e-3 and p[:, 1].max() < 1.2


def test_per_lane_store_path_matches_scatter_path(cornell_scene):
    """The per-lane caustic store path (round-4: masked where-writes +
    one end-of-round scatter, replacing per-bounce prefix-sum scatters)
    must record the exact same multiset of photons as the scatter path
    for the same key."""
    from gi_tpu.photon.trace import MAP_CAUSTIC, emit_round
    cfg = RenderConfig(max_photon_depth=24)
    key = jax.random.PRNGKey(3)
    counts = (8192,)
    pos, power, code, cnt, lost = emit_round(
        cornell_scene, cfg, key, counts, MAP_CAUSTIC, 4 * 8192)
    stores, flag, cnt2, obufs, ocnt, lost2 = emit_round(
        cornell_scene, cfg, key, counts, MAP_CAUSTIC, 8192, per_lane=True)
    n = int(cnt)
    n_over = int(ocnt)
    assert int(cnt2) == n and int(lost2) == int(lost) == 0
    f = np.asarray(flag)
    assert f.sum() + n_over == n
    a = np.concatenate([np.asarray(pos[:n]), np.asarray(power[:n]),
                        np.asarray(code[:n], np.float32)[:, None]], axis=1)
    b = np.stack([np.asarray(s)[f] for s in stores], axis=1)
    if n_over:
        b = np.concatenate(
            [b, np.stack([np.asarray(s)[:n_over] for s in obufs], axis=1)])
    # same multiset: sort both by a stable lexicographic key
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


_MIXED_SCN = """\
camera 0.5 0.5 -1.5   0 0 1   0 1 0   0.33   0.01 100
# one MIXED kd+ks material everywhere: a caustic walk re-arms after each
# specular bounce and can store MORE THAN ONCE (photontracer.cpp:77-80)
material 0 0 0   0.45 0.45 0.45   0.5 0.5 0.5   0 0 0   0 0 0   100 1.0 0
# floor
tri 0   1 0 0   0 0 0   0 0 1
tri 0   0 0 1   1 0 1   1 0 0
# ceiling
tri 0   1 1 0   1 1 1   0 1 1
tri 0   0 1 1   0 1 0   1 1 0
# back wall
tri 0   1 0 1   0 0 1   0 1 1
tri 0   0 1 1   1 1 1   1 0 1
# front wall
tri 0   0 0 0   1 0 0   1 1 0
tri 0   1 1 0   0 1 0   0 0 0
# left wall
tri 0   0 0 1   0 0 0   0 1 0
tri 0   0 1 0   0 1 1   0 0 1
# right wall
tri 0   1 0 0   1 0 1   1 1 1
tri 0   1 1 1   1 1 0   1 0 0
point_light 1 1 1   0.5 0.5 0.5    0 0 1
"""


def test_per_lane_multi_store_overflow(tmp_path):
    """A mixed kd+ks scene produces lanes that store MORE than once; the
    per-lane path must capture 2nd+ stores in its overflow buffer instead
    of overwriting the lane slot (exact multiset parity with the
    prefix-sum scatter path)."""
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.photon.trace import MAP_CAUSTIC, emit_round
    p = tmp_path / "mixed.scn"
    p.write_text(_MIXED_SCN)
    scene = load_scene(str(p))
    cfg = RenderConfig(max_photon_depth=16)
    key = jax.random.PRNGKey(7)
    counts = (4096,)
    pos, power, code, cnt, lost = emit_round(
        scene, cfg, key, counts, MAP_CAUSTIC, 16 * 4096)
    stores, flag, cnt2, obufs, ocnt, lost2 = emit_round(
        scene, cfg, key, counts, MAP_CAUSTIC, 4096, per_lane=True,
        ocap_div=1)
    n, n_over = int(cnt), int(ocnt)
    assert int(lost) == int(lost2) == 0
    assert n_over > 0, "mixed materials must exercise the overflow path"
    assert n_over <= obufs[0].shape[0]
    assert int(cnt2) == n
    f = np.asarray(flag)
    assert f.sum() + n_over == n
    a = np.concatenate([np.asarray(pos[:n]), np.asarray(power[:n]),
                        np.asarray(code[:n], np.float32)[:, None]], axis=1)
    b = np.stack([np.asarray(s)[f] for s in stores], axis=1)
    b = np.concatenate(
        [b, np.stack([np.asarray(s, np.float32)[:n_over] for s in obufs],
                     axis=1)])
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_caustic_trace_on_device_accumulation(cornell_scene):
    """trace_photon_map's on-device accumulator path (single-device
    caustic) produces a grid whose valid photons all lie on scene
    surfaces and whose flux matches the quota-loop accounting."""
    from gi_tpu.photon.trace import MAP_CAUSTIC, trace_photon_map
    cfg = RenderConfig(caustic_photon_count=2000, max_photon_depth=16)
    grid, stats = trace_photon_map(cornell_scene, cfg,
                                   jax.random.PRNGKey(5), MAP_CAUSTIC)
    assert grid is not None
    assert int(stats["stored"]) >= 2000
    v = np.asarray(grid.valid)
    # the grid keeps exactly the configured goal (round overshoot is
    # thinned with a flux-preserving power rescale)
    assert v.sum() == int(stats["kept"]) == 2000
    p = np.asarray(grid.pos)[v]
    assert np.isfinite(p).all()
    assert p[:, 1].min() > -1e-3 and p[:, 1].max() < 1.2
    pw = np.asarray(grid.power.astype(jnp.float32))[v]
    assert (pw >= 0).all() and np.isfinite(pw).all() and pw.max() > 0


def test_global_map_build(cornell_scene):
    from gi_tpu.photon.trace import MAP_GLOBAL, trace_photon_map
    cfg = RenderConfig(global_photon_count=2000, max_photon_depth=16)
    grid, stats = trace_photon_map(cornell_scene, cfg, jax.random.PRNGKey(0),
                                   MAP_GLOBAL)
    assert grid is not None
    assert stats["stored"] >= 2000
    assert stats["emitted"] > 0
    # gather a radiance estimate at the floor center: must be positive
    q = jnp.asarray([[0.55, 0.001, 0.55]])
    nrm = jnp.asarray([[0.0, 1.0, 0.0]])
    est = gather.estimate_radiance(
        grid, q, nrm, nrm, jnp.asarray([1.0]),
        jnp.full((1, 3), 0.8), jnp.zeros((1, 3)), jnp.asarray([10.0]),
        cfg.global_estimate_size, cfg.global_estimate_dist, 0, cfg)
    assert float(est.sum()) > 0


def test_spot_emission_distribution_narrow_cutoff():
    """KS test of spot-light emitted directions vs the closed-form
    truncated-Phong density for a narrow (10-degree) cutoff — validates the
    21-draw rejection + narrowed-lobe cheat semantics of the reference
    (photontracer.cpp:258-286)."""
    from gi_tpu.photon.trace import _emit_from_light
    from gi_tpu.scene.types import LIGHT_SPOT, build_scene

    s_drop, cut = 10.0, np.deg2rad(10.0)
    z3, z = np.zeros((0, 3)), np.zeros(0)
    scene = build_scene(
        tris_np=dict(v0=[[0, 0, 5]], e1=[[1, 0, 0]], e2=[[0, 1, 0]],
                     normal=[[0, 0, 1]], mat=[0]),
        spheres_np=dict(center=z3, radius=z, mat=z),
        boxes_np=dict(lo=z3, hi=z3, mat=z),
        cylinders_np=dict(p0=z3, p1=z3, radius=z, mat=z),
        cones_np=dict(p0=z3, p1=z3, radius=z, mat=z),
        circles_np=dict(center=z3, normal=z3, radius=z, mat=z),
        materials_np=dict(ka=np.zeros((1, 3)), kd=np.ones((1, 3)),
                          ks=np.zeros((1, 3)), kt=np.zeros((1, 3)),
                          emission=np.zeros((1, 3)),
                          shininess=np.ones(1), ir=np.ones(1)),
        lights_np=dict(kind=[LIGHT_SPOT], color=[[1, 1, 1]],
                       position=[[0, 0, 0]], direction=[[0, 0, 1]],
                       radius=[0.0], axis1=[[1, 0, 0]], axis2=[[0, 1, 0]],
                       len1=[0.0], len2=[0.0], ca=[1.0], la=[0.0],
                       qa=[0.0], cutoff=[cut], dropoff=[s_drop],
                       intensity=[1.0]),
        camera_np=dict(eye=[0, 0, -1], towards=[0, 0, 1], up=[0, 1, 0],
                       right=[-1, 0, 0], xfov=0.5, yfov=0.5,
                       neardist=0.01, fardist=100.0),
        ambient=np.zeros(3), background=np.zeros(3))

    n = 20000
    _, d = _emit_from_light(scene, 0, LIGHT_SPOT, jax.random.PRNGKey(9), n)
    cos_a = np.asarray(d)[:, 2]
    cos_c = np.cos(cut)

    # The only out-of-cone mass is the unchecked cheat tail, with
    # closed-form probability (1-p_in)^21 * P(narrowed lobe > cutoff):
    # the 21 rejection draws accept with p_in = 1 - cos_c^(s+1) each, and
    # the cheat's alpha = acos(u^(1/(s+1))) * angle_limit(cutoff) exceeds
    # the cutoff iff u < cos(cut/angle_limit)^(s+1).
    p_in = 1.0 - cos_c ** (s_drop + 1)
    angle_limit = 1.0 - np.arccos(cos_c) * 2.0 / np.pi
    p_out_cheat = np.cos(cut / angle_limit) ** (s_drop + 1)
    expected_out = (1.0 - p_in) ** 21 * p_out_cheat
    frac_out = float((cos_a < cos_c - 1e-6).mean())
    assert abs(frac_out - expected_out) < 0.01, (
        f"{frac_out:.3%} outside cutoff, closed form {expected_out:.3%}")

    # In-cone samples follow the truncated Phong CDF
    # F(x) = (x^(s+1) - cos_c^(s+1)) / (1 - cos_c^(s+1))
    x = np.sort(cos_a[cos_a >= cos_c])
    m = len(x)
    F = (x ** (s_drop + 1) - cos_c ** (s_drop + 1)) / (
        1.0 - cos_c ** (s_drop + 1))
    ecdf = (np.arange(m) + 0.5) / m
    ks = np.abs(F - ecdf).max()
    assert ks < 0.05, f"KS distance {ks:.4f} vs truncated-Phong CDF"


def test_grid_sizing_large_scene_span():
    """Stress the cell-size clamp (build_grid: cell = max(estimate_dist,
    span/max_dim)): on a stilllife-scale bbox where span/256 >> estimate_dist
    the cells grow past the query radius, which must inflate candidate
    windows but NOT change the estimates — the 27-cell grid path must still
    match the exact brute-force path (photon_utils.cpp:85-96 max-dist
    semantics)."""
    from gi_tpu.photon.gather import (_estimate_chunk, _estimate_chunk_brute,
                                      build_grid)

    rng = np.random.default_rng(21)
    n = 20000
    span = 1000.0          # bbox span 1000, dist 0.5 -> span/256 ~ 3.9
    dist = 0.5
    pos = rng.uniform(0, span, (n, 3)).astype(np.float32)
    # cluster some photons so queries actually find neighbors
    pos[:5000] = (span / 2 + rng.normal(scale=2.0, size=(5000, 3))
                  ).astype(np.float32)
    power = rng.uniform(0, 1e-2, (n, 3)).astype(np.float32)
    code = rng.integers(0, 65536, n).astype(np.int32)
    # cell_cap high enough that no cell decimates: this test isolates the
    # oversized-cell windowing, not the (documented) decimation
    # approximation that the exact brute/Pallas paths avoid.
    grid = build_grid(jnp.asarray(pos), jnp.asarray(power),
                      jnp.asarray(code), jnp.ones(n, bool),
                      np.zeros(3), np.full(3, span), dist, cell_cap=8192)
    # the clamp actually engaged: cells are larger than the query radius
    assert 1.0 / float(grid.inv_h) > dist

    B = 160
    q = (span / 2 + rng.normal(scale=2.5, size=(B, 3))).astype(np.float32)
    nrm = rng.normal(size=(B, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(
        np.float32)
    ct = rng.uniform(-1, 1, B).astype(np.float32)
    kd = rng.uniform(0, 1, (B, 3)).astype(np.float32)
    ks = rng.uniform(0, 0.3, (B, 3)).astype(np.float32)
    sh = rng.uniform(1, 20, B).astype(np.float32)
    cfg = RenderConfig()
    args = (grid, jnp.asarray(q), jnp.asarray(nrm), jnp.asarray(nrm),
            jnp.asarray(ct), jnp.asarray(kd), jnp.asarray(ks),
            jnp.asarray(sh), 32, dist, 0, cfg)
    got = np.asarray(_estimate_chunk(*args))
    oracle = np.asarray(_estimate_chunk_brute(*args))
    assert np.abs(oracle).max() > 0  # queries found photons
    np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=1e-6)


def test_emit_round_overflow_detectable(cornell_scene):
    """`count` keeps counting past the buffer cap (the scatter drops the
    excess), so the host quota loop can detect an overflowed round and
    discard it instead of silently dim-biasing photon_power."""
    from gi_tpu.photon.trace import MAP_GLOBAL, emit_round
    cfg = RenderConfig(max_photon_depth=16)
    counts = (4096,)
    cap = 128  # deliberately undersized: cornell stores >> 128 global photons
    pos, power, code, cnt, _ = emit_round(cornell_scene, cfg,
                                       jax.random.PRNGKey(0), counts,
                                       MAP_GLOBAL, cap)
    assert int(cnt) > cap, "wanted-store count must survive the drop"
    # every retained slot is a real store (finite position on a surface)
    p = np.asarray(pos)
    assert np.isfinite(p).all()
    assert p.shape[0] == cap


def test_quota_loop_overflow_retry(cornell_scene, monkeypatch):
    """An undersized round buffer triggers the discard-and-double retry;
    the resulting map meets the goal with unbiased photon power (the
    discarded rounds' emissions count for nothing)."""
    from gi_tpu.photon import trace as T

    cfg = RenderConfig(global_photon_count=3000, max_photon_depth=16)
    ref_grid, ref_stats = T.trace_photon_map(
        cornell_scene, cfg, jax.random.PRNGKey(7), T.MAP_GLOBAL)
    assert ref_stats["overflow_rounds"] == 0

    monkeypatch.setitem(T._CAP_FACTOR, T.MAP_GLOBAL, 0.05)
    grid, stats = T.trace_photon_map(
        cornell_scene, cfg, jax.random.PRNGKey(7), T.MAP_GLOBAL)
    assert stats["overflow_rounds"] >= 1
    assert stats["stored"] >= 3000

    # unbiasedness proxy: mean per-photon flux matches the clean run
    # (photon_power = total_power / emitted must not be diluted by drops)
    m_ref = float(jnp.mean(jnp.sum(ref_grid.power.astype(jnp.float32), -1)))
    m_ovf = float(jnp.mean(jnp.sum(grid.power.astype(jnp.float32), -1)))
    assert abs(m_ovf - m_ref) / m_ref < 0.12


def test_quota_loop_shortfall_warning(monkeypatch, capsys):
    """A scene whose walks cannot store (no diffuse surfaces) surfaces
    `stored < goal` as a warning in stats instead of failing silently."""
    from gi_tpu.photon import trace as T
    from gi_tpu.scene.scn import load_scene
    import os
    scene = load_scene(os.path.join("/root/reference/input", "cornell.scn"))
    # pure-specular world: zero out kd so GLOBAL stores never happen
    mats = scene.materials
    scene = scene.replace(materials=mats.replace(
        kd=jnp.zeros_like(mats.kd), kt=jnp.zeros_like(mats.kt)))
    cfg = RenderConfig(global_photon_count=1000, max_photon_depth=4)
    grid, stats = T.trace_photon_map(scene, cfg, jax.random.PRNGKey(0),
                                     T.MAP_GLOBAL)
    assert grid is None
    assert stats["stored"] == 0
    assert "warning" in stats and "stored 0 < goal 1000" in stats["warning"]


_CONE_SCN = """\
camera 0 1 -3   0 0 1   0 1 0   0.4   0.01 100
point_light 1 1 1   0 2 0   0 0 1
material 0 0 0   0 0 0   0 0 0   1 1 1   0 0 0   1000 1.4 0
material 0 0 0   1 1 1   0 0 0   0 0 0   0 0 0   10 1 0
sphere 0   0 1 0   0.45
box 1   -2 -0.5 -2   2 0 2
"""


@pytest.fixture(scope="module")
def cone_scene(tmp_path_factory):
    from gi_tpu.scene.scn import load_scene
    p = tmp_path_factory.mktemp("cone") / "cone.scn"
    p.write_text(_CONE_SCN)
    return load_scene(str(p))


def test_emission_cone_covers_specular_first_hits(cone_scene):
    """Every direction whose first hit is specular must lie inside the
    projection cone (the exactness condition for caustic emission
    importance sampling)."""
    from gi_tpu.ops.intersect import intersect_scene
    from gi_tpu.photon import trace as T

    axes, cosm, cover = T._emission_cones(cone_scene, T.MAP_CAUSTIC)
    assert cover[0] < 0.1, "cone must be much tighter than the sphere"

    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(np.asarray(cone_scene.lights.position[0]), d.shape)
    hit = intersect_scene(cone_scene, jnp.asarray(o, jnp.float32),
                          jnp.asarray(d, jnp.float32))
    kt = np.asarray(cone_scene.materials.kt)[np.asarray(hit.mat)]
    spec_first = np.asarray(hit.valid) & (kt.sum(-1) > 0)
    in_cone = (d @ axes[0]) >= float(cosm[0]) - 1e-6
    assert spec_first.sum() > 100
    assert np.all(in_cone[spec_first]), \
        f"{(~in_cone[spec_first]).sum()} specular first hits outside cone"


def test_caustic_cone_emission_unbiased(cone_scene, monkeypatch):
    """Cone-restricted caustic emission conserves total stored flux vs
    full-sphere emission (virtual-emission accounting is exact) while
    storing far more photons per traced walk."""
    from gi_tpu.photon import trace as T

    cfg = RenderConfig(caustic_photon_count=20000, max_photon_depth=32)
    grid_c, st_c = T.trace_photon_map(cone_scene, cfg, jax.random.PRNGKey(1),
                                      T.MAP_CAUSTIC)
    flux_c = float(np.asarray(grid_c.power.astype(jnp.float32)).sum())

    real_cones = T._emission_cones
    monkeypatch.setattr(T, "_emission_cones",
                        lambda s, m: real_cones(s, T.MAP_GLOBAL))
    grid_f, st_f = T.trace_photon_map(cone_scene, cfg, jax.random.PRNGKey(1),
                                      T.MAP_CAUSTIC)
    flux_f = float(np.asarray(grid_f.power.astype(jnp.float32)).sum())

    eff_c = st_c["stored"] / st_c["emitted_real"]
    eff_f = st_f["stored"] / st_f["emitted_real"]
    assert eff_c > 5 * eff_f, f"cone eff {eff_c:.3f} vs full {eff_f:.3f}"
    assert abs(flux_c - flux_f) / flux_f < 0.05, \
        f"flux {flux_c:.4f} vs {flux_f:.4f}"


def test_hist_estimator_matches_brute():
    """The selection-free histogram estimator (TPU small-map fast path,
    gather._estimate_chunk_hist) must match the exact brute top-K path to
    kernel-grade accuracy: identical in the sparse (< K in range) regime,
    tie-shell-tolerance in dense regions (tau resolves the K-th radius at
    cap^2/32768)."""
    from gi_tpu.photon.gather import (_estimate_chunk_brute,
                                      _estimate_chunk_hist, build_grid)

    rng = np.random.default_rng(7)
    n = 2176
    pos = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    power = rng.uniform(0, 1e-3, (n, 3)).astype(np.float32)
    code = rng.integers(0, 65536, n).astype(np.int32)
    grid = build_grid(jnp.asarray(pos), jnp.asarray(power),
                      jnp.asarray(code), jnp.ones(n, bool),
                      np.zeros(3), np.full(3, 5.0), 2.5, cell_cap=4096)

    b = 256
    q = rng.uniform(0, 5, (b, 3)).astype(np.float32)
    nrm = rng.normal(size=(b, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(
        np.float32)
    eb = rng.normal(size=(b, 3))
    eb = (eb / np.linalg.norm(eb, axis=1, keepdims=True)).astype(np.float32)
    ct = rng.uniform(-1, 1, b).astype(np.float32)
    kd = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    ks = rng.uniform(0, 0.5, (b, 3)).astype(np.float32)
    sh = rng.uniform(1, 50, b).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (q, nrm, eb, ct, kd, ks, sh))

    cfg = RenderConfig()
    for ft in (0, 1, 2):
        # dense: K=50 within dist 2.5 is exceeded for most queries
        ref = np.asarray(_estimate_chunk_brute(grid, *args, 50, 2.5, ft,
                                               cfg))
        got = np.asarray(_estimate_chunk_hist(grid, *args, 50, 2.5, ft,
                                              cfg))
        scale = max(np.abs(ref).max(), 1e-12)
        assert np.abs(got - ref).max() / scale < 3e-2, ft
        assert (np.abs(got - ref).mean()
                / max(np.abs(ref).mean(), 1e-12)) < 5e-3, ft
        # sparse: cap holds fewer than K -> bit-identical fixed-cap math
        ref_s = np.asarray(_estimate_chunk_brute(grid, *args, 4096, 0.4,
                                                 ft, cfg))
        got_s = np.asarray(_estimate_chunk_hist(grid, *args, 4096, 0.4,
                                                ft, cfg))
        np.testing.assert_allclose(got_s, ref_s, rtol=2e-4, atol=1e-6,
                                   err_msg=str(ft))
