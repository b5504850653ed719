"""Intersection kernels vs closed-form oracles and random brute force."""

import numpy as np
import jax.numpy as jnp

from gi_tpu.ops import intersect as I
from gi_tpu.scene.scn import load_scene
from gi_tpu.scene.types import Scene, build_scene


def _mini_scene(**kw):
    """Build a scene with given primitive dicts (others empty)."""
    z3 = np.zeros((0, 3))
    z = np.zeros(0)
    defaults = dict(
        tris_np=dict(v0=z3, e1=z3, e2=z3, normal=z3, mat=z),
        spheres_np=dict(center=z3, radius=z, mat=z),
        boxes_np=dict(lo=z3, hi=z3, mat=z),
        cylinders_np=dict(p0=z3, p1=z3, radius=z, mat=z),
        cones_np=dict(p0=z3, p1=z3, radius=z, mat=z),
        circles_np=dict(center=z3, normal=z3, radius=z, mat=z),
        materials_np=dict(ka=np.zeros((1, 3)), kd=np.ones((1, 3)),
                          ks=np.zeros((1, 3)), kt=np.zeros((1, 3)),
                          emission=np.zeros((1, 3)), shininess=np.ones(1),
                          ir=np.ones(1)),
        lights_np=dict(kind=z, color=z3, position=z3, direction=z3, radius=z,
                       axis1=z3, axis2=z3, len1=z, len2=z, ca=z, la=z, qa=z,
                       cutoff=z, dropoff=z, intensity=z),
        camera_np=dict(eye=np.zeros(3), towards=[0, 0, 1], up=[0, 1, 0],
                       right=[1, 0, 0], xfov=0.5, yfov=0.5, neardist=0.01,
                       fardist=100.0),
        ambient=np.zeros(3), background=np.zeros(3),
    )
    defaults.update(kw)
    return build_scene(**defaults)


def _rays(o_list, d_list):
    o = jnp.asarray(np.asarray(o_list, np.float32).reshape(-1, 3))
    d = np.asarray(d_list, np.float64).reshape(-1, 3)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d.astype(np.float32))


def test_sphere_entry_exit():
    s = _mini_scene(spheres_np=dict(center=[[0, 0, 5]], radius=[1.0], mat=[0]))
    o, d = _rays([[0, 0, 0], [0, 0, 5], [0, 3, 0]],
                 [[0, 0, 1], [0, 0, 1], [0, 0, 1]])
    h = I.intersect_scene(s, o, d)
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)        # entry
    np.testing.assert_allclose(h.t[1], 1.0, rtol=1e-5)        # inside -> exit
    assert not bool(h.valid[2])                                # miss
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[1]), [0, 0, 1], atol=1e-5)


def test_triangle_two_sided():
    tri = dict(v0=[[-1, -1, 3]], e1=[[2, 0, 0]], e2=[[0, 2, 0]],
               normal=[[0, 0, 1]], mat=[0])
    s = _mini_scene(tris_np=tri)
    o, d = _rays([[0, 0, 0], [0, 0, 6], [5, 5, 0]],
                 [[0, 0, 1], [0, 0, -1], [0, 0, 1]])
    h = I.intersect_scene(s, o, d)
    np.testing.assert_allclose(h.t[0], 3.0, rtol=1e-5)
    np.testing.assert_allclose(h.t[1], 3.0, rtol=1e-5)   # hit from behind
    assert not bool(h.valid[2])


def test_box_entry_exit_normals():
    s = _mini_scene(boxes_np=dict(lo=[[-1, -1, 2]], hi=[[1, 1, 4]], mat=[0]))
    o, d = _rays([[0, 0, 0], [0, 0, 3]], [[0, 0, 1], [0, 0, 1]])
    h = I.intersect_scene(s, o, d)
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(h.t[1], 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[1]), [0, 0, 1], atol=1e-5)


def test_cylinder_side_and_caps():
    s = _mini_scene(cylinders_np=dict(p0=[[0, -1, 5]], p1=[[0, 1, 5]],
                                      radius=[1.0], mat=[0]))
    o, d = _rays([[0, 0, 0], [0, 5, 5], [3, 5, 5]],
                 [[0, 0, 1], [0, -1, 0], [0, -1, 0]])
    h = I.intersect_scene(s, o, d)
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)       # side
    np.testing.assert_allclose(h.t[1], 4.0, rtol=1e-5)       # top cap
    np.testing.assert_allclose(np.asarray(h.normal[1]), [0, 1, 0], atol=1e-5)
    assert not bool(h.valid[2])


def test_cone_side_and_base():
    # base at y=0 radius 1, apex at (0,2,0)
    s = _mini_scene(cones_np=dict(p0=[[0, 0, 5]], p1=[[0, 2, 5]],
                                  radius=[1.0], mat=[0]))
    o, d = _rays([[0, 1, 0], [0, -5, 5], [0, 1.9, 0]],
                 [[0, 0, 1], [0, 1, 0], [0, 0, 1]])
    h = I.intersect_scene(s, o, d)
    # at y=1, cone radius = 0.5 -> ray along z hits at z = 5 - 0.5
    np.testing.assert_allclose(h.t[0], 4.5, rtol=1e-4)
    np.testing.assert_allclose(h.t[1], 5.0, rtol=1e-5)       # base cap
    np.testing.assert_allclose(h.t[2], 5.0 - 0.05, rtol=1e-3)


def test_circle_disk():
    s = _mini_scene(circles_np=dict(center=[[0, 0, 2]], normal=[[0, 0, 1]],
                                    radius=[1.0], mat=[0]))
    o, d = _rays([[0.5, 0, 0], [1.5, 0, 0]], [[0, 0, 1], [0, 0, 1]])
    h = I.intersect_scene(s, o, d)
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    assert not bool(h.valid[1])


def test_chunked_triangle_scan_matches_dense():
    rng = np.random.default_rng(0)
    N = 5000  # > chunk size forces the scan path
    v0 = rng.uniform(-5, 5, (N, 3))
    e1 = rng.uniform(-1, 1, (N, 3))
    e2 = rng.uniform(-1, 1, (N, 3))
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    tris = dict(v0=v0, e1=e1, e2=e2, normal=n, mat=np.zeros(N))
    s = _mini_scene(tris_np=tris)
    B = 64
    o = jnp.asarray(rng.uniform(-6, 6, (B, 3)).astype(np.float32))
    d = rng.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    t_scan, _ = I._tri_closest(o, d, s.tris, 0.0, chunk=512)
    t_all = I._tri_t(o, d, s.tris.v0, s.tris.e1, s.tris.e2, 0.0)
    t_dense = jnp.min(t_all, axis=1)
    np.testing.assert_allclose(np.asarray(t_scan), np.asarray(t_dense),
                               rtol=1e-6)


def test_cornell_center_ray(cornell_scene):
    """Ray through the cornell camera axis hits the back wall at z=1.1184."""
    s = cornell_scene
    o = jnp.asarray(np.array([[0.556, 0.546, -1.6]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 1]], np.float32))
    h = I.intersect_scene(s, o, d)
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.point[0, 2]), 1.1184, rtol=1e-4)
    # a ray toward the glass sphere center hits the sphere first
    c = np.array([0.2, 0.151, 0.55])
    dirv = c - np.array([0.556, 0.546, -1.6])
    dirv /= np.linalg.norm(dirv)
    h2 = I.intersect_scene(s, o, jnp.asarray(dirv[None].astype(np.float32)))
    sm = int(h2.mat[0])
    kt = np.asarray(s.materials.kt[sm])
    assert kt.max() > 0.5  # transparent glass material

def test_pallas_triangle_kernel_matches_dense_interpret():
    """Pallas tri kernel (interpret mode, CPU) vs the dense jnp oracle,
    including gradient flow through the select-then-recompute path."""
    import jax
    from gi_tpu.ops.pallas_intersect import tri_closest_pallas

    rng = np.random.default_rng(3)
    N = 1100  # not a multiple of the chunk size: exercises padding
    v0 = rng.uniform(-5, 5, (N, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    B = 70  # not a multiple of the ray block: exercises padding
    o = rng.uniform(-6, 6, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    v0j, e1j, e2j = jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    t_pal, idx = tri_closest_pallas(oj, dj, v0j, e1j, e2j, 0.0,
                                    interpret=True)
    t_all = I._tri_t(oj, dj, v0j, e1j, e2j, 0.0)
    t_dense = jnp.min(t_all, axis=1)
    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_dense),
                               rtol=1e-5)
    hit = np.isfinite(np.asarray(t_dense))
    np.testing.assert_array_equal(np.asarray(idx)[hit],
                                  np.asarray(jnp.argmin(t_all, axis=1))[hit])

    # gradient wrt ray origin: finite-difference check on the sum of hits
    def loss(o_):
        t, _ = tri_closest_pallas(o_, dj, v0j, e1j, e2j, 0.0, interpret=True)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    g = jax.grad(loss)(oj)
    eps = 1e-3
    probe = np.zeros_like(o)
    probe[0, 2] = 1.0
    pj = jnp.asarray(probe)
    fd = (loss(oj + eps * pj) - loss(oj - eps * pj)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, pj)), float(fd),
                               rtol=0.05, atol=1e-3)


def test_pallas_block_cull_multichunk():
    """The block-culled Pallas kernel (chunk-bbox slab test over
    Morton-ordered triangles) must agree with the plain scan across chunk
    boundaries: two clusters of triangles > TC apart along the ray, with
    rays hitting the near cluster, the far cluster, or neither."""
    import jax
    from gi_tpu.ops.pallas_intersect import TC, tri_closest_pallas

    rng = np.random.default_rng(7)
    n_per = TC + 100                     # force > 1 chunk per cluster

    def cluster(zc):
        v0 = rng.uniform(-1, 1, (n_per, 3))
        v0[:, 2] = zc + rng.uniform(-0.05, 0.05, n_per)
        e1 = rng.uniform(-0.1, 0.1, (n_per, 3))
        e2 = rng.uniform(-0.1, 0.1, (n_per, 3))
        return v0, e1, e2

    a0, a1, a2 = cluster(5.0)
    b0, b1, b2 = cluster(50.0)
    v0 = jnp.asarray(np.concatenate([a0, b0]), jnp.float32)
    e1 = jnp.asarray(np.concatenate([a1, b1]), jnp.float32)
    e2 = jnp.asarray(np.concatenate([a2, b2]), jnp.float32)

    B = 512
    o = jnp.asarray(rng.uniform(-1, 1, (B, 3)) * [1, 1, 0], jnp.float32)
    d = np.concatenate([rng.normal(0, 0.15, (B, 2)), np.ones((B, 1))], axis=1)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

    t_p, _ = tri_closest_pallas(o, d, v0, e1, e2, 0.0, interpret=True)

    from gi_tpu.ops.intersect import _tri_t
    t_all = _tri_t(o, d, v0, e1, e2, 0.0)
    t_ref = jnp.min(t_all, axis=1)

    tp = np.asarray(t_p)
    tr = np.asarray(t_ref)
    assert (np.isfinite(tp) == np.isfinite(tr)).all()
    m = np.isfinite(tr)
    assert m.sum() > 50                  # the test actually exercises hits
    np.testing.assert_allclose(tp[m], tr[m], rtol=1e-4)


def test_occluded_matches_closest_hit_predicate():
    """Any-hit (occluded) must equal the closest-hit-derived occlusion
    predicate over every primitive type."""
    rng = np.random.default_rng(11)
    s = _mini_scene(
        tris_np=dict(v0=rng.uniform(-2, 2, (40, 3)),
                     e1=rng.uniform(-1, 1, (40, 3)),
                     e2=rng.uniform(-1, 1, (40, 3)),
                     normal=np.tile([[0, 0, 1.0]], (40, 1)),
                     mat=np.zeros(40)),
        spheres_np=dict(center=rng.uniform(-2, 2, (6, 3)),
                        radius=rng.uniform(0.2, 0.8, 6), mat=np.zeros(6)),
        boxes_np=dict(lo=rng.uniform(-2, 0, (4, 3)),
                      hi=rng.uniform(0, 2, (4, 3)), mat=np.zeros(4)),
        cylinders_np=dict(p0=rng.uniform(-2, 2, (3, 3)),
                          p1=rng.uniform(-2, 2, (3, 3)),
                          radius=rng.uniform(0.2, 0.5, 3), mat=np.zeros(3)),
        circles_np=dict(center=rng.uniform(-2, 2, (3, 3)),
                        normal=np.tile([[0, 1.0, 0]], (3, 1)),
                        radius=rng.uniform(0.3, 1.0, 3), mat=np.zeros(3)))
    B = 256
    o = jnp.asarray(rng.uniform(-4, 4, (B, 3)), jnp.float32)
    d = rng.normal(size=(B, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    t_max = jnp.asarray(rng.uniform(0.5, 8.0, B), jnp.float32)

    occ = I.occluded(s, o, d, t_max=t_max, t_min=1e-3)
    t = I.intersect_scene(s, o, d, t_min=1e-3).t
    expect = np.asarray(t) < np.asarray(t_max)
    np.testing.assert_array_equal(np.asarray(occ), expect)
    assert expect.any() and not expect.all()


def test_tri_occluded_pallas_interpret_matches_dense():
    """Pallas any-hit kernel (interpret mode) vs the dense jnp predicate,
    with padding-size B/N and per-ray t windows."""
    from gi_tpu.ops.pallas_intersect import tri_occluded_pallas

    rng = np.random.default_rng(12)
    N = 1100
    v0 = jnp.asarray(rng.uniform(-5, 5, (N, 3)), jnp.float32)
    e1 = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
    e2 = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
    B = 70
    o = jnp.asarray(rng.uniform(-6, 6, (B, 3)), jnp.float32)
    d = rng.normal(size=(B, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    t_lo = jnp.asarray(rng.uniform(0.0, 0.1, B), jnp.float32)
    t_hi = jnp.asarray(rng.uniform(1.0, 15.0, B), jnp.float32)

    occ = tri_occluded_pallas(o, d, v0, e1, e2, t_lo, t_hi, interpret=True)
    t_all = I._tri_t(o, d, v0, e1, e2, t_lo[:, None])
    expect = np.asarray(jnp.any(t_all < t_hi[:, None], axis=1))
    np.testing.assert_array_equal(np.asarray(occ), expect)
    assert expect.any() and not expect.all()


def test_tri_occluded_chunked_while_loop():
    """The chunked jnp any-hit (early-exit while_loop) must agree with the
    dense predicate across chunk boundaries."""
    rng = np.random.default_rng(13)
    N = 5000  # > chunk=2048 -> exercises the while_loop path
    tris = dict(v0=rng.uniform(-5, 5, (N, 3)), e1=rng.uniform(-1, 1, (N, 3)),
                e2=rng.uniform(-1, 1, (N, 3)),
                normal=np.tile([[0, 0, 1.0]], (N, 1)), mat=np.zeros(N))
    s = _mini_scene(tris_np=tris)
    B = 128
    o = jnp.asarray(rng.uniform(-6, 6, (B, 3)), jnp.float32)
    d = rng.normal(size=(B, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    t_max = jnp.asarray(rng.uniform(0.5, 10.0, B), jnp.float32)

    occ = I._tri_occluded(o, d, s.tris, 1e-3, t_max)
    t_all = I._tri_t(o, d, s.tris.v0, s.tris.e1, s.tris.e2, 1e-3)
    expect = np.asarray(jnp.any(t_all < t_max[:, None], axis=1))
    np.testing.assert_array_equal(np.asarray(occ), expect)
