"""Gradcheck harness: finite differences vs reverse-mode AD on renders.

BASELINE.json's north star demands "gradcheck-passing parameter gradients"
for albedo/shininess, light power, and camera; the reference has no
differentiability at all (SURVEY §2.4).  Visibility gradients (light
position / size moving shadows) additionally require the soft-visibility
relaxation (ops.intersect.soft_visibility, cfg.vis_softness > 0) because
the reference's occlusion test (illumination_utils.cpp:16-31) is a step
function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gi_tpu.models.render import render_tile
from gi_tpu.parallel.mesh import apply_params, diff_params
from gi_tpu.scene.types import build_scene
from gi_tpu.utils.config import RenderConfig


def _mini_scene(**kw):
    z3 = np.zeros((0, 3))
    z = np.zeros(0)
    defaults = dict(
        tris_np=dict(v0=z3, e1=z3, e2=z3, normal=z3, mat=z),
        spheres_np=dict(center=z3, radius=z, mat=z),
        boxes_np=dict(lo=z3, hi=z3, mat=z),
        cylinders_np=dict(p0=z3, p1=z3, radius=z, mat=z),
        cones_np=dict(p0=z3, p1=z3, radius=z, mat=z),
        circles_np=dict(center=z3, normal=z3, radius=z, mat=z),
        materials_np=dict(ka=np.zeros((1, 3)), kd=np.full((1, 3), 0.8),
                          ks=np.zeros((1, 3)), kt=np.zeros((1, 3)),
                          emission=np.zeros((1, 3)), shininess=np.ones(1),
                          ir=np.ones(1)),
        lights_np=dict(kind=z, color=z3, position=z3, direction=z3, radius=z,
                       axis1=z3, axis2=z3, len1=z, len2=z, ca=z, la=z, qa=z,
                       cutoff=z, dropoff=z, intensity=z),
        camera_np=dict(eye=[0.0, 3.0, 0.0], towards=[0, -1, 0],
                       up=[0, 0, 1], right=[-1, 0, 0], xfov=0.7, yfov=0.7,
                       neardist=0.01, fardist=100.0),
        ambient=np.zeros(3), background=np.zeros(3),
    )
    defaults.update(kw)
    return build_scene(**defaults)


_FLOOR = dict(v0=[[-3, 0, -3], [3, 0, 3]], e1=[[6, 0, 0], [-6, 0, 0]],
              e2=[[0, 0, 6], [0, 0, -6]], normal=[[0, 1, 0], [0, 1, 0]],
              mat=[0, 0])
_POINT_LIGHT = dict(kind=[1], color=[[1.0, 0.9, 0.8]],
                    position=[[0.4, 2.2, 0.1]], direction=[[0, -1, 0]],
                    radius=[0.0], axis1=[[1, 0, 0]], axis2=[[0, 0, 1]],
                    len1=[0.0], len2=[0.0], ca=[1.0], la=[0.0], qa=[0.0],
                    cutoff=[0.0], dropoff=[0.0], intensity=[1.0])


def _direct_cfg(res, **kw):
    base = dict(width=res, height=res, aa=0, ambient=False,
                monte_carlo=False, indirect_illum=False, caustic_illum=False,
                transmissive_illum=False, specular_illum=False,
                differentiable=True, ray_tile=res * res)
    base.update(kw)
    return RenderConfig(**base)


def _render_flat(scene, cfg):
    idx = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    return render_tile(scene, cfg, jax.random.PRNGKey(7), idx,
                       cfg.width, cfg.height, None)


def _check_fd(loss, params, direction, h, rtol, expect_nonzero=True):
    """Central-difference directional derivative vs AD projection."""
    g = jax.grad(loss)(params)
    ad = sum(float(jnp.vdot(gl, dl)) for gl, dl in
             zip(jax.tree.leaves(g), jax.tree.leaves(direction)))
    plus = jax.tree.map(lambda p, v: p + h * v, params, direction)
    minus = jax.tree.map(lambda p, v: p - h * v, params, direction)
    fd = (float(loss(plus)) - float(loss(minus))) / (2.0 * h)
    if expect_nonzero:
        assert abs(fd) > 1e-6, f"FD derivative vanished: {fd}"
    assert ad == pytest.approx(fd, rel=rtol, abs=1e-5), (
        f"AD {ad} vs FD {fd}")
    return ad, fd


def _dir_like(params, **leaves):
    """Zero pytree shaped like params with the given leaves filled."""
    d = jax.tree.map(jnp.zeros_like, params)
    for k, v in leaves.items():
        d[k] = v
    return d


# ---------------------------------------------------------------------------
# Parameter gradcheck on cornell (deterministic: point light, direct only)
# ---------------------------------------------------------------------------

class TestCornellGradcheck:
    @pytest.fixture(scope="class")
    def setup(self, cornell_scene):
        cfg = _direct_cfg(16, ambient=True)
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.uniform(0.1, 1.0, (256, 3)).astype(np.float32))
        scene = cornell_scene

        def loss(params):
            s = apply_params(scene, params)
            return jnp.vdot(w, _render_flat(s, cfg))

        return scene, loss

    def _mat_dir(self, params, field, value):
        mats = params["materials"]
        zeros = jax.tree.map(jnp.zeros_like, mats)
        d = _dir_like(params)
        d["materials"] = zeros.replace(**{field: value})
        return d

    def test_kd(self, setup):
        scene, loss = setup
        params = diff_params(scene)
        v = jnp.zeros_like(params["materials"].kd).at[0, 0].set(1.0)
        _check_fd(loss, params, self._mat_dir(params, "kd", v), 1e-3, 2e-2)

    def test_ks_and_shininess(self, setup):
        scene, loss = setup
        # give the floor a specular lobe so ks/shininess matter
        mats = scene.materials
        scene2 = scene.replace(materials=mats.replace(
            ks=mats.ks.at[0].set(jnp.asarray([0.3, 0.3, 0.3]))))
        cfg = _direct_cfg(16, ambient=True)
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.uniform(0.1, 1.0, (256, 3)).astype(np.float32))

        def loss2(params):
            return jnp.vdot(w, _render_flat(apply_params(scene2, params),
                                            cfg))

        params = diff_params(scene2)
        v = jnp.zeros_like(params["materials"].ks).at[0, 1].set(1.0)
        _check_fd(loss2, params, self._mat_dir(params, "ks", v), 1e-3, 2e-2)
        v = jnp.zeros_like(params["materials"].shininess).at[0].set(1.0)
        _check_fd(loss2, params, self._mat_dir(params, "shininess", v),
                  1e-3, 3e-2)

    def test_light_color(self, setup):
        scene, loss = setup
        params = diff_params(scene)
        d = _dir_like(params,
                      light_color=jnp.ones_like(params["light_color"]))
        _check_fd(loss, params, d, 1e-3, 2e-2)


def test_gradcheck_camera_eye_smooth_scene():
    """Camera-eye gradient on an edge-free view (floor fills the frame):
    FD and AD must agree tightly because nothing in view is discontinuous."""
    scene = _mini_scene(tris_np=_FLOOR, lights_np=_POINT_LIGHT)
    cfg = _direct_cfg(12)
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (144, 3)).astype(np.float32))

    def loss(params):
        return jnp.vdot(w, _render_flat(apply_params(scene, params), cfg))

    params = diff_params(scene)
    for axis in range(3):
        d = _dir_like(params, camera_eye=jnp.zeros(3).at[axis].set(1.0))
        _check_fd(loss, params, d, 1e-3, 2e-2)


# ---------------------------------------------------------------------------
# Visibility gradients (soft shadows of a sphere occluder)
# ---------------------------------------------------------------------------

class TestVisibilityGrad:
    """A loss over penumbra pixels — zero under the hard render — must have a
    nonzero, FD-matching gradient w.r.t. light position in soft mode."""

    BETA = 0.08
    RES = 24

    @pytest.fixture(scope="class")
    def scene(self):
        return _mini_scene(
            tris_np=_FLOOR,
            spheres_np=dict(center=[[0.0, 0.6, 0.0]], radius=[0.35],
                            mat=[0]),
            lights_np=_POINT_LIGHT)

    @pytest.fixture(scope="class")
    def penumbra_mask(self, scene):
        hard = np.asarray(_render_flat(scene, _direct_cfg(self.RES)))
        soft = np.asarray(_render_flat(
            scene, _direct_cfg(self.RES, vis_softness=self.BETA)))
        mask = (hard.sum(-1) == 0.0) & (soft.sum(-1) > 1e-5)
        assert mask.sum() >= 5, f"penumbra band too thin: {mask.sum()} px"
        return jnp.asarray(mask.astype(np.float32))[:, None]

    def test_soft_visibility_grad_matches_fd(self, scene, penumbra_mask):
        cfg = _direct_cfg(self.RES, vis_softness=self.BETA)

        def loss(params):
            img = _render_flat(apply_params(scene, params), cfg)
            return jnp.sum(img * penumbra_mask)

        params = diff_params(scene)
        for axis in (0, 2):
            d = _dir_like(params,
                          light_position=jnp.zeros((1, 3)).at[0, axis]
                          .set(1.0))
            ad, fd = _check_fd(loss, params, d, 2e-3, 5e-2)
            assert abs(ad) > 1e-4, "visibility gradient vanished"

    def test_hard_visibility_grad_is_zero(self, scene, penumbra_mask):
        cfg = _direct_cfg(self.RES)  # vis_softness = 0 -> step visibility

        def loss(params):
            img = _render_flat(apply_params(scene, params), cfg)
            return jnp.sum(img * penumbra_mask)

        g = jax.grad(loss)(diff_params(scene))
        assert float(jnp.abs(g["light_position"]).max()) == 0.0


def test_gradcheck_light_radius_area_light():
    """Area-light radius gradient: flows through the reparameterized light
    samples (position = center + radius * disk) AND soft visibility."""
    area_light = dict(kind=[3], color=[[1.0, 1.0, 1.0]],
                      position=[[0.3, 2.0, 0.0]], direction=[[0, -1, 0]],
                      radius=[0.5], axis1=[[1, 0, 0]], axis2=[[0, 0, 1]],
                      len1=[0.0], len2=[0.0], ca=[1.0], la=[0.0], qa=[0.0],
                      cutoff=[0.0], dropoff=[0.0], intensity=[1.0])
    scene = _mini_scene(
        tris_np=_FLOOR,
        spheres_np=dict(center=[[0.0, 0.6, 0.0]], radius=[0.35], mat=[0]),
        lights_np=area_light)
    cfg = _direct_cfg(12, vis_softness=0.08, light_test=16, shadow_test=0)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (144, 3)).astype(np.float32))

    def loss(params):
        return jnp.vdot(w, _render_flat(apply_params(scene, params), cfg))

    params = diff_params(scene)
    d = _dir_like(params, light_radius=jnp.ones(1))
    ad, fd = _check_fd(loss, params, d, 1e-3, 6e-2)
    assert abs(ad) > 1e-4


# ---------------------------------------------------------------------------
# Photon-map layer gradchecks (VERDICT r2 item 6): FD vs AD through the
# caustic radiance estimate and the indirect final gather, exercising the
# exact streaming top_k gather path.  The photon MAP is a fixed constant
# (its trace is a discrete stochastic process); gradients flow through the
# render: per-photon Phong weighting (kd/ks/shininess at the query) and the
# walk's throughput products.
# ---------------------------------------------------------------------------


def test_gradcheck_caustic_layer(tmp_path):
    """d/d(kd,ks,shininess) of a caustic-lit render (caustic.scn, primary
    -hit caustic estimates only — deterministic, no RR)."""
    from gi_tpu.photon.trace import build_photon_maps
    from gi_tpu.scene.scn import load_scene

    scene = load_scene("/root/reference/input/caustic.scn")
    cfg = RenderConfig(width=12, height=12, aa=0, ambient=False,
                       monte_carlo=False, indirect_illum=False,
                       transmissive_illum=False, specular_illum=False,
                       direct_illum=False, caustic_illum=True,
                       caustic_photon_count=8000, caustic_estimate_size=40,
                       caustic_estimate_dist=0.4, max_photon_depth=16,
                       differentiable=True, ray_tile=144)
    maps, cfg = build_photon_maps(scene, cfg, jax.random.PRNGKey(2))
    assert maps is not None and maps.caustic is not None

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (144, 3)).astype(np.float32))

    def loss(params):
        s = apply_params(scene, params)
        idx = jnp.arange(144, dtype=jnp.int32)
        img = render_tile(s, cfg, jax.random.PRNGKey(7), idx, 12, 12, maps)
        return jnp.vdot(w, img)

    params = diff_params(scene)
    # floor material (index 1 in caustic.scn): kd G channel
    v = jnp.zeros_like(params["materials"].kd).at[1, 1].set(1.0)
    d = jax.tree.map(jnp.zeros_like, params)
    d["materials"] = d["materials"].replace(kd=v)
    _check_fd(loss, params, d, 1e-3, 2e-2)

    # shininess through the per-photon Phong lobe needs a specular floor
    mats = scene.materials
    scene_s = scene.replace(materials=mats.replace(
        ks=mats.ks.at[1].set(jnp.asarray([0.3, 0.3, 0.3]))))

    def loss_s(params):
        s = apply_params(scene_s, params)
        idx = jnp.arange(144, dtype=jnp.int32)
        img = render_tile(s, cfg, jax.random.PRNGKey(7), idx, 12, 12, maps)
        return jnp.vdot(w, img)

    params_s = diff_params(scene_s)
    v = jnp.zeros_like(params_s["materials"].shininess).at[1].set(1.0)
    d = jax.tree.map(jnp.zeros_like, params_s)
    d["materials"] = d["materials"].replace(shininess=v)
    _check_fd(loss_s, params_s, d, 1e-3, 3e-2)


def test_gradcheck_indirect_gather_layer(cornell_scene):
    """d/d(kd) of the indirect final-gather layer (global-map estimate at
    walk termination, kd^2/prob_d transition weight).  The perturbed kd
    channel (G of the blue wall, kd=(0,0.5,0.8)) is NOT the max channel,
    so Russian-roulette thresholds are unmoved and the FD sees only the
    smooth dependence."""
    from gi_tpu.photon.trace import build_photon_maps

    cfg = RenderConfig(width=12, height=12, aa=0, ambient=False,
                       monte_carlo=True, direct_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, indirect_illum=True,
                       indirect_test=4, max_monte_depth=3,
                       diff_monte_depth=3, global_photon_count=3000,
                       global_estimate_size=30, global_estimate_dist=0.8,
                       max_photon_depth=8, differentiable=True,
                       ray_tile=144)
    maps, cfg = build_photon_maps(cornell_scene, cfg, jax.random.PRNGKey(4))
    assert maps is not None and maps.global_ is not None

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (144, 3)).astype(np.float32))

    def loss(params):
        s = apply_params(cornell_scene, params)
        idx = jnp.arange(144, dtype=jnp.int32)
        img = render_tile(s, cfg, jax.random.PRNGKey(9), idx, 12, 12, maps)
        return jnp.vdot(w, img)

    params = diff_params(cornell_scene)
    v = jnp.zeros_like(params["materials"].kd).at[2, 1].set(1.0)
    d = jax.tree.map(jnp.zeros_like, params)
    d["materials"] = d["materials"].replace(kd=v)
    _check_fd(loss, params, d, 1e-3, 3e-2)


@pytest.mark.parametrize("occluder", ["cylinder", "cone", "circle"])
def test_soft_visibility_grad_quadrics(occluder):
    """Cylinder/cone/circle occluders get smooth boundary gradients too
    (VERDICT r2 weak #9: these used to be hard 0/1 fallbacks, silently
    losing the property -soft_vis promises)."""
    beta, res = 0.08, 24
    extra = {}
    if occluder == "cylinder":
        extra["cylinders_np"] = dict(p0=[[0.0, 0.25, 0.0]],
                                     p1=[[0.0, 1.0, 0.0]],
                                     radius=[0.3], mat=[0])
    elif occluder == "cone":
        # floated above the floor so the light-magnified shadow ring is
        # visible around the cone from the top-down camera
        extra["cones_np"] = dict(p0=[[0.0, 0.8, 0.0]],
                                 p1=[[0.0, 1.4, 0.0]],
                                 radius=[0.3], mat=[0])
    else:
        extra["circles_np"] = dict(center=[[0.0, 0.8, 0.0]],
                                   normal=[[0.0, 1.0, 0.0]],
                                   radius=[0.4], mat=[0])
    scene = _mini_scene(tris_np=_FLOOR, lights_np=_POINT_LIGHT, **extra)

    hard = np.asarray(_render_flat(scene, _direct_cfg(res)))
    soft = np.asarray(_render_flat(
        scene, _direct_cfg(res, vis_softness=beta)))
    mask = (hard.sum(-1) == 0.0) & (soft.sum(-1) > 1e-5)
    assert mask.sum() >= 5, f"penumbra band too thin: {mask.sum()} px"
    mask = jnp.asarray(mask.astype(np.float32))[:, None]

    cfg = _direct_cfg(res, vis_softness=beta)

    def loss(params):
        img = _render_flat(apply_params(scene, params), cfg)
        return jnp.sum(img * mask)

    params = diff_params(scene)
    got_nonzero = False
    for axis in (0, 2):
        d = _dir_like(params,
                      light_position=jnp.zeros((1, 3)).at[0, axis].set(1.0))
        ad, fd = _check_fd(loss, params, d, 2e-3, 6e-2,
                           expect_nonzero=False)
        got_nonzero = got_nonzero or abs(ad) > 1e-4
    assert got_nonzero, "visibility gradient vanished for all axes"
