"""Headless scene / photon-map / ray-path visualizer.

The reference ships an interactive OpenGL+GLUT viewer (visualize.cpp:1-1927)
that draws the scene, eye-ray fans (DrawRays :269), Monte Carlo paths
colored by pixel (DrawPaths :589), emitted photon vectors and stored
global/caustic photon clouds (DrawEmitted/DrawStoredGlobal/DrawStoredCaustic
:1339-1430), toggled by keys B/C/L/R/F/G/H/O/M/T (:1660-1737).

A TPU render node has no GL stack, so this module renders the same overlays
headlessly with matplotlib 3D and writes PNGs; every toggle becomes a CLI
flag of `python -m gi_tpu.visualize` (see visualize.py). Like the reference
viewer (which carries its own copies of the samplers, visualize.cpp:839),
the path overlay re-walks small ray batches on the host with the library's
own ops, recording vertices per bounce.
"""

from __future__ import annotations

import numpy as np

from .models.camera import eye_rays
from .ops import sampling as S
from .ops.intersect import intersect_scene
from .scene.types import (LIGHT_AREA, LIGHT_DIR, LIGHT_POINT, LIGHT_RECT,
                          LIGHT_SPOT, Scene)
from .utils.config import RenderConfig

_LIGHT_MARKS = {LIGHT_DIR: ("v", "orange"), LIGHT_POINT: ("*", "yellow"),
                LIGHT_SPOT: ("^", "orange"), LIGHT_AREA: ("o", "gold"),
                LIGHT_RECT: ("s", "gold")}


def _scene_bounds(scene: Scene):
    from .photon.trace import _scene_bbox
    return _scene_bbox(scene)


def _fig_ax():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    return fig, ax


def draw_scene(ax, scene: Scene, max_tris: int = 4000) -> None:
    """Scene geometry: triangle mesh (subsampled), analytic prims as
    markers, scene bbox wireframe, lights, camera (DrawShapes/DrawLights/
    DrawCamera/DrawBBoxes equivalents)."""
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    v0 = np.asarray(scene.tris.v0)
    if len(v0):
        e1 = np.asarray(scene.tris.e1)
        e2 = np.asarray(scene.tris.e2)
        step = max(1, len(v0) // max_tris)
        sel = slice(None, None, step)
        polys = np.stack([v0[sel], v0[sel] + e1[sel], v0[sel] + e2[sel]],
                         axis=1)
        ax.add_collection3d(Poly3DCollection(
            polys, alpha=0.25, facecolor="steelblue", edgecolor="none"))

    for arr, mark in ((np.asarray(scene.spheres.center), "o"),
                      (np.asarray(scene.circles.center), "D")):
        if len(arr):
            ax.scatter(arr[:, 0], arr[:, 1], arr[:, 2], marker=mark,
                       c="slategray", s=40)
    boxes = np.asarray(scene.boxes.lo)
    if len(boxes):
        hi = np.asarray(scene.boxes.hi)
        for lo_, hi_ in zip(boxes, hi):
            _draw_box(ax, lo_, hi_, "slategray")

    # scene bbox
    lo, hi = _scene_bounds(scene)
    _draw_box(ax, lo, hi, "dimgray")

    # lights
    kinds = scene.lights.kind
    pos = np.asarray(scene.lights.position)
    for i, k in enumerate(kinds):
        mark, color = _LIGHT_MARKS.get(int(k), ("*", "yellow"))
        ax.scatter(*pos[i], marker=mark, c=color, s=160,
                   edgecolor="black", zorder=5)

    # camera: eye + frustum edge rays
    cam = scene.camera
    eye = np.asarray(cam.eye)
    ax.scatter(*eye, marker="P", c="red", s=120, zorder=6)
    cfg = RenderConfig(width=2, height=2, aa=0)
    import jax
    idx = np.array([0, 1, 2, 3], np.int32)
    o, d = eye_rays(scene, cfg, jax.random.PRNGKey(0), idx, 2, 2, 1)
    d = np.asarray(d).reshape(-1, 3)
    L = float(np.asarray(scene.radius))
    for k in range(4):
        p = eye + d[k] * L
        ax.plot([eye[0], p[0]], [eye[1], p[1]], [eye[2], p[2]],
                c="red", lw=0.8, alpha=0.7)


def _draw_box(ax, lo, hi, color):
    import itertools
    corners = np.array(list(itertools.product(*zip(lo, hi))))
    edges = [(a, b) for a in range(8) for b in range(a + 1, 8)
             if bin(a ^ b).count("1") == 1]
    for a, b in edges:
        ax.plot(*zip(corners[a], corners[b]), c=color, lw=0.6, alpha=0.6)


def draw_photons(ax, grid, color: str, max_points: int = 50000,
                 label: str | None = None) -> None:
    """Stored photon cloud (DrawStoredGlobal/DrawStoredCaustic
    visualize.cpp:1363-1400)."""
    pos = np.asarray(grid.pos)[np.asarray(grid.valid)]
    step = max(1, len(pos) // max_points)
    pos = pos[::step]
    ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], s=0.3, c=color, alpha=0.45,
               label=label)


def draw_emitted(ax, scene: Scene, cfg: RenderConfig, n: int = 200,
                 seed: int = 0) -> None:
    """Emitted photon vectors at the lights (DrawEmitted
    visualize.cpp:1339-1360): first-segment direction of n emitted photons."""
    import jax
    from .photon.trace import _emit_from_light

    key = jax.random.PRNGKey(seed)
    per = max(1, n // max(scene.n_lights, 1))
    L = 0.25 * float(np.asarray(scene.radius))
    for i, kind in enumerate(scene.lights.kind):
        key, sub = jax.random.split(key)
        o, d = _emit_from_light(scene, i, int(kind), sub, per)
        o = np.asarray(o); d = np.asarray(d)
        for k in range(len(o)):
            q = o[k] + d[k] * L
            ax.plot([o[k, 0], q[0]], [o[k, 1], q[1]], [o[k, 2], q[2]],
                    c="gold", lw=0.5, alpha=0.6)


def record_paths(scene: Scene, cfg: RenderConfig, n_pixels: int = 32,
                 depth: int = 6, seed: int = 0):
    """Re-walk a few Monte Carlo paths on the host recording each vertex
    (DrawPaths visualize.cpp:589-837, which likewise duplicates the walk).
    Returns a list of [k,3] vertex arrays, one per path."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    sw, sh = cfg.width, cfg.height
    rng = np.random.default_rng(seed)
    pix = jnp.asarray(rng.integers(0, sw * sh, n_pixels, dtype=np.int32))
    key, k_eye = jax.random.split(key)
    o, d = eye_rays(scene, cfg, k_eye, pix, sw, sh, 1)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    B = n_pixels

    verts = [np.asarray(o)[:, None, :]]
    alive = np.ones(B, bool)
    eps = 1e-4 * float(np.asarray(scene.radius))
    mats = scene.materials
    for _ in range(depth):
        hit = intersect_scene(scene, o, d, t_min=0.0)
        pnt = np.asarray(hit.point)
        valid = np.asarray(hit.valid)
        verts.append(np.where((alive & valid)[:, None], pnt,
                              verts[-1][:, 0, :])[:, None, :])
        alive = alive & valid
        if not alive.any():
            break
        # diffuse/specular russian roulette (simplified viewer walk)
        kd = np.asarray(mats.kd[hit.mat]); ks = np.asarray(mats.ks[hit.mat])
        kt = np.asarray(mats.kt[hit.mat])
        p_d = kd.max(1); p_s = ks.max(1); p_t = kt.max(1)
        key, k_u, k_dir = jax.random.split(key, 3)
        u = np.asarray(jax.random.uniform(k_u, (B,)))
        view = S.normalize(jnp.asarray(pnt) - o)
        cos_t = S.dot(hit.normal, -view)
        u2 = jax.random.uniform(k_dir, (B, 2))
        take_d = u < p_d
        take_s = (~take_d) & (u < p_d + p_s + p_t)
        new_d = np.where(
            take_d[:, None],
            np.asarray(S.diffuse_importance_sample(
                hit.normal, cos_t, u2[:, 0], u2[:, 1])),
            np.asarray(S.reflective_bounce(hit.normal, view, cos_t)))
        alive = alive & (take_d | take_s)
        o = jnp.asarray(pnt + new_d * eps)
        d = jnp.asarray(new_d)
    vv = np.concatenate(verts, axis=1)  # [B, k, 3]
    return [vv[i] for i in range(B)]


def draw_paths(ax, paths) -> None:
    import matplotlib.cm as cm
    for i, p in enumerate(paths):
        c = cm.hsv(i / max(len(paths), 1))
        ax.plot(p[:, 0], p[:, 1], p[:, 2], c=c, lw=0.9, alpha=0.8)


def draw_sample_fan(ax, scene: Scene, cfg: RenderConfig, n: int = 128,
                    seed: int = 0) -> None:
    """Importance-sampling fan at the central pixel's hit (the reference's
    ray-fan figures, README.md figures 1-2 / DrawRays)."""
    import jax
    import jax.numpy as jnp

    sw, sh = cfg.width, cfg.height
    pix = jnp.asarray([sh // 2 * sw + sw // 2], jnp.int32)
    key = jax.random.PRNGKey(seed)
    o, d = eye_rays(scene, cfg, key, pix, sw, sh, 1)
    o = o.reshape(-1, 3); d = d.reshape(-1, 3)
    hit = intersect_scene(scene, o, d, t_min=0.0)
    if not bool(hit.valid[0]):
        return
    p = np.asarray(hit.point)[0]
    view = S.normalize(hit.point - o)
    cos_t = S.dot(hit.normal, -view)
    u = jax.random.uniform(key, (n, 2))
    dirs = np.asarray(S.diffuse_importance_sample(
        jnp.broadcast_to(hit.normal[0], (n, 3)),
        jnp.broadcast_to(cos_t[0], (n,)), u[:, 0], u[:, 1]))
    L = 0.3 * float(np.asarray(scene.radius))
    for k in range(n):
        q = p + dirs[k] * L
        ax.plot([p[0], q[0]], [p[1], q[1]], [p[2], q[2]],
                c="limegreen", lw=0.4, alpha=0.5)


def visualize(scene: Scene, cfg: RenderConfig, out_prefix: str,
              photon_maps=None, show_paths: int = 0, show_emitted: int = 0,
              show_fan: bool = False, seed: int = 0,
              views=((30, -60), (90, -90), (0, -90))) -> list[str]:
    """Compose overlays and write one PNG per view angle.
    Returns the written paths."""
    import matplotlib.pyplot as plt

    fig, ax = _fig_ax()
    draw_scene(ax, scene)
    if photon_maps is not None and photon_maps.global_ is not None:
        draw_photons(ax, photon_maps.global_, "royalblue", label="global")
    if photon_maps is not None and photon_maps.caustic is not None:
        draw_photons(ax, photon_maps.caustic, "crimson", label="caustic")
    if show_paths:
        draw_paths(ax, record_paths(scene, cfg, n_pixels=show_paths,
                                    seed=seed))
    if show_emitted:
        draw_emitted(ax, scene, cfg, n=show_emitted, seed=seed)
    if show_fan:
        draw_sample_fan(ax, scene, cfg, seed=seed)

    lo, hi = _scene_bounds(scene)
    c = 0.5 * (lo + hi); r = 0.6 * float((hi - lo).max())
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)

    written = []
    for elev, azim in views:
        ax.view_init(elev=elev, azim=azim)
        path = f"{out_prefix}_e{int(elev)}_a{int(azim)}.png"
        fig.savefig(path, dpi=110)
        written.append(path)
    plt.close(fig)
    return written
