"""Scene representation: flat SoA tensors compiled from the scene graph.

The reference keeps a scene graph (R3Scene/R3SceneNode, reference
R3Graphics/R3Scene.h:14-109) and intersects rays by recursive node traversal
with per-node inverse ray transforms (R3SceneNode.cpp:421-504).  TPU-first we
flatten everything at load time into world-space structure-of-arrays per
primitive type, so intersection is one batched kernel per type with static
shapes — no pointer chasing, no per-node transforms on the hot path.

Differentiable parameters (material table, light table, camera) live in
separate pytree leaves so `jax.grad` can flow into them without touching
geometry.
"""

from __future__ import annotations

import numpy as np
from flax import struct
import jax.numpy as jnp

# Light kinds (order matches the reference's five light classes,
# R3Graphics/R3Light.h and friends)
LIGHT_DIR, LIGHT_POINT, LIGHT_SPOT, LIGHT_AREA, LIGHT_RECT = 0, 1, 2, 3, 4


@struct.dataclass
class Triangles:
    """Triangle soup, world space.  Covers `tri`, `mesh`, tessellated prims."""
    v0: jnp.ndarray      # [N,3]
    e1: jnp.ndarray      # [N,3] = v1 - v0
    e2: jnp.ndarray      # [N,3] = v2 - v0
    normal: jnp.ndarray  # [N,3] unit geometric normal (right-hand of e1,e2)
    mat: jnp.ndarray     # [N] int32


@struct.dataclass
class Spheres:
    center: jnp.ndarray  # [N,3]
    radius: jnp.ndarray  # [N]
    mat: jnp.ndarray     # [N]


@struct.dataclass
class Boxes:
    """Axis-aligned boxes (reference R3Box).  Rotated boxes are tessellated."""
    lo: jnp.ndarray      # [N,3]
    hi: jnp.ndarray      # [N,3]
    mat: jnp.ndarray     # [N]


@struct.dataclass
class Cylinders:
    """Capped cylinder from p0 to p1 with radius r (reference R3Cylinder)."""
    p0: jnp.ndarray      # [N,3]
    p1: jnp.ndarray      # [N,3]
    radius: jnp.ndarray  # [N]
    mat: jnp.ndarray     # [N]


@struct.dataclass
class Cones:
    """Cone: base disk center p0 radius r, apex p1 (reference R3Cone)."""
    p0: jnp.ndarray
    p1: jnp.ndarray
    radius: jnp.ndarray
    mat: jnp.ndarray


@struct.dataclass
class Circles:
    """Flat disk (reference R3Circle): center, unit normal, radius."""
    center: jnp.ndarray
    normal: jnp.ndarray
    radius: jnp.ndarray
    mat: jnp.ndarray


@struct.dataclass
class Materials:
    """Phong BRDF table (reference R3Brdf.h:14): ka kd ks kt e n ir."""
    ka: jnp.ndarray   # [M,3]
    kd: jnp.ndarray   # [M,3]
    ks: jnp.ndarray   # [M,3]
    kt: jnp.ndarray   # [M,3]
    emission: jnp.ndarray  # [M,3]
    shininess: jnp.ndarray  # [M]
    ir: jnp.ndarray   # [M] index of refraction


@struct.dataclass
class Lights:
    """Unified table for the five reference light classes.

    Fields unused by a kind are zero.  `axis1/axis2` are the *unit* axes for
    rect lights (parser normalizes, R3Scene.cpp:1874-1875); area/dir lights
    derive their disk-spanning axes at trace time from `direction` with the
    same perpendicular-vector convention as reference graphics_utils.

    `kind` is static metadata (tuple of ints): light types select which
    shading branch is traced, so they must be compile-time constants.
    """
    kind: tuple = struct.field(pytree_node=False)  # len L, ints
    color: jnp.ndarray      # [L,3]
    position: jnp.ndarray   # [L,3]
    direction: jnp.ndarray  # [L,3] unit
    radius: jnp.ndarray     # [L] area-light disk radius
    axis1: jnp.ndarray      # [L,3]
    axis2: jnp.ndarray      # [L,3]
    len1: jnp.ndarray       # [L]
    len2: jnp.ndarray       # [L]
    ca: jnp.ndarray         # [L] constant attenuation
    la: jnp.ndarray         # [L] linear attenuation
    qa: jnp.ndarray         # [L] quadratic attenuation
    cutoff: jnp.ndarray     # [L] spot cutoff angle (rad)
    dropoff: jnp.ndarray    # [L] spot drop-off rate
    intensity: jnp.ndarray  # [L] (parser always sets 1.0)


@struct.dataclass
class Camera:
    """Pinhole camera (reference R3Camera.h:28-39): XFOV/YFOV are half-angles."""
    eye: jnp.ndarray       # [3]
    towards: jnp.ndarray   # [3] unit
    up: jnp.ndarray        # [3] unit (orthonormalized)
    right: jnp.ndarray     # [3] unit = towards x up
    xfov: jnp.ndarray      # [] radians (half-angle)
    yfov: jnp.ndarray      # []
    neardist: jnp.ndarray  # []
    fardist: jnp.ndarray   # []


@struct.dataclass
class Scene:
    """Compiled scene: geometry + differentiable parameter tables."""
    tris: Triangles
    spheres: Spheres
    boxes: Boxes
    cylinders: Cylinders
    cones: Cones
    circles: Circles
    materials: Materials
    lights: Lights
    camera: Camera
    ambient: jnp.ndarray      # [3] scene ambient (RNRgb)
    background: jnp.ndarray   # [3]
    centroid: jnp.ndarray     # [3] bbox centroid
    radius: jnp.ndarray       # [] bbox diagonal radius (SCENE_RADIUS)

    @property
    def n_lights(self) -> int:
        return len(self.lights.kind)

    @property
    def n_prims(self) -> dict:
        return {
            "tris": self.tris.mat.shape[0],
            "spheres": self.spheres.mat.shape[0],
            "boxes": self.boxes.mat.shape[0],
            "cylinders": self.cylinders.mat.shape[0],
            "cones": self.cones.mat.shape[0],
            "circles": self.circles.mat.shape[0],
        }


def _np(x, dtype=np.float32):
    return np.asarray(x, dtype=dtype)


def build_scene(
    tris_np: dict, spheres_np: dict, boxes_np: dict, cylinders_np: dict,
    cones_np: dict, circles_np: dict, materials_np: dict, lights_np: dict,
    camera_np: dict, ambient, background,
) -> Scene:
    """Assemble a Scene pytree from host-side numpy dicts (see scene/scn.py).

    Triangles are reordered at compile time by binned-SAH BVH leaf traversal
    (native gi_bvh_build; depth-first leaf order clusters triangles far
    tighter than a raw Morton sort — ~2.3x smaller total chunk-bbox surface
    area on the 86k-tri violinBody mesh) so that consecutive chunks are
    spatially tight — the property the Pallas block-culled intersection
    kernel prunes on.  The reordering is invisible to callers: Hit carries
    material/normal, not triangle ids."""
    tv0 = _np(tris_np["v0"]).reshape(-1, 3)
    te1 = _np(tris_np["e1"]).reshape(-1, 3)
    te2 = _np(tris_np["e2"]).reshape(-1, 3)
    tnormal = _np(tris_np["normal"]).reshape(-1, 3)
    tmat = _np(tris_np["mat"], np.int32).reshape(-1)
    if tv0.shape[0] > 1:
        from ..native import bvh_build
        p1 = tv0 + te1
        p2 = tv0 + te2
        lo = np.minimum(np.minimum(tv0, p1), p2)
        hi = np.maximum(np.maximum(tv0, p1), p2)
        order = np.asarray(bvh_build(lo, hi, max_leaf=32).order, np.int64)
        tv0, te1, te2 = tv0[order], te1[order], te2[order]
        tnormal, tmat = tnormal[order], tmat[order]
    tris = Triangles(
        v0=jnp.asarray(tv0),
        e1=jnp.asarray(te1),
        e2=jnp.asarray(te2),
        normal=jnp.asarray(tnormal),
        mat=jnp.asarray(tmat),
    )
    spheres = Spheres(
        center=jnp.asarray(_np(spheres_np["center"]).reshape(-1, 3)),
        radius=jnp.asarray(_np(spheres_np["radius"]).reshape(-1)),
        mat=jnp.asarray(_np(spheres_np["mat"], np.int32).reshape(-1)),
    )
    boxes = Boxes(
        lo=jnp.asarray(_np(boxes_np["lo"]).reshape(-1, 3)),
        hi=jnp.asarray(_np(boxes_np["hi"]).reshape(-1, 3)),
        mat=jnp.asarray(_np(boxes_np["mat"], np.int32).reshape(-1)),
    )
    cylinders = Cylinders(
        p0=jnp.asarray(_np(cylinders_np["p0"]).reshape(-1, 3)),
        p1=jnp.asarray(_np(cylinders_np["p1"]).reshape(-1, 3)),
        radius=jnp.asarray(_np(cylinders_np["radius"]).reshape(-1)),
        mat=jnp.asarray(_np(cylinders_np["mat"], np.int32).reshape(-1)),
    )
    cones = Cones(
        p0=jnp.asarray(_np(cones_np["p0"]).reshape(-1, 3)),
        p1=jnp.asarray(_np(cones_np["p1"]).reshape(-1, 3)),
        radius=jnp.asarray(_np(cones_np["radius"]).reshape(-1)),
        mat=jnp.asarray(_np(cones_np["mat"], np.int32).reshape(-1)),
    )
    circles = Circles(
        center=jnp.asarray(_np(circles_np["center"]).reshape(-1, 3)),
        normal=jnp.asarray(_np(circles_np["normal"]).reshape(-1, 3)),
        radius=jnp.asarray(_np(circles_np["radius"]).reshape(-1)),
        mat=jnp.asarray(_np(circles_np["mat"], np.int32).reshape(-1)),
    )
    materials = Materials(
        ka=jnp.asarray(_np(materials_np["ka"]).reshape(-1, 3)),
        kd=jnp.asarray(_np(materials_np["kd"]).reshape(-1, 3)),
        ks=jnp.asarray(_np(materials_np["ks"]).reshape(-1, 3)),
        kt=jnp.asarray(_np(materials_np["kt"]).reshape(-1, 3)),
        emission=jnp.asarray(_np(materials_np["emission"]).reshape(-1, 3)),
        shininess=jnp.asarray(_np(materials_np["shininess"]).reshape(-1)),
        ir=jnp.asarray(_np(materials_np["ir"]).reshape(-1)),
    )
    lights = Lights(
        kind=tuple(int(k) for k in _np(lights_np["kind"], np.int64).reshape(-1)),
        color=jnp.asarray(_np(lights_np["color"]).reshape(-1, 3)),
        position=jnp.asarray(_np(lights_np["position"]).reshape(-1, 3)),
        direction=jnp.asarray(_np(lights_np["direction"]).reshape(-1, 3)),
        radius=jnp.asarray(_np(lights_np["radius"]).reshape(-1)),
        axis1=jnp.asarray(_np(lights_np["axis1"]).reshape(-1, 3)),
        axis2=jnp.asarray(_np(lights_np["axis2"]).reshape(-1, 3)),
        len1=jnp.asarray(_np(lights_np["len1"]).reshape(-1)),
        len2=jnp.asarray(_np(lights_np["len2"]).reshape(-1)),
        ca=jnp.asarray(_np(lights_np["ca"]).reshape(-1)),
        la=jnp.asarray(_np(lights_np["la"]).reshape(-1)),
        qa=jnp.asarray(_np(lights_np["qa"]).reshape(-1)),
        cutoff=jnp.asarray(_np(lights_np["cutoff"]).reshape(-1)),
        dropoff=jnp.asarray(_np(lights_np["dropoff"]).reshape(-1)),
        intensity=jnp.asarray(_np(lights_np["intensity"]).reshape(-1)),
    )
    camera = Camera(
        eye=jnp.asarray(_np(camera_np["eye"])),
        towards=jnp.asarray(_np(camera_np["towards"])),
        up=jnp.asarray(_np(camera_np["up"])),
        right=jnp.asarray(_np(camera_np["right"])),
        xfov=jnp.asarray(np.float32(camera_np["xfov"])),
        yfov=jnp.asarray(np.float32(camera_np["yfov"])),
        neardist=jnp.asarray(np.float32(camera_np["neardist"])),
        fardist=jnp.asarray(np.float32(camera_np["fardist"])),
    )

    # Scene bbox over all primitive types (for SCENE_RADIUS / centroid,
    # reference photonmap.cpp:455)
    mins, maxs = [], []
    def upd(pts):
        pts = np.asarray(pts, np.float64).reshape(-1, 3)
        if pts.size:
            mins.append(pts.min(axis=0))
            maxs.append(pts.max(axis=0))
    v0 = _np(tris_np["v0"]).reshape(-1, 3)
    upd(v0)
    upd(v0 + _np(tris_np["e1"]).reshape(-1, 3))
    upd(v0 + _np(tris_np["e2"]).reshape(-1, 3))
    if len(_np(spheres_np["radius"]).reshape(-1)):
        c = _np(spheres_np["center"]).reshape(-1, 3)
        r = _np(spheres_np["radius"]).reshape(-1, 1)
        upd(c - r); upd(c + r)
    upd(_np(boxes_np["lo"]).reshape(-1, 3)); upd(_np(boxes_np["hi"]).reshape(-1, 3))
    for d in (cylinders_np, cones_np):
        if len(_np(d["radius"]).reshape(-1)):
            r = _np(d["radius"]).reshape(-1, 1)
            upd(_np(d["p0"]).reshape(-1, 3) - r); upd(_np(d["p0"]).reshape(-1, 3) + r)
            upd(_np(d["p1"]).reshape(-1, 3) - r); upd(_np(d["p1"]).reshape(-1, 3) + r)
    if len(_np(circles_np["radius"]).reshape(-1)):
        c = _np(circles_np["center"]).reshape(-1, 3)
        r = _np(circles_np["radius"]).reshape(-1, 1)
        upd(c - r); upd(c + r)
    if mins:
        lo = np.min(np.stack(mins), axis=0)
        hi = np.max(np.stack(maxs), axis=0)
    else:
        lo = np.zeros(3); hi = np.zeros(3)
    centroid = (lo + hi) / 2.0
    radius = float(np.linalg.norm(hi - lo) / 2.0)

    return Scene(
        tris=tris, spheres=spheres, boxes=boxes, cylinders=cylinders,
        cones=cones, circles=circles, materials=materials, lights=lights,
        camera=camera,
        ambient=jnp.asarray(_np(ambient)),
        background=jnp.asarray(_np(background)),
        centroid=jnp.asarray(_np(centroid)),
        radius=jnp.asarray(np.float32(radius)),
    )
