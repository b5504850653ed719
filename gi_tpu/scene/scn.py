"""Princeton `.scn` scene compiler.

Parses the same command surface as the reference parser `ReadPrinceton`
(R3Scene.cpp:1463-1955): tri, box, sphere, circle, cylinder, cone, mesh,
line, begin/end transform groups, material (ka kd ks kt e n ir tex),
dir_light, point_light, spot_light, area_light, rect_light, camera,
include, background, ambient — plus the `-real` energy normalization
(R3Scene.cpp:1742-1755).

Unlike the reference (which keeps transforms on scene-graph nodes and
inverse-transforms rays at traversal time, R3SceneNode.cpp:446-458), we fold
the `begin/end` matrix stack into world space at load: triangles transform
exactly; analytic primitives stay analytic when the transform allows it
(similarity for spheres/cylinders/cones/circles, axis-aligned scale for
boxes) and are tessellated to triangles otherwise.  Normals for flattened
geometry are recomputed in world space, which matches the reference's
inverse-transpose normal semantics.
"""

from __future__ import annotations

import os
import numpy as np

from .off import read_off
from .types import (
    LIGHT_AREA, LIGHT_DIR, LIGHT_POINT, LIGHT_RECT, LIGHT_SPOT, Scene,
    build_scene,
)

# reference RN_BIG_EPSILON (double build, RNScalar.cpp:22) — `line` radius
RN_BIG_EPSILON = 1.0e-3


class _Builder:
    def __init__(self) -> None:
        self.tris_v = []       # list of (v0, v1, v2, mat)
        self.spheres = []      # (center, radius, mat)
        self.boxes = []        # (lo, hi, mat)
        self.cylinders = []    # (p0, p1, r, mat)
        self.cones = []        # (p0, p1, r, mat)
        self.circles = []      # (center, normal, r, mat)
        self.materials = []    # dict per material
        self.lights = []       # dict per light
        self.camera = None
        # reference R3Scene defaults: both black (R3Scene.cpp:36-37)
        self.ambient = np.array([0.0, 0.0, 0.0])
        self.background = np.array([0.0, 0.0, 0.0])

    # -- geometry helpers ------------------------------------------------
    def add_tri(self, p0, p1, p2, mat):
        self.tris_v.append((np.asarray(p0, float), np.asarray(p1, float),
                            np.asarray(p2, float), mat))


def _xform_point(M: np.ndarray, p: np.ndarray) -> np.ndarray:
    q = M @ np.append(p, 1.0)
    return q[:3] / q[3]


def _xform_vec(M: np.ndarray, v: np.ndarray) -> np.ndarray:
    return M[:3, :3] @ v


def _is_identity(M, tol=1e-12):
    return np.allclose(M, np.eye(4), atol=tol)


def _linear_part_kind(M: np.ndarray):
    """Classify M[:3,:3]: returns ("similarity", s) | ("diag", None) | ("general", None)."""
    A = M[:3, :3]
    AtA = A.T @ A
    s2 = np.trace(AtA) / 3.0
    if np.allclose(AtA, s2 * np.eye(3), rtol=1e-9, atol=1e-12 * max(s2, 1.0)):
        return "similarity", float(np.sqrt(s2))
    if np.allclose(A, np.diag(np.diag(A)), atol=1e-12):
        return "diag", None
    return "general", None


def _perp_span(n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Perpendicular basis, matching reference graphics_utils.cpp:174-178."""
    u = np.array([n[1], -n[0], 0.0])
    if 1.0 - abs(n[2]) < 0.1:
        u = np.array([n[2], 0.0, -n[0]])
    u /= np.linalg.norm(u)
    v = np.cross(u, n)
    v /= np.linalg.norm(v)
    return u, v


def _tess_sphere(b, M, c, r, mat, nsub=3):
    """Icosphere tessellation for spheres under non-similarity transforms."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], float)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts = list(verts)
    for _ in range(nsub):
        new_faces, cache = [], {}
        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]
        for (i, j, k) in faces:
            a, bb, cc = mid(i, j), mid(j, k), mid(k, i)
            new_faces += [(i, a, cc), (j, bb, a), (k, cc, bb), (a, bb, cc)]
        faces = new_faces
    for (i, j, k) in faces:
        p0 = _xform_point(M, c + r * verts[i])
        p1 = _xform_point(M, c + r * verts[j])
        p2 = _xform_point(M, c + r * verts[k])
        b.add_tri(p0, p1, p2, mat)


def _tess_disk(b, M, c, n, r, mat, nseg=64):
    u, v = _perp_span(n / np.linalg.norm(n))
    ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
    pts = [c + r * (np.cos(a) * u + np.sin(a) * v) for a in ang]
    cw = _xform_point(M, c)
    for i in range(nseg):
        b.add_tri(cw, _xform_point(M, pts[i]), _xform_point(M, pts[(i + 1) % nseg]), mat)


def _tess_cylinder(b, M, p0, p1, r, mat, nseg=64):
    axis = p1 - p0
    n = axis / np.linalg.norm(axis)
    u, v = _perp_span(n)
    ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
    ring = [r * (np.cos(a) * u + np.sin(a) * v) for a in ang]
    for i in range(nseg):
        a0, a1 = ring[i], ring[(i + 1) % nseg]
        q00, q01 = _xform_point(M, p0 + a0), _xform_point(M, p0 + a1)
        q10, q11 = _xform_point(M, p1 + a0), _xform_point(M, p1 + a1)
        b.add_tri(q00, q01, q11, mat)
        b.add_tri(q00, q11, q10, mat)
    _tess_disk(b, M, p0, -n, r, mat, nseg)
    _tess_disk(b, M, p1, n, r, mat, nseg)


def _tess_cone(b, M, p0, p1, r, mat, nseg=64):
    axis = p1 - p0
    n = axis / np.linalg.norm(axis)
    u, v = _perp_span(n)
    ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
    apex = _xform_point(M, p1)
    ring = [_xform_point(M, p0 + r * (np.cos(a) * u + np.sin(a) * v)) for a in ang]
    for i in range(nseg):
        b.add_tri(ring[i], ring[(i + 1) % nseg], apex, mat)
    _tess_disk(b, M, p0, -n, r, mat, nseg)


def _add_box(b, M, lo, hi, mat):
    kind, _ = _linear_part_kind(M)
    if _is_identity(M):
        b.boxes.append((lo, hi, mat))
        return
    if kind == "diag":
        q0, q1 = _xform_point(M, lo), _xform_point(M, hi)
        b.boxes.append((np.minimum(q0, q1), np.maximum(q0, q1), mat))
        return
    # General transform: 12 triangles (outward-facing windings)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    c = lambda x, y, z: _xform_point(M, np.array([x, y, z], float))
    v = [c(x0, y0, z0), c(x1, y0, z0), c(x1, y1, z0), c(x0, y1, z0),
         c(x0, y0, z1), c(x1, y0, z1), c(x1, y1, z1), c(x0, y1, z1)]
    quads = [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
             (2, 3, 7, 6), (1, 2, 6, 5), (0, 4, 7, 3)]
    for (i, j, k, l) in quads:
        b.add_tri(v[i], v[j], v[k], mat)
        b.add_tri(v[i], v[k], v[l], mat)


_DEFAULT_MATERIAL = dict(
    # reference R3default_brdf (R3Brdf.cpp:14-16)
    ka=np.array([0.2, 0.2, 0.2]), kd=np.array([0.8, 0.8, 0.8]),
    ks=np.zeros(3), kt=np.zeros(3), emission=np.zeros(3),
    shininess=0.2, ir=1.0,
)


def _parse_file(b: _Builder, path: str, real_material: bool,
                base_node_M: np.ndarray) -> None:
    with open(path) as f:
        text = f.read()
    # Strip comments: '#' token eats the rest of its line
    # (reference reads token-wise; '#' only starts a comment at token start)
    tokens: list[str] = []
    for line in text.splitlines():
        out_toks = []
        for tok in line.split():
            if tok.startswith("#"):
                break
            out_toks.append(tok)
        tokens.extend(out_toks)

    it = iter(tokens)
    # Transform/material group stack (reference max depth 1024)
    stack: list[tuple[np.ndarray, int | None]] = [(base_node_M, None)]

    def getf() -> float:
        return float(next(it))

    def geti() -> int:
        return int(next(it))

    def getv3() -> np.ndarray:
        return np.array([getf(), getf(), getf()])

    def mat_id(m: int) -> int:
        if m >= 0:
            if m >= len(b.materials):
                raise ValueError(f"Invalid material id {m} in {path}")
            return m
        inherited = stack[-1][1]
        if inherited is not None:
            return inherited
        return -1  # default material slot (resolved in compile())

    for cmd in it:
        M = stack[-1][0]
        if cmd == "tri":
            m = geti()
            p0, p1, p2 = getv3(), getv3(), getv3()
            b.add_tri(_xform_point(M, p0), _xform_point(M, p1),
                      _xform_point(M, p2), mat_id(m))
        elif cmd == "box":
            m = geti()
            p0, p1 = getv3(), getv3()
            lo, hi = np.minimum(p0, p1), np.maximum(p0, p1)
            _add_box(b, M, lo, hi, mat_id(m))
        elif cmd == "sphere":
            m = geti()
            c, r = getv3(), getf()
            kind, s = _linear_part_kind(M)
            if kind == "similarity":
                b.spheres.append((_xform_point(M, c), r * s, mat_id(m)))
            else:
                _tess_sphere(b, M, c, r, mat_id(m))
        elif cmd == "circle":
            m = geti()
            c, d, r = getv3(), getv3(), getf()
            d /= np.linalg.norm(d)
            kind, s = _linear_part_kind(M)
            if kind == "similarity":
                nw = _xform_vec(M, d)
                nw /= np.linalg.norm(nw)
                b.circles.append((_xform_point(M, c), nw, r * s, mat_id(m)))
            else:
                _tess_disk(b, M, c, d, r, mat_id(m))
        elif cmd in ("cylinder", "cone"):
            m = geti()
            c, r, h = getv3(), getf(), getf()
            # reference: axis along +y, centered at c (R3Scene.cpp:1600-1626)
            p0 = c - np.array([0.0, 0.5 * h, 0.0])
            p1 = c + np.array([0.0, 0.5 * h, 0.0])
            kind, s = _linear_part_kind(M)
            tgt = b.cylinders if cmd == "cylinder" else b.cones
            if kind == "similarity":
                tgt.append((_xform_point(M, p0), _xform_point(M, p1),
                            r * s, mat_id(m)))
            elif cmd == "cylinder":
                _tess_cylinder(b, M, p0, p1, r, mat_id(m))
            else:
                _tess_cone(b, M, p0, p1, r, mat_id(m))
        elif cmd == "line":
            m = geti()
            p0, p1 = getv3(), getv3()
            kind, s = _linear_part_kind(M)
            if kind == "similarity":
                b.cylinders.append((_xform_point(M, p0), _xform_point(M, p1),
                                    RN_BIG_EPSILON * s, mat_id(m)))
            else:
                _tess_cylinder(b, M, p0, p1, RN_BIG_EPSILON, mat_id(m), nseg=8)
        elif cmd == "mesh":
            m = geti()
            name = next(it)
            mpath = os.path.join(os.path.dirname(path), name)
            from .mesh_io import read_mesh
            verts, faces = read_mesh(mpath)
            mid = mat_id(m)
            if not _is_identity(M):
                verts = np.array([_xform_point(M, v) for v in verts])
            for (i, j, k) in faces:
                b.add_tri(verts[i], verts[j], verts[k], mid)
        elif cmd == "begin":
            m = geti()
            mx = np.array([getf() for _ in range(16)]).reshape(4, 4)
            mat = stack[-1][1]
            if m >= 0:
                mat = m if m < len(b.materials) else None
            stack.append((M @ mx, mat))
        elif cmd == "end":
            if len(stack) <= 1:
                raise ValueError(f"Extra end statement in {path}")
            stack.pop()
        elif cmd == "material":
            ka, kd, ks, kt, e = getv3(), getv3(), getv3(), getv3(), getv3()
            n, ir = getf(), getf()
            tex = next(it)  # texture parsed but unused by renderer (README.md:127)
            if real_material:
                total = kd + ks + kt
                max_val = max(1.0, float(total.max()))
                if max_val > 1.0:
                    kd, ks, kt = kd / max_val, ks / max_val, kt / max_val
            b.materials.append(dict(ka=ka, kd=kd, ks=ks, kt=kt, emission=e,
                                    shininess=n, ir=ir, texture=tex))
        elif cmd == "dir_light":
            c, d = getv3(), getv3()
            d /= np.linalg.norm(d)
            b.lights.append(dict(kind=LIGHT_DIR, color=c, direction=d))
        elif cmd == "point_light":
            c, p = getv3(), getv3()
            ca, la, qa = getf(), getf(), getf()
            b.lights.append(dict(kind=LIGHT_POINT, color=c, position=p,
                                 ca=ca, la=la, qa=qa))
        elif cmd == "spot_light":
            c, p, d = getv3(), getv3(), getv3()
            ca, la, qa, sc, sd = getf(), getf(), getf(), getf(), getf()
            d /= np.linalg.norm(d)
            # parser order: sc=cutoff, sd=dropoff (R3Scene.cpp:1826-1836:
            # R3SpotLight(p, d, c, dropoff=sd, cutoff=sc, ...))
            b.lights.append(dict(kind=LIGHT_SPOT, color=c, position=p,
                                 direction=d, ca=ca, la=la, qa=qa,
                                 cutoff=sc, dropoff=sd))
        elif cmd == "area_light":
            c, p, d = getv3(), getv3(), getv3()
            r, ca, la, qa = getf(), getf(), getf(), getf()
            d /= np.linalg.norm(d)
            b.lights.append(dict(kind=LIGHT_AREA, color=c, position=p,
                                 direction=d, radius=r, ca=ca, la=la, qa=qa))
        elif cmd == "rect_light":
            c, p, a1, a2 = getv3(), getv3(), getv3(), getv3()
            l1, l2 = getf(), getf()
            ca, la, qa = getf(), getf(), getf()
            a1 /= np.linalg.norm(a1)
            a2 /= np.linalg.norm(a2)
            d = np.cross(a1, a2)
            d /= np.linalg.norm(d)
            b.lights.append(dict(kind=LIGHT_RECT, color=c, position=p,
                                 direction=d, axis1=a1, axis2=a2,
                                 len1=l1, len2=l2, ca=ca, la=la, qa=qa))
        elif cmd == "camera":
            e, t, u = getv3(), getv3(), getv3()
            xfov, neardist, fardist = getf(), getf(), getf()
            t = t / np.linalg.norm(t)
            right = np.cross(t, u)
            right /= np.linalg.norm(right)
            u = np.cross(right, t)
            u /= np.linalg.norm(u)
            b.camera = dict(eye=e, towards=t, up=u, right=right,
                            xfov=xfov, yfov=xfov, neardist=neardist,
                            fardist=fardist)
        elif cmd == "include":
            name = next(it)
            _parse_file(b, os.path.join(os.path.dirname(path), name),
                        real_material, M)
        elif cmd == "background":
            b.background = getv3()
        elif cmd == "ambient":
            b.ambient = getv3()
        else:
            raise ValueError(f"Unrecognized command in {path}: {cmd}")


def load_scene(path: str, real_material: bool = False) -> Scene:
    """Compile a scene file into a device Scene pytree.

    Extension-dispatched like the reference `R3Scene::ReadFile`
    (R3Scene.cpp:515-560): `.scn` parses the Princeton command surface;
    bare meshes (`.off`/`.ply`/`.obj`) become a default-lit scene (white
    diffuse material, a point light at the eye, and a camera fitted to the
    mesh bbox — the reference's default-camera behavior, R3Camera.cpp:15)."""
    low = path.lower()
    if low.endswith((".off", ".ply", ".obj")):
        return load_mesh_scene(path)
    if not low.endswith(".scn"):
        # mirror the reference's "unrecognized extension" diagnostic
        # (R3Scene.cpp:552-556) instead of misparsing as .scn
        raise ValueError(
            f"Unable to read file {path} (unrecognized extension; "
            "expected .scn, .off, .ply, or .obj)")
    b = _Builder()
    _parse_file(b, path, real_material, np.eye(4))
    return compile_scene(b)


def load_mesh_scene(path: str) -> Scene:
    """Build a renderable scene around a bare mesh file.  OBJ files with
    `mtllib`/`usemtl` get their parsed materials (reference `ReadObjFile`,
    R3Scene.cpp:890-1130); faces without one use the default gray."""
    from .mesh_io import read_mesh, read_obj_scene

    b = _Builder()
    default_mat = dict(
        _DEFAULT_MATERIAL,
        kd=np.array([0.7, 0.7, 0.7]), ka=np.array([0.1, 0.1, 0.1]))
    if path.lower().endswith(".obj"):
        verts, faces, face_mat, materials = read_obj_scene(path)
        b.materials.append(default_mat)
        base = len(b.materials)
        for m in materials:
            b.materials.append(dict(_DEFAULT_MATERIAL, **m))
        for (i, j, k), g in zip(faces, face_mat):
            b.add_tri(verts[i], verts[j], verts[k],
                      0 if g < 0 else base + int(g))
    else:
        verts, faces = read_mesh(path)
        b.materials.append(default_mat)
        for (i, j, k) in faces:
            b.add_tri(verts[i], verts[j], verts[k], 0)

    lo, hi = verts.min(axis=0), verts.max(axis=0)
    center = 0.5 * (lo + hi)
    radius = max(float(np.linalg.norm(hi - lo)) * 0.5, 1e-3)
    eye = center + np.array([0.0, 0.0, 2.5 * radius])
    towards = np.array([0.0, 0.0, -1.0])
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(towards, up)
    b.camera = dict(eye=eye, towards=towards, up=up, right=right,
                    xfov=0.5, yfov=0.5, neardist=0.01 * radius,
                    fardist=100.0 * radius)
    b.lights.append(dict(kind=LIGHT_POINT, color=np.ones(3), position=eye,
                         ca=1.0, la=0.0, qa=0.0))
    b.ambient = np.array([0.1, 0.1, 0.1])
    return compile_scene(b)


def compile_scene(b: _Builder) -> Scene:
    # Default material gets the last slot; -1 ids remap to it
    mats = b.materials + [dict(_DEFAULT_MATERIAL, texture="0")]
    default_id = len(mats) - 1

    def fix(m):
        return default_id if m < 0 else m

    def pack_tris():
        if not b.tris_v:
            z = np.zeros((0, 3))
            return dict(v0=z, e1=z, e2=z, normal=z, mat=np.zeros(0))
        v0 = np.stack([t[0] for t in b.tris_v])
        v1 = np.stack([t[1] for t in b.tris_v])
        v2 = np.stack([t[2] for t in b.tris_v])
        e1, e2 = v1 - v0, v2 - v0
        n = np.cross(e1, e2)
        ln = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.maximum(ln, 1e-30)
        return dict(v0=v0, e1=e1, e2=e2, normal=n,
                    mat=[fix(t[3]) for t in b.tris_v])

    def pack3(entries, names):
        if not entries:
            out = {}
            for nm in names:
                out[nm] = np.zeros((0, 3)) if nm in ("center", "normal", "lo", "hi", "p0", "p1") else np.zeros(0)
            out["mat"] = np.zeros(0)
            return out
        out = {}
        for i, nm in enumerate(names):
            vals = [e[i] for e in entries]
            out[nm] = np.stack(vals) if np.ndim(vals[0]) else np.array(vals)
        out["mat"] = [fix(e[-1]) for e in entries]
        return out

    materials = dict(
        ka=np.stack([m["ka"] for m in mats]),
        kd=np.stack([m["kd"] for m in mats]),
        ks=np.stack([m["ks"] for m in mats]),
        kt=np.stack([m["kt"] for m in mats]),
        emission=np.stack([m["emission"] for m in mats]),
        shininess=np.array([m["shininess"] for m in mats]),
        ir=np.array([m["ir"] for m in mats]),
    )

    L = len(b.lights)
    lights = dict(
        kind=np.zeros(L), color=np.zeros((L, 3)), position=np.zeros((L, 3)),
        direction=np.zeros((L, 3)), radius=np.zeros(L),
        axis1=np.zeros((L, 3)), axis2=np.zeros((L, 3)),
        len1=np.zeros(L), len2=np.zeros(L),
        ca=np.ones(L), la=np.zeros(L), qa=np.zeros(L),
        cutoff=np.zeros(L), dropoff=np.zeros(L), intensity=np.ones(L),
    )
    for i, l in enumerate(b.lights):
        lights["kind"][i] = l["kind"]
        lights["color"][i] = l["color"]
        for key, field in (("position", "position"), ("direction", "direction"),
                           ("axis1", "axis1"), ("axis2", "axis2")):
            if key in l:
                lights[field][i] = l[key]
        for key in ("radius", "len1", "len2", "ca", "la", "qa",
                    "cutoff", "dropoff"):
            if key in l:
                lights[key][i] = l[key]

    if b.camera is None:
        # The reference replaces the default camera with a bbox-fitted one
        # after reading any scene file (R3Scene.cpp:558-566): towards
        # (0,0,-1), up (0,1,0), eye = center - 3*radius*towards, fov 0.25.
        pts = [np.asarray(v) for t in b.tris_v for v in t[:3]]
        for c, r, _ in b.spheres:
            pts += [np.asarray(c) - r, np.asarray(c) + r]
        for lo, hi, _ in b.boxes:
            pts += [np.asarray(lo), np.asarray(hi)]
        for p0, p1, r, _ in b.cylinders + b.cones:
            pts += [np.asarray(p0) - r, np.asarray(p0) + r,
                    np.asarray(p1) - r, np.asarray(p1) + r]
        for c, _n, r, _ in b.circles:
            pts += [np.asarray(c) - r, np.asarray(c) + r]
        if pts:
            allp = np.stack(pts)
            lo, hi = allp.min(axis=0), allp.max(axis=0)
        else:
            lo = hi = np.zeros(3)
        center = 0.5 * (lo + hi)
        radius = max(float(np.linalg.norm(hi - lo)) * 0.5, 1e-3)
        towards = np.array([0.0, 0.0, -1.0])
        up = np.array([0.0, 1.0, 0.0])
        b.camera = dict(eye=center - 3.0 * radius * towards,
                        towards=towards, up=up,
                        right=np.cross(towards, up),
                        xfov=0.25, yfov=0.25, neardist=0.01 * radius,
                        fardist=100.0 * radius)

    return build_scene(
        tris_np=pack_tris(),
        spheres_np=pack3(b.spheres, ["center", "radius"]),
        boxes_np=pack3(b.boxes, ["lo", "hi"]),
        cylinders_np=pack3(b.cylinders, ["p0", "p1", "radius"]),
        cones_np=pack3(b.cones, ["p0", "p1", "radius"]),
        circles_np=pack3(b.circles, ["center", "normal", "radius"]),
        materials_np=materials,
        lights_np=lights,
        camera_np=b.camera,
        ambient=b.ambient,
        background=b.background,
    )
