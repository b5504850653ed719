"""PLY and OBJ mesh readers.

The reference reads meshes through `R3Scene::ReadFile`, which dispatches on
extension (.scn/.obj/.off/.ply, R3Scene.cpp:515-560): .off/.ply go through
`R3Mesh` (ply.cpp for the PLY variants), .obj through `ReadObjFile`
(R3Scene.cpp:1127+).  Here each reader returns flat numpy arrays
(vertices [V,3] float64, faces [F,3] int64); polygons are fan-triangulated.

PLY supports ascii 1.0 and binary_{little,big}_endian 1.0 with arbitrary
vertex properties (x/y/z extracted by name) and a `vertex_indices` /
`vertex_index` list property on faces, which covers the files `ply.cpp`
handles in practice.
"""

from __future__ import annotations

import struct

import numpy as np

_PLY_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read an ascii or binary PLY file -> (vertices [V,3], faces [F,3])."""
    with open(path, "rb") as f:
        data = f.read()

    end = data.find(b"end_header")
    if end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    end = data.find(b"\n", end) + 1
    header = data[:end].decode("ascii", errors="replace").splitlines()
    body = data[end:]

    fmt = None
    elements: list[tuple[str, int, list]] = []  # (name, count, props)
    for line in header:
        tok = line.strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == "property" and elements:
            if tok[1] == "list":
                # ("list", count_type, elem_type, name)
                elements[-1][2].append(("list", tok[2], tok[3], tok[4]))
            else:
                # ("scalar", name, type)
                elements[-1][2].append(("scalar", tok[2], tok[1]))

    if fmt == "ascii":
        return _ply_ascii(body, elements)
    if fmt in ("binary_little_endian", "binary_big_endian"):
        endian = "<" if fmt == "binary_little_endian" else ">"
        return _ply_binary(body, elements, endian)
    raise ValueError(f"{path}: unsupported PLY format {fmt!r}")


def _face_prop_name(name: str) -> bool:
    return name in ("vertex_indices", "vertex_index")


def _ply_ascii(body: bytes, elements) -> tuple[np.ndarray, np.ndarray]:
    tokens = body.decode("ascii", errors="replace").split()
    pos = 0
    verts = None
    faces: list[tuple[int, int, int]] = []
    for name, count, props in elements:
        if name == "vertex":
            ncol = len(props)
            cols = {p[1]: i for i, p in enumerate(props) if p[0] == "scalar"}
            arr = np.array(tokens[pos:pos + count * ncol],
                           np.float64).reshape(count, ncol)
            pos += count * ncol
            verts = arr[:, [cols["x"], cols["y"], cols["z"]]]
        elif name == "face":
            for _ in range(count):
                for p in props:
                    if p[0] == "list":
                        k = int(tokens[pos]); pos += 1
                        idx = [int(t) for t in tokens[pos:pos + k]]
                        pos += k
                        if _face_prop_name(p[3]):
                            for j in range(1, k - 1):
                                faces.append((idx[0], idx[j], idx[j + 1]))
                    else:
                        pos += 1
        else:  # skip unknown element (no lists assumed)
            pos += count * len(props)
    if verts is None:
        raise ValueError("PLY file has no vertex element")
    return verts, np.asarray(faces, np.int64).reshape(-1, 3)


def _ply_binary(body: bytes, elements, endian) -> tuple[np.ndarray, np.ndarray]:
    off = 0
    verts = None
    faces: list[tuple[int, int, int]] = []
    for name, count, props in elements:
        if (name == "vertex"
                and all(p[0] == "scalar" for p in props)):
            dt = np.dtype([(p[1], endian + _PLY_TYPES[p[2]]) for p in props])
            arr = np.frombuffer(body, dt, count, off)
            off += dt.itemsize * count
            verts = np.stack([arr["x"], arr["y"], arr["z"]],
                             axis=1).astype(np.float64)
            continue
        for _ in range(count):
            for p in props:
                if p[0] == "list":
                    cdt = endian + _PLY_TYPES[p[1]]
                    k = int(np.frombuffer(body, cdt, 1, off)[0])
                    off += np.dtype(cdt).itemsize
                    idt = np.dtype(endian + _PLY_TYPES[p[2]])
                    idx = np.frombuffer(body, idt, k, off).astype(np.int64)
                    off += idt.itemsize * k
                    if name == "face" and _face_prop_name(p[3]):
                        for j in range(1, k - 1):
                            faces.append((idx[0], idx[j], idx[j + 1]))
                else:
                    off += np.dtype(_PLY_TYPES[p[2]]).itemsize
    if verts is None:
        raise ValueError("PLY file has no vertex element")
    return verts, np.asarray(faces, np.int64).reshape(-1, 3)


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Write a binary little-endian PLY (round-trip/test helper)."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(verts.astype("<f4").tobytes())
        for tri in faces:
            f.write(struct.pack("<B3i", 3, *tri))


def read_obj(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read a Wavefront OBJ -> (vertices [V,3], faces [F,3], group [F]).

    Mirrors what the reference's `ReadObj` consumes (R3Scene.cpp:1127+):
    `v` positions and `f` faces (1-based, negative-relative allowed;
    `v/vt/vn` slash syntax stripped).  `usemtl` boundaries are returned as
    an integer group id per face so callers can assign materials; `vt`,
    `vn`, `mtllib` contents are skipped (the reference parses `.mtl` into
    R3Material but the renderer never samples textures, README.md:127).
    """
    verts: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    groups: list[int] = []
    group = 0
    seen_usemtl: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            tok = line.split("#", 1)[0].split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif tok[0] == "usemtl":
                name = tok[1] if len(tok) > 1 else ""
                group = seen_usemtl.setdefault(name, len(seen_usemtl))
            elif tok[0] == "f":
                idx = []
                for t in tok[1:]:
                    v = t.split("/")[0]
                    i = int(v)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for j in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[j], idx[j + 1]))
                    groups.append(group)
    return (np.asarray(verts, np.float64).reshape(-1, 3),
            np.asarray(faces, np.int64).reshape(-1, 3),
            np.asarray(groups, np.int64))


def read_mtl(path: str) -> dict[str, dict]:
    """Parse a Wavefront .mtl file into material dicts keyed by name.

    Mirrors the reference `ReadObjMtlFile` (R3Scene.cpp:699-889): Ka/Kd/Ks
    RGB, Ns shininess, Ni index of refraction, `d` opacity (transmission =
    1-d, R3Brdf::SetOpacity) and `Tr` transparency (transmission = Tr);
    `map_Kd` textures are parsed-and-unused, like the reference renderer
    (README.md:127)."""
    mats: dict[str, dict] = {}
    cur: dict | None = None
    with open(path) as f:
        for line in f:
            tok = line.split("#", 1)[0].split()
            if not tok:
                continue
            kw = tok[0]
            if kw == "newmtl":
                name = tok[1] if len(tok) > 1 else ""
                cur = dict(ka=np.zeros(3), kd=np.zeros(3), ks=np.zeros(3),
                           kt=np.zeros(3), emission=np.zeros(3),
                           shininess=0.2, ir=1.0)
                mats[name] = cur
            elif cur is None:
                continue
            elif kw in ("Ka", "Kd", "Ks") and len(tok) >= 4:
                cur[{"Ka": "ka", "Kd": "kd", "Ks": "ks"}[kw]] = np.asarray(
                    [float(tok[1]), float(tok[2]), float(tok[3])])
            elif kw == "Ns" and len(tok) >= 2:
                cur["shininess"] = float(tok[1])
            elif kw == "Ni" and len(tok) >= 2:
                cur["ir"] = float(tok[1])
            elif kw == "d" and len(tok) >= 2:
                cur["kt"] = np.full(3, 1.0 - float(tok[1]))
            elif kw == "Tr" and len(tok) >= 2:
                cur["kt"] = np.full(3, float(tok[1]))
    return mats


def read_obj_scene(path: str):
    """OBJ + MTL -> (verts [V,3], faces [F,3], face_mat [F], materials).

    The reference's `ReadObjFile` path (R3Scene.cpp:890-1130): `mtllib`
    files are parsed relative to the OBJ's directory, `usemtl` selects the
    active material per face.  `materials` is a list of material dicts in
    group-id order; faces before any `usemtl` (or naming an unknown
    material) get id -1 (caller's default material)."""
    import os

    verts: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    face_mat: list[int] = []
    mtl_by_name: dict[str, dict] = {}
    group_ids: dict[str, int] = {}
    materials: list[dict] = []
    cur = -1
    dirname = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        for line in f:
            tok = line.split("#", 1)[0].split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif tok[0] == "mtllib":
                for name in tok[1:]:
                    p = os.path.join(dirname, name)
                    if os.path.exists(p):
                        mtl_by_name.update(read_mtl(p))
            elif tok[0] == "usemtl":
                name = tok[1] if len(tok) > 1 else ""
                if name not in mtl_by_name:
                    cur = -1
                elif name in group_ids:
                    cur = group_ids[name]
                else:
                    cur = group_ids.setdefault(name, len(materials))
                    materials.append(mtl_by_name[name])
            elif tok[0] == "f":
                idx = []
                for t in tok[1:]:
                    v = t.split("/")[0]
                    i = int(v)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for j in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[j], idx[j + 1]))
                    face_mat.append(cur)
    return (np.asarray(verts, np.float64).reshape(-1, 3),
            np.asarray(faces, np.int64).reshape(-1, 3),
            np.asarray(face_mat, np.int64),
            materials)


def read_mesh(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Extension-dispatched mesh read (.off/.ply/.obj), the `R3Mesh::ReadFile`
    analogue used by the `.scn` `mesh` command and standalone mesh scenes."""
    low = path.lower()
    if low.endswith(".off"):
        from .off import read_off
        return read_off(path)
    if low.endswith(".ply"):
        return read_ply(path)
    if low.endswith(".obj"):
        v, f, _ = read_obj(path)
        return v, f
    raise ValueError(f"unsupported mesh format: {path}")
