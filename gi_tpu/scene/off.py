"""OFF mesh reader (reference reads .off via R3Mesh, R3Scene.cpp:1360-1395).

Returns (vertices [V,3] float64, faces [F,3] int64); polygons with >3
vertices are fan-triangulated (the bundled meshes are all triangles).
"""

from __future__ import annotations

import numpy as np


def read_off(path: str) -> tuple[np.ndarray, np.ndarray]:
    with open(path) as f:
        tokens = []
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                tokens.extend(line.split())
    it = iter(tokens)
    first = next(it)
    if first == "OFF":
        nv, nf = int(next(it)), int(next(it))
    else:
        nv, nf = int(first), int(next(it))
    next(it)  # edge count, unused
    verts = np.empty((nv, 3), np.float64)
    for i in range(nv):
        verts[i, 0] = float(next(it))
        verts[i, 1] = float(next(it))
        verts[i, 2] = float(next(it))
    faces: list[tuple[int, int, int]] = []
    for _ in range(nf):
        k = int(next(it))
        idx = [int(next(it)) for _ in range(k)]
        for j in range(1, k - 1):
            faces.append((idx[0], idx[j], idx[j + 1]))
    return verts, np.asarray(faces, np.int64).reshape(-1, 3)
