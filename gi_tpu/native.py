"""ctypes bindings to the native host runtime (native/gi_native.cpp), with
pure-numpy fallbacks when the shared library is unavailable.

The reference's host runtime is C++ (kd-tree build R3Kdtree.cpp:23-120,
photon buffers photon_utils.cpp:19-65); here the TPU framework's host-side
equivalents — Morton ordering, binned-SAH BVH build, photon-map checkpoint
IO — are native C++ compiled on first use, while device compute stays in
JAX/Pallas.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgi_native.so")

_lib = None
_lib_lock = threading.Lock()
_tried = False


def _load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lib_lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO_PATH):
                src = os.path.join(_NATIVE_DIR, "gi_native.cpp")
                if not os.path.exists(src):
                    return None
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                     "-o", _SO_PATH, src],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO_PATH)
        except Exception:
            return None

        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")

        lib.gi_morton_order.argtypes = [f32p, ctypes.c_int64, u32p]
        lib.gi_morton_order.restype = None
        lib.gi_bvh_build.argtypes = [f32p, f32p, ctypes.c_int64,
                                     ctypes.c_int32, u32p, f32p, f32p,
                                     i32p, i32p, i32p]
        lib.gi_bvh_build.restype = ctypes.c_int64
        lib.gi_save_photons.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                        f32p, f32p, u16p]
        lib.gi_save_photons.restype = ctypes.c_int32
        lib.gi_photon_count.argtypes = [ctypes.c_char_p]
        lib.gi_photon_count.restype = ctypes.c_int64
        lib.gi_load_photons.argtypes = [ctypes.c_char_p, f32p, f32p, u16p]
        lib.gi_load_photons.restype = ctypes.c_int32
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Morton ordering
# ---------------------------------------------------------------------------

def _expand_bits10(v: np.ndarray) -> np.ndarray:
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def morton_codes(pts: np.ndarray) -> np.ndarray:
    """30-bit Morton codes of points quantized within their own bbox
    (numpy; shared by the fallback sorter and tests)."""
    pts = np.asarray(pts, np.float32).reshape(-1, 3)
    if len(pts) == 0:
        return np.zeros(0, np.uint32)
    lo = pts.min(axis=0)
    ext = pts.max(axis=0) - lo
    inv = np.where(ext > 0, 1.0 / np.where(ext == 0, 1, ext), 0.0)
    q = np.clip((pts - lo) * inv, 0.0, 1.0)
    q = (q * 1023.0).astype(np.uint32).astype(np.uint64)
    return ((_expand_bits10(q[:, 0]) << np.uint64(2))
            | (_expand_bits10(q[:, 1]) << np.uint64(1))
            | _expand_bits10(q[:, 2])).astype(np.uint32)


def morton_order(pts: np.ndarray) -> np.ndarray:
    """Permutation sorting points by Morton code. Native when available."""
    pts = np.ascontiguousarray(np.asarray(pts, np.float32).reshape(-1, 3))
    n = len(pts)
    if n == 0:
        return np.zeros(0, np.uint32)
    lib = _load()
    if lib is not None:
        out = np.empty(n, np.uint32)
        lib.gi_morton_order(pts, n, out)
        return out
    codes = morton_codes(pts)
    return np.argsort(codes, kind="stable").astype(np.uint32)


# ---------------------------------------------------------------------------
# BVH build
# ---------------------------------------------------------------------------

class BVH:
    """Flat DFS-preorder BVH (root = node 0).

    Internal node i: child ids (a[i], b[i]); leaf: prims
    order[a[i] : a[i]+b[i]]. The reference scene has no triangle BVH
    (linear scan, R3Isect.cpp:800-833) — this is the TPU framework's
    replacement accel structure.
    """

    def __init__(self, order, lo, hi, a, b, leaf):
        self.order = order
        self.lo = lo
        self.hi = hi
        self.a = a
        self.b = b
        self.leaf = leaf

    @property
    def n_nodes(self) -> int:
        return len(self.a)


def bvh_build(lo: np.ndarray, hi: np.ndarray, max_leaf: int = 64) -> BVH:
    """Binned-SAH BVH over prim bounds [n,3]. Falls back to a numpy
    median-split builder when the native library is unavailable."""
    lo = np.ascontiguousarray(np.asarray(lo, np.float32).reshape(-1, 3))
    hi = np.ascontiguousarray(np.asarray(hi, np.float32).reshape(-1, 3))
    n = len(lo)
    if n == 0:
        z3 = np.zeros((0, 3), np.float32)
        zi = np.zeros(0, np.int32)
        return BVH(np.zeros(0, np.uint32), z3, z3, zi, zi, zi)
    lib = _load()
    if lib is not None:
        cap = 2 * n
        order = np.empty(n, np.uint32)
        nlo = np.empty((cap, 3), np.float32)
        nhi = np.empty((cap, 3), np.float32)
        a = np.empty(cap, np.int32)
        b = np.empty(cap, np.int32)
        lf = np.empty(cap, np.int32)
        m = lib.gi_bvh_build(lo, hi, n, max_leaf, order, nlo, nhi, a, b, lf)
        if m > 0:
            return BVH(order, nlo[:m].copy(), nhi[:m].copy(),
                       a[:m].copy(), b[:m].copy(), lf[:m].copy())
    return _py_bvh_build(lo, hi, max_leaf)


def _py_bvh_build(lo: np.ndarray, hi: np.ndarray, max_leaf: int) -> BVH:
    """Median-split fallback builder (same output contract)."""
    n = len(lo)
    cent = 0.5 * (lo + hi)
    order = np.arange(n, dtype=np.uint32)
    nlo, nhi, na, nb, nleaf = [], [], [], [], []

    def build(beg: int, end: int) -> int:
        node = len(na)
        seg = order[beg:end]
        nlo.append(lo[seg].min(axis=0))
        nhi.append(hi[seg].max(axis=0))
        na.append(0)
        nb.append(0)
        nleaf.append(0)
        count = end - beg
        if count <= max_leaf:
            na[node], nb[node], nleaf[node] = beg, count, 1
            return node
        c = cent[seg]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        mid = count // 2
        part = np.argpartition(c[:, axis], mid)
        order[beg:end] = seg[part]
        l = build(beg, beg + mid)
        r = build(beg + mid, end)
        na[node], nb[node], nleaf[node] = l, r, 0
        return node

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        build(0, n)
    finally:
        sys.setrecursionlimit(old)
    return BVH(order, np.asarray(nlo, np.float32), np.asarray(nhi, np.float32),
               np.asarray(na, np.int32), np.asarray(nb, np.int32),
               np.asarray(nleaf, np.int32))


# ---------------------------------------------------------------------------
# Photon map checkpoint IO ("GIPM" v1; format defined in gi_native.cpp)
# ---------------------------------------------------------------------------

_MAGIC = b"GIPM"


def save_photons(path: str, pos: np.ndarray, power: np.ndarray,
                 dircode: np.ndarray) -> None:
    pos = np.ascontiguousarray(np.asarray(pos, np.float32).reshape(-1, 3))
    power = np.ascontiguousarray(np.asarray(power, np.float32).reshape(-1, 3))
    dircode = np.ascontiguousarray(np.asarray(dircode, np.uint16).ravel())
    n = len(pos)
    assert len(power) == n and len(dircode) == n
    lib = _load()
    if lib is not None:
        rc = lib.gi_save_photons(path.encode(), n, pos, power, dircode)
        if rc != 0:
            raise IOError(f"gi_save_photons({path}) failed: rc={rc}")
        return
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.uint32(1).tobytes())
        f.write(np.uint64(n).tobytes())
        f.write(pos.tobytes())
        f.write(power.tobytes())
        f.write(dircode.tobytes())


def load_photons(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    if lib is not None:
        n = lib.gi_photon_count(path.encode())
        if n < 0:
            raise IOError(f"gi_photon_count({path}) failed: rc={n}")
        pos = np.empty((n, 3), np.float32)
        power = np.empty((n, 3), np.float32)
        dircode = np.empty(n, np.uint16)
        rc = lib.gi_load_photons(path.encode(), pos, power, dircode)
        if rc != 0:
            raise IOError(f"gi_load_photons({path}) failed: rc={rc}")
        return pos, power, dircode
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise IOError(f"{path}: not a GIPM photon file")
        version = np.frombuffer(f.read(4), np.uint32)[0]
        if version != 1:
            raise IOError(f"{path}: unsupported GIPM version {version}")
        n = int(np.frombuffer(f.read(8), np.uint64)[0])
        pos = np.frombuffer(f.read(12 * n), np.float32).reshape(n, 3)
        power = np.frombuffer(f.read(12 * n), np.float32).reshape(n, 3)
        dircode = np.frombuffer(f.read(2 * n), np.uint16)
        return pos.copy(), power.copy(), dircode.copy()
