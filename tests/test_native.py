"""Native C++ host runtime (native/gi_native.cpp via gi_tpu.native):
Morton ordering, binned-SAH BVH invariants, photon checkpoint IO — and
equivalence between the native and numpy-fallback implementations."""

import numpy as np
import pytest

from gi_tpu import native


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(0)
    return rng.uniform(-3, 5, size=(4096, 3)).astype(np.float32)


def test_native_library_builds():
    """The C++ library must actually compile and load in this image."""
    assert native.have_native(), "libgi_native.so failed to build/load"


def test_morton_order_matches_codes(pts):
    order = native.morton_order(pts)
    assert sorted(order.tolist()) == list(range(len(pts)))
    codes = native.morton_codes(pts)
    sorted_codes = codes[order]
    assert np.all(sorted_codes[:-1] <= sorted_codes[1:])


def test_morton_order_clusters(pts):
    """Consecutive chunks after Morton ordering are spatially tighter than
    unordered chunks (the property the Pallas block-cull kernel relies on)."""
    order = native.morton_order(pts)
    chunk = 256

    def mean_chunk_volume(p):
        vols = []
        for s in range(0, len(p), chunk):
            seg = p[s:s + chunk]
            ext = seg.max(axis=0) - seg.min(axis=0)
            vols.append(float(np.prod(ext)))
        return np.mean(vols)

    assert mean_chunk_volume(pts[order]) < 0.25 * mean_chunk_volume(pts)


def _check_bvh(bvh, lo, hi, max_leaf):
    n = len(lo)
    # permutation
    assert sorted(bvh.order.tolist()) == list(range(n))
    # every prim appears in exactly one leaf; leaf boxes contain their prims;
    # internal boxes contain their children
    seen = np.zeros(n, bool)
    stack = [0]
    while stack:
        i = stack.pop()
        if bvh.leaf[i]:
            beg, cnt = bvh.a[i], bvh.b[i]
            assert 1 <= cnt <= max_leaf
            prims = bvh.order[beg:beg + cnt]
            assert not seen[prims].any()
            seen[prims] = True
            assert np.all(lo[prims] >= bvh.lo[i] - 1e-5)
            assert np.all(hi[prims] <= bvh.hi[i] + 1e-5)
        else:
            l, r = bvh.a[i], bvh.b[i]
            for c in (l, r):
                assert 0 < c < bvh.n_nodes
                assert np.all(bvh.lo[c] >= bvh.lo[i] - 1e-5)
                assert np.all(bvh.hi[c] <= bvh.hi[i] + 1e-5)
            stack += [l, r]
    assert seen.all()


@pytest.mark.parametrize("max_leaf", [4, 64])
def test_bvh_invariants(pts, max_leaf):
    rng = np.random.default_rng(1)
    lo = pts
    hi = pts + rng.uniform(0.01, 0.2, pts.shape).astype(np.float32)
    bvh = native.bvh_build(lo, hi, max_leaf=max_leaf)
    _check_bvh(bvh, lo, hi, max_leaf)


def test_bvh_fallback_invariants(pts):
    rng = np.random.default_rng(2)
    lo = pts[:500]
    hi = lo + rng.uniform(0.01, 0.2, lo.shape).astype(np.float32)
    bvh = native._py_bvh_build(lo, hi, max_leaf=8)
    _check_bvh(bvh, lo, hi, 8)


def test_bvh_degenerate_all_same_point():
    lo = np.zeros((100, 3), np.float32)
    hi = np.zeros((100, 3), np.float32)
    bvh = native.bvh_build(lo, hi, max_leaf=16)
    _check_bvh(bvh, lo, hi, 16)


def test_photon_io_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n = 1000
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    power = rng.uniform(size=(n, 3)).astype(np.float32)
    dircode = rng.integers(0, 65536, n).astype(np.uint16)
    p = str(tmp_path / "maps.gipm")
    native.save_photons(p, pos, power, dircode)
    pos2, power2, dir2 = native.load_photons(p)
    np.testing.assert_array_equal(pos2, pos)
    np.testing.assert_array_equal(power2, power)
    np.testing.assert_array_equal(dir2, dircode)


def test_photon_io_native_python_compatible(tmp_path, monkeypatch):
    """Files written by the C++ path parse with the numpy path and
    vice versa (same GIPM v1 layout)."""
    if not native.have_native():
        pytest.skip("no native lib")
    rng = np.random.default_rng(4)
    n = 123
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    power = rng.uniform(size=(n, 3)).astype(np.float32)
    dircode = rng.integers(0, 65536, n).astype(np.uint16)

    p_native = str(tmp_path / "native.gipm")
    native.save_photons(p_native, pos, power, dircode)  # native path

    # force the numpy path
    monkeypatch.setattr(native, "_load", lambda: None)
    p_py = str(tmp_path / "py.gipm")
    native.save_photons(p_py, pos, power, dircode)
    with open(p_native, "rb") as a, open(p_py, "rb") as b:
        assert a.read() == b.read()
    pos2, power2, dir2 = native.load_photons(p_native)
    np.testing.assert_array_equal(pos2, pos)
    np.testing.assert_array_equal(dir2, dircode)


def test_photon_io_errors(tmp_path):
    bad = str(tmp_path / "bad.gipm")
    with open(bad, "wb") as f:
        f.write(b"NOPE")
    with pytest.raises(IOError):
        native.load_photons(bad)
    with pytest.raises(IOError):
        native.load_photons(str(tmp_path / "missing.gipm"))


def test_morton_empty_and_single():
    assert len(native.morton_order(np.zeros((0, 3), np.float32))) == 0
    assert native.morton_order(np.ones((1, 3), np.float32)).tolist() == [0]
