"""Photon-map checkpointing: serialize built maps so tracing and rendering
can run as separate jobs (or resume after failure).

The reference keeps photon maps only in RAM and frees them after the render
(photonmap.cpp:474-485) — re-rendering re-traces everything. Here maps are
saved as GIPM v1 binary files (native/gi_native.cpp serializer) plus a JSON
sidecar with the grid geometry, and restored to bit-identical PhotonGrids.

Layout of a checkpoint directory:
    global.gipm / caustic.gipm   photon payloads (pos f32, power f32,
                                 dircode u16) — only maps that exist
    meta.json                    per-map grid geometry (origin, cell size,
                                 dims, cell_cap) + photon counts
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from .. import native
from .gather import PhotonGrid, PhotonMaps, build_grid

_META = "meta.json"
_NAMES = ("global", "caustic")


def _grid_meta(grid: PhotonGrid) -> dict:
    cell = float(1.0 / np.asarray(grid.inv_h))
    return dict(
        origin=[float(x) for x in np.asarray(grid.origin)],
        cell=cell,
        dims=[int(d) for d in grid.dims],
        cell_cap=int(grid.cell_cap),
    )


def save_maps(path: str, maps: PhotonMaps) -> None:
    """Write a photon-map checkpoint directory."""
    os.makedirs(path, exist_ok=True)
    meta: dict = {"format": "gi_tpu-photon-maps", "version": 1, "maps": {}}
    for name, grid in (("global", maps.global_), ("caustic", maps.caustic)):
        if grid is None:
            continue
        valid = np.asarray(grid.valid)
        pos = np.asarray(grid.pos, np.float32)[valid]
        power = np.asarray(grid.power.astype(jnp.float32))[valid]
        dircode = np.asarray(grid.dir_code, np.uint16)[valid]
        native.save_photons(os.path.join(path, f"{name}.gipm"),
                            pos, power, dircode)
        m = _grid_meta(grid)
        m["count"] = int(valid.sum())
        # saved photon order comes from the built grid, whose within-cell
        # order build_grid decorrelated; record that so load can skip the
        # re-shuffle (bit-identical restore) while checkpoints written
        # before this flag existed get decorrelated on load (ADVICE r4:
        # a correlated cell prefix is a biased sample under cell_max
        # truncation)
        m["decorrelated"] = True
        meta["maps"][name] = m
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


def load_maps(path: str) -> PhotonMaps:
    """Restore a photon-map checkpoint directory -> PhotonMaps."""
    meta_path = os.path.join(path, _META)
    if not os.path.exists(meta_path):
        raise IOError(f"{path}: not a photon-map checkpoint (no {_META})")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format") != "gi_tpu-photon-maps" or meta.get("version") != 1:
        raise IOError(f"{path}: unrecognized checkpoint format")

    grids: dict = {"global": None, "caustic": None}
    for name, m in meta["maps"].items():
        if name not in _NAMES:
            raise IOError(f"{path}: unknown map name {name!r}")
        pos, power, dircode = native.load_photons(
            os.path.join(path, f"{name}.gipm"))
        if len(pos) != m["count"]:
            raise IOError(f"{path}/{name}.gipm: count mismatch "
                          f"({len(pos)} != {m['count']})")
        origin = np.asarray(m["origin"], np.float64)
        cell = float(m["cell"])
        dims = tuple(m["dims"])
        bbox_hi = origin + np.asarray(dims, np.float64) * cell
        grids[name] = build_grid(
            jnp.asarray(pos), jnp.asarray(power),
            jnp.asarray(dircode.astype(np.int32)),
            jnp.ones(len(pos), bool), origin, bbox_hi,
            cell, int(m["cell_cap"]), max_dim=max(dims), dims=dims,
            decorrelate=not m.get("decorrelated", False))
    return PhotonMaps(global_=grids["global"], caustic=grids["caustic"])
