"""Multi-host runtime (P7, SURVEY §2.3): `jax.distributed` initialization,
process-count-aware global meshes, and host-local <-> global array plumbing.

The reference has NO distributed backend at all — its parallelism is
std::threads over shared memory in one process (photonmap.cpp:135-138,
render.cpp:188-199).  Here a render/photon job can span processes (one per
host, each owning its local TPU chips): XLA lowers the psum/all_gather
collectives inside the sharded render to ICI within a slice and DCN across
hosts.  On CPU (tests) the same code runs over gloo collectives.

Launch line per host (v5p pod slice example):

    GI_TPU_COORD=host0:8476 GI_TPU_NPROCS=4 GI_TPU_PID=$i \
        python -m gi_tpu.cli scene.scn out.png -resolution 2048 2048

(`initialize()` is a no-op when GI_TPU_NPROCS is unset or 1, so single-host
usage is unchanged.)
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

# NOTE: deliberately import-light — jax.distributed.initialize() must run
# before anything touches the XLA backend, so the render-path imports
# (which pull in flax and friends) happen inside the functions below.
AXIS = "rays"


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize the multi-process runtime from args or environment
    (GI_TPU_COORD / GI_TPU_NPROCS / GI_TPU_PID).  Returns True when a
    multi-process runtime was started.  Safe to call unconditionally."""
    coordinator_address = coordinator_address or os.environ.get(
        "GI_TPU_COORD")
    if num_processes is None and "GI_TPU_NPROCS" in os.environ:
        num_processes = int(os.environ["GI_TPU_NPROCS"])
    if process_id is None and "GI_TPU_PID" in os.environ:
        process_id = int(os.environ["GI_TPU_PID"])
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    # CPU backend needs an explicit cross-process collectives implementation
    # (TPU uses ICI/DCN natively).
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def global_mesh(axis: str = AXIS, platform: str | None = None) -> Mesh:
    """1-D mesh over every device of every process (ICI + DCN).  Pass
    platform="cpu" to force the (gloo-backed) CPU topology when another
    plugin backend has higher priority (e.g. a tunneled single TPU)."""
    devices = jax.devices(platform) if platform else jax.devices()
    return Mesh(np.array(devices), (axis,))


def _to_host(tree):
    # host_local_array_to_global_array passes some committed jax.Arrays
    # through with their original (single-device, possibly non-addressable)
    # sharding; plain numpy leaves always get properly globalized.
    return jax.tree.map(np.asarray, tree)


def replicate_global(tree, mesh: Mesh):
    """Turn identical host-local pytrees (every process loaded the same
    scene) into replicated global arrays on `mesh` (P6, SURVEY §2.3)."""
    from jax.experimental import multihost_utils as mh
    tree = _to_host(tree)
    specs = jax.tree.map(lambda _: P(), tree)
    return mh.host_local_array_to_global_array(tree, mesh, specs)


def shard_global(tree, mesh: Mesh):
    """Concatenate per-process host-local batches into a global array
    sharded over the mesh axis (process order = shard order)."""
    from jax.experimental import multihost_utils as mh
    tree = _to_host(tree)
    specs = jax.tree.map(lambda _: P(AXIS), tree)
    return mh.host_local_array_to_global_array(tree, mesh, specs)


def render_pixels_multihost(scene, cfg, key, local_pixel_idx, width, height,
                            photon_maps=None, with_stats: bool = False,
                            mesh: Mesh | None = None):
    """Render this process's pixel batch as part of a global sharded render.

    Every process calls this with its own `local_pixel_idx` slice (and the
    identical scene/key); the batches are concatenated into one global
    ray batch sharded over all devices of all processes, rendered with the
    same sharded program as single-host (parallel.mesh.render_tile_sharded),
    and each process receives back its local color shard (numpy, in
    local_pixel_idx order).  Ray counters are psum'd across the WHOLE mesh
    (P4 over DCN) and returned replicated to every process.
    """
    from .mesh import render_tile_mapsharded, render_tile_sharded
    mesh = mesh or global_mesh()
    n_dev = len(mesh.devices.ravel())
    local_pixel_idx = np.asarray(local_pixel_idx, np.int32)
    assert local_pixel_idx.shape[0] % max(1, n_dev // jax.process_count()) \
        == 0, "local batch must divide evenly over local devices"

    scene_g = replicate_global(scene, mesh)
    key_g = replicate_global(key, mesh)
    idx_g = shard_global(local_pixel_idx, mesh)

    if photon_maps is not None and cfg.shard_maps:
        # P7 x P8: device-shard the maps over the WHOLE multi-host mesh
        # (each process assembles the global arrays from its own replicated
        # trace — parallel.gather.shard_photons) and run the ring-exchange
        # deferred gather across processes; collectives ride ICI within a
        # host and DCN between them.
        from ..photon.gather import ShardedMaps
        from .gather import build_sharded_maps
        smaps = build_sharded_maps(photon_maps, cfg, mesh)
        if smaps.global_rep is not None:
            smaps = ShardedMaps(
                caustic=smaps.caustic, global_=smaps.global_,
                caustic_rep=None,
                global_rep=replicate_global(smaps.global_rep, mesh))
        out = render_tile_mapsharded(scene_g, cfg, key_g, idx_g, width,
                                     height, mesh, smaps,
                                     with_stats=with_stats)
        dropped = int(np.asarray(out[-1].addressable_data(0)))
        if dropped:
            import sys
            print(f"gi_tpu: warning: {dropped} deferred gather requests "
                  f"overflowed their queues (multi-host sharded-map "
                  f"render)", file=sys.stderr)
        out = out[0] if len(out) == 2 else out[:-1]
    else:
        maps_g = (replicate_global(photon_maps, mesh)
                  if photon_maps is not None else None)
        out = render_tile_sharded(scene_g, cfg, key_g, idx_g, width, height,
                                  mesh, maps_g, with_stats=with_stats)
    if with_stats:
        colors, counters = out
        # counters are replicated (psum'd over the whole mesh): any
        # addressable shard holds the global value.
        return _local_shard_rows(colors), np.asarray(
            counters.addressable_data(0))
    return _local_shard_rows(out)


def _local_shard_rows(garr) -> np.ndarray:
    """This process's rows of a P(AXIS)-sharded global array, in global
    row order.  (multihost_utils.global_array_to_host_local_array mishandles
    nonzero process indices in this jax version; reading addressable shards
    directly is equivalent and allocation-free.)"""
    shards = sorted(garr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
