"""Device-mesh sharding of ray and photon batches.

The reference's parallelism is k std::threads with strided pixel columns and
a mutex-guarded photon buffer (SURVEY.md §2.3).  The TPU-native equivalents:

  P1  ray batches   -> shard pixel indices over a 1-D 'rays' mesh axis with
                       shard_map; the scene pytree is replicated (P6).
  P2  photon quota  -> each device emits/traces its own photon sub-batch;
                       stored counts are psum'd for the host quota loop.
  P3  photon buffers-> fixed-capacity per-device arrays + masked compaction
                       (no locks), all_gather to build the global map.
  P4  statistics    -> per-device counters reduced with psum.
  P5  RNG           -> threefry key fold_in(axis_index) per device.
  P7  collectives ride ICI within a slice (psum/all_gather inserted by XLA).
  P8  sharded photon map -> ring-exchange kNN gather (parallel/gather.py).

Gradients for the differentiable path are averaged across devices with a
psum inside the sharded loss, overlapping the backward pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..models.render import render_tile
from ..scene.types import Scene
from ..utils.config import RenderConfig

AXIS = "rays"


def device_mesh(n_devices: int | None = None, platform: str | None = None
                ) -> Mesh:
    """1-D mesh over available devices (TPU chips, or virtual CPU devices
    for testing)."""
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # fall back to virtual CPU mesh (tests / dryrun)
            devices = jax.devices("cpu")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def render_tile_sharded(scene: Scene, cfg: RenderConfig, key,
                        pixel_idx: jnp.ndarray, width: int, height: int,
                        mesh: Mesh, photon_maps=None,
                        with_stats: bool = False):
    """Render a pixel batch sharded over the mesh 'rays' axis.

    pixel_idx length must be divisible by the mesh size; the scene (and
    photon maps) are replicated, colors come back sharded.  With
    `with_stats`, per-device ray counters are psum'd over the mesh (P4,
    SURVEY §2.3) and returned replicated: (colors, counters).
    """
    def body(scene_, key_, idx_, maps_):
        k = jax.random.fold_in(key_, jax.lax.axis_index(AXIS))
        out = render_tile(scene_, cfg, k, idx_, width, height, maps_,
                          with_stats=with_stats)
        if not with_stats:
            return out
        color, counters = out
        return color, jax.lax.psum(counters, AXIS)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P(), P(AXIS), P()),
                  out_specs=(P(AXIS), P()) if with_stats else P(AXIS),
                  check_rep=False)
    return f(scene, key, pixel_idx, photon_maps)


def render_tile_mapsharded(scene: Scene, cfg: RenderConfig, key,
                           pixel_idx: jnp.ndarray, width: int, height: int,
                           mesh: Mesh, smaps, with_stats: bool = False):
    """P8: render a pixel batch with DEVICE-SHARDED photon maps.

    Each device renders its pixel shard with photon-map estimates deferred
    into fixed-capacity request queues (models/montecarlo.py::GatherQueue),
    then every device answers its local queues with the ring-exchange
    gather (uniform collective: the walk's data-dependent while_loop is
    over before any ppermute runs), scatter-adds est*weight at the queue
    rows, and finally averages the DOF dim.  Exact: matches the
    replicated-map render up to K-th-neighbor ties and f32 summation
    order (tests/test_mapshard.py)."""
    from .gather import ring_radiance_queries

    n_dev = int(mesh.devices.size)

    def body(scene_, key_, idx_, ca_, ga_, gr_):
        k = jax.random.fold_in(key_, jax.lax.axis_index(AXIS))
        from ..photon.gather import ShardedMaps
        smaps_ = ShardedMaps(caustic=ca_, global_=ga_, caustic_rep=None,
                             global_rep=gr_)
        color, counters, cq, gq = render_tile(scene_, cfg, k, idx_, width,
                                              height, smaps_)
        if cq is not None:
            est = ring_radiance_queries(
                ca_, cq.point, cq.normal, cq.bounce, cq.ct, cq.kd, cq.ks,
                cq.shin, cfg.caustic_estimate_size, cfg.caustic_estimate_dist,
                cfg.caustic_filter, cfg, n_dev)
            color = color.at[cq.row].add(est * cq.weight, mode="drop")
        if gq is not None:
            if ga_ is not None:
                est = ring_radiance_queries(
                    ga_, gq.point, gq.normal, gq.bounce, gq.ct, gq.kd,
                    gq.ks, gq.shin, cfg.global_estimate_size,
                    cfg.global_estimate_dist, cfg.global_filter, cfg, n_dev)
            else:
                # replicated global map (irradiance cache): local answer
                from ..photon import gather as G
                if cfg.irradiance_cache:
                    est = G.estimate_cached_radiance(
                        gr_, gq.point, gq.normal, gq.bounce, gq.ct,
                        gq.kd, gq.ks, gq.shin, cfg.global_estimate_dist)
                else:
                    est = G.estimate_radiance(
                        gr_, gq.point, gq.normal, gq.bounce, gq.ct,
                        gq.kd, gq.ks, gq.shin, cfg.global_estimate_size,
                        cfg.global_estimate_dist, cfg.global_filter, cfg)
            color = color.at[gq.row].add(est * gq.weight, mode="drop")
        n_dof = cfg.dof_test if cfg.depth_of_field else 1
        B = idx_.shape[0]
        color = color.reshape(B, n_dof, 3).mean(axis=1)
        dropped = jnp.zeros((), jnp.int32)
        for q in (cq, gq):
            if q is not None:
                dropped = dropped + jnp.maximum(q.count - q.cap, 0)
        if not with_stats:
            return color, jax.lax.psum(dropped, AXIS)
        return (color, jax.lax.psum(counters, AXIS),
                jax.lax.psum(dropped, AXIS))

    out_specs = ((P(AXIS), P(), P()) if with_stats else (P(AXIS), P()))
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P()),
                  out_specs=out_specs, check_rep=False)
    return f(scene, key, pixel_idx, smaps.caustic, smaps.global_,
             smaps.global_rep)


def diff_params(scene: Scene):
    """The differentiable parameter pytree: materials, light color /
    position / size, camera (BASELINE.json north star: gradients w.r.t.
    albedo/shininess, light power, camera).  Light position/radius gradients
    through shadows require soft visibility (cfg.vis_softness > 0)."""
    return {
        "materials": scene.materials,
        "light_color": scene.lights.color,
        "light_position": scene.lights.position,
        "light_radius": scene.lights.radius,
        "camera_eye": scene.camera.eye,
    }


def apply_params(scene: Scene, params) -> Scene:
    return scene.replace(
        materials=params["materials"],
        lights=scene.lights.replace(color=params["light_color"],
                                    position=params["light_position"],
                                    radius=params["light_radius"]),
        camera=scene.camera.replace(eye=params["camera_eye"]),
    )


def train_step_sharded(scene: Scene, cfg: RenderConfig, key,
                       pixel_idx: jnp.ndarray, target: jnp.ndarray,
                       width: int, height: int, mesh: Mesh):
    """One differentiable-rendering optimization step, rays sharded over the
    mesh: forward render -> L2 loss vs target -> backward -> psum'd grads.

    Returns (loss, grads) with grads replicated across devices.
    """
    params = diff_params(scene)

    def body(scene_, params_, key_, idx_, tgt_):
        k = jax.random.fold_in(key_, jax.lax.axis_index(AXIS))

        def loss_fn(p):
            s = apply_params(scene_, p)
            colors = render_tile(s, cfg, k, idx_, width, height, None)
            return jnp.mean((colors - tgt_) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params_)
        loss = jax.lax.pmean(loss, AXIS)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, AXIS), grads)
        return loss, grads

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P(), P(), P(AXIS), P(AXIS)),
                  out_specs=(P(), P()), check_rep=False)
    return f(scene, params, key, pixel_idx, target)
