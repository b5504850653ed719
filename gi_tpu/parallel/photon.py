"""Sharded photon tracing over the device mesh (SURVEY.md §2.3 P2/P3).

The reference divides the photon quota evenly across k std::threads, each
tracing into a thread-local 100k buffer that is flushed under a global mutex
(photonmap.cpp:295-329, photon_utils.cpp:19-36).  TPU-native equivalent:

  P2  each device runs one `emit_round` with its own fold_in(axis_index)
      threefry key — same static per-light counts, independent streams;
  P3  every device scatters into its OWN fixed-capacity buffer (no locks,
      masked prefix-sum scatter inside emit_round); shard_map stacks the
      per-device buffers along the mesh axis, and the host compacts the
      valid prefixes — the lock-free analogue of the mutex flush;
  P4  per-device stored counts come back as a sharded [n_dev] vector that
      the host sums to drive the reference's adaptive emission-cycle quota
      loop (photonmap.cpp:163-198).

The resulting photon set feeds the same `build_grid` gather structure, so
tracing distribution is invisible to the renderer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import shard_map

from ..photon.trace import emit_round
from ..scene.types import Scene
from ..utils.config import RenderConfig
from .mesh import AXIS


def emit_round_sharded(scene: Scene, cfg: RenderConfig, key, counts: tuple,
                       map_type: int, cap: int, mesh: Mesh,
                       cone_axis=None, cone_cos=None, weight=None,
                       narrow_div: int = 8):
    """One emission round on every device of the mesh.

    The caustic projection-map cone parameters (photon.trace._emission_cones)
    are replicated, like the scene.  Returns (pos [n_dev*cap, 3],
    power [n_dev*cap, 3], dir_code [n_dev*cap], counts_per_device [n_dev]
    int32, lost_per_device [n_dev] int32): device i's stored photons occupy
    the prefix [i*cap, i*cap + counts[i]) of the stacked buffers.
    """
    def body(scene_, key_, ca_, cc_, w_):
        k = jax.random.fold_in(key_, jax.lax.axis_index(AXIS))
        bp, bw, bd, cnt, lost = emit_round(scene_, cfg, k, counts, map_type,
                                           cap, ca_, cc_, w_,
                                           narrow_div=narrow_div)
        return bp, bw, bd, cnt[None], lost[None]

    f = shard_map(body, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
                  out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                  check_rep=False)
    return f(scene, key, cone_axis, cone_cos, weight)
