"""Judge-style dense-hotspot probe: 10M-photon map with a Gaussian hotspot
(~2.5M photons inside one 0.225-cell), cs=225 — measures build_grid time and
estimate_radiance throughput near the hotspot.

Usage: python tools/probe_hotspot.py [n_photons] [n_queries]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from gi_tpu.photon.gather import build_grid, estimate_radiance
from gi_tpu.utils.config import RenderConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

rng = np.random.default_rng(0)
# 75% uniform in a 5-unit box, 25% in a tight Gaussian hotspot (sigma small
# enough that ~all of it lands within one 0.225 cell)
n_hot = N // 4
n_uni = N - n_hot
pos_u = rng.uniform(-2.5, 2.5, (n_uni, 3)).astype(np.float32)
pos_h = (rng.normal(0.0, 0.03, (n_hot, 3)) + 0.1).astype(np.float32)
pos = np.concatenate([pos_u, pos_h])
power = np.full((N, 3), 1e-6, np.float32)
dir_code = rng.integers(0, 65536, (N,)).astype(np.int32)

t0 = time.time()
grid = build_grid(jnp.asarray(pos), jnp.asarray(power),
                  jnp.asarray(dir_code), jnp.ones((N,), bool),
                  np.array([-2.5, -2.5, -2.5]), np.array([2.5, 2.5, 2.5]),
                  0.225, 450)
jax.block_until_ready(grid.cell_start)
print(f"build_grid: {time.time() - t0:.1f} s ({N} photons)", flush=True)

# queries clustered at the hotspot
qpos = jnp.asarray((rng.normal(0.0, 0.05, (Q, 3)) + 0.1).astype(np.float32))
normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (Q, 1))
bounce = normal
cos_t = -jnp.ones((Q,))
kd = jnp.full((Q, 3), 0.7)
ks = jnp.zeros((Q, 3))
shin = jnp.ones((Q,))
cfg = RenderConfig()

t0 = time.time()
out = estimate_radiance(grid, qpos, normal, bounce, cos_t, kd, ks, shin,
                        225, 0.225, 0, cfg)
jax.block_until_ready(out)
t1 = time.time() - t0
print(f"estimate_radiance (cold): {t1:.1f} s for {Q} queries "
      f"({Q / t1:.0f} q/s)", flush=True)

t0 = time.time()
out = estimate_radiance(grid, qpos + 1e-4, normal, bounce, cos_t, kd, ks,
                        shin, 225, 0.225, 0, cfg)
jax.block_until_ready(out)
t1 = time.time() - t0
print(f"estimate_radiance (warm): {t1:.2f} s for {Q} queries "
      f"({Q / t1:.0f} q/s)", flush=True)
print("mean estimate:", np.asarray(out).mean(axis=0))
