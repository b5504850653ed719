"""Instrument the v2 gather wrapper: on the judge's hotspot workload, count
how many WCH-chunks each query block streams (the kernel's DMA volume), so
kernel-time can be attributed to volume vs per-chunk overhead.

Runs on CPU; monkeypatches _gather_call_v2 to capture (wpk, se) instead of
launching the kernel.

Usage: python tools/probe_volume.py [n_photons] [n_queries]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from gi_tpu.photon import pallas_gather as PG
from gi_tpu.photon.gather import build_grid
from gi_tpu.utils.config import RenderConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

rng = np.random.default_rng(0)
n_hot = N // 4
n_uni = N - n_hot
pos_u = rng.uniform(-2.5, 2.5, (n_uni, 3)).astype(np.float32)
pos_h = (rng.normal(0.0, 0.03, (n_hot, 3)) + 0.1).astype(np.float32)
pos = np.concatenate([pos_u, pos_h])
power = np.full((N, 3), 1e-6, np.float32)
dir_code = rng.integers(0, 65536, (N,)).astype(np.int32)

grid = build_grid(jnp.asarray(pos), jnp.asarray(power),
                  jnp.asarray(dir_code), jnp.ones((N,), bool),
                  np.array([-2.5, -2.5, -2.5]), np.array([2.5, 2.5, 2.5]),
                  0.225, 450)
print(f"grid dims={grid.dims} sub_div={grid.sub_div} "
      f"N={N}", flush=True)

qpos = jnp.asarray((rng.normal(0.0, 0.05, (Q, 3)) + 0.1).astype(np.float32))
normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (Q, 1))
bounce = normal
cos_t = -jnp.ones((Q,))
kd = jnp.full((Q, 3), 0.7)
ks = jnp.zeros((Q, 3))
shin = jnp.ones((Q,))
cfg = RenderConfig()

captured = {}
orig = PG._gather_call_v2


def spy(wpk, qpack, se, sc, photons, **kw):
    captured["wpk"] = np.asarray(wpk)
    captured["se"] = np.asarray(se)
    captured["qpack"] = np.asarray(qpack)
    B = qpack.shape[0]
    return jnp.zeros((B, 4), jnp.float32)


PG._gather_call_v2 = spy
try:
    PG.estimate_radiance_pallas(
        grid, qpos, normal, bounce, cos_t, kd, ks, shin,
        225, 0.225, 0, cfg)
finally:
    PG._gather_call_v2 = orig

wpk = captured["wpk"].reshape(-1, PG._RUNS_V2)
nch = wpk & 0x7FFF  # 0x7FFF sentinel = stream the whole map
qpack = captured["qpack"]
filled = qpack[:, 0] < 1e8
blocks_filled = filled.reshape(-1, PG._QB2).any(axis=1)
per_block = nch.sum(axis=1)
act = per_block[blocks_filled]
print(f"blocks total={len(per_block)} non-empty={blocks_filled.sum()}")
print(f"chunks/block (non-empty): mean={act.mean():.1f} p50="
      f"{np.percentile(act, 50):.0f} p90={np.percentile(act, 90):.0f} "
      f"max={act.max()}")
print(f"total chunks={act.sum()}  photons streamed={act.sum() * PG.WCH}")
print(f"queries={Q}  photons-streamed/query={act.sum() * PG.WCH / Q:.0f}")
q_per_blk = filled.reshape(-1, PG._QB2).sum(axis=1)[blocks_filled]
print(f"queries/block: mean={q_per_blk.mean():.1f} "
      f"p50={np.percentile(q_per_blk, 50):.0f} full(32)="
      f"{(q_per_blk == PG._QB2).mean() * 100:.0f}%")
# nonempty runs per block (per-run fori_loop launches)
runs_active = (nch > 0).sum(axis=1)[blocks_filled]
print(f"active runs/block: mean={runs_active.mean():.1f}")
