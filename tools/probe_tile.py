"""Isolate the caustic render rung's per-tile cost: tile program vs
deferred-queue answering, on central (glass) and corner (floor) tiles.

Usage: python tools/probe_tile.py [tile_indices...]
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

from gi_tpu.models.render import _answer_queue_host, render_tile
from gi_tpu.photon.checkpoint import load_maps
from gi_tpu.scene.scn import load_scene
from gi_tpu.utils.config import RenderConfig
from gi_tpu.utils import stats as ST

scene = load_scene("/root/reference/input/caustic.scn")
maps = load_maps("/tmp/gi_bench_caustic10m")
cfg = RenderConfig(width=512, height=512, aa=1, indirect_illum=False,
                   caustic_estimate_size=225, caustic_estimate_dist=0.225,
                   ray_tile=8192)
sw = sh = 1024
tile = 8192
tiles = [int(t) for t in sys.argv[1:]] or [64, 0, 100]

key = jax.random.PRNGKey(0)
for t in tiles:
    idx = t * tile + jnp.arange(tile, dtype=jnp.int32)
    key, sub = jax.random.split(key)
    t0 = time.time()
    out = render_tile(scene, cfg, sub, idx, sw, sh, maps)
    jax.block_until_ready(out[0])
    t_tile = time.time() - t0
    color, counters, cq, gq = out
    c = np.asarray(counters)
    t0 = time.time()
    if cq is not None:
        ncq = int(cq.count)
        color, _ = _answer_queue_host(maps.caustic, cq, color,
                                      cfg.caustic_estimate_size,
                                      cfg.caustic_estimate_dist,
                                      cfg.caustic_filter, cfg)
        jax.block_until_ready(color)
    else:
        ncq = 0
    t_q = time.time() - t0
    print(f"tile {t}: program {t_tile:.2f}s queue {t_q:.2f}s "
          f"cq={ncq} monte={c[ST.MONTE]} trans={c[ST.TRANSMISSIVE]} "
          f"spec={c[ST.SPECULAR]} shadow={c[ST.SHADOW]}", flush=True)
