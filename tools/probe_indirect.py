"""Split the indirect-rung tile cost: walk program vs global-map queue
answering (brute-force small-map path)."""
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
from gi_tpu.photon.trace import build_photon_maps
from gi_tpu.scene.scn import load_scene
from gi_tpu.utils.config import RenderConfig

scene = load_scene("/root/reference/input/cornell.scn")
cfg = RenderConfig(width=512, height=512, aa=0, direct_illum=False,
                   caustic_illum=False, transmissive_illum=False,
                   specular_illum=False, indirect_illum=True,
                   indirect_test=64, global_photon_count=2176,
                   global_estimate_size=50, global_estimate_dist=2.5,
                   ray_tile=4096)
maps, cfg = build_photon_maps(scene, cfg, jax.random.PRNGKey(3))
sw = sh = 512
tile = 4096

key = jax.random.PRNGKey(0)
for t in [32, 33, 34]:
    idx = t * tile + jnp.arange(tile, dtype=jnp.int32)
    key, sub = jax.random.split(key)
    t0 = time.time()
    out = render_tile(scene, cfg, sub, idx, sw, sh, maps, with_stats=True)
    color = np.asarray(out[0] if isinstance(out, tuple) else out)
    t_tile = time.time() - t0
    print(f"tile {t}: program {t_tile:.2f}s (in-program gather) "
          f"mean={color.mean():.4f}", flush=True)
