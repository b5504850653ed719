"""Benchmark: rays/s on cornell.scn 1024x1024 direct illumination (aa=0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline anchor (BASELINE.md): the reference CPU renderer aggregates
~7.16e5 rays/s across all ray categories on 8 threads (README.md:403);
its direct+shadow ray throughput on simple scenes is the same order.
vs_baseline = our rays/s / 7.16e5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from gi_tpu.models.render import render_tile
    from gi_tpu.ops.intersect import intersect_scene
    from gi_tpu.models.camera import eye_rays
    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene("/root/reference/input/cornell.scn")
    res = 1024
    tile = 1048576
    cfg = RenderConfig(width=res, height=res, aa=0, indirect_illum=False,
                       caustic_illum=False, transmissive_illum=False,
                       specular_illum=False, monte_carlo=False,
                       ray_tile=tile)

    total = res * res
    n_tiles = total // tile
    key = jax.random.PRNGKey(0)

    # Count rays the way the reference does (render.cpp:224-254):
    # 1 screen ray per pixel + 1 shadow ray per shaded (diffuse|specular) hit.
    def count_tile(scene_, idx):
        o, d = eye_rays(scene_, cfg, jax.random.PRNGKey(0), idx, res, res, 1)
        h = intersect_scene(scene_, o.reshape(-1, 3), d.reshape(-1, 3))
        kd = scene_.materials.kd[h.mat]
        ks = scene_.materials.ks[h.mat]
        ds = jnp.any(kd > 0, axis=-1) | jnp.any(ks > 0, axis=-1)
        return jnp.sum(h.valid & ds)

    count_jit = jax.jit(count_tile)
    shadow_rays = 0
    for t in range(n_tiles):
        idx = t * tile + jnp.arange(tile, dtype=jnp.int32)
        shadow_rays += int(count_jit(scene, idx))
    total_rays = total + shadow_rays

    # Warm up (compile)
    idx0 = jnp.arange(tile, dtype=jnp.int32)
    render_tile(scene, cfg, key, idx0, res, res, None).block_until_ready()

    # Timed full frames; report the best of 3 (the tunneled TPU adds
    # variable dispatch/transfer latency)
    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        outs = []
        for t in range(n_tiles):
            idx = t * tile + jnp.arange(tile, dtype=jnp.int32)
            key, sub = jax.random.split(key)
            outs.append(render_tile(scene, cfg, sub, idx, res, res, None))
        jax.block_until_ready(outs)
        elapsed = min(elapsed, time.perf_counter() - start)

    rays_per_s = total_rays / elapsed
    baseline = 7.16e5
    print(json.dumps({
        "metric": "rays_per_s_cornell1024_direct",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / baseline, 3),
        "elapsed_s": round(elapsed, 3),
        "total_rays": total_rays,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
