"""Command-line driver: `photonmap scene.scn out.png [-FLAGS]`.

Mirrors the reference binary's pipeline (photonmap.cpp:442-499): parse args,
read scene, build photon maps (if any photon layer is enabled), render with
supersampled AA, write the image — with the reference's `-v` statistics.
"""

from __future__ import annotations

import os
import sys
import time

import jax


def main(argv=None):
    # Multi-host runtime (P7): no-op unless GI_TPU_COORD/GI_TPU_NPROCS/
    # GI_TPU_PID are set (one process per host; must run before any other
    # JAX call touches the XLA backend).
    from .parallel.dist import initialize as dist_initialize
    dist_initialize()

    # Persistent compilation cache: the big render/trace programs compile
    # for minutes (XLA:TPU through the tunnel; CPU fallback too) but are
    # stable across runs — cache them per user.  JAX_COMPILATION_CACHE_DIR
    # still wins if the user set one.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gi_tpu", "jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from .models.render import render_image
    from .photon.trace import build_photon_maps
    from .scene.scn import load_scene
    from .utils.config import parse_args
    from .utils.image import write_image

    scene_name, image_name, cfg = parse_args(
        sys.argv[1:] if argv is None else argv)

    # -pallas flag drives the intersection fast-path policy (task: every
    # parsed flag observably changes behavior).
    from .ops.intersect import set_pallas_mode
    set_pallas_mode(cfg.use_pallas)

    # Device mesh (P1): the reference's `-threads` pixel-loop fan-out
    # (render.cpp:188-199, io_utils.cpp:26-29) becomes a 1-D device mesh;
    # default is every local device, `-threads N` caps it.
    from .parallel.mesh import device_mesh
    n_local = len(jax.devices())
    n_dev = n_local if cfg.threads == 0 else min(cfg.threads, n_local)
    mesh = device_mesh(n_dev) if n_dev > 1 else None
    if cfg.verbose and mesh is not None:
        print(f"Using {n_dev} devices "
              f"({jax.devices()[0].platform}) ...")

    t0 = time.time()
    scene = load_scene(scene_name, real_material=cfg.real_material)
    if cfg.verbose:
        n = scene.n_prims
        print(f"Read scene from {scene_name} ...")
        print(f"  Time = {time.time() - t0:.2f} seconds")
        print(f"  # Primitives = {n}")
        print(f"  # Lights = {scene.n_lights}")

    key = jax.random.PRNGKey(cfg.seed)
    key, k_maps = jax.random.split(key)

    maps = None
    if cfg.load_maps:
        from .photon.checkpoint import load_maps
        t1 = time.time()
        maps = load_maps(cfg.load_maps)
        if maps.global_ is None:
            cfg = cfg.replace(indirect_illum=False, direct_photon_illum=False)
        if maps.caustic is None:
            cfg = cfg.replace(caustic_illum=False)
        if cfg.verbose:
            print(f"Loaded photon maps from {cfg.load_maps} ...")
            print(f"  Time = {time.time() - t1:.2f} seconds")
    elif cfg.indirect_illum or cfg.caustic_illum or cfg.direct_photon_illum:
        t1 = time.time()
        if cfg.verbose:
            print("Building photon maps ...")
        maps, cfg = build_photon_maps(scene, cfg, k_maps,
                                      verbose=cfg.verbose, mesh=mesh)
        if cfg.verbose:
            print(f"  Total Time = {time.time() - t1:.2f} seconds")

    if cfg.save_maps and maps is not None:
        from .photon.checkpoint import save_maps
        save_maps(cfg.save_maps, maps)
        if cfg.verbose:
            print(f"Saved photon maps to {cfg.save_maps} ...")

    t2 = time.time()
    if cfg.verbose:
        print("Rendering image ...")

    def progress(frac):
        if cfg.verbose:
            bar = int(frac * 50)
            print(f"[{'=' * bar}{' ' * (50 - bar)}] {int(frac * 100)}%",
                  end="\r", flush=True)

    from .utils.stats import RenderStats
    stats = RenderStats() if cfg.verbose else None

    if cfg.trace_dir:
        jax.profiler.start_trace(cfg.trace_dir)
    img = render_image(scene, cfg, photon_maps=maps, progress=progress,
                       stats=stats, mesh=mesh)
    if cfg.trace_dir:
        jax.profiler.stop_trace()
        if cfg.verbose:
            print(f"\nWrote profiler trace to {cfg.trace_dir} ...")

    if cfg.verbose:
        # reference verbose block (render.cpp:224-254)
        print(f"\nRendered image ...\n  Time = {time.time() - t2:.2f} seconds")
        print(stats.report(cfg))

    write_image(img, image_name)
    if cfg.verbose:
        print(f"Wrote image to {image_name} ...")
        print(f"  Width = {cfg.width}\n  Height = {cfg.height}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
