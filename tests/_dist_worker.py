"""Subprocess worker for the multi-process (P7) test: one simulated host
with 4 virtual CPU devices, participating in a 2-process global mesh.

Usage: python _dist_worker.py <pid> <nprocs> <coordinator> <outdir>
"""

import os
import sys


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coord, outdir = sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["GI_TPU_COORD"] = coord
    os.environ["GI_TPU_NPROCS"] = str(nprocs)
    os.environ["GI_TPU_PID"] = str(pid)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from gi_tpu.parallel.dist import (global_mesh, initialize,
                                      render_pixels_multihost)

    assert initialize(), "multi-process runtime did not start"
    import jax
    import numpy as np

    # The axon TPU plugin outranks CPU even under JAX_PLATFORMS=cpu; pin
    # everything to the distributed CPU topology explicitly.  The default
    # device must be a process-LOCAL one (jax.devices() is the global list).
    jax.config.update("jax_default_device",
                      jax.local_devices(backend="cpu")[0])
    assert jax.process_count("cpu") == nprocs, jax.process_count("cpu")
    mesh = global_mesh(platform="cpu")
    assert len(mesh.devices.ravel()) == 4 * nprocs, mesh

    from gi_tpu.scene.scn import load_scene
    from gi_tpu.utils.config import RenderConfig

    scene = load_scene("/root/reference/input/cornell.scn")
    cfg = RenderConfig(width=16, height=16, aa=0, monte_carlo=False,
                       indirect_illum=False, caustic_illum=False,
                       transmissive_illum=False, specular_illum=False,
                       ray_tile=256)
    total = 16 * 16
    per = total // nprocs
    idx = np.arange(pid * per, (pid + 1) * per, dtype=np.int32)
    colors, counters = render_pixels_multihost(
        scene, cfg, jax.random.PRNGKey(0), idx, 16, 16, with_stats=True,
        mesh=mesh)
    assert np.isfinite(colors).all()
    np.save(os.path.join(outdir, f"colors_{pid}.npy"), colors)
    np.save(os.path.join(outdir, f"counters_{pid}.npy"), counters)

    # ---- P7 x P8: device-sharded photon maps across BOTH processes ------
    # Each process traces the identical (replicated) caustic map, then the
    # render shards it over the 8-device global mesh and answers deferred
    # gathers with the cross-process ring exchange.
    from gi_tpu.photon.trace import build_photon_maps

    scene_c = load_scene("/root/reference/input/caustic.scn")
    cfg_c = RenderConfig(width=16, height=16, aa=0, indirect_illum=False,
                         caustic_photon_count=8000,
                         caustic_estimate_size=30, caustic_estimate_dist=0.3,
                         transmissive_test=2, specular_test=2,
                         max_monte_depth=3, max_photon_depth=12,
                         ray_tile=256, shard_maps=True)
    maps, cfg_c = build_photon_maps(scene_c, cfg_c, jax.random.PRNGKey(3))
    assert maps is not None and maps.caustic is not None
    colors_m = render_pixels_multihost(
        scene_c, cfg_c, jax.random.PRNGKey(0), idx, 16, 16,
        photon_maps=maps, mesh=mesh)
    assert np.isfinite(colors_m).all()
    np.save(os.path.join(outdir, f"mapshard_colors_{pid}.npy"), colors_m)
    print("WORKER_OK", pid, colors.shape, int(counters.sum()))


if __name__ == "__main__":
    main()
