"""Multi-host runtime (P7): 2 processes x 4 virtual CPU devices each render
one sharded tile with psum'd stats over the global mesh.

The reference cannot do this at all (single process, std::thread only —
SURVEY §2.3 P7); this is the TPU-native framework's `jax.distributed`
skeleton exercised end-to-end: gloo collectives on CPU stand in for the
ICI/DCN collectives a real pod slice uses.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_render(tmp_path, cornell_scene):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "GI_TPU_COORD",
                        "GI_TPU_NPROCS", "GI_TPU_PID")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2",
             f"127.0.0.1:{port}", str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "WORKER_OK" in out

    c0 = np.load(tmp_path / "colors_0.npy")
    c1 = np.load(tmp_path / "colors_1.npy")
    n0 = np.load(tmp_path / "counters_0.npy")
    n1 = np.load(tmp_path / "counters_1.npy")

    # P4 over the global mesh: psum'd counters are identical on every host
    np.testing.assert_array_equal(n0, n1)
    assert n0.sum() > 0

    # The distributed render must equal the single-process 8-device render
    # (same global device count -> same per-device RNG folds).
    import jax
    import jax.numpy as jnp
    from gi_tpu.parallel.mesh import device_mesh, render_tile_sharded
    from gi_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=16, height=16, aa=0, monte_carlo=False,
                       indirect_illum=False, caustic_illum=False,
                       transmissive_illum=False, specular_illum=False,
                       ray_tile=256)
    mesh = device_mesh(8)
    idx = jnp.arange(256, dtype=jnp.int32)
    local, counters = render_tile_sharded(
        cornell_scene, cfg, jax.random.PRNGKey(0), idx, 16, 16, mesh,
        with_stats=True)
    np.testing.assert_allclose(np.concatenate([c0, c1]),
                               np.asarray(local), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(n0, np.asarray(counters))

    # P7 x P8 (VERDICT r4 #5): the two-process SHARDED-MAP caustic render
    # must match the single-process 8-device replicated-map render — the
    # map shards live on devices of different processes and the deferred
    # gathers ring-exchange across the DCN (gloo) boundary.
    from gi_tpu.photon.trace import build_photon_maps
    from gi_tpu.scene.scn import load_scene

    m0 = np.load(tmp_path / "mapshard_colors_0.npy")
    m1 = np.load(tmp_path / "mapshard_colors_1.npy")
    scene_c = load_scene("/root/reference/input/caustic.scn")
    cfg_c = RenderConfig(width=16, height=16, aa=0, indirect_illum=False,
                         caustic_photon_count=8000,
                         caustic_estimate_size=30, caustic_estimate_dist=0.3,
                         transmissive_test=2, specular_test=2,
                         max_monte_depth=3, max_photon_depth=12,
                         ray_tile=256)
    maps, cfg_c = build_photon_maps(scene_c, cfg_c, jax.random.PRNGKey(3))
    ref = render_tile_sharded(scene_c, cfg_c, jax.random.PRNGKey(0), idx,
                              16, 16, mesh, maps)
    got = np.concatenate([m0, m1])
    assert got.mean() > 0.005
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-5)
