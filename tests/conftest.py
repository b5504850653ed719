"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

The reference has no test suite (SURVEY.md §4); this suite is the framework's
own: unit tests against closed-form/brute-force oracles, statistical estimator
tests, gradcheck, and multi-device sharding tests on a virtual CPU mesh.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin registers itself even when JAX_PLATFORMS=cpu; pin the
# default device to host CPU so tests never touch the (tunneled) TPU.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import pytest  # noqa: E402

REFERENCE_INPUT = "/root/reference/input"

# Modules whose tests run minutes each (interpret-mode Pallas kernels,
# 2-process subprocess meshes, photon-map builds at depth): auto-marked
# `slow` so the pre-commit tier stays under ~10 minutes:
#     python -m pytest tests/ -m "not slow" -q      # fast tier
#     python -m pytest tests/ -q                    # everything
# Timings recorded in docs/TESTING.md.
_SLOW_MODULES = {
    "test_pallas_gather.py",
    "test_dist.py",
    "test_mapshard.py",
    "test_golden_extra.py",
    "test_montecarlo.py",
    "test_grad.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def cornell_scene():
    from gi_tpu.scene.scn import load_scene
    return load_scene(os.path.join(REFERENCE_INPUT, "cornell.scn"))
