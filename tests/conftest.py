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


@pytest.fixture(scope="session")
def cornell_scene():
    from gi_tpu.scene.scn import load_scene
    return load_scene(os.path.join(REFERENCE_INPUT, "cornell.scn"))
