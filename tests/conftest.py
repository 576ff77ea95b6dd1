"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4's
recommendation; the driver separately dry-runs the multichip path)."""

import os
import sys

# CPPROB_TPU_TESTS=1 runs the suite against the real attached TPU backend
# (`make tpu-test`: the tpu_only hardware-PRNG kernel tests un-skip, the
# multi-device tests skip instead).  Default: force CPU regardless of the
# ambient JAX_PLATFORMS (the TPU tunnel exports JAX_PLATFORMS=axon and its
# sitecustomize imports jax early, so the env var alone is not enough —
# jax.config.update below wins as long as no backend has been initialized
# yet); tests exercise sharding on 8 virtual CPU devices.
_ON_HW = os.environ.get("CPPROB_TPU_TESTS") == "1"
if not _ON_HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

if not _ON_HW:
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.fixture
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
