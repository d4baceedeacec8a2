"""Test env: run everything on the CPU backend (8 virtual devices) with
Pallas kernels in interpreter mode, so the suite needs no TPU and multi-chip
sharding logic is exercised without a pod (SURVEY.md §4 consequences).

The axon TPU plugin ignores JAX_PLATFORMS, so we cannot hide the TPU; instead
we pin the default device to CPU per-test and force interpret mode via
XFA_FORCE_INTERPRET (read by utils.platform.default_interpret)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["XFA_FORCE_INTERPRET"] = "1"

import jax  # noqa: E402
import pytest  # noqa: E402


def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True)
def _on_cpu():
    with jax.default_device(cpu_devices()[0]):
        yield
