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

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    # Best-effort: raise the mmap-count limit (root containers allow it).
    # See _release_compiled_executables below for why it matters.
    try:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("1048576")
    except OSError:
        pass


def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True)
def _on_cpu():
    with jax.default_device(cpu_devices()[0]):
        yield


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop jax's compiled-executable caches at module boundaries.

    Root cause of the round-3 'suite segfaults at ~88%' (Weak #7,
    root-caused round 4): every compiled XLA:CPU executable holds ~20
    mmap'd JIT code regions, jax's global pjit cache keeps every
    executable of the session alive, and ~300 interpret-mode tests
    exceed vm.max_map_count (default 65530) — LLVM's next allocation
    fails with 'LLVM compilation error: Cannot allocate memory' followed
    by SIGSEGV/SIGABRT inside backend_compile_and_load (always at the
    first big compile past the limit, which happened to be
    test_serve.py::test_engine_quantized_kv_runs; torch was loaded but
    innocent — reproduced torch-free). Clearing per module bounds live
    executables to one file's worth (measured: clear+gc releases the
    maps); cross-module recompiles are the price of finishing."""
    yield
    jax.clear_caches()
    gc.collect()
