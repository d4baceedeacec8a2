"""Platform helpers: interpret-mode detection and shape arithmetic."""

import functools
import os

import jax


@functools.cache
def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. tunneled 'axon')."""
    backend = jax.default_backend()
    return backend in ("tpu", "axon")


def default_interpret() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (CPU tests) unless
    overridden via XFA_FORCE_INTERPRET / XFA_FORCE_COMPILE."""
    if os.environ.get("XFA_FORCE_INTERPRET"):
        return True
    if os.environ.get("XFA_FORCE_COMPILE"):
        return False
    return not on_tpu()


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def next_multiple(x: int, m: int) -> int:
    return cdiv(x, m) * m
