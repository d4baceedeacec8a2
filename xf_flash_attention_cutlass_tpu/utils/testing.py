"""Dual-reference tolerance helpers (the reference's accuracy methodology,
/root/reference/test.py:975,1296,1593-1594): an implementation passes when its
max error vs the fp32-upcast oracle is at most `mult`x the error that a
low-precision, op-reordered oracle itself commits, plus `atol`."""

import jax.numpy as jnp
import numpy as np


def max_err(a, b) -> float:
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def assert_close_2ref(out, out_ref, out_lp, mult: float = 2.0, atol: float = 1e-5):
    """out: impl result; out_ref: fp32-upcast oracle; out_lp: low-precision
    (same-dtype, reordered) oracle used to calibrate the tolerance."""
    impl_err = max_err(out, out_ref)
    ref_err = max_err(out_lp, out_ref)
    assert impl_err <= mult * ref_err + atol, (
        f"impl max err {impl_err:.6g} > {mult} x reference err {ref_err:.6g} + {atol}"
    )


def rand(key, shape, dtype, scale=1.0):
    import jax

    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def alibi_slopes_ref(nheads: int) -> np.ndarray:
    """Standard ALiBi slope schedule: 2^(-8i/n)."""
    return np.asarray(
        [2.0 ** (-8.0 * (i + 1) / nheads) for i in range(nheads)], np.float32
    )
