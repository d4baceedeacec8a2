"""(O, LSE) split/merge algebra — the LSE-weighted combine.

This is the math of the reference's `combine_attn_seqk_parallel` kernel
(/root/reference/csrc/flash_attn/src/flash_fwd_kernel.h:1363-1607), which its
snapshot shipped broken (the per-split LSE load is commented out at
:1386-1427, producing the failing test in log.txt). Implemented here as the
*intended* upstream FA2 semantics, with the -inf edge cases handled:

    LSE  = logsumexp_i(LSE_i)
    O    = sum_i exp(LSE_i - LSE) * O_i
    empty partials (LSE_i = -inf) contribute nothing; if all partials are
    empty, O = 0 and LSE = -inf.

Each partial O_i must already be normalized within its split (O_i = P_i V_i /
l_i), which is what ops.flash_fwd and ops.paged emit. The same merge is the
primitive for ring/blockwise context parallelism over ICI (SURVEY.md §5) —
same algebra, different transport.

These are small bandwidth-bound elementwise ops; XLA fuses them well, so they
are plain jnp rather than Pallas (the per-call hipMalloc'd accum buffers of
paged_attn.cpp:533-536 have no TPU analog — partials are ordinary jit values).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def combine_partials(
    o_parts: jax.Array,  # (n_splits, ..., d) fp32 recommended
    lse_parts: jax.Array,  # (n_splits, ...)  fp32
) -> Tuple[jax.Array, jax.Array]:
    """Merge n split-KV partials along axis 0. Returns (O, LSE)."""
    lse_parts = lse_parts.astype(jnp.float32)
    m = jnp.max(lse_parts, axis=0)  # (-inf if all empty)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.exp(lse_parts - m_safe)  # exp(-inf - 0) = 0 for empty splits
    w = jnp.where(jnp.isfinite(lse_parts), w, 0.0)
    sumw = jnp.sum(w, axis=0)
    lse = jnp.where(sumw > 0, m_safe + jnp.log(jnp.where(sumw > 0, sumw, 1.0)), -jnp.inf)
    o = jnp.einsum(
        "s...,s...d->...d", w, o_parts.astype(jnp.float32)
    )
    denom = jnp.where(sumw > 0, sumw, 1.0)[..., None]
    o = jnp.where(sumw[..., None] > 0, o / denom, 0.0)
    return o, lse


def merge_two(
    o1: jax.Array, lse1: jax.Array, o2: jax.Array, lse2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Pairwise merge — the streaming form used by ring attention steps."""
    lse1 = lse1.astype(jnp.float32)
    lse2 = lse2.astype(jnp.float32)
    m = jnp.maximum(lse1, lse2)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w1 = jnp.where(jnp.isfinite(lse1), jnp.exp(lse1 - m_safe), 0.0)
    w2 = jnp.where(jnp.isfinite(lse2), jnp.exp(lse2 - m_safe), 0.0)
    sumw = w1 + w2
    lse = jnp.where(sumw > 0, m_safe + jnp.log(jnp.where(sumw > 0, sumw, 1.0)), -jnp.inf)
    denom = jnp.where(sumw > 0, sumw, 1.0)
    o = (
        w1[..., None] * o1.astype(jnp.float32)
        + w2[..., None] * o2.astype(jnp.float32)
    ) / denom[..., None]
    o = jnp.where(sumw[..., None] > 0, o, 0.0)
    return o, lse
