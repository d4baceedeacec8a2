"""Ring attention — context parallelism over the ICI ring.

Long-context scaling the reference only does intra-chip (split-KV,
SURVEY.md §5): here the KV axis is sharded across devices, KV chunks rotate
around the ring via `ppermute`, and partial (O, LSE) pairs merge with the
same logsumexp algebra as the split-KV combine (ops/combine.py `merge_two`)
— same math, different transport, exactly the correspondence SURVEY.md §2.5
predicted.

Usage: inside shard_map with q/k/v sharded along the sequence axis of a
"cp" mesh axis; each device holds (b, h, s_local, d) chunks in ring order.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.combine import merge_two
from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd


def ring_attention(
    q: jax.Array,  # (b, h, s_q_local, d) — this device's query chunk
    k: jax.Array,  # (b, h_k, s_k_local, d) — this device's KV chunk
    v: jax.Array,
    axis_name: str = "cp",
    *,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact attention over the globally-concatenated sequence. Returns the
    local (O, LSE) chunk. Chunk ownership must follow ring order: device i
    holds tokens [i*s_local, (i+1)*s_local)."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qpos = (idx * s_q + jnp.arange(s_q, dtype=jnp.int32))[None].repeat(b, 0)

    def step(t, carry):
        o, lse, kc, vc = carry
        src = (idx - t) % n  # origin device of the current kv chunk

        def attend(_):
            kpos = (src * s_k + jnp.arange(s_k, dtype=jnp.int32))[None].repeat(b, 0)
            o_t, lse_t = flash_fwd(
                q,
                kc,
                vc,
                causal=causal,
                softmax_scale=softmax_scale,
                q_positions=qpos,
                kv_positions=kpos,
                interpret=interpret,
            )
            return o_t.astype(jnp.float32), lse_t

        def skip(_):
            return (
                jnp.zeros((b, h, s_q, d), jnp.float32),
                jnp.full((b, h, s_q), -jnp.inf, jnp.float32),
            )

        if causal:
            # chunks entirely in this device's future are fully masked:
            # skip the kernel, merge the identity partial (the intra-chip
            # analog: n_block_max trimming, flash_fwd_kernel.h:81-88)
            o_t, lse_t = jax.lax.cond(src > idx, skip, attend, None)
        else:
            o_t, lse_t = attend(None)
        o, lse = merge_two(o, lse, o_t, lse_t)
        # rotate kv to the next device (skip the final dead rotation)
        kc, vc = jax.lax.cond(
            t < n - 1,
            lambda kv: tuple(
                jax.lax.ppermute(x, axis_name, perm) for x in kv
            ),
            lambda kv: kv,
            (kc, vc),
        )
        return o, lse, kc, vc

    o0 = jnp.zeros((b, h, s_q, d), jnp.float32)
    lse0 = jnp.full((b, h, s_q), -jnp.inf, jnp.float32)
    o, lse, _, _ = jax.lax.fori_loop(0, n, step, (o0, lse0, k, v))
    return o.astype(q.dtype), lse
