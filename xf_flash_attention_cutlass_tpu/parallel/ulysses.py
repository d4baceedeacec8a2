"""Ulysses sequence parallelism — all-to-all context parallelism.

The second CP flavor (the reference has no inter-device parallelism at all,
SURVEY.md §2.5): where ring attention (parallel/ring.py) rotates KV chunks
around the ICI ring with an (O, LSE) merge per hop, Ulysses re-shards with
two all-to-alls — sequence-sharded activations become head-sharded for the
attention itself, so each device runs the plain dense flash kernel over the
FULL sequence for h/n heads, then the output is re-sharded back to
sequence. Two collectives total (plus one for LSE), no per-hop merges, and
the kernel sees contiguous causal structure — on TPU the all-to-alls ride
ICI and XLA overlaps them with the projections on either side.

Trade-off vs ring: Ulysses needs head_count % n_devices == 0 and moves
q+k+v+o once each; ring moves k+v (n-1) times but has no head-divisibility
constraint. GQA with few KV heads is handled by all-gathering KV along the
sequence axis when h_k < n_devices (KV is small in GQA, so the gather is
cheap relative to q/o all-to-alls).

Usage: inside shard_map with q/k/v sequence-sharded on an axis (default
"cp"); each device holds (b, h, s_local, d) with device i owning tokens
[i*s_local, (i+1)*s_local).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention


def ulysses_attention(
    q: jax.Array,  # (b, h, s_local, d) — this device's sequence chunk
    k: jax.Array,  # (b, h_k, s_local, d)
    v: jax.Array,
    axis_name: str = "cp",
    *,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact attention over the globally-concatenated sequence. Returns the
    local (O, LSE) chunk, matching ring_attention's contract."""
    b, h, s_local, d = q.shape
    h_k = k.shape[1]
    n = jax.lax.axis_size(axis_name)
    if h % n:
        raise ValueError(f"q heads {h} must be divisible by axis size {n}")

    # seq-sharded -> head-sharded: (b, h, s_local, d) -> (b, h/n, s, d)
    qh = jax.lax.all_to_all(q, axis_name, split_axis=1, concat_axis=2, tiled=True)
    if h_k % n == 0:
        kh = jax.lax.all_to_all(k, axis_name, split_axis=1, concat_axis=2, tiled=True)
        vh = jax.lax.all_to_all(v, axis_name, split_axis=1, concat_axis=2, tiled=True)
        # head-group alignment: q heads [i*h/n, (i+1)*h/n) pair with kv
        # heads [i*h_k/n, ...) — the GQA grouping q_head // (h/h_k) maps
        # consistently because h/h_k is preserved per shard
    else:
        # few-KV-head GQA: keep every kv head, gather the sequence axis,
        # then select the kv heads this device's q-head block maps to
        # (global q head i*h/n + j pairs with kv head (i*h/n + j)//(h/h_k))
        kh = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
        vh = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
        i = jax.lax.axis_index(axis_name)
        h_local = h // n
        head_idx = (i * h_local + jnp.arange(h_local)) // (h // h_k)
        kh = jnp.take(kh, head_idx, axis=1)
        vh = jnp.take(vh, head_idx, axis=1)

    o_h, lse_h = flash_attention(
        qh,
        kh,
        vh,
        causal=causal,
        window=window,
        softcap=softcap,
        softmax_scale=softmax_scale,
        interpret=interpret,
    )

    # head-sharded -> seq-sharded
    o = jax.lax.all_to_all(
        o_h.astype(q.dtype), axis_name, split_axis=2, concat_axis=1, tiled=True
    )
    lse = jax.lax.all_to_all(
        lse_h, axis_name, split_axis=2, concat_axis=1, tiled=True
    )
    return o, lse
