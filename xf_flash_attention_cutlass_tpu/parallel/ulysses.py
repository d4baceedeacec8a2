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
constraint.

GQA with h_k < n_devices (round-4 verdict #7): devices form groups of
n/h_k that share one kv head, so each kv head is REPEATED n/h_k times
onto the expanded head axis and ONE all_to_all lands head i//(n/h_k)'s
full sequence on device i — per-device egress/ingress is O(s*d) per
side, the information minimum (each device must receive its kv head's
full sequence), vs the old full-KV all-gather's O(h_k*s*d). The gather
remains only for h_k == 1 (same traffic class — one head IS the full KV)
and for h_k not dividing n; both log the fallback.

Usage: inside shard_map with q/k/v sequence-sharded on an axis (default
"cp"); each device holds (b, h, s_local, d) with device i owning tokens
[i*s_local, (i+1)*s_local).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention

logger = logging.getLogger(__name__)


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
    elif 1 < h_k and n % h_k == 0:
        # grouped GQA all-to-all: devices [j*n/h_k, (j+1)*n/h_k) all need
        # kv head j over the full sequence. Repeating each kv head n/h_k
        # times expands the head axis to n, and the plain all_to_all then
        # delivers expanded head i == kv head i // (n/h_k) to device i —
        # O(s*d) per-device traffic per side (the minimum: every device
        # must receive its head's full sequence) instead of the
        # all-gather's O(h_k*s*d)
        gsz = n // h_k
        kh = jax.lax.all_to_all(
            jnp.repeat(k, gsz, axis=1), axis_name,
            split_axis=1, concat_axis=2, tiled=True,
        )  # (b, 1, s, d)
        vh = jax.lax.all_to_all(
            jnp.repeat(v, gsz, axis=1), axis_name,
            split_axis=1, concat_axis=2, tiled=True,
        )
        # local q heads [i*h/n, (i+1)*h/n) all map to kv head
        # (i*h/n)//(h/h_k) == i//gsz — exactly the head just received
    else:
        # h_k == 1 (MQA: the one head IS the full KV — gather and the
        # grouped path move identical bytes) or h_k not dividing n: keep
        # every kv head, gather the sequence axis, select this device's
        # heads (global q head i*h/n + j pairs with kv head
        # (i*h/n + j)//(h/h_k))
        # warning when this is a real degradation (GQA heads that don't
        # divide the axis) — silent traffic-class change, same precedent
        # as the varlen dense-gather fallback. MQA (h_k == 1) stays at
        # debug: there the gather moves the same bytes as the grouped a2a.
        lvl = logging.DEBUG if h_k == 1 else logging.WARNING
        logger.log(
            lvl,
            "ulysses_attention: h_k=%d vs axis size %d takes the full-KV "
            "all-gather (O(h_k*s*d) per-device traffic)", h_k, n,
        )
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
