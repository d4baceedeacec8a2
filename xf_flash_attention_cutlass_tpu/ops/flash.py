"""Differentiable flash attention: fwd Pallas kernel + custom-VJP backward.

The forward is ops.flash_fwd; the backward (ops.flash_bwd) recomputes
attention blockwise from (Q, K, V, O, LSE) residuals, the TPU re-design of the
reference's seq-parallel backward (flash_bwd_kernel.h:86-721) — which the
reference itself ships compiled out (CMakeLists.txt:72). Here it is enabled
for all head dims.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax

from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd

_STATIC = (
    "causal",
    "window",
    "softcap",
    "dropout_p",
    "dropout_seed",
    "softmax_scale",
    "block_q",
    "block_k",
    "interpret",
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, cfg, alibi_slopes, alibi_row_slopes, q_segment_ids,
           kv_segment_ids, q_positions, kv_positions):
    o, lse = flash_fwd(
        q, k, v,
        alibi_slopes=alibi_slopes,
        alibi_row_slopes=alibi_row_slopes,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
        q_positions=q_positions,
        kv_positions=kv_positions,
        **dict(cfg),
    )
    return o, lse


def _flash_fwd_rule(q, k, v, cfg, alibi_slopes, alibi_row_slopes,
                    q_segment_ids, kv_segment_ids, q_positions,
                    kv_positions):
    o, lse = _flash(q, k, v, cfg, alibi_slopes, alibi_row_slopes,
                    q_segment_ids, kv_segment_ids, q_positions, kv_positions)
    res = (q, k, v, o, lse, alibi_slopes, alibi_row_slopes, q_segment_ids,
           kv_segment_ids, q_positions, kv_positions)
    return (o, lse), res


def _flash_bwd_rule(cfg, res, cts):
    from xf_flash_attention_cutlass_tpu.ops.flash_bwd import flash_bwd

    (q, k, v, o, lse, alibi_slopes, alibi_row_slopes, q_segment_ids,
     kv_segment_ids, q_positions, kv_positions) = res
    do, _ = cts  # cotangent wrt LSE is not propagated
    d = dict(cfg)
    dq, dk, dv = flash_bwd(
        q, k, v, o, lse, do,
        alibi_slopes=alibi_slopes,
        alibi_row_slopes=alibi_row_slopes,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
        q_positions=q_positions,
        kv_positions=kv_positions,
        causal=d["causal"],
        window=d["window"],
        softcap=d["softcap"],
        dropout_p=d["dropout_p"],
        dropout_seed=d["dropout_seed"],
        softmax_scale=d["softmax_scale"],
        interpret=d["interpret"],
    )
    return dq, dk, dv, None, None, None, None, None, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,  # (b, h, sq, d)
    k: jax.Array,  # (b, h_k, sk, d)
    v: jax.Array,
    *,
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    alibi_row_slopes: Optional[jax.Array] = None,  # (b, h, sq) f32
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Differentiable BHSD flash attention. Returns (O, LSE)."""
    cfg = tuple(
        {
            "causal": causal,
            "window": tuple(window),
            "softcap": softcap,
            "dropout_p": dropout_p,
            "dropout_seed": dropout_seed,
            "softmax_scale": softmax_scale,
            "block_q": block_q,
            "block_k": block_k,
            "interpret": interpret,
        }.items()
    )
    return _flash(q, k, v, cfg, alibi_slopes, alibi_row_slopes,
                  q_segment_ids, kv_segment_ids, q_positions, kv_positions)
