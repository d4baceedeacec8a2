"""Pure-jnp attention reference — the correctness oracle and behavioral spec.

Mirrors the reference repo's PyTorch oracle ``attention_ref``
(/root/reference/test.py:310-397) plus its mask/bias constructors
(``construct_local_mask`` /root/reference/test.py:275-308,
``attn_bias_from_alibi_slopes`` /root/reference/test.py:247-273), re-expressed
in JAX. All higher layers (Pallas kernels, paged decode, quantized KV) are
tested against this oracle with the reference's dual-reference tolerance
scheme (impl error <= 2x the low-precision oracle's own error,
/root/reference/test.py:975,1296).

Layout convention matches the reference API: q is (batch, seqlen_q, heads,
head_dim); k/v are (batch, seqlen_k, kv_heads, head_dim) with
heads % kv_heads == 0 (GQA/MQA).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def construct_local_mask(
    seqlen_q: int,
    seqlen_k: int,
    window_size=(-1, -1),
    query_padding_mask=None,  # (b, sq) bool, True = real token
    key_padding_mask=None,  # (b, sk) bool
    key_leftpad=None,  # (b,) int32
):
    """True where the score is masked OUT (local/causal window violation).

    Geometry is bottom-right aligned: query row i attends to key cols j with
    i + sk - sq - left <= j <= i + sk - sq + right, matching
    /root/reference/test.py:275-308.
    """
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]  # (sq, 1)
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)[None, :]  # (1, sk)
    col_idx = jnp.broadcast_to(col_idx, (1, 1, 1, seqlen_k))
    if key_leftpad is not None:
        key_leftpad = key_leftpad.reshape(-1, 1, 1, 1)
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        jnp.asarray(seqlen_k, jnp.int32)
        if key_padding_mask is None
        else key_padding_mask.sum(-1).astype(jnp.int32).reshape(-1, 1, 1, 1)
    )
    sq = (
        jnp.asarray(seqlen_q, jnp.int32)
        if query_padding_mask is None
        else query_padding_mask.sum(-1).astype(jnp.int32).reshape(-1, 1, 1, 1)
    )
    if window_size[0] < 0:
        return col_idx > row_idx + sk - sq + window_size[1]
    else:
        sk_full = (
            jnp.full_like(col_idx, seqlen_k) if key_padding_mask is None else sk
        )
        return jnp.logical_or(
            col_idx > jnp.minimum(row_idx + sk - sq + window_size[1], sk_full),
            col_idx < row_idx + sk - sq - window_size[0],
        )


def attn_bias_from_alibi_slopes(
    slopes,  # (b, h) or (h,)
    seqlen_q: int,
    seqlen_k: int,
    query_padding_mask=None,
    key_padding_mask=None,
    causal: bool = False,
    key_leftpad=None,
):
    """ALiBi bias, matching /root/reference/test.py:247-273."""
    if slopes.ndim == 1:
        slopes = slopes[None, :]
    slopes = slopes[:, :, None, None].astype(jnp.float32)  # (b, h, 1, 1)
    if causal:
        bias = jnp.arange(-seqlen_k + 1, 1, dtype=jnp.float32)  # (sk,)
        return bias[None, None, None, :] * slopes
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)[None, None, None, :]
    if key_leftpad is not None:
        key_leftpad = key_leftpad.reshape(-1, 1, 1, 1)
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        jnp.asarray(seqlen_k, jnp.int32)
        if key_padding_mask is None
        else key_padding_mask.sum(-1).astype(jnp.int32).reshape(-1, 1, 1, 1)
    )
    sq = (
        jnp.asarray(seqlen_q, jnp.int32)
        if query_padding_mask is None
        else query_padding_mask.sum(-1).astype(jnp.int32).reshape(-1, 1, 1, 1)
    )
    relative_pos = jnp.abs(row_idx + sk - sq - col_idx)
    return -slopes * relative_pos.astype(jnp.float32)


def attention_ref(
    q,  # (b, sq, h, d)
    k,  # (b, sk, h_k, d)
    v,  # (b, sk, h_k, d)
    query_padding_mask=None,  # (b, sq) bool, True = keep
    key_padding_mask=None,  # (b, sk) bool
    attn_bias=None,  # broadcastable to (b, h, sq, sk)
    dropout_p: float = 0.0,
    dropout_mask=None,  # (b, h, sq, sk) bool, True = keep
    causal: bool = False,
    window_size=(-1, -1),
    softcap: float = 0.0,
    upcast: bool = True,
    reorder_ops: bool = False,
    key_leftpad=None,
    softmax_scale=None,
):
    """Einsum softmax attention oracle (/root/reference/test.py:310-397).

    Returns (output (b, sq, h, d), attention (b, h, sq, sk) post-dropout-mask
    pre-scaling softmax probabilities).
    """
    if causal:
        window_size = (window_size[0], 0)
    dtype_og = q.dtype
    if upcast:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    seqlen_q, seqlen_k = q.shape[1], k.shape[1]
    g = q.shape[2] // k.shape[2]
    k = jnp.repeat(k, g, axis=2)
    v = jnp.repeat(v, g, axis=2)
    d = q.shape[-1]
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)
    if not reorder_ops:
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
    else:
        scores = jnp.einsum("bthd,bshd->bhts", q, k * scale)
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    if key_padding_mask is not None:
        scores = jnp.where(
            key_padding_mask[:, None, None, :], scores, -jnp.inf
        )
    local_mask = None
    if window_size[0] >= 0 or window_size[1] >= 0:
        local_mask = construct_local_mask(
            seqlen_q,
            seqlen_k,
            window_size,
            query_padding_mask,
            key_padding_mask,
            key_leftpad=key_leftpad,
        )
        scores = jnp.where(local_mask, -jnp.inf, scores)
    if attn_bias is not None:
        scores = scores + attn_bias
    attention = jnp.exp(
        scores - jnp.max(scores, axis=-1, keepdims=True, initial=-jnp.inf)
    )
    # Rows that are fully masked produce exp(-inf - -inf) = NaN; zero them.
    attention = jnp.where(jnp.isnan(attention), 0.0, attention)
    denom = attention.sum(-1, keepdims=True)
    attention = jnp.where(denom > 0, attention / jnp.where(denom > 0, denom, 1.0), 0.0)
    attention = attention.astype(v.dtype)
    if local_mask is not None:
        attention = jnp.where(jnp.all(local_mask, axis=-1, keepdims=True), 0.0, attention)
    if query_padding_mask is not None:
        attention = jnp.where(
            query_padding_mask[:, None, :, None], attention, 0.0
        )
    dropout_scaling = 1.0 / (1 - dropout_p)
    if dropout_mask is not None:
        attention_drop = jnp.where(dropout_mask, attention, 0.0)
    else:
        attention_drop = attention
    output = jnp.einsum("bhts,bshd->bthd", attention_drop, v * dropout_scaling)
    if query_padding_mask is not None:
        output = jnp.where(query_padding_mask[:, :, None, None], output, 0.0)
    return output.astype(dtype_og), attention.astype(dtype_og)
