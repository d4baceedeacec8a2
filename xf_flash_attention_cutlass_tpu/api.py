"""Public API mirroring the reference's Python surface
(/root/reference/test.py:41-245): BSHD-layout ``flash_attn_func``,
``flash_attn_varlen_func`` and ``flash_attn_with_kvcache``.

These wrappers adapt the reference's (batch, seq, heads, dim) layout to the
kernels' native (batch, heads, seq, dim); performance-critical callers should
use the BHSD kernel entry points in ``ops`` directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention

MAX_HEADDIM = 256  # matches the reference dispatch ladder (flash_fwd_launch_template.h)


def _check(cond: bool, msg: str):
    """Host-side input validation — the analog of the reference's
    TORCH_CHECK layer (export.cpp:488-568)."""
    if not cond:
        raise ValueError(msg)


def _check_qkv(q, k, v, q_rank: int):
    _check(q.ndim == q_rank, f"q must be rank {q_rank}, got shape {q.shape}")
    _check(k.ndim == q_rank and v.ndim == q_rank,
           f"k/v must be rank {q_rank}, got {k.shape} / {v.shape}")
    _check(q.dtype == k.dtype == v.dtype,
           f"q/k/v dtypes must match, got {q.dtype}/{k.dtype}/{v.dtype}")
    _check(q.dtype in (jnp.float16, jnp.bfloat16, jnp.float32),
           f"unsupported dtype {q.dtype}; use fp16/bf16/fp32")
    _check(k.shape == v.shape, f"k and v shapes must match: {k.shape} vs {v.shape}")
    h, hk, d = q.shape[-2], k.shape[-2], q.shape[-1]
    _check(k.shape[-1] == d, f"head dims differ: q {d} vs k {k.shape[-1]}")
    _check(h % hk == 0, f"q heads ({h}) must be a multiple of kv heads ({hk})")
    _check(0 < d <= MAX_HEADDIM, f"head_dim must be in (0, {MAX_HEADDIM}], got {d}")


def flash_attn_func(
    q: jax.Array,  # (b, sq, h, d)
    k: jax.Array,  # (b, sk, h_k, d)
    v: jax.Array,  # (b, sk, h_k, d)
    dropout_p: float = 0.0,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    softmax_scale: Optional[float] = None,
    dropout_seed: int = 0,
):
    """Dense flash attention (reference: test.py:41-72). Differentiable.

    ``deterministic`` is accepted for signature parity and ignored: the TPU
    kernels are deterministic by construction (sequential grid accumulation,
    no atomics), so the reference's deterministic/fast trade-off
    (flash_api.cpp `deterministic` -> dq_accum splits) has no analog here.

    With ``return_attn_probs=True`` returns ``(out, lse, S_dmask)`` where
    S_dmask is the (b, h, sq, sk) normalized probability plane with entries
    the seeded dropout dropped NEGATED (the reference's sign encoding,
    dropout.h:71-77), regenerated from the same per-block counter seeds the
    kernel used — suitable for exact mask extraction in tests.
    """
    del deterministic  # TPU kernels are deterministic by construction
    _check_qkv(q, k, v, 4)
    _check(q.shape[0] == k.shape[0], f"batch mismatch: {q.shape[0]} vs {k.shape[0]}")
    _check(0.0 <= dropout_p < 1.0, f"dropout_p must be in [0, 1), got {dropout_p}")
    out, lse = flash_attention(
        q.swapaxes(1, 2),
        k.swapaxes(1, 2),
        v.swapaxes(1, 2),
        causal=causal,
        window=window_size,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        dropout_p=dropout_p,
        dropout_seed=dropout_seed,
        softmax_scale=softmax_scale,
    )
    out = out.swapaxes(1, 2)
    if return_attn_probs:
        from xf_flash_attention_cutlass_tpu.ops.flash_fwd import attention_probs

        s_dmask = attention_probs(
            q.swapaxes(1, 2),
            k.swapaxes(1, 2),
            lse,
            causal=causal,
            window=window_size,
            softcap=softcap,
            alibi_slopes=alibi_slopes,
            dropout_p=dropout_p,
            dropout_seed=dropout_seed,
            softmax_scale=softmax_scale,
        )
        return out, lse, s_dmask
    return out


def flash_attn_kvpacked_func(
    q: jax.Array,  # (b, sq, h, d)
    kv: jax.Array,  # (b, sk, 2, h_k, d)
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,
    deterministic: bool = False,
    return_softmax: bool = False,
    dropout_seed: int = 0,
):
    """Dense attention over a packed (K, V) tensor (reference: test.py:74-100).

    ``kv[:, :, 0]`` is K and ``kv[:, :, 1]`` is V; XLA sees the unstack as a
    free view, so packing costs nothing on TPU.
    """
    _check(kv.ndim == 5 and kv.shape[2] == 2,
           f"kv must be (b, sk, 2, h_k, d), got {kv.shape}")
    return flash_attn_func(
        q,
        kv[:, :, 0],
        kv[:, :, 1],
        dropout_p=dropout_p,
        softmax_scale=softmax_scale,
        causal=causal,
        window_size=window_size,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        deterministic=deterministic,
        return_attn_probs=return_softmax,
        dropout_seed=dropout_seed,
    )


def flash_attn_varlen_kvpacked_func(
    q,  # (total_q, h, d)
    kv,  # (total_k, 2, h_k, d)
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int,
    max_seqlen_k: int,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    dropout_seed: int = 0,
):
    """Ragged-batch attention over packed (K, V) (reference: test.py:151-187)."""
    _check(kv.ndim == 4 and kv.shape[1] == 2,
           f"kv must be (total_k, 2, h_k, d), got {kv.shape}")
    return flash_attn_varlen_func(
        q,
        kv[:, 0],
        kv[:, 1],
        cu_seqlens_q,
        cu_seqlens_k,
        max_seqlen_q,
        max_seqlen_k,
        dropout_p=dropout_p,
        softmax_scale=softmax_scale,
        causal=causal,
        window_size=window_size,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        deterministic=deterministic,
        return_attn_probs=return_attn_probs,
        dropout_seed=dropout_seed,
    )


def flash_attn_varlen_func(
    q,  # (total_q, h, d)
    k,  # (total_k, h_k, d)
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int,
    max_seqlen_k: int,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    block_table=None,
    seqused_k=None,  # (b,) int32: live keys per sequence (export.cpp varlen)
    dropout_seed: int = 0,
):
    """Ragged-batch flash attention (reference: test.py:102-149).

    `deterministic` is accepted and ignored: TPU grids are sequential so
    results are always deterministic. With `return_attn_probs`, the
    non-paged entry serves the packed (h, total_q, total_k) S_dmask via
    `varlen_attn_probs` (the reference's varlen `return_softmax`,
    export.cpp:669-937); the paged entry serves the same packed-key
    convention via `varlen_paged_attn_probs` — an EXTENSION over the
    reference, whose paged varlen path has no softmax return
    (/root/reference/csrc/paged_attn.cpp:425 passes nullptr). The paged
    S_dmask is debug-only: it needs concrete key lengths (no jit).
    """
    from xf_flash_attention_cutlass_tpu.ops.varlen import (
        flash_attn_varlen,
        flash_attn_varlen_paged,
        varlen_attn_probs,
        varlen_paged_attn_probs,
    )

    del deterministic
    _check(q.ndim == 3, f"varlen q must be (total_q, h, d), got {q.shape}")
    _check(0.0 <= dropout_p < 1.0, f"dropout_p must be in [0, 1), got {dropout_p}")
    if block_table is not None:
        # paged-KV ragged prefill (reference: export.cpp:732-741); k/v are
        # the page pools and cu_seqlens_k gives per-sequence cache lengths
        _check(k.ndim == 4, f"paged k must be (num_blocks, page, h_k, d), got {k.shape}")
        _check(block_table.ndim == 2, f"block_table must be (b, max_pages), got {block_table.shape}")
        if seqused_k is None:
            seqused_k = (cu_seqlens_k[1:] - cu_seqlens_k[:-1]).astype(jnp.int32)
        out, lse = flash_attn_varlen_paged(
            q, k, v, block_table, cu_seqlens_q, seqused_k,
            max_seqlen_q=max_seqlen_q,
            causal=causal, window=window_size, softcap=softcap,
            softmax_scale=softmax_scale, alibi_slopes=alibi_slopes,
            dropout_p=dropout_p, dropout_seed=dropout_seed,
        )
        if return_attn_probs:
            s_dmask = varlen_paged_attn_probs(
                q, k, lse, block_table, cu_seqlens_q, seqused_k,
                causal=causal, window=window_size, softcap=softcap,
                softmax_scale=softmax_scale, alibi_slopes=alibi_slopes,
                dropout_p=dropout_p, dropout_seed=dropout_seed,
            )
            return out, lse, s_dmask
        return out
    out, lse = flash_attn_varlen(
        q,
        k,
        v,
        cu_seqlens_q,
        cu_seqlens_k,
        max_seqlen_q=max_seqlen_q,
        max_seqlen_k=max_seqlen_k,
        seqused_k=seqused_k,
        causal=causal,
        window=window_size,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        dropout_p=dropout_p,
        dropout_seed=dropout_seed,
        softmax_scale=softmax_scale,
    )
    if return_attn_probs:
        s_dmask = varlen_attn_probs(
            q, k, lse, cu_seqlens_q, cu_seqlens_k,
            seqused_k=seqused_k, causal=causal, window=window_size,
            softcap=softcap, softmax_scale=softmax_scale,
            alibi_slopes=alibi_slopes, dropout_p=dropout_p,
            dropout_seed=dropout_seed,
        )
        return out, lse, s_dmask
    return out


def flash_attn_with_kvcache(
    q,  # (b, sq, h, d)
    k_cache,  # (b, sk, h_k, d) dense or (num_blocks, page, h_k, d) paged
    v_cache,
    k=None,
    v=None,
    rotary_cos=None,
    rotary_sin=None,
    cache_seqlens=None,
    cache_batch_idx=None,
    cache_leftpad=None,
    block_table=None,
    softmax_scale=None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    rotary_interleaved: bool = True,
    alibi_slopes=None,
    num_splits: int = 0,
    return_softmax_lse: bool = False,
):
    """Paged/dense KV-cache decode+append (reference: test.py:189-245).

    Validation mirrors mha_fwd_kvcache's checks (export.cpp:1449-1540).

    Unlike the torch reference, JAX arrays are immutable: the (possibly
    updated) caches are RETURNED — (out, k_cache, v_cache) or
    (out, lse, k_cache, v_cache) with return_softmax_lse.
    """
    from xf_flash_attention_cutlass_tpu.ops.kvcache import attention_with_kvcache

    _check(q.ndim == 4, f"q must be (b, sq, h, d), got {q.shape}")
    _check(k_cache.ndim == 4, f"k_cache must be rank 4, got {k_cache.shape}")
    _check(k_cache.shape == v_cache.shape,
           f"k_cache/v_cache shapes differ: {k_cache.shape} vs {v_cache.shape}")
    _check(q.shape[-1] == k_cache.shape[-1],
           f"head dims differ: q {q.shape[-1]} vs cache {k_cache.shape[-1]}")
    _check(q.shape[2] % k_cache.shape[2] == 0,
           f"q heads ({q.shape[2]}) must be a multiple of cache kv heads "
           f"({k_cache.shape[2]})")
    if block_table is not None:
        _check(block_table.ndim == 2 and block_table.shape[0] == q.shape[0],
               f"block_table must be (b, max_pages) with b={q.shape[0]}, "
               f"got {block_table.shape}")
        _check(cache_batch_idx is None,
               "cache_batch_idx is incompatible with a paged cache "
               "(reference skips this combination too, test.py:1377)")
    if (k is None) != (v is None):
        raise ValueError("k and v must be given together")
    if k is not None:
        _check(cache_seqlens is not None,
               "cache_seqlens is required when appending new KV")

    return attention_with_kvcache(
        q,
        k_cache,
        v_cache,
        k_new=k,
        v_new=v,
        rotary_cos=rotary_cos,
        rotary_sin=rotary_sin,
        cache_seqlens=cache_seqlens,
        cache_batch_idx=cache_batch_idx,
        cache_leftpad=cache_leftpad,
        block_table=block_table,
        softmax_scale=softmax_scale,
        causal=causal,
        window_size=window_size,
        softcap=softcap,
        rotary_interleaved=rotary_interleaved,
        alibi_slopes=alibi_slopes,
        num_splits=num_splits,
        return_softmax_lse=return_softmax_lse,
    )
