"""KV-cache attention: append + rotary + paged/dense decode.

The TPU re-design of the reference's `mha_fwd_kvcache`
(/root/reference/export.cpp:1433-1754) and its C wrapper
`fmha_page_kvcache_fwd` (/root/reference/csrc/paged_attn.cpp:442-561) —
including the parts the snapshot left dead (the pybind layer builds rotary /
append / cache_batch_idx params but passes nullptrs at export.cpp:1703-1735;
here they all work).

Key structural departures from the reference (deliberate, TPU-first):
- **One kernel for dense and paged caches.** A dense (b, sk, h_k, d) cache is
  viewed as pages of DEFAULT_PAGE rows with an identity block table, so the
  scalar-prefetch paged kernel (ops/paged.py) serves both — the reference
  maintains two code paths.
- **Append is a separate scatter, not fused into the attention kernel**
  (reference fuses it, flash_fwd_kernel.h:809-926): on TPU a small scatter is
  its own XLA op that overlaps with unrelated work, and JAX arrays are
  immutable so the updated caches are *returned*.
- Rotary is applied functionally before the append (ops/rotary.py), matching
  the reference's position semantics: q rotates at cache_seqlens + t when
  causal/local, else all rows at cache_seqlens; new keys rotate at
  cache_seqlens + t (/root/reference/test.py:1462-1482).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention
from xf_flash_attention_cutlass_tpu.ops.rotary import apply_rotary
from xf_flash_attention_cutlass_tpu.utils import next_multiple

DEFAULT_PAGE = 256  # page rows used when viewing a dense cache as paged


def _scatter_rows(pool, pe, row, values, layer_idx=None):
    """pool[(l,) pe_i, :, row_i] = values_i — the page-table row scatter."""
    if layer_idx is None:
        return pool.at[pe, :, row].set(values.astype(pool.dtype))
    return pool.at[layer_idx, pe, :, row].set(values.astype(pool.dtype))


def append_kv_paged(
    k_pool: jax.Array,  # (num_pages, h_k, page, d), or (L, ...) with layer_idx
    v_pool: jax.Array,
    k_new: jax.Array,  # (b, s_new, h_k, d)
    v_new: jax.Array,
    block_tables: jax.Array,  # (b, max_pages) int32
    cache_seqlens: jax.Array,  # (b,) int32 — insert position per batch
    layer_idx: Optional[jax.Array] = None,  # scalar: pools carry a layer axis
    page_size: Optional[int] = None,  # true tokens/page for padded pools
) -> Tuple[jax.Array, jax.Array]:
    """Scatter new tokens into the paged pool (internal layout)."""
    num_pages, h_k, page, d = k_pool.shape[-4:]
    if page_size is not None:
        page = int(page_size)
    b, s_new, _, _ = k_new.shape
    t = jnp.arange(s_new, dtype=jnp.int32)[None, :]  # (1, s_new)
    pos = cache_seqlens.astype(jnp.int32)[:, None] + t  # (b, s_new)
    logical_page = pos // page
    row = (pos % page).reshape(-1)
    pe = jnp.take_along_axis(
        block_tables.astype(jnp.int32), logical_page, axis=1
    ).reshape(-1)
    kv = k_new.reshape(b * s_new, h_k, d)
    vv = v_new.reshape(b * s_new, h_k, d)
    k_pool = _scatter_rows(k_pool, pe, row, kv, layer_idx)
    v_pool = _scatter_rows(v_pool, pe, row, vv, layer_idx)
    return k_pool, v_pool


def append_kv_paged_quantized(
    k_pool: jax.Array,  # (num_pages, h_k, page, d) int8/fp8 values
    k_scales: jax.Array,  # (num_pages, h_k, page) f32
    v_pool: jax.Array,
    v_scales: jax.Array,
    k_new: jax.Array,  # (b, s_new, h_k, d) full precision
    v_new: jax.Array,
    block_tables: jax.Array,
    cache_seqlens: jax.Array,
    layer_idx: Optional[jax.Array] = None,
    page_size: Optional[int] = None,  # true tokens/page for padded pools
):
    """Quantize new tokens per-token and scatter values + scales."""
    from xf_flash_attention_cutlass_tpu.quant.kv import quantize_kv

    squeeze = k_scales.ndim == k_pool.ndim  # accept (..., 1) from quantize_kv
    if squeeze:
        k_scales = k_scales[..., 0]
        v_scales = v_scales[..., 0]
    num_pages, h_k, page, d = k_pool.shape[-4:]
    if page_size is not None:
        page = int(page_size)
    b, s_new, _, _ = k_new.shape
    t = jnp.arange(s_new, dtype=jnp.int32)[None, :]
    pos = cache_seqlens.astype(jnp.int32)[:, None] + t
    logical_page = pos // page
    row = (pos % page).reshape(-1)
    pe = jnp.take_along_axis(
        block_tables.astype(jnp.int32), logical_page, axis=1
    ).reshape(-1)
    kq, ks = quantize_kv(k_new.reshape(b * s_new, h_k, d), k_pool.dtype)
    vq, vs = quantize_kv(v_new.reshape(b * s_new, h_k, d), v_pool.dtype)
    k_pool = _scatter_rows(k_pool, pe, row, kq, layer_idx)
    v_pool = _scatter_rows(v_pool, pe, row, vq, layer_idx)
    if layer_idx is None:
        k_scales = k_scales.at[pe, :, row].set(ks[..., 0])
        v_scales = v_scales.at[pe, :, row].set(vs[..., 0])
    else:
        k_scales = k_scales.at[layer_idx, pe, :, row].set(ks[..., 0])
        v_scales = v_scales.at[layer_idx, pe, :, row].set(vs[..., 0])
    if squeeze:
        k_scales = k_scales[..., None]
        v_scales = v_scales[..., None]
    return k_pool, k_scales, v_pool, v_scales


def append_kv_dense(
    k_cache: jax.Array,  # (b_cache, sk, h_k, d)
    v_cache: jax.Array,
    k_new: jax.Array,  # (b, s_new, h_k, d)
    v_new: jax.Array,
    cache_seqlens: jax.Array,  # (b,) int32
    cache_batch_idx: Optional[jax.Array] = None,  # (b,) int32
) -> Tuple[jax.Array, jax.Array]:
    b_cache, sk, h_k, d = k_cache.shape
    b, s_new, _, _ = k_new.shape
    cbi = (
        cache_batch_idx.astype(jnp.int32)
        if cache_batch_idx is not None
        else jnp.arange(b, dtype=jnp.int32)
    )
    t = jnp.arange(s_new, dtype=jnp.int32)[None, :]
    rows = (
        cbi[:, None] * sk + cache_seqlens.astype(jnp.int32)[:, None] + t
    ).reshape(-1)
    kc = k_cache.reshape(b_cache * sk, h_k, d)
    vc = v_cache.reshape(b_cache * sk, h_k, d)
    kc = kc.at[rows].set(k_new.reshape(-1, h_k, d).astype(kc.dtype))
    vc = vc.at[rows].set(v_new.reshape(-1, h_k, d).astype(vc.dtype))
    return kc.reshape(b_cache, sk, h_k, d), vc.reshape(b_cache, sk, h_k, d)


def dense_cache_as_paged(
    cache: jax.Array, page: int = DEFAULT_PAGE
) -> Tuple[jax.Array, int]:
    """(b, sk, h_k, d) -> internal pool (b*pages, h_k, page, d); returns
    (pool, pages_per_seq). Padding rows are masked by kv_lens downstream."""
    b, sk, h_k, d = cache.shape
    sk_pad = next_multiple(sk, page)
    if sk_pad != sk:
        cache = jnp.pad(cache, ((0, 0), (0, sk_pad - sk), (0, 0), (0, 0)))
    pages = sk_pad // page
    pool = cache.reshape(b, pages, page, h_k, d).transpose(0, 1, 3, 2, 4)
    return pool.reshape(b * pages, h_k, page, d), pages


def attention_with_kvcache(
    q: jax.Array,  # (b, sq, h, d)
    k_cache: jax.Array,  # (b_cache, sk, h_k, d) or (num_blocks, page, h_k, d)
    v_cache: jax.Array,
    k_new: Optional[jax.Array] = None,  # (b, s_new, h_k, d)
    v_new: Optional[jax.Array] = None,
    rotary_cos: Optional[jax.Array] = None,  # (max_pos, r/2)
    rotary_sin: Optional[jax.Array] = None,
    cache_seqlens=None,  # int or (b,) int32
    cache_batch_idx: Optional[jax.Array] = None,  # (b,) int32
    cache_leftpad: Optional[jax.Array] = None,  # (b,) int32
    block_table: Optional[jax.Array] = None,  # (b, max_blocks) int32
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    rotary_interleaved: bool = True,
    alibi_slopes: Optional[jax.Array] = None,
    num_splits: int = 0,
    return_softmax_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Decode/append attention against a dense or paged KV cache.

    Returns (out[, lse], k_cache, v_cache) — caches in the caller's layout,
    updated when k_new/v_new were given (JAX analog of the reference's
    in-place mutation, /root/reference/test.py:1591-1592).
    """
    b, sq, h, d = q.shape
    paged = block_table is not None
    h_k = k_cache.shape[2]
    window_size = tuple(int(w) for w in window_size)

    if cache_seqlens is None:
        if k_new is not None:
            raise ValueError("cache_seqlens is required when appending new KV")
        sk_total = (
            block_table.shape[1] * k_cache.shape[1] if paged else k_cache.shape[1]
        )
        cache_seqlens = jnp.full((b,), sk_total, jnp.int32)
    elif jnp.ndim(cache_seqlens) == 0:
        cache_seqlens = jnp.full((b,), cache_seqlens, jnp.int32)
    else:
        cache_seqlens = jnp.asarray(cache_seqlens, jnp.int32)

    s_new = 0 if k_new is None else k_new.shape[1]

    # ---- rotary -----------------------------------------------------------
    if rotary_cos is not None and s_new > 0:
        t_q = jnp.arange(sq, dtype=jnp.int32)[None, :]
        if causal or window_size[0] >= 0 or window_size[1] >= 0:
            q_pos = cache_seqlens[:, None] + t_q
        else:
            q_pos = jnp.broadcast_to(cache_seqlens[:, None], (b, sq))
        q = apply_rotary(q, rotary_cos, rotary_sin, q_pos, rotary_interleaved)
        t_k = jnp.arange(s_new, dtype=jnp.int32)[None, :]
        k_new = apply_rotary(
            k_new,
            rotary_cos,
            rotary_sin,
            cache_seqlens[:, None] + t_k,
            rotary_interleaved,
        )

    # ---- append + pool construction --------------------------------------
    if paged:
        page = k_cache.shape[1]
        num_blocks = k_cache.shape[0]
        # reference layout (num_blocks, page, h_k, d) -> internal
        k_pool = k_cache.transpose(0, 2, 1, 3)
        v_pool = v_cache.transpose(0, 2, 1, 3)
        bt = block_table.astype(jnp.int32)
        if k_new is not None:
            k_pool, v_pool = append_kv_paged(
                k_pool, v_pool, k_new, v_new, bt, cache_seqlens
            )
        k_cache_out = k_pool.transpose(0, 2, 1, 3)
        v_cache_out = v_pool.transpose(0, 2, 1, 3)
    else:
        if k_new is not None:
            k_cache, v_cache = append_kv_dense(
                k_cache, v_cache, k_new, v_new, cache_seqlens, cache_batch_idx
            )
        k_cache_out, v_cache_out = k_cache, v_cache
        kc, vc = k_cache, v_cache
        if cache_batch_idx is not None:
            kc = kc[cache_batch_idx.astype(jnp.int32)]
            vc = vc[cache_batch_idx.astype(jnp.int32)]
        page = min(DEFAULT_PAGE, next_multiple(kc.shape[1], 8))
        k_pool, pages = dense_cache_as_paged(kc, page)
        v_pool, _ = dense_cache_as_paged(vc, page)
        bt = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * pages
            + jnp.arange(pages, dtype=jnp.int32)[None, :]
        )

    kv_lens = cache_seqlens + s_new

    out, lse = paged_attention(
        q,
        k_pool,
        v_pool,
        bt,
        kv_lens,
        softmax_scale=softmax_scale,
        causal=causal,
        window=window_size,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        cache_leftpad=cache_leftpad,
        num_splits=num_splits,
        interpret=interpret,
    )
    if return_softmax_lse:
        return out, lse, k_cache_out, v_cache_out
    return out, k_cache_out, v_cache_out
