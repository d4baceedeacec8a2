"""Ragged-batch (varlen) flash attention.

The reference implements varlen with `cu_seqlens` pointer arithmetic inside
the kernel (`BlockInfo`, /root/reference/csrc/flash_attn/src/block_info.h:12-44,
host path paged_attn.cpp:385-433). Under XLA's static shapes the TPU-native
equivalent is *packing*: concatenate all sequences into one row axis and mask
with per-token segment ids; bottom-right-aligned causal/local geometry is
recovered by folding each sequence's (len_k - len_q) offset into the query
position array. The dense Pallas kernel then handles everything, including
the causal block-skip (block position bounds degrade gracefully to the
segment-aware case).

All quantities derived from cu_seqlens are traced jnp ops, so sequence
lengths may be dynamic under jit as long as total_q/total_k stay static —
exactly the continuous-batching contract the serve layer needs.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention
from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention


def segments_from_cu_seqlens(cu_seqlens: jax.Array, total: int) -> jax.Array:
    """Token index -> segment id; tokens past cu_seqlens[-1] get -1."""
    idx = jnp.arange(total, dtype=jnp.int32)
    seg = jnp.searchsorted(cu_seqlens.astype(jnp.int32), idx, side="right") - 1
    nseq = cu_seqlens.shape[0] - 1
    valid = jnp.logical_and(seg >= 0, idx < cu_seqlens[-1])
    seg = jnp.where(valid, jnp.minimum(seg, nseq - 1), -1)
    return seg.astype(jnp.int32)



def _row_slopes_from_segments(alibi_slopes, qseg):
    """(nseq, h)-capable slopes -> per-token (1, h, total_q) plane: token i
    uses its sequence's slope row; pad/ragged tokens (qseg < 0) get slope 0
    (their rows are fully masked anyway). The packed-kernel surface for the
    reference's (batch, num_heads) slopes (export.cpp:456,470)."""
    seg_c = jnp.clip(qseg, 0, alibi_slopes.shape[0] - 1)
    rows = alibi_slopes[seg_c, :]  # (total_q, h)
    rows = jnp.where((qseg >= 0)[:, None], rows, 0.0)
    return rows.T[None]  # (1, h, total_q)


def flash_attn_varlen(
    q: jax.Array,  # (total_q, h, d)
    k: jax.Array,  # (total_k, h_k, d)
    v: jax.Array,
    cu_seqlens_q: jax.Array,  # (b+1,) int32
    cu_seqlens_k: jax.Array,  # (b+1,) int32
    *,
    max_seqlen_q: int,
    max_seqlen_k: int,
    seqused_k: Optional[jax.Array] = None,  # (b,) int32: live keys per seq
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # (h,) only in varlen mode
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out (total_q, h, d), lse (h, total_q)) — unpadded LSE layout,
    matching the reference's `unpadded_lse=true` (paged_attn.cpp:425)."""
    del max_seqlen_q, max_seqlen_k  # shapes are static on TPU
    total_q, h, d = q.shape
    total_k = k.shape[0]
    cu_q = cu_seqlens_q.astype(jnp.int32)
    cu_k = cu_seqlens_k.astype(jnp.int32)

    qseg = segments_from_cu_seqlens(cu_q, total_q)
    kseg = segments_from_cu_seqlens(cu_k, total_k)

    # per-token position within its sequence, with the bottom-right causal
    # offset (len_k - len_q) folded into the query positions
    qidx = jnp.arange(total_q, dtype=jnp.int32)
    kidx = jnp.arange(total_k, dtype=jnp.int32)
    len_q = cu_q[1:] - cu_q[:-1]
    len_k = cu_k[1:] - cu_k[:-1]
    if seqused_k is not None:
        # only the first seqused_k[i] keys of sequence i are live (the
        # reference's `seqused_k`, flash_hip.h params / block_info.h)
        len_k = jnp.minimum(len_k, seqused_k.astype(jnp.int32))
        kseg = jnp.where(
            kidx - cu_k[jnp.clip(kseg, 0, None)] < len_k[jnp.clip(kseg, 0, None)],
            kseg,
            -2,
        )
    seg_clip_q = jnp.clip(qseg, 0, None)
    qpos = (
        qidx
        - cu_q[seg_clip_q]
        + len_k[seg_clip_q]
        - len_q[seg_clip_q]
    )
    qpos = jnp.where(qseg >= 0, qpos, -(2**30)).astype(jnp.int32)
    seg_clip_k = jnp.clip(kseg, 0, None)
    kpos = jnp.where(kseg >= 0, kidx - cu_k[seg_clip_k], 2**30).astype(jnp.int32)

    alibi_row_slopes = None
    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes.ndim == 2:
            # (batch, heads) slopes: build the per-token slope plane
            alibi_row_slopes = _row_slopes_from_segments(alibi_slopes, qseg)
            alibi_slopes = None

    return _packed_attention(
        q, k, v, qseg, kseg, qpos, kpos,
        causal=causal, window=window, softcap=softcap,
        softmax_scale=softmax_scale, alibi_slopes=alibi_slopes,
        alibi_row_slopes=alibi_row_slopes,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )


def _packed_attention(
    q, k, v, qseg, kseg, qpos, kpos, *,
    causal, window, softcap, softmax_scale, alibi_slopes,
    dropout_p, dropout_seed, block_q, block_k, interpret,
    alibi_row_slopes=None,
):

    out, lse = flash_attention(
        q.swapaxes(0, 1)[None],  # (1, h, total_q, d)
        k.swapaxes(0, 1)[None],
        v.swapaxes(0, 1)[None],
        causal=causal,
        window=window,
        softcap=softcap,
        softmax_scale=softmax_scale,
        alibi_slopes=alibi_slopes,
        alibi_row_slopes=alibi_row_slopes,
        q_segment_ids=qseg[None],
        kv_segment_ids=kseg[None],
        q_positions=qpos[None],
        kv_positions=kpos[None],
        dropout_p=dropout_p,
        dropout_seed=dropout_seed,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
    )
    return out[0].swapaxes(0, 1), lse[0]


def varlen_attn_probs(
    q: jax.Array,  # (total_q, h, d)
    k: jax.Array,  # (total_k, h_k, d)
    lse: jax.Array,  # (h, total_q) from flash_attn_varlen
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    *,
    seqused_k: Optional[jax.Array] = None,
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Packed-layout S_dmask for the varlen entry (the reference's varlen
    `return_softmax`, export.cpp:669-937): the (h, total_q, total_k)
    probability plane with cross-sequence entries 0 and dropout-dropped
    entries NEGATED. Must be called with the same inputs/flags/seed as the
    flash_attn_varlen that produced `lse` (the packed fwd runs the same
    dense grid, so the per-block dropout counters line up)."""
    from xf_flash_attention_cutlass_tpu.ops.flash_fwd import attention_probs

    total_q, h, d = q.shape
    total_k = k.shape[0]
    cu_q = cu_seqlens_q.astype(jnp.int32)
    cu_k = cu_seqlens_k.astype(jnp.int32)
    qseg = segments_from_cu_seqlens(cu_q, total_q)
    kseg = segments_from_cu_seqlens(cu_k, total_k)
    qidx = jnp.arange(total_q, dtype=jnp.int32)
    kidx = jnp.arange(total_k, dtype=jnp.int32)
    len_q = cu_q[1:] - cu_q[:-1]
    len_k = cu_k[1:] - cu_k[:-1]
    if seqused_k is not None:
        len_k = jnp.minimum(len_k, seqused_k.astype(jnp.int32))
        kseg = jnp.where(
            kidx - cu_k[jnp.clip(kseg, 0, None)] < len_k[jnp.clip(kseg, 0, None)],
            kseg,
            -2,
        )
    seg_cq = jnp.clip(qseg, 0, None)
    qpos = qidx - cu_q[seg_cq] + len_k[seg_cq] - len_q[seg_cq]
    qpos = jnp.where(qseg >= 0, qpos, -(2**30)).astype(jnp.int32)
    seg_ck = jnp.clip(kseg, 0, None)
    kpos = jnp.where(kseg >= 0, kidx - cu_k[seg_ck], 2**30).astype(jnp.int32)

    alibi_row_slopes = None
    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes.ndim == 2:
            alibi_row_slopes = _row_slopes_from_segments(alibi_slopes, qseg)
            alibi_slopes = None

    probs = attention_probs(
        q.swapaxes(0, 1)[None],
        k.swapaxes(0, 1)[None],
        lse[None],
        causal=causal, window=window, softcap=softcap,
        softmax_scale=softmax_scale, alibi_slopes=alibi_slopes,
        alibi_row_slopes=alibi_row_slopes,
        q_segment_ids=qseg[None], kv_segment_ids=kseg[None],
        q_positions=qpos[None], kv_positions=kpos[None],
        dropout_p=dropout_p, dropout_seed=dropout_seed,
        interpret=interpret,
    )
    return probs[0]  # (h, total_q, total_k)


def flash_attn_varlen_paged(
    q: jax.Array,  # (total_q, h, d) packed ragged queries
    k_cache: jax.Array,  # (num_blocks, page, h_k, d) — reference layout
    v_cache: jax.Array,
    block_table: jax.Array,  # (b, max_pages) int32
    cu_seqlens_q: jax.Array,  # (b+1,) int32
    seqused_k: jax.Array,  # (b,) int32 — live keys per sequence
    *,
    max_seqlen_q: Optional[int] = None,  # static bound on per-seq q length
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    dropout_p: float = 0.0,  # served by the packed dense path (the paged
    # kernel is a pure inference kernel; the reference's varlen dropout
    # lives in its training kernel, export.cpp:669-937)
    dropout_seed: int = 0,
    internal_layout: bool = False,  # pools already (num_blocks, h_k, page, d)
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Ragged-batch prefill against a paged KV cache — the reference's
    `mha_varlen_fwd` with `block_table` (/root/reference/export.cpp:732-741).

    Served by the scalar-prefetch paged kernel (ops/paged.py): queries are
    right-aligned into a (b, max_seqlen_q) rectangle (Q is tiny; K/V stay
    paged) and each row attends its live pages only — HBM traffic scales
    with live pages, not with b * max_pages (the round-1 version gathered
    that whole rectangle densely, defeating paging for long-context ragged
    prefill). The reference-layout compat surface pays ONE pool transpose
    (proportional to pool size); engine-style callers pass
    ``internal_layout=True`` and pay nothing. Very large max_seqlen_q
    (query block beyond the kernel's VMEM budget) falls back to the packed
    dense-gather path. Returns (out, lse) in the varlen layouts
    ((total_q, h, d), (h, total_q))."""
    total_q, h, d = q.shape
    b, max_pages = block_table.shape
    if internal_layout:
        k_pool, v_pool = k_cache, v_cache
        page = k_cache.shape[2]
    else:
        # (num_blocks, page, h_k, d) -> (num_blocks, h_k, page, d)
        page = k_cache.shape[1]
        k_pool = k_cache.transpose(0, 2, 1, 3)
        v_pool = v_cache.transpose(0, 2, 1, 3)
    h_k = k_pool.shape[1]

    cu_q = cu_seqlens_q.astype(jnp.int32)
    seqused_k = seqused_k.astype(jnp.int32)
    len_q = cu_q[1:] - cu_q[:-1]
    sq_max = int(max_seqlen_q) if max_seqlen_q else total_q
    sq_max = min(sq_max, total_q)

    g = h // h_k
    # the paged kernel self-splits oversized query blocks into sequential
    # token groups when the geometry permits (causal, or position-free
    # non-causal — ops/paged.py rows_max); only the remaining combos
    # (non-causal with window/alibi at >3k rows) take the dense gather.
    # dropout also routes there (paged = inference kernel, no PRNG path)
    paged_splittable = causal or (
        window[0] < 0 and window[1] < 0 and alibi_slopes is None
    )
    # unsplittable geometries must fit the paged kernel's whole-block VMEM
    # budget: same bound paged_attention self-splits at (query blocks past
    # ~1024 rows fail to COMPILE — register spills at real geometries;
    # round-3 CLAUDE.md finding). The old 3072 constant predated that
    # ceiling and interpret/small-shape tests never catch it.
    rows_max = int(os.environ.get("XFA_PAGED_ROWS_MAX", 1024))
    if (sq_max * g > rows_max and not paged_splittable) or dropout_p > 0.0:
        # the dense gather materializes b x max_pages x page rows: the
        # traffic class changes from live-pages to whole-table. Surface
        # that to serving callers (trace-time decision: statics only).
        reason = (
            f"query block too large for the paged kernel "
            f"(sq_max*group = {sq_max * g} > {rows_max})"
            if sq_max * g > rows_max
            else "dropout requested (paged kernel is inference-only)"
        )
        logger.debug(
            "flash_attn_varlen_paged: falling back to the DENSE gather "
            "path (%s); HBM traffic becomes b*max_pages*page rows instead "
            "of live pages", reason,
        )
        return _varlen_paged_dense_fallback(
            q, k_pool, v_pool, block_table, cu_q, seqused_k,
            causal=causal, window=window, softcap=softcap,
            softmax_scale=softmax_scale, alibi_slopes=alibi_slopes,
            dropout_p=dropout_p, dropout_seed=dropout_seed,
            interpret=interpret,
        )

    # right-align each sequence's queries: padded row j of sequence i maps
    # to packed index cu_q[i] + j - (sq_max - len_q[i]); the pad rows in
    # front compute attention for discarded positions
    j = jnp.arange(sq_max, dtype=jnp.int32)[None, :]  # (1, sq_max)
    src = cu_q[:-1, None] + j - (sq_max - len_q[:, None])
    valid = src >= cu_q[:-1, None]
    src_c = jnp.clip(src, 0, total_q - 1)
    q_pad = q[src_c.reshape(-1)].reshape(b, sq_max, h, d)

    if alibi_slopes is not None:
        # the paged kernel's alibi uses |qpos - kcol| relative distances,
        # identical for the right-aligned rows; the kernel takes (b, h)
        # slopes natively, so per-batch (b, h) slopes pass straight through
        # (export.cpp:456,470 parity)
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes.ndim == 1:
            alibi_slopes = jnp.broadcast_to(alibi_slopes[None], (b, h))

    out_pad, lse_pad = paged_attention(
        q_pad, k_pool, v_pool, block_table.astype(jnp.int32), seqused_k,
        softmax_scale=softmax_scale, causal=causal, window=window,
        softcap=softcap, alibi_slopes=alibi_slopes, interpret=interpret,
    )  # out (b, sq_max, h, d); lse (b, h, sq_max)

    # scatter back to the packed layouts
    qidx = jnp.arange(total_q, dtype=jnp.int32)
    qseg = segments_from_cu_seqlens(cu_q, total_q)
    segc = jnp.clip(qseg, 0, None)
    jj = qidx - cu_q[segc] + (sq_max - len_q[segc])
    jj = jnp.clip(jj, 0, sq_max - 1)
    out = out_pad[segc, jj]  # (total_q, h, d)
    out = jnp.where((qseg >= 0)[:, None, None], out, 0.0).astype(q.dtype)
    lse = lse_pad[segc, :, jj]  # (total_q, h)
    lse = jnp.where((qseg >= 0)[:, None], lse, -jnp.inf).swapaxes(0, 1)
    del valid
    return out, lse


def _varlen_paged_dense_fallback(
    q, k_pool, v_pool, block_table, cu_q, seqused_k, *,
    causal, window, softcap, softmax_scale, alibi_slopes,
    dropout_p=0.0, dropout_seed=0, interpret=None,
):
    """Round-1 path: gather the padded rectangle densely, run the packed
    kernel. Kept for query blocks too large for the paged kernel's VMEM."""
    total_q, h, d = q.shape
    b, max_pages = block_table.shape
    h_k = k_pool.shape[1]
    page = k_pool.shape[2]
    sk = max_pages * page

    flat = block_table.astype(jnp.int32).reshape(-1)
    # internal layout (blocks, h_k, page, d) -> packed (b*sk, h_k, d)
    kd = k_pool[flat].swapaxes(1, 2).reshape(b * sk, h_k, d)
    vd = v_pool[flat].swapaxes(1, 2).reshape(b * sk, h_k, d)

    qseg = segments_from_cu_seqlens(cu_q, total_q)
    kidx = jnp.arange(b * sk, dtype=jnp.int32)
    kbatch = kidx // sk
    kwithin = kidx % sk
    kseg = jnp.where(kwithin < seqused_k[kbatch], kbatch, -2)
    kpos = jnp.where(kseg >= 0, kwithin, 2**30)

    qidx = jnp.arange(total_q, dtype=jnp.int32)
    len_q = cu_q[1:] - cu_q[:-1]
    segc = jnp.clip(qseg, 0, None)
    qpos = qidx - cu_q[segc] + seqused_k[segc] - len_q[segc]
    qpos = jnp.where(qseg >= 0, qpos, -(2**30)).astype(jnp.int32)

    alibi_row_slopes = None
    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes.ndim == 2:
            alibi_row_slopes = _row_slopes_from_segments(alibi_slopes, qseg)
            alibi_slopes = None

    return _packed_attention(
        q, kd, vd, qseg, kseg, qpos, kpos,
        causal=causal, window=window, softcap=softcap,
        softmax_scale=softmax_scale, alibi_slopes=alibi_slopes,
        alibi_row_slopes=alibi_row_slopes,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
        block_q=None, block_k=None, interpret=interpret,
    )


def varlen_paged_attn_probs(
    q: jax.Array,  # (total_q, h, d) packed ragged queries
    k_cache: jax.Array,  # (num_blocks, page, h_k, d) reference layout
    lse: jax.Array,  # (h, total_q) from flash_attn_varlen_paged
    block_table: jax.Array,  # (b, max_pages) int32
    cu_seqlens_q: jax.Array,  # (b+1,) int32
    seqused_k,  # (b,) int — CONCRETE lengths (debug path, no jit)
    *,
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    internal_layout: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """S_dmask for the PAGED varlen entry (round-4 verdict #8) — the
    (h, total_q, total_k) probability plane in the same packed-key
    convention as `varlen_attn_probs`, where key column `cu_k[i] + j` is
    cache position j of sequence i and cu_k = cumsum(seqused_k). The
    reference's paged varlen path never returns softmax (paged_attn.cpp
    passes nullptr), so this exceeds parity; shape conventions follow the
    dense varlen S_dmask.

    Debug-only semantics: key lengths must be CONCRETE (the packed
    total_k is a real array dimension), so this cannot run under jit.
    Probabilities are recomputed as exp(s - lse) on the densely gathered
    key rectangle — identical values to the kernel's own pass. With
    dropout_p > 0 the forward necessarily ran the dense-fallback packed
    layout (the paged kernel is inference-only), and the mask is replayed
    on that exact (total_q, b*max_pages*page) grid before the live
    columns are gathered out, so dropped entries match the forward
    bit-for-bit.
    """
    import numpy as np

    total_q, h, d = q.shape
    b, max_pages = block_table.shape
    if internal_layout:
        k_pool = k_cache
        page = k_cache.shape[2]
    else:
        page = k_cache.shape[1]
        k_pool = k_cache.transpose(0, 2, 1, 3)
    h_k = k_pool.shape[1]
    sk = max_pages * page

    try:
        lens = np.asarray(seqused_k, np.int64)
    except Exception as e:  # abstract tracer
        raise ValueError(
            "varlen_paged_attn_probs needs concrete seqused_k (the packed "
            "total_k becomes an array dimension) — call it outside jit"
        ) from e
    cu_k_np = np.zeros(b + 1, np.int64)
    np.cumsum(lens, out=cu_k_np[1:])
    total_k = int(cu_k_np[-1])
    seqused_j = jnp.asarray(lens, jnp.int32)

    # dense-gather the padded key rectangle — same layout (and therefore
    # same dropout block counters) as _varlen_paged_dense_fallback
    flat = block_table.astype(jnp.int32).reshape(-1)
    kd = k_pool[flat].swapaxes(1, 2).reshape(b * sk, h_k, d)

    cu_q = cu_seqlens_q.astype(jnp.int32)
    qseg = segments_from_cu_seqlens(cu_q, total_q)
    kidx = jnp.arange(b * sk, dtype=jnp.int32)
    kbatch = kidx // sk
    kwithin = kidx % sk
    kseg = jnp.where(kwithin < seqused_j[kbatch], kbatch, -2)
    kpos = jnp.where(kseg >= 0, kwithin, 2**30)

    qidx = jnp.arange(total_q, dtype=jnp.int32)
    len_q = cu_q[1:] - cu_q[:-1]
    segc = jnp.clip(qseg, 0, None)
    qpos = qidx - cu_q[segc] + seqused_j[segc] - len_q[segc]
    qpos = jnp.where(qseg >= 0, qpos, -(2**30)).astype(jnp.int32)

    alibi_row_slopes = None
    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes.ndim == 2:
            alibi_row_slopes = _row_slopes_from_segments(alibi_slopes, qseg)
            alibi_slopes = None

    from xf_flash_attention_cutlass_tpu.ops.flash_fwd import attention_probs

    probs_pad = attention_probs(
        q.swapaxes(0, 1)[None],
        kd.swapaxes(0, 1)[None],
        lse[None],
        causal=causal, window=window, softcap=softcap,
        softmax_scale=softmax_scale, alibi_slopes=alibi_slopes,
        alibi_row_slopes=alibi_row_slopes,
        q_segment_ids=qseg[None], kv_segment_ids=kseg[None],
        q_positions=qpos[None], kv_positions=kpos[None],
        dropout_p=dropout_p, dropout_seed=dropout_seed,
        interpret=interpret,
    )[0]  # (h, total_q, b*sk)

    # gather the live packed columns: packed col cu_k[i]+j <- padded i*sk+j
    pseg = segments_from_cu_seqlens(jnp.asarray(cu_k_np, jnp.int32), total_k)
    psegc = jnp.clip(pseg, 0, None)
    within = jnp.arange(total_k, dtype=jnp.int32) - jnp.asarray(
        cu_k_np[:-1], jnp.int32
    )[psegc]
    cols = psegc * sk + within
    return probs_pad[:, :, cols]
