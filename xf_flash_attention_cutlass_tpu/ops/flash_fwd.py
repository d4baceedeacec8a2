"""Dense flash-attention forward — Pallas TPU kernel.

TPU-native re-design of the reference's fused CUTLASS forward pipeline
(`compute_attn_1rowblock`, /root/reference/csrc/flash_attn/src/flash_fwd_kernel.h:48-578):
online-softmax two-matmul tiling with causal / sliding-window masking, ALiBi,
softcap, dropout, GQA/MQA head grouping and ragged (segment/position) masking.

Design differences from the reference (deliberate, TPU-first):
- Tiling/DMA/double-buffering is owned by the Pallas grid pipeline (Mosaic),
  not hand-rolled smem staging; the KV loop is the innermost grid dimension so
  the next K/V block DMA overlaps the current block's MXU work.
- The wave64 MFMA fragment index math of `mask.h:99-238` collapses into plain
  `broadcasted_iota` position algebra over (block_q, block_k) tiles.
- GQA is an index-map remap (kv head = q head // group), not a tensor repeat.
- Fully-masked KV blocks are skipped with `pl.when` (analog of the reference's
  `n_block_max` trimming at flash_fwd_kernel.h:81-88).
- Row statistics (m, l) and the output accumulator live in fp32 VMEM scratch
  that persists across the KV grid dimension (analog of softmax.h:136-167).

Returns O and the log-sum-exp per row (natural log), with LSE = -inf for rows
that attend to nothing (the split-friendly convention; cf. softmax.h:170-186).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xf_flash_attention_cutlass_tpu.utils import default_interpret, next_multiple

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)  # finite mask value


def dropout_keep_mask(params, seed, blk_idx, shape):
    """Counter-based keep mask for one (bq, bk) block — order-independent
    across the grid so fwd and bwd regenerate identical masks (the TPU
    analog of the Philox offset scheme, dropout.h:26-105 / philox.cuh)."""
    thresh = jnp.uint32(min(int(params.dropout_p * float(2**32)), 2**32 - 1))
    if params.interp_prng:
        key = jax.random.fold_in(jax.random.PRNGKey(seed), blk_idx)
        bits = jax.random.bits(key, shape, jnp.uint32)
    else:
        pltpu.prng_seed(seed, blk_idx)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= thresh


@dataclasses.dataclass(frozen=True)
class FlashParams:
    """Static kernel configuration (the TPU analog of Flash_fwd_params,
    /root/reference/csrc/flash_attn/src/flash_hip.h:77-172, minus pointers)."""

    seq_q: int  # true query length (pre-padding)
    seq_k: int  # true key length (pre-padding)
    q_heads: int
    kv_heads: int
    scale: float
    causal: bool = False
    window: Tuple[int, int] = (-1, -1)  # (left, right); -1 = unbounded
    softcap: float = 0.0
    has_alibi: bool = False
    # per-(batch, head, q-token) ALiBi slope plane — the varlen surface
    # for the reference's (batch, num_heads) slopes (export.cpp:456,470):
    # packed varlen runs at b=1, so a scalar [ib, ih] slope cannot vary by
    # sequence; the wrapper builds a per-row plane from segment ids instead
    has_alibi_rows: bool = False
    has_segments: bool = False
    has_positions: bool = False  # explicit q/kv position arrays (varlen)
    has_kv_lens: bool = False  # per-batch dynamic kv lengths (kvcache)
    dropout_p: float = 0.0
    block_q: int = 256
    block_k: int = 256
    # interpret mode has no TPU PRNG lowering; use threefry there. fwd and
    # bwd must agree on this flag for the dropout mask replay to match.
    interp_prng: bool = False

    @property
    def window_resolved(self) -> Tuple[int, int]:
        # causal == right window 0 (reference: test.py:351-352 / mask.h:99)
        if self.causal:
            return (self.window[0], 0)
        return self.window

    @property
    def masks_cols_right(self) -> bool:
        return self.window_resolved[1] >= 0

    @property
    def masks_cols_left(self) -> bool:
        return self.window_resolved[0] >= 0


def _flash_fwd_kernel(
    params: FlashParams, seq_k_padded: int, grid_nq_nk, *refs
):
    """One (batch, q-head, q-block) row-block.

    Dense grid (grid_nq_nk is None): KV blocks arrive via grid dim 3.
    Sparse grid (grid_nq_nk = (nq, nk)): grid dim 2 walks a scalar-
    prefetched table of LIVE (iq, ik) block pairs only — fully-masked
    causal/local blocks never become grid steps, so their K/V block DMAs
    and ~1us step overheads vanish (measured ~15% of the causal fwd wall
    time at seq 8k). The analog of the reference's n_block_min/max loop
    trimming (flash_fwd_kernel.h:81-88), expressed as grid compression."""
    sparse = grid_nq_nk is not None
    it = iter(refs)
    if sparse:
        iq_tab = next(it)  # (n_live + 1,) scalar prefetch, sentinel last
        ik_tab = next(it)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    alibi_ref = next(it) if params.has_alibi else None
    arows_ref = next(it) if params.has_alibi_rows else None  # (1,1,bq,1)
    kv_lens_ref = next(it) if params.has_kv_lens else None
    qseg_ref = next(it) if params.has_segments else None
    kseg_ref = next(it) if params.has_segments else None
    qpos_ref = next(it) if params.has_positions else None
    kpos_ref = next(it) if params.has_positions else None
    seed_ref = next(it) if params.dropout_p > 0.0 else None
    o_ref = next(it)
    lse_ref = next(it)
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)

    bq, bk = params.block_q, params.block_k
    wl, wr = params.window_resolved
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    if sparse:
        il = pl.program_id(2)
        n_live = pl.num_programs(2)
        iq = iq_tab[il]
        ik = ik_tab[il]
        nk = grid_nq_nk[1]
        # run boundaries: the table is iq-major, so a new output row-block
        # starts where iq changes (sentinel -1 closes the final run)
        first_of_row = jnp.logical_or(il == 0, iq_tab[jnp.maximum(il - 1, 0)] != iq)
        last_of_row = iq_tab[il + 1] != iq
    else:
        iq = pl.program_id(2)
        ik = pl.program_id(3)
        nk = pl.num_programs(3)
        first_of_row = ik == 0
        last_of_row = ik == nk - 1

    @pl.when(first_of_row)
    def _init():
        # m floor: masked cols hold NEG_INF << -1e30, so exp(s - m) under-
        # flows to exactly 0 and the post-exp keep-where is unnecessary
        # (m can never sink below the floor, so an all-masked first block
        # cannot produce exp(0)=1 ghosts)
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # ---- positions ----------------------------------------------------
    # Bottom-right-aligned geometry: query row i attends to key col j iff
    # j - offset <= i + right and j - offset >= i - left, offset = sk - sq.
    # We fold the offset into the query positions (cf. mask.h:119-134).
    row_in_blk = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col_in_blk = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if params.has_positions:
        qpos = qpos_ref[0] + jnp.zeros((bq, bk), jnp.int32)  # (bq,1) bcast
        kpos = kpos_ref[0] + jnp.zeros((bq, bk), jnp.int32)  # (1,bk) bcast
    else:
        offset = params.seq_k - params.seq_q
        qpos = iq * bq + row_in_blk + offset
        kpos = ik * bk + col_in_blk
    kcol = ik * bk + col_in_blk  # raw column index (for length bounds)

    # ---- block-level skip (causal/local trimming) ----------------------
    # Conservative bounds on this block's positions let us skip fully-masked
    # blocks entirely — the analog of n_block_min/max trimming.
    if params.has_positions:
        q_hi = jnp.max(qpos_ref[0])
        q_lo = jnp.min(qpos_ref[0])
        k_lo_pos = jnp.min(kpos_ref[0])
        k_hi_pos = jnp.max(kpos_ref[0])
    else:
        offset = params.seq_k - params.seq_q
        q_hi = (iq + 1) * bq - 1 + offset
        q_lo = iq * bq + offset
        k_lo_pos = ik * bk
        k_hi_pos = (ik + 1) * bk - 1

    live = jnp.bool_(True)
    if params.masks_cols_right:
        live = jnp.logical_and(live, k_lo_pos <= q_hi + wr)
    if params.masks_cols_left:
        live = jnp.logical_and(live, k_hi_pos >= q_lo - wl)
    # static column-length bound: whole block past true seq_k
    if ik is not None:
        live = jnp.logical_and(live, ik * bk < params.seq_k)
    if params.has_kv_lens:
        live = jnp.logical_and(live, ik * bk < kv_lens_ref[ib, 0])

    needs_col_bound = params.has_kv_lens or (seq_k_padded != params.seq_k)
    any_elementwise_mask = (
        params.masks_cols_right
        or params.masks_cols_left
        or params.has_segments
        or needs_col_bound
    )

    # bf16 inputs take the exp on the VPU at bf16 (2x rate); the row sum
    # still accumulates in f32. The f32/f16->f32 paths keep full-f32 exp.
    fast_exp = v_ref.dtype == jnp.bfloat16

    def _body(masked: bool):
        q = q_ref[0, 0]  # (bq, d)
        k = k_ref[0, 0]  # (bk, d)
        # q arrives pre-multiplied by softmax_scale (wrapper) — no
        # per-block score-scaling pass
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if params.softcap > 0.0:
            # tanh softcap on the scaled scores (utils.h:554-559)
            s = jnp.tanh(s / params.softcap) * params.softcap

        keep = None
        if masked:
            keep = jnp.ones((bq, bk), jnp.bool_)
            if params.masks_cols_right:
                keep = jnp.logical_and(keep, kpos <= qpos + wr)
            if params.masks_cols_left:
                keep = jnp.logical_and(keep, kpos >= qpos - wl)
            if params.has_segments:
                keep = jnp.logical_and(keep, qseg_ref[0] == kseg_ref[0])
            if params.has_kv_lens:
                keep = jnp.logical_and(keep, kcol < kv_lens_ref[ib, 0])
            elif seq_k_padded != params.seq_k:
                keep = jnp.logical_and(keep, kcol < params.seq_k)

        if params.has_alibi or params.has_alibi_rows:
            # -slope * |distance|; for causal this differs from the
            # reference's row-free form (test.py:260-261) by a per-row
            # constant, which softmax cancels. Slope is NOT pre-scaled
            # (we add bias after scaling, like attention_ref).
            slope = (
                alibi_ref[ib, ih] if params.has_alibi else arows_ref[0, 0]
            )  # scalar, or (bq, 1) row plane
            s = s - slope * jnp.abs(qpos - kpos).astype(jnp.float32)

        if keep is not None:
            s = jnp.where(keep, s, NEG_INF)

        # ---- online softmax rescale (softmax.h:136-167) ----------------
        # row max as an explicit halving tree: full-width VPU maxes on
        # lane-aligned halves down to 128 lanes, then one in-vreg reduce.
        # Measured +1.5-2% over the monolithic lane reduce at 1024^2 tiles
        # (benchmarks/probe_fwd_mfu_r3.py "treemax"; exact numerics). The
        # bf16-tree variant and all larger restructures measured worse.
        m_prev = m_scr[...]  # (bq, 1)
        t = s
        w = t.shape[1]
        while w > 128 and w % 2 == 0 and (w // 2) % 128 == 0:
            t = jnp.maximum(t[:, : w // 2], t[:, w // 2 :])
            w //= 2
        m_cur = jnp.max(t, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        if fast_exp:
            p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        else:
            p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[...] * corr + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32
        )

        if params.dropout_p > 0.0:
            nq = grid_nq_nk[0] if sparse else pl.num_programs(2)
            h_all = pl.num_programs(1)
            blk_idx = ((ib * h_all + ih) * nq + iq) * nk + ik
            keep_drop = dropout_keep_mask(
                params, seed_ref[0, 0], blk_idx, (bq, bk)
            )
            p_acc = jnp.where(keep_drop, p, jnp.zeros((), p.dtype))
        else:
            p_acc = p

        acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
            p_acc.astype(v_ref.dtype),
            v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = m_new
        l_scr[...] = l_new

    if (any_elementwise_mask and not params.has_alibi
            and not params.has_alibi_rows):
        # blocks fully inside the visible region skip the mask arithmetic
        # entirely (the bulk of a causal/local/varlen grid) — the runtime
        # analog of the reference's Is_even_MN/no-mask mainloop split
        # (flash_fwd_kernel.h:433-506)
        interior = jnp.bool_(True)
        if params.masks_cols_right:
            interior = jnp.logical_and(interior, k_hi_pos <= q_lo + wr)
        if params.masks_cols_left:
            interior = jnp.logical_and(interior, k_lo_pos >= q_hi - wl)
        if params.has_kv_lens:
            interior = jnp.logical_and(
                interior, (ik + 1) * bk <= kv_lens_ref[ib, 0]
            )
        elif seq_k_padded != params.seq_k:
            interior = jnp.logical_and(interior, (ik + 1) * bk <= params.seq_k)
        if params.has_segments:
            qs, ks_ = qseg_ref[0], kseg_ref[0]
            interior = jnp.logical_and(
                interior,
                jnp.logical_and(
                    jnp.min(qs) == jnp.max(qs),
                    jnp.logical_and(
                        jnp.min(ks_) == jnp.max(ks_), jnp.min(qs) == jnp.min(ks_)
                    ),
                ),
            )

        @pl.when(jnp.logical_and(live, interior))
        def _clean():
            _body(masked=False)

        @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
        def _masked():
            _body(masked=True)
    else:

        @pl.when(live)
        def _any():
            _body(masked=any_elementwise_mask)

    @pl.when(last_of_row)
    def _epilogue():
        # normalize_softmax_lse (softmax.h:170-186): empty rows -> O = 0,
        # LSE = -inf (split-identity convention).
        m = m_scr[...]
        l = l_scr[...]
        empty = l <= 0.0
        inv = jnp.where(empty, 1.0, 1.0 / jnp.where(empty, 1.0, l))
        o = acc_scr[...] * inv
        if params.dropout_p > 0.0:
            o = o * (1.0 / (1.0 - params.dropout_p))
        o_ref[0, 0] = jnp.where(empty, 0.0, o).astype(o_ref.dtype)
        lse = jnp.where(empty, -jnp.inf, m + jnp.log(jnp.where(empty, 1.0, l)))
        lse_ref[0, 0] = lse.astype(lse_ref.dtype)  # (bq, 1)


def _resolve_blocks(sq, sk, block_q, block_k, dropout_p):
    """Block-size policy shared by the fwd kernel and the probs debug pass —
    the two must partition identically so the per-block dropout counters
    (and thus the regenerated masks) line up.

    CONTRACT: with dropout_p > 0 the canonical 512 tiles OVERRIDE any
    explicit block_q/block_k, in BOTH flash_fwd and attention_probs. Do
    not relax this override on one side only — the dropout mask is keyed
    by (seed, block index), so mismatched partitions silently replay a
    different mask (round-2 advisor finding)."""
    bq = block_q or min(1024, next_multiple(sq, 128))
    bk = block_k or min(1024, next_multiple(sk, 128))
    if dropout_p > 0.0:
        # see CONTRACT above: explicit blocks are intentionally ignored
        bq = min(512, next_multiple(sq, 128))
        bk = min(512, next_multiple(sk, 128))
    bq = min(bq, next_multiple(sq, 128))
    bk = min(bk, next_multiple(sk, 128))
    return bq, bk


def _probs_kernel(params: FlashParams, seq_k_padded: int, nq_nk, *refs):
    """Debug second pass: exact normalized attention probabilities with the
    dropout mask sign-encoded (negative = dropped) — the TPU analog of the
    reference's returned S_dmask (dropout.h:26-105, sign encoding at
    dropout.h:71-77). Regenerates the identical counter-based keep mask the
    fwd kernel used (same (seed, blk_idx) keys), so the signs are the
    *actual* realized mask, not a statistical stand-in."""
    nq, nk = nq_nk
    it = iter(refs)
    q_ref = next(it)
    k_ref = next(it)
    alibi_ref = next(it) if params.has_alibi else None
    arows_ref = next(it) if params.has_alibi_rows else None
    qseg_ref = next(it) if params.has_segments else None
    kseg_ref = next(it) if params.has_segments else None
    qpos_ref = next(it) if params.has_positions else None
    kpos_ref = next(it) if params.has_positions else None
    lse_ref = next(it)
    seed_ref = next(it) if params.dropout_p > 0.0 else None
    s_ref = next(it)

    bq, bk = params.block_q, params.block_k
    wl, wr = params.window_resolved
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    row_in_blk = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col_in_blk = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if params.has_positions:
        qpos = qpos_ref[0] + jnp.zeros((bq, bk), jnp.int32)
        kpos = kpos_ref[0] + jnp.zeros((bq, bk), jnp.int32)
    else:
        offset = params.seq_k - params.seq_q
        qpos = iq * bq + row_in_blk + offset
        kpos = ik * bk + col_in_blk
    kcol = ik * bk + col_in_blk

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if params.softcap > 0.0:
        s = jnp.tanh(s / params.softcap) * params.softcap
    if params.has_alibi or params.has_alibi_rows:
        slope = alibi_ref[ib, ih] if params.has_alibi else arows_ref[0, 0]
        s = s - slope * jnp.abs(qpos - kpos).astype(jnp.float32)

    keep = jnp.ones((bq, bk), jnp.bool_)
    if params.masks_cols_right:
        keep = jnp.logical_and(keep, kpos <= qpos + wr)
    if params.masks_cols_left:
        keep = jnp.logical_and(keep, kpos >= qpos - wl)
    if params.has_segments:
        keep = jnp.logical_and(keep, qseg_ref[0] == kseg_ref[0])
    if seq_k_padded != params.seq_k:
        keep = jnp.logical_and(keep, kcol < params.seq_k)

    # (bq, 1) f32; -inf marks empty rows (and padded rows are sliced off by
    # the wrapper). Clamp before the exp so no inf flows through arithmetic.
    lse = lse_ref[0, 0]
    row_live = lse > -3e38
    lse_safe = jnp.where(row_live, lse, 0.0)
    p = jnp.where(
        jnp.logical_and(keep, row_live), jnp.exp(s - lse_safe), 0.0
    )
    if params.dropout_p > 0.0:
        h_all = pl.num_programs(1)
        blk_idx = ((ib * h_all + ih) * nq + iq) * nk + ik
        keep_drop = dropout_keep_mask(params, seed_ref[0, 0], blk_idx, (bq, bk))
        p = jnp.where(keep_drop, p, -p)
    s_ref[0, 0] = p


def attention_probs(
    q: jax.Array,  # (b, h, sq, d)
    k: jax.Array,  # (b, h_k, sk, d)
    lse: jax.Array,  # (b, h, sq) f32 from flash_fwd
    *,
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    alibi_row_slopes: Optional[jax.Array] = None,  # (b, h, sq) f32
    q_segment_ids: Optional[jax.Array] = None,  # (b, sq) int32 (varlen)
    kv_segment_ids: Optional[jax.Array] = None,  # (b, sk) int32
    q_positions: Optional[jax.Array] = None,  # (b, sq) int32
    kv_positions: Optional[jax.Array] = None,  # (b, sk) int32
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Materialize the (b, h, sq, sk) attention-probability plane for
    debugging/tests: softmax(QK^T) with masking applied, entries that the
    seeded dropout dropped returned NEGATED (the reference's S_dmask sign
    convention). Must be called with the same q/k/flags/seed/blocks as the
    flash_fwd that produced `lse`. With dropout_p > 0, explicit
    block_q/block_k args are ignored on BOTH sides (_resolve_blocks pins
    the canonical 512 tiles) so the replayed mask partition always
    matches. Debug path: materializes seq_q x seq_k."""
    if interpret is None:
        interpret = default_interpret()
    if not interpret and q.dtype == jnp.float16:
        q, k = q.astype(jnp.float32), k.astype(jnp.float32)
    b, h, sq, d = q.shape
    _, h_k, sk, _ = k.shape
    group = h // h_k
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)
    d_pad = max(next_multiple(d, 128), 128)
    bq, bk = _resolve_blocks(sq, sk, block_q, block_k, dropout_p)
    sq_pad = next_multiple(sq, bq)
    sk_pad = next_multiple(sk, bk)

    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    # padded query rows produce garbage probs that the final slice discards;
    # pad with 0 (finite) so no inf enters kernel arithmetic
    lse_p = jnp.pad(
        lse.astype(jnp.float32), ((0, 0), (0, 0), (0, sq_pad - sq))
    )[..., None]

    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes.ndim == 1:
            alibi_slopes = jnp.broadcast_to(alibi_slopes[None, :], (b, h))
    has_alibi_rows = alibi_row_slopes is not None
    if has_alibi_rows:
        alibi_row_slopes = jnp.pad(
            jnp.asarray(alibi_row_slopes, jnp.float32),
            ((0, 0), (0, 0), (0, sq_pad - sq)),
        )[..., None]
    has_segments = q_segment_ids is not None
    if has_segments:
        q_segment_ids = jnp.pad(
            q_segment_ids, ((0, 0), (0, sq_pad - sq)), constant_values=-1
        ).astype(jnp.int32)[:, :, None]
        kv_segment_ids = jnp.pad(
            kv_segment_ids, ((0, 0), (0, sk_pad - sk)), constant_values=-2
        ).astype(jnp.int32)[:, None, :]
    has_positions = q_positions is not None
    if has_positions:
        q_positions = jnp.pad(
            q_positions, ((0, 0), (0, sq_pad - sq)), constant_values=-(2**30)
        ).astype(jnp.int32)[:, :, None]
        kv_positions = jnp.pad(
            kv_positions, ((0, 0), (0, sk_pad - sk)), constant_values=2**30
        ).astype(jnp.int32)[:, None, :]

    params = FlashParams(
        seq_q=sq, seq_k=sk, q_heads=h, kv_heads=h_k, scale=scale,
        causal=causal, window=window, softcap=softcap, has_alibi=has_alibi,
        has_alibi_rows=has_alibi_rows, has_segments=has_segments,
        has_positions=has_positions,
        dropout_p=dropout_p, block_q=bq, block_k=bk,
        interp_prng=bool(interpret),
    )
    nq, nk = sq_pad // bq, sk_pad // bk

    in_specs = [
        pl.BlockSpec((1, 1, bq, d_pad), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        pl.BlockSpec(
            (1, 1, bk, d_pad), lambda ib, ih, iq, ik: (ib, ih // group, ik, 0)
        ),
    ]
    inputs = [qp, kp]
    if has_alibi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(alibi_slopes)
    if has_alibi_rows:
        in_specs.append(pl.BlockSpec(
            (1, 1, bq, 1), lambda ib, ih, iq, ik: (ib, ih, iq, 0)
        ))
        inputs.append(alibi_row_slopes)
    if has_segments:
        in_specs.append(pl.BlockSpec(
            (1, bq, 1), lambda ib, ih, iq, ik: (ib, iq, 0)))
        inputs.append(q_segment_ids)
        in_specs.append(pl.BlockSpec(
            (1, 1, bk), lambda ib, ih, iq, ik: (ib, 0, ik)))
        inputs.append(kv_segment_ids)
    if has_positions:
        in_specs.append(pl.BlockSpec(
            (1, bq, 1), lambda ib, ih, iq, ik: (ib, iq, 0)))
        inputs.append(q_positions)
        in_specs.append(pl.BlockSpec(
            (1, 1, bk), lambda ib, ih, iq, ik: (ib, 0, ik)))
        inputs.append(kv_positions)
    in_specs.append(
        pl.BlockSpec((1, 1, bq, 1), lambda ib, ih, iq, ik: (ib, ih, iq, 0))
    )
    inputs.append(lse_p)
    if dropout_p > 0.0:
        in_specs.append(
            pl.BlockSpec(
                (1, 1), lambda ib, ih, iq, ik: (0, 0), memory_space=pltpu.SMEM
            )
        )
        inputs.append(jnp.asarray([[dropout_seed]], jnp.int32))

    probs = pl.pallas_call(
        functools.partial(_probs_kernel, params, sk_pad, (nq, nk)),
        grid=(b, h, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, bq, bk), lambda ib, ih, iq, ik: (ib, ih, iq, ik)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, sk_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    return probs[:, :, :sq, :sk]


def flash_fwd(
    q: jax.Array,  # (b, h, sq, d)
    k: jax.Array,  # (b, h_k, sk, d)
    v: jax.Array,  # (b, h_k, sk, d)
    *,
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # (h,) or (b, h) fp32
    alibi_row_slopes: Optional[jax.Array] = None,  # (b, h, sq) fp32 — per-
    # q-token slopes (packed varlen with per-sequence slopes); exclusive
    # with alibi_slopes
    kv_lens: Optional[jax.Array] = None,  # (b,) int32
    q_segment_ids: Optional[jax.Array] = None,  # (b, sq) int32
    kv_segment_ids: Optional[jax.Array] = None,  # (b, sk) int32
    q_positions: Optional[jax.Array] = None,  # (b, sq) int32 (offset-folded)
    kv_positions: Optional[jax.Array] = None,  # (b, sk) int32
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Flash attention forward in BHSD layout. Returns (O, LSE).

    O: (b, h, sq, d) in q.dtype; LSE: (b, h, sq) fp32, natural log,
    -inf for rows with no visible keys.
    """
    if interpret is None:
        interpret = default_interpret()
    out_dtype = q.dtype
    if not interpret and q.dtype == jnp.float16:
        # Mosaic has no f16; compute in f32 (exceeds fp16 accuracy).
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    b, h, sq, d = q.shape
    _, h_k, sk, _ = k.shape
    if h % h_k != 0:
        raise ValueError(
            f"q_heads ({h}) must be a multiple of kv_heads ({h_k}) for GQA/MQA"
        )
    group = h // h_k
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    # --- padding to hardware tiles --------------------------------------
    # default 1024^2 score tiles: grid-step overhead (~1us) amortizes best
    # there on v5e (measured: 53 TF/s @512^2 -> 84 TF/s @1024^2, worse again
    # at 2048^2 from VMEM pressure)
    d_pad = max(next_multiple(d, 128), 128)
    # dropout pins 512 tiles: the backward (and the attention_probs debug
    # pass) replay the dropout mask from the same per-block counter seeds,
    # which requires identical block partitioning everywhere (flash_bwd.py)
    bq, bk = _resolve_blocks(sq, sk, block_q, block_k, dropout_p)
    sq_pad = next_multiple(sq, bq)
    sk_pad = next_multiple(sk, bk)

    # softmax scale folded into q (f32) so the kernel skips a per-block
    # score-plane multiply; one tiny pass over q replaces nq*nk passes over s
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))

    has_positions = q_positions is not None
    if has_positions:
        assert kv_positions is not None
        q_positions = jnp.pad(
            q_positions, ((0, 0), (0, sq_pad - sq)), constant_values=-(2**30)
        ).astype(jnp.int32)[:, :, None]  # (b, sq, 1): column reads in-kernel
        kv_positions = jnp.pad(
            kv_positions, ((0, 0), (0, sk_pad - sk)), constant_values=2**30
        ).astype(jnp.int32)[:, None, :]  # (b, 1, sk): row reads in-kernel
    has_segments = q_segment_ids is not None
    if has_segments:
        assert kv_segment_ids is not None
        q_segment_ids = jnp.pad(
            q_segment_ids, ((0, 0), (0, sq_pad - sq)), constant_values=-1
        ).astype(jnp.int32)[:, :, None]
        kv_segment_ids = jnp.pad(
            kv_segment_ids, ((0, 0), (0, sk_pad - sk)), constant_values=-2
        ).astype(jnp.int32)[:, None, :]
    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes.ndim == 1:
            alibi_slopes = jnp.broadcast_to(alibi_slopes[None, :], (b, h))
    has_alibi_rows = alibi_row_slopes is not None
    if has_alibi_rows:
        if has_alibi:
            raise ValueError(
                "alibi_slopes and alibi_row_slopes are exclusive"
            )
        alibi_row_slopes = jnp.pad(
            jnp.asarray(alibi_row_slopes, jnp.float32),
            ((0, 0), (0, 0), (0, sq_pad - sq)),
        )[..., None]  # (b, h, sq_pad, 1): unit lane dim (Mosaic block rule)
    has_kv_lens = kv_lens is not None
    if has_kv_lens:
        kv_lens = kv_lens.astype(jnp.int32).reshape(b, 1)

    params = FlashParams(
        seq_q=sq,
        seq_k=sk,
        q_heads=h,
        kv_heads=h_k,
        scale=scale,
        causal=causal,
        window=window,
        softcap=softcap,
        has_alibi=has_alibi,
        has_alibi_rows=has_alibi_rows,
        has_segments=has_segments,
        has_positions=has_positions,
        has_kv_lens=has_kv_lens,
        dropout_p=dropout_p,
        block_q=bq,
        block_k=bk,
        interp_prng=bool(interpret),
    )

    nq, nk = sq_pad // bq, sk_pad // bk

    # ---- live-pair grid compression -------------------------------------
    # For static masking geometry (causal/local without per-token position
    # arrays), only the block pairs that can contain visible entries become
    # grid steps: a scalar-prefetched iq/ik table drives the index maps.
    # Fully-masked pairs otherwise still cost their K/V block DMA and ~1us
    # of grid-step overhead each (~15% of causal fwd wall time at seq 8k).
    offset = sk - sq
    pairs = []
    for iq_ in range(nq):
        q_hi_ = (iq_ + 1) * bq - 1 + offset
        q_lo_ = iq_ * bq + offset
        for ik_ in range(nk):
            if ik_ * bk >= sk:
                continue
            if params.masks_cols_right and ik_ * bk > q_hi_ + params.window_resolved[1]:
                continue
            if params.masks_cols_left and (ik_ + 1) * bk - 1 < q_lo_ - params.window_resolved[0]:
                continue
            pairs.append((iq_, ik_))
    sparse = (
        not has_positions
        and not has_segments
        and len(pairs) < nq * nk
    )

    def smap(f):
        """Index map over the dense or sparse grid signature."""
        if sparse:
            return lambda ib, ih, il, iq_t, ik_t: f(ib, ih, iq_t[il], ik_t[il])
        return lambda ib, ih, iq, ik: f(ib, ih, iq, ik)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d_pad), smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0))),
        pl.BlockSpec(
            (1, 1, bk, d_pad),
            smap(lambda ib, ih, iq, ik: (ib, ih // group, ik, 0)),
        ),
        pl.BlockSpec(
            (1, 1, bk, d_pad),
            smap(lambda ib, ih, iq, ik: (ib, ih // group, ik, 0)),
        ),
    ]
    inputs = [qp, kp, vp]
    if has_alibi:
        # whole (b, h) array in SMEM, indexed by program ids in-kernel: a
        # (1,1) block over a (b,h) array violates Mosaic's block-shape rule
        # (interpret mode does not check it; a real compile does)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(alibi_slopes)
    if has_alibi_rows:
        in_specs.append(pl.BlockSpec(
            (1, 1, bq, 1), smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0))
        ))
        inputs.append(alibi_row_slopes)
    if has_kv_lens:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)
        )
        inputs.append(kv_lens)
    if has_segments:
        in_specs.append(pl.BlockSpec((1, bq, 1), smap(lambda ib, ih, iq, ik: (ib, iq, 0))))
        inputs.append(q_segment_ids)
        in_specs.append(pl.BlockSpec((1, 1, bk), smap(lambda ib, ih, iq, ik: (ib, 0, ik))))
        inputs.append(kv_segment_ids)
    if has_positions:
        in_specs.append(pl.BlockSpec((1, bq, 1), smap(lambda ib, ih, iq, ik: (ib, iq, 0))))
        inputs.append(q_positions)
        in_specs.append(pl.BlockSpec((1, 1, bk), smap(lambda ib, ih, iq, ik: (ib, 0, ik))))
        inputs.append(kv_positions)
    if dropout_p > 0.0:
        in_specs.append(
            pl.BlockSpec(
                (1, 1), smap(lambda ib, ih, iq, ik: (0, 0)),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(jnp.asarray([[dropout_seed]], jnp.int32))

    out_shape = [
        jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
        jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, bq, d_pad), smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0))),
        pl.BlockSpec((1, 1, bq, 1), smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0))),
    ]
    scratch_shapes = [
        pltpu.VMEM((bq, 1), jnp.float32),  # running max m
        pltpu.VMEM((bq, 1), jnp.float32),  # running sum l
        pltpu.VMEM((bq, d_pad), jnp.float32),  # output accumulator
    ]

    def cparams(semantics):
        return pltpu.CompilerParams(
            dimension_semantics=semantics,
            # large (1024^2) score tiles: fewer grid steps amortize the
            # ~1us/step pipeline overhead (measured 53 -> 83 TF/s on v5e)
            vmem_limit_bytes=100 * 1024 * 1024,
        )

    if sparse:
        import numpy as np

        iq_tab = np.asarray([p_[0] for p_ in pairs] + [-1], np.int32)
        ik_tab = np.asarray([p_[1] for p_ in pairs] + [0], np.int32)
        kernel = functools.partial(_flash_fwd_kernel, params, sk_pad, (nq, nk))
        o, lse = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, h, len(pairs)),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=cparams(("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(jnp.asarray(iq_tab), jnp.asarray(ik_tab), *inputs)
    else:
        kernel = functools.partial(_flash_fwd_kernel, params, sk_pad, None)
        o, lse = pl.pallas_call(
            kernel,
            grid=(b, h, nq, nk),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
            out_shape=out_shape,
            compiler_params=cparams(("parallel", "parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(*inputs)
    return o[:, :, :sq, :d].astype(out_dtype), lse[:, :, :sq, 0]
