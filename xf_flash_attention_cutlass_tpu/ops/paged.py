"""Paged attention decode — Pallas TPU kernel with block-table KV gather.

TPU-native re-design of the reference's splitKV/paged forward
(`compute_attn_1rowblock_splitkv`,
/root/reference/csrc/flash_attn/src/flash_fwd_kernel.h:583-1323) plus the
LSE-weighted split combine (`combine_attn_seqk_parallel`, :1362-1607 — fixed
here; the snapshot shipped it with the LSE load commented out).

Architecture (v2 — built for the HBM roofline):
- KV pool layout is ``(num_pages, kv_heads, page_size, head_dim)``: one page
  across ALL KV heads is a single fully-contiguous 256KB-class chunk, fetched
  by one DMA. (v1 used a BlockSpec per (head, page) → 4096 grid steps of
  32KB; grid-step overhead capped it at ~4% of roofline.)
- Grid is just ``(batch, n_splits)``. Inside the kernel a `fori_loop` walks
  this split's live pages with **manual double-buffered async DMA**
  (pallas_guide.md "Double Buffering"): the next page streams from HBM while
  the current one feeds the MXU — the analog of the reference's K-prefetch
  pipeline (flash_fwd_kernel.h:1016-1120), with the block-table indirection
  of `resolve_thread_kv_page_slice_offset` (utils.h:498-526) done as one
  scalar read per page.
- Scalar-prefetched block table / lengths live in SMEM; dead pages are never
  fetched (loop bound = live page count, window start folded in).
- Split-KV partials (fp32 O, LSE) are merged host-side by
  ``combine_partials``. NB the grid is sequential (the cross-step DMA
  handoff carries slot parity between steps) and v5e has a single
  TensorCore, so splits do NOT buy core parallelism here; they bound
  per-grid-step work and VMEM for very long contexts. Low-batch decode
  keeps the HBM pipe busy through the in-step burst pipeline, not splits
  (measured: b=1 / 32k ctx runs at the same roofline as b=64).
- GQA decode swap: q is (b, kv_heads, group*sq, d); one batched MXU
  contraction per page serves every KV head (export.cpp:524-532's
  `seqlenq_ngroups_swapped`, as a free reshape).
- Quantized pools (int8 / fp8-e4m3, quant/kv.py): per-token scales ride in
  the page DMA and dequant happens in VMEM right before the dots, so HBM
  traffic stays at 1 byte/elem.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xf_flash_attention_cutlass_tpu.ops.combine import combine_partials
from xf_flash_attention_cutlass_tpu.utils import cdiv, default_interpret, next_multiple

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


@dataclasses.dataclass(frozen=True)
class PagedParams:
    seq_q: int  # true number of new query tokens per batch entry
    group: int  # q heads per kv head
    rows: int  # padded q rows per kv head (>= group*seq_q)
    kv_heads: int
    head_dim: int
    page_size: int  # TRUE tokens per page (position algebra)
    # VMEM score-column stride per page == dma_rows == value rows
    # stored/fetched per page (page padded up to the kv dtype's sublane
    # tile; pad columns masked). scale_stride = lanes per page in the
    # quant scale planes (128-lane padded for DMA alignment); when it
    # exceeds page_stride the kernel compacts the scale vector in
    # registers once per burst (reshape/slice — measured cheap next to
    # the 4-8x dead-column compute the old unified 128 stride cost).
    page_stride: int
    dma_rows: int
    scale_stride: int  # 0 when not quantized
    pages_per_split: int
    scale: float
    causal: bool
    window: Tuple[int, int]
    softcap: float
    has_alibi: bool
    has_leftpad: bool
    kv_quant: bool
    # pools carry a leading layer axis and a scalar layer index selects the
    # slice inside the kernel (serving: whole-stack pools stay one buffer,
    # no per-layer slice copies)
    has_layer: bool = False
    # logical pages fetched + computed per pipeline step: amortizes DMA
    # issue, semaphore and matmul-launch overhead over ~1MB bursts
    pages_per_burst: int = 1
    # diagnostic only (XFA_PROBE_NO_SCALE_DMA=1): skip the per-page scale
    # copies and dequant with whatever the scale buffers hold — WRONG
    # numerics, bounds what the scale streams cost (CLAUDE.md: account DMA
    # traffic before tuning compute)
    probe_no_scale_dma: bool = False


def _paged_kernel(params: PagedParams, *refs):
    """Grid: (batch, split). Walks the split's live pages with 2-slot DMA."""
    it = iter(refs)
    block_tables_ref = next(it)  # scalar prefetch (b, max_pages)
    kv_lens_ref = next(it)  # scalar prefetch (b,)
    leftpad_ref = next(it) if params.has_leftpad else None  # scalar (b,)
    lidx_ref = next(it) if params.has_layer else None  # scalar (1,)
    q_ref = next(it)  # (1, h_k, rows, d) VMEM
    k_hbm = next(it)  # (num_pages, h_k, page, d) ANY/HBM
    v_hbm = next(it)
    ks_hbm = next(it) if params.kv_quant else None  # (num_pages, h_k, page) f32
    vs_hbm = next(it) if params.kv_quant else None
    alibi_ref = next(it) if params.has_alibi else None  # (1, h_k, rows, 1) f32
    o_ref = next(it)  # (1, 1, h_k, rows, d) f32
    lse_ref = next(it)  # (1, 1, h_k, rows) f32
    k_buf = next(it)  # (2, h_k, page, d) VMEM scratch (kv dtype)
    v_buf = next(it)
    ks_buf = next(it) if params.kv_quant else None  # (2, h_k, page) f32
    vs_buf = next(it) if params.kv_quant else None
    m_scr = next(it)  # (h_k, rows, 1) f32
    l_scr = next(it)
    acc_scr = next(it)  # (h_k, rows, d) f32
    sems = next(it)  # DMA sems (2, 4)
    slot_state = next(it)  # SMEM (1,) int32: global 2-slot parity across steps

    ib = pl.program_id(0)
    isplit = pl.program_id(1)
    pps = params.pages_per_split
    page = params.page_size
    ps = params.page_stride  # VMEM score columns per page (== dma_rows)
    dr = params.dma_rows  # value rows fetched per page
    ss = params.scale_stride or ps  # scale-plane lanes per page
    padded_cols = ps != page  # some columns are storage pad, not tokens
    rows = params.rows
    g = params.group
    sq = params.seq_q
    h_k = params.kv_heads
    pb = params.pages_per_burst
    burst = pb * ps  # VMEM key columns per pipeline step

    kv_len = kv_lens_ref[ib]
    leftpad = leftpad_ref[ib] if params.has_leftpad else 0
    wl, wr = params.window
    if params.causal:
        wr = 0

    def burst_range(ib_, isplit_):
        """(lo, hi, n_pages) of live pages for grid step (ib_, isplit_)."""
        kl = kv_lens_ref[ib_]
        n_live = pl.cdiv(kl, page)
        lo_ = isplit_ * pps
        if wl >= 0:
            # sliding window: pages entirely left of the earliest visible
            # key are skipped; stay burst-aligned so column indexing below
            # remains uniform
            first_col = jnp.maximum(kl - sq - wl, 0)
            lo_ = jnp.maximum(lo_, (first_col // (page * pb)) * pb)
        hi_ = jnp.minimum((isplit_ + 1) * pps, n_live)
        return lo_, hi_, jnp.maximum(hi_ - lo_, 0)

    lo, hi, n_pages = burst_range(ib, isplit)
    n_bursts = pl.cdiv(n_pages, pb)

    # the following grid step, for the cross-step DMA handoff
    nsplits = pl.num_programs(1)
    nb = pl.num_programs(0)
    last_split = isplit == nsplits - 1
    ib2 = jnp.minimum(ib + last_split.astype(jnp.int32), nb - 1)
    isplit2 = jnp.where(last_split, 0, isplit + 1)
    has_next = jnp.logical_or(ib + last_split.astype(jnp.int32) < nb,
                              jnp.logical_not(last_split))
    lo2, hi2, n_pages2 = burst_range(ib2, isplit2)

    def dma(ib_, lo_, hi_, slot, i):
        """Async copies for burst i: pb logical pages -> one VMEM window.
        Returns (k_side, v_side) lists of (live, copy): K (+k-scales) copies
        are issued first and waited before the QK^T dot; V (+v-scales)
        copies are only waited after the softmax, so the V stream overlaps
        the score compute. `live` gates tail pages past the live range:
        they are never fetched (measured 7-8% of HBM traffic on mixed-length
        decode at pb=2 — fetching the clamped last page instead cost the
        whole 0.88-vs-0.90 roofline gap; their columns are masked anyway,
        so the stale window contents are dead)."""
        k_side, v_side = [], []
        for j in range(pb):
            live = (lo_ + i * pb + j) < hi_ if j > 0 else None  # j=0 always
            pj = jnp.minimum(lo_ + i * pb + j, jnp.maximum(hi_ - 1, 0))
            pe = block_tables_ref[ib_, pj]
            if params.has_layer:
                ksrc = k_hbm.at[lidx_ref[0], pe]
                vsrc = v_hbm.at[lidx_ref[0], pe]
            else:
                ksrc = k_hbm.at[pe]
                vsrc = v_hbm.at[pe]
            sl = slice(j * ps, j * ps + dr)  # value rows of page slot j
            ssl = slice(j * ss, (j + 1) * ss)  # scale lanes of page slot j
            k_side.append((live,
                pltpu.make_async_copy(ksrc, k_buf.at[slot, :, sl], sems.at[slot, 0]),
            ))
            v_side.append((live,
                pltpu.make_async_copy(vsrc, v_buf.at[slot, :, sl], sems.at[slot, 1]),
            ))
            if params.kv_quant and not params.probe_no_scale_dma:
                if params.has_layer:
                    kssrc = ks_hbm.at[lidx_ref[0], pe]
                    vssrc = vs_hbm.at[lidx_ref[0], pe]
                else:
                    kssrc = ks_hbm.at[pe]
                    vssrc = vs_hbm.at[pe]
                k_side.append((live,
                    pltpu.make_async_copy(
                        kssrc, ks_buf.at[slot, :, ssl], sems.at[slot, 2]
                    ),
                ))
                v_side.append((live,
                    pltpu.make_async_copy(
                        vssrc, vs_buf.at[slot, :, ssl], sems.at[slot, 3]
                    ),
                ))
        return k_side, v_side

    def dma_all(ib_, lo_, hi_, slot, i):
        k_side, v_side = dma(ib_, lo_, hi_, slot, i)
        return k_side + v_side

    def start_all(pairs):
        # issue and wait sites must agree on the live condition so every
        # started copy is waited exactly once
        for live, c in pairs:
            if live is None:
                c.start()
            else:
                pl.when(live)(c.start)

    def wait_all(pairs):
        for live, c in pairs:
            if live is None:
                c.wait()
            else:
                pl.when(live)(c.wait)

    is_first = jnp.logical_and(ib == 0, isplit == 0)

    @pl.when(is_first)
    def _reset_parity():
        slot_state[0] = 0
        # Dead tail pages are never fetched (see dma), and their masked
        # columns contribute p=0 · v — safe for any FINITE stale v, but a
        # never-written scratch window could hold NaN payloads (0·NaN=NaN).
        # One memset on the first grid step makes every later stale read
        # previously-fetched finite data. K-side buffers need none: scores
        # are masked to NEG_INF after every K/k-scale use.
        v_buf[...] = jnp.zeros_like(v_buf)
        if params.kv_quant:
            vs_buf[...] = jnp.zeros_like(vs_buf)

    s0 = slot_state[0]

    @pl.when(jnp.logical_and(is_first, n_pages > 0))
    def _self_issue():
        # only the very first grid step has no predecessor to prefetch it
        start_all(dma_all(ib, lo, hi, 0, 0))

    def handoff():
        # issue the NEXT grid step's burst 0 so it streams during the rest
        # of this step's compute (kills the per-step pipeline bubble)
        @pl.when(jnp.logical_and(has_next, n_pages2 > 0))
        def _():
            start_all(dma_all(ib2, lo2, hi2, (s0 + n_bursts) % 2, 0))

    @pl.when(n_pages == 0)
    def _empty_handoff():
        handoff()

    # decode fast path: sq==1 makes every causal row see exactly
    # [0, kv_len) ∩ [0, hi*page), so the mask collapses to one scalar
    # column bound — no per-row qpos plane, one compare, one where
    fast_mask = (
        sq == 1
        and (params.causal or (wl < 0 and wr < 0))
        and wl < 0
        and not params.has_leftpad
    )
    # bf16 pools take the exp at bf16 (2x VPU rate, like flash_fwd); the
    # row sum still accumulates in f32
    fast_exp = q_ref.dtype == jnp.bfloat16

    @pl.when(n_pages > 0)
    def _run():
        # m floor: masked columns hold NEG_INF ≪ -1e30, so exp(s - m) under-
        # flows to exactly 0 without a second where (m never sinks below the
        # floor, so all-masked bursts cannot produce exp(0)=1 ghosts)
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0]  # (h_k, rows, d)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, burst), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (rows, burst), 1)
        qpos = kv_len - sq + jnp.minimum(row_i // g, sq - 1)
        if padded_cols:
            # VMEM column -> token offset within the burst: page slot j
            # spans ps columns of which the first `page` are tokens; pad
            # columns are dead (live_col) — their kcol would alias the
            # next page's tokens, so the mask is not optional
            pj_i = col_i // ps
            t_i = col_i - pj_i * ps
            colmap = pj_i * page + t_i
            live_col = t_i < page
        else:
            colmap = col_i
            live_col = None

        def scale_vec(sv):
            # (h_k, pb*ss) -> (h_k, pb*ps): compact each page's first ps
            # scale lanes next to its score columns (no-op when ss == ps)
            if ss == ps:
                return sv
            return jnp.concatenate(
                [sv[:, j * ss : j * ss + ps] for j in range(pb)], axis=1
            )

        def body(i, _):
            slot = (s0 + i) % 2

            @pl.when(i + 1 < n_bursts)
            def _prefetch():
                start_all(dma_all(ib, lo, hi, (s0 + i + 1) % 2, i + 1))

            @pl.when(i + 1 == n_bursts)
            def _handoff():
                handoff()

            k_side, v_side = dma(ib, lo, hi, slot, i)
            wait_all(k_side)

            kv_start = (lo + i * pb) * page
            kcol = kv_start + colmap

            # Quantized K/V feed the dots at their storage dtype (Mosaic
            # lowers mixed bf16 x int8/fp8 contractions); the per-token
            # scale is factored out of the d-axis onto the (rows, cols)
            # score plane: (q · k_q^T)[r,c] * ks[c] == q · (k_q*ks)^T[r,c]
            # at cols*rows scale-muls instead of cols*d dequant muls.
            k = k_buf[slot]

            # batched over kv heads: (h_k, rows, d) x (h_k, page, d);
            # q arrives pre-multiplied by softmax_scale (wrapper) so no
            # per-burst score scaling pass is needed
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (h_k, rows, page)
            if params.kv_quant:
                s = s * scale_vec(ks_buf[slot])[:, None, :].astype(jnp.float32)
            if params.softcap > 0.0:
                s = jnp.tanh(s / params.softcap) * params.softcap

            # columns past this split's page range (burst tail overshoot)
            # belong to other splits and re-read clamped pages — mask them
            if fast_mask:
                # single compare against a scalar column bound
                bound = jnp.minimum(kv_len, hi * page)
                keep = kcol < bound
            else:
                keep = jnp.logical_and(kcol < kv_len, kcol < hi * page)
                if params.causal or wr >= 0:
                    keep = jnp.logical_and(keep, kcol <= qpos + max(wr, 0))
                if wl >= 0:
                    keep = jnp.logical_and(keep, kcol >= qpos - wl)
                if params.has_leftpad:
                    keep = jnp.logical_and(keep, kcol >= leftpad)
            if live_col is not None:
                keep = jnp.logical_and(keep, live_col)

            if params.has_alibi:
                slope = alibi_ref[0]  # (h_k, rows, 1)
                kcol_eff = (
                    jnp.where(kcol >= leftpad, kcol - leftpad, 2**30)
                    if params.has_leftpad
                    else kcol
                )
                qpos_eff = qpos - leftpad if params.has_leftpad else qpos
                s = s - slope * jnp.abs(qpos_eff - kcol_eff).astype(jnp.float32)[None]

            s = jnp.where(keep[None], s, NEG_INF)

            m_prev = m_scr[...]  # (h_k, rows, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
            # masked cols: s - m_new ≤ NEG_INF + 1e30 → exp underflows to 0
            # exactly (m floor above), so no post-exp where is needed
            if fast_exp:
                p = jnp.exp((s - m_new).astype(jnp.bfloat16))
            else:
                p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_scr[...] = l_scr[...] * corr + jnp.sum(
                p, axis=2, keepdims=True, dtype=jnp.float32
            )
            # V (+v-scales) only becomes a dependency here: its DMA streamed
            # behind K during the score/softmax work above
            wait_all(v_side)
            v = v_buf[slot]
            if params.kv_quant:
                # v's per-token scale rides on p (cols axis), not on v
                p = p * scale_vec(vs_buf[slot])[:, None, :].astype(p.dtype)
                p = p.astype(q.dtype)  # p must stay float vs int8/fp8 v
            else:
                p = p.astype(v.dtype)
            acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            m_scr[...] = m_new
            return 0

        jax.lax.fori_loop(0, n_bursts, body, 0)

    slot_state[0] = (s0 + n_bursts) % 2

    m = m_scr[...]
    l = l_scr[...]
    valid = n_pages > 0
    empty = jnp.logical_or(l <= 0.0, jnp.logical_not(valid))
    inv = jnp.where(empty, 0.0, 1.0 / jnp.where(empty, 1.0, l))
    o_ref[0, 0] = acc_scr[...] * inv
    lse_ref[0, 0] = jnp.where(
        empty, -jnp.inf, m + jnp.log(jnp.where(empty, 1.0, l))
    )[..., 0]


def num_splits_heuristic(
    n_work: int, num_cores: int, max_n_blocks: int, max_splits: int
) -> int:
    """Occupancy split search — the reference's `num_splits_heuristic`
    (/root/reference/csrc/paged_attn.cpp:128-163) with TensorCores in the
    SM role: if `n_work` units already fill >=80% of the cores, don't
    split; otherwise take the SMALLEST split count whose wave efficiency
    (work / ceil(work / cores) / cores) is >=85% of the best achievable,
    skipping splits that don't actually shrink the per-split block count.
    `n_work` is the batch-level parallel unit count (grid dim 0)."""
    if n_work >= 0.8 * num_cores:
        return 1
    max_splits = max(1, min(max_splits, num_cores, max_n_blocks))

    def eff(s):
        waves = n_work * s / num_cores
        return waves / math.ceil(waves)

    best = 0.0
    effs = []
    for s in range(1, max_splits + 1):
        if s > 1 and math.ceil(max_n_blocks / s) == math.ceil(
            max_n_blocks / (s - 1)
        ):
            effs.append(0.0)  # same per-split work as s-1: no point
            continue
        e = eff(s)
        effs.append(e)
        best = max(best, e)
    for s in range(1, max_splits + 1):
        if effs[s - 1] >= 0.85 * best:
            return s
    return 1


def paged_attention(
    q: jax.Array,  # (b, sq, h, d) — new query tokens
    k_pool: jax.Array,  # (num_pages, kv_heads, page_size, d)
    v_pool: jax.Array,  # (num_pages, kv_heads, page_size, d)
    block_tables: jax.Array,  # (b, max_pages) int32
    kv_lens: jax.Array,  # (b,) int32 — total visible keys (incl. new)
    *,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jax.Array] = None,  # (b, h) or (h,) f32
    cache_leftpad: Optional[jax.Array] = None,  # (b,) int32
    num_splits: int = 0,
    k_scales: Optional[jax.Array] = None,  # (num_pages, h_k, page[, 1]) f32
    v_scales: Optional[jax.Array] = None,
    layer_idx: Optional[jax.Array] = None,  # scalar int32: pools are (L, ...)
    page_size: Optional[int] = None,  # true tokens/page when pools are padded
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Paged-KV attention over new query tokens. Returns (O, LSE).

    O: (b, sq, h, d) in q.dtype; LSE: (b, h, sq) fp32 natural log.
    When k_scales/v_scales are given, k_pool/v_pool hold int8 or fp8-e4m3
    values and dequant is fused into the attention tiles (quant/kv.py).
    With layer_idx, pools carry a leading layer axis (L, num_pages, ...) and
    the kernel reads layer layer_idx without slicing the buffer — the
    whole-stack pools stay one array through a lax.scan over layers.

    Small pages (the reference's block-16 deployment geometry,
    /root/reference/csrc/flash_attn/src/utils.h:518-521) are supported at
    any dtype: pages below the DMA tile are stored padded — values to the
    kv dtype's sublane tile (f32:8, bf16:16, int8/fp8:32), quant scale
    planes to 128 lanes — the kernel walks score columns at the value
    stride (pad columns masked) and compacts each burst's scale lanes in
    registers (slice+concat; the 128-col unified stride measured 3x
    slower — dead-column compute dominates at decode row counts).
    Callers with tight pools pay a per-call jnp.pad (a PER-STEP pool
    copy under scan — fine for one-shots, 2x the kernel cost in a loop);
    serving callers store pools pre-padded and pass `page_size` (the
    true page) so the pad is a no-op. Measured tax at page 16 (RESULTS_
    r4.md): bf16 0.73, int8/fp8 ~0.23 of live-byte roofline (2x sublane
    padding + scale planes + 16-token DMA granularity); the TPU-native
    geometry is page 256 (0.90+).
    """
    if interpret is None:
        interpret = default_interpret()
    kv_quant = k_scales is not None
    has_layer = layer_idx is not None
    out_dtype = q.dtype
    if not interpret and q.dtype == jnp.float16:
        q = q.astype(jnp.float32)
    if not kv_quant and not interpret and k_pool.dtype == jnp.float16:
        k_pool = k_pool.astype(jnp.float32)
        v_pool = v_pool.astype(jnp.float32)
    b, sq, h, d = q.shape
    num_pages, h_k, stored_page, _ = k_pool.shape[-4:]
    page = int(page_size) if page_size is not None else stored_page
    if page > stored_page:
        raise ValueError(
            f"page_size {page} exceeds the pool's stored page dim "
            f"{stored_page}"
        )
    if has_layer and k_pool.ndim != 5:
        raise ValueError(
            f"layer_idx given but k_pool is not (L, pages, h_k, page, d): "
            f"{k_pool.shape}"
        )
    if h % h_k:
        raise ValueError(f"q heads {h} not a multiple of kv heads {h_k}")
    g = h // h_k
    max_pages = block_tables.shape[1]
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    # --- oversized query blocks: the kernel holds the whole (h_k, rows, d)
    # query block, its f32 accumulator AND the (h_k, rows, burst) score
    # chain in VMEM; beyond ~1024 rows Mosaic's register allocator spills
    # blow the 128MB budget (measured: rows=2048 at the 8B chunked-prefill
    # geometry needs 150MB and fails to COMPILE). Split the call into
    # sequential token groups — exact: for causal geometry, a group ending
    # at token t1 sees kv_len - (sq - t1) keys, so shifting kv_lens
    # re-derives every per-token position; for position-free non-causal
    # (no window/alibi) the positions never enter the math. Each group
    # re-reads the KV stream, the standard flash row-block trade.
    rows_max = int(os.environ.get("XFA_PAGED_ROWS_MAX", 1024))
    splittable = causal or (
        window[0] < 0 and window[1] < 0 and alibi_slopes is None
    )
    if sq > 1 and sq * g > rows_max and splittable:
        t_sub = max(rows_max // g, 1)
        outs, lses = [], []
        for t0 in range(0, sq, t_sub):
            t1 = min(t0 + t_sub, sq)
            kv_sub = kv_lens - (sq - t1) if causal else kv_lens
            o_i, lse_i = paged_attention(
                q[:, t0:t1], k_pool, v_pool, block_tables, kv_sub,
                softmax_scale=softmax_scale, causal=causal, window=window,
                softcap=softcap, alibi_slopes=alibi_slopes,
                cache_leftpad=cache_leftpad, num_splits=num_splits,
                k_scales=k_scales, v_scales=v_scales, layer_idx=layer_idx,
                page_size=page, interpret=interpret,
            )
            outs.append(o_i)
            lses.append(lse_i)
        return jnp.concatenate(outs, axis=1), jnp.concatenate(lses, axis=2)

    # --- decode swap: (b, sq, h_k, g, d) -> (b, h_k, sq*g, d), row = t*g + gi
    rows_real = sq * g
    rows = max(next_multiple(rows_real, 8), 8)
    # softmax scale folded into q (in f32) so the kernel skips the per-burst
    # score-scaling pass; q is tiny next to the KV stream
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qg = q.reshape(b, sq, h_k, g, d).transpose(0, 2, 1, 3, 4).reshape(b, h_k, rows_real, d)
    d_pad = max(next_multiple(d, 128), 128)
    # DMA tile geometry: value pages are stored padded to the kv dtype's
    # sublane tile (dma_rows); quant scale planes to 128 lanes. When the
    # lane-padded scale stride exceeds the value rows, the kernel walks
    # VMEM at page_stride columns per page (pad columns masked) so scale
    # lanes and score columns stay aligned with ONE index map.
    sub_req = 32 if kv_quant else (16 if k_pool.dtype == jnp.bfloat16 else 8)
    dma_rows = max(next_multiple(page, sub_req), sub_req)
    page_stride = dma_rows
    scale_stride = (
        max(next_multiple(dma_rows, 128), 128) if kv_quant else 0
    )
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, rows - rows_real), (0, d_pad - d)))
    if d_pad != d or dma_rows != stored_page:
        pad = ((0, 0),) * (k_pool.ndim - 2) + (
            (0, dma_rows - stored_page), (0, d_pad - d),
        )
        k_pool = jnp.pad(k_pool, pad)
        v_pool = jnp.pad(v_pool, pad)
    if kv_quant:
        if k_scales.ndim == k_pool.ndim:  # trailing (..., 1) from quantize_kv
            k_scales = k_scales[..., 0]
            v_scales = v_scales[..., 0]
        if k_scales.shape[-1] != scale_stride:
            spad = ((0, 0),) * (k_scales.ndim - 1) + (
                (0, scale_stride - k_scales.shape[-1]),
            )
            k_scales = jnp.pad(k_scales, spad)
            v_scales = jnp.pad(v_scales, spad)
        # Scales stay fp32. bf16 scale pools were measured SLOWER on v5e
        # (fp8 headline shape: 304-313us/step vs 297.7 f32, interleaved),
        # and a no-scale-DMA probe showed the scale stream is fully hidden
        # anyway (292 vs 295us with the copies deleted) — the scale bytes
        # are not on the critical path, so narrowing them buys nothing
        # and the (8, page) bf16 slices lower worse.
        k_scales = k_scales.astype(jnp.float32)
        v_scales = v_scales.astype(jnp.float32)

    kv_lens = kv_lens.astype(jnp.int32)
    block_tables = block_tables.astype(jnp.int32)

    if num_splits <= 0:
        # Default is 1 everywhere: this kernel's grid is declared
        # dimension_semantics=('arbitrary','arbitrary') because the
        # cross-grid-step DMA handoff REQUIRES sequential execution, so
        # extra splits can never occupy a second TensorCore (Megacore
        # v4/v5p included) — they only add partial-accumulator HBM traffic
        # plus a combine pass. Measured a no-op on v5e (fp8 paged decode:
        # b=1/32k ctx 0.92 of roofline with 1 split vs 0.91 with 4;
        # b=64/1.5k 0.93). The reference's occupancy heuristic
        # (/root/reference/csrc/paged_attn.cpp:128-163) is still exported
        # as `num_splits_heuristic` for explicit use, and explicit
        # num_splits overrides; re-enable a heuristic default only with a
        # Megacore-parallel kernel variant (round-3 advisor finding).
        num_splits = 1
    num_splits = max(1, min(num_splits, max_pages))
    pps = cdiv(max_pages, num_splits)

    has_alibi = alibi_slopes is not None
    alibi_rows = None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None], (b, h))
        r = jnp.arange(rows, dtype=jnp.int32)
        gi = r % g
        alibi_rows = slopes.reshape(b, h_k, g)[:, :, gi].reshape(b, h_k, rows, 1)

    has_leftpad = cache_leftpad is not None
    leftpad = cache_leftpad.astype(jnp.int32) if has_leftpad else None

    # burst sizing: ~1MB of K per pipeline step — large enough to amortize
    # DMA issue + matmul launch overhead, small enough that the 2-slot
    # double buffer (with the cross-step handoff filling inter-step gaps)
    # keeps the HBM pipe continuously busy
    page_bytes = h_k * dma_rows * d_pad * k_pool.dtype.itemsize
    # measured on v5e (8B decode shape, page 256): 512KB bursts beat 1MB for
    # both bf16 (0.91 vs 0.85 of roofline) and fp8 (0.83 vs 0.76) — the
    # smaller step pipelines the 2-slot DMA double-buffer more tightly
    burst_target = int(os.environ.get("XFA_PAGED_BURST_BYTES", 1 << 19))
    probe_no_scale_dma = os.environ.get("XFA_PROBE_NO_SCALE_DMA") == "1"
    pages_per_burst = max(1, min(burst_target // max(page_bytes, 1), pps, 16))

    params = PagedParams(
        seq_q=sq,
        group=g,
        rows=rows,
        kv_heads=h_k,
        head_dim=d_pad,
        page_size=page,
        page_stride=page_stride,
        dma_rows=dma_rows,
        scale_stride=scale_stride,
        pages_per_split=pps,
        scale=scale,
        causal=causal,
        window=tuple(int(w) for w in window),
        softcap=float(softcap),
        has_alibi=has_alibi,
        has_leftpad=has_leftpad,
        kv_quant=kv_quant,
        has_layer=has_layer,
        pages_per_burst=pages_per_burst,
        probe_no_scale_dma=probe_no_scale_dma,
    )

    def _q_index(ib, isplit, *_):
        return (ib, 0, 0, 0)

    def _o_index(ib, isplit, *_):
        return (ib, isplit, 0, 0, 0)

    def _lse_index(ib, isplit, *_):
        return (ib, isplit, 0, 0)

    in_specs = [
        pl.BlockSpec((1, h_k, rows, d_pad), _q_index),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [qg, k_pool, v_pool]
    if kv_quant:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        inputs += [k_scales, v_scales]
    if has_alibi:
        in_specs.append(pl.BlockSpec((1, h_k, rows, 1), _q_index))
        inputs.append(alibi_rows)

    scalars = [block_tables, kv_lens]
    if has_leftpad:
        scalars.append(leftpad)
    if has_layer:
        scalars.append(jnp.asarray(layer_idx, jnp.int32).reshape(1))
    num_scalar = len(scalars)

    kv_dtype = k_pool.dtype
    burst = pages_per_burst * page_stride
    scratch_shapes = [
        pltpu.VMEM((2, h_k, burst, d_pad), kv_dtype),  # k slots
        pltpu.VMEM((2, h_k, burst, d_pad), kv_dtype),  # v slots
    ]
    if kv_quant:
        sburst = pages_per_burst * scale_stride
        scratch_shapes += [
            pltpu.VMEM((2, h_k, sburst), jnp.float32),
            pltpu.VMEM((2, h_k, sburst), jnp.float32),
        ]
    scratch_shapes += [
        pltpu.VMEM((h_k, rows, 1), jnp.float32),  # m
        pltpu.VMEM((h_k, rows, 1), jnp.float32),  # l
        pltpu.VMEM((h_k, rows, d_pad), jnp.float32),  # acc
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.SMEM((1,), jnp.int32),  # cross-step slot parity
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_scalar,
        grid=(b, num_splits),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, h_k, rows, d_pad), _o_index),
            pl.BlockSpec((1, 1, h_k, rows), _lse_index),
        ],
        scratch_shapes=scratch_shapes,
    )

    o_parts, lse_parts = pl.pallas_call(
        functools.partial(_paged_kernel, params),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, num_splits, h_k, rows, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, num_splits, h_k, rows), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # both sequential: the cross-step DMA handoff carries slot
            # parity and in-flight copies between grid steps
            dimension_semantics=("arbitrary", "arbitrary"),
            # double-buffered bursts + f32 dequant temporaries exceed the
            # default 16MB scoped-vmem budget; v5e has 128MB of VMEM
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*scalars, *inputs)

    if num_splits > 1:
        o, lse = combine_partials(
            o_parts.transpose(1, 0, 2, 3, 4), lse_parts.transpose(1, 0, 2, 3)
        )
    else:
        o, lse = o_parts[:, 0], lse_parts[:, 0]

    # undo decode swap: (b, h_k, rows, d) -> (b, sq, h, d)
    o = o[:, :, :rows_real, :d].reshape(b, h_k, sq, g, d)
    o = o.transpose(0, 2, 1, 3, 4).reshape(b, sq, h, d).astype(out_dtype)
    lse = lse[:, :, :rows_real].reshape(b, h_k, sq, g)
    lse = lse.transpose(0, 2, 1, 3).reshape(b, sq, h).transpose(0, 2, 1)
    return o, lse
