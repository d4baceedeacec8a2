"""Paged attention decode — Pallas TPU kernel with block-table KV gather.

TPU-native re-design of the reference's splitKV/paged forward
(`compute_attn_1rowblock_splitkv`,
/root/reference/csrc/flash_attn/src/flash_fwd_kernel.h:583-1323) plus the
LSE-weighted split combine (`combine_attn_seqk_parallel`, :1362-1607 — fixed
here; the snapshot shipped it with the LSE load commented out).

Design (TPU-first, not a translation):
- The KV pool lives in HBM as ``(kv_heads, num_pages, page_size, head_dim)``
  so a page block is a well-tiled ``(page_size, d)`` VMEM tile. (The
  reference's pool is (num_blocks, page, h_k, d) — that order would put the
  page rows on a non-tiled axis; the public wrapper transposes.)
- The block table is a **scalar-prefetch** argument
  (``pltpu.PrefetchScalarGridSpec``): the page index feeds the K/V BlockSpec
  index maps, so Mosaic's pipeline DMAs pages ahead of compute — the analog
  of `resolve_thread_kv_page_slice_offset` (utils.h:498-526) without any
  per-thread address math.
- Pages past a sequence's length are clamped in the index map to the last
  live page: consecutive grid steps then map to the same block and Mosaic
  skips the redundant DMA entirely (the analog of the reference's
  n_block_max trim).
- Split-KV is grid axis 2; each split writes fp32 (O, LSE) partials and the
  host-side ``combine_partials`` merges them (ops/combine.py). On TPU splits
  mainly buy Megacore parallelism when batch*kv_heads is small.
- GQA: q is reshaped to (b, kv_heads, g*sq, d) so one kernel invocation
  serves a whole KV-head group — the TPU analog of the reference's
  `seqlenq_ngroups_swapped` decode swap (export.cpp:524-532), except it is
  a free reshape here, not a kernel-level transpose.
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

from xf_flash_attention_cutlass_tpu.ops.combine import combine_partials
from xf_flash_attention_cutlass_tpu.utils import cdiv, default_interpret, next_multiple

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


@dataclasses.dataclass(frozen=True)
class PagedParams:
    seq_q: int  # true number of new query tokens per batch entry
    group: int  # q heads per kv head
    rows: int  # padded q rows per kv head (>= group*seq_q)
    page_size: int
    pages_per_split: int
    scale: float
    causal: bool
    window: Tuple[int, int]
    softcap: float
    has_alibi: bool
    has_leftpad: bool
    kv_quant: bool = False  # K/V arrive int8/fp8 with per-token scales


def _paged_kernel(params: PagedParams, *refs):
    """Grid: (batch, kv_head, split, page-within-split)."""
    it = iter(refs)
    block_tables_ref = next(it)  # scalar prefetch (b, max_pages)
    kv_lens_ref = next(it)  # scalar prefetch (b,)
    leftpad_ref = next(it) if params.has_leftpad else None  # scalar (b,)
    q_ref = next(it)  # (1, 1, rows, d)
    k_ref = next(it)  # (1, 1, page, d)
    v_ref = next(it)
    ks_ref = next(it) if params.kv_quant else None  # (1, 1, page, 1) f32
    vs_ref = next(it) if params.kv_quant else None
    alibi_ref = next(it) if params.has_alibi else None  # (1, 1, rows, 1) f32
    o_ref = next(it)  # (1, 1, 1, rows, d) f32
    lse_ref = next(it)  # (1, 1, 1, rows, 1) f32
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)

    ib = pl.program_id(0)
    isplit = pl.program_id(2)
    ip = pl.program_id(3)
    pps = params.pages_per_split
    page = params.page_size
    rows = params.rows
    g = params.group
    sq = params.seq_q

    @pl.when(ip == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_len = kv_lens_ref[ib]
    leftpad = leftpad_ref[ib] if params.has_leftpad else 0
    page_idx = isplit * pps + ip
    kv_start = page_idx * page

    # q row r covers (token t = r // g, group lane = r % g); its key-space
    # position is kv_len - sq + t. Padding rows (r >= g*sq) emit zeros.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, page), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (rows, page), 1)
    qpos = kv_len - sq + jnp.minimum(row_i // g, sq - 1)
    kcol = kv_start + col_i

    wl, wr = params.window
    if params.causal:
        wr = 0

    live = kv_start < kv_len
    if params.causal or wr >= 0:
        live = jnp.logical_and(live, kv_start <= kv_len - 1 + max(wr, 0))
    if wl >= 0:
        # earliest visible key for the first q row
        live = jnp.logical_and(live, kv_start + page - 1 >= kv_len - sq - wl)

    @pl.when(live)
    def _body():
        q = q_ref[0, 0]  # (rows, d)
        k = k_ref[0, 0]  # (page, d)
        if params.kv_quant:
            # dequant fused into the QK^T tile: int8/fp8 values upcast in
            # VMEM and scaled per token — HBM traffic stays at the quantized
            # width (the point: decode is bandwidth-bound). Cf. the unused
            # int8 MFMA atoms the reference intended for this
            # (mma_gfx928.hpp:299-341).
            k = k.astype(jnp.float32) * ks_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * params.scale
        if params.softcap > 0.0:
            s = jnp.tanh(s / params.softcap) * params.softcap

        keep = kcol < kv_len
        if params.causal or wr >= 0:
            keep = jnp.logical_and(keep, kcol <= qpos + max(wr, 0))
        if wl >= 0:
            keep = jnp.logical_and(keep, kcol >= qpos - wl)
        if params.has_leftpad:
            keep = jnp.logical_and(keep, kcol >= leftpad)

        if params.has_alibi:
            slope = alibi_ref[0, 0]  # (rows, 1)
            kcol_eff = (
                jnp.where(kcol >= leftpad, kcol - leftpad, 2**30)
                if params.has_leftpad
                else kcol
            )
            qpos_eff = qpos - leftpad if params.has_leftpad else qpos
            s = s - slope * jnp.abs(qpos_eff - kcol_eff).astype(jnp.float32)

        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(keep, p, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        if params.kv_quant:
            v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0]
            p = p.astype(jnp.float32)
        else:
            v = v_ref[0, 0]
            p = p.astype(v_ref.dtype)
        acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
            p,
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = m_new

    @pl.when(ip == pps - 1)
    def _epilogue():
        m = m_scr[...]
        l = l_scr[...]
        empty = l <= 0.0
        inv = jnp.where(empty, 0.0, 1.0 / jnp.where(empty, 1.0, l))
        o_ref[0, 0, 0] = acc_scr[...] * inv
        lse_ref[0, 0, 0] = jnp.where(
            empty, -jnp.inf, m + jnp.log(jnp.where(empty, 1.0, l))
        )


def paged_attention(
    q: jax.Array,  # (b, sq, h, d) — new query tokens
    k_pool: jax.Array,  # (kv_heads, num_pages, page_size, d)
    v_pool: jax.Array,  # (kv_heads, num_pages, page_size, d)
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
    k_scales: Optional[jax.Array] = None,  # (h_k, num_pages, page, 1) f32
    v_scales: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Paged-KV attention over new query tokens. Returns (O, LSE).

    O: (b, sq, h, d) in q.dtype; LSE: (b, h, sq) fp32 natural log.
    When k_scales/v_scales are given, k_pool/v_pool hold int8 or fp8-e4m3
    values and dequant is fused into the attention tiles (quant/kv.py).
    """
    if interpret is None:
        interpret = default_interpret()
    kv_quant = k_scales is not None
    out_dtype = q.dtype
    if not interpret and q.dtype == jnp.float16:
        q = q.astype(jnp.float32)
    if not kv_quant and not interpret and k_pool.dtype == jnp.float16:
        k_pool = k_pool.astype(jnp.float32)
        v_pool = v_pool.astype(jnp.float32)
    b, sq, h, d = q.shape
    h_k, num_pages, page, _ = k_pool.shape
    if h % h_k:
        raise ValueError(f"q heads {h} not a multiple of kv heads {h_k}")
    g = h // h_k
    max_pages = block_tables.shape[1]
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    # --- decode swap: (b, sq, h_k, g, d) -> (b, h_k, sq*g, d), row = t*g + gi
    rows_real = sq * g
    rows = max(next_multiple(rows_real, 8), 8)
    qg = q.reshape(b, sq, h_k, g, d).transpose(0, 2, 1, 3, 4).reshape(b, h_k, rows_real, d)
    d_pad = max(next_multiple(d, 128), 128)
    page_pad = max(next_multiple(page, 8), 8)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, rows - rows_real), (0, d_pad - d)))
    if d_pad != d or page_pad != page:
        k_pool = jnp.pad(
            k_pool, ((0, 0), (0, 0), (0, page_pad - page), (0, d_pad - d))
        )
        v_pool = jnp.pad(
            v_pool, ((0, 0), (0, 0), (0, page_pad - page), (0, d_pad - d))
        )

    kv_lens = kv_lens.astype(jnp.int32)
    block_tables = block_tables.astype(jnp.int32)

    if num_splits <= 0:
        # Megacore has 2 sequential-grid cores; split only if the outer grid
        # can't fill them (the TPU analog of num_splits_heuristic,
        # /root/reference/csrc/paged_attn.cpp:128-163).
        num_splits = 2 if (b * h_k) < 2 and max_pages >= 2 else 1
    num_splits = max(1, min(num_splits, max_pages))
    pps = cdiv(max_pages, num_splits)

    has_alibi = alibi_slopes is not None
    alibi_rows = None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None], (b, h))
        # slope per padded q row: row r -> head ihk*g + r % g
        r = jnp.arange(rows, dtype=jnp.int32)
        gi = jnp.minimum(r % g, g - 1)
        alibi_rows = (
            slopes.reshape(b, h_k, g)[:, :, gi].reshape(b, h_k, rows, 1)
        )

    has_leftpad = cache_leftpad is not None
    leftpad = (
        cache_leftpad.astype(jnp.int32) if has_leftpad else None
    )

    params = PagedParams(
        seq_q=sq,
        group=g,
        rows=rows,
        page_size=page_pad,
        pages_per_split=pps,
        scale=scale,
        causal=causal,
        window=tuple(int(w) for w in window),
        softcap=float(softcap),
        has_alibi=has_alibi,
        has_leftpad=has_leftpad,
        kv_quant=kv_quant,
    )

    def _page_index(ib, ihk, isplit, ip, bt_ref, lens_ref, *maybe_lp):
        # clamp dead pages onto the last live page so Mosaic skips the DMA
        n_live = jnp.maximum((lens_ref[ib] + page - 1) // page, 1)
        pi = jnp.minimum(isplit * pps + ip, n_live - 1)
        pi = jnp.minimum(pi, max_pages - 1)
        return (ihk, bt_ref[ib, pi], 0, 0)

    def _q_index(ib, ihk, isplit, ip, bt_ref, lens_ref, *maybe_lp):
        return (ib, ihk, 0, 0)

    def _o_index(ib, ihk, isplit, ip, bt_ref, lens_ref, *maybe_lp):
        return (ib, ihk, isplit, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, rows, d_pad), _q_index),
        pl.BlockSpec((1, 1, page_pad, d_pad), _page_index),
        pl.BlockSpec((1, 1, page_pad, d_pad), _page_index),
    ]
    inputs = [qg, k_pool, v_pool]
    if kv_quant:
        if page_pad != page:
            k_scales = jnp.pad(
                k_scales, ((0, 0), (0, 0), (0, page_pad - page), (0, 0))
            )
            v_scales = jnp.pad(
                v_scales, ((0, 0), (0, 0), (0, page_pad - page), (0, 0))
            )
        in_specs.append(pl.BlockSpec((1, 1, page_pad, 1), _page_index))
        in_specs.append(pl.BlockSpec((1, 1, page_pad, 1), _page_index))
        inputs.append(k_scales.astype(jnp.float32))
        inputs.append(v_scales.astype(jnp.float32))
    if has_alibi:
        in_specs.append(pl.BlockSpec((1, 1, rows, 1), _q_index))
        inputs.append(alibi_rows)

    num_scalar = 3 if has_leftpad else 2
    scalars = [block_tables, kv_lens] + ([leftpad] if has_leftpad else [])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_scalar,
        grid=(b, h_k, num_splits, pps),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, 1, rows, d_pad), _o_index),
            pl.BlockSpec((1, 1, 1, rows, 1), _o_index),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, d_pad), jnp.float32),
        ],
    )

    o_parts, lse_parts = pl.pallas_call(
        functools.partial(_paged_kernel, params),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h_k, num_splits, rows, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h_k, num_splits, rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalars, *inputs)

    if num_splits > 1:
        o, lse = combine_partials(
            o_parts.transpose(2, 0, 1, 3, 4), lse_parts.transpose(2, 0, 1, 3, 4)[..., 0]
        )
    else:
        o, lse = o_parts[:, :, 0], lse_parts[:, :, 0, :, 0]

    # undo decode swap: (b, h_k, rows, d) -> (b, sq, h, d)
    o = o[:, :, :rows_real, :d].reshape(b, h_k, sq, g, d)
    o = o.transpose(0, 2, 1, 3, 4).reshape(b, sq, h, d).astype(out_dtype)
    lse = lse[:, :, :rows_real].reshape(b, h_k, sq, g)
    lse = lse.transpose(0, 2, 1, 3).reshape(b, sq, h).transpose(0, 2, 1)
    return o, lse
