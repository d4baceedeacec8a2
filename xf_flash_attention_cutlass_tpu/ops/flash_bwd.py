"""Flash-attention backward — Pallas TPU kernels.

TPU re-design of the reference's (compiled-out) recompute backward
(`compute_dq_dk_dv_1colblock`, /root/reference/csrc/flash_attn/src/flash_bwd_kernel.h:86-721):

  P  = exp(S - LSE)           (recomputed from residuals, never materialized)
  dP = dO · Vᵀ
  dS = P ∘ (dP - Δ)           with Δ = rowsum(dO ∘ O)   (bwd_preprocess)
  dQ = (dS·scale) · K,  dK = (dS·scale)ᵀ · Q,  dV = Pᵀ · dO

Default path: the TPU-idiomatic two-pass split
 - dQ kernel:  grid (b, h, q_block, kv_block); dQ accumulates in an fp32
   output block held in VMEM across the inner KV dimension (no atomics).
 - dKV kernel: grid (b, kv_head, kv_block, group, q_block); dK/dV
   accumulate across both the GQA group and the q-block dims, so MQA/GQA
   head-summing (export.cpp:1164-1168) happens in-kernel with no extra
   HBM traffic.
A reference-style FUSED single pass (``fused=True``) also exists: grid
(b, kv_head, group, q_block, kv_block), S/dP recomputed once per block
pair, dK/dV accumulated into full-sequence VMEM-resident output blocks
written to HBM once per (batch, kv_head) — 5 block-GEMMs per pair vs the
two-pass's 7. Measured on v5e (32 heads, d=128, causal, seq 4k/8k,
bitwise-identical grads): the fused pass is ~20% SLOWER in wall time
despite 29% fewer MXU flops — the two-pass kernels execute at ~0.87 of
MXU peak (Mosaic pipelines their streaming inputs perfectly), while the
fused kernel's resident accumulators + dynamic-slice read-modify-writes
stall the pipeline. The reference's fused design (flash_bwd_kernel.h)
is the right shape for CUDA shared memory, not for the Mosaic pipeline;
two-pass is the default here on measurement, not convenience.
Unlike the reference, all head dims are enabled (it only wired hdim128,
flash_bwd_launch_template.h:256-258).

Dropout replays the forward's counter-based per-block reseed, so fwd and bwd
masks match without storing them (the Philox-offset trick of dropout.h:26-105,
philox.cuh) — this requires identical block shapes in fwd and bwd.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xf_flash_attention_cutlass_tpu.ops.flash_fwd import FlashParams
from xf_flash_attention_cutlass_tpu.utils import default_interpret, next_multiple


def _positions(params, iq, ik, qpos_ref, kpos_ref):
    bq, bk = params.block_q, params.block_k
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if params.has_positions:
        qpos = qpos_ref[0] + jnp.zeros((bq, bk), jnp.int32)  # (bq,1) bcast
        kpos = kpos_ref[0] + jnp.zeros((bq, bk), jnp.int32)  # (1,bk) bcast
    else:
        offset = params.seq_k - params.seq_q
        qpos = iq * bq + row + offset
        kpos = ik * bk + col
    kcol = ik * bk + col
    return qpos, kpos, kcol


def _block_live(params, ib, iq, ik, qpos_ref, kpos_ref, kv_lens_ref):
    bq, bk = params.block_q, params.block_k
    wl, wr = params.window_resolved
    if params.has_positions:
        q_hi, q_lo = jnp.max(qpos_ref[0]), jnp.min(qpos_ref[0])
        k_lo, k_hi = jnp.min(kpos_ref[0]), jnp.max(kpos_ref[0])
    else:
        offset = params.seq_k - params.seq_q
        q_hi, q_lo = (iq + 1) * bq - 1 + offset, iq * bq + offset
        k_lo, k_hi = ik * bk, (ik + 1) * bk - 1
    live = ik * bk < params.seq_k
    live = jnp.logical_and(live, iq * bq < params.seq_q)
    if params.masks_cols_right:
        live = jnp.logical_and(live, k_lo <= q_hi + wr)
    if params.masks_cols_left:
        live = jnp.logical_and(live, k_hi >= q_lo - wl)
    if params.has_kv_lens:
        live = jnp.logical_and(live, ik * bk < kv_lens_ref[ib, 0])
    return live


def _keep_mask(params, seq_k_padded, qpos, kpos, kcol,
               qseg_ref, kseg_ref, kv_lens_ref, ib):
    """Elementwise keep mask, or None when nothing masks (cf. mask.h:99-238)."""
    wl, wr = params.window_resolved
    needs_col_bound = params.has_kv_lens or (seq_k_padded != params.seq_k)
    if not (params.masks_cols_right or params.masks_cols_left
            or params.has_segments or needs_col_bound):
        return None
    keep = jnp.ones(qpos.shape, jnp.bool_)
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
    return keep


def _recompute_p_ds(params, seq_k_padded, q, k, v, do, lse_row, delta_row,
                    qpos, kpos, kcol, alibi_ref, arows_ref, qseg_ref,
                    kseg_ref, kv_lens_ref, seed_ref, ib, ih, iq, ik, nq, nk,
                    h_all):
    """Shared recompute: returns (p_for_dv, ds_raw) both (bq, bk) fp32."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * params.scale
    if params.softcap > 0.0:
        tanh_s = jnp.tanh(s / params.softcap)
        s = tanh_s * params.softcap
    keep = _keep_mask(params, seq_k_padded, qpos, kpos, kcol,
                      qseg_ref, kseg_ref, kv_lens_ref, ib)
    if params.has_alibi:
        s = s - alibi_ref[ib, ih] * jnp.abs(qpos - kpos).astype(jnp.float32)
    elif params.has_alibi_rows:
        # per-q-token slope plane (varlen per-sequence slopes): (bq, 1)
        s = s - arows_ref[0, 0] * jnp.abs(qpos - kpos).astype(jnp.float32)
    # p = exp(s - lse); empty rows (lse = -inf) and masked entries -> 0
    lse_safe = jnp.where(jnp.isfinite(lse_row), lse_row, 3.0e38)
    p = jnp.exp(s - lse_safe)
    if keep is not None:
        p = jnp.where(keep, p, 0.0)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if params.dropout_p > 0.0:
        from xf_flash_attention_cutlass_tpu.ops.flash_fwd import dropout_keep_mask

        blk_idx = ((ib * h_all + ih) * nq + iq) * nk + ik
        keep_drop = dropout_keep_mask(
            params, seed_ref[0, 0], blk_idx, (params.block_q, params.block_k)
        )
        z = jnp.where(keep_drop, 1.0 / (1.0 - params.dropout_p), 0.0)
        p_dv = p * z
        dp = dp * z
    else:
        p_dv = p
    ds = p * (dp - delta_row)
    if params.softcap > 0.0:
        ds = ds * (1.0 - tanh_s * tanh_s)  # calculate_dtanh (utils.h:561-567)
    return p_dv, ds * params.scale


def _bwd_fused_kernel(params: FlashParams, seq_k_padded: int, group: int, *refs):
    """One-pass backward (the TPU analog of the reference's fused kernel,
    flash_bwd_kernel.h:437-651): grid (b, h_k, group, q_block, kv_block),
    S/dP recomputed ONCE per block pair, all three grads emitted.

    dQ accumulates in its (bq, d) output block across the inner kv dim;
    dK/dV accumulate into full-sequence output blocks whose index map is
    constant across (group, q_block, kv_block), so they stay VMEM-resident
    for the whole nest and hit HBM once per (batch, kv_head) — GQA head
    summing included."""
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = (next(it) for _ in range(6))
    alibi_ref = next(it) if params.has_alibi else None
    arows_ref = next(it) if params.has_alibi_rows else None
    kv_lens_ref = next(it) if params.has_kv_lens else None
    qseg_ref = next(it) if params.has_segments else None
    kseg_ref = next(it) if params.has_segments else None
    qpos_ref = next(it) if params.has_positions else None
    kpos_ref = next(it) if params.has_positions else None
    seed_ref = next(it) if params.dropout_p > 0.0 else None
    dq_ref = next(it)  # (1, 1, bq, d)
    dk_ref = next(it)  # (1, 1, sk_pad, d) — resident across (ig, iq, ik)
    dv_ref = next(it)

    ib = pl.program_id(0)
    ihk = pl.program_id(1)
    ig = pl.program_id(2)
    iq = pl.program_id(3)
    ik = pl.program_id(4)
    nq = pl.num_programs(3)
    nk = pl.num_programs(4)
    h_all = pl.num_programs(1) * group
    ih = ihk * group + ig  # q-head index (dropout replay parity with fwd)
    bk = params.block_k

    @pl.when(ik == 0)
    def _init_dq():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(jnp.logical_and(ig == 0, jnp.logical_and(iq == 0, ik == 0)))
    def _init_dkv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    live = _block_live(params, ib, iq, ik, qpos_ref, kpos_ref, kv_lens_ref)

    @pl.when(live)
    def _body():
        qpos, kpos, kcol = _positions(params, iq, ik, qpos_ref, kpos_ref)
        p_dv, ds = _recompute_p_ds(
            params, seq_k_padded,
            q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0],
            lse_ref[0, 0], delta_ref[0, 0],
            qpos, kpos, kcol, alibi_ref, arows_ref, qseg_ref, kseg_ref,
            kv_lens_ref, seed_ref, ib, ih, iq, ik, nq, nk, h_all,
        )
        dq_ref[0, 0] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0, 0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        col = pl.multiple_of(ik * bk, bk)
        # dV += Pᵀ · dO ; dK += dSᵀ · Q into the resident full-seq buffers
        dv_ref[0, 0, pl.ds(col, bk), :] += jax.lax.dot_general(
            p_dv.astype(do_ref.dtype), do_ref[0, 0],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dk_ref[0, 0, pl.ds(col, bk), :] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, 0],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )


def _dq_kernel(params: FlashParams, seq_k_padded: int, grid_nq_nk, *refs):
    """Sparse mode (grid_nq_nk set): grid (b, h, live_pair) over a scalar-
    prefetched iq-major table of live (iq, ik) block pairs — dead causal/
    local pairs never become grid steps (same compression as flash_fwd)."""
    sparse = grid_nq_nk is not None
    it = iter(refs)
    if sparse:
        iq_tab = next(it)  # (n_live + 1,), sentinel -1 last
        ik_tab = next(it)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = (next(it) for _ in range(6))
    alibi_ref = next(it) if params.has_alibi else None
    arows_ref = next(it) if params.has_alibi_rows else None
    kv_lens_ref = next(it) if params.has_kv_lens else None
    qseg_ref = next(it) if params.has_segments else None
    kseg_ref = next(it) if params.has_segments else None
    qpos_ref = next(it) if params.has_positions else None
    kpos_ref = next(it) if params.has_positions else None
    seed_ref = next(it) if params.dropout_p > 0.0 else None
    dq_ref = next(it)

    ib, ih = pl.program_id(0), pl.program_id(1)
    h_all = pl.num_programs(1)
    if sparse:
        il = pl.program_id(2)
        iq, ik = iq_tab[il], ik_tab[il]
        nq, nk = grid_nq_nk
        first_of_row = jnp.logical_or(
            il == 0, iq_tab[jnp.maximum(il - 1, 0)] != iq
        )
    else:
        iq, ik = pl.program_id(2), pl.program_id(3)
        nq, nk = pl.num_programs(2), pl.num_programs(3)
        first_of_row = ik == 0

    @pl.when(first_of_row)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    live = _block_live(params, ib, iq, ik, qpos_ref, kpos_ref, kv_lens_ref)

    @pl.when(live)
    def _body():
        qpos, kpos, kcol = _positions(params, iq, ik, qpos_ref, kpos_ref)
        _, ds = _recompute_p_ds(
            params, seq_k_padded,
            q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0],
            lse_ref[0, 0], delta_ref[0, 0],
            qpos, kpos, kcol, alibi_ref, arows_ref, qseg_ref, kseg_ref,
            kv_lens_ref, seed_ref, ib, ih, iq, ik, nq, nk, h_all,
        )
        dq_ref[0, 0] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0, 0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )


def _dkv_kernel(params: FlashParams, seq_k_padded: int, group: int,
                grid_nq_nk, *refs):
    """Sparse mode (grid_nq_nk set): grid (b, kv_head, live_pair, group)
    over an ik-MAJOR table of live (iq, ik) pairs; dK/dV output blocks stay
    fixed for each ik-run, accumulating across (live iq, group)."""
    sparse = grid_nq_nk is not None
    it = iter(refs)
    if sparse:
        iq_tab = next(it)
        ik_tab = next(it)  # ik-major; sentinel -1 last
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = (next(it) for _ in range(6))
    alibi_ref = next(it) if params.has_alibi else None
    arows_ref = next(it) if params.has_alibi_rows else None
    kv_lens_ref = next(it) if params.has_kv_lens else None
    qseg_ref = next(it) if params.has_segments else None
    kseg_ref = next(it) if params.has_segments else None
    qpos_ref = next(it) if params.has_positions else None
    kpos_ref = next(it) if params.has_positions else None
    seed_ref = next(it) if params.dropout_p > 0.0 else None
    dk_ref = next(it)
    dv_ref = next(it)

    ib = pl.program_id(0)
    ihk = pl.program_id(1)
    h_all = pl.num_programs(1) * group
    if sparse:
        il = pl.program_id(2)
        ig = pl.program_id(3)
        iq, ik = iq_tab[il], ik_tab[il]
        nq, nk = grid_nq_nk
        first_of_col = jnp.logical_and(
            jnp.logical_or(il == 0, ik_tab[jnp.maximum(il - 1, 0)] != ik),
            ig == 0,
        )
    else:
        # grid: (b, kv_head, kv_block, group, q_block)
        ik = pl.program_id(2)
        ig = pl.program_id(3)
        iq = pl.program_id(4)
        nq = pl.num_programs(4)
        nk = pl.num_programs(2)
        first_of_col = jnp.logical_and(ig == 0, iq == 0)
    ih = ihk * group + ig  # q-head index, for dropout replay parity

    @pl.when(first_of_col)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    live = _block_live(params, ib, iq, ik, qpos_ref, kpos_ref, kv_lens_ref)

    @pl.when(live)
    def _body():
        qpos, kpos, kcol = _positions(params, iq, ik, qpos_ref, kpos_ref)
        p_dv, ds = _recompute_p_ds(
            params, seq_k_padded,
            q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0],
            lse_ref[0, 0], delta_ref[0, 0],
            qpos, kpos, kcol, alibi_ref, arows_ref, qseg_ref, kseg_ref,
            kv_lens_ref, seed_ref, ib, ih, iq, ik, nq, nk, h_all,
        )
        # dV += Pᵀ · dO ; dK += dSᵀ · Q   (flash_bwd_kernel.h:437-651)
        dv_ref[0, 0] += jax.lax.dot_general(
            p_dv.astype(do_ref.dtype), do_ref[0, 0],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dk_ref[0, 0] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, 0],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )


def flash_bwd(
    q: jax.Array,  # (b, h, sq, d)
    k: jax.Array,  # (b, h_k, sk, d)
    v: jax.Array,
    o: jax.Array,  # (b, h, sq, d)
    lse: jax.Array,  # (b, h, sq) fp32
    do: jax.Array,  # (b, h, sq, d)
    *,
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    alibi_row_slopes: Optional[jax.Array] = None,  # (b, h, sq) f32
    kv_lens: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    fused: Optional[bool] = None,  # None = two-pass (measured faster on v5e)
):
    """Returns (dq, dk, dv) in the input dtypes/shapes.

    Scheduling note (rounds 2-3, all measured/derived on v5e): the
    two-pass recompute (7 block-GEMMs) beats the reference-style fused
    one-pass (5 GEMMs, `fused=True`, kept for parity) by ~20% — resident
    accumulators stall Mosaic's pipeline. A third shape, staging dS (or
    P) to HBM between the passes, is rejected by arithmetic: the staged
    plane is the size of the live score set (4.3GB bf16 at the 8k bench
    shape), its write+read cannot hide on the already-loaded HBM pipe,
    and it saves at most one GEMM (CLAUDE.md round-3 note).
    """
    if interpret is None:
        interpret = default_interpret()
    in_dtypes = (q.dtype, k.dtype, v.dtype)
    if not interpret and q.dtype == jnp.float16:
        q, k, v, o, do = (x.astype(jnp.float32) for x in (q, k, v, o, do))
    b, h, sq, d = q.shape
    _, h_k, sk, _ = k.shape
    group = h // h_k
    scale = softmax_scale if softmax_scale is not None else 1.0 / math.sqrt(d)

    d_pad = max(next_multiple(d, 128), 128)
    # 512^2 tiles: bwd keeps ~6 live (bq,bk)-sized f32 tensors per step, so
    # the overhead-amortization sweet spot sits below the fwd kernel's 1024^2.
    # NB with dropout these MUST equal the fwd blocks (mask replay): the fwd
    # pins itself to the same canonical 512 when dropout_p > 0.
    bq = block_q or min(512, next_multiple(sq, 128))
    bk = block_k or min(512, next_multiple(sk, 128))
    if dropout_p > 0.0:
        bq = min(512, next_multiple(sq, 128))
        bk = min(512, next_multiple(sk, 128))
    bq = min(bq, next_multiple(sq, 128))
    bk = min(bk, next_multiple(sk, 128))
    sq_pad = next_multiple(sq, bq)
    sk_pad = next_multiple(sk, bk)

    # Δ = rowsum(dO ∘ O): the dot_do_o preprocess
    # (flash_bwd_preprocess_kernel.h:57-178) — a cheap fused elementwise
    # reduction XLA handles well without a dedicated kernel.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    dop = jnp.pad(do, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    lsep = jnp.pad(
        lse.astype(jnp.float32), ((0, 0), (0, 0), (0, sq_pad - sq)),
        constant_values=-jnp.inf,
    )[..., None]  # (b, h, sq_pad, 1): Mosaic block rule needs a unit lane dim
    deltap = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq)))[..., None]

    has_positions = q_positions is not None
    if has_positions:
        q_positions = jnp.pad(
            q_positions, ((0, 0), (0, sq_pad - sq)), constant_values=-(2**30)
        ).astype(jnp.int32)[:, :, None]
        kv_positions = jnp.pad(
            kv_positions, ((0, 0), (0, sk_pad - sk)), constant_values=2**30
        ).astype(jnp.int32)[:, None, :]
    has_segments = q_segment_ids is not None
    if has_segments:
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
            raise ValueError("alibi_slopes and alibi_row_slopes are exclusive")
        alibi_row_slopes = jnp.pad(
            jnp.asarray(alibi_row_slopes, jnp.float32),
            ((0, 0), (0, 0), (0, sq_pad - sq)),
        )[..., None]  # (b, h, sq_pad, 1)
    has_kv_lens = kv_lens is not None
    if has_kv_lens:
        kv_lens = kv_lens.astype(jnp.int32).reshape(b, 1)

    params = FlashParams(
        seq_q=sq, seq_k=sk, q_heads=h, kv_heads=h_k, scale=scale,
        causal=causal, window=tuple(window), softcap=softcap,
        has_alibi=has_alibi, has_alibi_rows=has_alibi_rows,
        has_segments=has_segments,
        has_positions=has_positions, has_kv_lens=has_kv_lens,
        dropout_p=dropout_p, block_q=bq, block_k=bk,
        interp_prng=bool(interpret),
    )

    def common_specs(hmap, qblk, kblk):
        """Input specs shared by both kernels; hmap maps grid -> q-head."""
        specs = [
            pl.BlockSpec((1, 1, bq, d_pad), lambda *i: (i[0], hmap(*i), qblk(*i), 0)),
            pl.BlockSpec(
                (1, 1, bk, d_pad),
                lambda *i: (i[0], hmap(*i) // group, kblk(*i), 0),
            ),
            pl.BlockSpec(
                (1, 1, bk, d_pad),
                lambda *i: (i[0], hmap(*i) // group, kblk(*i), 0),
            ),
            pl.BlockSpec((1, 1, bq, d_pad), lambda *i: (i[0], hmap(*i), qblk(*i), 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda *i: (i[0], hmap(*i), qblk(*i), 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda *i: (i[0], hmap(*i), qblk(*i), 0)),
        ]
        extra = []
        if has_alibi:
            # whole (b, h) array in SMEM, indexed in-kernel: a (1,1) block
            # over a (b, h) array violates Mosaic's block-shape rule
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            extra.append(alibi_slopes)
        if has_alibi_rows:
            specs.append(pl.BlockSpec(
                (1, 1, bq, 1),
                lambda *i: (i[0], hmap(*i), qblk(*i), 0),
            ))
            extra.append(alibi_row_slopes)
        if has_kv_lens:
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            extra.append(kv_lens)
        if has_segments:
            specs.append(pl.BlockSpec((1, bq, 1), lambda *i: (i[0], qblk(*i), 0)))
            extra.append(q_segment_ids)
            specs.append(pl.BlockSpec((1, 1, bk), lambda *i: (i[0], 0, kblk(*i))))
            extra.append(kv_segment_ids)
        if has_positions:
            specs.append(pl.BlockSpec((1, bq, 1), lambda *i: (i[0], qblk(*i), 0)))
            extra.append(q_positions)
            specs.append(pl.BlockSpec((1, 1, bk), lambda *i: (i[0], 0, kblk(*i))))
            extra.append(kv_positions)
        if dropout_p > 0.0:
            specs.append(pl.BlockSpec(
                (1, 1), lambda *i: (0, 0), memory_space=pltpu.SMEM))
            extra.append(jnp.asarray([[dropout_seed]], jnp.int32))
        return specs, extra

    base_inputs = [qp, kp, vp, dop, lsep, deltap]

    # live (iq, ik) block pairs for static masking geometry (same grid
    # compression as flash_fwd: dead causal/local pairs are never stepped)
    nq_, nk_ = sq_pad // bq, sk_pad // bk
    offset_ = sk - sq
    wl_, wr_ = params.window_resolved
    pairs = []
    for iq_ in range(nq_):
        q_hi_ = (iq_ + 1) * bq - 1 + offset_
        q_lo_ = iq_ * bq + offset_
        for ik_ in range(nk_):
            if ik_ * bk >= sk:
                continue
            if params.masks_cols_right and ik_ * bk > q_hi_ + wr_:
                continue
            if params.masks_cols_left and (ik_ + 1) * bk - 1 < q_lo_ - wl_:
                continue
            pairs.append((iq_, ik_))
    sparse = (
        not has_positions and not has_segments and len(pairs) < nq_ * nk_
    )

    # ---- fused one-pass kernel (opt-in; measured slower, see docstring) --
    if fused is None:
        fused = False
    fused = fused and 2 * sk_pad * d_pad * 4 <= 48 * 1024 * 1024
    if fused:
        specs, extra = common_specs(
            hmap=lambda ib, ihk, ig, iq, ik: ihk * group + ig,
            qblk=lambda ib, ihk, ig, iq, ik: iq,
            kblk=lambda ib, ihk, ig, iq, ik: ik,
        )
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, params, sk_pad, group),
            grid=(b, h_k, group, sq_pad // bq, sk_pad // bk),
            in_specs=specs,
            out_specs=[
                pl.BlockSpec(
                    (1, 1, bq, d_pad),
                    lambda ib, ihk, ig, iq, ik: (ib, ihk * group + ig, iq, 0),
                ),
                pl.BlockSpec(
                    (1, 1, sk_pad, d_pad),
                    lambda ib, ihk, ig, iq, ik: (ib, ihk, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, sk_pad, d_pad),
                    lambda ib, ihk, ig, iq, ik: (ib, ihk, 0, 0),
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), jnp.float32),
                jax.ShapeDtypeStruct((b, h_k, sk_pad, d_pad), jnp.float32),
                jax.ShapeDtypeStruct((b, h_k, sk_pad, d_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "arbitrary", "arbitrary",
                    "arbitrary",
                ),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*base_inputs, *extra)
        dq = dq[:, :, :sq, :d].astype(in_dtypes[0])
        dk = dk[:, :, :sk, :d].astype(in_dtypes[1])
        dv = dv[:, :, :sk, :d].astype(in_dtypes[2])
        return dq, dk, dv

    # ---- dQ pass: grid (b, h, iq, ik) or (b, h, live_pair) -------------
    if sparse:
        iq_tab = jnp.asarray([p_[0] for p_ in pairs] + [-1], jnp.int32)
        ik_tab = jnp.asarray([p_[1] for p_ in pairs] + [0], jnp.int32)
        specs, extra = common_specs(
            hmap=lambda ib, ih, il, iqt, ikt: ih,
            qblk=lambda ib, ih, il, iqt, ikt: iqt[il],
            kblk=lambda ib, ih, il, iqt, ikt: ikt[il],
        )
        dq = pl.pallas_call(
            functools.partial(_dq_kernel, params, sk_pad, (nq_, nk_)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, h, len(pairs)),
                in_specs=specs,
                out_specs=pl.BlockSpec(
                    (1, 1, bq, d_pad),
                    lambda ib, ih, il, iqt, ikt: (ib, ih, iqt[il], 0),
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(iq_tab, ik_tab, *base_inputs, *extra)
    else:
        specs, extra = common_specs(
            hmap=lambda ib, ih, iq, ik: ih,
            qblk=lambda ib, ih, iq, ik: iq,
            kblk=lambda ib, ih, iq, ik: ik,
        )
        dq = pl.pallas_call(
            functools.partial(_dq_kernel, params, sk_pad, None),
            grid=(b, h, sq_pad // bq, sk_pad // bk),
            in_specs=specs,
            out_specs=pl.BlockSpec(
                (1, 1, bq, d_pad), lambda ib, ih, iq, ik: (ib, ih, iq, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*base_inputs, *extra)

    # ---- dK/dV pass: grid (b, h_kv, ik, group, iq) or sparse ------------
    if sparse:
        pairs_k = sorted(pairs, key=lambda p_: (p_[1], p_[0]))  # ik-major
        iq_tab2 = jnp.asarray([p_[0] for p_ in pairs_k] + [-1], jnp.int32)
        ik_tab2 = jnp.asarray([p_[1] for p_ in pairs_k] + [-1], jnp.int32)
        specs, extra = common_specs(
            hmap=lambda ib, ihk, il, ig, iqt, ikt: ihk * group + ig,
            qblk=lambda ib, ihk, il, ig, iqt, ikt: iqt[il],
            kblk=lambda ib, ihk, il, ig, iqt, ikt: ikt[il],
        )
        dkv_spec = pl.BlockSpec(
            (1, 1, bk, d_pad),
            lambda ib, ihk, il, ig, iqt, ikt: (ib, ihk, ikt[il], 0),
        )
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_kernel, params, sk_pad, group, (nq_, nk_)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, h_k, len(pairs_k), group),
                in_specs=specs,
                out_specs=[dkv_spec, dkv_spec],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, h_k, sk_pad, d_pad), jnp.float32),
                jax.ShapeDtypeStruct((b, h_k, sk_pad, d_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "arbitrary", "arbitrary",
                ),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(iq_tab2, ik_tab2, *base_inputs, *extra)
    else:
        specs, extra = common_specs(
            hmap=lambda ib, ihk, ik, ig, iq: ihk * group + ig,
            qblk=lambda ib, ihk, ik, ig, iq: iq,
            kblk=lambda ib, ihk, ik, ig, iq: ik,
        )
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_kernel, params, sk_pad, group, None),
            grid=(b, h_k, sk_pad // bk, group, sq_pad // bq),
            in_specs=specs,
            out_specs=[
                pl.BlockSpec(
                    (1, 1, bk, d_pad), lambda ib, ihk, ik, ig, iq: (ib, ihk, ik, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bk, d_pad), lambda ib, ihk, ik, ig, iq: (ib, ihk, ik, 0)
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h_k, sk_pad, d_pad), jnp.float32),
                jax.ShapeDtypeStruct((b, h_k, sk_pad, d_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary", "arbitrary",
                ),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*base_inputs, *extra)

    dq = dq[:, :, :sq, :d].astype(in_dtypes[0])
    dk = dk[:, :, :sk, :d].astype(in_dtypes[1])
    dv = dv[:, :, :sk, :d].astype(in_dtypes[2])
    return dq, dk, dv
