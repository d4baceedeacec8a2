"""Dense flash-fwd MFU decomposition probes, round 3 (v5e, causal bf16,
b=2 h=32 d=128 seq=8k, 1024^2 tiles — the bench_suite shape).

Round-2 facts: dots-only ceiling 0.71 of MXU peak at ANY tile size; full
softmax adds ~0.8us/step -> repo kernel 0.57. This probe decomposes BOTH
gaps:

ceiling (0.71) decomposition:
  indep    two INDEPENDENT (bq,d)x(bk,d)->(bq,bk) GEMMs per step, same MAC
           count as QK+PV, no S->PV dependency, no f32->bf16 cast of a
           (bq,bk) plane. If indep >> dots, the ceiling is the dependent
           chain + cast, not the MXU issue rate.
  dots     r2's dots-only: s = q@k; acc += cast_bf16(s) @ v  (dep + cast)
  dotsplit dots with the PV split into two bk/2 halves so the cast of half
           2 can overlap the PV GEMM of half 1.

softmax (0.57 vs 0.71) decomposition (all wrong-numerics, perf-only):
  nomax    m_new = m_prev (kills the row-max reduce + corr chain)
  nosum    no l update (kills the row-sum reduce)
  norescale acc += p@v without the corr RMW multiply
  lazy     rescale under pl.when(any row max changed) — VERDICT hypothesis;
           expected to always trigger on random data (P(new max in 1024
           rows) ~ 1), measured to confirm
  accout   acc lives in o_ref (f32 output) instead of scratch — VERDICT's
           accumulator-in-output hypothesis

Run on an IDLE chip+host:  python benchmarks/probe_fwd_mfu_r3.py
"""

import functools
import math
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
from xf_flash_attention_cutlass_tpu.utils.profiling import (
    RooflineReport, attention_flops, detect_chip, timed_scan,
)

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
CHIP = detect_chip()
BQ = BK = 1024


def _kernel(mode, bq, bk, *refs):
    it = iter(refs)
    iq_tab = next(it)
    ik_tab = next(it)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    o_ref = next(it)
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)
    s2_scr = next(it)  # (bq, bk) f32, only used by mode == "indep"

    il = pl.program_id(2)
    iq = iq_tab[il]
    ik = ik_tab[il]
    first_of_row = jnp.logical_or(il == 0, iq_tab[jnp.maximum(il - 1, 0)] != iq)
    last_of_row = iq_tab[il + 1] != iq
    acc = o_ref if mode == "accout" else acc_scr

    @pl.when(first_of_row)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        if mode == "accout":
            o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        else:
            acc_scr[...] = jnp.zeros_like(acc_scr)

    q_lo = iq * bq
    interior = (ik + 1) * bk - 1 <= q_lo
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)

    def _store_acc(val):
        if mode == "accout":
            acc[0, 0] = val
        else:
            acc[...] = val

    def _load_acc():
        return acc[0, 0] if mode == "accout" else acc[...]

    def _body(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if mode == "qk_only":
            # one shallow-contraction GEMM (M=bq, N=bk, K=d): count flops/2
            s1 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s2_scr[...] = s2_scr[...] + s1
            return
        if mode == "pv_only":
            # one deep-contraction GEMM (M=bq, N=d, K=bk): count flops/2
            p = (q_lo * 0 + 1).astype(jnp.bfloat16) * jnp.full(
                (bq, bk), 0.001, jnp.bfloat16
            )
            acc_scr[...] = acc_scr[...] + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return
        if mode == "kv0":
            # dots with K/V pinned to block 0 (no per-step HBM fetch):
            # isolates the block-DMA share of the per-step overhead
            _store_acc(_load_acc() + jax.lax.dot_general(
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16),
                v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            return
        if mode == "indep":
            # two independent d-contractions, same MACs as QK + PV
            s1 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s2 = jax.lax.dot_general(
                q, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s2_scr[...] = s2_scr[...] + s1 + s2
            return
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            keep = (ik * bk + col) <= (q_lo + row)
            s = jnp.where(keep, s, NEG_INF)
        if mode == "dots":
            _store_acc(_load_acc() + jax.lax.dot_general(
                s.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            return
        if mode == "dotsplit":
            h = bk // 2
            out = _load_acc()
            for j in range(2):
                out = out + jax.lax.dot_general(
                    s[:, j * h:(j + 1) * h].astype(jnp.bfloat16),
                    v[j * h:(j + 1) * h],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            _store_acc(out)
            return

        m_prev = m_scr[...]
        if mode == "nomax":
            m_new = m_prev
            p = jnp.exp((s * 0.001).astype(jnp.bfloat16))  # bounded, no max
            corr = None
        else:
            if mode == "treemax":
                # explicit halving tree: full-width VPU maxes on
                # lane-aligned halves, then one 128-lane reduce
                t = jnp.maximum(s[:, :512], s[:, 512:])
                t = jnp.maximum(t[:, :256], t[:, 256:])
                t = jnp.maximum(t[:, :128], t[:, 128:])
                m_cur = jnp.max(t, axis=1, keepdims=True)
            elif mode == "treemax16":
                # tree at bf16 rate: m only needs to be a consistent
                # near-max (round-down <= 0.4% is numerically safe)
                sb = s.astype(jnp.bfloat16)
                t = jnp.maximum(sb[:, :512], sb[:, 512:])
                t = jnp.maximum(t[:, :256], t[:, 256:])
                t = jnp.maximum(t[:, :128], t[:, 128:])
                m_cur = jnp.max(t, axis=1, keepdims=True).astype(jnp.float32)
            else:
                m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp((s - m_new).astype(jnp.bfloat16))
            corr = jnp.exp(m_prev - m_new)

        if mode == "lazy":
            changed = jnp.any(m_cur > m_prev)

            @pl.when(changed)
            def _rescale():
                l_scr[...] = l_scr[...] * corr + jnp.sum(
                    p, axis=1, keepdims=True, dtype=jnp.float32
                )
                _store_acc(_load_acc() * corr + jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
                m_scr[...] = m_new

            @pl.when(jnp.logical_not(changed))
            def _cheap():
                l_scr[...] = l_scr[...] + jnp.sum(
                    p, axis=1, keepdims=True, dtype=jnp.float32
                )
                _store_acc(_load_acc() + jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            return

        if mode != "nosum":
            lsum = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
            l_scr[...] = (l_scr[...] * corr + lsum) if corr is not None else (
                l_scr[...] + lsum
            )
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mode == "norescale" or corr is None:
            _store_acc(_load_acc() + pv)
        else:
            _store_acc(_load_acc() * corr + pv)
        if mode != "nomax":
            m_scr[...] = m_new

    @pl.when(interior)
    def _clean():
        _body(False)

    @pl.when(jnp.logical_not(interior))
    def _masked():
        _body(True)

    @pl.when(last_of_row)
    def _epi():
        if mode in ("indep", "qk_only"):
            o_ref[0, 0] = s2_scr[:, : o_ref.shape[-1]].astype(o_ref.dtype)
            return
        if mode in ("dots", "dotsplit", "pv_only", "kv0"):
            o_ref[0, 0] = _load_acc().astype(o_ref.dtype)
            return
        l = l_scr[...]
        safe = jnp.where(l <= 0.0, 1.0, l)
        if mode == "accout":
            o_ref[0, 0] = (o_ref[0, 0] / safe).astype(o_ref.dtype)
        else:
            o_ref[0, 0] = (acc_scr[...] / safe).astype(o_ref.dtype)


def _kernel_t(bq, bk, *refs):
    """Transposed-S layout: S^T = k @ q^T is (bk, bq), so the online-softmax
    row stats become SUBLANE-direction reduces (a tree of full-width VPU
    maxes/adds) instead of lane-direction shuffle chains; stats are (1, bq)
    lane-major, acc is (d, bq), and ONE transpose per row-block in the
    epilogue restores (bq, d)."""
    it = iter(refs)
    iq_tab = next(it)
    ik_tab = next(it)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    o_ref = next(it)
    m_scr = next(it)  # (8, bq) f32 — row 0 live, sublane-padded
    l_scr = next(it)
    acc_scr = next(it)  # (d, bq) f32
    _ = next(it)

    il = pl.program_id(2)
    iq = iq_tab[il]
    ik = ik_tab[il]
    first_of_row = jnp.logical_or(il == 0, iq_tab[jnp.maximum(il - 1, 0)] != iq)
    last_of_row = iq_tab[il + 1] != iq

    @pl.when(first_of_row)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_lo = iq * bq
    interior = (ik + 1) * bk - 1 <= q_lo
    rowt = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 0)  # key index
    colt = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 1)  # query index

    def _body(masked):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bk, bq)
        if masked:
            keep = (ik * bk + rowt) <= (q_lo + colt)
            st = jnp.where(keep, st, NEG_INF)
        m_prev = m_scr[0:1, :]  # (1, bq)
        m_new = jnp.maximum(m_prev, jnp.max(st, axis=0, keepdims=True))
        p = jnp.exp((st - m_new).astype(jnp.bfloat16))  # (bk, bq)
        corr = jnp.exp(m_prev - m_new)  # (1, bq)
        l_scr[0:1, :] = l_scr[0:1, :] * corr + jnp.sum(
            p, axis=0, keepdims=True, dtype=jnp.float32
        )
        # acc^T (d, bq) += v^T (d, bk) @ p (bk, bq)
        acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
            v, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[0:1, :] = m_new

    @pl.when(interior)
    def _clean():
        _body(False)

    @pl.when(jnp.logical_not(interior))
    def _masked():
        _body(True)

    @pl.when(last_of_row)
    def _epi():
        l = l_scr[0:1, :]
        safe = jnp.where(l <= 0.0, 1.0, l)
        o_t = acc_scr[...] / safe  # (d, bq)
        o_ref[0, 0] = o_t.T.astype(o_ref.dtype)  # one transpose per row-block


def _kernel_inner(do_softmax, bq, bk, d, nk, *refs):
    """Paged-kernel architecture for dense fwd: ONE grid step per
    (b, h, q-block); the KV axis is an inner fori_loop with manual 2-slot
    double-buffered DMA from ANY/HBM. Amortizes the measured ~0.65us
    grid-step overhead over the whole row (4.5x fewer steps at 8k causal)."""
    it = iter(refs)
    q_ref = next(it)  # (1, 1, bq, d) VMEM
    k_hbm = next(it)  # (b, h, seq, d) ANY
    v_hbm = next(it)
    o_ref = next(it)
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)
    k_buf = next(it)  # (2, bk, d)
    v_buf = next(it)
    sems = next(it)  # (2, 2)

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    n_ik = iq + 1  # causal, bq == bk

    def dma(ik, slot):
        start = pl.multiple_of(ik * bk, bk)
        return (
            pltpu.make_async_copy(
                k_hbm.at[ib, ih, pl.ds(start, bk), :],
                k_buf.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[ib, ih, pl.ds(start, bk), :],
                v_buf.at[slot], sems.at[slot, 1],
            ),
        )

    for c in dma(0, 0):
        c.start()

    m_scr[...] = jnp.full_like(m_scr, -1e30)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    q_lo = iq * bq
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    q = q_ref[0, 0]

    def body(ik, _):
        slot = ik % 2

        @pl.when(ik + 1 < n_ik)
        def _pref():
            for c in dma(ik + 1, (ik + 1) % 2):
                c.start()

        for c in dma(ik, slot):
            c.wait()
        k = k_buf[slot]
        v = v_buf[slot]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        is_diag = ik == iq  # only the diagonal block needs the causal mask

        if not do_softmax:
            s = jnp.where(
                jnp.logical_or(ik < iq, (ik * bk + col) <= (q_lo + row)),
                s, 0.0,
            )
            acc_scr[...] = acc_scr[...] + jax.lax.dot_general(
                s.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        s = jnp.where(
            jnp.logical_or(ik < iq, (ik * bk + col) <= (q_lo + row)),
            s, NEG_INF,
        )
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        corr = jnp.exp(m_prev - m_new)
        l_scr[...] = l_scr[...] * corr + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[...] = m_new
        return 0

    jax.lax.fori_loop(0, n_ik, body, 0)

    if do_softmax:
        l = l_scr[...]
        safe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / safe).astype(o_ref.dtype)
    else:
        o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)


def make_inner(seq, b, h, d, do_softmax):
    bq = bk = BQ
    nq, nk = seq // bq, seq // bk

    def run(q, k, v):
        qs = (q.astype(jnp.float32) / math.sqrt(d)).astype(q.dtype)
        o = pl.pallas_call(
            functools.partial(_kernel_inner, do_softmax, bq, bk, d, nk),
            grid=(b, h, nq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d),
                             lambda ib, ih, iq: (ib, ih, iq, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d),
                                   lambda ib, ih, iq: (ib, ih, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((2, bk, d), jnp.bfloat16),
                pltpu.VMEM((2, bk, d), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            out_shape=jax.ShapeDtypeStruct((b, h, seq, d), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qs, k, v)
        return o

    return run, nq


def make(seq, b, h, d, mode):
    bq, bk = BQ, BK
    nq, nk = seq // bq, seq // bk
    pairs = [(iq, ik) for iq in range(nq) for ik in range(nk)
             if ik * bk <= (iq + 1) * bq - 1]
    iq_tab = jnp.asarray([p[0] for p in pairs] + [-1], jnp.int32)
    ik_tab = jnp.asarray([p[1] for p in pairs] + [0], jnp.int32)

    def smap(f):
        return lambda ib, ih, il, iqt, ikt: f(ib, ih, iqt[il], ikt[il])

    out_dtype = jnp.float32 if mode == "accout" else jnp.bfloat16
    if mode == "tposed":
        scratch = [
            pltpu.VMEM((8, bq), jnp.float32),
            pltpu.VMEM((8, bq), jnp.float32),
            pltpu.VMEM((d, bq), jnp.float32),
            pltpu.VMEM((8, 8), jnp.float32),
        ]
    else:
        scratch = [
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, bk if mode in ("indep", "qk_only") else 8),
                       jnp.float32),
        ]

    kern = (functools.partial(_kernel_t, bq, bk) if mode == "tposed"
            else functools.partial(_kernel, mode, bq, bk))

    def run(q, k, v):
        qs = (q.astype(jnp.float32) / math.sqrt(d)).astype(q.dtype)
        o = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, h, len(pairs)),
                in_specs=[
                    pl.BlockSpec((1, 1, bq, d),
                                 smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0))),
                    pl.BlockSpec((1, 1, bk, d),
                                 smap(lambda ib, ih, iq, ik: (ib, ih, 0, 0))
                                 if mode == "kv0" else
                                 smap(lambda ib, ih, iq, ik: (ib, ih, ik, 0))),
                    pl.BlockSpec((1, 1, bk, d),
                                 smap(lambda ib, ih, iq, ik: (ib, ih, 0, 0))
                                 if mode == "kv0" else
                                 smap(lambda ib, ih, iq, ik: (ib, ih, ik, 0))),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, bq, d), smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0))
                ),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((b, h, seq, d), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(iq_tab, ik_tab, qs, k, v)
        return o

    return run, len(pairs)


def main():
    b, h, d, seq = 2, 32, 128, 8192
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, seq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, seq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, seq, d), jnp.bfloat16)
    flops = attention_flops(b, seq, seq, h, d, causal=True)

    def bench(name, mode, flop_scale=1.0):
        run, npairs = make(seq, b, h, d, mode)

        def step(x, k, v):
            y = run(x, k, v).astype(jnp.bfloat16)
            # keep magnitudes bounded across chained iterations
            return jnp.clip(y, -3.0, 3.0)

        t = timed_scan(step, q, k, v)
        rep = RooflineReport(seconds=t, flops=flops * flop_scale, chip=CHIP)
        print(f"{name:10s} (pairs={npairs}): {rep.line('')}", flush=True)
        return rep.tflops

    def repo_step(x, k, v):
        return flash_fwd(x, k, v, causal=True)[0].astype(x.dtype)

    t = timed_scan(repo_step, q, k, v)
    print(RooflineReport(seconds=t, flops=flops, chip=CHIP).line("repo"), flush=True)

    # tposed is exact math: check numerics against the repo kernel first
    run_t, _ = make(seq, b, h, d, "tposed")
    o_ref = jax.jit(lambda q, k, v: flash_fwd(q, k, v, causal=True)[0])(q, k, v)
    o_t = jax.jit(run_t)(q, k, v)
    print("tposed max|dO| =", float(jnp.max(jnp.abs(
        o_t.astype(jnp.float32) - o_ref.astype(jnp.float32)))), flush=True)

    # inner-loop (paged-style) structure: correctness then perf
    run_if, _ = make_inner(seq, b, h, d, True)
    o_if = jax.jit(run_if)(q, k, v)
    print("innerfull max|dO| =", float(jnp.max(jnp.abs(
        o_if.astype(jnp.float32) - o_ref.astype(jnp.float32)))), flush=True)

    def bench_inner(name, do_softmax):
        run, _ = make_inner(seq, b, h, d, do_softmax)

        def step(x, k, v):
            return jnp.clip(run(x, k, v).astype(jnp.bfloat16), -3.0, 3.0)

        t = timed_scan(step, q, k, v)
        rep = RooflineReport(seconds=t, flops=flops, chip=CHIP)
        print(f"{name:10s}: {rep.line('')}", flush=True)

    # treemax is exact: check numerics
    run_tm, _ = make(seq, b, h, d, "treemax")
    o_tm = jax.jit(run_tm)(q, k, v)
    print("treemax max|dO| =", float(jnp.max(jnp.abs(
        o_tm.astype(jnp.float32) - o_ref.astype(jnp.float32)))), flush=True)
    run_tm2, _ = make(seq, b, h, d, "treemax16")
    o_tm2 = jax.jit(run_tm2)(q, k, v)
    print("treemax16 max|dO| =", float(jnp.max(jnp.abs(
        o_tm2.astype(jnp.float32) - o_ref.astype(jnp.float32)))), flush=True)
    for rep_i in range(2):
        bench("full", "full")
        bench("treemax", "treemax")
        bench("treemax16", "treemax16")

    t = timed_scan(repo_step, q, k, v)
    print(RooflineReport(seconds=t, flops=flops, chip=CHIP).line("repo(again)"),
          flush=True)


if __name__ == "__main__":
    main()
