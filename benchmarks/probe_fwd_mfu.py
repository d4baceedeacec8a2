"""Dense flash-fwd MFU probes (v5e, causal bf16, the bench_suite shape).

Hypothesis from cycle accounting: at 1024^2 score tiles the per-step MXU work
is ~2.4us but measured steps are ~4.6us — the VPU softmax chain (row-max
butterfly, row-sum butterfly, plane ops) serializes with the MXU. Variants:

  base1     current algorithm re-specialized (sanity vs repo kernel)
  dots1     matmuls + mask only (no softmax) — MXU ceiling
  lsum      row-sum via MXU (p @ ones -> replicated (bq,128) l) instead of
            the cross-lane butterfly reduce
  exp2      log2-domain softmax: log2(e) folded into the q prescale,
            p = exp2(s2 - m2), lse = m2*ln2 + log(l)
  chainN    N independent online-softmax column chains per grid step
            (separate m/l/acc scratch per chain, merged in the epilogue) so
            one chain's VPU work can overlap another's MXU work. Column
            split => no lane-1 strided slices (the row-split failure mode).

Run on an IDLE chip+host:  python benchmarks/probe_fwd_mfu.py
"""

import functools
import math
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
from xf_flash_attention_cutlass_tpu.utils.profiling import (
    RooflineReport, attention_flops, detect_chip, timed_scan,
)

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)
CHIP = detect_chip()


def _kernel(nchains, bq, bk, mxu_lsum, use_exp2, dots_only, *refs):
    it = iter(refs)
    iq_tab = next(it)
    ik_tab = next(it)
    q_ref = next(it)
    k_refs = [next(it) for _ in range(nchains)]
    v_refs = [next(it) for _ in range(nchains)]
    o_ref = next(it)
    lse_ref = next(it)
    m_scr = [next(it) for _ in range(nchains)]
    l_scr = [next(it) for _ in range(nchains)]
    acc_scr = [next(it) for _ in range(nchains)]

    il = pl.program_id(2)
    iq = iq_tab[il]
    ik = ik_tab[il]  # outer column block (width nchains*bk)
    first_of_row = jnp.logical_or(il == 0, iq_tab[jnp.maximum(il - 1, 0)] != iq)
    last_of_row = iq_tab[il + 1] != iq

    expf = jnp.exp2 if use_exp2 else jnp.exp

    @pl.when(first_of_row)
    def _init():
        for j in range(nchains):
            m_scr[j][...] = jnp.full_like(m_scr[j], -1e30)
            l_scr[j][...] = jnp.zeros_like(l_scr[j])
            acc_scr[j][...] = jnp.zeros_like(acc_scr[j])

    q_lo = iq * bq
    q_hi = (iq + 1) * bq - 1
    # whole outer block strictly below the diagonal => no masking anywhere
    interior = (ik * nchains + nchains) * bk - 1 <= q_lo

    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)

    def _body(masked):
        q = q_ref[0, 0]
        ss = [
            jax.lax.dot_general(
                q, k_refs[j][0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for j in range(nchains)
        ]
        if masked:
            for j in range(nchains):
                kcol = (ik * nchains + j) * bk + col
                keep = kcol <= q_lo + row  # causal
                ss[j] = jnp.where(keep, ss[j], NEG_INF)
        if dots_only:
            for j in range(nchains):
                acc_scr[j][...] = acc_scr[j][...] + jax.lax.dot_general(
                    ss[j].astype(jnp.bfloat16), v_refs[j][0, 0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return
        for j in range(nchains):
            m_prev = m_scr[j][...]
            m_new = jnp.maximum(m_prev, jnp.max(ss[j], axis=1, keepdims=True))
            p = expf((ss[j] - m_new).astype(jnp.bfloat16))
            corr = expf(m_prev - m_new)
            if mxu_lsum:
                ones = jnp.ones((bk, 128), jnp.bfloat16)
                lsum = jax.lax.dot_general(
                    p, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                l_scr[j][...] = l_scr[j][...] * corr + lsum
            else:
                l_scr[j][...] = l_scr[j][...] * corr + jnp.sum(
                    p, axis=1, keepdims=True, dtype=jnp.float32
                )
            acc_scr[j][...] = acc_scr[j][...] * corr + jax.lax.dot_general(
                p, v_refs[j][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[j][...] = m_new

    @pl.when(interior)
    def _clean():
        _body(False)

    @pl.when(jnp.logical_not(interior))
    def _masked():
        _body(True)

    @pl.when(last_of_row)
    def _epi():
        if dots_only:
            o = acc_scr[0][...]
            for j in range(1, nchains):
                o = o + acc_scr[j][...]
            o_ref[0, 0] = o.astype(o_ref.dtype)
            lse_ref[0, 0] = jnp.zeros_like(lse_ref[0, 0])
            return
        m = m_scr[0][...]
        for j in range(1, nchains):
            m = jnp.maximum(m, m_scr[j][...])
        l = jnp.zeros_like(m)
        o = jnp.zeros_like(acc_scr[0][...])
        for j in range(nchains):
            w = expf(m_scr[j][...] - m)
            lj = l_scr[j][...]
            if mxu_lsum:
                lj = jnp.max(lj, axis=1, keepdims=True)  # replicated lanes
            l = l + lj * w
            o = o + acc_scr[j][...] * w
        o_ref[0, 0] = (o / l).astype(o_ref.dtype)
        scale_m = LN2 if use_exp2 else 1.0
        lse_ref[0, 0] = m * scale_m + jnp.log(l)


def make_probe(seq, b, h, d, *, nchains=1, mxu_lsum=False, use_exp2=False,
               dots_only=False, bq=1024, bk=1024):
    nq, nk = seq // bq, seq // bk
    nko = (nk + nchains - 1) // nchains
    pairs = []
    for iq in range(nq):
        q_hi = (iq + 1) * bq - 1
        for iko in range(nko):
            if iko * nchains * bk <= q_hi:
                pairs.append((iq, iko))
    iq_tab = jnp.asarray([p[0] for p in pairs] + [-1], jnp.int32)
    ik_tab = jnp.asarray([p[1] for p in pairs] + [0], jnp.int32)

    def smap(f):
        return lambda il_b, il_h, il, iqt, ikt: f(il_b, il_h, iqt[il], ikt[il])

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0)))
    ]
    for j in range(nchains):
        in_specs.append(pl.BlockSpec(
            (1, 1, bk, d),
            smap(lambda ib, ih, iq, ik, j=j: (
                ib, ih, jnp.minimum(ik * nchains + j, nk - 1), 0)),
        ))
    for j in range(nchains):
        in_specs.append(pl.BlockSpec(
            (1, 1, bk, d),
            smap(lambda ib, ih, iq, ik, j=j: (
                ib, ih, jnp.minimum(ik * nchains + j, nk - 1), 0)),
        ))
    out_specs = [
        pl.BlockSpec((1, 1, bq, d), smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0))),
        pl.BlockSpec((1, 1, bq, 1), smap(lambda ib, ih, iq, ik: (ib, ih, iq, 0))),
    ]
    scratch = (
        [pltpu.VMEM((bq, 1), jnp.float32) for _ in range(nchains)]
        + [pltpu.VMEM((bq, 128 if mxu_lsum else 1), jnp.float32)
           for _ in range(nchains)]
        + [pltpu.VMEM((bq, d), jnp.float32) for _ in range(nchains)]
    )
    kern = functools.partial(
        _kernel, nchains, bq, bk, mxu_lsum, use_exp2, dots_only
    )
    scale = (1.0 / math.sqrt(d)) * (LOG2E if use_exp2 else 1.0)

    def run(q, k, v):
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        o, lse = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, h, len(pairs)),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, h, seq, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, seq, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(iq_tab, ik_tab, qs, *([k] * nchains), *([v] * nchains))
        return o, lse[..., 0]

    return run, len(pairs)


def main():
    b, h, d, seq = 2, 32, 128, 8192
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, seq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, seq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, seq, d), jnp.bfloat16)
    flops = attention_flops(b, seq, seq, h, d, causal=True)

    o_ref, lse_ref = jax.jit(lambda q, k, v: flash_fwd(q, k, v, causal=True))(q, k, v)

    variants = {
        "base1": dict(),
        "dots1": dict(dots_only=True),
        "lsum1": dict(mxu_lsum=True),
        "exp2_1": dict(use_exp2=True),
        "lsum_exp2_1": dict(mxu_lsum=True, use_exp2=True),
        "chain2": dict(nchains=2),
        "chain2_lsum_exp2": dict(nchains=2, mxu_lsum=True, use_exp2=True),
        "dots2": dict(nchains=2, dots_only=True),
        "chain4_lsum_exp2": dict(nchains=4, mxu_lsum=True, use_exp2=True),
    }

    # correctness first (skip dots_only)
    for name, kw in variants.items():
        if kw.get("dots_only"):
            continue
        run, _ = make_probe(seq, b, h, d, **kw)
        o, lse = jax.jit(run)(q, k, v)
        do = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref.astype(jnp.float32))))
        dl = float(jnp.max(jnp.abs(lse - lse_ref)))
        print(f"{name}: max|dO|={do:.4f} max|dLSE|={dl:.5f}", flush=True)

    def bench(name, kw):
        run, npairs = make_probe(seq, b, h, d, **kw)

        def step(x, k, v):
            return run(x, k, v)[0].astype(x.dtype)

        t = timed_scan(step, q, k, v)
        rep = RooflineReport(seconds=t, flops=flops, chip=CHIP)
        print(f"{name} (pairs={npairs}): {rep.line('')}", flush=True)
        return rep.tflops

    # repo kernel baseline
    def repo_step(x, k, v):
        return flash_fwd(x, k, v, causal=True)[0].astype(x.dtype)

    t = timed_scan(repo_step, q, k, v)
    print(RooflineReport(seconds=t, flops=flops, chip=CHIP).line("repo"), flush=True)

    results = {}
    for name, kw in variants.items():
        results[name] = bench(name, kw)
    # drift check: repo again
    t = timed_scan(repo_step, q, k, v)
    print(RooflineReport(seconds=t, flops=flops, chip=CHIP).line("repo(again)"), flush=True)


if __name__ == "__main__":
    main()
