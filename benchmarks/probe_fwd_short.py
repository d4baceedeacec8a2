"""Dense flash-fwd SHORT-SEQUENCE probe (round 4, verdict #1).

Round-3 probes root-caused the 8k ceiling (0.71 of MXU peak, per-GEMM
pipeline rate) but every probe ran at seq 8192; bench_suite reads
0.34 @2k / 0.47 @4k. Candidate explanations, each measured here at
seq 2048/4096 (b=2 h=32 d=128 causal bf16, interleaved in ONE process):

  tiles    the pinned 1024^2 score tiles: at nq=nk=2 the causal live-pair
           grid computes 3 tiles against 2 counted-work tiles (>=33%
           structural diagonal waste vs 11% at 8k). Sweep block_q x
           block_k — the reference itself picks smaller tiles at short
           seq (flash_fwd_launch_template.h:287-291: 64x32 below 4k).
  scale    the out-of-kernel q *= softmax_scale fold is O(b*h*sq*d)
           HBM traffic per call — amortized at 8k, maybe not at 2k.
           Timed alone.
  steps    fixed per-call costs scale as 1/work: the same sweep at 4k
           and an 8k sanity row separate per-call from per-step waste.

Run on an IDLE chip+host:  python benchmarks/probe_fwd_short.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
from xf_flash_attention_cutlass_tpu.utils.profiling import (
    RooflineReport, attention_flops, detect_chip, timed_scan,
)

CHIP = detect_chip()
B, H, D = 2, 32, 128


def bench(seq, bq, bk, tag=""):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, seq, D), jnp.bfloat16)

    def step(x, k, v):
        o, _ = flash_fwd(x, k, v, causal=True, block_q=bq, block_k=bk)
        return o.astype(x.dtype)

    t = timed_scan(step, q, q, q)
    rep = RooflineReport(
        seconds=t,
        flops=attention_flops(B, seq, seq, H, D, causal=True),
        chip=CHIP,
    )
    # fraction of the measured 0.71 platform ceiling for this shape class
    vs_ceiling = rep.tflops / (0.71 * CHIP.bf16_tflops)
    print(
        f"seq={seq:5d} bq={bq:4d} bk={bk:4d} {tag:10s} "
        f"{t*1e6:7.0f}us  {rep.tflops:6.1f} TF/s  "
        f"mxu {rep.compute_fraction:.2f}  vs71 {vs_ceiling:.2f}",
        flush=True,
    )
    return rep.tflops


def bench_scale_fold(seq):
    """Cost of the out-of-kernel q*scale fold alone."""
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, seq, D), jnp.bfloat16)

    def step(x):
        return (x.astype(jnp.float32) * 0.088388).astype(jnp.bfloat16)

    t = timed_scan(step, q)
    print(f"seq={seq:5d} scale-fold alone: {t*1e6:7.1f}us", flush=True)


def main():
    for seq in (2048, 4096):
        bench_scale_fold(seq)
        bench(seq, 1024, 1024, "baseline")
        bench(seq, 512, 512)
        bench(seq, 256, 256)
        bench(seq, 512, 1024)
        bench(seq, 1024, 512)
        bench(seq, 256, 1024)
        bench(seq, 256, 512)
        bench(seq, 128, 512)
        bench(seq, 1024, 1024, "drift-chk")
    bench(8192, 1024, 1024, "8k-sanity")


if __name__ == "__main__":
    main()
