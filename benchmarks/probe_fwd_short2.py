"""Dense flash-fwd short-seq DECOMPOSITION (round 4, verdict #1, part 2).

probe_fwd_short.py established that tile-size tuning cannot fix short-seq
(every smaller tile is slower; 1024^2 is already optimal at 2k). This probe
re-runs the round-3 MFU decomposition modes AT seq 2048/4096 to attribute
the remaining gap (repo 0.35 of MXU peak @2k vs 0.57 @8k on counted flops):

  structural  causal live-pair grid computes 3 tiles per (b,h) at 2k vs 2
              counted-work tiles (1.5x), 1.25x @4k, 1.125x @8k — divide
              the measured counted-flops rate by this to get the computed
              rate the pipeline actually sustains.
  dots        dots-only ceiling at this seq (r3 @8k: 0.71)
  kv0         dots with K/V pinned (zero per-step HBM fetch) — if kv0 ==
              dots, block DMA (incl. program-boundary warmup refetch) is
              not the short-seq tax either
  indep       two independent GEMMs (no dependency/cast)
  full        r3 kernel with full softmax (repo-equivalent math)
  nomax       softmax minus the row-max chain

All interleaved in one process; repo kernel first and last for drift.
Run on an IDLE chip+host:  python benchmarks/probe_fwd_short2.py
"""

import sys

sys.path.insert(0, "/root/repo")

import importlib.util

spec = importlib.util.spec_from_file_location(
    "probe_r3", "/root/repo/benchmarks/probe_fwd_mfu_r3.py"
)
probe_r3 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(probe_r3)

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
from xf_flash_attention_cutlass_tpu.utils.profiling import (
    RooflineReport, attention_flops, detect_chip, timed_scan,
)

CHIP = detect_chip()
B, H, D = 2, 32, 128


def main():
    for seq in (2048, 4096):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, seq, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, H, seq, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, H, seq, D), jnp.bfloat16)
        flops = attention_flops(B, seq, seq, H, D, causal=True)
        nq = seq // 1024
        computed_x = (nq * (nq + 1) / 2) / (nq * nq / 2)  # live/counted tiles

        def repo_step(x, k, v):
            return flash_fwd(x, k, v, causal=True)[0].astype(x.dtype)

        def show(name, t, fl=flops):
            rep = RooflineReport(seconds=t, flops=fl, chip=CHIP)
            comp = rep.compute_fraction * computed_x
            print(
                f"seq={seq} {name:8s} {t*1e6:7.0f}us {rep.tflops:6.1f} TF/s"
                f"  counted {rep.compute_fraction:.2f}  computed {comp:.2f}",
                flush=True,
            )

        show("repo", timed_scan(repo_step, q, k, v))
        for mode in ("dots", "kv0", "indep", "full", "nomax"):
            run, npairs = probe_r3.make(seq, B, H, D, mode)

            def step(x, k, v, run=run):
                return jnp.clip(run(x, k, v).astype(jnp.bfloat16), -3.0, 3.0)

            show(mode, timed_scan(step, q, k, v))
        show("repo2", timed_scan(repo_step, q, k, v))
        print(flush=True)


if __name__ == "__main__":
    main()
