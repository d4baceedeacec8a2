"""Headline benchmark: 8B-class paged decode with FP8 KV cache on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no perf numbers (BASELINE.md), so "vs_baseline" is
the achieved fraction of the HBM-bandwidth speed-of-light for this decode
step — the BASELINE.json north star is >=0.90. Decode attention is
bandwidth-bound: the step must read every live KV byte exactly once, so
  t_ideal = live_kv_bytes / HBM_BW,   vs_baseline = t_ideal / t_measured.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention
from xf_flash_attention_cutlass_tpu.quant import quantize_kv

# v5e HBM: ~819 GB/s
HBM_BYTES_PER_S = 819e9

# 8B-class attention shape (LlamaConfig.llama8b): 32 q heads, 8 KV heads,
# d=128, 32 layers; 64 concurrent decode requests, ~2k context, page 256.
B, H, H_K, D = 64, 32, 8, 128
PAGE, MAX_SEQ, N_LAYERS = 256, 2048, 32


def main():
    rng = np.random.default_rng(0)
    pages_per_seq = MAX_SEQ // PAGE
    num_pages = B * pages_per_seq + 16

    kp = jax.random.normal(
        jax.random.PRNGKey(0), (num_pages, H_K, PAGE, D), jnp.bfloat16
    )
    vp = jax.random.normal(
        jax.random.PRNGKey(1), (num_pages, H_K, PAGE, D), jnp.bfloat16
    )
    kq, ks = quantize_kv(kp, "fp8_e4m3")
    vq, vs = quantize_kv(vp, "fp8_e4m3")
    bt = jnp.asarray(
        rng.permutation(num_pages)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32,
    )
    # mixed-length requests, mean ~ MAX_SEQ*0.75
    kv_lens = jnp.asarray(
        rng.integers(MAX_SEQ // 2, MAX_SEQ + 1, (B,)), jnp.int32
    )
    q = jax.random.normal(jax.random.PRNGKey(2), (B, 1, H, D), jnp.bfloat16)

    def step(q, kq, ks, vq, vs, bt, kv_lens):
        o, _ = paged_attention(
            q, kq, vq, bt, kv_lens, causal=True, k_scales=ks, v_scales=vs
        )
        return o.astype(q.dtype)

    # Timing methodology for the axon tunnel: block_until_ready does NOT
    # synchronize device completion here (only a host fetch does), and a
    # single dispatch costs a wildly variable 0.2-0.7ms. So the step is
    # rolled into lax.scan INSIDE one executable (output feeds the next
    # query — a forced data dependency) and per-step time is the slope
    # between two scan lengths: zero per-step dispatch cost in the measure.
    from xf_flash_attention_cutlass_tpu.utils.profiling import paired_slope_scan

    # Round-4 estimator: median of >=9 back-to-back PAIRED slopes
    # (paired_slope_scan). Rounds 1-3 took min-of-3 independent estimates
    # on the claim "noise only reads slow"; the round-3 verdict showed
    # that claim is false for a SLOPE (a slow short scan + fast long scan
    # reads FAST, and min selects those tails — r3 captures spread
    # 0.928-0.998). The paired median cannot be flattered by the tails
    # and moves immediately on a real regression; min/median are both
    # reported so the spread stays visible.
    r = paired_slope_scan(step, q, kq, ks, vq, vs, bt, kv_lens)
    t_layer = max(r["median"], 1e-9)
    t_layer_min = max(r["min"], 1e-9)

    # bytes the step must move: live K+V values (1B fp8) + per-token scales
    live_tokens = int(np.sum(np.asarray(kv_lens)))
    # page granularity: whole pages are fetched
    live_pages = int(np.sum(np.ceil(np.asarray(kv_lens) / PAGE)))
    kv_bytes = 2 * live_pages * PAGE * H_K * D * 1  # fp8 values
    kv_bytes += 2 * live_pages * PAGE * H_K * 4  # fp32 scales
    t_ideal = kv_bytes / HBM_BYTES_PER_S
    vs_baseline = t_ideal / t_layer

    tokens_per_s = B / (N_LAYERS * t_layer)  # full-stack attention decode rate

    print(
        json.dumps(
            {
                "metric": "8B_paged_decode_fp8kv_tokens_per_s_per_chip",
                "value": round(tokens_per_s, 1),
                "unit": "tok/s attention-kernel bound, 64 reqs @ ~1.5k ctx"
                " (full-stack engine: see benchmarks/bench_suite.py)",
                "vs_baseline": round(vs_baseline, 4),
                "vs_baseline_best": round(t_ideal / t_layer_min, 4),
                "estimator": "median of 9 paired slopes (see "
                "utils/profiling.paired_slope_scan)",
            }
        )
    )


if __name__ == "__main__":
    main()
