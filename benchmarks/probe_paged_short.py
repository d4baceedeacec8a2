"""Round-5 probe (verdict #3): decompose the b=1/8k paged-decode fixed
overhead (0.84 of roofline vs 0.90-0.97 at other shapes).

Model: t(ctx) = a + live_bytes / bw. Interleaved in one process:
- ctx sweep 4k..32k (fp8, b=1, full tables) -> intercept a + slope bw
- XFA_PROBE_NO_SCALE_DMA leg (scale stream contribution)
- b sweep at 8k (per-grid-step constant)
- burst-size sweep at 8k (pipeline ramp: fewer, larger bursts vs more,
  smaller ones at short page counts)
"""
import sys
sys.path.insert(0, "/root/repo")
import os
import numpy as np
import jax, jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention
from xf_flash_attention_cutlass_tpu.quant import quantize_kv
from xf_flash_attention_cutlass_tpu.utils.profiling import timed_scan

H, HK, D, PAGE = 32, 8, 128, 256
BW = 819e9

def make(b, max_seq):
    rng = np.random.default_rng(0)
    pps = max_seq // PAGE
    nump = b * pps + 16
    kp = jax.random.normal(jax.random.PRNGKey(0), (nump, HK, PAGE, D), jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(1), (nump, HK, PAGE, D), jnp.bfloat16)
    kq, ks = quantize_kv(kp, "fp8_e4m3")
    vq, vs = quantize_kv(vp, "fp8_e4m3")
    bt = jnp.asarray(rng.permutation(nump)[: b * pps].reshape(b, pps), jnp.int32)
    kv_lens = jnp.asarray(np.full((b,), max_seq), jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(2), (b, 1, H, D), jnp.bfloat16)
    live_pages = b * pps
    nbytes = 2 * live_pages * PAGE * HK * (D + 4)
    return q, kq, vq, ks, vs, bt, kv_lens, nbytes

def run(tag, b, max_seq, lengths=(4, 64)):
    q, kq, vq, ks, vs, bt, kv_lens, nbytes = make(b, max_seq)
    def step(qa, kq, vq, ks, vs, bt, kv_lens):
        return paged_attention(qa, kq, vq, bt, kv_lens, causal=True,
                               k_scales=ks, v_scales=vs)[0].astype(qa.dtype)
    t = timed_scan(step, q, kq, vq, ks, vs, bt, kv_lens, lengths=lengths)
    roof = nbytes / BW
    print(f"{tag}: {t*1e6:8.2f}us  ideal {roof*1e6:7.2f}us  frac {roof/t:.3f}")
    return t, nbytes

if __name__ == "__main__":
    print("devices:", jax.devices())
    # ctx sweep (b=1)
    pts = []
    for ctx in (4096, 8192, 16384, 32768):
        t, nb = run(f"fp8 b=1 ctx={ctx//1024}k", 1, ctx)
        pts.append((nb, t))
    # least-squares intercept/slope
    xs = np.array([p[0] for p in pts]); ys = np.array([p[1] for p in pts])
    A = np.vstack([np.ones_like(xs), xs]).T
    (a, inv_bw), *_ = np.linalg.lstsq(A, ys, rcond=None)
    print(f"model: intercept a = {a*1e6:.2f}us, slope bw = {1/inv_bw/1e9:.0f} GB/s")
    # no-scale-DMA leg at 8k
    os.environ["XFA_PROBE_NO_SCALE_DMA"] = "1"
    run("fp8 b=1 ctx=8k NO-SCALE-DMA", 1, 8192)
    del os.environ["XFA_PROBE_NO_SCALE_DMA"]
    # batch sweep at 8k (per-grid-step constant: grid=(b,1))
    for b in (2, 4):
        run(f"fp8 b={b} ctx=8k", b, 8192)
    # burst sweep at 8k b=1
    for burst in (1 << 18, 1 << 19, 1 << 20, 1 << 21):
        os.environ["XFA_PAGED_BURST_BYTES"] = str(burst)
        run(f"fp8 b=1 ctx=8k burst={burst>>10}KB", 1, 8192)
    del os.environ["XFA_PAGED_BURST_BYTES"]
    # re-measure baseline last (chip drift check)
    run("fp8 b=1 ctx=8k (recheck)", 1, 8192)
