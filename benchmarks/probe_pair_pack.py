"""Round-5 probe (verdict #6): page-PAIR packing for quantized small pages.

Idea: keep the reference's page-16 ALLOCATION granularity but store two
16-token pages per 32-row sublane tile (the allocator hands out aligned
pairs to the same sequence, the block table maps logical page -> tile
slot). On the kernel side a fully pair-packed sequence is byte-identical
to TIGHT page-32 pools with a halved block table — so the data-path win
is measured by comparing, interleaved in one process at the block-16
workload geometry (b=32, ctx<=1024):

  (a) padded page-16 pools (current shipping layout: values padded
      16->32 rows, scale planes 128 lanes)   [0.22-0.24 live-byte roofline]
  (b) tight page-32 pools (the pair-packed data path; odd tail pages
      would waste half a tile — zero here since ctx % 32 == 0)
  (c) tight page-256 (the TPU-native geometry, upper bound)

Adopt if (b) >= 1.5x (a); else extend the RESULTS_r4 rejection list.
Run with an idle chip: python benchmarks/probe_pair_pack.py
"""
import sys

sys.path.insert(0, "/root/repo")  # noqa: E402
import numpy as np
import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention
from xf_flash_attention_cutlass_tpu.quant import quantize_kv
from xf_flash_attention_cutlass_tpu.utils.profiling import timed_scan

H, HK, D = 32, 8, 128
B, CTX = 32, 1024
BW = 819e9


def bench(qname, page, pad_to=None):
    """pad_to: stored rows per page (padded layout); None = tight."""
    rng = np.random.default_rng(0)
    pps = CTX // page
    nump = B * pps + 8
    kp = jax.random.normal(jax.random.PRNGKey(0), (nump, HK, page, D), jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(1), (nump, HK, page, D), jnp.bfloat16)
    kq, ks = quantize_kv(kp, qname)
    vq, vs = quantize_kv(vp, qname)
    ks, vs = ks[..., 0], vs[..., 0]
    if pad_to is not None and pad_to != page:
        sl = max(-(-pad_to // 128) * 128, 128)
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad_to - page), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad_to - page), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, sl - page)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, sl - page)))
    bt = jnp.asarray(rng.permutation(nump)[: B * pps].reshape(B, pps), jnp.int32)
    kv_lens = jnp.asarray(rng.integers(CTX // 2, CTX + 1, (B,)) // 32 * 32,
                          jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, 1, H, D), jnp.bfloat16)
    live_tokens = int(np.sum(np.asarray(kv_lens)))
    nbytes = 2 * live_tokens * HK * (D + 4)  # LIVE bytes (honest roofline)

    def step(qa, kq, vq, ks, vs, bt, kv_lens):
        return paged_attention(
            qa, kq, vq, bt, kv_lens, causal=True, k_scales=ks, v_scales=vs,
            page_size=page,
        )[0].astype(qa.dtype)

    t = timed_scan(step, q, kq, vq, ks, vs, bt, kv_lens, lengths=(4, 64))
    roof = nbytes / BW
    tag = f"{qname} page={page}" + (f" padded->{pad_to}" if pad_to else " tight")
    print(f"{tag}: {t*1e6:8.2f}us  live-roof {roof*1e6:6.2f}us  "
          f"frac {roof/t:.3f}")
    return t


def bench_bf16(page):
    """bf16 small pages are tight at 16 (no sublane padding) — the tax is
    DMA granularity only; measures whether packing to 32 pays there too."""
    rng = np.random.default_rng(0)
    pps = CTX // page
    nump = B * pps + 8
    kp = jax.random.normal(jax.random.PRNGKey(0), (nump, HK, page, D), jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(1), (nump, HK, page, D), jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(nump)[: B * pps].reshape(B, pps), jnp.int32)
    kv_lens = jnp.asarray(rng.integers(CTX // 2, CTX + 1, (B,)) // 32 * 32,
                          jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, 1, H, D), jnp.bfloat16)
    live_tokens = int(np.sum(np.asarray(kv_lens)))
    nbytes = 2 * live_tokens * HK * D * 2

    def step(qa, kp, vp, bt, kv_lens):
        return paged_attention(qa, kp, vp, bt, kv_lens, causal=True,
                               page_size=page)[0].astype(qa.dtype)

    t = timed_scan(step, q, kp, vp, bt, kv_lens, lengths=(4, 64))
    roof = nbytes / BW
    print(f"bf16 page={page} tight: {t*1e6:8.2f}us  live-roof "
          f"{roof*1e6:6.2f}us  frac {roof/t:.3f}")
    return t


if __name__ == "__main__":
    print("devices:", jax.devices())
    for qname in ("fp8_e4m3", "int8"):
        t16 = bench(qname, 16, pad_to=32)   # (a) current padded-16
        t32 = bench(qname, 32)              # (b) pair-packed data path
        t256 = bench(qname, 256)            # (c) native upper bound
        print(f"{qname}: pair-pack speedup over padded-16: {t16/t32:.2f}x "
              f"(native-256 is {t16/t256:.2f}x)")
    # bf16 leg: tight-16 vs tight-32 (packing candidate for bf16 too?)
    t16b = bench_bf16(16)
    t32b = bench_bf16(32)
    print(f"bf16: pack-to-32 speedup over tight-16: {t16b/t32b:.2f}x")
    # drift check: re-run the first leg
    bench("fp8_e4m3", 16, pad_to=32)
