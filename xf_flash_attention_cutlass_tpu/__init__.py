"""TPU-native quantized flash/paged attention inference engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``Sherlolo/xf_flash_attention_cutlass`` (a FlashAttention-2/CUTLASS fork for
Hygon DCU GPUs), redesigned TPU-first:

- ``ops``      — Pallas kernels: dense flash attention fwd/bwd, split-KV paged
                 decode over a block-table KV cache, (O, LSE) combine algebra,
                 rotary embedding, cache append, FP8/INT8 quantization.
- ``parallel`` — ``jax.sharding`` meshes, shard_map'd attention (TP over heads,
                 DP over batch), ring/blockwise context parallelism over ICI.
- ``serve``    — continuous-batching decode engine with a native C++ page
                 allocator + scheduler.
- ``models``   — 8B-class Llama-style attention stack wired to the kernels.

The public attention API mirrors the reference's Python surface
(`/root/reference/test.py:41-245`): ``flash_attn_func``,
``flash_attn_varlen_func``, ``flash_attn_with_kvcache``.
"""

__version__ = "0.1.0"

from xf_flash_attention_cutlass_tpu.api import (  # noqa: F401
    flash_attn_func,
    flash_attn_kvpacked_func,
    flash_attn_varlen_func,
    flash_attn_varlen_kvpacked_func,
    flash_attn_with_kvcache,
)
