"""Quantized KV cache: FP8-E4M3 / INT8 values with per-token scales.

BASELINE.json's quantization north star — the reference never shipped this,
but left the int8 MMA atoms it intended to use
(/root/reference/csrc/cutlass_3.2.1/include/cute/arch/mma_gfx928.hpp:299-341).
On TPU the win is HBM bandwidth: decode reads the whole KV cache once per
step, so storing it at 1 byte/elem doubles effective tokens/s at the
bandwidth roofline. Dequant happens inside the paged-attention tiles
(ops/paged.py `kv_quant` path), never as a separate materialized pass.

Scale granularity is per token per KV head (one fp32 per cache row): finer
than the per-page "block" scale the name suggests, essentially free to store
(d=128 → 1/128 overhead = 3%), and markedly more accurate than per-page
amax scaling under mixed-magnitude prompts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

KV_QUANT_DTYPES = {
    "int8": (jnp.int8, 127.0),
    "fp8_e4m3": (jnp.float8_e4m3fn, 448.0),
}


def _resolve(quant_dtype) -> Tuple[jnp.dtype, float]:
    if isinstance(quant_dtype, str):
        try:
            return KV_QUANT_DTYPES[quant_dtype]
        except KeyError:
            raise ValueError(
                f"unknown KV quant dtype {quant_dtype!r}; "
                f"expected one of {sorted(KV_QUANT_DTYPES)}"
            ) from None
    if quant_dtype == jnp.int8:
        return jnp.int8, 127.0
    if quant_dtype == jnp.float8_e4m3fn:
        return jnp.float8_e4m3fn, 448.0
    raise ValueError(f"unsupported KV quant dtype {quant_dtype}")


def quantize_kv(
    x: jax.Array,  # (..., d) full-precision values (token rows on axis -2)
    quant_dtype="int8",
) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric quantization. Returns (values, scales) where
    scales has shape (..., 1) fp32 and values = round(x / scales)."""
    dt, qmax = _resolve(quant_dtype)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    y = xf / scale
    if dt == jnp.int8:
        q = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    else:
        q = jnp.clip(y, -qmax, qmax).astype(dt)
    return q, scale.astype(jnp.float32)


def dequantize_kv(values: jax.Array, scales: jax.Array, dtype=jnp.float32):
    return (values.astype(jnp.float32) * scales.astype(jnp.float32)).astype(dtype)


def quantize_kv_pools(
    k_pool: jax.Array,  # (num_pages, h_k, page, d) full precision
    v_pool: jax.Array,
    quant_dtype="int8",
):
    """Quantize internal-layout KV pools. Returns (kq, ks, vq, vs)."""
    kq, ks = quantize_kv(k_pool, quant_dtype)
    vq, vs = quantize_kv(v_pool, quant_dtype)
    return kq, ks, vq, vs
