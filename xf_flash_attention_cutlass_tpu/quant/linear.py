"""INT8 weight-only projections (QKV/O and MLP matmuls).

BASELINE.json: "INT8 weight-only QKV/O proj + FP8 paged KV". Weights are
stored int8 with one fp32 scale per output channel; activations stay
bf16/f32. The dequant is fused into the matmul tiles by a Pallas kernel —
the int8 weight block is upcast in VMEM right before the MXU dot, so HBM
only ever sees 1 byte/weight (a plain `wq.astype(bf16)` before `jnp.dot`
would let XLA materialize a full-width weight copy in HBM and forfeit the
bandwidth win).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xf_flash_attention_cutlass_tpu.utils import default_interpret, next_multiple


def quantize_weight(
    w: jax.Array,  # (d_in, d_out)
    quant_dtype=jnp.int8,
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel quantization. Returns (w_q, scale(d_out,))."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    if quant_dtype == jnp.int8:
        qmax = 127.0
    elif quant_dtype == jnp.float8_e4m3fn:
        qmax = 448.0
    else:
        raise ValueError(f"unsupported weight quant dtype {quant_dtype}")
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    y = wf / scale[None, :]
    if quant_dtype == jnp.int8:
        wq = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    else:
        wq = jnp.clip(y, -qmax, qmax).astype(quant_dtype)
    return wq, scale.astype(jnp.float32)


def _qmm_kernel(nk: int, x_ref, w_ref, s_ref, o_ref, acc_scr):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # dequant (sans scale) in VMEM then a full-rate bf16 MXU dot: measured
    # faster than the mixed bf16 x int8 dot at every m on v5e (68 vs 44
    # TF/s at m=512; identical at m=64 where DMA granularity dominates)
    acc_scr[...] += jax.lax.dot_general(
        x_ref[...],
        w_ref[...].astype(x_ref.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _():
        o_ref[...] = (acc_scr[...] * s_ref[...]).astype(o_ref.dtype)


def _qmm_stacked_kernel(nk: int, has_scale: bool, l_ref, x_ref, w_ref,
                        *rest):
    """Stacked-weight variant: w_ref is a (1, bk, bn) block of the (L, K, N)
    stack, selected by the scalar-prefetched layer index. Keeping the stack
    indexing INSIDE the kernel is load-bearing: a pallas_call boundary cannot
    fuse an XLA dynamic-slice, so slicing layer weights outside the kernel
    (e.g. as lax.scan xs) materializes a full per-layer weight copy in HBM —
    measured 273 GB/s effective (= exactly HBM/3: slice read + copy write +
    kernel read) on the 8B decode step vs ~660 GB/s through this path.

    has_scale=False serves plain bf16 stacked weights (models packed via
    llama.pack_params_for_decode): the same zero-copy layer indexing,
    measured 1284 -> 1141 us/layer on the 8B bf16 decode step vs the XLA
    dot over a scan-xs slice."""
    it = iter(rest)
    s_ref = next(it) if has_scale else None
    o_ref = next(it)
    acc_scr = next(it)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    acc_scr[...] += jax.lax.dot_general(
        x_ref[...],
        w_ref[0].astype(x_ref.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _():
        acc = acc_scr[...]
        if has_scale:
            acc = acc * s_ref[0]
        o_ref[...] = acc.astype(o_ref.dtype)


def quantized_matmul(
    x: jax.Array,  # (..., d_in) bf16/f32 activations
    w_q: jax.Array,  # (d_in, d_out) int8/fp8 — or (L, d_in, d_out) stacked
    scale: jax.Array,  # (d_out,) f32 — or (L, d_out) stacked
    *,
    layer_idx: Optional[jax.Array] = None,  # () int32: selects the stack layer
    # 1024^2 weight tiles measured best on v5e at BOTH decode (m=64:
    # 662 vs 443 GB/s with 512^2) and prefill shapes (m=512: 171 vs 138
    # TF/s) — bigger DMAs amortize per-grid-step overhead
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = x @ (w_q * scale) with dequant fused into the matmul tiles.

    With ``layer_idx``, w_q/scale carry a leading layer axis and the kernel
    reads tiles of layer ``layer_idx`` straight from the stacked array — the
    way to consume per-layer weights inside a lax.scan without XLA
    materializing a per-layer copy at the pallas_call boundary (the
    dynamic-slice cannot fuse into a kernel operand; see _qmm_stacked_kernel).
    """
    if interpret is None:
        interpret = default_interpret()
    if layer_idx is not None:
        return _quantized_matmul_stacked(
            x, w_q, scale, layer_idx,
            block_m=block_m, block_n=block_n, block_k=block_k,
            interpret=interpret,
        )
    orig_shape = x.shape
    d_in, d_out = w_q.shape
    x2 = x.reshape(-1, d_in)
    m = x2.shape[0]

    bm = min(block_m, max(next_multiple(m, 8), 8))
    bn = min(block_n, max(next_multiple(d_out, 128), 128))
    bk = min(block_k, max(next_multiple(d_in, 128), 128))
    m_pad = next_multiple(m, bm)
    n_pad = next_multiple(d_out, bn)
    k_pad = next_multiple(d_in, bk)
    if (m_pad, k_pad) != x2.shape:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, k_pad - d_in)))
    wp = w_q
    if (k_pad, n_pad) != w_q.shape:
        wp = jnp.pad(w_q, ((0, k_pad - d_in), (0, n_pad - d_out)))
    sp = scale.astype(jnp.float32).reshape(1, -1)
    if n_pad != d_out:
        sp = jnp.pad(sp, ((0, 0), (0, n_pad - d_out)))

    nk = k_pad // bk
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, nk),
        grid=(m_pad // bm, n_pad // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda im, jn, ik: (im, ik)),
            pl.BlockSpec((bk, bn), lambda im, jn, ik: (ik, jn)),
            pl.BlockSpec((1, bn), lambda im, jn, ik: (0, jn)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, jn, ik: (im, jn)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # default scoped-vmem is 16MB; non-default tile choices (e.g.
            # bk=2048 at bn>=1024 int8) exceed it with double-buffering
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, wp, sp)
    return out[:m, :d_out].reshape(*orig_shape[:-1], d_out)


def _quantized_matmul_stacked(
    x: jax.Array,  # (..., d_in)
    w_q: jax.Array,  # (L, d_in, d_out)
    scale: jax.Array,  # (L, d_out)
    layer_idx: jax.Array,  # () int32
    *,
    block_m: int,
    block_n: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    orig_shape = x.shape
    L, d_in, d_out = w_q.shape
    has_scale = scale is not None
    if d_in % 128 or d_out % 128:
        # stacked tiles need 128-aligned dims (padding a stacked weight per
        # call would defeat the zero-copy point); unaligned (test-sized)
        # geometries take the slice path and pay the copy
        w_l = jax.lax.dynamic_index_in_dim(w_q, layer_idx, 0, keepdims=False)
        if not has_scale:
            return (x.reshape(-1, d_in) @ w_l.astype(x.dtype)).reshape(
                *orig_shape[:-1], d_out
            )
        return quantized_matmul(
            x, w_l,
            jax.lax.dynamic_index_in_dim(scale, layer_idx, 0, keepdims=False),
            block_m=block_m, block_n=block_n, block_k=block_k,
            interpret=interpret,
        )
    x2 = x.reshape(-1, d_in)
    m = x2.shape[0]

    def divisor_block(dim, target):
        # largest multiple of 128 <= target that divides dim (dim is
        # 128-aligned here, so 128 itself always terminates the loop)
        b = min(target, dim)
        while dim % b:
            b -= 128
        return b

    bm = min(block_m, max(next_multiple(m, 8), 8))
    bn = divisor_block(d_out, block_n)
    bk = divisor_block(d_in, block_k)
    m_pad = next_multiple(m, bm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    nk = d_in // bk
    in_specs = [
        pl.BlockSpec((bm, bk), lambda im, jn, ik, l: (im, ik)),
        pl.BlockSpec((1, bk, bn), lambda im, jn, ik, l: (l[0], ik, jn)),
    ]
    inputs = [x2, w_q]
    if has_scale:
        in_specs.append(
            pl.BlockSpec((1, 1, bn), lambda im, jn, ik, l: (l[0], 0, jn))
        )
        inputs.append(scale.astype(jnp.float32).reshape(L, 1, d_out))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // bm, d_out // bn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda im, jn, ik, l: (im, jn)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_stacked_kernel, nk, has_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, d_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # default scoped-vmem is 16MB; non-default tile choices (e.g.
            # bk=2048 at bn>=1024 int8) exceed it with double-buffering
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *inputs)
    return out[:m].reshape(*orig_shape[:-1], d_out)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedLinear:
    """Weight-only quantized linear layer: y = x @ (w_q * scale) + bias."""

    w_q: jax.Array  # (d_in, d_out) int8/fp8
    scale: jax.Array  # (d_out,) f32
    bias: Optional[jax.Array] = None

    @classmethod
    def from_weight(cls, w: jax.Array, bias=None, quant_dtype=jnp.int8):
        wq, s = quantize_weight(w, quant_dtype)
        return cls(wq, s, bias)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = quantized_matmul(x, self.w_q, self.scale)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    def tree_flatten(self):
        return (self.w_q, self.scale, self.bias), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
