"""LLaMA-style decoder stack — the 8B-class flagship model of BASELINE.json
config 5 ("8B-class attention stack, INT8 weight-only QKV/O proj + FP8 paged
KV, tensor-sharded").

The reference repo is attention-only; this model is the surrounding stack
the BASELINE targets require: RMSNorm → (QKV proj → RoPE → flash/paged
attention → O proj) → SwiGLU MLP, tied together functionally (pure pytree
params, no framework objects) so it jits/shards/quantizes cleanly.

Layout notes (TPU-first):
- All matmuls are (tokens, features) GEMMs in bf16 — MXU-shaped; no per-head
  small matmuls outside the attention kernel.
- GQA: n_kv_heads < n_heads; the attention kernels take h_k directly.
- Prefill uses the dense Pallas flash kernel; decode uses the paged kernel
  through the serve layer (serve/engine.py).
- TP sharding rules for every param live in parallel/sharding.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention
from xf_flash_attention_cutlass_tpu.ops.rotary import apply_rotary, rotary_frequencies
from xf_flash_attention_cutlass_tpu.quant.linear import quantize_weight, quantized_matmul


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    ffn_dim: int = 14336
    max_seq_len: int = 8192
    rope_base: float = 500000.0
    rms_eps: float = 1e-5
    rotary_interleaved: bool = False  # NeoX-style halves (llama convention)
    # set when n_heads is a local (TP-sliced) count and dim//n_heads no
    # longer gives the true head size (parallel/tp.py _local_cfg)
    head_dim_override: Optional[int] = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.dim // self.n_heads

    @classmethod
    def llama8b(cls) -> "LlamaConfig":
        return cls(
            vocab_size=128256, dim=4096, n_layers=32, n_heads=32,
            n_kv_heads=8, ffn_dim=14336,
        )

    @classmethod
    def tiny(cls) -> "LlamaConfig":
        """Small config for compile checks and CPU tests."""
        return cls(
            vocab_size=512, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=512, max_seq_len=1024,
        )


def init_params(key, cfg: LlamaConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Pure-pytree parameter init (truncated-normal-ish scaled gaussians)."""
    d, hd = cfg.dim, cfg.head_dim
    n_kv_dim = cfg.n_kv_heads * hd
    keys = jax.random.split(key, cfg.n_layers + 2)

    def dense(k, din, dout):
        return (jax.random.normal(k, (din, dout), jnp.float32) / math.sqrt(din)).astype(dtype)

    layers = []
    for li in range(cfg.n_layers):
        lk = jax.random.split(keys[li], 8)
        layers.append(
            dict(
                attn_norm=jnp.ones((d,), dtype),
                wq=dense(lk[0], d, cfg.n_heads * hd),
                wk=dense(lk[1], d, n_kv_dim),
                wv=dense(lk[2], d, n_kv_dim),
                wo=dense(lk[3], cfg.n_heads * hd, d),
                mlp_norm=jnp.ones((d,), dtype),
                w_gate=dense(lk[4], d, cfg.ffn_dim),
                w_up=dense(lk[5], d, cfg.ffn_dim),
                w_down=dense(lk[6], cfg.ffn_dim, d),
            )
        )
    # stack layer params for lax.scan (single fused pytree, faster compiles)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return dict(
        embed=(jax.random.normal(keys[-2], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        layers=stacked,
        final_norm=jnp.ones((d,), dtype),
        lm_head=dense(keys[-1], d, cfg.vocab_size),
    )


# ---- Megatron-style TP region markers (parallel/tp.py) -------------------
# f: identity forward, psum backward — placed where a replicated activation
# enters head/ffn-sharded compute, so upstream (norms, embeddings) receives
# the full, replicated cotangent.
# g: psum forward, identity backward — the sharded region's output reduce.


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_in(x, axis_name: str):
    return x


def _tpi_fwd(x, axis_name):
    return x, None


def _tpi_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


tp_region_in.defvjp(_tpi_fwd, _tpi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_out(x, axis_name: str):
    return jax.lax.psum(x, axis_name)


def _tpo_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _tpo_bwd(axis_name, _, ct):
    return (ct,)


tp_region_out.defvjp(_tpo_fwd, _tpo_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def scale_grad(x, s: float):
    """Identity forward, cotangent scaled by s. Used after the vocab
    all_gather: the loss is computed redundantly on every tp device, so the
    gather's transpose (a psum_scatter) would overcount cotangents tp-fold."""
    return x


def _sg_fwd(x, s):
    return x, None


def _sg_bwd(s, _, ct):
    return (ct * s,)


scale_grad.defvjp(_sg_fwd, _sg_bwd)


def split_layer_params(layers):
    """Partition stacked layer params for a layer lax.scan: quantized
    projection tuples must stay OUT of the scan xs — a scan-xs dynamic
    slice feeding the qmm pallas_call cannot fuse, so XLA materializes a
    full per-layer weight copy in HBM every step (measured 273 GB/s
    effective = exactly HBM/3 on the 8B decode step). The stacked tuples
    are consumed via quantized_matmul(layer_idx=...) instead."""
    xs = {k: v for k, v in layers.items() if not isinstance(v, tuple)}
    stacked = {k: v for k, v in layers.items() if isinstance(v, tuple)}
    return xs, stacked


def layer_view(xs_slice, stacked, l):
    """Reassemble one layer's param dict inside the scan body."""
    layer = dict(xs_slice)
    for name, (wq, s) in stacked.items():
        layer[name] = (wq, s, l)
    return layer


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _proj(x: jax.Array, w) -> jax.Array:
    """Dense or weight-quantized projection.

    w forms: plain array | (w_q, scale) | (w_q_stacked, scale_stacked,
    layer_idx) — the third form reads one layer's tiles straight out of the
    (L, din, dout) stack inside the qmm kernel, avoiding the per-layer HBM
    copy a lax.scan xs slice would cost at the pallas_call boundary
    (serve/engine.py layer loops use it)."""
    if isinstance(w, tuple):  # from quantize_params
        if len(w) == 3:
            return quantized_matmul(x, w[0], w[1], layer_idx=w[2])
        return quantized_matmul(x, w[0], w[1])
    return x @ w


def attention_block(
    layer: Dict[str, Any],
    x: jax.Array,  # (b, s, d)
    cfg: LlamaConfig,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,  # (b, s) int32
    kv_lens: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,  # TP axis: psum the O-proj partial
) -> jax.Array:
    b, s, d = x.shape
    hd = cfg.head_dim
    h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    if axis_name is not None:
        h = tp_region_in(h, axis_name)
    q = _proj(h, layer["wq"]).reshape(b, s, cfg.n_heads, hd)
    k = _proj(h, layer["wk"]).reshape(b, s, cfg.n_kv_heads, hd)
    v = _proj(h, layer["wv"]).reshape(b, s, cfg.n_kv_heads, hd)
    q = apply_rotary(q, cos, sin, positions, cfg.rotary_interleaved)
    k = apply_rotary(k, cos, sin, positions, cfg.rotary_interleaved)
    qseg = kseg = None
    if kv_lens is not None:
        # padded-batch masking as segment ids (differentiable path)
        kseg = jnp.where(
            jnp.arange(s, dtype=jnp.int32)[None] < kv_lens[:, None], 0, -2
        )
        qseg = jnp.zeros((b, s), jnp.int32)
    o, _ = flash_attention(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
        causal=True, q_segment_ids=qseg, kv_segment_ids=kseg,
    )
    o = o.swapaxes(1, 2).reshape(b, s, cfg.n_heads * hd)
    partial = _proj(o, layer["wo"])
    if axis_name is not None:
        partial = tp_region_out(partial, axis_name)
    return x + partial


def mlp_block(
    layer: Dict[str, Any],
    x: jax.Array,
    cfg: LlamaConfig,
    axis_name: Optional[str] = None,
) -> jax.Array:
    h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
    if axis_name is not None:
        h = tp_region_in(h, axis_name)
    gate = _proj(h, layer["w_gate"])
    up = _proj(h, layer["w_up"])
    partial = _proj(jax.nn.silu(gate) * up, layer["w_down"])
    if axis_name is not None:
        partial = tp_region_out(partial, axis_name)
    return x + partial


def forward(
    params: Dict[str, Any],
    tokens: jax.Array,  # (b, s) int32
    cfg: LlamaConfig,
    positions: Optional[jax.Array] = None,  # (b, s) int32
    kv_lens: Optional[jax.Array] = None,  # (b,) mask for padded batches
) -> jax.Array:
    """Full causal forward; returns logits (b, s, vocab)."""
    b, s = tokens.shape
    x = params["embed"][tokens]
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    cos, sin = rotary_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)

    layers_xs, layers_stacked = split_layer_params(params["layers"])

    def body(x, xs):
        layer_xs, l = xs
        layer = layer_view(layer_xs, layers_stacked, l)
        x = attention_block(layer, x, cfg, cos, sin, positions, kv_lens)
        x = mlp_block(layer, x, cfg)
        return x, None

    L = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    x, _ = jax.lax.scan(body, x, (layers_xs, L))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return _proj(x, params["lm_head"]).astype(jnp.float32)


def loss_fn(params, tokens, cfg: LlamaConfig) -> jax.Array:
    """Next-token cross entropy (training objective for fwd+bwd parity)."""
    logits = forward(params, tokens[:, :-1], cfg)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def pack_params_for_decode(params: Dict[str, Any]) -> Dict[str, Any]:
    """Wrap full-precision stacked projection weights as (w, None) tuples so
    the engine's decode scan consumes them through the zero-copy stacked
    matmul (quant/linear._qmm_stacked_kernel) instead of an XLA dot over a
    scan-xs slice — measured 1284 -> 1141 us/layer on the 8B bf16 decode
    step. No data is copied (the tuple wraps the same arrays); quantized
    (w_q, scale) tuples already take the stacked path and pass through."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        w = layers.get(name)
        # only (L, d_in, d_out) per-layer matrices; MoE expert stacks are
        # 4-D and consumed by expert_ffn directly, not _proj
        if w is not None and not isinstance(w, tuple) and w.ndim == 3:
            layers[name] = (w, None)
    out["layers"] = layers
    return out


def quantize_params(params: Dict[str, Any], quant_dtype=jnp.int8) -> Dict[str, Any]:
    """INT8 weight-only quantization of all projection matrices (QKV/O and
    MLP); norms/embeddings stay full precision. Projections become
    (w_q, scale) tuples consumed by _proj via the fused-dequant matmul."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        w = layers[name]  # stacked (L, din, dout)
        wq, s = jax.vmap(lambda wi: quantize_weight(wi, quant_dtype))(w)
        layers[name] = (wq, s)
    out["layers"] = layers
    out["lm_head"] = quantize_weight(params["lm_head"], quant_dtype)
    return out
