"""Tensor + data parallel transformer execution via shard_map.

Megatron-style TP re-expressed the TPU way (SURVEY.md §2.5 "to be added"):
weights are sharded along head/ffn axes with PartitionSpecs, shard_map hands
each device its slice, the Pallas attention kernel runs on LOCAL heads (no
cross-device traffic inside attention — heads are embarrassingly parallel),
and exactly two `psum`s per layer (after the O projection and after the MLP
down projection) ride the ICI ring. Data parallelism is the "dp" mesh axis
over the batch; gradients `psum` over "dp" in the train step.

shard_map (not GSPMD auto-sharding) is load-bearing here: pallas_call is
opaque to the XLA partitioner, so auto-sharding would all-gather the
operands; under shard_map the kernel simply sees the local shard.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xf_flash_attention_cutlass_tpu.models.llama import (
    LlamaConfig,
    attention_block,
    mlp_block,
    rms_norm,
    scale_grad,
    tp_region_in,
    _proj,
)
from xf_flash_attention_cutlass_tpu.ops.rotary import rotary_frequencies

TP = "tp"
DP = "dp"


def param_partition_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for llama params: QKV/gate/up out-sharded over
    tp, O/down in-sharded, lm_head vocab-sharded, the rest replicated."""

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        # quantized projections are (w_q, scale) tuples: scale is the
        # tuple element at index 1 -> 2D-minus-one rank
        name = next((n for n in names if isinstance(n, str)), None)
        for n in names:
            if isinstance(n, str):
                name = n  # innermost string key wins
        is_scale = leaf.ndim in (1, 2) and name in (
            "wq", "wk", "wv", "w_gate", "w_up", "wo", "w_down", "lm_head"
        ) and leaf.dtype == jnp.float32
        # MoE expert scales are 3-D (L, E, dout) and sit at tuple index 1
        # (quantize_moe_params); distinguish them from 3-D full-precision
        # llama weights by the tuple position in the key path
        in_tuple_scale = any(
            isinstance(pp, jax.tree_util.SequenceKey)
            and getattr(pp, "idx", None) == 1
            for pp in path
        )
        if (name in ("w_gate", "w_up", "w_down") and leaf.ndim == 3
                and leaf.dtype == jnp.float32 and in_tuple_scale):
            if name == "w_down":  # (L, E, d): out dim replicated
                return P(None, None, None)
            return P(None, None, TP)  # (L, E, f): ffn dim sharded
        if name in ("wq", "wk", "wv", "w_gate", "w_up"):
            if is_scale:  # (L, dout) or (dout,)
                return P(*([None] * (leaf.ndim - 1)), TP)
            return P(*([None] * (leaf.ndim - 2)), None, TP)
        if name in ("wo", "w_down"):
            if is_scale:  # out dim replicated; in dim was sharded
                return P(*([None] * leaf.ndim))
            return P(*([None] * (leaf.ndim - 2)), TP, None)
        if name == "lm_head":
            if is_scale:
                return P(*([None] * (leaf.ndim - 1)), TP)
            return P(None, TP)
        return P(*([None] * leaf.ndim))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = param_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _local_cfg(cfg: LlamaConfig, tp_size: int) -> LlamaConfig:
    if cfg.n_heads % tp_size or cfg.n_kv_heads % tp_size:
        raise ValueError(
            f"n_heads {cfg.n_heads} / n_kv_heads {cfg.n_kv_heads} must divide "
            f"tp={tp_size}"
        )
    return dataclasses.replace(
        cfg,
        n_heads=cfg.n_heads // tp_size,
        n_kv_heads=cfg.n_kv_heads // tp_size,
        head_dim_override=cfg.head_dim,
    )


def _tp_forward_local(params, tokens, cfg: LlamaConfig, tp_size: int):
    """Runs on each device inside shard_map: local heads + 2 psums/layer."""
    lcfg = _local_cfg(cfg, tp_size)
    b, s = tokens.shape
    x = params["embed"][tokens]
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    cos, sin = rotary_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)

    def body(x, layer):
        x = attention_block(
            layer, x, lcfg, cos, sin, positions, axis_name=TP
        )
        x = mlp_block(layer, x, lcfg, axis_name=TP)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    x = tp_region_in(x, TP)  # vocab-sharded head region
    logits_local = _proj(x, params["lm_head"]).astype(jnp.float32)
    # vocab-sharded head -> gather shards back to the full vocab axis
    logits = jax.lax.all_gather(logits_local, TP, axis=-1, tiled=True)
    return scale_grad(logits, 1.0 / tp_size)


def tp_forward(params, tokens, cfg: LlamaConfig, mesh: Mesh):
    """Jittable tensor+data-parallel forward. tokens (b, s) sharded over dp;
    returns logits (b, s, vocab) sharded over dp."""
    specs = param_partition_specs(params)
    tp_size = mesh.shape[TP]

    fn = jax.shard_map(
        functools.partial(_tp_forward_local, cfg=cfg, tp_size=tp_size),
        mesh=mesh,
        in_specs=(specs, P(DP, None)),
        out_specs=P(DP, None, None),
        check_vma=False,
    )
    return fn(params, tokens)


def tp_loss_and_grad(params, tokens, cfg: LlamaConfig, mesh: Mesh):
    """One data+tensor-parallel training step's loss and grads."""
    specs = param_partition_specs(params)
    tp_size = mesh.shape[TP]

    def local_loss(params, tokens):
        logits = _tp_forward_local(params, tokens[:, :-1], cfg, tp_size)
        targets = tokens[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    def local_step(params, tokens):
        loss, grads = jax.value_and_grad(local_loss)(params, tokens)
        loss = jax.lax.pmean(loss, DP)
        grads = jax.lax.pmean(grads, DP)
        # Replicated-param grads are already full and identical across tp
        # (tp_region_in/out in models/llama.py psum the cotangents at the
        # sharded-region boundaries — Megatron's f/g pattern). The pmean
        # below is numerically a no-op but REQUIRED: under check_vma=False
        # an output is typed tp-varying unless a collective marks it
        # invariant, and shard_map would otherwise psum it over tp on exit.
        grads = jax.tree_util.tree_map(
            lambda g, s: g if TP in tuple(s) else jax.lax.pmean(g, TP),
            grads,
            specs,
        )
        return loss, grads

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(specs, P(DP, None)),
        out_specs=(P(), specs),
        check_vma=False,
    )
    return fn(params, tokens)
