"""Pipeline parallelism (PP): GPipe microbatch schedule over a "pp" mesh axis.

The reference is single-device (SURVEY.md §2.5); this supplies the "pp" leg
of the multi-chip story, the TPU way:

- The stacked layer params (L, ...) are sharded over "pp" on the layer axis,
  so each device materializes only its stage's L/pp layers.
- Inside shard_map, a `lax.scan` over n_micro + pp - 1 schedule steps runs
  every stage in SPMD lockstep: stage 0 ingests one microbatch per step,
  each stage applies its local layers, and one `ppermute` per step shifts
  activations to the next stage over ICI.
- Autodiff through scan+ppermute IS the backward pipeline: the transpose of
  the shift is the reverse shift, so cotangents hop stage-by-stage from the
  loss back to stage 0 with no hand-written schedule.

Gradient bookkeeping: the loss is computed only on the last stage (masked
to zero elsewhere) and psum'd, so stage-local layer grads stay local, while
replicated leaves (embed / final_norm / lm_head) get their single non-zero
stage contribution summed across "pp" with a psum.

Bubble fraction is the GPipe (pp-1)/(n_micro+pp-1); pick n_micro >= 4*pp in
real runs. Composes with dp (batch over "dp", pmean grads) below.
"""

from __future__ import annotations

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

PP = "pp"
DP = "dp"
TP = "tp"

_STAGE_LOCAL = ("layers",)  # pytree keys sharded over the pp axis


def pp_param_partition_specs(
    params: Dict[str, Any], tp: bool = False
) -> Dict[str, Any]:
    """Layer stack sharded over "pp" on the leading (layer) axis; embeddings,
    final norm and head replicated (they run on stage 0 / last stage).
    With tp=True the 3-D mesh composition: each stage's weights are
    additionally Megatron-sharded over "tp" (QKV/gate/up out-sharded,
    O/down in-sharded, lm_head vocab-sharded — cf. parallel/tp.py)."""

    def spec_for(path, leaf):
        top = getattr(path[0], "key", getattr(path[0], "name", None))
        name = None
        for part in path:
            k = getattr(part, "key", getattr(part, "name", None))
            if isinstance(k, str):
                name = k
        if top in _STAGE_LOCAL:
            if tp and name in ("wq", "wk", "wv", "w_gate", "w_up"):
                return P(PP, *([None] * (leaf.ndim - 3)), None, TP)
            if tp and name in ("wo", "w_down"):
                return P(PP, *([None] * (leaf.ndim - 3)), TP, None)
            return P(PP, *([None] * (leaf.ndim - 1)))
        if tp and name == "lm_head":
            return P(None, TP)
        return P(*([None] * leaf.ndim))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_pp_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = pp_param_partition_specs(params, tp=mesh.shape.get(TP, 1) > 1)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _stage_apply(layers_local, x, cfg, cos, sin, positions, axis_name=None):
    def body(x, layer):
        x = attention_block(layer, x, cfg, cos, sin, positions,
                            axis_name=axis_name)
        x = mlp_block(layer, x, cfg, axis_name=axis_name)
        return x, None

    x, _ = jax.lax.scan(body, x, layers_local)
    return x


def _pp_pipeline_local(params, inputs, cfg: LlamaConfig, pp_size: int,
                       n_micro: int, tp_axis=None):
    """Runs inside shard_map: returns last-stage hidden states (b, s, d)
    (garbage on other stages — mask or psum at the caller)."""
    idx = jax.lax.axis_index(PP)
    b, s = inputs.shape
    if b % n_micro:
        raise ValueError(f"batch {b} must divide n_micro={n_micro}")
    mb = b // n_micro
    x_mb = params["embed"][inputs].reshape(n_micro, mb, s, -1)
    d = x_mb.shape[-1]
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (mb, s))
    cos, sin = rotary_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)

    n_steps = n_micro + pp_size - 1
    state0 = jnp.zeros((mb, s, d), x_mb.dtype)
    outputs0 = jnp.zeros((n_micro, mb, s, d), x_mb.dtype)
    shift = [(i, (i + 1) % pp_size) for i in range(pp_size)]

    def step(carry, t):
        state, outputs = carry
        feed = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
        )
        cur = jnp.where((idx == 0) & (t < n_micro), feed, state)
        out = _stage_apply(params["layers"], cur, cfg, cos, sin, positions,
                           axis_name=tp_axis)
        done = t - (pp_size - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            outputs, out, jnp.clip(done, 0, n_micro - 1), 0
        )
        outputs = jnp.where((idx == pp_size - 1) & (done >= 0), upd, outputs)
        state = jax.lax.ppermute(out, PP, shift)
        return (state, outputs), None

    (_, outputs), _ = jax.lax.scan(
        step, (state0, outputs0), jnp.arange(n_steps)
    )
    return outputs.reshape(b, s, d)


def _pp_loss_local(params, tokens, cfg, pp_size, n_micro, tp_size=1):
    idx = jax.lax.axis_index(PP)
    x = _pp_pipeline_local(params, tokens[:, :-1], cfg, pp_size, n_micro,
                           tp_axis=TP if tp_size > 1 else None)
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    if tp_size > 1:
        # vocab-sharded head: gather shards, 1/tp grad fix (parallel/tp.py)
        x = tp_region_in(x, TP)
        logits = _proj(x, params["lm_head"]).astype(jnp.float32)
        logits = jax.lax.all_gather(logits, TP, axis=-1, tiled=True)
        logits = scale_grad(logits, 1.0 / tp_size)
    else:
        logits = _proj(x, params["lm_head"]).astype(jnp.float32)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    # only the last stage saw real activations; zero-mask the rest so the
    # cotangent enters only there. NO collective here: psum is its own
    # transpose under check_vma=False, so a psum inside the differentiated
    # function would scale every grad by pp (verified the hard way) — the
    # caller psums the returned stage-local loss AFTER value_and_grad.
    return jnp.where(idx == pp_size - 1, jnp.mean(nll), 0.0)


def pp_forward(params, tokens, cfg: LlamaConfig, mesh: Mesh,
               n_micro: int = 4):
    """Jittable dp x pp forward; returns logits (b, s, vocab) fp32."""
    specs = pp_param_partition_specs(params)
    pp_size = mesh.shape[PP]

    def local(params, tokens):
        idx = jax.lax.axis_index(PP)
        x = _pp_pipeline_local(params, tokens, cfg, pp_size, n_micro)
        x = jnp.where(idx == pp_size - 1, x, 0)
        x = jax.lax.psum(x, PP)  # replicate the last stage's activations
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        return _proj(x, params["lm_head"]).astype(jnp.float32)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, P(DP, None)),
        out_specs=P(DP, None, None),
        check_vma=False,
    )
    return fn(params, tokens)


def pp_loss_and_grad(params, tokens, cfg: LlamaConfig, mesh: Mesh,
                     n_micro: int = 4):
    """One dp x pp (x tp) training step: loss + grads via the autodiff'd
    pipeline. When the mesh's "tp" axis is >1 this is the full 3-D
    composition: stages over pp, Megatron head/ffn shards over tp inside
    each stage (two psums per layer), batch over dp."""
    pp_size = mesh.shape[PP]
    tp_size = dict(mesh.shape).get(TP, 1)
    specs = pp_param_partition_specs(params, tp=tp_size > 1)
    if tp_size > 1:
        from xf_flash_attention_cutlass_tpu.parallel.tp import _local_cfg

        run_cfg = _local_cfg(cfg, tp_size)
    else:
        run_cfg = cfg

    def local_step(params, tokens):
        loss, grads = jax.value_and_grad(
            functools.partial(
                _pp_loss_local, cfg=run_cfg, pp_size=pp_size,
                n_micro=n_micro, tp_size=tp_size,
            )
        )(params, tokens)
        # value_and_grad returned the stage-local masked loss: recover the
        # true scalar (it lives on the last stage) then average over dp
        loss = jax.lax.pmean(jax.lax.psum(loss, PP), DP)
        if tp_size > 1:  # equal on every tp shard; collective marks it so
            loss = jax.lax.pmean(loss, TP)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, DP), grads)

        # replicated-over-pp leaves have their grad on exactly one stage
        # (embed on stage 0, norm/head on the last): sum the stages.
        # replicated-over-tp leaves are already equal across tp (the f/g
        # markers psum cotangents at region boundaries) — pmean for VMA.
        def fix(g, s):
            axes = tuple(s)
            if PP not in axes:
                g = jax.lax.psum(g, PP)
            if tp_size > 1 and TP not in axes:
                g = jax.lax.pmean(g, TP)
            return g

        grads = jax.tree_util.tree_map(fix, grads, specs)
        return loss, grads

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(specs, P(DP, None)),
        out_specs=(P(), specs),
        check_vma=False,
    )
    return fn(params, tokens)
