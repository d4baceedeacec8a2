"""Expert parallelism (EP) for the MoE model family via shard_map + all_to_all.

The reference has no distributed layer (SURVEY.md §2.5); this supplies the
"ep" leg of the multi-chip story. Layout:

- Expert params are sharded on their leading expert axis over the "ep" mesh
  axis (E = ep * E_local per device); attention + router params replicated
  over "ep" (shard them over "tp"/"dp" as usual when those axes coexist).
- Each shard routes its LOCAL tokens, builds the (n, E, C) GShard dispatch
  (models/moe.py), and einsums its tokens into (E, C, d) expert blocks.
- One `all_to_all` regroups blocks by expert owner: split the expert axis,
  concatenate on the capacity axis, giving each device
  (E_local, ep*C, d) — its own experts, fed by every shard's tokens.
- Local SwiGLU expert FFNs run as one vmapped GEMM stack, then the inverse
  all_to_all returns (E, C, d) blocks to the token owners for the combine.

Both all_to_alls ride ICI; gradients flow through them natively (the
transpose of all_to_all is the inverse all_to_all), so the same code path
trains.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xf_flash_attention_cutlass_tpu.models.moe import (
    MoEConfig,
    expert_capacity,
    expert_ffn,
    moe_loss_fn,
)

EP = "ep"
DP = "dp"

_EXPERT_PARAMS = ("w_gate", "w_up", "w_down")


def moe_param_partition_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Experts sharded over "ep" on their expert axis; everything else
    replicated (compose with tp.param_partition_specs when tp coexists)."""

    def spec_for(path, leaf):
        name = None
        for p in path:
            k = getattr(p, "key", getattr(p, "name", None))
            if isinstance(k, str):
                name = k
        if name in _EXPERT_PARAMS:
            # stacked layers: (L, E, ...) -> shard axis 1; unstacked (E, ...)
            return P(*([None] * (leaf.ndim - 3)), EP, None, None)
        return P(*([None] * leaf.ndim))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_moe_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = moe_param_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def ep_expert_apply(layer, expert_in, *, ep_size: int, axis_name: str = EP):
    """The ep_fn hook for models/moe.moe_mlp_block, run inside shard_map.

    expert_in: (E, C, d) — this shard's tokens dispatched to ALL E experts.
    layer's expert weights are local slices (E_local, ...).
    """
    E, C, d = expert_in.shape
    if E % ep_size:
        raise ValueError(f"n_experts {E} must divide ep={ep_size}")
    # send chunk i of the expert axis to device i; receive my experts'
    # blocks from every shard, stacked along capacity
    x = jax.lax.all_to_all(
        expert_in, axis_name, split_axis=0, concat_axis=1, tiled=True
    )  # (E_local, ep*C, d)
    y = expert_ffn(layer["w_gate"], layer["w_up"], layer["w_down"], x)
    # inverse: split capacity back per source shard, rebuild full expert axis
    return jax.lax.all_to_all(
        y, axis_name, split_axis=1, concat_axis=0, tiled=True
    )  # (E, C, d)


def moe_ep_forward(params, tokens, cfg: MoEConfig, mesh: Mesh):
    """Jittable dp x ep MoE forward: the batch is sharded over BOTH dp and
    ep (every device owns tokens; ep additionally shards the experts), so
    non-expert compute is pure data parallelism and only the dispatched
    expert blocks cross devices. Returns logits sharded like the batch."""
    from xf_flash_attention_cutlass_tpu.models.moe import moe_forward

    specs = moe_param_partition_specs(params)
    ep_size = mesh.shape[EP]

    def local(params, tokens):
        b, s = tokens.shape
        cap = expert_capacity(cfg, b * s)
        logits, aux = moe_forward(
            params, tokens, cfg, capacity=cap,
            ep_fn=functools.partial(ep_expert_apply, ep_size=ep_size),
        )
        return logits, jax.lax.pmean(jax.lax.pmean(aux, EP), DP)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, P((DP, EP), None)),
        out_specs=(P((DP, EP), None, None), P()),
        check_vma=False,
    )
    return fn(params, tokens)


def moe_ep_loss_and_grad(params, tokens, cfg: MoEConfig, mesh: Mesh):
    """One dp x ep training step: loss + grads, experts never gathered.

    Gradient bookkeeping: inside shard_map each shard differentiates ITS
    token-mean loss; the global loss is the (dp*ep)-shard mean.
    - Replicated params touch only local tokens -> pmean over (dp, ep).
    - Expert params receive, via the all_to_all transpose, the SUM of every
      same-dp-group shard's cotangents -> pmean over dp plus an explicit
      1/ep scale (the ep-analog of tp.py's scale_grad reasoning).
    """
    specs = moe_param_partition_specs(params)
    ep_size = mesh.shape[EP]

    def local_loss(params, tokens):
        b, s = tokens.shape
        cap = expert_capacity(cfg, b * (s - 1))
        return moe_loss_fn(
            params, tokens, cfg, capacity=cap,
            ep_fn=functools.partial(ep_expert_apply, ep_size=ep_size),
        )

    def local_step(params, tokens):
        loss, grads = jax.value_and_grad(local_loss)(params, tokens)
        loss = jax.lax.pmean(jax.lax.pmean(loss, DP), EP)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, DP), grads
        )
        grads = jax.tree_util.tree_map(
            lambda g, s: g / ep_size if EP in tuple(s)
            else jax.lax.pmean(g, EP),
            grads,
            specs,
        )
        return loss, grads

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(specs, P((DP, EP), None)),
        out_specs=(P(), specs),
        check_vma=False,
    )
    return fn(params, tokens)
