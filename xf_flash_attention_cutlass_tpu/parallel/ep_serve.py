"""Expert-parallel SERVING for the MoE family (round-4 verdict #5).

The standard deployment axis for Mixtral-class models whose expert weights
exceed one chip's HBM: expert weights shard on their EXPERT axis over an
"ep" mesh axis while the batch (requests, KV pools, block tables) shards
over ep exactly like data parallelism — every chip runs attention, router,
and dispatch for its OWN requests, and only the GShard (E, C, d) expert
blocks cross devices (the all_to_all pair from parallel/ep.py, riding
ICI). Unlike PP capacity scaling, every chip stays hot every step.

Composition:
- ep alone: non-expert params replicated, experts split E -> E/ep each.
- dp x ep: both axes shard the batch; experts split over ep only.
- ep x tp: tp additionally Megatron-shards attention/expert ffn dims
  (parallel/tp.py specs); the expert all_to_all moves (E, C, d)
  activations with the full model dim, and the tp psum happens after the
  combine (models/moe.py moe_mlp_block), so the two axes compose without
  interaction.

Reference anchor: none — the reference has no distributed layer
(SURVEY.md §2.5); this fills the BASELINE.json multi-chip north star for
the MoE family. Host-side admission for ep batches reuses the dp
machinery (per-replica page allocators): an ep shard IS a dp replica for
every non-expert tensor.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xf_flash_attention_cutlass_tpu.models.llama import LlamaConfig
from xf_flash_attention_cutlass_tpu.parallel.ep import EP, _EXPERT_PARAMS
from xf_flash_attention_cutlass_tpu.parallel.tp import (
    TP,
    _local_cfg,
    param_partition_specs,
)

DP = "dp"


def ep_param_partition_specs(
    params: Dict[str, Any], tp: bool = False
) -> Dict[str, Any]:
    """Engine-layout (stacked (L, E, ...)) MoE param specs: expert leaves
    shard their expert axis (axis 1) over "ep"; everything else follows
    the tp specs (tp=True) or stays replicated."""
    base = (
        param_partition_specs(params)
        if tp
        else jax.tree_util.tree_map(
            lambda leaf: P(*([None] * leaf.ndim)), params
        )
    )

    def add_ep(path, leaf, spec):
        name = None
        for p in path:
            k = getattr(p, "key", getattr(p, "name", None))
            if isinstance(k, str):
                name = k
        if name in _EXPERT_PARAMS:
            parts = tuple(spec) + (None,) * (leaf.ndim - len(tuple(spec)))
            if parts[1] is not None:
                raise ValueError(
                    f"expert leaf {name} axis 1 already sharded: {spec}"
                )
            return P(parts[0], EP, *parts[2:])
        return spec

    return jax.tree_util.tree_map_with_path(add_ep, params, base)


def ep_pool_specs(pools: dict, batch_axes, tp: bool = False) -> dict:
    """(L, pages, h_k, page[, d]) pools: pages over the batch axes (each
    ep/dp shard holds its own requests' pages), kv heads over tp."""
    tp_part = TP if tp else None
    return {
        name: P(None, batch_axes, tp_part, *([None] * (arr.ndim - 3)))
        for name, arr in pools.items()
    }


def shard_ep(params, pools, mesh: Mesh, tp: bool = False):
    """Place engine MoE params + pools for ep serving."""
    batch_axes = tuple(a for a in (DP, EP) if a in mesh.shape)
    pspecs = ep_param_partition_specs(params, tp=tp)
    kspecs = ep_pool_specs(pools, batch_axes, tp=tp)
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
    return (
        jax.tree_util.tree_map(put, params, pspecs),
        jax.tree_util.tree_map(put, pools, kspecs),
    )


def ep_decode_step(
    params,
    tokens,  # (b, 1) int32 — batch sharded over (dp?, ep)
    pools,  # (L, pages, ...) — pages over (dp?, ep), kv heads over tp?
    block_tables,  # (b, max_pages) int32, LOCAL page ids per shard
    kv_lens,  # (b,) int32, sharded like the batch
    cfg: LlamaConfig,
    mesh: Mesh,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    temperature: Optional[jax.Array] = None,
    sample_key: Optional[jax.Array] = None,
    top_k: int = 0,
    top_p: float = 0.0,
    approx_top_k: bool = True,  # engine.sample_tokens approx_max_k trade
):
    """One expert-parallel MoE decode step. Returns (next_tokens, logits,
    pools), batch-sharded, pools still sharded. Token-identical to the
    single-device MoE decode (tests/test_moe_ep_serve.py): the GShard
    dispatch/combine per shard sees exactly its local tokens, and
    ep_expert_apply routes blocks to the expert owners and back."""
    from xf_flash_attention_cutlass_tpu.serve.engine import decode_core

    if EP not in mesh.shape:
        raise ValueError(f"mesh {mesh} has no '{EP}' axis")
    tp_size = dict(mesh.shape).get(TP, 1)
    batch_axes = tuple(a for a in (DP, EP) if a in mesh.shape)
    bspec = P(batch_axes if len(batch_axes) > 1 else batch_axes[0])
    pspecs = ep_param_partition_specs(params, tp=tp_size > 1)
    kspecs = ep_pool_specs(pools, bspec[0], tp=tp_size > 1)
    lcfg = _local_cfg(cfg, tp_size) if tp_size > 1 else cfg
    if temperature is None:
        temperature = jnp.zeros((tokens.shape[0],), jnp.float32)
    if sample_key is None:
        sample_key = jax.random.PRNGKey(0)

    def local(params, tokens, pools, block_tables, kv_lens, temperature,
              sample_key):
        return decode_core(
            params, tokens, pools, block_tables, kv_lens,
            cfg=lcfg, quant=quant, interpret=interpret,
            axis_name=TP if tp_size > 1 else None, ep_axis=EP,
            temperature=temperature, sample_key=sample_key,
            top_k=top_k, top_p=top_p, approx_top_k=approx_top_k,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspecs, bspec, kspecs, bspec, bspec, bspec, P()),
        out_specs=(bspec, bspec, kspecs),
        check_vma=False,
    )
    return fn(params, tokens, pools, block_tables, kv_lens, temperature,
              sample_key)


def ep_prefill_chunk_step(
    params,
    tokens,  # (P, C) int32 — prefill lanes sharded over (dp?, ep)
    n_prior,  # (P,) int32
    n_valid,  # (P,) int32
    pools,
    bt,  # (P, max_pages) int32, LOCAL page ids per shard
    cfg: LlamaConfig,
    mesh: Mesh,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Expert-parallel batched chunked prefill — the prefill leg that
    makes ep serving end-to-end capable (engine.prefill_chunk_core with
    the ep_axis hook; lanes shard like the decode batch). Returns
    (logits (P_local-stacked, vocab), pools), both still sharded.

    NB the per-shard GShard capacity is computed from the LOCAL lane
    count, so P must divide the batch axes (same rule as decode's b)."""
    from xf_flash_attention_cutlass_tpu.serve.engine import (
        prefill_chunk_core,
    )

    tp_size = dict(mesh.shape).get(TP, 1)
    batch_axes = tuple(a for a in (DP, EP) if a in mesh.shape)
    bspec = P(batch_axes if len(batch_axes) > 1 else batch_axes[0])
    pspecs = ep_param_partition_specs(params, tp=tp_size > 1)
    kspecs = ep_pool_specs(pools, bspec[0], tp=tp_size > 1)
    lcfg = _local_cfg(cfg, tp_size) if tp_size > 1 else cfg

    def local(params, tokens, n_prior, n_valid, pools, bt):
        return prefill_chunk_core(
            params, tokens, n_prior, n_valid, pools, bt,
            cfg=lcfg, quant=quant, interpret=interpret,
            axis_name=TP if tp_size > 1 else None, ep_axis=EP,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspecs, bspec, bspec, bspec, kspecs, bspec),
        out_specs=(bspec, kspecs),
        check_vma=False,
    )
    return fn(params, tokens, n_prior, n_valid, pools, bt)
