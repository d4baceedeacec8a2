"""Tensor-parallel paged decode — BASELINE.json config 5's serving shape:
the attention stack sharded over ICI (KV pools and heads on the "tp" axis,
INT8/FP8 pools supported) with one batched decode step per tick.

Layout under shard_map:
- params: the training-side partition specs (parallel/tp.py) — QKV out-
  sharded, O in-sharded, lm_head vocab-sharded, the rest replicated
- KV pools: sharded on the kv-head axis -> each device appends + attends
  over its local heads only; zero cross-device traffic inside attention
- per layer: one psum after the O projection, one after the MLP down
  projection; one all_gather for the vocab-sharded logits
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xf_flash_attention_cutlass_tpu.models.llama import LlamaConfig
from xf_flash_attention_cutlass_tpu.parallel.tp import (
    TP,
    _local_cfg,
    param_partition_specs,
)
from xf_flash_attention_cutlass_tpu.serve.engine import decode_core, verify_core


def pool_partition_specs(pools: dict) -> dict:
    """KV pools (L, num_pages, h_k, page[, d]) shard on the kv-head axis."""
    return {
        name: P(None, None, TP, *([None] * (arr.ndim - 3)))
        for name, arr in pools.items()
    }


def shard_pools(pools: dict, mesh: Mesh) -> dict:
    specs = pool_partition_specs(pools)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in pools.items()
    }


def tp_decode_step(
    params,
    tokens,  # (b, 1) int32, replicated
    pools,  # dict of (L, num_pages, h_k, page[, d]) arrays
    block_tables,  # (b, max_pages) int32, replicated
    kv_lens,  # (b,) int32, replicated
    cfg: LlamaConfig,
    mesh: Mesh,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """One tensor-parallel decode step. Returns (next_tokens, logits, pools)
    with pools still sharded."""
    pspecs = param_partition_specs(params)
    kspecs = pool_partition_specs(pools)
    tp_size = mesh.shape[TP]
    lcfg = _local_cfg(cfg, tp_size)

    fn = jax.shard_map(
        functools.partial(
            decode_core,
            cfg=lcfg,
            quant=quant,
            interpret=interpret,
            axis_name=TP,
        ),
        mesh=mesh,
        in_specs=(pspecs, P(), kspecs, P(), P()),
        out_specs=(P(), P(), kspecs),
        check_vma=False,
    )
    return fn(params, tokens, pools, block_tables, kv_lens)


def tp_verify_step(
    params,
    tokens,  # (b, L) int32, replicated — [last, draft_1, ..., draft_{L-1}]
    pools,
    block_tables,  # (b, max_pages) int32, replicated
    kv_lens,  # (b,) int32, replicated — length AFTER this step (cur + L)
    cfg: LlamaConfig,
    mesh: Mesh,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Tensor-parallel speculative verification: the L-token analog of
    tp_decode_step. Returns ((b, L, vocab) logits, pools) with pools still
    sharded; the engine's acceptance rule runs on the gathered logits."""
    pspecs = param_partition_specs(params)
    kspecs = pool_partition_specs(pools)
    tp_size = mesh.shape[TP]
    lcfg = _local_cfg(cfg, tp_size)

    fn = jax.shard_map(
        functools.partial(
            verify_core,
            cfg=lcfg,
            quant=quant,
            interpret=interpret,
            axis_name=TP,
        ),
        mesh=mesh,
        in_specs=(pspecs, P(), kspecs, P(), P()),
        out_specs=(P(), kspecs),
        check_vma=False,
    )
    return fn(params, tokens, pools, block_tables, kv_lens)


DP = "dp"


def tp_dp_decode_step(
    params,
    tokens,  # (b, 1) int32 — batch sharded over "dp"
    pools,  # (L, num_pages, h_k, page[, d]) — pages over "dp", kv-heads over "tp"
    block_tables,  # (b, max_pages) int32, LOCAL page ids per dp shard
    kv_lens,  # (b,) int32, sharded over "dp"
    cfg: LlamaConfig,
    mesh: Mesh,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Data-parallel x tensor-parallel decode: each dp replica serves its
    own slice of the batch against its own slice of the page pool (block
    tables hold dp-local page ids), while every replica's weights and KV
    heads are tp-sharded. No cross-dp communication at all — dp scales
    batch over hosts/DCN, tp rides ICI (SURVEY §2.5's target layout).

    Returns (next_tokens, logits, pools): tokens/logits dp-sharded on
    batch, pools still (dp, tp)-sharded.
    """
    pspecs = param_partition_specs(params)
    kspecs = {
        name: P(None, DP, TP, *([None] * (arr.ndim - 3)))
        for name, arr in pools.items()
    }
    tp_size = mesh.shape[TP]
    lcfg = _local_cfg(cfg, tp_size)

    fn = jax.shard_map(
        functools.partial(
            decode_core,
            cfg=lcfg,
            quant=quant,
            interpret=interpret,
            axis_name=TP,
        ),
        mesh=mesh,
        in_specs=(pspecs, P(DP), kspecs, P(DP), P(DP)),
        out_specs=(P(DP), P(DP), kspecs),
        check_vma=False,
    )
    return fn(params, tokens, pools, block_tables, kv_lens)
