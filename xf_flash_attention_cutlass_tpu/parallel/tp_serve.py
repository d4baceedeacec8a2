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
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xf_flash_attention_cutlass_tpu.models.llama import LlamaConfig
from xf_flash_attention_cutlass_tpu.parallel.tp import (
    TP,
    _local_cfg,
    param_partition_specs,
)
from xf_flash_attention_cutlass_tpu.serve.engine import (
    decode_core,
    prefill_chunk_core,
    verify_core,
)


DP = "dp"
EP = "ep"


def pool_partition_specs(pools: dict) -> dict:
    """KV pools (L, num_pages, h_k, page[, d]) shard on the kv-head axis."""
    return {
        name: P(None, None, TP, *([None] * (arr.ndim - 3)))
        for name, arr in pools.items()
    }


def _batch_axes(dp_axis: bool, ep_axis: bool):
    """The replica axes the batch (and pool pages) shard over. An ep shard
    IS a dp replica for every non-expert tensor (parallel/ep_serve.py):
    it owns its own batch rows, page-pool slice and block tables; only the
    PARAM specs differ (experts sharded over ep instead of replicated)."""
    axes = tuple(a for a, on in ((DP, dp_axis), (EP, ep_axis)) if on)
    if not axes:
        return None
    return axes if len(axes) > 1 else axes[0]


def _kspecs(pools: dict, dp_axis: bool, ep_axis: bool = False) -> dict:
    """Pool specs: kv heads over tp, pages over the replica axes."""
    page_axes = _batch_axes(dp_axis, ep_axis)
    return {
        name: P(None, page_axes, TP, *([None] * (arr.ndim - 3)))
        for name, arr in pools.items()
    }


def _pspecs(params, ep_axis: bool):
    """Param specs: tp's Megatron layout, plus (ep mode) expert leaves
    sharded on their expert axis over "ep" (parallel/ep_serve.py)."""
    if ep_axis:
        from xf_flash_attention_cutlass_tpu.parallel.ep_serve import (
            ep_param_partition_specs,
        )

        return ep_param_partition_specs(params, tp=True)
    return param_partition_specs(params)


def shard_pools(
    pools: dict, mesh: Mesh, dp_axis: bool = False, ep_axis: bool = False
) -> dict:
    specs = _kspecs(pools, dp_axis, ep_axis)
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
    temperature=None,  # (b,) f32 replicated; None -> greedy
    sample_key=None,  # PRNGKey replicated (same on every device)
    top_k: int = 0,
    top_p: float = 0.0,
    approx_top_k: bool = True,  # engine.sample_tokens approx_max_k trade
    sp_batch: bool = False,  # reduce-scatter + all-gather per layer instead
    # of psums: the residual stream stays batch-sharded between sharded
    # regions so the collectives can overlap norms/matmuls over ICI
    # (engine.verify_core sp_batch). Same comm volume, better overlap.
    dp_axis: bool = False,  # mesh also has a "dp" axis: batch rows, block
    # tables (LOCAL page ids), kv_lens and the pool page axis shard over it
    # — each dp replica serves its own batch slice with zero cross-dp
    # traffic (tp_dp_decode_step layout)
    ep_axis: bool = False,  # mesh also has an "ep" axis (>1): MoE expert
    # weights shard their expert axis over it while batch/pools shard
    # ep like another dp replica axis; GShard blocks cross devices via
    # the all_to_all pair (parallel/ep_serve.py, engine ep mode)
    page_size: Optional[int] = None,  # true page for padded small-page pools
):
    """One tensor-parallel decode step. Returns (next_tokens, logits, pools)
    with pools still sharded."""
    pspecs = _pspecs(params, ep_axis)
    kspecs = _kspecs(pools, dp_axis, ep_axis)
    bspec = P(_batch_axes(dp_axis, ep_axis))
    tp_size = mesh.shape[TP]
    lcfg = _local_cfg(cfg, tp_size)
    # shard_map specs must match the arg pytree: normalize Nones to
    # concrete replicated arrays (zero temperature rows take argmax)
    if temperature is None:
        temperature = jnp.zeros((tokens.shape[0],), jnp.float32)
    if sample_key is None:
        sample_key = jax.random.PRNGKey(0)

    def local(params, tokens, pools, block_tables, kv_lens, temperature,
              sample_key):
        return decode_core(
            params, tokens, pools, block_tables, kv_lens,
            cfg=lcfg, quant=quant, interpret=interpret, axis_name=TP,
            ep_axis=EP if ep_axis else None,
            page_size=page_size,
            temperature=temperature, sample_key=sample_key,
            top_k=top_k, top_p=top_p, approx_top_k=approx_top_k,
            sp_batch=sp_batch,
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


def tp_decode_multi_step(
    params,
    tokens,  # (b, 1) int32
    pools,
    block_tables,
    kv_lens,  # (b,) int32 — length after the FIRST inner step (engine
    # pre-extends pages by n_steps; inner step i uses kv_lens + i)
    cfg: LlamaConfig,
    mesh: Mesh,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    temperature=None,
    sample_base=None,  # PRNGKey, replicated; fold_in(base, step0+i) in-scan
    step0=None,  # int32 scalar
    top_k: int = 0,
    top_p: float = 0.0,
    approx_top_k: bool = True,
    sp_batch: bool = False,
    dp_axis: bool = False,
    ep_axis: bool = False,
    page_size: Optional[int] = None,
    n_steps: int = 2,
):
    """Mesh analog of engine.decode_multi_step: n_steps autoregressive
    decode iterations in ONE dispatch, the lax.scan INSIDE the shard_map
    (per-layer psums/RS+AG/all_to_all collectives trace once per inner
    step; the host syncs once per window). Same key schedule as n_steps
    consecutive tp_decode_step calls — token-identical streams.
    Returns ((n_steps, b) tokens, pools)."""
    pspecs = _pspecs(params, ep_axis)
    kspecs = _kspecs(pools, dp_axis, ep_axis)
    bspec = P(_batch_axes(dp_axis, ep_axis))
    tp_size = mesh.shape[TP]
    lcfg = _local_cfg(cfg, tp_size)
    if temperature is None:
        temperature = jnp.zeros((tokens.shape[0],), jnp.float32)
    if sample_base is None:
        sample_base = jax.random.PRNGKey(0)
    if step0 is None:
        step0 = jnp.asarray(0, jnp.int32)

    def local(params, tokens, pools, block_tables, kv_lens, temperature,
              sample_base, step0):
        def body(carry, i):
            tokens, pools = carry
            key = jax.random.fold_in(sample_base, step0 + i)
            nt, _, pools = decode_core(
                params, tokens, pools, block_tables, kv_lens + i,
                cfg=lcfg, quant=quant, interpret=interpret, axis_name=TP,
                ep_axis=EP if ep_axis else None, page_size=page_size,
                temperature=temperature, sample_key=key,
                top_k=top_k, top_p=top_p, approx_top_k=approx_top_k,
                sp_batch=sp_batch,
            )
            return (nt[:, None], pools), nt

        (_, pools), toks = jax.lax.scan(
            body, (tokens, pools), jnp.arange(n_steps, dtype=jnp.int32)
        )
        return toks, pools

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspecs, bspec, kspecs, bspec, bspec, bspec, P(), P()),
        out_specs=(P(None, *bspec), kspecs),
        check_vma=False,
    )
    return fn(params, tokens, pools, block_tables, kv_lens, temperature,
              sample_base, step0)


tp_decode_multi_step_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "quant", "interpret", "top_k", "top_p",
        "approx_top_k", "sp_batch", "dp_axis", "ep_axis", "page_size",
        "n_steps",
    ),
    donate_argnames=("pools",),
)(tp_decode_multi_step)


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
    dp_axis: bool = False,
    ep_axis: bool = False,  # "ep" replica axis + expert-sharded params
    sp_batch: bool = False,  # RS+AG per layer (engine.verify_core sp_batch)
    page_size: Optional[int] = None,
):
    """Tensor-parallel speculative verification: the L-token analog of
    tp_decode_step. Returns ((b, L, vocab) logits, pools) with pools still
    sharded; the engine's acceptance rule runs on the gathered logits."""
    pspecs = _pspecs(params, ep_axis)
    kspecs = _kspecs(pools, dp_axis, ep_axis)
    bspec = P(_batch_axes(dp_axis, ep_axis))
    tp_size = mesh.shape[TP]
    lcfg = _local_cfg(cfg, tp_size)

    fn = jax.shard_map(
        functools.partial(
            verify_core,
            cfg=lcfg,
            quant=quant,
            interpret=interpret,
            axis_name=TP,
            ep_axis=EP if ep_axis else None,
            page_size=page_size,
            sp_batch=sp_batch,
        ),
        mesh=mesh,
        in_specs=(pspecs, bspec, kspecs, bspec, bspec),
        out_specs=(bspec, kspecs),
        check_vma=False,
    )
    return fn(params, tokens, pools, block_tables, kv_lens)


def tp_prefill_chunk_step(
    params,
    tokens,  # (P, C) int32, replicated
    n_prior,  # (P,) int32
    n_valid,  # (P,) int32
    pools,
    bt,  # (P, max_pages) int32, replicated
    cfg: LlamaConfig,
    mesh: Mesh,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    dp_axis: bool = False,  # lane rows shard over "dp" (LOCAL page ids)
    ep_axis: bool = False,  # "ep" replica axis + expert-sharded params
    page_size: Optional[int] = None,
):
    """Tensor-parallel batched chunked prefill (engine.prefill_chunk_core
    under shard_map). Returns (logits (P, vocab), pools) with pools still
    sharded."""
    pspecs = _pspecs(params, ep_axis)
    kspecs = _kspecs(pools, dp_axis, ep_axis)
    bspec = P(_batch_axes(dp_axis, ep_axis))
    lcfg = _local_cfg(cfg, mesh.shape[TP])

    fn = jax.shard_map(
        functools.partial(
            prefill_chunk_core,
            cfg=lcfg,
            quant=quant,
            interpret=interpret,
            axis_name=TP,
            ep_axis=EP if ep_axis else None,
            page_size=page_size,
        ),
        mesh=mesh,
        in_specs=(pspecs, bspec, bspec, bspec, kspecs, bspec),
        out_specs=(bspec, kspecs),
        check_vma=False,
    )
    return fn(params, tokens, n_prior, n_valid, pools, bt)


# ---- jitted, pool-donating wrappers for the DecodeEngine's mesh mode ----
# (mesh/cfg/quant static; re-creating shard_map per eager call would
# re-stage every engine step)

tp_decode_step_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "quant", "interpret", "top_k", "top_p",
        "approx_top_k", "sp_batch", "dp_axis", "ep_axis", "page_size",
    ),
    donate_argnames=("pools",),
)(tp_decode_step)

tp_verify_step_jit = functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "quant", "interpret", "dp_axis",
                     "ep_axis", "sp_batch", "page_size"),
    donate_argnames=("pools",),
)(tp_verify_step)

tp_prefill_chunk_step_jit = functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "quant", "interpret", "dp_axis",
                     "ep_axis", "page_size"),
    donate_argnames=("pools",),
)(tp_prefill_chunk_step)


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
