"""Continuous-batching decode engine over the paged KV cache.

The serving runtime the reference leaves to its caller (its block tables are
test fixtures, /root/reference/test.py:1597-1621; `cache_batch_idx` slot
reuse at export.cpp:1663-1669 is the closest it gets): request admission,
per-step page growth and retirement run in the native C++ allocator
(csrc/page_allocator.cpp via serve/allocator.py); prefill uses the dense
flash kernel and scatters KV into pages; decode steps every active slot
through the paged kernel in one batched jit call.

Cache protocol: the allocator's seq_len always counts tokens whose KV is in
the cache after the upcoming step. A decode step consumes the previously
sampled token, appends its KV at position seq_len-1 and attends over
seq_len keys.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from xf_flash_attention_cutlass_tpu.models.llama import (
    LlamaConfig,
    _proj,
    mlp_block,
    rms_norm,
)
from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
from xf_flash_attention_cutlass_tpu.ops.paged_append import paged_append
from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention
from xf_flash_attention_cutlass_tpu.ops.rotary import apply_rotary, rotary_frequencies
from xf_flash_attention_cutlass_tpu.serve.allocator import PagePool
from xf_flash_attention_cutlass_tpu.utils import cdiv


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_batch: int = 8
    page_size: int = 256
    num_pages: int = 512
    max_seq: int = 4096
    kv_quant: Optional[str] = None  # None | "int8" | "fp8_e4m3"
    eos_token: int = -1  # -1: never stop on a token
    # chunked prefill: process prompts in fixed-size chunks through the
    # paged kernel, one chunk per engine step, interleaved with decode —
    # ONE compiled prefill shape for every prompt length and bounded
    # per-step latency. None keeps whole-prompt bucketed prefill.
    prefill_chunk: Optional[int] = None
    # number of prompts prefilling simultaneously (one batched chunk step
    # advances every lane): admission bursts don't serialize behind one
    # long prompt. 1 = classic single-stream chunked prefill.
    prefill_lanes: int = 1
    # speculative decoding (greedy requests only): each step verifies
    # [last_token + (speculate_k-1) prompt-lookup drafts] in one batched
    # multi-token paged step and emits 1..speculate_k tokens — exactly the
    # plain greedy stream, faster when the text is locally repetitive.
    # <=1 disables.
    speculate_k: int = 0
    spec_ngram: int = 3  # prompt-lookup match length for drafting
    # sampling: per-request temperature rides add_request(); these truncation
    # knobs are engine-wide (static shapes under jit). 0 disables either.
    top_k: int = 0
    top_p: float = 0.0
    sample_seed: int = 0
    # top-k/top-p truncation via jax.lax.approx_max_k (39us vs 1.0ms exact
    # at V=128k b=64, recall ~0.95 — the standard TPU serving trade).
    # False restores exact lax.top_k / full-vocab top-p semantics.
    approx_top_k: bool = True
    # multi-step scheduling: when no admission or prefill work is pending,
    # run this many decode steps inside ONE dispatch (a device-side
    # lax.scan) — the host syncs once per window instead of once per
    # token, cutting dispatch+fetch overhead by the window size.
    # Requests finishing mid-window generate (discarded) overshoot
    # tokens into their own rows only; pages are pre-extended by the
    # window (<= multi_step-1 tokens of transient page overshoot per
    # request). Token streams are identical to multi_step=1 (same key
    # schedule). Works on mesh engines too (the scan runs inside the
    # shard_map, parallel/tp_serve.tp_decode_multi_step); ignored when
    # speculative decoding is active.
    multi_step: int = 1
    # quantized pools at sub-tile page sizes (16/8) are served PAIR-PACKED:
    # 32//page logical pages per 32-row sublane tile (tight page-32 pools
    # + a coarsened internal page) — 2.0-2.1x decode bandwidth and half
    # the HBM of the padded layout (round-5 probe_pair_pack.py).
    # Allocation granularity coarsens to 32 tokens. False keeps the
    # literal page-size padded layout.
    pack_small_pages: bool = True

    @property
    def max_pages_per_seq(self) -> int:
        return cdiv(self.max_seq, self.page_size)


def effective_engine_config(ecfg: EngineConfig) -> EngineConfig:
    """Resolve the config the engine actually serves with.

    Page-PAIR packing (round-5 probe, benchmarks/probe_pair_pack.py):
    quantized pools at sub-tile page sizes serve 2.0-2.1x faster stored
    as full 32-row sublane tiles holding 32//page logical pages each —
    vs 0.22-0.24 of live-byte roofline for the padded layout — and use
    HALF the HBM. Kernel-side a fully packed sequence IS a tight page-32
    pool with a packed block table, so the engine simply coarsens its
    internal page to the tile; allocation granularity becomes 32 tokens
    (<=1 page-equivalent waste per sequence, strictly less than the
    padded layout's 2x per-page waste). pack_small_pages=False keeps the
    literal padded layout. Checkpoints store the RESOLVED config (the
    transform is idempotent, so restore round-trips)."""
    if (
        ecfg.kv_quant
        and ecfg.pack_small_pages
        and ecfg.page_size < 32
        and 32 % ecfg.page_size == 0
    ):
        factor = 32 // ecfg.page_size
        if ecfg.num_pages % factor:
            raise ValueError(
                f"pack_small_pages: num_pages={ecfg.num_pages} must be a "
                f"multiple of {factor} (pages per 32-row tile at "
                f"page_size={ecfg.page_size})"
            )
        logger.info(
            "pack_small_pages: serving page_size=%d quantized pools as "
            "%d-page 32-row tiles (2x decode bandwidth, half the pool "
            "bytes vs the padded layout)",
            ecfg.page_size, factor,
        )
        ecfg = dataclasses.replace(
            ecfg, page_size=32, num_pages=ecfg.num_pages // factor,
        )
    return ecfg


# candidate-prefix width for the pure top-p fast path (sample_tokens):
# big enough that any p<=0.9 nucleus at serving temperatures fits, small
# enough that approx_max_k stays cheap — its cost is ~linear in k on v5e
# (V=128k b=64: 63/117/259us at k=64/128/256; full fast path 128us at
# prefix 128 vs 276us at 256, round-5 probe)
_TOP_P_PREFIX_K = 128


def sample_tokens(
    logits: jax.Array,  # (b, V) f32
    temperature: Optional[jax.Array] = None,  # (b,) f32; <=0 -> greedy row
    key: Optional[jax.Array] = None,  # PRNGKey; required when any temp > 0
    top_k: int = 0,  # keep k highest-probability tokens (0 = off)
    top_p: float = 0.0,  # nucleus: keep smallest set with cum prob >= p
    approx_top_k: bool = True,  # TPU-optimized approx_max_k (recall ~0.95)
) -> jax.Array:
    """Batched next-token selection: greedy / temperature / top-k / top-p.

    Rows with temperature <= 0 take argmax; others sample from the
    (truncated, rescaled) categorical. Deterministic given `key` — under
    tensor parallelism pass the same key on every device so all shards pick
    the same token.

    Any top_k > 0 samples from the top-k PREFIX directly (categorical
    over (b, k), nucleus computed within the renormalized prefix — the
    sequential-filter convention); the prefix comes from
    `jax.lax.approx_max_k` by default (39us at V=128k b=64 on v5e vs
    1.0ms exact `lax.top_k`, ~0.95 recall — standard for TPU serving;
    `approx_top_k=False` restores exactness, and CPU lowers it exactly
    either way). The round-3 full-vocab mask + scatter formulation
    measured 2.2-9.2ms/step at V=128k — 1.4-6x the ENTIRE 32-layer 8B
    attention budget (round-4 verdict #6, benchmarks/RESULTS_r4.md).

    Pure top-p (top_k=0, top_p>0) with ``approx_top_k=True`` routes
    through an approx_max_k prefix of ``_TOP_P_PREFIX_K`` (128)
    candidates (128us/step at V=128k b=64 on v5e) — the nucleus is
    computed within that renormalized prefix, which is exact whenever
    the true nucleus fits in the prefix (p<=0.9 nuclei at temperature
    ~1 are far smaller in practice) and bounded-recall otherwise.
    ``approx_top_k=False`` restores the exact full-vocab argsort
    formulation (148ms at V=128k — debug/CPU only).
    """
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temperature is None:
        return greedy
    t = jnp.asarray(temperature, jnp.float32)
    scaled = logits / jnp.maximum(t, 1e-6)[:, None]
    if top_k and top_k > 0:
        if approx_top_k:
            vals, idx = jax.lax.approx_max_k(scaled, top_k)
        else:
            vals, idx = jax.lax.top_k(scaled, top_k)  # (b, k) sorted desc
        if top_p and top_p > 0.0:
            probs = jax.nn.softmax(vals, axis=-1)  # renormalized in top-k
            cum = jnp.cumsum(probs, axis=-1)
            # keep tokens whose cumulative prob up to AND INCLUDING them
            # first reaches p (the top token always survives)
            vals = jnp.where(cum - probs >= top_p, -jnp.inf, vals)
        pos = jax.random.categorical(key, vals, axis=-1)
        sampled = jnp.take_along_axis(
            idx, pos[:, None], axis=-1
        )[:, 0].astype(jnp.int32)
        return jnp.where(t > 0.0, sampled, greedy)
    if top_p and top_p > 0.0 and approx_top_k:
        # pure top-p fast path (round-4 verdict #5): nucleus within an
        # approx_max_k prefix instead of the 148ms full-vocab argsort.
        # Exact whenever the true nucleus fits in the prefix (recall
        # caveats as for top-k above); approx_top_k=False opts out.
        kpfx = min(_TOP_P_PREFIX_K, logits.shape[-1])
        vals, idx = jax.lax.approx_max_k(scaled, kpfx)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        vals = jnp.where(cum - probs >= top_p, -jnp.inf, vals)
        pos = jax.random.categorical(key, vals, axis=-1)
        sampled = jnp.take_along_axis(
            idx, pos[:, None], axis=-1
        )[:, 0].astype(jnp.int32)
        return jnp.where(t > 0.0, sampled, greedy)
    masked = scaled
    if top_p and top_p > 0.0:
        order = jnp.argsort(-scaled, axis=-1)
        probs = jax.nn.softmax(jnp.take_along_axis(scaled, order, axis=-1), axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative prob up to AND INCLUDING them first
        # reaches p (the top token always survives)
        drop_sorted = cum - probs >= top_p
        drop = jnp.zeros_like(drop_sorted).at[
            jnp.arange(order.shape[0])[:, None], order
        ].set(drop_sorted)
        masked = jnp.where(drop, -jnp.inf, masked)
    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(t > 0.0, sampled, greedy)


from xf_flash_attention_cutlass_tpu.models.llama import (  # noqa: E402
    layer_view as _layer_view,
    split_layer_params as _split_layer_params,
)


def _mlp(layer, x, cfg, axis_name=None, ep_axis=None):
    """Dense SwiGLU or sparse MoE MLP, keyed off the layer params: MoE
    layers carry a router (models/moe.py). The engine thus serves both
    model families through the same prefill/decode steps."""
    if "router" in layer:
        from xf_flash_attention_cutlass_tpu.models.moe import moe_mlp_block

        # axis_name must flow through: shard_params shards expert ffn
        # weights over tp (parallel/tp.py), so the expert down-projection
        # is a partial sum that moe_mlp_block psums (models/moe.py).
        # ep_axis (expert-parallel serving, parallel/ep_serve.py): expert
        # weights are sharded on their expert axis and the GShard blocks
        # cross devices via the all_to_all pair in parallel/ep.py.
        ep_fn = None
        if ep_axis is not None:
            from xf_flash_attention_cutlass_tpu.parallel.ep import (
                ep_expert_apply,
            )

            ep_fn = functools.partial(
                ep_expert_apply,
                ep_size=jax.lax.axis_size(ep_axis),
                axis_name=ep_axis,
            )
        out, _ = moe_mlp_block(layer, x, cfg, axis_name=axis_name, ep_fn=ep_fn)
        return out
    return mlp_block(layer, x, cfg, axis_name=axis_name)


def _attn_qkv(layer, x, cfg: LlamaConfig, cos, sin, positions):
    """norm -> qkv proj -> rotary; shared by prefill and decode."""
    b, s, _ = x.shape
    hd = cfg.head_dim
    h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    q = _proj(h, layer["wq"]).reshape(b, s, cfg.n_heads, hd)
    k = _proj(h, layer["wk"]).reshape(b, s, cfg.n_kv_heads, hd)
    v = _proj(h, layer["wv"]).reshape(b, s, cfg.n_kv_heads, hd)
    q = apply_rotary(q, cos, sin, positions, cfg.rotary_interleaved)
    k = apply_rotary(k, cos, sin, positions, cfg.rotary_interleaved)
    return q, k, v


def decode_core(
    params,
    tokens,  # (b, 1) int32 — previously sampled tokens
    pools,  # dict of (L, ...) arrays: k, v [, k_s, v_s]
    block_tables,  # (b, max_pages) int32
    kv_lens,  # (b,) int32 — seq length AFTER this step
    cfg: LlamaConfig,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    axis_name: Optional[str] = None,  # TP axis inside shard_map
    ep_axis: Optional[str] = None,  # EP axis (parallel/ep_serve.py)
    page_size: Optional[int] = None,  # true page for padded pools
    temperature: Optional[jax.Array] = None,  # (b,) f32; None/<=0 -> greedy
    sample_key: Optional[jax.Array] = None,  # PRNGKey (replicated under TP)
    top_k: int = 0,
    top_p: float = 0.0,
    approx_top_k: bool = True,  # sample_tokens approx_max_k trade
    sp_batch: bool = False,  # RS+AG collective structure (see verify_core)
):
    """One batched decode step = the L=1 case of verify_core, plus
    sampling. Returns (next_tokens, logits, pools). Under shard_map, cfg
    must be the LOCAL config (parallel/tp.py) and the pools this device's
    kv-head shard; logits come back vocab-gathered.

    Pools ride the layer scan CARRY inside verify_core, updated by the
    in-place paged append with the paged kernel selecting layers via
    layer_idx — as scan xs/ys the whole-stack pools would be copied every
    step (measured 15x slowdown)."""
    logits, pools = verify_core(
        params, tokens, pools, block_tables, kv_lens, cfg, quant, interpret,
        axis_name=axis_name, ep_axis=ep_axis, page_size=page_size,
        sp_batch=sp_batch,
    )
    logits = logits[:, 0]
    next_tokens = sample_tokens(
        logits, temperature, sample_key, top_k=top_k, top_p=top_p,
        approx_top_k=approx_top_k,
    )
    return next_tokens, logits, pools


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "quant", "interpret", "top_k", "top_p",
                     "approx_top_k", "page_size"),
    donate_argnames=("pools",),  # in-place KV scatter: without donation the
    # whole pool is copied every step (measured 15x decode slowdown)
)
def decode_step(
    params, tokens, pools, block_tables, kv_lens,
    cfg: LlamaConfig, quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    temperature: Optional[jax.Array] = None,
    sample_key: Optional[jax.Array] = None,
    top_k: int = 0, top_p: float = 0.0,
    approx_top_k: bool = True,
    page_size: Optional[int] = None,
):
    return decode_core(
        params, tokens, pools, block_tables, kv_lens, cfg, quant, interpret,
        page_size=page_size,
        temperature=temperature, sample_key=sample_key,
        top_k=top_k, top_p=top_p, approx_top_k=approx_top_k,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "quant", "interpret", "top_k", "top_p",
                     "approx_top_k", "page_size", "n_steps"),
    donate_argnames=("pools",),
)
def decode_multi_step(
    params, tokens, pools, block_tables, kv_lens,
    cfg: LlamaConfig, quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    temperature: Optional[jax.Array] = None,
    sample_base: Optional[jax.Array] = None,  # PRNGKey; fold_in in-scan
    step0: Optional[jax.Array] = None,  # int32 scalar: first step's count
    top_k: int = 0, top_p: float = 0.0,
    approx_top_k: bool = True,
    page_size: Optional[int] = None,
    n_steps: int = 2,
):
    """Multi-step scheduling: `n_steps` autoregressive decode iterations
    in ONE dispatch, rolled into a device-side lax.scan — the host loop
    pays one dispatch + one token fetch per WINDOW instead of per token
    (the tunnel/dispatch+sync tax dominates small-model decode; a
    colocated host still saves the per-step sync stall).

    Contract: `kv_lens` is the length after the FIRST inner step (the
    engine pre-extends pages by n_steps; inner step i uses kv_lens + i).
    Sampling keys are fold_in(sample_base, step0 + i) — exactly the
    per-step engine's schedule, so streams are token-identical.
    Returns ((n_steps, b) tokens, pools)."""

    def body(carry, i):
        tokens, pools = carry
        key = None
        if sample_base is not None:
            key = jax.random.fold_in(sample_base, step0 + i)
        nt, _, pools = decode_core(
            params, tokens, pools, block_tables, kv_lens + i, cfg, quant,
            interpret, page_size=page_size,
            temperature=temperature, sample_key=key,
            top_k=top_k, top_p=top_p, approx_top_k=approx_top_k,
        )
        return (nt[:, None], pools), nt

    (_, pools), toks = jax.lax.scan(
        body, (tokens, pools), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return toks, pools


def verify_core(
    params,
    tokens,  # (b, L) int32 — [last_sampled, draft_1, ..., draft_{L-1}]
    pools,
    block_tables,  # (b, max_pages) int32
    kv_lens,  # (b,) int32 — seq length AFTER this step (cur + L)
    cfg: LlamaConfig,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    axis_name: Optional[str] = None,  # TP axis inside shard_map
    ep_axis: Optional[str] = None,  # EP axis: MoE experts sharded, GShard
    # blocks exchanged by all_to_all (parallel/ep_serve.py)
    page_size: Optional[int] = None,  # true tokens/page when pools are
    # stored PADDED (quantized small pages, ops/paged.py padded mode)
    sp_batch: bool = False,  # split each per-layer psum into
    # reduce-scatter + all-gather over the BATCH axis (decode's sequence-
    # parallel analog): the residual stream lives batch-sharded between
    # sharded regions, so XLA can overlap each reduce-scatter with the
    # following norm and each all-gather with the next layer's QKV matmul
    # over ICI. Comm volume is identical to the two psums (an allreduce IS
    # RS+AG); the win is overlap structure. Requires b % tp == 0.
):
    """Speculative-decoding verification: one batched multi-token step.
    Appends all L input tokens' KV and returns logits at every position
    (b, L, vocab) — the target model's greedy continuation g_i after
    consuming inputs x_0..x_i. The engine accepts the longest draft prefix
    with d_i == g_{i-1} and truncates the cache past the accepted region
    (rejected-draft KV is garbage beyond kv_len and gets overwritten).

    Greedy-exactness caveat: verify logits equal sequential decode logits
    in exact arithmetic, and on identical pools the L=1 and L>1 kernels
    were measured bitwise-identical on chip — but the bf16 activation
    matmuls producing k/v round differently for (b, L) vs (b, 1) batch
    shapes, so pool bytes (and thus argmax TIES on knife-edge logits,
    e.g. degenerate repeating contexts on tiny random models) can flip
    between the speculative and plain streams. Same caveat as every
    production speculative-decoding implementation.
    """
    b, L = tokens.shape
    n_layers = pools["k"].shape[0]
    x = params["embed"][jnp.clip(tokens, 0, cfg.vocab_size - 1)]
    cos, sin = rotary_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)
    # inactive slots (kv_len 0) must have block-table rows pointing at the
    # trash page (engine guarantees this) so the clamped write position 0
    # cannot corrupt live pages
    append_pos = jnp.maximum(kv_lens - L, 0)
    positions = append_pos[:, None] + jnp.arange(L, dtype=jnp.int32)[None]

    sp = bool(sp_batch) and axis_name is not None
    if sp and "router" in params["layers"]:
        sp = False  # MoE MLP has its own all_to_all structure; keep psums
    if sp:
        tp_n = jax.lax.axis_size(axis_name)
        if b % tp_n:
            sp = False  # batch not divisible: keep plain psums
    if sp:
        # residual stream lives batch-sharded between sharded regions
        idx = jax.lax.axis_index(axis_name)
        x = jax.lax.dynamic_slice_in_dim(x, idx * (b // tp_n), b // tp_n, 0)

    layers_xs, layers_stacked = _split_layer_params(params["layers"])

    def body(carry, xs):
        layer_xs, l = xs
        layer = _layer_view(layer_xs, layers_stacked, l)
        if quant:
            x, kp, vp, ks, vs = carry
        else:
            x, kp, vp = carry
        if sp:
            # all-gather the batch shard back to full rows for the sharded
            # regions (overlappable with this layer's QKV matmul)
            x_full = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
        else:
            x_full = x
        q, k_new, v_new = _attn_qkv(layer, x_full, cfg, cos, sin, positions)
        if quant:
            kp, vp, ks, vs = paged_append(
                kp, vp, k_new, v_new, block_tables, append_pos,
                k_scales=ks, v_scales=vs, layer_idx=l, interpret=interpret,
                page_size=page_size, mode="decode",
            )
            o, _ = paged_attention(
                q, kp, vp, block_tables, kv_lens, causal=True,
                k_scales=ks, v_scales=vs, layer_idx=l, interpret=interpret,
                page_size=page_size,
            )
        else:
            kp, vp = paged_append(
                kp, vp, k_new, v_new, block_tables, append_pos,
                layer_idx=l, interpret=interpret, page_size=page_size,
                mode="decode",
            )
            o, _ = paged_attention(
                q, kp, vp, block_tables, kv_lens, causal=True,
                layer_idx=l, interpret=interpret, page_size=page_size,
            )
        o = o.reshape(b, L, cfg.n_heads * cfg.head_dim)
        partial = _proj(o, layer["wo"])
        if sp:
            # reduce-scatter instead of psum: the sum lands batch-sharded,
            # the residual add + next norm run on 1/tp of the rows, and
            # the collective can overlap the norm
            x = x + jax.lax.psum_scatter(
                partial, axis_name, scatter_dimension=0, tiled=True
            )
            h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
            h = jax.lax.all_gather(h, axis_name, axis=0, tiled=True)
            gate = _proj(h, layer["w_gate"])
            up = _proj(h, layer["w_up"])
            mlp_partial = _proj(jax.nn.silu(gate) * up, layer["w_down"])
            x = x + jax.lax.psum_scatter(
                mlp_partial, axis_name, scatter_dimension=0, tiled=True
            )
        else:
            if axis_name is not None:
                partial = jax.lax.psum(partial, axis_name)
            x = x + partial
            x = _mlp(layer, x, cfg, axis_name=axis_name, ep_axis=ep_axis)
        carry = (x, kp, vp, ks, vs) if quant else (x, kp, vp)
        return carry, None

    carry0 = (
        (x, pools["k"], pools["v"], pools["k_s"], pools["v_s"])
        if quant
        else (x, pools["k"], pools["v"])
    )
    carry, _ = jax.lax.scan(
        body, carry0, (layers_xs, jnp.arange(n_layers, dtype=jnp.int32))
    )
    x = carry[0]
    if sp:
        x = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = _proj(x.reshape(b * L, -1), params["lm_head"])
    logits = logits.reshape(b, L, -1).astype(jnp.float32)
    if axis_name is not None:
        # vocab-sharded head -> full logits on every device
        logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    if quant:
        pools = dict(k=carry[1], v=carry[2], k_s=carry[3], v_s=carry[4])
    else:
        pools = dict(k=carry[1], v=carry[2])
    return logits, pools


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "quant", "interpret", "page_size"),
    donate_argnames=("pools",),
)
def verify_step(
    params, tokens, pools, block_tables, kv_lens,
    cfg: LlamaConfig, quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    page_size: Optional[int] = None,
):
    return verify_core(
        params, tokens, pools, block_tables, kv_lens, cfg, quant, interpret,
        page_size=page_size,
    )


def draft_prompt_lookup(ctx: List[int], n_draft: int, ngram: int = 3) -> List[int]:
    """Model-free drafting (prompt lookup): find the latest earlier
    occurrence of the context's final `ngram` and propose the tokens that
    followed it. Bad proposals cost nothing — the verifier rejects them and
    the step still emits >= 1 token."""
    if n_draft <= 0:
        return []
    if len(ctx) > ngram:
        pat = ctx[-ngram:]
        for s in range(len(ctx) - ngram - 1, -1, -1):
            if ctx[s : s + ngram] == pat:
                cont = ctx[s + ngram : s + ngram + n_draft]
                if cont:
                    return (cont + [ctx[-1]] * (n_draft - len(cont)))[:n_draft]
    return [ctx[-1]] * n_draft


def prefill_core(
    params,
    tokens,  # (1, S) int32, padded to bucket S
    true_len,  # () int32
    pools,
    bt_row,  # (1, n_append_pages) int32: logical->physical incl. trash tail
    cfg: LlamaConfig,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    page_size: Optional[int] = None,
):
    """Prefill one request: dense causal attention + paged KV write.
    Returns (first_token, logits_last, pools)."""
    s = tokens.shape[1]
    L = pools["k"].shape[0]
    x = params["embed"][jnp.clip(tokens, 0, cfg.vocab_size - 1)]
    positions = jnp.arange(s, dtype=jnp.int32)[None]
    cos, sin = rotary_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)
    kv_lens = true_len[None] if true_len.ndim == 0 else true_len
    zero = jnp.zeros((1,), jnp.int32)

    layers_xs, layers_stacked = _split_layer_params(params["layers"])

    def body(carry, xs):
        layer_xs, l = xs
        layer = _layer_view(layer_xs, layers_stacked, l)
        if quant:
            x, kp, vp, ks, vs = carry
        else:
            x, kp, vp = carry
        q, k_new, v_new = _attn_qkv(layer, x, cfg, cos, sin, positions)
        o, _ = flash_fwd(
            q.swapaxes(1, 2), k_new.swapaxes(1, 2), v_new.swapaxes(1, 2),
            causal=True, kv_lens=kv_lens, interpret=interpret,
        )
        o = o.swapaxes(1, 2).reshape(1, s, cfg.n_heads * cfg.head_dim)
        if quant:
            kp, vp, ks, vs = paged_append(
                kp, vp, k_new, v_new, bt_row, zero,
                k_scales=ks, v_scales=vs, layer_idx=l, interpret=interpret,
                page_size=page_size,
            )
        else:
            kp, vp = paged_append(
                kp, vp, k_new, v_new, bt_row, zero,
                layer_idx=l, interpret=interpret, page_size=page_size,
            )
        x = x + _proj(o, layer["wo"])
        x = _mlp(layer, x, cfg)
        carry = (x, kp, vp, ks, vs) if quant else (x, kp, vp)
        return carry, None

    carry0 = (
        (x, pools["k"], pools["v"], pools["k_s"], pools["v_s"])
        if quant
        else (x, pools["k"], pools["v"])
    )
    carry, _ = jax.lax.scan(
        body, carry0, (layers_xs, jnp.arange(L, dtype=jnp.int32))
    )
    x = carry[0]
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last = x[0, jnp.maximum(true_len - 1, 0)]
    logits = _proj(last[None], params["lm_head"]).astype(jnp.float32)[0]
    first_token = jnp.argmax(logits).astype(jnp.int32)
    if quant:
        pools = dict(k=carry[1], v=carry[2], k_s=carry[3], v_s=carry[4])
    else:
        pools = dict(k=carry[1], v=carry[2])
    return first_token, logits, pools


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "quant", "interpret", "page_size"),
    donate_argnames=("pools",),
)
def prefill_step(
    params, tokens, true_len, pools, bt_row,
    cfg: LlamaConfig, quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    page_size: Optional[int] = None,
):
    return prefill_core(
        params, tokens, true_len, pools, bt_row, cfg, quant, interpret,
        page_size=page_size,
    )


def prefill_chunk_core(
    params,
    tokens,  # (P, C) int32 — one fixed-size chunk per in-flight prompt row
    n_prior,  # (P,) int32: tokens already in the cache per row
    n_valid,  # (P,) int32: valid tokens per chunk row (0 = idle lane)
    pools,
    bt,  # (P, max_pages) int32: per-row block table incl. trash tail
    cfg: LlamaConfig,
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    axis_name: Optional[str] = None,  # TP axis inside shard_map
    ep_axis: Optional[str] = None,  # EP axis (parallel/ep_serve.py)
    page_size: Optional[int] = None,
):
    """One step of incremental prefill for P simultaneous prompts: append
    each row's chunk KV into its pages, then paged attention of the chunk
    queries over cache[0 : n_prior + C] (causal within the chunk via the
    kernel's trailing-query geometry).

    Every chunk compiles to ONE executable shape regardless of prompt
    length or how many rows are live, and the engine interleaves chunks
    with decode steps so long prompts never monopolize the chip
    (vLLM-style chunked prefill, batched so admission bursts do not
    serialize). Padded tail positions and idle lanes (n_valid = 0, block
    table all trash) write garbage KV that nothing ever attends to.
    Returns (logits_of_last_valid_token (P, vocab), pools)."""
    P, C = tokens.shape
    L = pools["k"].shape[0]
    x = params["embed"][jnp.clip(tokens, 0, cfg.vocab_size - 1)]
    n_prior = jnp.reshape(n_prior, (P,))
    n_valid = jnp.reshape(n_valid, (P,))
    positions = n_prior[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
    cos, sin = rotary_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)
    kv_lens = n_prior + C
    append_pos = n_prior

    layers_xs, layers_stacked = _split_layer_params(params["layers"])

    def body(carry, xs):
        layer_xs, l = xs
        layer = _layer_view(layer_xs, layers_stacked, l)
        if quant:
            x, kp, vp, ks, vs = carry
        else:
            x, kp, vp = carry
        q, k_new, v_new = _attn_qkv(layer, x, cfg, cos, sin, positions)
        if quant:
            kp, vp, ks, vs = paged_append(
                kp, vp, k_new, v_new, bt, append_pos,
                k_scales=ks, v_scales=vs, layer_idx=l, interpret=interpret,
                page_size=page_size,
            )
            o, _ = paged_attention(
                q, kp, vp, bt, kv_lens, causal=True,
                k_scales=ks, v_scales=vs, layer_idx=l, interpret=interpret,
                page_size=page_size,
            )
        else:
            kp, vp = paged_append(
                kp, vp, k_new, v_new, bt, append_pos,
                layer_idx=l, interpret=interpret, page_size=page_size,
            )
            o, _ = paged_attention(
                q, kp, vp, bt, kv_lens, causal=True,
                layer_idx=l, interpret=interpret, page_size=page_size,
            )
        o = o.reshape(P, C, cfg.n_heads * cfg.head_dim)
        partial = _proj(o, layer["wo"])
        if axis_name is not None:
            partial = jax.lax.psum(partial, axis_name)
        x = x + partial
        x = _mlp(layer, x, cfg, axis_name=axis_name, ep_axis=ep_axis)
        carry = (x, kp, vp, ks, vs) if quant else (x, kp, vp)
        return carry, None

    carry0 = (
        (x, pools["k"], pools["v"], pools["k_s"], pools["v_s"])
        if quant
        else (x, pools["k"], pools["v"])
    )
    carry, _ = jax.lax.scan(
        body, carry0, (layers_xs, jnp.arange(L, dtype=jnp.int32))
    )
    x = carry[0]
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    last_idx = jnp.maximum(n_valid - 1, 0)  # (P,)
    last = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)[:, 0]
    logits = _proj(last, params["lm_head"]).astype(jnp.float32)  # (P, V)
    if axis_name is not None:
        logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    if quant:
        pools = dict(k=carry[1], v=carry[2], k_s=carry[3], v_s=carry[4])
    else:
        pools = dict(k=carry[1], v=carry[2])
    return logits, pools


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "quant", "interpret", "page_size"),
    donate_argnames=("pools",),
)
def prefill_chunk_step(
    params, tokens, n_prior, n_valid, pools, bt,
    cfg: LlamaConfig, quant: Optional[str] = None,
    interpret: Optional[bool] = None,
    page_size: Optional[int] = None,
):
    return prefill_chunk_core(
        params, tokens, n_prior, n_valid, pools, bt, cfg, quant, interpret,
        page_size=page_size,
    )


class DecodeEngine:
    """Continuous batching: admit, prefill, batched decode, retire."""

    def __init__(
        self,
        params,
        cfg: LlamaConfig,
        ecfg: EngineConfig,
        dtype=jnp.bfloat16,
        interpret: Optional[bool] = None,
        mesh=None,  # jax.sharding.Mesh with a "tp" axis: serve TP-sharded
    ):
        self.params = params
        # decode consumes per-layer weights through the zero-copy stacked
        # matmul (same buffers, no duplication); prefill keeps the plain
        # layout where XLA's fused slice+dot is already MXU-bound
        from xf_flash_attention_cutlass_tpu.models.llama import (
            pack_params_for_decode,
        )

        self._decode_params = pack_params_for_decode(params)
        self.cfg = cfg
        ecfg = effective_engine_config(ecfg)
        self.ecfg = ecfg
        self.interpret = interpret
        # dp x tp mesh: each data-parallel replica owns a disjoint slice of
        # the batch slots AND of the page pool (pool page axis sharded over
        # "dp"); all host-side page ids are replica-LOCAL
        self.dp = 1
        self.ep = 1
        if mesh is not None and "dp" in mesh.shape:
            self.dp = int(mesh.shape["dp"])
        if mesh is not None and "ep" in mesh.shape:
            self.ep = int(mesh.shape["ep"])
        if self.ep > 1 and "router" not in params["layers"]:
            raise ValueError(
                "mesh has ep>1 but params are not a MoE model (no router); "
                "expert parallelism shards the expert axis of MoE FFNs"
            )
        if self.ep > 1 and cfg.n_experts % self.ep:
            raise ValueError(
                f"n_experts {cfg.n_experts} must be divisible by ep={self.ep}"
            )
        # Host-side bookkeeping treats every (dp, ep) pair as one replica:
        # an ep shard IS a dp replica for all non-expert tensors — it owns
        # its own batch slots, page-pool slice and block tables
        # (parallel/ep_serve.py); only the PARAM sharding differs (expert
        # leaves over "ep", everything else replicated across it).
        # Replica index r = dp_idx * ep + ep_idx, matching the row-major
        # (dp, ep) batch-axis tuple in the shard_map specs.
        self.n_replicas = self.dp * self.ep
        if self.n_replicas > 1:
            for name, val in (
                ("max_batch", ecfg.max_batch),
                ("num_pages", ecfg.num_pages),
                ("prefill_lanes", ecfg.prefill_lanes),
            ):
                if val % self.n_replicas:
                    raise ValueError(
                        f"{name} ({val}) must divide dp*ep="
                        f"{self.n_replicas}"
                    )
        num_pages_local = ecfg.num_pages // self.n_replicas
        if self.n_replicas > 1:
            from xf_flash_attention_cutlass_tpu.serve.allocator import (
                DpPagePools,
            )

            self.pool = DpPagePools(
                self.n_replicas, num_pages_local, ecfg.page_size,
                ecfg.max_batch // self.n_replicas,
            )
        else:
            self.pool = PagePool(
                ecfg.num_pages, ecfg.page_size, ecfg.max_batch
            )
        L = cfg.n_layers
        # +1 physical page PER REPLICA SHARD: the trash page absorbing
        # padded prefill writes (local id num_pages_local in every shard)
        shape = (
            L, self.n_replicas * (num_pages_local + 1), cfg.n_kv_heads,
            ecfg.page_size, cfg.head_dim,
        )
        self.trash_page = num_pages_local
        if ecfg.kv_quant:
            if (
                ecfg.prefill_chunk
                and ecfg.page_size % 128 == 0
                and ecfg.prefill_chunk % 128
            ):
                # tight quantized pools: the Pallas prefill append writes
                # 128-lane scale windows at chunk offsets — misaligned
                # offsets would write scales to the WRONG columns
                # (silently wrong tokens, found in round 5). Small padded
                # pages route by page alignment and fall back safely.
                raise ValueError(
                    f"kv_quant with page_size={ecfg.page_size} needs "
                    f"prefill_chunk to be a multiple of 128 (got "
                    f"{ecfg.prefill_chunk}): quantized prefill appends "
                    "write 128-lane-aligned scale windows"
                )
            # stored layout (ops/paged.py padded-column mode): value rows
            # padded to the int8/fp8 DMA sublane tile (32), scale-plane
            # lanes to 128, so small pages (the reference's block-16
            # geometry) run the Pallas decode paths instead of per-call
            # pool copies. page_size flows to every step as the TRUE
            # page; for page % 128 == 0 both pads are no-ops.
            dma_rows = -(-ecfg.page_size // 32) * 32
            scale_lanes = -(-dma_rows // 128) * 128
            vshape = shape[:-2] + (dma_rows, cfg.head_dim)
            sshape = shape[:-2] + (scale_lanes,)
            if ecfg.page_size % 128:
                # Decode AND prefill appends are Pallas-pathed on the
                # padded layout (prefill via storage-coordinate page
                # groups, ops/paged_append._prefill_append_padded) as
                # long as chunk/bucket offsets page-align; the remaining
                # cost is the padded-pool byte tax (see RESULTS_r4).
                if ecfg.prefill_chunk and (
                    ecfg.prefill_chunk % ecfg.page_size
                ):
                    logger.warning(
                        "prefill_chunk=%d is not a multiple of "
                        "page_size=%d: quantized small-page prefill "
                        "appends lose the Pallas path and scatter a "
                        "pool copy per chunk — align prefill_chunk to "
                        "the page size",
                        ecfg.prefill_chunk, ecfg.page_size,
                    )
                logger.info(
                    "quantized KV with page_size=%d stores %d value rows "
                    "/ %d scale lanes per page%s; use page_size=256 for "
                    "production throughput",
                    ecfg.page_size, dma_rows, scale_lanes,
                    (" — a ~2x HBM byte tax on decode reads (padded "
                     "values)") if dma_rows != ecfg.page_size else
                    " (tight values, page-granularity DMA only)",
                )
            vdt = jnp.int8 if ecfg.kv_quant == "int8" else jnp.float8_e4m3fn
            self.pools = dict(
                k=jnp.zeros(vshape, vdt),
                v=jnp.zeros(vshape, vdt),
                k_s=jnp.zeros(sshape, jnp.float32),
                v_s=jnp.zeros(sshape, jnp.float32),
            )
        else:
            self.pools = dict(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))
        # mesh mode: weights/pools sharded once at init (heads + KV heads
        # over "tp"); every step function runs under shard_map with two
        # psums per layer and a vocab all_gather (parallel/tp_serve.py).
        # Host-side bookkeeping (allocator, block tables) is unchanged —
        # pages are replicated metadata, only tensors shard.
        self.mesh = mesh
        if mesh is not None:
            if not ecfg.prefill_chunk:
                raise ValueError(
                    "mesh mode serves prefill through the chunked path: "
                    "set EngineConfig.prefill_chunk"
                )
            from xf_flash_attention_cutlass_tpu.parallel.tp import (
                TP, shard_params,
            )
            from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
                shard_pools,
            )

            if cfg.n_kv_heads % mesh.shape[TP]:
                raise ValueError(
                    f"n_kv_heads {cfg.n_kv_heads} must divide tp="
                    f"{mesh.shape[TP]}"
                )
            if self.ep > 1:
                # expert leaves shard their expert axis over "ep"; all
                # other params follow the tp specs and replicate over ep
                from jax.sharding import NamedSharding
                from xf_flash_attention_cutlass_tpu.parallel.ep_serve import (
                    ep_param_partition_specs,
                )

                def _put_ep(tree):
                    specs = ep_param_partition_specs(tree, tp=True)
                    return jax.tree_util.tree_map(
                        lambda x, s: jax.device_put(
                            x, NamedSharding(mesh, s)
                        ),
                        tree, specs,
                    )

                self.params = _put_ep(self.params)
                self._decode_params = _put_ep(self._decode_params)
            else:
                self.params = shard_params(self.params, mesh)
                self._decode_params = shard_params(self._decode_params, mesh)
            self.pools = shard_pools(
                self.pools, mesh, dp_axis=self.dp > 1,
                ep_axis=self.ep > 1,
            )
        self.queue: deque = deque()
        self.active: Dict[int, dict] = {}  # slot -> request state
        self.results: Dict[int, List[int]] = {}
        self._sample_base = jax.random.PRNGKey(ecfg.sample_seed)
        self._step_count = 0
        # in-flight chunked prefills: one slot per lane; each engine step
        # advances every busy lane by one chunk in a single batched call
        self._prefills: List[Optional[dict]] = [None] * ecfg.prefill_lanes
        # shared-prefix cache: prefix_id -> dict(pages, shared_len, tokens,
        # remainder); slot -> prefix_id for live requests
        self._prefixes: Dict[str, dict] = {}
        self._slot_prefix: Dict[int, str] = {}
        # tokens already emitted by requests that were later preempted:
        # a preempted request requeues with prompt+generated (its context)
        # and a remaining-token budget, so at finish its final `generated`
        # holds only the post-resume tokens — results must prepend these
        # (kept per-request-id; multi-preemption accumulates in order)
        self._preempt_emitted: Dict[int, List[int]] = {}
        # serving observability (SURVEY §5: the reference has none; a
        # production engine needs at least these counters)
        self.stats: Dict[str, int] = dict(
            steps=0, decode_steps=0, spec_steps=0, prefill_chunks=0,
            tokens_emitted=0, drafts_proposed=0, drafts_accepted=0,
            requests_admitted=0, requests_finished=0, preemptions=0,
        )

    def add_request(
        self,
        request_id: int,
        prompt: List[int],
        max_new_tokens: int,
        temperature: float = 0.0,  # 0 = greedy; >0 samples (top_k/top_p
        # truncation is engine-wide, EngineConfig)
        prefix_id: Optional[str] = None,  # shared prefix (register_prefix)
    ):
        if prefix_id is not None:
            if not self.ecfg.prefill_chunk:
                raise ValueError(
                    "prefix caching requires chunked prefill "
                    "(EngineConfig.prefill_chunk)"
                )
            if prefix_id not in self._prefixes:
                raise KeyError(f"unknown prefix {prefix_id!r}")
        self.queue.append(
            (request_id, list(prompt), max_new_tokens, temperature, prefix_id)
        )

    def register_prefix(self, prefix_id: str, tokens: List[int]) -> None:
        """Prefill a shared prefix (e.g. a system prompt) ONCE into its own
        pages; later requests admitted with this prefix_id attend to those
        pages through their block tables without re-computing or re-storing
        the prefix KV. Only whole pages are shared; the tail remainder
        (len % page_size tokens) is prepended to each request's own prompt.
        Requires chunked prefill. Free with release_prefix."""
        if not self.ecfg.prefill_chunk:
            raise ValueError("prefix caching requires EngineConfig.prefill_chunk")
        if prefix_id in self._prefixes:
            raise ValueError(f"prefix {prefix_id!r} already registered")
        page = self.ecfg.page_size
        shared_pages = len(tokens) // page
        shared_len = shared_pages * page
        if self.n_replicas > 1:
            # replicate the prefix into EVERY replica's pool shard: each
            # replica gets its own (local-id) page reservation and runs
            # the same prefill chunks into it, so later requests on any
            # replica attend to the prefix with zero cross-dp traffic
            pages_by_replica = (
                self.pool.prefix_alloc_all(shared_pages)
                if shared_pages else [[] for _ in range(self.n_replicas)]
            )
        else:
            one = self.pool.prefix_alloc(shared_pages) if shared_pages else []
            pages_by_replica = None if one is None else [one]
        if pages_by_replica is None:
            raise RuntimeError("page pool cannot hold the prefix")
        # prefill the shared tokens chunk by chunk into the prefix pages
        C = self.ecfg.prefill_chunk
        mp = self.ecfg.max_pages_per_seq
        if self.n_replicas > 1:
            # one active lane per replica (the lane-batched chunk step
            # shards lane rows over the replica axes): every replica
            # prefills the same chunk into its own prefix pages. Idle
            # lanes keep n_valid=0 and trash tables, exactly like normal
            # prefill idling.
            P = self.ecfg.prefill_lanes
            lanes_local = P // self.n_replicas
            bt_rows = np.full((P, mp), self.trash_page, np.int32)
            act = []
            for r in range(self.n_replicas):
                lane = r * lanes_local
                bt_rows[lane, : shared_pages] = pages_by_replica[r]
                act.append(lane)
            pos = 0
            while pos < shared_len:
                chunk = tokens[pos : pos + C]
                n_valid = len(chunk)
                buf = np.zeros((P, C), np.int32)
                n_prior = np.zeros((P,), np.int32)
                nv = np.zeros((P,), np.int32)
                for lane in act:
                    buf[lane, :n_valid] = chunk
                    n_prior[lane] = pos
                    nv[lane] = n_valid
                _, self.pools = self._run_prefill_chunk(
                    jnp.asarray(buf), jnp.asarray(n_prior),
                    jnp.asarray(nv), jnp.asarray(bt_rows),
                )
                pos += n_valid
        else:
            bt_row = np.full((1, mp), self.trash_page, np.int32)
            bt_row[0, : shared_pages] = pages_by_replica[0]
            pos = 0
            while pos < shared_len:
                chunk = tokens[pos : pos + C]
                n_valid = len(chunk)
                buf = np.zeros((1, C), np.int32)
                buf[0, :n_valid] = chunk
                _, self.pools = self._run_prefill_chunk(
                    jnp.asarray(buf),
                    jnp.asarray(pos, jnp.int32),
                    jnp.asarray(n_valid, jnp.int32),
                    jnp.asarray(bt_row),
                )
                pos += n_valid
        self._prefixes[prefix_id] = dict(
            pages_by_replica=[list(p) for p in pages_by_replica],
            n_pages=shared_pages,
            shared_len=shared_len,
            tokens=list(tokens),
            remainder=list(tokens[shared_len:]),
        )

    def release_prefix(self, prefix_id: str) -> None:
        """Return a prefix's pages to the pool (no live request may still
        reference it)."""
        if prefix_id in self._slot_prefix.values():
            raise RuntimeError(f"prefix {prefix_id!r} still in use")
        pf = self._prefixes.pop(prefix_id)
        if pf["n_pages"]:
            if self.n_replicas > 1:
                self.pool.prefix_free_all(pf["pages_by_replica"])
            else:
                self.pool.prefix_free(pf["pages_by_replica"][0])

    # ---- internals -------------------------------------------------------
    def _run_prefill_chunk(self, tokens, n_prior, n_valid, bt):
        """prefill_chunk_step, routed through the TP mesh when present."""
        if self.mesh is not None:
            from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
                tp_prefill_chunk_step_jit,
            )

            return tp_prefill_chunk_step_jit(
                self._decode_params, tokens, n_prior, n_valid, self.pools,
                bt, cfg=self.cfg, mesh=self.mesh, quant=self.ecfg.kv_quant,
                interpret=self.interpret, dp_axis=self.dp > 1,
                ep_axis=self.ep > 1,
                page_size=self.ecfg.page_size,
            )
        return prefill_chunk_step(
            self._decode_params, tokens, n_prior, n_valid, self.pools, bt,
            self.cfg, self.ecfg.kv_quant, self.interpret,
            page_size=self.ecfg.page_size,
        )

    def _run_decode(self, tokens, bt, kv_lens, sampling):
        if self.mesh is not None:
            from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
                tp_decode_step_jit,
            )

            # mesh mode always passes concrete sampling arrays (a None in
            # a shard_map arg slot breaks the spec pytree); zero temps are
            # the greedy rows, and the same key on every device keeps
            # sampled tokens identical across shards
            temps = sampling.get(
                "temperature",
                jnp.zeros((self.ecfg.max_batch,), jnp.float32),
            )
            key = sampling.get(
                "sample_key",
                jax.random.fold_in(self._sample_base, self._step_count),
            )
            # sp_batch: per-layer RS+AG instead of psums — the residual
            # stream stays batch-sharded so the collectives can overlap
            # norms/matmuls over ICI. verify_core falls back to plain
            # psums by itself when b % tp != 0 or the model is MoE, so
            # enabling it unconditionally is safe (and bitwise-identical:
            # same pairwise adds, different schedule).
            return tp_decode_step_jit(
                self._decode_params, tokens, self.pools, bt, kv_lens,
                cfg=self.cfg, mesh=self.mesh, quant=self.ecfg.kv_quant,
                interpret=self.interpret, temperature=temps, sample_key=key,
                top_k=self.ecfg.top_k, top_p=self.ecfg.top_p,
                approx_top_k=self.ecfg.approx_top_k,
                dp_axis=self.dp > 1, ep_axis=self.ep > 1, sp_batch=True,
                page_size=self.ecfg.page_size,
            )
        return decode_step(
            self._decode_params, tokens, self.pools, bt, kv_lens,
            self.cfg, self.ecfg.kv_quant, self.interpret,
            page_size=self.ecfg.page_size, **sampling,
        )

    def _run_verify(self, tokens, bt, kv_lens):
        if self.mesh is not None:
            from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
                tp_verify_step_jit,
            )

            return tp_verify_step_jit(
                self._decode_params, tokens, self.pools, bt, kv_lens,
                cfg=self.cfg, mesh=self.mesh, quant=self.ecfg.kv_quant,
                interpret=self.interpret, dp_axis=self.dp > 1,
                ep_axis=self.ep > 1,
                sp_batch=True, page_size=self.ecfg.page_size,
            )
        return verify_step(
            self._decode_params, tokens, self.pools, bt, kv_lens,
            self.cfg, self.ecfg.kv_quant, self.interpret,
            page_size=self.ecfg.page_size,
        )

    def _bucket(self, n: int) -> int:
        # min 32: the prefill append writes value windows of up to 32 rows
        # (int8/fp8 sublane tile), so the padded length must divide evenly
        b = 32
        while b < n:
            b *= 2
        return min(b, self.ecfg.max_seq)

    def _start_chunked_prefill(self, lane: int) -> bool:
        rid, prompt, max_new, temp, prefix_id = self.queue[0]
        if self.n_replicas > 1:
            # lane rows shard over the replica axes in the batched chunk
            # step: lane l prefills into replica l // lanes_local's shard
            lanes_local = self.ecfg.prefill_lanes // self.n_replicas
            replica = lane // lanes_local
            if prefix_id is not None:
                pf = self._prefixes[prefix_id]
                todo = pf["remainder"] + prompt
                base = pf["shared_len"]
                total = base + len(todo)
                slot = self.pool.admit_prefixed_replica(
                    replica, rid, pf["n_pages"], total, total + max_new
                )
            else:
                todo, base = prompt, 0
                slot = self.pool.admit_replica(
                    replica, rid, len(todo), len(todo) + max_new
                )
            if slot < 0:
                return False
            self.queue.popleft()
            if prefix_id is not None:
                self._slot_prefix[slot] = prefix_id
            self._prefills[lane] = dict(
                slot=slot, id=rid, prompt=prompt, todo=todo, base=base,
                done=0, max_new=max_new, temperature=temp,
                prefix_id=prefix_id,
            )
            return True
        if prefix_id is not None:
            pf = self._prefixes[prefix_id]
            todo = pf["remainder"] + prompt  # tokens this request computes
            base = pf["shared_len"]
            total = base + len(todo)
            slot = self.pool.admit_prefixed(
                rid, pf["n_pages"], total, total + max_new
            )
        else:
            todo, base = prompt, 0
            slot = self.pool.admit(rid, len(todo), len(todo) + max_new)
        if slot < 0:
            return False
        self.queue.popleft()
        if prefix_id is not None:
            self._slot_prefix[slot] = prefix_id
        self._prefills[lane] = dict(
            slot=slot, id=rid, prompt=prompt, todo=todo, base=base,
            done=0, max_new=max_new, temperature=temp, prefix_id=prefix_id,
        )
        return True

    def _prefix_pages(self, pid: str, slot: int):
        """The prefix page ids visible to `slot` — its replica's copy
        under dp (page ids are replica-LOCAL)."""
        pbr = self._prefixes[pid]["pages_by_replica"]
        if len(pbr) == 1:
            return pbr[0]
        return pbr[slot // self.pool.mb_local]

    def _bt_row_with_prefix(self, slot: int) -> np.ndarray:
        """This slot's full block-table row: own pages from the allocator
        (already offset past the shared region), shared-prefix pages
        overlaid, trash elsewhere."""
        mp = self.ecfg.max_pages_per_seq
        bt, _, _ = self.pool.build_block_tables(mp)
        row = bt[slot].copy()
        seq = self.pool.seq_len(slot)
        n_pages = cdiv(max(seq, 1), self.ecfg.page_size)
        row[n_pages:] = self.trash_page
        pid = self._slot_prefix.get(slot)
        if pid is not None:
            pages = self._prefix_pages(pid, slot)
            row[: len(pages)] = pages
        return row[None]

    def _advance_chunked_prefill(self):
        """Advance every busy prefill lane by one chunk in ONE batched
        step; activate requests whose prompt completed."""
        P = self.ecfg.prefill_lanes
        C = self.ecfg.prefill_chunk
        mp = self.ecfg.max_pages_per_seq
        tokens = np.zeros((P, C), np.int32)
        n_prior = np.zeros((P,), np.int32)
        n_valid = np.zeros((P,), np.int32)
        bt = np.full((P, mp), self.trash_page, np.int32)
        chunks = [None] * P
        for lane, st in enumerate(self._prefills):
            if st is None:
                continue
            todo, done, base = st["todo"], st["done"], st["base"]
            chunk = todo[done : done + C]
            chunks[lane] = chunk
            tokens[lane, : len(chunk)] = chunk
            n_prior[lane] = base + done
            n_valid[lane] = len(chunk)
            bt[lane] = self._bt_row_with_prefix(st["slot"])[0]
        logits, self.pools = self._run_prefill_chunk(
            jnp.asarray(tokens),
            jnp.asarray(n_prior),
            jnp.asarray(n_valid),
            jnp.asarray(bt),
        )
        logits_np = None  # fetched lazily (only when a lane completes)
        for lane, st in enumerate(self._prefills):
            if st is None:
                continue
            st["done"] += int(n_valid[lane])
            self.stats["prefill_chunks"] += 1
            if st["done"] < len(st["todo"]):
                continue
            if logits_np is None:
                logits_np = np.asarray(logits)
            first = int(np.argmax(logits_np[lane]))
            if st["temperature"] > 0.0:
                key = jax.random.fold_in(
                    self._sample_base, (st["id"] << 8) ^ 0xA5
                )
                first = int(
                    sample_tokens(
                        logits[lane][None],
                        jnp.asarray([st["temperature"]], jnp.float32),
                        key,
                        top_k=self.ecfg.top_k,
                        top_p=self.ecfg.top_p,
                        approx_top_k=self.ecfg.approx_top_k,
                    )[0]
                )
            self.active[st["slot"]] = dict(
                id=st["id"],
                prompt=st["prompt"],
                last_token=first,
                generated=[first],
                max_new=st["max_new"],
                temperature=st["temperature"],
                prefix_id=st["prefix_id"],
            )
            self._prefills[lane] = None
            self.stats["requests_admitted"] += 1
            self.stats["tokens_emitted"] += 1  # prefill emits the 1st token

    def _admit_one(self) -> bool:
        rid, prompt, max_new, temp, prefix_id = self.queue[0]
        assert prefix_id is None  # guarded in add_request
        slot = self.pool.admit(rid, len(prompt), len(prompt) + max_new)
        if slot < 0:
            return False
        self.queue.popleft()
        bucket = self._bucket(len(prompt))
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, : len(prompt)] = prompt
        n_pages = cdiv(len(prompt), self.ecfg.page_size)
        bt, sl, _ = self.pool.build_block_tables(self.ecfg.max_pages_per_seq)
        append_pages = cdiv(bucket, self.ecfg.page_size)
        bt_row = np.full((1, append_pages), self.trash_page, np.int32)
        bt_row[0, :n_pages] = bt[slot, :n_pages]
        first, logits, self.pools = prefill_step(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(len(prompt), jnp.int32),
            self.pools,
            jnp.asarray(bt_row),
            self.cfg,
            self.ecfg.kv_quant,
            self.interpret,
            page_size=self.ecfg.page_size,
        )
        if temp > 0.0:
            key = jax.random.fold_in(self._sample_base, (rid << 8) ^ 0xA5)
            first = sample_tokens(
                logits[None],
                jnp.asarray([temp], jnp.float32),
                key,
                top_k=self.ecfg.top_k,
                top_p=self.ecfg.top_p,
                approx_top_k=self.ecfg.approx_top_k,
            )[0]
        self.active[slot] = dict(
            id=rid,
            prompt=prompt,
            last_token=int(first),
            generated=[int(first)],
            max_new=max_new,
            temperature=temp,
        )
        self.stats["requests_admitted"] += 1
        self.stats["tokens_emitted"] += 1  # prefill emits the first token
        return True

    def step(self) -> Dict[int, List[int]]:
        """Admit + one batched decode step. Returns tokens emitted.

        With ecfg.prefill_chunk set, at most ONE prefill chunk runs per
        step before the decode batch (chunked prefill interleaving);
        otherwise whole prompts are prefilled at admission."""
        if self.ecfg.prefill_chunk:
            for lane in range(self.ecfg.prefill_lanes):
                if not self.queue:
                    break
                busy = sum(st is not None for st in self._prefills)
                if self._prefills[lane] is not None or (
                    len(self.active) + busy >= self.ecfg.max_batch
                ):
                    continue
                if not self._start_chunked_prefill(lane):
                    break
            if any(st is not None for st in self._prefills):
                self._advance_chunked_prefill()
        else:
            while self.queue and len(self.active) < self.ecfg.max_batch:
                if not self._admit_one():
                    break
        emitted: Dict[int, List[int]] = {}
        # retire finished before decoding
        for slot in list(self.active):
            st = self.active[slot]
            done = len(st["generated"]) >= st["max_new"] or (
                st["generated"]
                and st["generated"][-1] == self.ecfg.eos_token
            )
            if done:
                self.results[st["id"]] = (
                    self._preempt_emitted.pop(st["id"], []) + st["generated"]
                )
                self.pool.retire(slot)
                self._slot_prefix.pop(slot, None)
                del self.active[slot]
                self.stats["requests_finished"] += 1
        if not self.active:
            return emitted
        # speculative decoding: greedy-only (acceptance is exact equality
        # with the target's argmax, so output is token-identical to plain
        # greedy decode regardless of draft quality)
        self.stats["steps"] += 1
        if self.ecfg.speculate_k > 1 and all(
            st["temperature"] <= 0.0 for st in self.active.values()
        ):
            self.stats["spec_steps"] += 1
            self._spec_decode(emitted)
            self.stats["tokens_emitted"] += sum(len(v) for v in emitted.values())
            return emitted
        # multi-step window: only when the host has no scheduling work
        # pending (no queue, no prefill lanes) — admissions never wait
        # more than one window, and the per-step path stays bit-identical
        K = self.ecfg.multi_step
        if (
            K <= 1
            or self.queue
            or any(st is not None for st in self._prefills)
        ):
            K = 1
        self.stats["decode_steps"] += K
        # grow each active sequence by the window (the pending tokens' KV)
        for slot in list(self.active):
            if self.pool.extend(slot, K) < 0:
                # OOM: preempt — requeue with the full context so it
                # resumes via prefill once pages free up
                st = self.active.pop(slot)
                self.pool.retire(slot)
                self._slot_prefix.pop(slot, None)
                remaining = st["max_new"] - len(st["generated"])
                self._preempt_emitted[st["id"]] = (
                    self._preempt_emitted.get(st["id"], []) + st["generated"]
                )
                self.queue.appendleft(
                    (st["id"], st["prompt"] + st["generated"], remaining,
                     st["temperature"], st.get("prefix_id"))
                )
                self.stats["preemptions"] += 1
        if not self.active:
            return emitted
        bt, kv_lens, _ = self.pool.build_block_tables(self.ecfg.max_pages_per_seq)
        # inactive rows -> trash page (see decode_step append note)
        for slot in range(self.ecfg.max_batch):
            if slot not in self.active:
                bt[slot, :] = self.trash_page
        # overlay shared-prefix pages (allocator rows leave that region 0)
        for slot, pid in self._slot_prefix.items():
            if slot in self.active:
                pages = self._prefix_pages(pid, slot)
                bt[slot, : len(pages)] = pages
        tokens = np.zeros((self.ecfg.max_batch, 1), np.int32)
        temps = np.zeros((self.ecfg.max_batch,), np.float32)
        for slot, st in self.active.items():
            tokens[slot, 0] = st["last_token"]
            temps[slot] = st["temperature"]
        if K > 1:
            # one dispatch, K autoregressive steps on device; same key
            # schedule as K consecutive per-step calls
            step0 = self._step_count + 1
            self._step_count += K
            kwargs = {}
            if temps.any():
                kwargs = dict(
                    temperature=jnp.asarray(temps),
                    sample_base=self._sample_base,
                    step0=jnp.asarray(step0, jnp.int32),
                    top_k=self.ecfg.top_k,
                    top_p=self.ecfg.top_p,
                    approx_top_k=self.ecfg.approx_top_k,
                )
            # lens after the FIRST inner step (pages were pre-extended
            # by K); inactive rows clamp to 0 like the per-step path
            lens_first = jnp.asarray(np.maximum(kv_lens - (K - 1), 0))
            if self.mesh is not None:
                from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
                    tp_decode_multi_step_jit,
                )

                toks, self.pools = tp_decode_multi_step_jit(
                    self._decode_params, jnp.asarray(tokens), self.pools,
                    jnp.asarray(bt), lens_first,
                    cfg=self.cfg, mesh=self.mesh,
                    quant=self.ecfg.kv_quant, interpret=self.interpret,
                    dp_axis=self.dp > 1, ep_axis=self.ep > 1,
                    sp_batch=True, page_size=self.ecfg.page_size,
                    n_steps=K, **kwargs,
                )
            else:
                toks, self.pools = decode_multi_step(
                    self._decode_params, jnp.asarray(tokens), self.pools,
                    jnp.asarray(bt), lens_first,
                    self.cfg, self.ecfg.kv_quant, self.interpret,
                    page_size=self.ecfg.page_size, n_steps=K, **kwargs,
                )
            toks_np = np.asarray(toks)  # (K, max_batch)
            for slot, st in self.active.items():
                for i in range(K):
                    tok = int(toks_np[i, slot])
                    st["last_token"] = tok
                    st["generated"].append(tok)
                    emitted.setdefault(st["id"], []).append(tok)
                    if (
                        len(st["generated"]) >= st["max_new"]
                        or tok == self.ecfg.eos_token
                    ):
                        # overshoot tokens past done are discarded (they
                        # only ever touched this request's own rows)
                        break
            self.stats["tokens_emitted"] += sum(
                len(v) for v in emitted.values()
            )
            return emitted
        self._step_count += 1
        sampling = {}
        if temps.any():
            sampling = dict(
                temperature=jnp.asarray(temps),
                sample_key=jax.random.fold_in(self._sample_base, self._step_count),
                top_k=self.ecfg.top_k,
                top_p=self.ecfg.top_p,
                approx_top_k=self.ecfg.approx_top_k,
            )
        next_tokens, _, self.pools = self._run_decode(
            jnp.asarray(tokens), jnp.asarray(bt), jnp.asarray(kv_lens),
            sampling,
        )
        next_np = np.asarray(next_tokens)
        for slot, st in self.active.items():
            tok = int(next_np[slot])
            st["last_token"] = tok
            st["generated"].append(tok)
            emitted.setdefault(st["id"], []).append(tok)
        self.stats["tokens_emitted"] += sum(len(v) for v in emitted.values())
        return emitted

    def _spec_decode(self, emitted: Dict[int, List[int]]) -> None:
        """One speculative step: draft L-1 tokens per request (prompt
        lookup), verify the whole batch in a single L-token paged step,
        accept the longest matching prefix + one bonus token (1..L tokens
        per request per step), truncate rejected-draft pages."""
        L = self.ecfg.speculate_k
        # pre-allocate pages for all L candidate positions; roll back after
        for slot in list(self.active):
            if self.pool.extend(slot, L) < 0:
                st = self.active.pop(slot)
                self.pool.retire(slot)
                self._slot_prefix.pop(slot, None)
                remaining = st["max_new"] - len(st["generated"])
                self._preempt_emitted[st["id"]] = (
                    self._preempt_emitted.get(st["id"], []) + st["generated"]
                )
                self.queue.appendleft(
                    (st["id"], st["prompt"] + st["generated"], remaining,
                     st["temperature"], st.get("prefix_id"))
                )
                self.stats["preemptions"] += 1
        if not self.active:
            return
        bt, kv_lens, _ = self.pool.build_block_tables(self.ecfg.max_pages_per_seq)
        for slot in range(self.ecfg.max_batch):
            if slot not in self.active:
                bt[slot, :] = self.trash_page
        for slot, pid in self._slot_prefix.items():
            if slot in self.active:
                pages = self._prefix_pages(pid, slot)
                bt[slot, : len(pages)] = pages
        tokens = np.zeros((self.ecfg.max_batch, L), np.int32)
        for slot, st in self.active.items():
            ctx = st["prompt"] + st["generated"]
            drafts = draft_prompt_lookup(ctx, L - 1, self.ecfg.spec_ngram)
            tokens[slot] = [st["last_token"]] + drafts
        self._step_count += 1
        logits, self.pools = self._run_verify(
            jnp.asarray(tokens), jnp.asarray(bt), jnp.asarray(kv_lens)
        )
        greedy = np.asarray(jnp.argmax(logits, axis=-1))  # (b, L)
        for slot, st in self.active.items():
            g = greedy[slot]
            drafts = tokens[slot, 1:]
            a = 0
            while a < L - 1 and drafts[a] == g[a]:
                a += 1
            out = [int(t) for t in drafts[:a]] + [int(g[a])]
            # clamp to the request budget and stop at eos
            remaining = st["max_new"] - len(st["generated"])
            out = out[:remaining]
            if self.ecfg.eos_token >= 0 and self.ecfg.eos_token in out:
                out = out[: out.index(self.ecfg.eos_token) + 1]
            # cache holds KV for [last] + accepted/kept drafts = len(out)
            # consumed inputs; positions past that are rejected-draft
            # garbage — return their pages
            self.stats["drafts_proposed"] += L - 1
            self.stats["drafts_accepted"] += max(len(out) - 1, 0)
            cur_before = int(kv_lens[slot]) - L
            self.pool.truncate(slot, cur_before + len(out))
            st["generated"].extend(out)
            st["last_token"] = out[-1]
            emitted.setdefault(st["id"], []).extend(out)

    def run(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        steps = 0
        while (
            self.queue or self.active or any(
                st is not None for st in self._prefills
            )
        ) and steps < max_steps:
            self.step()
            steps += 1
        return self.results

    def stats_summary(self) -> Dict[str, float]:
        """Derived serving metrics from the raw counters in self.stats."""
        s = self.stats
        return dict(
            s,
            tokens_per_step=(
                s["tokens_emitted"] / s["steps"] if s["steps"] else 0.0
            ),
            draft_acceptance=(
                s["drafts_accepted"] / s["drafts_proposed"]
                if s["drafts_proposed"]
                else 0.0
            ),
            page_utilization=1.0 - self.pool.free_pages() / self.ecfg.num_pages,
            active_requests=len(self.active),
            queued_requests=len(self.queue),
        )
