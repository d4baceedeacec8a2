"""Pipeline-parallel serving: a decode step over a "pp" mesh axis.

The memory-capacity leg of the serving story (the dp x tp engine layouts
keep whole-model replicas per tp group; PP shards the LAYER axis so a
model larger than tp x HBM still serves): each stage holds L/pp layers'
weights AND the matching slice of the paged KV pools (pools lead with the
layer axis, so `P("pp", ...)` shards them for free), and one decode step
pipelines the batch through the stages as GPipe microbatches — `n_micro`
microbatches ride `n_micro + pp - 1` schedule phases, one activation
`ppermute` per phase (the serving analog of parallel/pp.py's training
schedule; per-phase stage utilization n_micro/(n_micro + pp - 1)).

Garbage phases (pipeline fill/drain) are handled WITHOUT masking the pool
carry (a `where` over the pools would copy the whole buffer — the XLA
scatter trap, CLAUDE.md): inactive phases run with block tables pointing
at the caller's trash page and kv_len=1, so their appends land on the
trash page and their attention reads one finite trash row; outputs are
discarded by the schedule. Every real microbatch visits every stage
exactly once, so the per-layer appends happen exactly once per token.

Like the reference, which has no distributed serving at all (SURVEY §2.5),
the engine's production layout stays dp x tp (benchmarks/scaling_report.py:
zero-cross-replica dp rows dominate on v5e); this step function is the
building block for capacity-bound deployments and is token-identity-tested
against the single-device decode step on the CPU mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xf_flash_attention_cutlass_tpu.models.llama import (
    LlamaConfig,
    layer_view,
    rms_norm,
    split_layer_params,
    _proj,
)
from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention
from xf_flash_attention_cutlass_tpu.ops.paged_append import paged_append
from xf_flash_attention_cutlass_tpu.ops.rotary import rotary_frequencies
from xf_flash_attention_cutlass_tpu.parallel.pp import (
    PP,
    TP,
    pp_param_partition_specs,
)
from xf_flash_attention_cutlass_tpu.serve.engine import _attn_qkv, _mlp


def pp_pool_specs(
    pools: Dict[str, jax.Array], tp: bool = False
) -> Dict[str, Any]:
    """Pools lead with the layer axis: shard it over "pp"; with tp, the
    kv-head axis (position 2 of (L, pages, h_k, page[, d])) additionally
    shards over "tp" (the tp_serve layout inside each stage)."""
    if not tp:
        return {k: P(PP, *([None] * (v.ndim - 1))) for k, v in pools.items()}
    return {
        k: P(PP, None, TP, *([None] * (v.ndim - 3)))
        for k, v in pools.items()
    }


def shard_pp_pools(pools, mesh: Mesh):
    specs = pp_pool_specs(pools, tp=dict(mesh.shape).get(TP, 1) > 1)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in pools.items()
    }


def pp_decode_step(
    params,
    tokens,  # (b, 1) int32, replicated
    pools,  # dict of (L, num_pages, h_k, page[, d]) — layer axis over "pp"
    block_tables,  # (b, max_pages) int32, replicated (global page ids)
    kv_lens,  # (b,) int32, replicated — length AFTER this step
    cfg: LlamaConfig,
    mesh: Mesh,
    trash_page: int,  # absorbing page id for fill/drain-phase appends
    n_micro: Optional[int] = None,  # microbatches; default pp (full fill)
    quant: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """One pipeline-parallel greedy decode step.

    Returns (next_tokens (b,), logits (b, vocab) f32, pools) with pools
    still pp-sharded. Requires b % n_micro == 0 and cfg.n_layers % pp == 0.
    """
    pp_size = mesh.shape[PP]
    tp_size = dict(mesh.shape).get(TP, 1)
    b = tokens.shape[0]
    if n_micro is None:
        n_micro = pp_size
    if b % n_micro:
        raise ValueError(f"n_micro={n_micro} must divide batch {b}")
    if cfg.n_layers % pp_size:
        raise ValueError(
            f"pp={pp_size} must divide n_layers {cfg.n_layers}"
        )
    mb = b // n_micro
    mp = block_tables.shape[1]

    pspecs = pp_param_partition_specs(params, tp=tp_size > 1)
    kspecs = pp_pool_specs(pools, tp=tp_size > 1)
    if tp_size > 1:
        from xf_flash_attention_cutlass_tpu.parallel.tp import _local_cfg

        cfg = _local_cfg(cfg, tp_size)
    tp_axis = TP if tp_size > 1 else None

    def local(params, tokens, pools, bt, kv_lens):
        idx = jax.lax.axis_index(PP)
        d = params["embed"].shape[1]
        x_mb = params["embed"][tokens].reshape(n_micro, mb, 1, d)
        bt_mb = bt.reshape(n_micro, mb, mp)
        kl_mb = kv_lens.reshape(n_micro, mb)
        trash_bt = jnp.full((mb, mp), trash_page, jnp.int32)
        cos, sin = rotary_frequencies(
            cfg.head_dim, cfg.max_seq_len, cfg.rope_base
        )
        layers_xs, layers_stacked = split_layer_params(params["layers"])
        n_local = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]

        def stage_apply(x, pools, btm, klm):
            """This stage's local layers over one (mb, 1, d) microbatch."""
            append_pos = jnp.maximum(klm - 1, 0)
            positions = append_pos[:, None]

            def body(carry, xs):
                layer_xs, l = xs
                layer = layer_view(layer_xs, layers_stacked, l)
                if quant:
                    x, kp, vp, ks, vs = carry
                else:
                    x, kp, vp = carry
                q, k_new, v_new = _attn_qkv(layer, x, cfg, cos, sin, positions)
                if quant:
                    kp, vp, ks, vs = paged_append(
                        kp, vp, k_new, v_new, btm, append_pos,
                        k_scales=ks, v_scales=vs, layer_idx=l,
                        interpret=interpret, mode="decode",
                    )
                    o, _ = paged_attention(
                        q, kp, vp, btm, klm, causal=True,
                        k_scales=ks, v_scales=vs, layer_idx=l,
                        interpret=interpret,
                    )
                else:
                    kp, vp = paged_append(
                        kp, vp, k_new, v_new, btm, append_pos,
                        layer_idx=l, interpret=interpret, mode="decode",
                    )
                    o, _ = paged_attention(
                        q, kp, vp, btm, klm, causal=True,
                        layer_idx=l, interpret=interpret,
                    )
                o = o.reshape(mb, 1, cfg.n_heads * cfg.head_dim)
                partial = _proj(o, layer["wo"])
                if tp_axis is not None:
                    partial = jax.lax.psum(partial, tp_axis)
                x = x + partial
                x = _mlp(layer, x, cfg, axis_name=tp_axis)
                carry = (x, kp, vp, ks, vs) if quant else (x, kp, vp)
                return carry, None

            carry0 = (
                (x, pools["k"], pools["v"], pools["k_s"], pools["v_s"])
                if quant
                else (x, pools["k"], pools["v"])
            )
            carry, _ = jax.lax.scan(
                body, carry0,
                (layers_xs, jnp.arange(n_local, dtype=jnp.int32)),
            )
            x = carry[0]
            if quant:
                pools = dict(k=carry[1], v=carry[2], k_s=carry[3],
                             v_s=carry[4])
            else:
                pools = dict(k=carry[1], v=carry[2])
            return x, pools

        n_steps = n_micro + pp_size - 1
        shift = [(i, (i + 1) % pp_size) for i in range(pp_size)]
        state0 = jnp.zeros((mb, 1, d), x_mb.dtype)
        out0 = jnp.zeros((n_micro, mb, 1, d), x_mb.dtype)

        def step(carry, t):
            state, outputs, pools = carry
            m = t - idx  # microbatch resident on this stage this phase
            active = jnp.logical_and(m >= 0, m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            feed = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            cur = jnp.where(
                jnp.logical_and(idx == 0, t < n_micro), feed, state
            )
            btm = jnp.where(
                active,
                jax.lax.dynamic_index_in_dim(bt_mb, m_c, 0, keepdims=False),
                trash_bt,
            )
            klm = jnp.where(
                active,
                jax.lax.dynamic_index_in_dim(kl_mb, m_c, 0, keepdims=False),
                jnp.ones((mb,), jnp.int32),
            )
            out, pools = stage_apply(cur, pools, btm, klm)
            done = t - (pp_size - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, out, jnp.clip(done, 0, n_micro - 1), 0
            )
            outputs = jnp.where(
                jnp.logical_and(idx == pp_size - 1, done >= 0), upd, outputs
            )
            state = jax.lax.ppermute(out, PP, shift)
            return (state, outputs, pools), None

        (_, outputs, pools), _ = jax.lax.scan(
            step, (state0, out0, pools), jnp.arange(n_steps)
        )
        # only the last stage holds real outputs: replicate, then head
        x = jax.lax.psum(
            jnp.where(idx == pp_size - 1, outputs, 0.0), PP
        ).reshape(b, 1, d)
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = _proj(x[:, 0], params["lm_head"]).astype(jnp.float32)
        if tp_axis is not None:
            # vocab-sharded head -> full logits on every device
            logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
        next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return next_tokens, logits, pools

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspecs, P(), kspecs, P(), P()),
        out_specs=(P(), P(), kspecs),
        check_vma=False,
    )
    return fn(params, tokens, pools, block_tables, kv_lens)
