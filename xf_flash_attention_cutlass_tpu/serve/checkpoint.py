"""Engine checkpoint / resume.

The reference is stateless kernels — its only persistent state is the
caller-owned KV cache (SURVEY.md §5: /root/reference/csrc/flash_attn/src/
flash_fwd_kernel.h:871-921 mutates it in place). In this framework the
serving engine owns real state worth checkpointing: the paged KV pools on
device, the native allocator's free-list/page maps, and the Python request
table. `save_engine`/`load_engine` capture all of it so a server can restart
mid-stream and continue emitting the exact same tokens.

Format: one .npz (numpy zip) per checkpoint. Device arrays are stored as
raw uint8 views plus dtype/shape metadata — fp8/bf16 have no portable numpy
dtype, and a byte-exact roundtrip is required (quantized pools must not be
re-quantized). Model params are NOT saved by default (they are immutable;
pass `include_params=True` for a self-contained file).
"""

from __future__ import annotations

import dataclasses
import json
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
    "int8": jnp.int8,
    "int32": jnp.int32,
    "uint32": jnp.uint32,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}


def _pack(tree):
    """Flatten a pytree of arrays into {name: uint8 bytes} + a spec."""
    leaves, treedef = jax.tree.flatten(tree)
    spec = []
    out = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        spec.append((str(arr.dtype), list(arr.shape)))
        out[f"leaf_{i}"] = arr.reshape(-1).view(np.uint8)
    return out, spec, treedef


def _unpack(data, spec, treedef):
    leaves = []
    for i, (dtype_name, shape) in enumerate(spec):
        raw = np.asarray(data[f"leaf_{i}"])
        dt = _DTYPES[dtype_name]
        arr = jnp.asarray(raw).view(dt).reshape(shape)
        leaves.append(arr)
    return jax.tree.unflatten(treedef, leaves)


def save_engine(engine, path: str, include_params: bool = False) -> None:
    """Checkpoint a DecodeEngine: KV pools, allocator, request state."""
    pools_data, pools_spec, _ = _pack(engine.pools)
    state = dict(
        cfg=dataclasses.asdict(engine.cfg),
        # MoE engines carry a MoEConfig (LlamaConfig subclass, extra
        # fields like n_experts); record which class to rebuild on load
        cfg_class=type(engine.cfg).__name__,
        ecfg=dataclasses.asdict(engine.ecfg),
        pools_spec=pools_spec,
        pool_keys=sorted(engine.pools.keys()),
        queue=[list(entry) for entry in engine.queue],
        active={str(k): v for k, v in engine.active.items()},
        results={str(k): v for k, v in engine.results.items()},
        step_count=engine._step_count,
        trash_page=engine.trash_page,
        include_params=include_params,
        # engines may hold weight-quantized params ((w_q, scale) tuple
        # leaves, models/llama.quantize_params) — the restore-side treedef
        # must be rebuilt from a matching quantized template
        params_quantized=isinstance(engine.params["layers"]["wq"], tuple),
        prefixes=engine._prefixes,
        slot_prefix={str(k): v for k, v in engine._slot_prefix.items()},
        prefills=engine._prefills,
        preempt_emitted={
            str(k): v for k, v in engine._preempt_emitted.items()
        },
    )
    payload = dict(
        state=np.frombuffer(json.dumps(state).encode(), np.uint8),
        allocator=engine.pool.snapshot(),
        sample_base=np.asarray(engine._sample_base),
        **{f"pool_{k}": v for k, v in zip(state["pool_keys"], pools_data.values())},
    )
    if include_params:
        params_data, params_spec, _ = _pack(engine.params)
        payload["params_spec"] = np.frombuffer(
            json.dumps(params_spec).encode(), np.uint8
        )
        payload.update({f"param_{k}": v for k, v in params_data.items()})
    np.savez(path, **payload)


def load_engine(
    path: str,
    params=None,
    cfg=None,
    ecfg=None,
    dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    mesh=None,  # restore into a TP / dp x tp sharded engine (same shape
    # the engine was running with; pools are re-sharded on load)
):
    """Rebuild a DecodeEngine from a checkpoint. `params` must be supplied
    unless the checkpoint was saved with include_params=True. cfg/ecfg are
    re-derived from the checkpoint when not given; when given they must
    match what was saved (geometry is part of the state)."""
    from xf_flash_attention_cutlass_tpu.models.llama import LlamaConfig
    from xf_flash_attention_cutlass_tpu.serve.engine import DecodeEngine, EngineConfig

    with np.load(path, allow_pickle=False) as z:
        state = json.loads(bytes(z["state"].tobytes()).decode())
        if state.get("cfg_class", "LlamaConfig") == "MoEConfig":
            from xf_flash_attention_cutlass_tpu.models.moe import MoEConfig

            saved_cfg = MoEConfig(**state["cfg"])
        else:
            saved_cfg = LlamaConfig(**state["cfg"])
        saved_ecfg = EngineConfig(**state["ecfg"])
        if cfg is not None and dataclasses.asdict(cfg) != state["cfg"]:
            raise ValueError("cfg does not match the checkpoint")
        if ecfg is not None:
            # checkpoints store the RESOLVED config (pack_small_pages may
            # have coarsened page_size/num_pages) — accept a caller config
            # that resolves to the same thing
            from xf_flash_attention_cutlass_tpu.serve.engine import (
                effective_engine_config,
            )

            if dataclasses.asdict(
                effective_engine_config(ecfg)
            ) != state["ecfg"]:
                raise ValueError("ecfg does not match the checkpoint")
        cfg, ecfg = saved_cfg, saved_ecfg
        if params is None:
            if not state["include_params"]:
                raise ValueError(
                    "checkpoint has no params; pass params= to load_engine"
                )
            params_spec = json.loads(bytes(z["params_spec"].tobytes()).decode())
            keys = sorted(
                (k for k in z.files if k.startswith("param_leaf_")),
                key=lambda k: int(k.rsplit("_", 1)[1]),
            )
            # params were packed leaf-by-leaf; rebuild via the same pytree
            # structure as a freshly initialized model (of the right family)
            if type(cfg).__name__ == "MoEConfig":
                from xf_flash_attention_cutlass_tpu.models.moe import (
                    init_moe_params as init_params,
                    quantize_moe_params as quantize_fn,
                )
            else:
                from xf_flash_attention_cutlass_tpu.models.llama import (
                    init_params,
                    quantize_params as quantize_fn,
                )

            # eval_shape: treedefs only, no weight init/quant compute
            template = jax.eval_shape(
                lambda: init_params(jax.random.PRNGKey(0), cfg)
            )
            if state.get("params_quantized", False):
                # match the saved (w_q, scale)-tuple leaf structure
                template = jax.eval_shape(quantize_fn, template)
            treedef = jax.tree.structure(template)
            if treedef.num_leaves != len(keys):
                raise ValueError(
                    f"checkpoint has {len(keys)} param leaves but the "
                    f"{type(cfg).__name__} template has "
                    f"{treedef.num_leaves} (params_quantized="
                    f"{state.get('params_quantized', 'unrecorded')}); "
                    "the checkpoint was saved with a different param "
                    "structure than this config rebuilds"
                )
            params = _unpack(
                {f"leaf_{i}": z[k] for i, k in enumerate(keys)},
                params_spec,
                treedef,
            )
        engine = DecodeEngine(
            params, cfg, ecfg, dtype=dtype, interpret=interpret, mesh=mesh
        )
        pool_keys = state["pool_keys"]
        treedef = jax.tree.structure({k: 0 for k in pool_keys})
        engine.pools = _unpack(
            {f"leaf_{i}": z[f"pool_{k}"] for i, k in enumerate(pool_keys)},
            state["pools_spec"],
            treedef,
        )
        if mesh is not None:
            from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
                shard_pools,
            )

            engine.pools = shard_pools(
                engine.pools, mesh, dp_axis=engine.dp > 1,
                ep_axis=engine.ep > 1,
            )
        engine.pool.restore(z["allocator"])
        engine.queue = deque(tuple(e) for e in state["queue"])
        engine.active = {int(k): v for k, v in state["active"].items()}
        engine.results = {int(k): v for k, v in state["results"].items()}
        engine._step_count = state["step_count"]
        engine._sample_base = jnp.asarray(z["sample_base"])
        engine.trash_page = state["trash_page"]
        engine._prefixes = state.get("prefixes", {})
        for pf in engine._prefixes.values():
            # pre-dp checkpoints stored a single replica's page list under
            # "pages"; migrate to the replica-indexed layout.
            if "pages_by_replica" not in pf and "pages" in pf:
                pf["pages_by_replica"] = [pf.pop("pages")]
            if "n_pages" not in pf:
                pf["n_pages"] = len(pf["pages_by_replica"][0])
        engine._slot_prefix = {
            int(k): v for k, v in state.get("slot_prefix", {}).items()
        }
        engine._preempt_emitted = {
            int(k): v for k, v in state.get("preempt_emitted", {}).items()
        }
        saved = state.get("prefills")
        if saved is None:  # pre-lane checkpoints stored a single slot
            saved = [state.get("prefill")]
        engine._prefills = [None] * engine.ecfg.prefill_lanes
        for i, st in enumerate(x for x in saved if x is not None):
            engine._prefills[i] = st
    return engine
