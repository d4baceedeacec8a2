"""Expert-parallel MoE serving (parallel/ep_serve.py, round-4 verdict #5):
ep_decode_step must be token-identical to per-shard single-device MoE
decode — experts sharded over "ep", batch/pools sharded like dp, GShard
blocks exchanged by all_to_all."""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from xf_flash_attention_cutlass_tpu.models.moe import MoEConfig, init_moe_params
from xf_flash_attention_cutlass_tpu.parallel.ep_serve import (
    ep_decode_step,
    ep_param_partition_specs,
    shard_ep,
)
from xf_flash_attention_cutlass_tpu.parallel import make_mesh
from xf_flash_attention_cutlass_tpu.serve.engine import decode_step
from xf_flash_attention_cutlass_tpu.utils.testing import max_err


def _cpu_devices(n):
    devs = jax.devices("cpu")
    assert len(devs) >= n, f"need {n} cpu devices"
    return devs[:n]


def _moe_setup(seed=0):
    cfg = MoEConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    return cfg, params


def _pools_and_batch(cfg, n_shards, local_pages=8, b_local=2, page=16, mp=4):
    L = cfg.n_layers
    num_pages = n_shards * local_pages
    kpool = jax.random.normal(
        jax.random.PRNGKey(1),
        (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32,
    )
    vpool = jax.random.normal(jax.random.PRNGKey(2), kpool.shape, jnp.float32)
    pools = dict(k=kpool, v=vpool)
    bt = jnp.asarray(
        [[0, 1, 2, 3], [4, 5, 6, 7]] * n_shards, jnp.int32
    )[: n_shards * b_local]
    kv_lens = jnp.asarray(
        [17, 40, 9, 33, 25, 12, 30, 8][: n_shards * b_local], jnp.int32
    )
    tokens = jnp.asarray(
        [[5], [9], [31], [2], [44], [7], [13], [20]][: n_shards * b_local],
        jnp.int32,
    )
    return pools, bt, kv_lens, tokens, local_pages, b_local


def _per_shard_reference(params, cfg, pools, bt, kv_lens, tokens,
                         n_shards, local_pages, b_local):
    ref_toks, ref_logits, ref_pools = [], [], []
    for r in range(n_shards):
        pr = {k: v[:, r * local_pages:(r + 1) * local_pages].copy()
              for k, v in pools.items()}
        t, lg, pp = decode_step(
            params, tokens[r * b_local:(r + 1) * b_local], pr,
            bt[r * b_local:(r + 1) * b_local],
            kv_lens[r * b_local:(r + 1) * b_local], cfg,
        )
        ref_toks.append(t)
        ref_logits.append(lg)
        ref_pools.append(pp)
    return ref_toks, ref_logits, ref_pools


def test_ep_decode_matches_single():
    cfg, params = _moe_setup()
    ep = 2
    pools, bt, kv_lens, tokens, lp, bl = _pools_and_batch(cfg, ep)
    ref_toks, ref_logits, ref_pools = _per_shard_reference(
        params, cfg, pools, bt, kv_lens, tokens, ep, lp, bl
    )
    mesh = make_mesh(ep=ep, devices=_cpu_devices(ep))
    sp, spools = shard_ep(params, pools, mesh)
    tok, logits, out_pools = ep_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh
    )
    assert jnp.array_equal(tok, jnp.concatenate(ref_toks))
    assert max_err(logits, jnp.concatenate(ref_logits)) < 1e-4
    for name in pools:
        want = jnp.concatenate([rp[name] for rp in ref_pools], axis=1)
        assert max_err(out_pools[name], want) < 1e-5, name


def test_ep_dp_decode_matches_single():
    cfg, params = _moe_setup()
    dp, ep = 2, 2
    n_shards = dp * ep
    pools, bt, kv_lens, tokens, lp, bl = _pools_and_batch(cfg, n_shards)
    ref_toks, ref_logits, ref_pools = _per_shard_reference(
        params, cfg, pools, bt, kv_lens, tokens, n_shards, lp, bl
    )
    mesh = make_mesh(dp=dp, ep=ep, devices=_cpu_devices(n_shards))
    sp, spools = shard_ep(params, pools, mesh)
    tok, logits, out_pools = ep_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh
    )
    assert jnp.array_equal(tok, jnp.concatenate(ref_toks))
    assert max_err(logits, jnp.concatenate(ref_logits)) < 1e-4
    for name in pools:
        want = jnp.concatenate([rp[name] for rp in ref_pools], axis=1)
        assert max_err(out_pools[name], want) < 1e-5, name


def test_ep_tp_decode_matches_single():
    """ep x tp composition: tp Megatron-shards attention + expert ffn
    dims on top of the expert-axis ep sharding."""
    cfg, params = _moe_setup()
    ep, tp = 2, 2
    pools, bt, kv_lens, tokens, lp, bl = _pools_and_batch(cfg, ep)
    ref_toks, ref_logits, ref_pools = _per_shard_reference(
        params, cfg, pools, bt, kv_lens, tokens, ep, lp, bl
    )
    mesh = make_mesh(ep=ep, tp=tp, devices=_cpu_devices(ep * tp))
    sp, spools = shard_ep(params, pools, mesh, tp=True)
    tok, logits, out_pools = ep_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh
    )
    assert jnp.array_equal(tok, jnp.concatenate(ref_toks))
    assert max_err(logits, jnp.concatenate(ref_logits)) < 1e-4
    for name in pools:
        want = jnp.concatenate([rp[name] for rp in ref_pools], axis=1)
        assert max_err(out_pools[name], want) < 1e-5, name


def test_ep_param_specs_shard_only_experts():
    cfg, params = _moe_setup()
    specs = ep_param_partition_specs(params)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    saw_expert = 0
    for path, spec in flat:
        name = None
        for p in path:
            k = getattr(p, "key", getattr(p, "name", None))
            if isinstance(k, str):
                name = k
        if name in ("w_gate", "w_up", "w_down"):
            assert spec[1] == "ep", (name, spec)
            saw_expert += 1
        else:
            assert "ep" not in tuple(spec), (name, spec)
    assert saw_expert == 3


def test_ep_decode_quantized_kv_matches_single():
    """ep serving with int8 KV pools: scale planes shard like the value
    pools (pages over ep)."""
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv

    cfg, params = _moe_setup()
    ep = 2
    pools, bt, kv_lens, tokens, lp, bl = _pools_and_batch(cfg, ep)
    kq, ks = quantize_kv(pools["k"], "int8")
    vq, vs = quantize_kv(pools["v"], "int8")
    pools = dict(k=kq, v=vq, k_s=ks[..., 0], v_s=vs[..., 0])
    ref_toks, ref_logits, ref_pools = [], [], []
    for r in range(ep):
        pr = {k: v[:, r * lp:(r + 1) * lp].copy() for k, v in pools.items()}
        t, lg, pp = decode_step(
            params, tokens[r * bl:(r + 1) * bl], pr,
            bt[r * bl:(r + 1) * bl], kv_lens[r * bl:(r + 1) * bl],
            cfg, "int8",
        )
        ref_toks.append(t)
        ref_logits.append(lg)
        ref_pools.append(pp)
    mesh = make_mesh(ep=ep, devices=_cpu_devices(ep))
    sp, spools = shard_ep(params, pools, mesh)
    tok, logits, out_pools = ep_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh, quant="int8"
    )
    assert jnp.array_equal(tok, jnp.concatenate(ref_toks))
    assert max_err(logits, jnp.concatenate(ref_logits)) < 1e-4
    for name in pools:
        want = jnp.concatenate([rp[name] for rp in ref_pools], axis=1)
        assert max_err(out_pools[name], want) < 1e-5, name


def test_ep_decode_full_quant_matches_single():
    """Full-quant EP serving: INT8 weight-only experts (quantize_moe_params
    tuples shard their expert axis over "ep" — both the int8 stack and the
    scale plane carry axis 1 = E) on top of int8 KV pools. Token-identical
    to the per-shard single-device full-quant decode — the deployment
    configuration the single-chip bench row measures (1.96x,
    benchmarks/RESULTS_r3.md), now under the ep axis."""
    from xf_flash_attention_cutlass_tpu.models.moe import quantize_moe_params
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv

    cfg, params = _moe_setup()
    params = quantize_moe_params(params)
    ep = 2
    pools, bt, kv_lens, tokens, lp, bl = _pools_and_batch(cfg, ep)
    kq, ks = quantize_kv(pools["k"], "int8")
    vq, vs = quantize_kv(pools["v"], "int8")
    pools = dict(k=kq, v=vq, k_s=ks[..., 0], v_s=vs[..., 0])
    ref_toks, ref_logits, ref_pools = [], [], []
    for r in range(ep):
        pr = {k: v[:, r * lp:(r + 1) * lp].copy() for k, v in pools.items()}
        t, lg, pp = decode_step(
            params, tokens[r * bl:(r + 1) * bl], pr,
            bt[r * bl:(r + 1) * bl], kv_lens[r * bl:(r + 1) * bl],
            cfg, "int8",
        )
        ref_toks.append(t)
        ref_logits.append(lg)
        ref_pools.append(pp)
    mesh = make_mesh(ep=ep, devices=_cpu_devices(ep))
    sp, spools = shard_ep(params, pools, mesh)
    # expert int8 stacks and scales must actually be ep-sharded
    specs = ep_param_partition_specs(params)
    wg_specs = jax.tree_util.tree_leaves(specs["layers"]["w_gate"])
    assert all(s[1] == "ep" for s in wg_specs), wg_specs
    tok, logits, out_pools = ep_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh, quant="int8"
    )
    assert jnp.array_equal(tok, jnp.concatenate(ref_toks))
    assert max_err(logits, jnp.concatenate(ref_logits)) < 1e-4
    for name in pools:
        want = jnp.concatenate([rp[name] for rp in ref_pools], axis=1)
        assert max_err(out_pools[name], want) < 1e-5, name


def test_ep_prefill_chunk_matches_single():
    """EP chunked prefill == per-shard single-device prefill_chunk_step:
    makes ep serving end-to-end (prefill + decode)."""
    from xf_flash_attention_cutlass_tpu.parallel.ep_serve import (
        ep_prefill_chunk_step,
    )
    from xf_flash_attention_cutlass_tpu.serve.engine import (
        prefill_chunk_step,
    )

    cfg, params = _moe_setup()
    ep = 2
    lp = 8  # local pages per shard
    L = cfg.n_layers
    num_pages = ep * lp
    pools = dict(
        k=jnp.zeros((L, num_pages, cfg.n_kv_heads, 16, cfg.head_dim),
                    jnp.float32),
        v=jnp.zeros((L, num_pages, cfg.n_kv_heads, 16, cfg.head_dim),
                    jnp.float32),
    )
    P_, C = 2, 32  # one prefill lane per shard
    tokens = jnp.asarray(
        [[(7 * i + j) % cfg.vocab_size for j in range(C)] for i in range(P_)],
        jnp.int32,
    )
    n_prior = jnp.zeros((P_,), jnp.int32)
    n_valid = jnp.asarray([C, C - 5], jnp.int32)
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)

    ref_logits, ref_pools = [], []
    for r in range(ep):
        pr = {k: v[:, r * lp:(r + 1) * lp].copy() for k, v in pools.items()}
        lg, pp = prefill_chunk_step(
            params, tokens[r:r + 1], n_prior[r:r + 1], n_valid[r:r + 1],
            pr, bt[r:r + 1], cfg,
        )
        ref_logits.append(lg)
        ref_pools.append(pp)

    mesh = make_mesh(ep=ep, devices=_cpu_devices(ep))
    sp, spools = shard_ep(params, pools, mesh)
    logits, out_pools = ep_prefill_chunk_step(
        sp, tokens, n_prior, n_valid, spools, bt, cfg, mesh
    )
    assert max_err(logits, jnp.concatenate(ref_logits)) < 1e-4
    for name in pools:
        want = jnp.concatenate([rp[name] for rp in ref_pools], axis=1)
        assert max_err(out_pools[name], want) < 1e-5, name


# ---- engine-level EP: DecodeEngine(mesh with ep axis) --------------------


def _engine_prompts(cfg):
    return {
        0: [(7 * i + 3) % cfg.vocab_size for i in range(21)],
        1: [5, 9, 2],
        2: [11, 3, 8, 2, 60, 17],
        3: [1, 2, 3, 4, 5, 6, 7, 8, 9],
    }


def _run_engine(params, cfg, ecfg, mesh_arg, prompts):
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine

    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg)
    for rid, p in prompts.items():
        eng.add_request(rid, p, 5)
    return eng.run()


def test_ep_engine_moe_token_identical():
    """DecodeEngine(mesh=ep2): the engine treats each ep shard as a dp
    replica for batch slots / page pools / allocators while sharding ONLY
    the expert leaves over "ep" (engine.__init__ n_replicas). Token
    streams must match the single-device MoE engine exactly."""
    from xf_flash_attention_cutlass_tpu.serve import EngineConfig

    cfg, params = _moe_setup()
    mesh = make_mesh(ep=2, devices=_cpu_devices(2))
    ecfg = EngineConfig(
        max_batch=4, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2,
    )
    prompts = _engine_prompts(cfg)
    ref = _run_engine(params, cfg, ecfg, None, prompts)
    out = _run_engine(params, cfg, ecfg, mesh, prompts)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_ep_tp_engine_moe_token_identical():
    """ep2 x tp2 engine: expert axis over ep AND Megatron ffn/head shards
    over tp, composed inside one DecodeEngine."""
    from xf_flash_attention_cutlass_tpu.serve import EngineConfig

    cfg, params = _moe_setup()
    mesh = make_mesh(ep=2, tp=2, devices=_cpu_devices(4))
    ecfg = EngineConfig(
        max_batch=4, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2,
    )
    prompts = _engine_prompts(cfg)
    ref = _run_engine(params, cfg, ecfg, None, prompts)
    out = _run_engine(params, cfg, ecfg, mesh, prompts)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_ep_engine_rejects_dense_params():
    """ep>1 with a dense (non-MoE) model must fail fast at engine init."""
    from xf_flash_attention_cutlass_tpu.models.llama import (
        LlamaConfig, init_params,
    )
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(ep=2, devices=_cpu_devices(2))
    with pytest.raises(ValueError, match="not a MoE"):
        DecodeEngine(
            params, cfg,
            EngineConfig(max_batch=2, page_size=16, num_pages=32,
                         max_seq=64, prefill_chunk=32),
            dtype=jnp.float32, mesh=mesh,
        )


def test_dp_ep_engine_moe_token_identical():
    """dp2 x ep2 engine: n_replicas = dp*ep = 4 host-side replicas; the
    row-major replica index (r = dp_idx*ep + ep_idx) must match the
    P(("dp","ep")) batch/page sharding order."""
    from xf_flash_attention_cutlass_tpu.serve import EngineConfig

    cfg, params = _moe_setup()
    mesh = make_mesh(dp=2, ep=2, devices=_cpu_devices(4))
    ecfg = EngineConfig(
        max_batch=4, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=4,
    )
    prompts = _engine_prompts(cfg)
    ref = _run_engine(params, cfg, ecfg, None, prompts)
    out = _run_engine(params, cfg, ecfg, mesh, prompts)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_ep_engine_all_features_token_identical():
    """Maximal EP composition in one engine: ep2 mesh x int8 expert
    weights (quantize_moe_params) x int8 KV pools x shared-prefix caching
    x speculative decoding. Streams must match the identical-featured
    single-device engine."""
    from xf_flash_attention_cutlass_tpu.models.moe import quantize_moe_params
    from xf_flash_attention_cutlass_tpu.serve import EngineConfig

    cfg, params = _moe_setup()
    params = quantize_moe_params(params)
    mesh = make_mesh(ep=2, devices=_cpu_devices(2))
    page = 16
    ecfg = EngineConfig(
        max_batch=4, page_size=page, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2, speculate_k=3, kv_quant="int8",
    )
    prefix = [(3 * i + 1) % cfg.vocab_size for i in range(page + 5)]
    prompts = {0: [9, 4, 7, 7, 7, 7], 1: [15, 2, 8]}

    def run(mesh_arg):
        from xf_flash_attention_cutlass_tpu.serve import DecodeEngine

        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg)
        eng.register_prefix("sys", prefix)
        for rid, p in prompts.items():
            eng.add_request(rid, p, 6, prefix_id="sys")
        out = eng.run()
        eng.release_prefix("sys")
        return out

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_ep_engine_multi_step_token_identical():
    """EP mesh engine with multi-step windows (round 5: the decode scan —
    including the GShard all_to_all pair — runs inside the shard_map):
    streams must match the per-step ep2 engine exactly."""
    from xf_flash_attention_cutlass_tpu.serve import EngineConfig

    cfg, params = _moe_setup()
    mesh = make_mesh(ep=2, devices=_cpu_devices(2))
    prompts = _engine_prompts(cfg)
    outs = {}
    for K in (1, 3):
        ecfg = EngineConfig(
            max_batch=4, page_size=16, num_pages=64, max_seq=256,
            prefill_chunk=32, prefill_lanes=2, multi_step=K,
        )
        outs[K] = _run_engine(params, cfg, ecfg, mesh, prompts)
    for rid in prompts:
        assert list(outs[1][rid]) == list(outs[3][rid]), rid
