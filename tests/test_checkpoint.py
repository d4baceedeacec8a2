"""Engine checkpoint/resume: a restored engine continues the exact token
stream of the uninterrupted run (bf16 and quantized pools, byte-exact)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xf_flash_attention_cutlass_tpu.models.llama import LlamaConfig, init_params
from xf_flash_attention_cutlass_tpu.serve import (
    DecodeEngine,
    EngineConfig,
    PagePool,
    load_engine,
    save_engine,
)


def _small_cfg():
    return LlamaConfig(
        vocab_size=128,
        dim=64,
        n_layers=2,
        n_heads=2,
        n_kv_heads=1,
        ffn_dim=128,
        max_seq_len=512,
    )


def _make_engine(kv_quant=None, sample=False):
    cfg = _small_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    ecfg = EngineConfig(
        max_batch=2,
        page_size=16,
        num_pages=64,
        max_seq=256,
        kv_quant=kv_quant,
        top_k=8 if sample else 0,
        sample_seed=7,
    )
    eng = DecodeEngine(params, cfg, ecfg)
    temp = 0.8 if sample else 0.0
    eng.add_request(1, [3, 5, 7, 11, 13], 8, temperature=temp)
    eng.add_request(2, list(range(20, 40)), 6, temperature=temp)
    eng.add_request(3, [9] * 40, 5)
    return params, cfg, ecfg, eng


def test_pagepool_snapshot_roundtrip():
    pool = PagePool(32, 16, 4)
    s0 = pool.admit(10, 33, 100)
    s1 = pool.admit(11, 5, 50)
    pool.extend(s0, 16)
    snap = pool.snapshot()
    # mutate, then restore
    pool.retire(s0)
    pool.admit(12, 64, 64)
    pool.restore(snap)
    bt, sl, n = pool.build_block_tables(8)
    assert n == 2
    assert sl[s0] == 49 and sl[s1] == 5
    free_before = pool.free_pages()
    pool.restore(snap)
    assert pool.free_pages() == free_before

    # geometry mismatch rejected
    other = PagePool(16, 16, 4)
    with pytest.raises(ValueError):
        other.restore(snap)


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_engine_checkpoint_resume(tmp_path, kv_quant):
    # uninterrupted run
    params, cfg, ecfg, ref_eng = _make_engine(kv_quant)
    ref = ref_eng.run(max_steps=50)

    # interrupted at step 3 -> checkpoint -> restore -> continue
    params, cfg, ecfg, eng = _make_engine(kv_quant)
    for _ in range(3):
        eng.step()
    path = str(tmp_path / "ckpt.npz")
    save_engine(eng, path)
    eng2 = load_engine(path, params=params)
    # compare against the engine's RESOLVED config (pack_small_pages may
    # coarsen quantized sub-tile pages; checkpoints store the resolution)
    assert dataclasses.asdict(eng2.ecfg) == dataclasses.asdict(eng.ecfg)
    assert load_engine(path, params=params, ecfg=ecfg) is not None
    out = eng2.run(max_steps=50)
    assert out == ref

    # pools roundtrip byte-exact (quantized pools must not requantize);
    # eng2 has decoded past the checkpoint, so compare a fresh reload
    eng3 = load_engine(path, params=params)
    for k, v in eng.pools.items():
        a = np.asarray(v).view(np.uint8)
        b = np.asarray(eng3.pools[k]).view(np.uint8)
        assert np.array_equal(a, b), k


def test_engine_checkpoint_resume_sampled(tmp_path):
    """Seeded sampling survives a checkpoint: step counter and base key are
    part of the state, so the resumed stream matches exactly."""
    params, cfg, ecfg, ref_eng = _make_engine(sample=True)
    ref = ref_eng.run(max_steps=50)

    params, cfg, ecfg, eng = _make_engine(sample=True)
    for _ in range(4):
        eng.step()
    path = str(tmp_path / "ckpt.npz")
    save_engine(eng, path, include_params=True)
    eng2 = load_engine(path)  # params from the checkpoint
    out = eng2.run(max_steps=50)
    assert out == ref


def test_engine_checkpoint_resume_with_prefix(tmp_path):
    """Prefix-cache state (pages, registry, slot bindings) survives a
    checkpoint: the resumed engine continues the exact token stream."""
    def make():
        cfg = _small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=64,
                            max_seq=256, prefill_chunk=16)
        eng = DecodeEngine(params, cfg, ecfg)
        eng.register_prefix("sys", [(5 * i + 2) % cfg.vocab_size
                                    for i in range(40)])
        eng.add_request(1, [3, 5, 7], 6, prefix_id="sys")
        eng.add_request(2, [11, 13], 5, prefix_id="sys")
        return params, eng

    params, ref_eng = make()
    ref = ref_eng.run(max_steps=80)

    params, eng = make()
    for _ in range(5):
        eng.step()
    path = str(tmp_path / "ckpt_prefix.npz")
    save_engine(eng, path)
    eng2 = load_engine(path, params=params)
    assert (eng2._prefixes["sys"]["pages_by_replica"]
            == eng._prefixes["sys"]["pages_by_replica"])
    out = eng2.run(max_steps=80)
    assert out == ref


def test_checkpoint_cfg_mismatch(tmp_path):
    params, cfg, ecfg, eng = _make_engine()
    eng.step()
    path = str(tmp_path / "ckpt.npz")
    save_engine(eng, path)
    bad = dataclasses.replace(ecfg, num_pages=32)
    with pytest.raises(ValueError):
        load_engine(path, params=params, ecfg=bad)
    with pytest.raises(ValueError):
        load_engine(path)  # no params saved, none passed


def test_checkpoint_resume_tp_mesh(tmp_path):
    """Save from a TP-sharded engine mid-stream, restore into a fresh
    TP-sharded engine, streams stay token-identical (pools re-sharded on
    load)."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("need 2 cpu devices")
    mesh = Mesh(np.asarray(devs[:2]).reshape(2), ("tp",))
    cfg = dataclasses.replace(_small_cfg(), n_heads=4, n_kv_heads=2)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ecfg = EngineConfig(
        max_batch=2, page_size=16, num_pages=32, max_seq=128,
        prefill_chunk=32,
    )
    prompt = [(3 * i + 5) % cfg.vocab_size for i in range(19)]

    ref_eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32, mesh=mesh)
    ref_eng.add_request(0, prompt, 8)
    ref = ref_eng.run()

    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32, mesh=mesh)
    eng.add_request(0, prompt, 8)
    for _ in range(4):
        eng.step()
    path = str(tmp_path / "ckpt_tp.npz")
    save_engine(eng, path)
    eng2 = load_engine(path, params=params, dtype=jnp.float32, mesh=mesh)
    out = eng2.run()
    assert list(out[0]) == list(ref[0])


def test_checkpoint_resume_ep_mesh(tmp_path):
    """Save from an expert-parallel (ep2) MoE engine mid-stream, restore
    into a fresh ep engine: pools re-shard over the ep replica axis on
    load (serve/checkpoint.py ep_axis) and streams stay token-identical."""
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params,
    )
    from xf_flash_attention_cutlass_tpu.parallel import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("need 2 cpu devices")
    mesh = make_mesh(ep=2, devices=devs[:2])
    cfg = MoEConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ecfg = EngineConfig(
        max_batch=2, page_size=16, num_pages=32, max_seq=128,
        prefill_chunk=32, prefill_lanes=2,
    )
    prompts = {0: [(3 * i + 5) % cfg.vocab_size for i in range(19)],
               1: [7, 2, 9]}

    ref_eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32, mesh=mesh)
    for rid, p in prompts.items():
        ref_eng.add_request(rid, p, 6)
    ref = ref_eng.run()

    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32, mesh=mesh)
    for rid, p in prompts.items():
        eng.add_request(rid, p, 6)
    for _ in range(4):
        eng.step()
    path = str(tmp_path / "ckpt_ep.npz")
    save_engine(eng, path)
    eng2 = load_engine(path, params=params, dtype=jnp.float32, mesh=mesh)
    out = eng2.run()
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_checkpoint_resume_moe_single_device(tmp_path):
    """MoE engine checkpoints load as MoEConfig (regression: load_engine
    rebuilt every cfg as LlamaConfig and raised on n_experts), including
    params round-trip via include_params=True."""
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params,
    )

    cfg = MoEConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=32, max_seq=128)
    prompt = [(3 * i + 5) % cfg.vocab_size for i in range(13)]

    ref_eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    ref_eng.add_request(0, prompt, 6)
    ref = ref_eng.run()

    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    eng.add_request(0, prompt, 6)
    for _ in range(3):
        eng.step()
    path = str(tmp_path / "ckpt_moe.npz")
    save_engine(eng, path, include_params=True)
    eng2 = load_engine(path, dtype=jnp.float32)  # params from checkpoint
    assert type(eng2.cfg).__name__ == "MoEConfig"
    out = eng2.run()
    assert list(out[0]) == list(ref[0])


def test_checkpoint_quantized_params_roundtrip(tmp_path):
    """include_params with WEIGHT-quantized engines (round-4 ADVICE #2):
    the saved (w_q, scale)-tuple leaf structure must restore into a
    matching treedef (eval_shape'd quantized template), token-identical
    resume; a mismatched template raises clearly instead of mis-zipping
    leaves."""
    from xf_flash_attention_cutlass_tpu.models.llama import quantize_params

    cfg = _small_cfg()
    params = quantize_params(init_params(jax.random.PRNGKey(0), cfg))
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=64, max_seq=256)
    prompt = [3, 5, 7, 11, 13]

    ref_eng = DecodeEngine(params, cfg, ecfg)
    ref_eng.add_request(1, prompt, 8)
    ref = ref_eng.run()

    eng = DecodeEngine(params, cfg, ecfg)
    eng.add_request(1, prompt, 8)
    for _ in range(3):
        eng.step()
    path = str(tmp_path / "ckpt_qw.npz")
    save_engine(eng, path, include_params=True)
    eng2 = load_engine(path)  # params (quantized tuples) from checkpoint
    assert isinstance(eng2.params["layers"]["wq"], tuple)
    out = eng2.run()
    assert list(out[1]) == list(ref[1])


def test_checkpoint_resume_packed_multi_step(tmp_path):
    """Round-5 features compose through a checkpoint: pair-packed
    quantized small pages (pack_small_pages resolves page 16 -> 32,
    stored in the checkpoint) + multi-step windows (_step_count advances
    by K, part of the state). Resume must continue the exact stream of
    the uninterrupted run."""
    cfg = _small_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    ecfg = EngineConfig(
        max_batch=2, page_size=16, num_pages=64, max_seq=256,
        kv_quant="int8", multi_step=4, top_k=8, sample_seed=11,
    )
    prompts = {1: [3, 5, 7, 11, 13], 2: list(range(20, 33))}

    def make():
        eng = DecodeEngine(params, cfg, ecfg)
        assert eng.ecfg.page_size == 32  # pack resolved
        for rid, p in prompts.items():
            eng.add_request(rid, p, 12, temperature=0.7)
        return eng

    ref = make().run(max_steps=60)

    eng = make()
    for _ in range(2):  # two multi-step windows in
        eng.step()
    path = str(tmp_path / "ckpt_pack_ms.npz")
    save_engine(eng, path)
    eng2 = load_engine(path, params=params, ecfg=ecfg)  # unresolved ecfg ok
    assert eng2.ecfg.multi_step == 4 and eng2.ecfg.page_size == 32
    out = eng2.run(max_steps=60)
    assert out == ref
