"""Serving layer tests: native C++ page allocator + continuous-batching
engine. The engine's paged greedy decode must reproduce naive full-recompute
greedy decoding token-for-token (the strongest end-to-end check of the
paged cache write/read path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xf_flash_attention_cutlass_tpu.models.llama import (
    LlamaConfig,
    forward,
    init_params,
)
from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig, PagePool


# ---- allocator ------------------------------------------------------------

def test_allocator_native():
    pool = PagePool(num_pages=16, page_size=4, max_requests=4)
    assert pool.native, "C++ allocator failed to build"


def test_allocator_lifecycle():
    pool = PagePool(num_pages=8, page_size=4, max_requests=2)
    assert pool.free_pages() == 8
    s0 = pool.admit(100, prompt_len=6, target_len=10)  # needs 2 pages
    assert s0 >= 0
    assert pool.free_pages() == 6
    assert pool.seq_len(s0) == 6
    # extend within page 2 (6->8 fits in 2 pages)
    assert pool.extend(s0, 2) == 8
    assert pool.free_pages() == 6
    # crossing into page 3
    assert pool.extend(s0, 1) == 9
    assert pool.free_pages() == 5
    s1 = pool.admit(101, prompt_len=20, target_len=24)  # needs 5 pages
    assert s1 >= 0
    assert pool.free_pages() == 0
    # pool exhausted
    assert pool.extend(s1, 1) == -1
    pool.retire(s0)
    assert pool.free_pages() == 3
    assert pool.extend(s1, 1) == 21
    pool.retire(s1)
    assert pool.free_pages() == 8


def test_allocator_admit_limits():
    pool = PagePool(num_pages=4, page_size=4, max_requests=1)
    s0 = pool.admit(1, 4, 8)
    assert s0 == 0
    assert pool.admit(2, 4, 8) == -1  # no slot
    pool.retire(s0)
    assert pool.admit(3, 100, 101) == -1  # not enough pages
    assert pool.admit(4, 16, 17) == 0  # exactly 4 pages


def test_allocator_block_tables():
    pool = PagePool(num_pages=10, page_size=2, max_requests=3)
    s0 = pool.admit(7, 5, 8)  # 3 pages
    s1 = pool.admit(8, 2, 4)  # 1 page
    bt, sl, n = pool.build_block_tables(max_pages=5)
    assert n == 2
    assert sl[s0] == 5 and sl[s1] == 2
    # pages must be unique across requests
    used = list(bt[s0, :3]) + list(bt[s1, :1])
    assert len(set(used)) == 4


# ---- engine ---------------------------------------------------------------

def _tiny():
    cfg = LlamaConfig(
        vocab_size=97, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _naive_greedy(params, cfg, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


@pytest.mark.parametrize("page_size", [16, 32])
def test_engine_matches_naive_greedy(page_size):
    cfg, params = _tiny()
    ecfg = EngineConfig(
        max_batch=2, page_size=page_size, num_pages=32, max_seq=256
    )
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompt = [3, 17, 42, 9, 55, 21, 60]
    n_new = 6
    eng.add_request(0, prompt, n_new)
    out = eng.run()
    assert list(out[0]) == _naive_greedy(params, cfg, prompt, n_new)


@pytest.mark.parametrize("chunk", [32, 64])
def test_engine_chunked_prefill_token_exact(chunk):
    """Chunked prefill (paged-kernel chunks interleaved with decode) must
    reproduce naive greedy decoding token-for-token, including a prompt
    longer than one chunk and a second request admitted mid-stream."""
    cfg, params = _tiny()
    ecfg = EngineConfig(
        max_batch=2, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=chunk,
    )
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompts = {
        0: [(7 * i + 3) % cfg.vocab_size for i in range(chunk + 11)],
        1: [5, 9, 2],
    }
    n_new = {0: 4, 1: 5}
    for rid, p in prompts.items():
        eng.add_request(rid, p, n_new[rid])
    out = eng.run()
    for rid, p in prompts.items():
        assert list(out[rid]) == _naive_greedy(params, cfg, p, n_new[rid]), rid


@pytest.mark.parametrize("spec_k", [2, 4])
def test_engine_speculative_decode_token_exact(spec_k):
    """Speculative decoding must reproduce plain greedy decoding
    token-for-token regardless of draft quality — repetitive prompts get
    accepted drafts (multi-token steps), random ones get rejections."""
    cfg, params = _tiny()
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=64, max_seq=256,
                        speculate_k=spec_k)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompts = {
        0: [5, 9, 2, 5, 9, 2, 5, 9, 2, 5, 9],  # repetitive: drafts hit
        1: [3, 17, 42, 9, 55, 21, 60],          # arbitrary: drafts miss
    }
    n_new = {0: 7, 1: 6}
    for rid, p in prompts.items():
        eng.add_request(rid, p, n_new[rid])
    steps = 0
    while (eng.queue or eng.active) and steps < 100:
        eng.step()
        steps += 1
    for rid, p in prompts.items():
        assert list(eng.results[rid]) == _naive_greedy(params, cfg, p, n_new[rid]), rid
    # speculation must have saved steps for the repetitive prompt
    assert steps < 2 + max(n_new.values()) + 3


def test_engine_speculative_with_prefix_and_chunked():
    """All three serving features compose: chunked prefill + shared prefix
    + speculative decode, still token-exact."""
    cfg, params = _tiny()
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=64, max_seq=256,
                        prefill_chunk=16, speculate_k=3)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prefix = [(5 * i + 2) % cfg.vocab_size for i in range(2 * 16 + 5)]
    eng.register_prefix("sys", prefix)
    eng.add_request(0, [9, 4, 77], 5, prefix_id="sys")
    out = eng.run()
    assert list(out[0]) == _naive_greedy(params, cfg, prefix + [9, 4, 77], 5)


def test_engine_prefix_caching_token_exact():
    """Requests sharing a registered prefix must decode exactly like
    requests given the full concatenated prompt, while the shared pages are
    allocated once (page accounting checked)."""
    cfg, params = _tiny()
    page = 16
    ecfg = EngineConfig(
        max_batch=2, page_size=page, num_pages=64, max_seq=256,
        prefill_chunk=32,
    )
    # prefix: 2.5 pages -> 2 shared pages + 8-token remainder
    prefix = [(3 * i + 1) % cfg.vocab_size for i in range(2 * page + 8)]
    prompts = {0: [9, 4, 77], 1: [15, 2, 8, 30, 1]}
    n_new = {0: 5, 1: 4}

    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    free0 = eng.pool.free_pages()
    eng.register_prefix("sys", prefix)
    assert free0 - eng.pool.free_pages() == 2  # whole pages only
    for rid, p in prompts.items():
        eng.add_request(rid, p, n_new[rid], prefix_id="sys")
    out = eng.run()
    for rid, p in prompts.items():
        want = _naive_greedy(params, cfg, prefix + p, n_new[rid])
        assert list(out[rid]) == want, rid
    # all request pages returned; prefix pages still held
    assert eng.pool.free_pages() == free0 - 2
    eng.release_prefix("sys")
    assert eng.pool.free_pages() == free0


def test_engine_prefix_requires_chunked():
    cfg, params = _tiny()
    eng = DecodeEngine(params, cfg, EngineConfig(max_batch=2, page_size=16,
                                                 num_pages=32, max_seq=256),
                       dtype=jnp.float32)
    with pytest.raises(ValueError):
        eng.register_prefix("sys", [1, 2, 3])


def test_engine_serves_moe_family_token_exact():
    """The engine's paged decode must reproduce naive MoE recompute greedy
    decoding token-for-token (capacity_factor high enough that no token
    drops, so decode-time and prefill-time dispatches agree exactly)."""
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_forward,
    )

    cfg = MoEConfig(
        vocab_size=97, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=32, max_seq=256)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompt = [3, 17, 42, 9, 55, 21, 60]
    n_new = 5
    eng.add_request(0, prompt, n_new)
    out = eng.run()

    toks = list(prompt)
    for _ in range(n_new):
        logits, _ = moe_forward(params, jnp.asarray([toks], jnp.int32), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert list(out[0]) == toks[len(prompt):]


def test_engine_continuous_batching():
    cfg, params = _tiny()
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=64, max_seq=256)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompts = {
        0: [1, 2, 3, 4, 5],
        1: [10, 20, 30],
        2: [7] * 20,  # waits for a free slot (max_batch 2)
    }
    n_new = {0: 4, 1: 7, 2: 3}
    for rid, p in prompts.items():
        eng.add_request(rid, p, n_new[rid])
    out = eng.run()
    assert set(out) == {0, 1, 2}
    for rid in prompts:
        assert len(out[rid]) == n_new[rid]
        assert out[rid] == _naive_greedy(params, cfg, prompts[rid], n_new[rid])


def test_engine_quantized_kv_runs():
    cfg, params = _tiny()
    ecfg = EngineConfig(
        max_batch=2, page_size=16, num_pages=32, max_seq=128, kv_quant="int8"
    )
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompt = [5, 6, 7, 8]
    eng.add_request(0, prompt, 4)
    out = eng.run()
    assert len(out[0]) == 4
    # int8 per-token KV should track full-precision greedy on a tiny model
    assert out[0] == _naive_greedy(params, cfg, prompt, 4)


def test_engine_page_boundary_crossing():
    # generation crosses several page boundaries (page_size 16, ~40 tokens)
    cfg, params = _tiny()
    ecfg = EngineConfig(max_batch=1, page_size=16, num_pages=16, max_seq=128)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompt = [11, 22, 33]
    n_new = 40
    eng.add_request(0, prompt, n_new)
    out = eng.run()
    assert out[0] == _naive_greedy(params, cfg, prompt, n_new)


def test_engine_many_mixed_requests():
    """Continuous churn: more requests than slots, mixed lengths, page
    reuse across generations (BASELINE config 3 at test scale)."""
    cfg, params = _tiny()
    ecfg = EngineConfig(max_batch=4, page_size=16, num_pages=24, max_seq=128)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompts = {}
    for rid in range(12):
        n = int(rng.integers(2, 30))
        prompts[rid] = [int(t) for t in rng.integers(0, cfg.vocab_size, n)]
        eng.add_request(rid, prompts[rid], 3)
    out = eng.run()
    assert set(out) == set(prompts)
    # spot-check a few against naive greedy
    for rid in (0, 5, 11):
        assert out[rid] == _naive_greedy(params, cfg, prompts[rid], 3), rid
    # all pages returned after the run
    assert eng.pool.free_pages() == ecfg.num_pages


def test_sample_tokens_greedy_and_truncation():
    import numpy as np

    from xf_flash_attention_cutlass_tpu.serve.engine import sample_tokens

    logits = jnp.asarray(
        [[0.0, 3.0, 1.0, 2.0], [5.0, 0.0, 0.0, 0.0]], jnp.float32
    )
    # no temperature -> argmax
    assert list(np.asarray(sample_tokens(logits))) == [1, 0]
    # temperature 0 rows -> argmax even with a key
    key = jax.random.PRNGKey(0)
    t0 = sample_tokens(logits, jnp.asarray([0.0, 0.0]), key, top_k=2)
    assert list(np.asarray(t0)) == [1, 0]
    # top_k=1 forces argmax at any temperature
    t1 = sample_tokens(logits, jnp.asarray([5.0, 5.0]), key, top_k=1)
    assert list(np.asarray(t1)) == [1, 0]
    # top_p tiny -> only the top token survives
    t2 = sample_tokens(logits, jnp.asarray([5.0, 5.0]), key, top_p=1e-6)
    assert list(np.asarray(t2)) == [1, 0]
    # high temperature without truncation: samples stay in range and are
    # deterministic for a fixed key
    t3 = sample_tokens(logits, jnp.asarray([10.0, 10.0]), key)
    t4 = sample_tokens(logits, jnp.asarray([10.0, 10.0]), key)
    assert list(np.asarray(t3)) == list(np.asarray(t4))
    assert all(0 <= int(x) < 4 for x in np.asarray(t3))


def test_engine_temperature_zero_matches_greedy():
    cfg, params = _tiny()
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=32, max_seq=256)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompt = [3, 17, 42, 9]
    eng.add_request(0, prompt, 5, temperature=0.0)
    out = eng.run()
    assert list(out[0]) == _naive_greedy(params, cfg, prompt, 5)


def test_engine_sampled_decode_runs_and_is_deterministic():
    cfg, params = _tiny()
    prompt = [3, 17, 42, 9, 55]

    def run_once():
        ecfg = EngineConfig(
            max_batch=2, page_size=16, num_pages=32, max_seq=256,
            top_k=8, sample_seed=7,
        )
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        eng.add_request(0, prompt, 6, temperature=1.3)
        eng.add_request(1, prompt[::-1], 6, temperature=0.0)
        return eng.run()

    a = run_once()
    b = run_once()
    assert a[0] == b[0] and a[1] == b[1]  # seeded => reproducible
    assert all(0 <= t < cfg.vocab_size for t in a[0])
    # the greedy request must be unaffected by the sampled one
    assert list(a[1]) == _naive_greedy(params, cfg, prompt[::-1], 6)


def test_engine_int8_weights_matches_naive_on_same_params():
    from xf_flash_attention_cutlass_tpu.models.llama import quantize_params

    cfg, params = _tiny()
    qparams = quantize_params(params)
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=32, max_seq=256)
    eng = DecodeEngine(qparams, cfg, ecfg, dtype=jnp.float32)
    prompt = [3, 17, 42, 9, 55]
    eng.add_request(0, prompt, 5)
    out = eng.run()
    # oracle: naive full-recompute forward with the SAME quantized params
    assert list(out[0]) == _naive_greedy(qparams, cfg, prompt, 5)


def test_engine_stats():
    """Serving observability counters (SURVEY §5: reference has none)."""
    cfg, params = _tiny()
    eng = DecodeEngine(params, cfg, EngineConfig(
        max_batch=2, page_size=16, num_pages=24, speculate_k=3))
    eng.add_request(0, [5, 9, 13, 7], max_new_tokens=6)
    eng.add_request(1, [3, 3, 3, 3, 3], max_new_tokens=4)
    eng.run()
    s = eng.stats_summary()
    assert s["requests_admitted"] == 2
    assert s["requests_finished"] == 2
    assert s["tokens_emitted"] == 10
    assert s["spec_steps"] > 0
    assert s["drafts_proposed"] >= s["drafts_accepted"] >= 0
    assert 0.0 <= s["draft_acceptance"] <= 1.0
    assert s["tokens_per_step"] >= 1.0
    assert s["active_requests"] == 0 and s["queued_requests"] == 0
    # all pages returned after retirement
    assert s["page_utilization"] == 0.0


def test_engine_batched_prefill_lanes_token_exact():
    """8 simultaneous admissions through 4 prefill lanes (one batched
    chunk step advances every lane) must match naive greedy decoding
    token-for-token for every request — admission bursts must not
    serialize behind one long prompt."""
    cfg, params = _tiny()
    ecfg = EngineConfig(
        max_batch=8, page_size=16, num_pages=128, max_seq=256,
        prefill_chunk=32, prefill_lanes=4,
    )
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompts = {
        rid: [(7 * i + 3 * rid + 5) % cfg.vocab_size for i in range(9 + 13 * rid)]
        for rid in range(8)
    }
    for rid, p in prompts.items():
        eng.add_request(rid, p, 4)
    out = eng.run()
    for rid, p in prompts.items():
        assert list(out[rid]) == _naive_greedy(params, cfg, p, 4), rid
    # >1 admission per prefill phase actually happened
    assert eng.stats["requests_admitted"] == 8


def test_engine_prefill_lanes_with_prefix_and_spec():
    """Lanes compose with prefix caching + speculative decode."""
    cfg, params = _tiny()
    ecfg = EngineConfig(
        max_batch=4, page_size=16, num_pages=128, max_seq=256,
        prefill_chunk=16, prefill_lanes=2, speculate_k=3,
    )
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prefix = [(3 * i + 1) % cfg.vocab_size for i in range(16)]
    eng.register_prefix("sys", prefix)
    prompts = {
        0: [5, 9, 2, 44],
        1: [(5 * i + 2) % cfg.vocab_size for i in range(21)],
        2: [7, 7, 7],
    }
    for rid in (0, 1):
        eng.add_request(rid, prompts[rid], 5, prefix_id="sys")
    eng.add_request(2, prompts[2], 5)
    out = eng.run()
    for rid in (0, 1):
        full = prefix + prompts[rid]
        assert list(out[rid]) == _naive_greedy(params, cfg, full, 5), rid
    assert list(out[2]) == _naive_greedy(params, cfg, prompts[2], 5)


def test_engine_speculative_moe_token_exact():
    """Speculative decoding composes with the MoE family (the verifier's
    L-token step runs the MoE MLP at L>1): stream equals naive greedy."""
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_forward,
    )

    cfg = MoEConfig(
        vocab_size=97, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=32, max_seq=256,
                        prefill_chunk=16, speculate_k=3)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    prompt = [3, 7, 7, 7, 7, 21, 60]
    n_new = 6
    eng.add_request(0, prompt, n_new)
    out = eng.run()
    toks = list(prompt)
    for _ in range(n_new):
        logits, _ = moe_forward(params, jnp.asarray([toks], jnp.int32), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert list(out[0]) == toks[len(prompt):]


def test_sample_tokens_pure_top_p_fast_path():
    """Pure top-p (top_k=0) routes through the approx_max_k prefix
    (round-4 verdict #5): every sampled token must lie inside the TRUE
    nucleus, and the exact opt-out (approx_top_k=False) must agree on
    support. V=512 with a peaked distribution whose p=0.7 nucleus is a
    handful of tokens."""
    import numpy as np

    from xf_flash_attention_cutlass_tpu.serve.engine import sample_tokens

    rng = np.random.RandomState(3)
    b, V, p = 4, 512, 0.7
    logits_np = rng.randn(b, V).astype(np.float32)
    # sharpen so the nucleus is small and well separated from the tail
    logits_np[np.arange(b), rng.randint(0, V, b)] += 6.0
    logits_np[np.arange(b), rng.randint(0, V, b)] += 5.0
    logits = jnp.asarray(logits_np)
    temps = jnp.ones((b,), jnp.float32)

    # exact nucleus per row (sequential-filter convention: keep tokens
    # until cumulative prob first reaches p; the top token always stays)
    nucleus = []
    for i in range(b):
        order = np.argsort(-logits_np[i])
        pr = np.exp(logits_np[i][order] - logits_np[i].max())
        pr = pr / pr.sum()
        cum = np.cumsum(pr)
        keep = (cum - pr) < p
        nucleus.append(set(order[keep].tolist()))

    for trial in range(50):
        key = jax.random.PRNGKey(trial)
        fast = np.asarray(
            sample_tokens(logits, temps, key, top_p=p, approx_top_k=True)
        )
        exact = np.asarray(
            sample_tokens(logits, temps, key, top_p=p, approx_top_k=False)
        )
        for i in range(b):
            assert int(fast[i]) in nucleus[i], (trial, i)
            assert int(exact[i]) in nucleus[i], (trial, i)


def test_engine_config_approx_top_k_knob():
    """EngineConfig.approx_top_k plumbs through to sampling (round-4
    verdict #7): an exact-sampling engine runs end-to-end, and pure
    top-p configs no longer need top_k set."""
    cfg, params = _tiny()
    outs = {}
    for approx in (True, False):
        ecfg = EngineConfig(
            max_batch=2, page_size=16, num_pages=32, max_seq=256,
            top_p=0.8, top_k=0, approx_top_k=approx, sample_seed=7,
        )
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        eng.add_request(0, [3, 17, 42, 9], 5, temperature=0.8)
        outs[approx] = eng.run()[0]
        assert len(outs[approx]) == 5
        assert all(0 <= int(t) < cfg.vocab_size for t in outs[approx])


def test_engine_preemption_token_identity():
    """Preemption correctness (round-4 verdict #4): with too few pages for
    the decode phase, requests get preempted (OOM on extend), requeued
    with their full context, and resumed via prefill — and every
    request's FINAL stream (pre-preemption tokens + resumed tokens) is
    token-identical to an uncontended run of the same prompt."""
    cfg, params = _tiny()
    rng = np.random.default_rng(42)
    prompts = {
        rid: [int(t) for t in rng.integers(0, cfg.vocab_size, 17 + 3 * rid)]
        for rid in range(4)
    }
    max_new = 40

    # uncontended reference: plenty of pages, one request at a time
    ref = {}
    for rid, prompt in prompts.items():
        ecfg = EngineConfig(max_batch=1, page_size=16, num_pages=64,
                            max_seq=256)
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        eng.add_request(rid, prompt, max_new)
        ref[rid] = eng.run()[rid]
        assert len(ref[rid]) == max_new

    # contended: 4 slots but only 12 pages -> admits all four (2 pages
    # each) and OOMs during decode growth, forcing preemptions
    ecfg = EngineConfig(max_batch=4, page_size=16, num_pages=12, max_seq=256)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    for rid, prompt in prompts.items():
        eng.add_request(rid, prompt, max_new)
    out = eng.run()
    stats = eng.stats_summary()
    assert stats["preemptions"] > 0, stats
    assert eng.pool.free_pages() == ecfg.num_pages  # all pages returned
    assert not eng._preempt_emitted  # fully drained into results
    for rid in prompts:
        assert out[rid] == ref[rid], (
            rid, stats["preemptions"], len(out[rid]), len(ref[rid])
        )


def test_engine_preemption_with_prefix_and_spec():
    """Preemption composed with prefix caching + speculative decode
    (round-4 verdict #4: the spec-decode rollback interaction at the
    L-token extend): preempted spec/prefix requests resume and finish
    with exactly the uncontended stream."""
    cfg, params = _tiny()
    prefix = [(5 * i + 2) % cfg.vocab_size for i in range(32)]
    prompts = {
        rid: [(3 * i + rid) % cfg.vocab_size for i in range(9)]
        for rid in range(3)
    }
    max_new = 24

    def make(num_pages):
        ecfg = EngineConfig(
            max_batch=3, page_size=16, num_pages=num_pages, max_seq=256,
            prefill_chunk=16, speculate_k=3,
        )
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        eng.register_prefix("sys", prefix)
        return eng

    ref = {}
    for rid, prompt in prompts.items():
        eng = make(64)
        eng.add_request(rid, prompt, max_new, prefix_id="sys")
        ref[rid] = eng.run()[rid]
        assert len(ref[rid]) == max_new

    # shared prefix holds 2 pages; 9 total pages leave only 7 for three
    # requests that each grow to 3 own pages -> preemption under spec
    # decode's L-token extend
    eng = make(9)
    for rid, prompt in prompts.items():
        eng.add_request(rid, prompt, max_new, prefix_id="sys")
    out = eng.run()
    stats = eng.stats_summary()
    assert stats["preemptions"] > 0, stats
    for rid in prompts:
        assert out[rid] == ref[rid], (rid, stats["preemptions"])


@pytest.mark.parametrize("kv_quant", ["int8", "fp8_e4m3"])
def test_engine_chunked_prefill_quant_small_page(kv_quant):
    """Quantized page-16 engines with page-aligned chunked prefill now
    take the Pallas storage-coordinate append (round-4 verdict #2, no
    pool copy per chunk) and must stay token-identical to naive greedy
    AND to the same engine at a 128-multiple page size. head_dim must be
    128 (the Pallas append path's lane requirement) or this test would
    silently exercise only the scatter fallback."""
    cfg = LlamaConfig(
        vocab_size=97, dim=256, n_layers=2, n_heads=2, n_kv_heads=1,
        ffn_dim=128, max_seq_len=512,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    prompts = {
        0: [(7 * i + 3) % cfg.vocab_size for i in range(45)],
        1: [5, 9, 2, 33, 8, 1, 60, 4],
    }
    n_new = {0: 5, 1: 6}

    outs = {}
    # "padded": literal page-16 padded pools (pack_small_pages=False) —
    # exercises the engine-level padded Pallas prefill append;
    # "packed": page-16 served pair-packed as 32-row tiles (default);
    # 128: tight reference geometry
    legs = {
        "padded": dict(page_size=16, num_pages=64, prefill_chunk=32,
                       pack_small_pages=False),
        "packed": dict(page_size=16, num_pages=64, prefill_chunk=32),
        128: dict(page_size=128, num_pages=8, prefill_chunk=128),
    }
    for name, kw in legs.items():
        ecfg = EngineConfig(max_batch=2, max_seq=256, kv_quant=kv_quant,
                            **kw)
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        if name == "packed":
            assert eng.ecfg.page_size == 32 and eng.ecfg.num_pages == 32
        for rid, p in prompts.items():
            eng.add_request(rid, p, n_new[rid])
        outs[name] = eng.run()
    for rid, p in prompts.items():
        # all layouts share per-token quant math -> identical streams
        assert list(outs["padded"][rid]) == list(outs[128][rid]), rid
        assert list(outs["packed"][rid]) == list(outs[128][rid]), rid
        if kv_quant == "int8":
            # int8 KV tracks full-precision greedy on this tiny model
            # (fp8-E4M3's 3-bit mantissa legitimately diverges a few
            # tokens in)
            want = _naive_greedy(params, cfg, p, n_new[rid])
            assert list(outs[128][rid]) == want, rid


@pytest.mark.parametrize("temp", [0.0, 0.8])
def test_engine_multi_step_token_identity(temp):
    """Multi-step scheduling (K decode steps per dispatch, round 5):
    streams must be token-identical to the per-step engine — same
    sampling key schedule, overshoot tokens trimmed — including
    mid-window finishes (staggered max_new)."""
    cfg, params = _tiny()
    prompts = {0: [3, 17, 42, 9], 1: [5, 9, 2, 33, 8, 1, 60]}
    max_new = {0: 10, 1: 7}  # 7 finishes mid-window at K=4

    outs = {}
    for K in (1, 4):
        ecfg = EngineConfig(
            max_batch=2, page_size=16, num_pages=64, max_seq=256,
            multi_step=K, top_k=8 if temp else 0, sample_seed=5,
        )
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        for rid, p in prompts.items():
            eng.add_request(rid, p, max_new[rid], temperature=temp)
        outs[K] = eng.run()
        assert eng.pool.free_pages() == ecfg.num_pages
    for rid in prompts:
        assert list(outs[1][rid]) == list(outs[4][rid]), (rid, temp)
        assert len(outs[4][rid]) == max_new[rid]


def test_engine_multi_step_with_preemption():
    """Multi-step windows pre-extend pages by K, so preemption triggers
    earlier than per-step mode — but preempted requests still resume to
    the exact uncontended stream."""
    cfg, params = _tiny()
    rng = np.random.default_rng(9)
    prompts = {
        rid: [int(t) for t in rng.integers(0, cfg.vocab_size, 17 + rid)]
        for rid in range(3)
    }
    max_new = 30

    ref = {}
    for rid, prompt in prompts.items():
        ecfg = EngineConfig(max_batch=1, page_size=16, num_pages=64,
                            max_seq=256)
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        eng.add_request(rid, prompt, max_new)
        ref[rid] = eng.run()[rid]

    ecfg = EngineConfig(max_batch=3, page_size=16, num_pages=9,
                        max_seq=256, multi_step=4)
    eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
    for rid, prompt in prompts.items():
        eng.add_request(rid, prompt, max_new)
    out = eng.run()
    assert eng.stats_summary()["preemptions"] > 0
    for rid in prompts:
        assert out[rid] == ref[rid], rid


def test_engine_multi_step_with_chunked_prefill_and_prefix():
    """Multi-step windows only engage when prefill lanes are idle and the
    queue is empty — composed with chunked prefill + a shared prefix the
    streams must still be identical to per-step mode."""
    cfg, params = _tiny()
    prefix = [(5 * i + 2) % cfg.vocab_size for i in range(40)]
    prompts = {1: [3, 5, 7], 2: [11, 13, 17, 19, 23]}

    outs = {}
    for K in (1, 4):
        ecfg = EngineConfig(
            max_batch=2, page_size=16, num_pages=64, max_seq=256,
            prefill_chunk=16, multi_step=K,
        )
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        eng.register_prefix("sys", prefix)
        for rid, p in prompts.items():
            eng.add_request(rid, p, 9, prefix_id="sys")
        outs[K] = eng.run()
    for rid in prompts:
        assert list(outs[1][rid]) == list(outs[4][rid]), rid
        assert len(outs[4][rid]) == 9


def test_engine_multi_step_eos_mid_window():
    """EOS landing inside a multi-step window: overshoot tokens after the
    eos must be trimmed and the stream must equal per-step mode's (which
    stops at eos naturally)."""
    cfg, params = _tiny()
    prompt = [3, 17, 42, 9]

    # find what greedy emits so we can plant a real eos mid-stream
    probe = DecodeEngine(
        params, cfg,
        EngineConfig(max_batch=1, page_size=16, num_pages=32, max_seq=256),
        dtype=jnp.float32,
    )
    probe.add_request(0, prompt, 10)
    stream = probe.run()[0]
    eos = stream[5]  # fires at position 5 (or earlier if repeated)
    want = stream[: stream.index(eos) + 1]

    outs = {}
    for K in (1, 4):
        ecfg = EngineConfig(
            max_batch=1, page_size=16, num_pages=32, max_seq=256,
            eos_token=eos, multi_step=K,
        )
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32)
        eng.add_request(0, prompt, 10)
        outs[K] = eng.run()[0]
    assert list(outs[1]) == want
    assert list(outs[4]) == want
