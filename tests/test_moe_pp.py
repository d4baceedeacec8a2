"""MoE (expert-parallel) and pipeline-parallel tests on the virtual CPU mesh.

Parity scheme: the sharded execution must reproduce the single-device
model bit-for-tolerance (same math, different placement), mirroring the
TP tests in test_parallel.py.
"""

import jax
import jax.numpy as jnp
import pytest

from xf_flash_attention_cutlass_tpu.models.llama import (
    LlamaConfig,
    forward,
    init_params,
    loss_fn,
)
from xf_flash_attention_cutlass_tpu.models.moe import (
    MoEConfig,
    expert_capacity,
    init_moe_params,
    moe_forward,
    moe_loss_fn,
    moe_mlp_block,
    moe_mlp_block_dense_oracle,
    top_k_dispatch,
)
from xf_flash_attention_cutlass_tpu.parallel import (
    make_mesh,
    moe_ep_forward,
    moe_ep_loss_and_grad,
    pp_forward,
    pp_loss_and_grad,
    shard_moe_params,
    shard_pp_params,
)
from xf_flash_attention_cutlass_tpu.utils.testing import max_err


def _cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return devs[:n]


def _tiny_moe():
    cfg = MoEConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
        ffn_dim=96, max_seq_len=256, n_experts=4, top_k=2,
    )
    return cfg, init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)


# ---------------------------------------------------------------- dispatch


def test_top_k_dispatch_seats_and_weights():
    n, E, C, k = 16, 4, 16, 2
    probs = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(0), (n, E)), axis=-1
    )
    dispatch, combine, aux = top_k_dispatch(probs, k, C)
    # every token seated exactly k times when capacity is unbounded
    assert int(jnp.sum(dispatch)) == n * k
    # each (expert, slot) holds at most one token
    assert int(jnp.max(jnp.sum(dispatch, axis=0))) <= 1
    # combine weights per token sum to 1 (renormalized top-k gates)
    assert max_err(jnp.sum(combine, axis=(1, 2)), jnp.ones((n,))) < 1e-6
    assert jnp.isfinite(aux)


def test_top_k_dispatch_drops_overflow():
    n, E, k = 12, 2, 1
    # all tokens pick expert 0
    probs = jnp.tile(jnp.asarray([[0.9, 0.1]]), (n, 1))
    dispatch, combine, _ = top_k_dispatch(probs, k, capacity=4)
    assert int(jnp.sum(dispatch)) == 4  # only 4 seats exist
    # the first 4 tokens (priority order) got the seats
    assert int(jnp.sum(dispatch[:4])) == 4


def test_moe_block_matches_dense_oracle_when_uncrowded():
    cfg, params = _tiny_moe()
    layer = jax.tree_util.tree_map(lambda x: x[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, cfg.dim), jnp.float32)
    # capacity >= n tokens: nothing can drop -> dispatch path == oracle
    out, aux = moe_mlp_block(layer, x, cfg, capacity=2 * 8 * cfg.top_k)
    ref = moe_mlp_block_dense_oracle(layer, x, cfg)
    assert max_err(out, ref) < 1e-5
    assert jnp.isfinite(aux)


# ------------------------------------------------------------ expert parallel


@pytest.mark.parametrize("dp,ep", [(1, 2), (1, 4), (2, 2)])
def test_moe_ep_forward_matches_single(dp, ep):
    cfg, params = _tiny_moe()
    mesh = make_mesh(dp=dp, ep=ep, devices=_cpu_devices(dp * ep))
    b = 2 * dp * ep
    s = 16
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size)
    # the sharded run dispatches per shard of b//(dp*ep) sequences; use the
    # same capacity in the reference so seating (and drops) are identical
    cap = expert_capacity(cfg, (b // (dp * ep)) * s)

    def ref_one(tok):  # route each shard's slice independently
        return moe_forward(params, tok, cfg, capacity=cap)[0]

    shard_b = b // (dp * ep)
    ref = jnp.concatenate(
        [ref_one(tokens[i : i + shard_b]) for i in range(0, b, shard_b)]
    )
    out, aux = moe_ep_forward(shard_moe_params(params, mesh), tokens, cfg, mesh)
    assert max_err(out, ref) < 1e-4
    assert jnp.isfinite(aux)


def test_moe_ep_loss_and_grad_matches_single():
    cfg, params = _tiny_moe()
    dp, ep = 2, 2
    mesh = make_mesh(dp=dp, ep=ep, devices=_cpu_devices(4))
    b, s = 4, 17
    tokens = jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, cfg.vocab_size)
    cap = expert_capacity(cfg, (b // (dp * ep)) * (s - 1))

    def ref_loss(p):
        shard_b = b // (dp * ep)
        losses = [
            moe_loss_fn(p, tokens[i : i + shard_b], cfg, capacity=cap)
            for i in range(0, b, shard_b)
        ]
        return sum(losses) / len(losses)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    loss, grads = moe_ep_loss_and_grad(
        shard_moe_params(params, mesh), tokens, cfg, mesh
    )
    assert abs(float(loss) - float(ref_l)) < 1e-5
    err = jax.tree_util.tree_map(lambda a, b: max_err(a, b), grads, ref_g)
    worst = max(jax.tree_util.tree_leaves(err))
    assert worst < 1e-4, worst


# ------------------------------------------------------------------ pipeline


def _tiny_llama():
    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=4, n_heads=4, n_kv_heads=4,
        ffn_dim=96, max_seq_len=256,
    )
    return cfg, init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (2, 4), (4, 4)])
def test_pp_forward_matches_single(pp, n_micro):
    cfg, params = _tiny_llama()
    mesh = make_mesh(pp=pp, devices=_cpu_devices(pp))
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (n_micro * 2, 16), 0, cfg.vocab_size
    )
    ref = forward(params, tokens, cfg)
    out = pp_forward(
        shard_pp_params(params, mesh), tokens, cfg, mesh, n_micro=n_micro
    )
    assert max_err(out, ref) < 1e-4


@pytest.mark.parametrize("dp,pp,tp", [(1, 2, 2), (2, 2, 2)])
def test_pp_tp_3d_loss_and_grad_matches_single(dp, pp, tp):
    """Full 3-D composition: stages over pp, Megatron shards over tp,
    batch over dp — loss and every grad must match the single-device step."""
    cfg, params = _tiny_llama()
    mesh = make_mesh(dp=dp, pp=pp, tp=tp, devices=_cpu_devices(dp * pp * tp))
    b = 2 * dp
    tokens = jax.random.randint(jax.random.PRNGKey(3), (b, 17), 0, cfg.vocab_size)

    def ref_loss(p):
        shard_b = b // dp
        losses = [
            loss_fn(p, tokens[i : i + shard_b], cfg)
            for i in range(0, b, shard_b)
        ]
        return sum(losses) / len(losses)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    loss, grads = pp_loss_and_grad(
        shard_pp_params(params, mesh), tokens, cfg, mesh, n_micro=2
    )
    assert abs(float(loss) - float(ref_l)) < 1e-5
    err = jax.tree_util.tree_map(lambda a, b: max_err(a, b), grads, ref_g)
    worst = max(jax.tree_util.tree_leaves(err))
    assert worst < 1e-4, worst


def test_pp_loss_and_grad_matches_single():
    cfg, params = _tiny_llama()
    dp, pp, n_micro = 2, 2, 2
    mesh = make_mesh(dp=dp, pp=pp, devices=_cpu_devices(dp * pp))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 17), 0, cfg.vocab_size)

    def ref_loss(p):
        # dp shards average their per-shard token means
        return (loss_fn(p, tokens[:2], cfg) + loss_fn(p, tokens[2:], cfg)) / 2

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    loss, grads = pp_loss_and_grad(
        shard_pp_params(params, mesh), tokens, cfg, mesh, n_micro=n_micro
    )
    assert abs(float(loss) - float(ref_l)) < 1e-5
    err = jax.tree_util.tree_map(lambda a, b: max_err(a, b), grads, ref_g)
    worst = max(jax.tree_util.tree_leaves(err))
    assert worst < 1e-4, worst


def test_moe_quantized_weights_accuracy():
    """INT8 weight-only MoE (quantize_moe_params): logits track the
    full-precision model within the weight-quant tolerance, and the
    engine serves the quantized family token-identically to naive
    quantized recompute."""
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_forward, quantize_moe_params,
    )

    cfg = MoEConfig(
        vocab_size=97, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_moe_params(params)
    toks = jnp.asarray([[3, 17, 42, 9, 55, 21, 60]], jnp.int32)
    ref, _ = moe_forward(params, toks, cfg)
    out, _ = moe_forward(qparams, toks, cfg)
    # weight-only int8: logits close but not exact
    assert float(jnp.max(jnp.abs(out - ref))) < 0.15, float(
        jnp.max(jnp.abs(out - ref))
    )


def test_engine_serves_quantized_moe_token_exact():
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params, moe_forward, quantize_moe_params,
    )
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg = MoEConfig(
        vocab_size=97, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_moe_params(params)
    ecfg = EngineConfig(max_batch=2, page_size=16, num_pages=32, max_seq=256)
    eng = DecodeEngine(qparams, cfg, ecfg, dtype=jnp.float32)
    prompt = [3, 17, 42, 9, 55, 21, 60]
    n_new = 5
    eng.add_request(0, prompt, n_new)
    out = eng.run()

    toks = list(prompt)
    for _ in range(n_new):
        logits, _ = moe_forward(qparams, jnp.asarray([toks], jnp.int32), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert list(out[0]) == toks[len(prompt):]
