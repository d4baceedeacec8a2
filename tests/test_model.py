"""Flagship model tests: forward, gradients, weight-only quantization."""

import jax
import jax.numpy as jnp
import numpy as np

from xf_flash_attention_cutlass_tpu.models.llama import (
    LlamaConfig,
    forward,
    init_params,
    loss_fn,
    quantize_params,
)
from xf_flash_attention_cutlass_tpu.utils.testing import max_err


def _tiny(dtype=jnp.float32):
    cfg = LlamaConfig(
        vocab_size=101, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    return cfg, init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)


def test_forward_shape_finite():
    cfg, params = _tiny()
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 33), 0, cfg.vocab_size)
    logits = forward(params, tokens, cfg)
    assert logits.shape == (2, 33, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_forward_causality():
    # changing a future token must not change past logits
    cfg, params = _tiny()
    t1 = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)
    t2 = t1.at[0, 10].set((t1[0, 10] + 1) % cfg.vocab_size)
    l1 = forward(params, t1, cfg)
    l2 = forward(params, t2, cfg)
    assert max_err(l1[:, :10], l2[:, :10]) < 1e-5
    assert max_err(l1[:, 10:], l2[:, 10:]) > 1e-6  # sanity: change visible


def test_grad_finite_and_nonzero():
    cfg, params = _tiny()
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 24), 0, cfg.vocab_size)
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
    assert bool(jnp.isfinite(loss))
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_sgd_step_reduces_loss():
    cfg, params = _tiny()
    tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 32), 0, cfg.vocab_size)
    loss0, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
    params2 = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params, grads)
    loss1 = loss_fn(params2, tokens, cfg)
    assert float(loss1) < float(loss0)


def test_quantized_params_close():
    cfg, params = _tiny()
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 20), 0, cfg.vocab_size)
    logits = forward(params, tokens, cfg)
    qparams = quantize_params(params)
    qlogits = forward(qparams, tokens, cfg)
    # int8 weight-only: a few percent relative error on logits
    rel = max_err(logits, qlogits) / float(jnp.max(jnp.abs(logits)))
    assert rel < 0.05, rel
    # greedy decisions should almost always agree on random nets
    agree = float(
        jnp.mean((jnp.argmax(logits, -1) == jnp.argmax(qlogits, -1)).astype(jnp.float32))
    )
    assert agree > 0.8


def test_quantized_stack_perplexity():
    """BASELINE config 4/5 accuracy: int8 weight-only + int8 KV decode must
    match full-precision next-token NLL within a few percent."""
    from xf_flash_attention_cutlass_tpu.models.llama import loss_fn

    cfg, params = _tiny()
    tokens = jax.random.randint(jax.random.PRNGKey(9), (2, 48), 0, cfg.vocab_size)
    nll_full = float(loss_fn(params, tokens, cfg))
    qparams = quantize_params(params)
    nll_q = float(loss_fn(qparams, tokens, cfg))
    assert abs(nll_q - nll_full) / nll_full < 0.03, (nll_full, nll_q)


def test_quantized_kv_decode_logits_close():
    """Paged int8-KV decode logits vs full-precision decode logits."""
    import numpy as np
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv
    from xf_flash_attention_cutlass_tpu.serve.engine import decode_step
    from xf_flash_attention_cutlass_tpu.ops.kvcache import append_kv_paged

    cfg, params = _tiny()
    L, num_pages, page, b, mp = cfg.n_layers, 10, 16, 2, 4
    # seed pools with KV from a pretend prefill (random but consistent)
    kpool = jax.random.normal(
        jax.random.PRNGKey(1),
        (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32,
    ) * 0.5
    vpool = jax.random.normal(jax.random.PRNGKey(2), kpool.shape, jnp.float32) * 0.5
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    kv_lens = jnp.asarray([30, 55], jnp.int32)
    tokens = jnp.asarray([[3], [7]], jnp.int32)

    # decode_step donates pools; hand it copies
    _, logits_full, _ = decode_step(
        params, tokens, dict(k=kpool.copy(), v=vpool.copy()), bt, kv_lens,
        cfg, None,
    )
    kq, ks = quantize_kv(kpool, "int8")
    vq, vs = quantize_kv(vpool, "int8")
    _, logits_q, _ = decode_step(
        params, tokens,
        dict(k=kq, v=vq, k_s=ks[..., 0], v_s=vs[..., 0]),
        bt, kv_lens, cfg, "int8",
    )
    rel = max_err(logits_q, logits_full) / float(jnp.max(jnp.abs(logits_full)))
    assert rel < 0.02, rel
