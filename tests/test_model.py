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
