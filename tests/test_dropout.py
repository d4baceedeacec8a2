"""Dropout tests — the analog of the reference's statistical dropout checks
(`get_dropout_fraction` within 0.01 of p, /root/reference/test.py:549-584,
977-981) plus fwd/bwd mask-replay consistency, which the reference never
tests (its dropout backward is compiled out)."""

import jax
import jax.numpy as jnp
import numpy as np

from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention
from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
from xf_flash_attention_cutlass_tpu.utils.testing import max_err, rand


def test_dropout_deterministic():
    b, h, s, d = 1, 2, 256, 64
    q = rand(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32)
    o1, _ = flash_fwd(q, q, q, dropout_p=0.3, dropout_seed=7)
    o2, _ = flash_fwd(q, q, q, dropout_p=0.3, dropout_seed=7)
    o3, _ = flash_fwd(q, q, q, dropout_p=0.3, dropout_seed=8)
    assert max_err(o1, o2) == 0.0
    assert max_err(o1, o3) > 1e-3  # different seed -> different mask


def test_dropout_p0_is_identity():
    b, h, s, d = 1, 2, 192, 64
    q = rand(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32)
    o0, _ = flash_fwd(q, q, q, causal=True)
    o1, _ = flash_fwd(q, q, q, causal=True, dropout_p=0.0)
    assert max_err(o0, o1) == 0.0


def test_dropout_fraction():
    """With q=k=0 (uniform attention) and v=1, each output element equals
    realized_keep_fraction / (1 - p): the realized dropout fraction must sit
    within 0.01 of p (the reference's tolerance, test.py:981)."""
    p = 0.17
    b, h, s, d = 2, 4, 512, 64
    q = jnp.zeros((b, h, s, d), jnp.float32)
    v = jnp.ones((b, h, s, d), jnp.float32)
    o, _ = flash_fwd(q, q, v, dropout_p=p, dropout_seed=3)
    keep_frac = float(jnp.mean(o)) * (1.0 - p)
    assert abs((1.0 - keep_frac) - p) < 0.01, keep_frac


def test_dropout_grad_matches_finite_difference():
    """fwd/bwd mask replay: autodiff gradients under dropout must match
    finite differences of the (deterministic, seeded) forward."""
    b, h, s, d = 1, 1, 256, 64
    key = jax.random.PRNGKey(0)
    q = rand(key, (b, h, s, d), jnp.float32, scale=0.5)
    k = rand(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32, scale=0.5)
    v = rand(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32, scale=0.5)
    w = rand(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)

    def loss(q, k, v):
        o, _ = flash_attention(q, k, v, causal=True, dropout_p=0.25,
                               dropout_seed=11)
        return jnp.sum(o * w)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rng = np.random.default_rng(0)
    eps = 1e-2
    for name, x, g in (("q", q, gq), ("k", k, gk), ("v", v, gv)):
        for _ in range(4):
            idx = tuple(rng.integers(0, n) for n in x.shape)
            dx = jnp.zeros_like(x).at[idx].set(eps)
            if name == "q":
                fd = (loss(x + dx, k, v) - loss(x - dx, k, v)) / (2 * eps)
            elif name == "k":
                fd = (loss(q, x + dx, v) - loss(q, x - dx, v)) / (2 * eps)
            else:
                fd = (loss(q, k, x + dx) - loss(q, k, x - dx)) / (2 * eps)
            ad = float(g[idx])
            assert abs(ad - float(fd)) < 2e-2 + 0.05 * abs(ad), (
                name, idx, ad, float(fd)
            )


def test_dropout_causal_masked_stay_zero():
    # dropout must never resurrect masked positions: empty rows stay 0
    b, h, sq, sk, d = 1, 1, 256, 128, 64
    q = rand(jax.random.PRNGKey(0), (b, h, sq, d), jnp.float32)
    k = rand(jax.random.PRNGKey(1), (b, h, sk, d), jnp.float32)
    v = rand(jax.random.PRNGKey(2), (b, h, sk, d), jnp.float32)
    o, lse = flash_fwd(q, k, v, causal=True, dropout_p=0.4, dropout_seed=5)
    n_empty = sq - sk
    assert float(jnp.max(jnp.abs(o[:, :, :n_empty]))) == 0.0
    assert bool(jnp.all(jnp.isneginf(lse[:, :, :n_empty])))


def test_dropout_paged_varlen_fraction():
    """Dropout through the paged varlen entry (the reference's varlen path
    carries dropout, export.cpp:669-937; api.py routes it through the
    packed dense kernel). Same statistical check: with uniform attention
    and v=1, realized dropout fraction within 0.01 of p."""
    from xf_flash_attention_cutlass_tpu.api import flash_attn_varlen_func

    p = 0.17
    h, h_k, d, page = 4, 4, 64, 16
    lens_q = [60, 100, 36]
    lens_k = [64, 112, 48]
    total_q = sum(lens_q)
    b = len(lens_q)
    max_pages = max(lens_k) // page + 1
    num_blocks = b * max_pages
    cu_q = jnp.asarray(np.cumsum([0] + lens_q), jnp.int32)
    cu_k = jnp.asarray(np.cumsum([0] + lens_k), jnp.int32)
    bt = jnp.arange(num_blocks, dtype=jnp.int32).reshape(b, max_pages)

    q = jnp.zeros((total_q, h, d), jnp.float32)
    k_cache = jnp.zeros((num_blocks, page, h_k, d), jnp.float32)
    v_cache = jnp.ones((num_blocks, page, h_k, d), jnp.float32)

    out = flash_attn_varlen_func(
        q, k_cache, v_cache, cu_q, cu_k,
        max_seqlen_q=max(lens_q), max_seqlen_k=max(lens_k),
        dropout_p=p, block_table=bt,
        seqused_k=jnp.asarray(lens_k, jnp.int32), dropout_seed=3,
    )
    keep_frac = float(jnp.mean(out)) * (1.0 - p)
    assert abs((1.0 - keep_frac) - p) < 0.01, keep_frac
