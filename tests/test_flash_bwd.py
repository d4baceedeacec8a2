"""Gradients of flash attention vs the jnp oracle — the reference's gradient
checks (3x fp16-reference error, /root/reference/test.py:920-986, shipped
commented-out there; enabled here for all head dims)."""

import jax
import jax.numpy as jnp
import pytest

from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention
from xf_flash_attention_cutlass_tpu.ops.reference import (
    attention_ref,
    attn_bias_from_alibi_slopes,
)
from xf_flash_attention_cutlass_tpu.utils.testing import (
    alibi_slopes_ref,
    assert_close_2ref,
    max_err,
    rand,
)


def run_grad_case(
    b, h, h_k, sq, sk, d, dtype,
    causal=False, window=(-1, -1), softcap=0.0, alibi=False, mult=3.0,
):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = rand(keys[0], (b, sq, h, d), dtype)
    k = rand(keys[1], (b, sk, h_k, d), dtype)
    v = rand(keys[2], (b, sk, h_k, d), dtype)
    g = rand(keys[3], (b, sq, h, d), dtype)

    slopes = jnp.asarray(alibi_slopes_ref(h)) if alibi else None
    bias = (
        attn_bias_from_alibi_slopes(slopes, sq, sk, causal=causal)
        if alibi
        else None
    )

    def impl_loss(q, k, v):
        o, _ = flash_attention(
            q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
            causal=causal, window=window, softcap=softcap, alibi_slopes=slopes,
        )
        return jnp.sum(o.swapaxes(1, 2).astype(jnp.float32) * g.astype(jnp.float32))

    def ref_loss(upcast, reorder):
        def f(q, k, v):
            o, _ = attention_ref(
                q, k, v, attn_bias=bias, causal=causal, window_size=window,
                softcap=softcap, upcast=upcast, reorder_ops=reorder,
            )
            return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))
        return f

    dq, dk, dv = jax.grad(impl_loss, argnums=(0, 1, 2))(q, k, v)
    dq_ref, dk_ref, dv_ref = jax.grad(ref_loss(True, False), argnums=(0, 1, 2))(
        q, k, v
    )
    dq_lp, dk_lp, dv_lp = jax.grad(ref_loss(False, True), argnums=(0, 1, 2))(
        q, k, v
    )
    assert_close_2ref(dq, dq_ref, dq_lp, mult=mult, atol=1e-4)
    assert_close_2ref(dk, dk_ref, dk_lp, mult=mult, atol=1e-4)
    assert_close_2ref(dv, dv_ref, dv_lp, mult=mult, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
@pytest.mark.parametrize("causal", [False, True])
def test_grad_basic(dtype, causal):
    run_grad_case(1, 1, 1, 128, 128, 128, dtype, causal=causal)


@pytest.mark.parametrize("sq,sk", [(113, 203), (256, 512), (512, 256), (384, 384)])
@pytest.mark.parametrize("causal", [False, True])
def test_grad_unaligned(sq, sk, causal):
    run_grad_case(2, 2, 2, sq, sk, 64, jnp.float16, causal=causal)


@pytest.mark.parametrize("h,h_k", [(8, 2), (4, 1)])
def test_grad_gqa(h, h_k):
    run_grad_case(2, h, h_k, 256, 256, 64, jnp.float16, causal=True)


@pytest.mark.parametrize("d", [32, 64, 80, 128, 192, 256])
def test_grad_head_dims(d):
    run_grad_case(1, 2, 2, 192, 256, d, jnp.float16, causal=True)


def test_grad_local_window():
    run_grad_case(2, 2, 2, 256, 256, 64, jnp.float16, window=(32, 16))


def test_grad_softcap():
    run_grad_case(1, 2, 2, 256, 256, 64, jnp.float16, causal=True, softcap=30.0)


def test_grad_alibi():
    run_grad_case(2, 4, 4, 256, 256, 64, jnp.float16, causal=True, alibi=True)


def test_grad_fp32_tight():
    # fp32 end-to-end should be near machine precision vs the oracle
    run_grad_case(1, 2, 2, 256, 256, 64, jnp.float32, causal=True, mult=3.0)


def test_grad_alibi():
    """ALiBi bias gradients vs the jnp oracle's autodiff (the reference
    ships alibi in its bwd kernel but never tests it — bwd is compiled out)."""
    from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention
    from xf_flash_attention_cutlass_tpu.ops.reference import (
        attention_ref,
        attn_bias_from_alibi_slopes,
    )
    from xf_flash_attention_cutlass_tpu.utils.testing import alibi_slopes_ref

    b, h, s, d = 1, 4, 192, 64
    q = rand(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32, 0.5)
    k = rand(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32, 0.5)
    v = rand(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32, 0.5)
    slopes = jnp.asarray(alibi_slopes_ref(h))
    w = rand(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)

    def loss_impl(q, k, v):
        o, _ = flash_attention(q, k, v, causal=True, alibi_slopes=slopes)
        return jnp.sum(o * w)

    bias = attn_bias_from_alibi_slopes(slopes, s, s, causal=True)

    def loss_ref(q, k, v):
        o, _ = attention_ref(
            q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
            attn_bias=bias, causal=True,
        )
        return jnp.sum(o.swapaxes(1, 2) * w)

    gi = jax.grad(loss_impl, (0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b2 in zip(gi, gr):
        assert max_err(a, b2) < 5e-4


@pytest.mark.parametrize("causal,h,h_k", [(False, 4, 4), (True, 4, 2)])
def test_fused_bwd_matches_twopass(causal, h, h_k):
    """The reference-style fused single-pass backward (5 block-GEMMs,
    flash_bwd_kernel.h:437-651) must match the default two-pass split
    exactly — same math, different schedule. (On v5e the two-pass is the
    FASTER one, measured; fused stays as the parity implementation.)"""
    from xf_flash_attention_cutlass_tpu.ops.flash_bwd import flash_bwd
    from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd

    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (2, h, 256, 64), jnp.float32)
    k = jax.random.normal(ks[1], (2, h_k, 320, 64), jnp.float32)
    v = jax.random.normal(ks[2], (2, h_k, 320, 64), jnp.float32)
    do = jax.random.normal(ks[3], (2, h, 256, 64), jnp.float32)
    o, lse = flash_fwd(q, k, v, causal=causal)
    g2 = flash_bwd(q, k, v, o, lse, do, causal=causal, fused=False)
    g1 = flash_bwd(q, k, v, o, lse, do, causal=causal, fused=True)
    for a, b in zip(g1, g2):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5
