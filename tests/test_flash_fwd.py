"""Dense flash-attention forward vs the jnp oracle — the TPU analog of
test_flash_attn_output (/root/reference/test.py:712-986), using the same
dual-reference tolerance scheme."""

import math

import jax
import jax.numpy as jnp
import pytest

from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
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


def run_case(
    b, h, h_k, sq, sk, d, dtype,
    causal=False, window=(-1, -1), softcap=0.0, alibi=False,
    block_q=None, block_k=None,
):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = rand(keys[0], (b, sq, h, d), dtype)
    k = rand(keys[1], (b, sk, h_k, d), dtype)
    v = rand(keys[2], (b, sk, h_k, d), dtype)

    slopes = None
    bias = None
    if alibi:
        slopes = jnp.asarray(alibi_slopes_ref(h))
        bias = attn_bias_from_alibi_slopes(slopes, sq, sk, causal=causal)

    out_ref, _ = attention_ref(
        q, k, v, attn_bias=bias, causal=causal, window_size=window,
        softcap=softcap, upcast=True,
    )
    out_lp, _ = attention_ref(
        q, k, v, attn_bias=bias, causal=causal, window_size=window,
        softcap=softcap, upcast=False, reorder_ops=True,
    )

    # kernel operates in BHSD
    o, lse = flash_fwd(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
        causal=causal, window=window, softcap=softcap,
        alibi_slopes=slopes, block_q=block_q, block_k=block_k,
    )
    o = o.swapaxes(1, 2)
    assert o.shape == out_ref.shape
    assert_close_2ref(o, out_ref, out_lp)
    return o, lse, out_ref


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
@pytest.mark.parametrize("causal", [False, True])
def test_basic_128(dtype, causal):
    # the reference's one active config: b=1 h=1 d=128 128x128 (test.py:712-751)
    run_case(1, 1, 1, 128, 128, 128, dtype, causal=causal)


@pytest.mark.parametrize(
    "sq,sk",
    [(113, 203), (128, 217), (113, 211), (108, 256), (256, 512), (512, 256),
     (1024, 1024), (239, 1), (3, 799)],
)
@pytest.mark.parametrize("causal", [False, True])
def test_unaligned_seqlens(sq, sk, causal):
    run_case(2, 4, 4, sq, sk, 64, jnp.float16, causal=causal)


@pytest.mark.parametrize("d", [32, 40, 59, 64, 80, 96, 111, 128, 160, 192, 224, 256])
def test_head_dims(d):
    run_case(2, 2, 2, 192, 256, d, jnp.float16, causal=True)


@pytest.mark.parametrize("h,h_k", [(8, 8), (8, 2), (8, 1), (6, 3)])
def test_gqa_mqa(h, h_k):
    run_case(2, h, h_k, 256, 256, 64, jnp.float16, causal=True)


@pytest.mark.parametrize(
    # NB (128, -1) style one-sided windows are canonicalized by the reference
    # host layer to (left, seqlen_k) (export.cpp:217-218) — the literal oracle
    # formula diverges there, so we test canonicalized windows only.
    "window", [(-1, 0), (64, 0), (32, 16), (0, 0), (3, 5), (128, 37)]
)
@pytest.mark.parametrize("sq,sk", [(256, 256), (113, 203), (203, 113)])
def test_local_window(window, sq, sk):
    run_case(2, 2, 2, sq, sk, 64, jnp.float16, window=window)


@pytest.mark.parametrize("causal", [False, True])
def test_softcap(causal):
    run_case(1, 2, 2, 256, 256, 128, jnp.float16, causal=causal, softcap=50.0)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(256, 256), (113, 203)])
def test_alibi(causal, sq, sk):
    run_case(2, 4, 4, sq, sk, 64, jnp.float16, causal=causal, alibi=True)


def test_fp32():
    run_case(1, 2, 2, 256, 256, 64, jnp.float32, causal=True)


def test_block_sizes():
    run_case(1, 2, 2, 512, 512, 64, jnp.float16, causal=True,
             block_q=128, block_k=256)
    run_case(1, 2, 2, 384, 640, 64, jnp.float16, causal=True,
             block_q=128, block_k=128)


def test_lse_matches_naive():
    b, h, sq, sk, d = 1, 2, 128, 256, 64
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = rand(keys[0], (b, h, sq, d), jnp.float32)
    k = rand(keys[1], (b, h, sk, d), jnp.float32)
    v = rand(keys[2], (b, h, sk, d), jnp.float32)
    _, lse = flash_fwd(q, k, v, causal=True)
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    mask = (
        jnp.arange(sk)[None, :] <= jnp.arange(sq)[:, None] + (sk - sq)
    )
    s = jnp.where(mask, s, -jnp.inf)
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1)
    assert max_err(lse, lse_ref) < 1e-4


def test_empty_rows_zero():
    # window (0,0) with sq > sk: top rows attend to nothing -> O = 0, LSE=-inf
    b, h, sq, sk, d = 1, 1, 256, 128, 64
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q = rand(keys[0], (b, h, sq, d), jnp.float32)
    k = rand(keys[1], (b, h, sk, d), jnp.float32)
    v = rand(keys[2], (b, h, sk, d), jnp.float32)
    o, lse = flash_fwd(q, k, v, causal=True)
    # bottom-right aligned: rows i with i + sk - sq < 0 see nothing
    n_empty = sq - sk
    assert float(jnp.max(jnp.abs(o[:, :, :n_empty]))) == 0.0
    assert bool(jnp.all(jnp.isneginf(lse[:, :, :n_empty])))
    assert bool(jnp.all(jnp.isfinite(lse[:, :, n_empty:])))


def test_kv_lens():
    b, h, s, d = 3, 2, 256, 64
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q = rand(keys[0], (b, s, h, d), jnp.float16)
    k = rand(keys[1], (b, s, h, d), jnp.float16)
    v = rand(keys[2], (b, s, h, d), jnp.float16)
    kv_lens = jnp.asarray([256, 37, 130], jnp.int32)
    key_padding = jnp.arange(s)[None, :] < kv_lens[:, None]
    out_ref, _ = attention_ref(q, k, v, key_padding_mask=key_padding)
    out_lp, _ = attention_ref(
        q, k, v, key_padding_mask=key_padding, upcast=False, reorder_ops=True
    )
    o, _ = flash_fwd(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2), kv_lens=kv_lens
    )
    assert_close_2ref(o.swapaxes(1, 2), out_ref, out_lp)
