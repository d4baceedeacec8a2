"""Input-validation tests for the public API — the analog of the
reference's TORCH_CHECK layer (export.cpp:488-568, 1449-1540)."""

import jax
import jax.numpy as jnp
import pytest

from xf_flash_attention_cutlass_tpu.api import (
    flash_attn_func,
    flash_attn_with_kvcache,
)


def _q(shape, dtype=jnp.float16):
    return jnp.zeros(shape, dtype)


def test_rank_mismatch():
    with pytest.raises(ValueError, match="rank 4"):
        flash_attn_func(_q((2, 64, 4)), _q((2, 64, 4, 32)), _q((2, 64, 4, 32)))


def test_dtype_mismatch():
    with pytest.raises(ValueError, match="dtypes must match"):
        flash_attn_func(
            _q((1, 8, 2, 32)), _q((1, 8, 2, 32), jnp.bfloat16), _q((1, 8, 2, 32))
        )


def test_bad_dtype():
    with pytest.raises(ValueError, match="unsupported dtype"):
        flash_attn_func(
            _q((1, 8, 2, 32), jnp.int8),
            _q((1, 8, 2, 32), jnp.int8),
            _q((1, 8, 2, 32), jnp.int8),
        )


def test_gqa_divisibility():
    with pytest.raises(ValueError, match="multiple of kv heads"):
        flash_attn_func(_q((1, 8, 5, 32)), _q((1, 8, 2, 32)), _q((1, 8, 2, 32)))


def test_head_dim_limit():
    with pytest.raises(ValueError, match="head_dim"):
        flash_attn_func(_q((1, 8, 2, 512)), _q((1, 8, 2, 512)), _q((1, 8, 2, 512)))


def test_dropout_range():
    with pytest.raises(ValueError, match="dropout_p"):
        flash_attn_func(
            _q((1, 8, 2, 32)), _q((1, 8, 2, 32)), _q((1, 8, 2, 32)), dropout_p=1.5
        )


def test_kvcache_append_requires_seqlens():
    with pytest.raises(ValueError, match="cache_seqlens"):
        flash_attn_with_kvcache(
            _q((1, 1, 2, 32)), _q((1, 64, 2, 32)), _q((1, 64, 2, 32)),
            k=_q((1, 1, 2, 32)), v=_q((1, 1, 2, 32)),
        )


def test_kvcache_k_without_v():
    with pytest.raises(ValueError, match="together"):
        flash_attn_with_kvcache(
            _q((1, 1, 2, 32)), _q((1, 64, 2, 32)), _q((1, 64, 2, 32)),
            k=_q((1, 1, 2, 32)),
        )


def test_kvcache_paged_batch_idx_rejected():
    bt = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="cache_batch_idx"):
        flash_attn_with_kvcache(
            _q((1, 1, 2, 32)), _q((8, 16, 2, 32)), _q((8, 16, 2, 32)),
            cache_seqlens=jnp.asarray([8], jnp.int32),
            block_table=bt, cache_batch_idx=jnp.asarray([0], jnp.int32),
        )


def test_kvpacked_matches_unpacked():
    import jax

    from xf_flash_attention_cutlass_tpu import flash_attn_kvpacked_func

    rng = jax.random.PRNGKey(0)
    kq, kk = jax.random.split(rng)
    q = jax.random.normal(kq, (2, 64, 4, 32), jnp.float32)
    kv = jax.random.normal(kk, (2, 96, 2, 2, 32), jnp.float32)
    out = flash_attn_kvpacked_func(q, kv, causal=True)
    ref = flash_attn_func(q, kv[:, :, 0], kv[:, :, 1], causal=True)
    assert jnp.array_equal(out, ref)


def test_varlen_kvpacked_matches_unpacked():
    import jax

    from xf_flash_attention_cutlass_tpu import (
        flash_attn_varlen_func,
        flash_attn_varlen_kvpacked_func,
    )

    rng = jax.random.PRNGKey(1)
    kq, kk = jax.random.split(rng)
    q = jax.random.normal(kq, (48, 4, 32), jnp.float32)
    kv = jax.random.normal(kk, (80, 2, 2, 32), jnp.float32)
    cu_q = jnp.asarray([0, 16, 48], jnp.int32)
    cu_k = jnp.asarray([0, 32, 80], jnp.int32)
    out = flash_attn_varlen_kvpacked_func(
        q, kv, cu_q, cu_k, max_seqlen_q=32, max_seqlen_k=48, causal=True
    )
    ref = flash_attn_varlen_func(
        q, kv[:, 0], kv[:, 1], cu_q, cu_k,
        max_seqlen_q=32, max_seqlen_k=48, causal=True,
    )
    assert jnp.array_equal(out, ref)
