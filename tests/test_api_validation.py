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
