"""Split-KV combine algebra unit tests — covering the -inf/empty-split edge
cases the reference snapshot broke (flash_fwd_kernel.h:1386-1427)."""

import jax
import jax.numpy as jnp
import numpy as np

from xf_flash_attention_cutlass_tpu.ops.combine import combine_partials, merge_two
from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
from xf_flash_attention_cutlass_tpu.utils.testing import max_err, rand


def test_combine_matches_unsplit():
    """Splitting KV into chunks and combining must equal the unsplit result."""
    b, h, sq, sk, d, n_splits = 1, 2, 128, 512, 64, 4
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = rand(keys[0], (b, h, sq, d), jnp.float32)
    k = rand(keys[1], (b, h, sk, d), jnp.float32)
    v = rand(keys[2], (b, h, sk, d), jnp.float32)

    o_full, lse_full = flash_fwd(q, k, v)

    chunk = sk // n_splits
    o_parts, lse_parts = [], []
    for s in range(n_splits):
        o_s, lse_s = flash_fwd(
            q, k[:, :, s * chunk:(s + 1) * chunk], v[:, :, s * chunk:(s + 1) * chunk]
        )
        o_parts.append(o_s)
        lse_parts.append(lse_s)
    o_c, lse_c = combine_partials(jnp.stack(o_parts), jnp.stack(lse_parts))
    assert max_err(o_c, o_full) < 1e-5
    assert max_err(lse_c, lse_full) < 1e-5


def test_combine_with_empty_splits():
    """Splits whose KV range is fully masked contribute LSE=-inf partials."""
    b, h, sq, d = 1, 1, 128, 64
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = rand(keys[0], (b, h, sq, d), jnp.float32)
    k = rand(keys[1], (b, h, 256, d), jnp.float32)
    v = rand(keys[2], (b, h, 256, d), jnp.float32)
    o1, lse1 = flash_fwd(q, k[:, :, :128], v[:, :, :128])
    o2 = jnp.zeros_like(o1)
    lse2 = jnp.full_like(lse1, -jnp.inf)
    o_c, lse_c = combine_partials(jnp.stack([o1, o2]), jnp.stack([lse1, lse2]))
    assert max_err(o_c, o1) < 1e-6
    assert max_err(lse_c, lse1) < 1e-6
    # order invariance
    o_c2, lse_c2 = combine_partials(jnp.stack([o2, o1]), jnp.stack([lse2, lse1]))
    assert max_err(o_c2, o1) < 1e-6


def test_combine_all_empty():
    o = jnp.zeros((3, 1, 1, 8, 64))
    lse = jnp.full((3, 1, 1, 8), -jnp.inf)
    o_c, lse_c = combine_partials(o, lse)
    assert not bool(jnp.any(jnp.isnan(o_c)))
    assert float(jnp.max(jnp.abs(o_c))) == 0.0
    assert bool(jnp.all(jnp.isneginf(lse_c)))


def test_merge_two_associative():
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.randn(3, 8, 16), jnp.float32)
    lse = jnp.asarray(rng.randn(3, 8), jnp.float32)
    # ((0+1)+2) == combine([0,1,2])
    o01, l01 = merge_two(o[0], lse[0], o[1], lse[1])
    o012, l012 = merge_two(o01, l01, o[2], lse[2])
    o_ref, l_ref = combine_partials(o, lse)
    assert max_err(o012, o_ref) < 1e-5
    assert max_err(l012, l_ref) < 1e-5
