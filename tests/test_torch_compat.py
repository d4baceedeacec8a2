"""torch-tensor front end: torch in / torch out, numerics match the JAX API.

The reference's user surface is a torch extension (test.py:15-19); these
tests check the migration shim end to end with torch-cpu tensors.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from xf_flash_attention_cutlass_tpu import api, torch_compat


def test_dense_roundtrip():
    g = torch.Generator().manual_seed(0)
    q = torch.randn(2, 64, 4, 32, generator=g)
    k = torch.randn(2, 96, 2, 32, generator=g)
    v = torch.randn(2, 96, 2, 32, generator=g)
    out = torch_compat.flash_attn_func(q, k, v, causal=True)
    assert isinstance(out, torch.Tensor)
    assert out.shape == q.shape and out.dtype == q.dtype
    ref = api.flash_attn_func(
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), jnp.asarray(v.numpy()),
        causal=True,
    )
    np.testing.assert_allclose(out.numpy(), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_fp16_upcast_path():
    g = torch.Generator().manual_seed(1)
    q = torch.randn(1, 32, 2, 64, generator=g).half()
    out = torch_compat.flash_attn_func(q, q, q, causal=False)
    assert out.dtype == torch.float16
    assert torch.isfinite(out.float()).all()


def test_kvcache_roundtrip_returns_updated_cache():
    g = torch.Generator().manual_seed(2)
    b, page, h_k, d = 2, 16, 2, 32
    q = torch.randn(b, 1, 4, d, generator=g)
    kc = torch.randn(8, page, h_k, d, generator=g)
    vc = torch.randn(8, page, h_k, d, generator=g)
    bt = torch.arange(8, dtype=torch.int32).reshape(b, 4)
    lens = torch.tensor([20, 33], dtype=torch.int32)
    out, k2, v2 = torch_compat.flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, block_table=bt, causal=True
    )
    assert out.shape == q.shape
    assert k2.shape == kc.shape and v2.shape == vc.shape
    # no append => caches unchanged
    np.testing.assert_array_equal(k2.numpy(), kc.numpy())
