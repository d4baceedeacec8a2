"""Paged / dense KV-cache decode tests — TPU analog of
test_flash_attn_kvcache (/root/reference/test.py:1310-1596): paged block
tables via randperm, append of new KV, fused rotary, cache_batch_idx,
leftpad, GQA/MQA, local windows, split-KV — with the reference's 3x (+5x
with ALiBi) tolerance rule and the exact cache-mutation check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xf_flash_attention_cutlass_tpu.api import flash_attn_with_kvcache
from xf_flash_attention_cutlass_tpu.ops.reference import (
    attention_ref,
    attn_bias_from_alibi_slopes,
)
from xf_flash_attention_cutlass_tpu.ops.rotary import (
    apply_rotary,
    rotary_frequencies,
)
from xf_flash_attention_cutlass_tpu.utils.testing import (
    assert_close_2ref,
    max_err,
    rand,
)


def _block_kvcache(rng, seqlen_k, page, b, h_k, d, dtype):
    """Paged cache fixture (_generate_block_kvcache, test.py:1597-1621)."""
    pages_per_seq = (seqlen_k + page - 1) // page
    num_blocks = pages_per_seq * b * 3
    k_paged = rand(jax.random.PRNGKey(11), (num_blocks, page, h_k, d), dtype)
    v_paged = rand(jax.random.PRNGKey(12), (num_blocks, page, h_k, d), dtype)
    block_table = jnp.asarray(
        rng.permutation(num_blocks)[: b * pages_per_seq].reshape(b, pages_per_seq),
        jnp.int32,
    )
    # dense view for the oracle
    k_dense = k_paged[np.asarray(block_table).reshape(-1)].reshape(
        b, pages_per_seq * page, h_k, d
    )[:, :seqlen_k]
    v_dense = v_paged[np.asarray(block_table).reshape(-1)].reshape(
        b, pages_per_seq * page, h_k, d
    )[:, :seqlen_k]
    return k_paged, v_paged, block_table, k_dense, v_dense


def run_kvcache_case(
    sq,
    sk,
    d=128,
    page=16,
    mha_type="mha",
    causal=True,
    window=(-1, -1),
    new_kv=False,
    rotary_fraction=0.0,
    rotary_interleaved=True,
    alibi=False,
    has_batch_idx=False,
    has_leftpad=False,
    paged=True,
    num_splits=0,
    dtype=jnp.float16,
    seed=0,
):
    rng = np.random.default_rng(seed)
    b = 2
    h = 6
    h_k = {"mha": 6, "gqa": 3, "mqa": 1}[mha_type]
    b_cache = b * 2 if has_batch_idx else b
    q = rand(jax.random.PRNGKey(1), (b, sq, h, d), dtype)
    s_new = sq if new_kv else 0
    k_new = rand(jax.random.PRNGKey(2), (b, s_new, h_k, d), dtype) if new_kv else None
    v_new = rand(jax.random.PRNGKey(3), (b, s_new, h_k, d), dtype) if new_kv else None

    if paged:
        assert not has_batch_idx and not has_leftpad
        k_cache, v_cache, block_table, k_dense, v_dense = _block_kvcache(
            rng, sk, page, b, h_k, d, dtype
        )
        cache_arg = (k_cache, v_cache)
    else:
        k_cache = rand(jax.random.PRNGKey(11), (b_cache, sk, h_k, d), dtype)
        v_cache = rand(jax.random.PRNGKey(12), (b_cache, sk, h_k, d), dtype)
        block_table = None
        cache_arg = (k_cache, v_cache)

    hi = sk - (sq if new_kv else 0) + 1
    cache_seqlens = jnp.asarray(
        rng.integers(0 if new_kv else 1, max(hi, 2), (b,)), jnp.int32
    )
    cache_batch_idx = (
        jnp.asarray(rng.permutation(b_cache)[:b], jnp.int32) if has_batch_idx else None
    )
    cache_leftpad = None
    if has_leftpad:
        cache_leftpad = jnp.asarray(
            [rng.integers(0, int(s)) if int(s) > 0 else 0 for s in cache_seqlens],
            jnp.int32,
        )

    rotary_dim = int(rotary_fraction * d) // 16 * 16
    if rotary_dim > 0:
        cos, sin = rotary_frequencies(rotary_dim, sk + sq, dtype=dtype)
    else:
        cos, sin = None, None

    slopes = None
    if alibi:
        slopes = jnp.asarray(
            rng.random((b, h), dtype=np.float32) * 0.3, jnp.float32
        )

    out = flash_attn_with_kvcache(
        q,
        *cache_arg,
        k=k_new,
        v=v_new,
        rotary_cos=cos,
        rotary_sin=sin,
        cache_seqlens=cache_seqlens,
        cache_batch_idx=cache_batch_idx,
        cache_leftpad=cache_leftpad,
        block_table=block_table,
        causal=causal,
        window_size=window,
        rotary_interleaved=rotary_interleaved,
        alibi_slopes=slopes,
        num_splits=num_splits,
    )
    out, k_cache_out, v_cache_out = out

    # ---- oracle ----------------------------------------------------------
    if paged:
        kc_ref, vc_ref = k_dense, v_dense
    else:
        kc_ref = k_cache[cache_batch_idx] if has_batch_idx else k_cache
        vc_ref = v_cache[cache_batch_idx] if has_batch_idx else v_cache
    arange = jnp.arange(sk, dtype=jnp.int32)[None, :]
    key_padding = arange < (cache_seqlens[:, None] + s_new)
    if has_leftpad:
        key_padding = jnp.logical_and(key_padding, arange >= cache_leftpad[:, None])

    q_ro, k_ro = q, k_new
    if rotary_dim > 0 and new_kv:
        t = jnp.arange(sq, dtype=jnp.int32)[None, :]
        local = window[0] >= 0 or window[1] >= 0
        q_pos = (
            cache_seqlens[:, None] + t
            if (causal or local)
            else jnp.broadcast_to(cache_seqlens[:, None], (b, sq))
        )
        q_ro = apply_rotary(q, cos, sin, q_pos, rotary_interleaved)
        tk = jnp.arange(s_new, dtype=jnp.int32)[None, :]
        k_ro = apply_rotary(k_new, cos, sin, cache_seqlens[:, None] + tk,
                            rotary_interleaved)
    if new_kv:
        update = jnp.logical_and(
            arange >= cache_seqlens[:, None], arange < cache_seqlens[:, None] + s_new
        )
        idx = jnp.clip(arange - cache_seqlens[:, None], 0, s_new - 1)
        gathered_k = jnp.take_along_axis(k_ro, idx[:, :, None, None].repeat(
            kc_ref.shape[2], 2).repeat(d, 3), axis=1)
        gathered_v = jnp.take_along_axis(v_new, idx[:, :, None, None].repeat(
            kc_ref.shape[2], 2).repeat(d, 3), axis=1)
        kc_ref = jnp.where(update[:, :, None, None], gathered_k, kc_ref)
        vc_ref = jnp.where(update[:, :, None, None], gathered_v, vc_ref)

    bias = None
    if alibi:
        bias = attn_bias_from_alibi_slopes(
            slopes, sq, sk, None, key_padding, causal=causal,
            key_leftpad=cache_leftpad,
        )

    out_ref, _ = attention_ref(
        q_ro, kc_ref, vc_ref, None, key_padding, bias, causal=causal,
        window_size=window, key_leftpad=cache_leftpad,
    )
    out_lp, _ = attention_ref(
        q_ro, kc_ref, vc_ref, None, key_padding, bias, causal=causal,
        window_size=window, key_leftpad=cache_leftpad,
        upcast=False, reorder_ops=True,
    )

    mult = 5.0 if alibi else 3.0
    assert_close_2ref(out, out_ref, out_lp, mult=mult, atol=1e-5)

    # exact cache mutation check (test.py:1591-1592)
    if new_kv:
        if paged:
            pages_per_seq = block_table.shape[1]
            kd = k_cache_out[np.asarray(block_table).reshape(-1)].reshape(
                b, pages_per_seq * page, kc_ref.shape[2], d
            )[:, :sk]
            vd = v_cache_out[np.asarray(block_table).reshape(-1)].reshape(
                b, pages_per_seq * page, vc_ref.shape[2], d
            )[:, :sk]
        else:
            kd = k_cache_out[cache_batch_idx] if has_batch_idx else k_cache_out
            vd = v_cache_out[cache_batch_idx] if has_batch_idx else v_cache_out
        assert max_err(kd, kc_ref) <= 1e-3
        assert max_err(vd, vc_ref) <= 1e-3
    return out


# ---- the reference's active kvcache grid (test.py:1310-1353), trimmed for
# interpret-mode runtime ---------------------------------------------------

@pytest.mark.parametrize("mha_type", ["mha", "gqa", "mqa"])
@pytest.mark.parametrize("sq,sk", [(1, 128), (1, 339), (3, 1024), (64, 800)])
def test_paged_decode(mha_type, sq, sk):
    run_kvcache_case(sq, sk, mha_type=mha_type, causal=True, page=16)


@pytest.mark.parametrize("sq,sk", [(1, 128), (64, 256)])
def test_paged_block256(sq, sk):
    run_kvcache_case(sq, sk, page=256, causal=True)


def test_paged_noncausal():
    run_kvcache_case(1, 339, causal=False)


@pytest.mark.parametrize("window", [(16, 0), (32, 32)])
def test_paged_local(window):
    run_kvcache_case(3, 512, causal=False, window=window)


def test_paged_num_splits():
    run_kvcache_case(1, 800, num_splits=2)
    run_kvcache_case(1, 800, num_splits=7)


@pytest.mark.parametrize("rotary_interleaved", [True, False])
def test_paged_append_rotary(rotary_interleaved):
    run_kvcache_case(
        16, 256, new_kv=True, rotary_fraction=0.5,
        rotary_interleaved=rotary_interleaved, causal=True,
    )


def test_paged_append_full_rotary():
    run_kvcache_case(8, 144, new_kv=True, rotary_fraction=1.0, causal=True)


def test_paged_append_noncausal_rotary():
    # non-causal: all q rows rotate at position cache_seqlens
    run_kvcache_case(4, 128, new_kv=True, rotary_fraction=0.5, causal=False)


def test_paged_alibi():
    run_kvcache_case(3, 256, alibi=True, causal=True)


def test_dense_cache():
    run_kvcache_case(1, 339, paged=False, causal=True)
    run_kvcache_case(64, 800, paged=False, causal=True)


def test_dense_append():
    run_kvcache_case(16, 256, paged=False, new_kv=True, causal=True)


def test_dense_batch_idx():
    run_kvcache_case(1, 339, paged=False, has_batch_idx=True, causal=True)
    run_kvcache_case(
        8, 256, paged=False, has_batch_idx=True, new_kv=True, causal=True
    )


def test_dense_leftpad():
    run_kvcache_case(1, 339, paged=False, has_leftpad=True, causal=True, seed=5)
    run_kvcache_case(8, 256, paged=False, has_leftpad=True, causal=True, seed=6)


def test_bf16():
    run_kvcache_case(1, 339, dtype=jnp.bfloat16)


def test_scalar_cache_seqlens():
    b, sq, h, d = 2, 1, 4, 64
    q = rand(jax.random.PRNGKey(1), (b, sq, h, d), jnp.float16)
    kc = rand(jax.random.PRNGKey(2), (b, 128, h, d), jnp.float16)
    vc = rand(jax.random.PRNGKey(3), (b, 128, h, d), jnp.float16)
    out, _, _ = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=100, causal=True)
    mask = jnp.arange(128)[None, :] < 100
    out_ref, _ = attention_ref(q, kc, vc, key_padding_mask=mask, causal=True)
    out_lp, _ = attention_ref(
        q, kc, vc, key_padding_mask=mask, causal=True, upcast=False, reorder_ops=True
    )
    assert_close_2ref(out, out_ref, out_lp, mult=3.0)


def test_paged_append_kernel_matches_scatter():
    """In-place Pallas append == the jnp scatter reference, for both the
    decode (per-token RMW) and prefill (window write) paths, incl. the
    layer axis and in-kernel quantization."""
    from xf_flash_attention_cutlass_tpu.ops.kvcache import (
        append_kv_paged,
        append_kv_paged_quantized,
    )
    from xf_flash_attention_cutlass_tpu.ops.paged_append import paged_append
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv

    L, nb, hk, page, d = 2, 12, 2, 16, 128
    b = 3
    kp = rand(jax.random.PRNGKey(0), (L, nb, hk, page, d), jnp.float32)
    vp = rand(jax.random.PRNGKey(1), (L, nb, hk, page, d), jnp.float32)
    bt = jnp.asarray(
        np.random.default_rng(0).permutation(nb)[: b * 4].reshape(b, 4), jnp.int32
    )
    lidx = jnp.asarray(1, jnp.int32)

    # ---- decode path: sq=1, arbitrary positions (window RMW) ----
    kn = rand(jax.random.PRNGKey(2), (b, 1, hk, d), jnp.float32)
    vn = rand(jax.random.PRNGKey(3), (b, 1, hk, d), jnp.float32)
    pos = jnp.asarray([3, 17, 40], jnp.int32)
    ref_k, ref_v = append_kv_paged(kp, vp, kn, vn, bt, pos, layer_idx=lidx)
    out_k, out_v = paged_append(kp.copy(), vp.copy(), kn, vn, bt, pos, layer_idx=lidx)
    assert max_err(out_k, ref_k) == 0.0
    assert max_err(out_v, ref_v) == 0.0

    # quantized decode: in-kernel quantization == host quantize + scatter
    kq, ks = quantize_kv(kp, "int8")
    vq, vs = quantize_kv(vp, "int8")
    ks, vs = ks[..., 0], vs[..., 0]
    rk, rks, rv, rvs = append_kv_paged_quantized(
        kq, ks, vq, vs, kn, vn, bt, pos, layer_idx=lidx
    )
    ok, ov, oks, ovs = paged_append(
        kq.copy(), vq.copy(), kn, vn, bt, pos,
        k_scales=ks.copy(), v_scales=vs.copy(), layer_idx=lidx,
    )
    assert max_err(ok.astype(jnp.int32), rk.astype(jnp.int32)) == 0
    assert max_err(oks, rks) < 1e-6
    assert max_err(ovs, rvs) < 1e-6

    # ---- prefill path: b=1, page-aligned position, windowed writes ----
    s_new = 32
    kn1 = rand(jax.random.PRNGKey(4), (1, s_new, hk, d), jnp.float32)
    vn1 = rand(jax.random.PRNGKey(5), (1, s_new, hk, d), jnp.float32)
    pos0 = jnp.asarray([16], jnp.int32)  # page-aligned (page=16)
    bt1 = bt[:1]
    ref_k, ref_v = append_kv_paged(kp, vp, kn1, vn1, bt1, pos0, layer_idx=lidx)
    out_k, out_v = paged_append(
        kp.copy(), vp.copy(), kn1, vn1, bt1, pos0, layer_idx=lidx
    )
    assert max_err(out_k, ref_k) == 0.0
    assert max_err(out_v, ref_v) == 0.0

    # quantized prefill
    rk, rks, rv, rvs = append_kv_paged_quantized(
        kq, ks, vq, vs, kn1, vn1, bt1, pos0, layer_idx=lidx
    )
    ok, ov, oks, ovs = paged_append(
        kq.copy(), vq.copy(), kn1, vn1, bt1, pos0,
        k_scales=ks.copy(), v_scales=vs.copy(), layer_idx=lidx,
    )
    assert max_err(ok.astype(jnp.int32), rk.astype(jnp.int32)) == 0
    assert max_err(oks, rks) < 1e-6
    assert max_err(ovs, rvs) < 1e-6


def test_paged_append_chunked_prefill():
    """Prefill appends longer than 512 tokens run chunked over the grid
    (bounded VMEM staging); results must still match the scatter oracle."""
    from xf_flash_attention_cutlass_tpu.ops.kvcache import (
        append_kv_paged,
        append_kv_paged_quantized,
    )
    from xf_flash_attention_cutlass_tpu.ops.paged_append import paged_append
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv

    nb, hk, page, d = 8, 2, 256, 128
    s_new = 1024  # -> 2 chunks of 512
    kp = rand(jax.random.PRNGKey(0), (nb, hk, page, d), jnp.float32)
    vp = rand(jax.random.PRNGKey(1), (nb, hk, page, d), jnp.float32)
    bt = jnp.asarray(
        np.random.default_rng(1).permutation(nb)[:6].reshape(1, 6), jnp.int32
    )
    kn = rand(jax.random.PRNGKey(2), (1, s_new, hk, d), jnp.float32)
    vn = rand(jax.random.PRNGKey(3), (1, s_new, hk, d), jnp.float32)
    pos0 = jnp.asarray([256], jnp.int32)  # page-aligned start

    ref_k, ref_v = append_kv_paged(kp, vp, kn, vn, bt, pos0)
    out_k, out_v = paged_append(kp.copy(), vp.copy(), kn, vn, bt, pos0)
    assert max_err(out_k, ref_k) == 0.0
    assert max_err(out_v, ref_v) == 0.0

    kq, ks = quantize_kv(kp, "int8")
    vq, vs = quantize_kv(vp, "int8")
    ks, vs = ks[..., 0], vs[..., 0]
    rk, rks, rv, rvs = append_kv_paged_quantized(
        kq, ks, vq, vs, kn, vn, bt, pos0
    )
    ok, ov, oks, ovs = paged_append(
        kq.copy(), vq.copy(), kn, vn, bt, pos0,
        k_scales=ks.copy(), v_scales=vs.copy(),
    )
    assert max_err(ok.astype(jnp.int32), rk.astype(jnp.int32)) == 0
    assert max_err(ov.astype(jnp.int32), rv.astype(jnp.int32)) == 0
    assert max_err(oks, rks) < 1e-6
    assert max_err(ovs, rvs) < 1e-6


def test_paged_append_decode_multitoken():
    """mode="decode" with sq>1 (speculative verify): batched multi-token
    append at arbitrary unaligned positions — may cross page boundaries —
    must match the scatter oracle, bf16 and quantized."""
    from xf_flash_attention_cutlass_tpu.ops.kvcache import (
        append_kv_paged,
        append_kv_paged_quantized,
    )
    from xf_flash_attention_cutlass_tpu.ops.paged_append import paged_append
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv

    L, nb, hk, page, d = 2, 12, 2, 16, 128
    b, sq = 3, 4
    kp = rand(jax.random.PRNGKey(0), (L, nb, hk, page, d), jnp.float32)
    vp = rand(jax.random.PRNGKey(1), (L, nb, hk, page, d), jnp.float32)
    bt = jnp.asarray(
        np.random.default_rng(0).permutation(nb)[: b * 4].reshape(b, 4), jnp.int32
    )
    lidx = jnp.asarray(1, jnp.int32)
    kn = rand(jax.random.PRNGKey(2), (b, sq, hk, d), jnp.float32)
    vn = rand(jax.random.PRNGKey(3), (b, sq, hk, d), jnp.float32)
    # 14: crosses the page-16 boundary mid-append; 3: interior; 40: page 2
    pos = jnp.asarray([14, 3, 40], jnp.int32)

    ref_k, ref_v = append_kv_paged(kp, vp, kn, vn, bt, pos, layer_idx=lidx)
    out_k, out_v = paged_append(
        kp.copy(), vp.copy(), kn, vn, bt, pos, layer_idx=lidx, mode="decode"
    )
    assert max_err(out_k, ref_k) == 0.0
    assert max_err(out_v, ref_v) == 0.0

    kq, ks = quantize_kv(kp, "int8")
    vq, vs = quantize_kv(vp, "int8")
    ks, vs = ks[..., 0], vs[..., 0]
    rk, rks, rv, rvs = append_kv_paged_quantized(
        kq, ks, vq, vs, kn, vn, bt, pos, layer_idx=lidx
    )
    ok, ov, oks, ovs = paged_append(
        kq.copy(), vq.copy(), kn, vn, bt, pos,
        k_scales=ks.copy(), v_scales=vs.copy(), layer_idx=lidx, mode="decode",
    )
    assert max_err(ok.astype(jnp.int32), rk.astype(jnp.int32)) == 0
    assert max_err(ov.astype(jnp.int32), rv.astype(jnp.int32)) == 0
    assert max_err(oks, rks) < 1e-6
    assert max_err(ovs, rvs) < 1e-6


def test_paged_long_context_64k():
    """b=1 at 64k-class context: hundreds of pages per block table
    (round-3 verdict #8) — exercises the int32 burst/offset arithmetic,
    SMEM table sizing and dead-tail elision at extreme max_pages. Slim
    geometry (1 kv head) keeps the interpret-mode oracle tractable."""
    from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention

    rng = np.random.default_rng(0)
    h, h_k, d, page = 2, 1, 128, 256
    sk = 65321  # unaligned: 255 full pages + a 41-token tail
    pages_per_seq = (sk + page - 1) // page
    num_pages = pages_per_seq + 2
    kp = rand(jax.random.PRNGKey(0), (num_pages, h_k, page, d), jnp.float32,
              scale=0.5)
    vp = rand(jax.random.PRNGKey(1), (num_pages, h_k, page, d), jnp.float32)
    bt = jnp.asarray(
        rng.permutation(num_pages)[:pages_per_seq][None], jnp.int32
    )
    kv_lens = jnp.asarray([sk], jnp.int32)
    q = rand(jax.random.PRNGKey(2), (1, 1, h, d), jnp.float32)

    out, lse = paged_attention(q, kp, vp, bt, kv_lens, causal=True)

    # oracle: gather the table densely, one softmax over 65321 keys
    kd = kp[np.asarray(bt)[0]].transpose(1, 0, 2, 3).reshape(h_k, -1, d)[:, :sk]
    vd = vp[np.asarray(bt)[0]].transpose(1, 0, 2, 3).reshape(h_k, -1, d)[:, :sk]
    import math as _math
    g = h // h_k
    qb = np.asarray(q[0, 0], np.float32).reshape(h_k, g, d)
    s = np.einsum("kgd,kld->kgl", qb, np.asarray(kd)) / _math.sqrt(d)
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    o_ref = np.einsum("kgl,kld->kgd", p / p.sum(-1, keepdims=True),
                      np.asarray(vd)).reshape(1, 1, h, d)
    lse_ref = (m[..., 0] + np.log(p.sum(-1))).reshape(1, h, 1)
    assert max_err(out, jnp.asarray(o_ref)) < 2e-5
    assert max_err(lse, jnp.asarray(lse_ref)) < 1e-4


def test_num_splits_heuristic():
    """Occupancy search semantics (paged_attn.cpp:128-163 analog): v5e's
    single core never splits; a 2-core Megacore part splits b=1 decode to
    fill both cores; >=80% fill short-circuits to 1; cap respected."""
    from xf_flash_attention_cutlass_tpu.ops.paged import num_splits_heuristic

    # single TensorCore (v5e): always 1
    for b in (1, 2, 64):
        assert num_splits_heuristic(b, 1, 8, 128) == 1
    # 2 cores (v4/v5p Megacore): b=1 wants 2 splits, b=2+ already fills
    assert num_splits_heuristic(1, 2, 8, 128) == 2
    assert num_splits_heuristic(2, 2, 8, 128) == 1
    assert num_splits_heuristic(64, 2, 8, 128) == 1
    # splits that do not shrink per-split pages are skipped: 2 pages,
    # 4 cores, b=1 -> s=3 gives ceil(2/3)==ceil(2/2)? (1==1) skip -> 2 or 4
    s = num_splits_heuristic(1, 4, 2, 128)
    assert s in (2, 4) and s != 3
    # cap: never exceeds pages or cores
    assert num_splits_heuristic(1, 256, 4, 128) <= 4


def test_paged_rows_split_exact():
    """Oversized query blocks split into sequential token groups
    (XFA_PAGED_ROWS_MAX): the kv_lens shift must re-derive every causal
    position exactly, incl. sliding windows and per-batch ALiBi."""
    import os
    from xf_flash_attention_cutlass_tpu.ops.paged import paged_attention

    rng = np.random.default_rng(3)
    b, h, h_k, d, page = 2, 4, 2, 64, 16
    sq, sk = 24, 160  # rows = 48
    num_pages = 24
    kp = rand(jax.random.PRNGKey(0), (num_pages, h_k, page, d), jnp.float32)
    vp = rand(jax.random.PRNGKey(1), (num_pages, h_k, page, d), jnp.float32)
    bt = jnp.asarray(
        rng.permutation(num_pages)[: b * 10].reshape(b, 10), jnp.int32
    )
    kv_lens = jnp.asarray([sk, 97], jnp.int32)
    q = rand(jax.random.PRNGKey(2), (b, sq, h, d), jnp.float32)
    slopes = rand(jax.random.PRNGKey(3), (b, h), jnp.float32) * 0.1

    for kw in (
        dict(causal=True),
        dict(causal=True, window=(37, 0)),
        dict(causal=True, alibi_slopes=slopes),
        dict(causal=False),  # position-free split
    ):
        ref_o, ref_l = paged_attention(q, kp, vp, bt, kv_lens, **kw)
        os.environ["XFA_PAGED_ROWS_MAX"] = "16"  # forces 3+ token groups
        try:
            o, l = paged_attention(q, kp, vp, bt, kv_lens, **kw)
        finally:
            del os.environ["XFA_PAGED_ROWS_MAX"]
        assert max_err(o, ref_o) < 1e-6, kw
        assert max_err(l, ref_l) < 1e-6, kw


def test_paged_append_prefill_padded_small_page():
    """PADDED small-page quantized pools (stored 32 rows / true page 16,
    the engine's page-16 int8/fp8 layout): prefill appends must take the
    Pallas storage-coordinate path (round-4 verdict #2) and match the
    scatter oracle on every LIVE element — values bit-exact, live scale
    columns exact, padded scale tail written 1.0, untouched pages
    untouched."""
    from xf_flash_attention_cutlass_tpu.ops.kvcache import (
        append_kv_paged_quantized,
    )
    from xf_flash_attention_cutlass_tpu.ops.paged_append import paged_append

    rng = np.random.default_rng(7)
    for qdt, qname in ((jnp.int8, "int8"), (jnp.float8_e4m3fn, "fp8_e4m3")):
        L, nb, hk, page, stored, sc, d = 2, 10, 2, 16, 32, 128, 128
        b, sq = 2, 64  # 4 logical pages per row
        kp = jnp.asarray(
            rng.integers(-90, 90, (L, nb, hk, stored, d)), jnp.int8
        ).astype(qdt)
        vp = jnp.asarray(
            rng.integers(-90, 90, (L, nb, hk, stored, d)), jnp.int8
        ).astype(qdt)
        ks = jnp.asarray(rng.random((L, nb, hk, sc)), jnp.float32)
        vs = jnp.asarray(rng.random((L, nb, hk, sc)), jnp.float32)
        bt = jnp.asarray(
            rng.permutation(nb)[: b * 5].reshape(b, 5), jnp.int32
        )
        kn = rand(jax.random.PRNGKey(2), (b, sq, hk, d), jnp.float32)
        vn = rand(jax.random.PRNGKey(3), (b, sq, hk, d), jnp.float32)
        pos = jnp.asarray([16, 0], jnp.int32)  # page-aligned starts
        lidx = jnp.asarray(1, jnp.int32)

        rk, rks, rv, rvs = append_kv_paged_quantized(
            kp, ks, vp, vs, kn, vn, bt, pos, layer_idx=lidx, page_size=page
        )
        ok, ov, oks, ovs = paged_append(
            kp.copy(), vp.copy(), kn, vn, bt, pos,
            k_scales=ks.copy(), v_scales=vs.copy(), layer_idx=lidx,
            page_size=page,
        )
        # values: every element identical (oracle writes live rows; the
        # Pallas path additionally zeroes padded rows of touched pages,
        # which the oracle leaves — compare live rows everywhere + check
        # the padded rows of touched pages are quantized zeros)
        touched = np.zeros(nb, bool)
        for i in range(b):
            npg = sq // page
            start = int(pos[i]) // page
            touched[np.asarray(bt)[i, start : start + npg]] = True
        okn, rkn = np.asarray(ok, jnp.float32), np.asarray(rk, jnp.float32)
        ovn, rvn = np.asarray(ov, jnp.float32), np.asarray(rv, jnp.float32)
        assert np.array_equal(okn[:, :, :, :page], rkn[:, :, :, :page]), qname
        assert np.array_equal(ovn[:, :, :, :page], rvn[:, :, :, :page]), qname
        assert np.all(okn[1][touched][:, :, page:] == 0.0), qname
        assert np.array_equal(okn[1][~touched], rkn[1][~touched]), qname
        # scales: live columns exact, padded tail of touched pages 1.0,
        # untouched pages untouched
        oksn, rksn = np.asarray(oks), np.asarray(rks)
        ovsn, rvsn = np.asarray(ovs), np.asarray(rvs)
        assert np.allclose(
            oksn[:, :, :, :page], rksn[:, :, :, :page], atol=1e-6
        ), qname
        assert np.allclose(
            ovsn[:, :, :, :page], rvsn[:, :, :, :page], atol=1e-6
        ), qname
        assert np.all(oksn[1][touched][:, :, page:] == 1.0), qname
        assert np.array_equal(oksn[1][~touched], rksn[1][~touched]), qname
        assert np.array_equal(oksn[0], np.asarray(ks)[0]), qname  # other layer


def test_paged_append_prefill_tight_wide_scales():
    """TIGHT quant pools at page 32/64 carry 128-lane-padded scale planes
    (engine layout): the old in-kernel prefill scale windows spanned
    several pages but wrote into ONE page's plane — silent corruption
    (round-5 finding). The storage-coordinate path must match the scatter
    oracle on live scales, including multi-chunk appends."""
    from xf_flash_attention_cutlass_tpu.ops.kvcache import (
        append_kv_paged_quantized,
    )
    from xf_flash_attention_cutlass_tpu.ops.paged_append import paged_append

    rng = np.random.default_rng(11)
    for page in (32, 64):
        nb, hk, d, sc = 100, 2, 128, 128
        b, sq = 2, 1024  # > 512 -> chunked over the grid
        kp = jnp.asarray(rng.integers(-90, 90, (nb, hk, page, d)), jnp.int8)
        vp = jnp.asarray(rng.integers(-90, 90, (nb, hk, page, d)), jnp.int8)
        ks = jnp.asarray(rng.random((nb, hk, sc)), jnp.float32)
        vs = jnp.asarray(rng.random((nb, hk, sc)), jnp.float32)
        per = 1536 // page
        bt = jnp.asarray(
            rng.permutation(nb)[: b * per].reshape(b, per), jnp.int32
        )
        kn = jnp.asarray(rng.standard_normal((b, sq, hk, d)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((b, sq, hk, d)), jnp.float32)
        pos = jnp.asarray([page, 0], jnp.int32)

        rk, rks, rv, rvs = append_kv_paged_quantized(
            kp, ks, vp, vs, kn, vn, bt, pos, page_size=page
        )
        ok, ov, oks, ovs = paged_append(
            kp.copy(), vp.copy(), kn, vn, bt, pos,
            k_scales=ks.copy(), v_scales=vs.copy(), page_size=page,
        )
        assert np.array_equal(
            np.asarray(ok, np.int32), np.asarray(rk, np.int32)
        ), page
        assert np.array_equal(
            np.asarray(ov, np.int32), np.asarray(rv, np.int32)
        ), page
        assert np.allclose(
            np.asarray(oks)[..., :page], np.asarray(rks)[..., :page],
            atol=1e-6,
        ), page
        assert np.allclose(
            np.asarray(ovs)[..., :page], np.asarray(rvs)[..., :page],
            atol=1e-6,
        ), page
