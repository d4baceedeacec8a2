"""Varlen (ragged batch) attention vs per-sequence oracle — the TPU analog of
test_flash_attn_varlen_output (/root/reference/test.py:988-1307), using
random per-batch lengths and the dual-reference tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xf_flash_attention_cutlass_tpu.ops.reference import attention_ref
from xf_flash_attention_cutlass_tpu.ops.varlen import (
    flash_attn_varlen,
    segments_from_cu_seqlens,
)
from xf_flash_attention_cutlass_tpu.utils.testing import assert_close_2ref, max_err, rand


def make_ragged(key, b, max_sq, max_sk, h, h_k, d, dtype, decode=False):
    """Random per-sequence lengths; returns packed arrays + padded oracle view."""
    rng = np.random.RandomState(0)
    len_q = (
        np.full(b, 1, np.int32)
        if decode
        else rng.randint(1, max_sq + 1, b).astype(np.int32)
    )
    len_k = rng.randint(1, max_sk + 1, b).astype(np.int32)
    cu_q = np.concatenate([[0], np.cumsum(len_q)]).astype(np.int32)
    cu_k = np.concatenate([[0], np.cumsum(len_k)]).astype(np.int32)
    total_q, total_k = int(cu_q[-1]), int(cu_k[-1])
    keys = jax.random.split(key, 3)
    q = rand(keys[0], (total_q, h, d), dtype)
    k = rand(keys[1], (total_k, h_k, d), dtype)
    v = rand(keys[2], (total_k, h_k, d), dtype)
    return q, k, v, jnp.asarray(cu_q), jnp.asarray(cu_k), len_q, len_k


def ref_per_sequence(q, k, v, cu_q, cu_k, len_q, len_k, upcast, reorder,
                     causal, window, softcap):
    outs = []
    for i in range(len(len_q)):
        qi = q[int(cu_q[i]):int(cu_q[i + 1])][None]
        ki = k[int(cu_k[i]):int(cu_k[i + 1])][None]
        vi = v[int(cu_k[i]):int(cu_k[i + 1])][None]
        oi, _ = attention_ref(
            qi, ki, vi, causal=causal, window_size=window, softcap=softcap,
            upcast=upcast, reorder_ops=reorder,
        )
        outs.append(oi[0])
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("h,h_k", [(4, 4), (8, 2)])
def test_varlen_output(causal, h, h_k):
    q, k, v, cu_q, cu_k, len_q, len_k = make_ragged(
        jax.random.PRNGKey(0), 4, 157, 203, h, h_k, 64, jnp.float16
    )
    out, lse = flash_attn_varlen(
        q, k, v, cu_q, cu_k, max_seqlen_q=157, max_seqlen_k=203, causal=causal
    )
    out_ref = ref_per_sequence(
        q, k, v, cu_q, cu_k, len_q, len_k, True, False, causal, (-1, -1), 0.0
    )
    out_lp = ref_per_sequence(
        q, k, v, cu_q, cu_k, len_q, len_k, False, True, causal, (-1, -1), 0.0
    )
    assert_close_2ref(out, out_ref, out_lp)
    assert lse.shape == (h, q.shape[0])


@pytest.mark.parametrize("window", [(32, 0), (16, 8)])
def test_varlen_local(window):
    q, k, v, cu_q, cu_k, len_q, len_k = make_ragged(
        jax.random.PRNGKey(1), 3, 120, 180, 2, 2, 64, jnp.float16
    )
    out, _ = flash_attn_varlen(
        q, k, v, cu_q, cu_k, max_seqlen_q=120, max_seqlen_k=180, window=window
    )
    out_ref = ref_per_sequence(
        q, k, v, cu_q, cu_k, len_q, len_k, True, False, False, window, 0.0
    )
    out_lp = ref_per_sequence(
        q, k, v, cu_q, cu_k, len_q, len_k, False, True, False, window, 0.0
    )
    assert_close_2ref(out, out_ref, out_lp)


def test_varlen_decode_shape():
    # all len_q == 1: packed decode over ragged KV histories
    q, k, v, cu_q, cu_k, len_q, len_k = make_ragged(
        jax.random.PRNGKey(2), 8, 1, 300, 4, 4, 64, jnp.float16, decode=True
    )
    out, _ = flash_attn_varlen(
        q, k, v, cu_q, cu_k, max_seqlen_q=1, max_seqlen_k=300, causal=True
    )
    out_ref = ref_per_sequence(
        q, k, v, cu_q, cu_k, len_q, len_k, True, False, True, (-1, -1), 0.0
    )
    out_lp = ref_per_sequence(
        q, k, v, cu_q, cu_k, len_q, len_k, False, True, True, (-1, -1), 0.0
    )
    assert_close_2ref(out, out_ref, out_lp)


def test_varlen_grads():
    q, k, v, cu_q, cu_k, len_q, len_k = make_ragged(
        jax.random.PRNGKey(3), 3, 100, 150, 2, 2, 64, jnp.float32
    )
    g = rand(jax.random.PRNGKey(4), q.shape, jnp.float32)

    def impl_loss(q, k, v):
        o, _ = flash_attn_varlen(
            q, k, v, cu_q, cu_k, max_seqlen_q=100, max_seqlen_k=150, causal=True
        )
        return jnp.sum(o * g)

    def ref_loss(q, k, v):
        o = ref_per_sequence(
            q, k, v, cu_q, cu_k, len_q, len_k, True, False, True, (-1, -1), 0.0
        )
        return jnp.sum(o * g)

    grads = jax.grad(impl_loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(grads, grads_ref):
        assert float(jnp.max(jnp.abs(a - b))) < 2e-4


def test_segments_from_cu_seqlens():
    cu = jnp.asarray([0, 3, 3, 7], jnp.int32)
    seg = segments_from_cu_seqlens(cu, 9)
    assert list(np.asarray(seg)) == [0, 0, 0, 2, 2, 2, 2, -1, -1]


def test_varlen_paged_prefill():
    """Ragged prefill against a paged cache == dense oracle on the gathered
    cache (reference mha_varlen_fwd with block_table, export.cpp:732-741)."""
    import numpy as np
    from xf_flash_attention_cutlass_tpu.ops.varlen import flash_attn_varlen_paged

    rng = np.random.default_rng(0)
    b, h, h_k, d, page = 3, 4, 2, 64, 16
    kv_lens = [37, 111, 64]
    q_lens = [5, 20, 64]
    max_pages = 8
    nb = 40
    kc = rand(jax.random.PRNGKey(1), (nb, page, h_k, d), jnp.float16)
    vc = rand(jax.random.PRNGKey(2), (nb, page, h_k, d), jnp.float16)
    bt = jnp.asarray(rng.permutation(nb)[: b * max_pages].reshape(b, max_pages), jnp.int32)
    total_q = sum(q_lens)
    q = rand(jax.random.PRNGKey(3), (total_q, h, d), jnp.float16)
    cu_q = jnp.asarray(np.cumsum([0] + q_lens), jnp.int32)
    seqused = jnp.asarray(kv_lens, jnp.int32)

    out, lse = flash_attn_varlen_paged(
        q, kc, vc, bt, cu_q, seqused, causal=True
    )
    assert out.shape == (total_q, h, d)

    # oracle: per-sequence dense attention on gathered pages
    kd = kc[np.asarray(bt).reshape(-1)].reshape(b, max_pages * page, h_k, d)
    vd = vc[np.asarray(bt).reshape(-1)].reshape(b, max_pages * page, h_k, d)
    off = 0
    for i in range(b):
        sq, sk = q_lens[i], kv_lens[i]
        qi = q[off : off + sq][None]  # (1, sq, h, d)
        mask = (jnp.arange(max_pages * page) < sk)[None, :]
        ref, _ = attention_ref(
            qi, kd[i][None], vd[i][None], key_padding_mask=mask, causal=True
        )
        lp, _ = attention_ref(
            qi, kd[i][None], vd[i][None], key_padding_mask=mask, causal=True,
            upcast=False, reorder_ops=True,
        )
        assert_close_2ref(out[off : off + sq][None], ref, lp, mult=2.0)
        off += sq


def test_varlen_seqused_k():
    """seqused_k limits live keys per sequence (export.cpp's mha_varlen_fwd
    parameter, block_info.h seqused_k path)."""
    from xf_flash_attention_cutlass_tpu.ops.varlen import flash_attn_varlen

    b, h, d = 3, 4, 64
    q_lens = [7, 20, 33]
    k_lens = [40, 64, 100]
    used = [17, 64, 51]
    total_q, total_k = sum(q_lens), sum(k_lens)
    q = rand(jax.random.PRNGKey(0), (total_q, h, d), jnp.float16)
    k = rand(jax.random.PRNGKey(1), (total_k, h, d), jnp.float16)
    v = rand(jax.random.PRNGKey(2), (total_k, h, d), jnp.float16)
    import numpy as np
    cu_q = jnp.asarray(np.cumsum([0] + q_lens), jnp.int32)
    cu_k = jnp.asarray(np.cumsum([0] + k_lens), jnp.int32)

    out, _ = flash_attn_varlen(
        q, k, v, cu_q, cu_k, max_seqlen_q=33, max_seqlen_k=100,
        seqused_k=jnp.asarray(used, jnp.int32), causal=True,
    )
    qo = ko = 0
    for i in range(b):
        sq, sk, u = q_lens[i], k_lens[i], used[i]
        qi = q[qo:qo + sq][None]
        ki = k[ko:ko + sk][None]
        vi = v[ko:ko + sk][None]
        mask = (jnp.arange(sk) < u)[None]
        ref, _ = attention_ref(qi, ki, vi, key_padding_mask=mask, causal=True)
        lp, _ = attention_ref(
            qi, ki, vi, key_padding_mask=mask, causal=True,
            upcast=False, reorder_ops=True,
        )
        assert_close_2ref(out[qo:qo + sq][None], ref, lp, mult=2.0)
        qo += sq
        ko += sk


def test_varlen_alibi_per_batch():
    """(batch, heads) ALiBi slopes in packed varlen — reference parity
    export.cpp:456,470 (its varlen entries accept (b, h) slopes)."""
    from xf_flash_attention_cutlass_tpu.ops.reference import (
        attn_bias_from_alibi_slopes,
    )

    b, h = 4, 4
    q, k, v, cu_q, cu_k, len_q, len_k = make_ragged(
        jax.random.PRNGKey(5), b, 97, 140, h, h, 64, jnp.float16
    )
    slopes = rand(jax.random.PRNGKey(6), (b, h), jnp.float32) * 0.1
    out, _ = flash_attn_varlen(
        q, k, v, cu_q, cu_k, max_seqlen_q=97, max_seqlen_k=140,
        causal=True, alibi_slopes=slopes,
    )

    def per_seq(upcast, reorder):
        outs = []
        for i in range(b):
            qi = q[int(cu_q[i]):int(cu_q[i + 1])][None]
            ki = k[int(cu_k[i]):int(cu_k[i + 1])][None]
            vi = v[int(cu_k[i]):int(cu_k[i + 1])][None]
            bias = attn_bias_from_alibi_slopes(
                slopes[i : i + 1], int(len_q[i]), int(len_k[i]), causal=True
            )
            oi, _ = attention_ref(
                qi, ki, vi, attn_bias=bias, causal=True,
                upcast=upcast, reorder_ops=reorder,
            )
            outs.append(oi[0])
        return jnp.concatenate(outs, axis=0)

    assert_close_2ref(out, per_seq(True, False), per_seq(False, True))


def test_varlen_alibi_per_batch_grads():
    """Grads flow through the per-row slope plane path (bwd kernels'
    has_alibi_rows)."""
    from xf_flash_attention_cutlass_tpu.ops.reference import (
        attn_bias_from_alibi_slopes,
    )

    b, h = 2, 2
    q, k, v, cu_q, cu_k, len_q, len_k = make_ragged(
        jax.random.PRNGKey(7), b, 80, 100, h, h, 64, jnp.float32
    )
    slopes = rand(jax.random.PRNGKey(8), (b, h), jnp.float32) * 0.05
    g = rand(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def impl_loss(q, k, v):
        o, _ = flash_attn_varlen(
            q, k, v, cu_q, cu_k, max_seqlen_q=80, max_seqlen_k=100,
            causal=True, alibi_slopes=slopes,
        )
        return jnp.sum(o * g)

    def ref_loss(q, k, v):
        outs = []
        for i in range(b):
            qi = q[int(cu_q[i]):int(cu_q[i + 1])][None]
            ki = k[int(cu_k[i]):int(cu_k[i + 1])][None]
            vi = v[int(cu_k[i]):int(cu_k[i + 1])][None]
            bias = attn_bias_from_alibi_slopes(
                slopes[i : i + 1], int(len_q[i]), int(len_k[i]), causal=True
            )
            oi, _ = attention_ref(qi, ki, vi, attn_bias=bias, causal=True)
            outs.append(oi[0])
        return jnp.sum(jnp.concatenate(outs, axis=0) * g)

    grads = jax.grad(impl_loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(grads, grads_ref):
        assert float(jnp.max(jnp.abs(a - b_))) < 3e-4


def test_varlen_paged_alibi_per_batch():
    """(b, h) slopes through the paged varlen path (native kernel slopes)."""
    import numpy as np
    from xf_flash_attention_cutlass_tpu.ops.reference import (
        attn_bias_from_alibi_slopes,
    )
    from xf_flash_attention_cutlass_tpu.ops.varlen import flash_attn_varlen_paged

    rng = np.random.default_rng(1)
    b, h, h_k, d, page = 3, 4, 2, 64, 16
    kv_lens = [37, 111, 64]
    q_lens = [5, 20, 64]
    max_pages, nb = 8, 40
    kc = rand(jax.random.PRNGKey(1), (nb, page, h_k, d), jnp.float16)
    vc = rand(jax.random.PRNGKey(2), (nb, page, h_k, d), jnp.float16)
    bt = jnp.asarray(
        rng.permutation(nb)[: b * max_pages].reshape(b, max_pages), jnp.int32
    )
    total_q = sum(q_lens)
    q = rand(jax.random.PRNGKey(3), (total_q, h, d), jnp.float16)
    cu_q = jnp.asarray(np.cumsum([0] + q_lens), jnp.int32)
    seqused = jnp.asarray(kv_lens, jnp.int32)
    slopes = rand(jax.random.PRNGKey(4), (b, h), jnp.float32) * 0.1

    out, _ = flash_attn_varlen_paged(
        q, kc, vc, bt, cu_q, seqused, causal=True, alibi_slopes=slopes
    )

    kd = kc[np.asarray(bt).reshape(-1)].reshape(b, max_pages * page, h_k, d)
    vd = vc[np.asarray(bt).reshape(-1)].reshape(b, max_pages * page, h_k, d)
    off = 0
    for i in range(b):
        sq, sk = q_lens[i], kv_lens[i]
        qi = q[off : off + sq][None]
        mask = (jnp.arange(max_pages * page) < sk)[None, :]
        bias = attn_bias_from_alibi_slopes(
            slopes[i : i + 1], sq, max_pages * page,
            key_padding_mask=mask, causal=False,
        )
        # causal=False bias form with explicit key mask: the |rel-pos| form
        # the paged kernel also uses (bottom-right aligned via sk - sq)
        ref, _ = attention_ref(
            qi, kd[i][None], vd[i][None], key_padding_mask=mask, causal=True,
            attn_bias=bias,
        )
        lp, _ = attention_ref(
            qi, kd[i][None], vd[i][None], key_padding_mask=mask, causal=True,
            attn_bias=bias, upcast=False, reorder_ops=True,
        )
        assert_close_2ref(out[off : off + sq][None], ref, lp, mult=2.0)
        off += sq


def test_varlen_paged_fallback_logged(caplog):
    """The dense-gather fallback announces the traffic-class change
    (round-2 verdict Weak #6: serving callers silently lost paging)."""
    import logging
    import numpy as np
    from xf_flash_attention_cutlass_tpu.ops.varlen import flash_attn_varlen_paged

    b, h, h_k, d, page = 1, 2, 2, 64, 16
    nb, max_pages = 8, 4
    kc = rand(jax.random.PRNGKey(1), (nb, page, h_k, d), jnp.float16)
    vc = rand(jax.random.PRNGKey(2), (nb, page, h_k, d), jnp.float16)
    bt = jnp.arange(b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    q = rand(jax.random.PRNGKey(3), (8, h, d), jnp.float16)
    cu_q = jnp.asarray([0, 8], jnp.int32)
    seqused = jnp.asarray([40], jnp.int32)

    with caplog.at_level(
        logging.DEBUG, logger="xf_flash_attention_cutlass_tpu.ops.varlen"
    ):
        # dropout forces the fallback regardless of query-block size
        flash_attn_varlen_paged(
            q, kc, vc, bt, cu_q, seqused, causal=True, dropout_p=0.1
        )
    assert any("DENSE gather" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(
        logging.DEBUG, logger="xf_flash_attention_cutlass_tpu.ops.varlen"
    ):
        flash_attn_varlen_paged(q, kc, vc, bt, cu_q, seqused, causal=True)
    assert not any("DENSE gather" in r.message for r in caplog.records)


def test_varlen_paged_rows_split_route():
    """The varlen-paged path through the rows-split (large query blocks no
    longer fall back to the dense gather): forced small XFA_PAGED_ROWS_MAX
    must leave results identical to the unsplit kernel."""
    import os
    import numpy as np
    from xf_flash_attention_cutlass_tpu.ops.varlen import flash_attn_varlen_paged

    rng = np.random.default_rng(2)
    b, h, h_k, d, page = 2, 4, 2, 64, 16
    q_lens = [48, 30]
    kv_lens = [90, 60]
    max_pages, nb = 8, 20
    kc = rand(jax.random.PRNGKey(1), (nb, page, h_k, d), jnp.float32)
    vc = rand(jax.random.PRNGKey(2), (nb, page, h_k, d), jnp.float32)
    bt = jnp.asarray(
        rng.permutation(nb)[: b * max_pages].reshape(b, max_pages), jnp.int32
    )
    q = rand(jax.random.PRNGKey(3), (sum(q_lens), h, d), jnp.float32)
    cu_q = jnp.asarray(np.cumsum([0] + q_lens), jnp.int32)
    sek = jnp.asarray(kv_lens, jnp.int32)

    ref_o, ref_l = flash_attn_varlen_paged(
        q, kc, vc, bt, cu_q, sek, max_seqlen_q=48, causal=True
    )
    os.environ["XFA_PAGED_ROWS_MAX"] = "32"  # sq_max*g = 96 -> 3 groups
    try:
        o, l = flash_attn_varlen_paged(
            q, kc, vc, bt, cu_q, sek, max_seqlen_q=48, causal=True
        )
    finally:
        del os.environ["XFA_PAGED_ROWS_MAX"]
    assert max_err(o, ref_o) < 1e-6
    fin = jnp.isfinite(ref_l)
    assert max_err(jnp.where(fin, l, 0.0), jnp.where(fin, ref_l, 0.0)) < 1e-6
