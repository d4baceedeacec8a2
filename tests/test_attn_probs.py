"""attention_probs / return_attn_probs=True — the S_dmask debug surface.

The reference returns the score plane with the realized dropout mask encoded
in sign bits for testability (dropout.h:26-105, sign encoding :71-77;
returned from mha_fwd when return_softmax, export.cpp). Our TPU analog is a
second-pass kernel that reconstructs the exact normalized probabilities from
the LSE and regenerates the identical counter-based dropout mask, so:
  - S_dmask rows are true softmax probabilities (visible rows sum to 1),
  - sign(S_dmask) < 0 exactly where the fwd kernel dropped the entry,
  - relu(S_dmask) @ V / (1 - p) reproduces the kernel output bit-for-near."""

import jax
import jax.numpy as jnp
import numpy as np

from xf_flash_attention_cutlass_tpu.api import flash_attn_func
from xf_flash_attention_cutlass_tpu.ops.flash_fwd import attention_probs, flash_fwd
from xf_flash_attention_cutlass_tpu.utils.testing import (
    alibi_slopes_ref, max_err, rand,
)


def _manual_probs(q, k, *, causal, window=(-1, -1), softcap=0.0,
                  alibi_slopes=None):
    """fp32 oracle probability plane (mirrors ops/reference.py's masking)."""
    b, h, sq, d = q.shape
    h_k, sk = k.shape[1], k.shape[2]
    group = h // h_k
    kk = jnp.repeat(k, group, axis=1)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), kk.astype(jnp.float32)
    ) / jnp.sqrt(jnp.float32(d))
    if softcap > 0.0:
        s = jnp.tanh(s / softcap) * softcap
    qpos = jnp.arange(sq)[:, None] + (sk - sq)
    kpos = jnp.arange(sk)[None, :]
    if alibi_slopes is not None:
        s = s - alibi_slopes[None, :, None, None] * jnp.abs(
            qpos - kpos
        ).astype(jnp.float32)
    wl, wr = window
    if causal:
        wr = 0
    keep = jnp.ones((sq, sk), bool)
    if wr >= 0:
        keep &= kpos <= qpos + wr
    if wl >= 0:
        keep &= kpos >= qpos - wl
    s = jnp.where(keep, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.where(jnp.any(keep, -1)[None, None, :, None], p, 0.0)


def test_probs_matches_softmax_gqa():
    b, h, h_k, sq, sk, d = 2, 4, 2, 192, 256, 64
    q = rand(jax.random.PRNGKey(0), (b, h, sq, d), jnp.float32)
    k = rand(jax.random.PRNGKey(1), (b, h_k, sk, d), jnp.float32)
    v = rand(jax.random.PRNGKey(2), (b, h_k, sk, d), jnp.float32)
    o, lse = flash_fwd(q, k, v, causal=True)
    p = attention_probs(q, k, lse, causal=True)
    assert p.shape == (b, h, sq, sk)
    ref = _manual_probs(q, k, causal=True)
    assert max_err(p, ref) < 1e-5
    # rows (all visible here: sk >= sq offset keeps every row live) sum to 1
    assert float(jnp.max(jnp.abs(jnp.sum(p, -1) - 1.0))) < 1e-5
    # P @ V reproduces the kernel output
    group = h // h_k
    o2 = jnp.einsum("bhqk,bhkd->bhqd", p, jnp.repeat(v, group, axis=1))
    assert max_err(o, o2) < 1e-5


def test_probs_alibi_softcap_local():
    b, h, s, d = 1, 3, 256, 32
    slopes = jnp.asarray(alibi_slopes_ref(h))
    q = rand(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)
    k = rand(jax.random.PRNGKey(4), (b, h, s, d), jnp.float32)
    v = rand(jax.random.PRNGKey(5), (b, h, s, d), jnp.float32)
    kw = dict(window=(97, 14), softcap=30.0, alibi_slopes=slopes)
    o, lse = flash_fwd(q, k, v, **kw)
    p = attention_probs(q, k, lse, **kw)
    ref = _manual_probs(q, k, causal=False, window=(97, 14), softcap=30.0,
                        alibi_slopes=slopes)
    assert max_err(p, ref) < 1e-5


def test_probs_dropout_sign_mask_exact():
    """The sign-encoded mask must be the *realized* kernel mask: rebuilding
    the output from relu(S_dmask) reproduces the dropout forward exactly
    (up to f32 online-rescale rounding)."""
    p_drop, seed = 0.3, 11
    b, h, s, d = 1, 2, 512, 64
    q = rand(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32, scale=0.5)
    k = rand(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32, scale=0.5)
    v = rand(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    o, lse = flash_fwd(q, k, v, causal=True, dropout_p=p_drop,
                       dropout_seed=seed)
    sd = attention_probs(q, k, lse, causal=True, dropout_p=p_drop,
                         dropout_seed=seed)
    # realized dropout fraction within the reference tolerance (test.py:981)
    vis = np.tril(np.ones((s, s), bool))[None, None]
    signs = np.signbit(np.asarray(sd))
    frac = float(np.mean(signs[np.broadcast_to(vis, signs.shape)]))
    assert abs(frac - p_drop) < 0.01, frac
    # exact mask replay: kept probs -> output
    o2 = jnp.einsum("bhqk,bhkd->bhqd", jnp.maximum(sd, 0.0), v) / (1 - p_drop)
    assert max_err(o, o2) < 2e-5


def test_api_return_attn_probs_triple():
    b, s, h, d = 2, 128, 2, 64
    q = rand(jax.random.PRNGKey(0), (b, s, h, d), jnp.bfloat16)
    k = rand(jax.random.PRNGKey(1), (b, s, h, d), jnp.bfloat16)
    v = rand(jax.random.PRNGKey(2), (b, s, h, d), jnp.bfloat16)
    out, lse, sd = flash_attn_func(
        q, k, v, dropout_p=0.17, causal=True, return_attn_probs=True,
        dropout_seed=5,
    )
    assert out.shape == (b, s, h, d)
    assert lse.shape == (b, h, s)
    assert sd.shape == (b, h, s, s)
    # bf16 path: rebuild within bf16-level tolerance
    o2 = jnp.einsum(
        "bhqk,bhkd->bhqd", jnp.maximum(sd, 0.0),
        v.swapaxes(1, 2).astype(jnp.float32),
    ) / (1 - 0.17)
    assert max_err(out.swapaxes(1, 2), o2) < 0.03


def test_probs_dropout_sign_mask_multiblock():
    """seq 1024 at the dropout-pinned 512 tiles -> a 2x2 block grid per
    (b, h), causal so the fwd kernel runs its SPARSE live-pair grid while
    the probs pass runs the dense grid: the cross-block blk_idx
    enumeration must agree between the two paths or the replayed mask
    diverges (round-2 advisor finding: all previous replay tests had
    nq=nk=1)."""
    p_drop, seed = 0.25, 7
    b, h, s, d = 1, 2, 1024, 64
    q = rand(jax.random.PRNGKey(10), (b, h, s, d), jnp.float32, scale=0.5)
    k = rand(jax.random.PRNGKey(11), (b, h, s, d), jnp.float32, scale=0.5)
    v = rand(jax.random.PRNGKey(12), (b, h, s, d), jnp.float32)
    o, lse = flash_fwd(q, k, v, causal=True, dropout_p=p_drop,
                       dropout_seed=seed)
    sd = attention_probs(q, k, lse, causal=True, dropout_p=p_drop,
                         dropout_seed=seed)
    vis = np.tril(np.ones((s, s), bool))[None, None]
    signs = np.signbit(np.asarray(sd))
    frac = float(np.mean(signs[np.broadcast_to(vis, signs.shape)]))
    assert abs(frac - p_drop) < 0.01, frac
    # exact replay across all four blocks
    o2 = jnp.einsum("bhqk,bhkd->bhqd", jnp.maximum(sd, 0.0), v) / (1 - p_drop)
    assert max_err(o, o2) < 2e-5


def test_varlen_attn_probs_exact():
    """Packed varlen S_dmask (reference varlen return_softmax parity):
    cross-sequence entries 0, in-sequence rows softmax-normalized, and
    relu(S_dmask) @ V reproduces the varlen forward; dropout replay
    exact through the packed block partitioning."""
    from xf_flash_attention_cutlass_tpu.api import flash_attn_varlen_func
    from xf_flash_attention_cutlass_tpu.ops.varlen import flash_attn_varlen

    rng = np.random.RandomState(0)
    b, h, d = 3, 2, 64
    len_q = np.array([60, 113, 30], np.int32)
    len_k = np.array([90, 113, 70], np.int32)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(len_q)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(len_k)]), jnp.int32)
    tq, tk = int(cu_q[-1]), int(cu_k[-1])
    q = rand(jax.random.PRNGKey(0), (tq, h, d), jnp.float32, scale=0.5)
    k = rand(jax.random.PRNGKey(1), (tk, h, d), jnp.float32, scale=0.5)
    v = rand(jax.random.PRNGKey(2), (tk, h, d), jnp.float32)

    for p_drop in (0.0, 0.3):
        out, lse, sd = flash_attn_varlen_func(
            q, k, v, cu_q, cu_k, max_seqlen_q=113, max_seqlen_k=113,
            causal=True, dropout_p=p_drop, dropout_seed=11,
            return_attn_probs=True,
        )
        assert sd.shape == (h, tq, tk)
        # cross-sequence entries must be exactly 0
        qseg = np.repeat(np.arange(b), len_q)
        kseg = np.repeat(np.arange(b), len_k)
        cross = qseg[:, None] != kseg[None, :]
        assert float(np.max(np.abs(np.asarray(sd)[:, cross]))) == 0.0
        # replay: relu(S) @ V == forward output
        o2 = jnp.einsum("hqk,khd->qhd", jnp.maximum(sd, 0.0), v)
        if p_drop > 0.0:
            o2 = o2 / (1 - p_drop)
        assert max_err(out, o2) < 2e-5


def test_varlen_paged_attn_probs_exact():
    """Paged-varlen S_dmask (round-4 verdict #8 — an EXTENSION: the
    reference's paged varlen path passes nullptr for softmax,
    paged_attn.cpp:425): same packed-key convention as the dense varlen
    S_dmask, cross-sequence entries 0, relu(S) @ V reproduces the paged
    forward; dropout replays the dense-fallback grid exactly."""
    from xf_flash_attention_cutlass_tpu.api import flash_attn_varlen_func

    b, h, d, page = 3, 2, 64, 16
    len_q = np.array([60, 113, 30], np.int32)
    len_k = np.array([90, 113, 70], np.int32)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(len_q)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(len_k)]), jnp.int32)
    tq, tk = int(cu_q[-1]), int(cu_k[-1])
    q = rand(jax.random.PRNGKey(0), (tq, h, d), jnp.float32, scale=0.5)
    kp = rand(jax.random.PRNGKey(1), (tk, h, d), jnp.float32, scale=0.5)
    vp = rand(jax.random.PRNGKey(2), (tk, h, d), jnp.float32)

    max_pages = int(np.ceil(len_k.max() / page))
    n_blocks = b * max_pages + 1
    bt = np.arange(b * max_pages, dtype=np.int32).reshape(b, max_pages) + 1
    k_cache = np.zeros((n_blocks, page, h, d), np.float32)
    v_cache = np.zeros((n_blocks, page, h, d), np.float32)
    for i in range(b):
        for j in range(int(len_k[i])):
            pe, row = bt[i, j // page], j % page
            k_cache[pe, row] = np.asarray(kp[int(cu_k[i]) + j])
            v_cache[pe, row] = np.asarray(vp[int(cu_k[i]) + j])
    k_cache, v_cache = jnp.asarray(k_cache), jnp.asarray(v_cache)
    seqused = jnp.asarray(len_k)

    for p_drop in (0.0, 0.3):
        out, lse, sd = flash_attn_varlen_func(
            q, k_cache, v_cache, cu_q, cu_k, max_seqlen_q=113,
            max_seqlen_k=113, causal=True, dropout_p=p_drop,
            dropout_seed=11, return_attn_probs=True,
            block_table=jnp.asarray(bt), seqused_k=seqused,
        )
        assert sd.shape == (h, tq, tk)
        qseg = np.repeat(np.arange(b), len_q)
        kseg = np.repeat(np.arange(b), len_k)
        cross = qseg[:, None] != kseg[None, :]
        assert float(np.max(np.abs(np.asarray(sd)[:, cross]))) == 0.0
        # visible rows are softmax-normalized (p_drop=0 pass only)
        if p_drop == 0.0:
            rows = np.asarray(jnp.sum(jnp.maximum(sd, 0.0), -1))
            assert abs(float(rows.max()) - 1.0) < 1e-4
        # replay: relu(S) @ packed V == paged forward output
        o2 = jnp.einsum("hqk,khd->qhd", jnp.maximum(sd, 0.0), vp)
        if p_drop > 0.0:
            o2 = o2 / (1 - p_drop)
        assert max_err(out, o2) < 2e-5
