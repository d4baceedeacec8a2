"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4: make
distributed logic testable without a pod): TP forward/grad equivalence vs
the single-device model, and ring-attention context parallelism vs the
dense kernel."""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from xf_flash_attention_cutlass_tpu.models.llama import (
    LlamaConfig,
    forward,
    init_params,
    loss_fn,
)
from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd
from xf_flash_attention_cutlass_tpu.parallel import (
    make_mesh,
    ring_attention,
    shard_params,
    tp_forward,
    tp_loss_and_grad,
)
from xf_flash_attention_cutlass_tpu.utils.testing import max_err


def _cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return devs[:n]


def _tiny():
    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
        ffn_dim=96, max_seq_len=256,
    )
    return cfg, init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2), (1, 4), (2, 4)])
def test_tp_forward_matches_single(dp, tp):
    cfg, params = _tiny()
    mesh = make_mesh(dp=dp, tp=tp, devices=_cpu_devices(dp * tp))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2 * dp, 17), 0, cfg.vocab_size)
    ref = forward(params, tokens, cfg)
    sharded = shard_params(params, mesh)
    out = tp_forward(sharded, tokens, cfg, mesh)
    assert max_err(out, ref) < 1e-4


def test_tp_loss_and_grad_matches_single():
    cfg, params = _tiny()
    mesh = make_mesh(dp=2, tp=2, devices=_cpu_devices(4))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 16), 0, cfg.vocab_size)
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
    sharded = shard_params(params, mesh)
    loss, grads = tp_loss_and_grad(sharded, tokens, cfg, mesh)
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    err = jax.tree_util.tree_map(
        lambda a, b: max_err(a, b), grads, ref_grads
    )
    worst = max(jax.tree_util.tree_leaves(err))
    assert worst < 1e-4, worst


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    n = 4
    devs = _cpu_devices(n)
    mesh = make_mesh(cp=n, devices=devs)
    b, h, s_local, d = 1, 2, 64, 64
    s = s_local * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)

    o_ref, lse_ref = flash_fwd(q, k, v, causal=causal)

    ring = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, "cp", causal=causal),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=(P(None, None, "cp", None), P(None, None, "cp")),
            check_vma=False,
        )
    )
    o, lse = ring(q, k, v)
    assert max_err(o, o_ref) < 1e-4
    assert max_err(lse, lse_ref) < 1e-4


def test_ring_attention_gqa():
    n = 4
    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, h_k, s_local, d = 1, 4, 2, 32, 64
    s = s_local * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h_k, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h_k, s, d), jnp.float32)
    o_ref, _ = flash_fwd(q, k, v, causal=True)
    ring = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, "cp", causal=True)[0],
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=P(None, None, "cp", None),
            check_vma=False,
        )
    )
    assert max_err(ring(q, k, v), o_ref) < 1e-4


@pytest.mark.parametrize("quant", [None, "int8"])
def test_tp_paged_decode_matches_single(quant):
    """TP-sharded decode step == single-device decode step (config 5)."""
    from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
        shard_pools,
        tp_decode_step,
    )
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv
    from xf_flash_attention_cutlass_tpu.serve.engine import decode_step

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, num_pages, page = cfg.n_layers, 8, 16
    b, mp = 2, 4
    key = jax.random.PRNGKey(1)
    kpool = jax.random.normal(
        key, (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32
    )
    vpool = jax.random.normal(
        jax.random.PRNGKey(2), kpool.shape, jnp.float32
    )
    if quant:
        kq, ks = quantize_kv(kpool, quant)
        vq, vs = quantize_kv(vpool, quant)
        pools = dict(k=kq, v=vq, k_s=ks[..., 0], v_s=vs[..., 0])
    else:
        pools = dict(k=kpool, v=vpool)
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    kv_lens = jnp.asarray([17, 40], jnp.int32)
    tokens = jnp.asarray([[5], [9]], jnp.int32)

    # decode_step donates pools; keep the originals for the tp run
    ref_tok, ref_logits, ref_pools = decode_step(
        params, tokens, {k: v.copy() for k, v in pools.items()}, bt, kv_lens,
        cfg, quant,
    )

    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    from xf_flash_attention_cutlass_tpu.parallel import shard_params

    sp = shard_params(params, mesh)
    spools = shard_pools(pools, mesh)
    tok, logits, out_pools = tp_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh, quant
    )
    assert max_err(logits, ref_logits) < 1e-4
    assert jnp.array_equal(tok, ref_tok)
    for name in pools:
        assert max_err(out_pools[name], ref_pools[name]) < 1e-5, name


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention_matches_dense(causal):
    from xf_flash_attention_cutlass_tpu.parallel.ulysses import ulysses_attention

    n = 4
    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, s_local, d = 1, 4, 64, 64
    s = s_local * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)
    o_ref, lse_ref = flash_fwd(q, k, v, causal=causal)
    uly = jax.jit(
        jax.shard_map(
            lambda q, k, v: ulysses_attention(q, k, v, "cp", causal=causal),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=(P(None, None, "cp", None), P(None, None, "cp")),
            check_vma=False,
        )
    )
    o, lse = uly(q, k, v)
    assert max_err(o, o_ref) < 1e-4
    assert max_err(lse, lse_ref) < 1e-4


@pytest.mark.parametrize("h_k", [1, 2, 3, 8])
def test_ulysses_attention_gqa(h_k):
    """h_k == 8: kv heads split via all_to_all; h_k == 2 < n: grouped
    repeat+all_to_all (round-4 #7); h_k == 1 (MQA) and h_k == 3 (not
    dividing n): full-KV all-gather fallback."""
    from xf_flash_attention_cutlass_tpu.parallel.ulysses import ulysses_attention

    n = 4
    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, s_local, d = 1, 12 if h_k == 3 else 8, 32, 64
    s = s_local * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h_k, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h_k, s, d), jnp.float32)
    o_ref, _ = flash_fwd(q, k, v, causal=True)
    uly = jax.jit(
        jax.shard_map(
            lambda q, k, v: ulysses_attention(q, k, v, "cp", causal=True)[0],
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=P(None, None, "cp", None),
            check_vma=False,
        )
    )
    assert max_err(uly(q, k, v), o_ref) < 1e-4


@pytest.mark.parametrize("quant", [None, "int8"])
def test_tp_verify_matches_single(quant):
    """TP-sharded speculative verification == single-device verify_step."""
    from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
        shard_pools,
        tp_verify_step,
    )
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv
    from xf_flash_attention_cutlass_tpu.serve.engine import verify_step

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, num_pages, page = cfg.n_layers, 8, 16
    kpool = jax.random.normal(
        jax.random.PRNGKey(1),
        (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32,
    )
    vpool = jax.random.normal(jax.random.PRNGKey(2), kpool.shape, jnp.float32)
    if quant:
        kq, ks = quantize_kv(kpool, quant)
        vq, vs = quantize_kv(vpool, quant)
        pools = dict(k=kq, v=vq, k_s=ks[..., 0], v_s=vs[..., 0])
    else:
        pools = dict(k=kpool, v=vpool)
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    Lq = 3  # draft length + 1
    kv_lens = jnp.asarray([17 + Lq, 40 + Lq], jnp.int32)
    tokens = jnp.asarray([[5, 11, 3], [9, 2, 60]], jnp.int32)

    ref_logits, ref_pools = verify_step(
        params, tokens, {k: v.copy() for k, v in pools.items()}, bt, kv_lens,
        cfg, quant,
    )

    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    from xf_flash_attention_cutlass_tpu.parallel import shard_params

    sp = shard_params(params, mesh)
    spools = shard_pools(pools, mesh)
    logits, out_pools = tp_verify_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh, quant
    )
    assert logits.shape == (2, Lq, cfg.vocab_size)
    assert max_err(logits, ref_logits) < 1e-4
    for name in pools:
        assert max_err(out_pools[name], ref_pools[name]) < 1e-5, name


@pytest.mark.parametrize("quant", [None, "int8"])
def test_tp_dp_decode_matches_single(quant):
    """dp x tp serving decode == per-replica single-device decode: batch
    and page pool split over dp, heads over tp, zero cross-dp traffic."""
    from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
        tp_dp_decode_step,
    )
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv
    from xf_flash_attention_cutlass_tpu.serve.engine import decode_step

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, page = cfg.n_layers, 16
    local_pages, dp = 8, 2
    num_pages = dp * local_pages
    b_local, mp = 2, 4
    kpool = jax.random.normal(
        jax.random.PRNGKey(1),
        (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32,
    )
    vpool = jax.random.normal(jax.random.PRNGKey(2), kpool.shape, jnp.float32)
    if quant:
        kq, ks = quantize_kv(kpool, quant)
        vq, vs = quantize_kv(vpool, quant)
        pools = dict(k=kq, v=vq, k_s=ks[..., 0], v_s=vs[..., 0])
    else:
        pools = dict(k=kpool, v=vpool)
    # dp-LOCAL page ids; global batch stacks the two replicas' requests
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7],
                      [0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    kv_lens = jnp.asarray([17, 40, 9, 33], jnp.int32)
    tokens = jnp.asarray([[5], [9], [31], [2]], jnp.int32)

    # reference: run each dp replica separately on its pool slice
    ref_toks, ref_logits, ref_pools = [], [], []
    for r in range(dp):
        pr = {k: v[:, r * local_pages:(r + 1) * local_pages].copy()
              for k, v in pools.items()}
        t, lg, pp = decode_step(
            params, tokens[r * b_local:(r + 1) * b_local], pr,
            bt[r * b_local:(r + 1) * b_local],
            kv_lens[r * b_local:(r + 1) * b_local], cfg, quant,
        )
        ref_toks.append(t); ref_logits.append(lg); ref_pools.append(pp)

    mesh = make_mesh(dp=dp, tp=2, devices=_cpu_devices(4))
    from xf_flash_attention_cutlass_tpu.parallel import shard_params
    from jax.sharding import NamedSharding

    sp = shard_params(params, mesh)
    spools = {
        k: jax.device_put(v, NamedSharding(
            mesh, P(None, "dp", "tp", *([None] * (v.ndim - 3)))))
        for k, v in pools.items()
    }
    tok, logits, out_pools = tp_dp_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh, quant
    )
    assert jnp.array_equal(tok, jnp.concatenate(ref_toks))
    assert max_err(logits, jnp.concatenate(ref_logits)) < 1e-4
    for name in pools:
        want = jnp.concatenate([rp[name] for rp in ref_pools], axis=1)
        assert max_err(out_pools[name], want) < 1e-5, name


# ---- differentiable context parallelism (ring + Ulysses custom VJPs) ----


def _cp_grad_ref(q, k, v, causal):
    """Single-device autodiff through the flash custom-VJP."""
    from xf_flash_attention_cutlass_tpu.ops.flash import flash_attention

    def loss(q, k, v):
        o, _ = flash_attention(q, k, v, causal=causal)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_grad_matches_dense(causal):
    n = 4
    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, s_local, d = 1, 2, 64, 64
    s = s_local * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)
    ref_loss, ref_grads = _cp_grad_ref(q, k, v, causal)

    def local_loss(q, k, v):
        from xf_flash_attention_cutlass_tpu.models.llama import scale_grad

        o, _ = ring_attention(q, k, v, "cp", causal=causal)
        # replicated scalar must pass through a collective under
        # check_vma=False (CLAUDE.md); the psum's transpose hands every
        # device the full cotangent, n-fold overcounting grads of a
        # custom-VJP region that already returns COMPLETE per-shard grads
        # -> scale_grad(1/n), the same fix as the vocab all_gather
        # (models/llama.py scale_grad docstring)
        loss = jax.lax.psum(jnp.sum(jnp.sin(o.astype(jnp.float32))), "cp")
        return scale_grad(loss, 1.0 / jax.lax.axis_size("cp"))

    ring_vg = jax.jit(
        jax.shard_map(
            jax.value_and_grad(local_loss, argnums=(0, 1, 2)),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=(P(), (P(None, None, "cp", None),) * 3),
            check_vma=False,
        )
    )
    loss, grads = ring_vg(q, k, v)
    assert abs(float(loss) - float(ref_loss)) < 1e-4
    for g, g_ref in zip(grads, ref_grads):
        assert max_err(g, g_ref) < 1e-4


def test_ring_attention_grad_gqa():
    n = 4
    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, h_k, s_local, d = 1, 4, 2, 32, 64
    s = s_local * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h_k, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h_k, s, d), jnp.float32)
    ref_loss, ref_grads = _cp_grad_ref(q, k, v, True)

    def local_loss(q, k, v):
        from xf_flash_attention_cutlass_tpu.models.llama import scale_grad

        o, _ = ring_attention(q, k, v, "cp", causal=True)
        loss = jax.lax.psum(jnp.sum(jnp.sin(o.astype(jnp.float32))), "cp")
        return scale_grad(loss, 1.0 / jax.lax.axis_size("cp"))

    ring_vg = jax.jit(
        jax.shard_map(
            jax.value_and_grad(local_loss, argnums=(0, 1, 2)),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=(P(), (P(None, None, "cp", None),) * 3),
            check_vma=False,
        )
    )
    loss, grads = ring_vg(q, k, v)
    assert abs(float(loss) - float(ref_loss)) < 1e-4
    for g, g_ref in zip(grads, ref_grads):
        assert max_err(g, g_ref) < 1e-4


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention_grad_matches_dense(causal):
    from xf_flash_attention_cutlass_tpu.parallel.ulysses import ulysses_attention

    n = 4
    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, s_local, d = 1, 4, 32, 64
    s = s_local * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)
    ref_loss, ref_grads = _cp_grad_ref(q, k, v, causal)

    def local_loss(q, k, v):
        from xf_flash_attention_cutlass_tpu.models.llama import scale_grad

        o, _ = ulysses_attention(q, k, v, "cp", causal=causal)
        loss = jax.lax.psum(jnp.sum(jnp.sin(o.astype(jnp.float32))), "cp")
        return scale_grad(loss, 1.0 / jax.lax.axis_size("cp"))

    uly_vg = jax.jit(
        jax.shard_map(
            jax.value_and_grad(local_loss, argnums=(0, 1, 2)),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=(P(), (P(None, None, "cp", None),) * 3),
            check_vma=False,
        )
    )
    loss, grads = uly_vg(q, k, v)
    assert abs(float(loss) - float(ref_loss)) < 1e-4
    for g, g_ref in zip(grads, ref_grads):
        assert max_err(g, g_ref) < 1e-4


def test_ulysses_attention_grad_gqa_fewkv():
    """GQA with 1 < h_k < n devices: the grouped repeat+all_to_all path
    (round-4 #7) — grads flow through the repeat (transpose: segment sum)
    and the all_to_all pair."""
    from xf_flash_attention_cutlass_tpu.parallel.ulysses import ulysses_attention

    n = 4
    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, h_k, s_local, d = 1, 8, 2, 32, 64
    s = s_local * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h_k, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h_k, s, d), jnp.float32)
    ref_loss, ref_grads = _cp_grad_ref(q, k, v, True)

    def local_loss(q, k, v):
        from xf_flash_attention_cutlass_tpu.models.llama import scale_grad

        o, _ = ulysses_attention(q, k, v, "cp", causal=True)
        loss = jax.lax.psum(jnp.sum(jnp.sin(o.astype(jnp.float32))), "cp")
        return scale_grad(loss, 1.0 / jax.lax.axis_size("cp"))

    uly_vg = jax.jit(
        jax.shard_map(
            jax.value_and_grad(local_loss, argnums=(0, 1, 2)),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=(P(), (P(None, None, "cp", None),) * 3),
            check_vma=False,
        )
    )
    loss, grads = uly_vg(q, k, v)
    assert abs(float(loss) - float(ref_loss)) < 1e-4
    for g, g_ref in zip(grads, ref_grads):
        assert max_err(g, g_ref) < 1e-4


# ---- TP-sharded DecodeEngine end-to-end (BASELINE config 5) --------------


@pytest.mark.parametrize("quant", [None, "int8"])
def test_tp_engine_token_identical(quant):
    """DecodeEngine(mesh=tp2) — chunked prefill, batched lanes, decode —
    must emit token-identical streams to the single-device engine."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg, params = _tiny()  # n_heads=4, n_kv_heads=4
    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    ecfg = EngineConfig(
        max_batch=4, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2, kv_quant=quant,
    )
    prompts = {
        0: [(7 * i + 3) % cfg.vocab_size for i in range(41)],
        1: [5, 9, 2],
        2: [(3 * i + 11) % cfg.vocab_size for i in range(17)],
    }

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        for rid, p in prompts.items():
            eng.add_request(rid, p, 5)
        return eng.run()

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_tp_engine_speculative_token_identical():
    """TP engine with speculative decoding == single-device engine."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg, params = _tiny()
    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    ecfg = EngineConfig(
        max_batch=2, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, speculate_k=3,
    )
    prompt = [(5 * i + 2) % cfg.vocab_size for i in range(23)]

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        eng.add_request(0, prompt, 6)
        return eng.run()

    assert list(run(mesh)[0]) == list(run(None)[0])


def test_tp_engine_requires_chunked_prefill():
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg, params = _tiny()
    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    with pytest.raises(ValueError):
        DecodeEngine(
            params, cfg,
            EngineConfig(max_batch=2, page_size=16, num_pages=32, max_seq=64),
            dtype=jnp.float32, mesh=mesh,
        )


def test_tp_engine_moe_token_identical():
    """DecodeEngine(mesh=tp2) serving MoE params: shard_params shards the
    expert ffn axes over tp, so moe_mlp_block must psum the expert combine
    (the round-2 verdict's silent-wrong-logits path). Token streams must
    match the single-device MoE engine exactly."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params,
    )

    cfg = MoEConfig(
        vocab_size=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    ecfg = EngineConfig(
        max_batch=2, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2,
    )
    prompts = {
        0: [(7 * i + 3) % cfg.vocab_size for i in range(21)],
        1: [5, 9, 2],
    }

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        for rid, p in prompts.items():
            eng.add_request(rid, p, 5)
        return eng.run()

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_tp_decode_sp_batch_matches_psum():
    """The reduce-scatter + all-gather collective structure (sp_batch) must
    be numerically equivalent to the per-layer psums (same sums, different
    schedule) and to the single-device step."""
    from xf_flash_attention_cutlass_tpu.parallel.tp_serve import (
        shard_pools,
        tp_decode_step,
    )
    from xf_flash_attention_cutlass_tpu.parallel import shard_params
    from xf_flash_attention_cutlass_tpu.serve.engine import decode_step

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, num_pages, page = cfg.n_layers, 8, 16
    kpool = jax.random.normal(
        jax.random.PRNGKey(1),
        (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32,
    )
    vpool = jax.random.normal(jax.random.PRNGKey(2), kpool.shape, jnp.float32)
    pools = dict(k=kpool, v=vpool)
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    kv_lens = jnp.asarray([17, 40], jnp.int32)
    tokens = jnp.asarray([[5], [9]], jnp.int32)

    ref_tok, ref_logits, _ = decode_step(
        params, tokens, {k: v.copy() for k, v in pools.items()}, bt, kv_lens,
        cfg, None,
    )

    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    sp = shard_params(params, mesh)
    tok, logits, _ = tp_decode_step(
        sp, tokens, shard_pools(dict(pools), mesh), bt, kv_lens, cfg, mesh,
        None, sp_batch=True,
    )
    assert max_err(logits, ref_logits) < 1e-4
    assert jnp.array_equal(tok, ref_tok)


def test_dp_tp_engine_token_identical():
    """DecodeEngine on a dp=2 x tp=2 mesh — per-replica allocators, pool
    pages sharded over dp, batch rows sharded over dp, kv heads over tp —
    emits token-identical streams to the single-device engine."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg, params = _tiny()  # n_heads=4, n_kv_heads=4
    mesh = make_mesh(dp=2, tp=2, devices=_cpu_devices(4))
    ecfg = EngineConfig(
        max_batch=4, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2,
    )
    prompts = {
        0: [(7 * i + 3) % cfg.vocab_size for i in range(41)],
        1: [5, 9, 2],
        2: [(3 * i + 11) % cfg.vocab_size for i in range(17)],
        3: [8, 1, 13, 21, 34],
    }

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        for rid, p in prompts.items():
            eng.add_request(rid, p, 5)
        return eng.run()

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_dp_tp_engine_speculative_and_quant():
    """dp x tp engine with speculative decoding and int8 KV pools."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg, params = _tiny()
    mesh = make_mesh(dp=2, tp=2, devices=_cpu_devices(4))
    ecfg = EngineConfig(
        max_batch=4, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2, speculate_k=3, kv_quant="int8",
    )
    prompts = {0: [(5 * i + 2) % cfg.vocab_size for i in range(23)],
               1: [7, 7, 7, 9]}

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        for rid, p in prompts.items():
            eng.add_request(rid, p, 5)
        return eng.run()

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_dp_tp_engine_prefix_caching_token_identical():
    """Shared-prefix caching under dp=2 x tp=2: the prefix KV is
    replicated into every replica's pool shard at register_prefix, so
    requests on any replica attend to it with local page ids. Streams
    must match the single-device prefix-cached engine exactly, and
    release_prefix must return every replica's pages."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg, params = _tiny()
    mesh = make_mesh(dp=2, tp=2, devices=_cpu_devices(4))
    page = 16
    ecfg = EngineConfig(
        max_batch=4, page_size=page, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2,
    )
    prefix = [(3 * i + 1) % cfg.vocab_size for i in range(2 * page + 8)]
    prompts = {
        0: [9, 4, 77],
        1: [15, 2, 8, 30, 1],
        2: [(7 * i + 3) % cfg.vocab_size for i in range(11)],
    }

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        free0 = eng.pool.free_pages()
        eng.register_prefix("sys", prefix)
        # dp replicates the 2 shared pages into each of the 2 replicas
        held = free0 - eng.pool.free_pages()
        assert held == (4 if mesh_arg is not None else 2), held
        for rid, p in prompts.items():
            eng.add_request(rid, p, 5, prefix_id="sys")
        out = eng.run()
        eng.release_prefix("sys")
        assert eng.pool.free_pages() == free0
        return out

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_dp_tp_engine_moe_token_identical():
    """MoE params on a dp=2 x tp=2 mesh: expert ffn axes shard over tp
    (psummed combine), batch rows + pool pages over dp."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params,
    )

    cfg = MoEConfig(
        vocab_size=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(dp=2, tp=2, devices=_cpu_devices(4))
    ecfg = EngineConfig(
        max_batch=4, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2,
    )
    prompts = {
        0: [(7 * i + 3) % cfg.vocab_size for i in range(21)],
        1: [5, 9, 2],
        2: [11, 3, 8, 2, 90, 17],
    }

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        for rid, p in prompts.items():
            eng.add_request(rid, p, 5)
        return eng.run()

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_tp_engine_quantized_moe_token_identical():
    """INT8 expert weights under a TP mesh: the (L, E, f) scale specs
    (tuple-position detection in parallel/tp.py) must shard with their
    weights; streams match the single-device quantized MoE engine."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig
    from xf_flash_attention_cutlass_tpu.models.moe import (
        MoEConfig, init_moe_params, quantize_moe_params,
    )

    cfg = MoEConfig(
        vocab_size=96, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, n_experts=4, top_k=2,
        capacity_factor=8.0,
    )
    params = quantize_moe_params(
        init_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    )
    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    ecfg = EngineConfig(
        max_batch=2, page_size=16, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2,
    )
    prompts = {0: [(7 * i + 3) % cfg.vocab_size for i in range(21)],
               1: [5, 9, 2]}

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        for rid, p in prompts.items():
            eng.add_request(rid, p, 5)
        return eng.run()

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


def test_dp_tp_engine_all_features_composed():
    """Every serving feature at once on the dp=2 x tp=2 mesh: shared
    prefix + chunked prefill lanes + speculative decoding + int8 KV +
    int8 weights — token-identical to the single-device engine with the
    same features."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig
    from xf_flash_attention_cutlass_tpu.models.llama import quantize_params

    cfg, params = _tiny()
    params = quantize_params(params)
    mesh = make_mesh(dp=2, tp=2, devices=_cpu_devices(4))
    page = 16
    ecfg = EngineConfig(
        max_batch=4, page_size=page, num_pages=64, max_seq=256,
        prefill_chunk=32, prefill_lanes=2, speculate_k=3, kv_quant="int8",
    )
    prefix = [(3 * i + 1) % cfg.vocab_size for i in range(page + 5)]
    prompts = {0: [9, 4, 7, 7, 7, 7], 1: [15, 2, 8]}

    def run(mesh_arg):
        eng = DecodeEngine(
            params, cfg, ecfg, dtype=jnp.float32, mesh=mesh_arg
        )
        eng.register_prefix("sys", prefix)
        for rid, p in prompts.items():
            eng.add_request(rid, p, 6, prefix_id="sys")
        out = eng.run()
        eng.release_prefix("sys")
        return out

    ref = run(None)
    out = run(mesh)
    for rid in prompts:
        assert list(out[rid]) == list(ref[rid]), rid


@pytest.mark.parametrize("quant", [None, "int8"])
def test_pp_decode_step_matches_single(quant):
    """Pipeline-parallel decode (parallel/pp_serve.py): layer-axis-sharded
    pools + GPipe microbatch schedule == the single-device decode step
    (logits, sampled tokens AND the updated pools; fill/drain phases must
    only touch the trash page)."""
    from xf_flash_attention_cutlass_tpu.parallel.pp_serve import (
        pp_decode_step, shard_pp_pools,
    )
    from xf_flash_attention_cutlass_tpu.parallel.pp import shard_pp_params
    from xf_flash_attention_cutlass_tpu.quant import quantize_kv
    from xf_flash_attention_cutlass_tpu.serve.engine import decode_step

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=4, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, num_pages, page = cfg.n_layers, 9, 16
    trash = num_pages - 1
    b, mp = 4, 2
    kpool = jax.random.normal(
        jax.random.PRNGKey(1),
        (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32,
    )
    vpool = jax.random.normal(jax.random.PRNGKey(2), kpool.shape, jnp.float32)
    if quant:
        kq, ks = quantize_kv(kpool, quant)
        vq, vs = quantize_kv(vpool, quant)
        pools = dict(k=kq, v=vq, k_s=ks[..., 0], v_s=vs[..., 0])
    else:
        pools = dict(k=kpool, v=vpool)
    bt = jnp.asarray(
        [[0, 1], [2, 3], [4, 5], [6, 7]], jnp.int32
    )
    kv_lens = jnp.asarray([17, 30, 5, 22], jnp.int32)
    tokens = jnp.asarray([[5], [9], [3], [60]], jnp.int32)

    ref_tok, ref_logits, ref_pools = decode_step(
        params, tokens, {k: v.copy() for k, v in pools.items()}, bt, kv_lens,
        cfg, quant,
    )

    from xf_flash_attention_cutlass_tpu.parallel import make_mesh

    mesh = make_mesh(pp=2, devices=_cpu_devices(2))
    sp = shard_pp_params(params, mesh)
    spools = shard_pp_pools({k: v.copy() for k, v in pools.items()}, mesh)
    tok, logits, out_pools = pp_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh, trash_page=trash,
        quant=quant,
    )
    assert max_err(logits, ref_logits) < 1e-4
    assert jnp.array_equal(tok, ref_tok)
    for name in pools:
        a = jnp.asarray(out_pools[name])
        r = jnp.asarray(ref_pools[name])
        # the trash page absorbs fill/drain garbage: compare live pages only
        live = jnp.asarray([p for p in range(num_pages) if p != trash])
        assert max_err(a[:, live], r[:, live]) < 1e-5, name


def test_pp_decode_step_pp4_partial_fill():
    """pp=4 with n_micro=2 < pp: more drain phases than fill, every stage
    sees garbage phases on both sides — trash-page routing must hold."""
    from xf_flash_attention_cutlass_tpu.parallel.pp_serve import (
        pp_decode_step, shard_pp_pools,
    )
    from xf_flash_attention_cutlass_tpu.parallel.pp import shard_pp_params
    from xf_flash_attention_cutlass_tpu.serve.engine import decode_step

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=4, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, num_pages, page = cfg.n_layers, 9, 16
    trash = num_pages - 1
    kpool = jax.random.normal(
        jax.random.PRNGKey(1),
        (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32,
    )
    vpool = jax.random.normal(jax.random.PRNGKey(2), kpool.shape, jnp.float32)
    pools = dict(k=kpool, v=vpool)
    bt = jnp.asarray([[0, 1], [2, 3], [4, 5], [6, 7]], jnp.int32)
    kv_lens = jnp.asarray([17, 30, 5, 22], jnp.int32)
    tokens = jnp.asarray([[5], [9], [3], [60]], jnp.int32)

    ref_tok, ref_logits, _ = decode_step(
        params, tokens, {k: v.copy() for k, v in pools.items()}, bt, kv_lens,
        cfg, None,
    )
    from xf_flash_attention_cutlass_tpu.parallel import make_mesh

    mesh = make_mesh(pp=4, devices=_cpu_devices(4))
    sp = shard_pp_params(params, mesh)
    spools = shard_pp_pools({k: v.copy() for k, v in pools.items()}, mesh)
    tok, logits, _ = pp_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh, trash_page=trash,
        n_micro=2,
    )
    assert max_err(logits, ref_logits) < 1e-4
    assert jnp.array_equal(tok, ref_tok)


def test_pp_tp_decode_step_matches_single():
    """3-D serving composition: stages over pp, Megatron shards over tp
    inside each stage (kv-head-sharded pools, psummed projections,
    vocab-gathered head)."""
    from xf_flash_attention_cutlass_tpu.parallel.pp_serve import (
        pp_decode_step, shard_pp_pools,
    )
    from xf_flash_attention_cutlass_tpu.parallel.pp import shard_pp_params
    from xf_flash_attention_cutlass_tpu.serve.engine import decode_step

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=4, n_heads=4, n_kv_heads=2,
        ffn_dim=96, max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, num_pages, page = cfg.n_layers, 9, 16
    trash = num_pages - 1
    kpool = jax.random.normal(
        jax.random.PRNGKey(1),
        (L, num_pages, cfg.n_kv_heads, page, cfg.head_dim), jnp.float32,
    )
    vpool = jax.random.normal(jax.random.PRNGKey(2), kpool.shape, jnp.float32)
    pools = dict(k=kpool, v=vpool)
    bt = jnp.asarray([[0, 1], [2, 3], [4, 5], [6, 7]], jnp.int32)
    kv_lens = jnp.asarray([17, 30, 5, 22], jnp.int32)
    tokens = jnp.asarray([[5], [9], [3], [60]], jnp.int32)

    ref_tok, ref_logits, ref_pools = decode_step(
        params, tokens, {k: v.copy() for k, v in pools.items()}, bt, kv_lens,
        cfg, None,
    )
    from xf_flash_attention_cutlass_tpu.parallel import make_mesh

    mesh = make_mesh(pp=2, tp=2, devices=_cpu_devices(4))
    sp = shard_pp_params(params, mesh)
    spools = shard_pp_pools({k: v.copy() for k, v in pools.items()}, mesh)
    tok, logits, out_pools = pp_decode_step(
        sp, tokens, spools, bt, kv_lens, cfg, mesh, trash_page=trash,
    )
    assert max_err(logits, ref_logits) < 1e-4
    assert jnp.array_equal(tok, ref_tok)
    live = jnp.asarray([p for p in range(num_pages) if p != trash])
    for name in pools:
        assert max_err(
            jnp.asarray(out_pools[name])[:, live],
            jnp.asarray(ref_pools[name])[:, live],
        ) < 1e-5, name


# ---- zigzag (striped) causal ring: balanced ownership (round 4) ----


def test_zigzag_permute_roundtrip():
    from xf_flash_attention_cutlass_tpu.parallel.ring import (
        zigzag_permute, zigzag_unpermute,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64, 8), jnp.float32)
    for n in (2, 4, 8):
        y = zigzag_permute(x, n, axis=2)
        assert max_err(zigzag_unpermute(y, n, axis=2), x) == 0.0
    # device 0's shard is [half 0, half 2n-1]
    n = 4
    sh = 64 // (2 * n)
    y = zigzag_permute(x, n, axis=2)
    assert max_err(y[:, :, :sh], x[:, :, :sh]) == 0.0
    assert max_err(y[:, :, sh : 2 * sh], x[:, :, (2 * n - 1) * sh :]) == 0.0


@pytest.mark.parametrize("n", [4, 8])
def test_zigzag_ring_matches_dense(n):
    from xf_flash_attention_cutlass_tpu.parallel.ring import (
        ring_attention_zigzag, zigzag_permute, zigzag_unpermute,
    )

    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, d = 1, 2, 64
    s = 32 * n  # 16 tokens per half-chunk
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)
    o_ref, lse_ref = flash_fwd(q, k, v, causal=True)

    ring = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention_zigzag(q, k, v, "cp"),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=(P(None, None, "cp", None), P(None, None, "cp")),
            check_vma=False,
        )
    )
    o, lse = ring(
        zigzag_permute(q, n, 2), zigzag_permute(k, n, 2),
        zigzag_permute(v, n, 2),
    )
    assert max_err(zigzag_unpermute(o, n, 2), o_ref) < 1e-4
    assert max_err(zigzag_unpermute(lse, n, 2), lse_ref) < 1e-4


def test_zigzag_ring_gqa():
    from xf_flash_attention_cutlass_tpu.parallel.ring import (
        ring_attention_zigzag, zigzag_permute, zigzag_unpermute,
    )

    n = 4
    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, h_k, d = 1, 4, 2, 64
    s = 32 * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h_k, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h_k, s, d), jnp.float32)
    o_ref, _ = flash_fwd(q, k, v, causal=True)
    ring = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention_zigzag(q, k, v, "cp")[0],
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=P(None, None, "cp", None),
            check_vma=False,
        )
    )
    o = ring(
        zigzag_permute(q, n, 2), zigzag_permute(k, n, 2),
        zigzag_permute(v, n, 2),
    )
    assert max_err(zigzag_unpermute(o, n, 2), o_ref) < 1e-4


@pytest.mark.parametrize("n", [4, 8])
def test_zigzag_ring_grad_matches_dense(n):
    from xf_flash_attention_cutlass_tpu.models.llama import scale_grad
    from xf_flash_attention_cutlass_tpu.parallel.ring import (
        ring_attention_zigzag, zigzag_permute, zigzag_unpermute,
    )

    mesh = make_mesh(cp=n, devices=_cpu_devices(n))
    b, h, d = 1, 2, 64
    s = 32 * n
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, d), jnp.float32)
    ref_loss, ref_grads = _cp_grad_ref(q, k, v, True)

    def local_loss(q, k, v):
        o, _ = ring_attention_zigzag(q, k, v, "cp")
        loss = jax.lax.psum(jnp.sum(jnp.sin(o.astype(jnp.float32))), "cp")
        return scale_grad(loss, 1.0 / jax.lax.axis_size("cp"))

    ring_vg = jax.jit(
        jax.shard_map(
            jax.value_and_grad(local_loss, argnums=(0, 1, 2)),
            mesh=mesh,
            in_specs=(P(None, None, "cp", None),) * 3,
            out_specs=(P(), (P(None, None, "cp", None),) * 3),
            check_vma=False,
        )
    )
    loss, grads = ring_vg(
        zigzag_permute(q, n, 2), zigzag_permute(k, n, 2),
        zigzag_permute(v, n, 2),
    )
    # sum over b*h*s sin() terms: tolerance is relative (merge order
    # differs from the dense kernel's)
    assert abs(float(loss) - float(ref_loss)) < 1e-6 * abs(float(ref_loss)) + 1e-4
    for g, g_ref in zip(grads, ref_grads):
        assert max_err(zigzag_unpermute(g, n, 2), g_ref) < 1e-4


def test_zigzag_ring_balanced_schedule():
    """The point of zigzag: per-device live work is IDENTICAL across
    devices and hops. Counting live quadrant half-planes (full = 1,
    diagonal = 0.5) of the static schedule: every device sees exactly 2
    per hop (t=0: two diagonals + one full; t>0: two fulls), total 2n —
    vs ring order where device i totals 2(i+1) (diag hop 1, i full hops
    of a double-width chunk... i.e. a ~2x spread across devices)."""
    n = 8
    totals = []
    for i in range(n):
        a_half, b_half = i, 2 * n - 1 - i
        per_hop = []
        for t in range(n):
            src = (i - t) % n
            live = 0.0
            for qh in (a_half, b_half):
                for kh in (src, 2 * n - 1 - src):
                    if qh > kh:
                        live += 1.0
                    elif qh == kh:
                        live += 0.5
            per_hop.append(live)
        assert all(x == 2.0 for x in per_hop), (i, per_hop)
        totals.append(sum(per_hop))
    assert all(t == 2.0 * n for t in totals), totals


@pytest.mark.parametrize("temp", [0.0, 0.8])
def test_tp_engine_multi_step_token_identical(temp):
    """Multi-step scheduling on a MESH engine (round 5: the lax.scan runs
    INSIDE the shard_map, tp_serve.tp_decode_multi_step): tp2 engine with
    multi_step=4 must emit exactly the per-step tp2 engine's streams
    (greedy and sampled key schedules)."""
    from xf_flash_attention_cutlass_tpu.serve import DecodeEngine, EngineConfig

    cfg, params = _tiny()
    mesh = make_mesh(tp=2, devices=_cpu_devices(2))
    prompts = {0: [3, 17, 42, 9], 1: [5, 9, 2, 33, 8, 1, 60]}
    max_new = {0: 9, 1: 6}  # 6 finishes mid-window at K=4

    outs = {}
    for K in (1, 4):
        ecfg = EngineConfig(
            max_batch=2, page_size=16, num_pages=64, max_seq=256,
            prefill_chunk=32, multi_step=K,
            top_k=8 if temp else 0, sample_seed=5,
        )
        eng = DecodeEngine(params, cfg, ecfg, dtype=jnp.float32, mesh=mesh)
        for rid, p in prompts.items():
            eng.add_request(rid, p, max_new[rid], temperature=temp)
        outs[K] = eng.run()
    for rid in prompts:
        assert list(outs[1][rid]) == list(outs[4][rid]), (rid, temp)
        assert len(outs[4][rid]) == max_new[rid]
