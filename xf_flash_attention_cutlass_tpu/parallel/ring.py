"""Ring attention — context parallelism over the ICI ring, differentiable.

Long-context scaling the reference only does intra-chip (split-KV,
SURVEY.md §5): here the KV axis is sharded across devices, KV chunks rotate
around the ring via `ppermute`, and partial (O, LSE) pairs merge with the
same logsumexp algebra as the split-KV combine (ops/combine.py `merge_two`)
— same math, different transport, exactly the correspondence SURVEY.md §2.5
predicted.

Backward: the merged output depends on every chunk's LSE, so autodiff
through the forward merge would need LSE cotangents the flash custom-VJP
does not carry. Instead the whole ring gets its own VJP (the reference
math anchor is flash_bwd_kernel.h:86-721 applied per chunk): each hop
recomputes the chunk's score block against the GLOBAL (O, LSE, dO)
residuals via ops.flash_bwd — p = exp(s - lse_global) is exactly this
chunk's share of the global softmax — accumulating dQ locally while dK/dV
accumulators ride the ring WITH their KV chunks and arrive home after the
final rotation.

Usage: inside shard_map with q/k/v sharded along the sequence axis of a
"cp" mesh axis; each device holds (b, h, s_local, d) chunks in ring order.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu.ops.combine import merge_two
from xf_flash_attention_cutlass_tpu.ops.flash_fwd import flash_fwd


def _positions(idx, src, b, s_q, s_k):
    qpos = (idx * s_q + jnp.arange(s_q, dtype=jnp.int32))[None].repeat(b, 0)
    kpos = (src * s_k + jnp.arange(s_k, dtype=jnp.int32))[None].repeat(b, 0)
    return qpos, kpos


def _ring_fwd_impl(q, k, v, cfg):
    axis_name, causal, softmax_scale, interpret = cfg
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(t, carry):
        o, lse, kc, vc = carry
        src = (idx - t) % n  # origin device of the current kv chunk

        def attend(_):
            qpos, kpos = _positions(idx, src, b, s_q, s_k)
            o_t, lse_t = flash_fwd(
                q,
                kc,
                vc,
                causal=causal,
                softmax_scale=softmax_scale,
                q_positions=qpos,
                kv_positions=kpos,
                interpret=interpret,
            )
            return o_t.astype(jnp.float32), lse_t

        def skip(_):
            return (
                jnp.zeros((b, h, s_q, d), jnp.float32),
                jnp.full((b, h, s_q), -jnp.inf, jnp.float32),
            )

        # Transfer/compute overlap: the rotation is issued BEFORE the
        # attention kernel and consumes only the carry-in (kc, vc), while
        # attend() also reads only (kc, vc) — the ppermute and the kernel
        # have no data dependency in either direction, so XLA's scheduler
        # is free to run hop t+1's transfer under hop t's compute (the
        # inter-device analog of the dense kernel's K-prefetch pipeline,
        # flash_fwd_kernel.h:1016-1120). Only the final hop's dead
        # rotation is skipped.
        kc_next, vc_next = jax.lax.cond(
            t < n - 1,
            lambda kv: tuple(
                jax.lax.ppermute(x, axis_name, perm) for x in kv
            ),
            lambda kv: kv,
            (kc, vc),
        )
        if causal:
            # chunks entirely in this device's future are fully masked:
            # skip the kernel, merge the identity partial (the intra-chip
            # analog: n_block_max trimming, flash_fwd_kernel.h:81-88)
            o_t, lse_t = jax.lax.cond(src > idx, skip, attend, None)
        else:
            o_t, lse_t = attend(None)
        o, lse = merge_two(o, lse, o_t, lse_t)
        return o, lse, kc_next, vc_next

    o0 = jnp.zeros((b, h, s_q, d), jnp.float32)
    lse0 = jnp.full((b, h, s_q), -jnp.inf, jnp.float32)
    o, lse, _, _ = jax.lax.fori_loop(0, n, step, (o0, lse0, k, v))
    return o.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ring(q, k, v, cfg):
    return _ring_fwd_impl(q, k, v, cfg)


def _ring_fwd_rule(q, k, v, cfg):
    o, lse = _ring_fwd_impl(q, k, v, cfg)
    return (o, lse), (q, k, v, o, lse)


def _ring_bwd_rule(cfg, res, cts):
    from xf_flash_attention_cutlass_tpu.ops.flash_bwd import flash_bwd

    axis_name, causal, softmax_scale, interpret = cfg
    q, k, v, o, lse = res
    do, _ = cts  # LSE cotangent not supported (matches ops/flash.py)
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    do = do.astype(q.dtype)

    # Transfer/compute overlap (round 3): the naive schedule rotates
    # (kc, vc, dkc + dk_t, dvc + dv_t) AFTER the hop's backward kernel, so
    # every transfer waits on the compute. Here the dK/dV accumulator
    # stream travels exactly ONE hop behind its KV chunk: the contribution
    # computed at hop t is held as `pend` and merged into the accumulator
    # at hop t+1's send — so the in-loop ppermute consumes only carry-in
    # values (kc, vc, ak + pend) and has NO data dependency on hop t's
    # kernel in either direction; XLA can run the transfer under the
    # compute. Alignment invariant: the acc arriving at hop t belongs to
    # the chunk computed at hop t-1 (the chunk the resident pend is for),
    # because both streams rotate once per hop with the acc initialized
    # one position behind. After n hops the acc on device i holds every
    # contribution for chunk (i+1) % n except device i's own final-hop
    # pend; one exposed delivery rotation of (ak + pend) lands the summed
    # dK/dV on the chunk's owner. Traffic: identical per-hop bytes
    # (4 tensors), plus one 2-tensor delivery hop and one near-zero hop
    # (the t=0 acc rotation carries zeros).
    def step(t, carry):
        dq, kc, vc, ak, av, pk, pv = carry
        src = (idx - t) % n

        # 1) send: current chunk onward + lagging acc merged with LAST
        #    hop's contribution — available at hop start, overlaps (2)
        kc2, vc2, ak2, av2 = tuple(
            jax.lax.ppermute(x, axis_name, perm)
            for x in (kc, vc, ak + pk, av + pv)
        )

        # 2) compute this hop's contribution for the RESIDENT chunk
        def contribute(_):
            qpos, kpos = _positions(idx, src, b, s_q, s_k)
            # global (o, lse, do) residuals: p = exp(s - lse_global) is this
            # chunk's exact share of the global softmax, and delta =
            # rowsum(do*o) inside flash_bwd is already the global rowsum
            dq_t, dk_t, dv_t = flash_bwd(
                q, kc, vc, o, lse, do,
                causal=causal,
                softmax_scale=softmax_scale,
                q_positions=qpos,
                kv_positions=kpos,
                interpret=interpret,
            )
            return (
                dq_t.astype(jnp.float32),
                dk_t.astype(jnp.float32),
                dv_t.astype(jnp.float32),
            )

        def skip(_):
            return (
                jnp.zeros((b, h, s_q, d), jnp.float32),
                jnp.zeros_like(pk),
                jnp.zeros_like(pv),
            )

        if causal:
            dq_t, dk_t, dv_t = jax.lax.cond(src > idx, skip, contribute, None)
        else:
            dq_t, dk_t, dv_t = contribute(None)
        dq = dq + dq_t
        return dq, kc2, vc2, ak2, av2, dk_t, dv_t

    h_k = k.shape[1]
    dq0 = jnp.zeros((b, h, s_q, d), jnp.float32)
    dkv0 = jnp.zeros((b, h_k, s_k, d), jnp.float32)
    dq, _, _, ak, av, pk, pv = jax.lax.fori_loop(
        0, n, step, (dq0, k, v, dkv0, dkv0, dkv0, dkv0)
    )
    # exposed delivery hop: each device holds the full sum for chunk
    # (idx + 1) % n; one rotation lands it home
    dk, dv = (
        jax.lax.ppermute(x, axis_name, perm) for x in (ak + pk, av + pv)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring.defvjp(_ring_fwd_rule, _ring_bwd_rule)


def ring_attention(
    q: jax.Array,  # (b, h, s_q_local, d) — this device's query chunk
    k: jax.Array,  # (b, h_k, s_k_local, d) — this device's KV chunk
    v: jax.Array,
    axis_name: str = "cp",
    *,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact, differentiable attention over the globally-concatenated
    sequence. Returns the local (O, LSE) chunk. Chunk ownership must follow
    ring order: device i holds tokens [i*s_local, (i+1)*s_local).

    NB for CAUSAL workloads this ownership is ~2x load-imbalanced (device
    i computes i+1 of n chunk-attentions; wall-clock is set by the last
    device). Use `ring_attention_zigzag` for balanced causal CP."""
    cfg = (axis_name, bool(causal), softmax_scale, interpret)
    return _ring(q, k, v, cfg)


# ---------------------------------------------------------------------------
# Zigzag (striped) causal ring — balanced ownership (round-4 verdict #4).
#
# Ring-ordered chunks make causal CP ~2x imbalanced: at hop t only devices
# idx >= t attend, so every hop's wall-clock is one full chunk-attention
# while the AVERAGE device does (n+1)/2n of that. Striped ownership fixes
# it: split the global sequence into 2n half-chunks and give device i the
# PAIR (i, 2n-1-i). Every (device, hop) pair then decomposes into
# quadrants whose causal structure is STATIC (half indices A=i, B=2n-1-i
# vs C=src, D=2n-1-src; A<n<=B):
#     A x C: diagonal at t=0, full when src<idx, dead when src>idx
#     A x D: always dead (A < n <= D)
#     B x C: always full
#     B x D: diagonal at t=0, full when src>idx, dead when src<idx
# so every hop is exactly TWO live half-planes on every device: one
# batched diagonal call + one full call at t=0, ONE full (non-causal)
# call per later hop. No positions arrays (which would force the dense
# nq*nk grid), no skipped hops, per-device work n+1 half-planes — the
# causal optimum up to the two diagonal tiles' internal halves.
# ---------------------------------------------------------------------------


def _zigzag_order(n):
    order = []
    for i in range(n):
        order += [i, 2 * n - 1 - i]
    return order


def zigzag_permute(x: jax.Array, n: int, axis: int = 0) -> jax.Array:
    """Reorder a GLOBAL sequence axis into zigzag ownership: with 2n
    half-chunks [c_0 .. c_{2n-1}], the shard_map contiguous shard of
    device i becomes [c_i, c_{2n-1-i}]. Apply before sharding over cp;
    `zigzag_unpermute` inverts (both are static gathers)."""
    import numpy as np

    s = x.shape[axis]
    if s % (2 * n):
        raise ValueError(f"sequence {s} must be a multiple of 2*cp={2 * n}")
    sh = s // (2 * n)
    idx = np.concatenate(
        [np.arange(c * sh, (c + 1) * sh) for c in _zigzag_order(n)]
    )
    return jnp.take(x, jnp.asarray(idx, jnp.int32), axis=axis)


def zigzag_unpermute(x: jax.Array, n: int, axis: int = 0) -> jax.Array:
    """Inverse of `zigzag_permute`."""
    import numpy as np

    s = x.shape[axis]
    sh = s // (2 * n)
    order = _zigzag_order(n)
    pos = {c: p for p, c in enumerate(order)}
    idx = np.concatenate(
        [np.arange(pos[c] * sh, (pos[c] + 1) * sh) for c in range(2 * n)]
    )
    return jnp.take(x, jnp.asarray(idx, jnp.int32), axis=axis)


def _ring_zz_fwd_impl(q, k, v, cfg):
    axis_name, softmax_scale, interpret = cfg
    b, h, sq2, d = q.shape
    sh = sq2 // 2
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    qA, qB = q[:, :, :sh], q[:, :, sh:]

    def diag_hop(kc, vc):
        # resident chunk (src == idx): A-C and B-D diagonals batch-stacked
        # into ONE causal call (sparse live-pair grid), plus B x C full
        kC, kD = kc[:, :, :sh], kc[:, :, sh:]
        vC, vD = vc[:, :, :sh], vc[:, :, sh:]
        qd = jnp.concatenate([qA, qB], axis=0)
        kd = jnp.concatenate([kC, kD], axis=0)
        vd = jnp.concatenate([vC, vD], axis=0)
        o_d, lse_d = flash_fwd(
            qd, kd, vd, causal=True, softmax_scale=softmax_scale,
            interpret=interpret,
        )
        o_bc, lse_bc = flash_fwd(
            qB, kC, vC, causal=False, softmax_scale=softmax_scale,
            interpret=interpret,
        )
        oB, lseB = merge_two(
            o_d[b:].astype(jnp.float32), lse_d[b:],
            o_bc.astype(jnp.float32), lse_bc,
        )
        o_t = jnp.concatenate([o_d[:b].astype(jnp.float32), oB], axis=2)
        lse_t = jnp.concatenate([lse_d[:b], lseB], axis=2)
        return o_t, lse_t

    def lo_hop(kc, vc):
        # src < idx: both halves attend C fully (D is dead for both)
        o_t, lse_t = flash_fwd(
            q, kc[:, :, :sh], vc[:, :, :sh], causal=False,
            softmax_scale=softmax_scale, interpret=interpret,
        )
        return o_t.astype(jnp.float32), lse_t

    def hi_hop(kc, vc):
        # src > idx: only B attends, to BOTH C and D
        o_b, lse_b = flash_fwd(
            qB, kc, vc, causal=False, softmax_scale=softmax_scale,
            interpret=interpret,
        )
        o_t = jnp.concatenate(
            [jnp.zeros((b, h, sh, d), jnp.float32), o_b.astype(jnp.float32)],
            axis=2,
        )
        lse_t = jnp.concatenate(
            [jnp.full((b, h, sh), -jnp.inf, jnp.float32), lse_b], axis=2
        )
        return o_t, lse_t

    def step(t, carry):
        o, lse, kc, vc = carry
        src = (idx - t) % n
        # same transfer/compute independence as the plain ring: the
        # rotation consumes only carry-in and overlaps this hop's kernels
        kc2, vc2 = jax.lax.cond(
            t < n - 1,
            lambda kv: tuple(
                jax.lax.ppermute(x, axis_name, perm) for x in kv
            ),
            lambda kv: kv,
            (kc, vc),
        )
        o_t, lse_t = jax.lax.cond(
            t == 0,
            lambda a: diag_hop(*a),
            lambda a: jax.lax.cond(
                src < idx, lambda z: lo_hop(*z), lambda z: hi_hop(*z), a
            ),
            (kc, vc),
        )
        o, lse = merge_two(o, lse, o_t, lse_t)
        return o, lse, kc2, vc2

    o0 = jnp.zeros((b, h, sq2, d), jnp.float32)
    lse0 = jnp.full((b, h, sq2), -jnp.inf, jnp.float32)
    o, lse, _, _ = jax.lax.fori_loop(0, n, step, (o0, lse0, k, v))
    return o.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ring_zz(q, k, v, cfg):
    return _ring_zz_fwd_impl(q, k, v, cfg)


def _ring_zz_fwd_rule(q, k, v, cfg):
    o, lse = _ring_zz_fwd_impl(q, k, v, cfg)
    return (o, lse), (q, k, v, o, lse)


def _ring_zz_bwd_rule(cfg, res, cts):
    from xf_flash_attention_cutlass_tpu.ops.flash_bwd import flash_bwd

    axis_name, softmax_scale, interpret = cfg
    q, k, v, o, lse = res
    do, _ = cts  # LSE cotangent not supported (matches ops/flash.py)
    do = do.astype(q.dtype)
    b, h, sq2, d = q.shape
    sh = sq2 // 2
    h_k = k.shape[1]
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    qA, qB = q[:, :, :sh], q[:, :, sh:]
    oA, oB = o[:, :, :sh], o[:, :, sh:]
    doA, doB = do[:, :, :sh], do[:, :, sh:]
    lseA, lseB = lse[:, :, :sh], lse[:, :, sh:]
    zero_q = jnp.zeros((b, h, sh, d), jnp.float32)
    zero_kv = jnp.zeros((b, h_k, sh, d), jnp.float32)

    def diag_contrib(kc, vc):
        kC, kD = kc[:, :, :sh], kc[:, :, sh:]
        vC, vD = vc[:, :, :sh], vc[:, :, sh:]
        qd = jnp.concatenate([qA, qB], axis=0)
        kd = jnp.concatenate([kC, kD], axis=0)
        vd = jnp.concatenate([vC, vD], axis=0)
        od = jnp.concatenate([oA, oB], axis=0)
        lsed = jnp.concatenate([lseA, lseB], axis=0)
        dod = jnp.concatenate([doA, doB], axis=0)
        dq_d, dk_d, dv_d = flash_bwd(
            qd, kd, vd, od, lsed, dod, causal=True,
            softmax_scale=softmax_scale, interpret=interpret,
        )
        dq_bc, dk_bc, dv_bc = flash_bwd(
            qB, kC, vC, oB, lseB, doB, causal=False,
            softmax_scale=softmax_scale, interpret=interpret,
        )
        dq_t = jnp.concatenate(
            [dq_d[:b].astype(jnp.float32),
             dq_d[b:].astype(jnp.float32) + dq_bc.astype(jnp.float32)],
            axis=2,
        )
        dk_t = jnp.concatenate(
            [dk_d[:b].astype(jnp.float32) + dk_bc.astype(jnp.float32),
             dk_d[b:].astype(jnp.float32)],
            axis=2,
        )
        dv_t = jnp.concatenate(
            [dv_d[:b].astype(jnp.float32) + dv_bc.astype(jnp.float32),
             dv_d[b:].astype(jnp.float32)],
            axis=2,
        )
        return dq_t, dk_t, dv_t

    def lo_contrib(kc, vc):
        dq_t, dkC, dvC = flash_bwd(
            q, kc[:, :, :sh], vc[:, :, :sh], o, lse, do, causal=False,
            softmax_scale=softmax_scale, interpret=interpret,
        )
        dk_t = jnp.concatenate([dkC.astype(jnp.float32), zero_kv], axis=2)
        dv_t = jnp.concatenate([dvC.astype(jnp.float32), zero_kv], axis=2)
        return dq_t.astype(jnp.float32), dk_t, dv_t

    def hi_contrib(kc, vc):
        dq_b, dk_t, dv_t = flash_bwd(
            qB, kc, vc, oB, lseB, doB, causal=False,
            softmax_scale=softmax_scale, interpret=interpret,
        )
        dq_t = jnp.concatenate([zero_q, dq_b.astype(jnp.float32)], axis=2)
        return dq_t, dk_t.astype(jnp.float32), dv_t.astype(jnp.float32)

    # lag-one dK/dV accumulator stream, identical to _ring_bwd_rule: the
    # contribution computed at hop t rides with its chunk at hop t+1's
    # send, so in-loop transfers have no dependency on the hop's kernels
    def step(t, carry):
        dq, kc, vc, ak, av, pk, pv = carry
        src = (idx - t) % n
        kc2, vc2, ak2, av2 = tuple(
            jax.lax.ppermute(x, axis_name, perm)
            for x in (kc, vc, ak + pk, av + pv)
        )
        dq_t, dk_t, dv_t = jax.lax.cond(
            t == 0,
            lambda a: diag_contrib(*a),
            lambda a: jax.lax.cond(
                src < idx, lambda z: lo_contrib(*z),
                lambda z: hi_contrib(*z), a
            ),
            (kc, vc),
        )
        dq = dq + dq_t
        return dq, kc2, vc2, ak2, av2, dk_t, dv_t

    dq0 = jnp.zeros((b, h, sq2, d), jnp.float32)
    dkv0 = jnp.zeros((b, h_k, sq2, d), jnp.float32)
    dq, _, _, ak, av, pk, pv = jax.lax.fori_loop(
        0, n, step, (dq0, k, v, dkv0, dkv0, dkv0, dkv0)
    )
    dk, dv = (
        jax.lax.ppermute(x, axis_name, perm) for x in (ak + pk, av + pv)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_zz.defvjp(_ring_zz_fwd_rule, _ring_zz_bwd_rule)


def ring_attention_zigzag(
    q: jax.Array,  # (b, h, 2*s_half, d) — [half i, half 2n-1-i] concat
    k: jax.Array,  # (b, h_k, 2*s_half, d)
    v: jax.Array,
    axis_name: str = "cp",
    *,
    softmax_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Balanced CAUSAL ring attention with zigzag (striped) ownership:
    device i of n holds global half-chunks i and 2n-1-i, concatenated.
    Exact and differentiable; returns the local (O, LSE) in the same
    layout. Use `zigzag_permute`/`zigzag_unpermute` on the global
    sequence around the shard_map. Every device runs one batched
    diagonal + one full kernel at hop 0 and exactly one full kernel per
    later hop — per-hop work is identical across devices (vs the ~2x
    tail imbalance of ring order). Non-causal attention has no
    imbalance: use `ring_attention(causal=False)` there."""
    if q.shape[2] % 2:
        raise ValueError("zigzag chunks hold two halves: local seq must be even")
    cfg = (axis_name, softmax_scale, interpret)
    return _ring_zz(q, k, v, cfg)
