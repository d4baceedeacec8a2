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
    ring order: device i holds tokens [i*s_local, (i+1)*s_local)."""
    cfg = (axis_name, bool(causal), softmax_scale, interpret)
    return _ring(q, k, v, cfg)
