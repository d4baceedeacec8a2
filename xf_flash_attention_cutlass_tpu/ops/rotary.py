"""Rotary position embedding (RoPE) — interleaved (GPT-J) and
contiguous-half (NeoX) layouts.

The reference fuses rotary into the gmem->smem copy of Q and appended K
(`copy_rotary_interleaved` / `copy_rotary_contiguous`,
/root/reference/csrc/flash_attn/src/rotary.h:22-148). On TPU a fused copy
has no analog — XLA fuses these elementwise ops into neighbouring kernels on
its own, so this is plain jnp applied before the attention kernel / cache
append (SURVEY.md §7 item 4).

Convention matches the reference tests (/root/reference/test.py:1430-1451):
``cos``/``sin`` have shape (max_pos, rotary_dim // 2); position ``p`` of a
token selects row ``p``; only the leading ``rotary_dim`` features rotate, the
tail passes through.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_rotary(
    x: jax.Array,  # (b, s, h, d)
    cos: jax.Array,  # (max_pos, r/2)
    sin: jax.Array,  # (max_pos, r/2)
    positions: jax.Array,  # (b, s) int32 absolute positions
    interleaved: bool = True,
) -> jax.Array:
    """Rotate the first 2*(r/2) features of x by position-dependent angles."""
    orig_dtype = x.dtype
    b, s, h, d = x.shape
    half = cos.shape[-1]
    r = 2 * half
    if r > d:
        raise ValueError(f"rotary_dim {r} exceeds head_dim {d}")
    positions = jnp.clip(positions.astype(jnp.int32), 0, cos.shape[0] - 1)
    c = cos[positions].astype(jnp.float32)[:, :, None, :]  # (b, s, 1, r/2)
    sn = sin[positions].astype(jnp.float32)[:, :, None, :]

    xr = x[..., :r].astype(jnp.float32)
    tail = x[..., r:]
    if interleaved:
        x1 = xr[..., 0::2]  # (b, s, h, r/2)
        x2 = xr[..., 1::2]
        o1 = x1 * c - x2 * sn
        o2 = x1 * sn + x2 * c
        rot = jnp.stack([o1, o2], axis=-1).reshape(b, s, h, r)
    else:
        x1 = xr[..., :half]
        x2 = xr[..., half:]
        o1 = x1 * c - x2 * sn
        o2 = x1 * sn + x2 * c
        rot = jnp.concatenate([o1, o2], axis=-1)
    return jnp.concatenate([rot.astype(orig_dtype), tail], axis=-1)


def rotary_frequencies(
    rotary_dim: int,
    max_pos: int,
    base: float = 10000.0,
    dtype=jnp.float32,
):
    """Standard (cos, sin) tables of shape (max_pos, rotary_dim//2)."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
    )
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def apply_rotary_single(
    x: jax.Array,  # (s, d) or (b, s, d): no head axis
    cos: jax.Array,
    sin: jax.Array,
    positions: Optional[jax.Array] = None,
    interleaved: bool = True,
) -> jax.Array:
    """Convenience wrapper for head-free layouts."""
    squeeze_b = x.ndim == 2
    if squeeze_b:
        x = x[None]
    b, s, d = x.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    out = apply_rotary(x[:, :, None, :], cos, sin, positions, interleaved)[:, :, 0]
    return out[0] if squeeze_b else out
