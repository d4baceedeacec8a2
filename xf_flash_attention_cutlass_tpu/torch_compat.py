"""PyTorch-tensor front end for the attention API.

The reference is consumed as a torch extension (``import paged_attn``;
/root/reference/export.cpp:1757-1764, test.py:15-19). Users migrating from it
hold ``torch.Tensor``s; this module mirrors the three public wrappers with
torch in/torch out, moving data zero-copy via DLPack where possible.

This is a *convenience boundary*, not the performance path: production
callers should keep data in JAX arrays on-device (see ``api.py``). Tensors
are exchanged through the host, so each call pays a host<->device transfer
when running on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xf_flash_attention_cutlass_tpu import api as _api


def _to_jax(x):
    if x is None:
        return None
    import torch

    if isinstance(x, torch.Tensor):
        t = x.detach().contiguous()
        if t.dtype == torch.float16:
            # Mosaic has no f16; carry as f16 in JAX (wrappers upcast)
            arr = jnp.asarray(t.cpu().numpy())
        else:
            try:
                arr = jnp.from_dlpack(t)
            except Exception:
                arr = jnp.asarray(t.cpu().numpy())
        # DLPack exchange from torch-cpu lands on JAX's CPU backend, where
        # the compiled kernels cannot run — move to the session's default
        # device (honoring an active jax.default_device context, e.g. the
        # CPU-pinned test env)
        default = jax.config.jax_default_device or jax.devices()[0]
        if arr.devices() != {default}:
            arr = jax.device_put(arr, default)
        return arr
    return x


def _to_torch(x):
    import torch

    if isinstance(x, jax.Array):
        try:
            return torch.from_dlpack(x)
        except Exception:
            import numpy as np

            return torch.from_numpy(np.asarray(jax.device_get(x)))
    return x


def _wrap(fn):
    def wrapped(*args, **kwargs):
        args = [_to_jax(a) for a in args]
        kwargs = {k: _to_jax(v) for k, v in kwargs.items()}
        out = fn(*args, **kwargs)
        if isinstance(out, tuple):
            return tuple(_to_torch(o) for o in out)
        return _to_torch(out)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = f"torch-tensor front end for api.{fn.__name__}:\n\n{fn.__doc__}"
    return wrapped


flash_attn_func = _wrap(_api.flash_attn_func)
flash_attn_kvpacked_func = _wrap(_api.flash_attn_kvpacked_func)
flash_attn_varlen_func = _wrap(_api.flash_attn_varlen_func)
flash_attn_varlen_kvpacked_func = _wrap(_api.flash_attn_varlen_kvpacked_func)
flash_attn_with_kvcache = _wrap(_api.flash_attn_with_kvcache)
