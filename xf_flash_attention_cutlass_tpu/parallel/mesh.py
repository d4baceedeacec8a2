"""Device mesh construction (ICI x DCN).

The reference has no distributed layer at all (SURVEY.md §2.5) — this is the
BASELINE.json scale-out story: tensor parallelism (heads + KV pool) over the
fast ICI axis, data/batch parallelism over hosts (DCN). Axis names are
("dp", "tp") [+ "cp" for ring context parallelism].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    tp: int = 1,
    cp: int = 1,
    pp: int = 1,
    ep: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with axes (dp, pp, cp, ep, tp); tp is the fastest-varying axis
    so tensor-parallel collectives ride neighbouring ICI links, pp is
    outermost-but-dp so stage hops cross the slowest links (pipeline
    transfers are the rarest/most latency-tolerant collective)."""
    if devices is None:
        devices = jax.devices()
    n = dp * tp * cp * pp * ep
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, pp, cp, ep, tp)
    return Mesh(arr, ("dp", "pp", "cp", "ep", "tp"))
