"""Profiling + roofline accounting.

The reference has no tracing/profiling at all (SURVEY.md §5 — its debugging
story is commented-out printf calls). Here: jax.profiler wrappers plus
analytic roofline counters for every hot op, so benchmarks report achieved
fraction of speed-of-light rather than bare wall-clock.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth, GB/s
    bf16_tflops: float  # dense MXU bf16
    int8_tops: float
    # ICI: per-link per-direction bandwidth and link count (v5e: 4-link 2D
    # torus at ~45 GB/s/dir/link; v5p: 6-link 3D torus at ~90)
    ici_link_gbps: float = 45.0
    ici_links: int = 4
    # independent TensorCores per chip (v5e: 1; v4/v5p Megacore: 2) — the
    # SM-occupancy analog the reference's split heuristic fills
    tensor_cores: int = 1

    @property
    def hbm_bytes_per_s(self) -> float:
        return self.hbm_gbps * 1e9

    @property
    def ici_bytes_per_s(self) -> float:
        """Aggregate egress bandwidth (all links, one direction each)."""
        return self.ici_link_gbps * 1e9 * self.ici_links


V5E = ChipSpec(name="v5e", hbm_gbps=819.0, bf16_tflops=197.0, int8_tops=394.0,
               ici_link_gbps=45.0, ici_links=4, tensor_cores=1)
V5P = ChipSpec(name="v5p", hbm_gbps=2765.0, bf16_tflops=459.0, int8_tops=918.0,
               ici_link_gbps=90.0, ici_links=6, tensor_cores=2)


def ici_collective_seconds(
    bytes_per_device: float, n: int, chip: ChipSpec = V5E,
    kind: str = "all_reduce", axes: int = 1,
) -> float:
    """Ring-collective time over one ICI mesh axis (the scaling-book model:
    each device egresses (n-1)/n of the payload per RS or AG phase; a ring
    uses 2 of the chip's links per mesh axis — one each direction — so an
    `axes`-axis sharding can use 2*axes links).

    kind: "all_reduce" (= RS + AG), "reduce_scatter", "all_gather",
    "all_to_all" (payload crosses each link once, (n-1)/n of it).
    """
    phases = {"all_reduce": 2.0, "reduce_scatter": 1.0, "all_gather": 1.0,
              "all_to_all": 1.0}[kind]
    links = min(2 * axes, chip.ici_links)
    bw = chip.ici_link_gbps * 1e9 * links
    return phases * bytes_per_device * (n - 1) / n / bw


def tp_decode_comm_model(
    dim: int, batch: int, n_layers: int, tp: int,
    chip: ChipSpec = V5E, dtype_bytes: int = 2,
) -> dict:
    """Expected per-step ICI time of the TP decode stack: two allreduce-
    equivalents of the (batch, dim) residual per layer (psum pair, or the
    RS+AG split of engine.verify_core sp_batch — same volume, overlappable).

    The serving question this answers without multi-chip hardware: at what
    tp does ICI time approach the per-device HBM time (weights+KV / tp)?
    For the 8B geometry (dim 4096, b=64, bf16 residual, int8 weights ~8GB,
    32 layers) on v5e, payload/layer = 2 allreduce of 512KB over a 2-link
    ring (90 GB/s):
      tp=4: ICI ~0.56 ms/step vs local HBM ~2.4 ms/step -> 81% scaling
            efficiency with zero overlap, ~90% if RS+AG hide half.
      tp=8: ICI ~0.65 ms/step vs local HBM ~1.2 ms/step -> 65% naive,
            ~79% with half the comm hidden — the regime where the RS+AG
            split (verify_core sp_batch) pays; past tp=8 comm dominates
            and further scaling should come from dp over batch instead
            (tp_dp_decode_step moves zero cross-dp bytes)."""
    payload = batch * dim * dtype_bytes
    t_layer = ici_collective_seconds(payload, tp, chip, "all_reduce")
    return dict(
        per_layer_s=2 * t_layer,
        per_step_s=2 * t_layer * n_layers,
        payload_bytes=payload,
    )


def detect_chip() -> ChipSpec:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return V5E
    if "v5p" in kind or "v5 pod" in kind:
        return V5P
    return V5E


def attention_flops(b, sq, sk, h, d, causal=False) -> float:
    """QK^T + PV matmul FLOPs (2 GEMMs, 2*m*n*k each)."""
    f = 4.0 * b * h * sq * sk * d
    return f / 2 if causal and sq == sk else f


def attention_kv_bytes(b, sk, h_k, d, bytes_per_elem=2, scale_bytes=0) -> float:
    """K+V bytes a decode step must stream from HBM."""
    return b * sk * h_k * (2 * d * bytes_per_elem + 2 * scale_bytes)


@dataclasses.dataclass
class RooflineReport:
    seconds: float
    flops: float = 0.0
    bytes: float = 0.0
    chip: ChipSpec = V5E

    @property
    def tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def gbps(self) -> float:
        return self.bytes / self.seconds / 1e9

    @property
    def compute_fraction(self) -> float:
        return self.tflops / self.chip.bf16_tflops

    @property
    def bandwidth_fraction(self) -> float:
        return self.gbps / self.chip.hbm_gbps

    @property
    def roofline_fraction(self) -> float:
        """Fraction of the binding resource's speed-of-light."""
        t_ideal = max(
            self.flops / (self.chip.bf16_tflops * 1e12),
            self.bytes / self.chip.hbm_bytes_per_s,
        )
        return t_ideal / self.seconds

    def line(self, label: str) -> str:
        return (
            f"{label}: {self.seconds*1e6:.0f}us  {self.tflops:.1f} TF/s  "
            f"{self.gbps:.0f} GB/s  roofline {self.roofline_fraction:.2f}"
        )


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_scan(
    step: Callable,
    x0,
    *args,
    lengths=None,  # kept for call compatibility; ignored
    repeats: int = 3,
    target_seconds: float = 0.08,
    fetch: Optional[Callable] = None,
):
    """Per-step seconds with the iteration INSIDE one executable.

    `step(x, *args) -> x_next` is rolled into one long `lax.scan` and timed
    absolutely: a calibration scan estimates the step cost, then the final
    scan length is picked so the run lasts >= `target_seconds`, making the
    single dispatch's cost (a wildly variable 0.2-0.7ms through the axon
    tunnel) a <2% one-sided bias. Slope-between-two-lengths was tried and
    rejected: one slow dispatch on the short baseline produces impossible
    (>1 roofline) readings. Requires `step` to be shape-stable in x (the
    data dependency stops XLA from eliding iterations).
    """
    del lengths
    import numpy as np

    if fetch is None:
        fetch = lambda x: float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def make(n):
        @jax.jit
        def run(x, *a):
            def body(c, _):
                return step(c, *a), None

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        return run

    def timed(run, warm=False):
        if warm:
            fetch(run(x0, *args))  # compile + warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(run(x0, *args))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    # Each invocation carries a large, variable constant cost through the
    # axon tunnel (~45ms measured round 1 — far beyond the 0.2-0.7ms
    # dispatch of ordinary calls), so ABSOLUTE timing of one scan reads
    # several times slow. The slope between two scan lengths cancels it;
    # the span is calibrated to ~`target_seconds` of step time so the
    # constant's run-to-run variance (min-of-3 per length) stays small
    # relative to the span. The calibration itself is a small slope so the
    # constant does not inflate the step estimate.
    #
    # The slope estimate MUST be clamped hard: the constant's run-to-run
    # swing can exceed the calibration span, making (t2 - t1) ~ 0 or
    # negative — an unclamped est then explodes n2 into a multi-minute
    # scan whose single RPC blows the tunnel deadline and KILLS the TPU
    # worker ("TPU worker process crashed or restarted", reproduced on
    # four separate benches in round 2).
    cal1, cal2 = make(4), make(44)
    t1 = timed(cal1, warm=True)
    t2 = timed(cal2, warm=True)
    est = max((t2 - t1) / 40, 1e-6)
    n1 = 4
    n2 = n1 + min(max(8, int(target_seconds / est) + 1), 2000)
    run2 = cal2 if n2 == 44 else make(n2)
    if run2 is not cal2:
        fetch(run2(x0, *args))  # compile
    trials = []
    for _ in range(repeats):
        trials.append((timed(run2) - timed(cal1)) / (n2 - n1))
    return float(np.median(trials))


def paired_slope_scan(
    step: Callable,
    x0,
    *args,
    pairs: int = 9,
    target_seconds: float = 0.15,
    fetch: Optional[Callable] = None,
):
    """Headline estimator (round 4): median of back-to-back PAIRED slopes.

    Each estimate times the short scan and the long scan immediately
    back-to-back (ONE invocation each, no min-of-K) and takes the slope
    (t_long - t_short) / (n_long - n_short); the reported number is the
    MEDIAN over `pairs` such estimates.

    Why not min-of-K independent estimates (rounds 1-3): slope noise is
    NOT one-sided — a slow tunnel window during the short scan plus a
    fast window during the long scan reads FAST, and min selects exactly
    those tails, so the headline can only be flattered and a future ~5%
    regression hides inside the min. Pairing the two lengths back-to-back
    minimizes the tunnel-state drift between them, and the median is
    robust to both tails while moving immediately on a real regression.

    Returns dict(median, min, max, estimates) — report median; min/max
    and the raw estimates document the spread.
    """
    import numpy as np

    if fetch is None:
        fetch = lambda x: float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def make(n):
        @jax.jit
        def run(x, *a):
            def body(c, _):
                return step(c, *a), None

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        return run

    def once(run):
        t0 = time.perf_counter()
        fetch(run(x0, *args))
        return time.perf_counter() - t0

    # calibration: same clamped-slope scheme as timed_scan (an unclamped
    # estimate can explode the scan length into a tunnel-killing RPC)
    cal1, cal2 = make(4), make(44)
    fetch(cal1(x0, *args))  # compile + warm
    fetch(cal2(x0, *args))
    t1 = min(once(cal1) for _ in range(3))
    t2 = min(once(cal2) for _ in range(3))
    est = max((t2 - t1) / 40, 1e-6)
    n1 = 4
    n2 = n1 + min(max(8, int(target_seconds / est) + 1), 2000)
    run2 = cal2 if n2 == 44 else make(n2)
    if run2 is not cal2:
        fetch(run2(x0, *args))  # compile
    once(cal1)  # one throwaway pair to settle caches
    once(run2)
    ests = []
    for _ in range(pairs):
        ts = once(cal1)
        tl = once(run2)
        ests.append((tl - ts) / (n2 - n1))
    return dict(
        median=float(np.median(ests)),
        min=float(np.min(ests)),
        max=float(np.max(ests)),
        estimates=[float(e) for e in ests],
    )


def timed_chain(
    step: Callable,
    x0,
    *args,
    spans=(10, 210),
    repeats: int = 3,
    fetch: Optional[Callable] = None,
):
    """Slope-timed per-step seconds for a chainable step function.

    `step(x, *args) -> x_next` is iterated with a data dependency; the
    per-step time is the slope between two chain lengths, which cancels the
    host<->device round-trip latency (the axon transport only synchronizes
    on host fetches — block_until_ready is NOT a device sync there).
    """
    import numpy as np

    if fetch is None:
        fetch = lambda x: float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def chain(k):
        x = x0
        t0 = time.perf_counter()
        for _ in range(k):
            x = step(x, *args)
        fetch(x)
        return time.perf_counter() - t0

    chain(3)  # warmup
    k1, k2 = spans
    trials = []
    for _ in range(repeats):
        t1 = min(chain(k1) for _ in range(2))
        t2 = min(chain(k2) for _ in range(2))
        trials.append((t2 - t1) / (k2 - k1))
    return float(np.median(trials))
