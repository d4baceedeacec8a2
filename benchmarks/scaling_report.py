"""Multi-chip serving scaling report — BASELINE.json's "report tokens/s at
1 chip / 1 host / N hosts" deliverable, for hardware this environment does
not have (one v5e chip behind a tunnel; no ICI neighbors).

Method: measured single-chip engine numbers (benchmarks/bench_suite.py,
recorded below) + the ICI ring-collective model (utils/profiling.py,
v5e: 2 links/axis x 45 GB/s/dir). Everything that shards divides by tp
(weights, KV pages, attention heads — the engine's layout, parallel/
tp_serve.py); the per-layer psum pair (or its RS+AG split) adds the
modeled ICI time. dp replicas exchange ZERO bytes (tp_dp_decode_step:
disjoint batch rows + pool shards), so dp rows scale linearly up to the
admission balance.

The multi-chip sharding itself is executable and tested: the same step
functions run token-identically on the 8-way virtual CPU mesh
(tests/test_parallel.py) and compile through the driver dryrun.
"""

import sys

sys.path.insert(0, "/root/repo")

from xf_flash_attention_cutlass_tpu.utils.profiling import (
    V5E,
    ici_collective_seconds,
)

# measured on the real chip (round 2, benchmarks/bench_suite.py):
# 8B geometry, 64 concurrent requests @ ~1.5k ctx, int8 KV + int8 weights
B = 64
N_LAYERS = 32
DIM = 4096
T_LAYER_1CHIP = 622e-6  # attention+append 299us + projections ~320us
T_FIXED = 50e-6  # per-step fixed costs (sampling, embed, final norm/head)
TOK_S_1CHIP = B / (N_LAYERS * T_LAYER_1CHIP + T_FIXED)


def step_time(tp: int, overlap: float) -> float:
    """Per-step seconds at tensor parallelism tp; `overlap` is the fraction
    of ICI time hidden under compute (0 = fully exposed psums, 0.5 = the
    RS+AG split hiding half, engine sp_batch)."""
    comm = 2 * ici_collective_seconds(B * DIM * 2, tp, V5E, "all_reduce")
    t_layer = T_LAYER_1CHIP / tp + (1.0 - overlap) * comm
    return N_LAYERS * t_layer + T_FIXED


def report():
    rows = []

    def add(label, chips, dp, tp, overlap):
        t = step_time(tp, overlap) if tp > 1 else (
            N_LAYERS * T_LAYER_1CHIP + T_FIXED
        )
        toks = dp * B / t
        eff = toks / (chips * TOK_S_1CHIP)
        rows.append((label, chips, f"dp={dp} tp={tp}", toks, eff))

    add("1 chip [measured]", 1, 1, 1, 0.0)
    add("1 host (4 chips, pure dp)", 4, 4, 1, 0.0)
    add("1 host (4 chips, tp=4, psum)", 4, 1, 4, 0.0)
    add("1 host (4 chips, tp=4, RS+AG)", 4, 1, 4, 0.5)
    add("2 hosts (8 chips, pure dp)", 8, 8, 1, 0.0)
    add("2 hosts (8 chips, dp=2 x tp=4)", 8, 2, 4, 0.5)
    add("2 hosts (8 chips, tp=8, RS+AG)", 8, 1, 8, 0.5)

    print(
        f"single-chip measured: {TOK_S_1CHIP:.0f} tok/s "
        f"(8B, {B} reqs, int8 KV + int8 weights)\n"
    )
    print(f"{'config':36} {'chips':>5} {'layout':12} {'tok/s':>8} {'eff':>6}")
    for label, chips, layout, toks, eff in rows:
        print(f"{label:36} {chips:>5} {layout:12} {toks:>8.0f} {eff:>5.0%}")
    print(
        "\nNotes: dp rows move zero cross-replica bytes (disjoint batch +"
        " pool shards), so decode throughput scaling is ~memory-linear —"
        " the >=85% 2-host target is met by dp or dp x tp layouts; tp"
        " beyond 4 trades throughput for per-request latency (step time"
        f" {step_time(4, 0.5)*1e3:.1f} ms at tp=4 vs"
        f" {N_LAYERS*T_LAYER_1CHIP*1e3 + T_FIXED*1e3:.1f} ms on 1 chip)."
    )
    # Provenance (round 3): the single-chip row is MEASURED (bench_suite,
    # real v5e). Every tp>1 row is MODELED: the ICI term comes from the
    # ring model, and the overlap fraction CANNOT be measured in this
    # environment (one chip; collectives are no-ops at tp=1, so an RS+AG
    # vs psum A/B compiles to identical programs). The RS+AG structure
    # itself IS on by default in the mesh engine (serve/engine.py
    # _run_decode/_run_verify sp_batch=True, falls back to psums when
    # b % tp != 0 or MoE) and is token-identity-tested on the CPU mesh.
    # PP (parallel/pp_serve.pp_decode_step) is the capacity axis, not a
    # throughput row: layer-sharded weights+pools serve models beyond
    # tp x HBM. Its ICI volume is tiny (pp-1 activation hops of b x dim
    # bytes per step vs TP's 2 allreduces PER LAYER), but per-phase stage
    # utilization is n_micro/(n_micro + pp - 1) and per-request latency
    # grows with the pipeline depth — use PP when the model doesn't fit
    # tp x HBM, dp x tp otherwise.
    # Sensitivity of the modeled rows to the overlap assumption:
    print("\noverlap sensitivity (tp=4, 4 chips):")
    for ov in (0.0, 0.5, 1.0):
        t = step_time(4, ov)
        print(
            f"  overlap={ov:.1f}: {B / t:>8.0f} tok/s"
            f"  (eff {B / t / (4 * TOK_S_1CHIP):.0%})"
        )
    report_ep()


# ---- expert-parallel MoE scaling (engine ep mode, parallel/ep_serve.py) --
# Measured single-chip anchor (benchmarks/bench_suite.py, real v5e):
# Mixtral-class layer (4 experts x 14336, top-2, dim 4096), 64 reqs,
# int8 experts + int8 KV: 1319us/layer. Decomposition (RESULTS_r3/CLAUDE):
# expert WEIGHT stream dominates at decode batch sizes — 3 mats x
# 4096*14336 x 4 experts x 1B(int8) = 689MB -> 841us at 819GB/s; the
# remainder (attention int8 stream + projections + token compute +
# dispatch) is ~478us and does NOT shrink with ep (each ep shard serves
# its own b=64 requests).
MOE_E, MOE_TOPK, MOE_FFN = 4, 2, 14336
T_MOE_LAYER = 1319e-6
T_MOE_EXPERT_W = 3 * DIM * MOE_FFN * MOE_E * 1 / 819e9  # int8 weight stream
T_MOE_REST = T_MOE_LAYER - T_MOE_EXPERT_W
MOE_TOK_S_1CHIP = B / (N_LAYERS * T_MOE_LAYER + T_FIXED)


def moe_step_time(ep: int) -> float:
    """Per-step seconds at expert parallelism ep (engine ep mode): the
    expert weight stream divides by ep (each chip holds E/ep experts);
    two GShard all_to_alls per layer move the dispatched (E, C, dim)
    bf16 blocks over ICI (C = b*top_k/E at capacity factor 1 — the a2a
    payload is ACTIVATIONS, tiny vs the weight stream it saves)."""
    cap = -(-B * MOE_TOPK // MOE_E)  # per-shard capacity rows
    a2a_bytes = MOE_E * cap * DIM * 2  # bf16 dispatch blocks per device
    comm = 2 * ici_collective_seconds(a2a_bytes, ep, V5E, "all_to_all")
    t_layer = T_MOE_REST + T_MOE_EXPERT_W / ep + comm
    return N_LAYERS * t_layer + T_FIXED


def report_ep():
    print(
        "\nexpert-parallel MoE serving (modeled from the measured "
        f"single-chip row: {MOE_TOK_S_1CHIP:.0f} tok/s, "
        "Mixtral-class int8 experts + int8 KV):"
    )
    for ep in (2, 4, 8):
        t = moe_step_time(ep)
        toks = ep * B / t  # each ep shard serves its own B requests
        vs_dp = toks / (ep * MOE_TOK_S_1CHIP)
        print(
            f"  ep={ep}: {toks:>8.0f} tok/s aggregate "
            f"({vs_dp:.2f}x pure-dp at equal chips; a2a "
            f"{2 * ici_collective_seconds(MOE_E * (-(-B * MOE_TOPK // MOE_E)) * DIM * 2, ep, V5E, 'all_to_all') * 1e6:.0f}us/layer)"
        )
    print(
        "  EP is SUPER-linear vs replication because the dominant cost —"
        " the per-chip expert weight stream — divides by ep while the a2a"
        " activation payload stays ~1MB/layer; this is why ep (not dp) is"
        " the deployment axis for MoE decode. All ep>1 rows are MODELED"
        " (one chip here); the engine ep mode itself is token-identity-"
        " tested on the CPU mesh (tests/test_moe_ep_serve.py)."
    )


if __name__ == "__main__":
    report()
