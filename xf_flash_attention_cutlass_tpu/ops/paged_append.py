"""In-place paged KV append — Pallas kernels with input/output aliasing.

The reference fuses cache append into its attention kernel
(`Append_KV`, /root/reference/csrc/flash_attn/src/flash_fwd_kernel.h:809-926)
because its caches are mutable device pointers. In JAX the functional
equivalent of that mutation is ``pl.pallas_call(input_output_aliases=...)``:
the pool buffer is donated to the kernel, the new rows are DMA'd into place,
and the "returned" pool is the same HBM allocation — no copy.

This matters enormously for serving: an XLA scatter into a multi-hundred-MB
pool carried through the layer scan copies the entire pool per layer
(measured: 3.3ms/layer on an 8B-geometry pool, ~6x the whole decode-step
budget). These kernels do the same update with KB-sized window DMAs.

Mosaic DMA slices must be tile-aligned (sublane multiples of 8/16/32 by
dtype, lane multiples of 128), so single rows cannot be written directly:

- decode path (sq == 1): per-token read-modify-write of the aligned window
  containing the row — all reads batched, one vectorized modify, all writes
  batched. Distinct batch slots touch distinct pages, so the RMWs are
  race-free (inactive slots share the trash page, whose content is dead).
- prefill path (b == 1): insert position must be window-aligned (the engine
  prefills at position 0); whole aligned windows are written straight from
  VMEM staging, and rows past the true length carry garbage that kv_lens
  masks and later appends overwrite before exposing.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xf_flash_attention_cutlass_tpu.utils import cdiv, default_interpret

logger = logging.getLogger(__name__)

# geometries whose scatter-fallback warning already fired (warn once each)
_warned_fallback: set = set()


def _sublane_tile(dtype) -> int:
    if dtype in (jnp.int8, jnp.float8_e4m3fn, jnp.float8_e5m2):
        return 32
    if dtype in (jnp.bfloat16, jnp.float16):
        return 16
    return 8


def _quantize_tokens(src_ref, q_scr, s_scr, qmax):
    """Per-token symmetric quantization on the VPU (quant/kv.py math)."""
    x = src_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    y = x / scale[..., None]
    if q_scr.dtype == jnp.int8:
        q_scr[...] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    else:
        q_scr[...] = jnp.clip(y, -qmax, qmax).astype(q_scr.dtype)
    s_scr[...] = scale


def _decode_append_kernel(
    b: int,
    w: int,  # value RMW window (sublane-aligned rows)
    ws: int,  # scale RMW window (lane-aligned columns)
    page: int,  # TRUE tokens per page (pools may store more, padded)
    quant: bool,
    has_layer: bool,
    qmax: float,
    *refs,
):
    it = iter(refs)
    bt_ref = next(it)
    pos_ref = next(it)  # (b,)
    lidx_ref = next(it) if has_layer else None
    knew_ref = next(it)  # (b, 1, h_k, d) VMEM
    vnew_ref = next(it)
    _ = next(it)  # k_pool input (aliased)
    _ = next(it)
    if quant:
        _ = next(it)
        _ = next(it)
    k_out = next(it)
    v_out = next(it)
    ks_out = next(it) if quant else None
    vs_out = next(it) if quant else None
    kq_scr = next(it) if quant else None  # (b, 1, h_k, d)
    vq_scr = next(it) if quant else None
    ksc_scr = next(it) if quant else None  # (b, 1, h_k)
    vsc_scr = next(it) if quant else None
    kwin = next(it)  # (b, h_k, w, d) value windows
    vwin = next(it)
    kswin = next(it) if quant else None  # (b, h_k, ws) scale windows
    vswin = next(it) if quant else None
    sems = next(it)  # (8,)

    if quant:
        _quantize_tokens(knew_ref, kq_scr, ksc_scr, qmax)
        _quantize_tokens(vnew_ref, vq_scr, vsc_scr, qmax)

    def win_copies(i, write: bool):
        pos = pos_ref[i]
        pe = bt_ref[i, pos // page]
        row = pos % page
        rb = pl.multiple_of((row // w) * w, w)
        lead = (lidx_ref[0], pe) if has_layer else (pe,)
        kslice = k_out.at[(*lead, slice(None), pl.ds(rb, w))]
        vslice = v_out.at[(*lead, slice(None), pl.ds(rb, w))]
        pairs = [
            (kslice, kwin.at[i], sems.at[0]),
            (vslice, vwin.at[i], sems.at[1]),
        ]
        if quant:
            lb = pl.multiple_of((row // ws) * ws, ws)
            pairs.append(
                (ks_out.at[(*lead, slice(None), pl.ds(lb, ws))], kswin.at[i], sems.at[2])
            )
            pairs.append(
                (vs_out.at[(*lead, slice(None), pl.ds(lb, ws))], vswin.at[i], sems.at[3])
            )
        if write:
            return [pltpu.make_async_copy(v, h, s) for (h, v, s) in pairs]
        return [pltpu.make_async_copy(h, v, s) for (h, v, s) in pairs]

    # 1) read every token's windows (DMA engine pipelines them)
    all_reads = []
    for i in range(b):
        all_reads.extend(win_copies(i, write=False))
    for c in all_reads:
        c.start()
    for c in all_reads:
        c.wait()

    # 2) modify each token's window (scalar row index select)
    h_k, d = kwin.shape[1], kwin.shape[3]
    for i in range(b):
        row = pos_ref[i] % page
        rsub = row % w  # scalar: row within the value window
        rsel = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1) == rsub
        ksrc = (kq_scr if quant else knew_ref)[i, 0]  # (h_k, d)
        vsrc = (vq_scr if quant else vnew_ref)[i, 0]
        kwin[i] = jnp.where(rsel, ksrc.reshape(h_k, 1, d), kwin[i])
        vwin[i] = jnp.where(rsel, vsrc.reshape(h_k, 1, d), vwin[i])
        if quant:
            lsub = row % ws
            lsel = jax.lax.broadcasted_iota(jnp.int32, (1, ws), 1) == lsub
            kswin[i] = jnp.where(lsel, ksc_scr[i, 0].reshape(h_k, 1), kswin[i])
            vswin[i] = jnp.where(lsel, vsc_scr[i, 0].reshape(h_k, 1), vswin[i])

    # 3) write every window back
    all_writes = []
    for i in range(b):
        all_writes.extend(win_copies(i, write=True))
    for c in all_writes:
        c.start()
    for c in all_writes:
        c.wait()


def _prefill_append_kernel(
    s: int,  # tokens per grid step (chunk)
    w: int,
    ws: int,
    page: int,
    quant: bool,
    has_layer: bool,
    qmax: float,
    *refs,
):
    """Grid (b, n_chunks): each step writes one request-row's chunk of
    whole aligned windows. b > 1 serves the engine's batched chunked
    prefill — rows are independent requests with their own block tables
    and (window-aligned) insert positions."""
    it = iter(refs)
    bt_ref = next(it)  # (b, max_pages)
    pos_ref = next(it)  # (b,) — each must be w- and ws-aligned
    lidx_ref = next(it) if has_layer else None
    knew_ref = next(it)  # (1, s, h_k, d) VMEM block, s % w == 0
    vnew_ref = next(it)
    _ = next(it)
    _ = next(it)
    if quant:
        _ = next(it)
        _ = next(it)
    k_out = next(it)
    v_out = next(it)
    ks_out = next(it) if quant else None
    vs_out = next(it) if quant else None
    kstage = next(it)  # (h_k, s, d) — token-major -> head-major staging
    vstage = next(it)
    ksstage = next(it) if quant else None  # (h_k, s_pad_ws) f32
    vsstage = next(it) if quant else None
    sems = next(it)

    h_k = kstage.shape[0]

    if quant:
        x = knew_ref[0].astype(jnp.float32)  # (s, h_k, d)
        amax = jnp.max(jnp.abs(x), axis=-1)
        kscale = jnp.where(amax > 0, amax / qmax, 1.0)  # (s, h_k)
        y = x / kscale[..., None]
        xv = vnew_ref[0].astype(jnp.float32)
        vamax = jnp.max(jnp.abs(xv), axis=-1)
        vscale = jnp.where(vamax > 0, vamax / qmax, 1.0)
        yv = xv / vscale[..., None]
        if kstage.dtype == jnp.int8:
            kstage[...] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8).swapaxes(0, 1)
            vstage[...] = jnp.clip(jnp.round(yv), -127.0, 127.0).astype(jnp.int8).swapaxes(0, 1)
        else:
            kstage[...] = jnp.clip(y, -qmax, qmax).astype(kstage.dtype).swapaxes(0, 1)
            vstage[...] = jnp.clip(yv, -qmax, qmax).astype(vstage.dtype).swapaxes(0, 1)
        spad = ksstage.shape[1] - s
        ksstage[...] = jnp.pad(kscale.swapaxes(0, 1), ((0, 0), (0, spad)))
        vsstage[...] = jnp.pad(vscale.swapaxes(0, 1), ((0, 0), (0, spad)))
    else:
        kstage[...] = knew_ref[0].swapaxes(0, 1).astype(kstage.dtype)
        vstage[...] = vnew_ref[0].swapaxes(0, 1).astype(vstage.dtype)

    ib = pl.program_id(0)
    pos0 = pl.multiple_of(pos_ref[ib] + s * pl.program_id(1), w)
    lead = (lidx_ref[0],) if has_layer else ()

    copies = []
    n_w = s // w
    for widx in range(n_w):
        gpos = pos0 + widx * w
        pe = bt_ref[ib, gpos // page]
        rb = pl.multiple_of(gpos % page, w)
        copies.append(
            pltpu.make_async_copy(
                kstage.at[:, pl.ds(widx * w, w)],
                k_out.at[(*lead, pe, slice(None), pl.ds(rb, w))],
                sems.at[widx % 4],
            )
        )
        copies.append(
            pltpu.make_async_copy(
                vstage.at[:, pl.ds(widx * w, w)],
                v_out.at[(*lead, pe, slice(None), pl.ds(rb, w))],
                sems.at[4 + widx % 4],
            )
        )
    if quant:
        s_pad = ksstage.shape[1]
        for widx in range(s_pad // ws):
            gpos = pos0 + widx * ws
            pe = bt_ref[ib, gpos // page]
            lb = pl.multiple_of(gpos % page, ws)
            copies.append(
                pltpu.make_async_copy(
                    ksstage.at[:, pl.ds(widx * ws, ws)],
                    ks_out.at[(*lead, pe, slice(None), pl.ds(lb, ws))],
                    sems.at[widx % 4],
                )
            )
            copies.append(
                pltpu.make_async_copy(
                    vsstage.at[:, pl.ds(widx * ws, ws)],
                    vs_out.at[(*lead, pe, slice(None), pl.ds(lb, ws))],
                    sems.at[4 + widx % 4],
                )
            )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def _scale_write_kernel(cpg: int, has_layer: bool, *refs):
    """Grid (b, n_pg/cpg): write cpg whole per-page scale planes, staged
    in storage layout by the wrapper. Page j of this step's group goes to
    physical page bt[ib, ppos[ib] + group*cpg + j] (ppos in LOGICAL page
    units — padded small pages store one logical page per physical)."""
    it = iter(refs)
    bt_ref = next(it)  # (b, max_pages)
    ppos_ref = next(it)  # (b,) logical-page insert offset
    lidx_ref = next(it) if has_layer else None
    ks_in = next(it)  # (1, cpg, h_k, sc) VMEM block
    vs_in = next(it)
    _ = next(it)  # k_scales (aliased, ANY)
    _ = next(it)
    ks_out = next(it)
    vs_out = next(it)
    sems = next(it)

    ib = pl.program_id(0)
    pg0 = ppos_ref[ib] + cpg * pl.program_id(1)
    lead = (lidx_ref[0],) if has_layer else ()
    copies = []
    for j in range(cpg):
        pe = bt_ref[ib, pg0 + j]
        copies.append(
            pltpu.make_async_copy(
                ks_in.at[0, j], ks_out.at[(*lead, pe)], sems.at[j % 4]
            )
        )
        copies.append(
            pltpu.make_async_copy(
                vs_in.at[0, j], vs_out.at[(*lead, pe)], sems.at[4 + j % 4]
            )
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def _prefill_append_padded(
    k_pool, v_pool, k_new, v_new, block_tables, positions,
    k_scales, v_scales, layer_idx, page: int, interpret: bool,
):
    """Pallas prefill append in STORAGE coordinates (round-4 verdict #2):
    serves (a) PADDED small-page pools — stored_page > page, quantized
    page-16 geometries (previously the XLA scatter, a whole-pool copy per
    prefill chunk) — and (b) TIGHT pools whose 128-lane-padded scale
    plane is wider than the page (page 32/64): there the old in-kernel
    scale windows spanned several pages but landed in one page's plane —
    silently corrupted scales (round-5 finding, no prior coverage).

    Strategy: re-express the append in STORAGE coordinates. Each logical
    page's `page` tokens are padded to a full `stored_page`-row group in
    XLA (O(chunk) work), positions are rescaled to storage offsets, and
    the regular Pallas prefill path then writes whole page-sized windows
    (w == sublane tile == stored_page for int8/fp8). Quantization happens
    in XLA on the chunk stream (same quantize_kv math the in-kernel path
    uses); scale planes are staged per page in storage layout — live
    columns [0, page), 1.0 in the padded tail — and written whole by
    `_scale_write_kernel`. Dead rows/columns quantize to 0 with scale 1.0,
    exactly what the padded-mode attention kernel masks.

    Contract (same class as the aligned-prefill contract above): every
    positions[i] is a multiple of `page` and sq % page == 0 — the engine
    prefills at chunk boundaries that page-divides (serve/engine.py
    _bucket / prefill_chunk).
    """
    from xf_flash_attention_cutlass_tpu.quant.kv import quantize_kv

    b, sq, h_k, d = k_new.shape
    stored = k_pool.shape[-2]
    qdt = k_pool.dtype
    quant = k_scales is not None
    n_pg = sq // page
    pad = stored - page
    has_layer = layer_idx is not None

    if quant:
        qname = "int8" if qdt == jnp.int8 else "fp8_e4m3"
        kq, ksc = quantize_kv(k_new, qname)  # scales (b, sq, h_k, 1)
        vq, vsc = quantize_kv(v_new, qname)
        ksc, vsc = ksc[..., 0], vsc[..., 0]  # (b, sq, h_k)
    else:
        kq, vq = k_new.astype(qdt), v_new.astype(qdt)

    def pad_vals(x):
        x = x.reshape(b, n_pg, page, h_k, d)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        return x.reshape(b, n_pg * stored, h_k, d)

    pos_store = (positions.astype(jnp.int32) // page) * stored
    out = paged_append(
        k_pool, v_pool, pad_vals(kq), pad_vals(vq), block_tables,
        pos_store, layer_idx=layer_idx, page_size=stored,
        interpret=interpret, mode="auto",
    )
    if not quant:
        return out
    k_pool, v_pool = out

    sc = k_scales.shape[-1]

    def stage_scales(s):  # (b, sq, h_k) -> (b, n_pg, h_k, sc)
        s = s.reshape(b, n_pg, page, h_k)
        s = jnp.pad(
            s, ((0, 0), (0, 0), (0, sc - page), (0, 0)), constant_values=1.0
        )
        return s.swapaxes(2, 3)

    ks_staged = stage_scales(ksc)
    vs_staged = stage_scales(vsc)

    cpg = n_pg
    for c in (64, 32, 16, 8, 4, 2, 1):
        if n_pg >= c and n_pg % c == 0:
            cpg = c
            break

    scalars = [
        block_tables.astype(jnp.int32),
        (positions.astype(jnp.int32) // page),
    ]
    if has_layer:
        scalars.append(jnp.asarray(layer_idx, jnp.int32).reshape(1))
    blk = pl.BlockSpec((1, cpg, h_k, sc), lambda ib, i, *_: (ib, i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(b, n_pg // cpg),
        in_specs=[
            blk,
            blk,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
    )
    ns = len(scalars)
    k_scales, v_scales = pl.pallas_call(
        functools.partial(_scale_write_kernel, cpg, has_layer),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scales.shape, jnp.float32),
        ],
        input_output_aliases={ns + 2: 0, ns + 3: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*scalars, ks_staged, vs_staged, k_scales, v_scales)
    return k_pool, v_pool, k_scales, v_scales


def paged_append(
    k_pool: jax.Array,  # (num_pages, h_k, page, d) or (L, ...) w/ layer_idx
    v_pool: jax.Array,
    k_new: jax.Array,  # (b, sq, h_k, d) full precision
    v_new: jax.Array,
    block_tables: jax.Array,  # (b, max_pages) int32
    positions: jax.Array,  # (b,) int32 — insert position per batch
    *,
    k_scales: Optional[jax.Array] = None,  # (L?, num_pages, h_k, page) f32
    v_scales: Optional[jax.Array] = None,
    layer_idx: Optional[jax.Array] = None,
    page_size: Optional[int] = None,  # true tokens/page when pools are padded
    interpret: Optional[bool] = None,
    mode: str = "auto",  # "auto" | "decode" | "prefill"
):
    """In-place append. Returns the updated (k_pool, v_pool[, k_s, v_s]) —
    the SAME buffers, donated and aliased. Quantization (int8/fp8 pools)
    happens in-kernel when scale pools are given.

    Three shapes of use:
    - decode: sq == 1, any positions (per-token window RMW)
    - prefill: any b; every positions[i] aligned to the scale window (the
      engine prefills at page- or chunk-aligned offsets), sq padded to the
      value-window multiple (rows past the true length are dead). b > 1
      rows are independent requests (batched chunked prefill); a padding
      row points its block table at the trash page.
    - speculative verify (``mode="decode"``, sq > 1): batched multi-token
      append at arbitrary unaligned positions — unrolled into sq per-token
      window RMWs (sq is the small draft length, 2-8)
    ``mode="auto"`` keeps the historical inference: sq > 1 means prefill.
    """
    if interpret is None:
        interpret = default_interpret()
    quant = k_scales is not None
    has_layer = layer_idx is not None
    b, sq, h_k, d = k_new.shape
    stored_page = k_pool.shape[-2]
    page = int(page_size) if page_size is not None else stored_page
    qdt = k_pool.dtype
    qmax = 127.0 if qdt == jnp.int8 else 448.0
    w = min(_sublane_tile(qdt), stored_page)
    ws = min(128, k_scales.shape[-1]) if quant else min(128, stored_page)
    prefill0 = sq > 1 and mode != "decode"

    # Small-page pools whose SCALE plane is wider than the page (128-lane
    # padded planes at page < 128 — both padded-value page-16 pools and
    # TIGHT page-32/64 pools): the in-kernel prefill scale windows cannot
    # align (a 128-token scale window spans several pages but lands in
    # one page's plane — silent corruption, found in round 5), and padded
    # value layouts cannot take whole-window writes. Both re-express the
    # append in storage coordinates: quantize in XLA, whole-page value
    # windows, whole scale planes (round-4 verdict #2).
    wide_scales = quant and k_scales.shape[-1] > page
    if (
        prefill0
        and (page != stored_page or wide_scales)
        and sq % page == 0
        and d % 128 == 0
        and stored_page % _sublane_tile(qdt) == 0
        and (not quant or (k_scales.shape[-1] % 128 == 0
                           and k_scales.dtype == jnp.float32))
    ):
        return _prefill_append_padded(
            k_pool, v_pool, k_new, v_new, block_tables, positions,
            k_scales, v_scales, layer_idx, page, interpret,
        )
    # Mosaic DMA windows must be tile-aligned: value windows need the kv
    # dtype's full sublane tile to divide the stored page (tight int8/fp8
    # pools below 32 rows cannot take the Pallas path), quant scale
    # windows need 128-lane alignment of the scale plane, and prefill's
    # whole-window writes cannot span pages (padded small-page pools).
    # Misaligned geometries fall back to the XLA scatter — correct, pays
    # a pool copy per call; fine for parity-geometry use, logged once.
    if (
        d % 128 != 0
        or stored_page % _sublane_tile(qdt) != 0
        or (quant and k_scales.shape[-1] % 128 != 0)
        or (prefill0 and page != stored_page)
        # tight pools with 128-lane-padded scale planes that missed the
        # storage-coordinate route above (unaligned sq): the in-kernel
        # scale windows would corrupt — scatter instead
        or (prefill0 and wide_scales)
    ):
        from xf_flash_attention_cutlass_tpu.ops.kvcache import (
            append_kv_paged,
            append_kv_paged_quantized,
        )

        # warning (not debug): this silently changes the traffic class
        # from KB-window DMAs to a whole-pool copy per call — same
        # precedent as the varlen dense-gather fallback (round-4 verdict).
        # Once per geometry so per-token decode loops don't spam.
        geom = (d, stored_page, page, bool(quant))
        lvl = logging.DEBUG if geom in _warned_fallback else logging.WARNING
        _warned_fallback.add(geom)
        logger.log(
            lvl,
            "paged_append: geometry (d=%d, stored_page=%d, page=%d, "
            "quant=%s) falls back to the XLA scatter (pool copy per call)",
            d, stored_page, page, bool(quant),
        )
        if quant:
            kp, ks, vp, vs = append_kv_paged_quantized(
                k_pool, k_scales, v_pool, v_scales, k_new, v_new,
                block_tables, positions, layer_idx=layer_idx,
                page_size=page,
            )
            return kp, vp, ks, vs
        return append_kv_paged(
            k_pool, v_pool, k_new, v_new, block_tables, positions,
            layer_idx=layer_idx, page_size=page,
        )
    if not quant:
        k_new = k_new.astype(k_pool.dtype)
        v_new = v_new.astype(v_pool.dtype)
    elif k_scales.dtype != jnp.float32:
        raise ValueError("scale pools must be float32 (aliased in-place)")

    if mode == "decode" and sq > 1:
        # batched multi-token (speculative verify): sq per-token RMWs.
        # Chained in-place aliasing — each call mutates the same buffers.
        out = None
        kp, vp, ks, vs = k_pool, v_pool, k_scales, v_scales
        for i in range(sq):
            out = paged_append(
                kp, vp, k_new[:, i : i + 1], v_new[:, i : i + 1],
                block_tables, positions + i,
                k_scales=ks, v_scales=vs, layer_idx=layer_idx,
                page_size=page, interpret=interpret, mode="decode",
            )
            if quant:
                kp, vp, ks, vs = out
            else:
                kp, vp = out
        return out

    prefill = sq > 1
    if prefill and sq % w:
        raise ValueError(f"prefill length {sq} must be a multiple of {w}")

    scalars = [
        block_tables.astype(jnp.int32),
        positions.astype(jnp.int32),
    ]
    if has_layer:
        scalars.append(jnp.asarray(layer_idx, jnp.int32).reshape(1))

    # Long prefill appends are chunked over the grid so VMEM staging stays
    # bounded (a 2048-token 8-head append would otherwise need ~40MB of
    # scoped VMEM). Chunks must keep w/ws window alignment: multiples of
    # lcm(w, ws) = ws (ws % w == 0 for all supported dtypes).
    chunk = sq
    if prefill and sq > 512:
        for c in (512, 256, 128):
            if sq % c == 0:
                chunk = c
                break
    n_chunks = sq // chunk if prefill else 1

    inputs = [k_new, v_new, k_pool, v_pool]
    if prefill:
        # one (row, chunk) block per grid step — bounded VMEM staging for
        # any prompt length and any number of batched prefill rows
        new_spec = pl.BlockSpec(
            (1, chunk, h_k, d), lambda ib, i, *_: (ib, i, 0, 0)
        )
    else:
        new_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        new_spec,
        new_spec,
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
        jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    ns = len(scalars)
    aliases = {ns + 2: 0, ns + 3: 1}
    if quant:
        inputs += [k_scales, v_scales]
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scales.shape, jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        aliases[ns + 4] = 2
        aliases[ns + 5] = 3

    if prefill:
        s_pad_ws = cdiv(chunk, ws) * ws
        scratch = [
            pltpu.VMEM((h_k, chunk, d), qdt),
            pltpu.VMEM((h_k, chunk, d), qdt),
        ]
        if quant:
            scratch += [
                pltpu.VMEM((h_k, s_pad_ws), jnp.float32),
                pltpu.VMEM((h_k, s_pad_ws), jnp.float32),
            ]
        scratch.append(pltpu.SemaphoreType.DMA((8,)))
        kernel = functools.partial(
            _prefill_append_kernel, chunk, w, ws, page, quant, has_layer,
            qmax,
        )
    else:
        scratch = []
        if quant:
            scratch += [
                pltpu.VMEM((b, 1, h_k, d), qdt),
                pltpu.VMEM((b, 1, h_k, d), qdt),
                pltpu.VMEM((b, 1, h_k), jnp.float32),
                pltpu.VMEM((b, 1, h_k), jnp.float32),
            ]
        scratch += [
            pltpu.VMEM((b, h_k, w, d), qdt),
            pltpu.VMEM((b, h_k, w, d), qdt),
        ]
        if quant:
            scratch += [
                pltpu.VMEM((b, h_k, ws), jnp.float32),
                pltpu.VMEM((b, h_k, ws), jnp.float32),
            ]
        scratch.append(pltpu.SemaphoreType.DMA((8,)))
        kernel = functools.partial(
            _decode_append_kernel, b, w, ws, page, quant, has_layer, qmax
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(b, n_chunks) if prefill else (1,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*scalars, *inputs)
    return tuple(out)
