"""Pallas TPU deposit kernel: sorted one-hot-matmul mass assignment.

The NGP scatter `grid.at[flat].add(w)` is the wall of the whole analysis
suite: XLA lowers TPU scatter to a full sort PLUS a serialized segment
reduce (measured on the v5e chip at 512^3: scatter 1582 ms; lax.sort alone
450 ms; segment_sum even on pre-sorted ids 1211 ms). The sort is
irreducible, but the post-sort accumulation is not: with keys sorted,
every 128-lane-aligned window of the grid receives a contiguous particle
range, and the in-window deposit

    out[r, l] += sum_p w_p * [rel_p // 128 == r] * [rel_p % 128 == l]

is a contraction of two on-the-fly one-hot tensors — an MXU matmul, not a
scatter. This kernel grids over disjoint output windows, DMAs each
window's (pre-sorted) particle range from HBM in chunks, and accumulates
via `dot_general` into a VMEM block. Replaces the role of pmesh painting
in the reference (/root/reference/src/astrild/particles/hutils/
stats_subfind.py:129-141, power_spectrum_3d.py:140-153).

Measured at 512^3 particles -> 8*256^3 cells (bench scale): sort+kernel
~380 ms (is_stable=False sort 237 ms + kernel 144 ms) vs 1582 ms for the
XLA scatter (4.2x). Stable sort costs 442 ms — XLA implements stability
with an implicit index-tiebreaker operand; deposits never need it.

Runs compiled on TPU; in interpreter mode on the CPU test mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["deposit_sorted", "deposit_flat", "deposit_flat_segmented",
           "paint_windowed", "pallas_deposit_available",
           "pallas_seg_deposit_available", "pallas_paint_available",
           "DEFAULT_WINDOW"]

DEFAULT_WINDOW = 16384  # cells per output window (must be multiple of 128)
_CHUNK_ROWS = 64        # particle rows (of 128) DMA'd per inner step
# shared cap on scalar-prefetch pairs per pallas_call: two (pairs,) int32
# arrays must fit the 1 MB SMEM budget and Mosaic crashes at >= 131072
# grid programs; 2^16 keeps both safe (tests shrink it to force splits)
_MAX_PREFETCH_PAIRS = 65536


from ..utils.jax_compat import pcast_varying as _pvary  # shared shim


def _dot_f32_split(hf, lmat_bf16):
    """hf @ lmat with full f32-input accuracy via a bf16 hi/lo split.

    TPU MXU truncates f32 matmul inputs to bf16 at DEFAULT precision;
    hi = bf16(hf), lo = bf16(hf - hi) recovers ~f32 accuracy in two
    bf16-rate passes (lmat is exact 0/1 in bf16).
    """
    hh = hf.astype(jnp.bfloat16)
    hl = (hf - hh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    return (jax.lax.dot_general(hh, lmat_bf16, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(hl, lmat_bf16, dn,
                                  preferred_element_type=jnp.float32))


def _chunk_contribution(kchunk, vchunk, base, *, rows: int, window: int,
                        p1: int, counts_only: bool):
    """One chunk's (rows, 128) deposit contribution via one-hot matmuls.

    Two one-hot factors contracted over the particle axis:
    H[p,r] = w_p * [row_p==r]; L[p,l] = [lane_p==l]  ->  (rows, 128).
    The expensive Mosaic op here is the minor-dim insertion
    ([:, :, None]): it spreads lane-resident values one-per-vector-
    row (a sublane relayout, measured ~0.55 cycles/element — 77 ms
    per insertion over 134M keys). So insert the masked relative
    cell ONCE and derive row/lane by div/mod on the spread form;
    the iota compares along the fresh minor axis are cheap
    broadcasts (measured: 203 -> 144 ms at bench scale).
    Mosaic only lowers minor-dim insertion for 32-bit types, so the
    insertions stay on int32/float32; bf16 appears only after the
    3D compare. The in-window mask is folded into the spread value
    (window -> row == rows, which never matches the iota).
    """
    rel = kchunk - base
    inw = (rel >= 0) & (rel < window)
    relm = jnp.where(inw, rel, window)
    rel3 = relm[:, :, None]
    row3 = rel3 // 128
    lane3 = rel3 - row3 * 128   # masked rows: lane 0, but h row is 0
    lmat = (lane3 == jax.lax.broadcasted_iota(
        jnp.int32, (p1, 128, 128), 2)).astype(jnp.bfloat16
                                              ).reshape(p1 * 128, 128)
    if counts_only:
        # pure 0/1 factors: a single bf16 MXU pass is EXACT
        h = (row3 == jax.lax.broadcasted_iota(
            jnp.int32, (p1, 128, rows), 2)).astype(jnp.bfloat16
                                                   ).reshape(
                                                       p1 * 128, rows)
        return jax.lax.dot_general(
            h, lmat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # weighted: TPU truncates f32 matmul inputs to bf16 at DEFAULT
    # precision (1e-3 relative error on weights). Split the weighted
    # one-hot into hi+lo bf16 parts — two MXU passes recover full
    # f32-input accuracy at bf16 speed.
    hf = ((row3 == jax.lax.broadcasted_iota(
        jnp.int32, (p1, 128, rows), 2)).astype(jnp.float32)
        * vchunk[:, :, None]).reshape(p1 * 128, rows)
    return _dot_f32_split(hf, lmat)


def _kernel(srow_ref, nch_ref, keys_hbm, vals_hbm, out_ref, kbuf, vbuf,
            sem_k, sem_v, *, rows: int, window: int, p1: int,
            counts_only: bool):
    j = pl.program_id(0)
    base = j * window
    nch = nch_ref[j]

    # double-buffered chunk DMA: slot k%2 computes while slot (k+1)%2 loads
    def dma_k(k, slot):
        return pltpu.make_async_copy(
            keys_hbm.at[pl.ds(srow_ref[j] + k * p1, p1), :],
            kbuf.at[slot], sem_k.at[slot])

    def dma_v(k, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(srow_ref[j] + k * p1, p1), :],
            vbuf.at[slot], sem_v.at[slot])

    @pl.when(nch > 0)
    def _():
        dma_k(0, 0).start()
        if not counts_only:
            dma_v(0, 0).start()

    def body(k, acc):
        slot = k % 2
        nxt = (k + 1) % 2

        @pl.when(k + 1 < nch)
        def _():
            dma_k(k + 1, nxt).start()
            if not counts_only:
                dma_v(k + 1, nxt).start()

        dma_k(k, slot).wait()
        if not counts_only:
            dma_v(k, slot).wait()
        return acc + _chunk_contribution(
            kbuf[slot], None if counts_only else vbuf[slot], base,
            rows=rows, window=window, p1=p1, counts_only=counts_only)

    acc = jax.lax.fori_loop(0, nch, body,
                            jnp.zeros((rows, 128), jnp.float32))
    out_ref[:, :] = acc


@functools.partial(jax.jit,
                   static_argnames=("n_cells", "window", "interpret",
                                    "chunk_rows"))
def deposit_sorted(keys_sorted, vals_sorted, n_cells: int,
                   window: int = DEFAULT_WINDOW,
                   interpret: bool | None = None,
                   chunk_rows: int = _CHUNK_ROWS):
    """Deposit pre-sorted (cell, weight) pairs into a flat grid.

    keys_sorted: (N,) int32 ascending cell indices in [0, n_cells).
    vals_sorted: (N,) float32 weights co-sorted with keys, or None for
      unit weights (counts — saves the value sort AND the value DMA).
    n_cells: total grid cells; must be a multiple of `window`.

    Returns (n_cells,) float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert n_cells % window == 0 and window % 128 == 0
    rows = window // 128
    p1 = chunk_rows
    nw = n_cells // window
    counts_only = vals_sorted is None

    n = keys_sorted.shape[0]
    # pad to whole chunks; sentinel key n_cells stays sorted and never
    # lands in any window
    nrow = -(-n // 128)
    nrow = -(-nrow // p1) * p1 + p1  # + one spare chunk of slack
    pad = nrow * 128 - n
    keys2d = jnp.pad(keys_sorted, (0, pad),
                     constant_values=n_cells).reshape(nrow, 128)
    if counts_only:
        vals2d = jnp.zeros((1, 128), jnp.float32)  # placeholder operand
        # under shard_map the placeholder must vary over the same mesh
        # axes as the keys, or vma checking rejects the kernel jaxpr
        try:
            kvma = tuple(jax.typeof(keys2d).vma)
            if kvma:
                vals2d = _pvary(vals2d, kvma)
        except Exception:
            pass
    else:
        vals2d = jnp.pad(vals_sorted.astype(jnp.float32),
                         (0, pad)).reshape(nrow, 128)

    # per-window particle ranges, aligned down/up to whole rows
    # n_cells < 2^31 always (a 1024^3 grid is 2^30), so int32 is safe
    edges = jnp.arange(nw + 1, dtype=jnp.int32) * window
    bounds = jnp.searchsorted(keys_sorted, edges).astype(jnp.int32)
    srow_part = bounds[:-1] // 128
    erow = -(-bounds[1:] // 128)  # ceil: include the shared tail row
    nch = -(-jnp.maximum(erow - srow_part, 0) // p1)

    kern = functools.partial(_kernel, rows=rows, window=window, p1=p1,
                             counts_only=counts_only)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda j, *prefetch: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, p1, 128), jnp.int32),
            pltpu.VMEM((2, p1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # propagate varying-mesh-axes so the kernel composes with shard_map
    # (e.g. the per-chip deposit in parallel.power): the output varies
    # over every axis an input varies over
    try:
        vma = frozenset(jax.typeof(keys2d).vma)
        if not counts_only:
            vma = vma | frozenset(jax.typeof(vals2d).vma)
    except Exception:
        vma = frozenset()
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_cells // 128, 128), jnp.float32,
                                       vma=vma),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(srow_part, nch, keys2d, vals2d)
    return out.reshape(-1)


# --------------------------------------------------------------------------
# Segment-sorted deposit: kill the monolithic-sort wall.
#
# Stable lax.sort of 134M keys costs 437 ms on the chip while sorting
# the SAME keys as 64 independent segments costs 296 ms (batched bitonic
# depth shrinks with log^2 of the run length). NOTE: with
# is_stable=False the MONOLITHIC sort drops to 237 ms, so the segmented
# path's sort advantage has largely evaporated — it remains opt-in for
# spatially coherent input where the (window, segment) ranges are mostly
# empty and the kernel grid no-ops dominate. A fully sorted order is not
# actually required by the deposit: the kernel only needs, per output
# window, DMA ranges that COVER the window's particles, with everything
# else discarded by the in-window value mask. With keys sorted within S
# equal segments, window w's particles are S contiguous ranges (one per
# segment), so the kernel grids over (window, segment) with segment
# innermost — the output block stays resident in VMEM across all S
# passes and is written to HBM once.
#
# Chunked DMA bounds never cross a segment: rows-per-segment is padded to
# a multiple of the chunk size and the start row is aligned DOWN to a
# chunk boundary inside the segment; the extra head/tail rows hold
# same-segment keys that sort strictly before/after the window and are
# value-masked. This costs ~p1 extra rows per (w, s) range — the kernel
# is VPU-bound (the 537 MB of key traffic is ~1 ms of HBM bandwidth vs a
# ~150 ms kernel), so the fragmented DMA pattern that killed the old
# design (round-3 notes) is irrelevant at p1-row granularity.


def _fit_seg_params(n_cells: int, window: int, n_seg: int):
    """Cap (n_cells/window) * n_seg at 2^16 by shedding segments, then
    widening windows.

    The segmented kernel's two scalar-prefetch arrays are (nw * n_seg,)
    int32 and must fit the 1 MB SMEM budget, and Mosaic rejects
    >= 131072 grid programs; 2^16 pairs = 256 KB each keeps both safe.
    Segments go first: fewer segments leave the per-chunk kernel cost
    unchanged (the sort-batching benefit is marginal since unstable
    monolithic sorts), while a wider window grows the one-hot H build
    ~linearly with rows. Raises when neither knob can satisfy the cap
    (odd window-count grids) instead of failing AOT with an opaque
    SMEM error.
    """
    while (n_cells // window) * n_seg > _MAX_PREFETCH_PAIRS:
        if n_seg > 1:
            n_seg //= 2  # kernel cost unchanged, same exactness
        elif n_cells % (2 * window) == 0:
            window *= 2  # last resort: one-hot build grows with rows
        else:
            raise ValueError(
                f"deposit_flat_segmented: n_cells={n_cells} has "
                f"{n_cells // window} windows of {window} and no "
                "power-of-two headroom to widen; the scalar-prefetch "
                "arrays would exceed the 1 MB SMEM budget. Pick a "
                "window w (multiple of 128) with n_cells % w == 0 and "
                "n_cells / w <= 65536, or use deposit_flat.")
    return window, n_seg


def _auto_deposit_params(n: int, raw_cells: int, window=None,
                         chunk_rows=None, must_divide: int | None = None,
                         kind: str = "flat"):
    """Density-adaptive (window, chunk_rows) for the sorted deposits.

    The driver is rho = mean particle rows per (window[, offset]) range
    = n * window / raw_cells / 128. When rho << chunk_rows the kernel is
    program-overhead + chunk-spill bound (every tiny range pays a full
    chunk DMA): widen the window until rho >= 16 rows and shrink chunks
    to 16. Measured on the v5e (TSC 512^3 from 4.2M sparse particles):
    (16384, 64) 2869 ms -> (65536, 16) 709 ms; NGP 4.2M -> 2^27 cells:
    86 -> 39 ms. The mid regime (33.6M -> 512^3, rho = 31) takes
    (16384, 16): 3758 vs 4373 ms. Windows beyond 262144 are a measured
    pessimization (1M window: 2970 ms on the sparse case — the one-hot
    H build grows with rows).

    kind splits the DENSE regime (r5 re-sweep on the post-2026-08
    libtpu): the single-range flat deposit (kind="flat":
    deposit_flat/deposit_sorted) is fastest at (8192, 24) — NGP counts
    at bench scale 182 -> 155 ms, weighted pairs 290 -> 252 ms — while
    the multi-offset painter (kind="paint": paint_windowed, whose
    per-(window, offset) ranges are 8/27x shorter) keeps (16384, 64):
    TSC 16.8M -> 256^3 measured 1235 / 1289 / 1335 ms at chunks
    64/32/24.
    """
    if window is None:
        dense = n * DEFAULT_WINDOW >= 64 * 128 * raw_cells
        if (kind == "flat" and dense
                and (must_divide is None or must_divide % 8192 == 0)):
            window = 8192
            if chunk_rows is None:
                chunk_rows = 24
        else:
            window = DEFAULT_WINDOW
            # stop at the first window with rho >= ~12 rows (the
            # measured-best 4.2M/512^3 config sits at rho = 15.8 and
            # must NOT widen past it)
            while (window < 262144 and n * window < 12 * 128 * raw_cells
                   and (must_divide is None
                        or must_divide % (2 * window) == 0)):
                window *= 2
    if chunk_rows is None:
        rho = n * window / max(raw_cells, 1) / 128.0
        chunk_rows = 64 if rho >= 64 else 16
    return window, chunk_rows


def _fit_paint_window(raw_cells: int, window: int) -> int:
    """Widen the paint window until ceil(raw_cells/window) fits the same
    2^16 scalar-prefetch/grid-program cap as _fit_seg_params.

    paint_windowed rounds n_cells UP to a window multiple, so the window
    is a free parameter here — doubling always converges. The offset
    axis is split across pallas_calls and never enters this bound;
    widening the window grows the one-hot build ~linearly with rows, so
    it is the knob of last resort, needed only for > ~2^30-cell grids.
    """
    while -(-raw_cells // window) > _MAX_PREFETCH_PAIRS:
        window *= 2
    return window


def _kernel_seg(srow_ref, nch_ref, keys_hbm, vals_hbm, out_ref, kbuf, vbuf,
                sem_k, sem_v, *, rows: int, window: int, p1: int,
                counts_only: bool, nw: int):
    j = pl.program_id(0)
    s = pl.program_id(1)
    base = j * window
    oj = s * nw + j
    nch = nch_ref[oj]

    @pl.when(s == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    def dma_k(k, slot):
        return pltpu.make_async_copy(
            keys_hbm.at[pl.ds(srow_ref[oj] + k * p1, p1), :],
            kbuf.at[slot], sem_k.at[slot])

    def dma_v(k, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(srow_ref[oj] + k * p1, p1), :],
            vbuf.at[slot], sem_v.at[slot])

    @pl.when(nch > 0)
    def _():
        dma_k(0, 0).start()
        if not counts_only:
            dma_v(0, 0).start()

    def body(k, acc):
        slot = k % 2
        nxt = (k + 1) % 2

        @pl.when(k + 1 < nch)
        def _():
            dma_k(k + 1, nxt).start()
            if not counts_only:
                dma_v(k + 1, nxt).start()

        dma_k(k, slot).wait()
        if not counts_only:
            dma_v(k, slot).wait()
        return acc + _chunk_contribution(
            kbuf[slot], None if counts_only else vbuf[slot], base,
            rows=rows, window=window, p1=p1, counts_only=counts_only)

    acc = jax.lax.fori_loop(0, nch, body,
                            jnp.zeros((rows, 128), jnp.float32))
    out_ref[:, :] += acc


@functools.partial(jax.jit,
                   static_argnames=("n_cells", "n_seg", "window",
                                    "interpret", "chunk_rows"))
def deposit_flat_segmented(flat_idx, weights, n_cells: int,
                           n_seg: int = 64,
                           window: int = DEFAULT_WINDOW,
                           interpret: bool | None = None,
                           chunk_rows: int = 8):
    """Segment-sort + (window, segment) Pallas deposit.

    Drop-in for `zeros(n_cells).at[flat_idx].add(w)` like deposit_flat,
    but sorts keys only within n_seg equal segments (~1.5x cheaper than
    the monolithic sort at 134M keys) and makes S passes per output
    window. Exact for arbitrary input order.

    (window, n_seg) are auto-adjusted so n_cells/window * n_seg stays
    <= 2^16: the two scalar-prefetch arrays are (nw * n_seg,) int32 and
    must fit the 1 MB SMEM budget, and the Mosaic compiler rejects
    >= 131072 grid programs (measured: HTTP 500 through the tunnel).
    At bench scale (2^27 cells, window 16384, n_seg 64 -> 2^19 pairs)
    the un-adjusted kernel fails AOT with "would exceed memory
    (space=smem)".
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert n_cells % window == 0 and window % 128 == 0
    window, n_seg = _fit_seg_params(n_cells, window, n_seg)
    rows = window // 128
    p1 = chunk_rows
    nw = n_cells // window
    counts_only = weights is None

    flat_idx = flat_idx.reshape(-1).astype(jnp.int32)
    n = flat_idx.shape[0]
    # rows-per-segment padded to whole chunks so chunk DMAs stay inside
    # the segment; sentinel n_cells sorts to each segment's tail and
    # never lands in a window
    seg_len = -(-n // n_seg)
    seg_len = -(-seg_len // (128 * p1)) * (128 * p1)
    rps = seg_len // 128
    pad = n_seg * seg_len - n
    keys = jnp.pad(flat_idx, (0, pad), constant_values=n_cells
                   ).reshape(n_seg, seg_len)
    if counts_only:
        keys_s = jax.lax.sort(keys, dimension=1, is_stable=False)
        vals2d = jnp.zeros((1, 128), jnp.float32)  # placeholder operand
        try:
            kvma = tuple(jax.typeof(keys_s).vma)
            if kvma:
                vals2d = _pvary(vals2d, kvma)
        except Exception:
            pass
    else:
        vals = jnp.pad(weights.reshape(-1).astype(jnp.float32), (0, pad)
                       ).reshape(n_seg, seg_len)
        keys_s, vals_s = jax.lax.sort((keys, vals), dimension=1,
                                      num_keys=1, is_stable=False)
        vals2d = vals_s.reshape(n_seg * rps, 128)
    keys2d = keys_s.reshape(n_seg * rps, 128)

    # per-(segment, window) ranges within the segment, start row aligned
    # DOWN to a chunk boundary (head/tail spill is value-masked)
    edges = jnp.arange(nw + 1, dtype=jnp.int32) * window
    bounds = jax.vmap(
        lambda ks: jnp.searchsorted(ks, edges).astype(jnp.int32))(keys_s)
    lo = bounds[:, :-1]
    hi = bounds[:, 1:]
    srow_rel = (lo // 128) // p1 * p1
    erow_rel = -(-hi // 128)
    nch = -(-jnp.maximum(erow_rel - srow_rel, 0) // p1)
    seg_row0 = (jnp.arange(n_seg, dtype=jnp.int32) * rps)[:, None]
    srow = (seg_row0 + srow_rel).reshape(-1)
    nch = nch.reshape(-1)

    kern = functools.partial(_kernel_seg, rows=rows, window=window, p1=p1,
                             counts_only=counts_only, nw=nw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nw, n_seg),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((rows, 128),
                               lambda j, s, *prefetch: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, p1, 128), jnp.int32),
            pltpu.VMEM((2, p1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    try:
        vma = frozenset(jax.typeof(keys2d).vma)
        if not counts_only:
            vma = vma | frozenset(jax.typeof(vals2d).vma)
    except Exception:
        vma = frozenset()
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_cells // 128, 128), jnp.float32,
                                       vma=vma),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(srow, nch, keys2d, vals2d)
    return out.reshape(-1)


@functools.cache
def pallas_seg_deposit_available() -> bool:
    """Probe-compile the segmented deposit (see pallas_deposit_available
    for why auto-selection must consult a clean-trace probe)."""
    def body():
        keys = (jnp.arange(512, dtype=jnp.int32) * 7) % 2048
        out = deposit_flat_segmented(keys, None, 2048, n_seg=4,
                                     window=1024, chunk_rows=2)
        jax.block_until_ready(out)
        ok = int(jnp.sum(out)) == 512
        wts = jnp.full((512,), 0.5, jnp.float32)
        outw = deposit_flat_segmented(keys, wts, 2048, n_seg=4,
                                      window=1024, chunk_rows=2)
        jax.block_until_ready(outw)
        return ok and abs(float(jnp.sum(outw)) - 256.0) < 0.1

    return _probe_outside_trace(body)


# --------------------------------------------------------------------------
# Multi-offset windowed painter: CIC/TSC as per-offset passes over ONE
# sorted particle buffer (completes SURVEY.md hard part "scatter-add
# painting performance": Pallas deposit + sort-by-cell replaces pmesh TSC,
# /root/reference/src/astrild/particles/hutils/stats_subfind.py:129-141).
#
# The separable window deposits w = prod_axis w_axis(frac, a) into the
# base cell shifted by each offset (dx, dy, dz). On a PADDED (n+2)^3 grid
# the flat target key is base_key + const per offset, so ONE sort of the
# base keys serves every offset: pass o's contributors to window w are the
# contiguous sorted range [searchsorted(keys, w*W - off_o), ...). The
# kernel grids over (window, offset) with the offset innermost, so the
# output block stays resident in VMEM across all 8/27 offsets and is
# written to HBM once. Axis weights are computed branch-free from the
# fractional positions and the prefetched per-offset integers a:
#   CIC (f in [0,1), a in {0,1}):    w = a*f + (1-a)*(1-f)
#   TSC (d in [-.5,.5), a in {-1,0,1}): w = [a==0]*(0.75-d^2)
#                                        + [a!=0]*0.5*(0.5+a*d)^2


def _paint_kernel(off_ref, ax_ref, ay_ref, az_ref, srow_ref, nch_ref,
                  keys_hbm, fw_hbm, out_ref, kbuf, fbuf, sem_k, sem_f, *,
                  rows: int, window: int, p1: int, order: int,
                  has_w: bool):
    j = pl.program_id(0)
    o = pl.program_id(1)
    base = j * window - off_ref[o]
    oj = o * pl.num_programs(0) + j
    nch = nch_ref[oj]

    @pl.when(o == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    def dma_k(k, slot):
        return pltpu.make_async_copy(
            keys_hbm.at[pl.ds(srow_ref[oj] + k * p1, p1), :],
            kbuf.at[slot], sem_k.at[slot])

    def dma_f(k, slot):
        return pltpu.make_async_copy(
            fw_hbm.at[:, pl.ds(srow_ref[oj] + k * p1, p1), :],
            fbuf.at[slot], sem_f.at[slot])

    @pl.when(nch > 0)
    def _():
        dma_k(0, 0).start()
        dma_f(0, 0).start()

    def axis_w(d, a):
        af = a.astype(jnp.float32)
        if order == 2:    # CIC
            return af * d + (1.0 - af) * (1.0 - d)
        # TSC
        is0 = (a == 0).astype(jnp.float32)
        return is0 * (0.75 - d * d) + (1.0 - is0) * 0.5 \
            * (0.5 + af * d) ** 2

    def body(k, _):
        slot = k % 2
        nxt = (k + 1) % 2

        @pl.when(k + 1 < nch)
        def _():
            dma_k(k + 1, nxt).start()
            dma_f(k + 1, nxt).start()

        dma_k(k, slot).wait()
        dma_f(k, slot).wait()
        rel = kbuf[slot] - base
        inw = (rel >= 0) & (rel < window)
        w = (axis_w(fbuf[slot, 0], ax_ref[o])
             * axis_w(fbuf[slot, 1], ay_ref[o])
             * axis_w(fbuf[slot, 2], az_ref[o]))
        if has_w:
            w = w * fbuf[slot, 3]
        # ONE int32 minor-dim insertion of the masked cell (see _kernel:
        # the insertion is the dominant Mosaic cost, so row/lane one-hots
        # are derived from a single spread value); the weight needs its
        # own f32 insertion (it is data, not derivable from the cell).
        relm = jnp.where(inw, rel, window)
        rel3 = relm[:, :, None]
        row3 = rel3 // 128
        lane3 = rel3 - row3 * 128
        hf = ((row3 == jax.lax.broadcasted_iota(
            jnp.int32, (p1, 128, rows), 2)).astype(jnp.float32)
            * w[:, :, None]).reshape(p1 * 128, rows)
        lmat = (lane3 == jax.lax.broadcasted_iota(
            jnp.int32, (p1, 128, 128), 2)).astype(jnp.bfloat16
                                                  ).reshape(p1 * 128, 128)
        out_ref[:, :] += _dot_f32_split(hf, lmat)
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("ngrid", "order", "window", "interpret",
                                    "chunk_rows"))
def paint_windowed(pos_flat, weights, ngrid: int, boxsize, order: int = 3,
                   window: int | None = None,
                   interpret: bool | None = None,
                   chunk_rows: int | None = None):
    """Pallas CIC/TSC deposit: drop-in replacement for ops.paint.paint.

    pos_flat: (3*n,) float32 — x, y, z concatenated ((n,3) arrays pad
      their 3-wide dim 42x at large n on TPU; see CLAUDE.md).
    order: 2 (CIC, 8 offsets) or 3 (TSC, 27 offsets).
    window/chunk_rows: None = density-adaptive (_auto_deposit_params;
      sparse/large-grid input widens the window and shrinks chunks —
      measured 4x on TSC 512^3 from 4.2M particles).

    Returns (ngrid, ngrid, ngrid) float32, bit-comparable (float-sum
    ordering aside) with paint_cic/paint_tsc.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert order in (2, 3)
    import numpy as np

    n = pos_flat.shape[0] // 3
    window, chunk_rows = _auto_deposit_params(n, (ngrid + 2) ** 3, window,
                                              chunk_rows, kind="paint")
    # periodic wrap FIRST (paint.py promises all painters are periodic;
    # the scatter painters wrap via % ngrid) — afterwards every base cell
    # is in range and the padded-grid fold below supplies the wrap of the
    # +-1 window offsets
    xyz = [c % boxsize for c in (pos_flat[:n], pos_flat[n:2 * n],
                                 pos_flat[2 * n:])]
    npd = ngrid + 2
    h = boxsize / ngrid
    if order == 2:
        offs1 = (0, 1)
        u = [c / h - 0.5 for c in xyz]
        i0 = [jnp.floor(c) for c in u]
        frac = [(c - i).astype(jnp.float32) for c, i in zip(u, i0)]
        # u in [-0.5, n-0.5) -> i0 in [-1, n-1]; +1 pads into [0, n]
        ip = [i.astype(jnp.int32) + 1 for i in i0]
    else:
        offs1 = (-1, 0, 1)
        u = [c / h for c in xyz]
        # i0 in [0, n-1] after the wrap; the clip guards the u == n float
        # edge, and frac MUST be computed from the CLIPPED index so the
        # edge particle gets center n-1 with d = +0.5 (mass into n-1 and
        # the pad cell n, which folds to 0) — the same deposit the
        # scatter path makes via its wrapped center 0 with d = -0.5.
        # Deriving frac from the unclipped floor instead leaves d = -0.5
        # around n-1 (mass into n-2, n-1): a one-cell misplacement.
        ic = [jnp.clip(jnp.floor(c).astype(jnp.int32), 0, ngrid - 1)
              for c in u]
        frac = [(c - i.astype(jnp.float32) - 0.5).astype(jnp.float32)
                for c, i in zip(u, ic)]
        ip = [i + 1 for i in ic]
    key = (ip[0] * npd + ip[1]) * npd + ip[2]
    window = _fit_paint_window(npd ** 3, window)

    # one sort serves all offsets: sort (key, index), gather fracs/weights
    keys_s, idx_s = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                                 num_keys=1, is_stable=False)
    comps = [frac[0][idx_s], frac[1][idx_s], frac[2][idx_s]]
    has_w = weights is not None
    if has_w:
        comps.append(weights.astype(jnp.float32)[idx_s])

    rows = window // 128
    p1 = chunk_rows
    n_cells = -(-(npd ** 3) // window) * window
    nw = n_cells // window
    nrow = -(-n // 128)
    nrow = -(-nrow // p1) * p1 + p1
    pad = nrow * 128 - n
    # sentinel: NEGATIVE offsets shift windows upward in key space, so the
    # sentinel must clear n_cells by more than max|off| or padding lands
    # in the last window
    sentinel = n_cells + npd * npd + npd + 2
    keys2d = jnp.pad(keys_s, (0, pad),
                     constant_values=sentinel).reshape(nrow, 128)
    fw = jnp.stack([jnp.pad(c, (0, pad)).reshape(nrow, 128) for c in comps])

    # per-(offset, window) sorted ranges: target = key + off_flat
    offs = [(dx, dy, dz) for dx in offs1 for dy in offs1 for dz in offs1]
    n_off = len(offs)
    off_flat = jnp.asarray([(dx * npd + dy) * npd + dz
                            for dx, dy, dz in offs], jnp.int32)
    axs = jnp.asarray([dx for dx, _, _ in offs], jnp.int32)
    ays = jnp.asarray([dy for _, dy, _ in offs], jnp.int32)
    azs = jnp.asarray([dz for _, _, dz in offs], jnp.int32)
    edges = jnp.arange(nw + 1, dtype=jnp.int32) * window
    bounds = jax.vmap(
        lambda off: jnp.searchsorted(keys_s, edges - off).astype(jnp.int32)
    )(off_flat)                                   # (n_off, nw+1)
    srow2 = bounds[:, :-1] // 128                 # (n_off, nw)
    erow = -(-bounds[:, 1:] // 128)
    nch2 = -(-jnp.maximum(erow - srow2, 0) // p1)

    try:
        vma = frozenset(jax.typeof(keys2d).vma) | frozenset(
            jax.typeof(fw).vma)
    except Exception:
        vma = frozenset()
    if vma:
        # under shard_map the CONSTANT prefetch operands must carry the
        # same varying-mesh-axes as the data, or the kernel's internal
        # dynamic_slice rejects the mixed-vma operands
        off_flat, axs, ays, azs = (_pvary(a, vma)
                                   for a in (off_flat, axs, ays, azs))

    # The offset axis is SPLIT across pallas_calls so nw * group stays
    # under the 2^16 scalar-prefetch/grid-program cap (the 131072-program
    # Mosaic crash line and the 1 MB SMEM budget — same limits as
    # _fit_seg_params). One call handles every offset up to ngrid ~ 340
    # (TSC) / ~ 510 (CIC); larger grids pay only ceil(n_off/group) - 1
    # extra full-grid adds (~ms) instead of a 4x-wider one-hot build.
    group = max(1, min(n_off, _MAX_PREFETCH_PAIRS // nw))
    kern = functools.partial(_paint_kernel, rows=rows, window=window,
                             p1=p1, order=order, has_w=has_w)
    partials = []
    for o0 in range(0, n_off, group):
        o1 = min(o0 + group, n_off)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nw, o1 - o0),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((rows, 128), lambda j, o, *pref: (j, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, p1, 128), jnp.int32),
                pltpu.VMEM((2, 4 if has_w else 3, p1, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        partials.append(pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_cells // 128, 128),
                                           jnp.float32, vma=vma),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(off_flat[o0:o1], axs[o0:o1], ays[o0:o1], azs[o0:o1],
          srow2[o0:o1].reshape(-1), nch2[o0:o1].reshape(-1), keys2d, fw))
    out = partials[0]
    for p_ in partials[1:]:
        out = out + p_

    # fold the periodic pad back: padded index p -> cell (p-1) mod n
    g = out.reshape(-1)[: npd ** 3].reshape(npd, npd, npd)
    for ax in range(3):
        g = jnp.moveaxis(g, ax, 0)
        core = g[1:ngrid + 1]
        core = core.at[ngrid - 1].add(g[0]).at[0].add(g[ngrid + 1])
        g = jnp.moveaxis(core, 0, ax)
    return g


def _probe_outside_trace(body) -> bool:
    """Run a probe compile with a CLEAN trace state, reporting False only
    on genuine failure.

    Auto-selection consults the probes at TRACE time of the caller's jit.
    JAX trace state is thread-local, so running the probe body in a fresh
    thread executes it eagerly even mid-trace; probing inline would trace
    the kernel into the caller's jaxpr, raise on the host float() reads,
    and report a false negative — silently degrading every pipeline to
    the 2-3x slower scatter path (observed as the bench r2 regression).
    """
    import concurrent.futures

    def run():
        try:
            return bool(body())
        except Exception:
            return False

    try:
        import jax.core as _core
        clean = _core.trace_state_clean()
    except Exception:
        clean = False
    if clean:
        return run()
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
        return ex.submit(run).result()


@functools.cache
def pallas_paint_available() -> bool:
    """Probe-compile the multi-offset CIC/TSC painter (see
    pallas_deposit_available for why auto-selection must be gated)."""
    def body():
        import numpy as np

        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.uniform(0, 10.0, 3 * 256), jnp.float32)
        for order in (2, 3):
            g = paint_windowed(pos, None, 8, 10.0, order=order,
                               window=1024)
            jax.block_until_ready(g)
            if abs(float(jnp.sum(g)) - 256.0) > 0.1:  # f32 sum tolerance
                return False
        return True

    return _probe_outside_trace(body)


@functools.cache
def pallas_deposit_available() -> bool:
    """Probe-compile the deposit kernel on the current default backend.

    Mosaic's supported-op set moves with libtpu releases (a 2026-08 update
    dropped non-32-bit minor-dim insertion and broke an earlier version of
    this kernel at runtime). Callers that auto-select the Pallas path must
    consult this probe so a lowering regression degrades to the XLA
    scatter instead of crashing the pipeline. The tiny compile is cached
    by the persistent compilation cache and by functools.cache.
    """
    def body():
        # smallest LEGAL config: window >= 1024 keeps the (rows, 128)
        # output block at >= 8 sublanes (the Mosaic minimum)
        keys = (jnp.arange(512, dtype=jnp.int32) * 7) % 2048
        out = deposit_sorted(jax.lax.sort(keys, is_stable=False), None,
                             2048, window=1024)
        jax.block_until_ready(out)
        ok = int(jnp.sum(out)) == 512
        wts = jnp.full((512,), 0.5, jnp.float32)
        outw = deposit_sorted(jax.lax.sort(keys, is_stable=False), wts,
                              2048, window=1024)
        jax.block_until_ready(outw)
        # the weighted VALUES must be right too: a Mosaic regression that
        # breaks only the f32 hi/lo-split weighting (e.g. bf16 truncation
        # reappearing) would otherwise pass the probe and silently corrupt
        # every weighted P(k)
        return ok and abs(float(jnp.sum(outw)) - 256.0) < 0.1

    return _probe_outside_trace(body)


def deposit_flat(flat_idx, weights, n_cells: int,
                 window: int | None = None,
                 interpret: bool | None = None,
                 chunk_rows: int | None = None):
    """Sort + Pallas deposit: drop-in for `zeros(n).at[flat].add(w)`.

    weights=None deposits counts (sorts only the keys — the common and
    fastest path; the bench's NGP deposit is unit-weight).
    window/chunk_rows: None = density-adaptive (_auto_deposit_params).
    """
    flat_idx = flat_idx.reshape(-1).astype(jnp.int32)
    window, chunk_rows = _auto_deposit_params(flat_idx.shape[0], n_cells,
                                              window, chunk_rows,
                                              must_divide=n_cells)
    # is_stable=False everywhere a deposit consumes the sort: stability
    # costs XLA an implicit index tiebreaker operand (measured on the
    # chip at 134M keys: 442 ms stable vs 237 ms unstable; weighted pair
    # 647 vs 439 ms) and the windowed one-hot accumulate is
    # order-independent within equal keys.
    if weights is None:
        keys = jax.lax.sort(flat_idx, is_stable=False)
        return deposit_sorted(keys, None, n_cells, window=window,
                              interpret=interpret, chunk_rows=chunk_rows)
    keys, vals = jax.lax.sort(
        (flat_idx, weights.reshape(-1).astype(jnp.float32)), num_keys=1,
        is_stable=False)
    return deposit_sorted(keys, vals, n_cells, window=window,
                          interpret=interpret, chunk_rows=chunk_rows)
