"""Masked per-bin reduction of pair-tile channels by one-hot matmul.

THE shared binning core of the blocked O(N^2) pair estimators (tpcf,
pairwise velocities, kSZ momentum, catalog shear): histogramming tile
values into radial/bin channels. jax.ops.segment_sum lowers to a
sort-based scatter on TPU — measured 104 Mpairs/s; building the one-hot
(chunk, nbins) selector and contracting on the MXU instead runs the
same reduction at 2.0 Gpairs/s (20x; block/precision-insensitive).

Precision: the dot runs at Precision.HIGHEST so f32 channel values are
NOT truncated to bf16 by the MXU default (the 1e-3 relerr trap of
CLAUDE.md); measured cost of HIGHEST vs DEFAULT here: none (the op is
bandwidth-bound on the one-hot build).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_bin_reduce"]


def masked_bin_reduce(chans, binidx, nbins: int, chunk: int = 65536):
    """sum of chans[c, i] over i with binidx[i] == b, for each (c, b).

    Args:
      chans: (C, n) float32 values (masked-out entries must already be
        zero AND carry binidx == nbins).
      binidx: (n,) int32 in [0, nbins]; nbins is the drop bucket.
      nbins: number of live bins.
      chunk: flattened-pair chunk size bounding the materialized one-hot
        at chunk x nbins floats.

    Returns (C, nbins) float32 sums.
    """
    chans = jnp.asarray(chans)
    nch, n = chans.shape
    # bound the materialized one-hot at ~64 MB regardless of nbins: a
    # 2D-binned caller (dist_bin x vel_bin PDFs, s-mu grids) can pass
    # thousands of bins, and chunk * nbins floats is the footprint
    budget = 1 << 24
    chunk = max(1024, min(chunk, budget // max(nbins, 1)))
    sel = jnp.arange(nbins, dtype=binidx.dtype)

    def dot_chunk(v, b):
        oh = (b[:, None] == sel[None, :]).astype(jnp.float32)
        return jax.lax.dot(v, oh, precision=jax.lax.Precision.HIGHEST)

    if n <= chunk:
        return dot_chunk(chans, binidx)
    pad = (-n) % chunk
    if pad:
        chans = jnp.pad(chans, ((0, 0), (0, pad)))
        binidx = jnp.pad(binidx, (0, pad), constant_values=nbins)
    nsteps = chans.shape[1] // chunk

    def step(acc, i):
        v = jax.lax.dynamic_slice(chans, (0, i * chunk), (nch, chunk))
        b = jax.lax.dynamic_slice(binidx, (i * chunk,), (chunk,))
        return acc + dot_chunk(v, b), None

    from ..utils.jax_compat import match_vma

    zero = match_vma(jnp.zeros((nch, nbins), jnp.float32), chans)
    acc, _ = jax.lax.scan(step, zero, jnp.arange(nsteps))
    return acc
