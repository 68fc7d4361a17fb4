"""Peak detection on flat-sky maps: local maxima, SNR, edge trimming.

TPU-native replacement for lenstools ConvergenceMap.locatePeaks as used by
the reference's TunnelsFinder.find_peaks
(/root/reference/src/astrild/rays/voids/tunnel.py:44-156) and Dipoles.from_sky
(rays/dipole_finder.py:78-132): local maxima via 8-neighbour comparison,
fixed-size top-K catalogs (static shapes for jit), SNR = value/std(map),
and removal of peaks within one smoothing length of the map edge.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["PeakCatalog", "local_maxima", "find_peaks", "peak_counts",
           "candidate_topk"]


class PeakCatalog(NamedTuple):
    """Fixed-capacity peak list; entries [n:] are padding (value -inf)."""

    pos: jnp.ndarray     # (K, 2) pixel coordinates (row, col)
    values: jnp.ndarray  # (K,)
    snr: jnp.ndarray     # (K,)
    n: jnp.ndarray       # scalar int: number of valid peaks


def local_maxima(img):
    """Boolean mask of strict local maxima over the 8-neighbourhood."""
    neg_inf = jnp.array(-jnp.inf, img.dtype)
    padded = jnp.pad(img, 1, constant_values=neg_inf)
    m = jnp.ones_like(img, dtype=bool)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            nb = padded[1 + di:1 + di + img.shape[0],
                        1 + dj:1 + dj + img.shape[1]]
            m = m & (img > nb)
    return m


def candidate_topk(score2d, k: int):
    """top_k over a strict-local-maximum candidate score map.

    score2d holds -inf everywhere except at strict 8-neighbourhood local
    maxima. Two such candidates can never be adjacent (each would need
    to exceed the other), so every 2x2 block holds AT MOST ONE finite
    entry — a 2x2 max-pool is lossless, and the top_k runs on a 4x
    smaller array (the top_k sort is the dominant cost of peak/void
    candidate extraction at 2048^2: measured 51 ms for
    local_maxima+top_k on the v5e). Winner pixel positions are
    recovered exactly by comparing the 4 source pixels per winning
    block (the other 3 are -inf or strictly smaller).

    Falls back to plain top_k for odd sizes / tiny maps.
    Returns (vals, flat_idx) with the same VALUES as lax.top_k on
    score2d.ravel(); the order of EXACTLY-tied candidates follows their
    2x2-block index rather than lax.top_k's pixel index (ties are real
    in distance transforms — equal integer squared distances — so a tie
    straddling the capacity boundary may keep a different member than
    the fallback path would).
    """
    n = score2d.shape[-1]
    if n % 2 or k > (n // 2) ** 2 or n < 512:
        return jax.lax.top_k(score2d.reshape(-1), k)
    half = n // 2
    rowmax = jnp.max(score2d.reshape(half, 2, n), axis=1)
    colmax = jnp.maximum(rowmax[:, 0::2], rowmax[:, 1::2])  # (half, half)
    vals, bidx = jax.lax.top_k(colmax.reshape(-1), k)
    bi = bidx // half
    bj = bidx - bi * half
    base = (2 * bi) * n + 2 * bj
    cand = jnp.stack([base, base + 1, base + n, base + n + 1])  # (4, k)
    cvals = score2d.reshape(-1)[cand]
    which = jnp.argmax(cvals, axis=0)
    idx = jnp.take_along_axis(cand, which[None, :], axis=0)[0]
    return vals, idx


@partial(jax.jit, static_argnames=("max_peaks", "edge_pix"))
def find_peaks(img, threshold=-jnp.inf, max_peaks: int = 1024,
               edge_pix: int = 0, sigma: Optional[float] = None):
    """Find local maxima above `threshold`, sorted by value (desc).

    Args:
      img: (n, n) map.
      threshold: minimum peak value (the reference's threshold ladder
        bottom, tunnel.py:87-99).
      max_peaks: static catalog capacity.
      edge_pix: drop peaks within this many pixels of the border
        (tunnel.py:121-156, one smoothing length).
      sigma: noise level for SNR; defaults to std(img)
        (tunnel.py:101-119).

    Returns PeakCatalog with padded entries at -inf.
    """
    n = img.shape[-1]
    mask = local_maxima(img) & (img >= threshold)
    if edge_pix:
        r = jnp.arange(n)
        inside = ((r >= edge_pix) & (r < n - edge_pix))
        mask = mask & inside[:, None] & inside[None, :]
    score = jnp.where(mask, img, -jnp.inf)
    vals, idx = candidate_topk(score, max_peaks)
    pos = jnp.stack([idx // n, idx % n], axis=-1)
    count = jnp.sum(vals > -jnp.inf)
    std = jnp.std(img) if sigma is None else sigma
    snr = vals / std
    return PeakCatalog(pos=pos, values=vals, snr=snr, n=count)


@partial(jax.jit, static_argnames=("nbins", "edge_pix"))
def peak_counts(img, vmin, vmax, nbins: int = 50, edge_pix: int = 0):
    """Histogram of local-maximum heights (WL peak-count statistic;
    reference SkyArray.peak_counts via lenstools, sky_array.py:435-473).

    Returns (bin_centers, counts).
    """
    n = img.shape[-1]
    mask = local_maxima(img)
    if edge_pix:
        r = jnp.arange(n)
        inside = ((r >= edge_pix) & (r < n - edge_pix))
        mask = mask & inside[:, None] & inside[None, :]
    vals = img.reshape(-1)
    maskf = mask.reshape(-1)
    edges = jnp.linspace(vmin, vmax, nbins + 1)
    binidx = jnp.clip(jnp.searchsorted(edges, vals, side="right") - 1,
                      0, nbins - 1)
    w = (maskf & (vals >= vmin) & (vals <= vmax)).astype(jnp.float32)
    counts = jax.ops.segment_sum(w, binidx, num_segments=nbins)
    centers = 0.5 * (edges[1:] + edges[:-1])
    return centers, counts
