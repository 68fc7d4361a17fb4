"""Density-split statistics and counts-in-cells.

Quantile-split clustering (Gruen+16 troughs generalized to 3D; the
DSC estimator of Paillas+ 2023, arXiv:2309.16541 in spirit): smooth the
density field, rank query points by their local smoothed density, split
into quantiles, and measure the stacked tracer profile around each
quantile. The lowest quantile reproduces void-like profiles without a
void finder; the highest traces superclusters. The reference's closest
surface is the 2D trough machinery (rays/utils/troughs.py:32-112) — the
3D, field-level version did not exist there.

Also: counts-in-cells PDFs and their first moments (the 3D sibling of
SkyArray.pdf, sky_array.py:428).

All estimators are jit-compiled; smoothing is spectral (one rfftn +
one irfftn), quantile assignment is a sort-free searchsorted on the
sorted per-point densities, and profiles delegate to
ops.profiles3d.radial_density_profiles (single home).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .voids3d import _kmag_r, _tophat

__all__ = ["smooth_density", "lattice_query_points", "density_at_points",
           "density_quantile_labels", "density_split_profiles",
           "counts_in_cells", "counts_in_cells_moments", "marked_power"]


@partial(jax.jit, static_argnames=("kind",))
def smooth_density(delta, boxsize, radius, kind: str = "tophat"):
    """Spectrally smoothed density contrast (periodic).

    kind='tophat': spherical top-hat of radius R (the DSC convention);
    kind='gauss': Gaussian of width R.
    """
    ngrid = delta.shape[-1]
    dk = jnp.fft.rfftn(delta)
    kf = 2.0 * jnp.pi / boxsize
    kr = _kmag_r(ngrid) * kf * radius
    w = _tophat(kr) if kind == "tophat" else jnp.exp(-0.5 * kr ** 2)
    return jnp.fft.irfftn(dk * w, (ngrid,) * 3)


def lattice_query_points(n_side: int, boxsize):
    """(n_side^3, 3) cell-centered query lattice (DSC uses randoms or a
    lattice; a lattice is deterministic and XLA-friendly)."""
    cell = boxsize / n_side
    x = (jnp.arange(n_side, dtype=jnp.float32) + 0.5) * cell
    g = jnp.meshgrid(x, x, x, indexing="ij")
    return jnp.stack([c.reshape(-1) for c in g], axis=-1)


@jax.jit
def density_at_points(field, boxsize, points):
    """Trilinear (CIC) interpolation of a periodic grid at points.

    points: (n, 3) array or a tuple of flat (x, y, z) buffers — prefer
    the tuple at large n (a resident (n, 3) array pads its 3-wide minor
    dim to 128 lanes, CLAUDE.md).
    """
    ngrid = field.shape[-1]
    cell = boxsize / ngrid
    if isinstance(points, (tuple, list)):
        comps = tuple(jnp.asarray(c).reshape(-1) for c in points)
    else:
        comps = (points[:, 0], points[:, 1], points[:, 2])
    u = [c / cell - 0.5 for c in comps]
    i0 = [jnp.floor(c).astype(jnp.int32) for c in u]
    f = [u[a] - i0[a] for a in range(3)]
    out = jnp.zeros(comps[0].shape[0], field.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[0], 1 - f[0])
                     * jnp.where(dy, f[1], 1 - f[1])
                     * jnp.where(dz, f[2], 1 - f[2]))
                idx = ((i0[0] + dx) % ngrid,
                       (i0[1] + dy) % ngrid,
                       (i0[2] + dz) % ngrid)
                out = out + w * field[idx]
    return out


@partial(jax.jit, static_argnames=("n_quantiles",))
def density_quantile_labels(values, n_quantiles: int = 5):
    """Quantile label (0 = least dense) per point, equal-count split.

    Ties are broken by position in the sorted order, so counts per
    quantile differ by at most 1 even for heavily tied inputs.
    """
    n = values.shape[0]
    order = jnp.argsort(values)
    ranks = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return (ranks * n_quantiles // n).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_quantiles", "nbins", "n_query"))
def density_split_profiles(delta, boxsize, tracer_pos, smooth_radius,
                           n_quantiles: int = 5, n_query: int = 16,
                           r_min=None, r_max=None, nbins: int = 12):
    """Stacked tracer overdensity profiles around density quantiles.

    Args:
      delta: (n, n, n) density contrast used for the environment split
        (typically painted from the same tracers, or from matter).
      tracer_pos: (nt, 3) tracer positions for the profile measurement.
      smooth_radius: top-hat smoothing radius [Mpc/h] of the split field.
      n_query: query lattice side (n_query^3 points, equal-count split).

    Returns (r_centers (nbins,), profiles (n_quantiles, nbins)): stacked
    delta_tracer(r | quantile).
    """
    from .profiles3d import radial_density_profiles

    ngrid = delta.shape[-1]
    sm = smooth_density(delta, boxsize, smooth_radius)
    q = lattice_query_points(n_query, boxsize)
    d_q = density_at_points(sm, boxsize, q)
    labels = density_quantile_labels(d_q, n_quantiles)

    r_lo = boxsize / ngrid if r_min is None else r_min
    r_hi = boxsize / 4.0 if r_max is None else r_max
    # profiles around EVERY query point, then segment-mean by label.
    # radial_density_profiles vmaps over centers, materializing
    # (centers, nt, 3) — chunk the query lattice so the intermediate
    # stays ~<= 1 GB at production tracer counts
    nt = tracer_pos.shape[0]
    nq3 = q.shape[0]
    block = max(1, min(nq3, (1 << 28) // max(3 * nt, 1)))
    nblk = -(-nq3 // block)
    qp = jnp.pad(q, ((0, nblk * block - nq3), (0, 0)))
    ones = jnp.ones(nt)

    def one_block(qb):
        return radial_density_profiles(tracer_pos, ones, qb, r_lo, r_hi,
                                       nbins=nbins, boxsize=boxsize)[1]

    rho = jax.lax.map(one_block, qp.reshape(nblk, block, 3))
    rho = rho.reshape(nblk * block, nbins)[:nq3]
    r = radial_density_profiles(tracer_pos[:1], ones[:1], q[:1], r_lo,
                                r_hi, nbins=nbins, boxsize=boxsize)[0]
    nbar = tracer_pos.shape[0] / boxsize ** 3
    prof = rho / nbar - 1.0
    sums = jax.ops.segment_sum(prof, labels, num_segments=n_quantiles)
    cnts = jax.ops.segment_sum(jnp.ones_like(labels, jnp.float32), labels,
                               num_segments=n_quantiles)
    return r, sums / jnp.maximum(cnts[:, None], 1.0)


@partial(jax.jit, static_argnames=("n_cells", "max_count"))
def counts_in_cells(pos, boxsize, n_cells: int, max_count: int = 64):
    """P(N) histogram of tracer counts in a cubic-cell partition.

    pos: (n, 3) or flat-component tuple. Returns (pdf (max_count+1,),
    counts_grid (n_cells^3,)): the normalized count PDF (last entry
    accumulates overflow) and the per-cell counts.
    """
    if isinstance(pos, (tuple, list)):
        x, y, z = (jnp.asarray(c).reshape(-1) for c in pos)
    else:
        pos = jnp.asarray(pos)
        x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    cell = boxsize / n_cells
    # periodic wrap (matches ops.paint): a coordinate at exactly L (the
    # f32 `% L` hazard) must land in cell 0, not pile onto the last cell
    ix = jnp.floor(x / cell).astype(jnp.int32) % n_cells
    iy = jnp.floor(y / cell).astype(jnp.int32) % n_cells
    iz = jnp.floor(z / cell).astype(jnp.int32) % n_cells
    flat = (ix * n_cells + iy) * n_cells + iz
    counts = jax.ops.segment_sum(jnp.ones_like(flat, jnp.float32), flat,
                                 num_segments=n_cells ** 3)
    c = jnp.clip(counts.astype(jnp.int32), 0, max_count)
    pdf = jax.ops.segment_sum(
        jnp.ones_like(c, jnp.float32), c,
        num_segments=max_count + 1) / float(n_cells ** 3)
    return pdf, counts


def counts_in_cells_moments(counts):
    """(mean, variance, skewness) of per-cell counts; for a Poisson
    sample variance == mean and the reduced skewness ~ 1/sqrt(mean)."""
    c = jnp.asarray(counts, jnp.float32)
    mu = jnp.mean(c)
    var = jnp.var(c)
    m3 = jnp.mean((c - mu) ** 3)
    skew = m3 / jnp.maximum(var, 1e-30) ** 1.5
    return mu, var, skew


def marked_power(pos, ngrid: int, boxsize, smooth_radius,
                 mark_p: float = 1.0, mark_delta_s: float = 0.25,
                 nbins: int = 0, window: str = "cic",
                 kind: str = "tophat"):
    """Marked (density-weighted) power spectrum (White 2016,
    arXiv:1609.08632 Eq. 3):

        m(x) = [(1 + delta_s) / (1 + delta_s + delta_R(x))]^p

    with delta_R the smoothed density at each tracer. p > 0 up-weights
    underdense environments — the mark turns the plain P(k) into a
    statistic carrying void-region information (a modified-gravity
    discriminant). p = 0 reduces exactly to the unmarked P(k).

    Returns (PowerResult, marks).
    """
    from .paint import paint as _paint
    from .power import PowerResult, auto_power

    if isinstance(pos, (tuple, list)):
        comps = tuple(jnp.asarray(c).reshape(-1) for c in pos)
    else:
        arr = jnp.asarray(pos)
        comps = (arr[:, 0], arr[:, 1], arr[:, 2])
    counts = _paint(comps, ngrid, boxsize, window=window)
    delta = counts / jnp.mean(counts) - 1.0
    sm = smooth_density(delta, boxsize, smooth_radius, kind=kind)
    d_r = density_at_points(sm, boxsize, comps)  # flat comps: no (N,3)
    marks = ((1.0 + mark_delta_s)
             / (1.0 + mark_delta_s + jnp.maximum(
                 d_r, -mark_delta_s - 0.999))) ** mark_p
    grid = _paint(comps, ngrid, boxsize, weights=marks, window=window)
    # weighted discrete-tracer shot noise (same convention as
    # ops.power.auto_power_fast / parallel._weighted_shotnoise)
    shot = (boxsize ** 3 * jnp.sum(marks ** 2)
            / jnp.maximum(jnp.sum(marks), 1e-30) ** 2)
    res = auto_power(grid, boxsize, nbins=nbins, window=window,
                     shotnoise=shot)
    return res, marks
