"""Statistics toolbox: histograms/PDFs, bootstrap, percentiles, least
squares, PCA.

Port of /root/reference/src/astrild/rays/voids/tunnels/analysis.py:18-817,
dropping its dead scipy.weave paths (SURVEY.md §2) and vectorizing with
JAX where batch use matters.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pdf_1d", "cumulative", "bootstrap_statistic", "percentiles",
           "least_squares_fit", "pca", "covariance_from_realizations",
           "nonlinear_least_squares", "contour_value",
           "direction_correlation", "point_density_2d",
           "distribution_percentile", "general_least_squares",
           "correlation_matrix"]


def distribution_percentile(x, y, qs=(25.0, 75.0)):
    """X values where the normalized cumulative sum of Y crosses each
    percentile, linearly interpolated between samples
    (analysis.py:366-383 DistributionPercentile).
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    cum = np.cumsum(y)
    cum = cum / cum[-1]
    return [float(np.interp(q / 100.0, cum, x)) for q in np.atleast_1d(qs)]


def general_least_squares(Xs, y, weights=None):
    """Weighted linear least squares over an arbitrary basis
    (analysis.py:479-517 LeastSquare_general): Xs is a sequence of
    basis columns evaluated at the data points; fits y = sum a_i Xs[i].

    Returns (a, a_error, chi2_reduced, n_points) — parameter errors from
    the normal-matrix inverse scaled by the reduced chi-square.
    """
    A = np.stack([np.asarray(c, np.float64).ravel() for c in Xs], axis=-1)
    y = np.asarray(y, np.float64).ravel()
    w = (np.ones_like(y) if weights is None
         else np.broadcast_to(np.asarray(weights, np.float64), y.shape))
    M = A.T @ (w[:, None] * A)
    V = A.T @ (w * y)
    Minv = np.linalg.inv(M)
    a = Minv @ V
    resid = y - A @ a
    ndof = max(y.size - a.size, 1)
    chi2 = float((w * resid ** 2).sum() / ndof)
    a_err = np.sqrt(chi2 * np.diag(Minv))
    return a, a_err, chi2, y.size


def correlation_matrix(data, n_boot: int = 100, min_rows: int = 5,
                       seed: int = 0):
    """Column correlation matrix + bootstrap standard error
    (analysis.py:385-407 CorrelationMatrix). With fewer than min_rows
    samples the error estimate is meaningless and the correlation is
    returned for both (the reference convention).
    """
    data = np.asarray(data, np.float64)
    if data.ndim != 2:
        raise ValueError("correlation_matrix needs a 2D (samples, "
                         f"columns) array, got {data.ndim}D")
    corr = np.corrcoef(data, rowvar=False)
    if data.shape[0] < min_rows:
        return corr, corr
    rng = np.random.default_rng(seed)
    reps = np.stack([
        np.corrcoef(data[rng.integers(0, data.shape[0], data.shape[0])],
                    rowvar=False)
        for _ in range(n_boot)])
    return corr, reps.std(axis=0)


def pdf_1d(values, nbins: int, vrange=None, density: bool = True):
    """Histogram/PDF with bin centers (analysis.py histogram helpers)."""
    values = np.asarray(values)
    hist, edges = np.histogram(values, bins=nbins, range=vrange,
                               density=density)
    return 0.5 * (edges[1:] + edges[:-1]), hist


def cumulative(values, nbins: int, vrange=None, reverse: bool = True):
    """(Reverse-)cumulative counts (N(>x) if reverse)."""
    centers, hist = pdf_1d(values, nbins, vrange, density=False)
    cum = np.cumsum(hist[::-1])[::-1] if reverse else np.cumsum(hist)
    return centers, cum


@partial(jax.jit, static_argnames=("n_boot", "statistic"))
def bootstrap_statistic(values, key, n_boot: int = 1000,
                        statistic: str = "mean",
                        lo: float = 16.0, hi: float = 84.0):
    """Bootstrap confidence band of mean/median over axis 0."""
    n = values.shape[0]

    def one(k):
        idx = jax.random.randint(k, (n,), 0, n)
        sample = values[idx]
        if statistic == "median":
            return jnp.median(sample, axis=0)
        return jnp.mean(sample, axis=0)

    stats = jax.vmap(one)(jax.random.split(key, n_boot))
    return (jnp.percentile(stats, lo, axis=0),
            jnp.percentile(stats, 50.0, axis=0),
            jnp.percentile(stats, hi, axis=0))


def percentiles(values, qs=(16, 50, 84), axis=0):
    return jnp.percentile(jnp.asarray(values), jnp.asarray(qs), axis=axis)


def least_squares_fit(x, y, degree: int = 1, weights=None):
    """Weighted polynomial least squares; returns coefficients
    (highest power first, np.polyfit convention)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    w = jnp.ones_like(x) if weights is None else jnp.asarray(weights)
    A = jnp.stack([x ** (degree - i) for i in range(degree + 1)], axis=-1)
    Aw = A * w[:, None]
    yw = y * w
    coef, *_ = jnp.linalg.lstsq(Aw, yw, rcond=None)
    return coef


def pca(data, n_components: int = None):
    """PCA of (nsamples, nfeatures): returns (components, explained_var,
    mean) — replaces the reference's sklearn usage in a form usable on
    device."""
    data = jnp.asarray(data)
    mean = jnp.mean(data, axis=0)
    x = data - mean
    u, s, vt = jnp.linalg.svd(x, full_matrices=False)
    var = s ** 2 / (data.shape[0] - 1)
    if n_components is not None:
        vt = vt[:n_components]
        var = var[:n_components]
    return vt, var, mean


def covariance_from_realizations(samples, correlation: bool = False):
    """Covariance (or correlation) matrix over realizations.

    samples: (n_real, nbin) statistic per realization (e.g. a vmapped
    P(k) batch). The unbiased estimator with 1/(n-1); use with
    ops/mocks realizations for covariance work (capability beyond the
    reference).
    """
    x = jnp.asarray(samples)
    mean = jnp.mean(x, axis=0)
    d = x - mean
    cov = d.T @ d / (x.shape[0] - 1)
    if correlation:
        s = jnp.sqrt(jnp.diag(cov))
        cov = cov / jnp.outer(s, s)
    return cov


def nonlinear_least_squares(fn, x, y, p0, n_steps: int = 100,
                            rel_tol: float = 1e-8, damping: float = 1e-3):
    """Nonlinear least squares by Levenberg-Marquardt with AD Jacobians.

    Counterpart of the reference's Gauss-Newton LeastSquare_nonlinearFit
    (tunnels/analysis.py:637-667), which required the caller to supply
    one derivative function per parameter — here the Jacobian comes from
    jax.jacfwd, and a Levenberg damping term keeps poor initial guesses
    from diverging (the reference's plain normal-equation step does).

    Args:
      fn: model, fn(x, params) -> (n,) predictions (JAX-traceable).
      p0: initial parameter guess (p,).
    Returns (params, sum_sq_residual, converged).
    """
    x = jnp.asarray(x)
    y_np = np.asarray(y, np.float64)
    params = np.asarray(p0, np.float64).copy()

    jac = jax.jit(jax.jacfwd(lambda p: fn(x, p)))
    model = jax.jit(lambda p: fn(x, p))

    def ssq(p):
        return float(np.sum((y_np - np.asarray(model(jnp.asarray(
            p, jnp.float32)), np.float64)) ** 2))

    lam = float(damping)
    best = ssq(params)
    converged = False
    for _ in range(n_steps):
        p32 = jnp.asarray(params, jnp.float32)
        r = y_np - np.asarray(model(p32), np.float64)
        J = np.asarray(jac(p32), np.float64)
        JtJ = J.T @ J
        g = J.T @ r
        step_ok = False
        for _try in range(8):
            A = JtJ + lam * np.diag(np.maximum(np.diag(JtJ), 1e-12))
            try:
                dp = np.linalg.solve(A, g)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            new = ssq(params + dp)
            if new <= best:
                params = params + dp
                best = new
                lam = max(lam * 0.3, 1e-12)
                step_ok = True
                break
            lam *= 10.0
        if not step_ok:
            break
        denom = np.maximum(np.abs(params), 1e-30)
        if np.max(np.abs(dp) / denom) < rel_tol:
            converged = True
            break
    return params, best, converged


def contour_value(data, enclosed_fractions):
    """Iso-value thresholds enclosing a given fraction of the total mass.

    Counterpart of tunnels/analysis.py FindContourValue, computed
    EXACTLY (sort + cumulative sum) instead of through the reference's
    1000-bin histogram approximation: returns, for each fraction f, the
    largest value t such that sum(data[data >= t]) >= f * sum(data).
    Used to draw contours enclosing f of the probability mass of a 2D
    density map.
    """
    flat = np.asarray(data, np.float64).ravel()
    if (flat < 0).any():
        raise ValueError("contour_value needs a non-negative density map")
    order = np.argsort(flat)[::-1]
    sorted_vals = flat[order]
    cum = np.cumsum(sorted_vals)
    total = cum[-1]
    if total <= 0:
        raise ValueError("contour_value: map has zero total mass")
    fr = np.atleast_1d(np.asarray(enclosed_fractions, np.float64))
    idx = np.searchsorted(cum / total, fr, side="left")
    idx = np.minimum(idx, flat.size - 1)
    return sorted_vals[idx]


def direction_correlation(cos_theta, nbins: int = 10, n_random: int = 1000,
                          seed: int = 0):
    """Alignment statistic: |cos theta| histogram vs the isotropic MC.

    Counterpart of tunnels/analysis.py dataCorrelation_direction +
    randomCorrelation_direction: histogram the measured |cos| of the
    angle between object orientations (e.g. halo shape axis vs void
    direction) over [0, 1], and compare with the Monte-Carlo mean/std of
    the same-size isotropic sample (|cos| uniform on [0, 1] for random
    3D directions).

    Returns (hist, random_mean, random_std), each (nbins,).
    """
    c = np.abs(np.asarray(cos_theta, np.float64))
    hist, _ = np.histogram(c, bins=nbins, range=(0.0, 1.0))
    rng = np.random.default_rng(seed)
    edges = np.linspace(0.0, 1.0, nbins + 1)
    # accumulate moments per realization: O(n) peak memory instead of the
    # (n_random, n) matrix (8 GB at n=1e6, n_random=1000)
    s1 = np.zeros(nbins)
    s2 = np.zeros(nbins)
    for _ in range(n_random):
        rh = np.histogram(rng.uniform(0.0, 1.0, size=c.size),
                          bins=edges)[0].astype(np.float64)
        s1 += rh
        s2 += rh * rh
    mean = s1 / n_random
    var = np.maximum(s2 / n_random - mean * mean, 0.0)
    return hist, mean, np.sqrt(var)


def point_density_2d(x, y, nbins=(10, 10), x_range=None, y_range=None,
                     log_bins: bool = False):
    """2D point density with linear or logarithmic bins.

    Counterpart of tunnels/analysis.py PointDistribution (whose body was
    scipy.weave-dead C). Returns (x_centers, y_centers, density) with
    density = counts / (N * bin_area) so it integrates to 1.
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if x_range is None:
        x_range = (x.min(), x.max())
    if y_range is None:
        y_range = (y.min(), y.max())
    if log_bins:
        if min(x_range[0], y_range[0]) <= 0:
            raise ValueError("log bins need positive ranges")
        xe = np.logspace(np.log10(x_range[0]), np.log10(x_range[1]),
                         nbins[0] + 1)
        ye = np.logspace(np.log10(y_range[0]), np.log10(y_range[1]),
                         nbins[1] + 1)
    else:
        xe = np.linspace(*x_range, nbins[0] + 1)
        ye = np.linspace(*y_range, nbins[1] + 1)
    counts, _, _ = np.histogram2d(x, y, bins=(xe, ye))
    area = np.outer(np.diff(xe), np.diff(ye))
    dens = counts / max(x.size, 1) / area
    return 0.5 * (xe[1:] + xe[:-1]), 0.5 * (ye[1:] + ye[:-1]), dens
