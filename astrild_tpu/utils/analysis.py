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
           "least_squares_fit", "pca"]


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
