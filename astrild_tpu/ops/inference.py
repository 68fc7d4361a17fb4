"""Gradient-based posterior sampling over the differentiable theory stack.

The reference stopped at point estimates: its spectra came from CLASS/CAMB
black boxes, so parameter inference needed external samplers with
finite-difference or gradient-free moves.  Here the whole likelihood chain
(Cosmology -> P(k) -> Limber C_ell -> Gaussian bandpower likelihood,
ops/forecast.py) is differentiable, so Hamiltonian Monte Carlo runs as ONE
jitted lax.scan — gradients by autodiff, thousands of leapfrog steps per
second on device, no per-sample Python.

Surfaces:
  hmc_sample          — plain HMC with diagonal mass + warmup step-size
                        adaptation (dual averaging), all inside jit
  shear_log_posterior — Gaussian bandpower log-likelihood factory over
                        the tomographic shear stack
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hmc_sample", "HMCResult", "shear_log_posterior",
           "threex2pt_log_posterior"]


class HMCResult(NamedTuple):
    samples: jnp.ndarray       # (n_samples, ndim)
    log_prob: jnp.ndarray      # (n_samples,)
    accept_rate: jnp.ndarray   # scalar
    step_size: jnp.ndarray     # adapted scalar


def _leapfrog(logp_grad, x, p, eps, n_steps, inv_mass):
    def body(_, carry):
        x, p = carry
        p = p + 0.5 * eps * logp_grad(x)
        x = x + eps * inv_mass * p
        p = p + 0.5 * eps * logp_grad(x)
        return (x, p)
    return jax.lax.fori_loop(0, n_steps, body, (x, p))


@partial(jax.jit, static_argnames=("logp_fn", "n_samples", "n_warmup",
                                   "n_leapfrog"))
def hmc_sample(key, logp_fn: Callable, x0, n_samples: int = 500,
               n_warmup: int = 200, n_leapfrog: int = 16,
               step_size: float = 0.1, inv_mass=None,
               target_accept: float = 0.8) -> HMCResult:
    """Hamiltonian Monte Carlo with dual-averaging step-size warmup.

    Args:
      key: PRNG key.
      logp_fn: differentiable log-density R^ndim -> scalar (closures over
        data are fine; it is traced once).
      x0: (ndim,) start point.
      n_samples: kept samples (post-warmup).
      n_warmup: adaptation steps (discarded).
      n_leapfrog: leapfrog steps per proposal.
      step_size: initial step size (adapted during warmup).
      inv_mass: (ndim,) diagonal inverse mass (posterior scale^2 guess —
        e.g. Fisher variances); identity if None.

    Returns HMCResult; `accept_rate` is the post-warmup average.
    """
    x0 = jnp.asarray(x0, jnp.float32)
    ndim = x0.shape[0]
    inv_mass = (jnp.ones((ndim,), jnp.float32) if inv_mass is None
                else jnp.asarray(inv_mass, jnp.float32))
    grad = jax.grad(logp_fn)

    # dual averaging (Hoffman & Gelman 2014, Alg. 5 constants)
    mu = jnp.log(10.0 * step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def step(carry, inp):
        x, lp, eps, hbar, log_eps_bar, it = carry
        k, in_warmup = inp
        kp, ku = jax.random.split(k)
        p = jax.random.normal(kp, (ndim,)) / jnp.sqrt(inv_mass)
        x_new, p_new = _leapfrog(grad, x, p, eps, n_leapfrog, inv_mass)
        lp_new = logp_fn(x_new)
        h0 = lp - 0.5 * jnp.sum(inv_mass * p * p)
        h1 = lp_new - 0.5 * jnp.sum(inv_mass * p_new * p_new)
        log_alpha = jnp.minimum(0.0, h1 - h0)
        log_alpha = jnp.where(jnp.isfinite(log_alpha), log_alpha, -jnp.inf)
        accept = jnp.log(jax.random.uniform(ku)) < log_alpha
        x = jnp.where(accept, x_new, x)
        lp = jnp.where(accept, lp_new, lp)

        # dual averaging on the acceptance statistic (warmup only)
        it_w = it + 1.0
        hbar_new = ((1.0 - 1.0 / (it_w + t0)) * hbar
                    + (target_accept - jnp.exp(log_alpha)) / (it_w + t0))
        log_eps = mu - jnp.sqrt(it_w) / gamma * hbar_new
        w = it_w ** (-kappa)
        log_eps_bar_new = w * log_eps + (1.0 - w) * log_eps_bar
        eps = jnp.where(in_warmup, jnp.exp(log_eps), jnp.exp(log_eps_bar))
        hbar = jnp.where(in_warmup, hbar_new, hbar)
        log_eps_bar = jnp.where(in_warmup, log_eps_bar_new, log_eps_bar)
        it = jnp.where(in_warmup, it_w, it)
        return ((x, lp, eps, hbar, log_eps_bar, it),
                (x, lp, accept.astype(jnp.float32)))

    total = n_warmup + n_samples
    keys = jax.random.split(key, total)
    in_warmup = jnp.arange(total) < n_warmup
    carry0 = (x0, logp_fn(x0), jnp.asarray(step_size, jnp.float32),
              jnp.asarray(0.0), jnp.log(jnp.asarray(step_size)),
              jnp.asarray(0.0))
    carry, (xs, lps, acc) = jax.lax.scan(step, carry0, (keys, in_warmup))
    return HMCResult(samples=xs[n_warmup:], log_prob=lps[n_warmup:],
                     accept_rate=jnp.mean(acc[n_warmup:]),
                     step_size=carry[2])


def shear_log_posterior(ells, data_stack, z_sources: Sequence[float],
                        param_names: Sequence[str], fsky: float = 0.5,
                        delta_ell=None, ngal_per_arcmin2: float = 30.0,
                        sigma_eps: float = 0.26, nchi: int = 64,
                        nonlinear: bool = False,
                        fixed: Dict[str, float] = None,
                        prior_bounds: Dict[str, tuple] = None):
    """Gaussian bandpower log-posterior over tomographic shear spectra.

    The covariance is fixed at the DATA spectra (standard Gaussian
    bandpower approximation); flat priors via `prior_bounds`
    {name: (lo, hi)} as smooth log-barriers outside the box.

    Returns logp(x) with x ordered as param_names — feed to hmc_sample.
    """
    from ..utils.cosmology import Cosmology
    from .forecast import (_pair_index, shear_cl_data_covariance,
                           tomographic_shear_cls)

    ells = jnp.asarray(ells, jnp.float32)
    if delta_ell is None:
        e = np.asarray(ells, np.float64)
        gaps = np.diff(e)
        delta_ell = jnp.asarray(
            np.concatenate([gaps[:1], 0.5 * (gaps[1:] + gaps[:-1]),
                            gaps[-1:]]).astype(np.float32))
    nb = len(z_sources)
    nbar_sr = (ngal_per_arcmin2 / nb) / (np.deg2rad(1.0 / 60.0) ** 2)
    noise = jnp.full((nb,), sigma_eps ** 2 / nbar_sr, jnp.float32)
    fixed = dict(fixed or {})
    names = list(param_names)
    bounds = dict(prior_bounds or {})
    pairs = _pair_index(nb)

    data_stack = jnp.asarray(data_stack)
    cov = shear_cl_data_covariance(data_stack, ells, fsky=fsky,
                                   delta_ell=delta_ell, noise_cl=noise)
    cov_chol = jnp.linalg.cholesky(cov)
    data_vec = jnp.stack([data_stack[i, j] for (i, j) in pairs], axis=-1)

    def logp(x):
        p = {k: x[i] for i, k in enumerate(names)}
        stack = tomographic_shear_cls(ells, Cosmology(**{**fixed, **p}),
                                      z_sources, nchi=nchi,
                                      nonlinear=nonlinear)
        mu = jnp.stack([stack[i, j] for (i, j) in pairs], axis=-1)
        r = jax.scipy.linalg.cho_solve((cov_chol, True), mu - data_vec)
        ll = -0.5 * jnp.sum((mu - data_vec) * r)
        for i, k in enumerate(names):
            if k in bounds:
                lo, hi = bounds[k]
                w = 0.005 * (hi - lo)
                ll = ll - jnp.exp((lo - x[i]) / w) - jnp.exp((x[i] - hi) / w)
        return ll

    return logp, names


def threex2pt_log_posterior(data_vec, cov, param_names: Sequence[str],
                            rp_wp, rp_ds, npix: int,
                            opening_angle_deg: float, nz,
                            pi_max: float = 60.0, nbins_xi: int = 12,
                            theta_min_arcmin: float = 2.0,
                            theta_max_arcmin=None, z_lens: float = 0.0,
                            nell: int = 256, nchi: int = 48,
                            nonlinear: bool = True,
                            fixed: Dict[str, float] = None,
                            hod_fixed: Dict[str, float] = None,
                            prior_bounds: Dict[str, tuple] = None):
    """Gaussian log-posterior over the joint 3x2pt data vector
    [wp(rp); Delta Sigma(rp); xi_+(theta); xi_-(theta)] — the sampling
    counterpart of forecast.threex2pt_fisher, sharing its mean model
    (forecast.threex2pt_mean_builder: one differentiable chain over
    Cosmology + Zheng+07 occupation + NLA nuisance keys).

    Args:
      data_vec: measured joint vector (wp, DS, xi+ and xi- at the
        estimator's own bin centers — forecast result['theta_arcmin']).
      cov: full (ndata, ndata) covariance (e.g. the block assembly of
        threex2pt_fisher, or a joint jackknife for cross-probe terms).
      param_names: sampled keys, mixing Cosmology / HOD / IA names.
      prior_bounds: {name: (lo, hi)} smooth log-barrier box priors.
    Returns (logp, names) with logp(x) ordered as param_names — feed
    to hmc_sample (same contract as shear_log_posterior).
    """
    from .forecast import threex2pt_mean_builder

    fixed = dict(fixed or {})
    hod_fixed = dict(hod_fixed or {})
    if theta_max_arcmin is None:
        theta_max_arcmin = opening_angle_deg * 30.0
    mean_fn, theta_arcmin, _ = threex2pt_mean_builder(
        rp_wp, rp_ds, npix, opening_angle_deg, nz, pi_max, nbins_xi,
        theta_min_arcmin, theta_max_arcmin, z_lens, nell, nchi,
        nonlinear, fixed, hod_fixed)
    names = list(param_names)
    bounds = dict(prior_bounds or {})
    data_vec = jnp.asarray(data_vec, jnp.float32)
    # validate BEFORE the O(n^3) factorization, and against the MODEL
    # length the builder determined (data/cov can be mutually
    # consistent yet mismatch the binning this posterior will predict)
    n_model = (np.atleast_1d(rp_wp).shape[0]
               + np.atleast_1d(rp_ds).shape[0]
               + 2 * np.asarray(theta_arcmin).shape[0])
    cov = np.asarray(cov, np.float64)
    if not (data_vec.shape[0] == cov.shape[0] == n_model):
        raise ValueError(
            f"3x2pt sizes differ: data {data_vec.shape[0]}, covariance "
            f"{cov.shape[0]}, model {n_model} (wp "
            f"{np.atleast_1d(rp_wp).shape[0]} + DS "
            f"{np.atleast_1d(rp_ds).shape[0]} + xi "
            f"{2 * np.asarray(theta_arcmin).shape[0]})")
    # HOST cholesky: jnp's returns silent NaNs for a rank-deficient
    # covariance (e.g. a jackknife with fewer regions than data
    # entries), which would surface only as accept_rate == 0
    try:
        cov_chol = jnp.asarray(np.linalg.cholesky(cov), jnp.float32)
    except np.linalg.LinAlgError as e:
        raise ValueError(
            "3x2pt covariance is not positive definite (rank-deficient "
            "jackknife? fewer resamples than data entries?)") from e

    def logp(x):
        p = {k: x[i] for i, k in enumerate(names)}
        mu = mean_fn(p)
        r = jax.scipy.linalg.cho_solve((cov_chol, True), mu - data_vec)
        ll = -0.5 * jnp.sum((mu - data_vec) * r)
        for i, k in enumerate(names):
            if k in bounds:
                lo, hi = bounds[k]
                w = 0.005 * (hi - lo)
                # same smooth exp log-barrier as shear_log_posterior
                ll = ll - jnp.exp((lo - x[i]) / w) - jnp.exp((x[i] - hi) / w)
        return ll

    return logp, names
