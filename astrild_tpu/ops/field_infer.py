"""Differentiable field-level inference through the PM forward model.

`jax.grad` flows end to end through white noise -> linear modes
(mocks.modes_from_white) -> 2LPT particle ICs
(nbody.lpt_catalog_from_modes) -> KDK PM evolution (nbody.pm_evolve) ->
CIC density field: the BORG-style initial-condition reconstruction
primitive that an autodiff-native framework gets for free and the
reference stack could not express at all — its forward models are the
external ECOSMOG/RayRAMSES Fortran solvers driven as black boxes
(/root/reference/src/astrild/simulation/ecosmog.py), differentiable
through nothing.

Conventions:
  * the optimization variable is the WHITENED field w (the N(0,1)
    amplitudes of the linear modes): the Gaussian prior is then the
    isotropic 0.5*|w|^2, and `modes_from_white(normal(key), ...)` makes
    inferred fields share realization conventions with every mock/IC in
    the package;
  * the posterior is the standard field-level Gaussian form
    0.5*|delta_sim(w) - data|^2/sigma^2 + 0.5*|w|^2.

Differentiability constraints (enforced by construction): every paint
in the chain — the per-step force paints inside the KDK scan AND the
final density paint — runs with deposit="scatter" (the XLA scatter has
a transpose rule; the auto-dispatched Pallas painter does not and would
break jax.grad at n >= 2^21 on TPU, exactly production scale). NGP is
NOT differentiable in positions (zero gradient a.e.) and is rejected.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from .mocks import modes_from_white
from .nbody import (_a_edges, _factors_from_edges, _pm_scan,
                    lpt_catalog_from_modes, lpt_growth)
from .paint import paint

__all__ = ["simulate_density", "field_nll", "infer_initial_field",
           "sample_initial_field"]


def _host_consts(cosmo, z_init: float, a_final: float, nsteps: int,
                 order: int, spacing: str = "loga"):
    """Everything the forward model needs from the cosmology, evaluated
    on HOST once: growth scalars, KDK factors, scalaron mass table.

    Must run OUTSIDE any jit: cosmology evaluation builds jnp constants
    that become tracers inside a trace, where float() raises (the
    CLAUDE.md tracer trap — this is exactly how the first draft of this
    module failed)."""
    d1, f1, d2, f2 = lpt_growth(cosmo, z_init, order)
    e_init = float(cosmo.efunc(z_init))
    edges = _a_edges(1.0 / (1.0 + z_init), a_final, nsteps, spacing)
    factors = np.asarray(_factors_from_edges(cosmo, edges,
                                             spacing=spacing),
                         np.float32)
    if float(getattr(cosmo, "fR0", 0.0)) != 0.0:
        am2 = np.asarray(edges ** 2 * np.asarray(
            cosmo.scalaron_mass2(edges), np.float64), np.float32)
    else:
        am2 = np.full(nsteps + 1, np.inf, np.float32)
    return ((d1, f1, d2, f2, e_init), factors, am2, float(cosmo.Om0))


def _simulate_core(white, consts, pk_fn: Callable, ngrid: int, boxsize,
                   z_init: float, window: str, order: int):
    """Pure-jax forward chain (safe to trace/differentiate): whitened
    field -> linear modes -> 2LPT ICs -> KDK PM -> CIC overdensity."""
    growth, factors, am2, om0 = consts
    dk = modes_from_white(white, ngrid, boxsize, pk_fn)
    comps, mom = lpt_catalog_from_modes(dk, ngrid, boxsize, None,
                                        z_init, order=order,
                                        growth=growth)
    comps, _ = _pm_scan(comps, mom, jnp.asarray(factors),
                        jnp.asarray(am2), ngrid, boxsize, om0, window,
                        deposit="scatter")
    grid = paint(comps, ngrid, boxsize, window=window,
                 deposit="scatter")
    return grid / jnp.mean(grid) - 1.0


def simulate_density(white, pk_fn: Callable, cosmo, *, ngrid: int,
                     boxsize, z_init: float = 9.0, nsteps: int = 3,
                     a_final: float = 1.0, window: str = "cic",
                     order: int = 2):
    """delta(x) today from a whitened initial field (differentiable).

    white: (ngrid, ngrid, ngrid) N(0,1) parameters. Returns the
    overdensity on the same ngrid^3 mesh (1:1 mesh:particle ratio — the
    force-accuracy sweet spot, see nbody._force_grids). The cosmology
    is evaluated on host per call; jitted loops should precompute
    `_host_consts` once and trace `_simulate_core` (what
    infer_initial_field does).
    """
    if window == "ngp":
        raise ValueError("NGP has zero gradient a.e.; use cic or tsc")
    consts = _host_consts(cosmo, z_init, a_final, nsteps, order)
    return _simulate_core(white, consts, pk_fn, ngrid, boxsize, z_init,
                          window, order)


def _gauss_posterior(delta, data_delta, noise_var, white):
    """0.5|delta - d|^2/sigma^2 + 0.5|w|^2 — the ONE home of the
    Gaussian field posterior (field_nll and the MAP loop share it)."""
    resid = delta - data_delta
    return (0.5 * jnp.sum(resid * resid) / noise_var
            + 0.5 * jnp.sum(white * white))


def field_nll(white, data_delta, noise_var, pk_fn: Callable, cosmo,
              *, boxsize, **sim_kwargs):
    """Negative log-posterior: 0.5|delta(w)-d|^2/sigma^2 + 0.5|w|^2.

    Convenience form that re-evaluates the cosmology on host per call;
    gradient loops should use infer_initial_field (host consts hoisted
    once) or build their own loss on `_simulate_core`."""
    ngrid = data_delta.shape[-1]
    delta = simulate_density(white, pk_fn, cosmo, ngrid=ngrid,
                             boxsize=boxsize, **sim_kwargs)
    return _gauss_posterior(delta, data_delta, noise_var, white)


def infer_initial_field(data_delta, noise_var, pk_fn: Callable, cosmo,
                        *, boxsize, n_iter: int = 200, lr: float = 0.1,
                        white0=None, key=None, z_init: float = 9.0,
                        nsteps: int = 3, a_final: float = 1.0,
                        window: str = "cic", order: int = 2):
    """Adam MAP reconstruction of the whitened initial field.

    Returns {"white": the iterate with the LOWEST measured loss (not
    necessarily the final one — high-lr runs oscillate), "loss":
    (n_iter,) history}. Pass white0 to warm-start (e.g. from a coarser
    reconstruction); otherwise starts from zeros (the prior mean) or,
    given `key`, from a prior draw. The whole optimization is ONE
    jitted lax.scan (cosmology host-precomputed once).
    """
    import optax

    if window == "ngp":
        raise ValueError("NGP has zero gradient a.e.; use cic or tsc")
    ngrid = data_delta.shape[-1]
    if white0 is None:
        white0 = (jnp.zeros((ngrid, ngrid, ngrid), jnp.float32)
                  if key is None
                  else jax.random.normal(key, (ngrid,) * 3))
    consts = _host_consts(cosmo, z_init, a_final, nsteps, order)
    data_delta = jnp.asarray(data_delta)

    def loss_fn(w):
        delta = _simulate_core(w, consts, pk_fn, ngrid, boxsize,
                               z_init, window, order)
        return _gauss_posterior(delta, data_delta, noise_var, w)

    opt = optax.adam(lr)

    @jax.jit
    def run(w0, state0):
        def step(carry, _):
            w, state, best_w, best_loss = carry
            loss, g = jax.value_and_grad(loss_fn)(w)
            better = loss < best_loss
            best_w = jnp.where(better, w, best_w)
            best_loss = jnp.where(better, loss, best_loss)
            updates, state = opt.update(g, state)
            return (optax.apply_updates(w, updates), state, best_w,
                    best_loss), loss

        return jax.lax.scan(
            step, (w0, state0, w0, jnp.asarray(jnp.inf)), None,
            length=n_iter)

    (_, _, w_best, _), losses = run(white0, opt.init(white0))
    return {"white": w_best, "loss": losses}


def sample_initial_field(key, data_delta, noise_var, pk_fn: Callable,
                         cosmo, *, boxsize, n_samples: int = 200,
                         n_warmup: int = 100, n_leapfrog: int = 8,
                         step_size: float = 0.02, white0=None,
                         z_init: float = 9.0, nsteps: int = 3,
                         a_final: float = 1.0, window: str = "cic",
                         order: int = 2):
    """Field-level posterior SAMPLING: HMC over the whitened initial
    field, gradients through the PM simulator (ops.inference.hmc_sample
    — the same NUTS-free dual-averaging HMC the parameter posteriors
    use).

    Returns (samples, accept_rate): samples (n_samples, ngrid, ngrid,
    ngrid) whitened fields. Warm-start at the MAP (pass
    infer_initial_field's "white") — from the prior mean the chain pays
    a long burn-in. The whitened parameterization doubles as the
    identity-mass preconditioning (prior = unit Gaussian), which is why
    HMC mixes at all here.
    """
    from .inference import hmc_sample

    if window == "ngp":
        raise ValueError("NGP has zero gradient a.e.; use cic or tsc")
    ngrid = data_delta.shape[-1]
    consts = _host_consts(cosmo, z_init, a_final, nsteps, order)
    data_delta = jnp.asarray(data_delta)
    if white0 is None:
        white0 = jnp.zeros((ngrid, ngrid, ngrid), jnp.float32)

    def logp(wflat):
        w = wflat.reshape((ngrid,) * 3)
        delta = _simulate_core(w, consts, pk_fn, ngrid, boxsize,
                               z_init, window, order)
        return -_gauss_posterior(delta, data_delta, noise_var, w)

    res = hmc_sample(key, logp, jnp.asarray(white0).ravel(),
                     n_samples=n_samples, n_warmup=n_warmup,
                     n_leapfrog=n_leapfrog, step_size=step_size)
    return (res.samples.reshape((n_samples, ngrid, ngrid, ngrid)),
            float(res.accept_rate))
