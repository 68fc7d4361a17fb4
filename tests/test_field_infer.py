"""Differentiable field-level inference (ops/field_infer): gradient
correctness against finite differences, consistency with the keyed
forward pipeline, and end-to-end MAP recovery of initial conditions —
the autodiff capability the reference's black-box Fortran forward
models (ecosmog.py) could not express."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from astrild_tpu.ops import field_infer, mocks, nbody
from astrild_tpu.utils.cosmology import Cosmology

COSMO = Cosmology(Om0=0.3, h=0.7)
BOX = 100.0


def _pk(k):
    # smooth red spectrum; amplitude giving mildly nonlinear delta
    return 2.0e3 * (k / 0.1) ** -1.5


SIM_KW = dict(z_init=9.0, nsteps=2, window="cic")


def test_keyed_pipeline_consistency():
    """simulate_density(normal(key)) must equal the lpt_catalog(key) +
    pm_evolve + paint chain (modes_from_white single home)."""
    from astrild_tpu.ops.paint import paint

    ngrid = 8
    key = jax.random.PRNGKey(3)
    white = jax.random.normal(key, (ngrid,) * 3)
    got = field_infer.simulate_density(white, _pk, COSMO, ngrid=ngrid,
                                       boxsize=BOX, **SIM_KW)
    comps, mom = nbody.lpt_catalog(key, ngrid, BOX, _pk, COSMO,
                                   z_init=9.0)
    comps, _ = nbody.pm_evolve(comps, mom, COSMO, ngrid, BOX, 0.1, 1.0,
                               2, window="cic")
    grid = paint(comps, ngrid, BOX, window="cic", deposit="scatter")
    want = grid / jnp.mean(grid) - 1.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_grad_matches_finite_differences():
    ngrid = 8
    key = jax.random.PRNGKey(0)
    white_t = jax.random.normal(key, (ngrid,) * 3)
    data = field_infer.simulate_density(white_t, _pk, COSMO,
                                        ngrid=ngrid, boxsize=BOX,
                                        **SIM_KW)
    w0 = 0.7 * white_t + 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                                 (ngrid,) * 3)

    def loss(w):
        return field_infer.field_nll(w, data, 0.05, _pk, COSMO,
                                     boxsize=BOX, **SIM_KW)

    g = np.asarray(jax.grad(loss)(w0))
    # check the 5 largest-|grad| coordinates with central differences
    flat = np.argsort(-np.abs(g.ravel()))[:5]
    eps = 3e-3
    for idx in flat:
        i, j, k2 = np.unravel_index(idx, g.shape)
        wp = w0.at[i, j, k2].add(eps)
        wm = w0.at[i, j, k2].add(-eps)
        fd = (float(loss(wp)) - float(loss(wm))) / (2 * eps)
        assert abs(fd - g[i, j, k2]) < 0.05 * abs(g[i, j, k2]) + 0.3, (
            (i, j, k2), fd, g[i, j, k2])


@pytest.mark.slow
def test_map_recovery_improves_correlation():
    """Adam MAP from the prior mean recovers the true initial field:
    loss drops and the linear-field cross-correlation reaches ~1 at
    low noise (same forward model, identifiable regime)."""
    ngrid = 16
    white_t = jax.random.normal(jax.random.PRNGKey(7), (ngrid,) * 3)
    data = field_infer.simulate_density(white_t, _pk, COSMO,
                                        ngrid=ngrid, boxsize=BOX,
                                        **SIM_KW)
    out = field_infer.infer_initial_field(data, 1e-3, _pk, COSMO,
                                          boxsize=BOX, n_iter=250,
                                          lr=0.08, **SIM_KW)
    losses = np.asarray(out["loss"])
    assert losses[-1] < 0.05 * losses[0]

    # the MAP shrinks weakly-constrained high-k whitened modes toward
    # the prior mean, so compare the LINEAR DENSITY fields (amplitude-
    # weighted — what the data actually constrains), not raw white
    def lin_field(w):
        dk = mocks.modes_from_white(jnp.asarray(w), ngrid, BOX, _pk)
        return np.asarray(jnp.real(jnp.fft.ifftn(dk))).ravel()

    r_lin = np.corrcoef(lin_field(out["white"]),
                        lin_field(white_t))[0, 1]
    assert r_lin > 0.9, r_lin
    r_white = np.corrcoef(np.asarray(out["white"]).ravel(),
                          np.asarray(white_t).ravel())[0, 1]
    assert r_white > 0.7, r_white


@pytest.mark.slow
def test_hmc_field_posterior_samples():
    """HMC over the whitened field through the simulator: healthy
    acceptance and a posterior mean that tracks the truth's linear
    field (MAP warm start, small box)."""
    ngrid = 8
    white_t = jax.random.normal(jax.random.PRNGKey(5), (ngrid,) * 3)
    data = field_infer.simulate_density(white_t, _pk, COSMO,
                                        ngrid=ngrid, boxsize=BOX,
                                        **SIM_KW)
    mp = field_infer.infer_initial_field(data, 1e-2, _pk, COSMO,
                                         boxsize=BOX, n_iter=150,
                                         lr=0.1, **SIM_KW)
    samples, acc = field_infer.sample_initial_field(
        jax.random.PRNGKey(6), data, 1e-2, _pk, COSMO, boxsize=BOX,
        n_samples=60, n_warmup=60, n_leapfrog=8,
        white0=mp["white"], **SIM_KW)
    assert samples.shape == (60, ngrid, ngrid, ngrid)
    assert 0.3 < acc <= 1.0, acc
    mean_w = jnp.mean(samples, axis=0)

    def lin(w):
        dk = mocks.modes_from_white(jnp.asarray(w), ngrid, BOX, _pk)
        return np.asarray(jnp.real(jnp.fft.ifftn(dk))).ravel()

    r = np.corrcoef(lin(mean_w), lin(white_t))[0, 1]
    assert r > 0.8, r
    # the chain actually moves (not stuck at the MAP)
    assert float(jnp.std(samples[:, 0, 0, 0])) > 1e-3
