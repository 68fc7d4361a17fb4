"""HMC sampling: exact-target recovery and Fisher consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astrild_tpu.ops.forecast import shear_fisher, tomographic_shear_cls
from astrild_tpu.ops.inference import hmc_sample, shear_log_posterior
from astrild_tpu.utils.cosmology import Cosmology


def test_hmc_recovers_correlated_gaussian():
    cov = jnp.asarray([[1.0, 0.6], [0.6, 1.0]])
    icov = jnp.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ icov @ x

    res = hmc_sample(jax.random.PRNGKey(0), logp, jnp.zeros(2),
                     n_samples=2000, n_warmup=500, n_leapfrog=12,
                     step_size=0.3)
    s = np.asarray(res.samples)
    assert 0.6 < float(res.accept_rate) <= 1.0
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.12)


def test_hmc_adapts_step_size():
    def logp(x):
        return -0.5 * jnp.sum(x * x) * 1e4  # tiny scale: eps must shrink

    res = hmc_sample(jax.random.PRNGKey(1), logp, jnp.zeros(1) + 0.01,
                     n_samples=200, n_warmup=300, n_leapfrog=8,
                     step_size=0.5)
    assert float(res.step_size) < 0.1
    assert float(res.accept_rate) > 0.5


@pytest.mark.slow
def test_shear_posterior_centers_on_truth_and_matches_fisher():
    ells = jnp.asarray(np.geomspace(100, 800, 5), jnp.float32)
    truth = {"Om0": 0.3089, "sigma8": 0.8159}
    stack = tomographic_shear_cls(ells, Cosmology(**truth), [1.0], nchi=48)
    logp, names = shear_log_posterior(
        ells, stack, [1.0], ["sigma8"], fsky=0.3, nchi=48,
        prior_bounds={"sigma8": (0.6, 1.0)})
    assert names == ["sigma8"]
    # likelihood peaks at the truth (data generated there, zero scatter)
    assert float(logp(jnp.array([0.8159]))) > float(logp(jnp.array([0.9])))

    fish = shear_fisher(ells, {"sigma8": 0.8159}, [1.0], fsky=0.3, nchi=48,
                        fixed={"Om0": 0.3089})
    sigma_fisher = float(fish["marginalized"][0])
    res = hmc_sample(jax.random.PRNGKey(2), logp, jnp.array([0.79]),
                     n_samples=400, n_warmup=150, n_leapfrog=8,
                     step_size=0.01,
                     inv_mass=jnp.array([sigma_fisher ** 2]))
    s = np.asarray(res.samples)[:, 0]
    assert abs(s.mean() - 0.8159) < 3.0 * sigma_fisher
    # posterior width consistent with the Fisher forecast
    assert 0.5 < s.std() / sigma_fisher < 2.0


@pytest.mark.slow
def test_threex2pt_log_posterior():
    import jax
    import jax.numpy as jnp
    from astrild_tpu.ops.angular_power import smail_nz
    from astrild_tpu.ops.forecast import threex2pt_mean_builder
    from astrild_tpu.ops.inference import threex2pt_log_posterior

    zt = np.linspace(0.01, 3.0, 100)
    nz = (zt, np.asarray(smail_nz(zt, z0=0.64)))
    rp = np.array([2.0, 5.0, 10.0])
    hod_fixed = {"sigma_logm": 0.3, "log_m0": 12.0, "log_m1": 13.5,
                 "alpha": 1.0}
    mean_fn, th, _ = threex2pt_mean_builder(
        rp, rp, 128, 5.0, nz, 60.0, 6, 3.0, 100.0, 0.0, 128, 32, True,
        {}, hod_fixed)
    truth = {"Om0": 0.3, "sigma8": 0.8, "log_mmin": 12.5}
    data = np.asarray(mean_fn(truth))
    cov = np.diag((0.05 * np.abs(data) + 1e-8) ** 2)
    logp, names = threex2pt_log_posterior(
        data, cov, list(truth), rp, rp, 128, 5.0, nz, nbins_xi=6,
        theta_min_arcmin=3.0, theta_max_arcmin=100.0, nell=128, nchi=32,
        hod_fixed=hod_fixed, prior_bounds={"Om0": (0.1, 0.6)})
    assert names == ["Om0", "sigma8", "log_mmin"]
    x0 = jnp.asarray([0.3, 0.8, 12.5])
    l0 = float(logp(x0))
    assert abs(l0) < 1e-6  # exact at the truth (data == mean)
    assert float(logp(jnp.asarray([0.32, 0.8, 12.5]))) < l0 - 1.0
    g = np.asarray(jax.grad(logp)(jnp.asarray([0.31, 0.81, 12.55])))
    assert np.all(np.isfinite(g))
    # JIT the posterior: grad tracing leaves constants concrete but jit
    # lifts them to tracers — the regression class the FFTLog host-grid
    # fix targets is only visible under jit (hmc_sample's mode)
    lj = float(jax.jit(logp)(x0))
    assert abs(lj - l0) < 1e-5
    # box prior barrier dominates outside the bounds
    assert float(logp(jnp.asarray([0.05, 0.8, 12.5]))) < -1e3
    # size-mismatch guard
    import pytest
    with pytest.raises(ValueError, match="sizes differ"):
        threex2pt_log_posterior(data[:-1], cov, list(truth), rp, rp,
                                128, 5.0, nz, nbins_xi=6,
                                theta_min_arcmin=3.0,
                                theta_max_arcmin=100.0, nell=128,
                                nchi=32, hod_fixed=hod_fixed)
    # mutually consistent data/cov that mismatch the MODEL binning
    with pytest.raises(ValueError, match="sizes differ"):
        threex2pt_log_posterior(data[:-2], cov[:-2, :-2], list(truth),
                                rp, rp, 128, 5.0, nz, nbins_xi=6,
                                theta_min_arcmin=3.0,
                                theta_max_arcmin=100.0, nell=128,
                                nchi=32, hod_fixed=hod_fixed)
    # rank-deficient covariance raises loudly (jnp cholesky would NaN)
    bad = np.ones_like(cov) * 1e-6
    with pytest.raises(ValueError, match="positive definite"):
        threex2pt_log_posterior(data, bad, list(truth), rp, rp, 128,
                                5.0, nz, nbins_xi=6,
                                theta_min_arcmin=3.0,
                                theta_max_arcmin=100.0, nell=128,
                                nchi=32, hod_fixed=hod_fixed)
