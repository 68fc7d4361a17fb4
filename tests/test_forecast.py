"""Fisher forecasting: exact-derivative and composition checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astrild_tpu.ops.angular_power import cl_kappa_limber
from astrild_tpu.ops.forecast import (fisher_matrix,
                                      shear_cl_data_covariance,
                                      shear_fisher, tomographic_shear_cls)
from astrild_tpu.utils.cosmology import Cosmology


@pytest.mark.slow
def test_sigma8_derivative_is_exact():
    """Linear Cl scales as sigma8^2, so dlnCl/dlnsigma8 == 2 exactly —
    pins autodiff through Cosmology construction + EH98 + Limber."""
    ells = jnp.array([100.0, 500.0, 1500.0])

    def f(s8):
        return cl_kappa_limber(ells, Cosmology(sigma8=s8), z_source=1.0,
                               nchi=64)

    cl0 = f(0.8159)
    d = jax.jacfwd(f)(0.8159)
    np.testing.assert_allclose(np.asarray(d * 0.8159 / cl0), 2.0, rtol=1e-5)


def test_fisher_matrix_linear_model_analytic():
    """For mu = A p with Gaussian cov C, F = A^T C^-1 A exactly."""
    A = np.array([[1.0, 2.0], [0.5, -1.0], [3.0, 0.3]])
    cov = np.diag([0.1, 0.2, 0.3])

    def mean(p):
        return jnp.asarray(A) @ jnp.array([p["a"], p["b"]])

    F, names = fisher_matrix(mean, {"a": 1.0, "b": 2.0}, jnp.asarray(cov))
    np.testing.assert_allclose(np.asarray(F),
                               A.T @ np.linalg.inv(cov) @ A, rtol=1e-5)
    assert names == ["a", "b"]
    # diagonal-vector covariance path agrees
    F2, _ = fisher_matrix(mean, {"a": 1.0, "b": 2.0},
                          jnp.asarray(np.diag(cov)))
    np.testing.assert_allclose(np.asarray(F2), np.asarray(F), rtol=1e-5)


def test_tomographic_stack_symmetry_and_ordering():
    cosmo = Cosmology()
    ells = jnp.array([100.0, 500.0])
    stack = tomographic_shear_cls(ells, cosmo, [0.5, 1.0], nchi=64)
    assert stack.shape == (2, 2, 2)
    np.testing.assert_allclose(np.asarray(stack[0, 1]),
                               np.asarray(stack[1, 0]))
    # deeper source bin has more lensing power
    assert float(stack[1, 1, 0]) > float(stack[0, 0, 0])
    # cross is between the autos (Cauchy-Schwarz upper bound)
    assert (float(stack[0, 1, 0]) ** 2
            <= float(stack[0, 0, 0]) * float(stack[1, 1, 0]) * 1.0001)


def test_covariance_block_structure():
    nb, nell = 2, 3
    ells = jnp.array([100.0, 300.0, 900.0])
    stack = jnp.ones((nb, nb, nell)) * jnp.array([1.0, 0.5, 0.2])
    cov = shear_cl_data_covariance(stack, ells, fsky=0.5, delta_ell=10.0)
    npair = nb * (nb + 1) // 2
    assert cov.shape == (nell, npair, npair)
    c = np.asarray(cov)
    assert np.allclose(c, np.swapaxes(c, 1, 2))
    assert np.all(np.linalg.eigvalsh(c) > -1e-12)
    # Var[C^11] = 2 (C^11)^2 / ((2l+1) fsky dl) when all entries equal
    expect = 2.0 * 1.0 / ((2 * 100.0 + 1) * 0.5 * 10.0)
    np.testing.assert_allclose(c[0, 0, 0], expect, rtol=1e-6)


@pytest.mark.slow
def test_shear_fisher_end_to_end():
    res = shear_fisher(np.geomspace(100, 1000, 6),
                       {"Om0": 0.3089, "sigma8": 0.8159},
                       z_sources=[0.8, 1.4], fsky=0.4, nchi=64)
    F = res["fisher"]
    assert res["names"] == ["Om0", "sigma8"]
    assert np.abs(F - F.T).max() <= 1e-5 * np.abs(F).max()
    assert np.all(np.linalg.eigvalsh(F) > 0)
    assert np.all(res["marginalized"] > 0)
    # marginalized errors exceed conditional errors (degeneracy)
    cond = 1.0 / np.sqrt(np.diag(F))
    assert np.all(res["marginalized"] >= cond * 0.999)


def test_cosmology_params_are_differentiable_leaves():
    """Cosmology params live in pytree leaves: grad flows through a jit
    boundary taking the cosmology as an argument."""
    @jax.jit
    def chi_at_1(cosmo):
        return cosmo.comoving_distance(1.0)

    g = jax.grad(lambda om: chi_at_1(Cosmology(Om0=om)))(0.3089)
    assert float(g) < 0.0  # more matter -> shorter distances
    # concrete-zero fast paths still taken for plain floats
    c = Cosmology()
    assert float(c.mu_k(1.0, jnp.array(0.1))) == 0.0


def test_cosmology_vmap_parameter_grid():
    """One compilation serves a whole parameter grid (leaf params)."""
    ells = jnp.array([100.0, 500.0])

    def f(om):
        return cl_kappa_limber(ells, Cosmology(Om0=om), z_source=1.0,
                               nchi=64)

    out = jax.vmap(f)(jnp.linspace(0.25, 0.35, 5))
    assert out.shape == (5, 2)
    assert bool(jnp.all(jnp.diff(out[:, 0]) > 0))  # more matter, more Cl


@pytest.mark.slow
def test_hod_wp_fisher_autodiff():
    """Exact HOD-parameter derivatives through halo model + FFTLog:
    Fisher is symmetric PSD, and dwp/dlog_m1 < 0 (raising M1 removes
    satellites and lowers clustering)."""
    import jax

    from astrild_tpu.ops.forecast import hod_wp_fisher, hod_wp_theory
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    rp = jnp.asarray([5.0, 10.0, 20.0])
    fid = {"log_mmin": 12.5, "sigma_logm": 0.3, "log_m0": 12.0,
           "log_m1": 13.5, "alpha": 1.0}
    wp0 = np.asarray(hod_wp_theory(rp, cosmo, fid, pi_max=80.0))
    assert (wp0 > 0).all()
    # directional derivative wrt log_m1
    g = jax.jacfwd(lambda x: hod_wp_theory(
        rp, cosmo, {**fid, "log_m1": x}, pi_max=80.0))(13.5)
    assert (np.asarray(g) < 0).all()
    cov = np.diag((0.05 * wp0) ** 2)
    F, names = hod_wp_fisher(rp, cosmo, fid, cov, pi_max=80.0)
    F = np.asarray(F)
    np.testing.assert_allclose(F, F.T, rtol=1e-5)
    evals = np.linalg.eigvalsh(F)
    assert (evals > -1e-6 * evals.max()).all()
    assert F[names.index("log_mmin"), names.index("log_mmin")] > 0


@pytest.mark.slow
def test_threex2pt_fisher_joint():
    import jax
    import jax.numpy as jnp
    from astrild_tpu.ops.forecast import threex2pt_fisher
    from astrild_tpu.ops.angular_power import smail_nz

    zt = np.linspace(0.01, 3.0, 120)
    rp = np.array([2.0, 5.0, 10.0, 20.0])
    cov_wp = np.diag((np.array([40.0, 15.0, 8.0, 4.0]) * 0.05) ** 2)
    cov_ds = np.diag((np.array([2.0, 1.0, 0.5, 0.2]) * 0.08) ** 2)
    kw = dict(npix=128, opening_angle_deg=5.0,
              nz=(zt, np.asarray(smail_nz(zt, z0=0.64))), nbins_xi=8,
              theta_min_arcmin=3.0, nell=192, nchi=48, n_fields=10,
              hod_fixed={"sigma_logm": 0.3, "log_m0": 12.0,
                         "log_m1": 13.5, "alpha": 1.0})
    out = threex2pt_fisher(
        {"Om0": 0.3, "sigma8": 0.8, "log_mmin": 12.5, "A_IA": 1.0},
        rp, rp, cov_wp, cov_ds, **kw)
    assert out["names"] == ["Om0", "sigma8", "log_mmin", "A_IA"]
    F = out["fisher"]
    assert np.all(np.isfinite(F))
    assert np.all(np.linalg.eigvalsh(F) > 0)
    # the joint probe beats shear alone on sigma8 (clustering+GGL break
    # the degeneracy)
    from astrild_tpu.ops.forecast import xipm_survey_fisher
    solo = xipm_survey_fisher({"Om0": 0.3, "sigma8": 0.8, "A_IA": 1.0},
                              npix=128, opening_angle_deg=5.0, nbins=8,
                              theta_min_arcmin=3.0, nell=192, nchi=48,
                              nz=(zt, np.asarray(smail_nz(zt, z0=0.64))),
                              n_fields=10)
    assert out["marginalized"][1] < solo["marginalized"][1]
    # data-vector/covariance size mismatch is loud
    import pytest
    with pytest.raises(ValueError, match="data vector"):
        threex2pt_fisher({"Om0": 0.3}, rp, rp[:2], cov_wp, cov_ds, **kw)


@pytest.mark.slow
def test_sigma_r_second_order_differentiable():
    """Regression: the top-hat window's f32 cancellation at small k*R
    made mixed second derivatives (theory_hmf through Fisher) NaN."""
    import jax
    import jax.numpy as jnp
    from astrild_tpu.ops.linear_power import sigma_r, normalization
    from astrild_tpu.utils.constants import RHO_CRIT0
    from astrild_tpu.utils.cosmology import Cosmology

    def lnsig(om, lnm):
        cosmo = Cosmology(Om0=om)
        rho = om * RHO_CRIT0
        r = (3.0 * jnp.exp(lnm) / (4 * jnp.pi * rho)) ** (1 / 3)
        return jnp.log(sigma_r(r, cosmo,
                               amplitude=normalization(cosmo)))

    lm = float(np.log(3e10))  # small halo -> small R -> tiny k*R tail
    mixed = jax.grad(lambda om: jax.grad(lnsig, argnums=1)(om, lm))(0.3)
    assert np.isfinite(float(mixed))
    # and the window fix left the value itself unchanged
    s = float(jnp.exp(lnsig(0.3, float(np.log(1e14)))))
    assert 0.5 < s < 2.0


@pytest.mark.slow
def test_xipm_fisher_dark_energy():
    """w0 flows through the Fisher chain (background tables -> growth
    -> Limber -> FFTLog) like any Cosmology kwarg."""
    from astrild_tpu.ops.forecast import xipm_survey_fisher

    out = xipm_survey_fisher({"Om0": 0.3, "sigma8": 0.8, "w0": -1.0},
                             npix=128, opening_angle_deg=5.0, nbins=8,
                             theta_min_arcmin=3.0, z_source=1.0,
                             nell=192, nchi=48, n_fields=40)
    assert out["names"] == ["Om0", "sigma8", "w0"]
    F = out["fisher"]
    assert np.all(np.isfinite(F))
    assert np.all(np.linalg.eigvalsh(F) > 0)
    assert np.all(out["marginalized"] > 0)
