"""Halo-model nonlinear P(k): limits, consistency with halofit, profile
Fourier transform."""
import jax.numpy as jnp
import numpy as np
import pytest
import numpy.testing as npt

from astrild_tpu.ops import halo_model as HM
from astrild_tpu.ops import linear_power as LP
from astrild_tpu.utils.cosmology import Cosmology

COSMO = Cosmology()


def test_nfw_u_limits():
    k = jnp.asarray([1e-4, 0.01, 0.1, 1.0, 10.0, 100.0])
    u = np.asarray(HM.nfw_u(k, jnp.asarray([5.0, 10.0]),
                            jnp.asarray([1.0, 2.0])))
    # k -> 0: exactly 1 (self-normalized quadrature)
    npt.assert_allclose(u[:, 0], 1.0, rtol=1e-5)
    # monotone decay toward 0 at high k
    assert np.all(np.diff(u, axis=1) < 1e-6)
    assert np.all(u[:, -1] < 0.05)
    # analytic cross-check of the mass normalization: compare against a
    # brute-force numpy quadrature at one (c, k)
    c, rv, kk = 7.0, 1.5, 3.0
    x = np.linspace(1e-6, c, 400_000)
    rs = rv / c
    num = np.trapezoid(x / (1 + x) ** 2 * np.sinc(kk * rs * x / np.pi), x)
    den = np.log(1 + c) - c / (1 + c)
    u1 = float(HM.nfw_u(jnp.asarray([kk]), jnp.asarray([c]),
                        jnp.asarray([rv]))[0, 0])
    npt.assert_allclose(u1, num / den, rtol=2e-3)


def test_sheth_tormen_bias_monotone_and_crosses_unity():
    nu = jnp.linspace(0.3, 5.0, 50)
    b = np.asarray(HM.sheth_tormen_bias(nu))
    assert np.all(np.diff(b) > 0)
    assert b[0] < 1.0 < b[-1]


@pytest.mark.slow
def test_two_halo_reduces_to_linear_at_large_scales():
    k = jnp.asarray([1e-3, 3e-3, 1e-2])
    p1, p2, pt = HM.halo_model_power(k, COSMO)
    pl = np.asarray(LP.linear_power(k, COSMO))
    npt.assert_allclose(np.asarray(p2), pl, rtol=0.05)


def test_total_tracks_halofit_within_halo_model_accuracy():
    k = jnp.asarray(np.logspace(-2, 1, 16))
    _, _, pt = HM.halo_model_power(k, COSMO)
    pnl = np.asarray(LP.nonlinear_power(k, COSMO))
    ratio = np.asarray(pt) / pnl
    # vanilla halo model is known-good to ~30% against halofit
    assert np.all(ratio > 0.65) and np.all(ratio < 1.35), ratio
    # and the nonlinear boost over linear is large at small scales
    pl = np.asarray(LP.linear_power(k, COSMO))
    assert np.asarray(pt)[-1] > 10.0 * pl[-1]


def test_redshift_evolution():
    k = jnp.asarray([0.5, 2.0])
    _, _, p0 = HM.halo_model_power(k, COSMO, z=0.0)
    _, _, p1 = HM.halo_model_power(k, COSMO, z=1.0)
    assert np.all(np.asarray(p1) < np.asarray(p0))


def test_model_layer_nonlinear_dispatch():
    from astrild_tpu.models.power import LinearPowerSpectrum

    lin = LinearPowerSpectrum()
    k = np.asarray([0.1, 1.0])
    ph = lin.P_nl(k, method="halofit")
    pm = lin.P_nl(k, method="halomodel")
    pl = lin.P_dd(k)
    assert ph[1] > pl[1] and pm[1] > pl[1]
    import pytest

    with pytest.raises(ValueError):
        lin.P_nl(k, method="nope")


def test_hod_galaxy_power_limits():
    from astrild_tpu.ops.halo_model import hod_galaxy_power
    from astrild_tpu.ops.hod import HODParams, zheng07_mean_occupation
    from astrild_tpu.ops.halo_stats import theory_hmf
    from astrild_tpu.ops.linear_power import linear_power, normalization
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    k = jnp.asarray(np.geomspace(1e-3, 10.0, 24))
    params = HODParams(log_mmin=12.5, sigma_logm=0.3, log_m0=12.0,
                       log_m1=13.5, alpha=1.0)
    p1h, p2h, ptot, n_g, b_g = hod_galaxy_power(k, cosmo, params)
    p1h = np.asarray(p1h); p2h = np.asarray(p2h)
    assert float(n_g) > 0 and np.isfinite(float(b_g))
    assert float(b_g) > 1.0     # Mmin ~ 3e12 galaxies are biased tracers
    # k->0: u->1, so P_2h -> b_g^2 P_lin
    amp = normalization(cosmo)
    plin0 = float(linear_power(k[:1], cosmo, amplitude=amp)[0])
    np.testing.assert_allclose(p2h[0], float(b_g) ** 2 * plin0, rtol=1e-3)
    # 1-halo term dominates at high k, 2-halo at low k
    assert p1h[0] < p2h[0]
    assert p1h[-1] > p2h[-1]
    # n_g against a float64 brute-force of the same integrand
    lnm = np.linspace(np.log(1e10), np.log(1e16), 64)
    m = np.exp(lnm)
    n_lnm = np.asarray(theory_hmf(jnp.asarray(m), cosmo))
    nc, ns = zheng07_mean_occupation(jnp.asarray(m), params)
    ng_ref = np.sum(n_lnm * (np.asarray(nc) + np.asarray(ns))) \
        * (lnm[1] - lnm[0])
    np.testing.assert_allclose(float(n_g), ng_ref, rtol=1e-4)


def test_hod_galaxy_bias_decreases_with_mmin():
    from astrild_tpu.ops.halo_model import hod_galaxy_power
    from astrild_tpu.ops.hod import HODParams
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    k = jnp.asarray([0.01])
    biases = []
    for lm in (12.0, 12.8, 13.5):
        p = HODParams(log_mmin=lm, sigma_logm=0.3, log_m0=lm - 0.5,
                      log_m1=lm + 1.0, alpha=1.0)
        *_, b_g = hod_galaxy_power(k, cosmo, p)
        biases.append(float(b_g))
    assert biases[0] < biases[1] < biases[2]


@pytest.mark.slow
def test_hod_galaxy_matter_power_and_delta_sigma():
    import jax
    from astrild_tpu.ops.halo_model import (delta_sigma_hod,
                                            halo_model_power,
                                            hod_galaxy_matter_power,
                                            hod_galaxy_power)
    from astrild_tpu.ops.hod import HODParams
    from astrild_tpu.ops.linear_power import linear_power
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    k = jnp.asarray(np.geomspace(1e-3, 50.0, 128), jnp.float32)
    p1, p2, pt, ng, bg = hod_galaxy_matter_power(k, cosmo)
    pl = linear_power(k, cosmo)
    # 2h limit: exactly b_g P_lin at k -> 0 (mass-consistency a_corr)
    assert abs(float(p2[0] / (bg * pl[0])) - 1.0) < 2e-3
    # bias factorization: P_gm,2h == sqrt(P_gg,2h P_mm,2h) in the 2h
    # regime (same b_eff/matter factors on both sides)
    _, pg2, _, _, _ = hod_galaxy_power(k, cosmo)
    _, pm2, _ = halo_model_power(k, cosmo, mmin=1e10)
    i = 5  # k ~ 1e-2: compare the 2h TERMS (the total also carries the
    # constant 1h floor, ~5% here)
    assert abs(float(p2[i] / jnp.sqrt(pg2[i] * pm2[i])) - 1.0) < 0.02
    # 1h term positive and dominating at small scales
    assert float(p1[-1]) > float(p2[-1])

    rp = np.array([0.1, 0.5, 2.0, 10.0])
    ds = np.asarray(delta_sigma_hod(rp, cosmo))
    assert np.all(ds > 0)
    assert ds[0] > ds[1] > ds[2] > ds[3]  # decreasing with rp

    # differentiable in the occupation parameters (GGL fitting)
    def ds2(log_mmin):
        p = HODParams(log_mmin=log_mmin)
        return jnp.sum(delta_sigma_hod(np.array([5.0]), cosmo,
                                       hod_params=p, nk=128))

    g = jax.grad(ds2)(12.0)
    assert np.isfinite(float(g)) and float(g) > 0  # heavier hosts -> more lensing


def test_nfw_delta_sigma_closed_form():
    from scipy.integrate import quad

    from astrild_tpu.ops.halo_model import nfw_delta_sigma
    from astrild_tpu.utils.constants import RHO_CRIT0

    om, m200, c = 0.3089, 2e14, 5.0
    rho_m = om * RHO_CRIT0
    r200 = (3 * m200 / (4 * np.pi * 200 * rho_m)) ** (1 / 3)
    rs = r200 / c
    dc = (200 / 3) * c ** 3 / (np.log(1 + c) - c / (1 + c))
    rho0 = dc * rho_m

    def rho(rr):
        return rho0 / ((rr / rs) * (1 + rr / rs) ** 2)

    def sigma(R):
        return 2 * quad(lambda zz: rho(np.hypot(R, zz)), 0, np.inf,
                        limit=400)[0]

    def sbar(R):
        return 2 * quad(lambda rp: rp * sigma(rp), 1e-6, R,
                        limit=400)[0] / R ** 2

    radii = np.array([0.1, rs, 0.5, 1.5])  # spans x < 1, = 1, > 1
    ds = np.asarray(nfw_delta_sigma(radii, m200, c, omega_m=om))
    for i, Rv in enumerate(radii):
        ds_num = (sbar(Rv) - sigma(Rv)) * 1e-12
        assert abs(ds[i] / ds_num - 1.0) < 1e-4
    # decreasing profile, positive everywhere
    assert np.all(ds > 0) and np.all(np.diff(ds) < 0)


def test_nfw_delta_sigma_near_rs_band():
    """Regression: f32 cancellation within ~1% of x = R/r_s = 1 gave up
    to 44% error with the old 1e-4 branch window."""
    from astrild_tpu.ops.halo_model import nfw_delta_sigma
    from astrild_tpu.utils.constants import RHO_CRIT0

    om, m200, c = 0.3089, 2e14, 5.0
    rho_m = om * RHO_CRIT0
    r200 = (3 * m200 / (4 * np.pi * 200 * rho_m)) ** (1 / 3)
    rs = r200 / c

    def g64(x):
        x = np.asarray(x, np.float64)
        g = np.empty_like(x)
        lt = x < 1
        xl = x[lt]
        athl = np.arctanh(np.sqrt((1 - xl) / (1 + xl)))
        sl = np.sqrt(1 - xl ** 2)
        g[lt] = (8 * athl / (xl ** 2 * sl) + 4 / xl ** 2 * np.log(xl / 2)
                 - 2 / (xl ** 2 - 1) + 4 * athl / ((xl ** 2 - 1) * sl))
        xg = x[~lt]
        atng = np.arctan(np.sqrt((xg - 1) / (1 + xg)))
        sg = np.sqrt(xg ** 2 - 1)
        g[~lt] = (8 * atng / (xg ** 2 * sg)
                  + 4 / xg ** 2 * np.log(xg / 2) - 2 / (xg ** 2 - 1)
                  + 4 * atng / (xg ** 2 - 1) ** 1.5)
        return g

    dc = (200 / 3) * c ** 3 / (np.log(1 + c) - c / (1 + c))
    fac = rs * dc * rho_m * 1e-12
    xs = np.array([0.985, 0.995, 0.999, 0.9999, 1.0001, 1.0002, 1.001,
                   1.005, 1.015, 1.03])
    ds = np.asarray(nfw_delta_sigma(xs * rs, m200, c, omega_m=om))
    assert np.max(np.abs(ds / (fac * g64(xs)) - 1.0)) < 1e-4
    # exactly x = 1: the analytic value 10/3 + 4 ln(1/2)
    v1 = float(np.asarray(nfw_delta_sigma(np.array([rs]), m200, c,
                                          omega_m=om))[0])
    assert abs(v1 / (fac * (10 / 3 + 4 * np.log(0.5))) - 1.0) < 1e-5
