"""BAO acoustic-scale fitting (ops/bao): no-wiggle broadband, damped
wiggle template, and profile-likelihood alpha extraction.

The reference measured P(k)/2PCF but had no BAO template fit (its BAO
chain ends at power_spectrum_3d.py); this pins the native one against
exact synthetic recovery, pull calibration, and a measured GRF.
"""
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import bao
from astrild_tpu.ops import linear_power as LP
from astrild_tpu.ops import power as P
from astrild_tpu.utils.cosmology import Cosmology

COSMO = Cosmology()


def test_nowiggle_is_smooth_broadband_match():
    k = np.geomspace(1e-3, 3.0, 400)
    o = bao.wiggle_ratio(k, COSMO)
    # broadband matches: log-mean ~ 0 over 3.5 decades
    assert abs(np.mean(np.log(o))) < 0.02
    # wiggles exist in the BAO band ...
    band = (k > 0.05) & (k < 0.3)
    assert 0.03 < np.abs(o[band] - 1.0).max() < 0.15
    # ... and are Silk-damped away at high k
    assert np.abs(o[k > 1.5] - 1.0).max() < 0.03
    # the no-wiggle transfer is monotonically decreasing (no acoustic
    # structure of its own)
    t_nw = np.asarray(LP.eh98_transfer_nowiggle(k, COSMO))
    assert np.all(np.diff(t_nw) < 0)


def test_nowiggle_power_normalization_consistent():
    # same amplitude convention: P_nw / P_lin ~ 1 broadband at z=0 and
    # the growth factor scales both identically
    k = np.geomspace(1e-3, 1.0, 200)
    r0 = (np.asarray(LP.linear_power_nowiggle(k, COSMO))
          / np.asarray(LP.linear_power(k, COSMO)))
    r1 = (np.asarray(LP.linear_power_nowiggle(k, COSMO, z=1.0))
          / np.asarray(LP.linear_power(k, COSMO, z=1.0)))
    npt.assert_allclose(r0, r1, rtol=1e-5)
    assert abs(np.mean(np.log(r0))) < 0.02


def test_template_noise_free_recovery_is_exact():
    k = np.linspace(0.02, 0.3, 56)
    truth = (1.8 * bao.bao_template_power(k, COSMO, alpha=1.05,
                                          sigma_nl=8.0)
             + 300.0 / k - 50.0)
    fit = bao.fit_bao_scale(k, truth, COSMO, sigma_nl=8.0)
    assert abs(fit.alpha - 1.05) < 5e-4
    assert abs(fit.bias2 - 1.8) < 5e-3
    npt.assert_allclose(fit.model, truth[(k >= 0.02) & (k <= 0.3)],
                        rtol=1e-4)


def test_alpha_null_on_undilated_template():
    k = np.linspace(0.02, 0.3, 56)
    data = 1.0 * bao.bao_template_power(k, COSMO, alpha=1.0,
                                        sigma_nl=8.0)
    fit = bao.fit_bao_scale(k, data, COSMO, sigma_nl=8.0)
    assert abs(fit.alpha - 1.0) < 2e-4
    assert fit.chi2 < 1e-2  # model family contains the data exactly


def test_pull_distribution_calibrated():
    """alpha error bar from the delta-chi2 curvature: ensemble pulls
    must be ~N(0, 1) (20 realizations -> mean within 0.7, std in
    [0.6, 1.5])."""
    k = np.linspace(0.02, 0.3, 56)
    truth = (1.8 * bao.bao_template_power(k, COSMO, alpha=1.05,
                                          sigma_nl=8.0)
             + 300.0 / k - 50.0)
    sig = 0.01 * np.abs(truth)
    pulls = []
    for s in range(20):
        rng = np.random.default_rng(s)
        d = truth + rng.normal(size=k.size) * sig
        f = bao.fit_bao_scale(k, d, COSMO, sigma=sig, sigma_nl=8.0)
        pulls.append((f.alpha - 1.05) / f.alpha_err)
    pulls = np.array(pulls)
    assert abs(pulls.mean()) < 0.7
    assert 0.6 < pulls.std() < 1.5


def test_diagonal_cov_equals_sigma_path():
    k = np.linspace(0.02, 0.3, 40)
    rng = np.random.default_rng(3)
    truth = 1.5 * bao.bao_template_power(k, COSMO, alpha=0.97,
                                         sigma_nl=6.0) + 100.0
    sig = 0.02 * np.abs(truth)
    d = truth + rng.normal(size=k.size) * sig
    f1 = bao.fit_bao_scale(k, d, COSMO, sigma=sig, sigma_nl=6.0)
    f2 = bao.fit_bao_scale(k, d, COSMO, cov=np.diag(sig ** 2),
                           sigma_nl=6.0)
    npt.assert_allclose(f1.alpha, f2.alpha, atol=1e-6)
    npt.assert_allclose(f1.chi2, f2.chi2, rtol=1e-8)


def test_edge_minimum_raises():
    k = np.linspace(0.02, 0.3, 56)
    data = bao.bao_template_power(k, COSMO, alpha=1.15, sigma_nl=4.0)
    with pytest.raises(ValueError, match="grid edge"):
        bao.fit_bao_scale(k, data, COSMO, sigma_nl=4.0,
                          alphas=np.linspace(0.92, 1.08, 161))


def test_argument_validation():
    k = np.linspace(0.02, 0.3, 30)
    d = np.ones_like(k)
    with pytest.raises(ValueError, match="not both"):
        bao.fit_bao_scale(k, d, COSMO, sigma=np.ones_like(k),
                          cov=np.eye(k.size))
    with pytest.raises(ValueError, match="bins"):
        bao.fit_bao_scale(k, d, COSMO, kmin=0.28, kmax=0.30)


@pytest.mark.slow
def test_grf_end_to_end_alpha_unity():
    """Exact-modulus GRF with the full wiggly linear P(k) -> auto_power
    -> fit: alpha = 1 to a few per mille (binning discreteness is the
    only residual; exact moduli remove sample variance)."""
    NG, BOX = 128, 1000.0
    rng = np.random.default_rng(5)
    white = rng.normal(size=(NG, NG, NG))
    modes = np.fft.rfftn(white)
    phases = modes / np.maximum(np.abs(modes), 1e-300)
    kf = 2 * np.pi / BOX
    f = np.fft.fftfreq(NG) * NG
    fz = np.fft.rfftfreq(NG) * NG
    m2 = (f[:, None, None] ** 2 + f[None, :, None] ** 2
          + fz[None, None, :] ** 2)
    kk = np.sqrt(m2) * kf
    p3d = np.asarray(LP.linear_power(
        jnp.asarray(np.maximum(kk, 1e-4).ravel(), jnp.float32),
        COSMO)).reshape(kk.shape).astype(np.float64)
    p3d[0, 0, 0] = 0.0
    field = np.fft.irfftn(phases * np.sqrt(p3d / BOX ** 3) * NG ** 3,
                          s=(NG,) * 3, axes=(0, 1, 2))
    res = P.auto_power(jnp.asarray(1.0 + field, jnp.float32), BOX,
                       nbins=48)
    fit = bao.fit_bao_scale(np.asarray(res.k), np.asarray(res.power),
                            COSMO, sigma_nl=1e-3, kmin=0.02, kmax=0.30)
    assert abs(fit.alpha - 1.0) < 5e-3, fit.alpha
    # and a deliberately dilated field must NOT fit alpha = 1: rebuild
    # with the wiggle pattern shifted by 4% (swap O(k) -> O(k/1.04)
    # per mode via a dense 1D table)
    k1d = np.linspace(1e-4, kk.max() + 0.1, 8192)
    o1d = bao.wiggle_ratio(k1d, COSMO)
    o3d = np.interp(kk, k1d, o1d)
    o_shift = np.interp(kk / 1.04, k1d, o1d)
    p_shift = np.where(p3d > 0, p3d / np.maximum(o3d, 1e-12) * o_shift,
                       0.0)
    field2 = np.fft.irfftn(
        phases * np.sqrt(p_shift / BOX ** 3) * NG ** 3,
        s=(NG,) * 3, axes=(0, 1, 2))
    res2 = P.auto_power(jnp.asarray(1.0 + field2, jnp.float32), BOX,
                        nbins=48)
    fit2 = bao.fit_bao_scale(np.asarray(res2.k),
                             np.asarray(res2.power), COSMO,
                             sigma_nl=1e-3, kmin=0.02, kmax=0.30)
    assert abs(fit2.alpha - 1.04) < 7e-3, fit2.alpha


def _aniso_multipoles_trapz(k, cosmo, apar, aperp, beta=0.4,
                            spar=10.0, sperp=6.0, nmu=2001):
    """Independent truth: AP-dilated Kaiser-damped template multipoles
    by dense trapezoid mu integration (the module uses Gauss-Legendre
    and table interpolation — different quadrature, different code
    path)."""
    mu = np.linspace(0.0, 1.0, nmu)
    f = apar / aperp
    fac = np.sqrt(1.0 + mu ** 2 * (1.0 / f ** 2 - 1.0))
    kp = k[:, None] / aperp * fac[None, :]
    mup2 = (mu ** 2 / f ** 2) / (1.0 + mu ** 2 * (1.0 / f ** 2 - 1.0))
    o = bao.wiggle_ratio(kp.ravel(), cosmo).reshape(kp.shape)
    pnw = np.asarray(LP.linear_power_nowiggle(
        kp.ravel().astype(np.float64), cosmo), np.float64
    ).reshape(kp.shape)
    damp = np.exp(-0.5 * kp ** 2 * (mup2 * spar ** 2
                                    + (1 - mup2) * sperp ** 2)[None, :])
    pkmu = (1.0 + beta * mup2[None, :]) ** 2 * pnw \
        * (1.0 + (o - 1.0) * damp)
    p0 = np.trapezoid(pkmu, mu, axis=1)
    leg2 = 0.5 * (3 * mu ** 2 - 1)
    p2 = 5.0 * np.trapezoid(pkmu * leg2[None, :], mu, axis=1)
    return np.stack([p0, p2])


def test_aniso_noise_free_recovery():
    k = np.linspace(0.02, 0.3, 56)
    truth = 1.6 * _aniso_multipoles_trapz(k, COSMO, 1.05, 0.97)
    truth[0] += 200.0 / k
    truth[1] += -30.0
    fit = bao.fit_bao_scale_aniso(k, truth, COSMO, beta=0.4)
    assert abs(fit.alpha_par - 1.05) < 3e-3, fit.alpha_par
    assert abs(fit.alpha_perp - 0.97) < 3e-3, fit.alpha_perp
    assert abs(fit.bias2 - 1.6) < 0.05
    # model reproduces the data it was fit to
    kfmask = (k >= 0.02) & (k <= 0.3)
    npt.assert_allclose(fit.model, truth[:, kfmask], rtol=2e-2)


def test_aniso_isotropic_limit():
    k = np.linspace(0.02, 0.3, 56)
    truth = _aniso_multipoles_trapz(k, COSMO, 1.03, 1.03)
    fit = bao.fit_bao_scale_aniso(k, truth, COSMO, beta=0.4)
    assert abs(fit.alpha_par - 1.03) < 4e-3
    assert abs(fit.alpha_perp - 1.03) < 4e-3


def test_aniso_validation():
    k = np.linspace(0.02, 0.3, 30)
    p = np.ones((2, 30))
    with pytest.raises(ValueError, match="shape"):
        bao.fit_bao_scale_aniso(k, p[:1], COSMO)
    with pytest.raises(ValueError, match="grid edge"):
        truth = _aniso_multipoles_trapz(
            np.linspace(0.02, 0.3, 56), COSMO, 1.25, 1.0, spar=4.0,
            sperp=4.0)
        bao.fit_bao_scale_aniso(np.linspace(0.02, 0.3, 56), truth,
                                COSMO, beta=0.4, sigma_par=4.0,
                                sigma_perp=4.0)
