"""Aperture-mass statistics: theory-integral and shear-path validation."""
import numpy as np

from astrild_tpu.ops.aperture_mass import (aperture_mass_from_shear,
                                           aperture_mass_map,
                                           aperture_mass_moments,
                                           map2_theory, u_hat)


def _grf_with_cl(seed, n=512, oa_deg=10.0, smooth_arcmin=3.0, amp=1e-8):
    """Periodic GRF whose continuum Cl = amp * exp(-(ell*s)^2) exactly."""
    pix = np.deg2rad(oa_deg) / n
    fx = np.fft.fftfreq(n, d=pix) * 2 * np.pi
    fy = np.fft.rfftfreq(n, d=pix) * 2 * np.pi
    ell = np.sqrt(fx[:, None] ** 2 + fy[None, :] ** 2)
    s = np.deg2rad(smooth_arcmin / 60.0)
    cl = amp * np.exp(-(ell * s) ** 2)
    rng = np.random.default_rng(seed)
    wh = rng.standard_normal((n, n))
    kap = np.fft.irfft2(np.fft.rfft2(wh) * np.sqrt(cl) / pix, s=(n, n))
    return kap.astype(np.float32), (fx, fy, ell, s, amp)


def test_u_hat_limits():
    # compensated: U_hat(0) = 0; small-eta U_hat ~ eta^2/16
    assert u_hat(np.array([0.0]))[0] == 0.0
    eta = np.array([1e-2, 2e-2])
    np.testing.assert_allclose(u_hat(eta), eta ** 2 / 16.0, rtol=1e-3)
    # peak near eta ~ 4.25, modest amplitude
    grid = np.linspace(0.1, 20, 400)
    uh = u_hat(grid)
    assert 3.5 < grid[np.argmax(uh)] < 5.0


def test_map2_matches_theory_integral():
    kap, (fx, fy, ell, s, amp) = _grf_with_cl(0, n=512)
    mom = aperture_mass_moments(kap, 10.0, [2.0, 4.0, 8.0])
    ltab = np.linspace(1.0, float(ell.max()), 20000)
    cltab = amp * np.exp(-(ltab * s) ** 2)
    for i, th in enumerate(mom["theta_ap_arcmin"]):
        t = map2_theory(ltab, cltab, th)
        # single realization: mode-count noise at the larger apertures
        assert abs(mom["map2"][i] / t - 1.0) < 0.12, (th, mom["map2"][i], t)
    # Gaussian field: Map^3 consistent with zero
    assert np.all(np.abs(mom["skewness"]) < 0.05)


def test_shear_path_equals_kappa_path():
    kap, (fx, fy, ell, _, _) = _grf_with_cl(1, n=256)
    kh = np.fft.rfft2(kap)
    l2 = np.maximum(ell ** 2, 1e-30)
    g1 = np.fft.irfft2((fx[:, None] ** 2 - fy[None, :] ** 2) / l2 * kh,
                       s=kap.shape)
    g2 = np.fft.irfft2(2 * fx[:, None] * fy[None, :] / l2 * kh, s=kap.shape)
    a = np.asarray(aperture_mass_from_shear(g1, g2, 10.0, 4.0))
    b = np.asarray(aperture_mass_map(kap, 10.0, 4.0))
    assert np.abs(a - b).max() < 1e-4 * b.std() + 1e-12


def test_point_mass_positive_at_center():
    n = 256
    kap = np.zeros((n, n), np.float32)
    kap[n // 2, n // 2] = 1.0
    m = np.asarray(aperture_mass_map(kap, 10.0, 8.0))
    assert m[n // 2, n // 2] > 0
    # compensation: total Map integrates to ~0
    assert abs(m.sum()) < 1e-3 * abs(m).max()


def test_facade_method():
    from astrild_tpu.models.skymap import SkyArray
    kap, _ = _grf_with_cl(2, n=256)
    sky = SkyArray.from_array(kap, opening_angle=10.0, quantity="kappa_2")
    out = sky.aperture_mass(theta_ap_arcmin=4.0)
    assert out.shape == kap.shape
    mom = sky.aperture_mass_moments([2.0, 4.0])
    assert mom["map2"].shape == (2,)
