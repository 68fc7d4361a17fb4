"""Filter-bank tests vs scipy reference implementations + goldens."""
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from scipy import ndimage

from astrild_tpu.ops import filters as F
from astrild_tpu.ops import lensing as L


@pytest.fixture(scope="module")
def dt_img():
    """The reference test_filters.py fixture: analytic halo dT map.

    halo: r200_deg=0.05, m200=7e13, c=2, Dc=1050 (*0.6774 per
    analytic_Halo_signal_to_SkyArray), npix=400 canvas, patch npix =
    2*50*20+1, direction=[0] (tests/unit/rays/utils/test_filters.py:19-46).
    """
    extent = 20
    npix_patch = int(2 * 50 * extent) + 1
    patch = L.nfw_temperature_perturbation_map(
        0.05, 7e13, 2.0, jnp.array([200.0, 200.0]), 1050 * 0.6774,
        npix=npix_patch, extent=extent, directions=(0,), suppress=True,
        suppression_r=10,
    )
    canvas = jnp.zeros((400, 400))
    return np.asarray(L.add_patch_to_map(canvas, patch, (200, 200)))


def test_fwhm_sigma_roundtrip():
    npt.assert_allclose(F.sigma_to_fwhm(F.fwhm_to_sigma(1.0)), 1.0)
    sigma = 1 / (2 * np.sqrt(2 * np.log(2)))
    npt.assert_allclose(F.sigma_to_fwhm(sigma), 1.0)


def test_gaussian_golden(dt_img):
    """Reference golden: max of 10-arcmin-FWHM-smoothed dT map = 1.665952e-8
    (tests/unit/rays/utils/test_filters.py:48-51)."""
    theta = 0.05 * 20  # deg
    out = F.gaussian(jnp.asarray(dt_img), theta, fwhm_arcmin=10.0)
    npt.assert_allclose(float(jnp.max(out)) * 1e8, 1.665952, rtol=2e-3)


def test_gaussian_golden_5arcmin(dt_img):
    theta = 0.05 * 20
    out = F.gaussian(jnp.asarray(dt_img), theta, fwhm_arcmin=5.0)
    npt.assert_allclose(float(jnp.max(out)) * 1e8, 1.901196, rtol=2e-3)


def test_gaussian_matches_ndimage(rng):
    img = rng.standard_normal((128, 128)).astype(np.float32)
    theta = 2.0  # deg -> pixel scale 2*60/128 arcmin
    sigma_arcmin = 5.0
    sigma_pix = sigma_arcmin / 60.0 * 128 / theta
    want = ndimage.gaussian_filter(img, sigma_pix, mode="wrap")
    got = np.asarray(F.gaussian(jnp.asarray(img), theta, sigma_arcmin=sigma_arcmin))
    npt.assert_allclose(got, want, atol=5e-4)


def test_high_pass_complement(rng):
    img = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    lo = F.gaussian(img, 1.0, sigma_arcmin=3.0)
    hi = F.gaussian_high_pass(img, 1.0, sigma_arcmin=3.0)
    npt.assert_allclose(np.asarray(lo + hi), np.asarray(img), atol=1e-5)


def test_gaussian_derivative_matches_ndimage(rng):
    img = rng.standard_normal((128, 128)).astype(np.float32)
    theta = 2.0
    sigma_arcmin = 8.0
    sigma_pix = sigma_arcmin / 60.0 * 128 / theta
    want = ndimage.gaussian_filter(img, sigma_pix, order=(1, 0), mode="wrap")
    got = np.asarray(F.gaussian_derivative(jnp.asarray(img), theta,
                                           sigma_arcmin, (1, 0)))
    npt.assert_allclose(got, want, atol=2e-3)


def test_dgd3_antisymmetric_response():
    # DGD3 along axis 0 of a symmetric blob -> antisymmetric output with
    # zero mean
    n = 128
    e = (np.arange(n) - n / 2 + 0.5)
    r2 = e[:, None] ** 2 + e[None, :] ** 2
    img = jnp.asarray(np.exp(-r2 / (2 * 8.0 ** 2)).astype(np.float32))
    out = np.asarray(F.dgd3(img, 2.0, 10.0, axis=0))
    npt.assert_allclose(out.mean(), 0.0, atol=1e-8)
    # antisymmetry under flip of axis 0
    npt.assert_allclose(out, -out[::-1, :], atol=1e-6)


def test_aperture_photometry_removes_ring_mean(rng):
    img = jnp.ones((64, 64)) * 5.0
    out = F.aperture_photometry(img, 1.0, alpha_arcmin=10.0)
    # constant map: ring mean = 5 -> entire map shifted to 0
    npt.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_apodization_hann():
    img = jnp.ones((32, 32))
    out = np.asarray(F.apodization(img))
    npt.assert_allclose(out[0, 0], 0.0, atol=1e-7)   # edges suppressed
    npt.assert_allclose(out[16, 16], np.max(out), rtol=1e-2)


def test_gaussian_compensated_zero_on_constant():
    # compensated filter must annihilate a constant map (aside from the
    # discretization residual of the analytic normalization)
    img = jnp.ones((128, 128))
    out = np.asarray(F.gaussian_compensated(img, 2.0, 5.0, 20.0))
    assert np.abs(out).max() < 0.05


def test_tophat_compensated_detects_central_excess():
    n = 128
    e = (np.arange(n) - n / 2 + 0.5)
    r = np.sqrt(e[:, None] ** 2 + e[None, :] ** 2)
    img = jnp.asarray((r < 5).astype(np.float32))
    val = float(F.tophat_compensated(img, 1.0, rad_obj_arcmin=10.0, alpha=0.65))
    assert val > 0.1  # strong central excess


def test_tophat_compensated_zero_on_constant():
    img = jnp.ones((64, 64))
    val = float(F.tophat_compensated(img, 1.0, rad_obj_arcmin=10.0))
    npt.assert_allclose(val, 0.0, atol=1e-6)
