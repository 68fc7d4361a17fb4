"""Spin-1 (gradient/deflection) spherical-harmonic transforms.

The sign convention of the gradient synthesis is pinned here against
analytic gradients and finite differences — these tests ARE the
derivation record for the s_m/d-column choices in spin1_tables.
"""
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import sht
from astrild_tpu.ops import sht_spin as ss
from astrild_tpu.utils import healpix as hpx


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _alm(lmax, rng, lmin=1):
    lg = np.arange(lmax + 1)[:, None]
    mg = np.arange(lmax + 1)[None, :]
    valid = (mg <= lg) & (lg >= lmin)
    re = rng.standard_normal((lmax + 1, lmax + 1)) * valid
    im = rng.standard_normal((lmax + 1, lmax + 1)) * valid * (mg > 0)
    return re.astype(np.float32), im.astype(np.float32)


def test_gradient_analytic_dipole():
    """psi = cos(theta): alpha_theta = -sin(theta), alpha_phi = 0."""
    nside, lmax = 32, 8
    re = np.zeros((lmax + 1, lmax + 1), np.float32)
    im = np.zeros_like(re)
    re[1, 0] = np.sqrt(4 * np.pi / 3)
    g = np.sqrt(2.0)
    a_t, a_p = ss.synthesize_spin1(re * g, im, 0 * re, 0 * im, nside, lmax)
    theta, _ = hpx.pix2ang_ring(nside, np.arange(hpx.nside2npix(nside)))
    npt.assert_allclose(np.asarray(a_t), -np.sin(theta), atol=2e-6)
    npt.assert_allclose(np.asarray(a_p), 0.0, atol=2e-6)


def test_gradient_analytic_m1():
    """psi = sin(theta) sin(phi): alpha_theta = cos th sin ph,
    alpha_phi = cos ph — pins the m > 0 fold and both components."""
    nside, lmax = 32, 8
    npix = hpx.nside2npix(nside)
    theta, phi = hpx.pix2ang_ring(nside, np.arange(npix))
    psi = (np.sin(theta) * np.sin(phi)).astype(np.float32)
    re, im = sht.analyze(psi, nside, lmax, niter=3)
    L = np.arange(lmax + 1, dtype=np.float32)
    g = np.sqrt(L * (L + 1.0))[:, None]
    z = np.zeros_like(np.asarray(re))
    a_t, a_p = ss.synthesize_spin1(np.asarray(re) * g, np.asarray(im) * g,
                                   z, z, nside, lmax)
    npt.assert_allclose(np.asarray(a_t), np.cos(theta) * np.sin(phi),
                        atol=2e-4)
    npt.assert_allclose(np.asarray(a_p), np.cos(phi), atol=2e-4)


def test_gradient_vs_finite_difference(rng):
    """Random full-spectrum psi: gradient synthesis matches finite
    differences of the direct scalar evaluation at arbitrary points."""
    lmax = 8
    nside = 32
    re, im = _alm(lmax, rng)
    mg = np.arange(lmax + 1)[None, :]

    def scal(theta, phi):
        lam = sht.legendre_table(lmax, np.cos(theta))
        c = np.cos(mg[..., None] * phi)
        s = np.sin(mg[..., None] * phi)
        fac = np.where(mg > 0, 2.0, 1.0)[..., None]
        return np.sum(fac * lam * (re[..., None] * c - im[..., None] * s),
                      axis=(0, 1))

    th = rng.uniform(0.3, np.pi - 0.3, 30)
    ph = rng.uniform(0, 2 * np.pi, 30)
    eps = 1e-4
    fd_t = (scal(th + eps, ph) - scal(th - eps, ph)) / (2 * eps)
    fd_p = (scal(th, ph + eps) - scal(th, ph - eps)) / (2 * eps) / np.sin(th)

    L = np.arange(lmax + 1, dtype=np.float32)
    g = np.sqrt(L * (L + 1.0))[:, None]
    z = np.zeros_like(re)
    a_t, a_p = ss.synthesize_spin1(re * g, im * g, z, z, nside, lmax)
    # sample the synthesized maps at the FD points (bilinear, loose tol)
    got_t = hpx.get_interp_val(np.asarray(a_t, np.float64), th, ph)
    got_p = hpx.get_interp_val(np.asarray(a_p, np.float64), th, ph)
    scale = np.max(np.abs(fd_t))
    npt.assert_allclose(got_t, fd_t, atol=0.02 * scale)
    npt.assert_allclose(got_p, fd_p, atol=0.02 * scale)


def test_spin1_roundtrip(rng):
    """synthesize -> analyze recovers random E/B alms."""
    nside, lmax = 32, 48
    er, ei = _alm(lmax, rng)
    br, bi = _alm(lmax, rng)
    a_t, a_p = ss.synthesize_spin1(er, ei, br, bi, nside, lmax)
    er2, ei2, br2, bi2 = ss.analyze_spin1(a_t, a_p, nside, lmax, niter=3)
    scale = np.max(np.abs(er))
    npt.assert_allclose(np.asarray(er2), er, atol=3e-3 * scale)
    npt.assert_allclose(np.asarray(ei2), ei, atol=3e-3 * scale)
    npt.assert_allclose(np.asarray(br2), br, atol=3e-3 * scale)
    npt.assert_allclose(np.asarray(bi2), bi, atol=3e-3 * scale)


def test_kappa_deflection_closed_loop(rng):
    """kappa alms -> deflection maps -> (kappa, omega): kappa comes back,
    omega is null (a pure-gradient field has no curl)."""
    nside, lmax = 32, 48
    kr, ki = _alm(lmax, rng, lmin=2)
    a_t, a_p = ss.deflection_from_kappa_alm(kr, ki, nside, lmax)
    kr2, ki2, wr, wi = ss.kappa_omega_alm_from_deflection(
        a_t, a_p, nside, lmax, niter=3)
    scale = np.max(np.abs(kr))
    npt.assert_allclose(np.asarray(kr2), kr, atol=5e-3 * scale)
    npt.assert_allclose(np.asarray(ki2), ki, atol=5e-3 * scale)
    assert np.max(np.abs(np.asarray(wr))) < 1e-3 * scale
    assert np.max(np.abs(np.asarray(wi))) < 1e-3 * scale


def test_deflection_of_uniform_kappa_is_null():
    nside, lmax = 16, 8
    kr = np.zeros((lmax + 1, lmax + 1), np.float32)
    ki = np.zeros_like(kr)
    a_t, a_p = ss.deflection_from_kappa_alm(kr, ki, nside, lmax)
    assert float(np.abs(np.asarray(a_t)).max()) == 0.0
    assert float(np.abs(np.asarray(a_p)).max()) == 0.0
