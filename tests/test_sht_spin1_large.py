"""Large-lmax spin-1 (gradient/deflection) transforms: equivalence with
the table path, analytic anchors, and round trips."""
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import sht
from astrild_tpu.ops import sht_spin as ss
from astrild_tpu.ops import sht_spin_large as ssl
from astrild_tpu.utils import healpix as hpx


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def _alm(lmax, rng, lmin=1):
    lg = np.arange(lmax + 1)[:, None]
    mg = np.arange(lmax + 1)[None, :]
    valid = (mg <= lg) & (lg >= lmin)
    re = rng.standard_normal((lmax + 1, lmax + 1)) * valid
    im = rng.standard_normal((lmax + 1, lmax + 1)) * valid * (mg > 0)
    return re.astype(np.float32), im.astype(np.float32)


def test_spin1_large_matches_table_synthesis(rng):
    """Scan-path synthesis == table-path synthesis (both exact at small
    nside) for random full-spectrum E/B."""
    nside, lmax = 16, 32
    er, ei = _alm(lmax, rng)
    br, bi = _alm(lmax, rng)
    at_t, ap_t = ss.synthesize_spin1(er, ei, br, bi, nside, lmax)
    at_l, ap_l = ssl.synthesize_spin1_large(er, ei, br, bi, nside, lmax)
    scale = float(np.abs(np.asarray(at_t)).max())
    npt.assert_allclose(np.asarray(at_l), np.asarray(at_t),
                        atol=2e-5 * scale)
    npt.assert_allclose(np.asarray(ap_l), np.asarray(ap_t),
                        atol=2e-5 * scale)


def test_spin1_large_gradient_analytic():
    """psi = cos(theta) (pure l=1, m=0 — the closed-form seed row):
    alpha_theta = -sin(theta); and psi = sin th sin ph pins the m = 1
    fold through the seeded recursion."""
    nside, lmax = 32, 8
    re = np.zeros((lmax + 1, lmax + 1), np.float32)
    im = np.zeros_like(re)
    re[1, 0] = np.sqrt(4 * np.pi / 3) * np.sqrt(2.0)   # E = g psi
    z = np.zeros_like(re)
    a_t, a_p = ssl.synthesize_spin1_large(re, im, z, z, nside, lmax)
    theta, phi = hpx.pix2ang_ring(nside, np.arange(hpx.nside2npix(nside)))
    npt.assert_allclose(np.asarray(a_t), -np.sin(theta), atol=5e-6)
    npt.assert_allclose(np.asarray(a_p), 0.0, atol=5e-6)

    psi = (np.sin(theta) * np.sin(phi)).astype(np.float32)
    pr, pi = sht.analyze(psi, nside, lmax, niter=3)
    L = np.arange(lmax + 1, dtype=np.float32)
    g = np.sqrt(L * (L + 1.0))[:, None]
    a_t, a_p = ssl.synthesize_spin1_large(np.asarray(pr) * g,
                                          np.asarray(pi) * g, z, z,
                                          nside, lmax)
    npt.assert_allclose(np.asarray(a_t), np.cos(theta) * np.sin(phi),
                        atol=3e-4)
    npt.assert_allclose(np.asarray(a_p), np.cos(phi), atol=3e-4)


def test_spin1_large_roundtrip(rng):
    nside, lmax = 32, 48
    er, ei = _alm(lmax, rng)
    br, bi = _alm(lmax, rng)
    a_t, a_p = ssl.synthesize_spin1_large(er, ei, br, bi, nside, lmax)
    er2, ei2, br2, bi2 = ssl.analyze_spin1_large(a_t, a_p, nside, lmax,
                                                 niter=3)
    scale = np.max(np.abs(er))
    npt.assert_allclose(np.asarray(er2), er, atol=4e-3 * scale)
    npt.assert_allclose(np.asarray(ei2), ei, atol=4e-3 * scale)
    npt.assert_allclose(np.asarray(br2), br, atol=4e-3 * scale)
    npt.assert_allclose(np.asarray(bi2), bi, atol=4e-3 * scale)


def test_spin1_large_super_nyquist_cg(rng):
    """lmax > 2*nside: 'auto' routes to CG and stays band-unbiased where
    Jacobi diverges (same regime split as the scalar/spin-2 paths)."""
    nside = 16
    lmax = 3 * nside - 1
    er, ei = _alm(lmax, rng)
    br, bi = _alm(lmax, rng)
    a_t, a_p = ssl.synthesize_spin1_large(er, ei, br, bi, nside, lmax)
    er2, _, _, _ = ssl.analyze_spin1_large(a_t, a_p, nside, lmax,
                                           niter=3, method="auto")
    # band-averaged recovery below 2*nside stays unbiased
    lo = slice(1, 2 * nside)
    r = np.linalg.norm(np.asarray(er2)[lo] - er[lo]) \
        / np.linalg.norm(er[lo])
    assert r < 0.15, r


def test_deflection_large_matches_table(rng):
    nside, lmax = 16, 32
    kr, ki = _alm(lmax, rng, lmin=2)
    at_t, ap_t = ss.deflection_from_kappa_alm(kr, ki, nside, lmax)
    at_l, ap_l = ssl.deflection_from_kappa_alm_large(kr, ki, nside, lmax)
    scale = float(np.abs(np.asarray(at_t)).max())
    npt.assert_allclose(np.asarray(at_l), np.asarray(at_t),
                        atol=2e-5 * scale)
    npt.assert_allclose(np.asarray(ap_l), np.asarray(ap_t),
                        atol=2e-5 * scale)


def test_spin1_large_adjoint_is_transpose(rng):
    """<S(a), m> == <a, A(m)> up to the quadrature normalization: the
    hand-written adjoint must be the exact transpose of the synthesis
    (the same contract the spin-2 scan path keeps)."""
    nside, lmax = 8, 16
    npix = hpx.nside2npix(nside)
    er, ei = _alm(lmax, rng)
    br, bi = _alm(lmax, rng)
    mt = rng.standard_normal(npix).astype(np.float32)
    mp = rng.standard_normal(npix).astype(np.float32)
    st, sp = ssl.synthesize_spin1_large(er, ei, br, bi, nside, lmax)
    lhs = float(np.sum(np.asarray(st) * mt) + np.sum(np.asarray(sp) * mp))
    der, dei, dbr, dbi = ssl._adjoint_spin1_large_impl(
        mt, mp, ssl.spin1_large_tables(nside, lmax), nside, lmax)
    # undo the quadrature weight and the m>0 halving to get the raw
    # transpose, then contract with the real-pair convention (m>0
    # counts both +-m, i.e. a factor 2 — exactly the halving undone)
    wq = 4.0 * np.pi / npix
    mg = np.arange(lmax + 1)[None, :]
    unhalf = np.where(mg == 0, 1.0, 2.0) / wq
    rhs = float(sum(np.sum(np.asarray(d) * unhalf * a)
                    for d, a in ((der, er), (dei, ei),
                                 (dbr, br), (dbi, bi))))
    npt.assert_allclose(lhs, rhs, rtol=2e-4)


def test_lens_cmb_from_kappa_facade(rng):
    """kappa -> deflection -> remap: a dipole-kappa lens shifts the CMB
    by the analytic gradient; both backend branches agree."""
    from astrild_tpu.models.skyhealpix import SkyHealpix

    nside = 32
    npix = hpx.nside2npix(nside)
    theta, phi = hpx.pix2ang_ring(nside, np.arange(npix))
    cmb = np.cos(4 * theta).astype(np.float32)
    # kappa = Y_10-like: psi_lm = -2 k_lm / (l(l+1)) -> alpha analytic
    kap = (0.01 * np.cos(theta)).astype(np.float32)
    sky = SkyHealpix.from_array(np.zeros(npix, np.float32))
    lensed_tab = sky.lens_cmb_from_kappa(cmb, kap, lmax=8)
    # alpha_theta = grad psi = -2*0.01/2 * (-sin) = 0.01 sin(theta)
    exact = np.cos(4 * (np.clip(theta + 0.01 * np.sin(theta), 0, np.pi)))
    belt = (theta > 0.3) & (theta < np.pi - 0.3)
    assert np.abs((lensed_tab - exact)[belt]).max() < 2e-3

    # large-lmax branch (forced by lmax > _TABLE_LMAX_LIMIT)
    import astrild_tpu.models.skyhealpix as shp
    old = shp._TABLE_LMAX_LIMIT
    shp._TABLE_LMAX_LIMIT = 4
    try:
        lensed_large = sky.lens_cmb_from_kappa(cmb, kap, lmax=8)
    finally:
        shp._TABLE_LMAX_LIMIT = old
    npt.assert_allclose(lensed_large, lensed_tab, atol=2e-4)


def test_lens_cmb_from_kappa_super_nyquist_routing(rng):
    """lmax > 2*nside routes the kappa analysis through the CG solve
    (plain adjoint is documented-biased there) — mixed routing runs and
    stays finite/sane."""
    from astrild_tpu.models.skyhealpix import SkyHealpix

    nside = 16
    npix = hpx.nside2npix(nside)
    theta, _ = hpx.pix2ang_ring(nside, np.arange(npix))
    cmb = np.cos(3 * theta).astype(np.float32)
    kap = (0.01 * np.cos(theta)).astype(np.float32)
    sky = SkyHealpix.from_array(np.zeros(npix, np.float32))
    out = sky.lens_cmb_from_kappa(cmb, kap, lmax=3 * nside)
    ref = sky.lens_cmb_from_kappa(cmb, kap, lmax=8)
    assert np.all(np.isfinite(out))
    # the kappa is pure l=1: both band limits must agree closely
    npt.assert_allclose(out, ref, atol=2e-3)
