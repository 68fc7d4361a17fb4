"""Flat-sky CMB lensing: forward remap + TT quadratic estimator."""
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import cmb_lensing as cml

FOV = np.deg2rad(10.0)
LMAX = 3000
N = 128
PIX = FOV / N
LF = 2 * np.pi / FOV


def _cl_tt():
    ell = np.arange(LMAX + 1, dtype=np.float64)
    cl = np.zeros(LMAX + 1)
    cl[2:] = 1e-10 / (ell[2:] * (ell[2:] + 1.0)) \
        * np.exp(-(ell[2:] / 2000.0) ** 2)
    return cl


def _grf(key, cl, n=N):
    rng = np.random.default_rng(key)
    w = rng.standard_normal((n, n))
    lx = np.fft.fftfreq(n)[:, None] * n * LF
    ly = np.fft.fftfreq(n)[None, :] * n * LF
    lm = np.hypot(lx, ly)
    c = np.interp(lm, np.arange(len(cl)), cl, left=0, right=0)
    pix = FOV / n
    return (np.real(np.fft.ifft2(np.fft.fft2(w) * np.sqrt(c))) / pix
            ).astype(np.float32)


def test_lens_map_gradient_order():
    """T(x + d) - T(x) == d . grad T at first order for smooth fields."""
    x = np.arange(N) * PIX
    t = np.sin(4 * LF * x)[:, None] * np.ones((1, N), np.float32)
    kap = (1e-3 * np.cos(2 * LF * x))[:, None] * np.ones((1, N))
    lensed = np.asarray(cml.lens_cmb_map_flat(
        t.astype(np.float32), kap.astype(np.float32), FOV))
    # d1 = dphi/dx with phi_l = -2 kap_l / l^2: for kap = A cos(Lx),
    # phi = -2A/L^2 cos(Lx), d1 = 2A/L sin(Lx)
    L0 = 2 * LF
    d1 = 2e-3 / L0 * np.sin(L0 * x)
    want = np.sin(4 * LF * (x + d1))[:, None] * np.ones((1, N))
    npt.assert_allclose(lensed, want, atol=5e-4)


def test_lens_map_zero_kappa_identity():
    t = _grf(1, _cl_tt())
    out = np.asarray(cml.lens_cmb_map_flat(t, np.zeros_like(t), FOV))
    npt.assert_allclose(out, t, atol=1e-7)


def test_qe_pure_mode_response_unit():
    """Ensemble-mean reconstruction of a pure kappa mode is the input
    mode with unit normalization (the discrete-exact R): the lensed -
    unlensed estimator difference with the SAME T cancels the Gaussian
    noise, so a modest ensemble pins the response to a few percent."""
    cl = _cl_tt()
    x = np.arange(N) * PIX
    A = 3e-3
    for kmode in (6, 12):
        L0 = kmode * LF
        kap = (A * np.cos(L0 * x)[:, None] * np.ones((1, N))
               ).astype(np.float32)
        acc = 0.0
        for r in range(15):
            t = _grf(1000 + r, cl)
            tl = np.asarray(cml.lens_cmb_map_flat(t, kap, FOV))
            k1 = np.asarray(cml.qe_tt_kappa(tl, FOV, cl, lmin=40,
                                            lmax_filter=1200)[0])
            k0 = np.asarray(cml.qe_tt_kappa(t, FOV, cl, lmin=40,
                                            lmax_filter=1200)[0])
            acc = acc + (k1 - k0)
        acc /= 15
        proj = 2 * np.mean(acc * np.cos(L0 * x)[:, None]) / A
        assert abs(proj - 1.0) < 0.12, (kmode, proj)


def test_qe_n0_matches_unlensed_auto():
    """kappa_hat of UNLENSED skies is pure reconstruction noise with
    power N0 (the same R the normalization uses — consistency)."""
    cl = _cl_tt()
    lx = np.fft.fftfreq(N)[:, None] * N * LF
    ly = np.fft.fftfreq(N)[None, :] * N * LF
    lm = np.hypot(lx, ly)
    n0 = np.asarray(cml.qe_tt_n0_kappa(N, FOV, cl, lmin=40,
                                       lmax_filter=1200))
    band = (lm > 4 * LF) & (lm < 18 * LF)
    acc = []
    for r in range(12):
        t = _grf(3000 + r, cl)
        khat = np.asarray(cml.qe_tt_kappa(t, FOV, cl, lmin=40,
                                          lmax_filter=1200)[0])
        kl = PIX ** 2 * np.fft.fft2(khat)
        acc.append((np.abs(kl) ** 2 / FOV ** 2)[band])
    ratio = np.mean(np.concatenate(acc)) / np.mean(n0[band])
    assert abs(ratio - 1.0) < 0.2, ratio


def test_qe_mc_cross_correlation():
    """GRF kappa: the kappa_hat x kappa cross-spectrum equals the kappa
    auto-spectrum (unit bias) band by band."""
    cl = _cl_tt()
    ell = np.arange(LMAX + 1, dtype=np.float64)
    cl_kk = np.zeros(LMAX + 1)
    cl_kk[2:] = 3e-7 / (1 + ell[2:] / 300.0) ** 2
    lx = np.fft.fftfreq(N)[:, None] * N * LF
    ly = np.fft.fftfreq(N)[None, :] * N * LF
    lm = np.hypot(lx, ly).ravel()
    edges = np.linspace(3 * LF, 15 * LF, 5)
    idx = np.digitize(lm, edges) - 1

    def bands(a, b):
        fa = PIX ** 2 * np.fft.fft2(a)
        fb = PIX ** 2 * np.fft.fft2(b)
        cr = (np.real(fa * np.conj(fb)) / FOV ** 2).ravel()
        return np.array([cr[idx == i].mean() for i in range(4)])

    cx = 0.0
    ca = 0.0
    for r in range(16):
        t = _grf(100 + r, cl)
        kap = _grf(900 + r, cl_kk)
        tl = np.asarray(cml.lens_cmb_map_flat(t, kap, FOV))
        khat = np.asarray(cml.qe_tt_kappa(tl, FOV, cl, lmin=40,
                                          lmax_filter=1200)[0])
        cx = cx + bands(khat, kap)
        ca = ca + bands(kap, kap)
    ratio = cx / ca
    assert np.all(np.abs(ratio - 1.0) < 0.35), ratio
    assert abs(ratio.mean() - 1.0) < 0.15, ratio


def test_qe_noise_spectrum_raises_n0():
    """Adding instrument noise to the filter raises N0 everywhere."""
    cl = _cl_tt()
    nl = np.full(LMAX + 1, np.interp(1000, np.arange(LMAX + 1), cl))
    n0a = np.asarray(cml.qe_tt_n0_kappa(N, FOV, cl, lmin=40,
                                        lmax_filter=1200))
    n0b = np.asarray(cml.qe_tt_n0_kappa(N, FOV, cl, nl_tt=nl, lmin=40,
                                        lmax_filter=1200))
    # compare on the joint support, away from the |L| ~ 2*lmax_filter
    # sliver where R is roundoff-dominated (a handful of edge modes)
    lx = np.fft.fftfreq(N)[:, None] * N * LF
    ly = np.fft.fftfreq(N)[None, :] * N * LF
    lm = np.hypot(lx, ly)
    ok = (n0a > 0) & (n0b > 0) & (lm < 2 * 1200 * 0.9)
    assert ok.sum() > 100
    assert np.all(n0b[ok] >= n0a[ok] * 0.999)
    assert np.mean(n0b[ok] / n0a[ok]) > 1.5
