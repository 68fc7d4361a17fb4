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


def _qu_from_e(key, cl_ee):
    """Pure-E Stokes maps (B identically zero)."""
    rng = np.random.default_rng(key)
    w = rng.standard_normal((N, N))
    lx = np.fft.fftfreq(N)[:, None] * N * LF
    ly = np.fft.fftfreq(N)[None, :] * N * LF
    lm = np.hypot(lx, ly)
    l2 = lx ** 2 + ly ** 2
    safe = np.where(l2 == 0, 1, l2)
    cos2 = np.where(l2 == 0, 1, (lx ** 2 - ly ** 2) / safe)
    sin2 = np.where(l2 == 0, 0, 2 * lx * ly / safe)
    c = np.interp(lm, np.arange(len(cl_ee)), cl_ee, left=0, right=0)
    ek = np.fft.fft2(w) * np.sqrt(c) / PIX
    q = np.real(np.fft.ifft2(cos2 * ek)).astype(np.float32)
    u = np.real(np.fft.ifft2(sin2 * ek)).astype(np.float32)
    return q, u


def _cl_ee():
    ell = np.arange(LMAX + 1, dtype=np.float64)
    cl = np.zeros(LMAX + 1)
    cl[2:] = 4e-11 / (ell[2:] * (ell[2:] + 1.0)) \
        * np.exp(-(ell[2:] / 2000.0) ** 2)
    return cl


def test_qe_eb_unlensed_null():
    """Pure-E unlensed sky: B is zero up to float32 roundoff, so the EB
    reconstruction is at the numerical-noise floor — orders of magnitude
    below a lensed reconstruction of the same sky (the systematics-free
    null channel)."""
    cl = _cl_ee()
    q, u = _qu_from_e(5, cl)
    null, _ = cml.qe_eb_kappa(q, u, FOV, cl, lmin=40, lmax_filter=600)
    x = np.arange(N) * PIX
    kap = (3e-3 * np.cos(6 * LF * x)[:, None] * np.ones((1, N))
           ).astype(np.float32)
    ql = np.asarray(cml.lens_cmb_map_flat(q, kap, FOV))
    ul = np.asarray(cml.lens_cmb_map_flat(u, kap, FOV))
    lensed, _ = cml.qe_eb_kappa(ql, ul, FOV, cl, lmin=40,
                                lmax_filter=600)
    assert np.std(np.asarray(null)) < 0.05 * np.std(np.asarray(lensed))


def test_qe_eb_pure_mode_response_unit():
    """Ensemble-mean EB reconstruction of a pure kappa mode is
    unit-normalized. The forward remap's bilinear transfer damps the
    generated B modes a few percent (measured 4-9% growing with
    lmax_filter*pix) — a forward-model property, so the band is kept
    conservative and the tolerance reflects it."""
    cl = _cl_ee()
    x = np.arange(N) * PIX
    A = 3e-3
    L0 = 6 * LF
    kap = (A * np.cos(L0 * x)[:, None] * np.ones((1, N))
           ).astype(np.float32)
    acc = 0.0
    for r in range(12):
        q, u = _qu_from_e(700 + r, cl)
        ql = np.asarray(cml.lens_cmb_map_flat(q, kap, FOV))
        ul = np.asarray(cml.lens_cmb_map_flat(u, kap, FOV))
        k1 = np.asarray(cml.qe_eb_kappa(ql, ul, FOV, cl, lmin=40,
                                        lmax_filter=600)[0])
        k0 = np.asarray(cml.qe_eb_kappa(q, u, FOV, cl, lmin=40,
                                        lmax_filter=600)[0])
        acc = acc + (k1 - k0)
    acc /= 12
    proj = 2 * np.mean(acc * np.cos(L0 * x)[:, None]) / A
    assert abs(proj - 1.0) < 0.12, proj


def test_qe_eb_n0_zero_without_noise_and_positive_with():
    """Gaussian N0 of the EB estimator vanishes for noiseless pure-E
    skies (no Gaussian B power) and is positive with a B noise floor."""
    cl = _cl_ee()
    q, u = _qu_from_e(6, cl)
    _, n0a = cml.qe_eb_kappa(q, u, FOV, cl, lmin=40, lmax_filter=600)
    assert float(np.abs(np.asarray(n0a)).max()) == 0.0
    nl = np.full(LMAX + 1, 1e-13)
    _, n0b = cml.qe_eb_kappa(q, u, FOV, cl, nl_bb=nl, lmin=40,
                             lmax_filter=600)
    n0b = np.asarray(n0b)
    assert n0b.max() > 0
    assert np.all(n0b >= 0)


@pytest.mark.slow
def test_qe_tt_healpix_pure_mode_response():
    """Curved-sky TT estimator: ensemble-mean reconstruction of a pure
    kappa alm lands on the input with the flat-normalization envelope
    (measured +13% at this deliberately narrow toy band — the docstring
    documents it; the estimator machinery itself is exact)."""
    import jax
    from astrild_tpu.models.skyhealpix import SkyHealpix
    from astrild_tpu.ops import sht
    from astrild_tpu.utils import healpix as hpx

    nside, Lf = 64, 120
    ell = np.arange(Lf + 1, dtype=np.float64)
    cl_tt = np.zeros(Lf + 1)
    cl_tt[2:] = 1e-10 / (ell[2:] * (ell[2:] + 1.0))
    npix = hpx.nside2npix(nside)
    sky = SkyHealpix.from_array(np.zeros(npix, np.float32))
    L0, A = 20, 2e-2
    kre = np.zeros((Lf + 1, Lf + 1), np.float32)
    kre[L0, 0] = A
    kap = np.asarray(sht.synthesize(kre, np.zeros_like(kre), nside, Lf))
    acc = 0.0
    for r in range(10):
        cmb = np.asarray(sht.synfast(jax.random.PRNGKey(50 + r), cl_tt,
                                     nside, lmax=Lf))
        lensed = sky.lens_cmb_from_kappa(cmb, kap, lmax=Lf)
        k1 = cml.qe_tt_kappa_healpix(lensed.astype(np.float32), cl_tt,
                                     lmin=10, lmax_filter=Lf,
                                     lmax_out=40)
        k0 = cml.qe_tt_kappa_healpix(cmb.astype(np.float32), cl_tt,
                                     lmin=10, lmax_filter=Lf,
                                     lmax_out=40)
        acc = acc + (np.asarray(k1[0]) - np.asarray(k0[0]))
    acc /= 10
    ratio = acc[L0, 0] / A
    assert 0.85 < ratio < 1.4, ratio


def test_qe_healpix_scan_matches_tables():
    """method='scan' (table-free sht_large/sht_spin_large backends) must
    reproduce the table path on the same map — the production nside>=512
    route where the O(lmax^2 nring) tables (~3 GB) are unaffordable."""
    from astrild_tpu.ops import sht
    from astrild_tpu.utils import healpix as hpx

    nside, Lf = 32, 60
    ell = np.arange(Lf + 1, dtype=np.float64)
    cl_tt = np.zeros(Lf + 1)
    cl_tt[2:] = 1e-10 / (ell[2:] * (ell[2:] + 1.0))
    import jax

    cmb = np.asarray(sht.synfast(jax.random.PRNGKey(3), cl_tt, nside,
                                 lmax=Lf)).astype(np.float32)
    kt = cml.qe_tt_kappa_healpix(cmb, cl_tt, lmin=8, lmax_filter=Lf,
                                 lmax_out=30, method="tables")
    ks = cml.qe_tt_kappa_healpix(cmb, cl_tt, lmin=8, lmax_filter=Lf,
                                 lmax_out=30, method="scan")
    npt.assert_allclose(np.asarray(ks[2]), np.asarray(kt[2]), rtol=1e-5)
    scale = np.abs(np.asarray(kt[0])).max()
    npt.assert_allclose(np.asarray(ks[0]), np.asarray(kt[0]),
                        atol=2e-3 * scale)
    npt.assert_allclose(np.asarray(ks[1]), np.asarray(kt[1]),
                        atol=2e-3 * scale)
    # auto stays on tables at toy scale, and rejects junk
    import pytest
    with pytest.raises(ValueError):
        cml.qe_tt_kappa_healpix(cmb, cl_tt, method="banana")
