"""Real-space shear statistics: xi_pm, tangential stacking, Delta Sigma,
COSEBIs.

Oracles: scipy Bessel quadrature for the FFTLog transforms, an O(N^2)
brute-force pair sum for the map estimator, the exact Gaussian-blob
gamma_t identity for stacking, and the pure-B antisymmetry of xi_minus
for the spin-rotation conventions.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from astrild_tpu.ops import shear_2pt as s2
from astrild_tpu.ops.fftlog import bessel_transform

ARCMIN = np.pi / 180.0 / 60.0


def _smooth_cl(ells, amp=1e-8, l0=300.0):
    return amp / (1.0 + (np.asarray(ells, float) / l0) ** 2) ** 1.5


def _shear_from_kappa_fourier(kappa, b_mode=False):
    """gamma_hat = e^{2 i phi_l} kappa_hat (the alpha_to_gamma/
    shear_eb_maps convention, phi from axis 0); b_mode rotates by i."""
    n = kappa.shape[-1]
    f = np.fft.fftfreq(n) * n
    l1, l2 = f[:, None], f[None, :]
    l2m = l1 ** 2 + l2 ** 2
    safe = np.where(l2m == 0, 1.0, l2m)
    ph = ((l1 ** 2 - l2 ** 2) + 2j * l1 * l2) / safe
    if b_mode:
        ph = 1j * ph
    kh = np.fft.fft2(np.asarray(kappa))
    gh = ph * kh
    g = np.fft.ifft2(gh)
    return g.real.astype(np.float32), g.imag.astype(np.float32)


def test_bessel_transform_matches_quadrature():
    from scipy.special import jv
    from scipy.integrate import quad

    a = 1e-4
    k = np.geomspace(1e-2, 1e5, 1024)
    f = jnp.asarray(np.exp(-a * k ** 2), jnp.float32)
    # closed form for J0: Int l e^{-a l^2} J0(l t) dl = e^{-t^2/4a}/(2a)
    r, out = bessel_transform(k, f, 0, q=1.0)
    r, out = np.asarray(r), np.asarray(out)
    sel = (r > 1e-3) & (r < 0.05)
    exact = np.exp(-r[sel] ** 2 / (4 * a)) / (2 * a)
    assert np.max(np.abs(out[sel] / exact - 1.0)) < 1e-4
    for mu in (2, 4):
        r, out = bessel_transform(k, f, mu, q=1.0)
        r, out = np.asarray(r), np.asarray(out)
        for rv in (3e-3, 0.02, 0.2):
            j = int(np.argmin(np.abs(r - rv)))
            ex = quad(lambda x: x * np.exp(-a * x * x) * jv(mu, x * r[j]),
                      0, np.inf, limit=400)[0]
            assert abs(float(out[j]) / ex - 1.0) < 1e-3


def test_bessel_transform_bias_strip_guard():
    k = np.geomspace(1e-2, 1e2, 64)
    with pytest.raises(ValueError):
        bessel_transform(k, jnp.ones(64), 0, q=-0.5)  # outside (-0, 1.5)


def test_xi_plus_from_cl_vs_direct_quadrature():
    from scipy.special import jv

    ells = np.arange(2.0, 20000.0)
    cl = _smooth_cl(ells)
    th, xp, xm = s2.xi_pm_from_cl(ells, cl)
    th = np.asarray(th)
    for tv in (2.0, 10.0, 30.0):  # arcmin
        j = int(np.argmin(np.abs(th - tv * ARCMIN)))
        # direct sum over integer ells (the flat-sky continuum integrand
        # is smooth; trapezoid over unit-spaced ells is exact enough)
        ex_p = np.sum(ells * cl * jv(0, ells * th[j])) / (2 * np.pi)
        ex_m = np.sum(ells * cl * jv(4, ells * th[j])) / (2 * np.pi)
        assert abs(float(xp[j]) / ex_p - 1.0) < 2e-3
        assert abs(float(xm[j]) / ex_m - 1.0) < 2e-3


def test_xi_pm_flat_sky_matches_bruteforce():
    rng = np.random.default_rng(0)
    n = 16
    g1 = rng.normal(size=(n, n)).astype(np.float32)
    g2 = rng.normal(size=(n, n)).astype(np.float32)
    th, xp, xm, cnt = s2.xi_pm_flat_sky(g1, g2, opening_angle_deg=n / 60.0,
                                        nbins=6)
    gam = g1 + 1j * g2
    cp = np.zeros((n, n), complex)
    cm = np.zeros((n, n), complex)
    for dr in range(n):
        for dc in range(n):
            sh = np.roll(gam, (-dr, -dc), (0, 1))  # gamma(x + r)
            cp[dr, dc] = np.mean(sh * np.conj(gam))
            cm[dr, dc] = np.mean(sh * gam)
    f = np.fft.fftfreq(n) * n
    dx, dy = np.meshgrid(f, f, indexing="ij")
    r2 = dx ** 2 + dy ** 2
    safe = np.where(r2 == 0, 1, r2)
    z2x, z2y = dx * dx - dy * dy, 2 * dx * dy
    cos4 = (z2x * z2x - z2y * z2y) / (safe * safe)
    sin4 = 2 * z2x * z2y / (safe * safe)
    xim_g = cm.real * cos4 + cm.imag * sin4
    edges2 = np.geomspace(1.0, n / 2.0, 7) ** 2
    idx = np.clip(np.searchsorted(edges2, r2.ravel(), side="right") - 1,
                  0, 5)
    ins = (r2.ravel() >= edges2[0]) & (r2.ravel() <= edges2[-1])
    nmb = np.maximum(np.bincount(idx, weights=ins, minlength=6), 1)
    bp = np.bincount(idx, weights=ins * cp.real.ravel(), minlength=6) / nmb
    bm = np.bincount(idx, weights=ins * xim_g.ravel(), minlength=6) / nmb
    cnt_np = np.bincount(idx, weights=ins, minlength=6)
    occ = cnt_np > 0
    assert np.allclose(np.asarray(xp)[occ], bp[occ], atol=1e-6)
    assert np.allclose(np.asarray(xm)[occ], bm[occ], atol=1e-6)
    assert np.all(np.isnan(np.asarray(xp)[~occ]))  # empty bins are NaN
    assert np.allclose(np.asarray(cnt), cnt_np)


def test_xi_pm_pure_E_matches_theory_and_pure_B_flips():
    from astrild_tpu.ops.angular_power import cl_to_flat_map

    n = 512
    oa = 5.0  # deg
    # band-limit the table EXPLICITLY: cl_to_flat_map clamps jnp.interp
    # beyond the last table point, so without the zero tail the map
    # carries power out to the grid corner (ell ~ 26000) that a theory
    # curve built from the same table would not see
    ells = np.concatenate([np.arange(2.0, 1400.0), [1410.0, 40000.0]])
    cl_tab = _smooth_cl(ells, amp=1e-8, l0=800.0)
    cl_tab[-2:] = 0.0
    kappa = np.asarray(cl_to_flat_map(
        jax.random.PRNGKey(3), jnp.asarray(ells, jnp.float32),
        jnp.asarray(cl_tab, jnp.float32), n, oa))
    g1e, g2e = _shear_from_kappa_fourier(kappa)
    th, xpe, xme, _ = s2.xi_pm_flat_sky(g1e, g2e, oa, nbins=14,
                                        theta_min_arcmin=1.0,
                                        theta_max_arcmin=60.0)
    # same-realization theory: xi from the input Cl
    tt, xp_t, xm_t = s2.xi_pm_from_cl(ells, cl_tab)
    tt = np.asarray(tt) / ARCMIN
    th = np.asarray(th)
    xp_i = np.interp(np.log(th), np.log(tt), np.asarray(xp_t))
    xm_i = np.interp(np.log(th), np.log(tt), np.asarray(xm_t))
    sel = (th > 2.0) & (th < 25.0)
    assert np.allclose(np.asarray(xpe)[sel], xp_i[sel],
                       rtol=0.15, atol=2e-8)
    # xi_minus is J4-suppressed ~3 decades below its peak at theta < 4';
    # there the few-pixel cos(4phi) annulus discreteness dominates, so
    # compare only where the signal lives
    sel_m = (th > 4.0) & (th < 25.0)
    assert np.allclose(np.asarray(xme)[sel_m], xm_i[sel_m],
                       rtol=0.25, atol=2e-8)
    # pure-B: xi_plus identical, xi_minus exactly negated (gamma -> i gamma)
    g1b, g2b = _shear_from_kappa_fourier(kappa, b_mode=True)
    _, xpb, xmb, _ = s2.xi_pm_flat_sky(g1b, g2b, oa, nbins=14,
                                       theta_min_arcmin=1.0,
                                       theta_max_arcmin=60.0)
    assert np.allclose(np.asarray(xpb), np.asarray(xpe), rtol=1e-5,
                       atol=1e-12)
    assert np.allclose(np.asarray(xmb), -np.asarray(xme), rtol=1e-4,
                       atol=1e-11)


def test_tangential_stack_gaussian_blob():
    n = 256
    s = 12.0
    amp = 0.08
    f = np.fft.fftfreq(n) * n
    dx, dy = np.meshgrid(f, f, indexing="ij")
    r2 = dx ** 2 + dy ** 2
    kappa = amp * np.exp(-r2 / (2 * s * s))
    g1, g2 = _shear_from_kappa_fourier(kappa)
    edges = jnp.asarray(np.linspace(2.0, 40.0, 13), jnp.float32)
    centers = jnp.asarray([[0, 0]], jnp.int32)
    r, gt, gx, cnt = s2.tangential_shear_stack(
        jnp.asarray(g1), jnp.asarray(g2), centers, edges,
        patch_half=48, nbins=12)
    r = np.asarray(r)
    # gamma_t(r) = kbar(<r) - kappa(r) for the axisymmetric lens:
    # kbar(<r) = (2 A s^2 / r^2)(1 - e^{-r^2/2s^2})
    kbar = 2 * amp * s * s / r ** 2 * (1 - np.exp(-r ** 2 / (2 * s * s)))
    expect = kbar - amp * np.exp(-r ** 2 / (2 * s * s))
    assert np.allclose(np.asarray(gt), expect, rtol=0.05, atol=5e-5)
    assert np.max(np.abs(np.asarray(gx))) < 2e-4  # parity-odd null


def test_cosebis_filters_constraints_and_orthonormality():
    tmin, tmax = 1.0, 100.0
    tg, Tp, Tm = s2.linear_cosebis_filters(6, tmin, tmax)
    w = s2._trap_weights(tg)
    scale1 = np.sum(w * tg * np.abs(Tp), axis=1)
    scale3 = np.sum(w * tg ** 3 * np.abs(Tp), axis=1)
    for i in range(6):
        assert abs(np.sum(w * tg * Tp[i])) < 1e-4 * scale1[i]
        assert abs(np.sum(w * tg ** 3 * Tp[i])) < 1e-4 * scale3[i]
    G = (Tp * w) @ Tp.T
    dt = 0.5 * (tmax - tmin)
    assert np.allclose(np.diag(G), dt, rtol=1e-4)
    off = G - np.diag(np.diag(G))
    assert np.max(np.abs(off)) < 1e-4 * dt


@pytest.mark.slow
def test_cosebis_bmode_null_and_route_consistency():
    ells = np.arange(2.0, 20000.0)
    cl = _smooth_cl(ells)
    th, xp, xm = s2.xi_pm_from_cl(ells, cl)
    th_am = np.asarray(th) / ARCMIN
    sel = (th_am > 0.3) & (th_am < 300.0)
    E, B = s2.cosebis_from_xipm(th_am[sel], np.asarray(xp)[sel],
                                np.asarray(xm)[sel], 5, 1.0, 100.0)
    E, B = np.asarray(E), np.asarray(B)
    assert np.max(np.abs(B)) < 1e-4 * np.max(np.abs(E))
    # Cl route, filters built in radians: E_rad = E_arcmin * ARCMIN^2
    E2, B2 = s2.cosebis_from_cl(ells, cl, 5, 1.0 * ARCMIN, 100.0 * ARCMIN)
    assert np.allclose(E * ARCMIN ** 2, E2, rtol=0.01)
    assert np.allclose(B2, 0.0)
    # pure-B input: E and B swap roles
    Eb, Bb = s2.cosebis_from_xipm(th_am[sel], np.asarray(xp)[sel],
                                  -np.asarray(xm)[sel], 5, 1.0, 100.0)
    assert np.allclose(np.asarray(Bb), E, rtol=1e-5, atol=1e-12)
    assert np.max(np.abs(np.asarray(Eb))) < 1e-4 * np.max(np.abs(E))


def test_cosebis_interval_guard():
    with pytest.raises(ValueError):
        s2.cosebis_from_xipm(np.array([2.0, 3.0]), np.zeros(2), np.zeros(2),
                             3, 1.0, 100.0)
    with pytest.raises(ValueError):
        s2.linear_cosebis_filters(20, 1.0, 10.0)  # beyond f64 envelope


def test_delta_sigma_j2_equals_wgm_route():
    # P(k) with realistic shape
    k = np.geomspace(1e-3, 1e3, 1024)
    pk = 2e4 * (k / 0.02) / (1 + (k / 0.1) ** 3.2)
    om = 0.3
    rp = np.array([0.5, 1.0, 3.0, 8.0], np.float64)
    ds = np.asarray(s2.delta_sigma_from_pk(k, pk, rp, om))
    # oracle: w(R) = Int dk k P J0 / 2pi;  DS = rho (2/R^2 Int_0^R R'w dR' - w)
    r0, w0 = bessel_transform(k, jnp.asarray(pk, jnp.float32), 0, q=1.0)
    r0, w0 = np.asarray(r0, np.float64), np.asarray(w0, np.float64) / (
        2 * np.pi)
    rho = om * s2.RHO_CRIT0_H2 * 1e-12
    # cumulative Int_0^R R' w(R') dR' on the log grid (trapezoid)
    integ = np.concatenate([[0.0], np.cumsum(
        0.5 * (r0[1:] * w0[1:] + r0[:-1] * w0[:-1]) * np.diff(r0))])
    # small-R head below the table start: w ~ w0[0] constant
    head = 0.5 * r0[0] ** 2 * w0[0]
    for i, rv in enumerate(rp):
        j = int(np.argmin(np.abs(r0 - rv)))
        ds_oracle = rho * (2.0 / r0[j] ** 2 * (head + integ[j])
                           - w0[j])
        ds_j2 = float(np.interp(np.log(r0[j]), np.log(rp), np.log(
            np.maximum(ds, 1e-30))))
        assert abs(np.exp(ds_j2) / ds_oracle - 1.0) < 0.03


def test_kappa_to_shear_roundtrip():
    from astrild_tpu.ops.angular_power import (kappa_to_shear_maps,
                                               shear_eb_maps)

    rng = np.random.default_rng(0)
    for n in (64, 65):
        kap = rng.normal(size=(n, n)).astype(np.float32)
        kap -= kap.mean()
        g1, g2 = kappa_to_shear_maps(jnp.asarray(kap))
        ke, kb = shear_eb_maps(g1, g2)
        # expectation: kappa minus its (zeroed) Nyquist band
        kh = np.fft.fft2(kap)
        f = np.fft.fftfreq(n) * n
        if n % 2 == 0:
            nyq = -(n // 2)
            keep = (f[:, None] != nyq) & (f[None, :] != nyq)
            kh = np.where(keep, kh, 0)
        kap_band = np.real(np.fft.ifft2(kh))
        assert float(jnp.max(jnp.abs(ke - kap_band))) < 1e-5
        assert float(jnp.max(jnp.abs(kb))) < 1e-5


def test_xi_pm_catalog_matches_bruteforce():
    rng = np.random.default_rng(5)
    n = 300
    x = rng.uniform(0, 100, n).astype(np.float32)
    y = rng.uniform(0, 100, n).astype(np.float32)
    e1 = rng.normal(0, 0.2, n).astype(np.float32)
    e2 = rng.normal(0, 0.2, n).astype(np.float32)
    w = rng.uniform(0.5, 2.0, n).astype(np.float32)
    edges = np.geomspace(2.0, 50.0, 7)
    xip, xim, cnt = s2.xi_pm_catalog(x, y, e1, e2, edges, weights=w,
                                     block=128)
    # numpy oracle over unordered pairs
    nb = 6
    num_p = np.zeros(nb)
    num_m = np.zeros(nb)
    den = np.zeros(nb)
    npr = np.zeros(nb)
    for i in range(n):
        dx = x[i] - x[i + 1:]
        dy = y[i] - y[i + 1:]
        r = np.hypot(dx, dy)
        phi = np.arctan2(dy, dx)
        sel = (r >= edges[0]) & (r < edges[-1])
        b = np.clip(np.searchsorted(edges, r, side="right") - 1, 0, nb - 1)
        ww = w[i] * w[i + 1:]
        ei = e1[i] + 1j * e2[i]
        ej = e1[i + 1:] + 1j * e2[i + 1:]
        pp = np.real(ei * np.conj(ej))
        mm = np.real(ei * ej * np.exp(-4j * phi))
        for t in np.nonzero(sel)[0]:
            num_p[b[t]] += ww[t] * pp[t]
            num_m[b[t]] += ww[t] * mm[t]
            den[b[t]] += ww[t]
            npr[b[t]] += 1
    assert np.allclose(np.asarray(xip), num_p / np.maximum(den, 1e-30),
                       atol=2e-6)
    assert np.allclose(np.asarray(xim), num_m / np.maximum(den, 1e-30),
                       atol=2e-6)
    assert np.allclose(np.asarray(cnt), npr)


def test_xi_pm_catalog_agrees_with_map_estimator():
    # a full pixel-grid "catalog" with periodic minimum image reproduces
    # the FFT map estimator (same pairs, same weights)
    rng = np.random.default_rng(1)
    n = 24
    g1 = rng.normal(size=(n, n)).astype(np.float32)
    g2 = rng.normal(size=(n, n)).astype(np.float32)
    # top edge strictly below n/2: the map convention is INCLUSIVE at
    # theta_max (to keep Nyquist offsets) while the catalog bins are
    # standard right-exclusive — avoid the boundary so both see the
    # same pair set
    nbins = 5
    pixscale = 1.0  # oa_deg * 60 / n = 1 arcmin/pixel
    th, xp_map, xm_map, _ = s2.xi_pm_flat_sky(
        g1, g2, opening_angle_deg=n / 60.0, nbins=nbins,
        theta_min_arcmin=1.0, theta_max_arcmin=11.5)
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    edges = np.geomspace(1.0, 11.5, nbins + 1)
    xp_cat, xm_cat, _ = s2.xi_pm_catalog(
        rr.ravel().astype(np.float32), cc.ravel().astype(np.float32),
        g1.ravel(), g2.ravel(), edges, boxsize=float(n), block=192)
    assert np.allclose(np.asarray(xp_cat), np.asarray(xp_map), atol=1e-5)
    assert np.allclose(np.asarray(xm_cat), np.asarray(xm_map), atol=1e-5)


def test_gamma_t_catalog_gaussian_blob():
    n, s, amp = 128, 8.0, 0.05
    f = np.fft.fftfreq(n) * n
    dx, dy = np.meshgrid(f, f, indexing="ij")
    kappa = amp * np.exp(-(dx ** 2 + dy ** 2) / (2 * s * s))
    g1, g2 = _shear_from_kappa_fourier(kappa)
    rr, cc = np.meshgrid(f, f, indexing="ij")  # signed coords around 0
    edges = np.linspace(3.0, 30.0, 10)
    gt, gx, cnt = s2.gamma_t_catalog(
        np.zeros(1, np.float32), np.zeros(1, np.float32),
        rr.ravel().astype(np.float32), cc.ravel().astype(np.float32),
        g1.ravel(), g2.ravel(), edges, boxsize=float(n), block=256)
    gt, gx = np.asarray(gt), np.asarray(gx)
    # bin-averaged analytic gamma_t; compare at the pair-weighted radius
    rmid = []
    for i in range(9):
        r = np.hypot(rr, cc).ravel()
        m = (r >= edges[i]) & (r < edges[i + 1])
        rmid.append(np.mean(r[m]))
    rmid = np.asarray(rmid)
    kbar = 2 * amp * s * s / rmid ** 2 * (
        1 - np.exp(-rmid ** 2 / (2 * s * s)))
    expect = kbar - amp * np.exp(-rmid ** 2 / (2 * s * s))
    assert np.allclose(gt, expect, rtol=0.06, atol=2e-5)
    assert np.max(np.abs(gx)) < 2e-4


def test_skyarray_facade_xi_and_cosebis():
    from astrild_tpu.models.skymap import SkyArray
    from astrild_tpu.ops.angular_power import cl_to_flat_map

    n, oa = 256, 5.0
    ells = np.concatenate([np.arange(2.0, 1000.0), [1010.0, 40000.0]])
    cl = _smooth_cl(ells, l0=500.0)
    cl[-2:] = 0.0
    kap = cl_to_flat_map(jax.random.PRNGKey(0),
                         jnp.asarray(ells, jnp.float32),
                         jnp.asarray(cl, jnp.float32), n, oa)
    sa = SkyArray.from_array(np.asarray(kap), oa, "kappa_2")
    sa.convert_convergence_to_deflection()
    sa.convert_deflection_to_shear()
    th, xp, xm, npair = sa.shear_xi_pm(nbins=10, theta_min_arcmin=2,
                                       theta_max_arcmin=100)
    assert np.all(np.asarray(xp)[:4] > 0)  # positive correlation
    E, B = sa.cosebis(4, 3.0, 90.0)
    E, B = np.asarray(E), np.asarray(B)
    # the kappa->alpha solve is zero-padded (non-periodic), so a small
    # B-mode leaks at the map edges; the E channel must still dominate
    assert np.max(np.abs(B)) < 0.05 * np.max(np.abs(E))
    assert E[0] > 0


def test_xi_pm_gaussian_covariance_matches_monte_carlo():
    npix, oa, nbins = 64, 2.0, 6
    ells = np.arange(2.0, 6000.0)
    cl = 2e-8 / (1 + (ells / 1500.0) ** 2) ** 1.2
    th_a, cov_a = s2.xi_pm_gaussian_covariance(npix, oa, ells, cl, nbins)
    assert cov_a.shape == (12, 12)
    assert np.allclose(cov_a, cov_a.T)
    assert np.all(np.linalg.eigvalsh(cov_a) > -1e-25)
    _, _, cov_m, _ = s2.xi_pm_sample_covariance(
        jax.random.PRNGKey(0), ells, cl, npix, oa, nbins, n_real=900)
    ratio = np.sqrt(np.diag(np.asarray(cov_m)) / np.diag(cov_a))
    # MC stderr of a std at 900 realizations is ~2.4%; allow 4 sigma
    assert np.all(np.abs(ratio - 1.0) < 0.10), ratio
    # off-diagonal structure: xi+/xi- cross-correlation signs agree
    ca = cov_a / np.sqrt(np.outer(np.diag(cov_a), np.diag(cov_a)))
    cm = np.asarray(cov_m)
    cm = cm / np.sqrt(np.outer(np.diag(cm), np.diag(cm)))
    strong = np.abs(ca) > 0.3
    assert np.allclose(ca[strong], cm[strong], atol=0.15)


def test_xi_pm_covariance_with_shape_noise():
    npix, oa, nbins = 64, 2.0, 6
    ells = np.arange(2.0, 6000.0)
    cl = 2e-8 / (1 + (ells / 1500.0) ** 2) ** 1.2
    ns = 3e-3
    # white shear noise per component: C_n = sigma^2 * Omega_pix
    ncl = ns ** 2 * (oa * np.pi / 180) ** 2 / npix ** 2
    _, cov_a = s2.xi_pm_gaussian_covariance(npix, oa, ells, cl, nbins,
                                            noise_cl=ncl)
    _, _, cov_m, _ = s2.xi_pm_sample_covariance(
        jax.random.PRNGKey(1), ells, cl, npix, oa, nbins, n_real=900,
        noise_std=ns)
    ratio = np.sqrt(np.diag(np.asarray(cov_m)) / np.diag(cov_a))
    assert np.all(np.abs(ratio - 1.0) < 0.10), ratio
    # noise must increase every variance
    _, cov_0 = s2.xi_pm_gaussian_covariance(npix, oa, ells, cl, nbins)
    assert np.all(np.diag(cov_a) > np.diag(cov_0))


def test_cosebis_covariance_propagation():
    npix, oa, nbins = 64, 2.0, 10
    ells = np.arange(2.0, 6000.0)
    cl = 2e-8 / (1 + (ells / 1500.0) ** 2) ** 1.2
    th, cov = s2.xi_pm_gaussian_covariance(npix, oa, ells, cl, nbins,
                                           theta_min_arcmin=2.0,
                                           theta_max_arcmin=65.0)
    cov_e, cov_b = s2.cosebis_covariance(th, cov, 4, 3.0, 50.0)
    assert cov_e.shape == (4, 4) and cov_b.shape == (4, 4)
    for c in (cov_e, cov_b):
        assert np.allclose(c, c.T, atol=1e-20)
        assert np.all(np.linalg.eigvalsh(c) > -1e-22)
    assert np.all(np.diag(cov_e) > 0)
    # consistency with direct MC propagation through the same transform
    _, _, cov_m, samples = s2.xi_pm_sample_covariance(
        jax.random.PRNGKey(2), ells, cl, npix, oa, nbins, n_real=400,
        theta_min_arcmin=2.0, theta_max_arcmin=65.0)
    es = []
    for srow in np.asarray(samples)[:200]:
        e, b = s2.cosebis_from_xipm(th, srow[:nbins], srow[nbins:], 4,
                                    3.0, 50.0)
        es.append(np.asarray(e))
    var_mc = np.var(np.asarray(es), axis=0, ddof=1)
    ratio = var_mc / np.diag(cov_e)
    # 200 realizations: ~10% stderr on a variance; allow 4 sigma
    assert np.all((ratio > 0.6) & (ratio < 1.6)), ratio


def test_gamma_t_from_cl_is_j2():
    from scipy.special import jv

    ells = np.arange(2.0, 20000.0)
    cl = _smooth_cl(ells, amp=3e-9, l0=500.0)
    th, gt = s2.gamma_t_from_cl(ells, cl)
    th = np.asarray(th)
    j = int(np.argmin(np.abs(th - 10.0 * ARCMIN)))
    ex = np.sum(ells * cl * jv(2, ells * th[j])) / (2 * np.pi)
    assert abs(float(gt[j]) / ex - 1.0) < 2e-3


@pytest.mark.slow
def test_xipm_survey_fisher():
    from astrild_tpu.ops.forecast import xipm_survey_fisher

    out = xipm_survey_fisher({"Om0": 0.3, "sigma8": 0.8}, npix=128,
                             opening_angle_deg=5.0, nbins=8,
                             theta_min_arcmin=3.0, z_source=1.0,
                             nell=256, nchi=64, n_fields=1)
    F = out["fisher"]
    assert F.shape == (2, 2)
    assert np.allclose(F, F.T, rtol=1e-5)
    assert np.all(np.linalg.eigvalsh(F) > 0)  # positive definite
    assert np.all(out["marginalized"] > 0)
    # more fields -> tighter constraints by exactly sqrt(n)
    out4 = xipm_survey_fisher({"Om0": 0.3, "sigma8": 0.8}, npix=128,
                              opening_angle_deg=5.0, nbins=8,
                              theta_min_arcmin=3.0, z_source=1.0,
                              nell=256, nchi=64, n_fields=4)
    assert np.allclose(out4["marginalized"],
                       out["marginalized"] / 2.0, rtol=1e-4)


def test_xi_pm_from_cl_grid_is_differentiable_and_consistent():
    ell = np.geomspace(2.0, 20000.0, 1024)
    cl = jnp.asarray(1e-8 / (1 + (ell / 800.0) ** 2) ** 1.5, jnp.float32)

    # consistency with the table route on the same grid
    th_g, xp_g, xm_g = s2.xi_pm_from_cl_grid(ell, cl)
    sel = (np.asarray(th_g) > 2 * ARCMIN) & (np.asarray(th_g) < 60 * ARCMIN)

    def amp_to_xip(a):
        _, xp, _ = s2.xi_pm_from_cl_grid(ell, a * cl)
        return jnp.sum(xp[sel])

    g = jax.grad(amp_to_xip)(1.0)
    # xi is linear in the amplitude: grad == value at a=1
    assert np.isclose(float(g), float(jnp.sum(xp_g[sel])), rtol=1e-4)


def test_xi_pm_curved_roundtrip_and_flat_limit():
    from astrild_tpu.ops.shear_2pt import (xi_pm_from_cl_curved,
                                           gamma_t_from_cl_curved)
    from astrild_tpu.ops.sht_spin import _wigner_d_l_rows

    lmax = 256
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl_e = np.where(ell >= 2, 1e-8 / (1 + (ell / 60.0) ** 2) ** 1.2, 0.0)
    cl_b = 0.3 * cl_e

    # exact Gauss-Legendre roundtrip: recover C_E + C_B from xi_plus
    # through d^l_{22} orthogonality (Int d22 d22' dx = 2 delta / (2l+1))
    ngl = 2 * lmax + 4
    x, w = np.polynomial.legendre.leggauss(ngl)
    theta = np.arccos(x)
    xip, xim = xi_pm_from_cl_curved(cl_e, theta, cl_b=cl_b)
    d22 = _wigner_d_l_rows(lmax, x, 2, 2)
    rec = 2.0 * np.pi * (d22 * w[None, :]) @ xip
    tot = cl_e + cl_b
    sel = ell >= 2
    assert np.allclose(rec[sel], tot[sel], rtol=1e-8, atol=1e-18)

    # pure-B sign: xi_minus flips, xi_plus unchanged
    xp2, xm2 = xi_pm_from_cl_curved(cl_b, theta, cl_b=cl_e)
    assert np.allclose(xp2, xip, rtol=1e-10)

    # flat-sky limit at small theta for a high-ell spectrum
    ells_f = np.arange(2.0, 4000.0)
    cl_f = 1e-8 * np.exp(-((ells_f - 1200.0) / 300.0) ** 2)
    cl_full = np.zeros(4000)
    cl_full[2:] = cl_f
    th_am = np.array([3.0, 6.0, 12.0]) * ARCMIN
    xp_c, xm_c = xi_pm_from_cl_curved(cl_full, th_am)
    tt, xp_fl, xm_fl = s2.xi_pm_from_cl(ells_f, cl_f)
    xp_i = np.interp(th_am, np.asarray(tt), np.asarray(xp_fl))
    xm_i = np.interp(th_am, np.asarray(tt), np.asarray(xm_fl))
    assert np.allclose(xp_c, xp_i, rtol=5e-3)
    assert np.allclose(xm_c, xm_i, rtol=5e-3)

    # gamma_t: curved vs flat J2, and the kappa-variant factor
    gt_c = gamma_t_from_cl_curved(cl_full, th_am)
    _, gt_f = s2.gamma_t_from_cl(ells_f, cl_f)
    gt_i = np.interp(th_am, np.asarray(tt), np.asarray(gt_f))
    assert np.allclose(gt_c, gt_i, rtol=5e-3)
    gt_k = gamma_t_from_cl_curved(cl_full, th_am, cross_with="kappa")
    # at ell ~ 1200 the spin factor is ~1 - 3/l^2: within 0.3%
    assert np.allclose(gt_k, gt_c, rtol=5e-3)


@pytest.mark.slow
def test_skyhealpix_shear_xi_pm_facade():
    from astrild_tpu.models.skyhealpix import SkyHealpix
    from astrild_tpu.ops.shear_2pt import xi_pm_from_cl_curved

    nside, lmax = 64, 128
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl = np.where(ell >= 2, 1e-6 / (1 + (ell / 40.0) ** 2) ** 1.5, 0.0)
    sky = SkyHealpix.from_Cl_array(cl, "kappa_2", nside, lmax=lmax,
                                   rnd_seed=7)
    sky.shear_from_kappa(lmax=lmax)
    th_am = np.array([30.0, 60.0, 120.0, 240.0])
    xp, xm = sky.shear_xi_pm(th_am, lmax=lmax)
    # same-realization truth: the map's own E-spectrum transformed
    ce, cb, _ = sky.shear_eb_spectra(lmax=lmax)
    xp_t, xm_t = xi_pm_from_cl_curved(ce, th_am * ARCMIN, cl_b=cb)
    assert np.allclose(xp, xp_t, rtol=1e-6)
    # and within sample variance of the input-Cl prediction
    xp_in, _ = xi_pm_from_cl_curved(cl, th_am * ARCMIN)
    assert np.all(np.abs(xp - xp_in) < 0.5 * np.abs(xp_in) + 1e-9)


@pytest.mark.slow
def test_cl_kappa_limber_nz():
    from astrild_tpu.utils.cosmology import Cosmology
    from astrild_tpu.ops.angular_power import (cl_kappa_limber,
                                               cl_kappa_limber_nz,
                                               smail_nz)

    cosmo = Cosmology()
    ells = jnp.asarray([50.0, 200.0, 800.0])
    # near-delta n(z) recovers the single source plane
    zt = np.linspace(0.99, 1.01, 51)
    nz = np.exp(-(((zt - 1.0) / 0.002) ** 2))
    c_nz = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt, nz))
    c_sp = np.asarray(cl_kappa_limber(ells, cosmo, z_source=1.0))
    assert np.allclose(c_nz, c_sp, rtol=1e-4)
    # broad Smail: normalization-invariant and bracketed by the
    # min/max source-plane spectra
    zt2 = np.linspace(0.01, 3.0, 200)
    nz2 = np.asarray(smail_nz(zt2, z0=0.64))
    cb = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt2, nz2))
    cb2 = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt2, 7.3 * nz2))
    assert np.allclose(cb, cb2, rtol=1e-6)
    lo = np.asarray(cl_kappa_limber(ells, cosmo, z_source=0.5))
    hi = np.asarray(cl_kappa_limber(ells, cosmo, z_source=2.0))
    assert np.all((cb > lo) & (cb < hi))
    # cross bin: symmetric in the two distributions, auto when equal
    zt3 = np.linspace(0.01, 2.0, 150)
    nz3 = np.asarray(smail_nz(zt3, z0=0.4))
    cx = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt2, nz2,
                                       z_tab2=zt3, nz_tab2=nz3))
    cx2 = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt3, nz3,
                                        z_tab2=zt2, nz_tab2=nz2))
    assert np.allclose(cx, cx2, rtol=1e-5)
    auto = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt2, nz2,
                                         z_tab2=zt2, nz_tab2=nz2))
    assert np.allclose(auto, cb, rtol=1e-6)
    # cross < geometric mean of autos (Cauchy-Schwarz)
    auto3 = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt3, nz3))
    assert np.all(cx < np.sqrt(cb * auto3))
    # differentiable (the Fisher path)
    g = jax.grad(lambda om: jnp.sum(cl_kappa_limber_nz(
        ells, Cosmology(Om0=om), zt2, nz2)))(0.3)
    assert np.isfinite(float(g)) and float(g) > 0


@pytest.mark.slow
def test_xipm_fisher_with_nz():
    from astrild_tpu.ops.forecast import xipm_survey_fisher
    from astrild_tpu.ops.angular_power import smail_nz

    zt = np.linspace(0.01, 3.0, 120)
    out = xipm_survey_fisher({"Om0": 0.3, "sigma8": 0.8}, npix=128,
                             opening_angle_deg=5.0, nbins=8,
                             theta_min_arcmin=3.0, nell=192, nchi=48,
                             nz=(zt, np.asarray(smail_nz(zt, z0=0.64))))
    assert np.all(np.linalg.eigvalsh(out["fisher"]) > 0)
    assert np.all(out["marginalized"] > 0)


def test_nla_intrinsic_alignments():
    from astrild_tpu.utils.cosmology import Cosmology
    from astrild_tpu.ops.angular_power import cl_kappa_limber_nz, smail_nz

    cosmo = Cosmology()
    ells = jnp.asarray([50.0, 200.0, 800.0])
    zt = np.linspace(0.01, 3.0, 200)
    nz = np.asarray(smail_nz(zt, z0=0.64))
    c0 = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt, nz))
    c1 = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt, nz, a_ia=1.0))
    cm1 = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt, nz, a_ia=-1.0))
    c2 = np.asarray(cl_kappa_limber_nz(ells, cosmo, zt, nz, a_ia=2.0))
    # exactly quadratic in A_IA: C(A) = GG + A GI + A^2 II
    gi = (c1 - cm1) / 2
    ii = (c1 + cm1) / 2 - c0
    assert np.allclose(c2, c0 + 2 * gi + 4 * ii, rtol=1e-5)
    assert np.all(gi < 0)   # GI anti-correlates shear and alignment
    assert np.all(ii > 0)   # II is a positive auto power
    # realistic magnitude: few-to-ten percent suppression at A = 1
    assert np.all((c1 / c0 > 0.8) & (c1 / c0 < 0.99))


@pytest.mark.slow
def test_xipm_fisher_with_ia_nuisance():
    from astrild_tpu.ops.forecast import xipm_survey_fisher
    from astrild_tpu.ops.angular_power import smail_nz

    zt = np.linspace(0.01, 3.0, 120)
    nz = (zt, np.asarray(smail_nz(zt, z0=0.64)))
    kw = dict(npix=128, opening_angle_deg=5.0, nbins=8,
              theta_min_arcmin=3.0, nell=192, nchi=48, nz=nz)
    out2 = xipm_survey_fisher({"Om0": 0.3, "sigma8": 0.8, "A_IA": 1.0},
                              **kw)
    assert out2["names"] == ["Om0", "sigma8", "A_IA"]
    assert np.all(np.linalg.eigvalsh(out2["fisher"]) > 0)
    # marginalizing the IA nuisance degrades the cosmology constraints
    out0 = xipm_survey_fisher({"Om0": 0.3, "sigma8": 0.8}, **kw)
    assert out2["marginalized"][0] > out0["marginalized"][0]
    # IA params without nz raise
    with pytest.raises(ValueError):
        xipm_survey_fisher({"Om0": 0.3, "A_IA": 1.0}, npix=64,
                           opening_angle_deg=5.0, nbins=6)


@pytest.mark.slow
def test_review_regressions():
    """Fixes from the round-3 code review: z=0 n(z) tables, shard-size
    validation, facade interval guard."""
    from astrild_tpu.utils.cosmology import Cosmology
    from astrild_tpu.ops.angular_power import cl_kappa_limber_nz, smail_nz

    # (1) n(z) table starting at z = 0 must not NaN (chi_s(0) = 0)
    cosmo = Cosmology()
    zt = np.linspace(0.0, 3.0, 100)
    cl = np.asarray(cl_kappa_limber_nz(jnp.asarray([100.0, 500.0]),
                                       cosmo, zt,
                                       np.asarray(smail_nz(zt))))
    assert np.all(np.isfinite(cl)) and np.all(cl > 0)

    # (2) pair tiles reject non-multiple / too-small chunks loudly
    with pytest.raises(ValueError, match="multiples of block"):
        s2._shear_pair_tiles(*(jnp.zeros(100),) * 10,
                             jnp.asarray([1.0, 2.0]), 1, None, 64, True)

    # (4) facade cosebis names the achievable theta_max instead of an
    # opaque interior coverage error
    from astrild_tpu.models.skymap import SkyArray
    rng = np.random.default_rng(0)
    sa = SkyArray.from_array(rng.normal(size=(128, 128)).astype(np.float32),
                             5.0, "kappa_2")
    sa.data["shearx"] = jnp.asarray(
        rng.normal(size=(128, 128)).astype(np.float32))
    sa.data["sheary"] = jnp.asarray(
        rng.normal(size=(128, 128)).astype(np.float32))
    with pytest.raises(ValueError, match="coverable"):
        sa.cosebis(3, 3.0, 150.0)  # theta_max at the half-box


def test_cosebis_facade_empty_interval_guard():
    from astrild_tpu.models.skymap import SkyArray

    rng = np.random.default_rng(0)
    sa = SkyArray.from_array(
        rng.normal(size=(128, 128)).astype(np.float32), 5.0, "kappa_2")
    sa.data["shearx"] = jnp.asarray(
        rng.normal(size=(128, 128)).astype(np.float32))
    sa.data["sheary"] = jnp.asarray(
        rng.normal(size=(128, 128)).astype(np.float32))
    # sub-pixel interval: NO annulus has pairs — must raise the
    # informative error, not an IndexError on an empty array
    with pytest.raises(ValueError, match="coverable"):
        sa.cosebis(3, 0.02, 0.08)


@pytest.mark.slow
def test_cl_galaxy_limber_and_gamma_t_pipeline():
    from astrild_tpu.utils.cosmology import Cosmology
    from astrild_tpu.ops.angular_power import (cl_galaxy_limber_nz,
                                               cl_kappa_limber_nz,
                                               cl_kappa_limber, smail_nz)

    cosmo = Cosmology()
    ells = jnp.asarray(np.geomspace(10, 2000, 24), jnp.float32)
    zl = np.linspace(0.15, 0.45, 80)
    nl = np.exp(-(((zl - 0.3) / 0.05) ** 2))
    zs = np.linspace(0.01, 3.0, 150)
    ns = np.asarray(smail_nz(zs, z0=0.64))
    cgg = np.asarray(cl_galaxy_limber_nz(ells, cosmo, zl, nl, bias=1.8))
    cgk = np.asarray(cl_galaxy_limber_nz(ells, cosmo, zl, nl, bias=1.8,
                                         kappa_nz=(zs, ns)))
    ckk = np.asarray(cl_kappa_limber_nz(ells, cosmo, zs, ns))
    assert np.all(cgg > 0) and np.all(cgk > 0)
    # Cauchy-Schwarz across the shared P(k, z)
    assert np.all(cgk ** 2 <= cgg * ckk * 1.0001)
    # bias scalings: gg ~ b^2, g-kappa ~ b
    assert np.allclose(
        np.asarray(cl_galaxy_limber_nz(ells, cosmo, zl, nl, bias=3.6)),
        4 * cgg, rtol=1e-5)
    assert np.allclose(
        np.asarray(cl_galaxy_limber_nz(ells, cosmo, zl, nl, bias=3.6,
                                       kappa_nz=(zs, ns))),
        2 * cgk, rtol=1e-5)
    # delta source plane variant consistent with a narrow kappa_nz
    zsd = np.linspace(0.99, 1.01, 41)
    nsd = np.exp(-(((zsd - 1.0) / 0.002) ** 2))
    c1 = np.asarray(cl_galaxy_limber_nz(ells, cosmo, zl, nl, bias=1.8,
                                        kappa_nz=(zsd, nsd)))
    c2 = np.asarray(cl_galaxy_limber_nz(ells, cosmo, zl, nl, bias=1.8,
                                        z_source=1.0))
    assert np.allclose(c1, c2, rtol=1e-3)
    # gamma_t theory end to end: positive tangential shear around lenses
    ell_full = np.geomspace(2, 20000, 512)
    cgk_f = np.asarray(cl_galaxy_limber_nz(
        jnp.asarray(ell_full, jnp.float32), cosmo, zl, nl, bias=1.8,
        kappa_nz=(zs, ns)))
    th, gt = s2.gamma_t_from_cl(ell_full, cgk_f)
    th_am = np.asarray(th) / ARCMIN
    sel = (th_am > 1) & (th_am < 100)
    assert np.all(np.asarray(gt)[sel] > 0)
    # differentiable in the bias nuisance
    g = jax.grad(lambda b: jnp.sum(cl_galaxy_limber_nz(
        ells, cosmo, zl, nl, bias=b, kappa_nz=(zs, ns))))(1.8)
    assert float(g) > 0


def test_w_theta_flat_and_curved():
    from astrild_tpu.ops.shear_2pt import (w_theta_from_cl,
                                           w_theta_from_cl_curved)

    # curved roundtrip: Legendre orthogonality recovers C_gg exactly
    lmax = 256
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl = np.where(ell >= 2, 1e-5 / (1 + (ell / 50.0) ** 2) ** 1.3, 0.0)
    ngl = 2 * lmax + 4
    x, wq = np.polynomial.legendre.leggauss(ngl)
    w = w_theta_from_cl_curved(cl, np.arccos(x))
    P = np.zeros((lmax + 1, ngl))
    P[0] = 1.0
    P[1] = x
    for l in range(2, lmax + 1):
        P[l] = ((2 * l - 1) * x * P[l - 1] - (l - 1) * P[l - 2]) / l
    rec = 2.0 * np.pi * (P * wq[None, :]) @ w
    sel = ell >= 2
    assert np.allclose(rec[sel], cl[sel], rtol=1e-6, atol=1e-18)
    # flat-sky limit at small theta for a high-ell spectrum
    ells_f = np.arange(2.0, 4000.0)
    cl_f = 1e-6 * np.exp(-(((ells_f - 1200.0) / 300.0) ** 2))
    cl_full = np.zeros(4000)
    cl_full[2:] = cl_f
    th_am = np.array([3.0, 6.0, 12.0]) * ARCMIN
    wc = w_theta_from_cl_curved(cl_full, th_am)
    tt, wf = w_theta_from_cl(ells_f, cl_f)
    wi = np.interp(th_am, np.asarray(tt), np.asarray(wf))
    assert np.allclose(wc, wi, rtol=5e-3)


@pytest.mark.slow
def test_tomographic_xi_pm_sample_covariance():
    npix, oa, nbins = 64, 2.0, 5
    ells = np.arange(2.0, 6000.0)
    cl = 2e-8 / (1 + (ells / 1500.0) ** 2) ** 1.2
    # nb = 1 reduces to the single-bin sampler statistics
    th, pairs, mean_t, cov_t, _ = s2.tomographic_xi_pm_sample_covariance(
        jax.random.PRNGKey(0), ells, cl[None, None, :], npix, oa, nbins,
        n_real=500)
    assert pairs == [(0, 0)]
    _, cov_a = s2.xi_pm_gaussian_covariance(npix, oa, ells, cl, nbins)
    ratio = np.sqrt(np.diag(np.asarray(cov_t)) / np.diag(cov_a))
    assert np.all(np.abs(ratio - 1.0) < 0.15), ratio
    # two INDEPENDENT equal bins: Wick pairing gives
    # Var[xi^{01}] = (1/2) Var[xi^{00}] and disjoint pairs decorrelate
    stack2 = np.zeros((2, 2, ells.size))
    stack2[0, 0] = cl
    stack2[1, 1] = cl
    th2, pairs2, m2, c2, _ = s2.tomographic_xi_pm_sample_covariance(
        jax.random.PRNGKey(1), ells, stack2, npix, oa, nbins, n_real=500)
    assert pairs2 == [(0, 0), (0, 1), (1, 1)]
    c2 = np.asarray(c2)
    v_auto = np.diag(c2)[:nbins]              # xi+ of (0,0)
    v_cross = np.diag(c2)[2 * nbins:3 * nbins]  # xi+ of (0,1)
    assert np.all(np.abs(v_cross / v_auto - 0.5) < 0.15)
    # cross-pair mean vanishes for independent bins
    assert np.all(np.abs(np.asarray(m2)[2 * nbins:4 * nbins])
                  < 0.1 * np.abs(np.asarray(m2)[:nbins]).max())
    blk = c2[:nbins, 4 * nbins:5 * nbins]
    corr = blk / np.sqrt(np.outer(v_auto,
                                  np.diag(c2)[4 * nbins:5 * nbins]))
    assert np.max(np.abs(corr)) < 0.2  # (0,0) x (1,1) decorrelated
    # PERFECTLY correlated identical bins: every pair row identical
    stack3 = np.ones((2, 2, 1)) * 0 + cl[None, None, :]
    _, _, m3, c3, _ = s2.tomographic_xi_pm_sample_covariance(
        jax.random.PRNGKey(2), ells, np.broadcast_to(
            cl, (2, 2, ells.size)).copy(), npix, oa, nbins, n_real=60)
    m3 = np.asarray(m3)
    assert np.allclose(m3[:2 * nbins], m3[2 * nbins:4 * nbins],
                       rtol=1e-4)
    assert np.allclose(m3[:2 * nbins], m3[4 * nbins:], rtol=1e-4)
