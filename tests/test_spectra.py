"""Linear power (EH98), angular Cl, ISW Limber Cl, bispectrum tests."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import angular_power as AP
from astrild_tpu.ops import bispectrum as BS
from astrild_tpu.ops import linear_power as LP
from astrild_tpu.ops import power as PS
from astrild_tpu.utils.cosmology import Cosmology


@pytest.fixture(scope="module")
def cosmo():
    return Cosmology(Om0=0.3089, Ob0=0.0486, h=0.6774, ns=0.9667,
                     sigma8=0.8159)


# ------------------------------------------------------------ linear power
def test_sigma8_normalization_roundtrip(cosmo):
    amp = LP.normalization(cosmo)
    s8 = LP.sigma_r(8.0, cosmo, amplitude=amp)
    npt.assert_allclose(float(s8), 0.8159, rtol=1e-4)


def test_linear_power_slope_low_k(cosmo):
    # P ~ k^ns well above the horizon (T -> 1)
    k = jnp.array([1e-4, 2e-4])
    p = LP.linear_power(k, cosmo)
    slope = float(jnp.log(p[1] / p[0]) / jnp.log(2.0))
    npt.assert_allclose(slope, 0.9667, rtol=1e-2)


def test_linear_power_turnover(cosmo):
    # P(k) peaks near k_eq ~ 0.01-0.02 h/Mpc
    k = jnp.logspace(-3, 0, 128)
    p = LP.linear_power(k, cosmo)
    kpeak = float(k[jnp.argmax(p)])
    assert 0.005 < kpeak < 0.03


def test_linear_power_growth_scaling(cosmo):
    k = jnp.array([0.1])
    p0 = LP.linear_power(k, cosmo, z=0.0)
    p1 = LP.linear_power(k, cosmo, z=1.0)
    d1 = float(cosmo.growth_factor(1.0))
    npt.assert_allclose(float(p1[0] / p0[0]), d1 ** 2, rtol=1e-5)


def test_bao_wiggles_present(cosmo):
    # transfer ratio to a zero-baryon cosmology oscillates around BAO scale
    nobar = Cosmology(Om0=0.3089, Ob0=1e-4, h=0.6774, ns=0.9667,
                      sigma8=0.8159)
    k = jnp.linspace(0.05, 0.3, 200)
    r = LP.eh98_transfer(k, cosmo) / LP.eh98_transfer(k, nobar)
    # at least a couple of local extrema in the ratio
    d = np.sign(np.diff(np.asarray(r)))
    flips = np.sum(np.abs(np.diff(d)) > 0)
    assert flips >= 3


def test_p_dpdp_vanishes_for_eds():
    # Einstein-de-Sitter: f=1 -> D(1-f)=0 -> no linear ISW
    eds = Cosmology(Om0=1.0, Ob0=0.05, sigma8=0.8)
    out = LP.p_dpdp(jnp.array([0.1]), 0.5, eds)
    assert abs(float(out[0])) < 1e-2 * abs(
        float(LP.p_dpdp(jnp.array([0.1]), 0.5, Cosmology())[0]))


# ------------------------------------------------------------- flat-sky Cl
def test_cl_white_noise(rng):
    n = 256
    theta_deg = 5.0
    sig = 2.0
    img = jnp.asarray(rng.normal(0, sig, (n, n)).astype(np.float32))
    ell, cl = AP.cl_flat_sky(img, theta_deg, nbins=10)
    theta = np.deg2rad(theta_deg)
    expect = sig ** 2 * theta ** 2 / n ** 2  # white: Cl = sigma^2 A_pix
    npt.assert_allclose(np.asarray(cl), expect, rtol=0.15)


def test_cl_synthesis_roundtrip(rng):
    # draw a map from a power-law Cl, re-measure, compare
    n = 256
    theta_deg = 10.0
    ells = jnp.linspace(1.0, 20000.0, 512)
    cl_in = 1e-6 * (ells / 1000.0) ** -2.0
    img = AP.cl_to_flat_map(jax.random.PRNGKey(3), ells, cl_in, n, theta_deg)
    ell_out, cl_out = AP.cl_flat_sky(img, theta_deg, nbins=8)
    want = 1e-6 * (np.asarray(ell_out) / 1000.0) ** -2.0
    # sample variance per bin is sizeable; 25% agreement over bins
    npt.assert_allclose(np.asarray(cl_out)[1:-1], want[1:-1], rtol=0.3)


def test_cl_isw_limber_positive_and_decreasing(cosmo):
    ells = jnp.array([10.0, 30.0, 100.0, 300.0])
    cl = AP.cl_isw_limber(ells, cosmo, z_min=0.08, z_max=0.9)
    cl = np.asarray(cl)
    assert np.all(cl > 0)
    assert np.all(np.diff(cl) < 0)  # ISW dies off toward small scales


# -------------------------------------------------------------- bispectrum
def synth_grf(key, n, pk_fn, boxsize):
    """Gaussian random field with target isotropic P(k) (dimensionless
    delta_k convention)."""
    kf = 2 * np.pi / boxsize
    f = np.fft.fftfreq(n) * n
    m = np.sqrt(f[:, None, None] ** 2 + f[None, :, None] ** 2
                + f[None, None, :] ** 2)
    p = pk_fn(np.maximum(m, 1e-6) * kf)
    p[0, 0, 0] = 0.0
    amp = np.sqrt(p / boxsize ** 3) * n ** 3
    rng = np.random.default_rng(int(key))
    re = rng.normal(size=(n, n, n))
    modes = np.fft.fftn(re) / n ** 1.5  # white complex modes, unit variance
    g = np.real(np.fft.ifftn(modes * amp))
    return jnp.asarray(g.astype(np.float32))


def test_bispectrum_fnl_quadratic_field():
    """delta = g + fnl (g^2 - <g^2>) has B = 2 fnl [P1 P2 + P2 P3 + P3 P1]
    at tree level — the standard estimator validation. The field amplitude
    is kept perturbative (fnl * sigma_g^2 << 1) so loop terms stay small."""
    n, box = 64, 100.0
    pk = lambda k: 2.0 * np.exp(-k / 0.5)  # sigma_g^2 ~ 0.02
    g = np.asarray(synth_grf(7, n, pk, box))
    fnl = 1.0
    d = g + fnl * (g ** 2 - np.mean(g ** 2))
    res = BS.bispectrum_3d(1.0 + jnp.asarray(d), box, nbins=4, m_min=2.0,
                           m_max=20.0)
    # measured P(k) of g at the same shells
    pres = PS.auto_power(1.0 + jnp.asarray(g), box, nbins=30)
    kk = np.asarray(pres.k)
    pp = np.asarray(pres.power)

    def p_at(kv):
        return np.interp(kv, kk, pp)

    k1 = np.asarray(res.k1)
    k2 = np.asarray(res.k2)
    k3 = np.asarray(res.k3)
    want = 2 * fnl * (p_at(k1) * p_at(k2) + p_at(k2) * p_at(k3)
                      + p_at(k3) * p_at(k1))
    got = np.asarray(res.b)
    ok = np.asarray(res.ntri) > 1e5
    ratio = got[ok] / want[ok]
    # estimator agrees with the tree-level f_NL bispectrum
    npt.assert_allclose(np.median(ratio), 1.0, atol=0.15)

    # ... and the same Gaussian field alone gives a much smaller |B|
    resg = BS.bispectrum_3d(1.0 + jnp.asarray(g), box, nbins=4, m_min=2.0,
                            m_max=20.0)
    bg = np.asarray(resg.b)
    assert np.median(np.abs(bg[ok]) / np.abs(got[ok])) < 0.2


def test_bispectrum_band_limit_truncation_exact():
    """The coarse-grid (n_c) shell transforms are algebraically EXACT:
    with m_max < n_c/2 and 3*m_max < n_c there is no triple aliasing, so
    B from the truncated path equals the full-grid path to float32
    roundoff (not a binning approximation)."""
    n, box = 128, 300.0
    pk = lambda k: 5.0 * np.exp(-k / 0.4)
    g = synth_grf(3, n, pk, box)
    d = 1.0 + g

    # public path picks n_c=64 for m_max=16 on a 128 grid
    res_c = BS.bispectrum_3d(d, box, nbins=4, m_min=2.0, m_max=16.0)
    # full-grid path forced through the same core
    mean = jnp.mean(d)
    delta = d / mean - 1.0
    tables_full = BS.get_bispectrum_tables(n, 4, 2.0, 16.0)
    res_f = BS._bispectrum_core(delta, box, 4, *tables_full, n_c=None)

    # open triangles have ntri = O(1e-11) host-ifftn roundoff, not 0 —
    # compare with an absolute floor well below any real count (>= 1e5)
    npt.assert_allclose(np.asarray(res_c.ntri), np.asarray(res_f.ntri),
                        rtol=1e-6, atol=1.0)
    ok = np.asarray(res_f.ntri) > 1.0
    npt.assert_allclose(np.asarray(res_c.b)[ok], np.asarray(res_f.b)[ok],
                        rtol=2e-4)
    npt.assert_allclose(np.asarray(res_c.k1), np.asarray(res_f.k1),
                        rtol=1e-6)


def test_bispectrum_2d_chi2_positive():
    n = 128
    rng = np.random.default_rng(7)
    g = rng.normal(0, 1.0, (n, n)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    gs = gaussian_filter(g, 3.0)
    img = jnp.asarray(gs ** 2 - np.mean(gs ** 2))
    ell, b, ntri = BS.bispectrum_2d_equilateral(img, 5.0, nbins=8)
    b = np.asarray(b)
    # the smoothing (sigma=3 px) confines signal to the first shells; the
    # chi^2 field's equilateral bispectrum must be positive there
    assert b[0] > 0 and b[1] > 0
    # ... and dominate the noise-only high-ell shells by orders of magnitude
    assert abs(b[0]) > 100 * abs(b[-1])


def test_halofit_nonlinear_power():
    """Takahashi+12 halofit on the EH98 spectrum: linear at large
    scales, canonical nonlinear boost at k=1 (Delta^2_NL ~ 20, i.e.
    ratio ~5-7 — Smith03 fig. 14 regime), weaker boost at z=1, and
    stronger boost for higher sigma8."""
    from astrild_tpu.ops.linear_power import linear_power, nonlinear_power
    from astrild_tpu.utils.cosmology import Cosmology

    c = Cosmology()
    k_lin = np.array([0.01, 0.03, 0.05], np.float32)
    r_lin = np.asarray(nonlinear_power(k_lin, c)) \
        / np.asarray(linear_power(k_lin, c))
    npt.assert_allclose(r_lin, 1.0, atol=0.05)

    k1 = np.array([1.0], np.float32)
    r0 = float(nonlinear_power(k1, c)[0] / linear_power(k1, c)[0])
    assert 4.0 < r0 < 8.0, r0
    r1 = float(nonlinear_power(k1, c, z=1.0)[0]
               / linear_power(k1, c, z=1.0)[0])
    assert 1.5 < r1 < r0
    c_hi = Cosmology(sigma8=0.95)
    r_hi = float(nonlinear_power(k1, c_hi)[0] / linear_power(k1, c_hi)[0])
    assert r_hi > r0


def test_cl_kappa_nonlinear_boost():
    """Nonlinear kappa Cl exceeds linear at high ell, matches at low ell."""
    from astrild_tpu.ops.angular_power import cl_kappa_limber
    from astrild_tpu.utils.cosmology import Cosmology

    c = Cosmology()
    ells = np.array([50.0, 2000.0], np.float32)
    cl_l = np.asarray(cl_kappa_limber(ells, c, z_source=1.0, nchi=64))
    cl_n = np.asarray(cl_kappa_limber(ells, c, z_source=1.0, nchi=64,
                                      nonlinear=True))
    assert abs(cl_n[0] / cl_l[0] - 1.0) < 0.1     # linear regime
    assert cl_n[1] / cl_l[1] > 2.0                # deeply nonlinear


def test_position_dependent_power_gaussian_null_and_response():
    """iB vanishes for a Gaussian field; a quadratic (chi-squared-like)
    field delta + a*(delta^2 - <delta^2>) has a POSITIVE response at all
    k (local power grows where delta_b is high)."""
    import jax

    from astrild_tpu.ops import mocks
    from astrild_tpu.ops.power import position_dependent_power

    L, ng = 400.0, 64
    pk = lambda kk: 2.0e4 * kk / (1.0 + (kk / 0.04) ** 2) ** 2
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    resp_g, resp_q = [], []
    for key in keys:
        g = mocks.gaussian_field(key, ng, L, pk)
        k, ib_g, r_g, _, _ = position_dependent_power(g, L, n_sub=4,
                                                      nbins=6)
        q = g + 1.5 * (g ** 2 - jnp.mean(g ** 2))
        k, ib_q, r_q, _, _ = position_dependent_power(q, L, n_sub=4,
                                                      nbins=6)
        resp_g.append(np.asarray(r_g))
        resp_q.append(np.asarray(r_q))
    resp_g = np.nanmean(resp_g, axis=0)
    resp_q = np.nanmean(resp_q, axis=0)
    # quadratic coupling: strong positive response; Gaussian: consistent
    # with zero at the ensemble level (|resp| << the coupled case)
    assert (resp_q[1:] > 3.0).all()
    assert np.abs(resp_g[1:]).max() < 0.5 * resp_q[1:].min()
