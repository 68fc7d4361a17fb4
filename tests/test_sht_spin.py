"""Spin-2 SHT: Wigner-d convention pins, E/B round trip, B-mode null,
and the physical tangential-shear identity for an azimuthal lens."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from astrild_tpu.ops import sht, sht_spin
from astrild_tpu.utils import healpix as hpx

NSIDE = 32
LMAX = 64


# ------------------------------------------------------- d-matrix pins
def test_wigner_d_reproduces_scalar_legendre():
    x = np.linspace(-0.95, 0.95, 9)
    d0 = sht_spin.wigner_d_column(6, x, 0)
    lam = sht.legendre_table(6, x)
    for l in range(7):
        for m in range(l + 1):
            npt.assert_allclose(np.sqrt((2 * l + 1) / (4 * np.pi))
                                * d0[l, m], lam[l, m], atol=1e-12)


def test_wigner_d2_closed_forms():
    x = np.linspace(-0.9, 0.9, 11)
    beta = np.arccos(x)
    d = sht_spin.wigner_d_column(4, x, 2)
    npt.assert_allclose(d[2, 2], ((1 + x) / 2) ** 2, atol=1e-12)
    npt.assert_allclose(d[2, 1], -(1 + x) / 2 * np.sin(beta), atol=1e-12)
    npt.assert_allclose(d[2, 0], np.sqrt(6) / 4 * np.sin(beta) ** 2,
                        atol=1e-12)
    dm = sht_spin.wigner_d_column(4, x, -2)
    # d^l_{-2,m} = (-1)^m d^l_{2,m}(pi - beta) * (-1)^l... check the
    # simplest known forms directly instead:
    npt.assert_allclose(dm[2, 2], ((1 - x) / 2) ** 2, atol=1e-12)
    npt.assert_allclose(dm[2, 0], np.sqrt(6) / 4 * np.sin(beta) ** 2,
                        atol=1e-12)


# ------------------------------------------------------ transform pair
def _random_alms(rng, lmax, lmin=2):
    lg = np.arange(lmax + 1)[:, None]
    mg = np.arange(lmax + 1)[None, :]
    valid = (mg <= lg) & (lg >= lmin)
    re = rng.normal(0, 1, (lmax + 1, lmax + 1)) * valid
    im = rng.normal(0, 1, (lmax + 1, lmax + 1)) * valid * (mg > 0)
    return re.astype(np.float32), im.astype(np.float32)


def test_spin2_roundtrip():
    rng = np.random.default_rng(0)
    er, ei = _random_alms(rng, LMAX)
    br, bi = _random_alms(rng, LMAX)
    # band-limit safely below the pixel scale
    er[40:] = ei[40:] = br[40:] = bi[40:] = 0.0
    tab = sht_spin.spin2_tables(NSIDE, LMAX)
    q, u = sht_spin.synthesize_spin2(er, ei, br, bi, NSIDE, LMAX,
                                     tables=tab)
    er2, ei2, br2, bi2 = sht_spin.analyze_spin2(q, u, NSIDE, LMAX,
                                                niter=3, tables=tab)
    scale = np.abs(er).max()
    npt.assert_allclose(np.asarray(er2), er, atol=2e-3 * scale)
    npt.assert_allclose(np.asarray(ei2), ei, atol=2e-3 * scale)
    npt.assert_allclose(np.asarray(br2), br, atol=2e-3 * scale)
    npt.assert_allclose(np.asarray(bi2), bi, atol=2e-3 * scale)


def test_pure_e_gives_null_b():
    rng = np.random.default_rng(1)
    er, ei = _random_alms(rng, LMAX)
    er[40:] = ei[40:] = 0.0
    z = np.zeros_like(er)
    tab = sht_spin.spin2_tables(NSIDE, LMAX)
    q, u = sht_spin.synthesize_spin2(er, ei, z, z, NSIDE, LMAX, tables=tab)
    ee, bb, eb = sht_spin.anafast_spin2(q, u, LMAX, niter=3, tables=tab)
    ee = np.asarray(ee)[2:40]
    bb = np.asarray(bb)[2:40]
    assert bb.sum() < 2e-4 * ee.sum(), (bb.sum(), ee.sum())


def test_synfast_spin2_spectra():
    lmax = 48
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl_ee = np.zeros(lmax + 1); cl_ee[2:] = 10.0 / (ell[2:] + 5.0) ** 2
    cl_bb = 0.3 * cl_ee
    tab = sht_spin.spin2_tables(NSIDE, lmax)
    ees, bbs = [], []
    for s in range(8):
        q, u = sht_spin.synfast_spin2(jax.random.PRNGKey(s), cl_ee, cl_bb,
                                      NSIDE, lmax, tables=tab)
        ee, bb, _ = sht_spin.anafast_spin2(q, u, lmax, niter=3,
                                           tables=tab)
        ees.append(np.asarray(ee)); bbs.append(np.asarray(bb))
    r_ee = np.mean(ees, 0)[4:40].mean() / cl_ee[4:40].mean()
    r_bb = np.mean(bbs, 0)[4:40].mean() / cl_bb[4:40].mean()
    assert abs(r_ee - 1) < 0.1, r_ee
    assert abs(r_bb - 1) < 0.1, r_bb


def test_skyhealpix_shear_facade():
    """Model-level spin-2: kappa layer -> gamma layers -> EE/BB, with the
    B channel null for a Born (pure-E) map."""
    from astrild_tpu.models import SkyHealpix

    nside, lmax = 32, 48
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl = np.zeros(lmax + 1); cl[2:] = 1.0 / ell[2:] ** 2
    sky = SkyHealpix.from_Cl_array(cl, "kappa_2", nside, lmax=lmax,
                                   rnd_seed=1)
    g1, g2 = sky.shear_from_kappa(lmax=lmax)
    assert g1.shape == (hpx.nside2npix(nside),)
    ee, bb, eb = sky.shear_eb_spectra(lmax=lmax)
    assert bb[2:40].sum() < 1e-3 * ee[2:40].sum()
    # EE tracks the kappa spectrum scaled by the l-factor
    kl = np.asarray(sht.anafast(jnp.asarray(sky.data["orig"]), lmax))
    fac = (ell + 2) * (ell - 1) / np.maximum(ell * (ell + 1), 1)
    r = ee[4:40] / (kl * fac)[4:40]
    assert np.all(np.abs(r - 1) < 0.1), r


# ------------------------------------------------ physics: gamma_t law
def test_tangential_shear_identity():
    """Azimuthal kappa about the pole: U must vanish identically and
    -Q(theta) must satisfy the aperture identity gamma_t = kappa_bar(<th)
    - kappa(th) in the small-angle limit — this pins the spin-2 AMPLITUDE
    and SIGN physically, not just round-trip consistency."""
    nside, lmax = 64, 128
    sigma = np.radians(3.0)
    ell = np.arange(lmax + 1, dtype=np.float64)
    k_re = np.zeros((lmax + 1, lmax + 1), np.float32)
    k_re[:, 0] = (np.sqrt((2 * ell + 1) / (4 * np.pi))
                  * np.exp(-ell * (ell + 1) * sigma ** 2 / 2)).astype(
                      np.float32)
    k_im = np.zeros_like(k_re)
    kappa = np.asarray(sht.synthesize(k_re, k_im, nside, lmax))
    er, ei = sht_spin.kappa_alm_to_shear_alm(jnp.asarray(k_re),
                                             jnp.asarray(k_im))
    z = jnp.zeros_like(er)
    q, u = sht_spin.synthesize_spin2(er, ei, z, z, nside, lmax)
    q = np.asarray(q); u = np.asarray(u)
    assert np.abs(u).max() < 1e-4 * np.abs(q).max()  # azimuthal lens

    # The chosen kappa_l0 = sqrt(2l+1) exp(-l(l+1) sigma^2/2) is, in the
    # flat limit, an exact Gaussian kappa(theta) = K exp(-theta^2/2s^2)
    # with K = 1/(2 pi sigma^2); the tangential shear of a Gaussian
    # lens has the closed form gamma_t = kbar(<th) - kappa(th) =
    # K [ (2 s^2/th^2)(1 - e^{-th^2/2s^2}) - e^{-th^2/2s^2} ].
    geo = sht.ring_geometry(nside)
    sizes = geo.mask.sum(1).astype(int)
    starts = np.concatenate([[0], np.cumsum(sizes)])
    K = 1.0 / (2.0 * np.pi * sigma ** 2)
    got, want, kap_chk = [], [], []
    for r in range(len(sizes)):
        th = geo.theta[r]
        if 1.5 * sigma < th < 5 * sigma:
            e = np.exp(-th ** 2 / (2 * sigma ** 2))
            got.append(-q[starts[r]:starts[r + 1]].mean())
            want.append(K * ((2 * sigma ** 2 / th ** 2) * (1 - e) - e))
            kap_chk.append((kappa[starts[r]:starts[r + 1]].mean(), K * e))
    got = np.asarray(got); want = np.asarray(want)
    # sanity: the synthesized kappa really is that Gaussian (flat limit)
    km, ka = np.array(kap_chk).T
    npt.assert_allclose(km, ka, rtol=0.05, atol=0.01 * ka.max())
    npt.assert_allclose(got, want, rtol=0.05,
                        atol=0.02 * np.abs(want).max())
