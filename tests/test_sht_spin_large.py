"""Large-lmax spin-2 transforms: equivalence with the exact table path,
clean sub-Nyquist round trip, and the documented super-Nyquist band
behavior (same physics as the scalar sht_large)."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from astrild_tpu.ops import sht_spin, sht_spin_large
from astrild_tpu.ops.sht import alm2cl


def _rand_alms(rng, lmax, lmin=2):
    lg = np.arange(lmax + 1)[:, None]
    mg = np.arange(lmax + 1)[None, :]
    valid = (mg <= lg) & (lg >= lmin)
    re = (rng.normal(0, 1, (lmax + 1,) * 2) * valid).astype(np.float32)
    im = (rng.normal(0, 1, (lmax + 1,) * 2) * valid
          * (mg > 0)).astype(np.float32)
    return re, im


def test_seed_closed_forms():
    x = np.linspace(-0.9, 0.9, 9)
    dm = sht_spin.wigner_d_column(4, x, -2)
    s = np.sqrt(1 - x * x)
    npt.assert_allclose(dm[2, 1], (1 - x) / 2 * s, atol=1e-12)
    dp = sht_spin.wigner_d_column(4, x, 2)
    npt.assert_allclose(dp[2, 1], -(1 + x) / 2 * s, atol=1e-12)


def test_synthesis_matches_table_path():
    """The scan path must reproduce the float64-table synthesis exactly
    (both are the same operator) — including the lmax = 3*nside-1 band."""
    for nside, lmax in ((16, 32), (32, 95)):
        rng = np.random.default_rng(0)
        er, ei = _rand_alms(rng, lmax)
        br, bi = _rand_alms(rng, lmax)
        qt, ut = sht_spin.synthesize_spin2(er, ei, br, bi, nside, lmax)
        ql, ul = sht_spin_large.synthesize_spin2_large(er, ei, br, bi,
                                                       nside, lmax)
        scale = float(np.abs(np.asarray(qt)).max())
        npt.assert_allclose(np.asarray(ql), np.asarray(qt),
                            atol=3e-5 * scale)
        npt.assert_allclose(np.asarray(ul), np.asarray(ut),
                            atol=3e-5 * scale)


def test_roundtrip_sub_nyquist():
    nside = 16
    lmax = 2 * nside
    rng = np.random.default_rng(1)
    er, ei = _rand_alms(rng, lmax)
    br, bi = _rand_alms(rng, lmax)
    q, u = sht_spin_large.synthesize_spin2_large(er, ei, br, bi, nside,
                                                 lmax)
    out = sht_spin_large.analyze_spin2_large(q, u, nside, lmax, niter=3)
    scale = np.abs(er).max()
    for got, want in zip(out, (er, ei, br, bi)):
        npt.assert_allclose(np.asarray(got), want, atol=2e-4 * scale)


def test_super_nyquist_band_spectra():
    """lmax = 3*nside-1: the sub-2*nside band must be exact, the aliased
    high band within the documented few-percent LS floor, and B null for
    a pure-E field."""
    nside, lmax = 32, 95
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl = np.zeros(lmax + 1, np.float32)
    cl[2:] = 1.0 / (ell[2:] * (ell[2:] + 1.0))
    rng = np.random.default_rng(0)
    lg = np.arange(lmax + 1)[:, None]
    mg = np.arange(lmax + 1)[None, :]
    valid = (mg <= lg) & (lg >= 2)
    sig = np.sqrt(cl)[:, None]
    er = (rng.normal(0, 1, (lmax + 1,) * 2) * sig * valid).astype(
        np.float32)
    ei = (rng.normal(0, 1, (lmax + 1,) * 2) * sig * valid
          * (mg > 0)).astype(np.float32)
    er = np.where(mg == 0, er, er * np.sqrt(0.5))
    ei = ei * np.sqrt(0.5)
    z = np.zeros_like(er)
    cl_real = np.asarray(alm2cl(jnp.asarray(er), jnp.asarray(ei)))
    q, u = sht_spin_large.synthesize_spin2_large(er, ei, z, z, nside,
                                                 lmax)
    ee, bb, eb = sht_spin_large.anafast_spin2_large(q, u, lmax, niter=6)
    ee = np.asarray(ee)
    bb = np.asarray(bb)
    mid = (ell > 4) & (ell <= 2 * nside)
    hi = ell > 0.7 * lmax
    assert abs(ee[mid].mean() / cl_real[mid].mean() - 1) < 0.005
    assert abs(ee[hi].mean() / cl_real[hi].mean() - 1) < 0.03
    assert bb[2:].sum() < 1e-3 * ee[2:].sum()


def test_skyhealpix_routes_large_shear():
    """SkyHealpix shear methods use the scan path above the table limit
    (exercised here by forcing a tiny limit)."""
    from astrild_tpu.models import SkyHealpix, skyhealpix

    nside, lmax = 32, 48
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl = np.zeros(lmax + 1)
    cl[2:] = 1.0 / ell[2:] ** 2
    sky = SkyHealpix.from_Cl_array(cl, "kappa_2", nside, lmax=lmax,
                                   rnd_seed=3)
    old = skyhealpix._TABLE_LMAX_LIMIT
    try:
        skyhealpix._TABLE_LMAX_LIMIT = 8   # force the large path
        g1, g2 = sky.shear_from_kappa(lmax=lmax)
        ee, bb, eb = sky.shear_eb_spectra(lmax=lmax)
    finally:
        skyhealpix._TABLE_LMAX_LIMIT = old
    assert np.all(np.isfinite(g1)) and np.all(np.isfinite(g2))
    assert bb[2:40].sum() < 1e-3 * ee[2:40].sum()
