"""MASTER mode-decoupling for masked spectra (flat-sky + full-sky).

The failing-case-first tests VERDICT asked for: a steep spectrum under an
aggressive mask where the <w^2> pseudo-Cl normalization is measurably
biased, recovered unbiased by the coupling-matrix inversion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import angular_power as AP

NPIX = 128
FOV = 10.0  # deg


def _steep_cl_tab():
    # scale-invariant D_l (CMB-SW-like): C = 1/(l(l+1)) — steep enough
    # that mask coupling moves large low-l power into high l, and exactly
    # the band-power shape model, so MASTER residuals are pure estimator
    # error + MC noise
    ell = np.linspace(1.0, 40000.0, 2048)
    cl = 1.0 / (ell * (ell + 1.0))
    return jnp.asarray(ell, jnp.float32), jnp.asarray(cl, jnp.float32)


def _blob_mask(rng):
    """Aggressive mask: ~35% of the field cut by holes, apodized."""
    from astrild_tpu.ops.filters import gaussian

    m = np.ones((NPIX, NPIX), np.float32)
    yy, xx = np.meshgrid(np.arange(NPIX), np.arange(NPIX), indexing="ij")
    for _ in range(12):
        cy, cx = rng.uniform(0, NPIX, 2)
        r = rng.uniform(8, 18)
        m[(yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2] = 0.0
    m[:, :12] = 0.0  # survey edge
    w = gaussian(jnp.asarray(m), FOV, sigma_arcmin=6.0)
    return jnp.clip(w, 0.0, 1.0)


def test_coupling_matrix_trivial_masks():
    ones = jnp.ones((64, 64))
    M = AP.flat_sky_coupling_matrix(ones, FOV, 8)
    npt.assert_allclose(np.asarray(M), np.eye(8), atol=1e-4)
    M5 = AP.flat_sky_coupling_matrix(0.5 * ones, FOV, 8)
    npt.assert_allclose(np.asarray(M5), 0.25 * np.eye(8), atol=1e-4)


def test_master_equals_w2_for_constant_mask(rng):
    ell_tab, cl_tab = _steep_cl_tab()
    img = AP.cl_to_flat_map(jax.random.PRNGKey(0), ell_tab, cl_tab, NPIX,
                            FOV)
    mask = 0.7 * jnp.ones((NPIX, NPIX))
    _, c_m = AP.cl_flat_sky_masked(img, mask, FOV, nbins=10)
    _, c_x = AP.cl_flat_sky_master(img, mask, FOV, nbins=10)
    npt.assert_allclose(np.asarray(c_x), np.asarray(c_m), rtol=1e-3)


def test_master_unbiased_where_w2_biased(rng):
    """The VERDICT acceptance case: <2% recovery under a ~35% mask where
    the <w^2> estimator shows measurable (>8%) bias."""
    ell_tab, cl_tab = _steep_cl_tab()
    w = _blob_mask(rng)
    nbins = 10
    lf = 360.0 / FOV
    lmax_all = lf * NPIX / np.sqrt(2.0) * 1.001  # bin EVERY grid mode

    keys = jax.random.split(jax.random.PRNGKey(3), 256)
    make = jax.vmap(lambda k: AP.cl_to_flat_map(k, ell_tab, cl_tab, NPIX,
                                                FOV))
    imgs = make(keys)

    cl_true = jax.vmap(lambda m: AP.cl_flat_sky(
        m, FOV, nbins=nbins, ell_max=lmax_all)[1])(imgs).mean(0)
    cl_w2 = jax.vmap(lambda m: AP.cl_flat_sky_masked(
        m, w, FOV, nbins=nbins)[1])(imgs).mean(0)
    # MC mean of the MASTER solve == solve of the MC-mean pseudo-Cl
    # (linear); one public-API call covers the one-shot path
    pcl = jax.vmap(lambda m: AP.cl_flat_sky(
        m * w, FOV, nbins=nbins, ell_max=lmax_all)[1])(imgs).mean(0)
    M = AP.flat_sky_coupling_matrix(w, FOV, nbins, ell_max=lmax_all)
    cl_ms = np.linalg.solve(M, np.asarray(pcl, np.float64))
    _, one = AP.cl_flat_sky_master(imgs[0], w, FOV, nbins=nbins,
                                   ell_max=lmax_all, coupling=M)
    assert np.all(np.isfinite(np.asarray(one)))

    true = np.asarray(cl_true)
    # Note cl_w2 uses the default binning (ell_max = lf n/2); compare it
    # on its own binning's truth for fairness
    cl_true_def = jax.vmap(lambda m: AP.cl_flat_sky(
        m, FOV, nbins=nbins)[1])(imgs).mean(0)
    bias_w2 = np.abs(np.asarray(cl_w2) / np.asarray(cl_true_def) - 1.0)
    assert bias_w2.max() > 0.08, bias_w2  # the failing case really fails
    err_ms = np.abs(cl_ms / true - 1.0)
    assert err_ms.max() < 0.02, (err_ms, bias_w2)


@pytest.mark.slow
def test_skynamaster_facade_flat_and_full(rng):
    """Model-level parity surface for the reference's (nonfunctional)
    SkyNamaster: construction + compute_cl with/without decoupling."""
    from astrild_tpu.models import SkyNamaster
    from astrild_tpu.ops import sht
    from astrild_tpu.utils import healpix as hpx

    # flat patch
    ell_tab, cl_tab = _steep_cl_tab()
    img = AP.cl_to_flat_map(jax.random.PRNGKey(5), ell_tab, cl_tab, NPIX,
                            FOV)
    sn = SkyNamaster.from_array(np.asarray(img), opening_angle=FOV)
    sn.set_mask(np.asarray(_blob_mask(rng)))
    ell, cl = sn.compute_cl(nbins=8)
    ell2, cl2 = sn.compute_cl(nbins=8)  # cached workspace path
    assert np.all(np.isfinite(np.asarray(cl)))
    npt.assert_allclose(np.asarray(cl2), np.asarray(cl))
    _, cl_nd = sn.compute_cl(nbins=8, decouple=False)
    assert not np.allclose(np.asarray(cl_nd), np.asarray(cl))

    # full sky; NaN pixels become the mask (reference's hp.ma path)
    nside = 16
    m = np.array(sht.synfast(jax.random.PRNGKey(6),
                             jnp.ones(21) * 1e-3, nside, 20))
    m[: m.shape[0] // 4] = np.nan
    sf = SkyNamaster.from_array(m)
    assert "mask" in sf.data and sf.data["mask"].sum() < m.shape[0]
    ellf, clf = sf.compute_cl(lmax=20, nbins=5)
    assert np.all(np.isfinite(np.asarray(clf)))
    assert ellf.shape == (5,)


def test_skynamaster_per_call_mask_not_stale(rng):
    """A per-call mask must NOT reuse the stored mask's cached coupling
    (the id()-keyed workspace bug): two different masks give different
    decoupled spectra, and set_mask invalidates the cache."""
    from astrild_tpu.models import SkyNamaster

    ell_tab, cl_tab = _steep_cl_tab()
    img = AP.cl_to_flat_map(jax.random.PRNGKey(8), ell_tab, cl_tab, 64,
                            FOV)
    m1 = np.ones((64, 64), np.float32)
    m1[:, :20] = 0.0
    m2 = np.ones((64, 64), np.float32)
    m2[:32, :] = 0.0
    sn = SkyNamaster.from_array(np.asarray(img), opening_angle=FOV)
    _, c1 = sn.compute_cl(mask=m1, nbins=6)
    _, c2 = sn.compute_cl(mask=m2, nbins=6)
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
    # reference: fresh objects, no cache in play
    _, c2_ref = SkyNamaster.from_array(np.asarray(img),
                                       opening_angle=FOV).compute_cl(
        mask=m2, nbins=6)
    npt.assert_allclose(np.asarray(c2), np.asarray(c2_ref), rtol=1e-5)
    # stored-mask path: set_mask must invalidate the workspace
    sn.set_mask(m1)
    _, s1 = sn.compute_cl(nbins=6)
    sn.set_mask(m2)
    _, s2 = sn.compute_cl(nbins=6)
    npt.assert_allclose(np.asarray(s2), np.asarray(c2_ref), rtol=1e-5)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_master_empty_band_raises_clear_error(rng):
    """nbins > available multipoles/modes must raise a ValueError naming
    the empty bands, not die inside np.linalg.solve with an opaque
    LinAlgError (e.g. SkyNamaster on an nside=8 map: default lmax=16 and
    default nbins=16 leave bands with no multipoles)."""
    import pytest

    from astrild_tpu.ops import sht
    from astrild_tpu.utils import healpix as hpx

    nside = 8
    m = jnp.asarray(rng.standard_normal(hpx.nside2npix(nside)),
                    jnp.float32)
    mask = jnp.ones_like(m)
    with pytest.raises(ValueError, match="band.*no multipoles"):
        sht.anafast_master(m, mask, lmax=16, nbins=16, niter=0)

    # flat-sky analogue: more bands than populated annuli on a tiny grid
    img = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
    with pytest.raises(ValueError, match="band.*no.*modes"):
        AP.cl_flat_sky_master(img, jnp.ones((16, 16)), 5.0, nbins=20)


def test_spin2_master_unbiased_and_b_null(rng):
    """Spin-2 MASTER: an E-only shear field under an aggressive mask
    leaks E->B at the several-percent level in the w2-normalized pseudo
    spectra; the 2x2-block coupling solve recovers EE and nulls BB."""
    import jax

    from astrild_tpu.ops import angular_power as AP

    NPIX, FOV, NB = 64, 10.0, 6
    ells = np.linspace(1.0, 20000.0, 2048)
    cl_in = 1.0 / (ells + 50.0) ** 2

    def shear_of(kappa):
        n = kappa.shape[-1]
        f = jnp.fft.fftfreq(n) * n
        l1, l2 = f[:, None], f[None, :]
        m = l1 ** 2 + l2 ** 2
        safe = jnp.where(m == 0, 1.0, m)
        cos2 = jnp.where(m == 0, 1.0, (l1 ** 2 - l2 ** 2) / safe)
        sin2 = jnp.where(m == 0, 0.0, 2 * l1 * l2 / safe)
        kf = jnp.fft.fft2(kappa)
        return (jnp.real(jnp.fft.ifft2(cos2 * kf)),
                jnp.real(jnp.fft.ifft2(sin2 * kf)))

    mask = np.ones((NPIX, NPIX), np.float32)
    mask[:, :20] = 0.0
    mask[25:35, :] = 0.0
    coup = AP.flat_sky_spin2_coupling_matrices(mask, FOV, NB)
    w2 = float(np.mean(mask ** 2))

    ee_t, pbb, ee_m, bb_m = [], [], [], []
    for i in range(40):
        kappa = AP.cl_to_flat_map(jax.random.PRNGKey(i),
                                  jnp.asarray(ells, jnp.float32),
                                  jnp.asarray(cl_in, jnp.float32),
                                  NPIX, FOV)
        g1, g2 = shear_of(kappa)
        _, ee_true, _ = AP.cl_shear_eb(g1, g2, FOV, nbins=NB)
        ee_t.append(np.asarray(ee_true))
        _, _, pb = AP.cl_shear_eb(g1 * mask, g2 * mask, FOV, nbins=NB)
        pbb.append(np.asarray(pb) / w2)
        _, ee, bb = AP.cl_flat_sky_shear_master(g1, g2, mask, FOV,
                                                nbins=NB, coupling=coup)
        ee_m.append(np.asarray(ee))
        bb_m.append(np.asarray(bb))
    ee_t = np.mean(ee_t, 0)
    band = slice(1, 5)
    leak = np.mean(pbb, 0)[band] / ee_t[band]
    assert np.all(leak > 0.02), leak  # the failure MASTER must fix
    npt.assert_allclose(np.mean(ee_m, 0)[band] / ee_t[band], 1.0,
                        atol=0.08)
    bnull = np.mean(bb_m, 0)[band] / ee_t[band]
    assert np.all(np.abs(bnull) < 0.012), bnull


def test_skynamaster_spin2_facade(rng):
    """compute_cl_spin2 caches the spin-2 couplings per stored mask and
    matches the direct estimator."""
    import jax

    from astrild_tpu.models import SkyNamaster
    from astrild_tpu.ops import angular_power as AP

    NPIX, FOV, NB = 64, 10.0, 6
    g1 = rng.normal(0, 1, (NPIX, NPIX)).astype(np.float32)
    g2 = rng.normal(0, 1, (NPIX, NPIX)).astype(np.float32)
    mask = np.ones((NPIX, NPIX), np.float32)
    mask[:, :20] = 0.0
    sn = SkyNamaster.from_array(np.zeros((NPIX, NPIX), np.float32),
                                opening_angle=FOV)
    sn.set_mask(mask)
    ell, ee, bb = sn.compute_cl_spin2(g1, g2, nbins=NB)
    assert ("flat-spin2", NB) in sn._workspace
    coup = AP.flat_sky_spin2_coupling_matrices(mask, FOV, NB)
    ell2, ee2, bb2 = AP.cl_flat_sky_shear_master(g1, g2, mask, FOV,
                                                 nbins=NB, coupling=coup)
    npt.assert_allclose(np.asarray(ee), np.asarray(ee2), rtol=1e-5)
    npt.assert_allclose(np.asarray(bb), np.asarray(bb2), rtol=1e-5)
    # pseudo path returns w2-normalized spectra
    _, ee_p, bb_p = sn.compute_cl_spin2(g1, g2, nbins=NB, decouple=False)
    assert np.all(np.isfinite(np.asarray(ee_p)))

    # full-sky facade: HEALPix (Q, U) route through anafast_spin2_master
    from astrild_tpu.ops import sht_spin as SS
    from astrild_tpu.utils import healpix as hpx

    nside, lmax = 16, 31
    npix = 12 * nside * nside
    ellv = np.arange(lmax + 1, dtype=np.float64)
    cl_ee = np.zeros(lmax + 1)
    cl_ee[2:] = 1.0 / ellv[2:] ** 2
    q, u = SS.synfast_spin2(jax.random.PRNGKey(0),
                            jnp.asarray(cl_ee, jnp.float32),
                            jnp.zeros(lmax + 1, jnp.float32), nside, lmax)
    theta, _ = hpx.pix2ang_ring(nside, np.arange(npix))
    fmask = (np.asarray(theta) < 1.9).astype(np.float64)
    snf = SkyNamaster.from_array(np.zeros(npix, np.float32))
    snf.set_mask(fmask)
    ell_f, ee_f, bb_f = snf.compute_cl_spin2(q, u, nbins=5, lmax=lmax)
    assert ("full-spin2", lmax, 3) in snf._workspace
    assert np.all(np.isfinite(np.asarray(ee_f)))
    assert ee_f.shape == (5,) and bb_f.shape == (5,)


def test_skynamaster_unit_mask_analytic_wl(rng):
    """A maskless full-sky object uses the exact analytic mask spectrum
    (4*pi delta_l0) instead of estimating the wl of a ones map, so the
    decoupled spectrum matches the plain anafast."""
    import jax

    from astrild_tpu.models import SkyNamaster
    from astrild_tpu.ops import sht
    from astrild_tpu.ops.sht import _bin_operator

    nside, lmax, NB = 16, 31, 5
    cl = np.zeros(lmax + 1)
    cl[2:] = 1.0 / np.arange(2, lmax + 1) ** 2
    m = np.asarray(sht.synfast(jax.random.PRNGKey(0),
                               jnp.asarray(cl, jnp.float32), nside,
                               lmax))
    sn = SkyNamaster.from_array(m)      # full-sky, no mask set
    ell_b, cl_hat = sn.compute_cl(lmax=lmax, nbins=NB)
    ref = np.asarray(sht.anafast(jnp.asarray(m), lmax, niter=3))
    B = _bin_operator(lmax, NB, lmin=2)
    npt.assert_allclose(np.asarray(cl_hat), B @ ref, rtol=2e-2)
    # apodize + precomputed coupling is a rejected combination
    from astrild_tpu.ops import angular_power as AP
    with pytest.raises(ValueError, match="apodize"):
        AP.cl_flat_sky_master(np.zeros((32, 32), np.float32),
                              np.ones((32, 32), np.float32), 10.0,
                              nbins=4, apodize_arcmin=5.0,
                              coupling=np.eye(4))
    with pytest.raises(ValueError, match="apodize"):
        AP.cl_flat_sky_shear_master(np.zeros((32, 32), np.float32),
                                    np.zeros((32, 32), np.float32),
                                    np.ones((32, 32), np.float32), 10.0,
                                    nbins=4, apodize_arcmin=5.0,
                                    coupling=(np.eye(4), np.zeros((4, 4))))
    # flat-sky spin-2 with lmax= raises (bands come from nbins)
    snf = SkyNamaster.from_array(np.zeros((32, 32), np.float32),
                                 opening_angle=10.0)
    with pytest.raises(ValueError, match="lmax"):
        snf.compute_cl_spin2(np.zeros((32, 32), np.float32),
                             np.zeros((32, 32), np.float32), lmax=100)


def test_flat_spin2_couplings_sum_to_scalar(rng):
    """cos^2 + sin^2 = 1: the scalar flat-sky coupling equals
    M_pp + M_pm exactly — ties the two constructions (now sharing
    _flat_coupling_pieces) together as a regression invariant."""
    w = np.asarray(_blob_mask(rng))
    M = AP.flat_sky_coupling_matrix(w, FOV, 8)
    M_pp, M_pm = AP.flat_sky_spin2_coupling_matrices(w, FOV, 8)
    npt.assert_allclose(np.asarray(M_pp) + np.asarray(M_pm),
                        np.asarray(M), rtol=1e-10, atol=1e-14)


def test_fullsky_spin2_coupling_identity():
    """Unit mask: M_pp is the identity on l >= 2, M_pm vanishes (the
    d-function orthogonality limit of the spin-2 couplings)."""
    from astrild_tpu.ops.sht_spin import (
        spin2_coupling_matrices_from_mask_cl)

    lmax = 24
    wl = np.zeros(2 * lmax + 1)
    wl[0] = 4 * np.pi
    M_pp, M_pm = spin2_coupling_matrices_from_mask_cl(wl, lmax)
    npt.assert_allclose(M_pp[2:, 2:], np.eye(lmax - 1), atol=1e-12)
    npt.assert_allclose(M_pm, 0.0, atol=1e-12)


def test_fullsky_spin2_master_unbiased_and_b_null():
    """Full-sky spin-2 MASTER: an E-only field under a belt mask leaks
    E->B at the 5-12% level in the w2 pseudo spectra and biases EE by
    >15% in the lowest band; the 2x2-block solve recovers EE and nulls
    BB (Monte Carlo)."""
    import jax

    from astrild_tpu.ops import sht_spin as SS
    from astrild_tpu.ops.sht import _bin_operator, anafast
    from astrild_tpu.utils import healpix as hpx

    nside, lmax, NB = 16, 31, 5
    npix = 12 * nside * nside
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl_ee = np.zeros(lmax + 1)
    cl_ee[2:] = 1.0 / ell[2:] ** 2
    cl_bb = np.zeros(lmax + 1)
    theta, _ = hpx.pix2ang_ring(nside, np.arange(npix))
    mask = ((np.asarray(theta) < 1.2)
            | (np.asarray(theta) > 1.9)).astype(np.float32)
    wl = np.asarray(anafast(jnp.asarray(mask), 2 * lmax, niter=3))
    coup = SS.spin2_coupling_matrices_from_mask_cl(wl, lmax)
    w2 = float((mask ** 2).mean())

    ee_t, pee, pbb, ee_m, bb_m = [], [], [], [], []
    for i in range(20):
        q, u = SS.synfast_spin2(jax.random.PRNGKey(i),
                                jnp.asarray(cl_ee, jnp.float32),
                                jnp.asarray(cl_bb, jnp.float32),
                                nside, lmax)
        te, _, _ = SS.anafast_spin2(q, u, lmax, niter=3)
        ee_t.append(np.asarray(te))
        pe, pb, _ = SS.anafast_spin2(q * mask, u * mask, lmax, niter=3)
        pee.append(np.asarray(pe) / w2)
        pbb.append(np.asarray(pb) / w2)
        _, me, mb = SS.anafast_spin2_master(q, u, mask, lmax, nbins=NB,
                                            niter=3, coupling=coup)
        ee_m.append(np.asarray(me))
        bb_m.append(np.asarray(mb))
    B = _bin_operator(lmax, NB, lmin=2)
    ee_t_b = B @ np.mean(ee_t, 0)
    leak = (B @ np.mean(pbb, 0)) / ee_t_b
    assert np.all(leak[:3] > 0.04), leak        # the failure MASTER fixes
    assert abs((B @ np.mean(pee, 0))[0] / ee_t_b[0] - 1.0) > 0.15
    npt.assert_allclose(np.mean(ee_m, 0) / ee_t_b, 1.0, atol=0.06)
    assert np.all(np.abs(np.mean(bb_m, 0) / ee_t_b) < 0.025)


def test_fullsky_coupling_identity():
    from astrild_tpu.ops import sht
    from astrild_tpu.utils import healpix as hpx

    nside, lmax = 16, 20
    ones = jnp.ones(hpx.nside2npix(nside))
    wl = sht.anafast(ones, 2 * lmax, niter=3)
    M = np.asarray(sht.coupling_matrix_from_mask_cl(np.asarray(wl), lmax))
    npt.assert_allclose(M, np.eye(lmax + 1), atol=2e-3)


@pytest.mark.slow
def test_fullsky_master_unbiased_belt_mask():
    from astrild_tpu.ops import sht
    from astrild_tpu.utils import healpix as hpx

    nside, lmax, nbins = 32, 40, 8
    npix = hpx.nside2npix(nside)
    theta, _ = hpx.pix2ang_ring(nside, jnp.arange(npix))
    c = jnp.abs(jnp.cos(theta))
    # apodized galactic-belt cut: w ramps 0 -> 1 over |cos(theta)| 0.15-0.4
    w = jnp.clip((c - 0.15) / 0.25, 0.0, 1.0)
    w = w * w * (3.0 - 2.0 * w)  # smoothstep

    ell = np.arange(lmax + 1, dtype=np.float64)
    cl_in = 1.0 / np.maximum(ell * (ell + 1.0), 1.0)  # scale-invariant Dl
    cl_in[:2] = 0.0
    cl_in = jnp.asarray(cl_in, jnp.float32)

    tab = sht.sht_tables(nside, lmax)
    tab_mask = sht.sht_tables(nside, 2 * lmax)
    R = 24
    cl_true, cl_w2, cl_ms = [], [], []
    B = sht._bin_operator(lmax, nbins, lmin=2)
    for r in range(R):
        m = sht.synfast(jax.random.PRNGKey(100 + r), cl_in, nside,
                        lmax, tables=tab)
        cl_true.append(np.asarray(sht.anafast(m, lmax, tables=tab)))
        cl_w2.append(np.asarray(sht.anafast_masked(m, w, lmax,
                                                   tables=tab)))
        _, ch = sht.anafast_master(m, w, lmax, nbins=nbins, tables=tab,
                                   mask_tables=tab_mask)
        cl_ms.append(np.asarray(ch))
    tb = B @ np.mean(cl_true, 0)
    wb = B @ np.mean(cl_w2, 0)
    mb = np.mean(cl_ms, 0)
    bias_w2 = np.abs(wb / tb - 1.0)
    err_ms = np.abs(mb / tb - 1.0)
    assert bias_w2.max() > 0.08, bias_w2
    assert err_ms.max() < 0.05, (err_ms, bias_w2)
