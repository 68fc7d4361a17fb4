"""Full-sky lightcone lensing (ops/lightcone_sphere)."""
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import lightcone_sphere as lcs
from astrild_tpu.ops import sht
from astrild_tpu.ops.raytrace import effective_plane_kappa
from astrild_tpu.utils import healpix as hpx


@pytest.fixture
def rng():
    return np.random.default_rng(3)


BOX = 400.0


def test_shell_counts_conserve_and_uniform(rng):
    """Primary-image paint: total counts equal the number of particles
    inside the radial range, and a uniform box gives delta ~ 0."""
    n = 200_000
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    edges = np.array([40.0, 80.0, 120.0, 160.0])   # inside the box half
    nside = 8
    counts = np.asarray(lcs.shell_counts_healpix(
        pos, edges, nside, BOX, replicate=False))
    chi = np.linalg.norm(pos - BOX / 2, axis=1)
    n_in = np.sum((chi >= edges[0]) & (chi < edges[-1]))
    assert counts.sum() == pytest.approx(n_in, abs=0.5)

    delta, chis, dchis = lcs.density_shells_healpix(
        pos, edges, nside, BOX, replicate=False)
    delta = np.asarray(delta)
    # Poisson: mean ~ 0, fluctuation ~ 1/sqrt(counts per pixel)
    m = np.abs(delta.mean(axis=1))
    sig = 1.0 / np.sqrt(counts.mean(axis=1) * counts.shape[1])
    assert np.all(m < 5 * sig)
    npt.assert_allclose(np.asarray(chis),
                        0.5 * (edges[1:] + edges[:-1]))


@pytest.mark.slow
def test_shell_counts_replication_covers_sphere(rng):
    """Shells beyond the box boundary: replication fills every pixel
    (no spurious underdense ring — the lens-plane ADVICE-r2 geometry
    bug class)."""
    n = 300_000
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    edges = np.array([500.0, 650.0, 800.0])       # > boxsize/2
    nside = 8
    delta, _, _ = lcs.density_shells_healpix(pos, edges, nside, BOX)
    delta = np.asarray(delta)
    counts_mean = (1 + delta.mean())
    assert abs(counts_mean - 1) < 0.05
    # no empty pixels at this density (expected ~ 60+ per pixel)
    counts = np.asarray(lcs.shell_counts_healpix(pos, edges, nside, BOX))
    assert counts.min() > 0


def test_shell_counts_weighted(rng):
    n = 50_000
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, n).astype(np.float32)
    edges = np.array([50.0, 150.0])
    c1 = np.asarray(lcs.shell_counts_healpix(pos, edges, 4, BOX,
                                             weights=w, replicate=False))
    chi = np.linalg.norm(pos - BOX / 2, axis=1)
    sel = (chi >= 50) & (chi < 150)
    assert c1.sum() == pytest.approx(w[sel].sum(), rel=1e-5)


def test_flat_buffer_input_matches_array(rng):
    n = 20_000
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    edges = np.array([60.0, 120.0, 180.0])
    a = np.asarray(lcs.shell_counts_healpix(pos, edges, 4, BOX,
                                            replicate=False))
    b = np.asarray(lcs.shell_counts_healpix(
        (pos[:, 0], pos[:, 1], pos[:, 2]), edges, 4, BOX,
        replicate=False))
    npt.assert_array_equal(a, b)


def test_born_linearity_and_kernel(rng):
    """Born kappa is the exact weighted sum of effective shell kappas,
    with the (1 - chi/chi_s) kernel clipped beyond the source."""
    nside, nshell = 8, 4
    npix = hpx.nside2npix(nside)
    delta = rng.standard_normal((nshell, npix)).astype(np.float32)
    chis = np.array([300.0, 500.0, 700.0, 900.0], np.float32)
    dchis = np.full(nshell, 200.0, np.float32)
    a = 1.0 / (1.0 + np.array([0.1, 0.2, 0.3, 0.4], np.float32))
    chi_s = 800.0
    om = 0.31
    got = np.asarray(lcs.born_convergence_healpix(
        delta, chis, dchis, chi_s, om, scale_factors=a))
    kap = np.asarray(effective_plane_kappa(
        delta, chis[:, None], dchis[:, None], a[:, None], om))
    w = np.maximum(1 - chis / chi_s, 0)
    assert w[-1] == 0.0   # shell beyond the source contributes nothing
    npt.assert_allclose(got, (w[:, None] * kap).sum(0), rtol=1e-5,
                        atol=1e-8)
    # tomography: vmapped sources match scalar calls
    multi = np.asarray(lcs.born_convergence_healpix(
        delta, chis, dchis, np.array([600.0, 800.0], np.float32), om,
        scale_factors=a))
    one = np.asarray(lcs.born_convergence_healpix(
        delta, chis, dchis, 600.0, om, scale_factors=a))
    npt.assert_allclose(multi[0], one, rtol=1e-6)
    npt.assert_allclose(multi[1], got, rtol=1e-6)


def test_multiplane_single_shell_is_born(rng):
    """One shell: the traced kappa equals the Born weight times the
    band-limited shell kappa, gamma matches the spin-2 synthesis, and
    the rotation omega vanishes (no lens-lens coupling)."""
    nside = 16
    npix = hpx.nside2npix(nside)
    # smooth (band-limited) shell so interpolation error is negligible
    cl = np.zeros(25)
    cl[2:12] = 1e-4
    key = __import__("jax").random.PRNGKey(0)
    dmap = np.asarray(sht.synfast(key, cl, nside, lmax=24))
    delta = dmap[None, :].astype(np.float32)
    chi, dchi, chi_s, om = 400.0, 100.0, 800.0, 0.31
    out = lcs.multiplane_raytrace_healpix(
        delta, np.array([chi], np.float32), np.array([dchi], np.float32),
        chi_s, om, lmax=2 * nside)
    kap_eff = np.asarray(effective_plane_kappa(
        delta[0], chi, dchi, 1.0, om))
    # the transforms see the band-limited (adjoint->synth) kappa
    L = 2 * nside
    kr, ki = sht.analyze(kap_eff, nside, L, niter=0)
    kap_bl = np.asarray(sht.synthesize(kr, ki, nside, L))
    w = 1 - chi / chi_s
    got = np.asarray(out["kappa"])
    scale = np.abs(w * kap_bl).max()
    npt.assert_allclose(got, w * kap_bl, atol=0.02 * scale)
    assert np.abs(np.asarray(out["omega"])).max() < 1e-4 * scale

    from astrild_tpu.ops import sht_spin as ss
    er, ei = ss.kappa_alm_to_shear_alm(kr, ki)
    g1, g2 = (np.asarray(m) for m in ss.synthesize_spin2(
        er, ei, np.zeros_like(er), np.zeros_like(ei), nside, L))
    npt.assert_allclose(np.asarray(out["gamma1"]), w * g1,
                        atol=0.03 * scale)
    npt.assert_allclose(np.asarray(out["gamma2"]), w * g2,
                        atol=0.03 * scale)


def test_multiplane_two_shells_matches_born_at_first_order(rng):
    """Small-amplitude shells: multiplane -> Born; the difference
    (lens-lens + ray deflection) scales quadratically."""
    nside = 16
    npix = hpx.nside2npix(nside)
    import jax
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    cl = np.zeros(25)
    cl[2:12] = 1e-4
    d1 = np.asarray(sht.synfast(k1, cl, nside, lmax=24))
    d2 = np.asarray(sht.synfast(k2, cl, nside, lmax=24))
    chis = np.array([300.0, 600.0], np.float32)
    dchis = np.array([150.0, 150.0], np.float32)
    chi_s, om = 900.0, 0.31

    def run(eps):
        delta = np.stack([eps * d1, eps * d2]).astype(np.float32)
        out = lcs.multiplane_raytrace_healpix(delta, chis, dchis, chi_s,
                                              om, lmax=2 * nside)
        # Born of the band-limited shells (what the tracer sees)
        L = 2 * nside
        bl = []
        for d in delta:
            r, i = sht.analyze(d, nside, L, niter=0)
            bl.append(np.asarray(sht.synthesize(r, i, nside, L)))
        born = np.asarray(lcs.born_convergence_healpix(
            np.stack(bl), chis, dchis, chi_s, om))
        return (np.asarray(out["kappa"]), born,
                np.asarray(out["omega"]))

    got1, born1, om1 = run(1.0)
    resid1 = np.abs(got1 - born1).max() / np.abs(born1).max()
    # kappa: multiplane == Born up to interp truncation + post-Born
    assert resid1 < 0.05
    # omega is a PURE lens-lens (second-order) signal: zero at Born
    # level, so it scales quadratically with the shell amplitude —
    # the clean post-Born probe (kappa's residual is dominated by the
    # amplitude-proportional bilinear truncation at this resolution)
    _, _, om2 = run(0.1)
    r1 = float(np.sqrt(np.mean(om1 ** 2)))
    r2 = float(np.sqrt(np.mean(om2 ** 2)))
    assert r1 > 0
    ratio = r1 / max(r2, 1e-30)
    assert 50 < ratio < 200, ratio   # ~100 = quadratic


def test_multiplane_tomography_masks_far_shells(rng):
    nside = 8
    npix = hpx.nside2npix(nside)
    delta = 0.01 * rng.standard_normal((2, npix)).astype(np.float32)
    chis = np.array([300.0, 700.0], np.float32)
    dchis = np.array([100.0, 100.0], np.float32)
    out = lcs.multiplane_raytrace_healpix(
        delta, chis, dchis, np.array([500.0, 900.0], np.float32), 0.31,
        lmax=16)
    one = lcs.multiplane_raytrace_healpix(delta[:1], chis[:1], dchis[:1],
                                          500.0, 0.31, lmax=16)
    npt.assert_allclose(np.asarray(out["kappa"][0]),
                        np.asarray(one["kappa"]), atol=1e-6)


@pytest.mark.slow
def test_multiplane_jit_matches_eager(rng):
    """Fusion-duplication guard: the jitted trace must agree with the
    op-by-op (disable_jit) execution at undeflected rays sitting exactly
    on pixel boundaries — the configuration where an inconsistent
    (pix, wgt) stencil pair produces full neighbour-value errors unless
    the scan materializes the stencils (see _multiplane_impl)."""
    import jax
    nside = 16
    cl = np.zeros(25)
    cl[2:12] = 1e-4
    dmap = np.asarray(sht.synfast(jax.random.PRNGKey(0), cl, nside,
                                  lmax=24))
    delta = dmap[None, :].astype(np.float32)
    args = (delta, np.array([400.0], np.float32),
            np.array([100.0], np.float32), 800.0, 0.31)
    jit_out = lcs.multiplane_raytrace_healpix(*args, lmax=2 * nside)
    with jax.disable_jit():
        eag_out = lcs.multiplane_raytrace_healpix(*args, lmax=2 * nside)
    scale = np.abs(np.asarray(eag_out["kappa"])).max()
    for k in ("kappa", "gamma1", "gamma2", "omega"):
        npt.assert_allclose(np.asarray(jit_out[k]), np.asarray(eag_out[k]),
                            atol=5e-3 * scale, err_msg=k)


def test_chi_edges_validation():
    with pytest.raises(ValueError):
        lcs.shell_counts_healpix(np.zeros((10, 3), np.float32),
                                 np.array([100.0, 50.0]), 4, BOX)


def test_skyhealpix_multiplane_facade(rng):
    """SkyHealpix.from_multiplane_shells: traced kappa as the map,
    gamma/omega layers populated, Born facade agreement on a smooth
    single shell."""
    import jax
    from astrild_tpu.models.skyhealpix import SkyHealpix

    nside = 16
    cl = np.zeros(25)
    cl[2:12] = 1e-4
    dmap = np.asarray(sht.synfast(jax.random.PRNGKey(2), cl, nside,
                                  lmax=24))
    shells = dmap[None, :].astype(np.float32)
    chis = np.array([400.0], np.float32)
    dchis = np.array([100.0], np.float32)
    sky = SkyHealpix.from_multiplane_shells(shells, chis, dchis, 800.0,
                                            0.31, lmax=2 * nside)
    for k in ("gamma1", "gamma2", "omega"):
        assert sky.data[k].shape == sky.data["orig"].shape
    born = SkyHealpix.from_density_shells(shells, chis, dchis, 800.0,
                                          0.31)
    scale = np.abs(born.data["orig"]).max()
    # multiplane sees the band-limited shell; agreement to a few % of
    # the Born scale on a smooth lmax<=24 field
    diff = np.abs(sky.data["orig"] - born.data["orig"]).max()
    assert diff < 0.05 * scale
    assert np.abs(sky.data["omega"]).max() < 1e-3 * scale


def test_skyhealpix_multiplane_facade_rejects_tomography():
    from astrild_tpu.models.skyhealpix import SkyHealpix

    shells = np.zeros((1, hpx.nside2npix(8)), np.float32)
    with pytest.raises(ValueError, match="scalar chi_s"):
        SkyHealpix.from_multiplane_shells(
            shells, np.array([300.0], np.float32),
            np.array([100.0], np.float32),
            np.array([500.0, 800.0], np.float32), 0.31, lmax=16)


@pytest.mark.slow
def test_multiplane_scan_path_matches_tables(rng):
    """method='scan' (table-free sht_large backends) reproduces the
    table path — the production nside>=512 route."""
    nside = 16
    npix = 12 * nside * nside
    nshell = 3
    delta = rng.normal(0.0, 0.3, (nshell, npix)).astype(np.float32)
    chis = np.array([300.0, 500.0, 700.0], np.float32)
    dchis = np.full(nshell, 100.0, np.float32)
    kw = dict(chi_s=900.0, omega_m=0.3, lmax=2 * nside)
    out_t = lcs.multiplane_raytrace_healpix(delta, chis, dchis,
                                            method="tables", **kw)
    out_s = lcs.multiplane_raytrace_healpix(delta, chis, dchis,
                                            method="scan", **kw)
    for k in ("kappa", "gamma1", "gamma2", "omega"):
        scale = np.abs(np.asarray(out_t[k])).max() + 1e-12
        npt.assert_allclose(np.asarray(out_s[k]), np.asarray(out_t[k]),
                            atol=3e-3 * scale, err_msg=k)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        lcs.multiplane_raytrace_healpix(delta, chis, dchis,
                                        method="nope", **kw)
