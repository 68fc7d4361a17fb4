"""Halo statistics, pairwise velocities (incl. reference golden), TPCF."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import halo_stats as HS
from astrild_tpu.ops import pairwise as PW
from astrild_tpu.ops import tpcf as TP


# ------------------------------------------------------------- mass function
def test_halo_mass_function_cumulative():
    mass = jnp.asarray(10.0 ** np.array([12.0, 12.5, 13.0, 13.5, 14.0]))
    centers, cum = HS.halo_mass_function(mass, limits=(11.78, 16.0), nbins=20)
    cum = np.asarray(cum)
    assert cum[0] == 5.0          # all halos above the lowest bin
    assert cum[-1] == 0.0
    assert np.all(np.diff(cum) <= 0)  # monotone decreasing


def test_halo_mass_function_ignores_padding():
    mass = jnp.asarray([1e12, 1e13, 0.0, -1.0])
    _, cum = HS.halo_mass_function(mass, limits=(11.78, 16.0), nbins=10)
    assert float(cum[0]) == 2.0


def test_binned_mean_matches_scipy():
    from scipy.stats import binned_statistic

    rng = np.random.default_rng(1)
    x = rng.uniform(1, 10, 500)
    v = rng.normal(size=500)
    edges = np.linspace(1, 10, 11)
    want, _, _ = binned_statistic(x, v, statistic="mean", bins=edges)
    got = np.asarray(HS.binned_mean(jnp.asarray(x), jnp.asarray(v),
                                    jnp.asarray(edges), 10))
    npt.assert_allclose(got, want, rtol=1e-5)


def test_histogram_density_normalized(rng):
    v = jnp.asarray(rng.normal(0, 1, 4000).astype(np.float32))
    centers, dens = HS.histogram_density(v, 20, (-4.0, 4.0))
    width = 8.0 / 20
    npt.assert_allclose(float(jnp.sum(dens) * width), 1.0, rtol=1e-3)


# ------------------------------------------------------------ concentration
def test_concentration_prada_roundtrip():
    # forward: vmax/v200 ratio from known c, then invert
    def ratio(c):
        mu = np.log(1 + c) - c / (1 + c)
        return np.sqrt(0.216 * c / mu)

    c_true = np.array([3.0, 5.0, 8.0, 12.0])
    vmax = ratio(c_true)
    v200 = np.ones(4)
    c_got, conv = HS.concentration_prada(jnp.asarray(vmax), jnp.asarray(v200))
    assert bool(jnp.all(conv))
    npt.assert_allclose(np.asarray(c_got), c_true, rtol=1e-3)


def test_concentration_mass_rockstar():
    m = jnp.asarray([1e12, 2e12, 1e13, 2e13])
    r200 = jnp.asarray([1.0, 1.0, 2.0, 2.0])
    rs = jnp.asarray([0.25, 0.25, 0.25, 0.25])
    centers, cm = HS.concentration_mass_rockstar(m, r200, rs, (11.5, 13.7),
                                                 nbins=2)
    cm = np.asarray(cm)
    npt.assert_allclose(cm[0], 4.0, rtol=1e-5)   # low-mass bin
    npt.assert_allclose(cm[1], 8.0, rtol=1e-5)   # high-mass bin


# ----------------------------------------------------- pairwise velocities
def reference_pairwise_fixture():
    """The reference's synthetic test setup
    (tests/unit/particles/test_mean_pairwise_velocity.py:18-32)."""
    n = 2000
    pos = np.zeros((n, 3))
    pos[:, 0] = np.linspace(-10, 10, n)
    pos[:1000, 1] = -5
    pos[1000:, 1] = np.linspace(5, 50, 1000)
    pos[:, 2] = 500
    tvel = np.zeros((n, 2))
    tvel[:1000, 1] = 100
    tvel[1000:, 1] = -100
    return pos, tvel


def test_make_rsep_golden():
    bins = np.linspace(0, 50, 40)
    rsep = np.asarray(PW.make_rsep(40, np.diff(bins)[0]))
    npt.assert_almost_equal(rsep[0], 0.64102564, decimal=6)
    npt.assert_almost_equal(rsep[-1], 50.64102564, decimal=4)


def test_mean_pv_from_tv_reference_golden():
    """Reference golden values: vij[0] = -9.98742453e-2,
    vij[-1] = -1.80198e2 (test_mean_pairwise_velocity.py:44-53)."""
    pos, tvel = reference_pairwise_fixture()
    bins = jnp.asarray(np.linspace(0, 50, 40))
    rsep, vij = PW.mean_pv_from_tv(jnp.asarray(pos), jnp.asarray(tvel), bins)
    vij = np.asarray(vij)
    assert vij.shape == (40,)
    npt.assert_allclose(vij[0], -9.98742453e-02, rtol=1e-3)
    npt.assert_allclose(vij[-1], -1.80198033658e+02, rtol=1e-3)


def test_pairwise_infall_sign():
    # two groups moving toward each other along x -> negative v12 at their
    # separation
    rng = np.random.default_rng(0)
    n = 256
    pos = np.zeros((2 * n, 3), np.float32)
    pos[:n] = rng.normal([480, 500, 500], 1.0, (n, 3))
    pos[n:] = rng.normal([520, 500, 500], 1.0, (n, 3))
    vel = np.zeros((2 * n, 3), np.float32)
    vel[:n, 0] = 100.0   # moving toward +x
    vel[n:, 0] = -100.0  # moving toward -x
    bins = jnp.asarray(np.linspace(0, 50, 25))
    rsep, v12 = PW.mean_pairwise_velocity(jnp.asarray(pos), jnp.asarray(vel),
                                          bins)
    v12 = np.asarray(v12)
    i40 = np.argmin(np.abs(np.asarray(rsep) - 40.0))
    assert v12[i40] < -100.0  # infall: v12 ~ -200 * geometry factor


def test_pairwise_uneven_bins_match_bruteforce():
    """Uneven-edge mode (pairwise_velocity.pyx:32 + make_rsep_uneven_bins)
    vs an exact O(N^2) float64 oracle with the same half-open intervals."""
    rng = np.random.default_rng(7)
    n = 96
    pos = rng.uniform(400.0, 600.0, (n, 3))
    vel = rng.normal(0.0, 200.0, (n, 3))
    edges = np.array([5.0, 20.0, 50.0, 110.0, 200.0])

    nb = edges.size - 1
    nom = np.zeros(nb)
    den = np.zeros(nb)
    for i in range(n):
        for j in range(i + 1, n):
            rij = pos[i] - pos[j]
            r = np.linalg.norm(rij)
            b = np.searchsorted(edges, r, side="right") - 1
            if r < edges[0] or b < 0 or b >= nb:
                continue
            rhat = rij / r
            pi = pos[i] / np.linalg.norm(pos[i])
            pj = pos[j] / np.linalg.norm(pos[j])
            q = 0.5 * (2.0 * rhat - pi * np.dot(rhat, pi)
                       - pj * np.dot(rhat, pj))
            vij = vel[i] - vel[j]
            nom[b] += np.dot(vij, q)
            den[b] += np.dot(q, q)
    want = nom / np.maximum(den, 1e-30)

    rsep, v12 = PW.mean_pairwise_velocity(
        jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
        jnp.asarray(edges), block=64)
    npt.assert_allclose(np.asarray(rsep), 0.5 * (edges[1:] + edges[:-1]))
    npt.assert_allclose(np.asarray(v12), want, rtol=5e-3)


def test_pairwise_uniform_offset_edges_take_edge_path():
    """Uniformly spaced edges with a nonzero start (e.g. [5,15,25,35]) are
    arbitrary-edge input: they must bin into len(edges)-1 intervals, NOT be
    reinterpreted as the legacy width-w-from-0 convention (r3 advisor)."""
    rng = np.random.default_rng(11)
    n = 64
    pos = rng.uniform(400.0, 600.0, (n, 3))
    vel = rng.normal(0.0, 200.0, (n, 3))
    offset_edges = np.array([5.0, 15.0, 25.0, 35.0])
    rsep, v12 = PW.mean_pairwise_velocity(
        jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
        jnp.asarray(offset_edges), block=64)
    assert np.asarray(v12).shape == (3,)
    npt.assert_allclose(np.asarray(rsep), [10.0, 20.0, 30.0])
    # and the values agree with explicitly-uneven edges covering the
    # same intervals (forces the searchsorted path in both calls)
    uneven = np.array([5.0, 15.0, 25.0, 35.000001])
    _, v12b = PW.mean_pairwise_velocity(
        jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
        jnp.asarray(uneven), block=64)
    npt.assert_allclose(np.asarray(v12), np.asarray(v12b), rtol=1e-4)


def test_pairwise_nonascending_edges_raise():
    pos = np.zeros((4, 3)) + np.eye(4, 3)
    vel = np.zeros((4, 3))
    try:
        PW.mean_pairwise_velocity(jnp.asarray(pos, jnp.float32),
                                  jnp.asarray(vel, jnp.float32),
                                  jnp.asarray([0.0, 2.0, 1.0]))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_make_rsep_uneven_bins():
    edges = jnp.asarray([0.0, 1.0, 4.0, 9.0])
    npt.assert_allclose(np.asarray(PW.make_rsep_uneven_bins(edges)),
                        [0.5, 2.5, 6.5])


# ---------------------------------------------------------------------- tpcf
def test_to_redshift_space():
    pos = jnp.asarray([[10.0, 10.0, 10.0]])
    vel = jnp.asarray([[0.0, 0.0, 500.0]])
    out = np.asarray(TP.to_redshift_space(pos, vel, 100.0))
    npt.assert_allclose(out[0], [10.0, 10.0, 15.0])
    # periodic wrap
    out2 = np.asarray(TP.to_redshift_space(
        jnp.asarray([[10.0, 10.0, 98.0]]), vel, 100.0))
    npt.assert_allclose(out2[0, 2], 3.0, atol=1e-5)


def test_tpcf_random_is_zero(rng):
    n = 2048
    box = 100.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    r_edges = jnp.asarray(np.linspace(5.0, 40.0, 8))
    r, xi = TP.tpcf_real(pos, box, r_edges)
    # Poisson points: xi ~ 0 within sampling noise
    npt.assert_allclose(np.asarray(xi), 0.0, atol=0.1)


def test_tpcf_clustered_positive(rng):
    # clustered sample: pairs at small separations -> xi > 0 at small r
    box = 100.0
    centers = rng.uniform(10, 90, (40, 3))
    pts = (centers[:, None, :] + rng.normal(0, 1.0, (40, 25, 3))).reshape(-1, 3)
    pos = jnp.asarray(np.mod(pts, box).astype(np.float32))
    r_edges = jnp.asarray(np.linspace(0.5, 20.0, 10))
    r, xi = TP.tpcf_real(pos, box, r_edges)
    assert float(xi[0]) > 5.0       # strongly clustered at ~1 Mpc/h
    assert float(xi[-1]) < 1.0      # decorrelates at large r


def test_tpcf_multipoles_isotropic():
    # isotropic xi(s, mu): quadrupole and hexadecapole vanish
    xi = jnp.ones((6, 20)) * 0.5
    xi0 = np.asarray(TP.tpcf_multipoles(xi, 0))
    xi2 = np.asarray(TP.tpcf_multipoles(xi, 2))
    xi4 = np.asarray(TP.tpcf_multipoles(xi, 4))
    npt.assert_allclose(xi0, 0.5, rtol=1e-5)
    npt.assert_allclose(xi2, 0.0, atol=1e-2)
    npt.assert_allclose(xi4, 0.0, atol=1e-2)


def test_kaiser_quadrupole_sign(rng):
    # coherent infall along the LOS squashes xi(s, mu) -> negative
    # quadrupole... emulate: clustered pairs compressed along z
    box = 100.0
    centers = rng.uniform(10, 90, (60, 3))
    disp = rng.normal(0, 1.0, (60, 30, 3))
    disp[:, :, 2] *= 0.3  # squashed along LOS
    pts = (centers[:, None, :] + disp).reshape(-1, 3)
    pos = jnp.asarray(np.mod(pts, box).astype(np.float32))
    s_edges = jnp.asarray(np.linspace(0.5, 8.0, 5))
    s, mu, xi = TP.tpcf_s_mu(pos, box, s_edges, nmu=10)
    xi2 = np.asarray(TP.tpcf_multipoles(xi, 2))
    assert np.mean(xi2) < 0.0


def test_theory_hmf_models():
    """PS/ST/Tinker08 dn/dlnM from sigma(M) with autodiff dlnsigma/dlnM:
    PS mass fraction integrates to ~1 (all mass in halos), amplitudes in
    the published z=0 windows, and high-z suppression at cluster mass."""
    from astrild_tpu.ops.halo_stats import theory_hmf
    from astrild_tpu.utils.constants import RHO_CRIT0
    from astrild_tpu.utils.cosmology import Cosmology

    c = Cosmology()
    rho_mean = c.Om0 * RHO_CRIT0
    m = np.geomspace(1e6, 1e16, 160)
    dlnm = np.log(m[1] / m[0])
    # PS mass closure (int f dln 1/sigma = 1); 0.8 here because sigma_r's
    # k <= 50 h/Mpc quadrature cutoff underestimates sigma below ~1e8
    # Msun/h. ST spreads far more mass below the tested range (f ~
    # nu^0.4 at small nu), so closure is only asserted for PS.
    dn = np.asarray(theory_hmf(m, c, model="ps"))
    frac = float((m * dn / rho_mean).sum() * dlnm)
    assert 0.75 < frac < 1.1, frac

    # z=0 amplitude windows at 1e13 Msun/h (Planck-like cosmology):
    # dn/dlnM ~ 4-6e-4 (ST), Tinker08 within ~25% of ST
    st = float(np.asarray(theory_hmf(np.array([1e13]), c, model="st"))[0])
    tk = float(np.asarray(theory_hmf(np.array([1e13]), c,
                                     model="tinker08"))[0])
    assert 3e-4 < st < 7e-4, st
    assert 0.7 < tk / st < 1.4

    # fewer clusters at z=1
    m15 = np.array([1e15])
    hi_z = float(np.asarray(theory_hmf(m15, c, z=1.0, model="st"))[0])
    lo_z = float(np.asarray(theory_hmf(m15, c, z=0.0, model="st"))[0])
    assert hi_z < 0.2 * lo_z


def test_svdw_multiplicity_hybrid_continuity():
    """The series and single-barrier forms must agree near the x=0.276
    switch point (Jennings+13 states <0.2% there)."""
    from astrild_tpu.ops.halo_stats import svdw_multiplicity

    av, dc = 2.717, 1.686
    D = av / (dc + av)
    # the jitted form must be finite and positive across the switch
    sigmas = jnp.asarray([0.25, 0.276, 0.3]) * av / D
    vals = np.asarray(svdw_multiplicity(sigmas))
    assert (vals > 0).all() and np.isfinite(vals).all()
    # evaluate both branches explicitly at the switch point
    sigma = 0.276 * av / D
    j = np.arange(1, 7)
    x = 0.276
    series = (2 * (j * np.pi) * x ** 2 * np.sin(j * np.pi * D)
              * np.exp(-0.5 * (j * np.pi * x) ** 2)).sum()
    small = np.sqrt(2 / np.pi) * (av / sigma) * np.exp(
        -0.5 * av ** 2 / sigma ** 2)
    assert abs(series / small - 1.0) < 5e-3


@pytest.mark.slow
def test_theory_vsf_vdn_volume_relation_and_scale():
    from astrild_tpu.ops.halo_stats import theory_vsf
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    r = jnp.asarray(np.geomspace(2.0, 30.0, 12))
    a_v = (1.0 + (-0.8)) ** (-1.0 / 3.0)
    vdn = np.asarray(theory_vsf(r, cosmo, model="vdn"))
    svdw = np.asarray(theory_vsf(r / a_v, cosmo, model="svdw"))
    # V(r_v) dn_vdn(r_v) == V(R_L) dn_svdw(R_L) at r_v = a_v R_L:
    # with V ~ r^3 and r_v^3 = a_v^3 R_L^3 this is dn_vdn = dn_svdw/a_v^3
    np.testing.assert_allclose(vdn, svdw / a_v ** 3, rtol=1e-5)
    assert (vdn > 0).all()
    # abundance scale at z=0: dn/dlnR at R~8 Mpc/h within the broad
    # literature band
    mid = vdn[np.argmin(np.abs(np.asarray(r) - 8.0))]
    assert 1e-7 < mid < 1e-2
    # exponential cutoff toward large radii
    assert vdn[-1] < vdn[0]
