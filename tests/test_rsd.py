"""Redshift-space power multipoles: FFT estimator vs exact anisotropic
input and vs the linear Kaiser theory anchor."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import linear_power as LP
from astrild_tpu.ops import power as P
from astrild_tpu.utils.cosmology import Cosmology

NGRID = 64
BOX = 500.0


def _exact_modulus_rsd_grid(rng, ngrid, boxsize, p_iso_fn, beta, los=2):
    """Real field whose per-mode |delta_k|^2 V is EXACTLY
    (1 + beta mu^2)^2 P_iso(|k|): random phases, deterministic moduli —
    no sample variance in the measured spectra."""
    white = rng.normal(size=(ngrid, ngrid, ngrid))
    modes = np.fft.rfftn(white)
    phases = modes / np.maximum(np.abs(modes), 1e-300)
    kf = 2 * np.pi / boxsize
    f = np.fft.fftfreq(ngrid) * ngrid
    fz = np.fft.rfftfreq(ngrid) * ngrid
    ax = (f[:, None, None], f[None, :, None], fz[None, None, :])
    m2 = ax[0] ** 2 + ax[1] ** 2 + ax[2] ** 2
    mu2 = np.where(m2 == 0, 0.0, ax[los] ** 2 / np.maximum(m2, 1e-12))
    p3d = (1 + beta * mu2) ** 2 * p_iso_fn(np.sqrt(m2) * kf)
    p3d[0, 0, 0] = 0.0
    modulus = np.sqrt(p3d / boxsize ** 3) * ngrid ** 3
    field = np.fft.irfftn(phases * modulus, s=(ngrid,) * 3, axes=(0, 1, 2))
    return 1.0 + field, p3d, mu2


def test_multipoles_match_exact_anisotropic_input():
    rng = np.random.default_rng(2)
    beta = 0.6
    p_iso = lambda k: 1e4 * np.exp(-(k / 0.3) ** 2)
    grid, p3d, mu2 = _exact_modulus_rsd_grid(rng, NGRID, BOX, p_iso, beta)
    res = P.auto_power_multipoles(jnp.asarray(grid), BOX, nbins=24)
    # expected: the SAME shell reduction applied to the analytic 3D values
    for i, ell in enumerate((0, 2, 4)):
        if ell == 0:
            leg = np.ones_like(mu2)
        elif ell == 2:
            leg = 0.5 * (3 * mu2 - 1)
        else:
            leg = 0.125 * ((35 * mu2 - 30) * mu2 + 3)
        vals = (2 * ell + 1) * leg * p3d
        _, exp_p, _ = P.shell_average(jnp.asarray(vals), NGRID, BOX,
                                      nbins=24)
        npt.assert_allclose(np.asarray(res.p_ell[i]), np.asarray(exp_p),
                            rtol=2e-3, atol=1e-2)


@pytest.mark.slow
def test_kaiser_theory_matches_measured_multipoles():
    cosmo = Cosmology()
    beta = float(cosmo.growth_rate(0.0))  # bias = 1
    kf = 2 * np.pi / BOX

    def p_iso(k):
        return np.asarray(LP.linear_power(jnp.asarray(k), cosmo, z=0.0))

    rng = np.random.default_rng(4)
    grid, _, _ = _exact_modulus_rsd_grid(rng, NGRID, BOX, p_iso, beta)
    res = P.auto_power_multipoles(jnp.asarray(grid), BOX, nbins=24)
    k = np.asarray(res.k)
    p0t, p2t, p4t = (np.asarray(x) for x in
                     LP.kaiser_multipoles(jnp.asarray(k), cosmo, z=0.0))
    sel = slice(6, 22)  # shells with well-sampled mu distributions
    p0m, p2m, p4m = (np.asarray(res.p_ell[i]) for i in range(3))
    npt.assert_allclose(p0m[sel], p0t[sel], rtol=0.04)
    npt.assert_allclose(p2m[sel], p2t[sel], rtol=0.12)
    # P4 is small; discreteness of the shell mu-distribution dominates
    assert np.all(np.abs(p4m[sel] - p4t[sel]) < 0.1 * p0t[sel])
    # quadrupole positive and ~ the Kaiser fraction of the monopole
    ratio = p2m[sel] / p0m[sel]
    expect = (4 * beta / 3 + 4 * beta ** 2 / 7) / (1 + 2 * beta / 3
                                                   + beta ** 2 / 5)
    npt.assert_allclose(ratio, expect, rtol=0.1)
    assert k[0] > 0.9 * kf


def test_kaiser_gr_limit_and_bias_scaling():
    cosmo = Cosmology()
    k = jnp.asarray([0.05, 0.1, 0.2])
    p0_b1, p2_b1, _ = LP.kaiser_multipoles(k, cosmo, z=0.0, bias=1.0)
    p0_b2, p2_b2, _ = LP.kaiser_multipoles(k, cosmo, z=0.0, bias=2.0)
    # beta halves with bias 2: quadrupole grows slower than b^2
    assert np.all(np.asarray(p2_b2) < 4.0 * np.asarray(p2_b1))
    assert np.all(np.asarray(p0_b2) > np.asarray(p0_b1))
    # f -> 0 limit: pure real-space bias
    class NoGrowth(Cosmology):
        def growth_rate(self, z):
            return jnp.asarray(0.0)
    ng = NoGrowth()
    p0, p2, p4 = LP.kaiser_multipoles(k, ng, z=0.0, bias=1.5)
    npt.assert_allclose(np.asarray(p0),
                        2.25 * np.asarray(LP.linear_power(k, ng, z=0.0)),
                        rtol=1e-5)
    assert float(jnp.abs(p2).max()) == 0.0 and float(jnp.abs(p4).max()) == 0.0


def test_model_layer_multipole_surface():
    from astrild_tpu.models.power import LinearPowerSpectrum, PowerSpectrum3D

    rng = np.random.default_rng(9)
    grid, _, _ = _exact_modulus_rsd_grid(
        rng, 32, BOX, lambda k: 5e3 * np.exp(-(k / 0.3) ** 2), 0.5)
    ps = PowerSpectrum3D()
    k, poles = ps.multipoles_from_grid(grid, BOX, nbins=12)
    assert set(poles) == {0, 2, 4} and poles[0].shape == (12,)
    assert np.all(poles[0][2:8] > 0)
    lin = LinearPowerSpectrum()
    p0, p2, p4 = lin.kaiser_multipoles(np.asarray([0.05, 0.1]), z=0.0)
    assert p0.shape == (2,) and np.all(p2 > 0) and np.all(p4 > 0)


def test_zeldovich_end_to_end_kaiser():
    """Measurement-side RSD closure: Zel'dovich catalog + consistent
    velocities -> redshift-space paint -> FFT multipoles reproduce the
    Kaiser quadrupole-to-monopole ratio at large scales."""
    import jax

    from astrild_tpu.ops import mocks, paint, tpcf

    ngrid, box, f = 64, 1000.0, 0.53
    pk = lambda k: 2e4 * jnp.exp(-((k / 0.08) ** 2))
    ratios = []
    for seed in range(3):
        pos, vel = mocks.zeldovich_catalog_with_velocities(
            jax.random.PRNGKey(seed), ngrid, box, pk, f)
        pos_s = tpcf.to_redshift_space(pos, vel, box)
        grid = paint.paint(pos_s, ngrid, box, window="cic")
        res = P.auto_power_multipoles(grid, box, nbins=16, window="cic")
        p0 = np.asarray(res.p_ell[0])
        p2 = np.asarray(res.p_ell[1])
        sel = slice(2, 6)  # large scales, well below Nyquist
        ratios.append((p2[sel] / p0[sel]).mean())
    beta = f
    expect = (4 * beta / 3 + 4 * beta ** 2 / 7) / (1 + 2 * beta / 3
                                                   + beta ** 2 / 5)
    meas = np.mean(ratios)
    assert abs(meas - expect) < 0.2 * expect, (meas, expect, ratios)
    # real-space control: quadrupole consistent with zero
    pos, _ = mocks.zeldovich_catalog_with_velocities(
        jax.random.PRNGKey(0), ngrid, box, pk, f)
    grid = paint.paint(pos, ngrid, box, window="cic")
    res = P.auto_power_multipoles(grid, box, nbins=16, window="cic")
    r_real = np.asarray(res.p_ell[1])[2:6] / np.asarray(res.p_ell[0])[2:6]
    assert abs(r_real.mean()) < 0.25 * expect


def test_pair_counts_rp_pi_exact_pairs():
    """Hand-placed pairs land in exactly the predicted (rp, pi) cells —
    including across the periodic wrap and for a non-default LOS axis."""
    from astrild_tpu.ops import tpcf

    L = 100.0
    # pair A: rp = 5 (x-y plane), pi = 10 ; pair B wraps: dz = 90 -> 10
    pos = jnp.asarray(np.array([
        [20.0, 20.0, 20.0], [23.0, 24.0, 30.0],   # rp=5, pi=10
        [50.0, 50.0, 95.0], [50.0, 58.0, 5.0],    # rp=8, pi=10 (wrap)
    ], np.float32))
    rp_edges = jnp.asarray([2.0, 6.0, 9.0])
    dd = np.asarray(tpcf.pair_counts_rp_pi(pos, L, rp_edges, 2, 4, 20.0))
    expected = np.zeros((2, 4))
    expected[0, 2] = 1.0   # rp=5 in [2,6); pi=10 in bin [10,15)
    expected[1, 2] = 1.0   # rp=8 in [6,9); pi=10
    # cross pairs between the two pairs: distances > bins or masked
    d = np.asarray(pos)
    other = 0
    for i in range(4):
        for j in range(i + 1, 4):
            if (i, j) in ((0, 1), (2, 3)):
                continue
            dv = d[i] - d[j]
            dv -= L * np.round(dv / L)
            rp = np.hypot(dv[0], dv[1])
            pi_ = abs(dv[2])
            if 2.0 <= rp < 9.0 and pi_ < 20.0:
                other += 1
                expected[0 if rp < 6.0 else 1, int(pi_ / 5.0)] += 1
    np.testing.assert_array_equal(dd, expected)

    # LOS equivariance: swapping axes 0<->2 with los=0 gives identical DD
    pos_swapped = pos[:, ::-1]
    dd0 = np.asarray(tpcf.pair_counts_rp_pi(pos_swapped, L, rp_edges, 2,
                                            4, 20.0, los=0))
    np.testing.assert_array_equal(dd0, dd)


def test_pair_counts_rp_pi_total_and_poisson():
    from astrild_tpu.ops import tpcf

    rng = np.random.default_rng(2)
    n, L = 4000, 200.0
    pos = jnp.asarray(rng.uniform(0, L, (n, 3)).astype(np.float32))
    rp_edges = jnp.linspace(5.0, 50.0, 6)
    dd = tpcf.pair_counts_rp_pi(pos, L, rp_edges, 5, 20, 80.0)
    assert dd.shape == (5, 20)
    # Poisson box: xi ~ 0 -> counts match analytic RR within noise
    rp, wp, xi = tpcf.projected_tpcf(pos, L, rp_edges, 80.0, n_pi=20)
    assert np.abs(np.asarray(wp)).max() < 8.0   # |wp| small vs pi_max=80
    # half-box guard
    with pytest.raises(ValueError):
        tpcf.projected_tpcf(pos, L, jnp.linspace(5.0, 90.0, 4), 80.0)
