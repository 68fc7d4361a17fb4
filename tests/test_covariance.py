"""Gaussian covariance predictions vs the empirical scatter of Gaussian
realizations measured with this package's own estimators."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from astrild_tpu.ops import covariance as C
from astrild_tpu.ops import mocks, power as P

NGRID = 32
BOX = 500.0
NBINS = 8
NREAL = 60


def _p_iso(k):
    return 2e4 * jnp.exp(-((jnp.asarray(k) / 0.25) ** 2))


def test_pk_variance_matches_realizations():
    keys = jax.random.split(jax.random.PRNGKey(0), NREAL)

    def one(key):
        d = mocks.gaussian_field(key, NGRID, BOX, _p_iso)
        return P.auto_power(1.0 + d, BOX, nbins=NBINS).power

    pks = np.asarray(jax.vmap(one)(keys))
    res = P.auto_power(
        1.0 + mocks.gaussian_field(keys[0], NGRID, BOX, _p_iso),
        BOX, nbins=NBINS)
    var_pred = np.asarray(C.gaussian_pk_covariance(
        _p_iso(res.k), res.nmodes))
    var_emp = pks.var(axis=0, ddof=1)
    # 60 realizations: the sample variance of a variance is ~sqrt(2/59)
    sel = np.asarray(res.nmodes) > 3
    ratio = var_emp[sel] / var_pred[sel]
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), ratio


def test_multipole_covariance_structure_and_scale():
    k, cov, nm = C.gaussian_multipole_covariance(
        NGRID, BOX, NBINS, _p_iso, beta=0.5)
    cov = np.asarray(cov)
    assert cov.shape == (3, 3, NBINS)
    # symmetric, positive-definite diagonal
    npt.assert_allclose(cov[0, 1], cov[1, 0])
    assert np.all(cov[0, 0] > 0) and np.all(cov[1, 1] > 0)
    # beta=0 limit: the P0 variance reduces to the isotropic formula
    k0, cov0, nm0 = C.gaussian_multipole_covariance(
        NGRID, BOX, NBINS, _p_iso, beta=0.0)
    iso = np.asarray(C.gaussian_pk_covariance(_p_iso(jnp.asarray(k0)),
                                              nm0))
    # discrete-shell P(k) varies within a bin; compare at moderate rtol
    npt.assert_allclose(np.asarray(cov0)[0, 0], iso, rtol=0.35)
    # quadrupole variance exceeds (2l+1)-free expectation: positive
    assert np.all(np.asarray(cov0)[1, 1] > 0)


def test_cl_covariance_formula():
    ells = jnp.asarray([10.0, 100.0])
    cl = jnp.asarray([1.0, 0.1])
    v = np.asarray(C.gaussian_cl_covariance(cl, ells, fsky=0.5,
                                            noise_cl=0.0, delta_ell=10.0))
    npt.assert_allclose(v[0], 2.0 * 1.0 / (21 * 0.5 * 10.0), rtol=1e-6)


def test_flat_sky_cl_variance_matches_realizations():
    """Gaussian Cl error bars with the flat-sky estimator's own discrete
    mode counts reproduce the empirical scatter of GRF maps."""
    from astrild_tpu.ops.angular_power import (cl_flat_sky,
                                               cl_to_flat_map,
                                               flat_sky_mode_counts)

    npix, oa, nb = 64, 10.0, 10
    ells_tab = jnp.asarray(np.geomspace(1.0, 5000.0, 128), jnp.float32)
    cl_tab = 1e-3 / (ells_tab + 30.0) ** 2
    keys = jax.random.split(jax.random.PRNGKey(1), 80)

    def one(key):
        m = cl_to_flat_map(key, ells_tab, cl_tab, npix, oa)
        return cl_flat_sky(m, oa, nbins=nb)[1]

    cls = np.asarray(jax.vmap(one)(keys))
    ell, nm = flat_sky_mode_counts(npix, oa, nbins=nb)
    mean_cl = cls.mean(axis=0)
    var_pred = np.asarray(C.gaussian_pk_covariance(mean_cl, nm))
    var_emp = cls.var(axis=0, ddof=1)
    sel = np.asarray(nm) > 40  # enough modes for a stable variance ratio
    ratio = var_emp[sel] / var_pred[sel]
    # factor-2 regression guard: with the full hermitian-weighted count
    # the ratio sits near 1; returning nm/2 would push it to ~0.5
    assert np.all(ratio > 0.55) and np.all(ratio < 1.7), ratio


def test_spatial_jackknife_exact_for_linear_statistic():
    """For the (padded-aware) sample SUM, the delete-one jackknife
    variance has the closed form (n-1)/n * sum (s_r - mean)^2 computed
    over region sums — check the machinery exactly."""
    import jax.numpy as jnp

    from astrild_tpu.ops.covariance import (spatial_jackknife,
                                            spatial_jackknife_regions)

    rng = np.random.default_rng(0)
    n, L, nside = 3000, 100.0, 2
    pos = rng.uniform(0, L, (n, 3))
    w = rng.normal(1.0, 0.3, n)

    def est(p, n_valid, wcol):
        mask = jnp.arange(p.shape[0]) < n_valid
        return jnp.array([jnp.sum(jnp.where(mask, wcol, 0.0))])

    full, jk, cov = spatial_jackknife(est, pos, L, n_side=nside,
                                      extra_cols=(w,))
    labels = spatial_jackknife_regions(pos, L, nside)
    region_sums = np.array([w[labels == r].sum() for r in range(8)])
    np.testing.assert_allclose(float(full[0]), w.sum(), rtol=1e-6)
    # delete-one sample r = total - region_r
    np.testing.assert_allclose(jk[:, 0], w.sum() - region_sums,
                               rtol=1e-5)
    d = jk[:, 0] - jk[:, 0].mean()
    cov_ref = 7.0 / 8.0 * np.sum(d * d)
    np.testing.assert_allclose(cov[0, 0], cov_ref, rtol=1e-6)


def test_spatial_jackknife_wp_smoke():
    """Jackknife over the wp estimator: positive variances, sane scale
    (Poisson box: wp ~ 0 within a few jackknife sigmas)."""
    import jax.numpy as jnp

    from astrild_tpu.ops.covariance import spatial_jackknife
    from astrild_tpu.ops.tpcf import projected_tpcf

    rng = np.random.default_rng(1)
    n, L = 2000, 120.0
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    rp_edges = jnp.linspace(4.0, 30.0, 5)

    def est(p, n_valid, *unused):
        _, wp, _ = projected_tpcf(p, L, rp_edges, pi_max=40.0, n_pi=8,
                                  n_valid=n_valid, block=256)
        return wp

    full, jk, cov = spatial_jackknife(est, pos, L, n_side=2)
    sig = np.sqrt(np.diag(cov))
    assert (sig > 0).all()
    assert (np.abs(np.asarray(full)) < 5 * sig).all()
