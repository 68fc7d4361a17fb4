"""Density-split statistics + counts-in-cells (ops/density_split.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astrild_tpu.ops import density_split as ds


def test_smooth_density_tophat_constant_preserved():
    delta = jnp.full((16, 16, 16), 0.37)
    sm = ds.smooth_density(delta, 100.0, 10.0)
    np.testing.assert_allclose(np.asarray(sm), 0.37, rtol=1e-5)


def test_density_at_points_matches_grid_nodes():
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.normal(0, 1, (8, 8, 8)).astype(np.float32))
    L = 8.0
    # cell centers: interpolation must return the grid values exactly
    pts = ds.lattice_query_points(8, L)
    vals = ds.density_at_points(field, L, pts)
    np.testing.assert_allclose(np.asarray(vals),
                               np.asarray(field).reshape(-1), atol=1e-5)


def test_quantile_labels_equal_counts_and_order():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(0, 1, 1000))
    lab = np.asarray(ds.density_quantile_labels(v, 5))
    counts = np.bincount(lab, minlength=5)
    assert (counts == 200).all()
    means = [np.asarray(v)[lab == k].mean() for k in range(5)]
    assert all(means[i] < means[i + 1] for i in range(4))
    # tie robustness: all-equal input still splits evenly
    lab2 = np.asarray(ds.density_quantile_labels(jnp.zeros(100), 4))
    assert (np.bincount(lab2, minlength=4) == 25).all()


@pytest.mark.slow
def test_density_split_profiles_sign_ordering():
    """On a GRF, the lowest-density quantile must show a negative tracer
    profile at small r and the highest a positive one, with monotone
    ordering across quantiles at the innermost bins."""
    from astrild_tpu.ops import mocks, paint

    key = jax.random.PRNGKey(0)
    L, ng = 200.0, 32
    pk = lambda k: 8.0e4 * k / (1.0 + (k / 0.03) ** 3)
    delta_m = mocks.gaussian_field(key, ng, L, pk)
    # Poisson tracers modulated by the field (linear bias 1, clipped)
    lam = jnp.clip(1.0 + delta_m, 0.05, None)
    n_per_cell = jax.random.poisson(jax.random.PRNGKey(1), lam * 2.0)
    # positions: cell centers repeated per count (host side, test only)
    counts = np.asarray(n_per_cell).reshape(-1)
    cell = L / ng
    centers = np.asarray(ds.lattice_query_points(ng, L))
    pos = np.repeat(centers, counts, axis=0)
    pos += np.random.default_rng(2).uniform(-cell / 2, cell / 2, pos.shape)
    pos %= L

    dgrid = paint.paint((jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
                         jnp.asarray(pos[:, 2])), ng, L, window="cic")
    dgrid = dgrid / jnp.mean(dgrid) - 1.0
    r, prof = ds.density_split_profiles(dgrid, L, jnp.asarray(pos),
                                        smooth_radius=15.0, n_quantiles=5,
                                        n_query=8, nbins=8)
    prof = np.asarray(prof)
    inner = prof[:, :2].mean(axis=1)
    assert inner[0] < 0 < inner[-1]
    assert (np.diff(inner) > 0).all()


def test_counts_in_cells_poisson():
    rng = np.random.default_rng(3)
    n, L, nc = 40000, 100.0, 16
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    pdf, counts = ds.counts_in_cells(jnp.asarray(pos), L, nc)
    mu, var, skew = ds.counts_in_cells_moments(counts)
    exp = n / nc ** 3
    np.testing.assert_allclose(float(mu), exp, rtol=1e-5)
    # Poisson: var == mean within sampling noise
    assert abs(float(var) / exp - 1.0) < 0.1
    np.testing.assert_allclose(float(jnp.sum(pdf)), 1.0, rtol=1e-6)
    # pdf mean == mu
    k = np.arange(pdf.shape[0])
    np.testing.assert_allclose(float(np.sum(k * np.asarray(pdf))), exp,
                               rtol=0.01)


def test_marked_power_p0_equals_plain():
    from astrild_tpu.ops import mocks, paint, power

    pos = mocks.zeldovich_catalog(
        jax.random.PRNGKey(2), 24, 200.0,
        lambda k: 5e4 * k / (1 + (k / 0.04) ** 2) ** 2)
    res_m, marks = ds.marked_power(pos, 24, 200.0, smooth_radius=15.0,
                                   mark_p=0.0, nbins=8)
    np.testing.assert_allclose(np.asarray(marks), 1.0, atol=1e-6)
    grid = paint.paint(pos, 24, 200.0, window="cic")
    shot = 200.0 ** 3 / pos.shape[0]
    res_p = power.auto_power(grid, 200.0, nbins=8, window="cic",
                             shotnoise=shot)
    np.testing.assert_allclose(np.asarray(res_m.power),
                               np.asarray(res_p.power), rtol=1e-5)


def test_marked_power_downweights_dense_regions():
    from astrild_tpu.ops import mocks

    pos = mocks.zeldovich_catalog(
        jax.random.PRNGKey(3), 32, 200.0,
        lambda k: 3e5 * k / (1 + (k / 0.04) ** 2) ** 2)
    res, marks = ds.marked_power(pos, 32, 200.0, smooth_radius=10.0,
                                 mark_p=2.0, mark_delta_s=0.25, nbins=8)
    marks = np.asarray(marks)
    assert marks.min() > 0
    # marks anti-correlate with local density by construction:
    # particles in dense cells carry smaller marks
    assert marks.std() > 0.05
    assert np.isfinite(np.asarray(res.power)).all()
