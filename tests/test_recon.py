"""BAO reconstruction (ops/recon.py): the estimated displacement must
undo a Zel'dovich displacement (positions return to the lattice) and
raise the cross-correlation with the initial field."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astrild_tpu.ops import mocks, paint, power, recon


def _pk(k):
    return 2.0e4 * k / (1.0 + (k / 0.04) ** 2) ** 2


L, NLAT, NGRID = 500.0, 64, 64


@pytest.fixture(scope="module")
def catalog():
    key = jax.random.PRNGKey(3)
    pos = mocks.zeldovich_catalog(key, NLAT, L, _pk)
    delta_l = mocks.gaussian_field(key, NLAT, L, _pk)  # same white noise
    return pos, delta_l


def test_displacement_zero_on_lattice():
    cell = L / 32
    x = (jnp.arange(32) + 0.5) * cell
    lattice = jnp.stack(jnp.meshgrid(x, x, x, indexing="ij"),
                        axis=-1).reshape(-1, 3)
    psi = recon.displacement_field(lattice, 32, L, smooth=10.0)
    assert float(jnp.max(jnp.abs(psi))) < 1e-3


def test_reconstruction_returns_to_lattice(catalog):
    pos, _ = catalog
    cell = L / NLAT
    x = (jnp.arange(NLAT, dtype=jnp.float32) + 0.5) * cell
    lattice = jnp.stack(jnp.meshgrid(x, x, x, indexing="ij"),
                        axis=-1).reshape(-1, 3)
    disp_in = np.asarray(pos) - np.asarray(lattice)
    disp_in -= L * np.round(disp_in / L)
    rms_in = np.sqrt((disp_in ** 2).sum(axis=1)).std()

    rng = np.random.default_rng(0)
    randoms = jnp.asarray(rng.uniform(0, L, (NLAT ** 3 // 4, 3)),
                          jnp.float32)
    pos_rec, _ = recon.reconstruct_catalog(pos, randoms, NGRID, L,
                                           smooth=8.0)
    disp_out = np.asarray(pos_rec) - np.asarray(lattice)
    disp_out -= L * np.round(disp_out / L)
    rms_out = np.sqrt((disp_out ** 2).sum(axis=1)).std()
    # reconstruction must remove most of the (large-scale) displacement
    assert rms_out < 0.5 * rms_in


def test_reconstruction_raises_initial_correlation(catalog):
    pos, delta_l = catalog
    # grid randoms (half-cell offset lattice): zero shot noise, so the
    # shifted-randoms field carries the clean -delta_smooth imprint (a
    # Poisson random catalog needs ~50x the data density for the same)
    cell = L / NLAT
    x = (jnp.arange(NLAT, dtype=jnp.float32) + 0.25) * cell
    randoms = jnp.stack(jnp.meshgrid(x, x, x, indexing="ij"),
                        axis=-1).reshape(-1, 3)
    pos_rec, rand_rec = recon.reconstruct_catalog(pos, randoms, NGRID, L,
                                                  smooth=8.0)

    def corr_with_initial(delta_g):
        pcc = power.cross_power(delta_g + 1.0, delta_l + 1.0, L, nbins=10)
        paa = power.auto_power(delta_g + 1.0, L, nbins=10)
        pbb = power.auto_power(delta_l + 1.0, L, nbins=10)
        return (np.asarray(pcc.power)
                / np.sqrt(np.asarray(paa.power) * np.asarray(pbb.power)))

    def delta_of(p):
        g = paint.paint(p, NLAT, L, window="cic")
        return g / jnp.mean(g) - 1.0

    # the reconstructed FIELD is delta(data shifted) - delta(randoms
    # shifted): the shifted randoms restore the large-scale modes the
    # data shift removed (Padmanabhan+12)
    r_pre = corr_with_initial(delta_of(pos))
    r_post = corr_with_initial(delta_of(pos_rec) - delta_of(rand_rec))
    # mid-k bins: reconstruction must not lower the propagator; it should
    # visibly raise it where nonlinear damping had reduced it
    mid = slice(3, 8)
    assert (r_post[mid] >= r_pre[mid] - 0.01).all()
    assert r_post[mid].mean() > r_pre[mid].mean()
