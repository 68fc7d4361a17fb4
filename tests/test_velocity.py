"""Velocity-divergence spectra (ops/velocity.py) against Zel'dovich
linear theory: theta = -a H f delta exactly for a Zel'dovich flow, so
P_thetatheta = (aHf)^2 P_delta and P_deltatheta = -aHf P_delta at low k."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astrild_tpu.ops import mocks, velocity


def _pk(k):
    return 3.0e3 * k / (1.0 + (k / 0.05) ** 2) ** 2


GROWTH_F = 0.52
AHF = 100.0 * GROWTH_F
L, NLAT, NGRID = 500.0, 64, 32


@pytest.fixture(scope="module")
def zeldovich():
    pos, vel = mocks.zeldovich_catalog_with_velocities(
        jax.random.PRNGKey(0), NLAT, L, _pk, growth_rate=GROWTH_F)
    return pos, vel


def test_velocity_field_recovers_uniform_flow(zeldovich):
    pos, _ = zeldovich
    vflat = jnp.broadcast_to(jnp.array([120.0, -50.0, 30.0]),
                             (pos.shape[0], 3))
    vgrids, counts = velocity.velocity_field(pos, vflat, NGRID, L)
    assert float(jnp.min(counts)) > 0  # dense lattice: no empty cells
    for i, expect in enumerate([120.0, -50.0, 30.0]):
        np.testing.assert_allclose(np.asarray(vgrids[i]), expect,
                                   rtol=1e-4)
    # uniform flow is divergence-free
    theta = velocity.velocity_divergence(vgrids, L)
    assert float(jnp.max(jnp.abs(theta))) < 1e-2


def _measured_pdd(pos):
    """P_dd of the SAME realization (uncompensated CIC, like theta):
    cosmic variance and the assignment window cancel in ratios."""
    from astrild_tpu.ops import paint, power

    counts = paint.paint(pos, NGRID, L, window="cic")
    return np.asarray(power.auto_power(counts, L, nbins=8).power)


def test_ptheta_matches_linear_theory(zeldovich):
    pos, vel = zeldovich
    res = velocity.velocity_divergence_power(pos, vel, NGRID, L, nbins=8)
    ratio = np.asarray(res.power)[:3] / (AHF ** 2 * _measured_pdd(pos)[:3])
    np.testing.assert_allclose(ratio, 1.0, rtol=0.05)


def test_delta_theta_cross_sign_and_amplitude(zeldovich):
    pos, vel = zeldovich
    res = velocity.delta_theta_cross_power(pos, vel, NGRID, L, nbins=8)
    p = np.asarray(res.power)
    # compensated-delta x uncompensated-theta: the window mismatch grows
    # toward the nyquist, so pin the low-k bins only
    ratio = p[:3] / (-AHF * _measured_pdd(pos)[:3])
    np.testing.assert_allclose(ratio, 1.0, rtol=0.1)
    assert (p[:5] < 0).all()
