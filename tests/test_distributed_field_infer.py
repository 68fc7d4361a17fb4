"""Sharding equivalence for the distributed differentiable forward
model: the pencil-sharded simulate/loss/gradient must match the
single-device ops.field_infer chain (same conventions, FFT-order float
noise only)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from astrild_tpu.ops import field_infer as fi_local
from astrild_tpu.parallel import make_mesh
from astrild_tpu.parallel.field_infer import make_distributed_field_infer
from astrild_tpu.utils.cosmology import Cosmology

COSMO = Cosmology(Om0=0.3, h=0.7)
BOX = 100.0
NGRID = 16
KW = dict(z_init=9.0, nsteps=2, window="cic")


def _pk(k):
    return 2.0e3 * (k / 0.1) ** -1.5


@pytest.fixture(scope="module")
def setup():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(n_sim=2, n_x=2, n_y=2)
    fac = make_distributed_field_infer(mesh, NGRID, BOX, _pk, COSMO,
                                       **KW)
    white_t = jax.random.normal(jax.random.PRNGKey(3), (NGRID,) * 3)
    data = fi_local.simulate_density(white_t, _pk, COSMO, ngrid=NGRID,
                                     boxsize=BOX, **KW)
    white = 0.8 * white_t + 0.2 * jax.random.normal(
        jax.random.PRNGKey(4), (NGRID,) * 3)
    return mesh, fac, white_t, white, data


def test_simulate_matches_local(setup):
    _, fac, white_t, _, data = setup
    got = np.asarray(fac.simulate(white_t))
    np.testing.assert_allclose(got, np.asarray(data), atol=2e-4)


def test_loss_matches_local(setup):
    _, fac, _, white, data = setup
    want = float(fi_local.field_nll(white, data, 0.05, _pk, COSMO,
                                    boxsize=BOX, **KW))
    got = float(fac.loss(white, data, 0.05))
    assert abs(got - want) < 1e-3 * abs(want), (got, want)


def test_gradient_matches_local(setup):
    _, fac, _, white, data = setup

    def local_loss(w):
        return fi_local.field_nll(w, data, 0.05, _pk, COSMO,
                                  boxsize=BOX, **KW)

    g_want = np.asarray(jax.grad(local_loss)(white))
    val, g_got = fac.value_and_grad(white, jnp.asarray(data), 0.05)
    g_got = np.asarray(g_got)
    # relative L2 agreement (FFT-order float noise through 2 PM steps)
    rel = np.linalg.norm(g_got - g_want) / np.linalg.norm(g_want)
    assert rel < 1e-3, rel
    assert np.isfinite(float(val))


def test_gradient_descends(setup):
    """One gradient step on the sharded objective reduces the sharded
    loss (end-to-end sanity that the gradient is usable, not just
    equal)."""
    _, fac, _, white, data = setup
    v0, g = fac.value_and_grad(white, jnp.asarray(data), 0.05)
    # small step along -g, scaled to a max component move of 1e-2
    alpha = 1e-2 / float(jnp.max(jnp.abs(g)))
    v1 = fac.loss(white - alpha * g, data, 0.05)
    assert float(v1) < float(v0)
