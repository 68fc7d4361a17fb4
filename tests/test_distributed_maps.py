"""Sharded 2D map filter == single-device filter."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from astrild_tpu.ops import filters as F
from astrild_tpu.parallel import make_mesh
from astrild_tpu.parallel.maps import (make_sharded_gaussian_filter,
                                       pfft2d_local)


@pytest.fixture(scope="module")
def mesh4():
    return make_mesh(n_sim=1, n_x=4, n_y=2)


@pytest.mark.parametrize("mesh_shape,n,theta,sigma", [
    ((1, 4, 2), 128, 5.0, 4.0),
    ((2, 2, 2), 96, 10.0, 8.0),
    ((1, 8, 1), 256, 5.0, 2.0),
])
def test_sharded_gaussian_matches_local(rng, mesh_shape, n, theta, sigma):
    mesh = make_mesh(n_sim=mesh_shape[0], n_x=mesh_shape[1],
                     n_y=mesh_shape[2])
    img = rng.standard_normal((n, n)).astype(np.float32)
    want = np.asarray(F.gaussian(jnp.asarray(img), theta,
                                 sigma_arcmin=sigma))
    fn = make_sharded_gaussian_filter(mesh, n, theta, sigma)
    img_sh = jax.device_put(jnp.asarray(img),
                            NamedSharding(mesh, P("x", None)))
    got = np.asarray(fn(img_sh))
    npt.assert_allclose(got, want, atol=2e-4)


def test_pfft2d_matches_fft2(mesh4, rng):
    n = 64
    img = rng.standard_normal((n, n)).astype(np.float32)
    want = np.fft.fft2(img)  # output re-shards along axis 1
    fn = jax.jit(jax.shard_map(pfft2d_local, mesh=mesh4,
                               in_specs=P("x", None),
                               out_specs=P(None, "x")))
    img_sh = jax.device_put(jnp.asarray(img),
                            NamedSharding(mesh4, P("x", None)))
    got = np.asarray(fn(img_sh))
    npt.assert_allclose(got, want, rtol=1e-3, atol=1e-2)
