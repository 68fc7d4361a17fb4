"""Strong-lensing utilities + grav-map slicing tests."""
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from astrild_tpu.ops import strong_lensing as SL


def test_remap_identity():
    img = jnp.arange(64.0).reshape(8, 8)
    ii = jnp.arange(8.0)
    c1 = ii[:, None] * jnp.ones((1, 8))
    c2 = ii[None, :] * jnp.ones((8, 1))
    out = SL.remap_image(img, c1, c2)
    npt.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_remap_half_pixel_shift():
    img = jnp.arange(8.0)[None, :] * jnp.ones((8, 1))
    ii = jnp.arange(8.0)
    c1 = ii[:, None] * jnp.ones((1, 8))
    c2 = ii[None, :] * jnp.ones((8, 1)) + 0.5
    out = np.asarray(SL.remap_image(img, c1, c2))
    want = np.broadcast_to(np.arange(7) + 0.5, (8, 7))
    npt.assert_allclose(out[:, :-1], want, atol=1e-6)


def test_shear_from_potential_quadratic():
    # phi = x^2/2 -> phi_11 = 1, others 0 -> kappa = 0.5, gamma1 = 0.5
    n = 32
    oa = 1.0
    x = (jnp.arange(n) + 0.5) / n
    phi = 0.5 * (x ** 2)[:, None] * jnp.ones((1, n))
    kappa, g1, g2 = SL.shear_from_potential(phi, oa)
    c = np.s_[4:-4, 4:-4]
    npt.assert_allclose(np.asarray(kappa)[c], 0.5, atol=1e-3)
    npt.assert_allclose(np.asarray(g1)[c], 0.5, atol=1e-3)
    npt.assert_allclose(np.asarray(g2)[c], 0.0, atol=1e-3)


def test_sph_surface_density_conserves_mass():
    rng = np.random.default_rng(0)
    n = 500
    pos = jnp.asarray(rng.uniform(10, 90, (n, 2)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(1, 2, n).astype(np.float32))
    hsml = jnp.asarray(rng.uniform(0.5, 5.0, n).astype(np.float32))
    npix, box = 64, 100.0
    sd = SL.sph_surface_density(pos, mass, hsml, npix, box)
    total = float(jnp.sum(sd)) * (box / npix) ** 2
    npt.assert_allclose(total, float(jnp.sum(mass)), rtol=1e-3)
