import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from astrild_tpu.ops import angular_power as AP
from astrild_tpu.ops import map_transform as MT
from astrild_tpu.io.binary_formats import write_info_header


def test_masked_cl_recovers_unmasked(rng):
    n = 128
    img = jnp.asarray(rng.normal(0, 1, (n, n)).astype(np.float32))
    ell, cl_full = AP.cl_flat_sky(img, 5.0, nbins=8)
    # mask half the map
    mask = jnp.ones((n, n)).at[:, n // 2:].set(0.0)
    ell2, cl_masked = AP.cl_flat_sky_masked(img, mask, 5.0, nbins=8)
    # white noise: masked pseudo-Cl with <w^2> correction ~ full Cl
    npt.assert_allclose(np.asarray(cl_masked), np.asarray(cl_full),
                        rtol=0.25)


def test_slice_map_mean_of_slab():
    pos = jnp.asarray([[10.0, 10.0, 50.0],   # in slab
                       [10.0, 10.0, 52.0],   # in slab, same pixel
                       [10.0, 10.0, 5.0]])   # outside slab
    vals = jnp.asarray([1.0, 3.0, 100.0])
    m = MT.slice_map(pos, vals, 4, 100.0, axis=2, slab_center=50.0,
                     slab_width=10.0)
    npt.assert_allclose(float(m[0, 0]), 2.0)
    npt.assert_allclose(float(jnp.sum(m)), 2.0)


def test_write_info_header(tmp_path):
    p = write_info_header(str(tmp_path / "halos.bin"), "halo catalog",
                          ["id", "x", "y"])
    text = open(p).read()
    assert "halo catalog" in text and "column 2: y" in text


def test_masked_cl_explicit_apodization(rng):
    """apodize_arcmin is a static argname: calling with an explicit value
    (traced-bool regression, ADVICE r1) must work and stay close to the
    unapodized white-noise answer."""
    n = 128
    img = jnp.asarray(rng.normal(0, 1, (n, n)).astype(np.float32))
    mask = jnp.ones((n, n)).at[:, n // 2:].set(0.0)
    ell0, cl0 = AP.cl_flat_sky_masked(img, mask, 5.0, nbins=8,
                                      apodize_arcmin=0.0)
    ell1, cl1 = AP.cl_flat_sky_masked(img, mask, 5.0, nbins=8,
                                      apodize_arcmin=10.0)
    assert np.all(np.isfinite(np.asarray(cl1)))
    npt.assert_allclose(np.asarray(cl1)[2:], np.asarray(cl0)[2:], rtol=0.5)
