"""Distributed lensing suite == per-sim local pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from astrild_tpu.ops import lensing as L
from astrild_tpu.ops import peaks as PK
from astrild_tpu.ops import voids as V
from astrild_tpu.parallel import make_mesh
from astrild_tpu.parallel.lensing import make_distributed_lensing_suite


@pytest.mark.parametrize("mesh_shape,nsim,nplane,npix", [
    ((4, 1, 2), 4, 8, 64),
    ((2, 2, 2), 2, 6, 96),
])
@pytest.mark.slow
def test_distributed_lensing_matches_local(rng, mesh_shape, nsim, nplane,
                                           npix):
    mesh = make_mesh(n_sim=mesh_shape[0], n_x=mesh_shape[1],
                     n_y=mesh_shape[2])
    oa = 0.1
    chi_s, om = 3000.0, 0.3
    planes = rng.normal(0, 0.5, (nsim, nplane, npix, npix)).astype(np.float32)
    chis = jnp.linspace(300.0, 2500.0, nplane)
    dchis = jnp.full((nplane,), 50.0)

    fn = make_distributed_lensing_suite(mesh, npix, oa, chi_s, om,
                                        max_peaks=128, max_voids=32)
    planes_sh = jax.device_put(jnp.asarray(planes),
                               NamedSharding(mesh, P("sim")))
    out = fn(planes_sh, chis, dchis)
    assert out.kappa.shape == (nsim, npix, npix)
    assert out.void_radius.shape == (nsim, 32)

    assert out.void_radius.shape == (nsim, 32)

    # compare EVERY realization against the local pipeline
    for s in range(nsim):
        kap = L.born_convergence(jnp.asarray(planes[s]), chis, dchis,
                                 chi_s, om)
        npt.assert_allclose(np.asarray(out.kappa[s]), np.asarray(kap),
                            rtol=1e-5, atol=1e-8)
        a1, a2 = L.kappa_to_alpha(kap, oa, padding_factor=2)
        g1, g2 = L.alpha_to_gamma(a1, a2, oa)
        npt.assert_allclose(np.asarray(out.gamma1[s]), np.asarray(g1),
                            rtol=1e-4, atol=1e-7)
        npt.assert_allclose(np.asarray(out.gamma2[s]), np.asarray(g2),
                            rtol=1e-4, atol=1e-7)
        cat = PK.find_peaks(kap, threshold=jnp.std(kap), max_peaks=128,
                            edge_pix=4)
        vcat = V.find_tunnels(cat.pos.astype(jnp.float32),
                              cat.values > -jnp.inf, npix, max_voids=32)
        npt.assert_allclose(np.asarray(out.void_radius[s]),
                            np.asarray(vcat.radius), rtol=1e-5)
        assert int(out.n_voids[s]) == int(vcat.n)


@pytest.mark.parametrize("mesh_shape,nsim,npix", [
    ((4, 1, 2), 4, 64),
    ((2, 2, 2), 2, 48),
])
def test_distributed_raytrace_matches_local(rng, mesh_shape, nsim, npix):
    """Post-Born multiplane ray tracing sharded over 'sim' == local."""
    from astrild_tpu.ops import raytrace as R
    from astrild_tpu.parallel.lensing import make_distributed_raytrace

    mesh = make_mesh(n_sim=mesh_shape[0], n_x=mesh_shape[1],
                     n_y=mesh_shape[2])
    nplane = 4
    oa = np.radians(5.0)
    chi_s, om = 2500.0, 0.3
    planes = rng.normal(0, 0.3, (nsim, nplane, npix, npix)).astype(np.float32)
    chis = jnp.linspace(500.0, 2000.0, nplane)
    dchis = jnp.full((nplane,), 375.0)

    fn = make_distributed_raytrace(mesh, chi_s, om, oa)
    planes_sh = jax.device_put(jnp.asarray(planes),
                               NamedSharding(mesh, P("sim")))
    out = fn(planes_sh, chis, dchis)
    assert out["kappa"].shape == (nsim, npix, npix)
    for s in range(nsim):
        loc = R.multiplane_raytrace(jnp.asarray(planes[s]), chis, dchis,
                                    chi_s, om, oa)
        for key in ("kappa", "gamma1", "gamma2", "omega"):
            npt.assert_allclose(np.asarray(out[key][s]),
                                np.asarray(loc[key]), rtol=2e-4, atol=5e-7)


def test_distributed_multiplane_healpix_matches_local(rng):
    """Ray-sharded curved-sky tracer == the local tracer (fields
    replicated, transport sharded over the HEALPix ray grid)."""
    import jax
    from jax.sharding import Mesh
    from astrild_tpu.ops import lightcone_sphere as lcs
    from astrild_tpu.parallel.lensing import (
        make_distributed_multiplane_healpix)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("x",))
    nside = 8
    npix = 12 * nside * nside
    nshell = 3
    delta = rng.normal(0.0, 0.3, (nshell, npix)).astype(np.float32)
    chis = np.array([300.0, 500.0, 700.0], np.float32)
    dchis = np.full(nshell, 100.0, np.float32)
    want = lcs.multiplane_raytrace_healpix(delta, chis, dchis, 900.0,
                                           0.3, lmax=2 * nside)
    fn = make_distributed_multiplane_healpix(mesh, nside, 0.3,
                                             lmax=2 * nside)
    got = fn(delta, chis, dchis, 900.0)
    for k in ("kappa", "gamma1", "gamma2", "omega"):
        npt.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                            atol=1e-5, err_msg=k)


def test_distributed_multiplane_rejects_array_chi_s(rng):
    import jax
    from jax.sharding import Mesh
    from astrild_tpu.parallel.lensing import (
        make_distributed_multiplane_healpix)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("x",))
    fn = make_distributed_multiplane_healpix(mesh, 4, 0.3, lmax=8)
    delta = rng.normal(0.0, 0.1, (2, 192)).astype(np.float32)
    with pytest.raises(ValueError):
        fn(delta, np.array([300.0, 500.0], np.float32),
           np.full(2, 100.0, np.float32), np.array([700.0, 900.0]))
