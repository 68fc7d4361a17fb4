"""Composed distributed z=0 suite == single-device bench chain
(VERDICT r2 next-step #7: the stages were only equivalence-tested
separately; this runs the full composed pipeline sharded)."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from astrild_tpu.ops import bispectrum as bis_ops
from astrild_tpu.ops import lensing as lens_ops
from astrild_tpu.ops import peaks as peak_ops
from astrild_tpu.ops import power as power_ops
from astrild_tpu.ops import voids as void_ops
from astrild_tpu.parallel import make_mesh
from astrild_tpu.parallel.suite import make_distributed_z0_suite

BOX = 500.0
NG = 32
NPLANES = 8


@pytest.mark.slow
@pytest.mark.slow
def test_composed_suite_matches_single_device(rng):
    n_part = 1 << 17
    pos = rng.uniform(0, BOX, (n_part, 3)).astype(np.float32)
    mesh = make_mesh(n_sim=2, n_x=2, n_y=2)
    fn = make_distributed_z0_suite(
        mesh, NG, BOX, nbins_pk=10, nbins_bk=3, bk_m_min=2.0,
        bk_m_max=10.0, nplanes=NPLANES, max_peaks=256, max_voids=64)
    spec = NamedSharding(mesh, P(("sim", "x", "y"), None))
    got = fn(jax.device_put(jnp.asarray(pos), spec))

    # ------- single-device reference: the bench chain, contiguous slabs
    res, grid = power_ops.auto_power_fast(
        (jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
         jnp.asarray(pos[:, 2])), NG, BOX, nbins=10,
        return_coarse_grid=True, deposit="scatter")
    bk = bis_ops.bispectrum_3d(grid, BOX, nbins=3, m_min=2.0, m_max=10.0)
    delta = grid / jnp.mean(grid) - 1.0
    planes = jnp.moveaxis(
        delta.reshape(NG, NG, NPLANES, NG // NPLANES).sum(3), -1, 0)
    chis = jnp.linspace(200.0, 2800.0, NPLANES)
    dchis = jnp.full((NPLANES,), BOX / NPLANES)
    kappa = lens_ops.born_convergence(planes, chis, dchis, 3000.0, 0.3089)
    a1, a2 = lens_ops.kappa_to_alpha(kappa, 0.35, padding_factor=2)
    g1, g2 = lens_ops.alpha_to_gamma(a1, a2, 0.35)
    cat = peak_ops.find_peaks(kappa, threshold=jnp.std(kappa),
                              max_peaks=256, edge_pix=4)
    vcat = void_ops.find_tunnels(cat.pos.astype(jnp.float32),
                                 cat.values > -jnp.inf, NG, max_voids=64)

    # P(k): same estimator, collective binning
    npt.assert_allclose(np.asarray(got.pk.power), np.asarray(res.power),
                        rtol=5e-3, atol=1e-3 * BOX ** 3 / n_part)
    # B(k): same shells, fp reassociation tolerance
    npt.assert_allclose(np.asarray(got.bk.b), np.asarray(bk.b),
                        rtol=2e-2)
    npt.assert_allclose(np.asarray(got.bk.ntri), np.asarray(bk.ntri),
                        rtol=1e-4)
    # maps: identical chain on identical planes
    npt.assert_allclose(np.asarray(got.kappa), np.asarray(kappa),
                        rtol=1e-4, atol=1e-6)
    npt.assert_allclose(np.asarray(got.gamma1), np.asarray(g1),
                        rtol=1e-4, atol=1e-6)
    npt.assert_allclose(np.asarray(got.gamma2), np.asarray(g2),
                        rtol=1e-4, atol=1e-6)
    # voids: same catalog, truncation observable via n_void_candidates
    assert int(got.n_voids) == int(vcat.n)
    assert int(got.n_void_candidates) == int(vcat.n_candidates)
    nv = int(vcat.n)
    npt.assert_allclose(np.asarray(got.void_radius[:nv]),
                        np.asarray(vcat.radius[:nv]), rtol=1e-4,
                        atol=1e-4)

    # component-tuple input (the multihost loader layout) == array input
    comps = tuple(jnp.asarray(pos[:, i]) for i in range(3))
    got_t = fn(comps)
    npt.assert_allclose(np.asarray(got_t.pk.power),
                        np.asarray(got.pk.power), rtol=1e-5)
    npt.assert_allclose(np.asarray(got_t.kappa), np.asarray(got.kappa),
                        rtol=1e-5, atol=1e-7)
