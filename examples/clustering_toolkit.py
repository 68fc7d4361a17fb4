"""Example: the galaxy-clustering toolkit — wp(rp), marked P(k),
density-split, BAO reconstruction.

Four estimators the reference era outsourced (halotools/Corrfunc) or
simply predates, in one device-native walkthrough:

  1. projected correlation wp(rp) measured on a mock, against the
     FFTLog theory curve from the same input P(k),
  2. marked power spectrum (White 2016 environment mark),
  3. density-split stacked profiles (quantile environments),
  4. BAO reconstruction: displacement estimate, return-to-initial
     propagator gain.

  python examples/clustering_toolkit.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from astrild_tpu.ops import (bao, density_split, fftlog, linear_power,
                             mocks, paint, power, recon, tpcf)
from astrild_tpu.utils.cosmology import Cosmology
from astrild_tpu.utils.observability import get_logger, stage

log = get_logger()

L, NLAT = 500.0, 64


def pk_fn(k):
    return 4.0e5 * k / (1.0 + (k / 0.04) ** 2) ** 2


def main():
    key = jax.random.PRNGKey(1)

    with stage("Zel'dovich mock"):
        pos = mocks.zeldovich_catalog(key, NLAT, L, pk_fn)
        sub = np.random.default_rng(0).choice(pos.shape[0], 40000,
                                              replace=False)
        # half-cell jitter breaks the Zel'dovich lattice regularity,
        # whose residual spikes otherwise alias into wp at the lattice
        # spacing (7.8 Mpc/h here)
        cell0 = L / NLAT
        jit = np.random.default_rng(1).uniform(-cell0 / 2, cell0 / 2,
                                               (40000, 3))
        p_sub = jnp.asarray((np.asarray(pos)[sub] + jit) % L)

    with stage("wp(rp): measurement vs FFTLog theory"):
        rp_edges = jnp.linspace(4.0, 60.0, 13)
        pi_max = 80.0
        rp, wp, _ = tpcf.projected_tpcf(p_sub, L, rp_edges, pi_max,
                                        n_pi=40)
        k_tab = jnp.asarray(np.geomspace(1e-3, 30.0, 512))
        wp_th = fftlog.wp_from_pk(k_tab, pk_fn(k_tab), rp, pi_max)
    log.info("wp measured: %s", np.round(np.asarray(wp), 2))
    log.info("wp theory  : %s", np.round(np.asarray(wp_th), 2))

    with stage("marked P(k)"):
        res_m, marks = density_split.marked_power(
            pos, NLAT, L, smooth_radius=12.0, mark_p=1.0, nbins=10)
        grid = paint.paint(pos, NLAT, L, window="cic")
        res_p = power.auto_power(grid, L, nbins=10, window="cic",
                                 shotnoise=L ** 3 / pos.shape[0])
    log.info("P_marked/P at k=%.3f: %.3f", float(res_m.k[2]),
             float(res_m.power[2] / res_p.power[2]))

    with stage("density-split profiles"):
        delta = grid / jnp.mean(grid) - 1.0
        r, prof = density_split.density_split_profiles(
            delta, L, pos, smooth_radius=20.0, n_quantiles=5, n_query=10)
    log.info("quantile inner delta: %s",
             np.round(np.asarray(prof)[:, 0], 2))

    with stage("BAO reconstruction"):
        cell = L / NLAT
        x = (jnp.arange(NLAT, dtype=jnp.float32) + 0.25) * cell
        randoms = jnp.stack(jnp.meshgrid(x, x, x, indexing="ij"),
                            axis=-1).reshape(-1, 3)
        pos_rec, rand_rec = recon.reconstruct_catalog(
            pos, randoms, NLAT, L, smooth=10.0)
        delta_l = mocks.gaussian_field(key, NLAT, L, pk_fn)

        def corr(dg):
            pcc = power.cross_power(dg + 1.0, delta_l + 1.0, L, nbins=10)
            paa = power.auto_power(dg + 1.0, L, nbins=10)
            pbb = power.auto_power(delta_l + 1.0, L, nbins=10)
            return np.asarray(pcc.power) / np.sqrt(
                np.asarray(paa.power) * np.asarray(pbb.power))

        def delta_of(p):
            g = paint.paint(p, NLAT, L, window="cic")
            return g / jnp.mean(g) - 1.0

        r_pre = corr(delta_of(pos))
        r_post = corr(delta_of(pos_rec) - delta_of(rand_rec))
    log.info("propagator pre : %s", np.round(r_pre, 3))
    log.info("propagator post: %s", np.round(r_post, 3))

    with stage("BAO scale fit"):
        # the scientific endpoint of the chain: a linear GRF with the
        # full wiggly EH98 P(k), measured, and the acoustic dilation
        # alpha extracted with the damped-template profile likelihood
        cosmo = Cosmology()
        wig = mocks.gaussian_field(
            jax.random.PRNGKey(7), NLAT, L,
            lambda k: linear_power.linear_power(k, cosmo))
        res_l = power.auto_power(wig + 1.0, L, nbins=32)
        # Gaussian field -> exact per-bin errors P sqrt(2/n_modes)
        sig = (np.asarray(res_l.power)
               * np.sqrt(2.0 / np.maximum(np.asarray(res_l.nmodes), 1)))
        fit = bao.fit_bao_scale(np.asarray(res_l.k),
                                np.asarray(res_l.power), cosmo,
                                sigma=sig, sigma_nl=1.0,
                                kmin=0.04, kmax=0.30,
                                alphas=np.linspace(0.7, 1.3, 301))
    log.info("BAO alpha = %.4f +- %.4f (chi2/dof %.2f)", fit.alpha,
             fit.alpha_err, fit.chi2 / max(fit.dof, 1))
    print("OK")


if __name__ == "__main__":
    main()
