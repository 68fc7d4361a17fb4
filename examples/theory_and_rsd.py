"""Example: the theory stack and the closed RSD/lensing loops.

Everything the reference had to defer to external packages (CLASS, CAMB,
halotools, nbodykit poles, Fortran ray tracing) or simply lacked:

  1. linear P(k) (EH98 w/ BAO) -> halofit AND halo-model nonlinear P(k)
  2. Kaiser multipoles -> FFTLog -> xi_ell(s) with the BAO peak
  3. Zel'dovich mock -> redshift space -> measured P_ell vs Kaiser
     (+ Gaussian covariance error bars)
  4. lens planes -> Born kappa AND post-Born ray tracing (rotation map)

  python examples/theory_and_rsd.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from astrild_tpu import Cosmology
from astrild_tpu.models import SkyArray
from astrild_tpu.ops import (covariance, fftlog, halo_model, linear_power,
                             mocks, paint, power, tpcf)
from astrild_tpu.utils.observability import get_logger, stage

log = get_logger()
cosmo = Cosmology()

# ------------------------------------------------ 1. nonlinear theory
with stage("theory P(k)"):
    k = jnp.asarray(np.logspace(-3, 1, 64))
    p_lin = linear_power.linear_power(k, cosmo)
    p_halofit = linear_power.nonlinear_power(k, cosmo)
    _, _, p_hm = halo_model.halo_model_power(k, cosmo)
    i = 48
    log.info("P(k=%.2f): lin %.1f halofit %.1f halo-model %.1f",
             float(k[i]), float(p_lin[i]), float(p_halofit[i]),
             float(p_hm[i]))

# ------------------------------------- 2. configuration-space theory
with stage("xi_ell(s) via FFTLog"):
    kk = np.logspace(-4, 2, 1024)
    p0, p2, p4 = linear_power.kaiser_multipoles(jnp.asarray(kk), cosmo)
    s, xi = fftlog.xi_multipoles_from_pk(kk, jnp.stack([p0, p2, p4]))
    s = np.asarray(s)
    v = np.asarray(xi[0]) * s ** 2
    sel = (s > 90) & (s < 115)
    log.info("BAO peak: s = %.1f Mpc/h (s^2 xi0 = %.1f)",
             s[sel][np.argmax(v[sel])], v[sel].max())

# -------------------------------------------- 3. measured RSD closure
with stage("Zel'dovich RSD measurement"):
    ngrid, box, f = 64, 1000.0, float(cosmo.growth_rate(0.0))
    pk_fn = lambda q: 2e4 * jnp.exp(-((q / 0.08) ** 2))  # noqa: E731
    pos, vel = mocks.zeldovich_catalog_with_velocities(
        jax.random.PRNGKey(0), ngrid, box, pk_fn, f)
    pos_s = tpcf.to_redshift_space(pos, vel, box)
    grid = paint.paint(pos_s, ngrid, box, window="cic")
    res = power.auto_power_multipoles(grid, box, nbins=16, window="cic")
    _, cov, _ = covariance.gaussian_multipole_covariance(
        ngrid, box, 16, pk_fn, beta=f)
    r = float((res.p_ell[1][3] / res.p_ell[0][3]))
    sig = float(jnp.sqrt(cov[1, 1, 3]) / res.p_ell[0][3])
    beta = f
    kaiser = (4 * beta / 3 + 4 * beta ** 2 / 7) / (1 + 2 * beta / 3
                                                   + beta ** 2 / 5)
    log.info("P2/P0 measured %.3f +- %.3f, Kaiser %.3f", r, sig, kaiser)

# ------------------------------------------ 4. post-Born ray tracing
with stage("multi-plane ray tracing"):
    rng = np.random.default_rng(1)
    planes = jnp.asarray(rng.normal(0, 0.3, (8, 256, 256)),
                         jnp.float32)
    chis = jnp.linspace(300.0, 2400.0, 8)
    dchis = jnp.full((8,), 300.0)
    born = SkyArray.from_density_planes(planes, chis, dchis, 2700.0,
                                        cosmo.Om0, 5.0, method="born")
    rt = SkyArray.from_density_planes(planes, chis, dchis, 2700.0,
                                      cosmo.Om0, 5.0, method="raytrace")
    dk = float(jnp.abs(rt.data["orig"] - born.data["orig"]).std())
    log.info("kappa rms %.4f; post-Born correction rms %.2e; "
             "rotation rms %.2e",
             float(born.data["orig"].std()), dk,
             float(rt.data["omega"].std()))

# ------------------------------- 5. autodiff Fisher survey forecast
with stage("tomographic shear Fisher (autodiff)"):
    from astrild_tpu.ops.forecast import shear_fisher
    res = shear_fisher(np.geomspace(100, 2000, 10),
                       {"Om0": cosmo.Om0, "sigma8": cosmo.sigma8},
                       z_sources=[0.6, 1.0, 1.6], fsky=0.36, nchi=128)
    log.info("1-sigma marginalized: %s",
             dict(zip(res["names"], np.round(res["marginalized"], 5))))

log.info("theory_and_rsd example complete")
