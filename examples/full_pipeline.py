"""End-to-end example: the translated astrild workflow on synthetic data.

Mirrors the reference example notebook's flow (collection -> density fields
-> P(k)) and continues through the lensing/void pipeline. Runs on any
backend; on TPU every stage is jit-compiled.

  python examples/full_pipeline.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from astrild_tpu import Cosmology
from astrild_tpu.models import (Bispectrum3D, PowerSpectrum3D, SkyArray,
                                TunnelsFinder, Voids)
from astrild_tpu.ops import lensing, paint, power
from astrild_tpu.utils.observability import get_logger, stage

log = get_logger()

BOX = 250.0        # Mpc/h
NGRID = 128
N_PART = 64 ** 3
N_SIMS = 4         # the "simulation collection" (realizations)


def synthetic_particles(key, n):
    """Clumpy particle distribution (Poisson-sampled halos + field)."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_halo = n // 2
    centers = jax.random.uniform(k1, (64, 3), minval=0.0, maxval=BOX)
    which = jax.random.randint(k2, (n_halo,), 0, 64)
    halo_pos = centers[which] + 2.0 * jax.random.normal(k3, (n_halo, 3))
    field_pos = jax.random.uniform(k1, (n - n_halo, 3), minval=0.0,
                                   maxval=BOX)
    return jnp.concatenate([halo_pos, field_pos]) % BOX


def main():
    cosmo = Cosmology()
    keys = jax.random.split(jax.random.PRNGKey(0), N_SIMS)

    # --- simulation array: P(k) per realization, vmapped ----------------
    with stage("collection P(k)"):
        pos_batch = jnp.stack([synthetic_particles(k, N_PART) for k in keys])

        def pk_one(pos):
            g = paint.paint(pos, NGRID, BOX, window="tsc")
            return power.auto_power(g, BOX, nbins=32, window="tsc",
                                    shotnoise=BOX ** 3 / N_PART)

        res = jax.vmap(pk_one)(pos_batch)
        jax.block_until_ready(res.power)
    log.info("P(k) over %d sims: k[0]=%.3f, P[0,0]=%.1f", N_SIMS,
             float(res.k[0, 0]), float(res.power[0, 0]))

    # --- bispectrum on one realization ----------------------------------
    with stage("bispectrum"):
        g = paint.paint(pos_batch[0], NGRID, BOX, window="cic")
        bs = Bispectrum3D.compute(g, BOX, nbins=4)
    log.info("B(k) triples: %d (max |B| = %.2e)", len(bs["b"]),
             float(np.nanmax(np.abs(bs["b"]))))

    # --- Born convergence map from density planes ------------------------
    with stage("born kappa map"):
        delta = g / jnp.mean(g) - 1.0
        planes = jnp.transpose(delta, (2, 0, 1))[:32]  # slabs along z
        chis = jnp.linspace(100.0, 1500.0, 32)
        dchis = jnp.full((32,), BOX / NGRID)
        kappa = lensing.born_convergence(planes, chis, dchis, 2000.0,
                                         cosmo.Om0)
    log.info("kappa map extrema: %.2e .. %.2e", float(kappa.min()),
             float(kappa.max()))

    # --- void pipeline on the kappa map ----------------------------------
    with stage("tunnels voids"):
        sky = SkyArray.from_array(kappa, opening_angle=5.0,
                                  quantity="kappa_2")
        sky.smoothing(2.0)
        finder = TunnelsFinder(sky)
        finder.find_peaks(on="orig_smooth")
        finder.find_voids(sigmas=[0.0])
        voids = Voids.from_finder(finder, {"npix": sky.npix})
        voids.trim_edges(sky.npix)
        voids.get_profiles(2.0, 10, skymap=sky.data["orig"])
        ds = voids.get_profile_stats(n_boot=30)
    log.info("voids found: %d; mean profile at r/R=0: %.3e",
             len(voids.data["rad_pix"]), float(ds["mean"][0, 0]))

    # --- full-sky CMB stage (native spherical harmonics) ------------------
    with stage("full-sky SHT"):
        from astrild_tpu.ops import sht

        ell = np.arange(65, dtype=float)
        cl_tt = 2e-9 / np.maximum(ell * (ell + 1.0), 1.0)
        cmb = sht.synfast(jax.random.PRNGKey(42), cl_tt, nside=32)
        cl_meas = sht.anafast(cmb, lmax=64)
        smooth = sht.smoothing(cmb, fwhm_rad=0.05, lmax=64)
    log.info("full-sky CMB: npix=%d, Cl(10) in/out %.2e/%.2e, "
             "smoothed std ratio %.3f", cmb.shape[0], cl_tt[10],
             float(cl_meas[10]),
             float(jnp.std(smooth) / jnp.std(cmb)))

    # --- theory anchors: halofit, kappa Cl, f(R) growth, mass functions --
    with stage("theory anchors"):
        from astrild_tpu.ops.angular_power import cl_kappa_limber
        from astrild_tpu.ops.halo_stats import theory_hmf
        from astrild_tpu.ops.linear_power import (linear_power,
                                                  nonlinear_power)

        k = jnp.asarray([0.1, 1.0])
        # all four anchors are jitted in the library (one device program
        # each — on a remote backend the eager path would pay one round
        # trip per op)
        boost = nonlinear_power(k, cosmo) / jnp.asarray(
            linear_power(k, cosmo))
        clk = cl_kappa_limber(jnp.asarray([500.0]), cosmo, z_source=1.0)
        fr = Cosmology(fR0=1e-5).fofr_pk_enhancement(np.asarray(k))
        hmf = theory_hmf(np.asarray([1e13]), cosmo, model="tinker08")
    log.info("halofit boost at k=1: %.2f; C_500^kk = %.2e; "
             "F5 P(k) enhancement at k=1: %.3f; "
             "Tinker08 dn/dlnM(1e13) = %.2e",
             float(boost[1]), float(clk[0]), float(fr[1]),
             float(hmf[0]))

    # --- full-sky lightcone: shells -> Born + post-Born maps -> Cl ----
    with stage("full-sky lightcone"):
        from astrild_tpu.models.skyhealpix import SkyHealpix
        from astrild_tpu.ops import lightcone_sphere as lcs

        key = jax.random.PRNGKey(9)
        pos_lc = np.asarray(synthetic_particles(key, N_PART))
        edges = np.linspace(150.0, 650.0, 6)   # replicated box lightcone
        nside = 32
        delta, chis, dchis = lcs.density_shells_healpix(
            (pos_lc[:, 0], pos_lc[:, 1], pos_lc[:, 2]), edges, nside,
            BOX)
        chi_s = 700.0
        sky = SkyHealpix.from_multiplane_shells(
            np.asarray(delta), np.asarray(chis), np.asarray(dchis),
            chi_s, 0.31, lmax=2 * nside)
        born = lcs.born_convergence_healpix(delta, chis, dchis, chi_s,
                                            0.31)
        ee, bb, _ = sky.shear_eb_spectra(lmax=2 * nside)
    log.info("lightcone: %d shells at nside=%d; kappa rms %.2e "
             "(born %.2e); post-Born omega rms %.2e; "
             "shear B/E = %.1e",
             len(chis), nside, float(np.std(sky.data["orig"])),
             float(jnp.std(born)), float(np.std(sky.data["omega"])),
             float(np.sum(np.asarray(bb)[2:])
                   / max(np.sum(np.asarray(ee)[2:]), 1e-30)))

    print("pipeline complete")


if __name__ == "__main__":
    main()
