"""Example: halos -> HOD galaxies -> redshift-space clustering -> 3D voids.

The workflow the reference outsourced to external tools, end-to-end on
device: its void pipeline only READ per-HOD SVF/ZOBOV catalogs from disk
(rays/void.py:83-127) and its TPCF ran halotools over external galaxy
mocks (particles/hutils/tpcf.py). Natively:

  1. Zel'dovich halo mock with velocities (ops/mocks),
  2. HOD population — Zheng+07 centrals/satellites, NFW radii, virial
     dispersions (ops/hod),
  3. redshift-space s-mu TPCF + multipoles of the galaxies (ops/tpcf),
  4. galaxy density grid -> spherical void finder + ZOBOV-style
     watershed voids (ops/voids3d),
  5. void-centric stacked density + outflow-velocity profiles
     (ops/profiles3d).

  python examples/galaxy_mocks_voids.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from astrild_tpu.ops import hod, mocks, paint, profiles3d, tpcf, voids3d
from astrild_tpu.utils.observability import get_logger, stage

log = get_logger()

BOX = 250.0      # Mpc/h
NGRID_IC = 64    # Zel'dovich lattice -> 262k "halos"
NGRID_V = 64     # void-finding grid


def toy_pk(k):
    return 1.5e5 * k / (1.0 + (k / 0.025) ** 3)


def main():
    key = jax.random.PRNGKey(42)

    with stage("halo mock (Zel'dovich + velocities)"):
        pos, vel = mocks.zeldovich_catalog_with_velocities(
            key, NGRID_IC, BOX, toy_pk, growth_rate=0.53)
        nh = pos.shape[0]
        rng = np.random.default_rng(0)
        m = 10.0 ** rng.uniform(12.2, 14.5, nh)     # toy mass function
        rvir = 0.78 * (m / 1e13) ** (1.0 / 3.0)     # ~ virial scaling
        conc = 9.0 * (m / 1e13) ** (-0.1)
    log.info("halos: %d", nh)

    with stage("HOD population (Zheng+07)"):
        cat = hod.hod_populate(
            jax.random.PRNGKey(7), jnp.asarray(m),
            pos[:, 0], pos[:, 1], pos[:, 2],
            vel[:, 0], vel[:, 1], vel[:, 2],
            jnp.asarray(rvir), jnp.asarray(conc), BOX,
            params=hod.HODParams(log_mmin=12.6, sigma_logm=0.3,
                                 log_m0=12.5, log_m1=13.6, alpha=1.0),
            max_sat=16)
        gal = hod.compact_catalog(cat)
    log.info("galaxies: %d (%.0f%% centrals, overflow=%d)",
             gal["gx"].shape[0],
             100.0 * gal["is_central"].mean(), int(cat["overflow"]))

    with stage("redshift-space TPCF multipoles"):
        gpos = np.stack([gal["gx"], gal["gy"], gal["gz"]], axis=-1)
        gvel = np.stack([gal["gvx"], gal["gvy"], gal["gvz"]], axis=-1)
        # O(N^2) pair counts: subsample the tracer set for the TPCF stage
        # (the void finding below uses every galaxy)
        sub = np.random.default_rng(1).choice(
            gpos.shape[0], min(30000, gpos.shape[0]), replace=False)
        pos_s = tpcf.to_redshift_space(jnp.asarray(gpos[sub]),
                                       jnp.asarray(gvel[sub]), BOX)
        s_edges = jnp.linspace(2.0, 40.0, 16)
        s_mid, _, xi_sm = tpcf.tpcf_s_mu(pos_s, BOX, s_edges, nmu=20)
        xi0 = np.asarray(tpcf.tpcf_multipoles(xi_sm, 0))
        s_mid = np.asarray(s_mid)
    log.info("xi0 at s=%.1f: %.3f ; at s=%.1f: %.3f",
             s_mid[1], xi0[1], s_mid[-1], xi0[-1])

    with stage("galaxy density grid + 3D void finders"):
        delta = paint.paint((jnp.asarray(gal["gx"]), jnp.asarray(gal["gy"]),
                             jnp.asarray(gal["gz"])), NGRID_V, BOX,
                            window="cic")
        delta = delta / jnp.mean(delta) - 1.0
        svf = voids3d.svf_voids(delta, BOX, delta_threshold=-0.6,
                                max_voids=256)
        wvf = voids3d.watershed_voids_3d(delta, BOX, max_voids=256,
                                         core_delta=-0.25)
    log.info("SVF voids: %d (largest R = %.1f Mpc/h); watershed: %d",
             int(svf.n), float(svf.radius[0]), int(wvf.n))

    with stage("void-centric stacked profiles"):
        nv = min(int(svf.n), 64)   # stack the largest voids
        centers = svf.pos[:nv]
        r, rho = profiles3d.radial_density_profiles(
            jnp.asarray(gpos), jnp.ones(gpos.shape[0]), centers,
            2.0, 60.0, nbins=12, boxsize=BOX)
        nbar = gpos.shape[0] / BOX ** 3
        rv, vr, cntv = profiles3d.radial_velocity_profiles(
            jnp.asarray(gpos), jnp.asarray(gvel), centers, 2.0, 60.0,
            nbins=12, boxsize=BOX)
        stacked_vr = profiles3d.stacked_profile(vr, cntv)
    dens = np.asarray(rho).mean(axis=0) / nbar - 1.0
    log.info("stacked void delta(r): inner %.2f -> outer %.2f",
             dens[0], dens[-1])
    log.info("stacked void v_r(r) [km/s]: %s",
             np.round(np.asarray(stacked_vr), 1))
    print("OK")


if __name__ == "__main__":
    main()
