"""Forward model: a linear P(k) becomes a survey, end to end on device.

The capability the reference never had — it post-processed external
ECOSMOG/Ray-Ramses outputs (/root/reference/src/astrild/particles/
ecosmog.py, rays/rayramses.py); here the simulation itself runs
in-framework:

  1. 2LPT initial conditions -> KDK particle-mesh evolution to z=0,
     once in GR and once in Hu-Sawicki f(R) from the SAME realization:
     the fifth-force P(k) enhancement vs the linear-response ODE — the
     ECOSMOG science plot, forward-modeled.
  2. PM lightcone to z_s = 1 -> Born convergence map -> kappa C_ell vs
     the halofit Limber prediction, plus peak counts on the map.

  python examples/forward_model.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from astrild_tpu.ops import nbody
from astrild_tpu.ops.angular_power import cl_flat_sky, cl_kappa_limber
from astrild_tpu.ops.lensing import born_convergence
from astrild_tpu.ops.linear_power import linear_power, normalization
from astrild_tpu.ops.paint import paint
from astrild_tpu.ops.peaks import find_peaks
from astrild_tpu.ops.power import auto_power
from astrild_tpu.utils.cosmology import Cosmology
from astrild_tpu.utils.observability import get_logger, stage

log = get_logger()

BOX = 300.0        # Mpc/h
N_PART = 64        # particles per side (64^3 total)
Z_INIT = 9.0


def main():
    gr = Cosmology(Om0=0.3, h=0.7)
    fr = Cosmology(Om0=0.3, h=0.7, fR0=1e-5)
    amp = float(normalization(gr))

    def pk(k):
        return linear_power(k, gr, 0.0, amplitude=amp)

    key = jax.random.PRNGKey(11)

    # --- GR vs f(R) from the same initial realization -------------------
    with stage("2LPT initial conditions"):
        comps, mom = nbody.lpt_catalog(key, N_PART, BOX, pk, gr, Z_INIT)
    a0 = 1.0 / (1.0 + Z_INIT)
    with stage("PM evolution (GR + f(R))"):
        out_gr, _ = nbody.pm_evolve(comps, mom, gr, N_PART, BOX, a0,
                                    1.0, nsteps=16)
        out_fr, _ = nbody.pm_evolve(comps, mom, fr, N_PART, BOX, a0,
                                    1.0, nsteps=16)
    k, p_gr, _ = auto_power(paint(out_gr, N_PART, BOX, window="cic"),
                            BOX, nbins=12)
    _, p_fr, _ = auto_power(paint(out_fr, N_PART, BOX, window="cic"),
                            BOX, nbins=12)
    k = np.asarray(k)
    ratio = np.asarray(p_fr) / np.asarray(p_gr)
    theory = (np.asarray(fr.fofr_pk_enhancement(k, 0.0))
              / np.asarray(fr.fofr_pk_enhancement(k, Z_INIT)))
    for i in range(2, 12, 3):
        log.info("fifth force at k=%.3f h/Mpc: P_fR/P_GR = %.3f "
                 "(linear ODE %.3f)", k[i], ratio[i], theory[i])

    # --- PM lightcone -> Born kappa -> C_ell + peaks ---------------------
    fov, npix, nplanes = 0.08, 128, 12
    with stage("PM lightcone planes"):
        delta, chis, dchi = nbody.pm_lightcone_planes(
            key, gr, pk, N_PART, 250.0, fov, npix, nplanes,
            z_source=1.0, z_init=Z_INIT, nsteps_init=8,
            steps_per_plane=2, randomize_key=jax.random.PRNGKey(111))
    chi_s = float(gr.comoving_distance(1.0))
    z_pl = np.asarray(gr.redshift_at_comoving_distance(chis))
    kappa = born_convergence(delta, chis, jnp.full(nplanes, dchi),
                             chi_s, gr.Om0,
                             scale_factors=jnp.asarray(1 / (1 + z_pl),
                                                       jnp.float32))
    ell, cl = cl_flat_sky(kappa, np.degrees(fov), nbins=10)
    th = np.asarray(cl_kappa_limber(ell, gr, 1.0, nonlinear=True))
    band = (np.asarray(cl) / th)[1:5].mean()
    cat = find_peaks(kappa, threshold=2.0 * float(kappa.std()))
    log.info("lightcone: kappa rms %.4f; C_ell/halofit band mean %.2f; "
             "%d peaks above 2 sigma, highest kappa %.3f",
             float(kappa.std()), band, int(cat.n),
             float(cat.values[0]))

    print("forward model complete")


if __name__ == "__main__":
    main()
