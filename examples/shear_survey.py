"""Example: the real-space weak-lensing survey loop.

From a theory C_ell to a mock shear field to every survey two-point
observable and its error model — the analysis chain downstream of the
reference's ray-traced maps that its lenstools stack (C_ell only) never
provided:

  1. Limber C_EE -> Gaussian kappa field -> PERIODIC spin-2 shear
  2. map estimator xi_pm(theta) vs the FFTLog theory curve
  3. COSEBIs E/B separation (B consistent with zero)
  4. exact discrete Gaussian covariance (+ shape noise), validated
     against a Monte-Carlo over map realizations
  5. stacked tangential shear around the field's kappa peaks
  6. catalog pair estimators on a sampled galaxy catalog
  7. autodiff Fisher forecast (Om0, sigma8) from [xi_+; xi_-]

  python examples/shear_survey.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from astrild_tpu import Cosmology
from astrild_tpu.models import SkyArray
from astrild_tpu.ops import angular_power, peaks, shear_2pt
from astrild_tpu.ops.forecast import xipm_survey_fisher
from astrild_tpu.utils.observability import get_logger, stage

log = get_logger()
cosmo = Cosmology()

NPIX, OA = 512, 5.0  # 5x5 deg field
ARCMIN = np.pi / 180.0 / 60.0

# ------------------------------------------- 1. theory Cl -> mock shear
with stage("mock shear field"):
    lf = 2.0 * np.pi / np.deg2rad(OA)
    ell_tab = np.concatenate([np.geomspace(2.0, 1.4 * lf * NPIX / 2, 512),
                              [1.42 * lf * NPIX / 2, 1e6]])
    cl_tab = np.array(angular_power.cl_kappa_limber(
        jnp.asarray(ell_tab, jnp.float32), cosmo, z_source=1.0,
        nonlinear=True))
    cl_tab[-2:] = 0.0  # explicit band limit (synthesis clamps the table)
    kappa = angular_power.cl_to_flat_map(
        jax.random.PRNGKey(42), jnp.asarray(ell_tab, jnp.float32),
        jnp.asarray(cl_tab, jnp.float32), NPIX, OA)
    g1, g2 = angular_power.kappa_to_shear_maps(kappa)
    sky = SkyArray.from_array(np.asarray(kappa), OA, "kappa_2")
    sky.data["shearx"], sky.data["sheary"] = g1, g2
    log.info("kappa rms %.4f", float(jnp.std(kappa)))

# --------------------------------------------- 2. xi_pm map estimator
with stage("xi_pm"):
    th, xip, xim, npair = sky.shear_xi_pm(nbins=16, theta_min_arcmin=1.5,
                                          theta_max_arcmin=100.0)
    tt, xp_t, xm_t = shear_2pt.xi_pm_from_cl(ell_tab, cl_tab)
    th_h = np.asarray(th)
    xp_i = np.interp(np.log(th_h * ARCMIN), np.log(np.asarray(tt)),
                     np.asarray(xp_t))
    for i in (2, 6, 10):
        log.info("theta %.1f': xi+ measured %.3e theory %.3e",
                 th_h[i], float(xip[i]), xp_i[i])

# ------------------------------------------------------- 3. COSEBIs
with stage("COSEBIs"):
    E, B = sky.cosebis(5, 3.0, 85.0)
    log.info("E_n = %s", np.array2string(np.asarray(E), precision=3))
    log.info("max |B|/|E| = %.4f (B-mode null)",
             float(np.max(np.abs(np.asarray(B)))
                   / np.max(np.abs(np.asarray(E)))))

# ----------------------------------------------------- 4. covariance
with stage("covariance"):
    nbar = 30.0 / ARCMIN ** 2  # 30 gal/arcmin^2 in steradians
    noise_cl = 0.26 ** 2 / (2.0 * nbar)
    th_c, cov = shear_2pt.xi_pm_gaussian_covariance(
        NPIX, OA, ell_tab, cl_tab, 16, theta_min_arcmin=1.5,
        theta_max_arcmin=100.0, noise_cl=noise_cl)
    sig = np.sqrt(np.diag(cov))
    log.info("S/N of xi+ at %.1f' : %.1f", th_c[4],
             float(xip[4]) / sig[4])
    cov_e, cov_b = shear_2pt.cosebis_covariance(th_c, cov, 5, 3.0, 85.0)
    log.info("E_1 = %.3e +- %.3e; B_1 consistent with 0 within %.3e",
             float(E[0]), np.sqrt(cov_e[0, 0]), np.sqrt(cov_b[0, 0]))

# ------------------------------------- 5. galaxy-galaxy lensing stack
with stage("tangential shear around peaks"):
    cat = peaks.find_peaks(kappa, threshold=2.0 * float(jnp.std(kappa)),
                           max_peaks=64, edge_pix=48)
    nkeep = int(cat.n)
    centers = jnp.asarray(cat.pos[:max(nkeep, 1)], jnp.int32)
    edges = jnp.asarray(np.linspace(2.0, 40.0, 11), jnp.float32)
    r, gt, gx, cnt = shear_2pt.tangential_shear_stack(
        g1, g2, centers, edges, patch_half=48, nbins=10)
    log.info("gamma_t at %.1f px = %.4e (x-null %.1e)", float(r[2]),
             float(gt[2]), float(jnp.max(jnp.abs(gx))))

# --------------------------------------------- 6. catalog estimators
with stage("catalog xi_pm"):
    rng = np.random.default_rng(1)
    idx = rng.integers(0, NPIX, (8192, 2))
    pixscale = OA * 60.0 / NPIX
    xq, yq = (idx[:, 0] * pixscale).astype(np.float32), (
        idx[:, 1] * pixscale).astype(np.float32)
    e1 = np.asarray(g1)[idx[:, 0], idx[:, 1]]
    e2 = np.asarray(g2)[idx[:, 0], idx[:, 1]]
    cedges = np.geomspace(3.0, 60.0, 9)
    cxp, cxm, ccnt = shear_2pt.xi_pm_catalog(xq, yq, e1, e2, cedges,
                                             boxsize=OA * 60.0)
    log.info("catalog xi+ (8k galaxies, %d pairs in range): %s",
             int(np.sum(np.asarray(ccnt))),
             np.array2string(np.asarray(cxp)[:4], precision=3))

# ------------------------------------------------- 7. Fisher forecast
with stage("Fisher"):
    out = xipm_survey_fisher({"Om0": cosmo.Om0, "sigma8": 0.8159},
                             npix=NPIX, opening_angle_deg=OA, nbins=12,
                             theta_min_arcmin=2.0, z_source=1.0,
                             n_fields=40)  # ~1000 deg^2
    log.info("40-field (1000 deg^2) forecast: sigma(Om0)=%.4f "
             "sigma(sigma8)=%.4f", out["marginalized"][0],
             out["marginalized"][1])

# ------------------------------------- 8. joint 3x2pt with HOD + IA
with stage("3x2pt"):
    from astrild_tpu.ops.angular_power import smail_nz
    from astrild_tpu.ops.forecast import threex2pt_fisher

    zt = np.linspace(0.01, 3.0, 120)
    rp = np.array([2.0, 5.0, 10.0, 20.0])
    # wp / Delta Sigma covariances would come from
    # covariance.spatial_jackknife on the survey mocks; use 5%/8%
    # diagonal placeholders here
    cov_wp = np.diag((np.array([40.0, 15.0, 8.0, 4.0]) * 0.05) ** 2)
    cov_ds = np.diag((np.array([2.0, 1.0, 0.5, 0.2]) * 0.08) ** 2)
    j = threex2pt_fisher(
        {"Om0": cosmo.Om0, "sigma8": 0.8159, "log_mmin": 12.5,
         "A_IA": 1.0}, rp, rp, cov_wp, cov_ds, npix=NPIX,
        opening_angle_deg=OA, nz=(zt, np.asarray(smail_nz(zt, z0=0.64))),
        nbins_xi=10, theta_min_arcmin=2.0, n_fields=40,
        hod_fixed={"sigma_logm": 0.3, "log_m0": 12.0, "log_m1": 13.5,
                   "alpha": 1.0})
    log.info("joint wp+DS+xi_pm (IA+HOD marginalized): %s",
             dict(zip(j["names"],
                      np.round(j["marginalized"], 4).tolist())))

log.info("shear survey loop complete")
