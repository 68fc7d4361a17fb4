"""Halo-model nonlinear matter power: P(k) = P_1h + P_2h.

Beyond the reference (which had no nonlinear theory at all; we already
add halofit in ops/linear_power.py): the analytic halo model composes the
pieces the framework measures from simulations — mass function
(ops/halo_stats.theory_hmf), NFW profiles (ops/profiles3d), c(M)
(Duffy et al. 2008) — into a second, physically transparent nonlinear
P(k) prediction:

  P_1h(k) = Int dlnM  n(lnM) (M/rho_m)^2 |u(k|M)|^2
  P_2h(k) = [Int dlnM n(lnM) (M/rho_m) b(M) u(k|M) + A]^2 P_lin(k)

with n = dn/dlnM, Sheth-Tormen halo bias b(nu), u(k|M) the normalized
NFW Fourier profile, and A the standard large-scale consistency
correction (A = 1 - Int n b M/rho_m dlnM: unresolved low-mass halos are
point sources, so Int n b (M/rho_m) u -> 1 as k -> 0 and P_2h -> P_lin).

All integrals are fixed log-grid quadratures (static shapes, MXU-sized
batches); u(k|M) is evaluated by a vectorized log-radius quadrature
rather than Si/Ci special functions, which keeps it jit-able and exact
to ~1e-4 with 256 nodes.

Halo definition: Delta = 200 x mean matter density (comoving), matching
theory_hmf's R(M) convention and the Duffy08 M200m concentration fit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import RHO_CRIT0
from ..utils.cosmology import Cosmology
from .halo_stats import DELTA_C  # same threshold as the mass function

__all__ = ["nfw_u", "sheth_tormen_bias", "duffy_concentration",
           "halo_model_power", "hod_galaxy_power",
           "hod_galaxy_matter_power", "delta_sigma_hod", "nfw_delta_sigma"]


def duffy_concentration(m200m, z: float = 0.0):
    """Duffy et al. 2008 (arxiv:0804.2486, Table 1, full sample, 200-mean):
    c = 10.14 (M / 2e12 Msun/h)^-0.081 (1+z)^-1.01."""
    return 10.14 * (m200m / 2.0e12) ** -0.081 * (1.0 + z) ** -1.01


def sheth_tormen_bias(nu, a: float = 0.707, p: float = 0.3):
    """Sheth-Tormen 1999 peak-background-split bias b(nu), nu = delta_c/sigma."""
    anu2 = a * nu ** 2
    return (1.0 + (anu2 - 1.0) / DELTA_C
            + 2.0 * p / (DELTA_C * (1.0 + anu2 ** p)))


@partial(jax.jit, static_argnames=("nr",))
def nfw_u(k, c, r_vir, nr: int = 256):
    """Normalized NFW Fourier profile u(k|M) (-> 1 as k -> 0).

    u(k) = Int_0^c dx x/(1+x)^2 sinc(k r_s x) / [ln(1+c) - c/(1+c)],
    by log-x quadrature (x = r/r_s).

    Args:
      k: (nk,) wavenumbers [h/Mpc].
      c, r_vir: (nm,) concentrations and halo radii [Mpc/h].
    Returns (nm, nk).
    """
    c = jnp.asarray(c)[:, None, None]          # (nm, 1, 1)
    rs = (jnp.asarray(r_vir) / jnp.asarray(c).ravel())[:, None, None]
    edges = jnp.linspace(jnp.log(1e-4), 0.0, nr + 1)  # x/c in e^lx
    dlx = edges[1] - edges[0]
    lx = 0.5 * (edges[:-1] + edges[1:])  # midpoint rule: 2nd-order
    x = jnp.exp(lx)[None, None, :] * c         # (nm, 1, nr)
    kk = jnp.asarray(k)[None, :, None]         # (1, nk, 1)
    arg = kk * rs * x
    sinc = jnp.where(arg < 1e-4, 1.0 - arg ** 2 / 6.0,
                     jnp.sin(arg) / jnp.maximum(arg, 1e-12))
    profile = x ** 2 / (1.0 + x) ** 2  # (dx x/(1+x)^2) in dlnx
    integral = jnp.sum(profile * sinc, axis=-1) * dlx
    # normalize by the SAME quadrature of the profile (not the analytic
    # ln(1+c) - c/(1+c)): quadrature bias cancels and u(k->0) == 1 exactly
    mass_norm = jnp.sum(profile, axis=-1) * dlx
    return integral / mass_norm


def _halo_ingredients(k, cosmo: Cosmology, z: float, mmin: float,
                      mmax: float, nm: int, model: str, amplitude):
    """THE shared halo-model ingredient set: mass grid, dn/dlnM,
    Sheth-Tormen bias, and NFW u(k|M) — single home so P_mm, P_gg and
    P_gm stay on the same mass function / bias / concentration
    conventions (a drift breaks the bias-factorization identity the
    tests pin). All on the SAME amplitude, or the a_corr consistency
    relation silently breaks. Returns (m, dlnm, n_lnm, bias, u, rho_m).
    """
    from .halo_stats import theory_hmf
    from .linear_power import sigma_r

    rho_m = cosmo.Om0 * RHO_CRIT0  # comoving (Msun/h)/(Mpc/h)^3
    lnm = jnp.linspace(jnp.log(mmin), jnp.log(mmax), nm)
    m = jnp.exp(lnm)
    dlnm = lnm[1] - lnm[0]
    n_lnm = theory_hmf(m, cosmo, z=z, model=model,
                       amplitude=amplitude)  # dn/dlnM
    r_lag = (3.0 * m / (4.0 * jnp.pi * rho_m)) ** (1.0 / 3.0)
    growth = cosmo.growth_factor(z)
    sig = jax.vmap(lambda r: sigma_r(r, cosmo, amplitude=amplitude))(
        r_lag) * growth
    bias = sheth_tormen_bias(DELTA_C / sig)
    r_vir = (3.0 * m / (4.0 * jnp.pi * 200.0 * rho_m)) ** (1.0 / 3.0)
    conc = duffy_concentration(m, z=z)
    u = nfw_u(k, conc, r_vir)  # (nm, nk)
    return m, dlnm, n_lnm, bias, u, rho_m


def halo_model_power(k_hmpc, cosmo: Cosmology, z: float = 0.0,
                     mmin: float = 1e8, mmax: float = 1e16, nm: int = 64,
                     model: str = "st", amplitude=None):
    """Halo-model P(k) [(Mpc/h)^3]; returns (p_1h, p_2h, p_total).

    model: multiplicity function for the mass integrals ('st'|'tinker08'|
    'ps', see halo_stats.theory_hmf). Bias is Sheth-Tormen (consistency
    correction A absorbs the mismatch at large scales).
    """
    from .linear_power import linear_power, normalization

    k = jnp.asarray(k_hmpc)
    if amplitude is None:
        amplitude = normalization(cosmo)
    m, dlnm, n_lnm, bias, u, rho_m = _halo_ingredients(
        k, cosmo, z, mmin, mmax, nm, model, amplitude)

    w = n_lnm * m / rho_m * dlnm  # mass-fraction weights per lnM node
    p_1h = jnp.sum((w * m / rho_m)[:, None] * u ** 2, axis=0)
    i_2h = jnp.sum((w * bias)[:, None] * u, axis=0)
    a_corr = 1.0 - jnp.sum(w * bias)  # unresolved halos, u -> 1
    p_lin = linear_power(k, cosmo, z=z, amplitude=amplitude)
    p_2h = (i_2h + a_corr) ** 2 * p_lin
    return p_1h, p_2h, p_1h + p_2h


def hod_galaxy_power(k_hmpc, cosmo: Cosmology, hod_params=None,
                     z: float = 0.0, mmin: float = 1e10,
                     mmax: float = 1e16, nm: int = 64, model: str = "st",
                     amplitude=None):
    """Halo-model GALAXY power spectrum for a Zheng+07 HOD.

    The theory counterpart of ops.hod.hod_populate — the same HODParams
    predict the mock's clustering:

      n_g      = Int dlnM n (N_cen + N_sat)
      P_1h(k)  = (1/n_g^2) Int dlnM n [2 N_cen N_sat u + N_sat^2 u^2]
      P_2h(k)  = b_eff(k)^2 P_lin,
      b_eff(k) = (1/n_g) Int dlnM n b(M) (N_cen + N_sat u(k|M))

    (Poisson satellites; centrals at the halo center so u_cen = 1.)

    Returns (p_1h, p_2h, p_total, n_g, b_g) with b_g the k->0 effective
    bias.
    """
    from .hod import HODParams, zheng07_mean_occupation
    from .linear_power import linear_power, normalization

    if hod_params is None:
        hod_params = HODParams()
    k = jnp.asarray(k_hmpc)
    if amplitude is None:
        amplitude = normalization(cosmo)
    m, dlnm, n_lnm, bias, u, rho_m = _halo_ingredients(
        k, cosmo, z, mmin, mmax, nm, model, amplitude)

    n_cen, n_sat = zheng07_mean_occupation(m, hod_params)
    w = n_lnm * dlnm
    n_g = jnp.sum(w * (n_cen + n_sat))
    p_1h = jnp.sum(w[:, None] * (2.0 * (n_cen * n_sat)[:, None] * u
                                 + (n_sat ** 2)[:, None] * u ** 2),
                   axis=0) / n_g ** 2
    b_eff = jnp.sum((w * bias)[:, None]
                    * (n_cen[:, None] + n_sat[:, None] * u),
                    axis=0) / n_g
    p_lin = linear_power(k, cosmo, z=z, amplitude=amplitude)
    p_2h = b_eff ** 2 * p_lin
    b_g = jnp.sum(w * bias * (n_cen + n_sat)) / n_g
    return p_1h, p_2h, p_1h + p_2h, n_g, b_g


def hod_galaxy_matter_power(k_hmpc, cosmo: Cosmology, hod_params=None,
                            z: float = 0.0, mmin: float = 1e10,
                            mmax: float = 1e16, nm: int = 64,
                            model: str = "st", amplitude=None):
    """Halo-model GALAXY-MATTER cross power P_gm(k) for a Zheng+07 HOD —
    the 3D ingredient of galaxy-galaxy lensing
    (shear_2pt.delta_sigma_from_pk turns it into Delta Sigma(r_p)):

      P_1h(k) = (1/(n_g rho_m)) Int dlnM n M [N_cen u + N_sat u^2]
      P_2h(k) = b_g(k) [i_2h(k) + a_corr] P_lin,

    with b_g(k) the occupation-weighted galaxy bias of hod_galaxy_power
    and (i_2h + a_corr) the mass-consistency-corrected matter factor of
    halo_model_power (unresolved halos at u -> 1), so the 2-halo term's
    k -> 0 limit is exactly b_g P_lin (the total also carries the
    standard constant 1-halo floor). Returns
    (p_1h, p_2h, p_total, n_g, b_g).
    """
    from .hod import HODParams, zheng07_mean_occupation
    from .linear_power import linear_power, normalization

    if hod_params is None:
        hod_params = HODParams()
    k = jnp.asarray(k_hmpc)
    if amplitude is None:
        amplitude = normalization(cosmo)
    m, dlnm, n_lnm, bias, u, rho_m = _halo_ingredients(
        k, cosmo, z, mmin, mmax, nm, model, amplitude)

    n_cen, n_sat = zheng07_mean_occupation(m, hod_params)
    wg = n_lnm * dlnm
    n_g = jnp.sum(wg * (n_cen + n_sat))
    wm = n_lnm * m / rho_m * dlnm  # matter mass-fraction weights
    p_1h = jnp.sum(wm[:, None] * (n_cen[:, None] * u
                                  + n_sat[:, None] * u ** 2),
                   axis=0) / n_g
    b_gal = jnp.sum((wg * bias)[:, None]
                    * (n_cen[:, None] + n_sat[:, None] * u),
                    axis=0) / n_g
    i_2h = jnp.sum((wm * bias)[:, None] * u, axis=0)
    a_corr = 1.0 - jnp.sum(wm * bias)
    p_lin = linear_power(k, cosmo, z=z, amplitude=amplitude)
    p_2h = b_gal * (i_2h + a_corr) * p_lin
    b_g = jnp.sum(wg * bias * (n_cen + n_sat)) / n_g
    return p_1h, p_2h, p_1h + p_2h, n_g, b_g


def delta_sigma_hod(rp, cosmo: Cosmology, hod_params=None, z: float = 0.0,
                    nk: int = 512, kmin: float = 1e-3, kmax: float = 1e3,
                    **hm_kwargs):
    """Theory galaxy-galaxy-lensing excess surface density for an HOD:
    halo-model P_gm -> J2 FFTLog (shear_2pt.delta_sigma_from_pk).
    Differentiable in the HOD parameters (Fisher/fitting). Returns
    Delta Sigma(rp) in h Msun/pc^2 (comoving)."""
    from .shear_2pt import delta_sigma_from_pk

    k = np.geomspace(kmin, kmax, nk)
    _, _, p_gm, _, _ = hod_galaxy_matter_power(
        jnp.asarray(k, jnp.float32), cosmo, hod_params, z=z, **hm_kwargs)
    return delta_sigma_from_pk(k, p_gm, rp, cosmo.Om0)


def nfw_delta_sigma(r_hmpc, m200m, c, z: float = 0.0,
                    omega_m: float = 0.3089):
    """Closed-form NFW excess surface density Delta Sigma(R) (Wright &
    Brainerd 2000, ApJ 534, 34, eqs. 13-16) — the standard model for
    stacked cluster/galaxy lensing profiles, the analytic counterpart of
    the halo-model 1h term of delta_sigma_hod.

    Mass convention matches the rest of this module: m200m is
    M_200 w.r.t. 200x the COMOVING mean matter density, c = r200/r_s.
    Untruncated NFW (the WB00 projection integrates to infinity).

    Args:
      r_hmpc: (n,) projected radii [Mpc/h, comoving].
      m200m: halo mass [Msun/h] (scalar or broadcastable).
      c: concentration.
      z: redshift (enters only through the comoving mean density —
        none, in comoving units; kept for API symmetry).
      omega_m: matter density parameter.
    Returns:
      Delta Sigma(R) in h Msun / pc^2 (comoving).
    """
    r = jnp.asarray(r_hmpc, jnp.float32)
    rho_m = omega_m * RHO_CRIT0  # (Msun/h)/(Mpc/h)^3 comoving
    m200m = jnp.asarray(m200m, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    r200 = (3.0 * m200m / (4.0 * jnp.pi * 200.0 * rho_m)) ** (1.0 / 3.0)
    r_s = r200 / c
    delta_c = (200.0 / 3.0) * c ** 3 / (jnp.log1p(c) - c / (1.0 + c))
    x = r / r_s
    # branch-safe arguments: the closed forms suffer f32 catastrophic
    # cancellation within ~1% of x = 1 (measured up to 44% error at
    # x = 1.0002 with a narrow window), so a local polynomial
    # (host-f64 fit, see _WB_NEAR1) serves |x-1| < 0.02
    xlt = jnp.clip(x, 1e-6, 1.0 - 1e-2)
    xgt = jnp.maximum(x, 1.0 + 1e-2)
    ath = jnp.arctanh(jnp.sqrt((1.0 - xlt) / (1.0 + xlt)))
    atn = jnp.arctan(jnp.sqrt((xgt - 1.0) / (1.0 + xgt)))
    s_lt = jnp.sqrt(1.0 - xlt ** 2)
    s_gt = jnp.sqrt(xgt ** 2 - 1.0)
    g_lt = (8.0 * ath / (xlt ** 2 * s_lt)
            + 4.0 / xlt ** 2 * jnp.log(xlt / 2.0)
            - 2.0 / (xlt ** 2 - 1.0)
            + 4.0 * ath / ((xlt ** 2 - 1.0) * s_lt))
    g_gt = (8.0 * atn / (xgt ** 2 * s_gt)
            + 4.0 / xgt ** 2 * jnp.log(xgt / 2.0)
            - 2.0 / (xgt ** 2 - 1.0)
            + 4.0 * atn / (xgt ** 2 - 1.0) ** 1.5)
    t = jnp.clip(x - 1.0, -0.02, 0.02)
    g_near = jnp.polyval(jnp.asarray(_WB_NEAR1, jnp.float32), t)
    g = jnp.where(x < 1.0 - 0.02, g_lt,
                  jnp.where(x > 1.0 + 0.02, g_gt, g_near))
    sigma_fac = r_s * delta_c * rho_m * 1e-12  # -> h Msun / pc^2
    return sigma_fac * g


def _wb_near1_coeffs(deg: int = 6, half: float = 0.06):
    """Host-f64 polynomial fit of the WB00 g(x) around x = 1 (the f32
    closed forms cancel catastrophically there). Fit nodes exclude the
    f64-noisy core |x-1| < 1e-5; interpolation error over |x-1| <= 0.02
    is < 1e-9 (checked in tests against the f64 closed form)."""
    t = np.concatenate([np.linspace(-half, -1e-5, 400),
                        np.linspace(1e-5, half, 400)])
    xx = 1.0 + t
    lt = xx < 1.0
    g = np.empty_like(xx)
    xl = xx[lt]
    athl = np.arctanh(np.sqrt((1 - xl) / (1 + xl)))
    sl = np.sqrt(1 - xl ** 2)
    g[lt] = (8 * athl / (xl ** 2 * sl) + 4 / xl ** 2 * np.log(xl / 2)
             - 2 / (xl ** 2 - 1) + 4 * athl / ((xl ** 2 - 1) * sl))
    xg = xx[~lt]
    atng = np.arctan(np.sqrt((xg - 1) / (1 + xg)))
    sg = np.sqrt(xg ** 2 - 1)
    g[~lt] = (8 * atng / (xg ** 2 * sg) + 4 / xg ** 2 * np.log(xg / 2)
              - 2 / (xg ** 2 - 1) + 4 * atng / (xg ** 2 - 1) ** 1.5)
    return np.polyfit(t, g, deg)


_WB_NEAR1 = _wb_near1_coeffs()
