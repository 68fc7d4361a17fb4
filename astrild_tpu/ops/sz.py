"""Sunyaev-Zel'dovich observables from halos: NFW optical depth, kSZ
temperature patches, GNFW (Arnaud+10) Compton-y.

The reference's temperature-map pipeline stopped at the moving-lens
(Birkinshaw-Gull) dipole signal (sky_utils.py:176-211); the kSZ
monopole — the observable its pairwise-velocity science ultimately
targets (Yasini+18 context) — and tSZ were absent. Both are closed-form
or one-quadrature patches, built on the same patch-painting machinery
(ops.lensing.add_patch_to_map / paint_halo_patches).

Conventions: masses Msun and lengths Mpc PHYSICAL (divide h-unit
catalog columns by h first — the SkyArray facade passes physical values),
velocities km/s, temperatures Kelvin.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.constants import (C_LIGHT_KMS, M_PROTON_MSUN, SIGMA_T_MPC2,
                               T_CMB)

__all__ = ["nfw_sigma_map", "nfw_tau_map", "ksz_patch", "ksz_patch_from_halo",
           "gnfw_pressure", "compton_y_patch", "GNFW_ARNAUD10",
           "stacked_aperture_photometry", "m500c_from_m200m", "y_ell",
           "cl_yy"]

# Arnaud et al. 2010 (arXiv:0910.1234) universal pressure profile,
# Eq. 12 best-fit parameters (h70 = 1): [P0, c500, gamma, alpha, beta]
GNFW_ARNAUD10 = (8.403, 1.177, 0.3081, 1.0510, 5.4905)

# sigma_T/(m_e c^2) with P_e in keV/cm^3 and path length in Mpc:
# 6.6524587e-25 cm^2 / 511 keV * 3.0857e24 cm/Mpc — ONE home; the
# y_ell <-> compton_y_patch cross-check test relies on bit-identity
_Y_PREFAC = 6.6524587158e-25 / 511.0 * 3.0856775814913673e24


def _nfw_sigma_f(x):
    """Wright & Brainerd 2000 projected-NFW shape: Sigma = 2 rho_s r_s f(x).

    f(x<1) = (1 - 2 artanh(sqrt((1-x)/(1+x)))/sqrt(1-x^2)) / (x^2-1)
    f(1)   = 1/3
    f(x>1) = (1 - 2 arctan(sqrt((x-1)/(x+1)))/sqrt(x^2-1)) / (x^2-1)

    Branches are clipped before evaluation so no NaN leaks through
    jnp.where (same pattern as ops.lensing._nfw_f).
    """
    x = jnp.abs(x)
    xs = jnp.clip(x, 1e-8, None)
    lo = x < 0.999
    hi = x > 1.001
    x_lo = jnp.clip(xs, None, 0.999)
    s_lo = jnp.sqrt((1.0 - x_lo) * (1.0 + x_lo))
    f_lo = (1.0 - 2.0 * jnp.arctanh(
        jnp.sqrt((1.0 - x_lo) / (1.0 + x_lo))) / s_lo) / (x_lo ** 2 - 1.0)
    x_hi = jnp.clip(xs, 1.001, None)
    s_hi = jnp.sqrt((x_hi - 1.0) * (x_hi + 1.0))
    f_hi = (1.0 - 2.0 * jnp.arctan(
        jnp.sqrt((x_hi - 1.0) / (x_hi + 1.0))) / s_hi) / (x_hi ** 2 - 1.0)
    return jnp.where(lo, f_lo, jnp.where(hi, f_hi, 1.0 / 3.0))


@partial(jax.jit, static_argnames=("npix",))
def nfw_sigma_map(m200c, c200c, r200c, npix: int = 128,
                  extent: float = 1.0):
    """Projected NFW surface mass density patch [Msun/Mpc^2].

    The patch spans +-extent*r200c; the central pixel's log divergence is
    clipped to the value one tenth of a pixel off center.

    Args:
      m200c: mass [Msun, physical].
      c200c: concentration; r200c: radius [Mpc, physical].
    Returns Sigma [Msun/Mpc^2] (h-unit inputs give (Msun h)/(Mpc)^2-
    scaled output — convert inputs first).
    """
    r_s = r200c / c200c
    rho_s = m200c * c200c ** 3 / (
        4.0 * jnp.pi * r200c ** 3
        * (jnp.log(1.0 + c200c) - c200c / (1.0 + c200c)))
    edges = jnp.linspace(-extent * r200c, extent * r200c, npix)
    tx, ty = jnp.meshgrid(edges, edges)
    r = jnp.sqrt(tx ** 2 + ty ** 2)
    pix = 2.0 * extent * r200c / npix
    x = jnp.maximum(r, 0.1 * pix) / r_s
    return 2.0 * rho_s * r_s * _nfw_sigma_f(x)


@partial(jax.jit, static_argnames=("npix",))
def nfw_tau_map(m200c, c200c, r200c, npix: int = 128, extent: float = 1.0,
                f_gas: float = 0.156, mu_e: float = 1.14):
    """Thomson optical depth patch tau(theta) of an NFW gas halo.

    tau = sigma_T * f_gas * Sigma / (mu_e m_p): the gas follows the NFW
    mass profile with a cosmic baryon fraction f_gas = Omega_b/Omega_m
    and mu_e m_p mass per electron. Inputs are PHYSICAL (Msun, Mpc) like
    the rest of this module — an h-unit (Msun/h, Mpc/h) pair fed here
    directly would bias tau by h (divide both by h first).
    """
    sigma = nfw_sigma_map(m200c, c200c, r200c, npix=npix, extent=extent)
    # sigma_T and m_p individually underflow float32 (1e-74 / 1e-58 in
    # Mpc^2 / Msun); their ratio (~8.3e-17) is representable — combine in
    # python float64 BEFORE any array math
    sigma_t_over_mp = SIGMA_T_MPC2 / M_PROTON_MSUN
    return (sigma_t_over_mp / mu_e) * f_gas * sigma


def ksz_patch(tau_map, v_los):
    """Kinetic SZ temperature patch [K]: dT = -T_cmb tau v_los/c.

    Positive v_los = receding (away from the observer) gives a CMB
    decrement — the standard kSZ sign (e.g. Hand+12).
    """
    return -T_CMB * tau_map * v_los / C_LIGHT_KMS


@partial(jax.jit, static_argnames=("npix",))
def ksz_patch_from_halo(m200c, c200c, r200c, v_los, npix: int = 128,
                        extent: float = 1.0, f_gas: float = 0.156,
                        mu_e: float = 1.14):
    """kSZ patch directly from halo parameters (tau from nfw_tau_map);
    physical units (Msun, Mpc) as in nfw_tau_map."""
    tau = nfw_tau_map(m200c, c200c, r200c, npix=npix, extent=extent,
                      f_gas=f_gas, mu_e=mu_e)
    return ksz_patch(tau, v_los)


def gnfw_pressure(x, params: Tuple[float, ...] = GNFW_ARNAUD10):
    """Dimensionless GNFW pressure shape P(x), x = r/R500 (Arnaud+10
    Eq. 11)."""
    p0, c500, gamma, alpha, beta = params
    cx = jnp.maximum(c500 * x, 1e-8)
    return p0 / (cx ** gamma * (1.0 + cx ** alpha) ** ((beta - gamma)
                                                       / alpha))


@partial(jax.jit, static_argnames=("npix", "n_los"))
def compton_y_patch(m500, r500, e_z, npix: int = 128, extent: float = 2.0,
                    n_los: int = 128, los_extent: float = 5.0,
                    h70: float = 0.968,
                    params: Tuple[float, ...] = GNFW_ARNAUD10):
    """Thermal SZ Compton-y patch from the Arnaud+10 universal profile.

    P_e(r) = 1.65e-3 E(z)^(8/3) [M500/(3e14/h70 Msun)]^(2/3) P(x) h70^2
             keV cm^-3                                  (Arnaud+10 Eq. 13)
    y(R)   = sigma_T/(m_e c^2) * integral P_e dl  (trapezoid over
             +-los_extent*R500, n_los points; the profile core is
             resolved because x = sqrt(R^2+l^2)/R500 >= R/R500 > 0).

    Args:
      m500: mass [Msun] (PHYSICAL, no h — divide an Msun/h mass by h).
      r500: radius [Mpc] (physical).
      e_z: E(z) = H(z)/H0.
      extent: patch half-width in units of R500.
    Returns (npix, npix) dimensionless y.
    """
    prefac = _Y_PREFAC
    p500_amp = (1.65e-3 * e_z ** (8.0 / 3.0)
                * (m500 / (3.0e14 / h70)) ** (2.0 / 3.0) * h70 ** 2)
    edges = jnp.linspace(-extent * r500, extent * r500, npix)
    tx, ty = jnp.meshgrid(edges, edges)
    rperp = jnp.sqrt(tx ** 2 + ty ** 2)
    l = jnp.linspace(-los_extent * r500, los_extent * r500, n_los)
    dl = l[1] - l[0]

    def body(carry, li):
        r3d = jnp.sqrt(rperp ** 2 + li ** 2)
        return carry + gnfw_pressure(r3d / r500, params), None

    acc, _ = jax.lax.scan(body, jnp.zeros((npix, npix)), l)
    # trapezoid correction: endpoints at +-5 R500 contribute ~0; the
    # plain Riemann sum differs from trapezoid by half an endpoint
    return prefac * p500_amp * acc * dl


def stacked_aperture_photometry(img, centers_pix, opening_angle_deg,
                                alpha_arcmin, patch_half: int,
                                weights=None):
    """Stacked disk-minus-ring aperture photometry at object positions —
    the measurement side of the kSZ/tSZ pipeline (Hand+12 Sec. 2;
    Schaan+16): for each object, AP = mean(disk r <= alpha) -
    mean(ring alpha < r <= sqrt(2) alpha), which nulls any constant
    background (primary CMB on scales >> alpha).

    Args:
      img: (n, n) temperature / y map.
      centers_pix: (nobj, 2) integer pixel centers (row, col). Patches
        are clamped at map borders (objects within patch_half of an edge
        measure a shifted aperture — trim the catalog if that matters).
      opening_angle_deg: map field of view [deg].
      alpha_arcmin: aperture radius [arcmin].
      patch_half: half-size of the cutout in pixels (must exceed
        sqrt(2) alpha in pixels).
      weights: optional per-object stack weights (e.g. 1/sigma^2).

    Returns (ap_values (nobj,), stacked scalar).
    """
    from .map_transform import object_cutouts

    n = img.shape[-1]
    pix_per_deg = n / opening_angle_deg
    alpha_pix = alpha_arcmin / 60.0 * pix_per_deg
    p = 2 * patch_half + 1
    e = jnp.arange(p, dtype=jnp.float32) - patch_half
    dist = jnp.sqrt(e[:, None] ** 2 + e[None, :] ** 2)
    disk = dist <= alpha_pix
    ring = (dist > alpha_pix) & (dist <= alpha_pix * jnp.sqrt(2.0))
    patches = object_cutouts(img, jnp.asarray(centers_pix, jnp.int32),
                             patch_half)

    def one(patch):
        dmean = jnp.sum(jnp.where(disk, patch, 0.0)) / jnp.maximum(
            jnp.sum(disk), 1)
        rmean = jnp.sum(jnp.where(ring, patch, 0.0)) / jnp.maximum(
            jnp.sum(ring), 1)
        return dmean - rmean

    ap = jax.vmap(one)(patches)
    if weights is None:
        stack = jnp.mean(ap)
    else:
        w = jnp.asarray(weights, jnp.float32)
        stack = jnp.sum(ap * w) / jnp.maximum(jnp.sum(w), 1e-30)
    return ap, stack


# -------------------------------------------------------- tSZ angular power
def m500c_from_m200m(m200m, z, cosmo, conc=None, n_iter: int = 60):
    """NFW rescaling M200m -> (M500c, r500c_physical).

    m200m in Msun/h (the theory_hmf convention, 200 x mean COMOVING
    density); returns m500c [Msun/h] and the PHYSICAL r500c [Mpc/h].
    Solves mu(r/rs)/mu(c) M200m = (4/3) pi 500 rho_crit(z) r^3 by
    bisection (mu(x) = ln(1+x) - x/(1+x)).
    """
    from ..utils.constants import RHO_CRIT0
    from .halo_model import duffy_concentration
    from .hod import _nfw_mu as mu  # single home for the NFW mass shape

    m200m = jnp.asarray(m200m, jnp.float32)
    c = duffy_concentration(m200m, z=z) if conc is None else conc
    rho_m0 = cosmo.Om0 * RHO_CRIT0
    r200m_phys = ((3.0 * m200m / (4.0 * jnp.pi * 200.0 * rho_m0))
                  ** (1.0 / 3.0)) / (1.0 + z)
    rs = r200m_phys / c
    rho_c = cosmo.rho_crit(z)

    def excess(r):
        # M(<r) - (4/3) pi 500 rho_c r^3 : positive while NFW wins
        return (m200m * mu(r / rs) / mu(c)
                - 4.0 / 3.0 * jnp.pi * 500.0 * rho_c * r ** 3)

    lo = 0.01 * r200m_phys
    hi = 3.0 * r200m_phys

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        pos = excess(mid) > 0
        return jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    r500 = 0.5 * (lo + hi)
    m500 = m200m * mu(r500 / rs) / mu(c)
    return m500, r500


def y_ell(ells, m500_phys, r500_phys_mpc, e_z, d_a_mpc,
          params: Tuple[float, ...] = GNFW_ARNAUD10, h70: float = 0.968,
          x_max: float = 5.0, n_x: int = 256):
    """2D Fourier (Limber) profile y_ell of one cluster (Komatsu-Seljak
    2002 Eq. 2 form, scaled by R500):

        y_ell = (sigma_T/m_e c^2) P500 (4 pi r500 / l500^2)
                Int dx x^2 P(x) sinc(ell x / l500),   l500 = d_A/r500.

    m500_phys [Msun], r500/d_A [Mpc] PHYSICAL (no h).
    """
    prefac = _Y_PREFAC
    m500_phys = jnp.atleast_1d(jnp.asarray(m500_phys, jnp.float32))
    r500 = jnp.atleast_1d(jnp.asarray(r500_phys_mpc, jnp.float32))
    scalar_halo = m500_phys.shape[0] == 1
    p500_amp = (1.65e-3 * e_z ** (8.0 / 3.0)
                * (m500_phys / (3.0e14 / h70)) ** (2.0 / 3.0) * h70 ** 2)
    l500 = d_a_mpc / r500                                # (nm,)
    x = jnp.linspace(1e-3, x_max, n_x)
    px = gnfw_pressure(x, params)
    ells = jnp.asarray(ells, jnp.float32)
    arg = ((ells[:, None, None] + 0.5) * x[None, None, :]
           / l500[None, :, None])                        # (nl, nm, nx)
    sinc = jnp.where(arg < 1e-4, 1.0 - arg ** 2 / 6.0,
                     jnp.sin(arg) / jnp.maximum(arg, 1e-12))
    integ = jnp.trapezoid(
        x[None, None, :] ** 2 * px[None, None, :] * sinc, x, axis=-1)
    out = (prefac * p500_amp[None, :]
           * (4.0 * jnp.pi * r500 / l500 ** 2)[None, :] * integ)
    return out[:, 0] if scalar_halo else out


def cl_yy(ells, cosmo, z_min: float = 0.01, z_max: float = 3.0,
          nz: int = 24, mmin: float = 1e13, mmax: float = 5e15,
          nm: int = 40, model: str = "st", h70=None,
          params: Tuple[float, ...] = GNFW_ARNAUD10):
    """Halo-model (1-halo) tSZ angular power spectrum Cl_yy.

        Cl = Int dz dV/dz/dOmega Int dlnM n(M, z) |y_ell(M, z)|^2

    with the Arnaud+10 pressure profile, theory_hmf mass function
    (M200m), and the NFW M200m -> M500c rescaling above. The 2-halo term
    (correlated clusters) is sub-dominant except at ell <~ 100 and is
    omitted. Returns (nell,) Cl in y^2 units.
    """
    from ..utils.constants import C_LIGHT_KMS
    from .halo_stats import theory_hmf

    if h70 is None:
        h70 = cosmo.h / 0.7
    ells = jnp.asarray(ells, jnp.float32)
    z_grid = jnp.linspace(z_min, z_max, nz)
    lnm = jnp.linspace(jnp.log(mmin), jnp.log(mmax), nm)
    m = jnp.exp(lnm)
    dlnm = lnm[1] - lnm[0]
    dz = z_grid[1] - z_grid[0]

    def per_z(z):
        chi = cosmo.comoving_distance(z)           # Mpc/h comoving
        d_a = chi / (1.0 + z) / cosmo.h            # Mpc physical
        dvol = (C_LIGHT_KMS / (100.0 * cosmo.efunc(z))) * chi ** 2
        n_lnm = theory_hmf(m, cosmo, z=z,
                           model=model)            # (nm,) h^3/Mpc^3
        m500, r500 = m500c_from_m200m(m, z, cosmo)
        yl = y_ell(ells, m500 / cosmo.h, r500 / cosmo.h,
                   cosmo.efunc(z), d_a, params=params, h70=h70)  # (nl, nm)
        return dvol * jnp.sum(n_lnm[None, :] * yl ** 2, axis=1) * dlnm

    cls = jax.vmap(per_z)(z_grid)                  # (nz, nell)
    return jnp.sum(cls, axis=0) * dz
