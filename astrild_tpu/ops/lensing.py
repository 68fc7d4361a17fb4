"""Weak-lensing map operations: kappa<->alpha<->gamma, NFW analytic maps,
Born integration over lens planes.

TPU-native replacement for:
  * the reference's C/FFTW lensing library (kappa0_to_alphas / kappa0_to_phi,
    /root/reference/src/astrild/rays/skys/lib_so_cgls/lensing_funcs.c:86-173)
    -> spectral FFT versions with zero padding;
  * SkyNumbaUtils.convert_convergence_to_deflection_numba
    (/root/reference/src/astrild/rays/skys/sky_utils.py:23-75);
  * SkyUtils.NFW_deflection_angle_map / NFW_temperature_perturbation_map
    (sky_utils.py:176-282, Baxter et al. 2015 Eqs. 6-8; Yasini et al. 2018)
    -> vmap-able closed forms in complex arithmetic;
  * the halo-catalog patch painting loop (sky_utils.py:79-173) -> batched
    scatter-add;
  * Ray-Ramses map summation along the lightcone (simcoll.py:238-341) and a
    full Born integrator (scan over lens planes).

Units: angles in radians unless suffixed _deg; masses Msun; distances Mpc
(physical, not h-units, matching the reference's use of G/c^2 in Mpc/Msun).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils.constants import C_LIGHT_KMS

__all__ = [
    "kappa_to_alpha", "kappa_to_phi", "alpha_to_gamma", "kappa_to_gamma",
    "nfw_deflection_angle_map", "nfw_temperature_perturbation_map",
    "nfw_dipole_patch",
    "add_patch_to_map", "paint_halo_patches", "born_convergence",
    "code_to_phy_units_factor",
]

# G/c^2 in Mpc/Msun (same constant the reference bakes in, sky_utils.py:18)
G_OVER_C2 = 4.785e-20


# --------------------------------------------------------------- kappa->alpha
def _pad_size(n: int, padding_factor: int) -> int:
    """Round n*padding_factor up to a power of two (FFT-friendly)."""
    target = n * padding_factor
    p = 1
    while p < target:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("padding_factor",))
def kappa_to_alpha(kappa, opening_angle, padding_factor: int = 4):
    """Deflection-angle maps (alpha1, alpha2) from a convergence map.

    Spectral solution of alpha = grad psi, lap psi = 2 kappa on the flat
    sky with zero-padding (mirrors the reference numba implementation,
    sky_utils.py:23-75, and the C library's padded FFT convolution).

    Args:
      kappa: (npix, npix) convergence.
      opening_angle: field-of-view edge length (any angle unit; alpha is
        returned in the same unit).
      padding_factor: zero-pad factor before FFT (>=2 avoids periodic wrap).

    Returns:
      (alpha1, alpha2): deflection along axis-0 and axis-1 of the map.
    """
    n = kappa.shape[-1]
    npad = _pad_size(n, padding_factor)
    L = opening_angle
    lpad = L * npad / n
    kf = 2.0 * jnp.pi / lpad
    kx = (jnp.fft.fftfreq(npad) * npad * kf)
    kzr = (jnp.fft.rfftfreq(npad) * npad * kf)
    k1 = kx[:, None]
    k2 = kzr[None, :]
    k2mag = k1 ** 2 + k2 ** 2
    k2safe = jnp.where(k2mag == 0.0, 1.0, k2mag)
    # rfft2 (half spectrum): real input, ~2x cheaper than full fft2
    kap_ft = jnp.fft.rfft2(kappa, s=(npad, npad))
    fac1 = jnp.where(k2mag == 0.0, 0.0, 2.0 * k1 / k2safe)
    fac2 = jnp.where(k2mag == 0.0, 0.0, 2.0 * k2 / k2safe)
    # an odd transfer function must vanish on its own Nyquist plane
    # (j = n/2 is its own negative); leaving it breaks Hermitian symmetry
    # and silently halves the on-axis response
    ny = npad // 2
    fac1 = fac1.at[ny, :].set(0.0)
    fac2 = fac2.at[:, -1].set(0.0)  # rfft last column IS the Nyquist
    a1 = jnp.fft.irfft2(1j * fac1 * kap_ft, s=(npad, npad))[:n, :n]
    a2 = jnp.fft.irfft2(1j * fac2 * kap_ft, s=(npad, npad))[:n, :n]
    # sign convention matches the reference's trailing `return -alpha`
    return -a1, -a2


@partial(jax.jit, static_argnames=("padding_factor",))
def kappa_to_gamma(kappa, opening_angle, padding_factor: int = 2):
    """Shear (gamma1, gamma2) directly from kappa: one padded spectral
    spin-2 rotation, gamma_k = ((k1^2-k2^2) + 2i k1 k2)/k^2 kappa_k.

    Exact (to FFT precision) where the alpha->gradient chain
    (kappa_to_alpha + alpha_to_gamma) applies second-order finite
    differences; same zero-padding so non-periodic maps don't wrap.
    Skipping the alpha intermediate makes this the cheap path when only
    shear is needed (the deflection maps cost two more inverse FFTs;
    measured on the v5e at 2048^2/pad 2: alpha_to_gamma's jnp.gradient
    chain alone was 59 ms — more than the 4096^2 transforms).
    """
    n = kappa.shape[-1]
    npad = _pad_size(n, padding_factor)
    lpad = opening_angle * npad / n
    kf = 2.0 * jnp.pi / lpad
    kx = jnp.fft.fftfreq(npad) * npad * kf
    kzr = jnp.fft.rfftfreq(npad) * npad * kf
    k1 = kx[:, None]
    k2 = kzr[None, :]
    k2mag = k1 ** 2 + k2 ** 2
    k2safe = jnp.where(k2mag == 0.0, 1.0, k2mag)
    kap_ft = jnp.fft.rfft2(kappa, s=(npad, npad))
    t1 = jnp.where(k2mag == 0.0, 0.0, (k1 ** 2 - k2 ** 2) / k2safe)
    t2 = jnp.where(k2mag == 0.0, 0.0, 2.0 * k1 * k2 / k2safe)
    # the cross term k1*k2 is odd in BOTH axes: it must vanish on each
    # Nyquist plane (same Hermitian-symmetry rule as kappa_to_alpha)
    ny = npad // 2
    t2 = t2.at[ny, :].set(0.0).at[:, -1].set(0.0)
    g1 = jnp.fft.irfft2(t1 * kap_ft, s=(npad, npad))[:n, :n]
    g2 = jnp.fft.irfft2(t2 * kap_ft, s=(npad, npad))[:n, :n]
    return g1, g2


@partial(jax.jit, static_argnames=("padding_factor",))
def kappa_to_phi(kappa, opening_angle, padding_factor: int = 4):
    """Lensing potential phi from kappa: lap phi = 2 kappa (spectral)."""
    n = kappa.shape[-1]
    npad = _pad_size(n, padding_factor)
    lpad = opening_angle * npad / n
    kf = 2.0 * jnp.pi / lpad
    kx = jnp.fft.fftfreq(npad) * npad * kf
    k2mag = kx[:, None] ** 2 + kx[None, :] ** 2
    k2safe = jnp.where(k2mag == 0.0, 1.0, k2mag)
    kap_ft = jnp.fft.fft2(kappa, s=(npad, npad))
    phi_ft = jnp.where(k2mag == 0.0, 0.0, -2.0 / k2safe) * kap_ft
    return jnp.real(jnp.fft.ifft2(phi_ft))[:n, :n]


def _grad_axis(a, ds, axis):
    """np.gradient-identical central/one-sided differences, TPU-shaped.

    jnp.gradient concatenates three odd-sized slices per call; on TPU
    every odd-shaped piece pays a tile relayout (measured: the 4-gradient
    chain below cost 59 ms at 2048^2). Rolls keep every op full-shape
    (~1 ms); the two edge rows are then overwritten with the one-sided
    formula. Values match jnp.gradient to rounding (the (0.5/ds) factor
    associates differently — last-ulp differences, not bit-exact).
    """
    c = (jnp.roll(a, -1, axis) - jnp.roll(a, 1, axis)) * (0.5 / ds)
    a_m = jnp.moveaxis(a, axis, 0)
    c_m = jnp.moveaxis(c, axis, 0)
    c_m = c_m.at[0].set((a_m[1] - a_m[0]) / ds)
    c_m = c_m.at[-1].set((a_m[-1] - a_m[-2]) / ds)
    return jnp.moveaxis(c_m, 0, axis)


@jax.jit
def alpha_to_gamma(alpha1, alpha2, opening_angle):
    """Shear (gamma1, gamma2) from deflection maps via gradients.

    Completes the reference's unfinished convert_deflection_to_shear
    (sky_utils.py:342-363; its `coord` variable was never defined):
      gamma1 = (d1 alpha1 - d2 alpha2) / 2
      gamma2 = (d1 alpha2 + d2 alpha1) / 2
    with second-order central differences on pixel coordinates.
    (Only shear needed? kappa_to_gamma skips the alpha intermediate.)
    """
    n = alpha1.shape[-1]
    ds = opening_angle / n
    d1a1 = _grad_axis(alpha1, ds, 0)
    d2a1 = _grad_axis(alpha1, ds, 1)
    d1a2 = _grad_axis(alpha2, ds, 0)
    d2a2 = _grad_axis(alpha2, ds, 1)
    gamma1 = 0.5 * (d1a1 - d2a2)
    gamma2 = 0.5 * (d1a2 + d2a1)
    return gamma1, gamma2


# ------------------------------------------------------------- NFW analytics
def _nfw_f(x):
    """Baxter+15 Eq. 7: f(x) = (1/x)[ln(x/2) + arccosh(1/x)/sqrt(1-x^2)].

    The reference evaluates this in complex float64 (sky_utils.py:264-269);
    in float32 the naive form suffers catastrophic log cancellation as
    x -> 0 (f ~ -x ln(x)/2, but the two logs are each O(ln x)). This
    version is algebraically rearranged so every term is stable:

      x < 1:  g = ln(x)*(s-1)/s - ln 2 + ln(1+s)/s,  s = sqrt(1-x^2),
              with (s-1) computed as -x^2/(1+s)      [no cancellation]
      x > 1:  g = ln(x/2) + arccos(1/x)/sqrt(x^2-1)
      x ~ 1:  g -> 1 + ln(1/2)                        [shared limit]
      f = g/x, f(0) = 0.
    """
    x = jnp.abs(x)
    xs = jnp.clip(x, 1e-8, None)
    lo = x < 0.999
    hi = x > 1.001
    # --- x < 1 branch (stable) ---
    x_lo = jnp.clip(xs, None, 0.999)
    s = jnp.sqrt((1.0 - x_lo) * (1.0 + x_lo))
    sm1 = -x_lo ** 2 / (1.0 + s)  # s - 1, no cancellation
    g_lo = jnp.log(x_lo) * (sm1 / s) - jnp.log(2.0) + jnp.log1p(s) / s
    # --- x > 1 branch ---
    x_hi = jnp.clip(xs, 1.001, None)
    sh = jnp.sqrt((x_hi - 1.0) * (x_hi + 1.0))
    g_hi = jnp.log(x_hi / 2.0) + jnp.arccos(1.0 / x_hi) / sh
    # --- x ~ 1 limit ---
    g_one = 1.0 + jnp.log(0.5)
    g = jnp.where(lo, g_lo, jnp.where(hi, g_hi, g_one))
    f = g / xs
    return jnp.where(x < 1e-8, 0.0, f)


@partial(jax.jit, static_argnames=("npix", "directions", "suppress"))
def nfw_deflection_angle_map(
    theta_200c_deg, m_200c, c_200c, angu_diam_dist, npix: int = 100,
    extent: float = 1.0, directions: Tuple[int, ...] = (0,),
    suppress: bool = False, suppression_r: float = 1.0,
):
    """Deflection-angle patch of an NFW halo (Baxter+15 Sec. 3.2, Eqs. 6-8).

    Mirrors the reference's NFW_deflection_angle_map (sky_utils.py:214-282):
    the patch spans +-extent*R200c around the halo; `directions` selects the
    vector components summed into the returned scalar map (0 -> theta_x-hat
    projection, 1 -> theta_y-hat).

    Args:
      theta_200c_deg: halo angular radius [deg].
      m_200c: mass [Msun].
      c_200c: NFW concentration.
      angu_diam_dist: angular-diameter distance [Mpc].
    """
    r200 = jnp.tan(theta_200c_deg * jnp.pi / 180.0) * angu_diam_dist  # [Mpc]
    edges = jnp.linspace(0.0, 2.0 * r200 * extent, npix) - r200 * extent
    tx, ty = jnp.meshgrid(edges, edges)  # (ty rows, tx cols) as in reference
    r = jnp.sqrt(tx ** 2 + ty ** 2)
    # Eq. 8: A = M c^2 / (ln(1+c) - c/(1+c)) / 4 pi
    a_nfw = m_200c * c_200c ** 2 / (
        jnp.log(1.0 + c_200c) - c_200c / (1.0 + c_200c)) / (4.0 * jnp.pi)
    # Eq. 6 constant: C = 16 pi (G/c^2) A / c / R200
    cc = 16.0 * jnp.pi * G_OVER_C2 * a_nfw / c_200c / r200
    r_s = r200 / c_200c
    f = _nfw_f(r / r_s)
    rsafe = jnp.where(r == 0.0, 1.0, r)
    amap = jnp.zeros((npix, npix))
    for direc in directions:
        that = (tx if direc == 0 else ty) / rsafe
        amap = amap + cc * jnp.where(r == 0.0, 0.0, that * f)
    amap = jnp.where(jnp.isfinite(amap), amap, 0.0)
    if suppress:
        amap = amap * jnp.exp(-((r / (suppression_r * r200)) ** 3))
    # clip unphysical central-pixel values as the reference does (|a|>100 -> 0)
    amap = jnp.where(jnp.abs(amap) > 100.0, 0.0, amap)
    return amap


@partial(jax.jit, static_argnames=("npix", "directions", "suppress"))
def nfw_temperature_perturbation_map(
    theta_200c_deg, m_200c, c_200c, vel, angu_diam_dist, npix: int = 100,
    extent: float = 1.0, directions: Tuple[int, ...] = (0, 1),
    suppress: bool = False, suppression_r: float = 1.0,
):
    """Moving-lens (Birkinshaw-Gull / Rees-Sciama) dT/T_cmb patch.

    dT/T = -alpha . v_t / c  summed over transverse directions
    (reference sky_utils.py:176-211; Yasini+18).
    vel: transverse velocity components [km/s], indexable by direction.
    """
    dt = jnp.zeros((npix, npix))
    for direc in directions:
        amap = nfw_deflection_angle_map(
            theta_200c_deg, m_200c, c_200c, angu_diam_dist, npix=npix,
            extent=extent, directions=(direc,), suppress=suppress,
            suppression_r=suppression_r,
        )
        dt = dt - amap * vel[direc] / C_LIGHT_KMS
    return dt


def nfw_dipole_patch(m200c, vel_t, z_lens, extent_deg: float = 0.5,
                     npix: int = 128, cosmo=None):
    """Analytic NFW moving-lens temperature patch of fixed angular size.

    Convenience wrapper over nfw_temperature_perturbation_map that derives
    the halo geometry from mass + lens redshift (the role of the
    analytical-map helpers in astrildvisual/rays/visuals.py:317-417):
    R200c from 200 rho_crit(z_lens), concentration from the Duffy et al.
    2008 full-sample c200c relation, and the patch fixed at +-extent_deg/2
    on the sky rather than in units of R200c.

    Args:
      m200c: halo mass [Msun/h].
      vel_t: transverse velocity components (2,) [km/s].
      z_lens: lens redshift.
    Returns:
      (npix, npix) Delta-T map in Kelvin.
    """
    import math

    from ..utils.constants import T_CMB
    from ..utils.cosmology import Cosmology

    cosmo = cosmo if cosmo is not None else Cosmology()
    m200c = float(m200c)
    rho_c = float(cosmo.rho_crit(z_lens))  # (Msun/h)/(Mpc/h)^3
    r200 = (3.0 * m200c / (4.0 * math.pi * 200.0 * rho_c)) ** (1.0 / 3.0)
    d_a = float(cosmo.angular_diameter_distance(z_lens))  # Mpc/h
    theta200_deg = math.degrees(math.atan(r200 / d_a))
    c200 = 5.71 * (m200c / 2.0e12) ** -0.084 * (1.0 + z_lens) ** -0.47
    extent = (extent_deg / 2.0) / theta200_deg
    dt_over_t = nfw_temperature_perturbation_map(
        theta200_deg, m200c, c200, jnp.asarray(vel_t), d_a,
        npix=npix, extent=float(extent), directions=(0, 1))
    return dt_over_t * T_CMB


# ----------------------------------------------------------- patch painting
def add_patch_to_map(limg, simg, cen_pix):
    """Add a small (odd-sized) patch onto a large map, clipped at borders.

    Functional version of the reference add_patch_to_map
    (sky_utils.py:140-173): the patch center lands at pixel
    (cen_pix[0], cen_pix[1]) = (column, row) — matching the reference's
    (x, y) meshgrid convention where limg rows are y.
    """
    npatch = simg.shape[-1]
    rad = npatch // 2
    nbig = limg.shape[-1]
    rows = jnp.arange(npatch) - rad + cen_pix[1]
    cols = jnp.arange(npatch) - rad + cen_pix[0]
    rr = rows[:, None] * jnp.ones((1, npatch), jnp.int32)
    cc = cols[None, :] * jnp.ones((npatch, 1), jnp.int32)
    valid = ((rr >= 0) & (rr < nbig) & (cc >= 0) & (cc < nbig))
    rr = jnp.clip(rr, 0, nbig - 1)
    cc = jnp.clip(cc, 0, nbig - 1)
    return limg.at[rr, cc].add(jnp.where(valid, simg, 0.0))


def paint_halo_patches(base_map, patches, centers_pix):
    """Scatter-add a batch of equal-size patches onto one map.

    Replaces the reference's per-halo python loop + joblib
    (sky_utils.py:99-137, sky_array.py:320-331) with a single scan of
    scatter-adds (XLA fuses these into one kernel).

    Args:
      base_map: (npix, npix).
      patches: (nhalo, p, p) patch stack (odd p).
      centers_pix: (nhalo, 2) int (x=col, y=row) patch centers.
    """
    def body(m, inputs):
        patch, cen = inputs
        return add_patch_to_map(m, patch, cen), None

    out, _ = jax.lax.scan(body, base_map, (patches, centers_pix))
    return out


# --------------------------------------------------------- Born integration
def born_convergence(density_planes, chis, dchis, chi_s, omega_m,
                     scale_factors=None):
    """Born-approximation convergence from stacked density-contrast planes.

    kappa(theta) = (3 H0^2 Om / 2 c^2) sum_i dchi_i g(chi_i) delta_i / a_i
    with g = (chi_s - chi) chi / chi_s (comoving, flat; h-units in, so H0 =
    100 km/s/Mpc). This is the native map-maker replacing the reference's
    on-the-fly Ray-Ramses outputs; the per-plane weighting matches
    SimulationCollection._kernel_function (simcoll.py:432-443).

    Args:
      density_planes: (nplane, npix, npix) delta on each lens plane.
      chis: (nplane,) comoving distances [Mpc/h].
      dchis: (nplane,) plane thicknesses [Mpc/h].
      chi_s: source comoving distance [Mpc/h].
      omega_m: matter density parameter.
      scale_factors: (nplane,) a(chi_i); defaults to 1 (comoving-density
        planes already divided by a, or low-z approximation).
    """
    h0_over_c = 100.0 / C_LIGHT_KMS  # [h/Mpc]
    pref = 1.5 * omega_m * h0_over_c ** 2
    if scale_factors is None:
        scale_factors = jnp.ones_like(chis)
    g = jnp.clip(chi_s - chis, 0.0, None) * chis / chi_s

    def body(acc, inputs):
        plane, gi, dchi, a = inputs
        return acc + pref * gi * dchi * plane / a, None

    kappa, _ = jax.lax.scan(
        body, jnp.zeros_like(density_planes[0]),
        (density_planes, g, dchis, scale_factors))
    return kappa


# ----------------------------------------------------------------- units
def code_to_phy_units_factor(quantity: str) -> float:
    """RayRamses code->physical unit factor (sky_utils.py:318-339).

    kappa/shear/deflection: 1/c^2 ; ISW-RS (dT/T): 1/c^3 (c in km/s).
    """
    if quantity in ("shear_x", "shear_y", "deflt_x", "deflt_y", "kappa_1",
                    "kappa_2"):
        return 1.0 / C_LIGHT_KMS ** 2
    if quantity in ("isw_rs",):
        return 1.0 / C_LIGHT_KMS ** 3
    return 1.0
