"""Real-space weak-lensing two-point statistics: xi_pm(theta), tangential
shear, Delta Sigma, and COSEBIs E/B modes.

The reference's lensing stack stops at harmonic space (lenstools
C_ell, /root/reference/src/astrild/power_spectra/
angular_power_spectrum.py:38-53; peaks/voids/profiles in real space but
no shear correlation functions) — yet xi_pm is THE survey observable
its ray-traced maps exist to predict. This module closes that loop
TPU-natively:

  * theory curves via the cylindrical FFTLog (ops.fftlog
    .bessel_transform): xi_pm from C_EE/BB (J0/J4), gamma_t(theta) from
    a cross C_ell (J2), Delta Sigma(r_p) from P_gm (J2);
  * a map-level xi_pm estimator on flat-sky shear maps — FFT
    autocorrelations of the spin-2 field with the e^{-4 i phi} rotation
    for xi_minus, azimuthally binned on EXACT integer pixel-offset
    squares (same discipline as ops.angular_power._flat_sky_binning);
  * stacked tangential/cross shear profiles around catalog positions
    (the galaxy-galaxy-lensing estimator; gamma_x is the standard
    systematics null);
  * linear COSEBIs (Schneider, Eifler & Krause 2010): polynomial T_pm
    filters built on host in float64 by constrained Gram-Schmidt, E/B
    separation on a finite [theta_min, theta_max] — B_n is the
    B-mode null channel survey pipelines quote.

All device work is FFTs, gathers and segment-sums; filter/kernels are
host-precomputed f64 constants (MXU/HBM-friendly, nothing scatter-
shaped).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .fftlog import bessel_transform

__all__ = [
    "xi_pm_from_cl", "xi_pm_from_cl_grid", "gamma_t_from_cl",
    "xi_pm_from_cl_curved", "gamma_t_from_cl_curved",
    "w_theta_from_cl", "w_theta_from_cl_curved",
    "delta_sigma_from_pk",
    "xi_pm_flat_sky", "tangential_shear_stack",
    "xi_pm_catalog", "gamma_t_catalog",
    "xi_pm_gaussian_covariance", "xi_pm_sample_covariance",
    "tomographic_xi_pm_sample_covariance",
    "cosebis_covariance",
    "linear_cosebis_filters", "cosebis_from_xipm", "cosebis_from_cl",
]

DEG2RAD = np.pi / 180.0
ARCMIN2RAD = DEG2RAD / 60.0
# comoving matter density today: Omega_m * rho_crit0 in h^2 Msun / Mpc^3
RHO_CRIT0_H2 = 2.77536627e11


def _log_ell_table(ells, cl, n: int, pad: float):
    """Interpolate a (possibly linearly sampled) C_ell table onto the
    log-uniform grid FFTLog needs, zero-padded `pad` decades each side so
    the implicit log-periodicity doesn't alias into the band."""
    ells = np.asarray(ells, np.float64)
    lo = max(float(ells[0]), 1e-2)
    hi = float(ells[-1])
    grid = np.geomspace(lo / 10 ** pad, hi * 10 ** pad, n)
    vals = np.interp(grid, ells, np.asarray(cl, np.float64),
                     left=0.0, right=0.0)
    return grid, jnp.asarray(vals, jnp.float32)


def xi_pm_from_cl_grid(ell_grid, cl_e, cl_b=None, q: float = 1.0):
    """Differentiable xi_pm theory: C_EE (and optionally C_BB) VALUES on
    a log-uniform ell grid -> (theta_rad, xi_plus, xi_minus).

    Unlike xi_pm_from_cl there is no host-side table interpolation of
    the values, so cl_e may be a traced array — jax.grad/jacfwd flow
    through the FFTLog transform (host Mellin kernels are constants).
    The grid itself must be a concrete log-uniform numpy array.
    """
    cl_e = jnp.asarray(cl_e)
    tot_p = cl_e if cl_b is None else cl_e + jnp.asarray(cl_b)
    tot_m = cl_e if cl_b is None else cl_e - jnp.asarray(cl_b)
    th, xp = bessel_transform(ell_grid, tot_p, 0, q=q)
    _, xm = bessel_transform(ell_grid, tot_m, 4, q=q)
    return th, xp / (2.0 * jnp.pi), xm / (2.0 * jnp.pi)


def xi_pm_from_cl(ells, cl_e, cl_b=None, n: int = 2048, pad: float = 2.0,
                  q: float = 1.0):
    """Theory shear correlation functions from E/B power spectra:

        xi_+(theta) = (1/2pi) Int dl l [C_EE + C_BB](l) J_0(l theta),
        xi_-(theta) = (1/2pi) Int dl l [C_EE - C_BB](l) J_4(l theta).

    Args:
      ells, cl_e: C_EE table (any monotone sampling; interpolated onto a
        padded log grid).
      cl_b: optional C_BB table on the same ells (default zero).
    Returns:
      (theta_rad, xi_plus, xi_minus) on FFTLog's log-spaced theta grid.
    """
    grid, ce = _log_ell_table(ells, cl_e, n, pad)
    cb = (_log_ell_table(ells, cl_b, n, pad)[1] if cl_b is not None
          else jnp.zeros_like(ce))
    th, xp = bessel_transform(grid, ce + cb, 0, q=q)
    _, xm = bessel_transform(grid, ce - cb, 4, q=q)
    return th, xp / (2.0 * jnp.pi), xm / (2.0 * jnp.pi)


def gamma_t_from_cl(ells, cl_cross, n: int = 2048, pad: float = 2.0,
                    q: float = 1.0):
    """Mean tangential shear around tracers from the cross spectrum
    C_{g kappa}:  gamma_t(theta) = (1/2pi) Int dl l C_{g kappa}(l)
    J_2(l theta).  Returns (theta_rad, gamma_t)."""
    grid, cx = _log_ell_table(ells, cl_cross, n, pad)
    th, gt = bessel_transform(grid, cx, 2, q=q)
    return th, gt / (2.0 * jnp.pi)


def w_theta_from_cl(ells, cl_gg, n: int = 2048, pad: float = 2.0,
                    q: float = 1.0):
    """Angular clustering correlation w(theta) from C_gg (flat sky):
    the J0 Hankel, w = (1/2pi) Int dl l C_gg J0(l theta) — the
    third angular 3x2pt observable next to gamma_t (J2 of C_gkappa)
    and xi_pm. Returns (theta_rad, w)."""
    grid, cg = _log_ell_table(ells, cl_gg, n, pad)
    th, w = bessel_transform(grid, cg, 0, q=q)
    return th, w / (2.0 * jnp.pi)


def w_theta_from_cl_curved(cl_gg, theta_rad):
    """Exact curved-sky w(theta) = sum_l (2l+1)/(4pi) C_gg P_l(cos
    theta) — P_l = d^l_{00} from the SAME Wigner recursion home as the
    spin-2/spin-0 curved transforms (ops.sht_spin._wigner_d_l_rows).
    Host float64; cl indexed l = 0..lmax."""
    from .sht_spin import _wigner_d_l_rows

    cl = np.asarray(cl_gg, np.float64)
    lmax = cl.shape[0] - 1
    th = np.atleast_1d(np.asarray(theta_rad, np.float64))
    P = _wigner_d_l_rows(lmax, np.cos(th.ravel()), 0, 0)
    fac = (2.0 * np.arange(lmax + 1) + 1.0) / (4.0 * np.pi)
    return ((fac * cl) @ P).reshape(th.shape)


def xi_pm_from_cl_curved(cl_e, theta_rad, cl_b=None):
    """EXACT curved-sky shear correlation functions via Wigner d sums:

        xi_+(theta) = sum_l (2l+1)/(4pi) [C_EE + C_BB] d^l_{2, 2},
        xi_-(theta) = sum_l (2l+1)/(4pi) [C_EE - C_BB] d^l_{2,-2},

    the full-sky completion of xi_pm_from_cl (whose flat-sky J0/J4
    Hankels are the small-angle limits of the d-functions). Reuses the
    MASTER machinery's m=2-column Wigner recursion
    (ops.sht_spin._wigner_d_l_rows). Host float64; cl arrays indexed by
    l = 0..lmax. Returns (xi_plus, xi_minus) at theta_rad (any shape).
    """
    from .sht_spin import _wigner_d_l_rows

    cl_e = np.asarray(cl_e, np.float64)
    lmax = cl_e.shape[0] - 1
    cb = (np.zeros_like(cl_e) if cl_b is None
          else np.asarray(cl_b, np.float64))
    th = np.atleast_1d(np.asarray(theta_rad, np.float64))
    x = np.cos(th.ravel())
    d22 = _wigner_d_l_rows(lmax, x, 2, 2)     # (lmax+1, nth)
    d2m2 = _wigner_d_l_rows(lmax, x, -2, 2)
    fac = (2.0 * np.arange(lmax + 1) + 1.0) / (4.0 * np.pi)
    xip = (fac * (cl_e + cb)) @ d22
    xim = (fac * (cl_e - cb)) @ d2m2
    return xip.reshape(th.shape), xim.reshape(th.shape)


def gamma_t_from_cl_curved(cl_cross, theta_rad, cross_with: str = "E"):
    """Curved-sky mean tangential shear around tracers:

        gamma_t(theta) = sum_l (2l+1)/(4pi) C_l^{gE} d^l_{2,0}(theta)

    (d^l_{2,0} = d^l_{0,2} -> J2 in the flat limit). cross_with="kappa"
    accepts C_l^{g kappa} instead and applies the exact spin-raising
    factor sqrt((l+2)(l-1)/(l(l+1))) of kappa_alm_to_shear_alm. Host
    float64. Returns gamma_t at theta_rad.
    """
    from .sht_spin import _wigner_d_l_rows

    cl = np.asarray(cl_cross, np.float64).copy()
    lmax = cl.shape[0] - 1
    ell = np.arange(lmax + 1, dtype=np.float64)
    if cross_with == "kappa":
        with np.errstate(divide="ignore", invalid="ignore"):
            f = np.sqrt((ell + 2.0) * (ell - 1.0)
                        / np.maximum(ell * (ell + 1.0), 1.0))
        f[:2] = 0.0
        cl = cl * f
    elif cross_with != "E":
        raise ValueError("cross_with must be 'E' or 'kappa'")
    th = np.atleast_1d(np.asarray(theta_rad, np.float64))
    d20 = _wigner_d_l_rows(lmax, np.cos(th.ravel()), 0, 2)
    fac = (2.0 * ell + 1.0) / (4.0 * np.pi)
    return ((fac * cl) @ d20).reshape(th.shape)


def delta_sigma_from_pk(k, p_gm, rp, omega_m: float, q: float = 1.0):
    """Theory excess surface density for galaxy-galaxy lensing,

        Delta Sigma(r_p) = rho_m Int dk k P_gm(k) J_2(k r_p) / (2 pi),

    with rho_m the COMOVING mean matter density (Omega_m rho_crit0).
    This is the flat-sky/Limber identity Delta Sigma = rho_m
    [ (2/rp^2) Int_0^rp R w_gm(R) R dR ... ] collapsed to one J2 Hankel
    of the 3D power spectrum (the pi integral of xi_gm is the J0->J2
    ladder; validated against the w_gm route in tests).

    Args:
      k, p_gm: log-spaced galaxy-matter power table [h/Mpc, (Mpc/h)^3].
      rp: (m,) projected radii [Mpc/h].
      omega_m: matter density parameter.
    Returns:
      (m,) Delta Sigma in h Msun / pc^2 (comoving).
    """
    r, ds = bessel_transform(np.asarray(k, np.float64),
                             jnp.asarray(p_gm, jnp.float32), 2, q=q)
    rho_m = omega_m * RHO_CRIT0_H2  # h^2 Msun / Mpc^3
    ds = ds * (rho_m / (2.0 * jnp.pi)) * 1e-12  # Mpc^-2 -> pc^-2
    lnr = jnp.log(r)
    return jnp.interp(jnp.log(jnp.asarray(rp, jnp.float32)), lnr, ds)


@lru_cache(maxsize=32)
def _xi_pm_bins(n: int, nbins: int, theta_min_pix: float,
                theta_max_pix: float):
    """Host-precomputed azimuthal binning of the (n, n) offset grid.

    Offsets are fftfreq-signed integers; selection compares the EXACT
    integer r^2 = dx^2 + dy^2 against host f64 squared log-edges (the
    shell-edge discipline of ops.angular_power._flat_sky_binning: no
    device sqrt/linspace participates, so eager/jit lowerings bin
    identically). Returns (binidx flat i32, inside flat f32, counts
    (nbins,), theta_pix (nbins,) mean |r| per bin).
    """
    f = (np.fft.fftfreq(n) * n).astype(np.float64)
    r2 = f[:, None] ** 2 + f[None, :] ** 2  # exact integers
    edges2 = np.geomspace(theta_min_pix, theta_max_pix, nbins + 1) ** 2
    idx = np.clip(np.searchsorted(edges2, r2.ravel(), side="right") - 1,
                  0, nbins - 1)
    inside = ((r2.ravel() >= edges2[0]) & (r2.ravel() <= edges2[-1]))
    cnt = np.bincount(idx, weights=inside, minlength=nbins)
    rsum = np.bincount(idx, weights=inside * np.sqrt(r2.ravel()),
                       minlength=nbins)
    # empty annuli (narrow log bins between integer radii) report the
    # geometric bin center instead of a misleading 0
    centers = np.sqrt(edges2[:-1] * edges2[1:]) ** 0.5
    theta_pix = np.where(cnt > 0, rsum / np.maximum(cnt, 1.0), centers)
    # cache HOST arrays only: jnp constants created here while a caller
    # is being traced would cache trace-local arrays, poisoning later
    # eager callers (measured: TracerArrayConversionError in
    # xi_pm_gaussian_covariance after xi_pm_sample_covariance ran first)
    return (idx.astype(np.int32), inside.astype(np.float32),
            cnt.astype(np.float32), theta_pix.astype(np.float32))


@partial(jax.jit, static_argnames=("nbins", "theta_min_pix",
                                   "theta_max_pix"))
def _xi_pm_grids(g1, g2, nbins, theta_min_pix, theta_max_pix):
    n = g1.shape[-1]
    gam = jax.lax.complex(jnp.asarray(g1, jnp.float32),
                          jnp.asarray(g2, jnp.float32))
    F = jnp.fft.fft2(gam)
    Fc = jnp.fft.fft2(jnp.conj(gam))
    npix = float(n) ** 2
    # c_plus(r) = <gamma(x+r) conj(gamma(x))>_x : IFFT of |F|^2
    c_plus = jnp.fft.ifft2(jnp.abs(F) ** 2 + 0j) / npix
    # c_minus(r) = <gamma(x+r) gamma(x)>_x : gamma_hat(-l) = conj(Fc(l))
    c_minus = jnp.fft.ifft2(F * jnp.conj(Fc)) / npix
    # e^{-4 i phi_r} from the signed integer offsets (exact at r=0-safe)
    f = jnp.fft.fftfreq(n) * n
    dx = f[:, None] + jnp.zeros((1, n))
    dy = f[None, :] + jnp.zeros((n, 1))
    r2 = dx * dx + dy * dy
    safe = jnp.where(r2 == 0.0, 1.0, r2)
    # (dx + i dy)^4 / r^4 = cos4phi + i sin4phi
    zx, zy = dx, dy
    z2x = zx * zx - zy * zy
    z2y = 2.0 * zx * zy
    cos4 = (z2x * z2x - z2y * z2y) / (safe * safe)
    sin4 = (2.0 * z2x * z2y) / (safe * safe)
    xim_grid = (jnp.real(c_minus) * cos4 + jnp.imag(c_minus) * sin4)
    xip_grid = jnp.real(c_plus)
    binidx_h, inside_h, cnt_h, theta_pix_h = _xi_pm_bins(
        n, nbins, theta_min_pix, theta_max_pix)
    # route the dropped offsets to the nbins bucket so the one-hot MXU
    # reduction (ops/binred; 20x the sort-lowered segment_sum) can bin
    # both channels in one contraction
    binidx = jnp.asarray(np.where(inside_h > 0, binidx_h, nbins)
                         .astype(np.int32))
    inside = jnp.asarray(inside_h)
    cnt = jnp.asarray(cnt_h)
    theta_pix = jnp.asarray(theta_pix_h)
    denom = jnp.maximum(cnt, 1.0)
    from .binred import masked_bin_reduce
    sums = masked_bin_reduce(
        jnp.stack([inside * xip_grid.reshape(-1),
                   inside * xim_grid.reshape(-1)]), binidx, nbins)
    xip = sums[0] / denom
    xim = sums[1] / denom
    # empty annuli are NaN, not a silent 0 (npairs==0 says why)
    empty = cnt == 0
    xip = jnp.where(empty, jnp.nan, xip)
    xim = jnp.where(empty, jnp.nan, xim)
    return theta_pix, xip, xim, cnt


def xi_pm_flat_sky(gamma1, gamma2, opening_angle_deg: float,
                   nbins: int = 20, theta_min_arcmin=None,
                   theta_max_arcmin=None):
    """Shear correlation functions measured on flat-sky maps.

        xi_+(theta) = < gamma gamma* >(theta)
        xi_-(theta) = Re[ < gamma gamma >(r) e^{-4 i phi_r} ](theta)

    via FFT autocorrelations of the complex shear gamma = g1 + i g2
    (periodic — the native convention for ray-traced boxes; apodize or
    zero-pad survey masks first). Log-spaced angular bins; azimuthal
    averaging uses exact integer offset squares so jitted and eager
    lowerings bin identically.

    Returns (theta_arcmin, xi_plus, xi_minus, npairs) with npairs the
    offset-vector count per bin (each carrying npix pair samples).
    """
    n = jnp.asarray(gamma1).shape[-1]
    pixscale_arcmin = opening_angle_deg * 60.0 / n
    tmin = (1.0 if theta_min_arcmin is None
            else float(theta_min_arcmin) / pixscale_arcmin)
    tmax = (n / 2.0 if theta_max_arcmin is None
            else float(theta_max_arcmin) / pixscale_arcmin)
    if not tmax > tmin:
        raise ValueError("xi_pm_flat_sky: need theta_max > theta_min "
                         f"(got {tmin}..{tmax} pixels)")
    theta_pix, xip, xim, cnt = _xi_pm_grids(gamma1, gamma2, nbins,
                                            float(tmin), float(tmax))
    return theta_pix * pixscale_arcmin, xip, xim, cnt


@partial(jax.jit, static_argnames=("patch_half", "nbins"))
def tangential_shear_stack(gamma1, gamma2, centers_pix, r_edges_pix,
                           patch_half: int, nbins: int):
    """Stacked tangential/cross shear around catalog positions (the
    galaxy-galaxy-lensing map estimator).

        gamma_t(x; c) = -[g1 cos 2phi + g2 sin 2phi],
        gamma_x(x; c) = -[-g1 sin 2phi + g2 cos 2phi],

    phi the position angle of x - c. gamma_x is the parity-odd
    systematics null (vanishes for any scalar lens). Periodic
    (min-image) patches, same (row, col) center convention as
    ops.profiles.object_profiles.

    Args:
      gamma1, gamma2: (n, n) shear maps.
      centers_pix: (nobj, 2) int (row, col) stack centers.
      r_edges_pix: (nbins+1,) radial bin edges in pixels (ascending;
        r_edges_pix[-1] must be <= patch_half).
      patch_half: static patch half-size.
    Returns:
      (r_mid_pix, gt, gx, npix) — profile radii, stacked tangential and
      cross shear (nbins,), and pixels per annulus across the stack.
    """
    n = gamma1.shape[-1]
    p = 2 * patch_half + 1
    off = jnp.arange(p) - patch_half
    drow = off[:, None] + jnp.zeros((1, p))
    dcol = off[None, :] + jnp.zeros((p, 1))
    r2 = drow ** 2 + dcol ** 2
    safe = jnp.where(r2 == 0.0, 1.0, r2)
    # phi measured from axis 0 (row) toward axis 1 (col) — the SAME
    # frame as shear_eb_maps' Kaiser-Squires rotation, so shear built by
    # this package's KS/raytrace stacks with the correct sign
    cos2 = (drow ** 2 - dcol ** 2) / safe
    sin2 = 2.0 * drow * dcol / safe
    r = jnp.sqrt(r2)
    edges = jnp.asarray(r_edges_pix, jnp.float32)
    binidx = jnp.clip(jnp.searchsorted(edges, r.reshape(-1),
                                       side="right") - 1, 0, nbins - 1)
    inside = ((r.reshape(-1) >= edges[0]) & (r.reshape(-1) < edges[-1])
              & (r.reshape(-1) > 0.0)).astype(jnp.float32)

    rows = jnp.arange(p) - patch_half
    g1 = jnp.asarray(gamma1, jnp.float32)
    g2 = jnp.asarray(gamma2, jnp.float32)
    from .binred import masked_bin_reduce
    bdrop = jnp.where(inside > 0, binidx, nbins)

    def one(center):
        ri = jnp.mod(center[0] + rows, n)
        ci = jnp.mod(center[1] + rows, n)
        p1 = g1[ri[:, None], ci[None, :]]
        p2 = g2[ri[:, None], ci[None, :]]
        gt = -(p1 * cos2 + p2 * sin2)
        gx = -(p2 * cos2 - p1 * sin2)
        sums = masked_bin_reduce(
            jnp.stack([inside * gt.reshape(-1),
                       inside * gx.reshape(-1)]), bdrop, nbins)
        return sums[0], sums[1]

    ts, xs = jax.vmap(one)(jnp.asarray(centers_pix))
    csums = masked_bin_reduce(
        jnp.stack([inside, inside * r.reshape(-1)]), bdrop, nbins)
    cnt = csums[0]
    rsum = csums[1]
    tot = jnp.maximum(cnt, 1.0) * centers_pix.shape[0]
    return (rsum / jnp.maximum(cnt, 1.0), jnp.sum(ts, 0) / tot,
            jnp.sum(xs, 0) / tot, cnt * centers_pix.shape[0])


# ----------------------------------------------------- xi_pm covariances

def _annulus_weights(npix: int, nbins: int, tmin_pix: float,
                     tmax_pix: float):
    """Host-precomputed spectral annulus weights of the map estimator.

    xi_hat_+(b) = sum_l A_b(l) |kappa_hat(l)|^2 and
    xi_hat_-(b) = sum_l [B_b(l) Re Z(l) - Bt_b(l) Im Z(l)] with
    Z = e^{4 i phi_l} gamma_hat(l) gamma_hat(-l): A_b is the plain
    annulus Fourier weight, (B_b, Bt_b) carry the e^{-4 i phi_r}
    rotation. All returned (nbins, npix^2) float32 on host; shares the
    exact integer-r^2 binning of _xi_pm_bins.
    """
    # SINGLE binning home: the same (idx, inside, cnt) the estimator
    # bins with (_xi_pm_bins) — a drifting duplicate here would break
    # the "exact on this estimator's own mode set" guarantee
    idx, inside_f, cnt, _ = _xi_pm_bins(npix, nbins, tmin_pix, tmax_pix)
    inside = inside_f > 0
    f = (np.fft.fftfreq(npix) * npix).astype(np.float64)
    dx, dy = np.meshgrid(f, f, indexing="ij")
    r2 = dx ** 2 + dy ** 2
    safe = np.where(r2 == 0.0, 1.0, r2)
    z2x, z2y = dx * dx - dy * dy, 2 * dx * dy
    cos4r = (z2x * z2x - z2y * z2y) / (safe * safe)
    sin4r = 2 * z2x * z2y / (safe * safe)
    # mode-side 4phi_l phase (same functional form on the fft grid)
    cos4l, sin4l = cos4r, sin4r
    A = np.empty((nbins, npix * npix), np.float64)
    B = np.empty_like(A)
    Bt = np.empty_like(A)
    n2 = float(npix * npix)
    norm = n2 * n2  # the estimator's ifft2 carries 1/N^2 and the grid
    # average another 1/N^2: xi_hat(b) = sum_l A_b(l) |F(l)|^2 with
    # A_b = (1/(N_b N^4)) sum_{r in b} e^{i l r}
    for b in range(nbins):
        ind = ((idx == b) & inside).astype(np.float64).reshape(npix, npix)
        nb = max(cnt[b], 1.0)
        fa = np.fft.fft2(ind)
        A[b] = fa.real.ravel() / (nb * norm)  # symmetric annulus -> real
        fc = np.fft.fft2(ind * cos4r)
        fs = np.fft.fft2(ind * sin4r)
        # sum_{r in b} e^{i l r} e^{-4 i phi_r} = fa_c - i fa_s with
        # fa_c/fa_s the cos/sin transforms; multiply by e^{4 i phi_l}
        re = fc.real.ravel() + fs.imag.ravel()
        im = fc.imag.ravel() - fs.real.ravel()
        B[b] = (cos4l.ravel() * re - sin4l.ravel() * im) / (nb * norm)
        Bt[b] = -(cos4l.ravel() * im + sin4l.ravel() * re) / (nb * norm)
    return (A.astype(np.float32), B.astype(np.float32),
            Bt.astype(np.float32), cnt)


def xi_pm_gaussian_covariance(npix: int, opening_angle_deg: float,
                              cl_tab_ell, cl_tab_val, nbins: int,
                              theta_min_arcmin=None, theta_max_arcmin=None,
                              cl_b_tab_val=None, noise_cl: float = 0.0):
    """EXACT discrete Gaussian covariance of xi_pm_flat_sky on this
    estimator's own mode set (no continuum/area approximation).

    With P(l) = S_E(l) + S_n and Q(l) = S_B(l) + S_n the per-channel
    grid-unit powers (S = C * npix^4 / theta_box^2; S_n from noise_cl,
    the white noise power per shear COMPONENT), the quadratic-estimator
    algebra gives

      Cov(xi+_b, xi+_b') = 2 sum_l A_b A_b' (P^2 + Q^2)
      Cov(xi+_b, xi-_b') = 2 sum_l A_b B_b' (P^2 - Q^2)
      Cov(xi-_b, xi-_b') = sum_l [(B_b B_b' + B_b Bf_b')(P^2 + Q^2)
                                 + (Bt_b Bt_b' + Bt_b Btf_b') 2 P Q]

    where Xf(l) = X(-l): the pm-weights B/Bt are NOT even in l on small
    annuli (the 4phi_r rotation breaks it), so the +-l mode pairing
    keeps the flipped product — dropping it under-covers the smallest
    xi_- bin by ~14% (measured). A is even, so the +/+ and +/- blocks
    simplify. Validated against the Monte-Carlo sampler below. Returns
    (theta_arcmin, cov), cov the (2 nbins, 2 nbins) [xi+; xi-] block
    matrix.
    """
    pixscale = opening_angle_deg * 60.0 / npix
    tmin = (1.0 if theta_min_arcmin is None
            else float(theta_min_arcmin) / pixscale)
    tmax = (npix / 2.0 if theta_max_arcmin is None
            else float(theta_max_arcmin) / pixscale)
    A, B, Bt, cnt = _annulus_weights(npix, nbins, float(tmin), float(tmax))
    _, _, _, theta_pix = _xi_pm_bins(npix, nbins, float(tmin), float(tmax))
    f = np.fft.fftfreq(npix) * npix
    lf = 2.0 * np.pi / (opening_angle_deg * DEG2RAD)
    lmag = lf * np.sqrt(f[:, None] ** 2 + f[None, :] ** 2).ravel()
    box = opening_angle_deg * DEG2RAD
    unit = float(npix) ** 4 / box ** 2
    # endpoint-CLAMPED interp, matching cl_to_flat_map's jnp.interp: the
    # grid corner reaches sqrt(2)x the axis Nyquist, and a zero-beyond-
    # table convention here would under-cover estimators run on
    # synthesized maps by ~15% in the smallest bins (measured) — pass an
    # explicitly zero-tailed table to band-limit
    s_e = np.interp(lmag, np.asarray(cl_tab_ell, np.float64),
                    np.asarray(cl_tab_val, np.float64)) * unit
    s_e[lmag == 0.0] = 0.0
    s_b = (np.zeros_like(s_e) if cl_b_tab_val is None else
           np.interp(lmag, np.asarray(cl_tab_ell, np.float64),
                     np.asarray(cl_b_tab_val, np.float64)) * unit)
    s_n = noise_cl * unit
    P = s_e + s_n
    Q = s_b + s_n
    pq_plus = P ** 2 + Q ** 2
    pq_minus = P ** 2 - Q ** 2
    pq_cross = 2.0 * P * Q
    A64 = A.astype(np.float64)
    B64 = B.astype(np.float64)
    Bt64 = Bt.astype(np.float64)

    def lflip(W):
        # W(l) -> W(-l) on the fft index grid
        g = W.reshape(-1, npix, npix)[:, ::-1, ::-1]
        return np.roll(g, 1, axis=(1, 2)).reshape(W.shape[0], -1)

    Bf = lflip(B64)
    Btf = lflip(Bt64)
    cpp = 2.0 * (A64 * pq_plus) @ A64.T
    cpm = 2.0 * (A64 * pq_minus) @ B64.T
    cmm = ((B64 * pq_plus) @ (B64 + Bf).T
           + (Bt64 * pq_cross) @ (Bt64 + Btf).T)
    cov = np.block([[cpp, cpm], [cpm.T, cmm]])
    return np.asarray(theta_pix) * pixscale, cov


def xi_pm_sample_covariance(key, cl_tab_ell, cl_tab_val, npix: int,
                            opening_angle_deg: float, nbins: int,
                            n_real: int = 200, theta_min_arcmin=None,
                            theta_max_arcmin=None, noise_std: float = 0.0):
    """Monte-Carlo covariance of xi_pm_flat_sky: n_real Gaussian pure-E
    realizations (cl_to_flat_map -> kappa_to_shear_maps -> estimator,
    optional white shape noise of std noise_std per shear component per
    pixel). One jitted realization function scanned over keys — the
    TPU-idiomatic route when the analytic Gaussian form isn't enough
    (masks, non-Gaussian fields: swap the synthesizer).

    Returns (theta_arcmin, mean (2 nbins,), cov (2 nbins, 2 nbins),
    samples (n_real, 2 nbins)).
    """
    from .angular_power import cl_to_flat_map, kappa_to_shear_maps

    pixscale = opening_angle_deg * 60.0 / npix
    tmin = (1.0 if theta_min_arcmin is None
            else float(theta_min_arcmin) / pixscale)
    tmax = (npix / 2.0 if theta_max_arcmin is None
            else float(theta_max_arcmin) / pixscale)
    ell_tab = jnp.asarray(cl_tab_ell, jnp.float32)
    val_tab = jnp.asarray(cl_tab_val, jnp.float32)

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        kap = cl_to_flat_map(k1, ell_tab, val_tab, npix,
                             opening_angle_deg)
        g1, g2 = kappa_to_shear_maps(kap)
        if noise_std > 0.0:
            g1 = g1 + noise_std * jax.random.normal(k2, g1.shape)
            g2 = g2 + noise_std * jax.random.normal(k3, g2.shape)
        th, xp, xm, _ = _xi_pm_grids(g1, g2, nbins, float(tmin),
                                     float(tmax))
        return th, jnp.concatenate([xp, xm])

    keys = jax.random.split(key, n_real)
    th, samples = jax.lax.map(one, keys)
    th = th[0] * pixscale
    mean = jnp.mean(samples, axis=0)
    d = samples - mean
    cov = (d.T @ d) / (n_real - 1)
    return th, mean, cov, samples


def tomographic_xi_pm_sample_covariance(key, ells, cls_stack, npix: int,
                                         opening_angle_deg: float,
                                         nbins: int, n_real: int = 200,
                                         theta_min_arcmin=None,
                                         theta_max_arcmin=None,
                                         noise_std: float = 0.0):
    """Monte-Carlo covariance of the TOMOGRAPHIC real-space shear data
    vector: for nbin source bins, the packed vector is

        [xi_+^{ij}(theta); xi_-^{ij}(theta)]  over unique pairs i <= j

    measured by the map estimator on correlated Gaussian realizations.
    Per 2D mode the bins are drawn as kappa_i = L_ij z_j with L the
    Cholesky factor of the C^{ij}(l) stack (e.g.
    forecast.tomographic_shear_cls), so all cross-bin and cross-pair
    covariances — including the xi_-^{ij} x xi_+^{mn} blocks the
    single-bin analytic form doesn't cover — are sampled exactly.
    Optional white shape noise per shear component and bin.

    Returns (theta_arcmin, pair_list, mean, cov, samples) with mean a
    (npair * 2 * nbins_theta,) vector ordered pair-major
    [(0,0)+, (0,0)-, (0,1)+, ...].
    """
    from .angular_power import kappa_to_shear_maps

    cls_stack = np.asarray(cls_stack, np.float64)
    nb = cls_stack.shape[0]
    ells = np.asarray(ells, np.float64)
    pairs = [(i, j) for i in range(nb) for j in range(i, nb)]
    pixscale = opening_angle_deg * 60.0 / npix
    tmin = (1.0 if theta_min_arcmin is None
            else float(theta_min_arcmin) / pixscale)
    tmax = (npix / 2.0 if theta_max_arcmin is None
            else float(theta_max_arcmin) / pixscale)

    # per-mode Cholesky of C^{ij}(|l|), host-precomputed on the grid
    theta_box = opening_angle_deg * np.pi / 180.0
    lf = 2.0 * np.pi / theta_box
    f = np.fft.fftfreq(npix) * npix
    lmag = lf * np.hypot(f[:, None], f[None, :])
    cmat = np.empty((npix, npix, nb, nb))
    for i in range(nb):
        for j in range(nb):
            cmat[..., i, j] = np.interp(lmag, ells, cls_stack[i, j])
    cmat[lmag == 0.0] = 0.0
    # RELATIVE jitter so cholesky exists everywhere: zero modes need an
    # absolute floor, and perfectly-correlated bins (rank-deficient
    # C^{ij}) need a floor scaled to the matrix norm — an absolute
    # 1e-30 is below f64 resolution against C ~ 1e-8
    scale = cmat.diagonal(axis1=-2, axis2=-1).max(axis=-1)
    cmat += np.eye(nb) * (1e-10 * scale + 1e-300)[..., None, None]
    chol = np.linalg.cholesky(cmat)  # (npix, npix, nb, nb)
    amp = float(npix) ** 2 / theta_box  # mode normalization of
    # cl_to_flat_map: |kappa_hat|^2 = C * npix^4 / theta^2
    chol_j = jnp.asarray(chol * amp, jnp.float32)

    def one(k):
        km, kn = jax.random.split(k)
        zr = jax.random.normal(km, (npix, npix, nb))
        zi = jax.random.normal(kn, (npix, npix, nb))
        modes = jnp.einsum("xyij,xyj->xyi", chol_j, zr) / jnp.sqrt(2.0)
        modes_i = jnp.einsum("xyij,xyj->xyi", chol_j, zi) / jnp.sqrt(2.0)
        fm = jax.lax.complex(modes, modes_i)
        # hermitianize each bin's mode grid (cl_to_flat_map recipe)
        sym = 0.5 * (fm + jnp.conj(jnp.roll(jnp.flip(fm, (0, 1)),
                                            (1, 1), (0, 1))))
        kap = jnp.real(jnp.fft.ifft2(sym * jnp.sqrt(2.0),
                                     axes=(0, 1)))  # (npix, npix, nb)
        shear = [kappa_to_shear_maps(kap[..., b]) for b in range(nb)]
        if noise_std > 0.0:
            kk = jax.random.split(k, 2 * nb + 2)
            shear = [(g1 + noise_std * jax.random.normal(kk[2 * b],
                                                         g1.shape),
                      g2 + noise_std * jax.random.normal(kk[2 * b + 1],
                                                         g2.shape))
                     for b, (g1, g2) in enumerate(shear)]
        rows = []
        for (i, j) in pairs:
            g1i, g2i = shear[i]
            g1j, g2j = shear[j]
            # cross-correlation via the polarization identity through
            # the auto estimator (bit-identical binning)
            _, xp_s, xm_s, _ = _xi_pm_grids(g1i + g1j, g2i + g2j,
                                            nbins, float(tmin),
                                            float(tmax))
            th, xp_d, xm_d, _ = _xi_pm_grids(g1i - g1j, g2i - g2j,
                                             nbins, float(tmin),
                                             float(tmax))
            rows.append(0.25 * (xp_s - xp_d))
            rows.append(0.25 * (xm_s - xm_d))
        return th, jnp.concatenate(rows)

    keys = jax.random.split(key, n_real)
    th, samples = jax.lax.map(one, keys)
    th = th[0] * pixscale
    mean = jnp.mean(samples, axis=0)
    d = samples - mean
    cov = (d.T @ d) / (n_real - 1)
    return th, pairs, mean, cov, samples


def cosebis_covariance(theta_arcmin, cov_xipm, nmax: int,
                       theta_min: float, theta_max: float,
                       ntheta: int = 4096):
    """Propagate a (2 nbins, 2 nbins) [xi+; xi-] covariance through the
    LINEAR map cosebis_from_xipm: builds the transform matrix by
    applying the estimator to unit vectors, then L C L^T. Returns
    (cov_E (nmax, nmax), cov_B (nmax, nmax))."""
    theta_arcmin = np.asarray(theta_arcmin, np.float64)
    nb = theta_arcmin.shape[0]
    L_E = np.zeros((int(nmax), 2 * nb))
    L_B = np.zeros((int(nmax), 2 * nb))
    zero = np.zeros(nb)
    for i in range(2 * nb):
        xp = zero.copy()
        xm = zero.copy()
        (xp if i < nb else xm)[i % nb] = 1.0
        e, b = cosebis_from_xipm(theta_arcmin, xp, xm, nmax, theta_min,
                                 theta_max, ntheta=ntheta)
        L_E[:, i] = np.asarray(e)
        L_B[:, i] = np.asarray(b)
    cov = np.asarray(cov_xipm, np.float64)
    return L_E @ cov @ L_E.T, L_B @ cov @ L_B.T


# ------------------------------------------------- catalog pair estimators

def _pad_to_block(a, block, fill=0.0):
    n = a.shape[0]
    m = (-n) % block
    if m:
        a = jnp.concatenate([a, jnp.full((m,), fill, a.dtype)])
    return a


def _min_image_1d(d, boxsize):
    if boxsize is None:
        return d
    return d - boxsize * jnp.round(d / boxsize)


@partial(jax.jit, static_argnames=("nbins", "block", "dedup",
                                   "triangular", "boxsize"))
def _shear_pair_tiles(xi_, yi_, e1i, e2i, wi, xj_, yj_, e1j, e2j, wj,
                      edges, nbins: int, boxsize, block: int, dedup: bool,
                      triangular: bool = False, ia0=0, jb0=0):
    """Blocked O(N_i N_j) accumulation of the spin-2 pair channels.

    Per theta bin returns (sum w w' Re[e conj(e')],
    sum w w' Re[e e' exp(-4 i phi)], sum w w' e_t', sum w w' e_x',
    sum w w', npairs); phi is the separation angle from axis x toward y.
    The xi_plus channel needs no rotation (Re[e conj(e')] is frame
    independent); the t/x channels rotate only the j-side ellipticity
    (the gamma_t lens-source layout: i = lenses carrying w only).

    ia0/jb0 are GLOBAL index offsets; dedup=True masks global i < j
    (same contract as ops.tpcf._s_mu_accumulate_tiles, so the half-ring
    schedule of parallel/tpcf.py applies unchanged). triangular=True
    skips local a > b tiles — valid ONLY when ia0 == jb0 (the self
    step). Kahan-compensated bins.
    """
    ni = xi_.shape[0]
    nj = xj_.shape[0]
    if ni % block or nj % block or ni < block or nj < block:
        # silent tail-dropping (or an opaque empty-scan IndexError when
        # n < block) otherwise — the distributed factory feeds shard
        # sizes straight through
        raise ValueError(
            f"_shear_pair_tiles: chunk sizes ({ni}, {nj}) must be "
            f"nonzero multiples of block={block} (pad with zero-weight "
            "rows)")
    nbi = ni // block
    nbj = nj // block
    lo = edges[0]
    hi = edges[-1]

    def tile(carry, ab):
        sums, comp = carry
        a, b = ab
        ia = ia0 + a * block + jnp.arange(block)
        jb = jb0 + b * block + jnp.arange(block)
        sl = lambda v, o: jax.lax.dynamic_slice_in_dim(v, o * block, block)
        dx = _min_image_1d(sl(xi_, a)[:, None] - sl(xj_, b)[None, :],
                           boxsize)
        dy = _min_image_1d(sl(yi_, a)[:, None] - sl(yj_, b)[None, :],
                           boxsize)
        r2 = dx * dx + dy * dy
        r = jnp.sqrt(r2)
        binidx = jnp.clip(jnp.searchsorted(edges, r, side="right") - 1,
                          0, nbins - 1)
        mask = (r >= lo) & (r < hi)
        if dedup:
            mask = mask & (ia[:, None] < jb[None, :])
        wim = sl(wi, a)
        wjm = sl(wj, b)
        ww = wim[:, None] * wjm[None, :]
        mask = mask & (ww != 0.0)
        wwm = jnp.where(mask, ww, 0.0)
        safe = jnp.where(r2 == 0.0, 1.0, r2)
        cos2 = (dx * dx - dy * dy) / safe
        sin2 = 2.0 * dx * dy / safe
        cos4 = cos2 * cos2 - sin2 * sin2
        sin4 = 2.0 * cos2 * sin2
        a1, a2 = sl(e1i, a)[:, None], sl(e2i, a)[:, None]
        b1, b2 = sl(e1j, b)[None, :], sl(e2j, b)[None, :]
        # xi_plus: Re[e_i conj(e_j)]; xi_minus: Re[e_i e_j e^{-4 i phi}]
        pp = a1 * b1 + a2 * b2
        re_ab = a1 * b1 - a2 * b2
        im_ab = a1 * b2 + a2 * b1
        mm = re_ab * cos4 + im_ab * sin4
        # j-side tangential/cross in the pair frame (gamma_t stacking)
        et = -(b1 * cos2 + b2 * sin2)
        ex = -(b2 * cos2 - b1 * sin2)
        flat = jnp.where(mask, binidx, nbins).reshape(-1)
        chans = jnp.stack([
            (wwm * pp).reshape(-1), (wwm * mm).reshape(-1),
            (wwm * et).reshape(-1), (wwm * ex).reshape(-1),
            wwm.reshape(-1), mask.reshape(-1).astype(jnp.float32)])
        # one-hot MXU reduction: 20x the sort-lowered segment_sum on TPU
        from .binred import masked_bin_reduce
        inc = masked_bin_reduce(chans, flat, nbins)
        y = inc - comp
        t = sums + y
        comp = (t - sums) - y
        return (t, comp), None

    pairs = [(a, b) for a in range(nbi) for b in range(nbj)
             if not triangular or a <= b]
    ab = jnp.asarray(pairs, jnp.int32)
    zero = jnp.zeros((6, nbins), jnp.float32)
    from ..utils.jax_compat import match_vma
    zero = match_vma(zero, xi_)  # shard_map scan carries need the vma
    (sums, _), _ = jax.lax.scan(tile, (zero, zero), (ab[:, 0], ab[:, 1]))
    return sums


def xi_pm_catalog(x, y, e1, e2, theta_edges, weights=None, boxsize=None,
                  block: int = 512):
    """Shear-shear correlation functions from an ellipticity catalog
    (the treecorr GG estimator, O(N^2) blocked tiles):

        xi_+(theta) = sum w w' Re[e conj(e')] / sum w w',
        xi_-(theta) = sum w w' Re[e e' e^{-4 i phi}] / sum w w'.

    Positions and theta_edges share one flat-sky unit (arcmin, deg,
    pixels — your choice); boxsize enables periodic minimum image for
    catalogs drawn from periodic maps. Pairs are counted once (i < j).
    O(N^2): grid onto a map and use xi_pm_flat_sky beyond ~10^5 objects.

    Returns (xip, xim, npairs) — (nbins,) arrays.
    """
    nbins = len(np.asarray(theta_edges)) - 1
    n = np.asarray(x).shape[0]
    x = _pad_to_block(jnp.asarray(x, jnp.float32), block)
    y = _pad_to_block(jnp.asarray(y, jnp.float32), block)
    e1 = _pad_to_block(jnp.asarray(e1, jnp.float32), block)
    e2 = _pad_to_block(jnp.asarray(e2, jnp.float32), block)
    w = (jnp.ones((n,), jnp.float32) if weights is None
         else jnp.asarray(weights, jnp.float32))
    w = _pad_to_block(w, block)  # zero fill -> padded rows drop out
    edges = jnp.asarray(theta_edges, jnp.float32)
    sums = _shear_pair_tiles(x, y, e1, e2, w, x, y, e1, e2, w, edges,
                             nbins, boxsize, block, True, triangular=True)
    ww = jnp.maximum(sums[4], 1e-30)
    return sums[0] / ww, sums[1] / ww, sums[5]


def gamma_t_catalog(lens_x, lens_y, src_x, src_y, e1, e2, theta_edges,
                    lens_weights=None, src_weights=None, boxsize=None,
                    block: int = 512):
    """Stacked tangential shear of a source catalog around a lens
    catalog (the treecorr NG / galaxy-galaxy-lensing estimator):

        gamma_t(theta) = sum w_l w_s e_t / sum w_l w_s,

    with e_t = -Re[e exp(-2 i phi)], phi the lens->source position
    angle; gamma_x likewise from the imaginary part (parity null).
    Returns (gamma_t, gamma_x, npairs) per theta bin.
    """
    nbins = len(np.asarray(theta_edges)) - 1
    nl = np.asarray(lens_x).shape[0]
    ns = np.asarray(src_x).shape[0]
    lx = _pad_to_block(jnp.asarray(lens_x, jnp.float32), block)
    ly = _pad_to_block(jnp.asarray(lens_y, jnp.float32), block)
    wl = (jnp.ones((nl,), jnp.float32) if lens_weights is None
          else jnp.asarray(lens_weights, jnp.float32))
    wl = _pad_to_block(wl, block)  # zero fill -> padded lens rows drop out
    sx = _pad_to_block(jnp.asarray(src_x, jnp.float32), block)
    sy = _pad_to_block(jnp.asarray(src_y, jnp.float32), block)
    se1 = _pad_to_block(jnp.asarray(e1, jnp.float32), block)
    se2 = _pad_to_block(jnp.asarray(e2, jnp.float32), block)
    ws = (jnp.ones((ns,), jnp.float32) if src_weights is None
          else jnp.asarray(src_weights, jnp.float32))
    ws = _pad_to_block(ws, block)  # zero fill
    zl = jnp.zeros_like(lx)
    edges = jnp.asarray(theta_edges, jnp.float32)
    sums = _shear_pair_tiles(lx, ly, zl, zl, wl, sx, sy, se1, se2, ws,
                             edges, nbins, boxsize, block, False)
    ww = jnp.maximum(sums[4], 1e-30)
    return sums[2] / ww, sums[3] / ww, sums[5]


# ----------------------------------------------------------------- COSEBIs

@lru_cache(maxsize=16)
def _linear_cosebis_tables(nmax: int, theta_min: float, theta_max: float,
                           ntheta: int):
    """Host float64 construction of the linear-COSEBIs filter pair.

    T_+n are polynomials of degree n+1 on x in [-1, 1] (theta mapped
    linearly), orthonormal under Int dx, subject to the two E/B
    separability constraints of Schneider, Eifler & Krause 2010 (A&A 520
    A116, eqs. 9-10):

        Int dtheta theta   T_+(theta) = 0,
        Int dtheta theta^3 T_+(theta) = 0.

    Built by constrained Gram-Schmidt in the Legendre basis with exact
    Gauss-Legendre integrals (f64 is ample for n <= ~12; the log-COSEBIs
    root-finding precision cliff does not arise for the linear family).
    T_-n follows from the finite-interval relation (loc. cit. eq. 12)

        T_-(t) = T_+(t) + Int_{tmin}^{t} ds s T_+(s)
                            [ 4/t^2 - 12 s^2 / t^4 ],

    evaluated by cumulative Gauss-Legendre panels on a dense theta grid.
    Returns (theta (ntheta,), Tp (nmax, ntheta), Tm (nmax, ntheta)) as
    float64 numpy arrays; theta in the same units as theta_min/max.
    """
    if nmax < 1:
        raise ValueError("nmax >= 1")
    if nmax > 12:
        raise ValueError(
            "linear COSEBIs are constructed in float64; beyond n ~ 12 "
            "the Gram-Schmidt loses orthogonality — raise only with a "
            "higher-precision construction")
    from numpy.polynomial import legendre as L

    tbar = 0.5 * (theta_max + theta_min)
    dt = 0.5 * (theta_max - theta_min)

    deg_max = nmax + 1
    # Gauss-Legendre nodes exact for polynomials up to degree 2*deg_max+6
    nn = 2 * deg_max + 8
    xg, wg = np.polynomial.legendre.leggauss(nn)
    theta_g = tbar + dt * xg

    def poly_vals(c):
        return L.legval(xg, c)

    def inner(c1, c2, weight=None):
        v = poly_vals(c1) * poly_vals(c2)
        if weight is not None:
            v = v * weight
        return float(np.sum(wg * v))

    w1 = theta_g            # constraint weights (Jacobian dt absorbed
    w3 = theta_g ** 3       # into the normalization-free constraints)

    basis = []
    for m in range(deg_max + 1):
        c = np.zeros(deg_max + 1)
        c[m] = 1.0
        basis.append(c)

    filters = []
    for nid in range(1, nmax + 1):
        deg = nid + 1
        # solve for coefficients a_0..a_deg in Legendre basis
        nc = deg + 1
        rows = []
        rhs = []
        # two separability constraints
        for wgt in (w1, w3):
            rows.append([float(np.sum(wg * L.legval(xg, basis[m]) * wgt))
                         for m in range(nc)])
            rhs.append(0.0)
        # orthogonality to previous filters
        for prev in filters:
            rows.append([inner(basis[m], prev[0]) for m in range(nc)])
            rhs.append(0.0)
        # fix the leading coefficient to pin the remaining dof, then
        # normalize afterwards
        lead = np.zeros(nc)
        lead[deg] = 1.0
        rows.append(list(lead))
        rhs.append(1.0)
        A = np.asarray(rows, np.float64)
        b = np.asarray(rhs, np.float64)
        coef, *_ = np.linalg.lstsq(A, b, rcond=None)
        cfull = np.zeros(deg_max + 1)
        cfull[:nc] = coef
        nrm = np.sqrt(inner(cfull, cfull))
        cfull /= nrm
        filters.append((cfull,))

    # dense theta grid for the T_- integral and the returned tables
    theta = np.linspace(theta_min, theta_max, ntheta)
    x = (theta - tbar) / dt
    Tp = np.stack([L.legval(x, f[0]) for f in filters])

    # T_-(t) = T_+(t) + Int_{tmin}^t ds s T_+(s) (4/t^2 - 12 s^2/t^4)
    # accumulate I1(t) = Int s T_+ ds and I3(t) = Int s^3 T_+ ds by
    # per-interval Gauss-Legendre (exact: integrands are polynomials)
    xg2, wg2 = np.polynomial.legendre.leggauss(deg_max + 4)
    Tm = np.empty_like(Tp)
    for i, f in enumerate(filters):
        I1 = np.zeros(ntheta)
        I3 = np.zeros(ntheta)
        acc1 = 0.0
        acc3 = 0.0
        for j in range(1, ntheta):
            a, b2 = theta[j - 1], theta[j]
            mid, half = 0.5 * (a + b2), 0.5 * (b2 - a)
            sg = mid + half * xg2
            tv = L.legval((sg - tbar) / dt, f[0])
            acc1 += half * np.sum(wg2 * sg * tv)
            acc3 += half * np.sum(wg2 * sg ** 3 * tv)
            I1[j] = acc1
            I3[j] = acc3
        Tm[i] = Tp[i] + 4.0 * I1 / theta ** 2 - 12.0 * I3 / theta ** 4
    return theta, Tp, Tm


def linear_cosebis_filters(nmax: int, theta_min: float, theta_max: float,
                           ntheta: int = 4096):
    """Public accessor for the (theta, T_+n, T_-n) linear-COSEBIs filter
    tables (float64 host arrays; see _linear_cosebis_tables)."""
    return _linear_cosebis_tables(int(nmax), float(theta_min),
                                  float(theta_max), int(ntheta))


def cosebis_from_xipm(theta, xip, xim, nmax: int, theta_min: float,
                      theta_max: float, ntheta: int = 4096):
    """COSEBIs E/B modes from measured correlation functions:

        E_n = 1/2 Int dtheta theta [ T_+n xi_+ + T_-n xi_- ],
        B_n = 1/2 Int dtheta theta [ T_+n xi_+ - T_-n xi_- ].

    xi_pm are linearly interpolated in log theta onto the filter grid
    (theta strictly inside [theta_min, theta_max] must be covered).
    Returns (E (nmax,), B (nmax,)) device arrays.
    """
    tg, Tp, Tm = _linear_cosebis_tables(int(nmax), float(theta_min),
                                        float(theta_max), int(ntheta))
    theta = np.asarray(theta, np.float64)
    if theta[0] > theta_min * (1 + 1e-9) or theta[-1] < theta_max * (1 - 1e-9):
        raise ValueError(
            f"xi_pm tables cover [{theta[0]:.4g}, {theta[-1]:.4g}] but the "
            f"COSEBIs interval is [{theta_min}, {theta_max}]")
    lt = jnp.asarray(np.log(theta), jnp.float32)
    ltg = jnp.asarray(np.log(tg), jnp.float32)
    xp = jnp.interp(ltg, lt, jnp.asarray(xip, jnp.float32))
    xm = jnp.interp(ltg, lt, jnp.asarray(xim, jnp.float32))
    w = jnp.asarray(_trap_weights(tg) * tg, jnp.float32)
    Tpj = jnp.asarray(Tp, jnp.float32)
    Tmj = jnp.asarray(Tm, jnp.float32)
    # HIGHEST precision: the B-mode null is a cancellation between the
    # two terms — the MXU's default bf16 truncation (CLAUDE.md) would
    # swamp it at ~1e-3 of E on TPU
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    tp_int = dot(Tpj, w * xp)
    tm_int = dot(Tmj, w * xm)
    e_n = 0.5 * (tp_int + tm_int)
    b_n = 0.5 * (tp_int - tm_int)
    return e_n, b_n


def _trap_weights(x):
    w = np.empty_like(x)
    w[1:-1] = 0.5 * (x[2:] - x[:-2])
    w[0] = 0.5 * (x[1] - x[0])
    w[-1] = 0.5 * (x[-1] - x[-2])
    return w


def cosebis_from_cl(ells, cl_e, nmax: int, theta_min: float,
                    theta_max: float, cl_b=None, ntheta: int = 4096,
                    n_fftlog: int = 2048):
    """Theory COSEBIs directly from power spectra, through the exact
    harmonic filters W_n(l) = Int dtheta theta T_+n(theta) J_0(l theta):

        E_n = (1/2pi) Int dl l C_EE(l) W_n(l)   (B_n likewise from C_BB).

    W_n is evaluated on host (f64 trapezoid over the dense filter table
    with scipy J0 — a one-off theory precompute). Cross-validates the
    xi_pm route in tests. Returns (E (nmax,), B (nmax,)) numpy arrays.
    """
    from scipy.special import jv

    tg, Tp, _ = _linear_cosebis_tables(int(nmax), float(theta_min),
                                       float(theta_max), int(ntheta))
    ells = np.asarray(ells, np.float64)
    wtheta = _trap_weights(tg) * tg
    # W (nmax, nell): sum_theta wtheta T_+n J0(l theta)
    j0 = jv(0, ells[None, :] * tg[:, None])  # (ntheta, nell)
    W = Tp @ (wtheta[:, None] * j0)
    wl = _trap_weights(ells) * ells
    e_n = (W * (wl * np.asarray(cl_e, np.float64))[None, :]).sum(1) / (
        2.0 * np.pi)
    if cl_b is None:
        b_n = np.zeros(int(nmax))
    else:
        b_n = (W * (wl * np.asarray(cl_b, np.float64))[None, :]).sum(1) / (
            2.0 * np.pi)
    return e_n, b_n
