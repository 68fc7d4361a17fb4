"""FFTLog spherical-Bessel (Hankel) transforms: P(k) <-> xi(r).

Closes the configuration-space side of the RSD loop the reference left
open (it measured s-mu correlation functions via halotools,
/root/reference/src/astrild/particles/hutils/tpcf.py:18-105, with no
theory curve to compare to): correlation-function multipoles from power
multipoles,

    xi_ell(s) = i^ell / (2 pi^2) Int k^2 P_ell(k) j_ell(k s) dk,

evaluated exactly for power-law-decomposed P via the FFTLog algorithm
(Hamilton 2000, arxiv:astro-ph/9905191): a log-spaced FFT, an analytic
Mellin kernel, and an inverse log-spaced FFT.

TPU split: the O(N) complex Mellin coefficients are host-precomputed
(scipy loggamma) and cached per (N, dlnk, ell, bias); the O(N log N)
FFTs run on device, so the transform is jit-able and vmaps over
multipoles/batches.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sph_bessel_transform", "xi_multipoles_from_pk", "wp_from_pk",
           "correlation_from_power", "bessel_transform"]


@lru_cache(maxsize=64)
def _fftlog_kernel(n: int, dlnk: float, ell: int, q: float):
    """Host-precomputed FFTLog frequency kernel M_ell(q + i eta_m) with
    the s-grid alignment phase baked in.

    M_ell(z) = Int_0^inf j_ell(x) x^{z-1} dx
             = 2^{z-2} sqrt(pi) Gamma((ell+z)/2) / Gamma((ell+3-z)/2).
    """
    from scipy.special import loggamma

    eta = 2.0 * np.pi * np.fft.fftfreq(n) / dlnk  # eta_m = 2 pi m/(N dlnk)
    z = q + 1j * eta
    logm = ((z - 2.0) * np.log(2.0) + 0.5 * np.log(np.pi)
            + loggamma((ell + z) / 2.0) - loggamma((ell + 3.0 - z) / 2.0))
    m = np.exp(logm)
    # s_j = e^{j dlnk}/k_max  ->  ln(k0 s_j) = (j - n + 1) dlnk; absorb the
    # (n-1) offset into the kernel phase
    phase = np.exp(1j * eta * (n - 1) * dlnk)
    mp = m * phase
    # ship as a REAL pair: the axon TPU backend rejects complex
    # host<->device transfers (UNIMPLEMENTED) while on-device complex
    # arithmetic is fine — recombine with lax.complex at use site.
    # Cache HOST arrays only (jnp constants cached during a caller's
    # trace leak trace-local tracers to later callers — the
    # _xi_pm_bins lesson)
    return (np.real(mp).astype(np.float32),
            np.imag(mp).astype(np.float32))


@lru_cache(maxsize=64)
def _fftlog_kernel_cyl(n: int, dlnk: float, mu: int, q: float):
    """Cylindrical-Bessel Mellin kernel with the r-grid phase baked in.

    M_mu(z) = Int_0^inf J_mu(x) x^{z-1} dx
            = 2^{z-1} Gamma((mu+z)/2) / Gamma((mu+2-z)/2),
    convergent for -mu < Re z < 3/2.
    """
    from scipy.special import loggamma

    if not (-mu < q < 1.5):
        raise ValueError(
            f"bessel_transform bias q={q} outside the Mellin strip "
            f"(-{mu}, 1.5) of J_{mu}")
    eta = 2.0 * np.pi * np.fft.fftfreq(n) / dlnk
    z = q + 1j * eta
    logm = ((z - 1.0) * np.log(2.0)
            + loggamma((mu + z) / 2.0) - loggamma((mu + 2.0 - z) / 2.0))
    m = np.exp(logm)
    phase = np.exp(1j * eta * (n - 1) * dlnk)
    mp = m * phase
    # host arrays only in the cache (see _fftlog_kernel)
    return (np.real(mp).astype(np.float32),
            np.imag(mp).astype(np.float32))


def bessel_transform(k, fk, mu: int, q: float = 1.0,
                     taper_frac: float = 0.1):
    """2D Hankel transform I(r) = Int_0^inf f(k) J_mu(k r) k dk on a
    log-spaced grid (FFTLog with the cylindrical-Bessel Mellin kernel).

    The flat-sky companion of sph_bessel_transform: xi_pm(theta) from
    C_ell (mu = 0 / 4), tangential shear gamma_t from C_{g kappa}
    (mu = 2), Delta Sigma(r_p) from P_gm (mu = 2). The reference had no
    configuration-space lensing statistics at all (its lenstools stack
    stops at C_ell, angular_power_spectrum.py:38-53).

    Args:
      k: (n,) log-uniform grid (ascending) — wavenumbers or multipoles.
      fk: (n,) or (..., n) integrand f(k).
      mu: Bessel order J_mu.
      q: FFTLog bias, must lie in the Mellin strip (-mu, 1.5).
    Returns:
      (r, I): r (n,) log-spaced in [1/k_max, 1/k_min]; I same shape as fk.
    """
    import jax.core as _core
    if isinstance(k, _core.Tracer):
        raise TypeError(
            "bessel_transform needs a CONCRETE (host) k grid (see "
            "sph_bessel_transform's note: under jit, jnp constants are "
            "lifted to tracers — build the grid with numpy)")
    k = np.asarray(k, np.float64)
    n = k.shape[0]
    dln = float(np.log(k[-1] / k[0]) / (n - 1))
    if not np.allclose(np.diff(np.log(k)), dln, rtol=1e-4):
        raise ValueError("bessel_transform needs log-uniform k")
    k0 = float(k[0])
    kern_re, kern_im = _fftlog_kernel_cyl(n, dln, mu, q)
    w = _taper(n, taper_frac)
    j = np.arange(n)
    r = np.exp(j * dln) / (k0 * np.exp((n - 1) * dln))
    # k dk = k^2 dlnk: biased series a = f(k) (k/k0)^{2-q},
    # I_j = k0^2 (k0 r_j)^{-q} Re FFT(A_m M_m)[j] / N
    bias = jnp.asarray((k / k0) ** (2.0 - q) * w)
    scale = jnp.asarray(k0 ** 2 * (k0 * r) ** (-q) / n)

    def _one(f):
        a = f * bias
        am = jnp.fft.fft(a)
        ar, ai = jnp.real(am), jnp.imag(am)
        b = jax.lax.complex(ar * kern_re - ai * kern_im,
                            ar * kern_im + ai * kern_re)
        return jnp.real(jnp.fft.fft(b)) * scale

    fk = jnp.asarray(fk)
    out = _one(fk) if fk.ndim == 1 else jax.vmap(_one)(
        fk.reshape(-1, n)).reshape(fk.shape)
    return jnp.asarray(r), out


def _taper(n: int, frac: float = 0.1):
    """Cosine end-taper reducing log-periodic ringing from the implicit
    periodicity of the FFT decomposition."""
    m = max(int(n * frac), 1)
    w = np.ones(n)
    x = 0.5 * (1.0 - np.cos(np.pi * np.arange(m) / m))
    w[:m] = x
    w[n - m:] = x[::-1]
    return jnp.asarray(w)


def sph_bessel_transform(k, fk, ell: int, q: float = 1.5,
                         taper_frac: float = 0.1):
    """I(s) = Int_0^inf f(k) j_ell(k s) k^2 dk on a log-spaced k grid.

    Args:
      k: (n,) log-uniformly spaced wavenumbers (ascending).
      fk: (n,) or (..., n) integrand values f(k).
      ell: spherical-Bessel order.
      q: FFTLog bias exponent (1.5 is a good default for P(k)-like
        integrands: it balances the k->0 and k->inf power-law tails).
    Returns:
      (s, I): s (n,) log-spaced in [1/k_max, 1/k_min]; I same shape as fk.
    """
    import jax.core as _core
    if isinstance(k, _core.Tracer):
        raise TypeError(
            "sph_bessel_transform needs a CONCRETE (host) k grid — the "
            "Mellin kernel is a host precompute keyed on the grid. "
            "Under jit, jnp.asarray(np_array) is lifted to a tracer: "
            "build the grid with numpy and pass it through unconverted "
            "(only the integrand values may be traced)")
    k = np.asarray(k, np.float64)
    n = k.shape[0]
    dln = float(np.log(k[-1] / k[0]) / (n - 1))
    if not np.allclose(np.diff(np.log(k)), dln, rtol=1e-4):
        raise ValueError("sph_bessel_transform needs log-uniform k")
    k0 = float(k[0])
    kern_re, kern_im = _fftlog_kernel(n, dln, ell, q)
    w = _taper(n, taper_frac)
    j = np.arange(n)
    s = np.exp(j * dln) / (k0 * np.exp((n - 1) * dln))  # 1/kmax .. 1/kmin
    # biased series a = f(k) (k/k0)^{3-q}; I_j = k0^3 (k0 s_j)^{-q} *
    #   Re FFT(A_m M_m)[j] / N
    bias = jnp.asarray((k / k0) ** (3.0 - q) * w)
    scale = jnp.asarray(k0 ** 3 * (k0 * s) ** (-q) / n)

    def _one(f):
        a = f * bias
        am = jnp.fft.fft(a)
        ar, ai = jnp.real(am), jnp.imag(am)
        b = jax.lax.complex(ar * kern_re - ai * kern_im,
                            ar * kern_im + ai * kern_re)
        return jnp.real(jnp.fft.fft(b)) * scale

    fk = jnp.asarray(fk)
    out = _one(fk) if fk.ndim == 1 else jax.vmap(_one)(
        fk.reshape(-1, n)).reshape(fk.shape)
    return jnp.asarray(s), out


def xi_multipoles_from_pk(k, p_ells, ells=(0, 2, 4), q: float = 1.5):
    """Correlation multipoles xi_ell(s) from power multipoles P_ell(k).

    xi_ell(s) = i^ell/(2 pi^2) Int k^2 P_ell(k) j_ell(ks) dk; for the even
    ells of an auto-spectrum i^ell = (-1)^{ell/2}.

    p_ells: (nell, n) stacked multipoles in the order of `ells` (e.g.
    ops.power.MultipoleResult.p_ell interpolated onto a log-k grid).
    Returns (s, xi) with xi (nell, n).
    """
    rows = []
    s = None
    for i, ell in enumerate(ells):
        if ell % 2:
            raise ValueError(
                f"xi_multipoles_from_pk handles even ell only (got {ell}):"
                " odd multipoles carry an imaginary i^ell prefactor")
        sign = (-1.0) ** (ell // 2)
        s, ir = sph_bessel_transform(k, jnp.asarray(p_ells[i]), ell, q=q)
        rows.append(sign / (2.0 * jnp.pi ** 2) * ir)
    return s, jnp.stack(rows)


def correlation_from_power(k, pk, q: float = 1.5):
    """Real-space xi(r) from P(k): the ell=0 case."""
    s, xi = xi_multipoles_from_pk(k, jnp.asarray(pk)[None, :], ells=(0,),
                                  q=q)
    return s, xi[0]


def wp_from_pk(k, pk, rp, pi_max, q: float = 1.5, n_pi: int = 256):
    """Theory projected correlation wp(rp) = 2 int_0^pi_max
    xi(sqrt(rp^2 + pi^2)) dpi from a tabulated P(k).

    The theory counterpart of ops.tpcf.projected_tpcf (same finite
    pi_max convention — as pi_max -> inf this approaches the J0-Hankel
    identity wp = int k P(k) J0(k rp) dk / 2pi). xi comes from the
    FFTLog transform above; the pi integral is a trapezoid over the
    interpolated xi.

    Args:
      k, pk: log-spaced P(k) table (h/Mpc, (Mpc/h)^3).
      rp: (nrp,) projected radii.
      pi_max: LOS integration bound [Mpc/h].
    Returns (nrp,) wp.
    """
    s, xi = correlation_from_power(k, pk, q=q)
    lns = jnp.log(s)
    pi_grid = jnp.linspace(0.0, pi_max, n_pi + 1)
    rp = jnp.asarray(rp)

    def one(rpv):
        r = jnp.sqrt(rpv ** 2 + pi_grid ** 2)
        xi_r = jnp.interp(jnp.log(jnp.maximum(r, s[0])), lns, xi)
        return 2.0 * jnp.trapezoid(xi_r, pi_grid)

    return jax.vmap(one)(rp)
