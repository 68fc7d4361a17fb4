"""Spherical harmonic transforms on HEALPix RING maps, TPU-native.

Replaces the healpy sphtfunc calls the reference leans on
(sky_healpix.py:219-241 `hp.sphtfunc.synfast`, and the anafast half of its
Cl workflow) without healpy: normalized associated Legendre tables are
precomputed host-side with the exact float64 three-term recursion, and the
device work is two MXU-friendly einsums per transform —

  synthesis:  c[m,r]   = sum_l  a[l,m] * lambda[l,m](theta_r)      (matmul)
              map[r,p] = c0 + sum_{m>0} 2 Re(c[m,r] e^{im phi_rp}) (matmul)
  analysis:   the adjoint with 4pi/npix quadrature weights, optionally
              Jacobi-iterated (healpy's `iter`) to undo the inexact
              HEALPix quadrature.

Rings are the natural vector axis (nring = 4*nside - 1 << npix); ragged
ring lengths are padded to 4*nside with a mask, and the padded (ring, p)
plane maps to RING pixel order with one host-precomputed gather.

Scaling note: the lambda table is O(lmax^2 * nring) floats — fine through
lmax ~ 512; beyond that, chunk the m axis (tables and einsums are
block-diagonal in m) rather than materializing everything at once.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import healpix as hpx

__all__ = ["RingGeometry", "ring_geometry", "legendre_table", "SHTTables",
           "sht_tables", "synthesize", "analyze", "alm2cl", "synfast",
           "anafast", "smoothing", "anafast_masked",
           "coupling_matrix_from_mask_cl", "anafast_master"]


class RingGeometry(NamedTuple):
    theta: np.ndarray      # (nring,) colatitude of each iso-latitude ring
    phi_pad: np.ndarray    # (nring, pmax) pixel longitudes, zero-padded
    mask: np.ndarray       # (nring, pmax) 1.0 where a real pixel exists
    flat_idx: np.ndarray   # (npix,) RING pixel -> index into padded plane


@lru_cache(maxsize=8)
def ring_geometry(nside: int) -> RingGeometry:
    """Ring structure of the RING scheme, derived from exact ring sizes
    ([4i]_{i<nside} + [4 nside]*(2 nside + 1) + mirrored caps) and this
    package's own pix2ang (utils/healpix.py)."""
    sizes = ([4 * i for i in range(1, nside)]
             + [4 * nside] * (2 * nside + 1)
             + [4 * i for i in range(nside - 1, 0, -1)])
    npix = hpx.nside2npix(nside)
    assert sum(sizes) == npix
    theta_all, phi_all = (np.asarray(a, np.float64) for a in
                          hpx.pix2ang_ring(nside, jnp.arange(npix)))
    nring = len(sizes)
    pmax = 4 * nside
    theta = np.zeros(nring)
    phi_pad = np.zeros((nring, pmax))
    mask = np.zeros((nring, pmax))
    flat_idx = np.zeros(npix, np.int64)
    start = 0
    for r, n in enumerate(sizes):
        theta[r] = theta_all[start]
        phi_pad[r, :n] = phi_all[start:start + n]
        mask[r, :n] = 1.0
        flat_idx[start:start + n] = r * pmax + np.arange(n)
        start += n
    return RingGeometry(theta, phi_pad, mask, flat_idx)


def legendre_table(lmax: int, costheta: np.ndarray) -> np.ndarray:
    """Normalized associated Legendre lambda_lm(theta) with the
    spherical-harmonic norm (Y_lm = lambda_lm e^{im phi}, Condon-Shortley),
    shape (lmax+1, lmax+1, ntheta) indexed [l, m, theta]; zero for m > l.

    Exact float64 recursion (the one healpy/libsharp use):
      lambda_00 = 1/sqrt(4 pi)
      lambda_mm = -sqrt((2m+1)/(2m)) sin(theta) lambda_{m-1,m-1}
      lambda_{m+1,m} = sqrt(2m+3) cos(theta) lambda_mm
      lambda_lm = a_lm (x lambda_{l-1,m} - b_lm lambda_{l-2,m})
        a_lm = sqrt((4l^2-1)/(l^2-m^2)), b_lm = sqrt(((l-1)^2-m^2)/(4(l-1)^2-1))
    """
    x = np.asarray(costheta, np.float64)
    s = np.sqrt(np.maximum(0.0, 1.0 - x * x))
    L = lmax
    lam = np.zeros((L + 1, L + 1, x.size))
    lam[0, 0] = 1.0 / np.sqrt(4.0 * np.pi)
    for l in range(1, L + 1):
        lam[l, l] = -np.sqrt((2.0 * l + 1.0) / (2.0 * l)) * s * lam[l - 1, l - 1]
        lam[l, l - 1] = np.sqrt(2.0 * l + 1.0) * x * lam[l - 1, l - 1]
        if l >= 2:
            m = np.arange(0, l - 1, dtype=np.float64)
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m)
                        / (4.0 * (l - 1.0) ** 2 - 1.0))
            lam[l, : l - 1] = a[:, None] * (
                x[None, :] * lam[l - 1, : l - 1] - b[:, None] * lam[l - 2, : l - 1])
    return lam


class SHTTables(NamedTuple):
    """Device-resident transform tables; pass as jit ARGUMENTS (big closure
    constants serialize into the HLO upload — see CLAUDE.md perf notes)."""
    lam: jnp.ndarray       # (L+1, L+1, nring) float32
    cosmphi: jnp.ndarray   # (L+1, nring, pmax) cos(m phi), mask folded in
    sinmphi: jnp.ndarray   # (L+1, nring, pmax)
    flat_idx: jnp.ndarray  # (npix,)
    pad_idx: jnp.ndarray   # (nring*pmax,) inverse gather, 0 where padding
    pad_valid: jnp.ndarray # (nring*pmax,) 1.0 at real pixels


@lru_cache(maxsize=8)
def sht_tables(nside: int, lmax: int) -> SHTTables:
    geo = ring_geometry(nside)
    lam = legendre_table(lmax, np.cos(geo.theta))
    m = np.arange(lmax + 1, dtype=np.float64)
    ang = m[:, None, None] * geo.phi_pad[None, :, :]
    cosm = np.cos(ang) * geo.mask[None]
    sinm = np.sin(ang) * geo.mask[None]
    nring, pmax = geo.phi_pad.shape
    pad_idx = np.zeros(nring * pmax, np.int64)
    pad_valid = np.zeros(nring * pmax, np.float32)
    pad_idx[geo.flat_idx] = np.arange(geo.flat_idx.size)
    pad_valid[geo.flat_idx] = 1.0
    dev = jax.device_put
    return SHTTables(dev(jnp.asarray(lam, jnp.float32)),
                     dev(jnp.asarray(cosm, jnp.float32)),
                     dev(jnp.asarray(sinm, jnp.float32)),
                     dev(jnp.asarray(geo.flat_idx)),
                     dev(jnp.asarray(pad_idx)),
                     dev(jnp.asarray(pad_valid)))


@jax.jit
def _synth_impl(alm_re, alm_im, tab: SHTTables):
    c_re = jnp.einsum("lmr,lm->mr", tab.lam, alm_re)
    c_im = jnp.einsum("lmr,lm->mr", tab.lam, alm_im)
    w = jnp.where(jnp.arange(alm_re.shape[1]) == 0, 1.0, 2.0)
    map_pad = (jnp.einsum("mr,mrp->rp", w[:, None] * c_re, tab.cosmphi)
               - jnp.einsum("mr,mrp->rp", w[:, None] * c_im, tab.sinmphi))
    return map_pad.reshape(-1)[tab.flat_idx]


def synthesize(alm_re, alm_im, nside: int, lmax: int,
               tables: Optional[SHTTables] = None):
    """Real-field SH synthesis: (lmax+1, lmax+1) [l, m] alm -> RING map.

    alm for m>0 represent a_lm with a_{l,-m} = (-1)^m conj(a_lm) implied
    (real field); a_{l0} must have alm_im[:, 0] == 0.
    """
    tab = tables if tables is not None else sht_tables(nside, lmax)
    return _synth_impl(jnp.asarray(alm_re, jnp.float32),
                       jnp.asarray(alm_im, jnp.float32), tab)


@partial(jax.jit, static_argnames=("npix",))
def _adjoint_impl(hpmap, tab: SHTTables, npix: int):
    pad = (hpmap[tab.pad_idx] * tab.pad_valid).reshape(tab.cosmphi.shape[1:])
    d_re = jnp.einsum("rp,mrp->mr", pad, tab.cosmphi)
    d_im = -jnp.einsum("rp,mrp->mr", pad, tab.sinmphi)
    wq = 4.0 * jnp.pi / npix
    return (wq * jnp.einsum("lmr,mr->lm", tab.lam, d_re),
            wq * jnp.einsum("lmr,mr->lm", tab.lam, d_im))


def analyze(hpmap, nside: int, lmax: int, niter: int = 3,
            tables: Optional[SHTTables] = None):
    """Real-field SH analysis: RING map -> (alm_re, alm_im), [l, m] layout.

    niter Jacobi iterations refine the approximate HEALPix quadrature
    (healpy's map2alm `iter`): alm += A(map - S(alm)).
    """
    tab = tables if tables is not None else sht_tables(nside, lmax)
    hpmap = jnp.asarray(hpmap, jnp.float32)
    npix = hpmap.shape[0]
    a_re, a_im = _adjoint_impl(hpmap, tab, npix)
    for _ in range(niter):
        resid = hpmap - _synth_impl(a_re, a_im, tab)
        d_re, d_im = _adjoint_impl(resid, tab, npix)
        a_re, a_im = a_re + d_re, a_im + d_im
    return a_re, a_im


def alm2cl(alm_re, alm_im):
    """Cl = (|a_l0|^2 + 2 sum_{m>0} |a_lm|^2) / (2l+1)."""
    L = alm_re.shape[0] - 1
    p = alm_re ** 2 + alm_im ** 2
    w = jnp.where(jnp.arange(L + 1) == 0, 1.0, 2.0)
    # zero the (structurally absent) m > l entries
    lgrid = jnp.arange(L + 1)[:, None]
    mgrid = jnp.arange(L + 1)[None, :]
    p = jnp.where(mgrid <= lgrid, p, 0.0)
    return jnp.sum(p * w[None, :], axis=1) / (2.0 * jnp.arange(L + 1) + 1.0)


def cl_to_lmax(cl, lmax: int):
    """Truncate or ZERO-PAD a Cl table to length lmax+1 — healpy synfast
    semantics (an explicit lmax beyond the table means zero power there;
    a bare cl[:lmax+1] instead left a short table that crashed deep in
    the synthesis with an opaque broadcast error)."""
    if cl.shape[0] >= lmax + 1:
        return cl[: lmax + 1]
    return jnp.pad(cl, (0, lmax + 1 - cl.shape[0]))


def synfast(key, cl, nside: int, lmax: Optional[int] = None,
            tables: Optional[SHTTables] = None):
    """Gaussian random RING map with angular spectrum cl[l]
    (hp.sphtfunc.synfast parity — sky_healpix.py:241)."""
    cl = jnp.asarray(cl, jnp.float32)
    L = (cl.shape[0] - 1) if lmax is None else lmax
    cl = cl_to_lmax(cl, L)
    k1, k2 = jax.random.split(key)
    lgrid = jnp.arange(L + 1)[:, None]
    mgrid = jnp.arange(L + 1)[None, :]
    valid = (mgrid <= lgrid).astype(jnp.float32)
    sig = jnp.sqrt(jnp.maximum(cl, 0.0))[:, None]
    half = jnp.sqrt(0.5)
    a_re = jax.random.normal(k1, (L + 1, L + 1)) * sig * valid
    a_im = jax.random.normal(k2, (L + 1, L + 1)) * sig * valid
    # m = 0 row is real with full variance Cl; m > 0 split Cl/2 per part
    a_re = jnp.where(mgrid == 0, a_re, a_re * half)
    a_im = jnp.where(mgrid == 0, 0.0, a_im * half)
    return synthesize(a_re, a_im, nside, L, tables=tables)


def anafast(hpmap, lmax: int, niter: int = 3,
            tables: Optional[SHTTables] = None):
    """Cl of a RING map (hp.sphtfunc.anafast parity)."""
    hpmap = jnp.asarray(hpmap, jnp.float32)
    nside = hpx.npix2nside(hpmap.shape[0])
    a_re, a_im = analyze(hpmap, nside, lmax, niter=niter, tables=tables)
    return alm2cl(a_re, a_im)


def smoothing(hpmap, fwhm_rad: float, lmax: int, niter: int = 3,
              tables: Optional[SHTTables] = None):
    """Gaussian-beam smoothing in harmonic space (healpy
    sphtfunc.smoothing parity — referenced at healpytools.py:11):
    a_lm -> a_lm exp(-l(l+1) sigma^2 / 2), sigma = fwhm / sqrt(8 ln 2)."""
    hpmap = jnp.asarray(hpmap, jnp.float32)
    nside = hpx.npix2nside(hpmap.shape[0])
    tab = tables if tables is not None else sht_tables(nside, lmax)
    a_re, a_im = analyze(hpmap, nside, lmax, niter=niter, tables=tab)
    sigma = fwhm_rad / np.sqrt(8.0 * np.log(2.0))
    ell = jnp.arange(lmax + 1, dtype=jnp.float32)
    bl = jnp.exp(-0.5 * ell * (ell + 1.0) * sigma ** 2)[:, None]
    return synthesize(a_re * bl, a_im * bl, nside, lmax, tables=tab)


def anafast_masked(hpmap, mask, lmax: int, niter: int = 3,
                   tables: Optional[SHTTables] = None):
    """f_sky-corrected pseudo-Cl of a masked map: Cl(map*mask)/<mask^2>.

    The functional replacement for the reference's sky_namaster.py intent
    (its pymaster calls are commented out); exact mode decoupling is not
    attempted — the <w^2> normalization is unbiased for spectra smooth on
    the mask's coupling scale (same estimator as the flat-sky
    ops/angular_power.cl_flat_sky_masked)."""
    mask = jnp.asarray(mask, jnp.float32)
    w2 = jnp.mean(mask ** 2)
    cl = anafast(jnp.asarray(hpmap, jnp.float32) * mask, lmax, niter=niter,
                 tables=tables)
    return cl / jnp.maximum(w2, 1e-12)


def coupling_matrix_from_mask_cl(mask_cl, lmax: int):
    """Full-sky MASTER mode-coupling matrix M_ll' from the mask spectrum.

    Hivon et al. (2002) eq. A31:

        M_l1l2 = (2 l2 + 1)/(4 pi) sum_l3 (2 l3 + 1) W_l3 wigner3j(l1,
                 l2, l3; 0,0,0)^2

    evaluated WITHOUT Wigner symbols through the Legendre-product
    identity int P_l1 P_l2 P_l3 dmu = 2 * 3j(000)^2:

        M_l1l2 = (2 l2 + 1)/2 * int dmu P_l1(mu) P_l2(mu) xi_W(mu),
        xi_W(mu) = sum_l3 (2 l3 + 1)/(4 pi) W_l3 P_l3(mu)

    with Gauss-Legendre quadrature of enough nodes to be EXACT for the
    polynomial integrand (degree 2*lmax + len(mask_cl)). mask_cl should
    extend to 2*lmax when possible (coupling between l1, l2 <= lmax
    involves mask power to l1+l2); shorter tables truncate the sum like
    every MASTER code.

    Computed host-side in float64 and returned as numpy: steep spectra
    make the decoupling numerically unforgiving — float32 noise in M
    couples the dominant low-ell power into high ells at large relative
    levels. A per-mask precompute, so the host cost is paid once.
    """
    wl = np.asarray(mask_cl, np.float64)
    lmax_w = wl.shape[0] - 1
    deg = 2 * lmax + lmax_w
    ngl = deg // 2 + 2
    mu, gw = np.polynomial.legendre.leggauss(ngl)
    # P_l(mu) rows by recurrence, float64 on host (values in [-1, 1])
    lmax_tab = max(lmax, lmax_w)
    P = np.zeros((lmax_tab + 1, ngl))
    P[0] = 1.0
    if lmax_tab >= 1:
        P[1] = mu
    for ell in range(2, lmax_tab + 1):
        P[ell] = ((2 * ell - 1) * mu * P[ell - 1]
                  - (ell - 1) * P[ell - 2]) / ell
    l3 = np.arange(lmax_w + 1)
    xi = ((2 * l3 + 1) / (4 * np.pi) * wl) @ P[: lmax_w + 1]   # (ngl,)
    Pl = P[: lmax + 1]
    core = (Pl * (gw * xi)[None, :]) @ Pl.T
    l2 = np.arange(lmax + 1, dtype=np.float64)
    return core * (2.0 * l2 + 1.0)[None, :] / 2.0


def shape_binned_interp(ell_values, member, counts,
                        what: str = "multipoles") -> np.ndarray:
    """(nbins, N) in-band l(l+1) shape-model interpolation operator q.

    THE single home of the MASTER band-power shape model, shared by the
    full-sky (anafast_master) and flat-sky
    (angular_power.flat_sky_coupling_matrix) estimators: within band b
    the spectrum is modeled as C = c_b * s * N_b / sum_b(s) with
    s = 1/(l(l+1)), so the band power c_b stays the PLAIN band average
    of C while steep in-band variation does not bias the decoupling
    solve (NaMaster's convention). Host float64 throughout (precision
    note in coupling_matrix_from_mask_cl).

    ell_values: (N,) per-element multipole values; member: (nbins, N)
    0/1 band membership; counts: (nbins,) members per band. Raises on
    an empty band — a singular banded system otherwise surfaces as an
    opaque LinAlgError from the downstream solve.
    """
    member = np.asarray(member, np.float64)
    counts = np.asarray(counts, np.float64)
    empty = np.nonzero(counts <= 0)[0]
    if empty.size:
        raise ValueError(
            f"MASTER binning: band(s) {empty.tolist()} contain no "
            f"{what} — reduce nbins (each of the {counts.shape[0]} "
            "bands must contain at least one) or widen the range")
    v = np.asarray(ell_values, np.float64)
    s = 1.0 / np.maximum(v * (v + 1.0), 1.0)
    ssum = member @ s
    return member * s[None, :] * (counts / np.maximum(ssum, 1e-300))[:, None]


def _bin_operator(lmax: int, nbins: int, lmin: int = 2) -> np.ndarray:
    """(nbins, lmax+1) flat band-power binning matrix over [lmin, lmax]."""
    edges = np.linspace(lmin, lmax + 1, nbins + 1)
    B = np.zeros((nbins, lmax + 1))
    ells = np.arange(lmax + 1)
    for b in range(nbins):
        sel = (ells >= edges[b]) & (ells < edges[b + 1])
        if sel.sum():
            B[b, sel] = 1.0 / sel.sum()
    return B


def anafast_master(hpmap, mask, lmax: int, nbins: int = 16,
                   niter: int = 3, lmin: int = 2,
                   lmax_mask: Optional[int] = None,
                   tables: Optional[SHTTables] = None,
                   mask_tables: Optional[SHTTables] = None,
                   coupling=None):
    """Mask-decoupled full-sky spectrum: binned MASTER estimator.

    The actual mode-decoupling the reference's SkyNamaster intended
    (sky_namaster.py:75-95): measure the pseudo-Cl of map*mask, build
    M_ll' from the mask's own spectrum, bin both into band powers, and
    solve the binned system. Unlike anafast_masked's <w^2> division this
    is unbiased for steep spectra under aggressive masks.

    For many maps under one mask, precompute `coupling =
    coupling_matrix_from_mask_cl(mask_cl, lmax)` once and pass it in
    (mask anafast + quadrature build are the dominant cost).

    Beyond lmax ~ 512 the analyses route through the table-free
    ops/sht_large path automatically (the Legendre table is O(lmax^2 *
    nring) — multi-GB at nside >= 512).

    Returns (ell_eff, cl_hat) with ell_eff the band centers.
    """
    hpmap = jnp.asarray(hpmap, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    nside = hpx.npix2nside(hpmap.shape[0])
    if lmax_mask is None:
        lmax_mask = min(2 * lmax, 2 * nside)

    def _ana(m, L, tab):
        if L <= 512:
            return anafast(m, L, niter=niter, tables=tab)
        from . import sht_large

        return sht_large.anafast_large(m, L, niter=niter)

    pcl = _ana(hpmap * mask, lmax, tables)
    if coupling is None:
        wl = _ana(mask, lmax_mask, mask_tables)
        M = coupling_matrix_from_mask_cl(np.asarray(wl), lmax)
    else:
        M = np.asarray(coupling, np.float64)
    B, Q, ell_eff = _binned_shape_ops(lmax, nbins, lmin)
    Mb = B @ M @ Q
    pb = B @ np.asarray(pcl, np.float64)
    cl_hat = np.linalg.solve(Mb, pb)
    return ell_eff, jnp.asarray(cl_hat, jnp.float32)


def _binned_shape_ops(lmax: int, nbins: int, lmin: int):
    """(B, Q, ell_eff) — ONE home of the MASTER band machinery shared by
    the scalar (anafast_master) and spin-2 (sht_spin.anafast_spin2_master)
    full-sky estimators: the binning operator, the l(l+1) in-band
    shape-model columns (shape_binned_interp raises a clear error on
    empty bands, e.g. nbins > lmax - lmin + 1), and the band centers."""
    B = _bin_operator(lmax, nbins, lmin=lmin)
    ells_f = np.arange(lmax + 1, dtype=np.float64)
    sel = (B > 0).astype(np.float64)                      # (nbins, lmax+1)
    Q = shape_binned_interp(ells_f, sel, sel.sum(1),
                            what=f"multipoles in [{lmin}, {lmax}]").T
    ell_eff = jnp.asarray(B @ np.arange(lmax + 1), jnp.float32)
    return B, Q, ell_eff
