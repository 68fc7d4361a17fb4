"""Spin-2 spherical-harmonic transforms: full-sky shear E/B synthesis
and analysis (healpy alm2map_spin / map2alm_spin parity).

The reference's full-sky pipeline (SkyHealpix on healpy,
/root/reference/src/astrild/rays/skys/sky_healpix.py) was scalar-only:
full-sky shear tomography needs gamma <-> E/B, which healpy provides via
alm2map_spin and the reference never exposed. This module adds the spin-2
channel on the same table architecture as ops/sht.py.

Spin-weighted harmonics are built from Wigner small-d functions with the
convention pinned NUMERICALLY to this package's scalar transforms:

    lambda_lm(theta) = sqrt((2l+1)/4pi) d^l_{0,m}(theta)   (verified
    exactly against ops.sht.legendre_table), hence

    sY_lm(theta,phi) = sqrt((2l+1)/4pi) d^l_{-s,m}(theta) e^{im phi}

with the standard d-matrix (d^2_{2,2} = ((1+x)/2)^2, d^2_{2,0} =
sqrt(6)/4 sin^2, d^2_{2,1} = -(1+x)/2 sin — all verified in
tests/test_sht_spin.py). The d^l_{±2,m} columns follow the stable
three-term l-recursion seeded at l0 = max(2, m) in float64 on the host.

Synthesis follows the healpy spin-2 sign convention:

    Q + iU = -sum_lm (E_lm + i B_lm) 2Y_lm

(for shear maps read gamma1 = Q, gamma2 = U). The analysis adjoint is the
EXACT transpose of the synthesis — obtained via jax.vjp of the jitted
synthesis, so no hand-derived index gymnastics can drift — refined with
the same Jacobi iterations as the scalar path. Physical validation: the
gamma field synthesized from E_lm = sqrt((l+2)(l-1)/(l(l+1))) kappa_lm
matches the flat-sky Kaiser-Squires inverse of the kappa patch in the
small-patch limit (tests/test_sht_spin.py::test_kappa_gamma_consistency).
"""
from __future__ import annotations

from functools import lru_cache, partial
from math import lgamma
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import healpix as hpx
from .sht import alm2cl, ring_geometry

__all__ = ["Spin2Tables", "spin2_tables", "wigner_d_column",
           "synthesize_spin2", "analyze_spin2", "anafast_spin2",
           "synfast_spin2", "kappa_alm_to_shear_alm",
           "spin2_coupling_matrices_from_mask_cl", "anafast_spin2_master",
           "Spin1Tables", "spin1_tables", "synthesize_spin1",
           "analyze_spin1", "deflection_from_kappa_alm",
           "kappa_omega_alm_from_deflection"]


def wigner_d_column(lmax: int, costheta: np.ndarray, m1: int) -> np.ndarray:
    """Wigner d^l_{m1, m}(beta) for all l <= lmax, 0 <= m <= l.

    Standard convention (verified: d^l_{0,m} reproduces the normalized
    Legendre table; d^2_{2,m} matches the closed forms). Stable upward
    three-term recursion in l, float64; shape (lmax+1, lmax+1, ntheta).
    """
    x = np.asarray(costheta, np.float64)
    nt = x.size
    ch = np.sqrt((1.0 + x) / 2.0)
    sh = np.sqrt((1.0 - x) / 2.0)
    L = lmax
    out = np.zeros((L + 1, L + 1, nt))
    for m in range(0, L + 1):
        l0 = max(abs(m1), m)
        if l0 > L:
            break
        if l0 == 0:
            d0 = np.ones(nt)
        elif m >= abs(m1):      # seed at j = m
            lnC = 0.5 * (lgamma(2 * m + 1) - lgamma(m + m1 + 1)
                         - lgamma(m - m1 + 1))
            d0 = ((-1.0) ** (m - m1) * np.exp(lnC)
                  * ch ** (m + m1) * sh ** (m - m1))
        elif m1 > 0:            # seed at j = m1 > m
            j = m1
            lnC = 0.5 * (lgamma(2 * j + 1) - lgamma(j + m + 1)
                         - lgamma(j - m + 1))
            d0 = np.exp(lnC) * ch ** (j + m) * (-sh) ** (j - m)
        else:                   # seed at j = -m1 > m
            j = -m1
            lnC = 0.5 * (lgamma(2 * j + 1) - lgamma(j + m + 1)
                         - lgamma(j - m + 1))
            d0 = np.exp(lnC) * ch ** (j - m) * sh ** (j + m)
        out[l0, m] = d0
        dm1, dm2 = d0, np.zeros(nt)
        for l in range(l0 + 1, L + 1):
            if l == 1 and l0 == 0:
                d = x.copy()    # d^1_{0,0}; recursion 0/0 at l-1 = 0
            else:
                den = (l - 1.0) * np.sqrt(
                    (l * l - m1 * m1) * (l * l - m * m))
                a = (2.0 * l - 1.0) * (l * (l - 1.0) * x - m1 * m) / den
                b = (l * np.sqrt(((l - 1.0) ** 2 - m1 * m1)
                                 * ((l - 1.0) ** 2 - m * m)) / den)
                d = a * dm1 - b * dm2
            out[l, m] = d
            dm2, dm1 = dm1, d
    return out


class Spin2Tables(NamedTuple):
    """Device tables for the spin-2 channel (reuses scalar ring phases)."""
    lam_p: jnp.ndarray     # (L+1, L+1, nring)  2lambda_lm
    lam_m2: jnp.ndarray    # (L+1, L+1, nring)  (-1)^m * -2lambda_lm
    cosmphi: jnp.ndarray
    sinmphi: jnp.ndarray
    flat_idx: jnp.ndarray
    pad_idx: jnp.ndarray
    pad_valid: jnp.ndarray


@lru_cache(maxsize=4)
def spin2_tables(nside: int, lmax: int) -> Spin2Tables:
    from .sht import sht_tables

    geo = ring_geometry(nside)
    x = np.cos(geo.theta)
    norm = np.sqrt((2.0 * np.arange(lmax + 1) + 1.0)
                   / (4.0 * np.pi))[:, None, None]
    lam_p = norm * wigner_d_column(lmax, x, -2)    # 2Y_{l,m>=0}: d_{-2,m}
    # negative-m fold: 2Y_{l,-mu} = (-1)^mu d_{2,mu} e^{-i mu phi} * norm
    # and the reality factor (-1)^mu from a_{l,-mu} cancels it exactly,
    # so the folded table is the UNSIGNED d_{2,m} column
    lam_m = norm * wigner_d_column(lmax, x, 2)
    scal = sht_tables(nside, lmax)   # reuse phase/geometry device arrays
    dev = jax.device_put
    return Spin2Tables(dev(jnp.asarray(lam_p, jnp.float32)),
                       dev(jnp.asarray(lam_m, jnp.float32)),
                       scal.cosmphi, scal.sinmphi, scal.flat_idx,
                       scal.pad_idx, scal.pad_valid)


@jax.jit
def _synth_spin2_impl(e_re, e_im, b_re, b_im, tab: Spin2Tables):
    """(E, B) alms -> (Q, U) RING maps; Q+iU = -sum (E+iB) 2Y_lm."""
    def A(a):   # m >= 0 branch: contraction with 2lambda
        return jnp.einsum("lmr,lm->mr", tab.lam_p, a)

    def M(a):   # m < 0 branch folded to m > 0 via reality + symmetry
        return jnp.einsum("lmr,lm->mr", tab.lam_m2, a)

    gp_re = -(A(e_re) - A(b_im))
    gp_im = -(A(e_im) + A(b_re))
    gm_re = -(M(e_re) + M(b_im))
    gm_im = M(e_im) - M(b_re)
    p = (jnp.arange(e_re.shape[1]) > 0).astype(jnp.float32)[:, None]
    qc = gp_re + p * gm_re
    qs = -gp_im + p * gm_im
    uc = gp_im + p * gm_im
    us = gp_re - p * gm_re
    q_pad = (jnp.einsum("mr,mrp->rp", qc, tab.cosmphi)
             + jnp.einsum("mr,mrp->rp", qs, tab.sinmphi))
    u_pad = (jnp.einsum("mr,mrp->rp", uc, tab.cosmphi)
             + jnp.einsum("mr,mrp->rp", us, tab.sinmphi))
    return (q_pad.reshape(-1)[tab.flat_idx],
            u_pad.reshape(-1)[tab.flat_idx])


def synthesize_spin2(e_re, e_im, b_re, b_im, nside: int, lmax: int,
                     tables: Optional[Spin2Tables] = None):
    """(E, B) [l, m] real/imag alms -> (Q, U) maps (alm2map_spin, spin=2).

    For lensing shear read (gamma1, gamma2) = (Q, U). m > l entries and
    alm_im[:, 0] must be zero (real-field conventions as the scalar path).
    """
    tab = tables if tables is not None else spin2_tables(nside, lmax)
    return _synth_spin2_impl(jnp.asarray(e_re, jnp.float32),
                             jnp.asarray(e_im, jnp.float32),
                             jnp.asarray(b_re, jnp.float32),
                             jnp.asarray(b_im, jnp.float32), tab)


@partial(jax.jit, static_argnames=("npix",))
def _adjoint_spin2(q, u, tab: Spin2Tables, npix: int):
    """Exact transpose of the synthesis (via vjp) with 4pi/npix weights."""
    L = tab.lam_p.shape[0] - 1
    z = jnp.zeros((L + 1, L + 1), jnp.float32)
    _, vjp = jax.vjp(
        lambda er, ei, br, bi: _synth_spin2_impl(er, ei, br, bi, tab),
        z, z, z, z)
    der, dei, dbr, dbi = vjp((q, u))
    wq = 4.0 * jnp.pi / npix
    lg = jnp.arange(L + 1)[:, None]
    mg = jnp.arange(L + 1)[None, :]
    valid = (mg <= lg) & (lg >= 2)
    # m > 0 rows of the exact transpose count BOTH fold branches (the
    # e^{+imphi} and e^{-imphi} pieces of a real pair each see the mode),
    # so the quadrature inverse needs a 1/2 there — without it S^T S ~ 2I
    # for m > 0 and the Jacobi refinement diverges
    half = jnp.where(mg == 0, 1.0, 0.5)
    vre = valid.astype(jnp.float32) * half
    vim = (valid & (mg > 0)).astype(jnp.float32) * half
    return (wq * der * vre, wq * dei * vim,
            wq * dbr * vre, wq * dbi * vim)


def analyze_spin2(q, u, nside: int, lmax: int, niter: int = 3,
                  tables: Optional[Spin2Tables] = None):
    """(Q, U) maps -> (E_re, E_im, B_re, B_im) (map2alm_spin, spin=2)."""
    tab = tables if tables is not None else spin2_tables(nside, lmax)
    q = jnp.asarray(q, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    npix = q.shape[0]
    alm = _adjoint_spin2(q, u, tab, npix)
    for _ in range(niter):
        sq, su = _synth_spin2_impl(*alm, tab)
        d = _adjoint_spin2(q - sq, u - su, tab, npix)
        alm = tuple(a + da for a, da in zip(alm, d))
    return alm


def anafast_spin2(q, u, lmax: int, niter: int = 3,
                  tables: Optional[Spin2Tables] = None):
    """(Cl_EE, Cl_BB, Cl_EB) of a spin-2 (shear/polarization) map pair."""
    nside = hpx.npix2nside(jnp.asarray(q).shape[0])
    er, ei, br, bi = analyze_spin2(q, u, nside, lmax, niter=niter,
                                   tables=tables)
    ee = alm2cl(er, ei)
    bb = alm2cl(br, bi)
    # EB cross via the polarization identity through alm2cl (single home
    # for the (l, m) weighting — see cl_flat_sky_cross)
    pp = alm2cl(er + br, ei + bi)
    mm = alm2cl(er - br, ei - bi)
    return ee, bb, 0.25 * (pp - mm)


def synfast_spin2(key, cl_ee, cl_bb, nside: int,
                  lmax: Optional[int] = None,
                  tables: Optional[Spin2Tables] = None):
    """Gaussian (Q, U) realization from EE/BB spectra."""
    from .sht import cl_to_lmax

    cl_ee = jnp.asarray(cl_ee, jnp.float32)
    cl_bb = jnp.asarray(cl_bb, jnp.float32)
    L = (cl_ee.shape[0] - 1) if lmax is None else lmax

    def draw(k, cl):
        k1, k2 = jax.random.split(k)
        lg = jnp.arange(L + 1)[:, None]
        mg = jnp.arange(L + 1)[None, :]
        valid = ((mg <= lg) & (lg >= 2)).astype(jnp.float32)
        # zero-pad beyond the table (healpy parity)
        sig = jnp.sqrt(jnp.maximum(cl_to_lmax(cl, L), 0.0))[:, None]
        re = jax.random.normal(k1, (L + 1, L + 1)) * sig * valid
        im = jax.random.normal(k2, (L + 1, L + 1)) * sig * valid
        half = jnp.sqrt(0.5)
        re = jnp.where(mg == 0, re, re * half)
        im = jnp.where(mg == 0, 0.0, im * half)
        return re, im

    ka, kb = jax.random.split(key)
    er, ei = draw(ka, cl_ee)
    br, bi = draw(kb, cl_bb)
    return synthesize_spin2(er, ei, br, bi, nside, L, tables=tables)


def kappa_alm_to_shear_alm(k_re, k_im):
    """E_lm = sqrt((l+2)(l-1) / (l(l+1))) kappa_lm (B = 0): the full-sky
    kappa -> gamma relation (the spherical Kaiser-Squires forward)."""
    L = k_re.shape[0] - 1
    ell = jnp.arange(L + 1, dtype=jnp.float32)
    fac = jnp.sqrt(jnp.where(ell >= 2,
                             (ell + 2.0) * (ell - 1.0)
                             / jnp.maximum(ell * (ell + 1.0), 1.0), 0.0))
    return k_re * fac[:, None], k_im * fac[:, None]


# --------------------------------------------------------------------
# spin-1: gradient/curl (deflection) transforms
# --------------------------------------------------------------------

class Spin1Tables(NamedTuple):
    """Device tables for the spin-1 channel (gradient/deflection)."""
    lam_p: jnp.ndarray     # (L+1, L+1, nring) plus-branch 1lambda_lm
    lam_m: jnp.ndarray     # (L+1, L+1, nring) folded m<0 branch
    cosmphi: jnp.ndarray
    sinmphi: jnp.ndarray
    flat_idx: jnp.ndarray


@lru_cache(maxsize=4)
def spin1_tables(nside: int, lmax: int) -> Spin1Tables:
    """Tables such that for a REAL scalar psi with this package's alms,

        alpha_theta + i alpha_phi = (d/dtheta + i csc(theta) d/dphi) psi
          = sum_{m>=0} E_lm lam_p e^{im phi}
            + sum_{m>0} conj(E_lm) lam_m e^{-im phi},   E_lm = g_l psi_lm

    with g_l = sqrt(l(l+1)). The branch tables were pinned NUMERICALLY
    against finite-difference gradients of random full-spectrum fields
    (tests/test_sht_spin1.py): lam_p = s_m norm d^l_{-1,m} with s_0 = -1,
    s_{m>0} = +1, and lam_m = -norm d^l_{+1,m} (the a_{l,-m} reality
    factor and the d-symmetry signs collapse to a constant -1)."""
    from .sht import sht_tables

    geo = ring_geometry(nside)
    x = np.cos(geo.theta)
    norm = np.sqrt((2.0 * np.arange(lmax + 1) + 1.0)
                   / (4.0 * np.pi))[:, None, None]
    lam_p = norm * wigner_d_column(lmax, x, -1)
    lam_p[:, 0, :] *= -1.0
    lam_m = -norm * wigner_d_column(lmax, x, 1)
    scal = sht_tables(nside, lmax)
    dev = jax.device_put
    return Spin1Tables(dev(jnp.asarray(lam_p, jnp.float32)),
                       dev(jnp.asarray(lam_m, jnp.float32)),
                       scal.cosmphi, scal.sinmphi, scal.flat_idx)


@jax.jit
def _synth_spin1_impl(e_re, e_im, b_re, b_im, tab: Spin1Tables):
    """(E, B) spin-1 alms -> (alpha_theta, alpha_phi) RING maps.

    E is the gradient channel (E_lm = g_l psi_lm for alpha = grad psi),
    B the curl channel (alpha_curl = n x grad omega, i.e. the i*G(omega)
    part): F = G(psi) + i G(omega) with G the pinned gradient operator.
    """
    def A(a):   # m >= 0 branch
        return jnp.einsum("lmr,lm->mr", tab.lam_p, a)

    def M(a):   # m < 0 branch folded to m > 0
        return jnp.einsum("lmr,lm->mr", tab.lam_m, a)

    p_re = A(e_re) - A(b_im)   # plus-branch complex coefficient
    p_im = A(e_im) + A(b_re)
    c_re = M(e_re) + M(b_im)   # fold coefficient (conj(E) + i conj(B))
    c_im = M(b_re) - M(e_im)
    p = (jnp.arange(e_re.shape[1]) > 0).astype(jnp.float32)[:, None]
    tc = p_re + p * c_re       # alpha_theta = Re F
    ts = -p_im + p * c_im
    pc = p_im + p * c_im       # alpha_phi = Im F
    ps = p_re - p * c_re
    a_t = (jnp.einsum("mr,mrp->rp", tc, tab.cosmphi)
           + jnp.einsum("mr,mrp->rp", ts, tab.sinmphi))
    a_p = (jnp.einsum("mr,mrp->rp", pc, tab.cosmphi)
           + jnp.einsum("mr,mrp->rp", ps, tab.sinmphi))
    return (a_t.reshape(-1)[tab.flat_idx],
            a_p.reshape(-1)[tab.flat_idx])


def synthesize_spin1(e_re, e_im, b_re, b_im, nside: int, lmax: int,
                     tables: Optional[Spin1Tables] = None):
    """Spin-1 synthesis: (E, B) alms -> (alpha_theta, alpha_phi) maps.

    For a pure-gradient deflection alpha = grad psi pass
    E_lm = sqrt(l(l+1)) psi_lm, B = 0 (see deflection_from_kappa_alm)."""
    tab = tables if tables is not None else spin1_tables(nside, lmax)
    return _synth_spin1_impl(jnp.asarray(e_re, jnp.float32),
                             jnp.asarray(e_im, jnp.float32),
                             jnp.asarray(b_re, jnp.float32),
                             jnp.asarray(b_im, jnp.float32), tab)


@partial(jax.jit, static_argnames=("npix",))
def _adjoint_spin1(a_t, a_p, tab: Spin1Tables, npix: int):
    """Exact transpose of the spin-1 synthesis (via vjp) with 4pi/npix
    quadrature weights — same construction as _adjoint_spin2."""
    L = tab.lam_p.shape[0] - 1
    z = jnp.zeros((L + 1, L + 1), jnp.float32)
    _, vjp = jax.vjp(
        lambda er, ei, br, bi: _synth_spin1_impl(er, ei, br, bi, tab),
        z, z, z, z)
    der, dei, dbr, dbi = vjp((a_t, a_p))
    wq = 4.0 * jnp.pi / npix
    lg = jnp.arange(L + 1)[:, None]
    mg = jnp.arange(L + 1)[None, :]
    valid = (mg <= lg) & (lg >= 1)
    half = jnp.where(mg == 0, 1.0, 0.5)
    vre = valid.astype(jnp.float32) * half
    vim = (valid & (mg > 0)).astype(jnp.float32) * half
    return (wq * der * vre, wq * dei * vim,
            wq * dbr * vre, wq * dbi * vim)


def analyze_spin1(a_t, a_p, nside: int, lmax: int, niter: int = 3,
                  tables: Optional[Spin1Tables] = None):
    """(alpha_theta, alpha_phi) maps -> (E_re, E_im, B_re, B_im)."""
    tab = tables if tables is not None else spin1_tables(nside, lmax)
    a_t = jnp.asarray(a_t, jnp.float32)
    a_p = jnp.asarray(a_p, jnp.float32)
    npix = a_t.shape[0]
    alm = _adjoint_spin1(a_t, a_p, tab, npix)
    for _ in range(niter):
        st, sp = _synth_spin1_impl(*alm, tab)
        d = _adjoint_spin1(a_t - st, a_p - sp, tab, npix)
        alm = tuple(a + da for a, da in zip(alm, d))
    return alm


def _g_ell(lmax: int):
    ell = jnp.arange(lmax + 1, dtype=jnp.float32)
    return jnp.sqrt(ell * (ell + 1.0))


def deflection_E_factor(lmax: int):
    """(lmax+1, 1) factor turning kappa alms into the spin-1 gradient
    channel of the deflection: E_lm = -(2/g_l) kappa_lm, from the
    lensing convention lap(psi) = 2 kappa (psi_lm = -2 kappa_lm /
    (l(l+1)), E = g psi). The ONE home of this sign/normalization —
    used by deflection_from_kappa_alm and the spherical multiplane
    tracer's per-shell fields (ops.lightcone_sphere)."""
    g = _g_ell(lmax)
    return jnp.where(g > 0, -2.0 / jnp.maximum(g, 1e-30), 0.0)[:, None]


def deflection_from_kappa_alm(k_re, k_im, nside: int, lmax: int,
                              tables: Optional[Spin1Tables] = None):
    """kappa alms -> deflection maps (alpha_theta, alpha_phi).

    Matches the flat-sky spectral inversion in
    ops.lensing.kappa_to_alpha / ops.raytrace (see deflection_E_factor
    for the convention)."""
    inv = deflection_E_factor(lmax)
    z = jnp.zeros_like(jnp.asarray(k_re, jnp.float32))
    return synthesize_spin1(k_re * inv, k_im * inv, z, z, nside, lmax,
                            tables=tables)


def kappa_omega_alm_from_deflection(a_t, a_p, nside: int, lmax: int,
                                    niter: int = 3,
                                    tables: Optional[Spin1Tables] = None):
    """Deflection maps -> (kappa, omega) alms: the effective convergence
    and post-Born rotation of a traced deflection field.

    kappa = -(1/2) div(alpha) with lap psi = 2 kappa => in harmonic space
    kappa_lm = -(g_l/2) E_lm; the curl (rotation) channel mirrors it,
    omega_lm = -(g_l/2) B_lm. A Born-level (single-gradient) deflection
    has omega = 0 identically."""
    er, ei, br, bi = analyze_spin1(a_t, a_p, nside, lmax, niter=niter,
                                   tables=tables)
    fac = -0.5 * _g_ell(lmax)[:, None]
    return er * fac, ei * fac, br * fac, bi * fac


def _wigner_d_l_rows(lmax: int, x: np.ndarray, m1: int, m: int):
    """d^l_{m1, m}(x) for all l <= lmax at the nodes x — ONE (m1, m)
    column of wigner_d_column without materializing the (L+1)^2 cube
    (the MASTER coupling quadrature needs ~lmax GL nodes, where the full
    cube is gigabytes). Host float64; (lmax+1, nx). Requires
    m >= |m1| (the seed branch the couplings use: m=2, m1=+-2)."""
    assert m >= abs(m1)
    x = np.asarray(x, np.float64)
    out = np.zeros((lmax + 1, x.size))
    l0 = m
    if l0 > lmax:
        return out
    ch = np.sqrt((1.0 + x) / 2.0)
    sh = np.sqrt((1.0 - x) / 2.0)
    lnC = 0.5 * (lgamma(2 * m + 1) - lgamma(m + m1 + 1)
                 - lgamma(m - m1 + 1))
    d0 = ((-1.0) ** (m - m1) * np.exp(lnC)
          * ch ** (m + m1) * sh ** (m - m1))
    out[l0] = d0
    dm1, dm2 = d0, np.zeros_like(d0)
    for l in range(l0 + 1, lmax + 1):
        den = (l - 1.0) * np.sqrt((l * l - m1 * m1) * (l * l - m * m))
        if den == 0.0:
            # only the (m1=0, m=0, l=1) step degenerates (0/0); its
            # limit is the Legendre relation d^1_{00} = x d^0_{00}
            d = x * dm1
        else:
            a = (2.0 * l - 1.0) * (l * (l - 1.0) * x - m1 * m) / den
            b = (l * np.sqrt(((l - 1.0) ** 2 - m1 * m1)
                             * ((l - 1.0) ** 2 - m * m)) / den)
            d = a * dm1 - b * dm2
        out[l] = d
        dm2, dm1 = dm1, d
    return out


def spin2_coupling_matrices_from_mask_cl(mask_cl, lmax: int):
    """(M_pp, M_pm): full-sky spin-2 MASTER couplings, Wigner-free.

    Hivon-style spin-2 mode coupling (e.g. Brown et al. 2005 / NaMaster):

        M_pp/pm[l1,l2] = (2 l2 + 1)/(8 pi) sum_l3 (2 l3 + 1) W_l3
                         wigner3j(l1,l2,l3; 2,-2,0)^2 (1 +- (-1)^L)

    with <pEE> = M_pp C_EE + M_pm C_BB and EE<->BB swapped for <pBB>.
    Evaluated WITHOUT Wigner symbols via the d-function product
    identities (the spin-2 analogue of coupling_matrix_from_mask_cl's
    Legendre trick):

        int d^l1_{22} d^l2_{22} P_l3 dx = 2 * 3j(2,-2,0)^2
        int d^l1_{2,-2} d^l2_{2,-2} P_l3 dx = 2 * 3j(2,-2,0)^2 (-1)^L

    so M_pp/pm = (2 l2 + 1)/4 int xi_W(x) [d22 d22 +- d2m2 d2m2] dx on
    an exact Gauss-Legendre grid. Identity check: a unit mask gives
    M_pp = 1 (l >= 2 diagonal), M_pm = 0 by d-orthogonality. Host
    float64 (precision note in coupling_matrix_from_mask_cl).
    """
    wl = np.asarray(mask_cl, np.float64)
    lmax_w = wl.shape[0] - 1
    deg = 2 * lmax + lmax_w
    ngl = deg // 2 + 2
    mu, gw = np.polynomial.legendre.leggauss(ngl)
    P = np.zeros((lmax_w + 1, ngl))
    P[0] = 1.0
    if lmax_w >= 1:
        P[1] = mu
    for ell in range(2, lmax_w + 1):
        P[ell] = ((2 * ell - 1) * mu * P[ell - 1]
                  - (ell - 1) * P[ell - 2]) / ell
    l3 = np.arange(lmax_w + 1)
    xi = ((2 * l3 + 1) / (4 * np.pi) * wl) @ P          # (ngl,)
    d22 = _wigner_d_l_rows(lmax, mu, 2, 2)              # (lmax+1, ngl)
    d2m2 = _wigner_d_l_rows(lmax, mu, -2, 2)
    w = gw * xi
    A = (d22 * w[None, :]) @ d22.T
    Bm = (d2m2 * w[None, :]) @ d2m2.T
    fac = (2.0 * np.arange(lmax + 1, dtype=np.float64) + 1.0)[None, :] / 4.0
    return (A + Bm) * fac, (A - Bm) * fac


def anafast_spin2_master(q, u, mask, lmax: int, nbins: int = 16,
                         niter: int = 3, lmin: int = 2,
                         lmax_mask: Optional[int] = None,
                         coupling=None):
    """Mask-decoupled full-sky shear/polarization band powers.

    The spin-2 MASTER estimator: pseudo EE/BB of the masked (Q, U)
    maps, the (M_pp, M_pm) couplings from the mask spectrum, binned
    2x2-block solve — undoing both the mask's power suppression and its
    E->B leakage (the flat-sky counterpart is
    angular_power.cl_flat_sky_shear_master). Returns
    (ell_eff, cl_ee_hat, cl_bb_hat). Analyses route through the
    table-free spin scan path beyond lmax ~ 512, like anafast_master.
    """
    from .sht import _binned_shape_ops, anafast

    q = jnp.asarray(q, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    nside = hpx.npix2nside(q.shape[0])
    if lmax_mask is None:
        lmax_mask = min(2 * lmax, 2 * nside)

    if lmax <= 512:
        p_ee, p_bb, _ = anafast_spin2(q * mask, u * mask, lmax,
                                      niter=niter)
    else:
        from .sht_spin_large import anafast_spin2_large

        p_ee, p_bb, _ = anafast_spin2_large(q * mask, u * mask, lmax,
                                            niter=niter)
    if coupling is None:
        if lmax_mask <= 512:
            wl = anafast(mask, lmax_mask, niter=niter)
        else:
            from .sht_large import anafast_large

            wl = anafast_large(mask, lmax_mask, niter=niter)
        M_pp, M_pm = spin2_coupling_matrices_from_mask_cl(
            np.asarray(wl), lmax)
    else:
        M_pp, M_pm = (np.asarray(c, np.float64) for c in coupling)
    B, Q, ell_eff = _binned_shape_ops(lmax, nbins, lmin)
    Mb_pp = B @ M_pp @ Q
    Mb_pm = B @ M_pm @ Q
    big = np.block([[Mb_pp, Mb_pm], [Mb_pm, Mb_pp]])
    rhs = np.concatenate([B @ np.asarray(p_ee, np.float64),
                          B @ np.asarray(p_bb, np.float64)])
    sol = np.linalg.solve(big, rhs)
    return (ell_eff, jnp.asarray(sol[:nbins], jnp.float32),
            jnp.asarray(sol[nbins:], jnp.float32))
