"""BAO acoustic-scale fitting: damped wiggle template + profile
likelihood over the dilation parameter alpha.

This closes the loop that ops/recon.py (Zel'dovich BAO reconstruction)
opens: measure P(k) of the (reconstructed) field, then extract the
acoustic scale with the standard template estimator — smooth
Eisenstein & Hu (1998) no-wiggle broadband, the linear wiggle pattern
O(k) damped by exp(-k^2 Sigma_nl^2 / 2), dilated by alpha, and nuisance
broadband polynomials marginalized analytically (the Beutler+17 /
Ross+15 family of fits).

The reference's BAO story stopped at measuring P(k) and the 2PCF
(/root/reference/src/astrild/power_spectra/power_spectrum_3d.py,
/root/reference/src/astrild/particles/hutils/tpcf.py); it had no
reconstruction and no scale fit. Both live natively here.

Numerics: the fit runs on HOST float64 — it consumes a few dozen binned
numbers, and the column scalings of the broadband design matrix span
~1e4, which is exactly the f32 normal-equation conditioning trap the
project has been bitten by before (CLAUDE.md). Template evaluation goes
through ops.linear_power (device f32) once, then everything is numpy.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from ..utils.cosmology import Cosmology
from .linear_power import (eh98_transfer, eh98_transfer_nowiggle,
                           linear_power_nowiggle)

__all__ = ["wiggle_ratio", "bao_template_power", "fit_bao_scale",
           "BAOFit"]


def wiggle_ratio(k_hmpc, cosmo: Cosmology):
    """O(k) = P_lin / P_nowiggle = (T / T_nw)^2 (host float64).

    Pure acoustic oscillation pattern: amplitude, growth and the k^ns
    tilt cancel exactly in the ratio; the broadband is ~1 by
    construction of the EH98 zero-baryon shape fit.
    """
    k = np.asarray(k_hmpc, np.float64)
    num = np.asarray(eh98_transfer(k, cosmo), np.float64)
    den = np.asarray(eh98_transfer_nowiggle(k, cosmo), np.float64)
    return (num / den) ** 2


def bao_template_power(k_hmpc, cosmo: Cosmology, alpha: float = 1.0,
                       sigma_nl: float = 8.0):
    """Damped, dilated BAO template (host float64, (Mpc/h)^3 at z=0):

        t(k; alpha) = P_nw(k) * [1 + (O(k/alpha) - 1) e^{-k^2 Snl^2/2}]

    Only the wiggle pattern dilates — the broadband stays at the
    observed k, as in standard fits (broadband errors are absorbed by
    the marginalized polynomials, not by alpha). alpha > 1 moves the
    model's wiggle nodes to HIGHER observed k; operationally, data
    carrying the pattern O(k / a_true) is recovered at alpha = a_true
    (pinned by tests/test_bao.py).
    """
    k = np.asarray(k_hmpc, np.float64)
    p_nw = np.asarray(linear_power_nowiggle(k, cosmo), np.float64)
    o = wiggle_ratio(k / float(alpha), cosmo)
    damp = np.exp(-0.5 * (k * float(sigma_nl)) ** 2)
    return p_nw * (1.0 + (o - 1.0) * damp)


class BAOFit(NamedTuple):
    alpha: float          # best-fit dilation
    alpha_err: float      # 1-sigma from the delta-chi2 = 1 curvature
    chi2: float           # at the best fit
    dof: int              # n_bins - (1 alpha + 1 amplitude + n_poly)
    alphas: np.ndarray    # profile grid
    chi2_curve: np.ndarray
    bias2: float          # template amplitude B^2
    broadband: np.ndarray  # polynomial coefficients, one per poly power
    kfit: np.ndarray      # k bins used
    model: np.ndarray     # best-fit model at kfit


def _whiten(k, pk, sigma, cov):
    """Return (W, y) with W the whitening operator applied to model
    columns and y = W @ data, so chi2 = ||y - W m||^2."""
    n = len(k)
    if cov is not None:
        cov = np.asarray(cov, np.float64)
        if cov.shape != (n, n):
            raise ValueError(f"cov shape {cov.shape} != ({n}, {n})")
        ell = np.linalg.cholesky(cov)
        w = np.linalg.inv(ell)  # chi2 = ||L^-1 (d - m)||^2
        return w, w @ pk
    if sigma is None:
        sigma = np.ones(n)
    sigma = np.broadcast_to(np.asarray(sigma, np.float64), (n,))
    if np.any(sigma <= 0):
        raise ValueError("sigma must be positive")
    w = np.diag(1.0 / sigma)
    return w, pk / sigma


def fit_bao_scale(k_hmpc, pk, cosmo: Cosmology, *,
                  sigma=None, cov=None, sigma_nl: float = 8.0,
                  kmin: float = 0.02, kmax: float = 0.30,
                  alphas=None,
                  poly_powers: Sequence[int] = (-2, -1, 0, 1, 2)
                  ) -> BAOFit:
    """Profile-likelihood fit of the acoustic dilation alpha to a
    measured P(k).

    Model: P(k) = B^2 t(k; alpha, Sigma_nl) + sum_i a_i k^{p_i} with
    t = bao_template_power. At each alpha on the grid the linear
    parameters (B^2, a_i) are solved exactly by weighted least squares;
    chi2(alpha) is the resulting profile, minimized by quadratic
    interpolation around the grid minimum, with the 1-sigma error from
    the local delta-chi2 = 1 curvature.

    sigma: per-bin 1-sigma errors (scalar or (n,)); cov: full (n, n)
    covariance (mutually exclusive with sigma). Unit weights if neither.
    Raises if the profile minimum lands on the alpha-grid edge (widen
    `alphas` — an edge minimum means the quoted error would be wrong).

    sigma_nl: nonlinear damping scale in Mpc/h (~8-10 pre-recon, ~4-5
    post-recon at z~0.5; the reconstruction module's purpose is to
    shrink it).
    """
    if sigma is not None and cov is not None:
        raise ValueError("pass sigma or cov, not both")
    k = np.asarray(k_hmpc, np.float64).ravel()
    p = np.asarray(pk, np.float64).ravel()
    if k.shape != p.shape:
        raise ValueError("k and pk disagree on shape")
    mask = (k >= kmin) & (k <= kmax) & np.isfinite(p)
    nfit = int(mask.sum())
    npar = 1 + 1 + len(poly_powers)
    if nfit < npar + 2:
        raise ValueError(f"only {nfit} bins in [{kmin}, {kmax}] for "
                         f"{npar} parameters")
    kf, pf = k[mask], p[mask]
    if sigma is not None and np.ndim(sigma) > 0:
        sigma = np.asarray(sigma, np.float64).ravel()[mask]
    if cov is not None:
        cov = np.asarray(cov, np.float64)[np.ix_(mask, mask)]
    w, y = _whiten(kf, pf, sigma, cov)

    if alphas is None:
        alphas = np.linspace(0.8, 1.2, 401)
    alphas = np.asarray(alphas, np.float64)

    # broadband columns are alpha-independent: whiten + scale once
    polys = np.stack([kf ** float(pw) for pw in poly_powers], axis=1) \
        if len(poly_powers) else np.zeros((len(kf), 0))
    wpolys = w @ polys
    pscale = np.maximum(np.abs(wpolys).max(axis=0), 1e-300)
    wpolys = wpolys / pscale

    # alpha-independent template pieces, evaluated ONCE (each call into
    # linear_power re-runs the sigma8 normalization quadrature on
    # device — 400 grid points of that dominated the whole fit):
    # P_nw(kf), the damping, and a dense O(k) table covering every
    # kf/alpha the profile can request.
    p_nw = np.asarray(linear_power_nowiggle(kf, cosmo), np.float64)
    damp = np.exp(-0.5 * (kf * float(sigma_nl)) ** 2)
    ktab = np.linspace(kf[0] / max(alphas.max(), 1.0) * 0.99,
                       kf[-1] / min(alphas.min(), 1.0) * 1.01, 8192)
    otab = wiggle_ratio(ktab, cosmo)

    def solve(alpha):
        o = np.interp(kf / alpha, ktab, otab)
        t = p_nw * (1.0 + (o - 1.0) * damp)
        wt = w @ t
        tscale = max(np.abs(wt).max(), 1e-300)
        x = np.concatenate([(wt / tscale)[:, None], wpolys], axis=1)
        coef, _, _, _ = np.linalg.lstsq(x, y, rcond=None)
        resid = y - x @ coef
        chi2 = float(resid @ resid)
        b2 = coef[0] / tscale
        bb = coef[1:] / pscale
        return chi2, b2, bb

    chi2s = np.array([solve(a)[0] for a in alphas])
    i = int(np.argmin(chi2s))
    if i == 0 or i == len(alphas) - 1:
        raise ValueError(
            f"chi2(alpha) minimum at the grid edge (alpha = "
            f"{alphas[i]:.4f}); widen `alphas` — no interior minimum in "
            f"[{alphas[0]}, {alphas[-1]}]")
    # quadratic refinement through (i-1, i, i+1)
    a3, c3 = alphas[i - 1:i + 2], chi2s[i - 1:i + 2]
    denom = (c3[0] - 2.0 * c3[1] + c3[2])
    if denom <= 0:  # numerically flat profile: stay on the grid point
        a_best = float(alphas[i])
        curv = np.inf
    else:
        h = a3[1] - a3[0]
        a_best = float(a3[1] + 0.5 * h * (c3[0] - c3[2]) / denom)
        curv = denom / h ** 2  # d2chi2/dalpha2
    err = float(np.sqrt(2.0 / curv)) if np.isfinite(curv) else np.inf
    chi2_b, b2, bb = solve(a_best)
    model = (b2 * bao_template_power(kf, cosmo, alpha=a_best,
                                     sigma_nl=sigma_nl)
             + (polys @ bb if len(poly_powers) else 0.0))
    return BAOFit(alpha=a_best, alpha_err=err, chi2=chi2_b,
                  dof=nfit - npar, alphas=alphas, chi2_curve=chi2s,
                  bias2=float(b2), broadband=np.asarray(bb), kfit=kf,
                  model=np.asarray(model))
