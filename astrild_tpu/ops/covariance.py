"""Analytic Gaussian covariances for the spectrum estimators.

Beyond the reference (which published central values with no error
model): disconnected (Gaussian) covariances for P(k), Cl, and the RSD
multipoles, matching the exact discrete mode counts of this package's
estimators (the same shell binning, hermitian weights, and bin edges),
plus the empirical covariance_from_realizations in utils/analysis.py for
the non-Gaussian part.

Multipole covariance follows Grieb et al. 2016 (arxiv:1509.04293) Eq. 16
evaluated on the DISCRETE mode set of the FFT grid rather than the
continuum approximation — at low k (few modes per shell) the discrete sum
is the correct one.
"""
from __future__ import annotations

import jax.numpy as jnp


__all__ = ["gaussian_pk_covariance", "gaussian_cl_covariance",
           "gaussian_multipole_covariance", "spatial_jackknife_regions",
           "spatial_jackknife"]


def gaussian_pk_covariance(pk, nmodes, shotnoise: float = 0.0):
    """Diagonal Gaussian covariance of a binned auto P(k).

    Var[P_b] = 2 (P_b + P_shot)^2 / N_b with N_b the hermitian-weighted
    mode count (ops.power.PowerResult.nmodes).
    """
    pk = jnp.asarray(pk)
    nm = jnp.maximum(jnp.asarray(nmodes), 1.0)
    return 2.0 * (pk + shotnoise) ** 2 / nm


def gaussian_cl_covariance(cl, ells, fsky: float = 1.0, noise_cl=0.0,
                           delta_ell: float = 1.0):
    """Diagonal Gaussian covariance of an angular power spectrum:
    Var[C_l] = 2 (C_l + N_l)^2 / ((2l+1) fsky delta_l)."""
    cl = jnp.asarray(cl)
    ells = jnp.asarray(ells)
    return (2.0 * (cl + noise_cl) ** 2
            / ((2.0 * ells + 1.0) * fsky * delta_ell))


def gaussian_multipole_covariance(ngrid: int, boxsize: float, nbins: int,
                                  p_iso_fn, beta: float = 0.0,
                                  bias: float = 1.0,
                                  shotnoise: float = 0.0,
                                  ells=(0, 2, 4), los: int = 2,
                                  kmin=None, kmax=None):
    """Gaussian covariance of auto_power_multipoles on THIS mode grid.

    C_{ll'}(k_b) = (2l+1)(2l'+1)/N_b^2 * sum_{m in b} w_m L_l(mu_m)
                   L_l'(mu_m) * 2 [b^2 (1+beta mu_m^2)^2 P_iso(|k_m|)
                                   + P_shot]^2

    evaluated with the same shell binning, hermitian weights w_m and mu
    convention as ops.power.auto_power_multipoles. Returns
    (k, cov (nell, nell, nbins), nmodes).

    p_iso_fn: callable k -> isotropic P(k) [(Mpc/h)^3] (e.g. a partial of
    ops.linear_power.linear_power).
    """
    from .power import _legendre_even, _shell_reduce, get_shell_binning

    binidx, wf, nm, kmean = get_shell_binning(ngrid, nbins, kmin, kmax)
    kf = 2.0 * jnp.pi / boxsize
    f = (jnp.fft.fftfreq(ngrid) * ngrid).astype(jnp.float32)
    fz = (jnp.fft.rfftfreq(ngrid) * ngrid).astype(jnp.float32)
    ax = (f[:, None, None], f[None, :, None], fz[None, None, :])
    m2 = ax[0] ** 2 + ax[1] ** 2 + ax[2] ** 2
    mu2 = jnp.where(m2 == 0.0, 0.0, ax[los] ** 2 / jnp.maximum(m2, 1e-12))
    kmag = jnp.sqrt(m2) * kf
    pkmu = (bias ** 2 * (1.0 + beta * mu2) ** 2
            * p_iso_fn(jnp.maximum(kmag, 1e-6)) + shotnoise)
    var2 = 2.0 * pkmu ** 2

    nell = len(ells)
    legs = [_legendre_even(ell, mu2) for ell in ells]
    out = jnp.zeros((nell, nell, nbins))
    for i in range(nell):
        for j in range(i, nell):
            pref = (2 * ells[i] + 1) * (2 * ells[j] + 1)
            vals = (pref * legs[i] * legs[j] * var2).reshape(-1)
            # _shell_reduce divides by nm once; divide once more for the
            # 1/N_b^2 of the estimator-covariance
            c = _shell_reduce(vals, binidx, wf, nm) / jnp.maximum(nm, 1.0)
            out = out.at[i, j].set(c)
            out = out.at[j, i].set(c)
    return kmean * kf, out, nm


def spatial_jackknife_regions(pos, boxsize, n_side: int):
    """Cubic-subvolume jackknife region label (0..n_side^3-1) per row.

    Host-side numpy (labels drive host-side resampling loops).
    pos: (n, 3) array or flat-component tuple.
    """
    import numpy as np

    if isinstance(pos, (tuple, list)):
        comps = [np.asarray(c).reshape(-1) for c in pos]
    else:
        arr = np.asarray(pos)
        comps = [arr[:, 0], arr[:, 1], arr[:, 2]]
    cell = float(boxsize) / n_side
    idx = [np.clip((c / cell).astype(np.int64), 0, n_side - 1)
           for c in comps]
    return (idx[0] * n_side + idx[1]) * n_side + idx[2]


def spatial_jackknife(est_fn, pos, boxsize, n_side: int = 3,
                      extra_cols=()):
    """Delete-one spatial jackknife covariance of a catalog statistic.

    est_fn(pos_padded, n_valid, *cols_padded) -> (nstat,) vector; it
    must honor `n_valid` (rows [n_valid:] are zero padding) — the
    contract of this package's pair estimators (pair_counts_*,
    pairwise_*). All leave-one-out samples are padded to ONE static
    shape so est_fn compiles once.

    Returns (theta_full, theta_jk (nreg, nstat), cov (nstat, nstat))
    with the standard delete-one factor (nreg-1)/nreg * sum of outer
    products around the jackknife mean.
    """
    import numpy as np

    labels = spatial_jackknife_regions(pos, boxsize, n_side)
    nreg = n_side ** 3
    if isinstance(pos, (tuple, list)):
        arr = np.stack([np.asarray(c).reshape(-1) for c in pos], axis=-1)
    else:
        arr = np.asarray(pos)
    cols = [np.asarray(c) for c in extra_cols]
    n = arr.shape[0]
    counts = np.bincount(labels, minlength=nreg)
    n_pad = int(n - counts.min())

    theta_full = np.asarray(est_fn(jnp.asarray(arr), n,
                                   *[jnp.asarray(c) for c in cols]))
    samples = []
    for r in range(nreg):
        keep = labels != r
        nk = int(keep.sum())
        sub = np.zeros((n_pad, arr.shape[1]), arr.dtype)
        sub[:nk] = arr[keep]
        sub_cols = []
        for c in cols:
            cc = np.zeros((n_pad,) + c.shape[1:], c.dtype)
            cc[:nk] = c[keep]
            sub_cols.append(jnp.asarray(cc))
        samples.append(np.asarray(est_fn(jnp.asarray(sub), nk,
                                         *sub_cols)))
    theta_jk = np.stack(samples)
    mean = theta_jk.mean(axis=0)
    d = theta_jk - mean
    cov = (nreg - 1) / nreg * np.einsum("ri,rj->ij", d, d)
    return theta_full, theta_jk, cov
