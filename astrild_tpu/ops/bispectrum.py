"""Bispectrum estimators: real 3D B(k1,k2,k3) and 2D equilateral.

The reference's Bispectrum3D was a stub — its body was a copy of the power
spectrum (/root/reference/src/astrild/bispectra/bispectrum_3d.py:41-44, see
SURVEY.md §2) — and its 2D path delegated to lenstools
(bispectra/bispectrum_2d.py:33-50). Here both are implemented natively with
the FFT shell estimator (Scoccimarro-style):

  I_i(x) = ifftn(mask_i(k) * fftn(delta)),  n_i(x) = ifftn(mask_i(k))
  B(b1,b2,b3) = V^2 * sum_x Re[I_1 I_2 I_3] / sum_x Re[n_1 n_2 n_3]

where mask_i selects the i-th |k| shell; the denominator counts the closed
triangles exactly, so binning effects cancel. Shells are defined on integer
mode radii (consistent with ops/power.py binning).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["BispectrumResult", "bispectrum_3d", "bispectrum_2d_equilateral"]


class BispectrumResult(NamedTuple):
    k1: jnp.ndarray     # (ntri,) mean |k| of shell 1 [h/Mpc]
    k2: jnp.ndarray
    k3: jnp.ndarray
    b: jnp.ndarray      # (ntri,) bispectrum [(Mpc/h)^6]
    ntri: jnp.ndarray   # (ntri,) triangle counts (mode-space)


def _mode_radius_full(shape):
    out = 0.0
    for ax, n in enumerate(shape):
        f = (jnp.fft.fftfreq(n) * n).astype(jnp.float32)
        bshape = [1] * len(shape)
        bshape[ax] = n
        out = out + f.reshape(bshape) ** 2
    return jnp.sqrt(out)


def _shell_fields(delta, edges_m):
    """I_i(x), n_i(x) and mean shell radius for every |k|/kf shell."""
    m = _mode_radius_full(delta.shape)
    dk = jnp.fft.fftn(delta.astype(jnp.complex64))

    def one(lo, hi):
        mask = ((m >= lo) & (m < hi)).astype(jnp.complex64)
        i_f = jnp.real(jnp.fft.ifftn(mask * dk))
        n_f = jnp.real(jnp.fft.ifftn(mask))
        msum = jnp.sum(jnp.real(mask) * m)
        mcnt = jnp.sum(jnp.real(mask))
        return i_f, n_f, msum / jnp.maximum(mcnt, 1.0)

    i_fs, n_fs, mmean = jax.vmap(one)(edges_m[:-1], edges_m[1:])
    return i_fs, n_fs, mmean


@partial(jax.jit, static_argnames=("nbins",))
def _bispectrum_core(delta, boxsize, nbins: int, m_min, m_max):
    n = delta.shape[-1]
    kf = 2.0 * jnp.pi / boxsize
    edges = jnp.linspace(m_min, m_max, nbins + 1)
    i_fs, n_fs, mmean = _shell_fields(delta, edges)

    triples = [(a, b, c) for a in range(nbins) for b in range(a, nbins)
               for c in range(b, nbins)]
    ta = jnp.array([t[0] for t in triples])
    tb = jnp.array([t[1] for t in triples])
    tc = jnp.array([t[2] for t in triples])

    def one(a, b, c):
        num = jnp.sum(i_fs[a] * i_fs[b] * i_fs[c])
        den = jnp.sum(n_fs[a] * n_fs[b] * n_fs[c])
        ntri = den * float(n) ** 6  # total closed triangles in mode space
        bval = jnp.where(den > 1e-10,
                         boxsize ** 6 * num / jnp.maximum(den, 1e-30)
                         / float(n) ** 9,
                         jnp.nan)
        return bval, ntri

    bvals, ntris = jax.vmap(one)(ta, tb, tc)
    return BispectrumResult(
        k1=mmean[ta] * kf, k2=mmean[tb] * kf, k3=mmean[tc] * kf,
        b=bvals, ntri=ntris)


def bispectrum_3d(grid, boxsize, nbins: int = 8, m_min: float = 1.0,
                  m_max=None):
    """3D bispectrum of a density grid over all unique shell triples.

    Args:
      grid: (n, n, n) density (contrast taken internally).
      boxsize: box side [Mpc/h].
      nbins: number of |k| shells between m_min and m_max (mode units,
        i.e. |k|/kf).
    Returns BispectrumResult over i<=j<=k shell triples (open triangles
    have ntri=0 and B=NaN).

    Normalization: <d1 d2 d3>_closed = B/V^2 with delta_k = fftn(delta)/N^3;
    validated against the f_NL quadratic-field analytic bispectrum in
    tests/test_bispectrum.py.
    """
    n = grid.shape[-1]
    mean = jnp.mean(grid)
    delta = grid / jnp.where(mean == 0, 1.0, mean) - 1.0
    if m_max is None:
        m_max = n / 2.0 - 1.0
    return _bispectrum_core(delta, boxsize, nbins, m_min, m_max)


@partial(jax.jit, static_argnames=("nbins",))
def bispectrum_2d_equilateral(img, opening_angle_deg, nbins: int = 16,
                              m_min: float = 1.0, m_max=None):
    """Equilateral bispectrum B(ell) of a flat-sky map.

    Replaces lenstools ConvergenceMap.bispectrum(configuration='equilateral')
    (reference bispectra/bispectrum_2d.py:33-50). Returns (ell, B, ntri).
    """
    n = img.shape[-1]
    theta = opening_angle_deg * jnp.pi / 180.0
    lf = 2.0 * jnp.pi / theta
    if m_max is None:
        m_max = n / 2.0 - 1.0
    edges = jnp.linspace(m_min, m_max, nbins + 1)
    i_fs, n_fs, mmean = _shell_fields(img - jnp.mean(img), edges)

    def one(i_f, n_f):
        num = jnp.sum(i_f ** 3)
        den = jnp.sum(n_f ** 3)
        ntri = den * float(n) ** 4
        b = jnp.where(den > 1e-10,
                      theta ** 4 * num / jnp.maximum(den, 1e-30)
                      / float(n) ** 6,
                      jnp.nan)
        return b, ntri

    bvals, ntris = jax.vmap(one)(i_fs, n_fs)
    return mmean * lf, bvals, ntris
