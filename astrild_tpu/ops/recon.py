"""BAO reconstruction (Eisenstein et al. 2007; Padmanabhan et al. 2012):
estimate the Zel'dovich displacement from the smoothed galaxy density and
move galaxies (and randoms) back.

The reference had no reconstruction machinery at all; its clustering
stack stopped at the measured 2PCF/P(k). The whole algorithm is
FFT + gather, i.e. exactly the operations this framework is built
around: paint -> smooth -> spectral inverse-gradient -> trilinear
sample -> shift.

Standard estimator (plane-parallel RSD, los = z axis):

    psi(k) = +i k / k^2 * S(k) delta_g(k) / (b + f mu^2)
    data    shift: x -> x - psi(x) - f (psi . zhat) zhat   (removes RSD)
    randoms shift: x -> x - psi(x)

with S(k) = exp(-(k Sigma)^2 / 4) the usual Gaussian smoothing,
b the tracer bias and f the growth rate (f=0 for real space).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .paint import paint
from .power import delta_k as _delta_k

__all__ = ["displacement_field", "sample_displacement",
           "reconstruct_catalog"]


def _as_comps(pos):
    if isinstance(pos, (tuple, list)):
        return tuple(jnp.asarray(c).reshape(-1) for c in pos)
    pos = jnp.asarray(pos)
    return pos[:, 0], pos[:, 1], pos[:, 2]


@partial(jax.jit, static_argnames=("ngrid", "window", "los"))
def displacement_field(pos, ngrid: int, boxsize, smooth=15.0,
                       bias: float = 1.0, f_growth: float = 0.0,
                       window: str = "cic", los: int = 2):
    """Estimated Zel'dovich displacement grids (3, n, n, n) [Mpc/h].

    Args:
      pos: tracer positions ((n,3) or flat-component tuple).
      smooth: Gaussian smoothing scale Sigma [Mpc/h] (S = exp(-(k
        Sigma)^2/4), the Eisenstein+07 convention).
      bias: linear tracer bias b.
      f_growth: growth rate f for the RSD term (0 = real space).
      los: plane-parallel line-of-sight axis for the f mu^2 term.
    """
    grid = paint(pos, ngrid, boxsize, window=window)
    dk = _delta_k(grid, window=window)  # FFT(delta)/N^3, compensated
    kf = 2.0 * jnp.pi / boxsize
    f = (jnp.fft.fftfreq(ngrid) * ngrid).astype(jnp.float32) * kf
    fr = f[: ngrid // 2 + 1]
    kvec = [f.reshape(-1, 1, 1), f.reshape(1, -1, 1),
            fr.reshape(1, 1, -1)]
    k2 = kvec[0] ** 2 + kvec[1] ** 2 + kvec[2] ** 2
    k2safe = jnp.where(k2 == 0.0, 1.0, k2)
    mu2 = kvec[los] ** 2 / k2safe
    s = jnp.exp(-0.25 * k2 * smooth ** 2)
    phik = jnp.where(k2 == 0.0, 0.0,
                     dk * s / (k2safe * (bias + f_growth * mu2)))
    ny = ngrid // 2
    mask_full = jnp.ones((ngrid,)).at[ny].set(0.0)
    mask_r = jnp.ones((ngrid // 2 + 1,)).at[ny].set(0.0)
    masks = [mask_full.reshape(-1, 1, 1), mask_full.reshape(1, -1, 1),
             mask_r.reshape(1, 1, -1)]
    # continuity: delta = -div psi  =>  psi(k) = +i k delta(k)/k^2
    # (same sign as mocks.zeldovich_catalog's psi = -grad invlap delta)
    psi = [jnp.fft.irfftn(1j * kvec[a] * masks[a] * phik,
                          (ngrid,) * 3) * float(ngrid) ** 3
           for a in range(3)]
    return jnp.stack(psi)


@jax.jit
def sample_displacement(psi_grids, boxsize, pos):
    """Trilinear periodic sample of the displacement at positions.

    psi_grids: (3, n, n, n); pos: (n, 3) or flat tuple. Returns (3, np).
    """
    x, y, z = _as_comps(pos)
    ngrid = psi_grids.shape[-1]
    cell = boxsize / ngrid
    u = [x / cell - 0.5, y / cell - 0.5, z / cell - 0.5]
    i0 = [jnp.floor(c).astype(jnp.int32) for c in u]
    fr = [u[a] - i0[a] for a in range(3)]
    out = jnp.zeros((3, x.shape[0]), psi_grids.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, fr[0], 1 - fr[0])
                     * jnp.where(dy, fr[1], 1 - fr[1])
                     * jnp.where(dz, fr[2], 1 - fr[2]))
                idx = ((i0[0] + dx) % ngrid, (i0[1] + dy) % ngrid,
                       (i0[2] + dz) % ngrid)
                out = out + w[None, :] * psi_grids[:, idx[0], idx[1],
                                                  idx[2]]
    return out


def reconstruct_catalog(pos, randoms, ngrid: int, boxsize, smooth=15.0,
                        bias: float = 1.0, f_growth: float = 0.0,
                        window: str = "cic", los: int = 2):
    """Standard BAO reconstruction: returns (pos_displaced,
    randoms_displaced), both (n, 3), periodic-wrapped.

    Convention: this is the 'RecIso' scheme (Padmanabhan+12; Seo+16
    naming) — data get the extra -f (psi.zhat) zhat RSD-removal term,
    randoms only -psi, which isotropizes the large-scale clustering.
    For 'RecSym' (randoms receive the SAME shift as the data, leaving
    the Kaiser anisotropy in place), shift the randoms with the data
    branch: shift(randoms, True). With f_growth=0 (real-space input)
    the two schemes coincide.
    """
    psi = displacement_field(pos, ngrid, boxsize, smooth=smooth,
                             bias=bias, f_growth=f_growth, window=window,
                             los=los)

    def shift(p, with_rsd):
        x, y, z = _as_comps(p)
        s = sample_displacement(psi, boxsize, (x, y, z))
        comps = [x - s[0], y - s[1], z - s[2]]
        if with_rsd and f_growth != 0.0:
            comps[los] = comps[los] - f_growth * s[los]
        return jnp.stack([c % boxsize for c in comps], axis=-1)

    return shift(pos, True), shift(randoms, False)
