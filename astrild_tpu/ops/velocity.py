"""Velocity-field statistics: counts-normalized velocity grids,
divergence theta = div v, and the P_thetatheta / P_deltatheta spectra.

The reference produced velocity and velocity-divergence grids through the
external DTFE binary (particles/hutils/dtfe.py fields 'velocity',
'velocity_gradient'; divergence in hutils/map_transform.py:92-104) but
never measured their spectra. Here the full chain is on-device: paint ->
normalize -> spectral ik divergence -> shell average, validated against
linear theory (theta = -a H f delta for Zel'dovich flows, so
P_thetatheta = (a H f)^2 P_delta at large scales; tests/test_velocity.py).

Conventions: velocities km/s, theta in km/s/(Mpc/h) (NOT divided by aHf);
divide by a H(a) f to get the dimensionless theta of RSD literature.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import power as power_ops
from .paint import paint

__all__ = ["velocity_field", "velocity_divergence",
           "velocity_divergence_power", "delta_theta_cross_power"]


@partial(jax.jit, static_argnames=("ngrid", "window"))
def velocity_field(pos, vel, ngrid: int, boxsize, window: str = "cic"):
    """Counts-normalized velocity grids: v_i(cell) = sum(w v_i)/sum(w).

    This is the MASS-weighted velocity estimator (momentum/density); it
    approximates the volume-weighted field of the DTFE literature only
    where cells are well sampled — the two diverge toward small scales
    (density-velocity correlation bias), so compare like with like.
    Empty cells read 0; choose ngrid at or below the mean interparticle
    spacing so empties are rare.

    Args:
      pos: (n, 3) or flat-component tuple; vel: (n, 3) or tuple [km/s].
    Returns (vgrids (3, ngrid^3 shape), counts grid).
    """
    if isinstance(vel, (tuple, list)):
        vcomp = tuple(jnp.asarray(c).reshape(-1) for c in vel)
    else:
        vel = jnp.asarray(vel)
        vcomp = (vel[:, 0], vel[:, 1], vel[:, 2])
    counts = paint(pos, ngrid, boxsize, window=window)
    safe = jnp.maximum(counts, 1e-12)
    grids = []
    for c in vcomp:
        m = paint(pos, ngrid, boxsize, weights=c, window=window)
        grids.append(jnp.where(counts > 0, m / safe, 0.0))
    return jnp.stack(grids), counts


@jax.jit
def velocity_divergence(vgrids, boxsize):
    """theta = div v by spectral derivative (ik_i v_i(k), periodic).

    vgrids: (3, n, n, n) velocity component grids. Odd derivatives
    vanish on their Nyquist plane (same rule as mocks.zeldovich_catalog).
    """
    n = vgrids.shape[-1]
    kf = 2.0 * jnp.pi / boxsize
    f = (jnp.fft.fftfreq(n) * n).astype(jnp.float32) * kf
    fr = f[: n // 2 + 1]
    ny = n // 2
    mask_full = jnp.ones((n,)).at[ny].set(0.0)
    mask_r = jnp.ones((n // 2 + 1,)).at[ny].set(0.0)
    kx = (f * mask_full).reshape(n, 1, 1)
    ky = (f * mask_full).reshape(1, n, 1)
    kz = (fr * mask_r).reshape(1, 1, n // 2 + 1)
    tk = (1j * kx * jnp.fft.rfftn(vgrids[0])
          + 1j * ky * jnp.fft.rfftn(vgrids[1])
          + 1j * kz * jnp.fft.rfftn(vgrids[2]))
    return jnp.fft.irfftn(tk, (n, n, n))


def velocity_divergence_power(pos, vel, ngrid: int, boxsize,
                              nbins: int = 0, window: str = "cic",
                              kmin=None, kmax=None):
    """P_thetatheta(k) of the velocity-divergence field [km^2/s^2 *
    (Mpc/h)^-2 * (Mpc/h)^3].

    Linear check: for a Zel'dovich flow theta = -a H f delta, so
    P_thetatheta -> (a H f)^2 P_delta at low k.
    """
    vgrids, _ = velocity_field(pos, vel, ngrid, boxsize, window=window)
    theta = velocity_divergence(vgrids, boxsize)
    # theta is already a zero-mean field (not a density deposit): FFT it
    # directly — no mean normalization, window compensation or shot noise
    n = theta.shape[-1]
    nbins = nbins or (n // 2)
    tk = jnp.fft.rfftn(theta) / float(n) ** 3
    pk3d = (jnp.abs(tk) ** 2) * (boxsize ** 3)
    k, p, nm = power_ops.shell_average(pk3d, n, boxsize, nbins, kmin, kmax)
    return power_ops.PowerResult(k, p, nm)


def delta_theta_cross_power(pos, vel, ngrid: int, boxsize, nbins: int = 0,
                            window: str = "cic", kmin=None, kmax=None):
    """Cross spectrum P_deltatheta(k) — the RSD cross ingredient.

    Linear check: P_deltatheta -> -a H f P_delta (theta = -aHf delta).
    """
    # velocity_field already paints the counts grid — reuse it (a deposit
    # is the dominant cost at large n)
    vgrids, counts = velocity_field(pos, vel, ngrid, boxsize, window=window)
    theta = velocity_divergence(vgrids, boxsize)
    n = counts.shape[-1]
    nbins = nbins or (n // 2)
    dk = power_ops.delta_k(counts, window=window)
    tk = jnp.fft.rfftn(theta) / float(n) ** 3
    pk3d = jnp.real(dk * jnp.conj(tk)) * (boxsize ** 3)
    k, p, nm = power_ops.shell_average(pk3d, n, boxsize, nbins, kmin, kmax)
    return power_ops.PowerResult(k, p, nm)
