"""Spherical-overdensity (SO) halo finder on a periodic density grid.

The reference consumed EXTERNAL halo catalogs (Rockstar ASCII, SubFind
HDF5 — /root/reference/src/astrild/halo.py, utils/read_hdf5.py) and
only post-processed their statistics; combined with ops.nbody this
module closes the remaining forward-model gap: a linear P(k) becomes a
snapshot, the snapshot becomes an M_Delta halo catalog, and the catalog
feeds the same HMF / HOD / profile pipelines (ops.halo_stats, ops.hod)
that the reference ran on Rockstar output.

Algorithm (all on device, one jitted program):
  1. mean enclosed density per cell from a tophat-window radius ladder
     in Fourier space — the same spectral machinery as the spherical
     void finder (ops.voids3d.enclosed_density_radius), with the sign
     flipped: R_Delta is the LAST radius where the enclosed density
     contrast crosses Delta-1 from above.
  2. candidate centers = periodic local maxima of the (lightly
     smoothed) density with R_Delta > 0, ranked by R_Delta (mass).
  3. greedy exclusivity: a candidate whose center lies inside a more
     massive accepted halo's R_Delta is absorbed (standard SO
     percolation rule).

M_Delta = (4 pi / 3) R_Delta^3 * Delta * rho_mean exactly, by the
crossing definition.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import RHO_CRIT0
from .voids3d import (_kmag_r, _local_maxima_periodic,
                      enclosed_density_radius)

__all__ = ["SOHaloCatalog", "so_halos", "so_catalog_dict"]


class SOHaloCatalog(NamedTuple):
    """Fixed-capacity SO halo list, mass-ordered; entries [n:] padded."""

    pos: jnp.ndarray        # (K, 3) halo centers [Mpc/h]
    radius: jnp.ndarray     # (K,) R_Delta [Mpc/h]
    mass: jnp.ndarray       # (K,) M_Delta [Msun/h]
    peak_delta: jnp.ndarray  # (K,) smoothed center density contrast
    n: jnp.ndarray          # scalar int: accepted halos
    n_candidates: jnp.ndarray  # scalar int: pre-truncation candidates


@partial(jax.jit, static_argnames=("n_radii", "max_halos"))
def so_halos(delta, boxsize, om0, delta_mean: float = 200.0,
             max_halos: int = 512, r_min=None, r_max=None,
             n_radii: int = 32, smooth_cells: float = 1.0):
    """SO halos from a (n, n, n) periodic density-contrast grid.

    Args:
      delta: density contrast (e.g. ops.paint + /mean - 1; resolution
        sets the minimum resolvable halo — R_Delta below ~1.5 cells is
        not trusted and r_min defaults there).
      boxsize: box side [Mpc/h].
      om0: Omega_m, for M_Delta = (4pi/3) R^3 Delta rho_mean.
      delta_mean: overdensity Delta relative to the MEAN matter
        density (200 -> M200m, the theory_hmf/Tinker convention).
      max_halos: static catalog capacity; `n_candidates` reports the
        pre-truncation peak count (same overflow contract as
        voids3d.svf_voids / voids.find_tunnels).
      r_min / r_max: radius ladder bounds [Mpc/h]; defaults 1.5 cells
        and boxsize/8. The crossing radius interpolates between rungs,
        so n_radii=32 gives ~2% radius (6% mass) ladder resolution.
      smooth_cells: Gaussian smoothing (cells) for peak detection only.
    """
    ngrid = delta.shape[-1]
    cell = boxsize / ngrid
    r_lo = 1.5 * cell if r_min is None else r_min
    r_hi = boxsize / 8.0 if r_max is None else r_max
    thresh = delta_mean - 1.0  # traced-safe: delta_mean may be a tracer

    # enclosed density decreasing through Delta == "-delta rising
    # through -(Delta-1)": reuse the void-side crossing scan verbatim
    # (one shared forward transform serves the ladder AND the peak
    # smoothing below)
    dk = jnp.fft.rfftn(delta)
    rstar = enclosed_density_radius(-delta, boxsize, r_lo, r_hi,
                                    n_radii=n_radii,
                                    delta_threshold=-thresh, dk=-dk)

    kf = 2.0 * jnp.pi / boxsize
    kmag = _kmag_r(ngrid) * kf
    sig = smooth_cells * cell
    smooth = jnp.fft.irfftn(dk * jnp.exp(-0.5 * (kmag * sig) ** 2),
                            (ngrid,) * 3)

    cand = _local_maxima_periodic(smooth) & (rstar > 0.0)
    score = jnp.where(cand, rstar, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(score, max_halos)
    ii = (idx // (ngrid * ngrid)).astype(jnp.float32)
    jj = ((idx // ngrid) % ngrid).astype(jnp.float32)
    kk = (idx % ngrid).astype(jnp.float32)
    cpos = (jnp.stack([ii, jj, kk], axis=-1) + 0.5) * cell
    cvalid = vals > -jnp.inf
    crad = jnp.where(cvalid, vals, 0.0)
    cpeak = smooth.reshape(-1)[idx]

    def body(i, accepted):
        # absorbed if this center lies inside an accepted (more
        # massive, since candidates are rstar-descending) halo's radius
        d_vec = cpos[i] - cpos
        d_vec = d_vec - boxsize * jnp.round(d_vec / boxsize)
        d = jnp.sqrt(jnp.sum(d_vec ** 2, axis=-1))
        inside = (d < crad) & (accepted > 0)
        ok = (~jnp.any(inside.at[i].set(False))) & cvalid[i]
        return accepted.at[i].set(jnp.where(ok, 1.0, 0.0))

    accepted = jax.lax.fori_loop(0, max_halos, body,
                                 jnp.zeros_like(crad))
    acc = accepted > 0
    radius = jnp.where(acc, crad, 0.0)
    rho_mean = om0 * RHO_CRIT0
    mass = (4.0 / 3.0) * jnp.pi * radius ** 3 * delta_mean * rho_mean
    order = jnp.argsort(-jnp.where(acc, radius, -1.0))
    return SOHaloCatalog(pos=cpos[order], radius=radius[order],
                         mass=mass[order], peak_delta=cpeak[order],
                         n=jnp.sum(acc), n_candidates=jnp.sum(cand))


def so_catalog_dict(cat: SOHaloCatalog, rockstar_names: bool = False
                    ) -> dict:
    """Host column dict: x, y, z [Mpc/h], mass [Msun/h], radius [Mpc/h],
    peak_delta.

    rockstar_names=True additionally aliases mass/radius as m200c/r200c
    so models.Halos' Rockstar statistics (HMF, profiles, TPCF) run on
    the catalog unchanged — note the finder measures Delta x MEAN
    density (M200m for delta_mean=200), not 200c; rescale via an NFW
    model (ops.halo_model) where the distinction matters.
    """
    n = int(cat.n)
    pos = np.asarray(cat.pos)[:n]
    d = {"x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2],
         "mass": np.asarray(cat.mass)[:n],
         "radius": np.asarray(cat.radius)[:n],
         "peak_delta": np.asarray(cat.peak_delta)[:n]}
    if rockstar_names:
        d["m200c"] = d["mass"]
        d["r200c"] = d["radius"]
    return d
