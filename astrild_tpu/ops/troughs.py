"""Troughs (Gruen+16): random apertures keeping the lowest-mean fraction.

TPU-native port of /root/reference/src/astrild/rays/utils/troughs.py:30-139:
the per-trough python loop becomes one vmapped masked-mean over random
aperture centers; trough radial profiles reuse ops.profiles.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .profiles import object_profiles

__all__ = ["find_troughs", "trough_profiles"]


@partial(jax.jit, static_argnames=("n_troughs", "rad_pix_max", "conv"))
def _trough_means(img, centers, rad_pix, n_troughs: int, rad_pix_max: int,
                  conv: bool = True):
    p = 2 * rad_pix_max + 1
    offs = jnp.arange(p) - rad_pix_max
    d2 = offs[:, None] ** 2.0 + offs[None, :] ** 2.0
    mask = d2 <= rad_pix ** 2
    n = img.shape[-1]

    def one(cen):
        r0 = jnp.clip(cen[0] - rad_pix_max, 0, n - p)
        c0 = jnp.clip(cen[1] - rad_pix_max, 0, n - p)
        patch = jax.lax.dynamic_slice(img, (r0, c0), (p, p))
        s = jnp.sum(jnp.where(mask, patch, 0.0))
        if conv:
            return s / jnp.sum(mask)
        return s

    return jax.vmap(one)(centers)


def find_troughs(img, key, n_troughs: int, lowest_fraction: float,
                 rad_deg: float, map_width_deg: float,
                 conv: bool = True, border_frac: float = 0.25):
    """Place random apertures, keep the lowest-mean fraction.

    Args mirror the reference find_troughs (troughs.py:30-81); the
    hardcoded [1024, 3072] placement window generalizes to
    border_frac * npix.

    Returns (positions_deg (N,2) as (row, col) pixel-axis order — the
    convention every map-space estimator here uses — and means (N,)).
    """
    n = img.shape[-1]
    rad_pix = rad_deg * n / map_width_deg
    rmax = int(rad_pix) + 1
    lower = int(border_frac * n)
    upper = n - lower
    centers = jax.random.randint(key, (n_troughs, 2), lower, upper + 1)
    means = _trough_means(img, centers, rad_pix, n_troughs, rmax, conv)
    keep = int(round(lowest_fraction * n_troughs))
    vals, idx = jax.lax.top_k(-means, keep)
    pos_deg = centers[idx].astype(jnp.float32) * map_width_deg / n
    return pos_deg, -vals


def trough_profiles(img, pos_deg, rad_deg: float, nbins: int,
                    map_width_deg: float):
    """Mean radial profile of the troughs (troughs.py:113-131)."""
    n = img.shape[-1]
    centers = jnp.rint(pos_deg * n / map_width_deg).astype(jnp.int32)
    # find_troughs positions are already (row, col) — _trough_means
    # slices with cen[0] as the row — exactly what object_profiles
    # expects. (An earlier [:, ::-1] flip here assumed the reference's
    # (x, y) order and measured every off-diagonal profile at the
    # TRANSPOSED position.)
    rad_pix = rad_deg * n / map_width_deg
    radii = jnp.full((centers.shape[0],), rad_pix)
    patch_half = int(rad_pix) + 2
    eta, vals = object_profiles(img, centers, radii, patch_half=patch_half,
                                nbins=nbins, extend=1.0)
    rbins = eta * rad_deg
    return rbins, jnp.nanmean(vals, axis=0)
