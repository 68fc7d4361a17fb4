"""Radial profiles of objects on flat-sky maps, with block bootstrap and
tangential shear.

TPU-native port of the reference's Profiles2D
(/root/reference/src/astrild/profiles/profile_2d.py): per-object annulus
binning (profiling :92-153) becomes one vmapped gather+segment-sum; the
100-resample spatial block bootstrap (:278-359) becomes a vmapped PRNG
resampling; mean_and_interpolate (:227-259) fills empty annuli by linear
interpolation; tangential shear gamma_t(r) = kappa_bar(<r) - kappa(r)
replaces the reference's quad integration (rays/void.py:495-512) with an
exact cumulative-bin identity.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "object_profiles", "mean_and_interpolate", "bootstrap_profiles",
    "tangential_shear",
]


@partial(jax.jit, static_argnames=("patch_half", "nbins"))
def object_profiles(skymap, centers_pix, radii_pix, patch_half: int,
                    nbins: int = 10, extend: float = 1.0):
    """Annulus-binned radial profiles for a batch of objects.

    Mirrors reference `profiling` (profile_2d.py:92-153): for object i the
    j-th annulus covers eta = r/R_i in [j, j+1) * extend/nbins, and the
    profile value is the mean of map pixels in the annulus.

    Args:
      skymap: (n, n) map.
      centers_pix: (nobj, 2) int (row, col) centers.
      radii_pix: (nobj,) object radii in pixels.
      patch_half: static half-size of the extracted patch; must be
        >= ceil(max radius * extend).
      nbins: number of radial bins.
      extend: profile reach in units of object radii.

    Returns:
      eta: (nbins,) bin centers in units of object radius.
      values: (nobj, nbins) annulus means (NaN where annulus empty).
    """
    n = skymap.shape[-1]
    # patch cannot exceed the map; pixels beyond extend*R are masked anyway
    patch_half = min(patch_half, (n - 1) // 2)
    p = 2 * patch_half + 1
    rows = jnp.arange(p) - patch_half
    cols = jnp.arange(p) - patch_half
    dist = jnp.sqrt(rows[:, None] ** 2.0 + cols[None, :] ** 2.0)
    delta_eta = extend / nbins

    def one(center, radius):
        r0 = center[0] - patch_half
        c0 = center[1] - patch_half
        # clamp the slice inside the map; out-of-range pixels masked below
        r0c = jnp.clip(r0, 0, n - p)
        c0c = jnp.clip(c0, 0, n - p)
        patch = jax.lax.dynamic_slice(skymap, (r0c, c0c), (p, p))
        # actual offsets of patch pixels relative to the object center
        drow = (jnp.arange(p) + r0c - center[0])[:, None]
        dcol = (jnp.arange(p) + c0c - center[1])[None, :]
        d = jnp.sqrt(drow ** 2.0 + dcol ** 2.0)
        eta = d / jnp.maximum(radius, 1e-6)
        binidx = jnp.clip((eta / delta_eta).astype(jnp.int32), 0, nbins)
        inside = (eta < extend)
        w = inside.astype(jnp.float32).reshape(-1)
        b = jnp.where(inside, binidx, nbins).reshape(-1)
        vsum = jax.ops.segment_sum(w * patch.reshape(-1), b,
                                   num_segments=nbins + 1)[:nbins]
        cnt = jax.ops.segment_sum(w, b, num_segments=nbins + 1)[:nbins]
        return jnp.where(cnt > 0, vsum / jnp.maximum(cnt, 1), jnp.nan)

    values = jax.vmap(one)(centers_pix, radii_pix)
    edges = jnp.linspace(0.0, extend, nbins + 1)
    eta = 0.5 * (edges[1:] + edges[:-1])
    return eta, values


@jax.jit
def mean_and_interpolate(profiles, weights=None):
    """Weighted mean over objects with NaN-robust handling + linear fill.

    Mirrors reference mean_and_interpolate (profile_2d.py:227-259):
    per-bin weighted mean ignoring NaNs; bins with no data are filled by
    linear interpolation over bin index.
    """
    nbins = profiles.shape[-1]
    if weights is None:
        weights = jnp.ones(profiles.shape[:-1], profiles.dtype)
    w = weights[..., None] * jnp.isfinite(profiles)
    vals = jnp.where(jnp.isfinite(profiles), profiles, 0.0)
    num = jnp.sum(w * vals, axis=0)
    den = jnp.sum(w, axis=0)
    mean = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), jnp.nan)
    # linear interpolation over missing bins
    x = jnp.arange(nbins, dtype=mean.dtype)
    good = jnp.isfinite(mean)
    # jnp.interp needs sorted xs of good points; emulate with masked interp
    xg = jnp.where(good, x, 1e9)
    order = jnp.argsort(xg)
    xs = xg[order]
    ys = jnp.where(good, mean, 0.0)[order]
    ngood = jnp.sum(good)
    filled = jnp.interp(x, xs[:nbins], ys[:nbins])
    return jnp.where(good, mean, jnp.where(ngood > 0, filled, jnp.nan))


@partial(jax.jit, static_argnames=("n_boot", "block_pix", "npix"))
def bootstrap_profiles(profiles, centers_pix, key, n_boot: int = 100,
                       block_pix: int = 256, npix: int = 4096,
                       lo: float = 16.0, hi: float = 84.0):
    """Spatial block bootstrap of the mean profile (profile_2d.py:278-359).

    Objects are grouped into (npix/block_pix)^2 spatial blocks by their
    centers; each resample draws blocks with replacement and averages the
    profiles of objects in the drawn blocks. Returns (lo, hi) percentile
    envelopes of the resampled means.
    """
    nobj = profiles.shape[0]
    nblk = max(npix // block_pix, 1)
    blk = (centers_pix[:, 0] // block_pix) * nblk + (centers_pix[:, 1] // block_pix)
    nblocks = nblk * nblk
    finite = jnp.isfinite(profiles)
    vals = jnp.where(finite, profiles, 0.0)

    def one(k):
        drawn = jax.random.randint(k, (nblocks,), 0, nblocks)
        # multiplicity of each block in this resample
        mult = jax.ops.segment_sum(jnp.ones((nblocks,), jnp.float32), drawn,
                                   num_segments=nblocks)
        w_obj = mult[blk][:, None] * finite
        num = jnp.sum(w_obj * vals, axis=0)
        den = jnp.sum(w_obj, axis=0)
        return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), jnp.nan)

    keys = jax.random.split(key, n_boot)
    means = jax.vmap(one)(keys)
    low = jnp.nanpercentile(means, lo, axis=0)
    high = jnp.nanpercentile(means, hi, axis=0)
    return low, high


@jax.jit
def tangential_shear(eta, kappa_profile):
    """gamma_t(r) = mean kappa inside r minus kappa(r).

    Exact discrete version of the reference's quad integration
    (rays/void.py:495-512): kappa_bar(<r_j) = sum_i<=j kappa_i A_i / sum A_i
    with annulus areas A_i ~ eta_i * d_eta (2D annuli).
    """
    # annulus areas from bin centers (uniform bins)
    deta = eta[1] - eta[0]
    area = 2.0 * jnp.pi * eta * deta
    csum_ka = jnp.cumsum(kappa_profile * area)
    csum_a = jnp.cumsum(area)
    kbar = csum_ka / jnp.maximum(csum_a, 1e-30)
    return kbar - kappa_profile
