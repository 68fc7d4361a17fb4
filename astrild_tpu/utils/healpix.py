"""Minimal native HEALPix (RING scheme): ang2pix/pix2ang, vectors,
rotation, nearest-pixel sampling.

healpy is unavailable in this environment; this implements the standard
RING-scheme pixelization math (Gorski et al. 2005) in vectorized numpy —
enough for the reference's healpix usage surface (SkyHealpix: DataFrame ->
map binning, cartesian projection, rotation, masks —
/root/reference/src/astrild/rays/skys/sky_healpix.py and
rays/utils/healpytools.py). Spherical-harmonic synthesis (synfast) is NOT
implemented; use the flat-sky synthesis in ops.angular_power.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["nside2npix", "npix2nside", "ang2pix_ring", "pix2ang_ring",
           "ang2vec", "vec2ang", "rotate_map", "get_interp_val_nearest",
           "UNSEEN"]

UNSEEN = -1.6375e30


def nside2npix(nside: int) -> int:
    return 12 * nside * nside


def npix2nside(npix: int) -> int:
    nside = int(round(np.sqrt(npix / 12.0)))
    assert nside2npix(nside) == npix, f"bad npix {npix}"
    return nside


def ang2pix_ring(nside: int, theta, phi):
    """(theta, phi) [rad] -> RING pixel index; vectorized."""
    theta = np.asarray(theta, np.float64)
    phi = np.asarray(phi, np.float64)
    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi, 2.0 * np.pi) / (0.5 * np.pi)  # in [0, 4)
    pix = np.empty(np.broadcast(z, tt).shape, np.int64)
    z, tt, za = np.broadcast_arrays(z, tt, za)

    eq = za <= 2.0 / 3.0
    # --- equatorial belt ---
    temp1 = nside * (0.5 + tt[eq])
    temp2 = nside * 0.75 * z[eq]
    jp = np.floor(temp1 - temp2).astype(np.int64)
    jm = np.floor(temp1 + temp2).astype(np.int64)
    ir = nside + 1 + jp - jm          # ring counted within the belt
    kshift = 1 - (ir & 1)
    ip = ((jp + jm - nside + kshift + 1) // 2) % (4 * nside)
    ncap = 2 * nside * (nside - 1)
    pix[eq] = ncap + (ir - 1) * 4 * nside + ip

    # --- polar caps ---
    po = ~eq
    tp = tt[po] - np.floor(tt[po])
    tmp = nside * np.sqrt(3.0 * (1.0 - za[po]))
    jp = np.floor(tp * tmp).astype(np.int64)
    jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
    ir = jp + jm + 1
    ip = np.floor(tt[po] * ir).astype(np.int64) % (4 * ir)
    north = z[po] > 0
    pp = np.empty(ir.shape, np.int64)
    pp[north] = 2 * ir[north] * (ir[north] - 1) + ip[north]
    pp[~north] = (nside2npix(nside) - 2 * ir[~north] * (ir[~north] + 1)
                  + ip[~north])
    pix[po] = pp
    return pix


def pix2ang_ring(nside: int, ipix):
    """RING pixel index -> (theta, phi) [rad] of pixel centers."""
    ipix = np.asarray(ipix, np.int64)
    npix = nside2npix(nside)
    ncap = 2 * nside * (nside - 1)
    theta = np.empty(ipix.shape, np.float64)
    phi = np.empty(ipix.shape, np.float64)

    # north polar cap
    north = ipix < ncap
    ip = ipix[north]
    iring = (1 + np.sqrt(1.0 + 2.0 * ip).astype(np.int64)) // 2
    # refine (integer sqrt edge cases)
    iring = np.where(2 * iring * (iring - 1) > ip, iring - 1, iring)
    iring = np.where(2 * iring * (iring + 1) <= ip, iring + 1, iring)
    iphi = ip - 2 * iring * (iring - 1)
    theta[north] = np.arccos(1.0 - iring ** 2 / (3.0 * nside ** 2))
    phi[north] = (iphi + 0.5) * np.pi / (2.0 * iring)

    # equatorial belt
    eq = (ipix >= ncap) & (ipix < npix - ncap)
    ip = ipix[eq] - ncap
    iring = ip // (4 * nside) + nside
    iphi = ip % (4 * nside)
    fodd = 0.5 * (1 + (iring + nside) % 2)
    theta[eq] = np.arccos((2 * nside - iring) * 2.0 / (3.0 * nside))
    # iphi is 0-based here; the standard formula uses 1-based indices
    phi[eq] = (iphi + 1 - fodd) * np.pi / (2.0 * nside)

    # south polar cap
    south = ipix >= npix - ncap
    ip = npix - ipix[south] - 1
    iring = (1 + np.sqrt(2.0 * ip + 1.0).astype(np.int64)) // 2
    iring = np.where(2 * iring * (iring - 1) > ip, iring - 1, iring)
    iring = np.where(2 * iring * (iring + 1) <= ip, iring + 1, iring)
    iphi = 4 * iring + 1 - (ip - 2 * iring * (iring - 1) + 1)
    theta[south] = np.arccos(-1.0 + iring ** 2 / (3.0 * nside ** 2))
    phi[south] = (iphi - 0.5) * np.pi / (2.0 * iring)
    return theta, phi


def ang2vec(theta, phi):
    st = np.sin(theta)
    return np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], -1)


def vec2ang(vec):
    vec = np.asarray(vec)
    theta = np.arccos(np.clip(vec[..., 2]
                              / np.linalg.norm(vec, axis=-1), -1, 1))
    phi = np.mod(np.arctan2(vec[..., 1], vec[..., 0]), 2 * np.pi)
    return theta, phi


def get_interp_val_nearest(hpmap, theta, phi):
    """Nearest-pixel sampling (healpy.get_interp_val's 0th-order cousin)."""
    nside = npix2nside(len(hpmap))
    return np.asarray(hpmap)[ang2pix_ring(nside, theta, phi)]


def rotate_map(hpmap, rot_matrix):
    """Rotate a RING map by a 3x3 rotation matrix with nearest-pixel
    resampling (hp.Rotator equivalent used at sky_healpix.py:369-398)."""
    nside = npix2nside(len(hpmap))
    ipix = np.arange(nside2npix(nside))
    theta, phi = pix2ang_ring(nside, ipix)
    vec = ang2vec(theta, phi)
    # sample the ORIGINAL map at the inversely-rotated positions
    vec_src = vec @ np.asarray(rot_matrix)  # == R^T applied to rows
    ts, ps = vec2ang(vec_src)
    return np.asarray(hpmap)[ang2pix_ring(nside, ts, ps)]
