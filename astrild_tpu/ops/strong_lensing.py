"""Strong-lensing map utilities: SPH surface-density painting, inverse-CIC
image remapping, stencil shear.

Native replacements for the reference's ctypes bridges to external .so
libraries that were hardcoded to cluster paths and NOT in the repo
(/root/reference/src/astrild/rays/skys/lm_cfuncs.py:41-291):
  * cal_sph_sdens  -> sph_surface_density (adaptive-kernel deposit,
    bucketed by smoothing length so each bucket is one FFT convolution)
  * call_inverse_cic -> remap_image (bilinear sampling at source-plane
    coordinates; the strong-lensing image remapper, also the flat-sky CMB
    lensing operator)
  * call_lanczos_derivative -> shear_from_potential (central-difference
    second derivatives)
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["sph_surface_density", "remap_image", "shear_from_potential"]


@partial(jax.jit, static_argnames=("npix", "n_buckets"))
def sph_surface_density(pos2d, mass, hsml, npix: int, boxsize,
                        n_buckets: int = 4):
    """Project particles to a surface-density map with per-particle
    smoothing.

    Particles are NGP-deposited and smoothed per smoothing-length bucket:
    particles are partitioned into n_buckets log-spaced hsml classes, each
    class deposited and convolved with a Gaussian of its mean width (one
    FFT per bucket) — the TPU-shaped stand-in for per-particle SPH kernels
    (lm_cfuncs.py:57-113).

    Args:
      pos2d: (n, 2) positions in [0, boxsize).
      mass: (n,) masses.
      hsml: (n,) smoothing lengths (same units as boxsize).
    """
    ds = boxsize / npix
    i = jnp.floor(pos2d / ds).astype(jnp.int32) % npix
    flat = i[:, 0] * npix + i[:, 1]
    h = jnp.clip(hsml, 1e-3 * ds, boxsize / 4.0)
    lh = jnp.log(h)
    lo = jnp.min(lh)
    hi = jnp.max(lh) + 1e-6
    bucket = jnp.clip(((lh - lo) / (hi - lo) * n_buckets).astype(jnp.int32),
                      0, n_buckets - 1)
    k = jnp.fft.fftfreq(npix) * 2.0 * jnp.pi / ds
    k2 = k[:, None] ** 2 + k[None, :] ** 2

    out = jnp.zeros((npix, npix))
    for b in range(n_buckets):
        sel = bucket == b
        wsum = jnp.sum(jnp.where(sel, mass, 0.0))
        dep = jnp.zeros((npix * npix,))
        dep = dep.at[flat].add(jnp.where(sel, mass, 0.0))
        dep = dep.reshape(npix, npix)
        hb = jnp.exp(jnp.sum(jnp.where(sel, lh, 0.0))
                     / jnp.maximum(jnp.sum(sel), 1))
        transfer = jnp.exp(-0.5 * (hb ** 2) * k2)
        sm = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(dep) * transfer))
        out = out + jnp.where(wsum > 0, 1.0, 0.0) * sm
    return out / ds ** 2  # mass / area


@jax.jit
def remap_image(img, coord1, coord2):
    """Sample `img` at fractional pixel coordinates (bilinear) — the
    inverse-CIC remapping of lm_cfuncs.py:170-259. coord1/coord2 index
    axis 0/axis 1; out-of-range coordinates clamp to the border.

    This is also the flat-sky lensed-image operator:
      lensed = remap_image(unlensed, X + alpha1/ds, Y + alpha2/ds).
    """
    n0, n1 = img.shape[-2], img.shape[-1]
    c1 = jnp.clip(coord1, 0.0, n0 - 1.0)
    c2 = jnp.clip(coord2, 0.0, n1 - 1.0)
    i0 = jnp.clip(jnp.floor(c1).astype(jnp.int32), 0, n0 - 2)
    j0 = jnp.clip(jnp.floor(c2).astype(jnp.int32), 0, n1 - 2)
    f1 = c1 - i0
    f2 = c2 - j0
    v00 = img[i0, j0]
    v01 = img[i0, j0 + 1]
    v10 = img[i0 + 1, j0]
    v11 = img[i0 + 1, j0 + 1]
    return ((1 - f1) * (1 - f2) * v00 + (1 - f1) * f2 * v01
            + f1 * (1 - f2) * v10 + f1 * f2 * v11)


@jax.jit
def shear_from_potential(phi, opening_angle):
    """gamma1/gamma2/kappa from the lensing potential by second
    derivatives (the role of call_lanczos_derivative, lm_cfuncs.py:144-168):
      kappa  = (phi_11 + phi_22)/2
      gamma1 = (phi_11 - phi_22)/2 ; gamma2 = phi_12
    """
    n = phi.shape[-1]
    ds = opening_angle / n
    d1 = jnp.gradient(phi, ds, axis=0)
    d2 = jnp.gradient(phi, ds, axis=1)
    p11 = jnp.gradient(d1, ds, axis=0)
    p22 = jnp.gradient(d2, ds, axis=1)
    p12 = jnp.gradient(d1, ds, axis=1)
    kappa = 0.5 * (p11 + p22)
    gamma1 = 0.5 * (p11 - p22)
    gamma2 = p12
    return kappa, gamma1, gamma2
