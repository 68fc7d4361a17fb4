"""Device-side HEALPix (RING scheme): jit-able ang2pix and 4-neighbor
bilinear interpolation.

jnp twins of the host routines in utils/healpix.py (same Gorski et al.
2005 formulas, branchless via where instead of boolean indexing) so that
full-sky painting and ray remapping can run on-device:

  * ang2pix_ring — particle/ray (theta, phi) -> RING pixel, feeds the
    Pallas sorted deposit for lightcone shell painting
    (ops/lightcone_sphere.py);
  * get_interp_weights / get_interp_val — the healpy bilinear stencil,
    used to sample deflection fields at traced ray positions (device
    upgrade of SkyHealPix.lens_cmb_by_deflection's host path,
    reference healpytools.py:52-59).

Precision: device float32. Pixel-boundary assignments can differ from
the float64 host routine for points within ~1e-6 of a boundary (parity
tested at >99.9% exact agreement, and the interpolation weights agree
to float32 tolerance). Integer math is int32: supports nside <= 4096
(largest intermediate 2*(4*nside-1)^2 < 2^31).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import healpix as hpx

__all__ = ["ang2pix_ring", "pix2ang_ring", "get_interp_weights",
           "get_interp_val", "remap_by_deflection"]

_TWO_PI = 6.283185307179586


@partial(jax.jit, static_argnames=("nside",))
def ang2pix_ring(nside: int, theta, phi):
    """(theta, phi) [rad] -> RING pixel index (int32); device twin of
    utils.healpix.ang2pix_ring."""
    theta = jnp.asarray(theta, jnp.float32)
    phi = jnp.asarray(phi, jnp.float32)
    z = jnp.cos(theta)
    za = jnp.abs(z)
    tt = jnp.mod(phi, _TWO_PI) * (2.0 / jnp.pi)  # in [0, 4)
    npix = hpx.nside2npix(nside)
    ncap = 2 * nside * (nside - 1)

    # --- equatorial belt (|z| <= 2/3) ---
    temp1 = nside * (0.5 + tt)
    temp2 = nside * 0.75 * z
    jp_e = jnp.floor(temp1 - temp2).astype(jnp.int32)
    jm_e = jnp.floor(temp1 + temp2).astype(jnp.int32)
    ir_e = nside + 1 + jp_e - jm_e
    kshift = 1 - (ir_e & 1)
    ip_e = ((jp_e + jm_e - nside + kshift + 1) // 2) % (4 * nside)
    pix_eq = ncap + (ir_e - 1) * 4 * nside + ip_e

    # --- polar caps ---
    tp = tt - jnp.floor(tt)
    tmp = nside * jnp.sqrt(3.0 * jnp.maximum(1.0 - za, 0.0))
    jp_p = jnp.floor(tp * tmp).astype(jnp.int32)
    jm_p = jnp.floor((1.0 - tp) * tmp).astype(jnp.int32)
    ir_p = jp_p + jm_p + 1
    ip_p = jnp.floor(tt * ir_p.astype(jnp.float32)).astype(jnp.int32) \
        % (4 * ir_p)
    pix_n = 2 * ir_p * (ir_p - 1) + ip_p
    pix_s = npix - 2 * ir_p * (ir_p + 1) + ip_p
    pix_po = jnp.where(z > 0, pix_n, pix_s)

    return jnp.where(za <= 2.0 / 3.0, pix_eq, pix_po)


def _ring_info(nside: int, iring):
    """Per-ring geometry (jnp twin of utils.healpix._ring_info);
    iring int32 in [1, 4*nside-1]."""
    npix = hpx.nside2npix(nside)
    ncap = 2 * nside * (nside - 1)
    north = iring < nside
    south = iring > 3 * nside
    i_s = 4 * nside - iring
    nr = jnp.where(north, 4 * iring, jnp.where(south, 4 * i_s, 4 * nside))
    startpix = jnp.where(
        north, 2 * iring * (iring - 1),
        jnp.where(south, npix - 2 * i_s * (i_s + 1),
                  ncap + (iring - nside) * 4 * nside))
    fring = iring.astype(jnp.float32)
    fi_s = i_s.astype(jnp.float32)
    z = jnp.where(
        north, 1.0 - fring ** 2 / (3.0 * nside ** 2),
        jnp.where(south, -1.0 + fi_s ** 2 / (3.0 * nside ** 2),
                  (2.0 * nside - fring) * (2.0 / (3.0 * nside))))
    shift = jnp.where(north | south, 0.5,
                      jnp.where((iring + nside) % 2 == 0, 0.5, 0.0))
    return nr, startpix, z, shift


def _ring_above(nside: int, z):
    """Largest ring index with z_ring > z (jnp twin)."""
    az = jnp.abs(z)
    ir_cap = jnp.floor(nside * jnp.sqrt(3.0 * jnp.maximum(1.0 - az, 0.0))
                       ).astype(jnp.int32)
    ir_eq = jnp.floor(nside * (2.0 - 1.5 * z)).astype(jnp.int32)
    return jnp.where(az > 2.0 / 3.0,
                     jnp.where(z > 0, ir_cap, 4 * nside - ir_cap - 1),
                     ir_eq)


@partial(jax.jit, static_argnames=("nside",))
def pix2ang_ring(nside: int, ipix):
    """RING pixel index -> center (theta, phi) [rad]; device twin of
    utils.healpix.pix2ang_ring.

    Fully closed-form (elementwise) ring inversion: the polar-cap ring
    floor((1+sqrt(1+2p))/2) is seeded in f32 and then FIXED UP with two
    exact int32 boundary checks (2r(r-1) <= p < 2r(r+1)), so f32's
    24-bit mantissa cannot misassign boundary pixels at any nside
    <= 8192; the equatorial belt ring is exact integer arithmetic. An
    earlier searchsorted formulation was correct but measured 1.4 s at
    nside=1024 on the chip — TPU lowers the binary search to 12 chained
    midpoint-gathers over all 12.6M queries; the closed form is pure
    VPU. Feeds the device-resident lensed-CMB remap
    (`remap_by_deflection`); the host pix2ang it replaces measured
    4.0 s (r5 profile).
    """
    ipix = jnp.asarray(ipix, jnp.int32)
    npix = hpx.nside2npix(nside)
    ncap = 2 * nside * (nside - 1)

    def cap_ring(p):
        """Exact ring index within a polar cap: largest r with
        2r(r-1) <= p. f32 seed + int32 fixup (seed error <= 1)."""
        pf = p.astype(jnp.float32)
        r = jnp.floor((1.0 + jnp.sqrt(1.0 + 2.0 * pf)) * 0.5
                      ).astype(jnp.int32)
        r = jnp.maximum(r, 1)
        r = jnp.where(2 * r * (r - 1) > p, r - 1, r)
        r = jnp.where(2 * r * (r + 1) <= p, r + 1, r)
        return r

    north = ipix < ncap
    south = ipix >= npix - ncap
    q = npix - 1 - ipix  # mirror index for the south cap
    r_n = cap_ring(ipix)
    r_s = cap_ring(q)
    iring = jnp.where(
        north, r_n,
        jnp.where(south, 4 * nside - r_s,
                  nside + (ipix - ncap) // (4 * nside)))
    nr, sp, z, shift = _ring_info(nside, iring)
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    j = (ipix - sp).astype(jnp.float32)
    phi = (j + shift) * (_TWO_PI / nr.astype(jnp.float32))
    return theta, phi


@partial(jax.jit, static_argnames=("nside",))
def get_interp_weights(nside: int, theta, phi):
    """4-neighbor bilinear stencil; returns (pix (4, N) int32,
    wgt (4, N) float32). Device twin of utils.healpix.get_interp_weights
    (same ring blend + polar-cap fallback, branchless)."""
    theta = jnp.asarray(theta, jnp.float32).reshape(-1)
    phi = jnp.mod(jnp.asarray(phi, jnp.float32).reshape(-1), _TWO_PI)
    npix = hpx.nside2npix(nside)
    z = jnp.cos(theta)
    ir1 = _ring_above(nside, z)
    ir2 = ir1 + 1
    nr1, sp1, z1, sh1 = _ring_info(nside, jnp.clip(ir1, 1, 4 * nside - 1))
    nr2, sp2, z2, sh2 = _ring_info(nside, jnp.clip(ir2, 1, 4 * nside - 1))
    theta1 = jnp.arccos(jnp.clip(z1, -1.0, 1.0))
    theta2 = jnp.arccos(jnp.clip(z2, -1.0, 1.0))

    def ring_phi_interp(nr, sp, shift):
        tmp = phi * (nr.astype(jnp.float32) / _TWO_PI) - shift
        i1 = jnp.floor(tmp).astype(jnp.int32)
        w = tmp - i1.astype(jnp.float32)
        pa = sp + jnp.mod(i1, nr)
        pb = sp + jnp.mod(i1 + 1, nr)
        return pa, pb, 1.0 - w, w

    p0, p1, w0, w1 = ring_phi_interp(nr1, sp1, sh1)
    p2, p3, w2, w3 = ring_phi_interp(nr2, sp2, sh2)

    # general case: linear blend in theta between the two rings
    denom = jnp.where(theta2 > theta1, theta2 - theta1, 1.0)
    wt = jnp.clip((theta - theta1) / denom, 0.0, 1.0)
    wgt = jnp.stack([w0 * (1 - wt), w1 * (1 - wt), w2 * wt, w3 * wt])
    pix = jnp.stack([p0, p1, p2, p3])

    # north of ring 1: upper pair -> opposite side of ring 1 (nr=4, sp=0)
    north = ir1 == 0
    wtn = theta / jnp.where(theta2 > 0, theta2, 1.0)
    facn = (1.0 - wtn) * 0.25
    wgt = jnp.where(north,
                    jnp.stack([facn, facn,
                               w2 * wtn + facn, w3 * wtn + facn]), wgt)
    pix = jnp.where(north,
                    jnp.stack([(pix[2] + 2) % 4, (pix[3] + 2) % 4,
                               pix[2], pix[3]]), pix)

    # south of the last ring: lower pair -> opposite side of last ring
    south = ir2 == 4 * nside
    wts = ((theta - theta1)
           / jnp.where(jnp.pi > theta1, jnp.pi - theta1, 1.0))
    facs = wts * 0.25
    wgt = jnp.where(south,
                    jnp.stack([w0 * (1 - wts) + facs,
                               w1 * (1 - wts) + facs, facs, facs]), wgt)
    pix = jnp.where(south,
                    jnp.stack([pix[0], pix[1],
                               (pix[0] + 2) % 4 + npix - 4,
                               (pix[1] + 2) % 4 + npix - 4]), pix)
    return pix, wgt


@partial(jax.jit, static_argnames=("nside",))
def _interp_apply(hpmap, pix, wgt, nside: int):
    vals = jnp.take(hpmap, pix.reshape(-1), axis=0).reshape(pix.shape)
    return jnp.sum(vals * wgt, axis=0)


def get_interp_val(hpmap, theta, phi):
    """Bilinear interpolation of a RING map at (theta, phi); device
    twin of utils.healpix.get_interp_val (healpy parity)."""
    hpmap = jnp.asarray(hpmap, jnp.float32)
    nside = hpx.npix2nside(hpmap.shape[-1])
    pix, wgt = get_interp_weights(nside, theta, phi)
    return _interp_apply(hpmap, pix, wgt, nside)


@partial(jax.jit, static_argnames=("nside",))
def remap_by_deflection(hpmap, alpha_theta, alpha_phi, nside: int):
    """Sample `hpmap` at the deflected positions of every pixel center:
    theta_s = theta + alpha_theta, phi_s = phi + alpha_phi / sin(theta)
    (reference healpytools.py:52-59), entirely on device.

    One jitted chain (pixel centers -> source angles -> bilinear
    stencil -> gather) replaces the facade's old host round trip
    (pix2ang on host + three ~50 MB uploads per call); the lensed-CMB
    path keeps the CMB, kappa, deflection and lensed maps device-
    resident end to end (r4 VERDICT #1).
    """
    npix = hpx.nside2npix(nside)
    theta, phi = pix2ang_ring(nside, jnp.arange(npix, dtype=jnp.int32))
    # deterministic 1e-3-pixel nudge: zero/underflowing deflection puts
    # sample points EXACTLY on pixel centers, half of which sit on
    # phi-stencil boundaries, where XLA fusion duplicates the floor
    # chain into the gather and weight islands with different FMA
    # contraction and the (pix, wgt) pair goes inconsistent (CLAUDE.md
    # round-3 lightcone notes — optimization_barrier does NOT help).
    # 1e-3 pixel is ~2000 ulp of phi (far beyond any island FMA
    # discrepancy) yet shifts the sampled value by only 1e-3 of the
    # local pixel-to-pixel difference.
    nudge = 1.0e-3 * (_TWO_PI / (4.0 * nside))
    ts = jnp.clip(theta + jnp.asarray(alpha_theta, jnp.float32)
                  + 0.5 * nudge, 0.0, jnp.pi)
    ps = phi + (jnp.asarray(alpha_phi, jnp.float32)
                / jnp.maximum(jnp.sin(theta), 1e-6)) + nudge
    pix, wgt = get_interp_weights(nside, ts, ps)
    return _interp_apply(jnp.asarray(hpmap, jnp.float32), pix, wgt, nside)
