"""Distributed spherical-harmonic transforms: rings sharded over the mesh.

The SHT of ops/sht.py decomposes exactly over iso-latitude rings: synthesis
is ring-local (each ring needs only alm, which is replicated), and analysis
is a sum of per-ring contributions (one psum). Sharding the ring axis over
a mesh axis therefore splits both the O(lmax^2 * nring) Legendre table and
the transform FLOPs across devices — the full-sky analogue of the pencil
FFT's domain decomposition (SURVEY.md §2 "parallelism inventory").

Layouts (inside shard_map over axis `ax`):
  lam      (L+1, L+1, nring/P)   ring-sharded Legendre table
  cos/sin  (L+1, nring/P, pmax)  ring-sharded phase tables
  map_pad  (nring/P, pmax)       padded ring-major map block
The padded plane is the working representation; `pad_map` / `unpad_map`
convert to/from RING pixel order on the host side of the jit boundary.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import sht as sht_ops

__all__ = ["make_distributed_sht", "pad_map", "unpad_map"]


def pad_map(hpmap, nside: int):
    """RING pixel vector -> (nring, pmax) padded plane (numpy, host)."""
    geo = sht_ops.ring_geometry(nside)
    nring, pmax = geo.phi_pad.shape
    out = np.zeros(nring * pmax, np.float32)
    out[geo.flat_idx] = np.asarray(hpmap, np.float32)
    return out.reshape(nring, pmax)


def unpad_map(map_pad, nside: int):
    """(nring, pmax) padded plane -> RING pixel vector (numpy, host)."""
    geo = sht_ops.ring_geometry(nside)
    return np.asarray(map_pad).reshape(-1)[geo.flat_idx]


def make_distributed_sht(mesh: Mesh, nside: int, lmax: int, ax: str = "x"):
    """Build jitted ring-sharded (synthesize, analyze) over mesh axis `ax`.

    synthesize(alm_re, alm_im) -> (nring, pmax) padded map, sharded P(ax).
    analyze(map_pad, niter)    -> (alm_re, alm_im), replicated.
    The ring count 4*nside-1 is padded to a multiple of the axis size with
    zero-weight rings (lam rows zeroed), so any nside works on any mesh.
    """
    nproc = mesh.shape[ax]
    tab = sht_ops.sht_tables(nside, lmax)
    geo = sht_ops.ring_geometry(nside)
    nring, pmax = geo.phi_pad.shape
    npix = int(geo.flat_idx.size)
    nring_p = ((nring + nproc - 1) // nproc) * nproc
    padr = nring_p - nring

    def _padded(a, axis):
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, padr)
        return jnp.pad(a, widths)

    lam = _padded(tab.lam, 2)
    cosm = _padded(tab.cosmphi, 1)
    sinm = _padded(tab.sinmphi, 1)
    shard_r2 = NamedSharding(mesh, P(None, None, ax))
    shard_r1 = NamedSharding(mesh, P(None, ax, None))
    lam = jax.device_put(lam, shard_r2)
    cosm = jax.device_put(cosm, shard_r1)
    sinm = jax.device_put(sinm, shard_r1)
    wmode = jnp.where(jnp.arange(lmax + 1) == 0, 1.0, 2.0)[:, None]

    def synth_body(alm_re, alm_im, lam_b, cos_b, sin_b):
        c_re = jnp.einsum("lmr,lm->mr", lam_b, alm_re)
        c_im = jnp.einsum("lmr,lm->mr", lam_b, alm_im)
        return (jnp.einsum("mr,mrp->rp", wmode * c_re, cos_b)
                - jnp.einsum("mr,mrp->rp", wmode * c_im, sin_b))

    synth = jax.jit(jax.shard_map(
        synth_body, mesh=mesh,
        in_specs=(P(), P(), P(None, None, ax), P(None, ax, None),
                  P(None, ax, None)),
        out_specs=P(ax, None)))

    def adjoint_body(pad_b, lam_b, cos_b, sin_b):
        d_re = jnp.einsum("rp,mrp->mr", pad_b, cos_b)
        d_im = -jnp.einsum("rp,mrp->mr", pad_b, sin_b)
        wq = 4.0 * jnp.pi / npix
        a_re = wq * jnp.einsum("lmr,mr->lm", lam_b, d_re)
        a_im = wq * jnp.einsum("lmr,mr->lm", lam_b, d_im)
        return jax.lax.psum(a_re, ax), jax.lax.psum(a_im, ax)

    adjoint = jax.jit(jax.shard_map(
        adjoint_body, mesh=mesh,
        in_specs=(P(ax, None), P(None, None, ax), P(None, ax, None),
                  P(None, ax, None)),
        out_specs=(P(), P())))

    def synthesize(alm_re, alm_im):
        return synth(jnp.asarray(alm_re, jnp.float32),
                     jnp.asarray(alm_im, jnp.float32), lam, cosm, sinm)

    def analyze(map_pad, niter: int = 3):
        map_pad = jnp.asarray(map_pad, jnp.float32)
        if map_pad.shape[0] != nring_p:
            map_pad = jnp.pad(map_pad, ((0, padr), (0, 0)))
        map_pad = jax.device_put(map_pad, NamedSharding(mesh, P(ax, None)))
        a_re, a_im = adjoint(map_pad, lam, cosm, sinm)
        for _ in range(niter):
            resid = map_pad - synthesize(a_re, a_im)
            d_re, d_im = adjoint(resid, lam, cosm, sinm)
            a_re, a_im = a_re + d_re, a_im + d_im
        return a_re, a_im

    return synthesize, analyze
