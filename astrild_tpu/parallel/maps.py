"""Distributed flat-sky map operations: sharded 2D FFT filters.

The reference tiles its 8192^2 maps on a single host
(SkyArray.division/merge, sky_array.py:541-601); here maps shard row-wise
over the 'x' mesh axis and 2D FFT filters run with one all_to_all
collective transpose per direction over ICI (2D analogue of
parallel/pfft.py).

Layout contract inside shard_map over axis 'x':
  input  local block: (npix/PX, npix)   — rows sharded
  after fft2: transposed layout (npix, npix/PX) — cols sharded
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pfft2d_local", "pifft2d_local", "make_sharded_filter",
           "make_sharded_gaussian_filter"]


def pfft2d_local(block, ax: str = "x"):
    """(n/PX, n) real/complex -> (n, n/PX) complex spectrum (transposed)."""
    px = jax.lax.axis_size(ax)
    b = jnp.asarray(block)
    if not jnp.issubdtype(b.dtype, jnp.complexfloating):
        b = b.astype(jnp.complex64)
    b = jnp.fft.fft(b, axis=1)  # along full axis
    if px > 1:
        b = jax.lax.all_to_all(b, ax, split_axis=1, concat_axis=0,
                               tiled=True)
    return jnp.fft.fft(b, axis=0)


def pifft2d_local(block, ax: str = "x"):
    """Inverse of pfft2d_local: (n, n/PX) -> (n/PX, n) complex."""
    px = jax.lax.axis_size(ax)
    b = jnp.fft.ifft(block, axis=0)
    if px > 1:
        b = jax.lax.all_to_all(b, ax, split_axis=0, concat_axis=1,
                               tiled=True)
    return jnp.fft.ifft(b, axis=1)


def make_sharded_filter(mesh: Mesh, npix: int,
                        transfer_fn: Callable[[jnp.ndarray, jnp.ndarray],
                                              jnp.ndarray]):
    """Jitted sharded filter: map sharded P('x', None) -> filtered map.

    transfer_fn(k0, k1) -> multiplier, with k0/k1 the angular frequencies
    [2 pi / pixel] of the local spectral block (transposed layout: axis 0
    full, axis 1 the column chunk owned by this x-shard).
    """
    def body(block):
        px = jax.lax.axis_size("x")
        xi = jax.lax.axis_index("x")
        spec = pfft2d_local(block)
        k = (jnp.fft.fftfreq(npix) * 2.0 * jnp.pi).astype(jnp.float32)
        nloc = npix // px
        k0 = k[:, None]
        k1 = jax.lax.dynamic_slice(k, (xi * nloc,), (nloc,))[None, :]
        spec = spec * transfer_fn(k0, k1)
        return jnp.real(pifft2d_local(spec))

    fn = jax.shard_map(body, mesh=mesh, in_specs=P("x", None),
                       out_specs=P("x", None))
    return jax.jit(fn)


def make_sharded_gaussian_filter(mesh: Mesh, npix: int, theta_deg: float,
                                 sigma_arcmin: float):
    """Distributed equivalent of ops.filters.gaussian."""
    sigma_pix = sigma_arcmin / 60.0 * npix / theta_deg

    def transfer(k0, k1):
        return jnp.exp(-0.5 * sigma_pix ** 2 * (k0 ** 2 + k1 ** 2)).astype(
            jnp.complex64)

    return make_sharded_filter(mesh, npix, transfer)
