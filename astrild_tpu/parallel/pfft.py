"""Pencil-decomposed distributed 3D FFT over the device mesh.

The TPU-native equivalent of the reference's MPI pfft-python stack
(nbodykit dependency, see SURVEY.md §5 "distributed backend"): the grid is
sharded (x-pencils) over mesh axes ('x', 'y'); each 1D FFT runs locally on
the unsharded axis, and `jax.lax.all_to_all` collective transposes over ICI
re-pencil the array between passes.

Data layout contract (all inside shard_map over mesh axes ('x', 'y')):

  input  local block: (n/PX, n/PY, n)   — global axes (i/X, j/Y, k)
  output local block: (n,  n/PX, n/PY)  — global axes (i, j/X, k/Y)

i.e. the transform is returned *transposed* in sharding (axis 0 fully
local); `local_kvecs` accounts for this when binning spectra, so callers
never need to undo the transpose (just like FFTW/pfft's
TRANSPOSED_OUT mode).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["pfft3d_local", "pifft3d_local", "local_kvecs", "make_pfft3d"]


def _pin_rowmajor(b):
    """CPU-only layout pin: multiply by the identity along axis 0.

    XLA:CPU's fft thunk RET_CHECKs IsMonotonicWithDim0Major on its
    input; in a JOINT forward+backward (autodiff) module the layout
    assigner can propagate a collective's preferred non-major layout
    into an fft operand — measured: grad through psum_scatter -> fft
    crashes while the forward-only module compiles fine, and no
    elementwise/reshape/pad/barrier "copy" breaks the propagation. A
    dot output always gets the default layout, and the dot's OWN
    transpose (another identity dot) pins the cotangent side too. No-op
    off CPU (the TPU backend has no such check; skip the flops).
    """
    if jax.default_backend() != "cpu":
        return b
    eye = jnp.eye(b.shape[0], dtype=b.dtype)
    return jnp.einsum("ij,jkl->ikl", eye, b)


def _pfft_ops(b, ax: str, ay: str):
    """Raw forward op sequence (complex input)."""
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    # pass 1: FFT along k (local)
    b = jnp.fft.fft(_pin_rowmajor(b), axis=2)
    # transpose over 'y': axis2 (k) -> sharded, axis1 (j) -> full
    if py > 1:
        b = jax.lax.all_to_all(b, ay, split_axis=2, concat_axis=1, tiled=True)
    # pass 2: FFT along j (now local axis 1)
    b = jnp.fft.fft(_pin_rowmajor(b), axis=1)
    # transpose over 'x': axis1 (j) -> sharded, axis0 (i) -> full
    if px > 1:
        b = jax.lax.all_to_all(b, ax, split_axis=1, concat_axis=0, tiled=True)
    # pass 3: FFT along i (now local axis 0)
    b = jnp.fft.fft(_pin_rowmajor(b), axis=0)
    return b


def _pifft_ops(b, ax: str, ay: str):
    """Raw inverse op sequence."""
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    b = jnp.fft.ifft(_pin_rowmajor(b), axis=0)
    if px > 1:
        b = jax.lax.all_to_all(b, ax, split_axis=0, concat_axis=1, tiled=True)
    b = jnp.fft.ifft(_pin_rowmajor(b), axis=1)
    if py > 1:
        b = jax.lax.all_to_all(b, ay, split_axis=1, concat_axis=2, tiled=True)
    b = jnp.fft.ifft(_pin_rowmajor(b), axis=2)
    return b


def pfft3d_local(block, ax: str = "x", ay: str = "y"):
    """Forward complex 3D FFT of a pencil-sharded grid; shard_map body.

    block: (n/PX, n/PY, n) complex or real. Returns (n, n/PX, n/PY) complex
    in TRANSPOSED_OUT layout (see module docstring). Differentiable:
    the _pin_rowmajor identity-dots make the natively-transposed chain
    layout-safe on XLA:CPU (a custom-VJP reformulation was tried and
    itself tripped the fft-thunk layout check; the pins alone fix both
    directions because a dot's transpose is another dot).
    """
    b = jnp.asarray(block)
    if not jnp.issubdtype(b.dtype, jnp.complexfloating):
        b = b.astype(jnp.complex64)
    return _pfft_ops(b, ax, ay)


def pifft3d_local(block, ax: str = "x", ay: str = "y"):
    """Inverse of pfft3d_local: (n, n/PX, n/PY) -> (n/PX, n/PY, n)."""
    return _pifft_ops(jnp.asarray(block), ax, ay)


def local_kvecs(ngrid: int, boxsize: float, ax: str = "x", ay: str = "y",
                dtype=jnp.float32):
    """Wavevector components for the local block of a TRANSPOSED_OUT pfft.

    Returns (ki, kj, kk) broadcastable to the local (n, n/PX, n/PY) block:
    axis 0 holds all i modes; axis 1 the j-chunk owned by this x-index;
    axis 2 the k-chunk owned by this y-index.
    """
    kf = 2.0 * jnp.pi / boxsize
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    xi = jax.lax.axis_index(ax)
    yi = jax.lax.axis_index(ay)
    freqs = (jnp.fft.fftfreq(ngrid) * ngrid).astype(dtype) * kf
    nj = ngrid // px
    nk = ngrid // py
    ki = freqs[:, None, None]
    kj = jax.lax.dynamic_slice(freqs, (xi * nj,), (nj,))[None, :, None]
    kk = jax.lax.dynamic_slice(freqs, (yi * nk,), (nk,))[None, None, :]
    return ki, kj, kk


def make_pfft3d(mesh: Mesh, inverse: bool = False):
    """Jitted global-array pencil FFT over `mesh` axes ('x', 'y').

    Forward: (n,n,n) sharded P('x','y',None) -> complex sharded P(None,'x','y').
    Inverse: the reverse.
    """
    if not inverse:
        fn = jax.shard_map(
            partial(pfft3d_local, ax="x", ay="y"), mesh=mesh,
            in_specs=P("x", "y", None), out_specs=P(None, "x", "y"),
        )
    else:
        fn = jax.shard_map(
            partial(pifft3d_local, ax="x", ay="y"), mesh=mesh,
            in_specs=P(None, "x", "y"), out_specs=P("x", "y", None),
        )
    return jax.jit(fn)
