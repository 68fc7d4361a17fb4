"""Distributed 3D bispectrum over the device mesh (pencil-FFT shells).

Device-mesh version of ops/bispectrum.bispectrum_3d (itself the working
replacement of the reference's stub bispectrum_3d.py:41-44): the density
grid arrives pencil-sharded P('x','y',None); one forward pencil FFT, then
one inverse pencil FFT per |k| shell produces the real-space shell fields
I_i(x) / n_i(x) on the same pencils, and the triple products reduce with
psum. All collectives are the all_to_all transposes inside pfft3d_local /
pifft3d_local plus per-triple scalar psums — everything rides ICI.

  B(b1,b2,b3) = V^2 * sum_x Re[I_1 I_2 I_3] / sum_x Re[n_1 n_2 n_3]

Identical normalization & shell edges to the single-device estimator
(integer mode radii), so results agree up to fp reassociation
(tests/test_distributed.py::test_distributed_bispectrum_matches_local).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.bispectrum import BispectrumResult
from .pfft import pfft3d_local, pifft3d_local
from .power import local_mode_numbers

__all__ = ["make_distributed_bispectrum", "bispectrum_shard_body"]


def _coarse_size(ngrid: int, m_max: float) -> int:
    """Smallest power-of-two shell-transform grid with no triple aliasing
    (same rule as ops.bispectrum.bispectrum_3d): n_c > 3*m_max."""
    n_c = 16
    while n_c <= 3.0 * float(m_max):
        n_c *= 2
    return min(n_c, ngrid)


def bispectrum_shard_body(block, *, ngrid: int, boxsize: float,
                          nbins: int, m_min: float, m_max: float):
    """Per-shard bispectrum body (runs under shard_map on a pencil block).

    Module-level so composed pipelines (parallel/suite.py) reuse the exact
    estimator; see make_distributed_bispectrum for the algorithm.
    """
    mmax = m_max
    triples = [(a, b, c) for a in range(nbins) for b in range(a, nbins)
               for c in range(b, nbins)]
    n_c = _coarse_size(ngrid, mmax)
    if n_c < ngrid:
        return _bispectrum_body_truncated(block, ngrid, boxsize, nbins,
                                          m_min, mmax, triples, n_c)
    # body below unchanged from the factory's closure
    return _bispectrum_body(block, ngrid, boxsize, nbins, m_min, mmax,
                            triples)


def make_distributed_bispectrum(mesh: Mesh, ngrid: int, boxsize: float,
                                nbins: int = 4, m_min: float = 1.0,
                                m_max: Optional[float] = None):
    """Build a jitted distributed B(k1,k2,k3) estimator over `mesh`.

    Returns fn(grid) -> BispectrumResult where grid is a global (n,n,n)
    density array sharded P('x','y',None); the result is replicated.
    Shells are |k|/kf in [m_min, m_max] (default m_max = n/2 - 1).
    """
    mmax = (ngrid / 2.0 - 1.0) if m_max is None else m_max

    def body(block):
        return bispectrum_shard_body(block, ngrid=ngrid, boxsize=boxsize,
                                     nbins=nbins, m_min=m_min, m_max=mmax)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P("x", "y", None),
        out_specs=BispectrumResult(P(), P(), P(), P(), P()),
    )
    return jax.jit(fn)


def _bispectrum_body_truncated(block, ngrid, boxsize, nbins, m_min, mmax,
                               triples, n_c):
    """Band-limited distributed estimator: ONE forward pencil FFT, then
    the coarse spectrum corner (every mode any shell can select lives at
    |f| <= m_max < n_c/2) is assembled REPLICATED with a single psum of
    n_c^3 complex values (16 MB at n_c=128) and the nbins shell inverse
    transforms run locally at n_c — replacing nbins inverse pencil FFTs
    (2 all_to_all transposes each) with tiny replicated FFTs. Exactness
    argument and normalization: ops.bispectrum._bispectrum_core (the
    truncation is an index relabeling of zero-padded modes; n_c > 3*m_max
    forbids triple-sum aliasing).
    """
    from ..ops.bispectrum import get_bispectrum_tables

    mean = jax.lax.psum(jnp.sum(block), ("x", "y")) / float(ngrid) ** 3
    delta = block / jnp.where(mean == 0, 1.0, mean) - 1.0
    dk = pfft3d_local(delta)                    # (n, n/PX, n/PY)
    # assemble the corner by GATHER, not scatter: a scatter-add over the
    # full shard lowers to a sort on TPU (the documented serialization
    # wall), while a gather costs O(n_c^3) — each shard looks up the
    # coarse modes it owns and the psum assembles/replicates the corner.
    # All index arithmetic is device iota (no multi-MB host constants in
    # the HLO). Pencil layout after pfft3d_local: axis 0 carries the full
    # kx in fftfreq order (mode f sits at row f mod n), axes 1/2 carry
    # contiguous fftfreq-order slices of ky/kz (local_mode_numbers).
    h = n_c // 2
    px = jax.lax.axis_size("x")
    py = jax.lax.axis_size("y")
    xi = jax.lax.axis_index("x")
    yi = jax.lax.axis_index("y")
    nj = ngrid // px
    nk = ngrid // py
    c = jnp.arange(n_c ** 3, dtype=jnp.int32)
    cz = c % n_c
    cy = (c // n_c) % n_c
    cx = c // (n_c * n_c)

    def signed_and_global(ci):
        f = ci - n_c * (ci >= h).astype(jnp.int32)
        return f, jnp.mod(f, ngrid)

    fx, gx = signed_and_global(cx)
    fy, gy = signed_and_global(cy)
    fz, gz = signed_and_global(cz)
    ly = gy - xi * nj
    lz = gz - yi * nk
    # coarse-Nyquist planes (f = -h) hold only modes the shells mask out
    own = ((jnp.abs(fx) < h) & (jnp.abs(fy) < h) & (jnp.abs(fz) < h)
           & (ly >= 0) & (ly < nj) & (lz >= 0) & (lz < nk))
    lidx = (gx * nj + jnp.clip(ly, 0, nj - 1)) * nk \
        + jnp.clip(lz, 0, nk - 1)
    vals = jnp.take(dk.reshape(-1), lidx)
    parts = jnp.stack([jnp.where(own, jnp.real(vals), 0.0),
                       jnp.where(own, jnp.imag(vals), 0.0)])
    parts = jax.lax.psum(parts, ("x", "y"))
    coarse = jax.lax.complex(parts[0], parts[1]).reshape(n_c, n_c, n_c)

    edges_sq, den, mmean, ta, tb, tc = get_bispectrum_tables(
        n_c, nbins, float(m_min), float(mmax))
    f_c = (jnp.fft.fftfreq(n_c) * n_c).astype(jnp.float32)
    m2_c = (f_c[:, None, None] ** 2 + f_c[None, :, None] ** 2
            + f_c[None, None, :] ** 2)

    i_fs = []
    for b in range(nbins):
        mask = ((m2_c >= edges_sq[b]) & (m2_c < edges_sq[b + 1])
                ).astype(jnp.complex64)
        i_fs.append(jnp.real(jnp.fft.ifftn(mask * coarse)))

    kf = 2.0 * jnp.pi / boxsize
    k1, k2, k3, bvals, ntris = [], [], [], [], []
    for t, (a, b, c) in enumerate(triples):
        num = jnp.sum(i_fs[a] * i_fs[b] * i_fs[c])
        d = den[t]
        ntris.append(d * float(n_c) ** 6)
        bvals.append(jnp.where(
            d > 1e-10,
            boxsize ** 6 * num / jnp.maximum(d, 1e-30)
            / float(ngrid) ** 9,
            jnp.nan))
        k1.append(mmean[a] * kf)
        k2.append(mmean[b] * kf)
        k3.append(mmean[c] * kf)
    return BispectrumResult(
        k1=jnp.stack(k1), k2=jnp.stack(k2), k3=jnp.stack(k3),
        b=jnp.stack(bvals), ntri=jnp.stack(ntris))


def _bispectrum_body(block, ngrid, boxsize, nbins, m_min, mmax, triples):
    # SAME squared shell edges as ops.bispectrum: selection runs on the
    # exact integer m2, so shell membership is bit-identical between the
    # local and distributed estimators on ANY backend (sqrt and device
    # linspace never participate in selection)
    from ..ops.bispectrum import shell_edges_sq

    edges_sq = jnp.asarray(shell_edges_sq(m_min, mmax, nbins))
    # density contrast with the global mean
    mean = jax.lax.psum(jnp.sum(block), ("x", "y")) / float(ngrid) ** 3
    delta = block / jnp.where(mean == 0, 1.0, mean) - 1.0
    dk = pfft3d_local(delta)                    # (n, n/PX, n/PY)
    fi, fj, fk = local_mode_numbers(ngrid)
    m2 = fi ** 2 + fj ** 2 + fk ** 2            # exact integers, f32
    m = jnp.sqrt(m2)

    i_fs, n_fs, mmean = [], [], []
    for b in range(nbins):                      # static, small
        mask = ((m2 >= edges_sq[b]) & (m2 < edges_sq[b + 1])
                ).astype(jnp.complex64)
        i_fs.append(jnp.real(pifft3d_local(mask * dk)))
        n_fs.append(jnp.real(pifft3d_local(mask)))
        msum = jax.lax.psum(jnp.sum(jnp.real(mask) * m), ("x", "y"))
        mcnt = jax.lax.psum(jnp.sum(jnp.real(mask)), ("x", "y"))
        mmean.append(msum / jnp.maximum(mcnt, 1.0))

    kf = 2.0 * jnp.pi / boxsize
    k1, k2, k3, bvals, ntris = [], [], [], [], []
    for (a, b, c) in triples:
        num = jax.lax.psum(jnp.sum(i_fs[a] * i_fs[b] * i_fs[c]),
                           ("x", "y"))
        den = jax.lax.psum(jnp.sum(n_fs[a] * n_fs[b] * n_fs[c]),
                           ("x", "y"))
        ntris.append(den * float(ngrid) ** 6)
        bvals.append(jnp.where(
            den > 1e-10,
            boxsize ** 6 * num / jnp.maximum(den, 1e-30)
            / float(ngrid) ** 9,
            jnp.nan))
        k1.append(mmean[a] * kf)
        k2.append(mmean[b] * kf)
        k3.append(mmean[c] * kf)
    return BispectrumResult(
        k1=jnp.stack(k1), k2=jnp.stack(k2), k3=jnp.stack(k3),
        b=jnp.stack(bvals), ntri=jnp.stack(ntris))
