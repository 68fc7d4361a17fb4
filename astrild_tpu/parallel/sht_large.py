"""Distributed large-lmax SHT: Legendre m-blocks sharded over the mesh.

The production-scale transforms (ops/sht_large.py: ring FFTs + m-blocked
on-device Legendre scans, lmax <= 4*nside-1) spend >90% of their time in
the per-m-block scans — and the blocks are independent. This module
shards the m-block axis over a mesh axis: each device scans its blocks,
then ONE psum assembles the full ring-coefficient plane (synthesis) or
the alm columns (analysis). The ring-FFT/cap tail and quadrature head
(shared single-home functions `_synth_from_c` / `_quadrature_sums`) are
cheap next to the scans and run replicated.

Complements parallel/sht.py, which ring-shards the TABLE path
(lmax <~ 512); this is its scan-path counterpart for nside 1024-2048
production maps (the reference's healpy working point,
/root/reference/src/astrild/rays/skys/sky_healpix.py:218-241 — healpy
itself is OpenMP single-node; this scales over a TPU pod axis).

Gathers use embed-at-offset + psum, NOT all_gather: all_gather output
stays device-varying under vma checking, which would forbid the
replicated P() out_specs (same pattern as parallel/suite.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import sht_large as sl
from ..ops import sht_spin_large as ssl
from ..ops.sht import alm2cl

__all__ = ["make_distributed_sht_large",
           "make_distributed_sht_spin2_large",
           "make_distributed_sht_spin1_large"]


def _interleave_helpers(nproc: int, nbl: int, B: int, Lp1: int,
                        nb_p: int):
    """Device-major block permutation + alm->block packer for the
    interleaved m-block assignment (ONE home: the permutation is the
    load-bearing contract between _to_blocks and the factories'
    m0 = (i * nproc + idx) * B arithmetic)."""
    blk_perm = np.concatenate(
        [[i * nproc + d for i in range(nbl)] for d in range(nproc)])

    def to_blocks(alm):
        a = jnp.pad(jnp.asarray(alm, jnp.float32),
                    ((0, 0), (0, nb_p * B - Lp1)))
        return jnp.moveaxis(a.reshape(Lp1, nb_p, B), 1, 0)[blk_perm]

    return to_blocks


def make_distributed_sht_large(mesh: Mesh, nside: int, lmax: int,
                               ax: str = "x"):
    """Build jitted m-sharded (synthesize, analyze) over mesh axis `ax`.

    synthesize(alm_re, alm_im) -> (npix,) RING map, replicated.
    analyze(hpmap, niter, method) -> (alm_re, alm_im), replicated —
      same jacobi/cg semantics as ops.sht_large.analyze_large (matvecs
      are the distributed transforms).

    alm layout matches ops/sht_large: (lmax+1, lmax+1) [l, m] real pairs.
    The m-block count is padded to a multiple of the axis size with
    blocks whose alm/q rows are zero (m > lmax never seeds the
    recursion), so any lmax works on any mesh.
    """
    B = sl._MBLOCK
    Lp1 = lmax + 1
    nb = -(-Lp1 // B)
    nproc = mesh.shape[ax]
    nb_p = -(-nb // nproc) * nproc
    nbl = nb_p // nproc
    tab = sl.sht_large_tables(nside, lmax)
    # re-pad mm_log2 so padded blocks (m > lmax) read real (finite) rows;
    # their contributions vanish because alm/q rows are zero there and
    # l >= m never fires in the recursion mask
    pad_m = nb_p * B - int(tab.mm_log2.shape[0])
    if pad_m > 0:
        tab = tab._replace(mm_log2=jnp.pad(tab.mm_log2, (0, pad_m)))
    nring = int(tab.x.shape[0])
    npix = int(tab.flat_idx.shape[0])
    n_tab = len(tab)

    def synth_body(alm_re_blk, alm_im_blk, *tab_leaves):
        # INTERLEAVED block assignment: device idx owns true blocks
        # {i * nproc + idx}, so local block i has m0 >= i * nproc * B —
        # a STATIC lower bound that lets each scan start there
        # (triangular shortening; contiguous assignment would leave the
        # bound at i * B and the work imbalanced across devices)
        t = sl.LargeSHTTables(*tab_leaves)
        idx = jax.lax.axis_index(ax)
        full_re = jnp.zeros((nb_p * B, nring), jnp.float32)
        full_im = jnp.zeros((nb_p * B, nring), jnp.float32)
        for i in range(nbl):
            m0 = (i * nproc + idx) * B
            c = sl._legendre_scan(m0, t, lmax,
                                  alm_rows=(alm_re_blk[i], alm_im_blk[i]),
                                  l_start=i * nproc * B)
            full_re = jax.lax.dynamic_update_slice(full_re, c[0], (m0, 0))
            full_im = jax.lax.dynamic_update_slice(full_im, c[1], (m0, 0))
        c_re = jax.lax.psum(full_re, ax)[:Lp1]
        c_im = jax.lax.psum(full_im, ax)[:Lp1]
        return sl._synth_from_c(c_re, c_im, t, nside, lmax)

    synth = jax.jit(jax.shard_map(
        synth_body, mesh=mesh,
        in_specs=(P(ax), P(ax)) + (P(),) * n_tab,
        out_specs=P()))

    def adjoint_body(hpmap, *tab_leaves):
        t = sl.LargeSHTTables(*tab_leaves)
        d_re, d_im = sl._quadrature_sums(hpmap, t, nside, lmax)
        d_re = jnp.pad(d_re, ((0, nb_p * B - Lp1), (0, 0)))
        d_im = jnp.pad(d_im, ((0, nb_p * B - Lp1), (0, 0)))
        idx = jax.lax.axis_index(ax)
        full_re = jnp.zeros((Lp1, nb_p * B), jnp.float32)
        full_im = jnp.zeros((Lp1, nb_p * B), jnp.float32)
        for i in range(nbl):
            # interleaved assignment + static scan start (see synth_body)
            m0 = (i * nproc + idx) * B
            qr = jax.lax.dynamic_slice_in_dim(d_re, m0, B, axis=0)
            qi = jax.lax.dynamic_slice_in_dim(d_im, m0, B, axis=0)
            o = sl._legendre_scan(m0, t, lmax, q=(qr, qi),
                                  l_start=i * nproc * B)
            full_re = jax.lax.dynamic_update_slice(full_re, o[0], (0, m0))
            full_im = jax.lax.dynamic_update_slice(full_im, o[1], (0, m0))
        wq = 4.0 * jnp.pi / npix
        a_re = jax.lax.psum(full_re, ax)[:, :Lp1]
        a_im = jax.lax.psum(full_im, ax)[:, :Lp1]
        return wq * a_re, wq * a_im

    adjoint = jax.jit(jax.shard_map(
        adjoint_body, mesh=mesh,
        in_specs=(P(),) + (P(),) * n_tab,
        out_specs=(P(), P())))

    _to_blocks = _interleave_helpers(nproc, nbl, B, Lp1, nb_p)

    def synthesize(alm_re, alm_im):
        return synth(_to_blocks(alm_re), _to_blocks(alm_im), *tab)

    def analyze(hpmap, niter: int = 3, method: str = "auto"):
        if method not in ("auto", "cg", "jacobi"):
            raise ValueError(f"method must be 'auto', 'cg' or 'jacobi', "
                             f"got {method!r}")
        if method == "auto":
            method = "cg" if lmax > 2 * nside else "jacobi"
        hpmap = jnp.asarray(hpmap, jnp.float32)
        b = adjoint(hpmap, *tab)
        if method == "cg" and niter > 0:
            from jax.scipy.sparse.linalg import cg

            # same S^T S normal equations as ops.sht_large.analyze_large:
            # the quadrature adjoint omits the m>0 factor-2 synthesis
            # carries, so restore the true transpose with the m-weighting
            mg = jnp.arange(Lp1)[None, :]
            wm = jnp.where(mg == 0, 1.0, 2.0).astype(jnp.float32)

            def mul_w(t):
                return t[0] * wm, t[1] * wm

            def matvec(a):
                return mul_w(adjoint(synthesize(a[0], a[1]), *tab))

            (a_re, a_im), _ = cg(matvec, mul_w(b), x0=b, maxiter=niter)
            return a_re, a_im
        a_re, a_im = b
        for _ in range(niter):
            resid = hpmap - synthesize(a_re, a_im)
            d_re, d_im = adjoint(resid, *tab)
            a_re, a_im = a_re + d_re, a_im + d_im
        return a_re, a_im

    return synthesize, analyze


def make_distributed_sht_spin2_large(mesh: Mesh, nside: int, lmax: int,
                                     ax: str = "x"):
    """m-sharded spin-2 scan-path SHT: full-sky shear E/B at pod scale.

    synthesize(e_re, e_im, b_re, b_im) -> (Q, U) RING maps, replicated.
    analyze(q, u, niter, method) -> (e_re, e_im, b_re, b_im), replicated
      (same jacobi/cg semantics as ops.sht_spin_large.analyze_spin2_large).

    Each device runs its m-blocks' Wigner-d scans (both m1 = +-2
    columns) and folds locally; one psum assembles the 4 ring-coefficient
    planes (synthesis) / the 4 alm channels (analysis). The belt-FFT/cap
    tail and quadrature head (shared `_synth_from_g` /
    `_spin_quadrature_sums`) run replicated.
    """
    return _make_distributed_spin_large(
        mesh, nside, lmax, ax, ssl.spin2_large_tables(nside, lmax),
        ssl._fold_block, ssl._adjoint_block, lmin=2)


def make_distributed_sht_spin1_large(mesh: Mesh, nside: int, lmax: int,
                                     ax: str = "x"):
    """m-sharded spin-1 scan-path SHT: deflection (gradient/curl) fields
    at pod scale — the distributed engine for production lensed-CMB
    synthesis and curved-sky deflection analysis.

    synthesize(e_re, e_im, b_re, b_im) -> (alpha_theta, alpha_phi);
    analyze(a_t, a_p, niter, method) -> the spin-1 E/B alms (conventions
    of ops.sht_spin.synthesize_spin1; E = sqrt(l(l+1)) psi for a pure
    gradient)."""
    return _make_distributed_spin_large(
        mesh, nside, lmax, ax, ssl.spin1_large_tables(nside, lmax),
        ssl._fold_block_spin1, ssl._adjoint_block_spin1, lmin=1)


def _make_distributed_spin_large(mesh: Mesh, nside: int, lmax: int,
                                 ax: str, tab, fold_block, adjoint_block,
                                 lmin: int):
    """Spin-generic m-sharded scan-path factory (the two public
    factories above differ only in tables, fold/adjoint blocks and the
    l >= spin mask)."""
    B = ssl._MBLOCK
    Lp1 = lmax + 1
    nb = -(-Lp1 // B)
    nproc = mesh.shape[ax]
    nb_p = -(-nb // nproc) * nproc
    nbl = nb_p // nproc
    pad_m = nb_p * B - int(tab.lnc.shape[0])
    if pad_m > 0:
        tab = tab._replace(
            lnc=jnp.pad(tab.lnc, (0, pad_m)),
            base=tab.base._replace(mm_log2=jnp.pad(
                tab.base.mm_log2,
                (0, nb_p * B - int(tab.base.mm_log2.shape[0])))))
    nring = int(tab.base.x.shape[0])
    npix = int(tab.base.flat_idx.shape[0])
    tab_leaves, tab_tree = jax.tree.flatten(tab)
    n_tab = len(tab_leaves)

    def synth_body(er_blk, ei_blk, br_blk, bi_blk, *leaves):
        # interleaved block assignment + static scan-start lower bound
        # (see make_distributed_sht_large.synth_body)
        t = jax.tree.unflatten(tab_tree, leaves)
        idx = jax.lax.axis_index(ax)
        fulls = [jnp.zeros((nb_p * B, nring), jnp.float32)
                 for _ in range(4)]
        for i in range(nbl):
            m0 = (i * nproc + idx) * B
            blk_rows = (er_blk[i], ei_blk[i], br_blk[i], bi_blk[i])
            for k, g in enumerate(fold_block(m0, t, lmax, blk_rows,
                                             l_start=i * nproc * B)):
                fulls[k] = jax.lax.dynamic_update_slice(fulls[k], g,
                                                        (m0, 0))
        g4 = [jax.lax.psum(f, ax)[:Lp1] for f in fulls]
        return ssl._synth_from_g(*g4, t, nside, lmax)

    synth = jax.jit(jax.shard_map(
        synth_body, mesh=mesh,
        in_specs=(P(ax),) * 4 + (P(),) * n_tab,
        out_specs=(P(), P())))

    def adjoint_body(q, u, *leaves):
        t = jax.tree.unflatten(tab_tree, leaves)
        dgs = ssl._spin_quadrature_sums(q, u, t, nside, lmax)
        dgs = tuple(jnp.pad(d, ((0, nb_p * B - Lp1), (0, 0)))
                    for d in dgs)
        idx = jax.lax.axis_index(ax)
        fulls = [jnp.zeros((Lp1, nb_p * B), jnp.float32)
                 for _ in range(4)]
        for i in range(nbl):
            m0 = (i * nproc + idx) * B
            sls = tuple(jax.lax.dynamic_slice_in_dim(d, m0, B, axis=0)
                        for d in dgs)
            for k, c in enumerate(adjoint_block(m0, t, lmax, sls,
                                                l_start=i * nproc * B)):
                fulls[k] = jax.lax.dynamic_update_slice(fulls[k], c,
                                                        (0, m0))
        a4 = [jax.lax.psum(f, ax)[:, :Lp1] for f in fulls]
        vre, vim = ssl._alm_masks(lmax, npix, lmin=lmin)
        return a4[0] * vre, a4[1] * vim, a4[2] * vre, a4[3] * vim

    adjoint = jax.jit(jax.shard_map(
        adjoint_body, mesh=mesh,
        in_specs=(P(), P()) + (P(),) * n_tab,
        out_specs=(P(),) * 4))

    _to_blocks = _interleave_helpers(nproc, nbl, B, Lp1, nb_p)

    def synthesize(e_re, e_im, b_re, b_im):
        return synth(_to_blocks(e_re), _to_blocks(e_im),
                     _to_blocks(b_re), _to_blocks(b_im), *tab_leaves)

    def analyze(q, u, niter: int = 3, method: str = "auto"):
        if method not in ("auto", "cg", "jacobi"):
            raise ValueError(f"method must be 'auto', 'cg' or 'jacobi', "
                             f"got {method!r}")
        if method == "auto":
            method = "cg" if lmax > 2 * nside else "jacobi"
        q = jnp.asarray(q, jnp.float32)
        u = jnp.asarray(u, jnp.float32)
        b = adjoint(q, u, *tab_leaves)
        if method == "cg" and niter > 0:
            from jax.scipy.sparse.linalg import cg

            mg = jnp.arange(Lp1)[None, :]
            unhalf = jnp.where(mg == 0, 1.0, 2.0).astype(jnp.float32)

            def mul(t):
                return tuple(a * unhalf for a in t)

            def matvec(a):
                return mul(adjoint(*synthesize(*a), *tab_leaves))

            alm, _ = cg(matvec, mul(b), x0=b, maxiter=niter)
            return alm
        alm = b
        for _ in range(niter):
            sq, su = synthesize(*alm)
            d = adjoint(q - sq, u - su, *tab_leaves)
            alm = tuple(a + da for a, da in zip(alm, d))
        return alm

    return synthesize, analyze
