"""Distributed two-point correlation function: ring-rotation pair counts.

The same schedule as parallel/pairwise.py applied to the redshift-space
xi(s, mu) estimator (ops/tpcf.py): catalogs shard over a mesh axis, each
step every device bins the pair tiles between its resident chunk and a
visiting chunk (global i < j dedup), the visitors rotate one hop around
the ring (ppermute over ICI), and per-(s, mu)-bin partial counts psum at
the end. Replaces the single-node halotools s_mu_tpcf usage the
reference capped at one machine
(/root/reference/src/astrild/particles/hutils/tpcf.py:18-105) with no
size limit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.tpcf import _check_halfbox, _s_mu_accumulate_tiles

__all__ = ["make_distributed_tpcf_s_mu"]


def make_distributed_tpcf_s_mu(mesh: Mesh, boxsize, s_edges, nmu: int = 20,
                               los: int = 2, axis: str = "sim",
                               block: int = 256,
                               n_valid: int | None = None,
                               with_valid_mask: bool = False):
    """Build fn(pos[, valid]) -> (s_centers, mu_centers, xi) over all
    global pairs.

    pos sharded P((axis,), None) on the leading dimension (equal chunk
    sizes, multiples of `block`). xi uses the analytic periodic RR of
    ops.tpcf.tpcf_s_mu with the GLOBAL real-row count. Padding exclusion
    as in make_distributed_pairwise:

    * n_valid — real global row count; only correct when all padding
      sits at the global tail.
    * with_valid_mask=True — fn takes a per-row 0/1 validity vector
      sharded like pos (the multihost striped loader's per-stripe
      padding).
    """
    _check_halfbox(s_edges, boxsize)
    s_edges = jnp.asarray(s_edges, jnp.float32)
    ns = int(s_edges.shape[0]) - 1
    nshards = mesh.shape[axis]

    def body(pos, valid=None):
        me = jax.lax.axis_index(axis)
        nloc = pos.shape[0]
        pos = pos.astype(jnp.float32)
        resident = ((pos, jnp.asarray(me)) if valid is None
                    else (pos, jnp.asarray(me), valid))

        def step(carry, _):
            counts, visit = carry
            vpos, vowner = visit[:2]
            vvalid = visit[2] if valid is not None else None
            ia0 = me * nloc
            jb0 = vowner * nloc
            dc = _s_mu_accumulate_tiles(
                pos, vpos, ia0, jb0, s_edges, ns, nmu, los, boxsize,
                block=block, n_valid_global=n_valid,
                valid_i=valid, valid_j=vvalid)
            perm = [(i, (i + 1) % nshards) for i in range(nshards)]
            visit = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm), visit)
            return (counts + dc, visit), None

        zero = jnp.zeros((ns * nmu,), jnp.float32) \
            * jnp.sum(pos[:1, :1]) * 0.0
        (counts, _), _ = jax.lax.scan(step, (zero, resident),
                                      jnp.arange(nshards))
        counts = jax.lax.psum(counts, axis)
        if valid is not None:
            n_real = jax.lax.psum(jnp.sum(valid > 0), axis)
        elif n_valid is not None:
            n_real = jnp.asarray(n_valid)
        else:
            n_real = jax.lax.psum(jnp.asarray(nloc), axis)
        return counts, n_real

    if with_valid_mask:
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(P(axis, None), P(axis)),
                           out_specs=(P(), P()))
    else:
        fn = jax.shard_map(lambda pos: body(pos), mesh=mesh,
                           in_specs=P(axis, None), out_specs=(P(), P()))
    fn = jax.jit(fn)

    def tpcf(pos, valid=None):
        counts, n_real = (fn(pos, valid) if with_valid_mask
                          else fn(pos))
        dd = counts.reshape(ns, nmu)
        n = n_real.astype(jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        vshell = 4.0 / 3.0 * jnp.pi * (s_edges[1:] ** 3
                                       - s_edges[:-1] ** 3)
        npairs = n * (n - 1.0) / 2.0
        rr = npairs * vshell[:, None] * (1.0 / nmu) / boxsize ** 3
        xi = jnp.where(rr > 0, dd / jnp.maximum(rr, 1e-30) - 1.0,
                       jnp.nan)
        s_centers = 0.5 * (s_edges[1:] + s_edges[:-1])
        mu_centers = (jnp.arange(nmu) + 0.5) / nmu
        return s_centers, mu_centers, xi

    return tpcf
