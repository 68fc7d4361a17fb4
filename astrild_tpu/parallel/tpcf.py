"""Distributed two-point correlation function: half-ring pair counts.

The ring-rotation schedule of parallel/pairwise.py applied to the
redshift-space xi(s, mu) estimator (ops/tpcf.py), with the half-ring
refinement: after the self step, visitors rotate so that at step k the
visitor chunk originated at (me + k) mod P, and only floor(P/2) rotations
run — each unordered shard pair is binned from ONE side with no i<j mask
(the chunks are disjoint), instead of being computed from both sides and
half-discarded. For even P the final step (k = P/2) is seen by both
members of each pair, so there alone the global i<j dedup applies.
Per-(s, mu)-bin partial counts psum at the end. Replaces the single-node
halotools s_mu_tpcf usage the reference capped at one machine
(/root/reference/src/astrild/particles/hutils/tpcf.py:18-105) with no
size limit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.tpcf import (_check_halfbox, _check_halfbox_projected,
                        _s_mu_accumulate_tiles, _wp_from_counts)

__all__ = ["make_distributed_tpcf_s_mu",
           "make_distributed_projected_tpcf",
           "make_distributed_shear_xi"]


def _make_counts_fn(mesh, boxsize, s_edges, ns, nmu, los, axis, block,
                    n_valid, with_valid_mask, coords="s_mu",
                    pi_max=None):
    """Half-ring pair-count closure shared by the s-mu and (rp, pi)
    factories. Returns fn(cx, cy, cz[, valid]) -> (counts, n_real)."""
    nshards = mesh.shape[axis]
    perm_back = [((i + 1) % nshards, i) for i in range(nshards)]

    def body(cx, cy, cz, valid=None):
        me = jax.lax.axis_index(axis)
        nloc = cx.shape[0]
        comps = (cx.astype(jnp.float32), cy.astype(jnp.float32),
                 cz.astype(jnp.float32))

        def count(visit, dedup, triangular=False):
            vcomps = visit[:3]
            vowner = visit[3]
            vvalid = visit[4] if valid is not None else None
            return _s_mu_accumulate_tiles(
                comps, vcomps, me * nloc, vowner * nloc, s_edges, ns,
                nmu, los, boxsize, block=block,
                n_valid_global=n_valid, valid_i=valid, valid_j=vvalid,
                dedup=dedup, triangular=triangular, coords=coords,
                pi_max=pi_max)

        resident = comps + (jnp.asarray(me),) + (
            (valid,) if valid is not None else ())
        counts = count(resident, dedup=True, triangular=True)

        n_full = (nshards - 1) // 2

        def step(carry, _):
            acc, visit = carry
            visit = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm_back), visit)
            return (acc + count(visit, dedup=False), visit), None

        if n_full > 0:
            (counts, visit), _ = jax.lax.scan(
                step, (counts, resident), None, length=n_full)
        else:
            visit = resident
        if nshards % 2 == 0 and nshards > 1:
            visit = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm_back), visit)
            counts = counts + count(visit, dedup=True)

        counts = jax.lax.psum(counts, axis)
        if valid is not None:
            n_real = jax.lax.psum(jnp.sum(valid > 0), axis)
        elif n_valid is not None:
            n_real = jnp.asarray(n_valid)
        else:
            n_real = jax.lax.psum(jnp.asarray(nloc), axis)
        return counts, n_real

    row = P(axis)
    if with_valid_mask:
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(row, row, row, row),
                           out_specs=(P(), P()))
    else:
        fn = jax.shard_map(lambda cx, cy, cz: body(cx, cy, cz),
                           mesh=mesh, in_specs=(row, row, row),
                           out_specs=(P(), P()))
    return jax.jit(fn)


def make_distributed_tpcf_s_mu(mesh: Mesh, boxsize, s_edges, nmu: int = 20,
                               los: int = 2, axis: str = "sim",
                               block: int = 256,
                               n_valid: int | None = None,
                               with_valid_mask: bool = False):
    """Build fn(pos[, valid]) -> (s_centers, mu_centers, xi) over all
    global pairs.

    pos: EITHER an (n, 3) array sharded P(axis, None) (convenient at
    small n) or a tuple of flat (x, y, z) component buffers each sharded
    P(axis) — prefer the tuple at large n: a resident (n, 3) device
    array pads its 3-wide minor dim to 128 lanes (42x HBM, CLAUDE.md).
    Equal chunk sizes, multiples of `block`. xi uses the analytic
    periodic RR of ops.tpcf.tpcf_s_mu with the GLOBAL real-row count.
    Padding exclusion as in make_distributed_pairwise:

    * n_valid — real global row count; only correct when all padding
      sits at the global tail.
    * with_valid_mask=True — fn takes a per-row 0/1 validity vector
      sharded like pos (the multihost striped loader's per-stripe
      padding).
    """
    _check_halfbox(s_edges, boxsize)
    s_edges = jnp.asarray(s_edges, jnp.float32)
    ns = int(s_edges.shape[0]) - 1
    fn = _make_counts_fn(mesh, boxsize, s_edges, ns, nmu, los, axis,
                         block, n_valid, with_valid_mask)

    def tpcf(pos, valid=None):
        if (valid is not None) != with_valid_mask:
            # silently dropping a mask would count padding rows as real
            # particles (DD spikes at the pad positions' separations)
            raise ValueError(
                "valid mask mismatch: build the factory with "
                f"with_valid_mask={valid is not None} to "
                + ("use" if valid is not None else "omit") + " a mask")
        if isinstance(pos, (tuple, list)):
            cx, cy, cz = pos
        else:
            cx, cy, cz = pos[:, 0], pos[:, 1], pos[:, 2]
        counts, n_real = (fn(cx, cy, cz, valid) if with_valid_mask
                          else fn(cx, cy, cz))
        dd = counts.reshape(ns, nmu)
        n = n_real.astype(jnp.float32)
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


def make_distributed_projected_tpcf(mesh: Mesh, boxsize, rp_edges,
                                    pi_max, n_pi: int = 40, los: int = 2,
                                    axis: str = "sim", block: int = 256,
                                    n_valid: int | None = None,
                                    with_valid_mask: bool = False):
    """Distributed wp(rp): the half-ring schedule in (rp, |pi|) bins.

    Same contract as make_distributed_tpcf_s_mu; returns fn(pos[, valid])
    -> (rp_centers, wp, xi_rp_pi), matching ops.tpcf.projected_tpcf.
    """
    _check_halfbox_projected(rp_edges, pi_max, boxsize)
    rp_edges = jnp.asarray(rp_edges, jnp.float32)
    ns = int(rp_edges.shape[0]) - 1
    fn = _make_counts_fn(mesh, boxsize, rp_edges, ns, n_pi, los, axis,
                         block, n_valid, with_valid_mask,
                         coords="rp_pi", pi_max=pi_max)

    def wp_fn(pos, valid=None):
        if (valid is not None) != with_valid_mask:
            raise ValueError(
                "valid mask mismatch: build the factory with "
                f"with_valid_mask={valid is not None}")
        if isinstance(pos, (tuple, list)):
            cx, cy, cz = pos
        else:
            cx, cy, cz = pos[:, 0], pos[:, 1], pos[:, 2]
        counts, n_real = (fn(cx, cy, cz, valid) if with_valid_mask
                          else fn(cx, cy, cz))
        dd = counts.reshape(ns, n_pi)
        return _wp_from_counts(dd, n_real.astype(jnp.float32), rp_edges,
                               pi_max, n_pi, boxsize)

    return wp_fn


def make_distributed_shear_xi(mesh: Mesh, theta_edges, axis: str = "sim",
                              block: int = 256, boxsize=None):
    """Distributed catalog shear-shear correlation (ops.shear_2pt
    .xi_pm_catalog) on the half-ring schedule.

    Returns fn(x, y, e1, e2, w) -> (xi_plus, xi_minus, npairs) over ALL
    global pairs; every input is a flat per-component buffer sharded
    P(axis) with equal chunks (multiples of `block`). Padding rows carry
    w = 0 (zero-weight pairs are excluded from all channels including
    npairs). boxsize enables the periodic minimum image (catalogs drawn
    from periodic shear maps).
    """
    from ..ops.shear_2pt import _shear_pair_tiles

    edges = jnp.asarray(theta_edges, jnp.float32)
    nbins = int(edges.shape[0]) - 1
    nshards = mesh.shape[axis]
    perm_back = [((i + 1) % nshards, i) for i in range(nshards)]

    def body(x, y, e1, e2, w):
        me = jax.lax.axis_index(axis)
        nloc = x.shape[0]
        mine = (x, y, e1, e2, w)

        def count(visit, dedup, triangular=False):
            vx, vy, ve1, ve2, vw, vowner = visit
            return _shear_pair_tiles(
                x, y, e1, e2, w, vx, vy, ve1, ve2, vw, edges, nbins,
                boxsize, block, dedup, triangular=triangular,
                ia0=me * nloc, jb0=vowner * nloc)

        resident = mine + (jnp.asarray(me),)
        sums = count(resident, dedup=True, triangular=True)

        n_full = (nshards - 1) // 2

        def step(carry, _):
            acc, visit = carry
            visit = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, perm_back), visit)
            return (acc + count(visit, dedup=False), visit), None

        if n_full > 0:
            (sums, visit), _ = jax.lax.scan(
                step, (sums, resident), None, length=n_full)
        else:
            visit = resident
        if nshards % 2 == 0 and nshards > 1:
            visit = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, perm_back), visit)
            sums = sums + count(visit, dedup=True)
        return jax.lax.psum(sums, axis)

    row = P(axis)
    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=(row,) * 5, out_specs=P()))

    def shear_xi(x, y, e1, e2, weights=None):
        x = jnp.asarray(x, jnp.float32)
        nloc, rem = divmod(x.shape[0], nshards)
        if rem or nloc % block or nloc < block:
            raise ValueError(
                f"make_distributed_shear_xi: {x.shape[0]} rows over "
                f"{nshards} shards gives per-shard chunks of {nloc} "
                f"(+{rem}); chunks must be nonzero multiples of "
                f"block={block} — pad with zero-weight rows")
        w = (jnp.ones_like(x) if weights is None
             else jnp.asarray(weights, jnp.float32))
        sums = fn(x, jnp.asarray(y, jnp.float32),
                  jnp.asarray(e1, jnp.float32),
                  jnp.asarray(e2, jnp.float32), w)
        ww = jnp.maximum(sums[4], 1e-30)
        return sums[0] / ww, sums[1] / ww, sums[5]

    return shear_xi
