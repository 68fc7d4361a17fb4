"""Distributed pairwise statistics: half-ring rotation pair counting.

Particles shard over the mesh; each step every device evaluates the pair
tiles between its resident chunk and a visiting chunk, then the visiting
chunks rotate one hop around the ring (ppermute over ICI). Only
floor(P/2) rotations run — each unordered shard pair is evaluated from
ONE side (the Yasini terms are i<->j symmetric), not computed twice and
half-masked. Per-bin partial sums psum at the end. This is the
sharded-particle-axis form of the reference's thread-parallel pair loops
(SURVEY §2), with no size cap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pairwise import _pairwise_accumulate_tiles

__all__ = ["make_distributed_pairwise", "make_distributed_ksz"]


def make_distributed_pairwise(mesh: Mesh, nbins: int, binwidth: float,
                              axis: str = "sim", block: int = 256,
                              n_valid: int | None = None,
                              with_valid_mask: bool = False,
                              kind: str = "yasini"):
    """Build fn(pos, vel[, valid]) -> (nom, den) over all global pairs.

    pos/vel sharded P((axis,), None) on the leading dimension (equal chunk
    sizes). The Yasini q_ij needs position unit vectors; they derive from
    pos inside. Padding exclusion, two forms:

    * n_valid (real row count) — only correct when ALL padding sits at
      the global TAIL (single catalog padded once, then sharded).
    * with_valid_mask=True — fn takes a third argument, a per-row
      0/1 validity vector sharded like pos. Use this for catalogs built
      by the multihost striped loader, whose padding sits at the end of
      EACH HOST STRIPE: a global count would pair zero rows (landing
      nom/den at separation |p_i|) and drop real tail rows.
    """
    nshards = mesh.shape[axis]

    # half-ring schedule: visitors flow so that after k hops the chunk at
    # `me` originated at (me + k) mod P; only floor(P/2) rotations run,
    # each unordered shard pair binned from ONE side with no i<j mask
    # (legal because the Yasini pair terms are i<->j symmetric). For even
    # P the final step is seen by both pair members -> global i<j dedup
    # there alone. Halves the dominant cross-tile work vs the full ring.
    perm_back = [((i + 1) % nshards, i) for i in range(nshards)]

    def body(pos, vel, valid=None):
        me = jax.lax.axis_index(axis)
        nloc = pos.shape[0]
        norm = jnp.linalg.norm(pos, axis=1, keepdims=True)
        hat = pos / jnp.maximum(norm, 1e-12)
        resident = ((pos, vel, hat, jnp.asarray(me))
                    if valid is None else
                    (pos, vel, hat, jnp.asarray(me), valid))

        def count(visit, dedup, triangular=False):
            vpos, vvel, vhat, vowner = visit[:4]
            vvalid = visit[4] if valid is not None else None
            return _pairwise_accumulate_tiles(
                pos, vel, hat, vpos, vvel, vhat, me * nloc,
                vowner * nloc, nbins, binwidth, block,
                n_valid_global=n_valid, valid_i=valid, valid_j=vvalid,
                dedup=dedup, triangular=triangular, kind=kind)

        nom, den = count(resident, dedup=True, triangular=True)

        def step(carry, _):
            nom, den, visit = carry
            visit = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm_back), visit)
            dn, dd = count(visit, dedup=False)
            return (nom + dn, den + dd, visit), None

        n_full = (nshards - 1) // 2
        if n_full > 0:
            (nom, den, visit), _ = jax.lax.scan(
                step, (nom, den, resident), None, length=n_full)
        else:
            visit = resident
        if nshards % 2 == 0 and nshards > 1:
            visit = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm_back), visit)
            dn, dd = count(visit, dedup=True)
            nom = nom + dn
            den = den + dd
        nom = jax.lax.psum(nom, axis)
        den = jax.lax.psum(den, axis)
        return nom, den

    if with_valid_mask:
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis)),
            out_specs=(P(), P()),
        )
    else:
        fn = jax.shard_map(
            lambda pos, vel: body(pos, vel), mesh=mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=(P(), P()),
        )
    return jax.jit(fn)


def make_distributed_ksz(mesh: Mesh, nbins: int, binwidth: float,
                         axis: str = "sim", block: int = 256,
                         n_valid: int | None = None,
                         with_valid_mask: bool = False):
    """Distributed kSZ pairwise momentum estimator (Hand+12).

    Built fn(pos, dT[, valid]) -> (nom, den); p_hat = nom/den. dT is a
    flat (n,) vector sharded like pos; it rides the ring embedded in
    column 0 of the velocity slot so the Yasini schedule (half-ring,
    per-shard validity) is reused verbatim (ops.pairwise tile kind='ksz').
    """
    inner = make_distributed_pairwise(
        mesh, nbins, binwidth, axis=axis, block=block, n_valid=n_valid,
        with_valid_mask=with_valid_mask, kind="ksz")

    def fn(pos, dT, valid=None):
        vel = jnp.concatenate(
            [jnp.asarray(dT)[:, None],
             jnp.zeros((dT.shape[0], 2), jnp.float32)], axis=1)
        if valid is None:
            return inner(pos, vel)
        return inner(pos, vel, valid)

    return fn
