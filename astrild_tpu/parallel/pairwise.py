"""Distributed pairwise statistics: ring-rotation pair counting.

Particles shard over the mesh; each step every device evaluates the pair
tiles between its resident chunk and a visiting chunk, then the visiting
chunks rotate one hop around the ring (ppermute over ICI). After P steps
every cross-shard pair was seen exactly once; per-bin partial sums psum
at the end. This is the sharded-particle-axis form of the reference's
thread-parallel pair loops (SURVEY §2), with no size cap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pairwise import _pairwise_accumulate_tiles

__all__ = ["make_distributed_pairwise"]


def make_distributed_pairwise(mesh: Mesh, nbins: int, binwidth: float,
                              axis: str = "sim", block: int = 256,
                              n_valid: int | None = None):
    """Build fn(pos, vel, hat) -> (nom, den) over all global pairs.

    pos/vel sharded P((axis,), None) on the leading dimension (equal chunk
    sizes). The Yasini q_ij needs position unit vectors; they derive from
    pos inside. If the global catalog was zero-padded to equal shards,
    pass n_valid (real row count): padded rows are excluded from pairing
    (a zero row otherwise pairs at separation |p_i| and biases v12).
    """
    nshards = mesh.shape[axis]

    def body(pos, vel):
        me = jax.lax.axis_index(axis)
        nloc = pos.shape[0]
        norm = jnp.linalg.norm(pos, axis=1, keepdims=True)
        hat = pos / jnp.maximum(norm, 1e-12)
        resident = (pos, vel, hat, me)

        def step(carry, k):
            nom, den, visit = carry
            vpos, vvel, vhat, vowner = visit
            # global index offsets decide the i<j dedup
            ia0 = me * nloc
            jb0 = vowner * nloc
            dn, dd = _pairwise_accumulate_tiles(
                pos, vel, hat, vpos, vvel, vhat, ia0, jb0, nbins, binwidth,
                block, n_valid_global=n_valid)
            nom = nom + dn
            den = den + dd
            perm = [(i, (i + 1) % nshards) for i in range(nshards)]
            visit = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm), visit)
            return (nom, den, visit), None

        zero = jnp.zeros((nbins,), jnp.float32) * jnp.sum(pos[:1, :1]) * 0.0
        (nom, den, _), _ = jax.lax.scan(
            step, (zero, zero, (pos, vel, hat,
                                jnp.asarray(me))), jnp.arange(nshards))
        nom = jax.lax.psum(nom, axis)
        den = jax.lax.psum(den, axis)
        return nom, den

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)
