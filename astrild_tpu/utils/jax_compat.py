"""JAX version/semantics compatibility shims shared across modules.

Single home for the pcast/pvary dance (jax.lax.pvary is deprecated in
favor of jax.lax.pcast(..., to="varying"), but both exist in the wild)
and for matching a value's varying-manual-axes (vma) under shard_map.
"""
from __future__ import annotations

import jax

__all__ = ["pcast_varying", "match_vma"]


def pcast_varying(x, axes):
    """pcast-to-varying with a pvary fallback (pvary is deprecated)."""
    try:
        return jax.lax.pcast(x, tuple(axes), to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, tuple(axes))


def match_vma(tree, ref):
    """Cast every leaf of `tree` to the varying mesh axes of `ref`.

    Under shard_map, scan carries / kernel operands initialized from
    unvarying constants must be pcast to the data stream's vma or vma
    checking rejects the jaxpr. Outside shard_map (no vma) this is a
    no-op, so callers need no branching.
    """
    try:
        vma = frozenset(jax.typeof(ref).vma)
    except Exception:
        return tree
    if not vma:
        return tree

    def cast(c):
        # pcast rejects axes a value ALREADY varies over — cast only the
        # missing ones (leaves may arrive with mixed vma, e.g. a scan
        # init mixing fresh zeros with data-derived seeds)
        try:
            have = frozenset(jax.typeof(c).vma)
        except Exception:
            have = frozenset()
        need = tuple(sorted(vma - have))
        return pcast_varying(c, need) if need else c

    return jax.tree.map(cast, tree)
