"""Compiled-HLO collective inventory for the distributed layer.

The sharding-equivalence tests pin *numerics*; nothing pinned the
*communication structure* — an XLA upgrade that silently turns a
psum_scatter into all-gather+slice, or breaks a pencil re-layout into
extra all-to-alls, passes every equivalence test while destroying the
multi-chip story. This module extracts the collective ops (kind, count,
per-shard output bytes) from a compiled module's optimized HLO so
`tests/test_collective_inventory.py` can assert them against a
checked-in manifest, and so PERFORMANCE.md's ICI-overhead projections
can quote measured byte volumes instead of prose claims.

Replaces the visibility the reference stack got from MPI profilers over
its pfft/pmesh/mpsort pipelines (reference
power_spectrum_3d.py:183-195; SURVEY §5 distributed-backend row).
"""
from __future__ import annotations

import re

import jax

__all__ = ["hlo_collectives", "collective_inventory"]

# dtype -> bytes per element (HLO primitive type names)
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVE_RE = re.compile(
    r"=\s+(?P<out>\([^)]*\)|\S+)\s+"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|all-to-all|"
    r"collective-permute|collective-broadcast)"
    r"(?P<phase>-start|-done)?\(")

_SHAPE_RE = re.compile(r"([a-z]+[0-9]*)\[([0-9,]*)\]")


def _shape_bytes(type_text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def hlo_collectives(hlo_text: str) -> dict:
    """Optimized-HLO text -> {op_kind: {"count": N, "bytes": B}}.

    `bytes` sums the per-shard OUTPUT shape of each collective — the
    well-defined, version-stable proxy for wire volume (the exact
    on-wire bytes depend on the algorithm XLA picks; output bytes pin
    the structure without chasing implementation detail). `-done` halves
    of async pairs are skipped so start/done pairs count once.
    """
    out: dict = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        if m.group("phase") == "-done":
            continue
        op = m.group("op")
        rec = out.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        type_text = m.group("out")
        if m.group("phase") == "-start":
            # async start ops return an (operand-alias, result, ...)
            # tuple; counting the whole tuple would double bytes the
            # moment XLA switches a collective from sync to async with
            # no structural change. The RESULT is the last real shape.
            shapes = _SHAPE_RE.findall(type_text)
            shapes = [s for s in shapes if s[0] in _DTYPE_BYTES]
            if shapes:
                dtype, dims = shapes[-1]
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                rec["bytes"] += n * _DTYPE_BYTES[dtype]
            continue
        rec["bytes"] += _shape_bytes(type_text)
    return out


def collective_inventory(fn, *args) -> dict:
    """Lower+compile `fn(*args)` and return its collective inventory.

    `fn` is any traceable callable (the distributed factories' returns
    qualify); args must carry their real shardings so SPMD partitioning
    sees the intended mesh.
    """
    compiled = jax.jit(fn).lower(*args).compile()
    return hlo_collectives(compiled.as_text())
