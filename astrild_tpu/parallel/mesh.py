"""Device-mesh construction for the engine's parallel axes.

The engine's mesh axes mirror the reference's parallelism inventory
(SURVEY.md §2): 'sim' = data-parallel over the simulation array
(realizations x redshifts x gravity models — the reference's serial
SimulationCollection loops, /root/reference/src/astrild/simcoll.py:152-165),
and 'x'/'y' = domain decomposition of 3D FFT grids (the reference's
nbodykit/pfft pencil decomposition via MPI).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "sim_axis_mesh", "pencil_sharding", "replicated"]


def make_mesh(n_sim: int = 1, n_x: int = 1, n_y: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ('sim', 'x', 'y'); total size must divide device count."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_sim * n_x * n_y
    if need > len(devices):
        raise ValueError(f"mesh {n_sim}x{n_x}x{n_y} needs {need} devices, "
                         f"have {len(devices)}")
    dev = np.array(devices[:need]).reshape(n_sim, n_x, n_y)
    return Mesh(dev, axis_names=("sim", "x", "y"))


def sim_axis_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """All devices on the 'sim' (data-parallel) axis."""
    devices = list(devices if devices is not None else jax.devices())
    return make_mesh(n_sim=len(devices), devices=devices)


def auto_mesh(devices: Optional[Sequence] = None, n_sim: int = 1) -> Mesh:
    """Split the remaining devices into as-square-as-possible (x, y)."""
    devices = list(devices if devices is not None else jax.devices())
    rest = len(devices) // n_sim
    nx = 1
    for cand in range(int(math.isqrt(rest)), 0, -1):
        if rest % cand == 0:
            nx = cand
            break
    return make_mesh(n_sim=n_sim, n_x=nx, n_y=rest // nx, devices=devices)


def pencil_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Sharding for an (n, n, n) grid: first two axes over ('x', 'y').

    With batched=True the leading axis is the simulation axis.
    """
    if batched:
        return NamedSharding(mesh, P("sim", "x", "y"))
    return NamedSharding(mesh, P("x", "y", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
