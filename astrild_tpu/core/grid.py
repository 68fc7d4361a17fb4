"""Array-first containers: 3D grids and flat-sky 2D maps as pytrees.

Replaces the reference's raw np.ndarray + metadata-in-attributes pattern
(e.g. SkyArray at /root/reference/src/astrild/rays/skys/sky_array.py:79-92)
with registered pytrees that flow through jit/vmap/shard_map unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["Grid3D", "SkyGrid"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Grid3D:
    """A periodic cubic grid with physical boxsize [Mpc/h]."""

    values: jnp.ndarray  # (n, n, n)
    boxsize: float       # Mpc/h (static aux data)

    @property
    def ngrid(self) -> int:
        return self.values.shape[-1]

    @property
    def cell_size(self) -> float:
        return self.boxsize / self.ngrid

    def density_contrast(self) -> "Grid3D":
        mean = jnp.mean(self.values)
        return Grid3D(self.values / jnp.where(mean == 0, 1.0, mean) - 1.0,
                      self.boxsize)

    def tree_flatten(self):
        return (self.values,), (self.boxsize,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(values=leaves[0], boxsize=aux[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SkyGrid:
    """Flat-sky square map stack: named layers over a field of view.

    `data` maps layer name -> (npix, npix) array, mirroring SkyArray's
    data{} dict of images (reference sky_array.py:79-92) but as a pytree.
    """

    data: Dict[str, jnp.ndarray]
    opening_angle: float  # field of view, degrees (static)
    quantity: str = "kappa_2"  # primary layer semantic (static)

    @property
    def npix(self) -> int:
        return next(iter(self.data.values())).shape[-1]

    @property
    def pixel_arcmin(self) -> float:
        return self.opening_angle * 60.0 / self.npix

    def layer(self, name: str = "orig") -> jnp.ndarray:
        return self.data[name]

    def with_layer(self, name: str, values: jnp.ndarray) -> "SkyGrid":
        new = dict(self.data)
        new[name] = values
        return SkyGrid(new, self.opening_angle, self.quantity)

    def tree_flatten(self):
        names = tuple(sorted(self.data))
        leaves = tuple(self.data[k] for k in names)
        return leaves, (names, self.opening_angle, self.quantity)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        names, oa, q = aux
        return cls(dict(zip(names, leaves)), oa, q)
