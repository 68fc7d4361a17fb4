"""Struct-of-arrays catalog container (halos, voids, peaks, dipoles).

The reference passes pandas DataFrames between every stage; on TPU a catalog
is a dict of same-length device arrays, registered as a pytree so it can be
vmapped/sharded. Host-side conversion to/from pandas lives at the IO
boundary (astrild_tpu.io).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Catalog"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Catalog:
    """Columnar catalog: name -> (n,) or (n, d) array."""

    columns: Dict[str, jnp.ndarray]

    def __len__(self) -> int:
        return int(next(iter(self.columns.values())).shape[0])

    def __getitem__(self, key: str) -> jnp.ndarray:
        return self.columns[key]

    def __contains__(self, key: str) -> bool:
        return key in self.columns

    @property
    def names(self):
        return tuple(sorted(self.columns))

    def with_column(self, name: str, values) -> "Catalog":
        new = dict(self.columns)
        new[name] = jnp.asarray(values)
        return Catalog(new)

    def select(self, mask_or_idx) -> "Catalog":
        """Row selection (host-side / static shapes only)."""
        return Catalog({k: v[mask_or_idx] for k, v in self.columns.items()})

    def positions(self, keys=("x", "y", "z")) -> jnp.ndarray:
        return jnp.stack([self.columns[k] for k in keys], axis=-1)

    @classmethod
    def from_dict(cls, d) -> "Catalog":
        return cls({k: jnp.asarray(v) for k, v in d.items()})

    @classmethod
    def from_dataframe(cls, df) -> "Catalog":
        return cls({str(k): jnp.asarray(np.asarray(df[k])) for k in df.columns})

    def to_dataframe(self):
        import pandas as pd

        cols = {}
        for k, v in self.columns.items():
            arr = np.asarray(v)
            if arr.ndim == 1:
                cols[k] = arr
            else:
                for i in range(arr.shape[1]):
                    cols[f"{k}_{i}"] = arr[:, i]
        return pd.DataFrame(cols)

    def tree_flatten(self):
        names = tuple(sorted(self.columns))
        return tuple(self.columns[k] for k in names), names

    @classmethod
    def tree_unflatten(cls, names, leaves):
        return cls(dict(zip(names, leaves)))
