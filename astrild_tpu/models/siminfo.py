"""Snapshot-info table generation (z, a, H(z), lookback time, chi).

Port of /root/reference/src/astrild/utils/sim_collection_info.py:1-257: the
per-box/per-snapshot background tables consumed by SimulationCollection
(configs/*_snapshot_info.h5). The reference used a modified-gravity
astropy cosmology ('cvG'); here any utils.cosmology.Cosmology works,
including (w0, wa) backgrounds.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..io import columnar_h5
from ..utils.cosmology import Cosmology

__all__ = ["snapshot_info_table", "write_snapshot_info"]


def snapshot_info_table(redshifts_per_box: Dict[int, Sequence[float]],
                        cosmo: Optional[Cosmology] = None
                        ) -> Dict[str, np.ndarray]:
    """Build the flat (box, snapshot) -> background-quantities table.

    Returns columns: _index_0 (box), _index_1 (snapshot nr), redshift, a,
    Hz [km/s/(Mpc/h)], lookback_time [Gyr], Dc [Mpc/h].
    """
    cosmo = cosmo or Cosmology()
    box_col, snap_col, z_col = [], [], []
    for box, zs in sorted(redshifts_per_box.items()):
        for snap_nr, z in enumerate(zs, start=1):
            box_col.append(box)
            snap_col.append(snap_nr)
            z_col.append(float(z))
    z = np.asarray(z_col)
    return {
        "_index_0": np.asarray(box_col, np.int64),
        "_index_1": np.asarray(snap_col, np.int64),
        "redshift": z,
        "a": 1.0 / (1.0 + z),
        "Hz": np.asarray(cosmo.H(z)),
        "lookback_time": np.asarray(cosmo.lookback_time(z)),
        "Dc": np.asarray(cosmo.comoving_distance(z)),
    }


def write_snapshot_info(path: str,
                        redshifts_per_box: Dict[int, Sequence[float]],
                        cosmo: Optional[Cosmology] = None,
                        key: str = "df") -> str:
    table = snapshot_info_table(redshifts_per_box, cosmo)
    columnar_h5.write_table(path, table, key=key)
    return path
