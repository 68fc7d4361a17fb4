"""Artifact save helpers (port of /root/reference/src/astrild/io.py:11-57).

FITS output is gated on astropy being available (it is not in this
environment); npy/h5 cover every internal consumer.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict

import numpy as np

from . import columnar_h5

__all__ = ["save_skymap", "save_columns", "save_tpcf"]


def save_skymap(skymap, path: str) -> str:
    """Map -> .npy (or .fits when astropy is installed) (io.py:11-27)."""
    Path(os.path.dirname(path) or ".").mkdir(parents=True, exist_ok=True)
    arr = np.asarray(skymap)
    if path.endswith(".fits"):
        try:
            from astropy.io import fits
        except ImportError as e:
            raise ImportError("FITS output needs astropy; save as .npy") from e
        fits.PrimaryHDU(arr).writeto(path, overwrite=True)
    else:
        np.save(path, arr)
    return path


def save_columns(dir_out: str, filename: str,
                 columns: Dict[str, np.ndarray]) -> str:
    """Column dict -> columnar h5 (io.py:29-34)."""
    Path(dir_out).mkdir(parents=True, exist_ok=True)
    path = os.path.join(dir_out, filename)
    columnar_h5.write_table(path, columns)
    return path


# DataFrame-compatible alias
save_dataFrame = save_columns


def save_tpcf(dir_out: str, filename: str, r, xi, xi_multipoles=None) -> str:
    """TPCF results -> h5 (io.py:36-57)."""
    cols = {"r": np.asarray(r), "xi": np.asarray(xi)}
    for ell, vals in (xi_multipoles or {}).items():
        cols[f"xi_{ell}"] = np.asarray(vals)
    return save_columns(dir_out, filename, cols)
