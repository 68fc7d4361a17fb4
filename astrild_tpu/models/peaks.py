"""Peaks: kappa-peak catalog manager with the same profile machinery as
Voids (rebuild of /root/reference/src/astrild/rays/peak.py:23-369)."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import Dataset
from ..io import columnar_h5
from ..ops import profiles as prof_ops

__all__ = ["Peaks"]


class Peaks:
    def __init__(self, data: Dict[str, np.ndarray],
                 skymap_dsc: Optional[dict] = None):
        self.data = data
        self.skymap_dsc = skymap_dsc or {}
        self.profiles = None
        self.field_conversion = None

    @classmethod
    def from_file(cls, ffile: str, skymap_dsc: Optional[dict] = None
                  ) -> "Peaks":
        return cls(columnar_h5.read_table(ffile), skymap_dsc)

    @classmethod
    def from_tunnels_finder(cls, finder, with_radii: bool = True) -> "Peaks":
        # Prefer the per-sigma filtered peaks (carry 'sigma' + per-cut radii,
        # mirroring the reference's peaks_df_sum, tunnel.py:180-240).
        data = getattr(finder, "filtered_peaks", None)
        if data is None:
            data = (finder.set_peak_radii() if with_radii
                    else dict(finder.peaks))
        return cls(dict(data), {"npix": finder.skymap.npix,
                                "opening_angle": finder.skymap.opening_angle})

    @classmethod
    def from_txt(cls, fname: str, npix: int, field_width_deg: float,
                 skymap_dsc: Optional[dict] = None) -> "Peaks":
        """Whitespace table (x_deg, y_deg, nu) + derived pixel coords
        (peak.py:347-365 load_txt_add_pix)."""
        tab = np.loadtxt(fname, ndmin=2)
        scale = npix / field_width_deg
        data = {"x_deg": tab[:, 0], "y_deg": tab[:, 1], "nu": tab[:, 2],
                "x_pix": np.rint(tab[:, 0] * scale).astype(int),
                "y_pix": np.rint(tab[:, 1] * scale).astype(int)}
        return cls(data, skymap_dsc)

    def categorize_sizes(self, bins: int, min_obj_nr: int) -> None:
        """(peak.py categorize_sizes -> ops.object_selection)"""
        from ..ops import object_selection

        self.data = object_selection.categorize_sizes(
            self.data, "log", bins, min_obj_nr)

    def filter_size(self, size_bin: int) -> Dict[str, np.ndarray]:
        keep = np.asarray(self.data["size_cat"]) == size_bin
        return {k: np.asarray(v)[keep] for k, v in self.data.items()}

    def filter_sigma(self, sigma: float) -> Dict[str, np.ndarray]:
        keep = np.asarray(self.data["sigma"]) == sigma
        return {k: np.asarray(v)[keep] for k, v in self.data.items()}

    def set_radii(self, voids_data: Dict[str, np.ndarray]) -> None:
        """Peak radius = distance to nearest void center (peak.py:307-344)."""
        from scipy.spatial import cKDTree

        vp = np.stack([voids_data["x_deg"], voids_data["y_deg"]], axis=-1)
        pp = np.stack([self.data["x_deg"], self.data["y_deg"]], axis=-1)
        dist, _ = cKDTree(vp).query(pp, k=1)
        self.data["rad_deg"] = dist
        npix = self.skymap_dsc.get("npix")
        oa = self.skymap_dsc.get("opening_angle")
        if npix and oa:
            self.data["rad_pix"] = np.rint(dist * npix / oa).astype(int)

    def get_profiles(self, radii_max: float, nr_rad_bins: int, skymap=None,
                     field_conversion=None) -> dict:
        """(peak.py:95-239)"""
        img = jnp.asarray(skymap)
        if field_conversion == "normalize":
            img = img - jnp.mean(img)
        self.field_conversion = field_conversion
        centers = jnp.stack(
            [jnp.asarray(self.data["y_pix"], jnp.int32),
             jnp.asarray(self.data["x_pix"], jnp.int32)], axis=-1)
        radii = jnp.asarray(self.data["rad_pix"], jnp.float32)
        patch_half = int(np.ceil(float(jnp.max(radii)) * radii_max)) + 1
        eta, values = prof_ops.object_profiles(
            img, centers, radii, patch_half=patch_half, nbins=nr_rad_bins,
            extend=radii_max)
        self.profiles = {"radii": np.asarray(eta),
                         "values": np.asarray(values)}
        return self.profiles

    def get_profile_stats(self, n_boot: int = 100) -> Dataset:
        assert self.profiles is not None
        profs = jnp.asarray(self.profiles["values"])
        m = prof_ops.mean_and_interpolate(profs)
        centers = jnp.stack(
            [jnp.asarray(self.data["y_pix"], jnp.int32),
             jnp.asarray(self.data["x_pix"], jnp.int32)], axis=-1)
        npix = self.skymap_dsc.get("npix", 4096)
        lo, hi = prof_ops.bootstrap_profiles(
            profs, centers, jax.random.PRNGKey(0), n_boot=n_boot,
            block_pix=max(npix // 16, 1), npix=npix)
        return Dataset(
            data_vars={"mean": (("radius",), np.asarray(m)),
                       "lowerr": (("radius",), np.asarray(lo)),
                       "higherr": (("radius",), np.asarray(hi))},
            coords={"radius": self.profiles["radii"]},
        )
