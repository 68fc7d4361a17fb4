"""Void finding + void-catalog analysis on flat-sky maps.

Rebuild of the reference's TunnelsFinder (rays/voids/tunnel.py:26-470 — the
external void_finder_spherical_2D binary becomes ops.voids.find_tunnels),
WatershedFinder (rays/voids/watershed.py + rays/utils/watershed_voids.py)
and the Voids catalog manager (rays/void.py:23-545: void size function,
radial profiles, bootstrap stats, tangential shear).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dataset import Dataset
from ..io import columnar_h5
from ..ops import filters as filter_ops
from ..ops import object_selection
from ..ops import peaks as peak_ops
from ..ops import profiles as prof_ops
from ..ops import voids as void_ops

__all__ = ["TunnelsFinder", "WatershedFinder", "SphericalVoidFinder3D",
           "WatershedFinder3D", "Voids", "load_void_config"]


def load_void_config(name_or_path) -> dict:
    """Load a void-profiling parameter file (the reference's
    configs/{tunnels,svf,zobov}_isw.json contract: extend,
    nr_profile_bins, nr_radius_bins, obj_num_in_radbin).

    Accepts a path, or a shipped template name ("tunnels_isw",
    "svf_isw", "zobov_isw" — with or without the .json suffix) resolved
    against the packaged astrild_tpu/configs directory.
    """
    import json

    p = Path(name_or_path)
    if not p.exists():
        if len(p.parts) > 1:
            # a path with directories must not silently fall back to the
            # shipped template of the same name — a typo'd directory
            # would load default parameters in place of the user's
            raise FileNotFoundError(f"void config {name_or_path!r} not "
                                    "found")
        name = p.name if p.name.endswith(".json") else p.name + ".json"
        p = Path(__file__).resolve().parent.parent / "configs" / name
    if not p.exists():
        raise FileNotFoundError(
            f"void config {name_or_path!r} not found (looked in cwd and "
            f"{p.parent})")
    with open(p) as fh:
        return json.load(fh)


class TunnelsFinder:
    """Tunnels void finder (Cautun arxiv:1710.01730) on kappa maps.

    Mirrors the reference workflow (tunnel.py:44-248): find_peaks on the
    convergence map (threshold ladder bottom + SNR + edge trim), then
    find_voids per SNR cut via the native largest-empty-circle grid
    algorithm; results are column dicts in both pixel and degree units.
    """

    def __init__(self, skymap):
        self.skymap = skymap
        self.peaks: Optional[dict] = None
        self.voids: Optional[dict] = None

    def find_peaks(self, on: str = "orig", field_conversion: str = None,
                   thresholds_dsc: dict = None, snr_sigma=None,
                   max_peaks: int = 4096, edge_pix: int = 0) -> dict:
        img = self.skymap.data[on]
        if field_conversion == "normalize":
            img = img - jnp.mean(img)
        nbins = (thresholds_dsc or {}).get("nbins", 100)
        on_thr = (thresholds_dsc or {}).get("on", on)
        thr_img = self.skymap.data[on_thr]
        vmin = float(jnp.min(thr_img))
        vmax = float(jnp.max(thr_img))
        threshold = vmin + (vmax - vmin) / nbins  # ladder bottom
        cat = peak_ops.find_peaks(img, threshold=threshold,
                                  max_peaks=max_peaks, edge_pix=edge_pix,
                                  sigma=snr_sigma)
        n = int(cat.n)
        pix2deg = self.skymap.opening_angle / self.skymap.npix
        self.on = on
        self.peaks = {
            "x_pix": np.asarray(cat.pos[:n, 1]),
            "y_pix": np.asarray(cat.pos[:n, 0]),
            "x_deg": np.asarray(cat.pos[:n, 1]) * pix2deg,
            "y_deg": np.asarray(cat.pos[:n, 0]) * pix2deg,
            "kappa": np.asarray(cat.values[:n]),
            "snr": np.asarray(cat.snr[:n]),
        }
        return self.peaks

    def find_voids(self, sigmas: Sequence[float] = (0.0,),
                   overlap: float = 0.2, max_voids: int = 1024) -> dict:
        """Per-SNR-cut void catalogs (tunnel.py:158-221: the txt->bin->
        external-binary->bin->df chain becomes one on-device call)."""
        assert self.peaks is not None, "run find_peaks first"
        npix = self.skymap.npix
        pix2deg = self.skymap.opening_angle / npix
        all_cols: Dict[str, list] = {k: [] for k in
                                     ("x_pix", "y_pix", "x_deg", "y_deg",
                                      "rad_pix", "rad_deg", "sigma")}
        peaks_pos = jnp.stack(
            [jnp.asarray(self.peaks["y_pix"]),
             jnp.asarray(self.peaks["x_pix"])], axis=-1).astype(jnp.float32)
        snr = np.asarray(self.peaks["snr"])
        # Per-sigma filtered-peaks accumulation mirroring the reference's
        # peaks_df_sum (tunnel.py:180-240): each SNR cut's surviving peaks
        # carry a 'sigma' column and radii measured against THAT cut's voids.
        peak_cols: Dict[str, list] = {
            k: [] for k in ("x_pix", "y_pix", "x_deg", "y_deg", "kappa",
                            "snr", "sigma", "rad_pix", "rad_deg")}
        for sigma in sigmas:
            valid = jnp.asarray(snr > sigma)
            if int(valid.sum()) == 0:
                continue
            # host-level call site: use the auto-escalating variant so a
            # peak-dense map can't silently truncate its candidate list
            cat = void_ops.find_tunnels_auto(peaks_pos, valid, npix,
                                             max_voids=max_voids,
                                             overlap=overlap)
            n = int(cat.n)
            void_xy_deg = np.stack(
                [np.asarray(cat.pos[:n, 1]), np.asarray(cat.pos[:n, 0])],
                axis=-1) * pix2deg
            all_cols["x_pix"].append(np.asarray(cat.pos[:n, 1]))
            all_cols["y_pix"].append(np.asarray(cat.pos[:n, 0]))
            all_cols["x_deg"].append(void_xy_deg[:, 0])
            all_cols["y_deg"].append(void_xy_deg[:, 1])
            all_cols["rad_pix"].append(np.asarray(cat.radius[:n]))
            all_cols["rad_deg"].append(np.asarray(cat.radius[:n]) * pix2deg)
            all_cols["sigma"].append(np.full(n, sigma))

            sel = np.asarray(valid)
            cut = {k: np.asarray(v)[sel] for k, v in self.peaks.items()}
            cut["sigma"] = np.full(sel.sum(), sigma)
            cut_radii = self._peak_radii_deg(
                np.stack([cut["x_deg"], cut["y_deg"]], axis=-1), void_xy_deg)
            cut["rad_deg"] = cut_radii
            cut["rad_pix"] = np.rint(cut_radii / pix2deg).astype(int)
            for k, v in cut.items():
                peak_cols[k].append(v)
        self.voids = {k: (np.concatenate(v) if v else np.empty(0))
                      for k, v in all_cols.items()}
        self.filtered_peaks = {k: (np.concatenate(v) if v else np.empty(0))
                               for k, v in peak_cols.items()}
        return self.voids

    @staticmethod
    def _peak_radii_deg(peak_xy_deg: np.ndarray,
                        void_xy_deg: np.ndarray) -> np.ndarray:
        """Peak radius = distance to nearest void center (tunnel.py:250-295)."""
        if len(void_xy_deg) == 0:
            return np.zeros(len(peak_xy_deg))
        from scipy.spatial import cKDTree

        dist, _ = cKDTree(void_xy_deg).query(peak_xy_deg, k=1)
        return dist

    def set_peak_radii(self, peaks: Optional[dict] = None,
                       voids: Optional[dict] = None) -> dict:
        """Peak radius = distance to nearest void center
        (tunnel.py:250-295)."""
        from scipy.spatial import cKDTree

        peaks = peaks or self.peaks
        voids = voids or self.voids
        vp = np.stack([voids["x_deg"], voids["y_deg"]], axis=-1)
        pp = np.stack([peaks["x_deg"], peaks["y_deg"]], axis=-1)
        dist, _ = cKDTree(vp).query(pp, k=1)
        peaks = dict(peaks)
        peaks["rad_deg"] = dist
        peaks["rad_pix"] = np.rint(
            dist * self.skymap.npix / self.skymap.opening_angle).astype(int)
        return peaks

    def to_file(self, dir_out: str) -> None:
        """Persist peaks and voids as columnar h5 tables (tunnel.py:223-248;
        the reference's txt/bin/fits shims for the external binary are
        obsolete — catalogs are arrays here)."""
        os.makedirs(dir_out, exist_ok=True)
        if self.peaks is not None:
            columnar_h5.write_table(
                os.path.join(dir_out, "peaks_in_kappa2.h5"),
                {k: np.asarray(v) for k, v in self.peaks.items()})
        if self.voids is not None:
            columnar_h5.write_table(
                os.path.join(dir_out, "voids_in_kappa2.h5"),
                {k: np.asarray(v) for k, v in self.voids.items()})


class WatershedFinder:
    """Watershed void finder (watershed.py + watershed_voids.py:27-110)."""

    def __init__(self, skymap):
        self.skymap = skymap
        self.voids: Optional[dict] = None

    def find_voids(self, on: str = "orig", smooth_arcmin: float = 5.0,
                   percentile_mask: float = 80.0, max_voids: int = 1024
                   ) -> dict:
        img = self.skymap.data[on]
        img = filter_ops.gaussian(img, self.skymap.opening_angle,
                                  sigma_arcmin=smooth_arcmin)
        cat = void_ops.watershed_voids(img, max_voids=max_voids,
                                       percentile_mask=percentile_mask)
        n = int(cat.n)
        pix2deg = self.skymap.opening_angle / self.skymap.npix
        self.voids = {
            "x_pix": np.asarray(cat.pos[:n, 1]),
            "y_pix": np.asarray(cat.pos[:n, 0]),
            "x_deg": np.asarray(cat.pos[:n, 1]) * pix2deg,
            "y_deg": np.asarray(cat.pos[:n, 0]) * pix2deg,
            "rad_pix": np.asarray(cat.radius[:n]),
            "rad_deg": np.asarray(cat.radius[:n]) * pix2deg,
            "sigma": np.zeros(n),
        }
        return self.voids


class SphericalVoidFinder3D:
    """3D spherical void finder (SVF) on a density grid — the native
    producer of the catalogs the reference only READ from external SVF
    binaries (rays/void.py:83-104). Mirrors the TunnelsFinder API:
    construct, find_voids, feed Voids.from_finder."""

    def __init__(self, delta, boxsize):
        self.delta = jnp.asarray(delta)
        self.boxsize = float(boxsize)
        self.voids: Optional[dict] = None

    @classmethod
    def from_particles(cls, pos, ngrid: int, boxsize,
                       window: str = "cic") -> "SphericalVoidFinder3D":
        from ..ops import paint as paint_ops

        grid = paint_ops.paint(pos, ngrid, boxsize, window=window)
        delta = grid / jnp.mean(grid) - 1.0
        return cls(delta, boxsize)

    def find_voids(self, delta_threshold: float = -0.8,
                   overlap: float = 0.5, max_voids: int = 512,
                   n_radii: int = 24, r_min=None, r_max=None) -> dict:
        from ..ops import voids3d

        cat = voids3d.svf_voids(self.delta, self.boxsize,
                                delta_threshold=delta_threshold,
                                overlap=overlap, max_voids=max_voids,
                                n_radii=n_radii, r_min=r_min, r_max=r_max)
        self.voids = voids3d.svf_catalog_dict(cat, overlap=overlap)
        self.catalog = cat
        return self.voids


class WatershedFinder3D:
    """ZOBOV-style 3D watershed finder on a density grid (the reference
    only read external ZOBOV catalogs, rays/void.py:105-127)."""

    def __init__(self, delta, boxsize):
        self.delta = jnp.asarray(delta)
        self.boxsize = float(boxsize)
        self.voids: Optional[dict] = None

    def find_voids(self, core_delta: float = -0.5,
                   smooth_cells: float = 2.0, max_voids: int = 512
                   ) -> dict:
        from ..ops import voids3d

        cat = voids3d.watershed_voids_3d(self.delta, self.boxsize,
                                         max_voids=max_voids,
                                         core_delta=core_delta,
                                         smooth_cells=smooth_cells)
        n = int(cat.n)
        pos = np.asarray(cat.pos)[:n]
        self.voids = {
            "x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2],
            "radius": np.asarray(cat.radius)[:n],
            "min_delta": np.asarray(cat.min_delta)[:n],
            # the reference's zobov catalogs threshold on this column
            # (void.py:105-127, FINDER_SIGMA_NAMES['zobov'])
            "halo_den": np.asarray(cat.min_delta)[:n],
        }
        self.catalog = cat
        return self.voids


class Voids:
    """Void-catalog manager for finders {tunnels, svf, zobov, wvf}
    (rays/void.py:23-545)."""

    # zobov catalogs threshold on 'halo_den' in the reference
    # (void.py:433-452); accept the column name archived catalogs carry.
    FINDER_SIGMA_NAMES = {"tunnels": "sigma", "svf": "void_overlap",
                          "zobov": "halo_den", "wvf": "sigma"}

    def __init__(self, data: Dict[str, np.ndarray], finder: str = "tunnels",
                 skymap_dsc: Optional[dict] = None, file_in=None):
        self.data = data
        self.finder = finder
        self.skymap_dsc = skymap_dsc or {}
        self.file_in = file_in
        self.profiles: Optional[dict] = None
        self.field_conversion = None

    @classmethod
    def from_file(cls, finder: str, skymap_dsc: dict, ffile: str) -> "Voids":
        return cls(columnar_h5.read_table(ffile), finder, skymap_dsc, ffile)

    @classmethod
    def from_finder(cls, finder_obj, skymap_dsc: Optional[dict] = None
                    ) -> "Voids":
        if isinstance(finder_obj, TunnelsFinder):
            name = "tunnels"
        elif isinstance(finder_obj, SphericalVoidFinder3D):
            name = "svf"
        elif isinstance(finder_obj, WatershedFinder3D):
            name = "zobov"
        else:
            name = "wvf"
        return cls(dict(finder_obj.voids), name, skymap_dsc)

    # -------------------------------------------------------------- selection
    def categorize_sizes(self, bins: int, min_obj_nr: int) -> None:
        """Log-binned size categories, undersized bins dropped
        (void.py:481-493 -> ops.object_selection.categorize_sizes)."""
        self.data = object_selection.categorize_sizes(
            self.data, "log", bins, min_obj_nr)

    def filter_size(self, size_bin: int) -> Dict[str, np.ndarray]:
        """Rows of one size category (void.py:454-467)."""
        keep = np.asarray(self.data["size_cat"]) == size_bin
        return {k: np.asarray(v)[keep] for k, v in self.data.items()}

    def filter_sigma(self, sigma: float) -> Dict[str, np.ndarray]:
        """Rows at one detection threshold; the key depends on the finder
        (void.py:433-452)."""
        key = self.FINDER_SIGMA_NAMES[self.finder]
        keep = np.asarray(self.data[key]) == sigma
        return {k: np.asarray(v)[keep] for k, v in self.data.items()}

    def filter_snapshot(self, ray_nr: int) -> Dict[str, np.ndarray]:
        """Rows of one ray snapshot, for catalogs spanning a lightcone
        (void.py:426-431)."""
        keep = np.asarray(self.data["ray_nr"]) == ray_nr
        return {k: np.asarray(v)[keep] for k, v in self.data.items()}

    def select_type(self, void_type: str, tracers, args: dict) -> None:
        """(void.py:469-474): 'minimal' voids = tracer-free interiors.

        tracers must be an (N, 2) array of tracer pixel positions; args must
        carry the map width in pixels under 'field_width' (or
        'field_width_pix').
        """
        if void_type == "minimal":
            width = args.get("field_width_pix", args.get("field_width"))
            if width is None:
                raise KeyError(
                    "select_type('minimal', ...) needs args['field_width'] "
                    "(map width in pixels)")
            self.data = object_selection.minimal_voids(
                self.data, np.asarray(tracers), float(width))

    # ------------------------------------------------------------ statistics
    def get_void_size_fct(self, nbins: int, limits=None) -> Dict[str, dict]:
        """Cumulative void size function per sigma (void.py:141-186)."""
        out = {}
        sigmas = np.unique(self.data["sigma"])
        for idx, nu in enumerate(sigmas):
            sel = self.data["sigma"] == nu
            rad = np.asarray(self.data["rad_deg"])[sel]
            if limits is None:
                lo, hi = np.percentile(rad, 5), np.percentile(rad, 95)
            else:
                lo, hi = min(limits[idx]), max(limits[idx])
            # linspace includes hi: arange(lo, hi, step) stopped one step
            # short (dropping the largest voids from the histogram) and
            # its float-step edge count is unpredictable
            bins = np.linspace(lo, hi, nbins + 1)
            hist, edges = np.histogram(rad, bins=bins, density=False)
            hist = np.cumsum(hist[::-1])[::-1]
            out[float(nu)] = {"rad": 0.5 * (edges[1:] + edges[:-1]),
                              "counts": hist}
        return out

    # -------------------------------------------------------------- config
    def apply_profile_config(self, config, skymap=None) -> dict:
        """Run the ISW profiling recipe from a parameter file.

        config is a dict or a name/path accepted by load_void_config
        (the reference's configs/{tunnels,svf,zobov}_isw.json schema):
        nr_radius_bins/obj_num_in_radbin drive the size categorization,
        extend/nr_profile_bins the radial profiles. Returns the profiles
        dict (and leaves them on self for get_profile_stats).
        """
        if not isinstance(config, dict):
            config = load_void_config(config)
        if skymap is None:
            raise ValueError("apply_profile_config needs skymap= (the "
                             "field map the profiles are measured on)")
        nbins = int(config.get("nr_radius_bins", 0))
        if nbins and nbins < len(np.asarray(self.data["rad_pix"])):
            self.categorize_sizes(
                bins=nbins, min_obj_nr=int(config.get("obj_num_in_radbin", 1)))
        return self.get_profiles(
            radii_max=float(config.get("extend", 3.0)),
            nr_rad_bins=int(config.get("nr_profile_bins", 20)),
            skymap=skymap,
            field_conversion=config.get("field_conversion"))

    # -------------------------------------------------------------- profiles
    def get_profiles(self, radii_max: float, nr_rad_bins: int,
                     skymap=None, field_conversion=None) -> dict:
        """Radial profiles of all voids on the map (void.py:188-257)."""
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
        self.profiles = {"radii": np.asarray(eta), "values": np.asarray(values)}
        return self.profiles

    def get_profile_stats(self, cats: Sequence[str] = ("sigma",),
                          field_conversion=None, n_boot: int = 100,
                          dir_out=None, save: bool = False) -> Dataset:
        """Mean + bootstrap 16/84 envelopes per category (void.py:259-410)."""
        if field_conversion:
            self.field_conversion = field_conversion
        assert self.profiles is not None, "run get_profiles first"
        cat_key = cats[0] if cats else "sigma"
        sigmas = np.unique(self.data[cat_key])
        nr = len(self.profiles["radii"])
        mean = np.zeros((len(sigmas), nr))
        lo = np.zeros_like(mean)
        hi = np.zeros_like(mean)
        smin = np.zeros(len(sigmas))
        smax = np.zeros(len(sigmas))
        nobj = np.zeros(len(sigmas))
        npix = self.skymap_dsc.get("npix", 4096)
        for ss, sigma in enumerate(sigmas):
            sel = np.where(self.data[cat_key] == sigma)[0]
            profs = jnp.asarray(self.profiles["values"][sel])
            m = prof_ops.mean_and_interpolate(profs)
            if self.field_conversion == "tangential_shear":
                m = prof_ops.tangential_shear(
                    jnp.asarray(self.profiles["radii"]), m)
            mean[ss] = np.asarray(m)
            centers = jnp.stack(
                [jnp.asarray(self.data["y_pix"], jnp.int32)[sel],
                 jnp.asarray(self.data["x_pix"], jnp.int32)[sel]], axis=-1)
            l, h = prof_ops.bootstrap_profiles(
                profs, centers, jax.random.PRNGKey(ss), n_boot=n_boot,
                block_pix=max(npix // 16, 1), npix=npix)
            lo[ss] = np.asarray(l)
            hi[ss] = np.asarray(h)
            rads = np.asarray(self.data["rad_deg"])[sel]
            smin[ss], smax[ss] = rads.min(), rads.max()
            nobj[ss] = len(sel)
        ds = Dataset(
            data_vars={"mean": ((cat_key, "radius"), mean),
                       "lowerr": ((cat_key, "radius"), lo),
                       "higherr": ((cat_key, "radius"), hi)},
            coords={cat_key: sigmas, "radius": self.profiles["radii"],
                    "size_min": ((cat_key,), smin),
                    "size_max": ((cat_key,), smax),
                    "nr_of_obj": ((cat_key,), nobj)},
        )
        if save and dir_out:
            Path(dir_out).mkdir(parents=True, exist_ok=True)
            ds.to_hdf5(os.path.join(dir_out,
                                    f"{self.finder}_profiles.stats.h5"))
        return ds

    def trim_edges(self, npix: Optional[int] = None,
                   extend: float = 1.0) -> None:
        """Drop voids whose extend*radius profile patch crosses the map edge.

        The reference passes the profile extension factor radii_max into the
        trim (void.py:412-424 -> trim_dataframe_of_objects_crossing_edge
        with extend*radius), so callers profiling out to radii_max*rad must
        trim with extend=radii_max.
        """
        npix = npix or self.skymap_dsc.get("npix")
        self.data = object_selection.trim_objects_crossing_edge(
            self.data, extend, npix, key_size="rad_pix",
            pos_keys=("x_pix", "y_pix"))
