"""Halos: catalog manager with config-driven statistics dispatch.

Rebuild of /root/reference/src/astrild/particles/halo.py:37-586 plus its
stat namespaces (particles/hutils/stats_rockstar.py, stats_subfind.py):
catalogs are column dicts (struct-of-arrays); the halo_stats.yaml registry
drives dynamic dispatch in resolution-sorted order; stats run as jitted
reductions from ops.halo_stats / ops.pairwise / ops.tpcf.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml

from ..io import columnar_h5
from ..io.rockstar import read_rockstar_files
from ..ops import halo_stats as hs_ops
from ..ops import pairwise as pw_ops
from ..ops import tpcf as tpcf_ops
from ..utils.constants import G_NEWTON

__all__ = ["Halos", "Rockstar", "SubFind", "load_stats_config"]

# default DM particle mass for resolution cuts (the reference hardcodes its
# simulation's value at halo.py:30)
DM_PARTICLE_MASS = 8.233e10  # [Msun/h]


def _tuple_constructor(loader, node):
    return tuple(loader.construct_sequence(node))


def load_stats_config(path) -> dict:
    """YAML stat registry, accepting the reference's !!python/tuple tags."""
    loader = yaml.SafeLoader
    yaml.add_constructor("tag:yaml.org,2002:python/tuple",
                         _tuple_constructor, Loader=loader)
    with open(path) as f:
        return yaml.load(f, Loader=loader)


class Rockstar:
    """Stat namespace over Rockstar column dicts (stats_rockstar.py:12-105)."""

    @staticmethod
    def halo_mass_fct(snapshot, limits=(11.78, 16.0), nbins: int = 20):
        import jax.numpy as jnp

        bins, cum = hs_ops.halo_mass_function(
            jnp.asarray(snapshot["m200c"]), limits=tuple(limits), nbins=nbins)
        return np.asarray(bins), np.asarray(cum)

    @staticmethod
    def concentration_mass_rel(snapshot, limits=None, nbins: int = 20,
                               method: str = "nfw"):
        import jax.numpy as jnp

        m = np.asarray(snapshot["m200c"], np.float64)
        if limits is None:
            limits = (np.log10(max(m.min(), 1.0)), np.log10(m.max()))
        limits = tuple(float(x) for x in limits)
        bins, cm = hs_ops.concentration_mass_rockstar(
            jnp.asarray(m), jnp.asarray(snapshot["r200c"]),
            jnp.asarray(snapshot["Rs"]), limits, nbins=nbins)
        return np.asarray(bins), np.asarray(cm)

    @staticmethod
    def histograms(snapshot, nbins: int, dimesions: int = 1,
                   properties: Optional[dict] = None, base=None):
        import jax.numpy as jnp

        out = {}
        for prop, limits in (properties or {}).items():
            limits = tuple(float(x) for x in limits)
            _, dens = hs_ops.histogram_density(
                jnp.asarray(snapshot[prop], jnp.float32), nbins, limits)
            out[prop] = np.asarray(dens)
        return out

    @staticmethod
    def two_point_corr_fct(snapshot, limits=None, nbins=None,
                           boxsize: float = 500.0):
        """Native 2PCF (the reference left this halotools call commented,
        stats_rockstar.py:107-128)."""
        import jax.numpy as jnp

        if limits is None:
            limits = (0.3, boxsize / 5.0)
        if nbins is None:
            nbins = int(2 / 3 * max(limits))
        pos = np.stack([snapshot["x"], snapshot["y"], snapshot["z"]], axis=-1)
        r_edges = jnp.asarray(np.geomspace(min(limits), max(limits),
                                           nbins + 1))
        r, xi = tpcf_ops.tpcf_real(jnp.asarray(pos, jnp.float32), boxsize,
                                   r_edges)
        return np.asarray(r), np.asarray(xi)

    @staticmethod
    def mean_pairwise_velocity(snapshot, limits=None, nbins=None,
                               boxsize: float = 500.0, seperate=None):
        """Native v12(r) from 3D velocities (replaces the commented
        halotools path, stats_subfind.py:155-218)."""
        import jax.numpy as jnp

        if limits is None:
            limits = (0.0, 50.0)
        if nbins is None:
            nbins = 25
        pos = np.stack([snapshot["x"], snapshot["y"], snapshot["z"]], axis=-1)
        vel = np.stack([snapshot["vx"], snapshot["vy"], snapshot["vz"]],
                       axis=-1)
        bins = jnp.asarray(np.linspace(min(limits), max(limits), nbins))
        r, v12 = pw_ops.mean_pairwise_velocity(
            jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
            bins)
        return np.asarray(r), np.asarray(v12)


class SubFind:
    """Stat namespace over SubFind catalogs (stats_subfind.py:16-299)."""

    @staticmethod
    def halo_mass_fct(snapshot, limits=(11.78, 16.0), nbins: int = 20):
        import jax.numpy as jnp

        bins, cum = hs_ops.halo_mass_function(
            jnp.asarray(snapshot["Group_M_Crit200"]), limits=tuple(limits),
            nbins=nbins)
        return np.asarray(bins), np.asarray(cum)

    @staticmethod
    def concentration_mass_rel(snapshot, limits=(11.78, 16.0),
                               nbins: int = 20, method: str = "prada"):
        import jax.numpy as jnp

        m200 = np.asarray(snapshot["Group_M_Crit200"], np.float64)
        r200 = np.asarray(snapshot["Group_R_Crit200"], np.float64)
        vmax = np.asarray(snapshot["SubhaloVmax"], np.float64)
        # v200 = sqrt(G M200 / R200) [km/s] (stats_subfind.py:252-256)
        v200 = np.sqrt(G_NEWTON * m200 / np.maximum(r200, 1e-12))
        limits = tuple(float(x) for x in limits)
        bins, cm = hs_ops.concentration_mass_prada(
            jnp.asarray(m200), jnp.asarray(vmax), jnp.asarray(v200), limits,
            nbins=nbins)
        return np.asarray(bins), np.asarray(cm)

    @staticmethod
    def power_spectrum(snapshot, boxsize: float = 500.0, ngrid: int = 256,
                       nbins: int = 0):
        """Halo P(k): TSC mass paint + FFT (stats_subfind.py:109-153)."""
        import jax.numpy as jnp

        from ..ops import paint as paint_ops, power as power_ops

        pos = np.asarray(snapshot["GroupPos"])
        mass = np.asarray(snapshot["Group_M_Crit200"], np.float64)
        grid = paint_ops.paint(jnp.asarray(pos, jnp.float32), ngrid, boxsize,
                               weights=jnp.asarray(mass, jnp.float32),
                               window="tsc")
        # mass-WEIGHTED tracers: the discrete noise is
        # V sum(m^2)/(sum m)^2, several times V/N for a steep mass
        # function (same convention as parallel/power._weighted_shotnoise
        # and auto_power_fast)
        shot = boxsize ** 3 * float(np.sum(mass ** 2)) \
            / max(float(np.sum(mass)) ** 2, 1e-300)
        res = power_ops.auto_power(grid, boxsize, nbins=nbins or ngrid // 2,
                                   window="tsc", shotnoise=shot)
        return np.asarray(res.k), np.asarray(res.power)


_NAMESPACES = {"rockstar": Rockstar, "subfind": SubFind}


class Halos:
    """Halo-catalog manager (halo.py:37-586)."""

    def __init__(self, snapshot, simulation=None):
        self.data = snapshot  # column dict (or None)
        self.sim = simulation
        self.statistics = None

    # ---------------------------------------------------------- constructors
    @classmethod
    def from_rockstar(cls, snap_nr: int, simulation=None) -> "Halos":
        files = simulation.files["halos"][str(snap_nr)]
        return cls(read_rockstar_files(files), simulation)

    @classmethod
    def from_subfind(cls, snap_nr: int, simulation=None, blocks=(
            "GroupPos", "Group_M_Crit200", "Group_R_Crit200", "GroupFirstSub",
            "SubhaloVmax")) -> "Halos":
        from ..io.gadget_hdf5 import GadgetSnapshot

        snap = GadgetSnapshot(snap_nr, simulation.dirs["sim"])
        cat = snap.group_catalog(blocks)
        if cat.get("n_groups", 0) and "SubhaloVmax" in cat and \
                "GroupFirstSub" in cat:
            first = np.asarray(cat["GroupFirstSub"], np.int64)
            # GroupFirstSub == -1 marks a group with NO subhalos; the
            # negative index would silently wrap to the LAST subhalo's
            # Vmax and feed a garbage c(M) for those groups — mark them
            # NaN so downstream stats exclude them
            vmax = cat["SubhaloVmax"][np.where(first >= 0, first, 0)]
            cat["SubhaloVmax"] = np.where(
                first >= 0, vmax, np.nan).astype(vmax.dtype)
        return cls(cat, simulation)

    @classmethod
    def from_file(cls, filename: str, simulation=None) -> "Halos":
        return cls(columnar_h5.read_table(filename), simulation)

    @classmethod
    def from_dataframe(cls, df, simulation=None) -> "Halos":
        return cls({str(c): np.asarray(df[c]) for c in df.columns},
                   simulation)

    # ------------------------------------------------------------ statistics
    def get_rockstar_stats(self, config_file, snap_nrs=None,
                           save: bool = True,
                           dm_particle_mass: float = DM_PARTICLE_MASS):
        return self._get_stats("rockstar", config_file, snap_nrs, save,
                               dm_particle_mass)

    def get_subfind_stats(self, config_file, snap_nrs=None,
                          save: bool = True,
                          dm_particle_mass: float = DM_PARTICLE_MASS):
        return self._get_stats("subfind", config_file, snap_nrs, save,
                               dm_particle_mass)

    def _get_stats(self, halofinder: str, config_file, snap_nrs, save,
                   dm_particle_mass):
        """Registry-driven dispatch in resolution order (halo.py:157-207,
        :342-410)."""
        statistics = load_stats_config(config_file)
        for name in statistics:
            statistics[name]["results"] = {"bins": {}, "values": {}}
        order = self._sort_statistics(statistics)
        ns = _NAMESPACES[halofinder]
        if snap_nrs is None:
            snap_nrs = (list(self.sim.dir_nrs) if self.sim is not None
                        else [0])
        for snap_nr in snap_nrs:
            snapshot = self._load_snapshot(halofinder, snap_nr)
            # emptiness from the first ARRAY column (subfind catalogs
            # also carry scalars like n_groups/h)
            arrs = ([v for v in snapshot.values() if np.ndim(v) >= 1]
                    if snapshot is not None else [])
            if not arrs or not len(arrs[0]):
                continue
            resolution = 0
            for stat_name in order:
                if int(statistics[stat_name]["resolution"]) != resolution:
                    resolution = int(statistics[stat_name]["resolution"])
                    snapshot = self._filter_resolved(
                        halofinder, snapshot, resolution, dm_particle_mass)
                fct = getattr(ns, stat_name, None)
                if fct is None:
                    continue
                out = fct(snapshot, **statistics[stat_name].get("args", {}))
                if stat_name == "histograms":
                    statistics[stat_name]["results"]["values"][
                        f"snap_{snap_nr}"] = out
                elif out[0] is not None:
                    statistics[stat_name]["results"]["bins"][
                        f"snap_{snap_nr}"] = out[0]
                    statistics[stat_name]["results"]["values"][
                        f"snap_{snap_nr}"] = out[1]
        if save:
            self._save_results(halofinder, statistics)
        self.statistics = statistics
        return statistics

    def _load_snapshot(self, halofinder, snap_nr):
        if self.data is not None:
            return dict(self.data)
        if halofinder == "rockstar":
            return read_rockstar_files(
                self.sim.files["halos"][str(snap_nr)])
        return Halos.from_subfind(snap_nr, self.sim).data

    @staticmethod
    def _filter_resolved(halofinder, snapshot, nr_particles,
                         dm_particle_mass):
        """Resolution cut m200 > N * m_dm (halo.py:209-271, :477-485)."""
        min_mass = dm_particle_mass * nr_particles
        key = "m200c" if halofinder == "rockstar" else "Group_M_Crit200"
        if key not in snapshot:
            return snapshot
        mask = np.asarray(snapshot[key]) > min_mass
        n = mask.shape[0]
        return {k: (np.asarray(v)[mask] if np.ndim(v) >= 1
                    and len(v) == n else v)
                for k, v in snapshot.items()}

    @staticmethod
    def filter_nonzero_subfind_halos_size(snapshot):
        """Drop groups/subhalos with zero radius (halo.py:228-243)."""
        if "Group_R_Crit200" not in snapshot:
            return snapshot
        mask = np.asarray(snapshot["Group_R_Crit200"]) > 0
        n = mask.shape[0]
        return {k: (np.asarray(v)[mask] if np.ndim(v) >= 1
                    and len(v) == n else v)
                for k, v in snapshot.items()}

    @staticmethod
    def _sort_statistics(statistics) -> List[str]:
        res = [int(s["resolution"]) for s in statistics.values()]
        order = np.argsort(res)
        names = list(statistics.keys())
        return [names[i] for i in order]

    def _save_results(self, halofinder: str, statistics: dict):
        """Stats -> columnar h5 per stat (halo.py:499-539)."""
        out_dir = (self.sim.dirs["sim"] if self.sim is not None else ".")
        for stat_name, stg in statistics.items():
            vals = stg["results"]["values"]
            if not vals:
                continue
            if stat_name == "histograms":
                for snap, hists in vals.items():
                    cols = {p: np.asarray(h) for p, h in hists.items()}
                    columnar_h5.write_table(
                        os.path.join(out_dir,
                                     f"rockstar_histograms_{snap}.h5"), cols)
                continue
            cols = {}
            for snap, b in stg["results"]["bins"].items():
                cols.setdefault("bin", np.asarray(b))
                cols[snap] = np.asarray(vals[snap])
            columnar_h5.write_table(
                os.path.join(out_dir, f"{halofinder}_{stat_name}.h5"), cols)

    # ------------------------------------------------------------- HOD mocks
    def populate_hod(self, boxsize, params=None, key=0, max_sat: int = 16,
                     rvir_unit: float = 1e-3):
        """HOD galaxy mock from this (Rockstar-schema) catalog.

        Closes the workflow the reference outsourced: its void/TPCF stacks
        read external per-HOD catalogs (rays/void.py:83-105). Columns used:
        m200c [Msun/h], x/y/z [Mpc/h], vx/vy/vz [km/s], r200c (Rockstar
        kpc/h -> Mpc/h via rvir_unit), rs (concentration = r200c/rs).
        Returns the compacted host catalog dict (ops.hod.compact_catalog).
        """
        import jax
        import jax.numpy as jnp

        from ..ops import hod as hod_ops

        d = self.data
        if params is None:
            params = hod_ops.HODParams()
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        rs_col = d["rs"] if "rs" in d else d["Rs"]
        r200 = np.asarray(d["r200c"], np.float32) * rvir_unit
        conc = r200 / np.maximum(
            np.asarray(rs_col, np.float32) * rvir_unit, 1e-12)
        cat = hod_ops.hod_populate(
            key, jnp.asarray(np.asarray(d["m200c"], np.float32)),
            jnp.asarray(np.asarray(d["x"], np.float32)),
            jnp.asarray(np.asarray(d["y"], np.float32)),
            jnp.asarray(np.asarray(d["z"], np.float32)),
            jnp.asarray(np.asarray(d["vx"], np.float32)),
            jnp.asarray(np.asarray(d["vy"], np.float32)),
            jnp.asarray(np.asarray(d["vz"], np.float32)),
            jnp.asarray(r200), jnp.asarray(conc), float(boxsize),
            params=params, max_sat=max_sat)
        return hod_ops.compact_catalog(cat)

    # --------------------------------------------------------------- queries
    def in_mass_range(self, min_mass: float, max_mass: float,
                      mass_key: str = "m200c") -> "Halos":
        """Catalog restricted to min_mass <= M <= max_mass — closed
        interval, matching tunnels/halo.py halosInMassRange (so
        in_mass_range(m.min(), m.max()) keeps the full catalog)."""
        m = np.asarray(self.data[mass_key])
        sel = (m >= min_mass) & (m <= max_mass)
        return Halos({k: np.asarray(v)[sel] for k, v in self.data.items()},
                     self.sim)

    def select_in_box(self, region, boxsize: float,
                      pos_keys=("x", "y", "z"),
                      periodic: bool = True) -> "Halos":
        """Catalog restricted to a sub-box, with periodic wrap when the
        region extends past [0, boxsize) (tunnels/halo.py
        selectHalosInBox). Positions in the result are expressed in the
        region's frame (wrapped copies get shifted coordinates)."""
        pos = {p: np.asarray(self.data[p], np.float64).copy()
               for p in pos_keys}
        keep = np.ones(next(iter(pos.values())).size, bool)
        for ax, p in enumerate(pos_keys):
            lo, hi = region[2 * ax], region[2 * ax + 1]
            x = pos[p]
            if periodic and (lo < 0 or hi > boxsize):
                x = (x - lo) % boxsize + lo
                pos[p] = x
            keep &= (x >= lo) & (x < hi)
        out = {}
        for k, v in self.data.items():
            v = np.asarray(v)
            out[k] = (pos[k][keep] if k in pos else v[keep])
        return Halos(out, self.sim)

    def environment(self, env_grid, box, pos_keys=("x", "y", "z"),
                    outside_value: int = -1):
        """Cosmic-web environment tag per halo, sampled from a NEXUS-style
        grid (tunnels/halo.py haloEnvironment; grid from io.mmf)."""
        from ..ops.halo_stats import halo_environment

        pos = tuple(np.asarray(self.data[p], np.float32) for p in pos_keys)
        return np.asarray(halo_environment(pos, env_grid, box,
                                           outside_value=outside_value))

    def nearest_neighbours(self, pos_keys=("x", "y", "z"), k: int = 2):
        """k-NN distances within the catalog (replaces sklearn BallTree,
        halo.py:560-586)."""
        from scipy.spatial import cKDTree

        pos = np.stack([np.asarray(self.data[p]) for p in pos_keys], axis=-1)
        tree = cKDTree(pos)
        dist, idx = tree.query(pos, k=k)
        return dist[:, 1:], idx[:, 1:]

    def sort_by(self, column: str, order: str = "descending",
                relabel: bool = False):
        """Reorder the catalog by one column's values
        (tunnels/halo.py:532-584 sortHalos). relabel=True assigns new
        sequential ids in the sorted order (relabelHalos). Entries whose
        length differs from the sort column (scalars, metadata) are left
        untouched. Returns self for chaining.
        """
        if order not in ("ascending", "descending"):
            raise ValueError(f"order must be ascending/descending, "
                             f"got {order!r}")
        key = np.asarray(self.data[column])
        if order == "descending":
            # stable descending with ties in ORIGINAL catalog order.
            # np.argsort(-key) is wrong for unsigned ints (-0 wraps to 0
            # so zero rows sort FIRST) and raises on bools; negate the
            # dense RANK instead — always a safe signed int
            rank = np.unique(key, return_inverse=True)[1].astype(np.int64)
            perm = np.argsort(-rank, kind="stable")
        else:
            perm = np.argsort(key, kind="stable")
        n = key.shape[0]
        out = {}
        for k, v in self.data.items():
            arr = np.asarray(v)
            out[k] = arr[perm] if arr.ndim >= 1 and arr.shape[0] == n \
                else v
        if relabel and "id" in out:
            out["id"] = np.arange(n, dtype=np.asarray(out["id"]).dtype)
        self.data = out
        return self

    def neighbours_within(self, target_id: int, dmax=None,
                          extent=None, pos_keys=("theta1_deg", "theta2_deg"),
                          radius_key: str = "r200_deg"):
        """All catalog members within dmax of one target object
        (halo.py:560-586 get_nearest_neighbours: BallTree query_radius
        around the row with id == target_id; dmax defaults to the
        target's own radius column, optionally scaled by extent).

        Returns (indices, distances) sorted by distance (target first
        at distance 0).
        """
        from scipy.spatial import cKDTree

        ids = np.asarray(self.data["id"])
        sel = np.nonzero(ids == target_id)[0]
        if sel.size == 0:
            raise KeyError(f"no catalog row with id == {target_id}")
        pos = np.stack([np.asarray(self.data[p]) for p in pos_keys],
                       axis=-1)
        if dmax is None:
            dmax = float(np.asarray(self.data[radius_key])[sel[0]])
        if extent is not None:
            dmax = dmax * extent
        tree = cKDTree(pos)
        idx = np.asarray(tree.query_ball_point(pos[sel[0]], dmax),
                         np.int64)
        dist = np.linalg.norm(pos[idx] - pos[sel[0]], axis=-1)
        order = np.argsort(dist)
        return idx[order], dist[order]
