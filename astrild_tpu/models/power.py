"""Spectra pipeline classes: PowerSpectrum3D, AngularPowerSpectrum,
LinearPowerSpectrum, LinearAngularPowerSpectrum, Bispectrum2D/3D, PowMes.

User-facing rebuild of the reference's power_spectra/ and bispectra/
packages on the device ops:
  PowerSpectrum3D       (power_spectrum_3d.py:28-249, nbodykit -> ops.power)
  AngularPowerSpectrum  (angular_power_spectrum.py:38-105)
  LinearPowerSpectrum   (linear_power_spectrum.py:60-183)
  LinearAngularPowerSpectrum (linear_angular_power_spectrum.py:100-225)
  Bispectrum2D/3D       (bispectra/, the 3D stub fixed by ops.bispectrum)
  PowMes                (powmes.py:40-102 output reader; the estimator
                         itself is subsumed by PowerSpectrum3D)
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..io import columnar_h5
from ..ops import angular_power as ap_ops
from ..ops import bispectrum as bs_ops
from ..ops import linear_power as lp_ops
from ..ops import paint as paint_ops
from ..ops import power as power_ops
from ..utils.cosmology import Cosmology

__all__ = ["PowerSpectrum3D", "AngularPowerSpectrum", "LinearPowerSpectrum",
           "LinearAngularPowerSpectrum", "Bispectrum2D", "Bispectrum3D",
           "PowMes"]


class PowerSpectrum3D:
    """Auto & cross P(k) of gridded or point-set quantities."""

    def __init__(self, sim_type: str = "particles", simulation=None,
                 window: str = "cic"):
        self.sim = simulation
        self.sim_type = sim_type
        self.window = window
        self._dist_cache = {}

    # ------------------------------------------------------- low-level API
    def power_from_grid(self, grid, boxsize: float, nbins: int = 0,
                        shotnoise: float = 0.0, window=None):
        res = power_ops.auto_power(jnp.asarray(grid), boxsize,
                                   nbins=nbins, window=window,
                                   shotnoise=shotnoise)
        return np.asarray(res.k), np.asarray(res.power)

    def multipoles_from_grid(self, grid, boxsize: float, nbins: int = 0,
                             ells=(0, 2, 4), los: int = 2,
                             shotnoise: float = 0.0, window=None):
        """Redshift-space multipoles P_ell(k) (the nbodykit FFTPower
        poles mode the reference never wired up). Returns (k, {ell: P})."""
        res = power_ops.auto_power_multipoles(
            jnp.asarray(grid), boxsize, nbins=nbins, ells=tuple(ells),
            los=los, shotnoise=shotnoise, window=window)
        return (np.asarray(res.k),
                {ell: np.asarray(res.p_ell[i])
                 for i, ell in enumerate(ells)})

    def power_from_points(self, pos, boxsize: float, ngrid: int,
                          weights=None, nbins: int = 0,
                          interlaced: bool = False, method: str = "window",
                          mesh=None):
        """Point set -> paint -> P(k) (power_spectrum_3d.py:140-195).

        method='fast' uses the folded fine-grid NGP estimator
        (ops.power.auto_power_fast) — ~10x faster on TPU at matched
        accuracy over the reported k-range; 'window' paints with
        self.window (cic/tsc) and deconvolves.

        mesh: a jax.sharding.Mesh runs the distributed estimator
        (parallel.power.make_distributed_auto_power_fast — the
        reference's nbodykit-MPI role) over particle shards: pass pos
        already device_put with P(('sim','x','y')) on the leading
        dimension, either (n, 3) or a flat (x, y, z) component tuple.
        Only method='fast' distributes (the jitted factory is cached per
        (mesh, ngrid, nbins)).
        """
        if mesh is not None:
            if method != "fast":
                raise ValueError("mesh= requires method='fast' (the "
                                 "distributed estimator is the folded "
                                 "fine-NGP path)")
            missing = {"sim", "x", "y"} - set(mesh.shape)
            if missing:
                raise ValueError(
                    "the distributed P(k) factory shards over the "
                    "('sim', 'x', 'y') axes; this mesh lacks "
                    f"{sorted(missing)} (axes: {tuple(mesh.shape)}) — "
                    "build it with parallel.make_mesh")
            from ..parallel.power import make_distributed_auto_power_fast

            # Mesh is hashable/eq-comparable: equal meshes built
            # separately share one jitted factory (id() would rebuild)
            key = (mesh, ngrid, float(boxsize), nbins or ngrid // 2)
            fn = self._dist_cache.get(key)
            if fn is None:
                fn = make_distributed_auto_power_fast(
                    mesh, ngrid, boxsize, nbins or ngrid // 2)
                self._dist_cache[key] = fn
            res = fn(pos, weights)
            return np.asarray(res.k), np.asarray(res.power)
        pos = jnp.asarray(pos)
        if method == "fast":
            res = power_ops.auto_power_fast(pos, ngrid, boxsize,
                                            nbins=nbins, weights=weights)
            return np.asarray(res.k), np.asarray(res.power)
        painted = paint_ops.paint(pos, ngrid, boxsize, weights=weights,
                                  window=self.window, interlaced=interlaced)
        if interlaced:
            g, g2 = painted
        else:
            g, g2 = painted, None
        if weights is None:
            shot = boxsize ** 3 / pos.shape[0]
        else:
            # weighted tracers: V sum(w^2)/(sum w)^2 (V/N leaves a
            # ~14%-of-shot residual for w ~ U(0.5, 2); same convention
            # as auto_power_fast / parallel/power._weighted_shotnoise)
            w = np.asarray(weights, np.float64)
            shot = boxsize ** 3 * float(np.sum(w * w)) \
                / max(float(np.sum(w)) ** 2, 1e-300)
        res = power_ops.auto_power(g, boxsize, nbins=nbins,
                                   window=self.window, grid_shifted=g2,
                                   interlaced=interlaced,
                                   shotnoise=shot)
        return np.asarray(res.k), np.asarray(res.power)

    def _as_grid(self, arr, boxsize: float, ngrid: int):
        """(grid, painted): paint a point set with self.window, pass a
        pre-gridded field through."""
        if arr.ndim == 2 and arr.shape[1] == 3:
            g = paint_ops.paint(jnp.asarray(arr), ngrid, boxsize,
                                window=self.window)
            return g, True
        return jnp.asarray(arr), False

    def cross_power_from_grids(self, grid1, grid2, boxsize: float,
                               nbins: int = 0, window=None):
        """TSC-compensated cross spectrum (power_spectrum_3d.py:197-222)."""
        res = power_ops.cross_power(jnp.asarray(grid1), jnp.asarray(grid2),
                                    boxsize, nbins=nbins, window=window)
        return np.asarray(res.k), np.asarray(res.power)

    # ---------------------------------------------------------- file-driven
    def compute(self, quantities: Sequence[str], file_dsc: Sequence[dict],
                snap_nrs=None, dir_out=None, save: bool = True,
                boxsize: Optional[float] = None, ngrid: int = 256):
        """File-driven pipeline (power_spectrum_3d.py:33-111): reads h5
        point sets or npy grids per snapshot; auto (1 file_dsc) or cross
        (2 file_dscs)."""
        boxsize = boxsize or getattr(self.sim, "boxsize", 500.0)
        fd = dict(file_dsc[0])
        path = fd.pop("path", None)
        snap_ids = self.sim.get_file_nrs(fd, path, "max")
        paths1 = self.sim.get_file_paths(fd, path, "max")
        paths2 = None
        if len(file_dsc) > 1:
            fd2 = dict(file_dsc[1])
            path2 = fd2.pop("path", None)
            paths2 = self.sim.get_file_paths(fd2, path2, "max")
        if snap_nrs is not None:
            keep = [i for i, s in enumerate(np.sort(snap_ids))
                    if s in set(snap_nrs)]
            paths1 = [paths1[i] for i in keep]
            if paths2 is not None:
                paths2 = [paths2[i] for i in keep]
            snap_ids = [np.sort(snap_ids)[i] for i in keep]
        pk = {"k": {}, "P": {}}
        for i, (snap_nr, p1) in enumerate(
                zip(np.sort(np.asarray(snap_ids)), paths1)):
            arr = self._read_data(p1, quantities)
            if paths2 is not None:
                # cross spectrum of two fields (power_spectrum_3d.py
                # :197-222): point sets are painted with self.window,
                # whose aliasing is then deconvolved; pre-gridded fields
                # carry no assignment window
                g1, painted1 = self._as_grid(arr, boxsize, ngrid)
                g2, painted2 = self._as_grid(
                    self._read_data(paths2[i], quantities), boxsize, ngrid)
                win = self.window if (painted1 and painted2) else None
                k, P = self.cross_power_from_grids(g1, g2, boxsize,
                                                   window=win)
            elif arr.ndim == 2 and arr.shape[1] == 3:
                k, P = self.power_from_points(arr, boxsize, ngrid)
            else:
                k, P = self.power_from_grid(arr, boxsize)
            pk["k"][f"snap_{snap_nr}"] = k
            pk["P"][f"snap_{snap_nr}"] = P
        if save and dir_out and pk["k"]:
            os.makedirs(dir_out, exist_ok=True)
            cols = {"k": next(iter(pk["k"].values()))}
            cols.update(pk["P"])
            columnar_h5.write_table(
                os.path.join(dir_out, f"pk_{'_'.join(quantities)}.h5"), cols)
        return pk

    def _read_data(self, path: str, quantities) -> np.ndarray:
        """h5 point set (x,y,z columns) -> positions; npy -> grid
        (power_spectrum_3d.py:140-163)."""
        if path.endswith(".npy"):
            return np.load(path)
        cols = columnar_h5.read_table(path)
        return np.stack([cols["x"], cols["y"], cols["z"]], axis=-1)


class AngularPowerSpectrum:
    """Cl estimators on flat-sky maps (angular_power_spectrum.py:38-105)."""

    @staticmethod
    def from_array(img, opening_angle_deg: float, nbins: int = 50):
        ell, cl = ap_ops.cl_flat_sky(jnp.asarray(img), opening_angle_deg,
                                     nbins=nbins)
        return np.asarray(ell), np.asarray(cl)

    @staticmethod
    def from_skymap(skymap, on: str = "orig", nbins: int = 50):
        return AngularPowerSpectrum.from_array(
            skymap.data[on], skymap.opening_angle, nbins=nbins)

    @staticmethod
    def from_shear(gamma1, gamma2, opening_angle_deg: float,
                   nbins: int = 50):
        """(ell, Cl_EE, Cl_BB) from flat-sky shear maps (Kaiser-Squires
        E/B rotation; B is the post-Born/systematics null channel)."""
        ell, ee, bb = ap_ops.cl_shear_eb(jnp.asarray(gamma1),
                                         jnp.asarray(gamma2),
                                         opening_angle_deg, nbins=nbins)
        return np.asarray(ell), np.asarray(ee), np.asarray(bb)

    @staticmethod
    def to_flat_map(ells, cls_vals, npix: int, opening_angle_deg: float,
                    rnd_seed: int = 0):
        import jax

        return np.asarray(ap_ops.cl_to_flat_map(
            jax.random.PRNGKey(rnd_seed), jnp.asarray(ells),
            jnp.asarray(cls_vals), npix, opening_angle_deg))

    @staticmethod
    def from_healpix(skyhealpix, lmax: int, of: str = "orig",
                     niter: int = 3):
        """(ell, Cl) of a full-sky SkyHealpix layer
        (angular_power_spectrum.py:55-73 from_healpix → native SHT
        anafast instead of healpy)."""
        cl = skyhealpix.anafast(lmax, of=of, niter=niter)
        return np.arange(cl.shape[0]), np.asarray(cl)

    @staticmethod
    def to_skyhealpix(cls_vals, nside: int, quantity: str = "kappa_2",
                      lmax=None, rnd_seed: int = 0):
        """Gaussian full-sky realization of a Cl table as a SkyHealpix
        (angular_power_spectrum.py:97-118 create_healpix)."""
        from .skyhealpix import SkyHealpix

        return SkyHealpix.from_Cl_array(np.asarray(cls_vals), quantity,
                                        nside, lmax=lmax,
                                        rnd_seed=rnd_seed)


class LinearPowerSpectrum:
    """Theory P(k) (EH98) + ISW source power (linear_power_spectrum.py)."""

    def __init__(self, cosmo: Optional[Cosmology] = None):
        self.cosmo = cosmo or Cosmology()
        self._amp = lp_ops.normalization(self.cosmo)

    def P_dd(self, k, z=0.0):
        return np.asarray(lp_ops.linear_power(jnp.asarray(k), self.cosmo,
                                              z=z, amplitude=self._amp))

    def P_dpdp(self, z, k):
        return np.asarray(lp_ops.p_dpdp(jnp.asarray(k), z, self.cosmo,
                                        amplitude=self._amp))

    def growth_functions(self, z):
        return (float(self.cosmo.growth_factor(z)),
                float(self.cosmo.growth_rate(z)))

    def kaiser_multipoles(self, k, z=0.0, bias: float = 1.0):
        """Linear Kaiser (P0, P2, P4) theory anchor for RSD clustering."""
        return tuple(np.asarray(p) for p in lp_ops.kaiser_multipoles(
            jnp.asarray(k), self.cosmo, z=z, bias=bias,
            amplitude=self._amp))

    def P_nl(self, k, z=0.0, method: str = "halofit"):
        """Nonlinear P(k): 'halofit' (Takahashi+12) or 'halomodel'
        (1h+2h, ops/halo_model.py)."""
        if method == "halofit":
            return np.asarray(lp_ops.nonlinear_power(
                jnp.asarray(k), self.cosmo, z=z, amplitude=self._amp))
        if method == "halomodel":
            from ..ops.halo_model import halo_model_power

            _, _, pt = halo_model_power(jnp.asarray(k), self.cosmo, z=z,
                                        amplitude=self._amp)
            return np.asarray(pt)
        raise ValueError(f"unknown nonlinear method {method!r}")


class LinearAngularPowerSpectrum:
    """Linear ISW Cl_TT via Limber (linear_angular_power_spectrum.py)."""

    def __init__(self, ell_range, z_range, cosmo: Optional[Cosmology] = None):
        self._ell_range = np.asarray(ell_range, float)
        self._z_range = np.asarray(z_range, float)
        self.cosmo = cosmo or Cosmology()
        self._C_tt = None
        self._outdated = True

    @property
    def ells(self):
        return self._ell_range

    @property
    def Cl(self):
        if self._outdated:
            self.compute_C_tt()
        return self._C_tt

    def compute_C_tt(self):
        self._C_tt = np.asarray(ap_ops.cl_isw_limber(
            jnp.asarray(self._ell_range), self.cosmo,
            z_min=float(self._z_range.min()),
            z_max=float(self._z_range.max())))
        self._outdated = False
        return self._C_tt

    def compute_C_kappa(self, z_source: float = 1.0):
        """Linear convergence Cl via Limber (theory anchor for measured
        kappa spectra; beyond the reference, which had only the ISW Cl)."""
        return np.asarray(ap_ops.cl_kappa_limber(
            jnp.asarray(self._ell_range), self.cosmo, z_source=z_source))


class Bispectrum2D:
    """Equilateral B(ell) of flat-sky maps (bispectrum_2d.py:33-50)."""

    @staticmethod
    def compute(skymap_or_img, opening_angle_deg: Optional[float] = None,
                nbins: int = 16, on: str = "orig"):
        if hasattr(skymap_or_img, "data"):
            img = skymap_or_img.data[on]
            opening_angle_deg = skymap_or_img.opening_angle
        else:
            img = jnp.asarray(skymap_or_img)
        ell, b, ntri = bs_ops.bispectrum_2d_equilateral(
            img, opening_angle_deg, nbins=nbins)
        return np.asarray(ell), np.asarray(b), np.asarray(ntri)


class Bispectrum3D:
    """Real B(k1,k2,k3) estimator — the reference's Bispectrum3D was a
    stub copy of the power spectrum (bispectrum_3d.py:41-44)."""

    @staticmethod
    def compute(grid, boxsize: float, nbins: int = 8, m_min: float = 1.0,
                m_max=None):
        res = bs_ops.bispectrum_3d(jnp.asarray(grid), boxsize, nbins=nbins,
                                   m_min=m_min, m_max=m_max)
        return {k: np.asarray(v) for k, v in res._asdict().items()}

    @staticmethod
    def from_points(pos, boxsize: float, ngrid: int, nbins: int = 8,
                    window: str = "cic"):
        grid = paint_ops.paint(jnp.asarray(pos), ngrid, boxsize,
                               window=window)
        return Bispectrum3D.compute(grid, boxsize, nbins=nbins)


class PowMes:
    """Reader for POWMES output files (powmes.py:40-102). The estimator
    itself is replaced by PowerSpectrum3D."""

    @staticmethod
    def read_pk_file(path, boxsize: float):
        """POWMES .ascii table: columns (i, P(i), ...) with k = i * 2pi/L;
        returns (k, P)."""
        tab = np.loadtxt(path, comments="#", ndmin=2)
        k = tab[:, 0] * 2.0 * np.pi / boxsize
        return k, tab[:, 1]

    @staticmethod
    def to_table(paths: Dict[int, str], boxsize: float, dir_out=None):
        cols = {}
        for snap, p in paths.items():
            k, P = PowMes.read_pk_file(p, boxsize)
            cols.setdefault("k", k)
            cols[f"snap_{snap}"] = P
        if dir_out:
            columnar_h5.write_table(os.path.join(dir_out, "powmes_pk.h5"),
                                    cols)
        return cols

    @staticmethod
    def align_lin_nonlin(lin, nonlin, k, band=(1e-2, 1e-1)):
        """Additive offset aligning a nonlinear P(k) to the linear one at
        large scales (powmes.py align_lin_nonlin): the linear spectrum's
        first (largest-scale) value minus the nonlinear band average over
        k in `band` [h/Mpc]. Add the returned offset to `nonlin`."""
        lin = np.asarray(lin)
        nonlin = np.asarray(nonlin)
        k = np.asarray(k)
        sel = (band[0] < k) & (k < band[1])
        if not sel.any():
            raise ValueError(f"no modes inside the k band {band}")
        return lin[0] - np.mean(nonlin[sel])
