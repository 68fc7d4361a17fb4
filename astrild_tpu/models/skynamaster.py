"""SkyNamaster: mask-decoupled angular power spectra (the working version).

The reference's SkyNamaster (/root/reference/src/astrild/rays/skys/
sky_namaster.py:30-210) was a NaMaster wrapper whose every pymaster call
was commented out — the class constructed maps but could never compute a
decoupled spectrum. This facade carries the intended surface on the native
MASTER estimators:

  * full-sky HEALPix maps -> ops.sht.anafast_master (coupling matrix from
    the mask's own Cl via exact Gauss-Legendre Legendre-product
    quadrature);
  * flat-sky patches    -> ops.angular_power.cl_flat_sky_master (EXACT
    discrete DFT coupling matrix, FFT-built).

Construction mirrors the reference (from_array / from_file with the same
unit conversion path as SkyHealpix); `compute_cl` is the NmtWorkspace-
style entry: the coupling precompute is cached per (mask, binning) so
many maps under one mask pay it once.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..utils import healpix as hp

__all__ = ["SkyNamaster"]


class SkyNamaster:
    """Masked-spectrum analysis of one sky layer (full- or flat-sky)."""

    def __init__(self, skyfield: np.ndarray, opening_angle: float = 0.0,
                 quantity: str = "kappa_2",
                 dirs: Optional[Dict[str, str]] = None,
                 map_file: Optional[str] = None):
        self.data: Dict[str, np.ndarray] = {"orig": np.asarray(skyfield)}
        self.flat = self.data["orig"].ndim == 2
        if not self.flat:
            self.nside = hp.npix2nside(self.data["orig"].shape[0])
        self.opening_angle = opening_angle  # deg; flat-sky patches only
        self.quantity = quantity
        self.dirs = dirs or {}
        self.map_file = map_file
        self._workspace = {}

    # ---------------------------------------------------------- construction
    @classmethod
    def from_array(cls, map_array, opening_angle: float = 0.0,
                   quantity: str = "kappa_2", dir_in: str = "",
                   map_file: Optional[str] = None) -> "SkyNamaster":
        """(sky_namaster.py:131-151; hp.ma's NaN masking becomes an
        explicit finite-pixel mask layer)."""
        arr = np.asarray(map_array, np.float64)
        finite = np.isfinite(arr)
        obj = cls(np.where(finite, arr, 0.0), opening_angle, quantity,
                  {"sim": dir_in}, map_file)
        if not finite.all():
            obj.data["mask"] = finite.astype(np.float64)
        return obj

    @classmethod
    def from_file(cls, map_file: str, opening_angle: float = 0.0,
                  quantity: str = "kappa_2", dir_in: str = "",
                  nside: Optional[int] = None,
                  convert_unit: bool = True) -> "SkyNamaster":
        """h5 ray columns (unit-converted, binned to nside) or .npy
        (sky_namaster.py:61-99 minus the healpy-fits branch)."""
        from .skyhealpix import SkyHealpix

        ext = map_file.rsplit(".", 1)[-1]
        if ext == "h5":
            sh = SkyHealpix.from_file(map_file, quantity, nside=nside,
                                      convert_unit=convert_unit)
            return cls.from_array(sh.data["orig"], opening_angle,
                                  quantity, dir_in, map_file)
        if ext == "npy":
            return cls.from_array(np.load(map_file), opening_angle,
                                  quantity, dir_in, map_file)
        raise ValueError(f"unsupported map file format: {ext}")

    def set_mask(self, mask) -> None:
        self.data["mask"] = np.asarray(mask, np.float64)
        self._workspace.clear()  # cached couplings belong to the old mask

    # ------------------------------------------------------ shared plumbing
    def _resolve_mask(self, mask, like):
        """(mask, mask_is_stored): per-call mask, stored mask, or a
        trivial all-ones fallback. ONE home of the resolution dance —
        the workspace caches per STORED mask only, because a per-call
        mask argument has no stable identity (a stale matrix silently
        biases the decoupled spectrum); the trivial fallback also gets a
        stable identity."""
        mask_is_stored = mask is None and "mask" in self.data
        if mask is None:
            mask = self.data.get("mask")
        if mask is None:
            mask = np.ones_like(np.asarray(like))
            mask_is_stored = True
        return mask, mask_is_stored

    def _mask_cl(self, mask, lmax_mask: int, niter: int):
        """Mask pseudo-spectrum for the full-sky coupling builds, routed
        through the table or scan path by lmax; a unit mask returns the
        exact analytic 4*pi delta_l0 (the estimated wl of a ones map
        carries niter noise AND costs a full SHT for a matrix that is
        analytically the identity)."""
        import jax.numpy as jnp

        from ..ops import sht

        m = np.asarray(mask, np.float64)
        if np.all(m == 1.0):
            wl = np.zeros(lmax_mask + 1)
            wl[0] = 4.0 * np.pi
            return wl
        if lmax_mask <= 512:
            return np.asarray(sht.anafast(jnp.asarray(mask, jnp.float32),
                                          lmax_mask, niter=niter))
        from ..ops import sht_large

        return np.asarray(sht_large.anafast_large(
            jnp.asarray(mask, jnp.float32), lmax_mask, niter=niter))

    # -------------------------------------------------------------- spectra
    def compute_cl(self, mask=None, lmax: Optional[int] = None,
                   nbins: int = 16, of: str = "orig",
                   decouple: bool = True, niter: int = 3):
        """Masked spectrum of a layer; the reference's intended
        compute_master flow (sky_namaster.py:75-95).

        decouple=True inverts the mode-coupling matrix (MASTER band
        powers, cached per mask/binning); decouple=False falls back to
        the <w^2> pseudo-Cl normalization. Returns (ell, cl).
        """
        import jax.numpy as jnp

        from ..ops import angular_power as AP
        from ..ops import sht

        mask, mask_is_stored = self._resolve_mask(mask, self.data[of])
        m = self.data[of]
        if self.flat:
            if not decouple:
                return AP.cl_flat_sky_masked(jnp.asarray(m),
                                             jnp.asarray(mask),
                                             self.opening_angle,
                                             nbins=nbins)
            coupling = None
            key = ("flat", nbins)
            if mask_is_stored:
                coupling = self._workspace.get(key)
            if coupling is None:
                coupling = AP.flat_sky_coupling_matrix(
                    mask, self.opening_angle, nbins)
                if mask_is_stored:
                    self._workspace[key] = coupling
            return AP.cl_flat_sky_master(jnp.asarray(m),
                                         jnp.asarray(mask),
                                         self.opening_angle, nbins=nbins,
                                         coupling=coupling)
        if lmax is None:
            # the O(lmax^2 * nring) table path is practical to ~512;
            # anafast_master routes larger lmax through sht_large
            lmax = min(2 * self.nside, 512)
        if not decouple:
            ell = jnp.arange(lmax + 1, dtype=jnp.float32)
            return ell, sht.anafast_masked(jnp.asarray(m),
                                           jnp.asarray(mask), lmax,
                                           niter=niter)
        coupling = None
        # niter is part of the key: the coupling is built from a mask
        # pseudo-Cl ESTIMATED at that niter, so reusing it across niter
        # values would silently decouple with the wrong matrix
        key = ("full", lmax, niter)
        if mask_is_stored:
            coupling = self._workspace.get(key)
        if coupling is None:
            wl = self._mask_cl(mask, min(2 * lmax, 2 * self.nside),
                               niter)
            coupling = sht.coupling_matrix_from_mask_cl(wl, lmax)
            if mask_is_stored:
                self._workspace[key] = coupling
        return sht.anafast_master(jnp.asarray(m), jnp.asarray(mask),
                                  lmax, nbins=nbins, niter=niter,
                                  coupling=coupling)

    def compute_cl_spin2(self, gamma1, gamma2, mask=None,
                         nbins: int = 16, decouple: bool = True,
                         lmax: Optional[int] = None, niter: int = 3):
        """Masked shear spectra (ell, Cl_EE, Cl_BB) — the spin-2 MASTER
        flow NaMaster users expect, flat-sky AND full-sky.

        decouple=True solves the 2x2-block (EE, BB) mode-coupling system
        (ops.angular_power.cl_flat_sky_shear_master on flat maps;
        ops.sht_spin.anafast_spin2_master on HEALPix (Q, U)): a mask
        both suppresses power AND leaks E->B, so without the decoupling
        the B-mode null test is meaningless under any realistic mask.
        The coupling matrices cache per stored mask like compute_cl's.
        decouple=False returns the <w^2>-normalized pseudo E/B spectra.
        """
        import jax.numpy as jnp

        from ..ops import angular_power as AP

        mask, mask_is_stored = self._resolve_mask(mask, gamma1)
        if not self.flat:
            from ..ops import sht_spin

            if lmax is None:
                lmax = min(2 * self.nside, 512)
            if not decouple:
                w = jnp.asarray(mask, jnp.float32)
                w2 = jnp.maximum(jnp.mean(w ** 2), 1e-12)
                ee, bb, _ = sht_spin.anafast_spin2(
                    jnp.asarray(gamma1) * w, jnp.asarray(gamma2) * w,
                    lmax, niter=niter)
                ell = jnp.arange(lmax + 1, dtype=jnp.float32)
                return ell, ee / w2, bb / w2
            coupling = None
            # niter in the key: see compute_cl (the matrix is built from
            # a mask pseudo-Cl estimated at that niter)
            key = ("full-spin2", lmax, niter)
            if mask_is_stored:
                coupling = self._workspace.get(key)
            if coupling is None:
                wl = self._mask_cl(mask, min(2 * lmax, 2 * self.nside),
                                   niter)
                coupling = sht_spin.spin2_coupling_matrices_from_mask_cl(
                    wl, lmax)
                if mask_is_stored:
                    self._workspace[key] = coupling
            return sht_spin.anafast_spin2_master(
                jnp.asarray(gamma1), jnp.asarray(gamma2),
                jnp.asarray(mask), lmax, nbins=nbins, niter=niter,
                coupling=coupling)
        if lmax is not None:
            raise ValueError(
                "compute_cl_spin2: lmax applies to full-sky HEALPix "
                "fields; flat-sky band ranges are set by nbins (and the "
                "estimator's ell_min/ell_max)")
        if not decouple:
            w = jnp.asarray(mask, jnp.float32)
            w2 = jnp.maximum(jnp.mean(w ** 2), 1e-12)
            ell, ee, bb = AP.cl_shear_eb(jnp.asarray(gamma1) * w,
                                         jnp.asarray(gamma2) * w,
                                         self.opening_angle, nbins=nbins)
            return ell, ee / w2, bb / w2
        coupling = None
        key = ("flat-spin2", nbins)
        if mask_is_stored:
            coupling = self._workspace.get(key)
        if coupling is None:
            coupling = AP.flat_sky_spin2_coupling_matrices(
                mask, self.opening_angle, nbins)
            if mask_is_stored:
                self._workspace[key] = coupling
        return AP.cl_flat_sky_shear_master(
            jnp.asarray(gamma1), jnp.asarray(gamma2), jnp.asarray(mask),
            self.opening_angle, nbins=nbins, coupling=coupling)
