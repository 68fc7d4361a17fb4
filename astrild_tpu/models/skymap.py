"""SkyMap / SkyArray: flat-sky map containers with named layers.

API rebuild of the reference's SkyMap facade
(/root/reference/src/astrild/rays/skymap.py:45-172) and SkyArray
(rays/skys/sky_array.py): named map layers in `data{}`, constructed from
files, ray columns, plain arrays, or analytic NFW halo signals; operations
(filters, noise, peak counts, kappa->alpha->gamma, CMB realizations) are
jit-compiled device ops from astrild_tpu.ops.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..io.rays import rays_to_map
from ..ops import angular_power, filters as filter_ops, lensing, peaks as peak_ops
from ..utils.constants import C_LIGHT_KMS

__all__ = ["SkyArray", "SkyMap"]


class SkyArray:
    """Flat-sky square map with named layers (reference sky_array.py:79-92).

    data: {layer_name: (npix, npix) jnp.ndarray}; "orig" is the primary.
    opening_angle in degrees.
    """

    def __init__(self, skymap, opening_angle: float, quantity: str = "kappa_2",
                 dirs=None, map_file=None):
        self.data: Dict[str, jnp.ndarray] = {"orig": jnp.asarray(skymap)}
        self._opening_angle = float(opening_angle)
        self.quantity = quantity
        self.dirs = dirs
        self.map_file = map_file

    # ------------------------------------------------------------ properties
    @property
    def npix(self) -> int:
        return self.data["orig"].shape[-1]

    @property
    def _npix(self) -> int:
        return self.npix

    @property
    def opening_angle(self) -> float:
        return self._opening_angle

    # ---------------------------------------------------------- constructors
    @classmethod
    def from_array(cls, map_array, opening_angle: float,
                   quantity: str = "kappa_2", dirs=None, map_file=None
                   ) -> "SkyArray":
        return cls(map_array, opening_angle, quantity, dirs, map_file)

    @classmethod
    def from_density_planes(cls, planes, chis, dchis, chi_s, omega_m,
                            opening_angle: float, scale_factors=None,
                            method: str = "born"):
        """Map-maker from stacked lens planes — the in-memory form of the
        reference's Ray-Ramses output summation (simcoll.py:238-341).

        method='born' integrates the planes at Born level ('orig' =
        kappa); method='raytrace' runs the post-Born multi-plane ray
        tracer (ops/raytrace.py) and adds gamma1/gamma2/omega layers.
        opening_angle in degrees.

        Returns ONE SkyArray for scalar chi_s; a LIST of SkyArrays (one
        per source plane) when chi_s is a (nsrc,) array (tomography,
        either method).
        """
        import numpy as _np

        from ..ops import lensing as _lens
        from ..ops import raytrace as _rt

        if method == "born":
            chi_s_arr = jnp.asarray(chi_s)
            if chi_s_arr.ndim > 0:
                return [cls(_lens.born_convergence(
                    jnp.asarray(planes), jnp.asarray(chis),
                    jnp.asarray(dchis), cs, omega_m,
                    scale_factors=scale_factors), opening_angle, "kappa_2")
                    for cs in chi_s_arr]
            kappa = _lens.born_convergence(
                jnp.asarray(planes), jnp.asarray(chis), jnp.asarray(dchis),
                chi_s, omega_m, scale_factors=scale_factors)
            return cls(kappa, opening_angle, "kappa_2")
        if method == "raytrace":
            out = _rt.multiplane_raytrace(
                jnp.asarray(planes), jnp.asarray(chis), jnp.asarray(dchis),
                chi_s, omega_m, _np.radians(opening_angle),
                scale_factors=scale_factors)
            if jnp.ndim(jnp.asarray(chi_s)) > 0:
                # tomography: one SkyArray per source plane
                skies = []
                for i in range(out["kappa"].shape[0]):
                    sky = cls(out["kappa"][i], opening_angle, "kappa_2")
                    for name in ("gamma1", "gamma2", "omega"):
                        sky.data[name] = out[name][i]
                    skies.append(sky)
                return skies
            sky = cls(out["kappa"], opening_angle, "kappa_2")
            for name in ("gamma1", "gamma2", "omega"):
                sky.data[name] = out[name]
            return sky
        raise ValueError(f"unknown map-maker method {method!r}")

    @classmethod
    def from_file(cls, map_file: str, opening_angle: float,
                  quantity: str = "kappa_2", convert_unit: bool = True
                  ) -> "SkyArray":
        """npy or columnar/pandas h5 (skymap.py:45-107)."""
        ext = map_file.split(".")[-1]
        if ext == "npy":
            arr = np.load(map_file)
        elif ext in ("h5", "hdf5"):
            from ..io import columnar_h5

            cols = columnar_h5.read_table(map_file)
            return cls.from_columns(cols, opening_angle, quantity,
                                    convert_unit=convert_unit,
                                    map_file=map_file)
        else:
            raise ValueError(f"unsupported extension {ext}")
        return cls(arr, opening_angle, quantity, map_file=map_file)

    @classmethod
    def from_columns(cls, cols, opening_angle: float,
                     quantity: str = "kappa_2", convert_unit: bool = True,
                     map_file=None) -> "SkyArray":
        """Ray-output columns -> map (skymap.py:108-144 +
        SkyIO.transform_RayRamsesOutput_to_NumpyNdarray)."""
        ids = cols.get("id")
        arr = rays_to_map(np.asarray(cols[quantity]),
                          None if ids is None else np.asarray(ids),
                          quantity=quantity if convert_unit else None)
        return cls(arr, opening_angle, quantity, map_file=map_file)

    # legacy alias
    from_dataframe = from_columns

    @classmethod
    def from_halo_series(cls, halo, npix: int, extent: float,
                         direction: Sequence[int], suppress: bool,
                         suppression_R: float, to: str = "dT") -> "SkyArray":
        """Analytic NFW halo signal patch (sky_array.py:190-263).

        `halo` must expose r200_deg, m200, c_NFW, Dc (angular-diameter
        distance [Mpc]) and for dT theta1_tv/theta2_tv.
        """
        get = lambda k: float(halo[k] if isinstance(halo, dict) else
                              getattr(halo, k))
        if to == "dT":
            arr = lensing.nfw_temperature_perturbation_map(
                get("r200_deg"), get("m200"), get("c_NFW"),
                jnp.array([get("theta1_tv"), get("theta2_tv")]),
                get("Dc"), npix=npix, extent=extent,
                directions=tuple(direction), suppress=suppress,
                suppression_r=suppression_R)
            quantity = "rs"
        elif to == "alpha":
            arr = lensing.nfw_deflection_angle_map(
                get("r200_deg"), get("m200"), get("c_NFW"), get("Dc"),
                npix=npix, extent=extent, directions=tuple(direction),
                suppress=suppress, suppression_r=suppression_R)
            quantity = "alpha"
        elif to == "ksz":
            from ..ops import sz as sz_ops

            r200_mpc = float(np.tan(np.deg2rad(get("r200_deg")))
                             * get("Dc"))
            arr = sz_ops.ksz_patch_from_halo(
                get("m200"), get("c_NFW"), r200_mpc, get("v_los"),
                npix=npix, extent=extent)
            return cls(arr, 2 * get("r200_deg") * extent, "ksz")
        else:
            raise ValueError(f"unknown signal {to}")
        if 0 in direction and 1 not in direction:
            quantity += "_x"
        elif 1 in direction and 0 not in direction:
            quantity += "_y"
        return cls(arr, 2 * get("r200_deg") * extent, quantity)

    @classmethod
    def from_halo_dataframe(cls, halo_cat, npix: int, extent: float,
                            direction: Sequence[int], suppress: bool,
                            suppression_R: float, to: str = "dT",
                            opening_angle: Optional[float] = None,
                            patch_npix: int = 101) -> "SkyArray":
        """Paint many halos onto one canvas (sky_array.py:263-331;
        joblib loop -> one batched scan of patch scatter-adds).

        halo_cat: dict of columns incl. r200_deg, m200, c_NFW, Dc,
        theta1_pix, theta2_pix (+ tv components for dT).
        """
        get = lambda k: np.asarray(halo_cat[k], np.float64)
        nh = len(get("m200"))

        def one(i):
            if to == "dT":
                return lensing.nfw_temperature_perturbation_map(
                    get("r200_deg")[i], get("m200")[i], get("c_NFW")[i],
                    jnp.array([get("theta1_tv")[i], get("theta2_tv")[i]]),
                    get("Dc")[i], npix=patch_npix, extent=extent,
                    directions=tuple(direction), suppress=suppress,
                    suppression_r=suppression_R)
            if to == "ksz":
                from ..ops import sz as sz_ops

                r200_mpc = float(np.tan(np.deg2rad(get("r200_deg")[i]))
                                 * get("Dc")[i])
                return sz_ops.ksz_patch_from_halo(
                    get("m200")[i], get("c_NFW")[i], r200_mpc,
                    get("v_los")[i], npix=patch_npix, extent=extent)
            if to == "y":
                from ..ops import sz as sz_ops

                # columns: m500 [Msun, physical], r500 [Mpc], e_z
                return sz_ops.compton_y_patch(
                    get("m500")[i], get("r500")[i], get("e_z")[i],
                    npix=patch_npix, extent=extent)
            return lensing.nfw_deflection_angle_map(
                get("r200_deg")[i], get("m200")[i], get("c_NFW")[i],
                get("Dc")[i], npix=patch_npix, extent=extent,
                directions=tuple(direction), suppress=suppress,
                suppression_r=suppression_R)

        patches = jnp.stack([one(i) for i in range(nh)])
        centers = jnp.stack(
            [jnp.asarray(get("theta1_pix"), jnp.int32).astype(jnp.int32),
             jnp.asarray(get("theta2_pix"), jnp.int32).astype(jnp.int32)],
            axis=-1)
        canvas = jnp.zeros((npix, npix))
        out = lensing.paint_halo_patches(canvas, patches, centers)
        if opening_angle is None:
            # infer the FOV from the pixel scale implied by the first halo
            oa = float(get("r200_deg")[0] * npix
                       / max(float(np.asarray(halo_cat["r200_pix"])[0]), 1))
        else:
            oa = opening_angle
        quantity = {"dT": "rs", "ksz": "ksz", "y": "y"}.get(to, "alpha")
        return cls(out, oa, quantity)

    @classmethod
    def from_halo_catalogue_to_temperature_perturbation_map(
            cls, halo_cat, extent: float = 1.0, direction=(0, 1),
            suppress: bool = False, suppression_R: float = 1.0,
            npix: int = 8192, opening_angle: float = 20.0, **kw
    ) -> "SkyArray":
        """Reference-named alias (sky_array.py:341-353, the RS/BG moving-
        cluster dT map) for from_halo_dataframe(to='dT')."""
        return cls.from_halo_dataframe(
            halo_cat, npix, extent, list(direction), suppress,
            suppression_R, to="dT", opening_angle=opening_angle, **kw)

    # -------------------------------------------------------------- analysis
    def pdf(self, nbins: int, of: str = "orig") -> dict:
        vals, bins = np.histogram(np.asarray(self.data[of]), bins=nbins,
                                  density=True)
        return {"values": vals, "bins": bins}

    def wl_peak_counts(self, nbins: int, field_conversion: str = None,
                       of: str = "orig", limits: Optional[tuple] = None):
        """(sky_array.py:435-473) -> dict with kappa bin centers + counts."""
        img = self.data[of]
        if field_conversion == "normalize":
            img = img - jnp.mean(img)
        if limits is None:
            lo = float(jnp.percentile(img, 5))
            hi = float(jnp.percentile(img, 95))
        else:
            lo, hi = min(limits), max(limits)
        centers, counts = peak_ops.peak_counts(img, lo, hi, nbins=nbins)
        return {"kappa": np.asarray(centers), "counts": np.asarray(counts)}

    def minkowski_functionals(self, nbins: int = 32, of: str = "orig",
                              limits: Optional[tuple] = None) -> dict:
        """Morphology of excursion sets (area/boundary/genus); the
        companion statistic to pdf() and wl_peak_counts(). Thresholds in
        map units, derivatives per radian (see ops/minkowski.py)."""
        from ..ops import minkowski as mf_ops
        return mf_ops.minkowski_functionals(
            self.data[of], nbins=nbins, limits=limits,
            opening_angle_deg=self._opening_angle)

    def aperture_mass(self, theta_ap_arcmin: float, of: str = "orig",
                      rtn: bool = True):
        """Map(theta0) field with the Schneider+98 compensated filter
        (ops/aperture_mass.py); rtn=False stores it as a 'map_<scale>'
        layer like filter()."""
        from ..ops import aperture_mass as map_ops
        out = map_ops.aperture_mass_map(self.data[of], self._opening_angle,
                                        theta_ap_arcmin)
        if rtn:
            return out
        self.data[f"{of}_map{theta_ap_arcmin:g}"] = out

    def aperture_mass_moments(self, scales_arcmin, of: str = "orig") -> dict:
        """<Map^2>, <Map^3>, skewness over aperture scales."""
        from ..ops import aperture_mass as map_ops
        return map_ops.aperture_mass_moments(self.data[of],
                                             self._opening_angle,
                                             scales_arcmin)

    # ------------------------------------------------------------ transforms
    def resize(self, npix: int, of: str = "orig", rtn: bool = False):
        out = jax.image.resize(self.data[of], (npix, npix), method="linear")
        if rtn:
            return out
        self.data[of] = out

    def crop(self, xlimit, ylimit, of: str = "orig", rtn: bool = False):
        """(sky_array.py:498-538); float limits are percentages."""
        xlimit = np.asarray(xlimit)
        ylimit = np.asarray(ylimit)
        if isinstance(xlimit[0], (float, np.floating)):
            xlimit = (self.npix * xlimit / 100).astype(int)
            ylimit = (self.npix * ylimit / 100).astype(int)
        zoom = self.data[of][xlimit[0]:xlimit[1], ylimit[0]:ylimit[1]]
        if rtn:
            return zoom
        self._opening_angle = (self._opening_angle
                               * abs(int(np.diff(xlimit)[0])) / self.npix)
        self.data[of] = zoom

    def division(self, ntiles: int, of: str = "orig"):
        """Split into ntiles x ntiles sub-maps (sky_array.py:541-570)."""
        img = self.data[of]
        t = img.shape[0] // ntiles
        tiles = [img[i * t:(i + 1) * t, j * t:(j + 1) * t]
                 for i in range(ntiles) for j in range(ntiles)]
        return jnp.stack(tiles)

    @staticmethod
    def merge(tiles, rtn: bool = True):
        """Inverse of division (sky_array.py:572-601)."""
        ntiles = int(np.sqrt(tiles.shape[0]))
        rows = [jnp.hstack([tiles[i * ntiles + j] for j in range(ntiles)])
                for i in range(ntiles)]
        return jnp.vstack(rows)

    def substract_mean(self, of: str = "orig", rtn: bool = False):
        out = self.data[of] - jnp.mean(self.data[of])
        if rtn:
            return out
        self.data[of] = out

    # --------------------------------------------------------------- filters
    _FILTERS = {
        "gaussian": lambda img, oa, **kw: filter_ops.gaussian(img, oa, **kw),
        "gaussian_high_pass": lambda img, oa, **kw:
            filter_ops.gaussian_high_pass(img, oa, **kw),
        "gaussian_third_derivative": lambda img, oa, **kw:
            filter_ops.dgd3(img, oa, **kw),
        "gaussian_compensated": lambda img, oa, **kw:
            filter_ops.gaussian_compensated(img, oa, **kw),
        "apodization": lambda img, oa, **kw: filter_ops.apodization(img),
        "aperture_photometry": lambda img, oa, **kw:
            filter_ops.aperture_photometry(img, oa, **kw),
    }

    def filter(self, filter_dsc: dict, on: str = "orig", rtn: bool = False):
        """Chain filters by name (sky_array.py:623-662). Each entry:
        {filter_name: {abbrev: str, **kwargs}}."""
        img = self.data[on]
        names = [on]
        for fname, args in filter_dsc.items():
            args = dict(args)
            abbrev = args.pop("abbrev", fname[:3])
            names.append(abbrev)
            img = self._FILTERS[fname](img, self._opening_angle, **args)
        if rtn:
            return img
        self.data["_".join(names)] = img
        return None

    def smoothing(self, sigma_arcmin: float, on: str = "orig"):
        """Convenience Gaussian smooth; adds layer '<on>_smooth'."""
        self.data[on + "_smooth"] = filter_ops.gaussian(
            self.data[on], self._opening_angle, sigma_arcmin=sigma_arcmin)
        return self.data[on + "_smooth"]

    # ----------------------------------------------------------------- noise
    def create_galaxy_shape_noise(self, std: float, ngal: float,
                                  rnd_seed: Optional[int] = None,
                                  std_pix: Optional[float] = None):
        """GSN layer (sky_array.py:665-706). std_pix defaults to the proper
        sigma_e/sqrt(2 n_gal A_pix) (the reference hardcodes 0.007)."""
        theta_pix = 60.0 * self._opening_angle / self.npix  # arcmin
        if std_pix is None:
            std_pix = float(np.sqrt(std ** 2 / (2.0 * theta_pix ** 2 * ngal)))
        key = jax.random.PRNGKey(0 if rnd_seed is None else rnd_seed)
        self.data["gsn"] = std_pix * jax.random.normal(
            key, (self.npix, self.npix))
        return self.data["gsn"]

    def add_galaxy_shape_noise(self, on: str = "orig"):
        if "kappa" not in self.quantity:
            raise ValueError(f"GSN should not be added to {self.quantity}")
        self.data["orig_gsn"] = self.data[on] + self.data["gsn"]
        return self.data["orig_gsn"]

    def create_cmb(self, cl_ell, cl_val, rnd_seed: int = 0):
        """Flat-sky CMB realization layer from a Cl table
        (sky_array.py:709-760, healpy-free)."""
        self.data["cmb"] = angular_power.cl_to_flat_map(
            jax.random.PRNGKey(rnd_seed), jnp.asarray(cl_ell),
            jnp.asarray(cl_val), self.npix, self._opening_angle)
        return self.data["cmb"]

    def add_cmb(self, filepath_cl: Optional[str] = None,
                filepath_cmb: Optional[str] = None, on: str = "orig",
                lmax: Optional[int] = None, rnd_seed: int = 0,
                overwrite: bool = True) -> np.ndarray:
        """Add a CMB layer to the map (sky_array.py:742-775). The
        reference's create_cmb body was nonfunctional (its pymaster
        synfast_flat call is commented out at sky_array.py:735-737); here
        the flat-sky GRF synthesis is real. filepath_cl: .npy with rows
        [ell, Cl_TT]; filepath_cmb: precomputed map .npy."""
        if "cmb" not in self.data:
            if filepath_cl is not None:
                tab = np.load(filepath_cl)
                ell, cl = np.asarray(tab[0]), np.asarray(tab[1])
                if lmax is not None:
                    keep = ell <= lmax
                    ell, cl = ell[keep], cl[keep]
                self.create_cmb(ell, cl, rnd_seed=rnd_seed)
            elif filepath_cmb is not None:
                self.data["cmb"] = np.load(filepath_cmb)
            else:
                raise ValueError("need filepath_cl or filepath_cmb")
        out = np.asarray(self.data[on]) + np.asarray(self.data["cmb"])
        if overwrite:
            self.data[on] = out
        else:
            self.data[f"{on}_cmb"] = out
        return out

    # --------------------------------------------------------------- lensing
    def convert_convergence_to_deflection(self, on: str = "orig",
                                          padding_factor: int = 4):
        """kappa -> (alpha1, alpha2) in radians (sky_array.py:780-818;
        C-library path replaced by the spectral op)."""
        oa_rad = np.deg2rad(self._opening_angle)
        a1, a2 = lensing.kappa_to_alpha(self.data[on], oa_rad,
                                        padding_factor=padding_factor)
        self.data["defltx"] = a1
        self.data["deflty"] = a2
        return a1, a2

    def convert_deflection_to_shear(self, on: Tuple[str, str] =
                                    ("defltx", "deflty")):
        """(gamma1, gamma2) from deflection (sky_array.py:820-870)."""
        oa_rad = np.deg2rad(self._opening_angle)
        g1, g2 = lensing.alpha_to_gamma(self.data[on[0]], self.data[on[1]],
                                        oa_rad)
        self.data["shearx"] = g1
        self.data["sheary"] = g2
        return g1, g2

    def convert_convergence_to_shear(self, on: str = "orig",
                                     padding_factor: int = 2):
        """(gamma1, gamma2) straight from kappa: one padded spectral
        spin-2 rotation (ops.lensing.kappa_to_gamma) — skips the alpha
        intermediate the two-step chain materializes, exact where the
        chain's finite differences are 2nd-order."""
        oa_rad = np.deg2rad(self._opening_angle)
        g1, g2 = lensing.kappa_to_gamma(self.data[on], oa_rad,
                                        padding_factor=padding_factor)
        self.data["shearx"] = g1
        self.data["sheary"] = g2
        return g1, g2

    def shear_xi_pm(self, nbins: int = 20, theta_min_arcmin=None,
                    theta_max_arcmin=None,
                    on: Tuple[str, str] = ("shearx", "sheary")):
        """Shear correlation functions xi_pm(theta) of the stored shear
        layers (ops.shear_2pt.xi_pm_flat_sky; the survey observable the
        reference's lenstools stack never measured).

        Returns (theta_arcmin, xi_plus, xi_minus, npairs)."""
        from ..ops import shear_2pt
        return shear_2pt.xi_pm_flat_sky(
            self.data[on[0]], self.data[on[1]], self._opening_angle,
            nbins=nbins, theta_min_arcmin=theta_min_arcmin,
            theta_max_arcmin=theta_max_arcmin)

    def cosebis(self, nmax: int, theta_min_arcmin: float,
                theta_max_arcmin: float, nbins: int = 64,
                on: Tuple[str, str] = ("shearx", "sheary")):
        """COSEBIs E/B modes of the stored shear layers: xi_pm measured
        on [theta_min, theta_max] (log bins), then the linear-COSEBIs
        filter integrals (ops.shear_2pt). B_n is the standard B-mode
        null. Returns (E (nmax,), B (nmax,))."""
        from ..ops import shear_2pt
        # measure past both ends so the BIN CENTERS straddle the COSEBIs
        # interval (cosebis_from_xipm interpolates, never extrapolates),
        # and drop empty annuli (they report theta = 0)
        half_box = self._opening_angle * 30.0
        th, xp, xm, cnt = self.shear_xi_pm(
            nbins=nbins, theta_min_arcmin=theta_min_arcmin * 0.7,
            theta_max_arcmin=min(theta_max_arcmin * 1.3, half_box),
            on=on)
        keep = np.asarray(cnt) > 0
        th_k = np.asarray(th)[keep]
        if th_k.size == 0 or th_k[-1] < theta_max_arcmin:
            # the largest measurable bin CENTER bounds the usable
            # interval; a theta_max at/near the half-box cannot be
            # covered — tell the caller the achievable bound instead of
            # letting the interior coverage guard fire opaquely
            hi = f"{th_k[-1]:.1f}" if th_k.size else "none (no bin has pairs)"
            raise ValueError(
                f"cosebis: theta interval [{theta_min_arcmin}, "
                f"{theta_max_arcmin}] arcmin is not coverable on this "
                f"{self._opening_angle} deg field — the largest "
                f"measurable bin center is {hi}")
        return shear_2pt.cosebis_from_xipm(
            th_k, jnp.asarray(xp)[keep],
            jnp.asarray(xm)[keep], nmax, theta_min_arcmin,
            theta_max_arcmin)

    def to_file(self, dir_out: str, on: str = "orig",
                extension: str = "npy") -> str:
        os.makedirs(dir_out, exist_ok=True)
        fname = os.path.join(
            dir_out, f"{self.quantity}_{on}_{self.npix}.{extension}")
        np.save(fname, np.asarray(self.data[on]))
        return fname


class SkyMap:
    """Facade dispatching to SkyArray (healpix variants live in
    models.skyhealpix, gated on optional healpy)."""

    @staticmethod
    def from_file(npix: int, theta: float, quantity: str, dir_in: str,
                  map_file: str, convert_unit: bool = True) -> SkyArray:
        return SkyArray.from_file(map_file, theta, quantity,
                                  convert_unit=convert_unit)

    @staticmethod
    def from_array(map_array, opening_angle: float, quantity: str,
                   dirs=None) -> SkyArray:
        return SkyArray.from_array(map_array, opening_angle, quantity, dirs)

    @staticmethod
    def from_dataframe(cols, opening_angle: float, quantity: str,
                       convert_unit: bool = True) -> SkyArray:
        return SkyArray.from_columns(cols, opening_angle, quantity,
                                     convert_unit=convert_unit)
