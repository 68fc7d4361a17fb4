"""SkyHealpix: full-sky map container on the native RING pixelization.

Rebuild of /root/reference/src/astrild/rays/skys/sky_healpix.py:30-418 and
rays/skyio.py:15-30 without healpy: DataFrame/column binning into maps,
cartesian (flat-sky) projection to SkyArray, rotation, masks, CMB
lensing by deflection remapping (rays/utils/healpytools.py:52-59), and
native spherical-harmonic synthesis/analysis via ops/sht.py (the
reference's hp.sphtfunc.synfast calls, sky_healpix.py:183-241).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..utils import healpix as hp

__all__ = ["SkyHealpix"]

# Above this lmax the O(lmax^2 * nring) Legendre table of ops/sht.py is
# impractical; dispatch to the table-free ops/sht_large.py path instead.
_TABLE_LMAX_LIMIT = 512


def _sht_backend(nside: int, lmax: int):
    """(synfast, anafast, smoothing) picked by scale.

    The table path is exact and cheap at small lmax; the libsharp-style
    path (ring FFTs + on-device Legendre recursion) covers the reference's
    production healpy scale (nside 512-2048) up to lmax = 4*nside - 1
    (belt alias-fold; includes healpy's routine lmax = 3*nside - 1)."""
    from ..ops import sht, sht_large

    if lmax <= _TABLE_LMAX_LIMIT:
        return sht.synfast, sht.anafast, sht.smoothing
    if lmax > 4 * nside - 1:
        raise ValueError(f"lmax={lmax} > 4*nside-1={4 * nside - 1} is not "
                         "supported by the large-lmax SHT path")
    return (sht_large.synfast_large, sht_large.anafast_large,
            sht_large.smoothing_large)


class SkyHealpix:
    """Named full-sky layers at a fixed nside (RING)."""

    # CLASS-level cache: SkyHealpix instances are created per map, so a
    # per-instance cache would rebuild the jitted distributed factories
    # (30-200 s first compile through the tunnel) for every realization.
    # jax.sharding.Mesh is hashable/eq-comparable, so equal meshes dedup.
    _dist_sht: Dict = {}  # (mesh, nside, lmax[, kind]) -> jitted fns

    def __init__(self, hpmap: np.ndarray, quantity: str = "kappa_2"):
        self.data: Dict[str, np.ndarray] = {"orig": np.asarray(hpmap)}
        self.quantity = quantity
        self.nside = hp.npix2nside(len(hpmap))

    # ---------------------------------------------------------- constructors
    @classmethod
    def from_columns(cls, cols, quantity: str, nside: int,
                     theta1_key: str = "the_co", theta2_key: str = "phi_co"
                     ) -> "SkyHealpix":
        """Bin (theta, phi) samples into a map: ang2pix + per-pixel mean
        (skyio.py:15-30). Angles in radians."""
        theta = np.asarray(cols[theta1_key])
        phi = np.asarray(cols[theta2_key])
        vals = np.asarray(cols[quantity])
        pix = hp.ang2pix_ring(nside, theta, phi)
        npix = hp.nside2npix(nside)
        ssum = np.bincount(pix, weights=vals, minlength=npix)
        cnt = np.bincount(pix, minlength=npix)
        out = np.full(npix, hp.UNSEEN)
        good = cnt > 0
        out[good] = ssum[good] / cnt[good]
        return cls(out, quantity)

    from_dataframe = from_columns

    @classmethod
    def from_array(cls, hpmap, quantity: str = "kappa_2") -> "SkyHealpix":
        """(sky_healpix.py:159-180)"""
        return cls(np.asarray(hpmap), quantity)

    @classmethod
    def from_file(cls, map_file: str, quantity: str = "kappa_2",
                  nside: Optional[int] = None,
                  convert_unit: bool = True) -> "SkyHealpix":
        """Load a full-sky map from .h5 (ray-sample columns, binned to
        nside) or .npy (pixel array) — sky_healpix.py:80-125; the fits
        branch is healpy-only and not supported."""
        ext = map_file.rsplit(".", 1)[-1]
        if ext == "h5":
            from ..io import columnar_h5
            from ..utils.constants import C_LIGHT_KMS

            cols = dict(columnar_h5.read_table(map_file))
            if nside is None:
                raise ValueError("nside is required for .h5 ray samples")
            if convert_unit and quantity in cols:
                cols[quantity] = np.asarray(cols[quantity]) / C_LIGHT_KMS ** 2
            return cls.from_columns(cols, quantity, nside)
        if ext == "npy":
            return cls.from_array(np.load(map_file), quantity)
        raise ValueError(f"unsupported map file format: {ext}")

    @classmethod
    def from_Cl_array(cls, cl_array, quantity: str, nside: int,
                      lmax: Optional[int] = None, rnd_seed: int = 0
                      ) -> "SkyHealpix":
        """Gaussian random sky from an angular power spectrum — the
        reference's hp.sphtfunc.synfast path (sky_healpix.py:219-241),
        here the native MXU spherical-harmonic synthesis (ops/sht.py, or
        the table-free ops/sht_large.py beyond lmax 512)."""
        import jax

        cl = np.asarray(cl_array, np.float64)
        if lmax is not None:
            cl = cl[: lmax + 1]
        synfast, _, _ = _sht_backend(nside, cl.shape[0] - 1)
        m = synfast(jax.random.PRNGKey(rnd_seed), cl, nside)
        return cls(np.asarray(m), quantity)

    @classmethod
    def from_Cl_file(cls, cl_file: str, quantity: str, nside: int,
                     lmax: Optional[int] = None, key: Optional[str] = None,
                     rnd_seed: int = 0) -> "SkyHealpix":
        """(sky_healpix.py:183-215): .npy or .npz[key] Cl table."""
        ext = cl_file.rsplit(".", 1)[-1]
        if ext == "npy":
            cl = np.load(cl_file)
        elif ext == "npz":
            cl = np.load(cl_file)[key]
        else:
            raise ValueError(f"unsupported Cl file format: {ext}")
        return cls.from_Cl_array(cl, quantity, nside, lmax=lmax,
                                 rnd_seed=rnd_seed)

    create_cmb = from_Cl_array

    # -------------------------------------------------------------- analysis
    @classmethod
    def from_density_shells(cls, shells, chis, dchis, chi_s, omega_m,
                            scale_factors=None,
                            quantity: str = "kappa_2") -> "SkyHealpix":
        """Full-sky Born convergence from HEALPix density-contrast shells.

        The full-sky counterpart of SkyArray.from_density_planes (Born
        level): ops.lensing.born_convergence's plane scan is
        shape-agnostic, so (nshell, npix_healpix) RING maps integrate
        exactly like flat patches — the reference summed only the
        flat-sky maps Ray-Ramses emitted (simcoll.py:238-341).
        """
        import jax.numpy as jnp

        from ..ops import lensing as _lens

        kappa = _lens.born_convergence(
            jnp.asarray(shells), jnp.asarray(chis), jnp.asarray(dchis),
            chi_s, omega_m, scale_factors=scale_factors)
        return cls(np.asarray(kappa), quantity)

    @classmethod
    def from_multiplane_shells(cls, shells, chis, dchis, chi_s, omega_m,
                               lmax: Optional[int] = None,
                               scale_factors=None,
                               quantity: str = "kappa_2") -> "SkyHealpix":
        """Full-sky post-Born ray tracing through HEALPix density
        shells (ops.lightcone_sphere.multiplane_raytrace_healpix): the
        curved-sky upgrade of from_density_shells. The returned map is
        the traced kappa; gamma1/gamma2/omega (image rotation) land in
        .data, ready for shear_eb_spectra-style analysis."""
        from ..ops import lightcone_sphere as lcs

        if np.ndim(chi_s) != 0:
            raise ValueError(
                "from_multiplane_shells builds ONE SkyHealpix and takes "
                "a scalar chi_s; for tomography call "
                "ops.lightcone_sphere.multiplane_raytrace_healpix with "
                "the chi_s array (leading nsrc axis on its outputs) and "
                "wrap each source's maps yourself")
        out = lcs.multiplane_raytrace_healpix(
            shells, chis, dchis, chi_s, omega_m, lmax=lmax,
            scale_factors=scale_factors)
        sky = cls(np.asarray(out["kappa"]), quantity)
        for k in ("gamma1", "gamma2", "omega"):
            sky.data[k] = np.asarray(out[k])
        return sky

    def to_skyarray(self, opening_angle_deg: float, npix: int,
                    center_theta_phi=(np.pi / 2, 0.0), of: str = "orig"):
        """Gnomonic-like projection onto a flat grid around a center
        (sky_healpix.py:250-278)."""
        from .skymap import SkyArray

        t0, p0 = center_theta_phi
        half = np.deg2rad(opening_angle_deg) / 2.0
        d = np.linspace(-half, half, npix)
        dt, dp = np.meshgrid(d, d, indexing="ij")
        theta = t0 + dt
        phi = p0 + dp / np.maximum(np.sin(np.clip(theta, 1e-6, np.pi - 1e-6)),
                                   1e-6)
        vals = hp.get_interp_val(self.data[of], theta, phi)
        return SkyArray.from_array(vals, opening_angle_deg, self.quantity)

    def rotate(self, rot, of: str = "orig") -> np.ndarray:
        """Rotate a layer (sky_healpix.py:369-398). `rot` is either a 3x3
        rotation matrix or a healpy-Rotator-style (a1, a2, a3) Euler-angle
        tuple in degrees (Z-Y-X order)."""
        rot = np.asarray(rot, float)
        if rot.shape == (3,):
            rot = hp.euler_matrix_zyx(*rot)
        out = hp.rotate_map(self.data[of], rot)
        self.data[of + "_rot"] = out
        return out

    def create_mask(self, theta_range=None, phi_range=None,
                    of: str = "orig") -> np.ndarray:
        """Boolean mask of pixels inside the given angular ranges
        (sky_healpix.py:334-366)."""
        ipix = np.arange(hp.nside2npix(self.nside))
        theta, phi = hp.pix2ang_ring(self.nside, ipix)
        mask = np.ones(len(ipix), bool)
        if theta_range is not None:
            mask &= (theta >= theta_range[0]) & (theta <= theta_range[1])
        if phi_range is not None:
            mask &= (phi >= phi_range[0]) & (phi <= phi_range[1])
        self.data["mask"] = mask
        return mask

    def smoothing(self, fwhm_rad: float, lmax: Optional[int] = None,
                  of: str = "orig") -> np.ndarray:
        """Harmonic-space Gaussian smoothing (healpy hp.smoothing parity,
        healpytools.py:11); stores '<of>_smooth'."""
        if lmax is not None:
            L = lmax
        elif 3 * self.nside - 1 <= _TABLE_LMAX_LIMIT:
            L = 3 * self.nside - 1  # healpy default, table path
        else:
            L = 2 * self.nside      # large-lmax path ceiling
        _, _, smoothing = _sht_backend(self.nside, L)
        out = np.asarray(smoothing(self.data[of], fwhm_rad, L))
        self.data[of + "_smooth"] = out
        return out

    def _dist_factory(self, mesh, lmax: int, ax: str, spin2: bool = False):
        """Cached m-sharded SHT factory for this nside (class-level cache
        keyed by the hashable Mesh, so equal meshes and repeated
        per-realization instances reuse one jitted build)."""
        if ax not in mesh.shape:
            raise ValueError(
                f"mesh has no axis {ax!r} to shard the SHT m-blocks "
                f"over (axes: {tuple(mesh.shape)}); pass ax=<axis name>")
        if mesh.shape[ax] == 1 and len(mesh.shape) > 1:
            import warnings

            warnings.warn(
                f"SkyHealpix: mesh axis {ax!r} has size 1 — the SHT "
                "will run replicated with no speedup; pass ax= a "
                f"larger axis (mesh axes: {dict(mesh.shape)})",
                stacklevel=3)
        key = (mesh, self.nside, lmax, ax, spin2)
        fns = SkyHealpix._dist_sht.get(key)
        if fns is None:
            from ..parallel.sht_large import (
                make_distributed_sht_large,
                make_distributed_sht_spin2_large)

            make = (make_distributed_sht_spin2_large if spin2
                    else make_distributed_sht_large)
            fns = make(mesh, self.nside, lmax, ax=ax)
            SkyHealpix._dist_sht[key] = fns
        return fns

    def anafast(self, lmax: int, of: str = "orig", niter: int = 3,
                mesh=None, ax: str = "x",
                method: str | None = None) -> np.ndarray:
        """Angular power spectrum of a layer (native SHT analysis).

        mesh: a jax.sharding.Mesh runs the m-block-sharded scan-path
        analysis (parallel.sht_large.make_distributed_sht_large — the
        production nside >= 1024 regime, where the Legendre scans are
        >90% of the cost and distribute over mesh axis `ax`). method
        defaults to 'jacobi' wherever the LOCAL call would use the
        table backend (<= lmax 512, pure Jacobi) so passing mesh= does
        not silently change the estimator in the 2*nside < lmax <= 512
        band; pass method='auto'/'cg'/'jacobi' to control the solver.
        """
        if mesh is not None:
            from ..ops.sht import alm2cl

            if method is None:
                method = ("jacobi" if lmax <= _TABLE_LMAX_LIMIT
                          else "auto")
            fns = self._dist_factory(mesh, lmax, ax)
            a_re, a_im = fns[1](self.data[of], niter=niter,
                                method=method)
            return np.asarray(alm2cl(a_re, a_im))
        _, anafast, _ = _sht_backend(self.nside, lmax)
        return np.asarray(anafast(self.data[of], lmax, niter=niter))

    def shear_from_kappa(self, lmax: Optional[int] = None,
                         of: str = "orig", niter: int = 3, mesh=None,
                         ax: str = "x"):
        """Full-sky spherical Kaiser-Squires forward: store 'gamma1'/
        'gamma2' layers from a convergence layer via spin-2 synthesis of
        E_lm = sqrt((l+2)(l-1)/(l(l+1))) kappa_lm (the channel healpy
        provides as alm2map_spin and the reference never exposed).
        Tables below _TABLE_LMAX_LIMIT (ops/sht_spin.py); the scan path
        (ops/sht_spin_large.py) above — production nside 1024+.

        mesh: run both the scalar analysis and the spin-2 synthesis on
        the m-block-sharded scan paths (parallel/sht_large), factories
        cached per (mesh, nside, lmax)."""
        from ..ops import sht, sht_large, sht_spin, sht_spin_large

        L = lmax if lmax is not None else min(2 * self.nside, 512)
        if mesh is not None:
            fns = self._dist_factory(mesh, L, ax)
            fns2 = self._dist_factory(mesh, L, ax, spin2=True)
            method = "jacobi" if L <= _TABLE_LMAX_LIMIT else "auto"
            k_re, k_im = fns[1](self.data[of], niter=niter,
                                method=method)
            e_re, e_im = sht_spin.kappa_alm_to_shear_alm(k_re, k_im)
            z = np.zeros_like(np.asarray(e_re))
            g1, g2 = fns2[0](e_re, e_im, z, z)
        else:
            if L <= _TABLE_LMAX_LIMIT:
                k_re, k_im = sht.analyze(self.data[of], self.nside, L,
                                         niter=niter)
            else:
                k_re, k_im = sht_large.analyze_large(self.data[of],
                                                     self.nside, L,
                                                     niter=niter)
            e_re, e_im = sht_spin.kappa_alm_to_shear_alm(k_re, k_im)
            z = np.zeros_like(np.asarray(e_re))
            if L <= _TABLE_LMAX_LIMIT:
                g1, g2 = sht_spin.synthesize_spin2(e_re, e_im, z, z,
                                                   self.nside, L)
            else:
                g1, g2 = sht_spin_large.synthesize_spin2_large(
                    e_re, e_im, z, z, self.nside, L)
        self.data["gamma1"] = np.asarray(g1)
        self.data["gamma2"] = np.asarray(g2)
        return self.data["gamma1"], self.data["gamma2"]

    def shear_eb_spectra(self, lmax: Optional[int] = None,
                         g1: str = "gamma1", g2: str = "gamma2",
                         niter: int = 3):
        """(Cl_EE, Cl_BB, Cl_EB) of stored shear layers via spin-2
        analysis — the full-sky counterpart of ops.angular_power.
        cl_shear_eb (B is the post-Born/systematics null channel)."""
        from ..ops import sht_spin, sht_spin_large

        L = lmax if lmax is not None else min(2 * self.nside, 512)
        fn = (sht_spin.anafast_spin2 if L <= _TABLE_LMAX_LIMIT
              else sht_spin_large.anafast_spin2_large)
        return tuple(np.asarray(c) for c in fn(
            self.data[g1], self.data[g2], L, niter=niter))

    def shear_xi_pm(self, theta_arcmin, lmax: Optional[int] = None,
                    niter: int = 3, g1: str = "gamma1",
                    g2: str = "gamma2"):
        """Curved-sky xi_pm(theta) of stored shear layers: spin-2
        analysis to (C_EE, C_BB), then the exact Wigner-d transform
        (ops.shear_2pt.xi_pm_from_cl_curved) — the full-sky route to
        the survey observable (flat-sky fields: SkyArray.shear_xi_pm).
        Returns (xi_plus, xi_minus) at theta_arcmin."""
        from ..ops.shear_2pt import xi_pm_from_cl_curved

        ce, cb, _ = self.shear_eb_spectra(lmax=lmax, g1=g1, g2=g2,
                                          niter=niter)
        th = np.asarray(theta_arcmin, np.float64) * np.pi / 180.0 / 60.0
        return xi_pm_from_cl_curved(ce, th, cl_b=cb)

    def sum_of_maps(self, map1: str, map2: str) -> None:
        """(sky_healpix.py:310-312)"""
        self.data[f"{map1}_{map2}"] = self.data[map1] + self.data[map2]

    def arithmetic_operation_with(self, other_map, on: str = "orig",
                                  operation: str = "add") -> np.ndarray:
        """(sky_healpix.py:314-331)"""
        ops = {"add": np.add, "sub": np.subtract, "mul": np.multiply,
               "div": np.divide}
        out = ops[operation](self.data[on], np.asarray(other_map))
        self.data[f"{on}_{operation}"] = out
        return out

    def add_mask(self, on: str = "orig", theta_range=None,
                 phi_range=None) -> np.ndarray:
        """Store '<on>_mask': the layer with masked pixels set to UNSEEN
        (sky_healpix.py:334-340; healpy's hp.ma -> explicit sentinel)."""
        if "mask" not in self.data or theta_range is not None \
                or phi_range is not None:
            self.create_mask(theta_range=theta_range, phi_range=phi_range)
        out = np.where(self.data["mask"], np.asarray(self.data[on]),
                       hp.UNSEEN)
        self.data[on + "_mask"] = out
        return out

    def lens_cmb_from_kappa(self, cmb_map, kappa_map,
                            lmax: Optional[int] = None) -> np.ndarray:
        """Lens a CMB map by the deflection field of a convergence map:
        kappa -> alm (scale-selected SHT backend) -> spin-1 gradient
        synthesis of psi -> device bilinear remap. The production
        lensed-CMB synthesis loop (lenspyx/taylens-style) the reference
        could not express — its CMB surface stopped at adding flat-sky
        GRF patches (sky_array.py:742-775).

        lmax defaults to 2*nside (the unbiased-adjoint analysis regime);
        the spin-1 synthesis auto-selects the table path below lmax 512
        and the scan (libsharp-style) path above.

        Device-resident end to end: kappa and CMB are uploaded once,
        analyze -> deflection synthesis -> bilinear remap chain on jax
        arrays, one download of the lensed map (the old host round trip
        between stages cost ~12 s of the 16 s warm call at nside=1024 —
        measured stage split in docs/PERFORMANCE.md)."""
        import jax.numpy as jnp

        from ..ops import sht, sht_large, sht_spin, sht_spin_large

        L = 2 * self.nside if lmax is None else lmax
        kappa_map = jnp.asarray(np.asarray(kappa_map, np.float32))
        # the plain adjoint (niter=0) is unbiased only at L <= 2*nside;
        # the super-Nyquist band needs the CG normal-equations solve
        # (table-path Jacobi overshoots there) or the deflection comes
        # back silently biased at ell > 2*nside
        if L <= 2 * self.nside:
            if L <= _TABLE_LMAX_LIMIT:
                kr, ki = sht.analyze(kappa_map, self.nside, L, niter=0)
            else:
                kr, ki = sht_large.analyze_large(kappa_map, self.nside,
                                                 L, niter=0)
        else:
            kr, ki = sht_large.analyze_large(kappa_map, self.nside, L,
                                             niter=3, method="auto")
        if L <= _TABLE_LMAX_LIMIT:
            a_t, a_p = sht_spin.deflection_from_kappa_alm(
                kr, ki, self.nside, L)
        else:
            a_t, a_p = sht_spin_large.deflection_from_kappa_alm_large(
                kr, ki, self.nside, L)
        return self.lens_cmb_by_deflection(cmb_map, a_t, a_p)

    def lens_cmb_by_deflection(self, cmb_map, alpha_theta, alpha_phi
                               ) -> np.ndarray:
        """Lens a CMB map by remapping with a deflection field: sample the
        unlensed map at the source-plane positions (healpytools.py:52-59).

        The whole remap (pixel centers, source angles, bilinear stencil,
        gather) is one jitted device chain (healpix_jax.
        remap_by_deflection); deflection inputs may be jax arrays (e.g.
        straight from lens_cmb_from_kappa — no transfer) or host arrays
        (uploaded once). With a lightcone in hand the deflection field
        itself can come from ops.sht_spin.deflection_from_kappa_alm of a
        Born/multiplane kappa.
        """
        import jax.numpy as jnp

        from ..utils import healpix_jax as hpj

        # the device path is float32: split off the monopole in float64
        # so absolute-units maps (T ~ 2.7 K + uK fluctuations) keep
        # their fluctuation precision through the cast
        cmb_map = np.asarray(cmb_map, np.float64)
        mono = cmb_map.mean()
        lensed = mono + np.asarray(hpj.remap_by_deflection(
            jnp.asarray((cmb_map - mono).astype(np.float32)),
            alpha_theta, alpha_phi, self.nside))
        self.data["cmb_lensed"] = lensed
        return lensed
