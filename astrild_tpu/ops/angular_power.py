"""Angular power spectra on the flat sky + linear ISW C_ell via Limber.

TPU-native replacement for the reference's AngularPowerSpectrum
(/root/reference/src/astrild/power_spectra/angular_power_spectrum.py:38-105,
lenstools/healpy/NaMaster backends) and LinearAngularPowerSpectrum
(linear_angular_power_spectrum.py:173-225, scipy.quad + joblib over ells ->
here one vmapped trapezoid integral).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.constants import C_LIGHT_KMS, DEG2RAD, H0_OVER_C_HMPC
from ..utils.cosmology import Cosmology
from .linear_power import normalization, p_dpdp

__all__ = ["cl_flat_sky", "cl_to_flat_map", "cl_isw_limber",
           "shear_eb_maps", "kappa_to_shear_maps", "cl_shear_eb",
           "cl_kappa_cross_limber",
           "cl_flat_sky_cross", "flat_sky_mode_counts",
           "cl_kappa_limber", "cl_kappa_limber_nz", "smail_nz",
           "cl_galaxy_limber_nz",
           "cl_flat_sky_masked",
           "flat_sky_coupling_matrix", "cl_flat_sky_master",
           "flat_sky_spin2_coupling_matrices", "cl_flat_sky_shear_master"]


def _flat_sky_binning(n: int, opening_angle_deg, nbins: int,
                     ell_min, ell_max):
    """THE flat-sky ell binning (single home — a duplicated binning path
    flips edge modes between lowerings, see CLAUDE.md's shell-edge
    gotcha). Returns (binidx, inside, nm, lsum).

    Mode-to-bin assignment compares EXACT integers: the squared mode
    number m2 = fi^2 + fj^2 (exact in float32 up to n=2048) against
    host-precomputed squared edges in units of the fundamental. No sqrt
    or device linspace participates in the selection, so the assignment
    is identical across eager/jit lowerings AND host/device — the 1%
    jitted/unjitted edge-mode flip this binning home was created to
    prevent cannot reappear (sqrt is only used for the reported lsum
    VALUES, never for selection).
    """
    import numpy as np

    f = jnp.fft.fftfreq(n) * n
    m2 = (f[:, None] ** 2 + f[None, :] ** 2).reshape(-1)  # exact ints
    # host float64 edges in fundamental units, squared, cast f32. The
    # geometry MUST be concrete here (every jitted caller marks
    # opening_angle_deg/ell_min/ell_max static): an earlier traced-
    # geometry device fallback meant jitted estimators binned with
    # jnp.linspace f32 edges while the eagerly-built MASTER coupling
    # matrix used these host edges — a 1-ulp edge difference that can
    # assign an exact-integer edge mode to different bands in the
    # pseudo-Cl vector and the matrix that decouples it.
    try:
        lf_host = 2.0 * np.pi / (float(opening_angle_deg) * float(DEG2RAD))
        lo = 1.0 if ell_min is None else float(ell_min) / lf_host
        hi = n / 2.0 if ell_max is None else float(ell_max) / lf_host
    except TypeError as e:
        raise TypeError(
            "_flat_sky_binning needs concrete geometry (opening angle / "
            "ell bounds); jitted callers must mark them static so the "
            "edge construction stays host-side and bit-identical with "
            "the MASTER coupling build") from e
    edges_sq = jnp.asarray(
        (np.linspace(lo, hi, nbins + 1) ** 2).astype(np.float32))
    lo2 = jnp.float32(lo * lo)
    hi2 = jnp.float32(hi * hi)
    theta = opening_angle_deg * DEG2RAD
    lf = 2.0 * jnp.pi / theta  # fundamental multipole (for lsum values)
    binidx = jnp.clip(jnp.searchsorted(edges_sq, m2, side="right") - 1,
                      0, nbins - 1)
    inside = ((m2 >= lo2) & (m2 <= hi2)).astype(jnp.float32)
    lm = lf * jnp.sqrt(m2)
    nm = jax.ops.segment_sum(inside, binidx, num_segments=nbins)
    lsum = jax.ops.segment_sum(inside * lm, binidx, num_segments=nbins)
    return binidx, inside, nm, lsum


@partial(jax.jit, static_argnames=("nbins", "opening_angle_deg",
                                   "ell_min", "ell_max"))
def cl_flat_sky(img, opening_angle_deg, nbins: int = 50,
                ell_min=None, ell_max=None):
    """Cl of a flat-sky map by azimuthal averaging of |FFT|^2.

    Equivalent of lenstools ConvergenceMap.powerSpectrum
    (reference angular_power_spectrum.py:38-53).

    Returns (ell_centers, cl).
    """
    n = img.shape[-1]
    theta = opening_angle_deg * DEG2RAD
    # Cl = theta^2 / npix^4 * |FFT|^2
    p2d = (jnp.abs(jnp.fft.fft2(img)) ** 2) * theta ** 2 / float(n) ** 4
    binidx, inside, nm, lsum = _flat_sky_binning(n, opening_angle_deg,
                                                 nbins, ell_min, ell_max)
    psum = jax.ops.segment_sum(inside * p2d.reshape(-1), binidx,
                               num_segments=nbins)
    denom = jnp.maximum(nm, 1.0)
    return lsum / denom, psum / denom


@partial(jax.jit, static_argnames=("npix",))
def cl_to_flat_map(key, cl_tab_ell, cl_tab_val, npix: int,
                   opening_angle_deg):
    """Gaussian random flat-sky map realization from a Cl table.

    Flat-sky analogue of healpy synfast as used by SkyHealpix.from_Cl
    (reference sky_healpix.py:218-238) and SkyArray.create_cmb
    (sky_array.py:709-760).
    """
    theta = opening_angle_deg * DEG2RAD
    lf = 2.0 * jnp.pi / theta
    f = jnp.fft.fftfreq(npix) * npix
    lmag = lf * jnp.sqrt(f[:, None] ** 2 + f[None, :] ** 2)
    cl = jnp.interp(lmag, cl_tab_ell, cl_tab_val)
    cl = jnp.where(lmag == 0.0, 0.0, cl)
    # |m_hat|^2 expectation = Cl * npix^4 / theta^2 (inverse of cl_flat_sky)
    amp = jnp.sqrt(jnp.clip(cl, 0.0, None)) * float(npix) ** 2 / theta
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, (npix, npix))
    im = jax.random.normal(k2, (npix, npix))
    modes = amp * (re + 1j * im) / jnp.sqrt(2.0)
    # hermitianize by symmetrizing: m = (F + conj(flip(F)))/2 -> real ifft
    sym = 0.5 * (modes + jnp.conj(jnp.roll(jnp.flip(modes, (0, 1)), (1, 1),
                                           (0, 1))))
    # restore unit variance per independent mode after averaging
    return jnp.real(jnp.fft.ifft2(sym * jnp.sqrt(2.0)))


@partial(jax.jit, static_argnames=("npix", "nbins", "opening_angle_deg",
                                   "ell_min", "ell_max"))
def flat_sky_mode_counts(npix: int, opening_angle_deg, nbins: int = 50,
                         ell_min=None, ell_max=None):
    """(ell, nmodes) for cl_flat_sky's binning: the DISCRETE
    hermitian-weighted mode count per ell bin, for Gaussian error bars
    Var[C_b] = 2 (C_b + N_b)^2 / nmodes_b (ops/covariance.
    gaussian_pk_covariance applies unchanged: a real map's nm grid
    points are nm/2 independent complex modes = nm real dof, so
    Var = 2 C^2 / nm with the FULL grid-point count). Shares
    _flat_sky_binning with cl_flat_sky so mode->bin assignment is
    identical.
    """
    _, _, nm, lsum = _flat_sky_binning(npix, opening_angle_deg, nbins,
                                       ell_min, ell_max)
    return lsum / jnp.maximum(nm, 1.0), nm


def cl_flat_sky_cross(img1, img2, opening_angle_deg, nbins: int = 50,
                      ell_min=None, ell_max=None):
    """Cross-Cl of two flat-sky maps (tomographic kappa_i x kappa_j,
    map x tracer, ...).

    Computed by the polarization identity Re[F1 conj(F2)] =
    (|F1+F2|^2 - |F1-F2|^2)/4 THROUGH cl_flat_sky, so the mode->bin
    assignment is bit-identical with the auto estimator (a duplicated
    binning path measurably flips edge modes between jitted and unjitted
    lowering — the shell-edge gotcha of CLAUDE.md) and
    cl_flat_sky_cross(x, x) == cl_flat_sky(x) exactly.
    """
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2)
    ell, cp = cl_flat_sky(img1 + img2, opening_angle_deg, nbins=nbins,
                          ell_min=ell_min, ell_max=ell_max)
    _, cm = cl_flat_sky(img1 - img2, opening_angle_deg, nbins=nbins,
                        ell_min=ell_min, ell_max=ell_max)
    return ell, 0.25 * (cp - cm)


@jax.jit
def shear_eb_maps(gamma1, gamma2, opening_angle_deg=None):
    """E/B decomposition of flat-sky shear maps.

    kappa_E(l) =  cos(2 phi_l) g1(l) + sin(2 phi_l) g2(l)
    kappa_B(l) = -sin(2 phi_l) g1(l) + cos(2 phi_l) g2(l)

    (Kaiser-Squires rotation; phi_l the angle of the Fourier mode.) Born
    shear from a scalar potential is PURE E — kappa_E reproduces the
    convergence and kappa_B vanishes — while lens-lens coupling in
    multi-plane ray tracing generates a small B-mode, so B is the
    standard systematics/post-Born null channel. The reference's lenstools
    stack never exposed it.

    opening_angle_deg is accepted for API symmetry; the rotation is
    scale-free. Returns (kappa_E, kappa_B) real maps.
    """
    n = gamma1.shape[-1]
    f = jnp.fft.fftfreq(n) * n
    l1 = f[:, None]
    l2 = f[None, :]
    l2mag = l1 ** 2 + l2 ** 2
    safe = jnp.where(l2mag == 0.0, 1.0, l2mag)
    cos2 = jnp.where(l2mag == 0.0, 1.0, (l1 ** 2 - l2 ** 2) / safe)
    sin2 = jnp.where(l2mag == 0.0, 0.0, 2.0 * l1 * l2 / safe)
    g1 = jnp.fft.fft2(gamma1)
    g2 = jnp.fft.fft2(gamma2)
    ke = jnp.real(jnp.fft.ifft2(cos2 * g1 + sin2 * g2))
    kb = jnp.real(jnp.fft.ifft2(-sin2 * g1 + cos2 * g2))
    return ke, kb


@jax.jit
def kappa_to_shear_maps(kappa):
    """Periodic (flat-sky, spin-2) shear from convergence:
    gamma_hat(l) = e^{2 i phi_l} kappa_hat(l) — the exact inverse of
    shear_eb_maps for a pure-E field.

    This is the right way to build mock shear from PERIODIC kappa maps
    (ray-traced boxes): the kappa_to_alpha -> alpha_to_gamma chain is
    zero-padded (non-periodic), which attenuates shear near the map
    edges and measurably suppresses periodic xi_pm estimators at large
    theta. Returns (gamma1, gamma2).

    For even n the unpaired Nyquist row/column is zeroed: those modes
    are their own l -> -l partner, where the spin-2 phase cannot be
    applied consistently (sin 2phi_l flips sign across the row) — kept,
    they would contaminate the roundtrip with spurious B-modes. Band-
    limited kappa (any physical map) has no power there anyway."""
    n = kappa.shape[-1]
    f = jnp.fft.fftfreq(n) * n
    l1 = f[:, None]
    l2 = f[None, :]
    l2mag = l1 ** 2 + l2 ** 2
    safe = jnp.where(l2mag == 0.0, 1.0, l2mag)
    cos2 = jnp.where(l2mag == 0.0, 1.0, (l1 ** 2 - l2 ** 2) / safe)
    sin2 = jnp.where(l2mag == 0.0, 0.0, 2.0 * l1 * l2 / safe)
    kh = jnp.fft.fft2(kappa)
    if n % 2 == 0:
        nyq = -(n // 2)
        keep = (l1 != nyq) & (l2 != nyq)
        kh = jnp.where(keep, kh, 0.0)
    # gamma_hat = (cos2 + i sin2) kappa_hat; cos2/sin2 are even under
    # l -> -l, so each product inverts to a REAL map and gamma1/gamma2
    # separate without a complex intermediate
    g1 = jnp.real(jnp.fft.ifft2(cos2 * kh))
    g2 = jnp.real(jnp.fft.ifft2(sin2 * kh))
    return g1, g2


def cl_shear_eb(gamma1, gamma2, opening_angle_deg, nbins: int = 50,
                ell_min=None, ell_max=None):
    """(ell, Cl_EE, Cl_BB) of a flat-sky shear field via E/B rotation +
    azimuthal averaging (cl_flat_sky on each decomposed map)."""
    ke, kb = shear_eb_maps(gamma1, gamma2)
    ell, cl_ee = cl_flat_sky(ke, opening_angle_deg, nbins=nbins,
                             ell_min=ell_min, ell_max=ell_max)
    _, cl_bb = cl_flat_sky(kb, opening_angle_deg, nbins=nbins,
                           ell_min=ell_min, ell_max=ell_max)
    return ell, cl_ee, cl_bb


@partial(jax.jit, static_argnames=("nbins", "apodize_arcmin",
                                   "opening_angle_deg"))
def cl_flat_sky_masked(img, mask, opening_angle_deg, nbins: int = 50,
                       apodize_arcmin: float = 0.0):
    """Pseudo-Cl of a masked flat-sky map with mean-w^2 deconvolution.

    The role of the reference's SkyNamaster wrapper
    (/root/reference/src/astrild/rays/skys/sky_namaster.py — its pymaster
    calls were commented out, i.e. never functional): the mask is
    optionally apodized with a Gaussian taper and the measured Cl is
    divided by <w^2> (the diagonal of the mode-coupling matrix; exact for
    masks smooth on the scales of interest).
    """
    from .filters import gaussian as gaussian_filter

    w = jnp.asarray(mask, jnp.float32)
    if apodize_arcmin > 0:
        w = gaussian_filter(w, opening_angle_deg,
                            sigma_arcmin=apodize_arcmin)
    ell, cl = cl_flat_sky(img * w, opening_angle_deg, nbins=nbins)
    w2 = jnp.mean(w ** 2)
    return ell, cl / jnp.maximum(w2, 1e-12)


def flat_sky_coupling_matrix(mask, opening_angle_deg, nbins: int,
                             ell_min=None, ell_max=None) -> "np.ndarray":
    """EXACT discrete mode-coupling matrix M_bb' of the flat-sky pseudo-Cl.

    The binned pseudo spectrum of a w-masked periodic map obeys
    <C~_b> = sum_b' M_bb' C_b' exactly for Gaussian fields on the DFT
    grid (no continuum/NaMaster approximation):

        M_bb' = (1/(N_b N^2)) sum_{k in b} sum_{k' in b'} |w~(k - k')|^2

    evaluated with FFTs: the inner sum is a circular convolution of the
    mask power |w~|^2/N^2 with the bin-b' indicator on the mode grid (one
    fft per bin), the outer sum one (nbins, N) @ (N, nbins) product.

    The inverse of M is the mask deconvolution the reference intended
    with NaMaster (sky_namaster.py:75-95, never functional): MASTER
    (Hivon et al. 2002) restricted to the binned band powers.

    Computed HOST-SIDE in float64 and returned as a numpy array: steep
    spectra span many decades, and float32 FFT noise in M couples the
    large low-ell power into high bins at catastrophic relative levels
    (measured: factor-1e4 errors). M is a per-mask precompute — pay the
    host FFTs once, keep the per-map pseudo-Cl on device. The mode->bin
    assignment still comes from the jitted _flat_sky_binning, so it is
    bit-identical with cl_flat_sky.
    """
    import numpy as np

    n, ind, nm, conv = _flat_coupling_pieces(mask, opening_angle_deg,
                                             nbins, ell_min, ell_max)
    M = ind @ conv(None).T
    return M / np.maximum(nm, 1.0)[:, None]


def _flat_coupling_pieces(mask, opening_angle_deg, nbins: int,
                          ell_min, ell_max):
    """ONE home of the flat-sky coupling core shared by the scalar and
    spin-2 matrices: the mode-grid binning indicator, the in-band
    l(l+1) shape weights q (single home: sht.shape_binned_interp — it
    raises a clear error when a band holds no grid modes, where the
    downstream solve would otherwise die in LinAlgError), the mask
    mode power, and a `conv(trig)` closure returning the circular
    convolutions Wn (*) (q * trig) as (nbins, N) rows.
    """
    import numpy as np

    w = np.asarray(mask, np.float64)
    n = w.shape[-1]
    npts = float(n * n)
    binidx, inside, nm, _ = _flat_sky_binning(n, opening_angle_deg, nbins,
                                              ell_min, ell_max)
    binidx = np.asarray(binidx)
    inside = np.asarray(inside)
    nm = np.asarray(nm, np.float64)
    ind = ((binidx[None, :] == np.arange(nbins)[:, None])
           & (inside[None, :] > 0)).astype(np.float64)     # (nbins, N)
    from .sht import shape_binned_interp

    lf = 2.0 * np.pi / (opening_angle_deg * DEG2RAD)
    f = np.fft.fftfreq(n) * n
    lmag = lf * np.sqrt(f[:, None] ** 2 + f[None, :] ** 2).reshape(-1)
    q = shape_binned_interp(lmag, ind, nm, what="flat-sky grid modes")
    Wn = (np.abs(np.fft.fft2(w)) ** 2) / npts ** 2   # mode-grid mask power
    WnF = np.fft.fft2(Wn)

    def conv(trig):
        rows = q if trig is None else q * trig[None, :]
        maps = rows.reshape(nbins, n, n)
        out = np.real(np.fft.ifft2(WnF[None] * np.fft.fft2(maps)))
        return out.reshape(nbins, -1)

    return n, ind, nm, conv


def cl_flat_sky_master(img, mask, opening_angle_deg, nbins: int = 16,
                       apodize_arcmin: float = 0.0,
                       ell_min=None, ell_max=None, coupling=None):
    """Mask-decoupled flat-sky spectrum: the MASTER estimator.

    Unlike cl_flat_sky_masked's <w^2> normalization (exact only for
    spectra flat on the mask coupling scale), this inverts the full
    binned mode-coupling matrix, so steep spectra under aggressive masks
    come back unbiased (tests/test_master.py pins the case where <w^2>
    shows >8% bias and MASTER recovers <2%). Returns (ell_centers,
    cl_hat).

    The pseudo-Cl runs jitted on device; the coupling build + solve run
    host-side in float64 (see flat_sky_coupling_matrix). For many maps
    under one mask, precompute `coupling = flat_sky_coupling_matrix(...)`
    once and pass it in.
    """
    import numpy as np

    from .filters import gaussian as gaussian_filter

    if apodize_arcmin > 0 and coupling is not None:
        # the pseudo-Cl is measured under the APODIZED mask while the
        # caller's matrix was (almost certainly) built from the raw one
        # — a silently biased decoupling. Precompute the coupling from
        # the already-apodized mask and pass apodize_arcmin=0.
        raise ValueError(
            "cl_flat_sky_master: apodize_arcmin > 0 with a precomputed "
            "coupling would decouple apodized pseudo-spectra with the "
            "raw mask's matrix; apodize the mask yourself, build the "
            "coupling from it, and pass apodize_arcmin=0")
    w = jnp.asarray(mask, jnp.float32)
    if apodize_arcmin > 0:
        w = gaussian_filter(w, opening_angle_deg,
                            sigma_arcmin=apodize_arcmin)
    ell, pcl = cl_flat_sky(jnp.asarray(img) * w, opening_angle_deg,
                           nbins=nbins, ell_min=ell_min, ell_max=ell_max)
    if coupling is None:
        coupling = flat_sky_coupling_matrix(w, opening_angle_deg, nbins,
                                            ell_min=ell_min,
                                            ell_max=ell_max)
    cl_hat = np.linalg.solve(np.asarray(coupling, np.float64),
                             np.asarray(pcl, np.float64))
    return ell, jnp.asarray(cl_hat, jnp.float32)


def flat_sky_spin2_coupling_matrices(mask, opening_angle_deg, nbins: int,
                                     ell_min=None, ell_max=None):
    """(M_pp, M_pm): binned mode-coupling matrices of masked shear E/B.

    A mask convolves the spin-2 Fourier modes and ROTATES them: the
    pseudo mode at ell mixes E(ell') and B(ell') through the relative
    mode angle, so (NaMaster's spin-2 pseudo-Cl, here on the exact
    discrete DFT grid like flat_sky_coupling_matrix):

        <pEE_b> = sum_b' [M_pp C_EE + M_pm C_BB]_b'
        <pBB_b> = sum_b' [M_pm C_EE + M_pp C_BB]_b'
        M_pp/pm[b,b'] = (1/(N_b N^2)) sum_{l in b, l' in b'}
                        |w~(l-l')|^2 {cos^2, sin^2}(2(phi_l' - phi_l))

    cos^2 = (1 + cos 4phi' cos 4phi + sin 4phi' sin 4phi)/2 turns the
    double sum into THREE circular convolutions per bin (the scalar
    machinery's one): Wn (*) q, Wn (*) (q cos 4phi), Wn (*) (q sin 4phi).
    Host float64 like the scalar coupling (f32 FFT noise in M couples
    low-ell power into high bins at catastrophic relative levels).

    Validated by Monte Carlo in tests/test_master.py: an E-only field
    under an aggressive mask leaks E->B at the tens-of-percent level in
    the raw pseudo spectra; the 2x2-block solve returns the EE input
    unbiased and BB consistent with zero.
    """
    import numpy as np

    n, ind, nm, conv = _flat_coupling_pieces(mask, opening_angle_deg,
                                             nbins, ell_min, ell_max)
    # 4phi trig from the mode components (phi = atan2(l2, l1); the zero
    # mode gets phi = 0 — its weight is immaterial, |l|=0 is outside
    # every band)
    f = np.fft.fftfreq(n) * n
    l1 = f[:, None] * np.ones((1, n))
    l2 = np.ones((n, 1)) * f[None, :]
    phi = np.arctan2(l2, l1)
    c4 = np.cos(4.0 * phi).reshape(-1)
    s4 = np.sin(4.0 * phi).reshape(-1)

    # rows: ind_b(l) . [ (conv0 +- (c4 conv_c + s4 conv_s))/2 ]
    half0 = conv(None)
    cross = c4[None, :] * conv(c4) + s4[None, :] * conv(s4)
    M_pp = ind @ (0.5 * (half0 + cross)).T
    M_pm = ind @ (0.5 * (half0 - cross)).T
    norm = np.maximum(nm, 1.0)[:, None]
    return M_pp / norm, M_pm / norm


def cl_flat_sky_shear_master(gamma1, gamma2, mask, opening_angle_deg,
                             nbins: int = 16, apodize_arcmin: float = 0.0,
                             ell_min=None, ell_max=None, coupling=None):
    """Mask-decoupled shear spectra: (ell, Cl_EE, Cl_BB).

    The spin-2 MASTER estimator: pseudo E/B of the masked shear maps
    (cl_shear_eb), then the 2x2-block mode-coupling solve of
    flat_sky_spin2_coupling_matrices — undoing BOTH the power lost to
    the mask and the E->B leakage it induces (the <w^2> normalization
    can do neither; cosmic-shear B-mode nulls are meaningless without
    this decoupling). For many maps under one mask precompute
    `coupling = flat_sky_spin2_coupling_matrices(...)` and pass it in.
    """
    import numpy as np

    from .filters import gaussian as gaussian_filter

    if apodize_arcmin > 0 and coupling is not None:
        raise ValueError(
            "cl_flat_sky_shear_master: apodize_arcmin > 0 with a "
            "precomputed coupling would decouple apodized pseudo-"
            "spectra with the raw mask's matrices; apodize the mask "
            "yourself, build the couplings from it, and pass "
            "apodize_arcmin=0")
    w = jnp.asarray(mask, jnp.float32)
    if apodize_arcmin > 0:
        w = gaussian_filter(w, opening_angle_deg,
                            sigma_arcmin=apodize_arcmin)
    ell, p_ee, p_bb = cl_shear_eb(jnp.asarray(gamma1) * w,
                                  jnp.asarray(gamma2) * w,
                                  opening_angle_deg, nbins=nbins,
                                  ell_min=ell_min, ell_max=ell_max)
    if coupling is None:
        coupling = flat_sky_spin2_coupling_matrices(
            w, opening_angle_deg, nbins, ell_min=ell_min, ell_max=ell_max)
    M_pp, M_pm = (np.asarray(c, np.float64) for c in coupling)
    big = np.block([[M_pp, M_pm], [M_pm, M_pp]])
    rhs = np.concatenate([np.asarray(p_ee, np.float64),
                          np.asarray(p_bb, np.float64)])
    sol = np.linalg.solve(big, rhs)
    return (ell, jnp.asarray(sol[:nbins], jnp.float32),
            jnp.asarray(sol[nbins:], jnp.float32))


def cl_isw_limber(ells, cosmo: Cosmology, z_min=0.08, z_max=0.9,
                  nz: int = 256, amplitude=None):
    """Linear ISW C_ell^TT via the Limber approximation.

    Mirrors LinearAngularPowerSpectrum.compute_C_tt + p_dpdp_integrant
    (reference linear_angular_power_spectrum.py:173-225):
      C_ell = (4/c^5) int dz  (1+z)^-2 chi^-2 P_dpdp(k = ell/chi, z)
    vmapped over ells with trapezoid z-integration (replacing quad+joblib).
    """
    if amplitude is None:
        amplitude = normalization(cosmo)
    z = jnp.linspace(z_min, z_max, nz)
    chi = cosmo.comoving_distance(z)

    def one(ell):
        k = ell / chi
        integ = p_dpdp(k, z, cosmo, amplitude=amplitude) / ((1.0 + z) ** 2
                                                            * chi ** 2)
        return jnp.trapezoid(integ, z)

    cl = jax.vmap(one)(jnp.asarray(ells, jnp.float32))
    return cl * 4.0 / C_LIGHT_KMS ** 5


def cl_kappa_limber(ells, cosmo: Cosmology, z_source: float = 1.0,
                    nchi: int = 256, amplitude=None,
                    nonlinear: bool = False):
    """Linear convergence power C_ell^kappakappa via Limber.

    C_ell = int dchi W(chi)^2 / chi^2 P(k = (ell + 1/2)/chi, z(chi)),
    W(chi) = 1.5 Om0 (H0/c)^2 (1+z) chi (chi_s - chi)/chi_s.

    The theory anchor for the Born-integrated kappa maps
    (ops/lensing.born_convergence) — the reference measured kappa Cl
    from Ray-Ramses maps (angular_power_spectrum.py) but had no linear
    prediction to validate against. Linear P(k) (EH98), no nonlinear
    boost by default, so expect agreement with Born maps of GAUSSIAN
    density shells and underprediction vs N-body maps at ell >~ 1000;
    nonlinear=True switches to the halofit (Takahashi+12) P(k, z).

    The auto spectrum is the equal-bin case of the tomographic
    cl_kappa_cross_limber — single home for the integrand.
    """
    return cl_kappa_cross_limber(ells, cosmo, z_source, z_source,
                                 nchi=nchi, amplitude=amplitude,
                                 nonlinear=nonlinear)


def smail_nz(z, z0: float = 0.9, alpha: float = 2.0, beta: float = 1.5):
    """Smail et al. source redshift distribution n(z) ~ z^alpha
    exp(-(z/z0)^beta) (unnormalized — the Limber kernels normalize)."""
    z = jnp.asarray(z)
    return z ** alpha * jnp.exp(-((z / jnp.asarray(z0)) ** beta))


C1_RHO_CR = 0.0134  # NLA normalization C1 rho_cr (Bridle & King 2007)

def _nz_quad(cosmo, z_tab, nz_tab, nz_quad: int):
    """Normalized n(z) on a uniform quadrature grid + chi(z): the shared
    first step of every n(z)-weighted Limber kernel."""
    zt = jnp.asarray(z_tab, jnp.float32)
    nt = jnp.asarray(nz_tab, jnp.float32)
    zq = jnp.linspace(zt[0], zt[-1], nz_quad)
    nq = jnp.interp(zq, zt, nt)
    nq = nq / jnp.trapezoid(nq, zq)
    return zq, nq, cosmo.comoving_distance(zq)


def _lensing_efficiency(chi, zq, nq, chis):
    """g(chi) = Int dz n(z) (chi_s - chi)_+/chi_s. chi_s(z=0) = 0 would
    give 0/0 = NaN even though n(0) = 0 multiplies it away — a table
    starting at z = 0 (the natural Smail grid) must not NaN the
    integral, hence the clamp."""
    safe = jnp.maximum(chis, 1e-6)
    frac = jnp.clip(chis[None, :] - chi[:, None], 0.0, None) / safe
    return jnp.trapezoid(nq[None, :] * frac, zq, axis=1)


def _limber_sum(ells, cosmo, chi, z, WW, nonlinear: bool, amplitude):
    """C_ell = Int dchi WW / chi^2 P((ell+1/2)/chi, z): the shared
    Limber integrator of the kappa/galaxy nz kernels."""
    from .linear_power import linear_power, nonlinear_power

    if nonlinear:
        def pk_of(kv, zv):
            return nonlinear_power(kv[None], cosmo, z=zv,
                                   amplitude=amplitude)[0]
    else:
        def pk_of(kv, zv):
            return linear_power(kv, cosmo, z=zv, amplitude=amplitude)

    def one(ell):
        k = (ell + 0.5) / chi
        pk = jax.vmap(pk_of)(k, z)
        return jnp.trapezoid(WW / chi ** 2 * pk, chi)

    return jax.vmap(one)(jnp.asarray(ells, jnp.float32))



def cl_kappa_limber_nz(ells, cosmo: Cosmology, z_tab, nz_tab,
                       z_tab2=None, nz_tab2=None, nchi: int = 256,
                       nz_quad: int = 256, amplitude=None,
                       nonlinear: bool = False, a_ia=0.0,
                       eta_ia=0.0, z0_ia: float = 0.62):
    """Convergence (cross-)power for EXTENDED source distributions:

        W_i(chi) = 1.5 Om0 (H0/c)^2 (1+z) chi g_i(chi),
        g_i(chi) = Int dz n_i(z) (chi_s(z) - chi)_+ / chi_s(z),

    the production-survey generalization of cl_kappa_limber's single
    source plane (delta n(z) recovers it exactly; tested). n(z) tables
    are normalized internally, so only the shape matters. Pass a second
    (z_tab2, nz_tab2) for a tomographic cross bin. Fully differentiable
    for Fisher/inference use.

    a_ia != 0 adds nonlinear-alignment intrinsic alignments (NLA,
    Bridle & King 2007): the total kernel becomes W_i + W_IA,i with

        W_IA,i = -a_ia C1 rho_cr Om0 / D(z)
                 ((1+z)/(1+z0_ia))^eta_ia n_i(z) dz/dchi,

    so the returned spectrum is GG + GI + II in one integral — exactly
    quadratic in a_ia (tested). a_ia/eta_ia may be traced (IA nuisance
    parameters in Fisher/inference).
    """
    if amplitude is None:
        amplitude = normalization(cosmo)
    zq1, nq1, chis1 = _nz_quad(cosmo, z_tab, nz_tab, nz_quad)
    if z_tab2 is None:
        zq2, nq2, chis2 = zq1, nq1, chis1
    else:
        zq2, nq2, chis2 = _nz_quad(cosmo, z_tab2, nz_tab2, nz_quad)
    chi_max = jnp.maximum(chis1[-1], chis2[-1])
    chi = jnp.linspace(1e-3 * chi_max, chi_max, nchi)
    z = cosmo.redshift_at_comoving_distance(chi)
    pref = 1.5 * cosmo.Om0 * H0_OVER_C_HMPC ** 2 * (1.0 + z) * chi
    w1 = pref * _lensing_efficiency(chi, zq1, nq1, chis1)
    w2 = pref * _lensing_efficiency(chi, zq2, nq2, chis2)
    # NLA kernel (zero when a_ia == 0; kept unconditional so a_ia can be
    # a traced nuisance parameter)
    a_ia = jnp.asarray(a_ia, jnp.float32)
    dz_dchi = H0_OVER_C_HMPC * cosmo.efunc(z)
    fz = ((1.0 + z) / (1.0 + z0_ia)) ** jnp.asarray(eta_ia, jnp.float32)
    amp_ia = (-a_ia * C1_RHO_CR * cosmo.Om0
              / cosmo.growth_factor(z) * fz * dz_dchi)
    w1 = w1 + amp_ia * jnp.interp(z, zq1, nq1, left=0.0, right=0.0)
    w2 = w2 + amp_ia * jnp.interp(z, zq2, nq2, left=0.0, right=0.0)
    return _limber_sum(ells, cosmo, chi, z, w1 * w2, nonlinear,
                       amplitude)


def cl_galaxy_limber_nz(ells, cosmo: Cosmology, z_tab, nz_tab,
                        bias: float = 1.0, kappa_nz=None,
                        z_source=None, nchi: int = 256,
                        nz_quad: int = 256, amplitude=None,
                        nonlinear: bool = False):
    """Angular galaxy-count spectra via Limber: C_gg, or C_g-kappa when
    a source population is given — the producer for
    shear_2pt.gamma_t_from_cl(_curved)'s cross input.

        W_g(chi)  = b n(z(chi)) dz/dchi
        C_gg      = Int dchi W_g^2 / chi^2 P(k, z)
        C_gkappa  = Int dchi W_g W_kappa / chi^2 P(k, z)

    with W_kappa the n(z)-weighted lensing kernel of cl_kappa_limber_nz
    (kappa_nz=(z_tab, nz_tab)) or a delta source plane (z_source=zs).
    `bias` may be traced (a nuisance parameter). Fully differentiable.
    Shares _nz_quad/_lensing_efficiency/_limber_sum with the kappa
    kernels (single home).

    Returns C_ell at `ells`.
    """
    if amplitude is None:
        amplitude = normalization(cosmo)
    zq, nq, chi_l = _nz_quad(cosmo, z_tab, nz_tab, nz_quad)
    chi_max = chi_l[-1]
    if kappa_nz is not None:
        zsq, nsq, chis_s = _nz_quad(cosmo, kappa_nz[0], kappa_nz[1],
                                    nz_quad)
        chi_max = jnp.maximum(chi_max, chis_s[-1])
    elif z_source is not None:
        chi_s1 = cosmo.comoving_distance(z_source)
        chi_max = jnp.maximum(chi_max, chi_s1)
    chi = jnp.linspace(1e-3 * chi_max, chi_max, nchi)
    z = cosmo.redshift_at_comoving_distance(chi)
    dz_dchi = H0_OVER_C_HMPC * cosmo.efunc(z)
    w_g = bias * jnp.interp(z, zq, nq, left=0.0, right=0.0) * dz_dchi
    if kappa_nz is not None:
        g = _lensing_efficiency(chi, zsq, nsq, chis_s)
        w_2 = 1.5 * cosmo.Om0 * H0_OVER_C_HMPC ** 2 * (1.0 + z) * chi * g
    elif z_source is not None:
        w_2 = (1.5 * cosmo.Om0 * H0_OVER_C_HMPC ** 2 * (1.0 + z) * chi
               * jnp.clip(chi_s1 - chi, 0.0, None) / chi_s1)
    else:
        w_2 = w_g
    return _limber_sum(ells, cosmo, chi, z, w_g * w_2, nonlinear,
                       amplitude)


@partial(jax.jit, static_argnames=("nchi", "nonlinear"))
def cl_kappa_cross_limber(ells, cosmo: Cosmology, z_source_i: float,
                          z_source_j: float, nchi: int = 256,
                          amplitude=None, nonlinear: bool = False):
    """Tomographic convergence cross-power C_ell^{kappa_i kappa_j}.

    Same Limber integral as cl_kappa_limber with the kernel product
    W_i(chi) W_j(chi), integrated to min(chi_i, chi_j). Theory anchor for
    cross-correlating Born/raytraced maps of different source planes —
    tomography the reference had no prediction for.
    """
    from .linear_power import linear_power, nonlinear_power

    if amplitude is None:
        amplitude = normalization(cosmo)
    chi_i = cosmo.comoving_distance(z_source_i)
    chi_j = cosmo.comoving_distance(z_source_j)
    chi_lo = jnp.minimum(chi_i, chi_j)
    chi = jnp.linspace(1e-3 * chi_lo, chi_lo, nchi)
    z = cosmo.redshift_at_comoving_distance(chi)

    def kern(chi_s):
        return (1.5 * cosmo.Om0 * H0_OVER_C_HMPC ** 2 * (1.0 + z) * chi
                * jnp.clip(chi_s - chi, 0.0, None) / chi_s)

    WW = kern(chi_i) * kern(chi_j)
    if nonlinear:
        def pk_of(kv, zv):
            return nonlinear_power(kv[None], cosmo, z=zv,
                                   amplitude=amplitude)[0]
    else:
        def pk_of(kv, zv):
            return linear_power(kv, cosmo, z=zv, amplitude=amplitude)

    def one(ell):
        k = (ell + 0.5) / chi
        pk = jax.vmap(pk_of)(k, z)
        return jnp.trapezoid(WW / chi ** 2 * pk, chi)

    return jax.vmap(one)(jnp.asarray(ells, jnp.float32))
