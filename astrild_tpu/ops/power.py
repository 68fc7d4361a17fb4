"""3D power-spectrum estimation on device: FFT + k-shell reduction.

TPU-native replacement for nbodykit's ArrayMesh/FFTPower pipeline used by
the reference (/root/reference/src/astrild/power_spectra/power_spectrum_3d.py:164-226)
and for the external POWMES tool (configs/powmes.config). Everything is a
pure jit-able function: paint (ops.paint) -> delta_k -> shell-binned P(k)
with window compensation, interlacing, and shot-noise subtraction.

For meshes sharded over the device mesh, see parallel/pfft.py — the same
binning runs on pencil-decomposed FFTs with a final psum.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .paint import compensation_kernel

# last auto-selected deposit path ('pallas' | 'scatter'); diagnostics only
last_auto_deposit: Optional[str] = None

__all__ = [
    "PowerResult", "MultipoleResult", "kmag_rfft", "hermitian_weights",
    "delta_k", "delta_k_parts", "shell_average", "auto_power",
    "auto_power_fast",
    "auto_power_multipoles", "cross_power",
    "position_dependent_power",
]


class PowerResult(NamedTuple):
    k: jnp.ndarray        # mean |k| per bin [h/Mpc]
    power: jnp.ndarray    # P(k) [(Mpc/h)^3]
    nmodes: jnp.ndarray   # hermitian-weighted mode count per bin


def mode_radius_rfft(ngrid: int, dtype=jnp.float32):
    """|k|/kf on the rfftn grid: sqrt of exact integer mode-number sums.

    Binning on this unit-free quantity (instead of physical |k|) makes the
    shell assignment bit-identical between the local and the distributed
    estimators — shells that land exactly on a bin edge can otherwise flip
    bins from float rounding-order differences.
    """
    ix = (jnp.fft.fftfreq(ngrid) * ngrid).astype(dtype)
    iz = (jnp.fft.rfftfreq(ngrid) * ngrid).astype(dtype)
    m2 = (ix[:, None, None] ** 2 + ix[None, :, None] ** 2
          + iz[None, None, :] ** 2)
    return jnp.sqrt(m2)


def kmag_rfft(ngrid: int, boxsize: float, dtype=jnp.float32):
    """|k| on the rfftn grid, shape (n, n, n//2+1), units h/Mpc."""
    kf = 2.0 * jnp.pi / boxsize
    return mode_radius_rfft(ngrid, dtype) * kf


def hermitian_weights(ngrid: int, dtype=jnp.float32):
    """Mode multiplicity for rfftn storage: 2 except kz=0 and kz=nyquist planes."""
    nz = ngrid // 2 + 1
    w = jnp.full((nz,), 2.0, dtype)
    w = w.at[0].set(1.0)
    if ngrid % 2 == 0:
        w = w.at[nz - 1].set(1.0)
    return w[None, None, :]


@partial(jax.jit, static_argnames=("window", "interlaced"))
def delta_k(grid, grid_shifted=None, window: Optional[str] = None,
            interlaced: bool = False):
    """Density contrast in Fourier space, window-compensated.

    Args:
      grid: (n, n, n) painted density (counts or mass).
      grid_shifted: half-cell-shifted deposit for interlacing.
      window: 'ngp'|'cic'|'tsc' to deconvolve the assignment window.
      interlaced: combine grid and grid_shifted to cancel odd alias images
        (mirrors the reference's cross-spectrum path,
        power_spectrum_3d.py:197-222).
    Returns complex (n, n, n//2+1) array: FFT(delta)/N^3 (dimensionless).

    Backend note: on the axon TPU backend complex host<->device
    transfers are unimplemented, so np.asarray of this return raises a
    lazy UNIMPLEMENTED error far from the call site. To pull the modes
    to host there, use delta_k_parts (real/imag split on device).
    """
    n = grid.shape[-1]
    mean = jnp.mean(grid)
    d = grid / jnp.where(mean == 0, 1.0, mean) - 1.0
    dk = jnp.fft.rfftn(d) / float(n) ** 3
    if interlaced:
        mean2 = jnp.mean(grid_shifted)
        d2 = grid_shifted / jnp.where(mean2 == 0, 1.0, mean2) - 1.0
        dk2 = jnp.fft.rfftn(d2) / float(n) ** 3
        # shift by +H/2 per axis: multiply by exp(+i (kx+ky+kz) H/2)
        ix = jnp.fft.fftfreq(n) * n
        iz = jnp.fft.rfftfreq(n) * n
        ph = (jnp.pi / n) * (
            ix[:, None, None] + ix[None, :, None] + iz[None, None, :]
        )
        dk = 0.5 * (dk + dk2 * jnp.exp(1j * ph))
    if window is not None:
        dk = dk * compensation_kernel(n, window)
    return dk


def delta_k_parts(grid, grid_shifted=None, window: Optional[str] = None,
                  interlaced: bool = False):
    """delta_k as an on-device (re, im) float32 pair — the transfer-safe
    form for backends without complex host<->device transfers (axon).
    """
    dk = delta_k(grid, grid_shifted, window=window, interlaced=interlaced)
    return jnp.real(dk), jnp.imag(dk)


_SHELL_CACHE = {}


def _shell_binning_host_from_freqs(fx, fy, fz, nbins, mmin, mmax,
                                   ngrid_for_weights: int, cache_key):
    """Generic host binning-structure builder over given mode-number axes."""
    import numpy as np

    if cache_key in _SHELL_CACHE:
        return _SHELL_CACHE[cache_key]
    m = np.sqrt(fx[:, None, None] ** 2 + fy[None, :, None] ** 2
                + fz[None, None, :] ** 2)
    # hermitian weights along the rfft axis
    w = np.full(m.shape, 2.0, np.float32)
    w[..., fz == 0] = 1.0
    if ngrid_for_weights % 2 == 0:
        w[..., np.abs(fz) == ngrid_for_weights // 2] = 1.0
    w[(fx == 0)[:, None, None] * (fy == 0)[None, :, None]
      * (fz == 0)[None, None, :]] = 0.0
    mf = m.reshape(-1)
    wf = w.reshape(-1)
    out = _per_mode_binning(mf, wf, nbins, mmin, mmax)
    _SHELL_CACHE[cache_key] = out
    return out


def _per_mode_binning(mf, wf, nbins, mmin, mmax):
    """Per-mode (binidx, weight) arrays + per-bin totals.

    binidx is nbins (a discard slot) for out-of-range or zero-weight
    modes; wf is zeroed there too. The device reduction is then a fused
    one-hot masked sum — measured 26 ms vs 123 ms for the padded
    (nbins, Lmax) gather-matrix form at 8.4M modes on-chip (gathers
    serialize per element on TPU; fused compare+select+reduce streams).
    """
    import numpy as np

    edges = np.linspace(mmin, mmax, nbins + 1, dtype=np.float32)
    binidx = np.clip(np.searchsorted(edges, mf, side="right") - 1, 0,
                     nbins - 1)
    ok = (mf >= mmin) & (mf <= mmax) & (wf > 0)
    binidx = np.where(ok, binidx, nbins).astype(np.int32)
    wfull = np.where(ok, wf, 0.0).astype(np.float32)
    nm = np.bincount(binidx, weights=wfull,
                     minlength=nbins + 1)[:nbins].astype(np.float32)
    ksum = np.bincount(binidx, weights=wfull * mf,
                       minlength=nbins + 1)[:nbins]
    kmean = (ksum / np.maximum(nm, 1.0)).astype(np.float32)
    return binidx, wfull, nm, kmean


def _shell_binning_host(ngrid: int, nbins: int, mmin: float, mmax: float):
    """Host-precomputed shell-binning structures (cached per config).

    Bin membership depends only on (ngrid, nbins, mmin, mmax), so the
    per-mode bin index and hermitian weight are computed once in numpy.
    The device-side reduction is a fused one-hot masked sum — TPU
    scatter-adds serialize (segment_sum binning cost 27x the FFT itself
    at 256^3) and per-element gathers are nearly as bad (a padded gather
    matrix measured 123 ms where the fused reduce takes 26 ms at 8.4M
    modes).

    Returns (binidx (nmodes,) int32 with nbins = discard, wf (nmodes,)
    f32 hermitian weights, nm (nbins,) weighted mode counts, kmean_units
    (nbins,) mean |k|/kf per bin).
    """
    import numpy as np

    key = (ngrid, nbins, float(mmin), float(mmax))
    if key in _SHELL_CACHE:
        return _SHELL_CACHE[key]
    ix = (np.fft.fftfreq(ngrid) * ngrid).astype(np.float32)
    iz = (np.fft.rfftfreq(ngrid) * ngrid).astype(np.float32)
    m = np.sqrt(ix[:, None, None] ** 2 + ix[None, :, None] ** 2
                + iz[None, None, :] ** 2)
    nz = ngrid // 2 + 1
    w = np.full((1, 1, nz), 2.0, np.float32)
    w[..., 0] = 1.0
    if ngrid % 2 == 0:
        w[..., -1] = 1.0
    w = np.broadcast_to(w, m.shape).copy()
    w[0, 0, 0] = 0.0
    out = _per_mode_binning(m.reshape(-1), w.reshape(-1), nbins, mmin,
                            mmax)
    _SHELL_CACHE[key] = out
    return out


_DEVICE_BIN_CACHE = {}


def _device_binning(cache_key, builder):
    """Host binning structures as DEVICE arrays (cached).

    Passed to the jitted reductions as arguments rather than closure
    constants: baked-in gather matrices ballooned the serialized HLO to
    hundreds of MB (the remote compiler rejects the upload at 512^3).
    """
    if cache_key not in _DEVICE_BIN_CACHE:
        binidx, wf, nm, kmean = builder()
        _DEVICE_BIN_CACHE[cache_key] = (jnp.asarray(binidx),
                                        jnp.asarray(wf),
                                        jnp.asarray(nm), jnp.asarray(kmean))
    return _DEVICE_BIN_CACHE[cache_key]


def get_shell_binning(ngrid: int, nbins: int, kmin=None, kmax=None):
    """Device-array shell-binning structures for auto_power/shell_average.

    Fetch ONCE outside jit and pass via the `binning=` argument when the
    caller is itself jit-compiled for TPU: as closure constants these
    gather matrices serialize into the HLO upload (hundreds of MB at
    512^3) and the remote compiler rejects them.
    """
    mmin = 0.5 if kmin is None else kmin
    mmax = ngrid / 2.0 if kmax is None else kmax
    return _device_binning(
        ("shell", ngrid, nbins, float(mmin), float(mmax)),
        lambda: _shell_binning_host(ngrid, nbins, mmin, mmax))


def get_fast_binning(ngrid: int, nbins: int, fine_factor: int = 2,
                     kmin=None, kmax=None):
    """Binning structures for auto_power_fast (folded fine spectrum)."""
    import numpy as np

    mmin = 0.5 if kmin is None else kmin
    mmax = ngrid / 2.0 if kmax is None else kmax
    nf = ngrid * fine_factor
    fxy = np.asarray(np.fft.fftfreq(ngrid) * ngrid, np.float32)
    fz = np.arange(ngrid // 2 + 1, dtype=np.float32)
    return _device_binning(
        ("fine", ngrid, fine_factor, nbins, float(mmin), float(mmax)),
        lambda: _shell_binning_host_from_freqs(
            fxy, fxy, fz, nbins, mmin, mmax, nf,
            cache_key=("fine-host", ngrid, fine_factor, nbins,
                       float(mmin), float(mmax))))


@jax.jit
def _shell_reduce(values_flat, binidx, wf, nm):
    """Fused one-hot shell reduction: p[b] = sum_m v w [binidx==b] / nm.

    Chunked scan bounds the (chunk, nbins+1) intermediate so XLA's
    reduce fusion never materializes the full nmodes x nbins one-hot;
    26 ms at 8.4M modes x 64 bins on-chip (vs 123 ms gather-matrix,
    100 ms segment_sum).
    """
    nbins = nm.shape[0]
    n = values_flat.shape[0]
    chunk = min(1 << 19, max(1024, n))
    vw = values_flat * wf
    pad = (-n) % chunk
    vw = jnp.pad(vw, (0, pad)).reshape(-1, chunk)
    bi = jnp.pad(binidx, (0, pad),
                 constant_values=nbins).reshape(-1, chunk)
    bins = jnp.arange(nbins + 1, dtype=binidx.dtype)

    def body(acc, xs):
        v, b = xs
        return acc + jnp.sum(jnp.where(b[:, None] == bins[None, :],
                                       v[:, None], 0.0), axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros((nbins + 1,), jnp.float32),
                          (vw, bi))
    denom = jnp.where(nm > 0, nm, 1.0)
    return acc[:nbins] / denom


def shell_average(values, ngrid: int, boxsize: float, nbins: int,
                  kmin=None, kmax=None, binning=None):
    """Average `values` (real, rfftn layout) over |k| shells.

    Returns (k_mean, value_mean, nmodes). Bins are linear in k with width
    the fundamental mode kf = 2 pi / boxsize by default (matching the
    reference's dk=kf choice, power_spectrum_3d.py:189-195). kmin/kmax are
    interpreted in units of kf (mode units, static) so the shell
    assignment is bit-identical with the distributed estimator.

    The reduction gathers each shell's modes through a host-precomputed
    padded index matrix and row-sums — TPU scatter-adds serialize (the
    segment_sum version cost 27x the FFT itself at 256^3); dense gathers
    and tree reductions do not (measured 6x faster end-to-end).
    """
    kf = 2.0 * jnp.pi / boxsize
    if binning is None:
        binning = get_shell_binning(ngrid, nbins, kmin, kmax)
    binidx, wf, nm, kmean = binning
    p = _shell_reduce(values.reshape(-1), binidx, wf, nm)
    return kmean * kf, p, nm


def auto_power(grid, boxsize: float, nbins: int = 0, window: Optional[str] = None,
               grid_shifted=None, interlaced: bool = False,
               shotnoise: float = 0.0, kmin=None, kmax=None,
               binning=None) -> PowerResult:
    """Auto power spectrum P(k) of a painted grid.

    shotnoise: V/N_particles for discrete tracers (subtracted after
    binning, as in the reference power_spectrum_3d.py:223-224).
    """
    n = grid.shape[-1]
    nbins = nbins or (n // 2)
    dk = delta_k(grid, grid_shifted, window=window, interlaced=interlaced)
    pk3d = (jnp.abs(dk) ** 2) * (boxsize ** 3)
    k, p, nm = shell_average(pk3d, n, boxsize, nbins, kmin, kmax,
                             binning=binning)
    return PowerResult(k, p - shotnoise, nm)


class MultipoleResult(NamedTuple):
    k: jnp.ndarray        # (nbins,) mean |k| per shell
    p_ell: jnp.ndarray    # (nell, nbins) multipoles in requested order
    nmodes: jnp.ndarray   # (nbins,) hermitian-weighted mode counts


def _legendre_even(ell: int, mu2):
    """Even Legendre polynomials as functions of mu^2 (shared with
    ops/tpcf._legendre — keep the coefficients in ONE place)."""
    if ell == 0:
        return jnp.ones_like(mu2)
    if ell == 2:
        return 0.5 * (3.0 * mu2 - 1.0)
    if ell == 4:
        return 0.125 * ((35.0 * mu2 - 30.0) * mu2 + 3.0)
    raise ValueError("auto-spectrum multipoles exist for even ell<=4 "
                     f"(got {ell})")




def auto_power_multipoles(grid, boxsize: float, nbins: int = 0,
                          ells=(0, 2, 4), los: int = 2,
                          window: Optional[str] = None, grid_shifted=None,
                          interlaced: bool = False, shotnoise: float = 0.0,
                          kmin=None, kmax=None,
                          binning=None) -> MultipoleResult:
    """Plane-parallel redshift-space power multipoles P_ell(k).

    P_ell(k) = (2 ell + 1) < |delta_k|^2 V  L_ell(mu) >_shell with
    mu = k_los/|k| — the FFT estimator the reference's nbodykit FFTPower
    exposes as mode='2d'/poles but astrild itself only ever used in 1D
    (power_spectrum_3d.py:189-195). Together with
    ops.tpcf.tpcf_multipoles (configuration space) and
    ops.linear_power.kaiser_multipoles (theory) this closes the RSD loop.

    shotnoise (V/N) is subtracted from the monopole only (the isotropic
    noise has no higher multipoles in the continuum limit).
    """
    n = grid.shape[-1]
    nbins = nbins or (n // 2)
    dk = delta_k(grid, grid_shifted, window=window, interlaced=interlaced)
    pk3d = (jnp.abs(dk) ** 2) * (boxsize ** 3)
    f = (jnp.fft.fftfreq(n) * n).astype(jnp.float32)
    fz = (jnp.fft.rfftfreq(n) * n).astype(jnp.float32)
    ax = (f[:, None, None], f[None, :, None], fz[None, None, :])
    m2 = ax[0] ** 2 + ax[1] ** 2 + ax[2] ** 2
    mu2 = jnp.where(m2 == 0.0, 0.0, ax[los] ** 2 / jnp.maximum(m2, 1e-12))
    if binning is None:
        binning = get_shell_binning(n, nbins, kmin, kmax)
    binidx, wf, nm, kmean = binning
    kf = 2.0 * jnp.pi / boxsize
    # one _shell_reduce per ell: a fused multi-channel variant (one-hot
    # matmul with nch=3 columns) measured 5.8x SLOWER on-chip (766 ms vs
    # 133 ms at 256^3/64 bins) — narrow matmuls pad terribly on the MXU
    rows = []
    for ell in ells:
        vals = pk3d * ((2 * ell + 1) * _legendre_even(ell, mu2))
        p = _shell_reduce(vals.reshape(-1), binidx, wf, nm)
        if ell == 0:
            p = p - shotnoise
        rows.append(p)
    return MultipoleResult(kmean * kf, jnp.stack(rows), nm)


def auto_power_fast(pos, ngrid: int, boxsize: float, nbins: int = 0,
                    fine_factor: int = 2, weights=None,
                    kmin=None, kmax=None,
                    return_coarse_grid: bool = False,
                    binning=None, deposit: Optional[str] = None
                    ) -> PowerResult:
    """Fast P(k): NGP deposit on a fine_factor-finer grid + deconvolution.

    TPU scatters serialize per update, so the deposit dominates the
    pipeline: TSC writes 27 terms/particle, NGP writes 1. Depositing NGP
    on a (fine_factor*ngrid)^3 grid and deconvolving the NGP window
    keeps sub-cell positional information at the finer resolution and
    pushes aliasing beyond fine_factor times the target Nyquist — the
    shells are then measured only up to the coarse-grid Nyquist. Measured
    ~8x faster than TSC painting at equal accuracy over the reported
    k-range (see tests/test_paint_power.py::test_fast_power_matches_tsc).

    Returns the same binning as auto_power(grid(ngrid), nbins).
    """
    nbins = nbins or (ngrid // 2)
    if binning is None:
        binning = get_fast_binning(ngrid, nbins, fine_factor, kmin, kmax)
    if deposit is None:
        # the sorted Pallas deposit beats the XLA scatter by >2x at large N
        # (measured: 726 ms vs 1582 ms for 512^3 unit-weight particles);
        # below ~4M particles the scatter is fine and compile cost wins
        n_cells = fine_factor ** 3 * ngrid ** 3
        n_part = (pos[0] if isinstance(pos, (tuple, list))
                  else pos[:, 0]).shape[0]
        from .paint_pallas import DEFAULT_WINDOW, pallas_deposit_available
        deposit = ("pallas" if (jax.default_backend() == "tpu"
                                and n_part >= (1 << 22)
                                and n_cells % DEFAULT_WINDOW == 0
                                and pallas_deposit_available())
                   else "scatter")
        # expose the auto-selection so benchmarks/pipelines can assert the
        # fast path engaged (a probe false-negative silently costs 2-3x)
        global last_auto_deposit
        last_auto_deposit = deposit
    return _auto_power_fast_impl(pos, boxsize, weights, binning,
                                 ngrid=ngrid, nbins=nbins,
                                 fine_factor=fine_factor,
                                 return_coarse_grid=return_coarse_grid,
                                 deposit=deposit)


def _fast_keys(pos, boxsize, *, ngrid: int, fine_factor: int):
    """Flat NGP cell keys on the fine grid, subgrid-major (fold) layout.

    Single home shared by `_auto_power_fast_impl` and the bench's
    sub-stage timings (`bench.py` matter_detail), so the timed
    decomposition cannot drift from the production path. All
    per-particle arithmetic stays on flat (N,) components: a resident
    (N, 3) array pads its 3-wide dim to 128 lanes (42x memory) at
    large N.
    """
    nf = ngrid * fine_factor
    ff = fine_factor
    if isinstance(pos, (tuple, list)):
        x, y, z = pos
    else:
        x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    inv_cell = float(nf) / boxsize if isinstance(boxsize, float) else \
        nf / boxsize

    def cell(c):
        return jnp.floor(c * inv_cell).astype(jnp.int32) % nf

    ux, uy, uz = cell(x), cell(y), cell(z)
    s_id = ((ux % ff) * ff + (uy % ff)) * ff + (uz % ff)
    return ((s_id * ngrid + ux // ff) * ngrid + uy // ff) * ngrid \
        + uz // ff


@partial(jax.jit, static_argnames=("ngrid", "nbins", "fine_factor",
                                   "return_coarse_grid", "deposit"))
def _auto_power_fast_impl(pos, boxsize, weights, binning, *, ngrid: int,
                          nbins: int, fine_factor: int,
                          return_coarse_grid: bool,
                          deposit: str = "scatter"):
    ff = fine_factor

    # POWMES-style folding: FFT_fine(m) for |m| below the coarse Nyquist
    # equals the phase-weighted sum of the FFTs of the fine_factor^3
    # interleaved coarse subgrids (decimation in time). This avoids the
    # single big FFT whose TPU-internal [n,n,n/4,4] reshape pads 32x.
    # The deposit goes straight into subgrid-major layout — strided
    # slicing a 512^3 array afterwards was the dominant cost.
    if isinstance(pos, (tuple, list)):
        x, y, z = pos
    else:
        x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    n_part = x.shape[0]
    flat = _fast_keys((x, y, z), boxsize, ngrid=ngrid,
                      fine_factor=fine_factor)
    w32 = None if weights is None else weights.astype(jnp.float32)
    if deposit == "pallas" or deposit == "pallas_interpret":
        from .paint_pallas import deposit_flat
        dep = deposit_flat(flat, w32, ff ** 3 * ngrid ** 3,
                           interpret=(None if deposit == "pallas"
                                      else True))
    elif deposit in ("pallas_seg", "pallas_seg_interpret"):
        # segment-sorted deposit. NOTE (r3 re-measurement): lax.sort
        # cost is data-INDEPENDENT (coherent keys sort in the same time
        # as random), and with is_stable=False the monolithic sort
        # dropped to 237 ms at 134M keys, so this path no longer beats
        # the default even for file-ordered snapshots — its remaining
        # niche is spatially coherent input where mostly-empty
        # (window, segment) ranges keep the kernel grid cheap. Never
        # auto-selected; callers opt in explicitly.
        from .paint_pallas import deposit_flat_segmented
        dep = deposit_flat_segmented(
            flat, w32, ff ** 3 * ngrid ** 3,
            interpret=(None if deposit == "pallas_seg" else True))
    else:
        dep = jnp.zeros((ff ** 3 * ngrid ** 3,), jnp.float32)
        dep = dep.at[flat].add(1.0 if w32 is None else w32)
    total = float(n_part) if weights is None else jnp.sum(w32)
    # discrete-tracer shot noise: V * sum(w^2) / (sum w)^2, which reduces
    # to V/N for unit weights. (Subtracting V/N for weighted tracers
    # leaves a (N*sum(w^2)/(sum w)^2 - 1) * V/N residual — measured 14%
    # of the shot level for w ~ U(0.5, 2) Poisson particles.)
    if weights is None:
        shot = boxsize ** 3 / n_part
    else:
        shot = boxsize ** 3 * jnp.sum(w32 * w32) \
            / jnp.where(total == 0, 1.0, total) ** 2
    return _fold_fft_bin(dep, total, shot, binning, boxsize, ngrid=ngrid,
                         fine_factor=fine_factor,
                         return_coarse_grid=return_coarse_grid)


def _fold_fft_bin(dep_flat, total, shot, binning, boxsize, *, ngrid: int,
                  fine_factor: int, return_coarse_grid: bool):
    """Fold-FFT + NGP deconvolution + shell binning of a fine deposit.

    Single home shared by `_auto_power_fast_impl` and the bench's
    sub-stage timings. dep_flat: (ff^3 * ngrid^3,) subgrid-major counts.
    """
    import itertools

    ff = fine_factor
    nf = ngrid * ff
    dep = dep_flat.reshape(ff ** 3, ngrid, ngrid, ngrid)

    mode = (jnp.fft.fftfreq(ngrid) * ngrid).astype(jnp.float32)
    mz = (jnp.fft.rfftfreq(ngrid) * ngrid).astype(jnp.float32)
    F = jnp.zeros((ngrid, ngrid, ngrid // 2 + 1), jnp.complex64)
    coarse = jnp.sum(dep, axis=0) if return_coarse_grid else None
    # the fold phase exp(-2pi i (m_x s_x + m_y s_y + m_z s_z)/nf) is
    # separable: three 1-D phase vectors replace a full-grid complex exp
    # per subgrid (8 transcendental passes over the half-spectrum -> 24
    # exps of length ngrid)
    def ph1(m, sc):
        return jnp.exp((-2.0j * jnp.pi / nf) * (m * sc))

    for s in itertools.product(range(ff), repeat=3):
        sid = (s[0] * ff + s[1]) * ff + s[2]
        spec = jnp.fft.rfftn(dep[sid])
        F = F + spec * (ph1(mode, s[0])[:, None, None]
                        * ph1(mode, s[1])[None, :, None]
                        * ph1(mz, s[2])[None, None, :])
    dk = F / jnp.where(total == 0, 1.0, total)  # = FFT(delta)/Nf^3 (+DC)
    # NGP window deconvolution at the fine resolution
    def axis_win(m):
        x = m / nf
        return jnp.where(x == 0.0, 1.0, jnp.sinc(x))

    dk = dk / (axis_win(mode)[:, None, None] * axis_win(mode)[None, :, None]
               * axis_win(mz)[None, None, :])
    pk3d = (jnp.abs(dk) ** 2) * (boxsize ** 3)
    binidx, wf, nm, kmean = binning
    kf = 2.0 * jnp.pi / boxsize
    p = _shell_reduce(pk3d.reshape(-1), binidx, wf, nm)
    res = PowerResult(kmean * kf, p - shot, nm)
    if return_coarse_grid:
        return res, coarse
    return res


def cross_power(grid1, grid2, boxsize: float, nbins: int = 0,
                window: Optional[str] = None, grids_shifted=(None, None),
                interlaced: bool = False, kmin=None, kmax=None) -> PowerResult:
    """Cross power spectrum of two painted grids (no shot noise)."""
    n = grid1.shape[-1]
    nbins = nbins or (n // 2)
    dk1 = delta_k(grid1, grids_shifted[0], window=window, interlaced=interlaced)
    dk2 = delta_k(grid2, grids_shifted[1], window=window, interlaced=interlaced)
    pk3d = jnp.real(dk1 * jnp.conj(dk2)) * (boxsize ** 3)
    k, p, nm = shell_average(pk3d, n, boxsize, nbins, kmin, kmax)
    return PowerResult(k, p, nm)


@partial(jax.jit, static_argnames=("n_sub", "nbins"))
def position_dependent_power(delta, boxsize, n_sub: int = 4,
                             nbins: int = 8):
    """Position-dependent power spectrum and integrated bispectrum
    (Chiang et al. 2014, arXiv:1403.3411).

    The box splits into n_sub^3 subvolumes; each measures its local
    mean overdensity delta_b and local P(k | subvolume) (FFT of the
    windowed subvolume, periodic within the SUBVOLUME — the standard
    estimator treats each cube as its own box). The integrated
    bispectrum is the correlation

        iB(k) = < P_sub(k) delta_b > ,

    whose normalized form d ln P/d delta_b is the separate-universe
    power response. For a Gaussian field iB = 0.

    Args:
      delta: (n, n, n) density contrast; n must be divisible by n_sub.
    Returns (k, ib (nbins,), response (nbins,), p_mean (nbins,),
    delta_b (n_sub^3,)).
    """
    n = delta.shape[-1]
    ns = n // n_sub
    assert ns * n_sub == n, "ngrid must divide by n_sub"
    sub_box = boxsize / n_sub
    # (n_sub^3, ns, ns, ns) subvolumes
    d = delta.reshape(n_sub, ns, n_sub, ns, n_sub, ns)
    d = jnp.transpose(d, (0, 2, 4, 1, 3, 5)).reshape(-1, ns, ns, ns)
    delta_b = jnp.mean(d, axis=(1, 2, 3))

    def one(sub):
        # subvolume fluctuation about ITS OWN mean, measured in the
        # subvolume's periodic FFT basis
        local = sub - jnp.mean(sub)
        dk = jnp.fft.rfftn(local) / float(ns) ** 3
        pk3d = (jnp.abs(dk) ** 2) * (sub_box ** 3)
        k, p, nm = shell_average(pk3d, ns, sub_box, nbins)
        return k, p

    k, p_sub = jax.vmap(one)(d)
    k = k[0]
    p_mean = jnp.mean(p_sub, axis=0)
    db = delta_b - jnp.mean(delta_b)
    ib = jnp.mean(p_sub * db[:, None], axis=0)
    var_b = jnp.mean(db ** 2)
    response = jnp.where(p_mean * var_b > 0,
                         ib / jnp.maximum(p_mean * var_b, 1e-30),
                         jnp.nan)
    return k, ib, response, p_mean, delta_b
