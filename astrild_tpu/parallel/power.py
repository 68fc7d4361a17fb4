"""Distributed P(k): sharded paint + pencil FFT + collective shell binning.

End-to-end device-mesh version of ops/power.py: particles arrive sharded
over the whole mesh, each device paints its chunk onto a full local grid,
`psum_scatter` collectives reduce+re-pencil the grid, the pencil FFT runs
over ICI, and per-shell segment-sums finish with a psum. The per-bin result
is bit-for-bit comparable with the single-device estimator (see
tests/test_distributed_power.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.paint import WINDOW_ORDER, paint as paint_single
from ..ops.power import PowerResult
from .pfft import local_kvecs, pfft3d_local

__all__ = ["make_distributed_auto_power", "make_distributed_auto_power_fast",
           "local_shell_average", "local_multipole_average",
           "make_distributed_multipoles"]


def _local_compensation(ki, kj, kk, ngrid, boxsize, window):
    """1/W(k) for the local pencil block (full-spectrum layout)."""
    p = WINDOW_ORDER[window]
    kny = jnp.pi * ngrid / boxsize

    def axis_win(k):
        x = k / (2.0 * kny)  # = freq in cycles/cell
        s = jnp.where(x == 0.0, 1.0, jnp.sinc(x))
        return s ** p

    return 1.0 / (axis_win(ki) * axis_win(kj) * axis_win(kk))


def local_mode_numbers(ngrid: int, ax: str = "x", ay: str = "y",
                       dtype=jnp.float32):
    """Integer mode numbers (fi, fj, fk) for the local TRANSPOSED_OUT
    pencil block (see pfft.py), broadcastable to (n, n/PX, n/PY)."""
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    xi = jax.lax.axis_index(ax)
    yi = jax.lax.axis_index(ay)
    freqs = (jnp.fft.fftfreq(ngrid) * ngrid).astype(dtype)
    nj = ngrid // px
    nk = ngrid // py
    fi = freqs[:, None, None]
    fj = jax.lax.dynamic_slice(freqs, (xi * nj,), (nj,))[None, :, None]
    fk = jax.lax.dynamic_slice(freqs, (yi * nk,), (nk,))[None, None, :]
    return fi, fj, fk


def local_mode_radius(ngrid: int, ax: str = "x", ay: str = "y",
                      dtype=jnp.float32):
    """|k|/kf for the local TRANSPOSED_OUT pencil block (see pfft.py).

    Built from exact integer mode numbers so shell assignment is
    bit-identical with ops.power.mode_radius_rfft.
    """
    fi, fj, fk = local_mode_numbers(ngrid, ax, ay, dtype)
    return jnp.sqrt(fi ** 2 + fj ** 2 + fk ** 2)


def _local_binned_reduce(value_streams, mf, ngrid, nbins,
                         axes=("x", "y"), kmin=None, kmax=None):
    """Shared core of the collective shell reductions: mask modes to the
    [mmin, mmax] shell range, chunk-scan a fused one-hot masked sum over
    [count, |k|, *value_streams], and psum across mesh `axes`.

    ONE home for the shell-edge construction (CLAUDE.md: estimators must
    share the exact linspace/boundary modes or borderline shells flip)
    and for the shard_map carry-vma workaround.

    Returns (nm, msum, sums) with sums (nch, nbins).
    """
    mmin = 0.5 if kmin is None else kmin
    mmax = ngrid / 2.0 if kmax is None else kmax
    try:
        # Host float64 linspace cast to float32 — the SAME arithmetic as
        # ops.power._per_mode_binning. Device jnp.linspace runs float32
        # accumulation and can land edges 1 ulp away, flipping the shell
        # of any |k|/kf that sits exactly on an edge (e.g. 5.0000005 vs 5).
        import numpy as _np

        edges = jnp.asarray(
            _np.linspace(float(mmin), float(mmax), nbins + 1,
                         dtype=_np.float32))
    except TypeError:  # traced kmin/kmax: degrade to device linspace
        edges = jnp.linspace(mmin, mmax, nbins + 1)
    binidx = jnp.clip(jnp.searchsorted(edges, mf, side="right") - 1, 0,
                      nbins - 1)
    inside = (mf >= mmin) & (mf <= mmax)
    binidx = jnp.where(inside, binidx, nbins)  # nbins = discard slot
    insf = inside.astype(value_streams[0].dtype)
    streams = jnp.stack([insf, insf * mf]
                        + [insf * v for v in value_streams])
    nch = streams.shape[0]
    n = mf.shape[0]
    chunk = min(1 << 19, max(1024, n))
    pad = (-n) % chunk
    streams = jnp.pad(streams, ((0, 0), (0, pad))).reshape(nch, -1, chunk)
    bi = jnp.pad(binidx, (0, pad),
                 constant_values=nbins).reshape(-1, chunk)
    bins = jnp.arange(nbins + 1, dtype=binidx.dtype)

    def body(acc, xs):
        v, b = xs  # (nch, chunk), (chunk,)
        oh = b[:, None] == bins[None, :]
        contrib = jnp.sum(jnp.where(oh[None], v[:, :, None], 0.0), axis=1)
        return acc + contrib, None

    acc0 = jnp.zeros((nch, nbins + 1), streams.dtype)
    try:
        # under shard_map the carry must share the scanned values'
        # varying-mesh-axes, or the scan rejects the carry types
        vma = tuple(jax.typeof(streams).vma)
        if vma:
            from ..utils.jax_compat import pcast_varying

            acc0 = pcast_varying(acc0, vma)
    except Exception:
        pass
    acc, _ = jax.lax.scan(body, acc0,
                          (jnp.moveaxis(streams, 1, 0), bi))
    acc = acc[:, :nbins]
    for axname in axes:
        acc = jax.lax.psum(acc, axname)
    return acc[0], acc[1], acc[2:]


def local_shell_average(values, m, ngrid, boxsize, nbins,
                        axes=("x", "y"), kmin=None, kmax=None):
    """Shell-average `values` over |k| bins, reducing across mesh `axes`.

    values/m: local blocks (full complex-FFT layout, weight 1 per mode);
    m = |k|/kf mode radius. kmin/kmax are in mode units (match ops.power).
    The fused one-hot masked sum (see ops.power._shell_reduce: 26 ms vs
    123 ms gather / 100 ms segment_sum at 8.4M modes on-chip) lives in
    _local_binned_reduce, shared with the multipole estimator.
    """
    kf = 2.0 * jnp.pi / boxsize
    nm, msum, sums = _local_binned_reduce(
        [values.reshape(-1)], m.reshape(-1), ngrid, nbins, axes=axes,
        kmin=kmin, kmax=kmax)
    denom = jnp.where(nm > 0, nm, 1.0)
    return msum / denom * kf, sums[0] / denom, nm


def local_multipole_average(values, m, mu2, ngrid, boxsize, nbins,
                            ells=(0, 2, 4), axes=("x", "y"),
                            kmin=None, kmax=None):
    """Shell-average Legendre-weighted `values` over |k| bins, reducing
    across mesh `axes`: the distributed counterpart of
    ops.power.auto_power_multipoles' per-ell reduction. One one-hot build
    serves nm/ksum and every multipole stream (_local_binned_reduce)."""
    from ..ops.power import _legendre_even

    kf = 2.0 * jnp.pi / boxsize
    vf = values.reshape(-1)
    mu2f = mu2.reshape(-1)
    streams = [vf * ((2 * ell + 1) * _legendre_even(ell, mu2f))
               for ell in ells]
    nm, msum, sums = _local_binned_reduce(
        streams, m.reshape(-1), ngrid, nbins, axes=axes, kmin=kmin,
        kmax=kmax)
    denom = jnp.where(nm > 0, nm, 1.0)
    return msum / denom * kf, sums / denom[None, :], nm


def _weighted_shotnoise(weights, boxsize, part_axes):
    """Weighted discrete-tracer shot noise V * Σw² / (Σw)².

    Reduces to V/N for unit weights (the count-based convention the local
    estimator subtracts), is the correct Poisson level for non-uniform
    weights, and lets zero-weight padding rows — the multihost loader pads
    ragged per-host reads to equal shard sizes — contribute nothing.
    """
    w = weights.astype(jnp.float32)
    sw = jax.lax.psum(jnp.sum(w), part_axes)
    sw2 = jax.lax.psum(jnp.sum(w * w), part_axes)
    return boxsize ** 3 * sw2 / jnp.maximum(sw, 1e-30) ** 2


def _optional_weights(jitted):
    """Honor the documented fn(pos, weights=None) contract: default the
    co-sharded weights to ones with pos's leading shape (jit reshards the
    replicated constant onto the in_spec)."""
    def call(pos, weights=None):
        if weights is None:
            lead = (pos[0].shape if isinstance(pos, (tuple, list))
                    else pos.shape[:-1])
            weights = jnp.ones(lead, jnp.float32)
        return jitted(pos, weights)

    return call


def make_distributed_multipoles(mesh: Mesh, ngrid: int, boxsize: float,
                                nbins: int, window: str = "cic",
                                ells=(0, 2, 4), los: int = 2):
    """Distributed redshift-space multipole estimator over `mesh`.

    Returns fn(pos, weights=None) -> MultipoleResult with pos a global
    (np, 3) redshift-space point set sharded over ALL mesh axes on its
    leading dimension; the line of sight is the global `los` axis (the
    same axis ops.tpcf.to_redshift_space shifts). Pipeline: local paint
    -> psum_scatter re-pencil -> pencil FFT over ICI -> Legendre-weighted
    collective shell reduction (shot noise subtracted from P0).
    """
    from ..ops.power import MultipoleResult

    px = mesh.shape["x"]
    py = mesh.shape["y"]
    part_axes = ("sim", "x", "y")

    def body(pos, weights):
        grid = paint_single(pos, ngrid, boxsize, weights=weights,
                            window=window)
        extra = tuple(a for a in part_axes if a not in ("x", "y"))
        if extra:
            grid = jax.lax.psum(grid, extra)
        if px > 1:
            grid = jax.lax.psum_scatter(grid, "x", scatter_dimension=0,
                                        tiled=True)
        if py > 1:
            grid = jax.lax.psum_scatter(grid, "y", scatter_dimension=1,
                                        tiled=True)
        gsum = jax.lax.psum(jnp.sum(grid), ("x", "y"))
        mean = gsum / ngrid ** 3
        delta = grid / jnp.where(mean == 0, 1.0, mean) - 1.0
        dk = pfft3d_local(delta) / ngrid ** 3
        ki, kj, kk = local_kvecs(ngrid, boxsize)
        if window is not None:
            dk = dk * _local_compensation(ki, kj, kk, ngrid, boxsize,
                                          window)
        fi, fj, fk = local_mode_numbers(ngrid)
        m2 = fi ** 2 + fj ** 2 + fk ** 2
        flos = (fi, fj, fk)[los]
        mu2 = jnp.where(m2 == 0.0, 0.0,
                        flos ** 2 / jnp.maximum(m2, 1e-12))
        mu2 = mu2 * jnp.ones_like(m2)
        m = jnp.sqrt(m2)
        pk3d = (jnp.abs(dk) ** 2) * boxsize ** 3
        pk3d = jnp.where(m == 0.0, 0.0, pk3d)
        kmean, p_ell, nm = local_multipole_average(
            pk3d, m, mu2, ngrid, boxsize, nbins, ells=ells)
        shot = _weighted_shotnoise(weights, boxsize, part_axes)
        noise = jnp.asarray([shot if ell == 0 else 0.0 for ell in ells])
        return MultipoleResult(kmean, p_ell - noise[:, None], nm)

    row = P(("sim", "x", "y"))
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(("sim", "x", "y"), None), row),
        out_specs=MultipoleResult(P(), P(), P()),
    )
    # flat (x, y, z) component buffers — the multihost loader's layout
    fn_t = jax.shard_map(
        body, mesh=mesh, in_specs=((row, row, row), row),
        out_specs=MultipoleResult(P(), P(), P()),
    )
    jfn, jfn_t = jax.jit(fn), jax.jit(fn_t)

    def dispatch(pos, weights):
        if isinstance(pos, (tuple, list)):
            return jfn_t(tuple(pos), weights)
        return jfn(pos, weights)

    return _optional_weights(dispatch)


def make_distributed_auto_power(mesh: Mesh, ngrid: int, boxsize: float,
                                nbins: int, window: str = "cic",
                                batched: bool = False):
    """Build a jitted distributed P(k) estimator over `mesh`.

    Returns fn(pos, weights=None) -> PowerResult, where pos is a global
    (np, 3) array sharded over all mesh axes on its leading dimension
    (or (nsim, np, 3) sharded P('sim', ('x','y')) when batched=True, with
    the result carrying a leading sim axis).
    """
    px = mesh.shape["x"]
    py = mesh.shape["y"]

    def body(pos, weights, part_axes):
        # part_axes: mesh axes the particle dimension is split over.
        # 1. paint local particle chunk on a full local grid
        grid = paint_single(pos, ngrid, boxsize, weights=weights, window=window)
        # 2. reduce + re-pencil: full grid -> (n/PX, n/PY, n) block
        extra = tuple(a for a in part_axes if a not in ("x", "y"))
        if extra:
            grid = jax.lax.psum(grid, extra)
        if px > 1:
            grid = jax.lax.psum_scatter(grid, "x", scatter_dimension=0,
                                        tiled=True)
        if py > 1:
            grid = jax.lax.psum_scatter(grid, "y", scatter_dimension=1,
                                        tiled=True)
        # 3. density contrast with the global mean
        gsum = jax.lax.psum(jnp.sum(grid), ("x", "y"))
        mean = gsum / ngrid ** 3
        delta = grid / jnp.where(mean == 0, 1.0, mean) - 1.0
        # 4. pencil FFT over ICI
        dk = pfft3d_local(delta) / ngrid ** 3
        # 5. window compensation + shell binning
        ki, kj, kk = local_kvecs(ngrid, boxsize)
        if window is not None:
            dk = dk * _local_compensation(ki, kj, kk, ngrid, boxsize, window)
        m = local_mode_radius(ngrid)
        pk3d = (jnp.abs(dk) ** 2) * boxsize ** 3
        # zero the DC mode (owned by the (0,0) device's first entry)
        pk3d = jnp.where(m == 0.0, 0.0, pk3d)
        kmean, pmean, nm = local_shell_average(pk3d, m, ngrid, boxsize,
                                               nbins)
        shot = _weighted_shotnoise(weights, boxsize, part_axes)
        return PowerResult(kmean, pmean - shot, nm)

    if batched:
        # one simulation per 'sim' shard; result carries a leading sim axis
        def wrapped(p, w):
            res = jax.vmap(
                lambda pp, ww: body(pp, ww, ("x", "y")))(p, w)
            return res

        fn = jax.shard_map(
            wrapped, mesh=mesh,
            in_specs=(P("sim", ("x", "y"), None), P("sim", ("x", "y"))),
            out_specs=PowerResult(P("sim"), P("sim"), P("sim")),
        )
    else:
        row = P(("sim", "x", "y"))
        fn = jax.shard_map(
            lambda p, w: body(p, w, ("sim", "x", "y")), mesh=mesh,
            in_specs=(P(("sim", "x", "y"), None), row),
            out_specs=PowerResult(P(), P(), P()),
        )
        # flat (x, y, z) component buffers — the multihost loader's layout
        fn_t = jax.shard_map(
            lambda p, w: body(p, w, ("sim", "x", "y")), mesh=mesh,
            in_specs=((row, row, row), row),
            out_specs=PowerResult(P(), P(), P()),
        )
        jfn, jfn_t = jax.jit(fn), jax.jit(fn_t)

        def dispatch(pos, weights):
            if isinstance(pos, (tuple, list)):
                return jfn_t(tuple(pos), weights)
            return jfn(pos, weights)

        return _optional_weights(dispatch)
    return _optional_weights(jax.jit(fn))


def fast_power_shard_body(pos, weights, *, px: int, py: int, ngrid: int,
                          boxsize: float, nbins: int, fine_factor: int,
                          deposit: str, return_coarse: bool = False):
    """Per-shard body of the distributed folded fine-NGP P(k) (runs under
    shard_map; see make_distributed_auto_power_fast for the algorithm).

    Module-level so composed pipelines (parallel/suite.py) can reuse the
    exact estimator inside a larger shard_map body. With return_coarse the
    coarse (ngrid^3) NGP-count grid comes back as the local pencil block
    (n/PX, n/PY, n) — the same P('x','y',None) layout the distributed
    bispectrum and pencil FFT consume — mirroring ops.power.
    auto_power_fast(return_coarse_grid=True).
    """
    import itertools

    ff = fine_factor
    nf = ngrid * ff
    n_cells = ff ** 3 * ngrid ** 3
    part_axes = ("sim", "x", "y")
    if isinstance(pos, (tuple, list)):
        x, y, z = pos  # flat component buffers (no (N, 3) padding trap)
    else:
        x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    inv_cell = nf / boxsize

    def cell(c):
        return jnp.floor(c * inv_cell).astype(jnp.int32) % nf

    ux, uy, uz = cell(x), cell(y), cell(z)
    s_id = ((ux % ff) * ff + (uy % ff)) * ff + (uz % ff)
    flat = ((s_id * ngrid + ux // ff) * ngrid + uy // ff) * ngrid \
        + uz // ff
    w32 = weights.astype(jnp.float32)
    if deposit in ("pallas", "pallas_interpret"):
        from ..ops.paint_pallas import deposit_flat
        dep = deposit_flat(flat, w32, n_cells,
                           interpret=(None if deposit == "pallas"
                                      else True))
    else:
        dep = jnp.zeros((n_cells,), jnp.float32).at[flat].add(w32)
    total = jax.lax.psum(jnp.sum(w32), part_axes)
    dep = dep.reshape(ff ** 3, ngrid, ngrid, ngrid)
    # reduce the full local copies + re-pencil each subgrid
    dep = jax.lax.psum(dep, "sim")
    if px > 1:
        dep = jax.lax.psum_scatter(dep, "x", scatter_dimension=1,
                                   tiled=True)
    if py > 1:
        dep = jax.lax.psum_scatter(dep, "y", scatter_dimension=2,
                                   tiled=True)
    # fold: pencil FFT per subgrid, combined with decimation phases
    fi, fj, fk = local_mode_numbers(ngrid)
    F = jnp.zeros((ngrid, ngrid // px, ngrid // py), jnp.complex64)
    for s in itertools.product(range(ff), repeat=3):
        sid = (s[0] * ff + s[1]) * ff + s[2]
        spec = pfft3d_local(dep[sid])
        ph = (-2.0 * jnp.pi / nf) * (fi * s[0] + fj * s[1] + fk * s[2])
        F = F + spec * jnp.exp(1j * ph)
    dk = F / jnp.where(total == 0, 1.0, total)

    # NGP window deconvolution at the fine resolution
    def axis_win(m):
        u = m / nf
        return jnp.where(u == 0.0, 1.0, jnp.sinc(u))

    dk = dk / (axis_win(fi) * axis_win(fj) * axis_win(fk))
    m = local_mode_radius(ngrid)
    pk3d = (jnp.abs(dk) ** 2) * boxsize ** 3
    pk3d = jnp.where(m == 0.0, 0.0, pk3d)
    kmean, pmean, nm = local_shell_average(pk3d, m, ngrid, boxsize,
                                           nbins)
    shot = _weighted_shotnoise(weights, boxsize, part_axes)
    res = PowerResult(kmean, pmean - shot, nm)
    if return_coarse:
        return res, jnp.sum(dep, axis=0)
    return res


def make_distributed_auto_power_fast(mesh: Mesh, ngrid: int, boxsize: float,
                                     nbins: int, fine_factor: int = 2,
                                     deposit: Optional[str] = None):
    """Distributed folded fine-NGP P(k): auto_power_fast over the mesh.

    The flagship single-chip estimator (ops.power.auto_power_fast —
    fine-grid NGP deposit in subgrid-major layout + POWMES-style fold +
    NGP deconvolution; subsumes the reference's external POWMES,
    /root/reference/src/astrild/power_spectra/powmes.py:40-102) run over
    the full (sim, x, y) device mesh:

      1. each chip deposits its particle shard into all fine_factor^3
         coarse subgrids locally (sorted Pallas deposit on TPU, XLA
         scatter elsewhere);
      2. psum_scatter re-pencils each subgrid over ('x', 'y');
      3. the pencil FFT runs per subgrid over ICI and the decimation
         phases exp(-2*pi*i m.s/nf) fold them into the coarse-box fine
         spectrum;
      4. NGP window deconvolution at the fine resolution and the
         shell reduction (binning on |k|/kf — bit-identical shell
         assignment with the local estimator) finish with a psum.

    Returns fn(pos, weights=None) -> PowerResult; pos (np, 3) sharded over
    all mesh axes on its leading dim, weights (np,) co-sharded (pass
    ones for counts). P(k) matches ops.power.auto_power_fast to float
    tolerance (tests/test_distributed.py::test_distributed_fast_power);
    nmodes may differ by the z-Nyquist column double-count (hermitian
    storage counts it twice; the full-complex pencil once).
    """
    import itertools

    px = mesh.shape["x"]
    py = mesh.shape["y"]
    assert ngrid % px == 0 and ngrid % py == 0
    ff = fine_factor
    nf = ngrid * ff
    n_cells = ff ** 3 * ngrid ** 3
    if deposit is None:
        from ..ops.paint_pallas import (DEFAULT_WINDOW,
                                        pallas_deposit_available)
        deposit = ("pallas" if (jax.default_backend() == "tpu"
                                and n_cells % DEFAULT_WINDOW == 0
                                and pallas_deposit_available())
                   else "scatter")

    def body(pos, weights):
        return fast_power_shard_body(pos, weights, px=px, py=py,
                                     ngrid=ngrid, boxsize=boxsize,
                                     nbins=nbins, fine_factor=ff,
                                     deposit=deposit)

    # interpret-mode pallas discharges the kernel into a jaxpr whose
    # program_id-derived slice indices are non-varying; vma checking
    # rejects that mix (jax suggests check_vma=False as the workaround).
    # The compiled TPU kernel is opaque to the check, so it stays on.
    row = P(("sim", "x", "y"))
    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P(("sim", "x", "y"), None), row),
        out_specs=PowerResult(P(), P(), P()),
        check_vma=(deposit != "pallas_interpret"),
    )
    # component-tuple variant: flat (x, y, z) buffers skip the (N, 3)
    # minor-dim padding trap (CLAUDE.md) — the multihost loader's layout
    fn_t = jax.shard_map(
        body, mesh=mesh, in_specs=((row, row, row), row),
        out_specs=PowerResult(P(), P(), P()),
        check_vma=(deposit != "pallas_interpret"),
    )
    jfn = jax.jit(fn)
    jfn_t = jax.jit(fn_t)

    def dispatch(pos, weights):
        if isinstance(pos, (tuple, list)):
            return jfn_t(tuple(pos), weights)
        return jfn(pos, weights)

    return _optional_weights(dispatch)
