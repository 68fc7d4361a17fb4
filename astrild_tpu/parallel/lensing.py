"""Distributed lensing pipeline: realizations sharded over the 'sim' axis.

The BASELINE "Ray-Ramses lightcone" configuration: per-realization lens
planes -> Born kappa -> deflection/shear -> peak catalog -> tunnels voids,
with the realization array sharded over the 'sim' mesh axis (each shard
runs the full per-sim pipeline locally; results return batched). This is
the TPU-native form of the reference's serial loop over
SimulationCollection members (simcoll.py:238-341).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import lensing as lens_ops
from ..ops import peaks as peak_ops
from ..ops import raytrace as ray_ops
from ..ops import voids as void_ops

__all__ = ["LensingSuiteResult", "make_distributed_lensing_suite",
           "make_distributed_multiplane_healpix",
           "make_distributed_healpix_shells",
           "make_distributed_raytrace", "make_distributed_lens_planes"]


class LensingSuiteResult(NamedTuple):
    kappa: jnp.ndarray        # (nsim, npix, npix)
    gamma1: jnp.ndarray       # (nsim, npix, npix)
    gamma2: jnp.ndarray       # (nsim, npix, npix)
    void_radius: jnp.ndarray  # (nsim, max_voids) [pixels]
    n_voids: jnp.ndarray      # (nsim,)


def make_distributed_lensing_suite(mesh: Mesh, npix: int,
                                   opening_angle_rad: float,
                                   chi_s: float, omega_m: float,
                                   max_peaks: int = 1024,
                                   max_voids: int = 128,
                                   padding_factor: int = 2):
    """Build the jitted per-realization lensing+voids pipeline over `mesh`.

    Returns fn(planes, chis, dchis) with
      planes: (nsim, nplane, npix, npix) density-contrast lens planes,
        sharded P('sim', ...);
      chis/dchis: (nplane,) comoving distances/thicknesses (replicated).
    """
    def one_sim(planes, chis, dchis):
        kappa = lens_ops.born_convergence(planes, chis, dchis, chi_s,
                                          omega_m)
        a1, a2 = lens_ops.kappa_to_alpha(kappa, opening_angle_rad,
                                         padding_factor=padding_factor)
        g1, g2 = lens_ops.alpha_to_gamma(a1, a2, opening_angle_rad)
        cat = peak_ops.find_peaks(kappa, threshold=jnp.std(kappa),
                                  max_peaks=max_peaks, edge_pix=4)
        vcat = void_ops.find_tunnels(cat.pos.astype(jnp.float32),
                                     cat.values > -jnp.inf, npix,
                                     max_voids=max_voids)
        return LensingSuiteResult(kappa, g1, g2, vcat.radius,
                                  vcat.n.astype(jnp.int32))

    def body(planes, chis, dchis):
        return jax.vmap(lambda p: one_sim(p, chis, dchis))(planes)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("sim", None, None, None), P(None), P(None)),
        out_specs=LensingSuiteResult(P("sim"), P("sim"), P("sim"),
                                     P("sim"), P("sim")),
    )
    return jax.jit(fn)


def make_distributed_raytrace(mesh: Mesh, chi_s: float, omega_m: float,
                              opening_angle_rad: float,
                              n_rays=None, padding_factor: int = 1):
    """Post-Born multi-plane ray tracing, realizations sharded over 'sim'.

    Returns fn(planes, chis, dchis) with planes (nsim, nplane, npix, npix)
    sharded P('sim', ...); output maps (kappa/gamma1/gamma2/omega/beta*)
    come back as a dict of (nsim, nr, nr) arrays sharded the same way.
    Each shard runs ops.raytrace.multiplane_raytrace locally — there is no
    cross-sim communication, so the sim axis scales linearly over ICI/DCN.
    """
    def body(planes, chis, dchis):
        return jax.vmap(lambda p: ray_ops.multiplane_raytrace(
            p, chis, dchis, chi_s, omega_m, opening_angle_rad,
            n_rays=n_rays, padding_factor=padding_factor))(planes)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("sim", None, None, None), P(None), P(None)),
        out_specs=P("sim"),
    )
    return jax.jit(fn)


def make_distributed_lens_planes(mesh: Mesh, boxsize, chi0, dchi,
                                 nplanes: int, fov, npix: int,
                                 los: int = 2, observer_xy=None,
                                 axis: str = "sim",
                                 with_valid_mask: bool = False,
                                 deposit: str | None = None):
    """Particle-sharded lens-plane painting: fn(pos[, valid]) ->
    (delta (nplanes, npix, npix), chis), replicated.

    pos: (x, y, z) flat component buffers, each sharded P(axis) on the
    particle dimension (the multihost loader's layout). Each device
    paints raw per-plane counts from its shard (Pallas deposit path when
    available on this backend, scatter scan otherwise — chosen ONCE at
    factory build, outside any trace, per the probe-gate rule); counts
    psum over `axis` and normalize with the GLOBAL particle/weight total.

    with_valid_mask=True: fn takes a per-row 0/1 validity vector sharded
    like pos — required for multihost-loaded catalogs (their zero-
    position padding rows otherwise paint into whichever plane's slab
    wraps over z = 0).
    """
    from ..ops import lens_planes as lp

    # transverse replica count + LOS replica range from CONCRETE factory
    # geometry (ONE home: ops.lens_planes.replica_ranges)
    n_rep, k_lo, k_hi = lp.replica_ranges(boxsize, chi0, dchi, nplanes,
                                          fov)
    if deposit is None:
        # per-shard n is unknown until call time, so gate the replica
        # footprint at a nominal production shard share (2^24 rows);
        # callers with wider transverse replication and small shards can
        # force deposit="pallas"
        use_deposit = lp._deposit_eligible(1 << 24, n_rep)
    else:
        if deposit not in ("pallas", "scatter"):
            raise ValueError(f"deposit must be 'pallas' or 'scatter', "
                             f"got {deposit!r}")
        use_deposit = deposit == "pallas"

    def body(pos, valid=None):
        if use_deposit:
            counts, chis = lp._plane_counts_deposit(
                pos, boxsize, chi0, dchi, nplanes, fov, npix, los,
                observer_xy, n_rep, k_lo, k_hi, weights=valid)
        else:
            counts, chis = lp._plane_counts_scan(
                pos, boxsize, chi0, dchi, nplanes, fov, npix, los,
                observer_xy, n_rep, weights=valid)
        counts = jax.lax.psum(counts, axis)
        n_loc = (jnp.sum(valid) if valid is not None
                 else jnp.asarray(pos[0].shape[0], jnp.float32))
        n_tot = jax.lax.psum(n_loc, axis)
        return lp._normalize_counts(counts, chis, n_tot, boxsize, dchi,
                                    fov, npix), chis

    # interpret-mode pallas discharges the kernel into a jaxpr whose
    # program_id-derived slice indices are non-varying; vma checking
    # rejects that mix (same workaround as parallel/power.py). The
    # compiled TPU kernel is opaque to the check, so it stays on there.
    vma_ok = not (use_deposit and jax.default_backend() != "tpu")
    if with_valid_mask:
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=((P(axis),) * 3, P(axis)),
                           out_specs=(P(), P()), check_vma=vma_ok)
    else:
        fn = jax.shard_map(lambda pos: body(pos), mesh=mesh,
                           in_specs=((P(axis),) * 3,),
                           out_specs=(P(), P()), check_vma=vma_ok)
    return jax.jit(fn)


def make_distributed_healpix_shells(mesh: Mesh, chi_edges, nside: int,
                                    boxsize, observer=None,
                                    axis: str = "sim",
                                    with_valid_mask: bool = False,
                                    deposit: str | None = None):
    """Particle-sharded full-sky lightcone shells: fn(pos[, valid]) ->
    delta (nshell, npix) HEALPix density contrast, replicated.

    The curved-sky counterpart of make_distributed_lens_planes: each
    device paints its particle shard's (shell, pixel) counts
    (ops.lightcone_sphere.shell_counts_healpix — Pallas sorted deposit
    on TPU, XLA scatter otherwise, decided HERE outside any trace per
    the probe-gate rule), counts psum over `axis`, and the overdensity
    normalization uses the GLOBAL particle/weight total.

    pos: (x, y, z) flat component buffers sharded P(axis);
    with_valid_mask=True takes a 0/1 row validity vector sharded the
    same way (multihost zero-padding rows otherwise land in whichever
    shell contains the observer-to-origin distance).
    """
    import numpy as np

    from ..ops import lightcone_sphere as lcs

    if deposit is None:
        deposit = ("pallas" if lcs._use_pallas_deposit(1 << 24)
                   else "scatter")
    elif deposit not in ("pallas", "scatter"):
        raise ValueError(f"deposit must be 'pallas' or 'scatter', "
                         f"got {deposit!r}")
    chi_edges = np.asarray(chi_edges, np.float64)

    def body(pos, valid=None):
        counts = lcs.shell_counts_healpix(
            pos, chi_edges, nside, boxsize, observer=observer,
            weights=valid, deposit=deposit)
        counts = jax.lax.psum(counts, axis)
        n_loc = (jnp.sum(valid) if valid is not None
                 else jnp.asarray(pos[0].shape[0], jnp.float32))
        n_tot = jax.lax.psum(n_loc, axis)
        return lcs.shell_overdensity(counts, chi_edges, n_tot, boxsize)

    vma_ok = not (deposit == "pallas" and jax.default_backend() != "tpu")
    if with_valid_mask:
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=((P(axis),) * 3, P(axis)),
                           out_specs=P(), check_vma=vma_ok)
    else:
        fn = jax.shard_map(lambda pos: body(pos), mesh=mesh,
                           in_specs=((P(axis),) * 3,),
                           out_specs=P(), check_vma=vma_ok)
    return jax.jit(fn)


def make_distributed_multiplane_healpix(mesh: Mesh, nside: int,
                                        omega_m: float,
                                        lmax: int | None = None,
                                        method: str = "auto",
                                        axis: str = "x"):
    """Ray-sharded curved-sky post-Born tracer: fn(delta_shells, chis,
    dchis, chi_s[, scale_factors]) -> dict of (npix,) maps, replicated.

    The per-shell potential fields (SHT-heavy; scale-selected table/scan
    backend exactly as ops.lightcone_sphere.multiplane_raytrace_healpix)
    compute replicated ONCE; the ray transport — independent per ray —
    shards the HEALPix ray grid over `axis`. Stencil memory
    (32 B/ray/shell, the tracer's dominant footprint) divides by the
    axis size, which is what lets nside 1024+ traces fit.
    """
    import numpy as np

    from ..ops import lightcone_sphere as lcs
    from ..utils import healpix as hpx

    L = 2 * nside if lmax is None else int(lmax)
    tabs, use_scan = lcs._multiplane_tabs(nside, L, method)
    npix = hpx.nside2npix(nside)
    t0_np, p0_np = hpx.pix2ang_ring(nside, np.arange(npix))
    t0 = jnp.asarray(t0_np, jnp.float32)
    p0 = jnp.asarray(p0_np, jnp.float32)
    tab_leaves, tab_tree = jax.tree.flatten(tabs)
    n_tab = len(tab_leaves)

    def body(t0_shard, p0_shard, delta_shells, chis, dchis, chi_s,
             scale_factors, *leaves):
        t = jax.tree.unflatten(tab_tree, leaves)
        kaps = lcs.effective_plane_kappa(delta_shells, chis[:, None],
                                         dchis[:, None],
                                         scale_factors[:, None], omega_m)
        if use_scan:
            fields = lcs._plane_fields_healpix_scan(kaps, t, nside, L)
        else:
            fields = lcs._plane_fields_healpix(kaps, t, L)
        # the interp stencils MUST survive to the jit output: inside-jit
        # DCE of the scan ys re-enables the duplicated-fusion
        # inconsistency the materialization defends against
        # (ops/lightcone_sphere._trace_multiplane notes); they are
        # dropped by the host wrapper AFTER the jit boundary
        return lcs._trace_multiplane(fields, chis, chi_s, t0_shard,
                                     p0_shard, nside)

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(),) * 5 + (P(),) * n_tab,
        out_specs=(P(axis), P(axis))))

    def run(delta_shells, chis, dchis, chi_s, scale_factors=None):
        chi_s_arr = jnp.asarray(chi_s, jnp.float32)
        if chi_s_arr.ndim > 0:
            # the vmapped nsrc axis would land on dim 0 of every output
            # leaf and the ray-axis out_specs would concatenate IT across
            # devices — scrambled output, not tomography. Loop sources
            # at the caller instead.
            raise ValueError(
                "make_distributed_multiplane_healpix supports a scalar "
                "chi_s only; call once per source plane for tomography")
        chis = jnp.asarray(chis, jnp.float32)
        if scale_factors is None:
            scale_factors = jnp.ones_like(chis)
        out, _stencils = fn(
            t0, p0, jnp.asarray(delta_shells, jnp.float32), chis,
            jnp.asarray(dchis, jnp.float32),
            jnp.asarray(chi_s, jnp.float32),
            jnp.asarray(scale_factors, jnp.float32), *tab_leaves)
        return out

    return run
