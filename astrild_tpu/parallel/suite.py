"""Composed distributed z=0 analysis suite: the north-star pipeline as ONE
jitted multi-chip program.

BASELINE config 5 (the reference's headline workload) chains P(k) + B(k) +
Born kappa/gamma + void catalog over a snapshot. bench.py runs that chain
on one chip; the distributed stage factories (parallel/power, bispectrum,
lensing) were each equivalence-tested separately. This module composes
them into a single shard_map body so the WHOLE suite runs sharded over the
(sim, x, y) mesh end-to-end:

  particles (row-sharded over every axis)
    -> per-chip fine-NGP deposit + psum_scatter re-pencil + folded pencil
       FFT -> P(k)               [fast_power_shard_body]
    -> the SAME coarse pencil grid -> shell inverse-FFT triple products
       -> B(k1,k2,k3)            [bispectrum_shard_body]
    -> contiguous z-slabs -> all_gather of the (tiny relative to the
       grid) transverse slab maps -> Born kappa -> alpha -> gamma
    -> peaks + tunnels void catalog (replicated map stage)

matching ops.power.auto_power_fast / ops.bispectrum.bispectrum_3d /
ops.lensing / ops.voids single-device results to float tolerance
(tests/test_distributed_suite.py).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import lensing as lens_ops
from ..ops import peaks as peak_ops
from ..ops import voids as void_ops
from ..ops.bispectrum import BispectrumResult
from ..ops.power import PowerResult
from .bispectrum import bispectrum_shard_body
from .power import _optional_weights, fast_power_shard_body

__all__ = ["Z0SuiteResult", "make_distributed_z0_suite"]


class Z0SuiteResult(NamedTuple):
    pk: PowerResult
    bk: BispectrumResult
    kappa: jnp.ndarray        # (npix, npix)
    gamma1: jnp.ndarray
    gamma2: jnp.ndarray
    void_radius: jnp.ndarray  # (max_voids,)
    n_voids: jnp.ndarray
    # pre-truncation candidate count: n_void_candidates > max_voids means
    # the static top-k cut the list BEFORE overlap pruning (re-run with a
    # larger max_voids; see ops.voids.find_tunnels_auto)
    n_void_candidates: jnp.ndarray


def make_distributed_z0_suite(mesh: Mesh, ngrid: int, boxsize: float,
                              nbins_pk: int, nbins_bk: int = 4,
                              bk_m_min: float = 2.0,
                              bk_m_max: Optional[float] = None,
                              nplanes: int = 8,
                              opening_angle_rad: float = 0.35,
                              chi_s: float = 3000.0,
                              omega_m: float = 0.3089,
                              chi0: float = 200.0,
                              chi1: float = 2800.0,
                              max_peaks: int = 512,
                              max_voids: int = 128,
                              fine_factor: int = 2,
                              deposit: Optional[str] = None):
    """Returns fn(pos, weights=None) -> Z0SuiteResult.

    pos: global (np, 3) snapshot positions sharded over ALL mesh axes on
    the leading dim (the multihost loader's layout); weights co-sharded
    (zero-weight padding rows are inert). Map-stage outputs replicate.
    """
    px = mesh.shape["x"]
    py = mesh.shape["y"]
    assert ngrid % px == 0 and ngrid % py == 0 and ngrid % nplanes == 0
    mmax = (ngrid / 2.0 - 1.0) if bk_m_max is None else bk_m_max
    if deposit is None:
        from ..ops.paint_pallas import (DEFAULT_WINDOW,
                                        pallas_deposit_available)
        n_cells = fine_factor ** 3 * ngrid ** 3
        deposit = ("pallas" if (jax.default_backend() == "tpu"
                                and n_cells % DEFAULT_WINDOW == 0
                                and pallas_deposit_available())
                   else "scatter")

    def body(pos, weights):
        pk, coarse = fast_power_shard_body(
            pos, weights, px=px, py=py, ngrid=ngrid, boxsize=boxsize,
            nbins=nbins_pk, fine_factor=fine_factor, deposit=deposit,
            return_coarse=True)
        bk = bispectrum_shard_body(coarse, ngrid=ngrid, boxsize=boxsize,
                                   nbins=nbins_bk, m_min=bk_m_min,
                                   m_max=mmax)
        # density contrast on the pencil, contiguous z-slab lens planes
        mean = jax.lax.psum(jnp.sum(coarse), ("x", "y")) \
            / float(ngrid) ** 3
        delta = coarse / jnp.where(mean == 0, 1.0, mean) - 1.0
        local = delta.reshape(delta.shape[0], delta.shape[1], nplanes,
                              ngrid // nplanes).sum(3)  # (nx, ny, npl)
        # transverse maps are tiny next to the 3D grid: embed each pencil
        # block at its global offset and psum — an all-reduce that leaves
        # the planes REPLICATED AND INVARIANT (all_gather output stays
        # device-varying under vma checking, which would forbid the P()
        # out_specs of the map stage)
        xi = jax.lax.axis_index("x")
        yi = jax.lax.axis_index("y")
        nxl = ngrid // px
        nyl = ngrid // py
        planes = jnp.zeros((ngrid, ngrid, nplanes), local.dtype)
        planes = jax.lax.dynamic_update_slice(
            planes, local, (xi * nxl, yi * nyl, 0))
        planes = jax.lax.psum(planes, ("x", "y"))
        planes = jnp.moveaxis(planes, -1, 0)      # (nplanes, n, n)
        chis = jnp.linspace(chi0, chi1, nplanes)
        dchis = jnp.full((nplanes,), boxsize / nplanes)
        kappa = lens_ops.born_convergence(planes, chis, dchis, chi_s,
                                          omega_m)
        a1, a2 = lens_ops.kappa_to_alpha(kappa, opening_angle_rad,
                                         padding_factor=2)
        g1, g2 = lens_ops.alpha_to_gamma(a1, a2, opening_angle_rad)
        cat = peak_ops.find_peaks(kappa, threshold=jnp.std(kappa),
                                  max_peaks=max_peaks, edge_pix=4)
        vcat = void_ops.find_tunnels(cat.pos.astype(jnp.float32),
                                     cat.values > -jnp.inf, ngrid,
                                     max_voids=max_voids)
        return Z0SuiteResult(pk, bk, kappa, g1, g2, vcat.radius,
                             vcat.n.astype(jnp.int32),
                             vcat.n_candidates.astype(jnp.int32))

    out_specs = Z0SuiteResult(
        PowerResult(P(), P(), P()),
        BispectrumResult(P(), P(), P(), P(), P()),
        P(), P(), P(), P(), P(), P())
    row = P(("sim", "x", "y"))
    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P(("sim", "x", "y"), None), row),
        out_specs=out_specs, check_vma=(deposit != "pallas_interpret"),
    )
    # component-tuple variant: (x, y, z) flat buffers avoid the (N, 3)
    # minor-dim 42x padding trap at large N (CLAUDE.md) — the layout the
    # multihost loader emits; the shard body consumes components directly
    fn_t = jax.shard_map(
        body, mesh=mesh,
        in_specs=((row, row, row), row), out_specs=out_specs,
        check_vma=(deposit != "pallas_interpret"),
    )
    jfn = jax.jit(fn)
    jfn_t = jax.jit(fn_t)

    def dispatch(pos, weights):
        if isinstance(pos, (tuple, list)):
            return jfn_t(tuple(pos), weights)
        return jfn(pos, weights)

    return _optional_weights(dispatch)
