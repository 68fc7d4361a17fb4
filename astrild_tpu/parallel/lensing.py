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
           "make_distributed_raytrace"]


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
