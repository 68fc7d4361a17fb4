"""Distributed PM N-body over the device mesh.

The force solve runs exactly like the single-device ops.nbody chain but
with every stage mapped onto the mesh the TPU way (SURVEY.md §5 —
replacing the reference's MPI/pfft stack, read_hdf5.py:218's striped
particle feeds): particles are sharded arbitrarily over the mesh axes,
each shard paints a full local grid, `psum_scatter` reduces + re-pencils
it, the pencil FFT (parallel.pfft) runs over ICI, the Poisson/gradient
transfers apply in TRANSPOSED_OUT pencil layout, and the three force
grids return to real space through the inverse pencil FFT before an
`all_gather` rebuilds full grids for the local trilinear readout.

Design note: the readout all_gather makes grid memory per device O(n^3)
— the right trade at PM grid sizes (a 256^3 f32 grid is 64 MB; the
gather rides ICI), keeping particles free of any spatial constraint so
snapshot loaders can feed shards in file order. A spatially-decomposed
gather (slab-sorted particles + halo exchange) only pays once n^3 per
device no longer fits; the paint/FFT stages here already shard compute
and would carry over unchanged.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.paint import paint as paint_single
from ..ops.nbody import _a_edges, pm_step_factors
from ..ops.recon import sample_displacement
from .pfft import local_kvecs, pfft3d_local, pifft3d_local
from .power import _local_compensation, local_mode_numbers

__all__ = ["make_distributed_pm_evolve", "pm_scan_body"]


def _local_force_grids(comps, ngrid: int, boxsize, om0, window: str,
                       am2, ax: str = "x", ay: str = "y",
                       extra_axes=(), deposit=None):
    """Force grids (3, n, n, n), full on every device; shard_map body.

    Mirrors ops.nbody._force_grids (same single-deconvolution painted
    Poisson solve, same Nyquist-masked spectral gradients, same
    linearized-f(R) Geff) in pencil layout. extra_axes: mesh axes the
    particles are additionally split over (e.g. 'sim' when one box
    spans the whole mesh) — their paints psum into the shared grid.
    """
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    # deposit="scatter" keeps the paint differentiable (no Pallas AD
    # rule) — the distributed field-level inference path sets it
    grid = paint_single(comps, ngrid, boxsize, window=window,
                        deposit=deposit)
    if extra_axes:
        grid = jax.lax.psum(grid, extra_axes)
    if px > 1:
        grid = jax.lax.psum_scatter(grid, ax, scatter_dimension=0,
                                    tiled=True)
    if py > 1:
        grid = jax.lax.psum_scatter(grid, ay, scatter_dimension=1,
                                    tiled=True)
    gsum = jax.lax.psum(jnp.sum(grid), (ax, ay))
    mean = gsum / float(ngrid) ** 3
    delta = grid / jnp.where(mean == 0, 1.0, mean) - 1.0
    dk = pfft3d_local(delta, ax, ay) / float(ngrid) ** 3
    dk = dk * _local_compensation(*local_kvecs(ngrid, boxsize, ax, ay),
                                  ngrid, boxsize, window)
    ki, kj, kk = local_kvecs(ngrid, boxsize, ax, ay)
    k2 = ki ** 2 + kj ** 2 + kk ** 2
    k2safe = jnp.where(k2 == 0.0, 1.0, k2)
    geff = 1.0 + k2 / (3.0 * (k2 + am2))
    phik = jnp.where(k2 == 0.0, 0.0, -1.5 * om0 * geff * dk / k2safe)
    mi, mj, mk = local_mode_numbers(ngrid, ax, ay)
    half = ngrid // 2
    grids = []
    for kv, m in ((ki, mi), (kj, mj), (kk, mk)):
        mask = (jnp.abs(m) != half).astype(phik.real.dtype)
        grids.append(jnp.real(pifft3d_local(-1j * kv * mask * phik,
                                            ax, ay))
                     * float(ngrid) ** 3)
    # pifft3d_local returns input-layout pencils (n/PX, n/PY, n); the
    # stack is (3, n/PX, n/PY, n) -> gather to full local (3, n, n, n).
    # Stack BEFORE gathering: gathering the un-stacked pencil propagates
    # the all_gather's preferred layout back into the ifft operand and
    # trips XLA:CPU's fft thunk (LayoutUtil::IsMonotonicWithDim0Major
    # RET_CHECK); the stack pins a fresh dim0-major buffer — and one
    # gather of the stacked array is 3x fewer collectives anyway.
    f = jnp.stack(grids)
    if px > 1:
        f = jax.lax.all_gather(f, ax, axis=1, tiled=True)
    if py > 1:
        f = jax.lax.all_gather(f, ay, axis=2, tiled=True)
    return f


def pm_scan_body(comps, mom, factors, am2_edges, *, ngrid: int,
                 boxsize, om0, window: str, ax: str = "x",
                 ay: str = "y", extra_axes=(), deposit=None):
    """KDK leapfrog scan as a shard_map BODY (module-level so both the
    distributed PM evolver and the distributed field-level inference
    chain reuse the exact same operator). deposit="scatter" keeps the
    per-step force paints differentiable (Pallas has no AD rule)."""
    def force(c, am2):
        grids = _local_force_grids(c, ngrid, boxsize, om0, window, am2,
                                   ax=ax, ay=ay, extra_axes=extra_axes,
                                   deposit=deposit)
        return sample_displacement(grids, boxsize, c)

    force0 = force(comps, am2_edges[0])

    def step(carry, xs):
        fac, am2 = xs
        (x, y, z), (px_, py_, pz_), frc = carry
        k1, dr, k2 = fac[0], fac[1], fac[2]
        px_, py_, pz_ = (px_ + k1 * frc[0], py_ + k1 * frc[1],
                         pz_ + k1 * frc[2])
        x = (x + dr * px_) % boxsize
        y = (y + dr * py_) % boxsize
        z = (z + dr * pz_) % boxsize
        frc = force((x, y, z), am2)
        mom_new = (px_ + k2 * frc[0], py_ + k2 * frc[1],
                   pz_ + k2 * frc[2])
        return ((x, y, z), mom_new, frc), None

    (comps, mom, _), _ = jax.lax.scan(
        step, (comps, mom, force0), (factors, am2_edges[1:]))
    return comps, mom


def make_distributed_pm_evolve(mesh: Mesh, ngrid: int, boxsize: float,
                               cosmo, nsteps: int, window: str = "cic",
                               spacing: str = "loga"):
    """Build a jitted distributed KDK evolver over `mesh`.

    Returns fn(comps, mom, a_init, a_final) -> (comps, mom), where
    comps/mom are (x, y, z) / (px, py, pz) tuples of flat global
    buffers sharded over ALL mesh axes on their (only) dimension — the
    same layout ops.nbody.pm_evolve uses locally and io.multihost's
    loaders produce. ONE box spans the whole mesh (a 'sim' axis, if
    present, just holds more particle shards whose paints psum into
    the shared grid). a_init/a_final are host floats (the KDK
    integrals are host-precomputed per call; the jitted program is
    reused across (a_init, a_final) pairs since factors enter as
    data). Gravity follows cosmo.fR0 exactly as in
    ops.nbody.pm_evolve (am2 = inf is bit-exact GR).
    """
    om0 = float(cosmo.Om0)
    if "x" not in mesh.shape or "y" not in mesh.shape:
        raise ValueError("mesh must carry the pencil axes ('x', 'y'); "
                         f"got {tuple(mesh.shape)}")
    part_axes = tuple(a for a in ("sim", "x", "y") if a in mesh.shape)
    extra = tuple(a for a in part_axes if a not in ("x", "y"))

    def body(comps, mom, factors, am2_edges):
        return pm_scan_body(comps, mom, factors, am2_edges,
                            ngrid=ngrid, boxsize=boxsize, om0=om0,
                            window=window, extra_axes=extra)

    row = P(part_axes)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=((row, row, row), (row, row, row), P(), P()),
        out_specs=((row, row, row), (row, row, row)),
    ))

    def evolve(comps, mom, a_init: float, a_final: float):
        factors = jnp.asarray(
            pm_step_factors(cosmo, a_init, a_final, nsteps,
                            spacing=spacing), jnp.float32)
        edges = _a_edges(a_init, a_final, nsteps, spacing)
        if float(getattr(cosmo, "fR0", 0.0)) != 0.0:
            am2 = np.asarray(edges ** 2 * np.asarray(
                cosmo.scalaron_mass2(edges), np.float64))
        else:
            am2 = np.full(nsteps + 1, np.inf)
        return fn(tuple(comps), tuple(mom),
                  factors, jnp.asarray(am2, jnp.float32))

    # the inner jitted program, for AOT inspection (collective-inventory
    # pinning) — `evolve` itself does host-side KDK-table precompute per
    # call and so cannot be traced by an outer jit
    evolve.sharded_fn = fn
    evolve.nsteps = nsteps
    return evolve
