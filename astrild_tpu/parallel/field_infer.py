"""Distributed differentiable field-level inference over the device
mesh.

The full forward model — whitened field -> linear modes -> 2LPT ICs ->
KDK PM -> CIC overdensity -> Gaussian posterior — runs as ONE shard_map
program over the pencil axes ('x', 'y'): the white field and data are
sharded P('x','y',None), every FFT is the pencil FFT (parallel.pfft),
the PM scan is the SAME `parallel.nbody.pm_scan_body` the distributed
evolver uses, and `jax.grad` differentiates straight through the
shard_map (psum/psum_scatter/all_to_all all carry transpose rules), so
the gradient comes back sharded exactly like the white field. This is
the multi-chip form of ops.field_infer — BORG-style initial-condition
reconstruction at mesh scale, which the reference's externally-driven
Fortran forward models could not express on any number of ranks.

Numerical contract: bit-compatible conventions with the local chain
(ops.mocks.modes_from_white amplitudes, ops.nbody 2LPT/KDK operators,
Nyquist-masked spectral gradients); tests pin the sharded loss AND
gradient against the single-device ops.field_infer values.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.field_infer import _gauss_posterior, _host_consts
from ..ops.paint import paint as paint_single
from .nbody import pm_scan_body
from .pfft import local_kvecs, pfft3d_local, pifft3d_local
from .power import local_mode_numbers

__all__ = ["make_distributed_field_infer"]


def _local_modes_from_white(white_block, ngrid: int, boxsize,
                            pk_fn: Callable, ax: str, ay: str):
    """Pencil twin of mocks.modes_from_white: (n/PX, n/PY, n) white ->
    TRANSPOSED_OUT (n, n/PX, n/PY) linear modes (unnormalized fftn
    convention, identical amplitudes)."""
    wk = pfft3d_local(white_block, ax, ay)
    mi, mj, mk = local_mode_numbers(ngrid, ax, ay)
    m2 = mi ** 2 + mj ** 2 + mk ** 2
    kf = 2.0 * jnp.pi / boxsize
    p = pk_fn(jnp.maximum(jnp.sqrt(m2), 1e-6) * kf)
    p = jnp.where(m2 == 0.0, 0.0, p)
    amp = jnp.sqrt(p / boxsize ** 3) * float(ngrid) ** 3
    return wk / float(ngrid) ** 1.5 * amp


def _local_grad_invlap(field_k, ngrid: int, boxsize, sign: float,
                       ax: str, ay: str):
    """Pencil twin of ops.nbody._grad_invlap: TRANSPOSED_OUT field_k ->
    3 real displacement blocks, each (n/PX, n/PY, n)."""
    ki, kj, kk = local_kvecs(ngrid, boxsize, ax, ay)
    k2 = ki ** 2 + kj ** 2 + kk ** 2
    k2safe = jnp.where(k2 == 0.0, 1.0, k2)
    phi_k = jnp.where(k2 == 0.0, 0.0, -field_k / k2safe)
    mi, mj, mk = local_mode_numbers(ngrid, ax, ay)
    half = ngrid // 2
    comps = []
    for kv, m in ((ki, mi), (kj, mj), (kk, mk)):
        mask = (jnp.abs(m) != half).astype(jnp.float32)
        comps.append(jnp.real(pifft3d_local(
            jnp.asarray(sign) * 1j * kv * mask * phi_k, ax, ay)))
    return comps


def _local_second_order_source(dk, ngrid: int, boxsize, ax: str,
                               ay: str):
    """Pencil twin of ops.nbody._second_order_source (real S2 block)."""
    ki, kj, kk = local_kvecs(ngrid, boxsize, ax, ay)
    k2 = ki ** 2 + kj ** 2 + kk ** 2
    k2safe = jnp.where(k2 == 0.0, 1.0, k2)
    t = jnp.where(k2 == 0.0, 0.0, dk / k2safe)

    def d2(a, b):
        return jnp.real(pifft3d_local(a * b * t, ax, ay))

    dxx, dyy, dzz = d2(ki, ki), d2(kj, kj), d2(kk, kk)
    dxy, dxz, dyz = d2(ki, kj), d2(ki, kk), d2(kj, kk)
    return (dxx * dyy + dxx * dzz + dyy * dzz
            - dxy ** 2 - dxz ** 2 - dyz ** 2)


def _local_lattice(ngrid: int, boxsize, ax: str, ay: str):
    """Lattice site coordinates for THIS shard's (n/PX, n/PY, n) block
    (axis 0 = i-chunk owned by the x-index, axis 1 = j-chunk by y)."""
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    xi = jax.lax.axis_index(ax)
    yi = jax.lax.axis_index(ay)
    cell = boxsize / ngrid
    ni, nj = ngrid // px, ngrid // py
    ii = (xi * ni + jnp.arange(ni, dtype=jnp.float32) + 0.5) * cell
    jj = (yi * nj + jnp.arange(nj, dtype=jnp.float32) + 0.5) * cell
    kk = (jnp.arange(ngrid, dtype=jnp.float32) + 0.5) * cell
    gx = jnp.broadcast_to(ii[:, None, None], (ni, nj, ngrid))
    gy = jnp.broadcast_to(jj[None, :, None], (ni, nj, ngrid))
    gz = jnp.broadcast_to(kk[None, None, :], (ni, nj, ngrid))
    return gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)


def make_distributed_field_infer(mesh: Mesh, ngrid: int, boxsize,
                                 pk_fn: Callable, cosmo, *,
                                 z_init: float = 9.0, nsteps: int = 3,
                                 a_final: float = 1.0,
                                 window: str = "cic", order: int = 2,
                                 ax: str = "x", ay: str = "y"):
    """Build the sharded forward model and its differentiable posterior.

    Returns an object with three jitted callables:
      simulate(white)                -> delta, both P(ax, ay, None)
      loss(white, data, noise_var)   -> replicated scalar
      value_and_grad(white, data, noise_var) -> (scalar, grad) with the
        gradient sharded like `white`.

    white/data are GLOBAL (ngrid, ngrid, ngrid) arrays sharded
    P(ax, ay, None). Any extra mesh axes (e.g. 'sim') see replicated
    work. Cosmology host-precompute happens once, at factory time.
    """
    if window == "ngp":
        raise ValueError("NGP has zero gradient a.e.; use cic or tsc")
    if ax not in mesh.shape or ay not in mesh.shape:
        raise ValueError(f"mesh must carry axes ({ax!r}, {ay!r}); "
                         f"got {tuple(mesh.shape)}")
    growth, factors, am2, om0 = _host_consts(cosmo, z_init, a_final,
                                             nsteps, order)
    d1, f1, d2g, f2, e_init = growth
    a0 = 1.0 / (1.0 + z_init)
    factors = jnp.asarray(factors)
    am2 = jnp.asarray(am2)

    def sim_body(white_block):
        dk = _local_modes_from_white(white_block, ngrid, boxsize, pk_fn,
                                     ax, ay)
        psi1 = _local_grad_invlap(dk, ngrid, boxsize, -1.0, ax, ay)
        s2 = _local_second_order_source(dk, ngrid, boxsize, ax, ay)
        psi2 = _local_grad_invlap(pfft3d_local(s2, ax, ay), ngrid,
                                  boxsize, +1.0, ax, ay)
        q = _local_lattice(ngrid, boxsize, ax, ay)
        comps = tuple(
            ((q[i] + (d1 * psi1[i] + d2g * psi2[i]).reshape(-1))
             % boxsize).astype(jnp.float32) for i in range(3))
        mom = tuple(
            ((a0 * a0 * e_init)
             * (f1 * d1 * psi1[i] + f2 * d2g * psi2[i]).reshape(-1)
             ).astype(jnp.float32) for i in range(3))
        comps, _ = pm_scan_body(comps, mom, factors, am2, ngrid=ngrid,
                                boxsize=boxsize, om0=om0, window=window,
                                ax=ax, ay=ay, deposit="scatter")
        # final density: local paint, reduce + re-pencil to the white
        # field's own P(ax, ay, None) sharding
        grid = paint_single(comps, ngrid, boxsize, window=window,
                            deposit="scatter")
        if jax.lax.axis_size(ax) > 1:
            grid = jax.lax.psum_scatter(grid, ax, scatter_dimension=0,
                                        tiled=True)
        if jax.lax.axis_size(ay) > 1:
            grid = jax.lax.psum_scatter(grid, ay, scatter_dimension=1,
                                        tiled=True)
        gmean = jax.lax.psum(jnp.sum(grid), (ax, ay)) \
            / float(ngrid) ** 3
        return grid / jnp.where(gmean == 0, 1.0, gmean) - 1.0

    def loss_body(white_block, data_block, noise_var):
        delta = sim_body(white_block)
        # _gauss_posterior on the local blocks + psum = the global sum
        local = _gauss_posterior(delta, data_block, noise_var,
                                 white_block)
        return jax.lax.psum(local, (ax, ay))

    spec = P(ax, ay, None)
    simulate = jax.jit(jax.shard_map(
        sim_body, mesh=mesh, in_specs=(spec,), out_specs=spec))
    loss = jax.jit(jax.shard_map(
        loss_body, mesh=mesh, in_specs=(spec, spec, P()),
        out_specs=P()))

    _loss_for_grad = jax.shard_map(
        loss_body, mesh=mesh, in_specs=(spec, spec, P()), out_specs=P())
    value_and_grad = jax.jit(jax.value_and_grad(_loss_for_grad))

    class _FieldInfer:
        pass

    out = _FieldInfer()
    out.simulate = simulate
    out.loss = loss
    out.value_and_grad = value_and_grad
    return out
