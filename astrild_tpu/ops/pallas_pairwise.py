"""Pallas TPU kernel for the blocked pairwise-velocity accumulation.

TPU counterpart of the reference's compiled pair loops
(/root/reference/src/astrild/particles/utils_cython/pairwise_velocity.pyx:32,194,259
and the numba thread pool in hutils/mean_pairwise_velocity.py:81-97,
which hard-caps N at 50k); this kernel has no cap.

The hot O(N^2) loop of the Yasini+18 estimator (see ops/pairwise.py for
the XLA scan version and the estimator math): the pair space is tiled
(B x B); each grid step loads two B-particle tiles into VMEM, evaluates
all pair terms on the VPU, reduces them into distance bins, and
accumulates into a single output block revisited across the whole grid
(constant output index_map; TPU grid steps are sequential, so the
accumulation is race-free).

Runs compiled on TPU; everywhere else (CPU test mesh) it runs in
interpreter mode — toggled automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pairwise_accumulate_pallas", "pallas_pairwise_available"]

_NBINS_PAD = 128  # one lane row of output per quantity


def _kernel(nvalid_ref, binw_ref, pos_i, vel_i, hat_i, pos_j, vel_j, hat_j,
            out_ref, *, block: int, nbins: int):
    a = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(jnp.logical_and(a == 0, b == 0))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    n_valid = nvalid_ref[0]
    binwidth = binw_ref[0]

    def comp(ref, c):
        return ref[:, c]

    # pair separation components (B, B)
    rx = pos_i[:, 0][:, None] - pos_j[:, 0][None, :]
    ry = pos_i[:, 1][:, None] - pos_j[:, 1][None, :]
    rz = pos_i[:, 2][:, None] - pos_j[:, 2][None, :]
    dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    inv = 1.0 / jnp.maximum(dist, 1e-12)
    ux, uy, uz = rx * inv, ry * inv, rz * inv
    # q_ij = [2 rhat - hi (rhat.hi) - hj (rhat.hj)] / 2
    di = (ux * hat_i[:, 0][:, None] + uy * hat_i[:, 1][:, None]
          + uz * hat_i[:, 2][:, None])
    dj = (ux * hat_j[:, 0][None, :] + uy * hat_j[:, 1][None, :]
          + uz * hat_j[:, 2][None, :])
    qx = 0.5 * (2.0 * ux - hat_i[:, 0][:, None] * di
                - hat_j[:, 0][None, :] * dj)
    qy = 0.5 * (2.0 * uy - hat_i[:, 1][:, None] * di
                - hat_j[:, 1][None, :] * dj)
    qz = 0.5 * (2.0 * uz - hat_i[:, 2][:, None] * di
                - hat_j[:, 2][None, :] * dj)
    vx = vel_i[:, 0][:, None] - vel_j[:, 0][None, :]
    vy = vel_i[:, 1][:, None] - vel_j[:, 1][None, :]
    vz = vel_i[:, 2][:, None] - vel_j[:, 2][None, :]
    nom = vx * qx + vy * qy + vz * qz
    den = qx * qx + qy * qy + qz * qz

    ia = a * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    jb = b * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    valid = (ia < jb) & (ia < n_valid) & (jb < n_valid)
    binidx = (dist / binwidth).astype(jnp.int32)
    valid = valid & (binidx < nbins)
    nomv = jnp.where(valid, nom, 0.0)
    denv = jnp.where(valid, den, 0.0)

    # reduce the (B, B) tile into bins: fori_loop over bins (an unrolled
    # loop blows the VMEM liveness budget), placing each scalar with a
    # lane mask (Mosaic has no scatter)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, _NBINS_PAD), 1)

    def bin_body(r, rows):
        nom_row, den_row = rows
        sel = binidx == r
        s_nom = jnp.sum(jnp.where(sel, nomv, 0.0))
        s_den = jnp.sum(jnp.where(sel, denv, 0.0))
        lane = col == r
        return (nom_row + jnp.where(lane, s_nom, 0.0),
                den_row + jnp.where(lane, s_den, 0.0))

    nom_row, den_row = jax.lax.fori_loop(
        0, nbins, bin_body,
        (jnp.zeros((1, _NBINS_PAD), jnp.float32),
         jnp.zeros((1, _NBINS_PAD), jnp.float32)))
    out_ref[:, :] = out_ref[:, :] + jnp.concatenate([nom_row, den_row],
                                                    axis=0)


@functools.partial(jax.jit, static_argnames=("nbins", "block", "interpret"))
def pairwise_accumulate_pallas(pos, vel, n_valid, binwidth, nbins: int,
                               block: int = 64,
                               interpret: bool | None = None):
    """Yasini Eq. 6 numerator/denominator per distance bin, via Pallas.

    pos/vel: (n, 3) float32 (n padded to a multiple of `block` here).
    Returns (nom, den) of shape (nbins,).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert nbins <= _NBINS_PAD
    n = pos.shape[0]
    nb = (n + block - 1) // block
    pad = nb * block - n
    posp = jnp.pad(pos.astype(jnp.float32), ((0, pad), (0, 0)))
    velp = jnp.pad(vel.astype(jnp.float32), ((0, pad), (0, 0)))
    norm = jnp.linalg.norm(posp, axis=1, keepdims=True)
    hatp = posp / jnp.maximum(norm, 1e-12)

    kern = functools.partial(_kernel, block=block, nbins=nbins)
    vm = pltpu.VMEM if not interpret else None
    tile = lambda idx: pl.BlockSpec((block, 3), idx,
                                    memory_space=vm) if vm else \
        pl.BlockSpec((block, 3), idx)
    sm = (pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret
          else pl.BlockSpec(memory_space=pl.ANY))
    out = pl.pallas_call(
        kern,
        grid=(nb, nb),
        in_specs=[
            sm,
            sm,
            tile(lambda a, b: (a, 0)),
            tile(lambda a, b: (a, 0)),
            tile(lambda a, b: (a, 0)),
            tile(lambda a, b: (b, 0)),
            tile(lambda a, b: (b, 0)),
            tile(lambda a, b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((2, _NBINS_PAD), lambda a, b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, _NBINS_PAD), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(jnp.full((1,), n_valid, jnp.int32),
      jnp.full((1,), binwidth, jnp.float32),
      posp, velp, hatp, posp, velp, hatp)
    return out[0, :nbins], out[1, :nbins]


@functools.cache
def pallas_pairwise_available() -> bool:
    """Probe-compile the pairwise kernel (repo rule: every auto-selected
    Pallas path must consult a gate so a Mosaic lowering regression —
    libtpu updates move the supported-op set — degrades to the XLA tile
    scan instead of crashing pipelines; see paint_pallas for the
    trace-state caveats the probe runner handles)."""
    from .paint_pallas import _probe_outside_trace

    def body():
        import numpy as np

        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.uniform(100.0, 200.0, (128, 3)), jnp.float32)
        vel = jnp.asarray(rng.normal(0, 100.0, (128, 3)), jnp.float32)
        nom, den = pairwise_accumulate_pallas(pos, vel, 128, 20.0, 8)
        jax.block_until_ready(den)
        return bool(jnp.sum(den) > 0)

    return _probe_outside_trace(body)
