"""Blocked O(N^2) pairwise-velocity estimators on device.

TPU-native replacement for the reference's numba kernel
(/root/reference/src/astrild/particles/hutils/mean_pairwise_velocity.py:122-173,
hard-capped at 50k objects) and the Cython variants
(particles/utils_cython/pairwise_velocity.pyx:32-313). Pairs are processed
in (B x B) tiles inside a lax.fori_loop: each tile evaluates all pair
vectors by broadcasting and reduces into distance bins with segment-sums —
no cap on catalog size, vmap-able over simulation batches.

Estimator (Yasini et al. 2018, arxiv:1812.04241 Eq. 6):
  v12(r) = sum_pairs (v_i - v_j) . q_ij / sum_pairs |q_ij|^2
  q_ij = [2 rhat_ij - phat_i (rhat_ij.phat_i) - phat_j (rhat_ij.phat_j)] / 2
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.geometry import angular_coordinate_in_lc, convert_vec_sph_to_cart

__all__ = ["mean_pairwise_velocity", "mean_pv_from_tv", "make_rsep",
           "make_rsep_uneven_bins", "pairwise_velocity_pdf",
           "pairwise_ksz_momentum"]


def make_rsep(binnr: int, binwidth: float):
    """Histogram bin centers (reference mean_pairwise_velocity.py:176-196)."""
    return jnp.linspace(0.0, (binnr - 1) * binwidth, binnr) + binwidth / 2.0


def make_rsep_uneven_bins(bin_edges):
    """Centers of arbitrary bin edges (mean_pairwise_velocity.py:198-203)."""
    bin_edges = jnp.asarray(bin_edges)
    return 0.5 * (bin_edges[1:] + bin_edges[:-1])


def _pad_blocks(arr, block):
    n = arr.shape[0]
    nb = (n + block - 1) // block
    pad = nb * block - n
    return jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1)), nb


def _pairwise_accumulate_tiles(pos_i, vel_i, hat_i, pos_j, vel_j, hat_j,
                               ia0, jb0, nbins: int, binwidth,
                               block: int = 256, n_valid_global=None,
                               valid_i=None, valid_j=None,
                               dedup: bool = True,
                               triangular: bool = False,
                               kind: str = "yasini"):
    """Yasini (or kSZ) accumulation over all pairs between two chunks.

    kind='yasini': v12 numerator/denominator (Eq. 6 weights).
    kind='ksz': the Hand+12 temperature estimator — vel_* column 0
    carries dT, nom = (dT_i - dT_j) c_ij, den = c_ij^2 with
    c_ij = rhat_ij.(hat_i + hat_j)/2. Both kinds are i<->j symmetric
    (all pair factors flip sign together), so the half-ring schedule's
    dedup=False full-cross steps stay legal.

    ia0/jb0 are the GLOBAL index offsets of the chunks; with dedup=True a
    pair counts only when its global i < global j (so ring-rotation
    schedules count each unordered pair exactly once); dedup=False counts
    every (i, j) pair once — valid for the half-ring schedule's
    full-cross steps because the Yasini pair terms are i<->j symmetric
    (rhat, q and vij all flip sign together). triangular=True skips the
    a > b tiles (self pairs, where i<j masks them fully). Used by
    parallel/pairwise.py.

    n_valid_global: number of REAL rows in the global concatenated
    catalog; rows with global index >= n_valid_global are padding and
    must not form pairs (padded zero rows otherwise land real nom/den
    in the |p_i| bin). Only correct when ALL padding sits at the global
    tail — for per-shard padding (the multihost striped loader) pass
    per-row validity masks valid_i/valid_j instead.
    """
    ni = pos_i.shape[0]
    nj = pos_j.shape[0]
    assert ni % block == 0 and nj % block == 0, \
        "chunk sizes must be multiples of block (pad before sharding)"
    nbi = ni // block
    nbj = nj // block

    def tile(carry, ab):
        nom, den = carry
        a, b = ab
        ia = ia0 + a * block + jnp.arange(block)
        jb = jb0 + b * block + jnp.arange(block)
        pi = jax.lax.dynamic_slice(pos_i, (a * block, 0), (block, 3))
        pj = jax.lax.dynamic_slice(pos_j, (b * block, 0), (block, 3))
        vi = jax.lax.dynamic_slice(vel_i, (a * block, 0), (block, 3))
        vj = jax.lax.dynamic_slice(vel_j, (b * block, 0), (block, 3))
        hi = jax.lax.dynamic_slice(hat_i, (a * block, 0), (block, 3))
        hj = jax.lax.dynamic_slice(hat_j, (b * block, 0), (block, 3))
        rij = pi[:, None, :] - pj[None, :, :]
        rnorm = jnp.linalg.norm(rij, axis=-1)
        rhat = rij / jnp.maximum(rnorm, 1e-12)[..., None]
        di = jnp.einsum("abk,ak->ab", rhat, hi)
        dj = jnp.einsum("abk,bk->ab", rhat, hj)
        if kind == "ksz":
            cij = 0.5 * (di + dj)
            nom_ij = (vi[:, 0][:, None] - vj[:, 0][None, :]) * cij
            den_ij = cij * cij
        else:
            q = (2.0 * rhat - hi[:, None, :] * di[..., None]
                 - hj[None, :, :] * dj[..., None]) * 0.5
            vij = vi[:, None, :] - vj[None, :, :]
            nom_ij = jnp.einsum("abk,abk->ab", vij, q)
            den_ij = jnp.einsum("abk,abk->ab", q, q)
        if dedup:
            mask = (ia[:, None] < jb[None, :])
        else:
            mask = jnp.ones((block, block), bool)
        if n_valid_global is not None:
            mask = (mask & (ia[:, None] < n_valid_global)
                    & (jb[None, :] < n_valid_global))
        if valid_i is not None:
            wi = jax.lax.dynamic_slice(valid_i, (a * block,), (block,)) > 0
            wj = jax.lax.dynamic_slice(valid_j, (b * block,), (block,)) > 0
            mask = mask & wi[:, None] & wj[None, :]
        binidx = jnp.clip((rnorm / binwidth).astype(jnp.int32), 0, nbins)
        # float->int32 of out-of-range values is undefined in XLA (can
        # yield INT_MIN, which the clip folds into bin 0) — guard BEFORE
        # trusting the cast, same as _pairwise_accumulate
        binidx = jnp.where(rnorm / binwidth < nbins, binidx, nbins)
        w = mask.astype(jnp.float32).reshape(-1)
        bflat = jnp.where(mask, binidx, nbins).reshape(-1)
        # one-hot MXU reduction (ops/binred): 20x segment_sum on TPU
        from .binred import masked_bin_reduce
        inc = masked_bin_reduce(
            jnp.stack([w * nom_ij.reshape(-1), w * den_ij.reshape(-1)]),
            bflat, nbins)
        nom = nom + inc[0]
        den = den + inc[1]
        return (nom, den), None

    pairs = [(a, b) for a in range(nbi) for b in range(nbj)
             if not triangular or a <= b]
    ab = jnp.array(pairs, jnp.int32)
    from ..utils.jax_compat import match_vma
    zero = match_vma(jnp.zeros((nbins,), jnp.float32), pos_i)
    (nom, den), _ = jax.lax.scan(tile, (zero, zero), (ab[:, 0], ab[:, 1]))
    return nom, den


@partial(jax.jit, static_argnames=("binnr", "block"))
def _pairwise_accumulate(pos, vel, n_valid, binnr: int, binwidth,
                         block: int = 512, edges=None):
    """Accumulate Yasini Eq. 6 numerator/denominator over all pairs i<j.

    edges=None bins by uniform binwidth (bin b covers [b*w, (b+1)*w));
    with an (binnr+1,) edges array pairs bin by searchsorted into the
    half-open intervals [edges[b], edges[b+1]) — the uneven-bin mode of
    the reference's Cython estimator (pairwise_velocity.pyx:32-161 +
    make_rsep_uneven_bins, mean_pairwise_velocity.py:198).

    Deviation from the reference: the Cython loop uses strictly OPEN
    intervals (dist_bins[b] < dist < dist_bins[b+1]), dropping pairs that
    land exactly on an edge; this half-open convention counts them.
    Measure-zero for float separations, but bit-parity comparisons against
    the Cython kernel can differ on exact-edge synthetic inputs.
    """
    posp, nb = _pad_blocks(pos.astype(jnp.float32), block)
    velp, _ = _pad_blocks(vel.astype(jnp.float32), block)
    npad = posp.shape[0]
    pnorm = jnp.linalg.norm(posp, axis=1, keepdims=True)
    phat = posp / jnp.maximum(pnorm, 1e-12)

    def tile(carry, ab):
        nom, den = carry
        a, b = ab
        ia = a * block + jnp.arange(block)
        jb = b * block + jnp.arange(block)
        pi = jax.lax.dynamic_slice(posp, (a * block, 0), (block, 3))
        pj = jax.lax.dynamic_slice(posp, (b * block, 0), (block, 3))
        vi = jax.lax.dynamic_slice(velp, (a * block, 0), (block, 3))
        vj = jax.lax.dynamic_slice(velp, (b * block, 0), (block, 3))
        hi = jax.lax.dynamic_slice(phat, (a * block, 0), (block, 3))
        hj = jax.lax.dynamic_slice(phat, (b * block, 0), (block, 3))
        rij = pi[:, None, :] - pj[None, :, :]              # (B, B, 3)
        rnorm = jnp.linalg.norm(rij, axis=-1)
        rhat = rij / jnp.maximum(rnorm, 1e-12)[..., None]
        di = jnp.einsum("abk,ak->ab", rhat, hi)
        dj = jnp.einsum("abk,bk->ab", rhat, hj)
        q = (2.0 * rhat - hi[:, None, :] * di[..., None]
             - hj[None, :, :] * dj[..., None]) * 0.5       # (B, B, 3)
        vij = vi[:, None, :] - vj[None, :, :]
        nom_ij = jnp.einsum("abk,abk->ab", vij, q)
        den_ij = jnp.einsum("abk,abk->ab", q, q)
        mask = ((ia[:, None] < jb[None, :])
                & (ia[:, None] < n_valid) & (jb[None, :] < n_valid))
        if edges is None:
            binidx = jnp.clip((rnorm / binwidth).astype(jnp.int32), 0, binnr)
            binidx = jnp.where(rnorm / binwidth < binnr, binidx, binnr)
        else:
            binidx = jnp.searchsorted(edges, rnorm, side="right") - 1
            binidx = jnp.where(
                (rnorm >= edges[0]) & (binidx >= 0) & (binidx < binnr),
                binidx, binnr)
        w = mask.astype(jnp.float32).reshape(-1)
        bflat = jnp.where(mask, binidx, binnr).reshape(-1)
        from .binred import masked_bin_reduce
        inc = masked_bin_reduce(
            jnp.stack([w * nom_ij.reshape(-1), w * den_ij.reshape(-1)]),
            bflat, binnr)
        nom = nom + inc[0]
        den = den + inc[1]
        return (nom, den), None

    # only upper-triangular block pairs (a <= b)
    pairs = [(a, b) for a in range(nb) for b in range(nb) if a <= b]
    ab = jnp.array(pairs, jnp.int32)
    (nom, den), _ = jax.lax.scan(tile,
                                 (jnp.zeros((binnr,)), jnp.zeros((binnr,))),
                                 (ab[:, 0], ab[:, 1]))
    return nom, den


def mean_pairwise_velocity(pos_cart, vel_cart, bins, n_valid=None,
                           block: int = 512, backend: str = "auto"):
    """Mean pairwise velocity estimate from cartesian velocities.

    Args:
      pos_cart: (n, 3) positions [Mpc/h] (lightcone frame, observer at 0).
      vel_cart: (n, 3) velocities [km/s] (use the transverse components for
        the Yasini estimator — see mean_pv_from_tv).
      bins: (binnr,) distance bin edges starting at 0 with uniform width
        (reference make_rsep convention), OR arbitrary ascending edges —
        non-uniform spacing is detected and pairs are binned into the
        half-open intervals [bins[b], bins[b+1]) (len(bins)-1 bins, the
        Cython estimator's uneven-bin mode, pairwise_velocity.pyx:32).
      n_valid: number of valid rows (for padded catalogs).
      backend: 'auto' (Pallas kernel on TPU, XLA scan elsewhere),
        'pallas', or 'xla'. The Pallas tile kernel is ~4x faster on-chip
        (see ops/pallas_pairwise.py). Uneven edges always take the XLA
        searchsorted path.

    Returns (rsep, v12): bin centers and the estimate (NaN on empty bins).
    """
    import numpy as np

    edges_np = np.asarray(bins, np.float64)
    diffs = np.diff(edges_np)
    if diffs.size and np.any(diffs <= 0):
        raise ValueError("bins must be strictly ascending")
    # The legacy make_rsep convention (len(bins) bins of uniform width
    # starting at 0) only applies when the edges actually look like it:
    # uniform spacing AND a zero first edge. Uniform edges with a nonzero
    # start (e.g. [5, 15, 25, 35]) are arbitrary-edge input and must take
    # the searchsorted path, not be silently reinterpreted.
    if diffs.size and (not np.allclose(diffs, diffs[0], rtol=1e-5, atol=1e-8)
                       or edges_np[0] != 0.0):
        binnr = edges_np.size - 1
        n = pos_cart.shape[0] if n_valid is None else n_valid
        nom, den = _pairwise_accumulate(
            pos_cart, vel_cart, n, binnr, 0.0, block=block,
            edges=jnp.asarray(edges_np, jnp.float32))
        v12 = jnp.where(den > 0, nom / jnp.maximum(den, 1e-30), jnp.nan)
        return make_rsep_uneven_bins(edges_np), v12
    binnr = int(bins.shape[0])
    binwidth = float(bins[1] - bins[0])
    n = pos_cart.shape[0] if n_valid is None else n_valid
    if backend == "auto" and jax.default_backend() == "tpu":
        # probe-gated (repo rule): a Mosaic lowering regression must
        # degrade to the XLA tile scan, not crash the pipeline
        from .pallas_pairwise import pallas_pairwise_available

        use_pallas = pallas_pairwise_available()
    else:
        use_pallas = backend == "pallas"
    if use_pallas:
        from .pallas_pairwise import pairwise_accumulate_pallas

        nom, den = pairwise_accumulate_pallas(pos_cart, vel_cart, n,
                                              binwidth, binnr)
    else:
        nom, den = _pairwise_accumulate(pos_cart, vel_cart, n, binnr,
                                        binwidth, block=block)
    v12 = jnp.where(den > 0, nom / jnp.maximum(den, 1e-30), jnp.nan)
    return make_rsep(binnr, binwidth), v12


@partial(jax.jit, static_argnames=("dist_bin", "vel_bin", "mode", "block"))
def pairwise_velocity_pdf(pos, vel, dist_bin: int, vel_bin: int,
                          mode: str = "radial", n_valid=None,
                          block: int = 512):
    """2D (separation, pairwise-velocity) histogram over all pairs i<j.

    Blocked-tile port of the Cython kernels
    (particles/utils_cython/pairwise_velocity.pyx:194-313), dropping their
    BallTree/prange machinery and 50k-scale limits:
      mode='z_sign' : v12 = (v2z - v1z) * sign(r2z - r1z)
      mode='radial' : v12 = (v2 - v1) . (r2 - r1) / |r12|
    Bin sizes are 1 Mpc/h in distance and 1 km/s in velocity with the
    velocity axis offset by vel_bin/2 (the reference's convention).

    Returns (dist_bin, vel_bin) pair counts.
    """
    n = pos.shape[0]
    n_valid = n if n_valid is None else n_valid
    posp, nb = _pad_blocks(pos.astype(jnp.float32), block)
    velp, _ = _pad_blocks(vel.astype(jnp.float32), block)
    offset = vel_bin // 2
    nbinstot = dist_bin * vel_bin

    def tile(carry, ab):
        counts = carry
        a, b = ab
        ia = a * block + jnp.arange(block)
        jb = b * block + jnp.arange(block)
        pi = jax.lax.dynamic_slice(posp, (a * block, 0), (block, 3))
        pj = jax.lax.dynamic_slice(posp, (b * block, 0), (block, 3))
        vi = jax.lax.dynamic_slice(velp, (a * block, 0), (block, 3))
        vj = jax.lax.dynamic_slice(velp, (b * block, 0), (block, 3))
        rij = pj[None, :, :] - pi[:, None, :]
        dist = jnp.linalg.norm(rij, axis=-1)
        dv = vj[None, :, :] - vi[:, None, :]
        if mode == "z_sign":
            v12 = dv[..., 2] * jnp.sign(rij[..., 2])
        else:
            v12 = jnp.einsum("abk,abk->ab", dv, rij) / jnp.maximum(dist,
                                                                   1e-12)
        db = dist.astype(jnp.int32)
        # floor, not trunc-toward-zero: v12+offset in (-1, 0) must REJECT
        # (the Cython reference tests the float before casting); a plain
        # int cast folds that range into velocity bin 0
        vb = jnp.floor(v12 + offset).astype(jnp.int32)
        ok = ((ia[:, None] < jb[None, :])
              & (ia[:, None] < n_valid) & (jb[None, :] < n_valid)
              & (db < dist_bin) & (vb >= 0) & (vb < vel_bin))
        flat = jnp.where(ok, db * vel_bin + vb, nbinstot)
        from .binred import masked_bin_reduce
        counts = counts + masked_bin_reduce(
            ok.astype(jnp.float32).reshape(1, -1), flat.reshape(-1),
            nbinstot)[0]
        return counts, None

    pairs = [(a, b) for a in range(nb) for b in range(nb) if a <= b]
    ab = jnp.array(pairs, jnp.int32)
    counts, _ = jax.lax.scan(tile, jnp.zeros((nbinstot,)),
                             (ab[:, 0], ab[:, 1]))
    return counts.reshape(dist_bin, vel_bin)


@partial(jax.jit, static_argnames=("binnr", "block"))
def _ksz_accumulate(pos, dT, n_valid, binnr: int, binwidth,
                    block: int = 512):
    """kSZ numerator/denominator via the SHARED tile accumulator
    (kind='ksz' — one home for the Hand+12 weights, used verbatim by the
    distributed half-ring path in parallel/pairwise.py). dT rides column
    0 of the velocity slot."""
    posp, _ = _pad_blocks(pos.astype(jnp.float32), block)
    npad = posp.shape[0]
    dTp = jnp.zeros((npad, 3), jnp.float32).at[:, 0].set(
        jnp.pad(dT.astype(jnp.float32), (0, npad - dT.shape[0])))
    pnorm = jnp.linalg.norm(posp, axis=1, keepdims=True)
    phat = posp / jnp.maximum(pnorm, 1e-12)
    return _pairwise_accumulate_tiles(
        posp, dTp, phat, posp, dTp, phat, 0, 0, binnr, binwidth, block,
        n_valid_global=n_valid, triangular=True, kind="ksz")


def pairwise_ksz_momentum(pos_cart, dT, bins, n_valid=None,
                          block: int = 512):
    """kSZ pairwise momentum estimator (Hand et al. 2012, arXiv:1203.4219
    Eq. 2; Ferreira et al. 1999):

        p_hat(r) = sum_pairs (dT_i - dT_j) c_ij / sum_pairs c_ij^2
        c_ij     = rhat_ij . (rhat_i + rhat_j) / 2

    With kSZ temperatures dT_i = -T0 v_i.rhat_i (tau assumed uniform),
    p_hat(r) -> -T0 v12(r): gravitational infall (v12 < 0) gives
    p_hat > 0. The estimator is the temperature-space sibling of the
    Yasini transverse-velocity estimator above
    (mean_pairwise_velocity.py:122-173) — the reference stack had only
    the velocity-space forms.

    Args:
      pos_cart: (n, 3) comoving positions, observer at the origin.
      dT: (n,) temperature offsets at the cluster positions [any unit].
      bins: distance bin edges starting at 0 with uniform width.

    Returns (rsep, p_hat): bin centers and the estimate (NaN empty bins).
    """
    binnr = int(bins.shape[0])
    binwidth = float(bins[1] - bins[0])
    pos_cart = jnp.asarray(pos_cart)
    dT = jnp.asarray(dT)
    n = pos_cart.shape[0] if n_valid is None else n_valid
    nom, den = _ksz_accumulate(pos_cart, dT, n, binnr, binwidth,
                               block=block)
    p = jnp.where(den > 0, nom / jnp.maximum(den, 1e-30), jnp.nan)
    return make_rsep(binnr, binwidth), p


def mean_pv_from_tv(pos_cart, vel_ang, bins, theta1=None, theta2=None,
                    block: int = 512):
    """Mean pairwise velocity from transverse (angular) velocities.

    Exact functional mirror of the reference entry point
    (mean_pairwise_velocity.py:16-118): angular velocities [vel_RA, vel_DEC]
    are embedded as a spherical vector [v_r=0, vel_ang0, vel_ang1] and
    rotated to cartesian with the (theta2, theta1) jacobian before the pair
    accumulation; with no angles given they derive from the lightcone
    positions shifted by 10 deg.
    """
    pos_cart = jnp.asarray(pos_cart)
    vel_ang = jnp.asarray(vel_ang)
    if theta1 is None:
        t1, t2 = angular_coordinate_in_lc(pos_cart, unit="rad")
        t1 = t1 + 10.0 * jnp.pi / 180.0
        t2 = t2 + 10.0 * jnp.pi / 180.0
    else:
        theta1 = jnp.asarray(theta1)
        theta2 = jnp.asarray(theta2)
        deg = jnp.max(theta1) > 2.0 * jnp.pi
        t1 = jnp.where(deg, jnp.deg2rad(theta1), theta1)
        t2 = jnp.where(deg, jnp.deg2rad(theta2), theta2)
    vel_sph = jnp.concatenate(
        [jnp.zeros((pos_cart.shape[0], 1)), vel_ang], axis=1)
    vel_cart = convert_vec_sph_to_cart(t2, t1, vel_sph)
    return mean_pairwise_velocity(pos_cart, vel_cart, bins, block=block)
