"""Lens planes from particle snapshots: the snapshot -> lightcone bridge.

The reference could only consume maps that the Ray-Ramses Fortran code
produced on the fly during the simulation (rays/rayramses.py:69-150); a
plain particle snapshot could never be ray-traced. This module builds
flat-sky density-contrast planes directly from periodic-box particle
positions — replicating the box along the line of sight as the standard
box-stacking lightcone construction does — so ANY snapshot feeds
ops.raytrace.multiplane_raytrace / ops.lensing.born_convergence /
models.SkyArray.from_density_planes.

Geometry: observer at (cx, cy, 0) of the (replicated) box looking along
the `los` axis; a plane at comoving distance chi_i spans fov x fov
radians; particle angular positions use the minimum transverse image
(theta = min_image(x - cx)/chi). Thin-slab approximation: every particle
in [chi_i - dchi/2, chi_i + dchi/2) is projected with the mid-plane
distance.

Static shapes throughout: each plane paints the FULL particle set with an
in-slab weight (a mask, not a gather), so the builder jit-compiles once
and scans over planes.

Performance: on TPU at >= 2^20 particles with CONCRETE geometry the
builder auto-selects a single sorted Pallas deposit over
(plane, row, col) keys (probe-gated, same kernel as ops/paint): each
(particle, LOS-replica) pair lands in at most one plane, so the work is
O(n) instead of the scan's O(n * nplanes) scatter. Measured on the v5e
chip at 16.8M -> 16 x 512^2: 1.77 s vs 9.03 s for the per-plane scatter
scan (5.1x). Traced geometry or small n keeps the scan path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["density_planes_from_particles",
           "density_planes_from_particles_nrep"]


def _min_image(d, boxsize):
    return d - boxsize * jnp.round(d / boxsize)


def replica_ranges(boxsize, chi0, dchi, nplanes: int, fov):
    """(n_rep, k_lo, k_hi) from CONCRETE lightcone geometry — the ONE
    home of the replica derivations (shared by the local builder, the
    deposit path, and parallel/lensing.make_distributed_lens_planes).

    n_rep: transverse periodic-image count so the far plane's field of
      view is covered ((2*n_rep+1)^2 images).
    k_lo..k_hi: line-of-sight box replica indices covering
      [chi0 - dchi/2, chi0 + (nplanes - 1/2)*dchi).
    Raises TypeError on traced inputs (callers fall back / refuse).
    """
    import math

    chi_far = float(chi0) + float(dchi) * (nplanes - 1)
    half_need = float(fov) * chi_far / 2.0
    n_rep = max(0, int(-(-(half_need - float(boxsize) / 2.0)
                         // float(boxsize))))
    k_lo = math.floor((float(chi0) - 0.5 * float(dchi)) / float(boxsize))
    k_hi = math.floor((float(chi0) + (nplanes - 0.5) * float(dchi))
                      / float(boxsize))
    return n_rep, k_lo, k_hi


def density_planes_from_particles(pos, boxsize, chi0, dchi, nplanes: int,
                                  fov, npix: int, los: int = 2,
                                  observer_xy=None):
    """CIC-paint particles into lightcone density-contrast planes.

    Args:
      pos: comoving positions in a periodic box [Mpc/h] — EITHER an
        (n, 3) array (convenient at small n) or a (x, y, z) tuple of flat
        (n,) component buffers. At large n prefer the tuple: an (n, 3)
        device array pads its 3-wide minor dim to 128 lanes on this
        backend (42x memory — see CLAUDE.md / bench.py's flat-buffer
        pattern).
      boxsize: box side [Mpc/h].
      chi0: comoving distance of the FIRST plane center [Mpc/h].
      dchi: slab thickness [Mpc/h] (<= boxsize).
      nplanes: number of planes (centers chi_i = chi0 + i*dchi).
      fov: field of view [rad] (square).
      npix: plane resolution.
      los: box axis replicated along the line of sight.
      observer_xy: transverse observer position (2,) [Mpc/h]; defaults to
        the box center.

    Returns:
      (delta (nplanes, npix, npix), chis (nplanes,)): density contrast
      relative to the mean matter density (delta = Sigma/Sigma_bar - 1,
      with Sigma_bar from the box's mean density — empty cone pixels are
      -1, matching the convention born_convergence expects).

    Wide cones: once fov*chi exceeds the boxsize a single minimum image
    can no longer cover the field of view — outer pixels would silently
    stay empty (delta=-1). The transverse replica count is derived from
    the far-plane geometry on the host (static for jit) and the paint
    tiles (2*n_rep+1)^2 periodic images; with concrete geometry n_rep=0
    reduces to the plain minimum-image paint at no extra cost.
    """
    try:
        n_rep, _, _ = replica_ranges(boxsize, chi0, dchi, nplanes, fov)
    except TypeError:
        # traced geometry (called inside another jit): the replica count
        # cannot be derived from tracers. Refusing beats SILENTLY
        # reinstating the wide-cone empty-outer-pixel bug — callers with
        # traced fov/chi pass n_rep explicitly via
        # density_planes_from_particles_nrep.
        raise ValueError(
            "density_planes_from_particles: fov/chi/boxsize are traced, "
            "so the transverse replica count cannot be derived. Call "
            "density_planes_from_particles_nrep(..., n_rep=k) with k = "
            "ceil((fov*chi_far/2 - boxsize/2)/boxsize) computed from "
            "your concrete geometry (0 when fov*chi_far <= boxsize).")
    if dchi > boxsize:
        raise ValueError(
            f"dchi={dchi} exceeds boxsize={boxsize}: the periodic slab "
            "test `(z - lo) % boxsize < dchi` is then always true, so "
            "every particle paints ONCE per plane while the "
            "normalization expects dchi/boxsize periodic images — "
            "delta would be silently biased low. Use thinner planes "
            "(nplanes >= chi_far / boxsize).")
    return _density_planes_impl(pos, boxsize, chi0, dchi, nplanes, fov,
                                npix, los, observer_xy, n_rep)


def density_planes_from_particles_nrep(pos, boxsize, chi0, dchi,
                                       nplanes: int, fov, npix: int,
                                       los: int = 2, observer_xy=None,
                                       n_rep: int = 0):
    """Jit-friendly variant with an explicit transverse replica count
    (for callers whose geometry is traced; see
    density_planes_from_particles for the derivation of n_rep)."""
    return _density_planes_impl(pos, boxsize, chi0, dchi, nplanes, fov,
                                npix, los, observer_xy, n_rep)


def _split_components(pos, los: int):
    if isinstance(pos, (tuple, list)):
        comps = [jnp.asarray(c).reshape(-1) for c in pos]
    else:
        arr = jnp.asarray(pos)
        comps = [arr[:, 0], arr[:, 1], arr[:, 2]]
    t_axes = [a for a in range(3) if a != los]
    return comps[t_axes[0]], comps[t_axes[1]], comps[los]


def _normalize_counts(counts, chis, n_total, boxsize, dchi, fov,
                      npix: int):
    """counts -> density contrast: delta = counts/expect - 1, expect from
    the GLOBAL particle count (the distributed wrapper psums counts from
    particle shards and normalizes once with the global n)."""
    nbar = n_total / boxsize ** 3
    pix = fov / npix
    expect = nbar * dchi * (chis * pix) ** 2
    return counts / expect[:, None, None] - 1.0


@partial(jax.jit, static_argnames=("nplanes", "npix", "los", "n_rep"))
def _plane_counts_scan(pos, boxsize, chi0, dchi, nplanes: int, fov,
                       npix: int, los: int, observer_xy, n_rep: int,
                       weights=None):
    """Raw CIC-painted per-plane counts via the per-plane scatter scan.

    weights: optional (n,) per-particle weight (mass, or a 0/1 validity
    mask excluding the per-shard padding rows of the multihost loader —
    zero-position pads otherwise paint into whichever plane's slab wraps
    over z=0)."""
    x_t1, x_t2, x_los = _split_components(pos, los)
    cx = (boxsize / 2.0 if observer_xy is None else observer_xy[0])
    cy = (boxsize / 2.0 if observer_xy is None else observer_xy[1])
    z = x_los % boxsize
    chis = chi0 + dchi * jnp.arange(nplanes)

    def one_plane(chi_mid):
        lo = chi_mid - dchi / 2.0
        # periodic replication: particle is in the slab iff its los
        # coordinate modulo the box falls in [lo mod box, lo mod box+dchi)
        dz = (z - lo) % boxsize
        in_slab = dz < dchi
        d1 = _min_image(x_t1 - cx, boxsize)
        d2 = _min_image(x_t2 - cy, boxsize)
        pix = fov / npix
        grid = jnp.zeros((npix, npix))
        for r1 in range(-n_rep, n_rep + 1):
            for r2 in range(-n_rep, n_rep + 1):
                t1 = (d1 + r1 * boxsize) / chi_mid
                t2 = (d2 + r2 * boxsize) / chi_mid
                c1 = t1 / pix + npix / 2.0 - 0.5
                c2 = t2 / pix + npix / 2.0 - 0.5
                i0 = jnp.floor(c1).astype(jnp.int32)
                j0 = jnp.floor(c2).astype(jnp.int32)
                f1 = c1 - i0
                f2 = c2 - j0
                for di, wi in ((0, 1.0 - f1), (1, f1)):
                    for dj, wj in ((0, 1.0 - f2), (1, f2)):
                        ii = i0 + di
                        jj = j0 + dj
                        ok = (in_slab & (ii >= 0) & (ii < npix)
                              & (jj >= 0) & (jj < npix))
                        w = wi * wj if weights is None else \
                            wi * wj * weights
                        grid = grid.at[jnp.clip(ii, 0, npix - 1),
                                       jnp.clip(jj, 0, npix - 1)].add(
                            jnp.where(ok, w, 0.0))
        return grid

    def body(_, chi_mid):
        return None, one_plane(chi_mid)

    _, counts = jax.lax.scan(body, None, chis)
    return counts, chis


@partial(jax.jit, static_argnames=("nplanes", "npix", "los", "n_rep",
                                   "k_lo", "k_hi"))
def _plane_counts_deposit(pos, boxsize, chi0, dchi, nplanes: int, fov,
                          npix: int, los: int, observer_xy, n_rep: int,
                          k_lo: int, k_hi: int, weights=None):
    """Raw per-plane counts via ONE sorted Pallas deposit over
    (plane, row, col) keys — the upgrade path the scan docstring
    promises: O(n) instead of O(n * nplanes) work, and the deposit rides
    the MXU one-hot kernel instead of the serialized XLA scatter.

    k_lo..k_hi (static, from host geometry) are the line-of-sight box
    replica indices covering [chi0 - dchi/2, chi0 + (nplanes-1/2)*dchi);
    each (particle, k) lands in at most one plane.

    Memory: LOS replicas are deposited in GROUPS whose total key/weight
    entry count stays under _DEPOSIT_MAX_ENTRIES — one (key, w) pair
    sort per group. Deep lightcones (many k) cost extra group sorts,
    never extra resident HBM; a single-group geometry (the common case)
    keeps the one-sort fast path. The transverse-replica factor scales
    the per-k footprint; _density_planes_impl gates auto-selection on it.
    """
    from .paint_pallas import DEFAULT_WINDOW, deposit_flat

    x_t1, x_t2, x_los = _split_components(pos, los)
    cx = (boxsize / 2.0 if observer_xy is None else observer_xy[0])
    cy = (boxsize / 2.0 if observer_xy is None else observer_xy[1])
    z = x_los % boxsize
    chis = chi0 + dchi * jnp.arange(nplanes)
    pix = fov / npix
    d1 = _min_image(x_t1 - cx, boxsize)
    d2 = _min_image(x_t2 - cy, boxsize)

    n_real = nplanes * npix * npix
    win = min(DEFAULT_WINDOW, -(-(n_real + 1) // 128) * 128)
    n_pad = -(-(n_real + 1) // win) * win  # +1: junk cell for invalid
    junk = n_real

    n = x_t1.shape[0]
    per_k = (2 * n_rep + 1) ** 2 * 4 * n
    group = max(1, _DEPOSIT_MAX_ENTRIES // max(per_k, 1))

    flat = jnp.zeros((n_pad,), jnp.float32)
    keys, wts = [], []

    def flush():
        nonlocal flat, keys, wts
        if keys:
            flat = flat + deposit_flat(
                jnp.concatenate(keys),
                jnp.concatenate(wts).astype(jnp.float32), n_pad,
                window=win)
            keys, wts = [], []

    for nk, k in enumerate(range(k_lo, k_hi + 1)):
        if nk and nk % group == 0:
            flush()
        chi = z + k * boxsize
        pf = (chi - (chi0 - 0.5 * dchi)) / dchi
        p = jnp.floor(pf).astype(jnp.int32)
        in_cone = (p >= 0) & (p < nplanes)
        pc = jnp.clip(p, 0, nplanes - 1)
        chi_mid = chi0 + pc.astype(jnp.float32) * dchi
        for r1 in range(-n_rep, n_rep + 1):
            for r2 in range(-n_rep, n_rep + 1):
                c1 = (d1 + r1 * boxsize) / chi_mid / pix \
                    + npix / 2.0 - 0.5
                c2 = (d2 + r2 * boxsize) / chi_mid / pix \
                    + npix / 2.0 - 0.5
                i0 = jnp.floor(c1).astype(jnp.int32)
                j0 = jnp.floor(c2).astype(jnp.int32)
                f1 = c1 - i0
                f2 = c2 - j0
                for di, wi in ((0, 1.0 - f1), (1, f1)):
                    for dj, wj in ((0, 1.0 - f2), (1, f2)):
                        ii = i0 + di
                        jj = j0 + dj
                        ok = (in_cone & (ii >= 0) & (ii < npix)
                              & (jj >= 0) & (jj < npix))
                        keys.append(jnp.where(
                            ok, (pc * npix + jnp.clip(ii, 0, npix - 1))
                            * npix + jnp.clip(jj, 0, npix - 1), junk))
                        w = wi * wj if weights is None else \
                            wi * wj * weights
                        wts.append(jnp.where(ok, w, 0.0))
    flush()
    counts = flat[:n_real].reshape(nplanes, npix, npix)
    return counts, chis


# the Pallas deposit pays off once the scan's nplanes x n scatter work
# dominates its own sort: measured crossover ~1M particles (see
# tests/test_lens_planes.py timing note)
_DEPOSIT_MIN_N = 1 << 20
# per-k deposit footprint cap: (2*n_rep+1)^2 * 4 key/weight pairs of
# length n — 2^28 entries is ~2 GB of (i32, f32) pairs through the pair
# sort, safely inside the 16 GB chip for the bench-scale workloads.
# Wider transverse replication falls back to the O(n)-memory scan.
_DEPOSIT_MAX_ENTRIES = 1 << 28


def _deposit_eligible(n, n_rep: int) -> bool:
    """Shared auto-selection gate for the lens-plane deposit path
    (used here and by parallel.lensing.make_distributed_lens_planes)."""
    if jax.default_backend() != "tpu" or n < _DEPOSIT_MIN_N:
        return False
    if (2 * n_rep + 1) ** 2 * 4 * n > _DEPOSIT_MAX_ENTRIES:
        return False
    from .paint_pallas import pallas_deposit_available
    return pallas_deposit_available()


def _density_planes_impl(pos, boxsize, chi0, dchi, nplanes: int, fov,
                         npix: int, los: int, observer_xy, n_rep: int):
    if isinstance(pos, (tuple, list)):
        n = jnp.asarray(pos[0]).reshape(-1).shape[0]
    else:
        n = jnp.asarray(pos).shape[0]
    use_deposit = False
    k_lo = k_hi = 0
    try:
        # static LOS replica range from concrete geometry. Traced
        # geometry (float() raises) keeps the scatter-scan path — the
        # same concrete-geometry contract as the n_rep derivation in
        # density_planes_from_particles.
        _, k_lo, k_hi = replica_ranges(boxsize, chi0, dchi, nplanes, fov)
        use_deposit = _deposit_eligible(n, n_rep)
    except TypeError:
        use_deposit = False
    if use_deposit:
        counts, chis = _plane_counts_deposit(
            pos, boxsize, chi0, dchi, nplanes, fov, npix, los,
            observer_xy, n_rep, k_lo, k_hi)
    else:
        counts, chis = _plane_counts_scan(
            pos, boxsize, chi0, dchi, nplanes, fov, npix, los,
            observer_xy, n_rep)
    return _normalize_counts(counts, chis, n, boxsize, dchi, fov,
                             npix), chis
