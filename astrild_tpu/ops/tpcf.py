"""Two-point correlation functions: real-space, redshift-space s-mu,
multipoles — blocked pair counting with periodic minimum image.

TPU-native replacement for the reference's halotools usage
(/root/reference/src/astrild/particles/hutils/tpcf.py:18-105): the
real->redshift-space mapping is ported exactly; pair counts run as (B x B)
tiles (same scheme as ops/pairwise.py); the random term uses the analytic
periodic-box expectation (exact for periodic data, replacing Landy-Szalay
randoms).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "to_redshift_space", "pair_counts_s_mu", "tpcf_s_mu", "tpcf_real",
    "tpcf_multipoles", "pair_counts_rp_pi", "projected_tpcf",
]


def to_redshift_space(pos, vel, boxsize, los: int = 2):
    """Real -> redshift-space positions: s = x + v_los/(100) [Mpc/h].

    Mirrors the reference (tpcf.py:73-94): velocity in km/s divided by
    100 km/s/(Mpc/h) (aH at z=0 in h-units), periodic wrap.
    """
    pos = jnp.asarray(pos)  # host catalogs arrive as numpy
    vel = jnp.asarray(vel)
    shift = vel[:, los] / 100.0
    pos_s = pos.at[:, los].add(shift)
    return pos_s % boxsize


def _min_image(d, boxsize):
    return d - boxsize * jnp.round(d / boxsize)


@partial(jax.jit, static_argnames=("ns", "nmu", "block", "los"))
def pair_counts_s_mu(pos, boxsize, s_edges, ns: int, nmu: int = 20,
                     los: int = 2, n_valid=None, block: int = 512):
    """DD(s, mu) pair counts (i<j) with periodic minimum image.

    mu = |s_parallel| / s along the `los` axis. pos is an (n, 3) array
    or a tuple of flat (x, y, z) components (preferred at large n —
    CLAUDE.md minor-dim padding). Returns (ns, nmu) counts. Delegates to
    the shared tile accumulator (one home with parallel/tpcf.py).
    """
    if isinstance(pos, (tuple, list)):
        comps = tuple(jnp.asarray(c).reshape(-1).astype(jnp.float32)
                      for c in pos)
    else:
        arr = jnp.asarray(pos).astype(jnp.float32)
        comps = (arr[:, 0], arr[:, 1], arr[:, 2])
    n = comps[0].shape[0]
    n_valid = n if n_valid is None else n_valid
    nb = (n + block - 1) // block
    pad = nb * block - n
    comps = tuple(jnp.pad(c, (0, pad)) for c in comps)
    counts = _s_mu_accumulate_tiles(
        comps, comps, 0, 0, s_edges, ns, nmu, los, boxsize, block=block,
        n_valid_global=n_valid, dedup=True, triangular=True)
    return counts.reshape(ns, nmu)


def _check_halfbox(s_edges, boxsize):
    """The analytic periodic RR is only exact up to the half-box
    (min-image shells are cube-clipped beyond it) — shared guard for the
    local estimator and parallel/tpcf.py."""
    import numpy as np

    smax_edge = float(np.asarray(s_edges)[-1])
    if smax_edge > float(boxsize) / 2.0 + 1e-9:
        raise ValueError(
            f"tpcf: s_edges[-1]={smax_edge} exceeds boxsize/2="
            f"{float(boxsize) / 2.0}; the analytic periodic RR is only "
            "exact up to the half-box (min-image shells are cube-clipped "
            "beyond it)")


def _s_mu_accumulate_tiles(pos_i, pos_j, ia0, jb0, s_edges, ns: int,
                           nmu: int, los: int, boxsize,
                           block: int = 512, n_valid_global=None,
                           valid_i=None, valid_j=None,
                           dedup: bool = True,
                           triangular: bool = False,
                           coords: str = "s_mu", pi_max=None):
    """DD(s, mu) accumulation over all pairs between two chunks.

    ia0/jb0 are the GLOBAL index offsets of the chunks; with dedup=True a
    pair counts only when its global i < global j, so ring-rotation
    schedules (parallel/tpcf.py) count each unordered pair exactly once —
    the same contract as ops.pairwise._pairwise_accumulate_tiles.
    dedup=False counts every (i, j) pair once (the half-ring schedule's
    full-cross steps, where the two chunks are disjoint by construction
    and each unordered shard pair is visited from one side only).

    Padding exclusion, two forms (same caveats as pairwise):
    n_valid_global masks rows by global index (all padding at the global
    tail); valid_i/valid_j are per-row 0/1 masks for per-shard padding
    (the multihost striped loader).

    The per-bin accumulation is Kahan-compensated: plain f32 adds stop
    counting once a bin's total passes ~2^24x the tile increments, a
    systematic DD deficit at the large-N scales the distributed
    estimator exists for.
    """
    def _comps(p):
        # component tuples avoid a resident (n, 3) array (which pads its
        # 3-wide minor dim to 128 lanes at large n — CLAUDE.md); the
        # per-tile (block, 3) stacks below are small temporaries
        if isinstance(p, (tuple, list)):
            return tuple(jnp.asarray(c).reshape(-1) for c in p)
        arr = jnp.asarray(p)
        return arr[:, 0], arr[:, 1], arr[:, 2]

    ci = _comps(pos_i)
    cj = _comps(pos_j)
    ni = ci[0].shape[0]
    nj = cj[0].shape[0]
    assert ni % block == 0 and nj % block == 0, \
        "chunk sizes must be multiples of block (pad before sharding)"
    nbi = ni // block
    nbj = nj // block
    smin = s_edges[0]
    smax = s_edges[-1]

    def tile(carry, ab):
        counts, comp = carry
        a, b = ab
        ia = ia0 + a * block + jnp.arange(block)
        jb = jb0 + b * block + jnp.arange(block)
        pi = jnp.stack([jax.lax.dynamic_slice_in_dim(c, a * block, block)
                        for c in ci], axis=-1)
        pj = jnp.stack([jax.lax.dynamic_slice_in_dim(c, b * block, block)
                        for c in cj], axis=-1)
        d = _min_image(pi[:, None, :] - pj[None, :, :], boxsize)
        s = jnp.linalg.norm(d, axis=-1)
        spar = jnp.abs(d[..., los])
        if coords == "rp_pi":
            # transverse/parallel split: s_edges bin rp, nmu bins |pi|
            rp = jnp.sqrt(jnp.maximum(s ** 2 - spar ** 2, 0.0))
            sbin = jnp.clip(
                jnp.searchsorted(s_edges, rp, side="right") - 1, 0,
                ns - 1)
            mubin = jnp.clip((spar / pi_max * nmu).astype(jnp.int32), 0,
                             nmu - 1)
            mask = (rp >= smin) & (rp < smax) & (spar < pi_max)
        else:
            mu = spar / jnp.maximum(s, 1e-12)
            sbin = jnp.clip(
                jnp.searchsorted(s_edges, s, side="right") - 1, 0,
                ns - 1)
            mubin = jnp.clip((mu * nmu).astype(jnp.int32), 0, nmu - 1)
            mask = (s >= smin) & (s < smax)
        if dedup:
            mask = mask & (ia[:, None] < jb[None, :])
        if n_valid_global is not None:
            mask = mask & (ia[:, None] < n_valid_global) \
                & (jb[None, :] < n_valid_global)
        if valid_i is not None:
            vi = jax.lax.dynamic_slice(valid_i, (a * block,), (block,))
            vj = jax.lax.dynamic_slice(valid_j, (b * block,), (block,))
            mask = mask & (vi[:, None] > 0) & (vj[None, :] > 0)
        flat = jnp.where(mask, sbin * nmu + mubin, ns * nmu)
        w = mask.astype(jnp.float32)
        # one-hot MXU reduction (ops/binred): 20x the sort-lowered
        # segment_sum on TPU at identical results
        from .binred import masked_bin_reduce
        inc = masked_bin_reduce(w.reshape(1, -1), flat.reshape(-1),
                                ns * nmu)[0]
        # Kahan step: the per-tile increment is exact (<= block^2 < 2^24)
        y = inc - comp
        t = counts + y
        comp = (t - counts) - y
        return (t, comp), None

    # triangular=True (self pairs, ia0 == jb0): tiles with a > b are
    # fully i<j-masked, so skip them — half the tile work
    pairs = [(a, b) for a in range(nbi) for b in range(nbj)
             if not triangular or a <= b]
    ab = jnp.array(pairs, jnp.int32)
    zero = jnp.zeros((ns * nmu,), jnp.float32)
    from ..utils.jax_compat import match_vma
    zero = match_vma(zero, ci[0])
    (counts, _), _ = jax.lax.scan(tile, (zero, zero),
                                  (ab[:, 0], ab[:, 1]))
    return counts


def tpcf_s_mu(pos, boxsize, s_edges, nmu: int = 20, los: int = 2,
              n_valid=None, block: int = 512):
    """Redshift-space xi(s, mu) with analytic periodic randoms.

    xi = DD/RR - 1, RR(s-bin, mu-bin) = Npairs * V_shell * dmu / V_box
    (exact for a periodic box; replaces halotools s_mu_tpcf Landy-Szalay,
    reference tpcf.py:96-105).

    Valid for s_edges[-1] <= boxsize/2: beyond the half-box the
    minimum-image shell is clipped by the cube and the spherical-shell
    RR over-counts (anisotropically), silently biasing xi negative.
    """
    _check_halfbox(s_edges, boxsize)
    ns = int(s_edges.shape[0]) - 1
    if n_valid is not None:
        n = n_valid
    elif isinstance(pos, (tuple, list)):
        n = jnp.asarray(pos[0]).reshape(-1).shape[0]
    else:
        n = pos.shape[0]
    dd = pair_counts_s_mu(pos, boxsize, s_edges, ns, nmu=nmu, los=los,
                          n_valid=n_valid, block=block)
    vshell = 4.0 / 3.0 * jnp.pi * (s_edges[1:] ** 3 - s_edges[:-1] ** 3)
    npairs = n * (n - 1) / 2.0
    rr = npairs * vshell[:, None] * (1.0 / nmu) / boxsize ** 3
    xi = jnp.where(rr > 0, dd / jnp.maximum(rr, 1e-30) - 1.0, jnp.nan)
    s_centers = 0.5 * (s_edges[1:] + s_edges[:-1])
    mu_centers = (jnp.arange(nmu) + 0.5) / nmu
    return s_centers, mu_centers, xi


def tpcf_real(pos, boxsize, r_edges, n_valid=None, block: int = 512):
    """Real-space xi(r) (periodic natural estimator).

    Replaces the halotools tpcf call the reference left commented out
    (stats_rockstar.py:107-128).
    """
    s, mu, xi = tpcf_s_mu(pos, boxsize, r_edges, nmu=1, n_valid=n_valid,
                          block=block)
    return s, xi[:, 0]


def _legendre(ell: int, mu):
    from .power import _legendre_even  # single home for the coefficients

    return _legendre_even(ell, jnp.asarray(mu) ** 2)


def tpcf_multipoles(xi_s_mu, ell: int):
    """xi_ell(s) = (2 ell + 1) * mean_mu [xi(s, mu) L_ell(mu)].

    mu is folded to [0, 1] (pair counts use |mu|), which is exact for even
    multipoles. Equivalent of halotools tpcf_multipole (reference call
    sites commented at particles/halo.py:274-340).
    """
    nmu = xi_s_mu.shape[-1]
    mu = (jnp.arange(nmu) + 0.5) / nmu
    w = _legendre(ell, mu)
    return (2 * ell + 1) * jnp.mean(xi_s_mu * w[None, :], axis=-1)


@partial(jax.jit, static_argnames=("ns", "n_pi", "block", "los"))
def pair_counts_rp_pi(pos, boxsize, rp_edges, ns: int, n_pi: int,
                      pi_max, los: int = 2, n_valid=None,
                      block: int = 512):
    """DD(rp, |pi|) pair counts (i<j), periodic minimum image.

    rp is the transverse separation, pi the |LOS| separation binned
    linearly in [0, pi_max). Same tile accumulator as pair_counts_s_mu
    (coords='rp_pi'). Returns (ns, n_pi) counts.
    """
    if isinstance(pos, (tuple, list)):
        comps = tuple(jnp.asarray(c).reshape(-1).astype(jnp.float32)
                      for c in pos)
    else:
        arr = jnp.asarray(pos).astype(jnp.float32)
        comps = (arr[:, 0], arr[:, 1], arr[:, 2])
    n = comps[0].shape[0]
    n_valid = n if n_valid is None else n_valid
    nb = (n + block - 1) // block
    pad = nb * block - n
    comps = tuple(jnp.pad(c, (0, pad)) for c in comps)
    counts = _s_mu_accumulate_tiles(
        comps, comps, 0, 0, rp_edges, ns, n_pi, los, boxsize,
        block=block, n_valid_global=n_valid, dedup=True, triangular=True,
        coords="rp_pi", pi_max=pi_max)
    return counts.reshape(ns, n_pi)


def _wp_from_counts(dd, n, rp_edges, pi_max, n_pi, boxsize):
    """Analytic cylindrical RR -> xi(rp, pi) -> wp. ONE home shared by
    the local estimator and parallel/tpcf.py (duplicated binning paths
    have bitten this repo before — CLAUDE.md)."""
    dpi = pi_max / n_pi
    area = jnp.pi * (rp_edges[1:] ** 2 - rp_edges[:-1] ** 2)
    npairs = n * (n - 1.0) / 2.0
    rr = npairs * area[:, None] * (2.0 * dpi) / boxsize ** 3
    xi = jnp.where(rr > 0, dd / jnp.maximum(rr, 1e-30) - 1.0, jnp.nan)
    wp = 2.0 * jnp.sum(xi * dpi, axis=1)
    rp_c = 0.5 * (rp_edges[1:] + rp_edges[:-1])
    return rp_c, wp, xi


def _check_halfbox_projected(rp_edges, pi_max, boxsize):
    import numpy as np

    rmax = float(np.sqrt(float(np.asarray(rp_edges)[-1]) ** 2
                         + float(pi_max) ** 2))
    if rmax > float(boxsize) / 2.0 + 1e-9:
        raise ValueError(
            f"projected_tpcf: sqrt(rp_max^2+pi_max^2)={rmax} exceeds "
            f"boxsize/2={float(boxsize) / 2.0}")


def projected_tpcf(pos, boxsize, rp_edges, pi_max, n_pi: int = 40,
                   los: int = 2, n_valid=None, block: int = 512):
    """Projected correlation function wp(rp) = 2 integral_0^pi_max
    xi(rp, pi) dpi (periodic natural estimator, analytic cylindrical RR).

    The standard halotools/Corrfunc wp observable the reference stack
    could not natively produce. Valid while sqrt(rp_max^2 + pi_max^2)
    <= boxsize/2 (same half-box caveat as tpcf_s_mu).

    Returns (rp_centers, wp, xi_rp_pi (ns, n_pi)).
    """
    _check_halfbox_projected(rp_edges, pi_max, boxsize)
    rp_edges = jnp.asarray(rp_edges)
    ns = int(rp_edges.shape[0]) - 1
    if isinstance(pos, (tuple, list)):
        n = jnp.asarray(pos[0]).reshape(-1).shape[0]
    else:
        n = pos.shape[0]
    n = n if n_valid is None else n_valid
    dd = pair_counts_rp_pi(pos, boxsize, rp_edges, ns, n_pi, pi_max,
                           los=los, n_valid=n_valid, block=block)
    return _wp_from_counts(dd, n, rp_edges, pi_max, n_pi, boxsize)
