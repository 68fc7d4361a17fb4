"""HOD (halo occupation distribution) galaxy mocks: Zheng+07 occupation,
NFW satellite profiles, virial velocity dispersion.

The reference consumed HOD galaxy catalogs produced by external tools —
its void pipeline reads per-HOD catalogs from disk
(/root/reference/src/astrild/rays/void.py:83-105, paths
"<finder>/<hod>/SVF_lc*.h5") and its TPCF/pairwise stacks ran halotools
over them (/root/reference/src/astrild/particles/hutils/tpcf.py:18-105).
This module closes that loop natively: populate a halo catalog with
galaxies on device, in one jit, with static shapes (max_sat cap + validity
mask) so it composes with the TPCF / pairwise / void estimators.

Occupation model (Zheng et al. 2007, arXiv:astro-ph/0408564, Eqs. 2-5):

    <N_cen>(M) = 1/2 [1 + erf((log10 M - log10 Mmin) / sigma_logM)]
    <N_sat>(M) = <N_cen>(M) ((M - M0)/M1)^alpha        for M > M0

Satellites are Poisson around <N_sat>, positioned on an NFW profile by
exact inverse-CDF sampling (bisection on mu(x) = ln(1+x) - x/(1+x)), and
given isotropic Gaussian intra-halo velocities with the virial dispersion
sigma_v^2 = G M / (2 R_vir).

Units: masses Msun/h, lengths Mpc/h (comoving), velocities km/s — the
conventions of ops.tpcf.to_redshift_space (s = x + v/100).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HODParams", "zheng07_mean_occupation", "nfw_radius_sample",
           "hod_populate", "compact_catalog"]

# G in (km/s)^2 Mpc Msun^-1 ; h cancels between M[Msun/h] and R[Mpc/h]
_G_KMS2_MPC_MSUN = 4.30091e-9


class HODParams(NamedTuple):
    """Zheng+07 five-parameter HOD (log10 masses in Msun/h)."""
    log_mmin: float = 12.02
    sigma_logm: float = 0.26
    log_m0: float = 11.38
    log_m1: float = 13.31
    alpha: float = 1.06


def zheng07_mean_occupation(m, params: HODParams):
    """Mean central / satellite occupation of halos with mass m [Msun/h].

    Returns (n_cen, n_sat); <N_sat> carries the <N_cen> modulation of
    Zheng+07 Eq. 5 (halotools' default), so the galaxy number density is
    n_gal = integral dn/dM (<N_cen> + <N_sat>).
    """
    m = jnp.asarray(m, jnp.float32)
    logm = jnp.log10(jnp.maximum(m, 1.0))
    n_cen = 0.5 * (1.0 + jax.lax.erf(
        (logm - params.log_mmin) / params.sigma_logm))
    m0 = 10.0 ** params.log_m0
    m1 = 10.0 ** params.log_m1
    base = jnp.maximum(m - m0, 0.0) / m1
    n_sat = n_cen * base ** params.alpha
    return n_cen, n_sat


def _nfw_mu(x):
    return jnp.log1p(x) - x / (1.0 + x)


def nfw_radius_sample(u, conc, n_iter: int = 50):
    """Exact inverse-CDF NFW radial sample: r/R_vir for uniform u in [0,1).

    Solves mu(x) = u * mu(c) for x in [0, c] by bisection (monotone mu;
    n_iter=50 gives float32-exact roots), then returns x/c = r/Rvir.
    """
    u = jnp.asarray(u, jnp.float32)
    conc = jnp.asarray(conc, jnp.float32)
    target = u * _nfw_mu(conc)
    lo = jnp.zeros_like(target)
    hi = jnp.broadcast_to(conc, target.shape).astype(jnp.float32)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        below = _nfw_mu(mid) < target
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    x = 0.5 * (lo + hi)
    return x / jnp.maximum(conc, 1e-6)


@partial(jax.jit, static_argnames=("max_sat",))
def hod_populate(key, m, x, y, z, vx, vy, vz, rvir, conc, boxsize,
                 params: HODParams = HODParams(), max_sat: int = 16):
    """Populate a halo catalog with HOD galaxies (one jit, static shapes).

    Args:
      key: PRNG key.
      m: (nh,) halo masses [Msun/h].
      x, y, z: (nh,) halo positions [Mpc/h] (flat components — CLAUDE.md
        (N, 3) lane-padding rule).
      vx, vy, vz: (nh,) halo velocities [km/s].
      rvir: (nh,) virial radii [Mpc/h].
      conc: (nh,) NFW concentrations (e.g. r200c/rs from Rockstar, or the
        Prada relation via ops.halo_stats.concentration_prada).
      boxsize: periodic box size [Mpc/h].
      params: HODParams (Zheng+07).
      max_sat: static per-halo satellite capacity; draws are clipped here
        (choose >> <N_sat>(M_max); the returned 'overflow' counts clips).

    Returns dict of flat (nh * (1 + max_sat),) arrays: gx gy gz gvx gvy
    gvz (galaxies), valid (bool), is_central (bool), halo_index (int32),
    plus scalar diagnostics n_gal and overflow.
    """
    m = jnp.asarray(m, jnp.float32)
    nh = m.shape[0]
    k_cen, k_nsat, k_rad, k_dir, k_vel = jax.random.split(key, 5)

    n_cen_mean, n_sat_mean = zheng07_mean_occupation(m, params)
    has_cen = jax.random.bernoulli(k_cen, n_cen_mean)
    n_sat_raw = jax.random.poisson(k_nsat, n_sat_mean, (nh,))
    n_sat = jnp.minimum(n_sat_raw, max_sat)
    overflow = jnp.sum(n_sat_raw - n_sat)

    # satellite radial positions: exact NFW inverse CDF
    u = jax.random.uniform(k_rad, (nh, max_sat))
    conc = jnp.asarray(conc, jnp.float32)
    r_frac = nfw_radius_sample(u, conc[:, None])
    r = r_frac * jnp.asarray(rvir, jnp.float32)[:, None]
    # isotropic directions (three independent flat draws, not (.., 3))
    gx_n = jax.random.normal(k_dir, (3, nh, max_sat))
    norm = jnp.sqrt(jnp.sum(gx_n ** 2, axis=0) + 1e-12)
    dx, dy, dz = (gx_n[i] / norm * r for i in range(3))

    # intra-halo velocities: isotropic Gaussian, virial dispersion
    sigma_v = jnp.sqrt(_G_KMS2_MPC_MSUN * m
                       / (2.0 * jnp.maximum(jnp.asarray(rvir, jnp.float32),
                                            1e-6)))
    gv = jax.random.normal(k_vel, (3, nh, max_sat)) * sigma_v[None, :, None]

    sat_valid = (jnp.arange(max_sat)[None, :] < n_sat[:, None])

    def per_comp(h, dh):
        h = jnp.asarray(h, jnp.float32)
        sat = (h[:, None] + dh) if dh is not None else \
            jnp.broadcast_to(h[:, None], (nh, max_sat))
        return jnp.concatenate([h, sat.reshape(-1)])

    L = jnp.asarray(boxsize, jnp.float32)
    gx = per_comp(x, dx) % L
    gy = per_comp(y, dy) % L
    gz = per_comp(z, dz) % L
    gvx = per_comp(vx, gv[0])
    gvy = per_comp(vy, gv[1])
    gvz = per_comp(vz, gv[2])
    valid = jnp.concatenate([has_cen, sat_valid.reshape(-1)])
    is_central = jnp.concatenate([jnp.ones(nh, bool),
                                  jnp.zeros(nh * max_sat, bool)])
    halo_index = jnp.concatenate([
        jnp.arange(nh, dtype=jnp.int32),
        jnp.broadcast_to(jnp.arange(nh, dtype=jnp.int32)[:, None],
                         (nh, max_sat)).reshape(-1)])
    return {"gx": gx, "gy": gy, "gz": gz,
            "gvx": gvx, "gvy": gvy, "gvz": gvz,
            "valid": valid, "is_central": is_central,
            "halo_index": halo_index,
            "n_gal": jnp.sum(valid.astype(jnp.int32)),
            "overflow": overflow}


def compact_catalog(cat: Dict[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
    """Host-side strip of invalid rows (dynamic shape -> numpy)."""
    keep = np.asarray(cat["valid"])
    out = {}
    for k, v in cat.items():
        v = np.asarray(v)
        out[k] = v[keep] if v.shape == keep.shape else v
    return out
