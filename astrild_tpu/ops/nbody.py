"""TPU-native particle-mesh N-body: 2LPT initial conditions + KDK
leapfrog evolution (Quinn et al. 1997 operators), all FFT/gather.

Capability beyond the reference: astrild only *post-processed* external
ECOSMOG/Gadget snapshots (/root/reference/src/astrild/particles/
ecosmog.py); it could not forward-model. This module closes the loop —
a linear P(k) becomes a nonlinear particle snapshot on device, feeding
the same paint -> P(k)/lensing/void pipelines the reference ran on
simulation output. Everything is built from the framework's existing
primitives: `ops.paint` mass assignment, spectral Poisson solves (the
same inverse-gradient construction as `ops.recon`), and trilinear
periodic gathers (`ops.recon.sample_displacement`), with the time loop
a `lax.scan` so the whole evolution is one XLA program.

Conventions (t in units of 1/H0, comoving lengths in Mpc/h):
  momentum        p = a^2 dx/dt                     [Mpc/h]
  kick            dp = F_hat * da / (a^2 E(a)),     grad^2 phi_hat =
                  F_hat = -grad phi_hat             (3/2) Om0 delta
  drift           dx = p * da / (a^3 E(a))
  peculiar vel    v [km/s] = 100 * p / a
2LPT displacement (Bouchet et al. 1995):
  x = q + D1 psi1 + D2 psi2,  psi1 = -grad invlap(delta),
  psi2 = +grad invlap(S2),    D2 = -(3/7) D1^2 Om(z)^(-1/143),
  S2 = sum_{i<j} [phi,ii phi,jj - phi,ij^2],  f2 = 2 Om(z)^(6/11).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from .paint import paint
from .power import delta_k as _delta_k
from .recon import sample_displacement
from .mocks import linear_modes
from .lens_planes import density_planes_from_particles

__all__ = ["lpt_displacements", "lpt_displacements_from_modes",
           "lpt_catalog_from_modes",
           "lpt_catalog", "pm_step_factors", "pm_evolve",
           "pm_evolve_checkpointed", "pm_catalog",
           "pm_lightcone_planes", "velocities_kms"]


def _freqs(ngrid: int, boxsize):
    kf = 2.0 * jnp.pi / boxsize
    return (jnp.fft.fftfreq(ngrid) * ngrid).astype(jnp.float32) * kf


def _grad_invlap(field_k, ngrid: int, boxsize, sign: float):
    """sign * grad(invlap(field)) as (3, n, n, n) real grids.

    field_k: unnormalized fftn coefficients of the field. Odd (gradient)
    transfers vanish on their Nyquist plane (same rule as ops.recon /
    ops.mocks.zeldovich_catalog).
    """
    f = _freqs(ngrid, boxsize)
    k2 = (f[:, None, None] ** 2 + f[None, :, None] ** 2
          + f[None, None, :] ** 2)
    k2safe = jnp.where(k2 == 0.0, 1.0, k2)
    # invlap: lap(phi) = field  =>  phi_k = -field_k / k^2
    phi_k = jnp.where(k2 == 0.0, 0.0, -field_k / k2safe)
    ny = ngrid // 2
    comps = []
    for axis in range(3):
        shape = [1, 1, 1]
        shape[axis] = ngrid
        kv = f.reshape(shape)
        mask = jnp.ones((ngrid,)).at[ny].set(0.0).reshape(shape)
        comps.append(jnp.real(jnp.fft.ifftn(
            jnp.asarray(sign) * 1j * kv * mask * phi_k)))
    return jnp.stack(comps)


def _second_order_source(delta_k_full, ngrid: int, boxsize):
    """2LPT source S2(x) = sum_{i<j} [phi,ii phi,jj - phi,ij^2].

    delta_k_full: unnormalized fftn coefficients of the linear field.
    Returns the real-space S2 grid. phi is the Zel'dovich potential
    (lap phi = delta); the six second derivatives are spectral:
    phi,ij(k) = k_i k_j delta_k / k^2.
    """
    f = _freqs(ngrid, boxsize)
    kv = [f.reshape(-1, 1, 1), f.reshape(1, -1, 1), f.reshape(1, 1, -1)]
    k2 = kv[0] ** 2 + kv[1] ** 2 + kv[2] ** 2
    k2safe = jnp.where(k2 == 0.0, 1.0, k2)
    t = jnp.where(k2 == 0.0, 0.0, delta_k_full / k2safe)

    def d2(i, j):
        return jnp.real(jnp.fft.ifftn(kv[i] * kv[j] * t))

    dxx, dyy, dzz = d2(0, 0), d2(1, 1), d2(2, 2)
    dxy, dxz, dyz = d2(0, 1), d2(0, 2), d2(1, 2)
    return (dxx * dyy + dxx * dzz + dyy * dzz
            - dxy ** 2 - dxz ** 2 - dyz ** 2)


@partial(jax.jit, static_argnames=("ngrid",))
def lpt_displacements_from_modes(delta_k_full, ngrid: int, boxsize):
    """(psi1, psi2) displacement grids, each (3, n, n, n), from the
    unnormalized fftn coefficients of the z=0 linear density field.

    psi1 = -grad invlap(delta) (Zel'dovich), psi2 = +grad invlap(S2);
    apply growth as x = q + D1 psi1 + D2 psi2 (D2 < 0).
    """
    psi1 = _grad_invlap(delta_k_full, ngrid, boxsize, sign=-1.0)
    s2 = _second_order_source(delta_k_full, ngrid, boxsize)
    psi2 = _grad_invlap(jnp.fft.fftn(s2), ngrid, boxsize, sign=+1.0)
    return psi1, psi2


@partial(jax.jit, static_argnames=("ngrid", "pk_fn"))
def lpt_displacements(key, ngrid: int, boxsize, pk_fn: Callable):
    """(psi1, psi2) for a GRF realization of pk_fn (z=0 normalization).

    Same key => the same realization as mocks.zeldovich_catalog /
    mocks.gaussian_field (shared mocks.linear_modes home).
    """
    dk = linear_modes(key, ngrid, boxsize, pk_fn)
    return lpt_displacements_from_modes(dk, ngrid, boxsize)


def _lattice_comps(ngrid: int, boxsize):
    cell = boxsize / ngrid
    x = (jnp.arange(ngrid, dtype=jnp.float32) + 0.5) * cell
    gx, gy, gz = jnp.meshgrid(x, x, x, indexing="ij")
    return gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)


def lpt_growth(cosmo, z_init: float, order: int = 2):
    """Host scalars (D1, f1, D2, f2) at z_init (D2=f2=0 for order=1)."""
    d1 = float(cosmo.growth_factor(z_init))
    f1 = float(cosmo.growth_rate(z_init))
    om_z = float(cosmo.Om(z_init))
    if order == 1:
        return d1, f1, 0.0, 0.0
    d2 = -(3.0 / 7.0) * d1 ** 2 * om_z ** (-1.0 / 143.0)
    f2 = 2.0 * om_z ** (6.0 / 11.0)
    return d1, f1, d2, f2


def lpt_catalog(key, ngrid: int, boxsize, pk_fn: Callable, cosmo,
                z_init: float, order: int = 2):
    """2LPT (or Zel'dovich, order=1) particle ICs at z_init.

    Returns (comps, mom): flat per-component position buffers (x, y, z)
    in [0, boxsize) and canonical momenta (px, py, pz) = a^2 dx/dt —
    the pm_evolve state. Convert with velocities_kms(mom, a) when
    peculiar velocities in km/s are needed.
    """
    if order not in (1, 2):
        raise ValueError("order must be 1 (Zel'dovich) or 2 (2LPT)")
    dk = linear_modes(key, ngrid, boxsize, pk_fn)
    return lpt_catalog_from_modes(dk, ngrid, boxsize, cosmo, z_init,
                                  order=order)


def lpt_catalog_from_modes(delta_k_full, ngrid: int, boxsize, cosmo,
                           z_init: float, order: int = 2,
                           growth=None):
    """lpt_catalog from explicit linear modes (unnormalized fftn
    coefficients of the z=0 field) instead of a PRNG key — the
    differentiable entry point field-level inference chains through
    (ops.field_infer); lpt_catalog delegates here so both share one IC
    assembly.

    growth: optional precomputed (d1, f1, d2, f2, e_init) host scalars
    so jit-traced callers avoid evaluating the cosmology at trace time
    (jnp constants inside a trace become tracers and float() raises —
    CLAUDE.md tracer-cache trap)."""
    if order not in (1, 2):
        raise ValueError("order must be 1 (Zel'dovich) or 2 (2LPT)")
    if growth is None:
        d1, f1, d2, f2 = lpt_growth(cosmo, z_init, order)
        e = float(cosmo.efunc(z_init))
    else:
        d1, f1, d2, f2, e = growth
    a = 1.0 / (1.0 + z_init)
    psi1, psi2 = lpt_displacements_from_modes(delta_k_full, ngrid,
                                              boxsize)
    qx, qy, qz = _lattice_comps(ngrid, boxsize)
    disp = d1 * psi1 + d2 * psi2
    # dx/dt = E (f1 D1 psi1 + f2 D2 psi2); p = a^2 dx/dt
    dxdt = (a * a * e) * (f1 * d1 * psi1 + f2 * d2 * psi2)
    dflat = disp.reshape(3, -1)
    pflat = dxdt.reshape(3, -1)
    comps = tuple(((q + dflat[i]) % boxsize).astype(jnp.float32)
                  for i, q in enumerate((qx, qy, qz)))
    mom = tuple(pflat[i].astype(jnp.float32) for i in range(3))
    return comps, mom


def velocities_kms(mom, a: float):
    """Peculiar velocities [km/s] from canonical momenta at scale
    factor a: v = a dx/dt * (100 km/s per Mpc/h/(1/H0)) = 100 p / a.

    Matches mocks.zeldovich_catalog_with_velocities' convention (v =
    aH f psi with H in units of 100 km/s/(Mpc/h)) and ops.tpcf's
    redshift-space mapping s = x + v/(100 a E).
    """
    return tuple(100.0 * p / a for p in mom)


def _a_edges(a_init: float, a_final: float, nsteps: int, spacing: str):
    if spacing == "loga":
        return np.exp(np.linspace(np.log(a_init), np.log(a_final),
                                  nsteps + 1))
    if spacing == "a":
        return np.linspace(a_init, a_final, nsteps + 1)
    raise ValueError("spacing must be 'loga' or 'a'")


def _factors_from_edges(cosmo, edges, spacing: str = "loga",
                        quad_points: int = 257):
    """KDK integrals for an explicit scale-factor edge grid (host f64).

    Each row depends only on (edges[i], edges[i+1], spacing), so factors
    computed for any contiguous SLICE of an edge grid are bitwise equal
    to the corresponding rows of the full grid's factors — the property
    pm_evolve_checkpointed relies on to make segmented evolution follow
    the exact monolithic KDK schedule.
    """
    edges = np.asarray(edges, np.float64)
    nsteps = len(edges) - 1

    def integral(lo, hi, power):
        a = np.linspace(lo, hi, quad_points)
        e = np.asarray(cosmo.efunc_a(a), dtype=np.float64)
        return np.trapezoid(1.0 / (a ** power * e), a)

    out = np.empty((nsteps, 3), np.float64)
    for i in range(nsteps):
        a0, a1 = edges[i], edges[i + 1]
        ah = np.sqrt(a0 * a1) if spacing == "loga" else 0.5 * (a0 + a1)
        out[i, 0] = integral(a0, ah, 2)
        out[i, 1] = integral(a0, a1, 3)
        out[i, 2] = integral(ah, a1, 2)
    return out


def pm_step_factors(cosmo, a_init: float, a_final: float, nsteps: int,
                    spacing: str = "loga", quad_points: int = 257):
    """Exact KDK drift/kick integrals per step (host, float64).

    Returns numpy (nsteps, 3): [kick(a0->ah), drift(a0->a1),
    kick(ah->a1)] with kick integrand 1/(a^2 E) and drift 1/(a^3 E)
    (Quinn et al. 1997), trapezoid-quadratured at quad_points per
    half-interval — error O(1e-10), far below the time-discretization
    error itself.
    """
    return _factors_from_edges(cosmo, _a_edges(a_init, a_final, nsteps,
                                               spacing),
                               spacing=spacing, quad_points=quad_points)


@partial(jax.jit, static_argnames=("ngrid", "window", "compensate",
                                   "deposit"))
def _force_grids(comps, ngrid: int, boxsize, om0, window: str,
                 compensate: bool = True, am2=jnp.inf,
                 deposit=None):
    """F_hat = -grad phi_hat, lap phi_hat = 1.5 Om0 (1 + mu_k) delta,
    as (3, n, n, n) grids from the painted density (single window
    deconvolution: corrects the paint; the readout smoothing remains,
    -0.1% force at the fundamental of an n-grid at 1:1 mesh:particle
    ratio).

    am2 = a^2 M^2(a) — the comoving scalaron mass^2 of linearized
    Hu-Sawicki f(R) gravity [(h/Mpc)^2]; the fifth force enters the
    Poisson source as mu_k = k^2 / (3 (k^2 + am2)) (the same Geff as
    utils.cosmology.Cosmology.mu_k). am2 = inf is EXACT GR (mu_k == 0
    identically; finite/inf = 0 in f32), so one code path serves both.
    No chameleon screening — this is the linear-response fifth force,
    the regime the reference's ECOSMOG P(k)-ratio pipelines probed
    (/root/reference/src/astrild/particles/ecosmog.py).

    MESH:PARTICLE RATIO MATTERS: with lattice (LPT) initial conditions
    the particle lattice's displacement sidebands sit at mesh modes
    64-m (force mesh at 2x the particle grid), where they alias back
    onto the physical mode m COHERENTLY through the paint->Poisson->
    gather chain: measured +3% force error at m=1 growing ~linearly
    with m (and 2x worse when deconvolution re-amplifies the
    sidebands). At 1:1 the images land at 2n +/- m where the CIC
    window^2 is ~1e-7. Keep ngrid == particles-per-side (the
    pm_catalog default); tests/test_nbody.py::test_force_accuracy
    pins both regimes.
    """
    grid = paint(comps, ngrid, boxsize, window=window, deposit=deposit)
    dk = _delta_k(grid, window=window if compensate else None)
    f = _freqs(ngrid, boxsize)
    fr = f[: ngrid // 2 + 1]
    kv = [f.reshape(-1, 1, 1), f.reshape(1, -1, 1), fr.reshape(1, 1, -1)]
    k2 = kv[0] ** 2 + kv[1] ** 2 + kv[2] ** 2
    k2safe = jnp.where(k2 == 0.0, 1.0, k2)
    geff = 1.0 + k2 / (3.0 * (k2 + am2))
    phik = jnp.where(k2 == 0.0, 0.0, -1.5 * om0 * geff * dk / k2safe)
    ny = ngrid // 2
    mask_full = jnp.ones((ngrid,)).at[ny].set(0.0)
    mask_r = jnp.ones((ngrid // 2 + 1,)).at[ny].set(0.0)
    masks = [mask_full.reshape(-1, 1, 1), mask_full.reshape(1, -1, 1),
             mask_r.reshape(1, 1, -1)]
    fg = [jnp.fft.irfftn(-1j * kv[a] * masks[a] * phik, (ngrid,) * 3)
          * float(ngrid) ** 3 for a in range(3)]
    return jnp.stack(fg)


@partial(jax.jit, static_argnames=("ngrid", "window", "deposit"))
def _pm_scan(comps, mom, factors, am2_edges, ngrid: int, boxsize, om0,
             window: str, deposit=None):
    # deposit="scatter" keeps every per-step force paint on the XLA
    # scatter (which has a transpose rule) — required when the scan is
    # DIFFERENTIATED (ops.field_infer): the auto-dispatched Pallas
    # painter has no AD rule and would break jax.grad at n >= 2^21 on
    # TPU, exactly production scale
    force0 = sample_displacement(
        _force_grids(comps, ngrid, boxsize, om0, window,
                     am2=am2_edges[0], deposit=deposit), boxsize, comps)

    def step(carry, xs):
        fac, am2 = xs
        (x, y, z), (px, py, pz), frc = carry
        k1, dr, k2 = fac[0], fac[1], fac[2]
        px, py, pz = (px + k1 * frc[0], py + k1 * frc[1],
                      pz + k1 * frc[2])
        x = (x + dr * px) % boxsize
        y = (y + dr * py) % boxsize
        z = (z + dr * pz) % boxsize
        frc = sample_displacement(
            _force_grids((x, y, z), ngrid, boxsize, om0, window,
                         deposit=deposit,
                         am2=am2),
            boxsize, (x, y, z))
        mom_new = (px + k2 * frc[0], py + k2 * frc[1], pz + k2 * frc[2])
        return ((x, y, z), mom_new, frc), None

    (comps, mom, _), _ = jax.lax.scan(step, (comps, mom, force0),
                                      (factors, am2_edges[1:]))
    return comps, mom


def pm_evolve(comps, mom, cosmo, ngrid: int, boxsize, a_init: float,
              a_final: float, nsteps: int, window: str = "cic",
              spacing: str = "loga"):
    """Evolve (comps, mom) from a_init to a_final with nsteps KDK
    leapfrog steps on an ngrid^3 force mesh.

    comps/mom: flat per-component buffers (x, y, z) / (px, py, pz) as
    produced by lpt_catalog (the layout that avoids the (N, 3) lane-
    padding trap at large N). One paint + 4 FFTs + 3 gathers per step,
    the whole loop a single lax.scan; on TPU the paint auto-dispatches
    to the sorted Pallas deposit at large N.

    Gravity follows the cosmology: cosmo.fR0 != 0 turns on the
    linearized Hu-Sawicki fifth force (per-step comoving scalaron
    mass^2 a^2 M^2(a) precomputed on host, spectral Geff(k) in the
    Poisson solve — see _force_grids). fR0 = 0 is exact GR.
    """
    comps = tuple(jnp.asarray(c).reshape(-1) for c in comps)
    mom = tuple(jnp.asarray(p).reshape(-1) for p in mom)
    return _evolve_on_edges(comps, mom, cosmo, ngrid, boxsize,
                            _a_edges(a_init, a_final, nsteps, spacing),
                            window, spacing)


def _evolve_on_edges(comps, mom, cosmo, ngrid: int, boxsize, edges,
                     window: str, spacing: str):
    """pm_evolve body for an explicit edge grid (shared with the
    checkpointed driver; comps/mom must already be flat buffers)."""
    nsteps = len(edges) - 1
    factors = jnp.asarray(_factors_from_edges(cosmo, edges,
                                              spacing=spacing),
                          dtype=jnp.float32)
    if float(getattr(cosmo, "fR0", 0.0)) != 0.0:
        am2 = np.asarray(edges ** 2
                         * np.asarray(cosmo.scalaron_mass2(edges),
                                      np.float64))
    else:
        am2 = np.full(nsteps + 1, np.inf)
    am2 = jnp.asarray(am2, jnp.float32)
    return _pm_scan(comps, mom, factors, am2, ngrid, float(boxsize),
                    float(cosmo.Om0), window)


def _key_fingerprint(key):
    """JSON-able identity of a PRNG key (typed keys and raw uint32)."""
    try:
        data = jax.random.key_data(key)
    except Exception:
        data = key
    return np.asarray(data).ravel().tolist()


def pm_evolve_checkpointed(comps, mom, cosmo, ngrid: int, boxsize,
                           a_init: float, a_final: float, nsteps: int,
                           ckpt_dir, segment_steps: int = 8,
                           window: str = "cic", spacing: str = "loga"):
    """Resume-safe pm_evolve: evolve in segments of segment_steps KDK
    steps, atomically checkpointing (comps, mom) after each segment
    (core.checkpoint.save_state — the completed-step count travels
    inside the payload, so a crash mid-save keeps the previous complete
    state). Rerunning with the same arguments and ckpt_dir resumes from
    the last completed segment instead of restarting.

    Segment edge grids are exact contiguous slices of the monolithic
    _a_edges grid and _factors_from_edges is row-local, so the
    segmented run follows the SAME KDK schedule as pm_evolve — the
    trajectory matches to f32 roundoff (pinned by
    tests/test_nbody.py::test_pm_evolve_checkpointed_*). Equal-length
    segments reuse one compiled scan; only a ragged final segment
    compiles a second program.

    This is the intra-run resume the reference lacked entirely: its
    recovery unit was a whole external simulation re-run
    (/root/reference/src/astrild/particles/ecosmog.py drives ECOSMOG
    from scratch; SURVEY.md §5 checkpoint/resume row).
    """
    from ..core.checkpoint import (bind_schedule, checkpoint_exists,
                                   restore_state, save_state)
    if segment_steps < 1:
        raise ValueError("segment_steps must be >= 1")
    edges = _a_edges(a_init, a_final, nsteps, spacing)
    comps = tuple(jnp.asarray(c).reshape(-1) for c in comps)
    mom = tuple(jnp.asarray(p).reshape(-1) for p in mom)
    bind_schedule(ckpt_dir, {
        "kind": "pm_evolve", "a_init": float(a_init),
        "a_final": float(a_final), "nsteps": int(nsteps),
        "spacing": spacing, "ngrid": int(ngrid),
        "boxsize": float(boxsize), "window": window,
        "npart": int(comps[0].size)})
    done = 0
    if checkpoint_exists(ckpt_dir):
        (comps, mom), step = restore_state(ckpt_dir, (comps, mom),
                                           with_step=True)
        done = 0 if step is None else int(step)
        if done > nsteps:
            raise ValueError(
                f"checkpoint at {ckpt_dir} records {done} completed "
                f"steps but this schedule has only {nsteps} — the "
                "checkpoint belongs to a different run; point ckpt_dir "
                "somewhere fresh")
    while done < nsteps:
        k = min(segment_steps, nsteps - done)
        comps, mom = _evolve_on_edges(comps, mom, cosmo, ngrid, boxsize,
                                      edges[done:done + k + 1], window,
                                      spacing)
        done += k
        save_state(ckpt_dir, (comps, mom), step=done)
    return comps, mom


def pm_lightcone_planes(key, cosmo, pk_fn: Callable, ngrid_part: int,
                        boxsize, fov, npix: int, nplanes: int,
                        z_source: float = 1.0, z_init: float = 9.0,
                        nsteps_init: int = 8, steps_per_plane: int = 2,
                        ngrid_force: int | None = None, order: int = 2,
                        window: str = "cic", los: int = 2,
                        observer_xy=None, randomize_key=None,
                        ckpt_dir=None, ckpt_every: int = 1):
    """Full lensing forward model: linear P(k) -> evolving PM snapshot
    -> lightcone density-contrast planes, each painted from the
    snapshot evolved to that plane's OWN redshift.

    This closes the loop the reference left to external codes: its
    RayRamses pipelines consumed lightcone maps produced by a separate
    simulation (/root/reference/src/astrild/rays/rayramses.py) — here a
    linear spectrum becomes Born/multiplane-ready planes in-framework
    (feed the result to ops.lensing.born_convergence or
    ops.raytrace.multiplane_raytrace, or wrap with
    SkyArray.from_density_planes).

    Evolution runs far -> near (forward in time): 2LPT ICs at z_init,
    one pre-evolution leg of nsteps_init KDK steps down to the farthest
    plane's redshift, then steps_per_plane steps between consecutive
    plane epochs. All legs after the first reuse one jitted scan
    (identical shapes). The box is replicated periodically along `los`
    by the plane painter; transverse replication for wide cones is
    handled there too (ops.lens_planes.density_planes_from_particles).

    randomize_key: optional PRNG key. A single-box lightcone repeats
    the SAME structure every boxsize along the line of sight, so
    transverse low-k modes of different planes add COHERENTLY in the
    Born/ray sum — measured factor ~3.5 excess over the Limber C_ell
    in the lowest band, reproducible across realizations. Passing a
    key draws one random transverse observer offset per box
    REPETITION (planes within one box depth keep their relative
    geometry, so intra-box structure stays contiguous) — the standard
    single-box decorrelation (e.g. Petri+16 lenstools pipelines).

    ckpt_dir: optional checkpoint directory. The per-plane loop saves
    (comps, mom, planes-so-far) every ckpt_every completed planes
    (atomic, step inside the payload — core.checkpoint.save_state);
    rerunning the SAME call resumes at the first unfinished plane. The
    plane stack lives in a preallocated (nplanes, npix, npix) buffer so
    the restore template is shape-static.

    Returns (delta (nplanes, npix, npix), chis (nplanes,), dchi):
    planes ordered near -> far, chi_i = (i + 0.5) * dchi,
    dchi = chi(z_source) / nplanes.
    """
    chi_s = float(cosmo.comoving_distance(z_source))
    dchi = chi_s / nplanes
    if dchi > boxsize:
        raise ValueError(
            f"dchi = chi_s/nplanes = {dchi:.1f} exceeds the box "
            f"({boxsize}); the slab paint would silently bias delta "
            f"low. Use nplanes >= {int(np.ceil(chi_s / boxsize))}.")
    chis = (np.arange(nplanes) + 0.5) * dchi
    z_planes = np.asarray(cosmo.redshift_at_comoving_distance(
        jnp.asarray(chis, jnp.float32)), np.float64)
    if z_init <= z_planes.max():
        raise ValueError(
            f"z_init={z_init} must exceed the farthest plane redshift "
            f"{z_planes.max():.3f} (raise z_init or lower z_source)")
    if ngrid_force is None:
        ngrid_force = ngrid_part
    if observer_xy is None:
        observer_xy = (0.5 * boxsize, 0.5 * boxsize)
    n_groups = int(chis[-1] // boxsize) + 1
    if randomize_key is not None:
        shifts = np.asarray(jax.random.uniform(
            randomize_key, (n_groups, 2), minval=0.0, maxval=boxsize))
    else:
        shifts = np.zeros((n_groups, 2))
    # far -> near: scale factors ascending; planes_buf[j] holds plane j
    # of that ordering (reversed to near -> far at return)
    a_targets = 1.0 / (1.0 + z_planes[::-1])
    planes_buf = jnp.zeros((nplanes, npix, npix), jnp.float32)
    j_start = 0
    resume = False
    if ckpt_dir is not None:
        from ..core.checkpoint import (bind_schedule, checkpoint_exists,
                                       restore_state, save_state)
        bind_schedule(ckpt_dir, {
            "kind": "pm_lightcone", "key": _key_fingerprint(key),
            "ngrid_part": int(ngrid_part), "boxsize": float(boxsize),
            "fov": float(fov), "npix": int(npix),
            "nplanes": int(nplanes), "z_source": float(z_source),
            "z_init": float(z_init), "nsteps_init": int(nsteps_init),
            "steps_per_plane": int(steps_per_plane),
            "ngrid_force": int(ngrid_force), "order": int(order),
            "window": window, "los": int(los),
            "observer_xy": [float(observer_xy[0]),
                            float(observer_xy[1])],
            "randomize": (None if randomize_key is None
                          else _key_fingerprint(randomize_key))})
        resume = checkpoint_exists(ckpt_dir)
    if resume:
        # the checkpoint carries the full evolved state — skip the 2LPT
        # IC generation entirely (dominant startup cost at production
        # ngrid_part); the restore template only needs shapes/dtypes
        npart = int(ngrid_part) ** 3
        zc = tuple(jnp.zeros((npart,), jnp.float32) for _ in range(3))
        (comps, mom, planes_buf), step = restore_state(
            ckpt_dir, (zc, zc, planes_buf), with_step=True)
        j_start = 0 if step is None else int(step)
        if j_start > nplanes:
            raise ValueError(
                f"checkpoint at {ckpt_dir} records {j_start} planes "
                f"but this lightcone has {nplanes} — stale "
                "checkpoint; point ckpt_dir somewhere fresh")
    else:
        comps, mom = lpt_catalog(key, ngrid_part, boxsize, pk_fn, cosmo,
                                 z_init, order=order)
    a_now = (1.0 / (1.0 + z_init) if j_start == 0
             else float(a_targets[j_start - 1]))
    for j in range(j_start, nplanes):
        a_t, chi_c = a_targets[j], chis[::-1][j]
        nst = nsteps_init if j == 0 else steps_per_plane
        comps, mom = pm_evolve(comps, mom, cosmo, ngrid_force, boxsize,
                               a_now, float(a_t), nst, window=window)
        a_now = float(a_t)
        g = int(chi_c // boxsize)
        oxy = ((observer_xy[0] + shifts[g, 0]) % boxsize,
               (observer_xy[1] + shifts[g, 1]) % boxsize)
        d, _ = density_planes_from_particles(
            comps, boxsize, float(chi_c), dchi, 1, fov, npix, los=los,
            observer_xy=oxy)
        planes_buf = planes_buf.at[j].set(d[0])
        if ckpt_dir is not None and (
                (j + 1 - j_start) % ckpt_every == 0 or j + 1 == nplanes):
            save_state(ckpt_dir, (comps, mom, planes_buf), step=j + 1)
    delta = planes_buf[::-1]  # reorder near -> far
    return delta, jnp.asarray(chis, jnp.float32), dchi


def pm_catalog(key, cosmo, pk_fn: Callable, ngrid_part: int, boxsize,
               z_init: float = 9.0, z_final: float = 0.0,
               nsteps: int = 20, ngrid_force: int | None = None,
               order: int = 2, window: str = "cic"):
    """Linear P(k) -> nonlinear snapshot: 2LPT ICs at z_init evolved to
    z_final. Returns (comps, vel_kms), both flat component tuples.

    ngrid_force defaults to ngrid_part (1:1 mesh:particle) — see the
    _force_grids docstring for why a finer force mesh with lattice ICs
    coherently BOOSTS large-scale growth instead of refining it.
    """
    if ngrid_force is None:
        ngrid_force = ngrid_part
    comps, mom = lpt_catalog(key, ngrid_part, boxsize, pk_fn, cosmo,
                             z_init, order=order)
    a0, a1 = 1.0 / (1.0 + z_init), 1.0 / (1.0 + z_final)
    comps, mom = pm_evolve(comps, mom, cosmo, ngrid_force, boxsize,
                           a0, a1, nsteps, window=window)
    return comps, velocities_kms(mom, a1)
