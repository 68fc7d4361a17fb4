"""Mock fields and catalogs: Gaussian random fields, Zel'dovich
displacements, lognormal maps.

Capability beyond the reference (it only consumed external simulations):
device-native mocks close the loop for estimator validation — a particle
set with known input P(k) must return that P(k) through the full
paint -> FFT -> bin pipeline (tests/test_mocks.py) — and provide cheap
realizations for covariance work.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["gaussian_field", "zeldovich_catalog",
           "zeldovich_catalog_with_velocities", "lognormal_map"]


def linear_modes(key, ngrid: int, boxsize, pk_fn: Callable):
    """Complex linear modes FFT(delta) (unnormalized fftn convention).

    Single home of the GRF mode construction shared by gaussian_field,
    zeldovich_catalog and ops.nbody's LPT initial conditions, so that
    the same key yields the SAME realization across all of them.

    On-device helper, deliberately NOT in __all__: the return is
    complex64, and complex host<->device transfers are unimplemented on
    the axon backend (CLAUDE.md) — keep it inside jitted chains; for a
    host-inspectable field use gaussian_field (real).
    """
    white = jax.random.normal(key, (ngrid, ngrid, ngrid))
    return modes_from_white(white, ngrid, boxsize, pk_fn)


def modes_from_white(white, ngrid: int, boxsize, pk_fn: Callable):
    """linear_modes with the N(0,1) white-noise field as an explicit,
    DIFFERENTIABLE argument — the parameterization field-level
    inference optimizes over (ops.field_infer). linear_modes(key, ...)
    == modes_from_white(normal(key), ...), so inferred fields live in
    the same convention as every mock/IC in the package."""
    kf = 2.0 * jnp.pi / boxsize
    f = (jnp.fft.fftfreq(ngrid) * ngrid).astype(jnp.float32)
    m2 = (f[:, None, None] ** 2 + f[None, :, None] ** 2
          + f[None, None, :] ** 2)
    p = pk_fn(jnp.maximum(jnp.sqrt(m2), 1e-6) * kf)
    p = jnp.where(m2 == 0.0, 0.0, p)
    amp = jnp.sqrt(p / boxsize ** 3) * float(ngrid) ** 3
    return jnp.fft.fftn(white) / float(ngrid) ** 1.5 * amp


@partial(jax.jit, static_argnames=("ngrid", "pk_fn"))
def gaussian_field(key, ngrid: int, boxsize, pk_fn: Callable):
    """Real-space GRF delta(x) with isotropic target power pk_fn(k).

    Conventions match ops/power.py: <|FFT(delta)/N^3|^2> V = P(k).
    Same key => the same realization as zeldovich_catalog / the LPT
    initial conditions (shared linear_modes home).
    """
    return jnp.real(jnp.fft.ifftn(
        linear_modes(key, ngrid, boxsize, pk_fn)))


@partial(jax.jit, static_argnames=("ngrid", "pk_fn"))
def zeldovich_catalog(key, ngrid: int, boxsize, pk_fn: Callable):
    """Particle catalog by Zel'dovich-displacing a uniform lattice.

    psi = grad(invlap(delta)) evaluated at lattice points; positions are
    lattice + psi (periodic). Returns (ngrid^3, 3) positions whose
    large-scale P(k) matches pk_fn to linear order.
    """
    kf = 2.0 * jnp.pi / boxsize
    f = (jnp.fft.fftfreq(ngrid) * ngrid).astype(jnp.float32)
    m2 = (f[:, None, None] ** 2 + f[None, :, None] ** 2
          + f[None, None, :] ** 2)
    dk = linear_modes(key, ngrid, boxsize, pk_fn)
    k2 = (m2 * kf ** 2)
    k2safe = jnp.where(k2 == 0.0, 1.0, k2)
    phi_k = jnp.where(k2 == 0.0, 0.0, -dk / k2safe)  # lap phi = delta
    # psi = -grad phi ; odd transfers must vanish on their Nyquist plane
    ny = ngrid // 2

    def comp(axis):
        kvec = (f * kf).astype(jnp.float32)
        shape = [1, 1, 1]
        shape[axis] = ngrid
        kv = kvec.reshape(shape)
        fac = jnp.asarray(-1j) * kv
        mask = jnp.ones((ngrid,)).at[ny].set(0.0).reshape(shape)
        return jnp.real(jnp.fft.ifftn(fac * mask * phi_k))

    psi = jnp.stack([comp(0), comp(1), comp(2)], axis=-1)
    cell = boxsize / ngrid
    x = (jnp.arange(ngrid, dtype=jnp.float32) + 0.5) * cell
    lattice = jnp.stack(jnp.meshgrid(x, x, x, indexing="ij"), axis=-1)
    pos = (lattice + psi).reshape(-1, 3) % boxsize
    return pos


@partial(jax.jit, static_argnames=("ngrid", "pk_fn"))
def zeldovich_catalog_with_velocities(key, ngrid: int, boxsize, pk_fn,
                                      growth_rate, a_hubble: float = 100.0):
    """Zel'dovich catalog with dynamically consistent peculiar velocities.

    In the Zel'dovich approximation v = a H(a) f psi; with psi in
    comoving Mpc/h and a_hubble = a H(a) in km/s/(Mpc/h) (100 E(0) = 100
    at z=0, matching ops.tpcf.to_redshift_space's s = x + v/100), the
    redshift-space field obeys Kaiser with beta = growth_rate to linear
    order — the measurement-side closure of the RSD loop
    (tests/test_rsd.py::test_zeldovich_end_to_end_kaiser).

    Returns (pos (n,3) [Mpc/h], vel (n,3) [km/s]).
    """
    pos = zeldovich_catalog(key, ngrid, boxsize, pk_fn)
    cell = boxsize / ngrid
    x = (jnp.arange(ngrid, dtype=jnp.float32) + 0.5) * cell
    lattice = jnp.stack(jnp.meshgrid(x, x, x, indexing="ij"),
                        axis=-1).reshape(-1, 3)
    # psi = (pos - lattice) with periodic wrap undone
    psi = pos - lattice
    psi = psi - boxsize * jnp.round(psi / boxsize)
    vel = a_hubble * growth_rate * psi
    return pos, vel


@partial(jax.jit, static_argnames=("npix",))
def lognormal_map(key, npix: int, opening_angle_deg, cl_tab_ell,
                  cl_tab_val):
    """Lognormal (positive-definite) flat-sky map from a Cl table."""
    from .angular_power import cl_to_flat_map

    g = cl_to_flat_map(key, cl_tab_ell, cl_tab_val, npix,
                       opening_angle_deg)
    var = jnp.var(g)
    return jnp.exp(g - var / 2.0) - 1.0
