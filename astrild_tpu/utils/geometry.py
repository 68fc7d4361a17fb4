"""Geometrical transforms (spherical/flat-sky/lightcone), jit-friendly.

Port of the reference's utils/geometrical_transforms.py
(/root/reference/src/astrild/utils/geometrical_transforms.py:11-161) to pure
JAX, with the astropy `z_at_value` root-find replaced by the table inversion
in utils/cosmology.Cosmology.redshift_at_comoving_distance.
"""
from __future__ import annotations

import jax.numpy as jnp

from .constants import ARCMIN2RAD, RAD2ARCMIN

__all__ = [
    "ell_to_arcmin", "arcmin_to_ell", "arcmin_to_deg", "deg_to_arcmin",
    "rad_to_arcmin", "arcmin_to_rad", "Dc_to_Da", "radius_to_angsize",
    "cart_to_sph_jacobian", "sph_to_cart_jacobian",
    "convert_vec_sph_to_cart", "convert_vec_cart_to_sph",
    "transform_box_to_lc_cart_coords", "radial_coordinate_in_lc",
    "angular_coordinate_in_lc", "ra_dec_dist_coordinates",
]


# ------------------------------------------------------------- angular units
def ell_to_arcmin(ell):
    """Multipole -> angular scale [arcmin]: theta = pi/ell."""
    return jnp.pi / ell * 180.0 / jnp.pi * 60.0


def arcmin_to_ell(arcmin):
    """Angular scale [arcmin] -> multipole."""
    return jnp.pi / arcmin * 180.0 / jnp.pi * 60.0


def arcmin_to_deg(arcmin):
    return arcmin / 60.0


def deg_to_arcmin(deg):
    return deg * 60.0


def rad_to_arcmin(angle):
    return angle * RAD2ARCMIN


def arcmin_to_rad(angle):
    return angle * ARCMIN2RAD


# ---------------------------------------------------------------- distances
def Dc_to_Da(Dc, redshift):
    """Comoving -> angular-diameter distance."""
    return Dc / (1.0 + redshift)


def radius_to_angsize(radius, Da, arcmin: bool = True):
    """Angular size of an object of physical `radius` at distance `Da`.

    radius and Da must share units; returns arcmin if `arcmin` else rad.
    """
    ang = radius / Da
    return ang * RAD2ARCMIN if arcmin else ang


# ---------------------------------------------------- spherical <-> cartesian
def cart_to_sph_jacobian(th, ph):
    """J such that v_sph = einsum('ij...,i...->j...', J, v_cart).

    th: polar angle from z-axis, ph: azimuth from x-axis (radians).
    Matches reference get_cart_to_sph_jacobian row layout.
    """
    th = jnp.asarray(th)
    ph = jnp.asarray(ph)
    zero = jnp.zeros_like(th)
    row1 = jnp.stack((jnp.sin(th) * jnp.cos(ph), jnp.cos(th) * jnp.cos(ph), -jnp.sin(ph)))
    row2 = jnp.stack((jnp.sin(th) * jnp.sin(ph), jnp.cos(th) * jnp.sin(ph), jnp.cos(ph)))
    row3 = jnp.stack((jnp.cos(th), -jnp.sin(th), zero))
    return jnp.squeeze(jnp.stack((row1, row2, row3)))


def sph_to_cart_jacobian(th, ph):
    """J such that v_cart = einsum('ij...,i...->j...', J, v_sph)."""
    th = jnp.asarray(th)
    ph = jnp.asarray(ph)
    zero = jnp.zeros_like(th)
    row1 = jnp.stack((jnp.sin(th) * jnp.cos(ph), jnp.sin(th) * jnp.sin(ph), jnp.cos(th)))
    row2 = jnp.stack((jnp.cos(th) * jnp.cos(ph), jnp.cos(th) * jnp.sin(ph), -jnp.sin(th)))
    row3 = jnp.stack((-jnp.sin(ph), jnp.cos(ph), zero))
    return jnp.squeeze(jnp.stack((row1, row2, row3)))


def convert_vec_sph_to_cart(th, ph, vij_sph):
    """[v_r, v_th, v_ph] -> [v_x, v_y, v_z], batched over trailing axes."""
    J = sph_to_cart_jacobian(th, ph)
    return jnp.einsum("ij...,i...->j...", J, vij_sph.T).T


def convert_vec_cart_to_sph(th, ph, vij_cart):
    """[v_x, v_y, v_z] -> [v_r, v_th, v_ph], batched over trailing axes."""
    J = cart_to_sph_jacobian(th, ph)
    return jnp.einsum("ij...,i...->j...", J, vij_cart.T).T


# ------------------------------------------------------------------ lightcone
# These three are array-namespace preserving (numpy in -> numpy out, at the
# input dtype): the box->lightcone transform is run on host in float64 before
# device entry (models/lightcone.py), where a silent jnp float32 cast would
# cost ~0.1 Mpc/h position quantization at chi ~ 2000 Mpc/h.
def _xp(arr):
    import numpy as np

    return jnp if isinstance(arr, jnp.ndarray) else np


def transform_box_to_lc_cart_coords(pos, boxsize, boxdist):
    """Box coords -> lightcone cartesian coords (observer at origin).

    Pure-functional version of the reference's in-place mutation
    (geometrical_transforms.py:138-146).
    """
    xp = _xp(pos)
    shift = xp.asarray([-boxsize / 2.0, -boxsize / 2.0, boxdist],
                       dtype=pos.dtype if hasattr(pos, "dtype") else None)
    return pos + shift


def radial_coordinate_in_lc(pos):
    xp = _xp(pos)
    return xp.sqrt(xp.sum(pos ** 2, axis=-1))


def angular_coordinate_in_lc(pos, unit: str = "deg"):
    """Flat-sky angles w.r.t. the z-axis."""
    xp = _xp(pos)
    theta1 = xp.arctan(pos[:, 0] / pos[:, 2])
    theta2 = xp.arctan(pos[:, 1] / pos[:, 2])
    if unit == "deg":
        theta1 = theta1 * 180.0 / xp.pi
        theta2 = theta2 * 180.0 / xp.pi
    return theta1, theta2


def ra_dec_dist_coordinates(pos, unit: str = "deg"):
    """(ra, dec, dist) spherical coordinates of cartesian positions.

    Capability twin of the reference's return_raDecDist_coordinates
    (rays/voids/tunnels/miscellaneous.py:158-175), with its conventions:
    dec = 90 deg - polar angle, ra = atan2 shifted into [0, 2pi) by a
    +pi offset. unit is 'deg'/'degree' or 'rad'/'radian' for the
    returned angles (both reference spellings accepted).

    Returns (ra, dec, dist).
    """
    xp = _xp(pos)
    dist = xp.sqrt(xp.sum(pos ** 2, axis=-1))
    costh = pos[..., 2] / dist
    dec = xp.pi / 2.0 - xp.arccos(costh)
    ra = xp.pi + xp.arctan2(pos[..., 1], pos[..., 0])
    if unit in ("deg", "degree"):
        ra = ra * 180.0 / xp.pi
        dec = dec * 180.0 / xp.pi
    elif unit not in ("rad", "radian"):
        raise ValueError(f"unit must be 'deg'/'degree' or 'rad'/'radian', "
                         f"got {unit!r}")
    return ra, dec, dist
