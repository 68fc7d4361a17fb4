"""3D grid vector calculus + point-set gridding + per-object map cutouts.

Ports /root/reference/src/astrild/particles/hutils/map_transform.py:71-117
(divergence of gridded vector fields, h5 pointset -> grid scatter) and
rays/utils/map_of_object.py:24-110 (per-object cutouts + painting).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["divergence", "gradient_3d", "scatter_points_to_grid",
           "object_cutouts", "paint_objects_on_map", "slice_map"]


@jax.jit
def gradient_3d(field, spacing=1.0):
    """Second-order central gradients of an (n,n,n) scalar field; returns
    (3, n, n, n) (np.gradient equivalent, edge_order=2)."""
    return jnp.stack(jnp.gradient(field, spacing), axis=0)


@jax.jit
def divergence(vec_field, spacing=1.0):
    """div v of a (3, n, n, n) vector field (map_transform.py:92-104)."""
    return sum(jnp.gradient(vec_field[i], spacing, axis=i)[...]
               for i in range(3))


@partial(jax.jit, static_argnames=("ngrid", "reduce"))
def scatter_points_to_grid(pos, values, ngrid: int, boxsize,
                           reduce: str = "mean"):
    """Point samples -> NGP grid, mean- or sum-reduced per cell
    (map_transform.py:71-89)."""
    u = jnp.floor(pos / (boxsize / ngrid)).astype(jnp.int32) % ngrid
    flat = (u[:, 0] * ngrid + u[:, 1]) * ngrid + u[:, 2]
    vsum = jax.ops.segment_sum(values, flat, num_segments=ngrid ** 3)
    cnt = jax.ops.segment_sum(jnp.ones_like(values), flat,
                              num_segments=ngrid ** 3)
    if reduce == "mean":
        out = jnp.where(cnt > 0, vsum / jnp.maximum(cnt, 1), 0.0)
    else:
        out = vsum
    return out.reshape(ngrid, ngrid, ngrid)


@partial(jax.jit, static_argnames=("npix", "axis"))
def slice_map(pos, values, npix: int, boxsize, axis: int = 2,
              slab_center=None, slab_width=None):
    """2D map of a scalar sampled on points within a slab.

    Equivalent of the reference's grav-map script (particles/hutils/
    grav_maps.py:61-100: slice + scipy.griddata) with NGP mean gridding —
    empty pixels hold 0.
    """
    if slab_center is None:
        slab_center = boxsize / 2.0
    if slab_width is None:
        slab_width = boxsize / 16.0
    sel = jnp.abs(pos[:, axis] - slab_center) <= slab_width / 2.0
    axes = [a for a in range(3) if a != axis]
    u = jnp.floor(pos[:, axes] / (boxsize / npix)).astype(jnp.int32) % npix
    flat = u[:, 0] * npix + u[:, 1]
    w = sel.astype(jnp.float32)
    vsum = jax.ops.segment_sum(w * values, flat, num_segments=npix ** 2)
    cnt = jax.ops.segment_sum(w, flat, num_segments=npix ** 2)
    out = jnp.where(cnt > 0, vsum / jnp.maximum(cnt, 1), 0.0)
    return out.reshape(npix, npix)


@partial(jax.jit, static_argnames=("patch_half",))
def object_cutouts(img, centers_pix, patch_half: int):
    """Fixed-size cutouts around object centers, clamped at borders
    (map_of_object.py:24-64). Returns (nobj, p, p)."""
    n = img.shape[-1]
    p = 2 * patch_half + 1

    def one(cen):
        r0 = jnp.clip(cen[0] - patch_half, 0, n - p)
        c0 = jnp.clip(cen[1] - patch_half, 0, n - p)
        return jax.lax.dynamic_slice(img, (r0, c0), (p, p))

    return jax.vmap(one)(centers_pix)


def paint_objects_on_map(npix: int, centers_pix, radii_pix, values=None):
    """Paint filled circles onto a fresh map (map_of_object.py:64-110)."""
    n = centers_pix.shape[0]
    vals = jnp.ones((n,)) if values is None else values
    ii = jnp.arange(npix)
    rr = ii[:, None] * jnp.ones((1, npix))
    cc = ii[None, :] * jnp.ones((npix, 1))

    def body(img, inputs):
        cen, rad, v = inputs
        d2 = (rr - cen[0]) ** 2 + (cc - cen[1]) ** 2
        return img + jnp.where(d2 <= rad ** 2, v, 0.0), None

    out, _ = jax.lax.scan(body, jnp.zeros((npix, npix)),
                          (centers_pix.astype(jnp.float32),
                           radii_pix.astype(jnp.float32), vals))
    return out
