"""3D void finders (ops/voids3d.py): SVF enclosed-density spheres and the
ZOBOV-style 3D watershed. The reference only read external SVF/ZOBOV
catalogs (rays/void.py:83-127); these finders are native."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astrild_tpu.ops import voids3d


def _spherical_void(ngrid, boxsize, center, r0, depth=-0.9):
    """Compensated top-hat void: depth inside r0, uniform positive bg so
    the box mean is exactly zero. Returns (delta, bg)."""
    cell = boxsize / ngrid
    x = (np.arange(ngrid) + 0.5) * cell
    dx = x[:, None, None] - center[0]
    dy = x[None, :, None] - center[1]
    dz = x[None, None, :] - center[2]
    for d in (dx, dy, dz):
        d -= boxsize * np.round(d / boxsize)
    r = np.sqrt(dx ** 2 + dy ** 2 + dz ** 2)
    inside = r < r0
    n_in = inside.sum()
    bg = -depth * n_in / (ngrid ** 3 - n_in)
    delta = np.where(inside, depth, bg).astype(np.float32)
    return jnp.asarray(delta), bg


def test_svf_recovers_analytic_crossing_radius():
    ngrid, L, r0, depth = 64, 64.0, 12.0, -0.9
    center = np.array([32.0, 32.0, 32.0])
    delta, bg = _spherical_void(ngrid, L, center, r0, depth)
    thr = -0.45
    # mean enclosed: (depth - bg)(r0/R)^3 + bg = thr
    r_star = r0 / (((thr - bg) / (depth - bg)) ** (1.0 / 3.0))
    cat = voids3d.svf_voids(delta, L, delta_threshold=thr, max_voids=32,
                            n_radii=32)
    assert int(cat.n) >= 1
    # largest void is the injected one
    np.testing.assert_allclose(np.asarray(cat.pos)[0], center, atol=1.0)
    assert abs(float(cat.radius[0]) - r_star) / r_star < 0.06
    assert float(cat.min_delta[0]) < -0.5


def test_svf_two_voids_sorted_and_periodic():
    ngrid, L = 64, 64.0
    d1, _ = _spherical_void(ngrid, L, np.array([0.0, 0.0, 0.0]), 10.0)
    d2, _ = _spherical_void(ngrid, L, np.array([40.0, 40.0, 40.0]), 6.0)
    delta = d1 + d2
    cat = voids3d.svf_voids(delta, L, delta_threshold=-0.5, max_voids=32)
    assert int(cat.n) >= 2
    pos = np.asarray(cat.pos)[:2]
    rad = np.asarray(cat.radius)[:2]
    assert rad[0] > rad[1] > 0
    # periodic void center sits at the box corner
    dist_corner = np.linalg.norm((pos[0] - 0.0 + L / 2) % L - L / 2)
    assert dist_corner < 1.5
    np.testing.assert_allclose(pos[1], [40.0, 40.0, 40.0], atol=1.5)


def test_sphere_overlap_fraction_cases():
    L = 100.0
    c = jnp.zeros(3)
    same = voids3d.sphere_overlap_fraction(c, 5.0, c, 5.0, L)
    assert abs(float(same) - 1.0) < 1e-5
    far = voids3d.sphere_overlap_fraction(
        c, 5.0, jnp.array([30.0, 0.0, 0.0]), 5.0, L)
    assert float(far) == 0.0
    # containment: small sphere fully inside big one
    inside = voids3d.sphere_overlap_fraction(
        c, 2.0, jnp.array([1.0, 0.0, 0.0]), 10.0, L)
    assert abs(float(inside) - 1.0) < 1e-5
    big = voids3d.sphere_overlap_fraction(
        c, 10.0, jnp.array([1.0, 0.0, 0.0]), 2.0, L)
    assert abs(float(big) - (2.0 / 10.0) ** 3) < 1e-5
    # periodic image: centers 2 apart across the wrap
    wrap = voids3d.sphere_overlap_fraction(
        jnp.array([1.0, 0.0, 0.0]), 5.0,
        jnp.array([99.0, 0.0, 0.0]), 5.0, L)
    nowrap = voids3d.sphere_overlap_fraction(
        jnp.array([1.0, 0.0, 0.0]), 5.0,
        jnp.array([3.0, 0.0, 0.0]), 5.0, L)
    np.testing.assert_allclose(float(wrap), float(nowrap), rtol=1e-5)


def test_enclosed_density_radius_zero_when_no_void():
    ngrid, L = 32, 32.0
    delta = jnp.zeros((ngrid,) * 3)
    rstar = voids3d.enclosed_density_radius(delta, L, 1.5, 8.0,
                                            delta_threshold=-0.8)
    assert float(jnp.max(rstar)) == 0.0


def test_watershed3d_two_basins():
    ngrid, L = 48, 48.0
    cell = L / ngrid
    x = (np.arange(ngrid) + 0.5) * cell
    xx = x[:, None, None]
    yy = x[None, :, None]
    zz = x[None, None, :]

    def gauss_well(c, depth, sig):
        r2 = ((xx - c[0]) ** 2 + (yy - c[1]) ** 2 + (zz - c[2]) ** 2)
        return depth * np.exp(-0.5 * r2 / sig ** 2)

    delta = (gauss_well([12, 12, 12], -1.0, 4.0)
             + gauss_well([36, 36, 36], -0.95, 3.0)).astype(np.float32)
    cat = voids3d.watershed_voids_3d(jnp.asarray(delta), L, max_voids=16,
                                     core_delta=-0.5)
    assert int(cat.n) == 2
    pos = np.asarray(cat.pos)[:2]
    found = {tuple(np.round(p / 12).astype(int)) for p in pos}
    assert found == {(1, 1, 1), (3, 3, 3)}
    assert (np.asarray(cat.radius)[:2] > 0).all()
    assert (np.asarray(cat.min_delta)[:2] < -0.5).all()


def test_svf_catalog_dict_feeds_voids_model():
    from astrild_tpu.models.voids import Voids

    ngrid, L = 48, 48.0
    delta, _ = _spherical_void(ngrid, L, np.array([24.0, 24.0, 24.0]), 9.0)
    cat = voids3d.svf_voids(delta, L, delta_threshold=-0.5, max_voids=16)
    data = voids3d.svf_catalog_dict(cat, overlap=0.5)
    voids = Voids(data, finder="svf")
    sel = voids.filter_sigma(0.5)
    assert sel["x"].shape[0] == int(cat.n)
    assert (sel["radius"] > 0).all()


def test_model_facades_svf_and_watershed3d():
    from astrild_tpu.models.voids import (SphericalVoidFinder3D, Voids,
                                          WatershedFinder3D)

    ngrid, L = 48, 48.0
    delta, _ = _spherical_void(ngrid, L, np.array([24.0, 24.0, 24.0]), 9.0)

    svf = SphericalVoidFinder3D(delta, L)
    cat = svf.find_voids(delta_threshold=-0.5, max_voids=16)
    assert cat["x"].shape[0] == int(svf.catalog.n) >= 1
    voids = Voids.from_finder(svf)
    assert voids.finder == "svf"
    assert (voids.filter_sigma(0.5)["radius"] > 0).all()

    wvf = WatershedFinder3D(delta, L)
    catw = wvf.find_voids(core_delta=-0.3)
    assert catw["halo_den"].shape == catw["radius"].shape
    voids_w = Voids.from_finder(wvf)
    assert voids_w.finder == "zobov"

    # particle-path constructor
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, L, (20000, 3)).astype(np.float32)
    r = np.linalg.norm((pos - 24.0 + L / 2) % L - L / 2, axis=1)
    pos = pos[r > 9.0]  # carve the void out of the tracers
    svf2 = SphericalVoidFinder3D.from_particles(jnp.asarray(pos), ngrid, L)
    cat2 = svf2.find_voids(delta_threshold=-0.5, max_voids=16)
    found = np.array([cat2["x"][0], cat2["y"][0], cat2["z"][0]])
    assert np.linalg.norm(found - 24.0) < 4.0


def test_svf_capacity_reports_candidates():
    """n_candidates reports the pre-truncation count so a too-small
    max_voids is visible (same contract as find_tunnels)."""
    rng = np.random.default_rng(5)
    ngrid, L = 32, 32.0
    # white-noise field with many shallow dips
    delta = jnp.asarray(rng.normal(0, 0.5, (ngrid,) * 3).astype(np.float32))
    delta = delta - jnp.mean(delta)
    cat_small = voids3d.svf_voids(delta, L, delta_threshold=-0.2,
                                  max_voids=4)
    cat_big = voids3d.svf_voids(delta, L, delta_threshold=-0.2,
                                max_voids=64)
    assert int(cat_small.n_candidates) == int(cat_big.n_candidates)
    assert int(cat_small.n_candidates) > 4  # truncation visible
    assert int(cat_small.n) <= 4
