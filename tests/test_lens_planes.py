"""Snapshot -> lens-plane builder: geometry, normalization, and the full
chain to raytraced maps."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import numpy.testing as npt

from astrild_tpu.ops import lens_planes as LPL

BOX = 500.0


@pytest.mark.slow
def test_deposit_path_matches_scan(rng):
    """The (plane, row, col)-key Pallas deposit path (interpret mode on
    CPU) reproduces the per-plane scatter scan to f32 roundoff across
    narrow/wide cones and multi-box lightcone depths."""
    import math

    n = 20000
    pos = tuple(jnp.asarray(rng.uniform(0, BOX, n), jnp.float32)
                for _ in range(3))
    for chi0, dchi, nplanes, fov, npix, n_rep in (
            (200.0, 31.25, 8, 0.35, 64, 0),
            (950.0, 100.0, 6, 0.6, 32, 1)):
        cs, chis = LPL._plane_counts_scan(pos, BOX, chi0, dchi, nplanes,
                                          fov, npix, 2, None, n_rep)
        k_lo = math.floor((chi0 - 0.5 * dchi) / BOX)
        k_hi = math.floor((chi0 + (nplanes - 0.5) * dchi) / BOX)
        cd, chis2 = LPL._plane_counts_deposit(pos, BOX, chi0, dchi,
                                              nplanes, fov, npix, 2,
                                              None, n_rep, k_lo, k_hi)
        npt.assert_allclose(np.asarray(cd), np.asarray(cs), atol=1e-4)
        npt.assert_array_equal(np.asarray(chis2), np.asarray(chis))


def test_uniform_box_gives_near_zero_delta(rng):
    n = 1 << 20
    pos = jnp.asarray(rng.uniform(0, BOX, (n, 3)).astype(np.float32))
    planes, chis = LPL.density_planes_from_particles(
        pos, BOX, 600.0, 200.0, 4, np.radians(2.0), 32)
    planes = np.asarray(planes)
    assert planes.shape == (4, 32, 32)
    npt.assert_allclose(np.asarray(chis), [600.0, 800.0, 1000.0, 1200.0])
    # Poisson noise: expected counts/pixel ~ nbar*dchi*(chi*pix)^2
    for i, chi in enumerate([600.0, 800.0, 1000.0, 1200.0]):
        expect = n / BOX ** 3 * 200.0 * (chi * np.radians(2.0) / 32) ** 2
        sigma = 1.0 / np.sqrt(expect)
        inner = planes[i][4:-4, 4:-4]  # away from FOV edges
        assert abs(inner.mean()) < 5 * sigma / np.sqrt(inner.size) * 10
        assert 0.5 * sigma < inner.std() < 1.5 * sigma


def test_clump_lands_on_expected_plane_and_pixel(rng):
    n_bg = 1 << 18
    pos_bg = rng.uniform(0, BOX, (n_bg, 3)).astype(np.float32)
    # clump at chi = 850 (plane 1 of centers 600/800/1000 with dchi=200
    # covers [700, 900)), offset +0.004 rad in the first transverse axis
    chi_c = 850.0
    z_c = chi_c % BOX  # box replication puts it back in [0, BOX)
    x_c = BOX / 2 + 0.004 * chi_c
    clump = np.tile(np.array([[x_c, BOX / 2, z_c]], np.float32),
                    (4096, 1))
    pos = jnp.asarray(np.concatenate([pos_bg, clump]))
    planes, chis = LPL.density_planes_from_particles(
        pos, BOX, 600.0, 200.0, 3, np.radians(2.0), 64)
    planes = np.asarray(planes)
    peak_plane = planes.max(axis=(1, 2))
    assert np.argmax(peak_plane) == 1
    i, j = np.unravel_index(planes[1].argmax(), planes[1].shape)
    pix = np.radians(2.0) / 64
    expect_i = 0.004 / pix + 64 / 2 - 0.5
    assert abs(i - expect_i) <= 1
    assert abs(j - (64 / 2 - 0.5)) <= 1


def test_chain_to_raytraced_maps(rng):
    from astrild_tpu.models import SkyArray

    n = 1 << 19
    pos = jnp.asarray(rng.uniform(0, BOX, (n, 3)).astype(np.float32))
    planes, chis = LPL.density_planes_from_particles(
        pos, BOX, 500.0, 250.0, 6, np.radians(3.0), 48)
    dchis = jnp.full((6,), 250.0)
    sky = SkyArray.from_density_planes(planes, chis, dchis, 2200.0, 0.3,
                                       3.0, method="raytrace")
    kap = np.asarray(sky.data["orig"])
    assert np.all(np.isfinite(kap))
    # Poisson planes: kappa is small shot noise, mean ~ 0
    assert abs(kap.mean()) < 0.01
    assert kap.std() < 0.1


def test_flat_component_input_matches_array(rng):
    n = 1 << 16
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    a, _ = LPL.density_planes_from_particles(
        jnp.asarray(pos), BOX, 600.0, 200.0, 2, np.radians(2.0), 16)
    b, _ = LPL.density_planes_from_particles(
        (jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
         jnp.asarray(pos[:, 2])), BOX, 600.0, 200.0, 2,
        np.radians(2.0), 16)
    npt.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dchi_thicker_than_box_raises(rng):
    # dchi > boxsize makes the periodic slab test always-true (every
    # particle paints once per plane) while the normalization expects
    # dchi/boxsize images -> silently biased delta. Must refuse.
    import pytest

    pos = tuple(jnp.asarray(rng.uniform(0, BOX, 100), jnp.float32)
                for _ in range(3))
    with pytest.raises(ValueError, match="exceeds boxsize"):
        LPL.density_planes_from_particles(pos, BOX, 300.0, 1.2 * BOX,
                                          2, 0.05, 16)
