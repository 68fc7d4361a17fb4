"""Native HEALPix (RING) pixelization tests: exact invariants."""
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.models.skyhealpix import SkyHealpix
from astrild_tpu.utils import healpix as hp


@pytest.mark.parametrize("nside", [1, 2, 4, 16, 64])
def test_pix_ang_roundtrip(nside):
    npix = hp.nside2npix(nside)
    ipix = np.arange(npix)
    theta, phi = hp.pix2ang_ring(nside, ipix)
    back = hp.ang2pix_ring(nside, theta, phi)
    npt.assert_array_equal(back, ipix)


def test_ang2pix_covers_all_pixels():
    nside = 8
    rng = np.random.default_rng(0)
    n = 200000
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    pix = hp.ang2pix_ring(nside, np.arccos(z), phi)
    assert pix.min() >= 0 and pix.max() < hp.nside2npix(nside)
    counts = np.bincount(pix, minlength=hp.nside2npix(nside))
    # equal-area pixels: uniform sphere sampling -> near-uniform counts
    expect = n / hp.nside2npix(nside)
    assert counts.min() > 0.5 * expect and counts.max() < 1.6 * expect


def test_pixel_theta_ordering():
    # RING scheme: theta non-decreasing with ring
    nside = 16
    theta, _ = hp.pix2ang_ring(nside, np.arange(hp.nside2npix(nside)))
    dtheta = np.diff(theta)
    assert np.all(dtheta > -1e-12)


def test_vec_ang_roundtrip():
    theta = np.array([0.3, 1.2, 2.8])
    phi = np.array([0.1, 3.0, 5.5])
    v = hp.ang2vec(theta, phi)
    t2, p2 = hp.vec2ang(v)
    npt.assert_allclose(t2, theta, atol=1e-12)
    npt.assert_allclose(p2, phi, atol=1e-12)


def test_rotate_map_identity_and_energy():
    nside = 16
    rng = np.random.default_rng(1)
    m = rng.normal(0, 1, hp.nside2npix(nside))
    out = hp.rotate_map(m, np.eye(3))
    npt.assert_array_equal(out, m)
    # 90-degree rotation permutes pixels: same histogram
    rz = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    out = hp.rotate_map(m, rz)
    npt.assert_allclose(sorted(out), sorted(m), atol=1e-12)


def test_skyhealpix_from_columns_binning():
    nside = 8
    # all samples in one known pixel
    theta = np.full(10, np.pi / 2)
    phi = np.full(10, 0.1)
    vals = np.arange(10.0)
    sky = SkyHealpix.from_columns(
        {"the_co": theta, "phi_co": phi, "kappa_2": vals}, "kappa_2", nside)
    pix = hp.ang2pix_ring(nside, np.pi / 2, 0.1)
    npt.assert_allclose(sky.data["orig"][pix], 4.5)
    # untouched pixels are UNSEEN
    assert np.sum(sky.data["orig"] != hp.UNSEEN) == 1


def test_skyhealpix_projection_and_mask():
    nside = 32
    npix_hp = hp.nside2npix(nside)
    ipix = np.arange(npix_hp)
    theta, _ = hp.pix2ang_ring(nside, ipix)
    m = np.cos(theta)  # smooth dipole field
    sky = SkyHealpix(m)
    flat = sky.to_skyarray(10.0, 32, center_theta_phi=(np.pi / 2, 1.0))
    arr = np.asarray(flat.data["orig"])
    assert arr.shape == (32, 32)
    # equator-centered patch of cos(theta): values straddle 0
    assert arr.min() < 0 < arr.max()
    mask = sky.create_mask(theta_range=(0, np.pi / 2))
    assert 0.45 < mask.mean() < 0.55


def test_cmb_lensing_remap_shifts_pattern():
    nside = 32
    ipix = np.arange(hp.nside2npix(nside))
    theta, phi = hp.pix2ang_ring(nside, ipix)
    cmb = np.sin(3 * phi)
    sky = SkyHealpix(cmb)
    out = sky.lens_cmb_by_deflection(cmb, np.zeros_like(cmb),
                                     np.full_like(cmb, 0.3))
    # the remap applies dphi = alpha/sin(theta): compare near the equator
    # where the shift is ~0.3 exactly
    eq = np.abs(theta - np.pi / 2) < 0.2
    corr_same = np.corrcoef(out[eq], cmb[eq])[0, 1]
    shifted = np.sin(3 * (phi + 0.3))
    corr_shift = np.corrcoef(out[eq], shifted[eq])[0, 1]
    assert corr_shift > corr_same
    assert corr_shift > 0.95
