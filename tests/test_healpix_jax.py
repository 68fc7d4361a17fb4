"""Device HEALPix (utils/healpix_jax) parity vs the float64 host module."""
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.utils import healpix as hpx
from astrild_tpu.utils import healpix_jax as hpj


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _random_angles(rng, n):
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    return theta, phi


@pytest.mark.parametrize("nside", [4, 64, 512])
def test_ang2pix_parity(rng, nside):
    theta, phi = _random_angles(rng, 20000)
    host = hpx.ang2pix_ring(nside, theta, phi)
    dev = np.asarray(hpj.ang2pix_ring(nside, theta.astype(np.float32),
                                      phi.astype(np.float32)))
    match = np.mean(dev == host)
    assert match > 0.999, f"nside={nside}: only {match:.4f} exact"
    # mismatches must be boundary effects: neighbouring pixel centers
    bad = dev != host
    if np.any(bad):
        t1, p1 = hpx.pix2ang_ring(nside, host[bad])
        t2, p2 = hpx.pix2ang_ring(nside, dev[bad].astype(np.int64))
        dphi = np.abs(np.mod(p1 - p2 + np.pi, 2 * np.pi) - np.pi)
        dist = np.hypot(t1 - t2, dphi * np.sin(0.5 * (t1 + t2)))
        pixscale = np.sqrt(4 * np.pi / hpx.nside2npix(nside))
        assert np.max(dist) < 3 * pixscale


def test_ang2pix_pixel_centers_exact():
    """Every pixel center maps back to its own pixel (no boundary
    ambiguity at centers)."""
    nside = 32
    ipix = np.arange(hpx.nside2npix(nside))
    theta, phi = hpx.pix2ang_ring(nside, ipix)
    dev = np.asarray(hpj.ang2pix_ring(nside, theta.astype(np.float32),
                                      phi.astype(np.float32)))
    npt.assert_array_equal(dev, ipix)


@pytest.mark.parametrize("nside", [4, 64])
def test_interp_weights_parity(rng, nside):
    theta, phi = _random_angles(rng, 5000)
    # keep clear of pixel-boundary ulp flips for the strict comparison
    hpix, hwgt = hpx.get_interp_weights(nside, theta, phi)
    dpix, dwgt = (np.asarray(a) for a in hpj.get_interp_weights(
        nside, theta.astype(np.float32), phi.astype(np.float32)))
    # weights sum to one
    npt.assert_allclose(dwgt.sum(0), 1.0, atol=1e-5)
    # stencil agreement for the overwhelming majority of points (float32
    # ring/phi boundary flips move weight between adjacent pixels only)
    same = np.all(dpix == hpix, axis=0)
    assert np.mean(same) > 0.99
    npt.assert_allclose(dwgt[:, same], hwgt[:, same], atol=2e-4)


def test_interp_val_smooth_field(rng):
    """Interpolating a smooth field matches the host interpolation and
    the analytic field itself."""
    nside = 64
    ipix = np.arange(hpx.nside2npix(nside))
    tc, pc = hpx.pix2ang_ring(nside, ipix)
    fmap = (np.cos(tc) ** 2 + 0.3 * np.sin(tc) * np.cos(pc)
            ).astype(np.float32)
    theta, phi = _random_angles(rng, 4000)
    host = hpx.get_interp_val(fmap.astype(np.float64), theta, phi)
    dev = np.asarray(hpj.get_interp_val(fmap, theta.astype(np.float32),
                                        phi.astype(np.float32)))
    npt.assert_allclose(dev, host, atol=5e-5)
    exact = np.cos(theta) ** 2 + 0.3 * np.sin(theta) * np.cos(phi)
    assert np.max(np.abs(dev - exact)) < 2e-3  # bilinear truncation


def test_interp_poles(rng):
    """Polar-cap fallback: points above ring 1 / below the last ring."""
    nside = 16
    n = 200
    theta = np.concatenate([rng.uniform(0, 1e-3, n),
                            np.pi - rng.uniform(0, 1e-3, n)])
    phi = rng.uniform(0, 2 * np.pi, 2 * n)
    fmap = rng.standard_normal(hpx.nside2npix(nside)).astype(np.float32)
    host = hpx.get_interp_val(fmap.astype(np.float64), theta, phi)
    dev = np.asarray(hpj.get_interp_val(fmap, theta.astype(np.float32),
                                        phi.astype(np.float32)))
    npt.assert_allclose(dev, host, atol=1e-4)


@pytest.mark.parametrize("nside", [4, 16, 64])
def test_pix2ang_parity(nside):
    """Device pix2ang_ring == host util at every pixel (f32 tolerance)."""
    ipix = np.arange(hpx.nside2npix(nside))
    th_h, ph_h = hpx.pix2ang_ring(nside, ipix)
    th_d, ph_d = hpj.pix2ang_ring(nside, ipix)
    npt.assert_allclose(np.asarray(th_d), th_h, atol=3e-6)
    npt.assert_allclose(np.asarray(ph_d), ph_h, atol=2e-5)


def test_remap_by_deflection_matches_host_chain(rng):
    """The fused device remap == the old host path (pix2ang on host +
    get_interp_val), which test_healpix pins against healpy semantics."""
    import jax.numpy as jnp

    nside = 16
    npix = hpx.nside2npix(nside)
    hpmap = rng.normal(size=npix).astype(np.float32)
    a_t = (rng.normal(size=npix) * 0.01).astype(np.float32)
    a_p = (rng.normal(size=npix) * 0.01).astype(np.float32)

    theta, phi = hpx.pix2ang_ring(nside, np.arange(npix))
    # remap_by_deflection applies a deterministic 1e-3-pixel tie-breaking
    # nudge (fusion-duplication defense); mirror it in the reference
    nudge = 1.0e-3 * (2.0 * np.pi / (4.0 * nside))
    ts = np.clip(theta + a_t + 0.5 * nudge, 0.0, np.pi)
    ps = phi + a_p / np.maximum(np.sin(theta), 1e-6) + nudge
    want = np.asarray(hpj.get_interp_val(jnp.asarray(hpmap),
                                         jnp.asarray(ts, jnp.float32),
                                         jnp.asarray(ps, jnp.float32)))
    got = np.asarray(hpj.remap_by_deflection(hpmap, a_t, a_p, nside))
    # identical stencils away from f32 pixel-boundary ties; the boundary
    # pixels (host f64 vs device f32 center rounding) get full-weight
    # neighbor swaps, so compare quantiles not max
    assert np.quantile(np.abs(got - want), 0.999) < 1e-4


def test_pix2ang_closed_form_boundaries_large_nside():
    """nside=2048 (pixel index far beyond f32's 2^24): every cap/belt
    boundary pixel plus strided samples must land on the host-f64 angle
    to well under a pixel. phi is the sharp check — a ring off-by-one
    shifts phi by O(2pi/nr) ~ 7.7e-4, while f32 phi precision is ~1e-6;
    theta carries the f32 arccos-near-pole precision (~5e-5, inherent
    to the device path) so it gets the looser pixel-relative bound."""
    nside = 2048
    npix = hpx.nside2npix(nside)
    ncap = 2 * nside * (nside - 1)
    idx = np.concatenate([
        np.arange(0, ncap, 997), np.arange(ncap, npix - ncap, 99733),
        np.arange(npix - ncap, npix, 997),
        np.array([0, ncap - 1, ncap, npix - ncap - 1, npix - ncap,
                  npix - 1])])
    th_h, ph_h = hpx.pix2ang_ring(nside, idx)
    th_d, ph_d = hpj.pix2ang_ring(nside, idx.astype(np.int32))
    pix_size = np.pi / (4 * nside)
    assert np.abs(np.asarray(th_d) - th_h).max() < 0.3 * pix_size
    assert np.abs(np.asarray(ph_d) - ph_h).max() < 1e-5
