"""Lensing ops tests: reference golden values + analytic limits."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import lensing as L

# Halo row 0 of the reference's tests/test_data/rockstar_in_lc.h5 — the
# inputs behind the reference's golden-value tests
# (tests/unit/rays/skys/test_skyarray.py:22-48).
HALO = dict(
    r200_deg=0.07890977884225592,
    m200=306600000000000.0,
    c_NFW=1.9267420919614187,
    rad_dist=961.2600098657648,
    theta1_tv=-739.4726456797774,
    theta2_tv=305.8846747823117,
    r200_pix=33,
)


def test_nfw_alpha_golden():
    """Reference golden: alpha extrema +-9.022627514863e-05."""
    npix = int(2 * HALO["r200_pix"] * 10) + 1
    amap = L.nfw_deflection_angle_map(
        HALO["r200_deg"], HALO["m200"], HALO["c_NFW"], HALO["rad_dist"],
        npix=npix, extent=10, directions=(0, 1), suppress=True,
        suppression_r=10,
    )
    amap = np.asarray(amap)
    npt.assert_allclose(amap.min(), -9.02262751486356e-05, rtol=1e-4)
    npt.assert_allclose(amap.max(), 9.02262751486356e-05, rtol=1e-4)


def test_nfw_dt_golden():
    """Reference golden: dT/T extrema +-1.7028239210e-07."""
    npix = int(2 * HALO["r200_pix"] * 10) + 1
    dt = L.nfw_temperature_perturbation_map(
        HALO["r200_deg"], HALO["m200"], HALO["c_NFW"],
        jnp.array([HALO["theta1_tv"], HALO["theta2_tv"]]),
        HALO["rad_dist"], npix=npix, extent=10, directions=(0, 1),
        suppress=True, suppression_r=10,
    )
    dt = np.asarray(dt)
    npt.assert_allclose(dt.min(), -1.7028239210299853e-07, rtol=1e-4)
    npt.assert_allclose(dt.max(), 1.7028239210299855e-07, rtol=1e-4)
    # antisymmetric dipole: mean ~ 0
    assert abs(dt.mean()) < 1e-12


def test_kappa_to_alpha_point_mass():
    """Band-limited 'point mass' (narrow blob): alpha_r = m/(pi r) outward.

    Matches the reference C-library kernel x/(pi r^2)
    (lib_so_cgls/lensing_funcs.c:45-115).
    """
    n = 128
    oa = 1.0  # opening angle (radians, arbitrary unit)
    ds = oa / n
    sigma = 2.0 * ds
    e = (jnp.arange(n) + 0.5) * ds - oa / 2.0
    r2 = e[:, None] ** 2 + e[None, :] ** 2
    kappa = jnp.exp(-r2 / (2 * sigma ** 2))
    m = float(jnp.sum(kappa)) * ds * ds
    a1, a2 = L.kappa_to_alpha(kappa, oa, padding_factor=4)
    a1 = np.asarray(a1)
    offsets = np.array([10, 16, 24])
    # the blob center sits between pixels n//2-1 and n//2; sample along
    # axis 0 at radius (off+0.5)*ds from the center
    vals = a1[n // 2 + offsets, n // 2 - 1:n // 2 + 1].mean(axis=1)
    x = (offsets + 0.5) * ds
    expect = (m / np.pi) / x
    npt.assert_allclose(vals, expect, rtol=0.05)


def test_kappa_alpha_gamma_roundtrip_gaussian():
    """For kappa = gaussian blob, div(alpha)/2 recovers kappa (center)."""
    n = 128
    oa = 1.0
    e = (jnp.arange(n) + 0.5) / n - 0.5
    r2 = e[:, None] ** 2 + e[None, :] ** 2
    kappa = jnp.exp(-r2 / (2 * 0.05 ** 2))
    a1, a2 = L.kappa_to_alpha(kappa, oa, padding_factor=4)
    ds = oa / n
    div = (jnp.gradient(a1, ds, axis=0) + jnp.gradient(a2, ds, axis=1))
    got = np.asarray(div / 2.0)
    want = np.asarray(kappa)
    c = n // 2
    sl = np.s_[c - 16:c + 16, c - 16:c + 16]
    npt.assert_allclose(got[sl], want[sl], atol=0.02)


def test_alpha_to_gamma_shapes_and_symmetry():
    n = 64
    key = jax.random.PRNGKey(0)
    kappa = jax.random.normal(key, (n, n)) * 0.01
    a1, a2 = L.kappa_to_alpha(kappa, 1.0)
    g1, g2 = L.alpha_to_gamma(a1, a2, 1.0)
    assert g1.shape == (n, n) and g2.shape == (n, n)
    assert np.all(np.isfinite(np.asarray(g1)))


def test_kappa_to_gamma_matches_alpha_gradient_chain():
    """Direct spectral shear == kappa_to_alpha + alpha_to_gamma in the
    interior (the chain's finite differences are 2nd-order; edges keep
    the one-sided-difference discrepancy), and exact spin-2 spectral
    identity for a single plane-wave kappa."""
    n = 128
    oa = 1.0
    e = (jnp.arange(n) + 0.5) / n - 0.5
    r2 = e[:, None] ** 2 + e[None, :] ** 2
    kappa = jnp.exp(-r2 / (2 * 0.07 ** 2))
    g1, g2 = L.kappa_to_gamma(kappa, oa, padding_factor=4)
    a1, a2 = L.kappa_to_alpha(kappa, oa, padding_factor=4)
    g1c, g2c = L.alpha_to_gamma(a1, a2, oa)
    sl = np.s_[8:-8, 8:-8]
    scale = float(jnp.max(jnp.abs(kappa)))
    npt.assert_allclose(np.asarray(g1)[sl], np.asarray(g1c)[sl],
                        atol=2e-3 * scale)
    npt.assert_allclose(np.asarray(g2)[sl], np.asarray(g2c)[sl],
                        atol=2e-3 * scale)
    # plane wave: gamma/kappa = ((k1^2-k2^2) + 2 i k1 k2)/k^2 exactly.
    # (pad=1: the wave is periodic, so no padding artifacts at all)
    kx_i, ky_i = 3, 5
    ph = 2.0 * jnp.pi * (kx_i * jnp.arange(n)[:, None]
                         + ky_i * jnp.arange(n)[None, :]) / n
    kw = jnp.cos(ph)
    gw1, gw2 = L.kappa_to_gamma(kw, oa, padding_factor=1)
    fac = (kx_i ** 2 - ky_i ** 2) / (kx_i ** 2 + ky_i ** 2)
    fac2 = 2.0 * kx_i * ky_i / (kx_i ** 2 + ky_i ** 2)
    npt.assert_allclose(np.asarray(gw1), fac * np.asarray(kw), atol=1e-4)
    npt.assert_allclose(np.asarray(gw2), fac2 * np.asarray(kw), atol=1e-4)


def test_add_patch_to_map_center_and_clip():
    big = jnp.zeros((10, 10))
    patch = jnp.ones((3, 3))
    out = np.asarray(L.add_patch_to_map(big, patch, (5, 5)))
    assert out.sum() == 9.0
    assert out[5, 5] == 1.0 and out[4, 4] == 1.0
    # clipped at corner: only the in-bounds quarter lands
    out2 = np.asarray(L.add_patch_to_map(big, patch, (0, 0)))
    npt.assert_allclose(out2.sum(), 4.0)
    assert out2[0, 0] == 1.0


def test_paint_halo_patches_matches_loop(rng):
    big = jnp.zeros((32, 32))
    patches = jnp.asarray(rng.standard_normal((5, 7, 7)).astype(np.float32))
    centers = jnp.asarray(rng.integers(0, 32, (5, 2)).astype(np.int32))
    got = L.paint_halo_patches(big, patches, centers)
    want = big
    for i in range(5):
        want = L.add_patch_to_map(want, patches[i], (centers[i][0], centers[i][1]))
    npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_born_convergence_single_plane():
    # One plane at chi = chi_s/2 with delta=1 everywhere:
    # kappa = 1.5 Om (H0/c)^2 * (chi_s/4) * dchi
    n = 8
    chi_s = 2000.0
    chis = jnp.array([1000.0])
    dchis = jnp.array([100.0])
    planes = jnp.ones((1, n, n))
    om = 0.3
    kappa = L.born_convergence(planes, chis, dchis, chi_s, om)
    expect = 1.5 * om * (100.0 / 299792.458) ** 2 * (chi_s / 4.0) * 100.0
    npt.assert_allclose(np.asarray(kappa), expect, rtol=1e-5)


def test_code_to_phy_units():
    c = 299792.458
    npt.assert_allclose(L.code_to_phy_units_factor("kappa_2"), 1 / c ** 2)
    npt.assert_allclose(L.code_to_phy_units_factor("isw_rs"), 1 / c ** 3)
    npt.assert_allclose(L.code_to_phy_units_factor("other"), 1.0)


@pytest.mark.slow
def test_born_kappa_matches_limber_theory():
    """4-way consistency of the lensing stack: Gaussian density slabs
    with the linear P(k, z) (cl_to_flat_map), Born-integrated to kappa
    (born_convergence), measured with cl_flat_sky, must reproduce the
    Limber prediction cl_kappa_limber — the theory anchor the reference
    never had for its measured Ray-Ramses kappa spectra."""
    import jax

    from astrild_tpu.ops import lensing
    from astrild_tpu.ops.angular_power import (cl_flat_sky,
                                               cl_kappa_limber,
                                               cl_to_flat_map)
    from astrild_tpu.ops.linear_power import linear_power, normalization
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    z_s = 1.0
    chi_s = float(cosmo.comoving_distance(z_s))
    npix, theta_deg, nplane = 128, 10.0, 16
    amp = normalization(cosmo)

    chis = (np.arange(nplane) + 0.5) * chi_s / nplane
    dchi = chi_s / nplane
    zs = np.asarray(cosmo.redshift_at_comoving_distance(jnp.asarray(chis)))
    ells_tab = jnp.asarray(np.geomspace(1.0, 3e4, 256), jnp.float32)

    def kappa_once(key):
        keys = jax.random.split(key, nplane)
        planes = []
        for i in range(nplane):
            # slab angular power: C_l = P3D(l/chi, z) / (dchi * chi^2)
            k = ells_tab / chis[i]
            cl_i = linear_power(k, cosmo, z=float(zs[i]), amplitude=amp) \
                / (dchi * chis[i] ** 2)
            planes.append(cl_to_flat_map(keys[i], ells_tab, cl_i, npix,
                                         theta_deg))
        planes = jnp.stack(planes)
        return lensing.born_convergence(
            planes, jnp.asarray(chis), jnp.full((nplane,), dchi), chi_s,
            cosmo.Om0, scale_factors=jnp.asarray(1.0 / (1.0 + zs),
                                                 jnp.float32))

    ratios = []
    for seed in range(4):
        kappa = kappa_once(jax.random.PRNGKey(seed))
        ell_m, cl_m = cl_flat_sky(kappa, theta_deg, nbins=24)
        cl_t = cl_kappa_limber(np.asarray(ell_m), cosmo, z_source=z_s)
        band = (np.asarray(ell_m) > 200) & (np.asarray(ell_m) < 1500)
        ratios.append(np.asarray(cl_m)[band].sum()
                      / np.asarray(cl_t)[band].sum())
    r = np.mean(ratios)
    assert 0.75 < r < 1.3, ratios


def test_nfw_dipole_patch_antisymmetry():
    """Fixed-angular-size moving-lens patch: dT = -alpha.v/c is odd along
    the velocity direction and has a sensible micro-Kelvin amplitude
    (astrildvisual/rays/visuals.py:317-417 analytic-map helper role)."""
    dt = np.asarray(L.nfw_dipole_patch(1e15, [1000.0, 0.0], 0.3,
                                       extent_deg=0.5, npix=64))
    assert dt.shape == (64, 64)
    # odd under x -> -x (the grid of nfw_deflection_angle_map is symmetric
    # about 0 because linspace includes both endpoints)
    npt.assert_allclose(dt, -dt[:, ::-1], rtol=2e-5, atol=1e-12)
    # y-velocity instead: odd along rows
    dty = np.asarray(L.nfw_dipole_patch(1e15, [0.0, 1000.0], 0.3,
                                        extent_deg=0.5, npix=64))
    npt.assert_allclose(dty, -dty[::-1, :], rtol=2e-5, atol=1e-12)
    amp = float(np.abs(dt).max())
    assert 1e-9 < amp < 1e-5, amp


def test_tomographic_cross_kappa_matches_limber():
    """Tomography: the SAME Gaussian density slabs Born-integrated to two
    source planes; the measured cross-Cl must match the cross-kernel
    Limber prediction (and the cross estimator must agree with the auto
    estimator in the equal-bin limit)."""
    import jax

    from astrild_tpu.ops import lensing
    from astrild_tpu.ops.angular_power import (cl_flat_sky,
                                               cl_flat_sky_cross,
                                               cl_kappa_cross_limber,
                                               cl_to_flat_map)
    from astrild_tpu.ops.linear_power import linear_power, normalization
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    z_hi, z_lo = 1.0, 0.5
    chi_hi = float(cosmo.comoving_distance(z_hi))
    chi_lo = float(cosmo.comoving_distance(z_lo))
    npix, theta_deg, nplane = 128, 10.0, 16
    amp = normalization(cosmo)
    chis = (np.arange(nplane) + 0.5) * chi_hi / nplane
    dchi = chi_hi / nplane
    zs = np.asarray(cosmo.redshift_at_comoving_distance(jnp.asarray(chis)))

    ells_tab = jnp.asarray(np.geomspace(1.0, 3e4, 256), jnp.float32)

    def planes_once(key):
        keys = jax.random.split(key, nplane)
        out = []
        for i in range(nplane):
            k = ells_tab / chis[i]
            cl_i = linear_power(k, cosmo, z=float(zs[i]), amplitude=amp) \
                / (dchi * chis[i] ** 2)
            out.append(cl_to_flat_map(keys[i], ells_tab, cl_i, npix,
                                      theta_deg))
        return jnp.stack(out)

    a = jnp.asarray(1.0 / (1.0 + zs), jnp.float32)
    ratios = []
    for seed in range(4):
        planes = planes_once(jax.random.PRNGKey(seed))
        kap_hi = lensing.born_convergence(
            planes, jnp.asarray(chis), jnp.full((nplane,), dchi), chi_hi,
            cosmo.Om0, scale_factors=a)
        kap_lo = lensing.born_convergence(
            planes, jnp.asarray(chis), jnp.full((nplane,), dchi), chi_lo,
            cosmo.Om0, scale_factors=a)
        ell_m, cl_x = cl_flat_sky_cross(kap_hi, kap_lo, theta_deg,
                                        nbins=24)
        cl_t = cl_kappa_cross_limber(np.asarray(ell_m), cosmo, z_hi, z_lo)
        band = (np.asarray(ell_m) > 200) & (np.asarray(ell_m) < 1500)
        ratios.append(np.asarray(cl_x)[band].sum()
                      / np.asarray(cl_t)[band].sum())
        if seed == 0:
            # equal-bin limit: cross estimator == auto estimator
            _, cl_auto = cl_flat_sky(kap_hi, theta_deg, nbins=24)
            _, cl_self = cl_flat_sky_cross(kap_hi, kap_hi, theta_deg,
                                           nbins=24)
            npt.assert_allclose(np.asarray(cl_self), np.asarray(cl_auto),
                                rtol=1e-5)
    r = np.mean(ratios)
    assert 0.7 < r < 1.35, ratios
