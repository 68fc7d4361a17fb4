"""SZ observables (ops/sz.py): projected NFW mass closure, tau/kSZ scales
and signs, GNFW Compton-y against a float64 oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astrild_tpu.ops import sz


def _cyl_mass_analytic(m200, c, r200, x):
    """Wright & Brainerd cylindrical NFW mass M_2D(< x*r_s)."""
    rs = r200 / c
    rho_s = m200 * c ** 3 / (4 * np.pi * r200 ** 3
                             * (np.log(1 + c) - c / (1 + c)))
    if x < 1:
        g = np.log(x / 2) + np.arccosh(1 / x) / np.sqrt(1 - x ** 2)
    else:
        g = np.log(x / 2) + np.arccos(1 / x) / np.sqrt(x ** 2 - 1)
    return 4 * np.pi * rho_s * rs ** 3 * g


def test_nfw_sigma_cylindrical_mass_closure():
    m200, c, r200 = 1e15, 5.0, 2.0
    npix, extent = 512, 1.0
    sig = np.asarray(sz.nfw_sigma_map(m200, c, r200, npix=npix,
                                      extent=extent))
    pix = 2.0 * extent * r200 / npix
    edges = np.linspace(-extent * r200, extent * r200, npix)
    tx, ty = np.meshgrid(edges, edges)
    r = np.sqrt(tx ** 2 + ty ** 2)
    for rcut in (0.5 * r200, 0.9 * r200):
        m_map = sig[r < rcut].sum() * pix ** 2
        m_true = _cyl_mass_analytic(m200, c, r200, rcut / (r200 / c))
        assert abs(m_map / m_true - 1.0) < 0.02


def test_tau_scale_and_shape():
    tau = np.asarray(sz.nfw_tau_map(1e15, 5.0, 2.0, npix=128))
    assert np.isfinite(tau).all() and (tau > 0).all()
    center = tau[64, 64]
    assert 1e-4 < center < 5e-2          # cluster-scale optical depth
    assert center == tau.max()
    assert tau[0, 0] < 0.1 * center      # falls off toward corners


def test_ksz_sign_and_linearity():
    tau = sz.nfw_tau_map(3e14, 6.0, 1.2, npix=64)
    dt_away = np.asarray(sz.ksz_patch(tau, +300.0))
    dt_toward = np.asarray(sz.ksz_patch(tau, -300.0))
    assert (dt_away < 0).all()           # receding -> decrement
    np.testing.assert_allclose(dt_away, -dt_toward, rtol=1e-6)
    dt2 = np.asarray(sz.ksz_patch(tau, +600.0))
    np.testing.assert_allclose(dt2, 2 * dt_away, rtol=1e-6)
    # cluster kSZ ~ tens of microK at the center
    assert 1e-6 < -dt_away.min() < 1e-3
    d = np.asarray(sz.ksz_patch_from_halo(3e14, 6.0, 1.2, 300.0, npix=64))
    np.testing.assert_allclose(d, dt_away, rtol=1e-6)


def test_compton_y_oracle_and_scale():
    m500, r500, ez = 5e14, 1.3, 1.0
    npix, n_los = 64, 128
    y = np.asarray(sz.compton_y_patch(m500, r500, ez, npix=npix,
                                      extent=2.0, n_los=n_los))
    # float64 oracle at a few pixels
    p0, c500, gam, alp, bet = sz.GNFW_ARNAUD10
    h70 = 0.968
    prefac = 6.6524587158e-25 / 511.0 * 3.0856775814913673e24
    amp = 1.65e-3 * (m500 / (3e14 / h70)) ** (2 / 3) * h70 ** 2
    edges = np.linspace(-2.0 * r500, 2.0 * r500, npix)
    l = np.linspace(-5.0 * r500, 5.0 * r500, n_los)
    dl = l[1] - l[0]
    for (i, j) in ((npix // 2, npix // 2), (10, 40), (0, 0)):
        rperp = np.sqrt(edges[j] ** 2 + edges[i] ** 2)
        x = np.sqrt(rperp ** 2 + l ** 2) / r500
        cx = np.maximum(c500 * x, 1e-8)
        p = p0 / (cx ** gam * (1 + cx ** alp) ** ((bet - gam) / alp))
        y_o = prefac * amp * p.sum() * dl
        np.testing.assert_allclose(y[i, j], y_o, rtol=2e-3)
    # magnitude: massive cluster central y ~ 1e-4
    yc = y[npix // 2, npix // 2]
    assert 3e-5 < yc < 1e-3
    # quadrature convergence: doubling n_los moves y by < 0.5%
    y2 = np.asarray(sz.compton_y_patch(m500, r500, ez, npix=npix,
                                       extent=2.0, n_los=2 * n_los))
    np.testing.assert_allclose(y2[npix // 2], y[npix // 2], rtol=5e-3)


def test_skyarray_ksz_facade():
    from astrild_tpu.models.skymap import SkyArray

    halo = {"r200_deg": 0.1, "m200": 5e14, "c_NFW": 6.0, "Dc": 1200.0,
            "v_los": 400.0}
    sky = SkyArray.from_halo_series(halo, npix=64, extent=1.0,
                                    direction=(0,), suppress=False,
                                    suppression_R=1.0, to="ksz")
    arr = np.asarray(sky.data["orig"])
    assert (arr < 0).all() and np.isfinite(arr).all()

    cat = {"r200_deg": np.array([0.1, 0.08]), "m200": np.array([5e14, 2e14]),
           "c_NFW": np.array([6.0, 7.0]), "Dc": np.array([1200.0, 1500.0]),
           "v_los": np.array([400.0, -300.0]),
           "theta1_pix": np.array([100, 400]),
           "theta2_pix": np.array([150, 420]),
           "r200_pix": np.array([25.0, 20.0])}
    sky2 = SkyArray.from_halo_dataframe(cat, npix=512, extent=1.0,
                                        direction=(0,), suppress=False,
                                        suppression_R=1.0, to="ksz",
                                        opening_angle=2.0, patch_npix=51)
    m = np.asarray(sky2.data["orig"])
    # receding halo paints a decrement at its center, approaching an
    # increment at the other
    assert m[150, 100] < 0 < m[420, 400]


def test_skyarray_tsz_y_facade():
    from astrild_tpu.models.skymap import SkyArray

    cat = {"r200_deg": np.array([0.1]), "m200": np.array([5e14]),
           "c_NFW": np.array([6.0]), "Dc": np.array([1200.0]),
           "m500": np.array([4e14]), "r500": np.array([1.2]),
           "e_z": np.array([1.2]),
           "theta1_pix": np.array([128]), "theta2_pix": np.array([128]),
           "r200_pix": np.array([25.0])}
    sky = SkyArray.from_halo_dataframe(cat, npix=256, extent=2.0,
                                       direction=(0,), suppress=False,
                                       suppression_R=1.0, to="y",
                                       opening_angle=2.0, patch_npix=51)
    m = np.asarray(sky.data["orig"])
    assert sky.quantity == "y"
    assert m.max() > 1e-5 and (m >= 0).all()
    assert abs(m.argmax() // 256 - 128) <= 1


def test_stacked_aperture_photometry():
    """AP on a uniform disk recovers the known disk/ring geometry and is
    exactly invariant to a constant background."""
    n, fov = 512, 2.0  # deg
    pix_per_deg = n / fov
    alpha_arcmin = 4.0
    alpha_pix = alpha_arcmin / 60.0 * pix_per_deg
    r0_pix = 0.5 * alpha_pix
    img = np.zeros((n, n), np.float32)
    yy, xx = np.mgrid[0:n, 0:n]
    centers = [(150, 150), (380, 300)]
    A = -3e-6
    for (r, c) in centers:
        img[(yy - r) ** 2 + (xx - c) ** 2 <= r0_pix ** 2] = A
    ap, stack = sz.stacked_aperture_photometry(
        jnp.asarray(img), np.array(centers), fov, alpha_arcmin,
        patch_half=40)
    ap = np.asarray(ap)
    # disk mean = A * (r0/alpha)^2 (ring empty)
    expect = A * (r0_pix / alpha_pix) ** 2
    np.testing.assert_allclose(ap, expect, rtol=0.05)
    # constant offset nulls out exactly
    ap2, _ = sz.stacked_aperture_photometry(
        jnp.asarray(img + 1.7e-4), np.array(centers), fov, alpha_arcmin,
        patch_half=40)
    np.testing.assert_allclose(np.asarray(ap2), ap, atol=2e-9)
    # weighted stack
    _, st = sz.stacked_aperture_photometry(
        jnp.asarray(img), np.array(centers), fov, alpha_arcmin,
        patch_half=40, weights=np.array([1.0, 3.0]))
    np.testing.assert_allclose(float(st), (ap[0] + 3 * ap[1]) / 4.0,
                               rtol=1e-5)


def test_ksz_closed_loop_map_to_pairwise_momentum():
    """Closed loop: halo catalog with a known pairwise flow -> painted
    kSZ map -> aperture photometry at halo pixels -> Hand+12 pairwise
    momentum -> recover v12(r).

    With v = H x the mean pairwise velocity is exactly v12(r) = H r, and
    the kSZ estimator must return p(r) = -T_cmb tau_AP v12(r)/c where
    tau_AP is the aperture-filtered optical depth of the (identical)
    cluster profile — measured here from a single painted cluster, so
    the test pins signs, units and the full map pipeline at once.
    """
    from astrild_tpu.ops import lensing, pairwise
    from astrild_tpu.utils.constants import C_LIGHT_KMS, T_CMB

    rng = np.random.default_rng(7)
    nh, L, H = 600, 400.0, 0.4
    pos = rng.uniform(40.0, L - 40.0, (nh, 3))
    vz = H * pos[:, 2]

    npix = 2048
    pix_mpc = L / npix
    m200, c200, r200 = 3e14, 6.0, 1.0
    extent = 2.0
    patch_npix = int(round(2 * extent * r200 / pix_mpc)) | 1
    tau = sz.nfw_tau_map(m200, c200, r200, npix=patch_npix, extent=extent)
    patches = jnp.asarray(tau)[None, :, :] * (
        -T_CMB * jnp.asarray(vz, jnp.float32)[:, None, None] / C_LIGHT_KMS)
    # paint_halo_patches takes (x=col, y=row); the AP cutouts take
    # (row, col)
    cols = jnp.asarray(pos[:, 0] / pix_mpc, jnp.int32)
    rows = jnp.asarray(pos[:, 1] / pix_mpc, jnp.int32)
    paint_centers = jnp.stack([cols, rows], axis=-1)
    read_centers = np.stack([np.asarray(rows), np.asarray(cols)], axis=-1)
    canvas = jnp.zeros((npix, npix))
    kmap = lensing.paint_halo_patches(canvas, patches, paint_centers)

    # aperture radius = r200 on the distant plane
    Dc = 50000.0
    fov_deg = np.degrees(L / Dc)
    alpha_arcmin = np.degrees(r200 / Dc) * 60.0
    ph = patch_npix // 2 + 4
    ap, _ = sz.stacked_aperture_photometry(kmap, read_centers,
                                           fov_deg, alpha_arcmin,
                                           patch_half=ph)
    # tau_AP from a single isolated cluster
    solo = lensing.paint_halo_patches(
        jnp.zeros((npix, npix)), jnp.asarray(tau)[None],
        jnp.asarray([[npix // 2, npix // 2]], jnp.int32))
    tau_ap, _ = sz.stacked_aperture_photometry(
        solo, np.array([[npix // 2, npix // 2]]), fov_deg, alpha_arcmin,
        patch_half=ph)
    tau_ap = float(tau_ap[0])
    assert tau_ap > 0

    # pairwise momentum from the MAP-measured temperatures at 3D positions
    pos_lc = pos - L / 2 + np.array([0.0, 0.0, Dc])
    bins = (np.arange(8) + 1.0) * 12.0
    rsep, p = pairwise.pairwise_ksz_momentum(
        jnp.asarray(pos_lc), jnp.asarray(ap), jnp.asarray(bins))
    p = np.asarray(p)
    # expected: p(r) = -T tau_AP H <r|bin> / c
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    iu = np.triu_indices(nh, k=1)
    d = d[iu]
    b = (d / 12.0).astype(int)
    mean_r = np.array([d[b == k].mean() if (b == k).sum() > 30 else np.nan
                       for k in range(8)])
    expect = -T_CMB * tau_ap * H * mean_r / C_LIGHT_KMS
    good = ~np.isnan(expect) & ~np.isnan(p)
    good[0] = False  # first bin is pair-starved at nh=600 (noise-dominated)
    assert good.sum() >= 5
    np.testing.assert_allclose(p[good], expect[good], rtol=0.1)


def test_m500c_from_m200m_sane():
    from astrild_tpu.ops.sz import m500c_from_m200m
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    m200m = jnp.asarray([1e13, 1e14, 1e15])
    m500, r500 = m500c_from_m200m(m200m, 0.0, cosmo)
    m500 = np.asarray(m500); r500 = np.asarray(r500)
    # M500c < M200m; ~0.45-0.55 for Duffy 200m concentrations (checked
    # against the closed-form mu-ratio algebra)
    assert (m500 < np.asarray(m200m)).all()
    assert (m500 / np.asarray(m200m) > 0.4).all()
    assert (np.diff(r500) > 0).all()
    # definition closes: M500 == (4/3) pi 500 rho_c r500^3
    rho_c = float(cosmo.rho_crit(0.0))
    m_def = 4 / 3 * np.pi * 500 * rho_c * r500 ** 3
    np.testing.assert_allclose(m500, m_def, rtol=1e-3)


@pytest.mark.slow
def test_y_ell_low_ell_limit_matches_patch_integral():
    """y_{ell->0} must equal the spherical Y / d_A^2 — cross-checked
    against the independently-coded compton_y_patch LOS quadrature."""
    from astrild_tpu.ops.sz import compton_y_patch, y_ell

    m500, r500, ez, d_a = 5e14, 1.3, 1.0, 1000.0
    yl = float(np.asarray(y_ell(jnp.asarray([0.1]), m500, r500, ez, d_a,
                                x_max=5.0, n_x=1024))[0])
    # patch integral: extent 5 R500 transverse, +-5 R500 LOS
    npix = 256
    y = np.asarray(compton_y_patch(m500, r500, ez, npix=npix, extent=5.0,
                                   n_los=512))
    pix = (2 * 5.0 * r500 / npix) ** 2
    y_int = y.sum() * pix / d_a ** 2
    # transverse square vs spherical truncation differ at the few-% level
    np.testing.assert_allclose(yl, y_int, rtol=0.06)


@pytest.mark.slow
def test_cl_yy_magnitude_and_shape():
    from astrild_tpu.ops.sz import cl_yy
    from astrild_tpu.utils.cosmology import Cosmology

    cosmo = Cosmology()
    ells = jnp.asarray([200.0, 1000.0, 3000.0, 8000.0])
    cl = np.asarray(cl_yy(ells, cosmo, nz=16, nm=24))
    assert (cl > 0).all()
    dl = np.asarray(ells) * (np.asarray(ells) + 1) * cl / (2 * np.pi)
    # Planck-era tSZ band: l(l+1)Cl/2pi ~ 1e-13..1e-11 (y^2) over these ells
    assert 1e-14 < dl[1] < 1e-10
    # 1-halo spectrum falls toward very high ell faster than l^2
    assert cl[-1] < cl[1]
