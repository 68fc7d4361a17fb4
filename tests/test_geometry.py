import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from astrild_tpu.utils import geometry as gt


def test_ell_arcmin_roundtrip():
    ell = 3000.0
    npt.assert_allclose(float(gt.arcmin_to_ell(gt.ell_to_arcmin(ell))), ell, rtol=1e-6)


def test_rad_arcmin_roundtrip():
    a = 12.5
    npt.assert_allclose(float(gt.rad_to_arcmin(gt.arcmin_to_rad(a))), a, rtol=1e-6)


def test_dc_to_da():
    npt.assert_allclose(float(gt.Dc_to_Da(100.0, 1.0)), 50.0)


def test_radius_to_angsize():
    # 1 Mpc at Da=100 Mpc -> 0.01 rad
    npt.assert_allclose(float(gt.radius_to_angsize(1.0, 100.0, arcmin=False)), 0.01)


def test_sph_cart_jacobians_inverse():
    th, ph = 0.7, 1.3
    J1 = np.asarray(gt.cart_to_sph_jacobian(th, ph))
    J2 = np.asarray(gt.sph_to_cart_jacobian(th, ph))
    # One is the (transposed) inverse of the other: rotations
    npt.assert_allclose(J1 @ J2, np.eye(3), atol=1e-6)


def test_vector_roundtrip():
    th = jnp.array([0.3, 1.1])
    ph = jnp.array([0.2, 2.0])
    v_cart = jnp.array([[1.0, 2.0, 3.0], [0.5, -1.0, 0.7]])
    v_sph = gt.convert_vec_cart_to_sph(th, ph, v_cart)
    v_back = gt.convert_vec_sph_to_cart(th, ph, v_sph)
    npt.assert_allclose(np.asarray(v_back), np.asarray(v_cart), atol=1e-5)


def test_radial_velocity_along_z():
    # A velocity along +z at theta=0 must be purely radial
    v_cart = jnp.array([[0.0, 0.0, 5.0]])
    v_sph = gt.convert_vec_cart_to_sph(jnp.array([1e-8]), jnp.array([0.0]), v_cart)
    npt.assert_allclose(float(v_sph[0, 0]), 5.0, atol=1e-5)


def test_box_to_lightcone():
    pos = jnp.array([[250.0, 250.0, 0.0]])
    out = gt.transform_box_to_lc_cart_coords(pos, boxsize=500.0, boxdist=1000.0)
    npt.assert_allclose(np.asarray(out), [[0.0, 0.0, 1000.0]])
    r = gt.radial_coordinate_in_lc(out)
    npt.assert_allclose(float(r[0]), 1000.0)


def test_angular_coordinate():
    pos = jnp.array([[10.0, 0.0, 1000.0]])
    t1, t2 = gt.angular_coordinate_in_lc(pos, unit="rad")
    npt.assert_allclose(float(t1[0]), np.arctan(0.01), rtol=1e-6)
    npt.assert_allclose(float(t2[0]), 0.0, atol=1e-8)


def test_ra_dec_dist_coordinates():
    """Matches the reference's return_raDecDist_coordinates conventions
    (tunnels/miscellaneous.py:158-175): dec = 90 - polar, ra offset +pi."""
    pos = np.array([[0.0, 0.0, 2.0],      # north pole
                    [1.0, 0.0, 0.0],      # +x equator
                    [0.0, -3.0, 0.0]])    # -y equator
    ra, dec, dist = gt.ra_dec_dist_coordinates(pos)
    npt.assert_allclose(np.asarray(dist), [2.0, 1.0, 3.0])
    npt.assert_allclose(np.asarray(dec), [90.0, 0.0, 0.0], atol=1e-6)
    npt.assert_allclose(np.asarray(ra)[1:], [180.0, 90.0], atol=1e-6)
    # oracle: the reference formula (sinTheta-normalized atan2 arguments
    # reduce to plain atan2)
    rng = np.random.default_rng(5)
    p = rng.normal(size=(50, 3))
    ra2, dec2, d2 = gt.ra_dec_dist_coordinates(p, unit="rad")
    dis = np.sqrt((p * p).sum(axis=1))
    theta = np.pi / 2.0 - np.arccos(p[:, 2] / dis)
    phi = np.pi + np.arctan2(p[:, 1], p[:, 0])
    npt.assert_allclose(np.asarray(dec2), theta, atol=1e-6)
    npt.assert_allclose(np.asarray(ra2), phi, atol=1e-6)
    # device arrays route through jnp
    ra3, dec3, d3 = gt.ra_dec_dist_coordinates(jnp.asarray(p, jnp.float32),
                                               unit="rad")
    npt.assert_allclose(np.asarray(dec3), theta, atol=1e-4)
    try:
        gt.ra_dec_dist_coordinates(p, unit="furlong")
        assert False
    except ValueError:
        pass


def test_ra_dec_dist_degree_spelling():
    pos = np.array([[1.0, 0.0, 0.0]])
    ra1, dec1, _ = gt.ra_dec_dist_coordinates(pos, unit="degree")
    ra2, dec2, _ = gt.ra_dec_dist_coordinates(pos, unit="deg")
    npt.assert_allclose(np.asarray(ra1), np.asarray(ra2))
