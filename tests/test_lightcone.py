"""Halo lightcone catalog construction tests."""
import numpy as np
import numpy.testing as npt

from astrild_tpu.models.lightcone import (halo_lightcone_catalog,
                                          merge_lightcone_catalogs)


def make_inputs():
    # one halo dead-center of the box face, one outside the shell
    pos = np.array([[250.0, 250.0, 100.0],   # -> (0, 0, 1100): inside
                    [250.0, 250.0, 400.0],   # -> (0, 0, 1400): outside shell
                    [490.0, 250.0, 100.0]])  # wide angle: outside FOV
    vel = np.array([[100.0, 50.0, 1000.0],
                    [0.0, 0.0, 0.0],
                    [0.0, 0.0, 0.0]])
    m200 = np.array([1e14, 1e13, 1e13])
    r200 = np.array([1.0, 0.5, 0.5])
    return pos, vel, m200, r200


def test_selection_by_shell_and_fov():
    pos, vel, m200, r200 = make_inputs()
    cat = halo_lightcone_catalog(pos, vel, m200, r200, boxsize=500.0,
                                 boxdist=1000.0, snaplimit=(1050.0, 1200.0),
                                 opening_angle=20.0, npix=1024,
                                 box_nr=1, snap_nr=5, ray_nr=3)
    assert cat is not None
    assert len(cat["m200"]) == 1
    npt.assert_allclose(cat["rad_dist"][0], 1100.0)
    # centered halo: angles at FOV center
    npt.assert_allclose(cat["theta1_deg"][0], 10.0, atol=1e-6)
    assert cat["theta1_pix"][0] == 512
    assert cat["ray_nr"][0] == 4 and cat["snap_nr"][0] == 5


def test_velocity_decomposition():
    pos, vel, m200, r200 = make_inputs()
    cat = halo_lightcone_catalog(pos, vel, m200, r200, boxsize=500.0,
                                 boxdist=1000.0, snaplimit=(1050.0, 1200.0),
                                 opening_angle=20.0, npix=1024)
    # halo on the z-axis: LOS = z; transverse velocity = (vx, vy)
    npt.assert_allclose(cat["theta1_tv"][0], 100.0, atol=1e-6)
    npt.assert_allclose(cat["theta2_tv"][0], 50.0, atol=1e-6)
    # r200_deg = arctan(1/1100)
    npt.assert_allclose(cat["r200_deg"][0],
                        np.degrees(np.arctan(1.0 / 1100.0)), rtol=1e-6)


def test_empty_shell_returns_none_and_merge():
    pos, vel, m200, r200 = make_inputs()
    cat = halo_lightcone_catalog(pos, vel, m200, r200, boxsize=500.0,
                                 boxdist=1000.0, snaplimit=(10.0, 20.0),
                                 opening_angle=20.0, npix=1024)
    assert cat is None
    cat2 = halo_lightcone_catalog(pos, vel, m200, r200, boxsize=500.0,
                                  boxdist=1000.0, snaplimit=(1050.0, 1200.0),
                                  opening_angle=20.0, npix=1024)
    merged = merge_lightcone_catalogs([cat, cat2, None])
    assert len(merged["m200"]) == 1


def test_lightcone_transform_float64_precision():
    """Box->lightcone transform must run in real float64 on host (round-1
    regression: jnp.float64 without x64 silently truncated to float32,
    ~0.1 Mpc/h quantization at chi ~ 3000)."""
    import warnings

    from astrild_tpu.models.lightcone import halo_lightcone_catalog

    boxdist = 3000.0
    boxsize = 500.0
    # a position whose lightcone radius needs float64 to resolve sub-1e-3
    pos = np.array([[250.0 + 1e-4, 250.0, 123.456789]])
    vel = np.array([[100.0, 50.0, 25.0]])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any float64-truncation warning fails
        cat = halo_lightcone_catalog(
            pos, vel, np.array([1e13]), np.array([0.2]), boxsize, boxdist,
            snaplimit=(2900.0, 3300.0), opening_angle=10.0, npix=1024)
    assert cat is not None
    assert cat["x"].dtype == np.float64
    expected_rad = np.sqrt(1e-4 ** 2 + (boxdist + 123.456789) ** 2)
    assert abs(float(cat["rad_dist"][0]) - expected_rad) < 1e-3
