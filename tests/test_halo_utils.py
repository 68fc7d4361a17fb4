"""Method-level parity additions: halo toolbox scalings/environment/shape,
analysis toolbox extensions, gadget multi-file combine, HDF5 inventories,
cosmic age.

Reference anchors: rays/voids/tunnels/halo.py (virialRadius,
virialVelocity, compute200RhoCritical, haloEnvironment, shape_pointCloud,
computeStatistics, halosInMassRange, selectHalosInBox),
rays/voids/tunnels/gadget.py (boxOverlap, boxFullyContained,
gadgetMultipleFiles, gadgetCombine), rays/voids/tunnels/analysis.py
(LeastSquare_nonlinearFit, FindContourValue, dataCorrelation_direction,
PointDistribution), utils/read_hdf5.py (cosmic_time,
show_snapshot_contents), power_spectra/powmes.py (align_lin_nonlin).
"""
import numpy as np
import pytest

from astrild_tpu.io import gadget_binary as gb
from astrild_tpu.models.halos import Halos
from astrild_tpu.ops import halo_stats as hs
from astrild_tpu.utils import analysis as an
from astrild_tpu.utils.constants import G_NEWTON, RHO_CRIT0
from astrild_tpu.utils.cosmology import Cosmology


# ------------------------------------------------------- virial scalings
def test_virial_scalings_close():
    m = np.array([1e13, 1e14, 1e15])
    r = np.asarray(hs.virial_radius(m))
    # closure: rho(M, R(M)) == 200 rho_crit
    rho = np.asarray(hs.rho_crit_200(m, r))
    assert np.allclose(rho, 200 * RHO_CRIT0, rtol=2e-5)
    v = np.asarray(hs.virial_velocity(m, r))
    assert np.allclose(v, np.sqrt(G_NEWTON * m / r), rtol=1e-6)
    # a 1e14 Msun/h halo is ~ Mpc-sized with v ~ 500 km/s
    assert 0.5 < r[1] < 1.5 and 300 < v[1] < 800


# ---------------------------------------------------- environment tagging
def test_halo_environment_tags_and_outside():
    env = np.arange(27, dtype=np.int32).reshape(3, 3, 3)
    pos = np.array([
        [0.5, 0.5, 0.5],     # cell (0,0,0) -> 0
        [2.5, 2.5, 2.5],     # cell (2,2,2) -> 26
        [1.5, 0.5, 2.5],     # (1,0,2) -> 9+0+2 = 11
        [-0.1, 1.0, 1.0],    # outside
        [3.0, 1.0, 1.0],     # exactly on the upper edge -> outside
    ])
    tags = np.asarray(hs.halo_environment(pos, env, (0, 3, 0, 3, 0, 3)))
    assert tags.tolist() == [0, 26, 11, -1, -1]
    # tuple-of-components input agrees
    tags2 = np.asarray(hs.halo_environment(
        (pos[:, 0], pos[:, 1], pos[:, 2]), env, (0, 3, 0, 3, 0, 3)))
    assert (tags == tags2).all()


def test_halos_environment_facade():
    env = np.zeros((2, 2, 2), np.int32)
    env[1, 1, 1] = 3
    cat = Halos({"x": np.array([1.5, 0.5]), "y": np.array([1.5, 0.5]),
                 "z": np.array([1.5, 0.5]), "m200c": np.array([1e14, 1e13])})
    tags = cat.environment(env, (0, 2, 0, 2, 0, 2))
    assert tags.tolist() == [3, 0]


# ------------------------------------------------------- point-cloud shape
def test_point_cloud_shape_recovers_axes():
    rng = np.random.default_rng(0)
    # rotate an anisotropic cloud: shape axes must follow the rotation
    pts = rng.normal(size=(30000, 3)) * np.array([3.0, 2.0, 1.0])
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    lengths, axes = hs.point_cloud_shape(pts @ rot.T)
    lengths = np.asarray(lengths)
    assert np.allclose(lengths, [3, 2, 1], rtol=0.05)
    major = np.asarray(axes)[0]
    assert abs(major @ rot[:, 0]) > 0.99
    # weights: zero-weighting half the cloud changes nothing statistically
    w = np.ones(len(pts))
    l2, _ = hs.point_cloud_shape(pts, weights=w)
    assert np.allclose(np.asarray(l2), lengths, rtol=0.05)


# ------------------------------------------------- binned halo statistics
def test_binned_halo_statistics_summary():
    rng = np.random.default_rng(1)
    mass = rng.uniform(0.0, 4.0, 6000)
    props = np.stack([mass * 2.0 + rng.normal(0, 0.1, mass.size),
                      np.full(mass.size, 5.0)], axis=-1)
    st = hs.binned_halo_statistics(mass, props, [0, 1, 2, 3, 4],
                                   n_boot=50, seed=2)
    assert st["count"].sum() == 6000
    mid = np.array([0.5, 1.5, 2.5, 3.5])
    assert np.allclose(st["median"][:, 0], 2 * mid, atol=0.05)
    assert np.allclose(st["mean"][:, 1], 5.0)
    # constant property: zero scatter, zero bootstrap error
    assert np.allclose(st["median_err"][:, 1], 0.0)
    assert (st["median_err"][:, 0] > 0).all()
    assert (st["p16"][:, 0] < st["median"][:, 0]).all()
    assert (st["p84"][:, 0] > st["median"][:, 0]).all()
    # empty bin -> NaN stats, zero count
    st2 = hs.binned_halo_statistics(mass, props, [10, 11], n_boot=10)
    assert st2["count"][0] == 0 and np.isnan(st2["median"][0, 0])


# -------------------------------------------------------- catalog filters
def test_halos_mass_range_and_box_select():
    rng = np.random.default_rng(3)
    n = 500
    cat = Halos({"x": rng.uniform(0, 100, n), "y": rng.uniform(0, 100, n),
                 "z": rng.uniform(0, 100, n),
                 "m200c": 10.0 ** rng.uniform(12, 15, n)})
    sub = cat.in_mass_range(1e13, 1e14)
    assert ((sub.data["m200c"] >= 1e13) & (sub.data["m200c"] <= 1e14)).all()
    # closed interval (reference halosInMassRange): the catalog's own
    # min/max keep the full catalog, incl. the most massive halo
    m = cat.data["m200c"]
    assert cat.in_mass_range(m.min(), m.max()).data["m200c"].size == n
    # interior box: plain selection
    box = cat.select_in_box((10, 30, 10, 30, 10, 30), boxsize=100.0)
    assert (box.data["x"] >= 10).all() and (box.data["x"] < 30).all()
    n_inside = (((cat.data["x"] >= 10) & (cat.data["x"] < 30))
                & ((cat.data["y"] >= 10) & (cat.data["y"] < 30))
                & ((cat.data["z"] >= 10) & (cat.data["z"] < 30))).sum()
    assert box.data["x"].size == n_inside
    # periodic region crossing the origin: halos near x=95 appear at x<0
    wrap = cat.select_in_box((-10, 10, 0, 100, 0, 100), boxsize=100.0)
    assert wrap.data["x"].min() < 0
    n_wrap = (((cat.data["x"] >= 90) | (cat.data["x"] < 10))).sum()
    assert wrap.data["x"].size == n_wrap


# ------------------------------------------------------ gadget box helpers
def test_box_helpers_and_multifile_combine(tmp_path):
    assert gb.box_overlap([0, 1, 0, 1, 0, 1], [0.5, 2, 0, 1, 0, 1])
    assert not gb.box_overlap([0, 1, 0, 1, 0, 1], [1.5, 2, 0, 1, 0, 1])
    assert gb.box_fully_contained([0, 2, 0, 2, 0, 2],
                                  [0.5, 1, 0.5, 1, 0.5, 1])
    assert not gb.box_fully_contained([0, 2, 0, 2, 0, 2],
                                      [0.5, 3, 0.5, 1, 0.5, 1])

    rng = np.random.default_rng(0)
    tot = 0
    for i in range(3):
        n = 10 + i
        gb.write_gadget(str(tmp_path / f"snap.{i}"),
                        rng.uniform(0, 100, (n, 3)).astype(np.float32),
                        rng.normal(size=(n, 3)).astype(np.float32),
                        np.arange(tot, tot + n, dtype=np.uint32),
                        boxsize=100.0)
        tot += n
    hdr, blocks = gb.read_gadget_multi(str(tmp_path / "snap"))
    assert blocks["pos"].shape == (tot, 3)
    assert (np.sort(blocks["ids"]) == np.arange(tot)).all()
    assert int(np.asarray(hdr["npart"]).sum()) == tot
    with pytest.raises(FileNotFoundError):
        gb.read_gadget_multi(str(tmp_path / "absent"))


# --------------------------------------------------------- hdf5 inventories
def test_hdf5_content_inventories(tmp_path):
    h5py = pytest.importorskip("h5py")
    from astrild_tpu.io.gadget_hdf5 import (list_group_catalog_contents,
                                            list_snapshot_contents)

    sdir = tmp_path / "snapdir_005"
    sdir.mkdir()
    for fn in range(2):
        with h5py.File(sdir / f"snap_005.{fn}.hdf5", "w") as f:
            h = f.create_group("Header")
            h.attrs["BoxSize"] = 100.0
            h.attrs["HubbleParam"] = 0.7
            pt = f.create_group("PartType1")
            pt["Coordinates"] = np.zeros((50, 3))
            pt["ParticleIDs"] = np.arange(50, dtype=np.uint64)
            pt["ScalarFlag"] = np.float64(3.0)  # 0-d dataset in both files
    inv = list_snapshot_contents(5, str(tmp_path))
    assert inv["PartType1/ScalarFlag"][0] == ()
    assert inv["PartType1/Coordinates"][0] == (100, 3)
    assert inv["PartType1/ParticleIDs"][0] == (100,)

    gdir = tmp_path / "groups_005"
    gdir.mkdir()
    with h5py.File(gdir / "fof_subhalo_tab_005.0.hdf5", "w") as f:
        f.create_group("Header")
        f.create_group("Group")["GroupPos"] = np.zeros((7, 3))
    ginv = list_group_catalog_contents(5, str(tmp_path))
    assert ginv["Group/GroupPos"] == ((7, 3), np.dtype("f8"))


# --------------------------------------------------------------- cosmic age
def test_cosmic_age():
    cosmo = Cosmology(Om0=0.3, h=0.7)
    t0 = float(cosmo.age(0.0))
    assert 13.0 < t0 < 14.0        # ~13.47 Gyr for this background
    # age + lookback = age today
    t1 = float(cosmo.age(1.0))
    assert np.isclose(t1 + float(cosmo.lookback_time(1.0)), t0, rtol=1e-4)
    assert t1 < t0
    # beyond the background table (z_max = 40): matter-dominated closed
    # form AT the queried z, not clamped to the table edge
    t49 = float(cosmo.age(49.0))
    t40 = float(cosmo.age(40.0))
    exact49 = (2.0 / 3.0) / np.sqrt(0.3) * (1 + 49.0) ** -1.5 \
        * 3.085677581491367e19 / (100.0 * 0.7) / 3.15576e16
    assert np.isclose(t49, exact49, rtol=1e-6)
    assert t49 < t40


# --------------------------------------------------------- analysis toolbox
def test_nonlinear_least_squares_gaussian():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = np.linspace(-3, 3, 200, dtype=np.float32)
    y = 2.5 * np.exp(-0.5 * (x / 0.8) ** 2) + rng.normal(0, 0.01, x.size)

    def fn(xx, p):
        return p[0] * jnp.exp(-0.5 * (xx / p[1]) ** 2)

    p, ss, conv = an.nonlinear_least_squares(fn, x, y, [1.0, 2.0])
    assert conv
    assert np.allclose([p[0], abs(p[1])], [2.5, 0.8], atol=0.02)
    assert ss < 0.05


def test_contour_value_gaussian_mass():
    g1 = np.linspace(-5, 5, 401)
    g = np.exp(-0.5 * (g1[:, None] ** 2 + g1[None, :] ** 2))
    # 2D gaussian: fraction within the t = exp(-1/2) contour is 1-exp(-1/2)
    t = an.contour_value(g, [1.0 - np.exp(-0.5)])
    assert np.allclose(t, np.exp(-0.5), rtol=0.02)
    with pytest.raises(ValueError):
        an.contour_value(np.array([-1.0, 2.0]), [0.5])


def test_direction_correlation_alignment():
    # strongly aligned sample: last |cos| bin holds everything and sits
    # far above the isotropic Monte-Carlo band
    h, rm, rs = an.direction_correlation(np.full(500, 0.97), nbins=10,
                                         n_random=300, seed=4)
    assert h[-1] == 500 and h[:-1].sum() == 0
    assert abs(rm[-1] - 50.0) < 5.0
    assert (h[-1] - rm[-1]) / rs[-1] > 10.0
    # isotropic sample stays within a loose band everywhere
    rng = np.random.default_rng(5)
    h2, rm2, rs2 = an.direction_correlation(rng.uniform(0, 1, 2000),
                                            nbins=10, n_random=300)
    assert (np.abs(h2 - rm2) < 6 * rs2 * np.sqrt(2000 / 300 + 1)).all()


def test_point_density_2d_normalization():
    rng = np.random.default_rng(6)
    xc, yc, d = an.point_density_2d(rng.uniform(0, 1, 20000),
                                    rng.uniform(0, 2, 20000), (8, 10),
                                    x_range=(0, 1), y_range=(0, 2))
    mass = (d * np.outer(np.diff(np.linspace(0, 1, 9)),
                         np.diff(np.linspace(0, 2, 11)))).sum()
    assert np.isclose(mass, 1.0, atol=1e-6)
    # log bins
    xs = 10.0 ** rng.uniform(0, 2, 5000)
    xc, yc, d = an.point_density_2d(xs, xs, (5, 5), log_bins=True)
    assert (np.diff(xc) > 0).all() and d.sum() > 0


# ----------------------------------------------------------- powmes helper
def test_align_lin_nonlin():
    from astrild_tpu.models.power import PowMes

    k = np.logspace(-3, 0, 50)
    lin = np.full(50, 100.0)
    nonlin = np.full(50, 90.0)
    off = PowMes.align_lin_nonlin(lin, nonlin, k)
    assert np.isclose(off, 10.0)
    with pytest.raises(ValueError):
        PowMes.align_lin_nonlin(lin, nonlin, k * 1e6)
