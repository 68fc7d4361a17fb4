"""Aux components: troughs, selection, 3D profiles, transforms, formats,
analysis toolbox, observability."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu import io as aio
from astrild_tpu.ops import map_transform as MT
from astrild_tpu.ops import object_selection as OS
from astrild_tpu.ops import profiles3d as P3
from astrild_tpu.ops import troughs as TR
from astrild_tpu.utils import analysis as AN
from astrild_tpu.utils import observability as OBS


# ----------------------------------------------------------------- troughs
def test_find_troughs_prefers_low_regions(rng):
    n = 256
    img = np.zeros((n, n), np.float32)
    img[:, :n // 2] = -1.0   # left half is low
    pos, means = TR.find_troughs(jnp.asarray(img), jax.random.PRNGKey(0),
                                 n_troughs=200, lowest_fraction=0.2,
                                 rad_deg=0.2, map_width_deg=10.0)
    assert pos.shape[0] == 40
    assert np.all(np.asarray(means) < -0.5)  # all selected in the low half


def test_trough_profiles_shape(rng):
    n = 128
    img = jnp.asarray(rng.normal(0, 1, (n, n)).astype(np.float32))
    pos, _ = TR.find_troughs(img, jax.random.PRNGKey(1), 50, 0.3, 0.3, 10.0)
    r, prof = TR.trough_profiles(img, pos, 0.6, 6, 10.0)
    assert prof.shape == (6,)


def test_trough_profiles_sample_found_positions(rng):
    """Composed pipeline regression: profiles must be extracted at the
    positions find_troughs reports. A single deep OFF-DIAGONAL well must
    dominate the selection and its profile center must be deep — a
    row/col transpose between the two stages (the old [:, ::-1] flip)
    samples an unrelated flat region instead."""
    n = 256
    img = np.zeros((n, n), np.float32)
    img[70:90, 150:170] = -5.0   # off-diagonal well (row ~80, col ~160)
    pos, means = TR.find_troughs(jnp.asarray(img), jax.random.PRNGKey(2),
                                 n_troughs=400, lowest_fraction=0.05,
                                 rad_deg=0.2, map_width_deg=10.0)
    assert float(np.min(np.asarray(means))) < -0.2
    # deepest trough center sits in the well (row, col order)
    best = np.asarray(pos)[0] * n / 10.0
    assert 60 <= best[0] <= 100 and 140 <= best[1] <= 180
    r, prof = TR.trough_profiles(img, pos[:1], 0.6, 6, 10.0)
    assert float(prof[0]) < -0.5   # profile center IS depressed


# --------------------------------------------------------------- selection
def test_categorize_sizes():
    objs = {"rad_deg": np.concatenate([np.full(20, 0.1), np.full(3, 1.0)]),
            "x": np.arange(23.0)}
    out = OS.categorize_sizes(objs, "linear", 3, min_obj_nr=5)
    assert len(out["rad_deg"]) == 20  # small category survives, tiny dropped


def test_minimal_voids():
    tracers = np.random.default_rng(0).uniform(0, 100, (500, 2))
    voids = {"x_pix": np.array([50.0, 200.0]), "y_pix": np.array([50.0, 200.0]),
             "rad_pix": np.array([10.0, 10.0])}
    out = OS.minimal_voids(voids, tracers, field_width_pix=100.0)
    # the void outside the tracer field has zero tracers -> minimal
    assert bool(out["minimal"][1])


def test_trim_objects_crossing_edge():
    data = {"theta1_pix": np.array([5, 50]), "theta2_pix": np.array([5, 50]),
            "rad_pix": np.array([10.0, 10.0])}
    keep = OS.trim_objects_crossing_edge(data, 1.0, 100, rtn="bool")
    npt.assert_array_equal(keep, [False, True])


# -------------------------------------------------------------- 3D profiles
def test_radial_density_profile_recovers_nfw(rng):
    # sample particles from an NFW-ish profile by inverse transform on a
    # tabulated mass profile
    rs, rhos = 0.25, 1.0e15
    r_tab = np.geomspace(0.01, 2.0, 512)
    rho_tab = rhos / ((r_tab / rs) * (1 + r_tab / rs) ** 2)
    m_tab = np.cumsum(rho_tab * 4 * np.pi * r_tab ** 2 * np.gradient(r_tab))
    u = rng.uniform(0, m_tab[-1], 200000)
    r_samp = np.interp(u, m_tab, r_tab)
    dirs = rng.normal(size=(200000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pos = 50.0 + r_samp[:, None] * dirs
    mass = np.full(200000, m_tab[-1] / 200000)
    r, rho = P3.radial_density_profiles(
        jnp.asarray(pos, jnp.float32), jnp.asarray(mass, jnp.float32),
        jnp.asarray([[50.0, 50.0, 50.0]]), 0.05, 1.5, nbins=12)
    got = np.asarray(rho[0])
    want = rhos / ((np.asarray(r) / rs) * (1 + np.asarray(r) / rs) ** 2)
    npt.assert_allclose(got[2:-2], want[2:-2], rtol=0.2)
    # NFW fit recovers the scale radius
    rho_s_fit, r_s_fit = P3.fit_nfw(jnp.asarray(r), rho)
    npt.assert_allclose(float(r_s_fit[0]), rs, rtol=0.3)


# --------------------------------------------------------------- transforms
def test_divergence_of_linear_field():
    n = 16
    x = jnp.arange(n, dtype=jnp.float32)
    vx = jnp.broadcast_to(x[:, None, None], (n, n, n))  # v = (x, 0, 0)
    v = jnp.stack([vx, jnp.zeros((n, n, n)), jnp.zeros((n, n, n))])
    div = MT.divergence(v, spacing=1.0)
    npt.assert_allclose(np.asarray(div), 1.0, atol=1e-5)


def test_scatter_points_to_grid_mean():
    pos = jnp.asarray([[5.0, 5.0, 5.0], [5.0, 5.0, 5.0], [15.0, 5.0, 5.0]])
    vals = jnp.asarray([1.0, 3.0, 10.0])
    g = MT.scatter_points_to_grid(pos, vals, 2, 20.0, reduce="mean")
    npt.assert_allclose(float(g[0, 0, 0]), 2.0)
    npt.assert_allclose(float(g[1, 0, 0]), 10.0)


def test_object_cutouts():
    img = jnp.arange(100.0).reshape(10, 10)
    out = MT.object_cutouts(img, jnp.asarray([[5, 5]]), 1)
    assert out.shape == (1, 3, 3)
    npt.assert_allclose(float(out[0, 1, 1]), 55.0)


# ------------------------------------------------------------ binary gadget
def test_gadget_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 100, (50, 3)).astype(np.float32)
    vel = rng.normal(0, 100, (50, 3)).astype(np.float32)
    ids = np.arange(50, dtype=np.uint32)
    for fmt in (1, 2):
        p = str(tmp_path / f"snap_fmt{fmt}")
        aio.gadget_binary.write_gadget(p, pos, vel, ids, 100.0,
                                       snap_format=fmt)
        assert aio.gadget_binary.detect_format(p) == fmt
        hdr, data = aio.gadget_binary.read_gadget(p)
        npt.assert_array_equal(data["pos"], pos)
        npt.assert_array_equal(data["vel"], vel)
        npt.assert_array_equal(data["ids"], ids)
        assert hdr["BoxSize"] == 100.0


def test_gadget_select_box_periodic():
    pos = np.array([[1.0, 50.0, 50.0], [99.0, 50.0, 50.0],
                    [60.0, 50.0, 50.0]])
    out = aio.gadget_binary.select_box(pos, [-5, 5, 0, 100, 0, 100], 100.0)
    # both particles near the wrap edge selected; 60 excluded
    assert out.shape[0] == 2


# --------------------------------------------------------------------- mmf
def test_mmf_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    grid = rng.standard_normal((8, 8, 8)).astype(np.float32)
    p = str(tmp_path / "env.mmf")
    aio.mmf.write_mmf(p, grid, boxsize=100.0)
    hdr, back = aio.mmf.read_mmf(p)
    npt.assert_array_equal(back, grid)


def test_nexus_environments():
    node = np.zeros((4, 4, 4)); node[0, 0, 0] = 1
    fil = np.zeros((4, 4, 4)); fil[0, 0, :2] = 1
    wall = np.zeros((4, 4, 4)); wall[0, :, :] = 1
    env = aio.mmf.nexus_combine_environments(node, fil, wall)
    assert env[0, 0, 0] == aio.mmf.NODE       # node wins
    assert env[0, 0, 1] == aio.mmf.FILAMENT   # filament beats wall
    assert env[0, 3, 3] == aio.mmf.WALL
    props = aio.mmf.nexus_environment_properties(env, np.ones((4, 4, 4)),
                                                 100.0)
    npt.assert_allclose(sum(p["volume_fraction"] for p in props.values()),
                        1.0)


# ---------------------------------------------------------------- analysis
def test_bootstrap_statistic_brackets(rng):
    vals = jnp.asarray(rng.normal(5.0, 1.0, (200, 3)).astype(np.float32))
    lo, med, hi = AN.bootstrap_statistic(vals, jax.random.PRNGKey(0),
                                         n_boot=200)
    assert np.all(np.asarray(lo) < 5.2) and np.all(np.asarray(hi) > 4.8)


def test_least_squares_fit_line():
    x = jnp.linspace(0, 10, 50)
    y = 2.0 * x + 1.0
    coef = AN.least_squares_fit(x, y, degree=1)
    npt.assert_allclose(np.asarray(coef), [2.0, 1.0], atol=1e-4)


def test_pca_recovers_dominant_direction(rng):
    d = rng.normal(size=(500, 1)) * np.array([[3.0, 1.0]]) \
        + rng.normal(size=(500, 2)) * 0.1
    comps, var, mean = AN.pca(jnp.asarray(d.astype(np.float32)), 1)
    v = np.asarray(comps[0])
    direction = np.abs(v / np.linalg.norm(v))
    npt.assert_allclose(direction, np.array([3.0, 1.0]) / np.sqrt(10),
                        atol=0.05)


def test_distribution_percentile_uniform():
    # flat distribution over [0, 10): cumsum crosses 50% at the midpoint
    x = np.linspace(0.5, 9.5, 10)
    y = np.ones(10)
    q25, q50, q75 = AN.distribution_percentile(x, y, (25.0, 50.0, 75.0))
    # exact for the interpolated staircase: 50% falls halfway between
    # the 5th and 6th sample crossings
    npt.assert_allclose(q50, 5.0, atol=0.5)
    assert q25 < q50 < q75


def test_general_least_squares_quadratic():
    rng_l = np.random.default_rng(3)
    x = np.linspace(-2, 2, 80)
    y = 1.5 - 0.7 * x + 0.3 * x ** 2 + rng_l.normal(0, 0.01, x.size)
    a, a_err, chi2, npts = AN.general_least_squares(
        [np.ones_like(x), x, x ** 2], y)
    npt.assert_allclose(a, [1.5, -0.7, 0.3], atol=0.02)
    assert np.all(a_err > 0) and npts == 80
    # weighted: zero weight on corrupted points excludes them
    y2 = y.copy()
    y2[:5] += 100.0
    w = np.ones_like(x)
    w[:5] = 0.0
    a2, _, _, _ = AN.general_least_squares([np.ones_like(x), x, x ** 2],
                                           y2, weights=w)
    a_ref, _, _, _ = AN.general_least_squares(
        [np.ones_like(x[5:]), x[5:], x[5:] ** 2], y[5:])
    npt.assert_allclose(a2, a_ref, atol=1e-8)


def test_correlation_matrix_bootstrap_errors(rng):
    z = rng.normal(size=(400,))
    data = np.stack([z + rng.normal(0, 0.1, 400),
                     z + rng.normal(0, 0.1, 400),
                     rng.normal(size=(400,))], axis=-1)
    corr, err = AN.correlation_matrix(data, n_boot=50)
    assert corr[0, 1] > 0.9 and abs(corr[0, 2]) < 0.2
    assert np.all(np.diag(err) < 1e-12)  # diagonal is exactly 1
    assert err[0, 2] > err[0, 1]  # noise-dominated pair less certain
    # tiny sample: correlation returned for both (reference convention)
    c2, e2 = AN.correlation_matrix(data[:3])
    npt.assert_allclose(c2, e2)
    with pytest.raises(ValueError):
        AN.correlation_matrix(z)


# ----------------------------------------------------------- observability
def test_stage_timer_collects():
    col = OBS.StageTimes()
    with OBS.stage("demo", collector=col, log=False):
        x = jnp.ones((8, 8)).sum()
    assert "demo" in col.times and col.times["demo"] >= 0
    json.loads(col.as_json())


def test_io_save_helpers(tmp_path):
    from astrild_tpu.io import save

    p = save.save_skymap(np.ones((4, 4)), str(tmp_path / "m.npy"))
    assert os.path.exists(p)
    p2 = save.save_tpcf(str(tmp_path), "tpcf.h5", np.arange(5.0),
                        np.ones(5), {0: np.ones(5)})
    tab = aio.columnar_h5.read_table(p2)
    assert "xi_0" in tab


def test_dipole_figures(tmp_path, rng):
    """visual/figures dipole plots (astrildvisual/rays/visuals.py parity)."""
    pytest.importorskip("matplotlib")
    from astrild_tpu.visual import figures

    npix = 128
    img = rng.normal(0, 1e-7, (npix, npix))
    img[60:68, 60:68] += 1e-6
    cat = {"theta1_pix": np.array([64.0, 30.0]),
           "theta2_pix": np.array([64.0, 90.0]),
           "theta1_mtvel": np.array([300.0, -100.0]),
           "theta2_mtvel": np.array([0.0, 200.0])}
    f1 = str(tmp_path / "maps.png")
    figures.plot_dipole_maps(cat, img, [0, 1], extent_deg=1.0,
                             opening_angle_deg=20.0, fname=f1)
    f2 = str(tmp_path / "cross.png")
    figures.plot_dipole_cross_section(cat, img, 0, fname=f2)
    import os

    assert os.path.getsize(f1) > 0 and os.path.getsize(f2) > 0


@pytest.mark.slow
def test_publication_figures(tmp_path, rng):
    """New astrildvisual parity surface: publication style, journal figure
    sizes, velocity-quiver map panels, analytic dipole-map grid."""
    pytest.importorskip("matplotlib")
    import matplotlib as mpl

    from astrild_tpu.visual import figures

    w, h = figures.set_size("mnras")
    assert 3.0 < w < 4.0 and h < w
    old = figures.use_publication_style()
    assert mpl.rcParams["xtick.direction"] == "in"
    mpl.rcParams.update(old)
    with pytest.raises(ValueError):
        figures.set_size("unknown-journal")

    npix = 64
    maps = [rng.normal(size=(npix, npix)) for _ in range(2)]
    pos = [rng.uniform(0, 10, (50, 2)) for _ in range(2)]
    vel = [rng.normal(0, 300, (50, 2)) for _ in range(2)]
    f1 = str(tmp_path / "vel.png")
    figures.plot_maps_with_vel_field(maps, pos, vel, opening_angle_deg=10.0,
                                     npix_vel=8, titles=["GR", "F5"],
                                     fname=f1)
    f2 = str(tmp_path / "dip.png")
    figures.plot_analytic_dipole_maps([1e14, 5e14],
                                      [[300.0, 0.0], [0.0, -300.0]],
                                      npix=32, fname=f2)
    assert os.path.getsize(f1) > 0 and os.path.getsize(f2) > 0
