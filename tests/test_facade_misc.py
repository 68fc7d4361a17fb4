"""Facade-surface tests, part 2: io helpers, core containers, utility
toolboxes, loose device ops and the gated visual layer."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.utils.cosmology import Cosmology


# ------------------------------------------------------------- io helpers
def test_save_columns_roundtrip(tmp_path):
    from astrild_tpu.io import columnar_h5
    from astrild_tpu.io.save import save_columns, save_dataFrame

    cols = {"a": np.arange(5.0), "b": np.linspace(0, 1, 5)}
    path = save_columns(str(tmp_path / "sub"), "t.h5", cols)
    back = columnar_h5.read_table(path)
    npt.assert_allclose(back["a"], cols["a"])
    assert save_dataFrame is save_columns  # reference-name alias


def test_merge_ray_outputs_direct(tmp_path):
    from astrild_tpu.io.rays import merge_ray_outputs

    a = np.array([[1.0, 10.0], [2.0, 20.0]])
    b = np.array([[3.0, 30.0]])
    pa, pb = str(tmp_path / "r.out00001"), str(tmp_path / "r.out00002")
    np.savetxt(pa, a, header="id v")
    np.savetxt(pb, b, header="id v")
    out = merge_ray_outputs([pa, pb], ["id", "v"])
    npt.assert_allclose(out["id"], [1, 2, 3])
    npt.assert_allclose(out["v"], [10, 20, 30])


def test_combine_gadget(tmp_path):
    from astrild_tpu.io.gadget_binary import (combine_gadget, read_gadget,
                                              write_gadget)

    rng = np.random.default_rng(0)
    parts = []
    for fn, n in ((0, 7), (1, 5)):
        p = str(tmp_path / f"snap.{fn}")
        write_gadget(p, rng.uniform(0, 50, (n, 3)),
                     rng.normal(0, 100, (n, 3)),
                     np.arange(fn * 100, fn * 100 + n, dtype=np.uint32),
                     boxsize=50.0, masses=np.full(n, 2.0))
        parts.append(read_gadget(p))
    header, blocks = combine_gadget(parts)
    assert int(np.asarray(header["npart"]).sum()) == 12
    assert blocks["pos"].shape == (12, 3)
    npt.assert_array_equal(blocks["ids"][:7], np.arange(7))
    npt.assert_array_equal(blocks["ids"][7:], np.arange(100, 105))
    npt.assert_allclose(blocks["mass"], 2.0)
    with pytest.raises(ValueError):
        combine_gadget([])


# --------------------------------------------------------- core containers
def test_catalog_container_methods():
    from astrild_tpu.core.catalog import Catalog

    cat = Catalog.from_dict({"x": np.arange(4.0), "m": np.ones(4)})
    assert len(cat) == 4 and "x" in cat
    cat2 = cat.with_column("v", np.full(4, 3.0))
    assert "v" in cat2 and "v" not in cat  # immutability
    pd = pytest.importorskip("pandas")
    df = cat2.to_dataframe()
    assert isinstance(df, pd.DataFrame)
    npt.assert_allclose(df["v"], 3.0)
    back = Catalog.from_dataframe(df)
    npt.assert_allclose(np.asarray(back["x"]), np.arange(4.0))


def test_grid3d_and_skygrid_methods():
    from astrild_tpu.core.grid import Grid3D, SkyGrid

    g = Grid3D(jnp.full((4, 4, 4), 2.0), boxsize=100.0)
    assert g.cell_size == 25.0
    dc = g.density_contrast()
    npt.assert_allclose(np.asarray(dc.values), 0.0, atol=1e-7)
    # pytree roundtrip preserves aux data
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2.boxsize == 100.0

    sky = SkyGrid({"orig": jnp.zeros((60, 60))}, opening_angle=10.0,
                  quantity="kappa_2")
    assert sky.pixel_arcmin == 10.0
    sky2 = sky.with_layer("filtered", jnp.ones((60, 60)))
    assert "filtered" in sky2.data and "filtered" not in sky.data
    npt.assert_allclose(np.asarray(sky2.layer("filtered")), 1.0)


# ------------------------------------------------------- utils: toolboxes
def test_check_finite_and_nan_toggle():
    from astrild_tpu.utils.observability import (check_finite,
                                                 enable_nan_checks)

    check_finite({"a": jnp.ones(3)}, name="ok")  # passes silently
    with pytest.raises(ValueError, match="non-finite"):
        check_finite((jnp.ones(2), jnp.array([1.0, np.nan])), name="bad")
    try:
        enable_nan_checks(True)
        assert jax.config.jax_debug_nans
    finally:
        enable_nan_checks(False)
    assert not jax.config.jax_debug_nans


def test_analysis_pdf_percentiles_covariance(rng):
    from astrild_tpu.utils.analysis import (covariance_from_realizations,
                                            pdf_1d, percentiles)

    x = rng.normal(0, 1, 20000)
    centers, pdf = pdf_1d(x, nbins=40, vrange=(-4, 4))
    assert centers.shape == (40,)
    npt.assert_allclose(np.sum(pdf) * (centers[1] - centers[0]), 1.0,
                        rtol=1e-6)
    q = percentiles(x, qs=(16, 50, 84))
    npt.assert_allclose(q, np.percentile(x, [16, 50, 84]))
    samples = rng.normal(0, 1, (500, 3)) @ np.diag([1.0, 2.0, 0.5])
    cov = covariance_from_realizations(samples)
    npt.assert_allclose(cov, np.cov(samples, rowvar=False), rtol=1e-5)
    corr = covariance_from_realizations(samples, correlation=True)
    npt.assert_allclose(np.diag(corr), 1.0, rtol=1e-5)


def test_snapshot_info_table_columns():
    from astrild_tpu.models.siminfo import snapshot_info_table

    tab = snapshot_info_table({1: [1.0, 0.5, 0.0], 2: [2.0, 1.0]},
                              Cosmology(Om0=0.3, h=0.7))
    npt.assert_array_equal(tab["_index_0"], [1, 1, 1, 2, 2])
    npt.assert_array_equal(tab["_index_1"], [1, 2, 3, 1, 2])
    npt.assert_allclose(tab["a"], 1.0 / (1.0 + tab["redshift"]))
    # Dc monotone in z within each box
    assert tab["Dc"][0] > tab["Dc"][1] > tab["Dc"][2]
    assert tab["Hz"][0] > tab["Hz"][2]  # H(z) grows with z


# ----------------------------------------------------------- loose ops
def test_gnfw_pressure_shape():
    from astrild_tpu.ops.sz import gnfw_pressure

    x = jnp.asarray([0.05, 0.2, 1.0, 3.0])
    p = np.asarray(gnfw_pressure(x))
    assert (p > 0).all() and np.all(np.diff(p) < 0)  # monotone decline


def test_duffy_concentration_pivot():
    from astrild_tpu.ops.halo_model import duffy_concentration

    npt.assert_allclose(float(duffy_concentration(2.0e12, z=0.0)), 10.14,
                        rtol=1e-12)
    assert float(duffy_concentration(2.0e14, z=0.0)) < 10.14
    assert float(duffy_concentration(2.0e12, z=1.0)) < 10.14


def test_gradient_3d_matches_numpy(rng):
    from astrild_tpu.ops.map_transform import gradient_3d

    f = rng.normal(0, 1, (8, 8, 8)).astype(np.float32)
    g = np.asarray(gradient_3d(jnp.asarray(f), spacing=0.5))
    expect = np.stack(np.gradient(f, 0.5), axis=0)
    npt.assert_allclose(g, expect, atol=1e-5)


def test_paint_objects_on_map_area():
    from astrild_tpu.ops.map_transform import paint_objects_on_map

    img = np.asarray(paint_objects_on_map(
        64, jnp.asarray([[32.0, 32.0], [5.0, 5.0]]),
        jnp.asarray([6.0, 2.0]), values=jnp.asarray([1.0, 10.0])))
    assert img.shape == (64, 64)
    # disc areas ~ pi r^2 (discrete): count cells carrying each value
    assert abs((img == 1.0).sum() - np.pi * 36) < 15
    assert img[5, 5] == 10.0 and img[32, 32] == 1.0


def test_dgd3_window_symmetry():
    from astrild_tpu.ops.filters import dgd3_window

    # odd npix so the e = i - npix//2 offsets are mirror-symmetric
    w1 = np.asarray(dgd3_window(65, 10.0, 20.0, axis=1))
    # odd in the differentiation direction, even transverse
    npt.assert_allclose(w1, -w1[:, ::-1], atol=1e-12)
    npt.assert_allclose(w1, w1[::-1, :], atol=1e-12)
    w0 = np.asarray(dgd3_window(65, 10.0, 20.0, axis=0))
    npt.assert_allclose(w0, w1.T, atol=1e-12)


def test_fft_smooth_identity_and_dc(rng):
    from astrild_tpu.ops.filters import fft_smooth

    img = jnp.asarray(rng.normal(0, 1, (32, 32)).astype(np.float32))
    out = np.asarray(fft_smooth(img, jnp.ones((32, 32))))
    npt.assert_allclose(out, np.asarray(img), atol=1e-5)
    dc_only = np.asarray(fft_smooth(img, jnp.zeros((32, 32)).at[0, 0].set(1.0)))
    npt.assert_allclose(dc_only, float(jnp.mean(img)), atol=1e-5)


def test_local_maxima_strictness():
    from astrild_tpu.ops.peaks import local_maxima

    img = jnp.zeros((8, 8)).at[3, 3].set(2.0).at[6, 1].set(1.0)
    m = np.asarray(local_maxima(img))
    assert m[3, 3] and m[6, 1]
    # a plateau is NOT a strict maximum
    flat = np.asarray(local_maxima(jnp.ones((8, 8))))
    assert not flat.any()


def test_nfw_profile_closed_form():
    from astrild_tpu.ops.profiles3d import nfw_profile

    npt.assert_allclose(float(nfw_profile(jnp.asarray(0.05), 4.0, 0.05)),
                        1.0, rtol=1e-6)  # rho(rs) = rho_s/4
    r = jnp.asarray([0.01, 0.1, 1.0])
    rho = np.asarray(nfw_profile(r, 1.0, 0.1))
    assert np.all(np.diff(rho) < 0)


# ------------------------------------------------------------ visual layer
def test_visual_figures(tmp_path, rng):
    plt_mod = pytest.importorskip("matplotlib")
    plt_mod.use("Agg")
    from astrild_tpu.visual.figures import (figure_size,
                                            plot_halo_mass_function,
                                            plot_power_spectra,
                                            plot_velocity_field,
                                            plot_void_profiles)

    w, h = figure_size()
    assert w > h > 0
    k = np.geomspace(0.01, 1.0, 16)
    f1 = str(tmp_path / "pk.png")
    plot_power_spectra(k, {"GR": 1e4 * k ** -1.5}, theory=9e3 * k ** -1.5,
                       fname=f1)
    f2 = str(tmp_path / "hmf.png")
    plot_halo_mass_function(np.geomspace(1e12, 1e15, 10),
                            np.geomspace(1e3, 1, 10), volume=1e6, fname=f2)
    f3 = str(tmp_path / "void.png")
    plot_void_profiles(np.linspace(0.1, 3, 12), np.linspace(-0.1, 0, 12),
                       lowerr=np.full(12, -0.12), higherr=np.full(12, 0.02),
                       fname=f3)
    f4 = str(tmp_path / "vel.png")
    plot_velocity_field(rng.uniform(0, 100, (200, 2)),
                        rng.normal(0, 100, (200, 2)), nbins=8,
                        boxsize=100.0, fname=f4)
    for f in (f1, f2, f3, f4):
        assert os.path.getsize(f) > 0


# ----------------------------------------------- cosmology & power helpers
def test_cosmology_helper_surface():
    c = Cosmology(Om0=0.3, h=0.7)
    z = 1.0
    chi = float(c.comoving_distance(z))
    npt.assert_allclose(float(c.angular_diameter_distance(z)), chi / 2.0,
                        rtol=1e-6)
    npt.assert_allclose(float(c.efunc_a(1.0)), 1.0, rtol=1e-6)
    npt.assert_allclose(float(c.efunc_a(0.5)),
                        np.sqrt(0.3 * 8 + 0.7), rtol=1e-5)
    from astrild_tpu.utils.constants import RHO_CRIT0
    npt.assert_allclose(float(c.rho_mean0()), 0.3 * RHO_CRIT0)
    # sigma_crit_inv: zero for source in front of lens, positive behind
    assert float(c.sigma_crit_inv(0.5, 0.2)) == 0.0
    s = float(c.sigma_crit_inv(0.2, 1.0))
    assert s > 0
    # further source -> larger 1/Sigma_crit (easier lensing)
    assert float(c.sigma_crit_inv(0.2, 2.0)) > s


def test_growth_factor_k_gr_limit():
    c = Cosmology(Om0=0.3, h=0.7, fR0=0.0)
    k = np.array([0.01, 0.1, 1.0], np.float32)
    # fR0=0 -> scale-free; D(k, z) carries the raw D ~ a matter-domination
    # normalization, so compare GROWTH RATIOS against the (D(0)=1) table
    dk0 = np.asarray(c.growth_factor_k(k, z=0.0))
    dk1 = np.asarray(c.growth_factor_k(k, z=1.0))
    assert np.ptp(dk0) / dk0.mean() < 1e-4  # scale-independent
    npt.assert_allclose(dk1 / dk0, float(c.growth_factor(1.0)), rtol=2e-3)


def test_power_mode_helpers():
    from astrild_tpu.ops import power as P

    n, box = 16, 100.0
    m = np.asarray(P.mode_radius_rfft(n))
    assert m.shape == (n, n, n // 2 + 1)
    assert m[0, 0, 0] == 0.0 and m[0, 0, 1] == 1.0
    npt.assert_allclose(m[1, 2, 2], np.sqrt(1 + 4 + 4), rtol=1e-6)
    kf = 2 * np.pi / box
    npt.assert_allclose(np.asarray(P.kmag_rfft(n, box)), m * kf, rtol=1e-6)
    w = np.asarray(P.hermitian_weights(n))
    assert w[0, 0, 0] == 1.0 and w[0, 0, -1] == 1.0
    assert (w[0, 0, 1:-1] == 2.0).all()
    # sum of weighted rfft modes == full fft mode count
    assert float((w * np.ones((n, n, n // 2 + 1))).sum()) == n ** 3
    # delta_k_parts: transfer-safe (re, im) pair == complex delta_k
    g = np.random.default_rng(0).normal(0, 1, (n, n, n)).astype(np.float32)
    re, im = P.delta_k_parts(jnp.asarray(g))
    dk = np.asarray(P.delta_k(jnp.asarray(g)))
    npt.assert_allclose(np.asarray(re) + 1j * np.asarray(im), dk,
                        atol=1e-5)


def test_geometry_conversions_and_pencil_sharding():
    from astrild_tpu.utils.geometry import arcmin_to_deg, deg_to_arcmin
    npt.assert_allclose(arcmin_to_deg(90.0), 1.5)
    npt.assert_allclose(deg_to_arcmin(arcmin_to_deg(17.0)), 17.0)

    from astrild_tpu.parallel.mesh import make_mesh, pencil_sharding
    mesh = make_mesh()
    sh = pencil_sharding(mesh)
    spec = sh.spec
    assert tuple(spec) == ("x", "y", None)
    shb = pencil_sharding(mesh, batched=True)
    assert tuple(shb.spec) == ("sim", "x", "y")


def test_log_compile_cache_sets_config():
    from astrild_tpu.utils.observability import log_compile_cache
    before = jax.config.jax_compilation_cache_dir
    try:
        log_compile_cache("/tmp/jax_cache_test")
        assert jax.config.jax_compilation_cache_dir == "/tmp/jax_cache_test"
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_visual_maps_facade(tmp_path, rng):
    """Maps(Simulation) facade (astrildvisual/particles/map.py:15-101):
    walk ray-map point-set files, slab-cut, grid, save .npy."""
    from astrild_tpu.io import columnar_h5
    from astrild_tpu.visual import Maps

    npix = 16
    # two "Ray_maps_output" point-set files: points on an npix lattice at
    # two z-slabs, kappa_2 = x so the gridded map is known exactly
    for nr, zc in [(12, 0.5), (13, 0.9)]:
        g = (np.arange(npix) + 0.5) / npix
        xx, yy = np.meshgrid(g, g, indexing="ij")
        columnar_h5.write_table(
            str(tmp_path / f"Ray_maps_output{nr:05d}.h5"),
            {"x": xx.ravel(), "y": yy.ravel(),
             "z": np.full(npix * npix, zc),
             "kappa_2": xx.ravel()})
    m = Maps(boxsize=500.0, domain_level=npix, dir_sim=str(tmp_path),
             dir_out=str(tmp_path))
    assert list(m.file_nrs) == [12, 13]

    out = m.to_array(centre=0.5, depth=0.1, quantities=["kappa_2"])
    assert sorted(out) == [12, 13]
    m12 = out[12]["kappa_2"]
    assert m12.shape == (npix, npix)
    g = (np.arange(npix) + 0.5) / npix
    # rows = y, cols = x; kappa_2 = x varies along columns
    npt.assert_allclose(m12[0], g, atol=1e-12)
    # file 13's points lie outside the z-slab -> empty map filled with the
    # slab mean of an empty selection = 0
    npt.assert_allclose(out[13]["kappa_2"], 0.0)
    # saved artifacts
    import os
    assert os.path.exists(
        str(tmp_path / f"kappa_2_map_{m.name}_out00012.npy"))

    # snap_nrs selection honored (the reference hardcoded file 12)
    m2 = Maps(domain_level=npix, dir_sim=str(tmp_path), snap_nrs=[13])
    assert list(m2.file_nrs) == [13]
    import pytest
    with pytest.raises(ValueError):
        Maps(domain_level=npix, dir_sim=str(tmp_path), snap_nrs=[99])
