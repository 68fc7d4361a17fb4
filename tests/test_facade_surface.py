"""Facade-surface tests: public reference-parity methods exercised.

Every method here mirrors a reference API a switching user calls first
(simulation handles, halo-stat dispatch, sky/power facades, io helpers).
Deeper numerics are pinned in per-domain modules; these assert the
public plumbing end-to-end on small synthetic data.
"""
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.models import (AngularPowerSpectrum, Dipoles, Ecosmog,
                                Halos, LinearAngularPowerSpectrum,
                                LinearPowerSpectrum, Peaks, PowerSpectrum3D,
                                RayRamses, Simulation, SkyArray)
from astrild_tpu.models.simcoll import SimulationCollection
from astrild_tpu.utils.cosmology import Cosmology


# ------------------------------------------------------ simulation handles
@pytest.fixture
def rockstar_tree(tmp_path):
    for snap in [1, 2, 3]:
        d = tmp_path / f"rockstar_{snap:03d}"
        d.mkdir()
        for fn in range(2):
            p = d / f"halos_0.{fn}.ascii"
            with open(p, "w") as f:
                f.write("#id x y z vx vy vz m200c r200c Rs\n")
                for _ in range(19):
                    f.write("# c\n")
                rng = np.random.default_rng(snap * 10 + fn)
                for i in range(25):
                    x, y, z = rng.uniform(5, 95, 3)
                    vx, vy, vz = rng.normal(0, 100, 3)
                    m = 10 ** rng.uniform(12.5, 14.5)
                    f.write(f"{i} {x} {y} {z} {vx} {vy} {vz} {m} "
                            f"{0.2} {0.05}\n")
    return str(tmp_path)


def test_simulation_discovery_helpers(rockstar_tree, tmp_path):
    sim = Simulation(rockstar_tree, None,
                     {"root": "halos", "extension": ".ascii"},
                     dir_root="rockstar")
    npt.assert_array_equal(sim.get_dir_nrs(), [1, 2, 3])
    paths = sim.get_dir_paths(None, "rockstar")
    assert len(paths) == 3 and all(os.path.isdir(p) for p in paths)
    # explicit id list resolves through the root_%03d template
    paths2 = sim.get_dir_paths([2], "rockstar")
    assert len(paths2) == 1 and "rockstar_002" in paths2[0]
    nrs = sim.get_file_nrs({"root": "halos", "extension": ".ascii"},
                           str(tmp_path / "rockstar_002"), "max", sort=True)
    npt.assert_array_equal(nrs, [0, 1])
    # remove_files unlinks exactly what it is given
    victims = [str(tmp_path / "a.tmp"), str(tmp_path / "b.tmp")]
    for v in victims:
        open(v, "w").write("x")
    Simulation.remove_files(victims)
    assert not any(os.path.exists(v) for v in victims)


def _f77_grav_file(path, ncache, n_fields, level, seed, ndim=3):
    """Tiny single-level grav F77 file; returns per-field cell values."""
    dimfac = 2 ** ndim
    buf = b""
    for v in (1, ndim, level, 0):  # ncpu, ndim, nlevelmax, nboundary
        buf += struct.pack("iii", 4, v, 4)
    buf += struct.pack("iii", 4, level, 4)
    buf += struct.pack("iii", 4, ncache, 4)
    rng = np.random.default_rng(seed)
    expect = [[] for _ in range(n_fields)]
    for _dim in range(dimfac):
        for fi in range(n_fields):
            vals = rng.standard_normal(ncache)
            expect[fi].append(vals)
            buf += struct.pack("i", 8 * ncache)
            buf += vals.astype("<f8").tobytes()
            buf += struct.pack("i", 8 * ncache)
    with open(path, "wb") as f:
        f.write(buf)
    return [np.concatenate(e) for e in expect]


def test_ecosmog_compress_snapshot(tmp_path):
    fields = ["phi", "f1"]
    for snap in (7, 8):
        d = tmp_path / f"output_{snap:05d}"
        d.mkdir()
        _f77_grav_file(d / f"grav_{snap:05d}.out00001", 6, len(fields),
                       7, seed=snap)
    eco = Ecosmog(dir_sim=str(tmp_path), dir_out=str(tmp_path),
                  dir_root="output", boxsize=100.0, domain_level=128)
    out = eco.compress_snapshot([7], 7, fields, snap_nrs=[8],
                                dir_out=str(tmp_path), save=True)
    assert list(out) == [8]  # snap_nrs honored
    assert set(out[8]) == {"phi", "f1"}
    # saved artifact reads back identically
    from astrild_tpu.io import columnar_h5
    tab = columnar_h5.read_table(str(tmp_path / "grav_out00008.h5"))
    npt.assert_allclose(tab["phi"], out[8]["phi"])


def test_read_grav_snapshot_merge_and_dedup(tmp_path):
    from astrild_tpu.io.ramses import read_grav_snapshot

    e1 = _f77_grav_file(tmp_path / "grav_00003.out00001", 5, 2, 7, seed=1)
    e2 = _f77_grav_file(tmp_path / "grav_00003.out00002", 4, 2, 7, seed=2)
    paths = [str(tmp_path / "grav_00003.out00002"),
             str(tmp_path / "grav_00003.out00001")]
    out = read_grav_snapshot(paths, ["a", "b"], 7, 7, ndim=3,
                             deduplicate=False)
    # sorted by cpu id: file .out00001 first despite list order
    npt.assert_allclose(out["a"][:40], e1[0])
    npt.assert_allclose(out["b"][40:], e2[1])
    # exact-duplicate rows (ghost zones) are dropped when deduplicating
    dup = read_grav_snapshot([paths[1], paths[1]], ["a", "b"], 7, 7,
                             ndim=3, deduplicate=True)
    assert dup["a"].shape[0] == 40


@pytest.fixture
def ray_ascii_tree(tmp_path):
    rng = np.random.default_rng(0)
    cols = ["ray_id", "kappa_2", "shear_x", "shear_y"]
    truth = {}
    for snap in (1, 2):
        rows = []
        for cpu in (1, 2):
            n = 8
            block = np.column_stack([
                np.arange(cpu * 100, cpu * 100 + n, dtype=float),
                rng.normal(0, 1e-2, n), rng.normal(0, 1e-3, n),
                rng.normal(0, 1e-3, n)])
            rows.append(block)
            p = tmp_path / f"Ray_maps_output{snap:05d}.out{cpu:05d}"
            np.savetxt(p, block, header=" ".join(cols))
        truth[snap] = np.concatenate(rows, axis=0)
    return str(tmp_path), cols, truth


def test_rayramses_compress_snapshot(ray_ascii_tree, tmp_path):
    path, cols, truth = ray_ascii_tree
    rr = RayRamses(dir_sim=path, dir_out=path,
                   file_dsc={"root": "Ray_maps", "extension": "out*"},
                   opening_angle=10.0, npix=64)
    out = rr.compress_snapshot(cols, dir_out=path, save=True)
    assert set(out) == {1, 2}
    # shear sign corrections applied at compress time; others untouched
    npt.assert_allclose(out[1]["kappa_2"], truth[1][:, 1])
    npt.assert_allclose(out[1]["shear_x"], -truth[1][:, 2])
    npt.assert_allclose(out[2]["shear_y"], -truth[2][:, 3])
    from astrild_tpu.io import columnar_h5
    tab = columnar_h5.read_table(os.path.join(path,
                                              "Ray_maps_output00001.h5"))
    npt.assert_allclose(tab["shear_x"], out[1]["shear_x"])


def test_rayramses_dc_to_redshift_roundtrip():
    rr = RayRamses(dir_sim=".", opening_angle=10.0, npix=64)
    z = np.array([0.2, 0.5, 1.0])
    dc = rr.cosmo.comoving_distance(z)
    z_back = np.asarray(rr.Dc_to_redshift(jnp.asarray(dc)))
    npt.assert_allclose(z_back, z, rtol=2e-3)


def test_rayramses_find_halos_in_raytracing_box(rockstar_tree, tmp_path):
    # ray snapshots 1..3 (the last is dropped by the reference convention)
    ray_dir = tmp_path / "rays"
    ray_dir.mkdir()
    for snap in (1, 2, 3):
        np.savetxt(ray_dir / f"Ray_maps_output{snap:05d}.out00001",
                   np.zeros((2, 2)), header="h")
    eco = Ecosmog(dir_sim=rockstar_tree, dir_root="rockstar",
                  file_dsc={"root": "halos", "extension": ".ascii"},
                  boxsize=100.0)
    eco.files["halos"] = eco.get_file_paths(
        {"root": "halos", "extension": ".ascii"}, None, "max")
    rr = RayRamses(dir_sim=str(ray_dir),
                   file_dsc={"root": "Ray_maps", "extension": "out*"},
                   opening_angle=20.0, npix=128)
    # snapdist runs far -> near (lightcone written outside-in); the last
    # entry is the box's near face (reference rayramses.py:463-470)
    snapdist = np.array([500.0, 450.0, 400.0])
    cat = rr.find_halos_in_raytracing_box(eco, snapdist, box_nr=0,
                                          boxsize=100.0)
    assert cat and "ray_nr" in cat
    # catalog ray_nr column = ray_nr + 1 (reference schema)
    assert set(np.unique(cat["ray_nr"])).issubset({2, 3})
    rad = np.asarray(cat["rad_dist"])
    assert (rad >= 400.0).all() and (rad <= 500.0).all()
    # shell ownership: rows from ray 1 sit beyond 450
    assert (rad[np.asarray(cat["ray_nr"]) == 2] >= 450.0).all()


def test_simcoll_compress_histograms(tmp_path):
    from astrild_tpu.io import columnar_h5

    sims = {}
    for i, name in enumerate(["boxA", "boxB"]):
        d = tmp_path / name
        d.mkdir()
        columnar_h5.write_table(
            str(d / "hist.h5"),
            {"bin": np.arange(4.0), "m200c": np.full(4, float(i + 1))})
        sims[name] = Ecosmog(dir_sim=str(d), boxsize=100.0)
    coll = SimulationCollection({}, sims)
    ds = coll.compress_histograms({"root": "hist", "extension": "h5"},
                                  str(tmp_path / "out"))
    assert ds["count"].shape == (2, 1, 4)
    npt.assert_allclose(ds["count"][1, 0], 2.0)
    assert os.path.exists(str(tmp_path / "out" / "hist.stats.h5"))


# ----------------------------------------------------------- halo facades
def _rockstar_snapshot(n=400, seed=0, boxsize=100.0):
    rng = np.random.default_rng(seed)
    m = 10 ** rng.uniform(12.0, 14.5, n)
    return {"x": rng.uniform(0, boxsize, n), "y": rng.uniform(0, boxsize, n),
            "z": rng.uniform(0, boxsize, n), "vx": rng.normal(0, 100, n),
            "vy": rng.normal(0, 100, n), "vz": rng.normal(0, 100, n),
            "m200c": m, "r200c": 0.2 * (m / 1e13) ** (1 / 3),
            "Rs": 0.05 * (m / 1e13) ** (1 / 3)}


def test_get_rockstar_stats_public(rockstar_tree):
    sim = Simulation(rockstar_tree, None,
                     {"root": "halos", "extension": ".ascii"},
                     dir_root="rockstar")
    sim.files["halos"] = sim.get_file_paths(
        {"root": "halos", "extension": ".ascii"}, None, "max")
    halos = Halos.from_rockstar(2, sim)
    stats = halos.get_rockstar_stats("astrild_tpu/configs/halo_stats.yaml",
                                     snap_nrs=[2], save=False,
                                     dm_particle_mass=1e8)
    hmf = stats["halo_mass_fct"]["results"]["values"]["snap_2"]
    assert np.all(np.diff(hmf) <= 0)
    xi = stats["two_point_corr_fct"]["results"]["values"]["snap_2"]
    assert np.isfinite(xi).any()


def test_rockstar_namespace_statics():
    snap = _rockstar_snapshot()
    from astrild_tpu.models.halos import Rockstar

    bins, cm = Rockstar.concentration_mass_rel(snap, nbins=8)
    sel = np.isfinite(cm)
    assert sel.any()
    # r200c/Rs = 4 by construction -> c = 4 in every populated bin
    npt.assert_allclose(cm[sel], 4.0, rtol=1e-5)
    hists = Rockstar.histograms(snap, nbins=16,
                                properties={"m200c": (1e12, 10 ** 14.5)})
    assert hists["m200c"].shape == (16,)
    assert (hists["m200c"] >= 0).all()
    r, xi = Rockstar.two_point_corr_fct(snap, limits=(2.0, 20.0), nbins=6,
                                        boxsize=100.0)
    assert r.shape == (6,) and np.isfinite(xi).all()
    # Poisson points: |xi| small compared to 1
    assert np.abs(xi).max() < 1.0


def test_subfind_facades(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(1)
    gdir = tmp_path / "groups_004"
    gdir.mkdir()
    ngroups = 50
    with h5py.File(gdir / "fof_subhalo_tab_004.0.hdf5", "w") as f:
        h = f.create_group("Header")
        h.attrs["Ngroups_ThisFile"] = ngroups
        h.attrs["Ngroups_Total"] = ngroups
        h.attrs["Nsubgroups_ThisFile"] = ngroups
        h.attrs["Nsubgroups_Total"] = ngroups
        h.attrs["HubbleParam"] = 0.7
        g = f.create_group("Group")
        g["GroupPos"] = rng.uniform(0, 100, (ngroups, 3)) * 1e3  # kpc/h
        g["Group_M_Crit200"] = 10 ** rng.uniform(2.0, 4.0, ngroups)
        r200 = np.full(ngroups, 0.2 * 1e3)
        r200[0] = 0.0  # an unresolved group
        g["Group_R_Crit200"] = r200
        first = np.arange(ngroups)
        first[1] = -1  # a group with no subhalo
        g["GroupFirstSub"] = first
        s = f.create_group("Subhalo")
        s["SubhaloVmax"] = np.full(ngroups, 300.0)
    sim = Simulation(str(tmp_path))
    halos = Halos.from_subfind(4, sim)
    assert halos.data["n_groups"] == ngroups
    # GroupFirstSub == -1 produces NaN Vmax, not a wrapped index
    assert np.isnan(halos.data["SubhaloVmax"][1])
    assert np.isfinite(halos.data["SubhaloVmax"][2])
    filtered = Halos.filter_nonzero_subfind_halos_size(halos.data)
    assert filtered["Group_M_Crit200"].shape[0] == ngroups - 1
    # registry-driven subfind dispatch through the PUBLIC entry point
    import yaml
    cfg = {"halo_mass_fct": {"resolution": 100,
                             "args": {"limits": [10.0, 16.0], "nbins": 10}},
           "concentration_mass_rel": {
               "resolution": 100,
               "args": {"limits": [10.0, 16.0], "nbins": 10,
                        "method": "prada"}}}
    cfg_path = str(tmp_path / "subfind_stats.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    stats = Halos(halos.data, sim).get_subfind_stats(
        cfg_path, snap_nrs=[4], save=False, dm_particle_mass=1e8)
    hmf = stats["halo_mass_fct"]["results"]["values"]["snap_4"]
    assert np.all(np.diff(hmf) <= 0)
    assert "snap_4" in stats["concentration_mass_rel"]["results"]["values"]


def test_halos_nearest_neighbours():
    pos = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    h = Halos({"x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2],
               "m200c": np.ones(3)})
    dist, idx = h.nearest_neighbours(k=2)  # self-distance dropped
    npt.assert_allclose(dist[:, 0], [1.0, 1.0, 3.0])
    npt.assert_array_equal(idx[:, 0], [1, 0, 0])


def test_halos_sort_by():
    h = Halos({"id": np.array([10, 11, 12]),
               "m200c": np.array([2e13, 5e14, 1e12]),
               "x": np.array([1.0, 2.0, 3.0]),
               "n_files": 4})  # scalar metadata must survive untouched
    h.sort_by("m200c")
    npt.assert_allclose(h.data["m200c"], [5e14, 2e13, 1e12])
    npt.assert_allclose(h.data["x"], [2.0, 1.0, 3.0])
    npt.assert_array_equal(h.data["id"], [11, 10, 12])
    assert h.data["n_files"] == 4
    h.sort_by("m200c", order="ascending", relabel=True)
    npt.assert_array_equal(h.data["id"], [0, 1, 2])
    npt.assert_allclose(h.data["m200c"], [1e12, 2e13, 5e14])
    with pytest.raises(ValueError):
        h.sort_by("m200c", order="sideways")


def test_halos_sort_by_descending_keeps_tie_order():
    """Descending sort uses argsort(-key, stable) so tied rows keep their
    original relative order (r3 advisor: reversing an ascending stable
    argsort flips ties, handing relabel ids in the opposite order)."""
    h = Halos({"id": np.array([0, 1, 2, 3]),
               "m200c": np.array([5.0, 7.0, 5.0, 7.0]),
               "tag": np.array([10, 11, 12, 13])})
    h.sort_by("m200c", order="descending")
    npt.assert_array_equal(h.data["tag"], [11, 13, 10, 12])


def test_halos_neighbours_within():
    # radius query around one target (halo.py:560-586 semantics): dmax
    # defaults to the target's own radius column, scaled by extent
    h = Halos({"id": np.array([7, 8, 9]),
               "theta1_deg": np.array([0.0, 1.0, 5.0]),
               "theta2_deg": np.zeros(3),
               "r200_deg": np.array([1.5, 0.1, 0.1])})
    idx, dist = h.neighbours_within(7)
    npt.assert_array_equal(idx, [0, 1])       # id 9 at 5 deg excluded
    npt.assert_allclose(dist, [0.0, 1.0])
    idx, _ = h.neighbours_within(7, extent=4)  # 1.5 * 4 = 6 deg
    npt.assert_array_equal(idx, [0, 1, 2])
    idx, _ = h.neighbours_within(7, dmax=0.5)
    npt.assert_array_equal(idx, [0])
    with pytest.raises(KeyError):
        h.neighbours_within(42)


# ----------------------------------------------------------- power facades
def test_power_from_grid_and_cross(rng):
    n, box = 32, 100.0
    grid = jnp.asarray(rng.normal(0, 1, (n, n, n)).astype(np.float32))
    ps = PowerSpectrum3D()
    k, p_auto = ps.power_from_grid(grid, box, nbins=8)
    k2, p_cross = ps.cross_power_from_grids(grid, grid, box, nbins=8)
    npt.assert_allclose(k, k2)
    sel = np.isfinite(p_auto) & np.isfinite(p_cross)
    assert sel.any()
    # cross of a field with itself == its auto spectrum
    npt.assert_allclose(p_cross[sel], p_auto[sel], rtol=1e-4)


def test_angular_power_from_skymap(rng):
    img = rng.normal(0, 1, (128, 128)).astype(np.float32)
    sky = SkyArray.from_array(img, opening_angle=10.0, quantity="kappa_2")
    ell_a, cl_a = AngularPowerSpectrum.from_skymap(sky, nbins=12)
    ell_b, cl_b = AngularPowerSpectrum.from_array(img, 10.0, nbins=12)
    npt.assert_allclose(np.asarray(cl_a), np.asarray(cl_b))
    npt.assert_allclose(np.asarray(ell_a), np.asarray(ell_b))


def test_angular_power_healpix_round_trip():
    """to_skyhealpix (create_healpix, angular_power_spectrum.py:97) ->
    from_healpix (:55-73): band power recovered at sample variance."""
    nside, lmax = 16, 31
    cl = np.zeros(lmax + 1)
    cl[2:] = 1e-2 / np.arange(2, lmax + 1) ** 2
    sky = AngularPowerSpectrum.to_skyhealpix(cl, nside, lmax=lmax,
                                             rnd_seed=1)
    ell, cl_m = AngularPowerSpectrum.from_healpix(sky, lmax, niter=2)
    assert ell.shape == cl_m.shape == (lmax + 1,)
    band = slice(3, 12)
    ratio = cl_m[band].sum() / cl[band].sum()
    assert 0.5 < ratio < 2.0


def test_linear_power_growth_and_pdpdp():
    lps = LinearPowerSpectrum()
    D, f = lps.growth_functions(0.5)
    cosmo = lps.cosmo
    npt.assert_allclose(D, float(cosmo.growth_factor(0.5)), rtol=1e-6)
    npt.assert_allclose(f, float(cosmo.growth_rate(0.5)), rtol=1e-6)
    assert 0.0 < D < 1.0 and 0.5 < f < 1.0
    k = np.geomspace(1e-3, 1.0, 32)
    pdp = lps.P_dpdp(0.0, k)
    # velocity-potential cross spectrum: positive, steeper than P(k)
    assert (pdp > 0).all()
    ratio = pdp / np.asarray(lps.P_dd(k))
    assert ratio[0] > ratio[-1]


def test_linear_angular_compute_ctt_and_ckappa():
    ells = np.arange(10, 200, 20).astype(float)
    laps = LinearAngularPowerSpectrum(ells, np.linspace(0.01, 1.0, 8))
    ctt = laps.compute_C_tt()
    assert ctt.shape == ells.shape and (ctt > 0).all()
    # Cl property caches and recomputes through the outdated flag
    npt.assert_allclose(laps.Cl, ctt)
    ck = laps.compute_C_kappa(z_source=1.0)
    assert (ck > 0).all()
    # lensing kappa Cl falls with ell over this band
    assert ck[-1] < ck[0]


def test_powmes_reader_and_table(tmp_path):
    from astrild_tpu.models.power import PowMes

    box = 250.0
    paths = {}
    for snap in (3, 5):
        tab = np.column_stack([np.arange(1, 9, dtype=float),
                               np.full(8, float(snap))])
        p = str(tmp_path / f"powmes_{snap}.ascii")
        np.savetxt(p, tab, header="i P")
        paths[snap] = p
    k, P = PowMes.read_pk_file(paths[3], box)
    npt.assert_allclose(k, np.arange(1, 9) * 2 * np.pi / box)
    npt.assert_allclose(P, 3.0)
    cols = PowMes.to_table(paths, box, dir_out=str(tmp_path))
    assert set(cols) == {"k", "snap_3", "snap_5"}
    from astrild_tpu.io import columnar_h5
    tab2 = columnar_h5.read_table(str(tmp_path / "powmes_pk.h5"))
    npt.assert_allclose(tab2["snap_5"], 5.0)


# ------------------------------------------------------------- sky facades
def test_skyarray_create_cmb_and_substract_mean(rng):
    img = rng.normal(0, 1, (128, 128)).astype(np.float32)
    sky = SkyArray.from_array(img, opening_angle=10.0, quantity="isw_rs")
    ell = np.arange(2, 3000.0)
    cl = 1e-9 / (ell * (ell + 1))
    cmb = np.asarray(sky.create_cmb(ell, cl, rnd_seed=3))
    assert cmb.shape == (128, 128) and np.std(cmb) > 0
    cmb2 = np.asarray(sky.create_cmb(ell, cl, rnd_seed=3))
    npt.assert_allclose(cmb, cmb2)  # seed-deterministic
    sky.substract_mean(of="orig")
    assert abs(float(jnp.mean(sky.data["orig"]))) < 1e-6
    out = sky.substract_mean(of="cmb", rtn=True)
    assert abs(float(jnp.mean(out))) < 1e-12


def test_peaks_set_radii():
    peaks = Peaks({"x_deg": np.array([1.0, 5.0]),
                   "y_deg": np.array([1.0, 5.0])},
                  {"npix": 100, "opening_angle": 10.0})
    voids = {"x_deg": np.array([1.0, 9.0]), "y_deg": np.array([2.0, 9.0])}
    peaks.set_radii(voids)
    npt.assert_allclose(peaks.data["rad_deg"], [1.0, 5.0])
    npt.assert_array_equal(peaks.data["rad_pix"], [10, 50])


def test_dipoles_single_transverse_velocity_exact():
    rng = np.random.default_rng(2)
    alphax = jnp.asarray(rng.normal(0, 1e-5, (32, 32)))
    alphay = jnp.asarray(rng.normal(0, 1e-5, (32, 32)))
    from astrild_tpu.utils.constants import C_LIGHT_KMS

    vx_true, vy_true = 420.0, -130.0
    dTx = -alphax * vx_true / C_LIGHT_KMS
    dTy = -alphay * vy_true / C_LIGHT_KMS
    vx, vy = Dipoles.get_single_transverse_velocity_from_sky(
        dTx, dTy, alphax, alphay)
    npt.assert_allclose(float(vx), vx_true, rtol=1e-5)
    npt.assert_allclose(float(vy), vy_true, rtol=1e-5)


def test_skyarray_convergence_to_shear_direct(rng):
    """SkyArray.convert_convergence_to_shear == the two-step
    deflection->shear chain in the map interior."""
    from astrild_tpu.models import SkyArray

    n = 64
    e = (np.arange(n) + 0.5) / n - 0.5
    kappa = np.exp(-(e[:, None] ** 2 + e[None, :] ** 2) / (2 * 0.1 ** 2))
    sky = SkyArray.from_array(kappa.astype(np.float32), 5.0, "kappa_2")
    g1d, g2d = sky.convert_convergence_to_shear(padding_factor=4)
    sky.convert_convergence_to_deflection(padding_factor=4)
    g1c, g2c = sky.convert_deflection_to_shear()
    sl = np.s_[6:-6, 6:-6]
    npt.assert_allclose(np.asarray(g1d)[sl], np.asarray(g1c)[sl], atol=5e-3)
    npt.assert_allclose(np.asarray(g2d)[sl], np.asarray(g2c)[sl], atol=5e-3)
    assert "shearx" in sky.data and "sheary" in sky.data


def test_halos_sort_by_unsigned_and_bool_columns():
    """Descending sort must handle unsigned ints (argsort(-key) wraps
    -0 to 0, putting zero rows FIRST) and bools (negation raises)."""
    h = Halos({"id": np.arange(3), "cnt": np.array([3, 0, 5], np.uint32)})
    h.sort_by("cnt", order="descending")
    npt.assert_array_equal(h.data["cnt"], [5, 3, 0])
    h2 = Halos({"id": np.arange(4),
                "flag": np.array([False, True, False, True])})
    h2.sort_by("flag", order="descending")
    npt.assert_array_equal(h2.data["flag"], [True, True, False, False])
    npt.assert_array_equal(h2.data["id"], [1, 3, 0, 2])  # ties stable
