"""IO layer tests: format roundtrips + reads of the reference test data."""
import os

import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu import io as aio

REF_DATA = "/root/reference/tests/test_data"


# ----------------------------------------------------------- pandas fixed h5
@pytest.mark.skipif(not os.path.exists(f"{REF_DATA}/rockstar_in_lc.h5"),
                    reason="reference test data not mounted")
def test_read_reference_halo_lightcone():
    d = aio.read_pandas_fixed_hdf_as_dict(f"{REF_DATA}/rockstar_in_lc.h5")
    assert "m200" in d and "r200_deg" in d and "theta1_pix" in d
    assert d["m200"].shape[0] == 1539
    npt.assert_allclose(d["m200"][0], 3.066e14, rtol=1e-6)
    npt.assert_allclose(d["r200_deg"][0], 0.07890977884225592, rtol=1e-9)


@pytest.mark.skipif(not os.path.exists(f"{REF_DATA}/particle_snapshot_info.h5"),
                    reason="reference test data not mounted")
def test_read_reference_snapshot_info():
    d = aio.read_pandas_fixed_hdf_as_dict(f"{REF_DATA}/particle_snapshot_info.h5")
    assert len(d) > 1  # has some columns + index


# ------------------------------------------------------------- DTFE density
def test_density_roundtrip(tmp_path):
    grid = np.random.default_rng(0).standard_normal((8, 8, 8)).astype(np.float32)
    p = str(tmp_path / "dens.bin")
    aio.write_density(p, grid, file_type=1, boxsize=100.0, redshift=0.5,
                      omega_m=0.3, omega_l=0.7, hubble=0.7)
    hdr, back = aio.read_density(p)
    npt.assert_array_equal(back, grid)
    assert int(hdr["totalGrid"]) == 512
    npt.assert_allclose(hdr["BoxSize"], 100.0)
    npt.assert_allclose(hdr["redshift"], 0.5)
    # header is exactly 1024 bytes + 2 uint64 buffers
    assert os.path.getsize(p) == 1024 + 16 + grid.nbytes + 16


def test_density_velocity_components(tmp_path):
    vel = np.random.default_rng(1).standard_normal((4, 4, 4, 3)).astype(np.float32)
    p = str(tmp_path / "vel.bin")
    aio.write_density(p, vel, file_type=11, boxsize=50.0)
    hdr, back = aio.read_density(p)
    assert back.shape == (4, 4, 4, 3)
    npt.assert_array_equal(back, vel)


# ------------------------------------------------------------- halo catalog
def test_halo_catalog_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    ints = rng.integers(0, 100, (10, 2)).astype(np.int32)
    floats = rng.standard_normal((10, 4)).astype(np.float32)
    p = str(tmp_path / "halos.bin")
    aio.write_halo_catalog(p, ints, floats, ["id", "pid"],
                           ["x", "y", "z", "mass"], boxsize=100.0,
                           mass_column=3)
    hdr, inames, fnames, ints2, floats2 = aio.read_halo_catalog(p)
    assert inames == ["id", "pid"]
    assert fnames == ["x", "y", "z", "mass"]
    npt.assert_array_equal(ints2, ints)
    npt.assert_array_equal(floats2, floats)
    npt.assert_allclose(hdr["massRange"],
                        [floats[:, 3].min(), floats[:, 3].max()])


# --------------------------------------------------------------- text table
def test_text_table_roundtrip(tmp_path):
    data = np.arange(12.0).reshape(4, 3)
    p = str(tmp_path / "t.txt")
    aio.write_text_table(p, data, header="x y z")
    back = aio.read_text_table(p, no_comment_lines=1)
    npt.assert_allclose(back, data)


def test_text_table_gnuplot3d(tmp_path):
    data = np.arange(24.0).reshape(2, 3, 4)
    p = str(tmp_path / "g.txt")
    aio.write_text_table_gnuplot3d(p, data, description="# grid slices")
    lines = open(p).read().splitlines()
    assert lines[0] == "# grid slices"
    # 2 blocks x (3 rows + 1 blank separator)
    assert lines.count("") == 2
    first_row = np.array(lines[1].split(), dtype=float)
    npt.assert_allclose(first_row, data[0, 0])
    with pytest.raises(ValueError):
        aio.write_text_table_gnuplot3d(p, np.zeros((2, 2)))


# ----------------------------------------------------------------- rockstar
def test_rockstar_ascii(tmp_path):
    p = str(tmp_path / "halos_0.0.ascii")
    with open(p, "w") as f:
        f.write("#id x y z m200c r200c\n")
        for i in range(19):
            f.write(f"# comment {i}\n")
        f.write("1 10.0 20.0 30.0 1e12 0.2\n")
        f.write("2 40.0 50.0 60.0 2e13 0.5\n")
    d = aio.rockstar.read_rockstar_ascii(p)
    assert list(d.keys()) == ["id", "x", "y", "z", "m200c", "r200c"]
    npt.assert_allclose(d["m200c"], [1e12, 2e13])
    merged = aio.rockstar.read_rockstar_files([p, p])
    assert merged["x"].shape == (4,)


# -------------------------------------------------------------- gadget hdf5
@pytest.fixture
def synth_snapshot(tmp_path):
    import h5py

    rng = np.random.default_rng(3)
    n = 100
    sdir = tmp_path / "snapdir_012"
    sdir.mkdir()
    for fn in range(2):
        with h5py.File(sdir / f"snap_012.{fn}.hdf5", "w") as f:
            h = f.create_group("Header")
            h.attrs["NumPart_ThisFile"] = np.array([0, n, 0, 0, 0, 0])
            h.attrs["NumPart_Total"] = np.array([0, 2 * n, 0, 0, 0, 0])
            h.attrs["MassTable"] = np.array([0, 0.05, 0, 0, 0, 0])
            h.attrs["Time"] = 1.0
            h.attrs["Redshift"] = 0.0
            h.attrs["BoxSize"] = 100.0
            h.attrs["Omega0"] = 0.3
            h.attrs["OmegaLambda"] = 0.7
            h.attrs["HubbleParam"] = 0.7
            h.attrs["NumFilesPerSnapshot"] = 2
            pt = f.create_group("PartType1")
            pt["Coordinates"] = rng.uniform(0, 100, (n, 3))
            pt["Velocities"] = rng.normal(0, 100, (n, 3))
            pt["ParticleIDs"] = (np.arange(fn * n, (fn + 1) * n,
                                           dtype=np.uint64) + 2 ** 60)
    # group catalog
    gdir = tmp_path / "groups_012"
    gdir.mkdir()
    with h5py.File(gdir / "fof_subhalo_tab_012.0.hdf5", "w") as f:
        h = f.create_group("Header")
        h.attrs["Ngroups_ThisFile"] = 5
        h.attrs["Ngroups_Total"] = 5
        h.attrs["Nsubgroups_ThisFile"] = 5
        h.attrs["Nsubgroups_Total"] = 5
        g = f.create_group("Group")
        g["GroupPos"] = rng.uniform(0, 100, (5, 3))
        g["Group_M_Crit200"] = np.full(5, 10.0)   # code units: 1e10 Msun/h
        g["Group_R_Crit200"] = np.full(5, 0.2)
        s = f.create_group("Subhalo")
        s["SubhaloVmax"] = np.full(5, 300.0)
    return str(tmp_path)


def test_gadget_snapshot_read(synth_snapshot):
    snap = aio.GadgetSnapshot(12, synth_snapshot)
    assert snap.header["boxsize"] == 100.0
    snap.read(["Coordinates", "Velocities", "Masses"], parttype=[1])
    assert snap.data["Coordinates"].shape == (200, 3)
    # length unit conversion: /h
    assert snap.data["Coordinates"].max() <= 100.0 / 0.7
    # MassTable-backed Masses: 0.05 * 1e10 / h
    npt.assert_allclose(snap.data["Masses"], 0.05 * 1e10 / 0.7)


def test_gadget_snapshot_partition(synth_snapshot):
    snap = aio.GadgetSnapshot(12, synth_snapshot)
    snap.read(["Coordinates"], parttype=[1], partition=(2, 0))
    assert snap.data["Coordinates"].shape == (100, 3)


def test_gadget_ids_keep_native_dtype(synth_snapshot):
    """fac == 1.0 blocks must not be promoted to float64: uint64
    ParticleIDs above 2^53 would silently lose exactness."""
    snap = aio.GadgetSnapshot(12, synth_snapshot)
    snap.read(["ParticleIDs"], parttype=[1])
    ids = snap.data["ParticleIDs"]
    assert ids.dtype == np.uint64
    npt.assert_array_equal(np.sort(ids),
                           np.arange(200, dtype=np.uint64) + 2 ** 60)


def test_gadget_missing_snapshot_read_raises(tmp_path):
    snap = aio.GadgetSnapshot(7, str(tmp_path))  # lenient construction
    with pytest.raises(FileNotFoundError, match="snap_007"):
        snap.read(["Coordinates"])


def test_gadget_catalog_only_h_from_catalog_header(tmp_path):
    """No snapshot files: h comes from the catalog's own header (not a
    silent 1.0), and integer blocks keep their dtype."""
    import h5py

    gdir = tmp_path / "groups_012"
    gdir.mkdir()
    with h5py.File(gdir / "fof_subhalo_tab_012.0.hdf5", "w") as f:
        h = f.create_group("Header")
        h.attrs["Ngroups_Total"] = 2
        h.attrs["HubbleParam"] = 0.8
        g = f.create_group("Group")
        g["Group_M_Crit200"] = np.array([1.0, 2.0])
        g["GroupLen"] = np.array([10, 20], dtype=np.int32)
    snap = aio.GadgetSnapshot(12, str(tmp_path))
    cat = snap.group_catalog(["Group_M_Crit200", "GroupLen"])
    npt.assert_allclose(cat["Group_M_Crit200"],
                        np.array([1.0, 2.0]) * 1e10 / 0.8)
    assert cat["GroupLen"].dtype == np.int32


def test_gadget_catalog_only_without_h_raises(tmp_path):
    import h5py

    gdir = tmp_path / "groups_012"
    gdir.mkdir()
    with h5py.File(gdir / "fof_subhalo_tab_012.0.hdf5", "w") as f:
        f.create_group("Header")
        g = f.create_group("Group")
        g["Group_M_Crit200"] = np.array([1.0])
    snap = aio.GadgetSnapshot(12, str(tmp_path))
    with pytest.raises(KeyError, match="HubbleParam"):
        snap.group_catalog(["Group_M_Crit200"])


def test_gadget_group_catalog(synth_snapshot):
    snap = aio.GadgetSnapshot(12, synth_snapshot)
    cat = snap.group_catalog(["GroupPos", "Group_M_Crit200", "SubhaloVmax"])
    assert cat["GroupPos"].shape == (5, 3)
    npt.assert_allclose(cat["Group_M_Crit200"], 10.0 * 1e10 / 0.7)
    npt.assert_allclose(cat["SubhaloVmax"], 300.0)  # no unit factor


def test_gadget_fast_group_catalog_alias(synth_snapshot):
    """Name-parity alias for the reference's single-pass reader
    (read_hdf5.py:650) — must return the same catalog."""
    snap = aio.GadgetSnapshot(12, synth_snapshot)
    cat = snap.fast_group_catalog(["GroupPos", "Group_M_Crit200"])
    assert cat["GroupPos"].shape == (5, 3)
    npt.assert_allclose(cat["Group_M_Crit200"], 10.0 * 1e10 / 0.7)


# --------------------------------------------------------------------- rays
def test_rays_to_map_sorting():
    ids = np.array([3, 1, 0, 2])
    vals = np.array([30.0, 10.0, 0.0, 20.0])
    out = aio.rays.rays_to_map(vals, ids, convert_units=False)
    npt.assert_allclose(out, [[0.0, 10.0], [20.0, 30.0]])


def test_rays_to_map_unit_conversion():
    c = 299792.458
    vals = np.full(4, c ** 2)
    out = aio.rays.rays_to_map(vals, None, quantity="kappa_2")
    npt.assert_allclose(out, 1.0, rtol=1e-10)
    vals = np.full(4, c ** 3)
    out = aio.rays.rays_to_map(vals, None, quantity="isw_rs")
    npt.assert_allclose(out, 1.0, rtol=1e-10)


# ------------------------------------------------------------------- ramses
def test_read_grav_file(tmp_path):
    """Build a tiny synthetic non-AMR grav file with the F77 layout the
    reader expects (one level, one cpu, ncache cells, 2 fields)."""
    import struct

    ncpu, ndim, nlevelmax, nboundary = 1, 3, 7, 0
    ncache = 5
    n_fields = 2
    dimfac = 2 ** ndim
    buf = b""
    # 4 header records of one int32
    for v in (ncpu, ndim, nlevelmax, nboundary):
        buf += struct.pack("iii", 4, v, 4)
    # level block: two records (level, ncache)
    buf += struct.pack("iii", 4, 7, 4)
    buf += struct.pack("iii", 4, ncache, 4)
    rng = np.random.default_rng(5)
    expect = [[], []]
    for _dim in range(dimfac):
        for fi in range(n_fields):
            vals = rng.standard_normal(ncache)
            expect[fi].append(vals)
            buf += struct.pack("i", 8 * ncache)
            buf += vals.astype("<f8").tobytes()
            buf += struct.pack("i", 8 * ncache)
    p = str(tmp_path / "grav_00012.out00001")
    with open(p, "wb") as f:
        f.write(buf)
    out = aio.ramses.read_grav_file(p, n_fields, 7, 7, ndim=3)
    for fi in range(n_fields):
        npt.assert_allclose(out[fi], np.concatenate(expect[fi]))
