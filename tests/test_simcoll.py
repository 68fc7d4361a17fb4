"""SimulationCollection: construction, stat compression, lightcone sums."""
import os

import numpy as np
import numpy.testing as npt
import pytest
import yaml

from astrild_tpu.io import columnar_h5
from astrild_tpu.models import SimulationCollection, write_snapshot_info


@pytest.fixture
def collection(tmp_path):
    """Two simulations with snapshot-info + per-sim stat files."""
    sims = {}
    for b in (1, 2):
        d = tmp_path / f"box{b}"
        d.mkdir()
        sims[f"box{b}"] = {
            "type": "particles",
            "init": {"dir_sim": str(d) + "/", "boxsize": 100.0,
                     "domain_level": 64},
        }
        # per-sim stat table: bins + per-snapshot values
        columnar_h5.write_table(
            str(d / "halo_mass_fct.h5"),
            {"bin": np.logspace(12, 14, 5),
             "snap_1": np.full(5, 10.0 * b),
             "snap_2": np.full(5, 20.0 * b)})
        # ray map files
        for ray in (1, 2):
            columnar_h5.write_table(
                str(d / f"Ray_maps_output0000{ray}.h5"),
                {"kappa_2": np.full(4, float(b * ray)),
                 "isw_rs": np.full(4, 0.1 * b * ray)})
        sims[f"box{b}"]["init"]["file_dsc"] = {"root": "Ray_maps_output",
                                               "extension": "h5"}
    cfg_yaml = tmp_path / "coll.yaml"
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump(sims, f)
    cfg_h5 = tmp_path / "info.h5"
    write_snapshot_info(str(cfg_h5), {1: [1.0, 0.5], 2: [1.0, 0.5]})
    return str(cfg_yaml), str(cfg_h5)


def test_from_file_builds_sims(collection):
    cfg_yaml, cfg_h5 = collection
    coll = SimulationCollection.from_file(cfg_yaml, cfg_h5)
    assert len(coll.sim) == 2
    assert list(coll.sim_nrs) == [1, 2]
    assert coll.sim["box1"].boxsize == 100.0
    rows = coll._config_rows(coll.config, 1)
    npt.assert_allclose(rows["redshift"], [1.0, 0.5])


def test_compress_stats(collection, tmp_path):
    cfg_yaml, cfg_h5 = collection
    coll = SimulationCollection.from_file(cfg_yaml, cfg_h5)
    ds = coll.compress_stats({"root": "halo_mass_fct", "extension": "h5"},
                             str(tmp_path / "out"), z_nrs=[1.0, 0.5])
    y = ds["value"]
    assert y.shape == (2, 2, 5)
    # box 1 snap_1 (z=1.0) -> 10 ; box 2 snap_2 (z=0.5) -> 40
    npt.assert_allclose(y[0, 0], 10.0)
    npt.assert_allclose(y[1, 1], 40.0)
    assert os.path.exists(str(tmp_path / "out" / "halo_mass_fct.stats.h5"))
    # persisted Dataset reloads
    from astrild_tpu.core.dataset import Dataset

    back = Dataset.from_hdf5(str(tmp_path / "out" / "halo_mass_fct.stats.h5"))
    npt.assert_allclose(back["value"], y)


def test_sum_raytracing_snapshots(collection):
    cfg_yaml, cfg_h5 = collection
    coll = SimulationCollection.from_file(cfg_yaml, cfg_h5)
    total = coll.sum_raytracing_snapshots(
        columns=("kappa_2",),
        integration_range={"box": [1, 2], "ray": [], "z": None})
    # sum over boxes and rays: (1*1 + 1*2) + (2*1 + 2*2) = 9
    npt.assert_allclose(total["kappa_2"], 9.0)


def test_sum_raytracing_default_box0_means_whole_lightcone(collection):
    """Reference convention (simcoll.py:365-368): box [0] (the DEFAULT
    integration_range) means 'whole light-cone'. Taken literally it
    matches no box (ids start at 1) and the sum silently returned None."""
    cfg_yaml, cfg_h5 = collection
    coll = SimulationCollection.from_file(cfg_yaml, cfg_h5)
    total = coll.sum_raytracing_snapshots(columns=("kappa_2",))
    assert total is not None
    npt.assert_allclose(total["kappa_2"], 9.0)


def test_translate_redshift_kernel_ratio(collection):
    cfg_yaml, cfg_h5 = collection
    coll = SimulationCollection.from_file(cfg_yaml, cfg_h5)
    q = np.ones(4)
    out = coll._translate_redshift(q, z_near=0.4, z_far=0.5, z_src=1.0,
                                   z_src_shift=2.0)
    chi = coll.cosmo.comoving_distance
    x_mid = 0.5 * (float(chi(0.4)) + float(chi(0.5)))
    want = (coll._kernel_function(x_mid, float(chi(2.0)))
            / coll._kernel_function(x_mid, float(chi(1.0))))
    npt.assert_allclose(out, want, rtol=1e-6)


def test_stack_for_devices(collection):
    import jax.numpy as jnp

    cfg_yaml, cfg_h5 = collection
    coll = SimulationCollection.from_file(cfg_yaml, cfg_h5)
    batch = coll.stack_for_devices(lambda s: jnp.full((3,), s.boxsize))
    assert batch.shape == (2, 3)
