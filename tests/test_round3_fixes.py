"""Round-3 regression tests: checkpoint (state,step) atomicity, wide-cone
lens-plane tiling, RayRamses.sum_snapshots selection, and void-finder
candidate-overflow safety."""
import json

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.core import checkpoint as ck


# ------------------------------------------------- checkpoint atomicity
def test_step_travels_inside_npz_payload(tmp_path, monkeypatch):
    """A stale meta.json (crash between state commit and meta write) must
    not roll the step back: restore reads the step from the payload."""
    monkeypatch.setattr(ck, "have_orbax", lambda: False)
    state = {"a": jnp.arange(4.0)}
    ck.save_state(tmp_path / "ck", state, step=5)
    # simulate the torn write: meta.json lags behind the committed state
    with open(tmp_path / "ck" / "meta.json", "w") as fh:
        json.dump({"step": 2}, fh)
    _, step = ck.restore_state(tmp_path / "ck", state, with_step=True)
    assert step == 5


@pytest.mark.skipif(not ck.have_orbax(), reason="orbax unavailable")
def test_step_travels_inside_orbax_payload(tmp_path):
    state = {"a": jnp.arange(4.0)}
    ck.save_state(tmp_path / "ck", state, step=9)
    with open(tmp_path / "ck" / "meta.json", "w") as fh:
        json.dump({"step": 1}, fh)
    _, step = ck.restore_state(tmp_path / "ck", state, with_step=True)
    assert step == 9


def test_checkpoint_exists_without_meta(tmp_path, monkeypatch):
    """Crash before meta.json: the committed state is still discovered."""
    monkeypatch.setattr(ck, "have_orbax", lambda: False)
    state = {"a": jnp.arange(3.0)}
    ck.save_state(tmp_path / "ck", state, step=0)
    (tmp_path / "ck" / "meta.json").unlink()
    assert ck.checkpoint_exists(tmp_path / "ck")
    got, step = ck.restore_state(tmp_path / "ck", state, with_step=True)
    assert step == 0
    npt.assert_array_equal(np.asarray(got["a"]), np.arange(3.0))


def test_accumulator_survives_torn_meta(tmp_path, monkeypatch):
    """The double-count scenario from the advisor: newer state + stale
    step must NOT re-apply chunks already folded into the state."""
    monkeypatch.setattr(ck, "have_orbax", lambda: False)
    update = lambda s, c: s + c  # noqa: E731
    acc = ck.CheckpointedAccumulator(tmp_path / "acc", jnp.zeros(()),
                                     update, every=1)
    for i in range(4):
        acc.step(i, jnp.asarray(1.0))
    # torn write: meta says step=1 but the state holds 4 folded chunks
    with open(tmp_path / "acc" / "meta.json", "w") as fh:
        json.dump({"step": 1}, fh)
    acc2 = ck.CheckpointedAccumulator(tmp_path / "acc", jnp.zeros(()),
                                      update, every=1)
    assert acc2.resumed_at == 4
    for i in range(6):
        acc2.step(i, jnp.asarray(1.0))
    npt.assert_allclose(float(acc2.state), 6.0)


# ------------------------------------------------- wide-cone lens planes
def test_wide_cone_outer_pixels_are_painted(rng):
    """fov*chi > boxsize: transverse periodic tiling must fill the outer
    pixels (previously silently delta = -1)."""
    from astrild_tpu.ops import lens_planes as LPL

    box = 500.0
    n = 1 << 20
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    # fov*chi/2 = 300 > box/2 = 250 -> needs one replica ring
    planes, _ = LPL.density_planes_from_particles(
        pos, box, 600.0, 200.0, 1, 1.0, 32)
    p = np.asarray(planes[0])
    # corners sit beyond the minimum-image half-box; uniform particles
    # must still give delta ~ 0 there (Poisson sigma ~ 4% per pixel)
    corners = np.array([p[0, 0], p[0, -1], p[-1, 0], p[-1, -1]])
    assert np.all(corners > -0.5), corners
    assert abs(p.mean()) < 0.05


def test_narrow_cone_unchanged_by_tiling_path(rng):
    from astrild_tpu.ops import lens_planes as LPL

    box = 500.0
    pos = rng.uniform(0, box, (1 << 16, 3)).astype(np.float32)
    a, _ = LPL.density_planes_from_particles(
        jnp.asarray(pos), box, 600.0, 200.0, 2, np.radians(2.0), 16)
    b, _ = LPL._density_planes_impl(
        jnp.asarray(pos), box, 600.0, 200.0, 2, np.radians(2.0), 16, 2,
        None, 0)
    npt.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


# ------------------------------------------------- sum_snapshots selection
@pytest.fixture
def ray_dir(tmp_path):
    from astrild_tpu.io import columnar_h5

    for nr, val in ((1, 1.0), (2, 2.0), (3, 4.0)):
        columnar_h5.write_table(
            str(tmp_path / f"Ray_maps_output{nr:05d}.h5"),
            {"kappa_2": np.full(8, val), "isw_rs": np.full(8, 10 * val)})
    return str(tmp_path) + "/"


def test_sum_snapshots_honors_snap_nrs(ray_dir):
    from astrild_tpu.models import RayRamses

    sim = RayRamses(dir_sim=ray_dir,
                    file_dsc={"root": "Ray_maps", "extension": ".h5"})
    full = sim.sum_snapshots(["kappa_2"])
    npt.assert_allclose(full["kappa_2"], 7.0)
    sub = sim.sum_snapshots(["kappa_2"], snap_nrs=[1, 3])
    npt.assert_allclose(sub["kappa_2"], 5.0)
    assert not np.allclose(sub["kappa_2"], full["kappa_2"])


def test_sum_snapshots_z_range(ray_dir):
    from astrild_tpu.models import RayRamses

    sim = RayRamses(dir_sim=ray_dir,
                    file_dsc={"root": "Ray_maps", "extension": ".h5"})
    zs = {1: 0.3, 2: 0.5, 3: 1.0}
    got = sim.sum_snapshots(["kappa_2", "isw_rs"], z_range=(0.4, 1.5),
                            redshifts=zs)
    npt.assert_allclose(got["kappa_2"], 6.0)
    npt.assert_allclose(got["isw_rs"], 60.0)
    with pytest.raises(ValueError):
        sim.sum_snapshots(["kappa_2"], z_range=(5.0, 9.0), redshifts=zs)
    with pytest.raises(ValueError):
        sim.sum_snapshots(["kappa_2"], z_range=(0.4, 1.5))


# ------------------------------------------------- Dataset interchange
def test_dataset_full_roundtrip(tmp_path):
    """The .nc-artifact interchange (simcoll.py:227-235): every Dataset
    feature — multi-dim coords, string coords, attrs — must survive a
    disk round trip so cross-sim reductions persist across sessions."""
    from astrild_tpu.core.dataset import Dataset

    ds = Dataset(
        data_vars={
            "value": (("box", "redshift", "bin"),
                      np.arange(24.0).reshape(2, 3, 4)),
            "count": (("box",), np.array([5, 9]))},
        coords={
            "box": np.array(["box1", "box2"]),
            "redshift": np.array([1.0, 0.5, 0.0]),
            "bin": np.logspace(0, 3, 4),
            "area": (("box", "redshift"), np.arange(6.0).reshape(2, 3))},
        attrs={"units": "Mpc/h", "n_sims": 2})
    p = str(tmp_path / "stats.h5")
    ds.to_hdf5(p)
    back = Dataset.from_hdf5(p)
    assert back.dims_of("value") == ("box", "redshift", "bin")
    npt.assert_allclose(back["value"], ds["value"])
    npt.assert_allclose(back["bin"], ds["bin"])
    assert list(back["box"]) == ["box1", "box2"]
    assert back.coords["area"][0] == ("box", "redshift")
    npt.assert_allclose(back.coords["area"][1], np.arange(6.0).reshape(2, 3))
    assert back.attrs["units"] == "Mpc/h"
    assert int(back.attrs["n_sims"]) == 2


# ------------------------------------------------- void capacity safety
def test_find_tunnels_reports_candidate_overflow(rng):
    from astrild_tpu.ops import voids as V

    # dense 6x6 peak lattice -> many distance-transform maxima
    g = (np.arange(6) * 10 + 7).astype(np.float32)
    pos = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
    pos += rng.uniform(-1, 1, pos.shape).astype(np.float32)
    valid = jnp.ones(len(pos), bool)
    cat8 = V.find_tunnels(jnp.asarray(pos), valid, 64, max_voids=8)
    assert int(cat8.n_candidates) > 8  # truncation WOULD occur

    auto = V.find_tunnels_auto(jnp.asarray(pos), valid, 64, max_voids=8)
    assert auto.radius.shape[0] >= int(auto.n_candidates)
    assert int(auto.n) >= int(cat8.n)
    # escalated catalog equals a directly-large run
    big = V.find_tunnels(jnp.asarray(pos), valid, 64,
                         max_voids=auto.radius.shape[0])
    assert int(big.n) == int(auto.n)
    nb = int(big.n)
    npt.assert_allclose(np.asarray(auto.radius[:nb]),
                        np.asarray(big.radius[:nb]), rtol=1e-6)
