"""File-driven end-to-end test: the reference's artifact-graph workflow.

Synthesizes on-disk artifacts (ray-output h5, stat tables), drives the
pipelines through the file-facing APIs (SkyMap.from_file, PowerSpectrum3D
.compute, ArtifactStore staging), and checks science outputs — the
integration mode the reference's users actually run.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.core.manifest import ArtifactStore
from astrild_tpu.io import columnar_h5
from astrild_tpu.models import (PowerSpectrum3D, Simulation, SkyMap,
                                TunnelsFinder, Voids)
from astrild_tpu.utils.constants import C_LIGHT_KMS


@pytest.fixture
def ray_file(tmp_path, rng):
    """A Ray-Ramses-style map file: code units, shuffled ray ids."""
    npix = 128
    e = np.arange(npix)
    kappa = rng.normal(0, 0.01, (npix, npix))
    for (r, c) in [(30, 40), (90, 100), (64, 20)]:
        kappa += 0.08 * np.exp(-((e[:, None] - r) ** 2
                                 + (e[None, :] - c) ** 2) / (2 * 3.0 ** 2))
    ids = np.arange(npix * npix)
    perm = rng.permutation(npix * npix)
    path = str(tmp_path / "Ray_maps_output00005.h5")
    columnar_h5.write_table(path, {
        "id": ids[perm].astype(np.float64),
        "kappa_2": (kappa.reshape(-1) * C_LIGHT_KMS ** 2)[perm],
    })
    return path, kappa


def test_skymap_file_to_voids(ray_file, tmp_path):
    path, kappa_true = ray_file
    sky = SkyMap.from_file(128, 10.0, "kappa_2", str(tmp_path), path)
    # code units undone + rays reordered by id
    npt.assert_allclose(np.asarray(sky.data["orig"]), kappa_true,
                        rtol=1e-5, atol=1e-9)
    sky.smoothing(5.0)
    finder = TunnelsFinder(sky)
    finder.find_peaks(on="orig_smooth", edge_pix=2)
    finder.find_voids(sigmas=[0.0])
    voids = Voids.from_finder(finder, {"npix": sky.npix})
    voids.trim_edges(sky.npix)
    assert len(voids.data["rad_pix"]) > 0
    voids.get_profiles(2.0, 8, skymap=sky.data["orig"])
    ds = voids.get_profile_stats(n_boot=10)
    # persist + reload the stats artifact
    out = str(tmp_path / "stats")
    os.makedirs(out, exist_ok=True)
    ds.to_hdf5(os.path.join(out, "profiles.h5"))
    from astrild_tpu.core.dataset import Dataset

    back = Dataset.from_hdf5(os.path.join(out, "profiles.h5"))
    npt.assert_allclose(back["mean"], ds["mean"])


@pytest.fixture
def snapshot_files(tmp_path, rng):
    """Point-set h5 files per snapshot (the PowerSpectrum3D.compute input)."""
    box = 100.0
    for snap in (3, 4):
        centers = rng.uniform(0, box, (30, 3))
        pts = np.mod(centers[:, None, :] + rng.normal(0, 1.5, (30, 300, 3)),
                     box).reshape(-1, 3)
        columnar_h5.write_table(
            str(tmp_path / f"grav_out_0000{snap}.h5"),
            {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    return str(tmp_path), box


def test_power_spectrum_compute_filedriven(snapshot_files, tmp_path):
    path, box = snapshot_files
    sim = Simulation(path, None, {"root": "grav_out", "extension": "h5"})
    ps = PowerSpectrum3D("particles", sim)
    out = ps.compute(["density"], [{"path": path, "root": "grav_out",
                                    "extension": "h5"}],
                     dir_out=str(tmp_path / "pk"), save=True,
                     boxsize=box, ngrid=32)
    assert set(out["P"].keys()) == {"snap_3", "snap_4"}
    # clustered data: strong large-scale power
    assert out["P"]["snap_3"][1] > 0
    saved = columnar_h5.read_table(
        str(tmp_path / "pk" / "pk_density.h5"))
    npt.assert_allclose(saved["snap_3"], out["P"]["snap_3"])


def test_power_spectrum_compute_cross(snapshot_files, tmp_path):
    """compute() with TWO file_dscs must return the CROSS spectrum (it
    silently returned field A's auto spectrum before): cross of a field
    with itself equals its auto spectrum; cross with an independent
    Poisson field has far less power."""
    path, box = snapshot_files
    sim = Simulation(path, None, {"root": "grav_out", "extension": "h5"})
    rng = np.random.default_rng(5)
    for snap in (3, 4):
        pts = rng.uniform(0, box, (9000, 3))
        columnar_h5.write_table(
            str(tmp_path / f"rand_out_0000{snap}.h5"),
            {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    dsc_a = {"path": path, "root": "grav_out", "extension": "h5"}
    dsc_r = {"path": str(tmp_path), "root": "rand_out", "extension": "h5"}
    auto = PowerSpectrum3D("particles", sim).compute(
        ["density"], [dsc_a], save=False, boxsize=box, ngrid=32)
    cross_aa = PowerSpectrum3D("particles", sim).compute(
        ["density"], [dsc_a, dsc_a], save=False, boxsize=box, ngrid=32)
    cross_ar = PowerSpectrum3D("particles", sim).compute(
        ["density"], [dsc_a, dsc_r], save=False, boxsize=box, ngrid=32)
    # self-cross tracks the auto spectrum up to shot noise (auto has
    # V/N subtracted; compare shapes where clustering dominates)
    pa = auto["P"]["snap_3"]
    paa = cross_aa["P"]["snap_3"]
    par = cross_ar["P"]["snap_3"]
    assert paa[1] > 0.5 * pa[1]
    # independent fields decorrelate: |cross| is far below the auto
    assert abs(par[1]) < 0.2 * paa[1]


def test_artifact_staged_pipeline(ray_file, tmp_path):
    """Manifest-memoized pipeline stage over a file artifact."""
    path, _ = ray_file
    store = ArtifactStore(str(tmp_path / "artifacts"))
    calls = []

    def compute():
        calls.append(1)
        sky = SkyMap.from_file(128, 10.0, "kappa_2", "", path)
        from astrild_tpu.ops import angular_power

        ell, cl = angular_power.cl_flat_sky(sky.data["orig"], 10.0, nbins=8)
        return {"ell": np.asarray(ell), "cl": np.asarray(cl)}

    inputs = {"file": path, "nbins": 8}
    out1 = store.stage("cl_map5", inputs, compute)
    out2 = store.stage("cl_map5", inputs, compute)
    assert len(calls) == 1
    npt.assert_allclose(out1["cl"], out2["cl"])
    assert store.verify("cl_map5")
