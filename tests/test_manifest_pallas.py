"""Artifact manifest + Pallas kernel equivalence tests."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from astrild_tpu.core.manifest import ArtifactStore, content_hash
from astrild_tpu.ops.pairwise import _pairwise_accumulate
from astrild_tpu.ops.pallas_pairwise import pairwise_accumulate_pallas


# ---------------------------------------------------------------- manifest
def test_content_hash_stability_and_sensitivity():
    a = {"x": np.arange(10.0), "p": 3}
    assert content_hash(a) == content_hash({"p": 3, "x": np.arange(10.0)})
    b = {"x": np.arange(10.0), "p": 4}
    assert content_hash(a) != content_hash(b)


def test_artifact_store_roundtrip_and_freshness(tmp_path):
    store = ArtifactStore(str(tmp_path))
    inputs = {"seed": 1, "n": 100}
    assert not store.fresh("pk", inputs)
    store.save("pk", {"k": np.arange(5.0), "p": np.ones(5)}, inputs)
    assert store.fresh("pk", inputs)
    assert not store.fresh("pk", {"seed": 2, "n": 100})
    out = store.load("pk")
    npt.assert_allclose(out["k"], np.arange(5.0))
    assert store.verify("pk")
    # manifest survives re-opening
    store2 = ArtifactStore(str(tmp_path))
    assert store2.fresh("pk", inputs)


def test_artifact_store_stage_memoizes(tmp_path):
    store = ArtifactStore(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return {"v": np.ones(3)}

    store.stage("s", {"a": 1}, compute)
    store.stage("s", {"a": 1}, compute)
    assert len(calls) == 1
    store.stage("s", {"a": 2}, compute)
    assert len(calls) == 2


# ------------------------------------------------------------------ pallas
def test_pallas_pairwise_matches_xla(rng):
    n = 300
    pos = jnp.asarray(rng.uniform(400, 600, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 100, (n, 3)).astype(np.float32))
    nbins, binw = 20, 5.0
    nom_p, den_p = pairwise_accumulate_pallas(pos, vel, n, binw, nbins,
                                              block=128)
    nom_x, den_x = _pairwise_accumulate(pos, vel, n, nbins, binw, block=128)
    npt.assert_allclose(np.asarray(nom_p), np.asarray(nom_x), rtol=1e-3,
                        atol=1e-3)
    npt.assert_allclose(np.asarray(den_p), np.asarray(den_x), rtol=1e-3,
                        atol=1e-5)


def test_pallas_pairwise_respects_n_valid(rng):
    # padding rows beyond n_valid must not contribute
    n = 100
    pos = jnp.asarray(rng.uniform(400, 600, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 100, (n, 3)).astype(np.float32))
    nom_a, den_a = pairwise_accumulate_pallas(pos, vel, n, 5.0, 10)
    # same call with junk rows appended but n_valid=n
    pos2 = jnp.concatenate([pos, jnp.full((28, 3), 500.0)])
    vel2 = jnp.concatenate([vel, jnp.full((28, 3), 1e6)])
    nom_b, den_b = pairwise_accumulate_pallas(pos2, vel2, n, 5.0, 10)
    npt.assert_allclose(np.asarray(nom_a), np.asarray(nom_b), rtol=1e-5)
    npt.assert_allclose(np.asarray(den_a), np.asarray(den_b), rtol=1e-5)
