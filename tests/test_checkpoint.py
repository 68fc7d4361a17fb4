"""Sharded checkpoint/resume (core.checkpoint) on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
from jax.sharding import NamedSharding, PartitionSpec as P

from astrild_tpu.core import checkpoint as ck
from astrild_tpu.parallel import make_mesh


def test_save_restore_roundtrip(tmp_path, rng):
    state = {"kappa": jnp.asarray(rng.standard_normal((8, 8)),
                                  jnp.float32),
             "nplanes": jnp.asarray(3),
             "k": jnp.arange(5, dtype=jnp.float32)}
    ck.save_state(tmp_path / "ck", state, step=7)
    got, step = ck.restore_state(tmp_path / "ck", state, with_step=True)
    assert step == 7
    for key in state:
        npt.assert_array_equal(np.asarray(got[key]), np.asarray(state[key]))


def test_save_restore_preserves_sharding(tmp_path, rng):
    mesh = make_mesh(n_sim=2, n_x=2, n_y=2)
    sh = NamedSharding(mesh, P("x", "y"))
    x = jax.device_put(jnp.asarray(rng.standard_normal((8, 8)),
                                   jnp.float32), sh)
    ck.save_state(tmp_path / "ck", {"x": x})
    got = ck.restore_state(tmp_path / "ck", {"x": x})
    npt.assert_array_equal(np.asarray(got["x"]), np.asarray(x))
    if ck.have_orbax():
        assert got["x"].sharding.is_equivalent_to(sh, x.ndim)


def test_npz_fallback_roundtrip(tmp_path, rng, monkeypatch):
    monkeypatch.setattr(ck, "have_orbax", lambda: False)
    state = {"a": jnp.arange(6.0), "b": jnp.asarray(2.5)}
    ck.save_state(tmp_path / "ck", state, step=1)
    got, step = ck.restore_state(tmp_path / "ck", state, with_step=True)
    assert step == 1
    npt.assert_array_equal(np.asarray(got["a"]), np.asarray(state["a"]))
    npt.assert_array_equal(np.asarray(got["b"]), np.asarray(state["b"]))


def test_accumulator_resumes_mid_stream(tmp_path, rng):
    planes = jnp.asarray(rng.standard_normal((16, 4, 4)), jnp.float32)
    init = jnp.zeros((4, 4), jnp.float32)
    update = lambda s, c: s + c  # noqa: E731

    want = np.asarray(planes).sum(0)

    # first run folds 10 chunks, checkpointing every 4, then "crashes"
    acc = ck.CheckpointedAccumulator(tmp_path / "acc", init, update, every=4)
    for i in range(10):
        assert acc.step(i, planes[i])

    # resumed run: chunks up to the last checkpoint (index 7) are skipped
    acc2 = ck.CheckpointedAccumulator(tmp_path / "acc", init, update,
                                      every=4)
    assert acc2.resumed_at == 8
    applied = [acc2.step(i, planes[i]) for i in range(16)]
    assert applied == [False] * 8 + [True] * 8
    final = acc2.finish()
    npt.assert_allclose(np.asarray(final), want, rtol=1e-6)

    # a third run after finish() resumes past the end: nothing reapplied
    acc3 = ck.CheckpointedAccumulator(tmp_path / "acc", init, update)
    assert acc3.resumed_at == 16
    npt.assert_allclose(np.asarray(acc3.state), want, rtol=1e-6)


def test_accumulator_rejects_out_of_order(tmp_path):
    acc = ck.CheckpointedAccumulator(tmp_path / "acc", jnp.zeros(()),
                                     lambda s, c: s + c)
    acc.step(0, jnp.asarray(1.0))
    try:
        acc.step(2, jnp.asarray(1.0))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
