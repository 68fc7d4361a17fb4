"""Sharded pipeline checkpointing: resumable long-running integrations.

The reference's only resume mechanism is its file-per-stage artifact graph
(SURVEY.md §5 "checkpoint/resume"; e.g. Ray-Ramses map sums re-read
per-snapshot HDF5, /root/reference/src/astrild/simcoll.py:238-341). That
works for whole stages but cannot resume *inside* a long accumulation —
a lightcone integration over hundreds of lens planes, a simulation-array
sweep over realizations — and it knows nothing about device meshes.

This module adds first-class checkpointing for exactly those loops:

  * `save_state` / `restore_state`: orbax-backed pytree checkpoints that
    preserve `jax.sharding.NamedSharding` layouts, so a state sharded
    over an N-chip mesh restores onto the mesh without a host gather.
    Falls back to a plain npz snapshot (host-gathered) when orbax is
    unavailable.
  * `CheckpointedAccumulator`: chunked streaming accumulation (the
    framework's version of "sum maps over ray snapshots") that persists
    its running state every `every` chunks and resumes mid-stream.

Used with `core.manifest.ArtifactStore` for the stage-level graph; this
module covers the intra-stage loop.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Callable, Optional

import jax
import numpy as np

__all__ = ["save_state", "restore_state", "bind_schedule",
           "CheckpointedAccumulator", "have_orbax"]


def have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except Exception:
        return False


def _as_path(path) -> Path:
    p = Path(path).absolute()
    p.mkdir(parents=True, exist_ok=True)
    return p


def save_state(path, state, step: Optional[int] = None) -> None:
    """Persist a pytree of (possibly sharded) arrays.

    With orbax the on-disk format records each leaf's sharding; without it
    the leaves are host-gathered into a single npz (still correct, but a
    multi-host restore re-shards from host copies).

    The `step` travels INSIDE the checkpoint payload (an extra `step` leaf
    under orbax; a `__step__` entry in the npz), so (state, step) commit
    atomically: orbax renames its temp dir into place, and the npz path
    writes a temp file then `os.replace`s it. A crash mid-save leaves the
    previous complete checkpoint intact. `meta.json` is still written for
    human inspection / legacy readers, but restore never trusts its step
    when the payload carries one.
    """
    p = _as_path(path)
    meta = {"step": step}
    if have_orbax():
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # wrap: StandardCheckpointer rejects bare array/scalar states
        payload = {"tree": state,
                   "step": np.int64(-1 if step is None else step)}
        ckptr.save(p / "state", payload, force=True)
        ckptr.wait_until_finished()
    else:
        flat, treedef = jax.tree_util.tree_flatten(state)
        arrays = {f"arr_{i}": np.asarray(x) for i, x in enumerate(flat)}
        arrays["__step__"] = np.int64(-1 if step is None else step)
        tmp = p / "state.tmp.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, p / "state.npz")
        meta["treedef"] = str(treedef)
    mtmp = p / "meta.tmp.json"
    with open(mtmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(mtmp, p / "meta.json")


def restore_state(path, template, with_step: bool = False):
    """Restore a pytree saved by `save_state`.

    template: a pytree of arrays (or jax.ShapeDtypeStruct with sharding)
    matching the saved structure; sharded templates restore each leaf
    directly onto its mesh under orbax.
    """
    p = Path(path).absolute()
    meta = {}
    mp = p / "meta.json"
    if mp.exists():
        with open(mp) as fh:
            meta = json.load(fh)
    step = meta.get("step")  # legacy fallback; payload step wins below
    if (p / "state").exists() and have_orbax():
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(
            lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
            else jax.ShapeDtypeStruct(
                jax.numpy.shape(x), x.dtype,
                sharding=getattr(x, "sharding", None)), template)
        try:
            payload = ckptr.restore(
                p / "state",
                {"tree": abstract,
                 "step": jax.ShapeDtypeStruct((), np.int64)})
            s = int(payload["step"])
            step = None if s < 0 else s
        except Exception:  # legacy checkpoint without the step leaf
            payload = ckptr.restore(p / "state", {"tree": abstract})
        state = payload["tree"]
    else:
        if (p / "state").exists() and not (p / "state.npz").exists():
            raise RuntimeError(
                f"checkpoint at {p} was written with orbax (state/ dir) "
                "but orbax is not importable here — install orbax or "
                "restore in the environment that wrote it (the npz "
                "fallback would otherwise die in FileNotFoundError "
                "without naming the real cause)")
        flat_t, treedef = jax.tree_util.tree_flatten(template)
        with np.load(p / "state.npz") as z:
            if "__step__" in z.files:
                s = int(z["__step__"])
                step = None if s < 0 else s
                flat = [z[f"arr_{i}"] for i in range(len(z.files) - 1)]
            else:  # legacy layout: positional arrays only
                flat = [z[k] for k in z.files]
        leaves = []
        for arr, t in zip(flat, flat_t):
            x = jax.numpy.asarray(arr)
            sh = getattr(t, "sharding", None)
            if sh is not None and not isinstance(
                    sh, jax.sharding.SingleDeviceSharding):
                x = jax.device_put(x, sh)
            leaves.append(x)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    if with_step:
        return state, step
    return state


def bind_schedule(path, schedule: dict) -> None:
    """Pin a run's schedule to its checkpoint directory.

    A checkpointed step count is only meaningful against the schedule
    that produced it: resuming a state evolved to edges_A[k] on
    edges_B[k] of a DIFFERENT schedule is a physically wrong trajectory
    with no error. Callers describe their schedule as a JSON-able dict;
    the first call writes it to `schedule.json`, and every later call
    raises ValueError if the stored schedule differs. Written before the
    first state save, so any resumable checkpoint carries its schedule.
    Checkpoints from before this mechanism (no schedule.json but state
    present) adopt the caller's schedule — same trust level as before.
    """
    p = _as_path(path)
    sp = p / "schedule.json"
    # normalize through a JSON round trip so float repr / tuple-vs-list
    # differences don't cause false mismatches
    norm = json.loads(json.dumps(schedule))
    if sp.exists():
        with open(sp) as fh:
            stored = json.load(fh)
        if stored != norm:
            diff = {k: (stored.get(k), norm.get(k))
                    for k in set(stored) | set(norm)
                    if stored.get(k) != norm.get(k)}
            raise ValueError(
                f"checkpoint at {p} was written under a different "
                f"schedule — resuming it on this one would follow a "
                f"wrong trajectory. Mismatched fields "
                f"(stored, requested): {diff}. Point ckpt_dir somewhere "
                "fresh or rerun with the original arguments.")
        return
    tmp = p / "schedule.tmp.json"
    with open(tmp, "w") as fh:
        json.dump(norm, fh)
    os.replace(tmp, sp)


def checkpoint_exists(path) -> bool:
    # State presence is authoritative (meta.json is best-effort and may be
    # missing after a crash between the atomic state commit and meta write).
    p = Path(path).absolute()
    return ((p / "state.npz").exists() or (p / "state").exists()
            or (p / "meta.json").exists())


class CheckpointedAccumulator:
    """Resumable streaming accumulation over a long chunk sequence.

    The TPU-native shape of the reference's per-snapshot map summation:
    `update` folds one chunk into a (possibly mesh-sharded) running state;
    the state is checkpointed every `every` chunks, and a rerun after an
    interruption resumes from the last completed chunk.

        acc = CheckpointedAccumulator(dir, init_state, update_fn, every=8)
        for i, chunk in enumerate(chunks):
            acc.step(i, chunk)          # skips chunks already folded in
        final = acc.finish()            # state + final checkpoint
    """

    def __init__(self, dir_ckpt, init_state, update_fn: Callable,
                 every: int = 1):
        self.dir = Path(dir_ckpt).absolute()
        self.update_fn = update_fn
        self.every = max(int(every), 1)
        if checkpoint_exists(self.dir):
            self.state, step = restore_state(self.dir, init_state,
                                             with_step=True)
            self.next_index = int(step if step is not None else -1) + 1
        else:
            self.state = init_state
            self.next_index = 0
        self.resumed_at = self.next_index

    def step(self, index: int, chunk) -> bool:
        """Fold chunk `index` into the state; no-op if already folded.

        Chunks must be presented in increasing index order. Returns True
        when the chunk was applied (False = skipped on resume).
        """
        if index < self.next_index:
            return False
        if index != self.next_index:
            raise ValueError(
                f"chunk {index} out of order (expected {self.next_index})")
        self.state = self.update_fn(self.state, chunk)
        self.next_index = index + 1
        if self.next_index % self.every == 0:
            save_state(self.dir, self.state, step=index)
        return True

    def finish(self):
        save_state(self.dir, self.state, step=self.next_index - 1)
        return self.state
