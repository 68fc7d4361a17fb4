"""Artifact manifest: content-hashed pipeline checkpointing.

The reference checkpoints implicitly — every stage writes files the next
stage re-reads (SURVEY.md §5 "checkpoint/resume"). This keeps that
artifact-graph philosophy but makes it explicit: artifacts are saved with
a manifest entry recording their content hash and the hashes of their
inputs, so `fresh()` can tell whether a stage needs recomputation and
`load()` restores device arrays.

    store = ArtifactStore(dir_out)
    inputs = {"pos": pos_hash or arrays, "params": {...}}
    if not store.fresh("pk_snap12", inputs):
        result = compute(...)
        store.save("pk_snap12", {"k": k, "power": p}, inputs)
    out = store.load("pk_snap12")
"""
from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np

__all__ = ["ArtifactStore", "content_hash"]


def content_hash(obj) -> str:
    """Stable sha256 of arrays / nested dicts / scalars / strings."""
    h = hashlib.sha256()

    def feed(x):
        if isinstance(x, dict):
            for k in sorted(x):
                h.update(str(k).encode())
                feed(x[k])
        elif isinstance(x, (list, tuple)):
            for v in x:
                feed(v)
        elif isinstance(x, str):
            h.update(x.encode())
        elif isinstance(x, (int, float, bool)) or x is None:
            h.update(repr(x).encode())
        else:
            arr = np.asarray(x)
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(np.ascontiguousarray(arr).tobytes())

    feed(obj)
    return h.hexdigest()


class ArtifactStore:
    """Directory of content-hashed artifacts + a manifest.json index."""

    def __init__(self, dir_out: str):
        self.dir = Path(dir_out)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.manifest_path = self.dir / "manifest.json"
        self.manifest: Dict[str, dict] = {}
        if self.manifest_path.exists():
            self.manifest = json.loads(self.manifest_path.read_text())

    def _write_manifest(self):
        self.manifest_path.write_text(json.dumps(self.manifest, indent=1))

    # ---------------------------------------------------------------- api
    def fresh(self, name: str, inputs) -> bool:
        """True when `name` exists and was produced from these inputs."""
        entry = self.manifest.get(name)
        if entry is None:
            return False
        if not (self.dir / entry["file"]).exists():
            return False
        return entry["inputs_hash"] == content_hash(inputs)

    def save(self, name: str, arrays: Dict[str, np.ndarray], inputs=None,
             meta: Optional[dict] = None) -> str:
        import h5py

        fname = f"{name}.h5"
        path = self.dir / fname
        with h5py.File(path, "w") as f:
            for k, v in arrays.items():
                f[k] = np.asarray(v)
        self.manifest[name] = {
            "file": fname,
            "content_hash": content_hash(arrays),
            "inputs_hash": content_hash(inputs),
            "meta": meta or {},
        }
        self._write_manifest()
        return str(path)

    def load(self, name: str, to_device: bool = False) -> Dict[str, np.ndarray]:
        import h5py

        entry = self.manifest[name]
        out = {}
        with h5py.File(self.dir / entry["file"], "r") as f:
            for k in f:
                out[k] = np.asarray(f[k])
        if to_device:
            import jax.numpy as jnp

            out = {k: jnp.asarray(v) for k, v in out.items()}
        return out

    def verify(self, name: str) -> bool:
        """Re-hash the stored artifact against its manifest entry."""
        entry = self.manifest[name]
        data = self.load(name)
        return content_hash(data) == entry["content_hash"]

    def stage(self, name: str, inputs, compute):
        """Memoized stage: compute() only when inputs changed.

        Always returns the stored (host numpy) form — returning
        compute()'s raw output on a miss would hand callers device
        arrays on the first run and h5-roundtripped numpy on cached
        runs, so code depending on either type worked only half the
        time.
        """
        if self.fresh(name, inputs):
            return self.load(name)
        out = compute()
        self.save(name, {k: np.asarray(v) for k, v in out.items()}, inputs)
        return self.load(name)
