"""The bench's file-driven lane (disk -> striped read -> transfer ->
P(k)) must produce its JSON record on any backend — the driver artifact
depends on it, so its code path gets a CPU smoke test at tiny scale
rather than being chip-only (r4 VERDICT #6)."""
import numpy as np


def test_file_driven_lane_record():
    import jax

    import bench

    # importing bench points the compilation cache at the TPU cache dir;
    # restore the suite's SEPARATE CPU cache (conftest rationale: mixing
    # writers has produced truncated entries that segfault the reader)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")

    # an uncommon size keys a fresh /tmp snapshot cache so a stale cache
    # from a previous full-size bench run can't interfere
    rec = bench._file_driven_lane(48)
    assert rec["unit"].startswith("s")
    for k in ("load_s", "transfer_s", "compute_s", "value"):
        assert np.isfinite(rec[k]) and rec[k] >= 0.0, (k, rec)
    assert abs(rec["value"]
               - (rec["load_s"] + rec["transfer_s"] + rec["compute_s"])) \
        < 0.005
    assert "Gadget HDF5" in rec["metric"]
    # second call reuses the cached snapshot (no generate_s key)
    rec2 = bench._file_driven_lane(48)
    assert "generate_s" not in rec2
