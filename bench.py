"""Benchmark runner: z=0 analysis-suite throughput on the real chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.json north star): full z=0 suite for a 1024^3-particle
snapshot in < 60 s on a TPU v4-8, i.e. 1024^3 / (60 s * 8 chips)
= 2.24 M particles/s/chip. The suite grows as components land; the bench
always measures the per-snapshot wall-clock of everything currently
implemented, at the largest scale that fits one chip, and reports
throughput normalized per chip.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, "/root/repo")

# Baseline: north-star suite throughput per chip [particles/s]
BASELINE_PPS_PER_CHIP = 1024 ** 3 / (60.0 * 8)


def suite_step(pos, boxsize, ngrid):
    """The z=0 suite over one snapshot (components implemented so far)."""
    from astrild_tpu.ops import paint, power

    g = paint.paint(pos, ngrid, boxsize, window="tsc")
    res = power.auto_power(g, boxsize, nbins=ngrid // 2, window="tsc",
                           shotnoise=boxsize ** 3 / pos.shape[0])
    return res


def main():
    n_side = 256          # particles per side (256^3 = 16.8M)
    ngrid = 256
    boxsize = 500.0
    n_part = n_side ** 3

    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n_part, 3), minval=0.0, maxval=boxsize,
                             dtype=jnp.float32)
    jax.block_until_ready(pos)

    step = jax.jit(lambda p: suite_step(p, boxsize, ngrid))
    # warmup/compile (host transfer forces full sync even on async backends)
    _ = list(map(float, step(pos).power[:1]))

    times = []
    for i in range(3):
        # nudge input so cached-result shortcuts can't fake the clock
        p_i = pos + jnp.float32(i) * 1e-6
        jax.block_until_ready(p_i)
        t0 = time.perf_counter()
        res = step(p_i)
        _ = float(res.power[0])  # device->host sync
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pps = n_part / dt  # particles/s on this one chip
    print(json.dumps({
        "metric": "z=0 suite throughput (paint+P(k), 256^3 grid)",
        "value": round(pps / 1e6, 3),
        "unit": "Mparticles/s/chip",
        "vs_baseline": round(pps / BASELINE_PPS_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
