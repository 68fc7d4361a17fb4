"""Regression-pin the distributed layer's collective structure.

For each parallel/ factory (at the dryrun shapes, on the 8-device CPU
mesh) the compiled module's collective inventory — op kind, count,
per-shard output bytes — is asserted against the checked-in manifest
`tests/data/collective_manifest.json`. Numerics are already pinned by
the sharding-equivalence tests; this pins the COMMUNICATION structure,
so an XLA upgrade that rewrites a psum_scatter into all-gather+slice or
multiplies the pencil-FFT all-to-alls fails loudly instead of silently
eating the (locally unmeasurable) multi-chip scaling (r4 VERDICT #2).

Regenerate after a DELIBERATE sharding change, then review the diff:

    python tests/test_collective_inventory.py --write

Anchor: the MPI pfft/pmesh/mpsort stack this replaces (reference
power_spectrum_3d.py:183-195, SURVEY §5 distributed-backend row).
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from astrild_tpu.parallel import make_mesh
from astrild_tpu.parallel.inventory import collective_inventory

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "collective_manifest.json")

NGRID, BOX, NBINS = 16, 100.0, 6


def _mesh():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(n_sim=2, n_x=2, n_y=2)


def _particles(mesh):
    n_part = 2048 * 4
    pos = jax.random.uniform(jax.random.PRNGKey(1), (2, n_part, 3),
                             minval=0.0, maxval=BOX)
    w = jnp.ones((2, n_part), jnp.float32)
    pos_b = jax.device_put(pos, NamedSharding(mesh,
                                              P("sim", ("x", "y"), None)))
    w_b = jax.device_put(w, NamedSharding(mesh, P("sim", ("x", "y"))))
    pos_f = jax.device_put(pos.reshape(-1, 3),
                           NamedSharding(mesh, P(("sim", "x", "y"), None)))
    w_f = jax.device_put(w.reshape(-1),
                         NamedSharding(mesh, P(("sim", "x", "y"))))
    return pos_b, w_b, pos_f, w_f


# surface -> () -> (fn, args); lazily built so each test only pays for
# the factories it checks
def _surface_builders(mesh):
    pos_b, w_b, pos_f, w_f = _particles(mesh)

    def auto_power():
        from astrild_tpu.parallel.power import make_distributed_auto_power
        fn = make_distributed_auto_power(mesh, NGRID, BOX, NBINS,
                                         window="cic", batched=True)
        return fn, (pos_b, w_b)

    def auto_power_fast():
        from astrild_tpu.parallel.power import (
            make_distributed_auto_power_fast)
        fn = make_distributed_auto_power_fast(mesh, NGRID, BOX, NBINS)
        return fn, (pos_f, w_f)

    def multipoles():
        from astrild_tpu.parallel.power import make_distributed_multipoles
        fn = make_distributed_multipoles(mesh, NGRID, BOX, 4)
        return fn, (pos_f, w_f)

    def bispectrum():
        from astrild_tpu.parallel.bispectrum import (
            make_distributed_bispectrum)
        grid = jax.random.uniform(jax.random.PRNGKey(6),
                                  (NGRID, NGRID, NGRID)) + 0.5
        grid = jax.device_put(grid, NamedSharding(mesh, P("x", "y", None)))
        fn = make_distributed_bispectrum(mesh, NGRID, BOX, nbins=3,
                                         m_min=1.0, m_max=7.0)
        return fn, (grid,)

    def z0_suite():
        from astrild_tpu.parallel.suite import make_distributed_z0_suite
        fn = make_distributed_z0_suite(mesh, NGRID, BOX, nbins_pk=NBINS,
                                       nbins_bk=3, bk_m_min=2.0,
                                       bk_m_max=7.0, nplanes=4,
                                       max_peaks=64, max_voids=16)
        return fn, (pos_f, w_f)

    def pm_evolve():
        from astrild_tpu.parallel.nbody import make_distributed_pm_evolve
        from astrild_tpu.utils.cosmology import Cosmology
        row = NamedSharding(mesh, P(("sim", "x", "y")))
        comps = tuple(
            jax.device_put(jax.random.uniform(jax.random.PRNGKey(40 + i),
                                              (NGRID ** 3,), maxval=BOX),
                           row) for i in range(3))
        mom = tuple(jax.device_put(jnp.zeros((NGRID ** 3,)), row)
                    for _ in range(3))
        fn = make_distributed_pm_evolve(mesh, NGRID, BOX,
                                        Cosmology(Om0=0.3, h=0.7),
                                        nsteps=2)
        # evolve() does host KDK-table precompute per call (un-traceable
        # by an outer jit) — lower its exposed inner jitted program with
        # the tables as arguments
        factors = jnp.zeros((2, 3), jnp.float32)
        am2 = jnp.full((3,), jnp.inf, jnp.float32)
        return fn.sharded_fn, (comps, mom, factors, am2)

    def sht_synth():
        # ring-sharded synthesis is DELIBERATELY collective-free (alms
        # replicated, each device renders its ring block) — the empty
        # inventory is the assertion
        from astrild_tpu.parallel.sht import make_distributed_sht
        lmax = 8
        synth, _ = make_distributed_sht(mesh, 8, lmax)
        alm0 = jnp.zeros((lmax + 1, lmax + 1), jnp.float32)
        return synth, (alm0.at[2, 1].set(0.7), alm0)

    def sht_analyze():
        from astrild_tpu.parallel.sht import make_distributed_sht
        lmax = 8
        synth, analyze = make_distributed_sht(mesh, 8, lmax)
        alm0 = jnp.zeros((lmax + 1, lmax + 1), jnp.float32)
        sky = synth(alm0.at[2, 1].set(0.7), alm0)
        return (lambda m: analyze(m, niter=2)), (sky,)

    def gaussian_filter():
        from astrild_tpu.parallel.maps import make_sharded_gaussian_filter
        npix = 64
        kappa = jax.random.normal(jax.random.PRNGKey(2),
                                  (npix, npix)) * 0.01
        kappa = jax.device_put(kappa, NamedSharding(mesh, P("x", None)))
        fn = make_sharded_gaussian_filter(mesh, npix, theta_deg=5.0,
                                          sigma_arcmin=4.0)
        return fn, (kappa,)

    def pairwise():
        from astrild_tpu.parallel.pairwise import make_distributed_pairwise
        n_pw = 256
        ppos = jax.random.uniform(jax.random.PRNGKey(4), (n_pw, 3),
                                  minval=400.0, maxval=600.0)
        pvel = jax.random.normal(jax.random.PRNGKey(5), (n_pw, 3)) * 100.0
        ppos = jax.device_put(ppos, NamedSharding(mesh, P("sim", None)))
        pvel = jax.device_put(pvel, NamedSharding(mesh, P("sim", None)))
        fn = make_distributed_pairwise(mesh, nbins=8, binwidth=20.0,
                                       axis="sim", block=128)
        return fn, (ppos, pvel)

    def sht_large_synth():
        # m-sharded scan-path SHT: ONE psum (the m-block embed-at-offset
        # reduction) is the whole communication structure
        from astrild_tpu.parallel.sht_large import (
            make_distributed_sht_large)
        lmax = 15
        synth_l, _ = make_distributed_sht_large(mesh, 8, lmax)
        alm = jnp.zeros((lmax + 1, lmax + 1), jnp.float32).at[2, 1].set(0.7)
        return synth_l, (alm, jnp.zeros_like(alm))

    def raytrace():
        # realization-parallel (dp over 'sim') — collective-free by
        # design; the empty inventory is the assertion
        from astrild_tpu.parallel.lensing import make_distributed_raytrace
        planes = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(3), (2, 4, 32, 32)) * 0.3,
            NamedSharding(mesh, P("sim")))
        rt = make_distributed_raytrace(mesh, 3000.0, 0.3, 0.1)
        return rt, (planes, jnp.linspace(300.0, 2500.0, 4),
                    jnp.full((4,), 50.0))

    def field_infer_grad():
        # the DIFFERENTIATED sharded forward model: pins the transposed
        # collective structure too (all_to_all transposes, all_gather
        # <-> psum_scatter/reduce-scatter pairs from the AD transpose)
        from astrild_tpu.parallel.field_infer import (
            make_distributed_field_infer)
        from astrild_tpu.utils.cosmology import Cosmology

        def pk(k):
            return 2.0e3 * (k / 0.1) ** -1.5

        fac = make_distributed_field_infer(
            mesh, NGRID, BOX, pk, Cosmology(Om0=0.3, h=0.7),
            z_init=9.0, nsteps=2, window="cic")
        w = jax.random.normal(jax.random.PRNGKey(8), (NGRID,) * 3)
        data = jnp.zeros((NGRID,) * 3, jnp.float32)
        return fac.value_and_grad, (w, data, jnp.asarray(0.05))

    return {
        "field_infer_grad": field_infer_grad,
        "auto_power": auto_power,
        "auto_power_fast": auto_power_fast,
        "multipoles": multipoles,
        "bispectrum": bispectrum,
        "z0_suite": z0_suite,
        "pm_evolve": pm_evolve,
        "sht_synth": sht_synth,
        "sht_analyze": sht_analyze,
        "sht_large_synth": sht_large_synth,
        "raytrace": raytrace,
        "gaussian_filter": gaussian_filter,
        "pairwise": pairwise,
    }


CORE = ("auto_power_fast", "multipoles", "bispectrum", "gaussian_filter")
EXTENDED = ("auto_power", "z0_suite", "pm_evolve", "sht_synth",
            "sht_analyze", "sht_large_synth", "raytrace", "pairwise",
            "field_infer_grad")


def _manifest():
    if not os.path.exists(MANIFEST):
        pytest.fail(f"manifest missing: {MANIFEST} — run "
                    "`python tests/test_collective_inventory.py --write`")
    with open(MANIFEST) as f:
        return json.load(f)


def _check(names):
    mesh = _mesh()
    builders = _surface_builders(mesh)
    want = _manifest()
    problems = []
    for name in names:
        fn, args = builders[name]()
        got = collective_inventory(fn, *args)
        if got != want.get(name):
            problems.append(
                f"{name}:\n  manifest: {json.dumps(want.get(name))}\n"
                f"  compiled: {json.dumps(got)}")
    assert not problems, (
        "collective structure drifted from tests/data/"
        "collective_manifest.json — if this change is DELIBERATE, "
        "regenerate with `python tests/test_collective_inventory.py "
        "--write` and review the diff:\n" + "\n".join(problems))


def test_collective_inventory_core():
    _check(CORE)


@pytest.mark.slow
def test_collective_inventory_extended():
    _check(EXTENDED)


def test_detects_structural_change():
    """A deliberately-broken sharding — pencil factorization (4,1)
    instead of the manifest's (2,2) — must diverge from the manifest
    (measured: 8 vs 16 all-to-alls, 1 vs 2 reduce-scatters), proving the
    inventory actually pins structure and the parser isn't returning {}
    everywhere. (Merely re-sharding the INPUTS is absorbed by
    shard_map's in_specs and correctly does NOT trip the check.)"""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from astrild_tpu.parallel.power import make_distributed_auto_power_fast
    mesh_bad = make_mesh(n_sim=2, n_x=4, n_y=1)
    n_part = 2048 * 4
    pos = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (2 * n_part, 3),
                           maxval=BOX),
        NamedSharding(mesh_bad, P(("sim", "x", "y"), None)))
    w = jax.device_put(jnp.ones((2 * n_part,), jnp.float32),
                       NamedSharding(mesh_bad, P(("sim", "x", "y"))))
    got = collective_inventory(
        make_distributed_auto_power_fast(mesh_bad, NGRID, BOX, NBINS),
        pos, w)
    assert got, "parser found no collectives in a pencil-FFT pipeline"
    assert got != _manifest()["auto_power_fast"]


if __name__ == "__main__":
    if "--write" not in sys.argv:
        sys.exit("usage: python tests/test_collective_inventory.py --write")
    # same virtual mesh the test suite uses (conftest is absent when run
    # as a script; the outer env pins the axon TPU tunnel)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    mesh = make_mesh(n_sim=2, n_x=2, n_y=2)
    builders = _surface_builders(mesh)
    out = {}
    for name, build in builders.items():
        fn, args = build()
        out[name] = collective_inventory(fn, *args)
        print(name, json.dumps(out[name]))
    os.makedirs(os.path.dirname(MANIFEST), exist_ok=True)
    with open(MANIFEST, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST}")
