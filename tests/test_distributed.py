"""Sharding-equivalence tests: distributed results == single-device results.

This is the test class the reference entirely lacked (SURVEY.md §4): the
pencil FFT and distributed P(k) must agree with the local estimator to
float tolerance on the 8-device virtual CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from astrild_tpu.ops import paint as paint_ops
from astrild_tpu.ops import power as power_ops
from astrild_tpu.parallel import make_mesh
from astrild_tpu.parallel.pfft import make_pfft3d
from astrild_tpu.parallel.bispectrum import make_distributed_bispectrum
from astrild_tpu.parallel.power import make_distributed_auto_power

BOX = 100.0
NG = 16


@pytest.fixture(scope="module")
def mesh22():
    return make_mesh(n_sim=2, n_x=2, n_y=2)


def test_device_count():
    assert jax.device_count() == 8


def test_pencil_fft_matches_fftn(mesh22, rng):
    x = jnp.asarray(rng.standard_normal((NG, NG, NG)).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh22, P("x", "y", None)))
    got = make_pfft3d(mesh22)(xs)
    want = jnp.fft.fftn(x.astype(jnp.complex64))
    npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-3)


def test_pencil_fft_roundtrip(mesh22, rng):
    x = jnp.asarray(rng.standard_normal((NG, NG, NG)).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh22, P("x", "y", None)))
    fwd = make_pfft3d(mesh22)
    inv = make_pfft3d(mesh22, inverse=True)
    back = inv(fwd(xs))
    npt.assert_allclose(np.asarray(jnp.real(back)), np.asarray(x),
                        rtol=1e-4, atol=1e-4)


def test_distributed_power_matches_local(mesh22, rng):
    n_part = 8192
    pos = rng.uniform(0, BOX, (n_part, 3)).astype(np.float32)
    nbins = 6
    # local reference (full-spectrum estimator conventions match)
    g = paint_ops.paint(jnp.asarray(pos), NG, BOX, window="cic")
    ref = power_ops.auto_power(g, BOX, nbins=nbins, window="cic",
                               shotnoise=BOX ** 3 / n_part)
    # distributed
    dfn = make_distributed_auto_power(mesh22, NG, BOX, nbins, window="cic")
    spec = NamedSharding(mesh22, P(("sim", "x", "y"), None))
    pos_sh = jax.device_put(jnp.asarray(pos), spec)
    w_sh = jax.device_put(jnp.ones((n_part,), jnp.float32),
                          NamedSharding(mesh22, P(("sim", "x", "y"))))
    got = dfn(pos_sh, w_sh)
    npt.assert_allclose(np.asarray(got.nmodes), np.asarray(ref.nmodes))
    npt.assert_allclose(np.asarray(got.k), np.asarray(ref.k), rtol=1e-5)
    npt.assert_allclose(np.asarray(got.power), np.asarray(ref.power),
                        rtol=5e-3, atol=1e-3 * BOX ** 3 / n_part)

    # flat (x, y, z) component buffers — the multihost loader's layout —
    # must feed the same factory (documented contract; previously only
    # the _fast factory had the tuple in_specs)
    rspec = NamedSharding(mesh22, P(("sim", "x", "y")))
    comp = tuple(jax.device_put(jnp.asarray(pos[:, i]), rspec)
                 for i in range(3))
    got_t = dfn(comp, w_sh)
    npt.assert_allclose(np.asarray(got_t.power), np.asarray(got.power),
                        rtol=1e-6)


def test_distributed_power_batched_sims(mesh22, rng):
    n_part = 4096
    nbins = 5
    pos = rng.uniform(0, BOX, (2, n_part, 3)).astype(np.float32)
    dfn = make_distributed_auto_power(mesh22, NG, BOX, nbins, window="cic",
                                      batched=True)
    spec = NamedSharding(mesh22, P("sim", ("x", "y"), None))
    pos_sh = jax.device_put(jnp.asarray(pos), spec)
    w_sh = jax.device_put(jnp.ones((2, n_part), jnp.float32),
                          NamedSharding(mesh22, P("sim", ("x", "y"))))
    got = dfn(pos_sh, w_sh)
    assert got.power.shape == (2, nbins)
    # each sim must match its local single-device estimate
    for s in range(2):
        g = paint_ops.paint(jnp.asarray(pos[s]), NG, BOX, window="cic")
        ref = power_ops.auto_power(g, BOX, nbins=nbins, window="cic",
                                   shotnoise=BOX ** 3 / n_part)
        npt.assert_allclose(np.asarray(got.power[s]), np.asarray(ref.power),
                            rtol=5e-3, atol=1e-3 * BOX ** 3 / n_part)


def test_distributed_fast_power_matches_local(mesh22, rng):
    from astrild_tpu.parallel.power import make_distributed_auto_power_fast

    n_part = 8192
    nbins = 6
    pos = rng.uniform(0, BOX, (n_part, 3)).astype(np.float32)
    xyz = (jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
           jnp.asarray(pos[:, 2]))
    ref = power_ops.auto_power_fast(xyz, NG, BOX, nbins=nbins,
                                    deposit="scatter")
    dfn = make_distributed_auto_power_fast(mesh22, NG, BOX, nbins)
    spec = NamedSharding(mesh22, P(("sim", "x", "y"), None))
    pos_sh = jax.device_put(jnp.asarray(pos), spec)
    w_sh = jax.device_put(jnp.ones((n_part,), jnp.float32),
                          NamedSharding(mesh22, P(("sim", "x", "y"))))
    got = dfn(pos_sh, w_sh)
    # nmodes differ only by the z-Nyquist double count of hermitian
    # storage (local) vs single full-complex entry (distributed)
    npt.assert_allclose(np.asarray(got.k), np.asarray(ref.k), rtol=2e-4)
    npt.assert_allclose(np.asarray(got.power), np.asarray(ref.power),
                        rtol=5e-3, atol=2e-3 * BOX ** 3 / n_part)


def test_distributed_fast_power_pallas_kernel_in_shard_map(mesh22, rng):
    # proves the Pallas sorted-deposit composes with shard_map (interpret
    # mode on the CPU mesh; the TPU path is the same program)
    from astrild_tpu.parallel.power import make_distributed_auto_power_fast

    n_part = 2048
    nbins = 4
    pos = rng.uniform(0, BOX, (n_part, 3)).astype(np.float32)
    spec = NamedSharding(mesh22, P(("sim", "x", "y"), None))
    pos_sh = jax.device_put(jnp.asarray(pos), spec)
    w_sh = jax.device_put(jnp.ones((n_part,), jnp.float32),
                          NamedSharding(mesh22, P(("sim", "x", "y"))))
    got_s = make_distributed_auto_power_fast(mesh22, NG, BOX, nbins,
                                             deposit="scatter")(pos_sh, w_sh)
    got_p = make_distributed_auto_power_fast(
        mesh22, NG, BOX, nbins, deposit="pallas_interpret")(pos_sh, w_sh)
    npt.assert_allclose(np.asarray(got_p.power), np.asarray(got_s.power),
                        rtol=1e-5, atol=1e-6 * BOX ** 3 / n_part)
    npt.assert_array_equal(np.asarray(got_p.nmodes),
                           np.asarray(got_s.nmodes))


def test_distributed_pairwise_matches_local(rng):
    from astrild_tpu.ops import pairwise as PW
    from astrild_tpu.parallel.pairwise import make_distributed_pairwise

    mesh = make_mesh(n_sim=4, n_x=1, n_y=1)
    n = 1024  # 256 per shard
    pos = rng.uniform(400, 600, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 100, (n, 3)).astype(np.float32)
    nbins, binw = 16, 10.0
    fn = make_distributed_pairwise(mesh, nbins, binw, axis="sim", block=256)
    pos_sh = jax.device_put(jnp.asarray(pos), NamedSharding(mesh, P("sim", None)))
    vel_sh = jax.device_put(jnp.asarray(vel), NamedSharding(mesh, P("sim", None)))
    nom_d, den_d = fn(pos_sh, vel_sh)
    bins = jnp.asarray(np.arange(nbins, dtype=np.float64) * binw)
    rsep, v12_local = PW.mean_pairwise_velocity(jnp.asarray(pos),
                                                jnp.asarray(vel), bins,
                                                backend="xla")
    v12_d = np.asarray(nom_d) / np.maximum(np.asarray(den_d), 1e-30)
    good = np.isfinite(np.asarray(v12_local))
    npt.assert_allclose(v12_d[good], np.asarray(v12_local)[good],
                        rtol=2e-3, atol=0.3)


def test_distributed_pairwise_valid_mask_per_shard_padding(rng):
    """Per-SHARD padding (the multihost striped-loader layout) must be
    excluded via the validity-mask variant: a global n_valid count would
    pair zero rows and drop real tail rows, silently biasing v12."""
    from astrild_tpu.ops import pairwise as PW
    from astrild_tpu.parallel.pairwise import make_distributed_pairwise

    mesh = make_mesh(n_sim=4, n_x=1, n_y=1)
    per = 256
    reals = [200, 256, 120, 256]  # ragged per-shard real counts
    pos_parts, vel_parts, val_parts, keep = [], [], [], []
    for nr in reals:
        p = rng.uniform(400, 600, (per, 3)).astype(np.float32)
        v = rng.normal(0, 100, (per, 3)).astype(np.float32)
        p[nr:] = 0.0
        v[nr:] = 0.0
        m = np.zeros(per, np.float32)
        m[:nr] = 1.0
        pos_parts.append(p)
        vel_parts.append(v)
        val_parts.append(m)
        keep.append(p[:nr])
    pos = np.concatenate(pos_parts)
    vel = np.concatenate(vel_parts)
    val = np.concatenate(val_parts)
    nbins, binw = 16, 10.0
    fn = make_distributed_pairwise(mesh, nbins, binw, axis="sim",
                                   block=256, with_valid_mask=True)
    sh = NamedSharding(mesh, P("sim", None))
    shv = NamedSharding(mesh, P("sim"))
    nom_d, den_d = fn(jax.device_put(jnp.asarray(pos), sh),
                      jax.device_put(jnp.asarray(vel), sh),
                      jax.device_put(jnp.asarray(val), shv))
    # local reference over only the real rows
    real = val > 0
    bins = jnp.asarray(np.arange(nbins, dtype=np.float64) * binw)
    _, v12_local = PW.mean_pairwise_velocity(jnp.asarray(pos[real]),
                                             jnp.asarray(vel[real]), bins,
                                             backend="xla")
    v12_d = np.asarray(nom_d) / np.maximum(np.asarray(den_d), 1e-30)
    good = np.isfinite(np.asarray(v12_local))
    npt.assert_allclose(v12_d[good], np.asarray(v12_local)[good],
                        rtol=2e-3, atol=0.3)


def test_distributed_bispectrum_matches_local(mesh22, rng):
    from astrild_tpu.ops import bispectrum as bs_ops

    grid = jnp.asarray(
        1.0 + 0.2 * rng.standard_normal((NG, NG, NG)).astype(np.float32))
    want = bs_ops.bispectrum_3d(grid, BOX, nbins=3, m_min=1.0, m_max=7.0)
    gs = jax.device_put(grid, NamedSharding(mesh22, P("x", "y", None)))
    got = make_distributed_bispectrum(mesh22, NG, BOX, nbins=3, m_min=1.0,
                                      m_max=7.0)(gs)
    npt.assert_allclose(np.asarray(got.ntri), np.asarray(want.ntri),
                        rtol=1e-4)
    closed = np.asarray(want.ntri) > 0
    npt.assert_allclose(np.asarray(got.b)[closed],
                        np.asarray(want.b)[closed], rtol=2e-3, atol=1e-8)
    npt.assert_allclose(np.asarray(got.k1), np.asarray(want.k1), rtol=1e-5)


def test_distributed_bispectrum_truncated_matches_local(mesh22, rng):
    """3*m_max < ngrid engages the band-limited path (coarse-corner psum
    + local shell FFTs instead of per-shell inverse pencil FFTs); it must
    agree with the local estimator exactly like the full path does."""
    from astrild_tpu.ops import bispectrum as bs_ops
    from astrild_tpu.parallel.bispectrum import _coarse_size

    ng2 = 32
    assert _coarse_size(ng2, 4.0) == 16  # truncation actually engaged
    grid = jnp.asarray(
        1.0 + 0.2 * rng.standard_normal((ng2, ng2, ng2)).astype(np.float32))
    want = bs_ops.bispectrum_3d(grid, BOX, nbins=3, m_min=1.0, m_max=4.0)
    gs = jax.device_put(grid, NamedSharding(mesh22, P("x", "y", None)))
    got = make_distributed_bispectrum(mesh22, ng2, BOX, nbins=3, m_min=1.0,
                                      m_max=4.0)(gs)
    npt.assert_allclose(np.asarray(got.ntri), np.asarray(want.ntri),
                        rtol=1e-4, atol=1.0)
    closed = np.asarray(want.ntri) > 1.0
    npt.assert_allclose(np.asarray(got.b)[closed],
                        np.asarray(want.b)[closed], rtol=2e-3, atol=1e-8)
    npt.assert_allclose(np.asarray(got.k1), np.asarray(want.k1), rtol=1e-5)


def test_distributed_sht_matches_local(mesh22, rng):
    from astrild_tpu.ops import sht as sht_ops
    from astrild_tpu.parallel.sht import (make_distributed_sht, pad_map,
                                          unpad_map)

    nside, lmax = 8, 12
    valid = np.tril(np.ones((lmax + 1, lmax + 1), np.float32))
    a_re = rng.standard_normal((lmax + 1, lmax + 1)).astype(np.float32) * valid
    a_im = rng.standard_normal((lmax + 1, lmax + 1)).astype(np.float32) * valid
    a_im[:, 0] = 0.0
    want_map = np.asarray(sht_ops.synthesize(a_re, a_im, nside, lmax))

    synth, analyze = make_distributed_sht(mesh22, nside, lmax)
    got_pad = synth(a_re, a_im)
    got_map = unpad_map(np.asarray(got_pad)[: 4 * nside - 1], nside)
    npt.assert_allclose(got_map, want_map, atol=2e-5)

    b_re, b_im = analyze(pad_map(want_map, nside), niter=3)
    npt.assert_allclose(np.asarray(b_re), a_re, atol=5e-4)
    npt.assert_allclose(np.asarray(b_im), a_im, atol=5e-4)


@pytest.mark.slow
def test_distributed_sht_large_matches_local(mesh22, rng):
    """m-sharded scan-path SHT == single-device ops.sht_large, including
    the alias-fold band (lmax = 4*nside-1, where the m-block count 2
    pads to the axis size) and both analysis solvers."""
    from astrild_tpu.ops import sht_large as sl
    from astrild_tpu.parallel.sht_large import make_distributed_sht_large

    nside = 16
    for lmax in (31, 63):  # ~2*nside (jacobi regime) and 4*nside-1 (cg)
        valid = np.tril(np.ones((lmax + 1, lmax + 1), np.float32))
        a_re = rng.standard_normal((lmax + 1, lmax + 1)
                                   ).astype(np.float32) * valid * 0.1
        a_im = rng.standard_normal((lmax + 1, lmax + 1)
                                   ).astype(np.float32) * valid * 0.1
        a_im[:, 0] = 0.0
        want_map = np.asarray(sl.synthesize_large(a_re, a_im, nside, lmax))

        synth, analyze = make_distributed_sht_large(mesh22, nside, lmax)
        got_map = np.asarray(synth(a_re, a_im))
        # same scans, same tail, one psum of disjoint embeds: bit-exact
        npt.assert_array_equal(got_map, want_map)

        for method, niter in (("jacobi", 2), ("cg", 3)):
            w_re, w_im = sl.analyze_large(want_map, nside, lmax,
                                          niter=niter, method=method)
            g_re, g_im = analyze(got_map, niter=niter, method=method)
            if method == "jacobi":
                # same matvecs, same order: bit-exact
                npt.assert_array_equal(np.asarray(g_re), np.asarray(w_re))
                npt.assert_array_equal(np.asarray(g_im), np.asarray(w_im))
            else:
                # cg traces the matvec into ONE while_loop program; XLA
                # reassociates the fused reductions differently for the
                # sharded matvec — ulp-level only
                npt.assert_allclose(np.asarray(g_re), np.asarray(w_re),
                                    atol=5e-7)
                npt.assert_allclose(np.asarray(g_im), np.asarray(w_im),
                                    atol=5e-7)


@pytest.mark.slow
def test_distributed_sht_spin2_large_matches_local(mesh22, rng):
    """m-sharded spin-2 scan path == single-device ops.sht_spin_large
    (ulp-level: the tail's complex FFT/scatter fuse differently in the
    sharded program)."""
    from astrild_tpu.ops import sht_spin_large as ssl
    from astrild_tpu.parallel.sht_large import (
        make_distributed_sht_spin2_large)

    nside = 16
    for lmax in (31, 63):
        lg = np.arange(lmax + 1)[:, None]
        mg = np.arange(lmax + 1)[None, :]
        valid = ((mg <= lg) & (lg >= 2)).astype(np.float32)
        alms = [rng.standard_normal((lmax + 1, lmax + 1)
                                    ).astype(np.float32) * valid * 0.1
                for _ in range(4)]
        alms[1][:, 0] = 0.0
        alms[3][:, 0] = 0.0
        qw, uw = ssl.synthesize_spin2_large(*alms, nside, lmax)
        synth, analyze = make_distributed_sht_spin2_large(mesh22, nside,
                                                          lmax)
        qd, ud = synth(*alms)
        scale = float(jnp.std(qw))
        npt.assert_allclose(np.asarray(qd), np.asarray(qw),
                            atol=2e-6 * scale)
        npt.assert_allclose(np.asarray(ud), np.asarray(uw),
                            atol=2e-6 * scale)

        for method, niter in (("jacobi", 2), ("cg", 3)):
            want = ssl.analyze_spin2_large(qw, uw, nside, lmax,
                                           niter=niter, method=method)
            got = analyze(qd, ud, niter=niter, method=method)
            for g, w in zip(got, want):
                npt.assert_allclose(np.asarray(g), np.asarray(w),
                                    atol=5e-6)


def test_distributed_tpcf_matches_local(mesh22, rng):
    """Ring-rotation xi(s, mu) == single-device ops.tpcf, plain and
    per-shard-valid-mask paths (bit-exact: same tiles, same binning)."""
    from astrild_tpu.ops import tpcf as tpcf_ops
    from astrild_tpu.parallel.tpcf import make_distributed_tpcf_s_mu

    n = 1024
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    s_edges = jnp.linspace(1.0, 40.0, 9)
    _, _, want = tpcf_ops.tpcf_s_mu(jnp.asarray(pos), BOX, s_edges,
                                    nmu=10, block=128)
    f = make_distributed_tpcf_s_mu(mesh22, BOX, s_edges, nmu=10,
                                   axis="sim", block=128)
    posd = jax.device_put(jnp.asarray(pos),
                          NamedSharding(mesh22, P("sim", None)))
    _, _, got = f(posd)
    npt.assert_array_equal(np.asarray(got), np.asarray(want))

    # per-shard tail padding (the multihost loader layout): mask path
    valid = np.zeros(n, np.float32)
    valid[:450] = 1
    valid[512:512 + 450] = 1
    pos_m = pos.copy()
    pos_m[valid == 0] = 0.0
    _, _, want_m = tpcf_ops.tpcf_s_mu(jnp.asarray(pos[valid > 0]), BOX,
                                      s_edges, nmu=10, block=128)
    fm = make_distributed_tpcf_s_mu(mesh22, BOX, s_edges, nmu=10,
                                    axis="sim", block=128,
                                    with_valid_mask=True)
    pm = jax.device_put(jnp.asarray(pos_m),
                        NamedSharding(mesh22, P("sim", None)))
    vm = jax.device_put(jnp.asarray(valid),
                        NamedSharding(mesh22, P("sim")))
    _, _, got_m = fm(pm, vm)
    npt.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


@pytest.mark.slow
def test_distributed_lens_planes_matches_local(mesh22, rng):
    """Particle-sharded lens-plane painting == single-device builder,
    via both count paths (scatter scan and interpret-mode Pallas
    deposit) and with the per-shard valid mask."""
    from astrild_tpu.ops import lens_planes as lp
    from astrild_tpu.parallel.lensing import make_distributed_lens_planes

    n = 4096
    pos = tuple(jnp.asarray(rng.uniform(0, BOX, n), jnp.float32)
                for _ in range(3))
    want, chis = lp.density_planes_from_particles(pos, BOX, 200.0,
                                                  31.25, 8, 0.35, 32)
    sh = NamedSharding(mesh22, P("sim"))
    posd = tuple(jax.device_put(c, sh) for c in pos)
    for dep in ("scatter", "pallas"):
        f = make_distributed_lens_planes(mesh22, BOX, 200.0, 31.25, 8,
                                         0.35, 32, axis="sim",
                                         deposit=dep)
        got, chis2 = f(posd)
        # delta divides tiny per-pixel counts by a tiny expectation, so
        # f32 count roundoff amplifies; scale the tolerance to the field
        npt.assert_allclose(np.asarray(got), np.asarray(want),
                            atol=1e-3 * float(np.std(np.asarray(want))))
        npt.assert_array_equal(np.asarray(chis2), np.asarray(chis))

    # per-shard padding: the valid mask must drop zero-position pads
    valid = np.ones(n, np.float32)
    valid[1000:2048] = 0.0
    pos_m = tuple(np.where(valid > 0, np.asarray(c), 0.0
                           ).astype(np.float32) for c in pos)
    real = tuple(jnp.asarray(np.asarray(c)[valid > 0]) for c in pos)
    want_m, _ = lp.density_planes_from_particles(real, BOX, 200.0,
                                                 31.25, 8, 0.35, 32)
    fm = make_distributed_lens_planes(mesh22, BOX, 200.0, 31.25, 8,
                                      0.35, 32, axis="sim",
                                      with_valid_mask=True,
                                      deposit="scatter")
    pm = tuple(jax.device_put(jnp.asarray(c), sh) for c in pos_m)
    vm = jax.device_put(jnp.asarray(valid), sh)
    got_m, _ = fm(pm, vm)
    # zero-weight pads change the f32 summation order vs the compacted
    # single-device catalog: agreement is to roundoff, not bitwise
    npt.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                        rtol=1e-3, atol=1e-5)


def test_distributed_tpcf_odd_shards_and_tuple_input(rng):
    """Odd shard counts exercise the half-ring schedule's no-final-dedup
    branch; component-tuple input avoids the (n, 3) resident array."""
    from jax.sharding import Mesh
    from astrild_tpu.ops import tpcf as tpcf_ops
    from astrild_tpu.parallel.tpcf import make_distributed_tpcf_s_mu

    mesh3 = Mesh(np.array(jax.devices()[:3]).reshape(3, 1, 1),
                 ("sim", "x", "y"))
    n = 768  # 256 per shard
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    s_edges = jnp.linspace(1.0, 40.0, 9)
    _, _, want = tpcf_ops.tpcf_s_mu(jnp.asarray(pos), BOX, s_edges,
                                    nmu=10, block=128)
    f = make_distributed_tpcf_s_mu(mesh3, BOX, s_edges, nmu=10,
                                   axis="sim", block=128)
    sh = NamedSharding(mesh3, P("sim"))
    comps = tuple(jax.device_put(jnp.asarray(pos[:, i]), sh)
                  for i in range(3))
    _, _, got = f(comps)
    npt.assert_array_equal(np.asarray(got), np.asarray(want))

    # passing a mask to a maskless factory must raise, not silently drop
    with pytest.raises(ValueError, match="valid mask"):
        f(comps, jnp.ones((n,), jnp.float32))


def test_distributed_tpcf_halfbox_guard(mesh22):
    from astrild_tpu.parallel.tpcf import make_distributed_tpcf_s_mu

    with pytest.raises(ValueError, match="boxsize/2"):
        make_distributed_tpcf_s_mu(mesh22, BOX,
                                   jnp.linspace(1.0, BOX, 9))


@pytest.mark.slow
def test_skyhealpix_anafast_mesh_dispatch(mesh22):
    """SkyHealpix.anafast(mesh=...) routes through the m-sharded scan
    path and caches the jitted factory."""
    from astrild_tpu.models import SkyHealpix

    nside, lmax = 16, 31
    cl = np.zeros(lmax + 1)
    cl[2:] = 1.0 / np.arange(2, lmax + 1) ** 2
    sky = SkyHealpix.from_Cl_array(cl, "kappa_2", nside, lmax=lmax,
                                   rnd_seed=1)
    want = sky.anafast(lmax, niter=2)
    got = sky.anafast(lmax, niter=2, mesh=mesh22)
    npt.assert_allclose(got, want, atol=1e-7)
    sky.anafast(lmax, niter=2, mesh=mesh22)
    assert len(sky._dist_sht) == 1  # factory reused

    # spin-2 facade: shear via the m-sharded paths == local
    g1w, g2w = sky.shear_from_kappa(lmax=lmax, niter=2)
    g1d, g2d = sky.shear_from_kappa(lmax=lmax, niter=2, mesh=mesh22)
    scale = float(np.std(g1w))
    npt.assert_allclose(g1d, g1w, atol=1e-5 * max(scale, 1e-6))
    npt.assert_allclose(g2d, g2w, atol=1e-5 * max(scale, 1e-6))

    # a mesh without the shard axis fails with a clear error, a size-1
    # axis warns (replicated, no speedup); the cache is class-level
    from jax.sharding import Mesh
    bad = Mesh(np.array(jax.devices()).reshape(8), ("rings",))
    with pytest.raises(ValueError, match="no axis 'x'"):
        sky.anafast(lmax, mesh=bad)
    m1 = Mesh(np.array(jax.devices()).reshape(8, 1, 1),
              ("sim", "x", "y"))
    with pytest.warns(UserWarning, match="no speedup"):
        sky.anafast(lmax, niter=0, mesh=m1)
    sky_b = SkyHealpix.from_Cl_array(cl, "kappa_2", nside, lmax=lmax,
                                     rnd_seed=2)
    n_cached = len(SkyHealpix._dist_sht)
    with pytest.warns(UserWarning, match="no speedup"):
        sky_b.anafast(lmax, niter=0, mesh=m1)
    assert len(SkyHealpix._dist_sht) == n_cached  # shared across maps


def test_distributed_sht_large_rejects_bad_method(mesh22):
    from astrild_tpu.parallel.sht_large import make_distributed_sht_large

    _, analyze = make_distributed_sht_large(mesh22, 16, 31)
    with pytest.raises(ValueError, match="method"):
        analyze(np.zeros(12 * 16 * 16, np.float32), method="jacobi3")


@pytest.mark.slow
def test_painter_in_shard_map_matches_local(mesh22, rng):
    """The multi-offset CIC/TSC painter composes with shard_map: each
    device paints its particle shard onto a full local grid (interpret
    mode on the CPU mesh; the TPU path is the same program) and the
    psum of the shards equals the single-device paint."""
    from astrild_tpu.ops.paint_pallas import paint_windowed
    shard_map = jax.shard_map

    n_part = 4096
    pos = rng.uniform(0, BOX, (n_part, 3)).astype(np.float32)
    pf = np.concatenate([pos[:, 0], pos[:, 1], pos[:, 2]])

    for order in (2, 3):
        want = np.asarray(paint_windowed(jnp.asarray(pf), None, NG, BOX,
                                         order=order, window=1024,
                                         interpret=True))

        def body(pflat):
            n = pflat.shape[0] // 3
            g = paint_windowed(pflat, None, NG, BOX, order=order,
                               window=1024, interpret=True)
            return jax.lax.psum(g, ("sim", "x", "y"))

        axes = ("sim", "x", "y")
        # check_vma=False: pallas's interpret-mode block extraction mixes
        # unvarying grid-loop indices with varying operands in its own
        # dynamic_slice (jax suggests this workaround); the compiled TPU
        # path does not go through the HLO interpreter
        fn = shard_map(body, mesh=mesh22,
                       in_specs=P(axes),
                       out_specs=P(), check_vma=False)
        # shard particles: reshape (3, n) so each component shards evenly
        pf3 = jnp.asarray(pf).reshape(3, n_part)
        # interleave per-device chunks: components stay contiguous per
        # device by sharding the flat buffer in 8 equal slices of each
        # component stacked — build per-device flat buffers explicitly
        nd = 8
        chunks = []
        for d in range(nd):
            sl = slice(d * n_part // nd, (d + 1) * n_part // nd)
            chunks.append(np.concatenate([pos[sl, 0], pos[sl, 1],
                                          pos[sl, 2]]))
        flat_sh = jnp.asarray(np.concatenate(chunks))
        spec = NamedSharding(mesh22, P(axes))
        flat_sh = jax.device_put(flat_sh, spec)
        got = np.asarray(fn(flat_sh))
        npt.assert_allclose(got, want, atol=2e-5 * max(1.0, want.max()))


def test_distributed_multipoles_match_local(mesh22, rng):
    """Distributed RSD multipoles == local auto_power_multipoles on the
    same anisotropic (redshift-space) point set."""
    from astrild_tpu.ops import mocks, tpcf
    from astrild_tpu.parallel.power import make_distributed_multipoles

    pk = lambda k: 5e3 * jnp.exp(-((k / 0.1) ** 2))
    pos, vel = mocks.zeldovich_catalog_with_velocities(
        jax.random.PRNGKey(2), 16, BOX, pk, 0.5)
    pos_s = tpcf.to_redshift_space(pos, vel, BOX)
    n_part = pos_s.shape[0]
    nbins = 6
    g = paint_ops.paint(pos_s, NG, BOX, window="cic")
    ref = power_ops.auto_power_multipoles(
        g, BOX, nbins=nbins, window="cic",
        shotnoise=BOX ** 3 / n_part)
    dfn = make_distributed_multipoles(mesh22, NG, BOX, nbins,
                                      window="cic")
    spec = NamedSharding(mesh22, P(("sim", "x", "y"), None))
    pos_sh = jax.device_put(pos_s, spec)
    w_sh = jax.device_put(jnp.ones((n_part,), jnp.float32),
                          NamedSharding(mesh22, P(("sim", "x", "y"))))
    got = dfn(pos_sh, w_sh)
    npt.assert_allclose(np.asarray(got.nmodes), np.asarray(ref.nmodes))
    npt.assert_allclose(np.asarray(got.k), np.asarray(ref.k), rtol=1e-5)
    for i in range(3):
        npt.assert_allclose(np.asarray(got.p_ell[i]),
                            np.asarray(ref.p_ell[i]), rtol=5e-3,
                            atol=2e-3 * BOX ** 3 / n_part)
    # quadrupole actually nonzero (anisotropic input)
    assert np.abs(np.asarray(got.p_ell[1][:3])).max() > 0.05 * np.abs(
        np.asarray(got.p_ell[0][:3])).max()


def test_distributed_factories_default_weights(mesh22, rng):
    """The documented fn(pos, weights=None) contract holds for every
    factory (single-argument calls build unit weights internally)."""
    from astrild_tpu.parallel.power import (make_distributed_auto_power,
                                            make_distributed_multipoles)

    n_part = 4096
    pos = jnp.asarray(rng.uniform(0, BOX, (n_part, 3)).astype(np.float32))
    spec = NamedSharding(mesh22, P(("sim", "x", "y"), None))
    pos_sh = jax.device_put(pos, spec)
    fn = make_distributed_auto_power(mesh22, NG, BOX, 6, window="cic")
    res1 = fn(pos_sh)
    w = jax.device_put(jnp.ones((n_part,), jnp.float32),
                       NamedSharding(mesh22, P(("sim", "x", "y"))))
    res2 = fn(pos_sh, w)
    npt.assert_allclose(np.asarray(res1.power), np.asarray(res2.power),
                        rtol=1e-6)
    mfn = make_distributed_multipoles(mesh22, NG, BOX, 6, window="cic")
    mres = mfn(pos_sh)
    assert np.all(np.isfinite(np.asarray(mres.p_ell)))


@pytest.mark.slow
def test_distributed_healpix_shells_matches_local(mesh22, rng):
    """Particle-sharded full-sky lightcone shells == single-device
    builder (both deposit paths), incl. the multihost valid mask."""
    from astrild_tpu.ops import lightcone_sphere as lcs
    from astrild_tpu.parallel.lensing import make_distributed_healpix_shells

    n = 4096
    nside = 8
    edges = np.array([20.0, 60.0, 110.0, 170.0])  # needs replication
    pos = tuple(jnp.asarray(rng.uniform(0, BOX, n), jnp.float32)
                for _ in range(3))
    want, _, _ = lcs.density_shells_healpix(pos, edges, nside, BOX)
    sh = NamedSharding(mesh22, P("sim"))
    posd = tuple(jax.device_put(c, sh) for c in pos)
    for dep in ("scatter", "pallas"):
        f = make_distributed_healpix_shells(mesh22, edges, nside, BOX,
                                            axis="sim", deposit=dep)
        got = f(posd)
        npt.assert_allclose(np.asarray(got), np.asarray(want),
                            atol=1e-3 * float(np.std(np.asarray(want))))

    # padded rows masked out: must match the compacted catalog
    valid = np.ones(n, np.float32)
    valid[500:1500] = 0.0
    pos_m = tuple(np.where(valid > 0, np.asarray(c), 0.0
                           ).astype(np.float32) for c in pos)
    real = tuple(jnp.asarray(np.asarray(c)[valid > 0]) for c in pos)
    want_m, _, _ = lcs.density_shells_healpix(real, edges, nside, BOX)
    fm = make_distributed_healpix_shells(mesh22, edges, nside, BOX,
                                         axis="sim",
                                         with_valid_mask=True,
                                         deposit="scatter")
    pm = tuple(jax.device_put(jnp.asarray(c), sh) for c in pos_m)
    vm = jax.device_put(jnp.asarray(valid), sh)
    got_m = fm(pm, vm)
    npt.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                        rtol=1e-3, atol=1e-5)


def test_distributed_sht_spin1_large_matches_local(mesh22, rng):
    """m-sharded spin-1 scan path == single-device ops.sht_spin_large
    (same spin-generic factory as the spin-2 path)."""
    from astrild_tpu.ops import sht_spin_large as ssl
    from astrild_tpu.parallel.sht_large import (
        make_distributed_sht_spin1_large)

    nside, lmax = 16, 31
    lg = np.arange(lmax + 1)[:, None]
    mg = np.arange(lmax + 1)[None, :]
    valid = ((mg <= lg) & (lg >= 1)).astype(np.float32)
    alms = [rng.standard_normal((lmax + 1, lmax + 1)
                                ).astype(np.float32) * valid * 0.1
            for _ in range(4)]
    alms[1][:, 0] = 0.0
    alms[3][:, 0] = 0.0
    atw, apw = ssl.synthesize_spin1_large(*alms, nside, lmax)
    synth, analyze = make_distributed_sht_spin1_large(mesh22, nside,
                                                      lmax)
    atd, apd = synth(*alms)
    scale = float(jnp.std(atw))
    npt.assert_allclose(np.asarray(atd), np.asarray(atw),
                        atol=2e-6 * scale)
    npt.assert_allclose(np.asarray(apd), np.asarray(apw),
                        atol=2e-6 * scale)
    want = ssl.analyze_spin1_large(atw, apw, nside, lmax, niter=2,
                                   method="jacobi")
    got = analyze(atd, apd, niter=2, method="jacobi")
    for g, w in zip(got, want):
        npt.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-6)


def test_distributed_ksz_matches_local(rng):
    from astrild_tpu.ops import pairwise as PW
    from astrild_tpu.parallel.pairwise import make_distributed_ksz

    mesh = make_mesh(n_sim=4, n_x=1, n_y=1)
    n = 1024
    pos = (rng.uniform(-60, 60, (n, 3)) + np.array([0, 0, 900.0])
           ).astype(np.float32)
    dT = rng.normal(0, 1, n).astype(np.float32)
    nbins, binw = 12, 12.0
    fn = make_distributed_ksz(mesh, nbins, binw, axis="sim", block=256)
    pos_sh = jax.device_put(jnp.asarray(pos),
                            NamedSharding(mesh, P("sim", None)))
    dT_sh = jax.device_put(jnp.asarray(dT), NamedSharding(mesh, P("sim")))
    nom_d, den_d = fn(pos_sh, dT_sh)
    bins = jnp.asarray(np.arange(nbins, dtype=np.float64) * binw)
    rsep, p_local = PW.pairwise_ksz_momentum(jnp.asarray(pos),
                                             jnp.asarray(dT), bins)
    p_d = np.asarray(nom_d) / np.maximum(np.asarray(den_d), 1e-30)
    good = np.isfinite(np.asarray(p_local))
    npt.assert_allclose(p_d[good], np.asarray(p_local)[good],
                        rtol=2e-3, atol=1e-4)


def test_distributed_projected_tpcf_matches_local(rng):
    from astrild_tpu.ops import tpcf as T
    from astrild_tpu.parallel.tpcf import make_distributed_projected_tpcf

    mesh = make_mesh(n_sim=4, n_x=1, n_y=1)
    n, L = 1024, 150.0
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    # add some clustered companions so wp is nonzero
    pos[: n // 4] = (pos[n // 4: n // 2]
                     + rng.normal(0, 3.0, (n // 4, 3))) % L
    rp_edges = jnp.linspace(2.0, 30.0, 6)
    pi_max, n_pi = 40.0, 10
    fn = make_distributed_projected_tpcf(mesh, L, rp_edges, pi_max,
                                         n_pi=n_pi, block=256)
    comps = tuple(jax.device_put(jnp.asarray(pos[:, i]),
                                 NamedSharding(mesh, P("sim")))
                  for i in range(3))
    rp_d, wp_d, xi_d = fn(comps)
    rp_l, wp_l, xi_l = T.projected_tpcf(jnp.asarray(pos), L, rp_edges,
                                        pi_max, n_pi=n_pi)
    npt.assert_allclose(np.asarray(xi_d), np.asarray(xi_l), rtol=1e-5,
                        atol=1e-5)
    npt.assert_allclose(np.asarray(wp_d), np.asarray(wp_l), rtol=1e-5,
                        atol=1e-5)


def test_distributed_shear_xi_matches_local(rng):
    from astrild_tpu.ops.shear_2pt import xi_pm_catalog
    from astrild_tpu.parallel.tpcf import make_distributed_shear_xi

    mesh = make_mesh(n_sim=8, n_x=1, n_y=1)
    n = 2048
    x = rng.uniform(0, 100, n).astype(np.float32)
    y = rng.uniform(0, 100, n).astype(np.float32)
    e1 = rng.normal(0, 0.2, n).astype(np.float32)
    e2 = rng.normal(0, 0.2, n).astype(np.float32)
    w = rng.uniform(0.5, 2.0, n).astype(np.float32)
    edges = np.geomspace(2.0, 40.0, 9)
    fn = make_distributed_shear_xi(mesh, edges, block=128)
    sh = NamedSharding(mesh, P("sim"))
    args = [jax.device_put(jnp.asarray(v), sh) for v in (x, y, e1, e2, w)]
    xp_d, xm_d, c_d = fn(*args[:4], weights=args[4])
    xp_l, xm_l, c_l = xi_pm_catalog(x, y, e1, e2, edges, weights=w,
                                    block=128)
    npt.assert_allclose(np.asarray(c_d), np.asarray(c_l))
    npt.assert_allclose(np.asarray(xp_d), np.asarray(xp_l), atol=1e-6)
    npt.assert_allclose(np.asarray(xm_d), np.asarray(xm_l), atol=1e-6)
