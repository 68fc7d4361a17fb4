"""Painting + P(k) estimator tests: analytic anchors, not goldens."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import paint as P
from astrild_tpu.ops import power as PS

BOX = 100.0
NG = 16


def lattice_positions(n, box):
    """Particles exactly at CIC cell centers."""
    x = (np.arange(n) + 0.5) * box / n
    g = np.stack(np.meshgrid(x, x, x, indexing="ij"), axis=-1)
    return jnp.asarray(g.reshape(-1, 3))


@pytest.mark.parametrize("window", ["ngp", "cic", "tsc"])
def test_mass_conservation(window, rng):
    pos = jnp.asarray(rng.uniform(0, BOX, (1000, 3)))
    g = P.paint(pos, NG, BOX, window=window)
    npt.assert_allclose(float(jnp.sum(g)), 1000.0, rtol=1e-5)


@pytest.mark.parametrize("window", ["ngp", "cic", "tsc"])
def test_weighted_mass_conservation(window, rng):
    pos = jnp.asarray(rng.uniform(0, BOX, (500, 3)))
    w = jnp.asarray(rng.uniform(0.5, 2.0, (500,)).astype(np.float32))
    g = P.paint(pos, NG, BOX, weights=w, window=window)
    npt.assert_allclose(float(jnp.sum(g)), float(jnp.sum(w)), rtol=1e-5)


def test_cic_lattice_uniform():
    # particles at cell centers -> exactly 1 per cell under CIC
    pos = lattice_positions(NG, BOX)
    g = P.paint(pos, NG, BOX, window="cic")
    npt.assert_allclose(np.asarray(g), np.ones((NG, NG, NG)), atol=1e-5)


def test_tsc_lattice_uniform():
    pos = lattice_positions(NG, BOX)
    g = P.paint(pos, NG, BOX, window="tsc")
    npt.assert_allclose(np.asarray(g), np.ones((NG, NG, NG)), atol=1e-5)


def test_cic_single_particle_weights():
    # particle 1/4 cell off a cell center along x splits 0.75/0.25
    cell = BOX / NG
    pos = jnp.array([[0.5 * cell + 0.25 * cell, 0.5 * cell, 0.5 * cell]])
    g = np.asarray(P.paint(pos, NG, BOX, window="cic"))
    npt.assert_allclose(g[0, 0, 0], 0.75, rtol=1e-5)
    npt.assert_allclose(g[1, 0, 0], 0.25, rtol=1e-5)


def test_periodic_wrap():
    # particle at the upper box edge must wrap to cell 0 side
    pos = jnp.array([[BOX - 1e-4, BOX - 1e-4, BOX - 1e-4]])
    g = np.asarray(P.paint(pos, NG, BOX, window="cic"))
    npt.assert_allclose(g.sum(), 1.0, rtol=1e-5)
    # nearly all weight at corner cell (n-1,n-1,n-1) corner region incl wrap
    assert g[NG - 1, NG - 1, NG - 1] > 0.12  # (~1/8 at exact corner)


def test_compensation_kernel_values():
    ck = np.asarray(P.compensation_kernel(NG, "cic"))
    npt.assert_allclose(ck[0, 0, 0], 1.0, rtol=1e-6)
    # Nyquist along z: 1/sinc(1/2)^2 = (pi/2)^2
    npt.assert_allclose(ck[0, 0, NG // 2], (np.pi / 2) ** 2, rtol=1e-5)


def test_single_mode_power():
    # grid = 1 + A cos(kf x): the two +-kf modes carry |delta_k|^2 = A^2/4
    # each, so the total weighted power in the bin containing kf must be
    # 2 * (A^2/4) * V = A^2 V / 2; every other mode contributes nothing.
    A = 0.1
    x = (jnp.arange(NG) + 0.5) * BOX / NG
    grid = 1.0 + A * jnp.cos(2 * jnp.pi * x / BOX)[:, None, None]
    grid = grid * jnp.ones((NG, NG, NG))
    res = PS.auto_power(grid, BOX, nbins=NG // 2)
    kf = 2 * np.pi / BOX
    # kf lands in the first bin
    total_first = float(res.power[0] * res.nmodes[0])
    npt.assert_allclose(total_first, A ** 2 * BOX ** 3 / 2.0, rtol=1e-4)
    # all other bins ~ 0
    npt.assert_allclose(np.asarray(res.power[1:]), 0.0, atol=1e-6 * BOX ** 3)
    # mean k of first bin is pulled toward kf-shell k values
    assert float(res.k[0]) < 2 * kf


def test_poisson_shot_noise(rng):
    n_part = 40000
    pos = jnp.asarray(rng.uniform(0, BOX, (n_part, 3)))
    g = P.paint(pos, NG, BOX, window="cic")
    res = PS.auto_power(g, BOX, nbins=6, window="cic")
    sn = BOX ** 3 / n_part
    # Poisson: P(k) ~ shot noise (stat scatter); skip the Nyquist bin where
    # compensated CIC aliasing inflates the estimate (known estimator
    # property, not a bug)
    pk = np.asarray(res.power)
    npt.assert_allclose(pk[:-1], sn, rtol=0.25)
    assert np.all(np.isfinite(pk))


def test_cross_power_equals_auto(rng):
    pos = jnp.asarray(rng.uniform(0, BOX, (5000, 3)))
    g = P.paint(pos, NG, BOX, window="cic")
    auto = PS.auto_power(g, BOX, nbins=8, window="cic")
    cross = PS.cross_power(g, g, BOX, nbins=8, window="cic")
    npt.assert_allclose(np.asarray(cross.power), np.asarray(auto.power), rtol=1e-5)


def test_interlacing_runs(rng):
    pos = jnp.asarray(rng.uniform(0, BOX, (2000, 3)))
    g, g2 = P.paint(pos, NG, BOX, window="tsc", interlaced=True)
    res = PS.auto_power(g, BOX, nbins=6, window="tsc", grid_shifted=g2,
                        interlaced=True)
    assert np.all(np.isfinite(np.asarray(res.power)))


def test_paint_vmap_over_sims(rng):
    pos = jnp.asarray(rng.uniform(0, BOX, (4, 800, 3)))
    paint_b = jax.vmap(lambda p: P.paint(p, NG, BOX, window="cic"))
    grids = paint_b(pos)
    assert grids.shape == (4, NG, NG, NG)
    npt.assert_allclose(np.asarray(jnp.sum(grids, axis=(1, 2, 3))), 800.0, rtol=1e-5)


def test_fast_power_matches_tsc(rng):
    """auto_power_fast (fine NGP + deconvolution) agrees with the TSC
    estimator on clustered data over the reported k-range."""
    box = 100.0
    centers = rng.uniform(0, box, (50, 3))
    pts = (centers[:, None, :] + rng.normal(0, 2.0, (50, 400, 3)))
    pos = jnp.asarray(np.mod(pts.reshape(-1, 3), box).astype(np.float32))
    n_part = pos.shape[0]
    g = P.paint(pos, 32, box, window="tsc")
    ref = PS.auto_power(g, box, nbins=12, window="tsc",
                        shotnoise=box ** 3 / n_part)
    fast = PS.auto_power_fast(pos, 32, box, nbins=12, fine_factor=2)
    # clustered signal >> shot noise at low k; agree to a few percent
    r = np.asarray(ref.power)
    f = np.asarray(fast.power)
    npt.assert_allclose(f[:8], r[:8], rtol=0.05)


def test_pallas_deposit_matches_scatter(rng):
    """The sorted Pallas deposit path of auto_power_fast is numerically
    equivalent to the XLA scatter path (interpret mode on CPU)."""
    import astrild_tpu.ops.power as PS

    box = 100.0
    pos = jnp.asarray(rng.uniform(0, box, (30000, 3)), jnp.float32)
    a = PS.auto_power_fast(pos, 16, box, nbins=6, deposit="scatter")
    b = PS.auto_power_fast(pos, 16, box, nbins=6,
                           deposit="pallas_interpret")
    npt.assert_allclose(np.asarray(b.power), np.asarray(a.power),
                        rtol=1e-5)
    w = jnp.asarray(rng.uniform(0.5, 2.0, 30000), jnp.float32)
    aw = PS.auto_power_fast(pos, 16, box, nbins=6, weights=w,
                            deposit="scatter")
    bw = PS.auto_power_fast(pos, 16, box, nbins=6, weights=w,
                            deposit="pallas_interpret")
    npt.assert_allclose(np.asarray(bw.power), np.asarray(aw.power),
                        rtol=1e-4)


def test_pallas_deposit_flat_correctness(rng):
    from astrild_tpu.ops.paint_pallas import deposit_flat

    n_cells = 128 * 256
    flat = jnp.asarray(rng.integers(0, n_cells, 100000), jnp.int32)
    w = jnp.asarray(rng.normal(1, 0.2, 100000), jnp.float32)
    ref = np.zeros(n_cells, np.float32)
    np.add.at(ref, np.asarray(flat), np.asarray(w))
    got = deposit_flat(flat, w, n_cells, window=8192)
    npt.assert_allclose(np.asarray(got), ref, atol=2e-5 * np.abs(ref).max())
    refc = np.bincount(np.asarray(flat), minlength=n_cells)
    gotc = deposit_flat(flat, None, n_cells, window=8192)
    npt.assert_array_equal(np.asarray(gotc), refc.astype(np.float32))
    # chunk_rows only changes the DMA tiling, never the result
    gotc2 = deposit_flat(flat, None, n_cells, window=4096, chunk_rows=32)
    npt.assert_array_equal(np.asarray(gotc2), refc.astype(np.float32))


def test_fast_power_weighted_shotnoise(rng):
    """auto_power_fast subtracts V*sum(w^2)/(sum w)^2 — for weighted
    Poisson tracers the residual must vanish like the unweighted case
    (subtracting V/N leaves a 12% * shot residual for w ~ U(0.5, 2))."""
    import astrild_tpu.ops.power as PS

    box = 100.0
    n = 200000
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    res = PS.auto_power_fast(pos, 32, box, nbins=12, weights=w)
    shot_w = box ** 3 * float(jnp.sum(w * w)) / float(jnp.sum(w)) ** 2
    resid = np.asarray(res.power)[2:10] / shot_w
    assert np.abs(np.mean(resid)) < 0.05, resid
    # matches the distributed convention (parallel/power._weighted_shotnoise)
    resu = PS.auto_power_fast(pos, 32, box, nbins=12)
    residu = np.asarray(resu.power)[2:10] / (box ** 3 / n)
    assert np.abs(np.mean(residu)) < 0.05, residu


def test_pallas_deposit_segmented_correctness(rng):
    """Segment-sorted (window, segment) deposit == bincount exactly for
    counts, ~f32 for weights — for random, coherent and adversarial
    (all-one-cell) key orders."""
    from astrild_tpu.ops.paint_pallas import deposit_flat_segmented

    n_cells = 128 * 256
    n = 100000
    orders = {
        "random": rng.integers(0, n_cells, n),
        "coherent": np.sort(rng.integers(0, n_cells, n)),
        "clustered": np.full(n, 7, dtype=np.int64),
    }
    for name, keys in orders.items():
        flat = jnp.asarray(keys, jnp.int32)
        refc = np.bincount(keys, minlength=n_cells).astype(np.float32)
        gotc = deposit_flat_segmented(flat, None, n_cells, n_seg=8,
                                      window=4096, chunk_rows=4)
        npt.assert_array_equal(np.asarray(gotc), refc, err_msg=name)
        w = jnp.asarray(rng.normal(1, 0.2, n), jnp.float32)
        ref = np.zeros(n_cells, np.float32)
        np.add.at(ref, keys, np.asarray(w))
        got = deposit_flat_segmented(flat, w, n_cells, n_seg=8,
                                     window=4096, chunk_rows=4)
        npt.assert_allclose(np.asarray(got), ref,
                            atol=2e-5 * np.abs(ref).max(), err_msg=name)


def test_seg_param_auto_fit():
    """Bench-scale (2^27 cells) parameters previously overflowed the
    kernel's SMEM scalar-prefetch budget (2 MB of (nw*n_seg,) int32 vs
    the 1 MB limit); the fit must keep nw*n_seg <= 2^16 while preserving
    divisibility, and leave small configs untouched."""
    from astrild_tpu.ops.paint_pallas import _fit_seg_params

    # segments shed first (kernel cost is ~linear in window rows)
    assert _fit_seg_params(2 ** 27, 16384, 64) == (16384, 8)
    assert _fit_seg_params(128 * 256, 4096, 8) == (4096, 8)
    assert _fit_seg_params(2 ** 30, 16384, 64) == (16384, 1)
    # window widens only once segments are exhausted
    w2, s2 = _fit_seg_params(2 ** 31, 16384, 4)
    assert s2 == 1 and (2 ** 31 // w2) * s2 <= 65536 and w2 == 32768
    # odd window-count grids with no headroom raise instead of failing
    # AOT with an opaque SMEM error
    with pytest.raises(ValueError):
        _fit_seg_params(16384 * 69999, 16384, 1)

    from astrild_tpu.ops.paint_pallas import _fit_paint_window

    # paint splits the OFFSET axis across pallas_calls, so the window
    # only widens once the window count ALONE busts the cap (> ~2^30
    # cells); the north-star 512^3 grid keeps the tuned window
    assert _fit_paint_window(514 ** 3, 16384) == 16384
    assert _fit_paint_window(1026 ** 3, 16384) == 32768


@pytest.mark.slow
def test_paint_windowed_offset_split(rng, monkeypatch):
    """TSC at ngrid >= ~430 used to exceed the 131072-program Mosaic
    crash line and the SMEM budget (27 * nw scalar-prefetch pairs in one
    pallas_call). The offset axis now splits across calls; shrinking the
    cap forces multi-call grouping on a test-size grid and the deposit
    must stay exact."""
    import astrild_tpu.ops.paint_pallas as PP
    from astrild_tpu.ops import paint as P

    n, ngrid, box = 20000, 9, 50.0
    pos = jnp.asarray(rng.uniform(0, box, (3 * n,)), jnp.float32)
    want = np.asarray(P.paint((pos[:n], pos[n:2 * n], pos[2 * n:]),
                              ngrid, box, window="tsc"))
    # npd=11 -> nw=ceil(11^3/128)=11 pairs/offset; cap 32 -> group=2,
    # 14 pallas_calls instead of 1
    monkeypatch.setattr(PP, "_MAX_PREFETCH_PAIRS", 32)
    got = PP.paint_windowed(pos, None, ngrid, box, order=3, window=128,
                            chunk_rows=2)
    npt.assert_allclose(np.asarray(got), want, rtol=2e-4,
                        atol=2e-4 * want.max())


def test_pallas_seg_deposit_in_auto_power(rng):
    """deposit='pallas_seg' gives the same P(k) as the scatter path."""
    import astrild_tpu.ops.power as PS

    box = 100.0
    pos = jnp.asarray(rng.uniform(0, box, (30000, 3)), jnp.float32)
    a = PS.auto_power_fast(pos, 16, box, nbins=6, deposit="scatter")
    b = PS.auto_power_fast(pos, 16, box, nbins=6,
                           deposit="pallas_seg_interpret")
    npt.assert_allclose(np.asarray(b.power), np.asarray(a.power),
                        rtol=1e-5)


def test_pallas_seg_deposit_probe():
    from astrild_tpu.ops.paint_pallas import pallas_seg_deposit_available

    assert pallas_seg_deposit_available() in (True, False)
    assert (pallas_seg_deposit_available()
            is pallas_seg_deposit_available())


@pytest.mark.slow
def test_pallas_paint_windowed_matches_scatter(rng):
    from astrild_tpu.ops import paint as P
    from astrild_tpu.ops.paint_pallas import paint_windowed

    n, ng, box = 30000, 16, 50.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    pf = jnp.concatenate([pos[:, 0], pos[:, 1], pos[:, 2]])
    for order, ref_fn in ((2, P.paint_cic), (3, P.paint_tsc)):
        ref = np.asarray(ref_fn(pos, ng, box))
        got = np.asarray(paint_windowed(pf, None, ng, box, order=order,
                                        window=1024))
        npt.assert_allclose(got, ref, atol=2e-5 * max(1.0, ref.max()))
        npt.assert_allclose(got.sum(), n, rtol=1e-5)
        refw = np.asarray(ref_fn(pos, ng, box, weights=w))
        gotw = np.asarray(paint_windowed(pf, w, ng, box, order=order,
                                         window=1024, chunk_rows=8))
        npt.assert_allclose(gotw, refw, atol=2e-5 * max(1.0, refw.max()))


def test_paint_deposit_dispatch(rng):
    # the public paint() must give identical physics through either path
    from astrild_tpu.ops import paint as P

    n, ng, box = 5000, 8, 25.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    a = np.asarray(P.paint(pos, ng, box, window="tsc", deposit="scatter"))
    b = np.asarray(P.paint(pos, ng, box, window="tsc",
                           deposit="pallas_interpret"))
    npt.assert_allclose(b, a, atol=2e-5 * a.max())
    ga, ga2 = P.paint(pos, ng, box, window="cic", interlaced=True,
                      deposit="pallas_interpret")
    ra, ra2 = P.paint(pos, ng, box, window="cic", interlaced=True,
                      deposit="scatter")
    npt.assert_allclose(np.asarray(ga), np.asarray(ra), atol=2e-4)
    npt.assert_allclose(np.asarray(ga2), np.asarray(ra2), atol=2e-4)


def test_pallas_deposit_probe():
    # the probe must never raise — it reports False on lowering failures
    # (libtpu Mosaic regressions) so auto-selection degrades to scatter
    from astrild_tpu.ops.paint_pallas import pallas_deposit_available

    assert pallas_deposit_available() in (True, False)
    assert pallas_deposit_available() is pallas_deposit_available()


def test_probes_true_inside_jit_trace():
    """Auto-selection consults the probes at TRACE time of the caller's
    jit. A probe that traces its kernel into the caller (instead of
    executing eagerly) raises on float() and reports False, silently
    degrading pipelines to the scatter path (bench r2 regression)."""
    from astrild_tpu.ops import paint_pallas as pp

    pp.pallas_deposit_available.cache_clear()
    pp.pallas_paint_available.cache_clear()
    seen = {}

    @jax.jit
    def f(x):
        seen["deposit"] = pp.pallas_deposit_available()
        seen["paint"] = pp.pallas_paint_available()
        return x + 1.0

    f(jnp.zeros(4))
    assert seen["deposit"] is True
    assert seen["paint"] is True
    # and the cached values remain True outside the trace
    assert pp.pallas_deposit_available() is True
    assert pp.pallas_paint_available() is True


def test_pallas_painter_periodic_wrap(rng):
    """paint.py promises ALL painters are periodic: out-of-box positions
    must deposit identically through the Pallas painter and the scatter
    painters (the painter previously clipped/miskeyed them)."""
    from astrild_tpu.ops import paint as P
    from astrild_tpu.ops.paint_pallas import paint_windowed

    n, ng, box = 4096, 16, 50.0
    base = rng.uniform(0, box, (n, 3)).astype(np.float32)
    # shift a third below 0, a third above box, keep edge values too
    pos = base.copy()
    pos[:n // 3] -= box
    pos[n // 3: 2 * n // 3] += box
    pos[0] = [0.0, box, -0.0]
    pf = np.concatenate([pos[:, 0], pos[:, 1], pos[:, 2]])
    for order, ref_fn in ((2, P.paint_cic), (3, P.paint_tsc)):
        ref = np.asarray(ref_fn(jnp.asarray(pos), ng, box))
        got = np.asarray(paint_windowed(jnp.asarray(pf), None, ng, box,
                                        order=order, window=1024))
        npt.assert_allclose(got, ref, atol=3e-5 * max(1.0, ref.max()))
        npt.assert_allclose(got.sum(), n, rtol=1e-5)  # no mass loss


def test_paint_ngp_pallas_dispatch(rng):
    """An explicit deposit='pallas' with window='ngp' must run the sorted
    flat deposit (previously it silently fell back to the scatter)."""
    from astrild_tpu.ops import paint as P

    n, box = 3000, 25.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    for ng in (8, 10):  # 10^3 = 1000 cells exercises the non-128 padding
        a = np.asarray(P.paint(pos, ng, box, window="ngp",
                               deposit="scatter"))
        b = np.asarray(P.paint(pos, ng, box, window="ngp",
                               deposit="pallas_interpret"))
        npt.assert_allclose(b, a, atol=1e-5)
        aw = np.asarray(P.paint(pos, ng, box, weights=w, window="ngp",
                                deposit="scatter"))
        bw = np.asarray(P.paint(pos, ng, box, weights=w, window="ngp",
                                deposit="pallas_interpret"))
        npt.assert_allclose(bw, aw, atol=1e-4)


def test_auto_deposit_params_measured_regimes():
    """Density-adaptive (window, chunk_rows) reproduces the measured-best
    choice in every calibrated regime (r4 chip sweep, paint_pallas
    _auto_deposit_params docstring)."""
    from astrild_tpu.ops.paint_pallas import _auto_deposit_params

    # sparse TSC 4.2M -> 512^3 padded grid: widen + small chunks
    assert _auto_deposit_params(4_194_304, 514 ** 3,
                                kind="paint") == (65536, 16)
    # mid 33.6M -> 512^3: default window, small chunks
    assert _auto_deposit_params(33_554_432, 514 ** 3,
                                kind="paint") == (16384, 16)
    # dense TSC 16.8M -> 256^3 paint: defaults untouched (r5 re-sweep:
    # 1235/1289/1335 ms at chunks 64/32/24 — the multi-offset ranges
    # are 27x shorter than the flat deposit's)
    assert _auto_deposit_params(16_777_216, 258 ** 3,
                                kind="paint") == (16384, 64)
    # bench NGP 134M -> 2^27 flat deposit: r5 dense-flat optimum
    # (155 vs 182 ms counts, 252 vs 290 ms weighted)
    assert _auto_deposit_params(512 ** 3, 2 ** 27,
                                must_divide=2 ** 27) == (8192, 24)
    # sparse NGP 4.2M -> 2^27 with divisibility honored
    w, p1 = _auto_deposit_params(4_194_304, 2 ** 27, must_divide=2 ** 27)
    assert (w, p1) == (65536, 16) and 2 ** 27 % w == 0
    # a must_divide without power-of-two headroom blocks widening
    # (n small enough that the widening loop WANTS to widen, and the
    # flat-dense 8192 branch does not trigger)
    w2, _ = _auto_deposit_params(1000, 3 * 16384,
                                 must_divide=3 * 16384)
    assert w2 == 16384
    # explicit values always win
    assert _auto_deposit_params(1, 10 ** 9, window=8192,
                                chunk_rows=32) == (8192, 32)
