"""PM N-body + 2LPT tests.

Validation strategy mirrors the suite's same-realization principle:
growth is measured as a per-mode ratio of the SAME realization (no
sample variance), and the 2LPT second-order kernel is pinned by the
exact F2(mu=0) = 5/7 vs F2_ZA = 1 mode-coupling ratio for a two-mode
field in EdS — a wrong psi2 sign would read 9/7, a missing psi2 reads
1, so the test is unambiguous.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from astrild_tpu.ops import nbody
from astrild_tpu.ops.paint import paint
from astrild_tpu.ops.power import delta_k
from astrild_tpu.utils.cosmology import Cosmology


def _pk_flat(amp):
    def pk(k):
        return amp * jnp.ones_like(k)
    return pk


def test_second_order_source_two_modes():
    # delta = a cos(k x) + b cos(k y) => S2 = a b cos(k x) cos(k y)
    n, box = 32, 100.0
    a, b = 0.7, 0.4
    kf = 2 * np.pi / box
    cell = box / n
    x = (np.arange(n)) * cell  # grid point coords for np field build
    X, Y, _ = np.meshgrid(x, x, x, indexing="ij")
    delta = a * np.cos(kf * X) + b * np.cos(kf * Y)
    dk = jnp.fft.fftn(jnp.asarray(delta, jnp.float32))
    s2 = nbody._second_order_source(dk, n, box)
    expect = a * b * np.cos(kf * X) * np.cos(kf * Y)
    assert float(jnp.max(jnp.abs(s2 - expect))) < 5e-5


def test_psi2_divergence_is_source():
    # div psi2 == +S2 by construction (spectral identity)
    n, box = 16, 50.0
    key = jax.random.PRNGKey(3)
    dk = jnp.fft.fftn(jax.random.normal(key, (n, n, n)) * 0.1)
    s2 = nbody._second_order_source(dk, n, box)
    psi2 = nbody._grad_invlap(jnp.fft.fftn(s2), n, box, sign=+1.0)
    div = jnp.zeros((n, n, n), jnp.complex64)
    f = np.fft.fftfreq(n) * n * (2 * np.pi / box)
    kv = [f.reshape(-1, 1, 1), f.reshape(1, -1, 1), f.reshape(1, 1, -1)]
    for ax in range(3):
        div = div + 1j * kv[ax] * jnp.fft.fftn(psi2[ax])
    div = jnp.real(jnp.fft.ifftn(div))
    # Nyquist-masked modes are dropped by the odd transfer, and the DC
    # mode by invlap (S2 has a nonzero mean; div psi2 cannot): compare
    # the band-limited, mean-free versions of both sides
    s2k = jnp.fft.fftn(s2)
    ny = n // 2
    m = np.ones(n); m[ny] = 0.0
    mk = (m.reshape(-1, 1, 1) * m.reshape(1, -1, 1)
          * m.reshape(1, 1, -1))
    mk = np.asarray(mk); mk[0, 0, 0] = 0.0
    s2_band = jnp.real(jnp.fft.ifftn(s2k * mk))
    # div(masked psi2) has k_i m_i terms; mask fully for the comparison
    divk = jnp.fft.fftn(div) * mk
    div_band = jnp.real(jnp.fft.ifftn(divk))
    assert float(jnp.max(jnp.abs(div_band - s2_band))) < 1e-3 * float(
        jnp.max(jnp.abs(s2_band)))


def test_2lpt_mode_coupling_matches_f2():
    # EdS: D2 = -3/7 D1^2 exactly. Inject two orthogonal equal-|k|
    # modes; the painted density's coupled (1,1,0) mode obeys
    # 2LPT / ZA = F2(mu=0) / F2_ZA(mu=0) = (5/7) / (1/2) = 10/7.
    # (Exact ZA for two orthogonal modes is separable 1D x 1D: the
    # coupled term is ab cos(kx)cos(ky), i.e. F2_ZA(mu=0) = 1/2.)
    # A wrong psi2 sign would read 4/7, a missing psi2 reads 1 —
    # unambiguous in both directions.
    n, box = 64, 100.0
    eps = 0.02
    kf = 2 * np.pi / box
    cell = box / n
    # lattice is cell-centered: build delta at q = (i+0.5) cell
    x = (np.arange(n) + 0.5) * cell
    X, Y, _ = np.meshgrid(x, x, x, indexing="ij")

    def displaced_density(order):
        delta = eps * (np.cos(kf * X) + np.cos(kf * Y))
        dkf = jnp.fft.fftn(jnp.asarray(delta, jnp.float32))
        psi1, psi2 = nbody.lpt_displacements_from_modes(dkf, n, box)
        d2 = -(3.0 / 7.0) if order == 2 else 0.0
        disp = (psi1 + d2 * psi2).reshape(3, -1)
        qx, qy, qz = nbody._lattice_comps(n, box)
        comps = tuple(((q + disp[i]) % box)
                      for i, q in enumerate((qx, qy, qz)))
        grid = paint(comps, n, box, window="cic")
        return delta_k(grid, window="cic")

    dz = displaced_density(1)
    d2l = displaced_density(2)
    # coupled mode (1,1,0) of cos(kx)cos(ky) products
    za = dz[1, 1, 0]
    lpt2 = d2l[1, 1, 0]
    # linear modes must agree (psi2 does not touch first order)
    assert abs(complex(d2l[1, 0, 0] - dz[1, 0, 0])) < 1e-6
    ratio = float(jnp.real(lpt2) / jnp.real(za))
    assert abs(ratio - 10.0 / 7.0) < 0.04, ratio


def test_force_accuracy_and_lattice_alias_regimes():
    # single-mode spectral force vs analytic -1.5 eps/k sin(kx):
    # 1:1 mesh:particle is sub-% at the fundamental; a 2x-finer force
    # mesh with lattice ICs BOOSTS the force (alias feedback) — the
    # regime _force_grids documents and pm_catalog avoids.
    from astrild_tpu.ops.recon import sample_displacement
    box, eps = 500.0, 1e-3
    kf = 2 * np.pi / box

    def ratio(npart, nforce, m):
        cell = box / npart
        q = (np.arange(npart) + 0.5) * cell
        QX, QY, QZ = np.meshgrid(q, q, q, indexing="ij")
        psi = -eps / (m * kf) * np.sin(m * kf * QX)
        comps = tuple(jnp.asarray(c.ravel(), jnp.float32)
                      for c in ((QX + psi) % box, QY, QZ))
        grids = nbody._force_grids(comps, nforce, box, 1.0, "cic")
        frc = np.asarray(sample_displacement(grids, box, comps))
        th = -1.5 * eps / (m * kf) * np.sin(
            m * kf * np.asarray(comps[0]))
        return float((frc[0] * th).sum() / (th * th).sum())

    # single deconvolution corrects the paint; the readout leaves one
    # window factor W_cic(m, n) = sinc(m/n)^2 of expected damping
    def w_cic(m, n):
        return float(np.sinc(m / n) ** 2)

    assert abs(ratio(32, 32, 1) - w_cic(1, 32)) < 4e-3
    assert abs(ratio(32, 32, 2) - w_cic(2, 32)) < 8e-3
    # the documented pathology: 2:1 force error grows with m
    r1, r4 = ratio(32, 64, 1), ratio(32, 64, 4)
    assert r1 > 1.02 and r4 > r1


def test_pm_linear_growth_lcdm():
    # Same-realization per-shell growth: P(a=1)/P(a_i) at large scales
    # = (D(1)/D(a_i))^2. 32^3 particles, 1:1 force mesh, 12 steps.
    cosmo = Cosmology(Om0=0.3, h=0.7)
    npart, nforce, box = 32, 32, 500.0
    z_i = 5.6667  # a_i = 0.15
    a_i = 1.0 / (1.0 + z_i)
    amp = 50.0  # (Mpc/h)^3: linear at these scales
    key = jax.random.PRNGKey(7)
    comps, mom = nbody.lpt_catalog(key, npart, box, _pk_flat(amp),
                                   cosmo, z_i, order=2)
    g0 = paint(comps, nforce, box, window="cic")
    dk0 = delta_k(g0, window="cic")
    out, _ = nbody.pm_evolve(comps, mom, cosmo, nforce, box, a_i, 1.0,
                             nsteps=12)
    g1 = paint(out, nforce, box, window="cic")
    dk1 = delta_k(g1, window="cic")
    # average |d|^2 ratio over the lowest nonzero modes (|m| <= 3)
    f = np.fft.fftfreq(nforce) * nforce
    fr = f[: nforce // 2 + 1]
    m2 = (f[:, None, None] ** 2 + f[None, :, None] ** 2
          + fr[None, None, :] ** 2)
    sel = (m2 > 0) & (m2 <= 9.0)
    p0 = np.asarray(jnp.abs(dk0) ** 2)[sel].mean()
    p1 = np.asarray(jnp.abs(dk1) ** 2)[sel].mean()
    d_ratio = (float(cosmo.growth_factor(0.0))
               / float(cosmo.growth_factor(z_i)))
    measured = np.sqrt(p1 / p0)
    assert abs(measured / d_ratio - 1.0) < 0.05, (measured, d_ratio)


def test_pm_momentum_conservation():
    # spectral forces on a painted grid: net momentum kick ~ 0
    key = jax.random.PRNGKey(11)
    n, box = 32, 100.0
    npar = 5000
    pos = jax.random.uniform(key, (npar, 3)) * box
    comps = (pos[:, 0], pos[:, 1], pos[:, 2])
    grids = nbody._force_grids(comps, n, box, 0.3, "cic")
    from astrild_tpu.ops.recon import sample_displacement
    frc = sample_displacement(grids, box, comps)
    net = jnp.abs(jnp.sum(frc, axis=1))
    rms = jnp.sqrt(jnp.mean(frc ** 2, axis=1)) * npar
    assert float(jnp.max(net / rms)) < 5e-3


def test_lpt_order1_matches_zeldovich_mock():
    # same key => identical realization as mocks.zeldovich_catalog, and
    # velocities_kms reproduces the a_hubble*f*psi convention at z=0
    from astrild_tpu.ops.mocks import zeldovich_catalog_with_velocities
    n, box = 16, 200.0
    cosmo = Cosmology(Om0=0.3, h=0.7)
    key = jax.random.PRNGKey(5)
    pk = _pk_flat(200.0)
    comps, mom = nbody.lpt_catalog(key, n, box, pk, cosmo, 0.0, order=1)
    f1 = float(cosmo.growth_rate(0.0))
    pos_ref, vel_ref = zeldovich_catalog_with_velocities(
        key, n, box, pk, f1)
    pos = np.stack([np.asarray(c) for c in comps], axis=-1)
    d = np.abs(pos - np.asarray(pos_ref))
    d = np.minimum(d, box - d)  # periodic
    assert d.max() < 1e-3
    vel = np.stack([np.asarray(v) for v in
                    nbody.velocities_kms(mom, 1.0)], axis=-1)
    vref = np.asarray(vel_ref)
    assert np.max(np.abs(vel - vref)) < 1e-2 * np.abs(vref).max() + 1e-3


def test_fifth_force_single_mode_geff():
    # force ratio f(R)/GR on the same configuration == 1 + mu_k(a, k_m)
    # exactly (spectral identity; pins the am2 wiring and the GR
    # am2=inf limit)
    from astrild_tpu.ops.recon import sample_displacement
    from astrild_tpu.utils.cosmology import Cosmology
    n, box, eps, m = 32, 400.0, 1e-3, 2
    kf = 2 * np.pi / box
    cell = box / n
    q = (np.arange(n) + 0.5) * cell
    QX, QY, QZ = np.meshgrid(q, q, q, indexing="ij")
    psi = -eps / (m * kf) * np.sin(m * kf * QX)
    comps = tuple(jnp.asarray(c.ravel(), jnp.float32)
                  for c in ((QX + psi) % box, QY, QZ))
    cosmo = Cosmology(Om0=0.3, h=0.7, fR0=1e-5)
    a = 0.8
    am2 = float(a ** 2 * cosmo.scalaron_mass2(a))
    g_gr = nbody._force_grids(comps, n, box, 0.3, "cic")
    g_fr = nbody._force_grids(comps, n, box, 0.3, "cic", am2=am2)
    # per-GRID-mode ratio: the paint (incl. its lattice aliases summed
    # into mode m) is identical for both, so the ratio isolates the
    # spectral Geff factor exactly — unlike a particle-readout
    # projection, which remixes alias harmonics at different geff
    fk_gr = complex(jnp.fft.fftn(g_gr[0])[m, 0, 0])
    fk_fr = complex(jnp.fft.fftn(g_fr[0])[m, 0, 0])
    ratio = (fk_fr / fk_gr).real
    expect = 1.0 + float(cosmo.mu_k(a, m * kf))
    assert abs(ratio - expect) < 2e-4, (ratio, expect)
    # and the GR default is bit-exact GR (geff == 1 with am2 = inf)
    assert float(jnp.max(jnp.abs(
        g_gr - nbody._force_grids(comps, n, box, 0.3, "cic",
                                  am2=jnp.inf)))) == 0.0


def test_fofr_pm_growth_matches_linear_ode():
    # Same GR 2LPT ICs evolved under GR vs linearized Hu-Sawicki f(R):
    # the per-shell P ratio (same realization — no sample variance,
    # and KDK stepping error cancels in the ratio) must match the
    # scale-dependent growth ODE's enhancement
    # fofr_pk_enhancement(k, 0) / fofr_pk_enhancement(k, z_i).
    from astrild_tpu.utils.cosmology import Cosmology
    gr = Cosmology(Om0=0.3, h=0.7)
    fr = Cosmology(Om0=0.3, h=0.7, fR0=1e-4)
    npart, box, z_i = 32, 400.0, 9.0
    a_i = 1.0 / (1.0 + z_i)
    key = jax.random.PRNGKey(13)
    pk = _pk_flat(20.0)  # linear amplitudes at all resolved scales
    comps, mom = nbody.lpt_catalog(key, npart, box, pk, gr, z_i)
    out_gr, _ = nbody.pm_evolve(comps, mom, gr, npart, box, a_i, 1.0,
                                nsteps=16)
    out_fr, _ = nbody.pm_evolve(comps, mom, fr, npart, box, a_i, 1.0,
                                nsteps=16)
    from astrild_tpu.ops.power import auto_power
    k, P_gr, _ = auto_power(paint(out_gr, npart, box, window="cic"),
                            box, nbins=10)
    _, P_fr, _ = auto_power(paint(out_fr, npart, box, window="cic"),
                            box, nbins=10)
    k = np.asarray(k)
    measured = np.asarray(P_fr) / np.asarray(P_gr)
    theory = (np.asarray(fr.fofr_pk_enhancement(k, 0.0))
              / np.asarray(fr.fofr_pk_enhancement(k, z_i)))
    sel = slice(1, 9)
    assert theory[sel].max() > 1.1  # the test has teeth
    err = np.abs(measured[sel] / theory[sel] - 1.0)
    assert err.max() < 0.03, (measured[sel], theory[sel])


def test_pm_lightcone_planes_structure():
    from astrild_tpu.utils.cosmology import Cosmology
    cosmo = Cosmology(Om0=0.3, h=0.7)
    pk = _pk_flat(100.0)
    delta, chis, dchi = nbody.pm_lightcone_planes(
        jax.random.PRNGKey(0), cosmo, pk, 16, 200.0, 0.05, 32, 6,
        z_source=0.4, z_init=9.0, nsteps_init=4, steps_per_plane=1)
    assert delta.shape == (6, 32, 32)
    assert np.all(np.isfinite(np.asarray(delta)))
    chi_s = float(cosmo.comoving_distance(0.4))
    assert abs(float(chis[-1]) - (5.5 / 6.0) * chi_s) < 1e-2 * chi_s
    assert abs(dchi * 6 - chi_s) < 1e-3 * chi_s
    # delta is a contrast: means small vs its fluctuations
    assert abs(float(delta.mean())) < 0.5 * float(delta.std())
    with pytest.raises(ValueError):
        nbody.pm_lightcone_planes(
            jax.random.PRNGKey(0), cosmo, pk, 16, 200.0, 0.05, 32, 4,
            z_source=0.4, z_init=0.2)


@pytest.mark.slow
def test_pm_lightcone_born_cl_and_replica_decorrelation():
    # Full forward model: linear P(k) -> PM lightcone -> Born kappa ->
    # C_ell vs the halofit Limber prediction. Also pins the single-box
    # replication artifact this pipeline must manage: WITHOUT the
    # per-repetition observer randomization, repeated structure along
    # the LOS adds coherently and the lowest band reads ~3.5x theory
    # (reproducible across seeds); WITH it the band is consistent.
    from astrild_tpu.utils.cosmology import Cosmology
    from astrild_tpu.ops.lensing import born_convergence
    from astrild_tpu.ops.angular_power import cl_flat_sky, cl_kappa_limber
    from astrild_tpu.ops.linear_power import linear_power, normalization
    cosmo = Cosmology(Om0=0.3, h=0.7)
    amp = float(normalization(cosmo))

    def pk(k):
        return linear_power(k, cosmo, 0.0, amplitude=amp)

    box, npart, npix, fov, nplanes = 250.0, 64, 96, 0.08, 12
    chi_s = float(cosmo.comoving_distance(1.0))

    def cl_ratio(randomize):
        delta, chis, dchi = nbody.pm_lightcone_planes(
            jax.random.PRNGKey(4), cosmo, pk, npart, box, fov, npix,
            nplanes, z_source=1.0, z_init=9.0, nsteps_init=8,
            steps_per_plane=2,
            randomize_key=jax.random.PRNGKey(104) if randomize else None)
        z_pl = np.asarray(cosmo.redshift_at_comoving_distance(chis))
        a_pl = jnp.asarray(1.0 / (1.0 + z_pl), jnp.float32)
        kap = born_convergence(delta, chis, jnp.full(len(chis), dchi),
                               chi_s, 0.3, scale_factors=a_pl)
        ell, cl = cl_flat_sky(kap, np.degrees(fov), nbins=10)
        th = np.asarray(cl_kappa_limber(ell, cosmo, 1.0, nonlinear=True))
        return np.asarray(cl) / th

    r = cl_ratio(randomize=True)
    # resolved band tracks halofit (PM mesh damping keeps it slightly
    # under; cosmic variance of one 4.6-deg cone sets the width)
    assert 0.55 < r[1:5].mean() < 1.45, r
    assert r[0] < 2.0, r
    r_fixed = cl_ratio(randomize=False)
    assert r_fixed[0] > 2.0, r_fixed  # the artifact the key removes


def test_distributed_pm_evolve_matches_local():
    # sharding equivalence: the pencil-FFT force step + distributed KDK
    # scan reproduces the single-device evolution (same KDK integrals,
    # same spectral operators; FFT summation order differs, so exact
    # equality is not expected — pin a tight f32 envelope)
    from astrild_tpu.parallel import make_mesh
    from astrild_tpu.parallel.nbody import make_distributed_pm_evolve
    from astrild_tpu.utils.cosmology import Cosmology
    for cosmo in (Cosmology(Om0=0.3, h=0.7),
                  Cosmology(Om0=0.3, h=0.7, fR0=1e-5)):
        n, box = 16, 100.0
        a0, a1, nst = 0.25, 1.0, 6
        key = jax.random.PRNGKey(9)
        comps, mom = nbody.lpt_catalog(key, n, box, _pk_flat(150.0),
                                       cosmo, 1.0 / a0 - 1.0)
        ref_c, ref_m = nbody.pm_evolve(comps, mom, cosmo, n, box, a0,
                                       a1, nst)
        mesh = make_mesh(n_sim=1, n_x=2, n_y=2)
        fn = make_distributed_pm_evolve(mesh, n, box, cosmo, nst)
        out_c, out_m = fn(comps, mom, a0, a1)
        for r, o in zip(ref_c, out_c):
            d = np.abs(np.asarray(r) - np.asarray(o))
            d = np.minimum(d, box - d)
            assert d.max() < 5e-3, d.max()  # Mpc/h, cell = 6.25
        for r, o in zip(ref_m, out_m):
            scale = float(jnp.abs(r).max())
            assert float(jnp.abs(r - o).max()) < 1e-3 * scale


def test_pm_catalog_end_to_end_nonlinear():
    # the full convenience path runs and produces a physical result:
    # nonlinear P(k) at z=0 exceeds linear on small scales
    cosmo = Cosmology(Om0=0.3, h=0.7)
    key = jax.random.PRNGKey(2)
    from astrild_tpu.ops.linear_power import linear_power, normalization
    amp = float(normalization(cosmo))

    def pk(k):
        return linear_power(k, cosmo, 0.0, amplitude=amp)

    comps, vel = nbody.pm_catalog(key, cosmo, pk, ngrid_part=16,
                                  boxsize=100.0, z_init=9.0, nsteps=8)
    assert comps[0].shape == (16 ** 3,)
    assert np.all(np.isfinite(np.asarray(comps[0])))
    assert np.all(np.isfinite(np.asarray(vel[0])))
    g = paint(comps, 32, 100.0, window="cic")
    assert float(jnp.std(g / jnp.mean(g))) > 0.5  # visibly nonlinear


def test_pm_evolve_checkpointed_matches_and_resumes(tmp_path, monkeypatch):
    # Segmented evolution follows the exact monolithic KDK schedule
    # (edge-slice factor locality), and a crash between segments resumes
    # from the last atomic checkpoint instead of restarting.
    from astrild_tpu.core import checkpoint as ckpt
    cosmo = Cosmology(Om0=0.3, h=0.7)
    n, box = 16, 100.0
    key = jax.random.PRNGKey(11)
    comps, mom = nbody.lpt_catalog(key, n, box, _pk_flat(40.0), cosmo,
                                   5.0, order=2)
    a0, a1 = 1.0 / 6.0, 1.0
    ref_c, ref_m = nbody.pm_evolve(comps, mom, cosmo, n, box, a0, a1,
                                   nsteps=6)

    # clean segmented run == monolithic
    d1 = tmp_path / "ck1"
    out_c, out_m = nbody.pm_evolve_checkpointed(
        comps, mom, cosmo, n, box, a0, a1, 6, d1, segment_steps=2)
    for r, o in zip(ref_c, out_c):
        d = np.abs(np.asarray(r) - np.asarray(o))
        d = np.minimum(d, box - d)  # periodic wrap
        assert d.max() < 1e-3, d.max()
    for r, o in zip(ref_m, out_m):
        scale = float(jnp.abs(r).max())
        assert float(jnp.abs(r - o).max()) < 1e-4 * scale

    # crash after the first segment's save -> rerun resumes at step 2
    d2 = tmp_path / "ck2"
    real_save = ckpt.save_state
    calls = {"n": 0}

    def crashy(path, state, step=None):
        real_save(path, state, step=step)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(ckpt, "save_state", crashy)
    with pytest.raises(RuntimeError, match="simulated crash"):
        nbody.pm_evolve_checkpointed(comps, mom, cosmo, n, box, a0, a1,
                                     6, d2, segment_steps=2)
    monkeypatch.setattr(ckpt, "save_state", real_save)
    _, step = ckpt.restore_state(d2, (comps, mom), with_step=True)
    assert step == 2
    res_c, _ = nbody.pm_evolve_checkpointed(
        comps, mom, cosmo, n, box, a0, a1, 6, d2, segment_steps=2)
    for r, o in zip(ref_c, res_c):
        d = np.abs(np.asarray(r) - np.asarray(o))
        d = np.minimum(d, box - d)
        assert d.max() < 1e-3, d.max()
    # stale checkpoint from a different schedule is refused — even when
    # the stored step would FIT the new schedule (6-step ckpt at step 6,
    # rerun with nsteps=8: old guard passed silently)
    with pytest.raises(ValueError, match="different schedule"):
        nbody.pm_evolve_checkpointed(comps, mom, cosmo, n, box, a0, a1,
                                     8, d2, segment_steps=2)
    with pytest.raises(ValueError, match="different schedule"):
        nbody.pm_evolve_checkpointed(comps, mom, cosmo, n, box, a0, a1,
                                     4, d2, segment_steps=2)
    with pytest.raises(ValueError, match="different schedule"):
        nbody.pm_evolve_checkpointed(comps, mom, cosmo, n, box, a0,
                                     0.9, 6, d2, segment_steps=2)


def test_pm_lightcone_planes_checkpoint_resume(tmp_path, monkeypatch):
    from astrild_tpu.core import checkpoint as ckpt
    cosmo = Cosmology(Om0=0.3, h=0.7)
    pk = _pk_flat(100.0)
    args = (jax.random.PRNGKey(0), cosmo, pk, 16, 200.0, 0.05, 32, 6)
    kw = dict(z_source=0.4, z_init=9.0, nsteps_init=4, steps_per_plane=1)
    ref, chis_ref, dchi_ref = nbody.pm_lightcone_planes(*args, **kw)

    d = tmp_path / "lc"
    real_save = ckpt.save_state
    calls = {"n": 0}

    def crashy(path, state, step=None):
        real_save(path, state, step=step)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(ckpt, "save_state", crashy)
    with pytest.raises(RuntimeError, match="simulated crash"):
        nbody.pm_lightcone_planes(*args, ckpt_dir=d, **kw)
    monkeypatch.setattr(ckpt, "save_state", real_save)
    delta, chis, dchi = nbody.pm_lightcone_planes(*args, ckpt_dir=d, **kw)
    assert float(jnp.abs(delta - ref).max()) < 1e-4
    assert np.allclose(np.asarray(chis), np.asarray(chis_ref))
    assert dchi == dchi_ref
    # completed checkpoint short-circuits a rerun to the stored stack
    delta2, _, _ = nbody.pm_lightcone_planes(*args, ckpt_dir=d, **kw)
    assert float(jnp.abs(delta2 - delta).max()) == 0.0
