"""Multi-plane ray tracing (ops/raytrace.py): single-plane exactness,
Born-limit consistency, post-Born rotation."""
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from astrild_tpu.ops import lensing as L
from astrild_tpu.ops import raytrace as R

OM = 0.3


def _smooth_periodic_planes(rng, nplane, npix, amp, cut=6):
    """Band-limited periodic Gaussian delta planes (smooth enough that
    bilinear interpolation error is negligible)."""
    planes = []
    for _ in range(nplane):
        spec = (rng.normal(size=(npix, npix))
                + 1j * rng.normal(size=(npix, npix)))
        kx = np.fft.fftfreq(npix) * npix
        k2 = kx[:, None] ** 2 + kx[None, :] ** 2
        spec *= np.exp(-k2 / cut ** 2)
        d = np.real(np.fft.ifft2(spec))
        d *= amp / max(d.std(), 1e-30)
        planes.append(d - d.mean())
    return jnp.asarray(np.stack(planes))


def test_single_plane_exact():
    rng = np.random.default_rng(7)
    npix = 64
    planes = _smooth_periodic_planes(rng, 1, npix, amp=0.2)
    chis = jnp.array([1000.0])
    dchis = jnp.array([400.0])
    chi_s = 2500.0
    theta = np.radians(5.0)
    out = R.multiplane_raytrace(planes, chis, dchis, chi_s, OM, theta)
    kap_plane = R.effective_plane_kappa(planes[0], chis[0], dchis[0],
                                        1.0, OM)
    expected = (1.0 - chis[0] / chi_s) * kap_plane
    # rays are aligned with plane pixels -> no interpolation error
    npt.assert_allclose(np.asarray(out["kappa"]), np.asarray(expected),
                        rtol=1e-4, atol=5e-7)
    assert np.abs(np.asarray(out["omega"])).max() < 1e-8
    # shear consistency: <gamma^2> == <kappa^2> for a single plane (both
    # are |second derivative| projections of the same potential)
    g2 = np.asarray(out["gamma1"]) ** 2 + np.asarray(out["gamma2"]) ** 2
    k2 = np.asarray(out["kappa"]) ** 2
    npt.assert_allclose(g2.mean(), k2.mean(), rtol=0.2)


def test_born_limit_matches_born_convergence():
    rng = np.random.default_rng(3)
    npix = 64
    nplane = 4
    planes = _smooth_periodic_planes(rng, nplane, npix, amp=0.05)
    chis = jnp.array([500.0, 1000.0, 1500.0, 2000.0])
    dchis = jnp.full((nplane,), 500.0)
    chi_s = 2500.0
    theta = np.radians(5.0)
    out = R.multiplane_raytrace(planes, chis, dchis, chi_s, OM, theta)
    kb = np.asarray(L.born_convergence(planes, chis, dchis, chi_s, OM))
    km = np.asarray(out["kappa"])
    scale = np.abs(kb).max()
    assert scale > 1e-5  # non-trivial field
    # post-Born corrections are O(kappa^2/kappa) relative ~ 1e-3 here
    assert np.abs(km - kb).max() / scale < 5e-3
    # and omega is tiny but NOT exactly zero (lens-lens coupling exists)
    om = np.abs(np.asarray(out["omega"])).max()
    assert om < 1e-5


def test_postborn_rotation_appears_with_two_strong_planes():
    rng = np.random.default_rng(11)
    npix = 64
    planes = _smooth_periodic_planes(rng, 2, npix, amp=3.0)
    chis = jnp.array([800.0, 1600.0])
    dchis = jnp.full((2,), 600.0)
    chi_s = 2400.0
    theta = np.radians(5.0)
    out = R.multiplane_raytrace(planes, chis, dchis, chi_s, OM, theta)
    kap = np.abs(np.asarray(out["kappa"])).max()
    om = np.abs(np.asarray(out["omega"])).max()
    assert kap > 0.01
    # rotation is second order: present, well below kappa
    assert 1e-8 < om < kap
    # beta differs from theta (rays actually deflected)
    t1 = np.arange(npix) * theta / npix
    disp = np.abs(np.asarray(out["beta1"]) - t1[:, None]).max()
    assert disp > 1e-6


def test_raygrid_subsampling_and_scale_factors():
    rng = np.random.default_rng(5)
    npix = 64
    planes = _smooth_periodic_planes(rng, 3, npix, amp=0.1)
    chis = jnp.array([600.0, 1200.0, 1800.0])
    dchis = jnp.full((3,), 600.0)
    a = jnp.array([0.9, 0.8, 0.7])
    out = R.multiplane_raytrace(planes, chis, dchis, 2400.0, OM,
                                np.radians(5.0), scale_factors=a,
                                n_rays=32)
    assert out["kappa"].shape == (32, 32)
    # scale factors boost each plane by 1/a vs a=1
    out1 = R.multiplane_raytrace(planes, chis, dchis, 2400.0, OM,
                                 np.radians(5.0), n_rays=32)
    assert (np.abs(np.asarray(out["kappa"])).mean()
            > np.abs(np.asarray(out1["kappa"])).mean())


def test_plane_deflection_fields_batched_matches_loop():
    """(nplane, n, n) stacks must equal the per-plane 2D results — the
    Nyquist zeroing/cropping used to index absolute axes and silently
    wiped batch element n//2's alpha1 spectrum instead of the Nyquist
    row."""
    rng = np.random.default_rng(7)
    npix, nplane = 16, 20  # nplane > npix: batch/axis mixups can't hide
    kaps = jnp.asarray(rng.normal(size=(nplane, npix, npix))
                       .astype(np.float32))
    batched = R.plane_deflection_fields(kaps, 0.7)
    for i in range(nplane):
        single = R.plane_deflection_fields(kaps[i], 0.7)
        for b, s in zip(batched, single):
            npt.assert_allclose(np.asarray(b[i]), np.asarray(s),
                                rtol=1e-6, atol=1e-6)


def test_u12_is_exact_spectral_derivative_of_alpha1():
    """u12 must equal d(alpha1)/d(theta2) spectrally — including on
    white noise, where an unzeroed Nyquist plane of the odd-odd mixed
    derivative shows up as a ~8% checkerboard error."""
    rng = np.random.default_rng(0)
    npix = 32
    oa = 1.0
    kap = jnp.asarray(rng.normal(size=(npix, npix)).astype(np.float32))
    a1, a2, u11, u12, u22 = R.plane_deflection_fields(kap, oa)
    kf = 2 * np.pi / oa
    k2 = np.fft.rfftfreq(npix) * npix * kf
    spec = np.fft.rfft2(np.asarray(a1)) * (1j * k2[None, :])
    spec[:, -1] = 0.0  # odd derivative: own-negative Nyquist column
    ref = np.fft.irfft2(spec, s=(npix, npix))
    npt.assert_allclose(np.asarray(u12), ref, atol=2e-4 * np.abs(ref).max())
    # u11/u22 trace reproduces 2*kap (Poisson closure, mean-free part)
    tr = np.asarray(u11) + np.asarray(u22)
    kap0 = np.asarray(kap) - np.asarray(kap).mean()
    npt.assert_allclose(0.5 * tr, kap0, atol=5e-5 * np.abs(kap0).max())


def test_skyarray_from_density_planes_both_methods():
    """Model-layer map-maker: Born and post-Born from the same planes."""
    from astrild_tpu.models import SkyArray

    rng = np.random.default_rng(1)
    planes = _smooth_periodic_planes(rng, 3, 48, amp=0.1)
    chis = jnp.array([600.0, 1200.0, 1800.0])
    dchis = jnp.full((3,), 600.0)
    born = SkyArray.from_density_planes(planes, chis, dchis, 2400.0, OM,
                                        5.0, method="born")
    rt = SkyArray.from_density_planes(planes, chis, dchis, 2400.0, OM,
                                      5.0, method="raytrace")
    assert born.npix == rt.npix == 48
    assert set(rt.data) >= {"orig", "gamma1", "gamma2", "omega"}
    # weak field: the two kappa maps agree closely
    npt.assert_allclose(np.asarray(rt.data["orig"]),
                        np.asarray(born.data["orig"]), atol=2e-4)
    # downstream SkyArray machinery works on the raytraced map
    rt.smoothing(4.0, on="orig")


def test_shear_eb_decomposition():
    """Pure-E check: shear derived from a scalar potential gives
    kappa_E == kappa and kappa_B == 0; post-Born multiplane shear carries
    a small but nonzero B-mode."""
    from astrild_tpu.ops import angular_power as AP

    rng = np.random.default_rng(3)
    npix = 64
    kap = np.asarray(_smooth_periodic_planes(rng, 1, npix, amp=0.05))[0]
    _, _, u11, u12, u22 = R.plane_deflection_fields(jnp.asarray(kap), 0.1)
    g1 = 0.5 * (np.asarray(u11) - np.asarray(u22))
    g2 = np.asarray(u12)
    ke, kb = AP.shear_eb_maps(jnp.asarray(g1), jnp.asarray(g2))
    kap0 = kap - kap.mean()
    npt.assert_allclose(np.asarray(ke), kap0,
                        atol=5e-5 * np.abs(kap0).max())
    assert np.abs(np.asarray(kb)).max() < 1e-4 * np.abs(kap0).max()

    # post-Born: B-modes appear, well below E
    planes = _smooth_periodic_planes(rng, 2, npix, amp=3.0)
    out = R.multiplane_raytrace(planes, jnp.array([800.0, 1600.0]),
                                jnp.full((2,), 600.0), 2400.0, OM,
                                np.radians(5.0))
    ell, cl_ee, cl_bb = AP.cl_shear_eb(out["gamma1"], out["gamma2"], 5.0,
                                       nbins=16)
    ee = np.asarray(cl_ee).sum()
    bb = np.asarray(cl_bb).sum()
    assert bb > 0
    assert bb < 0.05 * ee, (bb, ee)


def test_model_layer_shear_spectra():
    from astrild_tpu.models.power import AngularPowerSpectrum

    rng = np.random.default_rng(5)
    planes = _smooth_periodic_planes(rng, 2, 48, amp=1.0)
    out = R.multiplane_raytrace(planes, jnp.array([800.0, 1600.0]),
                                jnp.full((2,), 600.0), 2400.0, OM,
                                np.radians(5.0))
    ell, ee, bb = AngularPowerSpectrum.from_shear(out["gamma1"],
                                                  out["gamma2"], 5.0,
                                                  nbins=12)
    assert ee.shape == (12,) and np.all(ee >= 0) and np.all(bb >= 0)
    assert ee.sum() > bb.sum()


def test_tomographic_sources_and_interior_source():
    """chi_s array: shared fields, per-source masking. An interior source
    (chi_s below the last plane) must IGNORE the planes beyond it — it
    equals a run on the truncated plane stack."""
    rng = np.random.default_rng(8)
    npix = 48
    planes = _smooth_periodic_planes(rng, 4, npix, amp=0.3)
    chis = jnp.array([500.0, 1000.0, 1500.0, 2000.0])
    dchis = jnp.full((4,), 500.0)
    theta = np.radians(5.0)
    out = R.multiplane_raytrace(planes, chis, dchis,
                                jnp.array([1200.0, 2500.0]), OM, theta)
    assert out["kappa"].shape == (2, npix, npix)
    # interior source == truncated stack traced to the same chi_s
    trunc = R.multiplane_raytrace(planes[:2], chis[:2], dchis[:2],
                                  1200.0, OM, theta)
    for key in ("kappa", "gamma1", "gamma2", "omega"):
        npt.assert_allclose(np.asarray(out[key][0]),
                            np.asarray(trunc[key]), rtol=1e-4, atol=1e-6)
    # scalar call unchanged by the refactor
    full = R.multiplane_raytrace(planes, chis, dchis, 2500.0, OM, theta)
    npt.assert_allclose(np.asarray(out["kappa"][1]),
                        np.asarray(full["kappa"]), rtol=1e-6, atol=1e-9)
    # nearer source lenses less
    assert (np.abs(np.asarray(out["kappa"][0])).mean()
            < np.abs(np.asarray(out["kappa"][1])).mean())


def test_skyarray_tomographic_map_maker():
    from astrild_tpu.models import SkyArray

    rng = np.random.default_rng(2)
    planes = _smooth_periodic_planes(rng, 3, 32, amp=0.2)
    chis = jnp.array([600.0, 1200.0, 1800.0])
    dchis = jnp.full((3,), 600.0)
    skies = SkyArray.from_density_planes(
        planes, chis, dchis, jnp.array([1500.0, 2400.0]), OM, 5.0,
        method="raytrace")
    assert isinstance(skies, list) and len(skies) == 2
    assert all("omega" in s.data for s in skies)
    assert (np.abs(np.asarray(skies[0].data["orig"])).mean()
            < np.abs(np.asarray(skies[1].data["orig"])).mean())


def test_born_tomographic_map_maker_matches_per_source():
    from astrild_tpu.models import SkyArray
    from astrild_tpu.ops import lensing as LN

    rng = np.random.default_rng(4)
    planes = _smooth_periodic_planes(rng, 3, 24, amp=0.2)
    chis = jnp.array([600.0, 1200.0, 1800.0])
    dchis = jnp.full((3,), 600.0)
    skies = SkyArray.from_density_planes(
        planes, chis, dchis, jnp.array([900.0, 2400.0]), OM, 5.0,
        method="born")
    assert isinstance(skies, list) and len(skies) == 2
    for sky, cs in zip(skies, (900.0, 2400.0)):
        ref = LN.born_convergence(planes, chis, dchis, cs, OM)
        npt.assert_allclose(np.asarray(sky.data["orig"]),
                            np.asarray(ref), rtol=1e-6, atol=1e-10)
