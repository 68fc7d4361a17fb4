"""Minkowski functionals: Gaussian-field analytic validation.

A Gaussian random field's V0/V1/V2 are known in closed form (Tomita 1986),
which pins both the local estimators and the prediction formulas
independently — an error in either breaks the match.
"""
import jax
import jax.numpy as jnp
import numpy as np

from astrild_tpu.ops.minkowski import (gaussian_minkowski, map_moments,
                                       minkowski_functionals)


def _grf(seed: int, n: int = 512, smooth_px: float = 4.0):
    rng = np.random.default_rng(seed)
    white = rng.standard_normal((n, n)).astype(np.float32)
    k2 = np.fft.fftfreq(n)[:, None] ** 2 + np.fft.rfftfreq(n)[None, :] ** 2
    W = np.exp(-0.5 * k2 * (2 * np.pi * smooth_px) ** 2)
    f = np.fft.irfft2(np.fft.rfft2(white) * W, s=(n, n))
    return ((f - f.mean()) / f.std()).astype(np.float32)


def test_gaussian_field_matches_theory():
    f = _grf(0)
    mom = jax.tree_util.tree_map(float, map_moments(f))
    assert abs(mom["sigma0"] - 1.0) < 1e-3
    assert abs(mom["skewness"]) < 0.05
    res = minkowski_functionals(f, nbins=24, limits=(-3.0, 3.0))
    nu = res["nu"] / mom["sigma0"]
    v0, v1, v2 = [np.asarray(x) for x in
                  gaussian_minkowski(nu, mom["sigma0"], mom["sigma1"])]
    core = np.abs(nu) < 2.0
    np.testing.assert_allclose(res["V0"][core], v0[core], rtol=0.06)
    np.testing.assert_allclose(res["V1"][core], v1[core], rtol=0.08)
    # genus is the noisiest functional at one realization
    np.testing.assert_allclose(res["V2"][core], v2[core],
                               rtol=0.2, atol=2e-5)


def test_shapes_and_symmetries():
    f = _grf(1, n=256)
    res = minkowski_functionals(f, nbins=20, limits=(-3.0, 3.0))
    assert res["V0"].shape == (20,)
    # V0 monotonically decreasing, from ~1 to ~0
    assert np.all(np.diff(res["V0"]) <= 1e-6)
    assert res["V0"][0] > 0.97 and res["V0"][-1] < 0.03
    # V1 >= 0 and peaks near nu = 0
    assert np.all(res["V1"] >= -1e-8)
    assert abs(res["nu"][np.argmax(res["V1"])]) < 0.5
    # V2 changes sign at nu = 0 (positive tail = peaks, negative = holes)
    assert res["V2"][-1] > 0 and res["V2"][0] < 0


def test_opening_angle_scaling():
    """Per-radian derivatives rescale V1 by 1/pix and V2 by 1/pix^2."""
    f = _grf(2, n=256)
    a = minkowski_functionals(f, nbins=16, limits=(-2.0, 2.0))
    oa = 5.0
    pix = np.deg2rad(oa) / 256
    b = minkowski_functionals(f, nbins=16, limits=(-2.0, 2.0),
                              opening_angle_deg=oa)
    np.testing.assert_allclose(b["V0"], a["V0"], rtol=1e-5)
    np.testing.assert_allclose(b["V1"], a["V1"] / pix, rtol=1e-4)
    np.testing.assert_allclose(b["V2"], a["V2"] / pix ** 2, rtol=1e-3,
                               atol=1e-3 * np.max(np.abs(a["V2"])) / pix**2)


def test_facade_method():
    from astrild_tpu.models.skymap import SkyArray
    f = _grf(3, n=256)
    sky = SkyArray.from_array(f, opening_angle=10.0, quantity="kappa_2")
    res = sky.minkowski_functionals(nbins=12)
    assert set(res) == {"nu", "V0", "V1", "V2"}
    assert res["V0"].shape == (12,)


def test_map_moments_nongaussian():
    """Skewness of an exponentiated GRF is positive and kurtosis > 0."""
    f = _grf(4, n=256)
    g = np.expm1(0.5 * f)
    mom = jax.tree_util.tree_map(float, map_moments(g))
    assert mom["skewness"] > 0.5
    assert mom["kurtosis"] > 0.3
