"""Native C++ kernels vs JAX ops: cross-validation (the point of having
the native implementations)."""
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_kappa_to_alpha_matches_jax():
    import jax.numpy as jnp

    from astrild_tpu.ops import lensing as L

    n = 64
    rng = np.random.default_rng(0)
    e = (np.arange(n) + 0.5) / n - 0.5
    r2 = e[:, None] ** 2 + e[None, :] ** 2
    kappa = np.exp(-r2 / (2 * 0.05 ** 2))
    oa = 1.0
    a1c, a2c = native.kappa_to_alphas(kappa, oa)
    a1j, a2j = L.kappa_to_alpha(jnp.asarray(kappa, jnp.float32), oa,
                                padding_factor=4)
    # two independent implementations (real-space kernel conv in C++ vs
    # spectral in JAX) of the same operator
    scale = np.abs(a1c).max()
    npt.assert_allclose(np.asarray(a1j), a1c, atol=0.03 * scale)
    npt.assert_allclose(np.asarray(a2j), a2c, atol=0.03 * scale)


def test_native_kappa_to_phi_gradient_is_alpha():
    # grad phi ~ alpha (both from the native lib): internal consistency
    n = 64
    e = (np.arange(n) + 0.5) / n - 0.5
    r2 = e[:, None] ** 2 + e[None, :] ** 2
    kappa = np.exp(-r2 / (2 * 0.08 ** 2))
    oa = 1.0
    ds = oa / n
    phi = native.kappa_to_phi(kappa, oa)
    a1, a2 = native.kappa_to_alphas(kappa, oa)
    # phi kernel ln r / pi has gradient x/(pi r^2): d(phi)/dx = alpha/2?
    # No: lap phi = 2 kappa with kernel 2*ln r/(2 pi)... our phi kernel is
    # ln(r)/pi -> lap phi = 2 kappa, grad phi = alpha. Check interior.
    g1 = np.gradient(phi, ds, axis=0)
    g2 = np.gradient(phi, ds, axis=1)
    c = n // 2
    sl = np.s_[c - 12:c + 12, c - 12:c + 12]
    scale = np.abs(a1[sl]).max()
    npt.assert_allclose(g1[sl], a1[sl], atol=0.05 * scale)
    npt.assert_allclose(g2[sl], a2[sl], atol=0.05 * scale)


def test_native_pairwise_matches_reference_golden():
    n = 2000
    pos = np.zeros((n, 3))
    pos[:, 0] = np.linspace(-10, 10, n)
    pos[:1000, 1] = -5
    pos[1000:, 1] = np.linspace(5, 50, 1000)
    pos[:, 2] = 500
    tvel = np.zeros((n, 2))
    tvel[:1000, 1] = 100
    tvel[1000:, 1] = -100
    # same spherical->cartesian embedding as ops.pairwise.mean_pv_from_tv
    import jax.numpy as jnp

    from astrild_tpu.utils.geometry import (angular_coordinate_in_lc,
                                            convert_vec_sph_to_cart)

    t1, t2 = angular_coordinate_in_lc(jnp.asarray(pos), unit="rad")
    t1 = np.asarray(t1) + np.deg2rad(10)
    t2 = np.asarray(t2) + np.deg2rad(10)
    vel_sph = np.hstack([np.zeros((n, 1)), tvel])
    vel_cart = np.asarray(convert_vec_sph_to_cart(
        jnp.asarray(t2), jnp.asarray(t1), jnp.asarray(vel_sph)))
    bins = np.linspace(0, 50, 40)
    rsep, v12 = native.pairwise_velocity(pos, vel_cart, bins)
    npt.assert_allclose(v12[0], -9.98742453e-02, rtol=1e-6)
    npt.assert_allclose(v12[-1], -1.80198033658e+02, rtol=1e-6)


def test_native_pairwise_matches_jax_kernel(rng):
    import jax.numpy as jnp

    from astrild_tpu.ops import pairwise as PW

    n = 500
    pos = rng.uniform(400, 600, (n, 3))
    vel = rng.normal(0, 100, (n, 3))
    bins = np.linspace(0, 100, 20)
    r_c, v_c = native.pairwise_velocity(pos, vel, bins)
    r_j, v_j = PW.mean_pairwise_velocity(jnp.asarray(pos, jnp.float32),
                                         jnp.asarray(vel, jnp.float32),
                                         jnp.asarray(bins))
    good = np.isfinite(v_c) & np.isfinite(np.asarray(v_j))
    npt.assert_allclose(np.asarray(v_j)[good], v_c[good], rtol=2e-3,
                        atol=0.5)


def test_native_f77_reader():
    import struct

    vals = np.arange(10.0)
    buf = (struct.pack("i", 40) + vals[:5].tobytes() + struct.pack("i", 40)
           + struct.pack("i", 40) + vals[5:].tobytes()
           + struct.pack("i", 40))
    out = native.read_f77_doubles(buf, 100)
    npt.assert_array_equal(out, vals)
