"""HOD galaxy mocks (ops/hod.py): occupation statistics, NFW satellite
profile, catalog mechanics. Replaces the external-HOD catalogs the
reference read from disk (rays/void.py:83-105)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astrild_tpu.ops import hod
from astrild_tpu.ops.hod import HODParams


def _uniform_halos(key, nh, boxsize=100.0, logm=13.5):
    ks = jax.random.split(key, 4)
    m = jnp.full((nh,), 10.0 ** logm)
    x, y, z = (jax.random.uniform(ks[i], (nh,)) * boxsize for i in range(3))
    v = jax.random.normal(ks[3], (3, nh)) * 300.0
    rvir = jnp.full((nh,), 0.8)
    conc = jnp.full((nh,), 7.0)
    return m, x, y, z, v[0], v[1], v[2], rvir, conc


def test_mean_occupation_formula():
    p = HODParams()
    m = jnp.array([10.0 ** p.log_mmin])
    n_cen, _ = hod.zheng07_mean_occupation(m, p)
    # erf(0) = 0 -> exactly one half at Mmin
    np.testing.assert_allclose(float(n_cen[0]), 0.5, atol=1e-6)
    # below M0 no satellites
    _, n_sat = hod.zheng07_mean_occupation(
        jnp.array([10.0 ** (p.log_m0 - 0.5)]), p)
    assert float(n_sat[0]) == 0.0


def test_occupation_sampling_matches_means():
    p = HODParams(log_mmin=13.0, sigma_logm=0.3, log_m0=12.0,
                  log_m1=13.2, alpha=1.0)
    nh = 40000
    args = _uniform_halos(jax.random.PRNGKey(0), nh, logm=13.2)
    cat = hod.hod_populate(jax.random.PRNGKey(1), *args, 100.0,
                           params=p, max_sat=24)
    n_cen_mean, n_sat_mean = hod.zheng07_mean_occupation(args[0], p)
    cen_frac = float(jnp.mean(cat["valid"][:nh].astype(jnp.float32)))
    exp_cen = float(n_cen_mean[0])
    # binomial std ~ sqrt(p(1-p)/nh) ~ 0.0025
    assert abs(cen_frac - exp_cen) < 0.01
    sat_mean = float(jnp.sum(cat["valid"][nh:].astype(jnp.float32))) / nh
    exp_sat = float(n_sat_mean[0])
    assert abs(sat_mean - exp_sat) / exp_sat < 0.03
    assert int(cat["overflow"]) == 0


def test_nfw_radius_inverse_cdf():
    c = 7.0
    u = jnp.linspace(0.001, 0.999, 2001)
    x_frac = hod.nfw_radius_sample(u, c)   # r / Rvir
    x = np.asarray(x_frac) * c
    mu = lambda t: np.log1p(t) - t / (1.0 + t)
    cdf = mu(x) / mu(c)
    np.testing.assert_allclose(cdf, np.asarray(u), atol=2e-4)


def test_satellites_inside_rvir_and_periodic():
    nh = 500
    boxsize = 50.0
    args = _uniform_halos(jax.random.PRNGKey(2), nh, boxsize, logm=14.0)
    cat = hod.hod_populate(jax.random.PRNGKey(3), *args, boxsize,
                           max_sat=16)
    for k in ("gx", "gy", "gz"):
        g = np.asarray(cat[k])
        assert (g >= 0.0).all() and (g < boxsize).all()
    com = hod.compact_catalog(cat)
    sat = ~com["is_central"]
    hidx = com["halo_index"][sat]
    hx, hy, hz = (np.asarray(a)[hidx] for a in (args[1], args[2], args[3]))
    d = np.zeros(sat.sum())
    for gk, hc in (("gx", hx), ("gy", hy), ("gz", hz)):
        dd = com[gk][sat] - hc
        dd -= boxsize * np.round(dd / boxsize)
        d += dd ** 2
    rvir = np.asarray(args[7])[hidx]
    assert (np.sqrt(d) <= rvir * 1.0001).all()


def test_satellite_velocity_dispersion():
    nh = 2000
    boxsize = 200.0
    m, x, y, z, *_ , rvir, conc = _uniform_halos(
        jax.random.PRNGKey(4), nh, boxsize, logm=14.0)
    zeros = jnp.zeros((nh,))
    cat = hod.hod_populate(jax.random.PRNGKey(5), m, x, y, z,
                           zeros, zeros, zeros, rvir, conc, boxsize,
                           max_sat=16)
    com = hod.compact_catalog(cat)
    sat = ~com["is_central"]
    sigma_exp = np.sqrt(4.30091e-9 * 1e14 / (2 * 0.8))
    for vk in ("gvx", "gvy", "gvz"):
        s = com[vk][sat].std()
        assert abs(s - sigma_exp) / sigma_exp < 0.05


def test_halos_facade_populate_hod():
    from astrild_tpu.models.halos import Halos

    rng = np.random.default_rng(0)
    nh = 300
    data = {
        "m200c": 10 ** rng.uniform(13.0, 14.5, nh),
        "x": rng.uniform(0, 100, nh), "y": rng.uniform(0, 100, nh),
        "z": rng.uniform(0, 100, nh),
        "vx": rng.normal(0, 200, nh), "vy": rng.normal(0, 200, nh),
        "vz": rng.normal(0, 200, nh),
        "r200c": np.full(nh, 500.0),      # kpc/h (Rockstar convention)
        "Rs": np.full(nh, 80.0),          # kpc/h -> conc = 6.25
    }
    halos = Halos(data)
    gal = halos.populate_hod(boxsize=100.0, key=11, max_sat=12)
    assert gal["gx"].shape[0] == gal["valid"].sum()
    assert gal["gx"].shape[0] > nh / 2      # massive halos -> mostly occupied
    assert (gal["gx"] >= 0).all() and (gal["gx"] < 100.0).all()


def test_determinism_and_compact():
    nh = 100
    args = _uniform_halos(jax.random.PRNGKey(6), nh, 100.0)
    a = hod.hod_populate(jax.random.PRNGKey(7), *args, 100.0, max_sat=8)
    b = hod.hod_populate(jax.random.PRNGKey(7), *args, 100.0, max_sat=8)
    np.testing.assert_array_equal(np.asarray(a["gx"]), np.asarray(b["gx"]))
    com = hod.compact_catalog(a)
    assert com["gx"].shape[0] == int(a["n_gal"])
    assert com["valid"].all()


def test_overflow_reported_when_max_sat_too_small():
    nh = 200
    args = _uniform_halos(jax.random.PRNGKey(8), nh, logm=14.8)
    p = HODParams(log_mmin=12.0, sigma_logm=0.2, log_m0=12.0,
                  log_m1=12.8, alpha=1.1)   # <N_sat> ~ 100 at 10^14.8
    cat = hod.hod_populate(jax.random.PRNGKey(9), *args, 100.0,
                           params=p, max_sat=4)
    assert int(cat["overflow"]) > 0
    # valid counts still capped at max_sat per halo
    sat_valid = np.asarray(cat["valid"][nh:]).reshape(nh, 4)
    assert sat_valid.sum(axis=1).max() <= 4
