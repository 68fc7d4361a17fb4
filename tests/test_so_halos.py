"""Spherical-overdensity halo finder tests.

Validation ladder: (1) closed-form uniform ball — R_Delta has an exact
analytic value, pinning the crossing scan and the mass convention; (2)
NFW particle mock — a realistic profile painted through ops.paint,
recovered mass/center within paint-resolution tolerances; (3) greedy
exclusivity on an engineered double peak; (4) the forward-model loop:
a PM snapshot's mass function against theory_hmf in the resolved band.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from astrild_tpu.ops.so_halos import so_halos, so_catalog_dict
from astrild_tpu.ops.paint import paint
from astrild_tpu.utils.constants import RHO_CRIT0


def _ball_delta(ngrid, boxsize, center, r_ball, delta0):
    cell = boxsize / ngrid
    x = (np.arange(ngrid) + 0.5) * cell
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    d = np.zeros((3,) + X.shape, np.float64)
    for i, (g, c) in enumerate(zip((X, Y, Z), center)):
        dd = np.abs(g - c)
        d[i] = np.minimum(dd, boxsize - dd)
    r = np.sqrt((d ** 2).sum(axis=0))
    return jnp.asarray(np.where(r < r_ball, delta0, 0.0), jnp.float32)


def test_uniform_ball_closed_form():
    # enclosed contrast of a uniform ball: delta0 (R_b/r)^3 for r > R_b
    # => R_Delta = R_b (delta0/(Delta-1))^(1/3), M = 4pi/3 R^3 Delta rho_m
    n, box, om0 = 96, 100.0, 0.3
    r_b, delta0 = 3.0, 2000.0
    delta = _ball_delta(n, box, (50.0, 50.0, 50.0), r_b, delta0)
    cat = so_halos(delta, box, om0, delta_mean=200.0, max_halos=16,
                   n_radii=48)
    assert int(cat.n) == 1
    r_th = r_b * (delta0 / 199.0) ** (1.0 / 3.0)
    assert abs(float(cat.radius[0]) / r_th - 1.0) < 0.05, (
        float(cat.radius[0]), r_th)
    m_th = 4.0 / 3.0 * np.pi * r_th ** 3 * 200.0 * om0 * RHO_CRIT0
    assert abs(float(cat.mass[0]) / m_th - 1.0) < 0.16
    assert np.allclose(np.asarray(cat.pos[0]), 50.0, atol=box / n)


def _nfw_particles(rng, n_p, m200m, c, om0, center, boxsize):
    """Inverse-transform sample of an NFW profile truncated at R200m."""
    rho_m = om0 * RHO_CRIT0
    r200 = (3.0 * m200m / (4.0 * np.pi * 200.0 * rho_m)) ** (1.0 / 3.0)
    x_tab = np.linspace(1e-3, 1.0, 2048)
    mu = np.log(1.0 + c * x_tab) - c * x_tab / (1.0 + c * x_tab)
    mu /= mu[-1]
    u = rng.uniform(size=n_p)
    x = np.interp(u, mu, x_tab)
    r = x * r200
    phi = rng.uniform(0, 2 * np.pi, n_p)
    cth = rng.uniform(-1, 1, n_p)
    sth = np.sqrt(1 - cth ** 2)
    off = np.stack([r * sth * np.cos(phi), r * sth * np.sin(phi),
                    r * cth], axis=-1)
    return (np.asarray(center) + off) % boxsize, r200


def test_nfw_mock_recovery():
    n, box, om0 = 96, 60.0, 0.3
    rho_m = om0 * RHO_CRIT0
    m200 = 3.0e14
    rng = np.random.default_rng(3)
    halo, r200 = _nfw_particles(rng, 60000, m200, 6.0, om0,
                                (30.0, 30.0, 30.0), box)
    # particle mass such that the halo is the stated m200
    m_p = m200 / 60000
    n_bg = int(rho_m * box ** 3 / m_p) - 60000
    # background thinned 100x with weight 100 to keep the test light
    bg = rng.uniform(0, box, (n_bg // 100, 3))
    pos = np.concatenate([halo, bg]).astype(np.float32)
    w = np.concatenate([np.ones(len(halo)),
                        np.full(len(bg), 100.0)]).astype(np.float32)
    grid = paint((jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
                  jnp.asarray(pos[:, 2])), n, box,
                 weights=jnp.asarray(w), window="cic")
    delta = grid / grid.mean() - 1.0
    cat = so_halos(delta, box, om0, delta_mean=200.0, max_halos=32,
                   n_radii=48)
    assert int(cat.n) >= 1
    # the most massive object is the injected halo
    assert np.allclose(np.asarray(cat.pos[0]), 30.0, atol=1.5 * box / n)
    assert abs(float(cat.radius[0]) / r200 - 1.0) < 0.08, (
        float(cat.radius[0]), r200)
    assert abs(float(cat.mass[0]) / m200 - 1.0) < 0.25
    d = so_catalog_dict(cat)
    assert len(d["mass"]) == int(cat.n)
    assert d["mass"][0] == float(cat.mass[0])
    dr = so_catalog_dict(cat, rockstar_names=True)
    assert np.array_equal(dr["m200c"], dr["mass"])
    assert np.array_equal(dr["r200c"], dr["radius"])


def test_exclusivity_absorbs_substructure():
    # two balls, the smaller center inside the larger R_Delta: one halo
    n, box, om0 = 96, 100.0, 0.3
    d1 = _ball_delta(n, box, (50.0, 50.0, 50.0), 3.0, 2000.0)
    d2 = _ball_delta(n, box, (54.0, 50.0, 50.0), 1.8, 2000.0)
    cat = so_halos(d1 + d2, box, om0, max_halos=16, n_radii=48)
    # big ball's R_Delta ~ 6.5 Mpc/h covers the secondary peak at 4
    assert int(cat.n) == 1
    # far-separated twin survives
    d3 = _ball_delta(n, box, (20.0, 20.0, 20.0), 3.0, 2000.0)
    cat2 = so_halos(d1 + d3, box, om0, max_halos=16, n_radii=48)
    assert int(cat2.n) == 2


def test_so_catalog_feeds_hod_pipeline():
    # composability: SO halos (Rockstar-schema) -> Zheng+07 HOD mock ->
    # galaxy P(k), all through public APIs. Galaxy bias of cluster-mass
    # hosts must exceed 1 (galaxy P > matter P at large scales).
    from astrild_tpu.ops.hod import HODParams, hod_populate
    from astrild_tpu.ops.power import auto_power
    n, box, om0 = 96, 100.0, 0.3
    rng = np.random.default_rng(5)
    rho_m = om0 * RHO_CRIT0
    centers = rng.uniform(10, 90, (12, 3))
    # R200m(8e14) = 2.2 cells at this grid — above the finder's
    # 1.5-cell radius floor (2e14 would be 1.4 cells: invisible)
    halos = []
    for c in centers:
        h, _ = _nfw_particles(rng, 4000, 8.0e14, 6.0, om0, c, box)
        halos.append(h)
    m_p = 8.0e14 / 4000
    n_bg = int(rho_m * box ** 3 / m_p) - 12 * 4000
    bg = rng.uniform(0, box, (max(n_bg, 0) // 200, 3))
    pos = np.concatenate(halos + [bg]).astype(np.float32)
    w = np.concatenate([np.ones(12 * 4000),
                        np.full(len(bg), 200.0)]).astype(np.float32)
    grid = paint((jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
                  jnp.asarray(pos[:, 2])), n, box,
                 weights=jnp.asarray(w), window="cic")
    delta = grid / grid.mean() - 1.0
    cat = so_halos(delta, box, om0, max_halos=64, n_radii=48)
    nh = int(cat.n)
    assert nh >= 10
    d = so_catalog_dict(cat)
    zeros = np.zeros(nh, np.float32)
    gal = hod_populate(jax.random.PRNGKey(1), d["mass"], d["x"], d["y"],
                       d["z"], zeros, zeros, zeros, d["radius"],
                       np.full(nh, 6.0, np.float32), box,
                       params=HODParams(), max_sat=32)
    assert int(gal["n_gal"]) >= nh  # every cluster hosts a central
    v = np.asarray(gal["valid"])
    gx = (jnp.asarray(np.asarray(gal["gx"])[v]),
          jnp.asarray(np.asarray(gal["gy"])[v]),
          jnp.asarray(np.asarray(gal["gz"])[v]))
    ggrid = paint(gx, 48, box, window="cic")
    k, p_g, _ = auto_power(ggrid, box, nbins=8)
    _, p_m, _ = auto_power(jax.image.resize(grid, (48, 48, 48),
                                            "linear"), box, nbins=8)
    # shot-noise-subtract the sparse galaxy spectrum
    shot = box ** 3 / float(v.sum())
    b2 = (np.asarray(p_g)[1:4] - shot) / np.asarray(p_m)[1:4]
    assert b2.mean() > 1.0, b2


@pytest.mark.slow
@pytest.mark.slow
def test_pm_snapshot_hmf_matches_theory():
    # the full forward-model loop: linear P(k) -> PM snapshot ->
    # SO catalog -> n(>M) vs the Tinker08 HMF in the resolved band.
    # One 100 Mpc/h box: Poisson + sample variance dominate, so the
    # band is generous — the test catches convention-level errors
    # (mass definition, rho_mean, radius scaling), not 10% cosmology.
    from astrild_tpu.ops import nbody
    from astrild_tpu.ops.halo_stats import theory_hmf
    from astrild_tpu.ops.linear_power import linear_power, normalization
    from astrild_tpu.utils.cosmology import Cosmology
    cosmo = Cosmology(Om0=0.3, h=0.7)
    amp = float(normalization(cosmo))

    def pk(k):
        return linear_power(k, cosmo, 0.0, amplitude=amp)

    npart, box = 64, 100.0
    comps, vel = nbody.pm_catalog(jax.random.PRNGKey(8), cosmo, pk,
                                  npart, box, z_init=19.0, nsteps=20)
    # finder grid finer than the particle grid so its r_min floor
    # (1.5 cells) sits BELOW the 150-particle mass floor — at equal
    # grids the geometric floor is ~1.1e14 and silently dominates
    ngrid = 192
    grid = paint(comps, ngrid, box, window="cic")
    delta = grid / grid.mean() - 1.0
    cat = so_halos(delta, box, float(cosmo.Om0), delta_mean=200.0,
                   max_halos=512, n_radii=40)
    masses = np.asarray(cat.mass)[: int(cat.n)]
    m_p = cosmo.Om0 * RHO_CRIT0 * box ** 3 / npart ** 3

    def n_above(m_lo):
        lnm = np.linspace(np.log(m_lo), np.log(3e15), 64)
        dndlnm = np.asarray(theory_hmf(np.exp(lnm), cosmo, 0.0,
                                       model="tinker08"))
        meas = int((masses > m_lo).sum())
        return meas, float(np.trapezoid(dndlnm, lnm)) * box ** 3

    # well-resolved high masses track Tinker (measured 4 vs 4.2 at
    # 1000 particles); Poisson bounds on an expectation of ~4
    meas_hi, th_hi = n_above(1000.0 * m_p)
    assert 1 <= meas_hi <= 12, (meas_hi, th_hi)
    # lower masses carry the known 1:1-PM force-resolution deficit
    # (~0.5x); over-production or a mass-convention error would leave
    # the band (measured 41 vs 85 at this seed)
    meas_lo, th_lo = n_above(150.0 * m_p)
    assert 0.25 < meas_lo / th_lo < 1.5, (meas_lo, th_lo)
