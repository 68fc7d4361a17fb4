"""Regression tests for the round-3 deep-review findings on the older
ops modules (pairwise, tpcf, raytrace, halo_stats, lens_planes)."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest


def test_pairwise_pdf_rejects_negative_fraction_band(rng):
    """v12+offset in (-1, 0) must NOT land in velocity bin 0 (the int
    cast truncated toward zero; the Cython reference rejects the float)."""
    from astrild_tpu.ops.pairwise import pairwise_velocity_pdf

    # two particles along z, dv_z chosen so v12 = -offset - 0.5
    vel_bin = 10
    offset = vel_bin // 2
    pos = np.array([[0, 0, 10.0], [0, 0, 12.0]], np.float32)
    vel = np.zeros((2, 3), np.float32)
    vel[1, 2] = -(offset + 0.5)  # v12 = (v2-v1).rhat = -5.5
    counts = np.asarray(pairwise_velocity_pdf(
        jnp.asarray(pos), jnp.asarray(vel), dist_bin=5, vel_bin=vel_bin))
    assert counts.sum() == 0.0, counts  # out of range -> rejected
    vel[1, 2] = -(offset - 0.5)  # v12 = -4.5 -> bin 0
    counts = np.asarray(pairwise_velocity_pdf(
        jnp.asarray(pos), jnp.asarray(vel), dist_bin=5, vel_bin=vel_bin))
    assert counts[2, 0] == 1.0, counts


def test_pairwise_tiles_exclude_global_padding(rng):
    """Zero-padded rows must not pair with real rows in the tile path."""
    from astrild_tpu.ops.pairwise import _pairwise_accumulate_tiles

    n_real = 256
    pos = rng.uniform(50, 150, (512, 3)).astype(np.float32)
    vel = rng.normal(0, 100, (512, 3)).astype(np.float32)
    pos[n_real:] = 0.0
    vel[n_real:] = 0.0
    hat = pos / np.maximum(np.linalg.norm(pos, axis=1, keepdims=True),
                           1e-12)
    args = tuple(jnp.asarray(a) for a in (pos, vel, hat))
    # bins reaching |p_i| so phantom pairs WOULD land in-range
    nom_all, den_all = _pairwise_accumulate_tiles(
        *args, *args, 0, 0, nbins=40, binwidth=10.0)
    nom_v, den_v = _pairwise_accumulate_tiles(
        *args, *args, 0, 0, nbins=40, binwidth=10.0,
        n_valid_global=n_real)
    # reference: only the real rows
    argsr = tuple(jnp.asarray(a[:n_real]) for a in (pos, vel, hat))
    nom_r, den_r = _pairwise_accumulate_tiles(
        *argsr, *argsr, 0, 0, nbins=40, binwidth=10.0)
    npt.assert_allclose(np.asarray(nom_v), np.asarray(nom_r), rtol=1e-5)
    npt.assert_allclose(np.asarray(den_v), np.asarray(den_r), rtol=1e-5)
    assert not np.allclose(np.asarray(den_all), np.asarray(den_r))


def test_tpcf_rejects_beyond_half_box(rng):
    from astrild_tpu.ops import tpcf

    pos = rng.uniform(0, 100.0, (256, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        tpcf.tpcf_s_mu(jnp.asarray(pos), 100.0,
                       jnp.asarray(np.linspace(0.0, 80.0, 9)))


def test_to_redshift_space_accepts_numpy(rng):
    from astrild_tpu.ops import tpcf

    pos = rng.uniform(0, 100.0, (64, 3))
    vel = rng.normal(0, 100.0, (64, 3))
    out = tpcf.to_redshift_space(pos, vel, 100.0)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < 100.0))


def test_raytrace_odd_plane_size(rng):
    """Odd map sizes have no Nyquist plane; the deflection solver must
    not delete a legitimate mode row (single-plane limit stays exact)."""
    from astrild_tpu.ops import raytrace

    n = 33
    kappa = rng.normal(0, 0.02, (1, n, n)).astype(np.float32)
    kappa -= kappa.mean()
    out = raytrace.multiplane_raytrace(
        jnp.asarray(kappa), jnp.asarray([1000.0]), jnp.asarray([100.0]),
        2000.0, 0.3, 0.2, padding_factor=1)
    k = np.asarray(out["kappa"])
    assert np.all(np.isfinite(k))
    # Born/single-plane: kappa_out ~ W * kappa_in with W the lensing
    # efficiency; correlation must be essentially exact
    w = np.corrcoef(k.ravel(), kappa[0].ravel())[0, 1]
    assert w > 0.99, w


def test_binned_mean_includes_right_edge():
    from astrild_tpu.ops.halo_stats import binned_mean

    x = jnp.asarray([0.5, 1.5, 2.0])       # 2.0 == edges[-1]
    v = jnp.asarray([1.0, 2.0, 10.0])
    edges = jnp.asarray([0.0, 1.0, 2.0])
    out = np.asarray(binned_mean(x, v, edges, nbins=2))
    npt.assert_allclose(out, [1.0, 6.0])    # last bin: mean(2, 10)


def test_lens_planes_traced_geometry_raises(rng):
    from astrild_tpu.ops import lens_planes as LPL

    pos = jnp.asarray(rng.uniform(0, 100.0, (256, 3)), jnp.float32)

    @jax.jit
    def traced(fov):
        return LPL.density_planes_from_particles(pos, 100.0, 200.0, 50.0,
                                                 2, fov, 16)

    with pytest.raises(ValueError):
        traced(0.5)

    # the explicit-n_rep variant works under jit
    @jax.jit
    def traced_ok(fov):
        return LPL.density_planes_from_particles_nrep(
            pos, 100.0, 200.0, 50.0, 2, fov, 16, n_rep=1)

    planes, _ = traced_ok(0.5)
    assert np.all(np.isfinite(np.asarray(planes)))
