"""Extra parity pieces: pairwise PDFs, foreground separation, to_gadget."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import filters as F
from astrild_tpu.ops import pairwise as PW


def test_pairwise_pdf_radial_two_particles():
    # two particles approaching along x at distance 5.5: v12 radial = -10
    pos = jnp.asarray([[0.0, 0.0, 0.0], [5.5, 0.0, 0.0]])
    vel = jnp.asarray([[5.0, 0.0, 0.0], [-5.0, 0.0, 0.0]])
    counts = PW.pairwise_velocity_pdf(pos, vel, dist_bin=10, vel_bin=40,
                                      mode="radial")
    # v12 = (v2-v1).(r2-r1)/|r| = (-10*5.5)/5.5 = -10 -> vel bin -10+20=10
    assert float(counts[5, 10]) == 1.0
    assert float(jnp.sum(counts)) == 1.0


def test_pairwise_pdf_z_sign():
    pos = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 4.2]])
    vel = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, -4.0]])
    counts = PW.pairwise_velocity_pdf(pos, vel, dist_bin=10, vel_bin=40,
                                      mode="z_sign")
    # v12 = (v2z - v1z)*sign(r2z-r1z) = -7 -> bin -7+20=13; dist 3.2 -> bin 3
    assert float(counts[3, 13]) == 1.0


def test_pairwise_pdf_total_pairs(rng):
    n = 100
    pos = jnp.asarray(rng.uniform(0, 5.0, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 3.0, (n, 3)).astype(np.float32))
    counts = PW.pairwise_velocity_pdf(pos, vel, dist_bin=20, vel_bin=60,
                                      mode="radial")
    assert float(jnp.sum(counts)) <= n * (n - 1) / 2
    assert float(jnp.sum(counts)) > 0.8 * n * (n - 1) / 2


def test_pairwise_ksz_matches_bruteforce_oracle(rng):
    """Tiled kSZ estimator == O(N^2) numpy double loop, exactly."""
    import jax.numpy as jnp

    from astrild_tpu.ops.pairwise import pairwise_ksz_momentum

    n = 257  # not a block multiple: exercises padding
    pos = rng.uniform(-50, 50, (n, 3)) + np.array([0, 0, 500.0])
    dT = rng.normal(0, 1, n)
    bins = np.arange(0, 10, dtype=np.float64) * 12.0 + 12.0
    rsep, p = pairwise_ksz_momentum(jnp.asarray(pos), jnp.asarray(dT),
                                    jnp.asarray(bins), block=64)
    # oracle
    hat = pos / np.linalg.norm(pos, axis=1, keepdims=True)
    nom = np.zeros(len(bins))
    den = np.zeros(len(bins))
    for i in range(n):
        for j in range(i + 1, n):
            rij = pos[i] - pos[j]
            r = np.linalg.norm(rij)
            b = int(r / 12.0)
            if b >= len(bins):
                continue
            c = 0.5 * np.dot(rij / r, hat[i] + hat[j])
            nom[b] += (dT[i] - dT[j]) * c
            den[b] += c * c
    oracle = np.where(den > 0, nom / np.maximum(den, 1e-30), np.nan)
    np.testing.assert_allclose(np.asarray(p), oracle, rtol=2e-4, atol=1e-6)


def test_pairwise_ksz_recovers_hubble_flow():
    """v = H x and dT_i = -v_i.rhat_i  =>  p_hat(r) ~ -H r in the
    far-field (deep lightcone) limit."""
    import jax.numpy as jnp

    from astrild_tpu.ops.pairwise import pairwise_ksz_momentum

    rng = np.random.default_rng(3)
    n = 1500
    H = 0.5
    pos = rng.uniform(-40, 40, (n, 3)) + np.array([0, 0, 4000.0])
    vel = H * pos
    hat = pos / np.linalg.norm(pos, axis=1, keepdims=True)
    dT = -np.einsum("ij,ij->i", vel, hat)
    bins = (np.arange(8) + 1.0) * 8.0
    rsep, p = pairwise_ksz_momentum(jnp.asarray(pos), jnp.asarray(dT),
                                    jnp.asarray(bins))
    p = np.asarray(p)
    # within a bin pairs weight as ~r^2, so compare against the measured
    # mean pair separation per bin, not the bin center
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    iu = np.triu_indices(n, k=1)
    d = d[iu]
    b = (d / 8.0).astype(int)
    mean_r = np.array([d[b == k].mean() if (b == k).any() else np.nan
                       for k in range(8)])
    sel = ~np.isnan(p) & ~np.isnan(mean_r)
    # c_ij-weighting vs uniform weighting of pairs differs at O(1e-2)
    np.testing.assert_allclose(p[sel], -H * mean_r[sel], rtol=0.02)


def test_pca_foreground_separation_removes_common_mode(rng):
    n = 64
    signal = rng.normal(0, 0.1, (n, n)).astype(np.float32)
    # strong foreground: same pattern in every tile
    tile = rng.normal(0, 5.0, (8, 8)).astype(np.float32)
    fg = np.tile(tile, (8, 8))
    cleaned = np.asarray(F.pca_foreground_separation(
        jnp.asarray(signal + fg), ntiles=8, n_components=2))
    # foreground (dominant common mode) largely removed
    assert cleaned.std() < 0.5 * (signal + fg).std()


def test_dictionary_learning_denoise_runs(rng):
    pytest.importorskip("sklearn")
    n = 32
    clean = rng.normal(0, 1, (n, n)).astype(np.float32)
    noisy = clean + rng.normal(0, 0.1, (n, n)).astype(np.float32)
    out = F.dictionary_learning_denoise(clean, noisy, ntiles=4,
                                        n_components=4)
    assert out.shape == (n, n)
    assert np.all(np.isfinite(out))


def test_ecosmog_to_gadget(tmp_path, rng):
    from astrild_tpu.io.gadget_binary import read_gadget
    from astrild_tpu.models import Ecosmog

    sim = Ecosmog(dir_sim=str(tmp_path), boxsize=100.0)
    pos = rng.uniform(0, 100, (40, 3)).astype(np.float32)
    vel = rng.normal(0, 50, (40, 3)).astype(np.float32)
    p = sim.to_gadget(str(tmp_path / "snap_000"), pos, vel)
    hdr, data = read_gadget(p)
    npt.assert_allclose(data["pos"], pos, rtol=1e-6)
    assert hdr["BoxSize"] == 100.0
    npt.assert_allclose(hdr["Omega0"], sim.cosmo.Om0)
