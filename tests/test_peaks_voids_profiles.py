"""Peaks / tunnels voids / watershed / radial profiles tests."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from astrild_tpu.ops import peaks as PK
from astrild_tpu.ops import profiles as PR
from astrild_tpu.ops import voids as V


def make_blob_map(n, centers, amp=1.0, sigma=3.0):
    e = np.arange(n)
    img = np.zeros((n, n), np.float32)
    for (r, c) in centers:
        img += amp * np.exp(-(((e[:, None] - r) ** 2 + (e[None, :] - c) ** 2)
                              / (2 * sigma ** 2)))
    return img


# ------------------------------------------------------------------- peaks
def test_find_peaks_known_blobs():
    centers = [(20, 30), (50, 60), (90, 10)]
    img = jnp.asarray(make_blob_map(128, centers))
    cat = PK.find_peaks(img, threshold=0.5, max_peaks=16)
    assert int(cat.n) == 3
    got = sorted(map(tuple, np.asarray(cat.pos[:3]).tolist()))
    assert got == sorted(centers)


def test_find_peaks_edge_trim():
    centers = [(2, 2), (50, 60)]
    img = jnp.asarray(make_blob_map(128, centers))
    cat = PK.find_peaks(img, threshold=0.5, max_peaks=16, edge_pix=5)
    assert int(cat.n) == 1
    assert tuple(np.asarray(cat.pos[0])) == (50, 60)


def test_peak_snr_matches_std():
    img = jnp.asarray(make_blob_map(64, [(32, 32)]))
    cat = PK.find_peaks(img, threshold=0.5, max_peaks=4)
    expect = float(img[32, 32] / jnp.std(img))
    npt.assert_allclose(float(cat.snr[0]), expect, rtol=1e-5)


def test_peak_counts_histogram():
    centers = [(20, 30), (50, 60), (90, 10)]
    img = jnp.asarray(make_blob_map(128, centers))
    c, h = PK.peak_counts(img, 0.5, 1.5, nbins=10)
    assert float(jnp.sum(h)) == 3.0  # three unit-amplitude peaks


# ----------------------------------------------------------------- tunnels
def test_distance_transform_exact():
    pos = jnp.array([[10.0, 10.0], [40.0, 50.0]])
    valid = jnp.array([True, True])
    d = V.distance_transform(pos, valid, 64)
    npt.assert_allclose(float(d[10, 10]), 0.0, atol=1e-3)
    npt.assert_allclose(float(d[10, 20]), 10.0, rtol=1e-5)
    npt.assert_allclose(float(d[25, 30]), min(np.hypot(15, 20),
                                              np.hypot(15, 20)), rtol=1e-5)


def test_find_tunnels_empty_region():
    # tracers on a ring -> one big void at the center
    n = 64
    theta = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    pos = np.stack([32 + 25 * np.sin(theta), 32 + 25 * np.cos(theta)], -1)
    cat = V.find_tunnels(jnp.asarray(pos, jnp.float32),
                         jnp.ones(24, bool), n, max_voids=64)
    assert int(cat.n) >= 1
    # largest void centered near (32, 32) with radius ~ 25
    npt.assert_allclose(np.asarray(cat.pos[0]), [32, 32], atol=1.5)
    npt.assert_allclose(float(cat.radius[0]), 25.0, rtol=0.05)


def test_find_tunnels_overlap_pruning():
    # two tracers far apart: many candidate circles, but overlapping ones
    # must be pruned
    pos = jnp.array([[16.0, 16.0], [48.0, 48.0]])
    cat = V.find_tunnels(pos, jnp.ones(2, bool), 64, max_voids=64,
                         overlap=0.2)
    r = np.asarray(cat.radius[: int(cat.n)])
    c = np.asarray(cat.pos[: int(cat.n)])
    # check pairwise overlap constraint holds among accepted voids
    for i in range(len(r)):
        for j in range(len(r)):
            if i == j:
                continue
            f = V.circle_overlap_fraction(jnp.asarray(c[i]), r[i],
                                          jnp.asarray(c[j]), r[j])
            assert float(f) <= 0.2 + 1e-3


def test_circle_overlap_fraction_cases():
    c0 = jnp.array([0.0, 0.0])
    # identical circles -> 1
    npt.assert_allclose(float(V.circle_overlap_fraction(c0, 1.0, c0, 1.0)),
                        1.0, atol=1e-6)
    # disjoint -> 0
    f = V.circle_overlap_fraction(c0, 1.0, jnp.array([5.0, 0.0]), 1.0)
    npt.assert_allclose(float(f), 0.0, atol=1e-6)
    # half-offset known value
    f = V.circle_overlap_fraction(c0, 1.0, jnp.array([1.0, 0.0]), 1.0)
    expect = (2 * np.arccos(0.5) - np.sqrt(3) / 2 * 2 / 2) / np.pi
    # lens area for d=r1=r2=1: 2 r^2 cos^-1(d/2r) - d/2 sqrt(4r^2-d^2)
    expect = (2 * np.arccos(0.5) - 0.5 * np.sqrt(3)) / np.pi
    npt.assert_allclose(float(f), expect, rtol=1e-4)


# --------------------------------------------------------------- watershed
def test_watershed_two_basins():
    # two gaussian wells -> two dominant basins
    n = 64
    img = -make_blob_map(n, [(16, 16), (48, 48)], sigma=6.0)
    labels = np.asarray(V.watershed_labels(jnp.asarray(img)))
    # pixels at the two minima map to themselves
    assert labels[16, 16] == 16 * n + 16
    assert labels[48, 48] == 48 * n + 48
    # well interiors belong to their basin
    assert labels[20, 20] == 16 * n + 16
    assert labels[44, 44] == 48 * n + 48


def test_watershed_voids_catalog():
    n = 64
    img = -make_blob_map(n, [(16, 16), (48, 48)], sigma=6.0)
    cat = V.watershed_voids(jnp.asarray(img), max_voids=8)
    assert int(cat.n) >= 2
    pos = np.asarray(cat.pos[:2]).tolist()
    assert [16.0, 16.0] in pos and [48.0, 48.0] in pos


# ---------------------------------------------------------------- profiles
def test_object_profiles_radial_step():
    # map = 1 inside r<R, 0 outside: profile must step from 1 to 0 at eta=1
    n = 128
    e = np.arange(n)
    R = 10.0
    r = np.sqrt((e[:, None] - 64.0) ** 2 + (e[None, :] - 64.0) ** 2)
    img = jnp.asarray((r < R).astype(np.float32))
    eta, vals = PR.object_profiles(
        img, jnp.array([[64, 64]]), jnp.array([R]), patch_half=25,
        nbins=10, extend=2.0)
    v = np.asarray(vals[0])
    npt.assert_allclose(v[:4], 1.0, atol=0.05)   # inside
    npt.assert_allclose(v[6:], 0.0, atol=0.05)   # outside


def test_object_profiles_vmap_multiple():
    n = 128
    img = jnp.asarray(np.ones((n, n), np.float32) * 3.0)
    centers = jnp.array([[30, 30], [90, 90], [64, 64]])
    radii = jnp.array([5.0, 8.0, 12.0])
    eta, vals = PR.object_profiles(img, centers, radii, patch_half=30,
                                   nbins=8, extend=2.0)
    npt.assert_allclose(np.asarray(vals), 3.0, atol=1e-5)


def test_mean_and_interpolate_nan_fill():
    p = jnp.array([[1.0, jnp.nan, 3.0, 4.0],
                   [1.0, jnp.nan, 5.0, 4.0]])
    out = np.asarray(PR.mean_and_interpolate(p))
    npt.assert_allclose(out[0], 1.0)
    npt.assert_allclose(out[2], 4.0)
    npt.assert_allclose(out[1], 2.5, atol=1e-5)  # linear fill between 1 and 4


def test_bootstrap_profiles_brackets_mean(rng):
    profiles = jnp.asarray(rng.normal(2.0, 0.1, (64, 6)).astype(np.float32))
    centers = jnp.asarray(rng.integers(0, 512, (64, 2)).astype(np.int32))
    lo, hi = PR.bootstrap_profiles(profiles, centers, jax.random.PRNGKey(0),
                                   n_boot=50, block_pix=128, npix=512)
    assert np.all(np.asarray(lo) < 2.05)
    assert np.all(np.asarray(hi) > 1.95)
    assert np.all(np.asarray(lo) <= np.asarray(hi))


def test_tangential_shear_uniform_kappa_is_zero():
    eta = jnp.linspace(0.1, 2.0, 10)
    kappa = jnp.ones((10,)) * 0.3
    gt = np.asarray(PR.tangential_shear(eta, kappa))
    npt.assert_allclose(gt, 0.0, atol=1e-6)


def test_tangential_shear_central_overdensity():
    # kappa concentrated at center -> positive gamma_t outside
    eta = jnp.linspace(0.1, 2.0, 10)
    kappa = jnp.zeros((10,)).at[0].set(1.0)
    gt = np.asarray(PR.tangential_shear(eta, kappa))
    assert np.all(gt[1:] > 0)


def test_voids_selection_methods():
    """Voids categorize_sizes/filter_size/filter_sigma (void.py:433-493)."""
    from astrild_tpu.models import Voids

    n = 40
    rng = np.random.default_rng(3)
    data = {"rad_deg": 10 ** rng.uniform(-1.5, 0.0, n),
            "rad_pix": rng.uniform(3, 60, n),
            "sigma": np.repeat([0.0, 1.0], n // 2)}
    v = Voids(dict(data), finder="tunnels")
    v.categorize_sizes(bins=4, min_obj_nr=2)
    assert "size_cat" in v.data and len(v.data["rad_deg"]) <= n
    cats = np.unique(v.data["size_cat"])
    sub = v.filter_size(int(cats[0]))
    assert np.all(sub["size_cat"] == cats[0]) and len(sub["rad_deg"]) >= 2
    s0 = v.filter_sigma(0.0)
    assert np.all(s0["sigma"] == 0.0)


def test_peaks_txt_and_selection(tmp_path):
    """Peaks.from_txt (peak.py:347-365) + size/sigma selection."""
    from astrild_tpu.models.peaks import Peaks

    rows = np.array([[1.0, 2.0, 3.5], [5.0, 4.0, 4.2], [9.9, 0.1, 2.8]])
    f = str(tmp_path / "peaks.txt")
    np.savetxt(f, rows)
    pk = Peaks.from_txt(f, npix=128, field_width_deg=10.0)
    npt.assert_array_equal(pk.data["x_pix"], [13, 64, 127])
    npt.assert_array_equal(pk.data["y_pix"], [26, 51, 1])
    pk.data["rad_deg"] = np.array([0.1, 0.5, 1.0])
    pk.data["sigma"] = np.array([0.0, 0.0, 3.0])
    pk.categorize_sizes(bins=2, min_obj_nr=1)
    assert "size_cat" in pk.data
    assert len(pk.filter_sigma(0.0)["nu"]) == 2


def test_tunnels_finder_to_file(tmp_path, rng):
    """TunnelsFinder.to_file persists peaks+voids as h5 (tunnel.py:223-248)."""
    from astrild_tpu.io import columnar_h5
    from astrild_tpu.models import SkyArray, TunnelsFinder

    npix = 64
    e = np.arange(npix)
    img = rng.normal(0, 0.005, (npix, npix))
    for (r, c) in [(20, 20), (40, 45)]:
        img += 0.05 * np.exp(-((e[:, None] - r) ** 2
                               + (e[None, :] - c) ** 2) / 8.0)
    sky = SkyArray.from_array(img, 5.0, "kappa_2")
    finder = TunnelsFinder(sky)
    finder.find_peaks(edge_pix=2)
    finder.find_voids(sigmas=[0.0])
    out = str(tmp_path / "cat")
    finder.to_file(out)
    import os

    pk = columnar_h5.read_table(os.path.join(out, "peaks_in_kappa2.h5"))
    vd = columnar_h5.read_table(os.path.join(out, "voids_in_kappa2.h5"))
    assert len(pk["x_pix"]) > 0 and len(vd["rad_pix"]) > 0


def test_radial_velocity_profiles_hubble_outflow():
    """v = H (x - c) around a center gives v_r(r) = H r exactly; the
    periodic wrap must hold across the box boundary."""
    from astrild_tpu.ops import profiles3d as P3

    rng = np.random.default_rng(0)
    L, H = 100.0, 2.0
    pos = rng.uniform(0, L, (20000, 3))
    center = np.array([5.0, 95.0, 50.0])
    dvec = pos - center
    dvec -= L * np.round(dvec / L)
    vel = H * dvec
    r, vr, cnt = P3.radial_velocity_profiles(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(center[None, :]),
        1.0, 30.0, nbins=10, boxsize=L)
    r = np.asarray(r); vr = np.asarray(vr)[0]; cnt = np.asarray(cnt)[0]
    sel = cnt > 50
    # v_r is exactly H*d per particle; binned mean sits at H * <d|bin>,
    # within the log-bin width of H*r_center
    np.testing.assert_allclose(vr[sel], H * r[sel], rtol=0.12)
    # exactness: per-bin mean of H*d equals vr bit-for-bit by construction
    assert np.isfinite(vr[sel]).all()


def test_stacked_profile_weighting():
    from astrild_tpu.ops import profiles3d as P3

    prof = jnp.array([[1.0, jnp.nan], [3.0, 4.0]])
    cnt = jnp.array([[1.0, 0.0], [3.0, 2.0]])
    st = np.asarray(P3.stacked_profile(prof, cnt))
    np.testing.assert_allclose(st, [(1 * 1 + 3 * 3) / 4.0, 4.0])

def test_void_config_templates_and_apply(rng):
    """Shipped {tunnels,svf,zobov}_isw.json templates load by name and
    drive the full profiling recipe (reference configs/svf_isw.json
    contract: extend / nr_profile_bins / nr_radius_bins /
    obj_num_in_radbin)."""
    from astrild_tpu.models import Voids
    from astrild_tpu.models.voids import load_void_config

    for name in ("tunnels_isw", "svf_isw.json", "zobov_isw"):
        cfg = load_void_config(name)
        assert "extend" in cfg and "nr_profile_bins" in cfg

    import pytest
    with pytest.raises(FileNotFoundError):
        load_void_config("no_such_config")

    n = 30
    npix = 128
    data = {"rad_deg": 10 ** rng.uniform(-1.5, 0.0, n),
            "rad_pix": rng.uniform(2, 6, n),
            "x_pix": rng.integers(20, npix - 20, n),
            "y_pix": rng.integers(20, npix - 20, n),
            "sigma": np.repeat([0.0, 1.0], n // 2)}
    img = rng.normal(0.0, 1.0, (npix, npix))

    v = Voids(dict(data), finder="zobov")
    profs = v.apply_profile_config("zobov_isw", skymap=img)
    cfg = load_void_config("zobov_isw")
    assert profs["values"].shape[1] == cfg["nr_profile_bins"]
    assert "size_cat" in v.data          # nr_radius_bins=5 categorized
    assert v.field_conversion == "normalize"

    # svf template: nr_radius_bins=9999 >= catalog size -> no categorization
    v2 = Voids(dict(data), finder="svf")
    p2 = v2.apply_profile_config("svf_isw", skymap=img)
    assert "size_cat" not in v2.data
    assert p2["values"].shape == (n, 20)

def test_candidate_topk_matches_plain_topk(rng):
    """Pooled candidate top_k == lax.top_k on a strict-local-max score
    map (every finite entry is a strict 8-neighbourhood maximum)."""
    import jax
    import jax.numpy as jnp
    from astrild_tpu.ops.peaks import candidate_topk, local_maxima

    n = 512  # the smallest size the pooled path engages
    img = rng.normal(0.0, 1.0, (n, n)).astype(np.float32)
    mask = np.asarray(local_maxima(jnp.asarray(img)))
    score = jnp.where(jnp.asarray(mask), jnp.asarray(img), -jnp.inf)
    want_v, want_i = jax.lax.top_k(score.reshape(-1), 300)
    got_v, got_i = candidate_topk(score, 300)
    npt.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    npt.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # odd-size fallback path
    score_odd = score[:-1, :-1][: n - 1, : n - 1]
    gv, gi = candidate_topk(score_odd, 50)
    wv, wi = jax.lax.top_k(score_odd.reshape(-1), 50)
    npt.assert_array_equal(np.asarray(gv), np.asarray(wv))

def test_void_config_path_and_skymap_guards(tmp_path):
    """A nonexistent path WITH directories must not silently fall back
    to the shipped template; apply_profile_config without skymap raises
    cleanly."""
    from astrild_tpu.models import Voids
    from astrild_tpu.models.voids import load_void_config
    import pytest

    with pytest.raises(FileNotFoundError):
        load_void_config(str(tmp_path / "nodir" / "svf_isw.json"))
    v = Voids({"rad_pix": np.ones(3), "rad_deg": np.ones(3),
               "x_pix": np.ones(3), "y_pix": np.ones(3),
               "sigma": np.zeros(3)}, finder="svf")
    with pytest.raises(ValueError):
        v.apply_profile_config("svf_isw")
