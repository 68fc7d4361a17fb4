"""Example: multi-chip execution, masked spectra, and full-sky shear.

The round-3 surfaces in one walkthrough:

  1. a virtual 8-device mesh + the COMPOSED distributed z=0 suite
     (P(k) + B(k) + Born kappa/gamma + voids as ONE sharded program);
  2. the multi-host loader path (striped per-"host" snapshot reads
     assembled with make_array_from_process_local_data semantics);
  3. MASTER mode-decoupling of a masked flat-sky spectrum (the working
     version of the reference's never-functional SkyNamaster);
  4. full-sky shear from kappa via spin-2 transforms + E/B spectra.

  python examples/distributed_and_masked.py       (CPU, ~1 min)

On a real pod each host would call `multihost.initialize()` first; the
rest of the code is unchanged (shard_map is controller-agnostic).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from astrild_tpu.models import SkyHealpix, SkyNamaster
from astrild_tpu.ops import angular_power as AP
from astrild_tpu.parallel import make_mesh, multihost
from astrild_tpu.parallel.suite import make_distributed_z0_suite

rng = np.random.default_rng(0)
BOX, NGRID = 500.0, 32

# ---------------------------------------------------------------- 1. suite
multihost.initialize()   # single-process no-op; pod launchers configure it
mesh = make_mesh(n_sim=2, n_x=2, n_y=2)
print(f"mesh: {dict(mesh.shape)} over {jax.device_count()} devices")

pos = rng.uniform(0, BOX, (1 << 17, 3)).astype(np.float32)
suite = make_distributed_z0_suite(mesh, NGRID, BOX, nbins_pk=10,
                                  nbins_bk=3, bk_m_min=2.0, bk_m_max=10.0,
                                  nplanes=8)
sharded = jax.device_put(jnp.asarray(pos),
                         NamedSharding(mesh, P(("sim", "x", "y"), None)))
res = suite(sharded)
print(f"P(k) bins: {np.asarray(res.pk.k).round(3)[:4]} ...")
print(f"B(k) triples: {res.bk.b.shape[0]};  kappa map {res.kappa.shape}; "
      f"voids found: {int(res.n_voids)}")

# ------------------------------------------------ 2. multihost loader path
import h5py
import os
import tempfile

with tempfile.TemporaryDirectory() as td:
    sdir = os.path.join(td, "snapdir_001")
    os.makedirs(sdir)
    for fnr, n_in_file in enumerate((900, 400, 700, 600)):
        with h5py.File(os.path.join(sdir, f"snap_001.{fnr}.hdf5"),
                       "w") as f:
            h = f.create_group("Header")
            h.attrs["NumPart_ThisFile"] = np.array([0, n_in_file, 0, 0,
                                                    0, 0])
            h.attrs["BoxSize"] = BOX
            h.attrs["HubbleParam"] = 1.0
            h.attrs["MassTable"] = np.zeros(6)
            f.create_group("PartType1")["Coordinates"] = rng.uniform(
                0, BOX, (n_in_file, 3))
    data, w = multihost.load_snapshot_sharded(
        1, td, mesh, blocks=("Coordinates",), emulate_hosts=4)
    # flat (x, y, z) buffers straight from the loader — the (N, 3)
    # layout pads its minor dim 42x at production N (CLAUDE.md)
    pos_mh = tuple(data[f"Coordinates:{i}"].astype(jnp.float32)
                   for i in range(3))
    res2 = suite(pos_mh, w)   # zero-weight padding rows are inert
    print(f"loader-fed suite: {int(np.asarray(w).sum())} real particles, "
          f"P(k)[0] = {float(res2.pk.power[0]):.1f}")

# --------------------------------------------------- 3. MASTER decoupling
NPIX, FOV = 128, 10.0
ell_tab = np.linspace(1.0, 40000.0, 1024)
cl_tab = 1.0 / (ell_tab * (ell_tab + 1.0))
img = AP.cl_to_flat_map(jax.random.PRNGKey(1),
                        jnp.asarray(ell_tab, jnp.float32),
                        jnp.asarray(cl_tab, jnp.float32), NPIX, FOV)
mask = np.ones((NPIX, NPIX), np.float32)
mask[:, :30] = 0.0                      # a masked survey edge
sn = SkyNamaster.from_array(np.asarray(img), opening_angle=FOV)
sn.set_mask(mask)
ell_b, cl_w2 = sn.compute_cl(nbins=8, decouple=False)
_, cl_master = sn.compute_cl(nbins=8)   # coupling matrix cached
print("masked Cl, <w^2> vs MASTER (first 4 bins):")
print("  ", np.asarray(cl_w2)[:4])
print("  ", np.asarray(cl_master)[:4])

# ------------------------------------------------- 4. full-sky shear E/B
nside, lmax = 32, 48
ell = np.arange(lmax + 1, dtype=np.float64)
cl_kk = np.zeros(lmax + 1)
cl_kk[2:] = 1.0 / ell[2:] ** 2
sky = SkyHealpix.from_Cl_array(cl_kk, "kappa_2", nside, lmax=lmax,
                               rnd_seed=2)
g1, g2 = sky.shear_from_kappa(lmax=lmax)
ee, bb, eb = sky.shear_eb_spectra(lmax=lmax)
print(f"full-sky shear: gamma maps {g1.shape}, "
      f"B/E power = {bb[2:].sum() / ee[2:].sum():.2e} (Born null)")

# ----------------------------- 5. pod-scale SHT: m-sharded scan path
# The production transforms (nside 1024-2048) spend >90% of their time
# in the per-m-block Legendre/Wigner-d scans; these factories spread the
# blocks over a mesh axis (here the virtual 8-device mesh).
from astrild_tpu.parallel.sht_large import (make_distributed_sht_large,
                                            make_distributed_sht_spin2_large)

lmax_big = 3 * nside - 1                     # healpy's routine band limit
synth, analyze = make_distributed_sht_large(mesh, nside, lmax_big)
rng = np.random.default_rng(5)
tri = np.tril(np.ones((lmax_big + 1, lmax_big + 1), np.float32))
alm_re = rng.standard_normal(tri.shape).astype(np.float32) * tri * 0.1
alm_im = rng.standard_normal(tri.shape).astype(np.float32) * tri * 0.1
alm_im[:, 0] = 0.0
hp_map = synth(alm_re, alm_im)
back_re, back_im = analyze(hp_map, niter=3)  # 'auto' -> cg beyond 2*nside
err = float(np.max(np.abs(np.asarray(back_re) - alm_re)[: 2 * nside]))
print(f"m-sharded SHT (lmax={lmax_big}): map {hp_map.shape}, "
      f"alm recovery err (l < 2*nside) = {err:.1e}")

# ------------------------- 6. masked shear: spin-2 MASTER decoupling
# A mask leaks E into B, so the raw pseudo-BB null test is meaningless;
# the 2x2-block coupling solve recovers EE and restores the null.
g1m = rng.standard_normal((NPIX, NPIX)).astype(np.float32)
g2m = rng.standard_normal((NPIX, NPIX)).astype(np.float32)
ell_s2, ee_hat, bb_hat = sn.compute_cl_spin2(g1m, g2m, nbins=8)
print(f"spin-2 MASTER shear bands: EE[0:3] = {np.asarray(ee_hat)[:3]}, "
      f"BB finite = {bool(np.all(np.isfinite(np.asarray(bb_hat))))}")
