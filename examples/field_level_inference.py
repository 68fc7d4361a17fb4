"""Field-level inference: reconstruct N-body initial conditions by
gradient descent THROUGH the simulation.

jax.grad flows end to end through white noise -> linear modes -> 2LPT
ICs -> KDK PM evolution -> CIC density (ops/field_infer) — the
BORG-style capability the reference's black-box Fortran forward models
(ecosmog.py drives external ECOSMOG/RayRAMSES binaries) could not
express. A 32^3 box: simulate mock data, then recover the initial
field with Adam and report the linear-field cross-correlation.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from astrild_tpu.ops import field_infer, mocks
from astrild_tpu.utils.cosmology import Cosmology

cosmo = Cosmology(Om0=0.3089, h=0.6774, sigma8=0.8159)
BOX = 400.0
NGRID = 32
KW = dict(z_init=9.0, nsteps=4, window="cic")


from astrild_tpu.ops.linear_power import linear_power


def pk(k):
    return linear_power(jnp.maximum(k, 1e-4), cosmo)


# --- mock data: a known initial field, simulated forward + noise ----
truth = jax.random.normal(jax.random.PRNGKey(11), (NGRID,) * 3)
delta_true = field_infer.simulate_density(truth, pk, cosmo,
                                          ngrid=NGRID, boxsize=BOX,
                                          **KW)
noise_var = 1e-2
data = delta_true + np.sqrt(noise_var) * jax.random.normal(
    jax.random.PRNGKey(12), delta_true.shape)
print(f"mock data: {NGRID}^3 box, delta rms = "
      f"{float(jnp.std(delta_true)):.3f}, noise rms = "
      f"{np.sqrt(noise_var):.3f}")

# --- MAP reconstruction through the simulator ----------------------
# two Adam stages (the second warm-started at a lower rate) — the
# annealing the warm-start API exists for
t0 = time.perf_counter()
out = field_infer.infer_initial_field(data, noise_var, pk, cosmo,
                                      boxsize=BOX, n_iter=400,
                                      lr=0.1, **KW)
out = field_infer.infer_initial_field(data, noise_var, pk, cosmo,
                                      boxsize=BOX, n_iter=400,
                                      lr=0.02, white0=out["white"],
                                      **KW)
losses = np.asarray(out["loss"])
print(f"Adam 2x400 iters through the PM simulator: "
      f"{time.perf_counter() - t0:.1f} s "
      f"(final-stage loss {losses[0]:.1f} -> {losses[-1]:.1f})")


def lin_field(w):
    dk = mocks.modes_from_white(jnp.asarray(w), NGRID, BOX, pk)
    return np.asarray(jnp.real(jnp.fft.ifftn(dk))).ravel()


r = np.corrcoef(lin_field(out["white"]), lin_field(truth))[0, 1]
print(f"linear-field cross-correlation (recovered vs truth): {r:.3f}")

# --- posterior sampling: HMC through the simulator ------------------
# warm-started at the MAP; the whitened parameterization doubles as the
# identity-mass preconditioner
t0 = time.perf_counter()
samples, acc = field_infer.sample_initial_field(
    jax.random.PRNGKey(20), data, noise_var, pk, cosmo, boxsize=BOX,
    n_samples=24, n_warmup=24, n_leapfrog=6, white0=out["white"], **KW)
print(f"HMC 48x6 leapfrog steps through the simulator: "
      f"{time.perf_counter() - t0:.1f} s (accept {acc:.2f})")
# per-mode chain std relative to the unit prior. A 24-sample demo chain
# in a 32768-dim space is far from mixed, so the absolute widths are
# LOWER bounds on the posterior width — the physics here is the
# ORDERING: weakly-constrained high-k modes move more than the
# data-pinned low-k modes from the very first samples
dks = np.fft.fftn(np.asarray(samples), axes=(1, 2, 3))
prior_sd = np.sqrt(NGRID ** 3 / 2.0)  # Re-part std of fftn(N(0,1))
sd_rel = dks.real.std(axis=0) / prior_sd
f = np.fft.fftfreq(NGRID) * NGRID
m = np.sqrt(f[:, None, None] ** 2 + f[None, :, None] ** 2
            + f[None, None, :] ** 2)
lowk = sd_rel[(m > 0) & (m < 4)].mean()
highk = sd_rel[m > 12].mean()
print(f"chain mode-amplitude std / prior (short-chain lower bound): "
      f"low-k {lowk:.3f} vs high-k {highk:.3f} "
      f"(high-k/low-k = {highk / lowk:.1f}x)")

# per-k-band mode correlation: low-k modes are recovered ~exactly, the
# falloff toward the grid Nyquist is the expected MAP prior shrinkage of
# weakly-constrained modes (not an optimizer failure)
dk_r = np.fft.fftn(np.asarray(out["white"]))
dk_t = np.fft.fftn(np.asarray(truth))
f = np.fft.fftfreq(NGRID) * NGRID
m = np.sqrt(f[:, None, None] ** 2 + f[None, :, None] ** 2
            + f[None, None, :] ** 2)
for lo, hi in ((0.5, 4), (4, 8), (8, 12), (12, 16)):
    sel = (m >= lo) & (m < hi)
    num = np.real(np.sum(dk_r[sel] * np.conj(dk_t[sel])))
    den = np.sqrt(np.sum(np.abs(dk_r[sel]) ** 2)
                  * np.sum(np.abs(dk_t[sel]) ** 2))
    kf = 2 * np.pi / BOX
    print(f"  mode correlation, k in [{lo * kf:.3f}, {hi * kf:.3f}) "
          f"h/Mpc: {num / den:.3f}")
