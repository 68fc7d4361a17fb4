"""Importing the package must do zero device work.

Round-1 regression: ``import astrild_tpu`` eagerly built PLANCK18's
distance/growth tables on the default backend, which crashed the driver's
multi-chip dryrun before it could configure the test mesh (VERDICT r1 §weak 1).
PLANCK18 is now a lazy PEP 562 module attribute at every export level.
"""
import os
import subprocess
import sys

import astrild_tpu


def test_import_creates_no_device_buffers():
    # Run in a clean subprocess: this process's conftest already made arrays.
    # Pin the subprocess to CPU — the assertion is about import purity, and
    # inheriting JAX_PLATFORMS=axon makes the test fail whenever the TPU
    # tunnel is unreachable (an environment outage, not an import impurity).
    code = (
        "import jax\n"
        "import astrild_tpu\n"
        "import astrild_tpu.utils\n"
        "import astrild_tpu.utils.cosmology\n"
        "n = len(jax.live_arrays())\n"
        "assert n == 0, f'{n} device buffers created at import'\n"
        "print('PURE')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # also drop the axon pool address: sitecustomize otherwise performs
    # its tunnel registration handshake in EVERY subprocess, which hangs
    # (not fails) when the tunnel is flapping
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo", env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "PURE" in out.stdout


def test_planck18_lazy_attribute_works():
    cosmo = astrild_tpu.PLANCK18
    assert cosmo is astrild_tpu.utils.PLANCK18
    assert cosmo is astrild_tpu.utils.cosmology.PLANCK18
    assert float(cosmo.comoving_distance(0.0)) == 0.0
