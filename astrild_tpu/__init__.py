"""astrild_tpu — TPU-native cosmological post-processing engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
Christovis/astrild (RAMSES/ECOSMOG/Ray-Ramses post-processing): density
painting, power/bi-spectra on sharded FFTs, weak-lensing map-making, halo
statistics, void finding, radial profiles, and the moving-lens dipole
pipeline — batched with vmap over simulation arrays and sharded with
shard_map over TPU device meshes.
"""

__version__ = "0.1.0"

from .utils import Cosmology  # noqa: F401


def __getattr__(name):
    # Lazy PLANCK18 (PEP 562): constructing it builds distance/growth tables
    # on the active JAX backend, which must not happen at import time.
    if name == "PLANCK18":
        from . import utils

        return utils.PLANCK18
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
