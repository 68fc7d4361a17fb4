from . import analysis, constants, cosmology, geometry, observability
from .cosmology import Cosmology

# PLANCK18 deliberately NOT in __all__: a star-import would resolve it
# through __getattr__ and build its device tables at import time —
# before drivers configure the backend (platform/device count), pinning
# the slow axon tunnel or making the later config.update raise.
# `from astrild_tpu.utils import PLANCK18` still works lazily.
__all__ = ["analysis", "constants", "cosmology", "geometry",
           "observability", "Cosmology"]


def __getattr__(name):
    # PLANCK18 builds device tables; keep imports device-free (PEP 562).
    if name == "PLANCK18":
        return cosmology.PLANCK18
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
