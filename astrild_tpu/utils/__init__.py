from . import analysis, constants, cosmology, geometry, observability
from .cosmology import Cosmology

__all__ = ["analysis", "constants", "cosmology", "geometry",
           "observability", "Cosmology", "PLANCK18"]


def __getattr__(name):
    # PLANCK18 builds device tables; keep imports device-free (PEP 562).
    if name == "PLANCK18":
        return cosmology.PLANCK18
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
