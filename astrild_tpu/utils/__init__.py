from . import analysis, constants, cosmology, geometry, observability
from .cosmology import Cosmology, PLANCK18

__all__ = ["analysis", "constants", "cosmology", "geometry",
           "observability", "Cosmology", "PLANCK18"]
