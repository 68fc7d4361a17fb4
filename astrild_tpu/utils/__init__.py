from . import constants, cosmology, geometry
from .cosmology import Cosmology, PLANCK18

__all__ = ["constants", "cosmology", "geometry", "Cosmology", "PLANCK18"]
