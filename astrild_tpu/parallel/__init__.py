from . import (bispectrum, field_infer, lensing, maps, mesh, multihost,
               nbody, pairwise, pfft, power, sht)
from .mesh import auto_mesh, make_mesh, sim_axis_mesh

__all__ = ["bispectrum", "field_infer", "lensing", "maps", "mesh",
           "multihost", "nbody",
           "pairwise", "pfft", "power", "sht", "auto_mesh", "make_mesh",
           "sim_axis_mesh"]
