from . import bispectrum, lensing, maps, mesh, pairwise, pfft, power, sht
from .mesh import auto_mesh, make_mesh, sim_axis_mesh

__all__ = ["lensing", "maps", "mesh", "pairwise", "pfft", "power", "auto_mesh", "make_mesh",
           "sim_axis_mesh"]
