from . import maps, mesh, pfft, power
from .mesh import auto_mesh, make_mesh, sim_axis_mesh

__all__ = ["maps", "mesh", "pfft", "power", "auto_mesh", "make_mesh",
           "sim_axis_mesh"]
