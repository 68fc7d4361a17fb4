from . import mesh, pfft, power
from .mesh import make_mesh, auto_mesh, sim_axis_mesh

__all__ = ["mesh", "pfft", "power", "make_mesh", "auto_mesh", "sim_axis_mesh"]
