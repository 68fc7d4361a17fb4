from .catalog import Catalog
from .grid import Grid3D, SkyGrid

__all__ = ["Catalog", "Grid3D", "SkyGrid"]
