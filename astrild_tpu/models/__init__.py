from .dipoles import Dipoles
from .halos import Halos, Rockstar, SubFind
from .peaks import Peaks
from .power import (AngularPowerSpectrum, Bispectrum2D, Bispectrum3D,
                    LinearAngularPowerSpectrum, LinearPowerSpectrum, PowMes,
                    PowerSpectrum3D)
from .simcoll import SimulationCollection
from .lightcone import halo_lightcone_catalog, merge_lightcone_catalogs
from .siminfo import snapshot_info_table, write_snapshot_info
from .simulation import Ecosmog, RayRamses, Simulation
from .skyhealpix import SkyHealpix
from .skymap import SkyArray, SkyMap
from .skynamaster import SkyNamaster
from .voids import TunnelsFinder, Voids, WatershedFinder

__all__ = [
    "Dipoles", "Halos", "Rockstar", "SubFind", "Peaks",
    "AngularPowerSpectrum", "Bispectrum2D", "Bispectrum3D",
    "LinearAngularPowerSpectrum", "LinearPowerSpectrum", "PowMes",
    "PowerSpectrum3D", "SimulationCollection", "Ecosmog", "RayRamses",
    "Simulation", "SkyArray", "SkyMap", "SkyHealpix", "SkyNamaster",
    "TunnelsFinder",
    "Voids", "WatershedFinder", "halo_lightcone_catalog",
    "merge_lightcone_catalogs", "snapshot_info_table",
    "write_snapshot_info",
]
