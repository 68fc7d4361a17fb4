from . import (angular_power, bispectrum, filters, halo_stats, lensing,
               linear_power, paint, pairwise, peaks, power, profiles, tpcf,
               voids)

__all__ = ["angular_power", "bispectrum", "filters", "halo_stats", "lensing",
           "linear_power", "paint", "pairwise", "peaks", "power", "profiles",
           "tpcf", "voids"]
