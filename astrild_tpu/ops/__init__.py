from . import (angular_power, bispectrum, filters, halo_stats, lensing,
               linear_power, map_transform, object_selection, paint,
               pairwise, peaks, power, profiles, profiles3d, tpcf, troughs,
               voids)

__all__ = ["angular_power", "bispectrum", "filters", "halo_stats", "lensing",
           "linear_power", "map_transform", "object_selection", "paint",
           "pairwise", "peaks", "power", "profiles", "profiles3d", "tpcf",
           "troughs", "voids"]
