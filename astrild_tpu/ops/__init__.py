from . import (filters, halo_stats, lensing, paint, pairwise, peaks, power,
               profiles, tpcf, voids)

__all__ = ["filters", "halo_stats", "lensing", "paint", "pairwise", "peaks",
           "power", "profiles", "tpcf", "voids"]
