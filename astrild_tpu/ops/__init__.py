from . import filters, lensing, paint, peaks, power, profiles, voids

__all__ = ["filters", "lensing", "paint", "peaks", "power", "profiles",
           "voids"]
