from . import filters, lensing, paint, power

__all__ = ["filters", "lensing", "paint", "power"]
