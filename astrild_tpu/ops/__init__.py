from . import paint, power

__all__ = ["paint", "power"]
