from . import potentials

__all__ = ["potentials"]
