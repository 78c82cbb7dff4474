from . import potentials, profiling

__all__ = ["potentials", "profiling"]
