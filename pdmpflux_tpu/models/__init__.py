"""The PDMP sampler family (cf. SURVEY.md §2 L3, ``/root/reference/src/Samplers/``)."""

from .base import PDMP, resolve_potential
from .zigzag import ZigZag, ZigZagAD
from .bps import BPS, BPSAD
from .boomerang import Boomerang, BoomerangAD
from .ecmc import ForwardECMC, ForwardECMCAD
from .rhmc import RHMC, RHMCAD
from .speedup_zigzag import SpeedUpZigZag, SpeedUpZigZagAD
from .sticky import StickyZigZag, StickyZigZagAD

__all__ = [
    "PDMP",
    "resolve_potential",
    "ZigZag",
    "ZigZagAD",
    "BPS",
    "BPSAD",
    "Boomerang",
    "BoomerangAD",
    "ForwardECMC",
    "ForwardECMCAD",
    "RHMC",
    "RHMCAD",
    "SpeedUpZigZag",
    "SpeedUpZigZagAD",
    "StickyZigZag",
    "StickyZigZagAD",
]
