"""Sticky Zig-Zag for sparse (spike-and-slab) posteriors.

Counterpart of ``/root/reference/src/Samplers/StickyZigZagSamplers.jl`` plus
the sticky event loop ``StickySamplingLoop.jl`` — in this engine the sticky
logic (axis-hit sticking, Exp(sum kappa) thaw clocks, activity masking) is
part of the flat transition machine (``core/engine.py``), activated by
``sticky = True``; this class only contributes the Zig-Zag dynamics and the
per-coordinate thawing rates ``kappa``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import resolve_potential
from .zigzag import ZigZag


class StickyZigZag(ZigZag):
    """Defaults as in ``StickyZigZagSamplers.jl:61-74``.

    ``kappa`` is the ``(dim,)`` vector of thawing rates derived from the
    prior inclusion probabilities (StickyZigZagSamplers.jl:11).
    """

    sticky = True

    def __init__(self, dim, grad_U, kappa=None, **kw):
        super().__init__(dim, grad_U, **kw)
        if kappa is None:
            kappa = np.full((dim,), 0.5)
        kappa = np.asarray(kappa, float)
        if kappa.shape != (dim,):
            raise ValueError(
                f"kappa must have shape ({dim},). Current shape: {kappa.shape}"
            )
        if np.any(kappa < 0):
            raise ValueError("kappa entries must be non-negative.")
        self.kappa = jnp.asarray(kappa)


def StickyZigZagAD(dim, U, kappa=None, **kw):
    """``StickyZigZagAD`` (``StickyZigZagSamplers.jl:117-125``)."""
    U_vec, grad_U = resolve_potential(U, dim)
    return StickyZigZag(dim, grad_U, kappa, potential=U_vec, **kw)
