"""Randomized Hamiltonian Monte Carlo as a PDMP.

Counterpart of
``/root/reference/src/Samplers/RandomizedHamiltonianMonteCarlo.jl``:
velocity-Verlet Hamiltonian flow between events, a *constant* Poisson
refresh clock ``rate = refresh_rate`` (:133), and Horowitz partial momentum
refreshment ``v <- cos(phi) v + sin(phi) xi`` at events (:143-148).

Like the reference's specialized ``init_state`` (:194-224), the bound is the
trivial two-point constant box — no optimization, no grid.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.types import BoundBox
from ..ops.flows import make_verlet_flow
from .base import PDMP, resolve_potential


class RHMC(PDMP):
    """Defaults as in ``RandomizedHamiltonianMonteCarlo.jl:48-57``."""

    def __init__(
        self,
        dim,
        grad_U,
        *,
        mean_duration=None,
        refresh_rate=1.0,
        phi=math.pi / 2,
        step_size=0.05,
        tmax=10.0,
        adaptive=False,
        **kw,
    ):
        if mean_duration is not None:
            md = float(mean_duration)
            if not math.isfinite(md) or md <= 0:
                raise ValueError(
                    f"mean_duration must be finite and positive. Current value: {mean_duration}"
                )
            refresh_rate = 1.0 / md
        refresh_rate = float(refresh_rate)
        if not math.isfinite(refresh_rate) or refresh_rate <= 0:
            raise ValueError(
                f"refresh_rate must be finite and positive. Current value: {refresh_rate}"
            )
        phi = float(phi)
        if not (0.0 < phi <= math.pi / 2):
            raise ValueError(f"phi must satisfy 0 < phi <= pi/2. Current value: {phi}")
        step_size = float(step_size)
        if not math.isfinite(step_size) or step_size <= 0:
            raise ValueError(
                f"step_size must be finite and positive. Current value: {step_size}"
            )
        tmax = float(tmax)
        if not math.isfinite(tmax) or tmax < 0:
            raise ValueError(f"tmax must be finite and non-negative. Current value: {tmax}")

        super().__init__(
            dim,
            grad_U,
            grid_size=0,          # constant refresh clock only (:91-94)
            tmax=tmax,
            refresh_rate=refresh_rate,
            vectorized_bound=False,
            signed_bound=False,
            adaptive=adaptive,
            **kw,
        )
        self.phi = phi
        self.step_size = step_size
        self._flow = make_verlet_flow(self.grad_U, step_size)
        self.rate_vect = None
        self.signed_rate = None
        self.signed_rate_vect = None

    def flow(self, x, v, t):
        return self._flow(x, v, t)

    def rate(self, x, v, t):
        return jnp.asarray(self.refresh_rate, x.dtype)

    def bound_box(self, x, v, horizon):
        """Trivial constant box — specialized ``init_state`` (:208-218)."""
        lam = jnp.asarray(self.refresh_rate, x.dtype)
        grid = jnp.stack([jnp.zeros_like(horizon), horizon])
        box = jnp.reshape(lam, (1,))
        cum = jnp.stack([jnp.zeros_like(horizon), lam * horizon])
        return BoundBox(grid=grid, box_max=box, cum_sum=cum, step_size=horizon)

    def velocity_jump(self, x, v, key, is_active):
        xi = jax.random.normal(key, v.shape, v.dtype)
        return math.cos(self.phi) * v + math.sin(self.phi) * xi


def RHMCAD(dim, U, **kw):
    """``RHMCAD`` (``RandomizedHamiltonianMonteCarlo.jl:182-186``)."""
    U_vec, grad_U = resolve_potential(U, dim)
    return RHMC(dim, grad_U, potential=U_vec, **kw)
