"""Canonical test potentials, mirroring ``/root/reference/test/test_config.jl:18-47``
and the README example targets (``README.md:33-80``).

All potentials take a ``(dim,)`` array and return a scalar ``U(x) = -log p(x)``
up to an additive constant.
"""

from __future__ import annotations

import jax.numpy as jnp


def gauss(x):
    """Isotropic standard Gaussian: ``U(x) = |x|^2 / 2``."""
    return jnp.sum(x * x) / 2.0


def gauss_1d(x):
    return jnp.sum(x * x) / 2.0


def banana(x):
    """Banana target of ``test_config.jl:33-36``."""
    mean_x2 = x[0] ** 2 - 1.0
    return -(-x[0] ** 2 - (x[1] - mean_x2) ** 2 - jnp.sum(x[2:] ** 2)) / 2.0


def funnel(x):
    """Neal-style funnel of ``test_config.jl:38-42`` (requires x[0] > 0)."""
    d = x.shape[0]
    v = x[0]
    return v**2 / 2.0 + (d - 1) * jnp.log(v) + jnp.sum(x[1:] ** 2) / (2.0 * v**2)


def neal_funnel(x):
    """Neal's funnel as used by ``test_coverage.jl:66-75``: ``x[0] ~ N(0, 9)``
    and ``x[1:] | x[0] ~ N(0, exp(x[0]) I)``.  Valid on all of R^d (unlike
    :func:`funnel`, which needs ``x[0] > 0``)."""
    d = x.shape[0]
    v = x[0]
    return (v * v / 18.0
            + 0.5 * (d - 1) * v
            + 0.5 * jnp.sum(x[1:] ** 2) * jnp.exp(-v))


def ridged_gauss(x):
    """Gaussian with sinusoidal ridges, ``test_config.jl:44-46``."""
    return jnp.sum(x * x) / 2.0 + 0.1 * jnp.sum(jnp.sin(10.0 * x))


def cauchy(x):
    """Product of standard Cauchy marginals (heavy tails):
    ``U(x) = sum log(1 + x_i^2)``."""
    return jnp.sum(jnp.log1p(x * x))


def anisotropic_gauss(scales):
    """Axis-aligned anisotropic Gaussian with given marginal std devs."""
    s = jnp.asarray(scales)

    def U(x):
        return jnp.sum((x / s) ** 2) / 2.0

    return U
