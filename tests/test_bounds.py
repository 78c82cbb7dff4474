"""Unit tests of the thinning-envelope math (core/bounds.py).

Mirrors the envelope semantics of ``/root/reference/src/UpperBound.jl``,
including hand-computed BoundBox checks and the beyond-horizon Inf case
(SURVEY.md §7 build order M0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdmpflux_tpu.core import bounds


def test_grid_envelope_dominates_rate():
    # rate(t) = (1 + sin 3t)^2 — smooth, non-negative, wiggly
    fn = lambda t: (1.0 + jnp.sin(3.0 * t)) ** 2
    box = bounds.upper_bound_grid(fn, 2.0, 10)
    ts = np.linspace(0, 2.0, 400)
    vals = np.asarray(jax.vmap(fn)(jnp.asarray(ts)))
    seg = np.minimum((ts / float(box.step_size)).astype(int), box.box_max.shape[0] - 1)
    envelope = np.asarray(box.box_max)[seg]
    # The tangent-intersection envelope can undercover only by O(step^2) for
    # smooth rates; allow a tiny slack.
    assert np.all(envelope >= vals - 5e-2)


def test_grid_envelope_exact_for_linear_rate():
    # For an affine rate the per-segment max is exactly max(f_l, f_r).
    fn = lambda t: 1.0 + 2.0 * t
    n = 6
    box = bounds.upper_bound_grid(fn, 1.0, n)
    ts = np.linspace(0, 1.0, n)
    expected = np.maximum(1.0 + 2.0 * ts[:-1], 1.0 + 2.0 * ts[1:])
    np.testing.assert_allclose(np.asarray(box.box_max), expected, rtol=1e-12)
    # cum_sum[0] == 0 and cumulative integral matches
    np.testing.assert_allclose(float(box.cum_sum[0]), 0.0)
    np.testing.assert_allclose(
        np.asarray(box.cum_sum[1:]),
        np.cumsum(expected) * float(box.step_size),
        rtol=1e-12,
    )


def test_refresh_rate_added_scalar_path():
    fn = lambda t: jnp.zeros(())
    box = bounds.upper_bound_grid(fn, 1.0, 5, refresh_rate=0.7)
    np.testing.assert_allclose(np.asarray(box.box_max), 0.7)


def test_vectorized_envelope_sums_dimensions():
    d = 4
    fn = lambda t: jnp.arange(1.0, d + 1) * (1.0 + t)
    box = bounds.upper_bound_grid_vect(fn, 1.0, 5)
    # each dim affine increasing -> per-dim seg max = right endpoint
    ts = np.linspace(0, 1.0, 5)
    expected = np.sum(
        np.arange(1.0, d + 1)[None, :] * (1.0 + ts[1:, None]), axis=1
    )
    np.testing.assert_allclose(np.asarray(box.box_max), expected, rtol=1e-12)


def test_negative_rate_clipped_at_zero():
    fn = lambda t: -1.0 + 0.0 * t
    box = bounds.upper_bound_grid(fn, 1.0, 5)
    np.testing.assert_allclose(np.asarray(box.box_max), 0.0)


def test_next_event_interpolation():
    # Hand-built box: two segments with rates 1 and 3 over [0,1] each.
    box = bounds.BoundBox(
        grid=jnp.array([0.0, 1.0, 2.0]),
        box_max=jnp.array([1.0, 3.0]),
        cum_sum=jnp.array([0.0, 1.0, 4.0]),
        step_size=jnp.asarray(1.0),
    )
    tp, lam = bounds.next_event(box, jnp.asarray(0.5))
    assert np.isclose(float(tp), 0.5) and np.isclose(float(lam), 1.0)
    tp, lam = bounds.next_event(box, jnp.asarray(2.5))
    # 1.0 consumed by segment 1; remaining 1.5 at rate 3 -> t = 1 + 0.5
    assert np.isclose(float(tp), 1.5) and np.isclose(float(lam), 3.0)


def test_next_event_beyond_horizon_inf():
    box = bounds.BoundBox(
        grid=jnp.array([0.0, 1.0]),
        box_max=jnp.array([2.0]),
        cum_sum=jnp.array([0.0, 2.0]),
        step_size=jnp.asarray(1.0),
    )
    tp, lam = bounds.next_event(box, jnp.asarray(5.0))
    assert np.isinf(float(tp)) and np.isclose(float(lam), 2.0)


def test_constant_bound_brackets_max():
    fn = lambda t: jnp.sin(t) + 1.0
    box = bounds.upper_bound_constant(fn, 3.0)
    assert box.box_max.shape == (1,)
    # global max of sin+1 on [0,3] is 2 at t=pi/2
    assert abs(float(box.box_max[0]) - 2.0) < 1e-6
    np.testing.assert_allclose(float(box.cum_sum[1]), float(box.box_max[0]) * 3.0)


def test_finite_diff_mode_matches_jvp_for_smooth_rate():
    fn = lambda t: jnp.exp(-t) * (2.0 + jnp.cos(t))
    b1 = bounds.upper_bound_grid(fn, 2.0, 8, tderiv="jvp")
    b2 = bounds.upper_bound_grid(fn, 2.0, 8, tderiv="finite_diff")
    np.testing.assert_allclose(
        np.asarray(b1.box_max), np.asarray(b2.box_max), rtol=1e-5, atol=1e-7
    )


def test_grid_envelope_vmaps_over_chains():
    def make(offset):
        return bounds.upper_bound_grid(lambda t: (t - offset) ** 2, 1.0, 6)

    boxes = jax.vmap(make)(jnp.array([0.0, 0.5, 1.0]))
    assert boxes.box_max.shape == (3, 5)
