"""Sticky Zig-Zag tests (engine stick/thaw branches).

Mirrors ``/root/reference/test/test_coverage.jl:224-292`` (the reference's
only sticky coverage: a near-axis run asserting frozen coordinates appear)
and adds a quantitative spike-mass check the reference lacks: for thawing
rate kappa, the sticky Zig-Zag targets the spike-and-slab measure whose
per-coordinate spike probability is ``p(0) / (kappa + p(0))`` with
``p = N(0, 1)`` density for the standard Gaussian potential.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pdmpflux_tpu as pf

DIM = 8


def _sticky_sampler(kappa=1.0):
    return pf.StickyZigZagAD(
        DIM, lambda x: jnp.sum(x**2) / 2, np.full(DIM, kappa)
    )


def test_stick_and_thaw_events_occur():
    sampler = _sticky_sampler()
    skel = pf.sample_skeleton(
        sampler, 1500, np.full(DIM, 0.3), np.ones(DIM), seed=42
    )
    kinds = np.asarray(skel.kind)
    assert np.sum(kinds == pf.EV_STICK) > 10
    assert np.sum(kinds == pf.EV_THAW) > 10
    act = np.asarray(skel.is_active)
    assert np.any(~act), "at least one frozen coordinate must appear"
    t = np.asarray(skel.t)
    assert np.all(np.diff(t) >= 0)
    assert np.all(np.isfinite(np.asarray(skel.x)))


def test_stick_freezes_exactly_at_axis():
    sampler = _sticky_sampler()
    skel = pf.sample_skeleton(
        sampler, 1500, np.full(DIM, 0.3), np.ones(DIM), seed=7
    )
    kinds = np.asarray(skel.kind)
    x = np.asarray(skel.x)
    act = np.asarray(skel.is_active)
    stick_rows = np.where(kinds == pf.EV_STICK)[0]
    # at a stick event the newly frozen coordinate sits exactly on its axis
    for i in stick_rows[:50]:
        frozen_now = ~act[i] & act[i - 1]
        assert frozen_now.sum() == 1
        assert abs(x[i, np.argmax(frozen_now)]) < 1e-9


def test_spike_mass_matches_theory():
    kappa = 1.0
    sampler = _sticky_sampler(kappa)
    skel = pf.sample_skeleton(
        sampler, 6000, np.full(DIM, 0.3), np.ones(DIM), seed=123
    )
    s = np.asarray(pf.sample_from_skeleton(sampler, 20000, skel))
    phi0 = 1.0 / np.sqrt(2 * np.pi)  # N(0,1) density at 0
    expected = phi0 / (kappa + phi0)
    observed = float((s == 0.0).mean())
    assert abs(observed - expected) < 0.08, (observed, expected)
    # slab moments: E[x^2] = (1 - spike) * 1
    assert abs(s.var() - (1 - expected)) < 0.12


def test_frozen_velocity_is_latent():
    # frozen coordinates keep their stored velocity for later thaws
    sampler = _sticky_sampler()
    skel = pf.sample_skeleton(
        sampler, 800, np.full(DIM, 0.2), np.ones(DIM), seed=5
    )
    v = np.asarray(skel.v)
    assert np.all(np.abs(v) == 1.0), "zig-zag velocities stay in {-1, +1}"


def test_kappa_validation():
    with pytest.raises(ValueError):
        pf.StickyZigZag(DIM, lambda x: x, np.ones(DIM - 1))
    with pytest.raises(ValueError):
        pf.StickyZigZag(DIM, lambda x: x, -np.ones(DIM))
