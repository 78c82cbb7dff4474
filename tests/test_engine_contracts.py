"""Engine contracts: overflow reporting, continuation, Kahan timekeeping,
batched interpolation — the robustness tier (cf. reference
``test_error_handling.jl`` / ``test_stability.jl``)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pdmpflux_tpu as pf
from pdmpflux_tpu.parallel.sharded import sample_from_skeleton_batch

DIM = 3


def _gauss_sampler(**kw):
    return pf.ZigZagAD(DIM, lambda x: jnp.sum(x**2) / 2, **kw)


def test_transition_budget_overflow_warns():
    sampler = _gauss_sampler()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        skel = pf.sample_skeleton(
            sampler, 500, np.zeros(DIM), np.ones(DIM), seed=0,
            max_transitions_per_event=1,  # absurdly tight budget
        )
    assert any("transition budget" in str(x.message) for x in w)
    assert int(skel.n_valid) < 500


def test_final_state_stored_for_continuation():
    sampler = _gauss_sampler()
    skel = pf.sample_skeleton(sampler, 100, np.zeros(DIM), np.ones(DIM), seed=0)
    st = sampler.state
    assert st is not None
    # the stored state sits exactly at the last recorded event
    np.testing.assert_allclose(
        np.asarray(st.x)[0], np.asarray(skel.x)[-1], rtol=1e-12
    )
    np.testing.assert_allclose(
        float(np.asarray(st.t)[0]), float(np.asarray(skel.t)[-1]), rtol=1e-12
    )


def test_kahan_time_accuracy_float32():
    """A float32 run over many events keeps the event clock accurate: the
    compensated sum of inter-event gaps must track the recorded t[-1] far
    better than naive f32 accumulation error."""
    sampler = _gauss_sampler()
    skel = pf.sample_skeleton(
        sampler, 20_000, np.zeros(DIM), np.ones(DIM), seed=0,
        dtype=jnp.float32,
    )
    t = np.asarray(skel.t, np.float64)
    assert np.all(np.diff(t) >= 0)
    # compare against f64 reconstruction from the same path: |dx| = dt
    dt_from_path = np.abs(np.diff(np.asarray(skel.x, np.float64)[:, 0]))
    t_rebuilt = np.cumsum(dt_from_path)
    rel_err = abs(t_rebuilt[-1] - t[-1]) / t[-1]
    assert rel_err < 1e-4, rel_err


def test_steep_and_flat_potentials():
    # cf. test_error_handling.jl steep/flat robustness
    steep = pf.ZigZagAD(DIM, lambda x: 500.0 * jnp.sum(x**2))
    skel = pf.sample_skeleton(steep, 300, np.zeros(DIM), np.ones(DIM), seed=1)
    assert np.all(np.isfinite(np.asarray(skel.x)))
    assert np.asarray(skel.x).std() < 1.0  # tightly concentrated

    flat = pf.ZigZagAD(DIM, lambda x: 1e-3 * jnp.sum(x**2))
    skel = pf.sample_skeleton(flat, 300, np.zeros(DIM), np.ones(DIM), seed=1)
    assert np.all(np.isfinite(np.asarray(skel.x)))


def test_large_initial_condition():
    sampler = _gauss_sampler()
    skel = pf.sample_skeleton(
        sampler, 2000, np.full(DIM, 50.0), np.ones(DIM), seed=2
    )
    x = np.asarray(skel.x)
    assert np.all(np.isfinite(x))
    # the chain must relax back toward the origin
    assert np.abs(x[-200:]).mean() < 5.0


def test_batched_interpolation():
    sampler = _gauss_sampler()
    B = 8
    skel = pf.sample_skeleton(
        sampler, 500, np.zeros((B, DIM)), np.ones((B, DIM)), seed=3
    )
    s = sample_from_skeleton_batch(sampler, 200, skel)
    assert s.shape == (B, 200, DIM)
    assert np.all(np.isfinite(np.asarray(s)))
    # chains are independent: their sample paths differ
    s = np.asarray(s)
    assert not np.allclose(s[0], s[1])


def test_event_count_grows_with_time_horizon():
    sampler = _gauss_sampler()
    n10 = int(pf.sample_skeleton(sampler, 10.0, np.zeros(DIM), np.ones(DIM), seed=4).n_valid)
    n80 = int(pf.sample_skeleton(sampler, 80.0, np.zeros(DIM), np.ones(DIM), seed=4).n_valid)
    assert n80 > 3 * n10


def test_horizon_capacity_chunking():
    """Time-horizon sampling with a tiny device buffer must still produce the
    full skeleton via host chunk offload."""
    sampler = _gauss_sampler()
    ref = pf.sample_skeleton(sampler, 60.0, np.zeros(DIM), np.ones(DIM), seed=5)
    small = pf.sample_skeleton(
        sampler, 60.0, np.zeros(DIM), np.ones(DIM), seed=5, init_capacity=16
    )
    np.testing.assert_allclose(
        np.asarray(ref.t), np.asarray(small.t), rtol=1e-12
    )


def test_rhmc_energy_conservation_between_events():
    """Verlet flow conserves the Hamiltonian to O(h^2) between events."""
    from pdmpflux_tpu.ops.flows import make_verlet_flow

    U = lambda x: jnp.sum(x**2) / 2
    flow = make_verlet_flow(jax.grad(U), 0.01)
    x0 = jnp.array([1.0, -0.5, 0.3])
    v0 = jnp.array([0.2, 1.0, -0.7])
    xt, vt = flow(x0, v0, 3.0)
    H0 = float(U(x0) + jnp.sum(v0**2) / 2)
    Ht = float(U(xt) + jnp.sum(vt**2) / 2)
    assert abs(Ht - H0) < 1e-3
    # exact-solution check: harmonic oscillator rotates
    x_exact = x0 * jnp.cos(3.0) + v0 * jnp.sin(3.0)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x_exact), atol=5e-3)


def test_finalize_horizon_rows_contract():
    """Device-side horizon assembly: init at col 0, overshoot rows dropped,
    exact-T terminal appended, tail zeroed (sample.jl:384-420 semantics)."""
    import jax
    import jax.numpy as jnp

    from pdmpflux_tpu.core import engine
    from pdmpflux_tpu.core.types import (
        EV_INIT, EV_JUMP, EV_TERMINAL, Event, Skeleton,
    )

    B, W, d, T = 3, 4, 2, 10.0
    f32 = jnp.float32

    def rows_with_times(tmat, counts):
        tmat = jnp.asarray(tmat, f32)
        col = jnp.arange(W)[None, :]
        valid = col < jnp.asarray(counts)[:, None]
        return Skeleton(
            x=jnp.ones((B, W, d), f32) * tmat[..., None],
            v=jnp.ones((B, W, d), f32),
            t=tmat,
            horizon=jnp.ones((B, W), f32),
            ar=jnp.zeros((B, W), f32),
            is_active=jnp.broadcast_to(valid[..., None], (B, W, d)),
            rejected=jnp.zeros((B, W), jnp.int32),
            errored_bound=jnp.zeros((B, W), jnp.int32),
            hitting_horizon=jnp.zeros((B, W), jnp.int32),
            error_value_ar=jnp.zeros((B, W, 5), f32),
            kind=jnp.where(valid, EV_JUMP, 0).astype(jnp.int32),
            n_valid=jnp.asarray(counts, jnp.int32),
        )

    # chain 0: all events within T; chain 1: last event overshoots T;
    # chain 2: no events at all (init only)
    counts = np.array([3, 2, 0], np.int32)
    tmat = np.array([[2.0, 5.0, 8.0, 0.0],
                     [4.0, 12.0, 0.0, 0.0],
                     [0.0, 0.0, 0.0, 0.0]], np.float32)
    rows = rows_with_times(tmat, counts)
    init_ev = Event(
        kind=jnp.full((B,), EV_INIT, jnp.int32),
        x=jnp.zeros((B, d), f32), v=jnp.ones((B, d), f32),
        t=jnp.zeros((B,), f32), horizon=jnp.ones((B,), f32),
        ar=jnp.zeros((B,), f32),
        is_active=jnp.ones((B, d), bool),
        rejected=jnp.zeros((B,), jnp.int32),
        errored_bound=jnp.zeros((B,), jnp.int32),
        hitting_horizon=jnp.zeros((B,), jnp.int32),
        error_value_ar=jnp.zeros((B, 5), f32),
    )
    flow = lambda x, v, t: (x + v * t, v)
    out = engine.finalize_horizon_rows(flow, rows, init_ev,
                                       jnp.asarray(counts), T)
    nv = np.asarray(out.n_valid)
    # events kept: chain0 3, chain1 1 (12.0 dropped), chain2 0; +init +term
    assert nv.tolist() == [5, 3, 2]
    t = np.asarray(out.t)
    kind = np.asarray(out.kind)
    for b in range(B):
        assert kind[b, 0] == EV_INIT and t[b, 0] == 0.0
        assert kind[b, nv[b] - 1] == EV_TERMINAL
        assert t[b, nv[b] - 1] == T
        assert np.all(np.diff(t[b, : nv[b]]) >= 0)
        assert np.all(t[b, nv[b]:] == 0.0)  # zeroed tail
        assert np.all(kind[b, nv[b]:] == 0)
    # terminal position = flow from last kept event
    x = np.asarray(out.x)
    # chain 1: last kept event at t=4 with x=4, v=1 -> x(T) = 4 + (10-4) = 10
    np.testing.assert_allclose(x[1, nv[1] - 1], 10.0)
    # chain 2: from init x=0, v=1 -> x(T) = 10
    np.testing.assert_allclose(x[2, nv[2] - 1], 10.0)
