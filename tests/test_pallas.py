"""Fused Pallas Zig-Zag kernel tests (interpret mode on CPU).

Correctness is validated by statistical agreement with the XLA engine — the
two paths use different PRNG streams by construction (threefry counters in
the kernel vs jax.random keys), so comparisons are distributional: posterior
moments, acceptance-ratio / rejection / horizon-hit statistics (matching the
validation strategy SURVEY.md §7 prescribes for FP-sensitive paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pdmpflux_tpu as pf

# Kernel-vs-XLA distributional suite: slow; quick tier keeps the interpret-mode smoke in test_stream.py.
pytestmark = pytest.mark.extended
from pdmpflux_tpu.core import engine
from pdmpflux_tpu.core.types import EV_INIT, empty_skeleton
from pdmpflux_tpu.ops.pallas import driver as pdrv
from pdmpflux_tpu.ops.pallas import zigzag_chunk as zc
from pdmpflux_tpu.parallel.sharded import pooled_moments

DIM, B, N_EV = 4, 256, 400


def _run_pallas(sampler, n_ev=N_EV, B=B, seed=0, chunk=16, tile=128):
    st = sampler.init_state_batch(
        np.zeros((B, sampler.dim)), np.ones((B, sampler.dim)), seed,
        dtype=jnp.float32,
    )
    sk = empty_skeleton(n_ev, sampler.dim, jnp.float32, batch_shape=(B,))
    sk = engine.record_initial(sk, st, EV_INIT)
    run = pdrv.make_pallas_fixed_runner(
        sampler, n_ev, n_ev * 64, chunk=chunk, tile=tile, interpret=True
    )
    return jax.jit(run)(st, sk)


def test_threefry_uniformity():
    u = np.asarray(zc._uniform(jnp.int32(42), 0, (16, 12, 512), jnp.float32))
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.std() - 0.2887) < 0.005
    assert u.min() > 0 and u.max() < 1
    # distinct rows decorrelated
    c = np.corrcoef(u[:, 0, :].ravel(), u[:, 1, :].ravel())[0, 1]
    assert abs(c) < 0.05


def test_pallas_gaussian_moments():
    sampler = pf.ZigZag(DIM, lambda x: x)
    res = _run_pallas(sampler)
    assert (np.asarray(res.skeleton.n_valid) == N_EV).all()
    mean, var = pooled_moments(res.skeleton, sampler, 300)
    assert np.all(np.abs(np.asarray(mean)) < 0.25)
    assert np.all(np.abs(np.asarray(var) - 1.0) < 0.3)


def test_pallas_matches_xla_statistics():
    """Acceptance/rejection/horizon statistics agree with the XLA engine in
    distribution (same law, different streams)."""
    sampler = pf.ZigZag(DIM, lambda x: x)
    res_p = _run_pallas(sampler)

    st = sampler.init_state_batch(
        np.zeros((B, DIM)), np.ones((B, DIM)), 0, dtype=jnp.float32
    )
    sk = empty_skeleton(N_EV, DIM, jnp.float32, batch_shape=(B,))
    sk = engine.record_initial(sk, st, EV_INIT)
    res_x = jax.jit(engine.make_fixed_event_runner(sampler, N_EV, N_EV * 64))(st, sk)

    def stats(res):
        s = res.skeleton
        return (
            float(np.asarray(s.ar)[:, 1:].mean()),
            float(np.asarray(s.rejected).sum()) / (B * N_EV),
            float(np.asarray(s.hitting_horizon).sum()) / (B * N_EV),
            float(np.diff(np.asarray(s.t), axis=1).mean()),
        )

    ar_p, rej_p, hit_p, dt_p = stats(res_p)
    ar_x, rej_x, hit_x, dt_x = stats(res_x)
    assert abs(ar_p - ar_x) < 0.03, (ar_p, ar_x)
    assert abs(rej_p - rej_x) < 0.03, (rej_p, rej_x)
    assert abs(hit_p - hit_x) < 0.05, (hit_p, hit_x)
    assert abs(dt_p - dt_x) / dt_x < 0.15, (dt_p, dt_x)


def test_pallas_zigzag_invariants():
    """ZigZag path invariants: |dx_i| == dt per coordinate, exactly one
    coordinate flips per jump event, velocities stay in {-1, +1}."""
    sampler = pf.ZigZag(DIM, lambda x: x)
    res = _run_pallas(sampler, n_ev=60, B=128)
    t = np.asarray(res.skeleton.t)[0]
    X = np.asarray(res.skeleton.x)[0]
    V = np.asarray(res.skeleton.v)[0]
    dt = np.diff(t)
    dX = np.abs(np.diff(X, axis=0))
    np.testing.assert_allclose(
        dX, np.broadcast_to(dt[:, None], dX.shape), atol=1e-4
    )
    flips = (np.abs(np.diff(V, axis=0)) > 0).sum(axis=1)
    assert (flips == 1).all()
    assert set(np.unique(V)) <= {-1.0, 1.0}


def test_pallas_determinism():
    sampler = pf.ZigZag(DIM, lambda x: x)
    r1 = _run_pallas(sampler, n_ev=100, seed=5)
    r2 = _run_pallas(sampler, n_ev=100, seed=5)
    np.testing.assert_array_equal(
        np.asarray(r1.skeleton.t), np.asarray(r2.skeleton.t)
    )
    r3 = _run_pallas(sampler, n_ev=100, seed=6)
    assert not np.array_equal(np.asarray(r1.skeleton.t), np.asarray(r3.skeleton.t))


def test_pallas_banana_runs():
    from pdmpflux_tpu.utils.potentials import banana

    sampler = pf.ZigZagAD(6, banana)
    res = _run_pallas(sampler, n_ev=300, B=128)
    assert (np.asarray(res.skeleton.n_valid) == 300).all()
    x = np.asarray(res.skeleton.x)
    assert np.all(np.isfinite(x))
    assert abs(x[:, 100:, 0].mean()) < 0.5  # banana x0 marginal is N(0,1)


def test_supports_pallas_gating():
    assert pdrv.kernel_kind(pf.ZigZag(4, lambda x: x)) == "zigzag"
    assert pdrv.kernel_kind(pf.BPS(4, lambda x: x)) == "bps"
    assert pdrv.kernel_kind(pf.Boomerang(4, lambda x: x)) == "boomerang"
    assert pdrv.kernel_kind(pf.SpeedUpZigZag(4, lambda x: x)) == "suzz"
    assert pdrv.kernel_kind(pf.ForwardECMC(4, lambda x: x)) == "ecmc"
    # constant-bound samplers map onto the kernel's PALLAS_CONST_GRID envelope
    assert pdrv.supports_pallas(pf.ZigZag(4, lambda x: x, grid_size=0))
    # sticky Zig-Zag is covered since round 2 (activity mask in-kernel)
    assert pdrv.kernel_kind(pf.StickyZigZag(4, lambda x: x)) == "zigzag"
    assert not pdrv.supports_pallas(pf.RHMC(4, lambda x: x))
    with pytest.raises(ValueError):
        pf.sample_skeleton(
            pf.RHMC(4, lambda x: x), 10, np.zeros(4), np.ones(4),
            backend="pallas",
        )


def test_pallas_bps_matches_xla_statistics():
    """BPS kernel variant: posterior moments and acceptance statistics agree
    with the XLA engine in law."""
    from pdmpflux_tpu.parallel.sharded import pooled_moments

    bps = pf.BPS(DIM, lambda x: x, refresh_rate=0.5)
    t_cap, target = 2048, 400
    rng = np.random.default_rng(0)

    def prep(seed):
        st = bps.init_state_batch(
            np.zeros((B, DIM)), rng.normal(size=(B, DIM)), seed,
            dtype=jnp.float32,
        )
        stream = engine.empty_stream(t_cap, DIM, jnp.float32, B)
        return st, stream, jnp.zeros((B,), jnp.int32)

    run_p = jax.jit(pdrv.make_pallas_stream_runner(
        bps, t_cap, target, chunk=16, tile=128, interpret=True
    ))
    res_p = run_p(*prep(0))
    assert (np.asarray(res_p.counts) == target).all()
    mean_p, var_p = pooled_moments(res_p.stream, bps, 300)
    assert np.all(np.abs(np.asarray(mean_p)) < 0.25)
    assert np.all(np.abs(np.asarray(var_p) - 1.0) < 0.3)

    run_x = jax.jit(engine.make_stream_runner(bps, t_cap, chunk=32),
                    static_argnums=(3,))
    res_x = run_x(*prep(1), target)

    def acc_ar(res):
        nv = int(np.asarray(res.stream.n_valid)[0])
        k = np.asarray(res.stream.kind)[:, :nv]
        ar = np.asarray(res.stream.ar)[:, :nv]
        return float(ar[k == pf.EV_JUMP].mean())

    assert abs(acc_ar(res_p) - acc_ar(res_x)) < 0.04


def test_api_backend_pallas():
    sampler = pf.ZigZag(DIM, lambda x: x)
    skel = pf.sample_skeleton(
        sampler, 200, np.zeros((128, DIM)), np.ones((128, DIM)),
        seed=1, dtype=jnp.float32, backend="pallas",
    )
    assert (np.asarray(skel.n_valid) == 200).all()


def test_pallas_captured_constant_potential():
    """User potentials close over data arrays (scale vectors, observations);
    the driver must hoist them into explicit kernel inputs (Pallas kernels
    cannot capture non-scalar constants — driver.convert_grad)."""
    scales = jnp.asarray(np.linspace(0.5, 2.0, DIM), jnp.float32)

    def grad_U(x):
        return x / scales**2

    zz = pf.ZigZag(DIM, grad_U)
    closed, consts = pdrv.convert_grad(zz, DIM, 128, jnp.float32)
    assert len(consts) >= 1  # the scale vector was hoisted
    xs = jnp.ones((DIM, 128), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(closed(xs, *consts)),
        np.asarray(jax.vmap(grad_U, in_axes=1, out_axes=1)(xs)),
        rtol=1e-6,
    )

    res = _run_pallas(zz, n_ev=300)
    assert (np.asarray(res.skeleton.n_valid) == 300).all()
    mean, var = pooled_moments(res.skeleton, zz, 256)
    np.testing.assert_allclose(np.asarray(var), np.asarray(scales) ** 2,
                               rtol=0.35)


@pytest.mark.parametrize("make", [
    lambda: pf.Boomerang(DIM, lambda x: x, refresh_rate=0.5),
    lambda: pf.SpeedUpZigZag(DIM, lambda x: x),
], ids=["boomerang", "suzz"])
def test_pallas_curved_flow_kinds_match_xla(make):
    """Boomerang (elliptic flow) and Speed-Up ZigZag (nonlinear flow) kernel
    variants: posterior moments on N(0, I) and acceptance statistics agree
    with the XLA engine in law."""
    from pdmpflux_tpu.parallel.sharded import pooled_moments

    sampler = make()
    # Boomerang needs ~6.5 transitions/event at tmax=1 (4.5 horizon hits per
    # event on the elliptic flow), so budget generously.
    t_cap, target = 2048, 220
    rng = np.random.default_rng(0)

    # ZigZag-family flows assume unit-speed velocities (the Speed-Up ZigZag
    # closed-form flow is derived for v in {-1, +1}^d); Boomerang's invariant
    # velocity marginal is N(0, I).
    if isinstance(sampler, pf.SpeedUpZigZag):
        v0 = np.sign(rng.normal(size=(B, DIM))) + 0.0
    else:
        v0 = rng.normal(size=(B, DIM))

    def prep(seed):
        st = sampler.init_state_batch(
            np.zeros((B, DIM)), v0, seed, dtype=jnp.float32,
        )
        stream = engine.empty_stream(t_cap, DIM, jnp.float32, B)
        return st, stream, jnp.zeros((B,), jnp.int32)

    run_p = jax.jit(pdrv.make_pallas_stream_runner(
        sampler, t_cap, target, chunk=16, tile=128, interpret=True
    ))
    res_p = run_p(*prep(0))
    assert (np.asarray(res_p.counts) == target).all()
    mean_p, var_p = pooled_moments(res_p.stream, sampler, 300)
    assert np.all(np.abs(np.asarray(mean_p)) < 0.25)
    assert np.all(np.abs(np.asarray(var_p) - 1.0) < 0.35)

    run_x = jax.jit(engine.make_stream_runner(sampler, t_cap, chunk=32),
                    static_argnums=(3,))
    res_x = run_x(*prep(1), target)
    mean_x, var_x = pooled_moments(res_x.stream, sampler, 300)
    assert np.all(np.abs(np.asarray(mean_p) - np.asarray(mean_x)) < 0.3)
    assert np.all(np.abs(np.asarray(var_p) - np.asarray(var_x)) < 0.4)

    def acc_ar(res):
        nv = int(np.asarray(res.stream.n_valid)[0])
        k = np.asarray(res.stream.kind)[:, :nv]
        ar = np.asarray(res.stream.ar)[:, :nv]
        return float(np.clip(ar[k == pf.EV_JUMP], 0, 1).mean())

    assert abs(acc_ar(res_p) - acc_ar(res_x)) < 0.06


def test_pallas_const_bound_banana():
    """``grid_size == 0`` samplers run on the fused kernel via the
    ``PALLAS_CONST_GRID`` envelope substitution (driver.py): the BASELINE
    50-d banana headline config (``README.md:55-80``) must produce the same
    posterior statistics as the XLA constant-bound path."""
    dim, B, n_sk = 8, 128, 200

    def banana_grad(x):
        m = x[0] ** 2 - 1
        g0 = x[0] - 2.0 * x[0] * (x[1] - m)
        g1 = x[1] - m
        return jnp.concatenate([jnp.array([g0, g1]), x[2:]])

    zz = pf.ZigZag(dim, banana_grad, grid_size=0)
    assert pdrv.supports_pallas(zz)
    skel_p = pf.sample_skeleton(
        zz, n_sk, np.zeros((B, dim)), np.ones((B, dim)), seed=0,
        backend="pallas", dtype=jnp.float32,
    )
    assert (np.asarray(skel_p.n_valid) == n_sk).all()

    zz_x = pf.ZigZag(dim, banana_grad, grid_size=0)
    skel_x = pf.sample_skeleton(
        zz_x, n_sk, np.zeros((B, dim)), np.ones((B, dim)), seed=0,
        backend="xla", dtype=jnp.float32,
    )
    from pdmpflux_tpu.parallel.sharded import sample_from_skeleton_batch

    s_p = np.asarray(sample_from_skeleton_batch(zz, 64, skel_p))
    s_x = np.asarray(sample_from_skeleton_batch(zz_x, 64, skel_x))
    # Gaussian tail coords (2:) have exact moments 0 / 1
    assert np.abs(s_p[..., 2:].mean()) < 0.15
    assert np.abs(s_p[..., 2:].var() - 1.0) < 0.3
    # cross-backend agreement on the banana coords (MC tolerance)
    assert np.abs(s_p.mean((0, 1)) - s_x.mean((0, 1))).max() < 0.35


@pytest.mark.parametrize("kw", [
    dict(), dict(switch=False), dict(ran_p=True), dict(mix_p=0.9),
], ids=["default", "full-refresh", "random-angle", "high-mix"])
def test_pallas_ecmc_matches_xla(kw):
    """Forward ECMC kernel variant (gradient-frame jump with orthogonal
    switch / full refresh, ForwardEventChainMonteCarlo.jl:132-176): N(0, I)
    posterior moments and acceptance statistics agree with the XLA engine
    in law across jump-parameter variants."""
    from pdmpflux_tpu.parallel.sharded import pooled_moments

    dim, B2, t_cap, target = 5, 128, 1024, 250
    sampler = pf.ForwardECMC(dim, lambda x: x, **kw)
    assert pdrv.kernel_kind(sampler) == "ecmc"
    rng = np.random.default_rng(0)
    v0 = rng.normal(size=(B2, dim))
    v0 /= np.linalg.norm(v0, axis=1, keepdims=True)

    def prep(seed):
        st = sampler.init_state_batch(
            np.zeros((B2, dim)), v0, seed, dtype=jnp.float32)
        return st, engine.empty_stream(t_cap, dim, jnp.float32, B2), \
            jnp.zeros((B2,), jnp.int32)

    run_p = jax.jit(pdrv.make_pallas_stream_runner(
        sampler, t_cap, target, chunk=16, tile=128, interpret=True))
    res_p = run_p(*prep(0))
    assert (np.asarray(res_p.counts) == target).all()
    mean_p, var_p = pooled_moments(res_p.stream, sampler, 250)
    assert np.all(np.abs(np.asarray(mean_p)) < 0.2)
    assert np.all(np.abs(np.asarray(var_p) - 1.0) < 0.3)

    run_x = jax.jit(engine.make_stream_runner(sampler, t_cap, chunk=32),
                    static_argnums=(3,))
    res_x = run_x(*prep(1), target)
    mean_x, var_x = pooled_moments(res_x.stream, sampler, 250)
    assert np.all(np.abs(np.asarray(mean_p) - np.asarray(mean_x)) < 0.25)
    assert np.all(np.abs(np.asarray(var_p) - np.asarray(var_x)) < 0.35)

    def acc_ar(res):
        nv = int(np.asarray(res.stream.n_valid)[0])
        k = np.asarray(res.stream.kind)[:, :nv]
        ar = np.asarray(res.stream.ar)[:, :nv]
        return float(np.clip(ar[k == pf.EV_JUMP], 0, 1).mean())

    assert abs(acc_ar(res_p) - acc_ar(res_x)) < 0.06


def test_pick_tile_vmem_budget():
    """The tile picker shrinks the lane tile as the kernel working set grows
    and returns None when nothing fits (calibrated against the dim-50 grid-9
    VMEM overflow observed at tile 512 on v5e)."""
    small = pf.ZigZag(10, lambda x: x)
    assert pdrv.pick_tile(small, 4096) == 512
    banana50 = pf.ZigZag(50, lambda x: x, grid_size=0)
    assert pdrv.pick_tile(banana50, 512) in (128, 256)
    huge = pf.ZigZag(2000, lambda x: x)
    assert pdrv.pick_tile(huge, 512) is None
    assert pdrv.pick_tile(small, 100) is None  # not tile-divisible
