"""Round-2 kernel extensions: sticky Zig-Zag variant, time-horizon mode,
joint (tile, chunk) launch geometry (VERDICT.md items 2-4).

All kernel runs use interpret mode (CPU); semantics are validated against
the XLA engine, which is itself validated against theory in test_sticky.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pdmpflux_tpu as pf

# Sticky-kernel distributional suite: slow; quick tier keeps test_sticky.py.
pytestmark = pytest.mark.extended
from pdmpflux_tpu import api
from pdmpflux_tpu.core import engine
from pdmpflux_tpu.ops.pallas import driver as pdrv


def _sticky_streams(B=128, d=4, n_ev=200, t_cap=256, kappa_val=5.0):
    ks = np.full(d, kappa_val)
    x0, v0 = np.full((B, d), 0.3), np.ones((B, d))

    sp = pf.StickyZigZag(d, lambda x: x, ks)
    st = sp.init_state_batch(x0, v0, 1, jnp.float32)
    prun = pdrv.make_pallas_stream_runner(
        sp, t_cap, n_ev, chunk=8, tile=128, interpret=True
    )
    pres = prun(st, engine.empty_stream(t_cap, d, jnp.float32, B),
                jnp.zeros((B,), jnp.int32))

    sx = pf.StickyZigZag(d, lambda x: x, ks)
    st2 = sx.init_state_batch(x0, v0, 2, jnp.float32)
    xrun = jax.jit(engine.make_stream_runner(sx, t_cap, chunk=8),
                   static_argnums=(3,))
    xres = xrun(st2, engine.empty_stream(t_cap, d, jnp.float32, B),
                jnp.zeros((B,), jnp.int32), n_ev)
    return pres, xres


def test_sticky_kernel_contracts():
    pres, _ = _sticky_streams()
    nv = int(np.asarray(pres.stream.n_valid)[0])
    kind = np.asarray(pres.stream.kind)[:, :nv]
    t = np.asarray(pres.stream.t)[:, :nv]
    act = np.asarray(pres.stream.is_active)[:, :nv]
    v = np.asarray(pres.stream.v)[:, :nv]
    assert (kind == pf.EV_JUMP).any()
    assert (kind == pf.EV_STICK).any()
    assert (kind == pf.EV_THAW).any()
    assert np.all(np.diff(t, axis=1) >= -1e-5)
    assert np.isfinite(np.asarray(pres.stream.x)[:, :nv]).all()
    # stick events freeze exactly one additional coordinate; thaw releases one
    n_act = act.sum(axis=2)
    d_act = np.diff(n_act, axis=1)
    stick_rows = kind[:, 1:] == pf.EV_STICK
    thaw_rows = kind[:, 1:] == pf.EV_THAW
    assert np.all(d_act[stick_rows] == -1)
    assert np.all(d_act[thaw_rows] == 1)
    # latent velocity of frozen coordinates survives (|v| stays 1 for zigzag)
    assert np.allclose(np.abs(v), 1.0)


def test_sticky_kernel_matches_engine_law():
    pres, xres = _sticky_streams()
    nv = int(np.asarray(pres.stream.n_valid)[0])
    nvx = int(np.asarray(xres.stream.n_valid)[0])

    def frozen_frac(res, n):
        k = np.asarray(res.stream.kind)[:, :n]
        a = np.asarray(res.stream.is_active)[:, :n]
        return 1.0 - a[k > 0].mean()

    assert abs(frozen_frac(pres, nv) - frozen_frac(xres, nvx)) < 0.05
    # stick/thaw event fractions agree
    kp = np.asarray(pres.stream.kind)[:, :nv]
    kx = np.asarray(xres.stream.kind)[:, :nvx]

    def frac(k, ev):
        e = k[k > 0]
        return (e == ev).mean()

    for ev in (pf.EV_JUMP, pf.EV_STICK, pf.EV_THAW):
        assert abs(frac(kp, ev) - frac(kx, ev)) < 0.05


def test_pallas_horizon_mode_contract():
    B, d, T = 128, 3, 10.0
    sampler = pf.ZigZag(d, lambda x: x)
    st = sampler.init_state_batch(np.zeros((B, d)), np.ones((B, d)), 0,
                                  jnp.float32)
    run = pdrv.make_pallas_stream_runner(
        sampler, 512, 512, chunk=8, tile=128, mode="horizon", interpret=True
    )
    res = run(st, engine.empty_stream(512, d, jnp.float32, B),
              jnp.zeros((B,), jnp.int32), jnp.asarray(T, jnp.float32))
    tfin = np.asarray(res.state.t)
    assert (tfin >= T).all()
    nv = int(np.asarray(res.stream.n_valid)[0])
    k = np.asarray(res.stream.kind)[:, :nv]
    t = np.asarray(res.stream.t)[:, :nv]
    for b in range(B):
        te = t[b][k[b] > 0]
        # exactly one overshoot event, all earlier events below T
        assert te[-1] >= T
        assert (te[:-1] < T + 1e-5).all()


def test_forced_stream_horizon_api(monkeypatch):
    """The TPU horizon driver (stream fills + device compaction + exact-T
    terminal) must satisfy the same contracts as the CPU path when forced
    to run on CPU."""
    monkeypatch.setenv("PDMPFLUX_FORCE_STREAM", "1")
    dim, T = 3, 20.0
    sampler = pf.ZigZagAD(dim, pf.utils.potentials.gauss)
    skel = pf.sample_skeleton(sampler, T, np.zeros(dim), np.ones(dim), seed=3,
                              init_capacity=64)
    t = np.asarray(skel.t)
    assert float(t[-1]) == T
    assert int(np.asarray(skel.kind)[-1]) == pf.EV_TERMINAL
    assert np.all(np.diff(t) >= 0)
    assert np.all(t <= T)
    # batched
    skel2 = pf.sample_skeleton(
        sampler, T, np.zeros((3, dim)), np.ones((3, dim)), seed=4,
        init_capacity=64,
    )
    nv = np.asarray(skel2.n_valid)
    for b in range(3):
        tb = np.asarray(skel2.t)[b, : nv[b]]
        assert float(tb[-1]) == T
        assert np.all(np.diff(tb) >= 0)
    # sticky horizon through the same forced path
    ssampler = pf.StickyZigZagAD(dim, pf.utils.potentials.gauss,
                                 np.full(dim, 8.0))
    skel3 = pf.sample_skeleton(
        ssampler, 15.0, np.full(dim, 0.2), np.ones(dim), seed=5,
        init_capacity=64,
    )
    t3 = np.asarray(skel3.t)
    assert float(t3[-1]) == 15.0
    kinds = set(np.asarray(skel3.kind).tolist())
    assert pf.EV_STICK in kinds or pf.EV_THAW in kinds
    monkeypatch.delenv("PDMPFLUX_FORCE_STREAM", raising=False)


def test_forced_stream_events_matches_default(monkeypatch):
    """Event-count sampling through the forced stream path agrees with the
    default scan-compact path in law (same moments band)."""
    monkeypatch.setenv("PDMPFLUX_FORCE_STREAM", "1")
    dim = 2
    s1 = pf.ZigZagAD(dim, pf.utils.potentials.gauss)
    skel = pf.sample_skeleton(s1, 500, np.zeros((4, dim)), np.ones((4, dim)),
                              seed=0)
    monkeypatch.delenv("PDMPFLUX_FORCE_STREAM", raising=False)
    assert np.asarray(skel.n_valid).min() == 500
    from pdmpflux_tpu.parallel.sharded import pooled_moments

    mean, var = pooled_moments(skel, s1, 512)
    assert np.abs(np.asarray(mean)).max() < 0.3
    assert np.abs(np.asarray(var) - 1.0).max() < 0.4


def test_pick_launch_geometry():
    small = pf.ZigZag(10, lambda x: x)
    assert pdrv.pick_launch(small, 4096) == (512, 32, "vmem")
    banana50 = pf.ZigZag(50, lambda x: x, grid_size=0)
    tile, chunk, ev_space = pdrv.pick_launch(banana50, 512)
    # tile 512 fits the hard ceiling but tile 256 is measured faster
    # (5.96M vs 3.34M ev/s on v5e) — the sweet-budget pass must pick it
    assert tile == 256
    assert ev_space == "vmem"
    # moderate-d sticky fits with a possibly shortened chunk
    sticky100 = pf.StickyZigZag(100, lambda x: x, np.full(100, 1.0))
    launch = pdrv.pick_launch(sticky100, 512)
    assert launch is not None
    # the dim-1000 sticky flagship runs fused (TPU-v5e calibration picks
    # tile=128 chunk=8 with VMEM event streams — the fastest measured
    # geometry; see _vmem_budget) instead of falling back to the XLA engine
    sticky1000 = pf.StickyZigZag(1000, lambda x: x, np.full(1000, 10.0))
    launch = pdrv.pick_launch(sticky1000, 128)
    assert launch is not None
    assert launch.tile == 128
    # absurd working sets still return None (and log)
    huge = pf.ZigZag(5000, lambda x: x)
    assert pdrv.pick_launch(huge, 512) is None
