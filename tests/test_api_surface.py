"""API-surface parity tests: constructor option variants and driver
overloads that the reference exercises but the core suites don't.

Covers, per the reference's test inventory (SURVEY.md §4):

* ``sample_from_skeleton`` overloads — ``dt`` float, ``(N, dt)`` pair,
  ``discard_vt=False`` (``/root/reference/src/sample.jl:573-682``);
* ECMC jump variants ``switch=False`` / ``ran_p`` / ``normal`` /
  ``speed_factor`` (``ForwardEventChainMonteCarlo.jl:178-260``);
* BPS ``gaussian_velocity`` (``BouncyParticleSamplers.jl:24``,
  ``Gaussian_velocity`` in Julia spelling);
* potential/gradient convention probing of ``resolve_potential``
  (``ADBackend.jl:30-141``) and the FiniteDiff envelope mode;
* ``anim_traj_`` fading-tail animation (``plot.jl:339-631``).
"""

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np
import pytest

import pdmpflux_tpu as pf
from pdmpflux_tpu.models.base import resolve_potential

DIM = 4
U_GAUSS = lambda x: jnp.sum(x * x) / 2


def _skel(sampler, n=400, seed=7, dim=DIM):
    return pf.sample_skeleton(
        sampler, n, np.zeros(dim), np.ones(dim), seed=seed
    )


# ---------------------------------------------------------------------------
# sample_from_skeleton overloads
# ---------------------------------------------------------------------------

def test_sample_from_skeleton_dt_float():
    s = pf.ZigZagAD(DIM, U_GAUSS)
    skel = _skel(s)
    t_end = float(np.asarray(skel.t)[-1])
    dt = t_end / 100.0
    out = pf.sample_from_skeleton(s, dt, skel)
    assert out.shape == (100, DIM)
    # the k-th sample sits at time k*dt: check against the N-overload
    out_n = pf.sample_from_skeleton(s, 100, skel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_n), rtol=1e-6)


def test_sample_from_skeleton_n_and_dt():
    s = pf.ZigZagAD(DIM, U_GAUSS)
    skel = _skel(s)
    # use only the first 50 skeleton points, stepping dt
    t50 = float(np.asarray(skel.t)[49])
    out = pf.sample_from_skeleton(s, 50, skel, dt=t50 / 20)
    assert out.shape[1] == DIM
    assert out.shape[0] == 20


def test_sample_from_skeleton_keeps_vt():
    s = pf.ZigZagAD(DIM, U_GAUSS)
    skel = _skel(s)
    out = np.asarray(pf.sample_from_skeleton(s, 64, skel, discard_vt=False))
    assert out.shape == (64, 2 * DIM + 1)
    # velocity block must be ±1 for Zig-Zag; time column strictly increasing
    v = out[:, DIM : 2 * DIM]
    assert np.all(np.abs(np.abs(v) - 1.0) < 1e-9)
    tcol = out[:, -1]
    assert np.all(np.diff(tcol) > 0)


def test_sample_chains_drivers_reject_batches():
    s = pf.ZigZagAD(DIM, U_GAUSS)
    skel = pf.sample_skeleton(s, 16, np.zeros((2, DIM)), np.ones((2, DIM)))
    with pytest.raises(ValueError, match="single-chain"):
        pf.sample_from_skeleton(s, 8, skel)


def test_sample_validation():
    s = pf.ZigZagAD(DIM, U_GAUSS)
    skel = _skel(s, n=32)
    with pytest.raises(ValueError, match="positive"):
        pf.sample_from_skeleton(s, 0, skel)
    with pytest.raises(ValueError, match="positive"):
        pf.sample_from_skeleton(s, -0.5, skel)


# ---------------------------------------------------------------------------
# ECMC jump variants
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "kw",
    [
        dict(switch=False),
        dict(ran_p=True),
        dict(normal=True),
        dict(speed_factor=2.0),
        dict(positive=False),
        dict(mix_p=1.0),
    ],
)
def test_ecmc_variants_run_and_stay_finite(kw):
    s = pf.ForwardECMCAD(DIM, U_GAUSS, **kw)
    skel = _skel(s, n=300)
    x = np.asarray(skel.x)
    assert np.all(np.isfinite(x))
    # speed constraint: |v| = speed_factor for the sphere-radial variants
    if not kw.get("normal", False):
        sf = kw.get("speed_factor", 1.0)
        # row 0 is the initial record (user-chosen velocity), skip it
        vn = np.linalg.norm(np.asarray(skel.v)[1:], axis=-1)
        np.testing.assert_allclose(vn, sf, rtol=1e-5)


def test_ecmc_moments_with_full_refresh():
    s = pf.ForwardECMCAD(DIM, U_GAUSS, switch=False, mix_p=0.8)
    skel = _skel(s, n=3000, seed=11)
    xs = np.asarray(pf.sample_from_skeleton(s, 4000, skel))
    assert np.all(np.abs(xs.mean(0)) < 0.35)
    assert np.all((xs.var(0) > 0.5) & (xs.var(0) < 2.0))


def test_ecmc_dim2_forces_mix_p_zero():
    s = pf.ForwardECMCAD(2, lambda x: jnp.sum(x * x) / 2, mix_p=0.7)
    assert s.mix_p == 0.0
    skel = pf.sample_skeleton(s, 200, np.zeros(2), np.array([1.0, 0.0]) + 1e-3)
    assert np.all(np.isfinite(np.asarray(skel.x)))


# ---------------------------------------------------------------------------
# BPS velocity options
# ---------------------------------------------------------------------------

def test_bps_gaussian_velocity_refresh():
    s = pf.BPSAD(DIM, U_GAUSS, refresh_rate=5.0, gaussian_velocity=True)
    skel = _skel(s, n=2000, seed=3)
    vn = np.linalg.norm(np.asarray(skel.v), axis=-1)
    # Gaussian refreshes: norms scatter around sqrt(dim), NOT all equal to 1
    assert vn.std() > 0.1
    xs = np.asarray(pf.sample_from_skeleton(s, 3000, skel))
    assert np.all(np.abs(xs.mean(0)) < 0.35)


def test_bps_unit_speed_refresh_default():
    s = pf.BPSAD(DIM, U_GAUSS, refresh_rate=5.0)
    skel = _skel(s, n=500, seed=3)
    # row 0 is the initial record; bounces preserve speed, refreshes reset
    # it to 1, and the initial |v|=2 persists only through bounces — by
    # event ~50 every chain has refreshed at least once
    vn = np.linalg.norm(np.asarray(skel.v)[50:], axis=-1)
    np.testing.assert_allclose(vn, 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# potential / gradient convention probing (ADBackend.jl parity)
# ---------------------------------------------------------------------------

def test_user_supplied_gradient_detected():
    # U maps (d,) -> (d,): treated as grad, not potential (ADBackend.jl:55-70)
    U_vec, grad = resolve_potential(lambda x: x, DIM)
    assert U_vec is None
    np.testing.assert_allclose(np.asarray(grad(jnp.ones(DIM))), 1.0)


def test_scalar_convention_1d():
    U_vec, grad = resolve_potential(lambda x: x * x / 2, 1)
    assert U_vec is not None
    np.testing.assert_allclose(float(grad(jnp.array([3.0]))[0]), 3.0)


def test_length1_vector_potential():
    U_vec, grad = resolve_potential(lambda x: jnp.sum(x * x / 2, keepdims=True), DIM)
    np.testing.assert_allclose(float(U_vec(jnp.ones(DIM))), DIM / 2)
    np.testing.assert_allclose(np.asarray(grad(jnp.ones(DIM))), 1.0)


def test_uninterpretable_potential_raises():
    with pytest.raises(ValueError, match="Could not interpret"):
        resolve_potential(lambda x: jnp.stack([x, x]), DIM)


def test_finitediff_backend_kwarg():
    # AD_backend="FiniteDiff" maps to the finite-difference envelope mode
    s = pf.ZigZag(DIM, lambda x: x, AD_backend="FiniteDiff")
    assert s.tderiv == "finite_diff"
    skel = _skel(s, n=300)
    xs = np.asarray(pf.sample_from_skeleton(s, 500, skel))
    assert np.all(np.isfinite(xs))


# ---------------------------------------------------------------------------
# plotting: fading-tail animation
# ---------------------------------------------------------------------------

@pytest.mark.extended
def test_anim_traj_fading_tail(tmp_path):
    s = pf.ZigZagAD(2, lambda x: jnp.sum(x * x) / 2)
    skel = pf.sample_skeleton(s, 40, np.zeros(2), np.ones(2), seed=5)
    path = tmp_path / "traj.gif"
    pf.anim_traj_(skel, 30, dt=0.25, save_path=str(path), fps=10, tail=15)
    assert path.exists() and path.stat().st_size > 0
