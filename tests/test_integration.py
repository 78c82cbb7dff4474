"""Integration workflows — mirrors ``/root/reference/test/test_integration.jl``:
conjugate Bayesian posterior moments, bimodal mode coverage, cross-sampler
agreement, and the extended-dimension run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pdmpflux_tpu as pf

pytestmark = pytest.mark.extended


def test_bayesian_gaussian_posterior():
    """Conjugate Normal model: prior N(0,1), likelihood N(theta, 1) with
    observations ys -> posterior N(sum(y)/(n+1), 1/(n+1))
    (test_integration.jl:11-39)."""
    ys = np.array([0.8, 1.2, 0.4, 1.1, 0.9])
    n = len(ys)
    post_mean = ys.sum() / (n + 1)
    post_var = 1.0 / (n + 1)

    def U(x):
        th = x[0]
        return th**2 / 2 + jnp.sum((jnp.asarray(ys) - th) ** 2) / 2

    sampler = pf.ZigZagAD(1, U)
    skel = pf.sample_skeleton(sampler, 4000, np.zeros(1), np.ones(1), seed=0)
    s = np.asarray(pf.sample_from_skeleton(sampler, 8000, skel))[:, 0]
    assert abs(s.mean() - post_mean) < 0.1
    assert abs(s.var() - post_var) < 0.1


def test_bimodal_mode_coverage():
    """Gaussian mixture at +-2: both modes must be visited
    (test_integration.jl:67-87)."""

    def U(x):
        a = -jnp.sum((x - 2.0) ** 2) / 2
        b = -jnp.sum((x + 2.0) ** 2) / 2
        return -jax.scipy.special.logsumexp(jnp.stack([a, b]))

    sampler = pf.ZigZagAD(1, U)
    skel = pf.sample_skeleton(sampler, 6000, np.zeros(1), np.ones(1), seed=1)
    s = np.asarray(pf.sample_from_skeleton(sampler, 10000, skel))[:, 0]
    frac_pos = (s > 0).mean()
    assert 0.2 < frac_pos < 0.8, frac_pos
    assert (np.abs(s - 2.0) < 1.0).mean() > 0.1
    assert (np.abs(s + 2.0) < 1.0).mean() > 0.1


def test_cross_sampler_agreement():
    """ZigZag, BPS, Boomerang, ECMC, RHMC all agree on the 3-d Gaussian
    (test_integration.jl:90-128)."""
    dim = 3
    U = lambda x: jnp.sum(x**2) / 2
    samplers = {
        "zigzag": pf.ZigZagAD(dim, U),
        "bps": pf.BPS(dim, lambda x: x, refresh_rate=0.5),
        "boomerang": pf.Boomerang(dim, lambda x: x, refresh_rate=0.5),
        "ecmc": pf.ForwardECMCAD(dim, U),
        "rhmc": pf.RHMCAD(dim, U, refresh_rate=1.0, step_size=0.1),
    }
    rng = np.random.default_rng(0)
    means, variances = {}, {}
    for name, s in samplers.items():
        v0 = np.ones(dim) / np.sqrt(dim) if name == "ecmc" else rng.normal(size=dim)
        if name == "zigzag":
            v0 = np.ones(dim)
        skel = pf.sample_skeleton(s, 2500, np.zeros(dim), v0, seed=7)
        smp = np.asarray(pf.sample_from_skeleton(s, 6000, skel))
        means[name] = smp.mean(0)
        variances[name] = smp.var(0)
    for name in samplers:
        assert np.all(np.abs(means[name]) < 0.45), (name, means[name])
        assert np.all(np.abs(variances[name] - 1.0) < 0.6), (name, variances[name])


def test_dim_50_run():
    """High-dimension sanity (test_comprehensive.jl dim=50 case)."""
    dim = 50
    sampler = pf.ZigZag(dim, lambda x: x)
    skel = pf.sample_skeleton(sampler, 3000, np.zeros(dim), np.ones(dim), seed=3)
    s = np.asarray(pf.sample_from_skeleton(sampler, 4000, skel))
    assert np.all(np.isfinite(s))
    assert np.all(np.abs(s.mean(0)) < 0.6)
    assert 0.4 < s.var(0).mean() < 1.8


def test_heavy_tailed_cauchy_speedup_zigzag():
    """Speed-Up ZigZag on the product-Cauchy target stays finite and covers
    the tails (the config it exists for)."""
    from pdmpflux_tpu.utils.potentials import cauchy

    dim = 3
    sampler = pf.SpeedUpZigZagAD(dim, cauchy)
    skel = pf.sample_skeleton(sampler, 3000, np.zeros(dim), np.ones(dim), seed=4)
    s = np.asarray(pf.sample_from_skeleton(sampler, 5000, skel))
    assert np.all(np.isfinite(s))
    assert np.abs(s).max() > 5.0  # heavy tails actually visited
    # Cauchy median is 0; interquartile range per coordinate is ~2
    q25, q75 = np.percentile(s[:, 0], [25, 75])
    assert -3.0 < q25 < 0.0 < q75 < 3.0
