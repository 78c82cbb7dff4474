"""BASELINE.json config sweep: events/s, ESS/s, acceptance rate per config.

Runs the five reference-derived benchmark configurations (BASELINE.md) and
prints one JSON object per config.  Usage::

    python benchmarks/run_baselines.py [--quick]

Chain counts / event budgets auto-scale down with ``--quick`` or on CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(quick: bool = False):
    import jax
    import jax.numpy as jnp

    import pdmpflux_tpu as pf
    from pdmpflux_tpu.diagnostics import ess_per_dim
    from pdmpflux_tpu.core import engine
    from pdmpflux_tpu.core.types import EV_INIT, empty_skeleton
    from pdmpflux_tpu.parallel.sharded import (
        pooled_moments,
        sample_from_skeleton_batch,
    )
    from pdmpflux_tpu.utils import potentials

    on_tpu = jax.devices()[0].platform == "tpu"
    scale = 1 if (on_tpu and not quick) else 8

    def banana_grad(x):
        m = x[0] ** 2 - 1
        g0 = x[0] - 2.0 * x[0] * (x[1] - m)
        g1 = x[1] - m
        return jnp.concatenate([jnp.array([g0, g1]), x[2:]])

    configs = [
        dict(name="zigzag_gauss_d10", dim=10,
             make=lambda: pf.ZigZagAD(10, potentials.gauss),
             B=4096 // scale, n_ev=2048 // scale),
        dict(name="zigzag_banana_d50_constbound", dim=50,
             make=lambda: pf.ZigZag(50, banana_grad, grid_size=0),
             B=512 // scale, n_ev=2048 // scale),
        dict(name="bps_anisotropic_gauss_d10", dim=10,
             make=lambda: pf.BPSAD(10, potentials.anisotropic_gauss(
                 np.linspace(0.5, 3.0, 10)), refresh_rate=0.5),
             B=512 // scale, n_ev=1024 // scale),
        dict(name="boomerang_gauss_d10", dim=10,
             make=lambda: pf.Boomerang(10, lambda x: x, refresh_rate=0.5),
             B=512 // scale, n_ev=1024 // scale),
        dict(name="sticky_zigzag_d1000", dim=1000,
             make=lambda: pf.StickyZigZagAD(
                 1000, potentials.gauss, np.full(1000, 10.0)),
             B=64 // max(scale // 4, 1), n_ev=8192 // scale),
    ]

    for cfg in configs:
        dim, B, n_ev = cfg["dim"], max(cfg["B"], 8), max(cfg["n_ev"], 64)
        sampler = cfg["make"]()
        x0 = np.zeros((B, dim))
        if cfg["name"].startswith("sticky"):
            x0 = np.full((B, dim), 0.3)
        if cfg["name"].startswith("zigzag_banana"):
            x0 = np.ones((B, dim))
        v0 = np.ones((B, dim))

        # "auto" selects the scatter-free stream recorders on TPU (with the
        # fused Pallas kernel for ZigZag-family samplers).
        backend = "auto" if on_tpu else "xla"
        kw = dict(seed=0, dtype=jnp.float32, backend=backend)

        # warmup/compile
        pf.sample_skeleton(sampler, n_ev, x0, v0, **kw)
        t0 = time.perf_counter()
        skel = pf.sample_skeleton(sampler, n_ev, x0, v0, **{**kw, "seed": 1})
        # force materialization through the device tunnel
        n_valid = np.asarray(jax.device_get(skel.n_valid))
        t_sum = float(np.asarray(skel.t).sum())
        wall = time.perf_counter() - t0

        events = int(n_valid.sum()) - B
        ev_s = events / wall

        # ESS/s on pooled per-chain samples (first 4 coords to bound cost)
        n_per = min(2048, 4 * n_ev)
        smp = np.asarray(sample_from_skeleton_batch(sampler, n_per, skel))
        k = min(4, dim)
        ess_chain = np.stack([ess_per_dim(smp[b, :, :k]) for b in range(min(B, 32))])
        ess_total = float(ess_chain.mean(axis=0).min()) * B  # worst coord, all chains
        mean, var = pooled_moments(skel, sampler, min(1024, n_per))
        ar = np.asarray(skel.ar)[:, 1:]

        print(json.dumps({
            "config": cfg["name"],
            "backend": backend,
            "chains": B,
            "events_per_sec": round(ev_s, 1),
            "ess_per_sec": round(ess_total / wall, 1),
            "mean_acceptance": round(float(ar.mean()), 4),
            "wall_s": round(wall, 3),
            "moment_mean_absmax": round(float(np.abs(np.asarray(mean)).max()), 4),
            "moment_var_mean": round(float(np.asarray(var).mean()), 4),
        }), flush=True)


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
