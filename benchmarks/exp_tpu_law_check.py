"""On-hardware law check: fused Pallas kernel vs XLA stream engine.

The test suite asserts kernel-vs-XLA agreement on CPU (Pallas interpret
mode); this artifact re-asserts it ON REAL TPU HARDWARE, where the kernel
actually lowers through Mosaic: for each kernel-covered sampler family,
run the same config through ``backend="pallas"`` and
``backend="xla_stream"`` and compare pooled posterior moments against
each other and against the analytic truth.  The two engines use different
PRNG streams (the kernel derives counter seeds per launch), so agreement
is distributional — pooled over enough chains x events that the
Monte-Carlo error is a few permille.

Prints one JSON line per sampler and writes
``benchmarks/tpu_law_check.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    try:
        from pdmpflux_tpu.utils.profiling import enable_persistent_cache

        enable_persistent_cache("/tmp/pdmpflux_xla_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    import pdmpflux_tpu as pf
    from pdmpflux_tpu.parallel.sharded import pooled_moments
    from pdmpflux_tpu.utils import potentials

    dim, B, n_ev = 10, 512, 4096
    configs = [
        ("zigzag", lambda: pf.ZigZagAD(dim, potentials.gauss)),
        ("sticky_zigzag", lambda: pf.StickyZigZagAD(
            dim, potentials.gauss, np.full(dim, 10.0))),
        ("bps", lambda: pf.BPSAD(dim, potentials.gauss, refresh_rate=0.5)),
        ("boomerang", lambda: pf.Boomerang(dim, lambda x: x,
                                           refresh_rate=0.5)),
        ("suzz", lambda: pf.SpeedUpZigZagAD(dim, potentials.gauss)),
        ("ecmc", lambda: pf.ForwardECMCAD(dim, potentials.gauss)),
    ]
    results = []
    for name, make in configs:
        row = {"sampler": name, "chains": B, "events_per_chain": n_ev}
        x0 = np.full((B, dim), 0.3 if name.startswith("sticky") else 0.0)
        v0 = np.ones((B, dim))
        if name == "ecmc":
            v0 = v0 / np.sqrt(dim)
        for backend in ("pallas", "xla_stream"):
            _log(f"{name} / {backend}...")
            s = make()
            skel = pf.sample_skeleton(
                s, n_ev, x0, v0, seed=7, dtype=jnp.float32,
                backend=backend,
            )
            mean, var = pooled_moments(skel, s, 1024)
            mean, var = np.asarray(mean), np.asarray(var)
            row[f"{backend}_mean_absmax"] = round(float(np.abs(mean).max()), 4)
            row[f"{backend}_var_mean"] = round(float(var.mean()), 4)
            if backend == "pallas":
                m_p, v_p = mean, var
            del skel
            import gc

            gc.collect()
        row["mean_gap_absmax"] = round(float(np.abs(m_p - mean).max()), 4)
        row["var_gap_relmax"] = round(
            float(np.abs(v_p / np.maximum(var, 1e-9) - 1.0).max()), 4)
        # truth: N(0, I) slab for everything here (sticky adds a spike,
        # shrinking the marginal variance to 1 - phi(0)/(kappa + phi(0)))
        w = (1.0 / np.sqrt(2 * np.pi)) / (10.0 + 1.0 / np.sqrt(2 * np.pi))
        truth = 1.0 - w if name.startswith("sticky") else 1.0
        row["var_vs_truth_relerr"] = round(
            abs(row["pallas_var_mean"] / truth - 1.0), 4)
        row["agree"] = bool(row["mean_gap_absmax"] < 0.05
                            and row["var_gap_relmax"] < 0.08
                            and row["var_vs_truth_relerr"] < 0.05)
        print(json.dumps(row), flush=True)
        results.append(row)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_law_check.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    _log(f"wrote {out}")
    assert all(r["agree"] for r in results), "law check FAILED"


if __name__ == "__main__":
    main()
