"""Geometry calibration: dim-1000 sticky fused-kernel fill rate across
(ev_space, chunk, tile) launch candidates, including the double-buffered
HBM event-stream DMA variant (VERDICT r3 item 3).

Times RAW stream fills (kernel only, no compaction) so the numbers isolate
the launch geometry; the end-to-end number for the chosen geometry comes
from exp_sticky1000.py / run_baselines.py.

Usage: python benchmarks/exp_sticky1000_geom.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import pdmpflux_tpu as pf
    from pdmpflux_tpu.core import engine
    from pdmpflux_tpu.ops.pallas import driver as pdrv
    from pdmpflux_tpu.utils import potentials
    from pdmpflux_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache("/tmp/pdmpflux_xla_cache")

    dim = 1000
    t_cap = int(os.environ.get("GEOM_TCAP", 2048))
    kappa = np.full(dim, 10.0)

    geoms = [
        ("vmem", 8, 128),    # r3 pick
        ("hbm", 32, 128),
        # pipelined-DMA hbm mode frees VMEM from scaling with chunk, so
        # fat chunks amortize the per-launch overhead (tens of us/launch)
        ("hbm", 64, 128),
        ("hbm", 128, 128),
        ("hbm", 256, 128),
    ]
    rows = []
    for ev_space, chunk, tile in geoms:
        B = max(tile, 128)
        sampler = pf.StickyZigZagAD(dim, potentials.gauss, kappa)
        x0 = np.full((B, dim), 0.3)
        v0 = np.ones((B, dim))
        state = sampler.init_state_batch(x0, v0, seed=0, dtype=jnp.float32)
        tc = t_cap - (t_cap % chunk)
        try:
            run = jax.jit(pdrv.make_pallas_stream_runner(
                sampler, tc, tc, chunk=chunk, tile=tile, ev_space=ev_space,
            ))
            stream = engine.empty_stream(tc, dim, jnp.float32, B)
            counts0 = jnp.zeros((B,), jnp.int32)
            t0 = time.perf_counter()
            res = run(state, stream, counts0)
            ev0 = int(np.asarray(res.counts).sum())
            compile_s = time.perf_counter() - t0
            best = float("inf")
            events = 0
            st = res.state
            for _ in range(3):
                stream = engine.empty_stream(tc, dim, jnp.float32, B)
                t0 = time.perf_counter()
                res = run(st, stream, jnp.zeros((B,), jnp.int32))
                ev = int(np.asarray(res.counts).sum())
                float(jnp.max(res.stream.t))
                wall = time.perf_counter() - t0
                st = res.state
                if ev > 0 and wall < best:
                    best, events = wall, ev
            row = dict(ev_space=ev_space, chunk=chunk, tile=tile, B=B,
                       t_cap=tc, compile_s=round(compile_s, 1),
                       events=events, wall_s=round(best, 3),
                       kev_per_s=round(events / best / 1e3, 1))
        except Exception as e:
            row = dict(ev_space=ev_space, chunk=chunk, tile=tile, B=B,
                       error=str(e)[:160])
        print(json.dumps(row), flush=True)
        rows.append(row)
        del sampler
        import gc

        gc.collect()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sticky1000_geom.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
