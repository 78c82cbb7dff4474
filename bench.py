"""Benchmark: aggregate PDMP events/s per chip on the flagship config.

Config 1 of BASELINE.json: ZigZag on the 10-d standard Gaussian (the
reference README's canonical workload, ``README.md:33-47``), using the
production TPU path — the fused Pallas transition kernel with dense stream
recording (``ops/pallas/driver.py``; falls back to the XLA stream engine
off-TPU).  Posterior moments are validated on-device in the same run.

``vs_baseline``: the reference publishes no absolute numbers (BASELINE.md);
its only hard performance statement is the CI guardrail "1000 events in
< 30 s" (``test/test_performance.jl:34-43``), i.e. >= 33.3 events/s.  We
report our aggregate per-chip throughput relative to that floor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import pdmpflux_tpu as pf
    from pdmpflux_tpu.core import engine
    from pdmpflux_tpu.ops.pallas import driver as pdrv
    from pdmpflux_tpu.parallel.sharded import pooled_moments

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    dim = 10
    B = int(os.environ.get("BENCH_CHAINS", 8192 if on_tpu else 64))
    n_events = int(os.environ.get("BENCH_EVENTS", 1024 if on_tpu else 256))
    t_cap = 2 * n_events
    dtype = jnp.float32

    sampler = pf.ZigZag(dim, lambda x: x)  # grad of the standard Gaussian

    if on_tpu and B % 512 == 0:
        run = jax.jit(
            pdrv.make_pallas_stream_runner(
                sampler, t_cap, n_events, chunk=32, tile=512
            )
        )
        args_of = lambda st, stream, counts: (st, stream, counts)
        path = "pallas-stream"
    else:
        base = engine.make_stream_runner(sampler, t_cap, chunk=64)
        run = jax.jit(base, static_argnums=(3,))
        args_of = lambda st, stream, counts: (st, stream, counts, n_events)
        path = "xla-stream"

    def go(seed):
        st = sampler.init_state_batch(
            np.zeros((B, dim)), np.ones((B, dim)), seed, dtype=dtype
        )
        stream = engine.empty_stream(t_cap, dim, dtype, B)
        counts = jnp.zeros((B,), jnp.int32)
        res = run(*args_of(st, stream, counts))
        # Force full materialization (block_until_ready does not block
        # through remote-dispatch tunnels).
        _, tr, cmin = jax.device_get(
            (jnp.sum(res.stream.t), res.transitions, jnp.min(res.counts))
        )
        return res, int(tr), int(cmin)

    res, tr, cmin = go(0)  # warmup/compile

    wall = float("inf")
    for rep in (1, 2):
        t0 = time.perf_counter()
        res, tr, cmin = go(rep)
        wall = min(wall, time.perf_counter() - t0)

    complete = cmin >= n_events
    total_events = int(np.asarray(jax.device_get(res.counts)).sum())
    events_per_sec = total_events / wall

    # Posterior-moment sanity on the same run (speed without correctness is
    # meaningless): interpolate directly on the stream.
    mean, var = pooled_moments(res.stream, sampler, 256)
    mean, var = jax.device_get((mean, var))
    mean_ok = bool(np.all(np.abs(np.asarray(mean)) < 0.2))
    var_ok = bool(np.all(np.abs(np.asarray(var) - 1.0) < 0.3))

    baseline_floor = 1000.0 / 30.0  # reference CI guardrail, events/s
    out = {
        "metric": "zigzag_gauss10d_events_per_sec_per_chip",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / baseline_floor, 1),
    }
    print(json.dumps(out))
    print(
        f"# platform={platform} path={path} B={B} n_events={n_events} "
        f"wall={wall:.3f}s transitions={tr} complete={complete} "
        f"moments_ok={mean_ok and var_ok}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
