"""Benchmark: aggregate PDMP events/s per chip on the flagship config.

Config 1 of BASELINE.json: ZigZag on the 10-d standard Gaussian (the
reference README's canonical workload, ``README.md:33-47``), using the
production TPU path — the fused Pallas transition kernel with dense stream
recording (``ops/pallas/driver.py``; falls back to the XLA stream engine
off-TPU).  Posterior moments are validated on-device in the same run.

``vs_baseline``: the reference publishes no absolute numbers (BASELINE.md),
so the anchor is MEASURED in the same process: the B=1 single-chain
throughput of this same framework on the same config — the closest
defensible stand-in for a single-node single-chain run (the reference's
Julia implementation is ~4x slower than its JAX equivalent per
``/root/reference/README.md:169``, so this anchor is, if anything,
generous to the reference).  ``vs_baseline`` = aggregate per-chip
throughput / single-chain throughput, i.e. the per-chip parallel speedup a
reference user gains by switching.

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

    # measured single-chain anchor (B=1 never fills a kernel tile; it runs
    # the XLA stream engine, like any single-chain user workload would)
    anchor_events = min(n_events, 2048)
    s1 = pf.ZigZag(dim, lambda x: x)
    run1 = jax.jit(engine.make_stream_runner(s1, 2 * anchor_events, chunk=64),
                   static_argnums=(3,))

    def go1(seed):
        st = s1.init_state_batch(
            np.zeros((1, dim)), np.ones((1, dim)), seed, dtype=dtype
        )
        stream = engine.empty_stream(2 * anchor_events, dim, dtype, 1)
        res1 = run1(st, stream, jnp.zeros((1,), jnp.int32), anchor_events)
        return int(jax.device_get(jnp.sum(res1.counts)))

    go1(0)  # warmup/compile
    wall1 = float("inf")
    for rep in (1, 2):
        t0 = time.perf_counter()
        n1 = go1(rep)
        wall1 = min(wall1, time.perf_counter() - t0)
    single_chain_eps = n1 / wall1

    # Posterior-moment sanity on the same run (speed without correctness is
    # meaningless): interpolate directly on the stream.
    mean, var = pooled_moments(res.stream, sampler, 256)
    mean, var = jax.device_get((mean, var))
    mean_ok = bool(np.all(np.abs(np.asarray(mean)) < 0.2))
    var_ok = bool(np.all(np.abs(np.asarray(var) - 1.0) < 0.3))

    out = {
        "metric": "zigzag_gauss10d_events_per_sec_per_chip",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / single_chain_eps, 1),
    }
    print(json.dumps(out))
    print(
        f"# platform={platform} path={path} B={B} n_events={n_events} "
        f"wall={wall:.3f}s transitions={tr} complete={complete} "
        f"moments_ok={mean_ok and var_ok} "
        f"single_chain_anchor={single_chain_eps:.1f} events/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
