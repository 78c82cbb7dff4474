"""Benchmark: aggregate PDMP events/s per chip on the flagship config.

Config 1 of BASELINE.json: ZigZag on the 10-d standard Gaussian (the
reference README's canonical workload, ``README.md:33-47``).  We run a
chain batch on one chip and report aggregate accepted-event throughput.

``vs_baseline``: the reference publishes no absolute numbers (BASELINE.md);
its only hard performance statement is the CI guardrail "1000 events in
< 30 s" (``test/test_performance.jl:34-43``), i.e. >= 33.3 events/s.  We
report our throughput relative to that floor.

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
    from pdmpflux_tpu.core.types import EV_INIT, empty_skeleton

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"

    dim = 10
    B = int(os.environ.get("BENCH_CHAINS", 1024 if on_accel else 64))
    n_events = int(os.environ.get("BENCH_EVENTS", 2048 if on_accel else 512))
    dtype = jnp.float32

    sampler = pf.ZigZagAD(dim, lambda x: jnp.sum(x * x) / 2)
    max_tr = n_events * 64
    run = jax.jit(
        engine.make_fixed_event_runner(sampler, n_events, max_tr)
    )

    def make_inputs(seed):
        state = sampler.init_state_batch(
            np.zeros((B, dim)), np.ones((B, dim)), seed=seed, dtype=dtype
        )
        skel = empty_skeleton(n_events, dim, dtype, batch_shape=(B,))
        skel = engine.record_initial(skel, state, EV_INIT)
        return state, skel

    def fetch(res):
        # Force full materialization: through remote-dispatch tunnels,
        # block_until_ready can return before execution finishes, so pull a
        # reduction of the outputs to the host.
        return jax.device_get(
            (jnp.sum(res.skeleton.t), res.transitions, res.skeleton.n_valid)
        )

    # Warmup / compile.
    state, skel = make_inputs(0)
    fetch(run(state, skel))

    # Timed runs (best of 2).
    wall = float("inf")
    for rep in (1, 2):
        state, skel = make_inputs(rep)
        t0 = time.perf_counter()
        res = run(state, skel)
        fetch(res)
        wall = min(wall, time.perf_counter() - t0)

    n_valid = np.asarray(res.skeleton.n_valid)
    total_events = int(n_valid.sum()) - B  # exclude initial records
    events_per_sec = total_events / wall

    # Sanity: posterior moments must be right, otherwise speed is meaningless.
    from pdmpflux_tpu.parallel.sharded import pooled_moments

    mean, var = pooled_moments(res.skeleton, sampler, 256)
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
        f"# platform={platform} B={B} n_events={n_events} wall={wall:.3f}s "
        f"transitions={int(res.transitions)} moments_ok={mean_ok and var_ok}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
