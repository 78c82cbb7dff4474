"""Kernel-vs-API cost accounting on the flagship config (VERDICT r4 item 4).

Decomposes the public ``sample_skeleton`` wall time into its device phases
at the flagship geometry (ZigZag, 10-d standard Gaussian, f32):

* ``fill``     — the fused Pallas stream fill alone (init + transition
  kernel launches, no compaction), the r1 "raw kernel" measurement made
  deliverable-shaped;
* ``compact``  — ``compact_stream_rows_with_init`` on a filled stream (the
  log-shift/gather event extraction);
* ``one_shot`` — the fused init+fill+compact program the public API
  dispatches (its wall time should be ~ fill + compact);
* ``api``      — the public ``pf.sample_skeleton`` end to end, measured
  twice: bench.py's methodology (1 warmup + best of 2) and the sweep's
  (2 warmups + best of 2), to reconcile the 25M-vs-20M discrepancy
  (VERDICT r4 weak item 7).

Prints one JSON object per batch size with all phase rates (events/s).
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
    from pdmpflux_tpu.core import engine
    from pdmpflux_tpu.core.types import EV_INIT
    from pdmpflux_tpu.models.base import _as_key
    from pdmpflux_tpu.ops.pallas import driver as pallas_driver

    dim = 10
    n_sk = 2048
    target = n_sk - 1
    Bs = [int(b) for b in os.environ.get("BD_CHAINS", "4096,8192").split(",")]

    def force(a):
        return float(jnp.max(a))

    def timeit(fn, *args, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            force(out[0] if isinstance(out, tuple) else out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    results = []
    for B in Bs:
        _log(f"B={B}: building...")
        sampler = pf.ZigZag(dim, lambda x: x)
        x0, v0 = np.zeros((B, dim)), np.ones((B, dim))
        kw = dict(dtype=jnp.float32, backend="auto")

        # ---- public API, bench.py methodology (1 warmup, best of 2) ----
        def api_run(seed, smp):
            t0 = time.perf_counter()
            skel = pf.sample_skeleton(smp, n_sk, x0, v0, seed=seed, **kw)
            nv = np.asarray(jax.device_get(skel.n_valid))
            force(skel.t)
            return time.perf_counter() - t0, int(nv.sum()) - B

        api_run(0, sampler)
        w1, ev1 = api_run(1, sampler)
        w2, ev2 = api_run(2, sampler)
        api_bench_w, api_bench_ev = min((w1, ev1), (w2, ev2))
        # sweep methodology: one more warmup happened implicitly (the two
        # timed calls above), so these next two are "2+ warmups, best of 2"
        w3, ev3 = api_run(3, sampler)
        w4, ev4 = api_run(4, sampler)
        api_sweep_w, api_sweep_ev = min((w3, ev3), (w4, ev4))

        # ---- phase builds (same geometry the adapted API used) ----------
        ratio = getattr(sampler, "_fill_ratio", None)
        margin = 1.8 if not ratio else min(1.8, max(1.1, 1.15 / ratio))
        align = 256
        t_cap = int(-(-int(target * margin + 64) // align) * align)
        launch = pallas_driver.pick_launch(sampler, B)
        _log(f"B={B}: t_cap={t_cap} launch={launch} ratio={ratio}")
        tile, chunk, ev_space = launch
        prun = pallas_driver.make_pallas_stream_runner(
            sampler, t_cap, target, chunk=chunk, tile=tile,
            ev_space=ev_space,
        )

        def fill_only(xx, vv, kk):
            st = jax.vmap(
                lambda a, b, k: sampler.init_state(a, b, k,
                                                   dtype=jnp.float32)
            )(xx, vv, kk)
            stream = engine.empty_stream(t_cap, dim, st.x.dtype, B)
            res = prun(st, stream, jnp.zeros((B,), jnp.int32))
            return res.stream, res.counts, st

        fill_jit = jax.jit(fill_only)

        def fill_probe(seed):
            keys = jax.random.split(_as_key(seed), B)
            stream, counts, st = fill_jit(x0, v0, keys)
            force(stream.t)
            return stream, counts, st

        fill_probe(0)
        t0 = time.perf_counter()
        stream, counts, st = fill_probe(1)
        fill_w = time.perf_counter() - t0
        t0 = time.perf_counter()
        fill_probe(2)
        fill_w = min(fill_w, time.perf_counter() - t0)
        ev_fill = int(np.asarray(jax.device_get(counts)).sum())

        # ---- compaction on the held fill --------------------------------
        iv = jax.jit(jax.vmap(
            lambda s: engine.event_from_state(s, EV_INIT)
        ))(st)
        comp_jit = jax.jit(
            lambda s, i: engine.compact_stream_rows_with_init(s, target, i)
        )
        comp_w, _ = timeit(lambda: comp_jit(stream, iv).t)

        # ---- fused one-shot (what the API dispatches) -------------------
        def one_shot(xx, vv, kk):
            st = jax.vmap(
                lambda a, b, k: sampler.init_state(a, b, k,
                                                   dtype=jnp.float32)
            )(xx, vv, kk)
            ivv = jax.vmap(
                lambda s: engine.event_from_state(s, EV_INIT)
            )(st)
            stream = engine.empty_stream(t_cap, dim, st.x.dtype, B)
            res = prun(st, stream, jnp.zeros((B,), jnp.int32))
            acc = engine.compact_stream_rows_with_init(
                res.stream, target, ivv
            )
            # return the FULL skeleton: returning only one field lets XLA
            # dead-code-eliminate the other fields' compaction, understating
            # the one-shot cost by ~2x (caught in r5: 0.30 s vs the real
            # 0.56 s at B=8192)
            return acc

        os_jit = jax.jit(one_shot)
        def _os_once(st=[0]):
            st[0] += 1
            return os_jit(x0, v0, jax.random.split(_as_key(st[0]), B)).t

        os_w, _ = timeit(_os_once)

        row = {
            "chains": B,
            "events": api_bench_ev,
            "fill_events_per_sec": round(ev_fill / fill_w, 1),
            "compact_s": round(comp_w, 4),
            "fill_s": round(fill_w, 4),
            "one_shot_s": round(os_w, 4),
            "one_shot_events_per_sec": round(api_bench_ev / os_w, 1),
            "api_bench_methodology_events_per_sec": round(
                api_bench_ev / api_bench_w, 1),
            "api_sweep_methodology_events_per_sec": round(
                api_sweep_ev / api_sweep_w, 1),
            "api_overhead_s": round(api_bench_w - os_w, 4),
            "t_cap": t_cap,
            "launch": list(launch),
        }
        print(json.dumps(row), flush=True)
        results.append(row)
        del stream, counts, st
        import gc

        gc.collect()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "breakdown_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    _log(f"wrote {out}")


if __name__ == "__main__":
    main()
