"""Experiment: compaction strategies for the transition stream (round 3).

Compares, on the flagship config shapes (B=4096, T~=3700, d=10):
  1. current compact_stream_rows (int32 scatter + take_along_axis gathers)
  2. log-shift compaction (O(log T) dense where+slice passes, no
     scatter/gather anywhere)
Prints wall times and checks bit-exact agreement.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pdmpflux_tpu.core import engine
from pdmpflux_tpu.core.types import Skeleton


@jax.jit
def _make_stream_dev(key, B, T, d):
    ks = jax.random.split(key, 16)
    kind = (jax.random.uniform(ks[0], (B, T)) < 0.55).astype(jnp.int32)
    flds, i = {}, 1
    for f in Skeleton._fields:
        if f == "n_valid":
            continue
        if f in ("x", "v"):
            flds[f] = jax.random.normal(ks[i], (B, T, d), jnp.float32)
        elif f == "is_active":
            flds[f] = jax.random.uniform(ks[i], (B, T, d)) < 0.9
        elif f == "error_value_ar":
            flds[f] = jax.random.normal(ks[i], (B, T, 5), jnp.float32)
        elif f == "kind":
            flds[f] = kind
        elif f in ("rejected", "errored_bound", "hitting_horizon"):
            flds[f] = jax.random.randint(ks[i], (B, T), 0, 5, jnp.int32)
        else:
            flds[f] = jax.random.normal(ks[i], (B, T), jnp.float32)
        i += 1
    return Skeleton(**flds, n_valid=jnp.full((B,), T, jnp.int32))


def make_stream(B, T, d, seed=0):
    from functools import partial
    return jax.jit(partial(_make_stream_dev.__wrapped__, B=B, T=T, d=d))(
        jax.random.PRNGKey(seed)
    )


def compact_scatter(stream: Skeleton, n_keep: int) -> Skeleton:
    """The pre-round-3 formulation (cumsum + int32 scatter +
    ``take_along_axis`` gathers) kept for comparison."""
    kind = stream.kind
    B, T = kind.shape
    mask = kind > 0
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    dst = jnp.where(mask & (pos < n_keep), pos, n_keep)
    src = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    idx_buf = jnp.zeros((B, n_keep + 1), jnp.int32)
    idx_buf = idx_buf.at[jnp.arange(B)[:, None], dst].set(
        src, mode="drop", unique_indices=False
    )
    idx = idx_buf[:, :n_keep]
    total = jnp.where(mask.any(axis=1), pos[:, -1] + 1, 0)
    pad = jnp.arange(n_keep)[None, :] >= jnp.minimum(total, n_keep)[:, None]

    def take(buf):
        ix = idx.reshape(idx.shape + (1,) * (buf.ndim - 2))
        out = jnp.take_along_axis(buf, ix.astype(jnp.int32), axis=1)
        pd = pad.reshape(pad.shape + (1,) * (buf.ndim - 2))
        return jnp.where(pd, jnp.zeros((), out.dtype), out)

    fields = {
        f: take(getattr(stream, f)) for f in Skeleton._fields if f != "n_valid"
    }
    return Skeleton(**fields, n_valid=stream.n_valid)


def bench(fn, *args, reps=3):
    out = fn(*args)
    # force completion via a scalar reduce (block_until_ready does not block
    # through remote-dispatch tunnels; full fetches crawl at ~30 MB/s)
    probe = jax.jit(lambda s: jnp.sum(s.t))
    float(jax.device_get(probe(out)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.device_get(probe(out)))
        best = min(best, time.perf_counter() - t0)
    return out, best


@jax.jit
def _mismatch(a: Skeleton, b: Skeleton):
    tot = jnp.zeros((), jnp.int64) if jax.config.jax_enable_x64 else jnp.zeros((), jnp.int32)
    for f in Skeleton._fields:
        if f == "n_valid":
            continue
        tot = tot + jnp.sum(getattr(a, f) != getattr(b, f)).astype(tot.dtype)
    return tot


def sweep_dims():
    """log-shift vs index-gather compaction across state dimensions at
    ~constant total payload — the measurement behind
    ``engine.GATHER_DIM_THRESHOLD``."""
    rows_budget = 4096 * 3712 * 10  # flagship payload in row-floats
    for d in (10, 32, 64, 128, 256, 512, 1000):
        B = max(128, min(4096, rows_budget // (2048 * d) // 128 * 128))
        T, n_keep = 2048, 1024
        stream = make_stream(B, T, d)
        orig = engine.GATHER_DIM_THRESHOLD
        try:
            engine.GATHER_DIM_THRESHOLD = 1 << 30  # force log-shift
            f_shift = jax.jit(lambda s: engine.compact_stream_rows(s, n_keep))
            shift_out, t_shift = bench(f_shift, stream)
        finally:
            engine.GATHER_DIM_THRESHOLD = orig
        f_gather = jax.jit(lambda s: engine._compact_rows_gather(s, n_keep))
        gather_out, t_gather = bench(f_gather, stream)
        bad = int(jax.device_get(_mismatch(shift_out, gather_out)))
        assert bad == 0, (d, bad)
        win = "gather" if t_gather < t_shift else "log-shift"
        print(f"d={d:5d} B={B:5d}: log-shift {t_shift*1e3:7.1f} ms | "
              f"gather {t_gather*1e3:7.1f} ms -> {win}", flush=True)
        del stream, shift_out, gather_out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4096)
    ap.add_argument("--T", type=int, default=3712)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--n-keep", type=int, default=2048)
    ap.add_argument("--skip-scatter", action="store_true")
    ap.add_argument("--sweep-dims", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    if a.sweep_dims:
        sweep_dims()
        return
    B, T, d, n_keep = a.B, a.T, a.d, a.n_keep
    print(f"B={B} T={T} d={d} n_keep={n_keep}", flush=True)
    stream = make_stream(B, T, d)
    f_new = jax.jit(lambda s: engine.compact_stream_rows(s, n_keep))
    new, t_new = bench(f_new, stream)
    print(f"log-shift compaction:   {t_new*1e3:.1f} ms", flush=True)
    if not a.skip_scatter:
        f_old = jax.jit(lambda s: compact_scatter(s, n_keep))
        old, t_old = bench(f_old, stream)
        print(f"old scatter+gather:     {t_old*1e3:.1f} ms "
              f"({t_old/t_new:.1f}x slower)", flush=True)
        bad = int(jax.device_get(_mismatch(old, new)))
        print(f"mismatched elements: {bad}")
        assert bad == 0


if __name__ == "__main__":
    main()
