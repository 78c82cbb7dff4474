"""Probe: dim-1000 sticky flagship on the fused kernel (ev_space='hbm').

Measures pf.sample_skeleton end-to-end at B=128 (tile-aligned) and reports
the launch geometry chosen; run with PDMPFLUX_LOG=info to see the picker.
Round-2 XLA-path baseline: 442k events/s at B=64.
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _force_scalar(a):
    """Force device materialization by reducing ON DEVICE and fetching one
    scalar (a full fetch of ``t`` is ~33 MB and crawls at ~30 MB/s through
    the remote-dispatch tunnel, polluting the measurement by ~1 s)."""
    import jax.numpy as _jnp

    if isinstance(a, np.ndarray):
        return float(a.reshape(-1)[-1])
    return float(_jnp.max(a))

logging.basicConfig(level=logging.INFO)


def main():
    import jax
    import jax.numpy as jnp

    import pdmpflux_tpu as pf
    from pdmpflux_tpu.ops.pallas import driver as pdrv
    from pdmpflux_tpu.utils.profiling import enable_persistent_cache
    from pdmpflux_tpu.utils import potentials

    enable_persistent_cache("/tmp/pdmpflux_xla_cache")

    dim = 1000
    B = int(os.environ.get("S1000_B", 128))
    n_sk = int(os.environ.get("S1000_N", 2048))
    kappa = np.full(dim, 10.0)

    sampler = pf.StickyZigZagAD(dim, potentials.gauss, kappa)
    print("pick_launch:", pdrv.pick_launch(sampler, B), flush=True)

    x0 = np.full((B, dim), 0.3)
    v0 = np.ones((B, dim))
    kw = dict(dtype=jnp.float32, backend="auto")

    def once(seed):
        t0 = time.perf_counter()
        skel = pf.sample_skeleton(sampler, n_sk, x0, v0, seed=seed, **kw)
        nv = np.asarray(jax.device_get(skel.n_valid))
        _force_scalar(skel.t)
        wall = time.perf_counter() - t0
        return skel, wall, int(nv.sum()) - B

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    once(0)
    print(f"compile+first run: {time.perf_counter() - t0:.1f} s", flush=True)
    best = float("inf")
    for rep in (1, 2):
        skel, wall, events = once(rep)
        best = min(best, wall)
        print(f"rep: {events} events in {wall:.3f} s = "
              f"{events / wall / 1e3:.1f} k events/s", flush=True)
    kind = np.asarray(skel.kind)
    print(f"BEST: {events / best / 1e3:.1f} k events/s "
          f"(r2 XLA baseline 442k); stick={int((kind == 3).sum())} "
          f"thaw={int((kind == 4).sum())}", flush=True)


if __name__ == "__main__":
    main()
