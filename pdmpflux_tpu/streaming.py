"""Streaming (bounded-memory) statistics over unbounded PDMP runs.

The materialized pipeline (``sample_skeleton`` -> ``sample_from_skeleton``
-> ``diagnostics.ess_summary``) holds the whole skeleton on device, so the
longest convergence-gated run is one HBM's worth of events.  This module
removes that ceiling: each stream fill is *folded* into O(B * d) running
accumulators on device and then discarded, so run length is unbounded while
ESS, split-R-hat, and posterior moments remain computable at the end.

The design fuses the reference's own online-diagnostic pattern — its online
realized volatility accumulates a statistic *during* time-horizon sampling
instead of from a materialized history (``/root/reference/src/sample.jl:
75-236``) — with the equal-time interpolation of ``sample_from_skeleton``
(``sample.jl:475-513``):

* a fixed equal-time grid ``t_j = (j + 1) T / n_samples`` is chosen up
  front (time-horizon mode, so the grid is known before sampling starts);
* after each fill, the grid points that the fill's trajectory newly covers
  are interpolated ON DEVICE directly from the raw transition stream (the
  stream rows carry trajectory time and are a valid skeleton — see
  ``core/engine.py`` ``make_stream_runner``), flowed from the covering row
  exactly as ``sample_from_skeleton`` would;
* the interpolated samples update running **split-half moment** accumulators
  (count / sum / sum-of-squares per chain half, for split-R-hat and
  posterior moments) and **batch-mean** accumulators (per-window sums, for
  the batch-means ESS estimator), then are dropped.

Estimators (finalized in float64 on the host):

* split-R-hat: Gelman-Rubin potential scale reduction over the 2B
  half-chains, computed from the half sufficient statistics — identical in
  definition to ``diagnostics.split_rhat`` on materialized samples.
* ESS per chain/coordinate via **batch means**: with ``M`` equal
  post-burn-in windows of length ``L`` samples, the asymptotic variance is
  ``sigma2 = L * Var(window means)`` and ``ESS = n * s^2 / sigma2``
  (Geyer's autocorrelation-sum estimator needs the full series; batch means
  is its standard O(M)-memory streaming replacement and agrees to the
  window-count noise floor).  Aggregation matches ``diagnostics.
  ess_summary``: per-coordinate sums over chains, worst coordinate
  reported, gated on split-R-hat.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import engine
from .core.types import PDMPState


class StreamingStats(NamedTuple):
    """O(B * d) on-device accumulators (see module docstring)."""

    n_half: jax.Array      # (B, 2)    samples folded per chain half
    sum_half: jax.Array    # (B, 2, d) sum of (x - x_ref) per half
    sumsq_half: jax.Array  # (B, 2, d) sum of (x - x_ref)^2 per half
    bsum: jax.Array        # (B, M, d) sum of (x - x_ref) per ESS window
    bcount: jax.Array      # (B, M)    samples folded per ESS window


def empty_stats(B: int, d: int, n_batches: int, dtype=jnp.float32):
    return StreamingStats(
        n_half=jnp.zeros((B, 2), jnp.int32),
        sum_half=jnp.zeros((B, 2, d), dtype),
        sumsq_half=jnp.zeros((B, 2, d), dtype),
        bsum=jnp.zeros((B, n_batches, d), dtype),
        bcount=jnp.zeros((B, n_batches), jnp.int32),
    )


class StreamingRun(NamedTuple):
    stats: StreamingStats  # final accumulators (device)
    state: PDMPState       # final engine state (continuation, sample.jl:281)
    events: int            # total events committed across all chains
    fills: int             # stream fills executed
    n_samples: int         # grid size the stats were folded over
    n_burnin: int          # leading grid points excluded from the stats


def make_fold_chunk(sampler, W: int, G: int, n_samples: int, n_batches: int,
                    n_burnin: int, dt_grid: float, x_ref):
    """Build the jitted fold of one grid chunk into the accumulators.

    Signature: ``fold(stats, stream, anchor, rows_written, j0, j_lo, j_hi)
    -> stats`` where ``stream`` is the RAW fill (its rows are a valid
    skeleton, see ``core/engine.py``), ``anchor = (t, x, v, is_active)`` is
    the carried trajectory point covering grid times before the fill's
    first row, ``rows_written`` the written row count (traced scalar; the
    runner's while_loop makes it fill-dependent), ``j0`` the chunk's first
    grid index, and ``j_lo/j_hi (B,)`` the per-chain half-open range of
    grid indices this fill newly covers.  Only indices in
    ``[max(j_lo, n_burnin), j_hi)`` contribute.
    """
    flow = sampler.flow
    n_post = max(n_samples - n_burnin, 1)
    x_ref = jnp.asarray(x_ref)

    def fold(stats: StreamingStats, stream, anchor, rows_written, j0,
             j_lo, j_hi):
        at, ax, av, aa = anchor
        dtype = stream.t.dtype
        col = jnp.arange(W, dtype=jnp.int32)[None, :]
        tm = jnp.where(col < rows_written, stream.t,
                       jnp.asarray(jnp.inf, dtype))                # (B, W)

        j = j0 + jnp.arange(G, dtype=jnp.int32)                    # (G,)
        tg = (j + 1).astype(dtype) * jnp.asarray(dt_grid, dtype)   # (G,)
        live = ((j[None, :] >= j_lo[:, None])
                & (j[None, :] < j_hi[:, None])
                & (j[None, :] >= n_burnin))                        # (B, G)

        idx = jax.vmap(
            lambda trow: jnp.searchsorted(trow, tg, side="right") - 1
        )(tm)                                                      # (B, G)
        # idx == -1: the grid time precedes every fill row — covered by the
        # carried anchor instead of a stream row.
        use_anchor = idx < 0
        idxc = jnp.clip(idx, 0, W - 1)

        def take(a, a_anchor):
            ix = idxc.reshape(idxc.shape + (1,) * (a.ndim - 2))
            g = jnp.take_along_axis(a, ix, axis=1)
            m = use_anchor.reshape(use_anchor.shape
                                   + (1,) * (a.ndim - 2))
            return jnp.where(m, a_anchor[:, None], g)

        x_i = take(stream.x, ax)                                   # (B, G, d)
        v_i = take(stream.v, av)
        a_i = take(stream.is_active, aa)
        t_i = jnp.where(use_anchor, at[:, None],
                        jnp.take_along_axis(tm, idxc, axis=1))     # (B, G)
        # clamp: float32 grid/row-time rounding can leave tg a ulp past the
        # covering row's time; masked-out lanes flow by 0 (RHMC's Verlet
        # while_loop must not see garbage times)
        tau = jnp.where(live, jnp.maximum(tg[None, :] - t_i, 0.0),
                        jnp.zeros((), dtype))
        v_used = jnp.where(a_i, v_i, jnp.zeros_like(v_i))
        xs, _ = jax.vmap(jax.vmap(flow))(x_i, v_used, tau)         # (B, G, d)
        xs = xs - x_ref

        w = live.astype(xs.dtype)                                  # (B, G)
        xm = xs * w[:, :, None]
        x2m = (xs * xs) * w[:, :, None]

        # post-burn-in ordinal of each grid index (clipped; masked-out
        # indices contribute zero weight regardless)
        jp = jnp.clip(j - n_burnin, 0, n_post - 1)
        half = jnp.clip(jp * 2 // n_post, 0, 1)                    # (G,)
        win = jnp.clip(jp * n_batches // n_post, 0, n_batches - 1)
        oh_h = (half[:, None] == jnp.arange(2)[None, :]).astype(xs.dtype)
        oh_w = (win[:, None]
                == jnp.arange(n_batches)[None, :]).astype(xs.dtype)

        return StreamingStats(
            n_half=stats.n_half
            + jnp.einsum("bg,gh->bh", w, oh_h).astype(jnp.int32),
            sum_half=stats.sum_half + jnp.einsum("bgd,gh->bhd", xm, oh_h),
            sumsq_half=stats.sumsq_half + jnp.einsum("bgd,gh->bhd", x2m, oh_h),
            bsum=stats.bsum + jnp.einsum("bgd,gm->bmd", xm, oh_w),
            bcount=stats.bcount
            + jnp.einsum("bg,gm->bm", w, oh_w).astype(jnp.int32),
        )

    return fold


def _anchor_from_state(state: PDMPState):
    """Interpolation anchor = the state's trajectory point: position ``x``
    at trajectory time ``t + ts`` (``ts`` accounts flow already performed
    past the last committed event — horizon moves), velocity/activity as
    stored.  Valid by the stream-row contract (``core/engine.py``)."""
    return (state.t + state.ts, state.x, state.v, state.is_active)


def sample_streaming_stats(
    sampler,
    T: float,
    xinit,
    vinit,
    *,
    n_samples: int = 4096,
    n_batches: int = 64,
    burnin_frac: float = 0.25,
    seed=None,
    dtype=None,
    t_cap: int | None = None,
    grid_chunk: int = 512,
    verbose: bool = False,
) -> StreamingRun:
    """Run time-horizon sampling to ``t = T`` while folding equal-time
    samples into O(B * d) streaming accumulators; the skeleton is never
    materialized, so run length is bounded by wall-clock, not HBM.

    ``n_samples`` equal-time grid points span ``(0, T]``; the leading
    ``burnin_frac`` fraction is excluded from the statistics (matching the
    benchmark sweep's burn-in discard).  Finalize with
    :func:`streaming_summary`.
    """
    from .api import _device_bytes_budget, _prep_init
    from .ops.pallas import driver as pallas_driver

    if not (isinstance(T, (int, float)) and math.isfinite(T) and T > 0):
        raise ValueError(f"T must be finite and positive. Current value: {T}")
    T = float(T)
    if n_samples < n_batches * 2:
        raise ValueError(
            f"n_samples={n_samples} must be at least 2 * n_batches="
            f"{2 * n_batches} for the batch-means ESS estimator"
        )
    x, v, _squeeze = _prep_init(sampler, xinit, vinit)
    B, d = x.shape
    n_burnin = int(burnin_frac * n_samples)
    dt_grid = T / n_samples
    x_ref = np.asarray(x.mean(axis=0), np.float32)

    # Fill geometry: bounded by the device budget.  Peak live buffers:
    # fill k's stream (being folded) + the double-buffered fill k+1's input
    # and output streams + fold gather temporaries — ~6 stream-sized
    # allocations.
    itemsize = jnp.asarray(np.float64(0.0), dtype).dtype.itemsize
    row_bytes = (2 * d + 20) * itemsize + d
    if t_cap is None:
        budget_rows = int(_device_bytes_budget() / max(B * row_bytes, 1) / 6)
        t_cap = max(256, min(8192, budget_rows // 256 * 256))
    G = int(grid_chunk)

    on_stream = (jax.devices()[0].platform == "tpu"
                 or os.environ.get("PDMPFLUX_FORCE_STREAM", "") == "1")
    if on_stream:
        runner = pallas_driver.make_stream_call(
            sampler, B, t_cap, t_cap, mode="horizon"
        )
    else:
        xrun = sampler._cached(
            ("xla_stream", t_cap, "horizon"),
            lambda: jax.jit(engine.make_stream_runner(
                sampler, t_cap, chunk=64, mode="horizon")),
        )
        runner = lambda st, stream, counts, tt: xrun(st, stream, counts, tt)

    fold = sampler._cached(
        ("fold_chunk", t_cap, G, n_samples, n_batches, n_burnin,
         float(dt_grid), B),
        lambda: jax.jit(make_fold_chunk(
            sampler, t_cap, G, n_samples, n_batches, n_burnin, dt_grid,
            x_ref,
        )),
    )

    state = sampler.init_state_batch(x, v, seed, dtype)
    stats = empty_stats(B, d, n_batches, state.x.dtype)
    anchor = _anchor_from_state(state)
    j_lo = np.zeros(B, np.int64)
    Tv = jnp.asarray(T, jnp.float32)
    events = 0
    fills = 0

    def launch(st):
        """Dispatch one fill (async — no host round trip)."""
        stream = engine.empty_stream(t_cap, d, st.x.dtype, B)
        return runner(st, stream, jnp.zeros((B,), jnp.int32), Tv)

    # Fills are double-buffered: fill k+1 is dispatched BEFORE fetching
    # fill k's metadata, so the fetch round trip (the dominant per-fill
    # overhead at ~20-40 ms through a remote-dispatch tunnel; measured 10 s
    # of 45 s on the 278-fill dim-1000 gated run) overlaps fill k+1's
    # device execution.  The fold only reads fill k's stream and the
    # carried anchor, so it is dispatched behind fill k+1 with no hazard;
    # when fill k turns out to have finished the horizon, the speculative
    # fill ran on an all-frozen state — its while_loop exits at iteration
    # 0 (one cheap no-op dispatch).
    res_prev = launch(state)
    while True:
        new_state = res_prev.state
        t_traj_dev = new_state.t + new_state.ts
        t_host, traj_host, cnt_host, tr_host = jax.device_get(
            (new_state.t, t_traj_dev, res_prev.counts,
             res_prev.transitions)
        )
        fills += 1
        events += int(np.asarray(cnt_host).sum())
        done = np.asarray(t_host) >= T
        all_done = bool(done.all())
        res_next = None if all_done else launch(new_state)
        # grid indices covered by this fill: trajectory reached t+ts, and a
        # finished chain's flow extends deterministically to T
        j_hi = np.minimum(
            np.floor(np.asarray(traj_host, np.float64) / dt_grid).astype(
                np.int64),
            n_samples,
        )
        j_hi = np.where(done, n_samples, j_hi)
        j_hi = np.maximum(j_hi, j_lo)

        if np.any(j_hi > j_lo):
            rows_written = jnp.asarray(int(tr_host), jnp.int32)
            lo_dev = jnp.asarray(j_lo, jnp.int32)
            hi_dev = jnp.asarray(j_hi, jnp.int32)
            j0 = int(j_lo.min())
            j_end = int(j_hi.max())
            for start in range(j0, j_end, G):
                stats = fold(stats, res_prev.stream, anchor, rows_written,
                             jnp.asarray(start, jnp.int32), lo_dev, hi_dev)
        j_lo = j_hi
        anchor = _anchor_from_state(new_state)
        state = new_state
        if verbose:
            print(
                f"[streaming] fill {fills}: t={np.asarray(t_host).min():.4g}"
                f"/{T} grid {int(j_lo.min())}/{n_samples} "
                f"(chains done: {int(done.sum())}/{B})"
            )
        if all_done and int(j_lo.min()) >= n_samples:
            break
        if int(tr_host) == 0 and not all_done:
            raise RuntimeError("streaming sampling made no progress")
        res_prev = res_next if res_next is not None else launch(state)
    sampler.state = state
    return StreamingRun(stats, state, events, fills, n_samples, n_burnin)


def streaming_summary(run: StreamingRun, x_ref=None,
                      rhat_threshold: float | None = None) -> dict:
    """Finalize a :class:`StreamingRun` into moments, split-R-hat, and the
    batch-means ESS aggregate (float64, host).  Mirrors the fields of
    ``diagnostics.ess_summary`` plus per-chain moments."""
    from .diagnostics import RHAT_THRESHOLD

    if rhat_threshold is None:
        rhat_threshold = RHAT_THRESHOLD
    s = jax.device_get(run.stats)
    n_h = np.asarray(s.n_half, np.float64)          # (B, 2)
    sum_h = np.asarray(s.sum_half, np.float64)      # (B, 2, d)
    sq_h = np.asarray(s.sumsq_half, np.float64)
    bsum = np.asarray(s.bsum, np.float64)           # (B, M, d)
    bcount = np.asarray(s.bcount, np.float64)
    B, M, d = bsum.shape

    n_safe = np.maximum(n_h, 1.0)[:, :, None]
    mu_h = sum_h / n_safe                           # (B, 2, d) centered means
    var_h = np.maximum(
        (sq_h - sum_h * mu_h) / np.maximum(n_h[:, :, None] - 1.0, 1.0), 0.0
    )
    n_tot = n_h.sum(axis=1)                         # (B,)
    mean_c = sum_h.sum(axis=1) / np.maximum(n_tot, 1.0)[:, None]  # centered
    var_c = np.maximum(
        (sq_h.sum(axis=1) - n_tot[:, None] * mean_c ** 2)
        / np.maximum(n_tot - 1.0, 1.0)[:, None],
        0.0,
    )

    # split-R-hat over the 2B half-chains (diagnostics.split_rhat formula
    # from sufficient statistics; half lengths are equal by grid design)
    n_half = float(np.maximum(n_h.mean(), 2.0))
    seq_mu = mu_h.reshape(2 * B, d)
    W = var_h.reshape(2 * B, d).mean(axis=0)
    B_var = n_half * seq_mu.var(axis=0, ddof=1)
    var_plus = (n_half - 1.0) / n_half * W + B_var / n_half
    rhat = np.sqrt(np.where(W > 0, var_plus / np.where(W > 0, W, 1.0), 1.0))

    # batch-means ESS per chain/coordinate
    bc = np.maximum(bcount, 1.0)[:, :, None]
    bmu = bsum / bc                                 # (B, M, d) window means
    var_bm = bmu.var(axis=1, ddof=1)                # (B, d)
    L = np.maximum(bcount.mean(axis=1), 1.0)[:, None]   # window length
    ess = np.where(
        var_bm > 0,
        np.maximum(n_tot[:, None], 1.0) * var_c / (L * np.where(
            var_bm > 0, var_bm, 1.0)),
        np.maximum(n_tot[:, None], 1.0),
    )                                               # (B, d)
    per_coord = ess.sum(axis=0)

    if x_ref is None:
        x_ref = 0.0
    mean = mean_c + np.asarray(x_ref)
    return {
        "mean": mean,                               # (B, d)
        "var": var_c,                               # (B, d)
        "pooled_mean": mean.mean(axis=0),
        "pooled_var": (var_c + (mean - mean.mean(axis=0)) ** 2).mean(axis=0),
        "ess": ess,                                 # (B, d)
        "ess_per_coord": per_coord,
        "ess_total_worst_coord": float(per_coord.min()),
        "rhat": rhat,
        "rhat_max": float(rhat.max()),
        "converged": bool(rhat.max() < rhat_threshold),
        "n_samples_used": float(n_tot.sum()),
    }
