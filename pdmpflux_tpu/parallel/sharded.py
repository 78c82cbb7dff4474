"""Sharded chain-batch drivers: `shard_map` over a ``chains`` mesh axis.

Design (SURVEY.md §5 "Distributed communication backend"):

* chain simulation itself needs **zero communication** — each device runs an
  *independent* jit-compiled transition-stream `while_loop` over its local
  chain shard (``shard_map`` keeps the loop condition local, so no per-
  iteration cross-device all-reduce, unlike a GSPMD-partitioned global loop);
* cross-chain diagnostics (acceptance rates, rejection/error totals, sample
  moments) are reduced with ``psum``/``pmean`` collectives over ICI;
* for very large state dimension there is a GSPMD path
  (``sample_skeleton_gspmd``) that additionally shards the ``dim`` axis of
  ``x``/``v`` and lets XLA insert the collectives for the rate dot products.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..core import engine
from ..core.types import EV_INIT, PDMPState, Skeleton, empty_skeleton
from . import mesh as mesh_lib


class ShardedRun(NamedTuple):
    state: PDMPState          # (B, ...) chain-sharded final states
    skeleton: Skeleton        # (B, N, ...) chain-sharded event buffers
    transitions: jax.Array    # (n_shards,) per-device transition counts
    stats: dict               # globally reduced diagnostics (host scalars)


def _runner_with_stats(sampler, n_events: int, max_transitions: int):
    """Per-shard body: local transition stream + psum-reduced diagnostics."""
    run = engine.make_fixed_event_runner(sampler, n_events, max_transitions)

    def body(state: PDMPState, skel: Skeleton):
        res = run(state, skel)
        s = res.skeleton
        # Diagnostics reduced across the chains mesh axis with collectives.
        valid = (jnp.arange(s.t.shape[1])[None, :] < s.n_valid[:, None])
        n_ev = jnp.sum(s.n_valid)
        ar_sum = jnp.sum(jnp.where(valid, s.ar, 0.0))
        rej = jnp.sum(jnp.where(valid, s.rejected, 0))
        err = jnp.sum(jnp.where(valid, s.errored_bound, 0))
        hit = jnp.sum(jnp.where(valid, s.hitting_horizon, 0))
        stats = {
            "events": jax.lax.psum(n_ev, mesh_lib.CHAIN_AXIS),
            "ar_sum": jax.lax.psum(ar_sum, mesh_lib.CHAIN_AXIS),
            "rejected": jax.lax.psum(rej, mesh_lib.CHAIN_AXIS),
            "errored_bound": jax.lax.psum(err, mesh_lib.CHAIN_AXIS),
            "hitting_horizon": jax.lax.psum(hit, mesh_lib.CHAIN_AXIS),
        }
        return res.state, res.skeleton, jnp.reshape(res.transitions, (1,)), stats

    return body


def sample_skeleton_sharded(
    sampler,
    n_events: int,
    xinit,
    vinit,
    *,
    mesh=None,
    seed=None,
    dtype=None,
    max_transitions_per_event: int = 256,
) -> ShardedRun:
    """Generate ``n_events``-point skeletons for a chain batch sharded over a
    device mesh.  ``xinit``/``vinit`` are ``(B, d)`` with ``B`` divisible by
    the number of devices on the ``chains`` axis.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    xinit = np.asarray(xinit, float)
    vinit = np.asarray(vinit, float)
    B, d = xinit.shape
    n_shards = mesh.shape[mesh_lib.CHAIN_AXIS]
    if B % n_shards != 0:
        raise ValueError(
            f"chain batch {B} must be divisible by the {n_shards}-device "
            f"'chains' mesh axis"
        )

    state = sampler.init_state_batch(xinit, vinit, seed, dtype)
    skel = empty_skeleton(n_events, d, state.x.dtype, batch_shape=(B,))
    skel = engine.record_initial(skel, state, EV_INIT)

    # Place chain-sharded.
    st_sh = mesh_lib.state_shardings(mesh)
    sk_sh = mesh_lib.skeleton_shardings(mesh)
    state = jax.device_put(state, st_sh)
    skel = jax.device_put(skel, sk_sh)

    max_tr = int(n_events) * int(max_transitions_per_event)
    cache_key = ("sharded_fixed", n_events, max_tr, id(mesh))

    def factory():
        body = _runner_with_stats(sampler, n_events, max_tr)
        pspec = P(mesh_lib.CHAIN_AXIS)
        sspec = jax.tree.map(lambda _: pspec, state)
        kspec = jax.tree.map(lambda _: pspec, skel)
        shmapped = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(sspec, kspec),
            out_specs=(sspec, kspec, pspec, P()),
            check_vma=False,
        )
        return jax.jit(shmapped, donate_argnums=(0, 1))

    run = sampler._cached(cache_key, factory)
    out_state, out_skel, transitions, stats = run(state, skel)
    stats = {k: np.asarray(v) for k, v in jax.device_get(stats).items()}
    stats["mean_ar"] = float(stats["ar_sum"] / np.maximum(stats["events"], 1))
    return ShardedRun(out_state, out_skel, transitions, stats)


def sample_skeleton_gspmd(
    sampler,
    n_events: int,
    xinit,
    vinit,
    *,
    mesh=None,
    seed=None,
    dtype=None,
    max_transitions_per_event: int = 256,
):
    """GSPMD path: chains *and* state dimension sharded; XLA's partitioner
    inserts the collectives for dot products over the sharded ``dim`` axis.
    Use for very large ``dim`` (tensor-parallel analogue; SURVEY.md §2
    parallelism table)."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    xinit = np.asarray(xinit, float)
    vinit = np.asarray(vinit, float)
    B, d = xinit.shape

    state = sampler.init_state_batch(xinit, vinit, seed, dtype)
    skel = empty_skeleton(n_events, d, state.x.dtype, batch_shape=(B,))
    skel = engine.record_initial(skel, state, EV_INIT)

    st_sh = mesh_lib.state_shardings(mesh, shard_dim=True)
    sk_sh = mesh_lib.skeleton_shardings(mesh, shard_dim=True)
    state = jax.device_put(state, st_sh)
    skel = jax.device_put(skel, sk_sh)

    max_tr = int(n_events) * int(max_transitions_per_event)
    cache_key = ("gspmd_fixed", n_events, max_tr, id(mesh))

    def factory():
        run = engine.make_fixed_event_runner(sampler, n_events, max_tr)
        return jax.jit(
            run, donate_argnums=(0, 1), out_shardings=engine.RunResult(
                st_sh, sk_sh, jax.sharding.NamedSharding(mesh, P())
            ),
        )

    run = sampler._cached(cache_key, factory)
    return run(state, skel)


def sample_from_skeleton_batch(sampler, n_per_chain: int, skeleton: Skeleton):
    """Batched skeleton -> samples: ``n_per_chain`` equal-time samples per
    chain from a padded chain-batch skeleton; returns ``(B, n, d)``.

    The vectorized counterpart of ``sample_from_skeleton`` for chain batches
    (leading axes stay sharded if the skeleton is)."""
    t = jnp.asarray(skeleton.t)
    X = jnp.asarray(skeleton.x)
    V = jnp.asarray(skeleton.v)
    A = jnp.asarray(skeleton.is_active)
    n_valid = jnp.asarray(skeleton.n_valid)
    B, N = t.shape

    def per_chain(tb, xb, vb, ab, nb):
        t_end = tb[jnp.maximum(nb - 1, 0)]
        # padding slots hold zeros; push them past any query time so the
        # binary search only sees the valid monotone prefix
        tb_eff = jnp.where(jnp.arange(N) < nb, tb, jnp.inf)
        tm = jnp.arange(1, n_per_chain + 1, dtype=tb.dtype) * (
            t_end / n_per_chain
        )
        idx = jnp.clip(jnp.searchsorted(tb_eff, tm, side="right") - 1, 0, nb - 1)

        def one(i, tmj):
            v_used = jnp.where(ab[i], vb[i], 0.0)
            xn, _ = sampler.flow(xb[i], v_used, tmj - tb[i])
            return xn

        return jax.vmap(one)(idx, tm)

    return jax.vmap(per_chain)(t, X, V, A, n_valid)


def pooled_moments(skeleton: Skeleton, sampler, n_per_chain: int, mesh=None):
    """Cross-chain pooled posterior moments from batched skeletons.

    Interpolates ``n_per_chain`` equal-time samples per chain (vectorized
    ``sample_from_skeleton``) and reduces first/second moments over all
    chains — the collective-aggregated diagnostic the reference cannot do
    (it has no chain batching at all).
    """
    t = jnp.asarray(skeleton.t)
    X = jnp.asarray(skeleton.x)
    V = jnp.asarray(skeleton.v)
    A = jnp.asarray(skeleton.is_active)
    n_valid = jnp.asarray(skeleton.n_valid)
    B, N = t.shape

    def per_chain(tb, xb, vb, ab, nb):
        t_end = tb[jnp.maximum(nb - 1, 0)]
        tb_eff = jnp.where(jnp.arange(N) < nb, tb, jnp.inf)
        tm = jnp.arange(1, n_per_chain + 1, dtype=tb.dtype) * (t_end / n_per_chain)
        idx = jnp.clip(jnp.searchsorted(tb_eff, tm, side="right") - 1, 0, nb - 1)

        def one(i, tmj):
            v_used = jnp.where(ab[i], vb[i], 0.0)
            xn, _ = sampler.flow(xb[i], v_used, tmj - tb[i])
            return xn

        xs = jax.vmap(one)(idx, tm)
        return jnp.sum(xs, axis=0), jnp.sum(xs * xs, axis=0)

    s1, s2 = jax.vmap(per_chain)(t, X, V, A, n_valid)
    n_tot = B * n_per_chain
    mean = jnp.sum(s1, axis=0) / n_tot
    var = jnp.sum(s2, axis=0) / n_tot - mean**2
    return mean, var
