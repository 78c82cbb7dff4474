"""Worker for the 2-process ``jax.distributed`` smoke test (run by
``test_distributed.py``; not collected by pytest).

Usage: python distributed_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # cross-process collectives on the CPU backend need an explicit impl
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pdmpflux_tpu.parallel import distributed as dist

    ok = dist.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert ok, "initialize() returned False for a 2-process group"
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.process_index() == process_id
    assert len(jax.devices()) == 4 * num_processes, len(jax.devices())

    mesh = dist.global_mesh()
    assert mesh.shape["chains"] == 4 * num_processes, dict(mesh.shape)

    lo, hi = dist.process_local_chain_slice(16)
    assert (hi - lo) == 16 // num_processes
    assert lo == process_id * (16 // num_processes)

    stats = dist.host_all_gather_stats(
        {"events": 10.0 * (process_id + 1), "rejected": 1.0}
    )
    expect_events = sum(10.0 * (p + 1) for p in range(num_processes))
    assert abs(float(stats["events"]) - expect_events) < 1e-6, stats
    assert abs(float(stats["rejected"]) - num_processes) < 1e-6, stats
    print(f"worker {process_id} OK", flush=True)


if __name__ == "__main__":
    main()
