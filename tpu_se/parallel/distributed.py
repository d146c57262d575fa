"""Multi-host runtime glue.

The reference is strictly single-process/single-GPU (SURVEY.md §2.4); this
module is the new framework's multi-host entry: ``jax.distributed`` for the
runtime, per-host input sharding via ``tpu_se.data.pipeline.shard_for_host``,
ICI collectives inside the jitted step (no NCCL/MPI analogue needed — GSPMD
emits them from the shardings).
"""

from __future__ import annotations

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           cpu_collectives: str | None = None) -> dict:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    On TPU pods the collectives ride ICI automatically; pass
    ``cpu_collectives="gloo"`` for multi-process CPU runs (CI / the
    multi-host equivalence test) so the CPU backend joins the cluster.
    Returns a summary dict (process index/count, local/global devices).
    """
    if coordinator_address is not None:
        if cpu_collectives is not None:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
