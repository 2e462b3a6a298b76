"""Multi-host entry point: jax.distributed init + cross-host meshes.

SURVEY.md §5 ("Distributed communication backend"): the reference is a
single shared-memory process; the TPU-native equivalent is
``jax.distributed.initialize`` for multi-host process groups, XLA ICI
collectives for intra-slice halo exchange (sharding.py ppermute chains), and
DCN between slices. This module provides the process-group entry point and
the cross-host mesh builder; everything downstream (ShardedApplier,
make_sharded_apply*) already operates on an arbitrary ``jax.sharding.Mesh``
and is host-count agnostic — the row axis simply spans more devices.

Launch recipe (one process per host, all hosts run the same program):

    # host 0 (coordinator), N hosts total:
    JINCRESIZE_COORDINATOR=host0:8476 JINCRESIZE_NUM_PROCESSES=N \
    JINCRESIZE_PROCESS_ID=0 python my_resize_job.py
    # host k:
    JINCRESIZE_COORDINATOR=host0:8476 JINCRESIZE_NUM_PROCESSES=N \
    JINCRESIZE_PROCESS_ID=k python my_resize_job.py

    # my_resize_job.py:
    from jincresize_tpu.distributed import init_distributed, global_mesh
    init_distributed()                    # reads the env vars above
    mesh = global_mesh()                  # rows axis over ALL hosts' chips
    out = jinc_resize(clip, W, H, mesh=mesh)

On TPU pods the coordinator/process env vars are usually provided by the
scheduler and ``jax.distributed.initialize()`` auto-detects them — then
``init_distributed()`` with no env vars set degrades to exactly that call.
Scaling expectation (BASELINE.md §3): the halo exchange ships
``(filter_size-1) x width`` rows per device boundary per frame while the
interior MAC scales with ``height/n_devices x width``, so row-sharding
efficiency stays >90% while the per-device band height dominates the halo
(bands >= ~10x the filter support); measure with ``python bench.py
--scaling`` (virtual devices) or the same flag on real chips.
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host JAX process group (idempotent).

    Arguments default to ``JINCRESIZE_COORDINATOR`` /
    ``JINCRESIZE_NUM_PROCESSES`` / ``JINCRESIZE_PROCESS_ID``; with none set,
    defers entirely to ``jax.distributed.initialize()`` auto-detection
    (TPU-pod schedulers populate the cluster env). Single-process runs (no
    env, no args, no scheduler) are left untouched: initialize() is only
    called when at least one source provides cluster coordinates.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JINCRESIZE_COORDINATOR"
    )
    if num_processes is None and "JINCRESIZE_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JINCRESIZE_NUM_PROCESSES"])
    if process_id is None and "JINCRESIZE_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JINCRESIZE_PROCESS_ID"])
    explicit = {
        "coordinator_address": coordinator_address,
        "num_processes": num_processes,
        "process_id": process_id,
    }
    given = [k for k, v in explicit.items() if v is not None]
    if given and len(given) != len(explicit):
        # All-or-none: forwarding None for a partner field produces a
        # confusing jax.distributed.initialize failure (ADVICE r4).
        missing = sorted(set(explicit) - set(given))
        raise ValueError(
            "init_distributed: cluster coordinates must be fully specified — "
            f"got {sorted(given)} but missing {missing} (set the matching "
            "JINCRESIZE_COORDINATOR / JINCRESIZE_NUM_PROCESSES / "
            "JINCRESIZE_PROCESS_ID or pass all three arguments)"
        )
    if coordinator_address is None and num_processes is None:
        # Nothing explicit: only auto-detect when a known scheduler env is
        # present, so plain single-host usage never blocks on a coordinator.
        if any(
            v in os.environ
            for v in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
        ):
            jax.distributed.initialize()
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(n_rows: int | None = None, n_data: int = 1):
    """('data', 'rows') mesh over every device of every host.

    Row-partitioning rides ICI within a slice and DCN across slices; lay the
    ``rows`` axis along the global device order (jax.devices() enumerates
    local-first per process, which keeps each host's rows contiguous — halo
    ppermutes between row-neighbors then cross DCN only at host boundaries).
    """
    from .sharding import make_mesh
    import jax

    return make_mesh(n_rows=n_rows, n_data=n_data, devices=jax.devices())
