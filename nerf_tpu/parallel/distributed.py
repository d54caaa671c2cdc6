"""Multi-host orchestration: process init, per-host data sharding, and a
collective-health watchdog.

The reference has no multi-node story at all (SURVEY.md §2.2).  On TPU pods
the runtime is: one Python process per host, ``jax.distributed.initialize``
wires the coordinator, every process runs the SAME SPMD program, and XLA
routes collectives over ICI within a slice (DCN across slices).  This
module wraps that plus the host-local slice of the global ray bank and a
simple heartbeat barrier for failure detection (SURVEY.md §5 failure row).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (no-op for single-process runs).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly for manual launches.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "initialized process %d/%d with %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_coordinator() -> bool:
    """True on host 0 — the only host that should write logs/checkpoints."""
    return jax.process_index() == 0


def host_local_slice(n: int, batch_size: int) -> slice:
    """The contiguous index range of the global array this host owns.

    For per-host data loading: host ``p`` of ``P`` feeds its local devices
    the ``p``-th shard of every global batch, so the logical global batch
    stays identical to the single-host run.
    """
    p, count = jax.process_index(), jax.process_count()
    per = batch_size // count
    if batch_size % count:
        raise ValueError(
            f"global batch {batch_size} not divisible by {count} hosts"
        )
    del n
    return slice(p * per, (p + 1) * per)


def collective_barrier(tag: int = 0) -> None:
    """Cross-host barrier through a tiny psum — doubles as a collective
    health check: a dead host makes this hang visibly rather than letting
    training silently diverge (deadlock-watchdog pattern, SURVEY.md §5)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("all",))
    token = jax.device_put(
        np.ones((devices.size,), np.int32),
        NamedSharding(mesh, P("all")),
    )
    total = jax.jit(
        lambda x: x.sum(), out_shardings=NamedSharding(mesh, P())
    )(token)
    if int(total) != devices.size:
        raise RuntimeError(
            f"collective barrier mismatch: {int(total)} != {devices.size}"
        )
