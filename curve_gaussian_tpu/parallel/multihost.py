"""Multi-host orchestration glue.

Two scaling regimes (SURVEY §5 'distributed communication backend'):

  * INTRA-SLICE (ICI): one scene, many chips — handled by
    parallel/sharding.py (view-parallel grads psum'd over the mesh).  On a
    multi-host slice the same code runs SPMD after jax.distributed
    initialization; the mesh simply spans all hosts' devices.
  * ACROSS SLICES / DCN: many scenes — embarrassingly parallel per-scene
    jobs (scripts/run_batch_abc.py), optionally coordinated here by
    assigning scans to hosts round-robin.

This module is exercised only on real multi-host slices; single-process
fallbacks keep it importable (and unit-testable) everywhere.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """jax.distributed.initialize with env fallbacks; returns process index.

    No-op (returns 0) when running single-process."""
    import jax

    num = num_processes or int(os.environ.get("CGT_NUM_PROCESSES", "1"))
    if num <= 1:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("CGT_COORDINATOR", None),
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("CGT_PROCESS_ID", "0")),
    )
    return jax.process_index()


def shard_scans(scans: Sequence[str], process_id: int, num_processes: int) -> List[str]:
    """Round-robin scene assignment for DCN-level scene sweeps."""
    return [s for i, s in enumerate(scans) if i % num_processes == process_id]


def global_mesh(axis: str = "data"):
    """Mesh over ALL devices in the (possibly multi-host) runtime; with
    jax.distributed initialized, jax.devices() spans every host and the
    psum in parallel_train_step rides ICI within a slice."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
