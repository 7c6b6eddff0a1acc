"""Multi-host distribution: process bootstrap + global mesh over DCN.

The reference is a single-threaded CPU library (SURVEY.md §2.3); this is
green-field TPU-native design for the BASELINE multi-host target
("≥70% scaling efficiency at 4 hosts"). The recipe:

  * every host process calls :func:`init_distributed` once at startup —
    on a real multi-host TPU slice the coordinator/process topology is
    auto-detected from the TPU environment (`jax.distributed.initialize`
    with no arguments); on clusters without auto-detection the standard
    coordinator triple can be passed explicitly or via the
    `CORA_COORDINATOR / CORA_NUM_PROCESSES / CORA_PROCESS_ID` env vars;
  * :func:`make_global_mesh` builds a 1-D `graph` mesh over **all**
    devices in the job (local and remote). The edge-sharded operator
    (`cora_tpu.parallel.sharding`) then runs unchanged: its single psum
    per Q·Y application rides ICI within a host's chips and DCN across
    hosts; the replicated tall-skinny state means the collective payload
    is N×r floats (hundreds of KB at 100k poses) per Hessian-vector
    product, far below DCN saturation at the staircase's arithmetic
    intensity;
  * `solve_cora(..., mesh=make_global_mesh())` is then a multi-host
    certified solve: the host-side certification/polish runs redundantly
    and deterministically on every process (same replicated inputs), so
    no process ever diverges on control flow.

Single-process smoke path: with one process (the common case, and how
the CPU-mesh tests run) `init_distributed` is a no-op and
`make_global_mesh` degrades to `sharding.make_mesh`.
"""

from __future__ import annotations

import os

import numpy as np

from cora_tpu.parallel.sharding import AXIS

_initialized = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the JAX distributed runtime for a multi-process job.

    Returns True when a multi-process runtime was started, False for the
    single-process no-op. Safe to call more than once. Environment
    overrides (used when arguments are omitted):

      CORA_COORDINATOR    host:port of process 0
      CORA_NUM_PROCESSES  total process count
      CORA_PROCESS_ID     this process's rank
    """
    global _initialized
    if _initialized:
        return True

    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "CORA_COORDINATOR"
    )
    if num_processes is None and "CORA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["CORA_NUM_PROCESSES"])
    if process_id is None and "CORA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["CORA_PROCESS_ID"])

    on_tpu_pod = any(
        v in os.environ for v in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process job: nothing to initialize

    # explicit triple, or TPU-pod auto-detection with no arguments
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # TPU-ish environment without a resolvable multi-host
            # topology (e.g. a single-chip tunnel that still exports
            # TPU_WORKER_HOSTNAMES): run single-process
            return False
    _initialized = True
    return True


def make_global_mesh(axis: str = AXIS):
    """1-D mesh over every device in the job (all hosts).

    Device order follows `jax.devices()` (process-major), so each host's
    edge shard lands on its local chips and the psum's cross-host hop
    count is minimal.
    """
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) of this job."""
    import jax

    return jax.process_index(), jax.process_count()
