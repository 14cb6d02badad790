"""Multi-host initialization and mesh construction.

The reference has no distributed capability (SURVEY.md §2); this module is
the entry point for the pod-slice scale-out of BASELINE.json configs[4]:

* ``init_distributed`` wraps jax.distributed.initialize (the TPU-native
  equivalent of the NCCL/MPI bootstrap other frameworks use) — on TPU pods
  the coordinator/process info comes from the environment automatically.
* ``make_pod_mesh`` builds the standard 2-level mesh: a ``seq`` axis for
  independent sequences (data parallel — zero collectives) and an ``lm``/
  ``kl`` axis for map-sharded work (BA Schur reductions, keyline-sharded
  tracking) whose psums ride ICI within a slice.  Axis sizes are chosen so
  the inner (collective-bearing) axis maps onto devices within a host, and
  the outer axis spans hosts over DCN — collectives never cross DCN.

With a single process this degrades to the local device set, so the same
code paths run everywhere (tests use the 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX when running on multiple hosts.

    No-op for single-process runs.  On Cloud TPU pods all arguments are
    discovered from the environment; pass them explicitly for manual
    multi-process CPU/GPU bring-up.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def make_pod_mesh(
    seq_parallel: Optional[int] = None,
    inner_axis: str = "lm",
) -> Mesh:
    """(seq, inner) mesh over all visible devices.

    ``seq_parallel`` defaults to the number of processes (hosts) so the
    sequence axis spans hosts (DCN) and the inner map axis stays within a
    host (ICI).  The inner axis name is "lm" for BA landmark sharding or
    "kl" for keyline sharding.
    """
    devs = jax.devices()
    n = len(devs)
    if seq_parallel is None:
        seq_parallel = max(jax.process_count(), 1)
    if n % seq_parallel != 0:
        raise ValueError(f"{n} devices not divisible by seq_parallel={seq_parallel}")
    inner = n // seq_parallel
    arr = np.asarray(devs).reshape(seq_parallel, inner)
    return Mesh(arr, axis_names=("seq", inner_axis))


def local_batch_slice(global_batch: int, mesh: Mesh) -> Tuple[int, int]:
    """(start, size) of this process's slice of a seq-sharded global batch."""
    seq = mesh.shape["seq"]
    if global_batch % seq != 0:
        raise ValueError(f"batch {global_batch} not divisible by seq={seq}")
    per = global_batch // seq
    # processes own contiguous blocks of the seq axis in mesh order
    pid = jax.process_index()
    procs = max(jax.process_count(), 1)
    rows_per_proc = max(seq // procs, 1)
    start = (pid * rows_per_proc) * per
    return start, rows_per_proc * per
