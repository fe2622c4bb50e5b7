"""Multi-host initialization — the TPU-native replacement for the reference's
`accelerate launch` process bootstrap (SURVEY.md section 5.8).

On a real multi-host TPU slice, call :func:`init_distributed` first thing in
every process; JAX wires coordinator discovery and device visibility, mesh
axes then span all hosts and GSPMD collectives ride ICI within a slice and
DCN across slices.  Single-process (this dev box, CI) it is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    if distributed mode is active.  Arguments default to the standard env
    variables (JAX_COORDINATOR_ADDRESS etc. / TPU pod metadata)."""
    if jax.distributed.is_initialized():
        # idempotent entry: a launcher (or an earlier CLI in-process)
        # already bootstrapped — keep the existing runtime
        return jax.process_count() > 1
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    in_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if not explicit and not in_pod:
        return False
    # jax only auto-detects num/id on recognized clusters (TPU pod, SLURM,
    # k8s); for a generic spawn (our multi-process tests, bare-metal CPU
    # hosts) honor explicit env vars alongside JAX_COORDINATOR_ADDRESS
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # idempotent entry: a driver may have initialized before the CLI
        # main did ("distributed.initialize should only be called once") —
        # anything else is a real bootstrap failure
        if "only be called once" not in str(e):
            raise
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> slice:
    """This host's shard of a globally-sharded batch (host data loading)."""
    per = global_batch // jax.process_count()
    lo = per * jax.process_index()
    return slice(lo, lo + per)
