"""Multi-process (multi-host) initialisation.

The reference has no communication backend at all (SURVEY.md §2.2). For
multi-host TPU slices, JAX's runtime carries the coordination: call
:func:`maybe_initialize` once per process before any device use and every
host sees the global device set; GSPMD then lays collectives over ICI
within a slice and DCN across slices automatically. All sharding code in
``tpgan_tpu.parallel`` is already global-device-set based, so nothing
else changes between single-host and pod runs.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise jax.distributed when running multi-process.

    With no arguments, initialises only when the standard cluster
    environment variables are present (TPU pod runtimes set them) and is
    a no-op otherwise — safe to call unconditionally from CLI entry
    points. Returns True when distributed mode is active."""
    global _initialized
    if _initialized:
        return True

    import jax

    env_driven = any(
        v in os.environ
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "TPU_WORKER_ID")
    )
    if coordinator_address is None and not env_driven:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        return True
    except Exception:
        # single-process fallback (e.g. already initialised by the runtime)
        return False


def process_batch_slice(global_batch: int) -> int:
    """Per-process batch size for a host-sharded input pipeline."""
    import jax

    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n
