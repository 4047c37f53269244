"""Multi-host SPMD runtime initialization.

The reference has no distributed runtime (SURVEY.md §2.3). Here: one
process per host, ``jax.distributed.initialize`` wiring them into a
single SPMD program; collectives ride ICI within a slice and DCN across
hosts. A single-host run needs no initialization and takes the fast path.

Launch (per host):
    python -m honk_tpu.cli.train --coordinator <host0>:8476 \
        --process-id <i> --num-processes <n> ...
"""

from __future__ import annotations

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime; no-op for single-host runs."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the host that should print/log/checkpoint (host 0).

    Note there is deliberately no host-side per-process batch slicing
    helper: the packed corpus is device-resident and replicated, and batch
    sharding happens INSIDE the compiled step (with_sharding_constraint on
    the sampled batch), so each process never hand-slices host data.
    """
    return jax.process_index() == 0
