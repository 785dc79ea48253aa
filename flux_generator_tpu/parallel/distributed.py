"""Multi-host initialization.

The reference's distributed story is MPI via mx.distributed
(dreambooth.py:175). TPU-native: jax.distributed.initialize() wires hosts in
a slice together; afterwards jax.devices() spans the slice and the same mesh
code (parallel.mesh) shards across it — DP gradients ride ICI/DCN through
GSPMD, no app-level collectives.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX. No-ops on single-process setups; on TPU pods
    the arguments are auto-detected from the environment."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # already initialized or single-process
        if "already" not in str(e).lower() and num_processes not in (None, 1):
            raise


def process_info():
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
