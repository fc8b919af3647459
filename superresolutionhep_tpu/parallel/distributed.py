"""Multi-host initialization and host-sharded event ranges.

The reference scales across machines with embarrassingly-parallel PBS jobs
over entry ranges (inference.py:341-367).  On TPU pods the equivalents are:

  * :func:`initialize` — `jax.distributed.initialize()` from standard TPU
    pod env vars (no-op on a single host), after which `jax.devices()` spans
    the pod and the data/seq meshes in parallel/mesh.py and parallel/sp.py
    ride ICI/DCN automatically;
  * :func:`host_entry_range` — deterministic per-host event range for
    chunked IO (each host reads its slice, writes its `_start_stop` chunk
    file — the PBS fan-out semantics without a scheduler).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None) -> bool:
    """Initialize multi-host JAX if running in a pod; returns True when a
    multi-process runtime is active."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        # single-host (or already initialized) — both are fine
        pass
    return jax.process_count() > 1


def host_entry_range(n_events: int, process_id=None, process_count=None) -> tuple:
    """[start, stop) event range owned by this host (balanced split)."""
    pid = jax.process_index() if process_id is None else process_id
    n_proc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_events, n_proc)
    start = pid * base + min(pid, rem)
    stop = start + base + (1 if pid < rem else 0)
    return start, stop
