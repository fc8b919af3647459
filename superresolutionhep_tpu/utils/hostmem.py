"""Host allocator tuning for XLA-CPU / host-side buffer churn.

Every training/inference step allocates fresh multi-MB host buffers
(collated batches, `jnp.asarray` staging, XLA:CPU temporaries).  glibc's
default dynamic mmap threshold serves them with mmap/munmap pairs, so every
step re-faults its working set page by page: measured on this container's
1-core CPU backend, a 300-step allocation-churn loop spends 66 s in system
time on 2.6M minor faults — 111 s wall vs 19 s with the thresholds pinned
high (5.7x; sys time 66 s -> 0.3 s).  The CPU closure-training runs showed
the same signature at scale (~65-80% of their CPU time in the kernel).

The fix must be in the ENVIRONMENT BEFORE the process starts: glibc sizes
its arenas at startup and `mallopt()` after import recovers only a fraction
(measured 78 s — the faults drop but the munmap churn on already-created
thread arenas does not).  Hence `ensure_tuned()` re-execs the interpreter
once with the tunables set when they are missing — call it at the very top
of an entry point, before heavy imports.

No equivalent exists in the reference (torch's caching allocator hides the
problem on GPU; its CPU paths simply ate the faults).
"""

from __future__ import annotations

import os
import sys

_VARS = {
    # serve large buffers from the heap and never trim it back: the steady
    # state is a stable, pre-faulted arena reused across steps (128 GB box;
    # peak RSS is bounded by the largest live working set, not the sum)
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
}


def ensure_tuned() -> None:
    """Re-exec the interpreter with glibc malloc tunables set (no-op if they
    are already in the environment, on non-Linux, or under pytest)."""
    if sys.platform != "linux" or "pytest" in sys.modules:
        return
    if all(v in os.environ for v in _VARS):
        return
    # only re-exec a plain `python <script.py> ...` invocation: under -c/-m/
    # REPL argv does not reproduce the process (it would hang or re-enter)
    if not sys.argv or not sys.argv[0].endswith(".py"):
        return
    os.environ.update(_VARS)
    try:
        os.execv(sys.executable, [sys.executable] + sys.argv)
    except OSError:  # exotic launcher: keep running untuned rather than die
        pass
