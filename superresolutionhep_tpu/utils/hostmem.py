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
    # one arena: XLA:CPU worker threads otherwise allocate from non-main
    # arenas whose 64 MB heaps are mapped/released independently of the
    # trim threshold — on this VM every fresh map is re-zeroed by the
    # hypervisor at ~80 MB/s (BASELINE.md).  Single-core box: no arena
    # contention to lose.
    "MALLOC_ARENA_MAX": "1",
}


_THP_KNOB = "/sys/kernel/mm/transparent_hugepage/enabled"


def _enable_thp() -> None:
    """Best-effort `always` THP: XLA:CPU's large anon temp buffers do not
    madvise(MADV_HUGEPAGE), so `madvise` mode leaves them on 4 KiB pages —
    measured 87x more page faults on a 268 MB-temporary jit loop (BASELINE
    host-allocator section).  Root-only, silently skipped elsewhere."""
    try:
        with open(_THP_KNOB) as fp:
            if "[always]" in fp.read():
                return
        with open(_THP_KNOB, "w") as fp:
            fp.write("always")
    except OSError:
        pass


def ensure_tuned() -> None:
    """Re-exec the interpreter with glibc malloc tunables set (no-op if they
    are already in the environment, on non-Linux, or under pytest)."""
    if sys.platform != "linux" or "pytest" in sys.modules:
        return
    _enable_thp()
    if all(v in os.environ for v in _VARS):
        return
    # only re-exec a plain `python <script.py> ...` invocation: under -c/-m/
    # REPL argv does not reproduce the process (it would hang or re-enter)
    if not sys.argv or not sys.argv[0].endswith(".py"):
        return
    for k, v in _VARS.items():
        # setdefault: a user-provided tunable (e.g. MALLOC_ARENA_MAX=4 to
        # measure arena behaviour) wins over ours (code-review r3)
        os.environ.setdefault(k, v)
    # sys.orig_argv reproduces interpreter flags (-O, -W, -X ...) that
    # sys.argv drops (code-review r3); orig_argv[0] may be a bare 'python',
    # so exec sys.executable (always an absolute path) with orig's args
    orig = getattr(sys, "orig_argv", None)
    argv = [sys.executable] + (orig[1:] if orig else sys.argv)
    try:
        os.execv(sys.executable, argv)
    except OSError:  # exotic launcher: keep running untuned rather than die
        pass
