"""Host-compute concurrency gate for feeder-thread pools.

The device backend sizes its feeder pool for OVERLAP: threads that wait
on the link/chip release the GIL, so more threads than cores pay off
while device work is in flight.  But the host-CPU-bound stages those
same threads run -- compositing, PNG encode -- degrade under
oversubscription: on a 1-core box, 4 threads of pure host work measure
~25% slower than 1 (GIL handoffs + 4 concurrent ~35 MB canvases
thrashing the cache; see docs/budget.md round-5 notes).  The reference
never faced this split: its process pool ran one figure per process end
to end (reference fast/batch_directory.py:337).

This gate bounds CONCURRENT HOST COMPUTE to the visible core count
without shrinking the pool: feeder threads still overlap device waits
freely (the gate is never held across a dispatch/readback wait), but at
most ``cores`` of them run a composite/encode section at once -- excess
threads park on the semaphore instead of thrashing.

``CST_HOST_COMPUTE_GATE`` overrides the slot count; ``0`` disables.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

_LOCK = threading.Lock()
_GATE: threading.BoundedSemaphore | None = None
_GATE_SLOTS = 0


def _visible_cores() -> int:
    try:
        return max(1, len(os.sched_getaffinity(0)))
    except (AttributeError, OSError):  # pragma: no cover - non-Linux
        return max(1, os.cpu_count() or 1)


def _slots() -> int:
    try:
        return int(os.environ.get("CST_HOST_COMPUTE_GATE", _visible_cores()))
    except ValueError:
        return _visible_cores()


@contextmanager
def host_compute_gate():
    """Bound this block's concurrency to the visible core count.

    Wrap CPU-bound sections only (composite, encode); never hold across a
    device wait.  A zero/negative slot count disables gating entirely.
    """
    global _GATE, _GATE_SLOTS
    n = _slots()
    if n <= 0:
        yield
        return
    with _LOCK:
        if _GATE is None or _GATE_SLOTS != n:
            _GATE = threading.BoundedSemaphore(n)
            _GATE_SLOTS = n
        gate = _GATE
    with gate:
        yield
