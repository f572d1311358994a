"""Render coalescer: natural micro-batching + pipelined device dispatch.

The batch drivers run several worker threads per host, each rendering its
own figures.  Left alone, every figure is a separate device dispatch and
readback -- and on a latency-heavy host<->device link those round trips
dominate.  The coalescer routes all requests through one dispatcher
thread that, each time it wakes, drains *everything* queued and rasterizes
same-geometry panels in one pooled call:

* under concurrency, batches form naturally (requests arriving while a
  dispatch is in flight are pooled into the next one);
* a lone request is dispatched immediately -- there is no artificial
  delay, so single-stream latency is unchanged;
* on the device backend the dispatcher only *enqueues* each batch
  (:func:`..render.figure.enqueue_render_panels`) and hands the pending
  readback to a drainer thread, so batch N+1's H2D uploads and compute
  overlap batch N's readback instead of serializing behind it.  At most
  ``CST_RENDER_INFLIGHT`` (default 3) batches hold device buffers at
  once; the dispatcher blocks past that, which simply deepens the next
  coalesce.

Disable with ``CST_RENDER_COALESCE=0`` (requests then call straight
through).
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field


@dataclass
class _Request:
    panels: list
    tile_h: int
    tile_w: int
    future: Future = field(default_factory=Future)


def _max_inflight() -> int:
    try:
        return max(1, int(os.environ.get("CST_RENDER_INFLIGHT", 3)))
    except ValueError:
        return 3


#: A lone coalesced request at most this many panels wide counts as a
#: latency-sensitive render (one multirow figure is 8-10 panels).
_LATENCY_MAX_PANELS = 16


class RenderCoalescer:
    """Single-dispatcher render queue (see module docstring)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._queue: list[_Request] = []
        self._running = False
        #: Bounds concurrently in-flight (enqueued-not-drained) device
        #: batches so pipelining never accumulates unbounded device output
        #: buffers.  Sized once at construction; set CST_RENDER_INFLIGHT
        #: before the first render to change it.
        self._inflight = threading.Semaphore(_max_inflight())

    def _ensure_thread(self) -> None:
        """Start the dispatcher if needed.  Caller must hold the lock.

        The liveness flag flips only under the lock (not ``is_alive``,
        which races with a dispatcher that has *decided* to exit but not
        yet died -- a request arriving in that window would never be
        drained).
        """
        if not self._running:
            self._running = True
            threading.Thread(target=self._run, daemon=True, name="render-coalescer").start()

    def render(self, panels: list, tile_h: int, tile_w: int) -> list[dict]:
        from configurable_spectrograms_tpu.render.dispatch import device_render_panels

        if os.environ.get("CST_RENDER_COALESCE", "1") == "0" or not panels:
            return device_render_panels(panels, tile_h, tile_w)
        req = _Request(panels, tile_h, tile_w)
        with self._lock:
            self._queue.append(req)
            self._ensure_thread()
            self._wake.notify()
        return req.future.result()

    @staticmethod
    def _resolve(reqs: list[_Request], results: list[dict]) -> None:
        pos = 0
        for r in reqs:
            r.future.set_result(results[pos : pos + len(r.panels)])
            pos += len(r.panels)

    def _drain_async(self, pending, reqs: list[_Request]) -> None:
        """Finish one enqueued batch on a drainer thread.

        The dispatcher returns to the queue immediately; the watchdogged
        readbacks, host resampling, and future resolution all happen
        here.  The in-flight slot is released only once the batch's
        device buffers are consumed.
        """

        def _drain():
            try:
                self._resolve(reqs, pending.wait())
            except BaseException as exc:  # noqa: BLE001 - futures must never hang
                # BaseException included: a readback thread captures errors
                # with BaseException (figure.PendingRender), and a
                # non-Exception escaping here would leave every pooled
                # request's future unresolved forever -- workers block in
                # future.result() with no timeout.
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(exc)
            finally:
                self._inflight.release()

        threading.Thread(target=_drain, daemon=True, name="render-drain").start()

    def _run(self) -> None:
        from configurable_spectrograms_tpu.render.dispatch import enqueue_render_panels

        batch: list[_Request] = []
        try:
            while True:
                with self._lock:
                    while not self._queue:
                        self._wake.wait(timeout=5.0)
                        if not self._queue:
                            self._running = False  # idle; next request restarts us
                            return
                    batch = self._queue
                    self._queue = []

                # Pool same-geometry requests into one device call.
                by_geometry: dict[tuple[int, int], list[_Request]] = {}
                for req in batch:
                    by_geometry.setdefault((req.tile_h, req.tile_w), []).append(req)
                # A drain of exactly one small request with nothing queued
                # behind it is a latency-sensitive render (a single-plot
                # CLI, the GUI single-day page, or the lone head of a
                # batch): let the dispatch layer route it to whichever
                # backend answers fastest rather than by throughput.
                with self._lock:
                    queue_empty = not self._queue
                prefer_latency = (
                    queue_empty
                    and len(batch) == 1
                    and len(batch[0].panels) <= _LATENCY_MAX_PANELS
                )
                for (tile_h, tile_w), reqs in by_geometry.items():
                    all_panels = [p for r in reqs for p in r.panels]
                    self._inflight.acquire()
                    try:
                        pending = enqueue_render_panels(
                            all_panels, tile_h, tile_w, prefer_latency=prefer_latency
                        )
                    except Exception as exc:
                        self._inflight.release()
                        for r in reqs:
                            r.future.set_exception(exc)
                        continue
                    if pending.has_device_work():
                        # Device buckets in flight: drain on a side thread so
                        # the NEXT coalesced batch's uploads overlap this
                        # one's readback.
                        self._drain_async(pending, reqs)
                    else:
                        # Pure host batch: results are already complete (and
                        # doing the work here is what lets queued requests
                        # coalesce behind us on the 1-thread host path).
                        self._inflight.release()
                        try:
                            self._resolve(reqs, pending.wait())
                        except Exception as exc:
                            for r in reqs:
                                if not r.future.done():
                                    r.future.set_exception(exc)
                batch = []
        except BaseException as exc:  # e.g. MemoryError/KeyboardInterrupt
            # The dispatcher is dying: fail every drained-but-unresolved
            # future (callers blocked on future.result() would otherwise
            # hang forever) and clear _running so the next render() can
            # restart a fresh dispatcher.  No new thread can have started
            # meanwhile -- _ensure_thread only starts one when _running is
            # False, and it is still True until this line.
            for req in batch:
                if not req.future.done():
                    req.future.set_exception(exc)
            with self._lock:
                self._running = False
            raise


_COALESCER = RenderCoalescer()


def coalesced_render(panels: list, tile_h: int, tile_w: int) -> list[dict]:
    """Render through the process-wide coalescer."""
    return _COALESCER.render(panels, tile_h, tile_w)
