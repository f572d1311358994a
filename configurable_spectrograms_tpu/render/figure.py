"""Figure/axes model with deferred, batched device rasterization.

A :class:`SpectroFigure` mirrors the slice of the matplotlib
``Figure``/``Axes`` API the reference's pipelines touch (``add_subplot``,
``suptitle``, ``text``, ``savefig``, per-axes ``set_title``/``set_ylabel``),
but nothing rasterizes until :meth:`SpectroFigure.savefig`/:meth:`render`:
the figure only accumulates :class:`PanelData` descriptions.  At render
time every panel in the figure (and, via :func:`device_render_panels`, every
panel across a *batch* of figures) is padded into shape buckets and
rasterized in a handful of vmapped TPU dispatches; the PIL compositor then
draws frames, ticks, labels, colorbars, cusp markers, and titles around the
device-produced tiles.

This replaces the reference's per-panel matplotlib Agg pipeline
(reference plotting.py:229-235,392-502,505-698).  The value-dependent math
(collapse, bounds, normalization, quantization) runs on device; the host
pixel-replicates the tiny quantized matrices and draws decorations -- or,
when the device link degrades (or ``CST_RENDER_BACKEND=host``), runs the
whole analysis in parity-tested numpy.
"""

from __future__ import annotations

import functools
import math
import os
import threading
import weakref
from dataclasses import dataclass, field
from typing import Any

import numpy as np
from PIL import Image, ImageDraw

from configurable_spectrograms_tpu.render import locators
from configurable_spectrograms_tpu.render.cusp import CUSP_MARKER_DRAWERS
from configurable_spectrograms_tpu.render.text import (
    draw_pow10,
    draw_rotated_text,
    draw_text,
    pow10_width,
    pt_to_px,
    text_size,
)
from configurable_spectrograms_tpu.render.tile import (
    TimeWindow,
    make_x_map,
    pixel_columns,
    resample_indices,
)
from configurable_spectrograms_tpu.utils.resident_cache import ResidentCache

TICK_LABEL_PT = 15.0
AXIS_LABEL_PT = 18.0


def _bucket(n: int, step: int, minimum: int) -> int:
    return max(minimum, int(math.ceil(n / step)) * step)


@dataclass
class PanelData:
    """Everything needed to rasterize and decorate one spectrogram panel."""

    cube: np.ndarray  # (T, A, E) float32, collapse axis already at 1
    pitch_mask: np.ndarray  # (A,) bool
    energy: np.ndarray  # (E,)
    times: np.ndarray  # (T,) x values (unix seconds or raw)
    window: TimeWindow
    y_min: float
    y_max: float
    z_min: float | None
    z_max: float | None
    y_scale: str
    z_scale: str
    colormap: str
    x_is_unix: bool
    z_label: str
    vertical_lines: list[float] = field(default_factory=list)
    cusp_marker_style: str = "both"
    cusp_marker_kwargs: dict = field(default_factory=dict)
    line_color: str = "red"
    low_percentile: float = 1.0
    high_percentile: float = 99.0
    #: Optional override of the energy range used only for percentile color
    #: bounds (y_min, y_max), pooled over the full file's rows -- the FAST
    #: grids' bound rule (reference fast/plotting.py:118-134).
    bounds_energy_range: tuple[float, float] | None = None


class Axes:
    """One grid cell of a :class:`SpectroFigure` (a matplotlib-Axes stand-in)."""

    def __init__(self, figure: "SpectroFigure", row: int, col: int):
        self.figure = figure
        self.row = row
        self.col = col
        self.panel: PanelData | None = None
        self.title: str | None = None
        self.title_fontsize_pt: float = AXIS_LABEL_PT
        self.xlabel: str | None = None
        self.ylabel: str | None = None
        self.ylabel_rotation: float = 90.0
        self.result: dict[str, Any] | None = None  # device outputs after render

    # -- matplotlib-parity setters -----------------------------------------

    def set_title(self, title: str, fontsize: float | None = None) -> None:
        self.title = title
        if fontsize is not None:
            self.title_fontsize_pt = float(fontsize)

    def set_xlabel(self, label: str) -> None:
        self.xlabel = label

    def set_ylabel(self, label: str, fontsize: float | None = None, rotation: float = 90, **kwargs) -> None:
        self.ylabel = label
        self.ylabel_rotation = rotation


class SpectroFigure:
    """A deferred-render figure; the matplotlib-Figure stand-in."""

    def __init__(self, figsize: tuple[float, float] = (6.25, 2.0), dpi: float = 100.0):
        self.figsize = figsize
        self.dpi = dpi
        self.nrows = 1
        self.ncols = 1
        self.axes: list[Axes] = []
        self._grid: dict[tuple[int, int], Axes] = {}
        self.suptitle_text: str | None = None
        self.suptitle_pt: float = AXIS_LABEL_PT + 2
        self.fig_texts: list[dict] = []
        self.bottom_reserve: float = 0.0  # figure-fraction bottom space
        self.number = None  # Gcf-compat attribute

    # -- construction --------------------------------------------------------

    def add_subplot(self, nrows: int, ncols: int, index: int) -> Axes:
        self.nrows, self.ncols = nrows, ncols
        row, col = divmod(index - 1, ncols)
        ax = Axes(self, row, col)
        self.axes.append(ax)
        self._grid[(row, col)] = ax
        return ax

    def suptitle(self, text: str, fontsize: float | None = None) -> None:
        self.suptitle_text = text
        if fontsize is not None:
            self.suptitle_pt = float(fontsize)

    def text(self, x: float, y: float, s: str, ha: str = "center", va: str = "bottom",
             fontsize: float = 13.0, color: str = "black", **kwargs) -> None:
        self.fig_texts.append({"x": x, "y": y, "s": s, "ha": ha, "va": va, "pt": fontsize, "color": color})

    def subplots_adjust(self, bottom: float | None = None, **kwargs) -> None:
        if bottom is not None:
            self.bottom_reserve = max(self.bottom_reserve, bottom)

    def tight_layout(self, rect: tuple | None = None) -> None:
        if rect is not None:
            self.bottom_reserve = max(self.bottom_reserve, rect[1])

    # -- rendering -----------------------------------------------------------

    def savefig(self, path: str, dpi: float | None = None, compress_level: int = 3) -> None:
        """Render and write a PNG.

        ``compress_level`` trades PNG size for encode speed.  PNG output
        goes through the native encoder when available (2.5x faster than
        PIL at equal size on these figures) with a PIL fallback.
        """
        save_image(self.render(dpi=dpi), path, compress_level=compress_level)

    def render(self, dpi: float | None = None) -> Image.Image:
        return render_figures([self], dpi=dpi)[0]

    def clear(self) -> None:
        self.axes.clear()
        self._grid.clear()

    # matplotlib-compat aliases used by close_all_axes_and_clear
    def clf(self) -> None:
        self.clear()

    def delaxes(self, ax: Axes) -> None:
        if ax in self.axes:
            self.axes.remove(ax)


def save_image(image: Image.Image, path: str, compress_level: int = 3) -> None:
    """Write a rendered figure image; native fast-PNG when possible.

    The native path (render/fastpng.py) releases the GIL for the whole
    encode, so batch worker threads overlap PNG writing with device work.
    """
    from configurable_spectrograms_tpu.utils.timing import active_stage

    is_png = path.lower().endswith(".png") or "." not in os.path.basename(path)
    if is_png:
        with active_stage("png_encode"):
            from configurable_spectrograms_tpu.render.fastpng import write_png_rgb

            # Compositor-rendered figures carry their numpy canvas: encode it
            # directly (zero copies -- the native encoder drops RGBA's alpha).
            arr = getattr(image, "_np_canvas", None)
            if arr is None:
                rgb = image if image.mode == "RGB" else image.convert("RGB")
                arr = np.asarray(rgb)
            if write_png_rgb(arr, path, compress_level):
                return
            img = image if image.mode == "RGB" else image.convert("RGB")
            img.save(path, format="PNG", compress_level=compress_level)
    else:
        # Formats without alpha (JPEG, BMP) reject RGBA; flatten first.
        fmt_needs_rgb = os.path.splitext(path)[1].lower() in (".jpg", ".jpeg", ".bmp")
        (image.convert("RGB") if fmt_needs_rgb and image.mode != "RGB" else image).save(path)


def render_figures(figures: list["SpectroFigure"], dpi: float | None = None) -> list[Image.Image]:
    """Render many figures with their panels pooled into shared dispatches.

    Panels from every figure group by tile geometry, so e.g. an orbit's
    eight pitch-angle grids plus two instrument grids rasterize in a couple
    of device calls instead of ten -- the device fan-out the reference got
    from its process pool (reference fast/batch_directory.py:337), obtained
    here by widening the batch instead.
    """
    layouts = [_Layout(fig, float(dpi or fig.dpi)) for fig in figures]
    by_tile: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for f_i, (fig, layout) in enumerate(zip(figures, layouts)):
        for a_i, ax in enumerate(fig.axes):
            ax.result = None
            if ax.panel is not None:
                by_tile.setdefault((layout.tile_h, layout.tile_w), []).append((f_i, a_i))
    from configurable_spectrograms_tpu.render.service import coalesced_render

    for (tile_h, tile_w), slots in by_tile.items():
        panels = [figures[f_i].axes[a_i].panel for f_i, a_i in slots]
        results = coalesced_render(panels, tile_h, tile_w)
        for (f_i, a_i), res in zip(slots, results):
            figures[f_i].axes[a_i].result = res
    from configurable_spectrograms_tpu.utils.timing import active_stage

    with active_stage("composite"):
        return [layout.composite() for layout in layouts]


# ---------------------------------------------------------------------------
# batched rasterization (device by default, host fallback)
# ---------------------------------------------------------------------------

#: Rasterization backend: ``device`` (JAX), ``host`` (numpy), or ``auto``
#: (device until a pathologically slow device->host readback is measured,
#: then host for the rest of the process).  See render/host_quantize.py.
_BACKEND = {
    "mode": os.environ.get("CST_RENDER_BACKEND", "auto"),
    "forced_host": False,
    "calibrated": False,
    "probed": False,
    "last_probe_ts": 0.0,
    "reprobe_inflight": False,
    #: Why the host backend is forced: None, "dead" (no round trip), or
    #: "bandwidth" (link alive but too slow for cube uploads -- bench can
    #: still measure the device path explicitly).
    "why_host": None,
}
_BACKEND_LOCK = threading.Lock()

#: With the host backend forced in ``auto`` mode, a recovered link is
#: re-probed this often (seconds).  The observed relay oscillates between
#: dead and healthy on a ~1 h scale; long processes get the device back.
_REPROBE_INTERVAL_SEC = float(os.environ.get("CST_LINK_REPROBE_SEC", 600.0))

#: Two-phase link probe budgets.  The FIRST D2H readback through the
#: tunneled relay pays a one-time per-process setup cost (measured: 23 s
#: to 180 s for 256 bytes on a link whose steady-state round trip is
#: ~60 ms), so a single tight budget misreads a healthy-but-cold link as
#: dead.  Phase 1 (backend init + first H2D + first D2H) gets the
#: generous cold budget; phase 2 (a second tiny round trip, which
#: reflects steady-state health) must answer within the tight budget.
#: A dead relay fails both.
_PROBE_COLD_TIMEOUT_SEC = float(os.environ.get("CST_LINK_PROBE_COLD_TIMEOUT", 300.0))
_PROBE_TIMEOUT_SEC = float(os.environ.get("CST_LINK_PROBE_TIMEOUT", 5.0))

#: How long ``probe_device_link`` blocks the caller waiting for the probe.
#: A warm link answers within milliseconds; past this window rendering
#: starts host-side and the probe keeps running in the background,
#: promoting the process to the device backend if/when the link warms up.
#: Batch tools that prefer a decisive answer (bench.py) raise this.
_PROBE_SYNC_WAIT_SEC = float(os.environ.get("CST_LINK_PROBE_SYNC_WAIT", 5.0))

#: Phase 3 of the probe measures effective link bandwidth with a real
#: payload: a 256-byte round trip says nothing about throughput, and a
#: crippled 1-2 MB/s relay that answers pings would otherwise spend
#: minutes uploading the first render's cubes before the per-panel
#: calibration could flip (measured: 140 s vs 18 s for the same batch).
#: Below this effective MB/s the host backend is pre-selected outright;
#: the periodic reprobe revisits.  Direct-attached devices measure
#: hundreds of MB/s and never trip this.
_PRESELECT_MBPS = float(os.environ.get("CST_LINK_PRESELECT_MBPS", 20.0))
_PROBE_BW_TIMEOUT_SEC = float(os.environ.get("CST_LINK_PROBE_BW_TIMEOUT", 30.0))
_PROBE_BW_BYTES = 2_000_000


def _link_roundtrip_probe() -> dict:
    """Run the two-phase probe in a daemon thread; returns an outcome dict.

    ``{"ok": True}`` on a healthy link; ``{"ok": False, "why": ...}``
    otherwise.  The transfer thread is abandoned on timeout (it holds no
    locks the host path needs), so a hung link cannot block the caller.
    Pure transfers only -- no compilation -- so a slow first-jit on a
    healthy device never trips this.
    """
    import time as _time

    cold_done = threading.Event()
    steady_done = threading.Event()
    bw_done = threading.Event()
    outcome: dict = {}

    def _roundtrip():
        try:
            import jax

            dev = jax.device_put(np.zeros(256, np.uint8))
            jax.block_until_ready(dev)
            np.asarray(dev)  # first D2H: pays the relay's one-time setup
            cold_done.set()
            dev2 = jax.device_put(np.zeros(256, np.uint8))
            t0 = _time.perf_counter()
            np.asarray(dev2)
            outcome["steady_dt"] = _time.perf_counter() - t0
            steady_done.set()
            # Phase 3: effective bandwidth.  The D2H readback depends on
            # the H2D having landed (block_until_ready is NOT a sync point
            # through the relay -- acks precede execution), so one timed
            # put+read covers both directions.
            payload = np.zeros(_PROBE_BW_BYTES, np.uint8)
            t0 = _time.perf_counter()
            np.asarray(jax.device_put(payload))
            dt = _time.perf_counter() - t0
            outcome["mbps"] = 2 * _PROBE_BW_BYTES / max(dt, 1e-9) / 1e6
            bw_done.set()
        except Exception as exc:  # pragma: no cover - device init failure
            outcome["err"] = str(exc)
            cold_done.set()
            steady_done.set()
            bw_done.set()

    threading.Thread(target=_roundtrip, daemon=True, name="link-probe").start()
    if not cold_done.wait(timeout=_PROBE_COLD_TIMEOUT_SEC):
        return {"ok": False, "why": f"no response within {_PROBE_COLD_TIMEOUT_SEC:.0f}s"}
    if not steady_done.wait(timeout=_PROBE_TIMEOUT_SEC):
        return {
            "ok": False,
            "why": f"steady-state round trip over {_PROBE_TIMEOUT_SEC:.0f}s",
        }
    if not bw_done.wait(timeout=_PROBE_BW_TIMEOUT_SEC):
        # Link answers pings but can't move the payload within the budget:
        # alive, but slower than anything the pre-selection would accept.
        return {"ok": True, "steady_dt": outcome.get("steady_dt", 0.0),
                "mbps": 2 * _PROBE_BW_BYTES / _PROBE_BW_TIMEOUT_SEC / 1e6}
    if "err" in outcome:
        return {"ok": False, "why": outcome["err"]}
    return {"ok": True, "steady_dt": outcome.get("steady_dt", 0.0),
            "mbps": outcome.get("mbps")}


def _apply_probe_outcome(outcome: dict, context: str) -> None:
    """Fold one probe outcome into the backend state (all probe paths).

    A dead link forces the host backend (``why_host="dead"``); a live
    link slower than ``_PRESELECT_MBPS`` pre-selects it
    (``why_host="bandwidth"`` -- tools that explicitly want the device
    path can still force it); a healthy measurement restores the device
    backend and re-arms the one-shot calibration.  A missing ``mbps``
    (older/partial probes, tests) counts as healthy.
    """
    import time as _time

    from configurable_spectrograms_tpu.utils.logging import log_error

    mbps = outcome.get("mbps")
    slow = outcome.get("ok") and mbps is not None and mbps < _PRESELECT_MBPS
    with _BACKEND_LOCK:
        _BACKEND["last_probe_ts"] = _time.monotonic()
        if _BACKEND["mode"] != "auto":
            return
        if not outcome.get("ok"):
            _BACKEND["forced_host"] = True
            _BACKEND["why_host"] = "dead"
        elif slow:
            _BACKEND["forced_host"] = True
            _BACKEND["why_host"] = "bandwidth"
        else:
            promote = _BACKEND["forced_host"]
            _BACKEND["forced_host"] = False
            _BACKEND["why_host"] = None
            if promote:
                _BACKEND["calibrated"] = False  # re-calibrate on the live link
    if not outcome.get("ok"):
        log_error(
            f"[BACKEND] device link {context}: failed ({outcome.get('why')}); "
            "using the host rasterization backend"
        )
    elif slow:
        log_error(
            f"[BACKEND] device link {context}: alive but ~{mbps:.1f} MB/s "
            f"effective (< {_PRESELECT_MBPS:.0f} MB/s); pre-selecting the host "
            "backend so renders never crawl through cube uploads"
        )


def probe_device_link() -> None:
    """One-shot, non-blocking preflight.

    A warm link passes within the short synchronous window and the device
    backend is used from the first render.  A link that doesn't answer in
    that window (cold: its first per-process D2H can take minutes; or
    dead) forces the host backend IMMEDIATELY -- no render ever stalls on
    the preflight -- while the probe keeps running in the background and
    promotes the process to the device backend the moment the link
    completes a healthy round trip within the cold budget.
    """
    with _BACKEND_LOCK:
        if _BACKEND["probed"] or _BACKEND["mode"] != "auto" or _BACKEND["forced_host"]:
            _BACKEND["probed"] = True
            return
        _BACKEND["probed"] = True
    import time as _time

    from configurable_spectrograms_tpu.utils.logging import log_error

    outcome: dict = {}
    done = threading.Event()

    def _probe():
        outcome.update(_link_roundtrip_probe())
        done.set()

    threading.Thread(target=_probe, daemon=True, name="link-probe-outer").start()
    if done.wait(timeout=_PROBE_SYNC_WAIT_SEC):
        _apply_probe_outcome(outcome, "preflight")
        return

    with _BACKEND_LOCK:
        _BACKEND["forced_host"] = True
        _BACKEND["why_host"] = "dead"
        _BACKEND["last_probe_ts"] = _time.monotonic()
    log_error(
        f"[BACKEND] device link gave no round trip within "
        f"{_PROBE_SYNC_WAIT_SEC:.0f}s; rendering host-side while it warms in "
        f"the background"
    )

    def _promote():
        # _link_roundtrip_probe bounds its own phases, so this always ends.
        done.wait()
        _apply_probe_outcome(outcome, "warm-start probe")
        if outcome.get("ok") and not _BACKEND["forced_host"]:
            log_error("[BACKEND] device link warmed up; promoting to device rasterization")

    threading.Thread(target=_promote, daemon=True, name="link-promote").start()


def maybe_reprobe_device_link() -> None:
    """Periodically re-check a dead link and un-force the host backend.

    Only meaningful in ``auto`` mode after a failed preflight/readback
    forced the host path: every ``_REPROBE_INTERVAL_SEC`` a background
    round trip runs, and on success the device backend (and its one-shot
    calibration) is restored.  Renders in flight are never blocked --
    they continue host-side until a reprobe succeeds.
    """
    import time as _time

    with _BACKEND_LOCK:
        due = (
            _BACKEND["mode"] == "auto"
            and _BACKEND["forced_host"]
            and not _BACKEND["reprobe_inflight"]
            and _time.monotonic() - _BACKEND["last_probe_ts"] > _REPROBE_INTERVAL_SEC
        )
        if not due:
            return
        _BACKEND["reprobe_inflight"] = True

    def _watchdog():
        # The transfer runs in an inner thread (inside the probe helper) so
        # a still-dead link cannot pin the reprobe machinery: on timeout the
        # inner thread is abandoned and the next interval tries again.
        outcome = _link_roundtrip_probe()
        _apply_probe_outcome(outcome, "reprobe")
        with _BACKEND_LOCK:
            _BACKEND["reprobe_inflight"] = False
            recovered = outcome.get("ok") and not _BACKEND["forced_host"]
        if recovered:
            from configurable_spectrograms_tpu.utils.logging import log_error

            log_error("[BACKEND] device link recovered; resuming device rasterization")

    threading.Thread(target=_watchdog, daemon=True, name="link-reprobe").start()

#: Auto-switch threshold: a readback slower than this effective bandwidth
#: (and taking over a second) marks the device link unusable.
_MIN_LINK_MBPS = 1.0

#: Readback slower than this per panel (but above the hard floor) triggers a
#: one-shot calibration: time the host backend on the same group and keep
#: whichever is faster.  Direct-attached devices read back in ~1 ms/panel and
#: never pay the calibration; only degraded links (e.g. a slow relay) do.
_CALIBRATE_XFER_SEC_PER_PANEL = 0.02


def _readback(out_dev) -> np.ndarray:
    """D2H transfer of the packed result buffer (timed; test seam)."""
    return np.asarray(out_dev)


def _dispatch_timeout() -> float:
    """Watchdog bound for one device dispatch or readback, seconds.

    Generous by default: a cold link's first D2H has been observed taking
    up to ~180 s and a first compile ~40 s.  ``CST_DEVICE_DISPATCH_TIMEOUT``
    overrides.
    """
    try:
        return float(os.environ.get("CST_DEVICE_DISPATCH_TIMEOUT", 300.0))
    except ValueError:
        return 300.0


def _bounded_call(fn, timeout: float):
    """Run *fn* on a watchdog thread; ``(True, value)`` or ``(False, None)``.

    Every probe/reprobe in this module is time-bounded, but a link can die
    BETWEEN the preflight and the actual render transfer -- and a hung
    ``jax`` transfer blocks forever and cannot be cancelled.  Running it
    on a daemon thread bounds the *wait*: on timeout the caller falls back
    to the host backend and the stuck thread is abandoned (the same
    containment the cold-start preflight uses).
    """
    box: dict[str, Any] = {}
    done = threading.Event()

    def run():
        try:
            box["value"] = fn()
        except BaseException as exc:  # re-raised in the caller below
            box["error"] = exc
        finally:
            done.set()

    threading.Thread(target=run, daemon=True, name="device-dispatch").start()
    if not done.wait(timeout):
        return False, None
    if "error" in box:
        raise box["error"]
    return True, box.get("value")


def _host_backend_active() -> bool:
    mode = _BACKEND["mode"]
    return mode == "host" or (mode == "auto" and _BACKEND["forced_host"])


def recommended_workers(requested: int) -> int:
    """Effective feeder-thread count for a batch render pool.

    On the device backend the requested count stands: feeder threads
    overlap CDF decode / PNG encode with device dispatch and link time,
    so more threads than cores still pay off.  On the host backend every
    stage is host compute, so threads beyond the visible cores only add
    GIL contention and concurrent-canvas memory pressure (measured 3.5x
    *slower* with 4 threads on a 1-core box).  Containers that restrict
    affinity are honored via ``sched_getaffinity``.

    In ``auto`` mode the link preflight runs first (one-shot, bounded by
    its short synchronous window): pools are sized BEFORE the first
    render, and an unprobed "device" answer here would hand a
    host-backend run the full thread count -- exactly the thrash this
    clamp exists to prevent.  A link that warms up later leaves the pool
    host-sized for the rest of the batch (conservative).
    """
    requested = max(1, int(requested))
    probe_device_link()
    if not _host_backend_active():
        return requested
    try:
        cores = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):  # pragma: no cover - non-Linux
        cores = os.cpu_count() or 1
    return max(1, min(requested, cores))


def _render_group_host(panels: list[PanelData], idxs: list[int], tile_h: int, tile_w: int,
                       y_scale: str, z_scale: str, lo_pct: float, hi_pct: float,
                       results: list) -> None:
    """Pure-numpy group rasterization (no device involved)."""
    from configurable_spectrograms_tpu.ops._colormap_data import colormap_lut
    from configurable_spectrograms_tpu.render.host_quantize import (
        cached_collapse,
        host_clean,
        host_quantize,
    )

    # The shared NaN pass per cube runs at most once per group, and only
    # if some mask actually misses the cross-render collapse cache.
    clean_cache: dict[int, np.ndarray] = {}

    def _clean_for(cube):
        def provider():
            c = clean_cache.get(id(cube))
            if c is None:
                c = clean_cache[id(cube)] = host_clean(cube)
            return c

        return provider

    for i in idxs:
        p = panels[i]
        matrix = cached_collapse(p.cube, p.pitch_mask, _clean_for(p.cube))
        e_valid = (p.energy >= p.y_min) & (p.energy <= p.y_max)
        if p.bounds_energy_range is not None:
            b_lo, b_hi = p.bounds_energy_range
            zb_e_valid = (p.energy >= b_lo) & (p.energy <= b_hi)
            zb_full = True
        else:
            zb_e_valid, zb_full = None, False
        try:
            q = host_quantize(
                matrix, p.energy, e_valid, p.window.t_start, p.window.t_count,
                (p.z_min, p.z_max), y_scale, z_scale, lo_pct, hi_pct, zb_e_valid, zb_full,
            )
        except ValueError as exc:
            # Per-panel analysis error (inverted log bounds): recorded and
            # raised by the owning figure's composite, not here -- a raise
            # inside a pooled group would fail every coalesced figure.
            results[i] = {"error": str(exc)}
            continue
        rgba = resample_indices(
            q["idx"], q["kept_pos"], q["n_kept"], q["flip"], q["y0"], q["y1"],
            p.window.t_start, p.window.t_count, make_x_map(p.window, tile_w),
            tile_h, tile_w, y_scale, colormap_lut(p.colormap), empty=q["empty"],
        )
        results[i] = {
            "rgba": rgba,
            "vmin": q["vmin"],
            "vmax": q["vmax"],
            "y0": q["y0"],
            "y1": q["y1"],
            "n_kept": q["n_kept"],
            "empty": q["empty"],
        }


#: Diagnostics for the last device dispatch (tests assert the production
#: path actually spans the mesh): ``lanes`` = padded panel lanes shipped,
#: ``devices`` = number of devices the output sharding covered.
LAST_DISPATCH: dict[str, int] = {"lanes": 0, "devices": 0}

#: Device-resident padded-cube cache.  A batch renders each cube many
#: times (raw + given-extrema figure pairs, pitch grid + instrument grid,
#: repeat passes), and on link-constrained setups the ~12.6 MB-per-cube
#: H2D upload dominates the device path -- so padded cubes stay resident
#: and repeat renders reuse them with zero host transfer.  Single cubes
#: key by (id(cube), padded shape); whole dispatch stacks (including
#: their mesh-replicated broadcast) key by the tuple of cube ids, so a
#: repeat render of the same group re-ships nothing -- not even the
#: on-device concatenate or the cross-device broadcast.  Owner-death
#: eviction keeps a recycled id from aliasing a stale entry.  Budgeted by
#: CST_DEVICE_CUBE_CACHE_BYTES (default 1.5 GB, FIFO eviction);
#: CST_DEVICE_CUBE_CACHE=0 disables.
def _device_cube_budget() -> int:
    try:
        return int(os.environ.get("CST_DEVICE_CUBE_CACHE_BYTES", 1_500_000_000))
    except ValueError:
        return 1_500_000_000


_DEVICE_CUBE_CACHE = ResidentCache(max_bytes=_device_cube_budget)


def _padded_device_cube(cube: np.ndarray, Tp: int, Ap: int, Ep: int):
    """NaN-padded (Tp, Ap, Ep) copy of *cube* resident on device, cached."""
    import jax

    key = (id(cube), Tp, Ap, Ep)
    hit = _DEVICE_CUBE_CACHE.get(key)
    if hit is not None:
        return hit
    padded = np.full((Tp, Ap, Ep), np.nan, np.float32)
    T, A, E = cube.shape
    padded[:T, :A, :E] = cube
    arr = jax.device_put(padded)
    return _DEVICE_CUBE_CACHE.insert(key, arr, (cube,))


def _stack_cubes(unique_cubes: list[np.ndarray], Tp: int, Ap: int, Ep: int, mesh):
    """The (n_unique, Tp, Ap, Ep) dispatch input, preferring resident cubes.

    The assembled stack itself is cached keyed by the cube-id tuple (with
    every cube as an owner), so a repeat dispatch of the same group -- the
    raw/given figure pair, repeat batch passes -- reuses the finished
    on-device array outright.  Under a mesh that cached stack already
    carries the replicated sharding, so the per-dispatch cross-device
    broadcast disappears too (committed single-device inputs cannot
    silently reshard into a multi-device jit, hence the explicit put).
    Misses pay the same one-time pad + upload the uncached path would.
    """
    if os.environ.get("CST_DEVICE_CUBE_CACHE", "1") == "0":
        cubes = np.full((len(unique_cubes), Tp, Ap, Ep), np.nan, np.float32)
        for s, c in enumerate(unique_cubes):
            T, A, E = c.shape
            cubes[s, :T, :A, :E] = c
        return cubes
    import jax
    import jax.numpy as jnp

    stack_key = ("stack", tuple(id(c) for c in unique_cubes), Tp, Ap, Ep,
                 tuple(d.id for d in mesh.devices.flat) if mesh is not None else None)
    hit = _DEVICE_CUBE_CACHE.get(stack_key)
    if hit is not None:
        return hit
    stacked = jnp.stack([_padded_device_cube(c, Tp, Ap, Ep) for c in unique_cubes])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        stacked = jax.device_put(stacked, NamedSharding(mesh, PartitionSpec()))
    return _DEVICE_CUBE_CACHE.insert(stack_key, stacked, tuple(unique_cubes))


def _render_mesh():
    """The data-parallel device mesh panel batches shard over (or None)."""
    from configurable_spectrograms_tpu.parallel.mesh import data_parallel_mesh

    return data_parallel_mesh()


@functools.lru_cache(maxsize=None)
def _batched_quantize_fn(spec_key):
    """Build (and cache) the jitted collapse+quantize program for a scale combo.

    Cubes are passed once (deduplicated) and gathered per panel lane, so a
    pitch-angle grid's eight panels upload one cube, not eight.  Geometry
    is absent from the key: the device ships quantized (T, E) index
    matrices, and the host resamples to any pixel size.

    With ``sharded`` set the program is jitted over the data-parallel mesh:
    every per-panel input shards over the ``data`` axis (cubes replicate --
    panels outnumber cubes ~8:1 on the FAST grids and the panel->cube
    mapping is arbitrary, so a replicated gather beats a cross-device one),
    XLA partitions the whole collapse+quantize pipeline with zero
    collectives, and each chip rasterizes its shard of the lanes.  This is
    the production multi-chip fan-out replacing the reference's process
    pool (reference fast/batch_directory.py:337).
    """
    import jax

    from configurable_spectrograms_tpu.ops.spectrogram import (
        RenderSpec,
        collapse_cube,
        quantize_matrix,
    )

    import jax.numpy as jnp

    y_scale, z_scale, lo_pct, hi_pct, explicit_bounds, gather_w, sharded = spec_key
    spec = RenderSpec(8, 8, y_scale, z_scale, lo_pct, hi_pct)

    def one(u, pm, tv, en, ev, ts, tc, zb, zbev, zbft, t_map, cubes):
        m = collapse_cube(cubes[u], pm, tv)
        q = quantize_matrix(
            m, en, ev, tv, ts, tc, zb, spec,
            zb_e_valid=zbev, zb_full_time=zbft, skip_percentile=explicit_bounds,
        )
        idx = q["idx"]
        if gather_w:
            # When the time axis is longer than the pixel width, only <= W
            # distinct rows are ever sampled -- gather them on device so
            # the readback scales with pixels, not samples.
            idx = idx[t_map]
        # Pack the metadata (scalars + kept_pos) behind the index matrix in
        # ONE uint8 buffer: this host<->device link charges latency per
        # buffer, so a single readback wins.  Floats travel as bitcast
        # bytes; the host unpacks with a matching frombuffer view.
        meta = jnp.concatenate(
            [
                jnp.stack(
                    [
                        q["n_kept"].astype(jnp.float32),
                        q["flip"].astype(jnp.float32),
                        q["y0"],
                        q["y1"],
                        q["vmin"],
                        q["vmax"],
                        q["empty"].astype(jnp.float32),
                    ]
                ),
                q["kept_pos"].astype(jnp.float32),
            ]
        )
        meta_bytes = jax.lax.bitcast_convert_type(meta, jnp.uint8).reshape(-1)
        return jnp.concatenate([idx.reshape(-1), meta_bytes])

    batched = jax.vmap(one, in_axes=(0,) * 11 + (None,))
    if not sharded:
        return jax.jit(batched)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _render_mesh()
    lane = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    return jax.jit(batched, in_shardings=(lane,) * 11 + (replicated,), out_shardings=lane)


def device_render_panels(panels: list[PanelData], tile_h: int, tile_w: int) -> list[dict]:
    """Rasterize many panels with minimal device dispatches and readback.

    Panels group into (T, A, E, scale-combo) padding buckets; each bucket
    is one vmapped TPU call that collapses + quantizes every panel's
    matrix.  Only the small uint8 index matrices and scalar metadata come
    back over the wire; the host pixel-replicates and LUT-colors them
    (:func:`..render.tile.resample_indices`), which profiling showed beats
    shipping RGBA tiles by ~300x in device->host bytes.  Duplicate cubes
    (the pitch grid's full/zoom pairs and four categories share one file)
    upload once per bucket.  Returns dicts in input order with keys
    ``rgba``, ``vmin``, ``vmax``, ``y0``, ``y1``, ``n_kept``, ``empty``.
    """
    from configurable_spectrograms_tpu.ops._colormap_data import colormap_lut

    if not panels:
        return []
    groups: dict[tuple, list[int]] = {}
    for i, p in enumerate(panels):
        T, A, E = p.cube.shape
        key = (
            _bucket(T, 256, 64),
            _bucket(A, 8, 8),
            _bucket(E, 8, 8),
            p.y_scale,
            p.z_scale,
            float(p.low_percentile),
            float(p.high_percentile),
            # Explicit-bounds panels compile a sort-free program.
            p.z_min is not None and p.z_max is not None,
        )
        groups.setdefault(key, []).append(i)

    probe_device_link()
    maybe_reprobe_device_link()
    results: list[dict | None] = [None] * len(panels)
    from configurable_spectrograms_tpu.utils.timing import active_stage

    for (Tp, Ap, Ep, y_scale, z_scale, lo_pct, hi_pct, explicit), idxs in groups.items():
        if _host_backend_active():
            with active_stage("host_quantize"):
                _render_group_host(panels, idxs, tile_h, tile_w, y_scale, z_scale, lo_pct, hi_pct, results)
            continue
        n = len(idxs)
        # Shard lanes over the data-parallel mesh when one exists: pad the
        # lane count to a multiple of the device count with benign empty
        # lanes (t_count=0 quantizes to empty and is never read back out).
        mesh = _render_mesh()
        n_lanes = n
        if mesh is not None:
            d = int(mesh.devices.size)
            n_lanes = ((n + d - 1) // d) * d
        # Deduplicate cube uploads within the bucket.
        cube_slot: dict[int, int] = {}
        unique_cubes: list[np.ndarray] = []
        u_idx = np.zeros((n_lanes,), np.int32)
        for j, i in enumerate(idxs):
            c = panels[i].cube
            slot = cube_slot.get(id(c))
            if slot is None:
                slot = len(unique_cubes)
                cube_slot[id(c)] = slot
                unique_cubes.append(c)
            u_idx[j] = slot
        cubes = _stack_cubes(unique_cubes, Tp, Ap, Ep, mesh)

        masks = np.zeros((n_lanes, Ap), bool)
        energies = np.zeros((n_lanes, Ep), np.float32)
        e_valids = np.zeros((n_lanes, Ep), bool)
        t_valids = np.zeros((n_lanes,), np.int32)
        t_starts = np.zeros((n_lanes,), np.int32)
        t_counts = np.zeros((n_lanes,), np.int32)
        z_bounds = np.full((n_lanes, 2), np.nan, np.float32)
        zb_e_valids = np.zeros((n_lanes, Ep), bool)
        zb_full = np.zeros((n_lanes,), bool)
        for j, i in enumerate(idxs):
            p = panels[i]
            T, A, E = p.cube.shape
            masks[j, :A] = p.pitch_mask
            energies[j, :E] = p.energy
            e_valids[j, :E] = (p.energy >= p.y_min) & (p.energy <= p.y_max)
            t_valids[j] = T
            t_starts[j] = p.window.t_start
            t_counts[j] = p.window.t_count
            z_bounds[j] = (
                np.nan if p.z_min is None else p.z_min,
                np.nan if p.z_max is None else p.z_max,
            )
            if p.bounds_energy_range is not None:
                b_lo, b_hi = p.bounds_energy_range
                zb_e_valids[j, :E] = (p.energy >= b_lo) & (p.energy <= b_hi)
                zb_full[j] = True
            else:
                zb_e_valids[j, :E] = e_valids[j, :E]
                zb_full[j] = False

        # When the padded time axis exceeds the pixel width, gather one
        # matrix row per pixel column on device: readback then scales with
        # pixels, not samples (~4x smaller at real FAST record lengths).
        gather_w = _bucket(tile_w, 256, 256) if Tp > _bucket(tile_w, 256, 256) else 0
        t_maps = np.zeros((n_lanes, max(gather_w, 1)), np.int32)
        if gather_w:
            for j, i in enumerate(idxs):
                cols, _ = pixel_columns(
                    make_x_map(panels[i].window, tile_w), int(t_starts[j]), int(t_counts[j]), Tp, tile_w
                )
                t_maps[j, :tile_w] = cols

        fn = _batched_quantize_fn(
            (y_scale, z_scale, lo_pct, hi_pct, explicit, gather_w, mesh is not None)
        )
        import time as _time

        import jax

        def _run_dispatch():
            out = fn(
                u_idx, masks, t_valids, energies, e_valids, t_starts, t_counts, z_bounds,
                zb_e_valids, zb_full, t_maps, cubes,
            )
            jax.block_until_ready(out)  # compute (and possible compile) done
            return out

        timeout = _dispatch_timeout()
        with active_stage("device_dispatch"):
            ok, out_dev = _bounded_call(_run_dispatch, timeout)
        if ok:
            LAST_DISPATCH["lanes"] = n_lanes
            LAST_DISPATCH["devices"] = len(getattr(out_dev.sharding, "device_set", ())) or 1
            t0 = _time.perf_counter()
            with active_stage("device_readback"):
                ok, packed = _bounded_call(lambda: _readback(out_dev), timeout)
            xfer = _time.perf_counter() - t0
        if not ok:
            # The link died between the bounded preflight and this transfer.
            # A hung jax transfer never returns, so without this bound the
            # coalescer thread -- and every worker waiting on it -- would
            # deadlock for the rest of the batch.
            from configurable_spectrograms_tpu.utils.logging import log_error

            if _BACKEND["mode"] == "device":  # explicit override: fail loudly
                raise RuntimeError(
                    f"device dispatch/readback exceeded {timeout:.0f}s "
                    "(CST_DEVICE_DISPATCH_TIMEOUT) with CST_RENDER_BACKEND=device"
                )
            _BACKEND["forced_host"] = True
            log_error(
                f"[BACKEND] device dispatch/readback exceeded {timeout:.0f}s; "
                "abandoning the transfer and finishing on the host backend"
            )
            _render_group_host(panels, idxs, tile_h, tile_w, y_scale, z_scale, lo_pct, hi_pct, results)
            continue
        if (
            _BACKEND["mode"] == "auto"
            and not _BACKEND["forced_host"]
            and xfer > 1.0
            and packed.nbytes / max(xfer, 1e-9) < _MIN_LINK_MBPS * 1e6
        ):
            # The device link has degraded below usability (observed on this
            # environment's relay); finish everything on the host from now on.
            _BACKEND["forced_host"] = True
            from configurable_spectrograms_tpu.utils.logging import log_error

            log_error(
                f"[BACKEND] device->host readback measured at "
                f"{packed.nbytes / max(xfer, 1e-9) / 1e6:.2f} MB/s; switching panel "
                f"rasterization to the host backend for this process"
            )
        elif (
            _BACKEND["mode"] == "auto"
            and not _BACKEND["forced_host"]
            and not _BACKEND["calibrated"]
            and xfer / n > _CALIBRATE_XFER_SEC_PER_PANEL
        ):
            # The link is slow enough that readback alone may cost more than
            # redoing the whole panel on the host.  Measure once: render this
            # same group on the host (parity-tested identical output) and
            # compare its TOTAL time against the readback time alone -- a
            # comparison conservative toward the device, since the device
            # path's compute is treated as free.
            _BACKEND["calibrated"] = True
            t0 = _time.perf_counter()
            _render_group_host(panels, idxs, tile_h, tile_w, y_scale, z_scale, lo_pct, hi_pct, results)
            host_t = _time.perf_counter() - t0
            if xfer > host_t:
                _BACKEND["forced_host"] = True
                from configurable_spectrograms_tpu.utils.logging import log_error

                log_error(
                    f"[BACKEND] calibration: device readback {xfer * 1e3:.0f} ms vs "
                    f"host render {host_t * 1e3:.0f} ms for {n} panel(s); switching "
                    f"panel rasterization to the host backend for this process"
                )
                continue  # the host results for this group are already in place
        rows_out = gather_w if gather_w else Tp
        idx_host = packed[:n, : rows_out * Ep].reshape(n, rows_out, Ep)
        meta_host = packed[:n, rows_out * Ep :].copy().view(np.float32).reshape(n, 7 + Ep)

        _resample_t0 = _time.perf_counter()
        for j, i in enumerate(idxs):
            p = panels[i]
            n_kept_j, flip_j, y0_j, y1_j, vmin_j, vmax_j, empty_j = meta_host[j, :7]
            if z_scale == "log" and not bool(empty_j) and vmin_j > vmax_j:
                # Explicit log bounds whose safe-positive floor exceeds vmax:
                # matplotlib's LogNorm raises at draw time in the reference
                # (batch drivers record the orbit as a plotting error);
                # rendering on would silently invert the color ramp.  The
                # error is recorded per panel and raised when the OWNING
                # figure composites, so pooled dispatches keep serving the
                # other figures.
                results[i] = {"error": "minvalue must be less than or equal to maxvalue"}
                continue
            kept_pos_j = meta_host[j, 7:].astype(np.int32)
            rgba = resample_indices(
                idx_host[j],
                kept_pos_j,
                int(n_kept_j),
                bool(flip_j),
                float(y0_j),
                float(y1_j),
                int(t_starts[j]),
                int(t_counts[j]),
                make_x_map(p.window, tile_w),
                tile_h,
                tile_w,
                y_scale,
                colormap_lut(p.colormap),
                empty=bool(empty_j),
                pre_gathered=bool(gather_w),
            )
            results[i] = {
                "rgba": rgba,
                "vmin": float(vmin_j),
                "vmax": float(vmax_j),
                "y0": float(y0_j),
                "y1": float(y1_j),
                "n_kept": int(n_kept_j),
                "empty": bool(empty_j),
            }
        from configurable_spectrograms_tpu.utils import timing as _timing

        if _timing.ACTIVE is not None:
            dt = _time.perf_counter() - _resample_t0
            _timing.ACTIVE.add("host_resample", dt)
    return results  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# layout + compositing
# ---------------------------------------------------------------------------

#: Recycled figure canvases, keyed by (H, W).  Returned via a weakref
#: finalizer when the figure Image is collected, so a live Image's buffer
#: is never handed out twice.  Bounded to a handful of entries (a batch
#: renders a few distinct figure sizes).
_CANVAS_POOL: dict[tuple[int, int], list[np.ndarray]] = {}
_CANVAS_POOL_LOCK = threading.Lock()
_CANVAS_POOL_MAX_PER_SIZE = 2
_CANVAS_POOL_MAX_SIZES = 4


def _acquire_canvas(h: int, w: int) -> np.ndarray:
    with _CANVAS_POOL_LOCK:
        stack = _CANVAS_POOL.get((h, w))
        canvas = stack.pop() if stack else None
    if canvas is not None:
        canvas[...] = 255  # writes to mapped pages: fast and predictable
        return canvas
    return np.full((h, w, 4), 255, np.uint8)


def _release_canvas(canvas: np.ndarray) -> None:
    key = (canvas.shape[0], canvas.shape[1])
    with _CANVAS_POOL_LOCK:
        stack = _CANVAS_POOL.get(key)
        if stack is None:
            # Evict the least-recently-added size rather than refusing new
            # sizes: a batch mixing grid kinds cycles through sizes, and a
            # pool that stops recycling reinstates the per-figure 46 MB
            # fresh-canvas page-fault cost it exists to avoid.
            while len(_CANVAS_POOL) >= _CANVAS_POOL_MAX_SIZES:
                del _CANVAS_POOL[next(iter(_CANVAS_POOL))]
            stack = _CANVAS_POOL[key] = []
        if len(stack) < _CANVAS_POOL_MAX_PER_SIZE:
            stack.append(canvas)


class _Layout:
    """Pixel geometry and PIL compositing for one figure render."""

    def __init__(self, fig: SpectroFigure, dpi: float):
        self.fig = fig
        self.dpi = dpi
        self.W = max(8, round(fig.figsize[0] * dpi))
        self.H = max(8, round(fig.figsize[1] * dpi))
        self.tick_px = pt_to_px(TICK_LABEL_PT, dpi)
        self.label_px = pt_to_px(AXIS_LABEL_PT, dpi)
        self.tick_len = pt_to_px(8, dpi)

        self.sup_h = 0
        if fig.suptitle_text:
            self.sup_h = text_size(fig.suptitle_text, pt_to_px(fig.suptitle_pt, dpi))[1] + self.tick_px
        self.footer_h = round(self.H * max(fig.bottom_reserve, 0.0))

        grid_h = self.H - self.sup_h - self.footer_h
        self.cell_w = self.W // max(1, fig.ncols)
        self.cell_h = grid_h // max(1, fig.nrows)

        # Margins inside each cell (estimated text extents; the data tile
        # fills what remains).
        ytick_est = text_size("30000", self.tick_px)[0]
        self.m_left = self.label_px + ytick_est + self.tick_len + round(0.04 * self.cell_w)
        # Row labels (rotated multi-line) claim extra left space when present.
        extra = 0
        for ax in fig.axes:
            if ax.col == 0 and ax.ylabel and "\n" in ax.ylabel:
                lines = ax.ylabel.count("\n") + 1
                extra = max(extra, lines * round(self.label_px * 1.25))
        self.m_left += extra
        self.m_right = round(0.16 * self.cell_w) + text_size("30000", self.tick_px)[0] + self.label_px
        self.m_top = round(self.label_px * 1.6)
        self.m_bottom = self.tick_len + round(self.tick_px * 1.4) + round(self.label_px * 1.5) + round(
            0.10 * self.cell_h
        )

        self.tile_w = max(8, self.cell_w - self.m_left - self.m_right)
        self.tile_h = max(8, self.cell_h - self.m_top - self.m_bottom)

    def axes_rect(self, ax: Axes) -> tuple[int, int, int, int]:
        x0 = ax.col * self.cell_w + self.m_left
        y0 = self.sup_h + ax.row * self.cell_h + self.m_top
        return (x0, y0, x0 + self.tile_w, y0 + self.tile_h)

    # -- full composite -------------------------------------------------------

    def composite(self) -> Image.Image:
        # Pass 1: blit data tiles and colorbar strips straight into a numpy
        # canvas (pure memcpy, no PIL Image wrapping per tile).  Pass 2:
        # decorations (frames, ticks, text, markers) via PIL drawing into the
        # SAME memory: ``frombuffer`` shares the RGBA buffer with numpy, so
        # neither compositing nor the later PNG encode copies the canvas
        # (save_image reads ``_np_canvas``; the native encoder drops alpha).
        # Per-panel analysis errors (e.g. inverted log bounds) surface HERE,
        # at figure granularity: raising inside the pooled dispatch would
        # fail every concurrently-coalesced figure, permanently recording
        # innocent orbits as plotting errors (the reference errors only the
        # offending orbit).
        for ax in self.fig.axes:
            if ax.result is not None and ax.result.get("error"):
                raise ValueError(ax.result["error"])
        canvas = _acquire_canvas(self.H, self.W)
        for ax in self.fig.axes:
            self._blit_tiles(canvas, ax)
        img = Image.frombuffer("RGBA", (self.W, self.H), canvas, "raw", "RGBA", 0, 1)
        img.readonly = 0  # the numpy buffer is writable; draw in place
        img._np_canvas = canvas
        # Recycle the canvas once the Image is garbage-collected: a batch
        # run re-faults ~46 MB of fresh canvas per figure otherwise, and on
        # this host the kernel's fresh-page path is intermittently 10-40x
        # slower than writes to already-mapped memory.
        weakref.finalize(img, _release_canvas, canvas)
        draw = ImageDraw.Draw(img)
        for ax in self.fig.axes:
            self._draw_axes(img, draw, ax)
        if self.fig.suptitle_text:
            draw_text(
                draw,
                (self.W / 2, max(2, self.sup_h // 4)),
                self.fig.suptitle_text,
                pt_to_px(self.fig.suptitle_pt, self.dpi),
                anchor="ma",
            )
        for t in self.fig.fig_texts:
            px = pt_to_px(t["pt"], self.dpi)
            x = t["x"] * self.W
            y = (1.0 - t["y"]) * self.H
            anchor = {"center": "m", "left": "l", "right": "r"}.get(t["ha"], "m") + {
                "bottom": "s",
                "top": "a",
                "center": "m",
            }.get(t["va"], "s")
            draw_text(draw, (x, y), t["s"], px, fill=t["color"], anchor=anchor)
        return img

    def _blit_tiles(self, canvas: np.ndarray, ax: Axes) -> None:
        """Numpy-blit this axes' data tile and colorbar strip into *canvas*."""
        p, r = ax.panel, ax.result
        if p is None or r is None or bool(r["empty"]):
            return
        x0, y0, x1, y1 = self.axes_rect(ax)
        canvas[y0:y1, x0:x1] = r["rgba"][: y1 - y0, : x1 - x0]
        from configurable_spectrograms_tpu.ops._colormap_data import colormap_lut

        cb_x0 = x1 + round(0.035 * self.cell_w)
        cb_w = max(4, round(0.045 * self.cell_w))
        h = self.tile_h
        rows = np.clip(((1.0 - (np.arange(h) + 0.5) / h) * 256).astype(int), 0, 255)
        canvas[y0 : y0 + h, cb_x0 : cb_x0 + cb_w] = colormap_lut(p.colormap)[rows][:, None]

    def _draw_axes(self, img: Image.Image, draw: ImageDraw.ImageDraw, ax: Axes) -> None:
        rect = self.axes_rect(ax)
        x0, y0, x1, y1 = rect
        p, r = ax.panel, ax.result
        drew_tile = p is not None and r is not None and not bool(r["empty"])
        draw.rectangle([x0, y0, x1, y1], outline="black", width=max(1, round(self.dpi / 100)))

        if p is None or r is None or not drew_tile:
            # No data drawn (or device-side empty): frame + title only --
            # the y extent / color bounds in ``r`` are meaningless here.
            if ax.title:
                draw_text(draw, ((x0 + x1) / 2, y0 - 3), ax.title,
                          pt_to_px(ax.title_fontsize_pt, self.dpi), anchor="md")
            return

        self._draw_x_ticks(draw, rect, p)
        self._draw_y_ticks(draw, rect, p, r)
        self._draw_colorbar(img, draw, rect, p, r)

        if drew_tile and p.vertical_lines:
            xl0, xl1 = p.window.xlim
            span = (xl1 - xl0) or 1.0
            marker_px = [(v - xl0) / span * self.tile_w for v in p.vertical_lines]
            drawer = CUSP_MARKER_DRAWERS.get(p.cusp_marker_style, CUSP_MARKER_DRAWERS["both"])
            kw = dict(p.cusp_marker_kwargs)
            kw.setdefault("line_color", p.line_color)
            drawer(draw, rect, marker_px, self.dpi, **kw)

        if ax.title:
            draw_text(draw, ((x0 + x1) / 2, y0 - 3), ax.title,
                      pt_to_px(ax.title_fontsize_pt, self.dpi), anchor="md")
        if ax.xlabel:
            draw_text(draw, ((x0 + x1) / 2, y1 + self.tick_len + round(self.tick_px * 1.3)),
                      ax.xlabel, self.label_px, anchor="ma")
        if ax.ylabel:
            ytick_w = text_size("30000", self.tick_px)[0]
            cx = x0 - self.tick_len - ytick_w - self.label_px // 2 - 4
            if "\n" in ax.ylabel:
                cx -= (ax.ylabel.count("\n")) * round(self.label_px * 0.7)
            draw_rotated_text(img, (max(self.label_px // 2, cx), (y0 + y1) / 2), ax.ylabel,
                              self.label_px, angle=ax.ylabel_rotation)

    # -- tick drawing ---------------------------------------------------------

    def _draw_x_ticks(self, draw, rect, p: PanelData) -> None:
        x0, y0, x1, y1 = rect
        xl0, xl1 = p.window.xlim
        span = (xl1 - xl0) or 1.0
        if p.x_is_unix:
            ticks, fmt = locators.time_ticks(xl0, xl1)
            labels = [locators.format_time_tick(t, fmt) for t in ticks]
        else:
            ticks = locators.nice_linear_ticks(xl0, xl1)
            labels = [locators.format_linear_tick(t) for t in ticks]
        for t, lab in zip(ticks, labels):
            px = x0 + (t - xl0) / span * self.tile_w
            if px < x0 - 0.5 or px > x1 + 0.5:
                continue
            draw.line([(px, y1), (px, y1 + self.tick_len)], fill="black", width=1)
            draw_text(draw, (px, y1 + self.tick_len + 2), lab, self.tick_px, anchor="ma")

    def _y_to_px(self, value: float, rect, p: PanelData, r: dict) -> float | None:
        y0v, y1v = float(r["y0"]), float(r["y1"])
        if p.y_scale == "log":
            if value <= 0 or y0v <= 0 or y1v <= 0 or y1v == y0v:
                return None
            frac = (math.log10(value) - math.log10(y0v)) / (math.log10(y1v) - math.log10(y0v))
        else:
            if y1v == y0v:
                return None
            frac = (value - y0v) / (y1v - y0v)
        if frac < -1e-9 or frac > 1 + 1e-9:
            return None
        return rect[3] - frac * self.tile_h

    def _draw_y_ticks(self, draw, rect, p: PanelData, r: dict) -> None:
        x0 = rect[0]
        if p.y_scale == "log":
            exps = locators.log_ticks(max(float(r["y0"]), 1e-300), float(r["y1"]))
            for k in exps:
                py = self._y_to_px(10.0**k, rect, p, r)
                if py is None:
                    continue
                draw.line([(x0 - self.tick_len, py), (x0, py)], fill="black", width=1)
                draw_pow10(draw, (x0 - self.tick_len - pow10_width(k, self.tick_px) - 2, py), k,
                           self.tick_px, anchor_left=True)
        else:
            ticks = locators.synthesize_linear_y_ticks(p.y_min, p.y_max)
            if not ticks:
                ticks = locators.nice_linear_ticks(float(r["y0"]), float(r["y1"]))
            for t in ticks:
                py = self._y_to_px(float(t), rect, p, r)
                if py is None:
                    continue
                draw.line([(x0 - self.tick_len, py), (x0, py)], fill="black", width=1)
                draw_text(draw, (x0 - self.tick_len - 3, py), locators.format_linear_tick(t),
                          self.tick_px, anchor="rm")

    def _draw_colorbar(self, img, draw, rect, p: PanelData, r: dict) -> None:
        # The gradient strip was numpy-blitted in pass 1; draw its frame,
        # ticks, and label here.
        x0, y0, x1, y1 = rect
        cb_x0 = x1 + round(0.035 * self.cell_w)
        cb_w = max(4, round(0.045 * self.cell_w))
        h = self.tile_h
        draw.rectangle([cb_x0, y0, cb_x0 + cb_w, y1], outline="black", width=1)

        vmin, vmax = float(r["vmin"]), float(r["vmax"])
        tick_max_w = 0
        if p.z_scale == "log" and vmin > 0 and vmax > vmin:
            lmin, lmax = math.log10(vmin), math.log10(vmax)
            exps = locators.log_ticks(vmin, vmax)
            # Label every decade tick unless they'd collide (wide dynamic
            # ranges, e.g. audio power spanning 12 decades).
            label_step = max(1, math.ceil(len(exps) * (self.tick_px * 1.4) / max(h, 1)))
            for j, k in enumerate(exps):
                frac = (k - lmin) / (lmax - lmin)
                py = y1 - frac * h
                draw.line([(cb_x0 + cb_w, py), (cb_x0 + cb_w + self.tick_len // 2, py)], fill="black", width=1)
                if j % label_step == 0:
                    w = draw_pow10(draw, (cb_x0 + cb_w + self.tick_len // 2 + 2, py), k, self.tick_px)
                    tick_max_w = max(tick_max_w, w)
        elif math.isfinite(vmin) and math.isfinite(vmax) and vmax > vmin:
            for t in locators.nice_linear_ticks(vmin, vmax):
                frac = (t - vmin) / (vmax - vmin)
                py = y1 - frac * h
                draw.line([(cb_x0 + cb_w, py), (cb_x0 + cb_w + self.tick_len // 2, py)], fill="black", width=1)
                lab = locators.format_linear_tick(t)
                draw_text(draw, (cb_x0 + cb_w + self.tick_len // 2 + 2, py), lab, self.tick_px, anchor="lm")
                tick_max_w = max(tick_max_w, text_size(lab, self.tick_px)[0])
        # Deliberate divergence: the reference stomps every colorbar label
        # to "Counts" at the end (reference plotting.py:387); we honor the
        # requested z_label so non-FAST data (e.g. the audio front-end's
        # "Power") stays truthful.  FAST/generic rows pass "Counts" anyway.
        label_x = cb_x0 + cb_w + self.tick_len // 2 + tick_max_w + self.label_px // 2 + 6
        draw_rotated_text(img, (min(label_x, self.W - self.label_px // 2 - 2), (y0 + y1) / 2),
                          p.z_label or "Counts", self.label_px, angle=90)
