"""Host-side preparation of device rasterization inputs.

The time axis lives on the host (it is needed for tick labels anyway), so
zoom-window and x-clip selection resolve here to a contiguous
``(t_start, t_count)`` window plus an affine pixel->matrix-column map; the
device never sees dynamic shapes.  Mirrors the row-filtering steps of the
reference's ``make_spectrogram`` (reference plotting.py:204-219,238-253).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class TimeWindow:
    """A resolved contiguous time selection and its plot coordinates."""

    t_start: int
    t_count: int
    extent: tuple[float, float]  # first/last selected x value
    xlim: tuple[float, float]  # drawn axis limits (may exceed extent)


def compute_time_window(
    x: np.ndarray,
    center: float | None = None,
    duration_seconds: float | None = None,
    x_min: float | None = None,
    x_max: float | None = None,
) -> TimeWindow | None:
    """Resolve zoom/x-clip filtering to a contiguous index window.

    Matches the reference's two inclusive-bound mask filters
    (``(x >= left) & (x <= right)``, reference plotting.py:204-219) via
    searchsorted on the sorted time array.  Returns ``None`` when nothing
    survives (the reference's empty-plot skip path).
    """
    x = np.asarray(x)
    lo, hi = 0, len(x)
    zoom = center is not None and duration_seconds is not None
    if zoom:
        left = center - duration_seconds / 2
        right = center + duration_seconds / 2
        lo = max(lo, int(np.searchsorted(x, left, side="left")))
        hi = min(hi, int(np.searchsorted(x, right, side="right")))
    if x_min is not None:
        lo = max(lo, int(np.searchsorted(x, x_min, side="left")))
    if x_max is not None:
        hi = min(hi, int(np.searchsorted(x, x_max, side="right")))
    if hi <= lo:
        return None
    extent = (float(x[lo]), float(x[hi - 1]))
    if zoom:
        xlim = (center - duration_seconds / 2, center + duration_seconds / 2)
    else:
        xlim = extent
    return TimeWindow(t_start=lo, t_count=hi - lo, extent=extent, xlim=xlim)


def make_x_map(window: TimeWindow, width: int) -> np.ndarray:
    """Affine map ``col_f = a*px + b`` from output pixel column to matrix row.

    ``px`` is the integer pixel index; the half-pixel center offset is baked
    into ``b``.  Encodes both the xlim->data transform and imshow's extent
    pixel replication, so the device kernel only evaluates one fma per
    column.
    """
    ex0, ex1 = window.extent
    xl0, xl1 = window.xlim
    n = window.t_count
    if ex1 == ex0:
        # Single-sample window: the one sample fills the panel.
        return np.array([0.0, 0.5], dtype=np.float32)
    a = n * (xl1 - xl0) / ((ex1 - ex0) * width)
    b = n * ((xl0 - ex0) + 0.5 * (xl1 - xl0) / width) / (ex1 - ex0)
    return np.array([a, b], dtype=np.float32)
