"""Panel inputs and the numpy host rasterization group.

Split out of :mod:`configurable_spectrograms_tpu.render.dispatch`:
:class:`PanelData` is the unit every backend renders, and
``_render_group_host`` is the parity-tested pure-numpy group renderer the
device pipeline falls back to (and measures itself against).  Tests that
monkeypatch ``_render_group_host`` patch it HERE -- every caller resolves
it through this module.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from configurable_spectrograms_tpu.render.link import note_host_group
from configurable_spectrograms_tpu.render.tile import (
    TimeWindow,
    make_x_map,
    resample_indices,
)

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


# ---------------------------------------------------------------------------
# batched rasterization (device by default, host fallback)
# ---------------------------------------------------------------------------

class LazyPanelResult(dict):
    """Panel result whose ``"rgba"`` tile materializes on first access.

    The production compositor never needs the standalone tile: it blits
    into a figure-canvas rect, so :meth:`draw_rgba_into` resamples the
    quantized index matrix straight into that view (via
    ``resample_indices(out=...)``), skipping the intermediate
    (tile_h, tile_w, 4) allocation plus one full write+read of it per
    panel (~22 MB of canvas-sized traffic per 8-panel figure).  Direct
    consumers -- tests, embedders, the service API -- still read
    ``result["rgba"]`` and get the identical tile, rendered lazily and
    cached.  Scalars (vmin/vmax/y0/y1/n_kept/empty) stay eager.
    """

    def __init__(self, fields: dict, render):
        super().__init__(fields)
        self._render = render  # render(out=None) -> tile or out

    def __missing__(self, key):
        if key == "rgba":
            tile = self._render()
            self["rgba"] = tile
            # The cached tile fully replaces the renderer; dropping it
            # releases the captured quantized-index row (and anything else
            # the closure holds) instead of pinning it for the result's
            # lifetime.
            self._render = None
            return tile
        raise KeyError(key)

    def __contains__(self, key) -> bool:
        return key == "rgba" or dict.__contains__(self, key)

    def get(self, key, default=None):
        if key == "rgba":
            return self["rgba"]
        return dict.get(self, key, default)

    # Enumeration must see the full mapping (consumers copy results via
    # items()/dict(...)): materialize the tile first so laziness stays an
    # invisible optimization, not a behavior change.
    def _materialize(self) -> None:
        if not dict.__contains__(self, "rgba"):
            self["rgba"]

    def keys(self):
        self._materialize()
        return dict.keys(self)

    def values(self):
        self._materialize()
        return dict.values(self)

    def items(self):
        self._materialize()
        return dict.items(self)

    def __iter__(self):
        self._materialize()
        return dict.__iter__(self)

    def __len__(self) -> int:
        self._materialize()
        return dict.__len__(self)

    def copy(self):
        self._materialize()
        return dict(self)

    # Mutating/compare operations must also see the full mapping: an eager
    # result dict would return the tile from pop("rgba"), keep setdefault
    # from shadowing it, and compare equal to its dict copy.
    def pop(self, key, *default):
        self._materialize()
        return dict.pop(self, key, *default)

    def popitem(self):
        self._materialize()
        return dict.popitem(self)

    def setdefault(self, key, default=None):
        self._materialize()
        return dict.setdefault(self, key, default)

    def __eq__(self, other):
        self._materialize()
        if isinstance(other, LazyPanelResult):
            other._materialize()
        return dict.__eq__(self, other)

    def __ne__(self, other):
        result = self.__eq__(other)
        return result if result is NotImplemented else not result

    __hash__ = None  # same as dict: unhashable

    def draw_rgba_into(self, view: "np.ndarray") -> None:
        """Composite this panel into *view* (an RGBA canvas rect)."""
        if dict.__contains__(self, "rgba"):
            view[...] = self["rgba"][: view.shape[0], : view.shape[1]]
        else:
            self._render(out=view)


def _render_group_host(panels: list[PanelData], idxs: list[int], tile_h: int, tile_w: int,
                       y_scale: str, z_scale: str, lo_pct: float, hi_pct: float,
                       results: list) -> None:
    """Pure-numpy group rasterization (no device involved).

    Every call is timed into the link-layer rate meter
    (:func:`..render.link.note_host_group`): the slow-dispatch detector
    and the latency policy compare device throughput against *measured*
    host rates, and any host render -- backend runs, fallbacks, probation
    groups -- is a measurement.
    """
    import time as _time

    from configurable_spectrograms_tpu.ops._colormap_data import colormap_lut
    from configurable_spectrograms_tpu.render.host_quantize import (
        cached_collapse,
        host_clean,
        host_quantize,
    )

    _host_t0 = _time.perf_counter()

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
        def _render(out=None, _q=q, _p=p):
            return resample_indices(
                _q["idx"], _q["kept_pos"], _q["n_kept"], _q["flip"], _q["y0"], _q["y1"],
                _p.window.t_start, _p.window.t_count, make_x_map(_p.window, tile_w),
                tile_h, tile_w, y_scale, colormap_lut(_p.colormap), empty=_q["empty"],
                out=out,
            )

        results[i] = LazyPanelResult(
            {
                "vmin": q["vmin"],
                "vmax": q["vmax"],
                "y0": q["y0"],
                "y1": q["y1"],
                "n_kept": q["n_kept"],
                "empty": q["empty"],
            },
            _render,
        )
    note_host_group(len(idxs), _time.perf_counter() - _host_t0)
