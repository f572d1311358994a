"""Host-side rendering: tile preparation, figure composition, PNG output."""

from configurable_spectrograms_tpu.render.tile import (
    TimeWindow,
    compute_time_window,
    make_x_map,
)

__all__ = ["TimeWindow", "compute_time_window", "make_x_map"]
