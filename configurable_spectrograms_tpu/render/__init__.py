"""Host-side rendering: tile prep, figure composition, public plotting API."""

from configurable_spectrograms_tpu.render.figure import (
    Axes,
    PanelData,
    SpectroFigure,
    device_render_panels,
)
from configurable_spectrograms_tpu.render.plotting import (
    close_all_axes_and_clear,
    generic_plot_multirow_optional_zoom,
    generic_plot_spectrogram_set,
    make_spectrogram,
)
from configurable_spectrograms_tpu.render.tile import TimeWindow, compute_time_window, make_x_map

__all__ = [
    "Axes",
    "PanelData",
    "SpectroFigure",
    "device_render_panels",
    "close_all_axes_and_clear",
    "generic_plot_multirow_optional_zoom",
    "generic_plot_spectrogram_set",
    "make_spectrogram",
    "TimeWindow",
    "compute_time_window",
    "make_x_map",
]
