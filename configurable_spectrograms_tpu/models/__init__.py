"""Figure model families: every figure product this framework renders.

One import point for the five product pipelines (each is a pure function
from host data to a deferred-render figure; all share the same device
rasterizer and compositor):

* :func:`make_spectrogram` -- one panel (reference plotting.py:92).
* :func:`generic_plot_spectrogram_set` -- vertical stack of generic
  spectrograms (reference plotting.py:392).
* :func:`generic_plot_multirow_optional_zoom` -- rows x (full | full+zoom)
  grid with cusp markers and footer (reference plotting.py:505).
* :func:`FAST_plot_pitch_angle_grid` / :func:`FAST_plot_instrument_grid`
  -- the FAST mission grids (reference fast/plotting.py:34,177).
* :func:`audio_spectrogram_dataset` + the generic set -- the audio
  STFT/mel family (new; BASELINE.json configs[4]).
"""

from configurable_spectrograms_tpu.fast.plotting import (
    FAST_plot_instrument_grid,
    FAST_plot_pitch_angle_grid,
)
from configurable_spectrograms_tpu.ops.stft import audio_spectrogram_dataset
from configurable_spectrograms_tpu.render.plotting import (
    generic_plot_multirow_optional_zoom,
    generic_plot_spectrogram_set,
    make_spectrogram,
)

__all__ = [
    "FAST_plot_instrument_grid",
    "FAST_plot_pitch_angle_grid",
    "audio_spectrogram_dataset",
    "generic_plot_multirow_optional_zoom",
    "generic_plot_spectrogram_set",
    "make_spectrogram",
]
