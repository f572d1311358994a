"""TPU-native configurable spectrogram engine.

A ground-up rebuild of the capabilities of ev-hansen/Configurable-Spectrograms
(reference: /root/reference) designed for TPU hardware: the spectrogram math
(pitch-angle masking, nansum collapse, percentile color bounds, log/linear
normalization, extent resampling, and colormap-LUT rasterization) runs as
fused, jittable JAX/Pallas device code, batches of orbits are vmapped and
sharded over a ``jax.sharding.Mesh``, and folder-wide extrema passes are
device-side collective reductions.  Host-side code handles CDF decoding,
figure composition (PIL), progress-JSON resume, and CLI entry points.

Layer map (mirrors reference SURVEY.md section 1):

* L0  ``utils``            -- logging, progress store, percentile helpers
* L1  ``data``             -- CDF reader/writer, orbit discovery, downloader
* L2  ``ops`` + ``render`` -- device rasterization kernels + host compositing
* L3  ``batch_runner`` / ``generic_batch`` / ``parallel`` -- batch engines
* L4  ``fast``             -- FAST mission layer
* L5  ``cli``              -- command-line entry points

The public API mirrors the reference's:
``make_spectrogram``, ``generic_plot_spectrogram_set``,
``generic_plot_multirow_optional_zoom``, ``generic_batch_plot``,
``run_batch``, ``FAST_plot_pitch_angle_grid``, ``FAST_plot_instrument_grid``,
``FAST_process_single_orbit``, ``FAST_plot_spectrograms_directory``,
``compute_global_extrema``, ``load_fast_cdf_dataset``, and the download
functions.
"""

__version__ = "0.1.0"
