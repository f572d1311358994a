#!/usr/bin/env python
"""Batch-plot every FAST orbit in a directory for all four y/z scale combos.

Mirrors the reference's ``batch_multi_plot_FAST_spectrograms.py``: public
API re-exports plus a ``main`` that runs
``FAST_plot_spectrograms_directory`` for each (y, z) scale combination with
its matched colormap, ``max_processing_percentile=99``, and
``override_plots=False`` (reference batch_multi_plot_FAST_spectrograms.py:58-112).
"""

import sys

from configurable_spectrograms_tpu.fast.batch_directory import FAST_plot_spectrograms_directory
from configurable_spectrograms_tpu.fast.constants import (
    CDF_VARIABLES,
    DEFAULT_COLORMAP_LINEAR_Y_LINEAR_Z,
    DEFAULT_COLORMAP_LINEAR_Y_LOG_Z,
    DEFAULT_COLORMAP_LOG_Y_LINEAR_Z,
    DEFAULT_COLORMAP_LOG_Y_LOG_Z,
    DEFAULT_INSTRUMENT_ORDER,
    FAST_CDF_DATA_FOLDER_PATH,
    FAST_FILTERED_ORBITS_CSV_PATH,
    FAST_OUTPUT_BASE,
    FAST_PLOTTING_PROGRESS_JSON,
)
from configurable_spectrograms_tpu.fast.extrema import compute_global_extrema
from configurable_spectrograms_tpu.data.orbit_discovery import extract_orbit_and_instrument
from configurable_spectrograms_tpu.fast.plotting import (
    FAST_plot_instrument_grid,
    FAST_plot_pitch_angle_grid,
)
from configurable_spectrograms_tpu.fast.process_orbit import FAST_process_single_orbit
from configurable_spectrograms_tpu.utils.logging import get_logfile_path, log_exception, set_logfile_path
from configurable_spectrograms_tpu.utils.percentiles import round_extrema

__all__ = [
    "CDF_VARIABLES",
    "DEFAULT_COLORMAP_LINEAR_Y_LINEAR_Z",
    "DEFAULT_COLORMAP_LINEAR_Y_LOG_Z",
    "DEFAULT_COLORMAP_LOG_Y_LINEAR_Z",
    "DEFAULT_COLORMAP_LOG_Y_LOG_Z",
    "DEFAULT_INSTRUMENT_ORDER",
    "FAST_CDF_DATA_FOLDER_PATH",
    "FAST_FILTERED_ORBITS_CSV_PATH",
    "FAST_OUTPUT_BASE",
    "FAST_PLOTTING_PROGRESS_JSON",
    "FAST_plot_instrument_grid",
    "FAST_plot_pitch_angle_grid",
    "FAST_plot_spectrograms_directory",
    "FAST_process_single_orbit",
    "compute_global_extrema",
    "extract_orbit_and_instrument",
    "round_extrema",
]


def main() -> None:
    """Run the FAST batch plotter for all y/z scale combinations sequentially.

    An interrupt during any run stops the sequence without starting
    subsequent combinations.
    """
    set_logfile_path(
        get_logfile_path("./batch_multi_plot_FAST_log", "./batch_multi_plot_FAST_logfile_datetime.txt")
    )
    for y_scale, z_scale, colormap in [
        ("linear", "linear", DEFAULT_COLORMAP_LINEAR_Y_LINEAR_Z),
        ("linear", "log", DEFAULT_COLORMAP_LINEAR_Y_LOG_Z),
        ("log", "linear", DEFAULT_COLORMAP_LOG_Y_LINEAR_Z),
        ("log", "log", DEFAULT_COLORMAP_LOG_Y_LOG_Z),
    ]:
        FAST_plot_spectrograms_directory(
            FAST_CDF_DATA_FOLDER_PATH,
            verbose=False,
            y_scale=y_scale,
            z_scale=z_scale,
            use_tqdm=True,
            colormap=colormap,
            max_processing_percentile=99,
            override_plots=False,
        )


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        log_exception("[INTERRUPT] Batch plotting aborted by user.", level="message")
        print("\n[INTERRUPT] Aborted by user.")
        sys.exit(130)
