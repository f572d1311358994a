#!/usr/bin/env python
"""Batch-plot every FAST orbit in a directory across all four scale combos.

Mirrors the reference's script of this name: the same public re-exports
for compatibility imports, and a ``main`` that runs the batch driver per
(y, z) scale combination with its matched colormap, a 99th-percentile
extrema pre-pass, and existing plots skipped
(reference batch_multi_plot_FAST_spectrograms.py:58-112).
"""

import os

from configurable_spectrograms_tpu.cli import run_cli
from configurable_spectrograms_tpu.data.orbit_discovery import extract_orbit_and_instrument
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
    FAST_LOGFILE_DATETIME_MARKER_PATH,
    FAST_LOGFILE_PREFIX,
    FAST_OUTPUT_BASE,
    FAST_PLOTTING_PROGRESS_JSON,
)
from configurable_spectrograms_tpu.fast.extrema import compute_global_extrema
from configurable_spectrograms_tpu.fast.plotting import (
    FAST_plot_instrument_grid,
    FAST_plot_pitch_angle_grid,
)
from configurable_spectrograms_tpu.fast.process_orbit import FAST_process_single_orbit
from configurable_spectrograms_tpu.utils.config import FastBatchConfig
from configurable_spectrograms_tpu.utils.logging import (
    get_logfile_path,
    log_exception,
    set_logfile_path,
)
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
    """Run the flagship batch for all four scale combos, resumably.

    An interrupt during any combo stops the sequence (KeyboardInterrupt
    propagates out of the driver).
    """
    set_logfile_path(get_logfile_path(FAST_LOGFILE_PREFIX, FAST_LOGFILE_DATETIME_MARKER_PATH))
    # The reference CLI is flagless (reference
    # batch_multi_plot_FAST_spectrograms.py:79-103), so the scheduling
    # choice rides an env knob instead of a new argument.
    schedule = os.environ.get("CST_BATCH_SCHEDULE") or "orbit-major"
    try:
        FastBatchConfig(schedule=schedule).run()
    except KeyboardInterrupt:
        log_exception("[INTERRUPT] Batch plotting aborted by user.", level="message")
        raise


if __name__ == "__main__":
    run_cli(main)
