#!/usr/bin/env python
"""Render one FAST ESA figure: a pitch-angle grid or an instrument grid.

Same mutually-exclusive modes, flags, 200 DPI saves, and exit codes as the
reference's script of this name (reference
single_plot_FAST_spectrograms.py:36-175).
"""

import argparse

from configurable_spectrograms_tpu.cli import add_render_style_arguments, report_render_outcome, run_cli
from configurable_spectrograms_tpu.data.cdf_utils import load_filtered_orbits
from configurable_spectrograms_tpu.data.orbit_discovery import (
    discover_orbit_files,
    extract_orbit_and_instrument,
)
from configurable_spectrograms_tpu.fast.plotting import (
    FAST_plot_instrument_grid,
    FAST_plot_pitch_angle_grid,
)


def render_single_pitch_angle_grid(
    cdf_file_path: str,
    output_path: str,
    y_scale: str = "linear",
    z_scale: str = "linear",
    colormap: str = "viridis",
    cusp_marker_style: str = "both",
) -> bool:
    """One instrument file -> its pitch-angle grid PNG.

    The orbit number for cusp-boundary lookup parses from the filename.
    """
    parsed = extract_orbit_and_instrument(cdf_file_path)
    figure, _ = FAST_plot_pitch_angle_grid(
        cdf_file_path,
        filtered_orbits_df=load_filtered_orbits(),
        orbit_number=parsed[0] if parsed else None,
        scale_function_y=y_scale,
        scale_function_z=z_scale,
        show=False,
        colormap=colormap,
        cusp_marker_style=cusp_marker_style,
    )
    if figure is None:
        return False
    figure.savefig(output_path, dpi=200)
    return True


def render_single_instrument_grid(
    data_folder: str,
    orbit_number: int,
    output_path: str,
    y_scale: str = "linear",
    z_scale: str = "linear",
    colormap: str = "viridis",
    cusp_marker_style: str = "both",
) -> bool:
    """One orbit resolved from *data_folder* -> its instrument-grid PNG."""
    files = discover_orbit_files(data_folder).get(orbit_number)
    if not files:
        return False
    figure, _ = FAST_plot_instrument_grid(
        files,
        filtered_orbits_df=load_filtered_orbits(),
        orbit_number=orbit_number,
        scale_function_y=y_scale,
        scale_function_z=z_scale,
        show=False,
        colormap=colormap,
        cusp_marker_style=cusp_marker_style,
    )
    if figure is None:
        return False
    figure.savefig(output_path, dpi=200)
    return True


def main() -> int:
    parser = argparse.ArgumentParser(description="Render a single FAST ESA spectrogram figure.")
    mode = parser.add_mutually_exclusive_group(required=True)
    mode.add_argument("--cdf-file", help="Single CDF file to render as a pitch-angle grid.")
    mode.add_argument("--data-folder", help="Data folder to search for one orbit's instrument grid.")
    parser.add_argument("--orbit", type=int, help="Orbit number (required with --data-folder).")
    parser.add_argument("--output", required=True, help="Destination PNG file path.")
    add_render_style_arguments(parser)
    args = parser.parse_args()

    if args.data_folder is not None and args.orbit is None:
        parser.error("--orbit is required when using --data-folder")

    if args.cdf_file is not None:
        produced = render_single_pitch_angle_grid(
            args.cdf_file, args.output, args.y_scale, args.z_scale, args.colormap, args.cusp_style
        )
    else:
        produced = render_single_instrument_grid(
            args.data_folder, args.orbit, args.output,
            args.y_scale, args.z_scale, args.colormap, args.cusp_style,
        )
    return report_render_outcome(produced, args.output)


if __name__ == "__main__":
    run_cli(main)
