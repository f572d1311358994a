"""Single-output FAST ESA spectrogram rendering.

Behavioral parity with reference fast/plotting.py:34-328, restructured for
the device pipeline: instead of collapsing each pitch-angle category on the
host to precompute percentile color bounds, the category masks and a
bounds-energy-range are attached to the panel descriptions, and the device
computes the collapse *and* the bounds in the same batched dispatch that
rasterizes the figure.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from configurable_spectrograms_tpu.data.cdf_utils import (
    get_cdf_file_type,
    get_timestamps_for_orbit,
    load_fast_cdf_dataset,
)
from configurable_spectrograms_tpu.fast.constants import (
    DEFAULT_INSTRUMENT_ORDER,
    DEFAULT_PITCH_ANGLE_CATEGORIES,
)
from configurable_spectrograms_tpu.render.plotting import generic_plot_multirow_optional_zoom
from configurable_spectrograms_tpu.utils.logging import log_exception

# Row order used when building the pitch-angle grid; independent of dict
# iteration order (reference fast/plotting.py:26-31).
_PITCH_ANGLE_ROW_KEYS = (
    "all\n(0, 360)",
    "downgoing\n(0, 30), (330, 360)",
    "upgoing\n(150, 210)",
    "perpendicular\n(40, 140), (210, 330)",
)


def FAST_plot_pitch_angle_grid(
    cdf_file_path: str,
    filtered_orbits_df=None,
    orbit_number: int | None = None,
    zoom_duration_minutes: float = 6.25,
    scale_function_y: str = "linear",
    scale_function_z: str = "linear",
    pitch_angle_categories: dict[str, list[tuple[float, float]]] | None = None,
    show: bool = True,
    colormap: str = "viridis",
    y_min: float | None = None,
    y_max: float | None = None,
    z_min: float | None = None,
    z_max: float | None = None,
    cusp_marker_style: str = "both",
    cusp_marker_kwargs: dict | None = None,
) -> tuple[Any, Any]:
    """Grid of ESA spectrograms collapsed by pitch-angle categories.

    One row per category (all/downgoing/upgoing/perpendicular by default) in
    the reference's stable row order, with an optional zoom column when
    orbit boundary timestamps exist.  Color bounds per row are 1st/99th
    percentiles of the category's y-filtered full-time matrix unless
    ``z_min``/``z_max`` override them (reference fast/plotting.py:34-174).

    Returns ``(fig, canvas)`` or ``(None, None)`` when no datasets are
    produced.
    """
    if pitch_angle_categories is None:
        pitch_angle_categories = DEFAULT_PITCH_ANGLE_CATEGORIES
    instrument_type = get_cdf_file_type(cdf_file_path)
    dataset = load_fast_cdf_dataset(cdf_file_path)
    times, data, energy, pitchangle = (
        dataset["times"],
        dataset["data"],
        dataset["energy"],
        dataset["pitch_angle"],
    )

    vertical_lines = None
    if filtered_orbits_df is not None and orbit_number is not None:
        vertical_lines = get_timestamps_for_orbit(filtered_orbits_df, orbit_number, instrument_type, times)
        if not vertical_lines:
            log_exception(
                f"No vertical lines found for orbit {orbit_number} in {cdf_file_path}. Skipping.",
                level="message",
            )

    y_lower = 0 if y_min is None else y_min
    y_upper = 4000 if y_max is None else y_max

    datasets = []
    for key in _PITCH_ANGLE_ROW_KEYS:
        if key not in pitch_angle_categories:
            continue
        mask = np.zeros_like(pitchangle, dtype=bool)
        for rng in pitch_angle_categories[key]:
            mask |= (pitchangle >= rng[0]) & (pitchangle <= rng[1])
        # Row skipped only when every energy bin is filtered out (with the
        # nansum collapse the reference's all-NaN-column mask never trips,
        # so the energy-range check decides emptiness).
        if not np.any((energy >= y_lower) & (energy <= y_upper)):
            continue
        datasets.append(
            {
                "x": times,
                "y": energy,
                "data": data,
                "pitch_angle_mask": mask,
                "label": key.title(),
                "y_label": "Energy (eV)",
                "z_label": "Counts",
                "bounds_energy_range": (float(y_lower), float(y_upper)),
                "y_min": y_lower,
                "y_max": y_upper,
                **({"z_min": z_min} if z_min is not None else {}),
                **({"z_max": z_max} if z_max is not None else {}),
            }
        )

    if not datasets:
        log_exception(f"[WARNING] No pitch angle datasets to plot for {cdf_file_path}.", level="message")
        return None, None

    title = f"Orbit {orbit_number} - Pitch Angle {instrument_type} ESA Spectrograms"
    return generic_plot_multirow_optional_zoom(
        datasets,
        vertical_lines=vertical_lines,
        zoom_duration_minutes=zoom_duration_minutes,
        y_scale=scale_function_y,
        z_scale=scale_function_z,
        colormap=colormap,
        show=show,
        title=title,
        row_label_pad=50,
        row_label_rotation=90,
        y_min=y_min,
        y_max=y_max,
        z_min=z_min,
        z_max=z_max,
        cusp_marker_style=cusp_marker_style,
        cusp_marker_kwargs=cusp_marker_kwargs,
    )


def FAST_plot_instrument_grid(
    cdf_file_paths: dict[str, str],
    filtered_orbits_df=None,
    orbit_number: int | None = None,
    zoom_duration_minutes: float = 6.25,
    scale_function_y: str = "linear",
    scale_function_z: str = "linear",
    instrument_order: tuple[str, ...] = DEFAULT_INSTRUMENT_ORDER,
    show: bool = True,
    colormap: str = "viridis",
    y_min: float | None = None,
    y_max: float | None = None,
    z_min: float | None = None,
    z_max: float | None = None,
    global_extrema: dict[str, int | float] | None = None,
    cusp_marker_style: str = "both",
    cusp_marker_kwargs: dict | None = None,
) -> tuple[Any, Any]:
    """Multi-instrument ESA spectrogram grid for a single orbit.

    Loads each instrument CDF and builds one row per instrument; vertical
    lines come from the first loadable instrument; per-instrument
    ``global_extrema`` keys (``{inst}_{y}_{z}_{y|z}_{min|max}``) override
    the direct bound arguments; failed loads are logged and skipped
    (reference fast/plotting.py:177-328).
    """
    datasets = []
    vertical_lines = None
    for inst in instrument_order:
        cdf_path = cdf_file_paths.get(inst)
        if not cdf_path:
            continue
        try:
            dataset = load_fast_cdf_dataset(cdf_path)
            times, data, energy = dataset["times"], dataset["data"], dataset["energy"]

            if vertical_lines is None and filtered_orbits_df is not None and orbit_number is not None:
                instrument_type = get_cdf_file_type(cdf_path)
                vertical_lines = get_timestamps_for_orbit(filtered_orbits_df, orbit_number, instrument_type, times)
                if not vertical_lines:
                    log_exception(
                        f"No vertical lines found for orbit {orbit_number} in {cdf_path}. Skipping.",
                        level="message",
                    )

            if isinstance(global_extrema, dict):
                key_prefix = f"{inst}_{scale_function_y}_{scale_function_z}"
                y_lower = global_extrema.get(f"{key_prefix}_y_min", 0 if y_min is None else y_min)
                y_upper = global_extrema.get(f"{key_prefix}_y_max", 4000 if y_max is None else y_max)
                row_z_min = global_extrema.get(f"{key_prefix}_z_min")
                row_z_max = global_extrema.get(f"{key_prefix}_z_max")
            else:
                y_lower = 0 if y_min is None else y_min
                y_upper = 4000 if y_max is None else y_max
                row_z_min = row_z_max = None

            if not np.any((energy >= y_lower) & (energy <= y_upper)):
                continue

            datasets.append(
                {
                    "x": times,
                    "y": energy,
                    "data": data,
                    "label": inst.upper(),
                    "y_label": "Energy (eV)",
                    "z_label": "Counts",
                    "bounds_energy_range": (float(y_lower), float(y_upper)),
                    "vmin": row_z_min,
                    "vmax": row_z_max,
                    "y_min": y_lower,
                    "y_max": y_upper,
                    **({"z_min": z_min} if z_min is not None else {}),
                    **({"z_max": z_max} if z_max is not None else {}),
                }
            )
        except Exception as exc:
            log_exception(f"Failed to load CDF for {inst} at {cdf_path}. Skipping.", exc, level="error")

    if not datasets:
        return None, None

    title = f"Orbit {orbit_number} -  ESA Spectrograms"
    return generic_plot_multirow_optional_zoom(
        datasets,
        vertical_lines=vertical_lines,
        zoom_duration_minutes=zoom_duration_minutes,
        y_scale=scale_function_y,
        z_scale=scale_function_z,
        colormap=colormap,
        show=show,
        title=title,
        row_label_pad=50,
        row_label_rotation=90,
        y_min=y_min,
        y_max=y_max,
        z_min=z_min,
        z_max=z_max,
        cusp_marker_style=cusp_marker_style,
        cusp_marker_kwargs=cusp_marker_kwargs,
    )
