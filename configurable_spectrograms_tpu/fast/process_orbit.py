"""Per-orbit FAST spectrogram processing (the batch work unit).

Behavioral parity with reference fast/process_orbit.py:17-300: per
instrument, pitch-angle grids are produced twice (``_given_extrema`` and
``_raw`` suffixes), then instrument grids twice; output files use the exact
reference filename scheme under ``{base}/{year}/{month}/{orbit}``; soft
per-instrument and per-orbit timeouts abort remaining work with a
``timeout`` status; ``override_plots=False`` skips existing files; figures
save at 200 DPI and are closed immediately.
"""

from __future__ import annotations

import gc
import os
import time as _time
from typing import Any

from configurable_spectrograms_tpu.constants import FAST_SAVE_DPI
from configurable_spectrograms_tpu.data.cdf_utils import (
    get_cdf_file_type,
    get_timestamps_for_orbit,
    load_fast_cdf_dataset,
)
from configurable_spectrograms_tpu.data.orbit_discovery import parse_year_month
from configurable_spectrograms_tpu.fast.constants import DEFAULT_INSTRUMENT_ORDER
from configurable_spectrograms_tpu.fast.extrema import extrema_overrides
from configurable_spectrograms_tpu.fast.plotting import (
    FAST_plot_instrument_grid,
    FAST_plot_pitch_angle_grid,
)
from configurable_spectrograms_tpu.render.plotting import close_all_axes_and_clear
from configurable_spectrograms_tpu.utils.logging import log_exception


def FAST_process_single_orbit(
    orbit_number: int,
    instrument_file_paths: dict[str, str],
    filtered_orbits_dataframe,
    zoom_duration_minutes: float,
    y_axis_scale: str,
    z_axis_scale: str,
    instrument_order: tuple[str, ...],
    colormap: str,
    output_base_directory: str,
    orbit_timeout_seconds: int | float = 60,
    instrument_timeout_seconds: int | float = 30,
    global_extrema: dict[str, int | float] | None = None,
    override_plots: bool = True,
    cusp_marker_style: str = "both",
    cusp_marker_kwargs: dict | None = None,
) -> dict[str, Any]:
    """Process and save all ESA spectrogram plots for a single orbit.

    Returns a result dict with keys ``orbit``, ``status``
    (``'ok'``/``'error'``/``'timeout'``), ``errors`` (list of str), and
    optionally ``timeout_type``/``timeout_instrument`` -- the schema the
    batch driver's progress taxonomy consumes
    (reference fast/process_orbit.py:85-92,285-290).
    """
    result: dict[str, Any] = {"orbit": orbit_number, "status": "ok", "errors": []}
    orbit_start_time = _time.time()
    timeout_triggered = False
    timeout_type = None
    timeout_instrument = None

    def _save_figures(figs: list[tuple[object, str, str]]) -> None:
        """Render and save a group of figures in one pooled device batch."""
        from configurable_spectrograms_tpu.render.figure import render_figures

        to_render = []
        for fig, out_path, desc in figs:
            if not override_plots and os.path.exists(out_path):
                log_exception(f"[SKIP] Plot already exists, skipping: {out_path}", level="message")
                close_all_axes_and_clear(fig)
                continue
            to_render.append((fig, out_path, desc))
        if not to_render:
            return
        try:
            images = render_figures([fig for fig, _, _ in to_render], dpi=FAST_SAVE_DPI)
        except Exception as exc:
            log_exception("[FAIL] Rendering figure batch", exc, level="error")
            result["status"] = "error"
            result["errors"].append(str(exc))
            for fig, _, _ in to_render:
                close_all_axes_and_clear(fig)
            return
        for (fig, out_path, desc), image in zip(to_render, images):
            try:
                log_exception(
                    f"[DEBUG] Saving {desc} plot: y_axis_scale={y_axis_scale}, "
                    f"z_axis_scale={z_axis_scale}, filename={out_path}",
                    level="message",
                )
                image.save(out_path, format="PNG", compress_level=3)
                log_exception(f"[SAVED] {out_path}", level="message")
            except Exception as exc:
                log_exception(f"[FAIL] Saving figure {out_path}", exc, level="error")
                result["status"] = "error"
                result["errors"].append(str(exc))
            finally:
                close_all_axes_and_clear(fig)

    try:
        first_path = next(
            (instrument_file_paths[k] for k in DEFAULT_INSTRUMENT_ORDER if k in instrument_file_paths),
            None,
        )
        year, month = parse_year_month(first_path) if first_path else ("unknown", "unknown")
        output_dir = os.path.join(output_base_directory, str(year), str(month), str(orbit_number))
        os.makedirs(output_dir, exist_ok=True)

        for inst_type in DEFAULT_INSTRUMENT_ORDER:
            if timeout_triggered:
                break
            cdf_path = instrument_file_paths.get(inst_type)
            if not cdf_path:
                continue
            inst_start = _time.time()
            try:
                inst_detected = get_cdf_file_type(cdf_path)
                if inst_detected is None or inst_detected == "orb":
                    continue
                time_unix_array = load_fast_cdf_dataset(cdf_path)["times"]
                vertical_lines = get_timestamps_for_orbit(
                    filtered_orbits_dataframe, orbit_number, inst_detected, time_unix_array
                )
                cusp_tag = "_cusp" if vertical_lines else ""
                y_min_ov, y_max_ov, z_min_ov, z_max_ov = extrema_overrides(
                    global_extrema, inst_detected, y_axis_scale, z_axis_scale
                )

                pending: list[tuple[object, str, str]] = []
                for variant, bounds in (
                    ("given_extrema", (y_min_ov, y_max_ov, z_min_ov, z_max_ov)),
                    ("raw", (None, None, None, None)),
                ):
                    fig, _canvas = FAST_plot_pitch_angle_grid(
                        cdf_path,
                        filtered_orbits_df=filtered_orbits_dataframe,
                        orbit_number=orbit_number,
                        zoom_duration_minutes=zoom_duration_minutes,
                        scale_function_y=y_axis_scale,
                        scale_function_z=z_axis_scale,
                        show=False,
                        colormap=colormap,
                        y_min=bounds[0],
                        y_max=bounds[1],
                        z_min=bounds[2],
                        z_max=bounds[3],
                        cusp_marker_style=cusp_marker_style,
                        cusp_marker_kwargs=cusp_marker_kwargs,
                    )
                    if fig is not None:
                        fname = (
                            f"{orbit_number}{cusp_tag}_pitch-angle_ESA_{inst_detected}"
                            f"_y-{y_axis_scale}_z-{z_axis_scale}_{variant}-{colormap}.png"
                        )
                        pending.append(
                            (
                                fig,
                                os.path.join(output_dir, fname),
                                f"pitch-angle {inst_detected} ({variant.replace('_', ' ')})",
                            )
                        )
                _save_figures(pending)

            except Exception as exc:
                err = f"[FAIL] Plotting Orbit {orbit_number} pitch angle grid for {inst_type}"
                log_exception(err, exc, level="error")
                result["status"] = "error"
                result["errors"].append(err)
            finally:
                inst_elapsed = _time.time() - inst_start
                log_exception(
                    f"[TIMING] Orbit {orbit_number} instrument {inst_type} elapsed {inst_elapsed:.3f}s",
                    level="message",
                )
                if inst_elapsed > instrument_timeout_seconds and not timeout_triggered:
                    timeout_triggered = True
                    timeout_type = "instrument"
                    timeout_instrument = inst_type
                    log_exception(
                        f"[TIMEOUT] Instrument {inst_type} in orbit {orbit_number} exceeded "
                        f"{instrument_timeout_seconds:.0f}s ({inst_elapsed:.2f}s). Aborting.",
                        level="message",
                    )

        if not timeout_triggered:
            grid_start = _time.time()
            try:
                pending = []
                for variant, extrema in (("given_extrema", global_extrema), ("raw", None)):
                    fig, _canvas = FAST_plot_instrument_grid(
                        instrument_file_paths,
                        filtered_orbits_df=filtered_orbits_dataframe,
                        orbit_number=orbit_number,
                        zoom_duration_minutes=zoom_duration_minutes,
                        scale_function_y=y_axis_scale,
                        scale_function_z=z_axis_scale,
                        instrument_order=instrument_order,
                        show=False,
                        colormap=colormap,
                        global_extrema=extrema,
                        cusp_marker_style=cusp_marker_style,
                        cusp_marker_kwargs=cusp_marker_kwargs,
                    )
                    if fig is not None:
                        fname = (
                            f"{orbit_number}_instrument-grid_ESA_y-{y_axis_scale}_z-{z_axis_scale}"
                            f"_{variant}-{colormap}.png"
                        )
                        pending.append((fig, os.path.join(output_dir, fname), f"instrument-grid ({variant})"))
                _save_figures(pending)
            except Exception as exc:
                err = f"[FAIL] Plotting Orbit {orbit_number} instrument grid"
                log_exception(err, exc, level="error")
                result["status"] = "error"
                result["errors"].append(err)
            finally:
                grid_elapsed = _time.time() - grid_start
                log_exception(
                    f"[TIMING] Orbit {orbit_number} instrument-grid elapsed {grid_elapsed:.3f}s",
                    level="message",
                )
                if grid_elapsed > instrument_timeout_seconds and not timeout_triggered:
                    timeout_triggered = True
                    timeout_type = "instrument"
                    timeout_instrument = "instrument_grid"
                    log_exception(
                        f"[TIMEOUT] Instrument grid in orbit {orbit_number} exceeded "
                        f"{instrument_timeout_seconds:.0f}s ({grid_elapsed:.2f}s). Aborting.",
                        level="message",
                    )

        orbit_elapsed = _time.time() - orbit_start_time
        if orbit_elapsed > orbit_timeout_seconds and not timeout_triggered:
            timeout_triggered = True
            timeout_type = "orbit"
            log_exception(
                f"[TIMEOUT] Orbit {orbit_number} exceeded {orbit_timeout_seconds:.0f}s total "
                f"({orbit_elapsed:.2f}s).",
                level="message",
            )

        if timeout_triggered:
            result["status"] = "timeout"
            result["timeout_type"] = timeout_type
            if timeout_instrument:
                result["timeout_instrument"] = timeout_instrument
            return result

    except Exception as exc:
        err = f"[FAIL] Orbit {orbit_number} processing"
        log_exception(err, exc, level="error")
        result["status"] = "error"
        result["errors"].append(err)
    finally:
        gc.collect()

    return result
