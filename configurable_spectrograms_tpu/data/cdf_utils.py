"""CDF file discovery, metadata, and dataset-loading helpers.

Shared by both the generic and FAST-specific plotting/batch pipelines so
that file-type detection, orbit-boundary lookup, and CDF loading logic
exists in exactly one place.  Behavioral parity with reference
cdf_utils.py:26-256, built on this package's own CDF reader instead of
cdflib.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd

from configurable_spectrograms_tpu.constants import (
    CDF_DATA_DIRECTORY,
    CDF_VARIABLE_NAMES,
    FILTERED_ORBITS_CSV_PATH,
)
from configurable_spectrograms_tpu.data.cdf import CDF
from configurable_spectrograms_tpu.utils.logging import log_error, log_message

# Module-level caches to avoid repeated disk I/O in batch routines.
filtered_orbits_cache: dict[str, pd.DataFrame | None] = {}
orbit_column_cache: dict[tuple[int, str], tuple[str, str, str]] = {}
cdf_type_cache: dict[str, str | None] = {}

INSTRUMENT_TAGS = ("ees", "eeb", "ies", "ieb")


def load_filtered_orbits(csv_path: str = FILTERED_ORBITS_CSV_PATH) -> pd.DataFrame | None:
    """Load the filtered (cusp) orbits TSV with a simple module-level cache.

    The file uses tab separators despite the ``.csv`` suffix
    (reference cdf_utils.py:47).  Returns ``None`` when loading fails.
    """
    if csv_path in filtered_orbits_cache:
        return filtered_orbits_cache[csv_path]
    try:
        dataframe = pd.read_csv(csv_path, sep="\t")
    except OSError as exc:
        log_error(f"Error loading CSV {csv_path}: {exc}")
        return None
    filtered_orbits_cache[csv_path] = dataframe
    return dataframe


def get_timestamps_for_orbit(
    filtered_orbits_dataframe: pd.DataFrame | None,
    orbit_number: int,
    instrument_type: str | None,
    time_unix_array: np.ndarray | None,
) -> list[float]:
    """Compute orbit boundary UNIX timestamps from filtered min/max indices.

    Returns one timestamp for a degenerate (equal) min/max index pair, two
    (start, end) otherwise, and ``[]`` when the orbit is missing or inputs
    are incomplete.  Indices are clamped into the time array's bounds
    (reference cdf_utils.py:55-123).

    Examples
    --------
    >>> import pandas as pd
    >>> import numpy as np
    >>> orbits = pd.DataFrame({"orbit": [42], "ees min index": [1], "ees max index": [3]})
    >>> times = np.array([100.0, 200.0, 300.0, 400.0])
    >>> get_timestamps_for_orbit(orbits, 42, "ees", times)
    [200.0, 400.0]
    >>> get_timestamps_for_orbit(orbits, 99, "ees", times)
    []
    """
    dataframe = filtered_orbits_dataframe
    if dataframe is None or instrument_type is None or time_unix_array is None:
        return []
    cache_key = (id(dataframe), instrument_type)
    if cache_key not in orbit_column_cache:
        orbit_column = next(col for col in dataframe.columns if "orbit" in col.lower())
        min_index_column = next(
            col for col in dataframe.columns if instrument_type in col.lower() and "min index" in col.lower()
        )
        max_index_column = next(
            col for col in dataframe.columns if instrument_type in col.lower() and "max index" in col.lower()
        )
        orbit_column_cache[cache_key] = (orbit_column, min_index_column, max_index_column)
    orbit_column, min_index_column, max_index_column = orbit_column_cache[cache_key]
    row = dataframe[dataframe[orbit_column] == orbit_number]
    if row.empty:
        return []
    try:
        min_index = int(row.iloc[0][min_index_column])
        max_index = int(row.iloc[0][max_index_column])
    except (TypeError, ValueError):
        log_message("[WARN] Non-integer indices found in orbit row, using 0.")
        return []
    min_index = max(0, min(min_index, len(time_unix_array) - 1))
    max_index = max(0, min(max_index, len(time_unix_array) - 1))
    if min_index == max_index:
        return [float(time_unix_array[min_index])]
    return [float(time_unix_array[min_index]), float(time_unix_array[max_index])]


def get_cdf_file_type(cdf_file_path: str) -> str | None:
    """Infer instrument type from a CDF file path.

    Examples
    --------
    >>> get_cdf_file_type("fa_esa_l2_eeb_20000101001737_13312_v02.cdf")
    'eeb'
    >>> get_cdf_file_type("fa_k0_orb_13312_v01.cdf")
    'orb'
    """
    path_lower = cdf_file_path.lower()
    if "_orb_" in path_lower:
        return "orb"
    for tag in INSTRUMENT_TAGS:
        if f"_{tag}_" in path_lower:
            return tag
    log_error(f"Unknown CDF file type for path: {cdf_file_path}")
    return None


def get_variable_shape(cdf_path: str, variable_name: str) -> tuple[int, ...] | None:
    """Return the shape of a variable in a CDF file (or ``None`` on failure)."""
    instrument_type = cdf_type_cache.get(cdf_path)
    if instrument_type is None:
        instrument_type = get_cdf_file_type(cdf_path)
        cdf_type_cache[cdf_path] = instrument_type
    if instrument_type is None or instrument_type == "orb":
        return None
    try:
        with CDF(cdf_path) as cdf:
            variable_data = cdf.varget(variable_name)
            return variable_data.shape if isinstance(variable_data, np.ndarray) else None
    except Exception as exc:
        log_error(f"Error reading {cdf_path} for variable {variable_name}: {exc}")
        return None


def get_cdf_var_shapes(
    cdf_folder_path: str = CDF_DATA_DIRECTORY,
    variable_names: list[str] = CDF_VARIABLE_NAMES,
) -> dict[str, list[tuple[int, ...] | None]]:
    """Collect shapes of *variable_names* across all CDF files under a folder."""
    from tqdm import tqdm

    cdf_file_paths = [str(p) for p in Path(cdf_folder_path).rglob("*.[cC][dD][fF]")]
    shapes_by_variable: dict[str, list[tuple[int, ...] | None]] = {}
    for variable_name in variable_names:
        shapes_by_variable[variable_name] = [
            get_variable_shape(cdf_path, variable_name)
            for cdf_path in tqdm(
                cdf_file_paths,
                desc=f"Processing CDF files ({variable_name})",
                unit="file",
                total=len(cdf_file_paths),
            )
        ]
    return shapes_by_variable


_dataset_cache: dict[tuple, dict[str, np.ndarray]] = {}
_DATASET_CACHE_MAX = 8


def load_fast_cdf_dataset(
    cdf_path: str, variable_names: tuple[str, ...] = tuple(CDF_VARIABLE_NAMES)
) -> dict[str, np.ndarray]:
    """Load and reshape a FAST CDF file's time/data/energy/pitch-angle arrays.

    Energy and pitch-angle are collapsed from their raw
    ``(time, angle, energy)`` / ``(time, energy, angle)`` storage down to 1D
    bin arrays, and ``data`` is transposed to ``(time, pitch_angle, energy)``
    when stored ``(time, energy, pitch_angle)`` so the result is ready to
    collapse along pitch angle (reference cdf_utils.py:222-256).

    A small (path, mtime)-keyed cache holds the most recent files: the FAST
    per-orbit worker reads each instrument file three times (timestamps,
    given-extrema grid, raw grid; reference fast/process_orbit.py:148-253),
    and returning the *same* contiguous arrays also lets the device batcher
    recognize and upload a shared cube once.  Treat the returned arrays as
    read-only.
    """
    try:
        mtime = os.path.getmtime(cdf_path)
    except OSError:
        mtime = None
    key = (cdf_path, mtime, tuple(variable_names))
    if mtime is not None and key in _dataset_cache:
        return _dataset_cache[key]
    with CDF(cdf_path) as cdf_file:
        times = np.asarray(cdf_file.varget(variable_names[0]))
        data = np.asarray(cdf_file.varget(variable_names[1]))
        energy_full = np.asarray(cdf_file.varget(variable_names[2]))
        pitch_angle_full = np.asarray(cdf_file.varget(variable_names[3]))
    energy = energy_full[0, 0, :] if energy_full.ndim == 3 else energy_full
    pitch_angle = pitch_angle_full[0, :, 0] if pitch_angle_full.ndim == 3 else pitch_angle_full
    if data.shape[1] == len(energy) and data.shape[2] == len(pitch_angle):
        data = np.transpose(data, (0, 2, 1))
    data = np.ascontiguousarray(data, dtype=np.float32)
    result = {"times": times, "data": data, "energy": energy, "pitch_angle": pitch_angle}
    if mtime is not None:
        if len(_dataset_cache) >= _DATASET_CACHE_MAX:
            _dataset_cache.pop(next(iter(_dataset_cache)))
        _dataset_cache[key] = result
    return result
