"""Global axis-extrema computation for FAST batch plotting.

:func:`compute_global_extrema` performs a resumable pass over instrument
CDF files to determine shared axis limits before the main plotting pass,
with the exact JSON cache contract of the reference
(reference fast/extrema.py:73-366): value keys
``{inst}_{y}_{z}_{y|z}_{min|max}``, per-instrument
``{...}_extrema_progress`` entries, a ``{y}_{z}_last_orbit`` resume cursor
ordered first in the file, linear_linear reuse with log transform, monotone
non-decreasing maxima, the 4000 energy cap, and batched flushing.

The per-file math runs on device (batched across an orbit's instruments,
:mod:`configurable_spectrograms_tpu.ops.extrema_ops`); pooled-percentile
z-maxima come from a mergeable log-histogram (bounded <1.4%% relative
error, then ceil'd as the reference does) instead of the reference's
O(total-samples) in-memory pooling, so the pass scales to full archives
and shards across a mesh.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any

import numpy as np

from configurable_spectrograms_tpu.data.cdf_utils import load_fast_cdf_dataset
from configurable_spectrograms_tpu.data.orbit_discovery import discover_orbit_files
from configurable_spectrograms_tpu.fast.constants import FAST_EXTREMA_JSON_PATH
from configurable_spectrograms_tpu.ops.extrema_ops import HIST_BINS, batched_file_stats, hist_percentile
from configurable_spectrograms_tpu.utils.logging import log_exception
from configurable_spectrograms_tpu.utils.percentiles import round_extrema


def extrema_overrides(
    global_extrema: dict | None,
    inst: str,
    y_scale: str,
    z_scale: str,
) -> tuple[float | None, float | None, float | None, float | None]:
    """Extract and round per-instrument axis limits from an extrema dict.

    Parity with reference fast/extrema.py:26-70.

    Examples
    --------
    >>> extrema = {"ees_linear_linear_y_max": 1234, "ees_linear_linear_z_min": 0.0123}
    >>> extrema_overrides(extrema, "ees", "linear", "linear")
    (None, 1300.0, 0.012, None)
    >>> extrema_overrides(None, "ees", "linear", "linear")
    (None, None, None, None)
    """
    if not isinstance(global_extrema, dict):
        return None, None, None, None
    key_prefix = f"{inst}_{y_scale}_{z_scale}"

    def _rounded(value: float | None, direction: str) -> float | None:
        return round_extrema(value, direction) if value is not None else None

    return (
        _rounded(global_extrema.get(f"{key_prefix}_y_min"), "down"),
        _rounded(global_extrema.get(f"{key_prefix}_y_max"), "up"),
        _rounded(global_extrema.get(f"{key_prefix}_z_min"), "down"),
        _rounded(global_extrema.get(f"{key_prefix}_z_max"), "up"),
    )


def _ordered_with_cursor_first(state: dict[str, Any], cursor_key: str) -> dict[str, Any]:
    if cursor_key not in state:
        return state
    ordered = {cursor_key: state[cursor_key]}
    ordered.update({k: v for k, v in state.items() if k != cursor_key})
    return ordered


def compute_global_extrema(
    directory_path: str,
    y_scale: str,
    z_scale: str,
    instrument_order,
    extrema_json_path: str = FAST_EXTREMA_JSON_PATH,
    compute_mins: bool = False,
    max_percentile: float = 95.0,
    log_floor_cutoff: float = 0.1,
    log_floor_value: float = -1.0,
    flush_batch_size: int = 10,
) -> dict[str, Any]:
    """Compute (or incrementally update) cached axis extrema per instrument.

    Extrema logic (identical to the reference's, fast/extrema.py:92-120):
    y minima fixed to 0 unless ``compute_mins``; linear y maxima = smallest
    energy reaching 99%% cumulative positive coverage; linear z maxima =
    ``max_percentile`` of pooled positive samples; log scales derive from
    cached linear_linear values via log10 with the
    ``log_floor_cutoff``/``log_floor_value`` floor; maxima are monotone
    non-decreasing across incremental updates and energy is capped at 4000;
    everything is ceil'd.  Progress flushes to ``extrema_json_path`` every
    ``flush_batch_size`` orbits with a final guaranteed flush.
    """
    instrument_order = tuple(instrument_order)
    flush_batch_size = max(1, int(flush_batch_size))
    state: dict[str, Any] = {}
    if os.path.exists(extrema_json_path):
        try:
            with open(extrema_json_path) as f:
                state = json.load(f)
        except (OSError, json.JSONDecodeError) as exc:
            log_exception(
                f"[EXTREMA] Failed to read existing extrema JSON '{extrema_json_path}' (starting fresh)",
                exc,
                level="message",
            )
            state = {}

    def _safe_log(value) -> float:
        if value is None:
            return float(log_floor_value)
        try:
            v = float(value)
        except (TypeError, ValueError):
            return float(log_floor_value)
        if not np.isfinite(v) or v <= log_floor_cutoff:
            return float(log_floor_value)
        return float(np.log10(v))

    def _flush(force: bool = False) -> None:
        try:
            with open(extrema_json_path, "w") as f:
                json.dump(_ordered_with_cursor_first(state, cursor_key), f, indent=2)
        except OSError as exc:
            log_exception("[EXTREMA] Failed to save extrema JSON", exc, level="message")

    orbit_map = discover_orbit_files(directory_path, instrument_order)
    sorted_orbits = sorted(orbit_map.keys())
    totals = {
        inst: sum(1 for o in sorted_orbits if inst in orbit_map[o]) for inst in instrument_order
    }

    cursor_key = f"{y_scale}_{z_scale}_last_orbit"
    last_val = state.get(cursor_key, -1)
    last_orbit = int(last_val) if isinstance(last_val, (int, float)) else -1

    # --- linear_linear reuse: copy or log-transform without rescanning -----
    active_insts = []
    for inst in instrument_order:
        key_prefix = f"{inst}_{y_scale}_{z_scale}"
        progress_key = f"{key_prefix}_extrema_progress"
        entry = state.get(progress_key)
        if isinstance(entry, dict) and entry.get("complete"):
            continue
        ll_y = f"{inst}_linear_linear_y_max"
        ll_z = f"{inst}_linear_linear_z_max"
        if y_scale != "log" and ll_y in state:
            state[f"{key_prefix}_y_max"] = state[ll_y]
            state[f"{key_prefix}_y_min"] = state.get(f"{inst}_linear_linear_y_min", 0)
        elif y_scale == "log" and ll_y in state:
            state[f"{key_prefix}_y_max"] = _safe_log(state[ll_y])
            state[f"{key_prefix}_y_min"] = log_floor_value
        if z_scale != "log" and ll_z in state:
            state[f"{key_prefix}_z_max"] = state[ll_z]
            state[f"{key_prefix}_z_min"] = state.get(f"{inst}_linear_linear_z_min", 0)
        elif z_scale == "log" and ll_z in state:
            state[f"{key_prefix}_z_max"] = _safe_log(state[ll_z])
            state[f"{key_prefix}_z_min"] = log_floor_value
        if ll_y in state and ll_z in state:
            state[progress_key] = {
                "processed_index": max(totals[inst] - 1, -1),
                "total": totals[inst],
                "complete": True,
            }
            state[cursor_key] = max(sorted_orbits) if sorted_orbits else -1
            _flush(force=True)
            continue
        active_insts.append(inst)

    if not active_insts:
        return _ordered_with_cursor_first(state, cursor_key)

    # --- incremental scan (device-reduced, chunked across orbits) -----------
    energy_counts: dict[str, dict[float, int]] = {inst: {} for inst in active_insts}
    hists: dict[str, np.ndarray] = {inst: np.zeros(HIST_BINS, np.int64) for inst in active_insts}
    orbits_since_flush = 0

    pending_indexed = [(i, o) for i, o in enumerate(sorted_orbits) if o > last_orbit]
    try:
        from tqdm import tqdm

        bar = tqdm(total=len(pending_indexed), desc=f"Extrema {y_scale}/{z_scale}", unit="orbit",
                   leave=False, disable=(len(pending_indexed) == 0))
    except Exception:
        bar = None

    # Orbits per device dispatch: wide enough to fill every mesh device
    # with one file (and to amortize dispatch latency on one chip), capped
    # by the flush cadence so resume granularity is unchanged.
    from configurable_spectrograms_tpu.parallel.mesh import data_parallel_mesh

    mesh = data_parallel_mesh()
    n_devices = int(mesh.devices.size) if mesh is not None else 1
    chunk_orbits = max(1, -(-n_devices * 2 // max(1, len(active_insts))))
    chunk_orbits = min(chunk_orbits, flush_batch_size)

    def _update_state_for_orbit(orbit_index: int, orbit: int) -> None:
        """Derive and store the post-orbit extrema for every active instrument
        (identical math to the reference's per-orbit update,
        reference fast/extrema.py:245-322)."""
        for inst in active_insts:
            key_prefix = f"{inst}_{y_scale}_{z_scale}"
            try:
                counts_map = energy_counts[inst]
                candidate_e = 0.0
                if counts_map:
                    es = sorted(counts_map)
                    cum = np.cumsum([counts_map[e] for e in es])
                    target = 0.99 * cum[-1]
                    idx = min(int(np.searchsorted(cum, target, side="right")), len(es) - 1)
                    candidate_e = float(es[idx])
                candidate_z = hist_percentile(hists[inst], max_percentile)

                prev_e = state.get(f"{key_prefix}_y_max")
                prev_z = state.get(f"{key_prefix}_z_max")
                merged_e = max(float(prev_e), candidate_e) if isinstance(prev_e, (int, float)) else candidate_e
                merged_z = max(float(prev_z), candidate_z) if isinstance(prev_z, (int, float)) else candidate_z
                merged_e = int(min(4000, math.ceil(merged_e)))
                merged_z = float(math.ceil(merged_z))

                if compute_mins and hists[inst].sum() > 0:
                    z_min_store = hist_percentile(hists[inst], 1.0)
                else:
                    z_min_store = 0
                state[f"{key_prefix}_y_min"] = 0
                state[f"{key_prefix}_y_max"] = merged_e
                state[f"{key_prefix}_z_min"] = z_min_store
                state[f"{key_prefix}_z_max"] = merged_z
                state[f"{key_prefix}_extrema_progress"] = {
                    "processed_index": orbit_index,
                    "total": totals[inst],
                    "complete": orbit_index + 1 >= totals[inst],
                }
                state[cursor_key] = orbit
            except Exception as exc:
                log_exception(
                    f"[EXTREMA] Update failure inst={inst} orbit={orbit}",
                    exc,
                    level="message",
                )

    try:
        for c0 in range(0, len(pending_indexed), chunk_orbits):
            chunk = pending_indexed[c0 : c0 + chunk_orbits]
            # Load every active instrument's file for the chunk's orbits and
            # reduce them in ONE device dispatch (sharded over the mesh).
            loaded: list[tuple[int, str, np.ndarray, np.ndarray]] = []
            for _, orbit in chunk:
                for inst in active_insts:
                    path = orbit_map.get(orbit, {}).get(inst)
                    if path is None:
                        continue
                    try:
                        ds = load_fast_cdf_dataset(path)
                        loaded.append((orbit, inst, ds["data"].astype(np.float32, copy=False), ds["energy"]))
                    except Exception as exc:
                        log_exception(
                            f"[EXTREMA] Ingest failure inst={inst} orbit={orbit} file={path}",
                            exc,
                            level="message",
                        )
            stats = batched_file_stats([cube for _, _, cube, _ in loaded])
            stats_by_orbit: dict[int, list] = {}
            for (orbit, inst, _cube, energy), st in zip(loaded, stats):
                stats_by_orbit.setdefault(orbit, []).append((inst, energy, st))

            # Fold chunk results orbit by orbit IN ORDER so the monotone
            # merge and cursor semantics match the sequential scan exactly.
            for orbit_index, orbit in chunk:
                for inst, energy, st in stats_by_orbit.get(orbit, []):
                    counts_map = energy_counts[inst]
                    for e_val, cnt in zip(energy, st["counts"]):
                        if cnt:
                            counts_map[float(e_val)] = counts_map.get(float(e_val), 0) + int(cnt)
                    hists[inst] += st["hist"].astype(np.int64)
                _update_state_for_orbit(orbit_index, orbit)
                if bar is not None:
                    bar.update(1)
                orbits_since_flush += 1
            if orbits_since_flush >= flush_batch_size:
                _flush(force=True)
                orbits_since_flush = 0

        if orbits_since_flush > 0:
            _flush(force=True)
    finally:
        if bar is not None:
            bar.close()

    return _ordered_with_cursor_first(state, cursor_key)
