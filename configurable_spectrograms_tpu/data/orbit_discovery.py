"""FAST orbit/instrument file discovery and progress-key bookkeeping.

Behavioral parity with reference fast/orbit_discovery.py:12-250.
"""

from __future__ import annotations

import os
from collections import defaultdict
from pathlib import Path

from configurable_spectrograms_tpu.data.cdf_utils import get_cdf_file_type
from configurable_spectrograms_tpu.utils.logging import log_exception

DEFAULT_INSTRUMENT_ORDER = ("ees", "eeb", "ies", "ieb")


def parse_year_month(file_path: str) -> tuple[str, str]:
    """Extract ``(year, month)`` from a CDF path containing a YYYY/MM pair.

    Examples
    --------
    >>> parse_year_month("./FAST_data/2000/01/fa_esa_l2_eeb_20000101001737_13312_v02.cdf")
    ('2000', '01')
    >>> parse_year_month("no_year_here.cdf")
    ('unknown', 'unknown')
    """
    parts = Path(file_path).parts
    for i, part in enumerate(parts):
        if part.isdigit() and len(part) == 4:
            nxt = parts[i + 1] if i + 1 < len(parts) else ""
            month = nxt if nxt.isdigit() and len(nxt) == 2 else "unknown"
            return part, month
    return "unknown", "unknown"


def classify_error_reason(msg: str) -> str:
    """Map an error message to a short reason token for progress JSON keys.

    Examples
    --------
    >>> classify_error_reason("divide by zero encountered")
    'divide-by-zero'
    >>> classify_error_reason("Timeout while processing orbit")
    'timeout'
    >>> classify_error_reason("something else entirely")
    'generic'
    """
    lowered = msg.lower()
    if "divide" in lowered and "zero" in lowered:
        return "divide-by-zero"
    if "invalid" in lowered and "cdf" in lowered:
        return "invalid-cdf"
    if "timeout" in lowered:
        return "timeout"
    if "plot" in lowered:
        return "plotting"
    return "generic"


def extract_orbit_and_instrument(cdf_path: str) -> tuple[int, str, str] | None:
    """Parse a CDF filename to ``(orbit_number, instrument_type, cdf_path)``.

    Returns ``None`` when the filename doesn't match the FAST pattern, the
    orbit number can't be parsed, or the type is missing / ``'orb'``.

    Examples
    --------
    >>> extract_orbit_and_instrument("fa_esa_l2_eeb_20000101001737_13312_v02.cdf")
    (13312, 'eeb', 'fa_esa_l2_eeb_20000101001737_13312_v02.cdf')
    >>> extract_orbit_and_instrument("fa_k0_orb_13312_v01.cdf") is None
    True
    """
    filename = os.path.basename(cdf_path)
    parts = filename.split("_")
    if len(parts) < 5:
        return None
    try:
        orbit_number = int(parts[-2])
    except ValueError as exc:
        log_exception(f"[ERROR] Invalid orbit number in filename: {filename}", exc, level="message")
        return None
    instrument_type = get_cdf_file_type(cdf_path)
    if instrument_type is None or instrument_type == "orb":
        return None
    return (orbit_number, instrument_type, cdf_path)


def discover_orbit_files(
    directory_path: str, instrument_order: tuple[str, ...] = DEFAULT_INSTRUMENT_ORDER
) -> dict[int, dict[str, str]]:
    """Discover FAST instrument CDF files and group them by orbit.

    Walks *directory_path* recursively for non-``_orb_`` CDF files and
    groups them into ``{orbit: {instrument: path}}`` (last seen wins on
    duplicates), matching reference fast/orbit_discovery.py:129-166.
    """
    orbit_to_instruments: dict[int, dict[str, str]] = defaultdict(dict)
    for path_obj in Path(directory_path).rglob("*.[cC][dD][fF]"):
        candidate_path = str(path_obj)
        if "_orb_" in candidate_path.lower():
            continue
        parsed = extract_orbit_and_instrument(candidate_path)
        if parsed is None:
            continue
        orbit_number, instrument_type, cdf_path = parsed
        if instrument_type not in instrument_order:
            continue
        orbit_to_instruments[orbit_number][instrument_type] = cdf_path
    return dict(orbit_to_instruments)


def resolve_shared_orbit(instrument_day_files: dict[str, list[str]]) -> tuple[int | None, dict[str, str]]:
    """Pick one orbit's worth of files out of a day's CDFs.

    Resolves to the orbit shared by the most instruments; ties break toward
    the lowest orbit number (reference fast/orbit_discovery.py:169-216).

    Examples
    --------
    >>> resolve_shared_orbit({
    ...     "eeb": ["fa_esa_l2_eeb_20000101001737_100_v02.cdf",
    ...             "fa_esa_l2_eeb_20000101031737_101_v02.cdf"],
    ...     "ies": ["fa_esa_l2_ies_20000101001738_100_v02.cdf"],
    ... })
    (100, {'eeb': 'fa_esa_l2_eeb_20000101001737_100_v02.cdf', 'ies': 'fa_esa_l2_ies_20000101001738_100_v02.cdf'})
    >>> resolve_shared_orbit({"eeb": [], "ies": []})
    (None, {})
    """
    orbit_to_instruments: dict[int, dict[str, str]] = {}
    for file_paths in instrument_day_files.values():
        for file_path in file_paths:
            parsed = extract_orbit_and_instrument(file_path)
            if parsed is None:
                continue
            orbit_number, instrument_type, cdf_path = parsed
            orbit_to_instruments.setdefault(orbit_number, {})[instrument_type] = cdf_path
    if not orbit_to_instruments:
        return None, {}
    best_orbit = max(orbit_to_instruments, key=lambda orbit: (len(orbit_to_instruments[orbit]), -orbit))
    return best_orbit, orbit_to_instruments[best_orbit]


def resolve_orbit_from_files(instrument_files: dict[str, str]) -> int | None:
    """Best-effort orbit number for a caller-assembled instrument file map.

    Examples
    --------
    >>> resolve_orbit_from_files({"eeb": "fa_esa_l2_eeb_20000101001737_13312_v02.cdf"})
    13312
    >>> resolve_orbit_from_files({"eeb": "not_a_fast_file.cdf"}) is None
    True
    """
    for file_path in instrument_files.values():
        parsed = extract_orbit_and_instrument(file_path)
        if parsed is not None:
            return parsed[0]
    return None
