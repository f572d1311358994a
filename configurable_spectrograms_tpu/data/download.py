"""FAST ESA CDF downloading from CDA Web: single-day, single-year, threaded batch.

Behavioral parity with reference download.py:16-297.  ``requests`` and
``beautifulsoup4`` are imported lazily so the rest of the package works in
network-free environments; download calls raise a clear ImportError if the
optional dependencies are missing.
"""

from __future__ import annotations

import calendar
import datetime as dt
import functools
import os
from concurrent.futures import ThreadPoolExecutor

from configurable_spectrograms_tpu.batch_runner import run_batch
from configurable_spectrograms_tpu.utils.logging import log_error

FAST_ESA_BASE_URL: str = "https://cdaweb.gsfc.nasa.gov/pub/data/fast/esa/l2"
INSTRUMENT_OPTIONS: set[str] = {"eeb", "ees", "ieb", "ies"}  # "esv" also exists for FAST
DEFAULT_INSTRUMENT_LIST: list[str] = sorted(INSTRUMENT_OPTIONS)
DEFAULT_YEAR: int = 2000
DEFAULT_FOLDER: str = "./FAST_data/"
#: Earliest and latest calendar days with any FAST ESA CDF coverage on CDA Web.
FAST_MIN_DATE: dt.date = dt.date(1996, 8, 21)
FAST_MAX_DATE: dt.date = dt.date(2009, 5, 4)


def _requests():
    try:
        import requests

        return requests
    except ImportError as exc:  # pragma: no cover - environment dependent
        raise ImportError("the 'requests' package is required for downloading") from exc


def _download_single_cdf_file(download_link: str, output_file: str) -> None:
    """Stream one CDF file to disk; non-streamed fallback without Content-Length."""
    requests = _requests()
    response = requests.get(download_link, stream=True)
    if response.headers.get("content-length") is None:
        with open(output_file, "wb") as f:
            f.write(response.content)
        return
    with open(output_file, "wb") as f:
        for chunk in response.iter_content(chunk_size=4096):
            f.write(chunk)


def _list_instrument_page_files(page: str) -> list[str]:
    """Scrape one CDA Web month-listing page for linked ``.cdf`` file names."""
    requests = _requests()
    from bs4 import BeautifulSoup

    response = requests.get(page)
    soup = BeautifulSoup(response.content, "html.parser")
    return [href for a in soup.find_all("a") if isinstance(href := a.get("href"), str) and ".cdf" in href]


def _matches_day(file_name: str, instrument: str, date_str: str) -> bool:
    """Whether *file_name* is a FAST ESA CDF for *instrument* on *date_str*.

    Examples
    --------
    >>> _matches_day("fa_esa_l2_eeb_20000101001737_13312_v02.cdf", "eeb", "20000101")
    True
    >>> _matches_day("fa_esa_l2_eeb_20000102001737_13313_v02.cdf", "eeb", "20000101")
    False
    >>> _matches_day("fa_esa_l2_ies_20000101001737_13312_v02.cdf", "eeb", "20000101")
    False
    """
    return file_name.endswith(".cdf") and f"_{instrument}_{date_str}" in file_name


def download_single_day_cdf(
    date: dt.date,
    instruments: list[str] = DEFAULT_INSTRUMENT_LIST,
    base_url: str = FAST_ESA_BASE_URL,
    data_folder: str = DEFAULT_FOLDER,
    _page_file_names: dict[str, list[str]] | None = None,
) -> dict[str, list[str]]:
    """Download every FAST ESA CDF for one calendar day, per instrument.

    Files land under ``{data_folder}/{year}/{month:02d}/``; already-present
    files are not re-downloaded.  ``_page_file_names`` lets the year loop
    reuse one scraped month listing (reference download.py:84-143).
    Returns ``{instrument: [local paths]}``.
    """
    web_folder = f"{date.month:02d}"
    date_str = date.strftime("%Y%m%d")
    fast_data_folder = f"{data_folder}/{date.year}/{web_folder}"
    os.makedirs(fast_data_folder, exist_ok=True)

    results: dict[str, list[str]] = {}
    for instrument in instruments:
        page = f"{base_url}/{instrument}/{date.year}/{web_folder}"
        if _page_file_names is not None:
            file_names = _page_file_names.get(instrument, [])
        else:
            file_names = _list_instrument_page_files(page)
        output_files = []
        for file_name in file_names:
            if _matches_day(file_name, instrument, date_str):
                output_file = f"{fast_data_folder}/{file_name}"
                if not os.path.exists(output_file):
                    _download_single_cdf_file(f"{page}/{file_name}", output_file)
                output_files.append(output_file)
        results[instrument] = sorted(output_files)
    return results


def FAST_ESA_CDF_download(
    base_url: str = FAST_ESA_BASE_URL,
    year: int = DEFAULT_YEAR,
    data_folder: str = DEFAULT_FOLDER,
    instruments: list[str] = DEFAULT_INSTRUMENT_LIST,
) -> None:
    """Download one year of FAST ESA CDF files from CDA Web.

    Scrapes each month/instrument listing once and routes every day through
    :func:`download_single_day_cdf` (reference download.py:146-193).
    """
    from tqdm import tqdm

    for month_index in range(1, 13):
        web_folder = str(month_index).zfill(2)
        print(f"STATUS: Loading month listing pages for {year}-{web_folder}")
        page_file_names: dict[str, list[str]] = {
            instrument: _list_instrument_page_files(f"{base_url}/{instrument}/{year}/{web_folder}")
            for instrument in instruments
        }
        days_in_month = calendar.monthrange(year, month_index)[1]
        print(f"{month_index}/12 | downloading files for {year}-{web_folder}")
        for day_index in tqdm(range(1, days_in_month + 1)):
            download_single_day_cdf(
                date=dt.date(year, month_index, day_index),
                instruments=instruments,
                base_url=base_url,
                data_folder=data_folder,
                _page_file_names=page_file_names,
            )


def _discover_download_targets(
    base_url: str, years: list[int], instruments: set[str], data_folder: str
) -> list[tuple[str, str]]:
    """Scrape listings for every (year, month, instrument); skip files on disk."""
    targets: list[tuple[str, str]] = []
    for year in years:
        for month_index in range(1, 13):
            web_folder = str(month_index).zfill(2)
            for instrument in instruments:
                fast_data_folder = f"{data_folder}/{year}/{web_folder}"
                os.makedirs(fast_data_folder, exist_ok=True)
                page = f"{base_url}/{instrument}/{year}/{web_folder}"
                try:
                    file_names = _list_instrument_page_files(page)
                except Exception as exc:
                    log_error(f"[DOWNLOAD] Failed to load listing page {page}: {exc}")
                    continue
                for file_name in file_names:
                    output_file = f"{fast_data_folder}/{file_name}"
                    if not os.path.exists(output_file):
                        targets.append((f"{page}/{file_name}", output_file))
    return targets


def download_cdf_files_threaded(
    base_url: str = FAST_ESA_BASE_URL,
    years: list[int] | None = None,
    data_folder: str = DEFAULT_FOLDER,
    instruments: set[str] = INSTRUMENT_OPTIONS,
    max_workers: int = 8,
    progress_json_path: str | None = None,
    ignore_progress_json: bool = False,
    flush_batch_size: int = 25,
) -> list[tuple[tuple[str, str], str]]:
    """Download many years of FAST ESA CDF files with a thread pool.

    Sequential listing scrape, then :func:`run_batch` over the individual
    file downloads with a ``ThreadPoolExecutor`` (I/O bound; reference
    download.py:230-297).  Returns ``((link, path), status)`` pairs.
    """
    resolved_years = years if years is not None else [DEFAULT_YEAR]
    targets = _discover_download_targets(base_url, resolved_years, instruments, data_folder)

    def _worker(target: tuple[str, str]) -> tuple[tuple[str, str], str]:
        download_link, output_file = target
        try:
            _download_single_cdf_file(download_link, output_file)
            return (target, "ok")
        except Exception as exc:
            log_error(f"[DOWNLOAD-FAIL] {download_link}: {exc}")
            return (target, "error")

    return run_batch(
        targets,
        _worker,
        functools.partial(ThreadPoolExecutor, max_workers=max_workers),
        progress_json_path=progress_json_path,
        ignore_progress_json=ignore_progress_json,
        flush_batch_size=flush_batch_size,
    )
