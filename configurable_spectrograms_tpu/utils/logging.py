"""Buffered logging shared by the generic and FAST batch/plotting pipelines.

Log messages are queued in memory and flushed to disk in batches to avoid a
disk write per message during large batch runs (behavioral parity with
reference logging_utils.py:1-145).  The destination file is set explicitly
via :func:`set_logfile_path` rather than as an import side effect.
"""

from __future__ import annotations

import sys
import threading
import traceback
from datetime import datetime
from pathlib import Path

_LOG_LOCK = threading.Lock()
_LOG_BUFFER: list[tuple[str, str]] = []
_LOG_BATCH_SIZE = 10
_LOGFILE_PATH: str | None = None


def _echo(message: str) -> None:
    """Echo a message to the console immediately (tqdm-aware when active)."""
    try:
        from tqdm import tqdm

        tqdm.write(message)
    except Exception:
        print(message, file=sys.stderr)


def get_logfile_path(prefix: str, datetime_marker_path: str) -> str:
    """Return a persistent per-run log file path derived from a marker file.

    The marker file holds a timestamp string created on first use and reused
    afterwards, so repeated runs of the same pipeline share one logfile
    (reference logging_utils.py:21-45).
    """
    marker = Path(datetime_marker_path)
    marker_text = marker.read_text().strip() if marker.exists() else ""
    if not marker_text:
        marker_text = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        marker.write_text(marker_text)
    return f"{prefix}_{marker_text}.log"


def set_logfile_path(path: str | None) -> None:
    """Set the destination file that buffered log flushes are written to."""
    global _LOGFILE_PATH
    with _LOG_LOCK:
        _LOGFILE_PATH = path


def configure_log_batch(batch_size: int) -> None:
    """Configure the buffered-logging batch size (values < 1 coerce to 1)."""
    global _LOG_BATCH_SIZE
    with _LOG_LOCK:
        _LOG_BATCH_SIZE = max(1, int(batch_size))


def _flush_locked(force: bool) -> None:
    if not _LOG_BUFFER:
        return
    if len(_LOG_BUFFER) < _LOG_BATCH_SIZE and not force:
        return
    if _LOGFILE_PATH is None:
        _LOG_BUFFER.clear()
        return
    try:
        with open(_LOGFILE_PATH, "a") as logfile_out:
            for level, msg in _LOG_BUFFER:
                logfile_out.write(f"[ERROR] {msg}\n" if level == "error" else msg + "\n")
    except OSError as exc:
        _echo(f"[ERROR] Failed flushing log buffer: {exc}")
    finally:
        _LOG_BUFFER.clear()


def log_message(message: str, force_flush: bool = False) -> None:
    """Queue an informational log message; auto-flush at the batch size."""
    with _LOG_LOCK:
        _LOG_BUFFER.append(("info", message))
        _flush_locked(force=force_flush)


def log_error(message: str, force_flush: bool = False) -> None:
    """Queue an error log message and echo it to the console immediately."""
    _echo("[ERROR] " + message)
    with _LOG_LOCK:
        _LOG_BUFFER.append(("error", message))
        _flush_locked(force=force_flush)


def flush_log_buffer(force: bool = True) -> None:
    """Publicly flush any buffered log messages to disk."""
    with _LOG_LOCK:
        _flush_locked(force=force)


def log_exception(
    prefix: str,
    exception: BaseException | None = None,
    level: str = "error",
    include_trace: bool = False,
    force_flush: bool = False,
) -> None:
    """Log a message, optionally with an exception class/value and traceback.

    ``level='error'`` routes to :func:`log_error`; anything else to
    :func:`log_message` (reference logging_utils.py:116-145).
    """
    exception_name = type(exception).__name__ if exception is not None else None
    message = f"{prefix} [{exception_name}]: {exception}" if exception_name else str(prefix)
    (log_error if level == "error" else log_message)(message, force_flush=force_flush)
    if include_trace and exception is not None:
        trace = "".join(traceback.format_exception(type(exception), exception, exception.__traceback__))
        log_message("[TRACE]\n" + trace, force_flush=force_flush)
