"""Helpers shared by every CLI entry point.

The reference's five scripts each re-declare the same style flags and
exit-code conventions (e.g. reference single_plot_spectrogram.py:94-125);
this module centralizes them: scale/colormap/cusp-style arguments, the
"saved or warn" outcome report (exit 0 saved / 1 nothing to plot), and a
``run_cli`` wrapper providing the shared 130-on-interrupt behavior.
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Callable


def add_render_style_arguments(parser: argparse.ArgumentParser) -> None:
    """Attach the standard --y-scale/--z-scale/--colormap/--cusp-style flags."""
    parser.add_argument("--y-scale", choices=("linear", "log"), default="linear")
    parser.add_argument("--z-scale", choices=("linear", "log"), default="linear")
    parser.add_argument("--colormap", default="viridis")
    parser.add_argument("--cusp-style", choices=("line", "bracket", "both"), default="both")


def report_render_outcome(produced: bool, output_path: str) -> int:
    """Shared saved/no-data reporting: 0 when a figure was written, 1 otherwise."""
    if not produced:
        print("[WARNING] No data available to plot for the given input.")
        return 1
    print(f"[SAVED] {output_path}")
    return 0


def run_cli(main: Callable[[], int | None]) -> None:
    """Invoke *main*, translating Ctrl-C into the conventional exit code 130.

    Exits via ``os._exit`` after flushing stdio: when the device link is
    dead, the watchdog link probe leaves a daemon thread blocked inside a
    device transfer, and normal interpreter teardown of that thread can
    abort the process AFTER main() succeeded -- clobbering the documented
    exit codes.  (Same pattern as the reference GUI's ``os._exit(0)``
    bypassing multiprocessing atexit, reference
    GUI_batch_download_plot_FAST.py:2157-2159.)
    """
    try:
        code = main()
    except KeyboardInterrupt:
        print("\n[INTERRUPT] Aborted by user.")
        code = 130
    except SystemExit as exc:  # argparse errors and explicit exits
        code = exc.code
    # sys.exit("message") semantics: a non-int payload (from main's return
    # or a SystemExit) prints to stderr and exits 1; None exits 0.
    if code is not None and not isinstance(code, int):
        print(code, file=sys.stderr)
        code = 1
    clean_exit(int(code or 0))


def clean_exit(code: int = 0) -> None:
    """Flush logs/stdio and exit immediately, skipping interpreter teardown.

    For library embedders (scripts, notebooks exporting to batch jobs,
    services) that drive the render pipeline directly instead of through
    ``run_cli``: when the device link is cold or dead, the background link
    probe/watchdog daemon threads may still be blocked inside a device
    transfer, and normal CPython teardown of the runtime beneath them can
    abort the process (C++ ``terminate``) *after* all useful work
    finished.  Call this as the last statement of such a script to get a
    deterministic exit code instead.  Never needed on a directly-attached
    healthy device (the probe completes in milliseconds).
    """
    import os

    from configurable_spectrograms_tpu.utils.logging import flush_log_buffer

    try:
        flush_log_buffer(force=True)
    except Exception:
        pass
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(int(code))
