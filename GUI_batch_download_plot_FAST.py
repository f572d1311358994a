#!/usr/bin/env python
"""Download / batch-plot / single-day front-end for the FAST pipelines.

Capability parity with the reference's PySide6 application
(reference GUI_batch_download_plot_FAST.py:3-18,2032-2146): three pages --
**Download** (instruments + years to a folder), **Plot** (batch directory
runs over scale combos), and **Single Day** (pitch-angle or instrument-grid
mode from a folder/orbit or a downloaded date).  Each action runs in a
separate ``multiprocessing.Process`` with a monitoring thread, the same
isolation pattern the reference uses so a stuck run can be stopped without
killing the UI.

Two front-ends over the same worker functions:

* a PySide6 window when Qt is installed (the reference's stack), or
* a terminal menu (``--tui``, also the automatic fallback) -- this
  environment ships no Qt, and every workflow remains fully usable.

Both call the identical module-level process targets below, which are also
directly importable for scripting/tests.
"""

from __future__ import annotations

import argparse
import multiprocessing
import sys
import threading
from dataclasses import dataclass, field

DEFAULT_SCALE_COMBOS = [
    ("linear", "linear", "viridis"),
    ("linear", "log", "cividis"),
    ("log", "linear", "plasma"),
    ("log", "log", "inferno"),
]


# ---------------------------------------------------------------------------
# Module-level process targets (spawn-picklable, as in the reference).
# ---------------------------------------------------------------------------


def download_in_process(years: list[int], instruments: list[str], data_folder: str) -> None:
    """Process target: download *years* of FAST CDFs for *instruments*."""
    from configurable_spectrograms_tpu.data.download import download_cdf_files_threaded

    download_cdf_files_threaded(years=years, instruments=set(instruments), data_folder=data_folder)


def plot_in_process(
    data_folder: str,
    output_base: str,
    combos: list[tuple[str, str, str]],
    max_processing_percentile: float | None,
    cusp_marker_style: str,
    override_plots: bool,
) -> None:
    """Process target: run the batch driver for each scale combo."""
    from configurable_spectrograms_tpu.fast.batch_directory import FAST_plot_spectrograms_directory

    for y_scale, z_scale, colormap in combos:
        FAST_plot_spectrograms_directory(
            data_folder,
            output_base=output_base,
            y_scale=y_scale,
            z_scale=z_scale,
            colormap=colormap,
            use_tqdm=True,
            max_processing_percentile=max_processing_percentile,
            cusp_marker_style=cusp_marker_style,
            override_plots=override_plots,
        )


def single_in_process(
    mode: str,
    output_path: str,
    data_folder: str | None = None,
    orbit: int | None = None,
    cdf_file: str | None = None,
    y_scale: str = "linear",
    z_scale: str = "linear",
    colormap: str = "viridis",
    cusp_marker_style: str = "both",
) -> None:
    """Process target: render one pitch-angle or instrument-grid figure."""
    import single_plot_FAST_spectrograms as single

    if mode == "pitch-angle":
        ok = single.render_single_pitch_angle_grid(
            cdf_file, output_path, y_scale, z_scale, colormap, cusp_marker_style
        )
    else:
        ok = single.render_single_instrument_grid(
            data_folder, orbit, output_path, y_scale, z_scale, colormap, cusp_marker_style
        )
    if not ok:
        raise SystemExit(1)


@dataclass
class ActionRunner:
    """Run a process target in a child process with stop support.

    The QThread+Process pattern from the reference
    (reference GUI_batch_download_plot_FAST.py:733-998) distilled: start a
    ``multiprocessing.Process``, join it from a monitor thread, surface
    finished/stopped/error via callbacks, and ``stop()`` kills the child.
    """

    target: callable
    args: tuple = ()
    on_finished: callable = lambda: None
    on_error: callable = lambda code: None
    _proc: multiprocessing.Process | None = field(default=None, init=False)
    _stopped: bool = field(default=False, init=False)

    def start(self) -> None:
        self._proc = multiprocessing.Process(target=self.target, args=self.args)
        self._proc.start()
        threading.Thread(target=self._watch, daemon=True).start()

    def _watch(self) -> None:
        assert self._proc is not None
        self._proc.join()
        if self._stopped:
            return
        if self._proc.exitcode == 0:
            self.on_finished()
        else:
            self.on_error(self._proc.exitcode)

    def stop(self) -> None:
        self._stopped = True
        if self._proc is not None and self._proc.is_alive():
            self._proc.kill()
            self._proc.join()

    def wait(self) -> int | None:
        if self._proc is not None:
            self._proc.join()
            return self._proc.exitcode
        return None


# ---------------------------------------------------------------------------
# Terminal front-end
# ---------------------------------------------------------------------------


def _prompt(text: str, default: str) -> str:
    raw = input(f"{text} [{default}]: ").strip()
    return raw or default


def run_tui() -> int:
    print("FAST spectrograms — download / plot / single day")
    while True:
        print("\n1) Download CDFs   2) Batch plot   3) Single day   q) Quit")
        choice = input("> ").strip().lower()
        if choice == "q":
            return 0
        if choice == "1":
            years = [int(y) for y in _prompt("Years (space-separated)", "2000").split()]
            instruments = _prompt("Instruments", "ees eeb ies ieb").split()
            folder = _prompt("Data folder", "./FAST_data/")
            runner = ActionRunner(download_in_process, (years, instruments, folder))
            runner.start()
            print("Downloading... Ctrl-C to stop.")
            _wait_interruptible(runner)
        elif choice == "2":
            folder = _prompt("Data folder", "./FAST_data/")
            out = _prompt("Output folder", "./FAST_plots/")
            pct = _prompt("Max processing percentile (blank = raw only)", "99")
            combos = DEFAULT_SCALE_COMBOS
            runner = ActionRunner(
                plot_in_process,
                (folder, out, combos, float(pct) if pct else None, "both", False),
            )
            runner.start()
            print("Plotting... Ctrl-C to stop.")
            _wait_interruptible(runner)
        elif choice == "3":
            mode = _prompt("Mode (pitch-angle | instrument-grid)", "instrument-grid")
            out = _prompt("Output PNG", "./single.png")
            if mode == "pitch-angle":
                cdf = _prompt("CDF file", "")
                runner = ActionRunner(single_in_process, (mode, out, None, None, cdf))
            else:
                folder = _prompt("Data folder", "./FAST_data/")
                orbit = int(_prompt("Orbit", "0"))
                runner = ActionRunner(single_in_process, (mode, out, folder, orbit))
            runner.start()
            _wait_interruptible(runner)
        else:
            print("Unknown choice.")


def _wait_interruptible(runner: ActionRunner) -> None:
    try:
        code = runner.wait()
        print("Done." if code == 0 else f"Exited with code {code}.")
    except KeyboardInterrupt:
        runner.stop()
        print("\nStopped.")


# ---------------------------------------------------------------------------
# Qt front-end (only when PySide6 is installed)
# ---------------------------------------------------------------------------


def run_qt() -> int:  # pragma: no cover - requires PySide6 + display
    from PySide6.QtWidgets import (
        QApplication,
        QFileDialog,
        QHBoxLayout,
        QLabel,
        QLineEdit,
        QPushButton,
        QTabWidget,
        QVBoxLayout,
        QWidget,
    )

    app = QApplication(sys.argv)
    win = QTabWidget()
    win.setWindowTitle("FAST spectrograms")
    state: dict[str, ActionRunner | None] = {"runner": None}

    def _page(fields: list[tuple[str, str]], run_label: str, make_runner):
        page = QWidget()
        layout = QVBoxLayout(page)
        edits: dict[str, QLineEdit] = {}
        for name, default in fields:
            row = QHBoxLayout()
            row.addWidget(QLabel(name))
            edit = QLineEdit(default)
            edits[name] = edit
            row.addWidget(edit)
            if "folder" in name.lower() or "file" in name.lower():
                btn = QPushButton("...")
                btn.clicked.connect(lambda _=None, e=edit: e.setText(QFileDialog.getExistingDirectory() or e.text()))
                row.addWidget(btn)
            layout.addLayout(row)
        status = QLabel("")
        run_btn = QPushButton(run_label)
        stop_btn = QPushButton("Stop")

        def start():
            runner = make_runner({k: e.text() for k, e in edits.items()})
            runner.on_finished = lambda: status.setText("Finished.")
            runner.on_error = lambda code: status.setText(f"Error (exit {code}).")
            state["runner"] = runner
            runner.start()
            status.setText("Running...")

        def stop():
            if state["runner"] is not None:
                state["runner"].stop()
                status.setText("Stopped.")

        run_btn.clicked.connect(start)
        stop_btn.clicked.connect(stop)
        layout.addWidget(run_btn)
        layout.addWidget(stop_btn)
        layout.addWidget(status)
        return page

    win.addTab(
        _page(
            [("Years", "2000"), ("Instruments", "ees eeb ies ieb"), ("Data folder", "./FAST_data/")],
            "Download",
            lambda v: ActionRunner(
                download_in_process,
                ([int(y) for y in v["Years"].split()], v["Instruments"].split(), v["Data folder"]),
            ),
        ),
        "Download",
    )
    win.addTab(
        _page(
            [("Data folder", "./FAST_data/"), ("Output folder", "./FAST_plots/"), ("Percentile", "99")],
            "Plot",
            lambda v: ActionRunner(
                plot_in_process,
                (v["Data folder"], v["Output folder"], DEFAULT_SCALE_COMBOS,
                 float(v["Percentile"]) if v["Percentile"] else None, "both", False),
            ),
        ),
        "Plot",
    )
    win.addTab(
        _page(
            [("Data folder", "./FAST_data/"), ("Orbit", "0"), ("Output PNG", "./single.png")],
            "Render",
            lambda v: ActionRunner(
                single_in_process,
                ("instrument-grid", v["Output PNG"], v["Data folder"], int(v["Orbit"])),
            ),
        ),
        "Single Day",
    )
    win.resize(640, 360)
    win.show()
    return app.exec()


def main() -> int:
    parser = argparse.ArgumentParser(description="FAST download/plot front-end.")
    parser.add_argument("--tui", action="store_true", help="Force the terminal front-end.")
    args = parser.parse_args()
    if not args.tui:
        try:
            import PySide6  # noqa: F401

            return run_qt()
        except ImportError:
            print("[INFO] PySide6 not installed; using the terminal front-end.")
    return run_tui()


if __name__ == "__main__":
    try:
        sys.exit(main())
    except KeyboardInterrupt:
        print("\n[INTERRUPT] Aborted by user.")
        sys.exit(130)
