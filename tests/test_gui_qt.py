"""Execute the Qt front-end on the headless structural PySide6 stand-in.

Round-2 verdict item 3: ``run_qt()`` had never executed anywhere (no
PySide6 in the image).  These tests install
:mod:`configurable_spectrograms_tpu.gui.headless_qt` as ``PySide6`` and
drive the REAL ``run_qt()``: navigation between all pages, the Download
page's ToggleChip instrument selection, starting/stopping runs through
``ActionRunner`` child processes, ``ProgressTail`` label streaming, the
invalid-input path, and the OS-theme stylesheet.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pytest


@pytest.fixture()
def gui(monkeypatch):
    """Import the GUI module with the stub installed as PySide6."""
    from configurable_spectrograms_tpu.gui import headless_qt

    monkeypatch.setenv("QT_QPA_PLATFORM", "offscreen")
    assert headless_qt.install() or headless_qt.real_pyside6_available()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        import GUI_batch_download_plot_FAST as gui_mod
    finally:
        sys.path.pop(0)
    yield gui_mod
    headless_qt.QApplication.exec_hook = None
    headless_qt.QApplication._instance = None
    headless_qt.uninstall()


# -- spawn-safe stub process targets (module-level, picklable) ---------------


def _record_args_target(*args, **kwargs) -> None:
    with open(os.environ["CST_TEST_MARKER"], "w") as f:
        json.dump({"args": [list(a) if isinstance(a, (list, tuple)) else a for a in args],
                   "kwargs": {k: str(v) for k, v in kwargs.items()}}, f)


def _progress_writer_target(*args, **kwargs) -> None:
    path = os.environ["CST_TEST_PROGRESS"]
    with open(path, "w") as f:
        json.dump({"log_log_last_orbit": 4100, "errors": []}, f)
    time.sleep(2.5)  # outlive one ProgressTail poll interval


def _hang_target(*args, **kwargs) -> None:
    time.sleep(600)


def _run(gui, headless_qt, hook):
    """Run run_qt() with *hook* driving the UI; propagate hook errors."""
    errors: list[BaseException] = []

    def wrapped(app):
        try:
            hook(app)
        except BaseException as exc:  # surfaced after exec returns
            errors.append(exc)
        finally:
            app.quit()

    headless_qt.QApplication.exec_hook = wrapped
    try:
        assert gui.run_qt() == 0
    finally:
        headless_qt.QApplication.exec_hook = None
    if errors:
        raise errors[0]


def _page_labels(page, headless_qt):
    labels = [w for w in page.findChildren(headless_qt.QLabel)]
    return labels[-2], labels[-1]  # status, progress (added last)


def _button(page, headless_qt, text):
    for b in page.findChildren(headless_qt.QPushButton):
        if b.text() == text:
            return b
    raise AssertionError(f"no button {text!r}")


def _edits_by_name(page, headless_qt):
    """Map field-label text -> QLineEdit by walking the page's layout rows
    (each field row is an HBox of [QLabel, QLineEdit, ...])."""
    mapping: dict[str, object] = {}

    def walk(layout):
        for item in layout._items:
            if isinstance(item, headless_qt._BoxLayout):
                row = item._items
                if (
                    len(row) >= 2
                    and isinstance(row[0], headless_qt.QLabel)
                    and isinstance(row[1], headless_qt.QLineEdit)
                ):
                    mapping[row[0].text()] = row[1]
                else:
                    walk(item)

    walk(page.layout())
    return mapping


def _chips_by_text(page, headless_qt):
    return {b.text(): b for b in page.findChildren(headless_qt.QPushButton)
            if b.objectName() == "chip"}


def _wait_for(app, predicate, timeout=30.0, what="condition"):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        app.processEvents()
        if predicate():
            return
        time.sleep(0.02)
    raise AssertionError(f"timed out waiting for {what}")


def test_run_qt_navigation_and_theme(gui, monkeypatch):
    from configurable_spectrograms_tpu.gui import headless_qt

    monkeypatch.setenv("CST_GUI_THEME", "dark")

    def hook(app):
        win = app.topLevelWidgets()[0]
        assert win.windowTitle() == "FAST spectrograms"
        stack = win.findChildren(headless_qt.QStackedWidget)[0]
        navs = [b for b in win.findChildren(headless_qt.QPushButton)
                if b.objectName() == "navBtn"]
        assert stack.count() == 6 and len(navs) == 6
        assert navs[0].property("selected") == "true"
        navs[1].click()
        assert stack.currentIndex() == 1
        assert navs[1].property("selected") == "true"
        assert navs[0].property("selected") == "false"
        navs[5].click()
        assert stack.currentIndex() == 5
        # Theming: token-substituted dark stylesheet with the reference's
        # navBtn/chip selectors applied at startup.
        sheet = app.styleSheet()
        assert "#1e1f22" in sheet  # dark bg token substituted
        assert 'QPushButton#navBtn[selected="true"]' in sheet
        assert 'QPushButton#chip[selected="true"]' in sheet

    _run(gui, headless_qt, hook)


def test_download_page_chips_feed_the_runner(gui, monkeypatch, tmp_path):
    from configurable_spectrograms_tpu.gui import headless_qt

    marker = tmp_path / "dl_args.json"
    monkeypatch.setenv("CST_TEST_MARKER", str(marker))
    monkeypatch.setattr(gui, "download_in_process", _record_args_target)

    def hook(app):
        win = app.topLevelWidgets()[0]
        stack = win.findChildren(headless_qt.QStackedWidget)[0]
        page = stack.widget(0)
        chips = _chips_by_text(page, headless_qt)
        # Instrument chips (all pre-checked) + year chips: only the FAST
        # coverage window 1996-2009 is offered (reference GUI:74), with
        # 2000 pre-selected -- the year range is valid by construction.
        year_texts = {str(y) for y in range(1996, 2010)}
        assert set(chips) == {"ees", "eeb", "ies", "ieb"} | year_texts
        assert all(chips[i].isChecked() for i in ("ees", "eeb", "ies", "ieb"))
        assert chips["2000"].isChecked()
        assert not any(chips[y].isChecked() for y in year_texts - {"2000"})
        chips["ieb"].click()  # deselect one instrument
        assert chips["ieb"].property("selected") == "false"
        chips["2000"].click()  # swap the year selection to 2001
        chips["2001"].click()
        edits = _edits_by_name(page, headless_qt)
        edits["Data folder"].setText(str(tmp_path))
        status, _ = _page_labels(page, headless_qt)
        _button(page, headless_qt, "Download").click()
        _wait_for(app, lambda: status.text() == "Finished.", what="download finish")

    _run(gui, headless_qt, hook)
    recorded = json.loads(marker.read_text())
    assert recorded["args"][0] == [2001]
    assert sorted(recorded["args"][1]) == ["eeb", "ees", "ies"]  # no ieb


def test_download_page_requires_a_year(gui, monkeypatch, tmp_path):
    """Deselecting every year chip must refuse to start (the reference CLI
    validates the 1996-2009 range, reference FAST_CDF_download.py:40-68;
    the chips make out-of-range impossible and empty-selection an error)."""
    from configurable_spectrograms_tpu.gui import headless_qt

    def hook(app):
        win = app.topLevelWidgets()[0]
        stack = win.findChildren(headless_qt.QStackedWidget)[0]
        page = stack.widget(0)
        chips = _chips_by_text(page, headless_qt)
        chips["2000"].click()  # now no year selected
        status, _ = _page_labels(page, headless_qt)
        _button(page, headless_qt, "Download").click()
        assert status.text().startswith("Invalid input:")
        assert "year" in status.text()

    _run(gui, headless_qt, hook)


def test_plot_page_percentile_slider_linked(gui):
    """The noise-percentile slider and its entry stay in sync both ways and
    the hint note tracks the value (reference GUI:655-698)."""
    from configurable_spectrograms_tpu.gui import headless_qt

    def hook(app):
        win = app.topLevelWidgets()[0]
        stack = win.findChildren(headless_qt.QStackedWidget)[0]
        page = stack.widget(1)
        sliders = [w for w in page.findChildren(headless_qt.QSlider)]
        assert len(sliders) == 1
        slider = sliders[0]
        assert (slider.minimum(), slider.maximum()) == (0, 100)
        edits = _edits_by_name(page, headless_qt)
        entry = edits["Percentile"]
        assert slider.value() == 90  # seeded from the field default (reference GUI:96)
        note = next(w for w in page.findChildren(headless_qt.QLabel)
                    if w.objectName() == "noteText")
        assert "Current value: 90.0" in note.text()
        slider.setValue(95)  # slider -> entry
        assert entry.text() == "95"
        assert "Current value: 95.0" in note.text()
        entry.type_text("80")  # entry -> slider
        assert slider.value() == 80
        # Fractional percentiles survive (reference _on_entry_changed keeps
        # the float and rewrites the entry as %.1f, reference GUI:1424-1435).
        entry.type_text("99.5")
        assert slider.value() == 100 and entry.text() == "99.5"
        assert "Current value: 99.5" in note.text()
        entry.type_text("250")  # out of range clamps
        assert slider.value() == 100 and entry.text() == "100.0"
        entry.type_text("not-a-number")  # rejected, restores the committed value
        assert slider.value() == 100 and entry.text() == "100.0"

    _run(gui, headless_qt, hook)


def test_plot_page_start_progress_and_stop(gui, monkeypatch, tmp_path):
    from configurable_spectrograms_tpu.fast import constants as fast_constants
    from configurable_spectrograms_tpu.gui import headless_qt

    progress = tmp_path / "progress.json"
    monkeypatch.setenv("CST_TEST_PROGRESS", str(progress))
    monkeypatch.setattr(fast_constants, "FAST_PLOTTING_PROGRESS_JSON", str(progress))
    monkeypatch.setattr(gui, "plot_in_process", _progress_writer_target)

    def hook(app):
        win = app.topLevelWidgets()[0]
        stack = win.findChildren(headless_qt.QStackedWidget)[0]
        page = stack.widget(1)
        edits = _edits_by_name(page, headless_qt)
        edits["Data folder"].setText(str(tmp_path))
        edits["Scale combos"].setText("log-log")
        status, progress_label = _page_labels(page, headless_qt)
        _button(page, headless_qt, "Plot").click()
        assert status.text() == "Running..."
        # ProgressTail polls the progress JSON (1 s interval) and streams a
        # summary into the label via the queued bridge signal.
        _wait_for(app, lambda: "orbit 4100" in progress_label.text(),
                  what="progress label update")
        _wait_for(app, lambda: status.text() == "Finished.", what="plot finish")

        # Start a hung run, then stop it: the child is killed and the
        # status reflects the stop, not an error.
        import multiprocessing

        monkeypatch.setattr(gui, "plot_in_process", _hang_target)
        _button(page, headless_qt, "Plot").click()
        _wait_for(app, lambda: status.text() == "Running...", what="second run start")
        _wait_for(app, lambda: any(p.is_alive() for p in multiprocessing.active_children()),
                  what="hung child alive")
        t0 = time.monotonic()
        _button(page, headless_qt, "Stop").click()
        assert time.monotonic() - t0 < 10
        assert status.text() == "Stopped."
        # The hung child must actually be dead -- the label alone is set
        # unconditionally by the stop handler.
        _wait_for(app, lambda: not any(p.is_alive() for p in multiprocessing.active_children()),
                  what="hung child killed")

    _run(gui, headless_qt, hook)


def test_single_day_pages_run_and_validate(gui, monkeypatch, tmp_path):
    from configurable_spectrograms_tpu.gui import headless_qt

    marker = tmp_path / "single_args.json"
    monkeypatch.setenv("CST_TEST_MARKER", str(marker))
    monkeypatch.setattr(gui, "single_in_process", _record_args_target)

    def hook(app):
        win = app.topLevelWidgets()[0]
        stack = win.findChildren(headless_qt.QStackedWidget)[0]

        # Page 2: folder+orbit instrument grid.
        page = stack.widget(2)
        edits = _edits_by_name(page, headless_qt)
        edits["Data folder"].setText(str(tmp_path))
        edits["Orbit"].setText("123")
        edits["Output PNG"].setText(str(tmp_path / "out.png"))
        edits["Style y-z[-cmap]"].setText("log-log")
        status, _ = _page_labels(page, headless_qt)
        _button(page, headless_qt, "Render").click()
        _wait_for(app, lambda: status.text() == "Finished.", what="render finish")
        rec = json.loads(marker.read_text())
        assert rec["args"][0] == "instrument-grid"
        assert rec["kwargs"]["orbit"] == "123"
        assert rec["kwargs"]["y_scale"] == "log"

        # Page 5 (by date): source switching -- same worker, 'date' mode.
        page5 = stack.widget(5)
        edits5 = _edits_by_name(page5, headless_qt)
        edits5["Date"].setText("2001-02-03")
        edits5["Output PNG"].setText(str(tmp_path / "day.png"))
        status5, _ = _page_labels(page5, headless_qt)
        _button(page5, headless_qt, "Download + render").click()
        _wait_for(app, lambda: status5.text() == "Finished.", what="date render")
        rec5 = json.loads(marker.read_text())
        assert rec5["args"][0] == "date"
        assert rec5["kwargs"]["date"] == "2001-02-03"

        # Invalid style spec: caught client-side, no process spawned.
        before = marker.read_text()
        edits5["Style y-z[-cmap]"].setText("bogus")
        _button(page5, headless_qt, "Download + render").click()
        assert status5.text().startswith("Invalid input")
        time.sleep(0.5)
        app.processEvents()
        assert marker.read_text() == before, "a runner was spawned despite invalid input"
        import multiprocessing

        assert not any(p.is_alive() for p in multiprocessing.active_children())

    _run(gui, headless_qt, hook)


def test_main_headless_env_routes_to_qt(gui, monkeypatch):
    from configurable_spectrograms_tpu.gui import headless_qt

    monkeypatch.setenv("CST_GUI_HEADLESS_QT", "1")
    monkeypatch.setattr(sys, "argv", ["GUI_batch_download_plot_FAST.py"])

    seen = {}

    def hook(app):
        seen["pages"] = app.topLevelWidgets()[0].findChildren(headless_qt.QStackedWidget)[0].count()

    headless_qt.QApplication.exec_hook = lambda app: (hook(app), app.quit())
    try:
        assert gui.main() == 0
    finally:
        headless_qt.QApplication.exec_hook = None
    assert seen["pages"] == 6
