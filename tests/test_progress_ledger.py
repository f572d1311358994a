"""Unit tests for the batch driver's progress ledger and memory stability."""

import json

import pytest

from configurable_spectrograms_tpu.fast.batch_directory import _ProgressLedger


def test_ledger_error_taxonomy(tmp_path):
    path = str(tmp_path / "p.json")
    ledger = _ProgressLedger(path, "linear", "log", flush_batch_size=1)
    ledger.record(10, {"status": "error", "errors": ["[FAIL] Plotting Orbit 10 pitch angle grid for ees"]})
    state = json.load(open(path))
    assert state["linear_log_last_orbit"] == 10
    assert state["linear_log_error_plotting"] == [10]
    assert state["ees_linear_log_error-plotting"] == [10]
    assert state["linear_log_error-plotting"] == [10]


def test_ledger_timeout_keys_and_clear(tmp_path):
    path = str(tmp_path / "p.json")
    ledger = _ProgressLedger(path, "log", "log", flush_batch_size=1)
    ledger.record(5, {"status": "timeout", "timeout_type": "orbit"})
    ledger.record(6, {"status": "timeout", "timeout_type": "instrument", "timeout_instrument": "ieb"})
    state = json.load(open(path))
    assert state["orbit_log_log_timed_out"] == [5]
    assert state["ieb_log_log_timed_out"] == [6]
    ledger.clear_timeout_flags(6)
    state = json.load(open(path))
    assert state["ieb_log_log_timed_out"] == []
    assert state["orbit_log_log_timed_out"] == [5]  # untouched


def test_ledger_flush_cadence(tmp_path):
    path = str(tmp_path / "p.json")
    ledger = _ProgressLedger(path, "linear", "linear", flush_batch_size=3)
    ledger.record(1, {"status": "ok"})
    ledger.record(2, {"status": "ok"})
    assert not (tmp_path / "p.json").exists()  # below threshold
    ledger.record(3, {"status": "ok"})
    assert json.load(open(path))["linear_linear_last_orbit"] == 3


def test_ledger_resume_state(tmp_path):
    path = str(tmp_path / "p.json")
    json.dump({"linear_linear_last_orbit": 42, "linear_linear_error_plotting": [40]}, open(path, "w"))
    ledger = _ProgressLedger(path, "linear", "linear", flush_batch_size=1)
    last, errors = ledger.load_resume_state(ignore=False)
    assert last == 42 and errors == {40}
    last2, errors2 = ledger.load_resume_state(ignore=True)
    assert last2 is None and errors2 == set()


def test_render_loop_memory_stable(rng):
    """Repeated figure renders must not leak (caches are bounded)."""
    psutil = pytest.importorskip("psutil")
    from configurable_spectrograms_tpu.data.synthetic import synth_instrument_arrays
    from configurable_spectrograms_tpu.render.plotting import (
        close_all_axes_and_clear,
        generic_plot_spectrogram_set,
    )

    a = synth_instrument_arrays(rng, n_time=64, n_angle=8, n_energy=16)
    ds = {"x": a["time_unix"], "y": a["energy"][0, 0, :], "data": a["data"]}

    def render_once():
        fig, _ = generic_plot_spectrogram_set([dict(ds)], z_scale="log")
        fig.render(dpi=60)
        close_all_axes_and_clear(fig)

    for _ in range(3):  # warm caches/compiles
        render_once()
    rss0 = psutil.Process().memory_info().rss
    for _ in range(25):
        render_once()
    growth = psutil.Process().memory_info().rss - rss0
    assert growth < 200e6, f"RSS grew by {growth/1e6:.0f}MB over 25 renders"


def test_ledger_accumulates_between_flushes(tmp_path):
    """Throttled writes must not lose the intermediate completions'
    updates: all folds land in one cumulative state."""
    path = str(tmp_path / "p.json")
    ledger = _ProgressLedger(path, "linear", "linear", flush_batch_size=3)
    ledger.record(1, {"status": "error", "errors": ["[FAIL] ees exploded"]})
    ledger.record(2, {"status": "timeout", "timeout_type": "orbit"})
    ledger.record(3, {"status": "ok"})  # third call flushes
    state = json.load(open(path))
    assert state["linear_linear_last_orbit"] == 3
    assert state["linear_linear_error_plotting"] == [1]
    assert state["ees_linear_linear_error-generic"] == [1]
    assert state["orbit_linear_linear_timed_out"] == [2]
