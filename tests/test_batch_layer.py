"""Tests for run_batch, generic_batch_plot, and the (mocked) downloader."""

import datetime as dt
import functools
import json
import os
from concurrent.futures import ThreadPoolExecutor


from configurable_spectrograms_tpu.batch_runner import run_batch
from configurable_spectrograms_tpu.data import download as dl
from configurable_spectrograms_tpu.generic_batch import generic_batch_plot


def test_run_batch_statuses_and_resume(tmp_path):
    progress = str(tmp_path / "p.json")

    def worker(item):
        if item == "bad":
            return (item, "error")
        if item == "empty":
            return (item, "no_data")
        return (item, "ok")

    factory = functools.partial(ThreadPoolExecutor, max_workers=2)
    results = run_batch(
        ["a", "bad", "empty", "b"], worker, factory,
        progress_json_path=progress, flush_batch_size=1, install_signal_handlers=False,
    )
    statuses = dict(results)
    assert statuses == {"a": "ok", "bad": "error", "empty": "no_data", "b": "ok"}
    state = json.loads(open(progress).read())
    assert sorted(state["completed_items"]) == ["'a'", "'b'"]
    assert state["errors"] == ["'bad'"]
    assert state["no_data"] == ["'empty'"]

    # Resume: completed items are skipped; errors/no_data are retried.
    calls = []

    def worker2(item):
        calls.append(item)
        return (item, "ok")

    run_batch(["a", "bad", "empty", "b"], worker2, factory,
              progress_json_path=progress, flush_batch_size=1, install_signal_handlers=False)
    assert sorted(calls) == ["bad", "empty"]


def test_run_batch_worker_exception(tmp_path):
    def worker(item):
        raise RuntimeError("boom")

    results = run_batch(
        [1], worker, functools.partial(ThreadPoolExecutor, max_workers=1),
        progress_json_path=None, install_signal_handlers=False,
    )
    assert results == [(1, "error")]


def test_generic_batch_plot(tmp_path, rng):
    from configurable_spectrograms_tpu.data.synthetic import synth_instrument_arrays

    arrays = synth_instrument_arrays(rng, n_time=60, n_angle=8, n_energy=16)

    def build(item):
        if item == "nodata":
            return []
        return [{
            "x": arrays["time_unix"],
            "y": arrays["energy"][0, 0, :],
            "data": arrays["data"],
            "label": str(item),
        }]

    out = str(tmp_path / "plots")
    results = generic_batch_plot(
        ["one", "nodata", "two"], out, build,
        max_workers=2, progress_json_path=str(tmp_path / "gp.json"),
        flush_batch_size=1, install_signal_handlers=False,
    )
    statuses = dict(results)
    assert statuses == {"one": "ok", "nodata": "no_data", "two": "ok"}
    assert os.path.exists(os.path.join(out, "one", "generic.png"))
    assert os.path.exists(os.path.join(out, "two", "generic.png"))
    assert not os.path.exists(os.path.join(out, "nodata"))


def test_download_single_day_mocked(tmp_path, monkeypatch):
    listings = {
        "ees": ["fa_esa_l2_ees_20000101010203_100_v02.cdf", "fa_esa_l2_ees_20000102010203_101_v02.cdf"],
        "ieb": ["fa_esa_l2_ieb_20000101010203_100_v02.cdf"],
    }
    downloaded = []

    monkeypatch.setattr(dl, "_list_instrument_page_files", lambda page: listings[page.split("/")[-3]])
    monkeypatch.setattr(
        dl, "_download_single_cdf_file",
        lambda link, out: (downloaded.append(link), open(out, "wb").write(b"x"))[0],
    )
    res = dl.download_single_day_cdf(
        dt.date(2000, 1, 1), instruments=["ees", "ieb"], data_folder=str(tmp_path / "d")
    )
    assert len(res["ees"]) == 1 and len(res["ieb"]) == 1  # only the Jan-1 files
    assert all("20000101" in p for p in res["ees"] + res["ieb"])
    assert len(downloaded) == 2
    # Second call: files exist, nothing re-downloaded.
    downloaded.clear()
    res2 = dl.download_single_day_cdf(
        dt.date(2000, 1, 1), instruments=["ees", "ieb"], data_folder=str(tmp_path / "d")
    )
    assert downloaded == [] and res2 == res


def test_download_threaded_mocked(tmp_path, monkeypatch):
    listings = ["fa_esa_l2_ees_20000101010203_100_v02.cdf"]
    monkeypatch.setattr(dl, "_list_instrument_page_files", lambda page: list(listings))
    written = []
    monkeypatch.setattr(
        dl, "_download_single_cdf_file",
        lambda link, out: (written.append(out), open(out, "wb").write(b"x"))[0],
    )
    results = dl.download_cdf_files_threaded(
        years=[2000], instruments={"ees"}, data_folder=str(tmp_path / "d"),
        progress_json_path=str(tmp_path / "dl.json"),
    )
    assert len(results) == 12  # one file listed per month page
    assert all(status == "ok" for _, status in results)
    assert len(written) == 12


def test_gui_action_runner():
    import GUI_batch_download_plot_FAST as gui

    runner = gui.ActionRunner(_child_ok, ())
    runner.start()
    assert runner.wait() == 0
    runner2 = gui.ActionRunner(_child_fail, ())
    runner2.start()
    assert runner2.wait() != 0


def _child_ok():
    pass


def _child_fail():
    raise SystemExit(3)


def test_fast_batch_config_runs(tmp_path, monkeypatch, rng):
    """The typed config front door drives the same batch driver."""
    from configurable_spectrograms_tpu.data.synthetic import synth_fast_archive
    from configurable_spectrograms_tpu.utils.config import FastBatchConfig, ScaleCombo

    monkeypatch.chdir(tmp_path)
    synth_fast_archive(str(tmp_path / "data"), [77], n_time=48, n_angle=8, n_energy=16)
    cfg = FastBatchConfig(
        directory_path=str(tmp_path / "data"),
        output_base=str(tmp_path / "out"),
        combos=(ScaleCombo("linear", "linear", "viridis"),),
        progress_json_path=str(tmp_path / "p.json"),
        max_processing_percentile=None,
        orbit_timeout_seconds=600,
        instrument_timeout_seconds=300,
        use_tqdm=False,
        retry_timeouts=False,
        max_workers=1,
        override_plots=True,
    )
    results = cfg.run()
    assert [r["status"] for r in results] == ["ok"]
    cfg2 = cfg.replace(combos=(ScaleCombo("log", "log", "inferno"),))
    assert cfg2.combos[0].colormap == "inferno"
    assert cfg.combos[0].colormap == "viridis"  # original untouched


def test_ephemeris_files_excluded(tmp_path):
    """Ephemeris (_orb_) files are excluded from discovery like the reference.

    Note the exclusion matches anywhere in the *path* (reference
    fast/orbit_discovery.py:160-162), so this test's own name must not
    contain ``_orb_`` or pytest's tmp dir would trip it.
    """
    from configurable_spectrograms_tpu.data.orbit_discovery import discover_orbit_files

    d = tmp_path / "data" / "2000" / "01"
    d.mkdir(parents=True)
    (d / "fa_k0_orb_555_v01.cdf").write_bytes(b"x")
    (d / "fa_esa_l2_ees_20000101010101_555_v02.cdf").write_bytes(b"x")
    mapping = discover_orbit_files(str(tmp_path / "data"))
    assert mapping == {555: {"ees": str(d / "fa_esa_l2_ees_20000101010101_555_v02.cdf")}}


def test_tui_single_day_flow(tmp_path):
    """Drive the terminal front-end end-to-end through a subprocess."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    setup = (
        "from configurable_spectrograms_tpu.data.synthetic import synth_fast_archive;"
        "synth_fast_archive('data', [42], n_time=48, n_angle=8, n_energy=16)"
    )
    subprocess.run([sys.executable, "-c", setup], cwd=tmp_path, check=True,
                   env=_tui_env(repo), capture_output=True, timeout=300)
    # mode, output, style (default), cusp style (default), folder, orbit
    script = "3\ninstrument-grid\nout.png\n\n\ndata\n42\nq\n"
    proc = subprocess.run(
        [sys.executable, str(repo / "GUI_batch_download_plot_FAST.py"), "--tui"],
        input=script, text=True, cwd=tmp_path, env=_tui_env(repo),
        capture_output=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Done." in proc.stdout
    assert (tmp_path / "out.png").exists()


def _tui_env(repo):
    import os as _os

    env = dict(_os.environ)
    env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _pp_worker(item):
    """Module-level (spawn-picklable) worker for the ProcessPool test."""
    return (item, "ok" if item % 2 == 0 else "no_data")


def test_run_batch_with_process_pool(tmp_path):
    """run_batch stays executor-agnostic: a ProcessPoolExecutor works too."""
    from concurrent.futures import ProcessPoolExecutor

    results = run_batch(
        [0, 1, 2, 3], _pp_worker, functools.partial(ProcessPoolExecutor, max_workers=2),
        progress_json_path=str(tmp_path / "pp.json"), flush_batch_size=1,
        install_signal_handlers=False,
    )
    assert dict(results) == {0: "ok", 1: "no_data", 2: "ok", 3: "no_data"}


def test_tui_single_day_files_source(tmp_path, synth_archive):
    """Single-day 'files' source: explicit per-instrument file pickers."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    paths = synth_archive["mapping"][100]
    script = (
        "3\nfiles\nout_files.png\n"
        "log-log\nline\n"  # non-default style + cusp marker answers
        f"{paths['ees']}\n{paths['eeb']}\n\n\n"  # ees + eeb picked, ies/ieb skipped
        "q\n"
    )
    proc = subprocess.run(
        [sys.executable, str(repo / "GUI_batch_download_plot_FAST.py"), "--tui"],
        input=script, text=True, cwd=tmp_path, env=_tui_env(repo),
        capture_output=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Done." in proc.stdout
    assert (tmp_path / "out_files.png").exists()


def test_single_day_download_by_date_source(tmp_path, synth_archive, monkeypatch):
    """Single-day 'date' source: download that day's CDFs, then render the
    shared orbit's instrument grid (downloader injected -- zero egress)."""
    import single_plot_FAST_spectrograms as single

    def fake_downloader(date, instruments, data_folder):
        assert date.isoformat() == "2001-01-26"
        return {inst: [path] for inst, path in synth_archive["mapping"][101].items()
                if inst in instruments}

    out = tmp_path / "by_date.png"
    ok = single.render_single_day_downloaded(
        "2001-01-26", str(out), data_folder=str(tmp_path), downloader=fake_downloader,
        y_scale="log", z_scale="log", colormap="inferno",
    )
    assert ok and out.exists()


def test_render_single_instrument_grid_from_files(tmp_path, synth_archive):
    import single_plot_FAST_spectrograms as single

    out = tmp_path / "from_files.png"
    ok = single.render_single_instrument_grid_from_files(
        dict(synth_archive["mapping"][102]), str(out), y_scale="linear", z_scale="log",
    )
    assert ok and out.exists()
    assert not single.render_single_instrument_grid_from_files({}, str(tmp_path / "no.png"))


def test_parse_scale_combos():
    """Front-end scale-combo spec: 'all', y-z defaults, explicit colormap,
    and rejection of malformed tokens (reference Plot-page widget surface,
    reference GUI_batch_download_plot_FAST.py:10-11)."""
    import pytest

    import GUI_batch_download_plot_FAST as gui

    parse = gui.parse_scale_combos
    assert parse("all") == gui.DEFAULT_SCALE_COMBOS
    assert parse("  ") == gui.DEFAULT_SCALE_COMBOS
    assert parse("log-log") == [("log", "log", "inferno")]
    assert parse("linear-log-turbo log-linear") == [
        ("linear", "log", "turbo"),
        ("log", "linear", "plasma"),
    ]
    for bad in ("sqrt-log", "linear", "linear-log-", "log-cubic"):
        with pytest.raises(ValueError):
            parse(bad)


def test_progress_tail_streams_updates(tmp_path):
    import json
    import time

    import GUI_batch_download_plot_FAST as gui

    path = tmp_path / "prog.json"
    seen = []
    tail = gui.ProgressTail(str(path), seen.append, interval=0.05).start()
    time.sleep(0.15)  # no file yet -> no callbacks
    assert seen == []
    path.write_text(json.dumps({"log_log_last_orbit": 4100, "log_log_error_plotting": []}))
    time.sleep(0.3)
    path.write_text(json.dumps({"log_log_last_orbit": 4101, "completed_items": ["a", "b"]}))
    time.sleep(0.3)
    tail.stop()
    assert any("log_log @ orbit 4100" in s for s in seen), seen
    assert any("orbit 4101" in s and "2 completed" in s for s in seen), seen


def test_tui_rejects_bad_combo_spec(tmp_path):
    """An invalid scale-combo answer reports the error and returns to the
    menu instead of crashing the front-end."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    script = "2\ndata\nplots\n\nsqrt-log\nq\n"  # bad combo -> back to menu
    proc = subprocess.run(
        [sys.executable, str(repo / "GUI_batch_download_plot_FAST.py"), "--tui"],
        input=script, text=True, cwd=tmp_path, env=_tui_env(repo),
        capture_output=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "bad scale combo" in proc.stdout
    assert not (tmp_path / "plots").exists()
