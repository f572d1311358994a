"""End-to-end tests of the argparse entry points (flags + exit codes).

The reference's five CLIs define the user-facing contract: flag names,
required/mutually-exclusive groups, and exit codes (0 = saved, 1 = no
data, 2 = argparse usage error).  These drive each script's ``main()``
with a patched ``sys.argv``, exactly as a shell invocation would.
"""

import os
import sys

import numpy as np


def _run_main(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", [module.__name__ + ".py", *argv])
    try:
        rc = module.main()
    except SystemExit as exc:  # argparse errors exit via SystemExit
        rc = exc.code
    return 0 if rc is None else rc


def test_single_plot_spectrogram_cli(tmp_path, synth_archive, monkeypatch):
    import single_plot_spectrogram as cli

    orbit = synth_archive["orbits"][0]
    cdf = synth_archive["mapping"][orbit]["ees"]
    out = str(tmp_path / "generic.png")
    rc = _run_main(monkeypatch, cli, ["--cdf-file", cdf, "--output", out,
                                     "--y-scale", "log", "--z-scale", "log",
                                     "--colormap", "turbo"])
    assert rc == 0 and os.path.exists(out)
    from PIL import Image

    assert Image.open(out).size[0] > 0


def test_single_plot_spectrogram_cli_missing_file(tmp_path, monkeypatch):
    import single_plot_spectrogram as cli

    rc = _run_main(monkeypatch, cli, ["--cdf-file", str(tmp_path / "nope.cdf"),
                                     "--output", str(tmp_path / "o.png")])
    assert rc == 1


def test_single_plot_fast_cli_pitch_grid(tmp_path, synth_archive, monkeypatch):
    import single_plot_FAST_spectrograms as cli

    orbit = synth_archive["orbits"][0]
    cdf = synth_archive["mapping"][orbit]["ies"]
    out = str(tmp_path / "pitch.png")
    monkeypatch.setenv("CST_CUSP_CSV", synth_archive["cusp_csv"])
    rc = _run_main(monkeypatch, cli, ["--cdf-file", cdf, "--output", out])
    assert rc == 0 and os.path.exists(out)


def test_single_plot_fast_cli_mutually_exclusive(tmp_path, synth_archive, monkeypatch):
    import single_plot_FAST_spectrograms as cli

    orbit = synth_archive["orbits"][0]
    cdf = synth_archive["mapping"][orbit]["ees"]
    rc = _run_main(monkeypatch, cli, ["--cdf-file", cdf, "--data-folder", synth_archive["root"],
                                     "--output", str(tmp_path / "x.png")])
    assert rc == 2  # argparse rejects combining the exclusive sources


def test_audio_cli(tmp_path, monkeypatch):
    import wave

    import single_plot_audio_spectrogram as cli

    rate = 8000
    t = np.arange(rate // 2) / rate
    sig = (np.sin(2 * np.pi * 440 * t) * 0.4 * 32767).astype(np.int16)
    wav = str(tmp_path / "tone.wav")
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())
    out = str(tmp_path / "tone.png")
    rc = _run_main(monkeypatch, cli, ["--wav-file", wav, "--output", out,
                                     "--n-mels", "32", "--stft-method", "matmul"])
    assert rc == 0 and os.path.exists(out)


def test_day_download_cli_validates_date(monkeypatch, tmp_path):
    import single_day_FAST_CDF_download as cli

    # Outside the mission coverage window -> usage error, no network touched.
    rc = _run_main(monkeypatch, cli, ["--date", "2020-01-01",
                                     "--output_path", str(tmp_path)])
    assert rc == 2


def test_year_download_cli_validates_year(monkeypatch, tmp_path):
    import FAST_CDF_download as cli

    rc = _run_main(monkeypatch, cli, ["--year", "2050", "--output_path", str(tmp_path)])
    assert rc == 2


def test_batch_cli_runs_all_scale_combos(tmp_path, synth_archive, monkeypatch):
    """The flagship batch CLI end-to-end: like the reference, it takes no
    flags and operates on the working directory's ``./FAST_data`` +
    ``./FAST_Cusp_Indices.csv`` layout (reference
    batch_multi_plot_FAST_spectrograms.py:79-103), writing all four scale
    combos with the production filename scheme under ``./FAST_plots``."""
    import shutil

    import batch_multi_plot_FAST_spectrograms as cli

    monkeypatch.chdir(tmp_path)
    shutil.copytree(synth_archive["root"], tmp_path / "FAST_data")
    # The synthetic cusp TSV lives inside the archive tree; mirror it at
    # the conventional top-level name the CLI reads.
    shutil.copy(synth_archive["cusp_csv"], tmp_path / "FAST_Cusp_Indices.csv")
    (tmp_path / "FAST_data" / "cusp.tsv").unlink(missing_ok=True)

    try:
        rc = _run_main(monkeypatch, cli, [])
    finally:
        # The CLI pointed the buffered logger at this tmp dir; detach it so
        # later flushes (from other tests) don't chase a deleted path.
        from configurable_spectrograms_tpu.utils.logging import flush_log_buffer, set_logfile_path

        flush_log_buffer()
        set_logfile_path(None)
    assert rc in (0, None)
    pngs = [str(p) for p in (tmp_path / "FAST_plots").rglob("*.png")]
    assert pngs, "batch produced no figures"
    # The reference's filename scheme: scale combo + extrema suffix.
    assert any("_raw-" in p for p in pngs)
    assert any("_given_extrema-" in p for p in pngs)
    assert any("y-log_z-log" in p for p in pngs)
    # Resumable progress JSON and extrema cache in the working directory.
    assert (tmp_path / "batch_multi_plot_FAST_progress.json").exists()
    assert (tmp_path / "FAST_calculated_extrema.json").exists()


def test_batch_cli_schedule_env_knob(monkeypatch, tmp_path):
    """``CST_BATCH_SCHEDULE`` selects the multi-combo schedule for the
    flagless flagship CLI (default orbit-major; ``combo-major`` restores
    the reference's loop shape, reference
    batch_multi_plot_FAST_spectrograms.py:79-103)."""
    import batch_multi_plot_FAST_spectrograms as cli

    monkeypatch.chdir(tmp_path)
    captured = {}

    class _Cfg:
        def __init__(self, **kw):
            captured.update(kw)

        def run(self):
            return []

    monkeypatch.setattr(cli, "FastBatchConfig", _Cfg)
    try:
        monkeypatch.delenv("CST_BATCH_SCHEDULE", raising=False)
        cli.main()
        assert captured["schedule"] == "orbit-major"
        monkeypatch.setenv("CST_BATCH_SCHEDULE", "combo-major")
        cli.main()
        assert captured["schedule"] == "combo-major"
    finally:
        from configurable_spectrograms_tpu.utils.logging import flush_log_buffer, set_logfile_path

        flush_log_buffer()
        set_logfile_path(None)


def test_run_cli_prints_systemexit_message(tmp_path):
    """sys.exit("message") semantics survive run_cli's os._exit path: the
    message reaches stderr and the exit code maps to 1."""
    import pathlib
    import subprocess

    repo = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import sys;"
        "from configurable_spectrograms_tpu.cli.common import run_cli;"
        "run_cli(lambda: sys.exit('boom: bad input'))"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=tmp_path, env=env, timeout=240,
    )
    assert proc.returncode == 1, (proc.returncode, proc.stderr)
    assert "boom: bad input" in proc.stderr


def test_load_filtered_orbits_malformed_csv_returns_none(tmp_path):
    """Undecodable cusp files degrade to marker-free plots (None), never an
    escaping exception (docstring contract used by the batch driver)."""
    from configurable_spectrograms_tpu.data import cdf_utils

    bad = tmp_path / "bad.csv"
    bad.write_bytes(b"\xff\xfe\x00\x01\xffgarbage\xff\x00")
    assert cdf_utils.load_filtered_orbits(str(bad)) is None
