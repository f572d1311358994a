"""Orbit-major multi-combo scheduling: equivalence, decode reuse, resume.

The orbit-major driver (`FAST_plot_spectrograms_multi`) must be an exact
drop-in for the reference flagship's combo-major loop (reference
batch_multi_plot_FAST_spectrograms.py:88-103): identical PNG bytes,
identical progress/extrema state — while decoding each CDF once per run
instead of once per combo.
"""

import json
import os

from configurable_spectrograms_tpu.data import cdf_utils
from configurable_spectrograms_tpu.data.synthetic import synth_fast_archive
from configurable_spectrograms_tpu.fast.batch_directory import (
    FAST_plot_spectrograms_directory,
    FAST_plot_spectrograms_multi,
)

COMBOS = (("linear", "linear", "viridis"), ("log", "log", "inferno"))

_DRIVER_KW = dict(
    zoom_duration_minutes=6,
    use_tqdm=False,
    retry_timeouts=False,
    orbit_timeout_seconds=600,
    instrument_timeout_seconds=300,
    max_workers=1,
    override_plots=True,
    max_processing_percentile=95,
)


def _tree_bytes(base: str) -> dict[str, bytes]:
    out = {}
    for root, _dirs, files in os.walk(base):
        for name in files:
            p = os.path.join(root, name)
            out[os.path.relpath(p, base)] = open(p, "rb").read()
    return out


def _reset_dataset_cache(monkeypatch):
    monkeypatch.setattr(cdf_utils, "_dataset_cache", {})
    monkeypatch.setattr(cdf_utils, "_dataset_cache_bytes", 0)
    monkeypatch.setattr(cdf_utils, "_dataset_inflight", {})
    monkeypatch.setattr(cdf_utils, "_dataset_cache_stats", {"hits": 0, "misses": 0, "waits": 0})


def test_orbit_major_matches_combo_major(tmp_path, monkeypatch):
    """Same PNG bytes, same progress keys, same extrema — different order."""
    data = str(tmp_path / "data")
    synth_fast_archive(data, [4100, 4101], n_time=48, n_angle=8, n_energy=16)

    _reset_dataset_cache(monkeypatch)
    results_a = []
    for y, z, cmap in COMBOS:
        results_a += FAST_plot_spectrograms_directory(
            data,
            output_base=str(tmp_path / "out_a"),
            y_scale=y,
            z_scale=z,
            colormap=cmap,
            progress_json_path=str(tmp_path / "pa.json"),
            extrema_json_path=str(tmp_path / "ea.json"),
            **_DRIVER_KW,
        )

    _reset_dataset_cache(monkeypatch)
    results_b = FAST_plot_spectrograms_multi(
        data,
        combos=COMBOS,
        output_base=str(tmp_path / "out_b"),
        progress_json_path=str(tmp_path / "pb.json"),
        extrema_json_path=str(tmp_path / "eb.json"),
        **_DRIVER_KW,
    )

    # 2 orbits x 2 combos x (raw + given-extrema submissions)
    assert [r["status"] for r in results_a] == ["ok"] * 8
    assert sorted((r["orbit"], r["status"]) for r in results_b) == sorted(
        (r["orbit"], r["status"]) for r in results_a
    )

    tree_a, tree_b = _tree_bytes(str(tmp_path / "out_a")), _tree_bytes(str(tmp_path / "out_b"))
    assert sorted(tree_a) == sorted(tree_b)
    assert len(tree_a) == 2 * 2 * 2 * (4 + 1)  # orbits x combos x raw/given x (4 pitch + grid)
    mismatched = [p for p in tree_a if tree_a[p] != tree_b[p]]
    assert mismatched == []

    progress_a = json.load(open(tmp_path / "pa.json"))
    progress_b = json.load(open(tmp_path / "pb.json"))
    assert progress_a == progress_b
    extrema_a = json.load(open(tmp_path / "ea.json"))
    extrema_b = json.load(open(tmp_path / "eb.json"))
    assert extrema_a == extrema_b


def test_orbit_major_decodes_each_file_once(tmp_path, monkeypatch):
    """Under a one-orbit cache budget, combo-major re-decodes the archive
    per combo; orbit-major decodes each file exactly once."""
    data = str(tmp_path / "data")
    files = synth_fast_archive(data, [4100, 4101], n_time=48, n_angle=8, n_energy=16)
    n_files = sum(len(v) for v in files.values())

    # Budget fits one orbit's four cubes but not two orbits.
    one_orbit_bytes = sum(
        a.nbytes
        for path in files[4100].values()
        for a in cdf_utils.load_fast_cdf_dataset(path).values()
    )
    monkeypatch.setattr(cdf_utils, "_DATASET_CACHE_MAX_BYTES", int(one_orbit_bytes * 1.5))

    kw = dict(_DRIVER_KW, max_processing_percentile=None)

    _reset_dataset_cache(monkeypatch)
    for y, z, cmap in COMBOS:
        FAST_plot_spectrograms_directory(
            data,
            output_base=str(tmp_path / "out_a"),
            y_scale=y,
            z_scale=z,
            colormap=cmap,
            progress_json_path=None,
            **kw,
        )
    combo_major_misses = cdf_utils.dataset_cache_stats()["misses"]

    _reset_dataset_cache(monkeypatch)
    FAST_plot_spectrograms_multi(
        data,
        combos=COMBOS,
        output_base=str(tmp_path / "out_b"),
        progress_json_path=None,
        **kw,
    )
    orbit_major_misses = cdf_utils.dataset_cache_stats()["misses"]

    assert orbit_major_misses == n_files
    assert combo_major_misses == n_files * len(COMBOS)


def test_orbit_major_resume_skips_everything(tmp_path):
    data = str(tmp_path / "data")
    synth_fast_archive(data, [4100], n_time=48, n_angle=8, n_energy=16)
    kw = dict(
        combos=COMBOS,
        output_base=str(tmp_path / "out"),
        progress_json_path=str(tmp_path / "p.json"),
        extrema_json_path=str(tmp_path / "e.json"),
        **_DRIVER_KW,
    )
    first = FAST_plot_spectrograms_multi(data, **kw)
    assert [r["status"] for r in first] == ["ok"] * 4  # 1 orbit x 2 combos x raw/given
    second = FAST_plot_spectrograms_multi(data, **kw)
    assert second == []
    state = json.load(open(tmp_path / "p.json"))
    assert state["linear_linear_last_orbit"] == 4100
    assert state["log_log_last_orbit"] == 4100


def test_fast_batch_config_schedule_dispatch(tmp_path):
    from configurable_spectrograms_tpu.utils.config import FastBatchConfig, ScaleCombo

    cfg = FastBatchConfig(
        directory_path=str(tmp_path / "data"),
        output_base=str(tmp_path / "out"),
        combos=(ScaleCombo("linear", "linear", "viridis"), ScaleCombo("log", "log", "inferno")),
        progress_json_path=str(tmp_path / "p.json"),
        max_processing_percentile=None,
        use_tqdm=False,
        retry_timeouts=False,
        max_workers=1,
        override_plots=True,
        schedule="sideways",
    )
    import pytest

    with pytest.raises(ValueError, match="schedule"):
        cfg.run()

    synth_fast_archive(str(tmp_path / "data"), [4100], n_time=32, n_angle=8, n_energy=16)
    results = cfg.replace(schedule="orbit-major").run()
    assert [r["status"] for r in results] == ["ok"] * 2
