"""Tests for cdf_utils / orbit_discovery / synthetic archive behavior."""

import numpy as np
import pandas as pd

from configurable_spectrograms_tpu.data.cdf_utils import (
    get_cdf_file_type,
    get_timestamps_for_orbit,
    load_fast_cdf_dataset,
    load_filtered_orbits,
)
from configurable_spectrograms_tpu.data.orbit_discovery import (
    classify_error_reason,
    discover_orbit_files,
    extract_orbit_and_instrument,
    parse_year_month,
    resolve_orbit_from_files,
    resolve_shared_orbit,
)


def test_get_cdf_file_type():
    assert get_cdf_file_type("fa_esa_l2_eeb_20000101001737_13312_v02.cdf") == "eeb"
    assert get_cdf_file_type("fa_k0_orb_13312_v01.cdf") == "orb"
    assert get_cdf_file_type("x/y/FA_ESA_L2_IES_20000101_5_v02.CDF") == "ies"
    assert get_cdf_file_type("whatever.cdf") is None


def test_extract_orbit_and_instrument():
    assert extract_orbit_and_instrument("fa_esa_l2_eeb_20000101001737_13312_v02.cdf") == (
        13312,
        "eeb",
        "fa_esa_l2_eeb_20000101001737_13312_v02.cdf",
    )
    assert extract_orbit_and_instrument("fa_k0_orb_13312_v01.cdf") is None
    assert extract_orbit_and_instrument("fa_esa_l2_eeb_x_notanorbit_v02.cdf") is None
    assert extract_orbit_and_instrument("short.cdf") is None


def test_parse_year_month():
    assert parse_year_month("./FAST_data/2000/01/f.cdf") == ("2000", "01")
    assert parse_year_month("nope.cdf") == ("unknown", "unknown")


def test_classify_error_reason():
    assert classify_error_reason("divide by zero encountered") == "divide-by-zero"
    assert classify_error_reason("x is not a CDF file or invalid cdf") == "invalid-cdf"
    assert classify_error_reason("Timeout hit") == "timeout"
    assert classify_error_reason("plotting exploded") == "plotting"
    assert classify_error_reason("???") == "generic"


def test_get_timestamps_for_orbit():
    orbits = pd.DataFrame({"orbit": [42, 43], "ees min index": [1, 2], "ees max index": [3, 2]})
    times = np.array([100.0, 200.0, 300.0, 400.0])
    assert get_timestamps_for_orbit(orbits, 42, "ees", times) == [200.0, 400.0]
    assert get_timestamps_for_orbit(orbits, 43, "ees", times) == [300.0]  # degenerate
    assert get_timestamps_for_orbit(orbits, 99, "ees", times) == []
    assert get_timestamps_for_orbit(None, 42, "ees", times) == []
    # Index clamping
    big = pd.DataFrame({"orbit": [1], "ies min index": [-5], "ies max index": [999]})
    assert get_timestamps_for_orbit(big, 1, "ies", times) == [100.0, 400.0]


def test_orbit_row_cache_semantics():
    """The per-frame orbit-row cache matches the boolean-scan semantics:
    first duplicate row wins, numeric key types interoperate, and the
    cache entry dies with its dataframe."""
    from configurable_spectrograms_tpu.data import cdf_utils

    times = np.array([10.0, 20.0, 30.0, 40.0])
    dup = pd.DataFrame(
        {"orbit": [5, 5], "ees min index": [0, 3], "ees max index": [1, 3]}
    )
    # First row wins (reference .iloc[0]): indices (0, 1), not (3, 3).
    assert get_timestamps_for_orbit(dup, 5, "ees", times) == [10.0, 20.0]
    # np.int64 orbit argument hits the same entry.
    assert get_timestamps_for_orbit(dup, np.int64(5), "ees", times) == [10.0, 20.0]
    # Repeat call is served from the cache and stays correct.
    assert get_timestamps_for_orbit(dup, 5, "ees", times) == [10.0, 20.0]
    key_count = len(cdf_utils._orbit_row_cache)
    assert key_count >= 1
    del dup
    import gc

    gc.collect()
    assert len(cdf_utils._orbit_row_cache) < key_count  # evicted on frame death


def test_orbit_row_cache_sees_inplace_mutation():
    """In-place edits of the relevant columns invalidate the cached map.

    The cache replaces the reference's per-call boolean scan; its column
    fingerprint must keep the public API's re-read semantics when a
    caller mutates the frame between calls (and ONLY edits to the three
    columns this function reads force a rebuild)."""
    times = np.array([10.0, 20.0, 30.0, 40.0])
    df = pd.DataFrame(
        {"orbit": [5], "ees min index": [0], "ees max index": [1], "note": ["x"]}
    )
    assert get_timestamps_for_orbit(df, 5, "ees", times) == [10.0, 20.0]
    df.loc[0, "ees min index"] = 2  # in-place mutation after the first lookup
    assert get_timestamps_for_orbit(df, 5, "ees", times) == [30.0, 20.0]
    # Unrelated-column edits keep serving the (still-valid) cached map.
    df.loc[0, "note"] = "y"
    assert get_timestamps_for_orbit(df, 5, "ees", times) == [30.0, 20.0]


def test_resolve_shared_orbit_and_from_files():
    assert resolve_shared_orbit(
        {
            "eeb": ["fa_esa_l2_eeb_20000101001737_100_v02.cdf", "fa_esa_l2_eeb_20000101031737_101_v02.cdf"],
            "ies": ["fa_esa_l2_ies_20000101001738_100_v02.cdf"],
        }
    ) == (
        100,
        {"eeb": "fa_esa_l2_eeb_20000101001737_100_v02.cdf", "ies": "fa_esa_l2_ies_20000101001738_100_v02.cdf"},
    )
    assert resolve_shared_orbit({"eeb": [], "ies": []}) == (None, {})
    assert resolve_orbit_from_files({"eeb": "fa_esa_l2_eeb_20000101001737_13312_v02.cdf"}) == 13312
    assert resolve_orbit_from_files({"eeb": "not_a_fast_file.cdf"}) is None


def test_synth_archive_discovery_and_load(synth_archive):
    mapping = discover_orbit_files(synth_archive["root"])
    assert sorted(mapping) == synth_archive["orbits"]
    for orbit, inst_files in mapping.items():
        assert sorted(inst_files) == ["eeb", "ees", "ieb", "ies"]
    ds = load_fast_cdf_dataset(mapping[100]["ees"])
    assert ds["data"].shape == (96, 16, 24)
    assert ds["energy"].shape == (24,)
    assert ds["pitch_angle"].shape == (16,)
    assert ds["energy"][0] > ds["energy"][-1]  # descending, like real FAST
    assert np.isnan(ds["data"]).any()


def test_load_transposes_energy_major(tmp_path):
    """A (time, energy, pitch) stored cube is transposed to (time, pitch, energy)."""
    from configurable_spectrograms_tpu.data.cdf import write_cdf

    T, E, A = 5, 7, 3
    data_te_a = np.arange(T * E * A, dtype=np.float32).reshape(T, E, A)
    energy = np.tile(np.geomspace(100, 1, E).astype(np.float32)[None, None, :], (T, A, 1))
    pitch = np.tile(np.linspace(0, 360, A, endpoint=False).astype(np.float32)[None, :, None], (T, 1, E))
    path = str(tmp_path / "fa_esa_l2_ees_20000101_77_v02.cdf")
    write_cdf(
        path,
        {"time_unix": np.arange(T, dtype=np.float64), "data": data_te_a, "energy": energy, "pitch_angle": pitch},
    )
    ds = load_fast_cdf_dataset(path)
    assert ds["data"].shape == (T, A, E)
    np.testing.assert_array_equal(ds["data"], np.transpose(data_te_a, (0, 2, 1)))


def test_load_filtered_orbits(synth_archive):
    df = load_filtered_orbits(synth_archive["cusp_csv"])
    assert df is not None
    assert list(df["Orbit Number"]) == synth_archive["orbits"]
    times = np.arange(96, dtype=np.float64) * 10.0
    marks = get_timestamps_for_orbit(df, 100, "ees", times)
    assert len(marks) == 2 and marks[0] < marks[1]
    assert load_filtered_orbits("/nonexistent/nope.tsv") is None


def test_resolve_shared_orbit_tie_breaks_low():
    """Equal instrument coverage ties resolve to the lowest orbit number."""
    files = {
        "ees": ["fa_esa_l2_ees_20000101000000_200_v02.cdf", "fa_esa_l2_ees_20000102000000_100_v02.cdf"],
        "ieb": ["fa_esa_l2_ieb_20000101000000_200_v02.cdf", "fa_esa_l2_ieb_20000102000000_100_v02.cdf"],
    }
    orbit, mapping = resolve_shared_orbit(files)
    assert orbit == 100
    assert sorted(mapping) == ["ees", "ieb"]


def test_real_cusp_indices_dataset():
    """The shipped FAST_Cusp_Indices.csv (the reference's real 2000-2001
    cusp-event index, reference FAST_Cusp_Indices.csv:1) loads and yields
    the reference's timestamps for known orbits."""
    import os

    import numpy as np

    from configurable_spectrograms_tpu.data.cdf_utils import (
        get_timestamps_for_orbit,
        load_filtered_orbits,
    )

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "FAST_Cusp_Indices.csv")
    df = load_filtered_orbits(path)
    assert df is not None and len(df) == 324
    times = np.arange(1000, dtype=np.float64) * 10.0 + 5.0

    # Orbit 13519 ees: min/Max indices 423/464 in the real dataset.
    assert get_timestamps_for_orbit(df, 13519, "ees", times) == [times[423], times[464]]
    # Orbit 13572 ees is degenerate (min == Max) -> single timestamp.
    row = df[df["Orbit Number"] == 13572].iloc[0]
    lo = int(row["ees min Index"])
    assert get_timestamps_for_orbit(df, 13572, "ees", times) == [times[lo]]
    # Orbit 13477 eeb has no recorded indices -> no markers.
    assert get_timestamps_for_orbit(df, 13477, "eeb", times) == []
    # Unknown orbit -> no markers.
    assert get_timestamps_for_orbit(df, 1, "ees", times) == []


def test_oversized_dataset_load_leaves_cache_intact(tmp_path, monkeypatch):
    """A file bigger than the whole cache budget is served uncached and
    must NOT evict other workers' resident datasets making room for an
    insertion that can never happen."""
    from configurable_spectrograms_tpu.data import cdf_utils
    from configurable_spectrograms_tpu.data.synthetic import synth_fast_cdf

    monkeypatch.setattr(cdf_utils, "_DATASET_CACHE_MAX_BYTES", 300_000)
    monkeypatch.setattr(cdf_utils, "_dataset_cache", {})
    monkeypatch.setattr(cdf_utils, "_dataset_cache_bytes", 0)
    small = str(tmp_path / "small.cdf")
    big = str(tmp_path / "big.cdf")
    synth_fast_cdf(small, 1, "ees", n_time=16, n_angle=4, n_energy=8)
    synth_fast_cdf(big, 2, "ees", n_time=2048, n_angle=32, n_energy=48)
    cdf_utils.load_fast_cdf_dataset(small)
    n_before = len(cdf_utils._dataset_cache)
    assert n_before == 1
    small_key = next(iter(cdf_utils._dataset_cache))
    cdf_utils.load_fast_cdf_dataset(big)
    # The SMALL entry must survive (length alone would also pass if the
    # oversized load evicted it and inserted itself).
    assert small_key in cdf_utils._dataset_cache
    assert len(cdf_utils._dataset_cache) == n_before


def test_dataset_load_single_flight(tmp_path, monkeypatch):
    """Concurrent misses on one file decode it once; waiters share the arrays."""
    import threading

    from configurable_spectrograms_tpu.data import cdf_utils
    from configurable_spectrograms_tpu.data.synthetic import synth_fast_cdf

    monkeypatch.setattr(cdf_utils, "_dataset_cache", {})
    monkeypatch.setattr(cdf_utils, "_dataset_cache_bytes", 0)
    monkeypatch.setattr(cdf_utils, "_dataset_inflight", {})
    monkeypatch.setattr(cdf_utils, "_dataset_cache_stats", {"hits": 0, "misses": 0, "waits": 0})
    path = str(tmp_path / "one.cdf")
    synth_fast_cdf(path, 1, "ees", n_time=64, n_angle=8, n_energy=16)

    real_decode = cdf_utils._decode_fast_cdf
    barrier = threading.Barrier(4)
    decode_calls = []

    def slow_decode(p, names):
        decode_calls.append(p)
        return real_decode(p, names)

    monkeypatch.setattr(cdf_utils, "_decode_fast_cdf", slow_decode)

    results = [None] * 4

    def load(i):
        barrier.wait()
        results[i] = cdf_utils.load_fast_cdf_dataset(path)

    threads = [threading.Thread(target=load, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(decode_calls) == 1
    stats = cdf_utils.dataset_cache_stats()
    assert stats["misses"] == 1
    assert stats["waits"] + stats["hits"] == 3
    # Everyone shares the loader's arrays (no duplicate cubes in memory).
    assert all(r["data"] is results[0]["data"] for r in results[1:])


def test_dataset_load_single_flight_loader_failure_recovers(tmp_path, monkeypatch):
    """If the decoding thread dies, a waiter takes over instead of hanging."""
    import threading

    from configurable_spectrograms_tpu.data import cdf_utils
    from configurable_spectrograms_tpu.data.synthetic import synth_fast_cdf

    monkeypatch.setattr(cdf_utils, "_dataset_cache", {})
    monkeypatch.setattr(cdf_utils, "_dataset_cache_bytes", 0)
    monkeypatch.setattr(cdf_utils, "_dataset_inflight", {})
    monkeypatch.setattr(cdf_utils, "_dataset_cache_stats", {"hits": 0, "misses": 0, "waits": 0})
    path = str(tmp_path / "one.cdf")
    synth_fast_cdf(path, 1, "ees", n_time=32, n_angle=8, n_energy=16)

    real_decode = cdf_utils._decode_fast_cdf
    started = threading.Event()
    release = threading.Event()
    calls = []

    def decode(p, names):
        calls.append(p)
        if len(calls) == 1:
            started.set()
            release.wait(timeout=10)
            raise OSError("simulated decode failure")
        return real_decode(p, names)

    monkeypatch.setattr(cdf_utils, "_decode_fast_cdf", decode)

    outcome: dict[str, object] = {}

    def first():
        try:
            cdf_utils.load_fast_cdf_dataset(path)
        except OSError as exc:
            outcome["first"] = exc

    def second():
        started.wait(timeout=10)
        # Now guaranteed to join as a waiter on the first thread's event.
        outcome["second"] = cdf_utils.load_fast_cdf_dataset(path)

    t1 = threading.Thread(target=first)
    t2 = threading.Thread(target=second)
    t1.start()
    started.wait(timeout=10)
    t2.start()
    import time

    time.sleep(0.2)  # let the second thread park on the in-flight event
    release.set()
    t1.join(timeout=10)
    t2.join(timeout=10)
    assert not t1.is_alive() and not t2.is_alive()
    assert isinstance(outcome["first"], OSError)
    assert isinstance(outcome["second"], dict) and "data" in outcome["second"]
    assert len(calls) == 2
    assert cdf_utils._dataset_inflight == {}


def test_synth_nondefault_instrument_varies_per_orbit(tmp_path):
    """esv (beyond the default four) must get distinct data per orbit and
    a hash()-free default seed (reproducible across processes)."""
    import numpy as np

    from configurable_spectrograms_tpu.data.cdf_utils import load_fast_cdf_dataset
    from configurable_spectrograms_tpu.data.synthetic import synth_fast_archive

    m = synth_fast_archive(
        str(tmp_path), [100, 101], instruments=("ees", "esv"),
        n_time=32, n_angle=8, n_energy=16,
    )
    a = load_fast_cdf_dataset(m[100]["esv"])["data"]
    b = load_fast_cdf_dataset(m[101]["esv"])["data"]
    assert not np.array_equal(a, b)
