"""The host (numpy) backend must match the device pipeline and the oracle."""

import numpy as np
import pytest

from configurable_spectrograms_tpu.render.host_quantize import host_collapse, host_quantize
from configurable_spectrograms_tpu.render.tile import TimeWindow, make_x_map, resample_indices
from tests.oracle import oracle_tile


def test_host_collapse_matches_nansum(rng):
    cube = rng.normal(size=(20, 8, 12)).astype(np.float32)
    cube[rng.random(cube.shape) < 0.2] = np.nan
    mask = rng.random(8) < 0.5
    np.testing.assert_allclose(host_collapse(cube, mask), np.nansum(cube[:, mask, :], axis=1), rtol=1e-6)


@pytest.mark.parametrize(
    "y_scale,z_scale", [("linear", "linear"), ("linear", "log"), ("log", "linear"), ("log", "log")]
)
def test_host_quantize_matches_oracle(rng, y_scale, z_scale):
    T, E = 40, 16
    matrix = (rng.random((T, E)) * 700).astype(np.float32)
    matrix[rng.random(matrix.shape) < 0.05] = 0.0
    energy = np.geomspace(20000, 5, E).astype(np.float32)
    H, W = 48, 64
    window = TimeWindow(4, 30, (4.0, 33.0), (4.0, 33.0))
    x_map = make_x_map(window, W)
    e_valid = (energy >= 0) & (energy <= 4000)
    from configurable_spectrograms_tpu.ops import colormap_lut

    q = host_quantize(matrix, energy, e_valid, window.t_start, window.t_count,
                      (None, None), y_scale, z_scale, 1.0, 99.0)
    got = resample_indices(
        q["idx"], q["kept_pos"], q["n_kept"], q["flip"], q["y0"], q["y1"],
        window.t_start, window.t_count, x_map, H, W, y_scale, colormap_lut("viridis"),
        empty=q["empty"],
    )
    exp_idx, vmin, vmax = oracle_tile(
        matrix, energy, 0.0, 4000.0, window.t_start, window.t_count, x_map, H, W,
        y_scale, z_scale, None, None,
    )
    lut = colormap_lut("viridis")
    lut_ext = np.concatenate([lut, np.array([[255, 255, 255, 255]], np.uint8)])
    exp_safe = np.where(exp_idx < 0, 256, exp_idx)
    expected = lut_ext[exp_safe]
    mism = np.any(got != expected, axis=-1)
    assert mism.mean() < 0.02, f"host-vs-oracle mismatch {mism.mean():.4f}"
    if mism.any():
        # Every mismatching pixel must be within 1 LUT index of the oracle
        # (the fraction bound alone would accept a whole wrongly-colored
        # boundary row).
        got_idx = np.full(mism.shape, -9, np.int32)
        for cand in range(257):
            got_idx[np.all(got == lut_ext[cand], axis=-1)] = cand
        assert np.all(np.abs(got_idx[mism] - exp_safe[mism]) <= 1), (
            f"{mism.sum()} pixels differ by more than 1 LUT index"
        )
    np.testing.assert_allclose(q["vmin"], vmin, rtol=1e-4)
    np.testing.assert_allclose(q["vmax"], vmax, rtol=1e-4)


def test_host_backend_full_figure(monkeypatch, rng, tmp_path):
    """CST_RENDER_BACKEND=host renders a full figure identical in structure."""
    from configurable_spectrograms_tpu.data.synthetic import synth_instrument_arrays
    from configurable_spectrograms_tpu.render import dispatch as figure_mod
    from configurable_spectrograms_tpu.render import drain as drain_mod
    from configurable_spectrograms_tpu.render import panel as panel_mod
    from configurable_spectrograms_tpu.render.plotting import generic_plot_multirow_optional_zoom

    a = synth_instrument_arrays(rng, n_time=80, n_angle=8, n_energy=16)
    ds = [{"x": a["time_unix"], "y": a["energy"][0, 0, :], "data": a["data"], "label": "R"}]
    marks = [float(a["time_unix"][30]), float(a["time_unix"][50])]

    def render(mode):
        monkeypatch.setitem(figure_mod._BACKEND, "mode", mode)
        monkeypatch.setitem(figure_mod._BACKEND, "forced_host", False)
        fig, _ = generic_plot_multirow_optional_zoom(ds, vertical_lines=marks, z_scale="log",
                                                     colormap="inferno")
        return np.asarray(fig.render(dpi=60))

    host_img = render("host")
    dev_img = render("device")
    # Same shape; pixel content may differ by float32-vs-XLA rounding at
    # quantization boundaries only.
    assert host_img.shape == dev_img.shape
    frac_diff = (host_img != dev_img).any(axis=-1).mean()
    assert frac_diff < 0.02, f"host/device figures diverge on {frac_diff:.4f} of pixels"


def test_auto_backend_calibration_flip(monkeypatch, rng):
    """A slow readback (above the hard-floor bandwidth, so the <1 MB/s trip
    never fires) triggers the one-shot readback-vs-host calibration, flips to
    the host backend, and the figure pixels still match a pure-host render."""
    import time

    from configurable_spectrograms_tpu.data.synthetic import synth_instrument_arrays
    from configurable_spectrograms_tpu.render import dispatch as figure_mod
    from configurable_spectrograms_tpu.render import drain as drain_mod
    from configurable_spectrograms_tpu.render import panel as panel_mod
    from configurable_spectrograms_tpu.render.plotting import generic_plot_multirow_optional_zoom

    a = synth_instrument_arrays(rng, n_time=60, n_angle=6, n_energy=16)
    ds = [{"x": a["time_unix"], "y": a["energy"][0, 0, :], "data": a["data"], "label": "R"}]

    real_readback = figure_mod._readback

    def slow_readback(out_dev):
        time.sleep(0.25)
        return real_readback(out_dev)

    monkeypatch.setitem(figure_mod._BACKEND, "mode", "auto")
    monkeypatch.setitem(figure_mod._BACKEND, "forced_host", False)
    monkeypatch.setitem(figure_mod._BACKEND, "calibrated", False)
    monkeypatch.setattr(drain_mod, "_readback", slow_readback)
    fig, _ = generic_plot_multirow_optional_zoom(ds, z_scale="log", colormap="inferno")
    auto_img = np.asarray(fig.render(dpi=60))
    assert figure_mod._BACKEND["calibrated"]
    assert figure_mod._BACKEND["forced_host"]

    monkeypatch.setattr(drain_mod, "_readback", real_readback)
    monkeypatch.setitem(figure_mod._BACKEND, "mode", "host")
    monkeypatch.setitem(figure_mod._BACKEND, "forced_host", False)
    fig2, _ = generic_plot_multirow_optional_zoom(ds, z_scale="log", colormap="inferno")
    host_img = np.asarray(fig2.render(dpi=60))
    assert auto_img.shape == host_img.shape
    assert (auto_img != host_img).any(axis=-1).mean() < 0.02


def test_host_quantize_empty():
    q = host_quantize(np.full((4, 3), np.nan, np.float32), np.array([1.0, 2.0, 3.0], np.float32),
                      np.ones(3, bool), 0, 4, (None, None), "linear", "linear", 1, 99)
    assert q["empty"]


def test_reprobe_restores_device_backend(monkeypatch):
    """After a forced-host switch, a successful periodic reprobe un-forces it."""
    import time

    from configurable_spectrograms_tpu.render import figure
    from configurable_spectrograms_tpu.render import link

    monkeypatch.setitem(figure._BACKEND, "mode", "auto")
    monkeypatch.setitem(figure._BACKEND, "forced_host", True)
    monkeypatch.setitem(figure._BACKEND, "calibrated", True)
    monkeypatch.setitem(figure._BACKEND, "last_probe_ts", 0.0)
    monkeypatch.setitem(figure._BACKEND, "reprobe_inflight", False)
    monkeypatch.setattr(link, "_REPROBE_INTERVAL_SEC", 0.0)

    figure.maybe_reprobe_device_link()
    deadline = time.monotonic() + 30
    while figure._BACKEND["forced_host"] and time.monotonic() < deadline:
        time.sleep(0.05)
    # On the CPU test backend the round trip always succeeds quickly.
    assert not figure._BACKEND["forced_host"]
    assert not figure._BACKEND["calibrated"]


def test_cold_link_warm_start_promotion(monkeypatch):
    """A probe that outlasts the sync window forces host immediately (no
    caller stall), then promotes back to the device backend when the link's
    first round trip lands."""
    import time

    from configurable_spectrograms_tpu.render import figure
    from configurable_spectrograms_tpu.render import link

    monkeypatch.setitem(figure._BACKEND, "mode", "auto")
    monkeypatch.setitem(figure._BACKEND, "forced_host", False)
    monkeypatch.setitem(figure._BACKEND, "probed", False)
    monkeypatch.setitem(figure._BACKEND, "calibrated", True)
    monkeypatch.setattr(link, "_PROBE_SYNC_WAIT_SEC", 0.05)

    def slow_ok_probe():
        time.sleep(0.4)
        return {"ok": True, "steady_dt": 0.001}

    monkeypatch.setattr(link, "_link_roundtrip_probe", slow_ok_probe)
    t0 = time.monotonic()
    figure.probe_device_link()
    assert time.monotonic() - t0 < 0.35  # returned before the probe finished
    assert figure._BACKEND["forced_host"]  # host-side while the link warms

    deadline = time.monotonic() + 10
    while figure._BACKEND["forced_host"] and time.monotonic() < deadline:
        time.sleep(0.02)
    assert not figure._BACKEND["forced_host"]  # promoted on probe success
    assert not figure._BACKEND["calibrated"]


def test_dead_link_stays_host(monkeypatch):
    """A probe that fails after the sync window leaves the host backend
    forced (recovery is the periodic reprobe's job)."""
    import time

    from configurable_spectrograms_tpu.render import figure
    from configurable_spectrograms_tpu.render import link

    monkeypatch.setitem(figure._BACKEND, "mode", "auto")
    monkeypatch.setitem(figure._BACKEND, "forced_host", False)
    monkeypatch.setitem(figure._BACKEND, "probed", False)
    monkeypatch.setattr(link, "_PROBE_SYNC_WAIT_SEC", 0.05)

    def slow_bad_probe():
        time.sleep(0.2)
        return {"ok": False, "why": "synthetic dead link"}

    monkeypatch.setattr(link, "_link_roundtrip_probe", slow_bad_probe)
    figure.probe_device_link()
    assert figure._BACKEND["forced_host"]
    time.sleep(0.5)  # give the promote watcher time to (wrongly) flip it
    assert figure._BACKEND["forced_host"]


def test_reprobe_not_due_is_noop(monkeypatch):
    from configurable_spectrograms_tpu.render import figure
    from configurable_spectrograms_tpu.render import link

    monkeypatch.setitem(figure._BACKEND, "mode", "auto")
    monkeypatch.setitem(figure._BACKEND, "forced_host", True)
    monkeypatch.setitem(figure._BACKEND, "reprobe_inflight", False)
    import time

    monkeypatch.setitem(figure._BACKEND, "last_probe_ts", time.monotonic())
    figure.maybe_reprobe_device_link()  # interval not elapsed -> no thread
    assert figure._BACKEND["forced_host"]


def test_cached_collapse_cross_render_reuse(rng):
    """The raw and given-extrema renders of one figure share collapse
    results; eviction is tied to the source cube's lifetime."""
    import gc

    from configurable_spectrograms_tpu.render import host_quantize as hq

    hq._COLLAPSE_CACHE.clear()

    cube = (rng.random((64, 8, 16)) * 10).astype(np.float32)
    mask = np.zeros(8, bool)
    mask[1:5] = True
    calls = {"clean": 0}

    def provider():
        calls["clean"] += 1
        return hq.host_clean(cube)

    m1 = hq.cached_collapse(cube, mask, provider)
    m2 = hq.cached_collapse(cube, mask, provider)
    assert m1 is m2 and calls["clean"] == 1  # second render: pure hit
    np.testing.assert_array_equal(m1, hq.host_collapse(cube, mask))
    del cube, m1, m2
    gc.collect()
    assert not hq._COLLAPSE_CACHE


def test_canvas_pool_keeps_recycling_past_size_cap():
    """Releasing a 5th distinct canvas size must evict an old size and keep
    pooling, not permanently disable recycling (a batch mixing pitch grids,
    instrument grids, and generic sets crosses the cap easily)."""
    from configurable_spectrograms_tpu.render import compositor as F

    with F._CANVAS_POOL_LOCK:
        saved = dict(F._CANVAS_POOL)
        F._CANVAS_POOL.clear()
    try:
        for h in (11, 22, 33, 44, 55, 66):
            F._release_canvas(np.full((h, 8, 4), 255, np.uint8))
        assert len(F._CANVAS_POOL) <= F._CANVAS_POOL_MAX_SIZES
        c = F._acquire_canvas(66, 8)  # newest size still pooled
        ptr = c.ctypes.data
        F._release_canvas(c)
        del c  # production pattern: release fires when the Image is GC'd
        assert F._acquire_canvas(66, 8).ctypes.data == ptr
    finally:
        with F._CANVAS_POOL_LOCK:
            F._CANVAS_POOL.clear()
            F._CANVAS_POOL.update(saved)


def test_canvas_pool_never_recycles_externally_held_buffer():
    """An embedder that extracted ``img._np_canvas`` and still holds it must
    not see its pixels reset and redrawn by an unrelated later figure: a
    pooled canvas with a surviving external reference is dropped at acquire
    time, never reused (round-2 advisor finding)."""
    from configurable_spectrograms_tpu.render import compositor as F

    with F._CANVAS_POOL_LOCK:
        saved = dict(F._CANVAS_POOL)
        F._CANVAS_POOL.clear()
    try:
        held = F._acquire_canvas(24, 8)
        held[...] = 7  # the embedder's pixels
        F._release_canvas(held)  # simulates the finalizer firing anyway
        fresh = F._acquire_canvas(24, 8)
        assert fresh.ctypes.data != held.ctypes.data
        assert (held == 7).all()  # the held buffer was never touched
    finally:
        with F._CANVAS_POOL_LOCK:
            F._CANVAS_POOL.clear()
            F._CANVAS_POOL.update(saved)


def test_bandwidth_preselection(monkeypatch):
    """A link that answers pings but measures below the pre-selection
    bandwidth is pre-forced to the host backend (why_host='bandwidth');
    a fast measurement restores the device backend."""
    from configurable_spectrograms_tpu.render import figure
    from configurable_spectrograms_tpu.render import link

    monkeypatch.setitem(figure._BACKEND, "mode", "auto")
    monkeypatch.setitem(figure._BACKEND, "forced_host", False)
    monkeypatch.setitem(figure._BACKEND, "why_host", None)
    monkeypatch.setitem(figure._BACKEND, "probed", False)
    monkeypatch.setattr(
        link, "_link_roundtrip_probe", lambda: {"ok": True, "mbps": 2.0}
    )
    figure.probe_device_link()
    assert figure._BACKEND["forced_host"] is True
    assert figure._BACKEND["why_host"] == "bandwidth"

    # Recovery via reprobe with a healthy bandwidth measurement.
    monkeypatch.setitem(figure._BACKEND, "last_probe_ts", 0.0)
    monkeypatch.setitem(figure._BACKEND, "reprobe_inflight", False)
    monkeypatch.setattr(link, "_REPROBE_INTERVAL_SEC", 0.0)
    monkeypatch.setattr(
        link, "_link_roundtrip_probe", lambda: {"ok": True, "mbps": 800.0}
    )
    import time

    figure.maybe_reprobe_device_link()
    deadline = time.monotonic() + 30
    while figure._BACKEND["forced_host"] and time.monotonic() < deadline:
        time.sleep(0.05)
    assert figure._BACKEND["forced_host"] is False
    assert figure._BACKEND["why_host"] is None


def test_probe_without_bandwidth_counts_as_healthy(monkeypatch):
    """Outcomes lacking an mbps field (partial probes) must not pre-select."""
    from configurable_spectrograms_tpu.render import figure
    from configurable_spectrograms_tpu.render import link

    monkeypatch.setitem(figure._BACKEND, "mode", "auto")
    monkeypatch.setitem(figure._BACKEND, "forced_host", False)
    monkeypatch.setitem(figure._BACKEND, "why_host", None)
    monkeypatch.setitem(figure._BACKEND, "probed", False)
    monkeypatch.setattr(link, "_link_roundtrip_probe", lambda: {"ok": True})
    figure.probe_device_link()
    assert figure._BACKEND["forced_host"] is False


def test_percentile_bounds_cache_shared_across_panels(rng):
    """Full and zoom panels (and different z scales) sharing one matrix and
    selection compute the percentile pool once; results are identical to
    the uncached computation and explicit-bound variants keep distinct
    keys."""
    from configurable_spectrograms_tpu.render import host_quantize as hq

    hq._BOUNDS_CACHE.clear()
    m = (rng.random((256, 16)) * 900).astype(np.float32)
    m[rng.random(m.shape) < 0.03] = np.nan
    energy = np.geomspace(20000, 5, 16).astype(np.float32)
    e_valid = (energy >= 0) & (energy <= 4000)

    full = hq.host_quantize(m, energy, e_valid, 0, 256, (None, None), "linear", "linear",
                            1.0, 99.0, zb_e_valid=e_valid, zb_full_time=True)
    n1 = len(hq._BOUNDS_CACHE)
    zoom = hq.host_quantize(m, energy, e_valid, 100, 40, (None, None), "linear", "log",
                            1.0, 99.0, zb_e_valid=e_valid, zb_full_time=True)
    assert len(hq._BOUNDS_CACHE) == n1  # pure hit: same full-time pool
    assert (zoom["vmin"], zoom["vmax"]) == (full["vmin"], full["vmax"])
    pool = m[~np.isnan(m) & e_valid[None, :]]
    assert full["vmin"] == float(np.percentile(pool, 1.0))
    assert full["vmax"] == float(np.percentile(pool, 99.0))

    # A different explicit zmin over the same matrix must not alias.
    q5 = hq.host_quantize(m, energy, e_valid, 0, 256, (5.0, None), "linear", "linear",
                          1.0, 99.0, zb_e_valid=e_valid, zb_full_time=True)
    q7 = hq.host_quantize(m, energy, e_valid, 0, 256, (7.0, None), "linear", "linear",
                          1.0, 99.0, zb_e_valid=e_valid, zb_full_time=True)
    assert (q5["vmin"], q7["vmin"]) == (5.0, 7.0)
    assert q5["vmax"] == q7["vmax"] == full["vmax"]
