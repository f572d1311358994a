"""Resident device panel-result cache (render/device_results.py).

VERDICT r4 item 1: repeat renders on the device backend must not pay
dispatch/upload/readback again.  The cache is the device analog of the
host backend's resident quantize caches; these tests pin hit behavior,
bit-identical output, key sensitivity, owner eviction, and the disable
knob.
"""

import numpy as np
import pytest

from configurable_spectrograms_tpu.render import device_results, dispatch, link
from configurable_spectrograms_tpu.render.tile import TimeWindow


@pytest.fixture(autouse=True)
def _device_mode(monkeypatch):
    monkeypatch.setitem(link._BACKEND, "mode", "device")
    monkeypatch.setitem(link._BACKEND, "forced_host", False)
    monkeypatch.setitem(link._BACKEND, "probed", True)
    device_results.clear()
    yield
    device_results.clear()
    link.reset_rate_state()


def _panel(rng, n_t=64, n_a=8, n_e=16, **over):
    cube = over.pop("cube", None)
    if cube is None:
        cube = rng.uniform(1.0, 100.0, size=(n_t, n_a, n_e)).astype(np.float32)
    kw = dict(
        cube=cube,
        pitch_mask=np.ones(n_a, bool),
        energy=np.linspace(2000.0, 10.0, n_e).astype(np.float32),
        times=np.linspace(0.0, 60.0, n_t),
        window=TimeWindow(0, n_t, (0.0, 60.0), (0.0, 60.0)),
        y_min=10.0,
        y_max=2000.0,
        z_min=None,
        z_max=None,
        y_scale="log",
        z_scale="log",
        colormap="viridis",
        x_is_unix=False,
        z_label="Counts",
    )
    kw.update(over)
    return dispatch.PanelData(**kw)


def test_repeat_render_serves_from_cache_bit_identical(rng):
    cube = rng.uniform(1.0, 100.0, size=(64, 8, 16)).astype(np.float32)
    p1 = _panel(rng, cube=cube)
    pend1 = dispatch.enqueue_render_panels([p1], 16, 24)
    assert pend1.has_device_work()
    r1 = pend1.wait()
    stats = device_results.result_cache_stats()
    assert stats == {"hits": 0, "misses": 1}

    p2 = _panel(rng, cube=cube)  # same content, fresh PanelData object
    pend2 = dispatch.enqueue_render_panels([p2], 16, 24)
    assert not pend2.has_device_work(), "repeat render must not dispatch"
    r2 = pend2.wait()
    assert device_results.result_cache_stats()["hits"] == 1
    for k in ("vmin", "vmax", "y0", "y1", "n_kept", "empty"):
        assert r1[0][k] == r2[0][k]
    assert np.array_equal(r1[0]["rgba"], r2[0]["rgba"])


def test_cache_key_sensitivity(rng):
    cube = rng.uniform(1.0, 100.0, size=(64, 8, 16)).astype(np.float32)
    base = _panel(rng, cube=cube)
    dispatch.enqueue_render_panels([base], 16, 24).wait()
    # Different bounds / scales / window / mask must MISS.
    variants = [
        _panel(rng, cube=cube, z_min=1.0, z_max=50.0),
        _panel(rng, cube=cube, z_scale="linear"),
        _panel(rng, cube=cube, window=TimeWindow(8, 40, (5.0, 45.0), (5.0, 45.0))),
        _panel(rng, cube=cube, pitch_mask=np.array([True] * 4 + [False] * 4)),
        _panel(rng, cube=cube, low_percentile=2.0),
    ]
    for v in variants:
        pend = dispatch.enqueue_render_panels([v], 16, 24)
        assert pend.has_device_work(), "changed inputs must not hit the cache"
        pend.wait()


def test_cache_disabled_by_env(rng, monkeypatch):
    monkeypatch.setenv("CST_DEVICE_RESULT_CACHE", "0")
    cube = rng.uniform(1.0, 100.0, size=(64, 8, 16)).astype(np.float32)
    for _ in range(2):
        pend = dispatch.enqueue_render_panels([_panel(rng, cube=cube)], 16, 24)
        assert pend.has_device_work()
        pend.wait()
    assert device_results.result_cache_stats() == {"hits": 0, "misses": 0}


def test_owner_death_evicts_entries(rng):
    import gc

    cube = rng.uniform(1.0, 100.0, size=(64, 8, 16)).astype(np.float32)
    dispatch.enqueue_render_panels([_panel(rng, cube=cube)], 16, 24).wait()
    assert len(device_results._RESULT_CACHE) == 1
    del cube
    gc.collect()
    assert len(device_results._RESULT_CACHE) == 0


def test_host_backend_never_consults_the_cache(rng, monkeypatch):
    monkeypatch.setitem(link._BACKEND, "mode", "host")
    cube = rng.uniform(1.0, 100.0, size=(64, 8, 16)).astype(np.float32)
    for _ in range(2):
        dispatch.enqueue_render_panels([_panel(rng, cube=cube)], 16, 24).wait()
    assert device_results.result_cache_stats() == {"hits": 0, "misses": 0}


def test_cached_and_host_results_agree(rng):
    """Parity triangle: device miss, device cache hit, and host render all
    produce identical panel output for the same inputs."""
    cube = rng.uniform(1.0, 100.0, size=(64, 8, 16)).astype(np.float32)
    r_miss = dispatch.enqueue_render_panels([_panel(rng, cube=cube)], 16, 24).wait()
    r_hit = dispatch.enqueue_render_panels([_panel(rng, cube=cube)], 16, 24).wait()
    link._BACKEND["mode"] = "host"
    r_host = dispatch.enqueue_render_panels([_panel(rng, cube=cube)], 16, 24).wait()
    link._BACKEND["mode"] = "device"
    for a, b in ((r_miss, r_hit), (r_miss, r_host)):
        assert np.array_equal(a[0]["rgba"], b[0]["rgba"])
        assert a[0]["vmin"] == b[0]["vmin"] and a[0]["vmax"] == b[0]["vmax"]
