"""The render coalescer must produce per-request results identical to direct calls."""

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from configurable_spectrograms_tpu.render.figure import PanelData, device_render_panels
from configurable_spectrograms_tpu.render.service import coalesced_render
from configurable_spectrograms_tpu.render.tile import TimeWindow


def _panel(rng, T=40, A=6, E=10, cmap="viridis"):
    cube = (rng.random((T, A, E)) * 100).astype(np.float32)
    return PanelData(
        cube=cube,
        pitch_mask=np.ones(A, bool),
        energy=np.geomspace(4000, 10, E).astype(np.float32),
        times=np.arange(T, dtype=np.float64),
        window=TimeWindow(0, T, (0.0, float(T - 1)), (0.0, float(T - 1))),
        y_min=0.0,
        y_max=4000.0,
        z_min=None,
        z_max=None,
        y_scale="linear",
        z_scale="log",
        colormap=cmap,
        x_is_unix=True,
        z_label="Counts",
    )


def test_coalesced_matches_direct(rng):
    panels = [_panel(rng) for _ in range(3)]
    direct = device_render_panels(panels, 24, 32)
    via_service = coalesced_render(panels, 24, 32)
    for d, s in zip(direct, via_service):
        np.testing.assert_array_equal(d["rgba"], s["rgba"])
        assert d["vmin"] == pytest.approx(s["vmin"])


def test_concurrent_requests_pool_correctly(rng):
    requests = [[_panel(rng) for _ in range(2)] for _ in range(6)]
    expected = [device_render_panels(req, 16, 24) for req in requests]
    with ThreadPoolExecutor(max_workers=6) as pool:
        got = list(pool.map(lambda req: coalesced_render(req, 16, 24), requests))
    for exp, g in zip(expected, got):
        assert len(exp) == len(g)
        for e, r in zip(exp, g):
            np.testing.assert_array_equal(e["rgba"], r["rgba"])


def test_mixed_geometries_concurrently(rng):
    reqs = [([_panel(rng)], 16, 24), ([_panel(rng)], 32, 40), ([_panel(rng)], 16, 24)]
    with ThreadPoolExecutor(max_workers=3) as pool:
        got = list(pool.map(lambda r: coalesced_render(*r), reqs))
    for (panels, th, tw), res in zip(reqs, got):
        assert res[0]["rgba"].shape == (th, tw, 4)


def test_empty_request():
    assert coalesced_render([], 8, 8) == []


def test_concurrent_workers_through_coalescer_sharded(rng):
    """The driver's topology under stress: several worker threads rendering
    figures concurrently through the coalescer onto the sharded mesh path.
    Results must match a serial render exactly."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from configurable_spectrograms_tpu.render.figure import PanelData, device_render_panels
    from configurable_spectrograms_tpu.render.service import coalesced_render
    from configurable_spectrograms_tpu.render.tile import TimeWindow

    def build(k):
        T, A, E = 40 + k, 4, 8
        local = np.random.default_rng(k)
        cube = (local.random((T, A, E)) * 100).astype(np.float32)
        return PanelData(
            cube=cube, pitch_mask=np.ones(A, bool),
            energy=np.geomspace(4000, 10, E).astype(np.float32),
            times=np.arange(T, dtype=np.float64),
            window=TimeWindow(0, T, (0.0, float(T - 1)), (0.0, float(T - 1))),
            y_min=0.0, y_max=4000.0, z_min=None, z_max=None,
            y_scale="log", z_scale="log", colormap="inferno",
            x_is_unix=False, z_label="Counts",
        )

    groups = [[build(3 * g + j) for j in range(3)] for g in range(8)]
    serial = [device_render_panels(g, 24, 32) for g in groups]
    with ThreadPoolExecutor(max_workers=4) as pool:
        concurrent = list(pool.map(lambda g: coalesced_render(g, 24, 32), groups))
    for s_group, c_group in zip(serial, concurrent):
        for s, c in zip(s_group, c_group):
            np.testing.assert_array_equal(s["rgba"], c["rgba"])
            assert float(s["vmin"]) == float(c["vmin"])
