"""The resident analysis caches must be invisible: warm == cold, bit-exact.

render/host_quantize.py keeps per-matrix derived results (masks, log10
table, safe-vmin scalars, final idx matrices) resident keyed by matrix
identity.  Every test here compares a warm-cache call against a cold
compute on an equal-valued COPY of the matrix (a different object, so no
cache entry can be shared) and requires bit-identical results -- the same
contract the goldens pin end-to-end (reference parity:
/root/reference/src/configurable_spectrograms/plotting.py normalization
semantics).
"""

import gc

import numpy as np
import pytest

from configurable_spectrograms_tpu.render import host_quantize as hq


def _quant(matrix, energy, e_valid, t0, tc, bounds, y, z, lo=1.0, hi=99.0, **kw):
    return hq.host_quantize(matrix, energy, e_valid, t0, tc, bounds, y, z, lo, hi, **kw)


def _assert_same(a: dict, b: dict) -> None:
    assert a.keys() == b.keys()
    np.testing.assert_array_equal(a["idx"], b["idx"])
    np.testing.assert_array_equal(a["kept_pos"], b["kept_pos"])
    for k in ("n_kept", "flip", "y0", "y1", "empty"):
        assert a[k] == b[k], k
    np.testing.assert_equal(a["vmin"], b["vmin"])
    np.testing.assert_equal(a["vmax"], b["vmax"])


@pytest.fixture
def messy_matrix(rng):
    """float32 matrix with NaNs, +/-inf, zeros, negatives, subnormals."""
    T, E = 60, 24
    m = (rng.random((T, E)) * 1e4).astype(np.float32)
    m[rng.random(m.shape) < 0.08] = np.nan
    m[rng.random(m.shape) < 0.03] = np.inf
    m[rng.random(m.shape) < 0.03] = -np.inf
    m[rng.random(m.shape) < 0.05] = 0.0
    m[rng.random(m.shape) < 0.05] *= -1.0
    m[0, 0] = np.float32(1e-38)  # below the 1e-37 log floor
    return m


@pytest.mark.parametrize("z_scale", ["log", "linear"])
def test_warm_repeat_is_bit_identical(messy_matrix, z_scale):
    energy = np.geomspace(30000, 4, messy_matrix.shape[1]).astype(np.float32)
    e_valid = np.ones(messy_matrix.shape[1], bool)
    windows = [(0, 60), (10, 20), (0, 60), (10, 20)]  # repeats hit every cache
    for t0, tc in windows:
        warm = _quant(messy_matrix, energy, e_valid, t0, tc, (None, None), "log", z_scale)
        cold = _quant(messy_matrix.copy(), energy, e_valid, t0, tc, (None, None), "log", z_scale)
        _assert_same(warm, cold)


def test_zoom_window_gets_its_own_safe_vmin(rng):
    """The safe-positive floor is window-dependent; caching must not leak
    the full window's floor into a zoom whose smallest positive differs."""
    T, E = 40, 8
    m = np.full((T, E), 100.0, np.float32)
    m[0, 0] = np.float32(1e-6)  # tiny positive only in the full window
    energy = np.linspace(1000, 10, E).astype(np.float32)
    e_valid = np.ones(E, bool)
    # Explicit bounds below both floors force vmin = safe_vmin in log mode.
    full = _quant(m, energy, e_valid, 0, T, (1e-9, 1e4), "log", "log")
    zoom = _quant(m, energy, e_valid, 10, 5, (1e-9, 1e4), "log", "log")
    assert full["vmin"] == pytest.approx(1e-6)
    assert zoom["vmin"] == pytest.approx(100.0)
    # And each equals its cold compute.
    _assert_same(full, _quant(m.copy(), energy, e_valid, 0, T, (1e-9, 1e4), "log", "log"))
    _assert_same(zoom, _quant(m.copy(), energy, e_valid, 10, 5, (1e-9, 1e4), "log", "log"))


def test_linear_nonfinite_bounds_fallback_matches_cold(messy_matrix):
    energy = np.geomspace(30000, 4, messy_matrix.shape[1]).astype(np.float32)
    e_valid = np.ones(messy_matrix.shape[1], bool)
    # Explicit non-finite bounds exercise the inline fallback sequence.
    warm1 = _quant(messy_matrix, energy, e_valid, 5, 30, (np.nan, np.nan), "linear", "linear")
    warm2 = _quant(messy_matrix, energy, e_valid, 5, 30, (np.nan, np.nan), "linear", "linear")
    cold = _quant(messy_matrix.copy(), energy, e_valid, 5, 30, (np.nan, np.nan), "linear", "linear")
    _assert_same(warm1, cold)
    _assert_same(warm2, cold)


def test_nan_bounds_fallback_maps_nan_cells_to_lut0(messy_matrix):
    """NaN explicit bounds leave NaN in the substituted work matrix (NaN ->
    vmin keeps NaN when vmin itself is NaN); those cells must land on LUT[0]
    deterministically -- the NaN->uint8 cast this path used to rely on is
    platform-defined, not guaranteed to be 0."""
    energy = np.geomspace(30000, 4, messy_matrix.shape[1]).astype(np.float32)
    e_valid = np.ones(messy_matrix.shape[1], bool)
    out = _quant(messy_matrix, energy, e_valid, 5, 30, (np.nan, np.nan), "linear", "linear")
    nan_mask = np.isnan(messy_matrix)
    assert nan_mask.any()  # the fixture guarantees NaN cells
    assert out["idx"].shape == messy_matrix.shape
    assert (out["idx"][nan_mask] == 0).all()
    assert out["idx"].dtype == np.uint8


def test_log_nan_span_pins_whole_panel_to_lut0(messy_matrix):
    """A NaN log-z span (explicit NaN vmax, or percentile lerp over an
    inf-inf pool) NaNs every norm cell; the panel must come out all LUT[0]
    deterministically rather than via the platform-defined NaN->uint8 cast."""
    energy = np.geomspace(30000, 4, messy_matrix.shape[1]).astype(np.float32)
    e_valid = np.ones(messy_matrix.shape[1], bool)
    out = _quant(messy_matrix, energy, e_valid, 0, 60, (1e-3, np.nan), "log", "log")
    assert np.isnan(out["vmax"])
    assert (out["idx"] == 0).all()
    _assert_same(
        out, _quant(messy_matrix.copy(), energy, e_valid, 0, 60, (1e-3, np.nan), "log", "log")
    )


def test_owner_death_evicts_derived_entries(rng):
    m = (rng.random((32, 16)) * 10).astype(np.float32)
    energy = np.linspace(100, 1, 16).astype(np.float32)
    _quant(m, energy, np.ones(16, bool), 0, 32, (None, None), "log", "log")
    mid = id(m)
    with hq._MASK_CACHE.lock:
        assert any(mid in k if isinstance(k, tuple) else False for k in hq._MASK_CACHE._cache)
    del m
    gc.collect()
    # The drain runs on the next get/insert; any lookup flushes dead owners.
    hq._MASK_CACHE.get(("masks", -1))
    hq._IDX_CACHE.get((-1, "log", 0.0, 1.0))
    with hq._MASK_CACHE.lock:
        assert not any(
            mid in k if isinstance(k, tuple) else False for k in hq._MASK_CACHE._cache
        )
    with hq._IDX_CACHE.lock:
        assert not any(k[0] == mid for k in hq._IDX_CACHE._cache)


def test_idx_cache_distinguishes_scales_and_bounds(rng):
    m = (rng.random((32, 16)) * 10 + 0.1).astype(np.float32)
    energy = np.linspace(100, 1, 16).astype(np.float32)
    ev = np.ones(16, bool)
    combos = [
        ((0.5, 8.0), "log"),
        ((0.5, 8.0), "linear"),
        ((1.0, 8.0), "log"),
        ((0.5, 9.0), "log"),
    ]
    for bounds, z in combos:
        warm = _quant(m, energy, ev, 0, 32, bounds, "log", z)
        cold = _quant(m.copy(), energy, ev, 0, 32, bounds, "log", z)
        _assert_same(warm, cold)
