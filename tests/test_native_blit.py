"""Native run-blit tail of resample_indices vs the numpy tail: bit parity.

``fastpng_blit_runs`` (native/fastpng.cpp) replaces resample_indices's
gather + LUT color + run replication with one C++ pass.  Both tails are
pure integer/uint8 arithmetic over identical run geometry, so outputs
must be bit-identical -- including clipped canvas-rect views and the
pre-gathered device layout.
"""

import numpy as np
import pytest

from configurable_spectrograms_tpu.render import fastpng
from configurable_spectrograms_tpu.render.tile import TimeWindow, make_x_map, resample_indices
from configurable_spectrograms_tpu.ops import colormap_lut

pytestmark = pytest.mark.skipif(
    not fastpng.native_available(), reason="native library unavailable (no toolchain)"
)


def _numpy_tail(monkeypatch):
    """Force resample_indices onto its numpy tail."""
    monkeypatch.setattr(fastpng, "native_available", lambda: False)


def _random_case(rng, T=70, E=24, H=52, W=96):
    idx = rng.integers(0, 256, (T, E), dtype=np.uint8)
    kept_pos = np.sort(rng.choice(E, size=E - 4, replace=False)).astype(np.int32)
    n_kept = int(rng.integers(1, len(kept_pos) + 1))
    window = TimeWindow(t_start=6, t_count=T - 12, extent=(6.0, float(T - 7)), xlim=(0.0, float(T)))
    args = dict(
        idx=idx,
        kept_pos=kept_pos,
        n_kept=n_kept,
        flip=bool(rng.integers(0, 2)),
        y0=3.5,
        y1=18000.0,
        t_start=window.t_start,
        t_count=window.t_count,
        x_map=make_x_map(window, W),
        out_h=H,
        out_w=W,
        y_scale="log" if rng.integers(0, 2) else "linear",
        lut=colormap_lut("viridis"),
    )
    return args


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_blit_matches_numpy_tail(monkeypatch, seed):
    rng = np.random.default_rng(seed)
    args = _random_case(rng)
    native = resample_indices(**args)
    with monkeypatch.context() as m:
        _numpy_tail(m)
        ref = resample_indices(**args)
    np.testing.assert_array_equal(native, ref)


def test_blit_into_clipped_view(monkeypatch):
    """A canvas rect smaller than (out_h, out_w) gets the top-left overlap."""
    rng = np.random.default_rng(7)
    args = _random_case(rng, H=40, W=80)
    canvas_a = np.full((64, 120, 4), 7, np.uint8)
    canvas_b = canvas_a.copy()
    resample_indices(**args, out=canvas_a[10:43, 5:77])  # 33 x 72 view
    with monkeypatch.context() as m:
        _numpy_tail(m)
        resample_indices(**args, out=canvas_b[10:43, 5:77])
    np.testing.assert_array_equal(canvas_a, canvas_b)
    # pixels outside the view untouched
    assert (canvas_a[:10] == 7).all() and (canvas_a[43:] == 7).all()


def test_blit_pre_gathered(monkeypatch):
    """Device pre-gathered layout: one matrix row per pixel column."""
    rng = np.random.default_rng(11)
    W, E, H = 64, 16, 30
    idx = rng.integers(0, 256, (W, E), dtype=np.uint8)
    window = TimeWindow(t_start=0, t_count=40, extent=(0.0, 39.0), xlim=(0.0, 39.0))
    args = dict(
        idx=idx,
        kept_pos=np.arange(E, dtype=np.int32),
        n_kept=E,
        flip=True,
        y0=1.0,
        y1=100.0,
        t_start=window.t_start,
        t_count=window.t_count,
        x_map=make_x_map(window, W),
        out_h=H,
        out_w=W,
        y_scale="linear",
        lut=colormap_lut("inferno"),
        pre_gathered=True,
    )
    native = resample_indices(**args)
    with monkeypatch.context() as m:
        _numpy_tail(m)
        ref = resample_indices(**args)
    np.testing.assert_array_equal(native, ref)


def test_blit_falls_back_on_unsupported_layout():
    """Unsupported layouts/indices must return False, not garbage."""
    t_idx = np.zeros(4, np.int32)
    rest = (
        np.ones(4, np.uint8),  # x_ok
        np.zeros(1, np.int32),  # sel
        np.zeros(1, np.int32),  # starts
        np.full(1, 4, np.int32),  # counts
        np.zeros((257, 4), np.uint8),  # lut_ext
    )
    out = np.zeros((4, 4, 4), np.uint8)
    # Non-unit inner stride (Fortran-order idx).
    idx_t = np.asfortranarray(np.zeros((8, 8), np.uint8))
    assert fastpng.blit_runs(idx_t, t_idx, *rest, out) is False
    # Negative row stride: formally-undefined pointer math in the kernel.
    idx_rev = np.zeros((8, 8), np.uint8)[::-1]
    assert fastpng.blit_runs(idx_rev, t_idx, *rest, out) is False
    # Out-of-range rows/columns: the numpy tail raises IndexError; the
    # native path must decline rather than read out of bounds.
    idx_c = np.zeros((8, 8), np.uint8)
    assert fastpng.blit_runs(idx_c, np.full(4, 8, np.int32), *rest, out) is False
    bad_sel = (rest[0], np.full(1, 8, np.int32)) + rest[2:]
    assert fastpng.blit_runs(idx_c, t_idx, *bad_sel, out) is False


# ---------------------------------------------------------------------------
# fastpng_blend_tile: the native twin of Image.paste(tile, xy, tile).
# ---------------------------------------------------------------------------


def _pil_paste(canvas: np.ndarray, tile: np.ndarray, x: int, y: int) -> np.ndarray:
    from PIL import Image

    img = Image.fromarray(canvas.copy(), "RGBA")
    t = Image.fromarray(tile, "RGBA")
    img.paste(t, (x, y), t)
    return np.asarray(img)


@pytest.mark.skipif(not fastpng.blend_available(), reason="native blend unavailable")
def test_blend_tile_exhaustive_triples():
    """Every (mask, canvas, tile) byte triple blends exactly like Pillow.

    The blend is per-channel with only the tile's alpha as the mask, so
    sweeping all 256^3 combinations in one image pins the arithmetic
    (MULDIV255 rounding) for every reachable byte pattern -- including the
    alpha channel's own blend, which Pillow applies with the same mask.
    """
    m, v1, v2 = np.meshgrid(
        np.arange(256, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        indexing="ij",
    )
    h, w = 4096, 4096
    canvas = np.stack([v1, v1, v1, v1], axis=-1).reshape(h, w, 4).copy()
    tile = np.stack([v2, v2, v2, m], axis=-1).reshape(h, w, 4).copy()
    expected = _pil_paste(canvas, tile, 0, 0)
    got = canvas.copy()
    assert fastpng.blend_tile(got, tile, 0, 0)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.skipif(not fastpng.blend_available(), reason="native blend unavailable")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_blend_tile_random_placement_and_clipping(seed):
    rng = np.random.default_rng(seed)
    canvas = rng.integers(0, 256, (64, 80, 4), np.uint8)
    for _ in range(40):
        th, tw = int(rng.integers(1, 30)), int(rng.integers(1, 30))
        tile = rng.integers(0, 256, (th, tw, 4), np.uint8)
        # Include fully outside, straddling every edge, and interior spots.
        x = int(rng.integers(-tw - 4, 80 + 4))
        y = int(rng.integers(-th - 4, 64 + 4))
        expected = _pil_paste(canvas, tile, x, y)
        assert fastpng.blend_tile(canvas, tile, x, y)
        np.testing.assert_array_equal(canvas, expected)


@pytest.mark.skipif(not fastpng.blend_available(), reason="native blend unavailable")
def test_blend_tile_into_strided_canvas_rows():
    """A canvas whose rows carry extra stride (a width-sliced view) blends
    correctly -- the kernel walks canvas_stride, not w*4."""
    rng = np.random.default_rng(7)
    full = rng.integers(0, 256, (32, 48, 4), np.uint8)
    tile = rng.integers(0, 256, (8, 8, 4), np.uint8)
    view = full[:, 4:40]
    expected = _pil_paste(np.ascontiguousarray(view), tile, 3, 5)
    assert fastpng.blend_tile(view, tile, 3, 5)
    np.testing.assert_array_equal(view, expected)


def test_blend_tile_declines_bad_layouts():
    canvas = np.zeros((8, 8, 4), np.uint8)
    tile = np.zeros((2, 2, 4), np.uint8)
    if fastpng.blend_available():
        assert not fastpng.blend_tile(canvas[::-1], tile, 0, 0)  # negative stride
        assert not fastpng.blend_tile(canvas.astype(np.int16), tile, 0, 0)
        assert not fastpng.blend_tile(canvas, tile[:, :, :3], 0, 0)
        assert not fastpng.blend_tile(canvas, tile[:, ::-1], 0, 0)  # non-contiguous tile
    else:
        assert not fastpng.blend_tile(canvas, tile, 0, 0)


def test_blend_probe_validates_against_pillow():
    """The load-time probe keeps the native blend only when it is
    byte-equal to this Pillow's Image.paste (older Pillows blend with the
    legacy MULDIV255 pair, which diverges on ~24.5% of byte triples)."""
    from configurable_spectrograms_tpu.render import fastpng

    lib = fastpng._load()
    if lib is None or not getattr(lib, "_has_blend", False):
        import pytest

        pytest.skip("native blend kernel unavailable")
    # On this image Pillow uses the precise-division blend: probe passes.
    assert fastpng._blend_matches_pillow(lib.fastpng_blend_tile)

    # A blend that claims success but writes nothing must be rejected.
    def _noop_blend(*_args):
        return 0

    assert not fastpng._blend_matches_pillow(_noop_blend)


@pytest.mark.skipif(not fastpng.blend_available(), reason="native blend unavailable")
@pytest.mark.parametrize("seed", [0, 1])
def test_canvas_blender_matches_blend_tile(seed):
    """The per-canvas paste closure is the same kernel and arithmetic as
    blend_tile: byte-equal to Image.paste across placements incl. clipping,
    and it declines the same bad tiles."""
    rng = np.random.default_rng(seed)
    canvas = rng.integers(0, 256, (48, 72, 4), np.uint8)
    paste = fastpng.canvas_blender(canvas)
    assert paste is not None
    for _ in range(30):
        th, tw = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        tile = rng.integers(0, 256, (th, tw, 4), np.uint8)
        x = int(rng.integers(-tw - 3, 72 + 3))
        y = int(rng.integers(-th - 3, 48 + 3))
        expected = _pil_paste(canvas, tile, x, y)
        assert paste(tile, x, y)
        np.testing.assert_array_equal(canvas, expected)
    # Same decline matrix as blend_tile.
    tile = np.zeros((2, 2, 4), np.uint8)
    assert not paste(tile.astype(np.int16), 0, 0)
    assert not paste(tile[:, :, :3], 0, 0)
    assert not paste(tile[:, ::-1], 0, 0)  # non-contiguous


def test_canvas_blender_declines_bad_canvases():
    bad = np.zeros((8, 8, 3), np.uint8)  # 3-channel canvas
    assert fastpng.canvas_blender(bad) is None
    assert fastpng.canvas_blender(np.zeros((8, 8, 4), np.int16)) is None
    if fastpng.blend_available():
        good = np.zeros((8, 8, 4), np.uint8)
        assert fastpng.canvas_blender(good[::-1]) is None  # negative stride
        assert fastpng.canvas_blender(good) is not None
