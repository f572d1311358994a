"""The light-readback path (quantize + host resample) must match render_matrix."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from configurable_spectrograms_tpu.ops import (  # noqa: E402
    RenderSpec,
    colormap_lut,
    quantize_matrix,
    render_matrix,
)
from configurable_spectrograms_tpu.render.tile import TimeWindow, make_x_map, resample_indices  # noqa: E402


@pytest.mark.parametrize(
    "y_scale,z_scale", [("linear", "linear"), ("linear", "log"), ("log", "linear"), ("log", "log")]
)
def test_host_resample_matches_device_render(rng, y_scale, z_scale):
    T, E = 60, 20
    H, W = 48, 100
    matrix = (rng.random((T, E)) * 500).astype(np.float32)
    matrix[:, 7] = np.nan
    energy = np.geomspace(20000, 5, E).astype(np.float32)
    e_valid = (energy >= 0) & (energy <= 4000)
    window = TimeWindow(t_start=5, t_count=40, extent=(5.0, 44.0), xlim=(0.0, 50.0))
    x_map = make_x_map(window, W)
    z_bounds = np.array([np.nan, np.nan], np.float32)
    spec = RenderSpec(height=H, width=W, y_scale=y_scale, z_scale=z_scale)
    lut = colormap_lut("plasma")

    common = (
        jnp.asarray(matrix),
        jnp.asarray(energy),
        jnp.asarray(e_valid),
        jnp.int32(T),
        jnp.int32(window.t_start),
        jnp.int32(window.t_count),
    )
    device = render_matrix(*common, jnp.asarray(x_map), jnp.asarray(z_bounds), jnp.asarray(lut), spec)
    q = quantize_matrix(*common, jnp.asarray(z_bounds), spec)
    host_rgba = resample_indices(
        np.asarray(q["idx"]),
        np.asarray(q["kept_pos"]),
        int(q["n_kept"]),
        bool(q["flip"]),
        float(q["y0"]),
        float(q["y1"]),
        window.t_start,
        window.t_count,
        x_map,
        H,
        W,
        y_scale,
        lut,
        empty=bool(q["empty"]),
    )
    np.testing.assert_array_equal(host_rgba, np.asarray(device["rgba"]))
    np.testing.assert_allclose(float(q["vmin"]), float(device["vmin"]), rtol=1e-6)
    np.testing.assert_allclose(float(q["vmax"]), float(device["vmax"]), rtol=1e-6)


def test_host_resample_empty():
    lut = colormap_lut("viridis")
    tile = resample_indices(
        np.zeros((4, 4), np.uint8), np.arange(4), 0, False, 0.0, 1.0, 0, 0,
        np.array([1.0, 0.0], np.float32), 8, 8, "linear", lut, empty=True,
    )
    assert np.all(tile == 255)


def test_pre_gather_path_matches_direct(rng):
    """Long records (T >> W) take the device pre-gather path with equal pixels."""
    from configurable_spectrograms_tpu.render.figure import PanelData, device_render_panels

    T, A, E = 700, 6, 12
    cube = (rng.random((T, A, E)) * 300).astype(np.float32)
    energy = np.geomspace(4000, 10, E).astype(np.float32)

    def build():
        return PanelData(
            cube=cube, pitch_mask=np.ones(A, bool), energy=energy,
            times=np.arange(T, dtype=np.float64),
            window=TimeWindow(10, 600, (10.0, 609.0), (5.0, 615.0)),
            y_min=0.0, y_max=4000.0, z_min=None, z_max=None,
            y_scale="log", z_scale="log", colormap="inferno",
            x_is_unix=True, z_label="Counts",
        )

    tile_h, tile_w = 40, 120  # Tp (768) > Wp (256) -> gather active
    gathered = device_render_panels([build()], tile_h, tile_w)[0]
    # Reference result through the ungathered full-device renderer.
    import jax.numpy as jnp

    from configurable_spectrograms_tpu.ops import RenderSpec, collapse_cube, render_matrix

    p = build()
    spec = RenderSpec(height=tile_h, width=tile_w, y_scale="log", z_scale="log")
    direct = render_matrix(
        collapse_cube(jnp.asarray(cube), jnp.ones(A, bool), T),
        jnp.asarray(energy), jnp.asarray((energy >= 0) & (energy <= 4000)),
        jnp.int32(T), jnp.int32(10), jnp.int32(600),
        jnp.asarray(make_x_map(p.window, tile_w)),
        jnp.asarray(np.array([np.nan, np.nan], np.float32)),
        jnp.asarray(colormap_lut("inferno")), spec,
    )
    np.testing.assert_array_equal(gathered["rgba"], np.asarray(direct["rgba"]))


def test_device_cube_cache_reuse_and_eviction(monkeypatch):
    """Repeat dispatches of the same cube hit the resident device copy
    (no re-upload); collection of the source array evicts synchronously;
    the byte budget caps residency FIFO."""
    import gc

    import numpy as np

    from configurable_spectrograms_tpu.render import dispatch as figure_mod

    figure_mod._DEVICE_CUBE_CACHE.clear()

    cube = np.random.default_rng(0).random((32, 8, 16)).astype(np.float32)
    a1 = figure_mod._padded_device_cube(cube, 32, 8, 16)
    a2 = figure_mod._padded_device_cube(cube, 32, 8, 16)
    assert a1 is a2  # resident hit, no second upload
    # Same source at a second padded geometry is a distinct entry.
    a3 = figure_mod._padded_device_cube(cube, 64, 8, 16)
    assert a3 is not a1 and a3.shape == (64, 8, 16)
    np.testing.assert_array_equal(np.asarray(a1), np.where(np.isnan(cube), np.nan, cube))

    total = figure_mod._DEVICE_CUBE_CACHE.total_bytes
    assert total == a1.nbytes + a3.nbytes

    # GC of the source evicts every geometry for that id.
    del cube
    gc.collect()
    assert figure_mod._DEVICE_CUBE_CACHE.total_bytes == 0
    assert not figure_mod._DEVICE_CUBE_CACHE

    # Budget eviction: cap below two entries, oldest leaves first.
    monkeypatch.setenv("CST_DEVICE_CUBE_CACHE_BYTES", str(int(32 * 8 * 16 * 4 * 1.5)))
    c1 = np.zeros((32, 8, 16), np.float32)
    c2 = np.ones((32, 8, 16), np.float32)
    figure_mod._padded_device_cube(c1, 32, 8, 16)
    figure_mod._padded_device_cube(c2, 32, 8, 16)
    keys = [k[0] for k in figure_mod._DEVICE_CUBE_CACHE.keys()]
    assert keys == [id(c2)]  # c1 evicted FIFO
