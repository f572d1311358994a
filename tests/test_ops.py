"""Device-op tests: collapse, percentile, and full tile parity vs the oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from configurable_spectrograms_tpu.ops import (  # noqa: E402
    RenderSpec,
    collapse_cube,
    colormap_lut,
    masked_nanpercentile,
    render_matrix,
)
from configurable_spectrograms_tpu.render.tile import TimeWindow, compute_time_window, make_x_map  # noqa: E402
from tests.oracle import oracle_tile  # noqa: E402


def test_collapse_cube_matches_nansum(rng):
    T, A, E = 17, 8, 10
    cube = rng.normal(size=(T, A, E)).astype(np.float32)
    cube[rng.random(cube.shape) < 0.2] = np.nan
    mask = rng.random(A) < 0.5
    expected = np.nansum(cube[:, mask, :], axis=1)
    got = np.asarray(collapse_cube(jnp.asarray(cube), jnp.asarray(mask), T))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_collapse_cube_empty_mask_and_padding(rng):
    T, A, E = 6, 4, 5
    cube = rng.normal(size=(T, A, E)).astype(np.float32)
    got = np.asarray(collapse_cube(jnp.asarray(cube), jnp.zeros(A, bool), 4))
    np.testing.assert_array_equal(got[:4], np.zeros((4, E)))  # nansum of empty selection is 0
    assert np.all(np.isnan(got[4:]))  # padding rows forced NaN


@pytest.mark.parametrize("q", [0.0, 1.0, 42.7, 50.0, 99.0, 100.0])
def test_masked_nanpercentile(rng, q):
    vals = rng.normal(size=(40, 13)).astype(np.float32) * 100
    nanmask = rng.random(vals.shape) < 0.25
    vals[nanmask] = np.nan
    valid = rng.random(vals.shape) < 0.7
    ref_vals = np.where(valid, vals, np.nan)
    expected = np.nanpercentile(ref_vals, q)
    got = float(masked_nanpercentile(jnp.asarray(vals), jnp.asarray(valid), q))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_masked_nanpercentile_empty():
    vals = jnp.ones((4, 4))
    assert np.isnan(float(masked_nanpercentile(vals, jnp.zeros((4, 4), bool), 50.0)))


def test_masked_nanpercentile_with_inf():
    vals = jnp.asarray(np.array([1.0, 2.0, np.inf, -np.inf, np.nan], np.float32))
    valid = jnp.asarray(np.array([True, True, True, True, True]))
    assert float(masked_nanpercentile(vals, valid, 100.0)) == np.inf
    assert float(masked_nanpercentile(vals, valid, 0.0)) == -np.inf
    assert float(masked_nanpercentile(vals, valid, 50.0)) == 1.5  # nanpercentile of [-inf,1,2,inf]


def _run_panel(matrix, energy, spec, y_min=0.0, y_max=4000.0, window=None, z_min=None, z_max=None, cmap="viridis"):
    T, E = matrix.shape
    if window is None:
        window = TimeWindow(t_start=0, t_count=T, extent=(0.0, float(T - 1)), xlim=(0.0, float(T - 1)))
    x_map = make_x_map(window, spec.width)
    e_valid = (energy >= y_min) & (energy <= y_max)
    z_bounds = np.array(
        [np.nan if z_min is None else z_min, np.nan if z_max is None else z_max], np.float32
    )
    out = render_matrix(
        jnp.asarray(matrix),
        jnp.asarray(energy),
        jnp.asarray(e_valid),
        jnp.int32(T),
        jnp.int32(window.t_start),
        jnp.int32(window.t_count),
        jnp.asarray(x_map),
        jnp.asarray(z_bounds),
        jnp.asarray(colormap_lut(cmap)),
        spec,
    )
    return {k: np.asarray(v) for k, v in out.items()}, x_map


def _assert_tile_matches_oracle(matrix, energy, spec, **kw):
    out, x_map = _run_panel(matrix, energy, spec, **kw)
    window = kw.get("window")
    t_start = window.t_start if window else 0
    t_count = window.t_count if window else matrix.shape[0]
    exp_idx, vmin, vmax = oracle_tile(
        matrix,
        energy,
        kw.get("y_min", 0.0),
        kw.get("y_max", 4000.0),
        t_start,
        t_count,
        x_map,
        spec.height,
        spec.width,
        spec.y_scale,
        spec.z_scale,
        kw.get("z_min"),
        kw.get("z_max"),
        spec.low_percentile,
        spec.high_percentile,
    )
    if exp_idx is None:
        assert bool(out["empty"])
        return out
    assert not bool(out["empty"])
    lut = colormap_lut(kw.get("cmap", "viridis"))
    lut_ext = np.concatenate([lut, np.array([[255, 255, 255, 255]], np.uint8)], axis=0)
    expected_rgba = lut_ext[np.where(exp_idx < 0, 256, exp_idx)]
    # Allow +/-1 LUT index of quantization slack from f32-vs-f64 normalize.
    exp_safe = np.where(exp_idx < 0, 256, exp_idx)
    got_rgba = out["rgba"]
    mism = np.any(got_rgba != expected_rgba, axis=-1)
    if mism.any():
        # Every mismatching pixel must be within 1 LUT index of the oracle.
        got_idx = np.full(mism.shape, -9, np.int32)
        for cand in range(257):
            hit = np.all(got_rgba == lut_ext[cand], axis=-1)
            got_idx[hit] = cand
        assert np.all(np.abs(got_idx[mism] - exp_safe[mism]) <= 1), (
            f"{mism.sum()} pixels differ by more than 1 LUT index"
        )
        assert mism.mean() < 0.02, f"too many quantization mismatches: {mism.mean():.4f}"
    np.testing.assert_allclose(out["vmin"], vmin, rtol=1e-5)
    np.testing.assert_allclose(out["vmax"], vmax, rtol=1e-5)
    return out


@pytest.mark.parametrize("y_scale,z_scale", [("linear", "linear"), ("linear", "log"), ("log", "linear"), ("log", "log")])
def test_render_matrix_parity_all_scales(rng, y_scale, z_scale):
    T, E = 50, 24
    matrix = (rng.random((T, E)).astype(np.float32) * 900).astype(np.float32)
    matrix[rng.random(matrix.shape) < 0.05] = 0.0  # exercise log masking
    energy = np.geomspace(30000, 4, E).astype(np.float32)  # descending, forces flip
    spec = RenderSpec(height=64, width=96, y_scale=y_scale, z_scale=z_scale)
    _assert_tile_matches_oracle(matrix, energy, spec)


def test_render_matrix_energy_range_and_explicit_bounds(rng):
    T, E = 30, 16
    matrix = rng.random((T, E)).astype(np.float32) * 100
    energy = np.geomspace(8000, 10, E).astype(np.float32)
    spec = RenderSpec(height=40, width=50, y_scale="linear", z_scale="linear")
    _assert_tile_matches_oracle(matrix, energy, spec, y_min=50.0, y_max=4000.0, z_min=10.0, z_max=60.0)


def test_render_matrix_zoom_window_with_margins(rng):
    T, E = 80, 12
    matrix = rng.random((T, E)).astype(np.float32) * 10
    energy = np.linspace(100, 1200, E).astype(np.float32)
    x = np.linspace(1000.0, 1790.0, T)
    # Zoom centered near the end so xlim extends beyond the data -> bg margin.
    window = compute_time_window(x, center=1780.0, duration_seconds=100.0)
    assert window is not None and window.xlim[1] > window.extent[1]
    spec = RenderSpec(height=32, width=64)
    out = _assert_tile_matches_oracle(matrix, energy, spec, window=window)
    # Rightmost column must be background (white).
    assert np.all(out["rgba"][:, -1] == np.array([255, 255, 255, 255], np.uint8))


def test_render_matrix_all_nan_column_and_empty(rng):
    T, E = 20, 8
    matrix = rng.random((T, E)).astype(np.float32)
    matrix[:, 3] = np.nan  # whole column NaN -> dropped
    energy = np.linspace(10, 800, E).astype(np.float32)
    spec = RenderSpec(height=16, width=16)
    out, _ = _run_panel(matrix, energy, spec)
    assert int(out["n_kept"]) == E - 1
    # Entirely out-of-range energy -> empty panel (reference returns (None, None)).
    out2, _ = _run_panel(matrix, energy, spec, y_min=10000.0, y_max=20000.0)
    assert bool(out2["empty"])
    assert np.all(out2["rgba"] == 255)


def test_render_matrix_matches_matplotlib_imshow(rng):
    """Cross-check the extent/origin/index conventions against Agg itself."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    T, E = 12, 7
    matrix = (rng.random((T, E)) * 100).astype(np.float32)
    energy = np.linspace(100, 700, E).astype(np.float32)
    H, W = 70, 120
    spec = RenderSpec(height=H, width=W, y_scale="linear", z_scale="linear")
    out, _ = _run_panel(matrix, energy, spec, y_min=0, y_max=4000, z_min=0.0, z_max=100.0)

    fig = Figure(figsize=(W / 10, H / 10), dpi=10)
    FigureCanvasAgg(fig)
    ax = fig.add_axes((0, 0, 1, 1))
    ax.set_axis_off()
    ax.imshow(
        matrix.T,
        aspect="auto",
        origin="lower",
        extent=(0, T - 1, float(energy[0]), float(energy[-1])),
        cmap="viridis",
        vmin=0.0,
        vmax=100.0,
        interpolation="nearest",
    )
    ax.set_xlim(0, T - 1)
    fig.canvas.draw()
    ref = np.asarray(fig.canvas.buffer_rgba()).copy()
    assert ref.shape == (H, W, 4)
    mismatch = np.any(ref != out["rgba"], axis=-1).mean()
    # Cell-boundary pixels may round differently; interiors must agree.
    assert mismatch < 0.08, f"matplotlib cross-check mismatch fraction {mismatch:.4f}"


@pytest.mark.parametrize("z_scale", ["linear", "log"])
def test_render_matches_matplotlib_log_y(rng, z_scale):
    """Log y-axis warp + LogNorm cross-checked against Agg itself."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.colors as mcolors
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    T, E = 10, 6
    matrix = (rng.random((T, E)) * 90 + 5).astype(np.float32)
    energy = np.geomspace(10, 5000, E).astype(np.float32)
    H, W = 80, 120
    spec = RenderSpec(height=H, width=W, y_scale="log", z_scale=z_scale)
    out, _ = _run_panel(matrix, energy, spec, y_min=0, y_max=10000, z_min=5.0, z_max=95.0)

    fig = Figure(figsize=(W / 10, H / 10), dpi=10)
    FigureCanvasAgg(fig)
    ax = fig.add_axes((0, 0, 1, 1))
    ax.set_axis_off()
    kwargs = dict(
        aspect="auto",
        origin="lower",
        extent=(0, T - 1, float(energy[0]), float(energy[-1])),
        cmap="viridis",
        interpolation="nearest",
    )
    data = matrix.T
    if z_scale == "log":
        # The reference raises an explicit log vmin to the matrix's minimum
        # positive value (reference plotting.py:262,276); mirror that here
        # so Agg normalizes identically.
        safe_vmin = max(5.0, float(data[np.isfinite(data) & (data > 0)].min()))
        kwargs["norm"] = mcolors.LogNorm(vmin=safe_vmin, vmax=95.0)
    else:
        kwargs.update(vmin=5.0, vmax=95.0)
    ax.imshow(data, **kwargs)
    ax.set_yscale("log")
    ax.set_xlim(0, T - 1)
    ax.set_ylim(float(energy[0]), float(energy[-1]))
    fig.canvas.draw()
    ref = np.asarray(fig.canvas.buffer_rgba()).copy()
    mismatch = np.any(ref != out["rgba"], axis=-1).mean()
    assert mismatch < 0.09, f"log-y/{z_scale}-z mismatch fraction {mismatch:.4f}"


def test_render_matrix_fuzz_vs_oracle():
    """Randomized configurations all match the reference-math oracle."""
    fuzz = np.random.default_rng(99)
    for trial in range(10):
        T = int(fuzz.integers(8, 70))
        E = int(fuzz.integers(4, 30))
        matrix = (fuzz.random((T, E)) * 10 ** fuzz.integers(1, 5)).astype(np.float32)
        if fuzz.random() < 0.5:
            matrix[fuzz.random(matrix.shape) < 0.1] = 0.0
        if fuzz.random() < 0.3:
            matrix[:, int(fuzz.integers(0, E))] = np.nan
        descending = fuzz.random() < 0.5
        energy = (np.geomspace(9000, 5, E) if descending else np.geomspace(5, 9000, E)).astype(np.float32)
        y_scale = "log" if fuzz.random() < 0.5 else "linear"
        z_scale = "log" if fuzz.random() < 0.5 else "linear"
        t0 = int(fuzz.integers(0, T // 2))
        tc = int(fuzz.integers(1, T - t0))
        window = TimeWindow(t0, tc, (float(t0), float(t0 + tc - 1)),
                            (float(t0) - fuzz.random() * 3, float(t0 + tc - 1) + fuzz.random() * 3))
        z_min = float(fuzz.random() * 5) if fuzz.random() < 0.3 else None
        z_max = float(50 + fuzz.random() * 100) if fuzz.random() < 0.3 else None
        spec = RenderSpec(height=int(fuzz.integers(8, 50)), width=int(fuzz.integers(8, 80)),
                          y_scale=y_scale, z_scale=z_scale)
        _assert_tile_matches_oracle(matrix, energy, spec, window=window,
                                    y_min=0.0, y_max=8000.0, z_min=z_min, z_max=z_max)
