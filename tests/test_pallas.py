"""Pallas kernel parity tests (interpreter-compatible via CPU backend)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from configurable_spectrograms_tpu.ops.spectrogram import collapse_cube  # noqa: E402


@pytest.mark.parametrize("tv", [512, 300, 0])
def test_collapse_cube_pallas_matches_jnp(rng, tv):
    from configurable_spectrograms_tpu.ops.pallas_kernels import collapse_cube_pallas

    T, A, E = 512, 16, 128
    cube = rng.normal(size=(T, A, E)).astype(np.float32)
    cube[rng.random(cube.shape) < 0.15] = np.nan
    mask = rng.random(A) < 0.5
    # Off-TPU the kernel runs through the Pallas interpreter automatically.
    ref = collapse_cube(jnp.asarray(cube), jnp.asarray(mask), tv)
    got = collapse_cube_pallas(jnp.asarray(cube), jnp.asarray(mask), tv)
    ref_np, got_np = np.asarray(ref), np.asarray(got)
    both_nan = np.isnan(ref_np) & np.isnan(got_np)
    np.testing.assert_array_equal(np.where(both_nan, 0, got_np), np.where(both_nan, 0, ref_np))


def test_collapse_cube_pallas_shape_gate(rng):
    from configurable_spectrograms_tpu.ops.pallas_kernels import collapse_cube_pallas

    with pytest.raises(ValueError):
        collapse_cube_pallas(jnp.zeros((100, 4, 120)), jnp.ones(4, bool), 100)


@pytest.mark.parametrize("z_scale", ["log", "linear"])
@pytest.mark.parametrize("window", [(0, 512), (60, 300)])
def test_fused_quantize_pallas_matches_jnp(rng, z_scale, window):
    """The fused collapse+quantize kernel is bit-identical to the jnp chain
    (explicit-bounds / skip_percentile path) including NaN/inf handling,
    the safe log floor, and the colormap index rule."""
    from configurable_spectrograms_tpu.ops.pallas_kernels import fused_quantize_pallas
    from configurable_spectrograms_tpu.ops.spectrogram import RenderSpec, quantize_matrix

    T, A, E = 512, 16, 128
    t_start, t_count = window
    cube = (rng.random((T, A, E)) * 1e4).astype(np.float32)
    cube[rng.random(cube.shape) < 0.1] = np.nan
    cube[5, 3, 7] = np.inf
    cube[6, 2, 9] = -np.inf
    mask = rng.random(A) < 0.6
    e_valid = rng.random(E) < 0.9
    t_valid = 450
    z_bounds = np.array([2.0, 5000.0], np.float32)

    got = fused_quantize_pallas(
        jnp.asarray(cube), jnp.asarray(mask), jnp.asarray(e_valid),
        t_valid, t_start, t_count, jnp.asarray(z_bounds), z_scale=z_scale,
    )

    spec = RenderSpec(8, 8, "linear", z_scale)
    m = collapse_cube(jnp.asarray(cube), jnp.asarray(mask), t_valid)
    ref = quantize_matrix(
        m, jnp.asarray(np.geomspace(4000, 1, E).astype(np.float32)), jnp.asarray(e_valid),
        jnp.int32(t_valid), jnp.int32(t_start), jnp.int32(t_count),
        jnp.asarray(z_bounds), spec, skip_percentile=True,
    )
    np.testing.assert_array_equal(np.asarray(got["idx"]), np.asarray(ref["idx"]))
    assert float(got["vmin"]) == pytest.approx(float(ref["vmin"]), rel=0, abs=0)
    # col_all_nan parity against a direct numpy oracle.
    m_np = np.asarray(m)
    in_file = np.arange(T)[:, None] < t_valid
    oracle_colnan = np.all(np.isnan(m_np) | ~in_file, axis=0)
    np.testing.assert_array_equal(np.asarray(got["col_all_nan"]), oracle_colnan)


@pytest.mark.parametrize("t_tile", [32, 128, 256])
def test_fused_quantize_pallas_t_tile_invariant(rng, t_tile):
    """The time-tile size is a pure schedule knob: every valid tiling is
    bit-identical (CST_PALLAS_T_TILE exposes it in production)."""
    from configurable_spectrograms_tpu.ops.pallas_kernels import fused_quantize_pallas

    T, A, E = 512, 16, 128
    cube = (rng.random((T, A, E)) * 1e4).astype(np.float32)
    cube[rng.random(cube.shape) < 0.1] = np.nan
    mask = rng.random(A) < 0.6
    e_valid = np.ones(E, bool)
    z_bounds = np.array([2.0, 5000.0], np.float32)
    base = fused_quantize_pallas(
        jnp.asarray(cube), jnp.asarray(mask), jnp.asarray(e_valid),
        450, 0, T, jnp.asarray(z_bounds), z_scale="log",
    )
    got = fused_quantize_pallas(
        jnp.asarray(cube), jnp.asarray(mask), jnp.asarray(e_valid),
        450, 0, T, jnp.asarray(z_bounds), z_scale="log", t_tile=t_tile,
    )
    np.testing.assert_array_equal(np.asarray(got["idx"]), np.asarray(base["idx"]))
    assert float(got["vmin"]) == float(base["vmin"])
    np.testing.assert_array_equal(
        np.asarray(got["col_all_nan"]), np.asarray(base["col_all_nan"])
    )


def test_pallas_t_tile_env_knob(monkeypatch):
    from configurable_spectrograms_tpu.render.dispatch import _pallas_t_tile

    assert _pallas_t_tile(8192) == 64  # default
    monkeypatch.setenv("CST_PALLAS_T_TILE", "128")
    assert _pallas_t_tile(8192) == 128
    assert _pallas_t_tile(8256) == 64  # not a multiple of 128 -> default 64
    monkeypatch.setenv("CST_PALLAS_T_TILE", "192")
    assert _pallas_t_tile(8192) == 64  # invalid for this T -> default
    monkeypatch.setenv("CST_PALLAS_T_TILE", "junk")
    assert _pallas_t_tile(8192) == 64


def test_fused_quantize_pallas_shape_gate():
    from configurable_spectrograms_tpu.ops.pallas_kernels import fused_quantize_pallas

    with pytest.raises(ValueError):
        fused_quantize_pallas(
            jnp.zeros((100, 4, 120)), jnp.ones(4, bool), jnp.ones(120, bool),
            100, 0, 100, jnp.asarray([0.0, 1.0]),
        )


def test_render_kernel_pallas_production_switch(rng, monkeypatch):
    """CST_RENDER_KERNEL=pallas routes explicit-bounds log-z buckets through
    the fused kernel inside the production dispatch (VERDICT round-3
    item 3) with results identical to the default XLA program; percentile
    and linear-z buckets keep the XLA path."""
    from configurable_spectrograms_tpu.render import dispatch, link
    from configurable_spectrograms_tpu.render.tile import TimeWindow

    monkeypatch.setitem(link._BACKEND, "mode", "device")
    monkeypatch.setitem(link._BACKEND, "forced_host", False)
    monkeypatch.setenv("CST_DATA_MESH", "0")  # single-device: the pallas scope

    def panels():
        out = []
        for k in range(3):
            T, A, E = 48 + k, 6, 12
            cube = (rng.random((T, A, E)) * 1e3).astype(np.float32)
            cube[rng.random((T, A, E)) < 0.05] = np.nan
            out.append(dispatch.PanelData(
                cube=cube, pitch_mask=np.ones(A, bool),
                energy=np.geomspace(4000, 10, E).astype(np.float32),
                times=np.arange(T, dtype=np.float64),
                window=TimeWindow(0, T, (0.0, float(T - 1)), (0.0, float(T - 1))),
                y_min=0.0, y_max=4000.0,
                z_min=1.0, z_max=900.0,  # explicit bounds: the routed case
                y_scale="log", z_scale="log", colormap="inferno",
                x_is_unix=False, z_label="Counts",
            ))
        # One percentile-bounds panel: must stay on the XLA program.
        p = out[0]
        q = dispatch.PanelData(**{**p.__dict__, "z_min": None, "z_max": None})
        return out + [q]

    ps = panels()
    base = dispatch.device_render_panels(ps, 16, 24)
    monkeypatch.setenv("CST_RENDER_KERNEL", "pallas")
    dispatch._batched_quantize_fn.cache_clear()
    routed = dispatch.device_render_panels(ps, 16, 24)
    dispatch._batched_quantize_fn.cache_clear()
    for b, r in zip(base, routed):
        assert b.keys() == r.keys()
        np.testing.assert_array_equal(b["rgba"], r["rgba"])
        assert b["vmin"] == pytest.approx(r["vmin"])
        assert b["vmax"] == pytest.approx(r["vmax"])


def test_render_kernel_pallas_stays_xla_when_sharded(rng, monkeypatch):
    """Under a mesh the manual kernel cannot be partitioned: the dispatch
    must keep the sharded XLA program (and still span all devices)."""
    import jax

    from configurable_spectrograms_tpu.render import dispatch, link
    from configurable_spectrograms_tpu.render.tile import TimeWindow

    monkeypatch.setitem(link._BACKEND, "mode", "device")
    monkeypatch.setitem(link._BACKEND, "forced_host", False)
    monkeypatch.setenv("CST_DATA_MESH", "1")
    monkeypatch.setenv("CST_RENDER_KERNEL", "pallas")
    dispatch._batched_quantize_fn.cache_clear()
    T, A, E = 48, 6, 12
    cube = (rng.random((T, A, E)) * 1e3).astype(np.float32)
    panel = dispatch.PanelData(
        cube=cube, pitch_mask=np.ones(A, bool),
        energy=np.geomspace(4000, 10, E).astype(np.float32),
        times=np.arange(T, dtype=np.float64),
        window=TimeWindow(0, T, (0.0, float(T - 1)), (0.0, float(T - 1))),
        y_min=0.0, y_max=4000.0, z_min=1.0, z_max=900.0,
        y_scale="log", z_scale="log", colormap="inferno",
        x_is_unix=False, z_label="Counts",
    )
    results = dispatch.device_render_panels([panel], 16, 24)
    assert "rgba" in results[0]
    assert dispatch.LAST_DISPATCH["devices"] == len(jax.devices())
    dispatch._batched_quantize_fn.cache_clear()
