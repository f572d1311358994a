"""Seeded randomized differential fuzz of the panel analysis paths.

The production contract under test: the host (numpy) analysis
(``render.host_quantize.host_quantize``) and the device XLA program
(``ops.quantize_matrix``) are the same math (mirrors reference
plotting.make_spectrogram's normalize/percentile pipeline,
/root/reference/src/configurable_spectrograms/plotting.py), so on the CPU
backend their quantized index matrices and mapping metadata must agree
bit-for-bit across the whole configuration space -- scales, windows,
explicit/percentile bounds, NaN/inf/zero/negative densities, ascending
and descending energy axes, degenerate empties.  A single fixed-seed case
of this lives in test_quantize_path.py; this file sweeps the space with
deterministic per-seed configurations so regressions in rarely-hit
branches (empty panels, constant matrices, all-masked log-z, one-column
keeps) surface in CI rather than on real archives.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from configurable_spectrograms_tpu.ops import RenderSpec, colormap_lut, quantize_matrix  # noqa: E402
from configurable_spectrograms_tpu.render.host_quantize import host_quantize  # noqa: E402
from configurable_spectrograms_tpu.render.tile import TimeWindow, make_x_map, resample_indices  # noqa: E402

COLORMAPS = ("viridis", "plasma", "inferno", "magma", "turbo")


def _random_config(seed: int) -> dict:
    """One deterministic configuration per seed, covering the edge lattice."""
    rng = np.random.default_rng(seed)
    T = int(rng.integers(4, 260))
    E = int(rng.integers(3, 49))

    # Energy axis: descending (FAST convention), ascending, or linear grid.
    kind = rng.integers(0, 3)
    top = float(rng.uniform(50.0, 40000.0))
    bot = float(rng.uniform(0.5, 30.0))
    if kind == 0:
        energy = np.geomspace(top, bot, E)
    elif kind == 1:
        energy = np.geomspace(bot, top, E)
    else:
        energy = np.linspace(bot, top, E)
    energy = energy.astype(np.float32)

    y_min = 0.0
    y_max = float(rng.choice([4000.0, top * 2.0, float(rng.uniform(bot, top))]))
    e_valid = (energy >= y_min) & (energy <= y_max)

    scale = 10.0 ** float(rng.uniform(-2, 5))
    matrix = (rng.random((T, E)) * scale).astype(np.float32)
    # Sprinkle the hazard values the real archives contain.
    for frac, val in ((0.08, np.nan), (0.02, np.inf), (0.02, -np.inf), (0.06, 0.0)):
        if rng.random() < 0.7:
            matrix[rng.random(matrix.shape) < frac] = val
    if rng.random() < 0.3:
        matrix[rng.random(matrix.shape) < 0.1] *= -1.0
    edge = rng.integers(0, 8)
    if edge == 0:
        matrix[:] = np.nan  # empty panel
    elif edge == 1:
        matrix[:] = np.float32(rng.uniform(0.1, 100.0))  # constant (vmin == vmax)
    elif edge == 2:
        matrix[:, rng.integers(0, E)] = np.nan  # one all-NaN column
    elif edge == 3:
        matrix = -np.abs(matrix)  # log-z: everything non-positive

    # Window: full, interior, or degenerate.
    if rng.random() < 0.15:
        t_start, t_count = 0, T
    elif rng.random() < 0.1:
        t_start, t_count = int(rng.integers(0, T)), 0  # empty window
    else:
        t_start = int(rng.integers(0, max(T - 2, 1)))
        t_count = int(rng.integers(1, T - t_start + 1))

    # Bounds: percentile (random q pair) or explicit.
    if rng.random() < 0.5:
        lo = float(rng.uniform(0.0, 50.0))
        hi = float(rng.uniform(lo, 100.0)) if rng.random() < 0.9 else lo
        z_bounds = (None, None)
    else:
        lo, hi = 1.0, 99.0
        vmin = float(rng.uniform(0.0, scale * 0.5))
        vmax = vmin if rng.random() < 0.1 else float(rng.uniform(vmin, scale * 1.5))
        z_bounds = (vmin, vmax)

    return {
        "matrix": matrix,
        "energy": energy,
        "e_valid": e_valid,
        "t_start": t_start,
        "t_count": t_count,
        "z_bounds": z_bounds,
        "y_scale": str(rng.choice(["linear", "log"])),
        "z_scale": str(rng.choice(["linear", "log"])),
        "low_pct": lo,
        "high_pct": hi,
        "H": int(rng.integers(8, 96)),
        "W": int(rng.integers(8, 160)),
        "colormap": str(rng.choice(COLORMAPS)),
    }


def _assert_idx_parity(dev_idx, host_idx, sel, cfg, host, seed) -> bool:
    """Assert the device/host idx contract; return True when bit-exact.

    Bit-identical except cells proven to sit at a colormap-bin boundary
    (float64 recomputation of the host's normalize chain lands norm*256
    within a few float32 ulps of an integer), which may differ by exactly
    1 bin.  Two irreconcilable-by-restructuring sources (docs/parity.md):

    - log-z: XLA's float32 log10 disagrees with numpy's in the last ulp
      for some inputs;
    - explicit float64 bounds (both scales): the host casts the FLOAT64
      span to float32 exactly as matplotlib's Normalize does
      (``f32(vmax64 - vmin64)``), while the device program only ever
      sees float32 bounds and computes ``f32(f32(vmax) - f32(vmin))`` --
      a double-rounding that moves norm by ~1 ulp.

    Cells away from a boundary must still match bitwise, so genuine
    logic regressions keep failing loudly.
    """
    diff_mask = (dev_idx != host_idx) & sel
    if not diff_mask.any():
        return True
    delta = np.abs(dev_idx.astype(np.int32) - host_idx.astype(np.int32))
    assert int(delta[diff_mask].max()) <= 1, f"seed {seed}: idx differs by >1 bin"
    vmin = float(host["vmin"])  # the host's reference-exact bounds
    vmax = float(host["vmax"])
    assert vmax > vmin, f"seed {seed}: idx diverged with degenerate bounds"
    m = cfg["matrix"].astype(np.float64)
    if cfg["z_scale"] == "log":
        assert vmin > 0.0, f"seed {seed}: log-z idx diverged with non-positive vmin"
        lmin, lmax = np.log10(vmin), np.log10(vmax)
        span = lmax - lmin
        w = np.where(~np.isfinite(m) | (m <= 0.0), vmin, m)
        lw = np.log10(np.maximum(w, 1e-37))
        bins64 = (lw - lmin) / span * 256.0
        # One float32 ulp of any log10 term moves norm*256 by
        # ~256*ulp/span; allow a few ulps of slack across the cell's and
        # both bounds' logs.
        maxlog = max(abs(lmin), abs(lmax), float(np.abs(lw[diff_mask]).max()))
        tol = 256.0 * 6.0 * float(np.spacing(np.float32(maxlog))) / span
    else:
        w = np.where(np.isposinf(m), vmax, np.where(np.isnan(m) | np.isneginf(m), vmin, m))
        bins64 = (w - vmin) / (vmax - vmin) * 256.0
        # The only divergence source is ~1 ulp of the float32 span (and
        # one more of the quotient): a relative wiggle of a few 1e-7 on
        # the bin value itself.
        tol = max(1e-4, float(np.abs(bins64[diff_mask]).max()) * 6.0e-7)
    dist = np.abs(bins64 - np.rint(bins64))
    off_boundary = diff_mask & (dist > tol)
    assert not off_boundary.any(), (
        f"seed {seed}: {cfg['z_scale']}-z idx diverged {int(off_boundary.sum())} cells "
        f"AWAY from a bin boundary (min dist {float(dist[off_boundary].min()):.2e} > tol {tol:.2e})"
    )
    return False


@pytest.mark.parametrize("z_scale", ["log", "linear"])
def test_equal_bounds_paint_whole_panel_lut0(z_scale):
    """vmin == vmax must fill norm 0 for EVERY cell, exactly as matplotlib.

    Regression for a real divergence the fuzz sweep found: the device
    program's ``log_span == 0`` guard never fired under jit (XLA lowers
    the scalar and elementwise log10 differently, leaving log_span ~8e-9
    for identical bounds), producing idx 255 where the reference paints
    LUT[0]; the host ramped positive values instead of filling 0.
    """
    import matplotlib.colors as mcolors

    rng = np.random.default_rng(7)
    T, E = 40, 12
    matrix = (rng.random((T, E)) * 50 + 0.5).astype(np.float32)
    matrix[3, 4] = np.nan
    matrix[5, 2] = -1.0
    energy = np.geomspace(4000, 5, E).astype(np.float32)
    e_valid = np.ones(E, bool)
    v = 7.25
    spec = RenderSpec(height=16, width=16, y_scale="linear", z_scale=z_scale)
    dev = quantize_matrix(
        jnp.asarray(matrix), jnp.asarray(energy), jnp.asarray(e_valid),
        jnp.int32(T), jnp.int32(0), jnp.int32(T),
        jnp.asarray(np.array([v, v], np.float32)), spec,
    )
    host = host_quantize(
        matrix, energy, e_valid, 0, T, (v, v), "linear", z_scale, 1.0, 99.0
    )
    if z_scale == "linear":
        # The reference's linear arm recomputes degenerate bounds from the
        # substituted data (plotting.py:313-315) before matplotlib ever
        # sees them, so equal explicit bounds only mean a LUT[0] fill for
        # constant data; here both backends must agree post-recompute.
        np.testing.assert_array_equal(np.asarray(dev["idx"]), host["idx"])
        return
    # log-z: matplotlib's own rule is the oracle.
    expected = mcolors.LogNorm(vmin=v, vmax=v)(np.where(~np.isfinite(matrix) | (matrix <= 0), v, matrix))
    assert float(np.asarray(expected).max()) == 0.0  # Normalize fills 0
    assert np.all(np.asarray(dev["idx"]) == 0)
    assert np.all(host["idx"] == 0)


@pytest.mark.parametrize("seed", range(64))
def test_fuzz_host_vs_device_quantize(seed):
    cfg = _random_config(seed)
    T, E = cfg["matrix"].shape
    spec = RenderSpec(
        height=cfg["H"],
        width=cfg["W"],
        y_scale=cfg["y_scale"],
        z_scale=cfg["z_scale"],
        low_percentile=cfg["low_pct"],
        high_percentile=cfg["high_pct"],
    )
    zb_arr = np.array(
        [
            np.nan if cfg["z_bounds"][0] is None else cfg["z_bounds"][0],
            np.nan if cfg["z_bounds"][1] is None else cfg["z_bounds"][1],
        ],
        np.float32,
    )
    dev = quantize_matrix(
        jnp.asarray(cfg["matrix"]),
        jnp.asarray(cfg["energy"]),
        jnp.asarray(cfg["e_valid"]),
        jnp.int32(T),
        jnp.int32(cfg["t_start"]),
        jnp.int32(cfg["t_count"]),
        jnp.asarray(zb_arr),
        spec,
    )
    try:
        host = host_quantize(
            cfg["matrix"],
            cfg["energy"],
            cfg["e_valid"],
            cfg["t_start"],
            cfg["t_count"],
            cfg["z_bounds"],
            cfg["y_scale"],
            cfg["z_scale"],
            cfg["low_pct"],
            cfg["high_pct"],
        )
    except ValueError as exc:
        # The host raises the reference's LogNorm error when the safe
        # positive floor exceeds an explicit log-z vmax.  The device
        # program cannot raise: its meta must carry vmin > vmax so the
        # drain-side guard (render/drain.py) records the IDENTICAL
        # per-panel error.  The two backends must agree on which panels
        # are errors.
        assert "minvalue" in str(exc), f"seed {seed}: unexpected ValueError {exc}"
        assert cfg["z_scale"] == "log", f"seed {seed}: host raised outside log-z"
        assert not bool(dev["empty"]), f"seed {seed}: device empty but host errored"
        assert float(dev["vmin"]) > float(dev["vmax"]), (
            f"seed {seed}: host raised LogNorm error but device meta "
            f"vmin={float(dev['vmin'])} <= vmax={float(dev['vmax'])} -- the "
            "drain guard would render instead of recording the error"
        )
        return

    assert bool(dev["empty"]) == bool(host["empty"]), f"seed {seed}: empty flag diverged"
    if host["empty"]:
        return
    assert int(dev["n_kept"]) == host["n_kept"], f"seed {seed}: n_kept"
    np.testing.assert_array_equal(
        np.asarray(dev["kept_pos"])[: host["n_kept"]],
        host["kept_pos"][: host["n_kept"]],
        err_msg=f"seed {seed}: kept_pos",
    )
    assert bool(dev["flip"]) == bool(host["flip"]), f"seed {seed}: flip"
    for k in ("y0", "y1"):
        np.testing.assert_allclose(float(dev[k]), float(host[k]), rtol=1e-6, err_msg=f"seed {seed}: {k}")
    # The z mapping bounds must agree bitwise: both sides implement the
    # same float32 percentile arithmetic (numpy's _lerp mirror).
    np.testing.assert_array_equal(
        np.float32(dev["vmin"]), np.float32(host["vmin"]), err_msg=f"seed {seed}: vmin"
    )
    np.testing.assert_array_equal(
        np.float32(dev["vmax"]), np.float32(host["vmax"]), err_msg=f"seed {seed}: vmax"
    )
    # And therefore the quantized colormap indices agree for every kept
    # (time-window, energy) cell -- padding cells outside the window/keep
    # set are backend-private and excluded.  Bit-exact except at provable
    # colormap-bin boundaries, where XLA-vs-numpy log10 ulps (measured:
    # seeds 153/315/554) or the float64-span double-rounding of explicit
    # bounds (seed 4350, linear) may flip one bin -- see
    # _assert_idx_parity.
    sel = np.zeros((T, E), bool)
    sel[cfg["t_start"] : cfg["t_start"] + cfg["t_count"], host["kept_pos"][: host["n_kept"]]] = True
    exact_idx = _assert_idx_parity(np.asarray(dev["idx"]), host["idx"], sel, cfg, host, seed)

    if not exact_idx:
        # Boundary-cell bin flips propagate to the tile through the LUT;
        # the idx contract above already bounded them to +-1 bin at
        # proven log10 boundaries, so byte-equality doesn't apply.
        return
    # The shared resampler must then produce identical RGBA tiles.
    window = TimeWindow(
        cfg["t_start"],
        cfg["t_count"],
        (float(cfg["t_start"]), float(cfg["t_start"] + max(cfg["t_count"] - 1, 0))),
        (float(cfg["t_start"]), float(cfg["t_start"] + max(cfg["t_count"], 1))),
    )
    x_map = make_x_map(window, cfg["W"])
    lut = colormap_lut(cfg["colormap"])
    tiles = []
    for q in (dev, host):
        tiles.append(
            resample_indices(
                np.asarray(q["idx"]),
                np.asarray(q["kept_pos"]),
                int(q["n_kept"]),
                bool(q["flip"]),
                float(q["y0"]),
                float(q["y1"]),
                cfg["t_start"],
                cfg["t_count"],
                x_map,
                cfg["H"],
                cfg["W"],
                cfg["y_scale"],
                lut,
                empty=bool(q["empty"]),
            )
        )
    np.testing.assert_array_equal(tiles[0], tiles[1], err_msg=f"seed {seed}: rgba tile")


@pytest.mark.parametrize("z_scale", ["log", "linear"])
def test_nan_percentile_bounds_pin_lut0_on_both_backends(z_scale):
    """An all-NaN time window with otherwise-live columns must render LUT[0].

    The percentile pool is empty (every cell of the window is NaN while no
    column is all-NaN over the full file, so ``empty`` stays False), the
    lerp returns NaN bounds, and the whole panel's norm goes NaN.  The
    host pins that panel to LUT[0] (render/host_quantize.py NaN-span
    guard); the device program must NOT leave the result to the
    platform-defined NaN->uint8 convert (ops/spectrogram.py) -- both
    backends paint the identical all-zero index matrix.
    """
    rng = np.random.default_rng(11)
    T, E = 24, 10
    matrix = (rng.random((T, E)) * 40 + 1.0).astype(np.float32)
    matrix[6:12, :] = np.nan  # the window rows only
    energy = np.geomspace(4000, 5, E).astype(np.float32)
    e_valid = np.ones(E, bool)
    spec = RenderSpec(height=16, width=16, y_scale="linear", z_scale=z_scale)
    dev = quantize_matrix(
        jnp.asarray(matrix), jnp.asarray(energy), jnp.asarray(e_valid),
        jnp.int32(T), jnp.int32(6), jnp.int32(6),
        jnp.asarray(np.array([np.nan, np.nan], np.float32)), spec,
    )
    host = host_quantize(matrix, energy, e_valid, 6, 6, (None, None), "linear", z_scale, 1.0, 99.0)
    assert not bool(dev["empty"]) and not host["empty"]
    np.testing.assert_array_equal(np.asarray(dev["idx"]), host["idx"])
    if z_scale == "log":
        # Log-z has no data-derived fallback: NaN bounds stay NaN and the
        # panel must be uniformly LUT[0] on both backends.
        assert np.isnan(host["vmin"]) and np.isnan(host["vmax"])
        assert np.all(host["idx"] == 0)
        assert np.all(np.asarray(dev["idx"]) == 0)
