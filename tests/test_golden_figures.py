"""Golden-image tests for full composited figures.

The data-tile parity suite (test_ops, test_quantize_path) proves the pixel
math; these goldens additionally pin the compositor -- margins, ticks, tick
*synthesis*, axis labels, rotated row labels, colorbars, 10^k superscripts,
cusp markers, footers -- against committed reference renders.

Renders use the host backend so the images are independent of the XLA
version; host/device equality has its own tests.  To regenerate after an
intentional layout change: ``CST_REGEN_GOLDENS=1 python -m pytest
tests/test_golden_figures.py`` and commit the new PNGs.
"""

import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

GOLDEN_DIR = Path(__file__).parent / "goldens"


def _dataset(n_time=90, n_angle=6, n_energy=20):
    from configurable_spectrograms_tpu.data.synthetic import synth_instrument_arrays

    rng = np.random.default_rng(42)
    a = synth_instrument_arrays(rng, n_time=n_time, n_angle=n_angle, n_energy=n_energy)
    return a


def _render_multirow_zoom():
    from configurable_spectrograms_tpu.render.plotting import generic_plot_multirow_optional_zoom

    a = _dataset()
    ds = [
        {"x": a["time_unix"], "y": a["energy"][0, 0, :], "data": a["data"], "label": "EES"},
        {"x": a["time_unix"], "y": a["energy"][0, 0, :], "data": a["data"] * 3.0, "label": "IES"},
    ]
    marks = [float(a["time_unix"][35]), float(a["time_unix"][55])]
    fig, _ = generic_plot_multirow_optional_zoom(
        ds,
        vertical_lines=marks,
        y_scale="log",
        z_scale="log",
        colormap="inferno",
        cusp_marker_style="both",
        title="Golden multirow",
    )
    return np.asarray(fig.render(dpi=60).convert("RGB"))


def _render_generic_set():
    from configurable_spectrograms_tpu.render.plotting import generic_plot_spectrogram_set

    a = _dataset(n_time=70, n_energy=16)
    ds = [{"x": a["time_unix"], "y": a["energy"][0, 0, :], "data": a["data"], "label": "Row A"}]
    fig, _ = generic_plot_spectrogram_set(
        ds, y_scale="linear", z_scale="linear", colormap="viridis", figure_title="Golden set"
    )
    return np.asarray(fig.render(dpi=60).convert("RGB"))


@pytest.mark.parametrize(
    "name,render",
    [("multirow_zoom_log_log", _render_multirow_zoom), ("generic_set_linear", _render_generic_set)],
)
def test_golden_figure(name, render, monkeypatch, tmp_path):
    from configurable_spectrograms_tpu.render import figure as figure_mod

    monkeypatch.setitem(figure_mod._BACKEND, "mode", "host")
    img = render()
    golden_path = GOLDEN_DIR / f"{name}.png"
    if os.environ.get("CST_REGEN_GOLDENS") == "1" or not golden_path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        Image.fromarray(img).save(golden_path)
        pytest.skip(f"golden written: {golden_path}")
    golden = np.asarray(Image.open(golden_path).convert("RGB"))
    assert img.shape == golden.shape, f"figure geometry changed: {img.shape} vs {golden.shape}"
    diff = (img != golden).any(axis=-1)
    if diff.any():
        out = tmp_path / f"{name}_got.png"
        Image.fromarray(img).save(out)
        raise AssertionError(
            f"{diff.mean():.4%} of pixels differ from {golden_path.name}; actual render "
            f"saved to {out} (CST_REGEN_GOLDENS=1 to accept an intentional change)"
        )
