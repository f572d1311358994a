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


def _render_multirow_zoom(y_scale="log", z_scale="log", colormap="inferno"):
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
        y_scale=y_scale,
        z_scale=z_scale,
        colormap=colormap,
        cusp_marker_style="both",
        title="Golden multirow",
    )
    return np.asarray(fig.render(dpi=60).convert("RGB"))


@pytest.fixture(scope="module")
def golden_archive(tmp_path_factory):
    """A deterministic 1-orbit synthetic archive for the FAST-grid goldens."""
    from configurable_spectrograms_tpu.data.synthetic import synth_fast_archive

    root = tmp_path_factory.mktemp("golden_fast")
    csv = root / "cusp.tsv"
    mapping = synth_fast_archive(str(root), [4242], n_time=120, n_angle=12, n_energy=24,
                                 cusp_csv_path=str(csv), seed=7)
    return {"mapping": mapping, "csv": str(csv)}


def _render_pitch_grid_200dpi(archive):
    """Pitch-angle grid at the production 200 DPI (reference fast/process_orbit.py:110)."""
    from configurable_spectrograms_tpu.data.cdf_utils import load_filtered_orbits
    from configurable_spectrograms_tpu.fast.plotting import FAST_plot_pitch_angle_grid

    df = load_filtered_orbits(archive["csv"])
    fig, _ = FAST_plot_pitch_angle_grid(
        archive["mapping"][4242]["ees"],
        filtered_orbits_df=df,
        orbit_number=4242,
        scale_function_y="log",
        scale_function_z="log",
        show=False,
        colormap="inferno",
    )
    return np.asarray(fig.render(dpi=200).convert("RGB"))


def _render_instrument_grid_200dpi(archive):
    """Instrument grid at the production 200 DPI with extrema overrides."""
    from configurable_spectrograms_tpu.data.cdf_utils import load_filtered_orbits
    from configurable_spectrograms_tpu.fast.plotting import FAST_plot_instrument_grid

    df = load_filtered_orbits(archive["csv"])
    extrema = {}
    for inst in ("ees", "eeb", "ies", "ieb"):
        extrema[f"{inst}_linear_log_y_max"] = 3000
        extrema[f"{inst}_linear_log_z_max"] = 1800.0
    fig, _ = FAST_plot_instrument_grid(
        archive["mapping"][4242],
        filtered_orbits_df=df,
        orbit_number=4242,
        scale_function_y="linear",
        scale_function_z="log",
        show=False,
        colormap="plasma",
        global_extrema=extrema,
    )
    return np.asarray(fig.render(dpi=200).convert("RGB"))


def _render_generic_set():
    from configurable_spectrograms_tpu.render.plotting import generic_plot_spectrogram_set

    a = _dataset(n_time=70, n_energy=16)
    ds = [{"x": a["time_unix"], "y": a["energy"][0, 0, :], "data": a["data"], "label": "Row A"}]
    fig, _ = generic_plot_spectrogram_set(
        ds, y_scale="linear", z_scale="linear", colormap="viridis", figure_title="Golden set"
    )
    return np.asarray(fig.render(dpi=60).convert("RGB"))


def _compare_golden(name, img, tmp_path):
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


#: All four (y, z) scale combos exercise distinct tick/normalization code
#: paths (reference constants.py:20-27 pairs each with its own colormap).
_COMBOS = [
    ("linear", "linear", "viridis"),
    ("linear", "log", "cividis"),
    ("log", "linear", "plasma"),
    ("log", "log", "inferno"),
]


@pytest.mark.parametrize(
    "name,render",
    [("multirow_zoom_log_log", _render_multirow_zoom), ("generic_set_linear", _render_generic_set)]
    + [
        (f"multirow_{y}_{z}", (lambda y=y, z=z, c=c: _render_multirow_zoom(y, z, c)))
        for y, z, c in _COMBOS[:3]
    ],
)
def test_golden_figure(name, render, monkeypatch, tmp_path):
    from configurable_spectrograms_tpu.render import figure as figure_mod

    monkeypatch.setitem(figure_mod._BACKEND, "mode", "host")
    _compare_golden(name, render(), tmp_path)


@pytest.mark.parametrize("kind", ["pitch", "instrument"])
def test_golden_fast_grid_200dpi(kind, golden_archive, monkeypatch, tmp_path):
    """The production figures at the production DPI: pitch-angle and
    instrument grids, pinned pixel-for-pixel."""
    from configurable_spectrograms_tpu.render import figure as figure_mod

    monkeypatch.setitem(figure_mod._BACKEND, "mode", "host")
    render = _render_pitch_grid_200dpi if kind == "pitch" else _render_instrument_grid_200dpi
    _compare_golden(f"fast_{kind}_grid_200dpi", render(golden_archive), tmp_path)


def test_golden_audio_mel(monkeypatch, tmp_path):
    """The audio STFT/mel front-end figure, pinned pixel-for-pixel (a
    deterministic chirp through mel_spectrogram + the generic renderer)."""
    from configurable_spectrograms_tpu.ops.stft import audio_spectrogram_dataset
    from configurable_spectrograms_tpu.render import figure as figure_mod
    from configurable_spectrograms_tpu.render.plotting import generic_plot_spectrogram_set

    monkeypatch.setitem(figure_mod._BACKEND, "mode", "host")
    rate = 8000
    t = np.arange(rate) / rate
    sig = np.sin(2 * np.pi * (200 + 1400 * t) * t).astype(np.float32)
    ds = audio_spectrogram_dataset(sig, rate, frame_length=256, hop_length=128, n_mels=48,
                                   label="Golden chirp")
    fig, _ = generic_plot_spectrogram_set(
        [ds], x_is_unix=False, z_scale="log", colormap="magma",
        y_min=float(ds["y"][0]), y_max=float(ds["y"][-1]),
    )
    img = np.asarray(fig.render(dpi=72).convert("RGB"))
    _compare_golden("audio_mel_chirp", img, tmp_path)
