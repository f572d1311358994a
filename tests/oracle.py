"""Independent numpy oracle implementing the reference's panel math.

Re-expresses (not copies) the data transformations of the reference's
``make_spectrogram`` (reference plotting.py:92-330) in plain numpy, down to
a per-pixel colormap-index tile, so the device pipeline can be compared
against reference semantics exactly.
"""

from __future__ import annotations

import numpy as np


def oracle_tile(
    matrix: np.ndarray,  # (T, E) collapsed, valid rows only
    energy: np.ndarray,  # (E,)
    y_min: float,
    y_max: float,
    t_start: int,
    t_count: int,
    x_map: np.ndarray,  # (2,) affine pixel->col map
    H: int,
    W: int,
    y_scale: str,
    z_scale: str,
    z_min: float | None,
    z_max: float | None,
    low_pct: float = 1.0,
    high_pct: float = 99.0,
):
    """Return (idx_tile or None, vmin, vmax): -1 marks background pixels.

    ``idx_tile`` is in PNG row order (row 0 = top), matching render_matrix.
    """
    nan_col = ~np.all(np.isnan(matrix), axis=0)
    e_valid = (energy >= y_min) & (energy <= y_max)
    keep = nan_col & e_valid
    Mk = matrix[:, keep]
    y = energy[keep]
    if Mk.size == 0 or y.size == 0:
        return None, None, None
    if y[0] > y[-1]:
        y = y[::-1]
        Mk = Mk[:, ::-1]
    Mw = Mk[t_start : t_start + t_count]
    if Mw.size == 0:
        return None, None, None
    mp = Mw.T  # (n_kept, t_count) like the reference's matrix_plot

    vmin = float(z_min) if z_min is not None else float(np.nanpercentile(mp, low_pct))
    vmax = float(z_max) if z_max is not None else float(np.nanpercentile(mp, high_pct))

    fp = mp[np.isfinite(mp) & (mp > 0)]
    safe_vmin = float(np.nanmin(fp)) if fp.size > 0 else 1e-10

    if z_scale == "log":
        vmin = float(max(vmin, safe_vmin, 1e-10))
        vmax = float(vmax)
        mp = np.where(~np.isfinite(mp) | (mp <= 0), vmin, mp)
        norm = (np.log10(mp) - np.log10(vmin)) / (np.log10(vmax) - np.log10(vmin))
    else:
        mp = np.where(np.isnan(mp), vmin, mp)
        mp = np.where(np.isneginf(mp), vmin, mp)
        mp = np.where(np.isposinf(mp), vmax, mp)
        if not (np.isfinite(vmin) and np.isfinite(vmax) and vmax > vmin):
            vmin = float(np.nanmin(mp))
            vmax = float(np.nanmax(mp))
        norm = (mp - vmin) / ((vmax - vmin) if vmax != vmin else 1.0)

    idx = np.clip(np.floor(norm * 256.0), 0, 255).astype(np.int32)  # (n_kept, t_count)

    n_kept = y.size
    out = np.full((H, W), -1, dtype=np.int32)
    px = np.arange(W, dtype=np.float64)
    col_f = x_map[0] * px + x_map[1]
    x_ok = (col_f >= 0) & (col_f <= t_count)
    col = np.clip(col_f.astype(np.int64), 0, t_count - 1)

    py = (np.arange(H, dtype=np.float64) + 0.5) / H
    y0, y1 = float(y[0]), float(y[-1])
    if y_scale == "log":
        y_data = 10 ** (np.log10(y0) + py * (np.log10(y1) - np.log10(y0)))
        row_f = (y_data - y0) / ((y1 - y0) if y1 != y0 else 1.0) * n_kept
    else:
        row_f = py * n_kept
    row = np.clip(row_f.astype(np.int64), 0, n_kept - 1)

    tile = idx[np.ix_(row, col)]  # (H, W), row 0 = bottom
    tile = np.where(x_ok[None, :], tile, -1)
    return tile[::-1, :], vmin, vmax
