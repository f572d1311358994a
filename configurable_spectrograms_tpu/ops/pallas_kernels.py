"""Pallas TPU kernels for the hot device ops.

The rasterization pipeline is mostly XLA-fused already; the op worth a
hand-written kernel is the pitch-collapse reduction -- the largest memory
touch in both the render path and the full-archive extrema scan
(HOT LOOP #1/#2 in SURVEY.md section 3): each file reads ``T*A*E`` floats
and reduces the pitch axis.  :func:`collapse_cube_pallas` streams the cube
through VMEM in time tiles, fusing the category mask, the NaN-as-zero
substitution, the pitch-axis sum, and the padding-row NaN stamp in one
pass, so the cube is read from HBM exactly once and nothing intermediate
is materialized.

Kernels gate on padded shapes (lane dim = multiple of 128); callers fall
back to the jnp implementation otherwise (``collapse_cube`` in
``ops/spectrogram.py``), and results are bit-identical (tested in
``tests/test_pallas.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python scalar: pallas kernels cannot capture traced constants


def _collapse_kernel(mask_ref, tvalid_ref, cube_ref, out_ref):
    """One (T_tile, A, E) block -> (T_tile, E) masked nansum + pad stamp."""
    cube = cube_ref[:]  # (Tt, A, E)
    mask = mask_ref[:]  # (A, 1) float {0, 1}
    keep = (mask[None, :, :] > 0.0) & ~jnp.isnan(cube)
    collapsed = jnp.sum(jnp.where(keep, cube, 0.0), axis=1)  # (Tt, E)
    tt, ee = collapsed.shape
    t0 = pl.program_id(0) * tt
    rows = jax.lax.broadcasted_iota(jnp.int32, (tt, ee), 0) + t0
    out_ref[:] = jnp.where(rows < tvalid_ref[0], collapsed, jnp.nan)


def _fused_quantize_kernel(
    scalars_ref,  # SMEM (6,) int32: [t_valid, t_start, t_count, phase-unused pad...]
    zb_ref,  # SMEM (2,) float32: [vmin, vmax] (explicit, valid)
    mask_ref,  # VMEM (A, 1) float {0,1}
    evalid_ref,  # VMEM (1, E) float {0,1}
    cube_ref,  # VMEM (Tt, A, E) float32 block
    idx_ref,  # VMEM (Tt, E) uint8 out block
    stats_out_ref,  # VMEM (1, 128) float32 out: lane 0 = safe_vmin used
    colnan_ref,  # VMEM (1, E) float32 out: 1.0 where column all-NaN in-file
    collapsed_ref,  # VMEM scratch (T, E) float32
    acc_ref,  # VMEM scratch (2, E) float32: row0 col_any, row1 min-positive
    *,
    t_tile: int,
    z_scale: str,
):
    phase = pl.program_id(0)
    t = pl.program_id(1)
    t_valid = scalars_ref[0]
    t_start = scalars_ref[1]
    t_count = scalars_ref[2]

    @pl.when(phase == 0)
    def _stats_pass():
        @pl.when(t == 0)
        def _init():
            acc_ref[0, :] = jnp.zeros_like(acc_ref[0, :])
            acc_ref[1, :] = jnp.full_like(acc_ref[1, :], _BIG)

        cube = cube_ref[:]
        mask = mask_ref[:]
        keep = (mask[None, :, :] > 0.0) & ~jnp.isnan(cube)
        tile = jnp.sum(jnp.where(keep, cube, 0.0), axis=1)  # (Tt, E)
        tt, ee = tile.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (tt, ee), 0) + t * tt
        in_file = rows < t_valid
        tile = jnp.where(in_file, tile, jnp.nan)
        collapsed_ref[pl.ds(t * t_tile, t_tile), :] = tile
        acc_ref[0, :] = jnp.maximum(
            acc_ref[0, :], jnp.max(jnp.where(~jnp.isnan(tile) & in_file, 1.0, 0.0), axis=0)
        )
        in_window = in_file & (rows >= t_start) & (rows < t_start + t_count)
        fp = jnp.isfinite(tile) & (tile > 0.0) & in_window & (evalid_ref[0, :][None, :] > 0.0)
        acc_ref[1, :] = jnp.minimum(acc_ref[1, :], jnp.min(jnp.where(fp, tile, _BIG), axis=0))

    @pl.when(phase == 1)
    def _quantize_pass():
        tile = collapsed_ref[pl.ds(t * t_tile, t_tile), :]
        vmin = zb_ref[0]
        vmax = zb_ref[1]
        minpos_cols = acc_ref[1, :]
        any_pos = jnp.min(minpos_cols) < _BIG
        safe_vmin = jnp.where(any_pos, jnp.min(minpos_cols), jnp.float32(1e-10))
        if z_scale == "log":
            vmin = jnp.maximum(jnp.maximum(vmin, safe_vmin), 1e-10)
            work = jnp.where(~jnp.isfinite(tile) | (tile <= 0.0), vmin, tile)
            log_vmin = jnp.log10(vmin)
            log_span = jnp.log10(vmax) - log_vmin
            ramp = (jnp.log10(jnp.maximum(work, 1e-37)) - log_vmin) / jnp.where(
                log_span == 0.0, 1.0, log_span
            )
            # matplotlib Normalize fills 0 when vmin == vmax; compare the
            # raw bounds, not the logs (two log10 lowerings can differ by
            # ULPs, see ops/spectrogram.py).  Reachable here when the safe
            # floor raises vmin up to exactly vmax.
            norm = jnp.where(vmin == vmax, 0.0, ramp)
        else:
            work = jnp.where(jnp.isnan(tile), vmin, tile)
            work = jnp.where(work == -jnp.inf, vmin, work)
            work = jnp.where(work == jnp.inf, vmax, work)
            span = vmax - vmin
            ramp = (work - vmin) / jnp.where(span == 0.0, 1.0, span)
            norm = jnp.where(vmin == vmax, 0.0, ramp)
        # NaN cells (NaN bounds surviving to the ramp) pin to LUT[0] like
        # the host path; the NaN->int convert is platform-defined.
        norm = jnp.where(jnp.isnan(norm), 0.0, norm)
        # Mosaic has no f32->u8 cast; round-trip through int32.
        idx_ref[:] = jnp.clip(jnp.floor(norm * 256.0), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)

        @pl.when(t == 0)
        def _emit_stats():
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            stats_out_ref[:] = jnp.where(lanes == 0, vmin, 0.0)
            colnan_ref[:] = (1.0 - acc_ref[0, :])[None, :]


@functools.partial(jax.jit, static_argnames=("z_scale", "t_tile", "interpret"))
def fused_quantize_pallas(
    cube: jax.Array,
    pitch_mask: jax.Array,
    e_valid: jax.Array,
    t_valid: jax.Array | int,
    t_start: jax.Array | int,
    t_count: jax.Array | int,
    z_bounds: jax.Array,
    z_scale: str = "log",
    t_tile: int = 64,
    interpret: bool | None = None,
) -> dict[str, jax.Array]:
    """One-pass fused collapse + explicit-bounds quantize (HOT LOOP #2/#3).

    The production given-extrema render path (``skip_percentile=True``):
    pitch-category masked nansum collapse, padding-row stamp, safe-floor
    color normalization, and matplotlib's colormap index rule, in a single
    Pallas program.  A two-phase sequential grid (stats pass, quantize
    pass) keeps the collapsed matrix in VMEM scratch, so the cube streams
    from HBM exactly once and the (T, E) matrix never round-trips.

    Preconditions (the callers' given-extrema case): ``z_bounds`` finite
    with ``vmax > vmin`` (the jnp path keeps handling degenerate bounds),
    ``E % 128 == 0``, ``T % t_tile == 0``.  Returns ``idx`` (T, E) uint8,
    ``vmin`` (the safe-floored bound actually used, matching
    ops.spectrogram._analyze_matrix's log rule), and ``col_all_nan`` (E,)
    bool for the host's kept-column ordering.  Bit-parity with the jnp
    path is pinned in tests/test_pallas.py.
    """
    T, A, E = cube.shape
    if E % 128 != 0 or T % t_tile != 0:
        raise ValueError(f"fused_quantize_pallas needs E%128==0 and T%{t_tile}==0, got {(T, A, E)}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scalars = jnp.stack(
        [
            jnp.asarray(t_valid, jnp.int32),
            jnp.asarray(t_start, jnp.int32),
            jnp.asarray(t_count, jnp.int32),
        ]
    )
    mask_f = pitch_mask.astype(jnp.float32).reshape(A, 1)
    evalid_f = e_valid.astype(jnp.float32).reshape(1, E)
    grid = (2, T // t_tile)
    kernel = functools.partial(_fused_quantize_kernel, t_tile=t_tile, z_scale=z_scale)
    idx, stats, colnan = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, E), jnp.uint8),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((A, 1), lambda p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda p, t: (0, 0), memory_space=pltpu.VMEM),
            # Phase 1 reads the collapsed scratch, not the cube: pin the
            # block index so Pallas skips the cube DMA (revisiting rule).
            pl.BlockSpec((t_tile, A, E), lambda p, t: ((1 - p) * t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t_tile, E), lambda p, t: (p * t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda p, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, E), jnp.float32),
            pltpu.VMEM((8, E), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, jnp.asarray(z_bounds, jnp.float32), mask_f, evalid_f, cube.astype(jnp.float32))
    return {"idx": idx, "vmin": stats[0, 0], "col_all_nan": colnan[0] > 0.5}


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret"))
def collapse_cube_pallas(
    cube: jax.Array,
    pitch_mask: jax.Array,
    t_valid: jax.Array | int,
    t_tile: int = 64,
    interpret: bool | None = None,
) -> jax.Array:
    """Pallas fused masked-nansum collapse: (T, A, E) -> (T, E).

    Requires ``E`` a multiple of 128 and ``T`` a multiple of ``t_tile``
    (callers pad); semantics identical to
    :func:`configurable_spectrograms_tpu.ops.spectrogram.collapse_cube`.
    ``interpret`` defaults to True off-TPU so the kernel is testable on the
    CPU backend through the Pallas interpreter.
    """
    T, A, E = cube.shape
    if E % 128 != 0 or T % t_tile != 0:
        raise ValueError(f"collapse_cube_pallas needs E%128==0 and T%{t_tile}==0, got {(T, A, E)}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mask_f = pitch_mask.astype(jnp.float32).reshape(A, 1)
    tvalid_arr = jnp.asarray(t_valid, jnp.int32).reshape(1)
    grid = (T // t_tile,)
    return pl.pallas_call(
        _collapse_kernel,
        out_shape=jax.ShapeDtypeStruct((T, E), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((A, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((t_tile, A, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_tile, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mask_f, tvalid_arr, cube.astype(jnp.float32))


def _stft_power_kernel(frames_ref, cos_ref, sin_ref, out_ref):
    """Fused windowed-DFT power: two MXU matmuls + the |X|^2 epilogue.

    The Hann window is folded into the basis matrices (ops/stft.py), so
    one kernel invocation turns a (f_tile, L) frame block into a
    (f_tile, k_tile) power block with no intermediate leaving VMEM.
    """
    f = frames_ref[...]
    re = jnp.dot(f, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(f, sin_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = re * re + im * im


@functools.partial(jax.jit, static_argnames=("f_tile", "k_tile", "interpret"))
def stft_power_pallas(
    frames: jax.Array,
    cos_b: jax.Array,
    sin_b: jax.Array,
    f_tile: int = 128,
    k_tile: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Windowed-DFT power spectrogram as one fused Pallas program.

    ``frames`` is (F, L) framed audio; ``cos_b``/``sin_b`` are the
    window-folded real-DFT bases (L, K) from ``ops.stft._dft_bases``
    (BASELINE configs[4]'s "windowed-FFT Pallas kernel").  The grid tiles
    (F/f_tile, K/k_tile); each step runs two (f_tile, L) @ (L, k_tile)
    matmuls on the MXU and writes the fused power epilogue.  Callers pad
    F and K to tile multiples (``stft_magnitude(method="pallas")`` does).
    Math identical to the ``"matmul"`` method (same contraction over the
    full L axis); outputs agree up to float32 reassociation of the dot
    accumulation (different tilings sum in different orders -- tested at
    1e-5 relative over the spectrum's dynamic range).
    """
    F, L = frames.shape
    K = cos_b.shape[1]
    if F % f_tile != 0 or K % k_tile != 0:
        raise ValueError(f"stft_power_pallas needs F%{f_tile}==0 and K%{k_tile}==0, got {(F, K)}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (F // f_tile, K // k_tile)
    return pl.pallas_call(
        _stft_power_kernel,
        out_shape=jax.ShapeDtypeStruct((F, K), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((f_tile, L), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, k_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, k_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f_tile, k_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames.astype(jnp.float32), cos_b.astype(jnp.float32), sin_b.astype(jnp.float32))
