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
