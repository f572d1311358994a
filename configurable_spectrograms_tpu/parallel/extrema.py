"""Collective folder-wide extrema statistics over a device mesh.

Replaces the reference's sequential host scan + in-memory sample pooling
(reference fast/extrema.py:245-285) with a sharded reduction: files shard
over the mesh's ``data`` axis and (optionally) each file's time axis
shards over a ``time`` axis -- the sequence-parallel analog for very long
records.  Each shard reduces its slice to per-energy-bin positive counts
and a log histogram; ``psum`` over ``time`` completes per-file counts, and
``psum`` over the whole mesh produces the global histogram every device
can read back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    _CHECK_KW = "check_vma"
except ImportError:  # pragma: no cover - legacy jax
    from jax.experimental.shard_map import shard_map as _shard_map

    _CHECK_KW = "check_rep"


def shard_map(f=None, **kwargs):
    kwargs[_CHECK_KW] = kwargs.pop("check", False)
    return _shard_map(f, **kwargs) if f is not None else _shard_map(**kwargs)

from configurable_spectrograms_tpu.ops.extrema_ops import HIST_BINS, LOG_HI, LOG_LO, sorted_bincount


def _shard_stats(cubes: jax.Array, t_valids: jax.Array, t_offset: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-shard stats for a (n, Tshard, A, E) slice of the file batch.

    ``t_offset`` is the global index of this shard's first time row, so the
    per-file ``t_valid`` cutoff applies correctly on every shard.
    """
    n, T, A, E = cubes.shape
    masked = jnp.where(jnp.isnan(cubes), 0.0, cubes)
    collapsed = jnp.sum(masked, axis=2)  # (n, T, E) nansum over pitch
    t_index = jax.lax.broadcasted_iota(jnp.int32, (n, T, E), 1) + t_offset
    in_file = t_index < t_valids[:, None, None]
    fp = jnp.isfinite(collapsed) & (collapsed > 0) & in_file
    counts = jnp.sum(fp, axis=1).astype(jnp.int32)  # (n, E)
    logv = jnp.log10(jnp.where(fp, collapsed, 1.0))
    bins = jnp.clip(((logv - LOG_LO) / (LOG_HI - LOG_LO) * HIST_BINS).astype(jnp.int32), 0, HIST_BINS - 1)
    flat = jnp.ravel(jnp.where(fp, bins, HIST_BINS))
    hist = sorted_bincount(flat, HIST_BINS)
    return counts, hist


def sharded_extrema_stats(
    cubes: np.ndarray | jax.Array,
    t_valids: np.ndarray | jax.Array,
    mesh: Mesh,
) -> tuple[np.ndarray, np.ndarray]:
    """Global extrema stats for a batch of files sharded over *mesh*.

    Parameters
    ----------
    cubes : (N, T, A, E) float32
        Padded file batch; N must divide by the ``data`` axis size and T by
        the ``time`` axis size (pad rows with NaN).
    t_valids : (N,) int32
        Real time length per file.
    mesh : Mesh
        Mesh with a ``data`` axis and optionally a ``time`` axis.

    Returns
    -------
    (counts, hist)
        ``counts`` (N, E) int32 per-file positive samples per energy bin;
        ``hist`` (HIST_BINS,) int64 global log-histogram (identical on all
        devices after the psum).
    """
    axis_names = mesh.axis_names
    has_time = "time" in axis_names
    in_specs = (
        P("data", "time" if has_time else None, None, None),
        P("data"),
    )
    out_specs = (P("data", None), P())

    @functools.partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def run(c, tv):
        if has_time:
            t_shard = c.shape[1]
            t_off = jax.lax.axis_index("time") * t_shard
        else:
            t_off = 0
        counts, hist = _shard_stats(c, tv, t_off)
        if has_time:
            counts = jax.lax.psum(counts, "time")
        hist = jax.lax.psum(hist, axis_names)
        return counts, hist

    # Already-global jax.Arrays (multi-host: assembled per process via
    # mesh.global_file_batch) pass through untouched; host numpy converts
    # locally (single-process meshes only).
    c_arr = cubes if isinstance(cubes, jax.Array) else jnp.asarray(cubes, jnp.float32)
    tv_arr = t_valids if isinstance(t_valids, jax.Array) else jnp.asarray(t_valids, jnp.int32)
    counts, hist = jax.jit(run)(c_arr, tv_arr)
    # On a multi-host mesh only the local shards are addressable.  The
    # histogram is replicated (out_specs P()), so any local shard holds
    # the full psum'd value; ``counts`` is sharded over files, so gather
    # it across processes to honor the single-host contract (every caller
    # gets the full (N, E) array).
    if not hist.is_fully_addressable:
        hist = hist.addressable_data(0)
    if not counts.is_fully_addressable:
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(counts, tiled=True)
    return np.asarray(counts), np.asarray(hist).astype(np.int64)
