"""Batched device dispatch pipeline for panel rasterization.

Split out of :mod:`configurable_spectrograms_tpu.render.figure` (which keeps
the deferred figure/Axes model): this module owns the shape-bucketing, the
packed-lane jitted collapse+quantize program, the device-resident cube
cache, the enqueue/drain pipelining (:class:`PendingRender`), and the
link-health fallbacks.  It is the TPU-native replacement for the fan-out
the reference obtained from its process pool (reference
fast/batch_directory.py:337): panels from many figures pad into shape
buckets and rasterize in a handful of vmapped, mesh-sharded TPU dispatches,
with a parity-tested numpy host backend behind the same interface.
"""

from __future__ import annotations

import functools
import math
import os
import threading as _threading
from collections import deque
from dataclasses import dataclass, field

import numpy as np

from configurable_spectrograms_tpu.render.link import (
    _BACKEND,
    _BACKEND_LOCK,
    _CALIBRATE_XFER_SEC_PER_PANEL,
    _MIN_LINK_MBPS,
    _bounded_call,
    _dispatch_timeout,
    _host_backend_active,
    _host_sec_per_panel,
    _SLOW_FACTOR,
    bucket_soft_timeout,
    force_host_after_dispatch_failure,
    force_host_slow,
    maybe_reprobe_device_link,
    note_bucket_drain,
    note_device_batch,
    note_host_group,
    prefer_host_for_latency,
    probe_device_link,
    take_probation,
)
from configurable_spectrograms_tpu.render.tile import (
    TimeWindow,
    make_x_map,
    pixel_columns,
    resample_indices,
)
from configurable_spectrograms_tpu.utils.resident_cache import ResidentCache

def _bucket(n: int, step: int, minimum: int) -> int:
    return max(minimum, int(math.ceil(n / step)) * step)



@dataclass
class PanelData:
    """Everything needed to rasterize and decorate one spectrogram panel."""

    cube: np.ndarray  # (T, A, E) float32, collapse axis already at 1
    pitch_mask: np.ndarray  # (A,) bool
    energy: np.ndarray  # (E,)
    times: np.ndarray  # (T,) x values (unix seconds or raw)
    window: TimeWindow
    y_min: float
    y_max: float
    z_min: float | None
    z_max: float | None
    y_scale: str
    z_scale: str
    colormap: str
    x_is_unix: bool
    z_label: str
    vertical_lines: list[float] = field(default_factory=list)
    cusp_marker_style: str = "both"
    cusp_marker_kwargs: dict = field(default_factory=dict)
    line_color: str = "red"
    low_percentile: float = 1.0
    high_percentile: float = 99.0
    #: Optional override of the energy range used only for percentile color
    #: bounds (y_min, y_max), pooled over the full file's rows -- the FAST
    #: grids' bound rule (reference fast/plotting.py:118-134).
    bounds_energy_range: tuple[float, float] | None = None


# ---------------------------------------------------------------------------
# batched rasterization (device by default, host fallback)
# ---------------------------------------------------------------------------

def _render_group_host(panels: list[PanelData], idxs: list[int], tile_h: int, tile_w: int,
                       y_scale: str, z_scale: str, lo_pct: float, hi_pct: float,
                       results: list) -> None:
    """Pure-numpy group rasterization (no device involved).

    Every call is timed into the link-layer rate meter
    (:func:`..render.link.note_host_group`): the slow-dispatch detector
    and the latency policy compare device throughput against *measured*
    host rates, and any host render -- backend runs, fallbacks, probation
    groups -- is a measurement.
    """
    import time as _time

    from configurable_spectrograms_tpu.ops._colormap_data import colormap_lut
    from configurable_spectrograms_tpu.render.host_quantize import (
        cached_collapse,
        host_clean,
        host_quantize,
    )

    _host_t0 = _time.perf_counter()

    # The shared NaN pass per cube runs at most once per group, and only
    # if some mask actually misses the cross-render collapse cache.
    clean_cache: dict[int, np.ndarray] = {}

    def _clean_for(cube):
        def provider():
            c = clean_cache.get(id(cube))
            if c is None:
                c = clean_cache[id(cube)] = host_clean(cube)
            return c

        return provider

    for i in idxs:
        p = panels[i]
        matrix = cached_collapse(p.cube, p.pitch_mask, _clean_for(p.cube))
        e_valid = (p.energy >= p.y_min) & (p.energy <= p.y_max)
        if p.bounds_energy_range is not None:
            b_lo, b_hi = p.bounds_energy_range
            zb_e_valid = (p.energy >= b_lo) & (p.energy <= b_hi)
            zb_full = True
        else:
            zb_e_valid, zb_full = None, False
        try:
            q = host_quantize(
                matrix, p.energy, e_valid, p.window.t_start, p.window.t_count,
                (p.z_min, p.z_max), y_scale, z_scale, lo_pct, hi_pct, zb_e_valid, zb_full,
            )
        except ValueError as exc:
            # Per-panel analysis error (inverted log bounds): recorded and
            # raised by the owning figure's composite, not here -- a raise
            # inside a pooled group would fail every coalesced figure.
            results[i] = {"error": str(exc)}
            continue
        rgba = resample_indices(
            q["idx"], q["kept_pos"], q["n_kept"], q["flip"], q["y0"], q["y1"],
            p.window.t_start, p.window.t_count, make_x_map(p.window, tile_w),
            tile_h, tile_w, y_scale, colormap_lut(p.colormap), empty=q["empty"],
        )
        results[i] = {
            "rgba": rgba,
            "vmin": q["vmin"],
            "vmax": q["vmax"],
            "y0": q["y0"],
            "y1": q["y1"],
            "n_kept": q["n_kept"],
            "empty": q["empty"],
        }
    note_host_group(len(idxs), _time.perf_counter() - _host_t0)


#: Diagnostics for the last device dispatch (tests assert the production
#: path actually spans the mesh): ``lanes`` = padded panel lanes shipped,
#: ``devices`` = number of devices the output sharding covered.
LAST_DISPATCH: dict[str, int] = {"lanes": 0, "devices": 0}

#: Rolling log of recent dispatches (lanes/devices per bucket), so tests
#: can assert EVERY bucket of a multi-bucket call sharded -- LAST_DISPATCH
#: alone only shows the final one.  A deque(maxlen=...) keeps the
#: append-and-trim atomic under the GIL (enqueues can run concurrently
#: from the coalescer drain thread and direct callers); clear() freely in
#: tests.
DISPATCH_HISTORY: "deque[dict]" = deque(maxlen=64)

#: PendingRenders currently in flight (enqueued, not fully drained).  The
#: link-health heuristics only trust a transfer measurement taken with the
#: link to itself; concurrent drains share bandwidth and would be
#: misattributed as a slow link.
_ACTIVE_DRAINS = {"n": 0}
_ACTIVE_DRAINS_LOCK = _threading.Lock()

#: Device-resident padded-cube cache.  A batch renders each cube many
#: times (raw + given-extrema figure pairs, pitch grid + instrument grid,
#: repeat passes), and on link-constrained setups the ~12.6 MB-per-cube
#: H2D upload dominates the device path -- so padded cubes stay resident
#: and repeat renders reuse them with zero host transfer.  Single cubes
#: key by (id(cube), padded shape); whole dispatch stacks (including
#: their mesh-replicated broadcast) key by the tuple of cube ids, so a
#: repeat render of the same group re-ships nothing -- not even the
#: on-device concatenate or the cross-device broadcast.  Owner-death
#: eviction keeps a recycled id from aliasing a stale entry.  Budgeted by
#: CST_DEVICE_CUBE_CACHE_BYTES (default 1.5 GB, FIFO eviction);
#: CST_DEVICE_CUBE_CACHE=0 disables.
def _device_cube_budget() -> int:
    try:
        return int(os.environ.get("CST_DEVICE_CUBE_CACHE_BYTES", 1_500_000_000))
    except ValueError:
        return 1_500_000_000


_DEVICE_CUBE_CACHE = ResidentCache(max_bytes=_device_cube_budget)


def _padded_device_cube(cube: np.ndarray, Tp: int, Ap: int, Ep: int):
    """NaN-padded (Tp, Ap, Ep) copy of *cube* resident on device, cached."""
    import jax

    key = (id(cube), Tp, Ap, Ep)
    hit = _DEVICE_CUBE_CACHE.get(key)
    if hit is not None:
        return hit
    padded = np.full((Tp, Ap, Ep), np.nan, np.float32)
    T, A, E = cube.shape
    padded[:T, :A, :E] = cube
    arr = jax.device_put(padded)
    return _DEVICE_CUBE_CACHE.insert(key, arr, (cube,))


def _stack_cache_key(unique_cubes: list[np.ndarray], Tp: int, Ap: int, Ep: int, mesh) -> tuple:
    """Cache key of one bucket's assembled device stack (single source of
    truth for :func:`_stack_cubes` and the upload estimators)."""
    return ("stack", tuple(id(c) for c in unique_cubes), Tp, Ap, Ep,
            tuple(d.id for d in mesh.devices.flat) if mesh is not None else None)


def _group_upload_bytes(unique_cubes: list[np.ndarray], Tp: int, Ap: int, Ep: int, mesh) -> int:
    """Bytes this bucket's dispatch would ship over the link right now.

    A resident assembled stack costs nothing; otherwise each un-resident
    cube pays its padded size.  (The packed lane rows are a few KB and
    ignored.)
    """
    if _DEVICE_CUBE_CACHE.get(_stack_cache_key(unique_cubes, Tp, Ap, Ep, mesh)) is not None:
        return 0
    total = 0
    for c in unique_cubes:
        if _DEVICE_CUBE_CACHE.get((id(c), Tp, Ap, Ep)) is None:
            total += Tp * Ap * Ep * 4
    return total


def _stack_cubes(unique_cubes: list[np.ndarray], Tp: int, Ap: int, Ep: int, mesh):
    """The (n_unique, Tp, Ap, Ep) dispatch input, preferring resident cubes.

    The assembled stack itself is cached keyed by the cube-id tuple (with
    every cube as an owner), so a repeat dispatch of the same group -- the
    raw/given figure pair, repeat batch passes -- reuses the finished
    on-device array outright.  Under a mesh that cached stack already
    carries the replicated sharding, so the per-dispatch cross-device
    broadcast disappears too (committed single-device inputs cannot
    silently reshard into a multi-device jit, hence the explicit put).
    Misses pay the same one-time pad + upload the uncached path would.
    """
    if os.environ.get("CST_DEVICE_CUBE_CACHE", "1") == "0":
        cubes = np.full((len(unique_cubes), Tp, Ap, Ep), np.nan, np.float32)
        for s, c in enumerate(unique_cubes):
            T, A, E = c.shape
            cubes[s, :T, :A, :E] = c
        return cubes
    import jax
    import jax.numpy as jnp

    stack_key = _stack_cache_key(unique_cubes, Tp, Ap, Ep, mesh)
    hit = _DEVICE_CUBE_CACHE.get(stack_key)
    if hit is not None:
        return hit
    stacked = jnp.stack([_padded_device_cube(c, Tp, Ap, Ep) for c in unique_cubes])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        stacked = jax.device_put(stacked, NamedSharding(mesh, PartitionSpec()))
    return _DEVICE_CUBE_CACHE.insert(stack_key, stacked, tuple(unique_cubes))


def _render_mesh():
    """The data-parallel device mesh panel batches shard over (or None)."""
    from configurable_spectrograms_tpu.parallel.mesh import data_parallel_mesh

    return data_parallel_mesh()


def _pack_lanes(u_idx, masks, t_valids, energies, e_valids, t_starts, t_counts,
                z_bounds, zb_e_valids, zb_full, t_maps) -> np.ndarray:
    """Pack every per-lane input into one (n_lanes, K) uint8 matrix.

    The relay-style host<->device links this runs over charge tens of ms
    of protocol overhead PER TRANSFER (measured: 11 small puts ~340 ms vs
    one packed put ~40 ms), so the dispatch ships a single H2D buffer and
    the device program unpacks it with static slices + bitcasts (free
    under XLA).  Row layout (per lane, all static sizes):

    ``[5 x int32: u_idx, t_valid, t_start, t_count, zb_full]``
    ``[(2+Ep) x float32: z_bounds, energies]``
    ``[W x int32: t_map]`` (W = max(gather_w, 1))
    ``[Ap + 2*Ep x uint8: pitch mask, e_valid, zb_e_valid]``

    Packing one lane dimension keeps the ``P("data")`` sharding exact.
    """
    n = u_idx.shape[0]
    i32 = np.stack(
        [u_idx, t_valids, t_starts, t_counts, zb_full.astype(np.int32)], axis=1
    ).astype(np.int32)
    f32 = np.concatenate([z_bounds, energies], axis=1).astype(np.float32)
    parts = [
        np.ascontiguousarray(i32).view(np.uint8),
        np.ascontiguousarray(f32).view(np.uint8),
        np.ascontiguousarray(t_maps.astype(np.int32)).view(np.uint8),
        masks.astype(np.uint8),
        e_valids.astype(np.uint8),
        zb_e_valids.astype(np.uint8),
    ]
    return np.concatenate([p.reshape(n, -1) for p in parts], axis=1)


def _render_kernel() -> str:
    """``CST_RENDER_KERNEL``: ``xla`` (default) or ``pallas``.

    ``pallas`` routes explicit-bounds log-z buckets through the fused
    one-HBM-pass collapse+quantize kernel
    (:func:`..ops.pallas_kernels.fused_quantize_pallas`, 1.24x the XLA
    chain on real v5e, 344 GB/s effective -- docs/budget.md).  Intended
    for direct-attached single-chip deployments where chip compute is on
    the critical path; on relay-style links the ~0.05 ms/figure gain is
    invisible (and the kernel's 128-lane padding costs upload bytes), so
    XLA stays the default.  Scope: explicit z bounds (the given-extrema
    production half; percentile bounds need the sort the kernel omits),
    log z (the linear path's degenerate-bounds fallback semantics live in
    the XLA program), unsharded dispatch (a manual kernel cannot be
    GSPMD-partitioned across a mesh).
    """
    return os.environ.get("CST_RENDER_KERNEL", "xla")


@functools.lru_cache(maxsize=None)
def _batched_quantize_fn(spec_key, mesh=None):
    """Build (and cache) the jitted collapse+quantize program for a scale combo.

    Cubes are passed once (deduplicated) and gathered per panel lane, so a
    pitch-angle grid's eight panels upload one cube, not eight.  Every
    other per-lane input arrives in ONE packed uint8 matrix (see
    :func:`_pack_lanes`) unpacked on device; output-pixel geometry is
    absent from the key: the device ships quantized (T, E) index matrices,
    and the host resamples to any pixel size.

    With ``sharded`` set the program is jitted over the data-parallel mesh:
    the packed lane matrix shards over the ``data`` axis (cubes replicate --
    panels outnumber cubes ~8:1 on the FAST grids and the panel->cube
    mapping is arbitrary, so a replicated gather beats a cross-device one),
    XLA partitions the whole collapse+quantize pipeline with zero
    collectives, and each chip rasterizes its shard of the lanes.  This is
    the production multi-chip fan-out replacing the reference's process
    pool (reference fast/batch_directory.py:337).
    """
    import jax

    from configurable_spectrograms_tpu.ops.spectrogram import (
        RenderSpec,
        _kept_energy_order,
        collapse_cube,
        quantize_matrix,
    )

    import jax.numpy as jnp

    y_scale, z_scale, lo_pct, hi_pct, explicit_bounds, gather_w, Ap, Ep, sharded, kernel = spec_key
    spec = RenderSpec(8, 8, y_scale, z_scale, lo_pct, hi_pct)
    W = max(gather_w, 1)
    off_f32 = 5 * 4
    off_tmap = off_f32 + (2 + Ep) * 4
    off_u8 = off_tmap + W * 4

    def one(row, cubes):
        i32v = jax.lax.bitcast_convert_type(row[:off_f32].reshape(5, 4), jnp.int32)
        u, tv, ts, tc = i32v[0], i32v[1], i32v[2], i32v[3]
        zbft = i32v[4].astype(bool)
        f32v = jax.lax.bitcast_convert_type(
            row[off_f32:off_tmap].reshape(2 + Ep, 4), jnp.float32
        )
        zb, en = f32v[:2], f32v[2:]
        t_map = jax.lax.bitcast_convert_type(
            row[off_tmap:off_u8].reshape(W, 4), jnp.int32
        )
        pm = row[off_u8 : off_u8 + Ap].astype(bool)
        ev = row[off_u8 + Ap : off_u8 + Ap + Ep].astype(bool)
        zbev = row[off_u8 + Ap + Ep : off_u8 + Ap + 2 * Ep].astype(bool)

        if kernel == "pallas":
            # One-HBM-pass fused collapse+quantize (see _render_kernel);
            # the remaining metadata (kept-column order, empty flag) is
            # cheap XLA from the kernel's col_all_nan output, matching
            # _analyze_matrix's rules exactly.
            from configurable_spectrograms_tpu.ops.pallas_kernels import (
                fused_quantize_pallas,
            )

            out = fused_quantize_pallas(
                cubes[u], pm, ev, tv, ts, tc, zb, z_scale=z_scale, t_tile=64
            )
            kept_pos, n_kept, flip, y0, y1 = _kept_energy_order(out["col_all_nan"], ev, en)
            q = {
                "idx": out["idx"],
                "kept_pos": kept_pos.astype(jnp.int32),
                "n_kept": n_kept,
                "flip": flip,
                "y0": y0,
                "y1": y1,
                "vmin": out["vmin"],
                "vmax": zb[1],
                "empty": (n_kept == 0) | (tc <= 0),
            }
        else:
            m = collapse_cube(cubes[u], pm, tv)
            q = quantize_matrix(
                m, en, ev, tv, ts, tc, zb, spec,
                zb_e_valid=zbev, zb_full_time=zbft, skip_percentile=explicit_bounds,
            )
        idx = q["idx"]
        if gather_w:
            # When the time axis is longer than the pixel width, only <= W
            # distinct rows are ever sampled -- gather them on device so
            # the readback scales with pixels, not samples.
            idx = idx[t_map]
        # Pack the metadata (scalars + kept_pos) behind the index matrix in
        # ONE uint8 buffer: this host<->device link charges latency per
        # buffer, so a single readback wins.  Floats travel as bitcast
        # bytes; the host unpacks with a matching frombuffer view.
        meta = jnp.concatenate(
            [
                jnp.stack(
                    [
                        q["n_kept"].astype(jnp.float32),
                        q["flip"].astype(jnp.float32),
                        q["y0"],
                        q["y1"],
                        q["vmin"],
                        q["vmax"],
                        q["empty"].astype(jnp.float32),
                    ]
                ),
                q["kept_pos"].astype(jnp.float32),
            ]
        )
        meta_bytes = jax.lax.bitcast_convert_type(meta, jnp.uint8).reshape(-1)
        return jnp.concatenate([idx.reshape(-1), meta_bytes])

    if kernel == "pallas":
        # pallas_call's phase/grid logic must not be rewritten by vmap's
        # batching rule: map lanes sequentially instead (chip compute is
        # ~1 ms/cube; a bucket's lanes cost single-digit ms).
        def batched(rows, cubes):
            return jax.lax.map(lambda r: one(r, cubes), rows)
    else:
        batched = jax.vmap(one, in_axes=(0, None))
    if not sharded:
        return jax.jit(batched)
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        # Test/direct callers; production passes the mesh it already
        # captured -- _render_mesh() is backend-state-dependent (None once
        # the host backend is forced) and re-resolving it here could
        # disagree with the caller's lane padding mid-flip and raise.
        mesh = _render_mesh()
    lane = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    return jax.jit(batched, in_shardings=(lane, replicated), out_shardings=lane)


def _readback(out_dev) -> np.ndarray:
    """D2H transfer of the packed result buffer (timed; test seam)."""
    return np.asarray(out_dev)


@dataclass
class _GroupDispatch:
    """One in-flight device bucket: its lane layout plus the enqueued output.

    Built during the enqueue phase of :class:`PendingRender`; the drain
    phase reads ``out_dev`` back and unpacks it into per-panel results.
    """

    idxs: list[int]
    n_lanes: int
    Tp: int
    Ap: int
    Ep: int
    y_scale: str
    z_scale: str
    lo_pct: float
    hi_pct: float
    t_starts: np.ndarray
    t_counts: np.ndarray
    gather_w: int
    #: All panels in the bucket carry explicit z bounds (part of the bucket
    #: key), selecting the sort-free compiled program.
    explicit: bool = False
    #: Route this bucket through the fused Pallas kernel (see
    #: :func:`_render_kernel`; requires explicit log-z and Ep%128==0).
    use_pallas: bool = False
    #: Fresh H2D bytes this bucket's dispatch shipped (0 on cache hits);
    #: sizes the drain soft cap's upload allowance.
    upload_bytes: int = 0
    out_dev: object = None
    # drain-side state (filled by the readback thread)
    done: object = None  # threading.Event
    packed: np.ndarray | None = None
    error: BaseException | None = None
    xfer: float = 0.0
    #: perf_counter stamp when the readback landed; the soft-cap baseline
    #: charges each bucket only the wall time past its predecessor's
    #: completion (``xfer`` alone is cumulative under concurrent drains
    #: and would inflate the baseline by the batch's bucket count).
    done_ts: float = 0.0


def _prepare_group(panels: list[PanelData], idxs: list[int], Tp: int, Ap: int, Ep: int,
                   y_scale: str, z_scale: str, lo_pct: float, hi_pct: float,
                   explicit: bool, tile_w: int, mesh, use_pallas: bool = False) -> tuple[_GroupDispatch, tuple]:
    """Build the padded host-side lane arrays for one bucket (no device work)."""
    n = len(idxs)
    n_lanes = n
    if mesh is not None:
        d = int(mesh.devices.size)
        n_lanes = ((n + d - 1) // d) * d
    # Deduplicate cube uploads within the bucket.
    cube_slot: dict[int, int] = {}
    unique_cubes: list[np.ndarray] = []
    u_idx = np.zeros((n_lanes,), np.int32)
    for j, i in enumerate(idxs):
        c = panels[i].cube
        slot = cube_slot.get(id(c))
        if slot is None:
            slot = len(unique_cubes)
            cube_slot[id(c)] = slot
            unique_cubes.append(c)
        u_idx[j] = slot

    masks = np.zeros((n_lanes, Ap), bool)
    energies = np.zeros((n_lanes, Ep), np.float32)
    e_valids = np.zeros((n_lanes, Ep), bool)
    t_valids = np.zeros((n_lanes,), np.int32)
    t_starts = np.zeros((n_lanes,), np.int32)
    t_counts = np.zeros((n_lanes,), np.int32)
    z_bounds = np.full((n_lanes, 2), np.nan, np.float32)
    zb_e_valids = np.zeros((n_lanes, Ep), bool)
    zb_full = np.zeros((n_lanes,), bool)
    for j, i in enumerate(idxs):
        p = panels[i]
        T, A, E = p.cube.shape
        masks[j, :A] = p.pitch_mask
        energies[j, :E] = p.energy
        e_valids[j, :E] = (p.energy >= p.y_min) & (p.energy <= p.y_max)
        t_valids[j] = T
        t_starts[j] = p.window.t_start
        t_counts[j] = p.window.t_count
        z_bounds[j] = (
            np.nan if p.z_min is None else p.z_min,
            np.nan if p.z_max is None else p.z_max,
        )
        if p.bounds_energy_range is not None:
            b_lo, b_hi = p.bounds_energy_range
            zb_e_valids[j, :E] = (p.energy >= b_lo) & (p.energy <= b_hi)
            zb_full[j] = True
        else:
            zb_e_valids[j, :E] = e_valids[j, :E]
            zb_full[j] = False

    # When the padded time axis exceeds the pixel width, gather one
    # matrix row per pixel column on device: readback then scales with
    # pixels, not samples (~4x smaller at real FAST record lengths).
    gather_w = _bucket(tile_w, 256, 256) if Tp > _bucket(tile_w, 256, 256) else 0
    t_maps = np.zeros((n_lanes, max(gather_w, 1)), np.int32)
    if gather_w:
        for j, i in enumerate(idxs):
            cols, _ = pixel_columns(
                make_x_map(panels[i].window, tile_w), int(t_starts[j]), int(t_counts[j]), Tp, tile_w
            )
            t_maps[j, :tile_w] = cols

    g = _GroupDispatch(idxs, n_lanes, Tp, Ap, Ep, y_scale, z_scale, lo_pct, hi_pct,
                       t_starts, t_counts, gather_w, explicit, use_pallas)
    inputs = (u_idx, masks, t_valids, energies, e_valids, t_starts, t_counts, z_bounds,
              zb_e_valids, zb_full, t_maps, unique_cubes)
    return g, inputs


def _enqueue_group(g: _GroupDispatch, inputs: tuple, mesh) -> object:
    """Upload the bucket's cubes and enqueue the jitted program (no readback).

    JAX dispatch is asynchronous: this returns as soon as the transfers and
    the program are queued, so bucket N+1's H2D overlaps bucket N's execute
    and readback -- the pipelining the synchronous per-bucket path lacked.
    The first call per program shape additionally pays the (blocking)
    compile here.
    """
    (u_idx, masks, t_valids, energies, e_valids, t_starts, t_counts, z_bounds,
     zb_e_valids, zb_full, t_maps, unique_cubes) = inputs
    g.upload_bytes = _group_upload_bytes(unique_cubes, g.Tp, g.Ap, g.Ep, mesh)
    cubes = _stack_cubes(unique_cubes, g.Tp, g.Ap, g.Ep, mesh)
    fn = _batched_quantize_fn(
        (g.y_scale, g.z_scale, g.lo_pct, g.hi_pct, g.explicit, g.gather_w,
         g.Ap, g.Ep, mesh is not None, "pallas" if g.use_pallas else "xla"),
        mesh,
    )
    rows = _pack_lanes(u_idx, masks, t_valids, energies, e_valids, t_starts,
                       t_counts, z_bounds, zb_e_valids, zb_full, t_maps)
    # The row layout contract lives in two places (pack builds from the
    # arrays; unpack derives offsets from the spec key) -- a width mismatch
    # would silently shift every byte slice and render from garbage masks.
    expected_k = 5 * 4 + (2 + g.Ep) * 4 + max(g.gather_w, 1) * 4 + g.Ap + 2 * g.Ep
    if rows.shape[1] != expected_k:
        raise AssertionError(
            f"packed lane width {rows.shape[1]} != expected {expected_k} "
            f"(Ap={g.Ap}, Ep={g.Ep}, gather_w={g.gather_w})"
        )
    if mesh is not None:
        # Explicit placement: under jax.distributed, jit refuses numpy
        # inputs with non-trivial shardings (multi-process arrays must be
        # constructed, not inferred); on a single process this is what the
        # jit would have done anyway.
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        rows = jax.device_put(rows, NamedSharding(mesh, PartitionSpec("data")))
    return fn(rows, cubes)


def _finish_group(panels: list[PanelData], g: _GroupDispatch, packed: np.ndarray,
                  tile_h: int, tile_w: int, results: list) -> None:
    """Unpack one bucket's readback buffer into per-panel result dicts."""
    import time as _time

    from configurable_spectrograms_tpu.ops._colormap_data import colormap_lut

    n = len(g.idxs)
    rows_out = g.gather_w if g.gather_w else g.Tp
    idx_host = packed[:n, : rows_out * g.Ep].reshape(n, rows_out, g.Ep)
    meta_host = packed[:n, rows_out * g.Ep :].copy().view(np.float32).reshape(n, 7 + g.Ep)

    _resample_t0 = _time.perf_counter()
    for j, i in enumerate(g.idxs):
        p = panels[i]
        n_kept_j, flip_j, y0_j, y1_j, vmin_j, vmax_j, empty_j = meta_host[j, :7]
        if g.z_scale == "log" and not bool(empty_j) and vmin_j > vmax_j:
            # Explicit log bounds whose safe-positive floor exceeds vmax:
            # matplotlib's LogNorm raises at draw time in the reference
            # (batch drivers record the orbit as a plotting error);
            # rendering on would silently invert the color ramp.  The
            # error is recorded per panel and raised when the OWNING
            # figure composites, so pooled dispatches keep serving the
            # other figures.
            results[i] = {"error": "minvalue must be less than or equal to maxvalue"}
            continue
        kept_pos_j = meta_host[j, 7:].astype(np.int32)
        rgba = resample_indices(
            idx_host[j],
            kept_pos_j,
            int(n_kept_j),
            bool(flip_j),
            float(y0_j),
            float(y1_j),
            int(g.t_starts[j]),
            int(g.t_counts[j]),
            make_x_map(p.window, tile_w),
            tile_h,
            tile_w,
            g.y_scale,
            colormap_lut(p.colormap),
            empty=bool(empty_j),
            pre_gathered=bool(g.gather_w),
        )
        results[i] = {
            "rgba": rgba,
            "vmin": float(vmin_j),
            "vmax": float(vmax_j),
            "y0": float(y0_j),
            "y1": float(y1_j),
            "n_kept": int(n_kept_j),
            "empty": bool(empty_j),
        }
    from configurable_spectrograms_tpu.utils import timing as _timing

    if _timing.ACTIVE is not None:
        _timing.ACTIVE.add("host_resample", _time.perf_counter() - _resample_t0)


class PendingRender:
    """A render whose device buckets are enqueued but not yet read back.

    Created by :func:`enqueue_render_panels`.  Host-backend buckets are
    already complete; :meth:`wait` drains the device buckets (concurrent,
    watchdog-bounded readbacks) and returns results in input order.
    Splitting enqueue from drain lets the render coalescer start the next
    batch's uploads while this one's readbacks are still on the wire.
    """

    def __init__(self, panels: list[PanelData], tile_h: int, tile_w: int,
                 results: list, dispatches: list[_GroupDispatch]):
        import time as _time

        self.panels = panels
        self.tile_h = tile_h
        self.tile_w = tile_w
        self.results = results
        self.dispatches = dispatches
        #: When these dispatches were enqueued: a sibling batch's watchdog
        #: trip AFTER this moment means our transfers share the same dead
        #: link, so wait() skips straight to the short-wait/host path
        #: instead of sitting out its own full timeout.
        self.enqueued_ts = _time.monotonic()
        if dispatches:
            with _ACTIVE_DRAINS_LOCK:
                _ACTIVE_DRAINS["n"] += 1

    def has_device_work(self) -> bool:
        return bool(self.dispatches)

    def _start_readbacks(self, timeout: float) -> None:
        """Kick off one bounded readback thread per in-flight bucket.

        All transfers run concurrently: on a latency-bound link the round
        trips overlap instead of stacking, and the host unpacks buckets in
        order as they land.  Threads are daemons; a hung transfer is
        abandoned by :meth:`wait` after *timeout* (the same containment as
        the probe machinery -- a stuck ``jax`` transfer cannot be
        cancelled, only orphaned).
        """
        import threading
        import time as _time

        self._drain_t0 = _time.perf_counter()
        for g in self.dispatches:
            g.done = threading.Event()

            def _read(g=g):
                t0 = _time.perf_counter()
                try:
                    g.packed = _readback(g.out_dev)
                except BaseException as exc:
                    g.error = exc
                finally:
                    g.done_ts = _time.perf_counter()
                    g.xfer = g.done_ts - t0
                    g.done.set()

            threading.Thread(target=_read, daemon=True, name="device-readback").start()

    def wait(self) -> list[dict]:
        """Drain every in-flight bucket; returns per-panel results in order."""
        if not self.dispatches:
            return self.results
        timeout = _dispatch_timeout()
        try:
            return self._wait_inner(timeout)
        finally:
            with _ACTIVE_DRAINS_LOCK:
                _ACTIVE_DRAINS["n"] -= 1

    def _wait_inner(self, timeout: float) -> list[dict]:
        import time as _time

        from configurable_spectrograms_tpu.utils.timing import active_stage

        self._start_readbacks(timeout)
        # Per-bucket budget, like the pre-pipelining sequential path: the
        # deadline RESETS after every bucket that lands, so N serialized
        # transfers that are each within budget never trip the watchdog
        # (a single shared deadline would mark a slow-but-alive link dead).
        # In auto mode each bucket additionally carries the ADAPTIVE soft
        # cap (link.bucket_soft_timeout): a batch-level detector cannot see
        # inside one giant stalled drain, so exceeding ~6x the healthy
        # median drain trips the slow fallback long before the hard
        # watchdog would.
        deadline = _time.monotonic() + timeout
        watchdog_tripped = False
        probation_used = False
        # Incremental drain accounting: all readback threads start together
        # and the device serializes buckets, so a bucket's ``xfer`` (thread
        # start -> landed) includes every predecessor's compute+transfer.
        # The soft-cap baseline must see per-bucket cost, not cumulative
        # wall clock -- charge each bucket only the time past the previous
        # completion.
        prev_done = self._drain_t0
        for i, g in enumerate(self.dispatches):
            if (
                not watchdog_tripped
                and _BACKEND["mode"] == "auto"
                and _BACKEND["forced_host"]
                and _BACKEND["last_dispatch_failure_ts"] >= self.enqueued_ts
            ):
                # A sibling batch's transfer already hung (or slow-tripped)
                # on this link after ours were enqueued: don't sit out our
                # own full budget per bucket -- use whatever already
                # landed, host-render the rest immediately.
                watchdog_tripped = True
            soft_expired = False
            stall_waited = False
            with active_stage("device_readback"):
                if watchdog_tripped:
                    # A transfer already hung on this link; don't wait the
                    # full budget again for its siblings -- use any readback
                    # that already landed, host-render the rest.
                    ok = g.done.wait(timeout=0.05) and g.error is None
                else:
                    hard_left = max(0.0, deadline - _time.monotonic())
                    budget = hard_left
                    if _BACKEND["mode"] == "auto":
                        budget = min(
                            hard_left,
                            bucket_soft_timeout(len(g.idxs), g.upload_bytes),
                        )
                    ok = g.done.wait(timeout=budget) and g.error is None
                    if not ok and g.error is None and budget < hard_left:
                        # Soft cap expired.  The same two-gate rule as
                        # note_device_batch applies before abandoning the
                        # device: the cap spent so far is only a LOWER
                        # bound on this bucket's cost, so the host
                        # replacement must beat that bound to justify a
                        # switch.  When it cannot (or there is no host
                        # measurement to compare against on this bucket's
                        # own evidence -- see below), a slow device is
                        # still the fastest backend available: wait out
                        # the hard budget instead of crawling on the host.
                        host_spp = _host_sec_per_panel()
                        implied_spp = budget / max(len(g.idxs), 1)
                        if host_spp is not None and implied_spp <= host_spp / _SLOW_FACTOR:
                            stall_waited = True
                            ok = (
                                g.done.wait(timeout=max(0.0, deadline - _time.monotonic()))
                                and g.error is None
                            )
                        else:
                            soft_expired = True
            if ok:
                deadline = _time.monotonic() + timeout
                if not watchdog_tripped and not stall_waited:
                    # Skip recording after a trip or a waited-out stall:
                    # those buckets' timings are stall-inflated, not
                    # healthy baselines (recording them would balloon the
                    # adaptive cap and hide the next genuine stall).
                    note_bucket_drain(g.done_ts - prev_done, len(g.idxs))
                prev_done = max(prev_done, g.done_ts)
                self._handle_completed(g, first=(i == 0))
                continue
            if g.error is not None:
                raise g.error
            if soft_expired and not watchdog_tripped:
                host_spp = _host_sec_per_panel()
                if host_spp is None:
                    # Degraded beyond the soft cap but no host measurement
                    # yet: render THIS bucket host-side (which times the
                    # host, arming the comparison for the next bucket)
                    # without flipping the whole process on no evidence --
                    # the probation analog of note_device_batch's gate 2.
                    with active_stage("host_quantize"):
                        _render_group_host(self.panels, g.idxs, self.tile_h, self.tile_w,
                                           g.y_scale, g.z_scale, g.lo_pct, g.hi_pct,
                                           self.results)
                    # The stall + host render consumed shared budget/clock:
                    # give the next bucket a fresh hard deadline (every
                    # completion path does) and advance the incremental
                    # drain origin so the stalled window is never recorded
                    # as a later bucket's "healthy" drain time; flag the
                    # batch so its wall clock (inflated by the stall and
                    # the host render) stays out of the device meter.
                    deadline = _time.monotonic() + timeout
                    prev_done = _time.perf_counter()
                    probation_used = True
                    continue
                watchdog_tripped = True
                force_host_slow(
                    "[BACKEND] device bucket drain exceeded the adaptive soft cap "
                    f"({bucket_soft_timeout(len(g.idxs), g.upload_bytes):.1f}s) "
                    "with the host replacement "
                    "measurably faster; finishing on the host backend "
                    "(reprobe may restore the device)"
                )
                with active_stage("host_quantize"):
                    _render_group_host(self.panels, g.idxs, self.tile_h, self.tile_w,
                                       g.y_scale, g.z_scale, g.lo_pct, g.hi_pct, self.results)
                continue
            # The link died between the bounded preflight and this
            # transfer.  A hung jax transfer never returns, so without
            # this bound the coalescer thread -- and every worker
            # waiting on it -- would deadlock for the rest of the batch.
            from configurable_spectrograms_tpu.utils.logging import log_error

            if _BACKEND["mode"] == "device":  # explicit override: fail loudly
                raise RuntimeError(
                    f"device dispatch/readback exceeded {timeout:.0f}s "
                    "(CST_DEVICE_DISPATCH_TIMEOUT) with CST_RENDER_BACKEND=device"
                )
            if not watchdog_tripped:
                watchdog_tripped = True
                force_host_after_dispatch_failure()
                log_error(
                    f"[BACKEND] device dispatch/readback exceeded {timeout:.0f}s; "
                    "abandoning the transfer and finishing on the host backend"
                )
            with active_stage("host_quantize"):
                _render_group_host(self.panels, g.idxs, self.tile_h, self.tile_w,
                                   g.y_scale, g.z_scale, g.lo_pct, g.hi_pct, self.results)
        if not watchdog_tripped and not probation_used:
            # Every bucket landed on the device: feed the slow-dispatch
            # detector (link.note_device_batch) with this batch's panel
            # count and completion time.  Watchdog trips already forced
            # the host backend (no extra signal), and a probation batch's
            # wall clock is inflated by the stall wait + the host render
            # of host-rendered panels -- billing it to the device meter
            # would let one transient stall trip the run on bad data.
            note_device_batch(
                sum(len(g.idxs) for g in self.dispatches),
                self.enqueued_ts,
                _time.monotonic(),
            )
        return self.results

    def _handle_completed(self, g: _GroupDispatch, first: bool = True) -> None:
        """Bandwidth/calibration bookkeeping + unpack for one landed bucket.

        The link-health heuristics only run when the bucket's transfer had
        the link to itself -- a SINGLE-bucket drain: with sibling
        transfers in flight (or later buckets queued behind predecessors'
        compute), wall-clock ``xfer`` divides the link's bandwidth among
        them and would misattribute sharing/queueing to a slow link,
        forcing the host backend on a healthy device.  Degraded links are
        still caught promptly in practice: the first renders of a run are
        single-bucket drains (calibration is one-shot and early), and a
        truly dead link trips the watchdog regardless.
        """
        import time as _time

        n = len(g.idxs)
        packed = g.packed
        xfer = g.xfer
        with _ACTIVE_DRAINS_LOCK:
            solo_drain = _ACTIVE_DRAINS["n"] == 1
        # "alone" = this bucket's transfer had the link to itself: the only
        # bucket of the only in-flight batch.  Cross-batch pipelining
        # (service.py) deliberately overlaps the next batch's uploads with
        # this readback, so a shared-window measurement says nothing about
        # the link itself.
        alone = first and len(self.dispatches) == 1 and solo_drain
        if (
            alone
            and _BACKEND["mode"] == "auto"
            and not _BACKEND["forced_host"]
            and xfer > 1.0
            and packed.nbytes / max(xfer, 1e-9) < _MIN_LINK_MBPS * 1e6
        ):
            # The device link has degraded below usability (observed on this
            # environment's relay); finish everything on the host from now on.
            from configurable_spectrograms_tpu.utils.logging import log_error

            with _BACKEND_LOCK:
                _BACKEND["forced_host"] = True
                _BACKEND["why_host"] = "bandwidth"
            log_error(
                f"[BACKEND] device->host readback measured at "
                f"{packed.nbytes / max(xfer, 1e-9) / 1e6:.2f} MB/s; switching panel "
                f"rasterization to the host backend for this process"
            )
        elif (
            alone
            and _BACKEND["mode"] == "auto"
            and not _BACKEND["forced_host"]
            and not _BACKEND["calibrated"]
            and xfer / n > _CALIBRATE_XFER_SEC_PER_PANEL
        ):
            # The link is slow enough that readback alone may cost more than
            # redoing the whole panel on the host.  Measure once: render this
            # same group on the host (parity-tested identical output) and
            # compare its TOTAL time against the readback time alone -- a
            # comparison conservative toward the device, since the device
            # path's compute is treated as free.  (Concurrent sibling
            # readbacks share the link, so ``xfer`` can only overestimate
            # the device's cost -- still conservative toward the device
            # being slower, never toward it being faster.)
            with _BACKEND_LOCK:
                _BACKEND["calibrated"] = True
            t0 = _time.perf_counter()
            _render_group_host(self.panels, g.idxs, self.tile_h, self.tile_w,
                               g.y_scale, g.z_scale, g.lo_pct, g.hi_pct, self.results)
            host_t = _time.perf_counter() - t0
            if xfer > host_t:
                from configurable_spectrograms_tpu.utils.logging import log_error

                with _BACKEND_LOCK:
                    _BACKEND["forced_host"] = True
                    _BACKEND["why_host"] = "bandwidth"
                log_error(
                    f"[BACKEND] calibration: device readback {xfer * 1e3:.0f} ms vs "
                    f"host render {host_t * 1e3:.0f} ms for {n} panel(s); switching "
                    f"panel rasterization to the host backend for this process"
                )
                return  # the host results for this group are already in place
        _finish_group(self.panels, g, packed, self.tile_h, self.tile_w, self.results)


def _latency_upload_bytes(groups: dict[tuple, list[int]], panels: list[PanelData]) -> int:
    """Bytes of padded cube that a device render would have to upload.

    Cubes already resident on device (the cube cache) cost nothing; only
    un-resident cubes ride the link, so the latency estimate charges
    exactly those.
    """
    mesh = _render_mesh() if not _host_backend_active() else None
    total = 0
    for (Tp, Ap, Ep, *_rest), idxs in groups.items():
        # First-appearance order matches _prepare_group's unique_cubes, so
        # the assembled-stack key here is the one _stack_cubes would hit.
        # Checking only per-cube keys under-credits repeat renders: FIFO
        # eviction drops the older cube entries before their newer stack
        # entry, which alone still makes the dispatch zero-upload.
        unique: list[np.ndarray] = []
        seen: set[int] = set()
        for i in idxs:
            c = panels[i].cube
            if id(c) not in seen:
                seen.add(id(c))
                unique.append(c)
        total += _group_upload_bytes(unique, Tp, Ap, Ep, mesh)
    return total


def enqueue_render_panels(panels: list[PanelData], tile_h: int, tile_w: int,
                          prefer_latency: bool = False) -> PendingRender:
    """Group, upload, and enqueue panel rasterization; readback is deferred.

    Panels group into (T, A, E, scale-combo) padding buckets; each bucket
    is one vmapped TPU call that collapses + quantizes every panel's
    matrix.  Only the small uint8 index matrices and scalar metadata come
    back over the wire (in :meth:`PendingRender.wait`); the host
    pixel-replicates and LUT-colors them
    (:func:`..render.tile.resample_indices`), which profiling showed beats
    shipping RGBA tiles by ~300x in device->host bytes.  Duplicate cubes
    (the pitch grid's full/zoom pairs and four categories share one file)
    upload once per bucket.

    Every bucket is DISPATCHED before any is read back, and host-backend
    buckets complete immediately -- so on a latency-bound link the
    per-bucket round trips overlap instead of stacking (VERDICT round-2
    item 1), and the render coalescer can enqueue the next batch while
    this one drains.
    """
    if not panels:
        return PendingRender(panels, tile_h, tile_w, [], [])
    groups: dict[tuple, list[int]] = {}
    want_pallas = _render_kernel() == "pallas"
    if want_pallas and _render_mesh() is not None:
        # A manual kernel cannot be GSPMD-partitioned over the mesh, and
        # deciding here (before bucketing) keeps sharded deployments on
        # the narrow Ep=_bucket(E,8,8) buckets -- the 128-lane pad would
        # otherwise inflate every cube upload ~2.7x for a kernel that
        # never runs.
        want_pallas = False
    for i, p in enumerate(panels):
        T, A, E = p.cube.shape
        explicit = p.z_min is not None and p.z_max is not None
        # The fused Pallas route (see _render_kernel) needs Ep%128==0; the
        # extra NaN padding is free on a direct-attached chip and the
        # bucket key keeps the routed and unrouted programs distinct.
        # The kernel's contract also needs finite bounds with
        # vmax > vmin (ops/pallas_kernels.fused_quantize_pallas); the XLA
        # program keeps handling degenerate/inverted explicit bounds.
        use_pallas = (
            want_pallas and explicit and p.z_scale == "log"
            and np.isfinite(p.z_min) and np.isfinite(p.z_max) and p.z_max > p.z_min
        )
        key = (
            _bucket(T, 256, 64),
            _bucket(A, 8, 8),
            _bucket(E, 128, 128) if use_pallas else _bucket(E, 8, 8),
            p.y_scale,
            p.z_scale,
            float(p.low_percentile),
            float(p.high_percentile),
            # Explicit-bounds panels compile a sort-free program.
            explicit,
            use_pallas,
        )
        groups.setdefault(key, []).append(i)

    probe_device_link()
    maybe_reprobe_device_link()
    # Latency-aware routing: a lone small render (single-plot CLIs, the GUI
    # single-day page) optimizes time-to-PNG, not throughput -- when the
    # measured link round trips would cost more than redoing the panels on
    # the host, the whole call renders host-side (VERDICT round-3 item 1b).
    latency_host = prefer_latency and not _host_backend_active() and prefer_host_for_latency(
        len(panels), _latency_upload_bytes(groups, panels)
    )
    results: list[dict | None] = [None] * len(panels)
    dispatches: list[_GroupDispatch] = []
    from configurable_spectrograms_tpu.utils.timing import active_stage

    for (Tp, Ap, Ep, y_scale, z_scale, lo_pct, hi_pct, explicit, use_pallas), idxs in groups.items():
        if _host_backend_active() or latency_host or take_probation():
            with active_stage("host_quantize"):
                _render_group_host(panels, idxs, tile_h, tile_w, y_scale, z_scale, lo_pct, hi_pct, results)
            continue
        mesh = _render_mesh()
        if use_pallas and mesh is not None:  # pragma: no cover - defensive
            # Bucketing already demoted pallas under a mesh (above); this
            # guard only matters if the mesh appeared between the two
            # _render_mesh() calls.
            use_pallas = False
        g, inputs = _prepare_group(panels, idxs, Tp, Ap, Ep, y_scale, z_scale,
                                   lo_pct, hi_pct, explicit, tile_w, mesh, use_pallas)
        timeout = _dispatch_timeout()
        with active_stage("device_dispatch"):
            ok, out_dev = _bounded_call(lambda g=g, inputs=inputs: _enqueue_group(g, inputs, mesh), timeout)
        if not ok:
            # The enqueue itself hung (H2D upload or compile on a dead
            # link).  Same containment as a hung readback: force host and
            # finish this bucket (and, via _host_backend_active, any
            # remaining buckets) on the host backend.
            from configurable_spectrograms_tpu.utils.logging import log_error

            if _BACKEND["mode"] == "device":  # explicit override: fail loudly
                raise RuntimeError(
                    f"device dispatch/readback exceeded {timeout:.0f}s "
                    "(CST_DEVICE_DISPATCH_TIMEOUT) with CST_RENDER_BACKEND=device"
                )
            force_host_after_dispatch_failure()
            log_error(
                f"[BACKEND] device dispatch enqueue exceeded {timeout:.0f}s; "
                "abandoning the transfer and finishing on the host backend"
            )
            with active_stage("host_quantize"):
                _render_group_host(panels, idxs, tile_h, tile_w, y_scale, z_scale, lo_pct, hi_pct, results)
            continue
        g.out_dev = out_dev
        LAST_DISPATCH["lanes"] = g.n_lanes
        LAST_DISPATCH["devices"] = len(getattr(out_dev.sharding, "device_set", ())) or 1
        DISPATCH_HISTORY.append(dict(LAST_DISPATCH))
        dispatches.append(g)
    return PendingRender(panels, tile_h, tile_w, results, dispatches)


def device_render_panels(panels: list[PanelData], tile_h: int, tile_w: int) -> list[dict]:
    """Rasterize many panels with minimal device dispatches and readback.

    Synchronous wrapper over :func:`enqueue_render_panels` +
    :meth:`PendingRender.wait`; see those for the bucket/pipelining model.
    Returns dicts in input order with keys ``rgba``, ``vmin``, ``vmax``,
    ``y0``, ``y1``, ``n_kept``, ``empty``.
    """
    return enqueue_render_panels(panels, tile_h, tile_w).wait()
