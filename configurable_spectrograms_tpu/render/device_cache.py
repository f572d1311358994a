"""Device-resident padded-cube cache and the render mesh selector.

Split out of :mod:`configurable_spectrograms_tpu.render.dispatch`.  Tests
that monkeypatch ``_padded_device_cube`` patch it HERE (``_stack_cubes``
resolves it module-locally).
"""

from __future__ import annotations

import os

import numpy as np

from configurable_spectrograms_tpu.utils.resident_cache import ResidentCache

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
