"""Multi-device scaling: mesh construction, sharded render, collective extrema.

The reference scales with a single-host ``ProcessPoolExecutor``
(reference batch_runner.py:33-58, fast/batch_directory.py:337); here the
scaling dimension is the *device mesh*: orbit batches shard over a
``data`` axis (each chip rasterizes its shard independently -- no
collectives on the render path), and the folder-wide extrema pass becomes
a ``psum`` of per-shard histograms/counters over the mesh (optionally also
sharding the time axis, the sequence-parallel analog).  Progress/resume
state stays host-side JSON exactly as in the reference.
"""

from configurable_spectrograms_tpu.parallel.mesh import make_mesh
from configurable_spectrograms_tpu.parallel.extrema import sharded_extrema_stats
from configurable_spectrograms_tpu.parallel.sharding import sharded_batch_render

__all__ = ["make_mesh", "sharded_extrema_stats", "sharded_batch_render"]
