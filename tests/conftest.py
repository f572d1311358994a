"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``), the strategy the reference's
SURVEY.md section 4 prescribes for this rebuild; benchmarks run on real TPU
hardware separately via ``bench.py``.
"""

import os

# Force-override: this environment's sitecustomize imports jax at
# interpreter startup with JAX_PLATFORMS pointing at the real TPU plugin,
# so plain env-var edits here are too late -- update jax config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _reset_link_rate_meter():
    """The slow-dispatch detector, host-rate meter, and backend-selection
    state are process-global (render/link.py); leaked probation/streak or
    forced-host state from one test must not route another test's renders
    (a leaked ``forced_host=True`` makes ``data_parallel_mesh()`` return
    None and the sharding tests crash building a NamedSharding)."""
    from configurable_spectrograms_tpu.render import link

    with link._BACKEND_LOCK:
        backend_before = dict(link._BACKEND)
    yield
    with link._BACKEND_LOCK:
        link._BACKEND.clear()
        link._BACKEND.update(backend_before)
    link.reset_rate_state()
    with link._RATE_LOCK:
        link._RATE["host_panels"] = 0.0
        link._RATE["host_sec"] = 0.0


@pytest.fixture
def rng():
    """Function-scoped so every test draws the SAME deterministic stream
    regardless of which other tests ran first -- a session-scoped
    generator made test inputs depend on selection/ordering, so failures
    could vanish when a test was run in isolation."""
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def synth_archive(tmp_path_factory):
    """A small synthetic FAST archive shared across tests (3 orbits x 4 inst)."""
    from configurable_spectrograms_tpu.data.synthetic import synth_fast_archive

    root = tmp_path_factory.mktemp("fast_data")
    csv = root / "cusp.tsv"
    orbits = [100, 101, 102]
    mapping = synth_fast_archive(str(root), orbits, n_time=96, n_angle=16, n_energy=24, cusp_csv_path=str(csv))
    return {"root": str(root), "orbits": orbits, "mapping": mapping, "cusp_csv": str(csv)}
