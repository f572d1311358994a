"""Subprocess worker: the FLAGSHIP batch driver under ``jax.distributed``.

Each of two processes owns 4 virtual CPU devices and runs the REAL
``FAST_plot_spectrograms_directory`` over the same shared synthetic
archive; the driver's orbit-level process sharding
(fast/batch_directory.py ``_shard_orbits_across_processes``) gives each
host a disjoint orbit slice writing into ONE shared output tree.  Run by
tests/test_multihost.py as::

    python multihost_flagship_worker.py <pid> <nprocs> <port> <archive> <csv> <out> <progress>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    archive, csv, out_base, progress = sys.argv[4], sys.argv[5], sys.argv[6], sys.argv[7]

    from configurable_spectrograms_tpu.parallel.mesh import init_distributed, process_shard_info

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
    assert process_shard_info() == (pid, nprocs)
    assert len(jax.local_devices()) == 4

    import configurable_spectrograms_tpu.data.cdf_utils as cdf_utils
    from configurable_spectrograms_tpu.fast.batch_directory import (
        FAST_plot_spectrograms_directory,
    )

    cdf_utils.filtered_orbits_cache.clear()
    os.environ["CST_CUSP_CSV"] = csv

    results = FAST_plot_spectrograms_directory(
        directory_path=archive,
        y_scale="log",
        z_scale="log",
        colormap="inferno",
        output_base=out_base,
        progress_json_path=progress,
        max_processing_percentile=99.0,
        extrema_json_path=os.path.join(os.path.dirname(progress), "extrema.json"),
        # ONE worker: the raw and given jobs of an orbit both write the
        # given_extrema filename (the reference's own quirk, docs/parity.md
        # "raw-args job writes given_extrema-named files"); with 2+ workers
        # the final bytes follow completion order and the byte-identity
        # assertion against the single-host run becomes a coin flip.
        # Serializing jobs pins last-writer = the given job on every host.
        max_workers=1,
        verbose=False,
        use_tqdm=False,
    )
    ok = sum(1 for r in results if r.get("status") == "ok")
    print(f"FLAGSHIP_OK pid={pid} results={len(results)} ok={ok}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
