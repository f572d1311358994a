#!/usr/bin/env python
"""Measure the fused Pallas collapse+quantize kernel vs the XLA chain on TPU.

VERDICT round-1 item: "prototype fusing the explicit-bounds quantize into
one Pallas kernel and measure on the real chip; if XLA fusion already
saturates HBM bandwidth, record the measurement and close the item."

Methodology: real FAST instrument dimensions (T=8192 padded, A=64, E=128
padded), explicit color bounds (the given-extrema batch half).  Timing is
on-device only (block_until_ready on a tiny slice; no bulk D2H, so the
result is valid even over a slow host link).  Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np
import os
import sys

# Allow `python tools/<name>.py` without a manual PYTHONPATH: the repo
# root (the package's parent) precedes any site installs.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


T, A, E = 8192, 64, 128
REPS = 20


def _time_fn(fn, cube, mask, e_valid, zb) -> float:
    """Timing that survives this environment's relay quirks.

    ``block_until_ready`` is NOT a sync point on the tunneled device
    (readiness acks arrive before execution; measured times don't scale
    with problem size).  So: every rep's output feeds a running scalar
    (data dependency -- nothing can be skipped or reordered away), and ONE
    4-byte readback of that scalar at the end forces completion of the
    whole chain.  Per-rep distinct bounds defeat execution dedup.  The
    single readback's latency is measured separately and subtracted.
    """
    import jax
    import jax.numpy as jnp

    # The arrays MUST be jit arguments, not closure captures: captured
    # concrete arrays embed as HLO constants, and this environment's
    # remote-compile endpoint rejects a 256 MB request body (HTTP 413).
    @jax.jit
    def step(acc, c, m, ev, z):
        idx = fn(c, m, ev, z)
        return acc + jnp.sum(idx[:8, :].astype(jnp.int32))

    zbs = [jnp.asarray(np.array([2.0 + 1e-3 * i, 5000.0], np.float32)) for i in range(REPS)]
    acc = step(jnp.int32(0), cube, mask, e_valid, zb)
    float(np.asarray(acc))  # compile + warm + establish readback baseline
    t0 = time.perf_counter()
    float(np.asarray(step(jnp.int32(0), cube, mask, e_valid, zb)))
    one = time.perf_counter() - t0  # 1 exec + 1 sync readback

    t0 = time.perf_counter()
    for z in zbs:
        acc = step(acc, cube, mask, e_valid, z)
    float(np.asarray(acc))  # the only true sync
    total = time.perf_counter() - t0  # REPS execs + 1 sync readback
    return max((total - one) / (REPS - 1), 1e-9)


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from configurable_spectrograms_tpu.ops.pallas_kernels import fused_quantize_pallas
    from configurable_spectrograms_tpu.ops.spectrogram import RenderSpec, collapse_cube, quantize_matrix

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--t-tiles", type=int, nargs="+", default=[64],
        help="time-tile sizes to measure (grid steps = T/t_tile; larger "
        "tiles cut per-step overhead until the double-buffered block "
        "plus the (T, E) scratch exceed VMEM)",
    )
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    cube = jnp.asarray((rng.random((T, A, E)) * 1e4).astype(np.float32))
    mask = jnp.asarray(rng.random(A) < 0.6)
    e_valid = jnp.asarray(np.ones(E, bool))
    zb = jnp.asarray(np.array([2.0, 5000.0], np.float32))
    spec = RenderSpec(8, 8, "linear", "log")

    @jax.jit
    def xla_chain(c, m, ev, z):
        mm = collapse_cube(c, m, T)
        return quantize_matrix(
            mm, jnp.ones((E,), jnp.float32), ev, jnp.int32(T), jnp.int32(0), jnp.int32(T),
            z, spec, skip_percentile=True,
        )["idx"]

    t_xla = _time_fn(xla_chain, cube, mask, e_valid, zb)
    hbm_bytes = T * A * E * 4  # the cube read dominates
    pallas_rows = {}
    for tt in args.t_tiles:

        @jax.jit
        def pallas_fused(c, m, ev, z, _tt=tt):
            return fused_quantize_pallas(
                c, m, ev, T, 0, T, z, z_scale="log", t_tile=_tt, interpret=False
            )["idx"]

        t_pallas = _time_fn(pallas_fused, cube, mask, e_valid, zb)
        pallas_rows[str(tt)] = {
            "pallas_fused_ms": round(t_pallas * 1e3, 3),
            "speedup": round(t_xla / t_pallas, 3),
            "pallas_gbps": round(hbm_bytes / t_pallas / 1e9, 1),
        }
    best = min(pallas_rows, key=lambda k: pallas_rows[k]["pallas_fused_ms"])
    print(
        json.dumps(
            {
                "shape": [T, A, E],
                "xla_chain_ms": round(t_xla * 1e3, 3),
                "xla_gbps": round(hbm_bytes / t_xla / 1e9, 1),
                "by_t_tile": pallas_rows,
                "best_t_tile": int(best),
                **pallas_rows[best],
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
