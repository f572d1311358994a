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

import functools
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
REPS = 512  # on-device fori_loop iterations; long chain ~0.4 s device time


def _time_fn(fn, cube, mask, e_valid, zb) -> float:
    """Timing that survives this environment's relay quirks.

    ``block_until_ready`` is NOT a sync point on the tunneled device
    (readiness acks arrive before execution; measured times don't scale
    with problem size), the relay's round-trip latency jitters by tens of
    milliseconds, and the shared 1-core host can stall enqueues.  So the
    ENTIRE rep loop runs on-device inside one jitted ``fori_loop`` (one
    dispatch, one 4-byte readback); every iteration's output feeds a
    running scalar (data dependency -- nothing can be skipped), and
    per-iteration distinct bounds defeat execution dedup.  Per-exec time
    is the two-point difference between a short and a long chain, so the
    dispatch+readback latency cancels; the long chain is sized so the
    device time dominates any residual jitter.
    """
    import jax
    import jax.numpy as jnp

    # The arrays MUST be jit arguments, not closure captures: captured
    # concrete arrays embed as HLO constants, and this environment's
    # remote-compile endpoint rejects a 256 MB request body (HTTP 413).
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(c, m, ev, zbs_arr, n):
        def body(i, acc):
            idx = fn(c, m, ev, zbs_arr[i])
            return acc + jnp.sum(idx[:8, :].astype(jnp.int32))

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    zbs_arr = jnp.asarray(
        np.stack([[2.0 + 1e-3 * i, 5000.0] for i in range(REPS)]).astype(np.float32)
    )
    n_short, n_long = 8, REPS

    def run(n):
        t0 = time.perf_counter()
        float(np.asarray(chain(cube, mask, e_valid, zbs_arr, n)))
        return time.perf_counter() - t0

    # Warm both trace caches before timing.
    run(n_short)
    run(n_long)
    short = min(run(n_short) for _ in range(3))
    long = min(run(n_long) for _ in range(3))
    return max((long - short) / (n_long - n_short), 1e-9)


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

        try:
            t_pallas = _time_fn(pallas_fused, cube, mask, e_valid, zb)
        except Exception as exc:  # e.g. VMEM exhaustion at large tiles
            pallas_rows[str(tt)] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        pallas_rows[str(tt)] = {
            "pallas_fused_ms": round(t_pallas * 1e3, 3),
            "speedup": round(t_xla / t_pallas, 3),
            "pallas_gbps": round(hbm_bytes / t_pallas / 1e9, 1),
        }
    timed = [k for k, v in pallas_rows.items() if "pallas_fused_ms" in v]
    if not timed:
        print(json.dumps({"status": "error", "by_t_tile": pallas_rows}))
        return
    best = min(timed, key=lambda k: pallas_rows[k]["pallas_fused_ms"])
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
