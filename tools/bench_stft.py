#!/usr/bin/env python
"""On-chip comparison of the two STFT device programs (BASELINE configs[4]).

The audio front-end can compute its windowed short-time transform two ways:
XLA's native rFFT, or two window-folded DFT-basis matmuls that put every
FLOP on the MXU (``ops/stft.py``).  This tool times both on the attached
device at representative audio sizes and prints one JSON line per shape.

Timing methodology matches tools/bench_pallas_quantize.py: this
environment's relay acks transfers before execution completes, so each
measurement syncs through a data-dependent scalar readback instead of
``block_until_ready``.
"""

from __future__ import annotations

import json
import sys
import time
import os

# Allow `python tools/<name>.py` without a manual PYTHONPATH: the repo
# root (the package's parent) precedes any site installs.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)



def _sync_scalar(arr) -> float:
    """Force execution by reading one data-dependent scalar back."""
    import jax.numpy as jnp

    return float(jnp.sum(arr[..., :1, :1]))


def bench_one(n_samples: int, frame_length: int, hop_length: int, repeats: int = 5) -> dict:
    import jax
    import numpy as np

    from configurable_spectrograms_tpu.ops.stft import stft_magnitude

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal(n_samples).astype(np.float32))
    out = {
        "n_samples": n_samples,
        "frame_length": frame_length,
        "hop_length": hop_length,
        "device": str(jax.devices()[0]),
    }
    results = {}
    for method in ("fft", "matmul", "pallas"):
        fn = lambda: stft_magnitude(  # noqa: E731
            x, frame_length=frame_length, hop_length=hop_length, method=method
        )
        _sync_scalar(fn())  # compile + warm
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync_scalar(fn())
            times.append(time.perf_counter() - t0)
        results[method] = min(times)
        out[f"{method}_ms"] = round(min(times) * 1e3, 3)
    out["speedup_matmul_over_fft"] = round(results["fft"] / results["matmul"], 3)
    # Numerical agreement between the two programs on this hardware.
    import numpy as np

    a = np.asarray(stft_magnitude(x, frame_length=frame_length, hop_length=hop_length, method="fft"))
    b = np.asarray(
        stft_magnitude(x, frame_length=frame_length, hop_length=hop_length, method="matmul")
    )
    scale = float(np.max(np.abs(a))) or 1.0
    out["max_rel_diff"] = float(np.max(np.abs(a - b)) / scale)
    return out


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="one shape only (slow relay links)")
    args = parser.parse_args()
    # 10 s and 60 s of 44.1 kHz audio at two common analysis settings.
    shapes = ((441_000, 1024, 256), (441_000, 2048, 512), (2_646_000, 1024, 256))
    if args.quick:
        shapes = shapes[:1]
    for n, fl, hop in shapes:
        print(json.dumps(bench_one(n, fl, hop)))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    code = main()
    # Deterministic exit even when the background link probe is still
    # blocked in a device transfer at teardown (see cli.clean_exit).
    from configurable_spectrograms_tpu.cli import clean_exit

    clean_exit(code or 0)
