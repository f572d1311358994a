#!/usr/bin/env python
"""Device-vs-host crossover: panels/sec as a function of link bandwidth.

The device rasterization path is link-bound on this environment's tunneled
relay, so whether the chip beats the host fallback depends on effective
host<->device bandwidth.  This harness measures that curve directly ON THE
REAL CHIP: the same production batch render runs with the link throttled
to a series of effective bandwidths (a serialized token-bucket charges
``bytes / MBps`` wall time to every readback and cube upload, modeling a
slower link; the native measurement runs unthrottled), against the host
backend's unthrottled rate.  The crossover bandwidth -- where the device
path overtakes the host -- is the number that generalizes: any
direct-attached TPU moves GB/s over PCIe/ICI, orders of magnitude above
it, so a device win at (or extrapolating just past) the top of the curve
proves the production deployment renders faster on-chip.

Prints one JSON document.  Exit 0 on success, 2 when the link is too
degraded to measure the device path at all.

Usage: ``PYTHONPATH=/root/repo python tools/crossover.py [--mbps 2,10,20]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

# Decisive probe (cold first-D2H can take minutes); must precede import.
os.environ.setdefault("CST_LINK_PROBE_SYNC_WAIT", "330")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _LinkThrottle:
    """Charge wall time for bytes moved, serialized like a real link."""

    def __init__(self, mbps: float | None):
        self.mbps = mbps
        self._lock = threading.Lock()

    def charge(self, nbytes: int, already_spent: float) -> None:
        if self.mbps is None:
            return
        target = nbytes / (self.mbps * 1e6)
        with self._lock:  # one transfer at a time, as on a shared link
            time.sleep(max(0.0, target - already_spent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbps", default="2,10,20",
                    help="comma-separated throttle points (native always runs)")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    throttles = [float(x) for x in args.mbps.split(",") if x]

    from bench import _build_archive, _ours_pass, _ours_setup, _progress

    from configurable_spectrograms_tpu.render import device_cache, dispatch as figure, drain, link

    _progress("probing device link")
    link.probe_device_link()
    if link._host_backend_active() and link._BACKEND.get("why_host") != "bandwidth":
        print(json.dumps({"status": "skipped", "reason": "device link dead"}))
        return 2

    with tempfile.TemporaryDirectory() as root:
        _progress("building synthetic archive")
        archive = _build_archive(root)
        render_one, jobs = _ours_setup(archive)

        # Patch the OWNING modules: drain/device_cache resolve these
        # names module-locally (dispatch only re-exports them).
        real_readback = drain._readback
        real_padded = device_cache._padded_device_cube
        throttle_box: dict[str, _LinkThrottle] = {"t": _LinkThrottle(None)}

        def throttled_readback(out_dev):
            t0 = time.perf_counter()
            arr = real_readback(out_dev)
            throttle_box["t"].charge(arr.nbytes, time.perf_counter() - t0)
            return arr

        def throttled_padded(cube, Tp, Ap, Ep):
            # Cache hits moved no bytes; only charge fresh uploads.
            hit = figure._DEVICE_CUBE_CACHE.get((id(cube), Tp, Ap, Ep)) is not None
            t0 = time.perf_counter()
            arr = real_padded(cube, Tp, Ap, Ep)
            if not hit:
                throttle_box["t"].charge(4 * Tp * Ap * Ep, time.perf_counter() - t0)
            return arr

        drain._readback = throttled_readback
        device_cache._padded_device_cube = throttled_padded

        results: dict[str, dict] = {}
        try:
            # Pin the device backend: throttled transfers must not trip the
            # auto calibration into the host path mid-measurement.
            link._BACKEND["mode"] = "device"
            link._BACKEND["forced_host"] = False

            out_dir = os.path.join(root, "out")
            os.makedirs(out_dir, exist_ok=True)
            _progress("device warmup (compiles + resident-cube uploads)")
            _ours_pass(render_one, jobs, out_dir)

            for mbps in [None] + sorted(throttles, reverse=True):
                label = "native" if mbps is None else f"{mbps:g}"
                # Fresh cube cache per point so uploads are charged too.
                figure._DEVICE_CUBE_CACHE.clear()
                throttle_box["t"] = _LinkThrottle(mbps)
                rates = []
                for i in range(args.passes):
                    _progress(f"device pass {i + 1}/{args.passes} @ {label} MB/s")
                    rates.append(_ours_pass(render_one, jobs, out_dir))
                results[label] = {
                    "device_panels_per_sec": round(max(rates), 2),
                    "passes": [round(r, 2) for r in rates],
                }

            _progress("host passes")
            link._BACKEND["mode"] = "host"
            host_dir = os.path.join(root, "h")
            os.makedirs(host_dir, exist_ok=True)
            host_rates = []
            for i in range(args.passes):
                host_rates.append(_ours_pass(render_one, jobs, host_dir))
            host_pps = max(host_rates)
        finally:
            drain._readback = real_readback
            device_cache._padded_device_cube = real_padded
            link._BACKEND["mode"] = "auto"

        wins = {k: v["device_panels_per_sec"] > host_pps for k, v in results.items()}
        print(json.dumps({
            "status": "ok",
            "host_panels_per_sec": round(host_pps, 2),
            "host_passes": [round(r, 2) for r in host_rates],
            "device_by_link_mbps": results,
            "device_wins_at": wins,
            "note": ("device path measured on the real chip with transfers "
                     "throttled to each bandwidth; 'native' is the live link"),
        }, indent=2))
        return 0


if __name__ == "__main__":
    code = main()
    from configurable_spectrograms_tpu.cli import clean_exit

    clean_exit(code or 0)
