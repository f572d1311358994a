"""Mid-batch slow-dispatch fallback + latency-aware backend routing.

VERDICT round-3 item 1: (a) if completed device batches' effective rate
falls below the measured host rate for K consecutive batches, the
remainder of the run renders host-side; (b) lone single-figure renders
choose the backend by estimated latency, not throughput.  The reference
has no analog (matplotlib is its only backend); these policies exist so
the device win is robust on degraded links (reference
fast/batch_directory.py:337 is the pool being outrun either way).
"""

import time

import numpy as np
import pytest

from configurable_spectrograms_tpu.render import dispatch, drain, link
from configurable_spectrograms_tpu.render.tile import TimeWindow


@pytest.fixture(autouse=True)
def _clean_rate_state(monkeypatch):
    link.reset_rate_state()
    monkeypatch.setitem(link._RATE, "host_panels", 0.0)
    monkeypatch.setitem(link._RATE, "host_sec", 0.0)
    monkeypatch.setitem(link._BACKEND, "mode", "auto")
    monkeypatch.setitem(link._BACKEND, "forced_host", False)
    monkeypatch.setitem(link._BACKEND, "probed", True)
    monkeypatch.setitem(link._BACKEND, "why_host", None)
    # The one-shot calibration is the round-2 blunt instrument; these tests
    # exercise the round-4 continuous detector, so suppress it.
    monkeypatch.setitem(link._BACKEND, "calibrated", True)
    # Probe-measured link numbers leak across tests and now feed the
    # derived bootstrap cap; start every test unmeasured.
    link._BACKEND.pop("link_steady_dt", None)
    link._BACKEND.pop("link_mbps", None)
    yield
    link.reset_rate_state()
    link._BACKEND.pop("link_steady_dt", None)
    link._BACKEND.pop("link_mbps", None)


def _panel(rng, n_t=64, n_a=8, n_e=16):
    cube = rng.uniform(1.0, 100.0, size=(n_t, n_a, n_e)).astype(np.float32)
    return dispatch.PanelData(
        cube=cube,
        pitch_mask=np.ones(n_a, bool),
        energy=np.linspace(2000.0, 10.0, n_e).astype(np.float32),
        times=np.linspace(0.0, 60.0, n_t),
        window=TimeWindow(0, n_t, (0.0, 60.0), (0.0, 60.0)),
        y_min=10.0,
        y_max=2000.0,
        z_min=None,
        z_max=None,
        y_scale="log",
        z_scale="log",
        colormap="viridis",
        x_is_unix=False,
        z_label="Counts",
    )


# ---------------------------------------------------------------------------
# unit: the rate meter
# ---------------------------------------------------------------------------

def test_host_rate_measured_from_note_host_group():
    assert link._host_sec_per_panel() is None
    link.note_host_group(8, 0.08)  # 10 ms/panel
    assert link._host_sec_per_panel() == pytest.approx(0.01)


def test_fast_device_batches_never_trip():
    link.note_host_group(8, 0.08)
    t = 100.0
    for _ in range(20):
        link.note_device_batch(8, t, t + 0.05)  # 6 ms/panel, faster than host
        t += 0.05
    assert link._BACKEND["forced_host"] is False
    assert link._RATE["slow_streak"] == 0


def _seed_healthy_device(t=100.0, spp=0.012, n=6):
    """Feed n healthy device batches so the self-baseline exists."""
    for _ in range(n):
        link.note_device_batch(8, t, t + 8 * spp)
        t += 8 * spp
    return t


def test_slow_streak_trips_to_host_with_reason():
    link.note_host_group(8, 0.08)  # host quantize: 10 ms/panel
    t = _seed_healthy_device()  # device baseline: 12 ms/panel
    for i in range(link._SLOW_STREAK_K):
        assert link._BACKEND["forced_host"] is False, f"tripped early at batch {i}"
        link.note_device_batch(8, t, t + 8 * 0.08)  # 80 ms/panel: >3x baseline, >host
        t += 8 * 0.08
    assert link._BACKEND["forced_host"] is True
    assert link._BACKEND["why_host"] == "slow"


def test_mildly_slower_than_host_does_not_trip():
    """Device above the host quantize rate but NOT self-degraded must stay
    on the device: its end-to-end win comes from freeing the host CPU, so
    stage-rate comparisons alone cannot justify a flip."""
    link.note_host_group(8, 0.032)  # host quantize: 4 ms/panel
    t = _seed_healthy_device(spp=0.012)
    for _ in range(link._SLOW_STREAK_K + 2):
        link.note_device_batch(8, t, t + 8 * 0.014)  # 14 ms/panel: healthy-ish
        t += 8 * 0.014
    assert link._BACKEND["forced_host"] is False


def test_one_fast_batch_resets_the_streak():
    link.note_host_group(8, 0.08)
    t = _seed_healthy_device()
    for _ in range(link._SLOW_STREAK_K - 1):
        link.note_device_batch(8, t, t + 8 * 0.08)
        t += 8 * 0.08
    link.note_device_batch(8, t, t + 8 * 0.012)  # fast batch
    t += 8 * 0.012
    for _ in range(link._SLOW_STREAK_K - 1):
        link.note_device_batch(8, t, t + 8 * 0.08)
        t += 8 * 0.08
    assert link._BACKEND["forced_host"] is False


def test_severe_stall_trips_without_waiting_for_streak():
    link.note_host_group(8, 0.08)
    t = _seed_healthy_device()
    # ~40x the baseline: one batch is enough (severe).
    link.note_device_batch(8, t, t + 8 * 0.5)
    assert link._BACKEND["forced_host"] is True
    assert link._BACKEND["why_host"] == "slow"


def test_degraded_but_host_no_faster_stays_on_device():
    link.note_host_group(8, 8 * 0.2)  # host quantize SLOWER than the stall
    t = _seed_healthy_device()
    for _ in range(link._SLOW_STREAK_K + 1):
        link.note_device_batch(8, t, t + 8 * 0.08)
        t += 8 * 0.08
    assert link._BACKEND["forced_host"] is False


def test_slow_without_host_rate_arms_probation_not_blind_trip():
    t = _seed_healthy_device()
    for _ in range(link._SLOW_STREAK_K):
        link.note_device_batch(8, t, t + 8 * 0.1)  # 100 ms/panel, no host data
        t += 0.8
    assert link._BACKEND["forced_host"] is False  # never trips blind
    assert link.take_probation() is True
    assert link.take_probation() is False  # one-shot


def test_pipelined_batches_not_billed_shared_wall_clock():
    """Three batches enqueued together and completing 50 ms apart must be
    charged ~50 ms each (incremental), not ~150 ms each (wall)."""
    link.note_host_group(8, 0.08)
    enq = 100.0
    for k in range(1, 4):
        link.note_device_batch(8, enq, enq + 0.05 * k)
    assert link._RATE["slow_streak"] == 0
    assert link._BACKEND["forced_host"] is False


def test_idle_gap_not_billed_to_device():
    link.note_host_group(8, 0.08)
    link.note_device_batch(8, 100.0, 100.05)
    # 60 s idle, then a batch enqueued late and completing quickly.
    link.note_device_batch(8, 160.0, 160.05)
    assert link._RATE["slow_streak"] == 0


def test_reset_rate_state_clears_streak_and_probation():
    link.note_host_group(8, 0.08)
    link.note_device_batch(8, 100.0, 100.0 + 8 * 0.3)
    link._RATE["probation"] = True
    link.reset_rate_state()
    assert link._RATE["slow_streak"] == 0
    assert link.take_probation() is False


# ---------------------------------------------------------------------------
# unit: latency policy
# ---------------------------------------------------------------------------

def test_latency_policy_routes_relay_to_host():
    # Relay-like link: 60 ms round trip, 25 MB/s; one 8-panel figure.
    link._BACKEND["link_steady_dt"] = 0.06
    link._BACKEND["link_mbps"] = 25.0
    link.note_host_group(8, 0.12)  # 15 ms/panel
    assert link.prefer_host_for_latency(8, 0) is True  # 2 RTs alone lose
    assert link.prefer_host_for_latency(8, 12_600_000) is True


def test_latency_policy_keeps_device_on_direct_attach():
    link._BACKEND["link_steady_dt"] = 0.0005
    link._BACKEND["link_mbps"] = 8000.0
    link.note_host_group(8, 0.12)
    assert link.prefer_host_for_latency(8, 12_600_000) is False


def test_latency_policy_disabled_by_env(monkeypatch):
    link._BACKEND["link_steady_dt"] = 0.06
    link._BACKEND["link_mbps"] = 25.0
    monkeypatch.setenv("CST_LATENCY_POLICY", "0")
    assert link.prefer_host_for_latency(8, 0) is False


def test_latency_policy_inactive_outside_auto(monkeypatch):
    link._BACKEND["link_steady_dt"] = 0.06
    monkeypatch.setitem(link._BACKEND, "mode", "device")
    assert link.prefer_host_for_latency(8, 0) is False


def test_latency_policy_no_link_measurement_keeps_device():
    link._BACKEND.pop("link_steady_dt", None)
    assert link.prefer_host_for_latency(8, 0) is False


# ---------------------------------------------------------------------------
# integration through the dispatch layer
# ---------------------------------------------------------------------------

def test_prefer_latency_renders_host_on_slow_link(rng):
    link._BACKEND["link_steady_dt"] = 0.06
    link._BACKEND["link_mbps"] = 25.0
    link.note_host_group(8, 0.12)
    pending = dispatch.enqueue_render_panels([_panel(rng)], 16, 24, prefer_latency=True)
    assert not pending.has_device_work()  # routed to host outright
    results = pending.wait()
    assert all(r is not None and "rgba" in r for r in results)


def test_prefer_latency_ignored_for_fast_link(rng):
    link._BACKEND["link_steady_dt"] = 0.0001
    link._BACKEND["link_mbps"] = 8000.0
    pending = dispatch.enqueue_render_panels([_panel(rng)], 16, 24, prefer_latency=True)
    assert pending.has_device_work()
    results = pending.wait()
    assert all(r is not None and "rgba" in r for r in results)


def test_probation_group_renders_host_and_measures(rng):
    """An armed probation renders the next group host-side (results still
    complete) and records a host rate for the comparator."""
    link._RATE["probation"] = True
    pending = dispatch.enqueue_render_panels([_panel(rng) for _ in range(8)], 16, 24)
    assert not pending.has_device_work()
    results = pending.wait()
    assert all(r is not None and "rgba" in r for r in results)
    assert link._host_sec_per_panel() is not None
    # One-shot: the next render goes back to the device path.
    pending2 = dispatch.enqueue_render_panels([_panel(rng)], 16, 24)
    assert pending2.has_device_work()
    pending2.wait()


def test_soft_drain_cap_adapts_to_healthy_baseline():
    assert link.bucket_soft_timeout() == link._SOFT_DRAIN_BOOTSTRAP_SEC
    for _ in range(5):
        link.note_bucket_drain(0.1)
    assert link.bucket_soft_timeout() == pytest.approx(2.0)  # floor
    for _ in range(20):
        link.note_bucket_drain(1.0)
    assert link.bucket_soft_timeout() == pytest.approx(6.0)


def test_soft_cap_scales_with_bucket_size_and_uploads():
    """The cap is per-panel-normalized and budgets fresh uploads: a
    legitimately larger (or cold-upload) bucket must not trip a cap sized
    by small cache-hit buckets."""
    for _ in range(5):
        link.note_bucket_drain(0.4, n_panels=8)  # healthy 0.05 s/panel
    assert link.bucket_soft_timeout(1, 0) == pytest.approx(2.0)  # floor
    assert link.bucket_soft_timeout(10, 0) == pytest.approx(3.0)  # 6*0.05*10
    # +5 s allowance for 10 MB of fresh cubes at the 2 MB/s worst rate.
    assert link.bucket_soft_timeout(10, 10_000_000) == pytest.approx(8.0)


def test_detector_baseline_ratchet_is_bounded():
    """A gradually degrading link must still trip gate 1: the self-baseline
    median is capped at the absolute slow mark, so history cannot ratchet
    the threshold above 3x _SLOW_ABS_SEC_PER_PANEL."""
    for _ in range(16):
        link._RATE["device_spp"].append(1.0)  # drifted-up "healthy" history
    t = 100.0
    for _ in range(3):  # spp = 0.2 s/panel (5 panels/s): always degraded
        link.note_device_batch(10, t, t + 2.0)
        t += 10.0
    # No host measurement yet -> the two-gate rule arms probation.
    assert link._RATE["probation"] is True
    assert link._BACKEND["forced_host"] is False


def test_probation_disarms_once_host_is_measured_elsewhere():
    """A host measurement arriving by another path (latency routing, a
    forced-host group) consumes the pending probation: its only purpose
    was to obtain that measurement."""
    link._RATE["probation"] = True
    link.note_host_group(8, 0.08)
    assert link._RATE["probation"] is False
    assert link.take_probation() is False


def test_soft_cap_trips_one_giant_stalled_bucket(rng, monkeypatch):
    """A single slow drain must not hide until it completes (round-4 bench
    pass 2: 4.75 panels/s with zero detector events): with the host
    measurably faster, the adaptive soft cap abandons it and host-renders
    within ~the cap, far inside the 300 s hard watchdog."""
    for _ in range(5):
        link.note_bucket_drain(0.1)  # healthy baseline -> 2 s cap
    link.note_host_group(8, 0.08)  # measured host: 0.01 s/panel, far faster
    monkeypatch.setattr(drain, "_readback", lambda out_dev: time.sleep(600))
    t0 = time.monotonic()
    results = dispatch.device_render_panels([_panel(rng)], 16, 24)
    elapsed = time.monotonic() - t0
    assert all(r is not None and "rgba" in r for r in results)  # host fallback
    assert elapsed < 10, f"soft cap did not bound the drain ({elapsed:.1f}s)"
    assert link._BACKEND["forced_host"] is True
    assert link._BACKEND["why_host"] == "slow"
    # The trip stamps the failure ts so sibling batches fast-trip.
    assert link._BACKEND["last_dispatch_failure_ts"] > 0


def test_soft_cap_expiry_without_host_evidence_does_not_force(rng, monkeypatch):
    """Two-gate rule on the drain path: a soft-cap expiry with NO host
    measurement host-renders that bucket (producing the measurement) but
    must not flip the whole process to the host backend on no evidence."""
    for _ in range(5):
        link.note_bucket_drain(0.1)
    assert link._host_sec_per_panel() is None
    monkeypatch.setattr(drain, "_readback", lambda out_dev: time.sleep(600))
    t0 = time.monotonic()
    results = dispatch.device_render_panels([_panel(rng)], 16, 24)
    elapsed = time.monotonic() - t0
    assert all(r is not None and "rgba" in r for r in results)
    assert elapsed < 10, f"soft cap did not bound the drain ({elapsed:.1f}s)"
    assert link._BACKEND["forced_host"] is False  # probation-style, not a trip
    assert link._RATE["host_panels"] > 0  # the host render fed the meter


def test_soft_cap_expiry_waits_when_host_is_slower(rng, monkeypatch):
    """When the measured host replacement would be no faster than even the
    stalled drain's lower bound, the drain waits out the hard budget on
    the device instead of crawling on the host."""
    for _ in range(5):
        link.note_bucket_drain(0.05)  # healthy baseline -> 2 s cap
    link.note_host_group(8, 400.0)  # pathological host: 50 s/panel

    def _slow_readback(out_dev):
        time.sleep(4.0)
        return np.asarray(out_dev)

    monkeypatch.setattr(drain, "_readback", _slow_readback)
    t0 = time.monotonic()
    # Two shape-distinct panels -> two buckets, so the "alone" bandwidth
    # heuristic (which would see the simulated 4 s transfer as a dead
    # link) stays out of the way; this test pins only the soft-cap wait.
    results = dispatch.device_render_panels([_panel(rng), _panel(rng, n_e=24)], 16, 24)
    elapsed = time.monotonic() - t0
    assert all(r is not None and "rgba" in r for r in results)
    assert elapsed >= 3.5, "the drain should have waited past the soft cap"
    assert link._BACKEND["forced_host"] is False


def test_slow_trip_stamps_failure_ts_for_siblings():
    link.note_host_group(8, 0.08)
    t = _seed_healthy_device()
    before = link._BACKEND["last_dispatch_failure_ts"]
    link.note_device_batch(8, t, t + 8 * 0.5)  # severe -> trips
    assert link._BACKEND["forced_host"] is True
    assert link._BACKEND["last_dispatch_failure_ts"] > before


def test_slow_dispatch_end_to_end_fallback(rng, monkeypatch):
    """Slow-but-completing readbacks (the observed mid-run relay stalls)
    flip the process to the host backend within K batches -- the
    round-3 artifacts' 7-14 panels/s passes were exactly this window
    running device-side for the whole pass."""
    link.note_host_group(8, 0.02)  # host measured fast: 2.5 ms/panel
    # Scale the detector's bars up so box-load noise cannot promote the
    # intended MILD stall into a severe one-shot trip: with the default
    # 0.06 s bootstrap the severe bar (2x) sits at 0.12 s/panel, only
    # ~20 ms above the injected stall -- a loaded CI box crossed it and
    # tripped before the K-batch streak this test exercises.
    monkeypatch.setattr(link, "_SLOW_ABS_SEC_PER_PANEL", 2.0)
    # The 2.2 s injected readback would otherwise fire the bandwidth
    # watchdog (xfer > 1 s at < 1 MB/s) and the one-shot calibration
    # branch before the streak detector ever sees a second batch; both
    # have their own unit tests -- pin them out of reach here.
    monkeypatch.setattr(drain, "_MIN_LINK_MBPS", 0.0)
    monkeypatch.setattr(drain, "_CALIBRATE_XFER_SEC_PER_PANEL", 1e9)

    real_readback = dispatch._readback

    def slow_readback(out_dev):
        # Mild stall: 2.2 s/panel exceeds the bootstrap threshold (2.0 s)
        # but stays well under the severe bar (4.0 s) even with load
        # noise, so the FULL K-batch streak is exercised (severe one-shot
        # trips are unit-tested above).
        time.sleep(2.2)
        return real_readback(out_dev)

    monkeypatch.setattr(drain, "_readback", slow_readback)
    for _ in range(link._SLOW_STREAK_K):
        assert not link._host_backend_active()
        dispatch.device_render_panels([_panel(rng)], 16, 24)
    assert link._BACKEND["forced_host"] is True
    assert link._BACKEND["why_host"] == "slow"
    # Subsequent renders run host-side and still complete.
    results = dispatch.device_render_panels([_panel(rng)], 16, 24)
    assert all(r is not None and "rgba" in r for r in results)


def test_latency_upload_estimate_dedups_shared_cubes(rng, monkeypatch):
    """A cube shared by two buckets with equal padded dims (the raw+given
    figure pair) is charged ONE upload: the first bucket's dispatch makes
    it resident for the second."""
    from configurable_spectrograms_tpu.render import device_cache

    device_cache._DEVICE_CUBE_CACHE.clear()
    monkeypatch.setenv("CST_DATA_MESH", "0")
    p_raw = _panel(rng)
    p_given = dispatch.PanelData(**{**p_raw.__dict__, "z_min": 1.0, "z_max": 90.0})
    p_given.cube = p_raw.cube  # same object, as the figure pair shares it
    groups = {
        (64, 8, 16, "log", "log", 1.0, 99.0, False, False): [0],
        (64, 8, 16, "log", "log", 1.0, 99.0, True, False): [1],
    }
    total = dispatch._latency_upload_bytes(groups, [p_raw, p_given])
    assert total == 64 * 8 * 16 * 4  # one padded upload, not two


# ---------------------------------------------------------------------------
# round-5: derived bootstrap soft cap (VERDICT r4 weak 2)
# ---------------------------------------------------------------------------

def test_bootstrap_cap_derived_from_probe_measurement():
    """With no healthy-drain baseline but a fresh probe measurement, the
    bootstrap cap derives from RTT/bandwidth (expected drain x margin,
    floored) instead of the flat 15 s that hid the round-4 stall."""
    link._RATE["drain_s"].clear()
    link._BACKEND["link_steady_dt"] = 0.028  # the observed relay RTT
    link._BACKEND["link_mbps"] = 25.0
    cap = link.bucket_soft_timeout(8, 0, readback_bytes=100_000)
    assert cap == pytest.approx(link._BOOTSTRAP_FLOOR_SEC)  # floor dominates
    assert cap < 5.0  # a ~13 s first-bucket stall now trips
    # A genuinely large predicted transfer scales the cap past the floor.
    big = link.bucket_soft_timeout(8, 0, readback_bytes=200_000_000)
    assert big > link._BOOTSTRAP_FLOOR_SEC
    assert big == pytest.approx(
        link._BOOTSTRAP_MARGIN * (2 * 0.028 + 8 * link._BOOTSTRAP_PANEL_SEC
                                  + 200_000_000 / 25e6))
    # Upload allowance still rides on top.
    assert link.bucket_soft_timeout(8, 2_000_000) == pytest.approx(
        link._BOOTSTRAP_FLOOR_SEC + 2_000_000 / (link._SOFT_CAP_UPLOAD_MBPS * 1e6))


def test_bootstrap_cap_flat_without_probe_measurement():
    link._RATE["drain_s"].clear()
    link._BACKEND.pop("link_steady_dt", None)
    assert link.bucket_soft_timeout(8, 0) == link._SOFT_DRAIN_BOOTSTRAP_SEC


def test_first_bucket_stall_trips_under_derived_bootstrap(rng, monkeypatch):
    """The round-4 failure mode, synthesized: a freshly probed pass with NO
    healthy-drain baseline stalls in its FIRST bucket.  The derived
    bootstrap cap must trip it (the flat 15 s cap let a ~13 s stall pass
    undetected, BENCH_r04_builder pass 3 at 24 panels/s)."""
    # A prior healthy render marks the program compiled (pass 3's programs
    # were compiled in passes 1-2), then the baseline is cleared as a
    # fresh probe window does.
    dispatch.device_render_panels([_panel(rng)], 16, 24)
    link.reset_rate_state()  # no keep_baseline: drains empty
    monkeypatch.setitem(link._BACKEND, "forced_host", False)
    monkeypatch.setitem(link._BACKEND, "why_host", None)
    link._BACKEND["link_steady_dt"] = 0.028
    link._BACKEND["link_mbps"] = 25.0
    link.note_host_group(8, 0.08)  # host measured: far faster than a stall
    monkeypatch.setattr(link, "_BOOTSTRAP_FLOOR_SEC", 1.0)  # keep test fast
    monkeypatch.setattr(drain, "_readback", lambda out_dev: time.sleep(600))
    t0 = time.monotonic()
    results = dispatch.device_render_panels([_panel(rng)], 16, 24)
    elapsed = time.monotonic() - t0
    assert all(r is not None and "rgba" in r for r in results)  # host fallback
    assert elapsed < 8, f"first-bucket stall hid under the bootstrap cap ({elapsed:.1f}s)"
    assert link._BACKEND["forced_host"] is True
    assert link._BACKEND["why_host"] == "slow"


def test_fresh_compile_bucket_exempt_from_soft_cap(rng, monkeypatch):
    """A bucket whose program compiles for the first time in the process
    must NOT soft-trip even when its drain exceeds the derived cap: the
    one-time compile path is excluded so cold runs never false-trip."""
    from configurable_spectrograms_tpu.render import dispatch as d

    d._SEEN_PROGRAM_SPECS.clear()
    link.reset_rate_state()
    link._BACKEND["link_steady_dt"] = 0.028
    link._BACKEND["link_mbps"] = 25.0
    link.note_host_group(8, 0.08)
    monkeypatch.setattr(link, "_BOOTSTRAP_FLOOR_SEC", 0.5)
    # The deliberately slow readback must exercise ONLY the soft-cap
    # exemption: pin the unrelated bandwidth watchdog and one-shot
    # calibration out of reach (each has its own unit tests).
    monkeypatch.setattr(drain, "_MIN_LINK_MBPS", 0.0)
    monkeypatch.setattr(drain, "_CALIBRATE_XFER_SEC_PER_PANEL", 1e9)
    real_readback = np.asarray

    def slow_first(out_dev):
        time.sleep(1.5)  # 3x the floor: would trip a non-fresh bucket
        return real_readback(out_dev)

    monkeypatch.setattr(drain, "_readback", slow_first)
    results = dispatch.device_render_panels([_panel(rng)], 16, 24)
    assert all(r is not None and "rgba" in r for r in results)
    assert link._BACKEND["forced_host"] is False, "fresh compile must not trip"
    # The compile-inflated drain stayed out of the healthy baseline.
    assert len(link._RATE["drain_s"]) == 0
