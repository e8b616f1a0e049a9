"""The bench's plausibility guard must trip on relay timing artifacts.

BENCH_r03.json recorded 273,228 pairs/s at a 0.1 ms "batch latency" —
a relay enqueue-ack artifact ~5,000x reality (16 ViT-L pairs are ~300 ms
of device time). These tests pin the guard against exactly that record
and against an instant-ack timer wired into the real measurement loop.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


class TestCheckPlausibility:
    def test_trips_on_bench_r03_record(self):
        # the literal poisoned record: b16, 273228.24 pairs/s, 0.1 ms
        # pipelined "latency"; a blocking call would still have measured
        # ~300 ms of real device time
        v = bench.check_plausibility(
            pairs_per_sec=273228.24, pipelined_iter_s=5.9e-5,
            blocking_iter_s=0.300, fetched_scalar=0.12)
        assert not v["ok"]
        # both independent guards fire: the implied rate is ~2000x the
        # bf16 peak AND the pipelined time is far below blocking
        assert len(v["failures"]) == 2
        assert v["implied_tflops"] > bench.V5E_BF16_PEAK_FLOPS / 1e12

    def test_trips_on_instant_ack_even_with_plausible_blocking(self):
        # an enqueue-ack timer that somehow implied a sub-peak rate is
        # still caught by the pipelined-vs-blocking cross-check
        v = bench.check_plausibility(
            pairs_per_sec=120.0, pipelined_iter_s=0.001,
            blocking_iter_s=0.300, fetched_scalar=1.0)
        assert not v["ok"]
        assert any("0.3x" in f for f in v["failures"])

    def test_trips_on_nonfinite_output(self):
        v = bench.check_plausibility(
            pairs_per_sec=50.0, pipelined_iter_s=0.16,
            blocking_iter_s=0.20, fetched_scalar=float("nan"))
        assert not v["ok"]
        assert any("non-finite" in f for f in v["failures"])

    def test_passes_on_honest_round3_numbers(self):
        # the real round-3 point: 52.22 pairs/s b8, 153.2 ms pipelined,
        # ~190 ms blocking (incl. relay dispatch + output fetch)
        v = bench.check_plausibility(
            pairs_per_sec=52.22, pipelined_iter_s=0.1532,
            blocking_iter_s=0.190, fetched_scalar=-0.37)
        assert v["ok"], v["failures"]
        # implied rate is the measured ~35% MFU point
        assert 50 < v["implied_tflops"] < 90

    def test_pipelining_that_hides_dispatch_only_is_fine(self):
        # pipelined 160 ms vs blocking 195 ms (35 ms dispatch hidden)
        v = bench.check_plausibility(
            pairs_per_sec=50.0, pipelined_iter_s=0.160,
            blocking_iter_s=0.195, fetched_scalar=2.0)
        assert v["ok"], v["failures"]


class TestMeasurementLoopIsUnfoolable:
    """Run bench.measure()'s exact loop shape against a fake backend
    whose ``block_until_ready`` acknowledges instantly but whose scalar
    fetch takes real time — the r03 relay behavior — and prove the
    fetch-closed loop observes the real duration."""

    def test_fetch_closed_loop_observes_real_time(self):
        import time

        class FakeRelayArray:
            """block_until_ready returns instantly (enqueue-ack); only a
            host fetch (float()) waits for the simulated device work."""

            def __init__(self, ready_at):
                self.ready_at = ready_at

            def block_until_ready(self):
                return self  # the r03 lie

            def __float__(self):
                now = time.perf_counter()
                if self.ready_at > now:
                    time.sleep(self.ready_at - now)
                return 1.0

        device_free_at = [time.perf_counter()]
        step_s = 0.02

        def fake_fn(params, token):
            # enqueue: device starts after its previous work finishes
            start = max(device_free_at[0], time.perf_counter())
            device_free_at[0] = start + step_s
            return None, FakeRelayArray(device_free_at[0])

        iters = 5
        token = 0.0
        _, tok = fake_fn(None, token)
        float(tok)
        t0 = time.perf_counter()
        for _ in range(iters):
            _, token = fake_fn(None, token)
        float(token)  # the bench's closing fetch
        med = (time.perf_counter() - t0) / iters

        # an enqueue-ack (block_until_ready) loop would have measured
        # ~0 ms/iter; the fetch-closed loop sees the full 20 ms
        assert med >= 0.9 * step_s, med

        # and the old r03 loop shape (block_until_ready pipelined) on
        # this same fake backend DOES get fooled — demonstrating the
        # guard's necessity
        device_free_at[0] = time.perf_counter()
        t0 = time.perf_counter()
        prev = None
        for _ in range(iters):
            _, cur = fake_fn(None, 0.0)
            if prev is not None:
                prev.block_until_ready()
            prev = cur
        prev.block_until_ready()
        fooled = (time.perf_counter() - t0) / iters
        assert fooled < 0.3 * step_s, fooled
        v = bench.check_plausibility(
            pairs_per_sec=8 / fooled,
            pipelined_iter_s=fooled, blocking_iter_s=step_s,
            fetched_scalar=1.0)
        assert not v["ok"]
