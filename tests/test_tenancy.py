"""Per-row interleaved-control tenancy gating (cgx/bench/tenancy.py).

Pure host logic driven by fake measure/control callables and a
virtual sleep — the failure modes replayed here are the real round-4
ones: a tenancy burst BETWEEN pre/post brackets (cliff_bisect4.json),
a poisoned calibration window, and a burst that passes mid-sweep.
"""

import pytest

from cgx.bench.tenancy import (
    calibrate_control,
    gated_sweep,
    measure_with_control,
)


class Script:
    """A control kernel whose value follows a scripted sequence."""

    def __init__(self, values):
        self.values = list(values)
        self.calls = 0

    def __call__(self):
        v = self.values[min(self.calls, len(self.values) - 1)]
        self.calls += 1
        return v


def no_sleep(_s):
    pass


def test_calibrate_accepts_calm_window():
    c = Script([100.0, 101.0, 99.5])
    assert calibrate_control(c, sleep=no_sleep) == pytest.approx(100.0)


def test_calibrate_rejects_noisy_then_recovers():
    # first round spread 50% (poisoned), second round calm
    c = Script([100.0, 150.0, 80.0, 100.0, 100.5, 99.9])
    got = calibrate_control(c, sleep=no_sleep)
    assert got == pytest.approx(100.0)
    assert c.calls == 6


def test_calibrate_gives_up_on_permanent_noise():
    c = Script([100.0, 150.0] * 40)
    assert calibrate_control(c, runs=2, max_rounds=3, sleep=no_sleep) is None


def test_adjacent_controls_accept_clean_row():
    c = Script([100.0, 100.0])
    row = measure_with_control(
        lambda: {"us": 42.0}, c, 100.0, sleep=no_sleep
    )
    assert row["row_trusted"] and row["us"] == 42.0
    assert row["attempts"] == 1
    assert row["control_dev"] == 0.0


def test_burst_between_brackets_is_caught_by_adjacency():
    """The cliff_bisect4 failure: clean pre, burst poisons the row AND
    the post control; the row must be refused and re-measured."""
    c = Script([100.0, 160.0,   # attempt 1: post control hit by burst
                100.0, 100.0])  # attempt 2: calm
    seen = []

    def measure():
        seen.append(1)
        return {"us": 42.0}

    row = measure_with_control(measure, c, 100.0, sleep=no_sleep)
    assert row["row_trusted"] and row["attempts"] == 2
    assert len(seen) == 2  # re-measured, not reused


def test_permanent_burst_returns_untrusted_not_a_number():
    c = Script([160.0] * 40)
    row = measure_with_control(
        lambda: {"us": 42.0}, c, 100.0, retries=3, sleep=no_sleep
    )
    assert not row["row_trusted"]
    assert row["attempts"] == 3
    assert row["control_dev"] == pytest.approx(0.6)


def test_expected_control_must_be_positive():
    with pytest.raises(ValueError):
        measure_with_control(lambda: {}, lambda: 1.0, 0.0)


def test_gated_sweep_flags_each_row_and_recalibrates():
    # calibration (3) + 2 rows x 2 controls, then recalibration (3)
    # + 1 row x 2 controls, with the gate tracking a 2% drift
    c = Script([100.0] * 7 + [102.0] * 5)
    rows = gated_sweep(
        ["a", "b", "c"],
        lambda item: {"item": item},
        c,
        recalibrate_every=2,
        sleep=no_sleep,
    )
    assert [r["item"] for r in rows] == ["a", "b", "c"]
    assert all(r["row_trusted"] for r in rows)
    assert rows[0]["expected_control"] == pytest.approx(100.0)
    assert rows[2]["expected_control"] == pytest.approx(102.0)


def test_gated_sweep_emits_untrusted_rows_when_uncalibratable():
    c = Script([100.0, 150.0] * 40)
    rows = gated_sweep(
        ["a"], lambda item: {"item": item}, c, retries=1, sleep=no_sleep
    )
    assert rows[0]["calibration_failed"]
    assert not rows[0]["row_trusted"]
