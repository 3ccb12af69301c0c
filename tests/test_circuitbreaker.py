"""Circuit-breaker replay contracts — mirrors router/batchrouter/
circuitbreaker/circuitbreaker_test.go plus the worker.Work() gate
(worker.go:54-59)."""

import datetime

from rudder_server_spark.operators.circuitbreaker import circuit_breaker_replay

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _ticks(spark, rows, part="p1"):
    # rows: (seconds offset, ok)
    return spark.createDataFrame(
        [(part, T0 + datetime.timedelta(seconds=s), ok) for s, ok in rows],
        "partition string, ts timestamp, ok boolean",
    )


def _replay(spark, rows, n=3, timeout=30.0, part="p1"):
    out = circuit_breaker_replay(
        _ticks(spark, rows, part), consecutive_failures=n, timeout_s=timeout
    )
    return [
        (r["admitted"], r["state_before"], r["tripped"])
        for r in out.orderBy("ts").collect()
    ]


def test_initial_closed_and_success_keeps_closed(spark):
    got = _replay(spark, [(0, True), (1, True), (2, True)])
    assert got == [(True, "closed", False)] * 3


def test_trip_after_consecutive_failures(spark):
    # TestCircuitBreaker_TripAfterFailures: N-1 failures keep it closed,
    # the Nth opens it; the next tick inside the timeout is skipped
    got = _replay(spark, [(0, False), (1, False), (2, False), (3, False)], n=3)
    assert got[0] == (False is False and True, "closed", False)
    assert got[1] == (True, "closed", False)
    assert got[2] == (True, "closed", True)  # trips on the 3rd failure
    assert got[3] == (False, "open", False)  # skipped while open


def test_success_resets_consecutive_count(spark):
    got = _replay(
        spark, [(0, False), (1, False), (2, True), (3, False), (4, False)], n=3
    )
    # the success at t=2 resets the count: never trips
    assert all(adm for adm, _, _ in got)
    assert not any(tr for _, _, tr in got)


def test_half_open_probe_success_closes(spark):
    # TestCircuitBreaker_ResetAfterSuccessInHalfOpen
    got = _replay(
        spark,
        [(0, False), (1, False), (5, True), (40, True), (41, False)],
        n=2, timeout=30.0,
    )
    assert got[1] == (True, "closed", True)  # tripped at 2nd failure
    assert got[2] == (False, "open", False)  # t=5 inside timeout → skipped
    assert got[3] == (True, "half_open", False)  # t=40 probe succeeds → closed
    assert got[4] == (True, "closed", False)


def test_half_open_probe_failure_retrips(spark):
    # TestCircuitBreaker_ReTripAfterFailureInHalfOpen
    got = _replay(
        spark,
        [(0, False), (1, False), (35, False), (50, True), (70, True)],
        n=2, timeout=30.0,
    )
    assert got[1][2] is True  # tripped
    assert got[2] == (True, "half_open", True)  # probe fails → re-open at t=35
    assert got[3] == (False, "open", False)  # t=50 < 35+30 → still skipped
    assert got[4] == (True, "half_open", False)  # t=70 probe succeeds


def test_skipped_ticks_record_no_outcome(spark):
    """The open-state Execute rejects the call (no outcome recorded): a
    failure that would have happened while skipped must NOT count toward
    the consecutive total after the breaker closes again."""
    got = _replay(
        spark,
        # trip at t=1; t=2..3 skipped failures; probe at t=40 succeeds;
        # then a single failure must leave it closed (count restarted)
        [(0, False), (1, False), (2, False), (3, False), (40, True), (41, False)],
        n=2, timeout=30.0,
    )
    assert [a for a, _, _ in got] == [True, True, False, False, True, True]
    assert got[5] == (True, "closed", False)  # one failure after reset: closed


def test_partitions_independent(spark):
    rows_a = [("a", T0, False), ("a", T0 + datetime.timedelta(seconds=1), False)]
    rows_b = [("b", T0, True), ("b", T0 + datetime.timedelta(seconds=1), True)]
    df = spark.createDataFrame(
        rows_a + rows_b, "partition string, ts timestamp, ok boolean"
    )
    out = circuit_breaker_replay(df, consecutive_failures=2, timeout_s=30.0)
    got = {(r["partition"], r["ts"]): r["tripped"] for r in out.collect()}
    assert got[("a", T0 + datetime.timedelta(seconds=1))] is True
    assert got[("b", T0 + datetime.timedelta(seconds=1))] is False


def test_gate_precedes_throttling_composition(spark):
    """worker.Work() checks the breaker BEFORE getWorkerJobs: only
    admitted ticks reach the pickup/throttle stage (q37/q38) — the
    admission relation is a pre-filter, not a post-filter."""
    from pyspark.sql import functions as F

    ticks = _ticks(spark, [(0, False), (1, False), (2, False), (3, True)])
    out = circuit_breaker_replay(ticks, consecutive_failures=2, timeout_s=300.0)
    reached_pickup = out.where(F.col("admitted"))
    assert reached_pickup.count() == 2  # t=2 (open) and t=3 never picked up


def test_duplicate_tick_key_raises_loudly(spark):
    """CONTRACT (r10 verdict #6): two ticks at the same (partition, ts)
    make the replay order — and the whole state machine —
    nondeterministic; the fold must raise, not silently mis-replay."""
    import pytest

    df = _ticks(spark, [(0, False), (0, True), (5, False)])
    out = circuit_breaker_replay(df)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "duplicate (ts, order)" in str(ei.value)


def test_replay_property_unique_ticks_deterministic(spark):
    """Hypothesis: any unique-ts tick sequence replays without tripping
    the guard, admitted/tripped stay consistent with the state machine's
    invariants, and an injected duplicate always trips it."""
    import pytest
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.booleans(), min_size=1, max_size=12),
           st.integers(0, 11))
    def check(oks, dup_at):
        rows = [(i * 7, ok) for i, ok in enumerate(oks)]
        out = _replay(spark, rows, n=2, timeout=15.0)
        # invariants: a skipped tick is observed in 'open' and never trips;
        # a trip only happens on an admitted failing tick
        for (admitted, before, tripped), (_, ok) in zip(out, rows):
            if not admitted:
                assert before == "open" and not tripped
            if tripped:
                assert admitted and not ok
        # duplicate injection → loud error
        i = dup_at % len(rows)
        bad = circuit_breaker_replay(
            _ticks(spark, rows + [rows[i]]), consecutive_failures=2,
            timeout_s=15.0,
        )
        with pytest.raises(Exception):
            bad.collect()

    check()
