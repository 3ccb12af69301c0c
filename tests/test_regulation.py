"""Regulation deletion APPLY — purge + atomic commit + idempotent retry
(regulation-worker/ semantics over the load_commit pointer-swap)."""

from pyspark.sql import functions as F

from rudder_server_spark.operators.regulation import (
    apply_regulation_delete,
    purge_cohort,
    read_purged_tables,
)


def _table(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_id long")


def _cohort(spark, users):
    return spark.createDataFrame([(u,) for u in users], "user_id long")


def test_purge_drops_cohort_and_keeps_null_users(spark):
    df = _table(spark, [(1, 10), (2, 20), (None, 30), (1, 11)])
    kept = purge_cohort(df, _cohort(spark, [1])).collect()
    assert {r["event_id"] for r in kept} == {20, 30}


def test_apply_commits_and_rerun_is_noop(spark, tmp_path):
    root = str(tmp_path / "wh")
    tables = {
        "a": _table(spark, [(1, 10), (2, 20)]),
        "b": _table(spark, [(1, 11), (3, 31)]),
    }
    cohort = _cohort(spark, [1])
    first = apply_regulation_delete(spark, tables, cohort, root, "r1")
    assert first == {"a": True, "b": True}
    # the committed snapshots are purged
    live = read_purged_tables(spark, root, tables)
    assert {r["event_id"] for r in live["a"].collect()} == {20}
    assert {r["event_id"] for r in live["b"].collect()} == {31}
    # retry of the same regulation id: refused per table, data unchanged
    second = apply_regulation_delete(spark, tables, cohort, root, "r1")
    assert second == {"a": False, "b": False}
    assert {r["event_id"] for r in read_purged_tables(spark, root, tables)["a"].collect()} == {20}


def test_later_regulation_composes_on_prior_commit(spark, tmp_path):
    root = str(tmp_path / "wh")
    tables = {"a": _table(spark, [(1, 10), (2, 20), (3, 30)])}
    apply_regulation_delete(spark, tables, _cohort(spark, [1]), root, "r1")
    # second regulation applies to the LIVE snapshot: the caller reads the
    # committed table and purges the next cohort from it
    live = read_purged_tables(spark, root, tables)
    out = apply_regulation_delete(spark, live, _cohort(spark, [2]), root, "r2")
    assert out == {"a": True}
    final = read_purged_tables(spark, root, tables)["a"].collect()
    assert {r["event_id"] for r in final} == {30}


def test_purge_plan_broadcasts_the_cohort(spark):
    df = _table(spark, [(i, i) for i in range(50)])
    plan = purge_cohort(df, _cohort(spark, [1, 2]))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_crash_mid_sweep_retry_completes_remainder(spark, tmp_path, monkeypatch):
    """A crash between tables leaves completed tables purged and the rest
    untouched; the retry finishes ONLY the remainder (no double-apply)."""
    import rudder_server_spark.operators.regulation as R
    from rudder_server_spark.sources import load_commit

    root = str(tmp_path / "wh")
    tables = {
        "a": _table(spark, [(1, 10), (2, 20)]),
        "b": _table(spark, [(1, 11), (3, 31)]),
    }
    cohort = _cohort(spark, [1])

    real_commit = load_commit.commit_overwrite
    calls = {"n": 0}

    def crashing_commit(df, table_dir, upload_id):
        calls["n"] += 1
        if calls["n"] == 2:  # crash after table 'a' commits, before 'b'
            raise RuntimeError("simulated crash")
        return real_commit(df, table_dir, upload_id)

    monkeypatch.setattr(
        "rudder_server_spark.sources.load_commit.commit_overwrite", crashing_commit
    )
    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        R.apply_regulation_delete(spark, tables, cohort, root, "r1")
    # table a purged and committed; table b has no committed version yet
    assert {r["event_id"] for r in R.read_purged_tables(spark, root, ["a"])["a"].collect()} == {20}
    assert R.read_purged_tables(spark, root, ["b"])["b"] is None

    monkeypatch.setattr(
        "rudder_server_spark.sources.load_commit.commit_overwrite", real_commit
    )
    retry = R.apply_regulation_delete(spark, tables, cohort, root, "r1")
    # a refuses the duplicate id; b completes now
    assert retry == {"a": False, "b": True}
    assert {r["event_id"] for r in R.read_purged_tables(spark, root, ["b"])["b"].collect()} == {31}
