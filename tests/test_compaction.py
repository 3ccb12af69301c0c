"""jobsdb compaction replay (q108 operator) — eligibility, pairing,
copy-forward and idempotence pins against jobsdb/jobsdb_compaction.go
semantics (checkIfCompactDS / getCompactionList / copyJobsInTx /
copyJobStatusesInTx, single-consumer flavor)."""

import pyspark.sql.functions as F

from rudder_server_spark.sources.jobsdb import compaction_replay


def _frames(spark, spec):
    """spec: list of (ds, n_jobs, n_terminal, n_failed) — terminal jobs get
    a retry row + a terminal row; failed jobs one non-terminal row; the
    rest no status at all. Job ids are globally unique."""
    jobs, statuses = [], []
    next_id = 0
    for ds, n, n_term, n_fail in spec:
        for i in range(n):
            jid = next_id
            next_id += 1
            jobs.append((ds, jid))
            if i < n_term:
                statuses.append((ds, jid, jid * 10, "failed"))
                statuses.append((ds, jid, jid * 10 + 1, "succeeded"))
            elif i < n_term + n_fail:
                statuses.append((ds, jid, jid * 10, "failed"))
    j = spark.createDataFrame(jobs, "ds_index int, job_id long")
    s = spark.createDataFrame(
        statuses, "ds_index int, job_id long, status_id long, job_state string"
    )
    return j, s


def _pending_ids(jobs, statuses):
    from rudder_server_spark.sources.jobsdb import latest_status

    last = latest_status(statuses, job_id="job_id", seq="status_id")
    out = (
        jobs.join(last.select("job_id", "job_state"), ["job_id"], "left")
        .where(
            F.col("job_state").isNull()
            | ~F.col("job_state").isin("succeeded", "aborted", "migrated", "filtered")
        )
        .select("job_id")
    )
    return {r.job_id for r in out.collect()}


def test_copy_forward_preserves_pending_and_drops_terminal(spark):
    # ds0 all-terminal (compact alone), ds1+ds2 small-pending (pair),
    # ds3 big-pending (ineligible -> scan stops), ds4 last (exempt)
    j, s = _frames(
        spark,
        [(0, 40, 40, 0), (1, 40, 36, 4), (2, 40, 34, 6), (3, 40, 5, 35), (4, 40, 0, 0)],
    )
    before = _pending_ids(j, s)
    jo, so, report = compaction_replay(
        j, s, max_ds_size=100, pair_threshold=0.15, max_compact_once=6
    )
    assert report["sources"] == [0, 1, 2]
    assert report["dest"] == "0_c"
    assert report["pending_copied"] == 10
    # pending set preserved exactly; terminal jobs of compacted sources gone
    after = _pending_ids(
        jo.select(F.col("ds_label").cast("int").alias("ds_index"), "job_id"),
        so.select("job_id", "status_id", "job_state"),
    )
    assert after == before
    labels = {r.ds_label for r in jo.select("ds_label").distinct().collect()}
    assert labels == {"0_c", "3", "4"}
    # the destination carries ONLY pending jobs, each with at most its
    # latest (non-terminal) status row
    dest_j = jo.where(F.col("ds_label") == "0_c")
    assert dest_j.count() == 10
    dest_s = so.where(F.col("ds_label") == "0_c")
    assert dest_s.count() == 10  # the 4+6 lone 'failed' rows
    assert dest_s.where(F.col("job_state") != "failed").count() == 0


def test_idempotent_rerun(spark):
    j, s = _frames(
        spark,
        [(0, 40, 40, 0), (1, 40, 36, 4), (2, 40, 34, 6), (3, 40, 5, 35), (4, 40, 0, 0)],
    )
    before = _pending_ids(j, s)
    jo, so, _ = compaction_replay(
        j, s, max_ds_size=100, pair_threshold=0.15, max_compact_once=6
    )
    # re-run over the output (relabel ds_label back to an orderable int
    # domain: dest sorts first, like the reference's inserted-before index)
    relabel = F.when(F.col("ds_label") == "0_c", -1).otherwise(
        F.col("ds_label").cast("int")
    )
    j2 = jo.select(relabel.alias("ds_index"), "job_id")
    s2 = so.select(relabel.alias("ds_index"), "job_id", "status_id", "job_state")
    jo2, so2, _ = compaction_replay(
        j2, s2, max_ds_size=100, pair_threshold=0.15, max_compact_once=6
    )
    after = _pending_ids(
        jo2.select("job_id"), so2.select("job_id", "status_id", "job_state")
    )
    assert after == before  # no pending job lost or duplicated, ever
    assert jo2.groupBy("job_id").count().where("count > 1").count() == 0


def test_async_drop_when_nothing_pending(spark):
    # every selected dataset fully terminal -> drop, no destination
    j, s = _frames(spark, [(0, 30, 30, 0), (1, 30, 0, 30), (2, 30, 0, 0)])
    jo, _so, report = compaction_replay(
        j, s, max_ds_size=100, pair_threshold=0.15, max_compact_once=6
    )
    assert report["sources"] == [0] and report["dest"] is None
    labels = {r.ds_label for r in jo.select("ds_label").distinct().collect()}
    assert labels == {"1", "2"}


def test_waiting_pair_cleared_by_ineligible_neighbour(spark):
    # ds0 needs a pair but ds1 is ineligible -> waiting cleared, nothing
    # compacts (getCompactionList: waiting = nil on a non-compact ds)
    j, s = _frames(spark, [(0, 30, 25, 5), (1, 30, 0, 30), (2, 30, 0, 0)])
    _jo, _so, report = compaction_replay(
        j, s, max_ds_size=100, pair_threshold=0.25, max_compact_once=6
    )
    assert report["sources"] == []


def test_last_dataset_exempt(spark):
    # a single dataset (the write head) is never compacted
    j, s = _frames(spark, [(0, 30, 30, 0)])
    _jo, _so, report = compaction_replay(j, s, max_ds_size=100)
    assert report["sources"] == []


def test_seq_column_threads_through_pending_copy(spark):
    """ADVICE r9 #1: a caller whose status-sequence column is named ``id``
    (the reference's jobsdb column) must get the SAME latest-status
    ordering in the pending-jobs copy as in the copied-status pick —
    before the fix unprocessed_jobs hardcoded seq='status_id' and this
    raised AnalysisException (or silently used the wrong column when
    both existed)."""
    j, s = _frames(spark, [(0, 40, 36, 4), (1, 40, 34, 6), (2, 40, 0, 0)])
    s_id = s.withColumnRenamed("status_id", "id")
    jo, so, report = compaction_replay(
        j, s_id, max_ds_size=100, pair_threshold=0.15, max_compact_once=6,
        seq="id",
    )
    assert report["sources"] == [0, 1]
    assert report["pending_copied"] == 10
    # same pending multiset survives, under the renamed seq column
    before = _pending_ids(j, s)
    after = _pending_ids(jo, so.withColumnRenamed("id", "status_id"))
    assert after == before
