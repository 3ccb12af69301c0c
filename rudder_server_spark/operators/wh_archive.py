"""Warehouse upload archiver — warehouse/archive/archiver.go.

Post-upload bookkeeping hygiene, distinct from the jobsdb archiver (S10):
once an upload has been exported for N days, its staging-file and
load-file METADATA rows are dumped to backup storage and deleted from the
hot tables, and the upload's metadata gains
``archivedStagingAndLoadFiles: true`` so the sweep is idempotent
(archiver.go:224-447). A second, longer retention deletes the upload rows
themselves (Delete/deleteUploads, archiver.go:539-586).

Spark-first: the reference loops upload-by-upload in SQL transactions
because Postgres is its bottleneck; here each sweep is ONE set-oriented
pass — an eligibility filter on the bounded uploads table (broadcast), an
anti/semi-join split of staging/load rows, a partitioned dump write
(sorted by id within partitions, mirroring the reference's ORDER BY id
paginated dump, archiver.go:148-160), and a metadata flag update. Atomic
re-pointing of the hot tables is load_commit's pointer-swap (S7 seam);
re-running the sweep is a no-op because flagged uploads fail eligibility.

Scale: uploads/staging/load-file tables are metadata relations (one row
per FILE, not per event) — at 100 TB of event data these are millions of
rows, not billions; the joins broadcast the selected-uploads side and the
dump write is a partitioned columnar append.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, functions as F

EXPORTED = "exported_data"  # model.ExportedData


def _eligible(
    uploads: DataFrame,
    now: datetime.datetime,
    days: int,
    skip_workspaces=(),
    require_unarchived: bool = True,
) -> DataFrame:
    """The archival eligibility predicate (archiver.go:224-287): exported
    N+ days ago, not yet flagged, workspace not degraded (empty workspace
    ids are always skipped as the reference's safety measure)."""
    cutoff = now - datetime.timedelta(days=days)
    cond = (
        (F.col("status") == EXPORTED)
        & (F.col("created_at") < F.lit(cutoff))
        & (F.col("workspace_id") != "")
        & ~F.col("workspace_id").isin(*(list(skip_workspaces) or [""]))
    )
    if require_unarchived:
        # metadata ->> 'archivedStagingAndLoadFiles' IS DISTINCT FROM true
        flag = F.get_json_object(F.col("metadata"), "$.archivedStagingAndLoadFiles")
        cond = cond & (flag.isNull() | (flag != "true"))
    return uploads.where(cond)


def archive_uploads(
    uploads: DataFrame,
    staging_files: DataFrame,
    load_files: DataFrame,
    now: datetime.datetime,
    days: int = 30,
    skip_workspaces=(),
    dump_dir: str | None = None,
) -> dict:
    """One set-oriented sweep of archiveUploads (archiver.go:259-447).

    Returns frames keyed:
      - ``selected``  — the eligible uploads;
      - ``dump``      — staging rows to back up (partition by upload_id);
      - ``staging``   — staging table after deletion;
      - ``load``      — load-file table after deletion;
      - ``uploads``   — uploads with the archived flag spliced into
                        metadata for the selected rows;
      - ``stats``     — per-upload archived staging/load counts (the
                        numArchivedUploads accounting, archiver.go:440-444).

    When ``dump_dir`` is set the dump is also written as parquet
    partitioned by upload_id, rows sorted by id within partitions.
    """
    sel = _eligible(uploads, now, days, skip_workspaces)
    keys = F.broadcast(sel.select("upload_id").distinct())

    dump = staging_files.join(keys, "upload_id", "semi")
    staging_left = staging_files.join(keys, "upload_id", "anti")
    load_left = load_files.join(keys, "upload_id", "anti")

    if dump_dir is not None:
        # Dynamic partition overwrite: only the upload_id partitions present
        # in THIS sweep's dump are replaced, so a re-run whose selected set
        # is empty (flagged uploads fail eligibility) writes zero partitions
        # and leaves every prior sweep's backup intact — the set-oriented
        # analogue of the reference's per-upload append-style backups
        # (archiver.go backupRecords). Re-running the SAME sweep replaces
        # its own partitions with identical bytes (idempotent).
        (
            dump.repartition("upload_id")
            .sortWithinPartitions("id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("upload_id")
            .parquet(dump_dir)
        )

    # Splice the flag by REBUILDING the object, replacing any existing
    # archivedStagingAndLoadFiles member in place. Appending a duplicate
    # member would be wrong: Spark's get_json_object reads the FIRST
    # occurrence of a duplicated key (unlike Postgres jsonb / gjson
    # last-wins), so _eligible would keep seeing the stale value and
    # re-archive the upload every sweep while metadata grew one member per
    # run. map<string,variant> round-trips arbitrary nested JSON losslessly
    # (nested key order may normalize; readers are path-based).
    parsed = F.from_json(F.coalesce(F.col("metadata"), F.lit("{}")), "map<string,variant>")
    cleaned = F.map_filter(
        F.coalesce(parsed, F.from_json(F.lit("{}"), "map<string,variant>")),
        lambda k, _: k != F.lit("archivedStagingAndLoadFiles"),
    )
    flagged = F.to_json(
        F.map_concat(
            cleaned,
            F.create_map(
                F.lit("archivedStagingAndLoadFiles"), F.parse_json(F.lit("true"))
            ),
        )
    )
    uploads_updated = (
        uploads.join(
            F.broadcast(sel.select("upload_id", F.lit(True).alias("_arch"))),
            "upload_id",
            "left",
        )
        .withColumn("metadata", F.when(F.col("_arch"), flagged).otherwise(F.col("metadata")))
        .drop("_arch")
    )

    st = (
        staging_files.join(keys, "upload_id", "semi")
        .groupBy("upload_id")
        .agg(F.count("*").alias("archived_staging_files"))
    )
    lf = (
        load_files.join(keys, "upload_id", "semi")
        .groupBy("upload_id")
        .agg(F.count("*").alias("archived_load_files"))
    )
    stats = (
        sel.select("upload_id", "source_id", "destination_id")
        .join(st, "upload_id", "left")
        .join(lf, "upload_id", "left")
        .fillna(0, ["archived_staging_files", "archived_load_files"])
    )
    return {
        "selected": sel,
        "dump": dump,
        "staging": staging_left,
        "load": load_left,
        "uploads": uploads_updated,
        "stats": stats,
    }


def expire_uploads(
    uploads: DataFrame,
    now: datetime.datetime,
    retention_days: int = 90,
    skip_workspaces=(),
) -> DataFrame:
    """deleteUploads (archiver.go:556-586): exported uploads past the
    longer retention are deleted outright; returns the surviving table.
    The archived-flag check does NOT apply here (the reference deletes on
    age+status alone)."""
    doomed = _eligible(
        uploads, now, retention_days, skip_workspaces, require_unarchived=False
    )
    return uploads.join(
        F.broadcast(doomed.select("upload_id").distinct()), "upload_id", "anti"
    )
