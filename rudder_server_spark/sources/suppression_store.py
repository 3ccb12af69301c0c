"""Suppression store: sync-stream fold, snapshot export, restore.

The reference syncs suppression regulations from the config backend into a
local badger repository (enterprise/suppress-user/syncer.go:126-152: page
through updates, ``Add(suppressions, nextToken)``) where each update is
``{workspaceId, userId, sourceIds[], canceled, createdAt}``
(model/model.go:16-22) — ``canceled=true`` revokes the suppression, a
later update for the same (workspace, user) replaces the earlier one, and
an empty ``sourceIds`` means all sources. The standalone
suppression-backup-service (exporter/exporter.go:50-80) snapshots the
folded repository to a file so new pods restore instead of re-paging the
full history.

Spark-first: the repository IS a fold — latest update per (workspace,
user) wins — so ``fold_suppressions`` is one max_by aggregation on the
(workspace, user) key; the export is a partitioned parquet snapshot plus
the sync token (max created_at — the reference's page token is likewise a
position in the update stream); restore is a parquet read. Incremental
sync (``Add``) is the SAME fold over (state ∪ new page), and folding is
idempotent/associative, so replaying any suffix of the stream converges —
the property the reference gets from badger upserts.

The folded frame feeds F2 (operators/filters.suppress) as its suppression
list: explode ``source_ids`` for per-source suppressions, NULL = wildcard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TOKEN_FILE = "_sync_token"


def fold_suppressions(updates: DataFrame) -> DataFrame:
    """Fold a suppression update stream into current repository state.

    Input columns: workspace_id, user_id, source_ids (array<string>,
    empty/null = all sources), canceled (boolean), created_at. Later
    updates (created_at, then canceled as tiebreak — a cancel and a
    re-add in the same instant resolves to canceled, the conservative
    read) replace earlier ones per (workspace, user); canceled entries
    drop out of the active state.
    """
    ordered = F.struct(
        F.col("created_at").alias("t"),
        F.col("canceled").alias("c"),
        F.col("source_ids").alias("s"),
    )
    latest = (
        updates.groupBy("workspace_id", "user_id")
        .agg(F.max(ordered).alias("_last"))
        .select(
            "workspace_id",
            "user_id",
            F.col("_last.s").alias("source_ids"),
            F.col("_last.t").alias("created_at"),
            F.col("_last.c").alias("canceled"),
        )
    )
    return latest.where(~F.col("canceled")).drop("canceled")


def export_suppressions(state: DataFrame, out_dir: str, token=None) -> str:
    """Snapshot the folded state (exporter.Export): parquet partitioned by
    workspace plus the sync token, atomically named like the reference's
    tmp-export rename. Returns the token written."""
    state.write.mode("overwrite").partitionBy("workspace_id").parquet(
        os.path.join(out_dir, "suppressions")
    )
    if token is None:
        row = state.agg(F.max("created_at")).head()
        token = str(row[0]) if row and row[0] is not None else ""
    tmp = os.path.join(out_dir, ".tmp-export-token")
    with open(tmp, "w") as fh:
        fh.write(str(token))
    os.replace(tmp, os.path.join(out_dir, TOKEN_FILE))
    return str(token)


def restore_suppressions(spark: SparkSession, out_dir: str):
    """Restore (state, token) from a snapshot — the new-pod bootstrap
    path that skips re-paging the full regulation history."""
    state = spark.read.parquet(os.path.join(out_dir, "suppressions"))
    token_path = os.path.join(out_dir, TOKEN_FILE)
    token = ""
    if os.path.exists(token_path):
        with open(token_path) as fh:
            token = fh.read()
    return state, token


def sync_add(state: DataFrame, page: DataFrame) -> DataFrame:
    """Apply one sync page to existing folded state (Repository.Add):
    the same fold over (state-as-updates ∪ page). State rows re-enter as
    non-canceled updates at their created_at, so a page update older than
    the stored row loses — badger-upsert parity."""
    as_updates = state.select(
        "workspace_id", "user_id", "source_ids",
        F.lit(False).alias("canceled"), "created_at",
    )
    return fold_suppressions(
        as_updates.unionByName(
            page.select(
                "workspace_id", "user_id", "source_ids", "canceled", "created_at"
            )
        )
    )
