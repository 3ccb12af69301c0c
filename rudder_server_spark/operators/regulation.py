"""Regulation worker: right-to-be-forgotten APPLY (reference
regulation-worker/, enterprise/suppress-user/).

The reference's regulation worker receives suppress-with-delete jobs and
physically deletes the cohort's rows from every destination/warehouse
table (regulation-worker/internal/delete/), retrying idempotently until
the destination confirms. q53 audits what such a sweep WOULD purge; this
module actually purges: anti-join each table against the suppression
cohort and publish the result through the atomic pointer-swap commit
(sources/load_commit.py), so

- readers never see a half-deleted table (the pointer flips once per
  table, after the purged snapshot is fully written);
- a re-run of the same regulation id is a NO-OP per table (the commit
  log refuses the duplicate upload id) — the regulation worker's retry
  loop lands exactly once, like its jobsdb-transactional deletes.

Scale shape: the cohort is bounded (a regulation batch is thousands of
users, not billions) so the anti-join broadcasts; each table rewrite is
one scan + one write, no shuffle. At 100 TB on Delta the same plan is
``MERGE/DELETE WHERE user_id IN cohort`` with the txn log in place of the
pointer file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def purge_cohort(df: DataFrame, cohort: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Rows of ``df`` surviving the deletion: broadcast anti-join against
    the (bounded) suppression cohort. NULL-user rows are retained — the
    reference only deletes identified users (suppress-user model)."""
    return df.join(
        F.broadcast(cohort.select(F.col(user_col)).distinct()),
        on=user_col,
        how="left_anti",
    )


def apply_regulation_delete(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    cohort: DataFrame,
    table_root: str,
    regulation_id: str,
    user_col: str = "user_id",
) -> dict[str, bool]:
    """Purge the cohort from every table and commit atomically.

    Returns ``{table_name: committed}`` — False means this regulation id
    already ran for that table (idempotent retry, nothing rewritten).
    Each table commits independently, so a crash mid-sweep leaves the
    completed tables purged and the rest untouched; the retry finishes
    the remainder without double-applying.
    """
    out: dict[str, bool] = {}
    from rudder_server_spark.sources.load_commit import commit_overwrite

    for name, df in tables.items():
        purged = purge_cohort(df, cohort, user_col)
        out[name] = commit_overwrite(
            purged,
            os.path.join(table_root, name),
            f"regulation-{regulation_id}",
        )
    return out


def read_purged_tables(
    spark: SparkSession, table_root: str, names
) -> dict[str, DataFrame]:
    """Resolve each table's live (post-commit) snapshot."""
    from rudder_server_spark.sources.load_commit import read_table

    return {n: read_table(spark, os.path.join(table_root, n)) for n in names}
