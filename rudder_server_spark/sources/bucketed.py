"""Bucketed tables: co-located, shuffle-free equi-joins.

The reference co-locates work by murmur3-partitioning jobs on UserID
(jobsdb/jobsdb.go:590-596) so that every consumer of a partition sees all
rows for its users without data movement. Spark's equivalent for STORED
data is bucketing: `bucketBy(n, keys).sortBy(keys)` writes each file
pre-hashed, and a join between two tables bucketed on the same keys with
the same bucket count executes with NO shuffle exchange on either side —
at 100 TB this removes the dominant cost of every repeated user-keyed join
(identity stitching, suppression, latest-traits).

Bucketing requires the session catalog (`saveAsTable`), which works with
the default in-memory catalog + a spark.sql.warehouse.dir; no Hive
metastore needed. Plan property pinned in tests/test_plan_quality.py:
the bucketed join plan contains zero `Exchange hashpartitioning` nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | tuple = ("user_id",),
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    Bucket count is a capacity decision: pick so that one bucket of the
    LARGEST co-bucketed table fits an executor's memory at target scale
    (the reference sizes jobsdb datasets the same way,
    jobsdb/jobsdb_config.go:66).
    """
    keys = list(keys)
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | tuple,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys.

    With matching bucket specs Spark plans a SortMergeJoin whose children
    read pre-hashed files directly — no Exchange on either side; with
    ``sortBy`` at write time the per-bucket sort is also skipped.
    """
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
