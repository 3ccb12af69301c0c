"""Range-clustered parquet layout: the sort-based twin of bucketing.

Bucketing (sources/bucketed.py) co-locates JOIN keys; range clustering
co-locates SCAN predicates: `repartitionByRange(cluster_cols)` +
`sortWithinPartitions` writes files whose per-file and per-row-group
min/max footer stats are disjoint along the cluster columns, so a
predicate on those columns prunes whole files/row groups before any IO —
the Spark-native form of the reference's dataset range pruning (jobsdb
picks datasets by job_id range before scanning, jobsdb_get.go:343-675)
and the single biggest scan lever at 100 TB for time-ranged queries
(retention q35, reporting windows, incremental loads).

The rudder_events fixture applies the same idea statically (clustered by
event_type, sources/rudder_events.py:158); this helper is the general
write path. Keep row groups small enough that a row group is a meaningful
pruning unit (default 16 MB) but large enough for vectorized reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str] | tuple,
    n_files: int = 8,
    row_group_mb: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``:
    ``n_files`` range partitions (disjoint key ranges per file), rows
    sorted within each, row groups capped at ``row_group_mb``.

    ``n_files`` is a capacity decision exactly like bucket count: size so
    one file's hot columns fit a scan task (compact_datasets sizes by
    bytes; here the caller picks the split count because range boundaries
    are data-dependent).
    """
    cols = list(cluster_cols)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .option("parquet.block.size", row_group_mb * 1024 * 1024)
        .parquet(path)
    )


def zorder_key(cols: list, bits: int = 16) -> "Column":
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    integer column — the multi-dimensional locality curve behind Delta's
    OPTIMIZE ZORDER BY and the lakehouse answer to "range clustering can
    only serve ONE predicate column well". Sorting by the interleaved key
    gives every participating column partial locality, so min/max footer
    stats prune row groups for predicates on ANY of the dimensions (a
    lexicographic sort prunes only the leading column; the trailing ones
    span the full domain in every row group).

    One generated SQL expression (shiftright/and/shiftleft over BIGINT,
    ``bits x n_cols`` small terms — codegen'd, far under the 64 KB method
    budget), deterministic and engine-portable: the same bit math runs in
    DuckDB for the oracle. Columns must be non-negative integers that fit
    ``bits`` bits — rank/bucket continuous values first (ntile or
    fixed-width buckets), which is also what bounds skew on the curve.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    terms = [
        f"shiftleft(shiftright(CAST({c} AS BIGINT), {i}) & 1, {i * n + (n - 1 - j)})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return F.expr("(" + " | ".join(terms) + ")")


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list,
    bits: int = 16,
    n_files: int = 8,
    row_group_mb: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` parquet Z-ordered on ``zorder_cols``: range-partition
    + sort by the Morton key so row-group min/max stats are selective on
    EVERY participating column, then drop the key (sort order survives
    the projection). Same capacity knobs as write_clustered."""
    zk = zorder_key(list(zorder_cols), bits)
    (
        df.withColumn("_zk", zk)
        .repartitionByRange(n_files, "_zk")
        .sortWithinPartitions("_zk")
        .drop("_zk")
        .write.mode(mode)
        .option("parquet.block.size", row_group_mb * 1024 * 1024)
        .parquet(path)
    )
