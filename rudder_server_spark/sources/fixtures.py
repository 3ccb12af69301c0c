"""Fixture table loaders (TPC-H-ish star schema + events/documents/embeddings).

Mirrors the reference's jobsdb scan surface (jobsdb/jobsdb_get.go:343-675):
a multi-dataset ordered parquet scan where Catalyst gives us for free what the
reference hand-implements — dataset range pruning = parquet min/max row-group
pruning, filter pushdown = PushedFilters, column pruning = ReadSchema.

Scale note: at 100 TB these would be partitioned parquet/Delta directories
(partitioned by date / workspace), and `load_table` would point at the table
root; partition pruning then handles the reference's "afterJobID skips whole
datasets" optimization (jobsdb/jobsdb_get.go:789-801) natively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (session-id, sf_dir, table) → DataFrame. Resolving a parquet table costs
# 60-90 ms per call (file listing + footer schema inference + two conf
# round-trips); a resident engine resolves a catalog table once and reuses
# the relation, so the loader does too. DataFrames are immutable plan
# handles — sharing one across queries is safe, and the fixture files never
# change within a session. Keyed by id(spark) so a fresh session (new JVM
# relation ids) never sees another session's plans.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ck = (id(spark), os.path.abspath(sf_dir), name)
    # the driver may hand us a vanilla session; nanosAsLong is runtime-settable
    # and required to read the fixtures' TIMESTAMP(NANOS) columns. Session tz
    # is pinned UTC so the ns→timestamp conversion below matches the DuckDB
    # oracle regardless of host timezone. Re-asserted even on cache hits:
    # cached plans EXECUTE under the session's current timezone, so a caller
    # that mutated it between calls would silently shift ts-derived results.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cached = _TABLE_CACHE.get(ck)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): read as long ns (see
    # session.py nanosAsLong) and truncate to µs — the same truncation
    # DuckDB applies, keeping oracle parity.
    for colname, dtype in df.dtypes:
        if colname == "ts" and dtype == "bigint":
            df = df.withColumn(colname, F.expr(f"timestamp_micros({colname} div 1000)"))
    _TABLE_CACHE[ck] = df
    return df


def fan_out(
    df: DataFrame, spark: SparkSession, paths: list[str] | None = None
) -> DataFrame:
    """Repartition to cluster width ONLY when the scan is actually narrow.

    Per-row-heavy plans (CSV renders, validation ladders, shape audits)
    over a SINGLE small parquet file would otherwise run on 1-3 tasks
    under a vanilla session's 128 MB split size while the other cores
    idle; on a real multi-file/TB-scale input an unconditional
    repartition is a pure extra full shuffle of the corpus (flagged in
    round-8 review as fixture-tuned).

    The gate must count ROW GROUPS, not split partitions: Spark assigns
    a parquet row group to the one split covering its midpoint, so a
    64k-row-group file under the tuned session's 1 MB split size reports
    ~70 scan partitions of which only ~row-group-count carry rows
    (measured: trusting getNumPartitions alone regressed the q91/q97
    audits 1.6-3x). When ``paths`` is given, row groups come from the
    parquet footers (a metadata read); otherwise the split count is the
    only available signal and small counts still gate correctly.
    """
    want = spark.sparkContext.defaultParallelism
    if paths:
        # footer metadata only — and memoized, so repeated plan builds
        # (bench re-invokes the query fn per run) don't re-read footers
        # or pay a df.rdd plan conversion (~100-300 ms driver-side).
        # A path may be a Spark-written DIRECTORY of part files.
        effective = 0
        try:
            for p in paths:
                n = _RG_CACHE.get(p)
                if n is None:
                    import glob as _glob

                    import pyarrow.parquet as pq

                    files = (
                        sorted(_glob.glob(os.path.join(p, "*.parquet")))
                        if os.path.isdir(p)
                        else [p]
                    )
                    n = _RG_CACHE[p] = sum(
                        pq.ParquetFile(f).num_row_groups for f in files
                    )
                effective += n
        except Exception:
            effective = df.rdd.getNumPartitions()
    else:
        effective = df.rdd.getNumPartitions()
    # full cluster width, not half: these plans are per-row compute-bound,
    # so 17 effective partitions on 32 cores measurably idles half the
    # machine (unlike shuffle-bound plans where AQE coalescing evens out)
    if effective >= want:
        return df
    return df.repartition(want)


_RG_CACHE: dict[str, int] = {}


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each fixture table as a temp view so plans can use spark.sql."""
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
