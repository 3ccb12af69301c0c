"""Driver-local DataFrame construction that doesn't tax the write path.

``spark.createDataFrame(list, schema)`` parallelizes the list into
``defaultParallelism`` slices; every downstream task that touches the
frame then pays one Python-worker round PER SLICE — measured 4.7 s to
write a 300-row frame through ``coalesce(1)`` on local[32], vs 0.2 s
with a single slice. Broadcast collects of such frames pay the same tax
32 ways in parallel. Every bounded driver-side relation in this engine
(config dims, probe tables, collected results shipping back) should go
through :func:`local_frame`, which slices by ROW COUNT instead: one
slice for anything broadcast-sized, scaling up only when a single slice
would serialize six-figure row counts through one Python worker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# one Python worker comfortably pickles ~100k small rows per slice; the
# threshold only matters for the rare large driver-side relation (e.g.
# the CC broadcast fast path's label list, capped at 1M)
ROWS_PER_SLICE = 100_000


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with row-count-aware
    slicing (see module docstring). ``rows`` is a list; ``schema`` is a
    DDL string or StructType."""
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        # parallelize([]) yields an RDD createDataFrame can't type — the
        # plain path handles the empty case fine (no slices to tax)
        return spark.createDataFrame([], schema)
    slices = max(1, len(rows) // ROWS_PER_SLICE)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )
