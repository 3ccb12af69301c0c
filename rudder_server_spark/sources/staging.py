"""Staging-file scan + load-file writers + archiver sink
(reference S4/S5/S6/S10).

- S4: warehouse slave workers stream gz JSON-lines staging files into typed
  per-table rows (warehouse/slave/worker.go:246-395). Spark reads .json.gz
  transparently; the schema comes from the upload's consolidated schema.
- S5: load-file writers per destination format — CSV with sorted columns,
  JSON-lines (BigQuery), Parquet (warehouse/encoding/encoding.go:71-75).
- S6/S10: batchrouter object-storage dumps and the archiver both write
  gz JSON grouped by source (router/batchrouter/handle.go:240-497,
  archiver/archiver.go:97-197) → partitioned JSON writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_staging_files(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """S4: read gz JSON-lines staging files (schema'd when known — always
    pass one in production: schema inference is a full extra pass).

    ``corrupt_col``: PERMISSIVE corrupt-record capture — malformed JSON
    lines land with every schema column null and the raw line in
    ``corrupt_col`` instead of poisoning the batch (the gateway's
    invalid-JSON reject, gateway/handle.go request validation; split the
    result with ``split_corrupt`` to route them to a rejects table).
    Requires ``schema``; the column must be appended to it.
    """
    reader = spark.read
    if corrupt_col:
        if not schema:
            raise ValueError("corrupt_col capture requires an explicit schema")
        schema = f"{schema}, {corrupt_col} string"
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def split_corrupt(df: DataFrame, corrupt_col: str = "_corrupt_record"):
    """(good, rejects): rows whose raw line failed to parse route to the
    rejects frame with just the raw payload — the discards-table pattern
    (P7) applied at ingest. Spark requires a materialization barrier
    before filtering on the corrupt column alone; selecting the data
    columns alongside it (as callers do) avoids the restriction, and the
    cache here keeps the split to one read."""
    df = df.cache()
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    rejects = df.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_payload")
    )
    return good, rejects


def write_load_files(
    df: DataFrame,
    path: str,
    fmt: str = "csv",
    partition_by: tuple = (),
    compress: bool = True,
) -> None:
    """S5: write load files in the destination's format.

    CSV columns are emitted in sorted order — the reference sorts columns
    so COPY column lists are stable (warehouse/encoding/csvloader).
    """
    out = df
    if fmt == "csv":
        out = df.select(*sorted(df.columns))
    writer = out.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("compression", "gzip" if compress else "none").option(
            "header", True
        ).csv(path)
    elif fmt == "json":
        writer.option("compression", "gzip" if compress else "none").json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported load-file format: {fmt}")


def archive_jobs(df: DataFrame, path: str, source_col: str = "source_id") -> None:
    """S10: terminal jobs → gz JSON partitioned by source
    (archiver/archiver.go:97-197). Partitioned layout gives per-source
    pruning on replay reads."""
    df.write.mode("append").partitionBy(source_col).option("compression", "gzip").json(path)


def replay_archive(
    spark,
    path: str,
    schema: str,
    sources: list[str] | None = None,
    start: str | None = None,
    end: str | None = None,
    ts_col: str = "received_at",
) -> DataFrame:
    """Replay/backfill source (enterprise replay: re-ingest archived dumps
    back through the pipeline; the archiver's partitioned layout is the
    contract). Reads the S10 archive, pruned three ways before any row is
    parsed:

    - partition pruning on ``source_id`` (the archive is partitionBy'd —
      a source list touches only those directories);
    - time-range pruning on ``[start, end)`` over ``ts_col`` — a pushed
      filter on the JSON reader's parsed column;
    - an explicit user schema, so the reader never pays inference over
      the whole archive.

    Replayed rows re-enter the normal pipeline; F1's dedup key makes
    re-delivery of rows that already landed idempotent (the reference
    replays through the gateway for the same reason). Returns the pruned
    envelope frame.
    """
    df = spark.read.schema(schema + ", source_id string").json(path)
    if sources:
        df = df.where(F.col("source_id").isin(list(sources)))
    if start is not None:
        df = df.where(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.where(F.col(ts_col) < F.lit(end))
    return df
