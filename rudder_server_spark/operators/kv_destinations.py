"""KV-store custom destinations (Redis): event → key/field/value relation.

The reference's router/customdestinationmanager routes KV destinations
(loadConfig: KVStoreDestinations = ["REDIS"]) through
services/kvstoremanager: per event, ``send`` picks one of three write
modes (customdestinationmanager.go:136-148):

  1. ``ShouldSendDataAsJSON`` (config ``shouldSendDataAsJson``): the whole
     jsonData document is SET as JSON under a configured key prefix —
     modeled here as op='SETJSON' with value = message JSON;
  2. HSET-compatible events — ``message.hash``, ``message.key``,
     ``message.value`` all present (kvstoremanager.go:63-79):
     ``HSET(hash, key, value)``;
  3. default: ``EventToKeyValue`` (kvstoremanager.go:52-61) —
     ``HMSET(message.key, message.fields)`` where fields is the string map
     under ``message.fields``.

Spark-first: the decision tree is a codegen'd projection and mode 3's map
explodes to one row per field, so the whole write set is ONE relational
frame ``(op, key, field, value)`` — oracle-checkable, idempotently
replayable (last-write-wins per (key, field) by job order, exactly Redis
hash semantics), and sink-agnostic. ``send_kv`` hands the frame to an
injectable writer (deployment: foreachPartition + redis pipeline — the
per-partition client seam all our delivery paths share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def redis_kv_shape(
    df: DataFrame,
    dest_config: dict | None = None,
    json_data_col: str = "json_data",
) -> DataFrame:
    """Project each routed event into its Redis write rows.

    Returns the input columns plus ``op`` ('SETJSON' | 'HSET' | 'HMSET'),
    ``key``, ``field`` (NULL for SETJSON), ``value``. HMSET events fan out
    one row per entry of ``message.fields``; events with no usable key
    produce op=NULL rows with ``error`` set (the reference's kv manager
    errors them at send time).
    """
    cfg = dest_config or {}
    j = F.col(json_data_col)
    g = lambda p: F.get_json_object(j, f"$.{p}")  # noqa: E731
    nonempty = lambda c: F.when(c.isNotNull() & (c != ""), c)  # noqa: E731

    if cfg.get("shouldSendDataAsJson"):
        prefix = str(cfg.get("prefix") or "")
        key = F.concat(F.lit(prefix), g("message.key"))
        row = F.array(
            F.struct(
                F.lit("SETJSON").alias("op"),
                key.alias("key"),
                F.lit(None).cast("string").alias("field"),
                g("message").alias("value"),
            )
        )
        shaped = df.select("*", F.inline(row))
        return shaped.withColumn(
            "error",
            F.when(nonempty(g("message.key")).isNull(), F.lit("key is required")),
        )

    hset_ok = (
        g("message.hash").isNotNull()
        & g("message.key").isNotNull()
        & g("message.value").isNotNull()
    )
    hset_rows = F.array(
        F.struct(
            F.lit("HSET").alias("op"),
            g("message.hash").alias("key"),
            g("message.key").alias("field"),
            g("message.value").alias("value"),
        )
    )
    # EventToKeyValue keeps only STRING field values (result[k] = v.Str —
    # gjson's .Str is "" for numbers/bools/null/containers). A plain
    # map<string,string> parse would coerce 25 → "25", so parse as
    # map<string,variant> and gate on the raw JSON token: only values
    # whose serialized form is a string literal keep their content.
    fields_map = F.from_json(g("message.fields"), "map<string,variant>")

    def _hmset_row(e):
        raw = F.to_json(e.getField("value"))
        sval = F.when(
            raw.startswith('"'), F.variant_get(e.getField("value"), "$", "string")
        ).otherwise(F.lit(""))
        return F.struct(
            F.lit("HMSET").alias("op"),
            g("message.key").alias("key"),
            e.getField("key").alias("field"),
            sval.alias("value"),
        )

    hmset_rows = F.transform(F.map_entries(fields_map), _hmset_row)
    rows = F.when(hset_ok, hset_rows).otherwise(F.coalesce(hmset_rows, F.array()))
    # inline_outer keeps key-less / field-less events as NULL-op rows so the
    # error column can report them (keep-with-status, like F7)
    shaped = df.select("*", F.inline_outer(rows))
    return shaped.withColumn(
        "error",
        F.when(
            F.col("op").isNull() | nonempty(F.col("key")).isNull(),
            F.lit("no hash/key/value or key/fields in event"),
        ),
    )


def send_kv(shaped: DataFrame, writer=None) -> DataFrame:
    """Hand the error-free (op, key, field, value) rows to the injectable
    KV writer; return the failed rows (same seam as publish_kafka).
    Deployment: foreachPartition with a redis pipeline per partition,
    partitionBy(key) upstream if per-key write ordering matters."""
    ok = shaped.where(F.col("error").isNull()).select("op", "key", "field", "value")
    if writer is None:
        raise NotImplementedError(
            "no Redis client in this environment; inject writer(df) "
            "(deployment: foreachPartition + redis pipeline)"
        )
    writer(ok)
    return shaped.where(F.col("error").isNotNull())


def kv_final_state(shaped: DataFrame) -> DataFrame:
    """Per-(key, field) last-write-wins view of an HSET/HMSET write set —
    what the Redis hash would hold after replaying the frame in job order
    (requires a ``job_id`` ordering column). One shuffle on (key, field);
    the max_by avoids a window sort."""
    return (
        shaped.where(F.col("error").isNull() & F.col("field").isNotNull())
        .groupBy("key", "field")
        .agg(F.expr("max_by(value, job_id)").alias("value"))
    )
