"""KV-store custom destinations (Redis): event → key/field/value relation.

The reference's router/customdestinationmanager routes KV destinations
(loadConfig: KVStoreDestinations = ["REDIS"]) through
services/kvstoremanager: per event, ``send`` picks one of three write
modes (customdestinationmanager.go:136-148):

  1. ``ShouldSendDataAsJSON`` — gated on destination config
     ``useJSONModule`` (redis/redis.go:253-261): ``SendDataAsJSON``
     (redis.go:238-248) issues ``JSONSet(message.key, path, value)`` where
     key/path/value come straight off the document
     (extractJSONSetArgs, redis.go:226-236) — modeled here as op='SETJSON'
     rows ``(key=message.key, field=message.path, value=message.value)``.
     The reference's merge strategy (setArgsForMergeStrategy,
     redis.go:185-218: JSONGet the existing doc, nest the value under path
     with sjson, RFC-7386 merge-patch, JSONSet(key, "$", merged)) is
     stateful against the live Redis value, so it belongs to the writer
     seam, not the relation — ``send_kv``'s injectable writer receives the
     per-event JSONSet args and applies the merge at delivery time. This
     simplification is deliberate and documented here.
  2. HSET-compatible events — ``message.hash``, ``message.key``,
     ``message.value`` all PRESENT (IsHSETCompatibleEvent,
     kvstoremanager.go:64-72, uses gjson Exists(): an explicit JSON null
     counts as present and extracts as "" via .String()):
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
    ``key``, ``field`` (for SETJSON: the JSONPath ``message.path``, NULL =
    root insert), ``value``. HMSET events fan out one row per entry of
    ``message.fields``; events with no usable key produce op=NULL rows
    with ``error`` set (the reference's kv manager errors them at send
    time).
    """
    cfg = dest_config or {}
    j = F.col(json_data_col)
    g = lambda p: F.get_json_object(j, f"$.{p}")  # noqa: E731
    nonempty = lambda c: F.when(c.isNotNull() & (c != ""), c)  # noqa: E731

    if cfg.get("useJSONModule"):
        # SendDataAsJSON args (extractJSONSetArgs, redis.go:226-236);
        # the writer applies the merge strategy — see module docstring.
        row = F.array(
            F.struct(
                F.lit("SETJSON").alias("op"),
                g("message.key").alias("key"),
                nonempty(g("message.path")).alias("field"),
                g("message.value").alias("value"),
            )
        )
        shaped = df.select("*", F.inline(row))
        return shaped.withColumn(
            "error",
            F.when(nonempty(F.col("key")).isNull(), F.lit("key is required")),
        )

    # ONE parse of the routed document pulls the message subtree; ONE
    # json_tuple over it pulls all four members (container values keep
    # their raw source text — gjson parity), and json_object_keys re-reads
    # only the small subtree. The r8 shape ran get_json_object per path
    # (~6 full-document parses per row, the biggest q92 cost).
    df = df.select(
        "*", F.get_json_object(j, "$.message").alias("_kv_msg")
    ).select(
        "*",
        F.json_tuple(F.col("_kv_msg"), "hash", "key", "value", "fields").alias(
            "_kv_hash", "_kv_key", "_kv_value", "_kv_fields"
        ),
    )
    # IsHSETCompatibleEvent uses gjson Exists() — presence, not non-null:
    # message.value:null must still route to HSET (extracted as "" by
    # .String()). json_tuple can't distinguish null from absent, so test
    # key membership on the message object itself (ONE subtree parse via
    # array_intersect instead of three array_contains probes).
    msg_keys = F.json_object_keys(F.col("_kv_msg"))
    hset_ok = (
        F.size(
            F.array_intersect(
                msg_keys, F.array(F.lit("hash"), F.lit("key"), F.lit("value"))
            )
        )
        == 3
    )
    # gjson .String() of an explicit null is "" (ExtractHashKeyValueFromEvent)
    gs = lambda c: F.coalesce(c, F.lit(""))  # noqa: E731
    # EventToKeyValue keeps only STRING field values (result[k] = v.Str —
    # gjson's .Str is "" for numbers/bools/null/containers). A plain
    # map<string,string> parse would coerce 25 → "25", so parse as
    # map<string,variant> and gate on the raw JSON token: only values
    # whose serialized form is a string literal keep their content.
    #
    # Everything the output needs rides INSIDE the generator's element
    # structs; the heavy variant→string conversion happens AFTER the
    # explode. Two failure modes bracketed this shape: to_json inside a
    # transform() lambda runs interpreted per element (~10x, the
    # bqstream_shape lesson), and narrow helper columns computed beside
    # the explode get pushed ABOVE the Generate by column pruning, where
    # they re-parse json_data once per exploded row per column (~5x,
    # measured on this operator). A unified element struct avoids both:
    # nothing but generator output crosses the Generate.
    fields_map = F.from_json(F.col("_kv_fields"), "map<string,variant>")
    nullv = F.lit(None).cast("variant")
    hset_el = F.array(
        F.struct(
            F.lit("HSET").alias("op"),
            gs(F.col("_kv_hash")).alias("key"),
            gs(F.col("_kv_key")).alias("field"),
            gs(F.col("_kv_value")).alias("sval"),
            nullv.alias("fv"),
        )
    )
    mk = F.col("_kv_key")
    hmset_els = F.transform(
        F.map_entries(fields_map),
        lambda e: F.struct(
            F.lit("HMSET").alias("op"),
            mk.alias("key"),
            e["key"].alias("field"),
            F.lit(None).cast("string").alias("sval"),
            e["value"].alias("fv"),
        ),
    )
    pre = df.select(
        "*",
        F.explode_outer(
            F.when(hset_ok, hset_el).otherwise(hmset_els)
        ).alias("_el"),
    )
    raw = F.to_json(F.col("_el.fv"))
    sval = F.when(
        raw.startswith('"'), F.variant_get(F.col("_el.fv"), "$", "string")
    ).otherwise(F.lit(""))
    helper_cols = ("_el", "_kv_msg", "_kv_hash", "_kv_key", "_kv_value", "_kv_fields")
    shaped = pre.select(
        *[c for c in pre.columns if c not in helper_cols],
        F.col("_el.op").alias("op"),
        F.col("_el.key").alias("key"),
        F.col("_el.field").alias("field"),
        F.when(F.col("_el.op") == "HSET", F.col("_el.sval"))
        .when(F.col("_el.op").isNotNull(), sval)
        .alias("value"),
    )
    # An HSET row keeps an empty key (explicit null hash extracts to "" and
    # Redis accepts "" as a key name — the reference would write it); only
    # op-less events and key-less HMSETs are errored.
    return shaped.withColumn(
        "error",
        F.when(
            F.col("op").isNull()
            | ((F.col("op") != "HSET") & nonempty(F.col("key")).isNull()),
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
