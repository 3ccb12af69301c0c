"""BQSTREAM_ALL_EVENTS async destination (router/batchrouter/
asyncdestinationmanager/bqstreamallevents/) — the Storage-Write-API
warehouse streamer, the last unmapped async-destination provider.

The reference reads the batched async file (one routed warehouse event
per line), stamps uuid_ts/loaded_at into events whose schema declares
those columns (events.go eventsFromFile:32-70, setColumnTimestamp:74-84),
groups events per target table and splits each group into append chunks
bounded by maxChunkBytes (groupAndChunkEvents:88-126 — flush-then-append,
so an oversized event still lands alone in its own chunk), derives each
table's event schema first-seen-wins (schemaFromEvents:128-138),
reconciles it against the warehouse schema (create table / add new
columns, schemautils.go findNewColumns:14-25), converts or DISCARDS
values that disagree with the warehouse column type via the
HandleSchemaChange matrix (events.go getDiscardedRecordsFromEvent:
152-199, warehouse/slave/worker.go:638-696), JSON-stringifies slice
values regardless (events.go:190-197), counts duplicate ids per chunk for
every table but users (checkForDuplicateIDsInEvents:201-219,
bqstreamallevents.go:422-430), normalizes datetime strings to epoch
micros for the TIMESTAMP proto encoding (encode.go normalizeRow:158-177)
with columns emitted in SORTED name order (encode.go toBigQuerySchema:
41-57 — proto field numbers are positional, order is correctness), and
reports outcomes PER CHUNK: acknowledged appends succeed even when a
sibling chunk of the same table fails; a failed table's jobs abort vs
retry by the grpc code of its first error (streamEventBatches:452-493,
schemautils.go shouldAbort:39-47).

Spark-first mapping (everything below is codegen except the one greedy
fold):

- ``parse_bq_lines`` — one ``from_json`` per contract subtree over the
  raw line; ``data`` is kept as ``map<string,variant>`` so every value's
  JSON type survives (the same convention as sources/kafka.py's retl
  splice), and the chunking size is the raw line byte length, the
  reference's conservative upper bound.
- ``stamp_bq_events`` — map_filter + map_concat replace-in-place (a
  duplicate-member append would be invisible to FIRST-key JSON readers);
  the size grows by len(formatted_ts) per stamped column, exactly like
  eventsFromFile's MessageDataByteSize accounting.
- ``chunk_bq_events`` — the greedy reset fold. Unlike snowpipe's
  monotone prefix cutoff (operators/snowpipe.split_insert_requests) the
  running total RESETS at each flush, so this is a true sequential fold:
  an Arrow ``applyInPandas`` per (upload, table) group, the same pattern
  as provider_uploads.sequential_accept. Scale: a group is one async
  upload file's slice of one table — bounded by the batcher's
  maxEventsInABatch / upload size caps, so group SIZE is constant and
  only group COUNT grows with the corpus.
- ``bq_event_schemas`` / ``reconcile_bq_schema`` — first-seen-wins is
  ``min_by(type, event order)`` after one bounded explode of the columns
  map; new columns are a broadcast anti-join against the warehouse
  schema dimension (tables × columns — control-plane sized).
- ``coerce_bq_events`` — the HandleSchemaChange matrix as one long-format
  projection over (warehouse type, event type, JSON-literal value):
  stringify / int↔float / json-quote branches are pure codegen on the
  variant's JSON text; incompatible pairs null the value and emit the
  discard row (skipped when the event lacks id/received_at, mirroring
  events.go:166-177). Slices JSON-stringify via their variant text.
- ``bq_encode_rows`` — normalizeRow + the sorted-column determinism pin:
  datetime strings → epoch micros, non-null fields emitted in sorted
  column-name order.
- ``bq_duplicate_id_stats`` / ``finalize_bq_jobs`` — per-chunk duplicate
  counts (users excluded) and the per-chunk job verdict join against an
  injectable append-results seam (same convention as publish_kafka /
  snowpipe's channel seam); abort-vs-retry classification uses the grpc
  code of the table's FIRST erroring chunk, which is what
  ``status.Code(errors.Join(...))`` resolves to in the reference.

Everything corpus-sized touches exactly two exchanges: the per-(upload,
table) Arrow fold and the bounded columns-map explode; schema relations
and append verdicts are broadcast dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

# whutils.ToProviderCase(BQStreamAllEvents, x) is the identity (only
# Snowflake/Snowpipe uppercase — warehouse/utils/utils.go:530-536).
ID_COLUMN = "id"
RECEIVED_AT_COLUMN = "received_at"
UUID_TS_COLUMN = "uuid_ts"
LOADED_AT_COLUMN = "loaded_at"
USERS_TABLE = "users"
DISCARDS_TABLE = "rudder_discards"

# grpc codes shouldAbort treats as terminal (schemautils.go:39-47)
ABORT_CODES = (
    "PermissionDenied",
    "Unauthenticated",
    "FailedPrecondition",
    "Unimplemented",
    "DataLoss",
)

# bytesize of one RFC3339Milli timestamp ("2006-01-02T15:04:05.000Z")
_TS_LEN = "formatted_ts_len"


def parse_bq_lines(
    df: DataFrame, line_col: str = "line", job_id_col: str | None = None
) -> DataFrame:
    """The async-file contract (types.go event struct:134-148): per line
    ``table``, ``columns`` (column → rudder type), ``data`` (values as
    variants), ``job_id``, and ``line_bytes`` — the chunker's size unit
    (events.go:55 uses the full line length as a conservative bound)."""
    line = F.col(line_col)
    out = df.withColumn(
        "table", F.get_json_object(line, "$.message.metadata.table")
    ).withColumn(
        "columns",
        F.from_json(
            F.get_json_object(line, "$.message.metadata.columns"),
            "map<string,string>",
        ),
    ).withColumn(
        "data",
        F.from_json(
            F.get_json_object(line, "$.message.data"), "map<string,variant>"
        ),
    ).withColumn("line_bytes", F.octet_length(line).cast("long"))
    if job_id_col is None:
        out = out.withColumn(
            "job_id", F.get_json_object(line, "$.metadata.job_id").cast("long")
        )
    else:
        out = out.withColumn("job_id", F.col(job_id_col).cast("long"))
    return out


def stamp_bq_events(df: DataFrame, formatted_ts: str) -> DataFrame:
    """setColumnTimestamp (events.go:74-84): uuid_ts / loaded_at are
    written into ``data`` ONLY when the event's columns map declares
    them, and each stamp grows the chunking size by the timestamp's
    length (eventsFromFile:50-60). Replace-in-place via map_filter +
    map_concat — the variant map round-trip keeps every other value's
    JSON type intact."""
    out = df
    size = F.col("line_bytes")
    for col in (UUID_TS_COLUMN, LOADED_AT_COLUMN):
        has = F.map_contains_key(F.col("columns"), F.lit(col))
        stamped = F.map_concat(
            F.map_filter(F.col("data"), lambda k, _: k != F.lit(col)),
            F.create_map(
                F.lit(col), F.parse_json(F.lit('"' + formatted_ts + '"'))
            ),
        )
        out = out.withColumn("data", F.when(has, stamped).otherwise(F.col("data")))
        size = size + F.when(has, F.lit(len(formatted_ts))).otherwise(F.lit(0))
    return out.withColumn("message_data_byte_size", size.cast("long"))


def chunk_bq_events(
    df: DataFrame,
    max_chunk_bytes: int,
    group_cols: tuple = ("table",),
    order_col: str = "job_id",
    size_col: str = "message_data_byte_size",
    out_col: str = "chunk_idx",
) -> DataFrame:
    """groupAndChunkEvents' per-table greedy split (events.go:88-126):
    scan in file order; when the running chunk total plus this event
    exceeds ``max_chunk_bytes``, FLUSH and start a new chunk — then
    append the event unconditionally (an event larger than the cap gets
    a chunk of its own; there is no oversized rejection here, unlike
    snowpipe). The reset makes the fold sequential, so it runs as one
    Arrow pass per bounded (upload, table) group."""
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )
    order = str(order_col)
    size_name = str(size_col)
    cap = int(max_chunk_bytes)
    out_name = str(out_col)

    def fold(pdf):
        # self-contained: workers may not have the repo on sys.path
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        # uniqueness contract enforced loudly: a duplicate job id makes
        # the greedy reset scan order — and so every chunk boundary —
        # nondeterministic
        if bool(pdf.duplicated(subset=[order]).any()):
            raise ValueError(
                "chunk_bq_events: duplicate order key within a group — "
                "the greedy chunk fold requires unique job ids"
            )
        chunk, cur = 0, 0
        idx = []
        for sz in pdf[size_name]:
            if cur + int(sz) > cap and cur > 0:
                chunk += 1
                cur = 0
            idx.append(chunk)
            cur += int(sz)
        pdf[out_name] = idx
        return pdf

    grouped = df.groupBy(*[F.col(c) for c in group_cols])
    return grouped.applyInPandas(fold, schema=out_schema)


def bq_event_schemas(
    df: DataFrame, group_cols: tuple = ("table",), order_col: str = "job_id"
) -> DataFrame:
    """schemaFromEvents (events.go:128-138): per table, the union of the
    events' columns maps with FIRST-seen type winning — the first event
    (in file order) that mentions a column fixes its type. One bounded
    explode (columns per event is schema-sized) + min_by."""
    exploded = df.select(
        *group_cols, F.col(order_col).alias("__ord"), F.explode("columns")
    )
    return exploded.groupBy(*group_cols, F.col("key").alias("column_name")).agg(
        F.min_by("value", "__ord").alias("column_type")
    )


def reconcile_bq_schema(
    event_schema: DataFrame,
    warehouse_schema: DataFrame,
    table_col: str = "table",
) -> tuple[DataFrame, DataFrame]:
    """createTableAndAddColumnsIfNeeded (bqstreamallevents.go:519-556) +
    findNewColumns (schemautils.go:14-25) as relations. Returns
    ``(actions, merged)``:

    - ``actions`` — one row per DDL the upload issues: ``create`` with
      the full event schema for tables absent from the warehouse,
      ``add_column`` for event columns missing from an existing table.
    - ``merged`` — the post-reconcile warehouse schema the coercion and
      encode steps read (the reference mutates its cache the same way,
      :545-549). Warehouse types WIN for columns both sides know —
      that disagreement is exactly what HandleSchemaChange coerces.

    Both inputs are control-plane dimensions (tables × columns); every
    join here broadcasts."""
    wh = F.broadcast(warehouse_schema)
    known_tables = wh.select(table_col).distinct()
    new_tables = event_schema.join(F.broadcast(known_tables), table_col, "left_anti")
    new_cols = (
        event_schema.join(F.broadcast(known_tables), table_col, "semi")
        .join(wh, [table_col, "column_name"], "left_anti")
    )
    actions = new_tables.withColumn("action", F.lit("create")).unionByName(
        new_cols.withColumn("action", F.lit("add_column"))
    )
    merged = warehouse_schema.unionByName(new_tables).unionByName(
        new_cols.select(table_col, "column_name", "column_type")
    )
    return actions, merged


def _go_v(value_json: Column) -> Column:
    """fmt.Sprintf("%v", v) over the JSON-decoded value: nil prints
    "<nil>" (the same Go wart the marketo CSV rows pin), strings print
    unquoted, bools as true/false, numbers via float64 shortest-form
    (2.0 → "2" — Go unmarshals every JSON number as float64). Arrays
    print Go-slice style "[a b c]". Out of modelled range (documented):
    scientific-notation floats (Go prints 1e+21) and nested objects
    (Go prints map[k:v]) — neither appears in flattened warehouse
    payloads."""
    is_str = value_json.startswith('"')
    is_arr = value_json.startswith("[")
    unquoted = F.try_parse_json(value_json).cast("string")
    num_trimmed = F.regexp_replace(value_json, r"^(-?\d+)\.0+$", r"$1")
    # nil elements print "<nil>" like any other Go %v nil — array_join
    # would silently DROP null elements, so coalesce each one first
    arr = F.concat(
        F.lit("["),
        F.array_join(
            F.transform(
                F.from_json(value_json, "array<variant>"),
                lambda v: F.coalesce(
                    F.when(F.to_json(v) == "null", F.lit("<nil>")).otherwise(
                        _go_v_scalar(F.to_json(v))
                    ),
                    F.lit("<nil>"),
                ),
            ),
            " ",
        ),
        F.lit("]"),
    )
    return (
        F.when(value_json.isNull() | (value_json == "null"), F.lit("<nil>"))
        .when(is_str, unquoted)
        .when(is_arr, arr)
        .otherwise(num_trimmed)
    )


def _go_v_scalar(value_json: Column) -> Column:
    return F.when(
        value_json.startswith('"'), F.try_parse_json(value_json).cast("string")
    ).otherwise(F.regexp_replace(value_json, r"^(-?\d+)\.0+$", r"$1"))


def _json_str(c: Column) -> Column:
    """JSON-encode a string column (strconv.Quote parity for payload-safe
    text) — to_json only takes containers, so encode through a 1-element
    array and strip the brackets (same helper as sources/kafka.py)."""
    arr = F.to_json(F.array(c))
    return arr.substr(F.lit(2), F.length(arr) - F.lit(2))


def coerce_bq_events(
    df: DataFrame,
    warehouse_schema: DataFrame,
    formatted_ts: str,
    table_col: str = "table",
) -> tuple[DataFrame, DataFrame]:
    """getDiscardedRecordsFromEvent (events.go:152-199) over the long
    format: one row per (event, declared column), coerced per the
    HandleSchemaChange matrix (worker.go:638-696) when the event type
    disagrees with the warehouse type:

    - warehouse string/text ← anything non-(string|text|json): %v
      stringify; string/text/json pass through;
    - warehouse float ← int/bigint: numeric widens;
    - warehouse int/bigint ← float: truncates toward zero (Go int());
    - warehouse json ← int/float/boolean: %v string; ← slices: pass;
      ← anything else: strconv.Quote(%v);
    - every other pair: value NULLED + a discard row, unless the event
      lacks id/received_at (then only nulled, events.go:166-177).

    The matrix is applied to MISSING data values too — Go passes the
    interface nil through it, so e.g. warehouse string ← event int with
    no value writes the literal "<nil>" string (the same %v wart the
    marketo CSV rows pin).

    After the matrix, SLICE values JSON-stringify regardless of type
    agreement (events.go:190-197) — the variant's JSON text is already
    that marshalling. Both loops iterate the event's declared COLUMNS
    map, so data keys outside it are untouched here (they surface in
    ``bq_encode_rows`` as unknown-column errors, encode.go:86-88): the
    long format explodes the union of declared columns and data keys,
    with the matrix gated on the declared type being present.

    Returns ``(values, discards)``: ``values`` is the long relation
    (passthrough cols, column_name, event_type, value_json) feeding
    ``bq_encode_rows``; ``discards`` matches
    convertDiscardedEventsToRows' Row shape (events.go:221-234)."""
    passthrough = [c for c in df.columns if c not in ("columns", "data")]
    long = (
        df.select(
            *passthrough,
            F.col("data").alias("__data"),
            F.col("columns").alias("__cols"),
            # explode_OUTER: an event declaring no columns and carrying no
            # data still yields one (null-column) row, so encodeRows parity
            # holds — the reference emits an EMPTY proto row that counts
            # toward the chunk's appended rows (events.go encodeRows)
            F.explode_outer(
                F.array_union(
                    F.coalesce(
                        F.map_keys("columns"), F.array().cast("array<string>")
                    ),
                    F.coalesce(F.map_keys("data"), F.array().cast("array<string>")),
                )
            ).alias("column_name"),
        )
        .withColumn("event_type", F.col("__cols")[F.col("column_name")])
        .withColumn("value_json", F.to_json(F.col("__data")[F.col("column_name")]))
    )

    wh = F.broadcast(
        warehouse_schema.select(
            F.col(table_col),
            "column_name",
            F.col("column_type").alias("warehouse_type"),
        )
    )
    j = long.join(wh, [table_col, "column_name"], "left")

    v = F.col("value_json")
    ev = F.col("event_type")
    whty = F.col("warehouse_type")
    is_arr = v.isNotNull() & v.startswith("[")
    is_num = (
        v.isNotNull()
        & ~v.startswith('"')
        & ~is_arr
        & ~v.startswith("{")
        & ~v.isin("true", "false", "null")
    )
    govs = _go_v(v)
    str_like = whty.isin("string", "text")
    # declared column with a warehouse type that disagrees → the matrix
    # runs (even on nil values, see docstring); everything else passes
    mismatch = ev.isNotNull() & whty.isNotNull() & (ev != whty)

    coerced = (
        F.when(~mismatch | ev.isNull(), v)
        .when(str_like & ev.isin("string", "text", "json"), v)
        .when(str_like, _json_str(govs))
        .when(
            ev.isin("int", "bigint") & (whty == "float") & is_num,
            v.try_cast("double").cast("string"),
        )
        .when(
            (ev == "float") & whty.isin("int", "bigint") & is_num,
            v.try_cast("double").cast("long").cast("string"),
        )
        .when((whty == "json") & ev.isin("int", "float", "boolean"), _json_str(govs))
        .when((whty == "json") & is_arr, v)
        .when(whty == "json", _json_str(govs))
        .otherwise(F.lit(None).cast("string"))
    )
    # slices JSON-stringify regardless of the matrix outcome (but only
    # for DECLARED columns — Go's slice check lives in the columns loop);
    # the variant JSON text IS json.Marshal of the slice
    coerced = F.when(
        ev.isNotNull() & coerced.isNotNull() & coerced.startswith("["),
        _json_str(coerced),
    ).otherwise(coerced)

    failed = mismatch & coerced.isNull()
    values = j.withColumn("value_json", F.when(failed, F.lit(None)).otherwise(coerced))

    data = F.col("__data")
    has_identity = F.map_contains_key(data, F.lit(ID_COLUMN)) & F.map_contains_key(
        data, F.lit(RECEIVED_AT_COLUMN)
    )
    discards = (
        j.where(failed & has_identity)
        .select(
            F.col("column_name"),
            _go_v(v).alias("column_value"),
            F.concat(
                F.lit("incompatible schema conversion from "),
                whty,
                F.lit(" to "),
                ev,
            ).alias("reason"),
            _go_v(F.to_json(data[F.lit(RECEIVED_AT_COLUMN)])).alias("received_at"),
            _go_v(F.to_json(data[F.lit(ID_COLUMN)])).alias("row_id"),
            F.col(table_col).alias("table_name"),
            F.lit(formatted_ts).alias("uuid_ts"),
        )
    )
    return values.drop("__data", "__cols", "warehouse_type"), discards


def bq_encode_rows(
    values: DataFrame,
    warehouse_schema: DataFrame,
    group_cols: tuple = ("table", "job_id"),
    table_col: str = "table",
) -> DataFrame:
    """encodeRows + normalizeRow (encode.go:63-177) minus the proto
    marshalling (SDK wire format, injectable seam): per event, the
    non-null fields in SORTED column-name order — the determinism
    toBigQuerySchema documents as correctness (positional proto field
    numbers) — with datetime strings normalized to epoch MICROS
    (time.UnixMicro of the RFC3339Nano parse). ``field_error`` marks
    rows encodeRows would fail: a data column unknown to the warehouse
    schema (encode.go:86-88) or an unparseable datetime (:170-173) —
    the whole chunk's jobs fail on any such row."""
    wh = F.broadcast(
        warehouse_schema.select(
            F.col(table_col),
            "column_name",
            F.col("column_type").alias("warehouse_type"),
        )
    )
    j = values.join(wh, [table_col, "column_name"], "left")
    v = F.col("value_json")
    is_dt_str = (F.col("warehouse_type") == "datetime") & v.startswith('"')
    s = F.try_parse_json(v).cast("string")
    # time.Parse(RFC3339Nano) parity: Go REJECTS date-only, space-separated
    # and offset-less datetimes that Spark's lax to_timestamp would accept
    # (in the SESSION timezone — a silent wrong-epoch hazard). Require the
    # full RFC3339 shape with an explicit Z/offset, so the parse is an
    # absolute instant independent of session timezone; 7-9 digit (nano)
    # fractions truncate to micros exactly like time.UnixMicro.
    conform = s.rlike(
        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{1,9})?(Z|[+-]\d{2}:\d{2})$"
    )
    parsed = F.to_timestamp(F.regexp_replace(s, r"(\.\d{6})\d+", r"$1"))
    micros = (F.unix_micros(parsed)).cast("string")
    encoded = F.when(is_dt_str & conform, micros).otherwise(v)
    bad = F.coalesce(
        (F.col("warehouse_type").isNull() & v.isNotNull() & (v != "null"))
        | (is_dt_str & (~conform | parsed.isNull())),
        F.lit(False),
    )
    fields = j.select(
        *group_cols,
        F.col("column_name"),
        encoded.alias("encoded_json"),
        bad.alias("field_error"),
    )
    # the sort key is the COLUMN NAME alone (sort.Strings over names,
    # encode.go toBigQuerySchema) — sorting the rendered 'name=value'
    # strings diverges when one name prefixes another and the next char
    # sorts below '=' (0x3D), e.g. 'address1' vs 'address'. No pre-groupBy
    # filter: an event whose fields are all null still emits an (empty)
    # encoded row, matching the reference's appended-row accounting.
    return (
        fields.groupBy(*group_cols)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("field_error")
                            & F.col("encoded_json").isNotNull()
                            & (F.col("encoded_json") != "null"),
                            F.struct(F.col("column_name"), F.col("encoded_json")),
                        )
                    )
                ),
                lambda fld: F.concat(
                    fld["column_name"], F.lit("="), fld["encoded_json"]
                ),
            ).alias("encoded_fields"),
            F.coalesce(F.max("field_error"), F.lit(False)).alias("encode_error"),
        )
    )


def bq_duplicate_id_stats(
    df: DataFrame,
    group_cols: tuple = ("table",),
    chunk_col: str = "chunk_idx",
) -> DataFrame:
    """checkForDuplicateIDsInEvents per chunk, users excluded
    (bqstreamallevents.go:422-430): events WITH an id whose id already
    appeared earlier in the same chunk. Count = n_with_id − distinct ids,
    per (table, chunk), summed per table for the stat."""
    table = F.col(group_cols[0] if group_cols else "table")
    vid = F.col("data")[F.lit(ID_COLUMN)]
    ty = F.schema_of_variant(vid)
    # Go unmarshals every JSON number as float64, so ids 1 and 1.0 are the
    # SAME key in its duplicate map — compare numeric variants by their
    # double value, not their JSON text. A present-but-null id is still a
    # key in Go's map (nil counts toward duplicates): coalesce to the
    # literal 'null' so count_distinct doesn't silently drop it.
    is_num = ty.isin(
        "BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT"
    ) | ty.startswith("DECIMAL")
    norm = F.coalesce(
        F.when(is_num, vid.cast("double").cast("string")).otherwise(F.to_json(vid)),
        F.lit("null"),
    )
    with_id = df.where(
        F.map_contains_key(F.col("data"), F.lit(ID_COLUMN))
        & (table != USERS_TABLE)
    ).withColumn("__id", norm)
    per_chunk = with_id.groupBy(*group_cols, chunk_col).agg(
        (F.count("*") - F.count_distinct("__id")).alias("duplicate_ids")
    )
    return per_chunk.groupBy(*group_cols).agg(
        F.sum("duplicate_ids").alias("duplicate_ids")
    )


def finalize_bq_jobs(
    chunked: DataFrame,
    append_results: DataFrame | None = None,
    group_cols: tuple = ("table",),
    chunk_col: str = "chunk_idx",
    job_id_col: str = "job_id",
) -> DataFrame:
    """Per-chunk outcome → per-job verdict (streamEventBatches:452-493 +
    the Upload-level triage:219-257): jobs of acknowledged chunks
    ``succeeded`` — an acked append is already durable, so ONLY failed
    chunks retry (the at-least-once/no-duplicate trade the reference
    documents); a failed table's jobs ``aborted`` when the grpc code of
    its FIRST erroring chunk is terminal (shouldAbort via
    status.Code(errors.Join(...)) — the join resolves to the first
    error), else ``failed``. ``append_results`` is the injectable
    Storage-Write seam: (group cols, chunk_idx, error_code) with NULL
    code = acknowledged; omitted, every chunk acks (the happy path)."""
    gcols = list(group_cols)
    if append_results is None:
        return chunked.select(
            *gcols, chunk_col, F.col(job_id_col), F.lit("succeeded").alias("job_state")
        )
    res = F.broadcast(append_results)
    j = chunked.join(res, gcols + [chunk_col], "left")
    first_err = F.broadcast(
        append_results.where(F.col("error_code").isNotNull())
        .groupBy(*gcols)
        .agg(F.min_by("error_code", chunk_col).alias("__first_code"))
    )
    j = j.join(first_err, gcols, "left")
    state = (
        F.when(F.col("error_code").isNull(), "succeeded")
        .when(F.col("__first_code").isin(*ABORT_CODES), "aborted")
        .otherwise("failed")
    )
    return j.select(
        *gcols, chunk_col, F.col(job_id_col), state.alias("job_state")
    )
