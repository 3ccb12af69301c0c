"""Async-destination upload shapes, part 2 — the remaining provider tree:
eloqua, salesforce bulk, sftp, yandex metrica, klaviyo bulk.

With part 1 (provider_uploads: marketo, bing-ads ×2, lytics) and snowpipe
(operators/snowpipe), this closes EVERY provider under
router/batchrouter/asyncdestinationmanager/:

- ELOQUA — headered CSV whose columns come from the FIRST event's data
  keys; the event family (track-with-customObjectId vs identify-contacts)
  is detected from the first event too; only string-typed values survive
  ("null" literal → ""); the size cap is a PREFIX cutoff on bytes already
  written (eloqua/utils.go:24-131) — window cumsum, no fold.
- SALESFORCE_BULK_UPLOAD — one CSV whose header is the SORTED UNION of
  all jobs' message keys (deterministic in the reference: sort.Strings),
  cells via common.FormatCSVValue (nil → "", floats never scientific,
  composites as JSON); the upsert key column must exist or the whole
  upload fails; externalIds are sha256-hashed for PII-safe poll
  correlation (salesforce-bulk-upload/utils.go:25-152,
  common/utils.go:34-57).
- SFTP — staged records re-shaped to CSV (header = first record's
  message.fields keys + "action", optionally sorted; Go fmt "%v" cell
  semantics, so an absent key prints "<nil>") or a JSON array; the remote
  path comes from the {YYYY}/{MM}/{DD}/... template (sftp/utils.go:
  47-200,217-259).
- YANDEX_METRICA_OFFLINE_EVENTS — fixed 5-column CSV (id, Target,
  DateTime, Price, Currency); the id column NAME is decided by the first
  message's present id field (ClientId > Yclid > UserId), rows whose id
  is missing or non-string are skipped, Target falls back to the
  destination goalId, Price renders non-scientific
  (yandexmetrica/yandexmetrica.go:40-205).
- KLAVIYO_BULK_UPLOAD — profiles segmented into import jobs by
  cumulative marshalled size (+1 comma) and element count
  (chunkBySizeAndElements, klaviyobulkupload.go:83-117) — a SEGMENTATION
  fold (chunk boundaries depend on prior boundaries, not a prefix
  window); each chunk wraps into the profile-bulk-import-job payload
  (createFinalPayload, :37-63); poll-time errors join back to jobs by
  the profile's id-else-anonymousId (GetUploadStats, :178-228).

Scale posture matches part 1: every shape is codegen over the q84
batching exchange; the only folds (klaviyo chunking) run as bounded
Arrow applyInPandas per upload group, whose size the upstream batcher
caps by construction. Group-level metadata (headers, id-column choice)
is ONE tiny aggregate per upload, broadcast back onto the rows.

Documented divergences: Go iterates maps in random order, so eloqua's
header order (first event's map keys) is nondeterministic in the
reference — we keep the first event's JSON document order; extreme
floats (>1e16) render scientific via to_json where Go's FormatFloat
never does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from rudder_server_spark.operators.provider_uploads import go_csv_line


def _rendered(df: DataFrame, render_row, in_cols, extra_fields=()) -> DataFrame:
    """Arrow mapInPandas shell for the dynamic-header CSV renderers.

    The dynamic-header cell builds (``transform(headers, h -> ...)`` with
    variant lookups + Go-csv escaping per element) run INTERPRETED in the
    JVM — the SCALE.md round-3 interpreted-HOF lesson; measured ~10x
    slower than this vectorized Python mirror at sf0.01. ``render_row``
    is a SELF-CONTAINED callable (cloudpickled by value — workers never
    import this package) taking the ``in_cols`` values POSITIONALLY and
    returning a tuple of ``extra_fields`` values appended to the row —
    only the needed columns cross into Python objects per row."""
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(name, StringType()) for name in extra_fields]
    )
    ins = list(in_cols)
    names = list(extra_fields)

    def gen(batches):
        for pdf in batches:
            outs = [[] for _ in names]
            for row in zip(*[pdf[c] for c in ins]):
                vals = render_row(*row)
                for i, v in enumerate(vals):
                    outs[i].append(v)
            pdf = pdf.copy()
            for i, name in enumerate(names):
                pdf[name] = outs[i]
            yield pdf

    return df.mapInPandas(gen, out_schema)


# ----------------------------------------------------- per-row render logic
# Each factory returns a SELF-CONTAINED closure (cloudpickled by value —
# the returned function's qualname is not importable, so workers never
# need this package on sys.path). The per-provider operators use them
# individually; the fused q102 audit composes all four inside ONE
# mapInPandas pass (one Arrow exchange instead of four).

def eloqua_render():
    """createCSVFile cell semantics (eloqua/utils.go:95-110): only
    string-typed values survive; the literal "null" string and
    non-strings render ''. Returns (csv_line, header_line)."""

    def render(headers, payload):
        import json as _json

        def _esc(s):
            if s == "":
                return s
            if (
                s == "\\."
                or any(ch in s for ch in (',', '"', '\r', '\n'))
                or s[0].isspace()
            ):
                return '"' + s.replace('"', '""') + '"'
            return s

        if headers is None:
            return (None, None)
        try:
            d = _json.loads(payload).get("message", {}).get("data", {})
        except Exception:
            d = {}
        if not isinstance(d, dict):
            d = {}
        cells = []
        for h in headers:
            v = d.get(h)
            cells.append(v if isinstance(v, str) and v != "null" else "")
        return (
            ",".join(_esc(c) for c in cells),
            ",".join(_esc(h) for h in headers),
        )

    return render


def salesforce_render(external_id_field: str):
    """FormatCSVValue cells (common/utils.go:34-57): nil → '', strings
    raw, floats via shortest non-scientific form, composites as compact
    JSON (Go marshals map keys sorted). Returns (csv_line, ext_val)."""
    _ext = str(external_id_field)

    def render(headers, payload):
        import json as _json

        def _esc(s):
            if s == "":
                return s
            if (
                s == "\\."
                or any(ch in s for ch in (',', '"', '\r', '\n'))
                or s[0].isspace()
            ):
                return '"' + s.replace('"', '""') + '"'
            return s

        def fmt(v):
            if v is None:
                return ""
            if isinstance(v, str):
                return v
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float):
                s = repr(v)
                if "e" in s or "E" in s:
                    s = format(v, "f").rstrip("0").rstrip(".")
                return s[:-2] if s.endswith(".0") else s
            if isinstance(v, (list, dict)):
                return _json.dumps(v, separators=(",", ":"), sort_keys=True)
            return str(v)

        try:
            msg = _json.loads(payload).get("message", {})
        except Exception:
            msg = {}
        if not isinstance(msg, dict):
            msg = {}
        hs = [] if headers is None else list(headers)
        line = ",".join(_esc(fmt(msg.get(h))) for h in hs)
        return (line, fmt(msg.get(_ext)))

    return render


def sftp_render():
    """generateCSVFile cells (sftp/utils.go:183-185): Go fmt "%v" — a
    missing key is a nil interface → '<nil>'; bools print true/false;
    composites via compact JSON (documented divergence from Go's
    map-print form). Returns (csv_line,)."""

    def render(headers, payload):
        import json as _json

        def _esc(s):
            if s == "":
                return s
            if (
                s == "\\."
                or any(ch in s for ch in (',', '"', '\r', '\n'))
                or s[0].isspace()
            ):
                return '"' + s.replace('"', '""') + '"'
            return s

        def gov(v):
            if v is None:
                return "<nil>"
            if isinstance(v, str):
                return v
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float):
                s = repr(v)
                return s[:-2] if s.endswith(".0") else s
            if isinstance(v, (list, dict)):
                return _json.dumps(v, separators=(",", ":"), sort_keys=True)
            return str(v)

        try:
            msg = _json.loads(payload).get("message", {})
        except Exception:
            msg = {}
        fields = msg.get("fields") if isinstance(msg, dict) else {}
        if not isinstance(fields, dict):
            fields = {}
        fields = dict(fields)
        fields["action"] = msg.get("action") if isinstance(msg, dict) else None
        hs = [] if headers is None else list(headers)
        return (",".join(_esc(gov(fields.get(h))) for h in hs),)

    return render


def yandex_extract():
    """generateCSVFromJSON field extraction (yandexmetrica.go:129-205):
    id priority ClientId > Yclid > UserId with present-AND-string typing,
    non-scientific Price. Returns (rid, hdr, target, dt, price, cur)."""

    def extract(payload):
        import json as _json

        try:
            msg = _json.loads(payload).get("message", {})
        except Exception:
            msg = {}
        if not isinstance(msg, dict):
            msg = {}
        rid, hdr = None, None
        for field in ("ClientId", "Yclid", "UserId"):
            v = msg.get(field)
            if v is not None:
                # ID(): first PRESENT field decides; getID rejects
                # non-strings (the row errors, no fallthrough)
                if isinstance(v, str):
                    rid, hdr = v, field
                break
        price = msg.get("Price")
        if isinstance(price, bool) or not isinstance(price, (int, float)):
            price_s = "0"
        elif isinstance(price, int):
            price_s = str(price)
        else:
            s = repr(price)
            price_s = s[:-2] if s.endswith(".0") else s
        tgt = msg.get("Target")
        dt = msg.get("DateTime")
        cur = msg.get("Currency")
        return (
            rid, hdr,
            tgt if isinstance(tgt, str) else "",
            dt if isinstance(dt, str) else "",
            price_s,
            cur if isinstance(cur, str) else "",
        )

    return extract


# ------------------------------------------------------------------- eloqua

def _group_first_anchor(
    df: DataFrame,
    group_cols: tuple,
    job_id_col: str,
    derived: list,
) -> DataFrame:
    """Attach per-group columns derived from the group's FIRST row (min
    ``job_id``): one tiny aggregate finds the first ids, a broadcast
    semi-join evaluates the derivation expressions on ONLY those rows,
    and the per-group results broadcast back. The r8 shape ran the
    derivations as window expressions — which evaluates them (JSON
    parses, json_object_keys) on EVERY row and shuffles the corpus to
    group-count partitions twice (measured ~2x of the eloqua audit's
    cost). Here the corpus never shuffles at all.

    ``derived``: list of (name, Column) evaluated against the first rows.
    NULL group keys join null-safely (they form their own group, same as
    a window partition would).
    """
    from functools import reduce

    gcols = list(group_cols)
    firsts = (
        df.groupBy(*[F.col(c) for c in gcols]).agg(
            F.min(job_id_col).alias("__first_id")
        )
        if gcols
        else df.agg(F.min(job_id_col).alias("__first_id"))
    )
    if gcols:
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"__fa_l.{c}").eqNullSafe(F.col(f"__fa_r.{c}")) for c in gcols],
        ) & (F.col(f"__fa_l.{job_id_col}") == F.col("__fa_r.__first_id"))
        first_rows = (
            df.alias("__fa_l")
            .join(F.broadcast(firsts).alias("__fa_r"), cond, "inner")
            .select([F.col(f"__fa_l.{c}") for c in df.columns])
        )
        # ties: if two rows share a group's min job_id, keep exactly one
        # anchor row — otherwise the back-join below would multiply every
        # row of that group (the r8 window form tolerated ties; this form
        # must too). The pick is DETERMINISTIC: min_by over the derived
        # struct keyed on its own JSON text, so repeated runs (and the
        # DuckDB differential harness) see the same anchor even when tied
        # rows carry differing derived values. Ordinary groups have one
        # first row and the agg is a trivial pass-through.
        dstruct = F.struct(*[expr.alias(name) for name, expr in derived])
        anchor = (
            first_rows.select(*gcols, dstruct.alias("__fa_d"))
            .groupBy(*[F.col(c) for c in gcols])
            .agg(F.min_by("__fa_d", F.to_json("__fa_d")).alias("__fa_d"))
            .select(
                *gcols,
                *[F.col(f"__fa_d.{name}").alias(name) for name, _ in derived],
            )
        )
        back = reduce(
            lambda a, b: a & b,
            [F.col(f"__fb_l.{c}").eqNullSafe(F.col(f"__fb_r.{c}")) for c in gcols],
        )
        return (
            df.alias("__fb_l")
            .join(F.broadcast(anchor).alias("__fb_r"), back, "left")
            .select(
                *[F.col(f"__fb_l.{c}") for c in df.columns],
                *[F.col(f"__fb_r.{name}") for name, _ in derived],
            )
        )
    first_rows = df.join(
        F.broadcast(firsts), F.col(job_id_col) == F.col("__first_id"), "inner"
    ).select(df.columns)
    # same deterministic tie-break as the grouped branch (limit(1) would
    # pick whichever tied min-job_id row the scan yields first)
    dstruct = F.struct(*[expr.alias(name) for name, expr in derived])
    anchor = (
        first_rows.select(dstruct.alias("__fa_d"))
        .agg(F.min_by("__fa_d", F.to_json("__fa_d")).alias("__fa_d"))
        .select(*[F.col(f"__fa_d.{name}").alias(name) for name, _ in derived])
    )
    return df.crossJoin(F.broadcast(anchor))


def eloqua_csv_rows(
    jobs: DataFrame,
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
    file_size_limit: int = 32 * 1024 * 1024,  # eloqua.go fileSizeLimit default
) -> DataFrame:
    """createCSVFile + getEventDetails (eloqua/utils.go:24-131) per upload
    group: the FIRST job fixes the event family and the header
    (track needs a non-empty customObjectId; identify needs
    customObjectId == "contacts"; anything else fails the whole group
    with ``group_error``). Cells keep only string-typed data values; the
    literal string "null" and non-strings render "" (utils.go:95-101).
    Admission is a PREFIX cutoff: a row is written only while the bytes
    already written (header + prior rows) are within the cap
    (utils.go:103-110 checks Size() BEFORE writing) — one window cumsum.

    Output: input + ``headers`` (array), ``csv_line``, ``accepted``,
    ``group_error`` (non-null → the manager aborts the whole upload)."""
    p = F.col(payload_col)
    mtype = F.get_json_object(p, "$.message.type")
    obj_id = F.get_json_object(p, "$.message.customObjectId")

    # the first job's family gate + header (document key order — the
    # reference's Go map iteration is random here, see module docstring).
    # Derived on ONLY the first row per group and broadcast back — the
    # window form evaluated these parses on every row and shuffled the
    # corpus twice (see _group_first_anchor).
    valid_first = (
        ((mtype == "track") & (obj_id != "") & obj_id.isNotNull())
        | ((mtype == "identify") & (obj_id == "contacts"))
    )
    anchored = _group_first_anchor(
        jobs, tuple(group_cols), job_id_col,
        [
            (
                "headers",
                F.when(
                    valid_first,
                    F.json_object_keys(F.get_json_object(p, "$.message.data")),
                ),
            ),
            (
                "group_error",
                F.when(~valid_first, F.lit("unable to find event format")),
            ),
        ],
    )

    render = eloqua_render()

    with_line = _rendered(
        anchored, render, ("headers", payload_col), ("csv_line", "_header_line")
    )
    with_line = with_line.withColumn(
        "_row_bytes", F.octet_length("csv_line") + F.lit(2)
    )
    gw = W.partitionBy(*group_cols) if group_cols else W.partitionBy(F.lit(1))
    order_w = gw.orderBy(job_id_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    bytes_before = (
        F.octet_length("_header_line") + F.lit(2)
        + F.coalesce(F.sum("_row_bytes").over(order_w) - F.col("_row_bytes"), F.lit(0))
    )
    return with_line.withColumn(
        "accepted",
        F.col("group_error").isNull() & (bytes_before <= file_size_limit),
    ).drop("_row_bytes", "_header_line")


# --------------------------------------------------------------- salesforce

def hash_external_id(c: Column) -> Column:
    """HashExternalID (salesforce-bulk-upload/utils.go:25-28): sha256 hex
    of the upsert key — PII-safe poll correlation (Salesforce returns the
    key unchanged, so re-hashing the poll CSV matches)."""
    return F.sha2(c, 256)


def salesforce_csv_rows(
    jobs: DataFrame,
    external_id_field: str,
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
) -> DataFrame:
    """createCSVFile (salesforce-bulk-upload/utils.go:81-152) per upload
    group: header = sorted union of every job's message keys (the one
    provider whose header IS deterministic in the reference), cells via
    FormatCSVValue, plus ``external_id_hash`` (sha256 of the upsert key
    value) for poll correlation. ``group_error`` set for the whole group
    when the upsert key column is absent from the header (utils.go:
    124-127 fails the upload)."""
    p = F.col(payload_col)
    # per-group header = sorted union of key sets, as ONE aggregate
    # broadcast back onto the rows. NOT a whole-partition window
    # collect_list — that materializes the full key-list PER ROW, O(n²)
    # per group (measured 71 s at sf0.1 before this fix).
    keyed = jobs.select(
        "*", F.json_object_keys(F.get_json_object(p, "$.message")).alias("_keys")
    )
    gcols = [F.lit(1).alias("__g")] if not group_cols else [F.col(c) for c in group_cols]
    hdrs = keyed.groupBy(*gcols).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_keys")))
        ).alias("headers")
    )
    if not group_cols:
        keyed = keyed.withColumn("__g", F.lit(1))
    with_hdr = keyed.join(
        F.broadcast(hdrs), list(group_cols) or ["__g"]
    ).drop("_keys")
    if not group_cols:
        with_hdr = with_hdr.drop("__g")

    render = salesforce_render(external_id_field)

    rendered = _rendered(
        with_hdr, render, ("headers", payload_col), ("csv_line", "_ext_val")
    )
    return rendered.select(
        "*",
        F.when(
            ~F.array_contains(F.col("headers"), external_id_field),
            F.lit(f'externalId field "{external_id_field}" not present in job data'),
        ).alias("group_error"),
        hash_external_id(F.col("_ext_val")).alias("external_id_hash"),
    ).drop("_ext_val")


# --------------------------------------------------------------------- sftp

SFTP_PATH_VARS = (
    "{YYYY}", "{MM}", "{DD}", "{hh}", "{mm}", "{ss}", "{ms}",
    "{timestampInSec}", "{timestampInMS}", "{destinationID}", "{jobRunID}",
)


def sftp_file_path(
    template: str,
    ts_col: Column,
    destination_id: Column | str = "",
    job_run_id: Column | str = "",
) -> Column:
    """getUploadFilePath (sftp/utils.go:217-259): the remote path template
    with {YYYY}/{MM}/{DD}/{hh}/{mm}/{ss}/{ms}/{timestampInSec}/
    {timestampInMS}/{destinationID}/{jobRunID} substituted — pure column
    expressions, unknown variables kept verbatim."""
    if not template:
        raise ValueError("upload file path can not be empty")
    dest = F.lit(destination_id) if isinstance(destination_id, str) else destination_id
    jrun = F.lit(job_run_id) if isinstance(job_run_id, str) else job_run_id
    subs = {
        "{YYYY}": F.date_format(ts_col, "yyyy"),
        "{MM}": F.date_format(ts_col, "MM"),
        "{DD}": F.date_format(ts_col, "dd"),
        "{hh}": F.date_format(ts_col, "HH"),
        "{mm}": F.date_format(ts_col, "mm"),
        "{ss}": F.date_format(ts_col, "ss"),
        "{ms}": F.date_format(ts_col, "SSS"),
        "{timestampInSec}": F.unix_timestamp(ts_col).cast("string"),
        "{timestampInMS}": (F.unix_timestamp(ts_col) * 1000
                            + F.date_format(ts_col, "SSS").cast("long")).cast("string"),
        "{destinationID}": dest,
        "{jobRunID}": jrun,
    }
    import re

    parts = re.split(r"(\{[A-Za-z]+\})", template)
    cols = [subs.get(part, F.lit(part)) for part in parts if part != ""]
    return F.concat(*cols) if cols else F.lit("")


def sftp_csv_rows(
    jobs: DataFrame,
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
    sort_column_names: bool = False,
) -> DataFrame:
    """generateCSVFile (sftp/utils.go:132-199) per upload group: header =
    the FIRST record's ``message.fields`` keys plus "action" (sorted when
    the destination config says so), each record's cells via Go "%v"
    (absent key → "<nil>"), with the record's ``message.action`` spliced
    into the fields. Output: + ``headers``, ``csv_line``."""
    p = F.col(payload_col)
    # header from ONLY the first record per group, broadcast back — see
    # _group_first_anchor (the window form parsed every row's fields)
    hdr0 = F.array_append(
        F.json_object_keys(F.get_json_object(p, "$.message.fields")), F.lit("action")
    )
    anchored = _group_first_anchor(
        jobs, tuple(group_cols), job_id_col, [("headers", hdr0)]
    )
    if sort_column_names:
        anchored = anchored.withColumn("headers", F.array_sort("headers"))

    render = sftp_render()

    return _rendered(anchored, render, ("headers", payload_col), ("csv_line",))


# -------------------------------------------------------------------- yandex

YANDEX_ID_FIELDS = ("ClientId", "Yclid", "UserId")  # priority order (ID())


def yandex_csv_rows(
    jobs: DataFrame,
    goal_id: str = "",
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
) -> DataFrame:
    """generateCSVFromJSON (yandexmetrica/yandexmetrica.go:129-205): the
    id COLUMN NAME comes from the first message's present id field
    (ClientId > Yclid > UserId); the WHOLE group fails when the first
    message's id is missing OR non-string (ymMsgsBody[0].ID() error aborts
    the upload, :166-169). Later rows whose own id errors are merely
    SKIPPED (``skipped`` true, csv_line NULL — the reference's
    ``continue``). Target falls back to the destination goalId; Price
    renders non-scientific. Output: + ``id_header``, ``skipped``,
    ``csv_line``, ``group_error``."""
    # Field extraction in a self-contained Arrow pass: the id priority
    # needs PRESENT-and-string-typed checks per field — variant-op trees
    # ran interpreted (measured 17.8 s at sf0.1); a Python json pass is
    # ~20x cheaper and matches Go's unmarshal exactly (explicit JSON null
    # and absent both land as nil `any`).
    extract = yandex_extract()

    extracted = _rendered(
        jobs, extract, (payload_col,),
        ("_rid", "_hdr", "_target", "_dt", "_price", "_cur"),
    )
    # the FIRST message must yield a usable (present AND string) id, else
    # the whole group aborts — getID's error path, not just a skip.
    # Anchored from only the first row per group (see _group_first_anchor;
    # the window form shuffled the extracted frame twice)
    anchored = _group_first_anchor(
        extracted, tuple(group_cols), job_id_col,
        [("id_header", F.coalesce(F.col("_hdr"), F.lit("_missing")))],
    )
    target = F.when(F.col("_target") != "", F.col("_target")).otherwise(F.lit(goal_id))
    line = go_csv_line(
        [F.col("_rid"), target, F.col("_dt"), F.col("_price"), F.col("_cur")]
    )
    return anchored.select(
        "*",
        F.when(F.col("id_header") == "_missing",
               F.lit("missing 'ClientId', 'Yclid', or 'UserId' key in 'message' object"))
        .alias("group_error"),
        F.col("_rid").isNull().alias("skipped"),
        F.when(F.col("_rid").isNotNull(), line).alias("csv_line"),
    ).drop("_rid", "_hdr", "_target", "_dt", "_price", "_cur")


# ------------------------------------------------------------------ klaviyo

def klaviyo_chunks(
    profiles: DataFrame,
    max_bytes: int = 4_600_000,  # MAXPAYLOADSIZE (klaviyo 5 MB API cap w/ margin)
    max_elements: int = 10_000,  # BATCHSIZE
    profile_col: str = "profile_json",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
) -> DataFrame:
    """chunkBySizeAndElements (klaviyobulkupload.go:83-117) as a
    segmentation fold: scan profiles in job order; START A NEW CHUNK when
    the running chunk's bytes + this profile (+1 comma) reach max_bytes
    or the chunk already holds max_elements. Chunk boundaries depend on
    prior boundaries — a fold, not a prefix window — run as bounded Arrow
    applyInPandas per upload group (same posture as
    provider_uploads.sequential_accept). Adds ``chunk_index`` (0-based
    import-job number within the group)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(profiles.schema.fields) + [StructField("chunk_index", IntegerType())]
    )
    order = [str(job_id_col)]
    pcol = str(profile_col)
    mb, me = int(max_bytes), int(max_elements)

    def fold(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        idx, size, count, out = 0, 0, 0, []
        for pj in pdf[pcol]:
            psize = len(pj.encode()) + 1  # +1 comma (klaviyobulkupload.go:97)
            if (size + psize >= mb or count == me) and count > 0:
                idx, size, count = idx + 1, 0, 0
            out.append(idx)
            size += psize
            count += 1
        pdf["chunk_index"] = out
        return pdf

    grouped = (
        profiles.groupBy(*[F.col(c) for c in group_cols])
        if group_cols
        else profiles.groupBy(F.lit(1).alias("__g"))
    )
    return grouped.applyInPandas(fold, schema=out_schema)


def klaviyo_payloads(
    chunked: DataFrame,
    list_id: str = "",
    profile_col: str = "profile_json",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
) -> DataFrame:
    """createFinalPayload (klaviyobulkupload.go:37-63): one
    profile-bulk-import-job document per chunk — profiles joined in job
    order, the optional list relationship appended. One aggregate on the
    (group, chunk) key — the same exchange the chunk stats use."""
    keys = list(group_cols) + ["chunk_index"]
    body = F.concat_ws(
        ",", F.transform(F.array_sort(F.collect_list(F.struct(job_id_col, profile_col))),
                          lambda s: s.getField(profile_col)),
    )
    rel = (
        f',"relationships":{{"lists":{{"data":[{{"type":"list","id":"{list_id}"}}]}}}}'
        if list_id
        else ""
    )
    return chunked.groupBy(*keys).agg(
        F.count("*").alias("n_profiles"),
        F.concat(
            F.lit('{"data":{"type":"profile-bulk-import-job",'
                  '"attributes":{"profiles":{"data":['),
            body,
            F.lit("]}}"), F.lit(rel), F.lit("}}"),
        ).alias("payload"),
    )


def klaviyo_abort_joinback(
    jobs: DataFrame,
    upload_errors: DataFrame,
    id_col: str = "identifier",
    job_id_col: str = "job_id",
) -> DataFrame:
    """GetUploadStats (klaviyobulkupload.go:178-228): poll-time error
    records carry the ORIGINAL payload's id (else anonymousId); jobs
    matching an error identifier abort with its detail, the rest
    succeed. Errors are bounded by failed-profile count — broadcast."""
    errs = F.broadcast(
        upload_errors.select(F.col(id_col), F.col("detail")).dropDuplicates([id_col])
    )
    joined = jobs.join(errs, jobs[id_col] == errs[id_col], "left").drop(errs[id_col])
    return joined.withColumn(
        "final_state",
        F.when(F.col("detail").isNotNull(), "aborted").otherwise("succeeded"),
    )
