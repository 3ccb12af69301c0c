"""Per-provider async-destination upload-file shapes.

The batch router's async managers (router/batchrouter/asyncdestinationmanager/)
each reshape the staged job lines into the provider's bulk-upload artifact:

- MARKETO_BULK_UPLOAD — one headered CSV whose columns are the destination
  config's field mapping, capped at 10 MB with a 95 % estimate buffer;
  overflowing jobs are failed for retry and every written row is
  sha256-fingerprinted for the poll-time warning/failure join-back
  (marketo-bulk-upload/utils.go:153-248).
- BINGADS_AUDIENCE — per-action (Replace/Remove/Add) zipped CSVs in the
  Bing bulk "Customer List" schema: a 3-row template header, then one
  "Customer List Item" row PER LIST MEMBER of each job, with
  ClientId = jobId<<>>hashedEmail (audience/util.go:28-196,
  audience/types.go:62-91).
- BINGADS_OFFLINE_CONVERSIONS — per-action (insert/update/delete) zipped
  CSVs in the "Offline Conversion" schema, after the manager's Transform
  validation pipeline: required-field checks, RFC3339 → US-format time
  rewrite, enhanced-conversion gate, stringification, optional sha256
  hashing of email/phone (offline-conversions/bulk_uploader.go:49-149,
  offline-conversions/util.go:28-173,459-542).
- LYTICS_BULK_UPLOAD — one CSV whose columns are the streamTraitsMapping's
  lytics properties, values plucked from message.properties with gjson-free
  string semantics (lytics_bulk_upload/utils.go:20-97).

Spark-first: every shape is a narrow codegen'd projection over the q84
batching exchange (async_destinations.assign_upload_batches) — the same
pattern as the q91 stream-manager shapes. The ONLY non-codegen piece is
the providers' shared admission fold: each manager scans its staged file
sequentially and ACCEPTS a job only if the running byte/row total stays
under the cap — a rejected job does NOT advance the total, so later
smaller jobs may still fit. That accept-or-skip fold is not a prefix
cumsum; ``sequential_accept`` runs it as one bounded ``applyInPandas``
per upload group. Groups are per-upload files already capped by
``max_events_per_file`` upstream, so the pandas fold is O(file rows) with
bounded memory no matter the corpus size — at 100 TB the number of groups
grows, never the group.

Documented divergences from the Go reference (all metadata-level, none
affecting which rows ship):
- Go iterates the marketo FieldsMapping as a map, so its header order is
  RANDOM per process; we keep the mapping's declared order (deterministic
  is strictly better and Marketo matches columns by name).
- Go fmt "%v" prints large floats in scientific notation ("1e+06") and
  JSON nulls as "<nil>"; we render numbers via their JSON text. Nulls DO
  print "<nil>" to match.
- staged-line byte sizes for the bing-ads/lytics caps are measured on a
  canonical to_json re-marshal (Go's json.Marshal key order differs by a
  few bytes per line against 100 MB caps).
- go csv quoting treats any leading unicode space as quote-worthy; we
  match ASCII whitespace via regex (``^\\s``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MARKETO_MAX_FILE_BYTES = 10 * 1024 * 1024  # utils.go:23 maxFileSize
MARKETO_ESTIMATE_BUFFER = 0.95  # utils.go:24
BINGADS_AUDIENCE_ACTIONS = ("Replace", "Remove", "Add")  # audience/types.go:62
BINGADS_OFFLINE_ACTIONS = ("update", "insert", "delete")  # offline types.go:54
CLIENT_ID_SEPARATOR = "<<>>"  # audience/types.go:66


# --------------------------------------------------------------------- CSV

def go_csv_field_py(s: str) -> str:
    """Python mirror of Go encoding/csv field escaping (fieldNeedsQuotes):
    quote when the field contains a comma, quote, CR or LF, starts with
    whitespace, or is the literal ``\\.``; quotes double inside quotes.
    Used for constant header lines and as the differential test oracle."""
    if s == "":
        return s
    if (
        s == r"\."
        or any(ch in s for ch in (',', '"', '\r', '\n'))
        or s[0].isspace()
    ):
        return '"' + s.replace('"', '""') + '"'
    return s


def go_csv_line_py(fields: list[str]) -> str:
    """A full Go-escaped CSV record (no line terminator)."""
    return ",".join(go_csv_field_py(f) for f in fields)


def go_csv_field(c: Column) -> Column:
    """Column version of ``go_csv_field_py`` — pure codegen, no UDF.
    Literal contains/replace instead of regex: a CSV render touches ~40
    fields per row across the three bing-ads shapes, so the two rlikes +
    regexp_replace per field were the hottest expressions in the plan
    (same character set as the regexes: [",\\r\\n] and ^[ \\t\\n\\x0B\\f\\r])."""
    needs = (
        (c == F.lit(r"\."))
        | c.contains(",")
        | c.contains('"')
        | c.contains("\r")
        | c.contains("\n")
        | c.substr(1, 1).isin(" ", "\t", "\n", "\x0b", "\f", "\r")
    )
    quoted = F.concat(F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"'))
    return F.when(c == "", c).when(needs, quoted).otherwise(c)


def go_csv_line(cols: list[Column]) -> Column:
    """One CSV record from escaped fields. NULLs must be pre-coalesced —
    concat_ws would silently DROP a null field and shift the columns."""
    return F.concat_ws(",", *[go_csv_field(c) for c in cols])


# ------------------------------------------------ SQL-text twins (build cost)
#
# The Column-API builders above cost 2-4 py4j round-trips PER operation;
# a provider's CSV render touches 40+ cells × ~15 ops, so q98's plan
# CONSTRUCTION measured 2× its execution (r10 profile: 23k py4j calls,
# ~4.5 s build vs 2.2 s exec warm). These twins emit the SAME expressions
# as SQL text — strings compose in Python for free and one F.expr() call
# ships the whole projection. They are exact mirrors of go_csv_field /
# the variant-get value ladder; tests pin the two forms byte-equal.
# `ref` must be a short SQL expression (a column name), since it is
# spliced several times into the text.

def sql_str(s: str) -> str:
    """Spark SQL single-quoted string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def go_csv_field_sql(ref: str) -> str:
    needs = (
        f"({ref} = '\\\\.' OR contains({ref}, ',') OR contains({ref}, '\"')"
        f" OR contains({ref}, chr(13)) OR contains({ref}, chr(10))"
        f" OR substr({ref}, 1, 1) IN (' ', chr(9), chr(10), chr(11),"
        f" chr(12), chr(13)))"
    )
    quoted = f"concat('\"', replace({ref}, '\"', '\"\"'), '\"')"
    return (
        f"CASE WHEN {ref} = '' THEN {ref} WHEN {needs} THEN {quoted} "
        f"ELSE {ref} END"
    )


def go_csv_line_sql(refs: list[str]) -> str:
    return "concat_ws(',', " + ", ".join(go_csv_field_sql(r) for r in refs) + ")"


def vget_sql(doc_ref: str, key: str, typ: str) -> str:
    """``try_variant_get(doc, '$[\"key\"]', 'typ')`` as SQL text (same
    bracket-quoted path rules as _vpath)."""
    return f"try_variant_get({doc_ref}, {sql_str(_vpath(key))}, {sql_str(typ)})"


def _vpath(key: str) -> str:
    """Variant path for one object key, bracket-quoted so arbitrary
    mapping keys (dots, spaces, backslashes) can't break the path
    grammar. Spark's variant path parser takes the text between the
    quotes RAW — no escape sequences at all (probed: '$["c\\d"]' matches
    the key ``c\\d`` while '$["a\\"b"]' is INVALID_VARIANT_GET_PATH) —
    so a key containing a double quote must use the single-quoted form
    and vice versa; a key containing BOTH is unrepresentable and raises
    here instead of failing at runtime inside codegen."""
    if '"' not in key:
        return '$["' + key + '"]'
    if "'" not in key:
        return "$['" + key + "']"
    raise ValueError(
        f"mapping key {key!r} contains both quote characters — "
        "unrepresentable in Spark's variant path grammar"
    )


# --------------------------------------------------- admission fold (shared)

def sequential_accept(
    df: DataFrame,
    size_col: str,
    byte_cap: int,
    order_cols: tuple = ("job_id",),
    group_cols: tuple = (),
    count_cap: int | None = None,
    base_bytes: int = 0,
    inclusive: bool = True,
    out_col: str = "accepted",
    skip_col: str | None = None,
    subgroup_cols: tuple = (),
) -> DataFrame:
    """The managers' accept-or-skip admission fold, one group = one upload
    file: scan rows in staged order; accept a row only while the running
    accepted-byte total (seeded with ``base_bytes``, e.g. the CSV header)
    plus this row stays under ``byte_cap`` AND fewer than ``count_cap``
    rows are accepted so far. A REJECTED row does not advance the totals
    (marketo utils.go:216-231 ``continue``; bing-ads populateZipFile
    else-branch), so this is a sequential fold, not a prefix cumsum —
    after one oversized row, later smaller rows still fit.

    ``inclusive=True`` accepts while ``total + size <= cap`` (marketo's
    ``currentSize+rowSize > maxSizeWithBuffer → skip``);
    ``inclusive=False`` accepts while ``total + size < cap`` (bing-ads /
    lytics ``newFileSize < fileSizeLimit``).

    ``skip_col`` (boolean) marks rows the manager never offers to the file
    (e.g. validation failures routed to the failed set BEFORE writing):
    they come back ``accepted=False`` and do not advance the totals —
    letting callers run ONE fold over the full frame instead of a
    filter + fold + union re-computation of the upstream projection.

    ``subgroup_cols`` fold independent sub-files (e.g. bing-ads' per-ACTION
    files) INSIDE one pandas group: same semantics as putting them in
    ``group_cols``, but one Arrow exchange instead of |subgroups|× — the
    per-group pandas setup cost (~15-20 ms) dominates small audit groups.

    Scale: groups are single upload files, bounded by the batcher's
    ``max_events_per_file`` — the Arrow-batched pandas fold is O(group)
    and group size is capped by construction; only group COUNT grows with
    the corpus. Rows arrive unsorted within the group; the fold sorts the
    bounded group, not the corpus.

    Plan shape (r9): the caller's shaped frame materializes ONCE via a
    lazy ``localCheckpoint`` — the single evaluation of the (often
    enormous: CSV render + validation ladder + sha256) projection; its
    blocks are reclaimed by the ContextCleaner when the returned plan is
    GC'd, so long-lived sessions don't accumulate cache (the r8 shape
    persisted a narrow frame with no unpersist, leaking blocks per call,
    AND re-ran the heavy lineage a second time in the join-back). The
    decision itself is join-free and window-free in the common case:
    - per-slice offered totals come from ONE map-side-combined groupBy
      on the narrow columns (slice count rows, not corpus rows), joined
      back to the checkpoint — a join whose small side is an aggregate,
      so AQE broadcasts it (no shuffle of the corpus; at extreme slice
      counts it degrades to a shuffle join, which is then correct);
    - slices that fit BOTH caps accept every offered row inline — pure
      codegen projection, no window, no per-row join;
    - only overflowing slices (bytes OR count) ship their 5 narrow
      columns through the Arrow fold and join their flags back — the
      fold's group is one upload file, bounded by the batcher's
      ``max_events_per_file``, so the Python loop is O(file), never
      O(corpus).
    Real pipelines size upload groups to fit, so at 100 TB the fold runs
    on the rare overflowing file; the common-case cost is one checkpoint
    pass + one tiny aggregate.

    CONTRACT: (group_cols, subgroup_cols, order_cols) must uniquely key
    rows (every caller orders by the jobsdb job_id) — the overflow flag
    join-back is 1:1 and the fold order must be deterministic. ENFORCED
    where it matters: the fast path never joins per-row (duplicates are
    harmless there), and the Arrow fold raises ValueError on a duplicate
    composite key instead of silently multiplying join-back rows. NULL
    ``size_col`` values count as 0 bytes (a NULL slice total must never
    drop the slice from both decision branches, as the r8 NULL ``__fb``
    shape did).
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    order = [str(c) for c in order_cols]
    size_name = str(size_col)
    cap = int(byte_cap)
    ccap = None if count_cap is None else int(count_cap)
    base = int(base_bytes)
    incl = bool(inclusive)
    out_name = str(out_col)
    skip_name = None if skip_col is None else str(skip_col)
    subs = [str(c) for c in subgroup_cols]

    def fold(pdf):
        # self-contained: workers may not have the repo on sys.path
        import numpy as np

        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        # the composite-key uniqueness CONTRACT is enforced here — the only
        # place it matters (the fast path never joins per-row; this fold's
        # flags do join back 1:1 and its scan order must be deterministic)
        if bool(pdf.duplicated(subset=subs + order).any()):
            raise ValueError(
                "sequential_accept: duplicate (group, subgroup, order) key "
                "— the admission fold requires a unique composite key"
            )
        sizes = pdf[size_name].to_numpy()
        skips = pdf[skip_name].to_numpy(dtype=bool) if skip_name else None
        offered = ~skips if skips is not None else np.ones(len(pdf), bool)

        # vectorized fast path — the overwhelmingly common case: when every
        # offered (sub)file's TOTAL fits under both caps, order is
        # irrelevant and every offered row is accepted. Real upload groups
        # are sized by the batcher to fit, so the Python state loop below
        # is the exception (a file actually overflowing), not the rule.
        def fits(total, n):
            return (total + base <= cap if incl else total + base < cap) and (
                ccap is None or n <= ccap
            )

        if subs:
            sub_df = pdf.loc[offered, subs]
            sums = sizes[offered] if len(sub_df) else sizes[:0]
            grouped_tot = (
                sub_df.assign(__sz=sums).groupby(subs, sort=False)["__sz"]
            )
            all_fit = all(
                fits(t, n)
                for t, n in zip(grouped_tot.sum(), grouped_tot.count())
            )
        else:
            all_fit = fits(int(sizes[offered].sum()), int(offered.sum()))
        if all_fit:
            pdf[out_name] = offered
            return pdf

        state: dict = {}
        flags = []
        keys = (
            list(zip(*[pdf[c] for c in subs])) if subs else [()] * len(pdf)
        )
        for i in range(len(pdf)):
            if not offered[i]:
                flags.append(False)
                continue
            total, n = state.get(keys[i], (base, 0))
            new = total + int(sizes[i])
            ok = (new <= cap if incl else new < cap) and (
                ccap is None or n < ccap
            )
            if ok:
                state[keys[i]] = (new, n + 1)
            flags.append(ok)
        pdf[out_name] = flags
        return pdf

    from functools import reduce

    offered_c = (
        ~F.coalesce(F.col(skip_name), F.lit(False))
        if skip_name
        else F.lit(True)
    )
    slice_keys = list(group_cols) + subs
    key_cols: list[str] = []
    for c in slice_keys + order:
        if c not in key_cols:
            key_cols.append(c)
    # single evaluation of the caller's shaped lineage: checkpoint the
    # full frame lazily (blocks are ContextCleaner-reclaimed when the
    # returned plan is GC'd — no unpersist bookkeeping, no harness-side
    # cache hygiene required). The slice-stats aggregate, the overflow
    # filter, AND both output branches read these blocks; the r8 shape
    # instead evaluated the heavy projection once for a narrow persist
    # (leaked — never unpersisted) and AGAIN in a per-row join-back (2x
    # the CSV render + validation ladder + sha256 per row).
    ck = df.localCheckpoint(eager=False)
    # NULL staged sizes count 0 bytes — a NULL slice total would
    # otherwise turn the fit decision NULL and drop the slice from both
    # branches (r8 bug, flagged in review)
    size0 = F.coalesce(F.col(size_name), F.lit(0))

    # per-slice offered totals: ONE map-side-combined aggregate over the
    # narrow columns — slice count rows out, not corpus rows
    on_slice = [F.col(c) for c in slice_keys] if slice_keys else []
    stats = (
        ck.groupBy(*on_slice)
        .agg(
            F.sum(F.when(offered_c, size0).otherwise(F.lit(0))).alias("__sa_tot"),
            F.sum(offered_c.cast("long")).alias("__sa_n"),
        )
    )
    tot = F.col("__sa_tot")
    fits_bytes = (tot + base <= cap) if incl else (tot + base < cap)
    fits_cnt = F.lit(True) if ccap is None else F.col("__sa_n") <= ccap
    stats = stats.select(
        *slice_keys, (fits_bytes & fits_cnt).alias("__sa_allfit")
    )

    # attach the per-slice verdict: the small side is a groupBy aggregate,
    # so AQE broadcasts it — no shuffle of the checkpointed corpus. With
    # no slice keys the verdict is a single row (broadcast scalar).
    if slice_keys:
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"__sa_l.{k}").eqNullSafe(F.col(f"__sa_r.{k}"))
                for k in slice_keys
            ],
        )
        decided = (
            ck.alias("__sa_l")
            .join(F.broadcast(stats).alias("__sa_r"), cond, "left")
            .select(
                *[F.col(f"__sa_l.{c}") for c in df.columns],
                F.col("__sa_r.__sa_allfit").alias("__sa_allfit"),
            )
        )
    else:
        decided = ck.crossJoin(F.broadcast(stats))

    # fitting slices accept every offered row — pure codegen, no window,
    # no per-row join (this is the common case: real pipelines size
    # upload groups to fit)
    fast = decided.where(F.col("__sa_allfit")).select(
        *df.columns, offered_c.alias(out_name)
    )

    # overflowing slices (bytes or count): ship the 5 narrow columns
    # through the Arrow fold, then join the flags back to just these rows
    slow_src = decided.where(~F.col("__sa_allfit"))
    sel = list(dict.fromkeys(
        list(key_cols) + [size_name] + ([skip_name] if skip_name else [])
    ))
    slow_narrow = slow_src.select(*sel).withColumn(size_name, size0)
    # fold schema from the CALLER's already-analyzed input schema (same
    # names/types — size0 only coalesces, never retypes): asking
    # slow_narrow for its schema re-analyzes the whole checkpoint lineage
    # for nothing (~50-80 ms of the per-call build cost)
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [by_name[c] for c in sel] + [StructField(out_col, BooleanType())]
    )
    if group_cols:
        grouped = slow_narrow.groupBy(*[F.col(c) for c in group_cols])
    else:
        grouped = slow_narrow.groupBy(F.lit(1).alias("__g"))
    slow_flags = grouped.applyInPandas(fold, schema=out_schema).select(
        *key_cols, out_name
    )
    # null-safe keys: a NULL group/order key still joins its flag back
    # (it formed its own fold group), where a plain equi-join would drop
    # it. shuffle_hash with the FLAGS side as build: broadcasting either
    # side is wrong at scale (one row per overflow row each), and the
    # planner's size estimates must not pick the rendered rows as build.
    jcond = reduce(
        lambda a, b: a & b,
        [
            F.col(f"__sa_l.{k}").eqNullSafe(F.col(f"__sa_r.{k}"))
            for k in key_cols
        ],
    )
    slow = (
        slow_src.alias("__sa_l")
        .join(slow_flags.hint("shuffle_hash").alias("__sa_r"), jcond, "inner")
        .select(
            *[F.col(f"__sa_l.{c}") for c in df.columns],
            F.col(f"__sa_r.{out_name}"),
        )
    )
    return fast.unionByName(slow)


# ------------------------------------------------------------------ marketo

def marketo_headers(fields_mapping) -> list[str]:
    """Header order from the destination config's column mapping: the
    mapped-TO (marketo field) names, first occurrence wins
    (createCSVFile's first pass, utils.go:170-176). Accepts the raw
    ``columnFieldsMapping`` list of {"from","to"} dicts (configParser.go:
    21-27) or an already-folded {from: to} dict; we keep DECLARED order
    where Go's map iteration randomizes (see module docstring)."""
    if isinstance(fields_mapping, dict):
        tos = list(fields_mapping.values())
    else:
        tos = [m["to"] for m in fields_mapping]
    out: list[str] = []
    for t in tos:
        if t not in out:
            out.append(t)
    return out


def marketo_csv_rows(
    jobs: DataFrame,
    fields_mapping,
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
    max_file_bytes: int = MARKETO_MAX_FILE_BYTES,
    estimate_buffer: float = MARKETO_ESTIMATE_BUFFER,
) -> DataFrame:
    """createCSVFile (marketo-bulk-upload/utils.go:153-236) as a relation:
    per job, the CSV row over the mapped headers (message values matched
    BY HEADER NAME, absent → "", JSON null → "<nil>", non-strings via
    their JSON text — fmt "%v" parity for ints/bools), its Go-escaped
    ``csv_line``, ``row_bytes`` (escaped length + CRLF, calculateRowSize
    parity), the sha256 ``data_hash`` of the raw values joined with ","
    (calculateHashCode, utils.go:238-248 — the poll-time row⇄job key),
    and ``accepted`` from the 95 %-of-10 MB admission fold seeded with the
    header row's bytes. Rejected rows are the manager's overflowedJobIDs
    (failed for retry)."""
    headers = marketo_headers(fields_mapping)
    header_line = go_csv_line_py(headers)
    # parse_json, NOT from_json(map<string,variant>): JsonToStructs blocks
    # whole-stage codegen for the entire projection (measured: every CSV
    # render in this module ran interpreted), while parse_json +
    # try_variant_get stay inside codegen. An ABSENT key is a NULL variant
    # (raw NULL), a present JSON null renders "null" — the same absent/nil
    # split map_contains_key used to provide.
    #
    # Built as SQL text (one F.expr per staged column, see the SQL-text
    # twins above): the Column form cost hundreds of py4j round-trips per
    # header and made plan CONSTRUCTION the q98 bottleneck. The payload
    # parses ONCE as a column (inlining the parse re-parses per header),
    # dropped before the fold (Arrow can't ship variant); vals stage as
    # _mk_N columns so the line, its byte length, and the hash reference
    # them without duplicating the extraction trees.
    names = [f"_mk_{i}" for i in range(len(headers))]

    def val_sql(h: str, raw_ref: str) -> str:
        return (
            f"CASE WHEN {raw_ref} IS NULL THEN ''"
            f" WHEN {raw_ref} = 'null' THEN '<nil>'"
            f" WHEN startswith({raw_ref}, '\"')"
            f" THEN {vget_sql('_fv', h, 'string')}"
            f" ELSE {raw_ref} END"
        )

    staged = (
        jobs.select("*", F.try_parse_json(F.col(payload_col)).alias("_fv"))
        .select(
            "*",
            *[
                F.expr(f"to_json({vget_sql('_fv', h, 'variant')})").alias(
                    f"_raw_{n}"
                )
                for h, n in zip(headers, names)
            ],
        )
        .select(
            "*",
            *[
                F.expr(val_sql(h, f"_raw_{n}")).alias(n)
                for h, n in zip(headers, names)
            ],
        )
    )
    shaped = staged.select(
        *jobs.columns,
        F.expr(go_csv_line_sql(names)).alias("csv_line"),
        F.expr(
            "sha2(concat_ws(',', " + ", ".join(names) + "), 256)"
        ).alias("data_hash"),
    ).select(
        "*", F.expr("octet_length(csv_line) + 2").alias("row_bytes")
    )
    return sequential_accept(
        shaped,
        size_col="row_bytes",
        byte_cap=int(max_file_bytes * estimate_buffer),
        order_cols=(job_id_col,),
        group_cols=group_cols,
        base_bytes=len(header_line.encode()) + 2,
        inclusive=True,
    )


# ------------------------------------------------------------------ bingads

def bingads_audience_template(audience_id: str, action: str) -> list[str]:
    """The 3-row Customer List file prelude (CreateActionFileTemplate,
    audience/types.go:79-91): column header, Format Version 6.0, and the
    Customer List action row carrying the audience id + action type."""
    rows = [
        ["Type", "Status", "Id", "Parent Id", "Client Id", "Modified Time",
         "Name", "Description", "Scope", "Audience", "Action Type",
         "Sub Type", "Text"],
        ["Format Version", "", "", "", "", "", "6.0", "", "", "", "", "", ""],
        ["Customer List", "", audience_id, "", "", "", "", "", "", "",
         action, "", ""],
    ]
    return [go_csv_line_py(r) for r in rows]


def bingads_audience_rows(
    jobs: DataFrame,
    audience_id: str,
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
    file_size_limit: int = 100 * 1024 * 1024,  # bulk_uploader.go:33
    events_limit: int = 4_000_000,  # bulk_uploader.go:34
) -> DataFrame:
    """createZipFile + populateZipFile (audience/util.go:106-196) as a
    relation. Jobs split per action file (Replace/Remove/Add); admission
    is per ACTION file on the staged line's bytes and a per-file event
    count (both strict-<, counted per JOB). Accepted jobs then explode
    ``message.List`` — one "Customer List Item" CSV row per list member
    with ClientId = jobId<<>>hashedEmail (newClientID, util.go:28-34;
    the 13-column write at util.go:116). Unknown actions get error rows
    (the reference would nil-deref; we keep-with-status). Output: one row
    per (accepted job × list member) plus one row per rejected/error job
    with NULL csv_line."""
    if not audience_id:
        raise ValueError("audienceId is empty")  # util.go:136-138
    p = F.col(payload_col)
    # ONE document parse: the message subtree extracted once, Action/List
    # pulled from it in one json_tuple (the r8 shape get_json_object'd the
    # full payload once per path — 3 parses/row)
    msg = F.get_json_object(p, "$.message")
    staged = F.to_json(
        F.struct(
            F.struct(
                F.col("_list").alias("List"),
                F.col("action").alias("Action"),
            ).alias("message"),
            F.struct(F.col(job_id_col).alias("job_id")).alias("metadata"),
        )
    )
    valid_action = F.col("action").isin(*BINGADS_AUDIENCE_ACTIONS)
    base = jobs.select(
        "*", F.json_tuple(msg, "Action", "List").alias("action", "_list")
    ).select(
        "*",
        F.octet_length(staged).alias("line_bytes"),
    )
    # one fold over everything: invalid-action rows ride through as skips
    folded = sequential_accept(
        base.withColumn("_skip", ~F.coalesce(valid_action, F.lit(False))),
        size_col="line_bytes",
        byte_cap=file_size_limit,
        order_cols=(job_id_col,),
        group_cols=tuple(group_cols),
        subgroup_cols=("action",),
        count_cap=events_limit,
        inclusive=False,
        skip_col="_skip",
    )
    # the List text rode the admission checkpoint as a narrow column, so
    # the member explode parses the small array, not the whole document
    users = F.from_json(
        F.col("_list"),
        "array<struct<email string, hashedEmail string>>",
    )
    # accepted jobs explode to member rows; rejected/invalid jobs keep one
    # NULL-member row with their error (kept-with-status, no union).
    # posexplode: ``member_index`` lets downstream audits count JOBS as
    # sum(member_index == 0) instead of a countDistinct — a mixed
    # DISTINCT + plain aggregate plans an Expand that doubles the corpus
    # (SCALE.md house rule)
    exploded = folded.select(
        "*",
        F.posexplode_outer(F.when(F.col("accepted"), users)).alias(
            "member_index", "_u"
        ),
    )
    # final shaping as SQL text (build-cost twins): constant cells escape
    # at PYTHON time via go_csv_field_py — same bytes the runtime
    # escaping produced, zero runtime ops; only the two member-derived
    # cells stay runtime expressions
    client_id_sql = (
        f"CASE WHEN _u IS NOT NULL THEN concat(cast({job_id_col} AS string),"
        f" {sql_str(CLIENT_ID_SEPARATOR)}, coalesce(_u.hashedEmail, '')) END"
    )
    const = {c: sql_str(go_csv_field_py(c)) for c in
             ("Customer List Item", audience_id, "Email", "")}
    # an accepted job with an empty List stays accepted but writes no
    # member rows (the reference's inner loop just doesn't run)
    line_sql = (
        "CASE WHEN _u IS NOT NULL THEN concat_ws(',', "
        + ", ".join(
            [const["Customer List Item"], const[""], const[""],
             const[audience_id],
             go_csv_field_sql("coalesce(client_id, '')")]
            + [const[""]] * 6
            + [const["Email"],
               go_csv_field_sql("coalesce(_u.hashedEmail, '')")]
        )
        + ") END"
    )
    err_sql = (
        "CASE WHEN _skip THEN 'invalid action' WHEN NOT accepted"
        " THEN 'file size/event limit reached' END"
    )
    return (
        exploded.select("*", F.expr(client_id_sql).alias("client_id"))
        .select(
            "*",
            F.expr(line_sql).alias("csv_line"),
            F.expr(err_sql).alias("error"),
        )
        .drop("_u", "_skip", "_list")
    )


_OFFLINE_TIME_FIELDS = ("conversionTime", "adjustedConversionTime")
_US_TIME_FMT = "M/d/yyyy h:mm:ss a"  # Go "1/2/2006 3:04:05 PM"


def _offline_parse_time(c: Column) -> Column:
    """validateAndTransformTimeFields parsing (offline util.go:514-542):
    RFC3339 or the US format, rendered back as US format (Go
    "1/2/2006 3:04:05 PM"). Z-suffixed and US-format inputs are wall
    clocks: parse and re-render in the SAME session tz, so the round trip
    is timezone-proof (DST-gap wall times excepted — documented edge).
    Explicit-offset forms are true instants, rendered at UTC."""
    wall = F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
        F.try_to_timestamp(c, F.lit(_US_TIME_FMT)),
    )
    ltz = F.try_to_timestamp(c)  # offset forms; render at UTC
    return F.coalesce(
        F.date_format(wall, _US_TIME_FMT),
        F.date_format(F.to_utc_timestamp(ltz, F.current_timezone()), _US_TIME_FMT),
    )


def bingads_offline_rows(
    jobs: DataFrame,
    is_hash_required: bool = False,
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
    file_size_limit: int = 100 * 1024 * 1024,
    events_limit: int = 1000,  # offline bulk_uploader.go:31
) -> DataFrame:
    """Transform + populateZipFile for offline conversions
    (offline-conversions/bulk_uploader.go:49-149, util.go:129-173) as a
    relation. Payload is the staged Record: ``{"action": ..., "fields":
    {...}}``. The validation ladder mirrors Transform's order: required
    conversionName/conversionTime (present, string, non-empty), time
    parse/rewrite to the US format, the enhanced-conversion gate
    (microsoftClickId, else email/phone — an explicit null email counts,
    Go's ``email != ""`` on a nil interface), adjustedConversionTime for
    non-insert, conversionValue for update. Values stringify (fmt "%v"
    parity via JSON text); email/phone sha256-hash when
    ``is_hash_required`` (hashFields, util.go:484-512). Valid jobs pass
    the per-action admission fold, then project the action's CSV row
    (Id = jobId, Restate/Retract adjustment types)."""
    p = F.col(payload_col)
    # the fields subtree's raw text extracts once and feeds BOTH the
    # variant parse and the staged line (the r8 shape additionally
    # try_parse_json'd the full payload — one more full-document parse
    # per row). NOT json_tuple: its Generate node splits the stage and
    # knocked the huge downstream projection (validation ladder + three
    # renders) out of whole-stage codegen — measured ~30% slower.
    # variant-path access instead of from_json(map<string,variant>): the
    # map parse is CodegenFallback-adjacent and knocked every downstream
    # projection (validation ladder, CSV render, hashing) out of
    # whole-stage codegen — parse_json + try_variant_get stay codegen
    fields_v = F.try_parse_json(F.col("_ftext"))

    # Materialize each known field's JSON text and string value ONCE in a
    # single projection — the error ladder and three row shapes then read
    # plain columns. Building them as per-call expression trees instead
    # (~20 variant-op subtrees per row) measured ~17x slower at sf0.01
    # because the trees re-evaluate past the fold's Arrow boundary where
    # common-subexpression elimination can't see across. The staging
    # projections are SQL text (one F.expr per column, see the SQL-text
    # twins): the Column form's per-op py4j round-trips made plan
    # construction the q98 bottleneck (r10 profile).
    keys = (
        "conversionName", "conversionTime", "adjustedConversionTime",
        "conversionValue", "microsoftClickId", "email", "phone",
        "conversionCurrencyCode", "externalAttributionCredit",
        "externalAttributionModel",
    )

    def _raw_sql(k: str) -> str:
        return f"to_json({vget_sql('_fv', k, 'variant')})"

    def _sv_sql(k: str) -> str:
        # the post-lo.MapValues stringification: nil → "", string as-is,
        # everything else via its JSON text
        r = f"_raw_{k}"
        return (
            f"CASE WHEN {r} IS NULL OR {r} = 'null' THEN ''"
            f" WHEN startswith({r}, '\"') THEN {vget_sql('_fv', k, 'string')}"
            f" ELSE {r} END"
        )

    staged = F.to_json(
        F.struct(
            F.struct(
                F.col("_ftext").alias("fields"),
                F.col("action").alias("action"),
            ).alias("message"),
            F.struct(F.col(job_id_col).alias("jobId")).alias("metadata"),
        )
    )
    # the variant map materializes ONCE as a column — inlining fields_v
    # into every _raw/_sv expression re-parses the fields subtree per key
    # (collapsed Projects defeat codegen CSE here: ~20 from_json per row
    # in the optimized plan)
    parsed = (
        jobs.select(
            "*",
            F.get_json_object(p, "$.action").alias("action"),
            F.get_json_object(p, "$.fields").alias("_ftext"),
        )
        .select(
            "*",
            F.octet_length(staged).alias("line_bytes"),
            fields_v.alias("_fv"),
        )
        .select("*", *[F.expr(_raw_sql(k)).alias(f"_raw_{k}") for k in keys])
        .select("*", *[F.expr(_sv_sql(k)).alias(f"_s_{k}") for k in keys])
    )

    def raw(k: str) -> Column:
        return F.col(f"_raw_{k}")

    def sval(k: str) -> Column:
        return F.col(f"_s_{k}")

    conv_time = _offline_parse_time(F.when(raw("conversionTime").startswith('"'), sval("conversionTime")))
    adj_time = _offline_parse_time(
        F.when(raw("adjustedConversionTime").startswith('"'), sval("adjustedConversionTime"))
    )
    # rendered times + job id stage as columns: the error ladder and all
    # three row shapes below are SQL text over plain column refs
    withtimes = parsed.select(
        "*",
        conv_time.alias("_ct"),
        adj_time.alias("_at"),
        F.col(job_id_col).cast("string").alias("_jid"),
    )

    def present(k: str) -> str:
        return f"_raw_{k} IS NOT NULL"

    def nonempty(k: str) -> str:
        return (
            f"(_raw_{k} IS NOT NULL AND startswith(_raw_{k}, '\"')"
            f" AND _raw_{k} != '\"\"')"
        )

    # enhanced-conversion gate (bulk_uploader.go:78-104): clickId must be
    # non-null non-empty; email/phone need only be present with any value
    # other than "" (a JSON null passes Go's interface != "" check)
    enhanced = (
        f"(({present('microsoftClickId')} AND _raw_microsoftClickId != 'null'"
        f" AND _raw_microsoftClickId != '\"\"')"
        f" OR ({present('email')} AND _raw_email != '\"\"')"
        f" OR ({present('phone')} AND _raw_phone != '\"\"'))"
    )
    actions_in = ", ".join(sql_str(a) for a in BINGADS_OFFLINE_ACTIONS)
    err_sql = (
        f"CASE WHEN action NOT IN ({actions_in}) THEN 'invalid action'"
        f" WHEN NOT {nonempty('conversionName')} THEN 'conversionName field invalid'"
        f" WHEN NOT {nonempty('conversionTime')} THEN 'conversionTime field invalid'"
        f" WHEN _ct IS NULL THEN 'conversionTime format invalid'"
        f" WHEN action != 'insert' AND {present('adjustedConversionTime')}"
        f" AND _at IS NULL THEN 'adjustedConversionTime format invalid'"
        f" WHEN NOT {enhanced} THEN 'missing required field: microsoftClickId"
        f" (or provide a hashed email/phone for enhanced conversions)'"
        f" WHEN action != 'insert' AND NOT ({present('adjustedConversionTime')}"
        f" AND _at IS NOT NULL) THEN 'adjustedConversionTime field invalid'"
        f" WHEN action = 'update' AND NOT {nonempty('conversionValue')}"
        f" THEN 'conversionValue field invalid' END"
    )

    def hashed(k: str) -> str:
        # hashFields hashes keys PRESENT in the (stringified) map — an
        # absent email/phone stays the struct-default "" unhashed
        if not is_hash_required:
            return f"_s_{k}"
        return (
            f"CASE WHEN {present(k)} THEN sha2(_s_{k}, 256) ELSE '' END"
        )

    email, phone = hashed("email"), hashed("phone")
    ftype = "'Offline Conversion'"
    insert_row = go_csv_line_sql(
        [ftype, "''", "_jid", "''", "''", "''",
         "_s_conversionCurrencyCode", "_s_conversionName",
         "coalesce(_ct, '')", "_s_conversionValue",
         "_s_microsoftClickId", email, phone,
         "_s_externalAttributionCredit", "_s_externalAttributionModel"]
    )
    update_row = go_csv_line_sql(
        [ftype, "'Restate'", "''", "_jid", "''",
         "_s_conversionName", "coalesce(_ct, '')",
         "_s_conversionValue", "_s_microsoftClickId", email, phone,
         "_s_conversionCurrencyCode", "coalesce(_at, '')"]
    )
    delete_row = go_csv_line_sql(
        [ftype, "'Retract'", "''", "_jid", "''",
         "_s_conversionName", "coalesce(_ct, '')",
         "_s_microsoftClickId", email, phone,
         "coalesce(_at, '')"]
    )
    # csv_line computed BEFORE the fold (same codegen stage as the error
    # ladder, shared subexpressions); the fold only appends `accepted`.
    # ONE fold over the whole frame — error rows ride through as skips
    # (they never reach the file and never advance its size), so the heavy
    # projection runs once instead of once per union branch.
    base = withtimes.select(
        "*",
        F.expr(err_sql).alias("error"),
        F.expr(
            f"CASE WHEN action = 'insert' THEN {insert_row}"
            f" WHEN action = 'update' THEN {update_row}"
            f" ELSE {delete_row} END"
        ).alias("_line"),
    ).drop(
        "_fv", "_ftext", "_ct", "_at", "_jid",
        *[f"_raw_{k}" for k in keys], *[f"_s_{k}" for k in keys],
    )
    folded = sequential_accept(
        base.withColumn("_skip", F.col("error").isNotNull()),
        size_col="line_bytes",
        byte_cap=file_size_limit,
        order_cols=(job_id_col,),
        group_cols=tuple(group_cols),
        subgroup_cols=("action",),
        count_cap=events_limit,
        inclusive=False,
        skip_col="_skip",
    )
    return folded.withColumn(
        "csv_line", F.when(F.col("accepted"), F.col("_line"))
    ).drop("_line", "_skip")


def bingads_offline_template(action: str) -> list[str]:
    """CreateActionFileTemplate for offline conversions (util.go:28-54):
    per-action column header + Format Version row."""
    if action == "insert":
        rows = [
            ["Type", "Status", "Id", "Parent Id", "Client Id", "Name",
             "Conversion Currency Code", "Conversion Name", "Conversion Time",
             "Conversion Value", "Microsoft Click Id", "Hashed Email Address",
             "Hashed Phone Number", "External Attribution Credit",
             "External Attribution Model"],
            ["Format Version", "", "", "", "", "6.0", "", "", "", "", "", "",
             "", "", ""],
        ]
    elif action == "update":
        rows = [
            ["Type", "Adjustment Type", "Client Id", "Id", "Name",
             "Conversion Name", "Conversion Time", "Adjustment Value",
             "Microsoft Click Id", "Hashed Email Address",
             "Hashed Phone Number", "Adjusted Currency Code",
             "Adjustment Time"],
            ["Format Version", "", "", "", "6.0", "", "", "", "", "", "", "",
             ""],
        ]
    else:
        rows = [
            ["Type", "Adjustment Type", "Client Id", "Id", "Name",
             "Conversion Name", "Conversion Time", "Microsoft Click Id",
             "Hashed Email Address", "Hashed Phone Number",
             "Adjustment Time"],
            ["Format Version", "", "", "", "6.0", "", "", "", "", "", ""],
        ]
    return [go_csv_line_py(r) for r in rows]


# ------------------------------------------------------------------- lytics

def lytics_csv_rows(
    jobs: DataFrame,
    stream_traits_mapping: list[dict],
    payload_col: str = "payload",
    job_id_col: str = "job_id",
    group_cols: tuple = (),
    file_size_limit: int = 10 * 1024 * 1024,  # lytics manager.go:22
) -> DataFrame:
    """PopulateCsvFile (lytics_bulk_upload/utils.go:20-97) as a relation:
    one CSV cell per streamTraitsMapping entry (header = lyticsProperty,
    in mapping order — duplicates keep their slots), values plucked from
    ``message.properties`` by rudderProperty: strings as-is, other JSON
    scalars via their text, JSON null → "<nil>" (Go fmt "%v" of nil),
    absent → "". Admission is the strict-< byte fold on the staged line
    (PopulateCsvFile's newFileSize check — note lytics has NO event-count
    cap). The header row exists iff the file accepted ≥1 job
    (utils.go:76-84)."""
    p = F.col(payload_col)
    # ONE document parse: the properties subtree's raw text extracted
    # once; the variant parse and the staged line both read it (the r8
    # shape parsed the full payload twice per row). Variant-path access
    # keeps the projection in whole-stage codegen (see marketo_csv_rows);
    # absent key = NULL raw, present null = "null"
    ptext = F.get_json_object(p, "$.message.properties")
    props = F.try_parse_json(F.col("_ptext"))

    def val(rudder_prop: str) -> Column:
        raw = F.to_json(
            F.try_variant_get(F.col("_fv"), _vpath(rudder_prop), "variant")
        )
        return (
            F.when(raw.isNull(), F.lit(""))
            .when(raw == "null", F.lit("<nil>"))
            .when(
                raw.startswith('"'),
                F.try_variant_get(F.col("_fv"), _vpath(rudder_prop), "string"),
            )
            .otherwise(raw)
        )

    # one parse of message.properties as a column (see marketo/bing-ads),
    # dropped before the fold — Arrow can't ship variant
    vals = [val(m["rudderProperty"]) for m in stream_traits_mapping]
    line = go_csv_line(vals)
    staged = F.to_json(
        F.struct(
            F.struct(F.col("_ptext").alias("properties")).alias("message"),
            F.struct(F.col(job_id_col).alias("job_id")).alias("metadata"),
        )
    )
    shaped = (
        jobs.select("*", ptext.alias("_ptext"))
        .select("*", props.alias("_fv"))
        .select(
            *jobs.columns,
            line.alias("csv_line"),
            F.octet_length(staged).alias("line_bytes"),
        )
    )
    return sequential_accept(
        shaped,
        size_col="line_bytes",
        byte_cap=file_size_limit,
        order_cols=(job_id_col,),
        group_cols=group_cols,
        inclusive=False,
    )


def lytics_headers(stream_traits_mapping: list[dict]) -> list[str]:
    """The header row (utils.go:76-84) — lyticsProperty per mapping slot."""
    return [m["lyticsProperty"] for m in stream_traits_mapping]
