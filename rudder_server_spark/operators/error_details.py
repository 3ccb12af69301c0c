"""Error-detail reporting — enterprise/reporting/error_extractor.go,
error_normalizer.go, error_grouper.go: the failed-job error analytics
pipeline. Per failed job the reporter extracts a human error message from
the destination's sample response, normalizes it (URLs/IPs/emails/ids →
placeholders so retries of the same failure collapse), truncates it,
derives an error code (statTags else deprecation detection), and groups
counts per (source, destination, PU, event type) × error message.

Spark-first mapping — everything is whole-stage-codegen column work over
the failed-jobs relation; the rollup is one groupBy:

- ``extract_error_message`` — getSimpleMessage's handler ladder
  (error_extractor.go:122-230): non-JSON responses pass through; JSON
  responses try ``reason`` (verbatim), ``Error`` (first line of a
  non-JSON string), ``response``/``error`` (nested-JSON message-key
  search / HTML stripping / verbatim), the three warehouse failure keys
  (uniq'd ``errors`` array joined with '.'), then the direct fallbacks
  (``msg``, ``destinationResponse``.<message keys>, top-level message
  keys, ``errors`` join). DETERMINISM NOTE: the reference iterates the
  top-level JSON map in Go's random order and returns the first handler
  hit — responses carrying MULTIPLE handler keys are nondeterministic in
  the reference itself; this implementation applies the handlers in the
  fixed documented order above, which agrees with the reference on every
  single-handler-key response (the deterministic subset the tests and
  the q107 oracle pin). The recursive findKeys walk is likewise bounded
  here to the documented shapes (top level + destinationResponse + the
  nested response document), not an arbitrary-depth walk.
- ``clean_error_message`` — CleanUpErrorMessage's regex chain
  (:29-36, 380-392), byte-for-byte the same patterns (including the
  reference's literal ``[A-Z|a-z]`` TLD class).
- ``truncate_error_message`` — message[:200] + '...' (:239-249).
- ``error_code`` — statTags errorCategory:errorType first; deprecation
  keyword-set detection otherwise, skipped for warehouse destinations
  (:397-444, deprecationKeywordSets :40-91).
- ``group_error_details`` — error_grouper.go: counts summed per
  (source, destination, PU, event type) × error message.

HTML responses strip via a tag-removal regex rather than the html2text
library (not in this environment); the structural behavior (tags gone,
text kept) matches, exact whitespace rendering may differ — documented,
unit-tested against our semantics, excluded from the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# defaultErrorMessageKeys (error_extractor.go:38) — priority order
DEFAULT_MESSAGE_KEYS = (
    "error_message", "message", "description", "detail", "error", "title"
)

# warehouseutils.WarehouseDestinations — deprecation detection is skipped
# for these (GetErrorCode, error_extractor.go:430-434)
WAREHOUSE_DESTINATIONS = (
    "RS", "BQ", "SNOWFLAKE", "POSTGRES", "CLICKHOUSE", "MSSQL",
    "AZURE_SYNAPSE", "DELTALAKE", "S3_DATALAKE", "GCS_DATALAKE",
    "AZURE_DATALAKE",
)

# deprecationKeywordSets (error_extractor.go:40-91): context key →
# keyword sets; a message flags when it contains the context key AND every
# keyword of at least one set
DEPRECATION_KEYWORD_SETS = {
    "version": [
        ["action required", "api"], ["api", "removed"], ["api", "retired"],
        ["deprecated"], ["discontinued"], ["end of life"],
        ["end of service"], ["end of support"], ["expiring"], ["expired"],
        ["maintenance mode"], ["no longer available"],
        ["no longer supported"], ["not active"], ["outdated"],
        ["phased out"], ["please upgrade"], ["scheduled", "deprecation"],
        ["sunset"], ["support ending"], ["unsupported"], ["not supported"],
        ["upgrade", "required"],
    ],
    "endpoint": [
        ["deprecated"], ["removed"], ["unsupported"], ["unavailable"],
        ["obsolete"], ["outdated"], ["not supported"], ["end of life"],
        ["end of service"], ["end of support"], ["expiring"],
        ["maintenance mode"], ["no longer available"],
        ["no longer supported"],
    ],
    "api": [
        ["deprecated"], ["no longer supported"], ["end of life"],
        ["end of service"], ["end of support"], ["maintenance mode"],
        ["no longer available"], ["no longer supported"],
    ],
}


def _is_json(c: Column) -> Column:
    """IsJSON (error_extractor.go:359-377): parses AND ends with the
    matching close brace/bracket after whitespace removal."""
    t = F.trim(c)
    return F.try_parse_json(t).isNotNull() & (
        (t.startswith("{") & t.endswith("}"))
        | (t.startswith("[") & t.endswith("]"))
    )


def _vstr(v: Column) -> Column:
    """Variant → string when the value IS a string; NULL otherwise (the
    reference's `value.(string)` type assertions)."""
    return F.when(
        F.to_json(v).startswith('"'), F.try_variant_get(v, "$", "string")
    )


def _errors_join(v: Column, uniq: bool) -> Column:
    """errors array → fmt.Sprint elements joined with '.'
    (convertInterfaceArrToStrArrWithDelimitter; warehouse path uniq's
    first — getErrorFromWarehouse, error_extractor.go:346-357)."""
    arr = F.try_variant_get(v, "$", "array<variant>")
    strs = F.transform(
        arr,
        lambda e: F.coalesce(
            F.when(F.to_json(e).startswith('"'), e.cast("string")).otherwise(
                F.to_json(e)
            ),
            F.lit("<nil>"),
        ),
    )
    if uniq:
        strs = F.array_distinct(strs)
    return F.when(F.size(arr) > 0, F.array_join(strs, "."))


def _msg_keys_from(v: Column, keys) -> Column:
    """findFirstExistingKey over the message keys at this object's top
    level (string values only) — the bounded form of the recursive walk
    (see module docstring)."""
    out = F.lit(None).cast("string")
    got = None
    for k in keys:
        cand = _vstr(F.try_variant_get(v, f"$.{k}", "variant"))
        got = cand if got is None else F.coalesce(got, cand)
    return F.coalesce(got, out)


def _message_from_response(v: Column, keys) -> Column:
    """getErrorMessageFromResponse (error_extractor.go:304-344): ``msg``
    verbatim → destinationResponse message keys → top-level message keys
    → ``errors`` array joined with '.'."""
    return F.coalesce(
        _vstr(F.try_variant_get(v, "$.msg", "variant")),
        _msg_keys_from(F.try_variant_get(v, "$.destinationResponse", "variant"), keys),
        _msg_keys_from(v, keys),
        _errors_join(F.try_variant_get(v, "$.errors", "variant"), uniq=False),
    )


def _is_html(c: Column) -> Column:
    low = F.lower(c)
    return (
        (low.contains("<!doctype") & low.contains("<html"))
        | (low.contains("<body") & low.contains("</body>"))
        | (
            low.contains("<html")
            & (low.contains("<title>") | low.contains("<head>"))
        )
    )


def _strip_html(c: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(c, "<[^>]*>", " "), r"\s+", " ")
    )


def _handle_response_or_error(s: Column, keys) -> Column:
    """handleResponseOrErrorKey (error_extractor.go:190-206): nested JSON
    → message-key search of the nested document; HTML → text; else
    verbatim."""
    nested = F.try_parse_json(F.trim(s))
    return (
        F.when(_is_json(s), _message_from_response(nested, keys))
        .when(_is_html(s), _strip_html(s))
        .otherwise(s)
    )


def extract_error_message(col: Column, message_keys=DEFAULT_MESSAGE_KEYS) -> Column:
    """GetErrorMessage minus clean/truncate (getSimpleMessage ladder)."""
    v = F.try_parse_json(F.trim(col))
    reason = _vstr(F.try_variant_get(v, "$.reason", "variant"))
    err_go = _vstr(F.try_variant_get(v, "$.Error", "variant"))
    # handleError: non-JSON string → its first line; JSON string → ""
    err_go = F.when(
        err_go.isNotNull() & ~_is_json(err_go),
        F.split_part(err_go, F.lit("\n"), F.lit(1)),
    )
    response = _vstr(F.try_variant_get(v, "$.response", "variant"))
    error_s = _vstr(F.try_variant_get(v, "$.error", "variant"))
    wh = None
    for k in (
        "internal_processing_failed",
        "fetching_remote_schema_failed",
        "exporting_data_failed",
    ):
        cand = _errors_join(
            F.try_variant_get(v, f"$.{k}.errors", "variant"), uniq=True
        )
        wh = cand if wh is None else F.coalesce(wh, cand)
    handled = F.coalesce(
        reason,
        err_go,
        F.when(response.isNotNull(), _handle_response_or_error(response, message_keys)),
        F.when(error_s.isNotNull(), _handle_response_or_error(error_s, message_keys)),
        wh,
        _message_from_response(v, message_keys),
    )
    return F.when(~_is_json(col), col).otherwise(F.coalesce(handled, F.lit("")))


def clean_error_message(c: Column) -> Column:
    """CleanUpErrorMessage (error_extractor.go:380-392) — the exact regex
    chain: URLs, IPs, emails, digit-bearing word tokens, non-word runs,
    whitespace runs → single spaces; trimmed."""
    r = F.regexp_replace(c, r"\b((?:https?://|www\.)\S+)\b", " ")
    r = F.regexp_replace(r, r"\b(?:\d{1,3}\.){3}\d{1,3}\b", " ")
    r = F.regexp_replace(
        r, r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b", " "
    )
    r = F.regexp_replace(r, r"\b([a-zA-Z0-9-_]*\d[a-zA-Z0-9-_]*)\b", " ")
    r = F.regexp_replace(r, r"\W+", " ")
    r = F.regexp_replace(r, r"\s+", " ")
    return F.trim(r)


def truncate_error_message(c: Column, max_length: int = 200) -> Column:
    """truncateMessage (error_extractor.go:239-249)."""
    return F.when(
        F.length(c) > max_length,
        F.concat(F.substring(c, 1, max_length), F.lit("...")),
    ).otherwise(c)


def _deprecation_flag(cleaned_lower: Column) -> Column:
    """isVersionDeprecationError (error_extractor.go:410-424): '-' → ' ',
    lowercase; needs the context key present (prefix or space-prefixed)
    AND all keywords of at least one of its sets."""
    msg = F.regexp_replace(cleaned_lower, "-", " ")

    def has(kw: str) -> Column:
        return msg.startswith(kw) | msg.contains(" " + kw)

    flag = F.lit(False)
    for ctx_key, sets in DEPRECATION_KEYWORD_SETS.items():
        ctx = has(ctx_key)
        any_set = F.lit(False)
        for kws in sets:
            all_kw = F.lit(True)
            for kw in kws:
                all_kw = all_kw & has(kw)
            any_set = any_set | all_kw
        flag = flag | (ctx & any_set)
    return flag


def error_code(
    error_message: Column,
    stat_category: Column,
    stat_type: Column,
    dest_type: Column,
) -> Column:
    """GetErrorCode (error_extractor.go:428-444): statTags
    errorCategory:errorType wins (present parts only); deprecation
    detection otherwise, skipped for warehouse destinations."""
    tags = F.concat_ws(":", stat_category, stat_type)
    low = F.lower(error_message)
    return (
        F.when(tags != "", tags)
        .when(dest_type.isin(*WAREHOUSE_DESTINATIONS), F.lit(""))
        .when(_deprecation_flag(low), F.lit("deprecation"))
        .otherwise(F.lit(""))
    )


def group_error_details(
    df: DataFrame,
    group_cols=("source_id", "destination_id", "pu", "event_type"),
    message_col: str = "error_message",
    code_col: str = "error_code",
    count_col: str | None = None,
) -> DataFrame:
    """error_grouper.go groupByConnection + mergeMetricGroupsByErrorMessage:
    counts summed per connection grain × error message (the code rides
    along — it is a function of the message/tags)."""
    cnt = (
        F.sum(F.col(count_col)) if count_col else F.count(F.lit(1))
    ).alias("count")
    return df.groupBy(
        *group_cols, F.col(code_col), F.col(message_col)
    ).agg(cnt)
