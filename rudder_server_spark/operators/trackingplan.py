"""Tracking-plan validation (reference P14).

The reference validates events against a JSON-schema tracking plan via the
remote transformer (trackingplan_validation.go:74-144,
processor/trackingplan.go); violations are annotated on the event
(`validationErrors`) and the event is allowed or dropped per config.

Spark-first: rather than a row-at-a-time JSON-schema interpreter, the plan
(a declarative dict) COMPILES to native column expressions — every rule is
a `when()` over a single shared `from_json`/`get_json_object` extraction,
so validation stays inside whole-stage codegen. Violations land in a
`violation_errors` array column (the reference's `json`-typed annotation,
datatype.go:63-66).

Supported rule forms (the subset the reference's plans exercise):
  required:       ["properties.price", ...]         — path must be non-null
  types:          {"properties.price": "number"}    — number|string|boolean
  allowed_events: ["Order Completed", ...]          — track event whitelist
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TYPE_CHECK = {
    "number": "double",
    "integer": "bigint",
    "string": "string",
    "boolean": "boolean",
}


def compile_plan(
    plan: dict,
    payload_col: str = "payload",
    event_name_col: str = "event_name",
) -> Column:
    """Compile a tracking plan into a violation_errors array expression."""
    v = F.try_parse_json(F.col(payload_col))
    checks: list[Column] = []

    for path in plan.get("required", ()):
        got = F.try_variant_get(v, f"$.{path}", "string")
        checks.append(
            F.when(got.isNull(), F.lit(f"missing required property: {path}"))
        )

    for path, typ in plan.get("types", {}).items():
        tgt = _TYPE_CHECK[typ]
        present = F.try_variant_get(v, f"$.{path}", "string")
        typed = F.try_variant_get(v, f"$.{path}", tgt)
        checks.append(
            F.when(
                present.isNotNull() & typed.isNull(),
                F.lit(f"type mismatch: {path} must be {typ}"),
            )
        )

    allowed = plan.get("allowed_events")
    if allowed:
        checks.append(
            F.when(
                F.col(event_name_col).isNotNull()
                & ~F.col(event_name_col).isin(list(allowed)),
                F.concat(F.lit("event not in tracking plan: "), F.col(event_name_col)),
            )
        )

    if not checks:
        return F.array().cast("array<string>")
    return F.array_compact(F.array(*checks))


def validate_tracking_plan(
    df: DataFrame,
    plan: dict,
    payload_col: str = "payload",
    event_name_col: str = "event_name",
    drop_invalid: bool = False,
) -> DataFrame:
    """Annotate (and optionally drop) per the tracking plan.

    Adds ``violation_errors array<string>``; with ``drop_invalid`` the
    violating events are filtered out (the reference's per-config
    allow/drop switch, trackingplan.go).
    """
    out = df.withColumn(
        "violation_errors", compile_plan(plan, payload_col, event_name_col)
    )
    if drop_invalid:
        out = out.where(F.size("violation_errors") == 0)
    return out
