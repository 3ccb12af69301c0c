"""Column/table name safety (reference P6).

Reimplements the reference's naming rules as pure Python applied driver-side
to schemas (embedded/warehouse/columns.go, internal/snakecase/,
internal/reservedkeywords/, warehouse/utils): snake_case, strip non-alnum,
prefix '_' when digit-leading, reserved-word escape, length truncation.
"""

from __future__ import annotations

import re

# A representative subset of the reference's reserved keywords
# (internal/reservedkeywords/reservedkeywords.go) — ANSI + warehouse-common.
RESERVED = {
    "select", "from", "where", "group", "order", "by", "table", "column",
    "user", "users", "join", "inner", "outer", "left", "right", "on", "as",
    "and", "or", "not", "null", "true", "false", "case", "when", "then",
    "else", "end", "union", "all", "distinct", "limit", "offset", "having",
    "between", "like", "in", "exists", "create", "drop", "alter", "insert",
    "update", "delete", "into", "values", "primary", "key", "index", "view",
}

_CAMEL_1 = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL_2 = re.compile(r"([a-z0-9])([A-Z])")
_NON_ALNUM = re.compile(r"[^a-zA-Z0-9_]+")
_MULTI_US = re.compile(r"_+")


def snake_case(name: str) -> str:
    """camelCase / mixed → snake_case (internal/snakecase semantics)."""
    s = _NON_ALNUM.sub("_", name)
    s = _CAMEL_1.sub(r"\1_\2", s)
    s = _CAMEL_2.sub(r"\1_\2", s)
    s = _MULTI_US.sub("_", s).strip("_").lower()
    return s


def safe_column_name(name: str, max_len: int = 63) -> str:
    """Full safety pipeline: snake_case → digit-prefix guard → reserved-word
    escape (`_<name>` mirroring the reference's `_RESERVED` handling) →
    truncation (Postgres 63-char identifier limit; Redshift 127)."""
    s = snake_case(name)
    if not s:
        s = "_"
    if s[0].isdigit():
        s = "_" + s
    if s in RESERVED:
        s = "_" + s
    return s[:max_len]


def safe_table_name(name: str, max_len: int = 127) -> str:
    return safe_column_name(name, max_len=max_len)


def to_provider_case(provider: str, name: str) -> str:
    """Warehouse-accepted identifier case (warehouse/utils/utils.go:527-537
    ToProviderCase): Snowflake (and Snowpipe streaming) uppercase table/
    column/schema names; every other destination keeps them as-is."""
    if provider.upper() in ("SNOWFLAKE", "SNOWPIPE_STREAMING"):
        return name.upper()
    return name
