"""Declared-query registry: the SURVEY §2.11 correctness contract.

Each entry pairs a PySpark implementation (spark, sf_dir) -> DataFrame with a
DuckDB-dialect oracle SQL string over the same fixture tables. Column names
are aliased identically on both sides — the driver sorts columns by name
before value-hashing.

Determinism policy (SURVEY §7 "hard parts"):
  - every float aggregate casts its per-row expression to DECIMAL(18,6)
    before SUM so the sum is exact and order-independent, then rounds and
    casts back to DOUBLE on output;
  - every query has a total deterministic ORDER BY (unique key, ties broken);
  - timestamps stay native (both engines truncate the parquet ns to µs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → non-SQL-expressible (rows-only check)
    doc: str = ""
    tags: tuple = field(default_factory=tuple)
    # Semantic floor for oracle-less (approximate) queries: called with the
    # collected result rows, returns an error string on violation, else
    # None. Exists because "approximate → rows-only" once let a crash hide
    # behind a cardinality check (r3 t57): the sweep can now fail these
    # queries on MEANING (recall floors, rank shapes), not just exceptions.
    invariant: Optional[Callable[[list], Optional[str]]] = None


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: Optional[str],
    doc: str = "",
    tags: tuple = (),
    invariant: Optional[Callable[[list], Optional[str]]] = None,
):
    def deco(fn):
        REGISTRY[name] = QueryDef(
            name=name, spark_fn=fn, oracle=oracle, doc=doc, tags=tags,
            invariant=invariant,
        )
        return fn

    return deco


def topk_shape_invariant(k: int, exact: bool = False, id_col: str = "vec_id"):
    """Invariant factory for ANN top-k outputs ((vec_id, sim) rows):
    bounded row count (== k when ``exact``), distinct neighbor ids, and
    every cosine inside [-1, 1]."""

    def check(rows) -> Optional[str]:
        if exact and len(rows) != k:
            return f"expected exactly {k} rows, got {len(rows)}"
        if not rows or len(rows) > k:
            return f"expected 1..{k} rows, got {len(rows)}"
        ids = [r[id_col] for r in rows]
        if len(set(ids)) != len(ids):
            return f"duplicate neighbor ids: {ids}"
        for r in rows:
            if r["sim"] is None or not -1.0000001 <= r["sim"] <= 1.0000001:
                return f"sim out of [-1,1]: {r}"
        return None

    return check


def load_all() -> dict[str, QueryDef]:
    """Import every plan module so their @register calls populate REGISTRY."""
    from rudder_server_spark.plans import core, textsim, rudder, training  # noqa: F401

    return REGISTRY
