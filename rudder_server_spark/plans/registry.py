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


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str], doc: str = "", tags: tuple = ()):
    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, spark_fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every plan module so their @register calls populate REGISTRY."""
    from rudder_server_spark.plans import core, textsim, rudder, training  # noqa: F401

    return REGISTRY
