"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (Q20 3-way join + agg + top-k) at sf0.001.
queries()     — every declared query/operator from SURVEY §2.11 + the
                training-data pipeline surface (rudder_server_spark/plans/).
oracle_sql()  — DuckDB equivalents; approximate operators (MinHash recall,
                LSH probing) are omitted → rows-only check by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from rudder_server_spark.plans.registry import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    return reg["q20_tpch_q3"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _registry()
    return {name: qd.spark_fn for name, qd in reg.items()}


def oracle_sql() -> dict[str, str]:
    reg = _registry()
    return {name: qd.oracle for name, qd in reg.items() if qd.oracle is not None}
