"""rudder_server_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rudderlabs/rudder-server.

The reference (read-only at /root/reference) is a Go event pipeline: HTTP
gateway -> processor dataflow -> routers -> warehouse materialization. This
package re-expresses every computation it performs as idiomatic PySpark
(DataFrame / SQL / Structured Streaming), designed for a multi-executor
cluster at 100 TB scale while testable on local[N].

Layout:
    session.py    SparkSession factory (AQE, UTC, Arrow on)
    sources/      fixture loaders, rudder_events generator, staging readers
    functions/    scalar function library (names, type inference, ids)
    operators/    reusable DataFrame operators (flatten, dedup, identity, ...)
    plans/        declared queries Q1-Q28 + oracle SQL (the correctness contract)
    streaming/    Structured Streaming shell (micro-batch pipeline)
"""

__version__ = "0.1.0"
