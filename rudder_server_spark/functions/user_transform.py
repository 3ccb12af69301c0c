"""User-transformation surface (reference P12).

The reference runs customer JS/Python functions over event batches via a
remote transformer service (`/customTransform`,
processor/internal/transformer/user_transformer/user_transformer.go,
invoked processor/processor.go:3147-3530); each event comes back
transformed, dropped, or failed, and failures become proc_error jobs.

Spark-first: the UDF registry is a dict of per-event Python callables
``fn(event: dict) -> dict | None`` (None = drop, raise = fail), applied as
ONE Arrow-batched ``mapInPandas`` pass over the event frame. Per-event
error isolation matches the reference: an exception fails that event only,
routed to the failed-events output with the error message, never the batch.

The callable is captured by value in the mapInPandas closure (cloudpickle),
so worker processes do not need the registry module importable — the same
property the engine's driver-portability relies on everywhere.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

from pyspark.sql import DataFrame

TransformFn = Callable[[dict], "dict | None"]

_REGISTRY: dict[str, TransformFn] = {}


def register_transform(name: str, fn: TransformFn) -> None:
    """Register a user transformation under a (workspace-scoped) name."""
    _REGISTRY[name] = fn


def get_transform(name: str) -> TransformFn:
    return _REGISTRY[name]


def apply_user_transform(
    df: DataFrame,
    fn: TransformFn | str,
    payload_col: str = "payload",
) -> tuple[DataFrame, DataFrame]:
    """Run a user transformation over the event frame.

    Returns ``(ok, failed)``:
      - ``ok``: rows whose payload the function transformed (dropped events
        removed), original columns preserved, payload replaced.
      - ``failed``: original rows + an ``error`` column (the reference's
        proc_error path).
    """
    if isinstance(fn, str):
        fn = get_transform(fn)

    cols = df.columns
    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes] + ["`_error` string"]
    )
    pc = payload_col
    user_fn = fn  # captured by value via cloudpickle

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            new_payloads, errors, keep = [], [], []
            for payload in pdf[pc]:
                try:
                    ev = json.loads(payload) if payload is not None else None
                    res = user_fn(ev)
                    if res is None:
                        keep.append(False)
                        new_payloads.append(None)
                        errors.append(None)
                    else:
                        keep.append(True)
                        new_payloads.append(json.dumps(res, separators=(",", ":")))
                        errors.append(None)
                except Exception as ex:  # per-event failure isolation
                    keep.append(True)
                    new_payloads.append(payload)
                    errors.append(f"{type(ex).__name__}: {ex}")
            out = pdf.copy()
            out[pc] = pd.Series(new_payloads, index=pdf.index, dtype=object)
            out["_error"] = pd.Series(errors, index=pdf.index, dtype=object)
            yield out[pd.Series(keep, index=pdf.index)]

    result = df.mapInPandas(run, out_schema)
    ok = result.where(result["_error"].isNull()).drop("_error").select(*cols)
    failed = result.where(result["_error"].isNotNull()).withColumnRenamed("_error", "error")
    return ok, failed


def hydrate_sources(
    df: DataFrame,
    hydration_sources: "set[str] | list[str]",
    hydrator: TransformFn | str,
    payload_col: str = "payload",
    source_col: str = "source_id",
    fail_on_error: bool = False,
) -> "tuple[DataFrame, DataFrame]":
    """P15 source-hydration stage (processor/src_hydration_stage.go:51-180,
    sourcehydration/source_hydration.go Hydrate): events of
    hydration-enabled sources are batch-enriched by a source-defined
    remote step before any transformation; events of other sources pass
    through untouched.

    Spark-first: the ENABLED slice runs through one Arrow mapInPandas
    pass applying ``hydrator(event) -> dict`` with the same per-event
    failure isolation as apply_user_transform (the reference reports
    hydration failures and drops those events unless failOnError aborts
    the batch); the passthrough slice never leaves the JVM. The split is
    a pushed-down source_id predicate on both branches — at 100 TB only
    the hydrating sources' row groups ever reach Python.

    Returns ``(hydrated_plus_passthrough, failed)``; raises on any
    failure when ``fail_on_error`` (Processor.SourceHydration.failOnError).
    """
    from pyspark.sql import functions as F

    srcs = sorted(set(hydration_sources))
    if not srcs:
        empty_failed = df.withColumn("error", F.lit(None).cast("string")).where(
            F.lit(False)
        )
        return df, empty_failed
    enabled = df.where(F.col(source_col).isin(srcs))
    passthrough = df.where(
        ~F.col(source_col).isin(srcs) | F.col(source_col).isNull()
    )
    ok, failed = apply_user_transform(enabled, hydrator, payload_col=payload_col)
    if fail_on_error:
        bad = failed.select("error").first()
        if bad is not None:
            raise RuntimeError(f"source hydration failed: {bad['error']}")
    return ok.unionByName(passthrough), failed
