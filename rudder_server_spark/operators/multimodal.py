"""Multimodal (image/audio/video) column plumbing.

Design: media lives as an opaque `binary` column plus typed metadata columns
(`mime`, `width`, `height`, `duration_ms`, ...). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` stages so the heavy
per-item work stays vectorized and partition-local (no shuffle). At 100 TB
the binary payloads dominate IO: store them in their own parquet column (or
side files with pointer columns) so queries that don't touch bytes never
read them (column pruning).

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
actual byte → pixels/samples step is stubbed: `decode_stub` raises
NotImplementedError unless `fake=True`, in which case it produces a
deterministic fake "decode" (byte length + first-byte codepoint) with the
same schema, partitioning, and batch shape the real decoder would use.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_media(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """binary payload → decoded features via mapInPandas.

    Real decoders plug in by replacing the closure body; the Spark-side
    contract (schema, Arrow batching, partition-locality) is identical.

    NOTE: the UDF is a self-contained closure (no module-global references)
    so cloudpickle ships it by value — Python workers need neither this
    package on sys.path nor addPyFile.
    """
    if not fake:
        raise NotImplementedError(
            "media decode libraries are not available in this environment; "
            "pass fake=True for the deterministic stub"
        )

    src = df.select(F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # worker-side import

        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "first_byte": payloads.map(lambda b: int(b[0]) if b else -1),
                    # deterministic fake "feature vector": 4 byte stats
                    "feature": payloads.map(
                        lambda b: [
                            float(len(b)),
                            float(b[0]) if b else -1.0,
                            float(b[-1]) if b else -1.0,
                            float(sum(b[:16]) % 251),
                        ]
                        if b is not None
                        else None
                    ),
                }
            )

    return src.mapInPandas(gen, schema=DECODED_SCHEMA)
