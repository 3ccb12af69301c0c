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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_stub(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    fake: bool = False,
) -> DataFrame:
    """Image resize plumbing: (payload, width, height) → resized payload +
    new dims, partition-local mapInPandas (real impl: PIL/opencv in the
    closure). The fake path scales the byte budget by the area ratio —
    deterministic, size-monotone, same schema/batching as the real thing.
    """
    if not fake:
        raise NotImplementedError(
            "image libraries are not available in this environment; "
            "pass fake=True for the deterministic stub"
        )

    src = df.select(
        F.col(id_col).alias("item_id"),
        F.col(width_col).alias("width"),
        F.col(height_col).alias("height"),
        F.col(payload_col).alias("payload"),
    )
    tw, th = int(target_w), int(target_h)

    def gen(batches):
        import pandas as _pd

        for pdf in batches:
            def _resize(row):
                b, w, h = row["payload"], row["width"], row["height"]
                if b is None or not w or not h:
                    return None
                ratio = (tw * th) / float(w * h)
                n = max(1, int(len(b) * min(ratio, 1.0)))
                return bytes(b[:n])

            yield _pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "width": tw,
                    "height": th,
                    "payload": pdf.apply(_resize, axis=1),
                }
            )

    return src.mapInPandas(gen, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    every_ms: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one OUTPUT row per sampled timestamp — the
    one-to-many mapInPandas shape (an input Arrow batch yields a larger
    output batch; no shuffle, expansion stays partition-local). Frames at
    t = 0, every_ms, 2*every_ms, ... < duration_ms. The fake path slices
    a byte window per frame; a real impl seeks with ffmpeg in the same
    closure. At 100 TB sampled frames multiply rows ~duration/every_ms —
    repartition AFTER sampling if downstream needs balance.
    """
    if not fake:
        raise NotImplementedError(
            "video libraries are not available in this environment; "
            "pass fake=True for the deterministic stub"
        )

    src = df.select(
        F.col(id_col).alias("item_id"),
        F.col(duration_col).alias("duration_ms"),
        F.col(payload_col).alias("payload"),
    )
    step = int(every_ms)

    def gen(batches):
        import pandas as _pd

        for pdf in batches:
            out = {"item_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for _, row in pdf.iterrows():
                b, dur = row["payload"], row["duration_ms"]
                # nullable long columns arrive as float NaN in pandas
                if b is None or dur is None or _pd.isna(dur) or dur <= 0:
                    continue
                n_frames = (int(dur) + step - 1) // step
                for i in range(n_frames):
                    ts = i * step
                    lo = (ts * len(b)) // max(int(dur), 1)
                    out["item_id"].append(row["item_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["payload"].append(bytes(b[lo : lo + 8]))
            yield _pd.DataFrame(out)

    return src.mapInPandas(gen, schema=FRAMES_SCHEMA)
