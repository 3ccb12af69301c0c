"""Multimodal (image/audio/video) column plumbing.

Design: media lives as an opaque `binary` column plus typed metadata columns
(`mime`, `width`, `height`, `duration_ms`, ...). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` stages so the heavy
per-item work stays vectorized and partition-local (no shuffle). At 100 TB
the binary payloads dominate IO: store them in their own parquet column (or
side files with pointer columns) so queries that don't touch bytes never
read them (column pruning).

Decoder status (round 8):

- **REAL, zero-dependency decoders**: `decode_wav` (stdlib `wave` +
  numpy — PCM samples → rate / channels / duration + RMS/peak/ZCR
  features), `decode_bmp` / `resize_bmp` (pure-numpy 24-bit BI_RGB BMP —
  actual pixels, channel statistics, real nearest-neighbor resize with
  BMP re-encode), and `decode_png` (a genuinely COMPRESSED codec: stdlib
  zlib inflate + numpy scanline un-filtering, spec filters 0-4, 8-bit
  gray/RGB/gray-alpha/RGBA). These exercise the full Spark contract
  (Arrow batching, one-to-one and one-to-many mapInPandas, binary
  columns) on genuinely decoded media.
- JPEG is REAL too (r10 baseline, r11 progressive): `decode_jpeg` is a
  zero-dependency Huffman + IDCT decoder covering SOF0/1/2, value-checked
  against javax.imageio. Only video (ffmpeg) and arithmetic/lossless
  JPEG variants have no stdlib path: `decode_media` / `resize_stub` /
  `frame_sample` keep the same schema/partitioning/batch shape and raise
  NotImplementedError unless `fake=True` (deterministic stand-in),
  flipping to the real libraries when the environment provides them.
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


# ---------------------------------------------------------------- real: WAV
WAV_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("error", T.StringType()),
    ]
)


def decode_wav(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode — stdlib ``wave`` + numpy, no external libs:
    PCM WAV bytes → (sample_rate, channels, samples, duration) plus a
    4-feature vector over the first channel: [rms, peak, zero-crossing
    rate, dc mean], all computed from the actual samples. Malformed
    payloads yield an ``error`` row instead of failing the batch (the
    fail-closed convention every media pipeline needs at corpus scale).
    Partition-local mapInPandas; Arrow moves the bytes in batches."""
    src = df.select(
        F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload")
    )

    def gen(batches):
        import io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        dtypes = {1: _np.uint8, 2: _np.dtype("<i2"), 4: _np.dtype("<i4")}

        def one(b):
            if b is None:
                return (None, None, None, None, None, "null payload")
            try:
                with _wave.open(io.BytesIO(bytes(b))) as w:
                    rate, nch, width = (
                        w.getframerate(), w.getnchannels(), w.getsampwidth()
                    )
                    n = w.getnframes()
                    raw = w.readframes(n)
                dt = dtypes.get(width)
                if dt is None:
                    return (rate, nch, n, None, None, f"sampwidth {width}")
                a = _np.frombuffer(raw, dtype=dt).astype(_np.float64)
                if width == 1:
                    a -= 128.0  # 8-bit PCM is unsigned
                ch0 = a[::nch] if nch > 1 else a
                dur = int(round(n * 1000.0 / rate)) if rate else None
                if len(ch0) == 0:
                    return (rate, nch, 0, dur, [0.0, 0.0, 0.0, 0.0], None)
                rms = float(_np.sqrt(_np.mean(ch0 * ch0)))
                peak = float(_np.max(_np.abs(ch0)))
                zcr = float(_np.mean(_np.signbit(ch0[:-1]) != _np.signbit(ch0[1:]))) if len(ch0) > 1 else 0.0
                return (rate, nch, n, dur, [rms, peak, zcr, float(_np.mean(ch0))], None)
            except Exception as e:  # malformed container
                return (None, None, None, None, None, str(e)[:200])

        for pdf in batches:
            cols = [one(b) for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "sample_rate": [c[0] for c in cols],
                    "n_channels": [c[1] for c in cols],
                    "n_samples": [c[2] for c in cols],
                    "duration_ms": [c[3] for c in cols],
                    "feature": [c[4] for c in cols],
                    "error": [c[5] for c in cols],
                }
            )

    return src.mapInPandas(gen, schema=WAV_SCHEMA)


# ---------------------------------------------------------------- real: BMP
BMP_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("error", T.StringType()),
    ]
)


def decode_bmp(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode — pure-numpy 24-bit uncompressed BMP: actual
    pixels out of the binary column, per-image (width, height) and a
    6-feature vector [mean R, mean G, mean B, std R, std G, std B].
    Malformed/unsupported payloads become ``error`` rows."""
    src = df.select(
        F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload")
    )

    def gen(batches):
        import struct  # noqa: F401  (re-imported inside codec)

        import numpy as _np
        import pandas as _pd

        def _codec():
            import struct

            def decode(b):
                if b is None or len(b) < 54 or bytes(b[:2]) != b"BM":
                    raise ValueError("not a BMP")
                off = struct.unpack_from("<I", b, 10)[0]
                w = struct.unpack_from("<i", b, 18)[0]
                h = struct.unpack_from("<i", b, 22)[0]
                bpp = struct.unpack_from("<H", b, 28)[0]
                comp = struct.unpack_from("<I", b, 30)[0]
                if bpp != 24 or comp != 0:
                    raise ValueError(f"unsupported BMP bpp={bpp} comp={comp}")
                top_down, hh = h < 0, abs(h)
                stride = ((w * 3 + 3) // 4) * 4
                if len(b) < off + stride * hh:
                    raise ValueError("truncated BMP")
                rows = _np.frombuffer(
                    bytes(b[off : off + stride * hh]), dtype=_np.uint8
                ).reshape(hh, stride)[:, : w * 3].reshape(hh, w, 3)
                if not top_down:
                    rows = rows[::-1]
                return rows[:, :, ::-1]

            return decode

        decode = _codec()

        def one(b):
            try:
                rgb = decode(b)
                f = rgb.reshape(-1, 3).astype(_np.float64)
                return (
                    int(rgb.shape[1]), int(rgb.shape[0]),
                    list(_np.mean(f, axis=0)) + list(_np.std(f, axis=0)),
                    None,
                )
            except Exception as e:
                return (None, None, None, str(e)[:200])

        for pdf in batches:
            cols = [one(b) for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "width": [c[0] for c in cols],
                    "height": [c[1] for c in cols],
                    "feature": [c[2] for c in cols],
                    "error": [c[3] for c in cols],
                }
            )

    return src.mapInPandas(gen, schema=BMP_SCHEMA)


def resize_bmp(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize — nearest-neighbor over the decoded BMP pixels
    (numpy fancy indexing), re-encoded as BMP bytes. Same RESIZED_SCHEMA
    contract as the PIL-gated resize_stub; decode errors null the row's
    payload (surfaced via width/height NULLs)."""
    src = df.select(
        F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload")
    )
    tw, th = int(target_w), int(target_h)

    def gen(batches):
        import struct

        import numpy as _np
        import pandas as _pd

        def decode(b):
            if b is None or len(b) < 54 or bytes(b[:2]) != b"BM":
                raise ValueError("not a BMP")
            off = struct.unpack_from("<I", b, 10)[0]
            w = struct.unpack_from("<i", b, 18)[0]
            h = struct.unpack_from("<i", b, 22)[0]
            bpp = struct.unpack_from("<H", b, 28)[0]
            comp = struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or comp != 0:
                raise ValueError("unsupported BMP")
            top_down, hh = h < 0, abs(h)
            stride = ((w * 3 + 3) // 4) * 4
            if len(b) < off + stride * hh:
                raise ValueError("truncated BMP")
            rows = _np.frombuffer(
                bytes(b[off : off + stride * hh]), dtype=_np.uint8
            ).reshape(hh, stride)[:, : w * 3].reshape(hh, w, 3)
            if not top_down:
                rows = rows[::-1]
            return rows[:, :, ::-1]

        def encode(rgb):
            hh, w = rgb.shape[:2]
            stride = ((w * 3 + 3) // 4) * 4
            body = _np.zeros((hh, stride), dtype=_np.uint8)
            body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(hh, w * 3)
            size = 54 + stride * hh
            header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
                "<IiiHHIIiiII", 40, w, hh, 1, 24, 0, stride * hh, 2835, 2835, 0, 0
            )
            return header + body.tobytes()

        for pdf in batches:
            out = {"item_id": [], "width": [], "height": [], "payload": []}
            for item_id, b in zip(pdf["item_id"], pdf["payload"]):
                try:
                    rgb = decode(b)
                    ys = (_np.arange(th) * rgb.shape[0]) // th
                    xs = (_np.arange(tw) * rgb.shape[1]) // tw
                    resized = rgb[ys][:, xs]
                    out["item_id"].append(item_id)
                    out["width"].append(tw)
                    out["height"].append(th)
                    out["payload"].append(encode(resized))
                except Exception:
                    out["item_id"].append(item_id)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["payload"].append(None)
            yield _pd.DataFrame(out)

    return src.mapInPandas(gen, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------- real: PNG
PNG_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("error", T.StringType()),
    ]
)


def decode_png(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL compressed-image decode with zero third-party codecs: PNG via
    stdlib ``zlib`` + numpy scanline un-filtering (spec filters 0-4:
    None/Sub/Up/Average/Paeth). Supports 8-bit depth, color types 0
    (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced — the shape
    every standard encoder emits by default. Output: (width, height,
    channels) plus a per-channel [means..., stds...] feature vector;
    malformed/unsupported payloads become ``error`` rows (keep-with-
    status). Sub/Up rows un-filter vectorized (modular cumsum / row add);
    Average/Paeth are inherently sequential per scanline and run as
    per-byte loops — decode cost is per-IMAGE and embarrassingly
    parallel across the corpus, so the Spark shape (mapInPandas over a
    binary column) is the same one a PIL-backed decoder would use."""
    src = df.select(
        F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload")
    )

    def gen(batches):
        import struct
        import zlib

        import numpy as _np
        import pandas as _pd

        def decode(b):
            b = bytes(b) if b is not None else b""
            if len(b) < 45 or b[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG")
            pos, ihdr, idat = 8, None, []
            while pos + 8 <= len(b):
                ln, typ = struct.unpack_from(">I4s", b, pos)
                pos += 8
                data = b[pos : pos + ln]
                pos += ln + 4  # payload + CRC
                if typ == b"IHDR":
                    ihdr = data
                elif typ == b"IDAT":
                    idat.append(data)
                elif typ == b"IEND":
                    break
            if ihdr is None or len(ihdr) < 13 or not idat:
                raise ValueError("missing IHDR/IDAT")
            w, h, bit, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", ihdr[:13]
            )
            if bit != 8 or comp != 0 or filt != 0 or inter != 0:
                raise ValueError(
                    f"unsupported PNG bit={bit} comp={comp} interlace={inter}"
                )
            nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if nch is None:
                raise ValueError(f"unsupported color type {color}")
            if w == 0 or h == 0:
                raise ValueError("empty image")
            raw = zlib.decompress(b"".join(idat))
            stride = w * nch
            if len(raw) != (stride + 1) * h:
                raise ValueError("bad scanline length")
            arr = _np.frombuffer(raw, dtype=_np.uint8).reshape(h, stride + 1)
            ftypes = arr[:, 0]
            out = _np.empty((h, stride), dtype=_np.uint8)
            for y in range(h):
                f = int(ftypes[y])
                row = arr[y, 1:].astype(_np.int32)
                prev = (
                    out[y - 1].astype(_np.int32)
                    if y
                    else _np.zeros(stride, _np.int32)
                )
                if f == 0:
                    cur = row
                elif f == 1:  # Sub: modular cumsum per channel column
                    px = row.reshape(w, nch)
                    cur = _np.cumsum(px, axis=0).reshape(stride)
                elif f == 2:  # Up: whole-row add
                    cur = row + prev
                elif f == 3:  # Average: sequential on the left operand
                    cur = row
                    for x in range(stride):
                        left = cur[x - nch] & 255 if x >= nch else 0
                        cur[x] = cur[x] + ((left + prev[x]) >> 1)
                elif f == 4:  # Paeth: sequential predictor
                    cur = row
                    for x in range(stride):
                        a = cur[x - nch] & 255 if x >= nch else 0
                        up = prev[x]
                        c = prev[x - nch] if x >= nch else 0
                        p = a + up - c
                        pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                        cur[x] = cur[x] + (
                            a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                        )
                else:
                    raise ValueError(f"bad filter type {f}")
                out[y] = cur & 255
            return out.reshape(h, w, nch)

        def one(b):
            try:
                px = decode(b)
                flat = px.reshape(-1, px.shape[2]).astype(_np.float64)
                return (
                    int(px.shape[1]), int(px.shape[0]), int(px.shape[2]),
                    list(_np.mean(flat, axis=0)) + list(_np.std(flat, axis=0)),
                    None,
                )
            except Exception as e:
                return (None, None, None, None, str(e)[:200])

        for pdf in batches:
            cols = [one(b) for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "width": [c[0] for c in cols],
                    "height": [c[1] for c in cols],
                    "channels": [c[2] for c in cols],
                    "feature": [c[3] for c in cols],
                    "error": [c[4] for c in cols],
                }
            )

    return src.mapInPandas(gen, schema=PNG_SCHEMA)


# --------------------------------------------------------------- real: JPEG
def decode_jpeg(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL JPEG decode with zero third-party codecs: marker parse,
    canonical Huffman entropy decode, dequantize + de-zigzag, vectorized
    8x8 IDCT (one einsum per component over all blocks), chroma
    upsampling (any h/v sampling factors, incl. 4:2:0 / 4:2:2), JFIF
    YCbCr→RGB. Supports SOF0/SOF1 (baseline + extended sequential
    Huffman) AND SOF2 (progressive Huffman, r11): multi-scan spectral
    selection + successive approximation — DC first/refine in MCU order,
    AC first/refine per component in raster block order with EOBRUN runs
    (T.81 G.1.2, the libjpeg jdphuff.c algorithm), restart markers
    resetting predictors and EOB runs, raw coefficients accumulated
    across scans and dequantized once at the end. 8-bit precision, 1- or
    3-component frames, 16-bit quant tables. Arithmetic coding,
    lossless/hierarchical, and 12-bit stay env-gated with a clear error —
    the Huffman encoder shapes are fully real and value-checked (tests
    decode javax.imageio baseline AND progressive output and compare
    pixels).

    Output mirrors decode_png: (width, height, channels,
    per-channel [means..., stds...] feature, error) keep-with-status rows.
    Per-image work is independent → mapInPandas over the binary column,
    no shuffle; at 100 TB the bitstream decode is the CPU hot spot and
    would swap to a vectorized library behind this same contract."""
    src = df.select(
        F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload")
    )

    def gen(batches):
        import struct

        import numpy as _np
        import pandas as _pd

        ZZ = _np.array([
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
        ])
        # orthonormal DCT-II basis: IDCT is A.T @ B @ A
        xs = _np.arange(8)
        A = _np.cos((2 * xs[None, :] + 1) * xs[:, None] * _np.pi / 16) / 2.0
        A[0, :] /= _np.sqrt(2.0)

        def build_huff(counts, symbols):
            # canonical code → symbol, keyed by (length, code)
            table = {}
            code = 0
            k = 0
            for ln in range(1, 17):
                for _ in range(counts[ln - 1]):
                    table[(ln, code)] = symbols[k]
                    code += 1
                    k += 1
                code <<= 1
            return table

        class Bits:
            __slots__ = ("buf", "pos", "acc", "n")

            def __init__(self, buf):
                self.buf, self.pos, self.acc, self.n = buf, 0, 0, 0

            def bit(self):
                if self.n == 0:
                    if self.pos >= len(self.buf):
                        raise ValueError("entropy data exhausted")
                    self.acc = self.buf[self.pos]
                    self.pos += 1
                    self.n = 8
                self.n -= 1
                return (self.acc >> self.n) & 1

            def bits(self, t):
                v = 0
                for _ in range(t):
                    v = (v << 1) | self.bit()
                return v

            def huff(self, table):
                code = 0
                for ln in range(1, 17):
                    code = (code << 1) | self.bit()
                    s = table.get((ln, code))
                    if s is not None:
                        return s
                raise ValueError("bad Huffman code")

        def extend(v, t):
            return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

        def decode(b):
            data = bytes(b) if b is not None else b""
            if len(data) < 4 or data[:2] != b"\xff\xd8":
                raise ValueError("not a JPEG")
            pos = 2
            qt, hdc, hac = {}, {}, {}
            frame = None
            ri = 0
            adobe_transform = None
            progressive = False
            geom_done = False
            any_scan = False
            comps = []
            n = len(data)

            def collect(spos):
                """Entropy segments from ``spos``: unstuff FF00, split at
                RSTn, stop at any other marker. Returns (segs, end) where
                ``end`` indexes the terminating marker's 0xFF (or EOF)."""
                segs, cur = [], bytearray()
                i = spos
                while i < n:
                    byte = data[i]
                    if byte == 0xFF and i + 1 < n:
                        nxt = data[i + 1]
                        if nxt == 0x00:
                            cur.append(0xFF)
                            i += 2
                            continue
                        if 0xD0 <= nxt <= 0xD7:
                            segs.append(bytes(cur))
                            cur = bytearray()
                            i += 2
                            continue
                        # spec: FF + any other marker ends the scan
                        break
                    cur.append(byte)
                    i += 1
                segs.append(bytes(cur))
                return segs, i

            def init_geometry():
                nonlocal geom_done, hmax, vmax, mcux, mcuy, nmcu
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-frame["w"] // (8 * hmax))
                mcuy = -(-frame["h"] // (8 * vmax))
                nmcu = mcux * mcuy
                for c in comps:
                    c["bx"] = mcux * c["h"]
                    c["by"] = mcuy * c["v"]
                    # non-interleaved scans cover the component's OWN
                    # (un-MCU-padded) block grid (T.81 A.2.2)
                    c["cw"] = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
                    c["ch"] = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
                    c["coef"] = _np.zeros((c["by"] * c["bx"], 64), _np.int32)
                    c["pred"] = 0
                geom_done = True

            hmax = vmax = mcux = mcuy = nmcu = 0

            def prog_scan(order, ss, se, ah, al, segs):
                """One progressive scan (T.81 G.1.2 / libjpeg jdphuff.c):
                DC first/refine interleaved in MCU order, AC first/refine
                single-component in the component's raster block order,
                EOBRUN and DC predictors reset at every restart."""
                p1, m1 = 1 << al, -(1 << al)
                if ss == 0:
                    if se != 0:
                        raise ValueError("bad DC spectral selection")
                    interleaved = len(order) > 1
                    if interleaved:
                        units = nmcu
                    else:
                        c0 = order[0]
                        units = c0["cw"] * c0["ch"]
                    done = 0
                    for seg_bytes in segs:
                        if done >= units:
                            break
                        br = Bits(seg_bytes)
                        for c in order:
                            c["pred"] = 0
                        stop = min(units, done + ri) if ri else units
                        while done < stop:
                            if interleaved:
                                my, mx = divmod(done, mcux)
                                blocks = [
                                    (c, (my * c["v"] + v) * c["bx"]
                                     + (mx * c["h"] + u))
                                    for c in order
                                    for v in range(c["v"])
                                    for u in range(c["h"])
                                ]
                            else:
                                c0 = order[0]
                                row, col = divmod(done, c0["cw"])
                                blocks = [(c0, row * c0["bx"] + col)]
                            for c, bi in blocks:
                                coef = c["coef"]
                                if ah == 0:
                                    t = br.huff(hdc[c["td"]])
                                    diff = extend(br.bits(t), t) if t else 0
                                    c["pred"] += diff
                                    coef[bi, 0] = c["pred"] << al
                                elif br.bit():
                                    coef[bi, 0] |= p1
                            done += 1
                    if done < units:
                        raise ValueError("truncated progressive DC scan")
                    return
                # AC scan: single component, raster block order
                if len(order) != 1:
                    raise ValueError("progressive AC scan must be 1 component")
                c = order[0]
                ac_t = hac[c["ta"]]
                coef = c["coef"]
                units = c["cw"] * c["ch"]
                done = 0
                eobrun = 0
                for seg_bytes in segs:
                    if done >= units:
                        break
                    br = Bits(seg_bytes)
                    eobrun = 0
                    stop = min(units, done + ri) if ri else units
                    while done < stop:
                        row, col = divmod(done, c["cw"])
                        bi = row * c["bx"] + col
                        if ah == 0:  # AC first pass
                            if eobrun > 0:
                                eobrun -= 1
                            else:
                                k = ss
                                while k <= se:
                                    rs = br.huff(ac_t)
                                    r, s = rs >> 4, rs & 15
                                    if s == 0:
                                        if r != 15:
                                            eobrun = (1 << r) - 1
                                            if r:
                                                eobrun += br.bits(r)
                                            break
                                        k += 16
                                        continue
                                    k += r
                                    if k > se:
                                        raise ValueError("AC overflow")
                                    coef[bi, k] = extend(br.bits(s), s) << al
                                    k += 1
                        else:  # AC refinement pass (jdphuff refine loop)
                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    rs = br.huff(ac_t)
                                    r, s = rs >> 4, rs & 15
                                    newval = 0
                                    if s == 0:
                                        if r < 15:
                                            eobrun = 1 << r
                                            if r:
                                                eobrun += br.bits(r)
                                            break
                                        # r == 15: pass over 16 zero-history
                                    else:
                                        if s != 1:
                                            raise ValueError(
                                                "bad AC refinement code"
                                            )
                                        newval = p1 if br.bit() else m1
                                    while k <= se:
                                        v = coef[bi, k]
                                        if v != 0:
                                            if br.bit() and (v & p1) == 0:
                                                coef[bi, k] = (
                                                    v + p1 if v >= 0 else v + m1
                                                )
                                        else:
                                            if r == 0:
                                                break
                                            r -= 1
                                        k += 1
                                    if newval and k <= se:
                                        coef[bi, k] = newval
                                    k += 1
                            if eobrun > 0:
                                while k <= se:
                                    v = coef[bi, k]
                                    if v != 0:
                                        if br.bit() and (v & p1) == 0:
                                            coef[bi, k] = (
                                                v + p1 if v >= 0 else v + m1
                                            )
                                    k += 1
                                eobrun -= 1
                        done += 1
                if done < units:
                    raise ValueError("truncated progressive AC scan")

            while pos + 2 <= n:
                if data[pos] != 0xFF:
                    raise ValueError("bad marker stream")
                m = data[pos + 1]
                pos += 2
                if m == 0xD9:
                    break
                if m == 0x01 or 0xD0 <= m <= 0xD7:
                    continue
                if pos + 2 > n:
                    raise ValueError("truncated marker segment")
                ln = struct.unpack_from(">H", data, pos)[0]
                seg = data[pos + 2 : pos + ln]
                if m == 0xDB:  # DQT
                    i = 0
                    while i < len(seg):
                        pq, tq = seg[i] >> 4, seg[i] & 15
                        i += 1
                        if pq:
                            q = _np.frombuffer(
                                seg[i : i + 128], dtype=">u2"
                            ).astype(_np.int32)
                            i += 128
                        else:
                            q = _np.frombuffer(
                                seg[i : i + 64], dtype=_np.uint8
                            ).astype(_np.int32)
                            i += 64
                        qt[tq] = q
                elif m == 0xC4:  # DHT
                    i = 0
                    while i < len(seg):
                        tc, th = seg[i] >> 4, seg[i] & 15
                        counts = list(seg[i + 1 : i + 17])
                        nsym = sum(counts)
                        syms = list(seg[i + 17 : i + 17 + nsym])
                        (hdc if tc == 0 else hac)[th] = build_huff(counts, syms)
                        i += 17 + nsym
                elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / prog
                    progressive = m == 0xC2
                    prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                    if prec != 8:
                        raise ValueError(f"unsupported precision {prec}")
                    comps = []
                    for ci in range(nc):
                        cid, hv, tq = struct.unpack_from(
                            ">BBB", seg, 6 + 3 * ci
                        )
                        comps.append(
                            {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                        )
                    frame = {"h": h, "w": w, "comps": comps}
                elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                           0xCB, 0xCD, 0xCE, 0xCF):
                    raise ValueError(
                        f"unsupported JPEG SOF{m - 0xC0} "
                        "(arithmetic/lossless/hierarchical) — "
                        "baseline + progressive Huffman only"
                    )
                elif m == 0xDD:  # DRI
                    ri = struct.unpack_from(">H", seg, 0)[0]
                elif m == 0xEE and seg[:5] == b"Adobe":  # APP14
                    adobe_transform = seg[11] if len(seg) > 11 else None
                elif m == 0xDA:  # SOS
                    if frame is None:
                        raise ValueError("SOS before SOF")
                    ns = seg[0]
                    sel = []
                    for ci in range(ns):
                        cs, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                        sel.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
                    if not geom_done:
                        init_geometry()
                        for c in comps:
                            if c["tq"] not in qt:
                                raise ValueError("missing quant table")
                    by_id = {c["id"]: c for c in comps}
                    order = [by_id[s["cs"]] for s in sel]
                    for c, s in zip(order, sel):
                        c["td"], c["ta"] = s["td"], s["ta"]
                    segs, end = collect(pos + ln)
                    if progressive:
                        ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                        ahal = seg[3 + 2 * ns]
                        prog_scan(order, ss, se, ahal >> 4, ahal & 15, segs)
                        any_scan = True
                        pos = end
                        continue
                    # sequential: exactly one scan covering every component
                    if len(sel) != len(comps):
                        raise ValueError("non-interleaved multi-scan unsupported")
                    mcu = 0
                    for seg_bytes in segs:
                        if mcu >= nmcu:
                            break
                        br = Bits(seg_bytes)
                        for c in comps:
                            c["pred"] = 0
                        stop = min(nmcu, mcu + ri) if ri else nmcu
                        while mcu < stop:
                            my, mx = divmod(mcu, mcux)
                            for c in order:
                                q = qt[c["tq"]]
                                dc_t, ac_t = hdc[c["td"]], hac[c["ta"]]
                                for v in range(c["v"]):
                                    for u in range(c["h"]):
                                        blk = _np.zeros(64, _np.int32)
                                        t = br.huff(dc_t)
                                        diff = (
                                            extend(br.bits(t), t) if t else 0
                                        )
                                        c["pred"] += diff
                                        blk[0] = c["pred"] * q[0]
                                        k = 1
                                        while k < 64:
                                            rs = br.huff(ac_t)
                                            r, s = rs >> 4, rs & 15
                                            if s == 0:
                                                if r != 15:
                                                    break
                                                k += 16
                                                continue
                                            k += r
                                            if k > 63:
                                                raise ValueError("AC overflow")
                                            blk[k] = (
                                                extend(br.bits(s), s) * q[k]
                                            )
                                            k += 1
                                        bi = (my * c["v"] + v) * c["bx"] + (
                                            mx * c["h"] + u
                                        )
                                        c["coef"][bi] = blk
                            mcu += 1
                    if mcu < nmcu:
                        raise ValueError("truncated entropy data")
                    any_scan = True
                    pos = end
                    continue
                pos += ln
            if frame is None or not any_scan:
                raise ValueError("missing SOF/SOS")
            w, h = frame["w"], frame["h"]

            planes = []
            for c in comps:
                coefs = _np.zeros((c["by"] * c["bx"], 64), _np.float64)
                # progressive scans accumulate RAW successive-approximation
                # coefficients — dequantize at the end; sequential already
                # multiplied during entropy decode
                dq = (
                    c["coef"] * qt[c["tq"]][None, :]
                    if progressive
                    else c["coef"]
                )
                coefs[:, ZZ] = dq  # de-zigzag
                blocks = coefs.reshape(-1, 8, 8)
                px = _np.einsum("ub,nbc,cd->nud", A.T, blocks, A) + 128.0
                plane = (
                    px.reshape(c["by"], c["bx"], 8, 8)
                    .transpose(0, 2, 1, 3)
                    .reshape(c["by"] * 8, c["bx"] * 8)
                )
                plane = plane.repeat(vmax // c["v"], axis=0).repeat(
                    hmax // c["h"], axis=1
                )
                planes.append(plane[:h, :w])
            if len(planes) == 1:
                out = planes[0][:, :, None]
            elif len(planes) == 3:
                y, cb, cr = planes
                if adobe_transform == 0:
                    out = _np.stack([y, cb, cr], axis=-1)
                else:  # JFIF YCbCr (BT.601 full range)
                    cb = cb - 128.0
                    cr = cr - 128.0
                    out = _np.stack(
                        [
                            y + 1.402 * cr,
                            y - 0.344136 * cb - 0.714136 * cr,
                            y + 1.772 * cb,
                        ],
                        axis=-1,
                    )
            else:
                raise ValueError(f"unsupported component count {len(planes)}")
            return _np.clip(_np.round(out), 0, 255).astype(_np.uint8)

        def one(b):
            try:
                px = decode(b)
                flat = px.reshape(-1, px.shape[2]).astype(_np.float64)
                return (
                    int(px.shape[1]), int(px.shape[0]), int(px.shape[2]),
                    list(_np.mean(flat, axis=0)) + list(_np.std(flat, axis=0)),
                    None,
                )
            except Exception as e:
                return (None, None, None, None, str(e)[:200])

        for pdf in batches:
            cols = [one(b) for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "width": [c[0] for c in cols],
                    "height": [c[1] for c in cols],
                    "channels": [c[2] for c in cols],
                    "feature": [c[3] for c in cols],
                    "error": [c[4] for c in cols],
                }
            )

    return src.mapInPandas(gen, schema=PNG_SCHEMA)


# ---------------------------------------------------------------- real: GIF
GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("delay_ms", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("error", T.StringType()),
    ]
)


def _gif_gen(sample_every: int, max_frames: int | None):
    """Shared mapInPandas generator for the GIF family: full LZW decode
    (variable code width, clear/EOI, 4096-entry dictionary), global and
    local color tables, interlace de-scrambling, GCE transparency →
    alpha channel, per-frame delay. Self-contained closure (workers may
    not have the repo on sys.path)."""

    def gen(batches):
        import struct

        import numpy as _np
        import pandas as _pd

        def lzw_decode(buf, min_code, npix):
            clear = 1 << min_code
            eoi = clear + 1
            out = []

            def reset():
                return {i: (i,) for i in range(clear)}, min_code + 1, clear + 2

            table, width, next_code = reset()
            prev = None
            acc = 0
            nbits = 0
            i = 0
            while len(out) < npix:
                while nbits < width and i < len(buf):
                    acc |= buf[i] << nbits  # GIF packs codes LSB-first
                    nbits += 8
                    i += 1
                if nbits < width:
                    break
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == clear:
                    table, width, next_code = reset()
                    prev = None
                    continue
                if code == eoi:
                    break
                if prev is None or code in table:
                    entry = table.get(code)
                    if entry is None:
                        raise ValueError("bad LZW code")
                elif code == next_code:
                    entry = prev + (prev[0],)
                else:
                    raise ValueError("bad LZW code")
                out.extend(entry)
                if prev is not None and next_code < 4096:
                    table[next_code] = prev + (entry[0],)
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
                prev = entry
            if len(out) < npix:
                raise ValueError("truncated LZW stream")
            return _np.array(out[:npix], _np.int32)

        def parse(data):
            if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
                raise ValueError("not a GIF")
            W, H, flags = struct.unpack_from("<HHB", data, 6)
            pos = 13
            gct = None
            if flags & 0x80:
                n = 2 ** ((flags & 7) + 1)
                gct = _np.frombuffer(data[pos : pos + 3 * n], _np.uint8).reshape(
                    n, 3
                )
                pos += 3 * n
            frames = []
            transparent, delay_cs = None, 0
            nlen = len(data)
            while pos < nlen:
                b0 = data[pos]
                pos += 1
                if b0 == 0x3B:  # trailer
                    break
                if b0 == 0x21:  # extension: label + sub-blocks to 0x00
                    label = data[pos]
                    pos += 1
                    subs = []
                    while True:
                        sz = data[pos]
                        pos += 1
                        if sz == 0:
                            break
                        subs.append(data[pos : pos + sz])
                        pos += sz
                    if label == 0xF9 and subs:  # Graphic Control Extension
                        blk = subs[0]
                        delay_cs = blk[1] | (blk[2] << 8)
                        transparent = blk[3] if (blk[0] & 1) else None
                elif b0 == 0x2C:  # image descriptor
                    x, y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
                    pos += 9
                    lct = None
                    if iflags & 0x80:
                        n = 2 ** ((iflags & 7) + 1)
                        lct = _np.frombuffer(
                            data[pos : pos + 3 * n], _np.uint8
                        ).reshape(n, 3)
                        pos += 3 * n
                    min_code = data[pos]
                    pos += 1
                    chunks = []
                    while True:
                        sz = data[pos]
                        pos += 1
                        if sz == 0:
                            break
                        chunks.append(data[pos : pos + sz])
                        pos += sz
                    idx = lzw_decode(b"".join(chunks), min_code, w * h).reshape(
                        h, w
                    )
                    if iflags & 0x40:  # interlaced: 0::8, 4::8, 2::4, 1::2
                        rows = (
                            list(range(0, h, 8))
                            + list(range(4, h, 8))
                            + list(range(2, h, 4))
                            + list(range(1, h, 2))
                        )
                        img = _np.empty_like(idx)
                        img[rows] = idx
                        idx = img
                    pal = lct if lct is not None else gct
                    if pal is None:
                        raise ValueError("frame without a color table")
                    frames.append((idx, pal, transparent, delay_cs))
                    transparent, delay_cs = None, 0
                else:
                    raise ValueError(f"bad GIF block 0x{b0:02x}")
            if not frames:
                raise ValueError("GIF with no image data")
            return frames

        def features(idx, pal, transparent):
            rgb = pal[_np.clip(idx, 0, len(pal) - 1)].astype(_np.float64)
            if transparent is not None:
                alpha = _np.where(idx == transparent, 0.0, 255.0)
                px = _np.dstack([rgb, alpha])
            else:
                px = rgb
            flat = px.reshape(-1, px.shape[2])
            return (
                int(idx.shape[1]),
                int(idx.shape[0]),
                int(px.shape[2]),
                list(flat.mean(axis=0)) + list(flat.std(axis=0)),
            )

        for pdf in batches:
            out = {k: [] for k in (
                "item_id", "frame_idx", "n_frames", "width", "height",
                "channels", "delay_ms", "feature", "error",
            )}

            def emit(iid, fi, nf, w, h, c, d, feat, err):
                out["item_id"].append(iid)
                out["frame_idx"].append(fi)
                out["n_frames"].append(nf)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["delay_ms"].append(d)
                out["feature"].append(feat)
                out["error"].append(err)

            for iid, b in zip(pdf["item_id"], pdf["payload"]):
                try:
                    frames = parse(bytes(b) if b is not None else b"")
                    nf = len(frames)
                    picked = frames[:: max(1, sample_every)]
                    if max_frames is not None:
                        picked = picked[:max_frames]
                    for k, (idx, pal, tr, dcs) in enumerate(picked):
                        w, h, c, feat = features(idx, pal, tr)
                        emit(
                            iid, k * max(1, sample_every), nf,
                            w, h, c, dcs * 10, feat, None,
                        )
                except Exception as e:  # keep-with-status
                    emit(iid, None, None, None, None, None, None, None,
                         str(e)[:200])
            yield _pd.DataFrame(out)

    return gen


def decode_gif(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL GIF decode with zero third-party codecs (GIF87a/89a): LZW
    entropy decode, global/local color tables, interlace, GCE
    transparency (adds an alpha channel). First frame only — output
    mirrors decode_png/decode_jpeg: (width, height, channels,
    [means..., stds...], error). Per-image work is independent →
    mapInPandas over the binary column, no shuffle."""
    src = df.select(
        F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload")
    )
    gen = _gif_gen(sample_every=1, max_frames=1)

    def first_only(batches):
        for pdf in gen(batches):
            yield pdf.drop(columns=["frame_idx", "n_frames", "delay_ms"])

    return src.mapInPandas(first_only, schema=PNG_SCHEMA)


def gif_frame_sample(
    df: DataFrame,
    every_n: int = 1,
    max_frames: int | None = 32,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling over animated GIFs — the frame_sample contract
    (one-to-many mapInPandas, expansion partition-local) running against
    an actual codec instead of the video stub: one output row per
    sampled frame (every ``every_n``-th, capped at ``max_frames``) with
    frame_idx, total n_frames, per-frame delay_ms (GCE delay x10) and
    the same per-channel feature vector as decode_gif. At 100 TB the
    expansion factor is n_frames/every_n — repartition AFTER sampling if
    downstream needs balance (same note as frame_sample)."""
    src = df.select(
        F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload")
    )
    return src.mapInPandas(
        _gif_gen(sample_every=int(every_n), max_frames=max_frames),
        schema=GIF_FRAME_SCHEMA,
    )


GIF_SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synthesize_gif_corpus(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Worker-side animated-GIF synthesis for the distributed round-trip
    invariant (t68, the GIF analogue of synthesize_jpeg_corpus): one 8x8
    ``n_frames``-frame GIF89a per input row. Frame ``f`` uses a 4-entry
    gray palette ``(item_id*37 + 11*c + 19*f + 7) % 256`` and indices
    ``(p + item_id) % 4`` — every index appears exactly 16 times, so the
    per-frame mean is analytically ``avg_c`` of the palette formula and
    the lossless decode must reproduce it EXACTLY. Per-frame delay is
    ``(10 + f) x10 ms``. Self-contained closure (raw-code LZW with
    in-band CLEAR resets keeps codes fixed-width)."""
    src = df.select(F.col("item_id"))
    nf = int(n_frames)

    def gen(batches):
        import struct

        import pandas as _pd

        def lzw(indices, min_code):
            clear = 1 << min_code
            eoi = clear + 1
            width = min_code + 1
            out = bytearray()
            acc = nacc = 0

            def put(code):
                nonlocal acc, nacc
                acc |= code << nacc
                nacc += width
                while nacc >= 8:
                    out.append(acc & 255)
                    acc >>= 8
                    nacc -= 8

            put(clear)
            next_code = clear + 2
            for v in indices:
                put(int(v))
                next_code += 1
                if next_code >= (1 << width) - 1:
                    put(clear)
                    next_code = clear + 2
            put(eoi)
            if nacc:
                out.append(acc & 255)
            return bytes(out)

        def one(item_id):
            iid = int(item_id)
            out = bytearray(b"GIF89a")
            # 4-color global table slot exp=1; frame palettes ride as LCTs
            out += struct.pack("<HHBBB", 8, 8, 0x81, 0, 0)
            out += bytes(12)  # placeholder GCT (every frame carries a LCT)
            idx = [(p + iid) % 4 for p in range(64)]
            for f in range(nf):
                d = 10 + f
                out += bytes([0x21, 0xF9, 0x04, 0x00, d & 255, d >> 8, 0, 0])
                out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, 8, 8, 0x81)
                pal = bytearray()
                for c in range(4):
                    g = (iid * 37 + 11 * c + 19 * f + 7) % 256
                    pal += bytes([g, g, g])
                out += pal
                out += bytes([3])  # LZW min code size
                data = lzw(idx, 3)
                for i in range(0, len(data), 255):
                    chunk = data[i : i + 255]
                    out += bytes([len(chunk)]) + chunk
                out += bytes([0x00])
            out += bytes([0x3B])
            return bytes(out)

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "payload": [one(i) for i in pdf["item_id"]],
                }
            )

    return src.mapInPandas(gen, schema=GIF_SYNTH_SCHEMA)


JPEG_SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("expected_mean", T.DoubleType()),
    ]
)


def synthesize_jpeg_corpus(
    df: DataFrame, id_col: str = "item_id"
) -> DataFrame:
    """Deterministic baseline-JPEG corpus synthesizer: one 16x16 gray
    JPEG per input row (2x2 flat 8x8 tiles whose values derive from the
    id), with an all-ones quant table so the decode is BIT-EXACT — the
    binary-media source stand-in for pipelines tested without real image
    files, and the distributed round-trip partner of ``decode_jpeg``
    (t67). Encoding runs worker-side in mapInPandas (self-contained
    closure, no module references); ~300 bytes/image.

    Returns (item_id, payload, expected_mean) where expected_mean is the
    exact pixel mean the decoder must reproduce."""
    src = df.select(F.col(id_col).cast("long").alias("item_id"))

    def gen(batches):
        import struct

        import pandas as _pd

        def encode(vals):
            out = bytearray(b"\xff\xd8")

            def seg(marker, payload):
                out.extend(
                    bytes([0xFF, marker])
                    + struct.pack(">H", len(payload) + 2)
                    + payload
                )

            seg(0xDB, bytes([0x00]) + bytes([1] * 64))
            seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0]))
            seg(0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12)))
            seg(0xC4, bytes([0x10]) + bytes([0, 1] + [0] * 14) + bytes([0x00]))
            seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            bits = []

            def put(code, n):
                for i in range(n - 1, -1, -1):
                    bits.append((code >> i) & 1)

            pred = 0
            for v in vals:
                d = 8 * (v - 128) - pred
                pred = 8 * (v - 128)
                t = abs(d).bit_length() if d else 0
                put(t, 4)
                if t:
                    put(d if d > 0 else d + (1 << t) - 1, t)
                put(0, 2)
            while len(bits) % 8:
                bits.append(1)
            for i in range(0, len(bits), 8):
                b = 0
                for bit in bits[i : i + 8]:
                    b = (b << 1) | bit
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
            out.extend(b"\xff\xd9")
            return bytes(out)

        for pdf in batches:
            ids = pdf["item_id"]
            payloads, means = [], []
            for i in ids:
                vals = [int((i * 37 + 11 * c + 7) % 256) for c in range(4)]
                payloads.append(encode(vals))
                means.append(sum(vals) / 4.0)
            yield _pd.DataFrame(
                {"item_id": ids, "payload": payloads, "expected_mean": means}
            )

    return src.mapInPandas(gen, schema=JPEG_SYNTH_SCHEMA)
