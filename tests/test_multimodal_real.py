"""REAL media decode contracts (round 8): stdlib-WAV and pure-numpy BMP —
actual samples/pixels through the mapInPandas plumbing, value-checked
against analytically known signals."""

import io
import math
import struct
import wave

import numpy as np
import pyspark.sql.functions as F

from rudder_server_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    resize_bmp,
)


def _wav_bytes(freq=440.0, rate=8000, n=8000, amp=10000, channels=1):
    t = np.arange(n) / rate
    samples = (amp * np.sin(2 * math.pi * freq * t)).astype("<i2")
    if channels == 2:
        samples = np.column_stack([samples, samples]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _bmp_bytes(rgb):
    rgb = np.asarray(rgb, dtype=np.uint8)
    hh, w = rgb.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    body = np.zeros((hh, stride), dtype=np.uint8)
    body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(hh, w * 3)
    size = 54 + stride * hh
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, hh, 1, 24, 0, stride * hh, 2835, 2835, 0, 0
    )
    return header + body.tobytes()


def test_decode_wav_real_sine(spark):
    rows = [
        (1, _wav_bytes()),                       # 1s of 440 Hz @8 kHz mono
        (2, _wav_bytes(channels=2)),             # stereo: ch0 analyzed
        (3, b"not a wav"),                       # malformed -> error row
        (4, None),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r["item_id"]: r for r in decode_wav(df).collect()}
    ok = got[1]
    assert ok["sample_rate"] == 8000 and ok["n_channels"] == 1
    assert ok["n_samples"] == 8000 and ok["duration_ms"] == 1000
    rms, peak, zcr, mean = ok["feature"]
    assert abs(rms - 10000 / math.sqrt(2)) < 100   # sine RMS = A/sqrt(2)
    assert abs(peak - 10000) < 10
    assert abs(zcr - 2 * 440 / 8000) < 0.01        # 2f/rate crossings
    assert abs(mean) < 10
    st = got[2]
    assert st["n_channels"] == 2 and abs(st["feature"][0] - rms) < 100
    assert got[3]["error"] is not None and got[4]["error"] == "null payload"


def test_decode_bmp_real_pixels(spark):
    solid = np.zeros((5, 7, 3), np.uint8)
    solid[:, :, 0] = 200  # pure red 200
    grad = np.zeros((4, 4, 3), np.uint8)
    grad[:, :, 1] = np.arange(16).reshape(4, 4) * 10  # green gradient
    rows = [
        (1, _bmp_bytes(solid)),
        (2, _bmp_bytes(grad)),
        (3, b"BM garbage"),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r["item_id"]: r for r in decode_bmp(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (7, 5)
    mr, mg, mb, sr, sg, sb = got[1]["feature"]
    assert (mr, mg, mb) == (200.0, 0.0, 0.0) and sr == 0.0
    assert abs(got[2]["feature"][1] - 75.0) < 1e-9  # mean of 0..150 by 10
    assert got[3]["error"] is not None


def test_resize_bmp_roundtrip(spark):
    # 2x2 checkerboard scaled to 4x4 by nearest neighbor: each source
    # pixel becomes a 2x2 block; decode the resized bytes to verify
    board = np.zeros((2, 2, 3), np.uint8)
    board[0, 0] = board[1, 1] = 255
    df = spark.createDataFrame(
        [(1, _bmp_bytes(board)), (2, b"junk")], "item_id long, payload binary"
    )
    resized = resize_bmp(df, 4, 4)
    got = {r["item_id"]: r for r in resized.collect()}
    assert (got[1]["width"], got[1]["height"]) == (4, 4)
    assert got[2]["payload"] is None and got[2]["width"] is None
    back = decode_bmp(
        spark.createDataFrame(
            [(1, got[1]["payload"])], "item_id long, payload binary"
        )
    ).head()
    assert (back["width"], back["height"]) == (4, 4)
    # checkerboard mean stays 127.5 per channel under 2x block scaling
    assert abs(back["feature"][0] - 127.5) < 1e-9


# ----------------------------------------------------------------- PNG

def _png_encode(px, filters):
    """Minimal reference PNG encoder for the test: 8-bit, color type from
    channel count, one explicit filter type per scanline (exercises the
    decoder's un-filtering paths)."""
    import struct
    import zlib

    import numpy as np

    h, w, nch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = px[y].reshape(-1).astype(np.int32)
        if f == 0:
            flt = cur
        elif f == 1:
            left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
            flt = cur - left
        elif f == 2:
            flt = cur - prev
        elif f == 3:
            left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
            flt = cur - ((left + prev) >> 1)
        else:  # Paeth
            left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
            upleft = np.concatenate([np.zeros(nch, np.int32), prev[:-nch]])
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            flt = cur - pred
        raw.append(f)
        raw.extend((flt & 255).astype(np.uint8).tobytes())
        prev = cur
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_all_filters(spark):
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    imgs = {
        1: rng.integers(0, 256, (7, 5, 3), dtype=np.uint8),   # RGB all filters
        2: rng.integers(0, 256, (4, 6, 1), dtype=np.uint8),   # gray
        3: rng.integers(0, 256, (5, 4, 4), dtype=np.uint8),   # RGBA
    }
    rows = [
        (1, bytearray(_png_encode(imgs[1], [0, 1, 2, 3, 4]))),
        (2, bytearray(_png_encode(imgs[2], [4, 3, 2, 1]))),
        (3, bytearray(_png_encode(imgs[3], [2, 4, 0]))),
        (4, bytearray(b"not a png at all")),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r["item_id"]: r for r in decode_png(df).collect()}
    for i, img in imgs.items():
        r = got[i]
        assert r["error"] is None
        assert (r["width"], r["height"], r["channels"]) == (
            img.shape[1], img.shape[0], img.shape[2],
        )
        flat = img.reshape(-1, img.shape[2]).astype(float)
        want = list(flat.mean(axis=0)) + list(flat.std(axis=0))
        assert np.allclose(r["feature"], want)
    assert got[4]["error"] is not None and got[4]["width"] is None
