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
