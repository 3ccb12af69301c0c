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


# ----------------------------------------------------------------- JPEG

def _jvm_jpeg_tools(spark):
    """Encode/decode oracle via the JVM's javax.imageio (ships with the
    Spark JDK — no third-party codec): returns (encode(px)->bytes,
    decode(bytes)->ndarray)."""
    import numpy as np

    jvm = spark._jvm

    def encode(px, gray=False, progressive=False):
        h, w = px.shape[:2]
        # TYPE_INT_RGB=1, TYPE_BYTE_GRAY=10
        bi = jvm.java.awt.image.BufferedImage(w, h, 10 if gray else 1)
        for y in range(h):
            for x in range(w):
                if gray:
                    v = int(px[y, x, 0])
                    rgb = (v << 16) | (v << 8) | v
                else:
                    rgb = (int(px[y, x, 0]) << 16) | (int(px[y, x, 1]) << 8) | int(px[y, x, 2])
                bi.setRGB(x, y, rgb)
        baos = jvm.java.io.ByteArrayOutputStream()
        if not progressive:
            assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
            return bytes(baos.toByteArray())
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "jpg"
        ).next()
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
        )
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
        ios.flush()
        writer.dispose()
        out = bytes(baos.toByteArray())
        assert b"\xff\xc2" in out  # really progressive (SOF2 present)
        return out

    def decode(b, gray=False):
        bais = jvm.java.io.ByteArrayInputStream(b)
        bi = jvm.javax.imageio.ImageIO.read(bais)
        w, h = bi.getWidth(), bi.getHeight()
        if gray:
            # raw raster sample: getRGB on a gray image would run the
            # linear-gray→sRGB colorspace (gamma) conversion and no
            # longer match the JPEG's actual Y samples
            raster = bi.getRaster()
            out = np.zeros((h, w, 1), np.uint8)
            for y in range(h):
                for x in range(w):
                    out[y, x, 0] = raster.getSample(x, y, 0)
            return out
        out = np.zeros((h, w, 3), np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = bi.getRGB(x, y)
                out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
        return out

    return encode, decode


def test_decode_jpeg_solid_color_vs_imageio(spark):
    """Constant-chroma image: upsampling-filter differences vanish, so the
    pure-Python decoder must agree with the JVM's libjpeg-based decoder
    almost exactly."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_jpeg

    encode, jdecode = _jvm_jpeg_tools(spark)
    px = np.zeros((24, 24, 3), np.uint8)
    px[:] = (180, 90, 40)
    b = encode(px)
    oracle = jdecode(b)
    row = decode_jpeg(
        spark.createDataFrame([(1, b)], "item_id long, payload binary")
    ).head()
    assert row["error"] is None
    assert (row["width"], row["height"], row["channels"]) == (24, 24, 3)
    # oracle per-channel means vs ours
    om = oracle.reshape(-1, 3).mean(axis=0)
    assert np.allclose(row["feature"][:3], om, atol=2.0)


def test_decode_jpeg_gray_gradient_vs_imageio(spark):
    """1-component JPEG (TYPE_BYTE_GRAY): no chroma path at all — the
    DC/AC Huffman decode + IDCT must track the JVM decoder tightly."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_jpeg

    encode, jdecode = _jvm_jpeg_tools(spark)
    g = np.linspace(0, 255, 32 * 16).reshape(16, 32, 1).astype(np.uint8)
    b = encode(g, gray=True)
    oracle = jdecode(b, gray=True)  # raw Y raster, no colorspace remap
    row = decode_jpeg(
        spark.createDataFrame([(1, b)], "item_id long, payload binary")
    ).head()
    assert row["error"] is None
    assert (row["width"], row["height"], row["channels"]) == (32, 16, 1)
    assert abs(row["feature"][0] - oracle[:, :, 0].mean()) < 1.5


def test_decode_jpeg_noise_image_tracks_oracle(spark):
    """Structured RGB image (odd dims → padding + 4:2:0 edge handling):
    per-channel means must track the JVM decode; nearest vs fancy chroma
    upsampling bounds the residual."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_jpeg

    encode, jdecode = _jvm_jpeg_tools(spark)
    rs = np.random.RandomState(7)
    base = rs.randint(0, 256, (3,))
    px = np.zeros((19, 21, 3), np.uint8)
    for y in range(19):
        for x in range(21):
            px[y, x] = (base + np.array([x * 5, y * 7, (x + y) * 3])) % 256
    b = encode(px)
    oracle = jdecode(b)
    row = decode_jpeg(
        spark.createDataFrame([(1, b)], "item_id long, payload binary")
    ).head()
    assert row["error"] is None
    assert (row["width"], row["height"]) == (21, 19)
    om = oracle.reshape(-1, 3).mean(axis=0)
    assert np.allclose(row["feature"][:3], om, atol=4.0)


def test_decode_jpeg_arithmetic_and_garbage_gated(spark):
    """SOF2 (progressive Huffman) is REAL since r11; arithmetic coding
    (SOF10) and garbage stay loud errors."""
    from rudder_server_spark.operators.multimodal import decode_jpeg

    rows = decode_jpeg(
        spark.createDataFrame(
            [(1, b"\xff\xd8\xff\xca" + b"\x00\x08" + b"\x00" * 6 + b"\xff\xd9"),
             (2, b"not a jpeg at all")],
            "item_id long, payload binary",
        )
    ).orderBy("item_id").collect()
    assert rows[0]["error"] is not None and "SOF10" in rows[0]["error"]
    assert rows[1]["error"] is not None


def _mini_jpeg_gray_flat(block_vals, dri=1):
    """Hand-rolled minimal baseline JPEG encoder for the test: 8-bit GRAY,
    16x16 (2x2 blocks of flat 8x8 tiles), all-ones quant table (so a flat
    tile of value v encodes exactly as DC=8*(v-128) and decodes back to v
    bit-exactly), custom canonical Huffman tables, and a DRI/RSTn restart
    every ``dri`` MCUs — the restart + DC-predictor-reset path no encoder
    in this container exercises."""
    import struct

    assert len(block_vals) == 4
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload)

    seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT tq=0, all ones
    # SOF0: 8-bit, 16x16, 1 component h1v1 q0
    seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0]))
    # DHT DC table 0: 12 symbols (categories 0..11), all code length 4
    counts_dc = [0, 0, 0, 12] + [0] * 12
    seg(0xC4, bytes([0x00]) + bytes(counts_dc) + bytes(range(12)))
    # DHT AC table 0: single EOB symbol at code length 2
    counts_ac = [0, 1] + [0] * 14
    seg(0xC4, bytes([0x10]) + bytes(counts_ac) + bytes([0x00]))
    seg(0xDD, struct.pack(">H", dri))  # DRI
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS: comp 1, td=0 ta=0

    # canonical codes: DC cat t -> code t at length 4; AC EOB -> code 0 len 2
    bits = []

    def put(code, n):
        for i in range(n - 1, -1, -1):
            bits.append((code >> i) & 1)

    def flush_segment():
        while len(bits) % 8:
            bits.append(1)  # pad with 1s per spec
        data = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            data.append(b)
            if b == 0xFF:
                data.append(0x00)  # byte stuffing
        bits.clear()
        return bytes(data)

    for i, v in enumerate(block_vals):
        d = 8 * (v - 128)  # DC diff (predictor resets each restart segment)
        if d == 0:
            t = 0
        else:
            t = d.bit_length() if d > 0 else (-d).bit_length()
        put(t, 4)  # DC category code (canonical: code value == index t)
        if t:
            put(d if d > 0 else d + (1 << t) - 1, t)
        put(0, 2)  # AC EOB
        out.extend(flush_segment())
        if i < len(block_vals) - 1:
            out.extend(bytes([0xFF, 0xD0 + (i % 8)]))  # RSTn
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_decode_jpeg_restart_markers_exact(spark):
    """DRI/RSTn: DC predictors reset at every restart segment, and the
    all-ones quant + flat tiles make the decode EXACT — pins the restart
    path, negative DC extend(), custom (non-Annex-K) Huffman tables and
    byte alignment at segment boundaries."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_jpeg

    vals = [40, 200, 128, 90]
    b = _mini_jpeg_gray_flat(vals, dri=1)
    row = decode_jpeg(
        spark.createDataFrame([(1, b)], "item_id long, payload binary")
    ).head()
    assert row["error"] is None, row["error"]
    assert (row["width"], row["height"], row["channels"]) == (16, 16, 1)
    # block layout: [[40, 200], [128, 90]] -> mean is the exact average
    assert row["feature"][0] == np.mean(vals)
    # std of the 4 flat tiles, exact
    px = np.repeat(np.repeat(np.array(vals).reshape(2, 2), 8, 0), 8, 1)
    assert abs(row["feature"][1] - px.std()) < 1e-9


def test_decode_jpeg_progressive_gray_vs_imageio(spark):
    """SOF2 progressive (r11): 1-component multi-scan stream from the
    JVM's progressive encoder — spectral selection + successive
    approximation, DC refinement, AC first + refinement with EOBRUN.
    Must track the JVM's own decode of the same bytes."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_jpeg

    encode, jdecode = _jvm_jpeg_tools(spark)
    g = np.linspace(0, 255, 32 * 24).reshape(24, 32, 1).astype(np.uint8)
    b = encode(g, gray=True, progressive=True)
    oracle = jdecode(b, gray=True)
    row = decode_jpeg(
        spark.createDataFrame([(1, b)], "item_id long, payload binary")
    ).head()
    assert row["error"] is None, row["error"]
    assert (row["width"], row["height"], row["channels"]) == (32, 24, 1)
    assert abs(row["feature"][0] - oracle[:, :, 0].mean()) < 1.5


def test_decode_jpeg_progressive_rgb_vs_imageio(spark):
    """Progressive 3-component 4:2:0 with odd dimensions: interleaved DC
    scans + per-component AC scans over the un-MCU-padded block grid,
    chroma upsampling after multi-scan accumulation."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_jpeg

    encode, jdecode = _jvm_jpeg_tools(spark)
    rs = np.random.RandomState(11)
    base = rs.randint(0, 256, (3,))
    px = np.zeros((19, 21, 3), np.uint8)
    for y in range(19):
        for x in range(21):
            px[y, x] = (base + np.array([x * 5, y * 7, (x + y) * 3])) % 256
    b = encode(px, progressive=True)
    oracle = jdecode(b)
    row = decode_jpeg(
        spark.createDataFrame([(1, b)], "item_id long, payload binary")
    ).head()
    assert row["error"] is None, row["error"]
    assert (row["width"], row["height"], row["channels"]) == (21, 19, 3)
    om = oracle.reshape(-1, 3).mean(axis=0)
    assert np.allclose(row["feature"][:3], om, atol=4.0)


def test_decode_jpeg_progressive_solid_vs_imageio(spark):
    """Constant-chroma progressive image: upsampling differences vanish,
    so the multi-scan accumulation must agree almost exactly."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_jpeg

    encode, jdecode = _jvm_jpeg_tools(spark)
    px = np.zeros((24, 24, 3), np.uint8)
    px[:] = (180, 90, 40)
    b = encode(px, progressive=True)
    oracle = jdecode(b)
    row = decode_jpeg(
        spark.createDataFrame([(1, b)], "item_id long, payload binary")
    ).head()
    assert row["error"] is None, row["error"]
    om = oracle.reshape(-1, 3).mean(axis=0)
    assert np.allclose(row["feature"][:3], om, atol=2.0)


def test_decode_jpeg_progressive_matches_baseline_decode(spark):
    """The SAME image encoded baseline and progressive must decode to
    near-identical features — the two entropy paths share the IDCT /
    upsample / colorspace stages, so residuals are quantization-identical
    (the JVM encoder uses the same tables for both modes)."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_jpeg

    encode, _ = _jvm_jpeg_tools(spark)
    rs = np.random.RandomState(23)
    px = rs.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    bb = encode(px)
    bp = encode(px, progressive=True)
    rows = {
        r["item_id"]: r
        for r in decode_jpeg(
            spark.createDataFrame(
                [(1, bb), (2, bp)], "item_id long, payload binary"
            )
        ).collect()
    }
    assert rows[1]["error"] is None and rows[2]["error"] is None
    assert np.allclose(rows[1]["feature"], rows[2]["feature"], atol=1.0)


# ----------------------------------------------------------------- GIF

def _lzw_gif_encode(indices, min_code):
    """Raw-code LZW for the test encoder: emit CLEAR whenever the code
    table would force a width change, so codes stay fixed-width — valid
    GIF any decoder accepts."""
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


def _gif_bytes(frames, W, H, gct, interlaced=False, delays_cs=None,
               transparent=None, lct_for=None):
    """Minimal GIF89a encoder for the tests: global palette, optional
    per-frame GCE (delay + transparency), optional local palette for one
    frame, optional interlacing on every frame."""
    import struct

    import numpy as np

    def pal_block(pal):
        n = len(pal)
        exp = max(1, (n - 1).bit_length()) - 1  # 2^(exp+1) >= n
        while 2 ** (exp + 1) < n:
            exp += 1
        full = np.zeros((2 ** (exp + 1), 3), np.uint8)
        full[:n] = pal
        return exp, full.tobytes()

    exp, gbytes = pal_block(gct)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", W, H, 0x80 | exp, 0, 0)
    out += gbytes
    for fi, idx in enumerate(frames):
        h, w = idx.shape
        if delays_cs is not None or transparent is not None:
            d = (delays_cs or [0] * len(frames))[fi]
            packed = 0x01 if transparent is not None else 0x00
            out += bytes([0x21, 0xF9, 0x04, packed, d & 255, d >> 8,
                          transparent or 0, 0x00])
        flags = 0
        lct_bytes = b""
        if lct_for is not None and fi == lct_for[0]:
            lexp, lct_bytes = pal_block(lct_for[1])
            flags |= 0x80 | lexp
        if interlaced:
            flags |= 0x40
            rows = (list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2)))
            stored = idx[rows]
        else:
            stored = idx
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, flags)
        out += lct_bytes
        min_code = max(2, exp + 1)
        out += bytes([min_code])
        data = _lzw_gif_encode(stored.reshape(-1), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0x00])
    out += bytes([0x3B])
    return bytes(out)


def _jvm_gif_tools(spark):
    """GIF encode (static + animated sequence) / per-frame decode oracle
    via javax.imageio."""
    import numpy as np

    jvm = spark._jvm

    def to_bi(px):
        h, w = px.shape[:2]
        bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
        for y in range(h):
            for x in range(w):
                bi.setRGB(x, y, (int(px[y, x, 0]) << 16)
                          | (int(px[y, x, 1]) << 8) | int(px[y, x, 2]))
        return bi

    def encode(frames_px):
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "gif"
        ).next()
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        if len(frames_px) == 1:
            writer.write(to_bi(frames_px[0]))
        else:
            writer.prepareWriteSequence(None)
            for px in frames_px:
                writer.writeToSequence(
                    jvm.javax.imageio.IIOImage(to_bi(px), None, None), None
                )
            writer.endWriteSequence()
        ios.flush()
        writer.dispose()
        return bytes(baos.toByteArray())

    def decode_frame(b, i):
        reader = jvm.javax.imageio.ImageIO.getImageReadersByFormatName(
            "gif"
        ).next()
        iis = jvm.javax.imageio.ImageIO.createImageInputStream(
            jvm.java.io.ByteArrayInputStream(b)
        )
        reader.setInput(iis)
        n = reader.getNumImages(True)
        bi = reader.read(i)
        w, h = bi.getWidth(), bi.getHeight()
        out = np.zeros((h, w, 3), np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = bi.getRGB(x, y)
                out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
        reader.dispose()
        return n, out

    return encode, decode_frame


def test_decode_gif_vs_imageio(spark):
    """Static GIF from the JVM's writer: lossless palette codec, so our
    LZW + palette decode must match the JVM's own decode EXACTLY."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import decode_gif

    encode, jdecode = _jvm_gif_tools(spark)
    px = np.zeros((13, 17, 3), np.uint8)
    for y in range(13):
        for x in range(17):
            px[y, x] = [(x * 16) % 256, (y * 20) % 256, ((x + y) * 8) % 256]
    b = encode([px])
    _, oracle = jdecode(b, 0)
    row = decode_gif(
        spark.createDataFrame([(1, b)], "item_id long, payload binary")
    ).head()
    assert row["error"] is None, row["error"]
    assert (row["width"], row["height"], row["channels"]) == (17, 13, 3)
    flat = oracle.reshape(-1, 3).astype(float)
    want = list(flat.mean(axis=0)) + list(flat.std(axis=0))
    assert np.allclose(row["feature"], want)


def test_gif_frame_sample_animated_vs_imageio(spark):
    """Animated GIF (ImageIO sequence writer): one row per frame, each
    frame's pixels matching the JVM reader's per-frame raster exactly."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import gif_frame_sample

    encode, jdecode = _jvm_gif_tools(spark)
    frames = []
    for k in range(4):
        px = np.zeros((8, 8, 3), np.uint8)
        px[:] = [k * 60, 255 - k * 60, (k * 90) % 256]
        frames.append(px)
    b = encode(frames)
    n, _ = jdecode(b, 0)
    assert n == 4
    rows = (
        gif_frame_sample(
            spark.createDataFrame([(7, b)], "item_id long, payload binary")
        )
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert all(r["n_frames"] == 4 and r["error"] is None for r in rows)
    for i, r in enumerate(rows):
        _, oracle = jdecode(b, i)
        flat = oracle.reshape(-1, 3).astype(float)
        want = list(flat.mean(axis=0)) + list(flat.std(axis=0))
        assert np.allclose(r["feature"], want), f"frame {i}"
    # stride + cap: every 2nd frame, max 1
    sampled = gif_frame_sample(
        spark.createDataFrame([(7, b)], "item_id long, payload binary"),
        every_n=2,
    ).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in sampled] == [0, 2]


def test_decode_gif_interlace_local_palette_transparency_exact(spark):
    """The paths no stock encoder exercises, hand-rolled (the _mini_jpeg
    precedent): interlaced row de-scramble, a local color table
    overriding the global one, GCE transparency adding an exact alpha
    channel, and per-frame delays."""
    import numpy as np

    from rudder_server_spark.operators.multimodal import (
        decode_gif,
        gif_frame_sample,
    )

    gct = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
                   np.uint8)
    idx = np.arange(64, dtype=np.int32).reshape(8, 8) % 4

    # interlaced static frame: decode must de-scramble back to idx
    b_i = _gif_bytes([idx], 8, 8, gct, interlaced=True)
    r = decode_gif(
        spark.createDataFrame([(1, b_i)], "item_id long, payload binary")
    ).head()
    assert r["error"] is None, r["error"]
    flat = gct[idx.reshape(-1)].astype(float)
    want = list(flat.mean(axis=0)) + list(flat.std(axis=0))
    assert np.allclose(r["feature"], want)

    # local palette on frame 1 of 2 + delays + transparency on index 3
    lct = np.array([[5, 5, 5], [250, 250, 250], [0, 0, 0], [1, 2, 3]],
                   np.uint8)
    b_a = _gif_bytes(
        [idx, idx], 8, 8, gct, delays_cs=[25, 50], transparent=3,
        lct_for=(1, lct),
    )
    rows = gif_frame_sample(
        spark.createDataFrame([(2, b_a)], "item_id long, payload binary")
    ).orderBy("frame_idx").collect()
    assert [r["delay_ms"] for r in rows] == [250, 500]
    assert all(r["channels"] == 4 for r in rows)  # alpha from transparency
    for r, pal in zip(rows, (gct, lct)):
        rgb = pal[idx.reshape(-1)].astype(float)
        alpha = np.where(idx.reshape(-1) == 3, 0.0, 255.0)
        px = np.column_stack([rgb, alpha])
        want = list(px.mean(axis=0)) + list(px.std(axis=0))
        assert np.allclose(r["feature"], want)

    # garbage keeps-with-status
    bad = decode_gif(
        spark.createDataFrame([(3, b"GIF89a junk")], "item_id long, payload binary")
    ).head()
    assert bad["error"] is not None
