"""Multimodal plumbing: schema, batch shapes, feature extraction,
frame sampling; decode stub contract."""

import numpy as np
import pytest

from auctus_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_decode,
    resize_plumbing,
    sample_frames,
    synthesize_media,
)


def test_decode_non_png_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_png_roundtrip_all_shapes():
    """encode_png(mixed filters) → decode_png is lossless for every
    supported color type; mixed mode touches filters 0-4."""
    from auctus_spark.operators.png import decode_png, encode_png
    rng = np.random.RandomState(42)
    for shape in [(7, 5), (6, 9, 3), (11, 4, 4), (5, 8, 2), (1, 1),
                  (1, 3, 3), (9, 1, 4), (16, 16, 3)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        for filters in ("mixed", "none"):
            out = decode_png(encode_png(arr, filters=filters))
            assert out.shape == arr.shape, (shape, filters)
            assert np.array_equal(out, arr), (shape, filters)


def test_png_decode_matches_scalar_reference():
    """Decoder filters vs a straight-from-RFC-2083 scalar re-filter
    implementation, independent of the encoder's filter choices."""
    from auctus_spark.operators.png import decode_png, encode_png

    def ref_unfilter(h, w, bpp, rows):
        out = []
        prev = [0] * (w * bpp)
        for f, line in rows:
            cur = list(line)
            for i in range(w * bpp):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif f == 2:
                    cur[i] = (cur[i] + b) & 0xFF
                elif f == 3:
                    cur[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) & 0xFF
            out.append(cur)
            prev = cur
        return np.array(out, dtype=np.uint8)

    import struct
    import zlib
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(10, 6, 3)).astype(np.uint8)
    data = encode_png(arr, filters="mixed")
    # pull the raw filtered scanlines back out of the IDAT stream
    pos, idat = 8, []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        if typ == b"IDAT":
            idat.append(data[pos + 8:pos + 8 + ln])
        pos += 12 + ln
    raw = zlib.decompress(b"".join(idat))
    stride = 6 * 3
    rows = [(raw[r * (stride + 1)],
             raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)])
            for r in range(10)]
    want = ref_unfilter(10, 6, 3, rows).reshape(10, 6, 3)
    assert np.array_equal(want, arr)          # encoder is invertible
    assert np.array_equal(decode_png(data), want)


def test_png_unsupported_sniffed():
    from auctus_spark.operators.png import PNG_SIG, decode_png
    import struct
    import zlib
    # depth-16 header must raise, not silently misdecode
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pytest.raises(NotImplementedError):
        decode_png(PNG_SIG + chunk)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_image_stats_gate_shape(spark):
    """synthesize_png_media → image_stats: real PNG encode+decode in
    executors; stats equal the closed-form pixel function."""
    from auctus_spark.operators.multimodal import (
        deterministic_image, image_stats, synthesize_png_media)
    ids = spark.range(0, 30, 1, 4).withColumnRenamed("id", "media_id")
    got = {r.media_id: r for r in
           image_stats(synthesize_png_media(spark, ids)).collect()}
    assert len(got) == 30
    for i in range(30):
        arr = deterministic_image(i)
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        r = got[i]
        assert (r.height, r.width) == arr.shape[:2]
        assert r.channels == ch
        assert abs(r.px_mean - float(arr.mean())) < 1e-9
        assert r.px_min == int(arr.min())
        assert r.px_max == int(arr.max())


def test_fake_decode_deterministic():
    a = fake_decode(b"payload", 8, 8)
    b = fake_decode(b"payload", 8, 8)
    assert np.array_equal(a, b)
    assert a.shape == (8, 8)


def test_feature_extraction(spark):
    media = synthesize_media(spark, 20, payload_bytes=1024)
    feats = extract_features(media).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-5  # normalized histogram
    # deterministic across runs
    again = extract_features(synthesize_media(spark, 20,
                                              payload_bytes=1024)).collect()
    m1 = {r.media_id: list(r.feature) for r in feats}
    m2 = {r.media_id: list(r.feature) for r in again}
    assert m1 == m2


def test_byte_budget_subbatching(spark):
    # tiny byte budget forces many sub-batches; results identical
    media = synthesize_media(spark, 10, payload_bytes=2048)
    a = {r.media_id: list(r.feature)
         for r in extract_features(media, batch_bytes=1).collect()}
    b = {r.media_id: list(r.feature)
         for r in extract_features(media).collect()}
    assert a == b


def test_frame_sampling(spark):
    media = synthesize_media(spark, 5, kind="video")
    frames = sample_frames(media, every_ms=10).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.ts_ms)
    # duration_ms = id*10 → id 4 has 4 frames at 0,10,20,30
    assert sorted(by_id[4]) == [0, 10, 20, 30]
    assert sorted(by_id[0]) == [0]  # min one frame


def test_resize_plumbing(spark):
    media = synthesize_media(spark, 3)
    out = resize_plumbing(media, 32, 16).collect()
    assert all(r.width == 32 and r.height == 16 for r in out)


def test_png_palette_roundtrip():
    """Color-type-3 (palette) decode: PLTE expansion to RGB, tRNS to
    RGBA; filters run on index bytes per spec."""
    from auctus_spark.operators.png import (decode_png,
                                            encode_png_palette)
    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, size=(9, 7)).astype(np.uint8)
    out = decode_png(encode_png_palette(idx, pal))
    assert out.shape == (9, 7, 3)
    assert np.array_equal(out, pal[idx])
    # tRNS: entries 0-3 translucent, rest default opaque 255
    trns = np.array([0, 50, 100, 150], dtype=np.uint8)
    out4 = decode_png(encode_png_palette(idx, pal, trns=trns))
    assert out4.shape == (9, 7, 4)
    assert np.array_equal(out4[:, :, :3], pal[idx])
    alpha = np.full(16, 255, np.uint8)
    alpha[:4] = trns
    assert np.array_equal(out4[:, :, 3], alpha[idx])
    # missing PLTE must raise, out-of-range index must raise
    import pytest as _pt
    from auctus_spark.operators.png import PNG_SIG
    bad = encode_png_palette(idx, pal)
    # strip the PLTE chunk
    import struct as _st
    pos, chunks = 8, []
    while pos + 8 <= len(bad):
        (ln,) = _st.unpack(">I", bad[pos:pos + 4])
        typ = bad[pos + 4:pos + 8]
        if typ != b"PLTE":
            chunks.append(bad[pos:pos + 12 + ln])
        pos += 12 + ln
    with _pt.raises(ValueError, match="PLTE"):
        decode_png(PNG_SIG + b"".join(chunks))
    with _pt.raises(ValueError, match="range"):
        decode_png(encode_png_palette(idx, pal[:8]))
