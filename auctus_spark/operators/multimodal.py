"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake or NotImplementedError) — but everything Spark-side
is real and tested: the schema, Arrow batch shapes, mapInPandas UDF
signatures, partition sizing for large blobs, and the
feature-extraction / frame-sampling dataflow.

At 100 TB the rules encoded here matter: blobs ride in their own
column so column pruning skips them unless asked; batch sizes are
capped by bytes not rows (``maxRecordsPerBatch`` alone is wrong for
multi-MB blobs); features are fixed-width ``array<float>`` ready for
the similarity operators.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), True),     # opaque blob
])

FEATURE_DIM = 64


def synthesize_media(spark, n: int, kind: str = "image",
                     payload_bytes: int = 4096, partitions: int = 8
                     ) -> DataFrame:
    """Deterministic fake media table (sha-derived payloads)."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "media_id": ids,
                "kind": [kind] * len(ids),
                "mime": [f"{kind}/fake"] * len(ids),
                "width": np.full(len(ids), 64, dtype=np.int32),
                "height": np.full(len(ids), 64, dtype=np.int32),
                "duration_ms": ids * 10,
                "payload": [
                    hashlib.sha256(f"media{i}".encode()).digest()
                    * (payload_bytes // 32) for i in ids],
            }
            yield pd.DataFrame(rows)
    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image blob to a numpy uint8 array ((H,W) grayscale or
    (H,W,C)).  PNG is decoded for real by the from-spec stdlib codec
    (:mod:`.png` — zlib IDAT + per-scanline filters, numpy-vectorized
    unfiltering); other formats (JPEG etc.) need native codecs the
    container doesn't ship and raise by contract.

    NATIVE-CODEC PLUG-POINT: this function is the single seam where a
    production deployment swaps in a native decoder (Pillow/OpenCV/
    libvips) — dispatch on the magic bytes here and return the same
    uint8 (H,W[,C]) contract.  Everything Spark-side (mapInPandas
    batching, MEDIA_SCHEMA, the [image_stats] aggregation plan) is
    codec-agnostic and unchanged by the swap."""
    from .png import PNG_SIG, decode_png
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "only PNG decode is available in this environment (no native "
        "image codecs); use fake_decode for other formats")


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo-pixel grid."""
    seed = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    reps = int(np.ceil(width * height / seed.size))
    return np.tile(seed, reps)[: width * height].reshape(height, width)


def deterministic_image(media_id: int) -> np.ndarray:
    """Seeded pixel grid for fixtures/gates: geometry and every pixel
    value are closed-form functions of ``media_id``, so an external
    oracle (DuckDB SQL) can recompute decoded-image statistics without
    running the codec.  ch cycles gray/RGB/RGBA."""
    w, h = 8 + media_id % 17, 8 + media_id % 13
    ch = (1, 3, 4)[media_id % 3]
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    k = np.arange(ch, dtype=np.int64)[None, None, :]
    v = (media_id * 7 + r * 3 + c * 5 + k * 11) % 256
    arr = v.astype(np.uint8)
    return arr[:, :, 0] if ch == 1 else arr


def synthesize_png_media(spark, ids: DataFrame,
                         id_col: str = "media_id") -> DataFrame:
    """(id) → MEDIA_SCHEMA rows whose payloads are REAL PNGs (mixed
    per-row filters) of :func:`deterministic_image`.  mapInPandas —
    encode is per-partition, nothing touches the driver."""
    from .png import encode_png

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height",
                                   "payload")}
            for i in pdf[id_col].astype("int64"):
                arr = deterministic_image(int(i))
                out["media_id"].append(int(i))
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["payload"].append(encode_png(arr))
            n = len(out["media_id"])
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "kind": ["image"] * n,
                "mime": ["image/png"] * n,
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "duration_ms": pd.Series([0] * n, dtype="int64"),
                "payload": out["payload"]})
    return ids.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def image_stats(media: DataFrame, batch_bytes: int = 64 << 20
                ) -> DataFrame:
    """Decode each payload (real PNG codec) and emit per-image stats:
    (media_id, width, height, channels, px_mean, px_min, px_max).
    Same byte-budgeted sub-batching as :func:`extract_features`."""
    def run(batches):
        for pdf in batches:
            for lo, hi in _byte_cuts(pdf, batch_bytes):
                chunk = pdf.iloc[lo:hi]
                rows = {k: [] for k in ("media_id", "width", "height",
                                        "channels", "px_mean",
                                        "px_min", "px_max")}
                for r in chunk.itertuples(index=False):
                    arr = decode_image(r.payload)
                    ch = 1 if arr.ndim == 2 else arr.shape[2]
                    rows["media_id"].append(int(r.media_id))
                    rows["height"].append(arr.shape[0])
                    rows["width"].append(arr.shape[1])
                    rows["channels"].append(ch)
                    rows["px_mean"].append(float(arr.mean()))
                    rows["px_min"].append(int(arr.min()))
                    rows["px_max"].append(int(arr.max()))
                yield pd.DataFrame(rows)
    return media.mapInPandas(
        run, schema=("media_id long, width int, height int, "
                     "channels int, px_mean double, px_min long, "
                     "px_max long"))


def _byte_cuts(pdf: pd.DataFrame, batch_bytes: int) -> list[tuple[int, int]]:
    """Split a pandas batch into row ranges whose summed payload bytes
    stay under ``batch_bytes`` (shared by the decode operators)."""
    sizes = pdf["payload"].map(len).to_numpy()
    cuts, acc = [0], 0
    for i, s in enumerate(sizes):
        acc += int(s)
        if acc >= batch_bytes:
            cuts.append(i + 1)
            acc = 0
    if cuts[-1] != len(pdf):
        cuts.append(len(pdf))
    return list(zip(cuts[:-1], cuts[1:]))


def extract_features(media: DataFrame, batch_bytes: int = 64 << 20
                     ) -> DataFrame:
    """media → (media_id, kind, feature: array<float>).

    mapInPandas with BYTE-budgeted sub-batching: an Arrow batch of rows
    is re-chunked so no numpy working set exceeds ``batch_bytes`` —
    the pattern real decoders need (decode of a 10k-row batch of 5 MB
    images would OOM an executor otherwise).
    """
    from .png import PNG_SIG

    def run(batches):
        for pdf in batches:
            for lo, hi in _byte_cuts(pdf, batch_bytes):
                chunk = pdf.iloc[lo:hi]
                feats = []
                for r in chunk.itertuples(index=False):
                    if r.payload[:8] == PNG_SIG:
                        px = decode_image(r.payload)   # real codec
                    else:
                        px = fake_decode(r.payload, r.width or 8,
                                         r.height or 8)
                    # 64-bin intensity histogram as the feature
                    hist, _ = np.histogram(px, bins=FEATURE_DIM,
                                           range=(0, 256))
                    f = hist.astype(np.float64)
                    feats.append((f / max(f.sum(), 1)).astype(np.float32))
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "kind": chunk["kind"].to_numpy(),
                    "feature": feats})
    return media.mapInPandas(
        run, schema="media_id long, kind string, feature array<float>")


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling dataflow: one output row per sampled frame
    timestamp (decode stubbed; the explode/shape is the real part)."""
    n_frames = F.greatest(
        (F.col("duration_ms") / F.lit(every_ms)).cast("long"), F.lit(1))
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), n_frames - 1))
                    .alias("frame_idx"))
            .withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms)))


def resize_plumbing(media: DataFrame, w: int, h: int) -> DataFrame:
    """Resize = decode → scale → re-encode; here metadata-only (the
    Spark dataflow part), payload passed through untouched."""
    return media.withColumn("width", F.lit(w).cast("int")) \
                .withColumn("height", F.lit(h).cast("int"))
