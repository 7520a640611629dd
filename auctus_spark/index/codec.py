"""Posting-list codec: delta + varbyte (LEB128) compression with
block-max metadata.

The reference hides this layer inside Elasticsearch/Lucene
(docker-compose.yml:4 pins ES 7.10.2); the north rule requires it as
first-class Spark code.  Everything here is numpy-vectorized — it runs
inside ``applyInPandas``/``mapInPandas`` over Arrow batches, never
per-row Python.

Layout per (term, bucket) segment:

- ``doc_ids``  → sorted ascending, delta-encoded (first value absolute),
  LEB128 varbyte stream.
- ``tfs``      → LEB128 stream, aligned with doc_ids.
- ``doc_lens`` → LEB128 stream, aligned (storing dl inline removes the
  query-time doc-stats join and makes block maxes exact).
- blocks of ``BLOCK_SIZE`` postings; per block we store the max
  *score upper bound* ``max(tf / (tf + k1*(1-b+b*dl/avgdl)))`` computed
  with the global avgdl snapshot — block-max WAND skips whole blocks
  whose bound can't reach the heap threshold.
"""

from __future__ import annotations

import numpy as np

from .. import B, K1

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64 array (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    n = v.shape[0]
    if n == 0:
        return b""
    # byte length per value: 1 + number of 7-bit groups above the first
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = byte | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode an LEB128 stream to int64 (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.array([], dtype=np.int64)
    is_end = (raw & 0x80) == 0
    end_idx = np.nonzero(is_end)[0]
    starts = np.empty_like(end_idx)
    starts[0] = 0
    starts[1:] = end_idx[:-1] + 1
    idx = np.arange(raw.size, dtype=np.int64)
    # value id per byte = number of ends strictly before this byte
    value_id = np.cumsum(is_end) - is_end
    within = idx - starts[value_id]
    contrib = (raw.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * within.astype(np.uint64))
    vals = np.add.reduceat(contrib, starts)
    return vals.astype(np.int64)


def delta_encode(sorted_ids: np.ndarray, block_size: int = BLOCK_SIZE
                 ) -> np.ndarray:
    """Delta-encode with a reset at every block boundary: the first
    value of each block is the absolute docID, so any block decodes
    independently of its predecessors (block skipping)."""
    n = sorted_ids.shape[0]
    d = np.empty_like(sorted_ids)
    d[0] = sorted_ids[0]
    np.subtract(sorted_ids[1:], sorted_ids[:-1], out=d[1:])
    starts = np.arange(0, n, block_size)
    d[starts] = sorted_ids[starts]
    return d


def delta_decode(deltas: np.ndarray, block_size: int = BLOCK_SIZE
                 ) -> np.ndarray:
    """Inverse of :func:`delta_encode` (vectorized, no per-block loop):
    within block b starting at s, doc_i = cumsum(deltas)[i] -
    cumsum(deltas)[s-1]."""
    n = deltas.shape[0]
    if n == 0:
        return deltas
    c = np.cumsum(deltas)
    starts = np.arange(0, n, block_size)
    base = np.where(starts > 0, c[starts - 1], 0)
    sizes = np.minimum(starts + block_size, n) - starts
    return c - np.repeat(base, sizes)


def tf_norm_bound(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
                  k1: float = K1, b: float = B) -> np.ndarray:
    """Exact per-posting BM25 tf-norm (float64); block max of this is the
    block-max WAND bound (exact because dl is stored inline)."""
    return tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))


def _leb_lengths(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.uint64, copy=False)
    nbytes = np.ones(v.shape[0], dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return nbytes


def block_offsets(values: np.ndarray, block_size: int = BLOCK_SIZE
                  ) -> np.ndarray:
    """Byte offset of each block's start within the LEB128 stream of
    ``values`` (plus the end sentinel) — makes blocks independently
    decodable together with the per-block delta reset."""
    nbytes = _leb_lengths(values)
    ends = np.cumsum(nbytes)
    starts = np.arange(0, values.shape[0], block_size)
    offs = np.empty(starts.shape[0] + 1, dtype=np.int64)
    offs[0] = 0
    offs[1:-1] = ends[starts[1:] - 1]
    offs[-1] = ends[-1]
    return offs


def encode_segment(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                   avgdl: float) -> dict:
    """Encode one (term, bucket) posting segment.

    Returns dict with binary streams + block-max metadata + per-block
    byte offsets, ready to become one row of the index table.
    ``doc_ids`` must be sorted ascending and unique.
    """
    n = doc_ids.shape[0]
    blocks = np.arange(0, n, BLOCK_SIZE)
    norm = tf_norm_bound(tfs.astype(np.float64), dls.astype(np.float64), avgdl)
    block_max = np.maximum.reduceat(norm, blocks)
    block_last_doc = doc_ids[np.minimum(blocks + BLOCK_SIZE - 1, n - 1)]
    deltas = delta_encode(doc_ids)
    return {
        "n_docs": int(n),
        "doc_id_min": int(doc_ids[0]),
        "doc_id_max": int(doc_ids[-1]),
        "docs_blob": varbyte_encode(deltas),
        "tfs_blob": varbyte_encode(tfs),
        "dls_blob": varbyte_encode(dls),
        "docs_off": block_offsets(deltas),
        "tfs_off": block_offsets(tfs),
        "dls_off": block_offsets(dls),
        "block_max": block_max.astype(np.float64),
        "block_last_doc": block_last_doc.astype(np.int64),
        "max_norm": float(norm.max()) if n else 0.0,
    }


def decode_segment(docs_blob: bytes, tfs_blob: bytes, dls_blob: bytes
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    doc_ids = delta_decode(varbyte_decode(docs_blob))
    tfs = varbyte_decode(tfs_blob)
    dls = varbyte_decode(dls_blob)
    return doc_ids, tfs, dls


def decode_blocks(blob: bytes, offs: np.ndarray, block_idx: np.ndarray,
                  deltas: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the selected blocks from a stream with per-block
    offsets.  Returns (values, posting_positions) where positions are
    the global posting indices the values correspond to.

    With ``deltas=True`` the stream is the per-block-reset delta stream
    and absolute docIDs are reconstructed per selected block.
    """
    if len(block_idx) == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    parts = []
    positions = []
    mv = memoryview(blob)
    for b in block_idx:
        raw = varbyte_decode(bytes(mv[offs[b]:offs[b + 1]]))
        if deltas:
            raw = np.cumsum(raw)
        parts.append(raw)
        start = b * BLOCK_SIZE
        positions.append(np.arange(start, start + raw.shape[0]))
    return np.concatenate(parts), np.concatenate(positions)
