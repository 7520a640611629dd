"""Inverted-index build: tokenize → compressed partial segments →
JVM merge into a term-partitioned index.  Resumable per docID-range
chunk.

What Elasticsearch did for the reference (index documents into Lucene
shards, ``lib_core/datamart_core/common.py:451-467``) becomes two Spark
stages, shaped by one rule: ship COMPRESSED postings across every
boundary (the MapReduce local-indexing + merge construction):

1. **tokenize+encode** — one ``mapInArrow`` pass over the corpus.
   Per Arrow batch it tokenizes, counts term frequencies, and emits
   already-compressed PARTIAL SEGMENTS: one row per (term, doc-range
   bucket) with delta+varbyte blobs, per-block byte offsets and
   block-max metadata.  The Python→JVM return is ~100× smaller than
   raw (term, doc, tf) rows — this is what makes the stage scale with
   cores instead of drowning in Arrow serialization.  Lineage metrics
   (doc count, sha256 rollup) ride the SAME job via two Observations:
   one on the input scan (count/min/max/sha — pure JVM expressions, no
   per-row Python anywhere), one on the partials output (token totals
   from segment metadata).  Written per *chunk* (fixed docID range) →
   resumable: chunks with lineage rows are skipped.
2. **merge** — pure JVM: repartition partials by ``term_bucket``
   (murmur3(term) % T) and sort by (term, bucket, doc_id_min) within
   partitions, written ``partitionBy(term_bucket)``.  No Python, no
   blob surgery: partials of one (term, bucket) are disjoint sorted
   docID runs, so the query scorers concatenate them after decode.
   Hot terms (df ~ 30% of corpus) are spread across doc buckets AND
   across stage-1 tasks — no single task ever owns a hot term
   (the salted-repartition requirement).

Block-max metadata is stored avgdl-free as (block_max_tf,
block_min_dl): tf_norm is increasing in tf and decreasing in dl, so
``tf_norm(max_tf, min_dl, avgdl)`` is a correct upper bound for any
avgdl chosen later — encoding never needs a second pass over the
corpus.

docID-ordering contract: scorers concatenate partials of one
(term, bucket) sorted by ``doc_id_min`` and rely on the runs being
DISJOINT.  That holds when corpus batches arrive docID-ascending and
task splits cover disjoint docID ranges (true for a corpus parquet
written in docID order).  The encoder VALIDATES per-batch ascending
order and fails loudly; for arbitrarily-ordered input pass
``presort=True`` to range-partition + sort by doc_id first (one
shuffle).  The query side additionally asserts run disjointness at
decode time (``query/bm25.py:_group_partials``).

Global stats discipline: N and avgdl come from the per-chunk lineage
rows (finalize_stats), df/cf per term from segment metadata
(finalize_term_stats) — global snapshots, required for rank identity.

Iceberg note: the sandbox has no Iceberg jars; tables are parquet
directories with the same layout.  Lineage rows live in an ordinary
table either way and are committed after chunk data (write data →
commit lineage last).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import BLOCK_SIZE

DEFAULT_DOC_BUCKET = 1 << 16      # docs per scoring bucket
DEFAULT_CHUNK_DOCS = 1 << 20      # docs per resumable build chunk
DEFAULT_TERM_BUCKETS = 64

# on-disk layout version: bumped when PARTIAL_SCHEMA / segment layout
# changes; readers and resumed builds fail loudly on stale indexes
# instead of misreading them.  v2: binary-packed block metadata,
# marker-row-free lineage.  v3: optional per-posting position streams
# (pos_blob/pos_off columns; empty when positions=False).
FORMAT_VERSION = 3


class CompactionInProgressError(RuntimeError):
    """A compaction started but never finished: segments and stats may
    be inconsistent (compacted postings + pre-compaction N/df/avgdl
    would silently mis-score).  Raised on every open until resolved."""


def check_not_compacting(index_dir: str) -> None:
    marker = os.path.join(index_dir, "_COMPACTING")
    if os.path.exists(marker):
        raise CompactionInProgressError(
            f"index {index_dir} has an unfinished compaction "
            "(_COMPACTING marker present). Run "
            "rollback_compaction(spark, index_dir) to restore the "
            "pre-compaction segments, stats, tombstones and "
            "removed_docs as one unit, then re-run compact(). If the "
            "'*_old' snapshot dirs are gone, rebuild from the corpus.")


def read_format(index_dir: str) -> int | None:
    """Layout version of an existing index dir (None if no marker —
    either empty dir or a pre-versioning build).  Also the common
    open-path guard: fails loudly on a half-completed compaction."""
    check_not_compacting(index_dir)
    p = os.path.join(index_dir, "_FORMAT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def read_analyzer(index_dir: str) -> dict:
    """Analyzer config stamped at build time ({} for pre-analyzer
    indexes = stem-free).  Readers MUST analyze queries with the same
    chain the index was built with (ES stores this in the mapping)."""
    import json
    p = os.path.join(index_dir, "_ANALYZER")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)

# block metadata is packed little-endian binary, not list<long>:
# parquet + Tungsten handle flat binary far cheaper than nested lists
# (the merge shuffle moves every one of these rows).  Byte offsets
# within one partial's blob always fit int32 (a partial covers at most
# one doc bucket); block_last_doc keeps int64 for 10^12-scale docIDs.
PARTIAL_SCHEMA = (
    "term string, bucket long, n_docs long, tf_sum long, doc_id_min long, "
    "doc_id_max long, docs_blob binary, tfs_blob binary, dls_blob binary, "
    "docs_off binary, tfs_off binary, dls_off binary, "
    "block_max_tf binary, block_min_dl binary, "
    "block_last_doc binary, max_tf long, min_dl long, "
    "pos_blob binary, pos_off binary"
)

def _sha_rollup_expr():
    """JVM-side sha256 lineage rollup: first 15 hex chars (60 bits) as
    decimal — summing 10^12 of them stays far inside decimal(38,0).
    The SAME expression is used at build time (input Observation) and
    in verify_lineage, and is hashlib-parity-tested in
    tests/test_resume.py."""
    return (F.conv(F.substring(F.sha2(F.col("content"), 256), 1, 15),
                   16, 10).cast("decimal(38,0)"))


@dataclass
class IndexPaths:
    base: str

    @property
    def partials(self):
        return os.path.join(self.base, "partials")

    @property
    def lineage(self):
        return os.path.join(self.base, "lineage")

    @property
    def stats(self):
        return os.path.join(self.base, "stats")

    @property
    def term_stats(self):
        return os.path.join(self.base, "term_stats")

    @property
    def segments(self):
        return os.path.join(self.base, "segments")

    @property
    def term_dict(self):
        # sorted secondary term dictionary (see write_term_dict)
        return os.path.join(self.base, "term_dict")

    @property
    def removed(self):
        # docIDs physically removed by past compactions (liveness
        # record; grows with lifetime deletes, read driver-side)
        return os.path.join(self.base, "removed_docs")


ARROW_PARTIAL_SCHEMA = None  # built lazily (pyarrow import)


def _arrow_schema():
    import pyarrow as pa
    global ARROW_PARTIAL_SCHEMA
    if ARROW_PARTIAL_SCHEMA is None:
        ARROW_PARTIAL_SCHEMA = pa.schema([
            ("term", pa.string()),
            ("bucket", pa.int64()),
            ("n_docs", pa.int64()),
            ("tf_sum", pa.int64()),
            ("doc_id_min", pa.int64()),
            ("doc_id_max", pa.int64()),
            ("docs_blob", pa.binary()),
            ("tfs_blob", pa.binary()),
            ("dls_blob", pa.binary()),
            ("docs_off", pa.binary()),
            ("tfs_off", pa.binary()),
            ("dls_off", pa.binary()),
            ("block_max_tf", pa.binary()),
            ("block_min_dl", pa.binary()),
            ("block_last_doc", pa.binary()),
            ("max_tf", pa.int64()),
            ("min_dl", pa.int64()),
            ("pos_blob", pa.binary()),
            ("pos_off", pa.binary()),
        ])
    return ARROW_PARTIAL_SCHEMA


def _tokenize_arrow(content, stem: bool = False):
    """Tokenize a pa.StringArray: ascii_lower → RE2 split on
    ``[^a-z0-9_]+`` → dictionary_encode, all in Arrow C++ (no per-token
    Python objects).  Returns (codes: int32 ndarray, doc_local: int32
    ndarray, vocab: pa.StringArray) with empty split artifacts dropped.
    Matches ``analysis.tokenize`` — the shared index/query analyzer
    contract.

    ``stem=True``: Porter2 applied to the (small) per-batch VOCABULARY
    only — never per token occurrence — then codes are remapped through
    the merged stem classes (lru-cached across batches)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(content)
    toks = pc.split_pattern_regex(pc.ascii_lower(content), "[^a-z0-9_]+")
    flat = pc.list_flatten(toks)
    lens = np.diff(toks.offsets.to_numpy().astype(np.int64))
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy()          # int32 dictionary codes
    doc_local = np.repeat(np.arange(n, dtype=np.int32),
                          lens.astype(np.int32))
    vocab = enc.dictionary
    vocab_np = vocab.to_numpy(zero_copy_only=False)
    empty_code = np.nonzero(vocab_np == "")[0]
    if empty_code.size:
        keep = codes != empty_code[0]
        codes, doc_local = codes[keep], doc_local[keep]
    if stem:
        from ..stem import stem as _stem
        stemmed = np.array([_stem(w) for w in vocab_np.tolist()],
                           dtype=object)
        new_vocab, inv = np.unique(stemmed, return_inverse=True)
        codes = inv.astype(np.int32)[codes]
        vocab = pa.array(new_vocab.tolist(), type=pa.string())
    return codes, doc_local, vocab


def _varbyte_stream(vals: np.ndarray, group_starts: np.ndarray):
    """LEB128-encode ``vals`` as one byte stream; returns (stream,
    per-group start offsets, per-group end offsets, per-value starts).
    Width-adaptive (uint32 fast path) with early exit at the value
    magnitude actually present — the encoder's hottest loop."""
    n = len(vals)
    vmax = int(vals.max()) if n else 0
    dt = np.uint32 if vmax < (1 << 32) else np.uint64
    v = vals.astype(dt)
    maxk = 1
    while vmax >= (1 << (7 * maxk)):
        maxk += 1
    nbytes = np.ones(n, dtype=np.int32)
    for k in range(1, maxk):
        nbytes += (v >= dt(1) << dt(7 * k)).astype(np.int32)
    ends = np.cumsum(nbytes, dtype=np.int64)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]) if n else 0, dtype=np.uint8)
    for j in range(maxk):
        mask = nbytes > j
        sel = v[mask] if j else v
        st = starts[mask] if j else starts
        nb = nbytes[mask] if j else nbytes
        byte = ((sel >> dt(7 * j)) & dt(0x7F)).astype(np.uint8)
        cont = ((nb - 1 > j).astype(np.uint8)) << 7
        out[st + j] = byte | cont
    g_off = starts[group_starts]
    g_end = np.append(g_off[1:], int(ends[-1]) if n else 0)
    return out, g_off, g_end, starts


def _encode_batch(doc_ids_all: np.ndarray, content, doc_bucket: int,
                  stem: bool = False, positions: bool = False):
    """One corpus slice → partial-segment RecordBatch.

    Everything stays in Arrow/numpy: tokenization is Arrow C++
    (ascii_lower → RE2 split → dictionary_encode), tf counting is one
    np.unique over packed uint32 keys, and the OUTPUT arrays are
    assembled with binary from_buffers — no per-row Python anywhere
    (pandas→Arrow of millions of object rows was the build's largest
    non-scaling cost).  ``content`` is a pa.StringArray aligned with
    ``doc_ids_all``, which MUST be strictly ascending (validated by
    the caller).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n_batch = len(doc_ids_all)
    codes, doc_local, vocab_arr = _tokenize_arrow(content, stem=stem)
    dl_per_doc = np.bincount(doc_local, minlength=n_batch).astype(np.int64)
    if len(codes) == 0:
        return None

    # group order is dictionary (first-occurrence) order — groups only
    # need to be CONTIGUOUS with ascending docIDs (the JVM merge
    # re-sorts globally by term); batch rows arrive docID-ascending
    n_vocab = len(vocab_arr)
    if n_vocab * n_batch + n_batch < (1 << 32):
        key = (codes.astype(np.uint32) * np.uint32(n_batch)
               + doc_local.astype(np.uint32))
        skey, tfs = np.unique(key, return_counts=True)
        skey = skey.astype(np.int64)
    else:
        key = codes.astype(np.int64) * n_batch + doc_local
        skey, tfs = np.unique(key, return_counts=True)
    tcode = skey // n_batch
    dloc = skey % n_batch
    doc_ids = doc_ids_all[dloc].astype(np.int64)
    tfs = tfs.astype(np.int64)
    dls = dl_per_doc[dloc]
    buckets = doc_ids // doc_bucket
    n = len(skey)
    tf_csum = np.concatenate([[0], np.cumsum(tfs)])

    pos_sorted = None
    if positions:
        # occurrence position within the (empty-filtered) token
        # sequence of its doc, then occurrences ordered to match the
        # posting order of np.unique (code, doc) — per-posting
        # ascending positions
        n_occ = len(doc_local)
        run_start = np.ones(n_occ, dtype=bool)
        run_start[1:] = doc_local[1:] != doc_local[:-1]
        run_firsts = np.nonzero(run_start)[0]
        run_id = np.cumsum(run_start) - 1
        pos_in_doc = (np.arange(n_occ, dtype=np.int64)
                      - run_firsts[run_id])
        order = np.lexsort((pos_in_doc, doc_local, codes))
        pos_sorted = pos_in_doc[order]

    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (tcode[1:] != tcode[:-1]) | (buckets[1:] != buckets[:-1])
    group_starts = np.nonzero(new_group)[0]
    group_ends = np.append(group_starts[1:], n)
    group_id = np.cumsum(new_group) - 1
    pos_in_group = np.arange(n) - group_starts[group_id]

    block_start = (pos_in_group % BLOCK_SIZE) == 0
    deltas = doc_ids.copy()
    not_bs = ~block_start
    deltas[not_bs] = doc_ids[not_bs] - doc_ids[np.nonzero(not_bs)[0] - 1]

    docs_s, docs_o, docs_e, docs_pv = _varbyte_stream(deltas, group_starts)
    tfs_s, tfs_o, tfs_e, tfs_pv = _varbyte_stream(tfs, group_starts)
    dls_s, dls_o, dls_e, dls_pv = _varbyte_stream(dls, group_starts)

    bstart_idx = np.nonzero(block_start)[0]
    blk_max_tf = np.maximum.reduceat(tfs, bstart_idx)
    blk_min_dl = np.minimum.reduceat(dls, bstart_idx)
    blk_last = doc_ids[np.append(bstart_idx[1:], n) - 1]
    blk_group = group_id[bstart_idx]
    blk_bounds = np.searchsorted(blk_group, np.arange(len(group_starts) + 1))
    seg_max_tf = np.maximum.reduceat(tfs, group_starts)
    seg_min_dl = np.minimum.reduceat(dls, group_starts)

    ng = len(group_starts)
    nb = len(bstart_idx)

    def _binary(stream, g_off, g_end, itemsize=1):
        # zero-copy binary column: byte offsets into a shared stream
        offsets = np.empty(ng + 1, dtype=np.int32)
        offsets[:-1] = g_off * itemsize
        offsets[-1] = g_end[-1] * itemsize
        return pa.Array.from_buffers(
            pa.binary(), ng,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(stream.tobytes())])

    nblk_per_g = np.diff(blk_bounds)

    def _offsets_binary(pv, g_off, g_end, at=None):
        # per-group int32 block byte offsets (group-relative, with an
        # end sentinel), packed little-endian into one binary column.
        # ``at`` overrides the value indexes of block starts (used by
        # the position stream, whose values are occurrences).
        vals = np.empty(nb + ng, dtype=np.int32)
        blk_pos = np.arange(nb) + np.repeat(np.arange(ng), nblk_per_g)
        base = np.repeat(g_off, nblk_per_g)
        vals[blk_pos] = pv[bstart_idx if at is None else at] - base
        vals[blk_bounds[1:] + np.arange(ng)] = g_end - g_off
        ent_off = blk_bounds + np.arange(ng + 1)  # entries per group
        return _binary(vals, ent_off[:-1], ent_off[1:], itemsize=4)

    def _block_binary(values, dtype):
        return _binary(values.astype(dtype), blk_bounds[:-1],
                       blk_bounds[1:], itemsize=dtype().itemsize)

    sch = _arrow_schema()
    arrays = [
        pc.take(vocab_arr, pa.array(tcode[group_starts])).cast(pa.string()),
        pa.array(buckets[group_starts].astype(np.int64), type=pa.int64()),
        pa.array((group_ends - group_starts).astype(np.int64)),
        pa.array((tf_csum[group_ends] - tf_csum[group_starts])
                 .astype(np.int64)),
        pa.array(doc_ids[group_starts]),
        pa.array(doc_ids[group_ends - 1]),
        _binary(docs_s, docs_o, docs_e),
        _binary(tfs_s, tfs_o, tfs_e),
        _binary(dls_s, dls_o, dls_e),
        _offsets_binary(docs_pv, docs_o, docs_e),
        _offsets_binary(tfs_pv, tfs_o, tfs_e),
        _offsets_binary(dls_pv, dls_o, dls_e),
        _block_binary(blk_max_tf, np.int32),
        _block_binary(blk_min_dl, np.int32),
        _block_binary(blk_last, np.int64),
        pa.array(seg_max_tf.astype(np.int64)),
        pa.array(seg_min_dl.astype(np.int64)),
    ]
    if positions:
        # per-posting positions: first absolute, rest delta vs the
        # previous position of the SAME posting; per-block byte
        # offsets via occurrence indexes (block b's positions start at
        # occurrence tf_csum[first posting of b])
        occ_firsts = tf_csum[:-1]
        pos_deltas = pos_sorted.copy()
        mask = np.ones(pos_sorted.size, dtype=bool)
        mask[occ_firsts] = False
        idxs = np.nonzero(mask)[0]
        pos_deltas[idxs] = pos_sorted[idxs] - pos_sorted[idxs - 1]
        g_occ = tf_csum[group_starts]
        pos_s, pos_o, pos_e, pos_pv = _varbyte_stream(pos_deltas, g_occ)
        arrays.append(_binary(pos_s, pos_o, pos_e))
        arrays.append(_offsets_binary(pos_pv, pos_o, pos_e,
                                      at=tf_csum[bstart_idx]))
    else:
        empty = np.zeros(0, dtype=np.uint8)
        zo = np.zeros(ng, dtype=np.int64)
        arrays.append(_binary(empty, zo, zo))
        arrays.append(_binary(empty, zo, zo))
    return pa.RecordBatch.from_arrays(arrays, schema=sch)


def _tokenize_encode_factory(doc_bucket: int,
                             max_batch_bytes: int | None = None,
                             stem: bool = False,
                             positions: bool = False):
    """mapInArrow body with byte-budgeted encode granularity.

    Incoming Arrow batches are SMALL (~8k rows, capped in
    tokenize_chunks so the JVM never buffers half-GB batches); the
    encoder ACCUMULATES them to ~``max_batch_bytes`` of content before
    encoding, so partial segments stay coarse (fragmented partials
    inflate the merge shuffle and the parquet write — the dominant
    fixed cost at high parallelism).  Oversized incoming batches are
    sliced down to the same budget, so peak memory stays flat in both
    directions.  Validates the docID-ordering contract per batch.
    """
    if max_batch_bytes is None:
        max_batch_bytes = int(os.environ.get(
            "AUCTUS_TOKENIZE_BATCH_BYTES", str(16 << 20)))

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        pend_ids: list[np.ndarray] = []
        pend_content: list = []
        pend_bytes = 0

        def flush():
            nonlocal pend_ids, pend_content, pend_bytes
            if not pend_ids:
                return None
            ids = pend_ids[0] if len(pend_ids) == 1 \
                else np.concatenate(pend_ids)
            content = pend_content[0] if len(pend_content) == 1 \
                else pa.concat_arrays(pend_content)
            pend_ids, pend_content, pend_bytes = [], [], 0
            return _encode_batch(ids, content, doc_bucket, stem=stem,
                                 positions=positions)

        ready = []

        def _consume_run(doc_ids, content):
            """Append one ascending docID run, flushing when it does
            not extend the pending one; the byte budget also flushes;
            oversized runs are sliced.

            With one-file-per-task scans (tokenize_chunks sets
            openCostInBytes huge) a task OWNS a disjoint docID range,
            so any ascending merge within the task is safe — including
            across in-file gaps of sparse docID corpora."""
            nonlocal pend_bytes
            if pend_ids and doc_ids[0] <= int(pend_ids[-1][-1]):
                segs = flush()
                if segs is not None:
                    ready.append(segs)
            nbytes = int(pc.sum(pc.binary_length(content)).as_py() or 0)
            if nbytes >= max_batch_bytes:
                segs = flush()
                if segs is not None:
                    ready.append(segs)
                sizes = pc.binary_length(content).to_numpy()
                csum = np.cumsum(sizes)
                bounds = np.searchsorted(
                    csum, np.arange(max_batch_bytes, int(csum[-1]),
                                    max_batch_bytes))
                nrun = len(doc_ids)
                cuts = sorted({0, *(int(b) + 1 for b in bounds), nrun})
                cuts = [c for c in cuts if c <= nrun]
                for lo, hi in zip(cuts[:-1], cuts[1:]):
                    segs = _encode_batch(
                        doc_ids[lo:hi], content.slice(lo, hi - lo),
                        doc_bucket, stem=stem, positions=positions)
                    if segs is not None:
                        ready.append(segs)
                return
            pend_ids.append(doc_ids)
            pend_content.append(content)
            pend_bytes += nbytes
            if pend_bytes >= max_batch_bytes:
                segs = flush()
                if segs is not None:
                    ready.append(segs)

        def _drain():
            out, ready[:] = list(ready), []
            return out

        last_id = None
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            all_ids = rb.column(
                rb.schema.get_field_index("doc_id")).to_numpy()
            all_content = rb.column(rb.schema.get_field_index("content"))
            if isinstance(all_content, pa.ChunkedArray):
                all_content = all_content.combine_chunks()
            diffs = np.diff(all_ids)
            # with one-file-per-task scans (openCostInBytes set in
            # tokenize_chunks) a task's rows are ascending by the
            # docID-ordered-input contract; ANY non-ascending step
            # means disordered input — fail loudly at build time
            # rather than corrupting the run layout
            if np.any(diffs <= 0) or (
                    last_id is not None and all_ids[0] <= last_id):
                raise ValueError(
                    "corpus batch is not strictly docID-ascending; the "
                    "index layout requires docID-ordered input — pass "
                    "IndexBuilder(..., presort=True) to range-partition "
                    "and sort by doc_id first")
            last_id = int(all_ids[-1])
            _consume_run(all_ids, all_content)
            for segs_out in _drain():
                yield segs_out
        segs = flush()
        if segs is not None:
            yield segs
    return run


def read_corpus_chunk(corpus: DataFrame, lo: int, hi: int) -> DataFrame:
    return corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))


class IndexBuilder:
    """Chunked, resumable index build over a code_files corpus.

    ``presort=True`` adds one repartitionByRange+sort on doc_id before
    stage 1 — required when the input is not already docID-ordered
    (the encoder fails loudly on unsorted batches either way).
    """

    def __init__(self, spark: SparkSession, out_dir: str,
                 doc_bucket: int = DEFAULT_DOC_BUCKET,
                 chunk_docs: int = DEFAULT_CHUNK_DOCS,
                 term_buckets: int = DEFAULT_TERM_BUCKETS,
                 presort: bool = False, stem: bool = False,
                 positions: bool = False):
        self.spark = spark
        self.paths = IndexPaths(out_dir)
        self.doc_bucket = doc_bucket
        self.chunk_docs = chunk_docs
        self.term_buckets = term_buckets
        self.presort = presort
        self.stem = stem
        self.positions = positions

    # ---------------- stage 1: tokenize+encode, chunked + resumable ---

    def _check_or_stamp_format(self) -> None:
        v = read_format(self.paths.base)
        if v is None:
            if os.path.exists(self.paths.lineage):
                raise ValueError(
                    f"index at {self.paths.base} predates layout "
                    f"versioning — wipe() and rebuild (current format "
                    f"v{FORMAT_VERSION})")
            os.makedirs(self.paths.base, exist_ok=True)
            with open(os.path.join(self.paths.base, "_FORMAT"), "w") as f:
                f.write(str(FORMAT_VERSION))
            import json
            with open(os.path.join(self.paths.base, "_ANALYZER"),
                      "w") as f:
                json.dump({"stem": self.stem,
                           "positions": self.positions}, f)
        elif v != FORMAT_VERSION:
            raise ValueError(
                f"index at {self.paths.base} has layout v{v}, this build "
                f"is v{FORMAT_VERSION} — wipe() and rebuild")
        else:
            az = read_analyzer(self.paths.base)
            if (az.get("stem", False) != self.stem
                    or az.get("positions", False) != self.positions):
                raise ValueError(
                    f"index at {self.paths.base} was built with "
                    f"stem={az.get('stem', False)}/positions="
                    f"{az.get('positions', False)} but this builder has "
                    f"stem={self.stem}/positions={self.positions} — "
                    "resumed chunks would mix layouts; wipe() and "
                    "rebuild")

    def _lineage_rows(self) -> dict[int, dict]:
        """chunk → lineage metrics, read driver-side (tiny table)."""
        try:
            import pyarrow.dataset as pads
            ds = pads.dataset(self.paths.lineage, format="parquet",
                              partitioning="hive")
            t = ds.to_table()
        except Exception:
            return {}
        out = {}
        for i in range(t.num_rows):
            row = {c: t[c][i].as_py() for c in t.column_names}
            out[int(row["chunk"])] = row
        return out

    def _chunk_counts(self, corpus: DataFrame) -> dict[int, dict]:
        """One doc_id-column aggregate: per-chunk (count, min, max).
        Drives the chunk loop (empty ranges are never scanned) and the
        resume overlap check."""
        rows = (corpus
                .groupBy(F.expr(f"doc_id div {self.chunk_docs}")
                         .alias("chunk"))
                .agg(F.count("*").alias("n_docs"),
                     F.min("doc_id").alias("lo"),
                     F.max("doc_id").alias("hi"))
                .collect())
        return {int(r["chunk"]): {"n_docs": int(r["n_docs"]),
                                  "lo": int(r["lo"]), "hi": int(r["hi"])}
                for r in rows}

    def tokenize_chunks(self, corpus: DataFrame, resume: bool = True
                        ) -> list[int]:
        """Run stage 1 for every non-empty chunk not in lineage;
        returns chunk ids built this call.  Lineage row committed LAST
        per chunk.  Raises if ``resume`` finds new rows inside an
        already-committed chunk (appends must land in new docID
        ranges — chunk-granular exactly-once)."""
        self._check_or_stamp_format()
        counts = self._chunk_counts(corpus)
        if not counts:
            return []
        done = self._lineage_rows() if resume else {}
        built = []
        # Cap the JVM->Python Arrow batch size for FAT content rows:
        # the session default (200k rows, tuned for thin posting rows)
        # would make each stage-1 task buffer ~0.5 GB per batch in JVM
        # direct memory — 32 concurrent tasks stall the whole stage on
        # allocation/GC.  ~8k rows ≈ 20 MB/batch; restored after.
        conf = self.spark.conf
        keys = {
            # fat content rows: cap JVM->Python Arrow batches (~20 MB)
            "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
            # ONE FILE PER TASK: bin-packing several parquet files into
            # a task reorders them by SIZE, so a task's row stream can
            # jump docID ranges (f16 then f19) — an encoded partial
            # would span a hole that f17 (possibly in another task)
            # fills, breaking the disjoint-run layout.  A huge open
            # cost disables packing; splits of one big file remain
            # contiguous row ranges.  docID-ordered input (the
            # documented contract) then means every task OWNS a
            # disjoint docID range.
            "spark.sql.files.openCostInBytes": str(1 << 40),
        }
        prev = {k: conf.get(k, None) for k in keys}
        for k, v in keys.items():
            conf.set(k, v)
        try:
            built = self._tokenize_loop(corpus, counts, done, built)
        finally:
            for k, v in prev.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)
        return built

    def _tokenize_loop(self, corpus: DataFrame, counts: dict, done: dict,
                       built: list[int]) -> list[int]:
        if self.presort:
            n_part = max(self.spark.sparkContext.defaultParallelism, 2)
            corpus = (corpus.repartitionByRange(n_part, "doc_id")
                      .sortWithinPartitions("doc_id"))
        for chunk in sorted(counts):
            c = counts[chunk]
            if chunk in done:
                lin = done[chunk]
                if (c["n_docs"] != lin["n_docs"]
                        or c["lo"] != lin["doc_id_min"]
                        or c["hi"] != lin["doc_id_max"]):
                    raise ValueError(
                        f"chunk {chunk} is already committed with "
                        f"n_docs={lin['n_docs']} range=[{lin['doc_id_min']},"
                        f"{lin['doc_id_max']}] but the input now has "
                        f"n_docs={c['n_docs']} range=[{c['lo']},{c['hi']}] "
                        "— appends inside a committed chunk are not "
                        "applied; new documents must use docIDs beyond "
                        "the last committed chunk")
                continue
            lo = chunk * self.chunk_docs
            cslice = read_corpus_chunk(corpus, lo, lo + self.chunk_docs)
            inp = cslice.select("doc_id", "content")
            # lineage metrics ride along the write job itself
            # (Observation API) — no separate scan, no per-row Python:
            # count/min/max/sha256-rollup observed on the INPUT scan,
            # token totals on the partials output; the lineage row is
            # then committed LAST with a driver-side pyarrow write
            from pyspark.sql import Observation
            obs_in = Observation(f"lineage_in_{chunk}")
            inp = inp.observe(
                obs_in,
                F.count(F.lit(1)).alias("n_docs"),
                F.min("doc_id").alias("doc_id_min"),
                F.max("doc_id").alias("doc_id_max"),
                F.sum(_sha_rollup_expr()).cast("decimal(38,0)")
                .alias("sha_rollup"))
            partials = inp.mapInArrow(
                _tokenize_encode_factory(self.doc_bucket, stem=self.stem,
                                         positions=self.positions),
                schema=PARTIAL_SCHEMA)
            obs_out = Observation(f"lineage_out_{chunk}")
            observed = partials.observe(
                obs_out, F.sum("tf_sum").alias("total_tokens"))
            pdir = os.path.join(self.paths.partials, f"chunk={chunk}")
            observed.write.mode("overwrite").parquet(pdir)
            m = {**obs_in.get, **obs_out.get}
            self._write_lineage_row(chunk, m)
            built.append(chunk)
        return built

    def _write_lineage_row(self, chunk: int, m: dict) -> None:
        import decimal

        import pyarrow as pa
        import pyarrow.parquet as pq
        ldir = os.path.join(self.paths.lineage, f"chunk={chunk}")
        os.makedirs(ldir, exist_ok=True)
        tbl = pa.table({
            "n_docs": pa.array([int(m["n_docs"])], pa.int64()),
            "total_tokens": pa.array([int(m["total_tokens"] or 0)],
                                     pa.int64()),
            "doc_id_min": pa.array([int(m["doc_id_min"])], pa.int64()),
            "doc_id_max": pa.array([int(m["doc_id_max"])], pa.int64()),
            # NB: no 'chunk' column in the file — the hive-style
            # directory name carries it (duplicate would break reads)
            "sha_rollup": pa.array(
                [decimal.Decimal(int(m["sha_rollup"]))],
                pa.decimal128(38, 0)),
        })
        pq.write_table(tbl, os.path.join(ldir, "lineage.parquet"))

    def _read_partials(self) -> DataFrame:
        return self.spark.read.option("basePath", self.paths.partials)\
            .parquet(self.paths.partials + "/chunk=*")

    # ---------------- stage 2: global statistics ----------------------

    def finalize_stats(self) -> dict:
        """Global (N, avgdl) aggregated from the per-chunk lineage
        table — pure driver-side pyarrow, zero Spark jobs (the lineage
        rows were observed during the chunk writes)."""
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq
        ds = pads.dataset(self.paths.lineage, format="parquet",
                          partitioning="hive")
        t = ds.to_table(columns=["n_docs", "total_tokens"])
        n_docs = int(sum(t["n_docs"].to_pylist()))
        total = int(sum(t["total_tokens"].to_pylist()))
        avgdl = total / n_docs if n_docs else 0.0
        import pyarrow as pa
        os.makedirs(self.paths.stats, exist_ok=True)
        pq.write_table(pa.table({
            "n_docs": pa.array([n_docs], pa.int64()),
            "avgdl": pa.array([avgdl], pa.float64()),
            "total_tokens": pa.array([total], pa.int64())}),
            os.path.join(self.paths.stats, "stats.parquet"))
        return {"n_docs": n_docs, "avgdl": avgdl}

    # ---------------- stage 3: merge (pure JVM) -----------------------

    def encode_segments(self, avgdl: float | None = None) -> None:
        """Merge partial segments into the global term-partitioned
        index: exchange on term_bucket + Tungsten sort by (term,
        bucket, doc_id_min), written partitionBy(term_bucket) with
        term-sorted files for row-group pruning.  No Python.

        ``avgdl`` is accepted for API compatibility; block-max metadata
        is avgdl-free (bounds from (max_tf, min_dl))."""
        parts = self._read_partials().drop("chunk")
        parts = parts.withColumn(
            "term_bucket", F.pmod(F.hash("term"), F.lit(self.term_buckets)))
        # 4x the bucket count: hashing exactly `term_buckets` keys into
        # `term_buckets` partitions collides (balls-into-bins → ~3
        # buckets in one task, a 3x sort/write straggler — guide §2.5
        # "synthetic partitioning keys with too few distinct values");
        # with 4x partitions each bucket almost surely lands alone,
        # empty partitions cost nothing, and each bucket still writes
        # exactly one file into its partitionBy dir.
        n_part = max(self.spark.sparkContext.defaultParallelism,
                     4 * self.term_buckets)
        (parts.repartition(n_part, "term_bucket")
            .sortWithinPartitions("term", "bucket", "doc_id_min")
            .write.mode("overwrite").partitionBy("term_bucket")
            .parquet(self.paths.segments))

    def finalize_term_stats(self) -> None:
        """(term, df, cf) from segment metadata — partials of one term
        cover disjoint docID ranges, so df = sum(n_docs).  Reads the
        SEGMENTS table: the variant compaction needs (post-delete
        segments are the source of truth there)."""
        segs = self.spark.read.parquet(self.paths.segments)
        (segs.groupBy("term", "term_bucket")
            .agg(F.sum("n_docs").alias("df"), F.sum("tf_sum").alias("cf"))
            .write.mode("overwrite").partitionBy("term_bucket")
            .parquet(self.paths.term_stats))
        write_term_dict(self.spark, self.paths)

    def finalize_term_stats_from_partials(self) -> None:
        """Same (term, df, cf) table, aggregated from the PARTIALS
        instead of the merged segments.  ``encode_segments`` is
        row-preserving (exchange + sort + write, no row merge), so the
        two inputs hold identical (term, n_docs, tf_sum) rows and the
        aggregates are equal — but this variant does not depend on the
        segment write having finished, so the fresh-build path can run
        it CONCURRENTLY with ``encode_segments`` (guide §2.6: overlap
        independent jobs; both read the partials, and the stats job's
        tasks back-fill the merge stage's straggler tail)."""
        parts = self._read_partials().drop("chunk").withColumn(
            "term_bucket", F.pmod(F.hash("term"), F.lit(self.term_buckets)))
        (parts.groupBy("term", "term_bucket")
            .agg(F.sum("n_docs").alias("df"), F.sum("tf_sum").alias("cf"))
            .write.mode("overwrite").partitionBy("term_bucket")
            .parquet(self.paths.term_stats))
        write_term_dict(self.spark, self.paths)

    # ---------------- public API --------------------------------------

    def build(self, corpus: DataFrame, resume: bool = True) -> dict:
        """End-to-end build.  ``resume=True`` skips chunks with lineage;
        stats + segments are (re)finalized over all chunks present.
        The segment merge and the term-stats finalize are independent
        reads of the partials, so they run as two concurrent driver
        threads — the FIFO scheduler back-fills the merge's tail with
        stats tasks (guide §2.6).

        (Round-8 audit note: a python-worker prewarm job overlapped
        with the chunk-count prep was measured and REJECTED — worker
        fork+imports are <1 s here and the cold-session gap is JVM
        JIT/codegen, which a warm-up job merely moves, not hides.)"""
        self.tokenize_chunks(corpus, resume=resume)
        stats = self.finalize_stats()
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_seg = pool.submit(self.encode_segments)
            f_ts = pool.submit(self.finalize_term_stats_from_partials)
            f_seg.result()
            f_ts.result()
        return stats

    def verify_lineage(self, corpus: DataFrame) -> bool:
        """Per-row invariant (BASELINE.json): sha256(content) rollup of
        the corpus equals the rollup recorded in the index lineage."""
        corp = corpus.select(_sha_rollup_expr().alias("h"))
        expect = corp.agg(F.sum("h").alias("s"),
                          F.count("*").alias("n")).collect()[0]
        lin = self.spark.read.parquet(self.paths.lineage).agg(
            F.sum("sha_rollup").alias("s"),
            F.sum("n_docs").alias("n")).collect()[0]
        return (int(expect["s"]) == int(lin["s"])
                and int(expect["n"]) == int(lin["n"]))


def write_term_dict(spark: SparkSession, paths: IndexPaths,
                    n_files: int | None = None) -> None:
    """Sorted secondary term dictionary: (term, term_bucket, df)
    RANGE-partitioned and sorted by ``term``.

    The posting segments hash-partition on ``term_bucket``, which
    prunes exact-term lookups but cannot prune a prefix predicate
    (``query/bm25.py`` documents the trade).  This tiny side table —
    one row per distinct term, ~1e-5 of index bytes — restores range
    pruning: globally range-partitioned files with sorted row groups
    mean a ``term LIKE 'pre%'`` / ``startswith`` cut touches only the
    row groups whose [min,max] term range intersects the prefix (the
    sorted-term-dictionary analog of Lucene's FST term index), so
    prefix/wildcard/regexp candidate resolution is a range scan
    instead of a full dictionary or gram-index pass.

    Derived data (like term_stats): rewritten by every writer of
    term_stats inside the same crash-recovery domain, so it can never
    be newer or older than the dictionary it mirrors; the engine
    falls back to the term_stats scan when the dir is absent or has
    no _SUCCESS (mid-crash), so staleness is impossible and loss is
    only a de-optimization."""
    ts = spark.read.parquet(paths.term_stats)
    if n_files is None:
        n_files = max(8, min(64, spark.sparkContext.defaultParallelism))
    (ts.select("term", "term_bucket", "df")
        .repartitionByRange(n_files, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(paths.term_dict))


def export_metrics_tables(spark: SparkSession, index_dir: str,
                          prefix: str,
                          table_format: str | None = None) -> list[str]:
    """Publish the index's checkpoint metrics — per-chunk lineage
    (sha256 rollups, doc ranges, token counts) and global stats — as
    CATALOG tables, so build lineage is queryable alongside the corpus
    (the north rule's "checkpoints ... with lineage and metrics into
    Iceberg": with an Iceberg catalog configured —
    ``session.get_spark(iceberg_catalog=...)`` — pass
    ``prefix='cat.db.myindex'`` and ``table_format='iceberg'``; in
    catalogs without Iceberg jars the session's default table format
    applies).  Overwrites on re-export (a re-run republishes the
    current checkpoint state).  Returns the table names written."""
    paths = IndexPaths(index_dir)
    out = []
    for name, path in (("lineage", paths.lineage),
                       ("stats", paths.stats)):
        table = f"{prefix}_{name}"
        writer = (spark.read.parquet(path)
                  .write.mode("overwrite"))
        if table_format:
            writer = writer.format(table_format)
        writer.saveAsTable(table)
        out.append(table)
    return out


def wipe(out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)


# ---------------------------------------------------------------------
# deletes / updates (Lucene-style tombstones)
# ---------------------------------------------------------------------

# Driver-side tombstone mask cap: the numpy mask used inside the
# bucket scorers is loaded with a documented size limit; past it the
# exhaustive anti-join path (SearchEngine.search) remains correct and
# deletes should be compacted into a rebuild (like Lucene forceMerge).
MAX_TOMBSTONE_MASK = 1 << 22


def delete_docs(spark: SparkSession, index_dir: str,
                doc_ids: list[int]) -> None:
    """Mark documents deleted.  Like Lucene, postings stay in place and
    global stats (N, df, avgdl) keep counting deleted docs until a
    rebuild; scorers mask tombstoned candidates.  An UPDATE is
    delete(old_id) + incremental append of the new version under a new
    docID (the reference re-profiles a dataset the same way: delete +
    reindex, common.py:delete_dataset_from_index)."""
    import pandas as pd
    paths = IndexPaths(index_dir)
    tomb = os.path.join(paths.base, "tombstones")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": pd.Series(doc_ids, dtype="int64")}))
    df.write.mode("append").parquet(tomb)


def tombstones_df(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Tombstones as a DataFrame (None if there are none) — the
    scale-safe form: consumers anti-join against it instead of
    inlining doc_ids into the plan."""
    tomb = os.path.join(IndexPaths(index_dir).base, "tombstones")
    if not os.path.exists(tomb):
        return None
    return spark.read.parquet(tomb).select("doc_id").distinct()


def load_tombstones(spark: SparkSession, index_dir: str,
                    max_mask: int = MAX_TOMBSTONE_MASK):
    """Sorted numpy array of deleted docIDs ([] if none) — the scorer
    mask.  Capped at ``max_mask`` entries: beyond that the driver-side
    array stops being cheap to broadcast and deletes should be
    compacted into a rebuild (the cap fails loudly, never silently
    drops tombstones)."""
    tomb = os.path.join(IndexPaths(index_dir).base, "tombstones")
    if not os.path.exists(tomb):
        return np.array([], dtype=np.int64)
    rows = (spark.read.parquet(tomb).select("doc_id")
            .limit(max_mask + 1).collect())
    if len(rows) > max_mask:
        raise ValueError(
            f"more than {max_mask} tombstones: compact deletes into a "
            "rebuild (or use the anti-join path) instead of a driver "
            "mask")
    return np.unique(np.array([r["doc_id"] for r in rows],
                              dtype=np.int64))


# ---------------------------------------------------------------------
# compaction (Lucene forceMerge analog): physically remove tombstoned
# postings, recompute global stats, clear tombstones.  After
# compaction the index answers queries bit-identically to a fresh
# build over the live corpus (same postings, same N/df/avgdl).
# ---------------------------------------------------------------------

def _pack_partial_row(doc_ids, tfs, dls, pos_groups=None) -> dict:
    """Re-encode ONE partial's surviving postings into the v3 binary
    row fields (single group; the layout _encode_batch packs per
    group).  ``pos_groups``: list of per-posting position arrays."""
    from .codec import block_offsets, delta_encode, varbyte_encode
    n = len(doc_ids)
    deltas = delta_encode(doc_ids)
    blk_starts = np.arange(0, n, BLOCK_SIZE)
    row = {
        "n_docs": int(n),
        "tf_sum": int(tfs.sum()),
        "doc_id_min": int(doc_ids[0]),
        "doc_id_max": int(doc_ids[-1]),
        "docs_blob": varbyte_encode(deltas),
        "tfs_blob": varbyte_encode(tfs),
        "dls_blob": varbyte_encode(dls),
        "docs_off": block_offsets(deltas).astype(np.int32).tobytes(),
        "tfs_off": block_offsets(tfs).astype(np.int32).tobytes(),
        "dls_off": block_offsets(dls).astype(np.int32).tobytes(),
        "block_max_tf": np.maximum.reduceat(tfs, blk_starts)
        .astype(np.int32).tobytes(),
        "block_min_dl": np.minimum.reduceat(dls, blk_starts)
        .astype(np.int32).tobytes(),
        "block_last_doc": doc_ids[np.minimum(
            blk_starts + BLOCK_SIZE - 1, n - 1)]
        .astype(np.int64).tobytes(),
        "max_tf": int(tfs.max()),
        "min_dl": int(dls.min()),
    }
    if pos_groups is None:
        row["pos_blob"] = b""
        row["pos_off"] = b""
    else:
        from .codec import _leb_lengths
        counts = np.array([len(g) for g in pos_groups], dtype=np.int64)
        flat = (np.concatenate(pos_groups) if counts.sum()
                else np.array([], dtype=np.int64))
        pos_deltas = flat.copy()
        firsts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        mask = np.ones(flat.size, dtype=bool)
        mask[firsts] = False
        idxs = np.nonzero(mask)[0]
        pos_deltas[idxs] = flat[idxs] - flat[idxs - 1]
        row["pos_blob"] = varbyte_encode(pos_deltas)
        # per-BLOCK byte offsets at occurrence starts (+ end sentinel)
        lens = _leb_lengths(pos_deltas)
        byte_csum = np.concatenate([[0], np.cumsum(lens)])
        occ_csum = np.concatenate([[0], np.cumsum(counts)])
        entries = byte_csum[occ_csum[blk_starts]]
        row["pos_off"] = np.append(entries, byte_csum[-1]) \
            .astype(np.int32).tobytes()
    return row


class SimulatedCompactionCrash(RuntimeError):
    """Raised by compact(_crash_after=...) — test-only fault
    injection for the crash-recovery windows."""


def compact(spark: SparkSession, index_dir: str,
            term_buckets: int = DEFAULT_TERM_BUCKETS,
            _crash_after: str | None = None) -> dict:
    """Remove tombstoned documents physically.

    Pass 1 collects (deleted doc, dl) pairs from the postings (to fix
    N/avgdl); pass 2 rewrites every partial with tombstoned postings
    masked (positions preserved) and swaps the segments dir crash-
    safely: a ``_COMPACTING`` marker makes every open fail loudly
    until segments, stats and term_stats are all committed, and the
    old segments are renamed aside (recoverable) rather than deleted
    before the new ones land.  Tombstones cleared last.
    The lineage table still describes the ORIGINAL ingest (sha rollup
    of what was indexed) — verify_lineage checks ingest integrity,
    not liveness.  Liveness lives in ``removed_docs/``: every docID a
    compaction physically removes is appended there, and later
    compactions consult it so a re-delete of an already-removed docID
    (idempotent-delete retry) is a no-op instead of decrementing
    N/avgdl a second time."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .codec import varbyte_decode
    paths = IndexPaths(index_dir)
    check_not_compacting(index_dir)

    def _crash(step: str) -> None:
        if _crash_after == step:
            raise SimulatedCompactionCrash(step)

    # A crash BEFORE the marker leaves only snapshot/tmp leftovers
    # (never mutated state) — clean them so a retry starts fresh.
    for stale in (paths.segments + "_old", paths.stats + "_old",
                  os.path.join(paths.base, "tombstones_old"),
                  paths.removed + "_old", paths.segments + "_compacting"):
        shutil.rmtree(stale, ignore_errors=True)
    tomb = load_tombstones(spark, index_dir)
    if tomb.size == 0:
        return {"removed_docs": 0}
    positions = read_analyzer(index_dir).get("positions", False)
    segs = spark.read.parquet(paths.segments)

    lo, hi = int(tomb.min()), int(tomb.max())

    def dropped_dl(batches):
      import pandas as pd
      for pdf in batches:
        out_d, out_l = [], []
        for r in pdf.itertuples(index=False):
            from .codec import delta_decode
            ids = delta_decode(varbyte_decode(r.docs_blob))
            pos = np.searchsorted(tomb, ids)
            pos_c = np.minimum(pos, tomb.size - 1)
            hit = tomb[pos_c] == ids
            if hit.any():
                dls = varbyte_decode(r.dls_blob)
                out_d.append(ids[hit])
                out_l.append(dls[hit])
        if not out_d:
            yield pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                "dl": pd.Series([], dtype=np.int64)})
            continue
        yield pd.DataFrame({"doc_id": np.concatenate(out_d),
                            "dl": np.concatenate(out_l)})

    hit_segs = segs.filter((F.col("doc_id_max") >= lo)
                           & (F.col("doc_id_min") <= hi))
    # Collect the (doc, dl) pairs actually present in postings —
    # bounded by the tombstone cap, so driver-safe.
    dropped_rows = (hit_segs.select("docs_blob", "dls_blob")
                    .mapInPandas(dropped_dl, schema="doc_id long, dl long")
                    .groupBy("doc_id").agg(F.first("dl").alias("dl"))
                    .collect())
    found = np.array(sorted(int(r["doc_id"]) for r in dropped_rows),
                     dtype=np.int64)
    tok_removed = int(sum(int(r["dl"]) for r in dropped_rows))
    # Zero-token docs were counted in N at build but never appear in
    # postings.  Lineage decides existence: a tombstone inside a DENSE
    # chunk range (n_docs == max-min+1) certainly existed.  Residual
    # (documented): an empty doc in a SPARSE docID range cannot be
    # distinguished from a never-existing docID without per-doc state,
    # and is not subtracted — sequential-ID ingest (the supported
    # pipeline, ids.sequential_index) always produces dense chunks.
    import pyarrow.dataset as pads
    lin_t = pads.dataset(paths.lineage, format="parquet",
                         partitioning="hive").to_table(
        columns=["n_docs", "doc_id_min", "doc_id_max"])
    in_dense = np.zeros(tomb.size, dtype=bool)
    for i in range(lin_t.num_rows):
        cn = lin_t["n_docs"][i].as_py()
        cmin = lin_t["doc_id_min"][i].as_py()
        cmax = lin_t["doc_id_max"][i].as_py()
        if cn == cmax - cmin + 1:
            in_dense |= (tomb >= cmin) & (tomb <= cmax)
    # Liveness guard: lineage describes the ORIGINAL ingest, so a
    # docID already removed by a PREVIOUS compaction still sits in a
    # dense range.  Without this mask a re-delete (idempotent-delete
    # retry) would decrement N/avgdl a second time.  The removed_docs
    # record (appended below, before tombstones are cleared) is the
    # per-doc liveness complement of lineage.
    prior_removed = np.array([], dtype=np.int64)
    if os.path.isdir(paths.removed):
        prior_removed = pads.dataset(
            paths.removed, format="parquet").to_table(
            columns=["doc_id"])["doc_id"].to_numpy()
    existed_empty = (in_dense & ~np.isin(tomb, found)
                     & ~np.isin(tomb, prior_removed))
    n_removed = int(found.size) + int(existed_empty.sum())

    def rewrite(batches):
      import pandas as pd

      from .codec import delta_decode
      for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            if r.doc_id_max < lo or r.doc_id_min > hi:
                rows.append(r._asdict())
                continue
            ids = delta_decode(varbyte_decode(r.docs_blob))
            pos = np.searchsorted(tomb, ids)
            pos_c = np.minimum(pos, tomb.size - 1)
            keep = tomb[pos_c] != ids
            if keep.all():
                rows.append(r._asdict())
                continue
            if not keep.any():
                continue
            tfs = varbyte_decode(r.tfs_blob)
            dls = varbyte_decode(r.dls_blob)
            pos_groups = None
            if positions:
                pd_ = varbyte_decode(r.pos_blob)
                firsts = np.concatenate([[0], np.cumsum(tfs)])
                c = np.cumsum(pd_)
                prior = np.where(firsts[:-1] > 0, c[firsts[:-1] - 1], 0)
                absd = c - np.repeat(prior, tfs)
                pos_groups = [absd[firsts[i]:firsts[i + 1]]
                              for i in np.nonzero(keep)[0]]
            packed = _pack_partial_row(ids[keep], tfs[keep], dls[keep],
                                       pos_groups)
            packed["term"] = r.term
            packed["bucket"] = int(r.bucket)
            packed["term_bucket"] = int(r.term_bucket)
            rows.append(packed)
        cols = ["term", "bucket", "n_docs", "tf_sum", "doc_id_min",
                "doc_id_max", "docs_blob", "tfs_blob", "dls_blob",
                "docs_off", "tfs_off", "dls_off", "block_max_tf",
                "block_min_dl", "block_last_doc", "max_tf", "min_dl",
                "pos_blob", "pos_off", "term_bucket"]
        if not rows:
            yield pd.DataFrame({c: [] for c in cols})
            continue
        yield pd.DataFrame(rows)[cols]

    tmp = paths.segments + "_compacting"
    (segs.mapInPandas(rewrite, schema=PARTIAL_SCHEMA
                      + ", term_bucket int")
        .repartition(max(spark.sparkContext.defaultParallelism,
                         min(term_buckets, 64)), "term_bucket")
        .sortWithinPartitions("term", "bucket", "doc_id_min")
        .write.mode("overwrite").partitionBy("term_bucket").parquet(tmp))
    # Read the pre-compaction stats BEFORE any swap step.
    old = spark.read.parquet(paths.stats).collect()[0]
    # Crash-safe swap.  Everything the remaining steps mutate is
    # snapshotted ALONGSIDE the old segments — stats are decremented,
    # tombstones cleared and removed_docs appended below, so restoring
    # segments alone would resurrect postings against already-
    # decremented stats (double-decrement on the re-run) or drop the
    # tombstones that still mask them.  rollback_compaction() restores
    # segments/stats/tombstones/removed_docs as ONE unit.  Order:
    # snapshots first (non-destructive), then the marker (every open
    # fails loudly from here), then the renames.
    old_dir = paths.segments + "_old"
    stats_old = paths.stats + "_old"
    tomb_dir = os.path.join(paths.base, "tombstones")
    tomb_old = os.path.join(paths.base, "tombstones_old")
    removed_old = paths.removed + "_old"
    shutil.copytree(paths.stats, stats_old)
    shutil.copytree(tomb_dir, tomb_old)
    had_removed = os.path.isdir(paths.removed)
    if had_removed:
        shutil.copytree(paths.removed, removed_old)
    marker = os.path.join(paths.base, "_COMPACTING")
    with open(marker, "w") as f:
        json.dump({"note": "compaction in progress; see "
                           "check_not_compacting / rollback_compaction",
                   "had_removed_docs": had_removed}, f)
    os.rename(paths.segments, old_dir)
    os.rename(tmp, paths.segments)
    _crash("swap")

    # Record the docIDs removed THIS compaction before tombstones are
    # cleared (liveness record for idempotent re-deletes).  Crash
    # recovery does NOT rely on this file: any crash between the
    # marker and the final cleanup is recovered by
    # rollback_compaction(), which restores segments/stats/tombstones
    # /removed_docs together from the *_old snapshots and re-runs
    # compact() from scratch.
    newly = np.union1d(found, tomb[existed_empty])
    if newly.size:
        os.makedirs(paths.removed, exist_ok=True)
        seq = len(os.listdir(paths.removed))
        pq.write_table(pa.table({"doc_id": pa.array(newly, pa.int64())}),
                       os.path.join(paths.removed, f"r{seq:05d}.parquet"))
    _crash("removed_docs")

    # refresh stats: N/avgdl over LIVE docs; term_stats from segments
    n_docs = int(old["n_docs"]) - n_removed
    total = int(old["total_tokens"]) - tok_removed
    os.makedirs(paths.stats, exist_ok=True)
    pq.write_table(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "avgdl": pa.array([total / n_docs if n_docs else 0.0],
                          pa.float64()),
        "total_tokens": pa.array([total], pa.int64())}),
        os.path.join(paths.stats, "stats.parquet"))
    _crash("stats")
    segs2 = spark.read.parquet(paths.segments)
    (segs2.groupBy("term", "term_bucket")
        .agg(F.sum("n_docs").alias("df"), F.sum("tf_sum").alias("cf"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(paths.term_stats))
    _crash("term_stats")
    write_term_dict(spark, paths)
    _crash("term_dict")
    shutil.rmtree(tomb_dir, ignore_errors=True)
    _crash("tombstones_cleared")
    # Commit point.  Everything the compaction mutates is in its
    # final state, so the marker comes off FIRST: a crash anywhere
    # in the snapshot cleanup below leaves a fully-committed index
    # plus stale ``*_old`` dirs that the pre-marker sweep at the top
    # of the next compact() removes.  (Deleting snapshots while the
    # marker is still up would let rollback_compaction() pair the
    # surviving snapshot pieces with committed state — e.g. restore
    # pre-compaction stats against already-compacted segments.)
    os.remove(marker)
    _crash("marker_removed")
    shutil.rmtree(old_dir)
    _crash("segments_old_gone")
    shutil.rmtree(stats_old)
    _crash("stats_old_gone")
    shutil.rmtree(tomb_old)
    if had_removed:
        shutil.rmtree(removed_old)
    return {"removed_docs": n_removed, "removed_tokens": tok_removed}


def rollback_compaction(spark: SparkSession, index_dir: str) -> None:
    """Restore the pre-compaction state after a crash mid-compact().

    Rolls back segments, stats, tombstones and removed_docs as ONE
    unit from the ``*_old`` snapshots the compaction took before its
    first destructive step, so no recovery path can pair restored
    postings with already-decremented stats (double-decrement) or
    resurrect deleted docs without the tombstones that mask them.
    term_stats is derived data — recomputed from the restored
    segments (the crashed run may have overwritten it) before the
    marker is cleared, so a crash inside rollback itself stays
    loudly recoverable.  After rollback, re-running compact() from
    the still-present tombstones completes the original operation.
    """
    paths = IndexPaths(index_dir)
    marker = os.path.join(paths.base, "_COMPACTING")
    if not os.path.exists(marker):
        raise ValueError(
            f"no _COMPACTING marker in {index_dir}; nothing to "
            "roll back")
    try:
        with open(marker) as f:
            meta = json.load(f)
    except (json.JSONDecodeError, OSError):
        meta = {}
    old_dir = paths.segments + "_old"
    stats_old = paths.stats + "_old"
    tomb_dir = os.path.join(paths.base, "tombstones")
    tomb_old = os.path.join(paths.base, "tombstones_old")
    removed_old = paths.removed + "_old"
    had_removed = meta.get("had_removed_docs",
                           os.path.isdir(removed_old))
    for snap, live in ((old_dir, paths.segments),
                       (stats_old, paths.stats),
                       (tomb_old, tomb_dir)):
        if os.path.isdir(snap):
            shutil.rmtree(live, ignore_errors=True)
            os.rename(snap, live)
    if had_removed:
        if os.path.isdir(removed_old):
            shutil.rmtree(paths.removed, ignore_errors=True)
            os.rename(removed_old, paths.removed)
    else:
        # the crashed run created removed_docs; pre-compaction had none
        shutil.rmtree(paths.removed, ignore_errors=True)
    segs = spark.read.parquet(paths.segments)
    (segs.groupBy("term", "term_bucket")
        .agg(F.sum("n_docs").alias("df"), F.sum("tf_sum").alias("cf"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(paths.term_stats))
    write_term_dict(spark, paths)
    os.remove(marker)
