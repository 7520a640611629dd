"""Inverted-index build: tokenize → compressed partial segments →
JVM merge into a term-partitioned index.  Resumable per docID-range
chunk.

What Elasticsearch did for the reference (index documents into Lucene
shards, ``lib_core/datamart_core/common.py:451-467``) becomes two Spark
stages, shaped by one rule: ship COMPRESSED postings across every
boundary (the MapReduce local-indexing + merge construction):

1. **tokenize+encode** — one ``mapInPandas`` pass over the corpus.
   Per Arrow batch it tokenizes, counts term frequencies, and emits
   already-compressed PARTIAL SEGMENTS: one row per (term, doc-range
   bucket) with delta+varbyte blobs, per-block byte offsets and
   block-max metadata.  The Python→JVM return is ~100× smaller than
   raw (term, doc, tf) rows — this is what makes the stage scale with
   cores instead of drowning in Arrow serialization.  A marker row per
   batch (term IS NULL) carries doc-count / token-count / sha256
   rollup aggregates for stats + lineage.  Written per *chunk* (fixed
   docID range) → resumable: chunks with lineage rows are skipped.
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

Global stats discipline: N and avgdl come from the marker rows of ALL
chunks (finalize_stats), df/cf per term from segment metadata
(finalize_term_stats) — global snapshots, required for rank identity.

Iceberg note: the sandbox has no Iceberg jars; tables are parquet
directories with the same layout.  Lineage rows live in an ordinary
table either way and are committed after chunk data (write data →
commit lineage last).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from .codec import BLOCK_SIZE

DEFAULT_DOC_BUCKET = 1 << 16      # docs per scoring bucket
DEFAULT_CHUNK_DOCS = 1 << 20      # docs per resumable build chunk
DEFAULT_TERM_BUCKETS = 64

PARTIAL_SCHEMA = (
    "term string, bucket long, n_docs long, tf_sum long, doc_id_min long, "
    "doc_id_max long, docs_blob binary, tfs_blob binary, dls_blob binary, "
    "docs_off array<long>, tfs_off array<long>, dls_off array<long>, "
    "block_max_tf array<long>, block_min_dl array<long>, "
    "block_last_doc array<long>, max_tf long, min_dl long, "
    "sha_rollup decimal(38,0)"
)


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
            ("docs_off", pa.list_(pa.int64())),
            ("tfs_off", pa.list_(pa.int64())),
            ("dls_off", pa.list_(pa.int64())),
            ("block_max_tf", pa.list_(pa.int64())),
            ("block_min_dl", pa.list_(pa.int64())),
            ("block_last_doc", pa.list_(pa.int64())),
            ("max_tf", pa.int64()),
            ("min_dl", pa.int64()),
            ("sha_rollup", pa.decimal128(38, 0)),
        ])
    return ARROW_PARTIAL_SCHEMA


def _marker_batch(n_batch, dl_sum, dmin, dmax, sha_sum):
    """One-row marker RecordBatch (term IS NULL) carrying the batch's
    doc/token counts + sha rollup for stats and lineage."""
    import decimal

    import pyarrow as pa
    sch = _arrow_schema()
    vals = {
        "term": [None], "bucket": [0], "n_docs": [int(n_batch)],
        "tf_sum": [int(dl_sum)], "doc_id_min": [int(dmin)],
        "doc_id_max": [int(dmax)],
        "docs_blob": [None], "tfs_blob": [None], "dls_blob": [None],
        "docs_off": [None], "tfs_off": [None], "dls_off": [None],
        "block_max_tf": [None], "block_min_dl": [None],
        "block_last_doc": [None], "max_tf": [0], "min_dl": [0],
        # decimal.Decimal: Arrow wraps plain big ints through int64
        "sha_rollup": [decimal.Decimal(int(sha_sum))],
    }
    return pa.RecordBatch.from_arrays(
        [pa.array(vals[f.name], type=f.type) for f in sch], schema=sch)


def _encode_batch(doc_ids_all: np.ndarray, content, doc_bucket: int):
    """One corpus slice → partial-segment RecordBatch + marker batch.

    Everything stays in Arrow/numpy: tokenization is Arrow C++
    (ascii_lower → RE2 split → dictionary_encode — no per-token Python
    objects), tf counting is one np.unique over packed int keys, and
    the OUTPUT arrays are assembled with pa.ListArray.from_arrays /
    binary-from-buffers — no per-group Python element conversion
    (pandas→Arrow of millions of object rows was the build's largest
    non-scaling cost).
    ``content`` is a pa.StringArray aligned with ``doc_ids_all``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n_batch = len(doc_ids_all)

    # sha256 over raw utf8 straight from the Arrow buffers (no copies)
    off_buf = content.buffers()[1]
    width = np.int64 if pa.types.is_large_string(content.type) else np.int32
    offs_all = np.frombuffer(off_buf, dtype=width,
                             count=n_batch + 1 + content.offset)
    offs_c = offs_all[content.offset:]
    data_mv = memoryview(content.buffers()[2])
    sha_sum = sum(
        int(hashlib.sha256(data_mv[offs_c[i]:offs_c[i + 1]])
            .hexdigest()[:15], 16) for i in range(n_batch))

    toks = pc.split_pattern_regex(pc.ascii_lower(content), "[^a-z0-9_]+")
    flat = pc.list_flatten(toks)
    lens = np.diff(toks.offsets.to_numpy().astype(np.int64))
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab_arr = enc.dictionary

    doc_local = np.repeat(np.arange(n_batch, dtype=np.int64), lens)
    # drop empty tokens (split artifacts at string edges)
    vocab_np = vocab_arr.to_numpy(zero_copy_only=False)
    empty_code = np.nonzero(vocab_np == "")[0]
    if empty_code.size:
        keep = codes != empty_code[0]
        codes, doc_local = codes[keep], doc_local[keep]
    dl_per_doc = np.bincount(doc_local, minlength=n_batch).astype(np.int64)

    marker = _marker_batch(n_batch, dl_per_doc.sum(), doc_ids_all.min(),
                           doc_ids_all.max(), sha_sum)
    if codes.size == 0:
        return None, marker

    # group order is dictionary (first-occurrence) order — groups only
    # need to be CONTIGUOUS with ascending docIDs (the JVM merge
    # re-sorts globally by term); batch rows arrive docID-ascending
    key = codes * n_batch + doc_local
    skey, tfs = np.unique(key, return_counts=True)
    tcode = skey // n_batch
    dloc = skey % n_batch
    doc_ids = doc_ids_all[dloc].astype(np.int64)
    tfs = tfs.astype(np.int64)
    dls = dl_per_doc[dloc]
    buckets = doc_ids // doc_bucket
    n = len(skey)

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

    def _stream(vals):
        v = vals.astype(np.uint64)
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
            byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
                    ).astype(np.uint8)
            cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
            out[starts[mask] + j] = byte | cont
        g_off = starts[group_starts]
        g_end = np.append(g_off[1:], int(ends[-1]))
        return out, g_off, g_end, starts

    docs_s, docs_o, docs_e, docs_pv = _stream(deltas)
    tfs_s, tfs_o, tfs_e, tfs_pv = _stream(tfs)
    dls_s, dls_o, dls_e, dls_pv = _stream(dls)

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
    import pyarrow as pa  # noqa: F811

    def _binary(stream, g_off, g_end):
        # zero-copy binary column: offsets into the shared byte stream
        offsets = np.empty(ng + 1, dtype=np.int32)
        offsets[:-1] = g_off
        offsets[-1] = g_end[-1]
        return pa.Array.from_buffers(
            pa.binary(), ng,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(stream.tobytes())])

    def _offsets_list(pv, g_off, g_end):
        # per-group list of block byte offsets (group-relative, with an
        # end sentinel) — built as one flat values array + list offsets
        nblk_per_g = np.diff(blk_bounds)
        vals = np.empty(nb + ng, dtype=np.int64)
        # positions of block entries and sentinels in the flat array
        blk_pos = np.arange(nb) + np.repeat(np.arange(ng), nblk_per_g)
        sent_pos = blk_bounds[1:] + np.arange(1, ng + 1) - 1 + 1
        base = np.repeat(g_off, nblk_per_g)
        vals[blk_pos] = pv[bstart_idx] - base
        # sentinel (total byte length) closes each group's offset list
        vals[blk_bounds[1:] + np.arange(ng)] = g_end - g_off
        list_off = (blk_bounds + np.arange(ng + 1)).astype(np.int32)
        return pa.ListArray.from_arrays(pa.array(list_off),
                                        pa.array(vals, type=pa.int64()))

    def _block_list(values):
        list_off = blk_bounds.astype(np.int32)
        return pa.ListArray.from_arrays(pa.array(list_off),
                                        pa.array(values, type=pa.int64()))

    sch = _arrow_schema()
    tf_csum = np.concatenate([[0], np.cumsum(tfs)])
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
        _offsets_list(docs_pv, docs_o, docs_e),
        _offsets_list(tfs_pv, tfs_o, tfs_e),
        _offsets_list(dls_pv, dls_o, dls_e),
        _block_list(blk_max_tf),
        _block_list(blk_min_dl),
        _block_list(blk_last),
        pa.array(seg_max_tf.astype(np.int64)),
        pa.array(seg_min_dl.astype(np.int64)),
        pa.nulls(ng, type=pa.decimal128(38, 0)),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=sch), marker


def _tokenize_encode_factory(doc_bucket: int,
                             max_batch_bytes: int | None = None):
    """mapInArrow body with byte-budgeted sub-batching: each incoming
    RecordBatch is sliced to ~48 MB of content before tokenizing so
    peak memory stays flat regardless of Arrow batch size x
    concurrency."""
    if max_batch_bytes is None:
        max_batch_bytes = int(os.environ.get(
            "AUCTUS_TOKENIZE_BATCH_BYTES", str(16 << 20)))

    def run(batches):
        import pyarrow as pa
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            content = rb.column(rb.schema.get_field_index("content"))
            if isinstance(content, pa.ChunkedArray):
                content = content.combine_chunks()
            import pyarrow.compute as pc
            sizes = pc.binary_length(content).to_numpy()
            cuts, acc = [0], 0
            for i, sz in enumerate(sizes):
                acc += int(sz)
                if acc >= max_batch_bytes:
                    cuts.append(i + 1)
                    acc = 0
            if cuts[-1] != n:
                cuts.append(n)
            doc_ids = rb.column(
                rb.schema.get_field_index("doc_id")).to_numpy()
            for lo, hi in zip(cuts[:-1], cuts[1:]):
                segs, marker = _encode_batch(
                    doc_ids[lo:hi], content.slice(lo, hi - lo), doc_bucket)
                if segs is not None:
                    yield segs
                yield marker
    return run


def read_corpus_chunk(corpus: DataFrame, lo: int, hi: int) -> DataFrame:
    return corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))


class IndexBuilder:
    """Chunked, resumable index build over a code_files corpus."""

    def __init__(self, spark: SparkSession, out_dir: str,
                 doc_bucket: int = DEFAULT_DOC_BUCKET,
                 chunk_docs: int = DEFAULT_CHUNK_DOCS,
                 term_buckets: int = DEFAULT_TERM_BUCKETS):
        self.spark = spark
        self.paths = IndexPaths(out_dir)
        self.doc_bucket = doc_bucket
        self.chunk_docs = chunk_docs
        self.term_buckets = term_buckets

    # ---------------- stage 1: tokenize+encode, chunked + resumable ---

    def _done_chunks(self) -> set[int]:
        try:
            rows = self.spark.read.parquet(self.paths.lineage).select(
                "chunk").distinct().collect()
            return {r["chunk"] for r in rows}
        except Exception:
            return set()

    def tokenize_chunks(self, corpus: DataFrame, resume: bool = True
                        ) -> list[int]:
        """Run stage 1 for every chunk not in lineage; returns chunk
        ids built this call.  Lineage row committed LAST per chunk."""
        bounds = corpus.agg(F.min("doc_id").alias("lo"),
                            F.max("doc_id").alias("hi")).collect()[0]
        if bounds["lo"] is None:
            return []
        done = self._done_chunks() if resume else set()
        built = []
        first = int(bounds["lo"]) // self.chunk_docs
        last = int(bounds["hi"]) // self.chunk_docs
        for chunk in range(first, last + 1):
            if chunk in done:
                continue
            lo = chunk * self.chunk_docs
            cslice = read_corpus_chunk(corpus, lo, lo + self.chunk_docs)
            partials = cslice.select("doc_id", "content").mapInArrow(
                _tokenize_encode_factory(self.doc_bucket),
                schema=PARTIAL_SCHEMA)
            pdir = os.path.join(self.paths.partials, f"chunk={chunk}")
            # lineage metrics ride along the write job itself
            # (Observation API) — no separate scan; the lineage row is
            # then committed LAST with a driver-side pyarrow write
            from pyspark.sql import Observation
            obs = Observation(f"lineage_chunk_{chunk}")
            mk = F.col("term").isNull()
            observed = partials.observe(
                obs,
                F.sum(F.when(mk, F.col("n_docs"))).alias("n_docs"),
                F.sum(F.when(mk, F.col("tf_sum"))).alias("total_tokens"),
                F.min(F.when(mk, F.col("doc_id_min"))).alias("doc_id_min"),
                F.max(F.when(mk, F.col("doc_id_max"))).alias("doc_id_max"),
                F.sum(F.when(mk, F.col("sha_rollup")))
                .cast("decimal(38,0)").alias("sha_rollup"))
            observed.write.mode("overwrite").parquet(pdir)
            m = obs.get
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
            "total_tokens": pa.array([int(m["total_tokens"])], pa.int64()),
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
        parts = self._read_partials().filter(F.col("term").isNotNull()) \
            .drop("sha_rollup", "chunk")
        parts = parts.withColumn(
            "term_bucket", F.pmod(F.hash("term"), F.lit(self.term_buckets)))
        n_part = max(self.spark.sparkContext.defaultParallelism,
                     min(self.term_buckets, 64))
        (parts.repartition(n_part, "term_bucket")
            .sortWithinPartitions("term", "bucket", "doc_id_min")
            .write.mode("overwrite").partitionBy("term_bucket")
            .parquet(self.paths.segments))

    def finalize_term_stats(self) -> None:
        """(term, df, cf) from segment metadata — partials of one term
        cover disjoint docID ranges, so df = sum(n_docs)."""
        segs = self.spark.read.parquet(self.paths.segments)
        (segs.groupBy("term", "term_bucket")
            .agg(F.sum("n_docs").alias("df"), F.sum("tf_sum").alias("cf"))
            .write.mode("overwrite").partitionBy("term_bucket")
            .parquet(self.paths.term_stats))

    # ---------------- public API --------------------------------------

    def build(self, corpus: DataFrame, resume: bool = True) -> dict:
        """End-to-end build.  ``resume=True`` skips chunks with lineage;
        stats + segments are (re)finalized over all chunks present."""
        self.tokenize_chunks(corpus, resume=resume)
        stats = self.finalize_stats()
        self.encode_segments()
        self.finalize_term_stats()
        return stats

    def verify_lineage(self, corpus: DataFrame) -> bool:
        """Per-row invariant (BASELINE.json): sha256(content) rollup of
        the corpus equals the rollup recorded in the index lineage."""
        corp = corpus.select(
            F.conv(F.substring(F.sha2("content", 256), 1, 15), 16, 10)
            .cast("decimal(38,0)").alias("h"))
        expect = corp.agg(F.sum("h").alias("s"),
                          F.count("*").alias("n")).collect()[0]
        lin = self.spark.read.parquet(self.paths.lineage).agg(
            F.sum("sha_rollup").alias("s"),
            F.sum("n_docs").alias("n")).collect()[0]
        return (int(expect["s"]) == int(lin["s"])
                and int(expect["n"]) == int(lin["n"]))


def wipe(out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)


# ---------------------------------------------------------------------
# deletes / updates (Lucene-style tombstones)
# ---------------------------------------------------------------------

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


def load_tombstones(spark: SparkSession, index_dir: str):
    """Sorted numpy array of deleted docIDs ([] if none)."""
    import numpy as np
    tomb = os.path.join(IndexPaths(index_dir).base, "tombstones")
    if not os.path.exists(tomb):
        return np.array([], dtype=np.int64)
    rows = spark.read.parquet(tomb).select("doc_id").collect()
    return np.unique(np.array([r["doc_id"] for r in rows],
                              dtype=np.int64))
