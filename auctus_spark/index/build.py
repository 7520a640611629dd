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


def _encode_batch(pdf: pd.DataFrame, doc_bucket: int) -> pd.DataFrame:
    """Vectorized: one corpus batch → partial segment rows + one marker
    row.  Tokenization runs entirely in Arrow C++ (ascii_lower → RE2
    split → dictionary_encode): no per-token Python objects — the
    python-object churn of string tokenization is memory-bandwidth
    bound and kills multi-core scaling otherwise.  tf counting is one
    np.unique over packed (term_code, doc) int keys."""
    import decimal

    import pyarrow as pa
    import pyarrow.compute as pc

    doc_ids_all = pdf["doc_id"].to_numpy()
    n_batch = len(pdf)
    content = pa.Array.from_pandas(pdf["content"], type=pa.large_string())

    # sha256 over raw utf8 straight from the Arrow buffer (no copies)
    offs = np.frombuffer(content.buffers()[1], dtype=np.int64,
                         count=n_batch + 1)
    data_mv = memoryview(content.buffers()[2])
    sha_sum = decimal.Decimal(sum(
        int(hashlib.sha256(data_mv[offs[i]:offs[i + 1]])
            .hexdigest()[:15], 16) for i in range(n_batch)))

    toks = pc.split_pattern_regex(pc.ascii_lower(content),
                                  "[^a-z0-9_]+")
    flat = pc.list_flatten(toks)
    lens = np.diff(toks.offsets.to_numpy())
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary.to_pandas().to_numpy()  # unique terms only

    doc_local = np.repeat(np.arange(n_batch, dtype=np.int64), lens)
    # drop empty tokens (split artifacts at string edges)
    empty_code = np.nonzero(vocab == "")[0]
    if empty_code.size:
        keep = codes != empty_code[0]
        codes, doc_local = codes[keep], doc_local[keep]
    dl_per_doc = np.bincount(doc_local, minlength=n_batch).astype(np.int64)

    marker = pd.DataFrame({
        "term": [None], "bucket": [0],
        "n_docs": [np.int64(n_batch)],
        "tf_sum": [np.int64(dl_per_doc.sum())],
        "doc_id_min": [np.int64(doc_ids_all.min())],
        "doc_id_max": [np.int64(doc_ids_all.max())],
        "docs_blob": [None], "tfs_blob": [None], "dls_blob": [None],
        "docs_off": [None], "tfs_off": [None], "dls_off": [None],
        "block_max_tf": [None], "block_min_dl": [None],
        "block_last_doc": [None],
        "max_tf": [np.int64(0)], "min_dl": [np.int64(0)],
        # decimal.Decimal, NOT int: Arrow wraps big python ints to
        # int64 before the decimal(38,0) cast
        "sha_rollup": [sha_sum],
    })
    if codes.size == 0:
        return marker

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
        return out.tobytes(), g_off, g_end, starts

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

    def _offs(pv, g_off, g_end):
        return [np.append(pv[bstart_idx[blk_bounds[g]:blk_bounds[g + 1]]]
                          - g_off[g], g_end[g] - g_off[g])
                for g in range(ng)]

    seg_rows = pd.DataFrame({
        "term": vocab[tcode[group_starts]],
        "bucket": buckets[group_starts].astype(np.int64),
        "n_docs": (group_ends - group_starts).astype(np.int64),
        "tf_sum": np.add.reduceat(tfs, group_starts).astype(np.int64),
        "doc_id_min": doc_ids[group_starts],
        "doc_id_max": doc_ids[group_ends - 1],
        "docs_blob": [docs_s[docs_o[g]:docs_e[g]] for g in range(ng)],
        "tfs_blob": [tfs_s[tfs_o[g]:tfs_e[g]] for g in range(ng)],
        "dls_blob": [dls_s[dls_o[g]:dls_e[g]] for g in range(ng)],
        "docs_off": _offs(docs_pv, docs_o, docs_e),
        "tfs_off": _offs(tfs_pv, tfs_o, tfs_e),
        "dls_off": _offs(dls_pv, dls_o, dls_e),
        "block_max_tf": [blk_max_tf[blk_bounds[g]:blk_bounds[g + 1]]
                         for g in range(ng)],
        "block_min_dl": [blk_min_dl[blk_bounds[g]:blk_bounds[g + 1]]
                         for g in range(ng)],
        "block_last_doc": [blk_last[blk_bounds[g]:blk_bounds[g + 1]]
                           for g in range(ng)],
        "max_tf": seg_max_tf.astype(np.int64),
        "min_dl": seg_min_dl.astype(np.int64),
        "sha_rollup": None,
    })
    return pd.concat([seg_rows, marker], ignore_index=True)


def _tokenize_encode_factory(doc_bucket: int,
                             max_batch_bytes: int = 24 << 20):
    """Byte-budgeted sub-batching: an Arrow batch of N corpus rows
    explodes to ~15x its bytes in Python token objects, so each task
    re-chunks its input to ~24 MB of content before tokenizing — peak
    memory stays flat regardless of Arrow batch size x concurrency
    (32 concurrent 200k-doc batches OOM-thrash a 128 GB box)."""
    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            sizes = pdf["content"].str.len().to_numpy()
            cuts = [0]
            acc = 0
            for i, s in enumerate(sizes):
                acc += int(s)
                if acc >= max_batch_bytes:
                    cuts.append(i + 1)
                    acc = 0
            if cuts[-1] != n:
                cuts.append(n)
            for lo, hi in zip(cuts[:-1], cuts[1:]):
                yield _encode_batch(pdf.iloc[lo:hi], doc_bucket)
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
            partials = cslice.select("doc_id", "content").mapInPandas(
                _tokenize_encode_factory(self.doc_bucket),
                schema=PARTIAL_SCHEMA)
            pdir = os.path.join(self.paths.partials, f"chunk={chunk}")
            partials.write.mode("overwrite").parquet(pdir)
            markers = (self.spark.read.parquet(pdir)
                       .filter(F.col("term").isNull()))
            lineage = (markers.agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("tf_sum").alias("total_tokens"),
                F.min("doc_id_min").alias("doc_id_min"),
                F.max("doc_id_max").alias("doc_id_max"),
                F.sum("sha_rollup").cast("decimal(38,0)")
                .alias("sha_rollup"))
                .withColumn("chunk", F.lit(chunk)))
            lineage.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.paths.lineage, f"chunk={chunk}"))
            built.append(chunk)
        return built

    def _read_partials(self) -> DataFrame:
        return self.spark.read.option("basePath", self.paths.partials)\
            .parquet(self.paths.partials + "/chunk=*")

    # ---------------- stage 2: global statistics ----------------------

    def finalize_stats(self) -> dict:
        """Global (N, avgdl) from the marker rows — a metadata-only
        scan (column-pruned, term IS NULL pushdown)."""
        m = self._read_partials().filter(F.col("term").isNull())
        stats = m.agg(F.sum("n_docs").alias("n_docs"),
                      F.sum("tf_sum").alias("total_tokens")).collect()[0]
        n_docs = int(stats["n_docs"])
        avgdl = float(stats["total_tokens"]) / n_docs if n_docs else 0.0
        pd_stats = pd.DataFrame([{
            "n_docs": n_docs, "avgdl": avgdl,
            "total_tokens": int(stats["total_tokens"])}])
        self.spark.createDataFrame(pd_stats).coalesce(1).write.mode(
            "overwrite").parquet(self.paths.stats)
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
