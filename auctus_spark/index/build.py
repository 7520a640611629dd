"""Inverted-index build: tokenize → flat postings → global stats →
compressed, bucketed, term-partitioned segments.  Resumable.

What Elasticsearch did for the reference (index one document at a time
into Lucene shards, ``lib_core/datamart_core/common.py:451-467`` →
ES bulk API) becomes three Spark stages:

1. **tokenize** — one ``mapInPandas`` pass over the corpus emits, per
   Arrow batch, both flat postings ``(term, doc_id, tf, dl)`` and
   doc-stat rows (multiplexed on ``term IS NULL`` so the corpus'
   ``content`` column is read and tokenized exactly once).  Written per
   *chunk* (a fixed docID range) so builds are resumable: a chunk whose
   lineage row exists is skipped on re-run.
2. **stats** — global N, avgdl, and per-term df/cf.  These are the BM25
   statistics snapshot; they must be global (pre-merge) for rank
   identity with the oracle (SURVEY.md §7 hard part 1).
3. **encode** — repartition flat postings by ``(term_bucket,
   doc_bucket)`` — the salted repartition: a hot term (df ≈ 30% of the
   corpus) is split across all doc buckets, so no single task owns it —
   then encode each (term, doc_bucket) run into a delta+varbyte segment
   with block-max metadata (codec.py), written partitioned by
   ``term_bucket`` and sorted by term within files so query-time scans
   prune partitions by hash(term) and row-groups by term min/max.

Doc-bucketing by fixed docID range (``doc_id // doc_bucket_size``) is
also what makes conjunctive queries co-partitioned: all terms' postings
for the same docID range carry the same bucket id, so AND-intersection
and WAND run per bucket with no further shuffle.

Iceberg note: the sandbox image has no Iceberg jars, so tables are
parquet directories with the same layout/partitioning; the writer picks
Iceberg automatically when ``spark.sql.catalog`` has it (see
``_fmt``).  Lineage/metrics live in an ordinary table either way.
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

from ..analysis import doc_lengths, term_frequencies, tokenize_series
from .codec import BLOCK_SIZE, varbyte_encode

DEFAULT_DOC_BUCKET = 1 << 16      # docs per scoring bucket
DEFAULT_CHUNK_DOCS = 1 << 20      # docs per resumable build chunk
DEFAULT_TERM_BUCKETS = 64

FLAT_SCHEMA = "term string, doc_id long, tf long, dl long, sha256 string"

SEGMENT_SCHEMA = (
    "term string, bucket long, n_docs long, doc_id_min long, "
    "doc_id_max long, docs_blob binary, tfs_blob binary, dls_blob binary, "
    "block_max array<double>, block_last_doc array<long>, max_norm double"
)


@dataclass
class IndexPaths:
    base: str

    @property
    def flat(self):
        return os.path.join(self.base, "flat")

    @property
    def doc_stats(self):
        return os.path.join(self.base, "doc_stats")

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


def _sha256_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: hashlib.sha256(s.encode()).hexdigest())


def tokenize_to_flat(corpus_batches):
    """mapInPandas body: corpus (doc_id, content, ...) → multiplexed flat
    postings + doc-stat marker rows (term IS NULL, tf=0, sha256 set)."""
    for pdf in corpus_batches:
        toks = tokenize_series(pdf["content"])
        dls = doc_lengths(toks)
        tf = term_frequencies(pdf["doc_id"], toks)
        dl_map = pd.Series(dls.to_numpy(), index=pdf["doc_id"].to_numpy())
        tf["dl"] = dl_map.loc[tf["doc_id"]].to_numpy()
        tf["sha256"] = None
        doc_rows = pd.DataFrame({
            "term": None,
            "doc_id": pdf["doc_id"].astype(np.int64),
            "tf": np.int64(0),
            "dl": dls.to_numpy(),
            "sha256": _sha256_series(pdf["content"]),
        })
        yield pd.concat(
            [tf[["term", "doc_id", "tf", "dl", "sha256"]], doc_rows],
            ignore_index=True)


def _encode_partition_factory(avgdl: float, doc_bucket: int):
    """Vectorized whole-partition segment encoder.

    The partition arrives hash-partitioned by (term_bucket, bucket); we
    sort it by (term, bucket, doc_id) and encode EVERY (term, bucket)
    run in one pass of numpy — per-group Python is limited to slicing
    the shared output buffers (tail terms with df=1 dominate group
    count, so per-group work must be O(1) slices, not O(n) loops).
    """
    from .. import B, K1

    def encode(batches):
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf["bucket"] = (pdf["doc_id"].to_numpy() // doc_bucket)
        pdf = pdf.sort_values(["term", "bucket", "doc_id"],
                              kind="stable", ignore_index=True)
        terms = pdf["term"].to_numpy()
        buckets = pdf["bucket"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dls = pdf["dl"].to_numpy()
        n = len(pdf)

        new_group = np.ones(n, dtype=bool)
        new_group[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
        group_starts = np.nonzero(new_group)[0]
        group_ends = np.append(group_starts[1:], n)
        group_id = np.cumsum(new_group) - 1
        pos_in_group = np.arange(n) - group_starts[group_id]

        # block starts: every BLOCK_SIZE-th posting within a group;
        # delta stream resets at block starts (absolute doc_id) so any
        # block is independently decodable.
        block_start = (pos_in_group % BLOCK_SIZE) == 0
        deltas = doc_ids.copy()
        deltas[~block_start] = doc_ids[~block_start] - doc_ids[
            np.nonzero(~block_start)[0] - 1]

        # vectorized varbyte over the whole partition, sliced per group
        def _stream_and_offsets(vals):
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
            # byte offset of each group start / end
            g_off = starts[group_starts]
            g_end = np.append(g_off[1:], int(ends[-1]))
            return out.tobytes(), g_off, g_end

        docs_stream, docs_off, docs_end = _stream_and_offsets(deltas)
        tfs_stream, tfs_off, tfs_end = _stream_and_offsets(tfs)
        dls_stream, dls_off, dls_end = _stream_and_offsets(dls)

        norm = tfs.astype(np.float64) / (
            tfs + K1 * (1.0 - B + B * dls.astype(np.float64) / avgdl))
        bstart_idx = np.nonzero(block_start)[0]
        blk_max_all = np.maximum.reduceat(norm, bstart_idx)
        blk_end_idx = np.append(bstart_idx[1:], n) - 1
        blk_last_all = doc_ids[blk_end_idx]
        # block → group mapping for slicing
        blk_group = group_id[bstart_idx]
        blk_bounds = np.searchsorted(blk_group,
                                     np.arange(len(group_starts) + 1))
        seg_max = np.maximum.reduceat(norm, group_starts)

        n_groups = len(group_starts)
        rows = {
            "term": terms[group_starts],
            "bucket": buckets[group_starts].astype(np.int64),
            "n_docs": (group_ends - group_starts).astype(np.int64),
            "doc_id_min": doc_ids[group_starts].astype(np.int64),
            "doc_id_max": doc_ids[group_ends - 1].astype(np.int64),
            "docs_blob": [docs_stream[docs_off[g]:docs_end[g]]
                          for g in range(n_groups)],
            "tfs_blob": [tfs_stream[tfs_off[g]:tfs_end[g]]
                         for g in range(n_groups)],
            "dls_blob": [dls_stream[dls_off[g]:dls_end[g]]
                         for g in range(n_groups)],
            "block_max": [blk_max_all[blk_bounds[g]:blk_bounds[g + 1]]
                          for g in range(n_groups)],
            "block_last_doc": [blk_last_all[blk_bounds[g]:blk_bounds[g + 1]]
                               for g in range(n_groups)],
            "max_norm": seg_max.astype(np.float64),
        }
        yield pd.DataFrame(rows)

    return encode


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

    # ---------------- stage 1: tokenize, chunked + resumable ----------

    def _done_chunks(self) -> set[int]:
        try:
            rows = self.spark.read.parquet(self.paths.lineage).select(
                "chunk").distinct().collect()
            return {r["chunk"] for r in rows}
        except Exception:
            return set()

    def tokenize_chunks(self, corpus: DataFrame, resume: bool = True) -> list[int]:
        """Run stage 1 for every chunk not in lineage; returns chunk ids
        actually built this call."""
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
            hi = lo + self.chunk_docs
            cslice = read_corpus_chunk(corpus, lo, hi)
            flat = cslice.select("doc_id", "content").mapInPandas(
                tokenize_to_flat, schema=FLAT_SCHEMA)
            flat.write.mode("overwrite").parquet(
                os.path.join(self.paths.flat, f"chunk={chunk}"))
            # doc stats for the chunk, read back from what we just wrote
            # (single tokenize pass; marker rows carry dl + sha256)
            chunk_flat = self.spark.read.parquet(
                os.path.join(self.paths.flat, f"chunk={chunk}"))
            doc_stats = (chunk_flat.filter(F.col("term").isNull())
                         .select("doc_id", "dl", "sha256"))
            doc_stats.write.mode("overwrite").parquet(
                os.path.join(self.paths.doc_stats, f"chunk={chunk}"))
            # lineage LAST (atomic commit point for the chunk): metrics +
            # order-independent sha rollup for the per-row invariant;
            # decimal(38,0) sum so the rollup never overflows at scale.
            lineage = (doc_stats
                       .select(F.conv(F.substring("sha256", 1, 15), 16, 10)
                               .cast("decimal(38,0)").alias("h"),
                               "doc_id", "dl")
                       .agg(F.count("*").alias("n_docs"),
                            F.sum("dl").alias("total_tokens"),
                            F.min("doc_id").alias("doc_id_min"),
                            F.max("doc_id").alias("doc_id_max"),
                            F.sum("h").cast("decimal(38,0)")
                            .alias("sha_rollup"))
                       .withColumn("chunk", F.lit(chunk)))
            lineage.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.paths.lineage, f"chunk={chunk}"))
            built.append(chunk)
        return built

    # ---------------- stage 2: global statistics ----------------------

    def finalize_stats(self) -> dict:
        ds = self.spark.read.option("basePath", self.paths.doc_stats)\
            .parquet(self.paths.doc_stats + "/chunk=*")
        stats = ds.agg(F.count("*").alias("n_docs"),
                       F.sum("dl").alias("total_tokens")).collect()[0]
        n_docs = int(stats["n_docs"])
        avgdl = float(stats["total_tokens"]) / n_docs if n_docs else 0.0
        pd_stats = pd.DataFrame([{"n_docs": n_docs, "avgdl": avgdl,
                                  "total_tokens": int(stats["total_tokens"])}])
        self.spark.createDataFrame(pd_stats).coalesce(1).write.mode(
            "overwrite").parquet(self.paths.stats)

        flat = self._read_flat().filter(F.col("term").isNotNull())
        term_stats = (flat.groupBy("term")
                      .agg(F.count("*").alias("df"),
                           F.sum("tf").alias("cf"))
                      .withColumn("term_bucket",
                                  F.pmod(F.hash("term"),
                                         F.lit(self.term_buckets))))
        term_stats.write.mode("overwrite").partitionBy("term_bucket")\
            .parquet(self.paths.term_stats)
        return {"n_docs": n_docs, "avgdl": avgdl}

    def _read_flat(self) -> DataFrame:
        return self.spark.read.option("basePath", self.paths.flat)\
            .parquet(self.paths.flat + "/chunk=*")

    # ---------------- stage 3: encode + merge -------------------------

    def encode_segments(self, avgdl: float) -> None:
        flat = self._read_flat().filter(F.col("term").isNotNull())
        flat = flat.withColumn(
            "term_bucket", F.pmod(F.hash("term"), F.lit(self.term_buckets)))
        n_part = max(self.spark.sparkContext.defaultParallelism,
                     self.term_buckets)
        # salted repartition: (term_bucket, doc range bucket) — hot terms
        # spread across doc buckets, no single-task skew.
        repart = flat.repartition(
            n_part, "term_bucket",
            (F.col("doc_id") / F.lit(self.doc_bucket)).cast("long"))
        enc = repart.select("term", "doc_id", "tf", "dl")\
            .mapInPandas(_encode_partition_factory(avgdl, self.doc_bucket),
                         schema=SEGMENT_SCHEMA)
        enc = enc.withColumn(
            "term_bucket", F.pmod(F.hash("term"), F.lit(self.term_buckets)))
        (enc.sortWithinPartitions("term", "bucket")
            .write.mode("overwrite").partitionBy("term_bucket")
            .parquet(self.paths.segments))

    # ---------------- public API --------------------------------------

    def build(self, corpus: DataFrame, resume: bool = True) -> dict:
        """End-to-end build.  ``resume=True`` skips chunks with lineage;
        stats + segments are (re)finalized over all chunks present."""
        self.tokenize_chunks(corpus, resume=resume)
        stats = self.finalize_stats()
        self.encode_segments(stats["avgdl"])
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
