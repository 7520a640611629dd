"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), n-gram Jaccard set-similarity join, MinHash+LSH,
SimHash, and embedding-cosine near-dup.  All hot paths are built-in
expressions or numpy inside Arrow batches — no per-row Python UDFs.

The MinHash/LSH design follows the standard shingle → minhash → band →
bucket-join construction (Broder; Leskovec et al., MMDS ch.3).  The
reference system keeps an analogous MinHash sketch store (Lazo) for
textual-join candidates (``lib_profiler/.../core.py:499-521``,
``apiserver/apiserver/search/join.py:462-554``); here it is a
first-class Spark job usable for corpus dedup.

Portability note: token/shingle hashing uses md5-derived 64-bit ints
(`F.conv(substring(md5(x)..)..)`), so results are reproducible across
engines (DuckDB oracle) and sessions — never Python's salted hash().
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import spark_token_runs

logger = logging.getLogger(__name__)

MERSENNE_P = (1 << 61) - 1

# Skew guard default for every LSH-style bucket self-join: a bucket of
# B members emits B² pairs in ONE task, so a single degenerate bucket
# (all-empty docs, zero vectors, boilerplate) turns web-scale dedup
# quadratic.  10k members → ≤10⁸ pairs per bucket, bounded work.  ON
# by default; pass ``max_bucket=None`` to explicitly opt out (e.g.
# tiny corpora where exact recall is audited).
DEFAULT_MAX_BUCKET = 10_000


def exact_dedup(df: DataFrame, cols: list[str] | None = None,
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row (lowest id) per distinct value of ``cols``.
    Hash-groupBy: one shuffle on the content hash, scales linearly."""
    cols = cols or [c for c in df.columns if c != id_col]
    key = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                       for c in cols]), 256)
    keep = (df.groupBy(key.alias("_k"))
            .agg(F.min(id_col).alias(id_col))
            .drop("_k"))
    return df.join(keep, id_col, "left_semi")


def duplicate_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(content_hash, n_dups, doc_ids) for groups with >1 member."""
    return (df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
            .agg(F.count("*").alias("n_dups"),
                 F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
            .filter(F.col("n_dups") > 1))


# ---------------------------------------------------------------------
# shingles + n-gram Jaccard set-similarity join
# ---------------------------------------------------------------------

def token_shingles(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    toks = spark_token_runs(F.lower(F.col(text_col)))
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(F.array_distinct(sh)).alias("shingle"))
            .filter(F.col("shingle") != ""))


# Hot-shingle skew guard, ON by default (mirrors DEFAULT_MAX_BUCKET):
# a stop-shingle with corpus-scale df makes the shingle self-join emit
# df² pairs on ONE key.  Dropping shingles with df > 10k bounds any
# single join key at ≤10⁸ pairs; a shingle shared by >10k docs carries
# ~zero Jaccard signal anyway (it is the set analogue of a stopword).
DEFAULT_MAX_SHINGLE_DF = 10_000


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8,
                        max_shingle_df: int | None =
                        DEFAULT_MAX_SHINGLE_DF) -> DataFrame:
    """Candidate pairs with shingle-set Jaccard >= threshold.

    Scalable set-similarity join: explode distinct shingles, self-join
    on shingle (co-partitioned shuffle), count intersections, compute
    |A∩B| / (|A|+|B|-|A∩B|).  Shingles appearing in more than
    ``max_shingle_df`` docs are dropped BEFORE the self-join (default
    on — the web-scale skew guard; ``None`` opts out for tiny corpora
    where exact recall is audited).  Set sizes are computed after the
    cap, so the Jaccard is exact over the capped shingle universe.
    """
    # localCheckpoint, not cache(): same one-compute sharing across
    # the 3 consuming branches, but blocks are ContextCleaner-managed
    # (a cache() with no unpersist leaks CacheManager entries across a
    # long multi-query session); the post-cap checkpoint additionally
    # saves re-running the cap's anti-join once per branch
    sh = token_shingles(df, text_col, id_col, n).localCheckpoint()
    if max_shingle_df is not None:
        sh = frequent_shingle_cap(sh, max_shingle_df).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.withColumnRenamed("doc_id", "id_a")
                 .withColumnRenamed("sz", "sz_a"), "id_a")
           .join(sizes.withColumnRenamed("doc_id", "id_b")
                 .withColumnRenamed("sz", "sz_b"), "id_b")
           .withColumn("jaccard",
                       F.col("inter") /
                       (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return out


def frequent_shingle_cap(sh: DataFrame, max_df: int,
                         surface: bool = True,
                         dropped_out: dict | None = None) -> DataFrame:
    """Drop shingles appearing in more than ``max_df`` docs before the
    self-join — the skew guard for web-scale dedup (a stop-shingle
    joins N² pairs otherwise).

    When the cap actually fires it is SURFACED, not silent: a WARNING
    log with the dropped-shingle count.  Callers that need the count
    programmatically pass ``dropped_out={}`` and read
    ``dropped_out["dropped"]`` after the call — an out-param, NOT
    process-global state, so concurrent pipelines in one driver never
    read each other's value.  Counting the hot shingles is one
    aggregate over ``sh`` (callers cache ``sh`` first, so the extra
    job reuses the cached shingles); ``surface=False`` with no
    ``dropped_out`` skips it entirely."""
    hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
           .filter(F.col("df") > max_df).select("shingle"))
    if surface or dropped_out is not None:
        n_hot = hot.count()
        if dropped_out is not None:
            dropped_out["dropped"] = n_hot
        if surface and n_hot:
            logger.warning(
                "shingle-df cap fired: %d shingle(s) with df > %d "
                "dropped; similarity/containment scores are computed "
                "over the capped shingle universe (pass "
                "max_shingle_df=None for exact recall on small "
                "corpora)", n_hot, max_df)
    return sh.join(hot, "shingle", "left_anti")


# ---------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------

def _shingle_hash64():
    """Portable 61-bit integer hash of the shingle string (md5 prefix)."""
    return F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10) \
        .cast("long") % F.lit(MERSENNE_P)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, MERSENNE_P, num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, num_perm, dtype=np.int64)
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       num_perm: int = 64, seed: int = 89) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures.

    One exploded (doc, shingle-hash) frame, then num_perm JVM-side
    ``min((a*x + b) %% p)`` aggregates — a single shuffle on doc_id,
    map-side partial mins, no Python in the path.  (a*x stays within
    int128 via two-step mod on the 61-bit Mersenne prime.)
    """
    a, b = _perm_params(num_perm, seed)
    sh = token_shingles(df, text_col, id_col, n)
    x = _shingle_hash64()
    sh = sh.select("doc_id", x.alias("x"))
    # (a*x + b) mod p in decimal(38) to avoid 64-bit overflow
    aggs = []
    for i in range(num_perm):
        expr = ((F.col("x").cast("decimal(38,0)") * F.lit(int(a[i]))
                 + F.lit(int(b[i]))) % F.lit(MERSENNE_P)).cast("long")
        aggs.append(F.min(expr).alias(f"h{i}"))
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16,
                        rows_per_band: int = 4,
                        max_bucket: int | None = DEFAULT_MAX_BUCKET
                        ) -> DataFrame:
    """Band the signatures, bucket-join: pairs sharing >=1 band bucket.
    (doc_id, sig) → distinct (id_a, id_b).  ``max_bucket`` (default
    ``DEFAULT_MAX_BUCKET``) drops degenerate buckets before the
    self-join; ``None`` opts out (cap_hot_buckets)."""
    # The signature subtree feeds FOUR plan branches (hot-bucket
    # count, its anti-join probe, and both sides of the self-join);
    # Spark does not share common subtrees across join branches, so
    # without materialization the whole minhash aggregation runs 4x
    # (measured: the dominant cost of the sweep's minhash rows).
    # localCheckpoint = compute once, O(docs x num_perm x 8B) storage,
    # lineage-truncated, blocks GC-cleaned (guide §5 caching /
    # §3.3 materialise reused intermediates).
    signatures = signatures.localCheckpoint()
    banded = signatures.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.sha2(F.concat_ws(",", *[
                         F.element_at("sig", i * rows_per_band + j + 1)
                         .cast("string")
                         for j in range(rows_per_band)]), 256)
                     .alias("bucket"))
            for i in range(bands)])).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    banded = cap_hot_buckets(banded, ["band", "bucket"], max_bucket)
    a = banded.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    return (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.8,
                        num_perm: int = 64, bands: int = 16,
                        seed: int = 89) -> DataFrame:
    """Full near-dup pipeline: minhash → LSH candidates → verify with
    exact shingle Jaccard (no false positives; LSH recall governed by
    the band curve 1-(1-t^r)^b)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col,
                              num_perm=num_perm, seed=seed)
    cand = lsh_candidate_pairs(sigs, bands, rows_per_band)
    # shingles feed 3 branches (sizes + both join sides): tokenize
    # once, not three times (same rationale as lsh_candidate_pairs)
    sh = token_shingles(df, text_col, id_col).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"),
                  F.col("shingle").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"),
                  F.col("shingle").alias("sh_b"))
    inter = (cand.join(a, "id_a").join(b, "id_b")
             .filter(F.col("sh_a") == F.col("sh_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "id_a")
                  .withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("doc_id", "id_b")
                  .withColumnRenamed("sz", "sz_b"), "id_b")
            .withColumn("jaccard",
                        F.col("inter") /
                        (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.5,
                      candidates: str = "shingle",
                      num_perm: int = 64, bands: int = 16,
                      seed: int = 89,
                      max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF
                      ) -> DataFrame:
    """Directional Lazo-style containment scores
    ``|A∩B| / |A|`` — the reference's textual-join semantics
    (``apiserver/apiserver/search/join.py:462-554, 633-662``: Lazo
    sketches estimate how much of the QUERY column's value set a
    candidate column contains; the scores ride into ES as
    constant_score boosts).  Unlike symmetric Jaccard this ranks a
    small set fully inside a big one at 1.0 — the case join
    augmentation cares about.

    Returns (id_q, id_c, containment): the fraction of doc ``id_q``'s
    distinct shingle set contained in ``id_c``'s, both directions of
    every candidate pair, filtered at ``threshold``.

    ``candidates='shingle'`` (default) generates candidates from the
    capped shingle self-join — exact recall, skew-bounded by
    ``max_shingle_df``.  ``candidates='lsh'`` uses the banded-minhash
    buckets instead (cheaper at corpus scale, recall follows the
    symmetric-Jaccard band curve — like Lazo itself, a sketch with
    false negatives for very asymmetric pairs).
    """
    # see ngram_jaccard_pairs: one-compute sharing, leak-free
    sh = token_shingles(df, text_col, id_col).localCheckpoint()
    if max_shingle_df is not None:
        sh = frequent_shingle_cap(sh, max_shingle_df).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"),
                  F.col("shingle").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"),
                  F.col("shingle").alias("sh_b"))
    if candidates == "lsh":
        sigs = minhash_signatures(df, text_col, id_col,
                                  num_perm=num_perm, seed=seed)
        cand = lsh_candidate_pairs(sigs, bands, num_perm // bands)
        inter = (cand.join(a, "id_a").join(b, "id_b")
                 .filter(F.col("sh_a") == F.col("sh_b"))
                 .groupBy("id_a", "id_b")
                 .agg(F.count("*").alias("inter")))
    elif candidates == "shingle":
        inter = (a.join(b, F.col("sh_a") == F.col("sh_b"))
                 .filter(F.col("id_a") < F.col("id_b"))
                 .groupBy("id_a", "id_b")
                 .agg(F.count("*").alias("inter")))
    else:
        raise ValueError(f"unknown candidates source: {candidates!r}")
    both = (inter
            .join(sizes.withColumnRenamed("doc_id", "id_a")
                  .withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("doc_id", "id_b")
                  .withColumnRenamed("sz", "sz_b"), "id_b")
            # both directions project from this join: compute it once
            .localCheckpoint())
    d1 = both.select(F.col("id_a").alias("id_q"),
                     F.col("id_b").alias("id_c"),
                     (F.col("inter") / F.col("sz_a")).alias("containment"))
    d2 = both.select(F.col("id_b").alias("id_q"),
                     F.col("id_a").alias("id_c"),
                     (F.col("inter") / F.col("sz_b")).alias("containment"))
    return (d1.unionByName(d2)
            .filter(F.col("containment") >= threshold))


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 48) -> DataFrame:
    """(doc_id, simhash: long) — Charikar fingerprint: per bit j, the
    sign of sum over tokens of tf * (bit_j(hash(token)) ? +1 : -1).

    Token hash = md5-derived 60-bit int (portable, fits a long); the
    per-bit sums are JVM-side conditional aggregates — one shuffle on
    doc_id.  ``bits`` <= 60.
    """
    assert bits <= 60
    toks = (df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(spark_token_runs(F.lower(F.col(text_col))))
        .alias("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10) \
        .cast("long")
    tf = tf.withColumn("h", h)
    sums = tf.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright("h", j) % 2 == 1,
                     F.col("tf")).otherwise(-F.col("tf"))).alias(f"b{j}")
        for j in range(bits)])
    sig = sums.select("doc_id", sum(
        [F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
         for j in range(bits)],
        F.lit(0)).cast("long").alias("simhash"))
    return sig


def hamming_distance(col_a, col_b):
    return F.bit_count(col_a.bitwiseXOR(col_b))


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3,
                       block_bits: int = 12, bits: int = 48,
                       max_bucket: int | None = DEFAULT_MAX_BUCKET
                       ) -> DataFrame:
    """Near-dup pairs by simhash: block on disjoint bit chunks
    (pigeonhole: hamming <= n_blocks-1 → at least one identical chunk),
    then verify exact hamming distance.  ``max_bucket`` (default
    ``DEFAULT_MAX_BUCKET``) drops degenerate blocks before the
    self-join; ``None`` opts out (cap_hot_buckets)."""
    n_blocks = bits // block_bits
    assert max_hamming < n_blocks
    blocked = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     (F.shiftright("simhash", i * block_bits)
                      % F.lit(1 << block_bits)).alias("key"))
            for i in range(n_blocks)])).alias("b")
    ).select("doc_id", "simhash", "b.blk", "b.key")
    blocked = cap_hot_buckets(blocked, ["blk", "key"], max_bucket)
    a = blocked.select(F.col("doc_id").alias("id_a"),
                       F.col("simhash").alias("sh_a"), "blk", "key")
    b = blocked.select(F.col("doc_id").alias("id_b"),
                       F.col("simhash").alias("sh_b"), "blk", "key")
    return (a.join(b, ["blk", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    hamming_distance(F.col("sh_a"), F.col("sh_b"))
                    .alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------

def cap_hot_buckets(banded: DataFrame, keys: list[str],
                    max_bucket: int | None) -> DataFrame:
    """Drop LSH band buckets with more than ``max_bucket`` members
    before the self-join — the skew guard for web-scale dedup (one
    degenerate bucket, e.g. all-empty docs, otherwise joins N² pairs
    in a single task).  Like ``frequent_shingle_cap``, dropping a
    bucket can only lose candidate pairs whose members still co-occur
    in another (uncapped) band; None disables."""
    if max_bucket is None:
        return banded
    hot = (banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > max_bucket).select(*keys))
    return banded.join(hot, keys, "left_anti")


def embedding_near_pairs(emb: DataFrame, vec_col: str = "embedding",
                         id_col: str = "vec_id", threshold: float = 0.95,
                         bands: int = 24, rows_per_band: int = 8,
                         seed: int = 89, dim: int | None = None,
                         max_bucket: int | None = DEFAULT_MAX_BUCKET
                         ) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold: BANDED
    random-hyperplane LSH + exact cosine verify (no false positives).

    A single sign-bit table has recall (1-θ/π)^bits — ~0.2 at
    cos 0.95 with 16 bits.  Banding fixes it like MinHash-LSH: b bands
    of r bits each; a pair is a candidate when ALL r bits of ANY band
    agree: recall = 1-(1-p^r)^b with p = 1-θ/π.  Defaults (24×8) give
    miss probability ~2e-6 per true pair at cos=0.95.

    One pandas_udf computes all b·r projections per Arrow batch (numpy
    matmul) and packs r sign bits per band; explode to (band, key) →
    per-band bucket join (one shuffle) → distinct candidates → exact
    verify.  ``max_bucket`` caps degenerate buckets (see
    ``cap_hot_buckets``).

    EXACT-DUPLICATE COLLAPSE (round 8): identical vectors have
    identical band keys, so k copies of one vector turn every
    candidate involving it into k candidates — a corpus where docs
    average k exact copies (the common web-dedup regime; exact dedup
    exists precisely because of it) inflates the candidate set by k²
    while adding zero information to the verify.  Measured on a
    10x-replicated 20k-vector table at the [embedding_near_pairs]
    gate's parameters (threshold 0.45, 32x2 banding): 199.9M
    candidates — the verify was O(n²) in copies.  The operator now
    groups by the EXACT vector value first (one shuffle of the
    vectors), runs banding + verify on group representatives, and
    expands surviving group pairs back to member pairs.  Equivalence:
    members of a group share every (band, key) row, so (i, j) is a
    candidate iff their groups share a surviving bucket; the bucket
    cap counts MEMBERS (weighted by group size), so bucket survival
    is unchanged; within-group pairs (identical vectors) are
    candidates iff the group keeps >= 1 surviving bucket, scored by
    routing the group's SELF-pair through the same verify; cosine
    depends only on vector values, so every expanded pair carries the
    value the per-member verify would have produced, computed by the
    identical arithmetic.  (Caveat: Spark grouping normalizes
    -0.0 == 0.0 and NaN == NaN inside the group key; vectors
    differing only in zero sign share a representative — their
    cosines agree except in adversarial signed-zero accumulations
    that real embeddings do not produce.)  A duplicate-free input
    (n_groups == n) BYPASSES to the exact historical plan, so the
    collapse costs one vector-keyed window + two tiny jobs there."""
    from pyspark.sql.types import ArrayType, LongType

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.normal(size=(dim, bands * rows_per_band))
    pack = 1 << np.arange(rows_per_band, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def band_keys(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())                     # (batch, dim)
        bits = (m @ planes) > 0                        # (batch, b*r)
        keys = bits.reshape(len(m), bands, rows_per_band) @ pack
        return pd.Series(list(keys.astype(np.int64)))

    # the band_keys pandas UDF projection feeds SIX plan branches
    # (hot-bucket count + anti-join probe, both self-join sides, va,
    # vb): materialize it once or the python matmul runs 6x (guide
    # §4 python boundary + §5 caching; measured 9.7 s -> ~3 s on the
    # embedding_near_pairs sweep row)
    # Per-vector NORM precomputed in the checkpoint: ONE
    # interpreted-HOF pass over n vectors instead of one per CANDIDATE
    # PAIR side (the banding false-positive rate makes pairs >>
    # vectors; measured 208k pairs from 2k vectors at sf0.1).
    # cos = dot/(nrm_a*nrm_b) multiplies the identical per-vector
    # doubles in the identical order, so scores are bit-unchanged.
    nrm_of = (lambda c: F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x)))
    e = emb.select(F.col(id_col).alias("vid"),
                   F.col(vec_col).cast("array<double>").alias("v")) \
        .withColumn("bk", band_keys("v")) \
        .withColumn("nrm", nrm_of(F.col("v"))).localCheckpoint()

    from pyspark.sql import Window
    mem = e.select("vid", "v").withColumn(
        "gid", F.min("vid").over(Window.partitionBy("v"))) \
        .select("vid", "gid").localCheckpoint()
    n_vecs = e.count()          # checkpointed: cheap counts
    n_groups = mem.select("gid").distinct().count()
    if n_groups == n_vecs:
        # duplicate-free: the exact historical plan, nothing expanded
        banded = e.select(
            "vid", F.posexplode("bk").alias("band", "key"))
        banded = cap_hot_buckets(banded, ["band", "key"],
                                 max_bucket).localCheckpoint()
        cand = (banded.alias("a")
                .join(banded.alias("b"), ["band", "key"])
                .filter(F.col("a.vid") < F.col("b.vid"))
                .select(F.col("a.vid").alias("id_a"),
                        F.col("b.vid").alias("id_b"))
                .distinct())
        return _verify_cosine_pairs(e, cand, n_vecs, dim, threshold)

    # ---- duplicate-collapse path: everything at GROUP level --------
    reps = (e.join(mem.filter(F.col("vid") == F.col("gid"))
                   .select("vid"), "vid")
            .localCheckpoint())
    gsz = mem.groupBy("gid").agg(F.count(F.lit(1)).alias("gsz"))
    banded_g = reps.select(
        "vid", F.posexplode("bk").alias("band", "key"))
    if max_bucket is not None:
        # cap on MEMBER count (sum of group sizes), matching the
        # per-member cap_hot_buckets decision exactly
        hot = (banded_g.join(gsz, banded_g["vid"] == gsz["gid"])
               .groupBy("band", "key").agg(F.sum("gsz").alias("_n"))
               .filter(F.col("_n") > max_bucket)
               .select("band", "key"))
        banded_g = banded_g.join(hot, ["band", "key"], "left_anti")
    banded_g = banded_g.localCheckpoint()
    cand_g = (banded_g.alias("a")
              .join(banded_g.alias("b"), ["band", "key"])
              .filter(F.col("a.vid") < F.col("b.vid"))
              .select(F.col("a.vid").alias("id_a"),
                      F.col("b.vid").alias("id_b"))
              .distinct())
    # within-group pairs are candidates iff the group keeps >= 1
    # surviving bucket; score them as the group's SELF-pair through
    # the same verify (identical arithmetic: cos(v, v) with the same
    # cumsum-dot / nrm*nrm)
    self_g = (banded_g.select(F.col("vid").alias("gid")).distinct()
              .join(gsz.filter(F.col("gsz") >= 2).select("gid"), "gid")
              .select(F.col("gid").alias("id_a"),
                      F.col("gid").alias("id_b")))
    scored = _verify_cosine_pairs(
        reps, cand_g.unionByName(self_g), n_groups, dim, threshold) \
        .localCheckpoint()
    ma = mem.select(F.col("gid").alias("id_a"),
                    F.col("vid").alias("vid_a"))
    mb = mem.select(F.col("gid").alias("id_b"),
                    F.col("vid").alias("vid_b"))
    cross = (scored.filter(F.col("id_a") != F.col("id_b"))
             .join(ma, "id_a").join(mb, "id_b")
             .select(F.least("vid_a", "vid_b").alias("id_a"),
                     F.greatest("vid_a", "vid_b").alias("id_b"),
                     "cosine"))
    within = (scored.filter(F.col("id_a") == F.col("id_b"))
              .select(F.col("id_a").alias("gid"), "cosine")
              .join(mem.select("gid", F.col("vid").alias("vid_a")),
                    "gid")
              .join(mem.select("gid", F.col("vid").alias("vid_b")),
                    "gid")
              .filter(F.col("vid_a") < F.col("vid_b"))
              .select(F.col("vid_a").alias("id_a"),
                      F.col("vid_b").alias("id_b"), "cosine"))
    return cross.unionByName(within)


def _verify_cosine_pairs(e: DataFrame, cand: DataFrame, n_vecs: int,
                         dim: int, threshold: float) -> DataFrame:
    """Exact-cosine verify of candidate pairs against the vector table
    ``e`` (vid, v, nrm).  Shared by the member-level and group-level
    paths of :func:`embedding_near_pairs`; accepts SELF-pairs
    (id_a == id_b), which score cos(v, v) with the same arithmetic.

    Candidate pairs >> vectors (banding FP rate:
    208k pairs from 2k vectors measured at sf0.1), so the verify
    must not ship 2 x dim doubles PER PAIR through joins (guide §8:
    move decisions onto lightweight proxies, attach heavy payloads
    once).  When the whole vector table fits a broadcast cap
    (n x dim x 8B <= AUCTUS_VEC_BCAST_MB, default 64 MB), the pair
    table — 16 B/pair — flows alone into ONE mapInPandas that looks
    both sides up in the broadcast matrix; above the cap it falls
    back to the two joins (at that scale the pair list per band is
    also partition-local, so the join shape is the scalable one).

    Bit-identical floats either way: the historical HOF evaluated
    ((0.0 + p0) + p1) + ... strictly left-associatively, and
    np.cumsum is the same sequential left-assoc accumulation
    (pinned against the JVM HOF in tests/test_opt_r08.py); the
    elementwise product is IEEE-identical, and nrm_a*nrm_b uses the
    same precomputed per-vector doubles in the same order."""
    threshold = float(threshold)
    cap_b = int(__import__("os").environ.get(
        "AUCTUS_VEC_BCAST_MB", "64")) << 20
    if n_vecs * dim * 8 <= cap_b:
        rows_v = e.select("vid", "v", "nrm").collect()
        idx = {r["vid"]: i for i, r in enumerate(rows_v)}
        mat = np.array([r["v"] for r in rows_v], dtype=np.float64)
        nrm = np.array([r["nrm"] for r in rows_v], dtype=np.float64)
        bc = e.sparkSession.sparkContext.broadcast((idx, mat, nrm))

        def verify(batches):
            bidx, bmat, bnrm = bc.value
            for pdf in batches:
                ia = pdf["id_a"].map(bidx).to_numpy()
                ib = pdf["id_b"].map(bidx).to_numpy()
                dots = np.cumsum(bmat[ia] * bmat[ib], axis=1)[:, -1]
                cos = dots / (bnrm[ia] * bnrm[ib])
                keep = cos >= threshold
                yield pd.DataFrame({
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine": cos[keep]})

        return cand.mapInPandas(
            verify, schema="id_a long, id_b long, cosine double")

    va = e.select(F.col("vid").alias("id_a"), F.col("v").alias("va"),
                  F.col("nrm").alias("nrm_a"))
    vb = e.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"),
                  F.col("nrm").alias("nrm_b"))

    @F.pandas_udf("double")
    def _pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        ma = np.stack(a.to_numpy())
        mb = np.stack(b.to_numpy())
        return pd.Series(np.cumsum(ma * mb, axis=1)[:, -1])

    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cos",
                        _pair_dot("va", "vb")
                        / (F.col("nrm_a") * F.col("nrm_b")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.col("cos").alias("cosine")))


# ---------------------------------------------------------------------
# Cross-document span-level exact dedup + benchmark decontamination
# ---------------------------------------------------------------------

def _word_ngram_occurrences(df: DataFrame, n: int,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, span) for every word ``n``-gram window.

    Tokenization matches the engine contract (lowercase, \\W+ split,
    empties dropped); ``pos`` is the 0-based window start in the
    filtered token stream.  Docs shorter than ``n`` tokens emit no
    rows.  Pure JVM expressions — the explode fans out L-n+1 rows per
    doc (linear in corpus tokens, never quadratic)."""
    toks = spark_token_runs(F.lower(F.col(text_col)))
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    spans = F.when(
        F.size("_toks") >= n,
        F.transform(F.sequence(F.lit(0), F.size("_toks") - n),
                    lambda i: F.array_join(
                        F.slice("_toks", i + 1, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.posexplode(spans).alias("pos", "span"))


def duplicate_spans(df: DataFrame, n: int = 10,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Cross-document duplicate n-gram-span statistics per document.

    The span-granularity analog of exact-substring train-set dedup
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"): every word ``n``-gram window is an occurrence;
    the globally FIRST occurrence (min (doc_id, pos)) is canonical
    and every later occurrence of the same span text is a duplicate.
    Returns, per document with >= 1 span::

        (doc_id, n_spans, n_dup_spans, dup_ratio)

    where ``dup_ratio = n_dup_spans / n_spans`` — the fraction of the
    doc's windows already seen elsewhere (the kill-criterion column
    for a filter stage).

    Scale shape: occurrences are linear in corpus tokens; spans are
    reduced to a 64-bit md5-derived key before the shuffle (span
    STRINGS never shuffle); one groupBy(span_h) aggregate finds the
    canonical occurrence + count, one hash join back (fan-out linear
    in occurrences even for degenerate hot spans — no pair blowup),
    one groupBy(doc_id) rollup.  The reference has no cross-doc span
    dedup (its Lazo store is column-set granularity); this is the
    training-data-pipeline extension.
    """
    occ = _word_ngram_occurrences(df, n, text_col, id_col)
    occ = occ.withColumn(
        "_h", F.conv(F.substring(F.md5("span"), 1, 15), 16, 10)
               .cast("long")).drop("span")
    firsts = occ.groupBy("_h").agg(
        F.min(F.struct("doc_id", "pos")).alias("_first"),
        F.count("*").alias("_cnt"))
    j = occ.join(firsts, "_h")
    is_dup = ~((F.col("doc_id") == F.col("_first.doc_id"))
               & (F.col("pos") == F.col("_first.pos")))
    return (j.groupBy("doc_id")
            .agg(F.count("*").alias("n_spans"),
                 F.sum(is_dup.cast("long")).alias("n_dup_spans"))
            .withColumn("dup_ratio",
                        F.round(F.col("n_dup_spans") / F.col("n_spans"),
                                6)))


def decontaminate(df: DataFrame, benchmark: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None) -> DataFrame:
    """Benchmark decontamination flags: docs sharing any word
    ``n``-gram with a held-out benchmark set.

    The published train-set decontamination recipe (GPT-3 appendix C /
    Llama: drop training docs with >= 1 colliding 13-gram against an
    eval benchmark; ``n`` configurable because short synthetic docs
    need smaller windows).  Returns one row per CONTAMINATED corpus
    doc::

        (doc_id, n_hits)

    with ``n_hits`` = number of distinct benchmark span texts present
    in the doc.  Non-contaminated docs are absent (the common case at
    scale — keep the result small and anti-join it against the corpus
    to clean).

    Scale shape: the benchmark side (eval sets — tiny vs the corpus)
    is reduced to DISTINCT spans and broadcast; the corpus side
    streams its occurrences through the broadcast hash join with no
    shuffle of corpus data; one groupBy(doc_id) rollup on the
    surviving (rare) hits.
    """
    bt = bench_text_col or text_col
    bench_spans = (_word_ngram_occurrences(benchmark, n, bt, id_col)
                   .select("span").distinct())
    occ = (_word_ngram_occurrences(df, n, text_col, id_col)
           .select("doc_id", "span").distinct())
    hits = occ.join(F.broadcast(bench_spans), "span")
    return (hits.groupBy("doc_id")
            .agg(F.count("*").alias("n_hits")))


def dedup_paragraphs(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     sep: str = "\n\n") -> DataFrame:
    """Corpus-wide paragraph-level exact dedup — the C4 repeated-unit
    rule (Raffel et al. 2020 §2.2 drop repeated three-sentence spans;
    the deployed unit in most pipelines is the paragraph): every
    distinct (trimmed) paragraph survives ONLY at its first
    occurrence, first = lexicographic min of (doc id, position in
    doc) — later copies are dropped both across documents and within
    one.  Documents are rebuilt from their surviving paragraphs in
    original order.

    Returns (id, n_kept, n_dropped, text_dedup); a document whose
    every paragraph was seen earlier comes back with n_kept=0 and
    empty text (kept in the output — the caller decides whether an
    emptied doc is removed).

    Scale shape: one explode (linear in paragraphs), one
    groupBy(paragraph) min-struct to elect winners, one join back on
    the paragraph key, one groupBy(doc) rebuild with an array_sort —
    no windows over the full corpus, no driver state.  Hot boilerplate
    paragraphs concentrate on single keys like hot shingles; the
    groupBy is an aggregation (combiner-friendly), not a join fanout,
    so skew cost is bounded by the aggregation, and the join back is
    paragraph-key-to-winner (1 row per distinct paragraph).
    """
    import re as _re
    ex = (df.select(F.col(id_col).alias("_id"),
                    F.posexplode(F.split(F.col(text_col),
                                         _re.escape(sep), -1))
                    .alias("_pos", "_para"))
          .select("_id", "_pos", F.trim(F.col("_para")).alias("_norm"))
          .filter(F.col("_norm") != ""))
    winners = ex.groupBy("_norm").agg(
        F.min(F.struct("_id", "_pos")).alias("_w"))
    kept = (ex.join(winners, "_norm")
            .filter((F.col("_id") == F.col("_w._id"))
                    & (F.col("_pos") == F.col("_w._pos")))
            .select("_id", "_pos", "_norm"))
    totals = ex.groupBy("_id").agg(F.count("*").alias("_n_total"))
    rebuilt = kept.groupBy("_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(sep, F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_norm"))),
            lambda s: s["_norm"])).alias("text_dedup"))
    return (totals.join(rebuilt, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
                    .alias("n_kept"),
                    (F.col("_n_total")
                     - F.coalesce(F.col("n_kept"), F.lit(0)))
                    .cast("long").alias("n_dropped"),
                    F.coalesce(F.col("text_dedup"), F.lit(""))
                    .alias("text_dedup")))


def dedup_clusters(pairs: DataFrame, left: str = "id_a",
                   right: str = "id_b",
                   max_iterations: int = 20) -> DataFrame:
    """Connected components over a near-duplicate PAIR graph — the
    step between pair generation (minhash / simhash / embedding LSH)
    and canonical-document selection: every node gets
    ``cluster_id = min(doc id reachable from it)``, so each duplicate
    cluster elects its smallest id as canonical and `keep = (doc_id
    == cluster_id)` implements keep-one-per-cluster.

    Hash-min label propagation: labels start as each node's own id;
    every iteration a node takes the min of its label and its
    neighbors' labels.  Converges in O(graph diameter) iterations —
    near-dup clusters are dense and shallow (diameter a handful),
    NOT chains, so the default cap is generous; raises RuntimeError
    if the cap is hit (pathological chain input).

    Scale shape: the loop is driver-side CONTROL FLOW only — each
    iteration is one distributed join (edges x labels) + one groupBy
    min, and the convergence probe is a 1-row aggregate comparing
    sum(label) (strictly decreasing until fixpoint, constant at it).
    Labels are localCheckpoint-ed each iteration: without lineage
    truncation an iterative DataFrame loop re-plans the whole chain
    every step and the plan grows superlinearly — the checkpoint
    keeps iteration i's plan O(1), the standard Spark iterative
    pattern (GraphFrames does the same).

    Returns (node, cluster_id) with ``node`` named after ``left``'s
    element type — column names (doc_id, cluster_id).
    """
    # ``pairs`` is typically an expensive near-dup pipeline
    # (minhash/LSH/verify); it feeds BOTH union branches, so without
    # materialization the whole pipeline runs twice before the loop
    # even starts.  localCheckpoint also replaces the old e.persist()
    # (leak-free; e is then two cheap projections of the checkpoint).
    pairs = pairs.localCheckpoint()
    e = (pairs.select(F.col(left).alias("src"),
                      F.col(right).alias("dst"))
         .union(pairs.select(F.col(right).alias("src"),
                             F.col(left).alias("dst"))))
    e = e.localCheckpoint()
    labels = (e.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("cluster_id", F.col("doc_id"))
              .localCheckpoint())
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    for _ in range(max_iterations):
        neigh = (e.join(labels,
                        e["dst"] == labels["doc_id"])
                 .select(F.col("src").alias("doc_id"),
                         F.col("cluster_id")))
        labels = (labels.unionByName(neigh)
                  .groupBy("doc_id")
                  .agg(F.min("cluster_id").alias("cluster_id"))
                  .localCheckpoint())
        new_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"dedup_clusters did not converge in {max_iterations} "
        "iterations — pathological chain graph; raise max_iterations")
