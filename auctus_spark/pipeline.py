"""Index-free DataFrame-native query pipeline.

The segment index (``auctus_spark.index``) is the scale path; this
module expresses the same BM25 semantics as ONE declarative DataFrame
DAG over a raw document table — tokenize with built-in ``split``/
``explode`` (JVM-side, whole-stage codegen), aggregate stats, score,
top-k.  It is the anchor used by the driver correctness gate (DuckDB
oracle) and by ``entry()``; the index path must return identical
results.

Semantics mirror the reference's keyword search
(``apiserver/apiserver/search/__init__.py:57-109``): conjunctive AND,
Lucene BM25 (k1=1.2, b=0.75), top-k 50, (score desc, id asc) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import B, K1, TOP_K_SIZE
from .analysis import SPLIT_PATTERN, analyze_query


_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def _ascii_lower(col):
    """ASCII-only lowering (the analyzer contract, analysis.py):
    F.translate instead of F.lower so exotic unicode case mappings
    can't diverge from the oracle."""
    return F.translate(col, _UPPER, _LOWER)


def tokens(docs: DataFrame, id_col: str = "doc_id",
           text_col: str = "text") -> DataFrame:
    """(id, term) pairs — one row per token occurrence.  Pure built-ins:
    ascii-lower → split → explode stays inside whole-stage codegen."""
    return (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(_ascii_lower(F.col(text_col)), SPLIT_PATTERN))
        .alias("term"))
        .filter(F.col("term") != ""))


def doc_lengths_df(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    return (tokens(docs, id_col, text_col)
            .groupBy("doc_id").agg(F.count("*").alias("dl")))


def corpus_stats(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> tuple[int, float]:
    """Global (N, avgdl) — N counts ALL docs (zero-token docs included),
    avgdl = total tokens / N, matching the index build's discipline."""
    row = (docs.select(
        F.size(F.filter(
            F.split(_ascii_lower(F.col(text_col)), SPLIT_PATTERN),
            lambda x: x != "")).alias("dl"))
        .agg(F.count("*").alias("n"), F.sum("dl").alias("t")).collect()[0])
    n = int(row["n"])
    return n, (float(row["t"]) / n if n else 0.0)


def bm25_topk(docs: DataFrame, query: str, k: int = TOP_K_SIZE,
              id_col: str = "doc_id", text_col: str = "text",
              round_to: int | None = None) -> DataFrame:
    """Conjunctive-AND BM25 top-k over a raw document table.

    Returns (doc_id, score) ordered by (score desc, doc_id asc).
    ``round_to`` rounds scores for cross-engine comparison (the bitwise
    contract with the Python oracle is handled by evaluation order:
    idf * (tf/denom), summed in query-term order).
    """
    spark = docs.sparkSession
    terms = analyze_query(query)
    empty = spark.createDataFrame([], f"{id_col} long, score double")
    if not terms:
        return empty
    n_docs, avgdl = corpus_stats(docs, id_col, text_col)
    if n_docs == 0:
        return empty

    tok = tokens(docs, id_col, text_col)
    tf = (tok.filter(F.col("term").isin(terms))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dl = doc_lengths_df(docs, id_col, text_col)
    # global df per query term; broadcast the (tiny) per-term stats
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df")
                              + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    stats = F.broadcast(df_.withColumn("idf", idf))

    contrib = F.col("idf") * (F.col("tf") / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) +
                                   F.lit(B) * F.col("dl") / F.lit(avgdl))))
    scored = (tf.join(stats, "term").join(dl, "doc_id")
              .withColumn("contrib", contrib))
    per_term = [F.max(F.when(F.col("term") == t, F.col("contrib")))
                .alias(f"_c{i}") for i, t in enumerate(terms)]
    agg = (scored.groupBy("doc_id")
           .agg(*per_term, F.count("*").alias("nt"))
           .filter(F.col("nt") == len(terms)))
    score = F.col("_c0")
    for i in range(1, len(terms)):
        score = score + F.col(f"_c{i}")
    if round_to is not None:
        score = F.round(score, round_to)
    return (agg.select(F.col("doc_id").alias(id_col), score.alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))


def bm25_or_topk(docs: DataFrame, query: str, k: int = TOP_K_SIZE,
                 id_col: str = "doc_id", text_col: str = "text",
                 round_to: int | None = None) -> DataFrame:
    """Disjunctive (should) BM25 top-k: docs matching ANY query term,
    score = sum of present-term contributions in query-term order."""
    spark = docs.sparkSession
    terms = analyze_query(query)
    empty = spark.createDataFrame([], f"{id_col} long, score double")
    if not terms:
        return empty
    n_docs, avgdl = corpus_stats(docs, id_col, text_col)
    if n_docs == 0:
        return empty
    tok = tokens(docs, id_col, text_col)
    tf = (tok.filter(F.col("term").isin(terms))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dl = doc_lengths_df(docs, id_col, text_col)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df")
                              + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    stats = F.broadcast(df_.withColumn("idf", idf))
    contrib = F.col("idf") * (F.col("tf") / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) +
                                   F.lit(B) * F.col("dl") / F.lit(avgdl))))
    scored = (tf.join(stats, "term").join(dl, "doc_id")
              .withColumn("contrib", contrib))
    per_term = [F.max(F.when(F.col("term") == t, F.col("contrib")))
                .alias(f"_c{i}") for i, t in enumerate(terms)]
    agg = scored.groupBy("doc_id").agg(*per_term)
    # query-term-order fold; absent terms contribute +0.0 (coalesce)
    score = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    if round_to is not None:
        score = F.round(score, round_to)
    return (agg.select(F.col("doc_id").alias(id_col), score.alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))


def term_stats_df(docs: DataFrame, terms: list[str],
                  id_col: str = "doc_id", text_col: str = "text"
                  ) -> DataFrame:
    """(term, df, cf) global statistics for a term list."""
    tok = tokens(docs, id_col, text_col).filter(F.col("term").isin(terms))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    return (tf.groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))


def facet_counts(docs: DataFrame, query: str, facet_col: str,
                 id_col: str = "doc_id", text_col: str = "text"
                 ) -> DataFrame:
    """Auctus returns `terms` facet aggregations with every search
    (search/__init__.py:587-603): counts of the HIT SET grouped by a
    keyword field — here over conjunctive-AND matches."""
    terms = analyze_query(query)
    tok = tokens(docs, id_col, text_col).filter(F.col("term").isin(terms))
    hits = (tok.groupBy("doc_id")
            .agg(F.count_distinct("term").alias("nt"))
            .filter(F.col("nt") == len(terms))
            .select("doc_id"))
    return (docs.join(hits, docs[id_col] == hits["doc_id"], "left_semi")
            .groupBy(facet_col).agg(F.count("*").alias("n")))


def bm25_multifield_topk(docs: DataFrame, query: str,
                         boosts: dict[str, float], k: int = TOP_K_SIZE,
                         id_col: str = "doc_id",
                         round_to: int | None = None) -> DataFrame:
    """Multi-field BM25 with field boosts — the reference's flagship
    query shape (multi_match over ``id^10, description, name^3,
    attribute_keywords``, operator AND; search/__init__.py:57-109).

    Per-field statistics (N_f over docs with the field, df_f, avgdl_f),
    score = sum over query terms of sum over fields of
    boost_f * idf_f(t) * tf_norm_f(t, d); AND = every term present in
    at least one field.  Bit-exact with oracle.search_multifield
    (same (term, field) summation order via the pivot fold).
    """
    spark = docs.sparkSession
    terms = analyze_query(query)
    empty = spark.createDataFrame([], f"{id_col} long, score double")
    if not terms:
        return empty
    fields = list(boosts)

    per_field = []
    for fcol in fields:
        fd = docs.filter(F.col(fcol).isNotNull())
        n_f, avgdl_f = corpus_stats(fd, id_col, fcol)
        if n_f == 0:
            continue
        tok = tokens(fd, id_col, fcol)
        tf = (tok.filter(F.col("term").isin(terms))
              .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
        dl = doc_lengths_df(fd, id_col, fcol)
        df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
        idf = F.log(F.lit(1.0) + (F.lit(float(n_f)) - F.col("df")
                                  + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
        stats = F.broadcast(df_.withColumn("idf", idf))
        # (boost * idf) * tf_norm — grouping matches the oracle's
        # left-associative boost * idf * tf_norm bit-for-bit
        contrib = ((F.lit(float(boosts[fcol])) * F.col("idf")) *
                   (F.col("tf") / (
                       F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) +
                       F.lit(B) * F.col("dl") / F.lit(avgdl_f)))))
        per_field.append(
            tf.join(stats, "term").join(dl, "doc_id")
            .select("doc_id", "term", F.lit(fcol).alias("field"),
                    contrib.alias("contrib")))
    if not per_field:
        return empty
    allc = per_field[0]
    for x in per_field[1:]:
        allc = allc.unionByName(x)
    # pivot one column per (term, field) → fold in (term, field) order
    cols = []
    names = []
    for i, t in enumerate(terms):
        for j, fcol in enumerate(fields):
            nm = f"_c{i}_{j}"
            names.append(nm)
            cols.append(F.max(F.when(
                (F.col("term") == t) & (F.col("field") == fcol),
                F.col("contrib"))).alias(nm))
    agg = (allc.groupBy("doc_id")
           .agg(*cols, F.count_distinct("term").alias("nt"))
           .filter(F.col("nt") == len(terms)))
    score = None
    for nm in names:
        c = F.coalesce(F.col(nm), F.lit(0.0))
        score = c if score is None else score + c
    if round_to is not None:
        score = F.round(score, round_to)
    return (agg.select(F.col("doc_id").alias(id_col), score.alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))
