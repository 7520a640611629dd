"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 search over the sf0.001 documents
table.  ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2, each validated against DuckDB at sf0.01.

Float columns are rounded to 6 dp on BOTH sides before the driver's
value hash (cross-engine float sums differ in the last ulp).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from auctus_spark import pipeline  # noqa: E402
from auctus_spark.analysis import SPLIT_PATTERN  # noqa: E402


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conjunctive-AND BM25 top-50 on sf0.001 documents."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    return pipeline.bm25_topk(docs, "data join", k=50, round_to=6)


# ---------------------------------------------------------------------
# BM25 oracle SQL (DuckDB) — same analyzer (lowercase + [^a-z0-9_]+
# split), same Lucene BM25 formula, same global-stats discipline.
# ---------------------------------------------------------------------

def _bm25_sql(terms: list[str], k: int = 50) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{SPLIT_PATTERN}')) AS term
  FROM documents
), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM tok2) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok2
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))))
           AS raw_score,
         count(*) AS nt
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 6) AS score
FROM scored WHERE nt = {len(terms)}
ORDER BY raw_score DESC, doc_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------

def _q_bm25_hot(spark, sf_dir):
    return pipeline.bm25_topk(_docs(spark, sf_dir), "join", k=50, round_to=6)


def _q_bm25_conj(spark, sf_dir):
    return pipeline.bm25_topk(_docs(spark, sf_dir), "data join merge",
                              k=50, round_to=6)


def _q_bm25_zero(spark, sf_dir):
    return pipeline.bm25_topk(_docs(spark, sf_dir),
                              "join zzz_not_a_token", k=50, round_to=6)


def _q_term_stats(spark, sf_dir):
    return pipeline.term_stats_df(
        _docs(spark, sf_dir), ["join", "hash", "data", "zzz_missing"]
    ).orderBy("term")


def _q_corpus_stats(spark, sf_dir):
    n, avgdl = pipeline.corpus_stats(_docs(spark, sf_dir))
    return spark.createDataFrame(
        [(n, round(avgdl, 6))], "n_docs long, avgdl double")


def _q_facet_lang(spark, sf_dir):
    return pipeline.facet_counts(_docs(spark, sf_dir), "join merge",
                                 "lang").orderBy("lang")


def _q_dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (d.groupBy(F.md5("text").alias("text_hash"))
            .agg(F.count("*").alias("n_dups"),
                 F.min("doc_id").alias("first_doc"))
            .filter(F.col("n_dups") > 1)
            .orderBy("text_hash"))


def _q_token_count(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), SPLIT_PATTERN),
                        lambda x: x != "")).cast("long").alias("n_tokens"))


def _q_text_quality(spark, sf_dir):
    """Quality-scoring heuristics (training-data pipeline op): length,
    mean token length, stopword ratio."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower("text"), SPLIT_PATTERN),
                    lambda x: x != "")
    n_tok = F.size(toks)
    stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and")))
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(F.length("text") / n_tok, 6).alias("mean_tok_len"),
        F.round(stop / n_tok, 6).alias("stopword_ratio"))


def _q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def _q_topk_orders_per_cust(spark, sf_dir):
    from pyspark.sql import Window as W
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 2)
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.col("rk").cast("long").alias("rk")))


def _q_union_by_name(spark, sf_dir):
    """Union execution semantics (reference augmentation.py:627-764):
    align by column name, missing columns null-filled."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"))
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind"))
    return c.unionByName(s, allowMissingColumns=True)


def _q_interval_overlap_join(spark, sf_dir):
    """Range-overlap candidate scoring (reference search/join.py:150-252):
    query ranges vs candidate coverage ranges, score = overlap length /
    total query coverage, summed per candidate."""
    o = _t(spark, sf_dir, "orders")
    cand = (o.groupBy("o_custkey")
            .agg(F.min("o_totalprice").alias("gte"),
                 F.max("o_totalprice").alias("lte")))
    q = spark.createDataFrame(
        [(0.0, 50000.0), (100000.0, 200000.0)], "q_gte double, q_lte double")
    overlap = (F.least(F.col("lte"), F.col("q_lte"))
               - F.greatest(F.col("gte"), F.col("q_gte")))
    total_q = 50000.0 + 100000.0
    joined = cand.join(
        q, (F.col("q_gte") <= F.col("lte")) & (F.col("q_lte") >= F.col("gte")))
    return (joined.groupBy("o_custkey")
            .agg(F.round(F.sum(overlap / F.lit(total_q)), 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("o_custkey")).limit(100))


def _q_embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k similarity search (training-data op):
    neighbors of vec_id=0, JVM-side vector math via zip_with/aggregate."""
    e = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    qvec = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"))
    j = e.crossJoin(F.broadcast(qvec)).filter(F.col("vec_id") != 0)
    dot = F.aggregate(F.zip_with("embedding", "qe", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    sim = dot / (norm(F.col("embedding")) * norm(F.col("qe")))
    return (j.select("vec_id", F.round(sim, 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(20))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk_hot": _q_bm25_hot,
        "bm25_topk_conjunctive": _q_bm25_conj,
        "bm25_zero_hits": _q_bm25_zero,
        "term_stats": _q_term_stats,
        "corpus_doc_stats": _q_corpus_stats,
        "facet_lang": _q_facet_lang,
        "dedup_exact": _q_dedup_exact,
        "token_count": _q_token_count,
        "text_quality": _q_text_quality,
        "tpch_q1": _q_tpch_q1,
        "topk_orders_per_cust": _q_topk_orders_per_cust,
        "union_by_name": _q_union_by_name,
        "interval_overlap_join": _q_interval_overlap_join,
        "embedding_cosine_topk": _q_embedding_cosine_topk,
    }


_TOK2 = (f"SELECT doc_id, unnest(regexp_split_to_array(lower(text), "
         f"'{SPLIT_PATTERN}')) AS term FROM documents")


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk_hot": _bm25_sql(["join"]),
        "bm25_topk_conjunctive": _bm25_sql(["data", "join", "merge"]),
        "bm25_zero_hits": _bm25_sql(["join", "zzz_not_a_token"]),
        "term_stats": f"""
            WITH tok2 AS (SELECT * FROM ({_TOK2}) WHERE term <> ''),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
                   WHERE term IN ('join','hash','data','zzz_missing')
                   GROUP BY doc_id, term)
            SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf
            GROUP BY term ORDER BY term""",
        "corpus_doc_stats": f"""
            WITH tok2 AS (SELECT * FROM ({_TOK2}) WHERE term <> '')
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   round((SELECT count(*) FROM tok2) * 1.0
                         / (SELECT count(*) FROM documents), 6) AS avgdl""",
        "facet_lang": f"""
            WITH tok2 AS (SELECT * FROM ({_TOK2}) WHERE term <> ''),
            hits AS (
              SELECT doc_id FROM (
                SELECT doc_id, count(DISTINCT term) nt FROM tok2
                WHERE term IN ('join','merge') GROUP BY doc_id)
              WHERE nt = 2)
            SELECT lang, count(*) AS n FROM documents
            WHERE doc_id IN (SELECT doc_id FROM hits)
            GROUP BY lang ORDER BY lang""",
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_dups,
                   min(doc_id) AS first_doc
            FROM documents GROUP BY md5(text) HAVING count(*) > 1
            ORDER BY text_hash""",
        "token_count": f"""
            WITH tok2 AS (SELECT * FROM ({_TOK2}) WHERE term <> ''),
            c AS (SELECT doc_id, count(*) AS n FROM tok2 GROUP BY doc_id)
            SELECT d.doc_id, coalesce(c.n, 0) AS n_tokens
            FROM documents d LEFT JOIN c USING (doc_id)""",
        "text_quality": f"""
            WITH tok2 AS (SELECT * FROM ({_TOK2}) WHERE term <> ''),
            c AS (SELECT doc_id, count(*) AS n,
                         sum(CASE WHEN term IN ('the','a','of','and')
                             THEN 1 ELSE 0 END) AS stop
                  FROM tok2 GROUP BY doc_id)
            SELECT d.doc_id, c.n AS n_tokens,
                   round(length(d.text) * 1.0 / c.n, 6) AS mean_tok_len,
                   round(c.stop * 1.0 / c.n, 6) AS stopword_ratio
            FROM documents d JOIN c USING (doc_id)""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "topk_orders_per_cust": """
            SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders) WHERE rk <= 2""",
        "union_by_name": """
            SELECT c_name AS name, c_acctbal AS acctbal,
                   'customer' AS kind FROM customer
            UNION ALL
            SELECT s_name AS name, NULL AS acctbal,
                   'supplier' AS kind FROM supplier""",
        "interval_overlap_join": """
            WITH cand AS (
              SELECT o_custkey, min(o_totalprice) AS gte,
                     max(o_totalprice) AS lte FROM orders
              GROUP BY o_custkey),
            q AS (SELECT * FROM (VALUES (0.0, 50000.0),
                                        (100000.0, 200000.0)) t(q_gte, q_lte)),
            j AS (SELECT cand.o_custkey,
                         (least(lte, q_lte) - greatest(gte, q_gte))
                           / 150000.0 AS part
                  FROM cand JOIN q ON q_gte <= lte AND q_lte >= gte)
            SELECT o_custkey, round(sum(part), 6) AS score FROM j
            GROUP BY o_custkey ORDER BY sum(part) DESC, o_custkey LIMIT 100""",
        "embedding_cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qe), 6)
                     AS cos_sim
            FROM embeddings, q WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(embedding::DOUBLE[], qe) DESC,
                     vec_id
            LIMIT 20""",
    }
