"""Document chunking / sequence packing for training-data pipelines.

Chunking slices long documents into bounded-token windows (the
context-length prep step before tokenization); packing assigns short
documents to fixed-budget training sequences (GPT-style concatenate-
and-split, at whole-document granularity).  Both are deterministic
pure-DataFrame transforms with exact SQL equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analysis import spark_token_runs


def _toks(text_col: str):
    # token runs == split + drop-empties, cached regex (analysis.py)
    return spark_token_runs(F.lower(F.col(text_col)))


def chunk_documents(df: DataFrame, size: int, stride: int | None = None,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into token windows of ``size`` tokens
    every ``stride`` tokens (``stride=size`` -> disjoint chunks;
    ``stride<size`` -> overlapping, the RAG-embedding convention).
    Chunk i covers token positions [i*stride, i*stride+size); the
    final partial window is kept (standard convention — no token is
    dropped), and windows that start past the end are not emitted.

    Returns (id, chunk_id, n_tokens, chunk_text) with chunk_text
    rebuilt space-joined from the ANALYZED tokens (lowercased — the
    chunker's unit is the token, not the raw byte span; documented).

    Scale shape: one posexplode (linear in corpus tokens — each token
    lands in ceil(size/stride) chunks), one groupBy(doc, chunk)
    rebuild via array_sort.  No windows, no driver state."""
    if size <= 0:
        raise ValueError("size must be positive")
    stride = size if stride is None else stride
    if not 0 < stride <= size:
        raise ValueError("stride must be in (0, size]")
    ex = df.select(F.col(id_col).alias("_id"),
                   F.posexplode(_toks(text_col)).alias("_pos", "_tok"))
    # token at _pos belongs to chunks i with
    # max(0, ceil((_pos-size+1)/stride)) <= i <= _pos div stride
    lo = F.greatest(
        F.lit(0),
        F.ceil((F.col("_pos") - F.lit(size - 1))
               / F.lit(float(stride))).cast("long"))
    hi = F.expr(f"_pos div {stride}")
    ex = ex.select(
        "_id", "_pos", "_tok",
        F.explode(F.sequence(lo, hi)).alias("chunk_id"))
    return (ex.groupBy("_id", "chunk_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("_pos", "_tok"))),
                     lambda s: s["_tok"])).alias("chunk_text"))
            .select(F.col("_id").alias(id_col),
                    F.col("chunk_id").cast("long").alias("chunk_id"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    "chunk_text"))


def pack_documents(df: DataFrame, budget: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Whole-document sequence packing: within each ``group_col``
    stream, documents are laid out in ``id_col`` order and cut into
    ``budget``-token sequences — a document's sequence is the one its
    START offset falls in (``floor((cumsum - n)/budget)``), the
    doc-level approximation of GPT-style concatenate-and-split
    (documents are never split here; a doc longer than the budget
    owns its start sequence — chunk first with
    :func:`chunk_documents` if hard caps are required).

    Returns (id, group, n_tokens, seq_id).  Scale shape: token counts
    are a scan expression; the running offset is a window cumsum
    PARTITIONED BY the group column — per-group streams (source,
    shard, date) keep every partition bounded; packing one global
    stream on a cluster would serialize, and is deliberately not
    offered."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (Window.partitionBy(group_col).orderBy(F.asc(id_col))
         .rowsBetween(Window.unboundedPreceding, 0))
    d = df.select(F.col(id_col), F.col(group_col),
                  F.size(_toks(text_col)).cast("long").alias("n_tokens"))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (d.withColumn("_start", start)
            .select(id_col, group_col, "n_tokens",
                    F.expr(f"_start div {budget}").alias("seq_id")))
