"""Deterministic sampling / mixing operators for training-data
pipelines.

Both operators key every decision off ``md5(key)`` — no RNG, no seed
plumbing, no partition-order sensitivity: the SAME row gets the SAME
decision on any cluster size, after any repartition, and in any
engine that has md5 (the DuckDB correctness oracle re-derives the
exact row set).  This is the property training-data mixing actually
needs (re-runs must not resample) and what Spark's ``df.sample``
cannot give across engines.

The uniform variate is the first 8 hex chars of md5 compared
LEXICOGRAPHICALLY against a hex threshold: for weight w the
threshold is ``format(floor(w * 16^8), '08x')``, so
P(keep) = floor(w*2^32)/2^32 exactly — a <=2^-32 quantization,
documented.  Weights >= 1.0 use the sentinel 'g' (greater than every
hex digit), keeping all rows.

Scale shape: pure scan-level expressions (md5 + substring + string
compare, whole-stage codegen); the per-stratum weight table rides a
broadcast join.  No shuffle, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hex_threshold(w: float) -> str:
    """8-hex-char lexicographic cutoff for P(keep) = w (exact to
    2^-32); 'g' keeps everything, '' (empty) keeps nothing."""
    if w >= 1.0:
        return "g"
    if w <= 0.0:
        return ""
    return format(int(w * (1 << 32)), "08x")


def _u8(key_col: str):
    """The 8-hex-char uniform variate of a row key."""
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)


def weighted_sample(df: DataFrame, weights: dict[str, float],
                    key_col: str = "doc_id",
                    stratum_col: str = "source",
                    default_weight: float = 0.0) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling — the
    source-mixing step of a training-data pipeline (e.g. 'keep 100%
    of wiki, 30% of common-crawl').  A row survives iff
    md5(key)[:8] < threshold(weights[stratum]); strata missing from
    ``weights`` use ``default_weight``.

    Returns the input rows that survive (schema unchanged).
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, _hex_threshold(w)) for s, w in sorted(weights.items())],
        f"{stratum_col} string, _thr string")
    out = (df.join(F.broadcast(wdf), stratum_col, "left")
           .withColumn("_thr", F.coalesce(
               F.col("_thr"), F.lit(_hex_threshold(default_weight))))
           .filter(_u8(key_col) < F.col("_thr"))
           .drop("_thr"))
    return out


def deterministic_split(df: DataFrame, fractions: dict[str, float],
                        key_col: str = "doc_id",
                        split_col: str = "split") -> DataFrame:
    """Hash-range train/val/test assignment: the [0,1) interval is
    cut into consecutive spans in the given dict order (insertion
    order preserved); a row joins the span containing its
    md5(key)[:8] variate.  Fractions must sum to ~1 (rows past the
    last cumulative threshold — possible only through rounding —
    fall into the LAST split).

    Adds ``split_col``; no rows are dropped.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions sum to {total}, expected ~1.0")
    u = _u8(key_col)
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = u < F.lit(_hex_threshold(cum))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def domain_mixture_sample(df: DataFrame, target: dict[str, float],
                          domain_col: str = "source",
                          key_col: str = "doc_id") -> DataFrame:
    """Resample a corpus to a TARGET domain mixture by downsampling
    only (the data-mixing step of LLM training pipelines: "make the
    corpus 50% wiki / 30% code / 20% web").

    The largest feasible corpus honoring the mixture keeps
    ``T = min_d(n_d / p_d)`` total rows, so domain ``d`` keeps
    ``rate_d = T * p_d / n_d`` of its rows — the binding domain keeps
    everything, the rest downsample.  Row selection reuses the
    deterministic md5 discipline of :func:`weighted_sample`
    (re-runs / repartitions / engines all pick the same rows).

    The per-domain count table is collected driver-side — bounded by
    the domain cardinality (a handful to thousands), never by rows.
    Domains outside ``target`` are dropped; a target domain with no
    rows raises (the mixture is unsatisfiable)."""
    if not target:
        raise ValueError("target mixture must be non-empty")
    tot = sum(target.values())
    if not 0.999 <= tot <= 1.001:
        raise ValueError(f"target mixture sums to {tot}, expected ~1")
    counts = {r[0]: r[1] for r in
              (df.where(F.col(domain_col).isin(list(target)))
               .groupBy(domain_col).count().collect())}
    missing = [d for d, p in target.items()
               if p > 0 and not counts.get(d)]
    if missing:
        raise ValueError(
            f"target domains with no rows: {sorted(missing)}")
    T = min(counts[d] / p for d, p in target.items() if p > 0)
    weights = {d: (T * p / counts[d] if p > 0 else 0.0)
               for d, p in target.items()}
    return weighted_sample(df, weights, key_col=key_col,
                           stratum_col=domain_col, default_weight=0.0)
