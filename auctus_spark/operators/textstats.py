"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All deterministic, expression-first (SQL-oracle-able); the winnowing
fingerprint uses numpy inside mapInPandas (rolling hash has no
built-in).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import SPLIT_PATTERN

# deterministic marker-word profiles (tiny stand-in for fastText-style
# langid; the container has no language models, so ID is a transparent
# stopword-overlap heuristic over the same analyzer tokens)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "ist", "von", "den", "mit", "für",
           "ein"),
    "zh": ("de", "shi", "le", "wo", "ni", "ta", "men", "zai", "you", "he"),
}


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), SPLIT_PATTERN),
                    lambda x: x != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens",
                         F.size(_tokens(text_col)).cast("long"))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token count: word tokens + digit runs + punctuation
    runs each count (a cheap proxy for BPE token budgets)."""
    pieces = F.filter(
        F.split(F.col(text_col),
                r"(?<=[a-zA-Z0-9])(?=[^a-zA-Z0-9])"
                r"|(?<=[^a-zA-Z0-9])(?=[a-zA-Z0-9])|\s+"),
        lambda x: x != "")
    return df.withColumn("n_bpeish", F.size(pieces).cast("long"))


def language_id(df: DataFrame, text_col: str = "text",
                markers: dict[str, tuple[str, ...]] | None = None
                ) -> DataFrame:
    """Marker-word-overlap language ID: per language, the fraction of
    tokens in its marker list; argmax wins (ties → language name asc).
    Pure conditional aggregation per row — no shuffle, no UDF."""
    markers = markers or LANG_MARKERS
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))

    def _marker_pred(words):
        # NB: a 2-arg lambda would make F.filter pass (element, index)
        return lambda x: x.isin(*words)

    scores = [
        (F.size(F.filter(toks, _marker_pred(words))) / n)
        .alias(f"score_{lang}")
        for lang, words in markers.items()]
    scored = df.select("*", *scores)
    langs = sorted(markers)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pick = None
    for lg in reversed(langs):
        cond = F.when(F.col(f"score_{lg}") == best, F.lit(lg))
        pick = cond.otherwise(pick) if pick is not None else cond
    return (scored.withColumn("lang_pred",
                              F.when(best <= 0, F.lit("unknown"))
                              .otherwise(pick))
            .drop(*[f"score_{lg}" for lg in langs]))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristics (Gopher/C4-style filters, but
    deterministic and engine-portable):

    - n_tokens, mean token length
    - alpha ratio (alnum chars / chars)
    - stopword ratio (English markers)
    - max single-token dominance (repetition signal)
    - quality_keep: the boolean filter a pipeline would apply
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1))
    alpha = (F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9]", ""))
             / F.greatest(F.length(text_col), F.lit(1)))
    stop = F.size(F.filter(
        toks, lambda x: x.isin(*LANG_MARKERS["en"]))) / n1
    mean_len = (F.aggregate(toks, F.lit(0),
                            lambda acc, x: acc + F.length(x)) / n1)
    out = df.withColumn("n_tokens", n.cast("long")) \
            .withColumn("alpha_ratio", alpha) \
            .withColumn("stopword_ratio", stop) \
            .withColumn("mean_token_len", mean_len)
    keep = ((F.col("n_tokens") >= 10)
            & (F.col("alpha_ratio") >= 0.6)
            & (F.col("mean_token_len") >= 2)
            & (F.col("mean_token_len") <= 12))
    return out.withColumn("quality_keep", keep)


def content_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whole-document fingerprint: md5 of the normalized token stream
    (case/punct/whitespace-insensitive exact dup detector)."""
    norm = F.concat_ws(" ", _tokens(text_col))
    return df.withColumn("fingerprint", F.md5(norm))


def winnowing_fingerprints(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 5,
                           window: int = 4) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): rolling hash over
    k-gram token windows, keep the minimum hash of each sliding window
    (rightmost on ties) — a position-robust fingerprint set for
    near-dup / plagiarism-style matching.

    numpy per Arrow batch inside mapInPandas; output
    (doc_id, fingerprint) distinct.
    """
    B_, M = np.uint64(1_000_003), np.uint64((1 << 61) - 1)

    def fp(batches):
        # token hashing at VOCABULARY granularity: Arrow tokenize +
        # dictionary_encode per batch, one md5 per DISTINCT token, then
        # codes map through the (small) hash table — no per-token
        # Python in the hot path (the rolling hash and window-min stay
        # numpy per doc)
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc
        for pdf in batches:
            content = pa.array(pdf["text"].tolist(), type=pa.string())
            toks = pc.split_pattern_regex(pc.utf8_lower(content),
                                          "[^a-z0-9_]+")
            flat = pc.list_flatten(toks)
            lens = np.diff(toks.offsets.to_numpy().astype(np.int64))
            enc = pc.dictionary_encode(flat)
            codes = enc.indices.to_numpy()
            doc_local = np.repeat(np.arange(len(pdf), dtype=np.int64),
                                  lens)
            vocab = enc.dictionary.to_numpy(zero_copy_only=False)
            vh = np.array(
                [int.from_bytes(hashlib.md5(w.encode()).digest()[:7],
                                "big") for w in vocab],
                dtype=np.uint64)
            empty = np.nonzero(vocab == "")[0]
            if empty.size:
                keep = codes != empty[0]
                codes, doc_local = codes[keep], doc_local[keep]
            th_all = vh[codes]
            dl = np.bincount(doc_local, minlength=len(pdf))
            bounds = np.concatenate([[0], np.cumsum(dl)])
            doc_ids_np = pdf["doc_id"].to_numpy()
            ids, fps = [], []
            for i in range(len(pdf)):
                th = th_all[bounds[i]:bounds[i + 1]]
                if len(th) < k:
                    continue
                # k-gram polynomial rolling hash
                acc = np.zeros(len(th) - k + 1, dtype=np.uint64)
                for j in range(k):
                    acc = (acc * B_ + th[j:j + len(acc)]) % M
                h = acc
                if len(h) <= window:
                    sel = {int(h.min())}
                else:
                    wins = np.lib.stride_tricks.sliding_window_view(
                        h, window)
                    sel = set(wins.min(axis=1).astype(np.int64).tolist())
                ids.extend([int(doc_ids_np[i])] * len(sel))
                fps.extend(sorted(sel))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype=np.int64),
                                "fingerprint": pd.Series(fps,
                                                         dtype=np.int64)})

    sel = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"))
    return sel.mapInPandas(fp, schema="doc_id long, fingerprint long") \
        .distinct()
