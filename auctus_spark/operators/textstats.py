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

from ..analysis import spark_token_runs

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
    # token runs == split on SPLIT_PATTERN + drop empties; cached
    # regex instead of per-row Pattern.compile (analysis.py)
    return spark_token_runs(F.lower(F.col(text_col)))


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


def _winnow_batch(pdf: pd.DataFrame, k: int, window: int
                  ) -> pd.DataFrame:
    """Winnowing over ONE Arrow batch, fully vectorized ACROSS docs —
    no per-doc Python loop (the round-2 implementation looped
    ``for i in range(len(pdf))``, which capped throughput on
    many-small-docs corpora).

    Token hashing is at VOCABULARY granularity (dictionary_encode,
    one md5 per distinct token).  The k-gram rolling hash is computed
    once over the FLAT token-hash array (each output position only
    reads th[j..j+k), so per-position values are bit-identical to the
    per-doc computation); positions whose k-gram crosses a doc
    boundary are garbage and masked by construction: doc i's valid
    hash positions are [bounds[i], bounds[i]+n_h_i).  Window minima
    are a single gather over a sliding_window_view; docs with
    n_h <= window take their segment minimum via
    ``np.minimum.reduceat`` (garbage slots carry a +inf sentinel, so
    the segment reduce ignores them)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    B_, M = np.uint64(1_000_003), np.uint64((1 << 61) - 1)
    SENT = np.uint64(0xFFFFFFFFFFFFFFFF)  # > any value mod M
    out_empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "fingerprint": pd.Series([], dtype=np.int64)})
    if not len(pdf):
        return out_empty
    content = pa.array(pdf["text"].tolist(), type=pa.string())
    toks = pc.split_pattern_regex(pc.utf8_lower(content),
                                  "[^a-z0-9_]+")
    flat = pc.list_flatten(toks)
    lens = np.diff(toks.offsets.to_numpy().astype(np.int64))
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy()
    doc_local = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
    vocab = enc.dictionary.to_numpy(zero_copy_only=False)
    vh = np.array(
        [int.from_bytes(hashlib.md5(w.encode()).digest()[:7], "big")
         for w in vocab],
        dtype=np.uint64)
    empty = np.nonzero(vocab == "")[0]
    if empty.size:
        keep = codes != empty[0]
        codes, doc_local = codes[keep], doc_local[keep]
    th_all = vh[codes]
    dl = np.bincount(doc_local, minlength=len(pdf))
    bounds = np.concatenate([[0], np.cumsum(dl)])
    doc_ids_np = pdf["doc_id"].to_numpy()

    L = th_all.size
    if L < k:
        return out_empty
    m = L - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):  # k tiny; each step is full-batch numpy
        acc = (acc * B_ + th_all[j:j + m]) % M
    # pad garbage tail positions (cross-boundary k-grams live INSIDE
    # acc too, but no doc's valid range [bounds[i], bounds[i]+n_h_i)
    # ever indexes them)
    # one extra SENT slot so reduceat can take starts == L (trailing
    # zero-token docs) without clipping into a neighbour's segment
    acc_pad = np.concatenate(
        [acc, np.full(L - m + 1, SENT, dtype=np.uint64)])
    n_h = np.maximum(dl - (k - 1), 0)       # valid hash count per doc
    h_start = bounds[:-1]
    # cross-boundary k-grams (positions [bounds[i]+n_h_i, bounds[i+1])
    # for every doc) are garbage acc values — overwrite with SENT so
    # the segment reduce below can never pick them
    delta = np.zeros(acc_pad.size + 1, dtype=np.int64)
    np.add.at(delta, h_start + n_h, 1)
    np.add.at(delta, bounds[1:], -1)
    invalid = np.cumsum(delta[:-1]) > 0
    acc_pad[invalid] = SENT

    ids_parts, fp_parts = [], []
    small = (n_h > 0) & (n_h <= window)
    if small.any():
        # segment min via reduceat: [bounds[i], bounds[i+1]) — the
        # garbage tail inside each segment is SENT, never the min
        mins = np.minimum.reduceat(acc_pad, h_start)
        ids_parts.append(doc_ids_np[small].astype(np.int64))
        fp_parts.append(mins[small].astype(np.int64))
    big = n_h > window
    if big.any():
        nw = (n_h[big] - window + 1).astype(np.int64)
        total = int(nw.sum())
        base = np.repeat(h_start[big], nw)
        csum = np.concatenate([[0], np.cumsum(nw)])[:-1]
        intra = np.arange(total, dtype=np.int64) - np.repeat(csum, nw)
        wpos = base + intra
        wins = np.lib.stride_tricks.sliding_window_view(acc_pad, window)
        wmins = wins[wpos].min(axis=1)
        ids_parts.append(np.repeat(doc_ids_np[big].astype(np.int64),
                                   nw))
        fp_parts.append(wmins.astype(np.int64))
    if not ids_parts:
        return out_empty
    ids_all = np.concatenate(ids_parts)
    fps_all = np.concatenate(fp_parts)
    # per-doc distinct (the old set(); global .distinct() still runs
    # downstream, this just shrinks the Arrow transfer)
    order = np.lexsort((fps_all, ids_all))
    ids_all, fps_all = ids_all[order], fps_all[order]
    keep = np.ones(ids_all.size, dtype=bool)
    keep[1:] = (ids_all[1:] != ids_all[:-1]) | \
               (fps_all[1:] != fps_all[:-1])
    return pd.DataFrame({"doc_id": ids_all[keep],
                         "fingerprint": fps_all[keep]})


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
    def fp(batches):
        for pdf in batches:
            yield _winnow_batch(pdf, k, window)

    sel = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"))
    return sel.mapInPandas(fp, schema="doc_id long, fingerprint long") \
        .distinct()


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", Appendix A — the published document-quality filter
# battery used by large-scale training-data pipelines).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule flags, all JVM-side expressions in ONE
    scan (no UDFs):

    - ``r_word_count``: 50 <= words <= 100,000
    - ``r_mean_word_len``: mean word length in [3, 10]
    - ``r_symbol_ratio``: BOTH #'#' chars / words <= 0.1 AND
      ellipsis occurrences ('...' or U+2026) / words <= 0.1 — the
      paper tests each symbol's ratio separately ("for either the
      hash symbol or the ellipsis"), not their sum
    - ``r_bullet_lines``: <= 90% of lines start with a bullet
    - ``r_ellipsis_lines``: <= 30% of lines end with '...' or U+2026
    - ``r_alpha_words``: >= 80% of words contain a letter
    - ``r_stopwords``: >= 2 distinct Gopher stop words present
    - ``gopher_keep``: AND of all rules

    Words split on whitespace, lines on newlines — the paper's
    definitions; thresholds are the published ones.
    """
    t = F.col(text_col)
    words = F.regexp_extract_all(t, F.lit(r"\S+"), F.lit(0))
    n_words = F.size(words)
    n_words1 = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = (F.aggregate(words, F.lit(0),
                           lambda acc, x: acc + F.length(x))
               / n_words1)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ellipsis = (((F.length(t)
                    - F.length(F.replace(t, F.lit("..."),
                                         F.lit("")))) / F.lit(3))
                  + (F.length(t)
                     - F.length(F.replace(t, F.lit("…"),
                                          F.lit("")))))
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines1 = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.size(F.filter(
        lines, lambda x: F.trim(x).rlike(r"^[-*•]"))) / n_lines1
    ellipsis_end = F.size(F.filter(
        lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))) / n_lines1
    alpha = F.size(F.filter(
        words, lambda x: x.rlike("[A-Za-z]"))) / n_words1
    stops = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))
    out = (df
           .withColumn("n_words", n_words.cast("long"))
           .withColumn("r_word_count",
                       (n_words >= 50) & (n_words <= 100_000))
           .withColumn("r_mean_word_len",
                       (mean_wl >= 3.0) & (mean_wl <= 10.0))
           .withColumn("r_symbol_ratio",
                       ((n_hash / n_words1) <= 0.1)
                       & ((n_ellipsis / n_words1) <= 0.1))
           .withColumn("r_bullet_lines", bullet <= 0.9)
           .withColumn("r_ellipsis_lines", ellipsis_end <= 0.3)
           .withColumn("r_alpha_words", alpha >= 0.8)
           .withColumn("r_stopwords", stops >= 2))
    keep = (F.col("r_word_count") & F.col("r_mean_word_len")
            & F.col("r_symbol_ratio") & F.col("r_bullet_lines")
            & F.col("r_ellipsis_lines") & F.col("r_alpha_words")
            & F.col("r_stopwords"))
    return out.withColumn("gopher_keep", keep)


# Gopher repetition-filter thresholds (Rae et al. 2021, Appendix A):
# max duplicate-line fraction, duplicate-line CHARACTER fraction, and
# top word-{2,3,4}-gram character fractions.
GOPHER_REP_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
}


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition filters (the other half of the Appendix-A
    battery; :func:`gopher_rules` covers the document-shape rules):

    - ``dup_line_frac``    = 1 − distinct_lines / lines
    - ``dup_line_char_frac`` = 1 − chars_of_distinct_lines /
      chars_of_all_lines (each distinct line's chars counted once)
    - ``dup_para_frac`` / ``dup_para_char_frac`` — the same two over
      PARAGRAPHS (blank-line-separated blocks)
    - ``top_{2,3,4}gram_char_frac`` = occurrences_of_most_frequent
      n-gram × its char length / total word chars

    (the standard public formulation of the paper's fractions; the
    dup-5..10-gram variants live in :func:`gopher_dup_ngrams`).
    ``rep_keep`` ANDs the published thresholds.  Shuffles group by
    (doc, line) / (doc, ngram) — linear, skew-free (keys are
    per-document)."""
    did = F.col(id_col)
    t = F.col(text_col)
    def _dup_stats(split_re: str, tag: str):
        units = (df.select(did.alias("_id"),
                           F.explode(F.split(t, split_re))
                           .alias("u"))
                 .filter(F.trim("u") != ""))
        per = units.groupBy("_id", "u").agg(F.count("*").alias("cnt"))
        return per.groupBy("_id").agg(
            (1.0 - F.count("*") / F.sum("cnt"))
            .alias(f"dup_{tag}_frac"),
            (1.0 - F.sum(F.length("u"))
             / F.sum(F.length("u") * F.col("cnt")))
            .alias(f"dup_{tag}_char_frac"))

    line_stats = _dup_stats("\n", "line")
    para_stats = _dup_stats(r"\n\s*\n", "para")

    words = F.regexp_extract_all(t, F.lit(r"\S+"), F.lit(0))
    base = df.select(did.alias("_id"), words.alias("w"),
                     F.aggregate(words, F.lit(0),
                                 lambda acc, x: acc + F.length(x))
                     .cast("double").alias("wchars"))
    tops = None
    for n in (2, 3, 4):
        ng = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice("w", i + 1, n)))
        grams = (base.filter(F.size("w") >= n)
                 .select("_id", "wchars", F.explode(ng).alias("g"))
                 .groupBy("_id", "wchars", "g")
                 .agg(F.count("*").alias("cnt")))
        # top n-gram per doc: (count desc, gram asc) deterministic
        from pyspark.sql.window import Window
        w = Window.partitionBy("_id").orderBy(F.desc("cnt"), F.asc("g"))
        top = (grams.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1)
               .select("_id",
                       (F.col("cnt")
                        * (F.length("g") - (n - 1))  # gram word chars
                        / F.greatest(F.col("wchars"), F.lit(1.0)))
                       .alias(f"top_{n}gram_char_frac")))
        tops = top if tops is None else tops.join(top, "_id", "left")
    out = (df.select(did.alias("_id"), "*")
           .join(line_stats, "_id", "left")
           .join(para_stats, "_id", "left")
           .join(tops, "_id", "left")
           .drop("_id"))
    for c in ("dup_line_frac", "dup_line_char_frac",
              "dup_para_frac", "dup_para_char_frac"):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    for n in (2, 3, 4):
        c = f"top_{n}gram_char_frac"
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    keep = F.lit(True)
    for c, thr in GOPHER_REP_THRESHOLDS.items():
        keep = keep & (F.col(c) <= thr)
    return out.withColumn("rep_keep", keep)


def c4_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, the public
    subset): line-level — keep only lines that end in terminal
    punctuation (. ! ? ") AND have >= 5 words; page-level — drop
    pages with < 3 sentences after cleaning, or containing
    "lorem ipsum" or a curly brace (the paper's code-page marker).
    The dirty-word list and 3-sentence dedup are out of scope here
    (dedup is first-class elsewhere in this package).

    Adds ``clean_text`` (kept lines re-joined), ``n_kept_lines``,
    ``n_sentences`` (terminal-punct count in clean_text), flag
    columns and ``c4_keep`` — all JVM-side expressions.
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    kept = F.filter(
        lines,
        lambda x: x.rlike(r'[.!?"]\s*$')
        & (F.size(F.regexp_extract_all(x, F.lit(r"\S+"), F.lit(0)))
           >= 5))
    clean = F.concat_ws("\n", kept)
    n_sent = F.length(F.regexp_replace(clean, r"[^.!?]", ""))
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    out = (df.withColumn("clean_text", clean)
           .withColumn("n_kept_lines", F.size(kept).cast("long"))
           .withColumn("n_sentences", n_sent.cast("long"))
           .withColumn("has_lorem", has_lorem)
           .withColumn("has_brace", has_brace))
    keep = ((F.col("n_sentences") >= 3) & ~F.col("has_lorem")
            & ~F.col("has_brace"))
    return out.withColumn("c4_keep", keep)


# duplicate n-gram char-fraction thresholds (Gopher Appendix A):
# fraction of word characters covered by n-grams that occur more
# than once, for n = 5..10.
GOPHER_DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13,
                               8: 0.12, 9: 0.11, 10: 0.10}


def gopher_dup_ngrams(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      ns: tuple = (5, 6, 7, 8, 9, 10)) -> DataFrame:
    """The remaining Gopher repetition rules: for each n in 5..10 the
    fraction of word CHARACTERS covered by duplicated n-grams — the
    UNION of covered word positions, so overlapping occurrences never
    double-count (the paper's semantics; char coverage is measured on
    word characters, separators excluded — documented choice shared
    with :func:`gopher_repetition`'s top-n-gram fractions).

    ONE window pass builds every n-gram length at once (words sorted
    per doc, n-grams via lead()), then one (doc, n, gram) groupBy →
    duplicated keys (count > 1) → explode covered positions →
    distinct → sum covered word lengths.  Every shuffle keys on the
    document — linear, skew-free.  ``dup_ngram_keep`` ANDs the
    published thresholds."""
    from pyspark.sql.window import Window
    did = F.col(id_col)
    words_arr = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"),
                                     F.lit(0))
    base = df.select(did.alias("_id"), words_arr.alias("w"))
    # the exploded word table feeds THREE branches (per-doc char
    # totals, the lead() window, and the coverage join).  Exchange
    # reuse already shares the two same-keyed branches; the
    # checkpoint guarantees ONE tokenize+explode for the third
    # (differently-keyed coverage join) independent of reuse firing
    # (measured neutral at sf0.1, one full scan saved at scale)
    words = (base.select(
        "_id", F.posexplode("w").alias("idx", "word"))
        .localCheckpoint())
    wchars = words.groupBy("_id").agg(
        F.sum(F.length("word")).cast("double").alias("wchars"))
    max_n = max(ns)
    wsort = Window.partitionBy("_id").orderBy("idx")
    leads = [F.col("word")] + [F.lead("word", j).over(wsort)
                               for j in range(1, max_n)]
    with_leads = words.select(
        "_id", F.col("idx").alias("i"),
        *[F.when(leads[n - 1].isNotNull(),
                 F.concat_ws(" ", *leads[:n])).alias(f"_g{n}")
          for n in ns])
    gram_structs = [F.struct(F.lit(n).alias("n"),
                             F.col(f"_g{n}").alias("g")) for n in ns]
    grams = (with_leads
             .select("_id", "i",
                     F.explode(F.array(*gram_structs)).alias("s"))
             .select("_id", "i", F.col("s.n").alias("n"),
                     F.col("s.g").alias("g"))
             .filter(F.col("g").isNotNull()))
    dup = (grams.groupBy("_id", "n", "g")
           .agg(F.count("*").alias("cnt"),
                F.collect_list("i").alias("starts"))
           .filter(F.col("cnt") > 1))
    covered = (dup.select("_id", "n", F.explode("starts").alias("i"))
               .select("_id", "n", F.explode(
                   F.sequence(F.col("i"), F.col("i") + F.col("n") - 1))
                   .alias("idx"))
               .distinct())
    fracs = (covered.join(words, ["_id", "idx"])
             .groupBy("_id", "n")
             .agg(F.sum(F.length("word")).cast("double").alias("_cov"))
             .join(wchars, "_id")
             .groupBy("_id")
             .pivot("n", list(ns))
             .agg(F.first(F.col("_cov")
                          / F.greatest("wchars", F.lit(1.0)))))
    for n in ns:
        fracs = fracs.withColumnRenamed(
            str(n), f"dup_{n}gram_char_frac")
    out = df.join(fracs.withColumnRenamed("_id", id_col),
                  id_col, "left")
    for n in ns:
        c = f"dup_{n}gram_char_frac"
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    keep = F.lit(True)
    for n in ns:
        thr = GOPHER_DUP_NGRAM_THRESHOLDS[n]
        keep = keep & (F.col(f"dup_{n}gram_char_frac") <= thr)
    return out.withColumn("dup_ngram_keep", keep)


# PII patterns chosen inside the Java-regex (Spark) / RE2 (DuckDB
# oracle) COMMON SUBSET: no lookaround, no backreferences.  The
# published LLM-pipeline precedent is the BigScience/ROOTS and
# FineWeb regex redaction stage (emails, IPs, phone-shaped numbers).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def pii_redact(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Regex PII redaction (the ROOTS/FineWeb pipeline stage):
    replaces emails, IPv4 addresses and phone-shaped numbers with
    typed placeholders and counts each category.  Patterns are
    applied IN ``PII_PATTERNS`` ORDER (emails first, so an address's
    user@host never half-matches as a phone).

    Returns (id, n_email, n_ipv4, n_phone, redacted) — counts are
    match counts BEFORE redaction.  Pure scan-level JVM regex
    expressions (regexp_count + chained regexp_replace): one pass,
    whole-stage codegen, no Python.
    """
    c = F.col(text_col)
    counts = [F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
              .alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]
    red = c
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", alpha: float = 1.0,
                    broadcast_vocab_max: int = 2_000_000,
                    hot_k: int = 1024) -> DataFrame:
    """Corpus-LM quality proxy — the unigram analog of CCNet's
    KenLM perplexity filter (Wenzek et al. 2020 §3.3: score each
    document by a language model over a reference corpus; here the
    reference is the corpus itself): p(t) = (c(t) + alpha) /
    (T + alpha*V) with add-alpha smoothing over corpus token counts,
    and each document scores mean(-ln p(t)) over its tokens.  Low =
    typical text, high = gibberish/outlier — threshold or bucket it
    exactly like a perplexity filter.

    Returns (id, n_tokens, mean_neg_logprob).  Scale shape (round-7
    skew fix): the vocabulary count table is persisted and counted
    once; when V <= ``broadcast_vocab_max`` it BROADCASTS onto the
    token stream — no shuffle of the corpus-sized explode at all, so
    Zipf-hot tokens ('the', 'import') can't skew a join they never
    shuffle through.  Above the threshold, the top-``hot_k`` tokens
    by count (which carry the skew — Zipf mass concentrates there)
    still broadcast, and only the heavy cold tail shuffle-joins,
    now with near-uniform keys.  T and V fold in as literals.  The
    final per-doc aggregate shuffles on ``_id`` (unskewed).
    """
    toks = _tokens(text_col)
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(toks).alias("_tok"))
    counts = ex.groupBy("_tok").agg(F.count("*").alias("_c")).persist()
    row = counts.agg(F.sum("_c").alias("_T"),
                     F.count("*").alias("_V")).collect()[0]
    t_total = int(row["_T"] or 0)
    v_size = int(row["_V"])
    nlp = -F.log((F.col("_c") + F.lit(float(alpha)))
                 / F.lit(float(t_total) + float(alpha) * v_size))
    if v_size <= int(broadcast_vocab_max):
        scored = (ex.join(F.broadcast(counts), "_tok")
                  .select("_id", nlp.alias("_nlp")))
    else:
        hot = F.broadcast(
            counts.orderBy(F.desc("_c"), F.asc("_tok"))
            .limit(int(hot_k)))
        cold = counts.join(hot.select("_tok"), "_tok", "left_anti")
        scored = (ex.join(hot, "_tok")
                  .select("_id", nlp.alias("_nlp"))
                  .unionByName(ex.join(cold, "_tok")
                               .select("_id", nlp.alias("_nlp"))))
    return (scored.groupBy("_id")
            .agg(F.count("*").alias("n_tokens"),
                 (F.sum("_nlp") / F.count("*"))
                 .alias("mean_neg_logprob"))
            .select(F.col("_id").alias(id_col), "n_tokens",
                    "mean_neg_logprob"))


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", alpha: float = 1.0,
                   broadcast_max: int = 2_000_000) -> DataFrame:
    """Bigram-LM quality proxy - one Markov order above
    :func:`unigram_logprob` (the CCNet/KenLM perplexity-filter
    analog, conditional form):

        p(w2|w1) = (c(w1 w2) + alpha) / (c1(w1) + alpha * V)

    with add-alpha smoothing, V = unigram vocabulary size, c1 =
    count of w1 as a bigram LEFT context (= token count minus
    doc-final tokens).  Each document scores mean(-ln p) over its
    bigrams; docs with < 2 tokens emit n_bigrams = 0 and a null
    score.

    Scale shape: bigrams come from one zip-with-shift over the token
    array exploded as (left, right) STRUCT keys (no string packing,
    no self-join); the bigram count table broadcasts below
    ``broadcast_max`` distinct bigrams so the corpus-sized explode
    never shuffles on Zipf-hot keys (the unigram operator's skew
    fix, inherited) - the left-context counts derive from the same
    tiny table.  Final per-doc aggregate shuffles on the id
    (unskewed)."""
    toks = _tokens(text_col)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(F.slice(toks, 1, n1), F.slice(toks, 2, n1),
                       lambda a, b: F.struct(a.alias("l"),
                                             b.alias("r")))
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode_outer(pairs).alias("_bg"))
    hits = ex.filter(F.col("_bg").isNotNull())
    counts = (hits.groupBy("_bg").agg(F.count("*").alias("_c"))
              .persist())
    v_size = int(df.select(F.explode(toks).alias("_tok"))
                 .agg(F.count_distinct("_tok").alias("v"))
                 .collect()[0]["v"])
    left = (counts.groupBy(F.col("_bg.l").alias("_l"))
            .agg(F.sum("_c").alias("_cl")))
    n_bigrams = counts.count()
    bcast = n_bigrams <= int(broadcast_max)
    c_tbl = F.broadcast(counts) if bcast else counts
    l_tbl = F.broadcast(left) if bcast else left
    j = (hits.join(c_tbl, "_bg")
         .withColumn("_l", F.col("_bg.l"))
         .join(l_tbl, "_l"))
    nlp = -F.log((F.col("_c") + F.lit(float(alpha)))
                 / (F.col("_cl") + F.lit(float(alpha) * v_size)))
    per = (j.select("_id", nlp.alias("_nlp"))
           .groupBy("_id")
           .agg(F.count("*").alias("n_bigrams"),
                (F.sum("_nlp") / F.count("*"))
                .alias("mean_neg_logprob")))
    ids = df.select(F.col(id_col).alias("_id")).distinct()
    return (ids.join(per, "_id", "left")
            .withColumn("n_bigrams", F.coalesce("n_bigrams",
                                                F.lit(0)))
            .select(F.col("_id").alias(id_col), "n_bigrams",
                    "mean_neg_logprob"))


def tfidf_keywords(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 3,
                   broadcast_df_below: int = 2_000_000) -> DataFrame:
    """Per-document top-``k`` keyword extraction by tf·idf — the term
    selection ES ``more_like_this`` runs over "interesting terms",
    surfaced as a standalone training-data op (doc tagging, dataset
    search keywords).  Weight = tf · ln(1 + (N − df + 0.5)/(df + 0.5))
    — the same Lucene BM25 idf discipline as the rest of the engine —
    ranked per doc by (round(weight, 6) desc, term asc).

    Plan: one tokenize scan → (doc, term, tf) partial-agg shuffle;
    the term→df table (dictionary-sized, tiny next to the corpus)
    broadcasts below ``broadcast_df_below`` terms, else shuffle-joins
    on term; the per-doc top-k is one window shuffle on the doc key.
    No driver-side loops — N is the only collected scalar."""
    toks = docs.select(
        F.col(id_col),
        F.explode(spark_token_runs(F.lower(F.col(text_col))))
        .alias("term"))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_terms = dfreq.count()
    if n_terms <= broadcast_df_below:
        dfreq = F.broadcast(dfreq)
    n = docs.count()
    idf = F.log(1.0 + (F.lit(float(n)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.round(F.col("tf") * idf, 6))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.desc("score"),
                                           F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "term", "score", "rank"))
