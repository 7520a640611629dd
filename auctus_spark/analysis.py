"""Analyzer chain — THE tokenization contract.

One tokenizer, three consumers: the pure-Python oracle scorer, the Spark
index builder (vectorized pandas ops inside ``mapInPandas``), and any
SQL oracle (DuckDB ``regexp_split_to_array`` with the same pattern).

Mirrors the reference's index-time analyzer — ES ``standard`` tokenizer +
``lowercase`` filter (``coordinator/coordinator/elasticsearch.yml:6-15``) —
restricted to ASCII word characters so it is exactly expressible as one
regex in Python, pandas, Spark SQL and DuckDB alike.  The optional
identifier expansion mirrors Auctus's attribute-keyword split
(``lib_profiler/datamart_profiler/core.py:100-123``: split on punctuation,
camelCase and letter/digit boundaries), which is the right analyzer for
source-code identifiers.

Stemming: the reference stems English at index time
(``elasticsearch.yml:15``).  We keep the analyzer stem-free by default
(code corpus; rank-identity contract must match the oracle, which shares
this module), per SURVEY.md §7 hard-part (4).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import numpy as np
import pandas as pd

# Token = maximal run of [A-Za-z0-9_], ASCII-lowercased.  ASCII-lower
# (not unicode .lower()) is the contract: the engine tokenizes with
# Arrow's ascii_lower, and exotic case mappings (e.g. Kelvin sign →
# 'k') must not diverge between oracle and engine.  Non-ASCII is
# always a delimiter under either lowering, so the two agree given
# this rule.  Keep in sync with SPLIT_PATTERN (Spark SQL / DuckDB
# oracles, applied to already-lowercased text).
TOKEN_PATTERN = r"[A-Za-z0-9_]+"
SPLIT_PATTERN = r"[^a-z0-9_]+"
# JVM-side (Spark SQL) form of the same contract, applied AFTER
# lowering: maximal runs of token chars.
JVM_TOKEN_PATTERN = r"[a-z0-9_]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)
_ASCII_LOWER = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                             "abcdefghijklmnopqrstuvwxyz")

# camelCase / letter-digit boundary splitter for identifier expansion
# (reference core.py:100-123 splits "camelCase", "snake_case", "a2b").
_IDENT_RE = re.compile(
    r"[a-z]+(?![A-Z0-9])|[a-z]+|[A-Z][a-z]*|[0-9]+",
)


def tokenize(text: str, stem: bool = False) -> list[str]:
    """ASCII-lowercase + split; the contract shared with the oracle
    scorer and the Arrow-native index builder.  ``stem=True`` adds the
    Porter2 English stemmer (the reference stems every indexed field —
    ``elasticsearch.yml:15``)."""
    toks = _TOKEN_RE.findall(text.translate(_ASCII_LOWER))
    if stem:
        from .stem import stem as _stem
        toks = [_stem(t) for t in toks]
    return toks


def spark_token_runs(col):
    """JVM-side tokenizer over ALREADY-LOWERCASED text: one
    ``regexp_extract_all(col, '[a-z0-9_]+', 0)``.

    Provably identical token arrays to the historical
    ``filter(split(col, SPLIT_PATTERN), x -> x != '')`` form: splitting
    on maximal runs of non-token chars and dropping empties yields
    exactly the maximal runs of token chars, which is what the positive
    extract returns (both are [] for all-delimiter or empty input, and
    null-propagate identically).

    Why it replaces split+filter in every hot path (guide §1.2
    per-task work): Spark's ``StringSplit`` routes through
    ``UTF8String.split`` -> ``java.lang.String.split``, which
    Pattern.compiles the regex ON EVERY ROW (the single-char fastpath
    cannot apply to a character class), and the surrounding
    higher-order ``filter`` forces the whole expression down the
    interpreted-eval path.  Measured on this host (sf1.0 documents,
    50k docs, local[32]): 2.9s -> 0.27s for a 32-task tokenize stage,
    and the pathological anti-scaling of concurrent per-row
    Pattern.compile (thread-dump: all 32 tasks inside
    ``Pattern$CharPredicate``) disappears — ``RegExpExtractAll``
    caches its compiled pattern per expression instance."""
    from pyspark.sql import functions as F
    return F.regexp_extract_all(col, F.lit(JVM_TOKEN_PATTERN), F.lit(0))


def expand_identifier(name: str) -> list[str]:
    """Split an identifier into sub-tokens: snake_case, camelCase,
    letter/digit boundaries.  ``getHTTPResponse2`` -> [get, HTTP,
    Response, 2] (lowercased).  Reference: core.py:100-123."""
    parts: list[str] = []
    for chunk in re.split(r"[^0-9a-zA-Z]+", name):
        if not chunk:
            continue
        # split camelCase incl. acronym runs and digit boundaries
        for m in re.finditer(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+", chunk):
            parts.append(m.group(0).lower())
    return parts


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized (pandas C-path) tokenization of a string Series.

    Returns a Series of token lists.  This is the hot-path form used
    inside ``mapInPandas`` — no per-row Python in the Spark plan.
    """
    return texts.str.translate(_ASCII_LOWER).str.findall(TOKEN_PATTERN)


def doc_lengths(token_lists: pd.Series) -> pd.Series:
    return token_lists.map(len).astype(np.int64)


def term_frequencies(doc_ids: pd.Series, token_lists: pd.Series) -> pd.DataFrame:
    """Explode token lists to (doc_id, term, tf) via pandas groupby —
    vectorized counting for a whole Arrow batch at once."""
    ex = pd.DataFrame(
        {"doc_id": doc_ids.to_numpy().repeat(token_lists.map(len).to_numpy()),
         "term": np.concatenate(token_lists.to_numpy()) if len(token_lists) else
         np.array([], dtype=object)}
    )
    if ex.empty:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "tf": pd.Series([], dtype=np.int64)})
    tf = (
        ex.groupby(["term", "doc_id"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    tf["doc_id"] = tf["doc_id"].astype(np.int64)
    tf["tf"] = tf["tf"].astype(np.int64)
    return tf


def load_synonyms(path: str) -> dict[str, list[str]]:
    """Parse an Elasticsearch-style synonym file (the reference ships
    ``docker/synonyms.txt`` — comma-separated equivalence groups, ``#``
    comments; applied at SEARCH time only, elasticsearch.yml:16-24).

    Returns a symmetric expansion map: every token in a group expands
    to the whole group."""
    groups: dict[str, list[str]] = {}
    with open(path, errors="replace") as fp:
        for line in fp:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "=>" in line:  # explicit mapping form: lhs => rhs
                lhs, rhs = line.split("=>", 1)
                sources = [tokenize(x)[0] for x in lhs.split(",")
                           if tokenize(x)]
                targets = [t for x in rhs.split(",") for t in tokenize(x)]
                for s in sources:
                    groups.setdefault(s, []).extend(targets)
                continue
            words = [tokenize(w)[0] for w in line.split(",") if tokenize(w)]
            for w in words:
                groups.setdefault(w, []).extend(
                    x for x in words if x != w)
    return groups


def analyze_query(query: str,
                  synonyms: dict[str, Iterable[str]] | None = None,
                  stem: bool = False) -> list[str]:
    """Search-time analyzer: same chain, plus optional synonym expansion
    (reference applies ``synonym_graph`` only at search time,
    ``elasticsearch.yml:16-24``).  Returns unique terms, first-seen order
    (conjunctive AND semantics make duplicates irrelevant).  Synonyms
    match on surface forms; with ``stem=True`` every emitted term is
    then stemmed (ES analyzer order: synonym_graph before stemmer)."""
    seen: dict[str, None] = {}
    for tok in tokenize(query):
        seen.setdefault(tok, None)
        if synonyms and tok in synonyms:
            for syn in synonyms[tok]:
                seen.setdefault(syn, None)
    if stem:
        from .stem import stem as _stem
        out: dict[str, None] = {}
        for t in seen:
            out.setdefault(_stem(t), None)
        return list(out)
    return list(seen)


_HTML_TAG_RE = re.compile(r"<[^>]+>")
_HTML_LINK_RE = re.compile(r"<a\s[^>]*href=[\"']?([^\"' >]+)[\"']?[^>]*>",
                           re.IGNORECASE)
_HTML_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
                  "&#39;": "'", "&nbsp;": " "}


def strip_html(text: str) -> str:
    """HTML removal for description fields (reference
    ``lib_core/datamart_core/common.py:296-336``: link/tag/entity
    removal before indexing).  Links are replaced by their href so the
    URL tokens remain searchable."""
    out = _HTML_LINK_RE.sub(r" \1 ", text)
    out = _HTML_TAG_RE.sub(" ", out)
    for ent, ch in _HTML_ENTITIES.items():
        out = out.replace(ent, ch)
    return re.sub(r"\s+", " ", out).strip()
