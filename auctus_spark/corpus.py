"""Deterministic synthetic source-code corpus.

BASELINE.json input_hint mandates the engine's input shape:
``(repo:string, path:string, commit:string, lang:string, content:string)``
— an Iceberg/parquet table of source-code files.  No external data is
allowed, so this module synthesizes it, seeded and byte-identical across
regenerations (the per-row invariant is ``sha256(content)``).

FIXTURES.md §A properties implemented here:
- Zipfian vocabulary mixing hot keywords (``import``, ``def``,
  ``return``, ``the``) with long-tail camelCase/snake_case identifiers —
  at least one term lands in >30% of documents (hot/skew path) and many
  terms have df=1 (tail path).
- log-normal-ish token counts in [50, 5000] (scaled down via
  ``min_tokens``/``max_tokens`` for unit tests).
- duplicate ``content`` across ≥2 rows (tie-break testing: equal scores
  → docID-ascending).
- docID assignment deterministic given table order (dense 0..n-1).

Generation is numpy-vectorized; at real scale the same routine runs
per-partition inside ``mapInPandas`` over a ``spark.range(n)`` seed frame
(see :func:`corpus_dataframe`), so synthesis itself scales to arbitrary
row counts without a driver bottleneck.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["python", "java", "go", "js", "c"]
LANG_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}
LANG_WEIGHTS = np.array([0.4, 0.25, 0.15, 0.12, 0.08])

HOT_KEYWORDS = ["import", "def", "return", "the", "for", "if", "class",
                "self", "value", "data"]

_CAMEL_PARTS = ["get", "set", "parse", "build", "handle", "read", "write",
                "merge", "split", "index", "query", "token", "score",
                "batch", "stream", "cache", "node", "list", "map", "util"]


def _vocab(size: int) -> np.ndarray:
    """Deterministic vocabulary: hot keywords first, then generated
    snake_case and camelCase identifiers (exercising identifier-split
    tokenization, cf. reference core.py:100-123)."""
    words: list[str] = list(HOT_KEYWORDS)
    rng = np.random.Generator(np.random.PCG64(7))
    parts = np.array(_CAMEL_PARTS)
    while len(words) < size:
        i = len(words)
        a, b_, c = parts[rng.integers(0, len(parts), 3)]
        if i % 3 == 0:
            words.append(f"{a}_{b_}_{i}")
        elif i % 3 == 1:
            words.append(f"{a}{b_.capitalize()}{i}")
        else:
            words.append(f"{a}{c.capitalize()}")
    return np.array(words[:size], dtype=object)


def generate_corpus(
    n_docs: int,
    seed: int = 89,  # reference profiler sample seed, core.py:33
    vocab_size: int = 20_000,
    min_tokens: int = 50,
    max_tokens: int = 5_000,
    start_doc_id: int = 0,
    dup_every: int = 97,
) -> pd.DataFrame:
    """Generate ``n_docs`` rows of the code_files table as pandas.

    Deterministic in (seed, start_doc_id): row ``i`` depends only on the
    global doc_id ``start_doc_id + i``, so partitioned generation
    (different ``start_doc_id`` chunks) concatenates to the exact same
    corpus as one-shot generation.
    """
    ids = np.arange(start_doc_id, start_doc_id + n_docs, dtype=np.int64)
    vocab = _vocab(vocab_size)

    out_repo = np.empty(n_docs, dtype=object)
    out_path = np.empty(n_docs, dtype=object)
    out_commit = np.empty(n_docs, dtype=object)
    out_lang = np.empty(n_docs, dtype=object)
    out_content = np.empty(n_docs, dtype=object)

    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    zipf_p = 1.0 / ranks**1.07
    zipf_p /= zipf_p.sum()
    zipf_cdf = np.cumsum(zipf_p)
    lang_cdf = np.cumsum(LANG_WEIGHTS)

    def _content_and_lang(doc_id: int) -> tuple[str, str]:
        """Pure function of doc_id — partition-invariant generation."""
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + doc_id))
        # log-normal token count clipped to [min_tokens, max_tokens]
        n_tok = int(np.clip(np.exp(rng.normal(5.3, 0.8)), min_tokens, max_tokens))
        tok_idx = np.searchsorted(zipf_cdf, rng.random(n_tok))
        toks = vocab[np.minimum(tok_idx, vocab_size - 1)]
        # guarantee df=1 tail terms: every 11th doc gets a unique token
        if doc_id % 11 == 0:
            toks = np.append(toks, f"uniq_token_{doc_id}")
        lang = LANGS[int(np.searchsorted(lang_cdf, rng.random()))]
        return " ".join(toks.tolist()), lang

    for j, doc_id in enumerate(ids):
        d = int(doc_id)
        content, lang = _content_and_lang(d)
        # duplicate content across >=2 rows: doc d copies doc d-1's
        # content whenever d % dup_every == 1 — equal BM25 scores except
        # for length norm ties, exercising docID-ascending tie-break.
        if d % dup_every == 1 and d > 0:
            content, _ = _content_and_lang(d - 1)
        out_content[j] = content
        out_lang[j] = lang
        out_repo[j] = f"org{d % 20}/proj{(d // 20) % 50}"
        out_path[j] = f"src/module_{d % 37}/file_{d}.{LANG_EXT[lang]}"

    for j, doc_id in enumerate(ids):
        h = hashlib.sha1(
            f"{out_repo[j]}|{out_path[j]}|{doc_id}".encode()).hexdigest()
        out_commit[j] = (h + h)[:40]

    return pd.DataFrame({
        "doc_id": ids,
        "repo": out_repo,
        "path": out_path,
        "commit": out_commit,
        "lang": out_lang,
        "content": out_content,
    })


def content_sha256(content: pd.Series) -> pd.Series:
    """Per-row invariant vs the reference corpus (BASELINE.json)."""
    return content.map(lambda s: hashlib.sha256(s.encode()).hexdigest())


CORPUS_SCHEMA = ("doc_id long, repo string, path string, commit string, "
                 "lang string, content string")


def corpus_dataframe(spark, n_docs: int, seed: int = 89,
                     partitions: int = 32, **kw):
    """Distributed corpus synthesis: ``spark.range`` drives per-partition
    ``mapInPandas`` generation.  Because row i depends only on doc_id i,
    the result is identical to driver-side generation at any
    parallelism — this is the scalable path for bench runs."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids from spark.range are contiguous per batch slice
            yield generate_corpus(
                len(ids), seed=seed, start_doc_id=int(ids[0]), **kw)

    rng_df = spark.range(0, n_docs, 1, partitions)
    return rng_df.mapInPandas(gen, schema=CORPUS_SCHEMA)
