"""Distributed BPE tokenizer training + encoding (Sennrich, Haddow,
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units") — the tokenizer-induction step of a training-data pipeline.

Scale design: the WORD-FREQUENCY TABLE is the sufficient statistic
for BPE training — the merge loop never touches the corpus again.
So training is ONE distributed scan (token counts, partial-agg
groupBy) followed by a driver loop over the capped vocabulary
(``max_words`` rows, each a short character sequence), exactly how
published trainers ingest corpora.  Encoding is the distributed part:
an Arrow-batched pandas UDF applies the merge ranks per word with a
per-batch memo — Zipf's law makes the memo hit rate ~99%, so the
per-word merge loop runs only on first sight of each surface form.

Determinism: merge-selection ties break (count desc, pair
lexicographic asc); the vocabulary cap takes (count desc, word asc).
Same corpus → same merge table, bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..analysis import spark_token_runs

END = "</w>"  # word-final marker (Sennrich §3.2)


def _toks(col):
    # regexp_extract_all of the token runs == split on SPLIT_PATTERN +
    # drop empties, with a per-expression cached pattern instead of a
    # per-row Pattern.compile (see analysis.spark_token_runs)
    return spark_token_runs(F.lower(col))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) — one scan, partial-agg groupBy."""
    return (df.select(F.explode(_toks(F.col(text_col)))
                      .alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("count")))


def _pair_counts(vocab: dict[tuple, int]) -> dict[tuple, int]:
    pc: dict[tuple, int] = {}
    for sym, c in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pc[p] = pc.get(p, 0) + c
    return pc


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(sym):
        if (i < len(sym) - 1 and sym[i] == pair[0]
                and sym[i + 1] == pair[1]):
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 100, max_words: int = 50_000
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word-frequency
    table (top ``max_words`` by (count desc, word asc) — the
    documented sampling cap).  Returns the ordered merge list."""
    rows = (word_counts(df, text_col)
            .orderBy(F.desc("count"), F.asc("word"))
            .limit(max_words).collect())
    vocab: dict[tuple, int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (END,)
        vocab[sym] = vocab.get(sym, 0) + int(r["count"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        # deterministic: count desc, pair lexicographic ASC
        top = max(pc.values())
        best_pair = min(p for p, c in pc.items() if c == top)
        merges.append(best_pair)
        vocab = {_merge_word(s, best_pair): c
                 for s, c in vocab.items()}
    return merges


def encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Apply merges to one word, lowest-rank-first (the BPE encode
    loop)."""
    sym = tuple(word) + (END,)
    while len(sym) > 1:
        pairs = [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, pair = min(ranked)
        sym = _merge_word(sym, pair)
    return list(sym)


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id"
               ) -> DataFrame:
    """Encode every document: (id, bpe_tokens array).  Arrow-batched
    pandas UDF over the per-doc word array with a per-batch word →
    encoding memo (Zipf hit rate); the merge table broadcasts inside
    the closure (tiny)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(ws):
            out = []
            for w in ws:
                e = memo.get(w)
                if e is None:
                    e = encode_word(w, ranks)
                    memo[w] = e
                out.extend(e)
            return out
        return words.apply(one)

    return df.select(F.col(id_col),
                     enc(_toks(F.col(text_col))).alias("bpe_tokens"))


# ---------------------------------------------------------------------
# WordPiece (Schuster & Nakajima 2012; the BERT tokenizer) — same
# distributed shape as BPE: the word-frequency table is the sufficient
# statistic (ONE partial-agg scan), the merge loop is driver-side over
# the capped vocabulary, and encoding is the distributed part.
# ---------------------------------------------------------------------

CONT = "##"  # continuation prefix (non-word-initial pieces)


def _wp_symbols(word: str) -> tuple:
    return (word[0],) + tuple(CONT + c for c in word[1:])


def _wp_join(a: str, b: str) -> str:
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def train_wordpiece(df: DataFrame, text_col: str = "text",
                    n_merges: int = 100, max_words: int = 50_000
                    ) -> list[str]:
    """Learn a WordPiece vocabulary: pairs merge by the LIKELIHOOD
    score count(ab) / (count(a)·count(b)) — not raw count like BPE
    (the published WordPiece objective).  Ties break (score desc,
    pair count desc, pair lexicographic asc) — deterministic.
    Returns the vocab: the alphabet (word-initial chars plain,
    continuations ``##``-prefixed) plus every merged piece, sorted."""
    rows = (word_counts(df, text_col)
            .orderBy(F.desc("count"), F.asc("word"))
            .limit(max_words).collect())
    vocab: dict[tuple, int] = {}
    for r in rows:
        sym = _wp_symbols(r["word"])
        vocab[sym] = vocab.get(sym, 0) + int(r["count"])
    pieces = {s for sym in vocab for s in sym}
    for _ in range(n_merges):
        sc: dict[str, int] = {}
        pc: dict[tuple, int] = {}
        for sym, c in vocab.items():
            for s in sym:
                sc[s] = sc.get(s, 0) + c
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best_pair, _ = min(
            pc.items(),
            key=lambda kv: (-kv[1] / (sc[kv[0][0]] * sc[kv[0][1]]),
                            -kv[1], kv[0]))
        merged = _wp_join(*best_pair)
        pieces.add(merged)
        nv: dict[tuple, int] = {}
        for sym, c in vocab.items():
            # (not _merge_word: raw concat would keep the inner ##)
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best_pair[0]
                        and sym[i + 1] == best_pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            ns = tuple(out)
            nv[ns] = nv.get(ns, 0) + c
        vocab = nv
    return sorted(pieces)


def wordpiece_tokenize(word: str, vocab: set[str]) -> list[str]:
    """BERT's greedy longest-match-first runtime: take the longest
    vocab piece at each position (``##``-prefixed past position 0);
    a position with NO matching piece makes the whole word [UNK]."""
    out = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while end > start:
            piece = word[start:end]
            if start > 0:
                piece = CONT + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return ["[UNK]"]
        out.append(cur)
        start = end
    return out


def wordpiece_encode(df: DataFrame, vocab: list[str],
                     text_col: str = "text", id_col: str = "doc_id"
                     ) -> DataFrame:
    """Encode every document with a trained WordPiece vocab:
    (id, wp_tokens).  Arrow-batched pandas UDF, per-batch word memo
    (Zipf hit rate), vocab broadcast in the closure.  A vocab
    trained on the same analyzer output can never emit [UNK]
    (the alphabet covers every char in every position seen at
    training time) — the lossless round-trip the gate checks."""
    vset = set(vocab)

    @F.pandas_udf(ArrayType(StringType()))
    def enc(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(ws):
            out = []
            for w in ws:
                e = memo.get(w)
                if e is None:
                    e = wordpiece_tokenize(w, vset)
                    memo[w] = e
                out.extend(e)
            return out
        return words.apply(one)

    return df.select(F.col(id_col),
                     enc(_toks(F.col(text_col))).alias("wp_tokens"))


# ---------------------------------------------------------------------
# Unigram LM (Kudo 2018, "Subword Regularization"; the SentencePiece
# unigram trainer) — the third tokenizer family, same distributed
# shape: the word-frequency table is the sufficient statistic (ONE
# partial-agg scan), training is a driver loop over the capped
# vocabulary, encoding is the distributed part.  Divergences from the
# reference trainer, documented: hard (Viterbi) EM instead of
# forward-backward soft EM, and count-rank pruning instead of
# likelihood-loss pruning — both keep the pipeline a pure function of
# the corpus with exact tie-breaks.
# ---------------------------------------------------------------------

WORD_START = "▁"  # SentencePiece's ▁ word-boundary marker
_UNK_LOGP = -100.0     # unseen single char at encode time


def _seed_pieces(words: list[tuple[str, int]], max_piece_len: int = 8,
                 seed_size: int = 2000) -> dict[str, int]:
    """Seed vocabulary: every substring up to ``max_piece_len`` scored
    by total corpus occurrences; ALL single characters survive (full
    coverage), plus the top ``seed_size`` multi-char pieces by
    (count desc, piece asc)."""
    counts: dict[str, int] = {}
    for w, c in words:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    multi = sorted((p for p in counts if len(p) > 1),
                   key=lambda p: (-counts[p], p))[:seed_size]
    keep = {p for p in counts if len(p) == 1} | set(multi)
    return {p: counts[p] for p in keep}


def _viterbi_pieces(word: str, logp: dict[str, float],
                    max_piece_len: int = 8) -> list[str]:
    """Best segmentation by (Σ log p desc, n_pieces asc, pieces asc)
    — exact deterministic tie-breaks; unseen single chars fall back
    to ``_UNK_LOGP`` (the byte-fallback analog)."""
    n = len(word)
    # best[i] = (score, ntok, pieces tuple) for word[:i]
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_piece_len), i):
            b = best[j]
            if b is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) > 1:
                    continue
                lp = _UNK_LOGP
            c = (b[0] + lp, b[1] + 1, b[2] + (piece,))
            if (cand is None or c[0] > cand[0]
                    or (c[0] == cand[0]
                        and (c[1], c[2]) < (cand[1], cand[2]))):
                cand = c
        best[i] = cand
    assert best[n] is not None
    return list(best[n][2])


def train_unigram(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 300, n_iters: int = 2,
                  max_piece_len: int = 8, seed_size: int = 2000,
                  max_words: int = 50_000) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary: seed with frequent
    substrings, run ``n_iters`` Viterbi-EM rounds (E: best
    segmentation per word from the word-frequency table; M: piece
    log-probs from the expected counts), pruning after each M-step to
    all single chars + the top multi-char pieces by (count desc,
    piece asc) within ``vocab_size``.  Returns piece → log prob."""
    import math
    rows = (word_counts(df, text_col)
            .orderBy(F.desc("count"), F.asc("word"))
            .limit(max_words).collect())
    words = [(r["word"], int(r["count"])) for r in rows]
    seed = _seed_pieces(words, max_piece_len, seed_size)
    total = float(sum(seed.values()))
    logp = {p: math.log(c / total) for p, c in seed.items()}
    chars = {p for p in seed if len(p) == 1}
    for _ in range(n_iters):
        cnt: dict[str, int] = {}
        for w, c in words:
            for p in _viterbi_pieces(w, logp, max_piece_len):
                cnt[p] = cnt.get(p, 0) + c
        n_multi = max(0, vocab_size - len(chars))
        multi = sorted((p for p in cnt if len(p) > 1),
                       key=lambda p: (-cnt[p], p))[:n_multi]
        kept = chars | set(multi)
        sm = {p: max(cnt.get(p, 0), 1) for p in kept}  # char floor
        total = float(sum(sm.values()))
        logp = {p: math.log(c / total) for p, c in sm.items()}
    return logp


def unigram_encode(df: DataFrame, logp: dict[str, float],
                   text_col: str = "text", id_col: str = "doc_id",
                   max_piece_len: int = 8) -> DataFrame:
    """Encode every document with the unigram model: (id,
    sp_tokens array), word-initial pieces carrying the ▁ marker
    (SentencePiece surface form — ``▁→space`` rebuilds the word
    stream, the round-trip oracle).  Arrow-batched pandas UDF with a
    per-batch word memo, model broadcast in the closure."""
    lp = dict(logp)
    ml = int(max_piece_len)

    @F.pandas_udf(ArrayType(StringType()))
    def enc(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(ws):
            out = []
            for w in ws:
                e = memo.get(w)
                if e is None:
                    ps = _viterbi_pieces(w, lp, ml)
                    e = [WORD_START + ps[0]] + ps[1:]
                    memo[w] = e
                out.extend(e)
            return out
        return words.apply(one)

    return df.select(F.col(id_col),
                     enc(_toks(F.col(text_col))).alias("sp_tokens"))
