"""BPE trainer/encoder: determinism, merge order, reference parity."""

import pytest

from auctus_spark.operators.bpe import (END, bpe_encode, encode_word,
                                        train_bpe)


def _ref_train(word_freq: dict, n: int):
    """Independent naive reference (Sennrich alg. 1)."""
    vocab = {tuple(w) + (END,): c for w, c in word_freq.items()}
    merges = []
    for _ in range(n):
        pc = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = \
                    pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        top = max(pc.values())
        pair = min(p for p, c in pc.items() if c == top)
        merges.append(pair)

        def merge(sym):
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            return tuple(out)
        vocab = {merge(s): c for s, c in vocab.items()}
    return merges


def test_train_bpe_matches_reference(spark):
    rows = [(1, "low low low lower lower newest newest newest"),
            (2, "newest widest widest low")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=8)
    freq = {"low": 4, "lower": 2, "newest": 4, "widest": 2}
    assert merges == _ref_train(freq, 8)
    # determinism
    assert merges == train_bpe(df, n_merges=8)


def test_encode_word_applies_rank_order():
    # lowest rank wins each step: (e,s) -> es, then (es,t) -> est,
    # then (est,</w>) is unknown so the loop stops
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("t", END): 2}
    assert encode_word("est", ranks) == ["est", END]
    # without the (es,t) merge, (t,</w>) fires instead
    ranks2 = {("e", "s"): 0, ("t", END): 1}
    assert encode_word("est", ranks2) == ["es", "t" + END]
    # unknown word stays at char level + END
    assert encode_word("zz", {}) == ["z", "z", END]


def test_bpe_encode_distributed(spark):
    rows = [(1, "low low"), (2, "lowest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=4)
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(df, merges).collect()}
    # every doc's tokens reconstruct its words
    joined = "".join(got[1]).replace(END, " ").strip()
    assert joined == "low low"
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert got[2] == encode_word("lowest", ranks)


def _wp_ref_train(word_freq: dict, n: int):
    """Independent WordPiece reference: likelihood-score merges."""
    vocab = {}
    for w, c in word_freq.items():
        sym = (w[0],) + tuple("##" + ch for ch in w[1:])
        vocab[sym] = vocab.get(sym, 0) + c
    pieces = {s for sym in vocab for s in sym}
    for _ in range(n):
        sc, pc = {}, {}
        for sym, c in vocab.items():
            for s in sym:
                sc[s] = sc.get(s, 0) + c
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = \
                    pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        pair, _ = min(pc.items(),
                      key=lambda kv: (-kv[1] / (sc[kv[0][0]]
                                                * sc[kv[0][1]]),
                                      -kv[1], kv[0]))
        merged = pair[0] + pair[1][2:]
        pieces.add(merged)
        nv = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1
                        and (sym[i], sym[i + 1]) == pair):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return sorted(pieces)


def test_train_wordpiece_matches_reference(spark):
    from auctus_spark.operators.bpe import train_wordpiece
    rows = [(1, "low low low lower lower newest newest newest"),
            (2, "newest widest widest low")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = train_wordpiece(df, n_merges=8)
    freq = {"low": 4, "lower": 2, "newest": 4, "widest": 2}
    assert vocab == _wp_ref_train(freq, 8)
    # likelihood objective != raw-count objective: rare-but-exclusive
    # pairs beat frequent promiscuous ones
    freq2 = {"ab": 10, "ac": 10, "xy": 3}
    df2 = spark.createDataFrame(
        [(1, " ".join(w for w, c in freq2.items() for _ in range(c)))],
        "doc_id long, text string")
    v2 = train_wordpiece(df2, n_merges=1)
    # (x,##y): 3/(3*3) beats (a,##b): 10/(20*10)
    assert "xy" in v2 and "ab" not in v2


def test_wordpiece_tokenize_greedy_longest():
    from auctus_spark.operators.bpe import wordpiece_tokenize
    vocab = {"un", "##aff", "##able", "##a", "##f", "##b", "##l",
             "##e", "u", "##n", "##affable"}
    assert wordpiece_tokenize("unaffable", vocab) == \
        ["un", "##affable"]
    # no piece at a position -> whole word UNK
    assert wordpiece_tokenize("zap", {"z", "##a"}) == ["[UNK]"]


def test_wordpiece_encode_roundtrip(spark):
    from auctus_spark.operators.bpe import (train_wordpiece,
                                            wordpiece_encode)
    rows = [(1, "low lower lowest"), (2, "newest widest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = train_wordpiece(df, n_merges=6)
    got = {r["doc_id"]: r["wp_tokens"]
           for r in wordpiece_encode(df, vocab).collect()}
    for doc_id, text in rows:
        # concatenating pieces per word reconstructs the word stream
        rebuilt = "".join(t[2:] if t.startswith("##") else t
                          for t in got[doc_id])
        assert rebuilt == text.replace(" ", "")
        assert "[UNK]" not in got[doc_id]


def test_unigram_seed_and_viterbi():
    """Seed keeps all chars + top substrings; Viterbi prefers the
    high-probability long piece and tie-breaks deterministically."""
    import math
    from auctus_spark.operators.bpe import (_seed_pieces,
                                            _viterbi_pieces)
    seed = _seed_pieces([("abab", 10), ("ab", 5)], max_piece_len=3,
                        seed_size=4)
    assert {"a", "b"} <= set(seed)
    assert seed["ab"] == 25          # 2 in abab x10 + 1 in ab x5
    logp = {"a": math.log(.1), "b": math.log(.1), "ab": math.log(.4)}
    assert _viterbi_pieces("abab", logp) == ["ab", "ab"]
    # unseen char falls back to the UNK floor, never fails
    assert _viterbi_pieces("azb", logp) == ["a", "z", "b"]


def test_unigram_train_and_roundtrip(spark):
    """Trained model segments with learned pieces; encode round-trips
    (▁ -> space rebuilds the word stream) and is deterministic."""
    from auctus_spark.operators.bpe import (WORD_START, train_unigram,
                                            unigram_encode)
    docs = spark.createDataFrame(
        [(i, "internationalization nation inter nation alization")
         for i in range(8)] + [(100, "xyz")],
        "doc_id long, text string")
    logp = train_unigram(docs, vocab_size=40, n_iters=2)
    assert "nation" in logp           # frequent substring survives
    enc = unigram_encode(docs, logp)
    rows = {r["doc_id"]: r["sp_tokens"] for r in enc.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, toks in rows.items():
        text = texts[did]
        rebuilt = "".join(toks).replace(WORD_START, " ").strip()
        assert rebuilt == " ".join(text.lower().split())
    assert rows[0] == rows[7]         # same text -> same encoding


@pytest.mark.parametrize("seed", [7, 41, 113])
def test_unigram_viterbi_always_roundtrips(seed):
    """Property: _viterbi_pieces reconstructs ANY word exactly (the
    UNK char floor guarantees a path) under a random piece model."""
    import math
    import random
    from auctus_spark.operators.bpe import _viterbi_pieces
    rnd = random.Random(seed)
    pieces = {"".join(rnd.choice("ab") for _ in range(rnd.randint(1, 4)))
              for _ in range(12)}
    logp = {p: math.log(rnd.uniform(0.01, 0.5)) for p in pieces}
    for _ in range(50):
        w = "".join(rnd.choice("abc") for _ in range(rnd.randint(1, 14)))
        ps = _viterbi_pieces(w, logp)
        assert "".join(ps) == w
