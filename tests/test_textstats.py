"""Text analysis: language ID, quality scoring, token counts,
fingerprints (incl. winnowing invariances)."""

import pytest

from auctus_spark.operators.textstats import (
    bpe_ish_token_count,
    content_fingerprint,
    language_id,
    quality_score,
    token_count,
    winnowing_fingerprints,
)


def test_token_count(spark):
    df = spark.createDataFrame([(1, "Hello, world! foo_bar")],
                               "doc_id long, text string")
    assert token_count(df).collect()[0]["n_tokens"] == 3


def test_bpeish_count(spark):
    df = spark.createDataFrame([(1, "foo.bar(x)+1")],
                               "doc_id long, text string")
    # foo . bar ( x )+ 1 → alternating alnum/punct runs
    assert bpe_ish_token_count(df).collect()[0]["n_bpeish"] == 7


def test_language_id(spark):
    rows = [(1, "the cat and the dog is in the house"),
            (2, "el perro y la casa de los gatos en un pueblo"),
            (3, "der hund und die katze ist von den bergen"),
            (4, "xyzzy qwerty 12345")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got[1] == "en" and got[2] == "es" and got[3] == "de"
    assert got[4] == "unknown"


def test_quality_score(spark):
    rows = [(1, "a good clean document with many normal english words "
                "that should easily pass every quality filter we have"),
            (2, "!!! ??? *** $$$ %%%"),
            (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in quality_score(df).collect()}
    assert got[1]["quality_keep"] is True
    assert got[2]["quality_keep"] is False  # no alpha, no tokens
    assert got[3]["quality_keep"] is False  # too short
    assert got[1]["stopword_ratio"] > 0


def test_content_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string")
    fps = {r.doc_id: r.fingerprint
           for r in content_fingerprint(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_winnowing(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    shifted = "prefix words here " + base  # shared suffix → shared prints
    other = "totally unrelated words " * 5
    df = spark.createDataFrame(
        [(1, base), (2, shifted), (3, other)], "doc_id long, text string")
    fp = winnowing_fingerprints(df)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    overlap_near = len(by_doc[1] & by_doc[2]) / len(by_doc[1])
    overlap_far = len(by_doc[1] & by_doc.get(3, set())) / len(by_doc[1])
    assert overlap_near > 0.5
    assert overlap_far == 0.0
    # position-robust: identical doc → identical fingerprint set
    df2 = spark.createDataFrame([(9, base)], "doc_id long, text string")
    fp2 = {r.fingerprint for r in winnowing_fingerprints(df2).collect()}
    assert fp2 == by_doc[1]


def _winnow_reference(pdf, k, window):
    """Per-doc reference (the round-2 implementation, kept verbatim as
    the parity oracle for the batch-vectorized _winnow_batch)."""
    import hashlib
    import re

    import numpy as np
    B_, M = np.uint64(1_000_003), np.uint64((1 << 61) - 1)
    out = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
        th = np.array(
            [int.from_bytes(hashlib.md5(w.encode()).digest()[:7], "big")
             for w in toks], dtype=np.uint64)
        if len(th) < k:
            continue
        acc = np.zeros(len(th) - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = (acc * B_ + th[j:j + len(acc)]) % M
        if len(acc) <= window:
            sel = {int(acc.min())}
        else:
            wins = np.lib.stride_tricks.sliding_window_view(acc, window)
            sel = set(wins.min(axis=1).astype(np.int64).tolist())
        out[int(doc_id)] = sel
    return out


def test_winnowing_vectorized_parity():
    """The batch-vectorized winnowing (no per-doc Python loop) is
    fingerprint-identical to the per-doc reference, across edge cases:
    empty docs, docs shorter than k, n_h == window boundary, trailing
    empty doc, punctuation-only doc."""
    import random

    import pandas as pd

    from auctus_spark.operators.textstats import _winnow_batch
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(60):
        n = rng.choice([0, 1, 3, 5, 6, 8, 9, 20, 80])
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows += [(100, ""), (101, "..!!,,"), (102, "one two three four five"),
             (103, "a b c d e f g h"), (104, "")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    for k, w in [(5, 4), (3, 4), (1, 2), (2, 1)]:
        got = _winnow_batch(pdf, k, w)
        got_by = {}
        for d, f in zip(got["doc_id"], got["fingerprint"]):
            got_by.setdefault(int(d), set()).add(int(f))
        want = _winnow_reference(pdf, k, w)
        assert got_by == want, (k, w)


def test_gopher_rules(spark):
    """Published Gopher rule battery: each rule trips on a crafted
    violator and passes on a clean doc."""
    from auctus_spark.operators.textstats import gopher_rules
    clean = ("the quick brown fox jumps over the lazy dog and then "
             "walks to town with that friendly cat of ours to have "
             "a rest by the river bank where they sit and talk about "
             "things that matter most to animals of every kind here "
             "during every single sunny day now")  # >=50 words, clean
    docs = [
        (0, clean),
        (1, "too short to pass the word count"),            # word count
        (2, " ".join(["a"] * 60)),                          # mean len <3
        (3, " ".join(["####likethis"] * 60)),               # symbols
        (4, "\n".join(["- bullet line here ok"] * 10)),     # bullets
        (5, " ".join(["12345"] * 30 + ["the to of and"])),  # alpha
        (6, " ".join(["zorp"] * 60)),                       # stopwords
    ]
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(
        spark.createDataFrame(docs, "doc_id long, text string"))
        .collect()}
    assert out[0]["gopher_keep"] is True
    assert out[1]["r_word_count"] is False
    assert out[2]["r_mean_word_len"] is False
    assert out[3]["r_symbol_ratio"] is False
    assert out[4]["r_bullet_lines"] is False
    assert out[5]["r_alpha_words"] is False
    assert out[6]["r_stopwords"] is False
    for d in range(1, 7):
        assert out[d]["gopher_keep"] is False, d


def test_gopher_symbol_ratio_independent(spark):
    """Rae et al. 2021 App. A tests hash/words and ellipsis/words
    against 0.1 EACH (not their sum), and U+2026 counts as an
    ellipsis.  100 words with 6 hashes and 6 '...' → each ratio 0.06,
    keep; 100 words with 11 U+2026 → ellipsis ratio 0.11, drop."""
    from auctus_spark.operators.textstats import gopher_rules
    base = ["the", "be", "to", "of", "and", "that", "have", "with"]
    words = (base * 13)[:94]                     # 94 clean words
    both_ok = " ".join(words + ["#"] * 3 + ["..."] * 3)   # 100 words
    # hash 3/100=0.03, ellipsis 3/100=0.03; combined-sum would be
    # 0.06 <= 0.1 too, so also add the 0.06+0.06 case:
    w88 = (base * 11)[:88]
    sum_over = " ".join(w88 + ["#"] * 6 + ["..."] * 6)    # 100 words
    uni_over = " ".join((base * 12)[:89] + ["…"] * 11)    # 100 words
    uni_end = "\n".join(["line one ends here…"] * 5
                        + ["clean line of text"] * 5)
    docs = [(0, both_ok), (1, sum_over), (2, uni_over), (3, uni_end)]
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(
        spark.createDataFrame(docs, "doc_id long, text string"))
        .collect()}
    assert out[0]["r_symbol_ratio"] is True
    # 0.06 hash + 0.06 ellipsis: each ratio passes independently
    assert out[1]["r_symbol_ratio"] is True
    assert out[2]["r_symbol_ratio"] is False      # U+2026 counted
    assert out[3]["r_ellipsis_lines"] is False    # 50% end with …


def test_gopher_repetition(spark):
    """Repetition half of the Gopher battery: duplicate-line fractions
    and top n-gram char fractions with the published thresholds."""
    from auctus_spark.operators.textstats import gopher_repetition
    clean = " ".join(f"w{i:03d}" for i in range(120))   # all distinct
    docs = [
        (0, clean + "\n" + " ".join(f"x{i}" for i in range(60))),
        (1, "same line\n" * 8 + "one different line here"),  # dups
        (2, ("spam spam " * 40) + clean),               # top 2-gram
        (3, ""),                                        # empty
    ]
    out = {r.doc_id: r for r in gopher_repetition(
        spark.createDataFrame(docs, "doc_id long, text string"))
        .collect()}
    assert out[0].rep_keep is True
    assert out[0].dup_line_frac == 0.0
    assert out[1].dup_line_frac > 0.30 and out[1].rep_keep is False
    assert out[1].dup_line_char_frac > 0.20
    assert out[2].top_2gram_char_frac > 0.20 and out[2].rep_keep is False
    assert out[3].rep_keep is True                      # nothing repeats
    # paragraph duplicates (blank-line-separated blocks)
    from auctus_spark.operators.textstats import gopher_repetition as gr
    pdoc = [(7, "para one is here\n\npara one is here\n\n"
                "para one is here\n\nunique closing paragraph")]
    r7 = gr(spark.createDataFrame(
        pdoc, "doc_id long, text string")).collect()[0]
    assert r7.dup_para_frac == pytest.approx(1 - 2 / 4)
    assert r7.dup_para_char_frac > 0.20 and r7.rep_keep is False
    # exact formula check on doc 1's duplicate lines: 9 lines, 2
    # distinct → dup_line_frac = 1 - 2/9
    assert out[1].dup_line_frac == 1 - 2 / 9


def test_c4_rules(spark):
    """C4 line + page rules: terminal-punct >=5-word lines kept,
    <3-sentence / lorem-ipsum / curly-brace pages dropped."""
    from auctus_spark.operators.textstats import c4_rules
    good = ("This is a perfectly normal first sentence here.\n"
            "And here is another good long sentence for you.\n"
            "Finally a third complete sentence ends the page.")
    docs = [
        (0, good),
        (1, "short line\nno punct here at all\nok?"),   # lines dropped
        (2, good + "\nAlso some lorem ipsum filler text."),
        (3, good + "\nfunction() { return 1; }"),
        (4, "One single sentence is simply not enough here."),
    ]
    out = {r.doc_id: r for r in c4_rules(
        spark.createDataFrame(docs, "doc_id long, text string"))
        .collect()}
    assert out[0].c4_keep is True and out[0].n_kept_lines == 3
    assert out[1].n_kept_lines == 0 and out[1].c4_keep is False
    assert out[2].has_lorem is True and out[2].c4_keep is False
    assert out[3].has_brace is True and out[3].c4_keep is False
    assert out[4].n_sentences == 1 and out[4].c4_keep is False
    # line filter really strips: clean_text keeps only good lines
    assert out[1].clean_text == ""


def test_gopher_dup_ngrams(spark):
    """Duplicate n-gram char fractions: union-of-positions semantics
    (overlaps never double-count), published thresholds."""
    from auctus_spark.operators.textstats import gopher_dup_ngrams
    clean = " ".join(f"w{i:03d}" for i in range(80))    # no repeats
    # "a b c d e" ×3 separated by unique words → the 5-gram repeats;
    # its occurrences cover exactly 15 of the words
    rep = " ".join(["a b c d e", "u1 u2", "a b c d e", "u3 u4",
                    "a b c d e"])
    docs = [(0, clean), (1, rep), (2, "")]
    out = {r.doc_id: r for r in gopher_dup_ngrams(
        spark.createDataFrame(docs, "doc_id long, text string"))
        .collect()}
    assert out[0].dup_5gram_char_frac == 0.0
    assert out[0].dup_ngram_keep is True
    # rep doc: 15 covered single-char words / (15 + 4*2) chars
    assert out[1].dup_5gram_char_frac == pytest.approx(15 / 23)
    assert out[1].dup_ngram_keep is False
    assert out[2].dup_ngram_keep is True
    # union semantics: consecutive repeats "x x x x x x x" — the
    # 5-gram "x x x x x" occurs 3 times overlapping, covering ALL 7
    # positions exactly once
    over = spark.createDataFrame([(9, " ".join(["x"] * 7))],
                                 "doc_id long, text string")
    r9 = gopher_dup_ngrams(over).collect()[0]
    assert r9.dup_5gram_char_frac == pytest.approx(1.0)


def test_pii_redact(spark):
    """Planted PII: per-category counts + exact redacted text; docs
    without PII pass through untouched with zero counts."""
    from auctus_spark.operators.textstats import pii_redact
    rows = [
        (1, "write to alice.smith+x@mail-host.co.uk or bob@ex.io now"),
        (2, "server at 10.0.0.1 and 192.168.255.3, call 555-123-4567"),
        (3, "clean text with numbers 123 and dots... 1.2 only"),
        (4, "mixed a@b.com 8.8.8.8 999.888.7777"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pii_redact(df).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (2, 0, 0)
    assert out[1].redacted == "write to <EMAIL> or <EMAIL> now"
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 2, 1)
    assert out[2].redacted == "server at <IP> and <IP>, call <PHONE>"
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 0)
    assert out[3].redacted == rows[2][1]
    assert out[4].redacted == "mixed <EMAIL> <IP> <PHONE>"


def test_unigram_logprob(spark):
    """Hand-computed 2-doc corpus: p(t) = (c+1)/(T+V); rare tokens
    score higher (more surprising) than common ones."""
    import math

    from auctus_spark.operators.textstats import unigram_logprob
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string")
    # counts: a=3, b=1, c=1; T=5, V=3 -> denom 8
    p = {"a": 4 / 8, "b": 2 / 8, "c": 2 / 8}
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    want1 = (-math.log(p["a"]) - math.log(p["a"]) - math.log(p["b"])) / 3
    want2 = (-math.log(p["a"]) - math.log(p["c"])) / 2
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2
    assert abs(out[1].mean_neg_logprob - want1) < 1e-12
    assert abs(out[2].mean_neg_logprob - want2) < 1e-12
    assert out[2].mean_neg_logprob > out[1].mean_neg_logprob * 0 \
        and out[1].mean_neg_logprob < out[2].mean_neg_logprob


def test_unigram_logprob_broadcast_and_salt_paths(spark):
    """Round-7 skew fix: at gate scale the vocab table broadcasts
    (BroadcastHashJoin, no shuffle of the exploded token stream on
    _tok); above the threshold the top-K hot tokens still broadcast
    and only the cold tail shuffle-joins — and both paths produce
    identical results."""
    from auctus_spark.operators.textstats import unigram_logprob
    df = spark.createDataFrame(
        [(i, ("the the the import " if i % 2 else "zz qq ")
          + f"tok{i} tok{i % 7}") for i in range(40)],
        "doc_id long, text string")

    bcast = unigram_logprob(df)
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    salted = unigram_logprob(df, broadcast_vocab_max=2, hot_k=3)
    plan2 = salted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2    # the hot-token side
    a = {r.doc_id: (r.n_tokens, round(r.mean_neg_logprob, 12))
         for r in bcast.collect()}
    b = {r.doc_id: (r.n_tokens, round(r.mean_neg_logprob, 12))
         for r in salted.collect()}
    assert a == b and len(a) == 40


def test_tfidf_keywords_closed_form(spark):
    """tf·idf keyword ranking on a 3-doc fixture: a term in every doc
    gets near-zero idf and never beats a rare term; rank ties break
    term asc; exactly k rows per doc."""
    import math
    from auctus_spark.operators.textstats import tfidf_keywords
    docs = spark.createDataFrame(
        [(0, "common rare_a common common"),
         (1, "common rare_b rare_b"),
         (2, "common zeta alpha")],
        "doc_id long, text string")
    out = tfidf_keywords(docs, k=2).collect()
    per = {}
    for r in out:
        per.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["score"]))
    assert [t for _, t, _ in sorted(per[0])] == ["rare_a", "common"]
    assert [t for _, t, _ in sorted(per[1])] == ["rare_b", "common"]
    # doc 2: alpha and zeta tie on score (df=1, tf=1) -> term asc
    assert [t for _, t, _ in sorted(per[2])] == ["alpha", "zeta"]
    idf1 = math.log(1 + (3 - 1 + 0.5) / 1.5)
    assert sorted(per[1])[0][2] == round(2 * idf1, 6)
    assert all(len(v) == 2 for v in per.values())
