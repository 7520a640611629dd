"""Dedup operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding near-dup — with planted duplicates and Python-side Jaccard
verification."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from auctus_spark.operators.dedup import (
    duplicate_groups,
    embedding_near_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    token_shingles,
)

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "cat sleeps near the warm fire in the old house")
NEAR = BASE.replace("lazy", "sleepy")  # 1-token change → high jaccard
FAR = "completely different text about spark query engines and indexes"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, FAR),
            (4, "tiny"), (5, FAR)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 1))}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark, docs):
    kept = exact_dedup(docs, ["text"])
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [0, 2, 3, 4]  # 1 dups 0, 5 dups 3
    groups = duplicate_groups(docs).collect()
    got = {tuple(r.doc_ids) for r in groups}
    assert got == {(0, 1), (3, 5)}


def test_shingles(spark, docs):
    sh = token_shingles(docs.filter("doc_id = 4"), n=3).collect()
    # shorter than n → single truncated shingle
    assert [r.shingle for r in sh] == ["tiny"]


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert pairs[(3, 5)] == pytest.approx(1.0)
    assert pairs[(0, 2)] == pytest.approx(_py_jaccard(BASE, NEAR))
    assert (0, 3) not in pairs


def test_minhash_lsh_pipeline(spark, docs):
    sigs = minhash_signatures(docs, num_perm=64)
    rows = {r.doc_id: tuple(r.sig) for r in sigs.collect()}
    assert rows[0] == rows[1]  # identical text → identical signature
    # near-dup signatures mostly agree
    agree = sum(a == b for a, b in zip(rows[0], rows[2])) / 64
    assert agree > 0.5
    cand = {(r.id_a, r.id_b)
            for r in lsh_candidate_pairs(sigs, 16, 4).collect()}
    assert (0, 1) in cand and (3, 5) in cand and (0, 2) in cand

    verified = {(r.id_a, r.id_b): r.jaccard
                for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert verified[(0, 1)] == pytest.approx(1.0)
    assert verified[(0, 2)] == pytest.approx(_py_jaccard(BASE, NEAR))
    assert all(j >= 0.5 for j in verified.values())


def test_simhash(spark, docs):
    sig = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sig[0] == sig[1]
    ham_near = bin(sig[0] ^ sig[2]).count("1")
    ham_far = bin(sig[0] ^ sig[3]).count("1")
    assert ham_near < ham_far
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_near_pairs(
                 simhash(docs), max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0 and pairs[(3, 5)] == 0


def test_embedding_near_pairs(spark):
    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.normal(size=16)
    rows = [(0, base.tolist()), (1, (base + 0.01).tolist()),
            (2, rng.normal(size=16).tolist()),
            (3, (-base).tolist())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in
           embedding_near_pairs(emb, threshold=0.98).collect()}
    assert (0, 1) in got
    assert (0, 3) not in got


def _exact_pairs(rows, threshold):
    M = np.array([v for _, v in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if S[i, j] >= threshold:
                out.add((rows[i][0], rows[j][0]))
    return out


def test_embedding_near_pairs_recall_borderline(spark):
    """Recall >= 0.95 at threshold 0.95 on BORDERLINE pairs (cos drawn
    in [0.95, 0.97]) — the round-1 single-table version had recall
    ~0.2 here; banding (b bands x r bits, candidate = any band fully
    agrees) fixes it: miss prob = (1 - p^r)^b ~ 2e-6 per pair at
    defaults.  Exact-cosine verify keeps precision 1.0."""
    rng = np.random.Generator(np.random.PCG64(7))
    dim, n_pairs = 32, 60
    rows = []
    vid = 0
    for _ in range(n_pairs):
        a = rng.normal(size=dim)
        a /= np.linalg.norm(a)
        r = rng.normal(size=dim)
        r -= (r @ a) * a
        r /= np.linalg.norm(r)
        c = rng.uniform(0.951, 0.97)
        b = c * a + np.sqrt(1 - c * c) * r
        rows.append((vid, a.tolist())); vid += 1
        rows.append((vid, b.tolist())); vid += 1
    for _ in range(80):  # background vectors, no near pairs
        v = rng.normal(size=dim)
        rows.append((vid, v.tolist())); vid += 1
    want = _exact_pairs(rows, 0.95)
    assert len(want) >= 0.9 * n_pairs  # sanity: fixtures are borderline
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in
           embedding_near_pairs(emb, threshold=0.95).collect()}
    assert got <= want                      # exact verify: no false pos
    recall = len(got & want) / len(want)
    assert recall >= 0.95, recall


def test_lsh_hot_bucket_cap(spark):
    """A degenerate bucket (many identical docs) is dropped by the cap;
    the join completes and other pairs survive."""
    from auctus_spark.operators.dedup import (lsh_candidate_pairs,
                                              minhash_signatures)
    rows = [(i, "the same exact text repeated " * 3) for i in range(50)]
    rows += [(100, "a unique document about spark joins and shuffles"),
             (101, "a unique document about spark joins and shuffles")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs)
    capped = lsh_candidate_pairs(sigs, max_bucket=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got
    assert not any(a < 50 and b < 50 for a, b in got)  # mega-bucket gone
    # default cap is 10_000 — far above this corpus, keeps everything
    full = {(r.id_a, r.id_b)
            for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 1) in full
    # None is the explicit opt-out: identical to the default here
    uncapped = {(r.id_a, r.id_b)
                for r in lsh_candidate_pairs(sigs, max_bucket=None)
                .collect()}
    assert uncapped == full


def test_default_cap_bounds_degenerate_corpus(spark):
    """Web-scale skew guard is ON by default: a corpus that is one
    giant duplicate class (every LSH bucket degenerate) completes in
    bounded time instead of emitting N² ≈ 4·10⁸ pairs in one task.
    Same guard for simhash blocks."""
    from auctus_spark.operators.dedup import (lsh_candidate_pairs,
                                              minhash_signatures, simhash,
                                              simhash_near_pairs)
    n = 20_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate text repeated across the corpus "
              "identical boilerplate text repeated across the corpus")
        .alias("text"))
    sigs = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sigs, max_bucket=1000)
    assert pairs.count() == 0               # mega-bucket dropped, done
    sh = simhash(docs)
    hp = simhash_near_pairs(sh, max_bucket=1000)
    assert hp.count() == 0


def test_containment_pairs_asymmetric(spark):
    """Lazo containment |A∩B|/|A| ranks a small set fully inside a big
    one at 1.0 while symmetric Jaccard stays low — the asymmetric-size
    join-augmentation case (reference join.py:633-662)."""
    from auctus_spark.operators.dedup import (containment_pairs,
                                              ngram_jaccard_pairs)
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"tok{i} filler{i} pad{i}"
                                 for i in range(20))
    docs = spark.createDataFrame(
        [(0, small), (1, big),
         (2, "completely different words entirely here now")],
        "doc_id long, text string")
    got = {(r.id_q, r.id_c): r.containment
           for r in containment_pairs(docs, threshold=0.5).collect()}
    assert got[(0, 1)] == 1.0           # small fully contained in big
    assert (1, 0) not in got            # big barely contained in small
    assert not any(2 in p for p in got)
    # symmetric Jaccard misses the pair entirely at the same threshold
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert not jac
    # high-overlap corpus: LSH candidate source finds the same pairs
    near = spark.createDataFrame(
        [(10, "one two three four five six seven eight nine ten"),
         (11, "one two three four five six seven eight nine eleven"),
         (12, "unrelated content about completely other things here")],
        "doc_id long, text string")
    via_sh = {(r.id_q, r.id_c): round(r.containment, 9)
              for r in containment_pairs(near, threshold=0.5).collect()}
    via_lsh = {(r.id_q, r.id_c): round(r.containment, 9)
               for r in containment_pairs(near, threshold=0.5,
                                          candidates="lsh").collect()}
    assert via_sh == via_lsh and (10, 11) in via_sh


def test_ngram_jaccard_hot_shingle_cap_default(spark):
    """The shingle self-join's skew guard is ON by default: a corpus
    where every doc shares one stop-shingle completes in bounded time
    (hot shingle dropped → 0 candidate keys) instead of emitting df²
    pairs on one join key.  Opting out (max_shingle_df=None) and a
    cap above the df keep exact behavior."""
    from auctus_spark.operators.dedup import ngram_jaccard_pairs
    n = 12_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("shared boiler plate "),
                 F.concat_ws(" ", F.lit("u"), F.col("id").cast("string"),
                             F.lit("v"), F.col("id").cast("string"),
                             F.lit("w"), F.col("id").cast("string")))
        .alias("text"))
    # every doc carries the hot shingles from "shared boiler plate" +
    # unique per-doc shingles → default cap drops the hot ones, the
    # unique ones match nothing: no pairs, bounded work
    assert ngram_jaccard_pairs(docs, threshold=0.1).count() == 0
    # small corpus, cap above df: identical to explicit opt-out
    small = docs.filter(F.col("doc_id") < 30)
    capped = {(r.id_a, r.id_b, round(r.jaccard, 9))
              for r in ngram_jaccard_pairs(small, threshold=0.05)
              .collect()}
    uncapped = {(r.id_a, r.id_b, round(r.jaccard, 9))
                for r in ngram_jaccard_pairs(
                    small, threshold=0.05, max_shingle_df=None).collect()}
    assert capped == uncapped and capped


def test_shingle_cap_surfaced_when_fired(spark, caplog):
    """ADVICE parity: when the df cap actually drops shingles, callers
    get a WARNING log, and the dropped count comes back via the
    ``dropped_out`` out-param (no process-global state, so concurrent
    pipelines can't clobber each other) — capped scores are never
    silent."""
    import logging

    from auctus_spark.operators.dedup import (frequent_shingle_cap,
                                              ngram_jaccard_pairs,
                                              token_shingles)
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("common common common stop phrase here x"),
                 F.col("id").cast("string")).alias("text"))
    with caplog.at_level(logging.WARNING,
                         logger="auctus_spark.operators.dedup"):
        ngram_jaccard_pairs(docs, threshold=0.1,
                            max_shingle_df=30).count()
    assert any("cap fired" in r.message for r in caplog.records)
    # out-param reports the count; no module-global mutable state left
    out = {}
    frequent_shingle_cap(token_shingles(docs), 30,
                         dropped_out=out).count()
    assert out["dropped"] > 0
    assert not hasattr(frequent_shingle_cap, "last_dropped")
    # and stays silent when nothing is dropped
    caplog.clear()
    sh = token_shingles(docs)
    out2 = {}
    with caplog.at_level(logging.WARNING,
                         logger="auctus_spark.operators.dedup"):
        frequent_shingle_cap(sh, 10_000, dropped_out=out2).count()
    assert out2["dropped"] == 0
    assert not any("cap fired" in r.message for r in caplog.records)


# ---------------------------------------------------------------------
# cross-doc span dedup + decontamination
# ---------------------------------------------------------------------

def test_duplicate_spans_planted(spark):
    """Hand-computable corpus: doc 1 repeats doc 0's opening 5-gram;
    doc 2 shares nothing; doc 3 is too short to emit any span."""
    from auctus_spark.operators.dedup import duplicate_spans
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),      # 2 spans
        (1, "alpha beta gamma delta epsilon omega"),     # 2 spans, 1st dup
        (2, "one two three four five six"),              # 2 spans, unique
        (3, "too short"),                                # no span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicate_spans(df, n=5).collect()}
    assert set(out) == {0, 1, 2}          # doc 3 emits nothing
    assert out[0].n_spans == 2 and out[0].n_dup_spans == 0
    # doc 1's window at pos 0 == doc 0's pos-0 window -> 1 duplicate
    assert out[1].n_spans == 2 and out[1].n_dup_spans == 1
    assert out[1].dup_ratio == 0.5
    assert out[2].n_dup_spans == 0


def test_duplicate_spans_within_doc(spark):
    """Self-repetition inside one doc also counts (all-but-first)."""
    from auctus_spark.operators.dedup import duplicate_spans
    df = spark.createDataFrame(
        [(7, "a b c a b c a b c")], "doc_id long, text string")
    out = duplicate_spans(df, n=3).collect()[0]
    # windows: abc bca cab abc bca cab abc -> 7 spans, 4 dups
    assert out.n_spans == 7
    assert out.n_dup_spans == 4


def test_decontaminate_planted(spark):
    from auctus_spark.operators.dedup import decontaminate
    bench = spark.createDataFrame(
        [(100, "the capital of france is paris obviously")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(0, "trivia quiz the capital of france is paris end"),
         (1, "unrelated document about spark partitions"),
         (2, "capital of france is nice in summer")],  # 4-gram? no
        "doc_id long, text string")
    hits = {r.doc_id: r.n_hits
            for r in decontaminate(corpus, bench, n=5).collect()}
    # doc 0 contains 2 of the benchmark's 5-gram windows:
    # "the capital of france is" and "capital of france is paris"
    assert hits == {0: 2}
    # smaller n=4: doc 2's "capital of france is" window now collides
    hits4 = {r.doc_id: r.n_hits
             for r in decontaminate(corpus, bench, n=4).collect()}
    assert 2 in hits4 and 0 in hits4 and 1 not in hits4


def test_decontaminate_counts_distinct_spans_once(spark):
    """A corpus doc repeating the same contaminated n-gram twice still
    counts it once (distinct semantics both sides)."""
    from auctus_spark.operators.dedup import decontaminate
    bench = spark.createDataFrame(
        [(9, "w x y z")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(0, "w x y z and again w x y z")], "doc_id long, text string")
    out = decontaminate(corpus, bench, n=4).collect()
    assert len(out) == 1 and out[0].n_hits == 1


def test_dedup_paragraphs(spark):
    """First-occurrence-wins across docs AND within a doc; fully
    duplicated docs come back emptied, nothing disappears from the
    output; rebuild preserves original paragraph order."""
    from auctus_spark.operators.dedup import dedup_paragraphs
    rows = [
        (1, "alpha\n\nshared para\n\nbeta"),
        (2, "shared para\n\ngamma\n\ngamma"),   # cross-doc + in-doc dup
        (3, "shared para"),                      # fully duplicated
        (4, "  alpha  \n\ndelta"),               # trim-normalized dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_paragraphs(df).collect()}
    assert len(out) == 4
    assert out[1].text_dedup == "alpha\n\nshared para\n\nbeta"
    assert (out[1].n_kept, out[1].n_dropped) == (3, 0)
    assert out[2].text_dedup == "gamma"
    assert (out[2].n_kept, out[2].n_dropped) == (1, 2)
    assert (out[3].n_kept, out[3].text_dedup) == (0, "")
    assert out[4].text_dedup == "delta"


def test_highlight(spark):
    """ES 0-fragments highlighter: whole-word, case-insensitive,
    every occurrence; partial-word matches never tagged; only
    conjunctive hits returned."""
    from auctus_spark import pipeline
    rows = [(1, "Data join and DATA joins with database"),
            (2, "join only here"),
            (3, "data data join")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.highlighted
           for r in pipeline.highlight(df, "data join", k=10).collect()}
    assert set(out) == {1, 3}      # doc 2 lacks 'data' (conjunctive)
    assert out[1] == ("<em>Data</em> <em>join</em> and <em>DATA</em> "
                      "joins with database")   # no partial 'joins'/'database'
    assert out[3] == "<em>data</em> <em>data</em> <em>join</em>"
    assert pipeline.highlight(df, "", k=10).count() == 0


def test_highlight_fragments(spark):
    """Unified-highlighter fragmenting mode: 4-token tiled windows,
    best-F by (count·idf sum DESC, window ASC), emitted in document
    order; windows without matches never returned; fragment text is
    analyzed tokens space-joined with matches tagged."""
    from auctus_spark import pipeline
    rows = [
        # windows of 4: [data x a b] [c d data data] [e f g h] [join k]
        (1, "data x a b c d data data e f g h join k"),
        (2, "join data join zz yy xx ww vv"),
        (3, "nothing relevant here at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pipeline.highlight_fragments(
        df, "data join", k=10, fragment_size=4,
        number_of_fragments=2).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}   # doc 3: no hit (conjunctive)
    # doc 1: window 1 (2x data) and window 3 (1x join, idf(join) >
    # 2*idf(data)? both terms appear in 2 of 3 docs so idf equal ->
    # window 1 wins, then window 0 vs window 3: 1x data vs 1x join,
    # equal score -> earlier window wins; emitted in document order.
    d1 = by_doc[1]
    assert [r.fragment_ix for r in d1] == [0, 1]
    assert d1[0].fragment == "<em>data</em> x a b"
    assert d1[1].fragment == "c d <em>data</em> <em>data</em>"
    assert d1[1].fragment_score > d1[0].fragment_score
    # doc 2: single matching window, only one fragment comes back
    d2 = by_doc[2]
    assert len(d2) == 1
    assert d2[0].fragment == "<em>join</em> <em>data</em> <em>join</em> zz"
    # empty query -> empty frame with the contract schema
    empty = pipeline.highlight_fragments(df, "", k=10)
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "score", "fragment_ix",
                             "fragment_score", "fragment"]


def test_dedup_clusters(spark):
    """Hash-min components: min reachable id labels every node; two
    disjoint components stay separate; a long chain under a tiny
    iteration cap raises instead of returning wrong labels."""
    import pytest as _pytest

    from auctus_spark.operators.dedup import dedup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (2, 4)],
        "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}
    # keep-one-per-cluster: canonical == cluster_id
    canon = {d for d, c in got.items() if d == c}
    assert canon == {1, 10}
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with _pytest.raises(RuntimeError):
        dedup_clusters(chain, max_iterations=3)
    # a chain converges given enough iterations
    got2 = {r.doc_id: r.cluster_id
            for r in dedup_clusters(chain, max_iterations=15).collect()}
    assert set(got2.values()) == {0} and len(got2) == 13
