"""Resumable builds (north rule): a build interrupted between chunks and
resumed produces byte-identical search results to a fresh full build,
and already-built chunks are skipped on resume."""

import math

from auctus_spark.corpus import generate_corpus
from auctus_spark.index.build import IndexBuilder
from auctus_spark.query.bm25 import SearchEngine


def _results(spark, out, q):
    eng = SearchEngine(spark, out, term_buckets=4)
    return [(int(r.doc_id), round(float(r.score), 12))
            for r in eng.search(q).collect()]


def test_resume_equivalence(spark, tmp_path):
    pdf = generate_corpus(400, min_tokens=20, max_tokens=120, vocab_size=800)
    corpus = spark.createDataFrame(pdf)

    # fresh full build
    full_dir = str(tmp_path / "full")
    IndexBuilder(spark, full_dir, doc_bucket=128, chunk_docs=100,
                 term_buckets=4).build(corpus)

    # interrupted build: only the first half of the doc range, then
    # resume with the full corpus
    part_dir = str(tmp_path / "resumed")
    b = IndexBuilder(spark, part_dir, doc_bucket=128, chunk_docs=100,
                     term_buckets=4)
    first_half = corpus.filter("doc_id < 200")
    built1 = b.tokenize_chunks(first_half)
    assert built1 == [0, 1]

    # resume: chunks 0-1 skipped, 2-3 built
    built2 = b.tokenize_chunks(corpus, resume=True)
    assert built2 == [2, 3]
    stats = b.finalize_stats()
    b.encode_segments(stats["avgdl"])
    b.finalize_term_stats()

    for q in ["import", "def return", "uniq_token_11"]:
        assert _results(spark, part_dir, q) == _results(spark, full_dir, q)

    # re-running build() over an up-to-date index is a no-op for stage 1
    assert b.tokenize_chunks(corpus, resume=True) == []
    assert b.verify_lineage(corpus)


def test_stats_are_global(spark, tmp_path):
    """avgdl/N must come from the full corpus snapshot."""
    pdf = generate_corpus(150, min_tokens=20, max_tokens=80, vocab_size=500)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path / "idx")
    b = IndexBuilder(spark, out, doc_bucket=64, chunk_docs=64, term_buckets=4)
    stats = b.build(corpus)
    assert stats["n_docs"] == 150
    want_avgdl = sum(len(c.split()) for c in pdf["content"]) / 150
    assert math.isclose(stats["avgdl"], want_avgdl, rel_tol=1e-12)


def test_delete_and_update(spark, tmp_path):
    """Tombstone deletes mask results on every scorer path; an update
    is delete + incremental append under a new docID."""
    from auctus_spark.corpus import generate_corpus
    from auctus_spark.index.build import IndexBuilder, delete_docs
    from auctus_spark.query.bm25 import SearchEngine, search_many
    from auctus_spark.streaming.incremental import incremental_update

    pdf = generate_corpus(300, min_tokens=20, max_tokens=100,
                          vocab_size=500)
    out = str(tmp_path / "idx")
    b = IndexBuilder(spark, out, doc_bucket=128, chunk_docs=1 << 20,
                     term_buckets=4)
    b.build(spark.createDataFrame(pdf))
    eng = SearchEngine(spark, out, term_buckets=4)
    before = [(int(r.doc_id), float(r.score))
              for r in eng.search_wand("import", k=50).collect()]
    victims = [before[0][0], before[3][0]]
    delete_docs(spark, out, victims)

    eng2 = SearchEngine(spark, out, term_buckets=4)
    want = [(d, s) for d, s in
            [(int(r.doc_id), float(r.score))
             for r in eng.search_wand("import", k=52).collect()]
            if d not in victims][:50]
    got = [(int(r.doc_id), float(r.score))
           for r in eng2.search_wand("import", k=50).collect()]
    assert got == want
    assert all(d not in victims for d, _ in got)
    # OR path and exhaustive path also mask
    got_or = [int(r.doc_id)
              for r in eng2.search_or("import", k=50).collect()]
    assert all(d not in victims for d in got_or)
    got_ex = [int(r.doc_id) for r in eng2.search("import", k=50).collect()]
    assert all(d not in victims for d in got_ex)
    # batched path
    sm = search_many(eng2, {"q": "import"}, k=50).collect()
    assert all(int(r.doc_id) not in victims for r in sm)

    # update = delete + append new version under a fresh docID in a
    # NEW chunk range (increment granularity = chunk)
    new = generate_corpus(1, min_tokens=20, max_tokens=40, vocab_size=500,
                          start_doc_id=1 << 20)
    incremental_update(b, spark.createDataFrame(new))
    eng3 = SearchEngine(spark, out, term_buckets=4)
    assert eng3.n_docs == 301  # stats refreshed at rebuild
