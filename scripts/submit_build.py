"""spark-submit entry point: build the inverted index over a corpus
table and answer a query set — the north rule's deployment shape
(``spark-submit --py-files auctus_spark.zip`` on a multi-executor
cluster; BASELINE.json north_star).

Usage (cluster):

    cd repo && python scripts/make_pyfiles_zip.py   # -> auctus_spark.zip
    spark-submit --master <cluster> --py-files auctus_spark.zip \\
        scripts/submit_build.py \\
        --corpus /path/to/corpus_parquet --index /path/to/index \\
        --query "import def" --query "parse request"

Local smoke (what the sandbox runs):

    spark-submit --master 'local[8]' --py-files auctus_spark.zip \\
        scripts/submit_build.py --corpus ... --index ... --query ...

The corpus table is ``(repo, path, commit, lang, content)`` plus a
``doc_id`` column (``corpus.corpus_dataframe`` synthesizes one for
benchmarks); results and the per-row sha256 lineage verdict print as
JSON lines on stdout.
"""

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="corpus table: parquet path OR catalog table"
                         " name (e.g. an Iceberg cat.db.table)")
    ap.add_argument("--index", required=True, help="index output dir")
    ap.add_argument("--query", action="append", default=[],
                    help="query to answer after the build (repeatable)")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--doc-bucket", type=int, default=1 << 14)
    ap.add_argument("--chunk-docs", type=int, default=1 << 20)
    ap.add_argument("--resume", action="store_true",
                    help="resume a checkpointed build (skip committed "
                         "chunks via lineage)")
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    from auctus_spark.index.build import IndexBuilder
    from auctus_spark.query.bm25 import SearchEngine, search_many
    from auctus_spark.session import get_spark

    spark = get_spark("auctus_spark_submit", submit_mode=True)
    from auctus_spark.sources import read_corpus_table
    corpus = read_corpus_table(spark, args.corpus)

    t0 = time.time()
    b = IndexBuilder(spark, args.index, doc_bucket=args.doc_bucket,
                     chunk_docs=args.chunk_docs,
                     term_buckets=args.term_buckets)
    stats = b.build(corpus, resume=args.resume)
    build_sec = time.time() - t0
    n = corpus.count()
    print(json.dumps({"event": "build", "n_docs": stats["n_docs"],
                      "avgdl": round(stats["avgdl"], 4),
                      "build_sec": round(build_sec, 2),
                      "files_per_sec": round(n / build_sec, 1)}))

    if not args.skip_verify:
        ok = b.verify_lineage(corpus)
        print(json.dumps({"event": "lineage_sha256", "ok": bool(ok)}))
        if not ok:
            return 2

    if args.query:
        eng = SearchEngine(spark, args.index,
                           term_buckets=args.term_buckets)
        t1 = time.time()
        res = search_many(eng, {f"q{i}": q
                                for i, q in enumerate(args.query)},
                          k=args.k)
        by_q: dict = {}
        for r in res.collect():
            by_q.setdefault(r.query_id, []).append(
                [int(r.doc_id), round(float(r.score), 6)])
        for i, q in enumerate(args.query):
            hits = sorted(by_q.get(f"q{i}", []),
                          key=lambda t: (-t[1], t[0]))
            print(json.dumps({"event": "query", "query": q,
                              "hits": hits[:args.k]}))
        print(json.dumps({"event": "query_batch_sec",
                          "sec": round(time.time() - t1, 2),
                          "n_queries": len(args.query)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
