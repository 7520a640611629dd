"""Per-stage build timing at one parallelism level (exploration tool).

Usage: python scripts/stage_timing.py <cores> [docs]
Prints one JSON line with per-stage seconds for the index build.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores = int(sys.argv[1])
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    work = os.environ.get("BENCH_WORK_DIR", "/tmp/auctus_bench")
    os.makedirs(work, exist_ok=True)

    from auctus_spark.corpus import corpus_dataframe
    from auctus_spark.index.build import IndexBuilder, wipe
    from auctus_spark.session import get_spark

    spark = get_spark(f"stage_timing_{cores}", cores=cores,
                      shuffle_partitions=max(cores, 16))
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = os.path.join(work, f"corpus_{docs}")
    if not os.path.exists(corpus_path):
        corpus_dataframe(spark, docs, partitions=64) \
            .write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    idx_dir = os.path.join(work, f"index_st_{cores}")
    wipe(idx_dir)

    b = IndexBuilder(spark, idx_dir, doc_bucket=1 << 14,
                     chunk_docs=1 << 20, term_buckets=64)
    t = {}
    t0 = time.time()
    b.tokenize_chunks(corpus, resume=False)
    t["tokenize"] = time.time() - t0
    t1 = time.time()
    b.finalize_stats()
    t["stats"] = time.time() - t1
    t2 = time.time()
    b.encode_segments()
    t["segments"] = time.time() - t2
    t3 = time.time()
    b.finalize_term_stats()
    t["term_stats"] = time.time() - t3
    t["total"] = time.time() - t0
    print(json.dumps({"cores": cores, "docs": docs,
                      **{k: round(v, 2) for k, v in t.items()}}))


if __name__ == "__main__":
    main()
