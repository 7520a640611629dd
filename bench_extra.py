"""Extra benchmarks for optimization work (bench.py is FROZEN).

Isolates each headline DataFrame query per guide §1.4: times the
computation against the noop sink (and `.collect()` for bench-parity),
and captures `.explain("formatted")` plans to plans/<tag>/.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plans TAG] [--only a,b]
  python bench_extra.py --build            # stage-timed index build
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADS = ["bm25_topk_hot", "bm25_topk_conjunctive", "tpch_q1",
         "topk_orders_per_cust", "interval_overlap_join",
         "embedding_cosine_topk", "dedup_exact", "text_quality"]


def _spark():
    from auctus_spark.session import get_spark
    spark = get_spark("bench_extra", cores=CPUS,
                      shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_queries(sf_dir: str, reps: int = 3, plans_tag: str | None = None,
                only: list[str] | None = None, noop: bool = False):
    import __spark_entry__ as entry
    spark = _spark()
    qs = entry.queries()
    out: dict[str, float] = {}
    names = only or HEADS
    for name in names:
        fn = qs[name]
        if plans_tag:
            pdir = os.path.join(REPO, "plans", plans_tag)
            os.makedirs(pdir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(pdir, f"{name}.txt"), "w") as f:
                f.write(plan)
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(round(time.time() - t0, 3))
        out[name] = sorted(times)[len(times) // 2]
        print(f"{name}: median={out[name]} samples={times}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "noop": noop, "queries": out,
                      "total": round(sum(out.values()), 3)}))
    return out


def build_stages(n_docs: int = 200000):
    """Stage-by-stage timing of the index build (same params as bench)."""
    from auctus_spark.corpus import corpus_dataframe
    from auctus_spark.index.build import IndexBuilder, wipe
    spark = _spark()
    work = os.environ.get("BENCH_WORK_DIR", "/tmp/auctus_bench")
    os.makedirs(work, exist_ok=True)
    corpus_path = os.path.join(work, f"corpus_{n_docs}")
    if not os.path.exists(corpus_path):
        corpus_dataframe(spark, n_docs, partitions=max(CPUS * 2, 32)) \
            .write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    idx_dir = os.path.join(work, f"index_stageprof")
    wipe(idx_dir)
    b = IndexBuilder(spark, idx_dir, doc_bucket=1 << 14,
                     chunk_docs=1 << 20, term_buckets=64)
    t = {}
    t0 = time.time()
    spark.sparkContext.setJobDescription("build:tokenize")
    b.tokenize_chunks(corpus, resume=False)
    t["tokenize"] = round(time.time() - t0, 3)
    t1 = time.time()
    spark.sparkContext.setJobDescription("build:stats")
    b.finalize_stats()
    t["stats"] = round(time.time() - t1, 3)
    t2 = time.time()
    spark.sparkContext.setJobDescription("build:encode_segments")
    b.encode_segments()
    t["encode_segments"] = round(time.time() - t2, 3)
    t3 = time.time()
    spark.sparkContext.setJobDescription("build:term_stats")
    b.finalize_term_stats()
    t["term_stats"] = round(time.time() - t3, 3)
    t["total"] = round(time.time() - t0, 3)
    print(json.dumps({"build_stages": t, "n_docs": n_docs}))
    return t


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--build" in args:
        nd = 200000
        if "--docs" in args:
            nd = int(args[args.index("--docs") + 1])
        build_stages(nd)
    else:
        sf = SF_DIR
        if "--sf" in args:
            sf = args[args.index("--sf") + 1]
        reps = 3
        if "--reps" in args:
            reps = int(args[args.index("--reps") + 1])
        tag = None
        if "--plans" in args:
            tag = args[args.index("--plans") + 1]
        only = None
        if "--only" in args:
            only = args[args.index("--only") + 1].split(",")
        run_queries(sf, reps=reps, plans_tag=tag, only=only,
                    noop="--noop" in args)
