"""Time EVERY declared query once (optimization-round audit sweep).

Runs each queries() entry at the given sf dir with a fresh plan,
collect()-parity, and prints one sorted JSON map name -> seconds.
Index-path queries build/reuse their /tmp entry indexes exactly as the
driver's correctness gate does.

Usage: python scripts/sweep_queries.py [sf_dir] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import __spark_entry__ as entry
    from auctus_spark.session import get_spark
    spark = get_spark("sweep", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for name, fn in qs.items():
        ts = []
        try:
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.time()
                fn(spark, sf_dir).collect()
                ts.append(round(time.time() - t0, 3))
            out[name] = min(ts)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {e}"[:120]
        print(f"  {name}: {out[name]}", file=sys.stderr)
    ranked = dict(sorted(out.items(),
                         key=lambda kv: -(kv[1] if isinstance(kv[1], float)
                                          else 1e9)))
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": ranked}))


if __name__ == "__main__":
    main()
