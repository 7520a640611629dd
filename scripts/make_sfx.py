"""Build a measurement-only scaled dataset (sf0.1 x N) at /tmp.

The driver's round-end bench may run at a driver-generated sf1.0 that
is not present in /root/testdata; for optimization measurements we
need data of that size.  This replicates every sf0.1 table N times
with shifted primary keys (and replica-salted text so the corpus is
not 10 identical copies), preserving the driver layout property that
matters to plan shape: ONE parquet file, ONE row group per table.

Measurement-only: never used by queries()/oracle_sql()/bench.py.

Usage: python scripts/make_sfx.py [N] [out_dir]
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

KEY_SHIFT = {
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
    "events": {"event_id": 100000, "user_id": 0},
    "lineitem": {"l_orderkey": 150000},
    "orders": {"o_orderkey": 150000, "o_custkey": 0},
    "customer": {"c_custkey": 0},
    "part": {},
    "supplier": {},
    "nation": None,    # dimension tables: copy as-is
    "region": None,
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfx{n}"
    os.makedirs(out, exist_ok=True)
    for name, shifts in KEY_SHIFT.items():
        src = f"{SRC}/{name}.parquet"
        t = pq.read_table(src)
        if shifts is None or n == 1:
            pq.write_table(t, f"{out}/{name}.parquet",
                           row_group_size=1 << 30)
            print(name, t.num_rows, "(copied)")
            continue
        reps = []
        for k in range(n):
            cols = {}
            for field in t.schema.names:
                col = t[field]
                if field in shifts and shifts[field]:
                    cols[field] = pa.chunked_array(
                        [pa.compute.add(col, shifts[field] * k)])
                elif name == "documents" and field == "text" and k > 0:
                    # salt each replica so the corpus is not exact
                    # duplicates (dedup/groupBy cardinality realism)
                    cols[field] = pa.chunked_array([pa.compute.binary_join_element_wise(
                        col.combine_chunks().cast(pa.string()),
                        pa.array([f"replica{k} token{i % 97}" for i in
                                  range(len(col))], pa.string()), " ")])
                else:
                    cols[field] = col
            reps.append(pa.table({f: cols[f] for f in t.schema.names},
                                 schema=None))
        big = pa.concat_tables(reps).combine_chunks()
        pq.write_table(big, f"{out}/{name}.parquet",
                       row_group_size=1 << 30)
        print(name, big.num_rows)
    open(f"{out}/_DONE", "w").close()


if __name__ == "__main__":
    main()
