"""Scaling-efficiency evidence for BENCH/BASELINE.md.

Runs the full index build at local[2], local[8], local[32] on the SAME
1M-doc corpus, interleaved over `--reps` passes (the sandbox host is
noisy; interleaving + medians beat single runs), and reports
throughput at each level plus N→4N efficiencies.

Usage: python scripts/scaling_evidence.py [--reps 2] [--docs 1000000]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_build(cores: int, docs: int, work: str) -> float:
    code = f"""
import sys, time, json
sys.path.insert(0, {REPO!r})
import bench
r = bench._build_once({cores}, {work!r}, {docs})
print("RESULT", json.dumps(r["build_sec"]))
"""
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    for ln in p.stdout.splitlines():
        if ln.startswith("RESULT"):
            return float(ln.split()[1])
    print(p.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"build at {cores} cores failed")


def main():
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 2
    docs = int(sys.argv[sys.argv.index("--docs") + 1]) \
        if "--docs" in sys.argv else 1_000_000
    work = os.environ.get("BENCH_WORK_DIR", "/tmp/auctus_bench")
    os.makedirs(work, exist_ok=True)
    levels = [2, 8, 32]
    times: dict[int, list[float]] = {c: [] for c in levels}
    for rep in range(reps):
        for c in levels:
            t = run_build(c, docs, work)
            times[c].append(t)
            print(f"rep{rep} local[{c}]: {t:.1f}s "
                  f"({docs / t:.0f} files/s)", file=sys.stderr)
    med = {c: sorted(v)[len(v) // 2] for c, v in times.items()}
    thr = {c: docs / med[c] for c in levels}
    out = {
        "metric": "index_build_scaling_ladder",
        "unit": "files/sec",
        "corpus_docs": docs,
        "reps": reps,
        "median_build_sec": {f"local[{c}]": round(med[c], 1)
                             for c in levels},
        "files_per_sec": {f"local[{c}]": round(thr[c], 0)
                          for c in levels},
        "efficiency_2_to_8": round(thr[8] / (4 * thr[2]), 3),
        "efficiency_8_to_32": round(thr[32] / (4 * thr[8]), 3),
        "all_runs_sec": {f"local[{c}]": [round(x, 1) for x in v]
                         for c, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
