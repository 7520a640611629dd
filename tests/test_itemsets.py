"""frequent_item_sets: support counting, Apriori levels, closed-set
filtering — pinned against a brute-force reference."""

from itertools import combinations

from auctus_spark.operators.itemsets import frequent_item_sets

TX = [["beer", "diapers"],
      ["beer", "diapers", "milk"],
      ["beer", "diapers", "milk"],
      ["milk", "bread"],
      ["bread"],
      ["beer", "bread", "diapers", "milk"]]


def _brute(tx, min_support, max_size, closed=True):
    n = len(tx)
    import math
    minc = max(1, math.ceil(min_support * n))
    sets = {}
    for size in range(1, max_size + 1):
        items = sorted({i for t in tx for i in t})
        for c in combinations(items, size):
            cnt = sum(1 for t in tx if set(c) <= set(t))
            if cnt >= minc:
                sets[c] = cnt
    out = {}
    for s, c in sets.items():
        if closed and any(len(t) > len(s) and c2 == c
                          and set(s) <= set(t)
                          for t, c2 in sets.items()):
            continue
        out[" ".join(s)] = c
    return out


def test_frequent_item_sets_matches_bruteforce(spark):
    df = spark.createDataFrame([(t,) for t in TX],
                               "items array<string>")
    got = {r["items"]: r["doc_count"]
           for r in frequent_item_sets(df, "items",
                                       min_support=0.3).collect()}
    assert got == _brute(TX, 0.3, 3)
    # closed filtering really drops something: {beer} and {diapers}
    # always co-occur (count 4 each, pair count 4) -> the singletons
    # are NOT closed, only the pair survives
    assert "beer diapers" in got
    assert "beer" not in got and "diapers" not in got


def test_frequent_item_sets_open_and_support(spark):
    df = spark.createDataFrame([(t,) for t in TX],
                               "items array<string>")
    rows = frequent_item_sets(df, "items", min_support=0.5,
                              closed=False).collect()
    got = {r["items"]: (r["doc_count"], r["support"]) for r in rows}
    import pytest as _pt
    assert got["beer"] == (4, _pt.approx(4 / 6))
    assert got["beer diapers"] == (4, _pt.approx(4 / 6))
    # min_support honored: bread appears 3x -> in at 0.5
    assert "bread" in got and "milk bread" not in got
    # ordering: doc_count desc, items asc
    assert [r["doc_count"] for r in rows] == sorted(
        [r["doc_count"] for r in rows], reverse=True)


def test_frequent_item_sets_duplicates_and_empty(spark):
    # duplicate items within one transaction count once
    df = spark.createDataFrame([(["a", "a", "b"],), (["a"],)],
                               "items array<string>")
    got = {r["items"]: r["doc_count"]
           for r in frequent_item_sets(df, "items", min_support=0.5,
                                       closed=False).collect()}
    assert got["a"] == 2 and got["a b"] == 1
    empty = spark.createDataFrame([], "items array<string>")
    assert frequent_item_sets(empty, "items").collect() == []
