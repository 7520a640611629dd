"""Parent-child and nested relational query semantics."""

import pytest

from pyspark.sql import functions as F

from auctus_spark.operators import relations as R


@pytest.fixture(scope="module")
def pc(spark):
    parents = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0),
         (4, "c", 40.0)],
        "pid bigint, seg string, bal double")
    children = spark.createDataFrame(
        [(100, 1, "X", 5.0), (101, 1, "X", 7.0), (102, 1, "Y", 1.0),
         (103, 2, "X", 9.0), (104, 3, "Y", 2.0), (105, 9, "X", 3.0)],
        "cid bigint, pid bigint, typ string, amt double")
    return parents, children


def test_has_child_score_modes_and_bounds(pc):
    parents, children = pc
    # parents with >=1 X child, score = sum of amt
    out = R.has_child(parents, children, "pid", "pid",
                      "typ = 'X'", score_col="amt",
                      score_mode="sum").orderBy("pid").collect()
    assert [(r.pid, r.n_matching_children, r.score) for r in out] == \
        [(1, 2, 12.0), (2, 1, 9.0)]
    # min_children=2 keeps only parent 1; max/avg/min folds
    out2 = R.has_child(parents, children, "pid", "pid",
                       "typ = 'X'", score_col="amt",
                       score_mode="avg", min_children=2).collect()
    assert len(out2) == 1 and out2[0].pid == 1 and out2[0].score == 6.0
    out3 = R.has_child(parents, children, "pid", "pid",
                       "typ = 'X'", score_col="amt",
                       score_mode="max", max_children=1).collect()
    assert [(r.pid, r.score) for r in out3] == [(2, 9.0)]
    # score_mode none scores 0 (ES contract)
    out4 = R.has_child(parents, children, "pid", "pid",
                       "typ = 'Y'").orderBy("pid").collect()
    assert [(r.pid, r.score) for r in out4] == [(1, 0.0), (3, 0.0)]


def test_has_child_validates_args(pc):
    parents, children = pc
    with pytest.raises(ValueError):
        R.has_child(parents, children, "pid", "pid", "true",
                    score_mode="bogus")
    with pytest.raises(ValueError):
        R.has_child(parents, children, "pid", "pid", "true",
                    score_mode="sum")  # no score_col


def test_has_parent_inherits_score_and_is_broadcast(pc, spark):
    parents, children = pc
    out = R.has_parent(parents, children, "pid", "pid",
                       "seg = 'a'", score_col="bal")
    rows = out.orderBy("cid").collect()
    assert [(r.cid, r.parent_score) for r in rows] == \
        [(100, 10.0), (101, 10.0), (102, 10.0), (104, 30.0)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # score: false default -> constant 0
    out0 = R.has_parent(parents, children, "pid", "pid", "seg = 'c'")
    assert out0.count() == 0  # parent 4 has no children


def test_nest_children_and_nested_query(pc):
    parents, children = pc
    nested = R.nest_children(parents, children, "pid", "pid",
                             "kids", ["typ", "amt"])
    assert nested.count() == 4
    empty = nested.where(F.col("pid") == 4).select(
        F.size("kids")).first()[0]
    assert empty == 0
    # nested semantics: typ='X' AND amt>6 must hold within ONE object
    hit = R.nested_query(nested, "kids", "x.typ = 'X' AND x.amt > 6.0",
                         inner_hits=True)
    rows = hit.orderBy("pid").collect()
    assert [(r.pid, r.n_inner_hits) for r in rows] == [(1, 1), (2, 1)]
    # flattened-object semantics would ALSO match pid 3 if it had
    # typ X on one child and amt>6 on another -- build that case:
    tricky = R.nest_children(
        parents, children.union(
            children.sparkSession.createDataFrame(
                [(106, 4, "X", 1.0), (107, 4, "Y", 99.0)],
                children.schema)),
        "pid", "pid", "kids", ["typ", "amt"])
    # pid 4 has an X child (amt 1) and a high-amt child (Y 99):
    # object mapping would match, nested must NOT.
    assert R.nested_query(tricky, "kids",
                          "x.typ = 'X' AND x.amt > 6.0") \
        .where("pid = 4").count() == 0


def test_nested_query_is_scan_only(pc):
    parents, children = pc
    nested = R.nest_children(parents, children, "pid", "pid",
                             "kids", ["typ", "amt"])
    nested = nested.localCheckpoint()  # materialize the indexing step
    plan = R.nested_query(nested, "kids", "x.amt > 2.0") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter, no shuffle


def test_nested_agg_reverse_nested(pc):
    parents, children = pc
    nested = R.nest_children(parents, children, "pid", "pid",
                             "kids", ["typ", "amt"])
    out = R.nested_agg(nested, "kids", "typ", "amt", "pid") \
        .orderBy("typ").collect()
    # X: children 100,101,103,105->but 105's parent 9 not in parents
    assert [(r.typ, r.doc_count, r.sum_metric, r.parent_doc_count)
            for r in out] == \
        [("X", 3, 21.0, 2), ("Y", 2, 3.0, 2)]


def test_children_agg(pc):
    parents, children = pc
    out = R.children_agg(parents, children, "pid", "pid",
                         "seg", "amt").orderBy("seg").collect()
    assert [(r.seg, r.doc_count, r.sum_metric) for r in out] == \
        [("a", 4, 15.0), ("b", 1, 9.0)]
