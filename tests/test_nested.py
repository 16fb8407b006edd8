"""ES nested type/query semantics: per-element predicate conjunction
(the thing object-flattening gets wrong), inner_hits, score modes."""

from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.operators.nested import (
    inner_hits,
    nest_children,
    nested_match,
    nested_score,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, [{"a": 1, "b": 2}, {"a": 2, "b": 1}]),   # flattened-only match
         (2, [{"a": 1, "b": 1}]),                      # true nested match
         (3, [{"a": 3, "b": 3}])],
        "id long, els array<struct<a:int, b:int>>")


def test_nested_vs_flattened_semantics(spark):
    df = _docs(spark)
    pred = lambda e: (e["a"] == 1) & (e["b"] == 1)  # noqa: E731
    got = [r["id"] for r in nested_match(df, "els", pred).collect()]
    assert got == [2]  # doc 1 would match under object flattening
    # the flattened (wrong) semantics really would include doc 1:
    flat = df.filter(F.array_contains(F.transform("els", lambda e: e["a"]), 1)
                     & F.array_contains(F.transform("els", lambda e: e["b"]),
                                        1))
    assert sorted(r["id"] for r in flat.collect()) == [1, 2]


def test_inner_hits(spark):
    df = _docs(spark)
    out = inner_hits(df, "els", lambda e: e["a"] >= 2).collect()
    by_id = {r["id"]: [(e["a"], e["b"]) for e in r["inner_hits"]]
             for r in out}
    assert by_id == {1: [(2, 1)], 3: [(3, 3)]}


def test_nested_score_modes(spark):
    df = _docs(spark)
    pred = lambda e: e["a"] >= 1  # noqa: E731
    score = lambda e: e["b"]  # noqa: E731
    got = {m: {r["id"]: r["score"] for r in
               nested_score(df, "els", pred, score, m).collect()}
           for m in ("sum", "avg", "min", "max", "none")}
    assert got["sum"] == {1: 3.0, 2: 1.0, 3: 3.0}
    assert got["avg"] == {1: 1.5, 2: 1.0, 3: 3.0}
    assert got["min"] == {1: 1.0, 2: 1.0, 3: 3.0}
    assert got["max"] == {1: 2.0, 2: 1.0, 3: 3.0}
    assert got["none"] == {1: 1.0, 2: 1.0, 3: 1.0}


def test_nest_children_roundtrip(spark):
    kids = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 5.0), (2, "x", 1.0)],
        "pid long, kind string, v double")
    nested = nest_children(kids, "pid", ["kind", "v"], "evs")
    rows = {r["pid"]: [(e["kind"], e["v"]) for e in r["evs"]]
            for r in nested.collect()}
    assert rows == {1: [("x", 10.0), ("y", 5.0)], 2: [("x", 1.0)]}
    # nested query over the built representation == flat SQL on kids
    want = {r["pid"] for r in
            kids.filter((F.col("kind") == "x") & (F.col("v") > 5))
            .select("pid").distinct().collect()}
    got = {r["pid"] for r in nested_match(
        nested, "evs",
        lambda e: (e["kind"] == "x") & (e["v"] > 5)).collect()}
    assert got == want == {1}


def test_nested_terms_agg(spark):
    from elasticsearch_osmosis_plugin_spark.operators.nested import (
        nested_terms_agg,
    )

    df = spark.createDataFrame(
        [(1, [{"k": "x"}, {"k": "x"}, {"k": "y"}]),
         (2, [{"k": "x"}]),
         (3, [{"k": "y"}])],
        "id long, els array<struct<k:string>>")
    got = [tuple(r) for r in nested_terms_agg(df, "els", "k", "id").collect()]
    # n_nested counts elements (doc 1 holds "x" twice -> 3 total);
    # n_docs is the reverse_nested parent count (doc 1 counts once)
    assert got == [("x", 3, 2), ("y", 2, 2)]
