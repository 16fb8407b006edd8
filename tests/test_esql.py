"""ES|QL front end: every piped form equals its direct DataFrame twin.

The compiler must be a pure re-spelling — each test builds the same
plan with the DataFrame API and asserts row-for-row equality (sorted),
so the language layer can never drift from the engine it fronts.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.operators.esql import EsqlError, esql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    t = {n: spark.read.parquet(f"{SF}/{n}.parquet")
         for n in ("events", "documents", "orders", "customer")}
    return t


def rows(df):
    return sorted(map(tuple, df.collect()))


# ------------------------------------------------------------ expressions

def test_where_eval_sort_limit(spark, tables):
    got = esql(spark, """
FROM events
| WHERE value >= 50 AND NOT (event_type == "signup" OR event_type == "view")
| EVAL v2 = ROUND(value * 2.0, 1), neg = -user_id
| KEEP event_id, v2, neg
| SORT v2 DESC, event_id ASC
| LIMIT 7""", tables)
    ev = tables["events"]
    want = (ev.filter((F.col("value") >= 50)
                      & ~F.col("event_type").isin("signup", "view"))
            .select("event_id", F.round(F.col("value") * 2.0, 1).alias("v2"),
                    (-F.col("user_id")).alias("neg"))
            .orderBy(F.desc("v2"), F.asc("event_id")).limit(7))
    assert got.collect() == want.collect()
    assert got.columns == ["event_id", "v2", "neg"]


def test_like_rlike_in_isnull(spark, tables):
    got = esql(spark, """
FROM documents
| WHERE lang IN ("en", "fr") AND source LIKE "src1*"
      AND text RLIKE ".*spark.*" AND text IS NOT NULL
| STATS n = COUNT(*)""", tables)
    d = tables["documents"]
    want = (d.filter(F.col("lang").isin("en", "fr")
                     & F.col("source").rlike("^src1.*$")
                     & F.col("text").rlike("^(?:.*spark.*)$")
                     & F.col("text").isNotNull())
            .count())
    assert got.collect()[0][0] == want


def test_case_coalesce_string_funcs(spark, tables):
    got = esql(spark, """
FROM documents
| EVAL band = CASE(n_chars > 400, "long", n_chars > 200, "mid", "short"),
       up = TO_UPPER(SUBSTRING(source, 1, 3)),
       sl = LENGTH(CONCAT(lang, "-", source))
| STATS n = COUNT(*), mean_sl = AVG(sl) BY band, up
| SORT band, up
| LIMIT 5""", tables)
    assert got.columns == ["band", "up", "n", "mean_sl"]
    out = got.collect()
    assert 1 <= len(out) <= 5 and all(r["up"] == "SRC" for r in out)
    d = tables["documents"]
    want_n = sum(r["n"] for r in out)
    assert want_n == d.count()


def test_unnamed_columns_use_source_text(spark, tables):
    got = esql(spark, 'FROM events | STATS COUNT(*), AVG(value)', tables)
    assert got.columns == ["COUNT(*)", "AVG(value)"]


# ------------------------------------------------------------ STATS forms

def test_stats_by_bucket_matches_dataframe(spark, tables):
    got = esql(spark, """
FROM events
| STATS n = COUNT(*), s = SUM(value) BY day = BUCKET(ts, 1 day), event_type
| SORT day, event_type""", tables)
    ev = tables["events"]
    want = (ev.withColumn("day", F.date_trunc("day", "ts"))
            .groupBy("day", "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .orderBy("day", "event_type"))
    assert got.collect() == want.collect()


def test_stats_agg_where_filter(spark, tables):
    got = esql(spark, """
FROM events
| STATS views = COUNT(*) WHERE event_type == "view",
        all = COUNT(*),
        vsum = SUM(value) WHERE event_type == "view" """, tables)
    ev = tables["events"]
    r = got.collect()[0]
    assert r["all"] == ev.count()
    assert r["views"] == ev.filter(F.col("event_type") == "view").count()
    want = ev.filter(F.col("event_type") == "view") \
        .agg(F.sum("value")).collect()[0][0]
    assert abs(r["vsum"] - want) < 1e-9


def test_stats_expression_over_aggregates(spark, tables):
    got = esql(spark, """
FROM events
| STATS frac = ROUND(SUM(value) / COUNT(*), 3)""", tables).collect()[0][0]
    ev = tables["events"]
    want = ev.agg(F.round(F.sum("value") / F.count(F.lit(1)), 3)) \
        .collect()[0][0]
    assert got == want


def test_median_percentile_values_top(spark, tables):
    got = esql(spark, """
FROM events
| STATS md = MEDIAN(value), p90 = PERCENTILE(value, 90),
        kinds = VALUES(event_type), top2 = TOP(value, 2, "desc")""",
               tables).collect()[0]
    ev = tables["events"]
    want = ev.agg(F.expr("percentile(value, 0.5)"),
                  F.expr("percentile(value, 0.9)")).collect()[0]
    assert got["md"] == want[0] and got["p90"] == want[1]
    assert got["kinds"] == sorted(
        r[0] for r in ev.select("event_type").distinct().collect())
    top2 = [r[0] for r in
            ev.orderBy(F.desc("value")).limit(2).select("value").collect()]
    assert got["top2"] == top2


# ------------------------------------------ KEEP/DROP/RENAME + MV_EXPAND

def test_keep_wildcard_order_and_drop(spark, tables):
    got = esql(spark, "FROM orders | KEEP o_order*, o_custkey | LIMIT 1",
               tables)
    assert got.columns == ["o_orderkey", "o_orderstatus", "o_orderdate",
                           "o_orderpriority", "o_custkey"]
    got = esql(spark, "FROM orders | DROP o_order* | LIMIT 1", tables)
    assert got.columns == ["o_custkey", "o_totalprice"]
    with pytest.raises(EsqlError, match="unknown column"):
        esql(spark, "FROM orders | KEEP nope", tables)


def test_rename_both_syntaxes(spark, tables):
    a = esql(spark, "FROM orders | RENAME o_custkey AS ck | LIMIT 1", tables)
    b = esql(spark, "FROM orders | RENAME ck = o_custkey | LIMIT 1", tables)
    assert "ck" in a.columns and a.columns == b.columns


def test_mv_expand_and_split(spark, tables):
    got = esql(spark, """
ROW id = 1, s = "a b a"
| EVAL parts = SPLIT(s, " ")
| MV_EXPAND parts
| KEEP id, parts""", {})
    assert rows(got) == [(1, "a"), (1, "a"), (1, "b")]


def test_row_and_arithmetic(spark):
    got = esql(spark, 'ROW x = 5, y = 2 | EVAL q = x / y, m = x % y, '
                      'p = POW(x, 2)', {}).collect()[0]
    assert (got["q"], got["m"], got["p"]) == (2.5, 1, 25.0)


# ------------------------------------------------------- DISSECT / GROK

def test_dissect_extracts_fields(spark, tables):
    got = esql(spark, """
ROW line = "2024-01-01 INFO api ok"
| DISSECT line "%{date} %{level} %{svc} %{msg}"
| KEEP date, level, svc, msg""", {})
    assert got.collect()[0].asDict() == {
        "date": "2024-01-01", "level": "INFO", "svc": "api", "msg": "ok"}


def test_dissect_no_match_gives_nulls(spark):
    got = esql(spark, 'ROW line = "nodelim" '
                      '| DISSECT line "%{a}:%{b}" | KEEP a, b', {})
    assert got.collect()[0].asDict() == {"a": None, "b": None}


def test_grok_typed_extraction(spark, tables):
    got = esql(spark, """
FROM events
| GROK props "\\"k\\": %{INT:kv:int}"
| STATS s = SUM(kv), n = COUNT(kv)""", tables).collect()[0]
    ev = tables["events"]
    want = (ev.select(F.regexp_extract("props", r'"k": (\d+)', 1)
                      .cast("long").alias("kv"))
            .agg(F.sum("kv"), F.count("kv")).collect()[0])
    assert (got["s"], got["n"]) == (want[0], want[1])


def test_grok_unknown_pattern_rejected(spark):
    with pytest.raises(EsqlError, match="unknown pattern"):
        esql(spark, 'ROW a = "x" | GROK a "%{NOPE:f}"', {})


# --------------------------------------------------- LOOKUP JOIN / ENRICH

def test_lookup_join_broadcasts_and_lookup_wins(spark, tables):
    orders = tables["orders"]
    cust = (tables["customer"]
            .select(F.col("c_custkey").alias("o_custkey"),
                    F.col("c_name").alias("cname"),
                    F.lit("FROM_LOOKUP").alias("o_orderstatus")))
    got = esql(spark, """
FROM orders
| LOOKUP JOIN cust ON o_custkey
| STATS n = COUNT(*) BY o_orderstatus""",
               {"orders": orders, "cust": cust})
    r = got.collect()
    # collision: lookup's o_orderstatus replaced the left's
    assert [x["o_orderstatus"] for x in r] == ["FROM_LOOKUP"]
    assert r[0]["n"] == orders.count()
    plan = esql(spark, "FROM orders | LOOKUP JOIN cust ON o_custkey",
                {"orders": orders, "cust": cust}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_enrich_with_selected_fields(spark, tables):
    pol = (tables["customer"]
           .select(F.col("c_custkey").alias("o_custkey"), "c_name",
                   "c_acctbal"))
    got = esql(spark, """
FROM orders
| ENRICH custpol ON o_custkey WITH who = c_name
| WHERE who IS NOT NULL
| KEEP o_orderkey, who
| SORT o_orderkey
| LIMIT 3""", {"orders": tables["orders"], "custpol": pol})
    assert got.columns == ["o_orderkey", "who"]
    assert got.count() == 3


# -------------------------------------------------------- full-text path

def test_match_score_rank_identical_to_bm25(spark, tables):
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.bm25 import (
        bm25_score_terms,
    )
    got = esql(spark, """
FROM documents METADATA _score
| WHERE MATCH(text, "spark query")
| KEEP doc_id, _score
| SORT _score DESC, doc_id
| LIMIT 10""", tables, analyzer="simple")
    sc = bm25_score_terms(tables["documents"], ["query", "spark"],
                          EngineConfig(), id_col="doc_id", text_col="text",
                          analyzer="simple")
    want = (sc.orderBy(F.desc("score"), "doc_id").limit(10)
            .select("doc_id", F.col("score").alias("_score")))
    assert got.collect() == want.collect()


def test_match_as_boolean_without_score(spark, tables):
    got = esql(spark, """
FROM documents
| WHERE MATCH(text, "spark") AND lang == "en"
| STATS n = COUNT(*)""", tables).collect()[0][0]
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_expr,
    )
    d = tables["documents"]
    want = d.filter(F.array_contains(tokenize_expr("text", "simple"),
                                     "spark")
                    & (F.col("lang") == "en")).count()
    assert got == want


def test_match_colon_operator(spark, tables):
    a = esql(spark, 'FROM documents | WHERE text : "spark" '
                    '| STATS n = COUNT(*)', tables)
    b = esql(spark, 'FROM documents | WHERE MATCH(text, "spark") '
                    '| STATS n = COUNT(*)', tables)
    assert a.collect() == b.collect()


def test_score_with_residual_filter(spark, tables):
    got = esql(spark, """
FROM documents METADATA _score
| WHERE MATCH(text, "spark") AND lang == "en"
| SORT _score DESC, doc_id
| LIMIT 5""", tables)
    assert got.count() == 5
    langs = {r["lang"] for r in got.collect()}
    assert langs == {"en"}


# ---------------------------------------------------------------- errors

def test_now_injected_clock(spark, tables):
    """NOW() compiles to the injected per-request instant; every
    NOW() in one query sees the same clock (ES evaluates now once per
    request); without an injected clock it raises (deterministic
    plans — the engine never reads the wall clock)."""
    import datetime as dt

    got = esql(spark, """
FROM events
| WHERE ts > NOW() - 3 day AND ts <= NOW()
| STATS n = COUNT(*)""", tables, now="1998-06-05 00:00:00").collect()[0]
    lo = dt.datetime(1998, 6, 2)
    hi = dt.datetime(1998, 6, 5)
    want = tables["events"].filter(
        (F.col("ts") > F.lit(lo)) & (F.col("ts") <= F.lit(hi))).count()
    assert got["n"] == want
    # datetime object form + EVAL projection of the instant itself
    r = esql(spark, "ROW x = 1 | EVAL t = NOW()", {},
             now=dt.datetime(2024, 1, 2, 3, 4, 5)).collect()[0]
    assert r["t"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    with pytest.raises(EsqlError, match="takes no arguments"):
        esql(spark, "ROW x = 1 | EVAL t = NOW(3)", {}, now="2024-01-01")


def test_timestamp_span_arithmetic(spark):
    """ts ± span compiles to exact-seconds timestamp math for fixed
    spans and INTERVAL for calendar spans; span-minus-timestamp and
    spans outside date expressions still raise."""
    import datetime as dt

    d = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1, 10, 30),)], "ts timestamp")
    r = esql(spark, """
FROM d
| EVAL plus_h = ts + 2 hour, minus_d = ts - 3 day, plus_mo = ts + 1 month
""", {"d": d}).collect()[0]
    assert r["plus_h"] == dt.datetime(2024, 3, 1, 12, 30)
    assert r["minus_d"] == dt.datetime(2024, 2, 27, 10, 30)
    assert r["plus_mo"] == dt.datetime(2024, 4, 1, 10, 30)
    with pytest.raises(EsqlError, match="span - timestamp"):
        esql(spark, "FROM d | EVAL x = 1 hour - ts", {"d": d})
    with pytest.raises(EsqlError, match="span literal"):
        esql(spark, "FROM d | EVAL x = ABS(1 hour)", {"d": d})


def test_rerank_builtin_lexical(spark):
    """RERANK with the builtin lexical-rerank endpoint: coverage =
    |distinct field tokens ∩ query terms| / |query terms| under the
    simple analyzer; pure Catalyst (no Python stage in the plan);
    target _score re-sorts like ES's reranker."""
    d = spark.createDataFrame([
        (1, "spark query engine"),
        (2, "distributed systems"),
        (3, "query planning in distributed query engines"),
    ], "doc_id long, text string")
    out = esql(spark, """
FROM d
| RERANK "distributed query engine" ON text
| EVAL r = TO_LONG(FLOOR(_score * 100.0 + 0.5))
| KEEP doc_id, r | SORT r DESC, doc_id""", {"d": d})
    assert [(x["doc_id"], x["r"]) for x in out.collect()] == \
        [(1, 67), (3, 67), (2, 33)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # builtin stays in codegen


def test_rerank_completion_registered_endpoints(spark):
    """Registered endpoints run as ONE Arrow-batched pandas UDF:
    rerank fn(query, texts)->floats, completion fn(prompts)->strs;
    custom target names; WITH map + bare-ident forms; task-type and
    unknown-endpoint errors; ON multi-field concatenation."""
    from elasticsearch_osmosis_plugin_spark.operators.inference import (
        delete_inference, list_inference, put_inference,
    )

    d = spark.createDataFrame([(1, "ab", "x"), (2, "abcd", "yz")],
                              "doc_id long, text string, extra string")
    def rr(query, texts):
        # fold the query length in so the output proves the query
        # string reached the endpoint (the closure is pickled to the
        # UDF worker, so side-effect capture can't)
        return (texts.str.len() + len(query)).astype(float)

    put_inference("len-rerank", "rerank", rr)
    put_inference("upper", "completion", lambda s: s.str.upper())
    try:
        assert list_inference()["len-rerank"] == "rerank"
        got = esql(spark, """
FROM d
| RERANK s2 = "q" ON text, extra WITH { "inference_id" : "len-rerank" }
| KEEP doc_id, s2 | SORT doc_id""", {"d": d}).collect()
        # ON multi-field concat "ab\nx" (4), "abcd\nyz" (7), +1 for
        # len("q") — proves both the field concat and the query text
        # reached the endpoint
        assert [(r["doc_id"], r["s2"]) for r in got] == [(1, 5.0),
                                                         (2, 8.0)]
        got = esql(spark, """
FROM d
| COMPLETION ans = CONCAT("p: ", text) WITH upper
| KEEP doc_id, ans | SORT doc_id""", {"d": d}).collect()
        assert [r["ans"] for r in got] == ["P: AB", "P: ABCD"]
        with pytest.raises(EsqlError, match="unknown inference"):
            esql(spark, 'FROM d | COMPLETION text WITH nope', {"d": d})
        with pytest.raises(EsqlError, match="task_type"):
            esql(spark, 'FROM d | RERANK "q" ON text WITH upper',
                 {"d": d})
        with pytest.raises(EsqlError, match="WITH <inference_id>"):
            esql(spark, 'FROM d | COMPLETION text', {"d": d})
    finally:
        delete_inference("len-rerank")
        delete_inference("upper")


def test_now_rejected_sample_deterministic(spark, tables):
    with pytest.raises(EsqlError, match="NOW"):
        esql(spark, "FROM events | EVAL t = NOW()", tables)
    a = esql(spark, "FROM events | SAMPLE 0.3 | STATS n = COUNT(*)",
             tables).collect()[0]["n"]
    b = esql(spark, "FROM events | SAMPLE 0.3 | STATS n = COUNT(*)",
             tables).collect()[0]["n"]
    total = tables["events"].count()
    assert a == b                      # deterministic across runs
    assert 0.15 * total < a < 0.45 * total
    with pytest.raises(EsqlError, match="probability"):
        esql(spark, "FROM events | SAMPLE 1.5", tables)


def test_unknown_index_function_command(spark, tables):
    with pytest.raises(EsqlError, match="unknown index"):
        esql(spark, "FROM nope", tables)
    with pytest.raises(EsqlError, match="unknown function"):
        esql(spark, "FROM events | EVAL x = FROB(value)", tables)
    with pytest.raises(EsqlError, match="unknown command"):
        esql(spark, "FROM events | FROBNICATE x", tables)
    with pytest.raises(EsqlError, match="trailing"):
        esql(spark, "FROM events | LIMIT 5 7", tables)


def test_from_wildcard_union_and_metadata_index(spark, tables):
    got = esql(spark, """
FROM doc* METADATA _index
| STATS n = COUNT(*) BY _index""", tables)
    r = got.collect()
    assert [x["_index"] for x in r] == ["documents"]
    assert r[0]["n"] == tables["documents"].count()


def test_metadata_id(spark):
    """METADATA _id exposes the engine's id column as ES's string doc
    _id; unknown metadata names still raise."""
    d = spark.createDataFrame([(7, "a"), (8, "b")],
                              "doc_id long, text string")
    rows = esql(spark, "FROM d METADATA _id | KEEP _id, text | SORT _id",
                {"d": d}).collect()
    assert [(r["_id"], r["text"]) for r in rows] == [("7", "a"),
                                                     ("8", "b")]
    with pytest.raises(EsqlError, match="_id needs the id column"):
        esql(spark, "FROM d METADATA _id", {"d": d}, id_col="nope")
    with pytest.raises(EsqlError, match="not supported"):
        esql(spark, "FROM d METADATA _version", {"d": d})


def test_sort_nulls_first_last(spark):
    t = {"t": None}
    got = esql(spark, """
ROW a = 1 | EVAL b = CASE(a == 2, "x") | KEEP b""", {})
    assert got.collect()[0][0] is None  # CASE without default -> null


# ----------------------------------------------- INLINESTATS / CHANGE_POINT

def test_inlinestats_appends_group_aggregate(spark, tables):
    got = esql(spark, """
FROM events
| INLINESTATS avg_v = AVG(value) BY event_type
| EVAL above = value > avg_v
| STATS n_above = COUNT(*) WHERE above, n = COUNT(*) BY event_type
| SORT event_type""", tables)
    ev = tables["events"]
    from pyspark.sql import Window
    w = Window.partitionBy("event_type")
    want = (ev.withColumn("avg_v", F.avg("value").over(w))
            .withColumn("above", F.col("value") > F.col("avg_v"))
            .groupBy("event_type")
            .agg(F.count(F.when(F.col("above"), 1)).alias("n_above"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("event_type"))
    assert got.collect() == want.collect()


def test_inlinestats_no_by_broadcasts_global(spark, tables):
    got = esql(spark, """
FROM events
| INLINESTATS gmax = MAX(value)
| WHERE value == gmax
| KEEP event_id, value""", tables)
    ev = tables["events"]
    want_max = ev.agg(F.max("value")).collect()[0][0]
    out = got.collect()
    assert len(out) >= 1 and all(r["value"] == want_max for r in out)


def test_inlinestats_rejects_fresh_by_expr(spark, tables):
    with pytest.raises(EsqlError, match="EVALed"):
        esql(spark, "FROM events | INLINESTATS n = COUNT(*) "
                    "BY d = BUCKET(ts, 1 day)", tables)


def test_change_point_detects_step(spark):
    rows = [(i, 10.0 if i < 30 else 25.0) for i in range(60)]
    df = spark.createDataFrame(rows, "t long, v double")
    got = esql(spark, "FROM s | CHANGE_POINT v ON t", {"s": df})
    hit = [r for r in got.collect() if r["type"] is not None]
    assert len(hit) == 1
    assert hit[0]["type"] == "step_change"
    assert abs(hit[0]["t"] - 30) <= 2
    assert hit[0]["pvalue"] < 1e-6


def test_change_point_detects_spike_and_dip(spark):
    from elasticsearch_osmosis_plugin_spark.operators.changepoint import (
        detect_series,
    )
    base = [10.0 + (i % 3) * 0.1 for i in range(50)]
    spike = list(base)
    spike[25] = 100.0
    kind, p, idx = detect_series(spike)
    assert (kind, idx) == ("spike", 25) and p < 1e-10
    dip = list(base)
    dip[7] = -80.0
    kind, p, idx = detect_series(dip)
    assert (kind, idx) == ("dip", 7)
    assert detect_series(base)[0] == "stationary"
    assert detect_series(base[:10])[0] == "indeterminable"


def test_change_point_trend_change(spark):
    from elasticsearch_osmosis_plugin_spark.operators.changepoint import (
        detect_series,
    )
    series = [0.1 * i for i in range(40)] + [4.0 + 2.5 * i for i in range(40)]
    kind, p, idx = detect_series(series)
    assert kind in ("trend_change", "step_change")
    assert 30 <= idx <= 50


def test_change_point_grouped_operator(spark):
    from elasticsearch_osmosis_plugin_spark.operators.changepoint import (
        change_point,
    )
    rows = ([("a", i, 5.0 if i < 20 else 50.0) for i in range(40)]
            + [("b", i, 7.0 + (i % 2) * 0.01) for i in range(40)])
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = change_point(df, "v", "t", by=["k"]).collect()
    a_hits = [r for r in out if r["k"] == "a" and r["type"] is not None]
    b_hits = [r for r in out if r["k"] == "b" and r["type"] is not None]
    assert len(a_hits) == 1 and a_hits[0]["type"] == "step_change"
    assert b_hits == []


def test_change_point_as_renames_output(spark):
    rows = [(i, 1.0 if i < 30 else 9.0) for i in range(60)]
    df = spark.createDataFrame(rows, "t long, v double")
    got = esql(spark, "FROM s | CHANGE_POINT v ON t AS ct, cp", {"s": df})
    assert "ct" in got.columns and "cp" in got.columns


# ------------------------------------------------------------------- KNN

def test_knn_rank_identical_to_cosine_topk(spark):
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        cosine_topk,
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    lit = ", ".join(repr(x) for x in qv)
    got = esql(spark, f"""
FROM emb METADATA _score
| WHERE KNN(embedding, [{lit}], 10)
| SORT _score DESC, vec_id
| KEEP vec_id, _score""", {"emb": emb}, id_col="vec_id")
    want = (cosine_topk(emb, qv, k=10)
            .select("vec_id", F.col("cos").alias("_score"))
            .orderBy(F.desc("_score"), "vec_id"))
    assert got.collect() == want.collect()


def test_knn_with_residual_postfilter(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    lit = ", ".join(repr(x) for x in qv)
    got = esql(spark, f"""
FROM emb METADATA _score
| WHERE KNN(embedding, [{lit}], 20) AND vec_id % 2 == 0
| KEEP vec_id""", {"emb": emb}, id_col="vec_id")
    out = [r["vec_id"] for r in got.collect()]
    assert 0 < len(out) <= 20 and all(v % 2 == 0 for v in out)


def test_knn_errors(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(EsqlError, match="METADATA _score"):
        esql(spark, "FROM emb | WHERE KNN(embedding, [1.0], 5)",
             {"emb": emb}, id_col="vec_id")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(EsqlError, match="hybrid"):
        esql(spark, 'FROM d METADATA _score | WHERE '
                    'KNN(embedding, [1.0], 5) AND MATCH(text, "x")',
             {"d": docs})


# ------------------------------------------------------------------ FORK

def test_fork_unions_branches_with_discriminator(spark, tables):
    got = esql(spark, """
FROM events
| FORK (WHERE event_type == "view" | STATS n = COUNT(*))
       (WHERE event_type == "error" | STATS n = COUNT(*))
| KEEP _fork, n
| SORT _fork""", tables)
    ev = tables["events"]
    out = got.collect()
    assert [r["_fork"] for r in out] == ["fork1", "fork2"]
    assert out[0]["n"] == ev.filter(F.col("event_type") == "view").count()
    assert out[1]["n"] == ev.filter(F.col("event_type") == "error").count()


def test_fork_missing_columns_null_filled(spark, tables):
    got = esql(spark, """
FROM events
| FORK (STATS a = COUNT(*)) (STATS b = SUM(value))
| SORT _fork""", tables)
    rows_ = got.collect()
    assert got.columns == ["a", "_fork", "b"]
    assert rows_[0]["b"] is None and rows_[1]["a"] is None


def test_fork_errors(spark, tables):
    with pytest.raises(EsqlError, match="at least two"):
        esql(spark, "FROM events | FORK (LIMIT 1)", tables)
    with pytest.raises(EsqlError, match="unbalanced"):
        esql(spark, "FROM events | FORK (LIMIT 1 (LIMIT 2)", tables)


# ---------------------------------------------------- persisted-index path

def test_esql_index_rank_identical_to_topk(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql_index
    from elasticsearch_osmosis_plugin_spark.operators.query import topk
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx,
                EngineConfig(analyzer="simple", n_segments=4, n_buckets=4,
                             block_size=64),
                id_col="doc_id", text_col="text", carry_cols=["lang"])
    got = esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark query join")
| SORT _score DESC, doc_id
| LIMIT 10""", idx)
    want = topk(spark, idx, "spark query join", k=10) \
        .withColumnRenamed("score", "_score") \
        .orderBy(F.desc("_score"), "doc_id")
    assert got.collect() == want.collect()
    # residual conjunct -> exact post_filter + KEEP hydration
    got_pf = esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark query join") AND lang == "en"
| KEEP doc_id, _score, lang
| SORT _score DESC, doc_id
| LIMIT 5""", idx)
    want_pf = topk(spark, idx, "spark query join", k=5,
                   post_filter=F.col("lang") == "en")
    assert [r["doc_id"] for r in got_pf.collect()] \
        == [r["doc_id"] for r in want_pf.collect()]
    assert all(r["lang"] == "en" for r in got_pf.collect())
    assert got_pf.columns == ["doc_id", "_score", "lang"]


def test_esql_index_rejects_other_shapes(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql_index
    with pytest.raises(EsqlError, match="METADATA _score"):
        esql_index(spark, "FROM d | LIMIT 5", "/nope")
    with pytest.raises(EsqlError, match="canonical"):
        esql_index(spark, "FROM d METADATA _score | STATS n = COUNT(*)",
                   "/nope")
    with pytest.raises(EsqlError, match="need WHERE MATCH"):
        esql_index(spark, "FROM d METADATA _score | LIMIT 5", "/nope")


# ------------------------------------------------------------- IP functions

def test_ip_functions(spark):
    got = esql(spark, """
ROW ips = ["10.1.2.3", "10.255.0.1", "192.168.1.77", "8.8.8.8",
           "999.1.1.1", "nope"]
| MV_EXPAND ips
| EVAL ok = TO_IP(ips) IS NOT NULL,
       in10 = CIDR_MATCH(ips, "10.0.0.0/8"),
       inany = CIDR_MATCH(ips, "10.0.0.0/8", "192.168.0.0/16"),
       p24 = IP_PREFIX(ips, 24)
| KEEP ips, ok, in10, inany, p24""", {})
    r = {x["ips"]: x for x in got.collect()}
    assert r["10.1.2.3"]["ok"] and r["999.1.1.1"]["ok"] is False
    assert r["nope"]["ok"] is False
    assert r["10.1.2.3"]["in10"] and r["10.255.0.1"]["in10"]
    assert not r["192.168.1.77"]["in10"] and r["192.168.1.77"]["inany"]
    assert not r["8.8.8.8"]["inany"]
    assert r["10.1.2.3"]["p24"] == "10.1.2.0"
    assert r["192.168.1.77"]["p24"] == "192.168.1.0"
    assert r["999.1.1.1"]["p24"] is None
    with pytest.raises(EsqlError, match="bad CIDR"):
        esql(spark, 'ROW a = "1.2.3.4" | EVAL x = CIDR_MATCH(a, "bogus")',
             {})


def test_scoring_where_or_not_match(spark):
    """match() under OR/NOT in a scoring WHERE scores like Lucene:
    every distinct matching clause contributes its BM25 score, a
    NOT'd clause contributes 0 to every survivor, and a duplicated
    identical match conjunct scores ONCE, not twice."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha gamma"), (3, "delta")],
        "doc_id long, text string")
    t = {"docs": docs}
    # per-clause solo scores
    s_alpha = {r["doc_id"]: r["_score"] for r in esql(
        spark, 'FROM docs METADATA _score | WHERE match(text, "alpha") '
               '| KEEP doc_id, _score', t).collect()}
    s_beta = {r["doc_id"]: r["_score"] for r in esql(
        spark, 'FROM docs METADATA _score | WHERE match(text, "beta") '
               '| KEEP doc_id, _score', t).collect()}
    # OR: union of matchers, score = sum of matching clause scores
    got = {r["doc_id"]: r["_score"] for r in esql(
        spark, 'FROM docs METADATA _score '
               '| WHERE match(text, "alpha") OR match(text, "beta") '
               '| KEEP doc_id, _score', t).collect()}
    assert set(got) == {1, 2}
    for d in got:
        assert got[d] == pytest.approx(
            s_alpha.get(d, 0.0) + s_beta.get(d, 0.0))
    # AND NOT: doc 1 has beta -> excluded; doc 2 scores alpha alone
    got2 = {r["doc_id"]: r["_score"] for r in esql(
        spark, 'FROM docs METADATA _score '
               '| WHERE match(text, "alpha") AND NOT match(text, "beta") '
               '| KEEP doc_id, _score', t).collect()}
    assert set(got2) == {2}
    assert got2[2] == pytest.approx(s_alpha[2])
    once = esql(spark, 'FROM docs METADATA _score '
                       '| WHERE match(text, "alpha") '
                       '| KEEP doc_id, _score | SORT doc_id', t).collect()
    twice = esql(spark, 'FROM docs METADATA _score '
                        '| WHERE match(text, "alpha") AND match(text, "alpha") '
                        '| KEEP doc_id, _score | SORT doc_id', t).collect()
    assert [tuple(r) for r in twice] == [tuple(r) for r in once]


def test_hyphenated_index_and_from_names(spark):
    """FROM logs-2024 / logs-app-default parse without backquotes —
    the common ES index/data-stream naming convention; '-' still
    subtracts in expressions."""
    df = spark.createDataFrame([(1, 5), (2, 7)], "id long, v long")
    t = {"logs-2024": df, "logs-app-default": df}
    assert esql(spark, "FROM logs-2024 | STATS n = COUNT(*)",
                t).collect()[0]["n"] == 2
    assert esql(spark, "FROM logs-app-default | WHERE v - 1 == 6 "
                       "| STATS n = COUNT(*)", t).collect()[0]["n"] == 1
    # wildcard over hyphenated names
    assert esql(spark, "FROM logs-* | STATS n = COUNT(*)",
                t).collect()[0]["n"] == 4


def test_cross_cluster_from(spark):
    """FROM cluster:index — qualified names resolve from the same
    tables mapping; METADATA _index stamps remote hits with the
    qualified name; wildcard rules follow ES CCS (an unqualified
    pattern never matches a remote key; the cluster part of a
    qualified pattern may itself be a wildcard)."""
    loc = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    rem = spark.createDataFrame([(3, 30)], "id long, v long")
    t = {"events": loc, "archive:events": rem}

    # explicit qualified name unions with the local index
    got = esql(spark, "FROM events, archive:events | STATS n = COUNT(*),"
                      " s = SUM(v)", t).collect()[0]
    assert (got["n"], got["s"]) == (3, 60)

    # METADATA _index carries the qualified name on remote hits
    rows = esql(spark, """
FROM events, archive:events METADATA _index
| STATS n = COUNT(*) BY _index | SORT _index""", t).collect()
    assert [(r["_index"], r["n"]) for r in rows] == \
        [("archive:events", 1), ("events", 2)]

    # cluster-qualified wildcards: both parts may be patterns
    assert esql(spark, "FROM archive:ev* | STATS n = COUNT(*)",
                t).collect()[0]["n"] == 1
    assert esql(spark, "FROM *:events | STATS n = COUNT(*)",
                t).collect()[0]["n"] == 1
    # unqualified wildcards match ONLY local names (ES CCS rule)
    assert esql(spark, "FROM * | STATS n = COUNT(*)",
                t).collect()[0]["n"] == 2
    assert esql(spark, "FROM ev* | STATS n = COUNT(*)",
                t).collect()[0]["n"] == 2
    with pytest.raises(EsqlError, match="unknown index"):
        esql(spark, "FROM nope:events", t)
    # ':' still lexes as the match operator in expressions
    d = spark.createDataFrame([("a b",), ("c",)], "text string")
    n = esql(spark, 'FROM d METADATA _score | WHERE text:"b" '
                    '| STATS n = COUNT(*)', {"d": d},
             id_col="text").collect()[0]["n"]
    assert n == 1


def test_sample_id_keyed_independent_draws(spark):
    """SAMPLE keys its deterministic Bernoulli draw on the id column
    when present: byte-identical duplicate payload rows with distinct
    ids draw independently (content-keyed hashing would keep/drop
    them as a block)."""
    # 200 rows, all with IDENTICAL payload except doc_id
    df = spark.range(200).selectExpr("id AS doc_id", "'same' AS text")
    n = esql(spark, "FROM d | SAMPLE 0.5 | STATS n = COUNT(*)",
             {"d": df}).collect()[0]["n"]
    # id-keyed: binomial(200, .5) — [60, 140] is a >8-sigma window;
    # content-keyed would give exactly 0 or 200
    assert 60 < n < 140
    # deterministic: the same query re-runs to the same count
    n2 = esql(spark, "FROM d | SAMPLE 0.5 | STATS n = COUNT(*)",
              {"d": df}).collect()[0]["n"]
    assert n2 == n


def _geo_pts(spark):
    return (spark.createDataFrame(
        [(1, 2.3522, 48.8566), (2, 10.0, 50.0),
         (3, -70.0, -10.0), (4, 0.0, 0.0), (5, 150.0, -35.0)],
        "doc_id long, lon double, lat double")
        .withColumn("location", F.struct("lon", "lat")))


def test_st_functions(spark):
    """ST_* spatial family over geo_point struct columns: distance in
    meters (haversine, mean radius), accessors, and the four relations
    vs POLYGON / ENVELOPE / POINT WKT literals — the geo kernels from
    operators.geo wired into the language (ref: the server-side
    geo query surface the plugin's users reach, ESWayITest.java)."""
    got = {r["doc_id"]: r for r in esql(spark, """
FROM pts
| EVAL d = ST_DISTANCE(location, TO_GEOPOINT("POINT (2.3522 48.8566)")),
       x = ST_X(location), y = ST_Y(location),
       inter = ST_INTERSECTS(location,
                             TO_GEOSHAPE("POLYGON ((0 40, 20 40, 20 60, 0 60))")),
       cont = ST_CONTAINS(TO_GEOSHAPE("ENVELOPE (-80, -60, 0, -20)"),
                          location),
       wi = ST_WITHIN(location, TO_GEOSHAPE("ENVELOPE (-80, -60, 0, -20)")),
       dis = ST_DISJOINT(location,
                         TO_GEOSHAPE("POLYGON ((0 40, 20 40, 20 60, 0 60))")),
       eq = ST_INTERSECTS(location, TO_GEOPOINT("POINT (0 0)"))
| KEEP doc_id, d, x, y, inter, cont, wi, dis, eq
| SORT doc_id""", {"pts": _geo_pts(spark)}).collect()}
    assert got[1]["d"] == 0.0
    # Paris->(10E, 50N) great-circle: ~567 km
    assert abs(got[2]["d"] - 567_246.119) < 1.0
    assert got[1]["x"] == 2.3522 and got[1]["y"] == 48.8566
    assert [got[i]["inter"] for i in range(1, 6)] == \
        [True, True, False, False, False]
    assert [got[i]["dis"] for i in range(1, 6)] == \
        [False, False, True, True, True]
    assert [got[i]["cont"] for i in range(1, 6)] == \
        [False, False, True, False, False]
    assert got[3]["wi"] and not got[1]["wi"]
    assert [got[i]["eq"] for i in range(1, 6)] == \
        [False, False, False, True, False]


def test_st_functions_edge_cases(spark):
    """TO_GEOPOINT null-on-malformed; point-side CONTAINS/WITHIN;
    closed-ring WKT == open-ring WKT; unsupported WKT raises; a
    two-field-side relation raises (spatial join out of scope)."""
    pts = _geo_pts(spark)
    got = {r["doc_id"]: r for r in esql(spark, """
FROM pts
| EVAL bad = TO_GEOPOINT("LINESTRING (0 0, 1 1)"),
       pc = ST_CONTAINS(location, TO_GEOPOINT("POINT (0 0)")),
       pw = ST_WITHIN(TO_GEOPOINT("POINT (0 0)"), location),
       pcpoly = ST_CONTAINS(location,
                            TO_GEOSHAPE("POLYGON ((0 40, 20 40, 20 60, 0 60))")),
       closed = ST_INTERSECTS(location,
                TO_GEOSHAPE("POLYGON ((0 40, 20 40, 20 60, 0 60, 0 40))"))
| KEEP doc_id, bad, pc, pw, pcpoly, closed""",
                                       {"pts": pts}).collect()}
    assert all(got[i]["bad"] is None for i in range(1, 6))
    # a point contains (only) the equal point; never a polygon
    assert got[4]["pc"] and not got[1]["pc"]
    assert got[4]["pw"] and not got[2]["pw"]
    assert all(got[i]["pcpoly"] is False for i in range(1, 6))
    assert got[1]["closed"] and got[2]["closed"] and not got[3]["closed"]
    with pytest.raises(EsqlError, match="unsupported WKT"):
        esql(spark, 'FROM pts | EVAL z = ST_INTERSECTS(location, '
                    'TO_GEOSHAPE("MULTIPOINT (0 0)"))', {"pts": pts})
    with pytest.raises(EsqlError, match="WKT literal"):
        esql(spark, 'FROM pts | EVAL z = ST_INTERSECTS(location, '
                    'location)', {"pts": pts})
    with pytest.raises(EsqlError, match="POINT"):
        esql(spark, 'FROM pts | EVAL z = ST_DISTANCE(location, '
                    '"POLYGON ((0 0, 1 0, 1 1))")', {"pts": pts})


# ------------------------------------------------------------ plan shapes

from tests.test_plans import _plan  # noqa: E402 — shared plan renderer


def test_esql_where_pushes_filters_to_scan(spark, tables):
    out = esql(spark, """
FROM events
| WHERE event_type == "view" AND value > 100.0
| KEEP event_id, value""", tables)
    plan = _plan(out)
    assert "PushedFilters: [" in plan
    assert "event_type" in plan.split("PushedFilters")[1][:200]
    # column pruning: text-free schema read
    assert "props" not in plan.split("ReadSchema")[1][:200]


def test_esql_sort_limit_is_take_ordered(spark, tables):
    out = esql(spark, "FROM events | SORT value DESC, event_id "
                      "| LIMIT 5", tables)
    assert "TakeOrderedAndProject" in _plan(out)


def test_extended_function_library(spark):
    got = esql(spark, """
ROW x = 0.5, s = "hi", a = [3.0, 1.0, 2.0], b = [1.0, 2.0, 3.0, 4.0]
| EVAL sn = ROUND(SIN(x), 4), deg = TO_DEGREES(PI()),
       b64 = TO_BASE64(s), rt = FROM_BASE64(TO_BASE64(s)),
       bl = BIT_LENGTH(s), sp = CONCAT("a", SPACE(2), "b"),
       m1 = MV_MEDIAN(a), m2 = MV_MEDIAN(b),
       z = MV_ZIP(["a", "b"], ["1", "2"], "-")""", {}).collect()[0]
    import math
    assert got["sn"] == round(math.sin(0.5), 4)
    assert abs(got["deg"] - 180.0) < 1e-9
    assert got["rt"] == "hi" and got["bl"] == 16
    assert got["sp"] == "a  b"
    assert got["m1"] == 2.0 and got["m2"] == 2.5
    assert got["z"] == ["a-1", "b-2"]


def test_esql_index_multi_matches_topk_multi(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql_index
    from elasticsearch_osmosis_plugin_spark.operators.query import topk_multi
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cfg = EngineConfig(analyzer="simple", n_segments=4, n_buckets=4,
                       block_size=64)
    a, b = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(spark, docs.filter("doc_id % 2 = 0"), a, cfg,
                id_col="doc_id", text_col="text")
    build_index(spark, docs.filter("doc_id % 2 = 1"), b, cfg,
                id_col="doc_id", text_col="text")
    got = esql_index(spark, """
FROM ia, ib METADATA _score
| WHERE MATCH(text, "spark query")
| SORT _score DESC, doc_id
| LIMIT 10""", [a, b])
    want = (topk_multi(spark, [a, b], "spark query", k=10)
            .withColumnRenamed("score", "_score")
            .orderBy(F.desc("_score"), "doc_id"))
    assert got.collect() == want.collect()

    # residual WHERE conjunct -> topk_multi post_filter (B6: scores
    # stay union-corpus global, k after filter). Twin: single-index
    # rebuild over the union corpus with the same post_filter.
    from elasticsearch_osmosis_plugin_spark.operators.query import topk

    u = str(tmp_path / "iu")
    build_index(spark, docs, u, cfg, id_col="doc_id", text_col="text")
    got_f = esql_index(spark, """
FROM ia, ib METADATA _score
| WHERE MATCH(text, "spark query") AND lang == "en"
| SORT _score DESC, doc_id
| LIMIT 10""", [a, b])
    want_f = (topk(spark, u, "spark query", k=10,
                   post_filter=F.col("lang") == "en")
              .withColumnRenamed("score", "_score")
              .orderBy(F.desc("_score"), "doc_id"))
    gf, wf = got_f.collect(), want_f.collect()
    assert [r["doc_id"] for r in gf] == [r["doc_id"] for r in wf]
    for g, w in zip(gf, wf):
        assert abs(g["_score"] - w["_score"]) < 1e-9

    # KEEP of a carry column hydrates from the docstats union on the
    # k-bounded hit frame, order still governed by the SORT
    got_k = esql_index(spark, """
FROM ia, ib METADATA _score
| WHERE MATCH(text, "spark query") AND lang == "en"
| KEEP doc_id, lang
| SORT _score DESC, doc_id
| LIMIT 10""", [a, b]).collect()
    assert got_k and all(r["lang"] == "en" for r in got_k)
    assert [r["doc_id"] for r in got_k] == [r["doc_id"] for r in gf]


def test_esql_index_keep_preserves_score_order(spark, tmp_path):
    """Regression: KEEP doc_id (dropping _score) must NOT re-sort by
    doc_id — KEEP is a projection, the requested SORT governs."""
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql_index
    from elasticsearch_osmosis_plugin_spark.operators.query import topk
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "iko")
    build_index(spark, docs, idx,
                EngineConfig(analyzer="simple", n_segments=4, n_buckets=4,
                             block_size=64),
                id_col="doc_id", text_col="text")
    got = [r["doc_id"] for r in esql_index(spark, """
FROM d METADATA _score
| WHERE MATCH(text, "spark query join")
| SORT _score DESC, doc_id
| KEEP doc_id
| LIMIT 10""", idx).collect()]
    want = [r["doc_id"] for r in
            topk(spark, idx, "spark query join", k=10).collect()]
    assert got == want
    assert got != sorted(got)          # i.e. genuinely score-ordered


# ------------------------------------------------- round-4b: ft + fusion

def test_match_phrase_filter(spark):
    """MATCH_PHRASE: consecutive analyzed tokens only — 'spark query'
    must not match 'query spark' or a gapped 'spark .. query'."""
    d = spark.createDataFrame(
        [(1, "big spark query engine"), (2, "query spark join"),
         (3, "spark fast query"), (4, None)],
        "doc_id long, text string")
    got = [r["doc_id"] for r in esql(
        spark, 'FROM d | WHERE MATCH_PHRASE(text, "Spark QUERY") '
               '| KEEP doc_id | SORT doc_id', {"d": d}).collect()]
    assert got == [1]
    # empty-analysis query matches nothing
    assert esql(spark, 'FROM d | WHERE MATCH_PHRASE(text, "!!")',
                {"d": d}).count() == 0
    with pytest.raises(EsqlError, match="MATCH_PHRASE.field, query."):
        esql(spark, 'FROM d | WHERE MATCH_PHRASE(text)', {"d": d})


def test_match_phrase_equals_index_path(spark, tables, tmp_path):
    """Table-path MATCH_PHRASE == positional-postings match_phrase on
    the same corpus (the two phrase kernels agree doc-for-doc)."""
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        match_phrase,
    )
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = tables["documents"]
    idx = str(tmp_path / "iph")
    build_index(spark, docs, idx,
                EngineConfig(analyzer="simple", n_segments=4,
                             n_buckets=4, block_size=64),
                id_col="doc_id", text_col="text")
    # pick the corpus's most frequent bigram so the assertion is
    # non-vacuous on any seed
    two = (docs.select(F.col("doc_id"),
                       F.split(F.lower("text"), "\\s+").alias("t"))
           .select(F.explode(F.expr(
               "transform(sequence(1, size(t) - 1), "
               "i -> concat(t[i - 1], ' ', t[i]))")).alias("bg"))
           .groupBy("bg").count().orderBy(F.desc("count")).first()["bg"])
    got = sorted(r["doc_id"] for r in esql(
        spark, f'FROM d | WHERE MATCH_PHRASE(text, "{two}") '
               '| KEEP doc_id', {"d": docs}).collect())
    want = sorted(r["doc_id"] for r in
                  match_phrase(spark, idx, two).collect())
    assert got and got == want


def test_qstr_occur_semantics(spark):
    d = spark.createDataFrame(
        [(1, "spark query join engine"), (2, "query spark join"),
         (3, "the spark engine"), (4, "flink query runner"),
         (5, "sparkle quartz")],
        "doc_id long, text string")

    def ids(q):
        return [r["doc_id"] for r in esql(
            spark, f'FROM d | WHERE QSTR("{q}", "text") '
                   '| KEEP doc_id | SORT doc_id', {"d": d}).collect()]

    assert ids("spark OR flink") == [1, 2, 3, 4]          # SHOULD group
    assert ids("spark AND join") == [1, 2]                # MUST
    assert ids("+spark -join") == [3]                     # +/- pins
    assert ids("quer*") == [1, 2, 4]                      # prefix
    assert ids("q?artz") == [5]                           # wildcard
    assert ids("sparkl~1") == [1, 2, 3, 5]                # fuzzy (1 edit)
    assert ids('\\"spark query\\"'.replace("\\\\", "\\")) == [1]  # phrase
    assert ids("(flink OR sparkle) AND (runner OR quartz)") == [4, 5]
    assert ids("text:spark AND engine") == [1, 3]         # field-qualified
    with pytest.raises(EsqlError, match="purely negative"):
        ids("-spark")
    with pytest.raises(EsqlError, match="default field"):
        esql(spark, 'FROM d | WHERE QSTR("spark")', {"d": d}).collect()
    with pytest.raises(EsqlError, match="slop"):
        ids('\\"spark query\\"~2'.replace("\\\\", "\\"))


def test_qstr_scoring_where_rejected(spark):
    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for q in ('QSTR("spark", "text")', 'MATCH_PHRASE(text, "a b")'):
        with pytest.raises(EsqlError, match="scoring WHERE"):
            esql(spark,
                 f"FROM d METADATA _score | WHERE {q} AND "
                 'match(text, "x") | SORT _score DESC | LIMIT 1',
                 {"d": d}, id_col="doc_id").collect()


def test_categorize_matches_agg(spark):
    """STATS COUNT(*) BY CATEGORIZE(x) buckets exactly like the
    categorize_text aggregation (one shared skeleton kernel)."""
    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        categorize_text,
    )
    logs = spark.createDataFrame(
        [(i, f"error {{k: {i * 37}}} happened") for i in range(6)]
        + [(9, "ok user 12 login"), (10, "ok user 13 login")],
        "id long, msg string")
    got = {(r["cat"], r["n"]) for r in esql(
        spark, "FROM l | STATS n = COUNT(*) BY cat = CATEGORIZE(msg)",
        {"l": logs}).collect()}
    want = {(r["category"], r["doc_count"])
            for r in categorize_text(logs, "msg").collect()}
    assert got == want == {("error k happened", 6), ("ok user login", 2)}


def test_st_centroid_agg(spark):
    pts = spark.createDataFrame(
        [(1, "g1", 10.0, 20.0), (2, "g1", 30.0, 40.0),
         (3, "g2", -5.0, 5.0)],
        "id long, g string, lon double, lat double")
    got = esql(spark, """
FROM p
| EVAL pt = TO_GEOPOINT(CONCAT("POINT (", lon::string, " ", lat::string, ")"))
| STATS c = ST_CENTROID_AGG(pt) BY g
| EVAL cx = ST_X(c), cy = ST_Y(c)
| KEEP g, cx, cy
| SORT g""", {"p": pts}).collect()
    assert [(r["g"], r["cx"], r["cy"]) for r in got] == \
        [("g1", 20.0, 30.0), ("g2", -5.0, 5.0)]


def test_rrf_fusion(spark, tables):
    """RRF == hand-computed reciprocal-rank fusion of the two branch
    rankings (rank_constant 60, _id tie-break, carry from the first
    branch, dedupe on _id)."""
    docs = tables["documents"]
    q = """
FROM d METADATA _id, _score
| FORK (WHERE match(text, "spark query") | SORT _score DESC, _id | LIMIT 10)
       (WHERE match(text, "join") | SORT _score DESC, _id | LIMIT 10)
| RRF
| SORT _score DESC, _id
| KEEP _id, _score"""
    got = [(r["_id"], r["_score"]) for r in
           esql(spark, q, {"d": docs}, id_col="doc_id").collect()]

    def branch(qs):
        out = esql(spark, f"""
FROM d METADATA _id, _score
| WHERE match(text, "{qs}")
| SORT _score DESC, _id
| LIMIT 10
| KEEP _id""", {"d": docs}, id_col="doc_id").collect()
        return [r["_id"] for r in out]

    fused: dict[str, float] = {}
    for b in (branch("spark query"), branch("join")):
        for rank, _id in enumerate(b, start=1):
            fused[_id] = fused.get(_id, 0.0) + 1.0 / (60 + rank)
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(i, pytest.approx(s)) for i, s in want] == got
    with pytest.raises(EsqlError, match="requires the _id"):
        esql(spark, 'FROM d METADATA _score | FORK (LIMIT 1) (LIMIT 2) '
             '| RRF', {"d": docs}, id_col="doc_id").collect()


def test_show_info(spark):
    from elasticsearch_osmosis_plugin_spark import __version__
    r = esql(spark, "SHOW INFO", {}).collect()
    assert len(r) == 1 and r[0]["version"] == __version__
    with pytest.raises(EsqlError, match="SHOW INFO"):
        esql(spark, "SHOW FUNCTIONS", {})


def test_std_dev_agg(spark, tables):
    got = esql(spark, """
FROM events
| STATS sd = STD_DEV(value) BY event_type
| SORT event_type""", tables).collect()
    want = (tables["events"].groupBy("event_type")
            .agg(F.stddev_pop("value").alias("sd"))
            .orderBy("event_type").collect())
    assert [(r["event_type"], pytest.approx(r["sd"])) for r in want] == \
        [(r["event_type"], r["sd"]) for r in got]


def test_st_extent_agg(spark):
    pts = spark.createDataFrame(
        [(1, "g1", 10.0, 20.0), (2, "g1", 30.0, -40.0),
         (3, "g2", -5.0, 5.0)],
        "id long, g string, lon double, lat double")
    got = esql(spark, """
FROM p
| EVAL pt = TO_GEOPOINT(CONCAT("POINT (", lon::string, " ", lat::string, ")"))
| STATS e = ST_EXTENT_AGG(pt) BY g
| EVAL xmin = e.xmin, xmax = e.xmax, ymin = e.ymin, ymax = e.ymax
| KEEP g, xmin, xmax, ymin, ymax
| SORT g""", {"p": pts}).collect()
    assert [tuple(r) for r in got] == [
        ("g1", 10.0, 30.0, -40.0, 20.0), ("g2", -5.0, -5.0, 5.0, 5.0)]


def test_kql_semantics(spark, tables):
    docs = tables["documents"]
    # field:value == analyzed token match (same rows as match())
    a = rows(esql(spark, 'FROM d | WHERE KQL("text:batch") | KEEP doc_id',
                  {"d": docs}))
    b = rows(esql(spark, 'FROM d | WHERE match(text, "batch") '
                  '| KEEP doc_id', {"d": docs}))
    assert a == b and a
    # default-field free text + range + not-phrase
    got = rows(esql(spark, '''
FROM d
| WHERE KQL("(batch or join) and n_chars >= 300 and not \\"table hash\\"",
            "text")
| KEEP doc_id''', {"d": docs}))
    toks = F.split(F.lower(F.col("text")), r"\s+")
    joined = F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
    want = rows(docs.filter(
        (F.array_contains(toks, "batch") | F.array_contains(toks, "join"))
        & (F.col("n_chars") >= 300)
        & ~joined.contains(" table hash ")).select("doc_id"))
    assert got == want and got
    # field:* existence, wildcard value, value group
    assert rows(esql(spark, 'FROM d | WHERE KQL("lang:*") | KEEP doc_id',
                     {"d": docs})) == rows(docs.select("doc_id"))
    g = rows(esql(spark, 'FROM d | WHERE KQL("lang:(fr or es)") '
                  '| KEEP doc_id', {"d": docs}))
    assert g == rows(docs.filter(F.col("lang").isin("fr", "es"))
                     .select("doc_id"))
    # empty query matches all (Kibana blank bar)
    assert rows(esql(spark, 'FROM d | WHERE KQL("") | KEEP doc_id',
                     {"d": docs})) == rows(docs.select("doc_id"))


def test_kql_errors(spark, tables):
    docs = tables["documents"]
    with pytest.raises(EsqlError, match="default field"):
        esql(spark, 'FROM d | WHERE KQL("batch")', {"d": docs})
    with pytest.raises(EsqlError, match="unbalanced|unexpected|trailing"):
        esql(spark, 'FROM d | WHERE KQL("(lang:fr")', {"d": docs})
    with pytest.raises(EsqlError, match="trailing"):
        esql(spark, 'FROM d | WHERE KQL("lang:fr lang:es")', {"d": docs})


def test_fuse_methods(spark, tables):
    docs = tables["documents"]
    q = """
FROM d METADATA _id, _score
| FORK (WHERE match(text, "spark query") | SORT _score DESC, _id | LIMIT 8)
       (WHERE match(text, "join") | SORT _score DESC, _id | LIMIT 8)
| {fuse}
| SORT _score DESC, _id
| KEEP _id, _score"""

    def run(fuse):
        return [(r["_id"], r["_score"]) for r in
                esql(spark, q.format(fuse=fuse), {"d": docs},
                     id_col="doc_id").collect()]

    # bare FUSE == RRF == FUSE RRF WITH rank_constant = 60
    assert run("FUSE") == run("RRF") \
        == run("FUSE RRF WITH rank_constant = 60")
    # a different rank constant changes scores but keeps doc set
    r10 = run("FUSE RRF WITH rank_constant = 10")
    assert {i for i, _ in r10} == {i for i, _ in run("FUSE")}
    assert r10 != run("FUSE")
    # linear minmax: per-branch best hit normalizes to 1.0; a doc on
    # top of both branches scores exactly 2.0
    lin = run('FUSE LINEAR WITH normalizer = "minmax"')
    assert max(s for _, s in lin) <= 2.0 + 1e-12
    assert any(abs(s - 1.0) < 1e-9 or s > 1.0 for _, s in lin)
    # option validation
    with pytest.raises(EsqlError, match="rrf option"):
        run('FUSE LINEAR WITH rank_constant = 10')
    with pytest.raises(EsqlError, match="linear option"):
        run('FUSE RRF WITH normalizer = "minmax"')
    with pytest.raises(EsqlError, match="unknown option"):
        run("FUSE RRF WITH depth = 3")
    with pytest.raises(EsqlError, match="minmax or none"):
        run('FUSE LINEAR WITH normalizer = "l2"')


def test_mad_two_pass(spark, tables):
    ev = tables["events"]
    got = {r["event_type"]: r["mad"] for r in esql(spark, """
FROM events
| STATS mad = MEDIAN_ABSOLUTE_DEVIATION(value) BY event_type""",
        tables).collect()}
    import numpy as np
    pdf = ev.select("event_type", "value").toPandas()
    for et, g in pdf.groupby("event_type"):
        m = np.percentile(g.value, 50)
        want = np.percentile(np.abs(g.value - m), 50)
        assert abs(got[et] - want) < 1e-9, et
    # global (no BY) + per-agg WHERE path
    r = esql(spark, """
FROM events
| STATS mad = MEDIAN_ABSOLUTE_DEVIATION(value) WHERE value > 50""",
             tables).collect()[0]
    hi = pdf[pdf.value > 50].value
    m = np.percentile(hi, 50)
    assert abs(r["mad"] - np.percentile(np.abs(hi - m), 50)) < 1e-9
    # MAD outside STATS is rejected
    with pytest.raises(EsqlError,
                       match="unknown function|only valid in STATS"):
        esql(spark, "FROM events | EVAL x = "
             "MEDIAN_ABSOLUTE_DEVIATION(value)", tables)


def test_hash_functions(spark, tables):
    import hashlib
    got = esql(spark, """
FROM documents
| WHERE doc_id == 3
| EVAL h = HASH("SHA-256", lang), m = MD5(lang), s1 = SHA1(lang)
| KEEP lang, h, m, s1""", tables).collect()[0]
    b = got["lang"].encode()
    assert got["h"] == hashlib.sha256(b).hexdigest()
    assert got["m"] == hashlib.md5(b).hexdigest()
    assert got["s1"] == hashlib.sha1(b).hexdigest()
    with pytest.raises(EsqlError, match="unknown algorithm"):
        esql(spark, 'FROM documents | EVAL h = HASH("crc32", lang)',
             tables)


def test_esql_index_match_phrase_conjunct(spark, tmp_path):
    """MATCH_PHRASE residual conjunct on the persisted-index fast
    path == the table path's rows (phrase filter over term vectors;
    MATCH stays the single score source) and == the positional
    intersect.match_phrase candidate set."""
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.esql import (
        esql, esql_index)
    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        match_phrase)
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx,
                EngineConfig(analyzer="simple", n_segments=4, n_buckets=4,
                             block_size=64),
                id_col="doc_id", text_col="text", carry_cols=["lang"])
    q = """
FROM docs METADATA _score
| WHERE MATCH(text, "spark query join") AND MATCH_PHRASE(text, "the table")
| SORT _score DESC, doc_id
| LIMIT 10"""
    got = esql_index(spark, q, idx)
    rows_idx = [(r["doc_id"], round(r["_score"], 9))
                for r in got.collect()]
    # table-path twin (full-scan M1 plan; the table path wants the
    # phrase in its own filter WHERE after the scoring one — the index
    # path's single-WHERE AND form compiles to the same plan)
    want = esql(spark, """
FROM d METADATA _score
| WHERE MATCH(text, "spark query join")
| WHERE MATCH_PHRASE(text, "the table")
| SORT _score DESC, doc_id
| LIMIT 10
| KEEP doc_id, _score""", {"d": docs}, id_col="doc_id")
    rows_tab = [(r["doc_id"], round(r["_score"], 9))
                for r in want.collect()]
    assert rows_idx == rows_tab and rows_idx
    # every hit really contains the phrase (positional oracle)
    cand = {r["doc_id"] for r in
            match_phrase(spark, idx, "the table").collect()}
    assert all(d in cand for d, _ in rows_idx)
    # dropped term vectors -> clear error
    from elasticsearch_osmosis_plugin_spark.plans.merge import (
        drop_term_vectors)
    drop_term_vectors(spark, idx)
    with pytest.raises(EsqlError, match="term-vector"):
        esql_index(spark, q, idx).collect()


def test_esql_index_qstr_conjunct(spark, tmp_path):
    """QSTR residual conjunct on the persisted-index fast path == the
    table path's rows (query_string tree over the term-vector column,
    filter context)."""
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.esql import (
        esql, esql_index)
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx,
                EngineConfig(analyzer="simple", n_segments=4, n_buckets=4,
                             block_size=64),
                id_col="doc_id", text_col="text", carry_cols=["lang"])
    got = esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark query join")
    AND QSTR("(batch OR stream) -\\"table hash\\"", "text")
| SORT _score DESC, doc_id
| LIMIT 10""", idx)
    want = esql(spark, """
FROM d METADATA _score
| WHERE MATCH(text, "spark query join")
| WHERE QSTR("(batch OR stream) -\\"table hash\\"", "text")
| SORT _score DESC, doc_id
| LIMIT 10
| KEEP doc_id, _score""", {"d": docs}, id_col="doc_id")
    gi = [(r["doc_id"], round(r["_score"], 9)) for r in got.collect()]
    ti = [(r["doc_id"], round(r["_score"], 9)) for r in want.collect()]
    assert gi == ti and gi
    # a leaf on a non-indexed field raises clearly
    with pytest.raises(EsqlError, match="indexed text field"):
        esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark") AND QSTR("lang:fr", "text")
| SORT _score DESC, doc_id
| LIMIT 5""", idx).collect()


def test_esql_index_kql_conjunct(spark, tmp_path):
    """KQL residual conjunct on the persisted-index fast path == the
    table path's rows: text-field leaves read the term-vector column,
    carry-column leaves (lang, n_chars range) evaluate in place, and
    unqualified terms default to the indexed text field."""
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.esql import (
        esql, esql_index)
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx,
                EngineConfig(analyzer="simple", n_segments=4, n_buckets=4,
                             block_size=64),
                id_col="doc_id", text_col="text",
                carry_cols=["lang", "n_chars"])
    kq = ('lang:(fr or es) and n_chars >= 200 and '
          '(batch or text:stream*) and not text:\\"table hash\\"')
    got = esql_index(spark, f"""
FROM docs METADATA _score
| WHERE MATCH(text, "spark query join") AND KQL("{kq}")
| SORT _score DESC, doc_id
| LIMIT 10""", idx)
    want = esql(spark, f"""
FROM d METADATA _score
| WHERE MATCH(text, "spark query join")
| WHERE KQL("{kq}", "text")
| SORT _score DESC, doc_id
| LIMIT 10
| KEEP doc_id, _score""", {"d": docs}, id_col="doc_id")
    gi = [(r["doc_id"], round(r["_score"], 9)) for r in got.collect()]
    ti = [(r["doc_id"], round(r["_score"], 9)) for r in want.collect()]
    assert gi == ti and gi


def test_esql_index_metadata_id(spark, tmp_path):
    """METADATA _id on the persisted-index fast path: the engine id
    column exposed as ES's string doc _id, KEEP-able."""
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql_index
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx,
                EngineConfig(analyzer="simple", n_segments=4, n_buckets=4,
                             block_size=64),
                id_col="doc_id", text_col="text", carry_cols=["lang"])
    got = esql_index(spark, """
FROM docs METADATA _score, _id
| WHERE MATCH(text, "spark query join")
| KEEP _id, _score, lang
| SORT _score DESC, doc_id
| LIMIT 5""", idx).collect()
    assert [r["_id"] for r in got] \
        and all(isinstance(r["_id"], str) for r in got)
    assert got[0].asDict().keys() == {"_id", "_score", "lang"}
    with pytest.raises(EsqlError, match="METADATA"):
        esql_index(spark, """
FROM docs METADATA _score, _index
| WHERE MATCH(text, "spark")
| SORT _score DESC | LIMIT 5""", idx)


def test_scoring_match_under_compound_not_does_not_score(spark):
    """Lucene must_not context never contributes score, even when the
    NOT wraps a compound expression: NOT (match(b) AND cond) filters
    but the b-clause's BM25 never enters _score."""
    docs = spark.createDataFrame(
        [(1, "alpha beta", 50), (2, "alpha beta", 200), (3, "alpha", 10)],
        "doc_id long, text string, n long")
    t = {"docs": docs}
    s_alpha = {r["doc_id"]: r["_score"] for r in esql(
        spark, 'FROM docs METADATA _score | WHERE match(text, "alpha") '
               '| KEEP doc_id, _score', t).collect()}
    # doc 2 has beta AND n > 100 -> excluded; docs 1, 3 survive and
    # score ONLY match(alpha) — no beta contribution for doc 1
    got = {r["doc_id"]: r["_score"] for r in esql(
        spark, 'FROM docs METADATA _score '
               '| WHERE match(text, "alpha") '
               'AND NOT (match(text, "beta") AND n > 100) '
               '| KEEP doc_id, _score', t).collect()}
    assert set(got) == {1, 3}
    for d in got:
        assert got[d] == pytest.approx(s_alpha[d])


def test_scoring_where_kql_rejected(spark, tables):
    with pytest.raises(EsqlError, match="KQL"):
        esql(spark, 'FROM d METADATA _score '
                    '| WHERE match(text, "a") AND KQL("b", "text") '
                    '| SORT _score DESC', {"d": tables["documents"]})


def test_kql_not_in_value_group(spark, tables):
    docs = tables["documents"]
    got = rows(esql(spark, 'FROM d | WHERE KQL("lang:(fr or not es)") '
                    '| KEEP doc_id', {"d": docs}))
    want = rows(docs.filter((F.col("lang") == "fr")
                            | (F.col("lang") != "es")).select("doc_id"))
    assert got == want
    both = rows(esql(spark, 'FROM d | WHERE KQL("lang:(not es and not fr)") '
                     '| KEEP doc_id', {"d": docs}))
    assert both == rows(docs.filter(~F.col("lang").isin("es", "fr"))
                        .select("doc_id"))
    with pytest.raises(EsqlError, match="expected a value"):
        esql(spark, 'FROM d | WHERE KQL("lang:(fr or and)")', {"d": docs})


def test_esql_index_min_token_len_and_nested_ft(spark, tmp_path):
    """Index-path QSTR/KQL analyze query terms with the INDEX's token
    bounds (a term shorter than min_token_len is analyzed away like
    the build did, not kept as an impossible MUST); FT functions
    nested under OR in residual conjuncts raise instead of silently
    compiling against the wrong columns."""
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql_index
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx,
                EngineConfig(analyzer="simple", n_segments=2, n_buckets=2,
                             block_size=64, min_token_len=3),
                id_col="doc_id", text_col="text", carry_cols=["lang"])
    base = esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark query join") AND QSTR("batch", "text")
| SORT _score DESC, doc_id | LIMIT 10""", idx).collect()
    # 'ab' is below min_token_len=3: the index never stored 2-char
    # tokens, and the analyzer drops it from the query too -> same hits
    with_short = esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark query join") AND QSTR("ab batch", "text")
| SORT _score DESC, doc_id | LIMIT 10""", idx).collect()
    assert [r["doc_id"] for r in with_short] \
        == [r["doc_id"] for r in base] and base
    with pytest.raises(EsqlError, match="top-level AND"):
        esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark") AND (MATCH_PHRASE(text, "a b") OR lang == "fr")
| SORT _score DESC, doc_id | LIMIT 5""", idx)


def test_fuse_carry_first_branch_with_ten_forks(spark):
    """The 'first branch a doc appears in' carry rule holds past nine
    branches (fork10 must NOT sort before fork2)."""
    docs = spark.createDataFrame(
        [(i, f"w{i}") for i in range(1, 12)] + [(100, "shared")],
        "doc_id long, text string")
    branches = []
    for i in range(1, 11):
        # branch i selects doc i; branches 2 and 10 ALSO pick doc 100
        cond = f"doc_id == {i} OR doc_id == 100" if i in (2, 10) \
            else f"doc_id == {i}"
        branches.append(f'(WHERE {cond} | EVAL tag = "b{i}" '
                        f'| SORT _id | LIMIT 3)')
    q = ("FROM d METADATA _id, _score | EVAL _score = 1.0 | "
         "FORK " + " ".join(branches) + " | RRF | KEEP _id, tag")
    out = {r["_id"]: r["tag"] for r in
           esql(spark, q, {"d": docs}, id_col="doc_id").collect()}
    assert out["100"] == "b2"   # first branch in BRANCH ORDER, not
    #                             lexicographic fork-label order


def test_mv_percentile_and_pseries(spark):
    import numpy as np
    got = esql(spark, """
ROW v = [4, 1, 3, 2]
| EVAL p50 = MV_PERCENTILE(v, 50), p0 = MV_PERCENTILE(v, 0),
       p100 = MV_PERCENTILE(v, 100), p75 = MV_PERCENTILE(v, 75)
| KEEP p50, p0, p100, p75""", {}).collect()[0]
    arr = [4, 1, 3, 2]
    for name, q in (("p50", 50), ("p0", 0), ("p100", 100), ("p75", 75)):
        assert got[name] == pytest.approx(
            float(np.percentile(arr, q)), abs=1e-12), name
    ps = esql(spark, """
ROW v = [10.0, 4.0, 1.0]
| EVAL s = MV_PSERIES_WEIGHTED_SUM(v, 2.0)
| KEEP s""", {}).collect()[0]["s"]
    assert ps == pytest.approx(10.0 / 1 + 4.0 / 4 + 1.0 / 9)
    with pytest.raises(EsqlError, match="MV_PERCENTILE"):
        esql(spark, "ROW v = [1] | EVAL x = MV_PERCENTILE(v)", {})


def test_params_positional_named_identifier(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(10)],
        "id long, g string, v double")
    # positional ?, including an indexed ?2
    got = esql(spark, "FROM t | WHERE v >= ? AND v < ?2 "
                      "| STATS n = COUNT(*)",
               {"t": df}, params=[3.0, 8.0]).collect()[0]["n"]
    assert got == 5  # v in {3..7}
    # named ?name + identifier ??fld
    rows = esql(spark, "FROM t | WHERE g == ?grp "
                       "| STATS m = MEDIAN(??fld) BY g",
                {"t": df}, params={"grp": "b", "fld": "v"}).collect()
    assert len(rows) == 1 and rows[0]["m"] == 5.0  # median(1,3,5,7,9)


def test_params_error_paths(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(EsqlError, match="no params"):
        esql(spark, "FROM t | WHERE v > ?", {"t": df})
    with pytest.raises(EsqlError, match="more .* markers"):
        esql(spark, "FROM t | WHERE v > ? AND v < ?", {"t": df},
             params=[1.0])
    with pytest.raises(EsqlError, match="named parameter"):
        esql(spark, "FROM t | WHERE v > ?x", {"t": df}, params={})
    with pytest.raises(EsqlError, match="out of range"):
        esql(spark, "FROM t | WHERE v > ?9", {"t": df}, params=[1.0])
    with pytest.raises(EsqlError, match="identifier param"):
        esql(spark, "FROM t | WHERE ??f > 1", {"t": df},
             params={"f": 42})


def test_percentile_expression_and_per_agg_where(spark):
    df = spark.createDataFrame(
        [(i, "x" if i < 6 else "y", float(i)) for i in range(10)],
        "id long, g string, v double")
    rows = {r["g"]: r for r in esql(spark, """
FROM t
| STATS p = PERCENTILE(v * 2.0, 50) WHERE v >= 2,
        m = MEDIAN(v) WHERE g == "x"
    BY g | SORT g""", {"t": df}).collect()}
    # g=x: v in {2..5} doubled {4,6,8,10} -> p50 = 7.0
    assert rows["x"]["p"] == 7.0
    # per-agg WHERE g=="x" inside group y filters everything -> NULL
    assert rows["y"]["m"] is None
    assert rows["x"]["m"] == 2.5  # median(0..5)


def test_st_grid_functions_roundtrip_and_wrap(spark):
    # precision 12 drives the packed long through Java sign-bit
    # wraparound (60 cell bits << 4); the unsigned-shift decode must
    # still round-trip
    df = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, -33.8688, 151.2093),
         (3, 89.99, 179.99), (4, -89.99, -179.99)],
        "id long, lat double, lon double")
    rows = esql(spark, """
FROM t
| EVAL p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(lon), " ",
                              TO_STRING(lat), ")"))
| EVAL g12 = ST_GEOHASH(p, 12),
       s12 = ST_GEOHASH_TO_STRING(ST_GEOHASH(p, 12)),
       b12 = ST_GEOHASH_TO_LONG(ST_GEOHASH_TO_STRING(ST_GEOHASH(p, 12))),
       t29 = ST_GEOTILE(p, 29),
       ts29 = ST_GEOTILE_TO_STRING(ST_GEOTILE(p, 29)),
       tb29 = ST_GEOTILE_TO_LONG(ST_GEOTILE_TO_STRING(ST_GEOTILE(p, 29)))
| KEEP id, g12, s12, b12, t29, ts29, tb29 | SORT id""",
                {"t": df}).collect()
    for r in rows:
        assert len(r["s12"]) == 12
        assert r["b12"] == r["g12"]
        assert r["tb29"] == r["t29"]
        assert r["ts29"].startswith("29/")
    # paris geohash-12 prefix is the well-known u09tvw…
    assert rows[0]["s12"].startswith("u09t")
    # negative packed long at precision 12 for at least one point
    assert any(r["g12"] < 0 for r in rows)


def test_st_envelope_bounds(spark):
    df = spark.createDataFrame([(1, 40.7, -74.0)],
                               "id long, lat double, lon double")
    r = esql(spark, """
FROM t
| EVAL p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(lon), " ",
                              TO_STRING(lat), ")"))
| EVAL xmin = ST_XMIN(p), xmax = ST_XMAX(ST_ENVELOPE(p)),
       ymin = ST_YMIN(ST_ENVELOPE(p)),
       px = ST_XMIN(TO_GEOSHAPE("POLYGON ((2 48, 3 48, 3 49, 2 48))")),
       ex = ST_XMAX(TO_GEOSHAPE("ENVELOPE (1.0, 5.0, 10.0, -2.0)")),
       ey = ST_YMIN(TO_GEOSHAPE("ENVELOPE (1.0, 5.0, 10.0, -2.0)"))
| KEEP xmin, xmax, ymin, px, ex, ey""", {"t": df}).collect()[0]
    assert r["xmin"] == -74.0 and r["xmax"] == -74.0
    assert r["ymin"] == 40.7
    assert r["px"] == 2.0 and r["ex"] == 5.0 and r["ey"] == -2.0
    # envelope stored via EVAL then read back through a bare column:
    # classified by struct shape, not by the syntactic ST_ENVELOPE call
    r2 = esql(spark, """
FROM t
| EVAL e = ST_ENVELOPE(TO_GEOSHAPE("ENVELOPE (1.0, 5.0, 10.0, -2.0)"))
| EVAL ex = ST_XMAX(e), ey = ST_YMIN(e), en = ST_XMIN(e)
| KEEP ex, ey, en""", {"t": df}).collect()[0]
    assert r2["ex"] == 5.0 and r2["ey"] == -2.0 and r2["en"] == 1.0


def test_scalb_copysign_round_to(spark):
    r = esql(spark, """
ROW v = 12.7, n = -3
| EVAL s = SCALB(v, 4), s2 = SCALB(v, n),
       c1 = COPY_SIGN(5.0, -2.0), c2 = COPY_SIGN(-5.0, 3.0),
       c3 = COPY_SIGN(5.0, NULL),
       r1 = ROUND_TO(v, 0, 10, 20), r2 = ROUND_TO(-4.0, 0, 10),
       r3 = ROUND_TO(25.0, 0, 10, 20)
| KEEP s, s2, c1, c2, c3, r1, r2, r3""", {}).collect()[0]
    assert r["s"] == 12.7 * 16 and r["s2"] == 12.7 / 8
    assert r["c1"] == -5.0 and r["c2"] == 5.0
    assert r["c3"] is None          # NULL sign propagates, not -ABS
    assert r["r1"] == 10.0 and r["r2"] == 0.0 and r["r3"] == 20.0
    with pytest.raises(EsqlError, match="ROUND_TO"):
        esql(spark, "ROW v = 1 | EVAL x = ROUND_TO(v)", {})


def test_match_options_filter_and_boost(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta x"), (3, "beta y z")],
        "doc_id long, text string")
    # operator "and": every analyzed term required
    got = esql(spark, 'FROM t | WHERE MATCH(text, "alpha beta", '
                      '{"operator": "and"}) | KEEP doc_id',
               {"t": df}).collect()
    assert [r["doc_id"] for r in got] == [1]
    # minimum_should_match 2 of 3
    got = esql(spark, 'FROM t | WHERE MATCH(text, "alpha beta gamma", '
                      '{"minimum_should_match": 2}) | KEEP doc_id '
                      '| SORT doc_id', {"t": df}).collect()
    assert [r["doc_id"] for r in got] == [1]
    # boost scales the clause's score contribution
    plain = esql(spark, 'FROM t METADATA _score | WHERE '
                        'MATCH(text, "alpha") | KEEP doc_id, _score '
                        '| SORT doc_id', {"t": df}).collect()
    boosted = esql(spark, 'FROM t METADATA _score | WHERE '
                          'MATCH(text, "alpha", {"boost": 2.5}) '
                          '| KEEP doc_id, _score | SORT doc_id',
                   {"t": df}).collect()
    assert [r["doc_id"] for r in plain] == [r["doc_id"] for r in boosted]
    for a, b in zip(plain, boosted):
        assert b["_score"] == pytest.approx(a["_score"] * 2.5)
    with pytest.raises(EsqlError, match="not supported"):
        esql(spark, 'FROM t | WHERE MATCH(text, "a", '
                    '{"fuzziness": "AUTO"})', {"t": df})


def test_match_options_index_path(spark, tmp_path):
    from elasticsearch_osmosis_plugin_spark.operators.esql import (
        esql_index,
    )
    from elasticsearch_osmosis_plugin_spark.operators.query import topk
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index

    docs = spark.createDataFrame(
        [(1, "spark window merge"), (2, "spark only here"),
         (3, "window pane"), (4, "spark window spark")],
        "doc_id long, text string")
    idx = str(tmp_path / "optidx")
    build_index(spark, docs, idx, id_col="doc_id", text_col="text",
                n_groups=1)
    got = esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark window", {"operator": "and"})
| SORT _score DESC, doc_id | LIMIT 10""", idx)
    want = topk(spark, idx, "spark window", k=10, minimum_should_match=2)
    assert [r["doc_id"] for r in got.collect()] == \
        [r["doc_id"] for r in want.collect()]
    b = esql_index(spark, """
FROM docs METADATA _score
| WHERE MATCH(text, "spark window", {"boost": 3.0})
| SORT _score DESC, doc_id | LIMIT 10""", idx).collect()
    p = topk(spark, idx, "spark window", k=10).collect()
    for x, y in zip(b, p):
        assert x["_score"] == pytest.approx(y["score"] * 3.0)
    # round 5: MATCH options now plumb through the MULTI-index fast
    # path too — operator "and" == msm over the dfs-exact union
    idx_a, idx_b = str(tmp_path / "opt_a"), str(tmp_path / "opt_b")
    build_index(spark, docs.filter("doc_id <= 2"), idx_a,
                id_col="doc_id", text_col="text", n_groups=1)
    build_index(spark, docs.filter("doc_id > 2"), idx_b,
                id_col="doc_id", text_col="text", n_groups=1)
    multi = esql_index(spark, """
FROM a, b METADATA _score
| WHERE MATCH(text, "spark window", {"operator": "and", "boost": 2.0})
| SORT _score DESC, doc_id | LIMIT 5""", [idx_a, idx_b]).collect()
    # union of the two halves == the single index built above, so the
    # msm ranking must match the single-index msm path; boost scales
    assert [r["doc_id"] for r in multi] == \
        [r["doc_id"] for r in want.collect()]
    for x, y in zip(multi, want.collect()):
        assert x["_score"] == pytest.approx(y["score"] * 2.0)
