"""Lucene query_string parser + compiler: parse trees follow the
classic QueryParser occur rules, and every compiled form returns
exactly what the equivalent native-operator composition returns
(the reference's users reach ES 0.90 through this syntax via the URI
``q=`` / query_string query)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.operators import dsl, intersect, query
from elasticsearch_osmosis_plugin_spark.operators.querystring import (
    MUST,
    MUST_NOT,
    SHOULD,
    Group,
    Leaf,
    parse_query_string,
    query_string_topk,
)
from elasticsearch_osmosis_plugin_spark.plans.build import build_index

CFG = EngineConfig(n_segments=8, n_buckets=4, block_size=16)


@pytest.fixture(scope="module")
def idx(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("qsidx") / "index")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=1)
    return path


# ---------------------------------------------------------------- parser

def occurs(q, **kw):
    return [occ for occ, _ in parse_query_string(q, **kw).children]


def test_parse_occur_rules():
    assert occurs("+a b -c") == [MUST, SHOULD, MUST_NOT]
    assert occurs("a AND b") == [MUST, MUST]
    assert occurs("a OR b") == [SHOULD, SHOULD]
    # AND retroactively upgrades; OR retroactively relaxes
    assert occurs("a OR b AND c") == [SHOULD, MUST, MUST]
    assert occurs("NOT a b") == [MUST_NOT, SHOULD]
    assert occurs("a b", default_operator="AND") == [MUST, MUST]
    # explicit +/- survive a following connective
    assert occurs("-a OR b") == [MUST_NOT, SHOULD]


def test_parse_leaves():
    g = parse_query_string('win* wi?d "query join"~2 dup^2.5 publix~1')
    kinds = [(c.kind, c.boost) for _, c in g.children]
    assert kinds == [("prefix", 1.0), ("wildcard", 1.0), ("phrase", 1.0),
                     ("term", 2.5), ("fuzzy", 1.0)]
    assert g.children[0][1].text == "win"
    assert g.children[2][1].slop == 2
    assert g.children[4][1].fuzz == 1
    # bare ~ defaults to edit distance 2 (Lucene AUTO-ish)
    assert parse_query_string("publix~").children[0][1].fuzz == 2


def test_parse_groups_and_fields():
    g = parse_query_string("(a OR b) AND c")
    assert [occ for occ, _ in g.children] == [MUST, MUST]
    inner = g.children[0][1]
    assert isinstance(inner, Group)
    assert [occ for occ, _ in inner.children] == [SHOULD, SHOULD]
    leaf = parse_query_string("content:spark").children[0][1]
    assert (leaf.field, leaf.text) == ("content", "spark")
    ex = parse_query_string("_exists_:lang").children[0][1]
    assert (ex.kind, ex.text) == ("exists", "lang")


def test_parse_errors():
    for bad in ("(a", "a)", "", "   "):
        with pytest.raises(ValueError):
            parse_query_string(bad)


# ---------------------------------------------------------------- compiler

def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_default_or_equals_topk(spark, idx):
    """Bare terms under OR score identically to the BM25 topk path."""
    got = query_string_topk(spark, idx, "public static", k=10)
    want = query.topk(spark, idx, "public static", k=10,
                      strategy="scoreall")
    gr, wr = got.collect(), want.collect()
    assert [r["doc_id"] for r in gr] == [r["doc_id"] for r in wr]
    for g, w in zip(gr, wr):
        assert abs(g["score"] - w["score"]) < 1e-9


def test_default_and_equals_msm(spark, idx):
    got = query_string_topk(spark, idx, "public static", k=10,
                            default_operator="AND")
    want = query.topk(spark, idx, "public static", k=10,
                      minimum_should_match=2)
    assert _ids(got) == _ids(want)


def test_must_not_excludes(spark, idx):
    got = query_string_topk(spark, idx, "+public -id0042", k=100)
    bad = {r["doc_id"] for r in
           intersect.match_all_terms(spark, idx, "id0042").collect()}
    assert bad, "fixture term must exist"
    assert not (set(_ids(got)) & bad)
    # scores must equal plain single-term BM25 for surviving docs
    want = {r["doc_id"]: r["score"] for r in
            query.topk(spark, idx, "public", k=100).collect()}
    for r in got.collect():
        assert abs(r["score"] - want[r["doc_id"]]) < 1e-9


def test_phrase_and_prefix_constant_score(spark, idx):
    got = query_string_topk(spark, idx, '"public static"', k=1000)
    want = _ids(intersect.match_phrase(spark, idx, "public static"))
    assert sorted(_ids(got)) == sorted(want)
    assert all(r["score"] == 1.0 for r in got.collect())

    got = query_string_topk(spark, idx, "id004*", k=1000)
    want = _ids(intersect.match_expanded(spark, idx, "id004",
                                         max_expansions=1000))
    assert sorted(_ids(got)) == sorted(want)


def test_boost_scales_score(spark, idx):
    plain = {r["doc_id"]: r["score"] for r in
             query_string_topk(spark, idx, "public", k=100).collect()}
    boosted = query_string_topk(spark, idx, "public^2", k=100).collect()
    for r in boosted:
        assert abs(r["score"] - 2.0 * plain[r["doc_id"]]) < 1e-9


def test_group_with_must(spark, idx):
    """(public OR void) AND id0042: docs must have id0042 and either
    disjunct; score = sum of all matched partials — i.e. the 3-term
    BM25 restricted to that doc set."""
    got = query_string_topk(spark, idx, "(public OR void) AND id0042",
                            k=1000).collect()
    has_id = set(_ids(intersect.match_all_terms(spark, idx, "id0042")))
    has_or = set(_ids(intersect.match_any_terms(spark, idx, "public void")))
    want_docs = has_id & has_or
    assert {r["doc_id"] for r in got} == want_docs and want_docs
    full = {r["doc_id"]: r["score"] for r in
            query.topk(spark, idx, "public void id0042", k=10**6,
                       strategy="scoreall").collect()}
    for r in got:
        assert abs(r["score"] - full[r["doc_id"]]) < 1e-9


def test_unknown_field_raises(spark, idx):
    with pytest.raises(ValueError, match="unknown field"):
        query_string_topk(spark, idx, "nosuchfield:public", k=10)


def test_pure_negative_raises(spark, idx):
    with pytest.raises(ValueError, match="negative"):
        query_string_topk(spark, idx, "-public", k=10)


def test_dsl_routing(spark, idx):
    got = dsl.search(spark, idx, {"query": {"query_string": {
        "query": "public static", "default_operator": "AND"}}, "size": 10})
    want = query_string_topk(spark, idx, "public static", k=10,
                             default_operator="AND")
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]


def test_exists_clause(spark, idx):
    got = query_string_topk(spark, idx, "+public +_exists_:lang", k=1000)
    from elasticsearch_osmosis_plugin_spark.plans import catalog

    with_lang = {r["doc_id"] for r in
                 catalog.read_table(spark, idx, "docstats")
                 .filter(F.col("lang").isNotNull())
                 .select("doc_id").collect()}
    has_pub = set(_ids(intersect.match_all_terms(spark, idx, "public")))
    assert set(_ids(got)) == has_pub & with_lang
