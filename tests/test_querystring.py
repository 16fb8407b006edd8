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


# ------------------------------------------------- simple_query_string

def _sr(n):
    if isinstance(n, Leaf):
        return (n.kind, n.text, n.fuzz, n.slop)
    return [(o, _sr(c)) for o, c in n.children]


def test_sqs_parse_shapes():
    from elasticsearch_osmosis_plugin_spark.operators.querystring import (
        parse_simple_query_string as p,
    )

    # + binds tighter than |, whitespace takes default_operator
    assert _sr(p("a + b | c")) == [
        (SHOULD, [(MUST, ("term", "a", 0, 0)), (MUST, ("term", "b", 0, 0))]),
        (SHOULD, ("term", "c", 0, 0))]
    assert _sr(p("a b", default_operator="AND")) == [
        (MUST, ("term", "a", 0, 0)), (MUST, ("term", "b", 0, 0))]
    assert _sr(p("a b")) == [
        (SHOULD, ("term", "a", 0, 0)), (SHOULD, ("term", "b", 0, 0))]
    # negation attaches to the ENCLOSING group (Lucene flat model)
    assert _sr(p("a | -b")) == [
        (MUST, ("term", "a", 0, 0)), (MUST_NOT, ("term", "b", 0, 0))]
    # purely negative: match_all minus the exclusion
    assert _sr(p("-b")) == [
        (MUST, ("match_all", "", 0, 0)), (MUST_NOT, ("term", "b", 0, 0))]
    # fuzzy / slop / prefix leaves
    assert _sr(p('a~1 "x y"~2 pre*', default_operator="AND")) == [
        (MUST, ("fuzzy", "a", 1, 0)), (MUST, ("phrase", "x y", 0, 2)),
        (MUST, ("prefix", "pre", 0, 0))]


def test_sqs_lenient_never_raises():
    from elasticsearch_osmosis_plugin_spark.operators.querystring import (
        parse_simple_query_string as p,
    )

    assert _sr(p("((a + b) | c")) == [(MUST, [
        (SHOULD, [(MUST, ("term", "a", 0, 0)), (MUST, ("term", "b", 0, 0))]),
        (SHOULD, ("term", "c", 0, 0))])]          # unclosed ( closes at EOF
    assert _sr(p("a ) b")) == [                    # stray ) ignored
        (SHOULD, ("term", "a", 0, 0)), (SHOULD, ("term", "b", 0, 0))]
    assert _sr(p("+ | a")) == [(MUST, ("term", "a", 0, 0))]  # dangling ops
    assert p("").children == []                    # empty -> match none
    assert _sr(p('"unterminated pa')) == [
        (MUST, ("phrase", "unterminated pa", 0, 0))]


def test_sqs_flags_disable_features():
    from elasticsearch_osmosis_plugin_spark.operators.querystring import (
        parse_simple_query_string as p,
    )

    # NONE: every special char is literal text (one term)
    assert _sr(p("a+b|c", flags="NONE")) == [(MUST, ("term", "a+b|c", 0, 0))]
    # only PREFIX|NOT active: + and | are literal, * and - work
    assert _sr(p("foo* -bar", flags="PREFIX|NOT")) == [
        (MUST, ("prefix", "foo", 0, 0)), (MUST_NOT, ("term", "bar", 0, 0))]
    # escape makes a special literal
    assert _sr(p(r"a\+b")) == [(MUST, ("term", "a+b", 0, 0))]
    with pytest.raises(ValueError, match="unknown flag"):
        p("a", flags="BOGUS")


def test_sqs_topk_equals_query_string(spark, idx):
    """The same boolean query through both parsers is value-identical
    (shared compiler)."""
    from elasticsearch_osmosis_plugin_spark.operators.querystring import (
        simple_query_string_topk,
    )

    a = simple_query_string_topk(spark, idx, "spark + index | merge",
                                 k=20)
    b = query_string_topk(spark, idx, "(spark AND index) OR merge", k=20)
    ra = [(r["doc_id"], round(r["score"], 9)) for r in a.collect()]
    rb = [(r["doc_id"], round(r["score"], 9)) for r in b.collect()]
    assert ra == rb and ra


def test_sqs_negation_and_pure_negative(spark, idx, corpus_df):
    from elasticsearch_osmosis_plugin_spark.operators.querystring import (
        simple_query_string_topk,
    )

    n = corpus_df.count()
    with_merge = intersect.match_all_terms(spark, idx, "merge")
    nm = with_merge.count()
    assert 0 < nm < n
    # -merge alone matches everything except merge docs
    res = simple_query_string_topk(spark, idx, "-merge", k=n + 10)
    assert res.count() == n - nm
    got = {r["doc_id"] for r in res.collect()}
    assert not got & {r["doc_id"] for r in with_merge.collect()}


def test_sqs_dsl_and_fields_validation(spark, idx):
    from elasticsearch_osmosis_plugin_spark.operators.querystring import (
        simple_query_string_topk,
    )

    indexed = query.load_meta(idx)["text_col"]
    raw = dsl.search(spark, idx, {
        "query": {"simple_query_string": {
            "query": "spark + index", "fields": [f"{indexed}^2"]}},
        "size": 10})
    direct = simple_query_string_topk(spark, idx, "spark + index", k=10)
    assert [r["doc_id"] for r in raw.collect()] \
        == [r["doc_id"] for r in direct.collect()]
    with pytest.raises(ValueError, match="unknown field"):
        simple_query_string_topk(spark, idx, "a", fields=["nope"])
    # empty query matches nothing, never raises
    assert simple_query_string_topk(spark, idx, "( | ").count() == 0
