"""Tokenizer: vectorized pandas impl must equal the pure-Python twin
(rank-identity precondition), plus golden cases for the code analyzer."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
    term_frequencies,
    tokenize_py,
    tokenize_series,
)

GOLDEN = [
    ("getIndexBuffer", ["get", "index", "buffer"]),
    ("parse_XMLFile", ["parse", "xml", "file"]),
    ("HTTPServer", ["http", "server"]),
    ("fooBar2Baz", ["foo", "bar2", "baz"]),
    ("snake_case_id", ["snake", "case", "id"]),
    ("a-b.c;d", ["a", "b", "c", "d"]),
    ("", []),
]


def test_golden_code_analyzer():
    for text, want in GOLDEN:
        assert tokenize_py(text, "code") == want, text


text_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")),
    max_size=200,
)


@given(st.lists(text_st, min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_vectorized_equals_python(texts):
    for analyzer in ("code", "simple", "english"):
        vec = tokenize_series(pd.Series(texts), analyzer)
        for t, v in zip(texts, vec):
            assert tokenize_py(t, analyzer) == list(v)


def test_stopword_removal():
    toks = tokenize_py("public static void getFoo", "code",
                       lang="java", remove_stopwords=True)
    assert toks == ["get", "foo"]


def test_term_frequencies():
    assert term_frequencies(["a", "b", "a"]) == {"a": 2, "b": 1}


ASCII_CASES = [t for t, _ in GOLDEN] + [
    "mergeIndexBlock foo_bar BAZ9qux",
    "  leading and   trailing  ",
    "tabs\tand\nnewlines\r\nmixed",
    "UPPER lower MiXeD 123 42abc abc42",
    "punct!@#$%^&*()_+-=[]{};':\",./<>?",
    "x" * 70 + " ok",          # 65+-char token drops in ALL twins
    "a", "",
    # S-stemmer battery: each rule, each exception, the if/elif lock
    "bodies flies ties eies queries tables glasses heroes buses us bus pass s",
    "the quick foxes jumped over their lazy dogs with these glasses",
]


STEM_GOLDEN = [
    ("bodies", "body"), ("flies", "fly"), ("queries", "query"),
    ("ties", "ties"),       # too short for the ies rule (no stem char)
    ("eies", "eies"),       # e before ies: excepted, NOT retried as es
    ("tables", "table"), ("glasses", "glasse"),
    ("heroes", "heroes"),   # o before es: excepted, NOT retried as s
    ("buses", "buse"),
    ("dogs", "dog"), ("us", "us"), ("pass", "pass"), ("s", "s"),
]


def test_s_stem_golden():
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import s_stem

    for word, want in STEM_GOLDEN:
        assert s_stem(word) == want, word


def test_english_chain():
    assert tokenize_py("The bodies of these queries are in tables",
                       "english") == ["body", "query", "table"]


def test_tokenize_expr_matches_python(spark):
    """The Catalyst expression twin must be token-identical to the
    pure-Python oracle on ASCII corpora (module docstring: Java \\s is
    ASCII-only, so Unicode-whitespace text is out of contract)."""
    from pyspark.sql import functions as F

    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_expr,
    )

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ASCII_CASES)] + [(999, None)],
        "id long, content string")
    for analyzer in ("code", "simple", "english", "whitespace",
                     "keyword"):
        got = {r["id"]: r["toks"] for r in sdf.select(
            "id", tokenize_expr("content", analyzer).alias("toks")).collect()}
        for i, t in enumerate(ASCII_CASES):
            assert got[i] == tokenize_py(t, analyzer), (analyzer, t)
        assert got[999] == []  # null text -> no tokens, like the twins


def test_tokenize_expr_length_filter(spark):
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_expr,
    )

    sdf = spark.createDataFrame([(0, "a bb ccc dddd")], "id long, content string")
    got = sdf.select(tokenize_expr("content", "simple", min_len=2,
                                   max_len=3).alias("t")).collect()[0]["t"]
    assert got == tokenize_py("a bb ccc dddd", "simple", min_len=2, max_len=3)
    assert got == ["bb", "ccc"]


def test_tokenize_expr_rejects_stopword_analyzer():
    import pytest

    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_expr,
    )

    with pytest.raises(ValueError):
        tokenize_expr("content", "nope")


def test_tokenize_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import tokenize_udf

    texts = [t for t, _ in GOLDEN if t] + ["mergeIndexBlock foo_bar BAZ9qux"]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, content string")
    got = {r["id"]: r["toks"] for r in
           sdf.select("id", tokenize_udf("code")(F.col("content")).alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == tokenize_py(t, "code")


def test_analyze_endpoint(spark):
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import analyze

    text = "getIndexBuffer flushes Buffers"
    got = analyze(spark, text, "code").collect()
    assert [(r["position"], r["token"]) for r in got] == list(
        enumerate(tokenize_py(text, "code")))
    # the code chain rewrites token text, but offsets thread the char
    # map through the camel split: every span slices its token back
    # out of the (lowercased) input
    for r in got:
        assert text.lower()[r["start_offset"]:r["end_offset"]] \
            == r["token"]
    en = [r["token"] for r in
          analyze(spark, "The bodies of tables", "english").collect()]
    assert en == ["body", "table"]


def _py_offsets(text: str, tokens: list[str], ref: str):
    """Pure-Python twin of the analyze() offset fold (cursor walk)."""
    out, cur = [], 0
    for pos, t in enumerate(tokens):
        start = ref.index(t, cur)
        out.append((pos, t, start, start + len(t)))
        cur = start + len(t)
    return out


def test_analyze_offsets_verbatim_analyzers(spark):
    """ES _analyze char offsets: simple/whitespace/keyword tokens are
    verbatim substrings — offsets must be the exact char spans, through
    repeated tokens, multi-space runs, and a token that is a substring
    of an earlier one ('dup' inside 'dupdup')."""
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import analyze

    text = "DupDup  dup  Dup\tend dup"
    for analyzer, ref in (("simple", text.lower()), ("whitespace", text)):
        rows = [(r["position"], r["token"], r["start_offset"],
                 r["end_offset"]) for r in analyze(spark, text, analyzer)
                .orderBy("position").collect()]
        want = _py_offsets(text, tokenize_py(text, analyzer), ref)
        assert rows == want, analyzer
        # offsets really do slice the token back out of the input
        for _, tok, s, e in rows:
            assert ref[s:e] == tok
    kw = analyze(spark, text, "keyword").collect()
    assert [(r["position"], r["token"], r["start_offset"], r["end_offset"])
            for r in kw] == [(0, text, 0, len(text))]
    assert analyze(spark, "", "simple").count() == 0


def test_whitespace_and_keyword_analyzers(spark):
    """The two remaining ES built-in analyzers: whitespace keeps case
    (exact-symbol search over code), keyword emits the whole value as
    one token; all three twins agree, and an index built with
    whitespace matches case-sensitively end-to-end."""
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_expr,
        tokenize_series,
    )

    cases = ["Foo BAR baz", "getIndexBuffer X", "", "  spaced  out  "]
    for t in cases:
        for an in ("whitespace", "keyword"):
            py = tokenize_py(t, an)
            pd_ = tokenize_series(pd.Series([t]), an).iloc[0]
            assert list(pd_) == py, (an, t)
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                                "id long, content string")
    for an in ("whitespace", "keyword"):
        got = {r["id"]: r["toks"] for r in sdf.select(
            "id", tokenize_expr("content", an).alias("toks")).collect()}
        for i, t in enumerate(cases):
            assert got[i] == tokenize_py(t, an), (an, t)
    assert tokenize_py("Foo BAR", "whitespace") == ["Foo", "BAR"]
    assert tokenize_py("Foo BAR", "keyword") == ["Foo BAR"]

    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        match_all_terms,
    )
    from elasticsearch_osmosis_plugin_spark.plans.build import build_index
    import tempfile

    path = tempfile.mkdtemp() + "/wsidx"
    df = spark.createDataFrame(
        [(0, "Foo bar"), (1, "foo Bar"), (2, "FOO BAR")],
        "doc_id long, text string")
    build_index(spark, df, path,
                EngineConfig(analyzer="whitespace", n_segments=2,
                             n_buckets=2, block_size=8),
                id_col="doc_id", text_col="text", n_groups=1)
    assert [r["doc_id"] for r in
            match_all_terms(spark, path, "Foo").collect()] == [0]
    assert [r["doc_id"] for r in
            match_all_terms(spark, path, "FOO").collect()] == [2]


def test_token_spans_rewriting_chains(spark):
    """ES-offset twin for code/english: token stream identical to
    tokenize_py, every span points at the right chars of the ORIGINAL
    input (camel sub-segments own their chars; a stemmed token keeps
    its pre-stem span; stopwords emit nothing)."""
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        analyze,
        s_stem,
        token_spans_py,
        tokenize_py,
    )

    battery = [
        "getIndexBuffer snake_case XMLHttpRequest2 a",
        "The quick brown foxes jumped over lazy bodies",
        "HTML parse99Tree  double  spaces\tand tabs",
        "x",
        "",
    ]
    for text in battery:
        for an in ("code", "english"):
            spans = token_spans_py(text, an)
            assert [t for t, _, _ in spans] == tokenize_py(text, an), \
                (text, an)
            low = text.lower()
            for t, s, e in spans:
                if an == "code":
                    assert low[s:e] == t, (text, t, s, e)
                else:
                    assert s_stem(low[s:e]) == t, (text, t, s, e)
                    # span boundaries sit on a whitespace-run token
                    assert (s == 0 or low[s - 1].isspace()) and \
                           (e == len(low) or low[e].isspace())

    # camel boundary spans map exactly
    got = token_spans_py("getIndexBuffer", "code")
    assert got == [("get", 0, 3), ("index", 3, 8), ("buffer", 8, 14)]
    # acronym rule: XMLHttp -> xml | http
    assert token_spans_py("XMLHttpReq", "code") == \
        [("xml", 0, 3), ("http", 3, 7), ("req", 7, 10)]
    # english: stemmed token keeps pre-stem span; stopword gap closes
    got = token_spans_py("the foxes ran", "english")
    assert got == [("foxe", 4, 9), ("ran", 10, 13)]

    # length-changing case-fold -> None (undefined char map)
    assert token_spans_py("İstanbul code", "code") is None

    # analyze() end-to-end now carries offsets for the code chain
    rows = analyze(spark, "getIndexBuffer foo", "code").collect()
    assert [(r["position"], r["token"], r["start_offset"],
             r["end_offset"]) for r in rows] == \
        [(0, "get", 0, 3), (1, "index", 3, 8), (2, "buffer", 8, 14),
         (3, "foo", 15, 18)]
    # min/max len filter applies to the emitted stream
    spans = token_spans_py("getIndexBuffer", "code", min_len=4)
    assert spans == [("index", 3, 8), ("buffer", 8, 14)]
