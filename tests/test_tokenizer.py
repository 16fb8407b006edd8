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
    for analyzer in ("code", "simple"):
        vec = tokenize_series(pd.Series(texts), analyzer)
        for t, v in zip(texts, vec):
            assert tokenize_py(t, analyzer) == list(v)


def test_stopword_removal():
    toks = tokenize_py("public static void getFoo", "code",
                       lang="java", remove_stopwords=True)
    assert toks == ["get", "foo"]


def test_term_frequencies():
    assert term_frequencies(["a", "b", "a"]) == {"a": 2, "b": 1}


def test_tokenize_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import tokenize_udf

    texts = [t for t, _ in GOLDEN if t] + ["mergeIndexBlock foo_bar BAZ9qux"]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, content string")
    got = {r["id"]: r["toks"] for r in
           sdf.select("id", tokenize_udf("code")(F.col("content")).alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == tokenize_py(t, "code")
