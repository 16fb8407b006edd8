"""M1 pure-DataFrame BM25 vs the naive Python oracle: rank-identical
(ids AND scores within 1e-9) — SURVEY.md §7 M1 gate."""

import pytest

from elasticsearch_osmosis_plugin_spark.operators.bm25 import bm25_oracle, bm25_topk

QUERIES = [
    "id0001",                   # hot zipf head term
    "id0042 id0007",            # two-term OR
    "public static void",       # java stop-terms (hot postings)
    "getIndexBuffer",           # camelCase identifier (tokenizer symmetry)
    "doc_term posting",         # snake_case + plain
    "id1999",                   # rare tail term
    "func err nil id0003",      # cross-lang mix
]


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [5, 20])
def test_rank_identity_vs_oracle(spark, corpus_df, corpus_rows, query, k):
    got = bm25_topk(corpus_df, query, k=k).collect()
    rows = list(zip(corpus_rows["doc_id"], corpus_rows["content"]))
    want = bm25_oracle(rows, query, k=k)
    assert [r["doc_id"] for r in got] == [d for d, _ in want], query
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-9


def test_empty_query(spark, corpus_df):
    assert bm25_topk(corpus_df, "", k=5).count() == 0


def test_rank_stable_across_partitioning(spark, corpus_df):
    a = bm25_topk(corpus_df, "id0001 id0002", k=10).collect()
    b = bm25_topk(corpus_df.repartition(13), "id0001 id0002", k=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    for x, y in zip(a, b):
        assert abs(x["score"] - y["score"]) < 1e-9
