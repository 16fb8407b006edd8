"""ES SQL (`POST /_sql`) layer: dialect rewrites onto spark.sql."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.operators.essql import (
    EsSql,
    EsSqlError,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def es(spark):
    t = {n: spark.read.parquet(f"{SF}/{n}.parquet")
         for n in ("documents", "events", "orders")}
    return EsSql(spark, t)


def test_show_tables_and_describe(es):
    names = [r["name"] for r in es.df("SHOW TABLES").collect()]
    assert names == ["documents", "events", "orders"]
    cols = {r["column"]: r["type"]
            for r in es.df("DESCRIBE documents").collect()}
    assert cols["doc_id"] == "bigint" and cols["text"] == "string"
    cols2 = [r["column"] for r in es.df("SHOW COLUMNS IN events").collect()]
    assert "event_type" in cols2
    with pytest.raises(EsSqlError, match="unknown table"):
        es.df("DESCRIBE nope")


def test_double_quoted_identifiers(es, spark):
    got = es.df('SELECT "lang", COUNT(*) AS n FROM "documents" '
                'GROUP BY "lang" ORDER BY n DESC, "lang" LIMIT 3')
    d = spark.read.parquet(f"{SF}/documents.parquet")
    want = (d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "lang").limit(3))
    assert got.collect() == want.collect()


def test_match_score_rank_identical_to_engine(es, spark):
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.bm25 import (
        bm25_score_terms,
    )
    got = es.df("""SELECT doc_id, SCORE() AS s FROM documents
WHERE MATCH(text, 'spark query')
ORDER BY SCORE() DESC, doc_id LIMIT 10""")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = (bm25_score_terms(docs, ["query", "spark"], EngineConfig(),
                             id_col="doc_id", text_col="text",
                             analyzer="simple")
            .orderBy(F.desc("score"), "doc_id").limit(10)
            .select("doc_id", F.col("score").alias("s")))
    assert got.collect() == want.collect()


def test_query_and_semantics(es, spark):
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_expr,
    )
    got = es.df("SELECT COUNT(*) AS n FROM documents "
                "WHERE QUERY('spark AND query')").collect()[0]["n"]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = tokenize_expr("text", "simple")
    want = docs.filter(F.array_contains(toks, "spark")
                       & F.array_contains(toks, "query")).count()
    assert got == want
    # OR twin differs (sanity that AND actually narrowed)
    got_or = es.df("SELECT COUNT(*) AS n FROM documents "
                   "WHERE QUERY('spark OR query')").collect()[0]["n"]
    assert got_or > got


def test_query_not_clause(es, spark):
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_expr,
    )
    got = es.df("SELECT COUNT(*) AS n FROM documents "
                "WHERE QUERY('spark -query')").collect()[0]["n"]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = tokenize_expr("text", "simple")
    want = docs.filter(F.array_contains(toks, "spark")
                       & ~F.array_contains(toks, "query")).count()
    assert got == want


def test_query_prefix_leaf(es, spark):
    got = es.df("SELECT COUNT(*) AS n FROM documents "
                "WHERE QUERY('spar*')").collect()[0]["n"]
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_expr,
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = docs.filter(F.exists(tokenize_expr("text", "simple"),
                                lambda t: t.startswith("spar"))).count()
    assert got == want


def test_query_mixed_term_prefix_scoring(spark):
    """Lucene clause-sum scoring for mixed term+prefix queries: a doc
    matching ONLY the prefix leaf scores exactly 1.0 (constant-score
    rewrite, not 0), a doc matching both scores BM25(term) + 1.0, and
    two matched prefix clauses each add 1.0. A negated prefix never
    contributes."""
    from elasticsearch_osmosis_plugin_spark.config import EngineConfig
    from elasticsearch_osmosis_plugin_spark.operators.bm25 import (
        bm25_score_terms,
    )

    docs = spark.createDataFrame(
        [(1, "alpha stuff here"),          # term only
         (2, "sparkly things glow"),       # prefix only
         (3, "alpha sparkly mix"),         # both
         (4, "unrelated filler row")],     # neither
        "doc_id long, text string")
    es2 = EsSql(spark, {"d": docs})
    got = {r["doc_id"]: r["s"] for r in es2.df(
        "SELECT doc_id, SCORE() AS s FROM d "
        "WHERE QUERY('alpha OR spark*') ORDER BY doc_id").collect()}
    assert set(got) == {1, 2, 3}
    bm25 = {r["doc_id"]: r["score"] for r in bm25_score_terms(
        docs, ["alpha"], EngineConfig(), id_col="doc_id",
        text_col="text", analyzer="simple").collect()}
    assert got[2] == 1.0
    assert abs(got[1] - bm25[1]) < 1e-12
    assert abs(got[3] - (bm25[3] + 1.0)) < 1e-12

    # two prefix clauses sum; negated prefix contributes nothing
    got2 = {r["doc_id"]: r["s"] for r in es2.df(
        "SELECT doc_id, SCORE() AS s FROM d "
        "WHERE QUERY('spark* OR glo* OR unrel*') ORDER BY doc_id"
    ).collect()}
    assert got2[2] == 2.0 and got2[3] == 1.0 and got2[4] == 1.0
    got3 = {r["doc_id"]: r["s"] for r in es2.df(
        "SELECT doc_id, SCORE() AS s FROM d "
        "WHERE QUERY('alpha -spark*') ORDER BY doc_id").collect()}
    assert set(got3) == {1} and abs(got3[1] - bm25[1]) < 1e-12


def test_constraints_raise(es):
    with pytest.raises(EsSqlError, match="at most one"):
        es.df("SELECT doc_id FROM documents WHERE MATCH(text, 'a') "
              "AND MATCH(lang, 'b')")
    with pytest.raises(EsSqlError, match="SCORE"):
        es.df("SELECT SCORE() FROM documents")
    with pytest.raises(EsSqlError, match="no analyzable"):
        es.df("SELECT doc_id FROM documents WHERE MATCH(text, '   ')")


def test_cursor_paging_streams_pages(es):
    cur = es.query("SELECT event_id FROM events ORDER BY event_id "
                   "LIMIT 25", fetch_size=10)
    pages = [[r["event_id"] for r in p] for p in cur]
    assert [len(p) for p in pages] == [10, 10, 5]
    flat = [x for p in pages for x in p]
    assert flat == sorted(flat) and len(set(flat)) == 25
    assert cur.fetch() == []          # exhausted cursor stays closed


def test_passthrough_join_matches_spark_sql(es, spark):
    got = es.df("""SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    want = (orders.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))
    assert got.collect() == want.collect()


def test_views_do_not_leak(es, spark):
    es.df("SELECT 1 FROM documents LIMIT 1").collect()
    assert not any(t.name == "documents"
                   for t in spark.catalog.listTables())
