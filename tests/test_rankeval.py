"""rank_eval (ES _rank_eval analog): hand-computed golden metrics +
index-path integration."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.operators.rankeval import (
    eval_ranking,
    rank_eval,
)
from elasticsearch_osmosis_plugin_spark.plans.build import build_index


def _x(v: float) -> int:
    return math.floor(v * 10000.0 + 0.5)


def test_eval_ranking_golden(spark):
    # query qa: ranked docs 1..5; ratings: d1=2, d3=1, d7=2 (unretrieved)
    ranked = spark.createDataFrame(
        [("qa", 1, 1), ("qa", 2, 2), ("qa", 3, 3), ("qa", 4, 4), ("qa", 5, 5)],
        "query_id string, doc_id long, rank int")
    ratings = spark.createDataFrame(
        [("qa", 1, 2), ("qa", 3, 1), ("qa", 7, 2)],
        "query_id string, doc_id long, rating int")
    row = eval_ranking(ranked, ratings, k=5, relevant_threshold=1,
                       max_rating=2).collect()[0]

    # precision = 2 relevant / 5 retrieved; recall = 2 / 3 rated-relevant
    assert row["precision_x1e4"] == _x(2 / 5)
    assert row["recall_x1e4"] == _x(2 / 3)
    assert row["mrr_x1e4"] == _x(1.0)  # first hit is relevant

    # dcg = 3/log2(2) + 0 + 1/log2(4) + 0 + 0 = 3 + 0.5
    dcg = 3.0 / math.log2(2) + 1.0 / math.log2(4)
    assert row["dcg_x1e4"] == _x(dcg)
    # ideal ranking of the rated set: ratings (2, 2, 1) at ranks 1..3
    idcg = 3.0 / math.log2(2) + 3.0 / math.log2(3) + 1.0 / math.log2(4)
    assert row["ndcg_x1e4"] == _x(dcg / idcg)

    # err with R = (2^r - 1)/4: positions (1, r=2, R=.75), (3, r=1, R=.25)
    err = 0.75 / 1 + (1 - 0.75) * 0.25 / 3
    assert row["err_x1e4"] == _x(err)


def test_eval_ranking_no_relevant_and_unrated_query(spark):
    ranked = spark.createDataFrame(
        [("qb", 10, 1), ("qb", 11, 2)],
        "query_id string, doc_id long, rank int")
    ratings = spark.createDataFrame(
        [("qb", 99, 0)], "query_id string, doc_id long, rating int")
    row = eval_ranking(ranked, ratings, k=5, max_rating=2).collect()[0]
    assert row["precision_x1e4"] == 0
    assert row["recall_x1e4"] == 0  # zero relevant in the rated set
    assert row["mrr_x1e4"] == 0
    assert row["ndcg_x1e4"] == 0
    assert row["err_x1e4"] == 0


@pytest.fixture(scope="module")
def re_index(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("re_idx") / "index")
    build_index(spark, corpus_df, path,
                EngineConfig(n_segments=4, n_buckets=4, block_size=16),
                id_col="doc_id", n_groups=1)
    return path


def test_rank_eval_index_path(spark, re_index):
    """Integration: batched rankings come from the persisted index and
    the metric stage agrees with eval_ranking over solo-topk ranks."""
    from elasticsearch_osmosis_plugin_spark.functions.analysis import x1e4
    from elasticsearch_osmosis_plugin_spark.operators.query import topk

    requests = {"r0": "public static void", "r1": "id0042 import"}
    # deterministic synthetic judgments over the corpus ids
    base = None
    for qid in requests:
        ids = topk(spark, re_index, requests[qid], k=50,
                   strategy="scoreall").select("doc_id")
        r = ids.select(F.lit(qid).alias("query_id"), "doc_id",
                       (F.col("doc_id") % 3).cast("int").alias("rating"))
        base = r if base is None else base.unionByName(r)
    base = base.cache()
    out = rank_eval(spark, re_index, requests, base, k=10).collect()
    assert {r["query_id"] for r in out} == set(requests)
    for r in out:
        assert 0 <= r["precision_x1e4"] <= 10000
        assert 0 <= r["ndcg_x1e4"] <= 10000
        assert 0 <= r["err_x1e4"] <= 10000
        assert r["n_retrieved"] <= 10

    # cross-check one query against eval_ranking on the solo topk ranking
    solo = (topk(spark, re_index, requests["r0"], k=30, strategy="scoreall")
            .select("doc_id", x1e4(F.col("score")).alias("s")))
    w_rows = solo.orderBy(F.desc("s"), F.asc("doc_id")).limit(10).collect()
    ranked = spark.createDataFrame(
        [("r0", r["doc_id"], i + 1) for i, r in enumerate(w_rows)],
        "query_id string, doc_id long, rank int")
    a = eval_ranking(ranked, base.filter(F.col("query_id") == "r0"),
                     k=10, max_rating=2).collect()[0]
    b = [r for r in out if r["query_id"] == "r0"][0]
    for c in ("precision_x1e4", "recall_x1e4", "mrr_x1e4",
              "dcg_x1e4", "ndcg_x1e4", "err_x1e4"):
        assert a[c] == b[c], c
    base.unpersist()
