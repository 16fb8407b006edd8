"""Ranked-retrieval evaluation — the ES ``_rank_eval`` API, native.

The reference stack's users evaluate their search quality with
Elasticsearch's ranking-evaluation endpoint (rated (query, doc)
judgments -> precision@k / recall@k / MRR / DCG / NDCG / ERR per
request plus a combined mean). Here the same contract is a pure
DataFrame program:

- the rankings for ALL requests come from ONE batched index pass
  (``operators.query.topk_many`` — one postings decode, one shuffle,
  regardless of request count);
- every metric is then computed on the k-sized ranked slice joined to
  the (broadcast) ratings relation — window functions and column
  expressions only, so the evaluation itself costs nothing at any
  corpus scale: the data volume after the top-k cut is
  ``n_requests x k`` rows, full stop.

Metric definitions follow the ES rank_eval module:

- ``precision@k``   relevant_retrieved / retrieved (rating >= threshold)
- ``recall@k``      relevant_retrieved / total_relevant(query)
- ``mrr``           1 / rank of the first relevant hit (0 if none)
- ``dcg@k``         sum (2^rating - 1) / log2(rank + 1), unrated = 0
- ``ndcg@k``        dcg / ideal-dcg over the query's rated set
- ``err@k``         sum_i R_i / i * prod_{j<i} (1 - R_j),
                    R = (2^rating - 1) / 2^max_rating

ERR's sequential prefix product is expressed as
``exp(cumulative-window-sum of ln(1 - R))`` — R < 1 always (the
numerator is 2^r - 1 < 2^max), so the log is finite and the whole
metric stays one whole-stage-codegen window pass, no UDF, no fold.

Reference provenance: the reference delegates all search to ES
(SURVEY.md §2.B); rank_eval is the ES-side quality-evaluation surface
for exactly those delegated queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def eval_ranking(ranked: DataFrame, ratings: DataFrame, k: int = 10,
                 relevant_threshold: int = 1,
                 max_rating: int | None = None) -> DataFrame:
    """Score a ranking against rated judgments.

    ``ranked``: (query_id, doc_id, rank) with rank 1-based and dense
    per query (any ranking source: index top-k, hybrid RRF, ANN).
    ``ratings``: (query_id, doc_id, rating) — int ratings, docs absent
    from the relation are unrated (= rating 0, the ES default).

    Returns one row per query_id with x1e4 fixed-point metrics:
    (query_id, n_retrieved, precision_x1e4, recall_x1e4, mrr_x1e4,
    dcg_x1e4, ndcg_x1e4, err_x1e4).
    """
    if max_rating is None:
        mr = ratings.agg(F.max("rating")).collect()[0][0]
        max_rating = int(mr) if mr is not None else 1
    max_rating = max(1, int(max_rating))

    hits = (ranked.filter(F.col("rank") <= k)
            .join(F.broadcast(ratings), ["query_id", "doc_id"], "left")
            .withColumn("rating", F.coalesce(F.col("rating"), F.lit(0))))

    rel = (F.col("rating") >= relevant_threshold).cast("double")
    gain = F.pow(F.lit(2.0), F.col("rating")) - F.lit(1.0)
    # ERR per-position stop probability and its exclusive prefix
    # product of survival (1 - R): cumulative ln-sum over ranks < i.
    r_i = gain / F.lit(float(2 ** max_rating))
    w_prev = (Window.partitionBy("query_id").orderBy("rank")
              .rowsBetween(Window.unboundedPreceding, -1))
    survive = F.exp(F.coalesce(
        F.sum(F.log(F.lit(1.0) - r_i)).over(w_prev), F.lit(0.0)))

    per_hit = hits.select(
        "query_id", "rank", rel.alias("rel"),
        (gain / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg_part"),
        (r_i / F.col("rank") * survive).alias("err_part"),
        F.when(rel > 0, F.lit(1.0) / F.col("rank")).alias("rr"))

    agg = per_hit.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum("rel").alias("n_rel_ret"),
        F.sum("dcg_part").alias("dcg"),
        F.sum("err_part").alias("err"),
        F.coalesce(F.max("rr"), F.lit(0.0)).alias("mrr"))

    # per-query totals + ideal DCG from the rated set alone (ES ranks
    # the query's OWN judgments descending and takes the top k)
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.desc("rating"), F.asc("doc_id"))
    ideal = (ratings.withColumn("_irk", F.row_number().over(w_ideal))
             .groupBy("query_id")
             .agg(F.sum(F.when((F.col("rating") >= relevant_threshold), 1)
                        .otherwise(0)).alias("n_rel_total"),
                  F.sum(F.when(
                      F.col("_irk") <= k,
                      (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
                      / F.log2(F.col("_irk") + F.lit(1.0))).otherwise(0.0))
                  .alias("idcg")))

    x = lambda c: F.floor(c * 10000.0 + F.lit(0.5)).cast("long")  # noqa: E731
    return (agg.join(F.broadcast(ideal), "query_id", "left")
            .select(
                "query_id",
                F.col("n_retrieved").cast("long").alias("n_retrieved"),
                x(F.col("n_rel_ret") / F.col("n_retrieved"))
                .alias("precision_x1e4"),
                x(F.when(F.coalesce(F.col("n_rel_total"), F.lit(0)) > 0,
                         F.col("n_rel_ret") / F.col("n_rel_total"))
                  .otherwise(0.0)).alias("recall_x1e4"),
                x(F.col("mrr")).alias("mrr_x1e4"),
                x(F.col("dcg")).alias("dcg_x1e4"),
                x(F.when(F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                         F.col("dcg") / F.col("idcg"))
                  .otherwise(0.0)).alias("ndcg_x1e4"),
                x(F.col("err")).alias("err_x1e4"))
            .orderBy("query_id"))


def rank_eval(spark: SparkSession, index_path: str,
              requests: dict[str, str], ratings: DataFrame,
              k: int = 10, relevant_threshold: int = 1,
              max_rating: int | None = None) -> DataFrame:
    """ES ``_rank_eval`` over the persisted index: run every request
    through the batched BM25 path, rank on the x1e4 fixed point
    (score desc, doc_id asc — the engine's tie rule), evaluate.

    One postings decode serves all requests; the metric stage sees
    only ``len(requests) * k`` rows.
    """
    from elasticsearch_osmosis_plugin_spark.functions.analysis import x1e4
    from elasticsearch_osmosis_plugin_spark.operators.query import topk_many

    raw = topk_many(spark, index_path, requests, k=k + 20)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_x1e4"), F.asc("doc_id"))
    ranked = (raw.select("query_id", "doc_id",
                         x1e4(F.col("score")).alias("score_x1e4"))
              .withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k))
    return eval_ranking(ranked.select("query_id", "doc_id", "rank"),
                        ratings, k=k, relevant_threshold=relevant_threshold,
                        max_rating=max_rating)
