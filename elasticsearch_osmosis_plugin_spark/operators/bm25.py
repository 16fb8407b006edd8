"""Pure-DataFrame BM25 (k1=1.2, b=0.75) — the M1 reference path.

This is the engine's *semantic definition* of ranked retrieval
(reference analog: ES relevance scoring exercised via hit lists,
``ESNodeITest.java:76,95,114``). The persisted-index engine
(``operators.query``) must be rank-identical to this path, which in
turn is rank-identical to the naive Python oracle (tests).

Everything below is Catalyst-native (codegen'd column expressions,
broadcast-able tiny dims, single narrow filter *before* any shuffle)
except document tokenization, which is the vectorized pandas UDF.

Scale notes (100 TB):
- query terms are filtered out of the exploded token stream BEFORE the
  (doc_id, term) aggregation — the shuffle carries only matching rows;
- corpus stats (N, avgdl) come from a 1-row aggregate, cross-joined
  broadcast-style, never collected into closure captures;
- idf is computed on the tiny per-term df aggregate and broadcast into
  the scoring join.

BM25 variant: Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.functions.tokenizer import tokenize_py, tokenize_udf
from elasticsearch_osmosis_plugin_spark.operators.topk import deterministic_topk


def tokenized(docs: DataFrame, text_col: str = "content",
              analyzer: str = "code") -> DataFrame:
    """docs + ``tokens`` column (vectorized pandas UDF)."""
    return docs.withColumn("tokens", tokenize_udf(analyzer)(F.col(text_col)))


def doc_term_stats(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "content", analyzer: str = "code",
                   query_terms: list[str] | None = None):
    """Returns (tf_df, dl_df): per-(doc, term) tf and per-doc length.

    When ``query_terms`` is given, the token stream is filtered before
    the wide (doc_id, term) aggregation — at scale this is the
    difference between shuffling matching postings and shuffling the
    whole corpus.
    """
    toks = tokenized(docs, text_col, analyzer).select(
        F.col(id_col).alias("doc_id"), "tokens")
    exploded = toks.select("doc_id", F.explode("tokens").alias("term"))
    dl = toks.select("doc_id", F.size("tokens").cast("double").alias("dl"))
    if query_terms is not None:
        exploded = exploded.filter(F.col("term").isin(list(set(query_terms))))
    tf = exploded.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"))
    return tf, dl


def bm25_score_terms(docs: DataFrame, query_terms: list[str],
                     cfg: EngineConfig = EngineConfig(),
                     id_col: str = "doc_id", text_col: str = "content",
                     analyzer: str = "code") -> DataFrame:
    """DataFrame of (doc_id, score) for docs matching >=1 query term."""
    tf, dl = doc_term_stats(docs, id_col, text_col, analyzer, query_terms)
    stats = dl.agg(F.count(F.lit(1)).cast("double").alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    k1, b = F.lit(cfg.k1), F.lit(cfg.b)
    scored = (
        tf.join(dl, "doc_id")                      # dl lookup (co-keyed on doc_id)
          .join(F.broadcast(df_), "term")          # tiny: one row per query term
          .crossJoin(F.broadcast(stats))           # 1-row corpus stats
          .withColumn("idf", F.log(F.lit(1.0)
                       + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
          .withColumn(
              "partial",
              F.col("idf") * F.col("tf") * (k1 + 1.0)
              / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
    )
    return scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))


def bm25_topk(docs: DataFrame, query: str, k: int = 10,
              cfg: EngineConfig = EngineConfig(),
              id_col: str = "doc_id", text_col: str = "content",
              analyzer: str = "code", round_dp: int | None = None) -> DataFrame:
    """Top-k BM25: deterministic (score DESC, doc_id ASC)."""
    terms = sorted(set(tokenize_py(query, analyzer)))
    scores = bm25_score_terms(docs, terms, cfg, id_col, text_col, analyzer)
    return deterministic_topk(scores, k, round_dp=round_dp)


def bm25_oracle(rows: list[tuple[int, str]], query: str, k: int,
                cfg: EngineConfig = EngineConfig(),
                analyzer: str = "code") -> list[tuple[int, float]]:
    """Naive single-process Python BM25 — the rank-identity oracle
    (SURVEY.md §5: 'reference engine' for rank-identity)."""
    terms = sorted(set(tokenize_py(query, analyzer)))
    toks = {d: tokenize_py(t, analyzer) for d, t in rows}
    n = len(toks)
    if n == 0:
        return []
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in set(v)) for t in terms}
    out = []
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (cfg.k1 + 1.0) / (
                tf + cfg.k1 * (1.0 - cfg.b + cfg.b * len(v) / avgdl))
        if s > 0.0:
            out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]
