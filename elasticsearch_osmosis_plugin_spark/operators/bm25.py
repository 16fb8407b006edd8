"""Pure-DataFrame BM25 (k1=1.2, b=0.75) — the M1 reference path.

This is the engine's *semantic definition* of ranked retrieval
(reference analog: ES relevance scoring exercised via hit lists,
``ESNodeITest.java:76,95,114``). The persisted-index engine
(``operators.query``) must be rank-identical to this path, which in
turn is rank-identical to the naive Python oracle (tests).

Everything below is Catalyst-native — including tokenization
(``tokenize_expr``), so every corpus pass is one whole-stage-codegen
scan with no Arrow boundary.

Scale notes (100 TB):
- query terms are filtered out of the exploded token stream BEFORE the
  (doc_id, term) aggregation — the shuffle carries only matching rows;
- per-doc length rides INSIDE the tf aggregation keys (functionally
  dependent on doc_id), so there is no corpus-sized tf⨝dl join — the
  only wide shuffle carries matching (doc, term) rows;
- corpus stats (N, avgdl) come from a 1-row partial aggregate (the
  shuffle moves one row per partition), cross-joined broadcast-style,
  never collected into closure captures;
- idf is computed on the tiny per-term df aggregate and broadcast into
  the scoring join.

BM25 variant: Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
    tokenize_expr,
    tokenize_py,
)
from elasticsearch_osmosis_plugin_spark.operators.topk import deterministic_topk


def tokenized(docs: DataFrame, text_col: str = "content",
              analyzer: str = "code") -> DataFrame:
    """docs + ``tokens`` column (Catalyst expression, codegen'd)."""
    return docs.withColumn("tokens", tokenize_expr(text_col, analyzer))


def _base(docs: DataFrame, id_col: str, text_col: str, analyzer: str,
          query_terms: list[str] | None) -> DataFrame:
    """One codegen'd projection: (doc_id, dl, _qtoks) — dl over ALL
    tokens, ``_qtoks`` restricted to the query terms so the explode
    below emits matching rows only."""
    toks = tokenize_expr(text_col, analyzer)
    qt = toks if query_terms is None else \
        F.filter(toks, lambda t: t.isin(*set(query_terms)))
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.size(toks).cast("double").alias("dl"),
                       qt.alias("_qtoks"))


def doc_term_stats(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "content", analyzer: str = "code",
                   query_terms: list[str] | None = None):
    """Returns (tf_df, dl_df): per-(doc, term) tf and per-doc length.

    When ``query_terms`` is given, the token stream is filtered before
    the wide (doc_id, term) aggregation — at scale this is the
    difference between shuffling matching postings and shuffling the
    whole corpus.
    """
    base = _base(docs, id_col, text_col, analyzer, query_terms)
    tf = (base.select("doc_id", F.explode("_qtoks").alias("term"))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("double").alias("tf")))
    return tf, base.select("doc_id", "dl")


def bm25_score_terms(docs: DataFrame, query_terms: list[str],
                     cfg: EngineConfig = EngineConfig(),
                     id_col: str = "doc_id", text_col: str = "content",
                     analyzer: str = "code") -> DataFrame:
    """DataFrame of (doc_id, score) for docs matching >=1 query term."""
    base = _base(docs, id_col, text_col, analyzer, query_terms)
    # 1-row corpus stats: partial-aggregated map-side, shuffle moves
    # one row per partition
    stats = base.agg(F.count(F.lit(1)).cast("double").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    # dl rides in the grouping keys (functionally dependent on doc_id):
    # tf + dl from ONE shuffle of matching rows, no corpus-sized join
    tf = (base.select("doc_id", "dl", F.explode("_qtoks").alias("term"))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count(F.lit(1)).cast("double").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    k1, b = F.lit(cfg.k1), F.lit(cfg.b)
    scored = (
        tf.join(F.broadcast(df_), "term")          # tiny: one row per query term
          .crossJoin(F.broadcast(stats))           # 1-row corpus stats
          .withColumn("idf", F.log(F.lit(1.0)
                       + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
          .withColumn(
              "partial",
              F.col("idf") * F.col("tf") * (k1 + 1.0)
              / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
    )
    return scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))


def bm25_explain(docs: DataFrame, query_terms: list[str],
                 cfg: EngineConfig = EngineConfig(),
                 id_col: str = "doc_id", text_col: str = "content",
                 analyzer: str = "code") -> DataFrame:
    """Score breakdown per (doc, term) — the ES ``_explain`` API
    analog: tf, dl, idf and the BM25 partial each matching term
    contributes. Fixed-point (x1e4) outputs for cross-engine equality;
    the same single-shuffle plan as ``bm25_score_terms``."""
    from elasticsearch_osmosis_plugin_spark.functions.analysis import x1e4

    base = _base(docs, id_col, text_col, analyzer, query_terms)
    stats = base.agg(F.count(F.lit(1)).cast("double").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    tf = (base.select("doc_id", "dl", F.explode("_qtoks").alias("term"))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count(F.lit(1)).cast("double").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    k1, b = F.lit(cfg.k1), F.lit(cfg.b)
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    joined = (tf.join(F.broadcast(df_), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn("idf", idf)
              .withColumn("partial",
                          F.col("idf") * F.col("tf") * (k1 + 1.0)
                          / (F.col("tf") + k1 * (1.0 - b
                                                 + b * F.col("dl") / F.col("avgdl")))))
    return joined.select(
        "doc_id", "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("dl"),
        x1e4(F.col("idf")).alias("idf_x1e4"),
        x1e4(F.col("partial")).alias("partial_x1e4"))


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


def lm_oracle(rows: list[tuple[int, str]], query: str, k: int,
              similarity: str = "lm_dirichlet", mu: float = 2000.0,
              lam: float = 0.1, analyzer: str = "code") -> list[tuple[int, float]]:
    """Naive single-process Lucene LM-similarity oracle — the
    rank-identity oracle for ``operators.query.topk_lm``. Collection
    model (cf+1)/(T+1); per-term clauses clamped at 0; docs whose
    clamped sum is 0 are not hits."""
    terms = sorted(set(tokenize_py(query, analyzer)))
    if not terms:
        return []
    toks = {d: tokenize_py(t, analyzer) for d, t in rows}
    total = sum(len(v) for v in toks.values())
    cf = {t: sum(v.count(t) for v in toks.values()) for t in terms}
    p = {t: (cf[t] + 1.0) / (total + 1.0) for t in terms}
    out = []
    for d, v in toks.items():
        dl, s = len(v), 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            if similarity == "lm_dirichlet":
                w = math.log(1.0 + tf / (mu * p[t])) + math.log(mu / (dl + mu))
            else:
                w = math.log(1.0 + (1.0 - lam) * tf / (dl * lam * p[t]))
            s += max(w, 0.0)
        if s > 0.0:
            out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def classic_oracle(rows: list[tuple[int, str]], query: str, k: int,
                   analyzer: str = "code") -> list[tuple[int, float]]:
    """Naive single-process Lucene ClassicSimilarity (TF-IDF) — the
    rank-identity oracle for ``operators.query.topk_classic`` (the
    similarity the reference's ES 0.90 stack actually used):
    coord * queryNorm * sum_t idf^2 * sqrt(tf) / sqrt(dl), with
    idf = 1 + ln(N / (df + 1)); absent terms keep their clause in
    queryNorm and coord's denominator."""
    terms = sorted(set(tokenize_py(query, analyzer)))
    if not terms:
        return []
    toks = {d: tokenize_py(t, analyzer) for d, t in rows}
    n = len(toks)
    dfreq = {t: sum(1 for v in toks.values() if t in set(v)) for t in terms}
    idf = {t: 1.0 + math.log(n / (dfreq[t] + 1.0)) for t in terms}
    qnorm = 1.0 / math.sqrt(sum(v * v for v in idf.values()))
    out = []
    for d, v in toks.items():
        s, nt = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            nt += 1
            s += idf[t] * idf[t] * math.sqrt(tf) / math.sqrt(len(v))
        if nt:
            out.append((d, s * qnorm * nt / len(terms)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]
