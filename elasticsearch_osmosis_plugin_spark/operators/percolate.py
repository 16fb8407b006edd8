"""ES percolator analog — reverse search.

The 0.90-era ``_percolate`` API (a headline Elasticsearch feature of
the reference's target version): queries are REGISTERED, documents
stream through, and each doc comes back with the ids of the queries it
matches — alerting/classification over an ingest stream, the inverse
of normal search.

Spark-first shape: this is a map-side-only operator. The registered
query set is small (it lived in ES's ``_percolator`` index); here it
folds into ONE literal array of (query_id, terms) structs inside the
plan, each doc tokenizes once through the same Catalyst analyzer chain
the index build uses, and a higher-order ``filter`` + ``explode``
emits the matching ids — no shuffle, no join, no per-row Python, so it
composes directly with ``foreachBatch`` streaming ingest at any rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
    tokenize_expr,
    tokenize_py,
)


def percolate(df: DataFrame, queries: dict[str, str | dict], *,
              analyzer: str = "code", mode: str = "all",
              id_col: str = "doc_id", text_col: str = "text",
              ordered: bool = True) -> DataFrame:
    """-> (doc_id, query_id) for every (doc, registered query) match,
    (doc_id, query_id)-ordered. ``mode="all"``: the doc must contain
    every query term (ES match operator=and, the percolator's usual
    registration form); ``mode="any"``: at least one term. A query may
    also register as ``{"match_phrase": "..."}`` — contiguous-sequence
    matching via the same phrase expression the index-side path uses,
    still map-side (each registered phrase unrolls into the one
    projection). Docs matching nothing produce no rows (exactly the
    API's behavior). ``ordered=False`` skips the final global sort —
    required when ``df`` is a streaming DataFrame (per-micro-batch
    output has no global order to impose), and the fastest choice
    whenever the caller aggregates the matches anyway."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    phrases: dict[str, list[str]] = {}
    term_qs: dict[str, str] = {}
    for qid, q in queries.items():
        if isinstance(q, dict):
            kind = next(iter(q))
            if kind != "match_phrase":
                raise ValueError(f"unsupported percolator query: {kind}")
            phrases[qid] = tokenize_py(str(q[kind]), analyzer)
        else:
            term_qs[qid] = q
    phrases = {qid: ts for qid, ts in phrases.items() if ts}
    qterms = {qid: sorted(set(tokenize_py(q, analyzer)))
              for qid, q in term_qs.items()}
    qterms = {qid: ts for qid, ts in qterms.items() if ts}
    if not qterms and not phrases:
        return df.sparkSession.createDataFrame(
            [], "doc_id long, query_id string")
    registered = F.array(*[
        F.struct(F.lit(qid).alias("qid"),
                 F.array(*[F.lit(t) for t in ts]).alias("terms"))
        for qid, ts in sorted(qterms.items())])
    toks = F.array_distinct(tokenize_expr(text_col, analyzer))
    if mode == "all":
        hit = lambda q: F.size(F.array_except(q["terms"], F.col("_toks"))) == 0  # noqa: E731
    else:
        hit = lambda q: F.arrays_overlap(q["terms"], F.col("_toks"))  # noqa: E731
    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        phrase_match_expr,
    )

    seq = tokenize_expr(text_col, analyzer)  # positional, for phrases
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"),
                     *([seq.alias("_seq")] if phrases else []))
    matched = F.transform(F.filter(registered, hit), lambda q: q["qid"]) \
        if qterms else F.array().cast("array<string>")
    for qid, ts in sorted(phrases.items()):
        matched = F.concat(matched, F.when(
            phrase_match_expr(F.col("_seq"), ts),
            F.array(F.lit(qid))).otherwise(F.array().cast("array<string>")))
    out = (base.select("doc_id", F.explode(matched).alias("query_id")))
    return out.orderBy("doc_id", "query_id") if ordered else out
