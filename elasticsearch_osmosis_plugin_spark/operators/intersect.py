"""Boolean retrieval over the persisted index: posting intersection.

Posting-list intersection is semantically a semi-join chain
(SURVEY.md §2.C "Joins"): docs(t1) ⋉ docs(t2) ⋉ ... Ordering the chain
rarest-term-first (df ascending, from the dictionary) minimizes the
intermediate sizes — Catalyst broadcasts the small side automatically
under AQE when a term's postings are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_osmosis_plugin_spark.operators.query import (
    DECODED_SCHEMA,
    _decode_score,
    _live,
    _pruned_postings,
    dictionary_rows,
    query_terms,
)
from elasticsearch_osmosis_plugin_spark.plans.build import load_meta, tombstones_df


_SCORE_COLS = ["term", "doc_ids_vb", "tfs_vb", "dls_vb"]


def _term_docs(spark, index_path, term, meta) -> DataFrame:
    posts = _pruned_postings(spark, index_path, [term], meta)
    decoded = posts.select(*_SCORE_COLS).mapInPandas(
        _decode_score({term: 1.0}, meta["k1"], meta["b"], meta["avgdl"]),
        DECODED_SCHEMA)
    return _live(decoded.select("doc_id"),
                 tombstones_df(spark, index_path, meta))


def match_all_terms(spark: SparkSession, index_path: str, query: str) -> DataFrame:
    """doc_ids containing ALL query terms (conjunctive AND)."""
    meta = load_meta(index_path)
    terms = query_terms(query, meta)
    dic = dictionary_rows(spark, index_path, terms, meta)
    if dic.empty or len(dic) < len(terms):
        # some term matches nothing -> empty intersection
        return spark.createDataFrame([], "doc_id long")
    order = list(dic.sort_values(["df", "term"])["term"])  # rarest first
    out = _term_docs(spark, index_path, order[0], meta).distinct()
    for t in order[1:]:
        out = out.join(_term_docs(spark, index_path, t, meta), "doc_id", "left_semi")
    return out.orderBy("doc_id")


def phrase_match_expr(tokens_col, terms: list[str]):
    """Column predicate: token array contains ``terms`` as a contiguous
    subsequence. Pure Catalyst (exists over slice equality)."""
    n = len(terms)
    phrase = F.array(*[F.lit(t) for t in terms])
    k = F.size(tokens_col) - (n - 1)
    return F.when(k >= 1, F.exists(
        F.sequence(F.lit(1), k),
        lambda i: F.slice(tokens_col, i, n) == phrase)).otherwise(F.lit(False))


def match_phrase(spark: SparkSession, index_path: str, phrase: str) -> DataFrame:
    """doc_ids containing the phrase's terms CONTIGUOUSLY IN ORDER
    (ES match_phrase analog). Two-stage plan, fully index-side when the
    index stores positions (the default — the role ES positional
    postings play):

    1. candidate docs = posting intersection (doc-id streams only);
    2. decode the phrase terms' POSITION streams, keep candidate docs,
       and check alignment: occurrence of term_i at position p matches
       the phrase when every other term_j has an occurrence at
       p + (j - i) — expressed as a groupBy on (doc, pos - i) counting
       distinct phrase slots, no per-row Python beyond the varbyte
       decode kernel.

    Falls back to term-vector adjacency verification for indexes built
    with ``store_positions=False`` (requires retained tokens)."""
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import tokenize_py
    from elasticsearch_osmosis_plugin_spark.plans import catalog

    meta = load_meta(index_path)
    terms = tokenize_py(phrase, meta["analyzer"],
                        min_len=meta.get("min_token_len", 1),
                        max_len=meta.get("max_token_len", 64))  # ordered!
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    cands = match_all_terms(spark, index_path, phrase)
    if len(terms) == 1:
        return cands

    if meta.get("positions", False):
        from elasticsearch_osmosis_plugin_spark.operators.query import (
            POSITIONS_SCHEMA,
            _decode_positions,
        )

        uniq = sorted(set(terms))
        posts = _pruned_postings(spark, index_path, uniq, meta)
        occ = (posts.select("term", "doc_ids_vb", "tfs_vb", "pos_vb")
               .mapInPandas(_decode_positions(uniq), POSITIONS_SCHEMA)
               .join(cands, "doc_id", "left_semi"))
        slots = spark.createDataFrame(
            [(i, t) for i, t in enumerate(terms)], "slot int, term string")
        aligned = (occ.join(F.broadcast(slots), "term")
                   .select("doc_id", (F.col("pos") - F.col("slot")).alias("apos"),
                           "slot"))
        hits = (aligned.groupBy("doc_id", "apos")
                .agg(F.countDistinct("slot").alias("n_slots"))
                .filter(F.col("n_slots") == len(terms)))
        return hits.select("doc_id").distinct().orderBy("doc_id")

    ds = catalog.read_table(spark, index_path, "docstats")
    if "tokens" not in ds.columns or not catalog.read_manifest(
            index_path, "docstats").get("term_vectors", False):
        raise ValueError("phrase match needs positional postings "
                         "(store_positions=True) or the term-vector store")
    verified = (ds.select("doc_id", "tokens")
                .join(cands, "doc_id", "left_semi")
                .filter(phrase_match_expr(F.col("tokens"), terms)))
    return verified.select("doc_id").orderBy("doc_id")


def expand_terms(spark: SparkSession, index_path: str, pattern: str,
                 mode: str = "prefix", max_expansions: int = 50,
                 _meta=None, _dic=None) -> list[str]:
    """Dictionary expansion for multi-term queries (ES prefix /
    wildcard / regexp analog): scan the DICTIONARY (tiny — metadata
    columns only, never postings) for terms matching the pattern and
    return the first ``max_expansions`` in term order — exactly ES's
    deterministic expansion cap. ``mode``: "prefix" (startswith) or
    "regex" (Java regex, full-term anchored match like ES regexp).

    A prefix pattern cannot prune term buckets (bucket = hash(term)),
    so this reads every bucket's dictionary rows — still metadata-tiny
    relative to any posting scan."""
    from elasticsearch_osmosis_plugin_spark.plans.build import dictionary_df

    dic = dictionary_df(spark, index_path) if _dic is None else _dic
    if mode == "prefix":
        m = dic.filter(F.col("term").startswith(pattern))
    elif mode == "regex":
        m = dic.filter(F.col("term").rlike(f"^(?:{pattern})$"))
    else:
        raise ValueError(f"unknown expansion mode: {mode}")
    rows = (m.select("term").distinct().orderBy("term")
            .limit(max_expansions).collect())
    return [r["term"] for r in rows]


def expand_fuzzy(spark: SparkSession, index_path: str, term: str,
                 max_edits: int = 1, max_expansions: int = 50,
                 _dic=None) -> list[str]:
    """ES fuzzy-query expansion: dictionary terms within Levenshtein
    distance ``max_edits`` of ``term`` (ES AUTO fuzziness caps at 2).
    A length pre-filter (||t|-|q|| <= max_edits) prunes the dictionary
    scan before the edit-distance kernel runs; expansion is capped
    deterministically by (distance, term) — closest first, exactly
    ES's behavior of preferring nearer terms under the cap."""
    from elasticsearch_osmosis_plugin_spark.plans.build import dictionary_df

    dic = dictionary_df(spark, index_path) if _dic is None else _dic
    cand = dic.filter(
        F.abs(F.length("term") - F.lit(len(term))) <= max_edits)
    rows = (cand.select("term",
                        F.levenshtein(F.col("term"), F.lit(term)).alias("d"))
            .filter(F.col("d") <= max_edits)
            .select("term", "d").distinct()
            .orderBy("d", "term").limit(max_expansions).collect())
    return [r["term"] for r in rows]


def match_fuzzy(spark: SparkSession, index_path: str, term: str,
                max_edits: int = 1,
                max_expansions: int = 50) -> DataFrame:
    """doc_ids containing >=1 term within ``max_edits`` of ``term``
    (constant-score, ES fuzzy-query analog)."""
    meta = load_meta(index_path)
    terms = expand_fuzzy(spark, index_path, term, max_edits, max_expansions)
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    posts = _pruned_postings(spark, index_path, terms, meta)
    decoded = posts.select(*_SCORE_COLS).mapInPandas(
        _decode_score({t: 1.0 for t in terms},
                      meta["k1"], meta["b"], meta["avgdl"]),
        DECODED_SCHEMA)
    return (_live(decoded.select("doc_id"),
                  tombstones_df(spark, index_path, meta))
            .distinct().orderBy("doc_id"))


def match_expanded(spark: SparkSession, index_path: str, pattern: str,
                   mode: str = "prefix",
                   max_expansions: int = 50) -> DataFrame:
    """doc_ids containing >=1 term matching the pattern
    (constant-score, like ES prefix/wildcard/regexp queries)."""
    meta = load_meta(index_path)
    terms = expand_terms(spark, index_path, pattern, mode, max_expansions,
                         _meta=meta)
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    posts = _pruned_postings(spark, index_path, terms, meta)
    decoded = posts.select(*_SCORE_COLS).mapInPandas(
        _decode_score({t: 1.0 for t in terms},
                      meta["k1"], meta["b"], meta["avgdl"]),
        DECODED_SCHEMA)
    return (_live(decoded.select("doc_id"),
                  tombstones_df(spark, index_path, meta))
            .distinct().orderBy("doc_id"))


def facet_counts(spark: SparkSession, index_path: str, query: str,
                 facet_col: str, mode: str = "any") -> DataFrame:
    """ES terms-aggregation analog: bucket the docs matching ``query``
    by a doc-store carry column -> (facet value, n_docs), count-desc
    then value for deterministic order. ``mode``: "any" (OR semantics,
    the ES filtered-agg default here) or "all" (AND).

    Plan: matching doc ids (posting union/intersection) semi-join the
    doc-store — which prunes its scan to (doc_id, facet_col) — then a
    tiny groupBy on the facet values."""
    from elasticsearch_osmosis_plugin_spark.plans import catalog

    docs = (match_any_terms(spark, index_path, query) if mode == "any"
            else match_all_terms(spark, index_path, query))
    ds = catalog.read_table(spark, index_path, "docstats") \
        .select("doc_id", facet_col)
    return (ds.join(docs, "doc_id", "left_semi")
            .groupBy(facet_col)
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc(facet_col)))


def match_any_terms(spark: SparkSession, index_path: str, query: str) -> DataFrame:
    """doc_ids containing >=1 query term (disjunctive OR) — union + dedupe."""
    meta = load_meta(index_path)
    terms = query_terms(query, meta)
    dic = dictionary_rows(spark, index_path, terms, meta)
    if dic.empty:
        return spark.createDataFrame([], "doc_id long")
    posts = _pruned_postings(spark, index_path, list(dic["term"]), meta)
    decoded = posts.select(*_SCORE_COLS).mapInPandas(
        _decode_score({t: 1.0 for t in dic["term"]},
                      meta["k1"], meta["b"], meta["avgdl"]),
        DECODED_SCHEMA)
    return (_live(decoded.select("doc_id"),
                  tombstones_df(spark, index_path, meta))
            .distinct().orderBy("doc_id"))
