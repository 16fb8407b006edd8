"""ES nested field type + nested query, Spark-native.

Elasticsearch's ``nested`` type exists because Lucene flattens arrays
of objects: ``[{a:1, b:2}, {a:2, b:1}]`` flattened matches the query
``a=1 AND b=1`` even though no single element has both — the nested
type stores each object as a hidden sub-document so predicates apply
PER ELEMENT. Spark has a first-class answer: an ``array<struct>``
column plus higher-order functions, so the nested query is literally
``F.exists(col, lambda e: <all conditions on e>)`` — one whole-stage-
codegen expression, no sub-documents, no block-join, no shuffle.

Surface (mirrors the ES query forms):

- :func:`nested_match` — the nested query: docs where >= 1 element
  satisfies ALL conditions together.
- :func:`inner_hits` — ES inner_hits: attach the matching elements
  (``F.filter``) to each hit.
- :func:`nested_score` — score_mode sum/avg/min/max/none over a
  per-element score expression of the MATCHING elements (ES aggregates
  child scores the same way); ``F.aggregate`` fold, still no UDF.
- :func:`nest_children` — build the nested representation from a flat
  child table: groupBy parent + ``collect_list(struct(...))`` (the
  ingest-side analog of ES's nested mapping; at scale this is the one
  shuffle, keyed and reusable by every later nested query).

The reference's ES 0.90 target ships the same nested type/query
surface; the reference itself stores flat OSM entities, so this is
query-parity for mapped users, exercised over the events table.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def nest_children(children: DataFrame, parent_col: str,
                  fields: Sequence[str],
                  nested_col: str = "children") -> DataFrame:
    """Flat child rows -> one row per parent with an array<struct>
    nested column (deterministic element order: sorted by the struct
    fields in order). The single shuffle is the parent groupBy; every
    nested query after this is shuffle-free."""
    s = F.struct(*[F.col(f) for f in fields])
    return (children.groupBy(parent_col)
            .agg(F.sort_array(F.collect_list(s)).alias(nested_col)))


def nested_terms_agg(df: DataFrame, nested_col: str, key_field: str,
                     parent_col: str) -> DataFrame:
    """ES ``nested`` aggregation with a ``terms`` sub-agg AND a
    ``reverse_nested`` sub-agg, in one pass: bucket the nested
    elements of ``nested_col`` by ``key_field`` ->
    (key_field, n_nested, n_docs), ordered by n_nested desc then key.

    - ``n_nested`` is the nested agg's doc_count (ES counts the hidden
      sub-documents, so multiplicity inside one parent counts);
    - ``n_docs`` is what a ``reverse_nested: {}`` sub-agg restores —
      distinct PARENT documents holding >= 1 element in the bucket.

    One explode + one groupBy (the single shuffle, keyed by the
    bucket); count is map-side combined and the distinct-parent count
    is Spark's partial-aggregation distinct — no sub-document join,
    which is the whole point of the array<struct> representation."""
    ex = df.select(F.col(parent_col),
                   F.explode(F.col(nested_col)).alias("_e"))
    return (ex.groupBy(F.col(f"_e.{key_field}").alias(key_field))
            .agg(F.count(F.lit(1)).alias("n_nested"),
                 F.countDistinct(parent_col).alias("n_docs"))
            .orderBy(F.desc("n_nested"), F.asc(key_field)))


def nested_match(df: DataFrame, nested_col: str,
                 pred: Callable[[Column], Column]) -> DataFrame:
    """ES nested query: keep rows where at least one element of
    ``nested_col`` satisfies ``pred`` (ALL its conditions on the SAME
    element — the semantics object-flattening gets wrong)."""
    return df.filter(F.exists(F.col(nested_col), pred))


def inner_hits(df: DataFrame, nested_col: str,
               pred: Callable[[Column], Column],
               out_col: str = "inner_hits") -> DataFrame:
    """ES inner_hits: nested_match plus the matching elements
    themselves, as a (still nested) array column."""
    return (nested_match(df, nested_col, pred)
            .withColumn(out_col, F.filter(F.col(nested_col), pred)))


def nested_score(df: DataFrame, nested_col: str,
                 pred: Callable[[Column], Column],
                 score: Callable[[Column], Column],
                 score_mode: str = "sum",
                 out_col: str = "score") -> DataFrame:
    """ES nested query score_mode: fold a per-element ``score``
    expression over the MATCHING elements of each hit.

    ``score_mode``: "sum" | "avg" | "min" | "max" | "none" (1.0, the
    constant-score filter context). One ``F.aggregate`` over the
    filtered array — per-row, JVM-side."""
    hits = nested_match(df, nested_col, pred)
    matched = F.filter(F.col(nested_col), pred)
    vals = F.transform(matched, lambda e: score(e).cast("double"))
    total = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
    n = F.size(vals).cast("double")
    if score_mode == "sum":
        expr = total
    elif score_mode == "avg":
        expr = total / n
    elif score_mode == "min":
        expr = F.array_min(vals)
    elif score_mode == "max":
        expr = F.array_max(vals)
    elif score_mode == "none":
        expr = F.lit(1.0)
    else:
        raise ValueError(f"unknown score_mode: {score_mode}")
    return hits.withColumn(out_col, expr)
